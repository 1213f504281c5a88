"""Hudi log-format codec (sources/hudi_log.py): framed-block encode /
decode roundtrips plus the loud refusals (Kryo deletes, corrupt and
unknown block types)."""

import struct

import pytest

from easy_sql_spark.sources.hudi_log import (
    AVRO_DATA_BLOCK,
    COMMAND_BLOCK,
    DELETE_BLOCK,
    INSTANT_TIME,
    MAGIC,
    SCHEMA,
    TARGET_INSTANT_TIME,
    HudiLogError,
    HudiLogUnsupportedError,
    read_log_blocks,
    write_data_block,
    write_delete_block,
    write_rollback_block,
)

REC_SCHEMA = {
    "type": "record",
    "name": "r",
    "fields": [
        {"name": "_hoodie_record_key", "type": ["null", "string"]},
        {"name": "id", "type": ["null", "long"]},
        {"name": "val", "type": ["null", "string"]},
    ],
}


def test_data_block_roundtrip():
    recs = [
        {"_hoodie_record_key": "k1", "id": 1, "val": "a"},
        {"_hoodie_record_key": "k2", "id": 2, "val": None},
    ]
    raw = write_data_block(REC_SCHEMA, recs, "0010")
    blocks = read_log_blocks(raw)
    assert len(blocks) == 1
    b = blocks[0]
    assert b.type == AVRO_DATA_BLOCK
    assert b.header[INSTANT_TIME] == "0010"
    assert SCHEMA in b.header
    assert b.records == recs


def test_multi_block_file_and_delete_roundtrip():
    raw = (
        write_data_block(REC_SCHEMA, [{"_hoodie_record_key": "k1", "id": 1, "val": "a"}], "0010")
        + write_delete_block([("k1", "p=a"), ("k9", "")], "0020")
        + write_rollback_block("0020", "0030")
    )
    blocks = read_log_blocks(raw)
    assert [b.type for b in blocks] == [AVRO_DATA_BLOCK, DELETE_BLOCK, COMMAND_BLOCK]
    assert blocks[1].records == [("k1", "p=a"), ("k9", "")]
    assert blocks[2].header[TARGET_INSTANT_TIME] == "0020"
    assert blocks[2].records is None


def test_bad_magic_and_truncation_raise():
    raw = write_data_block(REC_SCHEMA, [], "0010")
    with pytest.raises(HudiLogError, match="bad magic"):
        read_log_blocks(b"XXXXXX" + raw[6:])
    with pytest.raises(HudiLogError, match="truncated"):
        read_log_blocks(raw[:-4])


def test_kryo_delete_block_refused():
    """Pre-0.13 delete payloads (version < 3) are Kryo-serialized
    HoodieKey[] — unreadable outside the JVM, must refuse loudly."""
    good = write_delete_block([("k", "")], "0010")
    # locate the content: rebuild a v2 delete frame by hand
    from easy_sql_spark.sources.hudi_log import _frame  # noqa: PLC2701

    content = struct.pack(">ii", 2, 4) + b"\x00\x00\x00\x00"
    raw = _frame(DELETE_BLOCK, {INSTANT_TIME: "0010"}, content)
    with pytest.raises(HudiLogUnsupportedError, match="Kryo"):
        read_log_blocks(raw)
    # and the v3 path still decodes
    assert read_log_blocks(good)[0].records == [("k", "")]


def test_unknown_block_type_refused():
    from easy_sql_spark.sources.hudi_log import _frame  # noqa: PLC2701

    raw = _frame(7, {INSTANT_TIME: "0010"}, b"")  # PARQUET_DATA_BLOCK
    with pytest.raises(HudiLogUnsupportedError, match="ordinal 7"):
        read_log_blocks(raw)


def test_frame_length_bookkeeping():
    raw = write_data_block(REC_SCHEMA, [], "0010")
    assert raw[:6] == MAGIC
    (after_len,) = struct.unpack_from(">q", raw, 6)
    assert after_len == len(raw) - 14
    (total,) = struct.unpack_from(">q", raw, len(raw) - 8)
    assert total == len(raw)

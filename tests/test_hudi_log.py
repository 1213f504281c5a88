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


def test_kryo_delete_block_roundtrip():
    """Pre-v3 delete payloads (Kryo-serialized HoodieKey[] /
    DeleteRecord[] from hudi-common SerializationUtils) decode through
    the pure-Python kryo_lite codec; the v3 avro path is unchanged."""
    from easy_sql_spark.sources.hudi_log import write_delete_block_kryo

    keys = [("k1", "p=a"), ("k9", ""), ("ключ-β", "部=x")]
    for version in (1, 2):
        raw = write_delete_block_kryo(keys, "0010", version=version)
        (blk,) = read_log_blocks(raw)
        assert blk.type == DELETE_BLOCK
        assert blk.records == [(k, p) for k, p in keys]

    # v2 with every supported orderingVal class, incl. the shared
    # partitionPath instance shape (exercises Kryo back-references)
    raw = write_delete_block_kryo(
        [("a", "pt"), ("b", "pt"), ("c", "pt"), ("d", "pt"), ("e", "pt")],
        "0011",
        version=2,
        ordering_vals=[None, 7, -3, 1.5, "ts-9"],
        shared_partition_path=True,
    )
    (blk,) = read_log_blocks(raw)
    assert blk.records == [
        ("a", "pt"), ("b", "pt"), ("c", "pt"), ("d", "pt"), ("e", "pt")
    ]

    # the v3 avro path still decodes
    good = write_delete_block([("k", "")], "0010")
    assert read_log_blocks(good)[0].records == [("k", "")]


def test_kryo_exotic_ordering_val_refused():
    """orderingVal classes outside the supported set refuse loudly BY
    NAME (e.g. avro Utf8, which Hudi registers a custom serializer
    for) — never a silent wrong decode."""
    from easy_sql_spark.sources.hudi_log import _frame  # noqa: PLC2701
    from easy_sql_spark.sources.kryo_lite import (
        KryoWriter,
        write_delete_records,
    )

    w = KryoWriter()
    pkg = "org.apache.hudi.common.model"
    w.write_class(f"[L{pkg}.DeleteRecord;")
    w.track_new()
    w.var_int(2)  # one element
    w.write_class(f"{pkg}.DeleteRecord")
    w.track_new()
    w.write_class(f"{pkg}.HoodieKey")
    w.track_new()
    w.track_unique(lambda: w.write_string("p"))
    w.track_unique(lambda: w.write_string("k"))
    w.write_class("org.apache.avro.util.Utf8")  # unsupported orderingVal
    payload = bytes(w.out)
    content = struct.pack(">ii", 2, len(payload)) + payload
    raw = _frame(DELETE_BLOCK, {INSTANT_TIME: "0010"}, content)
    with pytest.raises(NotImplementedError, match="Utf8"):
        read_log_blocks(raw)

    # unknown element classes refuse too
    with pytest.raises(NotImplementedError, match="element class"):
        from easy_sql_spark.sources.kryo_lite import read_delete_records

        w2 = KryoWriter()
        w2.write_class("[Ljava.lang.Object;")
        read_delete_records(bytes(w2.out) + b"\x01\x01")

    # null / edge-shaped payloads stay well-defined
    assert write_delete_records([], version=1) is not None


def test_kryo_codec_matches_real_kryo(spark):
    """Drive KryoReader over byte streams produced by the REAL
    kryo-shaded 4.0.3 in Spark's JVM (same Kryo line Hudi bundles):
    name-scheme class tags, reference markers and back-references,
    ASCII/UTF8/empty/null string encodings, zigzag varints — the exact
    wire elements the HoodieKey[]/DeleteRecord[] decode relies on."""
    from easy_sql_spark.sources.kryo_lite import KryoReader

    jvm = spark.sparkContext._jvm
    gw = spark.sparkContext._gateway

    def ser(obj):
        kryo = jvm.com.esotericsoftware.kryo.Kryo()
        kryo.setRegistrationRequired(False)
        out = jvm.com.esotericsoftware.kryo.io.Output(1 << 20, -1)
        kryo.writeClassAndObject(out, obj)
        return bytes(out.toBytes())

    # String[]: final element type -> writeObjectOrNull layout, the same
    # shape as HoodieKey's string FIELDS (tracked, mayBeNull)
    sarr = gw.new_array(jvm.java.lang.String, 5)
    for i, v in enumerate(["pp", "key-one", "", "añ-β", None]):
        sarr[i] = v
    r = KryoReader(ser(sarr))
    assert r.read_class() == "[Ljava.lang.String;"
    assert r.var_int() == 1  # the array object: new tracked ref
    r.new_ref_slot()
    assert r.var_int() - 1 == 5
    got = [r.read_tracked(r.read_string, may_be_null=True) for _ in range(5)]
    assert got == ["pp", "key-one", "", "añ-β", None]
    assert r.pos == len(r.buf)

    # Object[] with a SHARED instance: back-reference id+2, name-id
    # reuse without re-writing the class name, null elements as tag 0
    bi = jvm.java.math.BigInteger("5")
    oarr = gw.new_array(jvm.java.lang.Object, 4)
    oarr[0] = bi
    oarr[1] = bi
    oarr[2] = None
    oarr[3] = jvm.java.math.BigInteger("9")
    r = KryoReader(ser(oarr))
    assert r.read_class() == "[Ljava.lang.Object;"
    assert r.var_int() == 1
    r.new_ref_slot()
    assert r.var_int() - 1 == 4

    def big_int_body():
        n = r.var_int() - 1  # BigIntegerSerializer: varint len+1 + bytes
        raw = r.buf[r.pos : r.pos + n]
        r.pos += n
        return int.from_bytes(raw, "big", signed=True)

    assert r.read_class() == "java.math.BigInteger"
    assert r.read_tracked(big_int_body, may_be_null=False) == 5
    assert r.read_class() == "java.math.BigInteger"  # nameId reuse
    assert r.read_tracked(big_int_body, may_be_null=False) == 5  # back-ref
    assert r.read_class() is None  # null element
    assert r.read_class() == "java.math.BigInteger"
    assert r.read_tracked(big_int_body, may_be_null=False) == 9
    assert r.pos == len(r.buf)

    # registered wrappers: class id+2 tag, zigzag varint value, no ref
    for py, cls in [(0, "int"), (-3, "int")]:
        r = KryoReader(ser(jvm.java.lang.Integer(py)))
        assert r.read_class() == cls
        assert r.zigzag_int() == py
        assert r.pos == len(r.buf)


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

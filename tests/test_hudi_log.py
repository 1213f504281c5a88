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

    # avro-Utf8 orderingVals, both FieldSerializer layouts: modern
    # (bytes/hash/length/string) and legacy pre-avro-1.10 (no hash)
    from easy_sql_spark.sources.kryo_lite import AvroUtf8

    legacy = AvroUtf8("seq-legacy")
    legacy.legacy = True
    raw = write_delete_block_kryo(
        [("u1", ""), ("u2", ""), ("u3", "")],
        "0012",
        version=2,
        ordering_vals=[AvroUtf8("seq-7"), legacy, AvroUtf8("βγ-9")],
    )
    (blk,) = read_log_blocks(raw)
    assert blk.records == [("u1", ""), ("u2", ""), ("u3", "")]

    # boundary longs survive the varlong 9-byte encoding end-to-end
    raw = write_delete_block_kryo(
        [("L1", ""), ("L2", "")],
        "0013",
        version=2,
        ordering_vals=[(1 << 62) + 5, -(1 << 62)],
    )
    (blk,) = read_log_blocks(raw)
    assert blk.records == [("L1", ""), ("L2", "")]

    # the v3 avro path still decodes
    good = write_delete_block([("k", "")], "0010")
    assert read_log_blocks(good)[0].records == [("k", "")]


def test_kryo_exotic_ordering_val_refused():
    """orderingVal classes outside the supported set refuse loudly BY
    NAME (e.g. BigDecimal or custom payload classes) — never a silent
    wrong decode.  (avro Utf8 moved INTO the supported set in r9.)"""
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
    w.write_class("java.math.BigDecimal")  # unsupported orderingVal
    payload = bytes(w.out)
    content = struct.pack(">ii", 2, len(payload)) + payload
    raw = _frame(DELETE_BLOCK, {INSTANT_TIME: "0010"}, content)
    with pytest.raises(NotImplementedError, match="BigDecimal"):
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

    # Kryo varlong semantics (9-byte cap, raw bits 56-63 in byte 9):
    # real-Kryo Long streams around/beyond the 2^62 zigzag boundary
    # must decode, and our writer must emit byte-identical streams
    from easy_sql_spark.sources.kryo_lite import KryoWriter

    # values beyond int range only: py4j auto-converts smaller Python
    # ints to java.lang.Integer (and unboxes constructed Longs back)
    for v in [1 << 31, 1 << 55, (1 << 62), -(1 << 62),
              (1 << 62) + 12345, -((1 << 62) + 7),
              (1 << 63) - 1, -(1 << 63)]:
        raw = ser(v)
        r = KryoReader(raw)
        assert r.read_class() == "long"
        assert r.zigzag_long() == v, v
        assert r.pos == len(r.buf)
        w = KryoWriter()
        w.zigzag_long(v)
        assert bytes(w.out) == raw[1:], v  # strip the class tag
    # small values: pure-Python symmetry (JVM side auto-boxes to int)
    for v in [0, -1, 7, -(1 << 30), (1 << 31) - 1]:
        w = KryoWriter()
        w.zigzag_long(v)
        r = KryoReader(bytes(w.out))
        assert r.zigzag_long() == v and r.pos == len(r.buf)


def test_kryo_avro_utf8_ordering_val_matches_real_kryo(spark):
    """avro Utf8 orderingVals (pre-v3 Hudi tables whose ordering field
    is an avro string): decode streams produced by the REAL kryo-shaded
    4.0.3 over Spark's bundled avro — fresh instances, instances with a
    populated string cache, and instances with a populated hash cache
    (the layout-detection hazard)."""
    from easy_sql_spark.sources.kryo_lite import (
        KryoReader,
        KryoUnsupportedError,
        _read_avro_utf8,  # noqa: PLC2701
    )

    jvm = spark.sparkContext._jvm

    def ser(obj):
        kryo = jvm.com.esotericsoftware.kryo.Kryo()
        kryo.setRegistrationRequired(False)
        out = jvm.com.esotericsoftware.kryo.io.Output(1 << 20, -1)
        kryo.writeClassAndObject(out, obj)
        return bytes(out.toBytes())

    def decode(raw):
        r = KryoReader(raw)
        assert r.read_class() == "org.apache.avro.util.Utf8"
        got = r.read_tracked(lambda: _read_avro_utf8(r), may_be_null=False)
        assert r.pos == len(r.buf)
        return got

    for text in ["seq-42", "a", "añ-βγ", "x" * 100]:
        u = jvm.org.apache.avro.util.Utf8(text)
        assert decode(ser(u)) == text
        u.hashCode()  # populate the hash cache, if this avro caches it
        assert decode(ser(u)) == text

    # zero-length Utf8 is the documented wire-ambiguous refusal
    with pytest.raises((KryoUnsupportedError, AssertionError)):
        decode(ser(jvm.org.apache.avro.util.Utf8("")))


def test_unknown_block_type_refused():
    from easy_sql_spark.sources.hudi_log import _frame  # noqa: PLC2701

    raw = _frame(7, {INSTANT_TIME: "0010"}, b"")  # past the enum's end
    with pytest.raises(HudiLogUnsupportedError, match="ordinal 7"):
        read_log_blocks(raw)
    # HFILE data blocks decode since r11 (hfile_lite) — garbage content
    # must fail the hfile framing, not pass silently
    import json

    from easy_sql_spark.sources.hfile_lite import HFileError

    raw = _frame(
        4,
        {INSTANT_TIME: "0010", 2: json.dumps({"type": "record",
                                              "name": "R", "fields": []})},
        b"not an hfile",
    )
    with pytest.raises(HFileError):
        read_log_blocks(raw)


def test_parquet_data_block_roundtrip():
    """hoodie.logfile.data.block.format=parquet: the block content is a
    complete parquet file; decoded records surface through the same
    list[dict] interface as avro blocks.  Includes an all-NULL column
    (the arrow null-inference trap) and a null in a union field."""
    from easy_sql_spark.sources.hudi_log import (
        PARQUET_DATA_BLOCK,
        write_parquet_data_block,
    )

    schema = {
        "type": "record",
        "name": "r",
        "fields": [
            {"name": "_hoodie_record_key", "type": "string"},
            {"name": "k", "type": "long"},
            {"name": "v", "type": ["null", "string"]},
            {"name": "w", "type": ["null", "double"]},  # all NULL
        ],
    }
    recs = [
        {"_hoodie_record_key": "1", "k": 1, "v": "a", "w": None},
        {"_hoodie_record_key": "2", "k": 2, "v": None, "w": None},
    ]
    raw = write_parquet_data_block(schema, recs, "0020")
    # content really is a parquet file: magic at both ends of the body
    assert b"PAR1" in raw
    blocks = read_log_blocks(raw)
    assert len(blocks) == 1
    b = blocks[0]
    assert b.type == PARQUET_DATA_BLOCK
    assert b.header[INSTANT_TIME] == "0020"
    assert b.records == recs


def test_frame_length_bookkeeping():
    raw = write_data_block(REC_SCHEMA, [], "0010")
    assert raw[:6] == MAGIC
    (after_len,) = struct.unpack_from(">q", raw, 6)
    assert after_len == len(raw) - 14
    (total,) = struct.unpack_from(">q", raw, len(raw) - 8)
    assert total == len(raw)


def test_cdc_data_block_roundtrip_all_modes():
    """CDC_DATA_BLOCK (RFC-51): shares the avro data-block framing
    (HoodieCDCDataBlock does not override serialization); the SCHEMA
    header carries the mode-dependent record schema
    (HoodieCDCUtils.schemaBySupplementalLoggingMode)."""
    from easy_sql_spark.sources.hudi_log import (
        CDC_DATA_BLOCK,
        cdc_schema,
        write_cdc_data_block,
    )

    img = {
        "type": "record",
        "name": "img",
        "fields": [{"name": "k", "type": "long"},
                   {"name": "v", "type": ["null", "string"]}],
    }
    # op_key_only
    raw = write_cdc_data_block(
        [{"op": "d", "record_key": "7"}], "0020", "op_key_only"
    )
    (b,) = read_log_blocks(raw)
    assert b.type == CDC_DATA_BLOCK and b.header[INSTANT_TIME] == "0020"
    assert b.records == [{"op": "d", "record_key": "7"}]
    # data_before
    raw = write_cdc_data_block(
        [{"op": "u", "record_key": "7", "before": {"k": 7, "v": "x"}}],
        "0021", "data_before", img,
    )
    (b,) = read_log_blocks(raw)
    assert b.records[0]["before"] == {"k": 7, "v": "x"}
    # data_before_after, delete + insert shapes
    raw = write_cdc_data_block(
        [
            {"op": "d", "ts_ms": "0022", "before": {"k": 7, "v": "x"},
             "after": None},
            {"op": "i", "ts_ms": "0022", "before": None,
             "after": {"k": 9, "v": None}},
        ],
        "0022", "data_before_after", img,
    )
    (b,) = read_log_blocks(raw)
    assert b.records[0]["after"] is None
    assert b.records[1] == {"op": "i", "ts_ms": "0022", "before": None,
                            "after": {"k": 9, "v": None}}

    with pytest.raises(ValueError, match="unknown cdc logging mode"):
        cdc_schema("everything")
    with pytest.raises(ValueError, match="needs the data schema"):
        cdc_schema("data_before")


def test_parquet_data_block_logical_types_refused_at_read():
    """A parquet block whose columns carry LOGICAL types
    (timestamp/date/decimal) decodes to Python objects the avro path
    never produces — the READER must refuse as loudly as the fixture
    writer does (ADVICE r9)."""
    import datetime
    import io

    import pyarrow as pa
    import pyarrow.parquet as pq

    from easy_sql_spark.sources.hudi_log import _frame  # noqa: PLC2701
    from easy_sql_spark.sources.hudi_log import PARQUET_DATA_BLOCK

    buf = io.BytesIO()
    pq.write_table(
        pa.table(
            {
                "_hoodie_record_key": pa.array(["1"]),
                "ts": pa.array([datetime.datetime(2024, 1, 1)],
                               type=pa.timestamp("us")),
            }
        ),
        buf,
    )
    raw = _frame(
        PARQUET_DATA_BLOCK,
        {INSTANT_TIME: "0020", SCHEMA: "{}"},
        buf.getvalue(),
    )
    with pytest.raises(HudiLogUnsupportedError, match="logical"):
        read_log_blocks(raw)


def test_read_hudi_cdc_window_and_visibility(spark, tmp_path):
    """read_hudi_cdc: (from, to] instant windowing, inflight-instant
    invisibility, and the snapshot scan skipping -cdc files."""
    import os

    from easy_sql_spark.sources.hudi_log import (
        write_cdc_data_block,
        write_data_block,
    )
    from easy_sql_spark.sources.hudi_meta import read_hudi, read_hudi_cdc

    t = str(tmp_path / "tbl")
    os.makedirs(t)
    spark.createDataFrame(
        [("001", "1", "", 1, "a")],
        "_hoodie_commit_time string, _hoodie_record_key string, "
        "_hoodie_partition_path string, k long, v string",
    ).coalesce(1).write.parquet(t + "/_s")
    part = next(n for n in os.listdir(t + "/_s") if n.endswith(".parquet"))
    os.replace(f"{t}/_s/{part}", f"{t}/f1_0-1-0_001.parquet")

    img = {
        "type": "record",
        "name": "img",
        "fields": [{"name": "k", "type": "long"},
                   {"name": "v", "type": ["null", "string"]}],
    }
    rec_schema = {
        "type": "record",
        "name": "rec",
        "fields": [
            {"name": "_hoodie_commit_time", "type": "string"},
            {"name": "_hoodie_record_key", "type": "string"},
            {"name": "_hoodie_partition_path", "type": "string"},
            {"name": "k", "type": "long"},
            {"name": "v", "type": ["null", "string"]},
        ],
    }
    with open(f"{t}/.f1_001.log.1_0-1-0", "wb") as fh:
        fh.write(
            write_data_block(
                rec_schema,
                [{"_hoodie_commit_time": "002", "_hoodie_record_key": "2",
                  "_hoodie_partition_path": "", "k": 2, "v": "b"}],
                "002",
            )
        )

    def cdc(instant, k):
        return write_cdc_data_block(
            [{"op": "i", "ts_ms": instant, "before": None,
              "after": {"k": k, "v": None}}],
            instant, "data_before_after", img,
        )

    with open(f"{t}/.f1_001.log.1_0-1-0-cdc", "wb") as fh:
        fh.write(cdc("002", 2) + cdc("003", 3) + cdc("009", 99))

    os.makedirs(f"{t}/.hoodie")
    with open(f"{t}/.hoodie/hoodie.properties", "w") as fh:
        fh.write("hoodie.table.name=c\nhoodie.table.type=MERGE_ON_READ\n"
                 "hoodie.table.cdc.enabled=true\n")
    for instant, action in (("001", "commit"), ("002", "deltacommit"),
                            ("003", "deltacommit")):
        with open(f"{t}/.hoodie/{instant}.{action}", "w") as fh:
            fh.write("{}")

    feed = read_hudi_cdc(spark, t)
    rows = {(r.commit_time, r.op) for r in feed.collect()}
    assert rows == {("002", "i"), ("003", "i")}  # 009 inflight: invisible
    windowed = read_hudi_cdc(spark, t, from_instant="002").collect()
    assert [(r.commit_time) for r in windowed] == ["003"]
    assert read_hudi_cdc(spark, t, from_instant="002",
                         to_instant="002").count() == 0
    # image JSON is canonical + atomic
    (r3,) = [r for r in feed.collect() if r.commit_time == "003"]
    assert r3.after == '{"k":3,"v":null}' and r3.before is None
    # the snapshot merge never consumes the -cdc file (its records have
    # no _hoodie_record_key; double-consumption would raise)
    assert {r.k for r in read_hudi(spark, t).collect()} == {1, 2}

    # step-function surface: func.hudi_cdc_view with an instant floor
    from easy_sql_spark.runtime.processor import SqlProcessor

    etl = f"""-- target=func.hudi_cdc_view({t}, hcdc_v, 002)

-- target=check.cdc_rows
select (select count(*) from hcdc_v) as actual, 1 as expected
"""
    SqlProcessor(spark, etl, logger=lambda m: None).run()
    assert [r.commit_time for r in spark.table("hcdc_v").collect()] == ["003"]


def test_kryo_avro_utf8_ambiguous_hash_equals_length():
    """A MODERN-layout Utf8 whose populated hash cache equals the byte
    length used to be misparsed as legacy (the length int consumed as a
    reference marker -> dangling back-reference); the speculative
    dual-parse now resolves it, keeps plain legacy streams working, and
    names a stream neither layout validates (ADVICE r9)."""
    from easy_sql_spark.sources.kryo_lite import (
        KryoFormatError,
        KryoReader,
        KryoWriter,
    )
    from easy_sql_spark.sources.kryo_lite import _read_avro_utf8  # noqa: PLC2701

    def utf8_stream(text, hash_val=None, length=True, cached_null=True):
        raw = text.encode("utf-8")
        w = KryoWriter()
        w.track_unique(lambda: (w.var_int(len(raw) + 1), w.out.extend(raw)))
        if hash_val is not None:
            w.zigzag_int(hash_val)  # modern hash cache
        if length:
            w.zigzag_int(len(raw))
        if cached_null:
            w.var_int(0)
        return bytes(w.out)

    # modern, hash cache == byte length (the formerly-misparsed case)
    buf = utf8_stream("seq-9", hash_val=5)
    r = KryoReader(buf)
    assert _read_avro_utf8(r) == "seq-9" and r.pos == len(buf)

    # plain legacy (first int IS the length) still parses
    buf = utf8_stream("seq-9", hash_val=None)
    r = KryoReader(buf)
    assert _read_avro_utf8(r) == "seq-9" and r.pos == len(buf)

    # first == nbytes but NEITHER continuation validates: named error
    raw = b"seq-9"
    w = KryoWriter()
    w.track_unique(lambda: (w.var_int(len(raw) + 1), w.out.extend(raw)))
    w.zigzag_int(len(raw))
    w.var_int(8)  # legacy: dangling back-ref 6; modern: zigzag 4 != 5
    with pytest.raises(KryoFormatError, match="ambiguity"):
        _read_avro_utf8(KryoReader(bytes(w.out)))

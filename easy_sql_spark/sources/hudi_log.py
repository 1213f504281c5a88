"""Hudi log-file (HoodieLogFormat v1) block codec — pure stdlib.

MERGE_ON_READ file groups append delta records to *log files* named
``.{fileId}_{baseInstant}.log.{version}_{writeToken}`` (hidden files
next to the base parquet).  Each log file is a sequence of framed
blocks; the layout below follows the public format writer
(hudi/hudi-common ``HoodieLogFormatWriter.appendBlocks`` /
``HoodieLogBlock.getLogMetadataBytes``, Hudi 0.12-0.14 line), the same
format the reference's Flink-Hudi samples produce on MOR tables
(reference test/sample_etl.flink.hudi-agg.sql, backend/flink.py):

    6  bytes  magic ``#HUDI#``
    8  bytes  big-endian length of everything after this field
    4  bytes  log-format version (1)
    4  bytes  block type ordinal (HoodieLogBlockType)
    header    metadata map: int32 count, then per entry
              (int32 HeaderMetadataType ordinal, int32 len, utf-8)
    8  bytes  content length
    content   block-type-specific payload (below)
    footer    metadata map (same encoding, usually empty)
    8  bytes  total block length INCLUDING the magic (re-read check /
              reverse traversal support)

Block types handled (ordinals from ``HoodieLogBlockType``):

* ``AVRO_DATA_BLOCK`` (3) — content: int32 format version, int32 record
  count, then per record int32 size + a bare binary Avro datum of the
  header's ``SCHEMA``;
* ``DELETE_BLOCK`` (1) — content: int32 version, int32 length, payload.
  Version >= 3 payload is a bare Avro datum of the public
  ``HoodieDeleteRecordList`` record (recordKey / partitionPath /
  orderingVal); versions 1-2 are Kryo-4-serialized ``HoodieKey[]`` /
  ``DeleteRecord[]`` (hudi-common SerializationUtils) and decode via
  the pure-Python subset codec in ``kryo_lite.py`` — orderingVal
  classes outside {null, Integer, Long, Float, Double, String} refuse
  loudly by class name;
* ``PARQUET_DATA_BLOCK`` (5) — content: a complete parquet file
  (``hoodie.logfile.data.block.format=parquet``,
  ``HoodieParquetDataBlock.serializeRecords`` streams a parquet writer
  into the block body); decoded with pyarrow inside the executor task,
  records surface through the same list[dict] interface as avro blocks;
* ``COMMAND_BLOCK`` (0) — empty content; header ``TARGET_INSTANT_TIME``
  names the instant whose earlier blocks a rollback invalidates;
* ``CDC_DATA_BLOCK`` (6) — change-data-capture supplemental records
  (RFC-51, ``hoodie.table.cdc.enabled=true``): the block extends the
  avro data block WITHOUT overriding content serialization
  (hudi-common ``HoodieCDCDataBlock`` — same int32 version / int32
  count / per-record framing), so the decode branch is shared; the
  header ``SCHEMA`` carries the mode-dependent CDC record schema
  (``HoodieCDCUtils.schemaBySupplementalLoggingMode``: ``op`` +
  ``record_key`` for op_key_only, plus a nullable ``before`` image for
  data_before, or ``op``/``ts_ms``/``before``/``after`` for
  data_before_after).  CDC blocks live in ``-cdc``-suffixed log files
  that are SUPPLEMENTAL — the snapshot merge must skip them
  (``hudi_meta._log_files``) and the change feed reads them
  (``hudi_meta.read_hudi_cdc``).

* ``HFILE_DATA_BLOCK`` (4) — content: a complete HBase HFile
  (``HoodieHFileDataBlock.serializeRecords``, the metadata-table
  payload shape): row key = record key, cell value = bare binary Avro
  datum of the header's ``SCHEMA``.  Decoded via the pure-Python HFile
  v2/v3 subset codec (``hfile_lite.py``; RFC-84 surface — none/gz
  compression, no block encoding, no encryption; encoded-data blocks
  and exotic codecs refuse loudly by name).  With this the Hudi log
  refusal surface is EMPTY — every ``HoodieLogBlockType`` ordinal
  0-6 decodes.

Header metadata ordinals (``HeaderMetadataType``): INSTANT_TIME 0,
TARGET_INSTANT_TIME 1, SCHEMA 2, COMMAND_BLOCK_TYPE 3.

The decoder is picklable pure-Python over bytes, so MOR log parsing
runs INSIDE executor tasks (one task per file group) — the driver never
touches log payloads.  The encoder exists for tests and fixtures to
build spec-conformant MOR tables without real Hudi in the container.
"""

from __future__ import annotations

import struct
from dataclasses import dataclass, field

from .avro_lite import decode_datum, encode_datum

MAGIC = b"#HUDI#"
LOG_FORMAT_VERSION = 1

# HoodieLogBlockType ordinals
COMMAND_BLOCK = 0
DELETE_BLOCK = 1
CORRUPT_BLOCK = 2
AVRO_DATA_BLOCK = 3
HFILE_DATA_BLOCK = 4
PARQUET_DATA_BLOCK = 5
CDC_DATA_BLOCK = 6

# HeaderMetadataType ordinals
INSTANT_TIME = 0
TARGET_INSTANT_TIME = 1
SCHEMA = 2
COMMAND_BLOCK_TYPE = 3

#: hudi-common/src/main/avro/HoodieDeleteRecordList.avsc (0.13+): the
#: kryo-free delete-block payload.  orderingVal is narrowed to the
#: branches our merge understands; others raise at decode time.
DELETE_RECORD_LIST_SCHEMA: dict = {
    "type": "record",
    "name": "HoodieDeleteRecordList",
    "fields": [
        {
            "name": "deleteRecordList",
            "type": {
                "type": "array",
                "items": {
                    "type": "record",
                    "name": "HoodieDeleteRecord",
                    "fields": [
                        {"name": "recordKey", "type": ["null", "string"]},
                        {"name": "partitionPath", "type": ["null", "string"]},
                        {
                            "name": "orderingVal",
                            "type": ["null", "long", "double", "string"],
                        },
                    ],
                },
            },
        }
    ],
}


class HudiLogError(ValueError):
    pass


class HudiLogUnsupportedError(NotImplementedError):
    pass


@dataclass
class LogBlock:
    type: int
    header: dict[int, str] = field(default_factory=dict)
    #: AVRO_DATA_BLOCK: decoded records (list[dict]); DELETE_BLOCK:
    #: list[(recordKey, partitionPath)]; COMMAND_BLOCK: None
    records: list | None = None


def _read_meta_map(buf: bytes, pos: int) -> tuple[dict[int, str], int]:
    (count,) = struct.unpack_from(">i", buf, pos)
    pos += 4
    out: dict[int, str] = {}
    for _ in range(count):
        ordinal, ln = struct.unpack_from(">ii", buf, pos)
        pos += 8
        out[ordinal] = buf[pos : pos + ln].decode("utf-8")
        pos += ln
    return out, pos


def _write_meta_map(meta: dict[int, str]) -> bytes:
    out = struct.pack(">i", len(meta))
    for ordinal, val in meta.items():
        enc = val.encode("utf-8")
        out += struct.pack(">ii", ordinal, len(enc)) + enc
    return out


def _decode_content(btype: int, header: dict[int, str], content: bytes):
    import json

    if btype == COMMAND_BLOCK:
        return None
    if btype in (AVRO_DATA_BLOCK, CDC_DATA_BLOCK):
        # HoodieCDCDataBlock extends HoodieAvroDataBlock without
        # overriding serialization — same framing, CDC schema in SCHEMA
        schema = json.loads(header[SCHEMA])
        version, count = struct.unpack_from(">ii", content, 0)
        pos = 8
        records = []
        for _ in range(count):
            (size,) = struct.unpack_from(">i", content, pos)
            pos += 4
            records.append(decode_datum(schema, content[pos : pos + size]))
            pos += size
        return records
    if btype == DELETE_BLOCK:
        (version,) = struct.unpack_from(">i", content, 0)
        (size,) = struct.unpack_from(">i", content, 4)
        if version < 3:
            # v1 (HoodieKey[]) / v2 (DeleteRecord[]) payloads are Kryo 4
            # streams from hudi-common SerializationUtils — the block
            # shape every pre-0.14 writer (and many current ones) emits
            # for deletes; decoded by the pure-Python subset codec
            from .kryo_lite import read_delete_records

            return read_delete_records(content[8 : 8 + size])
        datum = decode_datum(DELETE_RECORD_LIST_SCHEMA, content[8 : 8 + size])
        return [
            (r["recordKey"], r["partitionPath"] or "")
            for r in datum["deleteRecordList"]
        ]
    if btype == PARQUET_DATA_BLOCK:
        # hoodie.logfile.data.block.format=parquet
        # (HoodieParquetDataBlock): the block content IS a complete
        # parquet file — serializeRecords streams a parquet writer into
        # the block body — so the existing parquet machinery applies.
        # Decoded records match the avro-block interface (list[dict]);
        # pyarrow runs INSIDE the executor task that parses the file
        # group, same as the rest of the decoder.
        import pyarrow as _pa
        import pyarrow.parquet as _pq

        table = _pq.read_table(_pa.BufferReader(content))
        # mirror the fixture writer's refusal surface at READ time
        # (ADVICE r9): columns with parquet LOGICAL types
        # (timestamp/date/decimal/...) decode to Python objects the
        # avro-block path never produces and can mismatch the
        # _avro_to_spark-derived output schema on real tables
        allowed = {
            "string", "large_string", "int64", "int32", "double",
            "float", "bool", "binary", "large_binary",
        }
        bad = [
            f"{f.name} {f.type}"
            for f in table.schema
            if str(f.type) not in allowed
        ]
        if bad:
            raise HudiLogUnsupportedError(
                "parquet data block columns with non-avro-primitive "
                f"(logical) types: {bad}"
            )
        return table.to_pylist()
    if btype == HFILE_DATA_BLOCK:
        # content = a complete HBase HFile (HoodieHFileDataBlock
        # .serializeRecords streams an HFile writer into the block
        # body): row key = record key, cell value = a bare binary Avro
        # datum of the header's SCHEMA — the metadata-table payload
        # shape.  Decoded via the pure-Python HFile v2/v3 subset codec
        # (hfile_lite.py, RFC-84 surface: none/gz compression, no
        # encoding/encryption), sequentially inside the executor task
        # like every other block type.
        from .hfile_lite import read_hfile_kv

        schema = json.loads(header[SCHEMA])
        out = []
        for k, v in read_hfile_kv(content):
            rec = decode_datum(schema, v)
            # the HFile ROW KEY is the record key (HoodieHFileDataBlock
            # keys cells by it); metadata-table payloads
            # (HoodieMetadataRecord) carry no _hoodie_record_key field,
            # so surface the row key under that name for the MOR merge
            # — virtual-key HFILE blocks merge exactly like meta-column
            # blocks (r11 review fix)
            rec.setdefault("_hoodie_record_key", k.decode())
            out.append(rec)
        return out
    if btype == CORRUPT_BLOCK:
        raise HudiLogError("corrupt block in hudi log file")
    raise HudiLogUnsupportedError(f"hudi log block type ordinal {btype}")


def read_log_blocks(
    data: bytes, only_instants: "set[str] | None" = None
) -> list[LogBlock]:
    """Decode every framed block in one log file, in file order.

    ``only_instants`` skips CONTENT decode for data-bearing blocks whose
    ``INSTANT_TIME`` header is not in the set (their ``records`` stay
    None; type/header still surface) — frame walking only costs header
    bytes, so a tailing consumer (streaming/hudi_cdc_source.py) pays
    O(new instants), not O(file history), per batch.  COMMAND blocks
    always decode (they carry no records and affect replay ordering)."""
    blocks: list[LogBlock] = []
    pos = 0
    n = len(data)
    while pos < n:
        if data[pos : pos + 6] != MAGIC:
            raise HudiLogError(f"bad magic at offset {pos}")
        start = pos
        pos += 6
        (after_len,) = struct.unpack_from(">q", data, pos)
        pos += 8
        block_end = pos + after_len
        if block_end > n:
            raise HudiLogError("truncated log block")
        version, btype = struct.unpack_from(">ii", data, pos)
        pos += 8
        if version != LOG_FORMAT_VERSION:
            raise HudiLogUnsupportedError(
                f"log format version {version} (only v1 supported)"
            )
        header, pos = _read_meta_map(data, pos)
        (content_len,) = struct.unpack_from(">q", data, pos)
        pos += 8
        content = data[pos : pos + content_len]
        pos += content_len
        _footer, pos = _read_meta_map(data, pos)
        (total_len,) = struct.unpack_from(">q", data, pos)
        pos += 8
        if pos != block_end or total_len != pos - start:
            raise HudiLogError("log block length bookkeeping mismatch")
        skip = (
            only_instants is not None
            and btype != COMMAND_BLOCK
            and header.get(INSTANT_TIME) not in only_instants
        )
        blocks.append(
            LogBlock(
                btype,
                header,
                None if skip else _decode_content(btype, header, content),
            )
        )
    return blocks


# ----------------------------------------------------------------- encode
def _frame(btype: int, header: dict[int, str], content: bytes) -> bytes:
    hdr = _write_meta_map(header)
    ftr = _write_meta_map({})
    body = (
        struct.pack(">ii", LOG_FORMAT_VERSION, btype)
        + hdr
        + struct.pack(">q", len(content))
        + content
        + ftr
    )
    # total block length including magic = 6 + 8 + len(body) + 8
    total = 6 + 8 + len(body) + 8
    return (
        MAGIC
        + struct.pack(">q", len(body) + 8)
        + body
        + struct.pack(">q", total)
    )


def write_data_block(schema: dict, records: list[dict], instant: str) -> bytes:
    """One framed AVRO_DATA_BLOCK (fixture/export helper)."""
    import json

    content = struct.pack(">ii", 3, len(records))
    for rec in records:
        datum = encode_datum(schema, rec)
        content += struct.pack(">i", len(datum)) + datum
    header = {INSTANT_TIME: instant, SCHEMA: json.dumps(schema)}
    return _frame(AVRO_DATA_BLOCK, header, content)


def write_hfile_data_block(
    schema: dict,
    records: list[dict],
    instant: str,
    key_field: str = "key",
    **hfile_kwargs,
) -> bytes:
    """One framed HFILE_DATA_BLOCK (fixture/export helper, the
    metadata-table payload shape): records are sorted by ``key_field``
    (HoodieHFileDataBlock requires sorted HFile keys), each stored as
    row key = the record key, value = bare binary Avro datum of
    ``schema``.  ``hfile_kwargs`` pass through to
    :func:`hfile_lite.write_hfile` (compression, block_size,
    include_mvcc, checksum_type…) so tests can exercise the whole
    RFC-84 surface."""
    import json

    from .hfile_lite import write_hfile

    pairs = sorted(
        (str(rec[key_field]).encode(), encode_datum(schema, rec))
        for rec in records
    )
    content = write_hfile(pairs, **hfile_kwargs)
    header = {INSTANT_TIME: instant, SCHEMA: json.dumps(schema)}
    return _frame(HFILE_DATA_BLOCK, header, content)


#: avro primitive → pyarrow type for the parquet-block fixture writer;
#: explicit types matter because an all-NULL column would otherwise
#: infer pa.null() and poison the parquet schema
_AVRO_TO_ARROW = {
    "string": "string",
    "long": "int64",
    "int": "int32",
    "double": "float64",
    "float": "float32",
    "boolean": "bool_",
    "bytes": "binary",
}


def write_parquet_data_block(
    schema: dict, records: list[dict], instant: str
) -> bytes:
    """One framed PARQUET_DATA_BLOCK (fixture/export helper for tables
    written with ``hoodie.logfile.data.block.format=parquet``): the
    block content is a complete parquet file of ``records``; ``schema``
    is the avro record schema and rides the SCHEMA header exactly as on
    avro blocks (Hudi writes it for every data-block format)."""
    import io
    import json

    import pyarrow as pa
    import pyarrow.parquet as pq

    arrays, names = [], []
    for f in schema["fields"]:
        t = f["type"]
        if isinstance(t, list):  # ["null", X] union
            t = next(x for x in t if x != "null")
        if not isinstance(t, str) or t not in _AVRO_TO_ARROW:
            raise HudiLogUnsupportedError(
                f"parquet data block fixture: avro type {t!r}"
            )
        names.append(f["name"])
        arrays.append(
            pa.array(
                [r.get(f["name"]) for r in records],
                type=getattr(pa, _AVRO_TO_ARROW[t])(),
            )
        )
    buf = io.BytesIO()
    pq.write_table(pa.table(arrays, names=names), buf)
    header = {INSTANT_TIME: instant, SCHEMA: json.dumps(schema)}
    return _frame(PARQUET_DATA_BLOCK, header, buf.getvalue())


#: hoodie.table.cdc.supplemental.logging.mode values (RFC-51,
#: hudi-common table/cdc/HoodieCDCSupplementalLoggingMode) and the
#: field names of HoodieCDCUtils (CDC_OPERATION_TYPE "op",
#: CDC_RECORD_KEY "record_key", CDC_COMMIT_TIMESTAMP "ts_ms",
#: CDC_BEFORE_IMAGE "before", CDC_AFTER_IMAGE "after")
CDC_MODES = ("op_key_only", "data_before", "data_before_after")


def cdc_schema(mode: str, data_schema: dict | None = None) -> dict:
    """The mode-dependent CDC record schema
    (``HoodieCDCUtils.schemaBySupplementalLoggingMode``): op_key_only
    carries (op, record_key); data_before adds a nullable ``before``
    image of the DATA schema; data_before_after carries
    (op, ts_ms, before, after) with both images nullable records."""
    if mode not in CDC_MODES:
        raise ValueError(f"unknown cdc logging mode {mode!r}")
    if mode == "op_key_only":
        return {
            "type": "record",
            "name": "Record",
            "fields": [
                {"name": "op", "type": "string"},
                {"name": "record_key", "type": "string"},
            ],
        }
    if data_schema is None:
        raise ValueError(f"cdc mode {mode!r} needs the data schema")

    def img(name: str, suffix: str) -> dict:
        # a named avro schema may appear only once per datum — images
        # re-nest the data schema under distinct names
        nested = dict(data_schema)
        nested["name"] = f"{data_schema.get('name', 'rec')}_{suffix}"
        return {"name": name, "type": ["null", nested], "default": None}

    if mode == "data_before":
        return {
            "type": "record",
            "name": "Record",
            "fields": [
                {"name": "op", "type": "string"},
                {"name": "record_key", "type": "string"},
                img("before", "b"),
            ],
        }
    return {
        "type": "record",
        "name": "Record",
        "fields": [
            {"name": "op", "type": "string"},
            {"name": "ts_ms", "type": "string"},
            img("before", "b"),
            img("after", "a"),
        ],
    }


def write_cdc_data_block(
    changes: list[dict],
    instant: str,
    mode: str = "data_before_after",
    data_schema: dict | None = None,
) -> bytes:
    """One framed CDC_DATA_BLOCK (fixture/export helper for tables
    written with ``hoodie.table.cdc.enabled=true``): content framing is
    identical to an avro data block (``HoodieCDCDataBlock`` does not
    override serialization), records follow :func:`cdc_schema`."""
    import json

    schema = cdc_schema(mode, data_schema)
    content = struct.pack(">ii", 3, len(changes))
    for rec in changes:
        datum = encode_datum(schema, rec)
        content += struct.pack(">i", len(datum)) + datum
    header = {INSTANT_TIME: instant, SCHEMA: json.dumps(schema)}
    return _frame(CDC_DATA_BLOCK, header, content)


def write_delete_block(
    keys: list[tuple[str, str]], instant: str
) -> bytes:
    """One framed DELETE_BLOCK (v3 avro payload)."""
    datum = encode_datum(
        DELETE_RECORD_LIST_SCHEMA,
        {
            "deleteRecordList": [
                {"recordKey": k, "partitionPath": p, "orderingVal": None}
                for k, p in keys
            ]
        },
    )
    content = struct.pack(">ii", 3, len(datum)) + datum
    return _frame(DELETE_BLOCK, {INSTANT_TIME: instant}, content)


def write_delete_block_kryo(
    keys: list[tuple[str, str]],
    instant: str,
    version: int = 1,
    ordering_vals: list | None = None,
    shared_partition_path: bool = False,
) -> bytes:
    """One framed legacy DELETE_BLOCK (v1 HoodieKey[] / v2
    DeleteRecord[], Kryo payload) — fixture writer for tables produced
    by pre-v3 Hudi writers; see ``kryo_lite.write_delete_records``."""
    from .kryo_lite import write_delete_records

    payload = write_delete_records(
        keys,
        version=version,
        ordering_vals=ordering_vals,
        shared_partition_path=shared_partition_path,
    )
    content = struct.pack(">ii", version, len(payload)) + payload
    return _frame(DELETE_BLOCK, {INSTANT_TIME: instant}, content)


def write_rollback_block(target_instant: str, instant: str) -> bytes:
    """One framed COMMAND_BLOCK (ROLLBACK_PREVIOUS_BLOCK): readers must
    skip earlier blocks whose INSTANT_TIME == target_instant."""
    header = {
        INSTANT_TIME: instant,
        TARGET_INSTANT_TIME: target_instant,
        COMMAND_BLOCK_TYPE: "0",  # ROLLBACK_BLOCK ordinal
    }
    return _frame(COMMAND_BLOCK, header, b"")

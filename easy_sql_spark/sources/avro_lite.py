"""Minimal Avro Object Container File codec — pure stdlib, spec-driven
(https://avro.apache.org/docs/1.11.1/specification/), written for one
job: decoding Iceberg metadata (manifest lists and manifests are Avro)
in containers that carry no avro/fastavro package.

Decode supports the full primitive set, records, enums, arrays, maps,
unions, fixed, and the null/deflate codecs — everything Iceberg
metadata uses.  Logical types are surfaced raw (Iceberg's reader layer
interprets them).  The encoder exists so tests can build
spec-conformant files WITHOUT going through the decoder's own code
paths (plus a hand-crafted byte-level fixture pins the wire format
independently of both).

Binary encoding recap (the parts that matter):
- long/int: zigzag then varint, little-endian 7-bit groups, high bit =
  continuation
- float/double: IEEE-754 little-endian 4/8 bytes
- bytes/string: length (long) + raw
- arrays/maps: blocks of (count, items...), 0-count terminates; a
  NEGATIVE count means abs(count) items preceded by a byte size (skip
  support) — readers must handle both
- unions: branch index (long) + value per branch schema
- container file: "Obj\\x01" + file-metadata map (avro.schema JSON,
  avro.codec) + 16-byte sync, then blocks of (row count, byte size,
  payload, sync)
"""

from __future__ import annotations

import io
import json
import struct
import zlib


class AvroError(ValueError):
    pass


# ----------------------------------------------------------------- decode
class _Reader:
    def __init__(self, buf: bytes) -> None:
        self.b = buf
        self.pos = 0

    def read(self, n: int) -> bytes:
        if self.pos + n > len(self.b):
            raise AvroError("truncated avro data")
        out = self.b[self.pos : self.pos + n]
        self.pos += n
        return out

    def long(self) -> int:
        shift = 0
        acc = 0
        while True:
            byte = self.read(1)[0]
            acc |= (byte & 0x7F) << shift
            if not byte & 0x80:
                break
            shift += 7
        return (acc >> 1) ^ -(acc & 1)  # zigzag

    def value(self, schema) -> object:
        if isinstance(schema, list):  # union
            idx = self.long()
            if not 0 <= idx < len(schema):
                raise AvroError(f"union branch {idx} out of range")
            return self.value(schema[idx])
        if isinstance(schema, str):
            t = schema
        else:
            t = schema["type"]
        if t == "null":
            return None
        if t == "boolean":
            return self.read(1)[0] != 0
        if t in ("int", "long"):
            return self.long()
        if t == "float":
            return struct.unpack("<f", self.read(4))[0]
        if t == "double":
            return struct.unpack("<d", self.read(8))[0]
        if t == "bytes":
            return self.read(self.long())
        if t == "string":
            return self.read(self.long()).decode("utf-8")
        if t == "fixed":
            return self.read(schema["size"])
        if t == "enum":
            return schema["symbols"][self.long()]
        if t == "record":
            return {
                f["name"]: self.value(f["type"]) for f in schema["fields"]
            }
        if t == "array":
            out = []
            while True:
                n = self.long()
                if n == 0:
                    break
                if n < 0:
                    self.long()  # block byte size (skip support) — unused
                    n = -n
                for _ in range(n):
                    out.append(self.value(schema["items"]))
            return out
        if t == "map":
            out = {}
            while True:
                n = self.long()
                if n == 0:
                    break
                if n < 0:
                    self.long()
                    n = -n
                for _ in range(n):
                    k = self.read(self.long()).decode("utf-8")
                    out[k] = self.value(schema["values"])
            return out
        raise AvroError(f"unsupported avro type {t!r}")


def _resolve_named(schema, named: dict):
    """Inline named-type references ("name" used as a type string) and
    index definitions — Iceberg manifests use a named partition record."""
    if isinstance(schema, list):
        return [_resolve_named(s, named) for s in schema]
    if isinstance(schema, str):
        return named.get(schema, schema)
    t = schema.get("type")
    if t in ("record", "fixed", "enum"):
        named[schema["name"]] = schema
        if t == "record":
            schema["fields"] = [
                {**f, "type": _resolve_named(f["type"], named)}
                for f in schema["fields"]
            ]
        return schema
    if t == "array":
        schema["items"] = _resolve_named(schema["items"], named)
    elif t == "map":
        schema["values"] = _resolve_named(schema["values"], named)
    elif isinstance(t, (dict, list)):
        schema["type"] = _resolve_named(t, named)
    return schema


def read_avro_file(data: bytes) -> tuple[dict, list[dict]]:
    """Decode a container file: (file metadata, rows)."""
    r = _Reader(data)
    if r.read(4) != b"Obj\x01":
        raise AvroError("not an avro object container file")
    meta_reader = _Reader(r.b[r.pos :])
    meta = meta_reader.value({"type": "map", "values": "bytes"})
    r.pos += meta_reader.pos
    sync = r.read(16)
    meta = {k: v for k, v in meta.items()}
    codec = meta.get("avro.codec", b"null").decode()
    schema = json.loads(meta["avro.schema"].decode("utf-8"))
    schema = _resolve_named(schema, {})
    rows: list[dict] = []
    while r.pos < len(r.b):
        count = r.long()
        size = r.long()
        payload = r.read(size)
        if codec == "deflate":
            payload = zlib.decompress(payload, -15)
        elif codec != "null":
            raise AvroError(f"unsupported avro codec {codec!r}")
        block = _Reader(payload)
        for _ in range(count):
            rows.append(block.value(schema))
        if r.read(16) != sync:
            raise AvroError("sync marker mismatch (corrupt block)")
    return {k: v.decode("utf-8", "replace") for k, v in meta.items()}, rows


# ----------------------------------------------------------------- encode
class _Writer:
    def __init__(self) -> None:
        self.out = io.BytesIO()

    def write(self, b: bytes) -> None:
        self.out.write(b)

    def long(self, n: int) -> None:
        n = (n << 1) ^ (n >> 63)  # zigzag
        while True:
            b = n & 0x7F
            n >>= 7
            if n:
                self.write(bytes([b | 0x80]))
            else:
                self.write(bytes([b]))
                break

    def value(self, schema, v) -> None:
        if isinstance(schema, list):  # union: pick the matching branch
            for i, s in enumerate(schema):
                t = s if isinstance(s, str) else s["type"]
                if v is None and t == "null":
                    self.long(i)
                    return
                if v is not None and t != "null":
                    self.long(i)
                    self.value(s, v)
                    return
            raise AvroError("no union branch matched value")
        t = schema if isinstance(schema, str) else schema["type"]
        if t == "null":
            return
        if t == "boolean":
            self.write(b"\x01" if v else b"\x00")
        elif t in ("int", "long"):
            self.long(int(v))
        elif t == "float":
            self.write(struct.pack("<f", v))
        elif t == "double":
            self.write(struct.pack("<d", v))
        elif t == "bytes":
            self.long(len(v))
            self.write(bytes(v))
        elif t == "string":
            enc = v.encode("utf-8")
            self.long(len(enc))
            self.write(enc)
        elif t == "fixed":
            self.write(bytes(v))
        elif t == "enum":
            self.long(schema["symbols"].index(v))
        elif t == "record":
            for f in schema["fields"]:
                self.value(f["type"], v[f["name"]])
        elif t == "array":
            if v:
                self.long(len(v))
                for item in v:
                    self.value(schema["items"], item)
            self.long(0)
        elif t == "map":
            if v:
                self.long(len(v))
                for k, item in v.items():
                    self.value("string", k)
                    self.value(schema["values"], item)
            self.long(0)
        else:
            raise AvroError(f"unsupported avro type {t!r}")


def decode_datum(schema, data: bytes) -> object:
    """Decode ONE binary-encoded Avro datum (no container framing) —
    the shape Hudi log blocks embed records in."""
    schema = _resolve_named(schema, {}) if isinstance(schema, dict) else schema
    return _Reader(data).value(schema)


def encode_datum(schema, value) -> bytes:
    """Encode ONE value as a bare binary Avro datum."""
    w = _Writer()
    w.value(schema, value)
    return w.out.getvalue()


def write_avro_file(schema: dict, rows: list, codec: str = "null") -> bytes:
    """Encode rows as a container file (test/export helper)."""
    body = _Writer()
    for row in rows:
        body.value(schema, row)
    payload = body.out.getvalue()
    if codec == "deflate":
        comp = zlib.compressobj(6, zlib.DEFLATED, -15)
        payload = comp.compress(payload) + comp.flush()
    elif codec != "null":
        raise AvroError(f"unsupported avro codec {codec!r}")
    head = _Writer()
    head.write(b"Obj\x01")
    head.value(
        {"type": "map", "values": "bytes"},
        {
            "avro.schema": json.dumps(schema).encode(),
            "avro.codec": codec.encode(),
        },
    )
    sync = b"SPARKGRAFTSYNC16"  # any 16 bytes, constant is fine
    head.write(sync)
    head.long(len(rows))
    head.long(len(payload))
    head.write(payload)
    head.write(sync)
    return head.out.getvalue()

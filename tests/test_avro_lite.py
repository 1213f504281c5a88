"""Avro codec (sources/avro_lite.py): encoder/decoder round-trips plus
a HAND-CRAFTED byte-level fixture that pins the wire format against the
spec independently of both code paths (zigzag varints, length-prefixed
strings, file-metadata map, sync markers)."""

import json

import pytest

from easy_sql_spark.sources.avro_lite import (
    AvroError,
    read_avro_file,
    write_avro_file,
)

SCHEMA = {
    "type": "record",
    "name": "r",
    "fields": [
        {"name": "a", "type": "long"},
        {"name": "s", "type": "string"},
        {"name": "u", "type": ["null", "int"]},
        {"name": "arr", "type": {"type": "array", "items": "string"}},
        {"name": "m", "type": {"type": "map", "values": "long"}},
        {"name": "d", "type": "double"},
        {"name": "flag", "type": "boolean"},
        {
            "name": "nested",
            "type": {
                "type": "record",
                "name": "p",
                "fields": [{"name": "x", "type": "int"}],
            },
        },
    ],
}

ROWS = [
    {"a": -1, "s": "héllo", "u": None, "arr": ["x", "y"], "m": {"k": 9},
     "d": 1.5, "flag": True, "nested": {"x": 3}},
    {"a": 2 ** 40, "s": "", "u": 7, "arr": [], "m": {}, "d": -0.25,
     "flag": False, "nested": {"x": -2}},
]


@pytest.mark.parametrize("codec", ["null", "deflate"])
def test_roundtrip(codec):
    meta, rows = read_avro_file(write_avro_file(SCHEMA, ROWS, codec))
    assert rows == ROWS
    assert json.loads(meta["avro.schema"]) == SCHEMA


def _zz(n: int) -> bytes:
    n = (n << 1) ^ (n >> 63)
    out = b""
    while True:
        b = n & 0x7F
        n >>= 7
        out += bytes([b | (0x80 if n else 0)])
        if not n:
            return out


def test_hand_crafted_wire_format():
    """record {n: long, s: string}, one row {n: -2, s: "ab"}: zigzag(-2)
    is 3 (one varint byte 0x03); "ab" is zigzag-len 4 then the bytes —
    assembled by hand from the spec, NOT by the encoder."""
    sch = {"type": "record", "name": "t",
           "fields": [{"name": "n", "type": "long"},
                      {"name": "s", "type": "string"}]}
    sjson = json.dumps(sch).encode()
    buf = b"Obj\x01" + _zz(2)
    for k, v in (("avro.schema", sjson), ("avro.codec", b"null")):
        buf += _zz(len(k)) + k.encode() + _zz(len(v)) + v
    buf += _zz(0)
    sync = b"0123456789abcdef"
    payload = b"\x03" + b"\x04ab"
    buf += sync + _zz(1) + _zz(len(payload)) + payload + sync
    meta, rows = read_avro_file(buf)
    assert rows == [{"n": -2, "s": "ab"}]


def test_corruption_is_loud():
    data = bytearray(write_avro_file(SCHEMA, ROWS))
    with pytest.raises(AvroError, match="not an avro"):
        read_avro_file(b"PAR1" + bytes(data[4:]))
    data[-1] ^= 0xFF  # flip a sync byte
    with pytest.raises(AvroError, match="sync marker"):
        read_avro_file(bytes(data))


def test_avro_roundtrip_property():
    """Hypothesis: random values under the fixed manifest-like schema
    round-trip exactly, both codecs — varint edge values (7-bit group
    boundaries), unicode, empty/large collections."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    vals = st.fixed_dictionaries(
        {
            "a": st.integers(min_value=-(2**62), max_value=2**62),
            "s": st.text(max_size=40),
            "u": st.one_of(st.none(), st.integers(-(2**30), 2**30)),
            "arr": st.lists(st.text(max_size=8), max_size=20),
            "m": st.dictionaries(st.text(min_size=1, max_size=6),
                                 st.integers(-(2**40), 2**40), max_size=10),
            "d": st.floats(allow_nan=False, allow_infinity=False),
            "flag": st.booleans(),
            "nested": st.fixed_dictionaries(
                {"x": st.integers(-(2**31), 2**31 - 1)}
            ),
        }
    )

    @given(rows=st.lists(vals, max_size=12),
           codec=st.sampled_from(["null", "deflate"]))
    @settings(max_examples=120, deadline=None)
    def check(rows, codec):
        _, out = read_avro_file(write_avro_file(SCHEMA, rows, codec))
        assert out == rows

    check()

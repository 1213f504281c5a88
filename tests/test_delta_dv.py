"""Delta deletion-vector codec (sources/delta_dv.py): Z85, roaring
bitmap array, DV file framing, descriptor resolution."""

import struct
import uuid

import pytest

from easy_sql_spark.sources.delta_dv import (
    PORTABLE_MAGIC,
    DeltaDvError,
    decode_bitmap_array,
    dv_positions,
    dv_relative_path,
    encode_bitmap_array,
    read_dv_span,
    write_dv_file,
    z85_decode,
    z85_encode,
)


def test_z85_roundtrip_and_reference_vector():
    # the ZeroMQ spec's own test vector
    assert z85_encode(bytes([0x86, 0x4F, 0xD2, 0x6F, 0xB5, 0x59, 0xF7, 0x5B])) == "HelloWorld"
    assert z85_decode("HelloWorld") == bytes(
        [0x86, 0x4F, 0xD2, 0x6F, 0xB5, 0x59, 0xF7, 0x5B]
    )
    for raw in (b"", b"\x00", b"abc", bytes(range(16)), bytes(range(37))):
        assert z85_decode(z85_encode(raw), len(raw)) == raw


@pytest.mark.parametrize(
    "positions",
    [
        [],
        [0],
        [0, 1, 2, 5, 65535, 65536, 70000],
        list(range(10_000)),  # dense: bitmap container (card > 4096)
        [i * 7 for i in range(5000)],
        [(1 << 32) + 5, (1 << 32) + 6, 3],  # multi-bitmap (high words 0,1)
        [(1 << 33) + 1],  # empty intermediate bitmaps
    ],
)
def test_bitmap_array_roundtrip(positions):
    assert decode_bitmap_array(encode_bitmap_array(positions)) == sorted(
        set(positions)
    )


def test_run_container_decoding():
    """The encoder never emits run containers; hand-frame one (cookie
    12347) to pin the decoder against the RoaringFormatSpec."""
    # one container, key 0, run-coded: runs (10..14), (100..100)
    size = 1
    cookie = SERIAL = 12347 | ((size - 1) << 16)
    card = 6
    stream = struct.pack("<I", cookie)
    stream += bytes([0b1])  # container 0 is a run container
    stream += struct.pack("<HH", 0, card - 1)
    # size < 4 -> no offsets section
    stream += struct.pack("<H", 2)  # n_runs
    stream += struct.pack("<HH", 10, 4)  # 10..14
    stream += struct.pack("<HH", 100, 0)  # 100
    data = struct.pack("<iq", PORTABLE_MAGIC, 1) + stream
    assert decode_bitmap_array(data) == [10, 11, 12, 13, 14, 100]


def test_dv_file_framing_and_crc():
    blob, spans = write_dv_file([[1, 5, 9], [2]])
    assert blob[0] == 1
    assert read_dv_span(blob, *spans[0]) == [1, 5, 9]
    assert read_dv_span(blob, *spans[1]) == [2]
    # flip a bitmap byte: checksum must catch it
    off, size = spans[0]
    corrupt = bytearray(blob)
    corrupt[off + 4 + 1] ^= 0xFF
    with pytest.raises(DeltaDvError, match="checksum"):
        read_dv_span(bytes(corrupt), off, size)
    with pytest.raises(DeltaDvError, match="sizeInBytes"):
        read_dv_span(blob, off, size + 1)


def test_uuid_path_resolution(tmp_path):
    u = uuid.uuid4()
    enc = z85_encode(u.bytes)
    assert len(enc) == 20
    assert dv_relative_path(enc) == f"deletion_vector_{u}.bin"
    assert dv_relative_path("ab" + enc) == f"ab/deletion_vector_{u}.bin"

    blob, spans = write_dv_file([[3, 4]])
    (tmp_path / f"deletion_vector_{u}.bin").write_bytes(blob)
    desc = {
        "storageType": "u",
        "pathOrInlineDv": enc,
        "offset": spans[0][0],
        "sizeInBytes": spans[0][1],
        "cardinality": 2,
    }
    assert dv_positions(desc, str(tmp_path)) == [3, 4]


def test_inline_and_absolute_descriptors(tmp_path):
    data = encode_bitmap_array([7, 8])
    desc_i = {
        "storageType": "i",
        "pathOrInlineDv": z85_encode(data),
        "sizeInBytes": len(data),
        "cardinality": 2,
    }
    assert dv_positions(desc_i, str(tmp_path)) == [7, 8]

    blob, spans = write_dv_file([[11]])
    p = tmp_path / "dv.bin"
    p.write_bytes(blob)
    desc_p = {
        "storageType": "p",
        "pathOrInlineDv": str(p),
        "offset": spans[0][0],
        "sizeInBytes": spans[0][1],
        "cardinality": 1,
    }
    assert dv_positions(desc_p, str(tmp_path)) == [11]

    with pytest.raises(DeltaDvError, match="storageType"):
        dv_positions({"storageType": "x"}, str(tmp_path))

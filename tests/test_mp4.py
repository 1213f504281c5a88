"""MP4/ISO-BMFF demuxer (operators/mp4.py): mux→demux round-trips with
exact sample byte recovery, chunked layouts (stsc runs), metadata, and
the fail-loudly classification contract."""

import struct

import pytest

from easy_sql_spark.operators.codecs import UnsupportedMediaError
from easy_sql_spark.operators.mp4 import (
    encode_mp4,
    extract_samples,
    parse_mp4,
)


def _samples(n, base=10):
    return [bytes([i % 256]) * (base + i) for i in range(n)]


def test_roundtrip_single_chunk():
    samples = _samples(12)
    p = encode_mp4(samples, 320, 240, fps=6)
    info = parse_mp4(p)
    assert info["brand"] == "isom"
    assert info["duration_s"] == pytest.approx(2.0)
    (t,) = info["tracks"]
    assert (t["type"], t["codec"]) == ("video", "mp4v")
    assert (t["width"], t["height"], t["n_samples"]) == (320, 240, 12)
    assert extract_samples(p, t) == samples


@pytest.mark.parametrize("spc", [1, 3, 5])
def test_roundtrip_multi_chunk(spc):
    """Chunked mdat: stsc run-length + stco multi-offset resolution must
    still recover every sample byte-exactly (incl. a short last chunk)."""
    samples = _samples(13, base=4)
    p = encode_mp4(samples, 64, 48, samples_per_chunk=spc)
    (t,) = parse_mp4(p)["tracks"]
    assert extract_samples(p, t) == samples
    assert extract_samples(p, t, every_n=4) == samples[::4]


def test_empty_track():
    p = encode_mp4([], 16, 16)
    (t,) = parse_mp4(p)["tracks"]
    assert t["n_samples"] == 0 and extract_samples(p, t) == []


def test_garbage_and_truncation_classified():
    with pytest.raises(UnsupportedMediaError):
        parse_mp4(b"RIFFxxxxWAVEnot an mp4 at all....")
    p = encode_mp4(_samples(6), 32, 32)
    for cut in (6, 30, len(p) // 2):
        with pytest.raises(UnsupportedMediaError):
            parse_mp4(p[:cut])
    # corrupt a box size inside moov: classified, not a raw struct error
    bad = bytearray(p)
    moov_at = p.find(b"moov") - 4
    struct.pack_into(">I", bad, moov_at + 8, 2)  # inner box size < 8
    with pytest.raises(UnsupportedMediaError):
        parse_mp4(bytes(bad))


def test_frame_sample_real_dispatches_mp4(spark):
    from easy_sql_spark.operators.multimodal import frame_sample_real

    rows = [
        (1, bytearray(encode_mp4(_samples(9), 160, 120, samples_per_chunk=4))),
        (2, bytearray(encode_mp4(_samples(5, base=20), 80, 60))),
    ]
    df = spark.createDataFrame(rows, "media_id long, payload binary")
    out = frame_sample_real(df, every_n=2)
    got = {(r.media_id, r.frame_idx, r.n_frames, r.width, r.height)
           for r in out.collect()}
    assert got == {
        (1, 0, 9, 160, 120), (1, 2, 9, 160, 120), (1, 4, 9, 160, 120),
        (1, 6, 9, 160, 120), (1, 8, 9, 160, 120),
        (2, 0, 5, 80, 60), (2, 2, 5, 80, 60), (2, 4, 5, 80, 60),
    }

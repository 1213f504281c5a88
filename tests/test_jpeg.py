"""Baseline JPEG codec tests (operators/jpeg.py).

JPEG is lossy, so round-trips assert bounded per-pixel error rather than
bit equality; the bounds are tight at high quality because the only loss
sources are quantization (≈1 at q100), chroma rounding and IDCT float
rounding.  Structural properties (dimensions, component count, restart
markers, error classification) are exact.
"""

import numpy as np
import pytest

from easy_sql_spark.operators.codecs import (
    UnsupportedMediaError,
    decode_image,
    sniff_format,
)
from easy_sql_spark.operators.jpeg import decode_jpeg, encode_jpeg


def _gradient(h, w):
    yy, xx = np.mgrid[0:h, 0:w]
    return np.stack(
        [
            (yy * 255 // max(h - 1, 1)).astype(np.uint8),
            (xx * 255 // max(w - 1, 1)).astype(np.uint8),
            ((yy + xx) * 255 // max(h + w - 2, 1)).astype(np.uint8),
        ],
        axis=-1,
    )


@pytest.mark.parametrize("subsampling,tol", [("4:4:4", 4), ("4:2:0", 8)])
def test_roundtrip_smooth_image_high_quality(subsampling, tol):
    img = _gradient(41, 57)  # non-multiple-of-8/16 dims exercise padding
    out = decode_jpeg(encode_jpeg(img, quality=95, subsampling=subsampling))
    assert out.shape == img.shape
    assert np.abs(out.astype(int) - img.astype(int)).max() <= tol


def test_roundtrip_noise_q100_bounded():
    # Worst case for DCT compaction; q100 quant tables are mostly 1s so
    # the error is rounding only.
    noise = np.random.default_rng(7).integers(0, 256, (24, 24, 3), dtype=np.uint8)
    out = decode_jpeg(encode_jpeg(noise, quality=100))
    assert np.abs(out.astype(int) - noise.astype(int)).max() <= 6


def test_grayscale_roundtrip():
    yy = np.mgrid[0:17, 0:23][0]
    g = (yy * 255 // 16).astype(np.uint8)
    out = decode_jpeg(encode_jpeg(g, quality=95))
    assert out.shape == (17, 23, 1)
    assert np.abs(out[:, :, 0].astype(int) - g.astype(int)).max() <= 2


def test_restart_markers_roundtrip():
    img = _gradient(33, 49)
    plain = decode_jpeg(encode_jpeg(img, quality=92, subsampling="4:2:0"))
    with_rst = decode_jpeg(
        encode_jpeg(img, quality=92, subsampling="4:2:0", restart_interval=2)
    )
    # Restart markers change the byte stream but not the decoded pixels.
    assert np.array_equal(plain, with_rst)


def test_quality_monotone_size():
    img = _gradient(40, 40)
    sizes = [len(encode_jpeg(img, quality=q)) for q in (30, 60, 90)]
    assert sizes == sorted(sizes)


def test_sniff_and_decode_image_dispatch():
    img = _gradient(16, 16)
    payload = encode_jpeg(img, quality=95)
    assert sniff_format(payload) == "jpeg"
    out = decode_image(payload)
    assert out.shape == (16, 16, 3)


def test_single_pixel_and_tiny_images():
    for shape in [(1, 1), (1, 9), (8, 1), (3, 3)]:
        img = np.full((*shape, 3), 200, dtype=np.uint8)
        out = decode_jpeg(encode_jpeg(img, quality=95))
        assert out.shape == (*shape, 3)
        assert np.abs(out.astype(int) - 200).max() <= 3


def test_sequential_scan_in_progressive_frame_rejected():
    # Flip SOF0 (0xFFC0) to SOF2 (0xFFC2) on a baseline stream: the scan
    # header (Ss=0, Se=63) is illegal in a progressive frame — the
    # decoder must classify, not mis-decode the entropy data.
    payload = bytearray(encode_jpeg(_gradient(8, 8)))
    idx = payload.find(b"\xff\xc0")
    payload[idx + 1] = 0xC2
    with pytest.raises(UnsupportedMediaError, match="progressive DC scan"):
        decode_jpeg(bytes(payload))


def test_hierarchical_and_lossless_sofs_rejected():
    for sof in (0xC3, 0xC5, 0xC7, 0xCB, 0xCF):
        payload = bytearray(encode_jpeg(_gradient(8, 8)))
        idx = payload.find(b"\xff\xc0")
        payload[idx + 1] = sof
        with pytest.raises(UnsupportedMediaError, match="unsupported JPEG"):
            decode_jpeg(bytes(payload))


# ------------------------------------------------------ progressive decode


def test_progressive_matches_baseline_bit_exact():
    """encode_jpeg_progressive quantizes identically to encode_jpeg, so
    decoding its SOF2 stream (spectral selection + successive
    approximation with DC and AC refinement scans) must reproduce the
    baseline decode bit-for-bit."""
    from easy_sql_spark.operators.jpeg import encode_jpeg_progressive

    rng = np.random.default_rng(11)
    for shape, sub in [((41, 57, 3), "4:4:4"), ((50, 66, 3), "4:2:0"),
                       ((17, 23, 1), "4:4:4")]:
        img = _gradient(shape[0], shape[1])[:, :, : shape[2]]
        img = np.clip(
            img.astype(int) + rng.integers(-30, 30, img.shape), 0, 255
        ).astype(np.uint8)
        for q in (50, 92):
            base = decode_jpeg(encode_jpeg(img, quality=q, subsampling=sub))
            prog_payload = encode_jpeg_progressive(img, quality=q, subsampling=sub)
            assert b"\xff\xc2" in prog_payload  # really SOF2
            prog = decode_jpeg(prog_payload)
            assert np.array_equal(base, prog)


def test_progressive_roundtrip_error_bounded():
    from easy_sql_spark.operators.jpeg import encode_jpeg_progressive

    img = _gradient(41, 57)
    out = decode_jpeg(encode_jpeg_progressive(img, quality=95))
    assert out.shape == img.shape
    assert np.abs(out.astype(int) - img.astype(int)).max() <= 4


def test_progressive_partial_decode_is_preview():
    """Truncating a progressive stream after the early scans and closing
    it with EOI yields a coarse but valid preview — the defining
    progressive property (and proof the scans accumulate independently)."""
    from easy_sql_spark.operators.jpeg import encode_jpeg_progressive

    img = _gradient(32, 32)
    payload = encode_jpeg_progressive(img, quality=90)
    # cut just before the THIRD scan header (keep DC-first + luma AC)
    sos_offsets = []
    p = 0
    while True:
        p = payload.find(b"\xff\xda", p + 1)
        if p < 0:
            break
        sos_offsets.append(p)
    assert len(sos_offsets) == 8  # DC + 3xAC-first + 3xAC-refine + DC-refine
    partial = payload[: sos_offsets[2]] + b"\xff\xd9"
    out = decode_jpeg(partial)
    assert out.shape == img.shape
    # luma detail present, so the preview correlates with the original
    err = np.abs(out.astype(int) - img.astype(int)).mean()
    full_err = np.abs(
        decode_jpeg(payload).astype(int) - img.astype(int)
    ).mean()
    assert err < 40 and full_err <= err


def test_truncation_classified():
    payload = encode_jpeg(_gradient(24, 24), quality=90)
    for cut in (4, 20, len(payload) // 2, len(payload) - 3):
        with pytest.raises(UnsupportedMediaError):
            decode_jpeg(payload[:cut])


def test_garbage_classified():
    with pytest.raises(UnsupportedMediaError):
        decode_jpeg(b"\xff\xd8\xff\xe0not really a jpeg at all")
    with pytest.raises(UnsupportedMediaError):
        decode_jpeg(b"PK\x03\x04zipfile")


try:
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @given(
        h=st.integers(1, 20),
        w=st.integers(1, 20),
        seed=st.integers(0, 2**31 - 1),
        subsampling=st.sampled_from(["4:4:4", "4:2:0"]),
        rst=st.sampled_from([0, 1, 3]),
    )
    @settings(max_examples=25, deadline=None)
    def test_jpeg_roundtrip_property(h, w, seed, subsampling, rst):
        # Low-frequency content (block-constant) keeps the q95 error bound
        # tight for arbitrary shapes/subsampling/restart combinations.
        rng = np.random.default_rng(seed)
        coarse = rng.integers(32, 224, (-(-h // 8), -(-w // 8), 3), dtype=np.uint8)
        img = np.repeat(np.repeat(coarse, 8, axis=0), 8, axis=1)[:h, :w]
        out = decode_jpeg(
            encode_jpeg(img, quality=95, subsampling=subsampling, restart_interval=rst)
        )
        assert out.shape == img.shape
        # 4:4:4 blocks are constant -> only DC quantization error (tight).
        # 4:2:0 chroma blocks cover 16x16 luma pixels = FOUR coarse
        # blocks, so chroma carries real AC energy and its q95
        # quantization error is NOT DC-bounded: hypothesis found a
        # clipped-edge 9x17 case at 13 after ~15 rounds of green runs
        # with a 12 bound (r15).  24 gives the AC path margin while
        # still catching a broken coefficient/upsample pipeline, which
        # produces errors in the hundreds.
        bound = 12 if subsampling == "4:4:4" else 24
        assert np.abs(out.astype(int) - img.astype(int)).max() <= bound

    @given(
        h=st.integers(1, 40),
        w=st.integers(1, 40),
        seed=st.integers(0, 2**31 - 1),
        subsampling=st.sampled_from(["4:4:4", "4:2:0"]),
        quality=st.sampled_from([35, 75, 95]),
    )
    @settings(max_examples=25, deadline=None)
    def test_progressive_equals_baseline_property(h, w, seed, subsampling, quality):
        """For ARBITRARY noise content, shape, quality and subsampling,
        the progressive stream decodes to exactly the baseline decode —
        both encoders share one quantization, so any bit of divergence
        is an entropy-coding bug in one of the four progressive paths."""
        from easy_sql_spark.operators.jpeg import encode_jpeg_progressive

        img = np.random.default_rng(seed).integers(
            0, 256, (h, w, 3), dtype=np.uint8
        )
        base = decode_jpeg(encode_jpeg(img, quality=quality, subsampling=subsampling))
        prog = decode_jpeg(
            encode_jpeg_progressive(img, quality=quality, subsampling=subsampling)
        )
        assert np.array_equal(base, prog)

except ImportError:  # hypothesis is baked in, but stay import-safe
    pass


def test_annex_k_tables_match_published_codewords():
    """Round-trip tests can't catch a typo in the standard tables (both
    sides would share it), so pin codewords published in ITU T.81 /
    textbook references: luma DC category 0 is '00'; luma AC EOB (0x00)
    is the famous 4-bit '1010'; luma AC ZRL (0xF0) is the 11-bit
    '11111111001'; chroma DC category 0 is 2-bit '00'.  Also pin the
    structural invariants: 12 DC symbols, 162 AC symbols per table."""
    from easy_sql_spark.operators.jpeg import (
        _AC_CHROMA_BITS,
        _AC_CHROMA_VALS,
        _AC_LUMA_BITS,
        _AC_LUMA_VALS,
        _DC_CHROMA_BITS,
        _DC_CHROMA_VALS,
        _DC_LUMA_BITS,
        _DC_LUMA_VALS,
        _build_huff_codes,
    )

    assert sum(_DC_LUMA_BITS) == 12 and len(_DC_LUMA_VALS) == 12
    assert sum(_DC_CHROMA_BITS) == 12 and len(_DC_CHROMA_VALS) == 12
    assert sum(_AC_LUMA_BITS) == 162 and len(_AC_LUMA_VALS) == 162
    assert sum(_AC_CHROMA_BITS) == 162 and len(_AC_CHROMA_VALS) == 162

    def codeword(bits, vals, symbol):
        code, length = _build_huff_codes(bits, vals)[symbol]
        return format(code, f"0{length}b")

    assert codeword(_DC_LUMA_BITS, _DC_LUMA_VALS, 0) == "00"
    assert codeword(_DC_LUMA_BITS, _DC_LUMA_VALS, 2) == "011"
    assert codeword(_DC_CHROMA_BITS, _DC_CHROMA_VALS, 0) == "00"
    assert codeword(_AC_LUMA_BITS, _AC_LUMA_VALS, 0x00) == "1010"  # EOB
    assert codeword(_AC_LUMA_BITS, _AC_LUMA_VALS, 0x01) == "00"
    assert codeword(_AC_LUMA_BITS, _AC_LUMA_VALS, 0xF0) == "11111111001"  # ZRL
    assert codeword(_AC_CHROMA_BITS, _AC_CHROMA_VALS, 0x00) == "00"  # EOB
    assert codeword(_AC_CHROMA_BITS, _AC_CHROMA_VALS, 0x01) == "01"

    # every table is prefix-free with no code of all-ones at max length
    for bits, vals in (
        (_DC_LUMA_BITS, _DC_LUMA_VALS),
        (_DC_CHROMA_BITS, _DC_CHROMA_VALS),
        (_AC_LUMA_BITS, _AC_LUMA_VALS),
        (_AC_CHROMA_BITS, _AC_CHROMA_VALS),
    ):
        codes = _build_huff_codes(bits, vals)
        words = sorted(
            format(c, f"0{l}b") for c, l in codes.values()
        )
        assert len(set(words)) == len(words)
        for i, w in enumerate(words[:-1]):
            assert not words[i + 1].startswith(w)  # prefix-free
        maxlen = max(l for _, l in codes.values())
        assert "1" * maxlen not in words  # reserved all-ones code unused


# --------------------------------------------------------------- EXIF


def test_exif_parse_orientation_and_tags():
    from easy_sql_spark.operators.jpeg import make_exif_app1, parse_exif

    jpg = encode_jpeg(_gradient(8, 8))
    tagged = jpg[:2] + make_exif_app1(
        orientation=6, make="Cam", datetime="2024:01:02 03:04:05"
    ) + jpg[2:]
    meta = parse_exif(tagged)
    assert meta["orientation"] == 6
    assert meta["make"] == "Cam"
    assert meta["datetime"] == "2024:01:02 03:04:05"
    assert parse_exif(jpg) == {}  # no APP1: empty, not an error


def test_exif_oriented_decode_all_eight():
    """decode_jpeg_oriented must invert each EXIF orientation: applying
    the orientation transform to the decoded base image and normalizing
    back yields the base for all 8 codes."""
    import numpy as np

    from easy_sql_spark.operators.jpeg import (
        apply_exif_orientation,
        decode_jpeg,
        decode_jpeg_oriented,
        make_exif_app1,
    )

    jpg = encode_jpeg(_gradient(16, 24), quality=95)
    base = decode_jpeg(jpg)
    for o in range(1, 9):
        tagged = jpg[:2] + make_exif_app1(orientation=o) + jpg[2:]
        got = decode_jpeg_oriented(tagged)
        assert np.array_equal(got, apply_exif_orientation(base, o)), o
        if o >= 5:
            assert got.shape[:2] == base.shape[1::-1]  # dims swap


def test_exif_big_endian_tiff():
    import struct

    from easy_sql_spark.operators.jpeg import parse_exif

    # hand-build an MM (big-endian) TIFF with just orientation=3
    tiff = (b"MM\x00*\x00\x00\x00\x08"
            + struct.pack(">H", 1)
            + struct.pack(">HHIHH", 0x0112, 3, 1, 3, 0)
            + b"\x00\x00\x00\x00")
    body = b"Exif\x00\x00" + tiff
    app1 = b"\xff\xe1" + struct.pack(">H", len(body) + 2) + body
    jpg = encode_jpeg(_gradient(8, 8))
    assert parse_exif(jpg[:2] + app1 + jpg[2:])["orientation"] == 3

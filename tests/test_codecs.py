"""NumPy-only PNG/BMP codec tests (no Spark, no imaging libraries)."""

import struct
import zlib

import numpy as np
import pytest

from easy_sql_spark.operators.codecs import (
    PNG_MAGIC,
    UnsupportedMediaError,
    decode_bmp,
    decode_image,
    decode_png,
    encode_bmp,
    encode_png,
    sniff_format,
)


@pytest.mark.parametrize("shape", [(5, 4, 3), (3, 7, 1), (4, 4, 4), (2, 2, 2)])
def test_png_roundtrip_all_color_types(shape):
    rng = np.random.default_rng(42)
    img = rng.integers(0, 256, shape, dtype=np.uint8)
    out = decode_png(encode_png(img))
    assert out.shape == shape
    assert np.array_equal(out, img)


def test_png_grayscale_2d_input():
    img = np.arange(12, dtype=np.uint8).reshape(3, 4)
    out = decode_png(encode_png(img))
    assert out.shape == (3, 4, 1)
    assert np.array_equal(out[:, :, 0], img)


def _png_with_filters(img, filters):
    """Assemble a PNG whose row y uses filters[y] — exercises the decoder's
    filter inversion against independently-computed filtered bytes."""
    h, w, c = img.shape
    stride = w * c
    flat = img.reshape(h, stride).astype(np.int32)
    raw = bytearray()
    for y in range(h):
        f = filters[y]
        prev = flat[y - 1] if y else np.zeros(stride, np.int32)
        cur = flat[y]
        left = np.concatenate([np.zeros(c, np.int32), cur[:-c]])
        up_left = np.concatenate([np.zeros(c, np.int32), prev[:-c]])
        if f == 0:
            enc = cur
        elif f == 1:
            enc = (cur - left) & 0xFF
        elif f == 2:
            enc = (cur - prev) & 0xFF
        elif f == 3:
            enc = (cur - ((left + prev) >> 1)) & 0xFF
        else:  # Paeth
            p = left + prev - up_left
            pa, pb, pc = np.abs(p - left), np.abs(p - prev), np.abs(p - up_left)
            pred = np.where(
                (pa <= pb) & (pa <= pc), left, np.where(pb <= pc, prev, up_left)
            )
            enc = (cur - pred) & 0xFF
        raw += bytes([f]) + enc.astype(np.uint8).tobytes()
    ihdr = struct.pack(">IIBBBBB", w, h, 8, {1: 0, 2: 4, 3: 2, 4: 6}[c], 0, 0, 0)

    def chunk(ctype, data):
        crc = zlib.crc32(ctype + data) & 0xFFFFFFFF
        return struct.pack(">I", len(data)) + ctype + data + struct.pack(">I", crc)

    return (
        PNG_MAGIC
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(bytes(raw)))
        + chunk(b"IEND", b"")
    )


def test_png_all_five_scanline_filters_invert():
    rng = np.random.default_rng(3)
    img = rng.integers(0, 256, (5, 6, 3), dtype=np.uint8)
    payload = _png_with_filters(img, [0, 1, 2, 3, 4])
    assert np.array_equal(decode_png(payload), img)


def test_png_palette():
    # 2x2 palette image: indices into a 3-color PLTE
    palette = np.array([[255, 0, 0], [0, 255, 0], [0, 0, 255]], dtype=np.uint8)
    idx = np.array([[0, 1], [2, 1]], dtype=np.uint8)
    ihdr = struct.pack(">IIBBBBB", 2, 2, 8, 3, 0, 0, 0)
    raw = b"\x00" + idx[0].tobytes() + b"\x00" + idx[1].tobytes()

    def chunk(ctype, data):
        crc = zlib.crc32(ctype + data) & 0xFFFFFFFF
        return struct.pack(">I", len(data)) + ctype + data + struct.pack(">I", crc)

    payload = (
        PNG_MAGIC
        + chunk(b"IHDR", ihdr)
        + chunk(b"PLTE", palette.tobytes())
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )
    out = decode_png(payload)
    assert np.array_equal(out, palette[idx])


def test_png_rejects_out_of_scope():
    img = np.zeros((2, 2, 3), dtype=np.uint8)
    payload = bytearray(encode_png(img))
    # flipping the IHDR depth byte to 16 now leaves a VALID header but an
    # IDAT that's half the expected size — size-mismatch classification
    payload[24] = 16
    with pytest.raises(UnsupportedMediaError, match="size mismatch"):
        decode_png(bytes(payload))
    # depth 2 is illegal for RGB (spec §11.2.2): header-level rejection
    payload[24] = 2
    with pytest.raises(UnsupportedMediaError, match="bit_depth=2"):
        decode_png(bytes(payload))
    with pytest.raises(UnsupportedMediaError, match="not a PNG"):
        decode_png(b"JUNK" * 4)


def test_bmp_roundtrip_with_row_padding():
    # w=3 -> 9 data bytes/row, padded to 12: exercises the stride logic
    rng = np.random.default_rng(11)
    img = rng.integers(0, 256, (4, 3, 3), dtype=np.uint8)
    out = decode_bmp(encode_bmp(img))
    assert np.array_equal(out, img)


def test_bmp_top_down():
    img = np.arange(2 * 2 * 3, dtype=np.uint8).reshape(2, 2, 3)
    payload = bytearray(encode_bmp(img[::-1]))  # flip, then negate height
    payload[22:26] = struct.pack("<i", -2)
    out = decode_bmp(bytes(payload))
    assert np.array_equal(out, img[::-1][::-1])  # == img rows top-down


def test_bmp_rejects_out_of_scope():
    img = np.zeros((2, 2, 3), dtype=np.uint8)
    payload = bytearray(encode_bmp(img))
    payload[30:34] = struct.pack("<I", 1)  # BI_RLE8
    with pytest.raises(UnsupportedMediaError, match="compression=1"):
        decode_bmp(bytes(payload))


try:
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @given(
        h=st.integers(1, 12),
        w=st.integers(1, 12),
        c=st.sampled_from([1, 2, 3, 4]),
        seed=st.integers(0, 2**31 - 1),
        filters=st.lists(st.integers(0, 4), min_size=12, max_size=12),
    )
    @settings(max_examples=40, deadline=None)
    def test_png_roundtrip_property(h, w, c, seed, filters):
        img = np.random.default_rng(seed).integers(
            0, 256, (h, w, c), dtype=np.uint8
        )
        assert np.array_equal(decode_png(encode_png(img)), img)
        # and with arbitrary per-row filter choices
        payload = _png_with_filters(img, filters[:h])
        assert np.array_equal(decode_png(payload), img)

    @given(
        h=st.integers(1, 12), w=st.integers(1, 12), seed=st.integers(0, 2**31 - 1)
    )
    @settings(max_examples=40, deadline=None)
    def test_bmp_roundtrip_property(h, w, seed):
        img = np.random.default_rng(seed).integers(
            0, 256, (h, w, 3), dtype=np.uint8
        )
        assert np.array_equal(decode_bmp(encode_bmp(img)), img)

except ImportError:  # hypothesis is baked in, but stay import-safe
    pass


def test_sniff_and_dispatch():
    img = np.zeros((2, 2, 3), dtype=np.uint8)
    png, bmp = encode_png(img), encode_bmp(img)
    assert sniff_format(png) == "png" and sniff_format(bmp) == "bmp"
    assert sniff_format(b"\xff\xd8\xff junk") == "jpeg"  # JPEG SOI + marker
    assert sniff_format(b"\xff\xd8 no third ff") is None
    assert np.array_equal(decode_image(png), img)
    assert np.array_equal(decode_image(bmp), img)
    with pytest.raises(UnsupportedMediaError, match="not a format"):
        decode_image(b"RIFFxxxxWAVE")


def test_wav_roundtrip_and_metadata():
    from easy_sql_spark.operators.codecs import decode_wav, encode_wav

    rng = np.random.default_rng(5)
    samples = rng.integers(-30000, 30000, (1600, 2), dtype=np.int16)
    wav = decode_wav(encode_wav(samples, 16000))
    assert (wav["sample_rate"], wav["n_channels"], wav["bits"]) == (16000, 2, 16)
    assert wav["n_frames"] == 1600
    assert wav["duration_s"] == pytest.approx(0.1)
    assert np.array_equal(wav["samples"], samples)
    # mono 1-D input
    mono = decode_wav(encode_wav(samples[:, 0], 8000))
    assert mono["n_channels"] == 1 and np.array_equal(
        mono["samples"][:, 0], samples[:, 0]
    )


def test_wav_rejects_out_of_scope():
    from easy_sql_spark.operators.codecs import decode_wav, encode_wav

    with pytest.raises(UnsupportedMediaError, match="not a RIFF"):
        decode_wav(b"ID3 some mp3-ish bytes")
    payload = bytearray(encode_wav(np.zeros((8, 1), dtype=np.int16), 8000))
    payload[20:22] = struct.pack("<H", 85)  # format tag: MP3
    with pytest.raises(UnsupportedMediaError, match="tag=85"):
        decode_wav(bytes(payload))


def test_gif_roundtrip_multiframe():
    from easy_sql_spark.operators.codecs import decode_gif_frames, encode_gif

    rng = np.random.default_rng(21)
    frames = [
        rng.integers(0, 256, (7, 9), dtype=np.uint8) for _ in range(4)
    ]
    decoded = decode_gif_frames(encode_gif(frames))
    assert len(decoded) == 4
    for orig, out in zip(frames, decoded):
        assert out.shape == (7, 9, 3)
        # grayscale palette: every channel equals the source index
        for c in range(3):
            assert np.array_equal(out[:, :, c], orig)


def test_gif_large_frame_crosses_clear_boundary():
    # >250 pixels forces the encoder's periodic CLEAR path
    from easy_sql_spark.operators.codecs import decode_gif_frames, encode_gif

    img = (np.arange(20 * 30, dtype=np.int64) % 256).astype(np.uint8).reshape(20, 30)
    out = decode_gif_frames(encode_gif([img]))[0]
    assert np.array_equal(out[:, :, 0], img)


def test_gif_rejects_out_of_scope():
    from easy_sql_spark.operators.codecs import decode_gif_frames

    with pytest.raises(UnsupportedMediaError, match="not a GIF"):
        decode_gif_frames(b"RIFF....AVI LIST")


try:
    from hypothesis import given as _given, settings as _settings
    from hypothesis import strategies as _st

    @_given(
        h=_st.integers(1, 10),
        w=_st.integers(1, 10),
        n=_st.integers(1, 4),
        seed=_st.integers(0, 2**31 - 1),
    )
    @_settings(max_examples=25, deadline=None)
    def test_gif_roundtrip_property(h, w, n, seed):
        from easy_sql_spark.operators.codecs import (
            decode_gif_frames,
            encode_gif,
        )

        rng = np.random.default_rng(seed)
        frames = [
            rng.integers(0, 256, (h, w), dtype=np.uint8) for _ in range(n)
        ]
        decoded = decode_gif_frames(encode_gif(frames))
        assert len(decoded) == n
        for orig, out in zip(frames, decoded):
            assert np.array_equal(out[:, :, 0], orig)

    @_given(
        n=_st.integers(1, 500),
        ch=_st.integers(1, 3),
        rate=_st.sampled_from([8000, 16000, 44100]),
        seed=_st.integers(0, 2**31 - 1),
    )
    @_settings(max_examples=25, deadline=None)
    def test_wav_roundtrip_property(n, ch, rate, seed):
        from easy_sql_spark.operators.codecs import decode_wav, encode_wav

        rng = np.random.default_rng(seed)
        samples = rng.integers(-32768, 32768, (n, ch), dtype=np.int16)
        wav = decode_wav(encode_wav(samples, rate))
        assert wav["sample_rate"] == rate and wav["n_frames"] == n
        assert np.array_equal(wav["samples"], samples)

except ImportError:
    pass


def test_truncated_payloads_classified_not_raw_errors():
    """ADVICE r3: truncation must surface as UnsupportedMediaError, never a
    raw IndexError/struct.error/zlib.error escaping the offset walks."""
    from easy_sql_spark.operators.codecs import (
        decode_gif_frames,
        decode_wav,
        encode_gif,
        encode_wav,
    )

    rng = np.random.default_rng(7)
    img = rng.integers(0, 256, (6, 5, 3), dtype=np.uint8)
    png, bmp = encode_png(img), encode_bmp(img)
    wav = encode_wav(np.arange(100, dtype=np.int16), 8000)
    gif = encode_gif([rng.integers(0, 256, (6, 5), dtype=np.uint8)])
    cases = [
        (decode_png, png[: len(png) // 2]),  # mid-IDAT: zlib/size error
        (decode_bmp, bmp[:20]),  # header cut: struct.error
        (decode_bmp, bmp[: len(bmp) // 2]),  # pixel data cut: frombuffer
        (decode_wav, wav[:30]),  # fmt chunk cut: struct.error
        (decode_gif_frames, gif[: len(gif) // 2]),  # sub-block walk off end
    ]
    for fn, payload in cases:
        with pytest.raises(UnsupportedMediaError):
            fn(payload)


def test_decode_image_classifies_garbage_payload():
    """Even when PIL is installed, a corrupt payload must come back as
    UnsupportedMediaError, not a library-specific exception."""
    with pytest.raises(UnsupportedMediaError):
        decode_image(b"\xff\xd8\xffgarbage that is not a real image")


# --------------------------------------------------- PNG extended coverage


def test_png_adam7_and_16bit_roundtrips():
    import numpy as np

    from easy_sql_spark.operators.codecs import decode_png, encode_png

    rng = np.random.default_rng(3)
    for shape in [(13, 17, 1), (13, 17, 3), (9, 5, 4), (1, 1, 3),
                  (8, 8, 2), (7, 1, 3), (1, 9, 1)]:
        img = rng.integers(0, 256, shape, dtype=np.uint8)
        assert np.array_equal(decode_png(encode_png(img)), img)
        assert np.array_equal(
            decode_png(encode_png(img, interlace=True)), img
        ), f"adam7 {shape}"
    img16 = rng.integers(0, 1 << 16, (11, 7, 3), dtype=np.uint16)
    down = (img16 >> 8).astype(np.uint8)
    assert np.array_equal(decode_png(encode_png(img16)), down)
    assert np.array_equal(decode_png(encode_png(img16, interlace=True)), down)


def test_png_sub_byte_gray_and_palette():
    """Hand-packed 1-bit gray and 4-bit palette vectors (our encoder
    writes 8/16-bit only, so the decoder is exercised against spec-built
    bytes, not its own output)."""
    import struct
    import zlib

    import numpy as np

    from easy_sql_spark.operators.codecs import PNG_MAGIC, decode_png

    def chunk(ctype, data):
        crc = zlib.crc32(ctype + data) & 0xFFFFFFFF
        return struct.pack(">I", len(data)) + ctype + data + struct.pack(">I", crc)

    # 1-bit gray, 10x2: row bits 1010101010 -> bytes 0xAA 0x80
    ihdr = struct.pack(">IIBBBBB", 10, 2, 1, 0, 0, 0, 0)
    raw = (b"\x00" + bytes([0b10101010, 0b10000000])) * 2
    payload = (PNG_MAGIC + chunk(b"IHDR", ihdr)
               + chunk(b"IDAT", zlib.compress(raw)) + chunk(b"IEND", b""))
    out = decode_png(payload)
    assert out.shape == (2, 10, 1)
    assert list(out[0, :, 0]) == [255, 0] * 5  # scaled to full range

    # 4-bit palette, 3x1: indices 0,1,2 -> nibbles 0x01 0x20
    ihdr = struct.pack(">IIBBBBB", 3, 1, 4, 3, 0, 0, 0)
    plte = bytes([255, 0, 0, 0, 255, 0, 0, 0, 255])
    raw = b"\x00" + bytes([0x01, 0x20])
    payload = (PNG_MAGIC + chunk(b"IHDR", ihdr) + chunk(b"PLTE", plte)
               + chunk(b"IDAT", zlib.compress(raw)) + chunk(b"IEND", b""))
    out = decode_png(payload)
    assert out.shape == (1, 3, 3)
    assert [tuple(px) for px in out[0]] == [(255, 0, 0), (0, 255, 0), (0, 0, 255)]


def test_png_12bit_depth_rejected():
    import struct
    import zlib

    from easy_sql_spark.operators.codecs import (
        PNG_MAGIC,
        UnsupportedMediaError,
        decode_png,
    )

    def chunk(ctype, data):
        crc = zlib.crc32(ctype + data) & 0xFFFFFFFF
        return struct.pack(">I", len(data)) + ctype + data + struct.pack(">I", crc)

    ihdr = struct.pack(">IIBBBBB", 2, 1, 12, 0, 0, 0, 0)  # illegal depth
    payload = (PNG_MAGIC + chunk(b"IHDR", ihdr)
               + chunk(b"IDAT", zlib.compress(b"\x00\x00\x00"))
               + chunk(b"IEND", b""))
    import pytest

    with pytest.raises(UnsupportedMediaError, match="bit_depth=12"):
        decode_png(payload)


# ------------------------------------------------------------ G.711 WAV


def test_wav_g711_mulaw_alaw_decode():
    import struct

    import numpy as np

    from easy_sql_spark.operators.codecs import (
        _ALAW_TABLE,
        _MULAW_TABLE,
        decode_wav,
    )

    # standard table spot values at the 16-bit linear scale (audioop
    # convention): mu-law 0xFF/0x7F = +-0, 0x00/0x80 = -+32124;
    # A-law 0xD5/0x55 = +-8, 0x2A/0xAA = -+32256... sign per spec
    assert _MULAW_TABLE[0xFF] == 0 and _MULAW_TABLE[0x7F] == 0
    assert _MULAW_TABLE[0x00] == -32124 and _MULAW_TABLE[0x80] == 32124
    assert _ALAW_TABLE[0xD5] == 8 and _ALAW_TABLE[0x55] == -8
    assert abs(int(_ALAW_TABLE[0x2A])) == 32256

    def wav(tag, data, n_ch=1):
        fmt = struct.pack("<HHIIHH", tag, n_ch, 8000, 8000 * n_ch, n_ch, 8)
        return (b"RIFF" + struct.pack("<I", 36 + len(data)) + b"WAVE"
                + b"fmt " + struct.pack("<I", 16) + fmt
                + b"data" + struct.pack("<I", len(data)) + data)

    d = decode_wav(wav(7, bytes([0xFF, 0x00, 0x80])))
    assert list(d["samples"].ravel()) == [0, -32124, 32124]
    assert d["bits"] == 16 and d["sample_rate"] == 8000
    d = decode_wav(wav(6, bytes([0xD5, 0x55]), n_ch=2))
    assert d["n_channels"] == 2 and list(d["samples"].ravel()) == [8, -8]
    # monotone: decoded magnitude grows with chord/step for mu-law
    mags = [abs(int(_MULAW_TABLE[c])) for c in range(0x80, 0x100)][::-1]
    assert mags == sorted(mags)

    import pytest

    from easy_sql_spark.operators.codecs import UnsupportedMediaError

    with pytest.raises(UnsupportedMediaError, match="outside PCM"):
        decode_wav(wav(2, b"\x00\x00"))  # ADPCM still rejected

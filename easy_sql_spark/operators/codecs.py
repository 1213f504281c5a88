"""NumPy-only media codecs for the real decode paths.

The container has no PIL/ffmpeg, but four real container formats are
parseable with the stdlib (`zlib`, `struct`) plus NumPy — enough to give
``decode_media(mode="real")`` / ``frame_sample_real`` genuine decodes
for the formats a pipeline can always fall back to.  Scope:

- PNG: bit depths 1/2/4/8/16, gray / gray+alpha / RGB / RGBA /
  palette, plain AND Adam7-interlaced; all five scanline filters
  (None/Sub/Up/Average/Paeth) undone per (sub-)image.
- BMP: uncompressed (BI_RGB) 24/32-bit BITMAPINFOHEADER, bottom-up or
  top-down.
- WAV: RIFF PCM 8/16/32-bit plus G.711 mu-law/A-law (telephony),
  any channel count (audio).
- GIF: 87a/89a full-frame animations — own LZW decoder (dynamic code
  widths, CLEAR/EOI), global/local palettes (video frame sampling).
- JPEG: baseline sequential AND progressive (SOF2) DCT, Huffman,
  4:4:4/4:2:2/4:2:0, restart markers — full codec in the sibling
  ``jpeg`` module.

Anything else (RLE BMP, arithmetic-coded JPEG, compressed audio,
MP4-class video) raises ``UnsupportedMediaError`` — callers
convert that into the documented NotImplementedError and rows fail
loudly rather than silently mis-decode.

Encoders (``encode_png``/``encode_bmp``/``encode_wav``/``encode_gif``)
exist so tests can round-trip arrays through real container bytes
without any media library.
"""

from __future__ import annotations

import functools
import struct
import zlib

import numpy as np

PNG_MAGIC = b"\x89PNG\r\n\x1a\n"
BMP_MAGIC = b"BM"


class UnsupportedMediaError(ValueError):
    """Payload is not a format the numpy-only codecs handle."""


def _classified(fn):
    """Re-raise truncation/garbage errors from offset walks (IndexError,
    struct.error, zlib.error, short np.frombuffer) as UnsupportedMediaError
    so callers get the one documented fail-loudly exception class."""

    @functools.wraps(fn)
    def wrapper(*args, **kwargs):
        try:
            return fn(*args, **kwargs)
        except UnsupportedMediaError:
            raise
        except (IndexError, KeyError, ValueError, struct.error, zlib.error) as e:
            raise UnsupportedMediaError(
                f"truncated or malformed payload ({type(e).__name__}: {e})"
            ) from e

    return wrapper


def sniff_format(payload: bytes) -> str | None:
    if payload[:8] == PNG_MAGIC:
        return "png"
    if payload[:2] == BMP_MAGIC:
        return "bmp"
    if payload[:4] == b"GIF8":
        return "gif"
    if payload[:3] == b"\xff\xd8\xff":
        return "jpeg"
    return None


# --------------------------------------------------------------------- PNG
_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}  # color type -> samples/pixel


#: Adam7 pass geometry: (x_start, y_start, x_step, y_step) per pass.
_ADAM7 = [
    (0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
    (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2),
]

#: bit depths legal per color type (PNG spec §11.2.2)
_PNG_DEPTHS = {0: {1, 2, 4, 8, 16}, 2: {8, 16}, 3: {1, 2, 4, 8},
               4: {8, 16}, 6: {8, 16}}


def _png_unfilter(raw: bytes, h: int, stride: int, bpp: int) -> np.ndarray:
    """Undo per-scanline filters over one (sub-)image: ``raw`` holds h
    scanlines of (1 filter byte + stride data bytes); ``bpp`` is the
    FILTER unit (bytes per pixel, >=1).  Returns (h, stride) uint8."""
    if len(raw) != h * (stride + 1):
        raise UnsupportedMediaError("PNG IDAT size mismatch")
    arr = np.frombuffer(raw, dtype=np.uint8).reshape(h, stride + 1)
    filters, lines = arr[:, 0], arr[:, 1:].astype(np.int32)
    out = np.zeros((h, stride), dtype=np.uint8)
    for y in range(h):
        line = lines[y].copy()
        prev = out[y - 1].astype(np.int32) if y else np.zeros(stride, np.int32)
        f = filters[y]
        if f == 0:  # None
            cur = line
        elif f == 2:  # Up
            cur = (line + prev) & 0xFF
        else:  # Sub / Average / Paeth need the running left neighbor
            cur = np.zeros(stride, dtype=np.int32)
            for x in range(stride):
                a = cur[x - bpp] if x >= bpp else 0
                b = prev[x]
                if f == 1:  # Sub
                    cur[x] = (line[x] + a) & 0xFF
                elif f == 3:  # Average
                    cur[x] = (line[x] + ((a + b) >> 1)) & 0xFF
                elif f == 4:  # Paeth
                    c = prev[x - bpp] if x >= bpp else 0
                    p = a + b - c
                    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                    pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                    cur[x] = (line[x] + pred) & 0xFF
                else:
                    raise UnsupportedMediaError(f"PNG filter {f}")
        out[y] = cur.astype(np.uint8)
    return out


def _png_samples(rows: np.ndarray, w: int, nch: int, depth: int) -> np.ndarray:
    """(h, stride) filtered-out bytes -> (h, w, nch) uint8 samples.
    16-bit channels keep the high byte (the standard 8-bit downsample);
    1/2/4-bit packed rows unpack MSB-first and SCALE gray to full range
    (palette indices stay raw)."""
    h = rows.shape[0]
    if depth == 8:
        return rows.reshape(h, w, nch)
    if depth == 16:
        return rows.reshape(h, w, nch, 2)[:, :, :, 0]
    # sub-byte: always single channel (gray or palette index)
    bits = np.unpackbits(rows, axis=1)
    per = bits[:, : w * depth].reshape(h, w, depth)
    vals = np.zeros((h, w), dtype=np.uint8)
    for i in range(depth):
        vals = (vals << 1) | per[:, :, i]
    return vals[:, :, None]


@_classified
def decode_png(payload: bytes) -> np.ndarray:
    """Decode a PNG to an (H, W, C) uint8 array.  Full fixed-scope
    coverage: bit depths 1/2/4/8/16, all five color types, and Adam7
    interlacing (each of the 7 passes is its own filtered sub-image,
    unfiltered independently then scattered on the pass grid)."""
    if payload[:8] != PNG_MAGIC:
        raise UnsupportedMediaError("not a PNG")
    pos, width, height, bit_depth, color_type, interlace = 8, 0, 0, 0, 0, 0
    idat = bytearray()
    palette: np.ndarray | None = None
    while pos + 8 <= len(payload):
        length, ctype = struct.unpack(">I4s", payload[pos : pos + 8])
        data = payload[pos + 8 : pos + 8 + length]
        pos += 12 + length  # length + type + data + crc
        if ctype == b"IHDR":
            width, height, bit_depth, color_type, _comp, _filt, interlace = (
                struct.unpack(">IIBBBBB", data)
            )
        elif ctype == b"PLTE":
            palette = np.frombuffer(data, dtype=np.uint8).reshape(-1, 3)
        elif ctype == b"IDAT":
            idat.extend(data)
        elif ctype == b"IEND":
            break
    if (
        color_type not in _CHANNELS
        or bit_depth not in _PNG_DEPTHS.get(color_type, set())
        or interlace not in (0, 1)
    ):
        raise UnsupportedMediaError(
            f"PNG bit_depth={bit_depth} color_type={color_type} "
            f"interlace={interlace} outside numpy-codec scope"
        )
    nch = _CHANNELS[color_type]
    bpp = max(1, nch * bit_depth // 8)
    raw = zlib.decompress(bytes(idat))

    def sub_image(w: int, h: int, chunk: bytes) -> np.ndarray:
        stride = (w * nch * bit_depth + 7) // 8
        return _png_samples(
            _png_unfilter(chunk, h, stride, bpp), w, nch, bit_depth
        )

    if interlace == 0:
        stride = (width * nch * bit_depth + 7) // 8
        img = sub_image(width, height, raw)
    else:  # Adam7
        img = np.zeros((height, width, nch), dtype=np.uint8)
        off = 0
        for xs, ys, xst, yst in _ADAM7:
            pw = (width - xs + xst - 1) // xst
            ph = (height - ys + yst - 1) // yst
            if pw <= 0 or ph <= 0:
                continue
            stride = (pw * nch * bit_depth + 7) // 8
            size = ph * (stride + 1)
            img[ys::yst, xs::xst] = sub_image(pw, ph, raw[off : off + size])
            off += size
        if off != len(raw):
            raise UnsupportedMediaError("PNG Adam7 pass size mismatch")

    if color_type == 3:
        if palette is None:
            raise UnsupportedMediaError("palette PNG without PLTE")
        return palette[img[:, :, 0]]
    if bit_depth in (1, 2, 4) and color_type == 0:
        # scale sub-byte gray to full 0..255 range (e.g. 1-bit: 0/255)
        img = (img.astype(np.uint32) * 255 // ((1 << bit_depth) - 1)).astype(
            np.uint8
        )
    return img


def encode_png(img: np.ndarray, interlace: bool = False) -> bytes:
    """Encode an (H, W) or (H, W, C) array as PNG (filter 0 scanlines).
    uint8 input writes bit depth 8; uint16 writes a true 16-bit PNG
    (big-endian samples).  ``interlace`` emits Adam7: the seven passes'
    scanlines in pass order, each filtered independently — the layout
    :func:`decode_png` round-trips."""
    if img.ndim == 2:
        img = img[:, :, None]
    depth = 16 if img.dtype == np.uint16 else 8
    h, w, c = img.shape
    color_type = {1: 0, 2: 4, 3: 2, 4: 6}[c]
    ihdr = struct.pack(
        ">IIBBBBB", w, h, depth, color_type, 0, 0, 1 if interlace else 0
    )

    def scanlines(sub: np.ndarray) -> bytes:
        conv = sub.astype(">u2") if depth == 16 else sub
        return b"".join(b"\x00" + conv[y].tobytes() for y in range(sub.shape[0]))

    if interlace:
        raw = b"".join(
            scanlines(img[ys::yst, xs::xst])
            for xs, ys, xst, yst in _ADAM7
            if img[ys::yst, xs::xst].size
        )
    else:
        raw = scanlines(img)

    def chunk(ctype: bytes, data: bytes) -> bytes:
        crc = zlib.crc32(ctype + data) & 0xFFFFFFFF
        return struct.pack(">I", len(data)) + ctype + data + struct.pack(">I", crc)

    return (
        PNG_MAGIC
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )


# --------------------------------------------------------------------- BMP
@_classified
def decode_bmp(payload: bytes) -> np.ndarray:
    """Decode an uncompressed 24/32-bit BMP to an (H, W, 3|4) uint8 array
    in RGB(A) channel order."""
    if payload[:2] != BMP_MAGIC:
        raise UnsupportedMediaError("not a BMP")
    data_offset = struct.unpack("<I", payload[10:14])[0]
    header_size = struct.unpack("<I", payload[14:18])[0]
    if header_size < 40:
        raise UnsupportedMediaError("BMP core header outside scope")
    width, height = struct.unpack("<ii", payload[18:26])
    planes, bpp = struct.unpack("<HH", payload[26:30])
    compression = struct.unpack("<I", payload[30:34])[0]
    if compression != 0 or bpp not in (24, 32) or planes != 1:
        raise UnsupportedMediaError(
            f"BMP bpp={bpp} compression={compression} outside scope"
        )
    nch = bpp // 8
    bottom_up = height > 0
    height = abs(height)
    row_bytes = (width * nch + 3) & ~3  # rows pad to 4-byte boundaries
    pixels = np.frombuffer(
        payload, dtype=np.uint8, count=height * row_bytes, offset=data_offset
    ).reshape(height, row_bytes)[:, : width * nch].reshape(height, width, nch)
    if bottom_up:
        pixels = pixels[::-1]
    # BGR(A) on disk -> RGB(A)
    rgb = pixels[:, :, [2, 1, 0]] if nch == 3 else pixels[:, :, [2, 1, 0, 3]]
    return np.ascontiguousarray(rgb)


def encode_bmp(img: np.ndarray) -> bytes:
    """Encode an (H, W, 3) uint8 RGB array as a bottom-up 24-bit BMP."""
    h, w, c = img.shape
    if c != 3:
        raise ValueError("encode_bmp expects RGB")
    row_bytes = (w * 3 + 3) & ~3
    rows = bytearray()
    bgr = img[:, :, [2, 1, 0]]
    pad = b"\x00" * (row_bytes - w * 3)
    for y in range(h - 1, -1, -1):  # bottom-up
        rows += bgr[y].tobytes() + pad
    data_offset = 14 + 40
    file_size = data_offset + len(rows)
    return (
        b"BM"
        + struct.pack("<IHHI", file_size, 0, 0, data_offset)
        + struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(rows), 2835, 2835, 0, 0)
        + bytes(rows)
    )


# --------------------------------------------------------------------- WAV
def _build_mulaw_table() -> np.ndarray:
    """ITU-T G.711 mu-law byte -> linear int16 (the standard expansion:
    invert bits, split sign/exponent/mantissa, rebias by 0x84)."""
    out = np.zeros(256, dtype=np.int16)
    for code in range(256):
        u = ~code & 0xFF
        sign = u & 0x80
        exp = (u >> 4) & 0x07
        mant = u & 0x0F
        mag = ((mant << 3) + 0x84) << exp
        mag -= 0x84
        out[code] = -mag if sign else mag
    return out


def _build_alaw_table() -> np.ndarray:
    """ITU-T G.711 A-law byte -> linear int16 (0x55 XOR unmasking,
    13-bit magnitude scaled to 16-bit by << 3... kept at the standard
    x8 linear scale so A-law and mu-law decode to comparable ranges)."""
    out = np.zeros(256, dtype=np.int16)
    for code in range(256):
        a = code ^ 0x55
        sign = a & 0x80
        exp = (a >> 4) & 0x07
        mant = a & 0x0F
        if exp == 0:
            mag = (mant << 4) + 8
        else:
            mag = ((mant << 4) + 0x108) << (exp - 1)
        # A-law sign convention is INVERTED vs mu-law: MSB set = positive
        out[code] = mag if sign else -mag
    return out


_MULAW_TABLE = _build_mulaw_table()
_ALAW_TABLE = _build_alaw_table()


@_classified
def decode_wav(payload: bytes) -> dict:
    """Parse a RIFF/WAVE PCM payload: format metadata plus per-channel
    samples as an (n_frames, n_channels) array.

    Scope: uncompressed PCM (format tag 1) at 8/16/32-bit depth — the
    interchange format a pipeline can always fall back to.  Compressed
    audio (MP3/AAC/FLAC...) raises ``UnsupportedMediaError``; with no
    ffmpeg in the container that part stays an honest stub.
    """
    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise UnsupportedMediaError("not a RIFF/WAVE payload")
    pos, fmt, data = 12, None, None
    while pos + 8 <= len(payload):
        cid, size = struct.unpack("<4sI", payload[pos : pos + 8])
        body = payload[pos + 8 : pos + 8 + size]
        pos += 8 + size + (size & 1)  # chunks pad to even offsets
        if cid == b"fmt ":
            fmt = struct.unpack("<HHIIHH", body[:16])
        elif cid == b"data":
            data = body
    if fmt is None or data is None:
        raise UnsupportedMediaError("WAV missing fmt/data chunk")
    tag, n_ch, rate, _byte_rate, block, bits = fmt
    if n_ch < 1:
        raise UnsupportedMediaError("WAV with zero channels")
    if tag in (6, 7):  # G.711 A-law / mu-law: telephony corpora
        if bits != 8:
            raise UnsupportedMediaError(f"G.711 WAV with bits={bits}")
        n_frames = len(data) // block
        codes = np.frombuffer(data, dtype=np.uint8, count=n_frames * n_ch)
        table = _ALAW_TABLE if tag == 6 else _MULAW_TABLE
        samples = table[codes].reshape(n_frames, n_ch)
        bits = 16  # decoded width
    elif tag == 1 and bits in (8, 16, 32):
        dtype = {8: np.uint8, 16: np.int16, 32: np.int32}[bits]
        n_frames = len(data) // block
        samples = np.frombuffer(
            data, dtype=dtype, count=n_frames * n_ch
        ).reshape(n_frames, n_ch)
    else:
        raise UnsupportedMediaError(
            f"WAV format tag={tag} bits={bits} outside PCM/G.711 scope"
        )
    return {
        "sample_rate": rate,
        "n_channels": n_ch,
        "bits": bits,
        "n_frames": n_frames,
        "duration_s": n_frames / rate if rate else 0.0,
        "samples": samples,
    }


def encode_wav(samples: np.ndarray, sample_rate: int) -> bytes:
    """Encode an (n_frames, n_channels) int16 array as PCM WAV."""
    if samples.dtype != np.int16:
        raise ValueError("encode_wav expects int16 samples")
    if samples.ndim == 1:
        samples = samples[:, None]
    n_frames, n_ch = samples.shape
    data = samples.astype("<i2").tobytes()
    block = n_ch * 2
    fmt = (
        b"RIFF"
        + struct.pack("<I", 36 + len(data))
        + b"WAVE"
        + b"fmt "
        + struct.pack("<IHHIIHH", 16, 1, n_ch, sample_rate, sample_rate * block, block, 16)
    )
    return fmt + b"data" + struct.pack("<I", len(data)) + data


# --------------------------------------------------------------------- GIF
GIF_MAGIC = b"GIF8"


def _lzw_decode(data: bytes, min_code_size: int, n_pixels: int) -> np.ndarray:
    """GIF-variant LZW: LSB-first bit packing, dynamic code width,
    CLEAR/EOI codes.  Returns exactly ``n_pixels`` palette indices."""
    clear, eoi = 1 << min_code_size, (1 << min_code_size) + 1
    out = np.empty(n_pixels, dtype=np.uint8)
    n_out = 0
    # bit reader over the whole stream
    bits = np.unpackbits(
        np.frombuffer(data, dtype=np.uint8), bitorder="little"
    )
    pos = 0

    def reset_table():
        return {i: bytes([i]) for i in range(clear)}, clear + 2, min_code_size + 1

    table, next_code, width = reset_table()
    prev: bytes | None = None
    while pos + width <= len(bits):
        code = int(np.packbits(bits[pos : pos + width], bitorder="little")[0]) \
            if width <= 8 else int.from_bytes(
                np.packbits(
                    np.pad(bits[pos : pos + width], (0, 16 - width)),
                    bitorder="little",
                ).tobytes(),
                "little",
            )
        pos += width
        if code == clear:
            table, next_code, width = reset_table()
            prev = None
            continue
        if code == eoi:
            break
        if code in table:
            entry = table[code]
        elif code == next_code and prev is not None:
            entry = prev + prev[:1]
        else:
            raise UnsupportedMediaError(f"GIF LZW bad code {code}")
        take = min(len(entry), n_pixels - n_out)
        out[n_out : n_out + take] = np.frombuffer(entry[:take], dtype=np.uint8)
        n_out += take
        if n_out >= n_pixels:
            break
        if prev is not None and next_code < 4096:
            table[next_code] = prev + entry[:1]
            next_code += 1
            if next_code == (1 << width) and width < 12:
                width += 1
        prev = entry
    if n_out != n_pixels:
        raise UnsupportedMediaError(
            f"GIF LZW produced {n_out} of {n_pixels} pixels"
        )
    return out


@_classified
def decode_gif_frames(payload: bytes) -> list[np.ndarray]:
    """Decode a GIF87a/89a into a list of (H, W, 3) uint8 frames.

    Scope: global color table, full-frame images, no interlace, no
    transparency compositing (each frame decodes standalone) — the shape
    our encoder writes and typical screen-capture GIFs use."""
    if payload[:4] != GIF_MAGIC:
        raise UnsupportedMediaError("not a GIF")
    width, height = struct.unpack("<HH", payload[6:10])
    packed = payload[10]
    gct_size = 2 << (packed & 0x07)
    pos = 13
    palette = None
    if packed & 0x80:
        palette = np.frombuffer(
            payload, dtype=np.uint8, count=gct_size * 3, offset=pos
        ).reshape(-1, 3)
        pos += gct_size * 3
    frames: list[np.ndarray] = []
    while pos < len(payload):
        b = payload[pos]
        if b == 0x3B:  # trailer
            break
        if b == 0x21:  # extension: skip sub-blocks
            pos += 2
            while payload[pos] != 0:
                pos += 1 + payload[pos]
            pos += 1
            continue
        if b != 0x2C:
            raise UnsupportedMediaError(f"GIF unknown block 0x{b:02x}")
        x, y, w, h = struct.unpack("<HHHH", payload[pos + 1 : pos + 9])
        ipacked = payload[pos + 9]
        pos += 10
        if ipacked & 0x40:
            raise UnsupportedMediaError("interlaced GIF outside scope")
        pal = palette
        if ipacked & 0x80:  # local color table
            lct_size = 2 << (ipacked & 0x07)
            pal = np.frombuffer(
                payload, dtype=np.uint8, count=lct_size * 3, offset=pos
            ).reshape(-1, 3)
            pos += lct_size * 3
        if pal is None:
            raise UnsupportedMediaError("GIF without color table")
        if (x, y, w, h) != (0, 0, width, height):
            raise UnsupportedMediaError("partial-frame GIF outside scope")
        min_code_size = payload[pos]
        pos += 1
        data = bytearray()
        while payload[pos] != 0:
            n = payload[pos]
            data += payload[pos + 1 : pos + 1 + n]
            pos += 1 + n
        pos += 1
        idx = _lzw_decode(bytes(data), min_code_size, width * height)
        frames.append(pal[idx.reshape(height, width)])
    if not frames:
        raise UnsupportedMediaError("GIF contains no image blocks")
    return frames


def encode_gif(frames: list[np.ndarray]) -> bytes:
    """Encode (H, W) uint8 PALETTE-INDEX frames (grayscale palette) as an
    animated GIF using 'uncompressed' LZW (literal codes, CLEAR emitted
    before the code width would grow) — real container bytes without a
    compression implementation."""
    h, w = frames[0].shape
    out = bytearray(b"GIF89a")
    out += struct.pack("<HH", w, h)
    out += bytes([0x80 | 0x07, 0, 0])  # GCT present, 256 entries
    for i in range(256):  # grayscale palette
        out += bytes([i, i, i])
    for frame in frames:
        if frame.shape != (h, w):
            raise ValueError("all frames must share dimensions")
        out += b"\x2c" + struct.pack("<HHHH", 0, 0, w, h) + b"\x00"
        out += bytes([8])  # LZW min code size (palette indices are bytes)
        clear, width_bits = 256, 9
        bits: list[int] = []

        def emit(code: int) -> None:
            for k in range(width_bits):
                bits.append((code >> k) & 1)

        emit(clear)
        for j, px in enumerate(frame.flatten()):
            # re-CLEAR before the decoder's table reaches a width bump:
            # after CLEAR the table holds 258 codes; each literal adds one
            if j % 250 == 0 and j:
                emit(clear)
            emit(int(px))
        emit(clear + 1)  # EOI
        arr = np.array(bits, dtype=np.uint8)
        data = np.packbits(arr, bitorder="little").tobytes()
        for off in range(0, len(data), 255):
            chunk = data[off : off + 255]
            out += bytes([len(chunk)]) + chunk
        out += b"\x00"
    out += b"\x3b"
    return bytes(out)


def decode_image(payload: bytes) -> np.ndarray:
    """Dispatch on magic bytes; PIL (when importable) first for coverage
    beyond the numpy codecs.  A PIL failure on a corrupt or out-of-scope
    payload falls through to the numpy codecs, so callers always get the
    documented UnsupportedMediaError classification rather than a
    library-specific exception."""
    try:  # optional, absent in this container
        import io

        from PIL import Image  # type: ignore
    except ImportError:
        Image = None
    if Image is not None:
        try:
            return np.asarray(Image.open(io.BytesIO(payload)).convert("RGB"))
        except Exception:
            pass  # let the numpy codecs classify the payload below
    fmt = sniff_format(payload)
    if fmt == "png":
        return decode_png(payload)
    if fmt == "bmp":
        return decode_bmp(payload)
    if fmt == "gif":
        return decode_gif_frames(payload)[0]
    if fmt == "jpeg":
        from .jpeg import decode_jpeg

        return decode_jpeg(payload)
    raise UnsupportedMediaError(
        "payload is not a format the available codecs handle"
    )

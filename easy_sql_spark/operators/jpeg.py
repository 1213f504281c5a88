"""NumPy-only baseline JPEG codec (ITU T.81 sequential DCT, Huffman).

Real image corpora are overwhelmingly JPEG, and this container has no
PIL/ffmpeg — so the decode path that `decode_media(mode="real")` and the
multimodal queries run on needs a genuine JPEG implementation, same as
the PNG/BMP/GIF/WAV codecs in `codecs.py` (reference parity: the
reference ships no codecs at all; this backs the training-data-pipeline
multimodal surface).

Scope:

- decode: baseline sequential (SOF0/SOF1) AND progressive (SOF2)
  frames — real web corpora are majority-progressive.  8-bit precision,
  1 or 3 components, any sampling factors up to 2x2 (4:4:4, 4:2:2,
  4:2:0 and transposed), Huffman entropy coding with tables read from
  DHT, restart markers (DRI/RSTn), byte-stuffed entropy data,
  multi-scan accumulation (spectral selection Ss..Se bands, successive
  approximation Ah/Al with DC and AC refinement passes, EOBn run
  coding).  Output is (H, W, 3) uint8 RGB for color frames, (H, W, 1)
  for grayscale.
- encode: quality-scaled Annex-K quantization tables, standard Annex-K
  Huffman tables (embedded in DHT so any conformant decoder can read
  the output), 4:4:4 or 4:2:0 subsampling, optional restart interval;
  ``encode_jpeg_progressive`` emits an SOF2 stream covering all four
  progressive entropy paths for round-trip testing.

Arithmetic coding, 12-bit precision, lossless and hierarchical frames
raise ``UnsupportedMediaError`` — rows fail loudly rather than silently
mis-decode (same contract as codecs.py).

JPEG is lossy: round-trip tests assert bounded per-pixel error at high
quality, not bit equality (see tests/test_codecs.py).
"""

from __future__ import annotations

import struct

import numpy as np

from .codecs import UnsupportedMediaError, _classified

JPEG_MAGIC = b"\xff\xd8\xff"

# ----------------------------------------------------------- shared tables

# Zigzag scan order: position k in the scan -> (row, col) in the block.
_ZZ: list[tuple[int, int]] = []
for _s in range(15):
    _rng = range(max(0, _s - 7), min(_s, 7) + 1)
    for _r in _rng if _s % 2 else reversed(_rng):
        _ZZ.append((_r, _s - _r))
_ZZ_ROWS = np.array([r for r, _ in _ZZ])
_ZZ_COLS = np.array([c for _, c in _ZZ])

# Orthonormal 8-point DCT-II matrix: F = _DCT_M @ f @ _DCT_M.T
_DCT_M = np.zeros((8, 8))
for _u in range(8):
    for _x in range(8):
        _c = (1 / np.sqrt(2)) if _u == 0 else 1.0
        _DCT_M[_u, _x] = 0.5 * _c * np.cos((2 * _x + 1) * _u * np.pi / 16)

# Annex K.1 quantization tables (quality 50), in natural (row-major) order.
_Q_LUMA = np.array([
    [16, 11, 10, 16, 24, 40, 51, 61],
    [12, 12, 14, 19, 26, 58, 60, 55],
    [14, 13, 16, 24, 40, 57, 69, 56],
    [14, 17, 22, 29, 51, 87, 80, 62],
    [18, 22, 37, 56, 68, 109, 103, 77],
    [24, 35, 55, 64, 81, 104, 113, 92],
    [49, 64, 78, 87, 103, 121, 120, 101],
    [72, 92, 95, 98, 112, 100, 103, 99],
], dtype=np.int32)
_Q_CHROMA = np.array([
    [17, 18, 24, 47, 99, 99, 99, 99],
    [18, 21, 26, 66, 99, 99, 99, 99],
    [24, 26, 56, 99, 99, 99, 99, 99],
    [47, 66, 99, 99, 99, 99, 99, 99],
    [99, 99, 99, 99, 99, 99, 99, 99],
    [99, 99, 99, 99, 99, 99, 99, 99],
    [99, 99, 99, 99, 99, 99, 99, 99],
    [99, 99, 99, 99, 99, 99, 99, 99],
], dtype=np.int32)

# Annex K.3 Huffman table specs: (bits[1..16], huffval).
_DC_LUMA_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
_DC_LUMA_VALS = list(range(12))
_DC_CHROMA_BITS = [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0]
_DC_CHROMA_VALS = list(range(12))
_AC_LUMA_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
_AC_LUMA_VALS = [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12,
    0x21, 0x31, 0x41, 0x06, 0x13, 0x51, 0x61, 0x07,
    0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
    0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0,
    0x24, 0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16,
    0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39,
    0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49,
    0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69,
    0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98,
    0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7,
    0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
    0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5,
    0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4,
    0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
    0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA,
    0xF1, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
    0xF9, 0xFA,
]
_AC_CHROMA_BITS = [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77]
_AC_CHROMA_VALS = [
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21,
    0x31, 0x06, 0x12, 0x41, 0x51, 0x07, 0x61, 0x71,
    0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
    0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0,
    0x15, 0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34,
    0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
    0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38,
    0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48,
    0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
    0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68,
    0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
    0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
    0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96,
    0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
    0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
    0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3,
    0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2,
    0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9,
    0xEA, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
    0xF9, 0xFA,
]


def _build_huff_lut(bits: list[int], vals: list[int]) -> dict[tuple[int, int], int]:
    """Canonical JPEG Huffman codes: (code_length, code) -> symbol."""
    lut: dict[tuple[int, int], int] = {}
    code, k = 0, 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            if k >= len(vals):
                raise UnsupportedMediaError("DHT bits/vals mismatch")
            lut[(length, code)] = vals[k]
            k += 1
            code += 1
        code <<= 1
    return lut


def _build_huff_codes(bits: list[int], vals: list[int]) -> dict[int, tuple[int, int]]:
    """Encoder direction: symbol -> (code, code_length)."""
    codes: dict[int, tuple[int, int]] = {}
    code, k = 0, 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            codes[vals[k]] = (code, length)
            k += 1
            code += 1
        code <<= 1
    return codes


# ----------------------------------------------------------------- decoder


class _BitReader:
    """MSB-first bit reader over byte-stuffed entropy-coded data."""

    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self.buf = 0
        self.nbits = 0

    def _fill(self) -> None:
        b = self.data[self.pos]
        self.pos += 1
        if b == 0xFF:
            nxt = self.data[self.pos]
            if nxt == 0x00:
                self.pos += 1  # stuffed byte
            else:
                # A real marker inside entropy data (premature EOI/RST):
                # per T.81 the decoder treats missing bits as an error.
                raise UnsupportedMediaError(
                    f"marker 0xFF{nxt:02X} inside entropy-coded segment"
                )
        self.buf = b
        self.nbits = 8

    def read_bit(self) -> int:
        if self.nbits == 0:
            self._fill()
        self.nbits -= 1
        return (self.buf >> self.nbits) & 1

    def read_bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def restart(self) -> None:
        """Byte-align and consume an RSTn marker."""
        self.nbits = 0
        if self.data[self.pos] != 0xFF or not (0xD0 <= self.data[self.pos + 1] <= 0xD7):
            raise UnsupportedMediaError("expected restart marker")
        self.pos += 2


def _read_huff(reader: _BitReader, lut: dict[tuple[int, int], int]) -> int:
    code = 0
    for length in range(1, 17):
        code = (code << 1) | reader.read_bit()
        sym = lut.get((length, code))
        if sym is not None:
            return sym
    raise UnsupportedMediaError("invalid Huffman code in entropy data")


def _extend(v: int, t: int) -> int:
    """T.81 F.2.2.1 EXTEND: map t-bit magnitude to signed value."""
    if t == 0:
        return 0
    return v - (1 << t) + 1 if v < (1 << (t - 1)) else v


def _decode_block(
    reader: _BitReader,
    dc_lut: dict[tuple[int, int], int],
    ac_lut: dict[tuple[int, int], int],
    pred: int,
) -> tuple[np.ndarray, int]:
    zz = np.zeros(64, dtype=np.int32)
    t = _read_huff(reader, dc_lut)
    pred += _extend(reader.read_bits(t), t)
    zz[0] = pred
    k = 1
    while k < 64:
        rs = _read_huff(reader, ac_lut)
        r, s = rs >> 4, rs & 0x0F
        if s == 0:
            if r == 15:  # ZRL: sixteen zeros
                k += 16
                continue
            break  # EOB
        k += r
        if k > 63:
            raise UnsupportedMediaError("AC run past end of block")
        zz[k] = _extend(reader.read_bits(s), s)
        k += 1
    return zz, pred


def _idct_plane(coeffs: np.ndarray, qtab: np.ndarray) -> np.ndarray:
    """(bh, bw, 64) zigzag coefficients -> (bh*8, bw*8) uint8 plane.
    Vectorized over all blocks: one fancy-index dezigzag, one einsum for
    the 2-D IDCT — no per-block Python loop on the hot path."""
    bh, bw = coeffs.shape[:2]
    blocks = np.zeros((bh, bw, 8, 8), dtype=np.float64)
    blocks[:, :, _ZZ_ROWS, _ZZ_COLS] = coeffs
    blocks *= qtab
    pix = np.einsum("ab,ijbc,cd->ijad", _DCT_M.T, blocks, _DCT_M) + 128.0
    pix = np.clip(np.round(pix), 0, 255).astype(np.uint8)
    return pix.transpose(0, 2, 1, 3).reshape(bh * 8, bw * 8)


def _decode_ac_first(reader, ac_lut, coef, ss, se, al, eobrun) -> int:
    """T.81 G.1.2.2: first pass over an AC spectral band.  ``eobrun``
    counts FOLLOWING all-zero bands (EOBn run-length coding)."""
    if eobrun > 0:
        return eobrun - 1
    k = ss
    while k <= se:
        rs = _read_huff(reader, ac_lut)
        r, s = rs >> 4, rs & 0x0F
        if s == 0:
            if r == 15:  # ZRL
                k += 16
                continue
            eobrun = (1 << r) - 1
            if r:
                eobrun += reader.read_bits(r)
            break
        k += r
        if k > se:
            raise UnsupportedMediaError("AC run past end of band")
        coef[k] = _extend(reader.read_bits(s), s) << al
        k += 1
    return eobrun


def _refine_bit(reader, coef, k, p1, m1) -> None:
    """Append one correction bit to an already-nonzero coefficient."""
    if reader.read_bit() and (int(coef[k]) & p1) == 0:
        coef[k] += p1 if coef[k] >= 0 else m1


def _decode_ac_refine(reader, ac_lut, coef, ss, se, al, eobrun) -> int:
    """T.81 G.1.2.3: successive-approximation refinement of an AC band.
    Interleaves new-coefficient symbols with correction bits for
    coefficients already nonzero from earlier scans.  Unlike the first
    pass, an EOBn here INCLUDES the current band (its tail still needs
    correction bits), hence ``1 << r`` and the post-loop decrement."""
    p1 = 1 << al
    m1 = -1 << al
    k = ss
    if eobrun == 0:
        while k <= se:
            rs = _read_huff(reader, ac_lut)
            r, s = rs >> 4, rs & 0x0F
            newval = 0
            if s == 0:
                if r != 15:
                    eobrun = 1 << r
                    if r:
                        eobrun += reader.read_bits(r)
                    break
                # ZRL: advance past 16 zero-history coefficients
            else:
                if s != 1:
                    raise UnsupportedMediaError(
                        "AC refinement magnitude must be 1"
                    )
                newval = p1 if reader.read_bit() else m1
            while k <= se:
                if coef[k]:
                    _refine_bit(reader, coef, k, p1, m1)
                else:
                    if r == 0:
                        break
                    r -= 1
                k += 1
            if s and k <= se:
                coef[k] = newval
            k += 1
    if eobrun > 0:
        while k <= se:
            if coef[k]:
                _refine_bit(reader, coef, k, p1, m1)
            k += 1
        eobrun -= 1
    return eobrun


def _next_marker(payload: bytes, pos: int) -> int:
    """Offset of the next real marker at/after ``pos`` (skips entropy
    remnants, pad bits, stuffed 0xFF00 and RSTn)."""
    n = len(payload)
    while pos < n - 1:
        if (
            payload[pos] == 0xFF
            and payload[pos + 1] != 0x00
            and not (0xD0 <= payload[pos + 1] <= 0xD7)
        ):
            return pos
        pos += 1
    return n


def _decode_scan(
    payload: bytes,
    start: int,
    scan: list[tuple[int, int, int]],
    ss: int,
    se: int,
    ah: int,
    al: int,
    progressive: bool,
    coeffs: dict[int, np.ndarray],
    comp_info: dict[int, tuple[int, int, int]],
    nblocks: dict[int, tuple[int, int]],
    mcus: tuple[int, int],
    dc_luts: dict[int, dict],
    ac_luts: dict[int, dict],
    restart_interval: int,
) -> int:
    """Decode one scan's entropy data into the coefficient arrays;
    returns the offset of the next marker."""
    reader = _BitReader(payload, start)
    preds = {cs: 0 for cs, _, _ in scan}
    state = {"eobrun": 0}

    def do_block(cs: int, td: int, ta: int, by: int, bx: int) -> None:
        coef = coeffs[cs][by, bx]
        if not progressive:
            zz, preds[cs] = _decode_block(
                reader, dc_luts[td], ac_luts[ta], preds[cs]
            )
            coef[:] = zz
        elif ss == 0 and ah == 0:  # DC first (G.1.2.1)
            t = _read_huff(reader, dc_luts[td])
            preds[cs] += _extend(reader.read_bits(t), t)
            coef[0] = preds[cs] << al
        elif ss == 0:  # DC refinement: one bit per block
            coef[0] |= reader.read_bit() << al
        elif ah == 0:
            state["eobrun"] = _decode_ac_first(
                reader, ac_luts[ta], coef, ss, se, al, state["eobrun"]
            )
        else:
            state["eobrun"] = _decode_ac_refine(
                reader, ac_luts[ta], coef, ss, se, al, state["eobrun"]
            )

    def do_restart() -> None:
        reader.restart()
        for c in preds:
            preds[c] = 0
        state["eobrun"] = 0

    unit = 0
    if len(scan) == 1:
        # non-interleaved: the component's OWN block raster (ceil dims),
        # which is smaller than the MCU-padded grid when sampling > 1x1
        cs, td, ta = scan[0]
        h_b, w_b = nblocks[cs]
        for by in range(h_b):
            for bx in range(w_b):
                if restart_interval and unit and unit % restart_interval == 0:
                    do_restart()
                do_block(cs, td, ta, by, bx)
                unit += 1
    else:
        mcus_x, mcus_y = mcus
        for my in range(mcus_y):
            for mx in range(mcus_x):
                if restart_interval and unit and unit % restart_interval == 0:
                    do_restart()
                for cs, td, ta in scan:
                    h, v, _ = comp_info[cs]
                    for by in range(v):
                        for bx in range(h):
                            do_block(cs, td, ta, my * v + by, mx * h + bx)
                unit += 1
    return _next_marker(payload, reader.pos)


@_classified
def decode_jpeg(payload: bytes) -> np.ndarray:
    """Decode a baseline (SOF0/SOF1) or progressive (SOF2) JPEG to
    (H, W, 3) RGB (or (H, W, 1) grayscale).  Multi-scan streams —
    progressive spectral selection / successive approximation, or
    baseline one-scan-per-component — accumulate into per-component
    coefficient arrays; dequantization + IDCT run once at the end,
    vectorized over all blocks."""
    if payload[:3] != JPEG_MAGIC:
        raise UnsupportedMediaError("not a JPEG (no SOI)")
    pos = 2
    qtabs: dict[int, np.ndarray] = {}
    dc_luts: dict[int, dict] = {}
    ac_luts: dict[int, dict] = {}
    frame = None  # (H, W, comps) where comps = [(id, h, v, tq)]
    progressive = False
    restart_interval = 0
    comp_info: dict[int, tuple[int, int, int]] = {}
    coeffs: dict[int, np.ndarray] = {}
    nblocks: dict[int, tuple[int, int]] = {}
    mcus = (0, 0)
    got_scan = False

    while pos < len(payload) - 1:
        if payload[pos] != 0xFF:
            raise UnsupportedMediaError("expected marker")
        marker = payload[pos + 1]
        pos += 2
        if marker == 0xD8:  # stray SOI
            continue
        if marker == 0xD9:  # EOI
            break
        (seglen,) = struct.unpack(">H", payload[pos:pos + 2])
        seg = payload[pos + 2:pos + seglen]
        if len(seg) != seglen - 2:
            raise UnsupportedMediaError("truncated segment")
        if marker == 0xDB:  # DQT — possibly several tables
            p = 0
            while p < len(seg):
                pq, tq = seg[p] >> 4, seg[p] & 0x0F
                p += 1
                if pq != 0:
                    raise UnsupportedMediaError("16-bit quant tables unsupported")
                tab = np.zeros((8, 8), dtype=np.int32)
                tab[_ZZ_ROWS, _ZZ_COLS] = np.frombuffer(seg[p:p + 64], dtype=np.uint8)
                qtabs[tq] = tab
                p += 64
        elif marker == 0xC4:  # DHT — possibly several tables
            p = 0
            while p < len(seg):
                tc, th = seg[p] >> 4, seg[p] & 0x0F
                bits = list(seg[p + 1:p + 17])
                n = sum(bits)
                vals = list(seg[p + 17:p + 17 + n])
                lut = _build_huff_lut(bits, vals)
                (ac_luts if tc else dc_luts)[th] = lut
                p += 17 + n
        elif marker in (0xC0, 0xC1, 0xC2):  # SOF0/1 sequential, SOF2 progressive
            if frame is not None:
                raise UnsupportedMediaError("multiple SOF markers")
            progressive = marker == 0xC2
            precision, h, w, nc = seg[0], *struct.unpack(">HH", seg[1:5]), seg[5]
            if precision != 8:
                raise UnsupportedMediaError("only 8-bit precision supported")
            comps = []
            for i in range(nc):
                cid, hv, tq = seg[6 + 3 * i:9 + 3 * i]
                comps.append((cid, hv >> 4, hv & 0x0F, tq))
            if h == 0 or w == 0:
                raise UnsupportedMediaError("zero-sized frame")
            frame = (h, w, comps)
            hmax = max(c[1] for c in comps)
            vmax = max(c[2] for c in comps)
            mcus = (-(-w // (8 * hmax)), -(-h // (8 * vmax)))
            for cid, ch, cv, tq in comps:
                comp_info[cid] = (ch, cv, tq)
                coeffs[cid] = np.zeros(
                    (mcus[1] * cv, mcus[0] * ch, 64), dtype=np.int32
                )
                cw = -(-w * ch // hmax)
                chh = -(-h * cv // vmax)
                nblocks[cid] = (-(-chh // 8), -(-cw // 8))
        elif marker in (0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB,
                        0xCD, 0xCE, 0xCF):
            raise UnsupportedMediaError(
                f"unsupported JPEG process (SOF marker 0xFF{marker:02X})"
            )
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack(">H", seg[:2])
        elif marker == 0xDA:  # SOS — decode this scan's entropy data now
            if frame is None:
                raise UnsupportedMediaError("SOS before SOF")
            ns = seg[0]
            scan = []
            for i in range(ns):
                cs, tables = seg[1 + 2 * i], seg[2 + 2 * i]
                scan.append((cs, tables >> 4, tables & 0x0F))
            ss, se = seg[1 + 2 * ns], seg[2 + 2 * ns]
            ah, al = seg[3 + 2 * ns] >> 4, seg[3 + 2 * ns] & 0x0F
            if progressive:
                if ss == 0 and se != 0:
                    raise UnsupportedMediaError(
                        "progressive DC scan must have Se=0"
                    )
                if ss > 0 and ns != 1:
                    raise UnsupportedMediaError(
                        "progressive AC scan must be single-component"
                    )
            pos = _decode_scan(
                payload, pos + seglen, scan, ss, se, ah, al, progressive,
                coeffs, comp_info, nblocks, mcus, dc_luts, ac_luts,
                restart_interval,
            )
            got_scan = True
            continue
        # APPn / COM / anything else: skip
        pos += seglen

    if frame is None or not got_scan:
        raise UnsupportedMediaError("missing SOF or SOS")
    height, width, comps = frame
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)

    # Dequantize + IDCT all accumulated coefficients, upsample, crop.
    full = []
    for cid, h, v, tq in comps:
        p = _idct_plane(coeffs[cid], qtabs[tq])
        p = np.repeat(np.repeat(p, vmax // v, axis=0), hmax // h, axis=1)
        full.append(p[:height, :width].astype(np.float64))

    if len(full) == 1:
        return full[0][:, :, None].astype(np.uint8)
    if len(full) != 3:
        raise UnsupportedMediaError(f"{len(full)}-component JPEG unsupported")
    y, cb, cr = full
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    b = y + 1.772 * (cb - 128.0)
    rgb = np.stack([r, g, b], axis=-1)
    return np.clip(np.round(rgb), 0, 255).astype(np.uint8)


# ----------------------------------------------------------------- encoder


class _BitWriter:
    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            self.nbits -= 8
            b = (self.acc >> self.nbits) & 0xFF
            self.out.append(b)
            if b == 0xFF:
                self.out.append(0x00)  # byte stuffing
        self.acc &= (1 << self.nbits) - 1

    def pad_to_byte(self) -> None:
        if self.nbits:
            self.write((1 << (8 - self.nbits)) - 1, 8 - self.nbits)  # 1-fill


def _category(v: int) -> int:
    return int(v).bit_length() if v >= 0 else int(-v).bit_length()


def _scaled_qtab(base: np.ndarray, quality: int) -> np.ndarray:
    quality = min(100, max(1, quality))
    scale = 5000 // quality if quality < 50 else 200 - 2 * quality
    return np.clip((base * scale + 50) // 100, 1, 255).astype(np.int32)


def _quantize_plane(plane: np.ndarray, qtab: np.ndarray) -> np.ndarray:
    """(bh*8, bw*8) padded plane -> (bh, bw, 64) quantized zigzag
    coefficients, vectorized over all blocks (einsum 2-D DCT)."""
    bh, bw = plane.shape[0] // 8, plane.shape[1] // 8
    b = plane.reshape(bh, 8, bw, 8).transpose(0, 2, 1, 3) - 128.0
    co = np.einsum("ab,ijbc,cd->ijad", _DCT_M, b, _DCT_M.T)
    q = np.round(co / qtab).astype(np.int32)
    return q[:, :, _ZZ_ROWS, _ZZ_COLS]


def _encode_zz_block(
    writer: _BitWriter,
    zz: np.ndarray,
    dc_codes: dict[int, tuple[int, int]],
    ac_codes: dict[int, tuple[int, int]],
    pred: int,
) -> int:
    diff = int(zz[0]) - pred
    t = _category(diff)
    code, length = dc_codes[t]
    writer.write(code, length)
    if t:
        writer.write(diff if diff >= 0 else diff + (1 << t) - 1, t)

    run = 0
    for k in range(1, 64):
        v = int(zz[k])
        if v == 0:
            run += 1
            continue
        while run > 15:
            zcode, zlen = ac_codes[0xF0]  # ZRL
            writer.write(zcode, zlen)
            run -= 16
        s = _category(v)
        acode, alen = ac_codes[(run << 4) | s]
        writer.write(acode, alen)
        writer.write(v if v >= 0 else v + (1 << s) - 1, s)
        run = 0
    if run:
        eob, elen = ac_codes[0x00]
        writer.write(eob, elen)
    return int(zz[0])


def _pad_to_multiple(plane: np.ndarray, my: int, mx: int) -> np.ndarray:
    h, w = plane.shape
    ph = (-h) % my
    pw = (-w) % mx
    if ph or pw:
        plane = np.pad(plane, ((0, ph), (0, pw)), mode="edge")
    return plane


def _encode_prep(img: np.ndarray, quality: int, subsampling: str):
    """Shared front half of both encoders: validate, color-convert,
    subsample, pad to the MCU grid, and quantize every component to
    (bh, bw, 64) zigzag coefficient arrays.  Returns
    (height, width, gray, samplings, qtabs, coeff_arrays, mcus)."""
    img = np.asarray(img, dtype=np.uint8)
    if img.ndim == 2:
        img = img[:, :, None]
    if img.ndim != 3 or img.shape[2] not in (1, 3):
        raise ValueError("expected (H, W), (H, W, 1) or (H, W, 3) uint8")
    if subsampling not in ("4:4:4", "4:2:0"):
        raise ValueError("subsampling must be '4:4:4' or '4:2:0'")
    height, width = img.shape[:2]
    if height == 0 or width == 0:
        raise ValueError("cannot encode an empty image")
    gray = img.shape[2] == 1

    q_luma = _scaled_qtab(_Q_LUMA, quality)
    q_chroma = _scaled_qtab(_Q_CHROMA, quality)

    if gray:
        planes = [img[:, :, 0].astype(np.float64)]
        samplings = [(1, 1)]
    else:
        rf = img.astype(np.float64)
        r, g, b = rf[:, :, 0], rf[:, :, 1], rf[:, :, 2]
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = 128.0 - 0.168736 * r - 0.331264 * g + 0.5 * b
        cr = 128.0 + 0.5 * r - 0.418688 * g - 0.081312 * b
        if subsampling == "4:2:0":
            cbp = _pad_to_multiple(cb, 2, 2)
            crp = _pad_to_multiple(cr, 2, 2)
            cb = (cbp[0::2, 0::2] + cbp[0::2, 1::2]
                  + cbp[1::2, 0::2] + cbp[1::2, 1::2]) / 4.0
            cr = (crp[0::2, 0::2] + crp[0::2, 1::2]
                  + crp[1::2, 0::2] + crp[1::2, 1::2]) / 4.0
            samplings = [(2, 2), (1, 1), (1, 1)]
        else:
            samplings = [(1, 1), (1, 1), (1, 1)]
        planes = [y, cb, cr]

    hmax = max(h for h, _ in samplings)
    vmax = max(v for _, v in samplings)
    mcus_x = -(-width // (8 * hmax))
    mcus_y = -(-height // (8 * vmax))
    nc = len(planes)
    qtabs = [q_luma] + [q_chroma] * (nc - 1)
    coeff_arrays = [
        _quantize_plane(
            _pad_to_multiple(np.clip(np.round(p), 0, 255),
                             mcus_y * v * 8, mcus_x * h * 8),
            qtabs[i],
        )
        for i, (p, (h, v)) in enumerate(zip(planes, samplings))
    ]
    return height, width, gray, samplings, qtabs, coeff_arrays, (mcus_x, mcus_y)


def _encode_headers(
    out: bytearray,
    sof_marker: bytes,
    height: int,
    width: int,
    gray: bool,
    samplings: list[tuple[int, int]],
    qtabs: list[np.ndarray],
    restart_interval: int = 0,
) -> None:
    """DQT + SOF + DHT (+DRI) common to both encoders."""
    zz_luma = qtabs[0][_ZZ_ROWS, _ZZ_COLS].astype(np.uint8).tobytes()
    out += b"\xff\xdb" + struct.pack(">H", 67) + b"\x00" + zz_luma
    if not gray:
        zz_chroma = qtabs[1][_ZZ_ROWS, _ZZ_COLS].astype(np.uint8).tobytes()
        out += b"\xff\xdb" + struct.pack(">H", 67) + b"\x01" + zz_chroma
    nc = 1 if gray else 3
    out += sof_marker + struct.pack(">HBHHB", 8 + 3 * nc, 8, height, width, nc)
    for i, (h, v) in enumerate(samplings):
        out += bytes([i + 1, (h << 4) | v, 0 if i == 0 else 1])
    for tc_th, bits, vals in (
        (0x00, _DC_LUMA_BITS, _DC_LUMA_VALS),
        (0x10, _AC_LUMA_BITS, _AC_LUMA_VALS),
        (0x01, _DC_CHROMA_BITS, _DC_CHROMA_VALS),
        (0x11, _AC_CHROMA_BITS, _AC_CHROMA_VALS),
    ):
        if gray and tc_th in (0x01, 0x11):
            continue
        out += (b"\xff\xc4" + struct.pack(">H", 19 + len(vals))
                + bytes([tc_th]) + bytes(bits) + bytes(vals))
    if restart_interval:
        out += b"\xff\xdd" + struct.pack(">HH", 4, restart_interval)


def _huff_code_sets(gray: bool):
    dc_l = _build_huff_codes(_DC_LUMA_BITS, _DC_LUMA_VALS)
    ac_l = _build_huff_codes(_AC_LUMA_BITS, _AC_LUMA_VALS)
    if gray:
        return [dc_l], [ac_l]
    dc_c = _build_huff_codes(_DC_CHROMA_BITS, _DC_CHROMA_VALS)
    ac_c = _build_huff_codes(_AC_CHROMA_BITS, _AC_CHROMA_VALS)
    return [dc_l, dc_c, dc_c], [ac_l, ac_c, ac_c]


def encode_jpeg(
    img: np.ndarray,
    quality: int = 90,
    subsampling: str = "4:4:4",
    restart_interval: int = 0,
) -> bytes:
    """Encode (H, W, 3) RGB or (H, W)/(H, W, 1) grayscale to baseline JPEG.

    Uses the standard Annex-K Huffman tables (written to DHT) and
    quality-scaled Annex-K quantization tables, so output decodes in any
    conformant JPEG decoder, not just :func:`decode_jpeg`.
    """
    height, width, gray, samplings, qtabs, zzs, (mcus_x, mcus_y) = _encode_prep(
        img, quality, subsampling
    )
    nc = len(samplings)

    out = bytearray(b"\xff\xd8")  # SOI
    _encode_headers(out, b"\xff\xc0", height, width, gray, samplings, qtabs,
                    restart_interval)
    # SOS
    out += b"\xff\xda" + struct.pack(">HB", 6 + 2 * nc, nc)
    for i in range(nc):
        out += bytes([i + 1, 0x00 if i == 0 else 0x11])
    out += b"\x00\x3f\x00"  # Ss=0, Se=63, Ah/Al=0

    dc_codes, ac_codes = _huff_code_sets(gray)
    writer = _BitWriter()
    preds = [0] * nc
    mcu = 0
    rst = 0
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if restart_interval and mcu and mcu % restart_interval == 0:
                writer.pad_to_byte()
                out += writer.out
                writer = _BitWriter()
                out += bytes([0xFF, 0xD0 + (rst % 8)])
                rst += 1
                preds = [0] * nc
            for ci in range(nc):
                h, v = samplings[ci]
                for by in range(v):
                    for bx in range(h):
                        preds[ci] = _encode_zz_block(
                            writer, zzs[ci][my * v + by, mx * h + bx],
                            dc_codes[ci], ac_codes[ci], preds[ci]
                        )
            mcu += 1
    writer.pad_to_byte()
    out += writer.out
    out += b"\xff\xd9"  # EOI
    return bytes(out)


# ------------------------------------------------------- progressive encoder


def _sos_header(comps: list[int], tabs: list[int], ss: int, se: int,
                ah: int, al: int) -> bytes:
    ns = len(comps)
    out = b"\xff\xda" + struct.pack(">HB", 6 + 2 * ns, ns)
    for cid, tb in zip(comps, tabs):
        out += bytes([cid, tb])
    return out + bytes([ss, se, (ah << 4) | al])


def _encode_ac_first_block(writer, ac_codes, zz, ss, se, al) -> None:
    """First AC pass of one band (G.1.2.2), point transform ``al``.
    EOB runs are not accumulated across blocks (always EOB0) — legal,
    marginally larger output, and keeps the Annex-K tables sufficient
    (EOBn for n>0 needs symbols those tables don't define)."""
    r = 0
    for k in range(ss, se + 1):
        v = int(zz[k])
        t = abs(v) >> al
        if t == 0:
            r += 1
            continue
        while r > 15:
            writer.write(*ac_codes[0xF0])  # ZRL
            r -= 16
        s = t.bit_length()
        writer.write(*ac_codes[(r << 4) | s])
        sv = t if v >= 0 else -t
        writer.write(sv if sv >= 0 else sv + (1 << s) - 1, s)
        r = 0
    if r:
        writer.write(*ac_codes[0x00])  # EOB0


def _encode_ac_refine_block(writer, ac_codes, zz, ss, se, al) -> None:
    """Successive-approximation AC refinement of one band (G.1.2.3):
    newly-nonzero coefficients get (run, 1)+sign symbols; coefficients
    nonzero in earlier scans get buffered correction bits, flushed after
    each symbol in coefficient order — exactly the interleaving
    ``_decode_ac_refine`` consumes."""
    ts = [abs(int(zz[k])) >> al for k in range(ss, se + 1)]
    # position of the last newly-nonzero coefficient: past it, zero runs
    # fold into the EOB instead of ZRLs (cf. T.81 figure G.7 note)
    eob_i = max((i for i, t in enumerate(ts) if t == 1), default=-1)
    r = 0
    buffered: list[int] = []
    for i, k in enumerate(range(ss, se + 1)):
        t = ts[i]
        if t == 0:
            r += 1
            continue
        # flush pending ZRLs at ANY nonzero coefficient (so buffered
        # correction bits stay aligned with the 16-zero stretch the
        # decoder advances over), but never past the last new coefficient
        while r > 15 and i <= eob_i:
            writer.write(*ac_codes[0xF0])
            r -= 16
            for b in buffered:
                writer.write(b, 1)
            buffered = []
        if t > 1:  # already nonzero from earlier scans: correction bit
            buffered.append(t & 1)
            continue
        writer.write(*ac_codes[(r << 4) | 1])
        writer.write(1 if int(zz[k]) >= 0 else 0, 1)  # sign: 1 = positive
        for b in buffered:
            writer.write(b, 1)
        buffered = []
        r = 0
    if r or buffered:
        writer.write(*ac_codes[0x00])  # EOB0 — current band's tail follows
        for b in buffered:
            writer.write(b, 1)


def encode_jpeg_progressive(
    img: np.ndarray,
    quality: int = 90,
    subsampling: str = "4:4:4",
) -> bytes:
    """Encode to a progressive (SOF2) JPEG exercising BOTH progressive
    dimensions: spectral selection (separate DC and per-component AC
    scans) and successive approximation (Al=1 first passes plus Ah=1→
    Al=0 refinement scans for DC and AC).  The quantized coefficients
    are identical to :func:`encode_jpeg` at the same settings, so the
    decoded image matches the baseline encoding bit-for-bit — the
    round-trip property tests/test_jpeg.py pins."""
    height, width, gray, samplings, qtabs, zzs, (mcus_x, mcus_y) = _encode_prep(
        img, quality, subsampling
    )
    nc = len(samplings)
    hmax = max(h for h, _ in samplings)
    vmax = max(v for _, v in samplings)

    out = bytearray(b"\xff\xd8")
    _encode_headers(out, b"\xff\xc2", height, width, gray, samplings, qtabs)
    dc_codes, ac_codes = _huff_code_sets(gray)

    # --- scan 1: DC first, interleaved, Al=1 -----------------------------
    out += _sos_header(
        [i + 1 for i in range(nc)],
        [0x00 if i == 0 else 0x10 for i in range(nc)], 0, 0, 0, 1,
    )
    writer = _BitWriter()
    preds = [0] * nc
    for my in range(mcus_y):
        for mx in range(mcus_x):
            for ci in range(nc):
                h, v = samplings[ci]
                for by in range(v):
                    for bx in range(h):
                        dc = int(zzs[ci][my * v + by, mx * h + bx, 0]) >> 1
                        diff = dc - preds[ci]
                        preds[ci] = dc
                        t = _category(diff)
                        writer.write(*dc_codes[ci][t])
                        if t:
                            writer.write(
                                diff if diff >= 0 else diff + (1 << t) - 1, t
                            )
    writer.pad_to_byte()
    out += writer.out

    # non-interleaved scans walk the component's ACTUAL block grid
    grids = []
    for ci, (h, v) in enumerate(samplings):
        cw = -(-width * h // hmax)
        ch = -(-height * v // vmax)
        grids.append((-(-ch // 8), -(-cw // 8)))

    # --- per component: AC first (Al=1), then AC refine (Ah=1, Al=0) -----
    for ah, al in ((0, 1), (1, 0)):
        for ci in range(nc):
            out += _sos_header([ci + 1], [0x00 if ci == 0 else 0x01],
                               1, 63, ah, al)
            writer = _BitWriter()
            h_b, w_b = grids[ci]
            enc = _encode_ac_first_block if ah == 0 else _encode_ac_refine_block
            for by in range(h_b):
                for bx in range(w_b):
                    enc(writer, ac_codes[ci], zzs[ci][by, bx], 1, 63, al)
            writer.pad_to_byte()
            out += writer.out

    # --- final scan: DC refinement, interleaved, Ah=1 Al=0 ---------------
    out += _sos_header(
        [i + 1 for i in range(nc)], [0x00] * nc, 0, 0, 1, 0
    )
    writer = _BitWriter()
    for my in range(mcus_y):
        for mx in range(mcus_x):
            for ci in range(nc):
                h, v = samplings[ci]
                for by in range(v):
                    for bx in range(h):
                        writer.write(
                            int(zzs[ci][my * v + by, mx * h + bx, 0]) & 1, 1
                        )
    writer.pad_to_byte()
    out += writer.out
    out += b"\xff\xd9"
    return bytes(out)


# ----------------------------------------------------------------- EXIF

#: EXIF/TIFF tags surfaced by :func:`parse_exif` (IFD0 + ExifIFD subset
#: a curation pipeline actually filters/groups on)
_EXIF_TAGS = {
    0x010F: "make",
    0x0110: "model",
    0x0112: "orientation",
    0x0132: "datetime",
    0x8769: "_exif_ifd",  # pointer, followed internally
    0x9003: "datetime_original",
    0xA002: "pixel_x_dimension",
    0xA003: "pixel_y_dimension",
}


def _tiff_value(data: bytes, off: int, endian: str):
    """One IFD entry's value (SHORT/LONG/ASCII subset)."""
    typ, count = struct.unpack(endian + "HI", data[off + 2:off + 8])
    size = {1: 1, 2: 1, 3: 2, 4: 4}.get(typ)
    if size is None:
        return None
    total = size * count
    raw_off = off + 8
    if total > 4:
        (ptr,) = struct.unpack(endian + "I", data[raw_off:raw_off + 4])
        raw = data[ptr:ptr + total]
    else:
        raw = data[raw_off:raw_off + total]
    if typ == 2:  # ASCII
        return raw.split(b"\x00")[0].decode("ascii", "replace")
    fmt = {1: "B", 3: "H", 4: "I"}[typ]
    vals = struct.unpack(endian + fmt * count, raw[: size * count])
    return vals[0] if count == 1 else list(vals)


def _walk_ifd(data: bytes, off: int, endian: str, out: dict) -> None:
    (n,) = struct.unpack(endian + "H", data[off:off + 2])
    for i in range(n):
        e = off + 2 + 12 * i
        (tag,) = struct.unpack(endian + "H", data[e:e + 2])
        name = _EXIF_TAGS.get(tag)
        if name is None:
            continue
        val = _tiff_value(data, e, endian)
        if name == "_exif_ifd" and isinstance(val, int):
            _walk_ifd(data, val, endian, out)
        elif val is not None:
            out[name] = val


@_classified
def parse_exif(payload: bytes) -> dict:
    """EXIF metadata from a JPEG's APP1 segment: a dict over the
    curation-relevant tag subset (make/model/orientation/datetimes/
    dimensions), empty when no EXIF is present.  Own TIFF IFD walk
    (II and MM byte orders, SHORT/LONG/ASCII values, ExifIFD pointer
    followed) — no PIL in the container."""
    if payload[:3] != JPEG_MAGIC:
        raise UnsupportedMediaError("not a JPEG (no SOI)")
    pos = 2
    while pos + 4 <= len(payload):
        if payload[pos] != 0xFF:
            break
        marker = payload[pos + 1]
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            pos += 2
            continue
        if marker in (0xDA, 0xD9):  # entropy data / EOI: no EXIF past here
            break
        (seglen,) = struct.unpack(">H", payload[pos + 2:pos + 4])
        seg = payload[pos + 4:pos + 2 + seglen]
        pos += 2 + seglen
        if marker != 0xE1 or not seg.startswith(b"Exif\x00\x00"):
            continue
        tiff = seg[6:]
        if tiff[:2] == b"II":
            endian = "<"
        elif tiff[:2] == b"MM":
            endian = ">"
        else:
            raise UnsupportedMediaError("EXIF TIFF header corrupt")
        (ifd0,) = struct.unpack(endian + "I", tiff[4:8])
        out: dict = {}
        _walk_ifd(tiff, ifd0, endian, out)
        return out
    return {}


def apply_exif_orientation(img: np.ndarray, orientation: int) -> np.ndarray:
    """Normalize pixels to orientation 1 (the transform a viewer applies;
    EXIF 2.32 table 6): flips/rotations via numpy views, no copy until
    the caller needs contiguity."""
    if orientation in (0, 1):
        return img
    ops = {
        2: lambda a: a[:, ::-1],                 # mirror horizontal
        3: lambda a: a[::-1, ::-1],              # rotate 180
        4: lambda a: a[::-1, :],                 # mirror vertical
        5: lambda a: np.rot90(a[:, ::-1], 1),    # mirror + rot90 CCW
        6: lambda a: np.rot90(a, 3),             # rotate 90 CW
        7: lambda a: np.rot90(a[:, ::-1], 3),    # mirror + rot90 CW
        8: lambda a: np.rot90(a, 1),             # rotate 90 CCW
    }
    fn = ops.get(orientation)
    if fn is None:
        raise UnsupportedMediaError(f"EXIF orientation {orientation}")
    return fn(img)


def decode_jpeg_oriented(payload: bytes) -> np.ndarray:
    """Decode + apply the EXIF orientation — what a perceptual hash or
    resize stage must use, or rotated mobile photos hash 4 ways."""
    img = decode_jpeg(payload)
    return apply_exif_orientation(img, parse_exif(payload).get("orientation", 1))


def make_exif_app1(
    orientation: int = 1, make: str = "", datetime: str = ""
) -> bytes:
    """A minimal valid APP1/EXIF segment (II byte order) for tests and
    fixture synthesis; splice after SOI: ``jpg[:2] + app1 + jpg[2:]``."""
    # (tag, type, count, inline-bytes-or-None, trailer-bytes-or-None)
    entries = [(0x0112, 3, 1, struct.pack("<HH", orientation, 0), None)]
    for tag, text in ((0x010F, make), (0x0132, datetime)):
        if not text:
            continue
        raw = text.encode() + b"\x00"
        if len(raw) <= 4:  # TIFF: values of <= 4 bytes live INLINE
            entries.append((tag, 2, len(raw), raw.ljust(4, b"\x00"), None))
        else:
            entries.append((tag, 2, len(raw), None, raw))
    entries.sort()
    trailer_base = 8 + 2 + 12 * len(entries) + 4
    tiff = bytearray(b"II*\x00\x08\x00\x00\x00")
    tiff += struct.pack("<H", len(entries))
    trailer = b""
    for tag, typ, count, inline, deferred in entries:
        tiff += struct.pack("<HHI", tag, typ, count)
        if inline is not None:
            tiff += inline
        else:
            tiff += struct.pack("<I", trailer_base + len(trailer))
            trailer += deferred
    tiff += b"\x00\x00\x00\x00"  # next-IFD pointer: none
    tiff += trailer
    body = b"Exif\x00\x00" + bytes(tiff)
    return b"\xff\xe1" + struct.pack(">H", len(body) + 2) + body

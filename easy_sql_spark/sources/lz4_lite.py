"""Pure-Python LZ4 (block + frame) and xxHash32 — stdlib only.

Closes the last Puffin refusal (``read_puffin_footer``: footer payloads
with the compressed flag set).  The Puffin spec defines exactly one
footer codec — "lz4: single LZ4 compression frame with content size
present" — i.e. the public LZ4 *frame* format (lz4/lz4 doc
``lz4_Frame_format.md``) wrapping LZ4 *block* compressed data
(``lz4_Block_format.md``), with xxHash32 (Cyan4973/xxHash spec) for the
header/block/content checksums.

This mirrors the repo's other format shims (``avro_lite``,
``kryo_lite``, the Roaring codecs): implement the public byte format in
~200 lines of stdlib Python and CROSS-VALIDATE against the real
implementation already inside Spark's JVM — here ``net.jpountz.lz4``
(the lz4-java bundled with Spark, used for shuffle/broadcast codecs)
via py4j in tests/test_lz4_lite.py, in BOTH directions: our frames
decompress under ``LZ4FrameInputStream`` and its frames decompress
here.

Decompression is exact.  Compression is a greedy single-hash-table
matcher (the classic LZ4 fast-path strategy): always format-valid,
not byte-identical to any particular reference encoder — parity is
judged by round-trip, as with every LZ4 implementation.

Scale note: footers are small (KBs of JSON); this never sits on a data
path.  DV blob reads slice by manifest offsets and bypass the footer
entirely (puffin.py module doc).
"""

from __future__ import annotations

import struct

_M32 = 0xFFFFFFFF

# ------------------------------------------------------------------ xxh32

_P1, _P2, _P3, _P4, _P5 = (
    2654435761,
    2246822519,
    3266489917,
    668265263,
    374761393,
)


def _rotl32(x: int, r: int) -> int:
    return ((x << r) | (x >> (32 - r))) & _M32


def xxh32(data: bytes, seed: int = 0) -> int:
    """xxHash32 of ``data`` (reference spec, Cyan4973/xxHash)."""
    n = len(data)
    i = 0
    if n >= 16:
        v1 = (seed + _P1 + _P2) & _M32
        v2 = (seed + _P2) & _M32
        v3 = seed & _M32
        v4 = (seed - _P1) & _M32
        limit = n - 16
        while i <= limit:
            l1, l2, l3, l4 = struct.unpack_from("<IIII", data, i)
            v1 = (_rotl32((v1 + l1 * _P2) & _M32, 13) * _P1) & _M32
            v2 = (_rotl32((v2 + l2 * _P2) & _M32, 13) * _P1) & _M32
            v3 = (_rotl32((v3 + l3 * _P2) & _M32, 13) * _P1) & _M32
            v4 = (_rotl32((v4 + l4 * _P2) & _M32, 13) * _P1) & _M32
            i += 16
        h = (
            _rotl32(v1, 1) + _rotl32(v2, 7) + _rotl32(v3, 12) + _rotl32(v4, 18)
        ) & _M32
    else:
        h = (seed + _P5) & _M32
    h = (h + n) & _M32
    while i + 4 <= n:
        (l,) = struct.unpack_from("<I", data, i)
        h = (_rotl32((h + l * _P3) & _M32, 17) * _P4) & _M32
        i += 4
    while i < n:
        h = (_rotl32((h + data[i] * _P5) & _M32, 11) * _P1) & _M32
        i += 1
    h ^= h >> 15
    h = (h * _P2) & _M32
    h ^= h >> 13
    h = (h * _P3) & _M32
    h ^= h >> 16
    return h


# ------------------------------------------------------------ block codec


class Lz4Error(ValueError):
    pass


def lz4_block_decompress(src: bytes, max_size: int | None = None) -> bytes:
    """Decode one LZ4 block (``lz4_Block_format.md``)."""
    out = bytearray()
    i = 0
    n = len(src)
    while i < n:
        token = src[i]
        i += 1
        # literals
        lit = token >> 4
        if lit == 15:
            while True:
                if i >= n:
                    raise Lz4Error("truncated literal length")
                b = src[i]
                i += 1
                lit += b
                if b != 255:
                    break
        if i + lit > n:
            raise Lz4Error("truncated literals")
        out += src[i : i + lit]
        i += lit
        if i == n:
            break  # last sequence carries no match
        # match
        if i + 2 > n:
            raise Lz4Error("truncated match offset")
        offset = src[i] | (src[i + 1] << 8)
        i += 2
        if offset == 0 or offset > len(out):
            raise Lz4Error("invalid match offset %d at out=%d" % (offset, len(out)))
        mlen = (token & 0x0F) + 4
        if (token & 0x0F) == 15:
            while True:
                if i >= n:
                    raise Lz4Error("truncated match length")
                b = src[i]
                i += 1
                mlen += b
                if b != 255:
                    break
        if offset >= mlen:
            start = len(out) - offset
            out += out[start : start + mlen]
        else:  # overlapping copy — byte-at-a-time semantics
            pos = len(out) - offset
            for _ in range(mlen):
                out.append(out[pos])
                pos += 1
        if max_size is not None and len(out) > max_size:
            raise Lz4Error("decompressed size exceeds declared %d" % max_size)
    return bytes(out)


_MIN_MATCH = 4
_MFLIMIT = 12  # a match may not start within the last 12 bytes
_LAST_LITERALS = 5
_HASH_LOG = 16


def _hash4(v: int) -> int:
    return ((v * 2654435761) & _M32) >> (32 - _HASH_LOG)


def _write_len(ext: int) -> bytes:
    out = bytearray()
    while ext >= 255:
        out.append(255)
        ext -= 255
    out.append(ext)
    return bytes(out)


def lz4_block_compress(src: bytes) -> bytes:
    """Greedy LZ4 block encoder (single hash table, format-valid)."""
    n = len(src)
    out = bytearray()
    if n == 0:
        return b"\x00"  # one empty-literal last sequence
    table: dict[int, int] = {}
    anchor = 0
    i = 0
    match_limit = n - _MFLIMIT
    while i <= match_limit if n >= _MFLIMIT else False:
        seq = struct.unpack_from("<I", src, i)[0] if i + 4 <= n else None
        if seq is None:
            break
        h = _hash4(seq)
        cand = table.get(h)
        table[h] = i
        if (
            cand is not None
            and i - cand <= 0xFFFF
            and src[cand : cand + 4] == src[i : i + 4]
        ):
            # extend match forward, but never into the last 5 bytes
            end_limit = n - _LAST_LITERALS
            mlen = 4
            while i + mlen < end_limit and src[cand + mlen] == src[i + mlen]:
                mlen += 1
            lit = i - anchor
            token_lit = 15 if lit >= 15 else lit
            mext = mlen - _MIN_MATCH
            token_m = 15 if mext >= 15 else mext
            out.append((token_lit << 4) | token_m)
            if lit >= 15:
                out += _write_len(lit - 15)
            out += src[anchor:i]
            out += struct.pack("<H", i - cand)
            if mext >= 15:
                out += _write_len(mext - 15)
            i += mlen
            anchor = i
        else:
            i += 1
    # last literals
    lit = n - anchor
    token_lit = 15 if lit >= 15 else lit
    out.append(token_lit << 4)
    if lit >= 15:
        out += _write_len(lit - 15)
    out += src[anchor:]
    return bytes(out)


# ------------------------------------------------------------ frame codec

FRAME_MAGIC = 0x184D2204
_BLOCK_MAX = {4: 1 << 16, 5: 1 << 18, 6: 1 << 20, 7: 1 << 22}


def lz4_frame_decompress(data: bytes) -> bytes:
    """Decode a single LZ4 frame (``lz4_Frame_format.md``)."""
    if len(data) < 7 or struct.unpack_from("<I", data, 0)[0] != FRAME_MAGIC:
        raise Lz4Error("not an lz4 frame (bad magic)")
    flg = data[4]
    bd = data[5]
    if (flg >> 6) != 0b01:
        raise Lz4Error("unsupported lz4 frame version %d" % (flg >> 6))
    block_checksum = bool(flg & 0x10)
    content_size_present = bool(flg & 0x08)
    content_checksum = bool(flg & 0x04)
    dict_id = bool(flg & 0x01)
    bmax_code = (bd >> 4) & 0x07
    if bmax_code not in _BLOCK_MAX:
        raise Lz4Error("invalid block max size code %d" % bmax_code)
    i = 6
    content_size = None
    if content_size_present:
        if i + 8 > len(data):
            raise Lz4Error("truncated frame header (content size)")
        (content_size,) = struct.unpack_from("<Q", data, i)
        i += 8
    if dict_id:
        i += 4
    if i >= len(data):
        raise Lz4Error("truncated frame header (checksum byte)")
    hc = data[i]
    i += 1
    expect = (xxh32(data[4 : i - 1]) >> 8) & 0xFF
    if hc != expect:
        raise Lz4Error("frame header checksum mismatch")
    out = bytearray()
    while True:
        if i + 4 > len(data):
            raise Lz4Error("truncated frame (no EndMark)")
        (bsize,) = struct.unpack_from("<I", data, i)
        i += 4
        if bsize == 0:
            break  # EndMark
        uncompressed = bool(bsize & 0x80000000)
        bsize &= 0x7FFFFFFF
        if i + bsize > len(data):
            raise Lz4Error("truncated block")
        block = data[i : i + bsize]
        i += bsize
        if block_checksum:
            if i + 4 > len(data):
                raise Lz4Error("truncated block checksum")
            (bchk,) = struct.unpack_from("<I", data, i)
            i += 4
            if bchk != xxh32(block):
                raise Lz4Error("block checksum mismatch")
        if uncompressed:
            out += block
        else:
            out += lz4_block_decompress(block, max_size=_BLOCK_MAX[bmax_code])
    if content_checksum:
        if i + 4 > len(data):
            raise Lz4Error("truncated content checksum")
        (cchk,) = struct.unpack_from("<I", data, i)
        i += 4
        if cchk != xxh32(bytes(out)):
            raise Lz4Error("content checksum mismatch")
    if content_size is not None and content_size != len(out):
        raise Lz4Error(
            "content size mismatch: header %d, actual %d"
            % (content_size, len(out))
        )
    return bytes(out)


def lz4_frame_compress(
    data: bytes,
    *,
    content_checksum: bool = True,
    block_max_code: int = 6,
) -> bytes:
    """Encode ``data`` as one LZ4 frame with content size present (the
    Puffin spec's exact footer codec shape)."""
    if block_max_code not in _BLOCK_MAX:
        raise Lz4Error("invalid block max size code %d" % block_max_code)
    flg = (0b01 << 6) | 0x20 | 0x08 | (0x04 if content_checksum else 0)
    bd = block_max_code << 4
    header = bytes([flg, bd]) + struct.pack("<Q", len(data))
    out = bytearray(struct.pack("<I", FRAME_MAGIC))
    out += header
    out.append((xxh32(header) >> 8) & 0xFF)
    bmax = _BLOCK_MAX[block_max_code]
    for at in range(0, len(data), bmax):
        chunk = data[at : at + bmax]
        comp = lz4_block_compress(chunk)
        if len(comp) < len(chunk):
            out += struct.pack("<I", len(comp))
            out += comp
        else:  # incompressible -> stored block
            out += struct.pack("<I", 0x80000000 | len(chunk))
            out += chunk
    out += struct.pack("<I", 0)  # EndMark
    if content_checksum:
        out += struct.pack("<I", xxh32(data))
    return bytes(out)

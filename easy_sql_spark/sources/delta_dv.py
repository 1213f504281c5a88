"""Delta Lake deletion-vector decoding — pure stdlib.

Implements the reader side of the public Delta protocol's
"Deletion Vectors" section (delta-io/delta PROTOCOL.md) so
``delta_log.read_delta`` can serve tables with
``readerFeatures: [deletionVectors]`` instead of refusing:

* **Descriptor** (on the ``add`` action): ``storageType`` ``u`` (file
  named by a Z85-encoded UUID, relative to the table root with an
  optional random prefix), ``p`` (absolute path) or ``i`` (bitmap
  inline, Z85-encoded in ``pathOrInlineDv``); ``offset`` locates the
  bitmap inside a shared DV file; ``sizeInBytes`` is the serialized
  bitmap's length; ``cardinality`` the number of set positions.
* **DV file layout** (format version 1): a 1-byte version header
  (``0x01``) at offset 0; each stored vector is
  ``int32(BE) dataSize | dataSize bytes | int32(BE) CRC-32`` with the
  descriptor's ``offset`` pointing at the size field.
* **Bitmap**: "portable" RoaringBitmapArray — ``int32(LE)`` magic
  ``1681511377``, ``int64(LE)`` number of 32-bit bitmaps, then each
  bitmap in the standard interoperable RoaringFormatSpec (little
  endian; array / bitset / run containers).  The i-th bitmap holds the
  low 32 bits of 64-bit positions with high word ``i``.
* **Z85**: the ZeroMQ base-85 alphabet over big-endian 4-byte groups
  (Delta pads to a multiple of 4 and trims on decode).

Everything is picklable pure Python over bytes, so expanding DVs to
(file, position) rows can run inside executor tasks — the driver only
ships descriptors.  The encoder half exists for tests and fixtures to
build spec-conformant DV tables without delta-spark in the container.
"""

from __future__ import annotations

import struct
import uuid as _uuid
import zlib

PORTABLE_MAGIC = 1681511377
SERIAL_COOKIE = 12347
SERIAL_COOKIE_NO_RUN = 12346
_NO_OFFSET_THRESHOLD = 4  # cookie-12347 streams carry offsets only at >= 4

_Z85_ALPHABET = (
    "0123456789abcdefghijklmnopqrstuvwxyz"
    "ABCDEFGHIJKLMNOPQRSTUVWXYZ.-:+=^!/*?&<>()[]{}@%$#"
)
_Z85_DECODE = {c: i for i, c in enumerate(_Z85_ALPHABET)}


class DeltaDvError(ValueError):
    pass


def z85_encode(data: bytes) -> str:
    """Z85 over zero-padded 4-byte groups (Delta's Base85Codec pads;
    the true length travels separately as ``sizeInBytes``)."""
    pad = (-len(data)) % 4
    data = data + b"\x00" * pad
    out = []
    for i in range(0, len(data), 4):
        (n,) = struct.unpack_from(">I", data, i)
        chunk = []
        for _ in range(5):
            chunk.append(_Z85_ALPHABET[n % 85])
            n //= 85
        out.extend(reversed(chunk))
    return "".join(out)


def z85_decode(text: str, length: int | None = None) -> bytes:
    if len(text) % 5:
        raise DeltaDvError(f"z85 length {len(text)} not a multiple of 5")
    out = bytearray()
    for i in range(0, len(text), 5):
        n = 0
        for ch in text[i : i + 5]:
            try:
                n = n * 85 + _Z85_DECODE[ch]
            except KeyError:
                raise DeltaDvError(f"invalid z85 character {ch!r}") from None
        out += struct.pack(">I", n)
    return bytes(out[:length]) if length is not None else bytes(out)


# -------------------------------------------------------- roaring decode
def _decode_rb32(data: bytes, pos: int) -> tuple[list[int], int]:
    """One standard-format 32-bit RoaringBitmap (RoaringFormatSpec,
    little-endian) -> (sorted values, next offset)."""
    (cookie,) = struct.unpack_from("<I", data, pos)
    pos += 4
    if cookie & 0xFFFF == SERIAL_COOKIE:
        size = (cookie >> 16) + 1
        nflag = (size + 7) // 8
        run_flags = data[pos : pos + nflag]
        pos += nflag
        has_offsets = size >= _NO_OFFSET_THRESHOLD
    elif cookie == SERIAL_COOKIE_NO_RUN:
        (size,) = struct.unpack_from("<I", data, pos)
        pos += 4
        run_flags = b"\x00" * ((size + 7) // 8)
        has_offsets = True
    else:
        raise DeltaDvError(f"bad roaring cookie {cookie}")
    keys_cards = []
    for _ in range(size):
        key, cm1 = struct.unpack_from("<HH", data, pos)
        pos += 4
        keys_cards.append((key, cm1 + 1))
    if has_offsets:
        pos += 4 * size  # offsets are redundant for a sequential read
    values: list[int] = []
    for i, (key, card) in enumerate(keys_cards):
        base = key << 16
        if run_flags[i // 8] & (1 << (i % 8)):
            (n_runs,) = struct.unpack_from("<H", data, pos)
            pos += 2
            for _ in range(n_runs):
                start, length = struct.unpack_from("<HH", data, pos)
                pos += 4
                values.extend(base + v for v in range(start, start + length + 1))
        elif card <= 4096:
            vals = struct.unpack_from(f"<{card}H", data, pos)
            pos += 2 * card
            values.extend(base + v for v in vals)
        else:
            words = struct.unpack_from("<1024Q", data, pos)
            pos += 8192
            for wi, w in enumerate(words):
                while w:
                    low = w & -w
                    values.append(base + (wi << 6) + low.bit_length() - 1)
                    w ^= low
    return values, pos


def decode_bitmap_array(data: bytes) -> list[int]:
    """Portable RoaringBitmapArray bytes -> sorted 64-bit positions."""
    if len(data) < 12:
        raise DeltaDvError("deletion-vector bitmap truncated")
    (magic,) = struct.unpack_from("<i", data, 0)
    if magic != PORTABLE_MAGIC:
        raise DeltaDvError(
            f"unknown RoaringBitmapArray magic {magic} (only the portable "
            f"format {PORTABLE_MAGIC} is in the Delta protocol)"
        )
    (n,) = struct.unpack_from("<q", data, 4)
    pos = 12
    out: list[int] = []
    for key in range(n):
        vals, pos = _decode_rb32(data, pos)
        out.extend((key << 32) | v for v in vals)
    return out


# -------------------------------------------------------- roaring encode
def _encode_rb32(values: list[int]) -> bytes:
    """Standard no-run-container form (cookie 12346) — the simplest
    spec-conformant encoding, for fixtures and the DV-table exporter."""
    containers: dict[int, list[int]] = {}
    for v in sorted(set(values)):
        containers.setdefault(v >> 16, []).append(v & 0xFFFF)
    keys = sorted(containers)
    out = struct.pack("<II", SERIAL_COOKIE_NO_RUN, len(keys))
    for k in keys:
        out += struct.pack("<HH", k, len(containers[k]) - 1)
    # offsets: from stream start to each container's data
    data_start = len(out) + 4 * len(keys)
    blobs = []
    offsets = []
    at = data_start
    for k in keys:
        vals = containers[k]
        if len(vals) <= 4096:
            blob = struct.pack(f"<{len(vals)}H", *vals)
        else:
            words = [0] * 1024
            for v in vals:
                words[v >> 6] |= 1 << (v & 63)
            blob = struct.pack("<1024Q", *words)
        offsets.append(at)
        blobs.append(blob)
        at += len(blob)
    out += struct.pack(f"<{len(keys)}I", *offsets) if keys else b""
    return out + b"".join(blobs)


def encode_bitmap_array(positions: list[int]) -> bytes:
    groups: dict[int, list[int]] = {}
    for p in positions:
        groups.setdefault(p >> 32, []).append(p & 0xFFFFFFFF)
    n = (max(groups) + 1) if groups else 0
    out = struct.pack("<iq", PORTABLE_MAGIC, n)
    for key in range(n):
        out += _encode_rb32(groups.get(key, []))
    return out


# ------------------------------------------------------- file / resolve
def write_dv_file(bitmaps: list[list[int]]) -> tuple[bytes, list[tuple[int, int]]]:
    """Pack bitmaps into ONE DV file (format version 1); returns
    (file bytes, [(offset, sizeInBytes) per bitmap]) for descriptors."""
    return write_dv_file_encoded(
        [encode_bitmap_array(positions) for positions in bitmaps]
    )


def write_dv_file_encoded(
    datas: list[bytes],
) -> tuple[bytes, list[tuple[int, int]]]:
    """Same framing over PRE-ENCODED bitmap-array bytes — the shape the
    snapshot->Delta exporter needs: per-file bitmaps encode in executor
    tasks (positions never reach the driver) and only the compact bytes
    assemble here."""
    out = bytearray(b"\x01")
    spans = []
    for data in datas:
        spans.append((len(out), len(data)))
        out += struct.pack(">i", len(data))
        out += data
        out += struct.pack(">I", zlib.crc32(data) & 0xFFFFFFFF)
    return bytes(out), spans


def read_dv_span(blob: bytes, offset: int, size_in_bytes: int) -> list[int]:
    """Decode one stored vector at ``offset`` of a DV file, CRC-checked."""
    if not blob or blob[0] != 1:
        raise DeltaDvError(
            f"unsupported deletion-vector file format version "
            f"{blob[0] if blob else 'empty'}"
        )
    (size,) = struct.unpack_from(">i", blob, offset)
    if size != size_in_bytes:
        raise DeltaDvError(
            f"descriptor sizeInBytes {size_in_bytes} != stored size {size}"
        )
    data = blob[offset + 4 : offset + 4 + size]
    (crc,) = struct.unpack_from(">I", blob, offset + 4 + size)
    if zlib.crc32(data) & 0xFFFFFFFF != crc:
        raise DeltaDvError("deletion-vector checksum mismatch")
    return decode_bitmap_array(data)


def dv_relative_path(path_or_inline: str) -> str:
    """storageType 'u': ``<random prefix><20-char z85 uuid>`` ->
    ``[prefix/]deletion_vector_<uuid>.bin`` under the table root."""
    if len(path_or_inline) < 20:
        raise DeltaDvError(f"uuid dv path too short: {path_or_inline!r}")
    prefix, enc = path_or_inline[:-20], path_or_inline[-20:]
    u = _uuid.UUID(bytes=z85_decode(enc, 16))
    name = f"deletion_vector_{u}.bin"
    return f"{prefix}/{name}" if prefix else name


def dv_positions(descriptor: dict, table_path: str) -> list[int]:
    """Resolve a DeletionVectorDescriptor to its deleted positions —
    pure function of (descriptor, table root), safe to run in an
    executor task."""
    st = descriptor.get("storageType")
    pid = descriptor.get("pathOrInlineDv") or ""
    if st == "i":
        data = z85_decode(pid, descriptor.get("sizeInBytes"))
        return decode_bitmap_array(data)
    if st == "u":
        full = f"{table_path.rstrip('/')}/{dv_relative_path(pid)}"
    elif st == "p":
        full = pid
    else:
        raise DeltaDvError(f"unknown deletion-vector storageType {st!r}")
    with open(full, "rb") as fh:
        blob = fh.read()
    off = descriptor.get("offset")
    if off is None:
        off = 1  # single-vector file: data starts right after the version byte
    return read_dv_span(blob, off, descriptor["sizeInBytes"])

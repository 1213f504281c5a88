"""MP4 / ISO BMFF (ISO 14496-12) container demuxer + minimal muxer.

Video pipelines need frame/sample EXTRACTION long before they need codec
decode: sampling every-Nth frame payload, counting samples, reading
duration/codec/track metadata are all container-level operations.  This
module parses the real box structure — ftyp / moov (mvhd, trak → tkhd,
mdia → mdhd, hdlr, minf → stbl → stsd/stts/stsz/stsc/stco) / mdat — and
resolves the sample tables to exact per-sample byte ranges, so
``frame_sample`` plumbing operates on REAL MP4 files.  Codec decode of
the extracted payloads (H.264/HEVC/AAC bitstreams) honestly raises —
that genuinely needs ffmpeg-class libraries absent from this container.

The muxer writes a minimal single-track video MP4 (ftyp + mdat + moov,
mdat first so chunk offsets don't depend on moov size) whose samples are
caller-provided opaque bytes — enough for deterministic round-trip tests
through the real parser, and structurally valid ISO BMFF (box sizes,
version-0 full boxes, 16.16 fixed-point track dimensions, unity matrix).

Same fail-loudly contract as the other codecs: truncated or non-BMFF
payloads raise ``UnsupportedMediaError`` via the shared classifier.
"""

from __future__ import annotations

import struct

from .codecs import UnsupportedMediaError, _classified

_CONTAINERS = {b"moov", b"trak", b"mdia", b"minf", b"stbl", b"dinf", b"edts"}


def _walk(data: bytes, start: int, end: int):
    """Yield (box_type, body_start, body_end) for each box in [start, end)."""
    pos = start
    while pos + 8 <= end:
        (size,) = struct.unpack(">I", data[pos:pos + 4])
        btype = data[pos + 4:pos + 8]
        body = pos + 8
        if size == 1:  # 64-bit largesize
            (size,) = struct.unpack(">Q", data[pos + 8:pos + 16])
            body = pos + 16
        elif size == 0:  # box extends to end of file
            size = end - pos
        if size < 8 or pos + size > end:
            raise UnsupportedMediaError("malformed box size")
        yield btype, body, pos + size
        pos += size


def _fullbox(data: bytes, start: int) -> tuple[int, int]:
    version = data[start]
    return version, start + 4


def _parse_stbl(data: bytes, start: int, end: int) -> dict:
    out: dict = {}
    for btype, b, e in _walk(data, start, end):
        if btype == b"stsd":
            _, p = _fullbox(data, b)
            (n,) = struct.unpack(">I", data[p:p + 4])
            if n >= 1:
                out["codec"] = data[p + 8:p + 12].decode("latin1")
        elif btype == b"stts":
            _, p = _fullbox(data, b)
            (n,) = struct.unpack(">I", data[p:p + 4])
            entries = struct.unpack(f">{2 * n}I", data[p + 4:p + 4 + 8 * n])
            out["stts"] = list(zip(entries[0::2], entries[1::2]))
        elif btype == b"stsz":
            _, p = _fullbox(data, b)
            uniform, count = struct.unpack(">II", data[p:p + 8])
            if uniform:
                out["sizes"] = [uniform] * count
            else:
                out["sizes"] = list(
                    struct.unpack(f">{count}I", data[p + 8:p + 8 + 4 * count])
                )
        elif btype == b"stsc":
            _, p = _fullbox(data, b)
            (n,) = struct.unpack(">I", data[p:p + 4])
            vals = struct.unpack(f">{3 * n}I", data[p + 4:p + 4 + 12 * n])
            out["stsc"] = [
                (vals[i], vals[i + 1], vals[i + 2]) for i in range(0, 3 * n, 3)
            ]
        elif btype == b"stco":
            _, p = _fullbox(data, b)
            (n,) = struct.unpack(">I", data[p:p + 4])
            out["chunk_offsets"] = list(
                struct.unpack(f">{n}I", data[p + 4:p + 4 + 4 * n])
            )
        elif btype == b"co64":
            _, p = _fullbox(data, b)
            (n,) = struct.unpack(">I", data[p:p + 4])
            out["chunk_offsets"] = list(
                struct.unpack(f">{n}Q", data[p + 4:p + 4 + 8 * n])
            )
    return out


def _sample_offsets(stbl: dict) -> list[tuple[int, int]]:
    """Resolve stsz+stsc+stco into per-sample (offset, size)."""
    sizes = stbl.get("sizes", [])
    chunks = stbl.get("chunk_offsets", [])
    stsc = stbl.get("stsc", [])
    if not sizes or not chunks or not stsc:
        return []
    # expand stsc runs into samples-per-chunk for every chunk
    per_chunk = []
    for i, (first, spc, _) in enumerate(stsc):
        last = stsc[i + 1][0] - 1 if i + 1 < len(stsc) else len(chunks)
        per_chunk.extend([spc] * (last - first + 1))
    per_chunk = per_chunk[: len(chunks)]
    out = []
    si = 0
    for ci, chunk_off in enumerate(chunks):
        off = chunk_off
        for _ in range(per_chunk[ci] if ci < len(per_chunk) else 0):
            if si >= len(sizes):
                break
            out.append((off, sizes[si]))
            off += sizes[si]
            si += 1
    return out


@_classified
def parse_mp4(payload: bytes) -> dict:
    """Parse the box structure; returns brand, movie timescale/duration
    and per-track metadata including resolved sample byte ranges."""
    if len(payload) < 12 or payload[4:8] != b"ftyp":
        raise UnsupportedMediaError("not an ISO BMFF / MP4 payload")
    info: dict = {"brand": payload[8:12].decode("latin1"), "tracks": []}
    for btype, b, e in _walk(payload, 0, len(payload)):
        if btype != b"moov":
            continue
        for mtype, mb, me in _walk(payload, b, e):
            if mtype == b"mvhd":
                ver, p = _fullbox(payload, mb)
                if ver == 1:
                    ts, dur = struct.unpack(">IQ", payload[p + 16:p + 28])
                else:
                    ts, dur = struct.unpack(">II", payload[p + 8:p + 16])
                info["timescale"], info["duration"] = ts, dur
                info["duration_s"] = dur / ts if ts else 0.0
            elif mtype == b"trak":
                track: dict = {}
                for ttype, tb, te in _walk(payload, mb, me):
                    if ttype == b"tkhd":
                        ver, p = _fullbox(payload, tb)
                        base = p + (32 if ver == 1 else 20)
                        w, h = struct.unpack(
                            ">II", payload[te - 8:te]
                        )
                        track["width"] = w >> 16  # 16.16 fixed point
                        track["height"] = h >> 16
                    elif ttype == b"mdia":
                        for dtype, db, de in _walk(payload, tb, te):
                            if dtype == b"mdhd":
                                ver, p = _fullbox(payload, db)
                                if ver == 1:
                                    mts, mdur = struct.unpack(
                                        ">IQ", payload[p + 16:p + 28]
                                    )
                                else:
                                    mts, mdur = struct.unpack(
                                        ">II", payload[p + 8:p + 16]
                                    )
                                track["timescale"], track["duration"] = mts, mdur
                            elif dtype == b"hdlr":
                                _, p = _fullbox(payload, db)
                                kind = payload[p + 4:p + 8]
                                track["type"] = {
                                    b"vide": "video", b"soun": "audio"
                                }.get(kind, kind.decode("latin1"))
                            elif dtype == b"minf":
                                for stype, sb, se in _walk(payload, db, de):
                                    if stype == b"stbl":
                                        stbl = _parse_stbl(payload, sb, se)
                                        track["codec"] = stbl.get("codec")
                                        track["samples"] = _sample_offsets(stbl)
                                        track["n_samples"] = len(
                                            track["samples"]
                                        )
                info["tracks"].append(track)
    if "timescale" not in info:
        raise UnsupportedMediaError("no moov/mvhd box (fragmented MP4?)")
    return info


@_classified
def extract_samples(
    payload: bytes, track: dict, every_n: int = 1
) -> list[bytes]:
    """Every-Nth sample payload of a parsed track — real byte ranges out
    of mdat.  The payloads are codec bitstreams (opaque without ffmpeg);
    size/position/count are fully real."""
    out = []
    for i, (off, size) in enumerate(track.get("samples", [])):
        if i % every_n:
            continue
        if off + size > len(payload):
            raise UnsupportedMediaError("sample range past end of payload")
        out.append(payload[off:off + size])
    return out


def encode_mp4(
    samples: list[bytes],
    width: int,
    height: int,
    fps: int = 10,
    codec: bytes = b"mp4v",
    samples_per_chunk: int | None = None,
) -> bytes:
    """Minimal valid single-video-track MP4 wrapping opaque sample bytes.

    ``samples_per_chunk`` splits mdat into multiple chunks (default: one
    chunk) — exercises the stsc run-length + stco multi-offset path real
    muxers produce."""

    def box(btype: bytes, body: bytes) -> bytes:
        return struct.pack(">I", 8 + len(body)) + btype + body

    def fullbox(btype: bytes, body: bytes, version: int = 0) -> bytes:
        return box(btype, bytes([version, 0, 0, 0]) + body)

    timescale = fps
    n = len(samples)
    ftyp = box(b"ftyp", b"isom" + struct.pack(">I", 512) + b"isomiso2")
    mdat_body = b"".join(samples)
    mdat = box(b"mdat", mdat_body)
    data_start = len(ftyp) + 8  # first sample offset inside the file

    mvhd = fullbox(
        b"mvhd",
        struct.pack(">IIII", 0, 0, timescale, n)  # times, timescale, duration
        + struct.pack(">IHH", 0x00010000, 0x0100, 0)  # rate, volume, rsvd
        + b"\x00" * 8
        + struct.pack(">9i", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000)
        + b"\x00" * 24
        + struct.pack(">I", 2),  # next track id
    )
    tkhd = box(
        b"tkhd",
        bytes([0, 0, 0, 3])  # version 0, flags: enabled+in-movie
        + struct.pack(">IIII", 0, 0, 1, 0)  # times, track id, rsvd
        + struct.pack(">I", n)  # duration
        + b"\x00" * 8
        + struct.pack(">hhhh", 0, 0, 0, 0)  # layer, group, volume, rsvd
        + struct.pack(">9i", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000)
        + struct.pack(">II", width << 16, height << 16),
    )
    mdhd = fullbox(
        b"mdhd",
        struct.pack(">IIII", 0, 0, timescale, n) + struct.pack(">HH", 0x55C4, 0),
    )
    hdlr = fullbox(
        b"hdlr", struct.pack(">I", 0) + b"vide" + b"\x00" * 12 + b"demo\x00"
    )
    # 86-byte visual sample entry (ISO 14496-12 §12.1.3)
    sample_entry = (
        struct.pack(">I", 86) + codec
        + b"\x00" * 6 + struct.pack(">H", 1)  # reserved, data ref index
        + b"\x00" * 16
        + struct.pack(">HH", width, height)
        + struct.pack(">II", 0x00480000, 0x00480000)  # 72 dpi
        + struct.pack(">I", 0) + struct.pack(">H", 1)  # rsvd, frame count
        + b"\x00" * 32  # compressor name
        + struct.pack(">Hh", 24, -1)  # depth, color table
    )
    stsd = fullbox(b"stsd", struct.pack(">I", 1) + sample_entry)
    stts = fullbox(b"stts", struct.pack(">III", 1, n, 1))
    spc = samples_per_chunk or max(n, 1)
    chunk_offsets, stsc_runs = [], []
    off, si = data_start, 0
    while si < n:
        k = min(spc, n - si)
        chunk_offsets.append(off)
        if not stsc_runs or stsc_runs[-1][1] != k:
            stsc_runs.append((len(chunk_offsets), k))
        off += sum(len(s) for s in samples[si:si + k])
        si += k
    stsc = fullbox(
        b"stsc",
        struct.pack(">I", len(stsc_runs))
        + b"".join(
            struct.pack(">III", first, k, 1) for first, k in stsc_runs
        ),
    )
    stsz = fullbox(
        b"stsz",
        struct.pack(">II", 0, n)
        + b"".join(struct.pack(">I", len(s)) for s in samples),
    )
    stco = fullbox(
        b"stco",
        struct.pack(">I", len(chunk_offsets))
        + b"".join(struct.pack(">I", o) for o in chunk_offsets),
    )
    stbl = box(b"stbl", stsd + stts + stsc + stsz + stco)
    vmhd = box(b"vmhd", bytes([0, 0, 0, 1]) + struct.pack(">HHHH", 0, 0, 0, 0))
    dref = fullbox(
        b"dref", struct.pack(">I", 1) + struct.pack(">I", 12) + b"url " + bytes([0, 0, 0, 1])
    )
    dinf = box(b"dinf", dref)
    minf = box(b"minf", vmhd + dinf + stbl)
    mdia = box(b"mdia", mdhd + hdlr + minf)
    trak = box(b"trak", tkhd + mdia)
    moov = box(b"moov", mvhd + trak)
    return ftyp + mdat + moov

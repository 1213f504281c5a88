"""MPEG audio (MP3) frame demuxer + minimal encoder.

Audio pipelines need frame-level access long before full decode:
counting frames, reading bitrate/samplerate/channel layout, measuring
duration, detecting CBR vs VBR, slicing frame payloads for sharding —
all container/framing operations.  This module parses the real MPEG
audio framing (ISO 11172-3 / 13818-3): ID3v2 tag skip (syncsafe size),
per-frame 4-byte header decode (version / layer / bitrate / samplerate
/ padding / channel mode), exact frame-length arithmetic for Layers
I-III across MPEG1/2/2.5, Xing/Info VBR header extraction, and ID3v1
trailer detection.  Huffman/IMDCT decode of the frame payloads to PCM
honestly raises — that genuinely needs a DSP codec library absent from
this container; the framing layer, the part a 100 TB audio pipeline
shuffles, seeks and shards on, is real.

The encoder writes structurally valid CBR or per-frame-bitrate (VBR)
streams whose frame payloads are caller-provided opaque bytes, plus
optional ID3v2 tags and a Xing header — enough for deterministic
round-trip tests through the real parser.

Same fail-loudly contract as the other codecs: truncated or non-MPEG
payloads raise ``UnsupportedMediaError`` via the shared classifier.
"""

from __future__ import annotations

import struct

from .codecs import UnsupportedMediaError, _classified

# bitrate tables [kbps], index 1..14 (0 = free, 15 = bad) — ISO 11172-3
# Table B.2 / 13818-3 lower-sampling-frequency extension
_BITRATES = {
    # (version_group, layer): version_group "1" = MPEG1, "2" = MPEG2/2.5
    ("1", 1): [32, 64, 96, 128, 160, 192, 224, 256, 288, 320, 352, 384, 416, 448],
    ("1", 2): [32, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320, 384],
    ("1", 3): [32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320],
    ("2", 1): [32, 48, 56, 64, 80, 96, 112, 128, 144, 160, 176, 192, 224, 256],
    ("2", 2): [8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160],
    ("2", 3): [8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160],
}
_SAMPLERATES = {
    3: [44100, 48000, 32000],  # version bits 11 = MPEG1
    2: [22050, 24000, 16000],  # version bits 10 = MPEG2
    0: [11025, 12000, 8000],  # version bits 00 = MPEG2.5
}
_VERSION_NAME = {3: "MPEG1", 2: "MPEG2", 0: "MPEG2.5"}
_CHANNEL_MODES = ["stereo", "joint_stereo", "dual_channel", "mono"]


def _vgroup(version_bits: int) -> str:
    return "1" if version_bits == 3 else "2"


def _samples_per_frame(version_bits: int, layer: int) -> int:
    if layer == 1:
        return 384
    if layer == 2:
        return 1152
    return 1152 if version_bits == 3 else 576  # Layer III LSF halves


def _frame_length(version_bits: int, layer: int, bitrate_kbps: int, samplerate: int, padding: int) -> int:
    bps = bitrate_kbps * 1000
    if layer == 1:
        return (12 * bps // samplerate + padding) * 4
    coef = _samples_per_frame(version_bits, layer) // 8
    return coef * bps // samplerate + padding


def _decode_header(hdr: bytes) -> dict:
    if len(hdr) < 4 or hdr[0] != 0xFF or (hdr[1] & 0xE0) != 0xE0:
        raise UnsupportedMediaError("missing MPEG audio frame sync")
    version_bits = (hdr[1] >> 3) & 0x3
    layer_bits = (hdr[1] >> 1) & 0x3
    if version_bits == 1 or layer_bits == 0:
        raise UnsupportedMediaError("reserved MPEG version/layer bits")
    layer = 4 - layer_bits  # bits 11→Layer I, 10→II, 01→III
    br_idx = (hdr[2] >> 4) & 0xF
    sr_idx = (hdr[2] >> 2) & 0x3
    if br_idx in (0, 15) or sr_idx == 3:
        raise UnsupportedMediaError("free/invalid bitrate or samplerate index")
    bitrate = _BITRATES[(_vgroup(version_bits), layer)][br_idx - 1]
    samplerate = _SAMPLERATES[version_bits][sr_idx]
    padding = (hdr[2] >> 1) & 0x1
    mode = (hdr[3] >> 6) & 0x3
    return {
        "version_bits": version_bits,
        "version": _VERSION_NAME[version_bits],
        "layer": layer,
        "bitrate_kbps": bitrate,
        "samplerate": samplerate,
        "padding": padding,
        "channel_mode": _CHANNEL_MODES[mode],
        "crc": (hdr[1] & 0x1) == 0,
        "length": _frame_length(version_bits, layer, bitrate, samplerate, padding),
    }


def _id3v2_size(data: bytes) -> int:
    """Bytes occupied by a leading ID3v2 tag (0 when absent)."""
    if len(data) < 10 or data[:3] != b"ID3":
        return 0
    if any(b & 0x80 for b in data[6:10]):
        raise UnsupportedMediaError("non-syncsafe ID3v2 size")
    size = (data[6] << 21) | (data[7] << 14) | (data[8] << 7) | data[9]
    footer = 10 if (data[5] & 0x10) else 0
    return 10 + size + footer


def _xing_offset(version_bits: int, channel_mode: str) -> int:
    """Side-info length decides where a Xing/Info header sits in the
    first frame's payload (after the 4-byte header)."""
    mono = channel_mode == "mono"
    if version_bits == 3:  # MPEG1
        return 17 if mono else 32
    return 9 if mono else 17


def _parse_xing(data: bytes, frame_off: int, hdr: dict) -> dict | None:
    p = frame_off + 4 + _xing_offset(hdr["version_bits"], hdr["channel_mode"])
    tag = data[p : p + 4]
    if tag not in (b"Xing", b"Info"):
        return None
    (flags,) = struct.unpack(">I", data[p + 4 : p + 8])
    out: dict = {"tag": tag.decode(), "flags": flags}
    q = p + 8
    if flags & 0x1:
        (out["frames"],) = struct.unpack(">I", data[q : q + 4])
        q += 4
    if flags & 0x2:
        (out["bytes"],) = struct.unpack(">I", data[q : q + 4])
    return out


@_classified
def parse_mpeg_audio(payload: bytes) -> dict:
    """Walk every frame of an MPEG audio stream.  Returns header fields,
    per-frame (offset, size, bitrate) triples, Xing/Info VBR metadata
    when present, and the exact duration from the frame count.  Strict:
    frames must tile the stream exactly (modulo leading ID3v2 and
    trailing ID3v1 tags) — garbage between frames raises rather than
    resyncing, the right default under a correctness gate."""
    data = bytes(payload)
    pos = _id3v2_size(data)
    end = len(data)
    id3v1 = end >= 128 and data[end - 128 : end - 125] == b"TAG"
    if id3v1:
        end -= 128
    if pos >= end:
        raise UnsupportedMediaError("no MPEG audio frames")

    first = _decode_header(data[pos : pos + 4])
    frames: list[tuple[int, int, int]] = []
    bitrates: set[int] = set()
    cursor = pos
    while cursor < end:
        hdr = _decode_header(data[cursor : cursor + 4])
        if (
            hdr["version_bits"] != first["version_bits"]
            or hdr["layer"] != first["layer"]
            or hdr["samplerate"] != first["samplerate"]
        ):
            raise UnsupportedMediaError("mid-stream version/layer change")
        if cursor + hdr["length"] > end:
            raise UnsupportedMediaError("truncated final frame")
        frames.append((cursor, hdr["length"], hdr["bitrate_kbps"]))
        bitrates.add(hdr["bitrate_kbps"])
        cursor += hdr["length"]

    xing = _parse_xing(data, frames[0][0], first)
    spf = _samples_per_frame(first["version_bits"], first["layer"])
    n_audio = len(frames) - (1 if xing else 0)  # Xing frame carries no audio
    return {
        "version": first["version"],
        "layer": first["layer"],
        "samplerate": first["samplerate"],
        "channel_mode": first["channel_mode"],
        "samples_per_frame": spf,
        "n_frames": len(frames),
        "frames": frames,
        "is_vbr": len(bitrates) > 1,
        "bitrate_kbps": first["bitrate_kbps"] if len(bitrates) == 1 else None,
        "duration_ms": n_audio * spf * 1000 // first["samplerate"],
        "xing": xing,
        "id3v2_bytes": pos,
        "id3v1": id3v1,
    }


def extract_frame_payloads(payload: bytes, every_n: int = 1) -> list[bytes]:
    """Every-Nth frame's payload (bytes past the 4-byte header) by exact
    byte range — the sampling primitive audio sharding uses."""
    info = parse_mpeg_audio(payload)
    data = bytes(payload)
    return [
        data[off + 4 : off + size]
        for off, size, _ in info["frames"][::every_n]
    ]


def decode_pcm(payload: bytes):
    """Full Layer III decode (huffman + IMDCT + synthesis filterbank) to
    PCM requires a DSP codec library this container does not carry."""
    raise UnsupportedMediaError(
        "MP3 bitstream decode to PCM not supported in this container "
        "(framing/demux via parse_mpeg_audio is fully supported)"
    )


def _encode_one_frame(
    body: bytes, bitrate_kbps: int, samplerate: int, version_bits: int, layer: int, channel_mode: str
) -> bytes:
    vg = _vgroup(version_bits)
    try:
        br_idx = _BITRATES[(vg, layer)].index(bitrate_kbps) + 1
    except ValueError:
        raise ValueError(
            f"bitrate {bitrate_kbps} invalid for {_VERSION_NAME[version_bits]} "
            f"Layer {layer}; valid: {_BITRATES[(vg, layer)]}"
        )
    sr_idx = _SAMPLERATES[version_bits].index(samplerate)
    length = _frame_length(version_bits, layer, bitrate_kbps, samplerate, 0)
    hdr = bytes(
        [
            0xFF,
            0xE0 | (version_bits << 3) | ((4 - layer) << 1) | 0x1,  # no CRC
            (br_idx << 4) | (sr_idx << 2),
            _CHANNEL_MODES.index(channel_mode) << 6,
        ]
    )
    cap = length - 4
    return hdr + body[:cap].ljust(cap, b"\x00")


def encode_mpeg_audio(
    frame_bodies: list[bytes],
    bitrate_kbps: int | list[int] = 128,
    samplerate: int = 44100,
    version_bits: int = 3,
    layer: int = 3,
    channel_mode: str = "joint_stereo",
    id3v2_payload: bytes | None = None,
    xing: bool = False,
) -> bytes:
    """Structurally valid MPEG audio stream with opaque frame payloads
    (truncated/zero-padded to each frame's exact capacity).  Pass a list
    of per-frame bitrates for a VBR stream; ``xing=True`` prepends a
    Xing metadata frame carrying the audio frame/byte counts."""
    rates = (
        list(bitrate_kbps)
        if isinstance(bitrate_kbps, (list, tuple))
        else [bitrate_kbps] * len(frame_bodies)
    )
    if len(rates) != len(frame_bodies):
        raise ValueError("one bitrate per frame body required")
    frames = [
        _encode_one_frame(b, r, samplerate, version_bits, layer, channel_mode)
        for b, r in zip(frame_bodies, rates)
    ]
    out = b"".join(frames)
    if xing:
        body = bytearray(_xing_offset(version_bits, channel_mode))
        body += b"Xing" + struct.pack(">I", 0x3)
        body += struct.pack(">I", len(frames))
        body += struct.pack(">I", len(out))
        first = _encode_one_frame(
            bytes(body), rates[0], samplerate, version_bits, layer, channel_mode
        )
        out = first + out
    if id3v2_payload is not None:
        size = len(id3v2_payload)
        if size >= 1 << 28:
            raise ValueError("ID3v2 payload too large")
        syncsafe = bytes(
            [(size >> 21) & 0x7F, (size >> 14) & 0x7F, (size >> 7) & 0x7F, size & 0x7F]
        )
        out = b"ID3\x04\x00\x00" + syncsafe + id3v2_payload + out
    return out


# ------------------------------------------------------------------ ID3v2

#: text-frame ids surfaced by :func:`parse_id3v2` (v2.3 and v2.4 names)
_ID3_TEXT_FRAMES = {
    "TIT2": "title",
    "TPE1": "artist",
    "TALB": "album",
    "TDRC": "date",  # v2.4
    "TYER": "date",  # v2.3
    "TCON": "genre",
    "TRCK": "track",
    "TLEN": "length_ms",
}


def _id3_text(body: bytes) -> str:
    """Decode one ID3v2 text frame body: leading encoding byte then the
    string (latin-1 / UTF-16 with BOM / UTF-16BE / UTF-8)."""
    if not body:
        return ""
    enc, raw = body[0], body[1:]
    codec = {0: "latin-1", 1: "utf-16", 2: "utf-16-be", 3: "utf-8"}.get(enc)
    if codec is None:
        raise UnsupportedMediaError(f"ID3v2 text encoding {enc}")
    return raw.decode(codec, "replace").split("\x00")[0]


@_classified
def parse_id3v2(payload: bytes) -> dict:
    """Metadata from a leading ID3v2.3/2.4 tag: the text-frame subset an
    audio-curation pipeline groups/filters on (title/artist/album/date/
    genre/track/length), plus ``id3_version``.  Empty dict when the
    stream has no tag.  v2.4 frame sizes are syncsafe, v2.3 plain
    big-endian — both handled; compressed/encrypted frames and
    unsynchronised tags raise rather than mis-parse."""
    if payload[:3] != b"ID3":
        return {}
    ver_major, flags = payload[3], payload[5]
    if ver_major not in (3, 4):
        raise UnsupportedMediaError(f"ID3v2.{ver_major} unsupported")
    if flags & 0x80:
        raise UnsupportedMediaError("unsynchronised ID3v2 tag")
    total = _id3v2_size(payload)
    pos = 10
    if flags & 0x40:  # extended header: skip (size field leads it)
        if ver_major == 4:
            ext = ((payload[pos] << 21) | (payload[pos + 1] << 14)
                   | (payload[pos + 2] << 7) | payload[pos + 3])
        else:
            (ext,) = struct.unpack(">I", payload[pos:pos + 4])
            ext += 4
        pos += ext
    out: dict = {"id3_version": f"2.{ver_major}"}
    end = total - (10 if (payload[5] & 0x10) else 0)
    while pos + 10 <= end:
        fid = payload[pos:pos + 4]
        if fid == b"\x00\x00\x00\x00":  # padding
            break
        if ver_major == 4:
            if any(b & 0x80 for b in payload[pos + 4:pos + 8]):
                raise UnsupportedMediaError("non-syncsafe v2.4 frame size")
            size = ((payload[pos + 4] << 21) | (payload[pos + 5] << 14)
                    | (payload[pos + 6] << 7) | payload[pos + 7])
        else:
            (size,) = struct.unpack(">I", payload[pos + 4:pos + 8])
        fflags = payload[pos + 8:pos + 10]
        body = payload[pos + 10:pos + 10 + size]
        pos += 10 + size
        if fflags[1] & 0x0C:  # compressed / encrypted
            raise UnsupportedMediaError("compressed/encrypted ID3 frame")
        name = _ID3_TEXT_FRAMES.get(fid.decode("ascii", "replace"))
        if name:
            out[name] = _id3_text(body)
    return out


def make_id3v2(tags: dict, version: int = 4) -> bytes:
    """An ID3v2.3/2.4 tag payload (the bytes AFTER the 10-byte header —
    feed to ``encode_mpeg_audio(id3v2_payload=...)``, which writes the
    header) carrying the given text frames, UTF-8 for v2.4, latin-1
    for v2.3."""
    rev = {v: k for k, v in _ID3_TEXT_FRAMES.items() if k != "TYER"}
    if version == 3:
        rev["date"] = "TYER"
    body = b""
    for name, val in tags.items():
        fid = rev.get(name)
        if fid is None:
            raise ValueError(f"unknown tag {name!r}")
        if version == 4:
            frame = b"\x03" + str(val).encode("utf-8")
            size = len(frame)
            sz = bytes([(size >> 21) & 0x7F, (size >> 14) & 0x7F,
                        (size >> 7) & 0x7F, size & 0x7F])
        else:
            frame = b"\x00" + str(val).encode("latin-1")
            sz = struct.pack(">I", len(frame))
        body += fid.encode() + sz + b"\x00\x00" + frame
    return body

"""MPEG audio framing: round-trips through the real parser, exact
frame-length arithmetic per layer/version, VBR/Xing/ID3 handling, and
fail-loudly classification (operators/mp3.py)."""

import pytest

from easy_sql_spark.operators.codecs import UnsupportedMediaError
from easy_sql_spark.operators.mp3 import (
    decode_pcm,
    encode_mpeg_audio,
    extract_frame_payloads,
    parse_mpeg_audio,
)


def _bodies(n, size=200, seed=7):
    return [bytes((seed * 31 + k * 17 + i) % 256 for i in range(size)) for k in range(n)]


def test_cbr_roundtrip_exact_geometry():
    bodies = _bodies(6)
    payload = encode_mpeg_audio(bodies, bitrate_kbps=128, samplerate=44100)
    info = parse_mpeg_audio(payload)
    # MPEG1 Layer III: 144 * 128000 / 44100 = 417 bytes/frame
    assert [s for _, s, _ in info["frames"]] == [417] * 6
    assert info["n_frames"] == 6
    assert info["bitrate_kbps"] == 128 and not info["is_vbr"]
    assert info["samplerate"] == 44100
    assert info["samples_per_frame"] == 1152
    assert info["duration_ms"] == 6 * 1152 * 1000 // 44100
    got = extract_frame_payloads(payload)
    assert [g[:200] for g in got] == bodies
    assert all(len(g) == 413 for g in got)  # 417 - 4-byte header
    # every-2nd sampling
    assert [g[:200] for g in extract_frame_payloads(payload, every_n=2)] == bodies[::2]


def test_vbr_mixed_bitrates():
    payload = encode_mpeg_audio(_bodies(4), bitrate_kbps=[64, 128, 192, 320])
    info = parse_mpeg_audio(payload)
    assert info["is_vbr"] and info["bitrate_kbps"] is None
    assert [b for _, _, b in info["frames"]] == [64, 128, 192, 320]
    assert [s for _, s, _ in info["frames"]] == [
        144 * b * 1000 // 44100 for b in (64, 128, 192, 320)
    ]


def test_xing_header_and_duration_excludes_metadata_frame():
    payload = encode_mpeg_audio(_bodies(5), bitrate_kbps=128, xing=True)
    info = parse_mpeg_audio(payload)
    assert info["n_frames"] == 6  # 5 audio + 1 Xing
    assert info["xing"]["tag"] == "Xing"
    assert info["xing"]["frames"] == 5
    assert info["duration_ms"] == 5 * 1152 * 1000 // 44100


def test_id3v2_skip_and_id3v1_trailer():
    tag = b"TIT2 synthetic title frame"
    payload = encode_mpeg_audio(_bodies(3), id3v2_payload=tag)
    payload += b"TAG" + b"\x00" * 125  # ID3v1 trailer
    info = parse_mpeg_audio(payload)
    assert info["id3v2_bytes"] == 10 + len(tag)
    assert info["id3v1"] is True
    assert info["n_frames"] == 3


def test_mpeg2_layer3_lsf_geometry():
    payload = encode_mpeg_audio(
        _bodies(4), bitrate_kbps=64, samplerate=22050, version_bits=2
    )
    info = parse_mpeg_audio(payload)
    assert info["version"] == "MPEG2"
    assert info["samples_per_frame"] == 576  # LSF halves Layer III
    assert [s for _, s, _ in info["frames"]] == [576 // 8 * 64000 // 22050] * 4
    assert info["duration_ms"] == 4 * 576 * 1000 // 22050


def test_layer1_and_layer2_geometry():
    l1 = parse_mpeg_audio(
        encode_mpeg_audio(_bodies(2), bitrate_kbps=256, layer=1)
    )
    assert l1["layer"] == 1 and l1["samples_per_frame"] == 384
    assert [s for _, s, _ in l1["frames"]] == [(12 * 256000 // 44100) * 4] * 2
    l2 = parse_mpeg_audio(
        encode_mpeg_audio(_bodies(2), bitrate_kbps=192, layer=2)
    )
    assert l2["layer"] == 2 and l2["samples_per_frame"] == 1152
    assert [s for _, s, _ in l2["frames"]] == [144 * 192000 // 44100] * 2


def test_mono_xing_offset():
    payload = encode_mpeg_audio(
        _bodies(3), bitrate_kbps=128, channel_mode="mono", xing=True
    )
    info = parse_mpeg_audio(payload)
    assert info["channel_mode"] == "mono"
    assert info["xing"]["frames"] == 3


def test_fail_loudly_classification():
    payload = encode_mpeg_audio(_bodies(3))
    with pytest.raises(UnsupportedMediaError, match="truncated"):
        parse_mpeg_audio(payload[:-10])
    with pytest.raises(UnsupportedMediaError):
        parse_mpeg_audio(b"not audio at all")
    with pytest.raises(UnsupportedMediaError):
        parse_mpeg_audio(b"")
    # mid-stream samplerate change
    a = encode_mpeg_audio(_bodies(1), samplerate=44100)
    b = encode_mpeg_audio(_bodies(1), samplerate=32000)
    with pytest.raises(UnsupportedMediaError, match="mid-stream"):
        parse_mpeg_audio(a + b)
    with pytest.raises(UnsupportedMediaError, match="not supported"):
        decode_pcm(payload)


def test_invalid_encoder_bitrate_rejected():
    with pytest.raises(ValueError, match="invalid for MPEG1"):
        encode_mpeg_audio(_bodies(1), bitrate_kbps=144)  # MPEG2-only rate


# ------------------------------------------------------------------ ID3v2


def test_id3v2_4_text_frames_roundtrip():
    from easy_sql_spark.operators.mp3 import (
        encode_mpeg_audio,
        make_id3v2,
        parse_id3v2,
        parse_mpeg_audio,
    )

    tag = make_id3v2(
        {"title": "Tïtle — ünïcode", "artist": "A", "album": "B",
         "date": "2024", "track": "3"},
        version=4,
    )
    mp3 = encode_mpeg_audio(
        [b"\x00" * 64] * 3, bitrate_kbps=128, samplerate=44100,
        id3v2_payload=tag,
    )
    meta = parse_id3v2(mp3)
    assert meta["id3_version"] == "2.4"
    assert meta["title"] == "Tïtle — ünïcode"  # utf-8 survives
    assert (meta["artist"], meta["album"], meta["date"], meta["track"]) == (
        "A", "B", "2024", "3")
    # tag does not confuse the frame demuxer
    assert parse_mpeg_audio(mp3)["n_frames"] == 3


def test_id3v2_3_header_and_latin1():
    from easy_sql_spark.operators.mp3 import make_id3v2, parse_id3v2

    body = make_id3v2({"title": "Hello", "date": "1999"}, version=3)
    sz = len(body)
    hdr = b"ID3\x03\x00\x00" + bytes([
        (sz >> 21) & 0x7F, (sz >> 14) & 0x7F, (sz >> 7) & 0x7F, sz & 0x7F])
    meta = parse_id3v2(hdr + body + b"\xff\xfb\x90\x00")
    assert meta["id3_version"] == "2.3"
    assert meta["title"] == "Hello" and meta["date"] == "1999"


def test_id3v2_absent_and_malformed():
    import pytest

    from easy_sql_spark.operators.codecs import UnsupportedMediaError
    from easy_sql_spark.operators.mp3 import parse_id3v2

    assert parse_id3v2(b"\xff\xfb\x90\x00" + b"\x00" * 100) == {}
    with pytest.raises(UnsupportedMediaError, match="2.2"):
        parse_id3v2(b"ID3\x02\x00\x00\x00\x00\x00\x00")
    with pytest.raises(UnsupportedMediaError, match="unsynchronised"):
        parse_id3v2(b"ID3\x04\x00\x80\x00\x00\x00\x00")

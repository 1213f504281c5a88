"""WARC container tests (operators/warc.py): plain + gzip-member
round-trips, Content-Length-driven slicing, header folding, truncation
classification."""

import gzip

import pytest

from easy_sql_spark.operators.codecs import UnsupportedMediaError
from easy_sql_spark.operators.warc import parse_warc, write_warc


def _recs():
    return [
        ({"WARC-Type": "response", "WARC-Record-ID": "<urn:a>"}, b"hello world"),
        ({"WARC-Type": "conversion", "WARC-Record-ID": "<urn:b>"}, b""),
        # payload legally CONTAINS a version line: slicing must be
        # length-driven, never delimiter-scanned
        ({"WARC-Record-ID": "<urn:c>"}, b"WARC/1.0\r\nfake: x\r\n\r\nbody"),
    ]


@pytest.mark.parametrize("gz", [False, True])
def test_roundtrip(gz):
    out = parse_warc(write_warc(_recs(), gzip_members=gz))
    assert [r["headers"]["WARC-Record-ID"] for r in out] == [
        "<urn:a>", "<urn:b>", "<urn:c>"]
    assert [r["content"] for r in out] == [
        b"hello world", b"", b"WARC/1.0\r\nfake: x\r\n\r\nbody"]
    assert all(r["version"] == "WARC/1.0" for r in out)
    assert all(int(r["headers"]["Content-Length"]) == len(r["content"])
               for r in out)


def test_gzip_members_are_individually_seekable():
    payload = write_warc(_recs(), gzip_members=True)
    # one gzip member per record: each member alone inflates to one record
    members = []
    rest = payload
    import zlib

    while rest:
        d = zlib.decompressobj(wbits=31)
        members.append(d.decompress(rest))
        rest = d.unused_data
    assert len(members) == 3
    solo = parse_warc(gzip.compress(members[1], mtime=0))
    assert solo[0]["headers"]["WARC-Record-ID"] == "<urn:b>"


def test_header_folding():
    raw = (b"WARC/1.0\r\nWARC-Target-URI: http://example.com/very\r\n"
           b" /long/path\r\nContent-Length: 2\r\n\r\nok\r\n\r\n")
    (r,) = parse_warc(raw)
    assert r["headers"]["WARC-Target-URI"] == "http://example.com/very /long/path"


def test_truncation_and_garbage_classified():
    good = write_warc(_recs())
    for cut in (3, 25, len(good) - 2):
        with pytest.raises(UnsupportedMediaError):
            parse_warc(good[:cut])
    with pytest.raises(UnsupportedMediaError):
        parse_warc(b"HTTP/1.1 200 OK\r\n\r\n")
    gz = write_warc(_recs(), gzip_members=True)
    with pytest.raises(UnsupportedMediaError):
        parse_warc(gz[: len(gz) - 4])


def test_content_length_not_supplied():
    with pytest.raises(ValueError, match="Content-Length"):
        write_warc([({"Content-Length": "3"}, b"abc")])

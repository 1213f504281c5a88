"""WARC (Web ARChive, ISO 28500) container reader/writer.

CommonCrawl — the dominant raw source for LLM pretraining corpora — ships
as ``.warc.gz``: a concatenation of gzip MEMBERS, one WARC record each,
so a reader can seek to a member offset and inflate one record without
touching the rest of the file.  This module implements that format with
stdlib zlib only (reference parity: the reference has no web-archive
source; this backs the training-data-pipeline source surface beside the
MP3/MP4/image codecs in the sibling modules).

- :func:`parse_warc` — records from a plain WARC or a multi-member
  ``.warc.gz`` payload.  Content is sliced by ``Content-Length`` (never
  scanned for delimiters — payload bytes may legally contain
  ``WARC/1.0``), headers are folded per RFC long-line rules, and any
  structural violation raises ``UnsupportedMediaError`` (fail-loudly,
  same contract as codecs.py).
- :func:`write_warc` — the encoder used for round-trip tests and the
  ``text_warc_roundtrip`` oracle query; emits either plain records or
  one gzip member per record (the CommonCrawl layout).

Spark usage shape: ``spark.read.format("binaryFile")`` (or the fixture
construction in queries/llm_ops4.py) hands whole-file payloads to an
Arrow-batched ``mapInPandas`` that calls :func:`parse_warc` — payloads
never shuffle, one output row per record.
"""

from __future__ import annotations

import gzip
import io
import zlib

from .codecs import UnsupportedMediaError, _classified

GZIP_MAGIC = b"\x1f\x8b"


def _split_gzip_members(payload: bytes) -> list[bytes]:
    """Decompress a concatenation of gzip members, one output blob per
    member (the .warc.gz record-per-member layout)."""
    out: list[bytes] = []
    rest = payload
    while rest:
        if rest[:2] != GZIP_MAGIC:
            raise UnsupportedMediaError("garbage between gzip members")
        d = zlib.decompressobj(wbits=31)
        try:
            blob = d.decompress(rest)
        except zlib.error as e:
            raise UnsupportedMediaError(f"corrupt gzip member: {e}") from e
        if not d.eof:
            raise UnsupportedMediaError("truncated gzip member")
        out.append(blob)
        rest = d.unused_data
    return out


def _parse_plain(payload: bytes, base_offset: int = 0) -> list[dict]:
    records: list[dict] = []
    pos = 0
    n = len(payload)
    while pos < n:
        # tolerate stray record separators before the next version line
        while payload[pos:pos + 2] == b"\r\n":
            pos += 2
        if pos >= n:
            break
        start = pos
        eol = payload.find(b"\r\n", pos)
        if eol < 0 or not payload[pos:eol].startswith(b"WARC/"):
            raise UnsupportedMediaError("missing WARC version line")
        version = payload[pos:eol].decode("ascii", "replace")
        pos = eol + 2
        headers: dict[str, str] = {}
        last_key: str | None = None
        while True:
            eol = payload.find(b"\r\n", pos)
            if eol < 0:
                raise UnsupportedMediaError("truncated WARC header block")
            line = payload[pos:eol]
            pos = eol + 2
            if not line:
                break
            if line[:1] in (b" ", b"\t"):  # folded continuation line
                if last_key is None:
                    raise UnsupportedMediaError("continuation before any header")
                headers[last_key] += " " + line.strip().decode("utf-8", "replace")
                continue
            k, sep, v = line.partition(b":")
            if not sep:
                raise UnsupportedMediaError(f"malformed WARC header {line!r}")
            last_key = k.decode("ascii", "replace").strip()
            headers[last_key] = v.strip().decode("utf-8", "replace")
        try:
            length = int(headers["Content-Length"])
        except (KeyError, ValueError) as e:
            raise UnsupportedMediaError("missing/invalid Content-Length") from e
        if pos + length > n:
            raise UnsupportedMediaError("record content past end of payload")
        content = payload[pos:pos + length]
        pos += length
        if payload[pos:pos + 4] != b"\r\n\r\n":
            raise UnsupportedMediaError("missing record separator")
        pos += 4
        records.append(
            {
                "version": version,
                "headers": headers,
                "content": content,
                "offset": base_offset + start,
            }
        )
    return records


@_classified
def parse_warc(payload: bytes) -> list[dict]:
    """All records of a WARC payload — plain or member-per-record gzip.
    Each record: {version, headers (dict), content (bytes), offset}."""
    if payload[:2] == GZIP_MAGIC:
        records = []
        for i, blob in enumerate(_split_gzip_members(payload)):
            for r in _parse_plain(blob):
                r["offset"] = i  # member ordinal, not byte offset
                records.append(r)
        return records
    return _parse_plain(payload)


def write_warc(
    records: list[tuple[dict, bytes]], gzip_members: bool = False
) -> bytes:
    """Encode (headers, content) pairs as WARC/1.0; ``gzip_members``
    writes the CommonCrawl one-member-per-record .warc.gz layout.
    ``Content-Length`` is computed here and must not be supplied."""
    out = bytearray()
    for headers, content in records:
        if "Content-Length" in headers:
            raise ValueError("Content-Length is computed, do not supply it")
        rec = bytearray(b"WARC/1.0\r\n")
        for k, v in headers.items():
            rec += f"{k}: {v}\r\n".encode()
        rec += f"Content-Length: {len(content)}\r\n\r\n".encode()
        rec += content
        rec += b"\r\n\r\n"
        if gzip_members:
            buf = io.BytesIO()
            # fixed mtime keeps the bytes deterministic across runs
            with gzip.GzipFile(fileobj=buf, mode="wb", mtime=0) as gz:
                gz.write(bytes(rec))
            out += buf.getvalue()
        else:
            out += rec
    return bytes(out)

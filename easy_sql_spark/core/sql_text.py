"""SQL-text lexing utilities: comment masking and semicolon stripping.

Substitution must never fire inside ``--`` comments, and ``--`` inside a
string literal is not a comment (reference behavior:
easy_sql/utils/sql_expr.py:7-162).  Implemented as a single-pass scanner
tracking quote state.
"""

from __future__ import annotations

COMMENT_TOKEN = "\x00C{}\x00"


def _scan_comment_spans(sql: str) -> list[tuple[int, int]]:
    """Return (start, end) spans of ``--`` comments (to end of line),
    ignoring ``--`` that appears inside single- or double-quoted literals."""
    spans = []
    i, n = 0, len(sql)
    quote: str | None = None
    while i < n:
        ch = sql[i]
        if quote is not None:
            if ch == "\\" and i + 1 < n:
                i += 2
                continue
            if ch == quote:
                quote = None
            i += 1
            continue
        if ch in ("'", '"'):
            quote = ch
            i += 1
            continue
        if ch == "-" and i + 1 < n and sql[i + 1] == "-":
            end = sql.find("\n", i)
            if end == -1:
                end = n
            spans.append((i, end))
            i = end
            continue
        if ch == "\n":
            # quotes do not span lines for comment-detection purposes
            quote = None
            i += 1
            continue
        i += 1
    return spans


class CommentMasker:
    """Replace comments with placeholder tokens; restore them afterwards."""

    def __init__(self) -> None:
        self._saved: list[str] = []

    def mask(self, sql: str) -> str:
        spans = _scan_comment_spans(sql)
        if not spans:
            return sql
        out = []
        prev = 0
        for start, end in spans:
            out.append(sql[prev:start])
            token = COMMENT_TOKEN.format(len(self._saved))
            self._saved.append(sql[start:end])
            out.append(token)
            prev = end
        out.append(sql[prev:])
        return "".join(out)

    def unmask(self, sql: str) -> str:
        for idx, text in enumerate(self._saved):
            sql = sql.replace(COMMENT_TOKEN.format(idx), text)
        return sql


def substitute_outside_comments(sql: str, fn) -> str:
    """Apply ``fn`` (str -> str) to the SQL with comments shielded."""
    masker = CommentMasker()
    return masker.unmask(fn(masker.mask(sql)))


def strip_trailing_semicolon(sql: str) -> str:
    """Remove every ``;`` that sits outside quotes/comments (the reference
    removes ALL such semicolons, not just trailing ones — a step body is a
    single statement and the engine rejects stray separators;
    utils/sql_expr.py:140-168)."""
    spans = _scan_comment_spans(sql)

    def in_comment(pos: int) -> bool:
        return any(s <= pos < e for s, e in spans)

    out = []
    quote: str | None = None
    i, n = 0, len(sql)
    while i < n:
        ch = sql[i]
        if quote is not None:
            # same escape handling as _scan_comment_spans so both scanners
            # agree on quote state for inputs like 'don\'t; stop'
            if ch == "\\" and i + 1 < n:
                out.append(ch)
                out.append(sql[i + 1])
                i += 2
                continue
            if ch == quote or ch == "\n":
                quote = None
            out.append(ch)
            i += 1
            continue
        if in_comment(i):
            out.append(ch)
            i += 1
            continue
        if ch in ("'", '"'):
            quote = ch
            out.append(ch)
            i += 1
            continue
        if ch == ";":
            i += 1
            continue
        out.append(ch)
        i += 1
    return "".join(out)



"""Property-based tests (hypothesis) for the text/macro layer.

The reference ships no property tests (SURVEY §5); these harden the
subtlest parity surface — comment masking + fixpoint variable substitution
(reference context.py:49-111, utils/sql_expr.py:7-122) — against inputs no
example-based test would enumerate.
"""

import re

from hypothesis import given, settings
from hypothesis import strategies as st

from easy_sql_spark.core.context import VarsContext
from easy_sql_spark.core.sql_text import (
    strip_trailing_semicolon,
    substitute_outside_comments,
)

ident = st.text(
    alphabet="abcdefghijklmnopqrstuvwxyz_", min_size=1, max_size=8
)
sql_fragment = st.text(
    alphabet=st.characters(min_codepoint=32, max_codepoint=126),
    max_size=60,
)


@given(names=st.dictionaries(ident, st.integers(0, 999), min_size=1, max_size=5))
@settings(max_examples=200, deadline=None)
def test_var_substitution_replaces_every_known_ref(names):
    ctx = VarsContext(vars={k: str(v) for k, v in names.items()})
    text = " ".join(f"${{{k}}}" for k in names)
    out = ctx.replace_variables(text)
    assert out == " ".join(str(v) for v in names.values())
    assert "${" not in out


@given(
    name=ident,
    default=st.text(alphabet="abcdefghijklmnopqrstuvwxyz0123456789", max_size=8),
)
@settings(max_examples=100, deadline=None)
def test_var_default_used_iff_undefined(name, default):
    empty = VarsContext(vars={})
    assert empty.replace_variables(f"${{{name}:{default}}}") == default
    defined = VarsContext(vars={name: "VAL"})
    assert defined.replace_variables(f"${{{name}:{default}}}") == "VAL"


@given(name=ident, value=st.integers(0, 99))
@settings(max_examples=100, deadline=None)
def test_var_case_insensitive(name, value):
    ctx = VarsContext(vars={name.upper(): str(value)})
    assert ctx.replace_variables(f"${{{name.lower()}}}") == str(value)


@given(depth=st.integers(1, 8), value=st.integers(0, 999))
@settings(max_examples=50, deadline=None)
def test_recursive_resolution_reaches_fixpoint(depth, value):
    # v0 -> ${v1} -> ... -> ${vN} -> literal
    vars = {f"v{i}": f"${{v{i + 1}}}" for i in range(depth)}
    vars[f"v{depth}"] = str(value)
    ctx = VarsContext(vars=vars)
    assert ctx.replace_variables("${v0}") == str(value)


@given(body=sql_fragment, comment=sql_fragment)
@settings(max_examples=200, deadline=None)
def test_substitution_never_fires_inside_comments(body, comment):
    # ensure no accidental comment/quote structure in the generated parts
    body = body.replace("'", "").replace('"', "").replace("--", "")
    comment = comment.replace("\n", " ").replace("'", "").replace('"', "")
    sql = f"select REPLACEME from t {body}\n-- REPLACEME {comment}\nwhere x = 1"
    out = substitute_outside_comments(sql, lambda s: s.replace("REPLACEME", "X"))
    lines = out.splitlines()
    assert "REPLACEME" not in lines[0]  # outside comments: replaced
    assert "REPLACEME" in lines[1]  # inside comment: untouched


@given(stmt=sql_fragment, n_semis=st.integers(0, 3), ws=st.sampled_from(["", " ", "\n", "\t "]))
@settings(max_examples=200, deadline=None)
def test_strip_trailing_semicolon_idempotent(stmt, n_semis, ws):
    # strip quotes BEFORE dashes: removing a quote can join two lone dashes
    # into a line comment (e.g. "-'-" -> "--"), which is a different case
    stmt = stmt.replace(";", "").replace("'", "").replace('"', "").replace("--", "")
    sql = stmt + ";" * n_semis + ws
    out = strip_trailing_semicolon(sql)
    assert not re.search(r";\s*$", out)
    assert strip_trailing_semicolon(out) == out  # idempotent
    assert out.rstrip("; \n\t") == stmt.rstrip("; \n\t")

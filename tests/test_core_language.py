"""Unit tests for the step-language core (no Spark needed).

Mirrors the reference's unit coverage: step parsing (step_test.py:8-110),
variable/template substitution (context_test.py:8-90,
sql_processor_test.py:95-244), comment/semicolon lexing
(utils/sql_expr_test.py:12-166).
"""

import pytest

from easy_sql_spark.core.context import FuncRunner, TemplatesContext, VarsContext
from easy_sql_spark.core.sql_text import (
    strip_trailing_semicolon,
    substitute_outside_comments,
)
from easy_sql_spark.core.step import (
    IncludeResolver,
    StepParseError,
    expand_includes,
    parse_steps,
)


# ---------------------------------------------------------------- sql_text
def test_comment_shielded_from_substitution():
    sql = "select ${a} -- comment with ${a}\nfrom t"
    out = substitute_outside_comments(sql, lambda s: s.replace("${a}", "1"))
    assert out == "select 1 -- comment with ${a}\nfrom t"


def test_double_dash_in_string_is_not_comment():
    sql = "select '--${a}--' as v, ${a} as w"
    out = substitute_outside_comments(sql, lambda s: s.replace("${a}", "1"))
    assert out == "select '--1--' as v, 1 as w"


def test_strip_trailing_semicolon():
    assert strip_trailing_semicolon("select 1;") == "select 1"
    assert strip_trailing_semicolon("select 1;  \n") == "select 1  \n"
    assert strip_trailing_semicolon("select ';' as c") == "select ';' as c"
    assert strip_trailing_semicolon("select 1 -- c;\n") == "select 1 -- c;\n"


def test_strip_semicolon_escaped_quote():
    # backslash-escaped quote must not close the literal (ADVICE r1)
    sql = r"select 'don\'t; stop' as v;"
    assert strip_trailing_semicolon(sql) == r"select 'don\'t; stop' as v"
    # escaped backslash right before the closing quote DOES close it
    sql2 = "select 'a\\\\'; -- x\n"
    assert strip_trailing_semicolon(sql2) == "select 'a\\\\' -- x\n"


# ----------------------------------------------------------------- context
def test_vars_case_insensitive_and_recursive():
    ctx = VarsContext(vars={"A": "x", "b": "${a}_${a}"})
    assert ctx.replace_variables("v=${B}") == "v=x_x"


def test_var_default():
    ctx = VarsContext(vars={"a": "1"})
    assert ctx.replace_variables("${a:9} ${missing:7}") == "1 7"


def test_func_in_sql_with_inner_var():
    ctx = VarsContext(vars={"a": "2"})
    runner = FuncRunner()
    ctx.func_runner = runner
    assert ctx.replace_variables("${max(${a}, 3)}") == "3"
    assert ctx.replace_variables("${equal(${a}, 2)}") == "True"


def test_undefined_var_raises():
    ctx = VarsContext()
    with pytest.raises(KeyError):
        ctx.replace_variables("${nope}")


def test_templates_with_params_and_use_site_vars():
    t = TemplatesContext()
    t.add_template("sel", "select #{col} from #{tbl} where x=${v}")
    out = t.replace_templates("@{sel(col=a, tbl=t1)}")
    assert out == "select a from t1 where x=${v}"
    # vars resolve at use-site, after template expansion
    ctx = VarsContext(vars={"v": "5"})
    assert ctx.replace_variables(out) == "select a from t1 where x=5"


def test_template_without_params():
    t = TemplatesContext()
    t.add_template("frag", "1 as one")
    assert t.replace_templates("select @{frag}") == "select 1 as one"


# -------------------------------------------------------------------- step
def test_parse_steps_basic():
    sql = """-- backend: spark

-- target=variables
select 1 as a

-- target=temp.t1
select ${a} as id;

-- target=output.db1.out, if=equal(${a}, 1)
select * from t1
"""
    steps = parse_steps(sql)
    assert [s.target_type for s in steps] == ["variables", "temp", "output"]
    assert steps[1].target_name == "t1"
    assert steps[2].config.condition == "equal(${a}, 1)"
    assert steps[2].target_name == "db1.out"


def test_parse_func_step_name_keeps_parens():
    steps = parse_steps("-- target=func.do_thing(${a}, 2)\n")
    assert steps[0].target_type == "func"
    assert steps[0].target_name == "do_thing(${a}, 2)"


def test_hive_aliases_output_and_bad_type_raises():
    steps = parse_steps("-- target=hive.db.t\nselect 1")
    assert steps[0].target_type == "output"
    with pytest.raises(StepParseError):
        parse_steps("-- target=bogus.t\nselect 1")


def test_output_requires_db_table():
    with pytest.raises(StepParseError):
        parse_steps("-- target=output.justtable\nselect 1")


def test_includes_expand_and_dedup():
    resolver = IncludeResolver(
        includes={"a.sql": "-- target=temp.x\nselect 1 as v"}
    )
    sql = "-- include=a.sql\n-- target=temp.y\nselect 2"
    steps = parse_steps(sql, resolver)
    assert [s.target_name for s in steps] == ["x", "y"]
    dup = "-- include=a.sql\n-- include=a.sql"
    out = expand_includes(dup, resolver, skip_duplicate_include=True)
    assert out.count("temp.x") == 1


def test_preprocess_order_templates_then_vars():
    sql = "-- target=template.body\nselect #{c} from t\n-- target=temp.q\n@{body(c=${col})}"
    steps = parse_steps(sql)
    t = TemplatesContext()
    t.add_template("body", steps[0].sql)
    ctx = VarsContext(vars={"col": "z"})
    assert steps[1].preprocess_sql(t, ctx) == "select z from t"

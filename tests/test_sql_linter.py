"""Linter tests (reference sql_linter_test.py surface, Spark-first rules)."""

from easy_sql_spark.sql_linter import SqlLinter


def rules_of(issues):
    return [i.rule for i in issues]


def test_structural_rules():
    sql = """-- target=temp.a
select 1 as x;

-- target=temp.a
select 2 as x

-- target=check.my_check
select 1 as something_else

-- target=temp.uses_template
select @{never_defined} from a
"""
    issues = SqlLinter(sql).lint()
    rules = rules_of(issues)
    assert "ESQL01" in rules  # no backend header
    assert "ESQL04" in rules  # duplicate temp name
    assert "ESQL06" in rules  # check step without actual/expected
    assert "ESQL07" in rules  # undefined template
    assert "ESQL08" in rules  # trailing semicolon


def test_template_defined_before_use_is_clean():
    sql = """-- backend: spark
-- target=template.cols
a, b

-- target=temp.t
select @{cols} from src

-- target=check.ok
select count(*) as actual, 1 as expected from t
"""
    issues = SqlLinter(sql).lint()
    assert issues == []


def test_unused_view_rule():
    sql = """-- backend: spark
-- target=temp.dead
select 1 as x

-- target=temp.alive
select 2 as y

-- target=output.db.final
select * from alive
"""
    issues = SqlLinter(sql).lint()
    assert [i.rule for i in issues] == ["ESQL10"]
    assert "dead" in issues[0].message
    # the FINAL step's view is exempt — it is the ETL's dry-run result
    tail = "-- backend: spark\n-- target=temp.result\nselect 1 as x\n"
    assert SqlLinter(tail).lint() == []


def test_include_exclude_rules():
    sql = "-- target=temp.a\nselect 1;\n"
    only_semi = SqlLinter(sql, include_rules=["ESQL08"]).lint()
    assert rules_of(only_semi) == ["ESQL08"]
    no_semi = SqlLinter(sql, exclude_rules=["ESQL08", "ESQL01"]).lint()
    assert no_semi == []


def test_unsupported_backend_and_bad_step():
    issues = SqlLinter("-- backend: flink\n-- target=temp.t\nselect 1").lint()
    assert any(i.rule == "ESQL02" and i.level == "error" for i in issues)
    issues2 = SqlLinter("-- target=wrongtype.t\nselect 1").lint()
    assert any(i.rule == "ESQL03" and i.level == "error" for i in issues2)


def test_spark_parser_check(spark):
    sql = """-- backend: spark
-- target=temp.good
select ${var} as x from range(3)

-- target=temp.bad
selectt oops frm nowhere
"""
    issues = SqlLinter(sql).lint(spark=spark)
    bad = [i for i in issues if i.rule == "ESQL05"]
    assert len(bad) == 1, issues  # only the bad step flags; macros neutralize
    assert bad[0].line_no == 5


def test_fix_adds_backend_and_strips_semicolons(tmp_path):
    sql = "-- target=temp.a\nselect 1 as x;\n"
    fixed = SqlLinter(sql).fix()
    assert fixed.splitlines()[0] == "-- backend: spark"
    assert ";" not in fixed

    # CLI fix writes .fixed.sql
    from easy_sql_spark.sql_linter import main

    f = tmp_path / "etl.sql"
    f.write_text(sql, encoding="utf-8")
    rc = main(["fix", "--path", str(f)])
    assert rc == 0
    assert (tmp_path / "etl.fixed.sql").read_text(encoding="utf-8").startswith(
        "-- backend: spark"
    )


def test_cli_json_report(tmp_path, capsys):
    """--report json: one machine-readable document (rule/line/fixed per
    issue + level counts + exit) so CI can gate on the linter, mirroring
    the reference's sqlfluff CLI surface."""
    import json

    from easy_sql_spark.sql_linter import main

    f = tmp_path / "etl.sql"
    f.write_text("-- target=temp.a\nselect 1 as x;\n", encoding="utf-8")

    rc = main(["lint", "--path", str(f), "--report", "json"])
    rep = json.loads(capsys.readouterr().out)
    assert rc == rep["exit"] == 0
    by_rule = {i["rule"]: i for i in rep["issues"]}
    # missing backend header + trailing semicolon, both flagged fixable
    # but nothing fixed in lint mode
    assert by_rule["ESQL01"]["fixable"] and not by_rule["ESQL01"]["fixed"]
    assert by_rule["ESQL08"]["fixable"] and not by_rule["ESQL08"]["fixed"]
    assert by_rule["ESQL08"]["line"] == 1
    assert rep["counts"] == {"warning": 1, "info": 1}
    assert rep["fixed_path"] is None

    rc = main(["fix", "--path", str(f), "--report", "json"])
    rep = json.loads(capsys.readouterr().out)
    assert rc == 0
    assert all(i["fixed"] for i in rep["issues"] if i["fixable"])
    assert rep["fixed_path"] == str(tmp_path / "etl.fixed.sql")
    # and the written file really carries both fixes
    fixed = (tmp_path / "etl.fixed.sql").read_text(encoding="utf-8")
    assert fixed.startswith("-- backend: spark") and ";" not in fixed


def test_fix_is_idempotent_property():
    """fix(fix(x)) == fix(x) over generated step files."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    body = st.sampled_from(
        ["select 1 as x", "select 1 as x;", "select '${v}' as y", ""]
    )
    step = st.sampled_from(
        ["-- target=temp.t{i}", "-- target=log.l{i}", "-- target=variables"]
    )
    header = st.sampled_from(["", "-- backend: spark\n"])

    @settings(max_examples=30, deadline=None)
    @given(header, st.lists(st.tuples(step, body), min_size=1, max_size=4))
    def run(hdr, steps):
        sql = hdr + "\n\n".join(
            s.format(i=i) + "\n" + b for i, (s, b) in enumerate(steps)
        )
        once = SqlLinter(sql).fix()
        twice = SqlLinter(once).fix()
        assert once == twice
        assert SqlLinter(once).parse_backend() == "spark"

    run()

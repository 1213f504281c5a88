"""Tests for the step-by-step debugger (reference sql_processor_debugger)."""

from easy_sql_spark.runtime.debugger import SqlProcessorDebugger

ETL = """-- backend: spark

-- target=variables
select 2 as factor

-- target=temp.base
select id from range(5)

-- target=temp.scaled
select id * ${factor} as v from base

-- target=output.dbg.result
select v from scaled
"""


def make_debugger(spark, tmp_path, **kw):
    f = tmp_path / "etl.sql"
    f.write_text(ETL)
    return SqlProcessorDebugger(str(f), spark, **kw)


def test_stepping_and_state(spark, tmp_path):
    dbg = make_debugger(spark, tmp_path)
    assert not dbg.is_started and dbg.left_step_count == 4
    assert dbg.next_step_no == 1

    dbg.step_on()  # variables
    assert dbg.is_started and dbg.current_step_no == 1
    assert dbg.vars["factor"] == "2"

    dbg.step_on()  # temp.base
    assert "base" in dbg.tempviews
    assert dbg.sql("select count(*) as n from base").first()["n"] == 5

    dbg.step_to(4)
    assert dbg.is_finished and dbg.left_step_count == 0
    out_views = [v for v in dbg.tempviews if v.endswith("_output")]
    assert len(out_views) == 1  # dry-run output materialized as view
    total = dbg.sql(f"select sum(v) as s from {out_views[0]}").first()["s"]
    assert total == 2 * (0 + 1 + 2 + 3 + 4)
    dbg.sql_processor.backend.clear_temp_tables()


def test_restart_reparses_and_clears(spark, tmp_path):
    dbg = make_debugger(spark, tmp_path)
    dbg.run()
    assert dbg.is_finished
    dbg.restart()
    assert not dbg.is_started
    assert "base" not in dbg.tempviews
    dbg.step_to(2)
    assert dbg.current_step_no == 2 and "base" in dbg.tempviews
    dbg.sql_processor.backend.clear_temp_tables()


def test_add_vars_and_step_bounds(spark, tmp_path):
    dbg = make_debugger(spark, tmp_path, vars={"factor": "10"})
    dbg.add_vars({"extra": "1"})
    dbg.run()
    assert dbg.vars["extra"] == "1"
    # factor pre-set via vars is overwritten by the variables step
    assert dbg.vars["factor"] == "2"
    dbg.step_on()  # past the end: no-op
    assert dbg.is_finished
    assert dbg.step(99) is None
    dbg.sql_processor.backend.clear_temp_tables()

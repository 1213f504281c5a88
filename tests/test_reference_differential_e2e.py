"""END-TO-END differential fuzz: our SqlProcessor vs the reference's,
both executing the SAME generated ETL on the SAME SparkSession.

The reference's Spark backend is plain PySpark, so its full processor
runs in this container with no extra dependencies.  Each case generates
a random step-language ETL (variables capture, templates with params,
temp/cache/broadcast steps chained over a shared ``diff_base`` view,
var/func/template references inside the SQL, log and check steps,
``if=`` conditions with generator-known truth), runs it through the
REFERENCE SqlProcessor, snapshots every view it creates, tears the
views down, runs OUR SqlProcessor on the same text, and compares
per-view column names and sorted row multisets.

This is step-language parity measured against the reference ENGINE, not
against our reading of it — the strongest end-to-end evidence SURVEY
§2A/§2B can get.  The text-layer differential (test_reference_
differential.py) pins the macro semantics; this pins what the steps DO.

Grammar stays inside behavior both engines define deliberately:
conditions use bool-returning funcs (the reference treats a func
returning the STRING 'false' as truthy — ours skips; documented
divergence, not generated), and ``__skip_all__`` values stay in the
reference's exact accepted list.
"""

from __future__ import annotations

import logging
import os
import random
import sys

import pytest

import _depth

REF_ROOT = "/root/reference"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(os.path.join(REF_ROOT, "easy_sql")),
    reason="reference checkout absent",
)

WORDS = ["alpha", "beta", "gamma", "delta"]


@pytest.fixture(scope="module")
def ref_processor_cls():
    sys.path.insert(0, REF_ROOT)
    try:
        logging.getLogger("easy_sql").setLevel(logging.CRITICAL)
        from easy_sql.sql_processor import SqlProcessor as RefSqlProcessor

        yield RefSqlProcessor
    finally:
        sys.path.remove(REF_ROOT)


@pytest.fixture(scope="module")
def base_view(spark):
    rows = [(i, i * 3 % 7, WORDS[i % len(WORDS)]) for i in range(1, 9)]
    spark.createDataFrame(rows, "id int, val int, grp string")\
        .createOrReplaceTempView("diff_base")
    yield "diff_base"
    spark.catalog.dropTempView("diff_base")


class EtlCase:
    """One generated ETL + the view names it creates (skips accounted)."""

    def __init__(self, rng: random.Random):
        self.rng = rng
        self.lines: list[str] = []
        self.created: list[str] = []
        self.skipped_views: list[str] = []
        self.vars_defined = False
        self.templates: list[str] = []
        self.includes: dict[str, str] = {}
        self._build()

    def _build(self) -> None:
        rng = self.rng
        if rng.random() < 0.7:
            self.vars_defined = True
            var_step = [
                "-- target=variables",
                f"select {rng.randint(1, 5)} as va, "
                f"'{rng.choice(WORDS)}' as vb",
                "",
            ]
            if rng.random() < 0.3:
                # route the variables step through -- include= so the
                # full-processor include resolution is compared too
                self.includes["vars.sql"] = "\n".join(var_step)
                self.lines += ["-- include=vars.sql", ""]
            else:
                self.lines += var_step
        if rng.random() < 0.6:
            self.templates.append("wflt")
            self.lines += [
                "-- target=template.wflt",
                "where #{c} >= #{m}",
                "",
            ]
        prev = "diff_base"
        prev_cols = ["id", "val", "grp"]
        n_steps = rng.randint(1, 4)
        for i in range(n_steps):
            name = f"dstep{i}"
            kind = rng.choice(["temp", "temp", "cache", "broadcast"])
            header = f"-- target={kind}.{name}"
            skipped = False
            if rng.random() < 0.25:
                truth = rng.random() < 0.5
                header += f", if=equal(1, {1 if truth else 2})"
                skipped = not truth
            self.lines.append(header)
            self.lines.append(self._select(prev, prev_cols))
            self.lines.append("")
            if not skipped:
                self.created.append(name)
                prev = name
                prev_cols = self._last_cols
        if rng.random() < 0.3:
            self.lines += [
                f"-- target=log.row_count",
                f"select count(1) as cnt from {prev}",
                "",
            ]
        if rng.random() < 0.2:
            self.lines += ["-- target=check.equal(1, 1)", ""]
        if rng.random() < 0.2:
            # named check with an actual/expected body (passing)
            k = rng.randint(1, 9)
            self.lines += [
                "-- target=check.rows_balance",
                f"select {k} as actual, {k} as expected",
                "",
            ]
        if rng.random() < 0.25:
            # __skip_all__ kills every later step in BOTH engines; the
            # trailing step must not be created
            self.lines += [
                "-- target=variables",
                f"select '{rng.choice(['true', '1'])}' as __skip_all__",
                "",
                "-- target=temp.after_skip_all",
                f"select id from {prev}",
                "",
            ]
            self.skipped_views.append("after_skip_all")

    def _select(self, prev: str, cols: list[str]) -> str:
        rng = self.rng
        if "val" in cols and "grp" in cols and rng.random() < 0.3:
            self._last_cols = ["grp", "s", "c"]
            return (
                f"select grp, sum(val) as s, count(1) as c from {prev} "
                "group by grp"
            )
        exprs = []
        out_cols = []
        for c in cols:
            if rng.random() < 0.75:
                exprs.append(c)
                out_cols.append(c)
        if not exprs:
            exprs, out_cols = [cols[0]], [cols[0]]
        if (
            self.vars_defined
            and "val" in cols
            and "comp" not in out_cols
            and rng.random() < 0.5
        ):
            exprs.append("val + ${va} as comp")
            out_cols.append("comp")
        if self.vars_defined and "tag" not in out_cols and rng.random() < 0.3:
            exprs.append("'${vb}' as tag")
            out_cols.append("tag")
        if "grp" in cols and "ugrp" not in out_cols and rng.random() < 0.3:
            exprs.append("upper(grp) as ugrp")
            out_cols.append("ugrp")
        if self.vars_defined and "m" not in out_cols and rng.random() < 0.2:
            # builtin func macro: both engines auto-register Python
            # builtins and pass string args — max('2', va) is a STRING max
            exprs.append("${max(2, ${va})} as m")
            out_cols.append("m")
        sql = f"select {', '.join(exprs)} from {prev}"
        r = rng.random()
        if r < 0.3 and "val" in cols:
            if "wflt" in self.templates:
                sql += f" @{{wflt(c=val, m={rng.randint(0, 4)})}}"
            else:
                sql += f" where val >= {rng.randint(0, 4)}"
        elif r < 0.4 and "id" in cols and self.vars_defined:
            sql += " where id > ${va}"
        self._last_cols = out_cols
        return sql

    @property
    def etl(self) -> str:
        return "\n".join(self.lines)


def _snapshot(spark, views: list[str]) -> dict:
    out = {}
    for v in views:
        df = spark.table(v)
        out[v] = (tuple(df.columns), sorted(map(tuple, df.collect())))
    return out


def _teardown(spark, views: list[str]) -> None:
    for v in views:
        spark.catalog.dropTempView(v)
    spark.catalog.clearCache()


@pytest.mark.parametrize("seed", _depth.seeds(range(4)))
def test_processor_end_to_end_matches_reference(
    spark, ref_processor_cls, base_view, seed
):
    from easy_sql_spark.runtime.processor import SqlProcessor

    rng = random.Random(31_000 + seed)
    for case_no in range(3):
        case = EtlCase(rng)
        etl = case.etl

        ref_proc = ref_processor_cls(spark, etl, includes=dict(case.includes))
        try:
            ref_proc.run(dry_run=False)
        except Exception as ex:  # noqa: BLE001 — generator escape hatch
            pytest.fail(
                f"seed={seed} case={case_no}: REFERENCE run failed "
                f"({type(ex).__name__}: {ex})\netl=\n{etl}"
            )
        ref_views = _snapshot(spark, case.created)
        for v in case.skipped_views:
            assert not spark.catalog.tableExists(v), (
                f"reference created skipped view {v}\netl=\n{etl}"
            )
        _teardown(spark, case.created)

        SqlProcessor(spark, etl, includes=dict(case.includes)).run()
        our_views = _snapshot(spark, case.created)
        for v in case.skipped_views:
            assert not spark.catalog.tableExists(v), (
                f"we created skipped view {v}\netl=\n{etl}"
            )
        _teardown(spark, case.created)

        for v in case.created:
            assert our_views[v][0] == ref_views[v][0], (
                f"seed={seed} case={case_no} view={v}: column mismatch\n"
                f"etl=\n{etl}\nref={ref_views[v][0]}\nours={our_views[v][0]}"
            )
            assert our_views[v][1] == ref_views[v][1], (
                f"seed={seed} case={case_no} view={v}: row mismatch\n"
                f"etl=\n{etl}\nref={ref_views[v][1]}\nours={our_views[v][1]}"
            )


class OutputCase:
    """One generated output-step scenario over a pre-created parquet
    table (the harness creates the table so the reference's
    Hive-format CTAS path — unavailable without Hive support — is never
    taken; insert semantics are what this fuzz compares)."""

    def __init__(self, rng: random.Random, table: str):
        self.rng = rng
        self.table = table
        self.partitioned = rng.random() < 0.7
        self.dynamic = self.partitioned and rng.random() < 0.4
        self.no_partition_var = self.partitioned and (
            not self.dynamic and rng.random() < 0.25
        )
        self.save_mode = rng.choice([None, "overwrite", "append"])
        self.preload = rng.random() < 0.6
        self.permute = rng.random() < 0.4
        self.extra_col = rng.random() < 0.3

    @property
    def ddl(self) -> str:
        if self.partitioned:
            return (
                f"create table {self.table} (id int, val int, dt string) "
                "using parquet partitioned by (dt)"
            )
        return f"create table {self.table} (id int, val int) using parquet"

    def prepare(self, spark) -> None:
        spark.sql(f"drop table if exists {self.table}")
        spark.sql(self.ddl)
        if self.preload:
            if self.partitioned:
                spark.sql(
                    f"insert into {self.table} partition (dt='2026-01-01') "
                    "values (100, 100), (101, 101)"
                )
                spark.sql(
                    f"insert into {self.table} partition (dt='2026-01-02') "
                    "values (200, 200)"
                )
            else:
                spark.sql(f"insert into {self.table} values (100, 100)")

    @property
    def etl(self) -> str:
        var_selects = []
        if self.partitioned and not self.no_partition_var:
            value = "" if self.dynamic else "2026-01-02"
            var_selects.append(f"'{value}' as __partition__dt")
        if self.save_mode:
            var_selects.append(f"'{self.save_mode}' as __save_mode__")
        lines = []
        if var_selects:
            lines += ["-- target=variables",
                      f"select {', '.join(var_selects)}", ""]
        cols = ["id", "val + 1 as val"]
        if self.partitioned and (self.dynamic or self.no_partition_var):
            # dynamic partition: the partition column comes from the data
            cols.append(
                "case when id % 2 = 0 then '2026-01-02' "
                "else '2026-01-03' end as dt"
            )
        if self.permute:
            self.rng.shuffle(cols)
        if self.extra_col:
            cols.insert(self.rng.randrange(len(cols) + 1),
                        "val * 10 as dropped_extra")
        lines += [
            "-- target=temp.out_src",
            f"select {', '.join(cols)} from diff_base where id <= 4",
            "",
            f"-- target=output.{self.table}",
            "select * from out_src",
        ]
        return "\n".join(lines)


@pytest.mark.parametrize("seed", _depth.seeds(range(3)))
def test_output_step_matches_reference(
    spark, ref_processor_cls, base_view, seed
):
    from easy_sql_spark.runtime.processor import SqlProcessor

    spark.sql("create database if not exists diff_out")
    rng = random.Random(64_000 + seed)
    for case_no in range(3):
        table = f"diff_out.tgt_{seed}_{case_no}"
        case = OutputCase(rng, table)
        etl = case.etl

        results = {}
        for engine, run in (
            ("ref", lambda: ref_processor_cls(spark, etl).run(dry_run=False)),
            ("ours", lambda: SqlProcessor(spark, etl).run()),
        ):
            case.prepare(spark)
            try:
                run()
            except Exception as ex:  # noqa: BLE001
                results[engine] = ("raise", type(ex).__name__)
            else:
                df = spark.sql(f"select * from {table}")
                results[engine] = (
                    "ok",
                    tuple(df.columns),
                    sorted(map(tuple, df.collect())),
                )
            spark.catalog.dropTempView("out_src")
        spark.sql(f"drop table if exists {table}")
        assert results["ours"] == results["ref"], (
            f"seed={seed} case={case_no}: output mismatch\n"
            f"scenario: partitioned={case.partitioned} "
            f"dynamic={case.dynamic} no_var={case.no_partition_var} "
            f"mode={case.save_mode} preload={case.preload} "
            f"permute={case.permute} extra={case.extra_col}\n"
            f"etl=\n{etl}\nref={results['ref']!r}\nours={results['ours']!r}"
        )


def test_skipped_step_creates_no_view_in_either_engine(
    spark, ref_processor_cls, base_view
):
    from easy_sql_spark.runtime.processor import SqlProcessor

    etl = (
        "-- target=temp.kept\nselect id from diff_base\n"
        "-- target=temp.dropped, if=equal(1, 2)\nselect val from diff_base\n"
    )
    for runner in (
        lambda: ref_processor_cls(spark, etl).run(dry_run=False),
        lambda: SqlProcessor(spark, etl).run(),
    ):
        runner()
        assert spark.catalog.tableExists("kept")
        assert not spark.catalog.tableExists("dropped")
        _teardown(spark, ["kept"])


class ExtEtlCase:
    """r11 grammar extension (VERDICT r10 ask #4): every remaining step
    type through the FULL processor on both engines — list_variables
    capture (multi-column, row-order-preserving), side-effecting
    ``func.`` steps (repartition/coalesce/unpersist re-create views,
    update_json_local writes a JSON file both engines must produce
    byte-identically), ``action.`` steps (native SQL side effects,
    observable via the views they create/drop), ``-- include=``
    resolution of arbitrary step bodies (not just the variables step),
    plus everything the base grammar already covered.  Exception parity
    cases (a func step whose args must make BOTH engines raise) are
    marked so the runner compares ok-vs-raise and the pre-raise view
    state."""

    def __init__(self, rng: random.Random, json_path: str):
        self.rng = rng
        self.json_path = json_path
        self.lines: list[str] = []
        self.created: list[str] = []
        self.dropped: list[str] = []
        self.skipped_views: list[str] = []
        self.includes: dict[str, str] = {}
        self.expect_raise = False
        self.uses_json = False
        self.vars_defined = False
        self.list_defined = False
        self._build()

    def _emit(self, step_lines: list[str]) -> None:
        """Route a whole step through -- include= with probability 0.2
        (any step body, not just variables — the r11 include surface)."""
        if self.rng.random() < 0.2:
            name = f"inc_{len(self.includes)}.sql"
            self.includes[name] = "\n".join(step_lines + [""])
            self.lines += [f"-- include={name}", ""]
        else:
            self.lines += step_lines + [""]

    def _build(self) -> None:
        rng = self.rng
        if rng.random() < 0.8:
            self.vars_defined = True
            self._emit([
                "-- target=variables",
                f"select {rng.randint(1, 5)} as va, "
                f"'{rng.choice(WORDS)}' as vb",
            ])
        if rng.random() < 0.7:
            self.list_defined = True
            k = rng.randint(2, 6)
            self._emit([
                "-- target=list_variables",
                f"select id as lv1, grp as lv2 from diff_base "
                f"where id <= {k} order by id",
            ])
        prev = "diff_base"
        cached: list[str] = []
        for i in range(rng.randint(1, 3)):
            name = f"estep{i}"
            kind = rng.choice(["temp", "temp", "cache", "broadcast"])
            header = f"-- target={kind}.{name}"
            skipped = False
            if rng.random() < 0.2:
                truth = rng.random() < 0.5
                header += f", if=equal(1, {1 if truth else 2})"
                skipped = not truth
            sel = f"select id, val, grp from {prev}"
            if self.vars_defined and rng.random() < 0.5:
                sel = f"select id, val + ${{va}} as val, grp from {prev}"
            if rng.random() < 0.4:
                sel += f" where id >= {rng.randint(0, 3)}"
            self._emit([header, sel])
            if not skipped:
                self.created.append(name)
                prev = name
                if kind == "cache":
                    cached.append(name)
            else:
                self.skipped_views.append(name)

        # side-effecting func steps over the chain's current head
        if prev != "diff_base" and rng.random() < 0.6:
            f = rng.choice(["repartition", "repartition", "coalesce"])
            self._emit([f"-- target=func.{f}({prev}, {rng.randint(1, 4)})"])
        if cached and rng.random() < 0.5:
            self._emit([f"-- target=func.unpersist({cached[-1]})"])

        # update_json_local: single var + single list var (args are
        # comma-split in BOTH engines, so multi-name strings cannot be
        # passed through a func step — generate the reachable shape)
        if self.vars_defined and self.list_defined and rng.random() < 0.5:
            self.uses_json = True
            attr = rng.choice(["run", "run.stats", "a.b.c"])
            self._emit([
                "-- target=func.update_json_local(${__context__}, va, "
                f"lv1, {attr}, {self.json_path})",
            ])

        # action step: native SQL — create a view (with macro
        # substitution inside) or drop one created earlier
        r = rng.random()
        if r < 0.35:
            body = f"select id, val from {prev}"
            if self.vars_defined and rng.random() < 0.5:
                body = f"select id, val + ${{va}} as val from {prev}"
            self._emit([
                "-- target=action.make_side_view",
                f"create or replace temporary view act_v as {body}",
            ])
            self.created.append("act_v")
        elif r < 0.5 and len(self.created) > 1:
            victim = self.created[0]
            self._emit([
                "-- target=action.drop_one",
                f"drop view if exists {victim}",
            ])
            self.created.remove(victim)
            self.dropped.append(victim)

        if rng.random() < 0.15:
            # exception parity: non-int partitions must raise in BOTH
            self.expect_raise = True
            self._emit([f"-- target=func.repartition({prev}, oops)"])
            self._emit([
                "-- target=temp.after_raise",
                f"select id from {prev}",
            ])
            self.skipped_views.append("after_raise")

    @property
    def etl(self) -> str:
        return "\n".join(self.lines)


def _run_ext_case(spark, ref_processor_cls, case) -> tuple[dict, dict]:
    from easy_sql_spark.runtime.processor import SqlProcessor

    results = {}
    for engine, make in (
        ("ref", lambda etl: ref_processor_cls(
            spark, etl, includes=dict(case.includes))),
        ("ours", lambda etl: SqlProcessor(
            spark, etl, includes=dict(case.includes))),
    ):
        if os.path.exists(case.json_path):
            os.unlink(case.json_path)
        raised = None
        try:
            proc = make(case.etl)
            if engine == "ref":
                proc.run(dry_run=False)
            else:
                proc.run()
        except Exception as ex:  # noqa: BLE001 — parity-compared below
            raised = type(ex).__name__
        views = _snapshot(spark, [v for v in case.created
                                  if spark.catalog.tableExists(v)])
        gone = [v for v in case.created if not spark.catalog.tableExists(v)]
        json_text = None
        if case.uses_json and os.path.exists(case.json_path):
            with open(case.json_path) as fh:
                json_text = fh.read()
        _teardown(spark, [v for v in case.created
                          if spark.catalog.tableExists(v)])
        for v in case.skipped_views + case.dropped:
            assert not spark.catalog.tableExists(v), (
                f"{engine} left skipped/dropped view {v}\netl=\n{case.etl}"
            )
        results[engine] = {
            "raised": raised is not None,
            "views": views,
            "gone": sorted(gone),
            "json": json_text,
        }
    return results["ref"], results["ours"]


_EXT_SEEDS = 16
# Default kept small so the default suite stays under the wall-time
# budget (r11 verdict ask #7: the 512-case campaign alone cost ~13 min).
# The FULL campaign (EASY_SQL_E2E_CASES_PER_SEED=32 -> 512 cases) runs
# once per round at close and is recorded in COVERAGE.md.
_EXT_CASES = int(os.environ.get("EASY_SQL_E2E_CASES_PER_SEED", "4"))


@pytest.mark.parametrize("seed", _depth.seeds(range(_EXT_SEEDS), quick=3))
def test_extended_grammar_end_to_end(
    spark, ref_processor_cls, base_view, seed, tmp_path
):
    for case_no in range(_EXT_CASES):
        rng = random.Random(77_000 + seed * 1000 + case_no)
        case = ExtEtlCase(rng, str(tmp_path / f"uj_{seed}_{case_no}.json"))
        ref, ours = _run_ext_case(spark, ref_processor_cls, case)
        assert ours["raised"] == ref["raised"], (
            f"seed={seed} case={case_no}: raise parity mismatch "
            f"(ref={ref['raised']} ours={ours['raised']}, "
            f"expect_raise={case.expect_raise})\netl=\n{case.etl}"
        )
        if case.expect_raise:
            assert ref["raised"], (
                f"seed={seed} case={case_no}: generator expected a raise "
                f"but the reference succeeded\netl=\n{case.etl}"
            )
        assert ours["gone"] == ref["gone"], (
            f"seed={seed} case={case_no}: dropped-view mismatch\n"
            f"etl=\n{case.etl}\nref={ref['gone']}\nours={ours['gone']}"
        )
        assert ours["views"] == ref["views"], (
            f"seed={seed} case={case_no}: view mismatch\netl=\n{case.etl}\n"
            f"ref={ref['views']}\nours={ours['views']}"
        )
        assert ours["json"] == ref["json"], (
            f"seed={seed} case={case_no}: update_json_local file "
            f"mismatch\netl=\n{case.etl}\nref=\n{ref['json']}\n"
            f"ours=\n{ours['json']}"
        )

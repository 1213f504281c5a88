"""Step-by-step ETL debugger for interactive (Jupyter/REPL) sessions.

Re-expresses the reference's ``SqlProcessorDebugger``
(easy_sql/sql_processor_debugger.py:15-211): load an ETL file, then walk it
one step at a time (``step_on`` / ``step_to``), inspect variables, templates
and temp views between steps, run ad-hoc SQL against the live session, and
``restart`` to reparse from scratch.  Steps run in dry-run mode so output
steps materialize ``*_output`` temp views instead of writing the warehouse
(reference sql_processor_debugger.py:180, step.py:445-466).
"""

from __future__ import annotations

import copy
from typing import Any, Callable

from pyspark.sql import DataFrame, SparkSession

from ..core.step import Step
from .processor import SqlProcessor

__all__ = ["SqlProcessorDebugger"]


class SqlProcessorDebugger:
    def __init__(
        self,
        sql_file_path: str,
        spark: SparkSession,
        vars: dict[str, Any] | None = None,
        funcs: dict[str, Callable] | None = None,
        udfs: dict[str, Callable] | None = None,
        includes: dict[str, str] | None = None,
        base_dir: str = ".",
        dry_run: bool = True,
    ) -> None:
        self.sql_file_path = sql_file_path
        self.spark = spark
        self.base_dir = base_dir
        self.dry_run = dry_run
        self.initial_vars = vars or {}
        self.initial_funcs = funcs or {}
        self.initial_udfs = udfs or {}
        self.initial_includes = includes or {}
        self.sql_processor = self._create_processor()
        self.steps: list[Step] = self.sql_processor.steps
        self._current_step_index = -1
        self.initial_temp_views = self.tempviews

    def _create_processor(self) -> SqlProcessor:
        with open(self.sql_file_path) as f:
            sql = f.read()
        return SqlProcessor(
            self.spark,
            sql,
            variables=copy.deepcopy(self.initial_vars),
            includes=dict(self.initial_includes),
            base_dir=self.base_dir,
            funcs=dict(self.initial_funcs),
            udfs=dict(self.initial_udfs),
        )

    # ------------------------------------------------------------- position
    @property
    def is_started(self) -> bool:
        return self._current_step_index > -1

    @property
    def is_inprogress(self) -> bool:
        return -1 < self._current_step_index < len(self.steps) - 1

    @property
    def is_finished(self) -> bool:
        return self._current_step_index == len(self.steps) - 1

    @property
    def current_step(self) -> Step | None:
        if -1 < self._current_step_index < len(self.steps):
            return self.steps[self._current_step_index]
        return None

    @property
    def current_step_no(self) -> int | None:
        return self._current_step_index + 1 if self.is_started else None

    @property
    def next_step(self) -> Step | None:
        if self._current_step_index < len(self.steps) - 1:
            return self.steps[self._current_step_index + 1]
        return None

    @property
    def next_step_no(self) -> int | None:
        return (
            self._current_step_index + 2
            if self._current_step_index < len(self.steps) - 1
            else None
        )

    @property
    def last_step(self) -> Step | None:
        if self._current_step_index > 0:
            return self.steps[self._current_step_index - 1]
        return None

    @property
    def left_step_count(self) -> int:
        return len(self.steps) - 1 - self._current_step_index

    # ------------------------------------------------------------ state API
    @property
    def vars(self) -> dict[str, Any]:
        return dict(self.sql_processor.vars_context.vars)

    def add_vars(self, vars: dict[str, Any] | None) -> None:
        if not isinstance(vars, dict) or not vars:
            print("Vars must be a non-empty dict. Will do nothing!")
            return
        self.sql_processor.vars_context.add_vars(vars)
        self.initial_vars.update(vars)

    @property
    def templates(self) -> dict[str, str]:
        return dict(self.sql_processor.templates_context.templates)

    @property
    def tempviews(self) -> list[str]:
        return self.sql_processor.backend.temp_tables()

    def set_spark_configs(self, configs: dict[str, str]) -> None:
        for k, v in configs.items():
            self.spark.conf.set(k, v)

    # -------------------------------------------------------------- ad hoc
    def sql(self, sql: str) -> DataFrame:
        return self.sql_processor.backend.exec_sql(sql)

    def native_sql(self, sql: str) -> None:
        self.sql_processor.backend.exec_native_sql(sql)

    def showdf(self, table_name: str) -> None:
        self.sql(f"select * from {table_name}").show()

    # ------------------------------------------------------------- stepping
    def step(self, step_no: int) -> Step | None:
        return self.steps[step_no - 1] if 1 <= step_no <= len(self.steps) else None

    def print_steps(self) -> None:
        for i, s in enumerate(self.steps):
            marker = "->" if i == self._current_step_index else "  "
            name = s.target_type + (f".{s.target_name}" if s.target_name else "")
            print(f"{marker} Step {i + 1}: {name}")

    def step_on(self) -> None:
        if self.next_step is None:
            print("Process already ended! Nothing to run!")
            return
        self.sql_processor.run_step(self.next_step, self.dry_run)
        self._current_step_index += 1

    def step_to(self, step_no: int) -> None:
        if step_no <= 0 or step_no > len(self.steps):
            print(
                f"step_no must be in [1...{len(self.steps)}], got {step_no}. "
                "Will not run anything!"
            )
            return
        if step_no - 1 <= self._current_step_index:
            print(f"We are at step {self._current_step_index + 1} now. Nothing to run!")
            return
        while self._current_step_index < step_no - 1:
            self.step_on()

    def run(self) -> None:
        while self.left_step_count:
            self.step_on()

    def run_to(self, step_no: int) -> None:
        self.step_to(step_no)

    def restart(self) -> None:
        backend = self.sql_processor.backend
        backend.clear_cache()
        backend.clear_temp_tables(exclude=self.initial_temp_views)
        self.sql_processor = self._create_processor()
        self.steps = self.sql_processor.steps
        self._current_step_index = -1

    def report(self) -> None:
        print(self.sql_processor.report.render())

"""Python function library callable via ``${f(...)}`` / ``func.`` / ``if=`` /
``check.`` steps (reference registry: easy_sql/sql_processor/funcs.py:152-214).

``build_registry(processor)`` binds every function to the live processor so
they can reach the backend/vars the way the reference's singletons do
(sql_processor.py:193-222).
"""

from __future__ import annotations

from typing import Callable

from . import funcs_io, funcs_llm, funcs_partition, funcs_quality, funcs_spark


def build_registry(processor) -> dict[str, Callable]:
    registry: dict[str, Callable] = {}
    for mod in (funcs_partition, funcs_spark, funcs_io, funcs_quality, funcs_llm):
        registry.update(mod.build(processor))
    return registry


def library_function_names() -> frozenset[str]:
    """Names the library registers, derivable WITHOUT a live session —
    build() only closes over the processor, nothing executes until a
    function is called (used by the linter's unknown-function rule)."""

    class _Dummy:
        spark = backend = func_runner = vars_context = log = None
        base_dir = "."

        def __init__(self):
            # build() may register end-of-run invariant checks (e.g. the
            # deferred dedup-index flush guard) at registration time
            self.run_end_checks: list[Callable] = []

    return frozenset(build_registry(_Dummy()))

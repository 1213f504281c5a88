"""Step parsing: the ``-- target=`` dialect.

A step file is a sequence of::

    -- target=<type>[.<name>][, if=<func(args)>]
    <sql body ...>

Step types (reference step.py:72-148, 271-371): temp, cache, broadcast,
variables, list_variables, template, func, log, check, output, hive (alias
of output), action.  ``-- include=path.sql`` lines expand recursively before
step splitting (step.py:618-697).
"""

from __future__ import annotations

import os
import re
from dataclasses import dataclass, field

from .sql_text import strip_trailing_semicolon

# exactly "-- target" (one space, case-insensitive): the reference's header
# pattern (step.py:73) treats "--target=..." / "--  target=..." as plain
# comment lines, not step headers — differential-fuzzed parity
TARGET_RE = re.compile(r"^-- target\s*=\s*(\S.*)$", re.IGNORECASE)
INCLUDE_RE = re.compile(r"^--\s*include\s*=\s*(\S+)\s*$")
IF_FUNC_RE = re.compile(r"^(\w+)\((.*)\)$")

STEP_TYPES = {
    "temp",
    "cache",
    "broadcast",
    "variables",
    "list_variables",
    "template",
    "func",
    "log",
    "check",
    "output",
    "hive",
    "action",
}

# step types whose "name" is itself a function call: func.f(a,b) / check.f(x)
_FUNC_NAME_TYPES = {"func", "check"}


class StepParseError(ValueError):
    pass


@dataclass
class StepConfig:
    step_type: str
    name: str | None
    condition: str | None  # "func(args)" text or None
    line_no: int

    @classmethod
    def parse(cls, config_text: str, line_no: int) -> "StepConfig":
        """Parse the text after ``-- target=``.

        Grammar: ``type[.name][, if=func(args)]``.  For func/check steps the
        name may contain dots/parens (it is a function call), so only the
        first dot splits type from name.
        """
        condition = None
        if_m = re.search(r",\s*if\s*=\s*(.+)$", config_text)
        if if_m:
            condition = if_m.group(1).strip()
            config_text = config_text[: if_m.start()]
            if not IF_FUNC_RE.match(condition):
                raise StepParseError(
                    f"line {line_no}: if= condition must be func(args): "
                    f"{condition!r}"
                )
        config_text = config_text.strip()
        if "." in config_text:
            step_type, name = config_text.split(".", 1)
        else:
            step_type, name = config_text, None
        step_type = step_type.strip().lower()
        if step_type not in STEP_TYPES:
            raise StepParseError(
                f"line {line_no}: unknown step type {step_type!r}"
            )
        if step_type == "hive":
            step_type = "output"
        if name is not None:
            name = name.strip()
        if step_type in ("temp", "cache", "broadcast", "template") and not name:
            raise StepParseError(f"line {line_no}: {step_type} step needs a name")
        if step_type == "output" and (not name or "." not in name):
            raise StepParseError(
                f"line {line_no}: output step needs db.table, got {name!r}"
            )
        return cls(step_type, name, condition, line_no)


@dataclass
class Step:
    config: StepConfig
    sql: str  # raw body (before macro expansion)
    id: int = 0
    meta: dict = field(default_factory=dict)

    @property
    def target_type(self) -> str:
        return self.config.step_type

    @property
    def target_name(self) -> str | None:
        return self.config.name

    def preprocess_sql(self, templates_context, vars_context) -> str:
        """Templates first, then variables (reference step.py:289-292)."""
        sql = templates_context.replace_templates(self.sql)
        sql = vars_context.replace_variables(sql)
        return strip_trailing_semicolon(sql).strip()


class IncludeResolver:
    """Resolve ``-- include=path`` bodies: explicit dict, then filesystem."""

    def __init__(
        self,
        includes: dict[str, str] | None = None,
        base_dir: str = ".",
    ) -> None:
        self.includes = includes or {}
        self.base_dir = base_dir

    def read(self, path: str) -> str:
        if path in self.includes:
            return self.includes[path]
        full = path if os.path.isabs(path) else os.path.join(self.base_dir, path)
        with open(full, encoding="utf-8") as f:
            return f.read()


def expand_includes(
    sql: str,
    resolver: IncludeResolver,
    skip_duplicate_include: bool = False,
    _seen: set[str] | None = None,
) -> str:
    seen = _seen if _seen is not None else set()
    out_lines = []
    for line in sql.split("\n"):
        m = INCLUDE_RE.match(line.strip())
        if not m:
            out_lines.append(line)
            continue
        path = m.group(1)
        if skip_duplicate_include and path in seen:
            continue
        seen.add(path)
        body = resolver.read(path)
        out_lines.append(
            expand_includes(body, resolver, skip_duplicate_include, seen)
        )
    return "\n".join(out_lines)


def parse_steps(
    sql: str,
    resolver: IncludeResolver | None = None,
    skip_duplicate_include: bool = False,
) -> list[Step]:
    """Split an annotated SQL text into ordered steps.

    Lines before the first ``-- target=`` are ignored (config headers are
    handled by :mod:`easy_sql_spark.core.config`).
    """
    if resolver is not None:
        sql = expand_includes(sql, resolver, skip_duplicate_include)
    steps: list[Step] = []
    current: Step | None = None
    body: list[str] = []
    for idx, line in enumerate(sql.split("\n"), start=1):
        m = TARGET_RE.match(line.strip())
        if m:
            if current is not None:
                current.sql = "\n".join(body).strip()
                steps.append(current)
            config = StepConfig.parse(m.group(1), idx)
            current = Step(config=config, sql="", id=len(steps) + 1)
            body = []
        elif current is not None:
            body.append(line)
    if current is not None:
        current.sql = "\n".join(body).strip()
        steps.append(current)
    return steps

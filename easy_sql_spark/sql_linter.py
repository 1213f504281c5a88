"""ETL-file linter — the reference's sql_linter re-expressed Spark-first.

The reference (easy_sql/sql_linter/sql_linter.py:21-160,
sql_linter_cli.py:31-120) lints each step's SQL body through sqlfluff with
a per-backend dialect, skips template steps, supports include/exclude rule
lists, and writes a fixed file (``<name>.fixed.sql`` or in-place).

sqlfluff is not a dependency here; the Spark-native equivalent of "is this
valid dialect SQL" is SPARK'S OWN PARSER: when a SparkSession is available
each non-template step body (with ``${var}``/``@{tmpl}``/``#{p}`` macros
neutralized the way the reference's custom lexer tokens do) is run through
``sessionState().sqlParser().parsePlan`` — syntax-checked by the exact
engine that will execute it, with zero execution.  On top of that sit
step-language structural rules the reference delegates to its step parser.

Rules (include/exclude by id):

==========  =======  ====================================================
id          level    meaning
==========  =======  ====================================================
ESQL01      warning  no ``-- backend:`` header (spark assumed)
ESQL02      error    unsupported backend
ESQL03      error    step header fails to parse
ESQL04      warning  duplicate temp/cache/broadcast view name
ESQL05      warning  step body rejected by Spark's SQL parser
ESQL06      warning  ``check.<name>`` body lacks actual/expected aliases
ESQL07      error    ``@{template}`` used before any definition
ESQL08      info     trailing semicolon in a step body (auto-fixed)
ESQL09      info     func-step function not in the default registry
ESQL10      warning  temp/cache/broadcast view never referenced afterwards
==========  =======  ====================================================
"""

from __future__ import annotations

import re
from dataclasses import dataclass

from .core.context import FuncRunner, TEMPLATE_PATTERN, VAR_PATTERN
from .core.step import Step, StepParseError, parse_steps

SUPPORTED_BACKENDS = ("spark",)  # reference lists 5; this engine is Spark

#: rules fix() actually rewrites (missing backend header, trailing semicolon)
FIXABLE_RULES = frozenset({"ESQL01", "ESQL08"})
_BACKEND_RE = re.compile(r"^--\s*backend:\s*(.*)$")
_CHECK_ALIAS_RE = re.compile(r"\b(?:as\s+)?(actual|expected)\b", re.IGNORECASE)
_FUNC_STEP_RE = re.compile(r"^(\w+)\(")


@dataclass
class LintIssue:
    rule: str
    level: str  # error | warning | info
    line_no: int
    message: str

    def render(self) -> str:
        return f"L{self.line_no:<4} {self.rule} {self.level}: {self.message}"


class SqlLinter:
    """Lint + fix an easy-sql ETL text (reference sql_linter.py:21-160)."""

    def __init__(
        self,
        sql: str,
        include_rules: list[str] | None = None,
        exclude_rules: list[str] | None = None,
    ) -> None:
        self.origin_sql = sql
        self.include_rules = include_rules
        self.exclude_rules = exclude_rules
        self.issues: list[LintIssue] = []

    # -- reporting ---------------------------------------------------------
    def _enabled(self, rule: str) -> bool:
        if self.include_rules:
            return rule in self.include_rules
        if self.exclude_rules:
            return rule not in self.exclude_rules
        return True

    def _report(self, rule: str, level: str, line_no: int, message: str) -> None:
        if self._enabled(rule):
            self.issues.append(LintIssue(rule, level, line_no, message))

    # -- linting -----------------------------------------------------------
    def parse_backend(self) -> str:
        for line in self.origin_sql.split("\n"):
            m = _BACKEND_RE.match(line.strip())
            if m:
                return m.group(1).strip()
        return ""

    def lint(self, backend: str | None = None, spark=None) -> list[LintIssue]:
        """Return the issue list.  ``spark`` enables ESQL05 parser checks;
        without it the lint is purely structural (reference requires
        sqlfluff the same way)."""
        self.issues = []
        declared = self.parse_backend()
        backend = backend or declared or "spark"
        if not declared:
            self._report(
                "ESQL01", "warning", 1,
                "backend cannot be found in sql, will use default backend spark",
            )
        if backend not in SUPPORTED_BACKENDS:
            self._report(
                "ESQL02", "error", 1,
                f"unsupported backend `{backend}`, supported: "
                + ",".join(SUPPORTED_BACKENDS),
            )
        try:
            steps = parse_steps(self.origin_sql)
        except StepParseError as e:
            self._report("ESQL03", "error", _line_of(e), str(e))
            return self.issues

        seen_views: set[str] = set()
        seen_templates: set[str] = set()
        default_funcs = FuncRunner()
        from .functions import library_function_names

        known = library_function_names() | {"execute_streaming_inserts"}
        for step in steps:
            t, name, line_no = (
                step.target_type, step.config.name, step.config.line_no,
            )
            if t in ("temp", "cache", "broadcast"):
                key = (name or "").lower()
                if key in seen_views:
                    self._report(
                        "ESQL04", "warning", line_no,
                        f"duplicate {t} view name `{name}` "
                        f"(the later step silently replaces the earlier)",
                    )
                seen_views.add(key)
            if t == "template":
                seen_templates.add((name or "").lower())
                continue  # reference: "Skip template sql for this step."
            for m in TEMPLATE_PATTERN.finditer(step.sql):
                if m.group(1).lower() not in seen_templates:
                    self._report(
                        "ESQL07", "error", line_no,
                        f"template `@{{{m.group(1)}}}` used before definition",
                    )
            if t == "check" and name and not _FUNC_STEP_RE.match(name):
                body = step.sql.lower()
                if "actual" not in body or "expected" not in body:
                    self._report(
                        "ESQL06", "warning", line_no,
                        "check step body should produce `actual` and "
                        "`expected` columns (reference step.py:512-536)",
                    )
            if t in ("func",) or (t == "check" and name and _FUNC_STEP_RE.match(name)):
                fm = _FUNC_STEP_RE.match(name or "")
                if fm and not default_funcs.has(fm.group(1)) and fm.group(
                    1
                ) not in known:
                    self._report(
                        "ESQL09", "info", line_no,
                        f"function `{fm.group(1)}` is not in the default "
                        f"registry (fine if registered via funcs/pyfile)",
                    )
            if step.sql.rstrip().endswith(";"):
                self._report(
                    "ESQL08", "info", line_no,
                    "trailing semicolon is stripped at run time (auto-fixed)",
                )
            if spark is not None and step.sql.strip() and t not in (
                "func", "action",
            ):
                err = _spark_parse_error(spark, _neutralize_macros(step.sql))
                if err:
                    self._report(
                        "ESQL05", "warning", line_no,
                        f"Spark cannot parse step body: {err}",
                    )

        # ESQL10: a registered view nothing later reads is either dead
        # weight or a typo'd reference elsewhere.  Heuristic word-boundary
        # search over later step bodies AND later target names (func-step
        # args live in the target), so dynamic `${var}` references can
        # only ever produce a warning, never an error.
        for i, step in enumerate(steps):
            if step.target_type not in ("temp", "cache", "broadcast"):
                continue
            if i == len(steps) - 1:
                continue  # the final view IS the ETL's result (dry-run use)
            name = step.config.name or ""
            if not name:
                continue
            pat = re.compile(rf"\b{re.escape(name)}\b", re.IGNORECASE)
            used = any(
                pat.search(later.sql) or pat.search(later.config.name or "")
                for later in steps[i + 1 :]
            )
            if not used:
                self._report(
                    "ESQL10", "warning", step.config.line_no,
                    f"{step.target_type} view `{name}` is never referenced "
                    f"by any later step",
                )
        return self.issues

    # -- fixing ------------------------------------------------------------
    def fix(self, backend: str | None = None) -> str:
        """Fixed ETL text: backend header ensured first, trailing
        semicolons stripped from step bodies (the reference fixer rewrites
        via sqlfluff; these are the step-language-level fixes)."""
        backend = backend or self.parse_backend() or "spark"
        lines = self.origin_sql.split("\n")
        out: list[str] = []
        if not self.parse_backend():
            out.append(f"-- backend: {backend}")
        for line in lines:
            stripped = line.rstrip()
            if stripped.endswith(";") and not stripped.lstrip().startswith("--"):
                line = stripped.rstrip(";")
            out.append(line)
        return "\n".join(out)


def _line_of(e: Exception) -> int:
    m = re.search(r"line (\d+)", str(e))
    return int(m.group(1)) if m else 1


def _neutralize_macros(sql: str) -> str:
    """Replace ``${...}``/``@{...}``/``#{...}`` with a parsable identifier —
    the analog of the reference's custom sqlfluff lexer tokens
    (sql_linter.py:139-160), which make macro syntax lexable."""
    sql = VAR_PATTERN.sub("__var__", sql)
    sql = TEMPLATE_PATTERN.sub("__var__", sql)
    sql = re.sub(r"#\{[^}]*\}", "__var__", sql)
    return sql


def _spark_parse_error(spark, sql: str) -> str | None:
    """Syntax-check through Spark's own parser — no analysis, no execution."""
    from .core.sql_text import strip_trailing_semicolon

    try:
        spark._jsparkSession.sessionState().sqlParser().parsePlan(
            strip_trailing_semicolon(sql).strip()
        )
        return None
    except Exception as e:  # py4j wraps ParseException
        first = next(
            (ln for ln in str(e).split("\n") if ln.strip()), e.__class__.__name__
        )
        return first.strip()[:200]


def main(argv: list[str] | None = None) -> int:
    """CLI: ``python -m easy_sql_spark.sql_linter {lint,fix} --path f.sql``
    (reference sql_linter_cli.py surface: --include/--exclude/--backend/
    --inplace)."""
    import argparse

    ap = argparse.ArgumentParser(prog="easy_sql_spark.sql_linter")
    sub = ap.add_subparsers(dest="cmd", required=True)
    for cmd in ("lint", "fix"):
        p = sub.add_parser(cmd)
        p.add_argument("--path", required=True)
        p.add_argument("--include", default="")
        p.add_argument("--exclude", default="")
        p.add_argument("--backend", default=None)
        p.add_argument(
            "--spark", action="store_true",
            help="also syntax-check bodies through a local SparkSession",
        )
        p.add_argument(
            "--report", choices=("text", "json"), default="text",
            help="json emits one machine-readable document for CI gating",
        )
        if cmd == "fix":
            p.add_argument("--inplace", action="store_true")
    args = ap.parse_args(argv)

    if not args.path.endswith(".sql"):
        print(f"warning: file name {args.path} should end with .sql")
    with open(args.path, encoding="utf-8") as f:
        sql = f.read()
    linter = SqlLinter(
        sql,
        include_rules=args.include.split(",") if args.include else None,
        exclude_rules=args.exclude.split(",") if args.exclude else None,
    )
    spark = None
    if getattr(args, "spark", False):
        from .session import build_session

        spark = build_session("sql_linter")
    issues = linter.lint(backend=args.backend, spark=spark)
    as_json = args.report == "json"
    if not as_json:
        for issue in issues:
            print(issue.render())
    target = None
    if args.cmd == "fix":
        fixed = linter.fix(backend=args.backend)
        target = args.path if args.inplace else args.path.replace(
            ".sql", ".fixed.sql"
        )
        with open(target, "w", encoding="utf-8") as f:
            f.write(fixed)
        if not as_json:
            print(f"wrote {target}")
    exit_code = 1 if any(i.level == "error" for i in issues) else 0
    if as_json:
        import json

        counts: dict[str, int] = {}
        for i in issues:
            counts[i.level] = counts.get(i.level, 0) + 1
        print(
            json.dumps(
                {
                    "path": args.path,
                    "issues": [
                        {
                            "rule": i.rule,
                            "level": i.level,
                            "line": i.line_no,
                            "message": i.message,
                            "fixable": i.rule in FIXABLE_RULES,
                            "fixed": args.cmd == "fix"
                            and i.rule in FIXABLE_RULES,
                        }
                        for i in issues
                    ],
                    "counts": counts,
                    "fixed_path": target,
                    "exit": exit_code,
                }
            )
        )
    return exit_code


if __name__ == "__main__":
    import sys

    sys.exit(main())

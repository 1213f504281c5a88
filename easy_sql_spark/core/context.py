"""Variable and template contexts — the text macro system.

Semantics replicated from the reference (easy_sql/sql_processor/context.py):

- ``${name}``: case-insensitive variable reference; values may themselves
  contain ``${...}`` and are re-resolved to a fixpoint (context.py:109-111).
- ``${name:default}``: default when the variable is undefined.
- ``${func(a, ${b})}``: run a registered Python function, splice str(result);
  inner variable references resolve first (context.py:74-97).
- ``@{tmpl}`` / ``@{tmpl(p1=v1, p2=${v})}``: template expansion with ``#{p}``
  placeholders; templates cannot nest; variables written inside a template
  body resolve at the use site (templates run before variables,
  step.py:289-292).
- Comments are shielded from all substitution (utils/sql_expr.py).

Everything here is driver-side text processing — by design: the output is a
single SQL string handed to ``spark.sql`` so Catalyst sees a plain query.
"""

from __future__ import annotations

import re
from typing import Any, Callable

from .sql_text import substitute_outside_comments

VAR_PATTERN = re.compile(r"\$\{([^${}]+)\}")
FUNC_CALL_PATTERN = re.compile(r"^(\w+)\((.*)\)$", re.DOTALL)
# the reference's whole-text fast path (context.py:55-68): a text that IS a
# single plain variable reference returns the variable's value directly,
# stripped of surrounding whitespace — differential-fuzzed parity
WHOLE_TEXT_VAR_PATTERN = re.compile(r"\$\{\s*(\w+)\s*\}")
# template args may contain ${var} references (templates expand BEFORE
# variables, step.py:289-292), so the arg body admits balanced ${...} chunks.
# Spaces are legal around the name and after the arg list but NOT between
# name and "(" — the reference's with-arg pattern requires them adjacent
# (context.py:144-145, differential-fuzzed parity)
TEMPLATE_PATTERN = re.compile(
    r"@\{\s*(\w+)(?:\(((?:[^{}()]|\$\{[^}]*\})*)\))?\s*\}"
)
TEMPLATE_PARAM_PATTERN = re.compile(r"#\{(\w+)\}")

MAX_RESOLVE_PASSES = 16


class VarsContext:
    """Scalar + list variables with case-insensitive names."""

    def __init__(
        self,
        vars: dict[str, Any] | None = None,
        list_vars: dict[str, list] | None = None,
    ) -> None:
        self.vars: dict[str, Any] = {}
        self.list_vars: dict[str, list] = {}
        # object-valued variables usable ONLY as whole function args:
        # ``${__step__}`` / ``${__config__}`` resolve to the live Step /
        # EtlConfig objects (reference funcs_flink.py:68,89 take them), while
        # the same names still stringify inside SQL text via self.vars
        self.obj_vars: dict[str, Any] = {}
        if vars:
            self.add_vars(vars)
        if list_vars:
            self.add_list_vars(list_vars)
        self.func_runner: "FuncRunner | None" = None  # set by processor

    # -- mutation ---------------------------------------------------------
    def add_vars(self, vars: dict[str, Any]) -> None:
        for k, v in vars.items():
            self.vars[k.lower()] = v

    def add_list_vars(self, list_vars: dict[str, list]) -> None:
        for k, v in list_vars.items():
            self.list_vars[k.lower()] = v

    def set_var(self, name: str, value: Any) -> None:
        self.vars[name.lower()] = value

    # -- lookup -----------------------------------------------------------
    def has_var(self, name: str) -> bool:
        return name.lower() in self.vars

    def get_var(self, name: str, default: Any = None) -> Any:
        return self.vars.get(name.lower(), default)

    def is_truthy(self, name: str) -> bool:
        v = self.vars.get(name.lower())
        return v not in (None, "", "0", "false", "False", 0, False)

    # -- substitution -----------------------------------------------------
    def replace_variables(self, text: str) -> str:
        """Resolve ``${...}`` references to a fixpoint, comments shielded.

        Whole-text fast path (reference context.py:55-68, verified by the
        differential fuzzer): a text that is exactly ONE plain variable
        reference — optionally surrounded by whitespace — resolves to the
        variable's rendered value with the surrounding whitespace dropped
        (the reference returns the raw object there; every caller of ours
        consumes strings, so the rendered form is the parity surface).
        The reference's fast path also fires for ``${name:default}`` and
        ``${func(...)}`` whole-texts but crashes on the former and yields
        ``None`` for the latter (context.py:58-62 slices the already-
        truncated name; funcs are never dispatched) — those fall through
        to the general path here instead of replicating the crash."""
        depth = 0
        m = WHOLE_TEXT_VAR_PATTERN.fullmatch(text.strip())
        while m and self.has_var(m.group(1)) and depth < MAX_RESOLVE_PASSES:
            rendered = self._render(self.get_var(m.group(1)))
            if "${" not in rendered:
                return rendered
            text = rendered
            depth += 1
            m = WHOLE_TEXT_VAR_PATTERN.fullmatch(text.strip())
        return substitute_outside_comments(text, self._resolve_to_fixpoint)

    def _resolve_to_fixpoint(self, text: str) -> str:
        for _ in range(MAX_RESOLVE_PASSES):
            new = VAR_PATTERN.sub(self._resolve_one, text)
            if new == text:
                return new
            text = new
        return text

    def _resolve_one(self, m: re.Match) -> str:
        inner = m.group(1).strip()
        func_m = FUNC_CALL_PATTERN.match(inner)
        if func_m and self.func_runner is not None:
            result = self.func_runner.run_func_call(
                func_m.group(1), func_m.group(2), self
            )
            return "" if result is None else str(result)
        if ":" in inner:
            name, default = inner.split(":", 1)
            name = name.strip()
            if self.has_var(name):
                return self._render(self.get_var(name))
            return default
        if self.has_var(inner):
            return self._render(self.get_var(inner))
        raise KeyError(f"undefined variable: ${{{inner}}}")

    @staticmethod
    def _render(value: Any) -> str:
        """Variables render as bare strings (the reference stringifies all
        variable values at substitution time, step.py:313-317)."""
        if value is None:
            return "null"
        if isinstance(value, bool):
            return str(value).lower()
        return str(value)


class TemplatesContext:
    """Named SQL fragments with ``#{param}`` placeholders.

    Reference-parity points, each pinned by the differential fuzzer
    (tests/test_reference_differential.py) against the reference's
    TemplatesContext (context.py:133-205):

    - template NAMES are lowercased at definition time but looked up
      verbatim at the use site — ``@{T}`` over a template defined as
      ``T`` (stored ``t``) is an error, while ``@{t}`` resolves;
    - ``#{param}`` substitution is case-insensitive on both sides;
      parameters the call does not provide stay literal in the output;
    - bodies are stripped, and a body whose LAST line carries a comment
      gets a trailing newline so the splice cannot comment out the text
      that follows the use site (context.py:158-161);
    - template bodies may reference other templates: the reference
      re-scans after every splice until no reference remains — we
      expand to a fixpoint with a pass cap, so a CYCLE raises loudly
      where the reference would loop forever;
    - comments are re-shielded between passes: a ``@{...}`` inside a
      comment line that an earlier expansion spliced in stays literal.
    """

    def __init__(self) -> None:
        self.templates: dict[str, str] = {}

    def add_template(self, name: str, body: str) -> None:
        self.templates[name.lower()] = body

    def replace_templates(self, text: str) -> str:
        for _ in range(MAX_RESOLVE_PASSES):
            new = substitute_outside_comments(text, self._expand_all)
            if new == text:
                return new
            text = new
        raise ValueError(
            "template expansion did not converge in "
            f"{MAX_RESOLVE_PASSES} passes (cyclic template reference?)"
        )

    def _expand_all(self, text: str) -> str:
        return TEMPLATE_PATTERN.sub(self._expand_one, text)

    def _expand_one(self, m: re.Match) -> str:
        name, arg_text = m.group(1), m.group(2)
        if name not in self.templates:
            raise KeyError(f"undefined template: @{{{name}}}")
        body = self.templates[name].strip()
        from .sql_text import _scan_comment_spans

        last_line = body.rsplit("\n", 1)[-1]
        if _scan_comment_spans(last_line):
            body += "\n"
        params: dict[str, str] = {}
        if arg_text:
            for part in arg_text.split(","):
                if "=" not in part:
                    raise ValueError(
                        f"template argument must be k=v: {part!r} in @{{{name}}}"
                    )
                k, v = part.split("=", 1)
                params[k.strip().lower()] = v.strip()
        return TEMPLATE_PARAM_PATTERN.sub(
            lambda pm: params.get(pm.group(1).lower(), pm.group(0)), body
        )


class FuncRunner:
    """Registry + invoker for Python functions callable from SQL text.

    Reference parity (funcs.py:12-52, 216-247): ``builtins`` and ``operator``
    modules auto-registered, plus comparison helpers; arguments are
    comma-split strings with variables substituted; no nested parens/commas
    in literals.
    """

    def __init__(self, funcs: dict[str, Callable] | None = None) -> None:
        import builtins
        import operator as op_mod

        self.funcs: dict[str, Callable] = {}
        for mod in (builtins, op_mod):
            for fname in dir(mod):
                fn = getattr(mod, fname)
                if callable(fn) and not fname.startswith("_"):
                    self.funcs[fname] = fn
        self.funcs.update(
            {
                "equal": lambda a, b: a == b,
                "equal_ignore_case": lambda a, b: str(a).lower() == str(b).lower(),
                "is_greater_or_equal": lambda a, b: float(a) >= float(b),
            }
        )
        if funcs:
            self.funcs.update(funcs)

    def register(self, name: str, fn: Callable) -> None:
        self.funcs[name] = fn

    def register_all(self, funcs: dict[str, Callable]) -> None:
        self.funcs.update(funcs)

    def has(self, name: str) -> bool:
        return name in self.funcs

    _OBJ_ARG_RE = re.compile(r"^\$\{(\w+)\}$")

    def split_args(self, arg_text: str, vars_context: VarsContext) -> list[Any]:
        if arg_text.strip() == "":
            return []
        out: list[Any] = []
        for a in arg_text.split(","):
            a = a.strip()
            obj_m = self._OBJ_ARG_RE.match(a)
            if obj_m and obj_m.group(1).lower() in vars_context.obj_vars:
                out.append(vars_context.obj_vars[obj_m.group(1).lower()])
                continue
            out.append(vars_context._resolve_to_fixpoint(a))
        return out

    def run_func_call(
        self, name: str, arg_text: str, vars_context: VarsContext
    ) -> Any:
        if name not in self.funcs:
            raise KeyError(f"unregistered function: {name}")
        args = self.split_args(arg_text, vars_context)
        # NOTE list variables are deliberately NOT auto-expanded here:
        # the reference passes generic func args as plain strings
        # (funcs.py:234-247, probed: ${len(ml)} is len("ml") even when
        # ml is a list var) — funcs that consume list variables look
        # them up from the processor context by name, exactly like the
        # reference's update_json_local (funcs_spark.py:117-120)
        return self.funcs[name](*args)

"""Campaign-depth tiers for the randomized test campaigns (VERDICT r14
"Next round" #1).

The driver's verify gate runs ``python -m pytest tests/ -x -q`` under a
wall budget the full randomized campaigns outgrew (~715 tests, ~38 min
quiet / ~48 min contended; VERIFY_r14's run truncated at ~70% with zero
failures).  Two tiers:

- **default** (no env): every test module stays selected, but the
  randomized CAMPAIGNS — hypothesis-driven differential fuzzes, seeded
  model fuzzes, hot-session stress repeats — run at reduced depth
  (fewer examples / fewer seeds / fewer repeats).  Deterministic tests,
  the full-registry oracle gate (test_oracle_all), and the plan-shape
  gates are NEVER scaled.
- **full** (``EASY_SQL_TEST_DEPTH=full``): the historical full campaign
  depth.  The builder runs this tier at least once per round and
  records the result in OPTIMIZATION_r{N}.md / COVERAGE.md.

Scaling depth, not deselecting: every campaign still exercises every
generator/shape each driver run, so a regression in any covered surface
still fails the default tier — it just gets fewer random draws per run.
"""

from __future__ import annotations

import os

FULL = os.environ.get("EASY_SQL_TEST_DEPTH", "").lower() in (
    "full",
    "campaign",
    "1",
)


def examples(full_n: int, quick_n: int | None = None) -> int:
    """Hypothesis ``max_examples`` for a campaign test: the historical
    count at full depth, ~1/8 (floor 2) at default depth."""
    if FULL:
        return full_n
    return quick_n if quick_n is not None else max(2, full_n // 8)


def seeds(all_seeds, quick: int = 1) -> list:
    """Seed list for a parametrized campaign: all seeds at full depth,
    the first ``quick`` at default depth (seed identity is stable, so
    the default tier replays the same deterministic case every run)."""
    s = list(all_seeds)
    return s if FULL else s[:quick]


def repeats(full_n: int, quick_n: int) -> int:
    """Repeat count for stress loops."""
    return full_n if FULL else quick_n

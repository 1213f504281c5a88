"""Per-step execution report (reference sql_processor/report.py:9-169)."""

from __future__ import annotations

import time
from dataclasses import dataclass, field
from enum import Enum


class StepStatus(str, Enum):
    NOT_STARTED = "NOT_STARTED"
    SKIPPED = "SKIPPED"
    RUNNING = "RUNNING"
    FAILED = "FAILED"
    SUCCEEDED = "SUCCEEDED"


@dataclass
class StepReport:
    step_id: int
    target: str
    status: StepStatus = StepStatus.NOT_STARTED
    messages: list[str] = field(default_factory=list)
    started_at: float | None = None
    finished_at: float | None = None

    def start(self) -> None:
        self.status = StepStatus.RUNNING
        self.started_at = time.time()

    def finish(self, status: StepStatus, message: str | None = None) -> None:
        self.status = status
        self.finished_at = time.time()
        if message:
            self.messages.append(message)

    def add_message(self, message: str) -> None:
        self.messages.append(message)

    @property
    def elapsed(self) -> float:
        if self.started_at is None:
            return 0.0
        return (self.finished_at or time.time()) - self.started_at


@dataclass
class RunReport:
    steps: list[StepReport] = field(default_factory=list)

    def new_step(self, step_id: int, target: str) -> StepReport:
        r = StepReport(step_id=step_id, target=target)
        self.steps.append(r)
        return r

    def render(self) -> str:
        lines = ["=== ETL run report ==="]
        for r in self.steps:
            lines.append(
                f"step {r.step_id:>3} {r.target:<40} {r.status.value:<10} "
                f"{r.elapsed:6.2f}s"
            )
            for m in r.messages:
                lines.append(f"       | {m}")
        n_failed = sum(1 for r in self.steps if r.status == StepStatus.FAILED)
        lines.append(
            f"total {len(self.steps)} steps, {n_failed} failed"
        )
        return "\n".join(lines)

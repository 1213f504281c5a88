"""Per-step execution report and pluggable report sinks (reference
sql_processor/report.py:9-169; sink fan-out :87-143)."""

from __future__ import annotations

import json
import os
import subprocess
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

    @property
    def app_status(self) -> StepStatus:
        """Overall status (reference report.py:155-166): FAILED if any step
        failed, RUNNING if any is unfinished, else SUCCEEDED."""
        if not self.steps:
            return StepStatus.NOT_STARTED
        statuses = {r.status for r in self.steps}
        if StepStatus.FAILED in statuses:
            return StepStatus.FAILED
        if statuses & {StepStatus.RUNNING, StepStatus.NOT_STARTED}:
            return StepStatus.RUNNING
        return StepStatus.SUCCEEDED

    def as_document(self, task_id: str) -> dict:
        """The structured document shape the ES sink indexes (reference
        easy_sql/report.py Reporter.report_task_result document)."""
        return {
            "task_id": task_id,
            "status": self.app_status.value,
            "report": self.render(),
            "steps": [
                {
                    "step_id": r.step_id,
                    "target": r.target,
                    "status": r.status.value,
                    "execution_time": r.elapsed,
                    "messages": list(r.messages),
                }
                for r in self.steps
            ],
            "timestamp": time.strftime("%Y-%m-%dT%H:%M:%S"),
        }


# ------------------------------------------------------------------- sinks
class ReportSink:
    """Where a finished run report goes (reference print_report fan-out,
    report.py:87-93: stdout + optional HDFS path + optional ES index)."""

    def write(self, task_id: str, report: RunReport) -> None:  # pragma: no cover
        raise NotImplementedError


class FileReportSink(ReportSink):
    """Local (or any mounted-filesystem) file, one report per task id."""

    def __init__(self, directory: str) -> None:
        self.directory = directory

    def write(self, task_id: str, report: RunReport) -> None:
        os.makedirs(self.directory, exist_ok=True)
        path = os.path.join(self.directory, f"{task_id}.txt")
        with open(path, "w", encoding="utf-8") as f:
            f.write(report.render())
        json_path = os.path.join(self.directory, f"{task_id}.json")
        with open(json_path, "w", encoding="utf-8") as f:
            json.dump(report.as_document(task_id), f, indent=2)


class HdfsReportSink(ReportSink):
    """Stage locally, then ``hdfs dfs -put`` (reference report.py:107-143).
    Requires a hadoop client on PATH — construction is cheap, failures
    surface at write time."""

    def __init__(self, hdfs_path: str) -> None:
        self.hdfs_path = hdfs_path

    def write(self, task_id: str, report: RunReport) -> None:
        import hashlib
        import tempfile

        file_name = os.path.basename(self.hdfs_path)
        folder = hashlib.md5(file_name.encode("utf8")).hexdigest()[:2]
        local_dir = os.path.join(
            tempfile.gettempdir(), "sql_processor_reports", folder
        )
        os.makedirs(local_dir, exist_ok=True)
        local_file = os.path.join(local_dir, file_name)
        with open(local_file, "w", encoding="utf-8") as f:
            f.write(report.render())
        subprocess.run(
            ["bash", "-c", f"hdfs dfs -rm {self.hdfs_path} || exit 0"],
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
        )
        result = subprocess.run(
            [
                "bash",
                "-c",
                f"hdfs dfs -mkdir -p {os.path.dirname(self.hdfs_path)} && "
                f"hdfs dfs -put {local_file} {self.hdfs_path}",
            ],
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
        )
        if result.returncode != 0:
            raise RuntimeError(
                f"upload report {local_file} to hdfs failed "
                f"(code {result.returncode}): "
                f"{result.stdout.decode(errors='replace')[-500:]}"
            )


class EsReportSink(ReportSink):
    """POST the report document to an Elasticsearch index
    ``{prefix}-{yyyy.MM.dd}`` (reference easy_sql/report.py EsService).
    Uses stdlib urllib — no ES client dependency."""

    def __init__(self, es_url: str, index_prefix: str) -> None:
        self.es_url = es_url.rstrip("/")
        self.index_prefix = index_prefix

    def write(self, task_id: str, report: RunReport) -> None:
        import urllib.request

        index = f"{self.index_prefix}-{time.strftime('%Y.%m.%d')}"
        url = f"{self.es_url}/{index}/_doc/{task_id}"
        body = json.dumps(report.as_document(task_id)).encode("utf-8")
        req = urllib.request.Request(
            url,
            data=body,
            headers={"Content-Type": "application/json"},
            method="PUT",
        )
        with urllib.request.urlopen(req, timeout=30) as resp:
            if resp.status not in (200, 201):
                raise RuntimeError(
                    f"ES report index failed: HTTP {resp.status}"
                )

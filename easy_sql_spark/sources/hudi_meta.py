"""Apache Hudi copy-on-write table READER — no hudi-spark bundle.

The reference's own versioned-table story IS Hudi (its Flink samples
upsert into Hudi tables — reference test/sample_etl.flink.hudi-agg.sql,
backend/flink.py); this module closes the loop by reading Hudi COW
tables directly from their open layout: a ``.hoodie/`` timeline of
instant files plus base parquet files named
``{fileId}_{writeToken}_{instantTime}.parquet``.

Snapshot semantics implemented exactly as Hudi's COW reader:

- completed instants = ``<t>.commit`` / ``<t>.replacecommit`` timeline
  entries (inflight/requested instants and their data files are
  invisible);
- each (partition, fileId) FILE GROUP contributes its newest committed
  base file (file slice) at or below the target instant;
- ``replacecommit`` metadata (clustering / insert_overwrite) kills the
  file groups it lists from that instant onward — time travel BELOW the
  replace still sees them;
- hoodie meta columns (``_hoodie_*``) are dropped by default.

Refused loudly: MERGE_ON_READ tables (log files would need compaction
semantics — ``hoodie.table.type`` checked AND ``.log.`` files detected)
and bootstrap/externally-referenced base files.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession


class HudiUnsupportedError(NotImplementedError):
    pass


def _timeline_dir(path: str) -> str:
    return os.path.join(path, ".hoodie")


def _completed_instants(path: str) -> dict[str, str]:
    """{instant_time: action} for completed commits, ascending keys."""
    out: dict[str, str] = {}
    td = _timeline_dir(path)
    if not os.path.isdir(td):
        raise ValueError(f"not a hudi table (no .hoodie under {path})")
    for n in os.listdir(td):
        stem, _, ext = n.partition(".")
        if ext in ("commit", "replacecommit") and stem.isdigit():
            out[stem] = ext
        if ext == "deltacommit":
            raise HudiUnsupportedError(
                "deltacommit in timeline: MERGE_ON_READ table — reading "
                "base files without log merge would return stale rows"
            )
    return dict(sorted(out.items()))


def _check_cow(path: str) -> None:
    props = os.path.join(_timeline_dir(path), "hoodie.properties")
    if os.path.exists(props):
        with open(props, encoding="utf-8") as f:
            for line in f:
                if line.strip().startswith("hoodie.table.type") and \
                        "MERGE_ON_READ" in line:
                    raise HudiUnsupportedError(
                        "hoodie.table.type=MERGE_ON_READ is not supported"
                    )


def _replaced_groups(path: str, instants: dict[str, str], up_to: str) -> set[tuple[str, str]]:
    """(partition, fileId) groups killed by replacecommits <= up_to."""
    dead: set[tuple[str, str]] = set()
    for t, action in instants.items():
        if action != "replacecommit" or t > up_to:
            continue
        f = os.path.join(_timeline_dir(path), f"{t}.replacecommit")
        with open(f, encoding="utf-8") as fh:
            meta = json.load(fh)
        for part, fids in (meta.get("partitionToReplaceFileIds") or {}).items():
            for fid in fids:
                dead.add((part, fid))
    return dead


def hudi_history(path: str) -> list[dict]:
    return [
        {"instant": t, "action": a}
        for t, a in reversed(_completed_instants(path).items())
    ]


def _base_files(path: str):
    """Yield (partition_rel, fileId, instant, abs_path) for every base
    parquet file; raise on MOR log fragments."""
    for cur, dirs, files in os.walk(path):
        dirs[:] = [d for d in dirs if d != ".hoodie"]
        rel = os.path.relpath(cur, path)
        rel = "" if rel == "." else rel
        for n in files:
            if ".log." in n:
                raise HudiUnsupportedError(
                    f"log file {n}: MERGE_ON_READ file slice"
                )
            if not n.endswith(".parquet") or n.startswith("."):
                continue
            parts = n[: -len(".parquet")].split("_")
            if len(parts) != 3:
                continue  # not a hudi base file (e.g. stray parquet)
            file_id, _token, instant = parts
            yield rel, file_id, instant, os.path.join(cur, n)


def read_hudi(
    spark: SparkSession,
    path: str,
    as_of: str | None = None,
    keep_meta: bool = False,
) -> DataFrame:
    """The COW table's snapshot at ``as_of`` (an instant time string;
    default latest): one parquet scan over the chosen file slices."""
    _check_cow(path)
    instants = _completed_instants(path)
    if not instants:
        raise ValueError(f"hudi table has no completed commits: {path}")
    target = max(instants) if as_of is None else str(as_of)
    live = {t for t in instants if t <= target}
    if not live:
        raise ValueError(f"no hudi instant at or before {as_of}")
    dead_groups = _replaced_groups(path, instants, target)

    newest: dict[tuple[str, str], tuple[str, str]] = {}
    for part, fid, instant, abspath in _base_files(path):
        if instant not in live:
            continue  # uncommitted, later than target, or rolled back
        if (part, fid) in dead_groups:
            continue
        cur = newest.get((part, fid))
        if cur is None or instant > cur[0]:
            newest[(part, fid)] = (instant, abspath)
    if not newest:
        raise ValueError(f"no committed base files under {path}")
    df = spark.read.parquet(*sorted(p for _, p in newest.values()))
    if not keep_meta:
        df = df.drop(*[c for c in df.columns if c.startswith("_hoodie_")])
    return df

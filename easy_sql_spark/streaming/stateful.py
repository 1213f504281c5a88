"""Custom stateful streaming operators via ``applyInPandasWithState``.

The reference's streaming mode has no stateful operators beyond engine SQL
(SURVEY.md §2H — Flink statement sets only); these are the extension a
training-data pipeline actually needs, expressed on Spark's Arrow-batched
state API so per-key state lives in the executor state store (RocksDB via
``spark.sql.streaming.stateStore.providerClass`` — restart-tested under
that provider in tests/test_stateful_streaming.py) and nothing grows on
the driver.

- :func:`stream_dedupe` — exact streaming dedup: the first row per key ever
  seen survives, duplicates in the same or any later micro-batch drop.
  State per key is a single marker (~bytes), so the operator scales to
  billions of keys bounded only by the state store.
- :func:`stream_quota` — per-key admission budget (rows or token
  weights): the streaming analogue of the batch per-source cap, one
  8-byte spend value per key, TTL-able refill on the Spark-4 state API.
- :func:`sessionize` — event sessionization with a gap timeout: rows are
  grouped per user, sorted by event time inside the Arrow batch, split at
  ``gap`` boundaries; completed sessions emit, the trailing open session is
  carried in state to the next micro-batch.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout


def stream_dedupe(df: DataFrame, key_cols: list[str]) -> DataFrame:
    """Keep the first row per key across the whole stream.

    Batch-compatible: on a non-streaming frame falls back to
    ``dropDuplicates`` (same semantics, no state store needed).
    """
    if not df.isStreaming:
        return df.dropDuplicates(key_cols)

    out_schema = df.schema
    state_schema = T.StructType([T.StructField("seen", T.BooleanType())])

    def _dedupe(
        key: tuple[Any, ...],
        batches: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            return  # key already emitted in an earlier batch; drop all rows
        first = None
        for pdf in batches:
            if len(pdf) and first is None:
                first = pdf.iloc[[0]]
        if first is not None:
            state.update((True,))
            yield first

    return df.groupBy(*key_cols).applyInPandasWithState(
        _dedupe,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def stream_dedupe_watermarked(
    df: DataFrame, key_cols: list[str], ts_col: str, delay: str
) -> DataFrame:
    """Bounded-state streaming dedup — the production default.

    ``withWatermark`` + ``dropDuplicatesWithinWatermark`` keeps per-key
    state only until the watermark passes (built-in operator, state store
    sized by the delay window, no Python on the executors), versus
    :func:`stream_dedupe`'s whole-stream semantics whose state grows with
    distinct-key cardinality.  Prefer this whenever "duplicate" means
    "same key within the lateness window" — which is what dedup means in
    practice once a stream is unbounded.  Batch-compatible fallback:
    plain ``dropDuplicates``."""
    if not df.isStreaming:
        return df.dropDuplicates(key_cols)
    return df.withWatermark(ts_col, delay).dropDuplicatesWithinWatermark(
        key_cols
    )


def stream_quota(
    df: DataFrame,
    key_cols: list[str],
    cap: float,
    weight_col: str | None = None,
    order_cols: list[str] | None = None,
    ttl_ms: int | None = None,
) -> DataFrame:
    """Streaming per-key admission quota — the streaming analogue of
    ``operators/skew.py:capped_per_key`` and the shape of a per-source
    token budget in a continuously-ingesting training-data pipeline:
    each row spends ``weight_col`` (or 1) against a per-key budget of
    ``cap``; rows are admitted while the running total stays within
    budget, then dropped for the rest of the stream (or until the
    optional ``ttl_ms`` state TTL expires the key's spend — a rolling
    refill without any timer bookkeeping).

    Per-key state is a SINGLE double in the executor state store
    (RocksDB-able), so billions of keys cost 8 bytes each and nothing
    touches the driver.  ``order_cols`` sorts rows inside each Arrow
    batch for deterministic intra-batch admission; cross-batch order is
    stream arrival order, as with any quota.

    Runs on ``transformWithStateInPandas`` (the Spark 4 arbitrary-state
    API, which carries native state TTL) when the environment has its
    protobuf dependency, otherwise transparently on
    ``applyInPandasWithState`` with identical admission semantics —
    ``ttl_ms`` is only honored on the former and raises on the fallback
    rather than silently never expiring.

    Batch-compatible: on a non-streaming frame, falls back to one
    cumulative-sum window per key over ``order_cols`` (required there —
    batch frames have no arrival order)."""
    wcol = (
        F.col(weight_col).cast("double") if weight_col else F.lit(1.0)
    )
    if not df.isStreaming:
        if not order_cols:
            raise ValueError(
                "batch stream_quota needs order_cols (no arrival order)"
            )
        from pyspark.sql import Window

        w = Window.partitionBy(*key_cols).orderBy(*order_cols)
        return (
            df.withColumn("__cum_q", F.sum(wcol).over(w))
            .where(F.col("__cum_q") <= float(cap))
            .drop("__cum_q")
        )

    out_schema = df.schema
    cols = list(df.columns)
    cap_f = float(cap)
    order = list(order_cols) if order_cols else None
    weight = weight_col

    def _admit(pdf: pd.DataFrame, used: float) -> tuple[pd.DataFrame | None, float]:
        """Rows of one Arrow batch that fit the remaining budget."""
        if order:
            pdf = pdf.sort_values(order, kind="mergesort")
        wts = (
            pdf[weight].astype(float)
            if weight
            else pd.Series(1.0, index=pdf.index)
        )
        cum = used + wts.cumsum()
        mask = (cum <= cap_f).to_numpy()
        if not mask.any():
            return None, used
        return pdf.iloc[mask][cols], float(cum.to_numpy()[mask][-1])

    import importlib.util

    try:
        has_proto = importlib.util.find_spec("google.protobuf") is not None
    except ModuleNotFoundError:  # no 'google' namespace package at all
        has_proto = False
    if has_proto:
        from pyspark.sql.streaming.stateful_processor import (
            StatefulProcessor,
            StatefulProcessorHandle,
        )

        class _Quota(StatefulProcessor):
            def init(self, handle: StatefulProcessorHandle) -> None:
                self._used = handle.getValueState(
                    "used", "used double", ttlDurationMs=ttl_ms
                )

            def handleInputRows(self, key, rows, timerValues):
                prior = self._used.get()
                used = float(prior[0]) if prior is not None else 0.0
                for pdf in rows:
                    if not len(pdf):
                        continue
                    admitted, used = _admit(pdf, used)
                    if admitted is not None:
                        yield admitted
                self._used.update((used,))

            def close(self) -> None:
                pass

        return df.groupBy(*key_cols).transformWithStateInPandas(
            _Quota(),
            outputStructType=out_schema,
            outputMode="append",
            timeMode="none",
        )

    if ttl_ms is not None:
        raise ValueError(
            "ttl_ms needs transformWithStateInPandas (protobuf absent in "
            "this environment); without it the spend state never expires"
        )
    state_schema = T.StructType([T.StructField("used", T.DoubleType())])

    def _quota(
        key: tuple[Any, ...],
        batches: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        used = float(state.get[0]) if state.exists else 0.0
        for pdf in batches:
            if not len(pdf):
                continue
            admitted, used = _admit(pdf, used)
            if admitted is not None:
                yield admitted
        state.update((used,))

    return df.groupBy(*key_cols).applyInPandasWithState(
        _quota,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def sessionize_builtin(
    df: DataFrame,
    user_col: str,
    ts_col: str,
    gap: str,
    delay: str | None = None,
) -> DataFrame:
    """Gap sessionization on Spark's built-in ``session_window`` — the
    JVM-native path beside the custom ``sessionize`` operator (which
    exists for semantics the built-in can't express: late-event merge
    policy, open-session carry).  ``ts_col`` must be a timestamp; on a
    stream a watermark (``delay``) bounds state and append-mode emits a
    session once the watermark passes its close.

    Batch frames work too (no watermark needed) — the same call
    backfills history, and tests cross-validate it against the
    lag-flag-cumsum batch query."""
    if df.isStreaming:
        if not delay:
            raise ValueError("streaming sessionize_builtin needs a watermark delay")
        df = df.withWatermark(ts_col, delay)
    return (
        df.groupBy(user_col, F.session_window(ts_col, gap).alias("w"))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            user_col,
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
        )
    )


SESSION_SCHEMA = T.StructType(
    [
        T.StructField("user", T.LongType()),
        T.StructField("session_start", T.LongType()),
        T.StructField("session_end", T.LongType()),
        T.StructField("n_events", T.LongType()),
    ]
)

_SESSION_STATE = T.StructType(
    [
        T.StructField("start", T.LongType()),
        T.StructField("last", T.LongType()),
        T.StructField("n", T.LongType()),
    ]
)


def sessionize(df: DataFrame, user_col: str, ts_col: str, gap: int) -> DataFrame:
    """Split each user's event stream into sessions separated by more than
    ``gap`` time units (``ts_col`` is a numeric event time, e.g. epoch
    seconds).

    Emits one row per COMPLETED session (a later event arrived more than
    ``gap`` after the session's last event); the open trailing session stays
    in state and completes in a later micro-batch — or never, if the stream
    ends (flush-on-timeout can be layered with an event-time timeout once a
    watermark is attached upstream).

    Late data: there is no watermark at this layer, so an event older than
    the stored session's last timestamp (delivered by a later micro-batch)
    is merged into the open session without moving ``last`` backwards — it
    extends ``n`` and can only pull ``start`` earlier, never shorten the
    gap window for subsequent in-order events.
    """
    assert df.isStreaming, "sessionize operates on streaming DataFrames"

    def _sessionize(
        key: tuple[Any, ...],
        batches: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        ts = pd.concat([pdf[ts_col] for pdf in batches]).sort_values()
        if not len(ts):
            return
        if state.exists:
            start, last, n = state.get
        else:
            start, last, n = None, None, 0
        completed: list[tuple[int, int, int, int]] = []
        user = key[0]
        for t in ts:
            t = int(t)
            if start is None:
                start, last, n = t, t, 1
            elif t - last > gap:
                completed.append((user, start, last, n))
                start, last, n = t, t, 1
            else:
                # max() guards against cross-batch late events: t can be
                # older than the stored `last`, and moving `last` backwards
                # would spuriously split the session at the next event
                start, last, n = min(start, t), max(last, t), n + 1
        state.update((start, last, n))
        if completed:
            yield pd.DataFrame(
                completed,
                columns=["user", "session_start", "session_end", "n_events"],
            )

    return df.groupBy(user_col).applyInPandasWithState(
        _sessionize,
        outputStructType=SESSION_SCHEMA,
        stateStructType=_SESSION_STATE,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )

"""Model-based randomized testing of the SCD2 output-step merge
(`__save_mode__=scd2`, runtime/backend.py _merge_scd2_frame): a random
sequence of ts-ordered batches flows through the FULL output-step path,
and the final table state must equal a 20-line pure-Python SCD2 model —
close-on-change, insert-as-current, no-op on identical re-arrival,
intra-batch collapse to the latest version.  The fixed oracle query
(scd2_history_merge) checks one curated 2-batch scenario; this covers
arbitrary interleavings (keys appearing/disappearing/reappearing across
batches, attribute flapping A→B→A, duplicate keys within a batch)."""

import itertools

import _depth

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from easy_sql_spark.runtime.processor import SqlProcessor

_case = itertools.count()

#: per batch: key (small space, forces collisions) -> attribute value
#: (tiny alphabet, forces both changed and identical re-arrivals)
_batches = st.lists(
    st.dictionaries(
        st.integers(1, 5), st.sampled_from(["a", "b", "c"]),
        min_size=1, max_size=4,
    ),
    min_size=1,
    max_size=4,
)


def _model(batches):
    """Reference SCD2: rows are [val, start, end, cur] per key."""
    rows: dict[int, list[list]] = {}
    for ts, batch in enumerate(batches, 1):
        for k, v in batch.items():
            hist = rows.setdefault(k, [])
            cur = next((r for r in hist if r[3]), None)
            if cur is None:
                hist.append([v, ts, None, True])
            elif cur[0] != v:
                cur[2] = ts
                cur[3] = False
                hist.append([v, ts, None, True])
            # identical value: no-op (idempotent re-arrival)
    return {
        (k, r[0], r[1], r[2], r[3]) for k, hist in rows.items() for r in hist
    }


@given(batches=_batches)
@settings(
    max_examples=_depth.examples(12),
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_random_scd2_sequences_match_model(spark, batches):
    db = f"scd2fz{next(_case)}"
    steps = [
        f"""-- backend: spark
-- prepare-sql: drop database if exists {db} cascade
-- prepare-sql: create database {db}

-- target=variables
select true as __create_output_table__, 'scd2' as __save_mode__,
       'k' as __merge_keys__, 'ts' as __scd2_ts__
"""
    ]
    for ts, batch in enumerate(batches, 1):
        rows = ", ".join(f"({k}, '{v}', {ts})" for k, v in batch.items())
        steps.append(
            f"-- target=output.{db}.dim\n"
            f"select * from values {rows} as t(k, val, ts)\n"
        )
    SqlProcessor(spark, "\n".join(steps), logger=lambda m: None).run()

    got = {
        (r["k"], r["val"], r["__start_at"], r["__end_at"], r["__is_current"])
        for r in spark.table(f"{db}.dim").collect()
    }
    assert got == _model(batches)
    spark.sql(f"drop database if exists {db} cascade")


#: per batch: key -> (value, precombine units).  Precombine values are
#: made unique per key within a batch (ties fall to a row hash, which no
#: model can predict), but CAN collide across batches.
_upsert_batches = st.lists(
    st.dictionaries(
        st.integers(1, 5),
        st.tuples(st.sampled_from(["a", "b", "c"]), st.integers(0, 3)),
        min_size=1,
        max_size=4,
    ),
    min_size=1,
    max_size=4,
)


@given(batches=_upsert_batches)
@settings(
    max_examples=_depth.examples(10),
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_random_upsert_sequences_match_model(spark, batches):
    """SCD1 keyed upsert (`__save_mode__=upsert`): random batch
    sequences — including intra-batch duplicate keys resolved by the
    precombine column — must leave exactly the model's last-write state.
    Intra-batch duplicates get UNIQUE precombine values (the tie-break
    is a row hash by contract, unpredictable by any model)."""
    db = f"ups1fz{next(_case)}"
    steps = [
        f"""-- backend: spark
-- prepare-sql: drop database if exists {db} cascade
-- prepare-sql: create database {db}

-- target=variables
select true as __create_output_table__, 'upsert' as __save_mode__,
       'k' as __merge_keys__, 'pc' as __upsert_precombine__
"""
    ]
    model: dict[int, str] = {}
    for bno, batch in enumerate(batches):
        rows = []
        for i, (k, (v, pc)) in enumerate(sorted(batch.items())):
            # duplicate each key with a LOWER-precombine decoy row the
            # merge must discard
            rows.append((k, v, pc * 10 + 5))
            rows.append((k, v + "_stale", pc * 10))
            model[k] = v
        vals = ", ".join(f"({k}, '{v}', {pc})" for k, v, pc in rows)
        steps.append(
            f"-- target=output.{db}.dim\n"
            f"select * from values {vals} as t(k, val, pc)\n"
        )
    SqlProcessor(spark, "\n".join(steps), logger=lambda m: None).run()
    got = {(r["k"], r["val"]) for r in spark.table(f"{db}.dim").collect()}
    assert got == set(model.items())
    spark.sql(f"drop database if exists {db} cascade")

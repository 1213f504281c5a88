"""Model-based randomized testing of the dedup-index ADMISSION state
machine (VERDICT r13 #1, carried through r14 #8): seeded sequences of
ingests — plain, batch-id'd, deferred contexts, mid-context auto-flush,
forced-distributed batches, replays of committed batch ids — are
mirrored against a plain in-memory model of the documented semantics:

- a doc is rejected iff any of its LSH bands matches an already-
  admitted doc's band (committed or pending-admitted in-context);
- among surviving docs of one batch, docs connected by shared bands
  form components and only the min doc_id of each component is
  admitted;
- docs too short to band are admitted but never indexed;
- replaying a committed batch id returns exactly the docs that batch
  originally indexed (plus its bandless docs) and changes nothing.

The band table itself comes from the engine (``minhash_bands``) — the
model checks the admission machinery, not the banding math (that is
oracle-pinned elsewhere).  Every path (local, distributed, deferred,
key-budget flush) must produce IDENTICAL admissions for the same doc
sequence.
"""

import random

import pytest

import _depth
from pyspark.sql import functions as F


def _band_rows(idx, docs):
    """The engine's own band table for these docs, collected."""
    return idx._bands(docs).collect()


def _model_admit(band_rows, all_doc_ids, indexed_keys):
    """Reference admission for one batch.  Mutates indexed_keys."""
    bands_by_doc: dict[int, set] = {}
    for r in band_rows:
        bands_by_doc.setdefault(r.doc_id, set()).add((r.band_id, r.band))
    bandless = set(all_doc_ids) - set(bands_by_doc)
    hit = {
        d for d, bs in bands_by_doc.items()
        if any(b in indexed_keys for b in bs)
    }
    # union-find over survivors sharing any band; min doc_id wins
    survivors = sorted(set(bands_by_doc) - hit)
    parent = {d: d for d in survivors}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    by_band: dict[tuple, list[int]] = {}
    for d in survivors:
        for b in bands_by_doc[d]:
            by_band.setdefault(b, []).append(d)
    for ds in by_band.values():
        for other in ds[1:]:
            ra, rb = find(ds[0]), find(other)
            if ra != rb:
                parent[max(ra, rb)] = min(ra, rb)
    admitted_banded = {d for d in survivors if find(d) == d}
    for d in admitted_banded:
        indexed_keys |= bands_by_doc[d]
    return admitted_banded | bandless, admitted_banded


TEXT_POOL = [
    "the quick brown fox jumps over the lazy dog tonight",
    "an entirely different document about spark shuffle planning",
    "completely novel content never seen before in this corpus",
    "a fourth text with its own unrepeated vocabulary entirely",
    "fifth sample sentence about distributed query execution plans",
    "sixth unique paragraph concerning adaptive partition coalescing",
    "seventh piece of writing on broadcast hash join thresholds",
    "eighth fragment describing parquet row group statistics",
    "short",  # too short to shingle -> bandless
    "tiny",   # bandless
]


@pytest.mark.parametrize("seed", _depth.seeds([3, 17]))
def test_dedup_index_admission_matches_model(spark, tmp_path, seed):
    import easy_sql_spark.operators.components as comps
    from easy_sql_spark.operators.dedup_index import MinHashDedupIndex

    rng = random.Random(seed)
    idx = MinHashDedupIndex(spark, str(tmp_path / f"fuzz{seed}"))
    if seed % 2:
        idx.PENDING_LOCAL_KEYS_MAX = 2  # trip the auto-flush constantly

    indexed_keys: set = set()
    admitted_by_batch: dict[int, set] = {}   # batch_id -> ALL admits
    batch_rows: dict[int, list] = {}         # batch_id -> (doc, text)
    all_admitted_banded: set = set()
    next_doc = 1
    next_bid = 0
    committed_bids: list[int] = []

    def mk_rows(n):
        nonlocal next_doc
        rows = []
        for _ in range(n):
            # mix of fresh texts and dups of earlier docs
            rows.append((next_doc, rng.choice(TEXT_POOL)))
            next_doc += 1
        return rows

    def run_ingest(rows, batch_id, force_distributed):
        docs = spark.createDataFrame(rows, "doc_id long, text string")
        band_rows = _band_rows(idx, docs)
        want, banded = _model_admit(
            band_rows, [d for d, _ in rows], indexed_keys
        )
        orig = comps.LOCAL_COMPONENT_EDGE_ROWS
        try:
            if force_distributed:
                comps.LOCAL_COMPONENT_EDGE_ROWS = 0
            got = {r.doc_id for r in idx.ingest(docs, batch_id).collect()}
        finally:
            comps.LOCAL_COMPONENT_EDGE_ROWS = orig
        assert got == want, (
            f"seed={seed} batch_id={batch_id} "
            f"forced={force_distributed}: got {sorted(got)} "
            f"want {sorted(want)}"
        )
        if batch_id is not None:
            admitted_by_batch[batch_id] = want
            batch_rows[batch_id] = rows
        all_admitted_banded.update(banded)

    for step in range(6):
        deferred = rng.random() < 0.5
        n_batches = rng.randrange(1, 3) if not deferred else rng.randrange(2, 4)
        use_bid = rng.random() < 0.7
        batches = []
        for _ in range(n_batches):
            bid = None
            if use_bid:
                bid = next_bid
                next_bid += 1
            batches.append((mk_rows(rng.randrange(2, 5)), bid))
        forced = rng.random() < 0.3
        if deferred:
            with idx.deferred_commits():
                for rows, bid in batches:
                    run_ingest(rows, bid, forced and rng.random() < 0.5)
            committed_bids += [b for _, b in batches if b is not None]
        else:
            for rows, bid in batches:
                run_ingest(rows, bid, forced)
                if bid is not None:
                    committed_bids.append(bid)

        # occasionally replay a committed batch verbatim (the streaming
        # checkpoint-restart shape): must return exactly the docs the
        # original run admitted and change no state
        if committed_bids and rng.random() < 0.5:
            bid = rng.choice(committed_bids)
            docs = spark.createDataFrame(
                batch_rows[bid], "doc_id long, text string"
            )
            keys_before = set(indexed_keys)
            got = {r.doc_id for r in idx.ingest(docs, bid).collect()}
            assert got == admitted_by_batch[bid], f"replay of batch {bid}"
            assert indexed_keys == keys_before

    # final state: the set of indexed doc_ids equals the model's
    # admitted banded docs
    got_indexed = {
        r.doc_id
        for r in idx.table.read().select("doc_id").distinct().collect()
    }
    assert got_indexed == all_admitted_banded
    assert len(got_indexed) > 0
    # the corpus had duplicates; the model rejected at least one
    assert next_doc - 1 > len(all_admitted_banded)

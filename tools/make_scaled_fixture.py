"""Generate a scaled-up fixture by replicating a driver sf dir K times.

Usage:
    python tools/make_scaled_fixture.py [src_dir] [k] [out_dir]
    # default: /root/testdata/sf0.1 x10 -> /tmp/spark_graft_sf1

Replication is referentially consistent: every key domain (orderkey,
partkey, suppkey, custkey, doc_id, vec_id, event_id, user_id) is shifted
by ``replica * (max_key + 1)`` in BOTH the primary table and every foreign
key that references it, so join fan-in per key, group sizes, and per-user
event counts stay constant while table cardinality grows K-fold — the
scale-up a real corpus growth produces, not a duplicate explosion.
``region``/``nation`` stay fixed (TPC-H semantics: dims that do not scale).

Document text gets a per-replica suffix token so the scaled corpus is not
100% exact duplicates (which would turn every LSH bucket into a K-deep
clique and measure the duplicate-pathology path instead of corpus growth;
that path has its own probe in SCALE.md).  Embedding vectors are reused
unchanged — ANN scan cost depends on corpus size, not vector values.

Pure pyarrow (no Spark session): ~6M lineitem rows in a few seconds.
Row groups are capped at 128k rows so Spark gets a splittable scan
without needing ``spread()``.
"""

from __future__ import annotations

import os
import sys

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

# table -> {column: key_domain}; the domain owner's max defines the shift
KEY_COLS: dict[str, dict[str, str]] = {
    "orders": {"o_orderkey": "orderkey", "o_custkey": "custkey"},
    "lineitem": {
        "l_orderkey": "orderkey",
        "l_partkey": "partkey",
        "l_suppkey": "suppkey",
    },
    "customer": {"c_custkey": "custkey"},
    "supplier": {"s_suppkey": "suppkey"},
    "part": {"p_partkey": "partkey"},
    "events": {"event_id": "event_id", "user_id": "user_id"},
    "documents": {"doc_id": "doc_id"},
    "embeddings": {"vec_id": "vec_id"},
}
# key_domain -> (owning table, owning column)
DOMAIN_OWNER = {
    "orderkey": ("orders", "o_orderkey"),
    "custkey": ("customer", "c_custkey"),
    "suppkey": ("supplier", "s_suppkey"),
    "partkey": ("part", "p_partkey"),
    "event_id": ("events", "event_id"),
    "user_id": ("events", "user_id"),
    "doc_id": ("documents", "doc_id"),
    "vec_id": ("embeddings", "vec_id"),
}
FIXED_TABLES = ("region", "nation")


def scale_fixture(src: str, k: int, out: str) -> None:
    os.makedirs(out, exist_ok=True)
    shifts = {}
    for domain, (table, col) in DOMAIN_OWNER.items():
        t = pq.read_table(f"{src}/{table}.parquet", columns=[col])
        shifts[domain] = int(pc.max(t[col]).as_py()) + 1

    for table in FIXED_TABLES:
        pq.write_table(
            pq.read_table(f"{src}/{table}.parquet"), f"{out}/{table}.parquet"
        )
        print(f"{table}: copied (fixed dim)")

    for table, cols in KEY_COLS.items():
        base = pq.read_table(f"{src}/{table}.parquet")
        # stream replicas straight to the writer: memory stays O(one
        # replica) whatever k is (sf10 = k=100 would otherwise hold
        # ~60M lineitem rows in arrow buffers at once)
        writer = pq.ParquetWriter(f"{out}/{table}.parquet", base.schema)
        n_rows = 0
        for i in range(k):
            t = base
            for col, domain in cols.items():
                idx = t.schema.get_field_index(col)
                typ = t.schema.field(idx).type
                shifted = pc.cast(
                    pc.add(pc.cast(t[col], pa.int64()), i * shifts[domain]), typ
                )
                t = t.set_column(idx, t.schema.field(idx), shifted)
            if table == "documents" and i > 0:
                idx = t.schema.get_field_index("text")
                tagged = pc.binary_join_element_wise(
                    t["text"], pa.scalar(f" r{i:02d}"), ""
                )
                t = t.set_column(idx, t.schema.field(idx), tagged)
            writer.write_table(t, row_group_size=131072)
            n_rows += t.num_rows
        writer.close()
        print(f"{table}: {base.num_rows} -> {n_rows} rows")


if __name__ == "__main__":
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    k = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    out = sys.argv[3] if len(sys.argv) > 3 else "/tmp/spark_graft_sf1"
    scale_fixture(src, k, out)

"""Multimodal-column queries — the Arrow/Pandas-UDF plumbing as declared,
oracle-checked operators.

The media table is synthesized deterministically from the documents fixture
(payload = utf-8 text bytes, kind assigned round-robin), so the DuckDB
oracle can reproduce every derived value from ``encode(text)`` while the
Spark side runs the REAL pipeline shape: binary column → ``mapInPandas``
decode (operators/multimodal.py) → relational aggregation.  At 100 TB the
only thing that changes is the payload source (parquet binary column) and
the decode body (PIL/ffmpeg instead of the deterministic fake).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..datasets import load_table, spread
from ..operators.multimodal import decode_media, frame_sample_stub
from . import query


def _media_df(spark, sf_dir):
    """documents → fake media table: kind by doc_id round-robin, payload =
    utf-8 bytes (mirrors operators.multimodal.synth_media_df, with a mixed
    ``kind`` so grouping is meaningful)."""
    d = load_table(spark, sf_dir, "documents")
    kind = (
        F.when(F.col("doc_id") % 3 == 0, "image")
        .when(F.col("doc_id") % 3 == 1, "audio")
        .otherwise("video")
    )
    return d.select(
        F.col("doc_id").alias("media_id"),
        kind.alias("kind"),
        F.encode("text", "utf-8").alias("payload"),
        F.lit("x/fake").alias("mime"),
        F.create_map(F.lit("source"), F.col("source")).alias("meta"),
    )


@query(
    "mm_decode_stats",
    oracle="""
    WITH m AS (
        SELECT doc_id AS media_id,
               CASE CAST(doc_id % 3 AS INT) WHEN 0 THEN 'image'
                    WHEN 1 THEN 'audio' ELSE 'video' END AS kind,
               octet_length(encode(text)) AS n_bytes
        FROM documents)
    SELECT kind,
           CAST(COUNT(*) AS BIGINT) AS n_items,
           CAST(SUM(n_bytes) AS BIGINT) AS total_bytes,
           CAST(SUM(n_bytes % 640 + 1) AS DOUBLE) / COUNT(*) AS avg_width,
           CAST(SUM(n_bytes % 480 + 1) AS DOUBLE) / COUNT(*) AS avg_height
    FROM m GROUP BY kind ORDER BY kind
    """,
)
def mm_decode_stats(spark, sf_dir):
    """Decode binary media via the Arrow-batched mapInPandas path, then
    aggregate the extracted features.  The decode stage is a narrow map —
    partitioning survives, nothing shuffles until the final tiny groupBy.
    ``spread`` parallelizes the CPU-heavy decode when the scan is coarse.
    Columns are pruned manually before the UDF — Catalyst cannot prune
    through an opaque mapInPandas, so unused map/string columns would
    otherwise ride the Arrow transfer."""
    media = spread(_media_df(spark, sf_dir).select("media_id", "kind", "payload"))
    decoded = decode_media(media, mode="fake")
    return (
        decoded.groupBy("kind")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            F.sum("n_bytes").cast("bigint").alias("total_bytes"),
            (F.sum("width").cast("double") / F.count(F.lit(1))).alias("avg_width"),
            (F.sum("height").cast("double") / F.count(F.lit(1))).alias(
                "avg_height"
            ),
        )
        .orderBy("kind")
    )


@query(
    "mm_hist_profile",
    oracle="""
    -- documents text is pure ASCII (verified): byte value == code point
    WITH bytes AS (
        SELECT doc_id, ord(substr(text, CAST(i AS INT), 1)) AS b
        FROM documents, UNNEST(range(1, length(text) + 1)) AS t(i))
    SELECT CAST(b // 16 AS INT) AS nibble,
           CAST(COUNT(*) AS BIGINT) AS n_bytes
    FROM bytes GROUP BY b // 16 ORDER BY nibble
    """,
)
def mm_hist_profile(spark, sf_dir):
    """Corpus-wide byte-value profile: per-item 16-bin histograms from the
    mapInPandas decode, merged via posexplode → groupBy(nibble) SUM.  Scale:
    shuffle volume is O(items × 16) histogram entries with map-side partial
    aggregation — the payload bytes themselves never shuffle."""
    media = spread(_media_df(spark, sf_dir).select("media_id", "kind", "payload"))
    decoded = decode_media(media, mode="fake")
    return (
        decoded.select(F.posexplode("byte_histogram").alias("nibble", "cnt"))
        .groupBy("nibble")
        .agg(F.sum("cnt").alias("n_bytes"))
        .where(F.col("n_bytes") > 0)
        .select(F.col("nibble").cast("int"), F.col("n_bytes").cast("bigint"))
        .orderBy("nibble")
    )


@query(
    "mm_frame_sample",
    oracle="""
    WITH v AS (SELECT doc_id AS media_id FROM documents
               WHERE CAST(doc_id % 3 AS INT) = 2),
    f AS (SELECT media_id, UNNEST([0, 2, 4]) AS frame_idx FROM v)
    SELECT CAST(frame_idx AS INT) AS frame_idx,
           CAST(COUNT(*) AS BIGINT) AS n_frames,
           CAST(MIN(media_id) AS BIGINT) AS first_media
    FROM f GROUP BY frame_idx ORDER BY frame_idx
    """,
)
def mm_frame_sample(spark, sf_dir):
    """Video frame sampling plumbing: one row per sampled frame index
    (explode), aggregated per index.  The frame-extraction body is stubbed;
    the row-expansion shape (the part that matters for partition sizing at
    scale) is real."""
    videos = _media_df(spark, sf_dir).where(F.col("kind") == "video")
    frames = frame_sample_stub(videos, every_n=2)
    return (
        frames.groupBy(F.col("frame_idx").cast("int").alias("frame_idx"))
        .agg(
            F.count(F.lit(1)).alias("n_frames"),
            F.min("media_id").alias("first_media"),
        )
        .orderBy("frame_idx")
    )

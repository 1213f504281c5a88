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


# JPEG roundtrip grid: JPG_BY x JPG_BX blocks of 8x8 constant pixels, one
# text byte per block.  Block-constant content survives baseline JPEG
# EXACTLY: every AC coefficient is 0 and the DC reconstruction error is
# (dc_quant/2)/8 < 0.5 whenever dc_quant < 8 (true at quality 90, where the
# scaled Annex-K luma DC step is 3) — so a lossy codec still admits an
# exact DuckDB oracle.  r=g=b also makes the color transform exact
# (Cb=Cr=128 identically, zero after level shift).
JPG_BY, JPG_BX = 4, 6


@query(
    "mm_jpeg_roundtrip_stats",
    oracle=f"""
    WITH b AS (
        SELECT doc_id,
               ascii(substr(rpad(substr(text, 1, {JPG_BY * JPG_BX}),
                                 {JPG_BY * JPG_BX}, '?'),
                            CAST(i AS INT), 1)) AS v
        FROM documents, UNNEST(range(1, {JPG_BY * JPG_BX} + 1)) AS t(i)
        WHERE doc_id <= 150)
    SELECT doc_id AS media_id,
           {JPG_BX * 8} AS width, {JPG_BY * 8} AS height,
           CAST(3 * 64 * SUM(v) AS BIGINT) AS pixel_sum
    FROM b GROUP BY doc_id ORDER BY media_id
    """,
)
def mm_jpeg_roundtrip_stats(spark, sf_dir):
    """REAL-codec JPEG query: per document, a block-constant RGB image is
    built from text bytes, encoded as baseline JPEG (4:2:0, restart
    markers) by operators/jpeg.py's own encoder, decoded back through the
    full Huffman/IDCT path, and the decoded pixel sum is reported.  The
    construction keeps the lossy codec pixel-exact (see JPG_BY comment),
    so the oracle recomputes the sum from the text — a Huffman, DCT,
    quantization, subsampling or byte-stuffing bug on either side breaks
    the match.  Same narrow mapInPandas shape as the GIF/WAV paths:
    payloads never shuffle, one row out per document."""
    import pandas as pd

    from ..operators.jpeg import decode_jpeg, encode_jpeg

    docs = (
        load_table(spark, sf_dir, "documents")
        .where(F.col("doc_id") <= 150)
        .select("doc_id", "text")
    )
    n_blocks = JPG_BY * JPG_BX

    def _roundtrip(batches):
        import numpy as np

        for pdf in batches:
            rows = []
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                chunk = text[:n_blocks].ljust(n_blocks, "?")
                grid = np.frombuffer(
                    chunk.encode("ascii", "replace"), dtype=np.uint8
                ).reshape(JPG_BY, JPG_BX)
                gray = np.repeat(np.repeat(grid, 8, axis=0), 8, axis=1)
                img = np.stack([gray] * 3, axis=-1)
                payload = encode_jpeg(
                    img, quality=90, subsampling="4:2:0", restart_interval=3
                )
                out = decode_jpeg(payload)
                rows.append(
                    (
                        int(doc_id),
                        out.shape[1],
                        out.shape[0],
                        int(out.sum(dtype=np.int64)),
                    )
                )
            yield pd.DataFrame(
                rows, columns=["media_id", "width", "height", "pixel_sum"]
            )

    return (
        spread(docs)
        .mapInPandas(
            _roundtrip, "media_id long, width int, height int, pixel_sum long"
        )
        .orderBy("media_id")
    )


@query(
    "mm_jpeg_progressive_stats",
    oracle=f"""
    WITH b AS (
        SELECT doc_id,
               ascii(substr(rpad(substr(text, 1, {JPG_BY * JPG_BX}),
                                 {JPG_BY * JPG_BX}, '?'),
                            CAST(i AS INT), 1)) AS v
        FROM documents, UNNEST(range(1, {JPG_BY * JPG_BX} + 1)) AS t(i)
        WHERE doc_id <= 150)
    SELECT doc_id AS media_id,
           {JPG_BX * 8} AS width, {JPG_BY * 8} AS height,
           CAST(3 * 64 * SUM(v) AS BIGINT) AS pixel_sum,
           CAST(1 AS BIGINT) AS is_progressive
    FROM b GROUP BY doc_id ORDER BY media_id
    """,
)
def mm_jpeg_progressive_stats(spark, sf_dir):
    """PROGRESSIVE (SOF2) JPEG roundtrip: the same pixel-exact
    block-constant construction as mm_jpeg_roundtrip_stats, but encoded
    with encode_jpeg_progressive — multiple SOS scans exercising
    spectral selection AND successive approximation (DC/AC first +
    refinement passes, EOB runs) — and decoded through the progressive
    accumulation path.  Real web corpora are majority-progressive, so
    this is the decode path a 100 TB image pipeline actually runs; the
    oracle recomputes the expected pixel sum from the text bytes, and
    ``is_progressive`` asserts the payload really is SOF2."""
    import pandas as pd

    from ..operators.jpeg import decode_jpeg, encode_jpeg_progressive

    docs = (
        load_table(spark, sf_dir, "documents")
        .where(F.col("doc_id") <= 150)
        .select("doc_id", "text")
    )
    n_blocks = JPG_BY * JPG_BX

    def _roundtrip(batches):
        import numpy as np

        for pdf in batches:
            rows = []
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                chunk = text[:n_blocks].ljust(n_blocks, "?")
                grid = np.frombuffer(
                    chunk.encode("ascii", "replace"), dtype=np.uint8
                ).reshape(JPG_BY, JPG_BX)
                gray = np.repeat(np.repeat(grid, 8, axis=0), 8, axis=1)
                img = np.stack([gray] * 3, axis=-1)
                payload = encode_jpeg_progressive(
                    img, quality=90, subsampling="4:2:0"
                )
                out = decode_jpeg(payload)
                rows.append(
                    (
                        int(doc_id),
                        out.shape[1],
                        out.shape[0],
                        int(out.sum(dtype=np.int64)),
                        int(b"\xff\xc2" in payload),
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "media_id", "width", "height", "pixel_sum",
                    "is_progressive",
                ],
            )

    return (
        spread(docs)
        .mapInPandas(
            _roundtrip,
            "media_id long, width int, height int, pixel_sum long, "
            "is_progressive long",
        )
        .orderBy("media_id")
    )


@query(
    "mm_exif_orientation",
    oracle=f"""
    WITH b AS (
        SELECT doc_id,
               ascii(substr(rpad(substr(text, 1, {JPG_BY * JPG_BX}),
                                 {JPG_BY * JPG_BX}, '?'),
                            CAST(i AS INT), 1)) AS v
        FROM documents, UNNEST(range(1, {JPG_BY * JPG_BX} + 1)) AS t(i)
        WHERE doc_id <= 200)
    SELECT doc_id AS media_id,
           CAST(doc_id % 8 + 1 AS INT) AS orientation,
           CAST(CASE WHEN doc_id % 8 + 1 >= 5
                     THEN {JPG_BY * 8} ELSE {JPG_BX * 8} END AS INT) AS width,
           CAST(CASE WHEN doc_id % 8 + 1 >= 5
                     THEN {JPG_BX * 8} ELSE {JPG_BY * 8} END AS INT) AS height,
           CAST(3 * 64 * SUM(v) AS BIGINT) AS pixel_sum
    FROM b GROUP BY doc_id ORDER BY media_id
    """,
)
def mm_exif_orientation(spark, sf_dir):
    """EXIF-aware image normalization: each document's pixel-exact JPEG
    gets an APP1/EXIF segment with orientation ``doc_id % 8 + 1``
    (operators/jpeg.py:make_exif_app1 — real TIFF IFD bytes), and the
    decode path applies it (``decode_jpeg_oriented``): orientations 5-8
    transpose the frame, so width/height swap while the pixel SUM is
    invariant under every flip/rotation — which the oracle recomputes
    from the text bytes.  A pipeline that skips this step hashes every
    rotated mobile photo four ways."""
    import pandas as pd

    from ..operators.jpeg import (
        decode_jpeg_oriented,
        encode_jpeg,
        make_exif_app1,
        parse_exif,
    )

    docs = (
        load_table(spark, sf_dir, "documents")
        .where(F.col("doc_id") <= 200)
        .select("doc_id", "text")
    )
    n_blocks = JPG_BY * JPG_BX

    def _orient(batches):
        import numpy as np

        for pdf in batches:
            rows = []
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                chunk = text[:n_blocks].ljust(n_blocks, "?")
                grid = np.frombuffer(
                    chunk.encode("ascii", "replace"), dtype=np.uint8
                ).reshape(JPG_BY, JPG_BX)
                gray = np.repeat(np.repeat(grid, 8, axis=0), 8, axis=1)
                img = np.stack([gray] * 3, axis=-1)
                o = int(doc_id) % 8 + 1
                jpg = encode_jpeg(img, quality=90, subsampling="4:2:0")
                tagged = jpg[:2] + make_exif_app1(orientation=o) + jpg[2:]
                out = decode_jpeg_oriented(tagged)
                rows.append(
                    (
                        int(doc_id),
                        parse_exif(tagged)["orientation"],
                        out.shape[1],
                        out.shape[0],
                        int(out.sum(dtype=np.int64)),
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "media_id", "orientation", "width", "height", "pixel_sum",
                ],
            )

    return (
        spread(docs)
        .mapInPandas(
            _orient,
            "media_id long, orientation int, width int, height int, "
            "pixel_sum long",
        )
        .orderBy("media_id")
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


# MP4 demux grid: VID_FRAMES fixed-size samples per document, each a
# '?'-padded text chunk — the real ISO-BMFF mux/demux runs end-to-end and
# the oracle recomputes every sampled frame's byte sum from the text.
VID_FRAMES, VID_CHUNK = 6, 40


@query(
    "mm_mp4_demux_stats",
    oracle=f"""
    WITH f AS (
        SELECT doc_id, k,
               rpad(substr(text, k * {VID_CHUNK} + 1, {VID_CHUNK}),
                    {VID_CHUNK}, '?') AS chunk
        FROM documents, UNNEST(range(0, {VID_FRAMES})) AS t(k)
        WHERE doc_id <= 150 AND CAST(k AS INT) % 2 = 0)
    SELECT doc_id AS media_id, CAST(k AS INT) AS frame_idx,
           {VID_FRAMES} AS n_frames,
           {VID_CHUNK} AS sample_bytes,
           CAST(list_sum(list_transform(range(1, {VID_CHUNK} + 1),
               i -> ascii(substr(chunk, i, 1)))) AS BIGINT) AS byte_sum
    FROM f ORDER BY media_id, frame_idx
    """,
)
def mm_mp4_demux_stats(spark, sf_dir):
    """REAL-container MP4 query: per document, VID_FRAMES opaque samples
    (text chunks) are muxed into a chunked ISO-BMFF file
    (operators/mp4.py), then every-2nd sample comes back through the real
    demux path — stsc/stco/stsz resolution to exact byte ranges — and
    reports its size and byte sum.  A box-walk or sample-table bug on
    either side breaks the oracle match.  Codec decode of real video
    bitstreams stays honestly out of scope (ffmpeg absent); the container
    layer, the part a sampling pipeline shuffles and seeks on, is real.
    Same narrow mapInPandas shape as the GIF/WAV/JPEG paths."""
    import pandas as pd

    from ..operators.mp4 import encode_mp4, extract_samples, parse_mp4

    docs = (
        load_table(spark, sf_dir, "documents")
        .where(F.col("doc_id") <= 150)
        .select("doc_id", "text")
    )

    def _roundtrip(batches):
        for pdf in batches:
            rows = []
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                samples = [
                    text[k * VID_CHUNK : (k + 1) * VID_CHUNK]
                    .ljust(VID_CHUNK, "?")
                    .encode("ascii", "replace")
                    for k in range(VID_FRAMES)
                ]
                payload = encode_mp4(samples, 160, 120, samples_per_chunk=2)
                (track,) = parse_mp4(payload)["tracks"]
                got = extract_samples(payload, track, every_n=2)
                for k, sample in zip(range(0, VID_FRAMES, 2), got):
                    rows.append(
                        (int(doc_id), k, VID_FRAMES, len(sample), sum(sample))
                    )
            yield pd.DataFrame(
                rows,
                columns=[
                    "media_id",
                    "frame_idx",
                    "n_frames",
                    "sample_bytes",
                    "byte_sum",
                ],
            )

    return (
        spread(docs)
        .mapInPandas(
            _roundtrip,
            "media_id long, frame_idx int, n_frames int, sample_bytes int, "
            "byte_sum long",
        )
        .orderBy("media_id", "frame_idx")
    )


# aHash resample geometry for the JPG_BY x JPG_BX block grid (32x48 px):
# nearest-neighbor 8x8 resample of a block-constant image picks block
# (row*H//8//8, col*W//8//8) — precomputed index lists both engines share.
AH_R = [(i * (JPG_BY * 8) // 8) // 8 for i in range(8)]
AH_C = [(j * (JPG_BX * 8) // 8) // 8 for j in range(8)]


@query(
    "mm_image_ahash",
    oracle=f"""
    WITH g AS (
        SELECT doc_id,
               list_transform(range(1, {JPG_BY * JPG_BX} + 1),
                   i -> ascii(substr(rpad(substr(text, 1, {JPG_BY * JPG_BX}),
                                          {JPG_BY * JPG_BX}, '?'),
                                     CAST(i AS INT), 1))) AS px
        FROM documents WHERE doc_id <= 150),
    r AS (
        SELECT doc_id,
               [{", ".join(f"px[{r * JPG_BX + c + 1}]" for r in AH_R for c in AH_C)}] AS rs
        FROM g),
    m AS (
        SELECT doc_id, rs,
               CAST(list_sum(rs) AS DOUBLE) / 64 AS mu
        FROM r)
    SELECT doc_id,
           printf('%08x%08x',
               CAST(list_sum(list_transform(range(1, 33),
                   i -> CASE WHEN rs[CAST(i AS INT)] > mu
                        THEN 2 ** (32 - i) ELSE 0 END)) AS BIGINT),
               CAST(list_sum(list_transform(range(33, 65),
                   i -> CASE WHEN rs[CAST(i AS INT)] > mu
                        THEN 2 ** (64 - i) ELSE 0 END)) AS BIGINT)) AS ahash,
           CAST(len(list_filter(rs, x -> x > mu)) AS BIGINT) AS n_bright
    FROM m ORDER BY doc_id
    """,
)
def mm_image_ahash(spark, sf_dir):
    """Perceptual image hash (aHash) through the REAL codec path: encode a
    block-constant grayscale JPEG per document, decode it with the full
    Huffman/IDCT pipeline, nearest-resample to 8x8, threshold against the
    mean — the near-duplicate fingerprint image dedup runs at scale.

    The block-constant construction keeps the lossy codec pixel-exact
    (see mm_jpeg_roundtrip_stats), and nearest-neighbor resampling of a
    block-constant image reduces to index picks both engines share, so
    the DuckDB oracle recomputes the exact 64-bit hash from the text
    bytes — any codec, resize or thresholding drift breaks the hex
    match.  Narrow mapInPandas; payloads never shuffle."""
    import pandas as pd

    from ..operators.jpeg import decode_jpeg, encode_jpeg

    docs = (
        load_table(spark, sf_dir, "documents")
        .where(F.col("doc_id") <= 150)
        .select("doc_id", "text")
    )
    n_blocks = JPG_BY * JPG_BX

    def _ahash(batches):
        import numpy as np

        for pdf in batches:
            rows = []
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                chunk = text[:n_blocks].ljust(n_blocks, "?")
                grid = np.frombuffer(
                    chunk.encode("ascii", "replace"), dtype=np.uint8
                ).reshape(JPG_BY, JPG_BX)
                img = np.repeat(np.repeat(grid, 8, axis=0), 8, axis=1)
                decoded = decode_jpeg(encode_jpeg(img, quality=90))[:, :, 0]
                h0, w0 = decoded.shape
                ys = (np.arange(8) * h0 // 8).clip(0, h0 - 1)
                xs = (np.arange(8) * w0 // 8).clip(0, w0 - 1)
                rs = decoded[ys][:, xs].astype(np.float64)
                mu = rs.mean()
                bits = (rs > mu).flatten()
                val = 0
                for b in bits:
                    val = (val << 1) | int(b)
                rows.append((int(doc_id), format(val, "016x"), int(bits.sum())))
            yield pd.DataFrame(rows, columns=["doc_id", "ahash", "n_bright"])

    return (
        spread(docs)
        .mapInPandas(_ahash, "doc_id long, ahash string, n_bright long")
        .orderBy("doc_id")
    )


# WAV spectral geometry: 2000 samples at 8 kHz -> rfft bin width 4 Hz;
# synthesized tones are multiples of 100 Hz, so every tone sits exactly
# on a bin (zero spectral leakage) and the argmax bin is analytic.
WAV_N, WAV_RATE = 2000, 8000


@query(
    "mm_wav_dominant_freq",
    oracle=f"""
    SELECT doc_id,
           {WAV_N} AS n_samples,
           CAST(100 + (doc_id % 20) * 200 AS BIGINT) AS dominant_hz
    FROM documents WHERE doc_id <= 150 ORDER BY doc_id
    """,
)
def mm_wav_dominant_freq(spark, sf_dir):
    """REAL audio DSP under an oracle: synthesize a pure tone per document
    (frequency derived from doc_id), round-trip it through the RIFF/PCM
    codec (operators/codecs.py), run an actual FFT on the decoded
    samples, and report the dominant frequency.  The tone frequencies are
    exact multiples of the rfft bin width, so the argmax bin is analytic
    — the oracle predicts the recovered frequency without running a
    transform, and any codec, sample-scaling or FFT-indexing bug shifts
    the peak and breaks the match.  Same narrow Arrow-batched shape as
    the other media paths; at scale the FFT is embarrassingly parallel
    per payload."""
    import pandas as pd

    from ..operators.codecs import decode_wav, encode_wav

    docs = (
        load_table(spark, sf_dir, "documents")
        .where(F.col("doc_id") <= 150)
        .select("doc_id")
    )

    def _spectral(batches):
        import numpy as np

        t = np.arange(WAV_N) / WAV_RATE
        for pdf in batches:
            rows = []
            for doc_id in pdf["doc_id"]:
                hz = 100 + (int(doc_id) % 20) * 200
                samples = (8000 * np.sin(2 * np.pi * hz * t)).astype(np.int16)
                wav = decode_wav(encode_wav(samples, WAV_RATE))
                mono = wav["samples"].reshape(-1).astype(np.float64)
                spectrum = np.abs(np.fft.rfft(mono))
                spectrum[0] = 0.0  # ignore DC
                peak_bin = int(np.argmax(spectrum))
                dominant = peak_bin * WAV_RATE // WAV_N
                rows.append((int(doc_id), len(mono), dominant))
            yield pd.DataFrame(
                rows, columns=["doc_id", "n_samples", "dominant_hz"]
            )

    return (
        spread(docs)
        .mapInPandas(_spectral, "doc_id long, n_samples int, dominant_hz long")
        .orderBy("doc_id")
    )


@query(
    "mm_mp3_id3_tags",
    oracle="""
    SELECT doc_id AS media_id,
           substr(text, 1, 24) AS title,
           'src-' || source AS artist,
           CAST(1970 + doc_id % 55 AS VARCHAR) AS date,
           '2.4' AS id3_version
    FROM documents WHERE doc_id <= 150 ORDER BY media_id
    """,
)
def mm_mp3_id3_tags(spark, sf_dir):
    """ID3v2 metadata extraction end-to-end: each document becomes an
    MP3 whose ID3v2.4 tag carries a title (text prefix, full UTF-8
    path), artist (source) and year; the tag is then parsed back through
    the real syncsafe frame walk (operators/mp3.py:parse_id3v2).  The
    oracle recomputes every field from the table — an encoding, size or
    frame-walk bug breaks the match.  This is the audio-curation
    group-by surface (artist/year dedup and licensing filters run on
    exactly these tags).  Narrow mapInPandas, one row per file."""
    import pandas as pd

    from ..operators.mp3 import encode_mpeg_audio, make_id3v2, parse_id3v2

    docs = (
        load_table(spark, sf_dir, "documents")
        .where(F.col("doc_id") <= 150)
        .select("doc_id", "source", "text")
    )

    def _roundtrip(batches):
        for pdf in batches:
            rows = []
            for doc_id, source, text in zip(
                pdf["doc_id"], pdf["source"], pdf["text"]
            ):
                tag = make_id3v2(
                    {
                        "title": text[:24],
                        "artist": f"src-{source}",
                        "date": str(1970 + int(doc_id) % 55),
                    },
                    version=4,
                )
                payload = encode_mpeg_audio(
                    [b"\x00" * 100] * 2, bitrate_kbps=128,
                    id3v2_payload=tag,
                )
                meta = parse_id3v2(payload)
                rows.append(
                    (
                        int(doc_id),
                        meta["title"],
                        meta["artist"],
                        meta["date"],
                        meta["id3_version"],
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=["media_id", "title", "artist", "date", "id3_version"],
            )

    return (
        spread(docs)
        .mapInPandas(
            _roundtrip,
            "media_id long, title string, artist string, date string, "
            "id3_version string",
        )
        .orderBy("media_id")
    )


@query(
    "mm_mp3_demux_stats",
    oracle="""
    WITH p AS (
        SELECT doc_id, text,
               ([64, 96, 128, 160, 192, 256, 320])[CAST(doc_id % 7 AS INT) + 1] AS br
        FROM documents WHERE doc_id <= 150),
    q AS (SELECT doc_id, text, br,
                 144 * br * 1000 // 44100 - 4 AS psz
          FROM p),
    f AS (
        SELECT doc_id, br, psz, k,
               rpad(substr(text, CAST(k * psz + 1 AS INT), CAST(psz AS INT)),
                    CAST(psz AS INT), '?') AS chunk
        FROM q, UNNEST(range(0, 8)) AS t(k) WHERE CAST(k AS INT) % 2 = 0)
    SELECT doc_id AS media_id, CAST(k AS INT) AS frame_idx,
           8 AS n_frames, CAST(br AS INT) AS bitrate_kbps,
           CAST(psz AS INT) AS payload_bytes,
           CAST(8 * 1152 * 1000 // 44100 AS INT) AS duration_ms,
           CAST(list_sum(list_transform(range(1, CAST(psz AS INT) + 1),
               i -> ascii(substr(chunk, CAST(i AS INT), 1)))) AS BIGINT) AS byte_sum
    FROM f ORDER BY media_id, frame_idx
    """,
)
def mm_mp3_demux_stats(spark, sf_dir):
    """REAL-framing MP3 query: per document, 8 frame payloads (text
    chunks sized to the frame capacity of a per-doc bitrate) are encoded
    into an MPEG1 Layer III stream behind an ID3v2 tag
    (operators/mp3.py), then every-2nd frame comes back through the real
    demux path — ID3 skip, per-frame header decode, exact frame-length
    arithmetic — reporting bitrate, payload size, stream duration and
    byte sums.  A framing bug on either side breaks the oracle match.
    PCM decode of real audio bitstreams stays honestly out of scope (no
    DSP codec library in the container); the framing layer, the part an
    audio pipeline shards and seeks on, is real.  Narrow mapInPandas,
    payloads never shuffle — same scale shape as the other media paths."""
    import pandas as pd

    from ..operators.mp3 import encode_mpeg_audio, extract_frame_payloads, parse_mpeg_audio

    _BRS = [64, 96, 128, 160, 192, 256, 320]
    docs = (
        load_table(spark, sf_dir, "documents")
        .where(F.col("doc_id") <= 150)
        .select("doc_id", "text")
    )

    def _roundtrip(batches):
        for pdf in batches:
            rows = []
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                br = _BRS[int(doc_id) % 7]
                psz = 144 * br * 1000 // 44100 - 4
                bodies = [
                    text[k * psz : (k + 1) * psz]
                    .ljust(psz, "?")
                    .encode("ascii", "replace")
                    for k in range(8)
                ]
                payload = encode_mpeg_audio(
                    bodies, bitrate_kbps=br, id3v2_payload=b"synthetic-tag"
                )
                info = parse_mpeg_audio(payload)
                if info["is_vbr"] or info["n_frames"] != 8:
                    raise AssertionError("mp3 roundtrip framing drift")
                for k, body in zip(
                    range(0, 8, 2), extract_frame_payloads(payload, every_n=2)
                ):
                    rows.append(
                        (
                            int(doc_id),
                            k,
                            8,
                            info["bitrate_kbps"],
                            len(body),
                            info["duration_ms"],
                            sum(body),
                        )
                    )
            yield pd.DataFrame(
                rows,
                columns=[
                    "media_id",
                    "frame_idx",
                    "n_frames",
                    "bitrate_kbps",
                    "payload_bytes",
                    "duration_ms",
                    "byte_sum",
                ],
            )

    return (
        spread(docs)
        .mapInPandas(
            _roundtrip,
            "media_id long, frame_idx int, n_frames int, bitrate_kbps int, "
            "payload_bytes int, duration_ms int, byte_sum long",
        )
        .orderBy("media_id", "frame_idx")
    )

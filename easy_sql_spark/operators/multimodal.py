"""Multimodal (image/audio/video) column handling.

Design for 100 TB of media: the payload is an opaque ``binary`` column with
typed metadata alongside; all per-item compute runs in Arrow-batched Pandas
UDFs over ``mapInPandas`` so bytes never round-trip row-at-a-time through
Python pickling.  Partitioning stays whatever the scan gives (narrow maps);
nothing here shuffles.

Codec status: ``decode=real`` genuinely decodes images (PIL when
importable, else numpy-only PNG/BMP parsers in operators/codecs.py) and
PCM WAV audio (RIFF parse, per-channel samples); video and compressed
audio raise NotImplementedError (no ffmpeg in this container).
``decode=fake`` produces a deterministic fake decode from the byte
content so the Arrow plumbing is testable without any codec.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("kind", T.StringType()),  # image | audio | video
        T.StructField("payload", T.BinaryType()),
        T.StructField("mime", T.StringType()),
        T.StructField("meta", T.MapType(T.StringType(), T.StringType())),
    ]
)

DECODED_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("kind", T.StringType()),
        T.StructField("n_bytes", T.IntegerType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("byte_histogram", T.ArrayType(T.IntegerType())),
    ]
)


def synth_media_df(spark, docs: DataFrame, kind: str = "image") -> DataFrame:
    """Derive a deterministic fake media table from the documents fixture
    (payload = utf-8 text bytes) — stands in for a real binary scan."""
    return docs.select(
        F.col("doc_id").alias("media_id"),
        F.lit(kind).alias("kind"),
        F.encode("text", "utf-8").alias("payload"),
        F.lit(f"{kind}/x-fake").alias("mime"),
        F.create_map(F.lit("source"), F.col("source")).alias("meta"),
    )


def decode_media(df: DataFrame, mode: str = "fake") -> DataFrame:
    """Decode / feature-extract media payloads via mapInPandas.

    ``mode="real"`` decodes image payloads for real: PIL when importable,
    else the numpy-only PNG/BMP/GIF/JPEG codecs (operators/codecs.py,
    operators/jpeg.py) — actual pixel dimensions, 16-bin histogram over
    decoded pixel bytes.  Compressed audio and MP4-class video stay
    NotImplemented (no ffmpeg in this container); PCM WAV decodes for
    real.
    ``mode="fake"`` derives width/height and the histogram
    deterministically from the raw payload, so the full Arrow batch path
    (schema, iteration, memory shape) is exercised without any codec.
    """
    if mode == "real":

        def _real(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            from .codecs import decode_image, decode_wav

            for pdf in batches:
                rows = []
                for mid, kind, payload in zip(
                    pdf["media_id"], pdf["kind"], pdf["payload"]
                ):
                    payload = bytes(payload)
                    if kind == "image":
                        img = decode_image(payload)
                        h, w = img.shape[0], img.shape[1]
                        rows.append(
                            (mid, kind, len(payload), w, h, _hist16(img.tobytes()))
                        )
                    elif kind == "audio":
                        # width/height carry rate/frames for audio rows;
                        # histogram is over the raw sample bytes
                        wav = decode_wav(payload)
                        rows.append(
                            (
                                mid,
                                kind,
                                len(payload),
                                int(wav["sample_rate"]),
                                int(wav["n_frames"]),
                                _hist16(wav["samples"].tobytes()),
                            )
                        )
                    else:
                        raise NotImplementedError(
                            f"real decode of kind={kind!r} requires ffmpeg "
                            "(not in container); images and PCM WAV decode "
                            "for real"
                        )
                yield pd.DataFrame(
                    rows, columns=[f.name for f in DECODED_SCHEMA.fields]
                )

        return df.mapInPandas(_real, DECODED_SCHEMA)

    def _fake(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = pdf["payload"]
            n_bytes = payloads.map(len)
            out = pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": n_bytes.astype("int32"),
                    # fake "dimensions": derived from content length
                    "width": (n_bytes % 640 + 1).astype("int32"),
                    "height": (n_bytes % 480 + 1).astype("int32"),
                    "byte_histogram": [
                        _hist16(p) for p in payloads
                    ],
                }
            )
            yield out

    return df.mapInPandas(_fake, DECODED_SCHEMA)


def _hist16(payload: bytes) -> list[int]:
    # vectorized: high nibble of every byte, counted in one bincount pass —
    # keeps the decode stage Arrow/NumPy-speed at real media payload sizes
    nib = np.frombuffer(payload, dtype=np.uint8) >> 4
    return np.bincount(nib, minlength=16).astype(np.int64).tolist()


def resize_stub(df: DataFrame, width: int, height: int) -> DataFrame:
    """Resize plumbing: at scale this is another mapInPandas stage over the
    payload; stubbed to re-tag metadata (codec unavailable)."""
    return df.withColumn(
        "meta",
        F.map_concat(
            "meta",
            F.create_map(
                F.lit("resized_to"), F.lit(f"{width}x{height}")
            ),
        ),
    )


def resize_images(df: DataFrame, width: int, height: int) -> DataFrame:
    """REAL image resize: decode (PNG/BMP via the numpy codecs, PIL when
    importable), nearest-neighbor resample with pure index arithmetic,
    re-encode as PNG.  Payloads stay inside the Arrow batch; the output
    schema matches the input (payload replaced, mime -> image/png, meta
    tagged) so resize stages compose with decode/feature stages.

    Nearest-neighbor is the right default for a data pipeline (no new
    pixel values, so downstream dedup/fingerprint hashes stay within the
    source palette); bilinear belongs in the model's own preprocessing."""
    import numpy as np

    out_schema = df.schema

    def _resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from .codecs import decode_image, encode_png

        for pdf in batches:
            payloads, mimes, metas = [], [], []
            for kind, payload, meta in zip(
                pdf["kind"], pdf["payload"], pdf["meta"]
            ):
                if kind != "image":
                    raise NotImplementedError(
                        f"resize of kind={kind!r} requires ffmpeg"
                    )
                img = decode_image(bytes(payload))
                h0, w0 = img.shape[0], img.shape[1]
                ys = (np.arange(height) * h0 // height).clip(0, h0 - 1)
                xs = (np.arange(width) * w0 // width).clip(0, w0 - 1)
                resized = img[ys][:, xs]
                payloads.append(bytearray(encode_png(resized)))
                mimes.append("image/png")
                meta = dict(meta or {})
                meta["resized_from"] = f"{w0}x{h0}"
                meta["resized_to"] = f"{width}x{height}"
                metas.append(meta)
            out = pdf.copy()
            out["payload"] = payloads
            out["mime"] = mimes
            out["meta"] = metas
            yield out

    return df.mapInPandas(_resize, out_schema)


FRAME_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("frame_idx", T.IntegerType()),
        T.StructField("n_frames", T.IntegerType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("byte_histogram", T.ArrayType(T.IntegerType())),
    ]
)


def frame_sample_real(df: DataFrame, every_n: int) -> DataFrame:
    """REAL frame sampling for animated-GIF and MP4 payloads.

    GIF: full container parse + LZW pixel decode (operators/codecs.py) —
    per-frame dimensions and a 16-bin histogram over DECODED pixels.
    MP4: full ISO-BMFF demux (operators/mp4.py) — exact per-sample byte
    ranges out of mdat; dimensions come from the track header and the
    histogram is over the sample's codec bitstream BYTES (decoding the
    bitstream itself honestly needs ffmpeg).  One row per sampled frame,
    the explode shape video pipelines use; other containers raise."""

    def _frames(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from .codecs import decode_gif_frames
        from .mp4 import extract_samples, parse_mp4

        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                payload = bytes(payload)
                if payload[4:8] == b"ftyp":
                    info = parse_mp4(payload)
                    vids = [
                        t for t in info["tracks"] if t.get("type") == "video"
                    ]
                    if not vids:
                        raise NotImplementedError(
                            "MP4 payload has no video track"
                        )
                    t = vids[0]
                    n = t["n_samples"]
                    for i, sample in zip(
                        range(0, n, every_n),
                        extract_samples(payload, t, every_n),
                    ):
                        rows.append(
                            (
                                int(mid),
                                i,
                                n,
                                t.get("width", 0),
                                t.get("height", 0),
                                _hist16(sample),
                            )
                        )
                    continue
                frames = decode_gif_frames(payload)
                for i in range(0, len(frames), every_n):
                    f = frames[i]
                    rows.append(
                        (
                            int(mid),
                            i,
                            len(frames),
                            f.shape[1],
                            f.shape[0],
                            _hist16(f.tobytes()),
                        )
                    )
            yield pd.DataFrame(
                rows, columns=[f.name for f in FRAME_SCHEMA.fields]
            )

    return df.select("media_id", "payload").mapInPandas(_frames, FRAME_SCHEMA)


def frame_sample_stub(df: DataFrame, every_n: int) -> DataFrame:
    """Video frame-sampling plumbing: produces one row per sampled frame
    index (explode is the real shape; frame extraction itself is stubbed)."""
    return df.select(
        "media_id",
        "kind",
        F.explode(
            F.sequence(F.lit(0), F.lit(max(every_n * 3 - 1, 0)), F.lit(every_n))
        ).alias("frame_idx"),
        "payload",
    )

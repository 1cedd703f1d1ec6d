"""Multimodal column plumbing: opaque binary payloads + typed metadata,
decode / feature-extract / frame-sample as Arrow-batched mapInPandas stages.

North-star operators. The container has no image/audio codecs, so the DECODE
step is stubbed (deterministic fake features derived from the payload bytes,
or ``NotImplementedError`` in strict mode) — everything Spark-side is real:
the schema contract, the mapInPandas batch shape, the partition sizing, and
the write path. Swapping the stub for PIL/ffmpeg changes one inner function.

Scale notes: binary payloads dominate row size, so (1) keep metadata in
separate columns to let metadata-only queries prune the payload column at the
parquet reader, (2) size ``spark.sql.files.maxPartitionBytes`` so a partition
of payloads fits executor memory, (3) never collect payloads to the driver.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_SCHEMA = (
    "media_id bigint, payload binary, media_type string, "
    "meta struct<n_bytes: bigint, declared_w: int, declared_h: int>"
)

FEATURE_SCHEMA = "media_id bigint, media_type string, width int, height int, n_bytes bigint, checksum string"


def documents_as_media(documents: DataFrame) -> DataFrame:
    """Fixture adapter: wrap document text bytes as a fake media payload with
    typed metadata — exercises the real multimodal schema over the driver's
    parquet tables without needing codec libraries."""
    payload = F.encode(F.col("text"), "utf-8")
    return documents.select(
        F.col("doc_id").alias("media_id"),
        payload.alias("payload"),
        F.lit("text/fake-image").alias("media_type"),
        F.struct(
            F.length(payload).cast("bigint").alias("n_bytes"),
            F.lit(64).alias("declared_w"),
            F.lit(64).alias("declared_h"),
        ).alias("meta"),
    )


def _fake_decode(payload: bytes) -> tuple[int, int]:
    """STUB for the codec call (no image libs in this container).

    Deterministic pseudo-dimensions from payload bytes; replace with
    ``PIL.Image.open(io.BytesIO(payload)).size`` when codecs are available.
    """
    if payload is None:
        raise NotImplementedError("real decode requires an image codec library")
    h = 0
    for b in payload[:64]:
        h = (h * 131 + b) & 0x7FFFFFFF
    return 16 + h % 1024, 16 + (h >> 10) % 1024


def extract_media_features(media: DataFrame, batch_size_hint: int = 256) -> DataFrame:
    """Decode + feature-extract via mapInPandas (Arrow-batched).

    mapInPandas (not a scalar pandas_udf) because decode is one-row-in,
    one-row-out-with-different-schema and benefits from batch-level reuse of
    codec state. Batches arrive as pandas DataFrames; per-batch loop is over
    the Arrow batch, not sent row-by-row through Python.
    """

    def decode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        for pdf in batches:
            widths, heights, checks = [], [], []
            for payload in pdf["payload"]:
                w, h = _fake_decode(bytes(payload))
                widths.append(w)
                heights.append(h)
                checks.append(hashlib.md5(bytes(payload)).hexdigest())
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "media_type": pdf["media_type"],
                    "width": pd.array(widths, dtype="int32"),
                    "height": pd.array(heights, dtype="int32"),
                    "n_bytes": [m["n_bytes"] for m in pdf["meta"]],
                    "checksum": checks,
                }
            )

    return media.mapInPandas(decode_batches, schema=FEATURE_SCHEMA)


def resize_media(media: DataFrame, target_w: int = 32, target_h: int = 32) -> DataFrame:
    """Resize plumbing via mapInPandas: payload → (deterministically) resized
    payload + updated dims.

    The pixel resample itself is STUBBED (no codec libs in this container):
    the fake "resize" takes an evenly-strided byte subsample of the payload
    sized target_w*target_h, which preserves the real contract — output
    payload size is a function of target dims, not input size, so downstream
    partition-size math holds. Swap the inner function for a real
    PIL ``Image.resize`` when codecs exist.
    """
    out_schema = "media_id bigint, payload binary, width int, height int, n_bytes bigint"
    n_out = target_w * target_h

    def resize_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            resized = []
            for payload in pdf["payload"]:
                b = bytes(payload)
                if len(b) <= n_out:
                    resized.append(b)
                else:
                    stride = len(b) / n_out
                    resized.append(bytes(b[int(i * stride)] for i in range(n_out)))
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "payload": resized,
                    "width": pd.array([target_w] * len(pdf), dtype="int32"),
                    "height": pd.array([target_h] * len(pdf), dtype="int32"),
                    "n_bytes": pd.array([len(r) for r in resized], dtype="int64"),
                }
            )

    return media.mapInPandas(resize_batches, schema=out_schema)


def frame_sample(media: DataFrame, every_n_bytes: int = 32, max_frames: int = 8) -> DataFrame:
    """Frame-sampling plumbing: explode a payload into up to ``max_frames``
    fixed-stride byte slices ("frames"). Real video sampling would decode
    keyframes; the partitioning/explode mechanics are identical.
    """
    frame_idx = F.sequence(F.lit(0), F.lit(max_frames - 1))
    exploded = media.select(
        "media_id",
        F.col("meta.n_bytes").alias("n_bytes"),
        F.explode(frame_idx).alias("frame_no"),
        "payload",
    ).filter(F.col("frame_no") * every_n_bytes < F.col("n_bytes"))
    return exploded.select(
        "media_id",
        "frame_no",
        F.substring(
            F.col("payload"), F.col("frame_no") * every_n_bytes + 1, every_n_bytes
        ).alias("frame_bytes"),
    )

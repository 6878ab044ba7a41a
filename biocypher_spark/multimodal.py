"""Multimodal columns: images / audio / video as opaque binary + metadata.

Large-scale training pipelines carry media as ``binary`` columns with typed
metadata structs. This module provides the Spark-side plumbing — schemas,
size-balanced partitioning, Arrow-batched ``mapInPandas`` transforms with
real batch shapes — with the *codec* step stubbed behind a deterministic
fake (the sandbox has no image/audio libraries): ``decode_image`` produces
a deterministic pseudo-pixel array from the bytes so the full pipeline is
testable end-to-end, and raises ``NotImplementedError`` when a real codec
is requested.

Every transform keeps lineage columns intact and returns one row per input
row (or per sampled frame), so the operators compose with the dedup /
similarity stages (e.g. embedding-cosine near-dup over image features).
"""

from __future__ import annotations

import hashlib
import zlib
from typing import Iterator, Optional

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.StringType()),
        T.StructField("kind", T.StringType()),  # image | audio | video
        T.StructField("content", T.BinaryType()),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("format", T.StringType()),
                    T.StructField("width", T.IntegerType()),
                    T.StructField("height", T.IntegerType()),
                    T.StructField("duration_ms", T.IntegerType()),
                    T.StructField("sample_rate", T.IntegerType()),
                ]
            ),
        ),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.StringType()),
        T.StructField("kind", T.StringType()),
        T.StructField("feature", T.ArrayType(T.FloatType())),
        T.StructField("n_bytes", T.IntegerType()),
        T.StructField("content_sha", T.StringType()),
    ]
)

FRAME_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.StringType()),
        T.StructField("frame_idx", T.IntegerType()),
        T.StructField("frame_ms", T.IntegerType()),
        T.StructField("frame_sha", T.StringType()),
    ]
)

FEATURE_DIM = 16


def synthesize_media(spark: SparkSession, n: int, kind: str = "image") -> DataFrame:
    """Deterministic fake media table (content = compressed seeded bytes)."""
    rows = []
    for i in range(n):
        payload = zlib.compress((f"{kind}-{i}-" * 32).encode())
        rows.append(
            (
                f"{kind[0]}{i}",
                kind,
                bytearray(payload),
                (f"fake/{kind}", 64, 64, 4000 if kind != "image" else None, 16000 if kind == "audio" else None),
            )
        )
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def _fake_decode(content: bytes) -> np.ndarray:
    """Deterministic stand-in for a codec: bytes -> pseudo-pixel vector.

    Real decode (PIL / libsndfile / ffmpeg) is not available in this
    container; the sha-seeded vector keeps the downstream feature pipeline
    deterministic and testable. Swap this single function for the real
    codec in production.
    """
    digest = hashlib.sha256(bytes(content)).digest()
    arr = np.frombuffer(digest, dtype=np.uint8).astype(np.float32)
    return (arr[:FEATURE_DIM] / 255.0).astype(np.float32)


def decode_image(content: bytes, format: Optional[str] = None) -> np.ndarray:
    if format is not None and not str(format).startswith("fake/"):
        raise NotImplementedError(
            f"real codec for format {format!r} is not available in this environment; "
            "plug a decoder in here (PIL.Image.open / soundfile / av)."
        )
    return _fake_decode(content)


def extract_features(media: DataFrame, batch_hint: int = 1024) -> DataFrame:
    """Arrow-batched feature extraction over size-balanced partitions.

    Partitions are rebalanced by content size so one partition of large
    videos does not straggle. The per-batch work is vectorized over the
    batch (single numpy stack per Arrow batch).
    """
    sized = media.withColumn("_sz", F.length("content"))
    n = media.sparkSession.sparkContext.defaultParallelism * 2
    balanced = sized.repartitionByRange(n, F.col("_sz"), F.col("media_id")).drop("_sz")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            feats = [decode_image(c, m["format"] if m else None) for c, m in zip(pdf["content"], pdf["meta"])]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "feature": [f.tolist() for f in feats],
                    "n_bytes": pdf["content"].map(len).astype("int32"),
                    "content_sha": pdf["content"].map(lambda b: hashlib.sha256(bytes(b)).hexdigest()),
                }
            )

    return balanced.mapInPandas(run, FEATURE_SCHEMA)


def sample_frames(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Frame sampling for video/audio rows: one output row per sampled
    timestamp; the frame decode itself is the stubbed codec (frame_sha is
    the deterministic stand-in for frame pixels).

    The row->frames expansion is vectorized inside each Arrow batch
    (repeat/cumsum index arithmetic, no ``iterrows``); only the stub codec
    hash itself runs per frame, exactly like a real decoder would.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            durations = np.array(
                [int((m["duration_ms"] or 0) if m else 0) for m in pdf["meta"]], dtype=np.int64
            )
            counts = np.maximum(durations, 0) // every_ms + (np.maximum(durations, 0) % every_ms > 0)
            total = int(counts.sum())
            if total == 0:
                continue
            row_idx = np.repeat(np.arange(len(pdf)), counts)
            offsets = np.repeat(np.cumsum(counts) - counts, counts)
            frame_idx = (np.arange(total) - offsets).astype(np.int32)
            frame_ms = (frame_idx.astype(np.int64) * every_ms).astype(np.int32)
            contents = pdf["content"].to_numpy()
            # stub codec: frame hash = sha256(content || '|' || ms) — the
            # ASCII suffix keeps it replicable in engines whose sha256 is
            # string-typed (oracle parity)
            shas = [
                hashlib.sha256(bytes(contents[i]) + b"|" + str(int(ms)).encode()).hexdigest()
                for i, ms in zip(row_idx, frame_ms)
            ]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"].to_numpy()[row_idx],
                    "frame_idx": frame_idx,
                    "frame_ms": frame_ms,
                    "frame_sha": shas,
                }
            )

    return media.filter(F.col("kind").isin("video", "audio")).mapInPandas(run, FRAME_SCHEMA)


def media_from_documents(docs: DataFrame, kind: str = "image") -> DataFrame:
    """Bridge: treat document text bytes as opaque media content so the
    multimodal plumbing can be exercised (and DuckDB-oracled) over the
    standard testdata. duration_ms derives deterministically from n_chars."""
    duration = (
        (F.col("n_chars") % 5).cast("int") * 1000 if kind in ("video", "audio") else F.lit(None).cast("int")
    )
    return docs.select(
        F.concat(F.lit("m"), F.col("doc_id").cast("string")).alias("media_id"),
        F.lit(kind).alias("kind"),
        F.col("text").cast("binary").alias("content"),
        F.struct(
            F.lit(f"fake/{kind}").alias("format"),
            F.lit(None).cast("int").alias("width"),
            F.lit(None).cast("int").alias("height"),
            duration.alias("duration_ms"),
            (F.lit(16000) if kind == "audio" else F.lit(None)).cast("int").alias("sample_rate"),
        ).alias("meta"),
    )


RESIZED_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.StringType()),
        T.StructField("kind", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("thumb", T.ArrayType(T.IntegerType())),
    ]
)


def resize_media(media: DataFrame, width: int = 4, height: int = 4) -> DataFrame:
    """Resize plumbing: Arrow-batched ``mapInPandas`` producing a
    width×height thumbnail per row. The pixel decode is the deterministic
    stub codec (sha256-derived bytes, max 32 px); swap ``_thumb_bytes`` for
    a real resampler (PIL ``Image.resize``) in production — the Spark-side
    shape (schema, batching, one row per input) is the real contract."""
    dim = min(width * height, 32)

    def _thumb_bytes(content: bytes) -> list[int]:
        digest = hashlib.sha256(bytes(content)).digest()
        return [int(b) for b in digest[:dim]]

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "width": width,
                    "height": height,
                    "thumb": [_thumb_bytes(c) for c in pdf["content"]],
                }
            )

    return media.mapInPandas(run, RESIZED_SCHEMA)


def media_near_dup(media: DataFrame) -> DataFrame:
    """Exact content dedup by sha + feature-space near-dup via the shared
    similarity operators (composes with similarity.embedding_near_dup)."""
    feats = extract_features(media)
    exact = feats.groupBy("content_sha").agg(
        F.min("media_id").alias("rep_id"), F.count(F.lit(1)).alias("n")
    )
    return exact

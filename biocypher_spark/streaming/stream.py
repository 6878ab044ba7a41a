"""Structured Streaming surface: incremental KG construction.

The reference is strictly batch (single-process generators; SURVEY.md §2.6
notes streaming is a design choice, not a compatibility requirement). This
module adds the Spark-native incremental path: a transcripts directory/table
consumed with ``readStream``, mention extraction as the same built-in
expressions used in batch, watermarked windowed mention counts for late
data, and a stateful per-conversation session aggregator via
``applyInPandasWithState``.
"""

from __future__ import annotations

from typing import Iterator, Optional

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from ..extract import DEFAULT_PATTERNS

TRANSCRIPT_SCHEMA = T.StructType(
    [
        T.StructField("conv_id", T.StringType()),
        T.StructField("turn_idx", T.IntegerType()),
        T.StructField("role", T.StringType()),
        T.StructField("text", T.StringType()),
        T.StructField("tool", T.StringType()),
        T.StructField("ts", T.TimestampType()),
    ]
)


def read_transcript_stream(spark: SparkSession, path: str, max_files_per_trigger: int = 8) -> DataFrame:
    return (
        spark.readStream.schema(TRANSCRIPT_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(path)
    )


def stream_mentions(transcripts: DataFrame, patterns: Optional[dict[str, str]] = None) -> DataFrame:
    """Streaming mention extraction keeping the event time column."""
    patterns = patterns or DEFAULT_PATTERNS
    per_label = []
    for label, pat in patterns.items():
        hits = F.regexp_extract_all(F.col("text"), F.lit(pat), F.lit(0))
        per_label.append(
            transcripts.select(
                "conv_id",
                "turn_idx",
                "ts",
                F.lit(label).alias("input_label"),
                F.explode(hits).alias("surface"),
            )
        )
    out = per_label[0]
    for other in per_label[1:]:
        out = out.unionByName(other)
    return out


def windowed_mention_counts(
    mentions: DataFrame,
    window: str = "10 minutes",
    watermark: str = "30 minutes",
) -> DataFrame:
    """Watermarked tumbling-window counts per entity surface (late rows
    beyond the watermark are dropped, state is bounded)."""
    return (
        mentions.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("win"), "input_label", "surface")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            F.col("win.start").alias("win_start"),
            "input_label",
            "surface",
            "n",
        )
    )


_SESSION_SCHEMA = "conv_id string, turns bigint, mentions bigint, first_ts timestamp, last_ts timestamp"
_STATE_SCHEMA = "turns bigint, mentions bigint, first_ts timestamp, last_ts timestamp"


def _session_fn(key, pdfs: Iterator[pd.DataFrame], state: GroupState) -> Iterator[pd.DataFrame]:
    turns, mentions, first_ts, last_ts = (
        state.get if state.exists else (0, 0, None, None)
    )
    for pdf in pdfs:
        turns += len(pdf)
        mentions += int(pdf["n_mentions"].sum())
        lo, hi = pdf["ts"].min(), pdf["ts"].max()
        first_ts = lo if first_ts is None or lo < first_ts else first_ts
        last_ts = hi if last_ts is None or hi > last_ts else last_ts
    state.update((turns, mentions, first_ts, last_ts))
    yield pd.DataFrame(
        [
            {
                "conv_id": key[0],
                "turns": turns,
                "mentions": mentions,
                "first_ts": first_ts,
                "last_ts": last_ts,
            }
        ]
    )


def conversation_sessions(transcripts: DataFrame, patterns: Optional[dict[str, str]] = None) -> DataFrame:
    """Stateful per-conversation aggregation (custom operator via
    ``applyInPandasWithState``): running turn count, mention count, and the
    first/last timestamps of the conversation."""
    patterns = patterns or DEFAULT_PATTERNS
    combined = "|".join(f"(?:{p})" for p in patterns.values())
    with_counts = transcripts.select(
        "conv_id",
        "ts",
        F.size(F.regexp_extract_all(F.col("text"), F.lit(combined), F.lit(0))).alias("n_mentions"),
    )
    return with_counts.groupBy("conv_id").applyInPandasWithState(
        _session_fn,
        outputStructType=_SESSION_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )

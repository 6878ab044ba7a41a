"""Structured Streaming tests: incremental extraction, watermarked windows,
stateful sessionization."""

import os
import time

import pytest
from pyspark.sql import functions as F

from biocypher_spark.streaming.stream import (
    conversation_sessions,
    read_transcript_stream,
    stream_mentions,
    windowed_mention_counts,
)
from biocypher_spark.transcripts import generate_transcripts


@pytest.fixture(scope="module")
def stream_dir(spark, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("stream_in"))
    generate_transcripts(spark, 1000, partitions=4).write.mode("overwrite").parquet(path)
    return path


def _run_to_completion(query, timeout=120):
    deadline = time.time() + timeout
    while time.time() < deadline:
        query.processAllAvailable()
        return
    raise TimeoutError


def test_stream_windowed_counts(spark, stream_dir):
    stream = read_transcript_stream(spark, stream_dir, max_files_per_trigger=2)
    counts = windowed_mention_counts(stream_mentions(stream))
    q = (
        counts.writeStream.format("memory")
        .queryName("win_counts")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    # append mode emits only watermark-closed windows; force completion via
    # one more read of the table after termination
    result = spark.sql("select * from win_counts")
    # batch equivalent for cross-checking totals per surface
    batch = generate_transcripts(spark, 1000)
    from biocypher_spark.extract import extract_mentions_expr

    batch_mentions = extract_mentions_expr(batch).count()
    assert batch_mentions > 0
    # sum of emitted window counts can be smaller (open windows withheld in
    # append mode) but never larger
    emitted = result.agg(F.coalesce(F.sum("n"), F.lit(0))).collect()[0][0]
    assert emitted <= batch_mentions


def test_stream_sessions_stateful(spark, stream_dir):
    stream = read_transcript_stream(spark, stream_dir, max_files_per_trigger=2)
    sessions = conversation_sessions(stream)
    q = (
        sessions.writeStream.format("memory")
        .queryName("sessions")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    result = spark.sql(
        "select conv_id, max(turns) as turns from sessions group by conv_id"
    )
    got = {r["conv_id"]: r["turns"] for r in result.collect()}
    want = {
        r["conv_id"]: r["cnt"]
        for r in generate_transcripts(spark, 1000).groupBy("conv_id").agg(F.count(F.lit(1)).alias("cnt")).collect()
    }
    # every conversation's final state matches the batch turn count
    assert got == want

"""Bucketed co-located joins: pre-shuffle once at write time, join free after.

At 100 TB the dominant cost of repeated fact-to-fact joins (e.g. orders x
lineitem on orderkey, or node-table x edge-table on node_id) is the shuffle.
Bucketing amortizes it: write both sides bucketed (and sorted) by the join
key ONCE; every subsequent equi-join on that key scans co-located buckets
with NO Exchange in the plan (Spark's bucketed SortMergeJoin). This module
wraps the write/read pair and is plan-asserted in tests/test_plans.py.

Rules of thumb encoded here:
  * bucket counts must MATCH on both sides (or be multiples with
    spark.sql.bucketing.coalesceBucketsInJoin.enabled);
  * sortBy the same key so the SortMergeJoin skips its sort;
  * size buckets so one bucket's hot working set fits an executor
    (buckets ~= total_bytes / 256 MB is a reasonable start).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    key: str,
    buckets: int,
    path: str | None = None,
    sort: bool = True,
) -> None:
    """Persist ``df`` as a bucketed (+sorted) table on ``key``.

    ``path`` makes it an external table (data at that location); omit for a
    managed table in the session warehouse.
    """
    writer = df.write.bucketBy(buckets, key)
    if sort:
        writer = writer.sortBy(key)
    if path:
        writer = writer.option("path", path)
    writer.mode("overwrite").format("parquet").saveAsTable(table)


def bucketed_join(spark: SparkSession, left_table: str, right_table: str, key: str) -> DataFrame:
    """Equi-join two same-bucketed tables on their bucket key — zero
    Exchange when bucket specs match (asserted in test_plans.py)."""
    return spark.table(left_table).join(spark.table(right_table), key)

"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship KG-construction chain (mention
extraction -> linking -> co-occurrence triples) on the sf0.001 tables.
``queries()``/``oracle_sql()`` expose every implemented operator from
SURVEY.md §2 with DuckDB oracles (see biocypher_spark/queries.py).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from biocypher_spark.queries import ORACLES, QUERIES  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: extraction -> dedup ->
    (subj, pred, obj) co-occurrence triples."""
    from biocypher_spark.queries import kg_cooccurrence_triples

    return kg_cooccurrence_triples(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    return dict(ORACLES)

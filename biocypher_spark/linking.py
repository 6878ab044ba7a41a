"""Entity linking + canonicalization (NEW stages; north_rule).

Pipeline: mentions -> blocked similarity join -> similarity edges ->
connected components -> canonical entity id per surface form.

  * **Blocking** avoids the quadratic all-pairs join: candidate pairs are
    generated only within a block. Two complementary block keys are used —
    the normalized surface itself (exact variants collapse for free) and a
    (first-char, digit-suffix) key so ``prot7`` and ``protein7`` meet
    without comparing every pair of mentions (set-similarity-join blocking
    in the spirit of the PAPERS.md prefix-filtering literature).
  * **Scoring** is character-bigram Jaccard computed with built-in
    array functions (no UDFs).
  * **Canonicalization** runs connected components over above-threshold
    pairs; canonical id = lexicographic min surface-normal in the cluster.

The reference has no linking stage (adapters pre-resolve ids); this module
supplies it Spark-first for transcript corpora.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .extract import normalize_surface
from .operators.components import connected_components


def _bigrams(col) -> F.Column:
    """Distinct character bigrams of a string column (built-ins only)."""
    chars = F.split(col, "")
    n = F.size(chars)
    idx = F.sequence(F.lit(0), F.greatest(n - F.lit(2), F.lit(0)))
    return F.array_distinct(
        F.filter(
            F.transform(idx, lambda i: F.concat_ws("", F.slice(chars, i + 1, 2))),
            lambda s: F.length(s) == 2,
        )
    )


def candidate_pairs(surfaces: DataFrame, key_col: str = "nkey") -> DataFrame:
    """Blocked self-join: pairs of distinct normalized surfaces that share a
    coarse block key (first alpha run + trailing digit run)."""
    blocked = surfaces.withColumn(
        "_block",
        F.concat(
            F.substring(F.regexp_extract(key_col, "^([a-z]+)", 1), 1, 1),
            F.regexp_extract(key_col, "([0-9]+)$", 1),
        ),
    )
    a = blocked.select(F.col(key_col).alias("ka"), F.col("_block"))
    b = blocked.select(F.col(key_col).alias("kb"), F.col("_block"))
    return (
        a.join(b, "_block")
        .filter(F.col("ka") < F.col("kb"))
        .select("ka", "kb")
        .distinct()
    )


def score_pairs(pairs: DataFrame, threshold: float = 0.35) -> DataFrame:
    """Character-bigram Jaccard similarity, keep pairs >= threshold."""
    scored = pairs.withColumn("_ba", _bigrams(F.col("ka"))).withColumn("_bb", _bigrams(F.col("kb")))
    inter = F.size(F.array_intersect("_ba", "_bb"))
    union = F.size(F.array_union("_ba", "_bb"))
    sim = F.when(union > 0, inter / union).otherwise(F.lit(0.0))
    return scored.withColumn("sim", F.round(sim, 6)).filter(F.col("sim") >= threshold).select("ka", "kb", "sim")


def canonicalize(mentions: DataFrame, threshold: float = 0.35, max_iter: int = 25) -> DataFrame:
    """Mentions -> (surface, nkey, canonical_id) mapping table.

    The mapping table is tiny relative to the corpus (distinct surfaces),
    so downstream joins back onto mentions broadcast it.
    """
    surfaces = mentions.select(normalize_surface(F.col("surface")).alias("nkey")).distinct()
    pairs = candidate_pairs(surfaces)
    edges = score_pairs(pairs, threshold)
    # self-loops keep singleton surfaces in the component table
    loops = surfaces.select(F.col("nkey").alias("ka"), F.col("nkey").alias("kb"), F.lit(1.0).alias("sim"))
    comp = connected_components(edges.unionByName(loops), src="ka", dst="kb", max_iter=max_iter)
    return comp.select(F.col("node").alias("nkey"), F.col("comp").alias("canonical_id"))


def link_mentions(mentions: DataFrame, threshold: float = 0.35) -> DataFrame:
    """Attach canonical ids to every mention row (broadcast join)."""
    mapping = canonicalize(mentions, threshold)
    withkey = mentions.withColumn("nkey", normalize_surface(F.col("surface")))
    return withkey.join(F.broadcast(mapping), "nkey", "left").withColumn(
        "canonical_id", F.coalesce(F.col("canonical_id"), F.col("nkey"))
    )

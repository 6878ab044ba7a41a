"""Similarity search over embedding columns (array<float>).

Brute-force cosine top-k as the exactness baseline and an LSH-bucketed
variant as the scale path. Dot products and norms are computed with
``zip_with`` + ``aggregate`` folds in double precision, left-to-right, which
makes them bit-identical to an equivalently-ordered SQL expression — the
DuckDB oracles exploit that.

Scale: brute-force is a broadcast of the (tiny) query vector over one scan;
the LSH variant buckets by deterministic hyperplane signs so candidate sets
shrink by ~2^planes before exact re-scoring.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v.cast("double") * v.cast("double")))


def cosine(a: Column, b: Column) -> Column:
    return _dot(a, b) / (_norm(a) * _norm(b))


def cosine_topk(embeddings: DataFrame, query_vec_id: int, k: int = 10, vec_col: str = "embedding") -> DataFrame:
    """Brute-force top-k by cosine against one stored vector.

    The single-row query side is broadcast; ordering ties break on vec_id.
    """
    q = embeddings.filter(F.col("vec_id") == query_vec_id).select(F.col(vec_col).alias("_q"))
    joined = embeddings.crossJoin(F.broadcast(q)).filter(F.col("vec_id") != query_vec_id)
    cos = cosine(F.col(vec_col), F.col("_q"))
    return (
        joined.select("vec_id", cos.alias("_cos"))
        .orderBy(F.desc("_cos"), F.asc("vec_id"))
        .limit(k)
        .select("vec_id", F.round("_cos", 6).alias("cos"))
    )


def hyperplane_signs(num_planes: int, dims: int) -> list[list[int]]:
    """Deterministic ±1 hyperplanes: plane p, dim i -> +1 when the md5-free
    arithmetic pattern ((i * (2p + 3)) % 7) < 4 else -1. Fixed and cheap to
    replicate in SQL."""
    return [[1 if (i * (2 * p + 3)) % 7 < 4 else -1 for i in range(dims)] for p in range(num_planes)]


def lsh_buckets(embeddings: DataFrame, num_planes: int = 2, dims: int = 64, vec_col: str = "embedding") -> DataFrame:
    """Sign-LSH bucket per vector: bit p = (v . h_p >= 0)."""
    bucket = F.lit(0)
    for p, signs in enumerate(hyperplane_signs(num_planes, dims)):
        signs_arr = F.array(*[F.lit(float(s)) for s in signs])
        proj = _dot(F.col(vec_col), signs_arr)
        bucket = bucket + F.when(proj >= 0, F.lit(1 << p)).otherwise(F.lit(0))
    return embeddings.select("vec_id", bucket.alias("bucket"))


def lsh_topk(
    embeddings: DataFrame,
    query_vec_id: int,
    k: int = 10,
    num_planes: int = 2,
    dims: int = 64,
    vec_col: str = "embedding",
) -> DataFrame:
    """ANN: restrict exact cosine scoring to the query's LSH bucket."""
    buckets = lsh_buckets(embeddings, num_planes, dims, vec_col)
    with_bucket = embeddings.join(buckets, "vec_id")
    qb = with_bucket.filter(F.col("vec_id") == query_vec_id).select(
        F.col("bucket").alias("_qb"), F.col(vec_col).alias("_q")
    )
    cand = with_bucket.crossJoin(F.broadcast(qb)).filter(
        (F.col("bucket") == F.col("_qb")) & (F.col("vec_id") != query_vec_id)
    )
    cos = cosine(F.col(vec_col), F.col("_q"))
    return (
        cand.select("vec_id", cos.alias("_cos"))
        .orderBy(F.desc("_cos"), F.asc("vec_id"))
        .limit(k)
        .select("vec_id", F.round("_cos", 6).alias("cos"))
    )


def embedding_near_dup(embeddings: DataFrame, threshold: float = 0.95, num_planes: int = 4, dims: int = 64) -> DataFrame:
    """Embedding-cosine near-duplicate pairs, LSH-blocked then exact."""
    buckets = lsh_buckets(embeddings, num_planes, dims)
    wb = embeddings.join(buckets, "vec_id")
    a = wb.select(F.col("vec_id").alias("va"), F.col("embedding").alias("ea"), "bucket")
    b = wb.select(F.col("vec_id").alias("vb"), F.col("embedding").alias("eb"), "bucket")
    pairs = a.join(b, "bucket").filter(F.col("va") < F.col("vb"))
    cos = cosine(F.col("ea"), F.col("eb"))
    return pairs.select("va", "vb", F.round(cos, 6).alias("cos")).filter(F.col("cos") >= threshold)

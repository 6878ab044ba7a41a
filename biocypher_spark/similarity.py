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

from .materialize import materialize


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


# NOTE (round 3; re-litigated BOTH WAYS in round 6 — the folds stay): an
# unrolled per-pair dot was prototyped twice as a codegen replacement for
# the _dot fold in the similarity verifies.
# - Round 3: 64 element_at terms in a plain Project — slower-or-equal
#   (per-element bounds checks).
# - Round 6: vectors UNPACKED once per row into 64 scalar columns, the
#   per-pair dot a pure multiply-add chain. A micro-A/B with a PINNED
#   candidate table won clearly (1.5-2.0 s -> 0.6-0.8 s warm on 468k
#   pairs, bit-identical output) and the rewrite shipped — then fresh-
#   session end-to-end profiling showed it LOSING in every regime: first
#   executions burned ~256 JVM-CPU-s vs ~29 steady (the 130-column join
#   plans generate large fresh classes that HotSpot must re-JIT per
#   session, and until C2 lands they execute slowly), and even warm the
#   production query ran 4.8-5.2 s vs 2.9-3.4 s for the fold shape (wide
#   rows through the live candidate join cost more than the per-pair
#   array fold they replaced; the micro-A/B's pinned narrow candidates
#   had hidden that). Interpreted HOF eval shares long-lived
#   already-JIT'd evaluator code, so it has NO per-session warm-up cliff.
#   Reverted on that evidence — a bench-shaped or short-job workload
#   measures mostly the cliff, and even steady state preferred the fold
#   here. Keep measuring end-to-end in a fresh session before believing
#   a micro-A/B of codegen rewrites.


def _norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v.cast("double") * v.cast("double")))


def _safe_cos(dot: Column, denom: Column) -> Column:
    """dot/denom with a zero-denominator guard: an all-zero embedding (a
    common failed/padded-row artifact) gets cosine 0.0 — no similarity —
    instead of crashing the job with DIVIDE_BY_ZERO under Spark 4's
    default ANSI mode. Identical value whenever the denominator is
    non-zero, so oracle hashes are unaffected."""
    return F.when(denom != 0.0, dot / denom).otherwise(F.lit(0.0))


def cosine(a: Column, b: Column) -> Column:
    return _safe_cos(_dot(a, b), _norm(a) * _norm(b))


def cosine_topk(embeddings: DataFrame, query_vec_id: int, k: int = 10, vec_col: str = "embedding") -> DataFrame:
    """Brute-force top-k by cosine against one stored vector.

    The single-row query side is broadcast; ordering ties break on vec_id.
    """
    # query norm rides in the one-row broadcast frame, evaluated ONCE —
    # cosine(vec, _q) would re-fold the 64-element query norm per corpus row
    q = embeddings.filter(F.col("vec_id") == query_vec_id).select(
        F.col(vec_col).alias("_q"), _norm(F.col(vec_col)).alias("_qn")
    )
    if not q.take(1):
        # same contract as ivf_topk: a typo'd id raises instead of
        # returning a silently-empty frame
        raise ValueError(f"cosine_topk: query vec_id {query_vec_id} not found")
    joined = embeddings.crossJoin(F.broadcast(q)).filter(F.col("vec_id") != query_vec_id)
    cos = _safe_cos(_dot(F.col(vec_col), F.col("_q")), _norm(F.col(vec_col)) * F.col("_qn"))
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


def hyperplane_signs_md5(table: int, num_planes: int, dims: int) -> list[list[int]]:
    """Independent deterministic ±1 hyperplanes for multi-table LSH.

    The arithmetic pattern above has period 7 in the plane index, so it can
    only produce 7 distinct planes — useless for banded multi-table LSH.
    This family draws each sign from md5(f"{table}_{plane}_{dim}") computed
    driver-side (hashlib == Spark md5 == DuckDB md5), then inlines the signs
    as literals, so both engines see identical constants.
    """
    import hashlib

    def sign(t: int, p: int, i: int) -> int:
        h = hashlib.md5(f"{t}_{p}_{i}".encode()).hexdigest()
        return 1 if int(h[0], 16) < 8 else -1

    return [[sign(table, p, i) for i in range(dims)] for p in range(num_planes)]


def lsh_buckets(embeddings: DataFrame, num_planes: int = 2, dims: int = 64, vec_col: str = "embedding") -> DataFrame:
    """Sign-LSH bucket per vector: bit p = (v . h_p >= 0)."""
    bucket = _bucket_expr(hyperplane_signs(num_planes, dims), vec_col)
    return embeddings.select("vec_id", bucket.alias("bucket"))


def _bucket_expr(signs_list: list[list[int]], vec_col: str) -> Column:
    """Integer bucket id from sign bits of the given hyperplane projections.

    The projection stays a ``zip_with``+``aggregate`` fold: an unrolled
    ``0.0 ± v[0] ± v[1] ...`` expression was measured SLOWER — round 3 at
    64 projections × 64 terms (Janino 64 KB hard-fail inside Generate),
    and RE-measured in round 6 at the current 16-projection shape via
    ``F.get`` scalar sums (fold 0.19 s vs unrolled 0.40 s warm noop on the
    sf0.1 assignment table) — the per-element null-safe branches cost more
    than the interpreted-lambda overhead they replace at this width. The
    fold is the fastest portable formulation here.

    Guarded against a dims/data mismatch: zip_with pads the shorter array
    with NULLs, every projection would fold to NULL, and `when(proj >= 0)`
    would silently send EVERY vector to bucket 0 — which the size cap then
    drops, making near-dup/semantic-dedup return empty with no error. The
    per-row raise_error costs one int compare inside the job (no extra
    probe action).

    NULL embeddings are tolerated, not fatal: they map to a NULL bucket,
    which drops out of every downstream equijoin on the bucket key (SQL
    null-key semantics) — the same effective behavior the pre-guard code
    had (null rows never produce candidate pairs). Without the explicit
    isNull branch, size(NULL) is NULL, the dims test is non-true, and the
    row would fall into the raise branch with a NULL (opaque) message."""
    dims = len(signs_list[0]) if signs_list else 0
    bucket = F.lit(0)
    for p, signs in enumerate(signs_list):
        signs_arr = F.array(*[F.lit(float(s)) for s in signs])
        proj = _dot(F.col(vec_col), signs_arr)
        bucket = bucket + F.when(proj >= 0, F.lit(1 << p)).otherwise(F.lit(0))
    return (
        F.when(F.col(vec_col).isNull(), F.lit(None).cast("int"))
        .when(F.size(F.col(vec_col)) == dims, bucket)
        .otherwise(
            F.raise_error(
                F.concat(
                    F.lit("lsh: embedding length "),
                    F.size(F.col(vec_col)).cast("string"),
                    F.lit(f" != configured dims={dims}"),
                )
            )
        )
    )


def lsh_topk(
    embeddings: DataFrame,
    query_vec_id: int,
    k: int = 10,
    num_planes: int = 2,
    dims: int = 64,
    vec_col: str = "embedding",
) -> DataFrame:
    """ANN: restrict exact cosine scoring to the query's LSH bucket.

    The bucket is a column expression over the embedding itself, so no
    self-join is needed to attach it — one scan, one broadcast of the
    single-row query side.
    """
    bucket = _bucket_expr(hyperplane_signs(num_planes, dims), vec_col)
    with_bucket = embeddings.select("vec_id", vec_col, bucket.alias("bucket"))
    qb = with_bucket.filter(F.col("vec_id") == query_vec_id).select(
        F.col("bucket").alias("_qb"), F.col(vec_col).alias("_q"), _norm(F.col(vec_col)).alias("_qn")
    )
    if not qb.take(1):
        raise ValueError(f"lsh_topk: query vec_id {query_vec_id} not found")
    cand = with_bucket.crossJoin(F.broadcast(qb)).filter(
        (F.col("bucket") == F.col("_qb")) & (F.col("vec_id") != query_vec_id)
    )
    cos = _safe_cos(_dot(F.col(vec_col), F.col("_q")), _norm(F.col(vec_col)) * F.col("_qn"))
    return (
        cand.select("vec_id", cos.alias("_cos"))
        .orderBy(F.desc("_cos"), F.asc("vec_id"))
        .limit(k)
        .select("vec_id", F.round("_cos", 6).alias("cos"))
    )


def ivf_assign(
    embeddings: DataFrame, n_centroids: int = 4, vec_col: str = "embedding", cents: list | None = None
) -> DataFrame:
    """IVF coarse quantizer: assign every vector to its max-cosine centroid.

    Default centroids are the ``n_centroids`` lowest-vec_id vectors — a
    deterministic, oracle-replicable seed; pass ``cents`` (k × dims floats,
    e.g. from :func:`train_ivf_centroids`) for a trained quantizer — the
    assignment plan is identical. Centroids live driver-side (k × dims
    floats) and are inlined as literals, so assignment is a single narrow
    projection over the corpus — no join, no shuffle. Ties break to the
    lowest centroid id.
    """
    if cents is None:
        cents = _collect_centroids(embeddings, n_centroids, vec_col)
    # vector norm in its own projection (single fold per row, kept apart
    # from its k consumers by CollapseProject's non-cheap rule), centroid
    # norms as driver literals — see _ivf_cluster_expr
    return embeddings.select("vec_id", vec_col, _norm(F.col(vec_col)).alias("_nv")).select(
        "vec_id", _ivf_cluster_expr(cents, vec_col, norm_col="_nv").alias("cluster")
    )


def _collect_centroids(embeddings: DataFrame, n_centroids: int, vec_col: str) -> list:
    """The ``n_centroids`` lowest-vec_id vectors (TakeOrdered — no full
    sort), independent of whether ids are dense or zero-based; returned as
    plain float lists."""
    cents = embeddings.orderBy("vec_id").limit(n_centroids).select(vec_col).collect()
    if not cents:
        raise ValueError("ivf: embeddings frame is empty, cannot derive centroids")
    return [[float(x) for x in row[0]] for row in cents]


def train_ivf_centroids(
    embeddings: DataFrame,
    n_centroids: int = 4,
    iterations: int = 4,
    vec_col: str = "embedding",
    round_decimals: int | None = None,
) -> list:
    """Seeded Lloyd's k-means for the IVF coarse quantizer, run IN Spark.

    Init = the deterministic lowest-vec_id seed; each iteration assigns
    every vector to its max-cosine centroid via the inline expression (no
    join) and recomputes per-cluster per-dimension means with ONE hash
    aggregate (``dims`` sum() columns + a count — all whole-stage codegen;
    the shuffle carries k rows of partial aggregates, nothing else). An
    emptied cluster keeps its previous centroid. Returns k × dims floats
    ready to inject into :func:`ivf_assign` / :func:`ivf_topk`.

    Scale: per iteration exactly one corpus scan and a k-row shuffle —
    the canonical distributed Lloyd step.
    """
    cents = _collect_centroids(embeddings, n_centroids, vec_col)
    dims = len(cents[0])
    for _ in range(iterations):
        assigned = embeddings.select(
            _ivf_cluster_expr(cents, vec_col).alias("cluster"), F.col(vec_col).alias("_v")
        )
        stats = assigned.groupBy("cluster").agg(
            F.count(F.lit(1)).alias("_c"),
            *[
                F.sum(F.element_at(F.col("_v"), i + 1).cast("double")).alias(f"_s{i}")
                for i in range(dims)
            ],
        ).collect()
        new = [list(c) for c in cents]
        for row in stats:
            new[row["cluster"]] = [row[f"_s{i}"] / row["_c"] for i in range(dims)]
        if round_decimals is not None:
            # pin each iteration's centroids to a fixed decimal grid so an
            # external replication of the training (e.g. the DuckDB oracle)
            # lands on bit-identical centroids despite float-summation-order
            # differences in the distributed means
            new = [[round(x, round_decimals) for x in vec] for vec in new]
        cents = new
    return cents


def _py_dot(a, b) -> float:
    """Driver-side replica of the ``_dot`` fold (same accumulation order,
    same IEEE doubles — see :func:`_py_norm`)."""
    acc = 0.0
    for x, y in zip(a, b):
        acc += float(x) * float(y)
    return acc


def _py_norm(vec) -> float:
    """Driver-side replica of the ``_norm`` fold: same accumulation order
    (((0.0 + x0^2) + x1^2) + ...), same IEEE doubles (Python floats ARE
    C doubles; sqrt is correctly rounded in both runtimes), so the value
    is bit-identical to evaluating ``_norm(lit array)`` in Spark — which
    lets centroid norms become literals instead of a per-row 64-term fold
    re-evaluated for every centroid on every corpus row (round 6)."""
    acc = 0.0
    for x in vec:
        acc += float(x) * float(x)
    import math

    return math.sqrt(acc)


def _ivf_cluster_expr(cents, vec_col: str, norm_col: str | None = None) -> Column:
    """Max-cosine centroid id. ``norm_col``: name of a column already
    holding ``_norm(vec_col)`` — the vector's norm fold is then evaluated
    ONCE per row instead of once per centroid, and each centroid's norm is
    a driver-computed literal (:func:`_py_norm`); identical doubles, ~2.4x
    less per-row fold work at 4 centroids."""
    vnorm = F.col(norm_col) if norm_col is not None else None
    cos_cols = []
    for vec in cents:
        arr = F.array(*[F.lit(float(x)) for x in vec])
        if vnorm is not None:
            cos_cols.append(_safe_cos(_dot(F.col(vec_col), arr), vnorm * F.lit(_py_norm(vec))))
        else:
            cos_cols.append(cosine(F.col(vec_col), arr))
    best = F.greatest(*cos_cols) if len(cos_cols) > 1 else cos_cols[0]
    expr = F.when(cos_cols[0] == best, F.lit(0))
    for j in range(1, len(cos_cols)):
        expr = expr.when(cos_cols[j] == best, F.lit(j))
    return expr.otherwise(F.lit(len(cos_cols) - 1))


def ivf_topk(
    embeddings: DataFrame,
    query_vec_id: int,
    k: int = 10,
    n_centroids: int = 4,
    nprobe: int = 2,
    vec_col: str = "embedding",
    cents: list | None = None,
) -> DataFrame:
    """IVF ANN: score only the ``nprobe`` inverted lists closest to the
    query. Probe selection runs on the (tiny) centroid set; the corpus scan
    is pruned to the probed clusters before the exact cosine top-k. Pass
    ``cents`` (e.g. from :func:`train_ivf_centroids`) for a trained
    quantizer."""
    if cents is None:
        # ONE driver action for query vector + seed centroids (tagged
        # union; the centroid branch's sort order is restored by the
        # vec_id sort below) — formerly two sequential collect jobs
        low = (
            embeddings.orderBy("vec_id").limit(n_centroids)
            .select(F.lit(0).alias("_w"), "vec_id", vec_col)
        )
        qq = embeddings.filter(F.col("vec_id") == query_vec_id).select(
            F.lit(1).alias("_w"), "vec_id", vec_col
        )
        rows = low.unionByName(qq).collect()
        qrows = [r for r in rows if r["_w"] == 1]
        cent_rows = sorted((r for r in rows if r["_w"] == 0), key=lambda r: r["vec_id"])
        if not cent_rows:
            raise ValueError("ivf: embeddings frame is empty, cannot derive centroids")
        cents = [[float(x) for x in r[vec_col]] for r in cent_rows]
    else:
        qrows = embeddings.filter(F.col("vec_id") == query_vec_id).select(vec_col).collect()
    if not qrows:
        raise ValueError(f"ivf: query vec_id {query_vec_id} not found")
    qlist = [float(x) for x in qrows[0][vec_col]]
    qvec = F.array(*[F.lit(x) for x in qlist])
    # rank centroids for the query DRIVER-side: _py_dot/_py_norm replicate
    # the Spark folds' accumulation order on the same IEEE doubles, so the
    # scores (and the probe pick) are bit-identical to the former one-row
    # Spark job — one driver action fewer per query (round 6)
    scores = [
        _py_dot(qlist, vec) / (_py_norm(qlist) * _py_norm(vec)) if _py_norm(qlist) * _py_norm(vec) != 0.0 else 0.0
        for vec in cents
    ]
    probes = [j for j, _ in sorted(enumerate(scores), key=lambda js: (-js[1], js[0]))[:nprobe]]
    # cluster as an inline expression: the probed-list restriction is a
    # FILTER on the scan, not a join against a separate assignment table;
    # the row norm is computed once per row and shared by the cluster expr
    # and the final query cosine (query norm is a driver literal)
    qn = _py_norm(qlist)
    base = embeddings.select("vec_id", vec_col, _norm(F.col(vec_col)).alias("_nv"))
    cand = base.filter(
        _ivf_cluster_expr(cents, vec_col, norm_col="_nv").isin(probes)
        & (F.col("vec_id") != query_vec_id)
    )
    cos = _safe_cos(_dot(F.col(vec_col), qvec), F.col("_nv") * F.lit(qn))
    return (
        cand.select("vec_id", cos.alias("_cos"))
        .orderBy(F.desc("_cos"), F.asc("vec_id"))
        .limit(k)
        .select("vec_id", F.round("_cos", 6).alias("cos"))
    )


def _multi_table_buckets(
    embeddings: DataFrame, num_tables: int, planes_per_table: int, dims: int, vec_col: str
) -> DataFrame:
    """(vec_id, tbl, bucket) multi-table sign-LSH assignment — all
    ``num_tables`` bucket ids in ONE projection over the corpus (a union of
    per-table selects would scan the source T times), then one narrow
    explode. Shared by :func:`embedding_near_dup` (self-join flavour) and
    :func:`embedding_dedup_against` (cross-corpus flavour)."""
    bucket_cols = [
        _bucket_expr(hyperplane_signs_md5(t, planes_per_table, dims), vec_col).alias(f"_b{t}")
        for t in range(num_tables)
    ]
    projected = embeddings.select("vec_id", *bucket_cols)
    tbl_structs = [
        F.struct(F.lit(t).alias("tbl"), F.col(f"_b{t}").alias("bucket"))
        for t in range(num_tables)
    ]
    return projected.select("vec_id", F.explode(F.array(*tbl_structs)).alias("tb")).select(
        "vec_id", F.col("tb.tbl").alias("tbl"), F.col("tb.bucket").alias("bucket")
    )


def embedding_near_dup(
    embeddings: DataFrame,
    threshold: float = 0.95,
    num_tables: int = 8,
    planes_per_table: int = 8,
    dims: int = 64,
    max_bucket_size: int = 1000,
    vec_col: str = "embedding",
    buckets: DataFrame | None = None,
    ok_buckets: DataFrame | None = None,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs via banded multi-table LSH.

    Scale design (vs the naive single-table variant): ``num_tables``
    independent sign-LSH tables of ``planes_per_table`` planes each. A pair
    is a candidate when it collides in ANY table (OR across tables — high
    recall), and each table has 2^planes buckets (small buckets — bounded
    within-bucket join). Buckets larger than ``max_bucket_size`` are dropped
    deterministically (they are degenerate regions where LSH gives no
    selectivity); the bucket-size histogram is tiny (tables × 2^planes rows)
    and broadcast. Candidate pairs are exactly
    re-scored with the full cosine, so precision is exact.

    Expected candidate volume per table ≈ N²/2^planes; with the cap it is
    ≤ N·max_bucket_size — linear in N, never quadratic.

    ``buckets`` optionally supplies a precomputed (and pinned)
    (vec_id, tbl, bucket) assignment from :func:`_multi_table_buckets` with
    the SAME table/plane parameters — callers running several LSH flavours
    over one corpus (e.g. within + against in one report) pay the
    hyperplane projections once. ``ok_buckets`` likewise supplies a
    precomputed surviving-(tbl, bucket) table (count over ``buckets``
    <= ``max_bucket_size``) so multi-flavour callers derive both arms'
    caps from ONE histogram aggregate.
    """
    # the tiny (vec_id, tbl, bucket) table is materialized: it feeds the
    # size histogram AND both sides of the candidate self-join.
    assigned = buckets if buckets is not None else materialize(
        _multi_table_buckets(embeddings, num_tables, planes_per_table, dims, vec_col)
    )
    if ok_buckets is None:
        # bucket-size histogram: at most num_tables * 2^planes rows ->
        # broadcast
        ok_buckets = (
            assigned.groupBy("tbl", "bucket")
            .agg(F.count(F.lit(1)).alias("_n"))
            .filter(F.col("_n") <= max_bucket_size)
            .select("tbl", "bucket")
        )
    capped = assigned.join(F.broadcast(ok_buckets), ["tbl", "bucket"])
    a = capped.select("tbl", "bucket", F.col("vec_id").alias("va"))
    b = capped.select("tbl", "bucket", F.col("vec_id").alias("vb"))
    # NO distinct here (round 6): cross-table duplicate collisions are rare
    # (~7% at sf0.1 — 500k pre- vs 468k post-distinct), the verify below is
    # pure codegen arithmetic, and deduping 484 verified output rows costs
    # nothing next to an exchange+aggregate over the full candidate table;
    # the post-filter distinct keeps the returned pair set exactly unique
    # (cos is functional on the pair, so row-level distinct == pair
    # distinct).
    cand = a.join(b, ["tbl", "bucket"]).filter(F.col("va") < F.col("vb")).select("va", "vb")
    # precompute each vector's norm ONCE (N fold evaluations) instead of
    # per candidate pair (2 per pair, and pairs >> N): the per-pair work
    # drops to the dot product alone. cosine = dot/(na*nb) uses the exact
    # same subexpressions as the inline formulation, so results (and the
    # oracle hash) are bit-identical. The verify dot stays the FOLD over
    # the array — see the round-6 note at the top of this module for why
    # the unrolled unpacked-column variant was shipped and then reverted
    # on end-to-end evidence.
    with_norm = embeddings.select("vec_id", vec_col, _norm(F.col(vec_col)).alias("_n"))
    ea = with_norm.select(
        F.col("vec_id").alias("va"), F.col(vec_col).alias("_ea"), F.col("_n").alias("_na")
    )
    eb = with_norm.select(
        F.col("vec_id").alias("vb"), F.col(vec_col).alias("_eb"), F.col("_n").alias("_nb")
    )
    cos = F.round(_safe_cos(_dot(F.col("_ea"), F.col("_eb")), F.col("_na") * F.col("_nb")), 6)
    return (
        cand.join(ea, "va")
        .join(eb, "vb")
        .select("va", "vb", cos.alias("cos"))
        .filter(F.col("cos") >= threshold)
        .distinct()
    )


def embedding_dedup_against(
    df: DataFrame,
    reference: DataFrame,
    threshold: float = 0.95,
    num_tables: int = 8,
    planes_per_table: int = 8,
    dims: int = 64,
    max_bucket_size: int = 1000,
    vec_col: str = "embedding",
    df_buckets: DataFrame | None = None,
    ref_buckets: DataFrame | None = None,
    matched_only: bool = False,
    ref_ok_buckets: DataFrame | None = None,
) -> DataFrame:
    """Cross-corpus EMBEDDING near-dedup: flag vectors of ``df`` (the new
    crawl) whose cosine with ANY vector of ``reference`` (the existing
    training set) is >= ``threshold`` — the semantic-dedup analogue of
    :func:`textops.near_dedup_against`. Returns one row per ``df`` vector:
    (vec_id, dup_of_ref, ref_id, cos) where ref_id/cos identify the best
    reference match (max cosine, ties to the lowest ref_id; NULL when no
    match reached the threshold).

    Scale shape, asymmetric like the text variant: both corpora reduce to
    narrow multi-table sign-LSH bucket tables (same md5-derived hyperplanes
    on both sides, so colliding vectors land in the same (tbl, bucket)),
    candidates come from a hash join between the two bucket tables — never
    a self-join, never all-pairs. The per-(tbl, bucket) size cap is
    computed on the REFERENCE side (degenerate regions where LSH has no
    selectivity), bounding candidates at |df| * num_tables *
    ``max_bucket_size``; the exact-cosine verify joins vectors back by id,
    so only candidate reference vectors are ever shipped. Re-screening a
    crawl shard against a 100 TB training set touches the training
    embeddings once for bucketing and once (pruned) for verify.
    """
    # optional precomputed assignments (same table/plane params) let a
    # caller who already bucketed these corpora skip the projection pass
    a = (
        df_buckets
        if df_buckets is not None
        else _multi_table_buckets(df, num_tables, planes_per_table, dims, vec_col)
    )
    r = (
        ref_buckets
        if ref_buckets is not None
        else materialize(_multi_table_buckets(reference, num_tables, planes_per_table, dims, vec_col))
    )
    # histogram is at most num_tables * 2^planes rows -> broadcast;
    # ref_ok_buckets lets multi-flavour callers supply it from a shared
    # aggregate (a bucket with zero reference rows passing the cap is
    # harmless: the join below finds no ref rows in it either way)
    ok = (
        ref_ok_buckets
        if ref_ok_buckets is not None
        else (
            r.groupBy("tbl", "bucket")
            .agg(F.count(F.lit(1)).alias("_n"))
            .filter(F.col("_n") <= max_bucket_size)
            .select("tbl", "bucket")
        )
    )
    r_ok = r.join(F.broadcast(ok), ["tbl", "bucket"]).select(
        "tbl", "bucket", F.col("vec_id").alias("ref_id")
    )
    # NO candidate distinct (round 6): duplicate (vec_id, ref_id) collision
    # rows across tables carry identical cos through the cheap codegen
    # verify and collapse inside the best-match aggregate below — the
    # distinct was an exchange over the full candidate table spent
    # deduplicating what the groupBy deduplicates anyway.
    cand = a.join(r_ok, ["tbl", "bucket"]).select("vec_id", "ref_id")
    # norms precomputed once per corpus (N fold evaluations, not 2 per
    # pair); the per-pair dot stays the array fold (see the module-top
    # round-6 note on the reverted unrolled variant)
    wa = df.select("vec_id", F.col(vec_col).alias("_ea"), _norm(F.col(vec_col)).alias("_na"))
    wr = reference.select(
        F.col("vec_id").alias("ref_id"), F.col(vec_col).alias("_er"), _norm(F.col(vec_col)).alias("_nr")
    )
    cos = F.round(_safe_cos(_dot(F.col("_ea"), F.col("_er")), F.col("_na") * F.col("_nr")), 6)
    matches = (
        cand.join(wa, "vec_id")
        .join(wr, "ref_id")
        .select("vec_id", "ref_id", cos.alias("cos"))
        .filter(F.col("cos") >= threshold)
    )
    # best match per vec_id as ONE hash aggregate instead of a row_number
    # window (exchange + full sort) — max over struct (cos ASC-to-max,
    # -ref_id ASC-to-max == ref_id min) reproduces the former
    # (cos DESC, ref_id ASC) pick exactly, including NaN-first (Spark
    # orders NaN greatest in both max() and DESC sorts), gets map-side
    # combine, and skips the sort. Duplicate (vec_id, ref_id) rows from
    # cross-table collisions carry identical cos, so the struct max is
    # total and the aggregate doubles as the candidate dedup. Round-6
    # change; A/B'd in emb_near_dup's 'against' arm.
    best = matches.groupBy("vec_id").agg(
        F.max(F.struct(F.col("cos"), (-F.col("ref_id")).alias("_nr"), F.col("ref_id"))).alias("_b")
    ).select("vec_id", F.col("_b.ref_id").alias("ref_id"), F.col("_b.cos").alias("cos"))
    if matched_only:
        # callers that immediately filter to dup_of_ref=true (e.g. the
        # tagged-union bench query) skip the per-vector left join: the
        # matched rows ARE the flagged rows, so the join's two exchanges
        # and the full-corpus id scan buy nothing
        return best.select("vec_id", F.lit(True).alias("dup_of_ref"), "ref_id", "cos")
    return (
        df.select("vec_id")
        .join(best, "vec_id", "left")
        .select("vec_id", F.col("cos").isNotNull().alias("dup_of_ref"), "ref_id", "cos")
    )


def semantic_dedup(
    embeddings: DataFrame,
    threshold: float = 0.95,
    num_tables: int = 8,
    planes_per_table: int = 8,
    dims: int = 64,
    max_bucket_size: int = 1000,
    vec_col: str = "embedding",
    buckets: DataFrame | None = None,
) -> DataFrame:
    """SemDeDup-style semantic deduplication: cosine near-dup PAIRS
    (:func:`embedding_near_dup`) -> connected components -> one canonical
    representative (min vec_id) per semantic cluster. Returns one row per
    input vector: (vec_id, cluster_id, is_rep); the dedup keep-set is
    ``is_rep`` (singletons are their own representative), mirroring the
    SemDeDup recipe (Abbas et al. 2023: cluster, keep one exemplar per
    near-duplicate semantic group).

    Scale shape: the pair stage is the capped banded multi-table LSH (never
    all-pairs, candidates <= N * tables * cap), components run the
    distributed pointer-jumping min-label loop over the PAIR id graph only
    (near-dup pairs, orders of magnitude smaller than the corpus), and the
    final assignment is one narrow-key left join of ids against the
    component table — embeddings themselves are scanned once (LSH) plus
    the pruned candidate verify.
    """
    from .operators.components import connected_components

    pairs = embedding_near_dup(
        embeddings,
        threshold=threshold,
        num_tables=num_tables,
        planes_per_table=planes_per_table,
        dims=dims,
        max_bucket_size=max_bucket_size,
        vec_col=vec_col,
        buckets=buckets,
    )
    comp = connected_components(pairs.select("va", "vb"), src="va", dst="vb")
    cluster = F.coalesce("comp", "vec_id")
    return (
        embeddings.select("vec_id")
        .join(comp.withColumnRenamed("node", "vec_id"), "vec_id", "left")
        .select(
            "vec_id",
            cluster.alias("cluster_id"),
            (cluster == F.col("vec_id")).alias("is_rep"),
        )
    )

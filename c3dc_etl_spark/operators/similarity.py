"""Similarity search over embedding columns (array<float>).

- ``cosine_topk``: brute-force exact top-k — broadcast the (small) query
  set against the candidate table; one pass, no shuffle of candidates.
- ``lsh_cosine_candidates``: sign-random-projection (SRP) bucketing — the
  scale path: candidates are bucketed by sign bits, queries only compare
  within matching buckets.

Dot products are computed with zip_with + aggregate over doubles
(sequential left-to-right fold => deterministic), similarities rounded to
4dp so cross-engine float noise (<=1e-13) can't flip a value or a rank.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    """Sequential-fold dot product in double precision."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def l2_norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (l2_norm(a) * l2_norm(b))


def cosine_topk(
    queries: DataFrame,
    candidates: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 10,
    round_dp: int = 4,
    match_cols: list[str] | None = None,
) -> DataFrame:
    """Exact top-k cosine neighbors per query vector.

    queries is broadcast (ANN query batches are small); candidates stream
    through in one narrow pass, then a per-query window takes k. Rank key
    is (rounded sim DESC, candidate id ASC) — fully deterministic.

    ``match_cols`` (optional) makes this FILTERED vector search: each
    query only sees candidates whose metadata columns equal its own
    (e.g. same label/tenant/language). The equality rides the broadcast
    join CONDITION, so non-matching candidates are discarded before any
    dot product is folded — pre-filtering, not post-filtering: top-k is
    taken within the filtered set, so a query can never come back short
    because its true neighbors were crowded out by filtered-away ones.
    At scale the hash-join probe rejects non-matching rows at hashtable
    lookup cost; the O(dim) scoring runs only on survivors."""
    # norms are materialized per ROW, not per pair: q·q would otherwise
    # be re-folded once per candidate (and c·c once per query). The
    # division consumes the same doubles either way, so results are
    # bit-identical — this is an O(pairs·dim) -> O(n·dim) cost cut.
    mcols = list(match_cols or [])
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("q_vec"),
        l2_norm(F.col(vec_col)).alias("q_norm"),
        *[F.col(m).alias(f"q_{m}") for m in mcols],
    )
    c = candidates.select(
        F.col(id_col).alias("candidate_id"),
        F.col(vec_col).alias("c_vec"),
        l2_norm(F.col(vec_col)).alias("c_norm"),
        *[F.col(m).alias(f"c_{m}") for m in mcols],
    )
    cond = F.col("candidate_id") != F.col("query_id")
    for m in mcols:
        cond = cond & (F.col(f"c_{m}") == F.col(f"q_{m}"))
    sim = dot(F.col("q_vec"), F.col("c_vec")) / (F.col("q_norm") * F.col("c_norm"))
    scored = (
        c.join(F.broadcast(q), cond)
        .withColumn("sim", F.round(sim, round_dp) + F.lit(0.0))
        .select("query_id", "candidate_id", "sim")
    )
    # Two-phase salted top-k (operators.skew.salted_topk). Spark's
    # WindowGroupLimit already prunes rank<=k rows per group per TASK
    # before each exchange, so even a single window ships only tasks*k
    # rows per query — but those all land on |q| reducers, and tasks*k
    # grows with cluster size (100k tasks x k = 1M-row sorts per
    # query). The salted form bounds each query's reducer input at
    # n_salt*k rows; the (sim DESC, candidate_id ASC) tiebreak is a
    # total order so the result is identical to the one-shot window.
    from c3dc_etl_spark.operators.skew import salted_topk

    ranked = salted_topk(
        scored,
        ["query_id"],
        [F.col("sim").desc(), F.col("candidate_id").asc()],
        k,
        salt=F.hash(F.col("candidate_id")),
        n_salt=32,
        rank_col="rank",
    )
    return ranked.select(
        "query_id", "candidate_id", "sim", F.col("rank").cast("bigint").alias("rank")
    )


def _cos_to_literal(vec: Column, vec_norm: Column, centroid: list[float]) -> Column:
    """cosine(vec, literal centroid) with SEQUENTIAL folds only —
    engine-portable bit-for-bit (see srp_bucket). ``vec_norm`` must be a
    materialized column: it is referenced once per centroid, and an
    inline norm fold would be re-evaluated per centroid."""
    lit_c = F.array(*[F.lit(v) for v in centroid])
    d = F.aggregate(
        F.zip_with(lit_c, vec, lambda c, x: c * x.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    nc = F.sqrt(
        F.aggregate(
            F.transform(lit_c, lambda c: c * c), F.lit(0.0), lambda acc, v: acc + v
        )
    )
    return d / (nc * vec_norm)


def ivf_cosine_topk(
    queries: DataFrame,
    candidates: DataFrame,
    centroids: list[tuple[int, list[float]]],
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    nprobe: int = 2,
    k: int = 10,
    round_dp: int = 4,
) -> DataFrame:
    """IVF-style approximate top-k: a coarse quantizer (broadcast
    centroid list) assigns every candidate to its nearest centroid in
    ONE narrow pass (no shuffle); each query probes its ``nprobe``
    nearest centroids and compares only against those clusters'
    candidates — the inverted-file search pattern, with the cluster id
    as the join key so work scales with probed-cluster sizes, not n^2.

    ``centroids`` is the trained coarse quantizer ((cid, vector) pairs);
    any trainer works — k-means offline, or a deterministic sample for
    testing. Assignment argmax is a struct array_max (max sim, ties to
    max cid) so the same record lands in the same cluster on any engine.
    """

    def sims_struct(vec: Column, norm: Column) -> Column:
        return F.array(
            *[
                F.struct(
                    _cos_to_literal(vec, norm, cv).alias("s"), F.lit(cid).alias("c")
                )
                for cid, cv in centroids
            ]
        )

    cand = candidates.select(
        F.col(id_col).alias("candidate_id"),
        F.col(vec_col).alias("c_vec"),
        l2_norm(F.col(vec_col)).alias("__nv"),
    ).select(
        "candidate_id",
        "c_vec",
        F.col("__nv").alias("c_norm"),
        F.array_max(sims_struct(F.col("c_vec"), F.col("__nv")))["c"].alias("cluster"),
    )
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("q_vec"),
        l2_norm(F.col(vec_col)).alias("__nv"),
    ).select(
        "query_id",
        "q_vec",
        F.col("__nv").alias("q_norm"),
        F.explode(
            F.transform(
                F.slice(
                    F.array_sort(sims_struct(F.col("q_vec"), F.col("__nv"))),
                    -nprobe,
                    nprobe,
                ),
                lambda s: s["c"],
            )
        ).alias("cluster"),
    )
    # per-row norms reused for pair scoring (bit-identical, O(n) folds)
    sim = dot(F.col("q_vec"), F.col("c_vec")) / (F.col("q_norm") * F.col("c_norm"))
    scored = (
        cand.join(F.broadcast(q), "cluster")
        .filter(F.col("candidate_id") != F.col("query_id"))
        .withColumn("sim", F.round(sim, round_dp) + F.lit(0.0))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("sim").desc(), F.col("candidate_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "query_id", "candidate_id", "sim", F.col("rank").cast("bigint").alias("rank")
        )
    )


def srp_planes(planes: int, dim: int, seed: str = "srp") -> list[list[float]]:
    """Seeded random hyperplane matrix for sign-random-projection LSH:
    ``planes`` x ``dim`` Rademacher (+-1) entries derived from md5, so
    Spark and the DuckDB oracle can embed identical literals. Random
    signs are a valid SRP family (Achlioptas-style sparse projections);
    +-1 entries keep every product exact in FP, which makes the
    projection bit-identical across engines when both fold
    sequentially."""
    import hashlib

    out: list[list[float]] = []
    for p in range(planes):
        row: list[float] = []
        h = b""
        for i in range(dim):
            if i % 128 == 0:
                h = hashlib.md5(f"{seed}:{p}:{i // 128}".encode()).digest()
            bit = (h[(i % 128) // 8] >> (i % 8)) & 1
            row.append(1.0 if bit else -1.0)
        out.append(row)
    return out


def srp_bucket(vec: Column, plane_matrix: list[list[float]]) -> Column:
    """Bucket key: one sign bit per hyperplane, from a SEQUENTIAL fold of
    plane . vec (deterministic order => bit-identical across engines)."""
    bits = []
    for plane in plane_matrix:
        lit_plane = F.array(*[F.lit(v) for v in plane])
        proj = F.aggregate(
            F.zip_with(lit_plane, vec, lambda p, x: p * x.cast("double")),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
        bits.append(F.when(proj >= 0, F.lit("1")).otherwise(F.lit("0")))
    return F.concat(*bits)


def lsh_cosine_candidates(
    df: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    planes: int = 8,
    dim: int = 64,
    seed: str = "srp",
    min_sim: float = 0.0,
    round_dp: int = 4,
) -> DataFrame:
    """Near-duplicate embedding pairs within SRP buckets: the self-join is
    hash-partitioned on the bucket key, so work scales with bucket
    collision counts, not n^2. Buckets come from a seeded broadcast
    hyperplane matrix (see srp_planes) — two vectors land in the same
    bucket iff every hyperplane leaves them on the same side, with
    P[bit match] = 1 - angle/pi per plane."""
    matrix = srp_planes(planes, dim, seed)
    b = df.select(
        F.col(id_col).alias("id"),
        F.col(vec_col).alias("vec"),
        l2_norm(F.col(vec_col)).alias("norm"),
        srp_bucket(F.col(vec_col), matrix).alias("bucket"),
    )
    left = b.select(
        F.col("id").alias("id_a"), F.col("vec").alias("vec_a"),
        F.col("norm").alias("norm_a"), "bucket",
    )
    right = b.select(
        F.col("id").alias("id_b"), F.col("vec").alias("vec_b"),
        F.col("norm").alias("norm_b"), "bucket",
    )
    # per-row norms: each vector's self-fold runs once, not once per
    # bucket collision (bit-identical division operands)
    sim = dot(F.col("vec_a"), F.col("vec_b")) / (F.col("norm_a") * F.col("norm_b"))
    return (
        left.join(right, "bucket")
        .filter(F.col("id_a") < F.col("id_b"))
        .withColumn("sim", F.round(sim, round_dp) + F.lit(0.0))
        .filter(F.col("sim") >= min_sim)
        .select("id_a", "id_b", "sim")
    )


def embedding_near_dup(
    df: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.99,
    planes: int = 8,
    dim: int = 64,
    seed: str = "srp",
) -> DataFrame:
    """Embedding-cosine near-duplicate DEDUP DECISIONS (not just
    candidate pairs): every vector that shares an SRP bucket with a
    lower-id vector at cosine >= ``threshold`` is marked dropped, keyed
    to its lowest-id qualifying partner.

    keep_id = min(id_a) per dropped id_b makes the decision
    deterministic without iterative connected components: chains
    resolve because the lowest member of any near-dup cluster is never
    dropped (it has no lower-id partner), so every cluster keeps >= 1
    representative. min_by picks the similarity of the kept pair.
    Work is bounded by the bucketed candidate join (lsh_cosine_candidates)
    — one extra hash aggregation on id_b, no new wide shuffles."""
    pairs = lsh_cosine_candidates(
        df,
        id_col=id_col,
        vec_col=vec_col,
        planes=planes,
        dim=dim,
        seed=seed,
        min_sim=threshold,
    )
    return pairs.groupBy("id_b").agg(
        F.min("id_a").alias("keep_id"),
        F.min_by("sim", "id_a").alias("sim"),
    ).select(F.col("id_b").alias("drop_id"), "keep_id", "sim")


def quantize_int8(
    df: DataFrame,
    *,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Per-vector symmetric int8 scalar quantization — the standard
    vector-compression step before ANN indexing at corpus scale (4x
    smaller than float32, SIMD-friendly dot products downstream):
    ``scale = max(|x|)/127``, ``q_i = clamp(round(x_i/scale), ±127)``.

    Pure narrow projection, zero shuffles, zero UDFs — elementwise
    transform + array_max per row. Rounding is half-up (floor(x+0.5),
    the engine-wide convention) and the all-zero vector quantizes to
    zeros with scale_code 0 (a dequantizer must treat scale_code 0 as
    scale 0, i.e. all-zero reconstruction). Returns (id, qvec
    array<int>, scale_code = round(max|x| * 1e6) as an exact integer —
    float columns are kept out of hashed outputs)."""
    xd = df.select(
        F.col(id_col),
        F.transform(F.col(vec_col), lambda v: v.cast("double")).alias("__v"),
    )
    withmax = xd.select(
        id_col,
        "__v",
        F.array_max(F.transform(F.col("__v"), F.abs)).alias("__max_abs"),
    )
    q = F.transform(
        F.col("__v"),
        lambda x: F.when(
            F.col("__max_abs") > 0,
            F.greatest(
                F.lit(-127),
                F.least(
                    F.lit(127),
                    F.floor(x / (F.col("__max_abs") / F.lit(127.0)) + F.lit(0.5)),
                ),
            ),
        )
        .otherwise(F.lit(0))
        .cast("int"),
    )
    return withmax.select(
        F.col(id_col),
        q.alias("qvec"),
        F.floor(F.col("__max_abs") * F.lit(1e6) + F.lit(0.5))
        .cast("bigint")
        .alias("scale_code"),
    )


def covariance_pairs(
    df: DataFrame,
    *,
    vec_col: str = "embedding",
    dim: int,
    scale: int = 1_000_000_000_000,
    round_dp: int = 8,
) -> DataFrame:
    """One-pass empirical covariance matrix of an embedding column,
    emitted as upper-triangle rows (dim_i, dim_j, cov), i <= j — the
    d x d statistic PCA / whitening / Mahalanobis pipelines need.

    Cross-engine exactness: per row, each pair product v_i*v_j and each
    coordinate v_i are quantized to fixed-point BIGINTs (floor(x*scale
    + 0.5), the engine-wide half-up idiom); the per-cell sums are then
    order-independent integer sums, and cov = E[xy] - E[x]E[y] is ONE
    identical IEEE expression over those exact integers in both
    engines. Quantization error is deterministic and bounded by
    0.5/scale per term (~5e-13) — far below the emitted 8dp rounding.

    Shape at scale: pair generation is a per-row nested transform +
    flatten + explode (no join, no driver), producing d(d+1)/2 narrow
    struct rows per input row that collapse under map-side combine —
    the shuffle carries only d(d+1)/2 cells per map task regardless of
    corpus size. The O(n d^2) flatten work is the price of staying
    declarative/JVM-side; for d in the thousands an Arrow-batched
    outer-product kernel (mapInPandas accumulating X^T X per batch)
    becomes the better trade — at d=64 (2,080 cells) codegen wins.
    Downstream eigensolve is driver-side on the d x d result (bounded:
    d^2 scalars), mirroring the k-means/GD "tiny state on the driver"
    discipline."""
    # Round-12 optimization (guide §2.5 input skew): the O(n d^2) cell
    # generation below is the query's entire cost, and a single-file
    # local embeddings table would run it on ONE core — spread()
    # round-robins an under-partitioned input to the session
    # parallelism (no-op on a healthily partitioned cluster scan; the
    # _shingle_cooccurrence precedent). Measured at sf0.1: 3.9 -> 1.4s
    # noop wall, identical rows (the per-cell sums are integer-exact,
    # partitioning-independent).
    from c3dc_etl_spark.operators.dedup import spread

    df = spread(df)
    s = F.lit(float(scale))
    v = F.col("__v")

    def cell(i: Column, j: Column) -> Column:
        vi = F.element_at(v, i)
        vj = F.element_at(v, j)
        return F.struct(
            i.cast("int").alias("dim_i"),
            j.cast("int").alias("dim_j"),
            F.floor(vi * vj * s + F.lit(0.5)).cast("bigint").alias("p"),
            F.floor(vi * s + F.lit(0.5)).cast("bigint").alias("xi"),
            F.floor(vj * s + F.lit(0.5)).cast("bigint").alias("xj"),
        )

    pairs = (
        df.select(
            F.transform(F.col(vec_col), lambda x: x.cast("double")).alias("__v")
        )
        .select(
            F.explode(
                F.flatten(
                    F.transform(
                        F.sequence(F.lit(1), F.lit(dim)),
                        lambda i: F.transform(
                            F.sequence(i, F.lit(dim)), lambda j: cell(i, j)
                        ),
                    )
                )
            ).alias("c")
        )
        .select("c.*")
    )
    n = F.count(F.lit(1)).cast("double")
    sp = F.sum("p").cast("double")
    sxi = F.sum("xi").cast("double")
    sxj = F.sum("xj").cast("double")
    cov = sp / n / s - (sxi / n / s) * (sxj / n / s)
    return (
        pairs.groupBy("dim_i", "dim_j")
        .agg((F.round(cov, round_dp) + F.lit(0.0)).alias("cov"))
        .select("dim_i", "dim_j", "cov")
    )


def multivector_maxsim_topk(
    queries: DataFrame,
    candidates: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_sub: int = 4,
    dim: int = 64,
    k: int = 10,
) -> DataFrame:
    """Multi-vector late-interaction retrieval (ColBERT-style MaxSim):
    each embedding is treated as ``n_sub`` token sub-vectors of
    dim/n_sub; score(q, c) = sum over query sub-vectors of the MAX
    cosine against any candidate sub-vector, each sub-cosine rounded
    to 4dp and scaled to an e4 BIGINT so the max/sum/rank pipeline is
    integer-exact (no FP summation-order seams in the value hash).

    Plan shape: both sides precompute their sub-vector slices and
    sub-norms per ROW (O(n·dim), not O(pairs·dim)); the query batch is
    broadcast and the n_sub x n_sub interaction matrix is unrolled
    STRUCTURALLY into one whole-stage-codegen projection — no explode,
    no pre-topk shuffle. Cost per pair is the inherent n_sub x n_sub
    sub-dots of late interaction; the only shuffle is the salted
    top-k."""
    if dim % n_sub:
        raise ValueError(f"dim {dim} not divisible by n_sub {n_sub}")
    sub_dim = dim // n_sub

    def prep(df: DataFrame, out_id: str, p: str) -> DataFrame:
        cols = [F.col(id_col).alias(out_id)]
        for i in range(n_sub):
            sv = F.slice(F.col(vec_col), i * sub_dim + 1, sub_dim)
            cols.append(sv.alias(f"{p}v{i}"))
            cols.append(l2_norm(sv).alias(f"{p}n{i}"))
        return df.select(*cols)

    q = prep(queries, "query_id", "q")
    c = prep(candidates, "candidate_id", "c")
    per_query_sub = []
    for i in range(n_sub):
        sub_sims = [
            F.round(
                dot(F.col(f"qv{i}"), F.col(f"cv{j}"))
                / (F.col(f"qn{i}") * F.col(f"cn{j}"))
                * F.lit(10000),
                0,
            ).cast("long")
            for j in range(n_sub)
        ]
        per_query_sub.append(F.greatest(*sub_sims))
    score = per_query_sub[0]
    for s in per_query_sub[1:]:
        score = score + s
    scored = (
        c.join(F.broadcast(q), F.col("candidate_id") != F.col("query_id"))
        .withColumn("score_e4", score)
        .select("query_id", "candidate_id", "score_e4")
    )
    from c3dc_etl_spark.operators.skew import salted_topk

    ranked = salted_topk(
        scored,
        ["query_id"],
        [F.col("score_e4").desc(), F.col("candidate_id").asc()],
        k,
        salt=F.hash(F.col("candidate_id")),
        n_salt=32,
        rank_col="rank",
    )
    return ranked.select(
        "query_id",
        "candidate_id",
        "score_e4",
        F.col("rank").cast("bigint").alias("rank"),
    )


def _flip_bit(bucket: Column, pos: int, planes: int) -> Column:
    """The bucket bit-string with 1-based position ``pos`` flipped."""
    flipped = F.when(
        F.substring(bucket, pos, 1) == F.lit("1"), F.lit("0")
    ).otherwise(F.lit("1"))
    return F.concat(
        F.substring(bucket, 1, pos - 1),
        flipped,
        F.substring(bucket, pos + 1, planes - pos),
    )


def lsh_multiprobe_topk(
    queries: DataFrame,
    candidates: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    planes: int = 8,
    dim: int = 64,
    seed: str = "srp",
    k: int = 10,
    round_dp: int = 4,
) -> DataFrame:
    """Multi-probe SRP-LSH top-k: each query probes its own sign-bit
    bucket PLUS every Hamming-distance-1 neighbor (the planes buckets
    with one bit flipped) — Lv et al.'s multi-probe trick: near
    neighbors that land one hyperplane away are recovered WITHOUT
    doubling the table count that classic banding needs. Candidates
    keep exactly one bucket (one table in memory); the probe set is
    planes+1 distinct keys per query, so the join stays an equi-join
    on bucket with work proportional to probed-bucket sizes, never
    n^2. Exact rounded cosine on the probed candidates, then salted
    per-query top-k."""
    matrix = srp_planes(planes, dim, seed)
    c = candidates.select(
        F.col(id_col).alias("candidate_id"),
        F.col(vec_col).alias("c_vec"),
        l2_norm(F.col(vec_col)).alias("c_norm"),
        srp_bucket(F.col(vec_col), matrix).alias("bucket"),
    )
    base = srp_bucket(F.col(vec_col), matrix)
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("q_vec"),
        l2_norm(F.col(vec_col)).alias("q_norm"),
        F.explode(
            F.array(base, *[_flip_bit(base, p + 1, planes) for p in range(planes)])
        ).alias("bucket"),
    )
    sim = dot(F.col("q_vec"), F.col("c_vec")) / (
        F.col("q_norm") * F.col("c_norm")
    )
    scored = (
        c.join(F.broadcast(q), ["bucket"])
        .filter(F.col("candidate_id") != F.col("query_id"))
        .withColumn("sim", F.round(sim, round_dp) + F.lit(0.0))
        .select("query_id", "candidate_id", "sim")
    )
    from c3dc_etl_spark.operators.skew import salted_topk

    ranked = salted_topk(
        scored,
        ["query_id"],
        [F.col("sim").desc(), F.col("candidate_id").asc()],
        k,
        salt=F.hash(F.col("candidate_id")),
        n_salt=32,
        rank_col="rank",
    )
    return ranked.select(
        "query_id",
        "candidate_id",
        "sim",
        F.col("rank").cast("bigint").alias("rank"),
    )

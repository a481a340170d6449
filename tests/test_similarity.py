"""Unit tests for c3dc_etl_spark.operators.similarity."""

from __future__ import annotations

from pyspark.sql import functions as F

from c3dc_etl_spark.operators import similarity as S


def _vecs(spark, rows):
    return spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in enumerate(rows)],
        "vec_id long, embedding array<double>",
    )


def test_dot_and_norm(spark):
    df = _vecs(spark, [[3.0, 4.0]])
    row = df.select(
        S.dot(F.col("embedding"), F.col("embedding")).alias("d"),
        S.l2_norm(F.col("embedding")).alias("n"),
    ).collect()[0]
    assert row["d"] == 25.0
    assert row["n"] == 5.0


def test_cosine_topk_exact_neighbors(spark):
    # 0 aligned with 1, orthogonal to 2, opposite to 3
    df = _vecs(spark, [[1, 0], [2, 0], [0, 1], [-1, 0]])
    out = S.cosine_topk(df.filter("vec_id = 0"), df, k=3)
    rows = {r["candidate_id"]: (r["sim"], r["rank"]) for r in out.collect()}
    assert rows[1] == (1.0, 1)
    assert rows[2] == (0.0, 2)
    assert rows[3] == (-1.0, 3)


def test_lsh_srp_invariants(spark):
    # 0 and 1 identical -> every projection equal -> same bucket;
    # 2 is the exact negation -> every projection negates -> different
    # bucket (components chosen with odd sum so no +-1 combination of
    # them is zero, i.e. no sign boundary)
    df = _vecs(spark, [[2, 3, 5, 7], [2, 3, 5, 7], [-2, -3, -5, -7]])
    out = S.lsh_cosine_candidates(df, planes=4, dim=4, min_sim=-1.0)
    pairs = {(r["id_a"], r["id_b"]) for r in out.collect()}
    assert (0, 1) in pairs
    assert all(2 not in p for p in pairs)


def test_lsh_srp_recall_on_clustered_vectors(spark):
    """Near-duplicate vectors (tiny perturbation) must mostly share
    buckets under the seeded plane matrix — the LSH property the
    round-1 sign-of-first-dims shortcut could not guarantee.
    Deterministic: fixed vectors + fixed seed."""
    base = [
        [((i * 7 + j * 13) % 19) - 9.5 for j in range(8)] for i in range(20)
    ]
    rows = []
    for i, v in enumerate(base):
        rows.append((2 * i, v))
        rows.append((2 * i + 1, [v[0] + 1e-3] + v[1:]))  # near-dup
    df = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in rows],
        "vec_id long, embedding array<double>",
    )
    out = S.lsh_cosine_candidates(df, planes=4, dim=8, min_sim=-1.0)
    pairs = {(r["id_a"], r["id_b"]) for r in out.collect()}
    hits = sum((2 * i, 2 * i + 1) in pairs for i in range(20))
    assert hits >= 16  # near-dups overwhelmingly co-bucketed


def test_ivf_probes_only_nearest_clusters(spark):
    # two clean clusters around e1 and e2; nprobe=1 must search only
    # the query's own cluster
    centroids = [(0, [1.0, 0.0, 0.0]), (1, [0.0, 1.0, 0.0])]
    df = _vecs(
        spark,
        [
            [10, 1, 0],   # 0: cluster-0 query
            [9, 0.5, 0],  # 1: cluster 0
            [8, -1, 0],   # 2: cluster 0
            [0.5, 9, 0],  # 3: cluster 1
            [0, 8, 1],    # 4: cluster 1
        ],
    )
    out = S.ivf_cosine_topk(
        df.filter("vec_id = 0"), df, centroids, nprobe=1, k=10
    ).collect()
    found = {r["candidate_id"] for r in out}
    assert found == {1, 2}  # cluster-1 members never compared
    ranks = {r["candidate_id"]: r["rank"] for r in out}
    assert ranks[1] == 1  # nearest first
    # nprobe=2 widens the probe to both clusters
    out2 = S.ivf_cosine_topk(df.filter("vec_id = 0"), df, centroids, nprobe=2, k=10)
    assert {r["candidate_id"] for r in out2.collect()} == {1, 2, 3, 4}


def test_embedding_near_dup_keeps_cluster_representative(spark):
    # two tight clusters (0,1,2) and (3,4) plus an outlier 5: every
    # non-minimal cluster member is dropped against the cluster minimum,
    # the minima and the outlier survive
    # chosen so no vector projects to exactly 0 on any of the 4 seeded
    # planes (a boundary projection makes the sign bit float-noise
    # sensitive under scaling)
    base_a = [1.0, 0.2, -0.3, 0.7]
    base_b = [-0.8, 0.5, 0.2, -0.4]
    rows = [
        base_a,
        [x * 1.001 for x in base_a],
        [x * 0.999 for x in base_a],
        base_b,
        [x * 1.002 for x in base_b],
        [0.3, -1.0, 1.0, 0.1],
    ]
    out = S.embedding_near_dup(
        _vecs(spark, rows), planes=4, dim=4, threshold=0.999
    )
    got = {r["drop_id"]: r["keep_id"] for r in out.collect()}
    assert got == {1: 0, 2: 0, 4: 3}


def test_quantize_int8_roundtrip_bounds(spark):
    from c3dc_etl_spark.operators.similarity import quantize_int8

    df = spark.createDataFrame(
        [
            (1, [1.0, -0.5, 0.25, 0.0]),
            (2, [0.0, 0.0, 0.0, 0.0]),      # zero vector -> zeros, NULL scale
            (3, [-2.0, 2.0, 1.0, -1.0]),
        ],
        "vec_id long, embedding array<float>",
    )
    rows = {r["vec_id"]: r for r in quantize_int8(df).collect()}
    assert rows[1]["qvec"] == [127, -63, 32, 0]   # half-up: -63.5 -> -63, 31.75 -> 32
    assert rows[1]["scale_code"] == 1_000_000
    assert rows[2]["qvec"] == [0, 0, 0, 0] and rows[2]["scale_code"] == 0
    assert rows[3]["qvec"] == [-127, 127, 64, -63]
    assert all(-127 <= v <= 127 for r in rows.values() for v in r["qvec"])


def test_filtered_topk_restricts_to_matching_metadata(spark):
    # labels split the space; each query must only see its own label's
    # candidates, ranked within the filtered set (pre-filtering).
    rows = [
        (0, [1.0, 0.0], "a"),
        (1, [0.9, 0.1], "a"),
        (2, [1.0, 0.01], "b"),   # closest vector overall, wrong label
        (3, [0.0, 1.0], "a"),
        (4, [0.5, 0.5], "b"),
    ]
    df = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label string"
    )
    out = S.cosine_topk(
        df.filter("vec_id = 0"), df, k=2, match_cols=["label"]
    ).collect()
    got = [(r["candidate_id"], r["rank"]) for r in sorted(out, key=lambda r: r["rank"])]
    assert got == [(1, 1), (3, 2)]  # 2 and 4 excluded despite higher sim


def test_covariance_pairs_small_exact(spark):
    # hand-checkable 2-d case: cov([(1,2),(3,4),(5,6)]) has
    # var(x)=var(y)=8/3, cov(x,y)=8/3 (population covariance)
    df = _vecs(spark, [[1.0, 2.0], [3.0, 4.0], [5.0, 6.0]])
    got = {
        (r["dim_i"], r["dim_j"]): r["cov"]
        for r in S.covariance_pairs(df, dim=2).collect()
    }
    expect = round(8 / 3, 8)
    assert got == {(1, 1): expect, (1, 2): expect, (2, 2): expect}


def test_covariance_power_iteration_finds_principal_axis(spark):
    # vectors spread along the (1, 1)/sqrt(2) axis with small noise:
    # the driver-side eigensolve over the d x d covariance result (the
    # PCA step this operator feeds) must recover that axis, and the top
    # eigenvalue must dominate every per-dim variance.
    rows = []
    for t in range(-10, 11):
        rows.append([float(t) + 0.1, float(t) - 0.1])
    df = _vecs(spark, rows)
    cells = {
        (r["dim_i"], r["dim_j"]): r["cov"]
        for r in S.covariance_pairs(df, dim=2).collect()
    }
    cov = [
        [cells[(1, 1)], cells[(1, 2)]],
        [cells[(1, 2)], cells[(2, 2)]],
    ]
    v = [1.0, 0.0]
    for _ in range(50):  # power iteration, driver-side on the 2x2 result
        w = [sum(cov[i][j] * v[j] for j in range(2)) for i in range(2)]
        nrm = (w[0] ** 2 + w[1] ** 2) ** 0.5
        v = [x / nrm for x in w]
    lam = sum(v[i] * sum(cov[i][j] * v[j] for j in range(2)) for i in range(2))
    assert abs(abs(v[0]) - abs(v[1])) < 0.01          # the diagonal axis
    assert lam > cov[0][0] and lam > cov[1][1]        # dominates axis variances


def test_multivector_maxsim_hand_vectors(spark):
    """MaxSim on constructed 4-dim vectors with 2 sub-vectors: the
    score must be the SUM over query subs of the MAX sub-cosine, not a
    full-vector cosine. Query [1,0 | 0,1]: candidate A matches sub-1
    exactly and sub-2 exactly (score 2.0 -> 20000e4); candidate B
    matches sub-1 exactly but anti-matches sub-2 via its best sub
    (max(cos)=0 -> score 1.0)."""
    q = _vecs(spark, [[1.0, 0.0, 0.0, 1.0]])
    cands = spark.createDataFrame(
        [
            (10, [1.0, 0.0, 0.0, 1.0]),   # A: both subs perfect
            (11, [0.0, 1.0, 0.0, -1.0]),  # B: sub1 max = max(cos([1,0],[0,1]), cos([1,0],[0,-1])) = 0
        ],
        "vec_id long, embedding array<double>",
    )
    out = {
        r["candidate_id"]: r["score_e4"]
        for r in S.multivector_maxsim_topk(
            q, cands, n_sub=2, dim=4, k=5
        ).collect()
    }
    assert out[10] == 20000  # 2 subs x cos 1.0 x 1e4
    # B: q-sub1 [1,0] best over {[0,1],[0,-1]} = 0; q-sub2 [0,1] best
    # over the same = 1.0 -> total 1.0
    assert out[11] == 10000


def test_multivector_maxsim_rejects_bad_dims(spark):
    q = _vecs(spark, [[1.0, 0.0, 0.0]])
    import pytest as _pytest

    with _pytest.raises(ValueError, match="not divisible"):
        S.multivector_maxsim_topk(q, q, n_sub=2, dim=3)


def test_multiprobe_buckets_are_base_plus_hamming1(spark):
    """The probe set must be the query's own bucket plus exactly the
    ``planes`` distinct one-bit flips — recovered neighbors one
    hyperplane away join on EQUALITY, so a wrong flip silently loses
    recall; pin the expansion itself."""
    df = _vecs(spark, [[1.0] * 8])
    matrix = S.srp_planes(4, 8, "t")
    base = df.select(S.srp_bucket(F.col("embedding"), matrix).alias("b"))
    base_bucket = base.collect()[0]["b"]
    from c3dc_etl_spark.operators.similarity import _flip_bit

    probes = df.select(
        F.array(
            S.srp_bucket(F.col("embedding"), matrix),
            *[
                _flip_bit(S.srp_bucket(F.col("embedding"), matrix), p + 1, 4)
                for p in range(4)
            ],
        ).alias("ps")
    ).collect()[0]["ps"]
    assert len(probes) == 5 and len(set(probes)) == 5
    assert probes[0] == base_bucket
    for i, p in enumerate(probes[1:]):
        diff = [a != b for a, b in zip(p, base_bucket)]
        assert sum(diff) == 1 and diff[i]


def test_multiprobe_recovers_one_plane_miss(spark):
    """A candidate whose bucket differs from the query's in exactly one
    bit is INVISIBLE to single-bucket LSH but must be found by the
    multi-probe search."""
    import random

    rng = random.Random(7)
    rows = [[rng.uniform(-1, 1) for _ in range(8)] for _ in range(40)]
    df = _vecs(spark, rows)
    matrix = S.srp_planes(4, 8, "t")
    buckets = {
        r["vec_id"]: r["b"]
        for r in df.select(
            "vec_id", S.srp_bucket(F.col("embedding"), matrix).alias("b")
        ).collect()
    }
    # pick a query and a candidate at Hamming distance exactly 1
    pair = next(
        (q, c)
        for q in buckets
        for c in buckets
        if q != c
        and sum(a != b for a, b in zip(buckets[q], buckets[c])) == 1
    )
    q_id, c_id = pair
    queries = df.filter(F.col("vec_id") == q_id)
    got = S.lsh_multiprobe_topk(
        queries, df, planes=4, dim=8, seed="t", k=40
    )
    found = {r["candidate_id"] for r in got.collect()}
    assert c_id in found

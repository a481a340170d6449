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


def test_lsh_bucketing_only_pairs_same_sign_pattern(spark):
    df = _vecs(spark, [[1, 1, 1, 1], [2, 3, 4, 5], [-1, 1, 1, 1]])
    out = S.lsh_cosine_candidates(df, planes=4, min_sim=-1.0)
    pairs = {(r["id_a"], r["id_b"]) for r in out.collect()}
    assert (0, 1) in pairs  # same sign bucket "1111"
    assert all(2 not in p for p in pairs)  # "0111" bucket differs

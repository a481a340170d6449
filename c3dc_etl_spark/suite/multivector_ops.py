"""Round-10 growth tier, ANN leg: multi-vector late-interaction
retrieval (MaxSim) and multi-probe SRP-LSH — the two retrieval shapes
the r9 verdict named as growth candidates. Both ride the embeddings
table and the existing similarity operator kernels.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from c3dc_etl_spark.operators import similarity as S
from c3dc_etl_spark.suite.registry import load, query
from c3dc_etl_spark.suite.similarity_ops import (
    EMB_DIM,
    N_QUERIES,
    SRP_PLANES,
    TOP_K,
    _bucket_sql,
    _fold_dot,
)

N_SUB = 4
SUB_DIM = EMB_DIM // N_SUB


def _fold_sub(a: str, b: str) -> str:
    """Sequential fold dot over one SUB_DIM-dim sub-vector — same
    evaluation order as Spark's zip_with+aggregate on the slice."""
    return (
        f"LIST_REDUCE(LIST_PREPEND(0.0, LIST_TRANSFORM(RANGE(1, {SUB_DIM + 1}),"
        f" k -> {a}[k] * {b}[k])), (acc, x) -> acc + x)"
    )


_MAXSIM_ORACLE = f"""
WITH q0 AS MATERIALIZED (
    SELECT vec_id AS query_id, embedding::DOUBLE[] AS v
    FROM embeddings WHERE vec_id < {N_QUERIES}
),
c0 AS MATERIALIZED (
    SELECT vec_id AS candidate_id, embedding::DOUBLE[] AS v FROM embeddings
),
qs AS MATERIALIZED (
    SELECT query_id, i.range AS qi,
           v[((i.range - 1) * {SUB_DIM} + 1):(i.range * {SUB_DIM})] AS qv
    FROM q0, RANGE(1, {N_SUB + 1}) i
),
qsn AS MATERIALIZED (
    SELECT query_id, qi, qv, SQRT({_fold_sub('qv', 'qv')}) AS qn FROM qs
),
cs AS MATERIALIZED (
    SELECT candidate_id, j.range AS cj,
           v[((j.range - 1) * {SUB_DIM} + 1):(j.range * {SUB_DIM})] AS cv
    FROM c0, RANGE(1, {N_SUB + 1}) j
),
csn AS MATERIALIZED (
    SELECT candidate_id, cj, cv, SQRT({_fold_sub('cv', 'cv')}) AS cn FROM cs
),
permax AS (
    SELECT q.query_id, c.candidate_id, q.qi,
           MAX(CAST(ROUND(({_fold_sub('q.qv', 'c.cv')} / (q.qn * c.cn))
                          * 10000, 0) AS BIGINT)) AS m
    FROM qsn q JOIN csn c ON c.candidate_id <> q.query_id
    GROUP BY q.query_id, c.candidate_id, q.qi
),
scored AS (
    SELECT query_id, candidate_id, CAST(SUM(m) AS BIGINT) AS score_e4
    FROM permax GROUP BY query_id, candidate_id
)
SELECT query_id, candidate_id, score_e4, CAST(rank AS BIGINT) AS rank
FROM (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                 ORDER BY score_e4 DESC, candidate_id ASC)
              AS rank
    FROM scored
)
WHERE rank <= {TOP_K}
"""


@query("ann_multivector_maxsim", oracle=_MAXSIM_ORACLE, tags=("similarity",))
def ann_multivector_maxsim(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-vector late-interaction top-k (ColBERT MaxSim): each
    embedding = {N_SUB} token sub-vectors; score = sum over query subs
    of the max sub-cosine, e4-integer-exact end to end. The n_sub x
    n_sub interaction is unrolled structurally into one codegen
    projection over the broadcast query batch — no explode, no
    pre-topk shuffle (operators/similarity.py multivector_maxsim_topk)."""
    emb = load(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < N_QUERIES)
    return S.multivector_maxsim_topk(
        queries, emb, n_sub=N_SUB, dim=EMB_DIM, k=TOP_K
    )


_MULTIPROBE_ORACLE = f"""
WITH b AS MATERIALIZED (
    SELECT vec_id AS id, embedding::DOUBLE[] AS vec,
           SQRT({_fold_dot('(embedding::DOUBLE[])', '(embedding::DOUBLE[])')}) AS nrm,
           {_bucket_sql('(embedding::DOUBLE[])')} AS bucket
    FROM embeddings
),
probes AS (
    SELECT id AS query_id, vec AS qv, nrm AS qn,
           CASE WHEN p.range = 0 THEN bucket
                ELSE substr(bucket, 1, p.range - 1)
                     || (CASE WHEN substr(bucket, p.range, 1) = '1'
                              THEN '0' ELSE '1' END)
                     || substr(bucket, p.range + 1)
           END AS bucket
    FROM b, RANGE(0, {SRP_PLANES + 1}) p
    WHERE id < {N_QUERIES}
),
scored AS (
    SELECT q.query_id, c.id AS candidate_id,
           ROUND({_fold_dot('q.qv', 'c.vec')} / (q.qn * c.nrm), 4) + 0.0 AS sim
    FROM b c JOIN probes q ON c.bucket = q.bucket AND c.id <> q.query_id
)
SELECT query_id, candidate_id, sim, CAST(rank AS BIGINT) AS rank
FROM (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                 ORDER BY sim DESC, candidate_id ASC) AS rank
    FROM scored
)
WHERE rank <= {TOP_K}
"""


@query("ann_multiprobe_lsh", oracle=_MULTIPROBE_ORACLE, tags=("similarity",))
def ann_multiprobe_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-probe SRP-LSH top-k (Lv et al., VLDB'07): queries probe
    their sign-bit bucket plus all Hamming-1 neighbors, recovering
    near neighbors one hyperplane away WITHOUT extra hash tables —
    candidates keep ONE bucket, the probe set is planes+1 keys per
    query, and the search stays an equi-join on bucket whose work
    scales with probed-bucket sizes, never n^2."""
    emb = load(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < N_QUERIES)
    return S.lsh_multiprobe_topk(
        queries, emb, planes=SRP_PLANES, dim=EMB_DIM, seed="srp", k=TOP_K
    )

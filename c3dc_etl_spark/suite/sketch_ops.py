"""Deterministic cardinality sketch (KMV / k-minimum-values).

``approx_count_distinct`` (HyperLogLog++) is the built-in answer, but
its estimates are engine-internal and cannot be value-hash-verified
against another engine. KMV is the oracle-friendly sketch: hash every
value with the portable 32-bit md5 hash, keep the k smallest DISTINCT
hash values, and estimate the cardinality as (k-1) / r_k where r_k is
the k-th minimum normalized to [0, 1). Same hash -> same k minima ->
bit-identical estimate in Spark and DuckDB — a sketch whose ACCURACY
contract is testable, not just its output shape.

Scale design: the k-minima selection is the classic mergeable-sketch
shape — per-partition partial minima merge associatively. Here it runs
as a two-phase ranked selection (salted local top-k, then a global
top-k over <= salt_buckets * k survivor rows per key), the same
reducer-bounded pattern as cosine_topk: no key ever sees more than
salt_buckets * k rows in one task, and the distinct() before ranking
carries narrow (key, int) pairs only.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from c3dc_etl_spark.operators.dedup import hash32
from c3dc_etl_spark.operators.skew import salted_topk
from c3dc_etl_spark.suite.registry import load, query

K = 64
SALT_BUCKETS = 16
HASH_SPACE = float(1 << 32)

_KMV_ORACLE = f"""
WITH pairs AS (
    SELECT DISTINCT event_type,
           CAST(CONCAT('0x', SUBSTR(MD5(CAST(user_id AS VARCHAR)), 1, 8))
                AS BIGINT) AS h
    FROM events
),
ranked AS (
    SELECT event_type, h,
           ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY h) AS rn
    FROM pairs
),
kth AS (
    SELECT event_type, MAX(h) AS kth_min
    FROM ranked WHERE rn <= {K}
    GROUP BY 1
),
nd AS (
    SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_distinct FROM pairs GROUP BY 1
)
SELECT event_type,
       n_distinct AS n_distinct_exact,
       CAST(kth_min AS BIGINT) AS kth_min,
       CAST(CASE WHEN n_distinct <= {K} THEN n_distinct * 100
                 ELSE FLOOR({K - 1}.0 * {HASH_SPACE!r} / kth_min * 100 + 0.5)
            END AS BIGINT) AS est_centi
FROM nd JOIN kth USING (event_type)
"""


@query("sketch_kmv_distinct", oracle=_KMV_ORACLE, tags=("sketch", "dedup"))
def sketch_kmv_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KMV distinct-user estimate per event_type, next to the exact
    count so the hash pins BOTH the sketch mechanics (the k-th minimum
    hash, exact integer) and the estimate (fixed-point centi units,
    IEEE-identical in both engines). Groups with <= k distinct values
    degrade to the exact count, as a real KMV does."""
    ev = load(spark, sf_dir, "events")
    pairs = ev.select(
        "event_type", hash32(F.col("user_id").cast("string")).alias("h")
    ).distinct()
    topk = salted_topk(
        pairs,
        ["event_type"],
        [F.col("h").asc()],
        K,
        salt=F.col("h"),
        n_salt=SALT_BUCKETS,
    )
    kth = topk.groupBy("event_type").agg(F.max("h").alias("kth_min"))
    nd = pairs.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_distinct_exact")
    )
    est = F.when(
        F.col("n_distinct_exact") <= K, F.col("n_distinct_exact") * 100
    ).otherwise(
        F.floor(
            F.lit(float(K - 1)) * F.lit(HASH_SPACE) / F.col("kth_min") * 100
            + F.lit(0.5)
        )
    )
    return nd.join(kth, "event_type").select(
        "event_type",
        "n_distinct_exact",
        F.col("kth_min").cast("bigint").alias("kth_min"),
        est.cast("bigint").alias("est_centi"),
    )

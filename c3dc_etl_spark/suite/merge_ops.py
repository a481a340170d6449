"""Merge-layer suite queries (D1/D2 through c3dc_etl_spark.merge).

The fingerprint invariance claim is proven by the oracle hash-match
itself: the Spark side derives TWO variants of the same records with
DIFFERENT volatile ids and fingerprints them through
merge.canonical_fingerprint; the oracle recomputes the canonical hash
from scratch in SQL. Equal results require that the id perturbation had
no effect on the engine's hash.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from c3dc_etl_spark.merge import canonical_fingerprint, first_wins_merge
from c3dc_etl_spark.schema.registry import SchemaRegistry
from c3dc_etl_spark.suite.registry import load, query

REG = SchemaRegistry()

# events -> diagnosis-shaped records (deterministic derivation shared
# with the oracle)
_DX_SQL = (
    "CASE event_type WHEN 'click' THEN '8000/0 : Neoplasm, benign'"
    " WHEN 'view' THEN '9500/3 : Neuroblastoma, NOS'"
    " WHEN 'purchase' THEN '8000/3 : Neoplasm, malignant'"
    " WHEN 'error' THEN '9861/3 : Acute myeloid leukemia, NOS'"
    " ELSE '9811/3 : B lymphoblastic leukemia/lymphoma, NOS' END"
)
_AGE_SQL = "CAST(COALESCE(FLOOR(value), -1) AS BIGINT)"

# canonical part order = sorted diagnosis prop names present:
# age_at_diagnosis, diagnosis, tumor_classification
_FP_SQL = (
    "MD5(CONCAT_WS(CHR(31), CAST(age_at_diagnosis AS STRING), diagnosis,"
    " tumor_classification))"
)

_FP_INVARIANCE_ORACLE = f"""
WITH recs AS (
    SELECT event_id, CAST(user_id AS STRING) AS participant_id,
           {_DX_SQL} AS diagnosis,
           {_AGE_SQL} AS age_at_diagnosis,
           'Primary' AS tumor_classification
    FROM events
),
variants AS (
    SELECT 'a' || CAST(event_id AS STRING) AS diagnosis_id, * FROM recs
    UNION ALL
    SELECT 'b' || CAST(event_id AS STRING) AS diagnosis_id, * FROM recs
),
fp AS (
    SELECT {_FP_SQL} AS fingerprint FROM variants
)
SELECT fingerprint, CAST(COUNT(*) AS BIGINT) AS n
FROM fp
GROUP BY fingerprint
"""


@query("merge_fingerprint_invariance", oracle=_FP_INVARIANCE_ORACLE, tags=("merge", "dedup"))
def merge_fingerprint_invariance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D1 through merge.canonical_fingerprint: the same payload tagged
    with two different volatile ids ('a<N>' vs 'b<N>') must produce the
    same canonical hash — own id and link ids are excluded (the
    reference blanks them before sha1, etl/target/c3dc_etl.py:278-313).
    Every content fingerprint therefore appears an even number of
    times."""
    events = load(spark, sf_dir, "events")
    recs = events.select(
        "event_id",
        F.col("user_id").cast("string").alias("participant_id"),
        F.expr(_DX_SQL).alias("diagnosis"),
        F.expr(_AGE_SQL).cast("bigint").alias("age_at_diagnosis"),
        F.lit("Primary").alias("tumor_classification"),
    )
    variant = lambda tag: recs.select(  # noqa: E731
        F.concat(F.lit(tag), F.col("event_id").cast("string")).alias("diagnosis_id"),
        "participant_id",
        "diagnosis",
        "age_at_diagnosis",
        "tumor_classification",
    )
    unioned = variant("a").unionByName(variant("b"))
    fp = canonical_fingerprint(
        "diagnosis", REG, frame_columns=unioned.columns
    )
    return (
        unioned.select(fp.alias("fingerprint"))
        .groupBy("fingerprint")
        .agg(F.count(F.lit(1)).alias("n"))
    )


_FIRST_WINS_ORACLE = f"""
WITH recs AS (
    SELECT event_id, CAST(user_id AS STRING) AS participant_id,
           {_DX_SQL} AS diagnosis,
           {_AGE_SQL} AS age_at_diagnosis,
           'Primary' AS tumor_classification
    FROM events
),
unioned AS (
    SELECT 'a' || CAST(event_id AS STRING) AS diagnosis_id, *, 1 AS ord
    FROM recs WHERE event_id % 3 = 0
    UNION ALL
    SELECT 'b' || CAST(event_id AS STRING) AS diagnosis_id, *, 2 AS ord
    FROM recs WHERE event_id % 3 <> 2
),
fp AS (
    SELECT *, {_FP_SQL} AS fingerprint FROM unioned
)
SELECT participant_id, diagnosis, age_at_diagnosis, fingerprint,
       CAST(ord AS INT) AS won_ord, diagnosis_id
FROM (
    SELECT *, ROW_NUMBER() OVER (
                PARTITION BY fingerprint, participant_id
                ORDER BY ord ASC, diagnosis_id ASC
              ) AS rn
    FROM fp
)
WHERE rn = 1
"""


@query("merge_first_wins_engine", oracle=_FIRST_WINS_ORACLE, tags=("merge", "dedup"))
def merge_first_wins_engine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D2 through merge.first_wins_merge: two overlapping transformation
    slices union with an ordinal; per (canonical fingerprint,
    participant) the earliest transformation's record wins, ties inside
    a transformation resolved by node id — one window over the
    fingerprint hash partitioning replaces the reference's O(N^2)
    merged-list scans (etl/target/c3dc_etl.py:2126-2227)."""
    events = load(spark, sf_dir, "events")
    recs = events.select(
        "event_id",
        F.col("user_id").cast("string").alias("participant_id"),
        F.expr(_DX_SQL).alias("diagnosis"),
        F.expr(_AGE_SQL).cast("bigint").alias("age_at_diagnosis"),
        F.lit("Primary").alias("tumor_classification"),
    )

    def slice_(tag: str, pred):
        return recs.filter(pred).select(
            F.concat(F.lit(tag), F.col("event_id").cast("string")).alias("diagnosis_id"),
            "participant_id",
            "diagnosis",
            "age_at_diagnosis",
            "tumor_classification",
        )

    merged = first_wins_merge(
        [
            slice_("a", F.col("event_id") % 3 == 0),
            slice_("b", F.col("event_id") % 3 != 2),
        ],
        "diagnosis",
        REG,
        key_cols=("participant_id",),
    )
    return merged.select(
        "participant_id",
        "diagnosis",
        "age_at_diagnosis",
        "fingerprint",
        F.col("won_ord").cast("int").alias("won_ord"),
        "diagnosis_id",
    )

"""Full-study plan suite query: the reference's entire purpose —
sources -> mapping program -> per-node builds -> parent links -> link
wiring -> duplicate-id assertions — in ONE oracle-checked row
(plans/study.py run_study; reference etl/ccdi/c3dc_etl.py:1506-1513).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from c3dc_etl_spark.plans.study import run_study
from c3dc_etl_spark.schema.registry import SchemaRegistry
from c3dc_etl_spark.suite.registry import load, query

REG = SchemaRegistry()

_SEX_SQL = "c_mktsegment"
_CODE_SQL = (
    "CASE o_orderkey % 3 WHEN 0 THEN '8000/0' WHEN 1 THEN '9500/3' ELSE 'bogus' END"
)
_AGE_SQL = "CAST(o_orderkey % 20000 AS STRING)"

STUDY_MAPPINGS = [
    {"output_field": "participant.participant_id", "source_field": "src_pid"},
    {
        "output_field": "participant.sex_at_birth",
        "source_field": "src_sex",
        "replacement_values": [
            {"old_value": "building", "new_value": "Female"},
            {"old_value": "automobile", "new_value": "Male"},
            {"old_value": "+", "new_value": "Unknown"},
        ],
    },
    {"output_field": "diagnosis.diagnosis_id", "source_field": "src_dxid"},
    {
        "output_field": "diagnosis.diagnosis",
        "source_field": "src_code",
        "replacement_values": [
            {"old_value": "+", "new_value": "{find_enum_value}"},
            {"old_value": "bogus", "new_value": "9861/3 : Acute myeloid leukemia, NOS"},
        ],
    },
    {"output_field": "diagnosis.age_at_diagnosis", "source_field": "src_age"},
    {"output_field": "diagnosis.tumor_classification", "source_field": "[Primary]"},
]

_DIAG_PVS = REG.enum_values("diagnosis", "diagnosis")
_ENUM_CODE_WHENS = " ".join(
    f"WHEN '{pv.split(' : ', 1)[0].strip().casefold()}' THEN '{pv}'"
    for pv in _DIAG_PVS
    if " : " in pv
)

_STUDY_ORACLE = f"""
WITH part AS (
    SELECT CAST(c_custkey AS VARCHAR) AS participant_id,
           COALESCE(
             CASE WHEN LOWER(TRIM({_SEX_SQL})) = 'building' THEN 'Female' END,
             CASE WHEN LOWER(TRIM({_SEX_SQL})) = 'automobile' THEN 'Male' END,
             CASE WHEN TRIM({_SEX_SQL}) <> '' THEN 'Unknown' END
           ) AS sex_at_birth
    FROM customer
    WHERE TRIM(CAST(c_custkey AS VARCHAR)) <> ''
),
diag_src AS (
    SELECT 'dx' || CAST(o_orderkey AS VARCHAR) AS diagnosis_id,
           CAST(o_custkey AS VARCHAR) AS pid,
           {_CODE_SQL} AS src_code,
           {_AGE_SQL} AS src_age
    FROM orders
),
diag AS (
    SELECT diagnosis_id, pid,
           COALESCE(
             CASE WHEN TRIM(src_code) <> ''
                  THEN (CASE LOWER(TRIM(src_code)) {_ENUM_CODE_WHENS} END) END,
             CASE WHEN LOWER(TRIM(src_code)) = 'bogus'
                  THEN '9861/3 : Acute myeloid leukemia, NOS' END
           ) AS diagnosis,
           CAST(FLOOR(TRY_CAST(src_age AS DOUBLE) + 0.5) AS BIGINT) AS age
    FROM diag_src
),
diag_ok AS (
    SELECT * FROM diag
    WHERE diagnosis IS NOT NULL AND TRIM(diagnosis) <> ''
      AND TRIM(diagnosis_id) <> ''
),
linked AS (
    SELECT pid,
           ARRAY_TO_STRING(LIST_SORT(LIST(diagnosis_id)), ';') AS dx_ids,
           CAST(COUNT(*) AS BIGINT) AS n_dx,
           CAST(SUM(age) AS BIGINT) AS sum_dx_age,
           MIN(diagnosis) AS min_diagnosis
    FROM diag_ok
    GROUP BY pid
)
SELECT p.participant_id,
       p.sex_at_birth,
       COALESCE(l.dx_ids, '') AS dx_ids,
       CAST(COALESCE(l.n_dx, 0) AS BIGINT) AS n_dx,
       l.sum_dx_age,
       l.min_diagnosis
FROM part p
LEFT JOIN linked l ON p.participant_id = l.pid
"""


@query("study_end_to_end", oracle=_STUDY_ORACLE, tags=("engine", "plan"))
def study_end_to_end(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The whole reference flow through plans.study.run_study: a
    two-node mapping program (participant from customer, diagnosis from
    orders) with X2 static mapping validation, per-node compiled builds
    (replacement chains, {find_enum_value} fall-through, int
    conversion, literal source, P6 filters), the child's to-parent
    scalar link carried per-row (parent_links), the parent's to-many
    diagnosis_id array wired by link.wire_links (R5/J1, one
    groupBy(collect) shuffle), and D3/D4 duplicate-id assertions. The
    result flattens the wired participant frame (child-id array
    serialized, sorted) joined to per-participant child aggregates —
    proving both node frames AND the wiring in one hash."""
    cust = load(spark, sf_dir, "customer")
    orders = load(spark, sf_dir, "orders")
    part_src = cust.select(
        F.col("c_custkey").cast("string").alias("src_pid"),
        F.expr(_SEX_SQL).alias("src_sex"),
    )
    diag_src = orders.select(
        F.concat(F.lit("dx"), F.col("o_orderkey").cast("string")).alias("src_dxid"),
        F.col("o_custkey").cast("string").alias("src_custkey"),
        F.expr(_CODE_SQL).alias("src_code"),
        F.expr(_AGE_SQL).alias("src_age"),
    )
    frames = run_study(
        spark,
        sources={"participant": part_src, "diagnosis": diag_src},
        mappings=STUDY_MAPPINGS,
        uuid_seed="study3",
        registry=REG,
        parent_links={"diagnosis": ("participant", "src_custkey")},
        assert_unique_ids=True,
    )
    part, diag = frames["participant"], frames["diagnosis"]
    agg = (
        diag.groupBy(F.col("`participant.participant_id`").alias("pid"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_dx"),
            F.sum("age_at_diagnosis").cast("bigint").alias("sum_dx_age"),
            F.min("diagnosis").alias("min_diagnosis"),
        )
    )
    return (
        part.join(agg, part["participant_id"] == agg["pid"], "left")
        .select(
            "participant_id",
            "sex_at_birth",
            F.array_join(F.col("`diagnosis.diagnosis_id`"), ";").alias("dx_ids"),
            F.coalesce(F.col("n_dx"), F.lit(0)).cast("bigint").alias("n_dx"),
            "sum_dx_age",
            "min_diagnosis",
        )
    )

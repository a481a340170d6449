"""Row-mapped builder suite query (M3/S10 through c3dc_etl_spark.rowmapped)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from c3dc_etl_spark.mapping.compiler import CompilerContext
from c3dc_etl_spark.rowmapped import build_rowmapped_node, parse_rule_rows, rule_errors
from c3dc_etl_spark.schema.registry import SchemaRegistry
from c3dc_etl_spark.suite.registry import load, query

REG = SchemaRegistry()
UUID_SEED = "rm42"

_F_CHEMO_SQL = "CASE c_custkey % 4 WHEN 0 THEN 'YES ' WHEN 1 THEN 'no' ELSE '' END"
_F_SURGERY_SQL = "CASE c_custkey % 3 WHEN 0 THEN '1' ELSE '0' END"
_AGE1_SQL = "CAST(-(c_custkey % 900) - 10 AS STRING)"
_AGE2_SQL = "CAST(c_custkey % 100 AS STRING)"

# Rule sheet as header-keyed rows, the reference's S10 shape
RULE_ROWS = [
    {
        "Source Variable Name": "f_chemo",
        "Source Permissible Values Code": "yes",
        "treatment.treatment_id": "{uuid}",
        "treatment.treatment_type": "Chemotherapy",
        "treatment.age_at_treatment_start": "{sum_abs_first(age1, age2)}",
    },
    {
        "Source Variable Name": "[f_surgery, f_chemo]",
        "Source Permissible Values Code": "1;+",
        "treatment.treatment_id": "{uuid}",
        "treatment.treatment_type": "Surgery",
        "treatment.age_at_treatment_start": "{sum_abs_first(age1, '100')}",
    },
    # duplicate of rule 0 -> collapsed at parse time
    {
        "Source Variable Name": "f_chemo",
        "Source Permissible Values Code": "yes",
        "treatment.treatment_id": "{uuid}",
        "treatment.treatment_type": "Chemotherapy",
        "treatment.age_at_treatment_start": "{sum_abs_first(age1, age2)}",
    },
]


def _uuid_sql(rule_tag: str) -> str:
    h = (
        f"MD5(CONCAT_WS(CHR(31), '{UUID_SEED}', 'treatment', '{rule_tag}',"
        f" CAST(c_custkey AS STRING)))"
    )
    return (
        f"(SUBSTR({h},1,8) || '-' || SUBSTR({h},9,4) || '-4' || SUBSTR({h},14,3)"
        f" || '-8' || SUBSTR({h},18,3) || '-' || SUBSTR({h},21,12))"
    )


_ROWMAPPED_ORACLE = f"""
WITH src AS (
    SELECT c_custkey,
           {_F_CHEMO_SQL} AS f_chemo,
           {_F_SURGERY_SQL} AS f_surgery,
           {_AGE1_SQL} AS age1,
           {_AGE2_SQL} AS age2
    FROM customer
)
SELECT CAST(FLOOR(ABS(TRY_CAST(age1 AS DOUBLE)) + TRY_CAST(age2 AS DOUBLE) + 0.5)
            AS BIGINT) AS age_at_treatment_start,
       {_uuid_sql("rule0")} AS treatment_id,
       ARRAY_TO_STRING(['Chemotherapy'], ';') AS treatment_type
FROM src WHERE LOWER(TRIM(f_chemo)) = 'yes'
UNION ALL
SELECT CAST(FLOOR(ABS(TRY_CAST(age1 AS DOUBLE)) + 100.0 + 0.5) AS BIGINT),
       {_uuid_sql("rule1")},
       ARRAY_TO_STRING(['Surgery'], ';')
FROM src WHERE LOWER(TRIM(f_surgery)) = '1' AND TRIM(f_chemo) <> ''
"""


@query("rowmapped_rule_build", oracle=_ROWMAPPED_ORACLE, tags=("engine", "rowmapped"))
def rowmapped_rule_build(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M3 through rowmapped.build_rowmapped_node: a rule SHEET (not a
    field mapping) where each row is 'if these source values match, emit
    one treatment record'. Exercises trimmed case-insensitive value
    match, compound [f1,f2] predicates with per-ordinal '+' wildcard,
    {uuid} per rule, {sum_abs_first(field, field)} and a quoted-literal
    argument {sum_abs_first(field, '100')} (the reference AST-parses
    these calls, etl/mci/c3dc_row_mapped_builder.py:254-266), duplicate
    rule-row collapse, and schema typing of outputs (array enum,
    half-up integer age). Compiled plan: a union of filter+select
    branches over one scan — no join, no shuffle."""
    cust = load(spark, sf_dir, "customer")
    src = cust.select(
        "c_custkey",
        F.expr(_F_CHEMO_SQL).alias("f_chemo"),
        F.expr(_F_SURGERY_SQL).alias("f_surgery"),
        F.expr(_AGE1_SQL).alias("age1"),
        F.expr(_AGE2_SQL).alias("age2"),
    )
    rules = parse_rule_rows(RULE_ROWS, "treatment")
    assert not rule_errors(rules, "treatment", REG)
    ctx = CompilerContext(registry=REG, uuid_seed=UUID_SEED, row_identity=("c_custkey",))
    node = build_rowmapped_node(src, "treatment", rules, ctx)
    # Query-layer serialization only: the driver's pandas canonicalizer
    # cannot sort array cells; the engine's array typing stays intact
    # (tests/test_rowmapped.py).
    return node.withColumn(
        "treatment_type", F.array_join(F.col("treatment_type"), ";")
    )

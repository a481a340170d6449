"""Validate + report-sink suite queries (X1 distributed tier, K3).

The schema-driven checks run through c3dc_etl_spark.validate (generated
from the model, not restated inline); the oracle SQL mirrors each
generated check.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from c3dc_etl_spark.schema.model import MAX_AGE_DAYS
from c3dc_etl_spark.schema.registry import SchemaRegistry
from c3dc_etl_spark.sink.reports import duplicate_report
from c3dc_etl_spark.suite.registry import load, query
from c3dc_etl_spark.validate import frame_violations

REG = SchemaRegistry()

_DIAG_SQL = (
    "CASE o_orderkey % 5 WHEN 0 THEN NULL WHEN 1 THEN 'not a pv'"
    " ELSE '8000/0 : Neoplasm, benign' END"
)
_AGE_SQL = (
    f"CASE o_orderkey % 7 WHEN 0 THEN {MAX_AGE_DAYS + 1000}"
    f" WHEN 1 THEN {-(MAX_AGE_DAYS + 1000)} ELSE 100 END"
)
_LAT_SQL = "CASE o_orderkey % 11 WHEN 0 THEN 'sideways' ELSE 'Left' END"

_DIAG_ENUM_LIST = ", ".join(
    f"'{pv}'" for pv in REG.enum_values("diagnosis", "diagnosis")
)
_LAT_ENUM_LIST = ", ".join(
    f"'{pv}'" for pv in REG.enum_values("diagnosis", "laterality")
)

_VALIDATE_ORACLE = f"""
WITH frame AS (
    SELECT CAST(o_orderkey AS STRING) AS diagnosis_id,
           {_DIAG_SQL} AS diagnosis,
           CAST({_AGE_SQL} AS BIGINT) AS age_at_diagnosis,
           {_LAT_SQL} AS laterality,
           'Primary' AS tumor_classification
    FROM orders
)
SELECT diagnosis_id AS record_id, 'diagnosis' AS property,
       'required property missing' AS error
FROM frame WHERE diagnosis IS NULL OR TRIM(diagnosis) = ''
UNION ALL
SELECT diagnosis_id, 'diagnosis', 'value not in permissible list'
FROM frame WHERE diagnosis IS NOT NULL AND diagnosis NOT IN ({_DIAG_ENUM_LIST})
UNION ALL
SELECT diagnosis_id, 'age_at_diagnosis', 'value above maximum {MAX_AGE_DAYS}'
FROM frame WHERE age_at_diagnosis > {MAX_AGE_DAYS}
UNION ALL
SELECT diagnosis_id, 'age_at_diagnosis', 'value below minimum {-MAX_AGE_DAYS}'
FROM frame WHERE age_at_diagnosis < {-MAX_AGE_DAYS}
UNION ALL
SELECT diagnosis_id, 'laterality', 'value not in permissible list'
FROM frame WHERE laterality IS NOT NULL AND laterality NOT IN ({_LAT_ENUM_LIST})
"""


@query("validate_column_checks", oracle=_VALIDATE_ORACLE, tags=("validate",))
def validate_column_checks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed X1: schema-compiled column checks (required
    non-blank, enum membership, numeric bounds) over a frame with
    planted violations — one violations row per (record, property,
    error), all checks generated from the model by
    validate.frame_violations and executed in one pass."""
    orders = load(spark, sf_dir, "orders")
    frame = orders.select(
        F.col("o_orderkey").cast("string").alias("diagnosis_id"),
        F.expr(_DIAG_SQL).alias("diagnosis"),
        F.expr(_AGE_SQL).cast("bigint").alias("age_at_diagnosis"),
        F.expr(_LAT_SQL).alias("laterality"),
        F.lit("Primary").alias("tumor_classification"),
    )
    return frame_violations(frame, "diagnosis", REG)


_EVENT_NODES = ("click", "error", "purchase", "signup", "view")

_DUPREPORT_ORACLE = f"""
WITH recs AS (
    SELECT CAST(user_id AS STRING) AS participant_id,
           event_type AS node,
           MD5(event_type || ':' ||
               COALESCE(CAST(CAST(FLOOR(value) AS BIGINT) AS STRING), 'x'))
               AS fingerprint
    FROM events
),
dupes AS (
    SELECT participant_id, node, fingerprint, COUNT(*) AS n
    FROM recs
    GROUP BY 1, 2, 3
    HAVING COUNT(*) > 1
)
SELECT participant_id,
       {", ".join(
           f"CAST(COALESCE(SUM(CASE WHEN node = '{n}' THEN n - 1 END), 0)"
           f" AS BIGINT) AS {n}"
           for n in _EVENT_NODES
       )}
FROM dupes
GROUP BY participant_id
"""


@query("sink_duplicate_report", oracle=_DUPREPORT_ORACLE, tags=("sink", "dedup"))
def sink_duplicate_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K3 through sink.duplicate_report: the TARGET duplicate-record
    report — participants with >1 same-fingerprint record in any node,
    pivoted to a per-node surplus-count matrix with plan-time pivot
    columns (reference loops etl/target/c3dc_etl.py:2229-2304; here two
    shuffles: fingerprint agg + participant pivot agg)."""
    events = load(spark, sf_dir, "events")
    recs = events.select(
        F.col("user_id").cast("string").alias("participant_id"),
        F.col("event_type").alias("node"),
        F.md5(
            F.concat(
                F.col("event_type"),
                F.lit(":"),
                F.coalesce(F.floor("value").cast("string"), F.lit("x")),
            )
        ).alias("fingerprint"),
    )
    return duplicate_report(
        recs,
        participant_col="participant_id",
        node_col="node",
        fingerprint_col="fingerprint",
        nodes=_EVENT_NODES,
    )


_FK_DASHBOARD_ORACLE = """
SELECT 'orders.o_custkey->customer' AS relation,
       (SELECT COUNT(*) FROM orders) AS n_rows,
       (SELECT COUNT(*) FROM orders o
        WHERE NOT EXISTS (SELECT 1 FROM customer c
                          WHERE c.c_custkey = o.o_custkey)) AS n_orphans
UNION ALL
SELECT 'lineitem.l_orderkey->orders',
       (SELECT COUNT(*) FROM lineitem),
       (SELECT COUNT(*) FROM lineitem l
        WHERE NOT EXISTS (SELECT 1 FROM orders o
                          WHERE o.o_orderkey = l.l_orderkey))
UNION ALL
SELECT 'lineitem.l_partkey->part',
       (SELECT COUNT(*) FROM lineitem),
       (SELECT COUNT(*) FROM lineitem l
        WHERE NOT EXISTS (SELECT 1 FROM part p
                          WHERE p.p_partkey = l.l_partkey))
UNION ALL
SELECT 'lineitem.l_suppkey->supplier',
       (SELECT COUNT(*) FROM lineitem),
       (SELECT COUNT(*) FROM lineitem l
        WHERE NOT EXISTS (SELECT 1 FROM supplier s
                          WHERE s.s_suppkey = l.l_suppkey))
UNION ALL
SELECT 'customer.c_nationkey->nation',
       (SELECT COUNT(*) FROM customer),
       (SELECT COUNT(*) FROM customer c
        WHERE NOT EXISTS (SELECT 1 FROM nation n
                          WHERE n.n_nationkey = c.c_nationkey))
UNION ALL
SELECT 'nation.n_regionkey->region',
       (SELECT COUNT(*) FROM nation),
       (SELECT COUNT(*) FROM nation n
        WHERE NOT EXISTS (SELECT 1 FROM region r
                          WHERE r.r_regionkey = n.n_regionkey))
"""

_FK_EDGES = [
    ("orders", "o_custkey", "customer", "c_custkey"),
    ("lineitem", "l_orderkey", "orders", "o_orderkey"),
    ("lineitem", "l_partkey", "part", "p_partkey"),
    ("lineitem", "l_suppkey", "supplier", "s_suppkey"),
    ("customer", "c_nationkey", "nation", "n_nationkey"),
    ("nation", "n_regionkey", "region", "r_regionkey"),
]


@query(
    "fk_integrity_dashboard",
    oracle=_FK_DASHBOARD_ORACLE,
    tags=("validate",),
)
def fk_integrity_dashboard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Referential-integrity dashboard: orphan counts for every foreign
    key of the star schema in one result — the pre-flight audit a
    warehouse load runs before publishing (anti_join_integrity is the
    single-edge primitive; this is the whole-schema report). Each edge
    is ONE left-outer probe of the child's key projection against the
    (deduplicated, broadcastable) parent key set, folding row count and
    orphan count in the same aggregate — one pass over each child, no
    second anti-join scan; the six 1-row results union into the report.
    Zero orphans everywhere is the generator's invariant, so any
    nonzero cell is a real defect (of the data OR of the join)."""
    from functools import reduce

    frames = []
    for child, fk, parent, pk in _FK_EDGES:
        c = load(spark, sf_dir, child).select(fk)
        p = load(spark, sf_dir, parent).select(pk).distinct()
        joined = c.join(p, c[fk] == p[pk], "left")
        frames.append(
            joined.agg(
                F.count(F.lit(1)).alias("n_rows"),
                F.sum(
                    F.when(F.col(pk).isNull(), 1).otherwise(0)
                ).alias("n_orphans"),
            ).select(
                F.lit(f"{child}.{fk}->{parent}").alias("relation"),
                "n_rows",
                "n_orphans",
            )
        )
    return reduce(lambda a, b: a.unionByName(b), frames)

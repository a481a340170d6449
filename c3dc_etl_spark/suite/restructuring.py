"""Record-multiplying + restructuring operators (SURVEY.md §2.4, §2.9):
explode fan-outs, type-group union, long->wide pivot, nested-JSON flatten,
relationship id wiring.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from c3dc_etl_spark.suite.registry import load, query


@query(
    "explode_subrecords",
    oracle="""
    SELECT o_orderkey || '_' || CAST(ROW_NUMBER() OVER (
               PARTITION BY o_orderkey ORDER BY val ASC) AS VARCHAR) AS sub_id,
           o_orderkey, val
    FROM (
        SELECT DISTINCT o_orderkey, UNNEST(STRING_SPLIT(
            o_orderpriority || ';' || o_orderstatus || ';' || o_orderpriority, ';')) AS val
        FROM orders
    )
    """,
    tags=("explode",),
)
def explode_subrecords(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M2: sub-source-record split — a ';'-delimited scalar cell fans out
    into one cloned record per distinct sorted value, id suffixed _1.._n
    (reference _build_sub_source_records,
    etl/ccdi/c3dc_etl.py:1240-1292, values sorted :1262-1275).

    Fully NARROW plan: the ordinal is the position of the value in the
    per-row sorted-distinct array (posexplode), which is exactly the
    reference's sorted iteration — no window, no shuffle. (A previous
    formulation ranked with row_number over a per-id window: two
    exchanges for a value that was already computable per row.)"""
    orders = load(spark, sf_dir, "orders")
    multi = F.concat_ws(
        ";", F.col("o_orderpriority"), F.col("o_orderstatus"), F.col("o_orderpriority")
    )
    vals = F.array_sort(F.array_distinct(F.split(multi, ";")))
    return orders.select(
        "o_orderkey", F.posexplode(vals).alias("pos", "val")
    ).select(
        F.concat(
            F.col("o_orderkey").cast("string"),
            F.lit("_"),
            (F.col("pos") + 1).cast("string"),
        ).alias("sub_id"),
        "o_orderkey",
        "val",
    )


@query(
    "typegroup_fanout_union",
    oracle="""
    SELECT l_orderkey, l_linenumber, 1 AS type_group_index,
           l_returnflag AS flag, CAST(l_quantity AS DOUBLE) AS measure
    FROM lineitem
    UNION ALL
    SELECT l_orderkey, l_linenumber, 2 AS type_group_index,
           l_linestatus AS flag, CAST(l_extendedprice AS DOUBLE) AS measure
    FROM lineitem
    WHERE l_extendedprice > 1000
    """,
    tags=("explode", "union"),
)
def typegroup_fanout_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M1: type_group_index fan-out — mapping groups each produce one
    output record per source record; compiled as one projected plan per
    group unioned together (reference _get_type_group_index_mappings,
    etl/ccdi/c3dc_etl.py:946-1006, consumption :1071-1167). Union of
    narrow projections over one scan: Spark reuses the exchange."""
    li = load(spark, sf_dir, "lineitem")
    g1 = li.select(
        "l_orderkey",
        "l_linenumber",
        F.lit(1).alias("type_group_index"),
        F.col("l_returnflag").alias("flag"),
        F.col("l_quantity").cast("double").alias("measure"),
    )
    g2 = li.filter(F.col("l_extendedprice") > 1000).select(
        "l_orderkey",
        "l_linenumber",
        F.lit(2).alias("type_group_index"),
        F.col("l_linestatus").alias("flag"),
        F.col("l_extendedprice").cast("double").alias("measure"),
    )
    return g1.unionByName(g2)


@query(
    "pivot_long_to_wide",
    oracle="""
    SELECT user_id,
           CAST(COUNT(CASE WHEN event_type = 'click' THEN 1 END) AS BIGINT) AS click_cnt,
           CAST(COUNT(CASE WHEN event_type = 'purchase' THEN 1 END) AS BIGINT) AS purchase_cnt,
           CAST(COUNT(CASE WHEN event_type = 'signup' THEN 1 END) AS BIGINT) AS signup_cnt,
           CAST(COUNT(CASE WHEN event_type = 'error' THEN 1 END) AS BIGINT) AS error_cnt,
           CAST(SUM(CASE WHEN event_type = 'purchase'
                         THEN CAST(value AS DECIMAL(18,2)) END) AS DOUBLE) AS purchase_value
    FROM events
    GROUP BY user_id
    """,
    tags=("pivot",),
)
def pivot_long_to_wide(spark: SparkSession, sf_dir: str) -> DataFrame:
    """R1: long->wide pivot — per-subject row from (id, field, value)
    rows (reference data_pivoter groupBy(upi).pivot,
    etl/mci/data_pivoter.py:102-140; MCI form extraction S5). Expressed
    as conditional aggregation (exactly what .pivot(values=[...])
    compiles to) so the output schema is static — at 100 TB you never
    want pivot's distinct-value discovery job."""
    events = load(spark, sf_dir, "events")

    def cnt(t):
        return F.count(F.when(F.col("event_type") == t, F.lit(1))).alias(f"{t}_cnt")

    return events.groupBy("user_id").agg(
        cnt("click"),
        cnt("purchase"),
        cnt("signup"),
        cnt("error"),
        F.sum(
            F.when(F.col("event_type") == "purchase", F.col("value").cast("decimal(18,2)"))
        )
        .cast("double")
        .alias("purchase_value"),
    )


@query(
    "json_flatten",
    oracle="""
    SELECT event_id,
           CAST(JSON_EXTRACT_STRING(props, '$.k') AS BIGINT) AS k_value,
           LOWER(event_type) AS event_type_lc
    FROM events
    WHERE JSON_EXTRACT_STRING(props, '$.k') IS NOT NULL
    """,
    tags=("json",),
)
def json_flatten(spark: SparkSession, sf_dir: str) -> DataFrame:
    """R2/S5/S6: nested JSON field extraction (reference flattens
    per-subject JSON forms, etl/mci/json_pivoter.py:58-112 and
    etl/mci/c3dc_etl.py:903-1032). get_json_object stays JVM-side; for
    full documents use from_json with an explicit schema so Catalyst can
    prune."""
    events = load(spark, sf_dir, "events")
    k = F.get_json_object(F.col("props"), "$.k")
    return (
        events.filter(k.isNotNull())
        .select(
            "event_id",
            k.cast("bigint").alias("k_value"),
            F.lower(F.col("event_type")).alias("event_type_lc"),
        )
    )


@query(
    "link_wiring_collect",
    oracle="""
    SELECT c_custkey,
           ARRAY_TO_STRING(LIST_SORT(LIST(CAST(o_orderkey AS VARCHAR))), ';') AS order_ids,
           CAST(COUNT(*) AS BIGINT) AS n_orders
    FROM customer
    JOIN orders ON o_custkey = c_custkey
    GROUP BY c_custkey
    """,
    tags=("join", "agg", "link"),
)
def link_wiring_collect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """R5/J1: relationship id wiring — parent record gets the sorted
    array of child ids, child gets the parent id scalar (reference wires
    both directions in Python loops, etl/ccdi/c3dc_etl.py:1340-1356,
    1457-1472 — O(P*N) there, one shuffle here). Sorted + re-joined for
    a deterministic cross-engine value."""
    cust = load(spark, sf_dir, "customer")
    orders = load(spark, sf_dir, "orders")
    return (
        cust.join(orders, orders.o_custkey == cust.c_custkey)
        .groupBy("c_custkey")
        .agg(
            F.array_join(
                F.array_sort(F.collect_list(F.col("o_orderkey").cast("string"))), ";"
            ).alias("order_ids"),
            F.count(F.lit(1)).alias("n_orders"),
        )
    )


@query(
    "unpivot_wide_to_long",
    oracle="""
    SELECT p_partkey, field, value FROM (
        SELECT p_partkey, 'name' AS field, p_name AS value FROM part
        UNION ALL
        SELECT p_partkey, 'brand', p_brand FROM part
        UNION ALL
        SELECT p_partkey, 'type', p_type FROM part
    )
    """,
    tags=("pivot",),
)
def unpivot_wide_to_long(spark: SparkSession, sf_dir: str) -> DataFrame:
    """R3: mapping unpivot — wide rule columns to (field, value) rows
    (reference mapping_unpivoter XLSX->JSON,
    mapping_unpivoter/mapping_unpivoter.py:221-305). Spark-native stack()
    via melt/unpivot."""
    part = load(spark, sf_dir, "part")
    return part.unpivot(
        "p_partkey",
        ["p_name", "p_brand", "p_type"],
        "field",
        "value",
    ).withColumn(
        "field",
        F.when(F.col("field") == "p_name", "name")
        .when(F.col("field") == "p_brand", "brand")
        .otherwise("type"),
    )


_EXPLODE_OUTER_ORACLE = """
WITH d AS (
    SELECT doc_id,
           CASE CAST(doc_id % 3 AS INT)
                WHEN 0 THEN []
                WHEN 1 THEN NULL
                ELSE LIST_SLICE(STR_SPLIT(text, ' '), 1, 2)
           END AS arr
    FROM documents
)
SELECT doc_id, CAST(NULL AS BIGINT) AS pos, CAST(NULL AS STRING) AS token
FROM d WHERE arr IS NULL OR LEN(arr) = 0
UNION ALL
SELECT doc_id,
       CAST(GENERATE_SUBSCRIPTS(arr, 1) - 1 AS BIGINT) AS pos,
       UNNEST(arr) AS token
FROM d WHERE arr IS NOT NULL AND LEN(arr) > 0
"""


@query(
    "explode_outer_probe",
    oracle=_EXPLODE_OUTER_ORACLE,
    tags=("restructuring", "conformance"),
)
def explode_outer_probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """posexplode_outer conformance: rows whose array is EMPTY or NULL
    must survive the flatten with NULL (pos, token) — the silent
    row-loss trap of plain explode (an inner flatten drops the parent
    row, and a downstream count-by-doc silently undercounts). One in
    three documents gets an empty array and one in three a NULL array,
    so both degenerate shapes are exercised; DuckDB has no outer
    UNNEST, so the oracle restates the semantics as the
    preserved-rows UNION the lateral RANGE flatten."""
    docs = load(spark, sf_dir, "documents").select(
        "doc_id",
        F.when(F.col("doc_id") % 3 == 0, F.array().cast("array<string>"))
        .when(F.col("doc_id") % 3 == 1, F.lit(None).cast("array<string>"))
        .otherwise(F.slice(F.split(F.col("text"), " "), 1, 2))
        .alias("arr"),
    )
    return docs.select(
        "doc_id", F.posexplode_outer("arr").alias("pos", "token")
    ).select("doc_id", F.col("pos").cast("bigint").alias("pos"), "token")

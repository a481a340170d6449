"""Bucketed tables for co-located, shuffle-free joins.

At 100 TB the dominant cost of a repeated fact-fact equi-join is the
shuffle. Writing both sides bucketed on the join key (same bucket
count) lets every subsequent SortMergeJoin read co-located buckets with
NO exchange on either side — the shuffle is paid once at write time and
amortized over every downstream join/aggregation on that key.

Spark's bucketing rides the session catalog (``bucketBy`` requires
``saveAsTable``); the warehouse location comes from
``spark.sql.warehouse.dir``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    *,
    bucket_cols: list[str],
    buckets: int,
    sort_cols: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Persist ``df`` as a bucketed (and optionally sort-ordered) table.
    Joins/aggregations on ``bucket_cols`` against tables bucketed with
    the SAME count skip their exchanges."""
    writer = df.write.mode(mode).bucketBy(buckets, *bucket_cols)
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    writer.saveAsTable(table)


def bucketed_join_is_shuffle_free(
    spark: SparkSession, left_table: str, right_table: str, on: str
) -> bool:
    """Plan check: does a SortMergeJoin of the two bucketed tables
    require any Exchange? The merge hint rules out a broadcast plan
    (which would be trivially exchange-free and prove nothing about the
    bucketing). Used by tests and as a deploy-time sanity probe."""
    joined = spark.table(left_table).hint("merge").join(
        spark.table(right_table), on
    )
    plan = joined._jdf.queryExecution().executedPlan().toString()
    return "Exchange hashpartitioning" not in plan

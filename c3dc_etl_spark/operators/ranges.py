"""Range (point-in-interval) join — an operator Spark's optimizer lacks.

A join on ``probe.ts BETWEEN interval.start AND interval.end`` with NO
equality key plans as BroadcastNestedLoopJoin (O(n*m) compares, and only
when one side fits in a broadcast). The standard scale treatment is
bucketization: quantize time into fixed buckets, explode each interval
to the buckets it covers, tag each probe with its single bucket, and
equi-join on the bucket before the exact range filter. Candidate cost is
O(probes + intervals * span/bucket + true_matches) — a shuffle hash
join at any scale.

Correctness note: a (probe, interval) pair can collide in at most ONE
bucket (the probe's), so the output needs no pair-level distinct.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def range_join(
    intervals: DataFrame,
    probes: DataFrame,
    *,
    start_col: str,
    end_col: str,
    ts_col: str,
    bucket: int,
    max_buckets_per_interval: int = 1024,
) -> DataFrame:
    """Inner point-in-interval join (inclusive bounds): one output row
    per (interval row, probe row) with ``start <= ts <= end``. All
    columns of both inputs are carried (name collisions are the
    caller's to alias away beforehand).

    ``bucket`` is the quantum in the same units as the columns; pick it
    near the TYPICAL interval span so each interval explodes to ~2-3
    buckets. ``max_buckets_per_interval`` guards the explode against a
    pathological open-ended interval (skew: one giant interval fanning
    out to millions of bucket rows) — such rows fail fast rather than
    degrade the cluster; split them upstream or raise the bucket size.
    """
    start_b = F.floor(F.col(start_col) / bucket)
    end_b = F.floor(F.col(end_col) / bucket)
    # The guard is woven INTO the sequence's end bound: a free-standing
    # guard column would be pruned away by the optimizer (unused
    # columns never evaluate), silently disarming it.
    # Gate on BOTH sides of the span: a reversed interval (end < start)
    # would make end_b - start_b negative — passing a `< max` check while
    # F.sequence(start_b, end_b) generates a DESCENDING run of |span|+1
    # bucket rows that only the final range filter discards.
    span_b = end_b - start_b
    safe_end_b = F.when(
        (span_b >= 0) & (span_b < max_buckets_per_interval), end_b
    ).otherwise(
        F.raise_error(
            F.lit(
                f"range_join: interval is reversed (end < start) or spans "
                f"more than {max_buckets_per_interval} buckets; fix the "
                f"interval, raise `bucket`, or split it"
            )
        )
    )
    b_int = intervals.select(
        *intervals.columns,
        F.explode(F.sequence(start_b, safe_end_b)).alias("__b"),
    )
    b_probe = probes.withColumn("__b", F.floor(F.col(ts_col) / bucket))
    return (
        b_int.join(b_probe, "__b")
        .filter(
            (F.col(ts_col) >= F.col(start_col)) & (F.col(ts_col) <= F.col(end_col))
        )
        .drop("__b")
    )

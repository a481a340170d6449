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


def _check_disjoint_columns(left: DataFrame, right: DataFrame) -> None:
    """Both bucketized joins carry ALL columns of both inputs through a
    plain equi-join: shared names would surface later as an opaque
    AMBIGUOUS_REFERENCE in the range filter, and a pre-existing ``__b``
    would silently collide with the bucket key — fail fast with a clear
    message instead (alias the columns apart before calling)."""
    shared = set(left.columns) & set(right.columns)
    if shared:
        raise ValueError(
            f"range/overlap join inputs share column names {sorted(shared)}; "
            f"alias them apart before joining"
        )
    if "__b" in left.columns or "__b" in right.columns:
        raise ValueError("'__b' is reserved for the bucket key; rename it")


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
    _check_disjoint_columns(intervals, probes)
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


def interval_overlap_join(
    left: DataFrame,
    right: DataFrame,
    *,
    l_start: str,
    l_end: str,
    r_start: str,
    r_end: str,
    bucket: int,
    max_buckets_per_interval: int = 1024,
) -> DataFrame:
    """Inner interval-OVERLAP join (both sides are intervals, inclusive
    bounds): one output row per (left, right) pair with
    ``l_start <= r_end AND r_start <= l_end``. The generalization of
    :func:`range_join` from point-in-interval to interval-intersects-
    interval — Spark plans the naive two-inequality join as a
    BroadcastNestedLoopJoin, which this replaces with a bucketized
    shuffle hash join.

    Both sides explode to their covered buckets and equi-join on the
    bucket. An overlapping pair can share MANY buckets; instead of a
    pair-level distinct (an extra wide shuffle), each pair is ATTRIBUTED
    to exactly one bucket — the first bucket both intervals cover,
    ``max(floor(l_start/bucket), floor(r_start/bucket))`` — so the join
    emits every qualifying pair exactly once. Per-side explode guards
    mirror range_join (reversed or over-long intervals fail fast).
    """
    _check_disjoint_columns(left, right)

    def _explode(df: DataFrame, start_col: str, end_col: str) -> DataFrame:
        start_b = F.floor(F.col(start_col) / bucket)
        end_b = F.floor(F.col(end_col) / bucket)
        span_b = end_b - start_b
        safe_end_b = F.when(
            (span_b >= 0) & (span_b < max_buckets_per_interval), end_b
        ).otherwise(
            F.raise_error(
                F.lit(
                    f"interval_overlap_join: interval is reversed or spans "
                    f"more than {max_buckets_per_interval} buckets; fix the "
                    f"interval, raise `bucket`, or split it"
                )
            )
        )
        return df.select(
            *df.columns, F.explode(F.sequence(start_b, safe_end_b)).alias("__b")
        )

    b_left = _explode(left, l_start, l_end)
    b_right = _explode(right, r_start, r_end)
    attributed = F.greatest(
        F.floor(F.col(l_start) / bucket), F.floor(F.col(r_start) / bucket)
    )
    return (
        b_left.join(b_right, "__b")
        .filter(
            (F.col(l_start) <= F.col(r_end))
            & (F.col(r_start) <= F.col(l_end))
            & (F.col("__b") == attributed)
        )
        .drop("__b")
    )

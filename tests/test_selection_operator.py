"""operators/selection.py — exact k-th selection by histogram
refinement. Ground truth is a driver-side sort at test scale; the
operator must agree for every rank, weighted and unweighted, across
bracket widths that exercise multi-round refinement, single-bucket
degeneracy, and negative domains."""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from c3dc_etl_spark.operators.selection import select_kth


def _df(spark, values, weights=None):
    if weights is None:
        return spark.createDataFrame([(int(v),) for v in values], "cents bigint")
    return spark.createDataFrame(
        [(int(v), int(w)) for v, w in zip(values, weights)],
        "cents bigint, wt bigint",
    )


def test_matches_sorted_ground_truth_every_rank(spark):
    rng = random.Random(9)
    values = [rng.randrange(-50_000, 50_000) for _ in range(500)]
    df = _df(spark, values).cache()
    ordered = sorted(values)
    lo, hi = min(values), max(values)
    for k in (1, 2, 25, 250, 251, 499, 500):
        assert select_kth(df, "cents", k, lo, hi, bins=16) == ordered[k - 1]
    df.unpersist()


def test_weighted_matches_cumulative_definition(spark):
    rng = random.Random(10)
    rows = [(rng.randrange(0, 1000), rng.randrange(1, 9)) for _ in range(300)]
    df = _df(spark, [v for v, _ in rows], [w for _, w in rows]).cache()
    total = sum(w for _, w in rows)
    expanded = sorted(v for v, w in rows for _ in range(w))
    lo, hi = min(v for v, _ in rows), max(v for v, _ in rows)
    for k in (1, total // 2, (total + 1) // 2, total):
        got = select_kth(df, "cents", k, lo, hi, weight_col="wt", bins=8)
        assert got == expanded[k - 1], k
    df.unpersist()


def test_duplicate_heavy_and_tiny_brackets(spark):
    # one dominant value: every middle rank must land on it
    values = [7] * 90 + [1] * 5 + [9] * 5
    df = _df(spark, values)
    assert select_kth(df, "cents", 6, 1, 9) == 7
    assert select_kth(df, "cents", 95, 1, 9) == 7
    assert select_kth(df, "cents", 96, 1, 9) == 9
    # bracket already a point: zero jobs, returns lo
    assert select_kth(df, "cents", 1, 7, 7) == 7


def test_bins_wider_than_span_and_span_not_divisible(spark):
    values = [3, 4, 5, 6, 7]
    df = _df(spark, values)
    # span 5 with bins 1024 -> width 1, single round
    for k in range(1, 6):
        assert select_kth(df, "cents", k, 3, 7) == values[k - 1]
    # span 5 with bins 2 -> width 3, uneven last bucket
    for k in range(1, 6):
        assert select_kth(df, "cents", k, 3, 7, bins=2) == values[k - 1]


def test_contract_violations_raise(spark):
    df = _df(spark, [1, 2, 3])
    with pytest.raises(ValueError):
        select_kth(df, "cents", 0, 1, 3)
    with pytest.raises(ValueError):
        select_kth(df, "cents", 1, 5, 3)
    with pytest.raises(ValueError):
        select_kth(df, "cents", 1, 1, 3, bins=1)
    with pytest.raises(ValueError):  # k beyond the total weight
        select_kth(df, "cents", 4, 1, 3)
    # a bracket that does not cover the data must raise, not silently
    # return a shifted rank (ranks are global; the old count-below
    # bisection happened to tolerate this, the histogram cannot)
    with pytest.raises(ValueError, match="bracket"):
        select_kth(df, "cents", 2, 2, 3)
    with pytest.raises(ValueError, match="bracket"):
        select_kth(df, "cents", 2, 1, 2)


def test_null_values_raise_contract_error(spark):
    """Nulls have no place in a total order: a null value (or an
    all-null weight bucket) must raise a ValueError naming the column,
    not TypeError deep inside the histogram sort (ADVICE r9)."""
    df = spark.createDataFrame([(1,), (None,), (3,)], "cents bigint")
    with pytest.raises(ValueError, match="cents.*nulls"):
        select_kth(df, "cents", 1, 1, 3)
    wdf = spark.createDataFrame(
        [(1, 1), (2, None)], "cents bigint, wt bigint"
    )
    with pytest.raises(ValueError, match="wt"):
        select_kth(wdf, "cents", 1, 1, 2, weight_col="wt")
    # a null weight MIXED with non-null weights in the same bucket must
    # also raise — F.sum would silently drop it and shift every later
    # rank (r10 review finding)
    mixed = spark.createDataFrame(
        [(5, 2), (5, None), (9, 1)], "cents bigint, wt bigint"
    )
    with pytest.raises(ValueError, match="wt.*nulls"):
        select_kth(mixed, "cents", 3, 5, 9, weight_col="wt", bins=2)


def test_over_rank_message_reports_relative_rank(spark):
    """The no-break path never decremented k, so the message must
    report rank k itself, not k + cum (ADVICE r9)."""
    df = _df(spark, [1, 2, 3])
    with pytest.raises(ValueError, match=r"rank 9 exceeds bracket weight 3"):
        select_kth(df, "cents", 9, 1, 3)

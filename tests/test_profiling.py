"""Unit tests for c3dc_etl_spark.operators.profiling."""

from __future__ import annotations

import pytest

from c3dc_etl_spark.operators.profiling import profile_table


def _df(spark):
    return spark.createDataFrame(
        [(1, "a", None), (2, "b", None), (2, None, None)],
        "k long, s string, hole string",
    )


def test_profile_exact_counts_and_minmax(spark):
    out = {r["col_name"]: r for r in profile_table(_df(spark)).collect()}
    assert set(out) == {"k", "s", "hole"}
    k = out["k"]
    assert (k["n_rows"], k["n_non_null"], k["n_distinct"]) == (3, 3, 2)
    assert (k["min_value"], k["max_value"]) == ("1", "2")
    s = out["s"]
    assert (s["n_non_null"], s["n_distinct"]) == (2, 2)
    hole = out["hole"]
    assert (hole["n_non_null"], hole["n_distinct"]) == (0, 0)
    assert hole["min_value"] is None and hole["max_value"] is None


def test_profile_column_subset_and_validation(spark):
    df = _df(spark)
    assert [r["col_name"] for r in profile_table(df, ["s"]).collect()] == ["s"]
    with pytest.raises(ValueError, match="unknown columns"):
        profile_table(df, ["nope"])


def test_profile_approx_is_deterministic(spark):
    df = _df(spark)
    a = sorted(map(tuple, profile_table(df, approx=True).collect()))
    b = sorted(map(tuple, profile_table(df.repartition(5), approx=True).collect()))
    assert a == b

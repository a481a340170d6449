"""PageRank, incremental-SCD2, and cohort-retention properties."""

from __future__ import annotations

from pyspark.sql import functions as F

from c3dc_etl_spark.operators.graph import pagerank
from c3dc_etl_spark.suite import REGISTRY

SF = "/root/testdata/sf0.001"


def _rows_key(rows):
    return sorted(tuple(r) for r in rows)


def test_pagerank_mass_conserved_and_positive(spark):
    rows = REGISTRY["pagerank_purchase_graph"].fn(spark, SF).collect()
    assert rows
    total = sum(r["rank_x1e12"] for r in rows)
    one = 10**12
    # floor losses only: mass can never exceed 1.0 and loses at most a
    # few ulps per node per iteration
    assert total <= one
    assert total >= one - 100 * len(rows)
    assert all(r["rank_x1e12"] > 0 for r in rows)


def test_pagerank_partitioning_invariant(spark):
    """Fixed-point arithmetic means the result is bit-identical no
    matter how the edge list is partitioned."""
    edges = spark.createDataFrame(
        [("a", "b"), ("b", "a"), ("b", "c"), ("c", "b"), ("c", "a"), ("a", "c")],
        "src string, dst string",
    )
    r1 = pagerank(edges, 3, iterations=4).collect()
    r2 = pagerank(edges.repartition(7), 3, iterations=4).collect()
    assert _rows_key(r1) == _rows_key(r2)
    # symmetric triangle: all nodes equal rank
    assert len({r["rank_x1e12"] for r in r1}) == 1


def test_pagerank_degree_orders_ranks(spark):
    # star graph: hub receives mass from every spoke -> strictly top rank
    edges = spark.createDataFrame(
        [("hub", s) for s in ("s1", "s2", "s3", "s4")]
        + [(s, "hub") for s in ("s1", "s2", "s3", "s4")],
        "src string, dst string",
    )
    ranks = {r["node"]: r["rank_x1e12"] for r in pagerank(edges, 5).collect()}
    assert all(ranks["hub"] > ranks[s] for s in ("s1", "s2", "s3", "s4"))


def test_scd2_incremental_equals_full_rebuild(spark):
    inc = REGISTRY["scd2_incremental_merge"].fn(spark, SF).collect()
    full = REGISTRY["scd2_dimension_build"].fn(spark, SF).collect()
    assert _rows_key(inc) == _rows_key(full)


def test_cohort_retention_day_zero_is_full(spark):
    rows = REGISTRY["cohort_retention"].fn(spark, SF).collect()
    assert rows
    for r in rows:
        assert r["offset_days"] >= 0
        assert 0 < r["n_active"] <= r["n_cohort"]
        if r["offset_days"] == 0:
            # by construction every cohort member is active on day 0
            assert r["n_active"] == r["n_cohort"]
            assert r["retained_x1e6"] == 1_000_000

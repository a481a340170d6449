"""Grid-bucketed spatial join tests: exhaustive parity, exactly-once
pair emission, partitioning invariance, and boundary geometry."""

from __future__ import annotations

from pyspark.sql import functions as F

from c3dc_etl_spark.operators.geo import grid_radius_join, nearest_neighbor


def _pts(spark, rows):
    return spark.createDataFrame(rows, "id bigint, x bigint, y bigint")


def _brute_pairs(rows, r):
    out = set()
    for i, xi, yi in rows:
        for j, xj, yj in rows:
            if i < j and (xi - xj) ** 2 + (yi - yj) ** 2 <= r * r:
                out.add((i, j, (xi - xj) ** 2 + (yi - yj) ** 2))
    return out


def test_radius_join_matches_brute_force(spark):
    # deterministic scatter incl. same-cell, adjacent-cell, far pairs
    rows = [
        (i, (i * 37) % 400, (i * 91) % 400) for i in range(60)
    ] + [(100, 0, 0), (101, 99, 0), (102, 100, 0), (103, 399, 399)]
    got = {
        tuple(r)
        for r in grid_radius_join(
            _pts(spark, rows), "id", "x", "y", 100
        ).collect()
    }
    assert got == _brute_pairs(rows, 100)


def test_radius_join_exactly_once_no_dup_pairs(spark):
    rows = [(i, (i * 13) % 300, (i * 29) % 300) for i in range(80)]
    df = grid_radius_join(_pts(spark, rows), "id", "x", "y", 150)
    n = df.count()
    assert df.select("id_a", "id_b").distinct().count() == n
    # every emitted pair is ordered
    assert df.filter(F.col("id_a") >= F.col("id_b")).count() == 0


def test_radius_join_boundary_cells(spark):
    # partners exactly at distance == radius, straddling a cell border
    rows = [(1, 100, 100), (2, 200, 100), (3, 201, 100)]
    got = {
        (r.id_a, r.id_b)
        for r in grid_radius_join(
            _pts(spark, rows), "id", "x", "y", 100
        ).collect()
    }
    assert (1, 2) in got          # dist == radius kept (<=)
    assert (1, 3) not in got      # one past the radius dropped
    assert (2, 3) in got


def test_radius_join_partitioning_invariant(spark):
    rows = [(i, (i * 53) % 500, (i * 17) % 500) for i in range(70)]
    base = _pts(spark, rows)
    a = {tuple(r) for r in grid_radius_join(base, "id", "x", "y", 120).collect()}
    b = {
        tuple(r)
        for r in grid_radius_join(
            base.repartition(13, "y"), "id", "x", "y", 120
        ).collect()
    }
    assert a == b


def test_nearest_neighbor_brute_parity_and_ties(spark):
    rows = [
        (1, 0, 0),
        (2, 10, 0),      # nn of 1 (dist2 100)
        (3, 0, 10),      # tied with 2 for point 1 -> lower id wins
        (4, 1000, 1000),  # out of everyone's horizon
    ]
    got = {
        (r.id, r.nn_id, r.dist2)
        for r in nearest_neighbor(_pts(spark, rows), "id", "x", "y", 50).collect()
    }
    assert got == {(1, 2, 100), (2, 1, 100), (3, 1, 100)}

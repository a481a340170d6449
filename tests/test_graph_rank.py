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


def test_pagerank_checkpoint_cadence_bounds_plan_and_preserves_values(spark):
    """Deep iteration counts must not balloon the logical plan
    (localCheckpoint every `checkpoint_every` rounds truncates lineage),
    and the cadence must not change a single rank value."""
    edges = spark.createDataFrame(
        [("a", "b"), ("b", "a"), ("b", "c"), ("c", "b"), ("c", "a"), ("a", "c"),
         ("d", "a"), ("a", "d")],
        "src string, dst string",
    )
    deep = pagerank(edges, 4, iterations=12, checkpoint_every=4)
    nochk = pagerank(edges, 4, iterations=12, checkpoint_every=0)
    assert _rows_key(deep.collect()) == _rows_key(nochk.collect())
    # the checkpointed plan stays bounded: its string is dominated by the
    # rounds SINCE the last truncation, not all 12
    plan_deep = deep._jdf.queryExecution().optimizedPlan().toString()
    plan_flat = nochk._jdf.queryExecution().optimizedPlan().toString()
    assert len(plan_deep) < len(plan_flat) / 2, (
        len(plan_deep),
        len(plan_flat),
    )
    # 3 iterations (< cadence) never checkpoint: headline-query hashes
    # are untouched by the new default
    r3a = pagerank(edges, 4, iterations=3).collect()
    r3b = pagerank(edges, 4, iterations=3, checkpoint_every=0).collect()
    assert _rows_key(r3a) == _rows_key(r3b)


def test_triangle_count_matches_bruteforce_and_is_orientation_invariant(spark):
    """Random-ish small graph: degree-oriented count == brute-force
    enumeration; duplicate/reversed/self edges are normalized away."""
    from itertools import combinations

    from c3dc_etl_spark.operators.graph import triangle_count

    # deterministic pseudo-random edge set over 20 nodes
    edges = sorted({
        (min(a, b), max(a, b))
        for a, b in (
            ((i * 7 + 3) % 20, (i * 11 + 5) % 20) for i in range(60)
        )
        if a != b
    })
    adj = {}
    for u, v in edges:
        adj.setdefault(u, set()).add(v)
        adj.setdefault(v, set()).add(u)
    brute = sum(
        1
        for a, b, c in combinations(sorted(adj), 3)
        if b in adj[a] and c in adj[a] and c in adj[b]
    )
    wedges = sum(len(ns) * (len(ns) - 1) // 2 for ns in adj.values())
    # feed DIRTY edges: duplicates, reversals, self-loops
    dirty = edges + [(v, u) for u, v in edges[:10]] + [(3, 3), (5, 5)]
    df = spark.createDataFrame(dirty, "src long, dst long")
    [row] = triangle_count(df).collect()
    assert row["n_triangles"] == brute
    assert row["n_nodes"] == len(adj)
    assert row["n_edges"] == len(edges)
    assert row["n_wedges"] == wedges
    assert row["clustering_x1e6"] == (3 * brute * 1_000_000) // wedges


def test_triangle_count_huge_node_ids_no_rank_collision(spark):
    """Node ids >= 2^32 must not corrupt the degree-orientation total
    order. The old packed rank d*2^32+id collided for (d=2, id=2^32)
    vs (d=3, id=0): the wedge filter rka < rkb then silently skipped
    the triangle's wedge, undercounting. The struct (d, node) ordering
    keeps distinct nodes strictly ordered at any id magnitude."""
    from c3dc_etl_spark.operators.graph import triangle_count

    big = 2**32
    # triangle {5, big, 0} plus pendant 0-7: degrees 5->2, big->2, 0->3
    # => packed ranks of `big` and `0` would both be 3*2^32 (collision)
    edges = [(5, big), (5, 0), (0, big), (0, 7)]
    df = spark.createDataFrame(edges, "src long, dst long")
    [row] = triangle_count(df).collect()
    assert row["n_triangles"] == 1
    assert row["n_nodes"] == 4
    assert row["n_edges"] == 4
    # wedges: d(5)=2 ->1, d(big)=2 ->1, d(0)=3 ->3, d(7)=1 ->0
    assert row["n_wedges"] == 5


def test_kcore_bounded_peels_to_exact_core(spark):
    from c3dc_etl_spark.operators.graph import kcore_bounded

    # 4-clique {1,2,3,4} (3-core) + a tail 4-5-6 that peels away in two
    # rounds: removing 6 (deg 1) drops 5 to deg 1, then 5 drops 4's
    # extra edge — the clique survives with degree 3 everywhere
    und = [(1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4), (4, 5), (5, 6)]
    edges = spark.createDataFrame(
        [(a, b) for a, b in und] + [(b, a) for a, b in und],
        "src bigint, dst bigint",
    )
    got = {
        (r.node, r.degree)
        for r in kcore_bounded(edges, 3, rounds=3).collect()
    }
    assert got == {(1, 3), (2, 3), (3, 3), (4, 3)}

    # bounded contract: one round only removes the degree<3 frontier
    # (node 6 and node 5 — deg(5)=2 already below k), leaving 4-x edges
    one = {
        (r.node, r.degree)
        for r in kcore_bounded(edges, 3, rounds=1).collect()
    }
    assert one == {(1, 3), (2, 3), (3, 3), (4, 3)}

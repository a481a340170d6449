"""Unit tests for operators.skyline (2-D Pareto frontier) and
operators.graph.bfs_hops (frontier BFS)."""

from __future__ import annotations

import pytest

from c3dc_etl_spark.operators.graph import bfs_hops
from c3dc_etl_spark.operators.skyline import skyline_2d


def _brute_skyline(rows):
    """O(n^2) dominance reference: minimize x, maximize y."""
    out = []
    for i, (_, x, y) in enumerate(rows):
        dominated = any(
            (x2 < x and y2 >= y) or (x2 <= x and y2 > y)
            for j, (_, x2, y2) in enumerate(rows)
            if j != i
        )
        if not dominated:
            out.append(rows[i])
    return sorted(out)


ROWS = [
    (1, 10, 5),
    (2, 10, 7),   # same price, bigger: dominates row 1
    (3, 12, 7),   # same size, pricier than 2: dominated
    (4, 15, 9),
    (5, 15, 9),   # exact duplicate of 4: both kept
    (6, 20, 9),   # dominated by 4/5 (same size, pricier)
    (7, 25, 12),
    (8, 30, 1),   # dominated by everything cheaper with bigger y? no:
                  # y=1 < all, x largest -> dominated by 7
    (9, 5, 1),    # cheapest: on frontier despite tiny y
]


@pytest.mark.parametrize("n_buckets", [1, 3, 64])
def test_skyline_matches_brute_force(spark, n_buckets):
    df = spark.createDataFrame(ROWS, "id BIGINT, x BIGINT, y BIGINT")
    got = sorted(
        (r["id"], r["x"], r["y"])
        for r in skyline_2d(df, "x", "y", n_buckets=n_buckets).collect()
    )
    assert got == _brute_skyline(ROWS)
    assert {g[0] for g in got} == {2, 4, 5, 7, 9}


def test_skyline_empty_and_single(spark):
    empty = spark.createDataFrame([], "id BIGINT, x BIGINT, y BIGINT")
    assert skyline_2d(empty, "x", "y").count() == 0
    one = spark.createDataFrame([(1, 7, 7)], "id BIGINT, x BIGINT, y BIGINT")
    assert skyline_2d(one, "x", "y").count() == 1


def test_skyline_partition_invariance(spark):
    df = spark.createDataFrame(ROWS, "id BIGINT, x BIGINT, y BIGINT")
    a = sorted(map(tuple, skyline_2d(df.coalesce(1), "x", "y").collect()))
    b = sorted(map(tuple, skyline_2d(df.repartition(16), "x", "y").collect()))
    assert a == b


EDGES = [
    ("a", "b"), ("b", "c"), ("c", "d"), ("a", "c"),
    ("x", "y"),  # disconnected from 'a'
]


def _edges_df(spark):
    return spark.createDataFrame(EDGES, "src STRING, dst STRING")


def test_bfs_min_hops(spark):
    got = {
        r["node"]: r["hops"]
        for r in bfs_hops(_edges_df(spark), "a", max_hops=5).collect()
    }
    # c is reachable in 2 via b but also 1 via the direct edge
    assert got == {"a": 0, "b": 1, "c": 1, "d": 2}


def test_bfs_respects_max_hops_and_direction(spark):
    got = {
        r["node"]: r["hops"]
        for r in bfs_hops(_edges_df(spark), "a", max_hops=1).collect()
    }
    assert got == {"a": 0, "b": 1, "c": 1}
    # edges are directed: nothing reaches 'a'
    got_b = {
        r["node"]: r["hops"]
        for r in bfs_hops(_edges_df(spark), "b", max_hops=5).collect()
    }
    assert got_b == {"b": 0, "c": 1, "d": 2}


def test_sssp_later_round_improves_distance(spark):
    from c3dc_etl_spark.operators.graph import sssp_bounded

    edges = spark.createDataFrame(
        [("a", "b", 10), ("a", "c", 1), ("c", "b", 1), ("b", "d", 1)],
        "src STRING, dst STRING, w BIGINT",
    )
    r1 = {
        r["node"]: r["dist"]
        for r in sssp_bounded(edges, "a", rounds=1).collect()
    }
    assert r1 == {"a": 0, "b": 10, "c": 1}
    r2 = {
        r["node"]: r["dist"]
        for r in sssp_bounded(edges, "a", rounds=2).collect()
    }
    # cheaper 2-edge path a->c->b overwrites the direct edge; d appears
    # via the then-best b=10 prefix (10+1)
    assert r2 == {"a": 0, "b": 2, "c": 1, "d": 11}
    r3 = {
        r["node"]: r["dist"]
        for r in sssp_bounded(edges, "a", rounds=3).collect()
    }
    assert r3["d"] == 3


def test_bfs_isolated_source(spark):
    got = bfs_hops(_edges_df(spark), "zzz", max_hops=3).collect()
    assert [(r["node"], r["hops"]) for r in got] == [("zzz", 0)]


def test_hierarchy_paths_small_tree(spark):
    from c3dc_etl_spark.operators.graph import hierarchy_paths

    nodes = spark.createDataFrame(
        [(1, None), (2, 1), (3, 1), (4, 2), (5, 4), (9, None)],
        "id BIGINT, parent BIGINT",
    )
    got = {
        r["id"]: (r["depth"], r["path"])
        for r in hierarchy_paths(nodes).collect()
    }
    assert got == {
        1: (0, "1"),
        2: (1, "1/2"),
        3: (1, "1/3"),
        4: (2, "1/2/4"),
        5: (3, "1/2/4/5"),
        9: (0, "9"),  # forest: second root
    }


def test_hierarchy_paths_detects_cycle(spark):
    from c3dc_etl_spark.operators.graph import hierarchy_paths

    nodes = spark.createDataFrame(
        [(1, None), (2, 3), (3, 2)],
        "id BIGINT, parent BIGINT",
    )
    # 2<->3 never reaches a root; the walk exhausts max_depth... but a
    # cycle UNREACHABLE from a root yields an EMPTY frontier (neither 2
    # nor 3 descends from 1), so it terminates with the reachable set
    got = {r["id"] for r in hierarchy_paths(nodes, max_depth=5).collect()}
    assert got == {1}
    # a cycle REACHABLE from the walk would loop: parent chain 1->2->3->2
    looped = spark.createDataFrame(
        [(1, None), (2, 1), (3, 2), (2, 3)],
        "id BIGINT, parent BIGINT",
    )
    import pytest as _pytest

    with _pytest.raises(RuntimeError, match="max_depth"):
        hierarchy_paths(looped, max_depth=4)


# ---------------------------------------------------------------------------
# property-based: random inputs vs brute-force references
# ---------------------------------------------------------------------------

from hypothesis import given, settings, strategies as st  # noqa: E402


@given(
    rows=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=50),
            st.integers(min_value=0, max_value=50),
        ),
        min_size=0,
        max_size=25,
    ),
    n_buckets=st.sampled_from([1, 4, 64]),
)
@settings(max_examples=10, deadline=None)
def test_skyline_property_matches_brute_force(spark, rows, n_buckets):
    data = [(i, x, y) for i, (x, y) in enumerate(rows)]
    df = spark.createDataFrame(
        data, "id BIGINT, x BIGINT, y BIGINT"
    ) if data else spark.createDataFrame([], "id BIGINT, x BIGINT, y BIGINT")
    got = sorted(
        (r["id"], r["x"], r["y"])
        for r in skyline_2d(df, "x", "y", n_buckets=n_buckets).collect()
    )
    assert got == _brute_skyline(data)


def _brute_phrase(docs, phrase):
    out = {}
    k = len(phrase)
    for doc_id, toks in docs:
        anchors = [
            a
            for a in range(len(toks) - k + 1)
            if toks[a : a + k] == list(phrase)
        ]
        if anchors:
            out[doc_id] = (len(anchors), anchors[0])
    return out


@given(
    docs=st.lists(
        st.lists(st.sampled_from(["a", "b", "c"]), max_size=12),
        min_size=1,
        max_size=6,
    ),
    phrase=st.lists(
        st.sampled_from(["a", "b", "c"]), min_size=1, max_size=3
    ),
)
@settings(max_examples=10, deadline=None)
def test_phrase_match_property_matches_brute_force(spark, docs, phrase):
    from c3dc_etl_spark.operators import search as S

    data = [(i, " ".join(toks)) for i, toks in enumerate(docs)]
    df = spark.createDataFrame(data, "doc_id BIGINT, text STRING")
    pos = S.doc_positions(df, "text", "doc_id")
    got = {
        r["doc_id"]: (r["n_hits"], r["first_pos"])
        for r in S.phrase_match(pos, list(phrase)).collect()
    }
    assert got == _brute_phrase(
        [(i, toks) for i, toks in enumerate(docs)], phrase
    )

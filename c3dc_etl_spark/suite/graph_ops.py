"""Graph-analytics queries: PageRank over the bipartite purchase graph.

The connected-components operator (operators/graph.py) already backs
the dedup suite; this adds the rank-propagation side with an oracle
that replays the SAME fixed-point iterations as DuckDB CTEs — integer
arithmetic end-to-end, so cross-engine parity is exact by construction
(no per-iteration FP rounding to reconcile).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from c3dc_etl_spark.operators.graph import pagerank
from c3dc_etl_spark.operators.iterscope import iteration_shuffle_scope
from c3dc_etl_spark.sizing import parquet_row_count
from c3dc_etl_spark.suite.registry import load, query

PR_ITERATIONS = 3
PR_DAMPING_PCT = 85
_ONE = 10**12


# The purchase-graph queries' public node ids are strings ('c:<custkey>'
# / 's:<suppkey>'). Round-12 optimization: every join/aggregate INSIDE
# the iterative loops now runs on a LONG encoding of those ids —
# customer k -> 2k, supplier k -> 2k+1 (bijective for the nonnegative
# keys TPC-H guarantees) — and the final projection decodes back to the
# public strings. String ids paid hash/compare cost and ~2x the shuffle
# bytes on every one of the loops' per-round exchanges; measured at
# sf0.1 (quiet box, noop sink, 3-4 runs): pagerank 4.1 -> 2.9s, sssp
# 4.4 -> 3.5s, kcore 4.4 -> 3.3s, bfs 5.3 -> 3.6s, identical rows.

def _enc_c(col: str) -> Column:
    return (F.col(col).cast("long") * 2)


def _enc_s(col: str) -> Column:
    return (F.col(col).cast("long") * 2 + 1)


def _encode_source(source: str) -> int:
    kind, _, num = source.partition(":")
    return int(num) * 2 if kind == "c" else int(num) * 2 + 1


def _decode_node(col: str = "node") -> Column:
    return (
        F.when(
            F.col(col) % 2 == 0,
            F.concat(F.lit("c:"), F.expr(f"{col} div 2").cast("string")),
        )
        .otherwise(
            F.concat(F.lit("s:"), F.expr(f"({col} - 1) div 2").cast("string"))
        )
        .alias(col)
    )


def _pagerank_oracle(iterations: int = PR_ITERATIONS) -> str:
    head = f"""
WITH pairs AS (
    SELECT DISTINCT o_custkey AS ck, l_suppkey AS sk
    FROM orders JOIN lineitem ON l_orderkey = o_orderkey
),
edges AS (
    SELECT 'c:' || CAST(ck AS STRING) AS src,
           's:' || CAST(sk AS STRING) AS dst FROM pairs
    UNION ALL
    SELECT 's:' || CAST(sk AS STRING),
           'c:' || CAST(ck AS STRING) FROM pairs
),
nodes AS (SELECT DISTINCT src AS node FROM edges),
ncnt AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM nodes),
tele AS (
    SELECT CAST(((100 - {PR_DAMPING_PCT}) * {_ONE}) // (100 * n) AS BIGINT)
           AS tp
    FROM ncnt
),
outdeg AS (
    SELECT src AS node, CAST(COUNT(*) AS BIGINT) AS out_deg
    FROM edges GROUP BY src
),
r0 AS (
    SELECT node, CAST({_ONE} // n AS BIGINT) AS rank_x1e12 FROM nodes, ncnt
)"""
    its = []
    for i in range(1, iterations + 1):
        its.append(f""",
r{i} AS (
    SELECT n.node,
           CAST(t.tp + (COALESCE(s.mass, 0) * {PR_DAMPING_PCT}) // 100
                AS BIGINT) AS rank_x1e12
    FROM nodes n
    CROSS JOIN tele t
    LEFT JOIN (
        SELECT e.dst AS node,
               CAST(SUM(r.rank_x1e12 // od.out_deg) AS BIGINT) AS mass
        FROM edges e
        JOIN r{i - 1} r ON e.src = r.node
        JOIN outdeg od ON e.src = od.node
        GROUP BY e.dst
    ) s ON n.node = s.node
)""")
    return head + "".join(its) + f"\nSELECT node, rank_x1e12 FROM r{iterations}"


@query("pagerank_purchase_graph", oracle=_pagerank_oracle(), tags=("graph",))
def pagerank_purchase_graph(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PageRank over the bipartite customer-supplier purchase graph
    (edges = distinct (custkey, suppkey) pairs from orders x lineitem,
    mirrored so the walk is undirected and dangling-free): {PR_ITERATIONS}
    fixed-point power iterations at damping 0.85. Ranks are picounit
    BIGINTs and every operation is integer arithmetic, so the oracle
    replays the identical iterations as a CTE chain with exact parity —
    the iterative-algorithm-as-oracle pattern (see _kmeans_ctes)
    without even a rounding discipline to maintain. Per iteration at
    scale: one equi-join of the static degree-annotated edge list with
    the (node, rank) frame and one dst-keyed partial-agg exchange —
    Pregel's communication pattern in two Catalyst operators."""
    return build_purchase_pagerank(spark, sf_dir, eager_final=True)


def build_purchase_pagerank(
    spark: SparkSession, sf_dir: str, *, eager_final: bool
) -> DataFrame:
    """The registry query's REAL pipeline with the final-state
    materialization policy as a parameter: the registry entry runs
    eager (localCheckpoint collapses the repeated-collect plan), while
    tests/test_graph.py fences the SAME pipeline lazily — eager_final
    hides the edge-derivation joins from every plan lint
    (tests/plan_budget.json pins an all-zero row for the eager form),
    so the lazy build is the only place the real plan stays visible
    (ADVICE r10)."""
    from c3dc_etl_spark.pinning import pin

    orders = load(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    # reducers sized to the edge working set, not core count
    # (operators/iterscope.py: session-wide A/B at sf0.1, 32 -> 8
    # parts took this 6.0s -> 3.7s). The scope covers the WHOLE build
    # — pin materialization, node count, and (via eager_final) the
    # fused power-iteration DAG — because the conf is read at action
    # time; the cheap lineitem count sizes it before any heavy work.
    # Scope sizing input: 2x the lineitem row count is an UPPER BOUND
    # on the mirrored distinct (cust, supp) edge count — it assumes few
    # duplicate pairs, which holds for TPC-H-shaped data (a customer
    # rarely re-buys from the same supplier); on duplicate-heavy data
    # it overestimates volume and the derived reducer count rounds one
    # or two powers-of-two high, which costs scheduling overhead but
    # never correctness. The count itself is a cached driver-side
    # parquet-footer read, not a Spark job (ADVICE r10).
    n_edges = 2 * parquet_row_count(f"{sf_dir}/lineitem.parquet")
    with iteration_shuffle_scope(spark, n_edges):
        # pin: the fact-table join + distinct feeds the edge mirror,
        # the node count, and (inside pagerank) the degree/edge
        # frames — one derivation instead of one per consumer.
        # Long-encoded node ids (module note above): the whole power
        # iteration joins/aggregates on 8-byte longs.
        pairs = pin(
            li.join(orders, li.l_orderkey == orders.o_orderkey)
            .select(_enc_c("o_custkey").alias("c"), _enc_s("l_suppkey").alias("s"))
            .distinct()
        )
        edges = pairs.select(
            F.col("c").alias("src"), F.col("s").alias("dst")
        ).unionByName(
            pairs.select(F.col("s").alias("src"), F.col("c").alias("dst"))
        )
        n_nodes = edges.select("src").distinct().count()  # bounded scalar
        ranks = pagerank(
            edges,
            n_nodes,
            damping_pct=PR_DAMPING_PCT,
            iterations=PR_ITERATIONS,
            eager_final=eager_final,
        )
    return ranks.select(_decode_node("node"), "rank_x1e12")


_TRIANGLE_ORACLE = """
WITH e AS MATERIALIZED (
    SELECT DISTINCT LEAST(a.l_partkey, b.l_partkey) AS u,
                    GREATEST(a.l_partkey, b.l_partkey) AS v
    FROM lineitem a
    JOIN lineitem b ON a.l_orderkey = b.l_orderkey
                   AND a.l_partkey < b.l_partkey
),
deg AS (
    SELECT node, CAST(COUNT(*) AS BIGINT) AS d
    FROM (SELECT u AS node FROM e UNION ALL SELECT v AS node FROM e)
    GROUP BY node
),
tri AS (
    SELECT CAST(COUNT(*) AS BIGINT) AS n_triangles
    FROM e e1
    JOIN e e2 ON e1.u = e2.u AND e1.v < e2.v
    JOIN e e3 ON e3.u = e1.v AND e3.v = e2.v
),
stats AS (
    SELECT CAST(COUNT(*) AS BIGINT) AS n_nodes,
           CAST(SUM(d) // 2 AS BIGINT) AS n_edges,
           CAST(SUM(d * (d - 1) // 2) AS BIGINT) AS n_wedges
    FROM deg
)
SELECT n_nodes, n_edges, n_wedges, n_triangles,
       CAST((3 * n_triangles * 1000000) // n_wedges AS BIGINT)
           AS clustering_x1e6
FROM stats, tri
"""


@query("triangle_count_coorder", oracle=_TRIANGLE_ORACLE, tags=("graph",))
def triangle_count_coorder(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact triangle census of the part co-order graph (parts are
    adjacent when some order contains both): global triangle count +
    clustering coefficient via DEGREE-ORIENTED wedge closing
    (operators/graph.py triangle_count) — each triangle counted once
    from its lowest-(degree, id) corner, wedge work bounded by
    sum(out_deg^2) with out_deg <= O(sqrt(m)) under the orientation,
    which is what survives a hub part ordered in half the corpus. The
    oracle counts the SAME orientation-invariant quantities with the
    simpler id-ordered formulation — equality is exact integers, no
    rounding discipline needed."""
    from c3dc_etl_spark.operators.graph import triangle_count

    li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    a = li.select(F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("pa"))
    b = li.select(F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("pb"))
    edges = (
        a.join(b, "ok")
        .filter(F.col("pa") < F.col("pb"))
        .select(F.col("pa").alias("src"), F.col("pb").alias("dst"))
        .distinct()
    )
    return triangle_count(edges)


LP_HUB_CAP = 200   # middle-role degree cap: a hub part ordered in half
LP_TOP_K = 50      # the corpus carries ~no link signal but C(deg,2) cost


_LINK_PRED_ORACLE = f"""
WITH li AS (
    SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem
),
edges AS (
    SELECT DISTINCT a.pk AS u, b.pk AS v
    FROM li a JOIN li b ON a.ok = b.ok AND a.pk < b.pk
),
deg AS (
    SELECT node, COUNT(*) AS d FROM (
        SELECT u AS node FROM edges UNION ALL SELECT v FROM edges
    ) GROUP BY 1
),
adj AS (
    SELECT u AS m, v AS n FROM edges UNION ALL SELECT v, u FROM edges
),
mid AS (
    SELECT adj.m, adj.n FROM adj JOIN deg ON adj.m = deg.node
    WHERE deg.d <= {LP_HUB_CAP}
),
wedge AS (
    SELECT a.n AS x, b.n AS y, COUNT(*) AS cn
    FROM mid a JOIN mid b ON a.m = b.m AND a.n < b.n
    GROUP BY 1, 2
),
cand AS (
    SELECT w.x, w.y, w.cn FROM wedge w
    LEFT JOIN edges e ON e.u = w.x AND e.v = w.y
    WHERE e.u IS NULL
)
SELECT CAST(x AS BIGINT) AS part_a, CAST(y AS BIGINT) AS part_b,
       CAST(cn AS BIGINT) AS common_neighbors
FROM cand
ORDER BY cn DESC, x ASC, y ASC
LIMIT {LP_TOP_K}
"""


@query(
    "link_prediction_common_neighbors",
    oracle=_LINK_PRED_ORACLE,
    tags=("graph",),
)
def link_prediction_common_neighbors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Link prediction on the part co-order graph: for part pairs NOT
    yet co-ordered, count common neighbors (parts co-ordered with
    both) and emit the top-k strongest predicted links — the classic
    common-neighbors recommender. Wedge enumeration goes through the
    MIDDLE node, whose degree is capped at {LP_HUB_CAP} (the shingle
    df-cap move: a hub ordered with half the catalog contributes
    C(deg,2) wedges and near-zero link signal — dropping the hub
    middles makes the count a deterministic lower bound and bounds the
    join at middles * cap^2). Counts are exact integers; the top-k is
    a TakeOrdered with a full deterministic tiebreak."""
    li = load(spark, sf_dir, "lineitem").select(
        F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("pk")
    ).distinct()
    a = li.select("ok", F.col("pk").alias("u"))
    b = li.select("ok", F.col("pk").alias("v"))
    edges = (
        a.join(b, "ok")
        .filter(F.col("u") < F.col("v"))
        .select("u", "v")
        .distinct()
    )
    from c3dc_etl_spark.operators.dedup import drop_oversized_groups
    from c3dc_etl_spark.pinning import pin
    from c3dc_etl_spark.sizing import (
        parquet_column_range,
        parquet_row_count,
        sized_partitions,
    )

    edges = pin(edges)
    adj = edges.select(F.col("u").alias("m"), F.col("v").alias("n")).unionAll(
        edges.select(F.col("v").alias("m"), F.col("u").alias("n"))
    )
    pk_range = parquet_column_range(f"{sf_dir}/lineitem.parquet", "l_partkey")
    li_rows = parquet_row_count(f"{sf_dir}/lineitem.parquet")
    packable = (
        pk_range is not None and 0 <= pk_range[0] and pk_range[1] < 2**32
    )
    # Round-13 optimization (guide §2.4 "remove shuffles outright",
    # §3.1): every wedge contribution to a pair (x, y) carries the same
    # SMALLER endpoint x (pairs are generated x < y from the middle's
    # sorted neighbor array), so hash-partitioning the per-middle
    # generation rows by x makes HashPartitioning(x) satisfy the
    # groupBy(x, y) distribution — the 147M wedge rows and the ~100M
    # candidate groups NEVER cross an exchange, the per-partition
    # aggregate is globally exact, and the top-k is a per-partition
    # TakeOrdered. The wedge SortMergeJoin is gone too: pairs explode
    # from capped sorted neighbor arrays joined back by BROADCAST
    # (arrays payload == capped adjacency entries <= 6 * lineitem rows;
    # guarded to <= 4M rows i.e. <= ~24M entries / ~200 MB worst case,
    # stating the ADVICE r12 bound honestly: co-order edge keys can
    # reach 3x lineitem rows, not 1x — measured fine at 3M rows/48g,
    # and the x5 cross-validation below is the reason the gate sits at
    # 4M). Generation is codegen explode + post-filter (the
    # higher-order filter(ns, t -> t > x) lambda evaluates interpreted
    # per ELEMENT — measured 3x slower); the existing-edge anti-join
    # probes a PACKED single-long broadcast key (LongHashedRelation —
    # measured 10x faster than the two-column UnsafeHashedRelation
    # over the wedge stream: 2.2s vs 20s) BEFORE the aggregate, so
    # triangle wedges never enter the hash maps. Interleaved quiet-box
    # A/B at sf0.1 (3 rounds, rows identical): r12 packed shape
    # [15.8, 30.4, 18.8]s noop vs this [10.1, 8.5, 9.7] (64 parts) /
    # [16.1, 8.2, 8.3] (128 parts). x5 cross-validation (lineitem 3M
    # rows): the r12 SMJ shape read 239.6s noop vs 62.4s for this
    # shape, rows identical — which is why the gate is 4M, not the
    # bench-sized 1.5M.
    if packable and li_rows <= 4_000_000:
        # capped sorted neighbor arrays per middle: the size filter is
        # the same cap semantics as drop_oversized_groups (count > cap
        # dropped); at <= 4M lineitem rows the worst-case single
        # array buffer is bounded by the adjacency itself (~200 MB,
        # physically far smaller) so collect_list without a pre-count
        # is safe in this branch.
        nbrs = pin(
            adj.groupBy("m")
            .agg(F.array_sort(F.collect_list("n")).alias("ns"))
            .filter(F.size("ns") <= LP_HUB_CAP)
        )
        # reducer count from the wedge-volume BOUND, never core count:
        # wedges = sum C(d_m, 2) <= (cap-1)/2 * adjacency entries
        # <= (cap-1)/2 * 6 * lineitem rows; ~48 MB of 16-byte wedge
        # rows per partition (sf0.1: 64 partitions).
        n_parts = sized_partitions(
            (LP_HUB_CAP - 1) * 3 * li_rows * 16,
            48 << 20,
            min_partitions=8,
            max_partitions=4096,
        )
        side = nbrs.select("m", F.explode("ns").alias("x")).repartition(
            n_parts, "x"
        )
        packed_edges = edges.select(
            (F.shiftleft(F.col("u").cast("long"), 32) + F.col("v")).alias("k")
        )
        cand = (
            side.join(F.broadcast(nbrs), "m")
            .select("x", F.explode("ns").alias("y"))
            .filter(F.col("y") > F.col("x"))
            .join(
                F.broadcast(packed_edges),
                F.expr("shiftleft(cast(x as bigint), 32) + y") == F.col("k"),
                "left_anti",
            )
            .groupBy("x", "y")
            .agg(F.count(F.lit(1)).alias("cn"))
        )
        return (
            cand.select(
                F.col("x").cast("bigint").alias("part_a"),
                F.col("y").cast("bigint").alias("part_b"),
                F.col("cn").cast("bigint").alias("common_neighbors"),
            )
            .orderBy(
                F.col("common_neighbors").desc(),
                F.col("part_a").asc(),
                F.col("part_b").asc(),
            )
            .limit(LP_TOP_K)
        )
    # degree cap on the middle role == group-size cap on m (map-side
    # combined count + anti-join, never a partitionBy(m) window).
    # pin: mid feeds BOTH sides of the wedge self-join — without the
    # pin the adjacency + cap chain is derived twice (round-12 A/B:
    # pin alone took the query 66 -> 38s at sf0.1).
    mid = pin(drop_oversized_groups(adj, ["m"], LP_HUB_CAP))
    wa = mid.select("m", F.col("n").alias("x"))
    wb = mid.select("m", F.col("n").alias("y"))
    wedge_pairs = wa.join(wb, "m").filter(F.col("x") < F.col("y"))
    # Round-12 optimization (guide §2.3 "narrower types" / §2.4): the
    # wedge aggregate is the whole query — sum(C(deg_m, 2)) rows
    # hash-aggregated into the candidate (x, y) groups. When the
    # parquet footer PROVES part keys fit in [0, 2^32) (driver-side
    # stats read, no job), the pair key packs into ONE bigint
    # (x * 2^32 + y, bijective): half the shuffle bytes per wedge row
    # and a single-long group key for the hash aggregate. This branch
    # only runs past the 4M-row arrays-broadcast gate above, where the
    # edge set (up to 3x lineitem rows — ADVICE r12) is too big to
    # ship either, so the anti-join runs AFTER the aggregate where it
    # reuses the aggregate's k-partitioning. Footer stats missing or
    # keys out of range -> the original struct-keyed shape.
    # A/B at sf0.1 (identical rows, noop sink, round 12): struct base
    # 64-68s, packed 20-25s.
    if packable:
        packed_edges = edges.select(
            (F.shiftleft(F.col("u").cast("long"), 32) + F.col("v")).alias("k")
        )
        wedge_keys = wedge_pairs.select(
            (F.shiftleft(F.col("x").cast("long"), 32) + F.col("y")).alias("k")
        )
        cand = (
            wedge_keys.groupBy("k")
            .agg(F.count(F.lit(1)).alias("cn"))
            .join(packed_edges, "k", "left_anti")
        )
        return (
            cand.select(
                F.shiftrightunsigned(F.col("k"), 32).cast("bigint").alias("part_a"),
                F.col("k").bitwiseAND(F.lit(0xFFFFFFFF)).cast("bigint").alias(
                    "part_b"
                ),
                F.col("cn").cast("bigint").alias("common_neighbors"),
            )
            .orderBy(
                F.col("common_neighbors").desc(),
                F.col("part_a").asc(),
                F.col("part_b").asc(),
            )
            .limit(LP_TOP_K)
        )
    wedges = wedge_pairs.groupBy("x", "y").agg(F.count(F.lit(1)).alias("cn"))
    cand = wedges.join(
        edges.select(F.col("u").alias("x"), F.col("v").alias("y")),
        ["x", "y"],
        "left_anti",
    )
    return (
        cand.select(
            F.col("x").cast("bigint").alias("part_a"),
            F.col("y").cast("bigint").alias("part_b"),
            F.col("cn").cast("bigint").alias("common_neighbors"),
        )
        .orderBy(
            F.col("common_neighbors").desc(),
            F.col("part_a").asc(),
            F.col("part_b").asc(),
        )
        .limit(LP_TOP_K)
    )


BFS_SOURCE = "c:1"
BFS_MAX_HOPS = 3

_BFS_ORACLE = f"""
WITH RECURSIVE pairs AS (
    SELECT DISTINCT o_custkey AS ck, l_suppkey AS sk
    FROM orders JOIN lineitem ON l_orderkey = o_orderkey
),
edges AS (
    SELECT 'c:' || CAST(ck AS STRING) AS src,
           's:' || CAST(sk AS STRING) AS dst FROM pairs
    UNION ALL
    SELECT 's:' || CAST(sk AS STRING),
           'c:' || CAST(ck AS STRING) FROM pairs
),
walk(node, hops) AS (
    SELECT '{BFS_SOURCE}' AS node, 0 AS hops
    UNION
    SELECT e.dst, w.hops + 1
    FROM walk w JOIN edges e ON e.src = w.node
    WHERE w.hops < {BFS_MAX_HOPS}
)
SELECT node, CAST(MIN(hops) AS BIGINT) AS hops
FROM walk GROUP BY node
"""


@query("graph_bfs_hops", oracle=_BFS_ORACLE, tags=("graph",))
def graph_bfs_hops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Single-source unweighted shortest paths (BFS hop counts) from
    one customer over the mirrored purchase graph, depth-capped at
    BFS_MAX_HOPS. Spark runs frontier BFS (operators/graph.py:bfs_hops
    — per-round join + anti-join, localCheckpoint lineage discipline);
    the oracle is the SAME computation as a DuckDB recursive CTE whose
    UNION-dedup level expansion is bounded by n_nodes x max_hops rows,
    with MIN(hops) collapsing rediscoveries — first-discovery BFS and
    min-over-all-walks agree exactly, so the hash compare pins the
    iterative loop against ANSI recursion semantics."""
    from c3dc_etl_spark.operators.graph import bfs_hops
    from c3dc_etl_spark.pinning import pin

    orders = load(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    pairs = pin(
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .select(_enc_c("o_custkey").alias("c"), _enc_s("l_suppkey").alias("s"))
        .distinct()
    )
    edges = pairs.select(
        F.col("c").alias("src"), F.col("s").alias("dst")
    ).unionByName(pairs.select(F.col("s").alias("src"), F.col("c").alias("dst")))
    visited = bfs_hops(edges, _encode_source(BFS_SOURCE), max_hops=BFS_MAX_HOPS)
    return visited.select(_decode_node("node"), "hops")


SSSP_ROUNDS = 3


def _sssp_oracle(rounds: int = SSSP_ROUNDS) -> str:
    head = f"""
WITH pairs AS (
    SELECT o_custkey AS ck, l_suppkey AS sk,
           CAST(COUNT(DISTINCT o_orderkey) AS BIGINT) AS cnt
    FROM orders JOIN lineitem ON l_orderkey = o_orderkey
    GROUP BY 1, 2
),
edges AS (
    SELECT 'c:' || CAST(ck AS STRING) AS src,
           's:' || CAST(sk AS STRING) AS dst,
           CAST(1 + (cnt % 5) AS BIGINT) AS w FROM pairs
    UNION ALL
    SELECT 's:' || CAST(sk AS STRING),
           'c:' || CAST(ck AS STRING),
           CAST(1 + (cnt % 5) AS BIGINT) FROM pairs
),
d0(node, dist) AS (SELECT '{BFS_SOURCE}', CAST(0 AS BIGINT))"""
    steps = []
    for i in range(1, rounds + 1):
        steps.append(f""",
d{i} AS (
    SELECT node, CAST(MIN(dist) AS BIGINT) AS dist FROM (
        SELECT node, dist FROM d{i - 1}
        UNION ALL
        SELECT e.dst, d.dist + e.w
        FROM d{i - 1} d JOIN edges e ON e.src = d.node
    ) GROUP BY node
)""")
    return head + "".join(steps) + f"\nSELECT node, dist FROM d{rounds}"


@query("graph_sssp_bounded", oracle=_sssp_oracle(), tags=("graph",))
def graph_sssp_bounded(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bounded Bellman-Ford single-source shortest paths over the
    weighted purchase graph (edge cost derived from order multiplicity,
    exact integers): cheapest cost within SSSP_ROUNDS edges. The oracle
    replays the identical relaxation rounds as an unrolled CTE chain
    (the pagerank pattern) — unlike graph_bfs_hops this pins the
    re-relax semantics where a later round can IMPROVE an earlier
    distance via a cheaper longer path, which a visited-set BFS would
    get wrong (operators/graph.py:sssp_bounded)."""
    from c3dc_etl_spark.operators.graph import sssp_bounded
    from c3dc_etl_spark.pinning import pin

    orders = load(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    pairs = pin(
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy("o_custkey", "l_suppkey")
        .agg(F.countDistinct("o_orderkey").cast("bigint").alias("cnt"))
        .select(
            _enc_c("o_custkey").alias("c"),
            _enc_s("l_suppkey").alias("s"),
            (F.lit(1) + (F.col("cnt") % 5)).cast("bigint").alias("w"),
        )
    )
    edges = pairs.select(
        F.col("c").alias("src"), F.col("s").alias("dst"), "w"
    ).unionByName(
        pairs.select(F.col("s").alias("src"), F.col("c").alias("dst"), "w")
    )
    dist = sssp_bounded(edges, _encode_source(BFS_SOURCE), rounds=SSSP_ROUNDS)
    return dist.select(_decode_node("node"), "dist")


_HIERARCHY_ORACLE = """
WITH RECURSIVE nodes AS (
    SELECT c_custkey AS id,
           CASE WHEN c_custkey = 0 THEN NULL
                ELSE (c_custkey - 1) // 2 END AS parent
    FROM customer
),
walk(id, depth, path) AS (
    SELECT id, CAST(0 AS BIGINT), CAST(id AS VARCHAR)
    FROM nodes WHERE parent IS NULL
    UNION ALL
    SELECT n.id, w.depth + 1, w.path || '/' || CAST(n.id AS VARCHAR)
    FROM walk w JOIN nodes n ON n.parent = w.id
)
SELECT id, depth, path FROM walk
"""


@query("hierarchy_flatten_paths", oracle=_HIERARCHY_ORACLE, tags=("graph",))
def hierarchy_flatten_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Parent-pointer hierarchy flattening into root-relative
    materialized paths — the org-chart/category-tree/BOM query. The
    hierarchy is DERIVED from real keys (a binary heap over custkeys:
    parent(k) = (k-1) div 2, single root 0), so its depth GROWS with
    scale factor (~log2 n) and the level-synchronous walk
    (operators/graph.py:hierarchy_paths — each node visited exactly
    once, O(nodes) total shuffle regardless of depth) is exercised at
    every sf. Oracle: the identical walk as an ANSI recursive CTE with
    string-path accumulation — the third recursion-vs-iteration pin
    beside BFS (UNION-dedup) and Bellman-Ford (unrolled rounds)."""
    from c3dc_etl_spark.operators.graph import hierarchy_paths

    cust = load(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("id"),
        F.expr(
            "CASE WHEN c_custkey = 0 THEN NULL"
            " ELSE (c_custkey - 1) div 2 END"
        ).alias("parent"),
    )
    return hierarchy_paths(cust, id_col="id", parent_col="parent")


KCORE_K = 4
KCORE_ROUNDS = 3


def _kcore_oracle(k: int = KCORE_K, rounds: int = KCORE_ROUNDS) -> str:
    head = """
WITH pairs AS (
    SELECT DISTINCT o_custkey AS ck, l_suppkey AS sk
    FROM orders JOIN lineitem ON l_orderkey = o_orderkey
),
e0 AS (
    SELECT 'c:' || CAST(ck AS STRING) AS src,
           's:' || CAST(sk AS STRING) AS dst FROM pairs
    UNION ALL
    SELECT 's:' || CAST(sk AS STRING),
           'c:' || CAST(ck AS STRING) FROM pairs
)"""
    its = []
    for i in range(1, rounds + 1):
        its.append(f""",
a{i} AS (
    SELECT src AS node FROM e{i - 1} GROUP BY src HAVING COUNT(*) >= {k}
),
e{i} AS (
    SELECT e.src, e.dst FROM e{i - 1} e
    JOIN a{i} x ON e.src = x.node
    JOIN a{i} y ON e.dst = y.node
)"""
        )
    return (
        head
        + "".join(its)
        + f"""
SELECT src AS node, CAST(COUNT(*) AS BIGINT) AS degree
FROM e{rounds} GROUP BY src"""
    )


@query("graph_kcore_bounded", oracle=_kcore_oracle(), tags=("graph",))
def graph_kcore_bounded(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bounded k-core peeling over the bipartite purchase graph: 3
    synchronous rounds of removing nodes with degree < 4 (and their
    edges), returning the survivors with their residual degrees — the
    density-extraction primitive (spam/bot subgraphs, co-purchase
    cores) whose fixpoint form is THE canonical iterative-peeling
    algorithm. Rounds are bounded for cross-engine determinism exactly
    as graph_sssp_bounded: the oracle replays the identical rounds as
    a CTE chain (the fourth recursion-vs-iteration pin). Per round one
    degree partial-agg + two semi-joins, localCheckpoint-ed so plan
    size is constant in the round count
    (operators/graph.py:kcore_bounded)."""
    from c3dc_etl_spark.operators.graph import kcore_bounded
    from c3dc_etl_spark.pinning import pin

    orders = load(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    # reducers sized to the edge working set (iterscope: session-wide
    # A/B at sf0.1, 32 -> 8 parts took this 5.5s -> 3.2s); the scope
    # covers the pin + the eagerly-checkpointed peel rounds — only the
    # final degree agg runs under the session default
    # same upper-bound sizing input as pagerank: cached footer read,
    # 2x rows assumes few duplicate (cust, supp) pairs (see there)
    with iteration_shuffle_scope(
        spark, 2 * parquet_row_count(f"{sf_dir}/lineitem.parquet")
    ):
        pairs = pin(
            li.join(orders, li.l_orderkey == orders.o_orderkey)
            .select(_enc_c("o_custkey").alias("c"), _enc_s("l_suppkey").alias("s"))
            .distinct()
        )
        edges = pairs.select(
            F.col("c").alias("src"), F.col("s").alias("dst")
        ).unionByName(
            pairs.select(F.col("s").alias("src"), F.col("c").alias("dst"))
        )
        survivors = kcore_bounded(edges, KCORE_K, rounds=KCORE_ROUNDS)
    return survivors.select(_decode_node("node"), "degree")


_RECURSIVE_NATIVE_SQL = """
WITH RECURSIVE nodes AS (
    SELECT c_custkey AS id,
           CASE WHEN c_custkey = 0 THEN NULL
                ELSE (c_custkey - 1) {div} 2 END AS parent
    FROM customer
),
walk(id, depth, path) AS (
    SELECT id, CAST(0 AS BIGINT), CAST(id AS STRING)
    FROM nodes WHERE parent IS NULL
    UNION ALL
    SELECT n.id, w.depth + 1, w.path || '/' || CAST(n.id AS STRING)
    FROM walk w JOIN nodes n ON n.parent = w.id
)
SELECT id, depth, path FROM walk
"""


@query(
    "recursive_cte_native",
    oracle=_RECURSIVE_NATIVE_SQL.format(div="//"),
    tags=("graph", "conformance"),
)
def recursive_cte_native(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ENGINE-NATIVE recursion: the same heap-derived hierarchy walk as
    hierarchy_flatten_paths, but run through Spark's own WITH RECURSIVE
    (new in Spark 4.x) on textually equivalent SQL in both engines —
    the only dialect seams are integer division (div vs //) and the
    STRING/VARCHAR cast spelling. Three-way agreement with the
    iterative operator (hierarchy_paths shares this oracle's relation)
    pins that Spark's recursive execution, DuckDB's recursive
    execution, and the level-synchronous DataFrame loop all compute the
    same fixpoint; depth grows with sf (~log2 n), so the recursion is
    genuinely exercised at every scale."""
    load(spark, sf_dir, "customer").createOrReplaceTempView("customer")
    return spark.sql(_RECURSIVE_NATIVE_SQL.format(div="div"))


_TEMPORAL_REACH_ORACLE = """
WITH e AS (
    SELECT DISTINCT o_custkey AS c, l_suppkey AS s,
           EPOCH_US(o_orderdate) // 86400000000 AS day
    FROM orders JOIN lineitem ON l_orderkey = o_orderkey
),
seeds AS (SELECT DISTINCT c FROM e WHERE c % 100 = 0),
hop1 AS (
    SELECT e.s, CAST(MIN(e.day) AS BIGINT) AS arrival
    FROM e JOIN seeds ON e.c = seeds.c
    GROUP BY e.s
),
hop2 AS (
    SELECT e.c AS node, CAST(MIN(e.day) AS BIGINT) AS arrival
    FROM e JOIN hop1 ON e.s = hop1.s AND e.day >= hop1.arrival
    WHERE e.c NOT IN (SELECT c FROM seeds)
    GROUP BY e.c
)
SELECT node, arrival FROM hop2
"""


@query(
    "temporal_reachability",
    oracle=_TEMPORAL_REACH_ORACLE,
    tags=("graph", "temporal"),
)
def temporal_reachability(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-RESPECTING reachability (contact tracing / influence
    spread): from seed customers, reach suppliers along purchase edges,
    then other customers along edges whose date is >= the supplier's
    earliest arrival — paths must move forward in time, which static
    reachability (BFS, T-components) cannot express. Two rounds of
    (equi-join + min-arrival partial agg) over the dated edge list; the
    time constraint rides the join condition so no post-filter
    re-touches the edge volume, and arrival times are exact epoch days.
    The bounded-round form is the determinism contract of
    sssp/kcore; a deeper spread iterates the same round shape with
    localCheckpoint."""
    # o_orderdate is TIMESTAMP(_NTZ) parquet: pin the session UTC so the
    # epoch-day bucket matches DuckDB's EPOCH_US on the naive wall clock
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    orders = load(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_custkey",
        F.expr(
            "unix_micros(CAST(o_orderdate AS TIMESTAMP)) div 86400000000"
        ).alias("day"),
    )
    li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    from c3dc_etl_spark.pinning import pin

    e = pin(
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .select(
            F.col("o_custkey").alias("c"),
            F.col("l_suppkey").alias("s"),
            "day",
        )
        .distinct()
    )
    seeds = e.filter(F.col("c") % 100 == 0).select("c").distinct()
    hop1 = (
        e.join(seeds.withColumnRenamed("c", "__seed"), F.col("c") == F.col("__seed"))
        .groupBy("s")
        .agg(F.min("day").alias("arrival"))
    )
    h1 = hop1.select(F.col("s").alias("__s"), "arrival")
    hop2 = (
        e.join(h1, (F.col("s") == F.col("__s")) & (F.col("day") >= F.col("arrival")))
        .join(seeds.withColumnRenamed("c", "__sc"), F.col("c") == F.col("__sc"), "left_anti")
        .groupBy(F.col("c").alias("node"))
        .agg(F.min("day").alias("arrival"))
    )
    return hop2

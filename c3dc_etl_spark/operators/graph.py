"""Connected components over near-duplicate pair graphs.

The production dedup flow is: candidate pairs (MinHash/SimHash LSH) ->
connected components -> keep one representative per component. This
module supplies the middle step as a DataFrame-native iterative
algorithm.

Scale design:
- Min-label propagation with POINTER JUMPING each round
  (label <- label[label]), the classic path-halving trick: worst-case
  rounds drop from O(diameter) to O(log n). Near-dup components are
  mostly LSH-bucket cliques with tiny diameters, so in practice 2-3
  rounds converge.
- Every round ends in ``localCheckpoint(eager=True)``: iterative
  self-joins otherwise double the lineage each round and the plan
  eventually dominates runtime (and breaks AQE). On a cluster with a
  configured checkpoint dir, ``DataFrame.checkpoint`` is the durable
  equivalent.
- All per-round work is two equi-joins + one groupBy-min on narrow
  (long, long) rows — shuffle volume is O(edges), partial min
  aggregation map-side; no Python, no collect of edges.
- Convergence test is a single count on the checkpointed frame per
  round (cheap: the frame is already materialized).

The reference pipeline has no graph operator (its dedup is exact
fingerprint matching, etl/target/c3dc_etl.py:278-329); this extends the
engine for LLM-corpus dedup where near-dup pairs form transitive
clusters.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    *,
    src: str = "id_a",
    dst: str = "id_b",
    max_iter: int = 25,
) -> DataFrame:
    """(node, component) for every node appearing in ``edges``;
    ``component`` is the smallest node id in the node's connected
    component (the canonical dedup representative).

    Raises if ``max_iter`` rounds do not converge — with pointer
    jumping that means a component of diameter > ~2^max_iter, which is
    a data bug, not a tuning problem.
    """
    e = edges.select(
        F.col(src).cast("long").alias("u"), F.col(dst).cast("long").alias("v")
    ).filter(F.col("u") != F.col("v"))
    sym = e.union(
        e.select(F.col("v").alias("u"), F.col("u").alias("v"))
    ).distinct()
    sym = sym.localCheckpoint(eager=True)

    # initial label: min(self, neighbors) — every node of the graph
    # appears on the u side of the symmetric edge list.
    lab = (
        sym.groupBy("u")
        .agg(F.min("v").alias("m"))
        .select("u", F.least(F.col("u"), F.col("m")).alias("lab"))
        .localCheckpoint(eager=True)
    )

    for _ in range(max_iter):
        # 1) neighbor-min propagation
        nl = (
            sym.join(
                lab.select(F.col("u").alias("v"), F.col("lab").alias("vlab")), "v"
            )
            .groupBy("u")
            .agg(F.min("vlab").alias("nmin"))
        )
        stepped = (
            lab.join(nl, "u", "left")
            .select(
                "u",
                F.least(F.col("lab"), F.coalesce(F.col("nmin"), F.col("lab"))).alias(
                    "lab"
                ),
            )
        )
        # 2) pointer jump: follow the label's own label (labels are node
        # ids, so they appear in the mapping)
        jumped = (
            stepped.alias("x")
            .join(
                stepped.select(
                    F.col("u").alias("lab"), F.col("lab").alias("plab")
                ).alias("p"),
                "lab",
                "left",
            )
            .select(
                F.col("x.u").alias("u"),
                F.coalesce(F.col("p.plab"), F.col("x.lab")).alias("lab"),
            )
        )
        new_lab = (
            jumped.join(lab.select("u", F.col("lab").alias("prev")), "u")
            .select("u", "lab", "prev")
            .localCheckpoint(eager=True)
        )
        changed = new_lab.filter(F.col("lab") != F.col("prev")).limit(1).count()
        lab = new_lab.select("u", "lab")
        if changed == 0:
            return lab.select(F.col("u").alias("node"), F.col("lab").alias("component"))
    raise RuntimeError(f"connected_components did not converge in {max_iter} rounds")


def _seed_node_type(edges: DataFrame, src: str, source) -> str:
    """Schema for a frontier seed: LONG for int seeds, STRING for str —
    validated against the edge list's ``src`` dtype so a mismatched
    seed FAILS FAST instead of compiling into an implicit-cast join
    that silently returns an empty frontier (ADVICE r12 #2). bool is
    rejected explicitly (isinstance(True, int) is True, and a boolean
    seed building a LONG schema is always a caller bug)."""
    from pyspark.sql.types import (
        ByteType,
        IntegerType,
        LongType,
        ShortType,
        StringType,
    )

    if isinstance(source, bool) or not isinstance(source, (int, str)):
        raise TypeError(
            f"seed must be int (long-encoded node) or str, got "
            f"{type(source).__name__}: {source!r}"
        )
    edge_t = edges.schema[src].dataType
    if isinstance(source, int):
        if not isinstance(edge_t, (ByteType, ShortType, IntegerType, LongType)):
            raise TypeError(
                f"int seed {source!r} over non-integral edge column "
                f"{src}: {edge_t.simpleString()} — encode the seed to "
                "match the edge node representation"
            )
        return "LONG"
    if not isinstance(edge_t, StringType):
        raise TypeError(
            f"str seed {source!r} over non-string edge column "
            f"{src}: {edge_t.simpleString()} — encode the seed to "
            "match the edge node representation"
        )
    return "STRING"


def bfs_hops(
    edges: DataFrame,
    source: str | int,
    *,
    max_hops: int,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """(node, hops): minimum hop count from ``source`` to every node
    reachable within ``max_hops`` over the directed edge list —
    single-source unweighted shortest paths by frontier BFS.

    Per round: ONE equi-join frontier x edges + a distinct + an anti
    join against the visited set, each round ``localCheckpoint``-ed
    (module scale notes — lineage stays constant in round count).
    Shuffle volume per round is O(edges incident to the frontier);
    the visited set is the only growing state and is exactly the
    output. A node is labeled with its FIRST discovery round, which is
    the minimum hop count by BFS invariant — equivalently the DuckDB
    recursive-CTE formulation ``MIN(hops) GROUP BY node`` over the
    deduplicated level-expansion (the oracle's form).
    """
    e = edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
    e = e.localCheckpoint(eager=True)
    spark = edges.sparkSession
    # seed type follows the caller's node representation: long-encoded
    # node ids keep every per-round join/agg on 8-byte keys (round-12
    # optimization — string ids paid hash/compare/shuffle-byte costs on
    # every round; results are identical because callers decode at the
    # end of the pipeline)
    node_type = _seed_node_type(edges, src, source)
    visited = spark.createDataFrame(
        [(source, 0)], f"node {node_type}, hops BIGINT"
    ).localCheckpoint(eager=True)
    frontier = visited
    for hop in range(1, max_hops + 1):
        nxt = (
            frontier.join(e, frontier["node"] == e["u"])
            .select(F.col("v").alias("node"))
            .distinct()
            .join(visited.select("node"), "node", "left_anti")
            .select("node", F.lit(hop).cast("bigint").alias("hops"))
            .localCheckpoint(eager=True)
        )
        if nxt.limit(1).count() == 0:
            break
        visited = visited.union(nxt).localCheckpoint(eager=True)
        frontier = nxt
    return visited


def sssp_bounded(
    edges: DataFrame,
    source: str | int,
    *,
    rounds: int,
    src: str = "src",
    dst: str = "dst",
    weight: str = "w",
) -> DataFrame:
    """(node, dist): cheapest path cost from ``source`` using at most
    ``rounds`` edges — Bellman-Ford relaxation with a bounded round
    count (integer weights, so distances are exact BIGINTs and the
    oracle can replay the identical rounds as a CTE chain, the
    pagerank unroll pattern).

    Per round: one equi-join of the current distance frame with the
    static edge list + one node-keyed min aggregation (map-side
    partial), then ``localCheckpoint`` — plan size constant in round
    count. Unlike bfs_hops there is no visited-set anti-join: a node's
    distance can improve in a later round (cheaper long path), so every
    round re-relaxes the full frame; the frame is bounded by the
    reachable node set."""
    e = edges.select(
        F.col(src).alias("u"),
        F.col(dst).alias("v"),
        F.col(weight).cast("bigint").alias("w"),
    ).localCheckpoint(eager=True)
    # long-encoded seed support, same contract (and fail-fast seed
    # validation) as bfs_hops
    node_type = _seed_node_type(edges, src, source)
    dist = edges.sparkSession.createDataFrame(
        [(source, 0)], f"node {node_type}, dist BIGINT"
    ).localCheckpoint(eager=True)
    for _ in range(rounds):
        relaxed = dist.join(e, dist["node"] == e["u"]).select(
            F.col("v").alias("node"),
            (F.col("dist") + F.col("w")).alias("dist"),
        )
        dist = (
            dist.union(relaxed)
            .groupBy("node")
            .agg(F.min("dist").cast("bigint").alias("dist"))
            .localCheckpoint(eager=True)
        )
    return dist


def hierarchy_paths(
    nodes: DataFrame,
    *,
    id_col: str = "id",
    parent_col: str = "parent",
    max_depth: int = 32,
) -> DataFrame:
    """(id, depth, path): flatten a parent-pointer hierarchy into
    root-relative materialized paths ('root/child/...') — the org-chart
    / category-tree / BOM shape. Level-synchronous downward expansion:
    roots (parent NULL) seed depth 0, each round joins the previous
    level's frame to its children and appends one path segment,
    localCheckpoint-ed (constant lineage). Rounds = tree height, work
    per round = one equi-join on the parent pointer — each node is
    visited exactly once across all rounds, so total shuffle volume is
    O(nodes) regardless of depth. Raises if the structure is deeper
    than ``max_depth`` (a cycle in a 'tree' is a data bug — the walk
    would never terminate — not a tuning problem)."""
    n = nodes.select(
        F.col(id_col).cast("long").alias("id"),
        F.col(parent_col).cast("long").alias("parent"),
    ).localCheckpoint(eager=True)
    level = (
        n.filter(F.col("parent").isNull())
        .select(
            "id",
            F.lit(0).cast("bigint").alias("depth"),
            F.col("id").cast("string").alias("path"),
        )
        .localCheckpoint(eager=True)
    )
    out = level
    for _ in range(max_depth):
        # alias both sides: level derives from n, and Spark's ambiguous-
        # self-join check rejects unqualified column refs across them
        nxt = (
            level.alias("lvl")
            .join(n.alias("nd"), F.col("lvl.id") == F.col("nd.parent"))
            .select(
                F.col("nd.id").alias("id"),
                (F.col("lvl.depth") + 1).cast("bigint").alias("depth"),
                F.concat(
                    F.col("lvl.path"),
                    F.lit("/"),
                    F.col("nd.id").cast("string"),
                ).alias("path"),
            )
            .localCheckpoint(eager=True)
        )
        if nxt.limit(1).count() == 0:
            return out
        out = out.union(nxt).localCheckpoint(eager=True)
        level = nxt
    raise RuntimeError(
        f"hierarchy deeper than max_depth={max_depth} (cycle?)"
    )


def dedup_assignment(
    nodes: DataFrame,
    edges: DataFrame,
    *,
    node_col: str,
    src: str = "id_a",
    dst: str = "id_b",
    max_iter: int = 25,
) -> DataFrame:
    """Every node of ``nodes`` mapped to its dedup cluster: component
    min for nodes in the pair graph, itself for singletons, plus an
    ``is_representative`` keep flag. Left join against the (small)
    component table — at corpus scale the pair graph is a tiny fraction
    of the corpus, so this broadcasts."""
    comp = connected_components(edges, src=src, dst=dst, max_iter=max_iter)
    n = nodes.select(F.col(node_col).cast("long").alias("node"))
    return (
        n.join(comp, "node", "left")
        .select(
            F.col("node").alias(node_col),
            F.coalesce(F.col("component"), F.col("node")).alias("component"),
        )
        .withColumn("is_representative", F.col(node_col) == F.col("component"))
    )


def pagerank(
    edges: DataFrame,
    n_nodes: int,
    *,
    src: str = "src",
    dst: str = "dst",
    damping_pct: int = 85,
    iterations: int = 3,
    checkpoint_every: int = 4,
    eager_final: bool = False,
) -> DataFrame:
    """Distributed PageRank by power iteration over an edge list
    (Page et al. 1999; the Pregel formulation without a vertex
    program): each round every node divides its rank across its
    out-edges, contributions hash-aggregate on the destination, and
    ``rank' = (1-d)/N + d * sum(contribs)``.

    Ranks are FIXED-POINT integers (picounits: 1.0 == 10^12), and every
    per-round operation is integer arithmetic — floor division for the
    per-edge split, exact BIGINT sums for the mass, integer
    percent-scaling for the damping. There is no floating point
    anywhere in the iteration, so results are bit-identical on any
    engine and any partitioning: iterative FP rounding (which compounds
    round-over-round and breaks cross-engine replay) is designed out
    rather than papered over. The sub-picounit mass lost to floors is
    at most out_deg ulps per node per round — irrelevant to ranking.

    Scale design:
    - Per round: ONE exchange keyed on dst for the contribution
      aggregate (map-side partial sums) plus the edges-ranks equi-join;
      nothing materializes beyond (node, rank) and the edge list. No
      per-round collect — ``n_nodes`` is the only scalar, supplied by
      the caller from a bounded 1-row count.
    - Out-degrees are computed once and joined into a static
      (src, dst, out_deg) frame; a cluster co-partitions it by src once
      and every iteration reuses that layout.
    - Dangling nodes (no out-edges) contribute nothing but still
      receive the teleport mass; for an undirected graph (edges
      pre-mirrored by the caller) there are none.

    Returns (node, rank_x1e12): picounit ranks summing to ~10^12.
    """
    from c3dc_etl_spark.pinning import pin

    one = 10**12
    teleport = ((100 - damping_pct) * one) // (100 * n_nodes)
    # pin the static frames: every iteration consumes them, and without
    # the pin the lazy lineage recomputes the edge derivation (often a
    # join + distinct over fact tables) once per iteration
    nodes = pin(
        edges.select(F.col(src).alias("node"))
        .unionByName(edges.select(F.col(dst).alias("node")))
        .distinct()
    )
    outdeg = edges.groupBy(F.col(src).alias("node")).agg(
        F.count(F.lit(1)).alias("out_deg")
    )
    e = pin(
        edges.select(F.col(src).alias("e_src"), F.col(dst).alias("e_dst")).join(
            outdeg.select(F.col("node").alias("e_src"), "out_deg"), "e_src"
        )
    )
    ranks = nodes.withColumn("rank_x1e12", F.lit(one // n_nodes).cast("bigint"))
    for it in range(iterations):
        # lineage hygiene (same cadence discipline as
        # connected_components): each round otherwise appends a
        # join+agg layer to `ranks`, and deep iteration counts balloon
        # plan compile time. Truncate every ``checkpoint_every`` rounds;
        # materialized state is just (node, rank) — O(nodes) longs.
        if it and checkpoint_every and it % checkpoint_every == 0:
            ranks = ranks.localCheckpoint(eager=True)
        contribs = (
            e.join(
                ranks.select(F.col("node").alias("e_src"), "rank_x1e12"),
                "e_src",
            )
            .select(
                F.col("e_dst").alias("node"),
                # integer division (`div`), NEVER `/`: bigint `/` goes
                # through DOUBLE, whose rounding can flip the floor when
                # the exact quotient sits within an ulp of an integer
                F.expr("rank_x1e12 div out_deg").alias("contrib"),
            )
            .groupBy("node")
            .agg(F.sum("contrib").alias("mass"))
        )
        ranks = nodes.join(contribs, "node", "left").select(
            "node",
            (
                F.lit(teleport)
                + F.expr(f"(coalesce(mass, 0L) * {damping_pct}) div 100")
            )
            .cast("bigint")
            .alias("rank_x1e12"),
        )
    if eager_final:
        # materialize INSIDE the caller's reducer scope (see
        # operators/iterscope.py): with few iterations and a long
        # checkpoint cadence the whole power iteration is otherwise
        # lazy, and a scoped spark.sql.shuffle.partitions override
        # would silently never govern it. State is O(nodes) longs.
        ranks = ranks.localCheckpoint(eager=True)
    return ranks


def triangle_count(
    edges: DataFrame,
    *,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """Exact global triangle count + clustering coefficient by DEGREE
    ORIENTATION (Chiba–Nishizeki / the standard distributed formulation):
    orient every undirected edge from its lower-(degree, id) endpoint to
    the higher, enumerate wedges only FROM each node's oriented
    out-edges, and close them against the oriented edge set. Each
    triangle is counted exactly once, and the wedge work is
    sum(out_deg^2) with out_deg <= O(sqrt(m)) on any graph — the
    orientation is what keeps a high-degree hub from generating
    C(hub_deg, 2) wedge candidates, the quadratic blow-up a naive
    neighbor self-join hits at scale.

    Plan: degree aggregation (one exchange), two rank-annotation joins,
    the wedge self-join on the oriented source (one exchange on src),
    and the closing semi-equi-join on (v, w). All rows are (long, long)
    pairs; counts partial-aggregate map-side. Output is ONE row:
    (n_nodes, n_edges, n_wedges, n_triangles, clustering_x1e6) — all
    orientation-invariant quantities, so any engine's formulation
    (id-ordered, degree-ordered) must agree bit-for-bit;
    clustering = 3*T / open-wedge-count in integer fixed point."""
    e = edges.select(
        F.least(F.col(src).cast("long"), F.col(dst).cast("long")).alias("u"),
        F.greatest(F.col(src).cast("long"), F.col(dst).cast("long")).alias("v"),
    ).filter(F.col("u") != F.col("v")).distinct()
    deg = (
        e.select(F.col("u").alias("node"))
        .unionAll(e.select(F.col("v").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("d"))
    )
    # total order consistent with (degree, id), compared as a STRUCT:
    # Spark orders structs lexicographically by field, so (d, node)
    # pairs compare exactly — packing d*2^32+node into one bigint would
    # collide or misorder for ids >= 2^32 or negative ids (e.g.
    # (d=1, id=2^32) == (d=2, id=0)), silently mis-counting triangles
    rank = deg.select(
        "node",
        "d",
        F.struct(F.col("d"), F.col("node")).alias("rk"),
    )
    annotated = (
        e.join(rank.select(F.col("node").alias("u"), F.col("rk").alias("rku")), "u")
        .join(rank.select(F.col("node").alias("v"), F.col("rk").alias("rkv")), "v")
    )
    oriented = annotated.select(
        F.when(F.col("rku") < F.col("rkv"), F.col("u")).otherwise(F.col("v")).alias("s"),
        F.when(F.col("rku") < F.col("rkv"), F.col("v")).otherwise(F.col("u")).alias("t"),
        F.when(F.col("rku") < F.col("rkv"), F.col("rkv")).otherwise(F.col("rku")).alias("rkt"),
    )
    w1 = oriented.select("s", F.col("t").alias("a"), F.col("rkt").alias("rka"))
    w2 = oriented.select("s", F.col("t").alias("b"), F.col("rkt").alias("rkb"))
    wedges = w1.join(w2, "s").filter(F.col("rka") < F.col("rkb"))
    closing = oriented.select(F.col("s").alias("a"), F.col("t").alias("b"))
    tri = wedges.join(closing, ["a", "b"]).agg(
        F.count(F.lit(1)).alias("n_triangles")
    )
    stats = deg.agg(
        F.count(F.lit(1)).alias("n_nodes"),
        # integer div, not /: bigint / routes through DOUBLE whose 2^53
        # mantissa silently rounds huge edge counts
        F.expr("sum(d) div 2").cast("bigint").alias("n_edges"),
        F.sum(F.expr("d * (d - 1) div 2")).alias("n_wedges"),
    )
    # two 1-row aggregates: the literal-free cross combine is bounded
    return stats.crossJoin(tri).select(
        "n_nodes",
        "n_edges",
        "n_wedges",
        "n_triangles",
        F.expr("(3 * n_triangles * 1000000) div n_wedges")
        .cast("bigint")
        .alias("clustering_x1e6"),
    )


def kcore_bounded(
    edges: DataFrame,
    k: int,
    *,
    rounds: int,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """Bounded k-core peeling: ``rounds`` synchronous rounds of removing
    every node with degree < k (and all its edges), over a SYMMETRIC
    edge list — returns (node, degree) for the survivors. With enough
    rounds this is the exact k-core; bounding the round count is the
    same determinism contract as sssp_bounded (the oracle replays the
    identical rounds, and production callers iterate to fixpoint with a
    per-round count check).

    Per round: one src-keyed partial-agg degree count and two
    semi-joins re-filtering the edge list — O(edges) shuffle rows,
    map-side-combined counts, and a ``localCheckpoint`` so lineage (and
    plan size) stays constant in the round number. Peeling is
    monotone — nodes only ever leave — so a round that removes nothing
    has converged (callers can stop early; the bounded form runs all
    rounds for cross-engine parity)."""
    e = edges.select(
        F.col(src).alias("src"), F.col(dst).alias("dst")
    ).localCheckpoint(eager=True)
    for _ in range(rounds):
        alive = (
            e.groupBy("src")
            .agg(F.count(F.lit(1)).alias("deg"))
            .filter(F.col("deg") >= k)
            .select(F.col("src").alias("node"))
        )
        # two distinct frames for the two semi-joins: reusing one
        # DataFrame in both would alias its attribute ids (the
        # trivially-true self-compare trap from PLANS.md)
        alive2 = alive.select(F.col("node").alias("node2"))
        e = (
            e.join(alive, F.col("src") == F.col("node"), "left_semi")
            .join(alive2, F.col("dst") == F.col("node2"), "left_semi")
            .localCheckpoint(eager=True)
        )
    return e.groupBy(F.col("src").alias("node")).agg(
        F.count(F.lit(1)).alias("degree")
    )

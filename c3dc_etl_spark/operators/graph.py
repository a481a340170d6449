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

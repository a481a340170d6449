#!/usr/bin/env python3
"""x-factor VOLUME probes for the two heaviest iterative graph queries
(VERDICT r11 ask #7): measure the WORK — oriented wedge candidates for
the triangle census, per-round relax-edge rows for bounded
Bellman-Ford — at base sf and at the scaled corpus, and adjudicate
scale walls from volumes, per the ceiling-side reading rule PLANS.md
committed in round 11: when a wall's linearity looks scary, re-measure
the intermediate volumes; if those are linear, the wall residual is
machine state (memory hierarchy on a fixed box), not the plan.

Usage (repo root):
  python3 scripts/graph_volume_probe.py [factor]   # default 25

Prints one JSON object with base/scaled volumes and their ratios.
The edge constructions replicate the registry queries exactly
(suite/graph_ops.py triangle_count_coorder / graph_sssp_bounded); the
volumes measured are the ones the operators' docstrings name as their
work bound (sum C(out_deg,2) under degree orientation; frontier ×
out-degree rows per relaxation round).
"""

from __future__ import annotations

import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def _edges_coorder(spark, d):
    from pyspark.sql import functions as F

    from c3dc_etl_spark.suite.registry import load

    li = load(spark, d, "lineitem").select("l_orderkey", "l_partkey")
    a = li.select(F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("pa"))
    b = li.select(F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("pb"))
    return (
        a.join(b, "ok")
        .filter(F.col("pa") < F.col("pb"))
        .select(F.col("pa").alias("src"), F.col("pb").alias("dst"))
        .distinct()
    )


def triangle_volumes(spark, d) -> dict:
    """(n_edges, oriented_wedges): the census work is enumerating
    C(out_deg, 2) wedge candidates per node under the (degree, id)
    orientation — the exact quantity the operator's docstring bounds
    by sum(out_deg^2)."""
    from pyspark.sql import functions as F

    e = _edges_coorder(spark, d).select(
        F.least("src", "dst").alias("u"), F.greatest("src", "dst").alias("v")
    ).distinct()
    deg = (
        e.select(F.col("u").alias("node"))
        .unionAll(e.select(F.col("v").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("d"))
    )
    rk = deg.select("node", F.struct("d", "node").alias("rk"))
    ann = (
        e.join(rk.withColumnRenamed("node", "u"), "u")
        .withColumnRenamed("rk", "rku")
        .join(rk.withColumnRenamed("node", "v"), "v")
        .withColumnRenamed("rk", "rkv")
    )
    out_deg = ann.select(
        F.when(F.col("rku") < F.col("rkv"), F.col("u"))
        .otherwise(F.col("v"))
        .alias("o")
    ).groupBy("o").agg(F.count(F.lit(1)).alias("od"))
    row = out_deg.agg(
        F.sum(F.expr("od * (od - 1) DIV 2")).alias("wedges"),
        F.sum("od").alias("edges"),
    ).first()
    return {"n_edges": int(row["edges"]), "oriented_wedges": int(row["wedges"])}


def sssp_volumes(spark, d) -> dict:
    """Total relax-edge rows generated across the SSSP_ROUNDS bounded
    Bellman-Ford rounds (each round joins the FULL current distance
    frame against the edge list — the re-relax semantics the oracle
    pins), plus the edge count."""
    from pyspark.sql import functions as F

    from c3dc_etl_spark.suite.graph_ops import BFS_SOURCE, SSSP_ROUNDS
    from c3dc_etl_spark.suite.registry import load

    orders = load(spark, d, "orders").select("o_orderkey", "o_custkey")
    li = load(spark, d, "lineitem").select("l_orderkey", "l_suppkey")
    pairs = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy("o_custkey", "l_suppkey")
        .agg(F.countDistinct("o_orderkey").cast("bigint").alias("cnt"))
        .select(
            F.concat(F.lit("c:"), F.col("o_custkey").cast("string")).alias("c"),
            F.concat(F.lit("s:"), F.col("l_suppkey").cast("string")).alias("s"),
            (F.lit(1) + (F.col("cnt") % 5)).cast("bigint").alias("w"),
        )
    )
    edges = pairs.select(
        F.col("c").alias("src"), F.col("s").alias("dst"), "w"
    ).unionByName(
        pairs.select(F.col("s").alias("src"), F.col("c").alias("dst"), "w")
    )
    edges = edges.localCheckpoint(eager=True)
    n_edges = edges.count()
    dist = spark.createDataFrame(
        [(BFS_SOURCE, 0)], "node string, dist bigint"
    )
    relax_rows = 0
    per_round = []
    for _ in range(SSSP_ROUNDS):
        joined = dist.join(edges, dist.node == edges.src)
        r = joined.count()
        per_round.append(r)
        relax_rows += r
        dist = (
            dist.select("node", "dist")
            .unionByName(
                joined.select(
                    F.col("dst").alias("node"),
                    (F.col("dist") + F.col("w")).alias("dist"),
                )
            )
            .groupBy("node")
            .agg(F.min("dist").alias("dist"))
            .localCheckpoint(eager=True)
        )
    return {
        "n_edges": n_edges,
        "relax_rows_total": relax_rows,
        "relax_rows_per_round": per_round,
    }


def main() -> int:
    factor = int(sys.argv[1]) if len(sys.argv) > 1 else 25
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    scale_dir = os.path.join(REPO, ".scale_bench", f"x{factor}")

    import bench

    from c3dc_etl_spark.session import get_spark

    spark = get_spark("volume_probe")
    bench._ensure_scaled(spark, sf_dir, scale_dir, factor)
    out = {"factor": factor, "base_sf_dir": sf_dir}
    for name, fn in (
        ("triangle_count_coorder", triangle_volumes),
        ("graph_sssp_bounded", sssp_volumes),
    ):
        base = fn(spark, sf_dir)
        scaled = fn(spark, scale_dir)
        ratios = {
            k: round(scaled[k] / base[k], 3)
            for k in base
            if isinstance(base[k], int) and base[k]
        }
        out[name] = {"base": base, "scaled": scaled, "volume_ratios": ratios}
        print(f"# {name}: {json.dumps(out[name])}", file=sys.stderr)
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

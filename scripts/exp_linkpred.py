#!/usr/bin/env python3
"""Quiet-box A/B harness for link_prediction_common_neighbors variants.

Each variant must produce IDENTICAL results (verified by comparing
collected rows against the registry implementation). Times the noop-sink
compute per the guide §1.4.

Usage: python scripts/exp_linkpred.py [--sf /root/testdata/sf0.1] [--runs 2]
       [--variants base,pin_mid,no_partial,array_pairs ...]
"""
from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, SparkSession  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402


def _edges_mid(spark: SparkSession, sf_dir: str):
    from c3dc_etl_spark.operators.dedup import drop_oversized_groups
    from c3dc_etl_spark.pinning import pin
    from c3dc_etl_spark.suite.graph_ops import LP_HUB_CAP
    from c3dc_etl_spark.suite.registry import load

    li = (
        load(spark, sf_dir, "lineitem")
        .select(F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("pk"))
        .distinct()
    )
    a = li.select("ok", F.col("pk").alias("u"))
    b = li.select("ok", F.col("pk").alias("v"))
    edges = (
        a.join(b, "ok")
        .filter(F.col("u") < F.col("v"))
        .select("u", "v")
        .distinct()
    )
    edges = pin(edges)
    adj = edges.select(F.col("u").alias("m"), F.col("v").alias("n")).unionAll(
        edges.select(F.col("v").alias("m"), F.col("u").alias("n"))
    )
    mid = drop_oversized_groups(adj, ["m"], LP_HUB_CAP)
    return edges, mid


def _finish(wedges: DataFrame, edges: DataFrame) -> DataFrame:
    from c3dc_etl_spark.suite.graph_ops import LP_TOP_K

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


def v_base(spark, sf_dir):
    from c3dc_etl_spark.suite import REGISTRY

    return REGISTRY["link_prediction_common_neighbors"].fn(spark, sf_dir)


def v_pin_mid(spark, sf_dir):
    """pin(mid) so the adj/cap chain is computed once, not twice."""
    from c3dc_etl_spark.pinning import pin

    edges, mid = _edges_mid(spark, sf_dir)
    mid = pin(mid)
    wa = mid.select("m", F.col("n").alias("x"))
    wb = mid.select("m", F.col("n").alias("y"))
    wedges = (
        wa.join(wb, "m")
        .filter(F.col("x") < F.col("y"))
        .groupBy("x", "y")
        .agg(F.count(F.lit(1)).alias("cn"))
    )
    return _finish(wedges, edges)


def v_no_partial(spark, sf_dir):
    """repartition(x, y) before groupBy: one complete HashAggregate,
    no giant low-ratio map-side hash tables (exchange carries the raw
    wedge rows instead)."""
    from c3dc_etl_spark.pinning import pin

    edges, mid = _edges_mid(spark, sf_dir)
    mid = pin(mid)
    wa = mid.select("m", F.col("n").alias("x"))
    wb = mid.select("m", F.col("n").alias("y"))
    n = spark.sparkContext.defaultParallelism
    wedges = (
        wa.join(wb, "m")
        .filter(F.col("x") < F.col("y"))
        .repartition(n, "x", "y")
        .groupBy("x", "y")
        .agg(F.count(F.lit(1)).alias("cn"))
    )
    return _finish(wedges, edges)


def v_array_pairs(spark, sf_dir):
    """Neighbor arrays per middle + nested-transform pair generation —
    no self-join, pairs generated after one groupBy(m) shuffle."""
    edges, mid = _edges_mid(spark, sf_dir)
    nbrs = mid.groupBy("m").agg(F.array_sort(F.collect_list("n")).alias("ns"))
    pair_structs = F.flatten(
        F.transform(
            F.col("ns"),
            lambda x, i: F.transform(
                F.slice(F.col("ns"), i + 2, F.size(F.col("ns"))),
                lambda y: F.struct(x.alias("x"), y.alias("y")),
            ),
        )
    )
    wedges = (
        nbrs.select(F.explode(pair_structs).alias("p"))
        .select(F.col("p.x").alias("x"), F.col("p.y").alias("y"))
        .groupBy("x", "y")
        .agg(F.count(F.lit(1)).alias("cn"))
    )
    return _finish(wedges, edges)


def v_array_pairs_nopartial(spark, sf_dir):
    edges, mid = _edges_mid(spark, sf_dir)
    nbrs = mid.groupBy("m").agg(F.array_sort(F.collect_list("n")).alias("ns"))
    pair_structs = F.flatten(
        F.transform(
            F.col("ns"),
            lambda x, i: F.transform(
                F.slice(F.col("ns"), i + 2, F.size(F.col("ns"))),
                lambda y: F.struct(x.alias("x"), y.alias("y")),
            ),
        )
    )
    n = spark.sparkContext.defaultParallelism
    wedges = (
        nbrs.select(F.explode(pair_structs).alias("p"))
        .select(F.col("p.x").alias("x"), F.col("p.y").alias("y"))
        .repartition(n, "x", "y")
        .groupBy("x", "y")
        .agg(F.count(F.lit(1)).alias("cn"))
    )
    return _finish(wedges, edges)


def _packed_edges_mid(spark, sf_dir):
    """edges packed into one bigint key (x*2^32 + y; partkeys are
    32-bit at every tested sf), mid pinned."""
    from c3dc_etl_spark.pinning import pin

    edges, mid = _edges_mid(spark, sf_dir)
    mid = pin(mid)
    epk = edges.select(
        (F.shiftleft(F.col("u").cast("long"), 32) + F.col("v")).alias("k")
    )
    return epk, mid


def _finish_packed(wedges_k, spark):
    from c3dc_etl_spark.suite.graph_ops import LP_TOP_K

    return (
        wedges_k.orderBy(F.col("cn").desc(), F.col("k").asc())
        .limit(LP_TOP_K)
        .select(
            F.shiftright(F.col("k"), 32).cast("bigint").alias("part_a"),
            (F.col("k") % F.lit(1 << 32)).cast("bigint").alias("part_b"),
            F.col("cn").cast("bigint").alias("common_neighbors"),
        )
    )


def v_packed(spark, sf_dir):
    """Single-bigint wedge key: half the shuffle bytes per wedge row,
    single-long group key (vectorized fast hash map), anti after agg."""
    epk, mid = _packed_edges_mid(spark, sf_dir)
    wa = mid.select("m", F.col("n").alias("x"))
    wb = mid.select("m", F.col("n").alias("y"))
    wedges = (
        wa.join(wb, "m")
        .filter(F.col("x") < F.col("y"))
        .select((F.shiftleft(F.col("x").cast("long"), 32) + F.col("y")).alias("k"))
        .groupBy("k")
        .agg(F.count(F.lit(1)).alias("cn"))
        .join(F.broadcast(epk), "k", "left_anti")
    )
    return _finish_packed(wedges, spark)


def v_packed_preanti(spark, sf_dir):
    """Packed key + broadcast anti-join BEFORE the aggregate: triangle
    wedges (pairs that are already edges) never enter the hash agg, and
    the anti probe pipelines inside the wedge-join stage."""
    epk, mid = _packed_edges_mid(spark, sf_dir)
    wa = mid.select("m", F.col("n").alias("x"))
    wb = mid.select("m", F.col("n").alias("y"))
    wedges = (
        wa.join(wb, "m")
        .filter(F.col("x") < F.col("y"))
        .select((F.shiftleft(F.col("x").cast("long"), 32) + F.col("y")).alias("k"))
        .join(F.broadcast(epk), "k", "left_anti")
        .groupBy("k")
        .agg(F.count(F.lit(1)).alias("cn"))
    )
    return _finish_packed(wedges, spark)


def v_packed_preanti_nopartial(spark, sf_dir):
    """v_packed_preanti + repartition(k) before groupBy: skip the giant
    low-reduction map-side hash maps; exchange carries raw 8-byte keys."""
    epk, mid = _packed_edges_mid(spark, sf_dir)
    wa = mid.select("m", F.col("n").alias("x"))
    wb = mid.select("m", F.col("n").alias("y"))
    n = spark.sparkContext.defaultParallelism
    wedges = (
        wa.join(wb, "m")
        .filter(F.col("x") < F.col("y"))
        .select((F.shiftleft(F.col("x").cast("long"), 32) + F.col("y")).alias("k"))
        .join(F.broadcast(epk), "k", "left_anti")
        .repartition(n, "k")
        .groupBy("k")
        .agg(F.count(F.lit(1)).alias("cn"))
    )
    return _finish_packed(wedges, spark)


def v_packed_preanti_shj(spark, sf_dir):
    """packed_preanti with a SHUFFLE_HASH hint on the wedge self-join
    (build the per-partition hash table on one mid copy instead of
    sorting both sides; guide §3.1)."""
    epk, mid = _packed_edges_mid(spark, sf_dir)
    wa = mid.select("m", F.col("n").alias("x"))
    wb = mid.select("m", F.col("n").alias("y"))
    wedges = (
        wa.join(wb.hint("SHUFFLE_HASH"), "m")
        .filter(F.col("x") < F.col("y"))
        .select((F.shiftleft(F.col("x").cast("long"), 32) + F.col("y")).alias("k"))
        .join(F.broadcast(epk), "k", "left_anti")
        .groupBy("k")
        .agg(F.count(F.lit(1)).alias("cn"))
    )
    return _finish_packed(wedges, spark)


def _edges_adj(spark, sf_dir):
    """edges (pinned) + the mirrored adjacency, WITHOUT the
    drop_oversized_groups cap join — callers cap via array size."""
    from c3dc_etl_spark.pinning import pin
    from c3dc_etl_spark.suite.registry import load

    li = (
        load(spark, sf_dir, "lineitem")
        .select(F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("pk"))
        .distinct()
    )
    a = li.select("ok", F.col("pk").alias("u"))
    b = li.select("ok", F.col("pk").alias("v"))
    edges = pin(
        a.join(b, "ok")
        .filter(F.col("u") < F.col("v"))
        .select("u", "v")
        .distinct()
    )
    adj = edges.select(F.col("u").alias("m"), F.col("v").alias("n")).unionAll(
        edges.select(F.col("v").alias("m"), F.col("u").alias("n"))
    )
    return edges, adj


def _v_xpart_local(spark, sf_dir, n_parts: int):
    """r13 candidate: co-locate every pair's wedge contributions by the
    SMALLER endpoint x. Capped sorted neighbor-arrays per middle
    (groupBy m + size filter replaces the cap-count anti-join), then
    the (m, x) generation rows are hash-repartitioned by x and joined
    with the BROADCAST arrays; pairs (x, y>x) are exploded from the
    array in codegen. Every contribution to (x, y) carries the same x,
    so HashPartitioning(x) satisfies the groupBy(x, y) distribution —
    the 147M wedge rows and ~100M groups NEVER cross an exchange, the
    per-partition aggregate is globally exact, and the top-k is
    per-partition TakeOrdered. Edges anti-join rides broadcast before
    the aggregate (triangle wedges never enter the hash map)."""
    from c3dc_etl_spark.pinning import pin
    from c3dc_etl_spark.suite.graph_ops import LP_HUB_CAP, LP_TOP_K

    edges, adj = _edges_adj(spark, sf_dir)
    nbrs = pin(
        adj.groupBy("m")
        .agg(F.array_sort(F.collect_list("n")).alias("ns"))
        .filter(F.size("ns") <= LP_HUB_CAP)
    )
    side = nbrs.select("m", F.explode("ns").alias("x")).repartition(
        n_parts, "x"
    )
    # generation: full explode + post-filter (codegen'd Generate+Filter;
    # the higher-order filter(ns, t -> t > x) lambda runs interpreted
    # per ELEMENT and measured 3x slower). Anti-join on the PACKED long
    # key: a single-long broadcast key builds a LongHashedRelation —
    # measured 10x faster probes than the two-column UnsafeHashedRelation
    # (2.2s vs 20s over the 147M wedge rows).
    epk = F.broadcast(
        edges.select(
            (F.shiftleft(F.col("u").cast("long"), 32) + F.col("v")).alias("k")
        )
    )
    pairs = (
        side.join(F.broadcast(nbrs), "m")
        .select("x", F.explode("ns").alias("y"))
        .filter(F.col("y") > F.col("x"))
        .join(
            epk,
            F.expr("shiftleft(cast(x as bigint), 32) + y") == F.col("k"),
            "left_anti",
        )
    )
    return (
        pairs.groupBy("x", "y")
        .agg(F.count(F.lit(1)).alias("cn"))
        .select(
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


def v_xpart32(spark, sf_dir):
    return _v_xpart_local(spark, sf_dir, 32)


def v_xpart64(spark, sf_dir):
    return _v_xpart_local(spark, sf_dir, 64)


def v_xpart128(spark, sf_dir):
    return _v_xpart_local(spark, sf_dir, 128)


def v_xpart256(spark, sf_dir):
    return _v_xpart_local(spark, sf_dir, 256)


def v_array_packed(spark, sf_dir):
    """Large-L candidate (no broadcast of arrays): pair generation from
    the capped sorted arrays via nested transform (kills the wedge
    SortMergeJoin), packed single-long agg key, post-agg anti — the
    shape for when the arrays are too big to broadcast."""
    from c3dc_etl_spark.pinning import pin
    from c3dc_etl_spark.suite.graph_ops import LP_HUB_CAP

    edges, adj = _edges_adj(spark, sf_dir)
    epk = edges.select(
        (F.shiftleft(F.col("u").cast("long"), 32) + F.col("v")).alias("k")
    )
    nbrs = adj.groupBy("m").agg(
        F.array_sort(F.collect_list("n")).alias("ns")
    ).filter(F.size("ns") <= LP_HUB_CAP)
    pair_keys = F.flatten(
        F.transform(
            F.col("ns"),
            lambda x, i: F.transform(
                F.slice(F.col("ns"), i + 2, F.size(F.col("ns"))),
                lambda y: F.shiftleft(x.cast("long"), 32) + y,
            ),
        )
    )
    wedges = (
        nbrs.select(F.explode(pair_keys).alias("k"))
        .groupBy("k")
        .agg(F.count(F.lit(1)).alias("cn"))
        .join(epk, "k", "left_anti")
    )
    return _finish_packed(wedges, spark)


VARIANTS = {
    "base": v_base,
    "pin_mid": v_pin_mid,
    "no_partial": v_no_partial,
    "array_pairs": v_array_pairs,
    "array_pairs_nopartial": v_array_pairs_nopartial,
    "packed": v_packed,
    "packed_preanti": v_packed_preanti,
    "packed_preanti_nopartial": v_packed_preanti_nopartial,
    "packed_preanti_shj": v_packed_preanti_shj,
    "xpart32": v_xpart32,
    "xpart64": v_xpart64,
    "xpart128": v_xpart128,
    "xpart256": v_xpart256,
    "array_packed": v_array_packed,
}


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--runs", type=int, default=2)
    ap.add_argument("--variants", default=",".join(VARIANTS))
    ap.add_argument(
        "--interleave",
        action="store_true",
        help="alternate variants within one session round-robin (the "
        "r12 SHUFFLE_HASH A/B was voided by the C2-ramp order effect: "
        "whichever variant ran later won by 3x; interleaving defeats "
        "run-order as a confound)",
    )
    args = ap.parse_args()

    from c3dc_etl_spark.pinning import release_pinned
    from c3dc_etl_spark.session import get_spark

    spark = get_spark("exp-linkpred")
    names = args.variants.split(",")
    expected = None
    # warm-up + row-identity check for every variant first
    for name in names:
        fn = VARIANTS[name]
        spark.sparkContext.setJobDescription(f"lp:{name}:warm")
        rows = [tuple(r) for r in fn(spark, args.sf).collect()]
        release_pinned()
        if expected is None:
            expected = rows
        else:
            assert rows == expected, f"{name} DIVERGES from base!"
    ts: dict[str, list[float]] = {n: [] for n in names}
    if args.interleave:
        for i in range(args.runs):
            for name in names:
                spark.sparkContext.setJobDescription(f"lp:{name}:{i}")
                t0 = time.perf_counter()
                VARIANTS[name](spark, args.sf).write.format("noop").mode(
                    "overwrite"
                ).save()
                release_pinned()
                ts[name].append(round(time.perf_counter() - t0, 2))
            print(
                f"round {i}: "
                + "  ".join(f"{n}={ts[n][-1]}" for n in names),
                flush=True,
            )
    else:
        for name in names:
            for i in range(args.runs):
                spark.sparkContext.setJobDescription(f"lp:{name}:{i}")
                t0 = time.perf_counter()
                VARIANTS[name](spark, args.sf).write.format("noop").mode(
                    "overwrite"
                ).save()
                release_pinned()
                ts[name].append(round(time.perf_counter() - t0, 2))
    for name in names:
        print(f"{name}: {ts[name]}", flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

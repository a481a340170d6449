#!/usr/bin/env python3
"""Quiet-box A/B harness for round-12 optimization hypotheses beyond
link prediction (scripts/exp_linkpred.py). Every variant must produce
IDENTICAL rows to its base (asserted on sorted collected rows); timing
is the noop-sink compute pass (guide §1.4).

Usage: python scripts/exp_misc.py [--sf DIR] [--runs N] [--pairs a,b ...]
Pairs are named base/variant groups; default runs all.
"""
from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402


# ---- covariance: spread the single-file embeddings scan -----------------

def cov_base(spark, sf):
    from c3dc_etl_spark.suite import REGISTRY

    return REGISTRY["embedding_pca_covariance"].fn(spark, sf)


def cov_spread(spark, sf):
    from c3dc_etl_spark.operators import similarity as S
    from c3dc_etl_spark.operators.dedup import spread
    from c3dc_etl_spark.suite.registry import load
    from c3dc_etl_spark.suite.similarity_ops import COV_SCALE, EMB_DIM

    emb = spread(load(spark, sf, "embeddings"))
    return S.covariance_pairs(emb, dim=EMB_DIM, scale=COV_SCALE)


# ---- tfidf pairs: spread the documents scan ------------------------------

def tfidf_base(spark, sf):
    from c3dc_etl_spark.suite import REGISTRY

    return REGISTRY["similarity_tfidf_pairs"].fn(spark, sf)


def tfidf_spread(spark, sf):
    from c3dc_etl_spark.operators import search as S
    from c3dc_etl_spark.operators.dedup import spread
    from c3dc_etl_spark.pinning import pin
    from c3dc_etl_spark.suite.registry import load
    from c3dc_etl_spark.suite.search_ops import TFIDF_DF_CAP_PCT

    docs = spread(load(spark, sf, "documents"))
    tf = pin(S.doc_term_freq(docs, "text", "doc_id"))
    n_docs = tf.select("doc_id").distinct().count()
    return S.tfidf_cosine_pairs(tf, n_docs, df_cap_pct=TFIDF_DF_CAP_PCT)


# ---- simhash pairs: spread the documents scan ----------------------------

def simpairs_base(spark, sf):
    from c3dc_etl_spark.suite import REGISTRY

    return REGISTRY["dedup_simhash_pairs"].fn(spark, sf)


def simpairs_spread(spark, sf):
    from c3dc_etl_spark.operators import dedup as D
    from c3dc_etl_spark.suite.dedup_ops import SIMHASH_MAX_BUCKET
    from c3dc_etl_spark.suite.registry import load

    docs = D.spread(load(spark, sf, "documents"))
    return D.simhash_hamming_pairs(
        docs, "text", "doc_id", bits=32, band_bits=8, max_hamming=3,
        max_bucket_size=SIMHASH_MAX_BUCKET,
    )


# ---- bm25: spread the documents scan --------------------------------------

def bm25_base(spark, sf):
    from c3dc_etl_spark.suite import REGISTRY

    return REGISTRY["search_bm25_topk"].fn(spark, sf)


def bm25_spread(spark, sf):
    from c3dc_etl_spark.operators import search as S
    from c3dc_etl_spark.operators.dedup import spread
    from c3dc_etl_spark.pinning import pin
    from c3dc_etl_spark.suite.registry import load
    from c3dc_etl_spark.suite.search_ops import BM25_K, BM25_TERMS

    docs = spread(load(spark, sf, "documents"))
    tf = pin(S.doc_term_freq(docs, "text", "doc_id"))
    row = tf.agg(
        F.countDistinct("doc_id").alias("n"), F.sum("tf").alias("t")
    ).collect()[0]
    n_docs, total = int(row["n"]), int(row["t"])
    return S.bm25_topk(tf, list(BM25_TERMS), n_docs, total / n_docs, k=BM25_K)


# ---- minhash estimation error: semi-join prune before the self-join ------

def mh_err_base(spark, sf):
    from c3dc_etl_spark.suite import REGISTRY

    return REGISTRY["minhash_estimation_error"].fn(spark, sf)


def mh_err_semijoin(spark, sf):
    from c3dc_etl_spark.operators import dedup as D
    from c3dc_etl_spark.pinning import pin
    from c3dc_etl_spark.suite.dedup_ops import (
        BANDS,
        MAX_BUCKET,
        NUM_HASHES,
        SHINGLE_K,
    )
    from c3dc_etl_spark.suite.registry import load

    docs = load(spark, sf, "documents")
    pairs = pin(
        D.minhash_lsh_candidates(
            docs,
            "text",
            "doc_id",
            shingle_k=SHINGLE_K,
            num_hashes=NUM_HASHES,
            bands=BANDS,
            max_bucket_size=MAX_BUCKET,
        ).select("id_a", "id_b", "est_jaccard")
    )
    hashed = pin(
        D.spread(docs).select(
            F.col("doc_id").alias("doc"),
            F.array_distinct(
                F.transform(
                    D.shingles_of_norm(D.normalize_text("text"), SHINGLE_K),
                    D.hash32,
                )
            ).alias("dv"),
        )
    )
    cand_docs = (
        pairs.select(F.col("id_a").alias("doc"))
        .unionAll(pairs.select(F.col("id_b").alias("doc")))
        .distinct()
    )
    ex = (
        hashed.join(F.broadcast(cand_docs), "doc", "left_semi")
        .select("doc", F.explode("dv").alias("h"))
    )
    a = ex.select(F.col("doc").alias("id_a"), "h")
    b = ex.select(F.col("doc").alias("id_b"), "h")
    co = (
        a.join(b, "h")
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    sizes = hashed.select("doc", F.size("dv").alias("n"))
    inter = F.coalesce(F.col("inter"), F.lit(0)).cast("double")
    return (
        pairs.join(co, ["id_a", "id_b"], "left")
        .join(sizes.select(F.col("doc").alias("id_a"), F.col("n").alias("na")), "id_a")
        .join(sizes.select(F.col("doc").alias("id_b"), F.col("n").alias("nb")), "id_b")
        .select(
            "id_a",
            "id_b",
            "est_jaccard",
            F.round(
                inter / ((F.col("na") + F.col("nb")).cast("double") - inter), 4
            ).alias("true_jaccard"),
        )
        .select(
            "id_a",
            "id_b",
            "est_jaccard",
            "true_jaccard",
            F.round(F.abs(F.col("est_jaccard") - F.col("true_jaccard")), 4).alias(
                "abs_err"
            ),
        )
    )


# ---- pagerank: long-encoded node ids inside the loop ----------------------

def pr_base(spark, sf):
    from c3dc_etl_spark.suite import REGISTRY

    return REGISTRY["pagerank_purchase_graph"].fn(spark, sf)


def pr_long(spark, sf):
    """Internal node ids = 2*custkey (customers) / 2*suppkey+1
    (suppliers): 8-byte longs through every join/agg of the power
    iteration instead of 'c:123' strings; the final projection maps
    back to the public string ids. Bijective, integer-exact."""
    from c3dc_etl_spark.operators.graph import pagerank
    from c3dc_etl_spark.operators.iterscope import iteration_shuffle_scope
    from c3dc_etl_spark.pinning import pin
    from c3dc_etl_spark.sizing import parquet_row_count
    from c3dc_etl_spark.suite.graph_ops import PR_DAMPING_PCT, PR_ITERATIONS
    from c3dc_etl_spark.suite.registry import load

    orders = load(spark, sf, "orders").select("o_orderkey", "o_custkey")
    li = load(spark, sf, "lineitem").select("l_orderkey", "l_suppkey")
    n_edges = 2 * parquet_row_count(f"{sf}/lineitem.parquet")
    with iteration_shuffle_scope(spark, n_edges):
        pairs = pin(
            li.join(orders, li.l_orderkey == orders.o_orderkey)
            .select(
                (F.col("o_custkey").cast("long") * 2).alias("c"),
                (F.col("l_suppkey").cast("long") * 2 + 1).alias("s"),
            )
            .distinct()
        )
        edges = pairs.select(
            F.col("c").alias("src"), F.col("s").alias("dst")
        ).unionByName(
            pairs.select(F.col("s").alias("src"), F.col("c").alias("dst"))
        )
        n_nodes = edges.select("src").distinct().count()
        ranks = pagerank(
            edges,
            n_nodes,
            damping_pct=PR_DAMPING_PCT,
            iterations=PR_ITERATIONS,
            eager_final=True,
        )
    return ranks.select(
        F.when(
            F.col("node") % 2 == 0,
            F.concat(F.lit("c:"), F.expr("node div 2").cast("string")),
        )
        .otherwise(
            F.concat(
                F.lit("s:"), F.expr("(node - 1) div 2").cast("string")
            )
        )
        .alias("node"),
        "rank_x1e12",
    )


# ---- sssp: long-encoded node ids ------------------------------------------

def sssp_base(spark, sf):
    from c3dc_etl_spark.suite import REGISTRY

    return REGISTRY["graph_sssp_bounded"].fn(spark, sf)


def sssp_long(spark, sf):
    from c3dc_etl_spark.pinning import pin
    from c3dc_etl_spark.suite.graph_ops import BFS_SOURCE, SSSP_ROUNDS
    from c3dc_etl_spark.suite.registry import load

    assert BFS_SOURCE == "c:1"
    orders = load(spark, sf, "orders").select("o_orderkey", "o_custkey")
    li = load(spark, sf, "lineitem").select("l_orderkey", "l_suppkey")
    pairs = pin(
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy("o_custkey", "l_suppkey")
        .agg(F.countDistinct("o_orderkey").cast("bigint").alias("cnt"))
        .select(
            (F.col("o_custkey").cast("long") * 2).alias("c"),
            (F.col("l_suppkey").cast("long") * 2 + 1).alias("s"),
            (F.lit(1) + (F.col("cnt") % 5)).cast("bigint").alias("w"),
        )
    )
    edges = pairs.select(
        F.col("c").alias("src"), F.col("s").alias("dst"), "w"
    ).unionByName(
        pairs.select(F.col("s").alias("src"), F.col("c").alias("dst"), "w")
    )
    # sssp_bounded but with a LONG source id (2*1 = customer 1)
    e = edges.select(
        F.col("src").alias("u"), F.col("dst").alias("v"), F.col("w")
    ).localCheckpoint(eager=True)
    dist = spark.createDataFrame([(2, 0)], "node LONG, dist BIGINT").localCheckpoint(
        eager=True
    )
    for _ in range(SSSP_ROUNDS):
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
    return dist.select(
        F.when(
            F.col("node") % 2 == 0,
            F.concat(F.lit("c:"), F.expr("node div 2").cast("string")),
        )
        .otherwise(
            F.concat(
                F.lit("s:"), F.expr("(node - 1) div 2").cast("string")
            )
        )
        .alias("node"),
        "dist",
    )


# ---- containment: packed co-occurrence pair keys ---------------------------

def containment_base(spark, sf):
    from c3dc_etl_spark.suite import REGISTRY

    return REGISTRY["dedup_containment"].fn(spark, sf)


def containment_packed(spark, sf):
    """_shingle_cooccurrence with the candidate/intersection pair keys
    packed into one bigint (id_a * 2^32 + id_b)."""
    from c3dc_etl_spark.operators import dedup as D
    from c3dc_etl_spark.operators.dedup import (
        _affine,
        drop_oversized_groups,
        hash32,
        normalize_text,
        perm_constants,
        shingles_of_norm,
        spread,
    )
    from c3dc_etl_spark.pinning import pin
    from c3dc_etl_spark.suite.dedup_ops import (
        CONTAINMENT_BUCKET_HASHES,
        MAX_BUCKET,
        MAX_SHINGLE_DF,
        MIN_CONTAINMENT,
        SHINGLE_K,
    )
    from c3dc_etl_spark.suite.registry import load

    docs = load(spark, sf, "documents")
    normed = spread(docs).select(
        F.col("doc_id").alias("doc"), normalize_text("text").alias("__norm")
    )
    hashed = pin(
        normed.select(
            "doc",
            F.array_distinct(
                F.transform(shingles_of_norm(F.col("__norm"), SHINGLE_K), hash32)
            ).alias("hv"),
        )
    )
    buckets = hashed.select(
        "doc",
        F.explode(
            F.array(
                *[
                    F.array_min(F.transform(F.col("hv"), _affine(a, b))).cast("string")
                    for (a, b) in perm_constants(CONTAINMENT_BUCKET_HASHES, "jb")
                ]
            )
        ).alias("bucket"),
    )
    buckets = drop_oversized_groups(buckets, ["bucket"], MAX_BUCKET)
    left = buckets.select(F.col("doc").alias("id_a"), "bucket")
    right = buckets.select(F.col("doc").alias("id_b"), "bucket")
    pairs = (
        left.join(right, "bucket")
        .filter(F.col("id_a") < F.col("id_b"))
        .select(
            (F.shiftleft(F.col("id_a").cast("long"), 32) + F.col("id_b")).alias("k")
        )
        .dropDuplicates(["k"])
    )
    exploded = hashed.select("doc", F.explode("hv").alias("h"))
    exploded = drop_oversized_groups(
        exploded, ["h"], MAX_SHINGLE_DF, broadcast_hot=False
    )
    ea = exploded.select(F.col("doc").alias("id_a"), "h")
    eb = exploded.select(F.col("doc").alias("id_b"), "h")
    co = (
        ea.join(eb, "h")
        .filter(F.col("id_a") < F.col("id_b"))
        .select(
            (F.shiftleft(F.col("id_a").cast("long"), 32) + F.col("id_b")).alias("k")
        )
        .groupBy("k")
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    sizes = hashed.select(F.col("doc").alias("id"), F.size("hv").alias("n"))
    unpacked = (
        pairs.join(co, ["k"], "left")
        .select(
            F.shiftrightunsigned(F.col("k"), 32).alias("id_a"),
            F.col("k").bitwiseAND(F.lit(0xFFFFFFFF)).alias("id_b"),
            "inter",
        )
        .join(sizes.select(F.col("id").alias("id_a"), F.col("n").alias("n_a")), "id_a")
        .join(sizes.select(F.col("id").alias("id_b"), F.col("n").alias("n_b")), "id_b")
    )
    inter = F.coalesce(F.col("inter"), F.lit(0)).cast("double")
    denom = F.least(F.col("n_a"), F.col("n_b")).cast("double")
    cont = F.round(inter / denom, 4)
    return unpacked.select(
        "id_a",
        "id_b",
        F.col("n_a").alias("size_a"),
        F.col("n_b").alias("size_b"),
        cont.alias("containment"),
    ).filter(F.col("containment") >= MIN_CONTAINMENT)


# ---- kcore: long-encoded node ids ------------------------------------------

def kcore_base(spark, sf):
    from c3dc_etl_spark.suite import REGISTRY

    return REGISTRY["graph_kcore_bounded"].fn(spark, sf)


def kcore_long(spark, sf):
    from c3dc_etl_spark.operators.graph import kcore_bounded
    from c3dc_etl_spark.operators.iterscope import iteration_shuffle_scope
    from c3dc_etl_spark.pinning import pin
    from c3dc_etl_spark.sizing import parquet_row_count
    from c3dc_etl_spark.suite.graph_ops import KCORE_K, KCORE_ROUNDS
    from c3dc_etl_spark.suite.registry import load

    orders = load(spark, sf, "orders").select("o_orderkey", "o_custkey")
    li = load(spark, sf, "lineitem").select("l_orderkey", "l_suppkey")
    with iteration_shuffle_scope(
        spark, 2 * parquet_row_count(f"{sf}/lineitem.parquet")
    ):
        pairs = pin(
            li.join(orders, li.l_orderkey == orders.o_orderkey)
            .select(
                (F.col("o_custkey").cast("long") * 2).alias("c"),
                (F.col("l_suppkey").cast("long") * 2 + 1).alias("s"),
            )
            .distinct()
        )
        edges = pairs.select(
            F.col("c").alias("src"), F.col("s").alias("dst")
        ).unionByName(
            pairs.select(F.col("s").alias("src"), F.col("c").alias("dst"))
        )
        out = kcore_bounded(edges, KCORE_K, rounds=KCORE_ROUNDS)
        out = out.localCheckpoint(eager=True)
    return out.select(
        F.when(
            F.col("node") % 2 == 0,
            F.concat(F.lit("c:"), F.expr("node div 2").cast("string")),
        )
        .otherwise(
            F.concat(F.lit("s:"), F.expr("(node - 1) div 2").cast("string"))
        )
        .alias("node"),
        "degree",
    )


# ---- bfs: long-encoded node ids --------------------------------------------

def bfs_base(spark, sf):
    from c3dc_etl_spark.suite import REGISTRY

    return REGISTRY["graph_bfs_hops"].fn(spark, sf)


def bfs_long(spark, sf):
    from c3dc_etl_spark.operators.graph import bfs_hops
    from c3dc_etl_spark.pinning import pin
    from c3dc_etl_spark.suite.graph_ops import BFS_MAX_HOPS, BFS_SOURCE
    from c3dc_etl_spark.suite.registry import load

    assert BFS_SOURCE == "c:1"
    orders = load(spark, sf, "orders").select("o_orderkey", "o_custkey")
    li = load(spark, sf, "lineitem").select("l_orderkey", "l_suppkey")
    pairs = pin(
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .select(
            (F.col("o_custkey").cast("long") * 2).alias("c"),
            (F.col("l_suppkey").cast("long") * 2 + 1).alias("s"),
        )
        .distinct()
    )
    edges = pairs.select(
        F.col("c").alias("src"), F.col("s").alias("dst")
    ).unionByName(pairs.select(F.col("s").alias("src"), F.col("c").alias("dst")))
    visited = bfs_hops_long(edges, 2, max_hops=BFS_MAX_HOPS)
    return visited.select(
        F.when(
            F.col("node") % 2 == 0,
            F.concat(F.lit("c:"), F.expr("node div 2").cast("string")),
        )
        .otherwise(
            F.concat(F.lit("s:"), F.expr("(node - 1) div 2").cast("string"))
        )
        .alias("node"),
        "hops",
    )


def bfs_hops_long(edges, source, *, max_hops):
    """bfs_hops with a LONG source/node type."""
    e = edges.select(F.col("src").alias("u"), F.col("dst").alias("v"))
    e = e.localCheckpoint(eager=True)
    spark = edges.sparkSession
    visited = spark.createDataFrame(
        [(source, 0)], "node LONG, hops BIGINT"
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


def containment_intbucket(spark, sf):
    """_shingle_cooccurrence with the min-hash bucket key kept as the
    INT the affine map produces (the production operator casts it to
    string purely for uniformity — a bijective re-encoding, so the
    bucket join/cap groups are identical; guide §2.3 narrower types:
    8-byte long join/shuffle key instead of a ~10-char string)."""
    from c3dc_etl_spark.operators.dedup import (
        _affine,
        drop_oversized_groups,
        hash32,
        normalize_text,
        perm_constants,
        shingles_of_norm,
        spread,
    )
    from c3dc_etl_spark.pinning import pin
    from c3dc_etl_spark.suite.dedup_ops import (
        CONTAINMENT_BUCKET_HASHES,
        MAX_BUCKET,
        MAX_SHINGLE_DF,
        MIN_CONTAINMENT,
        SHINGLE_K,
    )
    from c3dc_etl_spark.suite.registry import load

    docs = load(spark, sf, "documents")
    normed = spread(docs).select(
        F.col("doc_id").alias("doc"), normalize_text("text").alias("__norm")
    )
    hashed = pin(
        normed.select(
            "doc",
            F.array_distinct(
                F.transform(shingles_of_norm(F.col("__norm"), SHINGLE_K), hash32)
            ).alias("hv"),
        )
    )
    buckets = hashed.select(
        "doc",
        F.explode(
            F.array(
                *[
                    F.array_min(F.transform(F.col("hv"), _affine(a, b)))
                    for (a, b) in perm_constants(CONTAINMENT_BUCKET_HASHES, "jb")
                ]
            )
        ).alias("bucket"),
    )
    buckets = drop_oversized_groups(buckets, ["bucket"], MAX_BUCKET)
    left = buckets.select(F.col("doc").alias("id_a"), "bucket")
    right = buckets.select(F.col("doc").alias("id_b"), "bucket")
    pairs = (
        left.join(right, "bucket")
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .dropDuplicates(["id_a", "id_b"])
    )
    exploded = hashed.select("doc", F.explode("hv").alias("h"))
    exploded = drop_oversized_groups(
        exploded, ["h"], MAX_SHINGLE_DF, broadcast_hot=False
    )
    ea = exploded.select(F.col("doc").alias("id_a"), "h")
    eb = exploded.select(F.col("doc").alias("id_b"), "h")
    co = (
        ea.join(eb, "h")
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    sizes = hashed.select(F.col("doc").alias("id"), F.size("hv").alias("n"))
    joined = (
        pairs.join(co, ["id_a", "id_b"], "left")
        .join(sizes.select(F.col("id").alias("id_a"), F.col("n").alias("n_a")), "id_a")
        .join(sizes.select(F.col("id").alias("id_b"), F.col("n").alias("n_b")), "id_b")
    )
    inter = F.coalesce(F.col("inter"), F.lit(0)).cast("double")
    denom = F.least(F.col("n_a"), F.col("n_b")).cast("double")
    cont = F.round(inter / denom, 4)
    return joined.select(
        "id_a",
        "id_b",
        F.col("n_a").alias("size_a"),
        F.col("n_b").alias("size_b"),
        cont.alias("containment"),
    ).filter(F.col("containment") >= MIN_CONTAINMENT)


def simpairs_base2(spark, sf):
    from c3dc_etl_spark.suite import REGISTRY

    return REGISTRY["dedup_simhash_pairs"].fn(spark, sf)


def simpairs_intband(spark, sf):
    """simhash_hamming_pairs with the band key packed into one INT
    (band_index * 2^band_bits + band_value — bijective with the
    'b:val' string, so buckets/caps/pairs are identical; §2.3)."""
    from c3dc_etl_spark.operators.dedup import (
        drop_oversized_groups,
        simhash,
    )
    from c3dc_etl_spark.suite.dedup_ops import SIMHASH_MAX_BUCKET
    from c3dc_etl_spark.suite.registry import load

    bits, band_bits, max_hamming = 32, 8, 3
    n_bands = bits // band_bits
    mask = (1 << band_bits) - 1
    docs = load(spark, sf, "documents")
    fp = simhash(docs, "text", "doc_id", bits=bits)
    banded = fp.select(
        "doc",
        "simhash",
        F.explode(
            F.array(
                *[
                    (
                        F.lit(b * (mask + 1))
                        + F.shiftright(F.col("simhash"), b * band_bits)
                        .bitwiseAND(F.lit(mask))
                    )
                    for b in range(n_bands)
                ]
            )
        ).alias("band"),
    )
    banded = drop_oversized_groups(banded, ["band"], SIMHASH_MAX_BUCKET)
    a = banded.select(F.col("doc").alias("id_a"), F.col("simhash").alias("fp_a"), "band")
    b = banded.select(F.col("doc").alias("id_b"), F.col("simhash").alias("fp_b"), "band")
    hamming = F.bit_count(F.col("fp_a").bitwiseXOR(F.col("fp_b")))
    return (
        a.join(b, "band")
        .filter(F.col("id_a") < F.col("id_b"))
        .withColumn("hamming", hamming)
        .filter(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", "hamming")
        .dropDuplicates(["id_a", "id_b"])
    )


PAIRS = {
    "cov": (cov_base, cov_spread),
    "tfidf": (tfidf_base, tfidf_spread),
    "simpairs": (simpairs_base, simpairs_spread),
    "bm25": (bm25_base, bm25_spread),
    "mh_err": (mh_err_base, mh_err_semijoin),
    "pagerank": (pr_base, pr_long),
    "sssp": (sssp_base, sssp_long),
    "kcore": (kcore_base, kcore_long),
    "containment": (containment_base, containment_packed),
    "bfs": (bfs_base, bfs_long),
    # round 13
    "cont_intbucket": (containment_base, containment_intbucket),
    "simpairs_intband": (simpairs_base2, simpairs_intband),
}


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--runs", type=int, default=2)
    ap.add_argument("--pairs", default=",".join(PAIRS))
    args = ap.parse_args()

    from c3dc_etl_spark.pinning import release_pinned
    from c3dc_etl_spark.session import get_spark

    spark = get_spark("exp-misc")
    for name in args.pairs.split(","):
        base_fn, var_fn = PAIRS[name]
        spark.sparkContext.setJobDescription(f"{name}:rows-check")
        base_rows = sorted(tuple(r) for r in base_fn(spark, args.sf).collect())
        release_pinned()
        var_rows = sorted(tuple(r) for r in var_fn(spark, args.sf).collect())
        release_pinned()
        match = base_rows == var_rows
        out = [f"{name}: rows match={match}"]
        # INTERLEAVED timing (r12 lesson: sequential A/Bs are C2-ramp
        # order-dominated): alternate base/var within each round.
        ts: dict[str, list[float]] = {"base": [], "var": []}
        for i in range(args.runs):
            for tag, fn in (("base", base_fn), ("var", var_fn)):
                spark.sparkContext.setJobDescription(f"{name}:{tag}:{i}")
                t0 = time.perf_counter()
                fn(spark, args.sf).write.format("noop").mode("overwrite").save()
                release_pinned()
                ts[tag].append(round(time.perf_counter() - t0, 2))
        out.append(f"base={ts['base']}")
        out.append(f"var={ts['var']}")
        print("  ".join(out), flush=True)
        if not match:
            print(f"!! {name}: VARIANT DIVERGES ({len(base_rows)} vs {len(var_rows)} rows)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

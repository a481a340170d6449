"""Sequence packing: fill fixed token-budget training sequences.

After chunking, an LLM pipeline packs chunks into training examples of
a fixed context length so no compute is wasted on padding. The packing
here is the deterministic streaming fill: within a shard, chunks are
laid out in a stable order and a new sequence starts whenever the
running token total crosses the budget — expressible as one cumulative
-sum window per shard, so the whole operator is a single hash exchange
on the shard key plus an in-partition sort.

Scale design: the shard key is an md5-fold hash of the document id, so
shard sizes are balanced regardless of id distribution and the shard
count is the scale dial (tune so one shard's chunks fit an executor's
sort spill comfortably; shards are fully independent). A boundary chunk
may overflow its sequence by at most (chunk_tokens - 1); exact
first-fit-decreasing packing is NOT order-stable across partitionings
and would need per-shard sequential state (applyInPandasWithState) —
the window formulation trades ~1 chunk of slack for a fully
shuffle-minimal, engine-portable plan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from c3dc_etl_spark.operators.dedup import hash32


def pack_chunks(
    chunks: DataFrame,
    *,
    budget: int,
    num_shards: int,
    seed: str = "pk",
    id_col: str = "doc_id",
    index_col: str = "chunk_index",
    tokens_col: str = "n_tokens",
) -> DataFrame:
    """Assign every chunk row a (shard, seq_id) training-sequence slot.

    shard  = md5-fold(seed:doc_id) mod num_shards   (balanced, stable)
    order  = (doc_id, chunk_index) within shard      (deterministic)
    seq_id = floor(tokens_before / budget)           (cumulative window)

    Returns the chunk rows with ``shard``, ``seq_id`` and
    ``tokens_before`` attached; aggregate per (shard, seq_id) for the
    sequence manifest.
    """
    if budget < 1 or num_shards < 1:
        raise ValueError("budget >= 1 and num_shards >= 1 required")
    shard = (
        hash32(F.concat(F.lit(seed + ":"), F.col(id_col).cast("string")))
        % num_shards
    ).alias("shard")
    w = (
        Window.partitionBy("shard")
        .orderBy(F.col(id_col), F.col(index_col))
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    before = F.coalesce(F.sum(F.col(tokens_col)).over(w), F.lit(0)).cast("bigint")
    return (
        chunks.select("*", shard)
        .withColumn("tokens_before", before)
        .withColumn(
            "seq_id", F.floor(F.col("tokens_before") / F.lit(budget)).cast("bigint")
        )
    )


def sequence_manifest(packed: DataFrame) -> DataFrame:
    """Per-sequence summary of a ``pack_chunks`` result: chunk/doc
    counts, token fill, id span. One partial-agg shuffle keyed by
    (shard, seq_id)."""
    return packed.groupBy("shard", "seq_id").agg(
        F.count(F.lit(1)).alias("n_chunks"),
        F.sum("n_tokens").cast("bigint").alias("seq_tokens"),
        F.countDistinct("doc_id").alias("n_docs"),
        F.min("doc_id").alias("first_doc"),
        F.max("doc_id").alias("last_doc"),
    )

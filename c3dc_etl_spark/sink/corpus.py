"""Sharded training-corpus sink: the write path of the data pipeline.

A curated corpus is consumed by a training job that wants (a) a fixed
number of shards it can assign to data-loader workers, (b) a
reproducible order within each shard (resumable epochs), and (c) file
sizes bounded for parallel fetch. This sink produces exactly that with
plain Spark machinery:

  shard  = md5-fold(seed:id) mod num_shards   — balanced and stable
           under any input partitioning (same helper as packing /
           sampling, so a doc's shard agrees across every operator);
  layout = parquet dir partitioned by shard (``shard=K/``), each shard
           written sorted by the id column (sortWithinPartitions —
           a per-partition sort, never a global orderBy);
  sizing = spark.sql.files.maxRecordsPerFile caps file size without an
           extra shuffle.

At 100 TB this is one hash exchange (the repartition on shard) and a
spill-safe in-partition sort per shard; num_shards is the scale dial
(pick >= cluster cores; shards are independent downstream).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from c3dc_etl_spark.operators.dedup import hash32


def shard_column(id_col: str, num_shards: int, seed: str = "shard"):
    """Deterministic shard id in [0, num_shards) from a stable key."""
    return (
        hash32(F.concat(F.lit(seed + ":"), F.col(id_col).cast("string")))
        % num_shards
    ).cast("int")


def write_training_shards(
    df: DataFrame,
    out_dir: str,
    *,
    num_shards: int,
    id_col: str = "doc_id",
    seed: str = "shard",
    max_records_per_file: int | None = None,
    mode: str = "overwrite",
) -> None:
    """Write ``df`` as a shard-partitioned parquet corpus.

    Each ``shard=K`` directory holds that shard's rows sorted by
    ``id_col``; re-running on the same input produces byte-identical
    shard membership and row order (modulo parquet encoding), which is
    what makes training runs resumable and ablations comparable.
    """
    if num_shards < 1:
        raise ValueError("num_shards >= 1 required")
    sharded = df.withColumn("shard", shard_column(id_col, num_shards, seed))
    writer = (
        sharded.repartition(num_shards, F.col("shard"))
        .sortWithinPartitions("shard", id_col)
        .write.mode(mode)
        .partitionBy("shard")
    )
    if max_records_per_file is not None:
        writer = writer.option("maxRecordsPerFile", max_records_per_file)
    writer.parquet(out_dir)


def read_training_shards(
    spark: SparkSession, out_dir: str, shards: list[int] | None = None
) -> DataFrame:
    """Read a sharded corpus back; ``shards`` restricts to a worker's
    assignment via partition pruning (the shard=K dirs are parquet
    partition values — no data outside the listed shards is scanned)."""
    df = spark.read.parquet(out_dir)
    if shards is not None:
        df = df.filter(F.col("shard").isin([int(s) for s in shards]))
    return df


def shard_manifest(spark: SparkSession, out_dir: str) -> DataFrame:
    """Per-shard row counts of a written corpus — the loader manifest.
    One partial-agg shuffle over the shard partition column only (scans
    prune to metadata + the pruned columns)."""
    return (
        spark.read.parquet(out_dir)
        .groupBy("shard")
        .agg(F.count(F.lit(1)).alias("n_rows"))
    )


def compact_shards(
    spark: SparkSession,
    out_dir: str,
    *,
    target_rows_per_shard: int,
    id_col: str = "doc_id",
    seed: str = "shard",
) -> int:
    """Small-file compaction for a sharded corpus: re-shard the corpus
    so each shard holds ~``target_rows_per_shard`` rows, publishing the
    rewrite with an atomic directory swap. Returns the new shard count.

    Incremental corpus builds accumulate many small shards (each
    nightly delta appends its own); training loaders and object stores
    both degrade under tiny-file storms, so periodic compaction is part
    of the sink's lifecycle. The rewrite is the same single hash
    exchange + in-partition sort as the original write; the sizing
    count() beforehand is footer-only (empty read schema — parquet row
    counts come from metadata, no column data moves), so the DATA pass
    over the corpus is one. Publishing goes through sink/publish.py: a
    crash at any point leaves the previous layout recoverable (the
    between-renames window heals on the next read/compact), with the
    documented local-FS caveat that a concurrent reader mid-swap fails
    loudly and retries — at cluster scale this step is a table-format
    metadata commit.
    """
    import math

    from c3dc_etl_spark.sink.publish import publish, recover

    recover(out_dir)
    df = spark.read.parquet(out_dir).drop("shard")
    n_rows = df.count()  # footer-only scan: drives the shard-count choice
    new_shards = max(1, math.ceil(n_rows / target_rows_per_shard))
    staging = out_dir.rstrip("/") + ".compact"
    write_training_shards(
        df,
        staging,
        num_shards=new_shards,
        id_col=id_col,
        seed=seed,
    )
    publish(staging, out_dir)
    spark.catalog.refreshByPath(out_dir)
    return new_shards

"""File-arrival-triggered harmonization + stateful streaming dedup.

Key design point: the mapping compiler emits PURE PROJECTION plans
(select / filter / posexplode / unionByName — no windows, no joins in
the per-node build), so ``build_node`` works UNCHANGED on a streaming
DataFrame: the same compiled study runs as a batch job today and as an
incremental file-watcher tomorrow. Order-dependent operators (A1/A2
window selections, merge first-wins) stay in the batch layer or run
per-microbatch via foreachBatch.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructType

from c3dc_etl_spark.mapping.compiler import CompilerContext
from c3dc_etl_spark.mapping.model import FieldMapping
from c3dc_etl_spark.harmonize.builder import build_node
from c3dc_etl_spark.operators.dedup import content_digest


def subject_stream(
    spark: SparkSession, path: str, schema: StructType
) -> DataFrame:
    """JSON-lines file stream of subject records. Streaming file sources
    need an explicit schema (no inference) — derive it once from a batch
    read of existing files if needed."""
    return spark.readStream.schema(schema).json(path)


def harmonized_node_stream(
    stream: DataFrame,
    node: str,
    mappings: Sequence[FieldMapping],
    ctx: CompilerContext,
) -> DataFrame:
    """The compiled per-node harmonization applied to a stream — narrow
    operators only, so the incremental plan is identical to the batch
    plan per input file."""
    return build_node(stream, node, list(mappings), ctx, explode_subrecords=True)


def start_file_triggered_run(
    harmonized: DataFrame,
    *,
    output_dir: str,
    checkpoint_dir: str,
    available_now: bool = True,
):
    """Start (and return) the streaming query writing harmonized
    JSON-lines per node as source files arrive. ``available_now``
    processes the current backlog then stops — the file-arrival batch
    trigger; set False for a continuously-running watcher."""
    writer = (
        harmonized.writeStream.format("json")
        .option("path", output_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def windowed_event_counts(
    stream: DataFrame,
    *,
    event_time_col: str,
    key_col: str,
    window_duration: str = "1 hour",
    watermark_delay: str = "30 minutes",
) -> DataFrame:
    """Watermarked tumbling-window counts per key — the late-data-safe
    streaming aggregate: events later than ``watermark_delay`` past the
    window end are dropped and the window's state is released (bounded
    state, exactly-once per window in append mode)."""
    return (
        stream.withWatermark(event_time_col, watermark_delay)
        .groupBy(F.window(F.col(event_time_col), window_duration), F.col(key_col))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.col("window.start").alias("window_start"),
            F.col("window.end").alias("window_end"),
            key_col,
            "n_events",
        )
    )


def sliding_window_counts(
    stream: DataFrame,
    *,
    event_time_col: str,
    key_col: str,
    window_duration: str = "1 day",
    slide_duration: str = "12 hours",
    watermark_delay: str = "30 minutes",
) -> DataFrame:
    """Watermarked SLIDING-window counts per key: each event lands in
    duration/slide overlapping windows (Spark expands it once per
    covering window before the aggregate), so state is that factor
    times the tumbling equivalent — the cost model to size slide by.
    Same bounded-state/eviction contract as windowed_event_counts."""
    return (
        stream.withWatermark(event_time_col, watermark_delay)
        .groupBy(
            F.window(F.col(event_time_col), window_duration, slide_duration),
            F.col(key_col),
        )
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.col("window.start").alias("window_start"),
            F.col("window.end").alias("window_end"),
            key_col,
            "n_events",
        )
    )


def session_window_stats(
    stream: DataFrame,
    *,
    event_time_col: str,
    key_col: str,
    gap: str = "4 hours",
    watermark_delay: str = "30 minutes",
) -> DataFrame:
    """Gap-based sessions on a stream via the native session_window
    aggregate: per key, events closer than ``gap`` merge into one
    session ([first_event, last_event + gap)); state is one open
    session per key, merged incrementally across micro-batches and
    evicted once the watermark passes the session end — the streaming
    analogue of the batch lag/running-sum sessionization
    (suite/temporal_ops.py), with bounded state at ingest scale."""
    return (
        stream.withWatermark(event_time_col, watermark_delay)
        .groupBy(
            F.session_window(F.col(event_time_col), gap), F.col(key_col)
        )
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.col("session_window.start").alias("session_start"),
            F.col("session_window.end").alias("session_end"),
            key_col,
            "n_events",
        )
    )


def streaming_exact_dedup(
    stream: DataFrame,
    *,
    text_col: str,
    id_col: str,
    event_time_col: str,
    watermark_delay: str = "1 hour",
) -> DataFrame:
    """Stateful exact dedup on a stream: content-digest the text, keep
    the first record per digest, expire state past the watermark (late
    duplicates beyond ``watermark_delay`` would pass through — the
    bounded-state trade every streaming dedup makes)."""
    return (
        stream.withColumn("content_hash", content_digest(text_col))
        .withWatermark(event_time_col, watermark_delay)
        .dropDuplicates(["content_hash"])
        .select(id_col, "content_hash", event_time_col)
    )


def streaming_dedup_within_watermark(
    stream: DataFrame,
    *,
    text_col: str,
    id_col: str,
    event_time_col: str,
    watermark_delay: str = "1 hour",
) -> DataFrame:
    """Stateful dedup via ``dropDuplicatesWithinWatermark`` — the
    BOUNDED-STATE contract plain dropDuplicates cannot give: each
    digest's state is dropped once the watermark passes its first
    arrival + delay, so the state store size follows the event-time
    window, not the all-time distinct count. The semantic trade is the
    inverse of streaming_exact_dedup's: duplicates are only suppressed
    while their key state LIVES (within the watermark window); a
    re-arrival after expiry is emitted again — correct for
    at-least-once ingest dedup, where duplicates cluster in time, and
    the ONLY viable shape when the all-time digest domain outgrows
    state at 100 TB."""
    return (
        stream.withColumn("content_hash", content_digest(text_col))
        .withWatermark(event_time_col, watermark_delay)
        .dropDuplicatesWithinWatermark(["content_hash"])
        .select(id_col, "content_hash", event_time_col)
    )


def start_incremental_dedup_run(
    stream: DataFrame,
    base_df: DataFrame,
    *,
    text_col: str,
    id_col: str,
    sink,
    checkpoint_dir: str,
    **lsh_kwargs,
):
    """Streaming ingestion dedup: every micro-batch (a crawl delta) is
    LSH-matched against the STATIC accumulated corpus via
    operators.dedup.incremental_lsh_candidates — cross-side pairs only,
    so per-batch cost scales with the delta. ``sink(pairs_df, epoch_id)``
    receives the candidate pairs (id_new, id_base, est_jaccard) for each
    batch; the batch's persisted signature intermediate is dropped by
    the context cleaner once the batch's refs are released.

    foreachBatch is the right harness here (not a stateful streaming
    op): the base side is a batch table, and LSH banding needs no
    cross-batch state — each delta is independent given the base.
    """
    from c3dc_etl_spark.operators.dedup import incremental_lsh_candidates

    base = base_df.select(
        F.col(id_col), F.col(text_col), F.lit(False).alias("__is_new")
    )

    def _process(batch_df: DataFrame, epoch_id: int) -> None:
        if batch_df.isEmpty():
            return
        marked = base.unionByName(
            batch_df.select(
                F.col(id_col), F.col(text_col), F.lit(True).alias("__is_new")
            )
        )
        pairs = incremental_lsh_candidates(
            marked, text_col, id_col, F.col("__is_new"), **lsh_kwargs
        )
        sink(pairs, epoch_id)

    return (
        stream.writeStream.foreachBatch(_process)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )

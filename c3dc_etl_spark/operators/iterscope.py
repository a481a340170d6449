"""Reducer sizing for iterative DataFrame loops.

Iterative graph/fixpoint loops issue MANY small shuffles (one or two
per round) over a working set that is usually far smaller than the
input tables. At core-count reducers each round pays scheduler + task
launch + shuffle-file overhead on partitions carrying a few megabytes
— measured on this repo's local[32] at sf0.1 (round 10, 2 timed runs
per point, warm):

    pagerank_purchase_graph  32 parts: 6.0s   16: 4.4s   8: 3.7s
    graph_kcore_bounded      32 parts: 5.5s   16: 4.1s   8: 3.2s

AQE does not save this by default: ``coalescePartitions.
parallelismFirst=true`` deliberately keeps post-shuffle parallelism at
core count rather than the advisory byte target, which is the right
default for one-shot heavy shuffles and the wrong one for a loop of
tiny latency-bound rounds.

``iteration_partitions`` sizes reducers to the WORKING SET, the same
derivation discipline as streaming/sizing.state_partitions: enough
partitions that each carries ~ITER_PARTITION_BYTES of shuffle rows,
power-of-two, floored at ``min_partitions`` so real compute still
parallelizes. It grows with data (x5 corpus -> 4x the reducers) and on
a cluster keeps sizing by volume instead of inheriting a local tune.

``iteration_shuffle_scope`` applies it as a scoped
``spark.sql.shuffle.partitions`` override. IMPORTANT: the conf is read
at ACTION time, not DataFrame-build time — the scope only governs
work the loop executes eagerly inside it (``localCheckpoint(eager)``
per round). Loops that are lazy end-to-end must materialize their
final state inside the scope (see ``pagerank(..., eager_final=True)``)
or the override silently never applies. Results are partition-count-
independent by construction for every caller (integer-exact
aggregations), so this is timing-only.
"""

from __future__ import annotations

from contextlib import contextmanager

from pyspark.sql import SparkSession

__all__ = [
    "EDGE_ROW_BYTES",
    "ITER_PARTITION_BYTES",
    "iteration_partitions",
    "iteration_shuffle_scope",
]

# UnsafeRow footprint of a (string src, string dst[, long w]) edge —
# the dominant shuffled shape of the graph loops.
EDGE_ROW_BYTES = 48

# Per-reducer shuffle budget for latency-bound iterative rounds: small
# enough that a few-MB working set still spreads over several cores,
# large enough that per-task overhead stays amortized.
ITER_PARTITION_BYTES = 8 << 20


def iteration_partitions(
    n_rows: int,
    bytes_per_row: int = EDGE_ROW_BYTES,
    *,
    per_partition_bytes: int = ITER_PARTITION_BYTES,
    min_partitions: int = 8,
    max_partitions: int | None = None,
) -> int:
    """Reducer count for an iterative loop shuffling ``n_rows`` rows of
    ``bytes_per_row`` per round: ceil(volume / per-partition budget),
    rounded up to a power of two, clamped (the shared
    ``c3dc_etl_spark.sizing`` derivation)."""
    from c3dc_etl_spark.sizing import sized_partitions

    if n_rows < 0:
        raise ValueError(f"n_rows must be >= 0, got {n_rows}")
    if bytes_per_row <= 0:
        raise ValueError(f"bytes_per_row must be > 0, got {bytes_per_row}")
    return sized_partitions(
        n_rows * bytes_per_row,
        per_partition_bytes,
        min_partitions=min_partitions,
        max_partitions=max_partitions,
    )


@contextmanager
def iteration_shuffle_scope(spark: SparkSession, n_rows: int, **kwargs):
    """Scoped ``spark.sql.shuffle.partitions`` override sized by
    ``iteration_partitions``; always restored, exception or not."""
    parts = iteration_partitions(n_rows, **kwargs)
    key = "spark.sql.shuffle.partitions"
    prev = spark.conf.get(key)
    spark.conf.set(key, str(parts))
    try:
        yield parts
    finally:
        spark.conf.set(key, prev)

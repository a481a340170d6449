"""State-store partition sizing.

The number of streaming state partitions is read from
``spark.sql.shuffle.partitions`` at stream start and BAKED into the
checkpoint, so it must be chosen deliberately — and it must be sized
to STATE VOLUME, never to a core count:

- Every state partition pays per-micro-batch snapshot/delta FILE
  overhead (HDFSBackedStateStore writes one delta per partition per
  batch). At core-count partitions that fixed overhead dominated the
  ~100 MB states of this suite's availableNow drains (measured r9,
  local[32]: outer-join eviction drain 14.7 s at 32 partitions ->
  5.5 s at 8, identical results).
- In the other direction a partition's state must FIT in a task's
  memory with headroom; growing state means growing the partition
  count, not the heap.

``state_partitions`` encodes both sides: ceil(state_bytes /
per_partition_bytes) rounded up to a power of two (keeps modulo hash
distribution even and successive resizes comparable), clamped to
[min_partitions, max_partitions]. A cluster port overriding the
default budget changes ONE number here instead of inheriting a
local-mode tune.
"""

from __future__ import annotations

__all__ = ["DRAIN_STATE_BYTES", "PER_PARTITION_STATE_BYTES", "state_partitions"]

# Measured ceiling of the suite's availableNow drains at sf0.1 (the
# outer-join eviction state, the largest of the twelve) — the basis of
# the local-mode default, not a cluster constant.
DRAIN_STATE_BYTES = 100 << 20

# Per-partition state budget: small enough that a partition's store
# loads/snapshots well inside a task's memory headroom, large enough
# that per-batch file overhead stays amortized.
PER_PARTITION_STATE_BYTES = 16 << 20


def state_partitions(
    state_bytes: int,
    per_partition_bytes: int = PER_PARTITION_STATE_BYTES,
    *,
    min_partitions: int = 1,
    max_partitions: int | None = None,
) -> int:
    """Partition count for ``state_bytes`` of streaming state: enough
    partitions that each carries at most ``per_partition_bytes``,
    rounded up to a power of two, clamped to the given bounds (the
    shared ``c3dc_etl_spark.sizing`` derivation)."""
    from c3dc_etl_spark.sizing import sized_partitions

    return sized_partitions(
        state_bytes,
        per_partition_bytes,
        min_partitions=min_partitions,
        max_partitions=max_partitions,
    )

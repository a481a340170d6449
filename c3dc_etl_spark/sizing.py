"""Volume-based partition sizing — the one derivation behind both
streaming state partitions (streaming/sizing.py) and iterative-loop
reducers (operators/iterscope.py): enough partitions that each carries
at most a per-partition byte budget, rounded up to a power of two
(keeps modulo hash distribution even and successive resizes
comparable), clamped. Partition counts derive from DATA VOLUME, never
from a core count — the discipline both call sites document.
"""

from __future__ import annotations

__all__ = ["sized_partitions"]


def sized_partitions(
    volume_bytes: int,
    per_partition_bytes: int,
    *,
    min_partitions: int = 1,
    max_partitions: int | None = None,
) -> int:
    if volume_bytes < 0:
        raise ValueError(f"volume_bytes must be >= 0, got {volume_bytes}")
    if per_partition_bytes <= 0:
        raise ValueError(
            f"per_partition_bytes must be > 0, got {per_partition_bytes}"
        )
    need = max(1, -(-volume_bytes // per_partition_bytes))
    parts = 1
    while parts < need:
        parts *= 2
    parts = max(parts, min_partitions)
    if max_partitions is not None:
        parts = min(parts, max_partitions)
    return parts

"""Volume-based partition sizing — the one derivation behind both
streaming state partitions (streaming/sizing.py) and iterative-loop
reducers (operators/iterscope.py): enough partitions that each carries
at most a per-partition byte budget, rounded up to a power of two
(keeps modulo hash distribution even and successive resizes
comparable), clamped. Partition counts derive from DATA VOLUME, never
from a core count — the discipline both call sites document.
"""

from __future__ import annotations

import os

__all__ = ["parquet_row_count", "sized_partitions"]


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


_ROW_COUNT_CACHE: dict[str, int] = {}


def parquet_row_count(path: str) -> int:
    """Exact row count of a parquet file or directory from the FOOTER
    metadata — a driver-side read of a few KB per file, no Spark job
    (ADVICE r10: sizing scopes were paying a full ``df.count()`` job
    per query run just to pick a reducer count). Cached per path for
    the session; testdata is immutable, and a sizing input being one
    commit stale would change only a power-of-two rounding, never a
    result. On a real cluster the same footers are what the scan
    planner already fetches, so this stays metadata-only at any scale.
    """
    cached = _ROW_COUNT_CACHE.get(path)
    if cached is not None:
        return cached
    import pyarrow.parquet as pq

    if os.path.isdir(path):
        total = 0
        for root, _dirs, names in os.walk(path):
            for name in names:
                if name.endswith((".parquet", ".snappy.parquet")):
                    total += pq.ParquetFile(
                        os.path.join(root, name)
                    ).metadata.num_rows
    else:
        total = pq.ParquetFile(path).metadata.num_rows
    _ROW_COUNT_CACHE[path] = total
    return total

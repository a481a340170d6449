"""Persist/unpersist hygiene for multi-consumer intermediates.

Operators like ``minhash_lsh_candidates`` persist() an expensive
intermediate (the signature table feeds 3+ consumers) but return a LAZY
DataFrame built on it — the operator cannot unpersist before its caller
materializes the result, so in a long-lived session running many queries
the pinned blocks would accumulate until LRU eviction churns.

Every such persist goes through :func:`pin`, which registers the frame
here; consumers call :func:`release_pinned` AFTER materializing a query.
The suite wires this automatically: each registered query releases the
previous query's pins on entry (see ``suite.registry.query``), and
``bench.py`` releases after every collect. Releasing is always
correctness-safe — these are plain persists, so a late re-collect just
recomputes without the cache.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.storagelevel import StorageLevel

_PINNED: list[DataFrame] = []


def pin(df: DataFrame, level: StorageLevel | None = None) -> DataFrame:
    """persist() ``df`` and register it for a later release_pinned()."""
    p = df.persist(level) if level is not None else df.persist()
    _PINNED.append(p)
    return p


def release_pinned() -> int:
    """Unpersist every registered intermediate (blocking=False); returns
    the number released. Call after the consuming query has been
    materialized — releasing earlier is correctness-neutral (plain
    persists recompute) but forfeits the multi-consumer reuse win."""
    n = len(_PINNED)
    while _PINNED:
        _PINNED.pop().unpersist()
    return n


def pinned_count() -> int:
    return len(_PINNED)

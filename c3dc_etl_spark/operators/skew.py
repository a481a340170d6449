"""Skew-handling primitives: deterministic salting for hot keys.

AQE's skew-join split handles most shuffle-join skew automatically (on
in this engine's session defaults), but two shapes still need explicit
salting at 100 TB:

- joining a large table against a MEDIUM table (too big to broadcast)
  on a key with a few hot values — one reducer gets the hot key's
  entire payload;
- ``collect_list``-style aggregations where a hot key's list lands on
  a single reducer.

Salts here are DETERMINISTIC (hash of identity columns mod the salt
factor) — no random(), so plans stay reproducible run-to-run and
engine-portable.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def deterministic_salt(identity: Column, factor: int) -> Column:
    """Stable salt in [0, factor) from an identity column."""
    return F.pmod(F.xxhash64(identity), F.lit(factor))


def salted_join(
    skewed: DataFrame,
    other: DataFrame,
    on: str,
    *,
    salt_factor: int = 16,
    salt_identity: str,
    how: str = "inner",
) -> DataFrame:
    """Equi-join where ``skewed``'s hot join keys are split across
    ``salt_factor`` reducers: each skewed row gets a deterministic salt
    from ``salt_identity`` (any well-distributed column of the skewed
    side, e.g. its primary key), and ``other`` is replicated once per
    salt value — turning one hot (key) partition into ``salt_factor``
    partitions of (key, salt). Replication cost is |other| x factor, so
    use for medium dimension sides that exceed the broadcast threshold
    but are far smaller than the fact side."""
    salted = skewed.withColumn(
        "__salt", deterministic_salt(F.col(salt_identity), salt_factor)
    )
    replicated = other.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(salt_factor - 1)))
    )
    return salted.join(replicated, [on, "__salt"], how).drop("__salt")


def salted_collect_sorted(
    df: DataFrame,
    key: str,
    value: str,
    *,
    salt_factor: int = 16,
) -> DataFrame:
    """collect_list with a hot-key guard: partial lists per (key, salt)
    first, then one flatten+sort per key — the hot key's payload crosses
    the first shuffle as ``salt_factor`` partial lists instead of one
    reducer-crushing group. Output arrays are sorted (deterministic,
    matching the engine's O2 discipline)."""
    partial = (
        df.withColumn("__salt", deterministic_salt(F.col(value), salt_factor))
        .groupBy(key, "__salt")
        .agg(F.collect_list(value).alias("__part"))
    )
    return (
        partial.groupBy(key)
        .agg(F.flatten(F.collect_list("__part")).alias("__all"))
        .select(key, F.array_sort("__all").alias(f"{value}s"))
    )


def salted_topk(
    df: DataFrame,
    keys: list[str],
    order_by: list[Column],
    k: int,
    *,
    salt: Column,
    n_salt: int = 16,
    rank_col: str | None = None,
) -> DataFrame:
    """Two-phase ranked top-k per key group, reducer-bounded: phase 1
    ranks within (keys, salt mod n_salt) and keeps k per bucket, phase
    2 ranks the <= n_salt * k survivors per key. When ``order_by`` is a
    total order within each group the result is identical to the
    single-window top-k — but no key ever sends more than n_salt * k
    rows to one task, where the one-window form concentrates a hot
    key's whole row set on a single reducer. Pass ``rank_col`` to keep
    the final 1-based rank in the output."""
    w1 = Window.partitionBy(*keys, F.pmod(salt, F.lit(n_salt))).orderBy(*order_by)
    pre = (
        df.withColumn("__sr1", F.row_number().over(w1))
        .filter(F.col("__sr1") <= k)
        .drop("__sr1")
    )
    out_col = rank_col or "__sr2"
    w2 = Window.partitionBy(*keys).orderBy(*order_by)
    ranked = pre.withColumn(out_col, F.row_number().over(w2)).filter(
        F.col(out_col) <= k
    )
    return ranked if rank_col else ranked.drop("__sr2")

"""Directory-swap publishing for locally-materialized tables.

``publish`` replaces a live directory with a freshly-written one via
rename, keeping the previous version alive until the new one is in
place; ``recover`` heals the one non-atomic window (between the two
renames) on the next access. Used by the streaming upsert sink and the
corpus compactor.

Scope: this is the LOCAL-filesystem stand-in for a table-format
metadata commit (Delta/Iceberg/Hive ACID), which is the production
mechanism at cluster scale — object stores don't have atomic directory
rename, and concurrent readers that already listed files can still hit
removed files here. What this module does guarantee on a local FS:
a crash at ANY point leaves a recoverable state (the previous version
survives in either the live or the ``.old`` location, and ``recover``
restores it), and a reader that opens the live path between renames
fails loudly rather than reading a half-written mix.
"""

from __future__ import annotations

import os
import shutil


def _old(live_dir: str) -> str:
    return live_dir.rstrip("/") + ".old"


def recover(live_dir: str) -> None:
    """Heal a crash between publish's two renames: if the live dir is
    missing but the previous version survives at ``.old``, restore it.
    Call before reading or merging against ``live_dir``."""
    old_dir = _old(live_dir)
    if not os.path.exists(live_dir) and os.path.exists(old_dir):
        os.rename(old_dir, live_dir)


def publish(new_dir: str, live_dir: str) -> None:
    """Replace ``live_dir`` with ``new_dir`` by rename. The previous
    version is parked at ``.old`` until the new one is in place, so a
    crash anywhere leaves either the old or the new version
    recoverable (see ``recover``); only after the new version is live
    is the old copy deleted."""
    old_dir = _old(live_dir)
    if os.path.exists(old_dir):
        shutil.rmtree(old_dir)
    if os.path.exists(live_dir):
        os.rename(live_dir, old_dir)
    os.rename(new_dir, live_dir)
    if os.path.exists(old_dir):
        shutil.rmtree(old_dir)


def _scratch_name(prefix: str, partition: str) -> str:
    """Flatten a (possibly nested) partition path into a single hidden
    directory name: ``day=d1/hour=03`` -> ``.old_day=d1%2Fhour=03``.
    Keeps the scratch a SIBLING of the table's first level (no missing
    nested parents for os.rename) and dot-prefixed (hidden from
    Spark's listing and partition inference)."""
    return prefix + partition.strip("/").replace("/", "%2F")


def heal_partitions(table_dir: str) -> list[str]:
    """Restore any partition whose backfill crashed between the two
    renames: scan the table for ``.old_<partition>`` scratch dirs whose
    live partition is missing and rename them back. Returns the healed
    partition names. Call before reading a table that backfills might
    have touched — a read during the crash window otherwise SUCCEEDS
    and silently omits the in-flight partition (unlike a whole-table
    swap, where the missing live dir fails loudly)."""
    healed = []
    if not os.path.isdir(table_dir):
        return healed
    for name in os.listdir(table_dir):
        if not name.startswith(".old_"):
            continue
        partition = name[len(".old_"):].replace("%2F", "/")
        live = os.path.join(table_dir, partition)
        if not os.path.exists(live):
            os.rename(os.path.join(table_dir, name), live)
            healed.append(partition)
    return healed


def backfill_partition(
    new_part_df,
    table_dir: str,
    partition: str,
) -> None:
    """Idempotently replace ONE partition of a hive-partitioned table
    (``table_dir/<partition>/``, e.g. ``day=2024-01-05`` or the nested
    ``day=2024-01-05/hour=03``) with freshly recomputed rows — the
    backfill primitive: a late-arriving-data or bug-fix recompute
    touches exactly the affected partition, never rewrites the table,
    and publishes through the same staged-rename discipline.

    Crash semantics: at any point the previous partition survives —
    either live or parked at its hidden ``.old_`` scratch. The one
    window between the two renames is healed by the next backfill of
    the same partition or by :func:`heal_partitions`; NOTE that during
    that window a whole-table read succeeds WITHOUT the partition
    (partition dirs are independent), so readers that must be
    crash-consistent call heal_partitions() first.

    The staged write materializes BEFORE the live partition moves, so a
    recompute that reads the partition it replaces (delta + existing
    merge) is safe. At warehouse scale this is `INSERT OVERWRITE
    TABLE ... PARTITION (day=...)` / a table-format replaceWhere — the
    local stand-in keeps the identical semantics.

    Scratch directories live INSIDE the table but start with ``.``:
    Spark's file listing treats dot-prefixed paths as hidden, so a
    crash-window leftover can never surface as a phantom partition
    (a ``day=d1.old`` sibling would parse as partition value 'd1.old',
    and an underscore prefix is NOT enough — partition inference still
    reads ``_old_day=d1`` as a conflicting partition column). Nested
    partition paths are flattened into the scratch name (%2F) so the
    rename never needs a missing parent directory.
    """
    live = os.path.join(table_dir, partition)
    old = os.path.join(table_dir, _scratch_name(".old_", partition))
    staging = os.path.join(table_dir, _scratch_name(".staging_", partition))
    # heal a crash between a previous backfill's renames
    if not os.path.exists(live) and os.path.exists(old):
        os.rename(old, live)
    new_part_df.write.mode("overwrite").parquet(staging)
    if os.path.exists(old):
        shutil.rmtree(old)
    if os.path.exists(live):
        os.rename(live, old)
    os.rename(staging, live)
    if os.path.exists(old):
        shutil.rmtree(old)
    # a long-lived session caches the table's file listing; without the
    # refresh a post-swap read resolves the OLD file names and dies
    # with missing-file task failures
    new_part_df.sparkSession.catalog.refreshByPath(table_dir)

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

"""Minimal transactional table format over parquet: a versioned commit
log with snapshot-isolated reads, optimistic-concurrency commits, time
travel, and a retention-aware vacuum — the Delta/Iceberg-class protocol
core, pure stdlib (same vendoring move as ``sources/xlsx_lite.py``).

Why the directory-swap sinks (``sink/publish.py``) aren't enough: a
swap is correct for ONE writer and readers that tolerate a loud failure
window. With a compactor (T93) and a partition backfill (T98) running
beside long queries at 100 TB, readers need a STABLE view while files
are rewritten underneath them. The table-format answer, implemented
here:

- **Data files are immutable.** Writers only ever ADD new uniquely-named
  parquet files; logical deletes are manifest entries ("remove"), never
  unlinks. A reader that has resolved its snapshot's file list is
  untouched by any later commit — that IS snapshot isolation, no locks.
- **A commit is one atomic file creation.** Version N's manifest is
  materialized as ``_log/<N zero-padded>.json`` via write-temp +
  ``os.link`` (hard-link creation is atomic and fails if the name
  exists — the CAS). Two concurrent writers racing to version N: one
  wins, the other sees ``EEXIST``, re-reads the log, revalidates, and
  retries at N+1 — optimistic concurrency exactly as Delta's
  ``_delta_log`` protocol (Armbrust et al., VLDB 2020).
- **Conflict detection on retry.** An append commutes with anything and
  retries blindly. A remove-carrying commit (compaction, overwrite)
  revalidates that its removed files are still live at the new head; if
  a racing commit already removed one, the retry raises
  ``CommitConflict`` instead of resurrecting/double-removing files.
- **Time travel** = replay the manifests up to version V. Version N-1
  stays readable (bit-identical) after any compaction/overwrite until
  ``vacuum`` drops files unreferenced by the retained versions.
- **Crash safety.** A writer dying before its commit leaves orphan data
  files (never visible to readers — no manifest references them) and
  dot-prefixed manifest temps; both are swept by ``vacuum``. A writer
  dying after the link is a COMPLETE commit. There is no intermediate.

Scale notes: the log is O(commits) tiny JSON files and every read's
planning cost is one directory listing + manifest replay (checkpointable
at 10x more commits than any ETL round produces); data-file IO is
exactly the snapshot's file list, so partition/file pruning still comes
from parquet footers. On an object store without atomic link, the CAS
rename needs a coordination primitive (DynamoDB in Delta's S3 commit
service) — out of scope for the local stand-in, same caveat documented
in sink/publish.py.
"""

from __future__ import annotations

import json
import os
import shutil
import uuid

from pyspark.sql import DataFrame, SparkSession


class CommitConflict(RuntimeError):
    """A concurrent commit removed files this transaction also removes
    (or rewrote the table state it depended on); the caller must re-read
    and re-derive its writes."""


def _fmt_version(v: int) -> str:
    return f"{v:020d}.json"


class TableLog:
    """Handle on one logged table (``table_dir`` holds the data files,
    ``table_dir/_log`` the commit manifests)."""

    MAX_COMMIT_RETRIES = 50

    def __init__(self, table_dir: str):
        self.table_dir = table_dir.rstrip("/")
        self.log_dir = os.path.join(self.table_dir, "_log")
        os.makedirs(self.log_dir, exist_ok=True)

    # -- log primitives ---------------------------------------------------

    def versions(self) -> list[int]:
        out = []
        for name in os.listdir(self.log_dir):
            if name.endswith(".json") and not name.startswith("."):
                out.append(int(name[:-5]))
        return sorted(out)

    def latest_version(self) -> int | None:
        vs = self.versions()
        return vs[-1] if vs else None

    def _manifest(self, v: int) -> dict:
        with open(os.path.join(self.log_dir, _fmt_version(v))) as fh:
            return json.load(fh)

    def files(self, version: int | None = None) -> list[str]:
        """Replay the log up to ``version`` (latest if None): the
        snapshot's live data-file names, in first-added order."""
        head = self.latest_version() if version is None else version
        if head is None:
            return []
        live: dict[str, None] = {}  # insertion-ordered set
        for v in self.versions():
            if v > head:
                break
            m = self._manifest(v)
            for name in m.get("remove", ()):
                live.pop(name, None)
            for name in m.get("add", ()):
                live[name] = None
        return list(live)

    def _try_link(self, tmp: str, version: int) -> bool:
        final = os.path.join(self.log_dir, _fmt_version(version))
        try:
            os.link(tmp, final)
            return True
        except FileExistsError:
            return False
        except OSError:
            # filesystem without hard links: O_EXCL create-and-write is
            # the fallback CAS (commit contents are one small buffer)
            try:
                fd = os.open(final, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
            except FileExistsError:
                return False
            with os.fdopen(fd, "w") as fh:
                with open(tmp) as src:
                    fh.write(src.read())
            return True

    def commit(
        self,
        *,
        add: list[str] | None = None,
        remove: list[str] | None = None,
        op: str = "append",
    ) -> int:
        """Atomically publish one commit; returns the version written.
        Retries past racing writers (optimistic concurrency); raises
        :class:`CommitConflict` if a racer invalidated this commit's
        removes."""
        add = list(add or [])
        remove = list(remove or [])
        payload = json.dumps(
            {"op": op, "add": add, "remove": remove}, sort_keys=True
        )
        tmp = os.path.join(self.log_dir, f".tmp-{uuid.uuid4().hex}.json")
        with open(tmp, "w") as fh:
            fh.write(payload)
        try:
            for _ in range(self.MAX_COMMIT_RETRIES):
                head = self.latest_version()
                if remove:
                    # revalidate against the CURRENT head: every file this
                    # commit logically deletes must still be live
                    live = set(self.files(head))
                    gone = [f for f in remove if f not in live]
                    if gone:
                        raise CommitConflict(
                            f"files removed by a concurrent commit: {gone}"
                        )
                version = 0 if head is None else head + 1
                if self._try_link(tmp, version):
                    return version
            raise CommitConflict(
                f"no commit slot won in {self.MAX_COMMIT_RETRIES} retries"
            )
        finally:
            os.unlink(tmp)

    # -- data-file plumbing ------------------------------------------------

    def _land_files(self, df: DataFrame) -> list[str]:
        """Materialize ``df`` as immutable uniquely-named parquet files
        inside the table dir (NOT yet referenced by any manifest — a
        crash here leaves invisible orphans for vacuum)."""
        staging = os.path.join(self.table_dir, f".staging-{uuid.uuid4().hex}")
        df.write.mode("overwrite").parquet(staging)
        prefix = uuid.uuid4().hex
        names = []
        for i, part in enumerate(
            sorted(p for p in os.listdir(staging) if p.endswith(".parquet"))
        ):
            name = f"part-{prefix}-{i:05d}.parquet"
            os.rename(os.path.join(staging, part), os.path.join(self.table_dir, name))
            names.append(name)
        shutil.rmtree(staging)
        return names

    # -- table operations --------------------------------------------------

    def append(self, df: DataFrame) -> int:
        return self.commit(add=self._land_files(df), op="append")

    def overwrite(self, df: DataFrame) -> int:
        adds = self._land_files(df)
        return self.commit(add=adds, remove=self.files(), op="overwrite")

    def compact(self, spark: SparkSession, *, target_partitions: int = 1) -> int:
        """Rewrite the current snapshot into ``target_partitions`` files
        (T93's small-file compaction as a TRANSACTION): readers holding
        any prior snapshot keep bit-identical results because the old
        files stay on disk until vacuum."""
        current = self.files()
        compacted = self._land_files(
            self.read(spark).repartition(target_partitions)
        )
        return self.commit(add=compacted, remove=current, op="compact")

    def read(self, spark: SparkSession, version: int | None = None) -> DataFrame:
        """Snapshot read (time travel when ``version`` is given): the
        plan scans EXACTLY the snapshot's file list, so later commits —
        including compactions that logically remove these files — cannot
        change or break this frame."""
        names = self.files(version)
        if not names:
            raise ValueError(
                f"table {self.table_dir} has no committed data"
                + (f" at version {version}" if version is not None else "")
            )
        return spark.read.parquet(
            *[os.path.join(self.table_dir, n) for n in names]
        )

    def vacuum(self, *, keep_versions: int = 2) -> list[str]:
        """Delete data files unreferenced by ALL of the last
        ``keep_versions`` snapshots (plus stray staging/manifest temps).
        Readers may hold any retained snapshot; single-vacuum-at-a-time
        is assumed (the compactor owns it), as in every table format's
        retention story. Returns the deleted names."""
        vs = self.versions()
        retained = vs[-keep_versions:] if keep_versions > 0 else vs[-1:]
        referenced: set[str] = set()
        for v in retained:
            referenced.update(self.files(v))
        deleted = []
        for name in os.listdir(self.table_dir):
            full = os.path.join(self.table_dir, name)
            if name == "_log":
                continue
            if name.startswith(".staging-"):
                shutil.rmtree(full, ignore_errors=True)
                deleted.append(name)
            elif name.endswith(".parquet") and name not in referenced:
                os.unlink(full)
                deleted.append(name)
        for name in os.listdir(self.log_dir):
            if name.startswith(".tmp-"):
                os.unlink(os.path.join(self.log_dir, name))
        return deleted

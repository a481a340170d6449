"""Transactional table-log protocol tests: atomic CAS commits, conflict
detection, snapshot isolation under concurrent compaction, time travel,
retention vacuum, and crash-orphan invisibility."""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from c3dc_etl_spark.sink.tablelog import CommitConflict, TableLog

SF = "/root/testdata/sf0.001"


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def _orders(spark):
    from c3dc_etl_spark.suite.registry import load

    return load(spark, SF, "orders").select(
        "o_orderkey", "o_totalprice", "o_orderstatus"
    )


def test_append_compact_timetravel_roundtrip(spark, tmp_path):
    orders = _orders(spark)
    log = TableLog(str(tmp_path / "t"))
    v0 = log.append(orders.filter(F.col("o_orderstatus") == "F"))
    v1 = log.append(orders.filter(F.col("o_orderstatus") == "O"))
    assert (v0, v1) == (0, 1)
    pre = _rows(log.read(spark))
    v2 = log.compact(spark, target_partitions=1)
    assert v2 == 2
    # compaction changed the physical layout, not one row
    assert _rows(log.read(spark)) == pre
    # time travel to every prior version still works post-compaction
    assert _rows(log.read(spark, version=1)) == pre
    f_only = _rows(orders.filter(F.col("o_orderstatus") == "F"))
    assert _rows(log.read(spark, version=0)) == f_only


def test_snapshot_isolated_from_concurrent_compact_and_vacuum(spark, tmp_path):
    orders = _orders(spark)
    log = TableLog(str(tmp_path / "t"))
    log.append(orders.filter(F.col("o_orderstatus") == "F"))
    log.append(orders.filter(F.col("o_orderstatus") == "O"))
    expected = _rows(log.read(spark))
    # a reader resolves its snapshot (lazy plan over explicit files)...
    snap = log.read(spark)
    # ...then the compactor rewrites the table AND vacuums under it
    log.compact(spark, target_partitions=1)
    log.append(orders.filter(F.col("o_orderstatus") == "P"))
    deleted = log.vacuum(keep_versions=3)  # retains v1, v2, v3 file sets
    # nothing the retained snapshots reference was deleted
    assert _rows(snap) == expected
    # v1's files ARE v0+v1's appends, so this vacuum deleted nothing
    assert deleted == []
    # tighter retention really drops the pre-compaction files...
    deleted = log.vacuum(keep_versions=2)
    assert deleted
    # ...and the latest snapshot (compacted + P append) is untouched
    assert _rows(log.read(spark)) == _rows(orders)


def test_commit_cas_retries_past_racing_writer(spark, tmp_path):
    log = TableLog(str(tmp_path / "t"))
    log.commit(add=["a.parquet"], op="append")
    # a "racing writer" grabs version 1 directly
    with open(os.path.join(log.log_dir, f"{1:020d}.json"), "w") as fh:
        json.dump({"op": "append", "add": ["b.parquet"], "remove": []}, fh)
    v = log.commit(add=["c.parquet"], op="append")
    assert v == 2
    assert log.files() == ["a.parquet", "b.parquet", "c.parquet"]


def test_remove_conflict_is_detected_not_replayed(spark, tmp_path):
    log = TableLog(str(tmp_path / "t"))
    log.commit(add=["a.parquet", "b.parquet"], op="append")
    # compactor A removes a+b
    log.commit(add=["c.parquet"], remove=["a.parquet", "b.parquet"], op="compact")
    # compactor B, working from the stale snapshot, must NOT win
    with pytest.raises(CommitConflict):
        log.commit(add=["d.parquet"], remove=["a.parquet"], op="compact")
    assert log.files() == ["c.parquet"]


def test_crash_orphans_invisible_and_vacuumed(spark, tmp_path):
    orders = _orders(spark)
    log = TableLog(str(tmp_path / "t"))
    log.append(orders.limit(5))
    n = log.read(spark).count()
    # simulate a writer that died after landing files, before committing
    orphans = log._land_files(orders.limit(3))
    assert all(os.path.exists(os.path.join(log.table_dir, o)) for o in orphans)
    # readers never see them
    assert log.read(spark).count() == n
    deleted = log.vacuum(keep_versions=2)
    assert set(orphans) <= set(deleted)
    assert log.read(spark).count() == n


def test_read_empty_table_raises(spark, tmp_path):
    log = TableLog(str(tmp_path / "t"))
    with pytest.raises(ValueError):
        log.read(spark)
    with pytest.raises(ValueError):
        TableLog(str(tmp_path / "t2")).read(spark, version=5)

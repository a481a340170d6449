"""foreachBatch upsert sink: latest-wins merge, idempotent re-delivery,
multi-batch streaming drain, and checkpointed exactly-once resume."""

from __future__ import annotations

import os
import tempfile

import pytest

from c3dc_etl_spark.streaming.upsert import (
    read_snapshot,
    run_upsert_stream,
    upsert_latest,
)

SCHEMA = "k string, ver long, payload string"


def _snap(spark, snapshot_dir):
    return {
        (r["k"]): (r["ver"], r["payload"])
        for r in read_snapshot(spark, snapshot_dir).collect()
    }


def test_upsert_latest_wins_and_idempotent(spark):
    base = tempfile.mkdtemp(prefix="ups_unit_")
    snap = os.path.join(base, "snapshot")
    b1 = spark.createDataFrame(
        [("a", 1, "a1"), ("b", 1, "b1")], SCHEMA
    )
    b2 = spark.createDataFrame(
        [("a", 3, "a3"), ("c", 1, "c1")], SCHEMA
    )
    b3 = spark.createDataFrame(
        [("a", 2, "a2-late"), ("b", 2, "b2")], SCHEMA
    )
    for b in (b1, b2, b3):
        upsert_latest(b, snap, key_cols=["k"], order_cols=["ver"])
    expect = {"a": (3, "a3"), "b": (2, "b2"), "c": (1, "c1")}
    assert _snap(spark, snap) == expect
    # re-delivering an old batch (foreachBatch retry semantics) is a no-op
    upsert_latest(b2, snap, key_cols=["k"], order_cols=["ver"])
    upsert_latest(b3, snap, key_cols=["k"], order_cols=["ver"])
    assert _snap(spark, snap) == expect


def test_upsert_stream_multibatch_and_exactly_once_resume(spark):
    base = tempfile.mkdtemp(prefix="ups_stream_")
    backlog = os.path.join(base, "backlog")
    snap = os.path.join(base, "snapshot")
    ckpt = os.path.join(base, "ckpt")
    os.makedirs(backlog)
    rows = [
        [("a", 1, "a1"), ("b", 1, "b1")],
        [("a", 3, "a3"), ("c", 1, "c1")],
        [("a", 2, "late"), ("b", 2, "b2")],
    ]
    # one JSON-lines FILE per batch (the file source does not recurse
    # into per-batch parquet directories), mtime-pinned for batch order
    import json

    for i, rs in enumerate(rows):
        path = os.path.join(backlog, f"f{i}.json")
        with open(path, "w") as fh:
            for k, ver, payload in rs:
                fh.write(
                    json.dumps({"k": k, "ver": ver, "payload": payload}) + "\n"
                )
        os.utime(path, (1_700_000_000 + i, 1_700_000_000 + i))
    stream = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .json(backlog)
    )
    run_upsert_stream(stream, snap, ckpt, key_cols=["k"], order_cols=["ver"])
    expect = {"a": (3, "a3"), "b": (2, "b2"), "c": (1, "c1")}
    assert _snap(spark, snap) == expect
    # resume from the same checkpoint with no new files: nothing
    # reprocesses, the snapshot is byte-stable (exactly-once)
    stream2 = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .json(backlog)
    )
    run_upsert_stream(stream2, snap, ckpt, key_cols=["k"], order_cols=["ver"])
    assert _snap(spark, snap) == expect


def test_upsert_swap_preserves_previous_snapshot_on_plan_failure(spark):
    """A merge whose WRITE fails must leave the live snapshot intact
    (the staging write happens before any touch of the live dir)."""
    base = tempfile.mkdtemp(prefix="ups_crash_")
    snap = os.path.join(base, "snapshot")
    good = spark.createDataFrame([("a", 1, "a1")], SCHEMA)
    upsert_latest(good, snap, key_cols=["k"], order_cols=["ver"])
    bad = spark.createDataFrame([("a", 2, "boom")], SCHEMA).selectExpr(
        "k", "ver", "assert_true(payload <> 'boom') as payload"
    )
    try:
        upsert_latest(bad, snap, key_cols=["k"], order_cols=["ver"])
        raise AssertionError("expected the merge to fail")
    except Exception:
        pass
    assert _snap(spark, snap) == {"a": (1, "a1")}


def test_recover_heals_interrupted_swap(spark):
    """Simulate a crash between publish's two renames (live dir moved
    to .old, new one never arrived): the next merge/read must restore
    the previous snapshot instead of silently starting empty."""
    base = tempfile.mkdtemp(prefix="ups_recover_")
    snap = os.path.join(base, "snapshot")
    upsert_latest(
        spark.createDataFrame([("a", 1, "a1")], SCHEMA),
        snap,
        key_cols=["k"],
        order_cols=["ver"],
    )
    os.rename(snap, snap + ".old")  # the mid-swap crash state
    assert _snap(spark, snap) == {"a": (1, "a1")}  # read_snapshot recovers
    os.rename(snap, snap + ".old")
    upsert_latest(
        spark.createDataFrame([("b", 1, "b1")], SCHEMA),
        snap,
        key_cols=["k"],
        order_cols=["ver"],
    )
    # the pre-crash key survived the merge — no silent state loss
    assert _snap(spark, snap) == {"a": (1, "a1"), "b": (1, "b1")}


def test_tablelog_cdc_stream_exactly_once_and_txn_dedup(spark):
    """CDC drain through the transactional table log: multi-batch
    latest-wins merge, a checkpointed resume reprocessing nothing, and
    the log's OWN txn high-water mark rejecting a manually re-delivered
    batch even without the streaming checkpoint."""
    import json

    from c3dc_etl_spark.sink.tablelog import CommitConflict, TableLog
    from c3dc_etl_spark.streaming.upsert import run_upsert_stream_tablelog

    base = tempfile.mkdtemp(prefix="ups_tlog_")
    backlog = os.path.join(base, "backlog")
    table = os.path.join(base, "table")
    ckpt = os.path.join(base, "ckpt")
    os.makedirs(backlog)
    rows = [
        [("a", 1, "a1"), ("b", 1, "b1")],
        [("a", 3, "a3"), ("c", 1, "c1")],
        [("a", 2, "late"), ("b", 2, "b2")],
    ]
    for i, rs in enumerate(rows):
        path = os.path.join(backlog, f"f{i}.json")
        with open(path, "w") as fh:
            for k, ver, payload in rs:
                fh.write(
                    json.dumps({"k": k, "ver": ver, "payload": payload}) + "\n"
                )
        os.utime(path, (1_700_000_000 + i, 1_700_000_000 + i))

    def _stream():
        return (
            spark.readStream.schema(SCHEMA)
            .option("maxFilesPerTrigger", 1)
            .json(backlog)
        )

    run_upsert_stream_tablelog(
        _stream(), table, ckpt, key_cols=["k"], order_cols=["ver"]
    )
    log = TableLog(table, stats_col="k")
    got = {
        r["k"]: (r["ver"], r["payload"]) for r in log.read(spark).collect()
    }
    # NOTE: unlike the snapshot sink, per-batch merges apply IN ORDER:
    # batch 2's ("a", 2, "late") arrives after ("a", 3) is live and the
    # merge replaces matched keys — latest-BATCH-wins, the CDC apply
    # contract (change order == delivery order)
    assert got == {"a": (2, "late"), "b": (2, "b2"), "c": (1, "c1")}
    # one merge commit per batch, each carrying its txn id
    assert log.last_txn(f"cdc:{ckpt}") == 2
    # resume with the same checkpoint: no new batches, table untouched
    v = log.latest_version()
    run_upsert_stream_tablelog(
        _stream(), table, ckpt, key_cols=["k"], order_cols=["ver"]
    )
    assert log.latest_version() == v
    # manual re-delivery of an old batch id: the LOG rejects it
    stale = spark.createDataFrame([("a", 9, "replay")], SCHEMA)
    try:
        log.merge_upsert(spark, stale, "k", txn=(f"cdc:{ckpt}", 1))
        raise AssertionError("expected CommitConflict on replayed txn")
    except CommitConflict:
        pass
    got2 = {
        r["k"]: (r["ver"], r["payload"]) for r in log.read(spark).collect()
    }
    assert got2 == got


def test_windowed_agg_tablelog_sink_epochs_updates_exactly_once(spark):
    """Round-11 growth tier: windowed aggregate -> tablelog MERGE sink.
    Three epochs (maxFilesPerTrigger=1): epoch 0 opens window W/a=2,
    epoch 1 opens W2/b, epoch 2 delivers a LATE-but-in-watermark row
    that must UPDATE W/a to 3 through a new merge commit. Then the
    exactly-once battery: checkpointed resume reprocesses nothing, and
    a manually re-delivered epoch id is rejected by the log's txn
    high-water mark."""
    import json

    from pyspark.sql import functions as F

    from c3dc_etl_spark.sink.tablelog import CommitConflict, TableLog
    from c3dc_etl_spark.streaming.upsert import run_windowed_agg_stream_tablelog

    spark.conf.set("spark.sql.session.timeZone", "UTC")
    base = tempfile.mkdtemp(prefix="aggsink_unit_")
    backlog = os.path.join(base, "backlog")
    table = os.path.join(base, "table")
    ckpt = os.path.join(base, "ckpt")
    os.makedirs(backlog)
    batches = [
        [("2026-01-01 10:00:00", "a"), ("2026-01-01 11:00:00", "a")],
        [("2026-01-02 01:00:00", "b")],
        # late for window 2026-01-01 but inside the 1-day watermark
        # (wm = 2026-01-02 01:00 - 1 day = 01-01 01:00 <= 23:00)
        [("2026-01-01 23:00:00", "a")],
    ]
    for i, rs in enumerate(batches):
        path = os.path.join(backlog, f"f{i}.json")
        with open(path, "w") as fh:
            for ts, et in rs:
                fh.write(json.dumps({"ts": ts, "event_type": et}) + "\n")
        os.utime(path, (1_700_000_000 + i, 1_700_000_000 + i))

    def _agg():
        stream = (
            spark.readStream.schema("ts timestamp, event_type string")
            .option("maxFilesPerTrigger", 1)
            .json(backlog)
        )
        return (
            stream.withWatermark("ts", "1 day")
            .groupBy(F.window("ts", "1 day"), F.col("event_type"))
            .agg(F.count(F.lit(1)).cast("bigint").alias("n_events"))
            .select(
                F.unix_micros(F.col("window.start")).alias("win_start_us"),
                "event_type",
                "n_events",
            )
            .withColumn(
                "k",
                F.concat(
                    F.col("win_start_us").cast("string"),
                    F.lit(":"),
                    F.col("event_type"),
                ),
            )
        )

    run_windowed_agg_stream_tablelog(_agg(), table, ckpt, key_col="k")
    log = TableLog(table, stats_col="k")
    day1 = 1_767_225_600_000_000  # 2026-01-01 UTC epoch micros
    day2 = day1 + 86_400_000_000
    got = {
        (r["win_start_us"], r["event_type"]): r["n_events"]
        for r in log.read(spark).collect()
    }
    # the late row UPDATED the already-committed window: 2 -> 3
    assert got == {(day1, "a"): 3, (day2, "b"): 1}
    # one merge commit per epoch that changed something
    app = f"aggsink:{ckpt}"
    assert log.last_txn(app) == 2
    assert [log._manifest(v)["op"] for v in log.versions()].count("merge") >= 2
    # resume from the same checkpoint: no new epochs, table untouched
    v = log.latest_version()
    run_windowed_agg_stream_tablelog(_agg(), table, ckpt, key_col="k")
    assert log.latest_version() == v
    # manual re-delivery of an old epoch id: the LOG rejects it
    stale = spark.createDataFrame(
        [(day1, "a", 99, f"{day1}:a")],
        "win_start_us bigint, event_type string, n_events bigint, k string",
    )
    with pytest.raises(CommitConflict):
        log.merge_upsert(spark, stale, "k", txn=(app, 1))
    got2 = {
        (r["win_start_us"], r["event_type"]): r["n_events"]
        for r in log.read(spark).collect()
    }
    assert got2 == got

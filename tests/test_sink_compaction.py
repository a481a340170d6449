"""Corpus shard compaction: row preservation, target sizing, atomic swap."""

from __future__ import annotations

import os
import tempfile

from c3dc_etl_spark.sink.corpus import (
    compact_shards,
    read_training_shards,
    shard_manifest,
    write_training_shards,
)
from c3dc_etl_spark.suite.registry import load

SF = "/root/testdata/sf0.001"


def test_compaction_preserves_rows_and_resizes(spark):
    out = os.path.join(tempfile.mkdtemp(prefix="compact_"), "corpus")
    docs = load(spark, SF, "documents").select("doc_id", "text", "source")
    n = docs.count()
    # deliberately over-sharded: tiny-file storm
    write_training_shards(docs, out, num_shards=16)
    assert shard_manifest(spark, out).count() == 16
    before = {r["doc_id"] for r in read_training_shards(spark, out).collect()}

    new_shards = compact_shards(spark, out, target_rows_per_shard=(n + 3) // 4)
    assert new_shards == 4
    manifest = shard_manifest(spark, out).collect()
    assert len(manifest) == 4
    after = {r["doc_id"] for r in read_training_shards(spark, out).collect()}
    assert after == before
    # no leftover staging/old dirs: the swap completed
    parent = os.path.dirname(out)
    assert sorted(os.listdir(parent)) == ["corpus"]
    # shards are balanced within the hash-fold tolerance
    counts = [m["n_rows"] for m in manifest]
    assert max(counts) <= 2 * (n // 4 + 1)


def test_compaction_is_idempotent(spark):
    out = os.path.join(tempfile.mkdtemp(prefix="compact2_"), "corpus")
    docs = load(spark, SF, "documents").select("doc_id", "text")
    write_training_shards(docs, out, num_shards=8)
    n = docs.count()
    k1 = compact_shards(spark, out, target_rows_per_shard=(n + 1) // 2)
    k2 = compact_shards(spark, out, target_rows_per_shard=(n + 1) // 2)
    assert k1 == k2 == 2
    rows = read_training_shards(spark, out).groupBy("shard").count().collect()
    assert len(rows) == 2


def test_backfill_replaces_single_partition(spark):
    import tempfile

    from c3dc_etl_spark.sink.publish import backfill_partition

    base = os.path.join(tempfile.mkdtemp(prefix="backfill_"), "table")
    df = spark.createDataFrame(
        [(1, "a", "d1"), (2, "b", "d1"), (3, "c", "d2")],
        "id long, v string, day string",
    )
    df.write.partitionBy("day").parquet(base)

    fixed = spark.createDataFrame([(1, "a2"), (2, "b2")], "id long, v string")
    backfill_partition(fixed, base, "day=d1")

    got = {
        (r["id"], r["v"], r["day"])
        for r in spark.read.parquet(base).collect()
    }
    # d1 fully replaced, d2 untouched
    assert got == {(1, "a2", "d1"), (2, "b2", "d1"), (3, "c", "d2")}

    # idempotent: running the same backfill again changes nothing
    backfill_partition(fixed, base, "day=d1")
    got2 = {
        (r["id"], r["v"], r["day"])
        for r in spark.read.parquet(base).collect()
    }
    assert got2 == got

    # interrupted swap heals: live partition parked at the
    # dot-prefixed scratch (invisible to partition discovery),
    # and the next backfill restores it before merging
    live = os.path.join(base, "day=d1")
    os.rename(live, os.path.join(base, ".old_day=d1"))
    # a table read during the crash window sees NO phantom partition
    assert {r["day"] for r in spark.read.parquet(base).collect()} == {"d2"}
    backfill_partition(fixed, base, "day=d1")
    assert {
        (r["id"], r["v"]) for r in spark.read.parquet(live).collect()
    } == {(1, "a2"), (2, "b2")}


def test_backfill_nested_partition_and_heal(spark):
    import tempfile

    from c3dc_etl_spark.sink.publish import backfill_partition, heal_partitions

    base = os.path.join(tempfile.mkdtemp(prefix="backfill_nested_"), "table")
    df = spark.createDataFrame(
        [(1, "d1", "h1"), (2, "d1", "h2"), (3, "d2", "h1")],
        "id long, day string, hour string",
    )
    df.write.partitionBy("day", "hour").parquet(base)

    fixed = spark.createDataFrame([(9,)], "id long")
    # nested partition path: scratch names must flatten, not need a
    # missing parent directory
    backfill_partition(fixed, base, "day=d1/hour=h2")
    got = {
        (r["id"], r["day"], r["hour"])
        for r in spark.read.parquet(base).collect()
    }
    assert got == {(1, "d1", "h1"), (9, "d1", "h2"), (3, "d2", "h1")}

    # crash window: live partition parked at its flattened scratch;
    # heal_partitions restores it without re-running the backfill
    live = os.path.join(base, "day=d1", "hour=h2")
    os.rename(live, os.path.join(base, ".old_day=d1%2Fhour=h2"))
    assert heal_partitions(base) == ["day=d1/hour=h2"]
    spark.catalog.refreshByPath(base)
    assert {
        (r["id"], r["day"], r["hour"])
        for r in spark.read.parquet(base).collect()
    } == got

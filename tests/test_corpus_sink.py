"""Tests for the sharded training-corpus sink."""

from __future__ import annotations

import glob

from pyspark.sql import functions as F

from c3dc_etl_spark.sink.corpus import (
    read_training_shards,
    shard_column,
    shard_manifest,
    write_training_shards,
)

SF = "/root/testdata/sf0.001"


def _docs(spark):
    return spark.read.parquet(f"{SF}/documents.parquet")


def test_write_read_roundtrip_and_layout(spark, tmp_path):
    out = str(tmp_path / "corpus")
    docs = _docs(spark)
    write_training_shards(docs, out, num_shards=4)
    dirs = sorted(glob.glob(out + "/shard=*"))
    assert [d.rsplit("=", 1)[1] for d in dirs] == ["0", "1", "2", "3"]
    back = read_training_shards(spark, out)
    assert back.count() == docs.count()
    assert set(back.columns) == set(docs.columns) | {"shard"}


def test_shard_assignment_deterministic_and_partition_invariant(spark):
    docs = _docs(spark)
    a = {
        r["doc_id"]: r["s"]
        for r in docs.select(
            "doc_id", shard_column("doc_id", 8).alias("s")
        ).collect()
    }
    b = {
        r["doc_id"]: r["s"]
        for r in docs.repartition(7)
        .select("doc_id", shard_column("doc_id", 8).alias("s"))
        .collect()
    }
    assert a == b
    assert all(0 <= s < 8 for s in a.values())
    # balanced-ish: no shard holds more than 3x the fair share
    counts: dict[int, int] = {}
    for s in a.values():
        counts[s] = counts.get(s, 0) + 1
    assert max(counts.values()) < 3 * (len(a) / 8)


def test_rows_sorted_within_shard_files(spark, tmp_path):
    out = str(tmp_path / "corpus")
    write_training_shards(_docs(spark), out, num_shards=2)
    for d in glob.glob(out + "/shard=*"):
        for f in glob.glob(d + "/*.parquet"):
            ids = [r["doc_id"] for r in spark.read.parquet(f).collect()]
            assert ids == sorted(ids)


def test_shard_filter_prunes_partitions(spark, tmp_path):
    out = str(tmp_path / "corpus")
    write_training_shards(_docs(spark), out, num_shards=4)
    one = read_training_shards(spark, out, shards=[2])
    assert one.select("shard").distinct().collect()[0]["shard"] == 2
    plan = one._jdf.queryExecution().executedPlan().toString()
    # partition pruning: the shard predicate lands in PartitionFilters,
    # not a post-scan Filter
    assert "PartitionFilters: [" in plan and "shard" in plan.split(
        "PartitionFilters:"
    )[1].split("]")[0]


def test_manifest_counts(spark, tmp_path):
    out = str(tmp_path / "corpus")
    docs = _docs(spark)
    write_training_shards(docs, out, num_shards=4)
    man = {r["shard"]: r["n_rows"] for r in shard_manifest(spark, out).collect()}
    assert sum(man.values()) == docs.count()
    assert set(man) == {0, 1, 2, 3}


def test_rewrite_is_reproducible(spark, tmp_path):
    docs = _docs(spark)
    out1, out2 = str(tmp_path / "c1"), str(tmp_path / "c2")
    write_training_shards(docs, out1, num_shards=4)
    write_training_shards(docs.repartition(11), out2, num_shards=4)
    a = sorted(
        (r["shard"], r["doc_id"])
        for r in read_training_shards(spark, out1).select("shard", "doc_id").collect()
    )
    b = sorted(
        (r["shard"], r["doc_id"])
        for r in read_training_shards(spark, out2).select("shard", "doc_id").collect()
    )
    assert a == b

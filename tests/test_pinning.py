"""Persist/unpersist hygiene: pinned multi-consumer intermediates are
registered and released, so long-lived sessions running many suite
queries do not accumulate persisted blocks (VERDICT r3 hygiene item)."""

from __future__ import annotations

from pyspark.sql import functions as F

from c3dc_etl_spark import pinning
from c3dc_etl_spark.operators.dedup import minhash_lsh_candidates


def _persistent_rdd_ids(spark) -> set:
    jmap = spark.sparkContext._jsc.getPersistentRDDs()
    return {int(k) for k in jmap.keySet().toArray()}


def test_pin_release_drops_blocks(spark):
    """Identity-based, not count-based: earlier tests' localCheckpoint
    RDDs are unpersisted ASYNCHRONOUSLY by the ContextCleaner, so a raw
    before/after count can shrink concurrently and flake. The pin's own
    RDD ids appearing and then vanishing is the contract."""
    pinning.release_pinned()  # isolate from any earlier query's pins
    base_ids = _persistent_rdd_ids(spark)
    df = spark.createDataFrame(
        [(i, f"some shared text body {i % 3} repeated tokens") for i in range(40)],
        "doc_id long, text string",
    )
    pairs = minhash_lsh_candidates(df, "text", "doc_id")
    pairs.collect()
    assert pinning.pinned_count() >= 1
    new_ids = _persistent_rdd_ids(spark) - base_ids
    assert new_ids, "pin added no persistent blocks"
    released = pinning.release_pinned()
    assert released >= 1
    assert pinning.pinned_count() == 0
    assert not (new_ids & _persistent_rdd_ids(spark)), (
        "released pin left persistent blocks behind"
    )


def test_release_is_correctness_neutral(spark):
    pinning.release_pinned()
    df = spark.createDataFrame(
        [(i, f"body {i % 5} tokens shared across docs") for i in range(30)],
        "doc_id long, text string",
    )
    pairs = minhash_lsh_candidates(df, "text", "doc_id")
    before = sorted(tuple(r) for r in pairs.collect())
    pinning.release_pinned()
    # re-collect AFTER release: plain persists recompute, same rows
    after = sorted(tuple(r) for r in pairs.collect())
    assert before == after
    pinning.release_pinned()


def test_registry_wrapper_releases_previous_pins(spark):
    from c3dc_etl_spark.suite import REGISTRY

    sf = "/root/testdata/sf0.001"
    REGISTRY["dedup_minhash_lsh"].fn(spark, sf).collect()
    assert pinning.pinned_count() >= 1
    # entering ANY registered query releases the previous query's pins
    REGISTRY["q1_pricing_summary"].fn(spark, sf).collect()
    assert pinning.pinned_count() == 0
    pinning.release_pinned()


def test_pin_accepts_storage_level(spark):
    from pyspark import StorageLevel

    df = pinning.pin(
        spark.range(10).select(F.col("id")), StorageLevel.MEMORY_ONLY
    )
    df.count()
    assert pinning.pinned_count() >= 1
    pinning.release_pinned()
    assert pinning.pinned_count() == 0

"""Skew-salting primitives: results must equal the unsalted plans."""

from __future__ import annotations

from pyspark.sql import functions as F

from c3dc_etl_spark.operators.skew import salted_collect_sorted, salted_join


def test_salted_join_matches_plain_join(spark):
    # one hot key ('h') with many fact rows + cold keys
    facts = spark.createDataFrame(
        [(i, "h" if i % 3 else f"k{i % 7}") for i in range(500)],
        "fact_id long, key string",
    )
    dim = spark.createDataFrame(
        [("h", "hot"), ("k1", "one"), ("k2", "two")], "key string, label string"
    )
    plain = {(r["fact_id"], r["label"]) for r in facts.join(dim, "key").collect()}
    salted = {
        (r["fact_id"], r["label"])
        for r in salted_join(
            facts, dim, "key", salt_factor=8, salt_identity="fact_id"
        ).collect()
    }
    assert salted == plain and len(plain) > 300


def test_salted_collect_matches_plain_collect(spark):
    df = spark.createDataFrame(
        [(f"u{i % 5}", f"v{i:03d}") for i in range(200)], "key string, v string"
    )
    plain = {
        r["key"]: sorted(r["vs"])
        for r in df.groupBy("key").agg(F.collect_list("v").alias("vs")).collect()
    }
    salted = {
        r["key"]: r["vs"]
        for r in salted_collect_sorted(df, "key", "v", salt_factor=4).collect()
    }
    assert salted == plain


def test_bucketed_join_skips_shuffle(spark, tmp_path):
    from c3dc_etl_spark.operators.bucketing import (
        bucketed_join_is_shuffle_free,
        write_bucketed,
    )

    a = spark.range(0, 1000).selectExpr("id AS k", "id * 2 AS va")
    b = spark.range(0, 1000).selectExpr("id AS k", "id * 3 AS vb")
    write_bucketed(a, "bt_a", bucket_cols=["k"], buckets=8, sort_cols=["k"])
    write_bucketed(b, "bt_b", bucket_cols=["k"], buckets=8, sort_cols=["k"])
    try:
        # co-located: the join plan contains no hash-partitioning exchange
        assert bucketed_join_is_shuffle_free(spark, "bt_a", "bt_b", "k")
        joined = spark.table("bt_a").join(spark.table("bt_b"), "k")
        assert joined.count() == 1000
        # contrast: the same sort-merge join over unbucketed frames
        # DOES shuffle both sides
        plain = a.hint("merge").join(b, "k")
        plan = plain._jdf.queryExecution().executedPlan().toString()
        assert "Exchange hashpartitioning" in plan
    finally:
        spark.sql("DROP TABLE IF EXISTS bt_a")
        spark.sql("DROP TABLE IF EXISTS bt_b")


def test_drop_oversized_groups_semantics_and_plan(spark):
    from c3dc_etl_spark.operators.dedup import drop_oversized_groups

    df = spark.createDataFrame(
        [(i, "hot" if i < 90 else f"cold{i % 5}") for i in range(100)],
        "id long, band string",
    )
    capped = drop_oversized_groups(df, ["band"], cap=10)
    rows = capped.collect()
    # the 90-row hot band is gone; each cold band (2 rows) survives intact
    assert {r["band"] for r in rows} == {f"cold{j}" for j in range(5)}
    assert len(rows) == 10
    # scale property: the cap must NOT be a Window.partitionBy count
    # (single-task hot partition) — it should plan as an aggregate +
    # broadcast anti-join
    plan = capped._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan
    assert "BroadcastHashJoin" in plan and "LeftAnti" in plan


def test_minhash_plan_has_no_window(spark):
    """The LSH band cap (and every other bucket cap) must stay
    window-free — a regression here reintroduces the hot-band
    straggler."""
    from c3dc_etl_spark.operators.dedup import minhash_lsh_candidates

    docs = spark.createDataFrame(
        [(i, f"some text body number {i % 7} repeated tokens") for i in range(50)],
        "doc_id long, text string",
    )
    pairs = minhash_lsh_candidates(
        docs, "text", "doc_id", num_hashes=8, bands=2, max_bucket_size=10
    )
    plan = pairs._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan


def test_spread_is_conditional(spark):
    """spread() must not shuffle an already-well-partitioned input —
    at corpus scale an unconditional repartition(parallelism) is a full
    shuffle DOWN."""
    from c3dc_etl_spark.operators.dedup import spread

    target = spark.sparkContext.defaultParallelism
    narrow = spark.createDataFrame([(i,) for i in range(10)], "id long").coalesce(1)
    assert spread(narrow).rdd.getNumPartitions() == target
    wide = spark.range(1000).repartition(target * 2)
    assert spread(wide) is wide  # untouched, no exchange added

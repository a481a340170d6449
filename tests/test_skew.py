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

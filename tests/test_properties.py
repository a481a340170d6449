"""Property-based tests (hypothesis) over the engine's core expression
laws — a layer the reference's test suite lacks entirely. Example
counts are kept small because every example is a real Spark job."""

from __future__ import annotations

import math

from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F

from c3dc_etl_spark.functions.columns import (
    deterministic_uuid,
    int_round,
    race_merge,
    split_multi,
)
from c3dc_etl_spark.mapping.compiler import match_predicate
from c3dc_etl_spark.merge import canonical_fingerprint
from c3dc_etl_spark.schema.registry import SchemaRegistry

REG = SchemaRegistry()
RACE_PVS = REG.enum_values("participant", "race")

TEXT = st.text(
    alphabet=" ;abcXYZ019é",
    max_size=40,
)
SETTINGS = dict(max_examples=12, deadline=None)


@given(x=st.floats(min_value=-1e9, max_value=1e9, allow_nan=False))
@settings(**SETTINGS)
def test_int_round_is_half_up(spark, x):
    df = spark.createDataFrame([(x,)], "v double")
    got = df.select(int_round(F.col("v")).alias("r")).collect()[0]["r"]
    assert got == math.floor(x + 0.5)


@given(s=TEXT)
@settings(**SETTINGS)
def test_split_multi_sorted_distinct_trimmed(spark, s):
    df = spark.createDataFrame([(s,)], "v string")
    arr = df.select(split_multi(F.col("v")).alias("a")).collect()[0]["a"]
    assert arr == sorted(set(arr))          # sorted + distinct
    assert all(a == a.strip() and a != "" for a in arr)  # trimmed, no blanks
    assert all(a in s for a in arr)         # every element came from the cell


@given(race=TEXT, eth=TEXT)
@settings(**SETTINGS)
def test_race_merge_emits_sorted_pv_subset(spark, race, eth):
    df = spark.createDataFrame([(race, eth)], "r string, e string")
    arr = df.select(race_merge(F.col("r"), F.col("e"), RACE_PVS).alias("a")).collect()[0]["a"]
    assert arr == sorted(set(arr))
    assert all(a in RACE_PVS for a in arr)  # only schema casings escape


@given(s=TEXT)
@settings(**SETTINGS)
def test_wildcard_predicates(spark, s):
    df = spark.createDataFrame([(s,)], "c string")
    star = df.select(match_predicate(["c"], "*").alias("v")).collect()[0]["v"]
    plus = df.select(match_predicate(["c"], "+").alias("v")).collect()[0]["v"]
    assert star is True
    assert plus == (s.strip() != "")


@given(seed=st.text(alphabet="ab12", max_size=6), ident=TEXT)
@settings(**SETTINGS)
def test_uuid_shape_and_determinism(spark, seed, ident):
    df = spark.createDataFrame([(ident,)], "i string")
    col = deterministic_uuid(F.col("i"), seed=seed)
    a = df.select(col.alias("u")).collect()[0]["u"]
    b = df.select(col.alias("u")).collect()[0]["u"]
    assert a == b
    parts = a.split("-")
    assert [len(p) for p in parts] == [8, 4, 4, 4, 12]
    assert parts[2][0] == "4" and parts[3][0] == "8"


@given(
    payload=TEXT,
    id_a=st.text(alphabet="xyz9", min_size=1, max_size=8),
    id_b=st.text(alphabet="pqr8", min_size=1, max_size=8),
)
@settings(**SETTINGS)
def test_fingerprint_invariant_under_volatile_ids(spark, payload, id_a, id_b):
    schema = "diagnosis_id string, `participant.participant_id` string, diagnosis_comment string"
    df = spark.createDataFrame(
        [(id_a, id_a, payload), (id_b, id_b, payload)], schema
    )
    fp = canonical_fingerprint("diagnosis", REG, frame_columns=df.columns)
    a, b = [r[0] for r in df.select(fp).collect()]
    assert a == b


@given(
    vals=st.lists(st.integers(min_value=0, max_value=3), min_size=1,
                  max_size=40),
    bins=st.integers(min_value=1, max_value=12),
    tie_buckets=st.integers(min_value=1, max_value=7),
    id_scale=st.sampled_from([1, 17, 1000003]),
)
@settings(max_examples=12, deadline=None)
def test_exact_ntile_matches_window_ntile(
    spark, vals, bins, tie_buckets, id_scale
):
    """exact_ntile == NTILE(B) OVER (ORDER BY value, id) for ANY
    multiset of heavily-tied values, any bucket count, any tie-bucket
    geometry, and sparse or dense id spacing (id_scale stretches the id
    domain so bucket widths vary wildly)."""
    from pyspark.sql import Window

    from c3dc_etl_spark.operators.quality import exact_ntile

    rows = [(i * id_scale, v) for i, v in enumerate(vals)]
    df = spark.createDataFrame(rows, "doc_id long, n_chars int")
    want = {
        tuple(x)
        for x in df.select(
            "doc_id",
            F.ntile(bins)
            .over(Window.orderBy("n_chars", "doc_id"))
            .cast("bigint")
            .alias("bin"),
        ).collect()
    }
    got = {
        tuple(x)
        for x in exact_ntile(
            df, "n_chars", "doc_id", bins, tie_buckets=tie_buckets
        ).select("doc_id", "bin").collect()
    }
    assert got == want

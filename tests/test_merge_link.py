"""Merge-layer + link-wiring unit tests (D1/D2, R5)."""

from __future__ import annotations

from pyspark.sql import functions as F

from c3dc_etl_spark.link import wire_links
from c3dc_etl_spark.merge import (
    canonical_fingerprint,
    first_wins_merge,
    reconciliation_counts,
)
from c3dc_etl_spark.schema.registry import SchemaRegistry

REG = SchemaRegistry()


def _fps(spark, rows, schema, node="diagnosis"):
    df = spark.createDataFrame(rows, schema)
    fp = canonical_fingerprint(node, REG, frame_columns=df.columns)
    return [r[0] for r in df.select(fp).collect()]


def test_fingerprint_ignores_own_and_link_ids(spark):
    schema = (
        "diagnosis_id string, `participant.participant_id` string, "
        "diagnosis string, age_at_diagnosis long"
    )
    a, b, c = _fps(
        spark,
        [
            ("d1", "p1", "8000/0 : Neoplasm, benign", 10),
            ("d2", "p9", "8000/0 : Neoplasm, benign", 10),  # only ids differ
            ("d3", "p1", "8000/0 : Neoplasm, benign", 11),  # content differs
        ],
        schema,
    )
    assert a == b
    assert a != c


def test_fingerprint_sorts_arrays_and_handles_null(spark):
    schema = "diagnosis_id string, anatomic_site array<string>, diagnosis string"
    a, b, c = _fps(
        spark,
        [
            ("d1", ["C71.9 : Brain, NOS", "C42.1 : Bone marrow"], "x"),
            ("d2", ["C42.1 : Bone marrow", "C71.9 : Brain, NOS"], "x"),  # order-insensitive
            ("d3", None, "x"),
        ],
        schema,
    )
    assert a == b
    assert a != c


def test_fingerprint_reference_file_volatile_guid(spark):
    schema = "reference_file_id string, file_name string, dcf_indexd_guid string"
    rows = [("r1", "f.json", "guid-AAA"), ("r2", "f.json", "guid-BBB")]
    df = spark.createDataFrame(rows, schema)
    fp = canonical_fingerprint("reference_file", REG, frame_columns=df.columns)
    got = [r[0] for r in df.select(fp).collect()]
    assert got[0] == got[1]  # dcf_indexd_guid blanked per reference


def test_first_wins_merge_ordinal_and_tiebreak(spark):
    schema = "diagnosis_id string, participant_id string, diagnosis string"
    t1 = spark.createDataFrame(
        [("a2", "p1", "dx"), ("a1", "p1", "dx")], schema  # same content twice
    )
    t2 = spark.createDataFrame([("b1", "p1", "dx"), ("b9", "p2", "dx")], schema)
    merged = first_wins_merge([t1, t2], "diagnosis", REG, key_cols=("participant_id",))
    rows = {(r["participant_id"]): r for r in merged.collect()}
    assert rows["p1"]["diagnosis_id"] == "a1"  # ord 1 wins, min-id tiebreak
    assert rows["p1"]["won_ord"] == 1
    assert rows["p2"]["diagnosis_id"] == "b9"  # only in ord 2
    assert rows["p2"]["won_ord"] == 2


def test_reconciliation_counts_match(spark):
    schema = "diagnosis_id string, participant_id string, diagnosis string"
    t1 = spark.createDataFrame([("a1", "p1", "dx1"), ("a2", "p2", "dx2")], schema)
    t2 = spark.createDataFrame([("b1", "p1", "dx1"), ("b2", "p3", "dx3")], schema)
    merged = first_wins_merge([t1, t2], "diagnosis", REG)
    row = reconciliation_counts(merged, [t1, t2], "diagnosis", REG).collect()[0]
    assert row["distinct_unmerged"] == row["distinct_merged"] == 3


def test_wire_links_builds_sorted_child_arrays(spark):
    participants = spark.createDataFrame(
        [("p1",), ("p2",)], "participant_id string"
    )
    diagnoses = spark.createDataFrame(
        [("d2", "p1"), ("d1", "p1"), ("d3", "p2")],
        ["diagnosis_id", "participant.participant_id"],
    )
    wired = wire_links({"participant": participants, "diagnosis": diagnoses}, REG)
    rows = {r["participant_id"]: r for r in wired["participant"].collect()}
    assert rows["p1"]["diagnosis.diagnosis_id"] == ["d1", "d2"]  # sorted (O2)
    assert rows["p2"]["diagnosis.diagnosis_id"] == ["d3"]
    # child frame untouched
    assert set(wired["diagnosis"].columns) == set(diagnoses.columns)

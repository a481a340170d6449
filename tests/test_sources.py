"""Sources-layer unit tests (S1-S13 logic)."""

from __future__ import annotations

import pathlib

import pytest

from c3dc_etl_spark.mapping.model import load_mappings
from c3dc_etl_spark.sources import (
    duplicate_keys,
    load_transformations,
    normalize_path,
    read_delimited,
    read_lookup_map,
    read_manifest,
    read_subject_documents,
    read_subject_documents_collated,
    route_tabs,
)
from c3dc_etl_spark.sources.workbook import truncate_sheet_name

FIXTURES = pathlib.Path(__file__).resolve().parent / "fixtures"


def test_delimited_scan_prunes_filters_numbers(spark):
    df = read_delimited(
        spark, str(FIXTURES / "clinical.tsv"), sep="\t",
        id_column="id", row_numbers=True,
    )
    rows = {r["id"]: r for r in df.collect()}
    assert set(df.columns) == {"id", "name", "dose", "source_file_row_num"}  # S3 prune
    assert set(rows) == {"101", "102", "104", "105"}  # P1 blank-id dropped
    # P3: contiguous scan-order numbering starting at 2, unaffected by
    # the dropped row
    assert [rows[k]["source_file_row_num"] for k in ("101", "102", "104", "105")] == [2, 3, 4, 5]
    assert rows["104"]["dose"] is None  # untyped cells, empty -> null


def test_jsondir_duplicate_resolution(spark):
    df = read_subject_documents(
        spark, str(FIXTURES / "subjects"),
        fields=("DM_SEX", "DM_BRTHDAT", "FU_STATUS"),
        most_negative_fields=("DM_BRTHDAT",),
    )
    rows = {r["usi"]: r for r in df.collect()}
    assert rows["P001"]["DM_BRTHDAT"] == "-350"  # most-negative wins (S5)
    assert rows["P002"]["DM_SEX"] == "M"         # first instance wins
    assert rows["P003"]["DM_SEX"] is None        # no forms -> row kept, nulls


def test_jsondir_collated_duplicate_data_keys(spark):
    # Q002's DEMOGRAPHICS form has TWO `data` keys in one JSON object; a
    # plain dict parse keeps only the last (DM_SEX would be 'F'), the
    # collating reader sees both in order.
    df = read_subject_documents_collated(
        spark, str(FIXTURES / "subjects_dup"),
        fields=("DM_SEX", "DM_BRTHDAT", "FU_STATUS", "FU_AGE"),
        most_negative_fields=("DM_BRTHDAT",),
    )
    rows = {r["usi"]: r for r in df.collect()}
    assert rows["Q001"]["DM_SEX"] == "F" and rows["Q001"]["DM_BRTHDAT"] == "-150"
    assert rows["Q002"]["DM_SEX"] == "M"        # first-wins across dup data keys
    assert rows["Q002"]["DM_BRTHDAT"] == "-400" # most-negative across dup data keys
    assert rows["Q003"]["DM_SEX"] is None       # no forms -> row kept, nulls


def test_manifest_uniqueness_enforced(spark):
    df = read_manifest(spark, str(FIXTURES / "manifest.csv"), key_col="file_name")
    assert df.count() == 4
    assert duplicate_keys(df, "file_name").count() == 0


def test_lookup_map_roundtrip(spark):
    m = read_lookup_map(
        spark, str(FIXTURES / "manifest.csv"), key_col="file_name", value_col="md5"
    )
    assert m["P001.json"].startswith("0123")
    assert len(m) == 4


def test_route_tabs_from_mapping_prefixes():
    maps = load_mappings(
        [
            {"output_field": "participant.participant_id", "source_field": "Participants.pid"},
            {"output_field": "participant.sex_at_birth", "source_field": "Participants.sex"},
            {"output_field": "diagnosis.diagnosis", "source_field": "Diagnoses.dx"},
            {"output_field": "diagnosis.diagnosis_id", "source_field": "rowlocal"},
        ]
    )
    assert route_tabs(maps) == {"participant": "Participants", "diagnosis": "Diagnoses"}


def test_route_tabs_conflict_raises():
    maps = load_mappings(
        [
            {"output_field": "participant.participant_id", "source_field": "TabA.pid"},
            {"output_field": "participant.sex_at_birth", "source_field": "TabB.sex"},
        ]
    )
    with pytest.raises(ValueError, match="two worksheets"):
        route_tabs(maps)


def test_load_transformations_merge_and_active():
    local = [
        {"name": "t1", "source_file_path": "a.xlsx", "uuid_seed": "1"},
        {"name": "t2", "source_file_path": "b.xlsx", "active": False},
    ]
    remote = [
        {"name": "t1", "mappings": [{"output_field": "participant.participant_id"}]},
        {"name": "t3", "source_file_path": "c.xlsx"},
    ]
    merged = load_transformations(local, remote)
    by_name = {t["name"]: t for t in merged}
    assert set(by_name) == {"t1", "t3"}          # t2 inactive dropped
    assert by_name["t1"]["source_file_path"] == "a.xlsx"  # local kept
    assert "mappings" in by_name["t1"]           # remote merged in


def test_normalize_path_schemes():
    assert normalize_path("s3://bucket/k.parquet") == "s3a://bucket/k.parquet"
    assert normalize_path("/local/p.csv") == "/local/p.csv"
    assert normalize_path("file:///x.csv") == "file:///x.csv"
    with pytest.raises(ValueError, match="staged"):
        normalize_path("https://example.org/data.csv")


def test_truncate_sheet_name():
    assert truncate_sheet_name("x" * 40) == "x" * 31

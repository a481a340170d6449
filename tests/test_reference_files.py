"""M4/K6: reference-file synthesis — direct frame and 2-pass mapping
variants must agree on content."""

from __future__ import annotations

import json
import pathlib

import pytest

from c3dc_etl_spark.mapping.compiler import CompilerContext
from c3dc_etl_spark.mapping.model import load_mappings
from c3dc_etl_spark.harmonize.builder import build_node
from c3dc_etl_spark.plans.reference_files import (
    amend_transformation,
    max_type_group_index,
    reference_file_frame,
    reference_file_mappings,
    save_amended_transformation,
)
from c3dc_etl_spark.schema.registry import SchemaRegistry
from c3dc_etl_spark.sources import read_manifest, read_subject_documents
from c3dc_etl_spark.validate import frame_violations

FIXTURES = pathlib.Path(__file__).resolve().parent / "fixtures"
REG = SchemaRegistry()


@pytest.fixture(scope="module")
def inputs(spark):
    participants = read_subject_documents(
        spark, str(FIXTURES / "subjects"), fields=("DM_SEX",)
    ).selectExpr("usi AS participant_id")
    manifest = read_manifest(spark, str(FIXTURES / "manifest.csv"), key_col="file_name")
    return participants, manifest


def test_direct_frame(spark, inputs):
    participants, manifest = inputs
    ctx = CompilerContext(registry=REG, uuid_seed="mci")
    frame = reference_file_frame(participants, manifest, ctx)
    rows = {r["file_name"]: r for r in frame.collect()}
    # only surviving participants' files; P999 (manifest-only) excluded
    assert set(rows) == {"P001.json", "P002.json", "P003.json"}
    assert rows["P001.json"]["file_size"] == 412
    assert rows["P001.json"]["dcf_indexd_guid"] == "dg.1/aaa"
    assert frame_violations(frame, "reference_file", REG).count() == 0
    # ids deterministic
    again = {r["file_name"]: r["reference_file_id"]
             for r in reference_file_frame(participants, manifest, ctx).collect()}
    assert all(again[k] == rows[k]["reference_file_id"] for k in rows)


def test_two_pass_mappings_compile_and_match_direct(spark, inputs, tmp_path):
    participants, manifest = inputs
    ctx = CompilerContext(registry=REG, uuid_seed="mci")
    surviving = {r["participant_id"] for r in participants.collect()}
    manifest_rows = [
        r.asDict() for r in manifest.collect()
        if r["file_name"].removesuffix(".json") in surviving
    ]

    existing = load_mappings(
        [{"output_field": "participant.participant_id", "source_field": "usi",
          "type_group_index": "3"}]
    )
    assert max_type_group_index(existing) == 3
    generated = reference_file_mappings(manifest_rows, start_tgi=3)
    # K6 artifact round-trips
    config = {"name": "t1", "mappings": [
        {"output_field": "participant.participant_id", "source_field": "usi"}]}
    amended = amend_transformation(config, generated)
    out = tmp_path / "t1.ref_files.json"
    save_amended_transformation(amended, str(out))
    reloaded = json.loads(out.read_text())
    assert len(reloaded["mappings"]) == 1 + len(generated)

    # the generated mappings compile through the STANDARD engine: a
    # one-row driver source fans out per type group (M1)
    maps = load_mappings(generated)
    tgis = {m.type_group_index for m in maps}
    assert tgis == {"4", "5", "6"}  # allocated after the existing max
    one = spark.createDataFrame([("x",)], "source_file_row_num string")
    built = build_node(one, "reference_file", maps, ctx, explode_subrecords=False)
    by_name = {r["file_name"]: r for r in built.collect()}

    direct = {
        r["file_name"]: r
        for r in reference_file_frame(participants, manifest, ctx).collect()
    }
    assert set(by_name) == set(direct)
    for name in direct:
        for prop in ("file_type", "file_size", "md5sum", "dcf_indexd_guid", "file_url"):
            assert by_name[name][prop] == direct[name][prop], (name, prop)

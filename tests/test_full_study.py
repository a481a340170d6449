"""Capstone integration test: a CCDI/TARGET-style study run end to end —
the shape of the reference's create_json_etl_files + merge + report +
validate flow (etl/target/c3dc_etl.py:455-474) across the engine's
layers: study/consent_group singletons, participants, two observation
node types, row-mapped treatments, synthesized reference files, link
wiring, cross-transformation merge, duplicate report, node counts, and
final JSON-Schema validation."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from c3dc_etl_spark.harmonize.builder import build_node
from c3dc_etl_spark.link import wire_links
from c3dc_etl_spark.mapping.compiler import CompilerContext
from c3dc_etl_spark.mapping.model import load_mappings
from c3dc_etl_spark.merge import first_wins_merge, reconciliation_counts
from c3dc_etl_spark.plans.reference_files import reference_file_frame
from c3dc_etl_spark.rowmapped import build_rowmapped_node, parse_rule_rows
from c3dc_etl_spark.schema.registry import SchemaRegistry
from c3dc_etl_spark.sink import assemble_document, duplicate_report, node_count_report
from c3dc_etl_spark.validate import document_errors, referential_violations

REG = SchemaRegistry()

STUDY_MAPPINGS = load_mappings(
    [
        {"output_field": "study.study_id", "source_field": "sid"},
        {"output_field": "study.dbgap_accession", "source_field": "[phs000000]"},
        {"output_field": "study.study_name", "source_field": "sname"},
        {"output_field": "consent_group.consent_group_id", "source_field": "cgid"},
        {"output_field": "consent_group.consent_group_name", "source_field": "cgname"},
        {"output_field": "participant.participant_id", "source_field": "pid"},
        {"output_field": "participant.sex_at_birth", "source_field": "sex",
         "replacement_values": [
             {"old_value": "1", "new_value": "Male"},
             {"old_value": "2", "new_value": "Female"},
             {"old_value": "+", "new_value": "Unknown"},
         ]},
        {"output_field": "participant.race", "source_field": "[race, eth]",
         "replacement_values": [{"old_value": "*", "new_value": "{race}"}]},
        {"output_field": "diagnosis.diagnosis_id", "source_field": "[uuid]",
         "replacement_values": [{"old_value": "*", "new_value": "{uuid}"}]},
        {"output_field": "diagnosis.diagnosis", "source_field": "dx_code",
         "replacement_values": [{"old_value": "+", "new_value": "{find_enum_value}"}]},
        {"output_field": "diagnosis.age_at_diagnosis", "source_field": "age_dx"},
        {"output_field": "diagnosis.tumor_classification", "source_field": "[Primary]"},
        {"output_field": "survival.survival_id", "source_field": "[uuid]",
         "replacement_values": [{"old_value": "*", "new_value": "{uuid}"}]},
        {"output_field": "survival.last_known_survival_status", "source_field": "status",
         "replacement_values": [
             {"old_value": "a", "new_value": "Alive"},
             {"old_value": "d", "new_value": "Dead"},
         ]},
        {"output_field": "survival.age_at_last_known_survival_status",
         "source_field": "age_fu"},
    ]
)

TREATMENT_RULES = parse_rule_rows(
    [
        {"Source Variable Name": "chemo_flag", "Source Permissible Values Code": "y",
         "treatment.treatment_id": "{uuid}",
         "treatment.treatment_type": "Chemotherapy",
         "treatment.age_at_treatment_start": "{sum_abs_first(age_dx, '30')}"},
    ],
    "treatment",
)

SUBJECTS = [
    # pid, sex, race, eth, dx_code, age_dx, status, age_fu, chemo_flag
    ("p1", "1", "white", "", "8000/0", "100", "a", "400", "y"),
    ("p2", "2", "unknown", "hispanic or latino", "9500/3", "250", "d", "600", "n"),
    ("p3", "", "asian;white", "", "9861/3", "3000", "a", "3100", "y"),
]
SUBJECT_SCHEMA = (
    "pid string, sex string, race string, eth string, dx_code string, "
    "age_dx string, status string, age_fu string, chemo_flag string"
)


@pytest.fixture(scope="module")
def study(spark):
    ctx = CompilerContext(registry=REG, uuid_seed="full", row_identity=("pid",))
    subjects = spark.createDataFrame(SUBJECTS, SUBJECT_SCHEMA)
    singletons = spark.createDataFrame(
        [("s1", "Full Study", "cg1", "Consent A")],
        "sid string, sname string, cgid string, cgname string",
    )
    frames = {
        "study": build_node(singletons, "study", STUDY_MAPPINGS, ctx,
                            explode_subrecords=False),
        "consent_group": build_node(singletons, "consent_group", STUDY_MAPPINGS, ctx,
                                    explode_subrecords=False),
        "participant": build_node(
            subjects, "participant", STUDY_MAPPINGS, ctx, explode_subrecords=False,
            extra_columns={"consent_group.consent_group_id": "cg1"},
        ),
        "diagnosis": build_node(
            subjects, "diagnosis", STUDY_MAPPINGS, ctx, explode_subrecords=False,
            carry_columns={"participant.participant_id": "pid"},
        ),
        "survival": build_node(
            subjects, "survival", STUDY_MAPPINGS, ctx, explode_subrecords=False,
            carry_columns={"participant.participant_id": "pid"},
        ),
        "treatment": build_rowmapped_node(subjects, "treatment", TREATMENT_RULES, ctx),
    }
    manifest = spark.createDataFrame(
        [(f"{p}.json", f"dg/{p}", "00" * 16, "100", f"s3://b/{p}.json")
         for p, *_ in SUBJECTS],
        "file_name string, guid string, md5 string, size string, url string",
    )
    frames["reference_file"] = reference_file_frame(
        frames["participant"], manifest, ctx
    )
    return wire_links(frames, REG), ctx


def test_all_nodes_built_and_wired(study):
    frames, _ = study
    counts = dict(node_count_report(frames))
    assert counts == {
        "study": 1, "consent_group": 1, "participant": 3, "diagnosis": 3,
        "survival": 3, "treatment": 2, "reference_file": 3,
    }
    parts = {r["participant_id"]: r for r in frames["participant"].collect()}
    assert parts["p2"]["race"] == ["Hispanic or Latino"]  # undetermined dropped
    assert parts["p3"]["sex_at_birth"] is None            # blank, '+' needs non-blank
    assert len(parts["p1"]["diagnosis.diagnosis_id"]) == 1  # wired child array
    assert len(parts["p1"]["survival.survival_id"]) == 1


def test_referential_integrity_clean(study):
    frames, _ = study
    assert referential_violations(
        {"participant": frames["participant"], "diagnosis": frames["diagnosis"],
         "survival": frames["survival"]}, REG
    ).count() == 0


def test_document_validates(study):
    frames, _ = study
    doc = assemble_document(frames, REG)
    assert set(doc) == {
        "studies", "consent_groups", "participants", "diagnoses",
        "survivals", "treatments", "reference_files",
    }
    assert document_errors(doc, REG) == []


def test_merge_and_duplicate_report(spark, study):
    frames, ctx = study
    # second "transformation": same subjects re-harmonized (ids differ
    # by uuid seed) -> merge must collapse to the same distinct content
    ctx2 = CompilerContext(registry=REG, uuid_seed="other", row_identity=("pid",))
    subjects = spark.createDataFrame(SUBJECTS, SUBJECT_SCHEMA)
    dx2 = build_node(subjects, "diagnosis", STUDY_MAPPINGS, ctx2,
                     explode_subrecords=False,
                     carry_columns={"participant.participant_id": "pid"})
    merged = first_wins_merge(
        [frames["diagnosis"], dx2], "diagnosis", REG,
        key_cols=("`participant.participant_id`",),
    )
    assert merged.count() == 3
    assert {r["won_ord"] for r in merged.collect()} == {1}
    rec = reconciliation_counts(
        merged, [frames["diagnosis"], dx2], "diagnosis", REG
    ).collect()[0]
    assert rec["distinct_unmerged"] == rec["distinct_merged"] == 3

    recs = frames["diagnosis"].unionByName(dx2).select(
        F.col("`participant.participant_id`").alias("participant_id"),
        F.lit("diagnosis").alias("node"),
        F.md5(F.concat_ws("|", "diagnosis", F.col("age_at_diagnosis").cast("string")))
            .alias("fingerprint"),
    )
    report = {
        r["participant_id"]: r["diagnosis"]
        for r in duplicate_report(
            recs, participant_col="participant_id", node_col="node",
            fingerprint_col="fingerprint", nodes=("diagnosis",),
        ).collect()
    }
    assert report == {"p1": 1, "p2": 1, "p3": 1}  # one surplus copy each

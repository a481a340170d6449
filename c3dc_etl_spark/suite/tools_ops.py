"""Driver-side tool/plan surfaces under the oracle gate: S11 config
merge, X2 static mapping validation, R4 reference-file hashing, K1
document assembly.

These operators are driver-side BY DESIGN (configs, rule sheets, and
per-study documents are kilobytes — the reference handles them in plain
Python too); the queries snapshot their outputs into tiny DataFrames so
the driver's value-hash gate pins the semantics.
"""

from __future__ import annotations

import json
import os
import pathlib

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from c3dc_etl_spark.mapping.model import load_mappings, mapping_errors
from c3dc_etl_spark.schema.registry import SchemaRegistry
from c3dc_etl_spark.sink import assemble_document
from c3dc_etl_spark.sources.config import load_transformations
from c3dc_etl_spark.sources.workbook import read_worksheet
from c3dc_etl_spark.suite.registry import query
from c3dc_etl_spark.tools.unpivoter import reference_file_entries

REG = SchemaRegistry()
FIXTURES = pathlib.Path(__file__).resolve().parents[2] / "tests" / "fixtures"


# --------------------------------------------------------------------------
# S11: transformation-config fetch & merge
# --------------------------------------------------------------------------

_LOCAL_CONFIG = [
    {"name": "study_a", "active": True, "url": "local://a", "version": "1"},
    {"name": "study_b", "active": True, "url": "local://b", "version": "1"},
    {"name": "study_c", "active": False, "url": "local://c", "version": "1"},
]
_REMOTE_CONFIG = [
    {"name": "study_b", "url": "remote://b", "version": "2"},
    {"name": "study_d", "active": True, "url": "remote://d", "version": "1"},
    {"name": "study_e", "active": False, "url": "remote://e", "version": "1"},
]

# study_a untouched; study_b remote-overridden per-key; study_c and
# study_e inactive -> dropped; study_d remote-only kept.
_CONFIG_ORACLE = """
SELECT * FROM (VALUES
    ('study_a', 'local://a', '1'),
    ('study_b', 'remote://b', '2'),
    ('study_d', 'remote://d', '1')
) AS t(name, url, version)
"""


@query("config_merge_transformations", oracle=_CONFIG_ORACLE, tags=("source", "tools"))
def config_merge_transformations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S11 through sources.config.load_transformations: remote
    transformation entries merge into local study config by name
    (remote wins per key), inactive entries dropped
    (etl/ccdi/c3dc_etl.py:243-267)."""
    merged = load_transformations(_LOCAL_CONFIG, _REMOTE_CONFIG)
    return spark.createDataFrame(
        [(t["name"], t["url"], t["version"]) for t in merged],
        "name string, url string, version string",
    )


# --------------------------------------------------------------------------
# X2: static mapping validation
# --------------------------------------------------------------------------

_BROKEN_MAPPINGS = [
    {"output_field": "participant.nonexistent_prop", "source_field": "x"},
    {"output_field": "bogus_node.field", "source_field": "x"},
    {
        "output_field": "participant.race",
        "source_field": "x",
        "replacement_values": [{"old_value": "*", "new_value": "{made_up_macro}"}],
    },
    {
        "output_field": "participant.sex_at_birth",
        "source_field": "[a, b]",
        "replacement_values": [{"old_value": "1;2;3", "new_value": "Female"}],
    },
    {
        "output_field": "participant.sex_at_birth",
        "source_field": "x",
        "type_group_index": "x9",
    },
]

_X2_ORACLE = """
SELECT * FROM (VALUES
    ('participant.nonexistent_prop: unknown output property'),
    ('bogus_node.field: unknown output node'),
    ('participant.race: unknown macro {made_up_macro}'),
    ('participant.sex_at_birth: compound old_value arity ''1;2;3'' != 2 source fields'),
    ('participant.sex_at_birth: bad type_group_index ''x9''')
) AS t(error)
"""


@query("mapping_static_validation", oracle=_X2_ORACLE, tags=("validate", "tools"))
def mapping_static_validation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X2 through mapping.model.mapping_errors: every static-validation
    rule fires on a deliberately-broken program — unknown output
    node/property, unknown macro, compound old_value arity mismatch,
    malformed type_group_index (reference
    _get_transformation_mapping_errors, etl/ccdi/c3dc_etl.py:678-762).
    plans.study.run_study aborts on exactly this list."""
    schema_props = {n: {p.name for p in REG.node(n).props} for n in REG.node_names}
    errors = mapping_errors(load_mappings(_BROKEN_MAPPINGS), schema_props=schema_props)
    return spark.createDataFrame([(e,) for e in errors], "error string")


# --------------------------------------------------------------------------
# R4: reference-file size/md5 entries
# --------------------------------------------------------------------------

_R4_FILES = ("clinical.tsv", "manifest.csv")

_R4_ORACLE = " UNION ALL ".join(
    f"""
SELECT parse_filename(filename) AS file_name,
       CAST(size AS BIGINT) AS file_size,
       md5(decode(content)) AS md5sum
FROM read_blob('{FIXTURES / name}')"""
    for name in _R4_FILES
)


@query("reference_file_hashes", oracle=_R4_ORACLE, tags=("tools",))
def reference_file_hashes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """R4 through tools.unpivoter.reference_file_entries: streamed
    size+md5 per config artifact (reference
    mapping_unpivoter.py:307-427); the oracle re-hashes the same
    committed fixtures with DuckDB read_blob. The self-referential
    zeroed-field variant is unit-tested in
    tests/test_reference_files.py."""
    entries = reference_file_entries([str(FIXTURES / name) for name in _R4_FILES])
    return spark.createDataFrame(
        [(e["file_name"], e["file_size"], e["md5sum"]) for e in entries],
        "file_name string, file_size bigint, md5sum string",
    )


# --------------------------------------------------------------------------
# K1: harmonized-document assembly
# --------------------------------------------------------------------------

# Golden vector over the committed workbook fixture: canonical JSON of
# every assembled record. Proves id-ordered assembly, null-property
# OMISSION (Q002's survival has no age key), empty-string retention
# (Q003's sex stays), typed integers, and plural node naming.
_K1_ORACLE = """
SELECT * FROM (VALUES
    ('participants', '{"participant_id":"Q001","sex_at_birth":"F"}'),
    ('participants', '{"participant_id":"Q002","sex_at_birth":"M"}'),
    ('participants', '{"participant_id":"Q003","sex_at_birth":""}'),
    ('participants', '{"participant_id":"Q004","sex_at_birth":"F"}'),
    ('survivals', '{"age_at_last_known_survival_status":4100,"last_known_survival_status":"Alive","survival_id":"Q001"}'),
    ('survivals', '{"last_known_survival_status":"Dead","survival_id":"Q002"}'),
    ('survivals', '{"age_at_last_known_survival_status":5000,"last_known_survival_status":"Alive","survival_id":"Q004"}')
) AS t(node, record_json)
"""


@query("document_assembly", oracle=_K1_ORACLE, tags=("sink", "tools"))
def document_assembly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K1 through sink.assemble_document: two node frames (scanned from
    the committed workbook fixture via the vendored XLSX codec) collect
    into the reference's ``{plural_node: [records]}`` document shape —
    records id-ordered, null properties omitted
    (etl/ccdi/c3dc_etl.py:1439-1455) — re-emitted one row per record as
    canonical sorted-key JSON."""
    wb = str(FIXTURES / "study_workbook.xlsx")
    demo = read_worksheet(spark, wb, "Demographics").select(
        F.col("upi").alias("participant_id"),
        F.col("DM_SEX").alias("sex_at_birth"),
    )
    fu = read_worksheet(spark, wb, "FollowUp").select(
        F.col("upi").alias("survival_id"),
        F.col("FU_STATUS").alias("last_known_survival_status"),
        F.col("FU_AGE").cast("long").alias("age_at_last_known_survival_status"),
    )
    doc = assemble_document({"participant": demo, "survival": fu}, REG)
    rows = [
        (plural, json.dumps(rec, sort_keys=True, separators=(",", ":")))
        for plural, records in doc.items()
        for rec in records
    ]
    return spark.createDataFrame(rows, "node string, record_json string")


# --------------------------------------------------------------------------
# K2: merged-document sink (merge first-wins -> document assembly)
# --------------------------------------------------------------------------

_K2_ORACLE = """
SELECT * FROM (VALUES
    ('participants', '{"participant_id":"P1","sex_at_birth":"Female","won_ord":1}'),
    ('participants', '{"participant_id":"P2","sex_at_birth":"Male","won_ord":1}'),
    ('participants', '{"participant_id":"P3","sex_at_birth":"Intersex","won_ord":2}')
) AS t(node, record_json)
"""


@query("merged_document_assembly", oracle=_K2_ORACLE, tags=("sink", "merge", "tools"))
def merged_document_assembly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K2 through merge.first_wins_merge + sink.assemble_document: two
    per-transformation participant frames union, first-wins dedup on the
    (id-blanked) canonical fingerprint + participant key (P1 appears in
    both transformations with identical content -> transformation 1
    wins; P3 only in transformation 2 -> kept), then the merged frame
    collects into the document shape (reference
    _create_merged_json_etl_file, etl/target/c3dc_etl.py:2126-2227).
    ``won_ord`` is kept in the records to pin the first-wins provenance
    in the hash."""
    from c3dc_etl_spark.merge.dedup import first_wins_merge

    schema = "participant_id string, sex_at_birth string"
    t1 = spark.createDataFrame([("P1", "Female"), ("P2", "Male")], schema)
    t2 = spark.createDataFrame([("P1", "Female"), ("P3", "Intersex")], schema)
    merged = first_wins_merge(
        [t1, t2], "participant", REG, key_cols=("participant_id",)
    ).drop("fingerprint")
    doc = assemble_document({"participant": merged}, REG)
    rows = [
        (plural, json.dumps(rec, sort_keys=True, separators=(",", ":")))
        for plural, records in doc.items()
        for rec in records
    ]
    return spark.createDataFrame(rows, "node string, record_json string")


# --------------------------------------------------------------------------
# K5/O5/J2: workbook sink roundtrip
# --------------------------------------------------------------------------

# Golden vector: per-form frames fold through all_forms_frame (full-outer
# on the subject id, columns subject-first-then-sorted — O5), write to a
# real .xlsx via the vendored codec (K5), read back cell-by-cell. Null
# cells are omitted on write and resurface as None -> ''.
_K5_ORACLE = """
SELECT * FROM (VALUES
    ('upi;a_val;b_val'),
    ('Q1;1;x'),
    ('Q2;2;'),
    ('Q3;;y')
) AS t(line)
"""


@query("workbook_sink_roundtrip", oracle=_K5_ORACLE, tags=("sink", "tools"))
def workbook_sink_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K5 through tools.pivoter.write_workbook + the vendored XLSX
    writer, proven by reading the produced workbook back with the
    reader: two form frames fold into the all-forms sheet (J2 full-outer
    join chain; O5 subject-first-then-sorted column order, visible in
    the header line), each written row round-trips cell-exact
    (reference data_pivoter.py:150-170)."""
    import tempfile

    from c3dc_etl_spark.sources import xlsx_lite
    from c3dc_etl_spark.tools.pivoter import all_forms_frame, write_workbook

    fa = spark.createDataFrame([("Q1", "1"), ("Q2", "2")], "upi string, a_val string")
    fb = spark.createDataFrame([("Q1", "x"), ("Q3", "y")], "upi string, b_val string")
    allf = all_forms_frame({"A": fa, "B": fb}, subject_col="upi").orderBy("upi")
    # mkstemp, not the race-prone deprecated mktemp: the fd is closed and
    # write_workbook re-opens the already-claimed path.
    fd, path = tempfile.mkstemp(suffix=".xlsx", prefix="k5_roundtrip_")
    os.close(fd)
    write_workbook({"all_forms": allf}, path)
    lines = [
        (";".join("" if c is None else str(c) for c in row),)
        for row in xlsx_lite.read_rows(path, "all_forms")
    ]
    return spark.createDataFrame(lines, "line string")


# --------------------------------------------------------------------------
# X6: schema-creator PV checks
# --------------------------------------------------------------------------

_X6_PVS = [
    "[---- Demographics ----]",
    "Café au lait spots",
    "Neuroblastoma",
    "neuroblastoma",
    "Not Reported",
]

_X6_ORACLE = """
SELECT * FROM (VALUES
    ('non_ascii', 'Café au lait spots'),
    ('duplicate', 'Neuroblastoma'),
    ('kept', 'Café au lait spots'),
    ('kept', 'Neuroblastoma'),
    ('kept', 'neuroblastoma'),
    ('kept', 'Not Reported')
) AS t(check_name, pv)
"""


@query("schema_pv_checks", oracle=_X6_ORACLE, tags=("validate", "tools"))
def schema_pv_checks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X6 through tools.schema_checks: non-ASCII PV detection,
    case-insensitive duplicate detection (first casing reported), and
    '[---- section ----]' header stripping (reference
    schema/schema_creator.py:467-489,548-559,106-107)."""
    from c3dc_etl_spark.tools.schema_checks import (
        duplicate_pvs,
        non_ascii_pvs,
        strip_section_headers,
    )

    kept = strip_section_headers(_X6_PVS)
    rows = (
        [("non_ascii", pv) for pv, _bad in non_ascii_pvs(kept)]
        + [("duplicate", pv) for pv in duplicate_pvs(kept)]
        + [("kept", pv) for pv in kept]
    )
    return spark.createDataFrame(rows, "check_name string, pv string")


# --------------------------------------------------------------------------
# M4: reference-file synthesis (direct frame path)
# --------------------------------------------------------------------------

_RF_SEED = "rf42"
_RF_UUID_SQL = (
    "MD5(CONCAT_WS(CHR(31), '" + _RF_SEED + "', 'reference_file', file_name))"
)
_M4_ORACLE = f"""
WITH participants AS (
    SELECT participant.usi AS participant_id
    FROM read_json('{FIXTURES / "subjects"}/*.json')
),
files AS (
    SELECT DISTINCT participant_id || '.json' AS file_name FROM participants
),
j AS (
    SELECT f.file_name, m.guid, m.md5, m.size, m.url
    FROM files f
    JOIN read_csv('{FIXTURES / "manifest.csv"}', header=true,
                  all_varchar=true) m USING (file_name)
)
SELECT (SUBSTR({_RF_UUID_SQL},1,8) || '-' || SUBSTR({_RF_UUID_SQL},9,4)
        || '-4' || SUBSTR({_RF_UUID_SQL},14,3) || '-8'
        || SUBSTR({_RF_UUID_SQL},18,3) || '-' || SUBSTR({_RF_UUID_SQL},21,12))
           AS reference_file_id,
       file_name,
       'input source data' AS file_type,
       CAST(TRY_CAST(size AS DOUBLE) AS BIGINT) AS file_size,
       md5 AS md5sum,
       guid AS dcf_indexd_guid,
       url AS file_url
FROM j
"""


@query("reference_file_plan", oracle=_M4_ORACLE, tags=("plan", "tools"))
def reference_file_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M4 through plans.reference_files.reference_file_frame: one
    reference_file record per surviving subject's source file, metadata
    from the broadcast manifest, content-derived deterministic uuid
    (reference etl/mci/c3dc_etl.py:1357-1538; the generated-mappings
    2-pass parity path is unit-tested in
    tests/test_reference_files.py)."""
    from c3dc_etl_spark.mapping.compiler import CompilerContext
    from c3dc_etl_spark.plans.reference_files import reference_file_frame
    from c3dc_etl_spark.sources import read_manifest, read_subject_documents

    participants = read_subject_documents(
        spark,
        str(FIXTURES / "subjects"),
        fields=("DM_SEX",),
    ).select(F.col("usi").alias("participant_id"))
    manifest = read_manifest(
        spark, str(FIXTURES / "manifest.csv"), key_col="file_name"
    )
    ctx = CompilerContext(registry=REG, uuid_seed=_RF_SEED, row_identity=())
    return reference_file_frame(participants, manifest, ctx)


# --------------------------------------------------------------------------
# K6: amended-mapping sink (generated reference_file mappings)
# --------------------------------------------------------------------------

# Golden vector: the generated program is file-name-sorted, numbered
# after the existing max type_group_index (A5), and appended without
# touching the original mappings — every mapping emitted as canonical
# JSON with its position, so ordering is part of the hash.
_K6_ORACLE = """
SELECT * FROM (VALUES
    (0, '{"output_field":"participant.participant_id","source_field":"pid","type_group_index":"2"}'),
    (1, '{"output_field":"reference_file.reference_file_id","replacement_values":[{"new_value":"{uuid}","old_value":"*"}],"source_field":"[uuid]","type_group_index":"3"}'),
    (2, '{"output_field":"reference_file.file_name","source_field":"[P001.json]","type_group_index":"3"}'),
    (3, '{"output_field":"reference_file.file_type","source_field":"[input source data]","type_group_index":"3"}'),
    (4, '{"output_field":"reference_file.file_size","source_field":"[412]","type_group_index":"3"}'),
    (5, '{"output_field":"reference_file.md5sum","source_field":"[0123456789abcdef0123456789abcdef]","type_group_index":"3"}'),
    (6, '{"output_field":"reference_file.dcf_indexd_guid","source_field":"[dg.1/aaa]","type_group_index":"3"}'),
    (7, '{"output_field":"reference_file.file_url","source_field":"[s3://bucket/P001.json]","type_group_index":"3"}'),
    (8, '{"output_field":"reference_file.reference_file_id","replacement_values":[{"new_value":"{uuid}","old_value":"*"}],"source_field":"[uuid]","type_group_index":"4"}'),
    (9, '{"output_field":"reference_file.file_name","source_field":"[P002.json]","type_group_index":"4"}'),
    (10, '{"output_field":"reference_file.file_type","source_field":"[input source data]","type_group_index":"4"}'),
    (11, '{"output_field":"reference_file.file_size","source_field":"[398]","type_group_index":"4"}'),
    (12, '{"output_field":"reference_file.md5sum","source_field":"[fedcba9876543210fedcba9876543210]","type_group_index":"4"}'),
    (13, '{"output_field":"reference_file.dcf_indexd_guid","source_field":"[dg.1/bbb]","type_group_index":"4"}'),
    (14, '{"output_field":"reference_file.file_url","source_field":"[s3://bucket/P002.json]","type_group_index":"4"}')
) AS t(pos, mapping_json)
"""


@query("amended_mapping_sink", oracle=_K6_ORACLE, tags=("sink", "plan", "tools"))
def amended_mapping_sink(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K6 through plans.reference_files: reference_file mappings are
    GENERATED from the manifest (file-name-sorted, type-group numbers
    allocated after the existing program's max — A5), appended to the
    transformation config (existing mappings untouched), and the
    amended program re-parses through load_mappings with zero static
    errors — the reference's 2-pass `.ref_files.json` flow
    (etl/mci/c3dc_etl.py:1357-1538, README.md:31-46)."""
    from c3dc_etl_spark.plans.reference_files import (
        amend_transformation,
        max_type_group_index,
        reference_file_mappings,
    )

    manifest_rows = [
        {"file_name": "P002.json", "guid": "dg.1/bbb",
         "md5": "fedcba9876543210fedcba9876543210", "size": "398",
         "url": "s3://bucket/P002.json"},
        {"file_name": "P001.json", "guid": "dg.1/aaa",
         "md5": "0123456789abcdef0123456789abcdef", "size": "412",
         "url": "s3://bucket/P001.json"},
    ]
    config = {
        "name": "studyX",
        "mappings": [
            {"output_field": "participant.participant_id",
             "source_field": "pid", "type_group_index": "2"},
        ],
    }
    existing = load_mappings(config["mappings"])
    generated = reference_file_mappings(
        manifest_rows, start_tgi=max_type_group_index(existing)
    )
    amended = amend_transformation(config, generated)
    # the amended program must re-parse cleanly (2-pass invariant)
    schema_props = {n: {p.name for p in REG.node(n).props} for n in REG.node_names}
    assert not mapping_errors(
        load_mappings(amended["mappings"]), schema_props=schema_props
    )
    rows = [
        (i, json.dumps(m, sort_keys=True, separators=(",", ":")))
        for i, m in enumerate(amended["mappings"])
    ]
    return spark.createDataFrame(rows, "pos int, mapping_json string")

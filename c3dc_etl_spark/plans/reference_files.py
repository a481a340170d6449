"""MCI reference-file synthesis (M4) + amended-mapping sink (K6).

Reference flow (etl/mci/c3dc_etl.py:1357-1538): after harmonizing
participants, every surviving subject's source JSON file becomes
reference_file records whose guid/md5/size/url come from the manifest;
the reference emits these as GENERATED MAPPINGS (literal-source mapping
objects, type_group_index allocated after the existing max) appended to
the transformation config and written to `<name>.ref_files.json` for a
second ETL pass (etl/mci/README.md:31-46).

Engine forms, both provided:
- ``reference_file_frame``: the direct path — participants joined to the
  broadcast manifest, one declarative plan, no mapping round-trip. Use
  this when running end-to-end in one process.
- ``reference_file_mappings`` + ``amend_transformation`` +
  ``save_amended_transformation``: the 2-pass parity path — the
  generated mappings are real mapping objects that compile through the
  standard engine (load_mappings -> build_node), and the amended config
  is a K6 artifact byte-compatible with a second run.
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from c3dc_etl_spark.functions.columns import deterministic_uuid
from c3dc_etl_spark.mapping.compiler import CompilerContext
from c3dc_etl_spark.mapping.model import FieldMapping

FILE_TYPE = "input source data"


def reference_file_frame(
    participants: DataFrame,
    manifest: DataFrame,
    ctx: CompilerContext,
    *,
    participant_id_col: str = "participant_id",
    file_name_expr: str = "participant_id || '.json'",
) -> DataFrame:
    """Direct M4: one reference_file record per surviving participant's
    source file, metadata from the broadcast manifest. The id is
    content-derived from the file name — stable across runs and
    identical at any parallelism."""
    files = participants.select(
        F.expr(file_name_expr).alias("file_name")
    ).distinct()
    joined = files.join(F.broadcast(manifest), "file_name")
    return joined.select(
        deterministic_uuid(
            F.lit("reference_file"), F.col("file_name"), seed=ctx.uuid_seed
        ).alias("reference_file_id"),
        "file_name",
        F.lit(FILE_TYPE).alias("file_type"),
        F.col("size").cast("string").try_cast("double").cast("bigint").alias("file_size"),
        F.col("md5").alias("md5sum"),
        F.col("guid").alias("dcf_indexd_guid"),
        F.col("url").alias("file_url"),
    )


def max_type_group_index(mappings: list[FieldMapping]) -> int:
    """A5: highest numeric type_group_index in the existing program."""
    nums = [int(m.type_group_index) for m in mappings if m.type_group_index.isdigit()]
    return max(nums, default=-1)


def reference_file_mappings(
    manifest_rows: list[dict],
    *,
    start_tgi: int,
) -> list[dict]:
    """2-pass M4: per manifest file, one numbered type-group of
    literal-source reference_file mappings (the reference's generated
    shape). The output is plain mapping JSON — it compiles through
    load_mappings/build_node like any hand-written program."""
    out: list[dict] = []
    for i, row in enumerate(sorted(manifest_rows, key=lambda r: r["file_name"])):
        tgi = str(start_tgi + 1 + i)
        def lit(prop: str, value: object) -> dict:
            return {
                "output_field": f"reference_file.{prop}",
                "source_field": f"[{value}]",
                "type_group_index": tgi,
            }
        out.append(
            {
                "output_field": "reference_file.reference_file_id",
                "source_field": "[uuid]",
                "type_group_index": tgi,
                "replacement_values": [{"old_value": "*", "new_value": "{uuid}"}],
            }
        )
        out.extend(
            [
                lit("file_name", row["file_name"]),
                lit("file_type", FILE_TYPE),
                lit("file_size", row["size"]),
                lit("md5sum", row["md5"]),
                lit("dcf_indexd_guid", row["guid"]),
                lit("file_url", row["url"]),
            ]
        )
    return out


def amend_transformation(config: dict, generated: list[dict]) -> dict:
    """Append generated mappings to a transformation config dict (K6);
    existing mappings stay untouched."""
    amended = dict(config)
    amended["mappings"] = list(config.get("mappings", ())) + list(generated)
    return amended


def save_amended_transformation(config: dict, path: str) -> None:
    """K6 artifact: `<name>.ref_files.json`-style amended config."""
    with open(path, "w", encoding="utf-8") as f:
        json.dump(config, f, indent=2)

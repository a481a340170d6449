"""JSON-document directory scan (S5/S6): one file per subject, nested
form instances, pivoted to one wide row per subject.

Reference: _load_source_data (etl/mci/c3dc_etl.py:903-1032) — a Python
loop over files that extracts mapped fields from
``forms[].data[].{form_field_id, value}`` with duplicate-field
resolution (DM_BRTHDAT most-negative rule :996-1022; list fields
appended). Here the whole directory is ONE distributed read:

    read.json(multiLine) -> posexplode(forms) -> posexplode(data)
    -> per-(subject, field) resolution window -> groupBy().pivot()

Scale notes:
- ``fields`` (the mapped source fields, from the transformation config)
  is passed to ``pivot`` explicitly — no extra distinct-values job, and
  unmapped fields are pruned before the shuffle (the reference's manual
  column pruning, etl/mci/c3dc_etl.py:946-956, for free);
- "first instance wins" is made deterministic via the (form, field)
  ordinal positions from posexplode — array order IS file order, unlike
  row order across a shuffle;
- one shuffle on subject id; everything else is narrow.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from c3dc_etl_spark.sources.storage import normalize_path


def read_subject_documents(
    spark: SparkSession,
    path: str,
    *,
    fields: Sequence[str],
    id_field: str = "participant.usi",
    most_negative_fields: Sequence[str] = (),
    forms_col: str = "forms",
) -> DataFrame:
    """Directory of per-subject JSON docs -> one wide row per subject
    with one column per requested form field.

    Duplicate-field resolution across form instances:
    - fields in ``most_negative_fields``: the numerically smallest value
      wins (the reference's DM_BRTHDAT rule — birth dates are negative
      day offsets, most-negative = earliest-recorded);
    - all other fields: the first instance in document order wins.
    """
    path = normalize_path(path)
    docs = spark.read.option("multiLine", True).json(f"{path}/*.json")
    base = docs.select(
        F.col(id_field).alias("usi"),
        # O7: the reference sorts its source-file list before processing
        # (etl/mci/c3dc_etl.py:925-927), so "first instance wins" across
        # files means lexicographically-first file. input_file_name()
        # carries the provenance into the resolution window's ordering.
        F.input_file_name().alias("src_file"),
        F.posexplode_outer(forms_col).alias("form_pos", "form"),
    )
    kv = base.select(
        "usi",
        "src_file",
        "form_pos",
        F.posexplode_outer("form.data").alias("field_pos", "fld"),
    ).select(
        "usi",
        "src_file",
        "form_pos",
        "field_pos",
        F.col("fld.form_field_id").alias("key"),
        F.col("fld.value").alias("value"),
    )
    return _resolve_and_pivot(kv, fields, most_negative_fields)


def _resolve_and_pivot(
    kv: DataFrame, fields: Sequence[str], most_negative_fields: Sequence[str]
) -> DataFrame:
    """(usi, src_file, form_pos, field_pos, key, value) rows -> one wide
    row per usi: per-(usi, key) resolution window (most-negative rule
    for the configured fields, sorted-file-then-document order otherwise
    — O7), then an explicit-values pivot (no distinct-values pre-job)."""
    neg = list(most_negative_fields)
    num = (
        F.when(F.col("key").isin(neg), F.col("value").cast("double"))
        if neg
        else F.lit(None).cast("double")
    )
    w = Window.partitionBy("usi", "key").orderBy(
        num.asc_nulls_last(),
        F.col("src_file").asc(),
        F.col("form_pos").asc(),
        F.col("field_pos").asc(),
    )
    resolved = kv.withColumn("__rn", F.row_number().over(w)).filter(F.col("__rn") == 1)
    return (
        resolved.groupBy("usi")
        .pivot("key", list(fields))
        .agg(F.first("value"))
    )


def _collate_pairs_factory(forms_col: str):
    """object_pairs_hook collating duplicate ``data`` keys inside one
    form object into a list of data lists — plain dict() keeps only the
    LAST duplicate (reference collate_form_data,
    etl/mci/c3dc_etl.py:264-279)."""

    def collate(ordered_pairs):
        obj = {}
        keys = [k for k, _ in ordered_pairs]
        for key, val in ordered_pairs:
            if key == "data" and isinstance(val, list) and "form_id" in keys:
                obj.setdefault(key, []).append(val)
            else:
                obj[key] = val
        return obj

    return collate


def read_subject_documents_collated(
    spark: SparkSession,
    path: str,
    *,
    fields: Sequence[str],
    id_field: str = "participant.usi",
    most_negative_fields: Sequence[str] = (),
    forms_col: str = "forms",
) -> DataFrame:
    """S6 variant of :func:`read_subject_documents` that preserves
    DUPLICATE ``data`` keys within a single form object.

    JSON allows repeated keys in one object; every standard tree parser
    (Spark's Jackson reader, DuckDB read_json, plain dicts) keeps one
    occurrence and silently drops the rest. The reference parses with
    ``object_pairs_hook`` to collate the duplicate ``data`` lists
    (etl/mci/c3dc_etl.py:264-279, applied :939) — a parse-level rule no
    declarative JSON reader can express, so this is the sanctioned
    Python case: each file is read as ONE whole-text row
    (spark.read.text(wholetext)), and an Arrow-batched mapInPandas
    kernel runs the collating decode, emitting the same narrow
    (usi, form_pos, field_pos, key, value) rows the declarative reader
    produces — resolution + pivot are shared from there.

    Scale notes: one task per file-split (wholetext keeps a file in one
    row — per-subject docs are KB-sized), parse is batched via Arrow,
    and everything downstream of the kernel is the same exchange-light
    plan as the S5 path. field_pos numbers the FLATTENED data lists in
    document order, so "first instance wins" sees values from all
    duplicate data elements in their original order."""
    import pandas as pd

    path = normalize_path(path)
    raw = spark.read.text(f"{path}/*.json", wholetext=True).withColumn(
        "src_file", F.input_file_name()
    )
    id_keys = id_field.split(".")
    collate = _collate_pairs_factory(forms_col)

    def parse(batches):
        import json

        for pdf in batches:
            out: dict[str, list] = {
                "usi": [], "src_file": [], "form_pos": [], "field_pos": [],
                "key": [], "value": [],
            }

            def emit(usi, src, fp, pp, key, value):
                out["usi"].append(usi)
                out["src_file"].append(src)
                out["form_pos"].append(fp)
                out["field_pos"].append(pp)
                out["key"].append(key)
                out["value"].append(value)

            for text, src in zip(pdf["value"], pdf["src_file"]):
                doc = json.loads(text, object_pairs_hook=collate)
                node = doc
                for k in id_keys:
                    node = node.get(k) if isinstance(node, dict) else None
                usi = None if node is None else str(node)
                emitted = False
                for fpos, form in enumerate(doc.get(forms_col) or []):
                    data_lists = form.get("data") or []
                    flat = [item for chunk in data_lists for item in chunk]
                    for ppos, item in enumerate(flat):
                        val = item.get("value")
                        emit(
                            usi,
                            src,
                            fpos,
                            ppos,
                            item.get("form_field_id"),
                            None if val is None else str(val),
                        )
                        emitted = True
                if not emitted:
                    # subject with no form data still yields a row after
                    # the pivot (parity with posexplode_outer)
                    emit(usi, src, None, None, None, None)
            yield pd.DataFrame(out)

    kv = raw.mapInPandas(
        parse,
        schema=(
            "usi string, src_file string, form_pos int, field_pos int, "
            "key string, value string"
        ),
    )
    return _resolve_and_pivot(kv, fields, most_negative_fields)

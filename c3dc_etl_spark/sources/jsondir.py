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
        F.posexplode_outer(forms_col).alias("form_pos", "form"),
    )
    kv = base.select(
        "usi",
        "form_pos",
        F.posexplode_outer("form.data").alias("field_pos", "fld"),
    ).select(
        "usi",
        "form_pos",
        "field_pos",
        F.col("fld.form_field_id").alias("key"),
        F.col("fld.value").alias("value"),
    )
    neg = list(most_negative_fields)
    num = (
        F.when(F.col("key").isin(neg), F.col("value").cast("double"))
        if neg
        else F.lit(None).cast("double")
    )
    w = Window.partitionBy("usi", "key").orderBy(
        num.asc_nulls_last(), F.col("form_pos").asc(), F.col("field_pos").asc()
    )
    resolved = kv.withColumn("__rn", F.row_number().over(w)).filter(F.col("__rn") == 1)
    return (
        resolved.groupBy("usi")
        .pivot("key", list(fields))
        .agg(F.first("value"))
    )

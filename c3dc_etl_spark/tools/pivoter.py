"""Data/JSON pivoter tools (R1/R2, J2, O5, K5).

Reference etl/mci/data_pivoter.py: per-form long rows pivot to one row
per subject (R1, :102-140), an "all forms" sheet built by left-joining
every form table on upi (J2, :134-136), columns ordered upi-first then
sorted (O5, :137-149), written to XLSX with 31-char sheet names (K5).
etl/mci/json_pivoter.py flattens nested JSON: dict -> dotted paths,
list-of-scalars -> '\\r\\n'-joined cell, list-of-dicts -> one row per
element (R2, :58-112).

Engine forms below are DataFrame-native; the XLSX write is a driver-side
step — pandas.ExcelWriter when an Excel engine is installed, else the
vendored pure-stdlib codec (sources/xlsx_lite.py) — with a CSV-directory
fallback for data-scale outputs.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, StructType

from c3dc_etl_spark.sources import xlsx_lite
from c3dc_etl_spark.sources.workbook import truncate_sheet_name


def form_wide_frames(
    kv: DataFrame,
    *,
    subject_col: str = "usi",
    form_col: str = "form_id",
    key_col: str = "key",
    value_col: str = "value",
    form_fields: dict[str, list[str]] | None = None,
) -> dict[str, DataFrame]:
    """R1: long (subject, form, field, value) rows -> one wide frame per
    form. Pass ``form_fields`` (form -> its field list, known from the
    form catalog) to pin pivot columns plan-time; otherwise one
    distinct-values job per form computes them."""
    forms = (
        sorted(form_fields)
        if form_fields is not None
        else [r[0] for r in kv.select(form_col).distinct().orderBy(form_col).collect()]
    )
    out: dict[str, DataFrame] = {}
    for form in forms:
        rows = kv.filter(F.col(form_col) == form)
        pivot = rows.groupBy(subject_col).pivot(
            key_col, form_fields.get(form) if form_fields else None
        )
        out[form] = pivot.agg(F.first(value_col))
    return out


def all_forms_frame(
    frames: dict[str, DataFrame], *, subject_col: str = "usi"
) -> DataFrame:
    """J2+O5: fold of outer joins on the subject id building the
    full-width sheet; columns ordered subject-first then sorted. Each
    join is keyed on the same subject column, so with the frames
    pre-partitioned by subject the fold is co-located."""
    joined = reduce(
        lambda a, b: a.join(b, subject_col, "full_outer"), frames.values()
    )
    rest = sorted(c for c in joined.columns if c != subject_col)
    return joined.select(subject_col, *rest)


def flatten_json_frame(df: DataFrame, *, list_sep: str = "\r\n") -> DataFrame:
    """R2: recursively flatten a nested DataFrame — structs become
    dotted columns, arrays of structs explode (one output row per
    element; sequential explodes of sibling arrays give the reference's
    cross-join), arrays of scalars join into one ``list_sep`` cell."""
    while True:
        changed = False
        for field in df.schema.fields:
            if isinstance(field.dataType, StructType):
                inner = [
                    F.col(f"`{field.name}`.`{sub.name}`").alias(f"{field.name}.{sub.name}")
                    for sub in field.dataType.fields
                ]
                others = [F.col(f"`{c}`") for c in df.columns if c != field.name]
                df = df.select(*others, *inner)
                changed = True
                break
            if isinstance(field.dataType, ArrayType):
                if isinstance(field.dataType.elementType, StructType):
                    others = [F.col(f"`{c}`") for c in df.columns if c != field.name]
                    df = df.select(
                        *others,
                        F.explode_outer(F.col(f"`{field.name}`")).alias(field.name),
                    )
                else:
                    df = df.withColumn(
                        field.name,
                        F.array_join(
                            F.transform(F.col(f"`{field.name}`"), lambda v: v.cast("string")),
                            list_sep,
                        ),
                    )
                changed = True
                break
        if not changed:
            return df


def write_workbook(frames: dict[str, DataFrame], path: str) -> None:
    """K5: one sheet per form, 31-char sheet names. Driver-side write
    (these are per-study inspection workbooks, megabytes not
    terabytes), always via the vendored xlsx_lite writer so output
    bytes do not depend on which Excel library the environment
    happens to carry."""
    sheets = {
        truncate_sheet_name(name): (
            list(df.columns),
            [list(r) for r in df.collect()],
        )
        for name, df in frames.items()
    }
    xlsx_lite.write_workbook(path, sheets)


def write_csv_dir(frames: dict[str, DataFrame], out_dir: str) -> None:
    """Portable K5 fallback: one CSV per form (single file each; these
    are inspection artifacts, not data-scale outputs)."""
    for name, df in frames.items():
        df.coalesce(1).write.mode("overwrite").option("header", True).csv(
            f"{out_dir}/{truncate_sheet_name(name)}"
        )

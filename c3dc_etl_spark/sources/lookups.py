"""Manifest + lookup-table scans (S7-S10).

Reference: manifest sheet -> {file_name: {guid, md5, size, url}} with a
duplicate-name error (_get_source_manifest_data,
etl/mci/c3dc_etl.py:606-661); ICD-O and diagnosis-category sheets ->
dicts (:663-755). Manifests join source data broadcast-side; lookup
dicts feed CompilerContext.lookups and compile into literal maps.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from c3dc_etl_spark.sources.delimited import read_delimited


def duplicate_keys(df: DataFrame, key_col: str) -> DataFrame:
    """Keys appearing more than once — the reference raises on any
    (etl/mci/c3dc_etl.py:640-646); callers assert this is empty."""
    return (
        df.groupBy(key_col)
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") > 1)
    )


def read_manifest(
    spark: SparkSession,
    path: str,
    *,
    sep: str = ",",
    key_col: str = "file_name",
    require_unique: bool = True,
) -> DataFrame:
    """Manifest scan (S7): small keyed DataFrame meant for the broadcast
    side of a file_name join."""
    df = read_delimited(spark, path, sep=sep)
    if require_unique:
        dupes = duplicate_keys(df, key_col).limit(1).collect()
        if dupes:
            raise ValueError(f"duplicate manifest key: {dupes[0][key_col]!r}")
    return df


def read_lookup_map(
    spark: SparkSession,
    path: str,
    *,
    key_col: str,
    value_col: str,
    sep: str = ",",
) -> dict[str, str]:
    """Two-column lookup sheet -> driver dict for CompilerContext.lookups
    (S8/S9). Duplicate keys error, matching the reference
    (etl/mci/c3dc_etl.py:739-748). Lookup tables are O(10^2-10^4) rows —
    driver-side by design; they compile into plan literals."""
    rows = read_delimited(spark, path, sep=sep).select(key_col, value_col).collect()
    out: dict[str, str] = {}
    for r in rows:
        k = (r[key_col] or "").strip()
        if not k:
            continue
        if k in out and out[k] != r[value_col]:
            raise ValueError(f"duplicate lookup key: {k!r}")
        out[k] = r[value_col]
    return out

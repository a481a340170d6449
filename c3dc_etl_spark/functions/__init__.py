"""Shared JVM-side column builders used across the engine."""

from c3dc_etl_spark.functions.columns import (
    blankish,
    deterministic_uuid,
    enum_case_normalize_expr,
    int_round,
    norm,
    nullif_blank,
    race_merge,
    split_multi,
)

__all__ = [
    "blankish",
    "deterministic_uuid",
    "enum_case_normalize_expr",
    "int_round",
    "norm",
    "nullif_blank",
    "race_merge",
    "split_multi",
]

"""Transformation-mapping layer: load, validate, compile to Columns."""

from c3dc_etl_spark.mapping.model import (
    FieldMapping,
    Replacement,
    load_mappings,
    mapping_errors,
)
from c3dc_etl_spark.mapping.compiler import CompilerContext, compile_field, compile_node_groups

__all__ = [
    "FieldMapping",
    "Replacement",
    "load_mappings",
    "mapping_errors",
    "CompilerContext",
    "compile_field",
    "compile_node_groups",
]

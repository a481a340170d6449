"""Sinks (SURVEY.md §2.1 K1-K6): harmonized JSON document assembly and
report outputs."""

from c3dc_etl_spark.sink.document import (
    assemble_document,
    save_harmonized_json,
    write_node_json,
)
from c3dc_etl_spark.sink.reports import duplicate_report, node_count_report

__all__ = [
    "assemble_document",
    "save_harmonized_json",
    "write_node_json",
    "duplicate_report",
    "node_count_report",
]

"""Row-mapped rule builder (SURVEY.md §2.4 M3, §2.1 S10, §2.10 X4)."""

from c3dc_etl_spark.rowmapped.builder import (
    RowRule,
    build_rowmapped_node,
    parse_rule_rows,
    rule_errors,
)

__all__ = ["RowRule", "build_rowmapped_node", "parse_rule_rows", "rule_errors"]

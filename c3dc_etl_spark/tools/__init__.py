"""Plan-time tooling (SURVEY.md §2.9 R3/R4, §2.10 X6): mapping
unpivoter and schema-creator checks. Driver-side by nature — these
transform configuration artifacts, not data."""

from c3dc_etl_spark.tools.unpivoter import (
    reference_file_entries,
    unpivot_transformation_mappings,
)
from c3dc_etl_spark.tools.schema_checks import (
    duplicate_pvs,
    non_ascii_pvs,
    strip_section_headers,
)

__all__ = [
    "reference_file_entries",
    "unpivot_transformation_mappings",
    "duplicate_pvs",
    "non_ascii_pvs",
    "strip_section_headers",
]

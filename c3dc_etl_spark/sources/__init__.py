"""Source readers (SURVEY.md §2.1, S1-S13).

Delimited text, JSON-document directories, manifests and lookups arrive
through Spark's native readers (distributed scans, pushdown-friendly);
XLSX byte parsing is driver-side pandas behind an import gate (no Excel
codec in this container — the routing/pruning logic around it is real
and tested); config fetch/merge is driver-side plan-time work.
"""

from c3dc_etl_spark.sources.config import fetch_json, load_transformations
from c3dc_etl_spark.sources.delimited import read_delimited
from c3dc_etl_spark.sources.jsondir import (
    read_subject_documents,
    read_subject_documents_collated,
)
from c3dc_etl_spark.sources.lookups import (
    duplicate_keys,
    read_lookup_map,
    read_manifest,
)
from c3dc_etl_spark.sources.rownum import with_row_numbers
from c3dc_etl_spark.sources.storage import normalize_path
from c3dc_etl_spark.sources.workbook import read_worksheet, route_tabs

__all__ = [
    "fetch_json",
    "load_transformations",
    "read_delimited",
    "read_subject_documents",
    "read_subject_documents_collated",
    "duplicate_keys",
    "read_lookup_map",
    "read_manifest",
    "with_row_numbers",
    "normalize_path",
    "read_worksheet",
    "route_tabs",
]

"""Cross-file merge layer (SURVEY.md §2.7, D1/D2/D6)."""

from c3dc_etl_spark.merge.fingerprint import DEFAULT_VOLATILE, canonical_fingerprint
from c3dc_etl_spark.merge.dedup import first_wins_merge, reconciliation_counts

__all__ = [
    "DEFAULT_VOLATILE",
    "canonical_fingerprint",
    "first_wins_merge",
    "reconciliation_counts",
]

"""Validation layer (SURVEY.md §2.10, X1/X3)."""

from c3dc_etl_spark.validate.runner import (
    document_errors,
    frame_violations,
    referential_violations,
    responses_without_treatment,
    validate_document,
)

__all__ = [
    "document_errors",
    "frame_violations",
    "referential_violations",
    "responses_without_treatment",
    "validate_document",
]

"""End-to-end study plans (the reference ETLs' create_json_etl_files
flow, re-expressed as one declarative Spark plan per node)."""

from c3dc_etl_spark.plans.study import run_study, run_study_to_document

__all__ = ["run_study", "run_study_to_document"]

"""Correctness/benchmark query suite.

Every registered query has (a) a PySpark implementation expressing one
operator family from SURVEY.md §2 or a training-data-pipeline op, and
(b) where SQL-expressible, a DuckDB oracle producing identical rows
(same column names, comparable types, deterministic values).

Importing this package populates the registry.
"""

from c3dc_etl_spark.suite.registry import REGISTRY, QuerySpec, query  # noqa: F401

# Import side-effect: register all queries.
from c3dc_etl_spark.suite import relational  # noqa: F401,E402
from c3dc_etl_spark.suite import harmonization_ops  # noqa: F401,E402
from c3dc_etl_spark.suite import windows_dedup  # noqa: F401,E402
from c3dc_etl_spark.suite import restructuring  # noqa: F401,E402
from c3dc_etl_spark.suite import text_ops  # noqa: F401,E402
from c3dc_etl_spark.suite import dedup_ops  # noqa: F401,E402
from c3dc_etl_spark.suite import similarity_ops  # noqa: F401,E402
from c3dc_etl_spark.suite import multivector_ops  # noqa: F401,E402
from c3dc_etl_spark.suite import multimodal_ops  # noqa: F401,E402
from c3dc_etl_spark.suite import engine_ops  # noqa: F401,E402
from c3dc_etl_spark.suite import sources_ops  # noqa: F401,E402
from c3dc_etl_spark.suite import validate_ops  # noqa: F401,E402
from c3dc_etl_spark.suite import merge_ops  # noqa: F401,E402
from c3dc_etl_spark.suite import rowmapped_ops  # noqa: F401,E402
from c3dc_etl_spark.suite import sampling_ops  # noqa: F401,E402
from c3dc_etl_spark.suite import corpus_ops  # noqa: F401,E402
from c3dc_etl_spark.suite import quality_ops  # noqa: F401,E402
from c3dc_etl_spark.suite import temporal_ops  # noqa: F401,E402
from c3dc_etl_spark.suite import streaming_ops  # noqa: F401,E402
from c3dc_etl_spark.suite import study_ops  # noqa: F401,E402
from c3dc_etl_spark.suite import tools_ops  # noqa: F401,E402
from c3dc_etl_spark.suite import sketch_ops  # noqa: F401,E402
from c3dc_etl_spark.suite import clustering_ops  # noqa: F401,E402
from c3dc_etl_spark.suite import warehouse_ops  # noqa: F401,E402
from c3dc_etl_spark.suite import graph_ops  # noqa: F401,E402
from c3dc_etl_spark.suite import tablelog_ops  # noqa: F401,E402
from c3dc_etl_spark.suite import learning_ops  # noqa: F401,E402
from c3dc_etl_spark.suite import search_ops  # noqa: F401,E402
from c3dc_etl_spark.suite import geo_ops  # noqa: F401,E402

"""Large-scale data-pipeline operators beyond the reference's inventory:
deduplication (exact / MinHash-LSH / SimHash / n-gram Jaccard),
approximate nearest-neighbor similarity search, text analysis, and
multimodal (binary) column plumbing.

All operators are DataFrame -> DataFrame, built from JVM-side expressions
(no row-at-a-time Python in the hot path) so they hold up at 100 TB.
"""

from c3dc_etl_spark.operators import dedup, multimodal, similarity, text  # noqa: F401

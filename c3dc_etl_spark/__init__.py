"""c3dc_etl_spark — PySpark-native analytics/ETL engine with the
capabilities of chicagopcdc/c3dc_etl, re-expressed Spark-first.

The reference (studied read-only at /root/reference/) is a config-driven,
schema-validated clinical-data harmonization pipeline implemented as
single-threaded row-at-a-time Python over petl tables. This package
re-expresses every operator in its inventory (SURVEY.md §2) as declarative
PySpark DataFrame plans so Catalyst/Tungsten handle optimization and the
same code scales from a laptop to a 1000-executor cluster:

- ``schema``     JSON-Schema (draft 2020-12) model loader -> StructType
                 registry + enum/permissible-value maps (broadcastable).
- ``mapping``    transformation-mapping loader + static validator +
                 compiler: mapping JSON -> Column expression trees.
- ``macros``     macro registry ({uuid},{sum},{race},{find_enum_value},...)
                 compiling to Column builders.
- ``sources``    XLSX/CSV/TSV/JSON-directory/lookup readers.
- ``harmonize``  per-node builder: project -> replace -> convert ->
                 type-group fan-out -> sub-record explode -> filters.
- ``rowmapped``  rule-table compiler (MCI treatment/treatment_response).
- ``link``       relationship id wiring (joins + collect_list).
- ``merge``      record fingerprinting + cross-file dedup + reports.
- ``validate``   schema-derived column checks + referential integrity.
- ``sink``       harmonized JSON document assembly + report sinks.
- ``plans``      end-to-end study runs: sources + mappings -> wired,
                 validated harmonized document.
- ``tools``      plan-time tooling: mapping unpivoter, schema checks.
- ``operators``  general-purpose large-scale ops: dedup (exact/minhash/
                 simhash/jaccard), ANN similarity, text analysis,
                 multimodal column plumbing.
- ``suite``      registered benchmark/correctness queries with DuckDB
                 oracle SQL (driver contract: __spark_entry__.py).
- ``streaming``  structured-streaming extensions (file-arrival batch).
"""

__version__ = "0.1.0"

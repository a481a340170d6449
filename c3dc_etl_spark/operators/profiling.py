"""One-pass table profiling: per-column row/null/distinct counts and
min/max, the stats pass every large-scale pipeline runs before touching
100 TB (skew scouting, null-rate sanity, join-key cardinality).

Shape: ALL per-column aggregates ride in ONE df.agg() — a single
aggregation job — and the 1-row result is exploded into one output row
per column in-plan (array-of-structs explode), so no driver collect and
no per-column job fan-out. Exact distincts use Spark's grouping-expand
(one shuffle); ``approx=True`` swaps them for HyperLogLog++
approx_count_distinct — the 100 TB path, deterministic for a given
dataset but not cross-engine-comparable, so the oracle-checked suite
query pins ``approx=False``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["profile_table"]


def profile_table(
    df: DataFrame, columns: list[str] | None = None, *, approx: bool = False
) -> DataFrame:
    """Profile ``columns`` (default: all) into one row per column:
    (col_name, n_rows, n_non_null, n_distinct, min_value, max_value).
    min/max are cast to string so heterogeneous column types share one
    schema; NULL when the column is entirely null."""
    cols = columns if columns is not None else list(df.columns)
    missing = [c for c in cols if c not in df.columns]
    if missing:
        raise ValueError(f"profile_table: unknown columns {missing}")
    distinct = F.approx_count_distinct if approx else F.countDistinct
    aggs = [F.count(F.lit(1)).alias("__n")]
    for c in cols:
        aggs += [
            F.count(c).alias(f"__nn_{c}"),
            distinct(c).alias(f"__nd_{c}"),
            F.min(c).cast("string").alias(f"__mn_{c}"),
            F.max(c).cast("string").alias(f"__mx_{c}"),
        ]
    one = df.agg(*aggs)
    rows = F.array(
        *[
            F.struct(
                F.lit(c).alias("col_name"),
                F.col("__n").cast("bigint").alias("n_rows"),
                F.col(f"__nn_{c}").cast("bigint").alias("n_non_null"),
                F.col(f"__nd_{c}").cast("bigint").alias("n_distinct"),
                F.col(f"__mn_{c}").alias("min_value"),
                F.col(f"__mx_{c}").alias("max_value"),
            )
            for c in cols
        ]
    )
    return one.select(F.explode(rows).alias("p")).select("p.*")

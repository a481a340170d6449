"""Scan-order row numbering without a global sort (P3).

The reference tags every source row with `source_file_row_num`
(petl.addrownumbers(start=2), etl/ccdi/c3dc_etl.py:516) — file order.
Spark has no implicit row order, so this reconstructs it scale-safely:

1. ``monotonically_increasing_id`` is ascending WITHIN each scan
   partition in scan order (it encodes (partition, row-in-partition));
2. a per-(file, partition) window numbers rows inside each split;
3. cumulative (file, partition) counts — a tiny aggregate, one row per
   split, window-summed and broadcast back — convert the split-local
   numbers to global file-order numbers. Files are ordered by name,
   matching the reference's sorted source-file list (O7,
   etl/mci/c3dc_etl.py:925-927).

No stage sorts more than one split's rows; the only global ordering is
over the split-count table (rows = number of splits).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def with_row_numbers(
    df: DataFrame, *, colname: str = "source_file_row_num", start: int = 2
) -> DataFrame:
    d = (
        df.withColumn("__file", F.input_file_name())
        .withColumn("__pid", F.spark_partition_id())
        .withColumn("__mid", F.monotonically_increasing_id())
    )
    w_in = Window.partitionBy("__file", "__pid").orderBy(F.col("__mid").asc())
    numbered = d.withColumn("__rn", F.row_number().over(w_in))
    counts = d.groupBy("__file", "__pid").agg(F.count(F.lit(1)).alias("__cnt"))
    w_off = Window.orderBy(F.col("__file").asc(), F.col("__pid").asc()).rowsBetween(
        Window.unboundedPreceding, -1
    )
    offsets = counts.withColumn(
        "__off", F.coalesce(F.sum("__cnt").over(w_off), F.lit(0))
    ).select("__file", "__pid", "__off")
    out = numbered.join(F.broadcast(offsets), ["__file", "__pid"])
    return out.withColumn(
        colname, (F.col("__rn") + F.col("__off") + F.lit(start - 1)).cast("bigint")
    ).drop("__file", "__pid", "__mid", "__rn", "__off")

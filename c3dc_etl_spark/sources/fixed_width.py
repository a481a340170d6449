"""Fixed-width text source — the legacy-export format (mainframe
extracts, COBOL copybook dumps, printf reports) that has no delimiter
to split on: every field is a (1-based offset, width) slice of the
line.

Scale shape: ``spark.read.text`` is a splittable line source (HDFS-style
block splits, one task per split at any file size), and the field
slicing is pure ``substring`` + ``trim`` + cast — whole-stage-codegen'd
column expressions, zero UDFs, zero shuffles. Column pruning works the
obvious way: unreferenced fields are never sliced (Catalyst prunes the
projection), though the line bytes are always read — the format's
inherent cost vs columnar storage, which is exactly why the engine's
sinks write parquet.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# (field name, 1-based start offset, width, spark cast type)
FieldSpec = tuple[str, int, int, str]


def read_fixed_width(
    spark: SparkSession, path: str, fields: list[FieldSpec]
) -> DataFrame:
    """Parse a fixed-width text file into typed columns. Fields are
    space-padded in the file (both printf '%-Ns' left-justification and
    '%Nd' right-justification); values are trimmed before the cast, so
    a non-numeric residue in a numeric field becomes NULL (ANSI-off
    cast) rather than a crash — quarantine upstream if loud rejection
    is wanted (see suite/sources_ops.py corrupt-record handling). An
    all-blank field reads as NULL for every type: the format cannot
    distinguish NULL from empty, and NULL-for-blank is the convention
    that round-trips with the writer's COALESCE(x, '')."""
    raw = spark.read.text(path)

    def _field(name: str, start: int, width: int, tp: str):
        s = F.trim(F.substring(F.col("value"), start, width))
        return F.when(s != "", s).cast(tp).alias(name)

    return raw.select(*[_field(*f) for f in fields])


def write_fixed_width(
    df: DataFrame, path: str, fields: list[FieldSpec]
) -> None:
    """Render rows as fixed-width lines (left-justified, space-padded —
    printf '%-Ns' on every field's string form) and write as text.
    Values longer than their width are rejected loudly: silent
    truncation would corrupt adjacent fields on read."""
    fmt = "".join(f"%-{width}s" for _, _, width, _ in fields)
    fits = F.lit(True)
    for name, _, width, _ in fields:
        fits = fits & (
            F.coalesce(F.length(F.col(name).cast("string")), F.lit(0))
            <= width
        )
    line = F.when(
        fits,
        F.format_string(
            fmt,
            *[
                F.coalesce(F.col(n).cast("string"), F.lit(""))
                for n, _, _, _ in fields
            ],
        ),
    ).otherwise(F.raise_error(F.lit("fixed-width overflow: value exceeds field width")))
    df.select(line.alias("value")).write.mode("overwrite").text(path)

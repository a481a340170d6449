"""2-D skyline (Pareto frontier) — rows not dominated under
(minimize x, maximize y): no other row has x' < x with y' >= y, nor
x' = x with y' > y.

Exact criterion, sort-once formulation: over rows ordered by x,
  keep <=> (y > max(y) over x' < x) AND (y = max(y) over x' = x)
— the strictly-preceding running max plus a same-key max, i.e. two
window functions instead of the naive O(n^2) dominance anti-join
(which Catalyst could only plan as a nested-loop theta join).

Scale design: a global-ORDER-BY window is a single-partition WindowExec
— correct but not a 100 TB plan. ``skyline_2d`` therefore prefilters
with a bucket-level dominance pass: bucket x, take max(y) per bucket
(a tiny aggregate), broadcast the running max of all STRICTLY EARLIER
buckets back, and drop rows already dominated by it. Every true skyline
row survives (any dominator in an earlier bucket has strictly smaller
x, so the bucket running max >= its y), and the surviving candidate set
is near-frontier-sized, so the exact two-window pass runs on a frame
that fits one task. The same decomposition extends to d > 2 with grid
cells; the oracle runs the exact windows over the full input,
confirming the prefilter drops only dominated rows.

The reference pipeline has no ranking/dominance operator; this is
engine-ambition surface (multi-objective "best documents" selection —
e.g. quality score vs token cost — is a training-data curation
primitive).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def skyline_2d(
    df: DataFrame,
    min_col: str,
    max_col: str,
    *,
    n_buckets: int = 64,
) -> DataFrame:
    """Rows of ``df`` on the Pareto frontier minimizing ``min_col``
    (integral) and maximizing ``max_col`` (integral). Duplicate
    frontier points are all kept (neither dominates the other)."""
    x, y = F.col(min_col), F.col(max_col)

    # --- bucket-level prefilter (the distributed pass) ---
    stats = df.agg(
        F.min(min_col).alias("lo"), F.max(min_col).alias("hi")
    ).collect()[0]
    lo, hi = stats["lo"], stats["hi"]
    if lo is None:
        return df.limit(0)
    width = max(1, (int(hi) - int(lo)) // n_buckets + 1)
    # exact integral division: bigint `/` routes through DOUBLE, whose
    # rounding can misbucket a boundary row upward at extreme widths —
    # which would let non-dominating larger-x rows veto a frontier row
    bucketed = df.withColumn(
        "__bkt",
        F.expr(
            f"(CAST({min_col} AS BIGINT) - {int(lo)}L) div {width}L"
        ),
    )
    prev_max = (
        bucketed.groupBy("__bkt")
        .agg(F.max(max_col).alias("__bmax"))
        .select(
            "__bkt",
            F.max("__bmax")
            .over(
                Window.orderBy("__bkt").rowsBetween(
                    Window.unboundedPreceding, -1
                )
            )
            .alias("__prev_bmax"),
        )
    )
    cand = bucketed.join(F.broadcast(prev_max), "__bkt").filter(
        F.col("__prev_bmax").isNull() | (y > F.col("__prev_bmax"))
    )

    # --- exact two-window pass on the near-frontier candidate set ---
    w_prev = Window.orderBy(min_col).rangeBetween(
        Window.unboundedPreceding, -1
    )
    w_same = Window.partitionBy(min_col)
    return (
        cand.withColumn("__pmax", F.max(max_col).over(w_prev))
        .withColumn("__smax", F.max(max_col).over(w_same))
        .filter(
            (F.col("__pmax").isNull() | (y > F.col("__pmax")))
            & (y == F.col("__smax"))
        )
        .drop("__bkt", "__prev_bmax", "__pmax", "__smax")
    )

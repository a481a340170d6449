"""Planar geospatial joins on integer coordinates: grid-bucketed radius
join and nearest-neighbor — the proximity shapes (store/customer
distance, sensor clustering, geo dedup) the reference's relational
surface has no counterpart for.

Design for 100 TB:

- **Never the n² cross join.** Points hash-partition by GRID CELL of
  side length = the search radius; any two points within the radius are
  at most one cell apart in each axis, so candidate pairs exist only
  between a point's home cell and the 3x3 neighborhood. One side
  replicates to its 9 neighbor cells (constant 9x blow-up, the
  spatial-join analog of a band join's bucket explode), the other stays
  home, and the join is a plain equi-join on cell id — shuffle carries
  O(9N) rows instead of O(N²) candidates.
- **Exactly-once pair emission, no post-dedup.** For an unordered pair
  within the radius, the replica set of one point covers the other's
  home cell EXACTLY once (replication is one row per distinct
  neighbor cell), so `id_left < id_right` alone guarantees one output
  row per pair — no distinct() over the pair stream.
- **Integer-exact.** Coordinates and squared distances stay in BIGINT;
  no trig, no doubles, no engine-specific sqrt rounding (callers who
  need metric distance take sqrt OUTSIDE the hashed core).
- **Skew.** A dense cell (urban cluster) makes one join key hot; the
  cell side is the tuning knob (smaller cells = more keys, less skew,
  more replicas hit empty cells), and AQE skew-join splitting handles
  residual hot cells at runtime. For adversarial density, cap cells
  via operators.dedup.drop_oversized_groups upstream.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _cells(df: DataFrame, x_col: str, y_col: str, cell: int) -> DataFrame:
    """Home grid cell per point; `div` truncation matches DuckDB `//`
    for the non-negative coordinates this module requires."""
    return df.withColumn("__cx", F.expr(f"{x_col} div {cell}")).withColumn(
        "__cy", F.expr(f"{y_col} div {cell}")
    )


def _replicate(df: DataFrame, x_col: str, y_col: str, cell: int) -> DataFrame:
    """One row per (point, neighbor cell) — the 3x3 border replication."""
    d = F.explode(F.array(F.lit(-1), F.lit(0), F.lit(1)))
    return (
        _cells(df, x_col, y_col, cell)
        .withColumn("__dx", d)
        .withColumn("__dy", d)
        .withColumn("__cx", F.col("__cx") + F.col("__dx"))
        .withColumn("__cy", F.col("__cy") + F.col("__dy"))
        .drop("__dx", "__dy")
    )


def dist2(ax: Column, ay: Column, bx: Column, by: Column) -> Column:
    """Squared Euclidean distance, BIGINT-exact."""
    return (ax - bx) * (ax - bx) + (ay - by) * (ay - by)


def grid_radius_join(
    points: DataFrame,
    id_col: str,
    x_col: str,
    y_col: str,
    radius: int,
    *,
    unordered_pairs: bool = True,
) -> DataFrame:
    """All point pairs with squared distance <= radius² via grid-cell
    bucketing. Returns (id_a, id_b, dist2); with ``unordered_pairs``
    each pair appears once with id_a < id_b, otherwise both directions
    (the candidate stream nearest-neighbor needs).

    Cell side = radius, so a within-radius partner is at most one cell
    away per axis; the right side replicates to its 9 neighbor cells
    and the left joins from its home cell only — each (left, right)
    pair meets on exactly one cell id."""
    left = _cells(points, x_col, y_col, radius).select(
        F.col(id_col).alias("id_a"),
        F.col(x_col).alias("__ax"),
        F.col(y_col).alias("__ay"),
        "__cx",
        "__cy",
    )
    right = _replicate(points, x_col, y_col, radius).select(
        F.col(id_col).alias("id_b"),
        F.col(x_col).alias("__bx"),
        F.col(y_col).alias("__by"),
        "__cx",
        "__cy",
    )
    pair_pred = (
        (F.col("id_a") < F.col("id_b"))
        if unordered_pairs
        else (F.col("id_a") != F.col("id_b"))
    )
    d2 = dist2(F.col("__ax"), F.col("__ay"), F.col("__bx"), F.col("__by"))
    return (
        left.join(right, ["__cx", "__cy"])
        .filter(pair_pred)
        .filter(d2 <= F.lit(int(radius) * int(radius)))
        .select("id_a", "id_b", d2.alias("dist2"))
    )


def nearest_neighbor(
    points: DataFrame,
    id_col: str,
    x_col: str,
    y_col: str,
    max_radius: int,
) -> DataFrame:
    """Each point's nearest OTHER point within ``max_radius`` (points
    with no partner in range are absent): the grid candidate stream,
    then a per-point ROW_NUMBER argmin with a deterministic
    (dist2, neighbor id) tie-break. The window partitions by point id
    over the radius-bounded candidate list — O(candidates) state, never
    a global sort."""
    from pyspark.sql import Window

    cand = grid_radius_join(
        points, id_col, x_col, y_col, max_radius, unordered_pairs=False
    )
    w = Window.partitionBy("id_a").orderBy(
        F.col("dist2").asc(), F.col("id_b").asc()
    )
    return (
        cand.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .select(
            F.col("id_a").alias("id"),
            F.col("id_b").alias("nn_id"),
            "dist2",
        )
    )

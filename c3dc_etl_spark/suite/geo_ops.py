"""Geospatial proximity queries over deterministic planar coordinates.

The test tables carry no coordinates, so each query derives integer
(x, y) positions on a 100k x 100k grid from the customer key via the
suite's cross-engine md5 fold (registry rule 6) — the same derivation
in the Spark plan and the DuckDB oracle, so positions are bit-identical
and every distance is BIGINT-exact (no trig, no doubles: the planar
squared-distance core is what the grid join scales on; metric haversine
is a monotone transform applied OUTSIDE a hashed core).

Oracles restate the joins as brute-force O(n²) self-joins — affordable
at oracle scale, which is exactly the point: the Spark side must match
the exhaustive answer while shuffling only the 9x cell replication.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from c3dc_etl_spark.operators.geo import grid_radius_join, nearest_neighbor
from c3dc_etl_spark.suite.registry import load, query

GRID = 100_000          # coordinate domain per axis
RADIUS = 1_000          # pair-join radius (cells = radius side)
NN_RADIUS = 5_000       # nearest-neighbor search horizon


def _fold(seed: str, key: str) -> F.Column:
    """32-bit fold of md5(seed:key) — the suite's engine-portable hash."""
    return F.conv(
        F.substring(
            F.md5(F.concat(F.lit(seed + ":"), F.col(key).cast("string"))),
            1,
            8,
        ),
        16,
        10,
    ).cast("long")


def _points(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load(spark, sf_dir, "customer").select("c_custkey")
    return cust.select(
        F.col("c_custkey").alias("id"),
        (_fold("gx", "c_custkey") % GRID).alias("x"),
        (_fold("gy", "c_custkey") % GRID).alias("y"),
    )


def _sql_fold(seed: str) -> str:
    h = f"MD5('{seed}:' || CAST(c_custkey AS STRING))"
    return f"CAST(CONCAT('0x', SUBSTR({h}, 1, 8)) AS BIGINT)"


_PTS_CTE = f"""
pts AS (
    SELECT c_custkey AS id,
           {_sql_fold('gx')} % {GRID} AS x,
           {_sql_fold('gy')} % {GRID} AS y
    FROM customer
)
"""

_RADIUS_ORACLE = f"""
WITH {_PTS_CTE}
SELECT a.id AS id_a, b.id AS id_b,
       (a.x - b.x) * (a.x - b.x) + (a.y - b.y) * (a.y - b.y) AS dist2
FROM pts a JOIN pts b ON a.id < b.id
WHERE (a.x - b.x) * (a.x - b.x) + (a.y - b.y) * (a.y - b.y)
      <= {RADIUS * RADIUS}
"""


@query("geo_grid_radius_join", oracle=_RADIUS_ORACLE, tags=("geo", "join"))
def geo_grid_radius_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """All point pairs within a radius, via grid-cell bucketing: cell
    side = radius, one side replicated to its 3x3 neighbor cells, plain
    equi-join on cell id — O(9N) shuffle rows where the oracle's
    brute force is O(N²). Exactly-once pair emission falls out of the
    replication geometry (operators/geo.py:grid_radius_join); distances
    are BIGINT-exact squared Euclidean."""
    return grid_radius_join(_points(spark, sf_dir), "id", "x", "y", RADIUS)


_NN_ORACLE = f"""
WITH {_PTS_CTE},
cand AS (
    SELECT a.id AS id, b.id AS nn_id,
           (a.x - b.x) * (a.x - b.x) + (a.y - b.y) * (a.y - b.y) AS dist2
    FROM pts a JOIN pts b ON a.id <> b.id
)
SELECT id, nn_id, dist2 FROM (
    SELECT *, ROW_NUMBER() OVER (
        PARTITION BY id ORDER BY dist2 ASC, nn_id ASC) AS rn
    FROM cand WHERE dist2 <= {NN_RADIUS * NN_RADIUS}
) WHERE rn = 1
"""


@query("geo_nearest_neighbor", oracle=_NN_ORACLE, tags=("geo", "join"))
def geo_nearest_neighbor(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-point nearest neighbor within a bounded horizon: the grid
    candidate stream (both pair directions), then a per-point
    ROW_NUMBER argmin with (dist2, neighbor id) tie-break. Points with
    no partner inside the horizon are absent — the bound is what keeps
    the candidate set (and the window state) finite at any density;
    an unbounded exact NN needs ring-expansion, which is a different
    cost class the horizon form avoids."""
    return nearest_neighbor(
        _points(spark, sf_dir), "id", "x", "y", NN_RADIUS
    )


from c3dc_etl_spark.operators.warehouse import morton_key_sql

_MORTON_BITS = 8
# the SAME generated bit-interleave as the Spark side (one definition,
# operators/warehouse.py:morton_key_sql — no drift possible)
_MORTON_SQL = morton_key_sql("xb", "yb", bits=_MORTON_BITS)

_MORTON_ORACLE = f"""
WITH {_PTS_CTE},
b AS (
    SELECT id,
           x * {1 << _MORTON_BITS} // {GRID} AS xb,
           y * {1 << _MORTON_BITS} // {GRID} AS yb
    FROM pts
)
SELECT CAST({_MORTON_SQL} AS BIGINT) AS cell,
       CAST(COUNT(*) AS BIGINT) AS n_points,
       CAST(SUM(xb) AS BIGINT) AS sum_xb,
       CAST(SUM(yb) AS BIGINT) AS sum_yb
FROM b GROUP BY 1
"""


@query("geo_morton_cells", oracle=_MORTON_ORACLE, tags=("geo",))
def geo_morton_cells(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Space-filling-curve cell aggregation: bucket both axes to 8 bits,
    Morton-interleave into one BIGINT cell id (operators/warehouse.py:
    morton_key — the same key optimize_zorder clusters files by), and
    aggregate per cell. The oracle recomputes the interleave as pure
    bit arithmetic, pinning the curve definition cross-engine: the cell
    id doubles as a locality-preserving partition key for spatial data
    at scale (neighbors in space land in nearby key ranges)."""
    from c3dc_etl_spark.operators.warehouse import morton_key

    pts = _points(spark, sf_dir)
    scale = 1 << _MORTON_BITS
    b = pts.select(
        F.expr(f"x * {scale} div {GRID}").alias("xb"),
        F.expr(f"y * {scale} div {GRID}").alias("yb"),
    )
    return (
        b.withColumn(
            "cell", morton_key(F.col("xb"), F.col("yb"), bits=_MORTON_BITS)
        )
        .groupBy("cell")
        .agg(
            F.count(F.lit(1)).alias("n_points"),
            F.sum("xb").alias("sum_xb"),
            F.sum("yb").alias("sum_yb"),
        )
    )

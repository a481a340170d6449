"""In-process cross-engine fences for the portable-idiom layer.

The big oracle gate (scripts/check_oracle.py) proves parity
query-by-query; these tests pin the SHARED IDIOMS those queries are
built from — the md5 hash fold, the day-bucket division, the Morton
key generator — directly against DuckDB inside pytest, so an idiom
regression fails in seconds with a pointed message instead of
surfacing as N unrelated hash mismatches.
"""

from __future__ import annotations

import duckdb
from pyspark.sql import functions as F

from c3dc_etl_spark.operators.dedup import hash32
from c3dc_etl_spark.operators.warehouse import morton_key, morton_key_sql

VALUES = ["", "a", "hello world", "Customer#000000042", "é世界"]


def test_hash32_matches_duckdb(spark):
    got = {
        r["s"]: r["h"]
        for r in spark.createDataFrame([(v,) for v in VALUES], "s string")
        .select("s", hash32(F.col("s")).alias("h"))
        .collect()
    }
    con = duckdb.connect()
    for v in VALUES:
        (expect,) = con.execute(
            "SELECT CAST(CONCAT('0x', SUBSTR(MD5(?), 1, 8)) AS BIGINT)", [v]
        ).fetchone()
        assert got[v] == expect, v


def test_day_bucket_truncates_like_duckdb(spark):
    from c3dc_etl_spark.suite.registry import DAY_US, day_bucket

    # include a NEGATIVE timestamp: the whole point of the shared helper
    # is that div truncates toward zero exactly like DuckDB's `//`,
    # where a floor-division spelling would disagree pre-epoch
    ts = [0, 1, DAY_US - 1, DAY_US, 3 * DAY_US + 17, -1, -DAY_US - 5]
    got = {
        r["ts_us"]: r["d"]
        for r in spark.createDataFrame([(t,) for t in ts], "ts_us long")
        .select("ts_us", day_bucket().alias("d"))
        .collect()
    }
    con = duckdb.connect()
    for t in ts:
        (expect,) = con.execute(f"SELECT {t} // {DAY_US}").fetchone()
        assert got[t] == expect, t


def test_morton_generator_pair_agrees(spark):
    pts = [(0, 0), (255, 255), (170, 85), (1, 128), (37, 201)]
    got = {
        (r["x"], r["y"]): r["m"]
        for r in spark.createDataFrame(pts, "x long, y long")
        .select("x", "y", morton_key(F.col("x"), F.col("y")).alias("m"))
        .collect()
    }
    con = duckdb.connect()
    sql = morton_key_sql("x", "y")
    for x, y in pts:
        (expect,) = con.execute(
            f"SELECT {sql} FROM (SELECT {x} AS x, {y} AS y)"
        ).fetchone()
        assert got[(x, y)] == expect, (x, y)


def test_decimal_sum_to_double_matches(spark):
    """Registry rule 1's core: exact DECIMAL sum -> correctly-rounded
    double is bit-identical across engines regardless of row order."""
    vals = [0.1, 0.2, 0.3, 123456.78, -0.07, 99999999.99]
    got = (
        spark.createDataFrame([(v,) for v in vals], "v double")
        .agg(F.sum(F.col("v").cast("decimal(18,2)")).cast("double").alias("s"))
        .collect()[0]["s"]
    )
    con = duckdb.connect()
    placeholders = ", ".join(f"({v!r})" for v in vals)
    (expect,) = con.execute(
        f"SELECT CAST(SUM(CAST(v AS DECIMAL(18,2))) AS DOUBLE)"
        f" FROM (VALUES {placeholders}) t(v)"
    ).fetchone()
    assert got == expect

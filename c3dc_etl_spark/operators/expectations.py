"""Deequ-style data-quality expectations: declarative constraints over
a DataFrame, verified in ONE aggregate pass.

Each constraint contributes aggregate expressions to a single
``df.agg(...)`` job, so checking N constraints costs one scan and one
(single-row) aggregation regardless of N — the "unit tests for data"
pattern (Schelter et al., VLDB 2018, Amazon Deequ) re-expressed as
plain Catalyst aggregates. The single result row is exploded in-plan to
one row per constraint with a fixed-point metric and pass flag, so the
report itself is a DataFrame (sinkable, joinable, oracle-checkable).

Referential-integrity constraints need a second table and are anti-join
shaped — see suite queries ``anti_join_integrity`` / ``semi_join_exists``;
this module covers the single-table surface.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

SCALE = 1_000_000  # metrics are emitted as floor(x * 1e6 + 0.5) bigints


@dataclass(frozen=True)
class Expectation:
    """One constraint: ``name`` labels the report row, ``metric`` is an
    aggregate Column in [0, 1] (or any ratio), ``passed`` an aggregate
    boolean Column."""

    name: str
    metric: Column
    passed: Column


def completeness(col: str) -> Expectation:
    """Fraction of non-null values; passes only when 1.0."""
    nn = F.sum(F.col(col).isNotNull().cast("long"))
    total = F.count(F.lit(1))
    frac = nn.cast("double") / total
    return Expectation(f"completeness({col})", frac, nn == total)


def uniqueness(col: str) -> Expectation:
    """Distinct-to-total ratio; passes only when the column is a key."""
    d = F.count_distinct(F.col(col))
    total = F.count(F.lit(1))
    return Expectation(f"uniqueness({col})", d.cast("double") / total, d == total)


def min_bound(col: str, lo: float) -> Expectation:
    """Observed minimum (reported as the metric); passes when >= lo."""
    m = F.min(F.col(col))
    return Expectation(f"min({col})>={lo:g}", m.cast("double"), m >= lo)


def max_bound(col: str, hi: float) -> Expectation:
    """Observed maximum; passes when <= hi."""
    m = F.max(F.col(col))
    return Expectation(f"max({col})<={hi:g}", m.cast("double"), m <= hi)


def values_in(col: str, allowed: tuple[str, ...]) -> Expectation:
    """Fraction of rows whose value is in the allowed set (nulls fail);
    passes only when every row conforms."""
    ok = F.sum(F.col(col).isin(*allowed).cast("long"))
    total = F.count(F.lit(1))
    return Expectation(
        f"values_in({col})", ok.cast("double") / total, ok == total
    )


def non_negative(col: str) -> Expectation:
    """Fraction of rows >= 0 (nulls fail); passes when all are."""
    ok = F.sum((F.col(col) >= 0).cast("long"))
    total = F.count(F.lit(1))
    return Expectation(
        f"non_negative({col})", ok.cast("double") / total, ok == total
    )


def row_count_at_least(n: int) -> Expectation:
    """Table-level volume floor; metric is the row count itself."""
    total = F.count(F.lit(1))
    return Expectation(
        f"row_count>={n}", total.cast("double"), total >= n
    )


def check(df: DataFrame, expectations: list[Expectation]) -> DataFrame:
    """Evaluate all expectations in ONE aggregation over ``df`` and
    return the report: (constraint, metric_x1e6, passed), one row per
    expectation. The aggregate emits a single row of 2N columns; the
    in-plan stack() explode converts it to the report shape without a
    second job. COUNT(DISTINCT) constraints expand to the standard
    two-phase distinct aggregate alongside the plain partials — still
    one scan of the input."""
    if not expectations:
        raise ValueError("check() requires at least one expectation")
    aggs: list[Column] = []
    for i, e in enumerate(expectations):
        aggs.append(
            F.floor(e.metric * SCALE + F.lit(0.5)).cast("bigint").alias(f"m{i}")
        )
        aggs.append(e.passed.cast("int").alias(f"p{i}"))
    one = df.agg(*aggs)
    # names are spliced into generated SQL: escape quotes so a name
    # containing ' (user-built Expectation, odd column name) cannot
    # break the literal or mislabel report rows
    pairs = ", ".join(
        f"""'{e.name.replace("'", "''")}', m{i}, p{i}"""
        for i, e in enumerate(expectations)
    )
    n = len(expectations)
    return one.select(
        F.expr(
            # `check_name`, not `constraint`: CONSTRAINT is a reserved
            # word in ANSI engines (DuckDB rejects it as a bare alias)
            f"stack({n}, {pairs}) AS (check_name, metric_x1e6, passed)"
        )
    )

"""The --jitter-libm environment-seam audit (VERDICT r7 items 3 + 8):
transcendental libm functions (ln/exp/pow/trig) are the one place two
conforming engines may legitimately disagree (last-ulp), so every
hashed query whose oracle calls one must carry enough pin headroom.
These tests pin the rewriter's semantics and run the real audit at
sf0.001 — DuckDB-only, no Spark session needed."""

from __future__ import annotations

import math
import os
import sys

import duckdb
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "scripts"))

from check_oracle import _JITTER_KS, jitter_libm_sql, value_hash  # noqa: E402

SF = "/root/testdata/sf0.001"


def _connect():
    con = duckdb.connect()
    for t in (
        "region nation customer supplier part orders lineitem events "
        "documents embeddings"
    ).split():
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{SF}/{t}.parquet')"
        )
    return con


def test_rewriter_perturbs_only_libm_calls():
    con = duckdb.connect()
    # nested call: outer AND inner each get (1 + rel)
    rel = 0.5
    sql = "SELECT EXP(LN(2.0)) AS v"
    jit = jitter_libm_sql(sql, rel)
    (got,) = con.execute(jit).fetchone()
    want = math.exp(math.log(2.0) * (1 + rel)) * (1 + rel)
    assert got == pytest.approx(want, rel=1e-12)
    # SQRT is IEEE-correctly-rounded: never rewritten
    assert jitter_libm_sql("SELECT SQRT(x) FROM t", rel) == (
        "SELECT SQRT(x) FROM t"
    )
    # identifiers merely CONTAINING a function name are untouched, and
    # string literals are never rewritten
    assert jitter_libm_sql("SELECT explode, 'LN(1)' FROM t", rel) == (
        "SELECT explode, 'LN(1)' FROM t"
    )
    # rel = 0 is the identity transformation, proven by value
    sql2 = "SELECT ROUND(LN(3.0) * POW(2.0, 3), 6) AS v"
    assert (
        con.execute(jitter_libm_sql(sql2, 0.0)).fetchone()
        == con.execute(sql2).fetchone()
    )


def test_all_libm_oracles_hold_1024_ulp_headroom():
    """Every oracle that calls a transcendental must keep its value
    hash stable under +-1024-ulp relative perturbation of each libm
    result — the KM lesson (two driver hash-fail rounds) as a fence:
    a future hashed query pinning a transcendental too tightly fails
    HERE, before the driver ever sees it."""
    import __spark_entry__ as entrymod
    from check_oracle import _LIBM_RE

    con = _connect()
    weak = []
    audited = 0
    for name, sql in sorted(entrymod.oracle_sql().items()):
        if not _LIBM_RE.search(sql):
            continue
        audited += 1
        base = con.execute(sql)
        cols = [d[0] for d in base.description]
        h0 = value_hash(base.fetchall(), cols)
        for sign in (1.0, -1.0):
            jsql = jitter_libm_sql(sql, sign * 1024 * 2.0**-52)
            res = con.execute(jsql)
            h = value_hash(res.fetchall(), [d[0] for d in res.description])
            if h != h0:
                weak.append(name)
                break
    assert audited >= 6, f"libm oracle census shrank to {audited}"
    assert not weak, (
        f"libm pins with < 1024 ulps of headroom: {weak} — restructure "
        "to the rational/fixed-point discipline (see LIBM_AUDIT.md)"
    )
    assert _JITTER_KS[0] == 1  # escalation ladder starts at one ulp

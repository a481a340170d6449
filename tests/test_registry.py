"""Registry-wide smoke: every suite query analyzes (resolves its plan)
against sf0.001, and the fast majority also execute. This is the local
stand-in for the driver's t1; scripts/check_oracle.py is the full t2."""

from __future__ import annotations

import pytest

from c3dc_etl_spark.suite import REGISTRY

SF0001 = "/root/testdata/sf0.001"

# Heavier near-dup queries are covered by scripts/check_oracle.py and
# tests/test_dedup.py; skip their full execution here to keep pytest fast.
SLOW = {"dedup_minhash_lsh", "dedup_ngram_jaccard"}


@pytest.mark.parametrize("name", sorted(REGISTRY))
def test_query_analyzes_and_runs(spark, name):
    spec = REGISTRY[name]
    df = spec.fn(spark, SF0001)
    assert df.columns, f"{name}: empty schema"
    if name not in SLOW:
        assert df.count() >= 0


def test_every_query_has_doc_and_most_have_oracles():
    missing_oracle = [n for n, s in REGISTRY.items() if s.oracle is None]
    # only genuinely non-SQL-expressible ops may omit the oracle
    assert set(missing_oracle) <= {"multimodal_features"}, missing_oracle


def test_bench_cohorts_are_registry_queries():
    """bench.py's HEADLINE and ROTATION cohorts must name real registry
    queries (a rename breaks the bench loudly, not by shrinking the
    wall) and stay disjoint (a query in both would double-count and
    muddy the round-over-round headline comparison)."""
    import bench

    assert all(n in REGISTRY for n in bench.HEADLINE + bench.ROTATION), [
        n for n in bench.HEADLINE + bench.ROTATION if n not in REGISTRY
    ]
    assert not set(bench.HEADLINE) & set(bench.ROTATION)
    assert len(set(bench.ROTATION)) == len(bench.ROTATION)
    # r7 verdict #6: >= 80 distinct benched queries across r7+r8
    assert len(set(bench.HEADLINE) | set(bench.ROTATION)) >= 80


def test_entry_contract():
    import __spark_entry__ as e

    qs = e.queries()
    oracles = e.oracle_sql()
    assert set(oracles) <= set(qs)
    assert len(qs) >= 40
    # priority ordering: no typos, no duplicates, full registry coverage
    assert all(n in REGISTRY for n in e.PRIORITY), [
        n for n in e.PRIORITY if n not in REGISTRY
    ]
    assert len(set(e.PRIORITY)) == len(e.PRIORITY)
    assert set(qs) == set(REGISTRY)
    # rotation policy (round 8, per the r7 verdict): the 9 registry
    # queries that have never received a driver-dated CORRECTNESS row
    # (registry minus the union of r1-r7 ledger keys — derived from the
    # committed ledgers, not a hand-list) lead, then the two-round
    # hash-fail survival_kaplan_meier (libm-free this round), then the
    # driver-dated greens, stalest round first.
    import json
    import os

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    latest = {}
    for r in range(1, 8):
        with open(os.path.join(repo, f"CORRECTNESS_r0{r}.json")) as fh:
            for k in json.load(fh):
                latest[k] = r
    never = {n for n in REGISTRY if n not in latest}
    order = list(qs)
    owed = len(never - {"survival_kaplan_meier"})
    assert set(order[:owed]) == never - {"survival_kaplan_meier"}
    assert order[owed] == "survival_kaplan_meier"
    # the tail is stalest-first by driver round (non-decreasing)
    rounds = [latest[n] for n in order[owed + 1 :]]
    assert rounds == sorted(rounds)

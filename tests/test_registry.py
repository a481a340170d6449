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
    # r8 verdict #5: each round's rotation cohort must be NEW wall-clock
    # coverage — disjoint from every already-committed BENCH ledger row
    # (the cumulative ledger only grows if the cohort truly rotates).
    # One parser serves the CI pin AND the derivation tool — a record-
    # shape change (like r8's queries -> rotation_queries rename) must
    # be handled once, not kept in sync across two copies.
    from scripts.rotate_cohorts import benched_and_times

    benched, _ = benched_and_times()
    # the ROTATION currently in bench.py is part of what the helper
    # reports (via BENCH_DETAIL from a local run); the disjointness
    # check is against rows committed by PRIOR rounds only
    prior = benched - set(bench.ROTATION)
    # the derivation must actually see the prior rotation cohorts, not
    # silently degrade to HEADLINE-only if the record shape drifts
    assert len(prior) > len(set(bench.HEADLINE)), (
        "BENCH ledger parse found no rotation rows — record shape drifted?"
    )
    overlap = set(bench.ROTATION) & prior
    assert not overlap, (
        f"rotation cohort repeats already-benched queries: {sorted(overlap)}"
    )


def test_scale_check_cohort_contract():
    """r8 verdict #2: the factor-5 scale_check is a rotating cohort —
    a fixed round-comparable core plus per-round adjudicated-heavy
    additions. Pins: all names are real registry queries (or custom
    runners), core and rotation are disjoint, the rotation is
    non-trivial (>= 6 queries), and the r8-named scale suspects are
    covered this round."""
    import bench

    from c3dc_etl_spark.suite import REGISTRY

    assert all(n in REGISTRY for n in bench.SCALE_CORE + bench.SCALE_ROTATION)
    assert not set(bench.SCALE_CORE) & set(bench.SCALE_ROTATION)
    assert len(set(bench.SCALE_ROTATION)) == len(bench.SCALE_ROTATION) >= 6
    assert bench.SCALE_QUERIES == bench.SCALE_CORE + bench.SCALE_ROTATION
    # round 12 (r11 verdict asks #1/#6/#8): the growth tier lands WITH
    # its x5 rows, the at-scale SemDeDup form replaces the uncapped
    # query's seat, and the two environment-bound watch-list walls get
    # x5 re-reads
    assert set(bench.SCALE_ROTATION) >= {
        "semantic_dedup_capped",
        "table_log_update_dv",
        "table_log_dv_change_feed",
        "dedup_prefix_filter",
    }
    # and prior cohorts' rows must survive the rotation in the
    # cumulative ledger — rotating out never forgets
    import json
    import os

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with open(os.path.join(repo, "SCALE_LEDGER.json")) as fh:
        ledger = json.load(fh)
    assert {
        "record_linkage_blocked",
        "dedup_prefix_filter",
        "dedup_edit_distance",
        "ann_ivfpq_recall",
        "bootstrap_mean_ci",
        "triangle_count_coorder",
        "table_log_snapshot_read",  # r10 tablelog cohort
        "table_log_change_feed",
    } <= set(ledger)


def test_scale_ledger_is_total_over_registry():
    """VERDICT r10 ask #3: ``registry − ledger = ∅`` must be testable.
    Every registry query has EITHER a measured factor-5 linearity row,
    an explicit per-row ``adjudicated`` entry (the fixture-bound
    source/sink/config probes whose inputs do not scale with sf), or a
    seat in the CURRENT scale cohorts (measured when bench.py next
    runs)."""
    import json
    import os

    import bench

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with open(os.path.join(repo, "SCALE_LEDGER.json")) as fh:
        ledger = json.load(fh)
    covered = (
        set(ledger)
        | set(bench.SCALE_CORE)
        | set(bench.SCALE_ROTATION)
        | set(bench.CUSTOM_SCALE)
    )
    missing = sorted(n for n in REGISTRY if n not in covered)
    assert not missing, (
        f"registry queries with neither a scale row, an adjudication, "
        f"nor a current-cohort seat: {missing}"
    )


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
    # rotation policy (round 10, per the r9 verdict items 1-2):
    # PRIORITY is urgency-tier first (never-tested/red, live seed,
    # direct change, indirect change, unchanged), stalest-first within
    # each tier. __spark_entry__ derives it at import from the SAME
    # functions used here — the equality assert guards the fallback
    # path from engaging silently; the structural asserts verify the
    # ORDER invariant independently of the shared derivation code.
    from scripts.rotate_cohorts import (
        ledger_latest,
        priority_order,
        priority_tiers,
    )

    assert e.PRIORITY == priority_order()
    latest = ledger_latest()
    tiers = priority_tiers()
    keys = [(tiers[n], latest.get(n, 0), n) for n in e.PRIORITY]
    assert keys == sorted(keys), "PRIORITY violates (tier, round, name)"
    # a new (never driver-dated) registry query must land in tier 0,
    # not be silently appended
    assert all(tiers[n] == 0 for n in REGISTRY if n not in latest)
    # the hand-adjudicated seed set (r9 verdict item 2's named queries)
    # must sit inside the driver's ~50-query window until certified
    from scripts.rotate_cohorts import CHANGED_SEED

    live_seed = {
        n for n, rnd in CHANGED_SEED.items()
        if n in REGISTRY and latest.get(n, 0) < rnd
    }
    window = set(e.PRIORITY[:50])
    assert live_seed <= window, sorted(live_seed - window)


def test_cumulative_ledgers_name_registry_queries():
    """BENCH_LEDGER.json (builder sweep walls) and SCALE_LEDGER.json
    (factor-5 linearity rows) are cumulative committed artifacts that
    rotate_cohorts.py derives cohorts from — a renamed query must fail
    here, not silently orphan its ledger rows. Scale rows must also
    carry the full measurement record (factor, both walls)."""
    import json
    import os

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    bench_ledger = os.path.join(repo, "BENCH_LEDGER.json")
    if os.path.exists(bench_ledger):
        with open(bench_ledger) as fh:
            rows = json.load(fh)
        orphans = sorted(n for n in rows if n not in REGISTRY)
        assert not orphans, f"BENCH_LEDGER rows for unknown queries: {orphans}"
        assert all(
            ("wall_s" in r) ^ ("error" in r) for r in rows.values()
        ), "each sweep row is a wall time or a recorded error, never both"
    scale_ledger = os.path.join(repo, "SCALE_LEDGER.json")
    if os.path.exists(scale_ledger):
        with open(scale_ledger) as fh:
            rows = json.load(fh)
        import bench

        known = set(REGISTRY) | set(bench.CUSTOM_SCALE)
        orphans = sorted(n for n in rows if n not in known)
        assert not orphans, f"SCALE_LEDGER rows for unknown queries: {orphans}"
        for name, r in rows.items():
            # a row is a full measurement record, or an explicit
            # adjudication (fixture-bound probes — VERDICT r10 ask #3)
            assert (
                {"linearity", "factor", "base_s", "scaled_s"} <= set(r)
                or "adjudicated" in r
            ), name

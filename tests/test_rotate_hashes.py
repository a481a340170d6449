"""scripts/rotate_cohorts.py change-detection ledger (r9 verdict item
2): per-query content hashes, the derived certified view, and the
changed-since-driver-date bucket that heads PRIORITY."""

from __future__ import annotations

import json

import pytest

from scripts import rotate_cohorts as rc


def test_query_hashes_cover_registry_and_are_stable():
    from c3dc_etl_spark.suite import REGISTRY

    h1 = rc.query_hashes()
    assert set(h1) == set(REGISTRY)
    assert all(len(v) == 16 for v in h1.values())
    # deterministic across calls (the driver machine must derive the
    # same PRIORITY from the same commit)
    assert h1 == rc.query_hashes()


def test_module_closure_includes_first_level_operator_imports():
    files = rc._module_closure("c3dc_etl_spark.suite.warehouse_ops")
    names = {f.rsplit("/", 1)[-1] for f in files}
    assert "warehouse_ops.py" in names
    # the suite module imports the operator module it exercises — a
    # semantic change there must flip the query hash
    assert "warehouse.py" in names


def test_changed_bucket_follows_certified_hashes(tmp_path, monkeypatch):
    """A query whose current hash differs from its driver-certified
    hash is changed; a matching hash is not; a never-tested query
    always is; with git bootstrap unavailable, the seed only fires
    while the latest driver round predates the seeded round."""
    latest = {"a": 5, "b": 5, "c": 0, "record_linkage_blocked": 8}
    current = {"a": "h-new", "b": "h-b", "c": "h-c",
               "record_linkage_blocked": "h-l"}
    ledger = tmp_path / "QUERY_HASHES.json"
    ledger.write_text(json.dumps({
        "snapshot_round": 6,
        "snapshot": {},
        "certified": {
            "a": {"round": 5, "hash": "h-old"},
            "b": {"round": 5, "hash": "h-b"},
        },
    }))
    monkeypatch.setattr(rc, "QUERY_HASHES_FILE", str(ledger))
    # isolate the seed-fallback path from the live git history; the
    # live CHANGED_SEED is empty now that every r9 entry self-retired
    # (round 11), so pin a synthetic seed to keep the fallback tested
    monkeypatch.setattr(rc, "_bootstrap_changed", lambda name, lr: None)
    monkeypatch.setattr(rc, "CHANGED_SEED", {"record_linkage_blocked": 9})
    changed = rc.changed_queries(latest, current)
    assert changed == {"a", "c", "record_linkage_blocked"}
    # once the driver certifies the seeded query at round >= seed
    # round, the seed entry is inert
    latest2 = dict(latest, record_linkage_blocked=9)
    assert "record_linkage_blocked" not in rc.changed_queries(
        latest2, current
    )


def test_red_latest_row_is_always_changed(monkeypatch):
    """A query whose LATEST driver row is red must be flagged for
    re-verification, never treated as freshly certified (r10 review
    finding #2)."""
    latest = {"x": 9}
    rows = {"x": {"round": 9, "row": {"rows_match": True,
                                      "schema_match": True,
                                      "hash_match": False, "err": None}}}
    monkeypatch.setattr(rc, "_bootstrap_changed", lambda name, lr: None)
    monkeypatch.setattr(rc, "certified_view", lambda: {})
    assert rc.changed_queries(latest, {"x": "h"}, rows) == {"x"}
    # green latest row with no other signal -> unchanged
    rows_g = {"x": {"round": 9, "row": {"rows_match": True,
                                        "schema_match": True,
                                        "hash_match": True, "err": None}}}
    assert rc.changed_queries(latest, {"x": "h"}, rows_g) == set()


def test_git_bootstrap_sees_post_certification_edits():
    """The git-blob bootstrap must answer for real history: a round-10
    edited module (operators/selection.py feeds exact_median_selection)
    differs from the round-8 tree, and the derivation reports it."""
    from c3dc_etl_spark.suite import REGISTRY

    if rc._driver_commit(8) is None:
        pytest.skip("git history unavailable")
    spec = REGISTRY["exact_median_selection"]
    fn = getattr(spec.fn, "__wrapped__", spec.fn)
    assert rc._closure_changed_since(fn.__module__, 8) is True


def test_certified_view_absorbs_snapshot_round_ledger(tmp_path, monkeypatch):
    """When CORRECTNESS_r{N} lands for the committed snapshot round N,
    the derived view certifies each green row at the snapshot's hash —
    before --snapshot is re-run (round-start imports must see it)."""
    repo = tmp_path
    ledger = repo / "QUERY_HASHES.json"
    ledger.write_text(json.dumps({
        "snapshot_round": 7,
        "snapshot": {"a": "h-a", "b": "h-b", "d": "h-d"},
        "certified": {"a": {"round": 5, "hash": "h-a-old"}},
    }))
    (repo / "CORRECTNESS_r07.json").write_text(json.dumps({
        "a": {"rows_match": True, "schema_match": True,
              "hash_match": True, "err": None},
        "b": {"rows_match": True, "schema_match": True,
              "hash_match": False, "err": None},  # NOT green
        "d": {"rows_match": True, "err": None},   # rows-only green
    }))
    monkeypatch.setattr(rc, "QUERY_HASHES_FILE", str(ledger))
    monkeypatch.setattr(rc, "REPO", str(repo))
    view = rc.certified_view()
    assert view["a"] == {"round": 7, "hash": "h-a"}
    assert view["d"] == {"round": 7, "hash": "h-d"}
    assert "b" not in view  # red row certifies nothing


def test_committed_hash_ledger_matches_current_code():
    """The committed QUERY_HASHES.json snapshot must be regenerated
    (scripts/rotate_cohorts.py --snapshot) before the round's final
    commit — a stale snapshot would certify hashes the driver never
    tested. Red here = run the snapshot; it is part of the runbook."""
    import os

    if not os.path.exists(rc.QUERY_HASHES_FILE):
        pytest.skip("no committed hash ledger yet")
    with open(rc.QUERY_HASHES_FILE) as fh:
        data = json.load(fh)
    assert data["snapshot"] == rc.query_hashes(), (
        "QUERY_HASHES.json is stale — rerun scripts/rotate_cohorts.py"
        " --snapshot before the final commit"
    )


def test_module_closure_is_transitive():
    """A second-level dependency (suite -> operators.similarity ->
    operators.skew) must be in the closure: editing the deep helper
    changes the query's semantics and must flip its hash."""
    files = rc._module_closure("c3dc_etl_spark.suite.similarity_ops")
    names = {f.rsplit("/", 1)[-1] for f in files}
    assert {"similarity_ops.py", "similarity.py", "skew.py"} <= names

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
    # rotation policy (round 4, VERDICT r3 ask #1): the driver's bounded
    # verification window (first 50 entries) must hold every query with
    # no driver-green row yet (new this round), the full set whose only
    # green row is round-1-dated, and the head of the r2-dated block —
    # the r3-green queries close the list and may rotate out.
    first50 = set(list(qs)[:50])
    for name in (
        # new this round
        "storage_staged_scan", "ann_ivf_recall",
        "streaming_session_late_data", "multimodal_decode_real",
        "contamination_bloom_filter", "interval_overlap_events",
        "sample_token_budget", "text_vocab_coverage",
        "multimodal_video_frames", "sample_split_assign",
        "corpus_snapshot_delta",
        # stale: last driver-green row is round 1
        "except_reconciliation", "distinct_count_per_node",
        "explode_subrecords", "typegroup_fanout_union",
        "pivot_long_to_wide", "json_flatten", "link_wiring_collect",
        "unpivot_wide_to_long", "text_token_counts", "text_fingerprint",
        # head of the r2-dated refresh block
        "engine_typegroup_fanout", "engine_sum_macros",
        "source_delimited_scan", "merge_first_wins_engine",
    ):
        assert name in first50, name

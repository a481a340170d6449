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
    # rotation policy: the driver's bounded verification window (first
    # 50 entries) must hold every query with no driver-green row yet
    # (new this round), every query fixed this round, and the stale
    # round-1-only set — r2-green flagships may rotate out.
    first50 = set(list(qs)[:50])
    for name in (
        # new this round
        "engine_field_splice", "source_workbook_scan",
        "source_jsondir_fileorder", "study_end_to_end",
        "config_merge_transformations", "mapping_static_validation",
        "reference_file_hashes", "document_assembly",
        "doc_chunk_windows", "text_bpe_token_count", "text_top_tokens",
        # fixed this round
        "engine_participant_node", "rowmapped_rule_build",
        "sink_duplicate_report", "streaming_windowed_counts",
        # stale round-1-only examples (rewritten since last check)
        "row_numbering_lineage", "theta_rule_join",
    ):
        assert name in first50, name

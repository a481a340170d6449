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
    # rotation policy (round 5, VERDICT r4 ask #1): the driver's bounded
    # verification window (first 50 entries) must hold the 36 round-4
    # session-3 queries (judge-verified but never driver-checked) plus
    # every round-5 addition; the r4-green block closes the list.
    first50 = set(list(qs)[:50])
    for name in (
        # round-4 session 3: judge-verified, no driver row yet
        "q4_priority_semijoin", "q13_order_distribution",
        "q16_supplier_variety", "q18_large_orders",
        "q19_disjunctive_revenue", "q22_dormant_customers",
        "scd2_dimension_build", "heavy_hitters_cms",
        "zorder_block_skipping", "record_linkage_blocked",
        "dq_expectations_report", "rolling_time_stats",
        "funnel_conversion", "pagerank_purchase_graph",
        "scd2_incremental_merge", "cohort_retention",
        "timeseries_gap_fill", "quantile_sketch_error",
        "ab_test_stats", "streaming_upsert_snapshot",
        "skew_salt_balance", "event_debounce",
        "source_json_column_extract", "label_propagation_vote",
        "exact_median_selection", "q7_nation_volume",
        "q9_product_profit", "q14_promo_revenue", "q15_top_supplier",
        "q17_small_quantity", "sketch_hll_distinct",
        "sketch_kmv_set_algebra", "scd2_point_in_time_join",
        "q2_best_balance_supplier", "agg_multi_distinct",
        "null_semantics_probe",
        # new in round 5
        "q8_market_share", "q10_returned_items", "q11_important_stock",
        "q12_shipmode_priority", "q20_potential_promotion",
        "q21_suppliers_kept_waiting", "table_log_snapshot_read",
        "table_log_time_travel", "table_log_merge_upsert",
        "table_log_pruned_read", "triangle_count_coorder",
        "ann_pq_adc_recall", "ann_ivfpq_recall",
    ):
        assert name in first50, name

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
    # rotation policy (round 6): stalest-first — every round-6 addition
    # plus the leading block of round-5 additions that never received a
    # driver-dated CORRECTNESS row must sit inside the driver's bounded
    # verification window (first 50 entries); the freshest (r5-green)
    # rows close the list.
    first50 = set(list(qs)[:50])
    for name in (
        # new in round 6
        "streaming_outer_join_eviction", "geo_grid_radius_join",
        "geo_nearest_neighbor", "geo_morton_cells",
        "table_log_constraint_enforce", "table_log_schema_evolution",
        "table_log_history_audit", "graph_kcore_bounded",
        "ewma_daily_events", "percentile_disc_cont_probe",
        "lateral_topk_per_group", "mmr_diversified_topk",
        "recursive_cte_native", "agg_rollup_hierarchy",
        "window_ignore_nulls_probe", "explode_outer_probe",
        "source_fixed_width_scan", "url_canonicalize_dedup",
        "higher_order_functions_probe", "string_functions_probe",
        "streaming_tablelog_upsert",
        "asof_join_tolerance",
        "fk_integrity_dashboard",
        "dp_noisy_release",
        "logreg_train_gd",
        "feature_hashing_vectorize", "trending_items_decay",
        "feature_standardize_zscore", "markov_next_event_eval",
        "survival_kaplan_meier",
        "langid_confusion_matrix", "temporal_reachability",
        "search_index_segment_merge",
        "aggregate_filter_probe",
        "table_log_merge_cdc_deletes",
        "argmax_aggregate_probe",
        "grouping_sets_probe",
        # round-5 additions with no driver row yet (leading block)
        "ann_filtered_topk", "regressor_train_gd", "regressor_eval_r2",
        "classifier_train_stump", "embedding_pca_covariance",
        "table_log_optimize_zorder", "table_log_delete_where",
        "sample_temperature_mixture", "event_transition_matrix",
        "link_prediction_common_neighbors", "table_log_change_feed",
        "table_log_zorder_pruned_read", "feature_winsorize_clip",
    ):
        assert name in first50, name

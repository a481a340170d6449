"""Physical-plan assertions: lock in the scale properties the engine
claims (pushdown, narrow node builds, no accidental shuffles)."""

from __future__ import annotations

from c3dc_etl_spark.harmonize.builder import build_node
from c3dc_etl_spark.mapping.compiler import CompilerContext
from c3dc_etl_spark.mapping.model import load_mappings
from c3dc_etl_spark.rowmapped import build_rowmapped_node, parse_rule_rows
from c3dc_etl_spark.schema.registry import SchemaRegistry
from c3dc_etl_spark.suite.registry import REGISTRY

REG = SchemaRegistry()
SF = "/root/testdata/sf0.001"


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_filter_project_pushes_predicates_and_prunes_columns(spark):
    df = REGISTRY["filter_project"].fn(spark, SF)
    plan = _plan(df)
    assert "PushedFilters: [" in plan
    assert "GreaterThan(l_quantity" in plan
    # only the referenced columns reach the scan
    read = [l for l in plan.splitlines() if "ReadSchema" in l][0]
    assert "l_comment" not in read and "l_shipdate" not in read


def test_build_node_is_shuffle_free(spark):
    maps = load_mappings(
        [
            {"output_field": "participant.participant_id", "source_field": "pid"},
            {"output_field": "participant.sex_at_birth", "source_field": "sex",
             "replacement_values": [{"old_value": "+", "new_value": "Unknown"}]},
        ]
    )
    src = spark.createDataFrame([("p1", "x")], "pid string, sex string")
    ctx = CompilerContext(registry=REG, row_identity=("pid",))
    out = build_node(src, "participant", maps, ctx)
    assert "Exchange" not in _plan(out)  # narrow map over the source


def test_rowmapped_build_is_shuffle_free(spark):
    rules = parse_rule_rows(
        [
            {"Source Variable Name": "f", "Source Permissible Values Code": "y",
             "treatment.treatment_id": "{uuid}",
             "treatment.treatment_type": "Surgery"},
            {"Source Variable Name": "f", "Source Permissible Values Code": "n",
             "treatment.treatment_id": "{uuid}",
             "treatment.treatment_type": "Chemotherapy"},
        ],
        "treatment",
    )
    src = spark.createDataFrame([("s1", "y")], "sid string, f string")
    ctx = CompilerContext(registry=REG, row_identity=("sid",))
    out = build_rowmapped_node(src, "treatment", rules, ctx)
    assert "Exchange" not in _plan(out)  # union of filters over one scan


def test_q1_aggregation_is_partial_then_final(spark):
    plan = _plan(REGISTRY["q1_pricing_summary"].fn(spark, SF))
    # exactly one exchange between partial and final hash aggregates
    assert plan.count("Exchange hashpartitioning") == 1
    assert plan.count("HashAggregate") >= 2


def test_broadcast_lookup_join_broadcasts_the_dim(spark):
    plan = _plan(REGISTRY["broadcast_lookup_join"].fn(spark, SF))
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_q3_topk_avoids_global_sort(spark):
    # ordered limit compiles to TakeOrderedAndProject (per-partition
    # top-k + merge), never a full global Sort
    plan = _plan(REGISTRY["q3_top_orders"].fn(spark, SF))
    assert "TakeOrderedAndProject" in plan


def test_link_wiring_collect_is_two_phase(spark):
    plan = _plan(REGISTRY["link_wiring_collect"].fn(spark, SF))
    assert "partial_collect_list" in plan  # map-side partial lists


def test_subrecord_explode_is_narrow(spark):
    # the sub-record ordinal comes from posexplode over a per-row
    # sorted array — the fan-out must not introduce a window or any
    # exchange
    plan = _plan(REGISTRY["explode_subrecords"].fn(spark, SF))
    assert "Exchange" not in plan
    assert "Window" not in plan
    assert "Generate" in plan  # the posexplode


def test_sampling_is_shuffle_free_and_codegen(spark):
    # hash sampling / mixture weighting must stay narrow: a single
    # filter (or filter+explode) over the scan, no exchange anywhere,
    # no Python evaluation
    strat = _plan(REGISTRY["sample_stratified_hash"].fn(spark, SF))
    mix = _plan(REGISTRY["sample_weighted_mixture"].fn(spark, SF))
    for plan in (strat, mix):
        assert "Exchange" not in plan
        assert "Python" not in plan  # no UDF fallback
    assert "Generate" in mix  # explode supplies the oversample copies


def test_cosine_topk_is_two_phase_salted(spark):
    # phase 1 ranks within (query, salt) buckets, phase 2 ranks the
    # survivors — never a per-query sort over the full scored set; and
    # Spark's WindowGroupLimit must prune to k rows per group BEFORE
    # each exchange (map-side partial top-k)
    plan = _plan(REGISTRY["ann_cosine_topk"].fn(spark, SF))
    assert plan.count("Window [row_number()") == 2
    assert "WindowGroupLimit" in plan and ", Partial" in plan


def test_pii_redaction_is_one_narrow_projection(spark):
    # chained regexp count/replace must fuse into a single codegen
    # projection: no hash shuffle, no join, no Python
    plan = _plan(REGISTRY["pii_redaction"].fn(spark, SF))
    assert "Exchange hashpartitioning" not in plan
    assert plan.count("Exchange") == 1  # only the single-file spread
    assert "Python" not in plan


def test_contamination_broadcasts_only_the_eval_set(spark):
    # the eval n-gram set broadcasts; the corpus side must stay
    # partitioned (shuffled on its own keys), never broadcast wholesale
    plan = _plan(REGISTRY["contamination_ngram_overlap"].fn(spark, SF))
    assert "BroadcastHashJoin [gram" in plan
    assert "CartesianProduct" not in plan
    assert "SortMergeJoin" not in plan


def test_sequence_packing_single_hash_shuffle(spark):
    # the manifest aggregation must reuse the window's shard
    # partitioning (prefix of the grouping keys) instead of adding a
    # second exchange
    plan = _plan(REGISTRY["sequence_packing"].fn(spark, SF))
    assert plan.count("Exchange hashpartitioning") == 1
    assert plan.count("Window") == 1
    assert "Python" not in plan


def test_repetition_mode_aggregates_partially(spark):
    # the per-(doc, gram) count and the per-doc mode must both partial
    # -aggregate map-side; the base-stats join stays broadcast
    plan = _plan(REGISTRY["text_repetition_stats"].fn(spark, SF))
    assert plan.count("HashAggregate") >= 4  # two partial+final pairs
    assert "BroadcastHashJoin" in plan
    assert "Python" not in plan


def test_domain_stats_multi_distinct_via_expand(spark):
    # two COUNT(DISTINCT)s compile to the expand rewrite (one scan),
    # not a self-join of two aggregations
    plan = _plan(REGISTRY["domain_stats"].fn(spark, SF))
    assert "Expand" in plan
    assert "Join" not in plan


def test_asof_join_is_window_not_range_join(spark):
    # the as-of lookup must compile to one window pass (single user_id
    # exchange), never an inequality join
    plan = _plan(REGISTRY["asof_join_events"].fn(spark, SF))
    assert plan.count("Exchange") == 1
    assert "Join" not in plan
    assert plan.count("Window") == 1


def test_sessionize_single_exchange(spark):
    # lag + running-sum windows and the session aggregation all share
    # the hash(user_id) partitioning: one exchange total
    plan = _plan(REGISTRY["sessionize_events"].fn(spark, SF))
    assert plan.count("Exchange") == 1
    assert "Join" not in plan


def test_bloom_contamination_broadcasts_only_bitset_words(spark):
    plan = _plan(REGISTRY["contamination_bloom_filter"].fn(spark, SF))
    # each of the k probe joins must be a BroadcastHashJoin of the tiny
    # word table — never a shuffle join of corpus-sized sides and never
    # a nested loop
    assert plan.count("BroadcastHashJoin") >= 2
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_interval_overlap_join_is_bucket_equi_join(spark):
    plan = _plan(REGISTRY["interval_overlap_events"].fn(spark, SF))
    # the two-inequality overlap predicate must ride a bucket EQUI-join
    # (hash-partitionable), not the BroadcastNestedLoopJoin the naive
    # join plans; no pair-level dedup shuffle either
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    assert "__b" in plan  # bucket key reached the join
    # single-bucket attribution means no dropDuplicates on pairs
    assert "HashAggregate(keys=[signup_id" in plan or "signup_id" in plan

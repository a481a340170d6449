"""Unit tests for c3dc_etl_spark.operators.sampling."""

from __future__ import annotations

from pyspark.sql import functions as F

from c3dc_etl_spark.operators import sampling as SA


def _keyed(spark, n=400):
    return spark.range(n).select(
        F.col("id").alias("k"),
        (F.col("id") % 4).cast("string").alias("stratum"),
    )


def test_hash_sample_deterministic_and_partition_invariant(spark):
    df = _keyed(spark)
    a = {r["k"] for r in SA.hash_sample(df, "k", 0.3).collect()}
    b = {r["k"] for r in SA.hash_sample(df.repartition(7), "k", 0.3).collect()}
    assert a == b  # kept set independent of partitioning
    assert 0.15 < len(a) / 400 < 0.45  # fraction roughly respected


def test_hash_sample_co_samples_joined_tables(spark):
    docs = _keyed(spark)
    feats = docs.select("k", (F.col("k") * 10).alias("feature"))
    kept_docs = {r["k"] for r in SA.hash_sample(docs, "k", 0.5).collect()}
    kept_feats = {r["k"] for r in SA.hash_sample(feats, "k", 0.5).collect()}
    assert kept_docs == kept_feats  # same key -> same decision, any table


def test_seed_redraws_sample(spark):
    df = _keyed(spark)
    a = {r["k"] for r in SA.hash_sample(df, "k", 0.5, seed="s1").collect()}
    b = {r["k"] for r in SA.hash_sample(df, "k", 0.5, seed="s2").collect()}
    assert a != b


def test_stratified_fractions_and_default_drop(spark):
    df = _keyed(spark)
    out = SA.stratified_hash_sample(
        df, "k", "stratum", {"0": 1.0, "1": 0.5}, default=0.0
    )
    by = {s: c for s, c in out.groupBy("stratum").count().collect()}
    assert by["0"] == 100  # fraction 1.0 keeps everything
    assert 25 < by.get("1", 0) < 75
    assert "2" not in by and "3" not in by  # default 0.0 drops


def test_weighted_mixture_copies(spark):
    df = _keyed(spark)
    out = SA.weighted_mixture(df, "k", "stratum", {"0": 3.0, "1": 2.5, "2": 0.4})
    counts = {
        (r["stratum"], r["k"]): r["n"]
        for r in out.groupBy("stratum", "k").agg(F.count("*").alias("n")).collect()
    }
    s0 = [n for (s, _), n in counts.items() if s == "0"]
    s1 = [n for (s, _), n in counts.items() if s == "1"]
    s3 = [n for (s, _), n in counts.items() if s == "3"]
    assert set(s0) == {3}  # integer weight -> exact copies
    assert set(s1) <= {2, 3} and len(s0) == len(s1) == 100
    assert set(s3) == {1} and len(s3) == 100  # default weight 1.0 passes through
    # fractional-below-one weight keeps a subset, single copies
    s2 = [n for (s, _), n in counts.items() if s == "2"]
    assert set(s2) == {1} and 10 < len(s2) < 75
    # copy_num is 0-based and dense per row
    copies = out.filter((F.col("stratum") == "0")).groupBy("k").agg(
        F.sort_array(F.collect_list("copy_num")).alias("cs")
    )
    assert all(r["cs"] == [0, 1, 2] for r in copies.collect())


def test_domain_cap_sample_deterministic_and_capped(spark):
    from c3dc_etl_spark.operators.sampling import domain_cap_sample

    df = spark.createDataFrame(
        [(i, "big" if i < 80 else f"s{i % 3}") for i in range(100)],
        "doc_id long, source string",
    )
    out = domain_cap_sample(df, domain_col="source", id_col="doc_id", cap=5)
    rows = out.collect()
    per = {}
    for r in rows:
        per.setdefault(r["source"], set()).add(r["doc_id"])
    assert len(per["big"]) == 5                   # hot domain capped
    assert all(len(v) <= 5 for v in per.values())
    # the three small domains (~7 docs each) also cap at 5
    assert sum(len(v) for k, v in per.items() if k != "big") == 15
    # deterministic on a different partitioning
    again = domain_cap_sample(
        df.repartition(7), domain_col="source", id_col="doc_id", cap=5
    ).collect()
    assert {(r["doc_id"], r["source"]) for r in again} == {
        (r["doc_id"], r["source"]) for r in rows
    }


def test_token_budget_subset_prefix_semantics(spark):
    from pyspark.sql import functions as F

    from c3dc_etl_spark.operators.sampling import token_budget_subset

    df = spark.createDataFrame(
        [(i, " ".join(["w"] * (5 + i % 7))) for i in range(60)],
        "doc_id long, text string",
    )
    out = token_budget_subset(
        df, text_col="text", id_col="doc_id", budget_tokens=100
    ).collect()
    # running totals stay within budget and are consistent with counts
    cums = sorted(r["cum_tokens"] for r in out)
    assert cums and cums[-1] <= 100
    assert sum(r["n_tokens"] for r in out) == cums[-1]
    # the kept set is the PREFIX of the hash order: adding budget only
    # extends it
    bigger = token_budget_subset(
        df, text_col="text", id_col="doc_id", budget_tokens=200
    ).collect()
    assert {r["doc_id"] for r in out} <= {r["doc_id"] for r in bigger}
    # partitioning-invariant
    repart = token_budget_subset(
        df.repartition(13), text_col="text", id_col="doc_id", budget_tokens=100
    ).collect()
    assert sorted(map(tuple, out)) == sorted(map(tuple, repart))
    # empty text counts zero tokens and can ride along for free
    with_empty = df.union(
        spark.createDataFrame([(999, "")], "doc_id long, text string")
    )
    out2 = token_budget_subset(
        with_empty, text_col="text", id_col="doc_id", budget_tokens=100
    )
    empt = [r for r in out2.collect() if r["doc_id"] == 999]
    assert not empt or empt[0]["n_tokens"] == 0


def test_split_assign_bands_and_consistency(spark):
    import pytest
    from pyspark.sql import functions as F

    from c3dc_etl_spark.operators.sampling import split_assign

    df = spark.createDataFrame([(i,) for i in range(500)], "doc_id long")
    out = split_assign(
        df, id_col="doc_id", splits={"train": 0.8, "val": 0.1, "test": 0.1}
    )
    counts = {r["split"]: r["count"] for r in out.groupBy("split").count().collect()}
    assert set(counts) == {"train", "val", "test"}
    assert counts["train"] > counts["val"] and counts["train"] > counts["test"]
    # co-keyed tables derive the SAME split (leak-proofing)
    other = spark.createDataFrame([(i, i * 2) for i in range(500)],
                                  "doc_id long, payload long")
    a = {r["doc_id"]: r["split"] for r in out.collect()}
    b = {
        r["doc_id"]: r["split"]
        for r in split_assign(
            other, id_col="doc_id", splits={"train": 0.8, "val": 0.1, "test": 0.1}
        ).collect()
    }
    assert a == b
    # partitioning invariance
    c = {
        r["doc_id"]: r["split"]
        for r in split_assign(
            df.repartition(11), id_col="doc_id",
            splits={"train": 0.8, "val": 0.1, "test": 0.1},
        ).collect()
    }
    assert a == c
    with pytest.raises(ValueError, match="sum to 1"):
        split_assign(df, id_col="doc_id", splits={"train": 0.5, "val": 0.1})
    with pytest.raises(ValueError, match="empty"):
        split_assign(df, id_col="doc_id", splits={})


def test_snapshot_delta_statuses(spark):
    from c3dc_etl_spark.operators.dedup import snapshot_delta

    old = spark.createDataFrame(
        [(1, "alpha"), (2, "beta"), (3, "gamma")], "doc_id long, text string"
    )
    new = spark.createDataFrame(
        [(1, "alpha"), (2, "beta REVISED"), (4, "delta")],
        "doc_id long, text string",
    )
    got = {
        r["doc_id"]: r["status"]
        for r in snapshot_delta(old, new, id_col="doc_id", text_col="text").collect()
    }
    assert got == {1: "unchanged", 2: "changed", 3: "removed", 4: "added"}
    # digest normalization: whitespace/case changes are NOT "changed"
    new2 = spark.createDataFrame([(1, "  ALPHA ")], "doc_id long, text string")
    got2 = {
        r["doc_id"]: r["status"]
        for r in snapshot_delta(
            old.filter("doc_id = 1"), new2, id_col="doc_id", text_col="text"
        ).collect()
    }
    assert got2 == {1: "unchanged"}


def test_leakage_safe_split_groups_near_dups(spark):
    # pairs (0,1) and (1,2) connect transitively; 3 is a singleton.
    # Every member of the {0,1,2} component must draw the SAME split.
    from c3dc_etl_spark.operators.graph import dedup_assignment

    docs = spark.range(4).select(F.col("id").alias("doc_id"))
    pairs = spark.createDataFrame(
        [(0, 1), (1, 2)], "id_a long, id_b long"
    )
    assign = dedup_assignment(docs, pairs, node_col="doc_id")
    out = SA.split_assign(
        assign, id_col="component",
        splits={"train": 0.8, "val": 0.1, "test": 0.1},
    )
    rows = {r["doc_id"]: (r["component"], r["split"]) for r in out.collect()}
    assert rows[0][0] == rows[1][0] == rows[2][0] == 0
    assert rows[0][1] == rows[1][1] == rows[2][1]  # no straddle
    assert rows[3][0] == 3


def test_temperature_mixture_flattens_head_boosts_tail(spark):
    from c3dc_etl_spark.operators.sampling import temperature_mixture

    # 80/20 head-tail split: alpha=0.5 must downweight the head (w<1)
    # and upweight the tail (w>1), keeping expected size ~constant
    rows = [(i, "head" if i < 80 else "tail") for i in range(100)]
    df = spark.createDataFrame(rows, "id long, dom string")
    out = temperature_mixture(df, "id", "dom", alpha=0.5)
    got = out.groupBy("dom").count().collect()
    weights = {
        r["dom"]: r["mix_weight"]
        for r in out.select("dom", "mix_weight").distinct().collect()
    }
    assert weights["head"] < 1.0 < weights["tail"]
    counts = {r["dom"]: r["count"] for r in got}
    # exact expectation: sqrt rebalancing gives q_head = 2/3, q_tail = 1/3
    assert counts["head"] < 80 and counts["tail"] > 20
    total = counts["head"] + counts["tail"]
    assert 85 <= total <= 115  # expected size preserved up to hash noise


def test_temperature_mixture_partition_invariant(spark):
    from c3dc_etl_spark.operators.sampling import temperature_mixture

    rows = [(i, f"d{i % 7}") for i in range(200)]
    a = spark.createDataFrame(rows, "id long, dom string")
    one = sorted(
        tuple(r)
        for r in temperature_mixture(a, "id", "dom").select(
            "id", "dom", "copy_num"
        ).collect()
    )
    many = sorted(
        tuple(r)
        for r in temperature_mixture(a.repartition(16), "id", "dom").select(
            "id", "dom", "copy_num"
        ).collect()
    )
    assert one == many

"""Property tests for operators/warehouse.py: SCD2 tiling invariants,
count-min one-sided error, Morton interleave correctness, layout
skipping dominance, and blocked-linkage pair hygiene."""

from __future__ import annotations

from pyspark.sql import functions as F

from c3dc_etl_spark.operators import warehouse as W
from c3dc_etl_spark.suite import REGISTRY

SF = "/root/testdata/sf0.001"


def test_scd2_versions_tile_without_overlap(spark):
    rows = REGISTRY["scd2_dimension_build"].fn(spark, SF).collect()
    by_user: dict[int, list] = {}
    for r in rows:
        by_user.setdefault(r["user_id"], []).append(r)
    assert by_user
    for user, vs in by_user.items():
        vs.sort(key=lambda r: r["version"])
        # versions are 1..n dense
        assert [v["version"] for v in vs] == list(range(1, len(vs) + 1))
        # exactly one open current version, and it is the last
        currents = [v for v in vs if v["is_current"] == 1]
        assert len(currents) == 1 and currents[0] is vs[-1]
        assert vs[-1]["eff_to_us"] is None
        for a, b in zip(vs, vs[1:]):
            # ranges tile: next version starts exactly where this ends
            assert a["eff_to_us"] == b["eff_from_us"]
            assert a["eff_from_us"] < a["eff_to_us"]
            # consecutive versions differ in the tracked attribute
            assert a["event_type"] != b["event_type"]


def test_scd2_change_count_matches_log(spark):
    from c3dc_etl_spark.suite.registry import load

    ev = load(spark, SF, "events").orderBy("user_id", "ts_us", "event_id")
    log = [(r["user_id"], r["event_type"]) for r in ev.collect()]
    changes = 0
    prev: dict[int, str] = {}
    for user, et in log:
        if prev.get(user) != et:
            changes += 1
        prev[user] = et
    got = REGISTRY["scd2_dimension_build"].fn(spark, SF).count()
    assert got == changes


def test_cms_error_is_one_sided(spark):
    rows = REGISTRY["heavy_hitters_cms"].fn(spark, SF).collect()
    assert len(rows) > 0
    for r in rows:
        assert r["est_count"] >= r["exact_n"], r
        assert r["overest"] == r["est_count"] - r["exact_n"]


def test_morton_key_matches_python_reference(spark):
    def py_morton(x: int, y: int, bits: int = 8) -> int:
        out = 0
        for i in range(bits):
            out |= ((x >> i) & 1) << (2 * i)
            out |= ((y >> i) & 1) << (2 * i + 1)
        return out

    pts = [(0, 0), (1, 0), (0, 1), (255, 255), (170, 85), (37, 201)]
    df = spark.createDataFrame(pts, "x long, y long").select(
        "x", "y", W.morton_key(F.col("x"), F.col("y"), bits=8).alias("m")
    )
    for r in df.collect():
        assert r["m"] == py_morton(r["x"], r["y"]), (r["x"], r["y"])
        assert 0 <= r["m"] < 1 << 16


def test_zorder_skips_at_least_as_much_as_linear(spark):
    rows = {
        r["layout"]: r
        for r in REGISTRY["zorder_block_skipping"].fn(spark, SF).collect()
    }
    z, lin = rows["zorder"], rows["linear"]
    assert z["rows_total"] == lin["rows_total"] > 0
    assert z["blocks_touched"] <= lin["blocks_touched"]
    assert z["rows_touched"] <= lin["rows_touched"]
    # the measurement must be live: neither layout degenerates to
    # touching everything or nothing
    assert 0 < z["rows_touched"] < z["rows_total"]


def test_linkage_pairs_unordered_once_and_matches_bounded(spark):
    from c3dc_etl_spark.suite.registry import load

    cust = load(spark, SF, "customer")
    pairs = W.blocked_linkage_pairs(
        cust,
        id_col="c_custkey",
        name_col="c_name",
        block_col="c_nationkey",
        max_edit_distance=1,
    )
    got = pairs.collect()
    seen = set()
    for r in got:
        assert r["id_a"] < r["id_b"]
        key = (r["id_a"], r["id_b"])
        assert key not in seen, "pair emitted twice"
        seen.add(key)
        # thresholded scoring: exact distance within the threshold,
        # the -1 sentinel above it — never an unbounded distance
        assert r["edit_distance"] in (-1, 0, 1)
        assert r["is_match"] == int(r["edit_distance"] >= 0)
    # within-block pair counts are exactly n*(n-1)/2
    sizes = (
        cust.groupBy("c_nationkey").count().collect()
    )
    expect = sum(s["count"] * (s["count"] - 1) // 2 for s in sizes)
    assert len(got) == expect


def test_linkage_thresholded_is_match_equals_unbounded(spark):
    """r8 verdict #7 pin: the 3-arg thresholded Levenshtein must flag
    exactly the pairs the unbounded 2-arg form flags — the sentinel
    changes the cost model (banded DP), never the match set."""
    from c3dc_etl_spark.suite.registry import load

    cust = load(spark, SF, "customer")
    pairs = W.blocked_linkage_pairs(
        cust,
        id_col="c_custkey",
        name_col="c_name",
        block_col="c_nationkey",
        max_edit_distance=1,
    )
    ref = (
        pairs.drop("edit_distance", "is_match")
        .join(
            cust.select(
                F.col("c_custkey").alias("id_a"),
                F.col("c_name").alias("__na"),
            ),
            "id_a",
        )
        .join(
            cust.select(
                F.col("c_custkey").alias("id_b"),
                F.col("c_name").alias("__nb"),
            ),
            "id_b",
        )
        .withColumn(
            "ref_match",
            (F.levenshtein("__na", "__nb") <= 1).cast("int"),
        )
    )
    mism = (
        pairs.select("id_a", "id_b", "is_match")
        .join(ref.select("id_a", "id_b", "ref_match"), ["id_a", "id_b"])
        .filter(F.col("is_match") != F.col("ref_match"))
        .count()
    )
    assert mism == 0
    # and at least one genuine match exists so the pin is not vacuous
    assert pairs.filter(F.col("is_match") == 1).count() > 0


def test_linkage_block_cap_drops_oversized_blocks(spark):
    """block_cap wires drop_oversized_groups: a block above the cap is
    dropped wholesale before pairing; blocks at or under it survive."""
    from c3dc_etl_spark.suite.registry import load

    cust = load(spark, SF, "customer")
    sizes = {
        r["c_nationkey"]: r["count"]
        for r in cust.groupBy("c_nationkey").count().collect()
    }
    cap = sorted(sizes.values())[len(sizes) // 2]  # median size as cap
    pairs = W.blocked_linkage_pairs(
        cust,
        id_col="c_custkey",
        name_col="c_name",
        block_col="c_nationkey",
        max_edit_distance=1,
        block_cap=cap,
    ).collect()
    surviving = {r["block_key"] for r in pairs}
    # every oversized block is gone; every surviving block was in-cap
    # (blocks of size <2 emit no pair, so check only what appears)
    assert all(sizes[b] <= cap for b in surviving)
    assert not any(
        b in surviving for b, n in sizes.items() if n > cap
    )
    expect = sum(n * (n - 1) // 2 for n in sizes.values() if n <= cap)
    assert len(pairs) == expect


def test_dq_report_one_scan_and_failure_path(spark):
    df = REGISTRY["dq_expectations_report"].fn(spark, SF)
    rows = {r["check_name"]: r for r in df.collect()}
    assert len(rows) == 8
    # clean synthetic data passes everything except the deliberate bound
    assert rows["max(o_totalprice)<=100"]["passed"] == 0
    assert all(
        r["passed"] == 1
        for n, r in rows.items()
        if n != "max(o_totalprice)<=100"
    )
    # ratios are exact fixed-point: completeness/uniqueness are 1.0
    assert rows["uniqueness(o_orderkey)"]["metric_x1e6"] == 1_000_000
    # one-scan plan: exactly one FileScan of the orders parquet (after
    # execution AQE prints Final AND Initial plans — count the final only)
    plan = df._jdf.queryExecution().executedPlan().toString()
    final = plan.split("== Initial Plan ==")[0]
    assert final.count("FileScan") == 1


def test_rolling_window_matches_bruteforce(spark):
    rows = REGISTRY["rolling_time_stats"].fn(spark, SF).collect()
    from c3dc_etl_spark.suite.registry import load

    ev = sorted(
        (
            (r["user_id"], r["ts_us"], r["event_id"])
            for r in load(spark, SF, "events").collect()
        ),
    )
    by_user: dict[int, list[int]] = {}
    for u, ts, _ in ev:
        by_user.setdefault(u, []).append(ts)
    hour = 3_600_000_000
    for r in rows[:200]:
        tss = by_user[r["user_id"]]
        expect = sum(1 for t in tss if r["ts_us"] - (hour - 1) <= t <= r["ts_us"])
        assert r["n_1h"] == expect, (r["user_id"], r["ts_us"])
        assert r["n_1h"] >= 1  # frame always includes the current row


def test_funnel_stages_are_monotone(spark):
    rows = REGISTRY["funnel_conversion"].fn(spark, SF).collect()
    assert rows
    horizon = 24 * 3_600_000_000
    stages = {1: 0, 2: 0, 3: 0}
    for r in rows:
        stages[r["stage_reached"]] += 1
        if r["stage_reached"] >= 2:
            assert r["view_ts_us"] < r["click_ts_us"] <= r["view_ts_us"] + horizon
        else:
            assert r["click_ts_us"] is None
        if r["stage_reached"] == 3:
            assert (
                r["click_ts_us"] < r["purchase_ts_us"] <= r["click_ts_us"] + horizon
            )
        else:
            assert r["purchase_ts_us"] is None
    # funnel narrows (weakly) stage over stage and actually converts
    assert stages[3] > 0


def test_scd2_null_attr_is_a_real_version(spark):
    # a -> NULL -> b must produce three versions (IS DISTINCT FROM
    # semantics), and a key whose FIRST value is NULL still gets row 1
    rows = [
        (1, 10, 1, "a"),
        (1, 20, 2, None),
        (1, 30, 3, "b"),
        (2, 10, 4, None),
        (2, 20, 5, None),
        (2, 30, 6, "x"),
    ]
    df = spark.createDataFrame(rows, "k int, ts int, tb int, attr string")
    out = W.build_scd2(
        df, key_col="k", ts_col="ts", tiebreak_col="tb", attr_col="attr"
    ).collect()
    k1 = sorted((r["version"], r["attr"]) for r in out if r["k"] == 1)
    assert k1 == [(1, "a"), (2, None), (3, "b")]
    k2 = sorted((r["version"], r["attr"]) for r in out if r["k"] == 2)
    assert k2 == [(1, None), (2, "x")]


def test_cms_estimate_absent_probe_yields_zero_row(spark):
    items = spark.createDataFrame([("a",)] * 7 + [("b",)] * 3, "item string")
    sketch = W.cms_sketch(items, "item", depth=3, width=64)
    probes = spark.createDataFrame([("a",), ("never-seen",)], "item string")
    got = {
        r["item"]: r["est_count"]
        for r in W.cms_estimate(
            sketch, probes, "item", depth=3, width=64
        ).collect()
    }
    # every probe yields a row; unseen item's cells may all be empty
    # (width 64 >> 2 distinct items makes collisions unlikely) -> 0
    assert set(got) == {"a", "never-seen"}
    assert got["a"] >= 7
    assert got["never-seen"] in (0, 3)  # 0 unless it collides with a/b


def test_hash_bucket_null_propagates(spark):
    df = spark.createDataFrame([("x",), (None,)], "v string").select(
        W.hash_bucket(F.col("v"), "s", 16).alias("b")
    )
    got = [r["b"] for r in df.collect()]
    assert got[0] is not None and 0 <= got[0] < 16
    assert got[1] is None


def test_quantile_sketch_degenerate_domains(spark, tmp_path):
    import datetime

    sf = str(tmp_path)
    base = datetime.datetime(2024, 1, 1)
    const = spark.createDataFrame(
        [(i, 1, base, "view", 5.0) for i in range(10)],
        "event_id long, user_id long, ts timestamp, event_type string,"
        " value double",
    )
    const.write.parquet(f"{sf}/events.parquet")
    rows = REGISTRY["quantile_sketch_error"].fn(spark, sf).collect()
    assert len(rows) > 0
    for r in rows:
        assert r["est"] == 5.0 and r["exact"] == 5.0 and r["abs_err"] == 0.0

    sf2 = str(tmp_path / "empty")
    const.limit(0).write.parquet(f"{sf2}/events.parquet")
    assert REGISTRY["quantile_sketch_error"].fn(spark, sf2).count() == 0


def test_scd2_null_semantics_match_duckdb_oracle_form(spark):
    """The suite oracles mirror build_scd2 with LAG(1) + IS DISTINCT
    FROM; pin that BOTH engines produce identical versions on a log
    containing NULL attr values (the case the old `<>` form got wrong)."""
    import duckdb

    rows = [
        (1, 10, 1, "a"), (1, 20, 2, None), (1, 30, 3, None),
        (1, 40, 4, "b"), (2, 10, 5, None), (2, 20, 6, "x"),
    ]
    df = spark.createDataFrame(rows, "k int, ts int, tb int, attr string")
    got = sorted(
        (r["k"], r["version"], r["attr"])
        for r in W.build_scd2(
            df, key_col="k", ts_col="ts", tiebreak_col="tb", attr_col="attr"
        ).collect()
    )
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE t(k INT, ts INT, tb INT, attr VARCHAR)"
    )
    con.executemany("INSERT INTO t VALUES (?, ?, ?, ?)", rows)
    want = sorted(
        tuple(r)
        for r in con.execute("""
            WITH marked AS (
                SELECT k, ts, tb, attr,
                       LAG(attr) OVER w AS prev,
                       LAG(1) OVER w AS has_prev
                FROM t WINDOW w AS (PARTITION BY k ORDER BY ts, tb)
            ),
            changes AS (
                SELECT k, ts, tb, attr FROM marked
                WHERE has_prev IS NULL OR prev IS DISTINCT FROM attr
            )
            SELECT k, ROW_NUMBER() OVER (
                       PARTITION BY k ORDER BY ts, tb) AS version, attr
            FROM changes
        """).fetchall()
    )
    assert got == want
    # a -> NULL -> NULL -> b collapses the NULL run into ONE version
    assert [a for k, v, a in got if k == 1] == ["a", None, "b"]


def test_ivm_incremental_equals_direct_recompute(spark):
    """The maintained view must equal a from-scratch aggregation over
    the post-delta tables — recomputed here INSIDE Spark (the oracle
    proves the same fact cross-engine)."""
    orders = REGISTRY["view_incremental_maintenance"].fn(spark, SF)
    got = {
        (r["n_name"], r["month"]): (r["n_orders"], round(r["revenue"], 2))
        for r in orders.collect()
    }
    from c3dc_etl_spark.suite.registry import dec, load

    o = load(spark, SF, "orders").select(
        "o_orderkey",
        F.col("o_custkey").alias("c_custkey"),
        F.date_format("o_orderdate", "yyyy-MM").alias("month"),
        F.col("o_totalprice").alias("price"),
    )
    o1 = o.filter(F.col("o_orderkey") % 20 != 0).unionByName(
        o.filter(F.col("o_orderkey") % 20 == 1).withColumn(
            "price", F.col("price") + F.lit(10.0)
        )
    )
    c1 = load(spark, SF, "customer").select(
        "c_custkey",
        F.when(
            F.col("c_custkey") % 25 == 3, (F.col("c_nationkey") + 7) % 25
        )
        .otherwise(F.col("c_nationkey"))
        .alias("c_nationkey"),
    )
    n = load(spark, SF, "nation")
    want = {
        (r["n_name"], r["month"]): (r["n_orders"], round(r["revenue"], 2))
        for r in o1.join(c1, "c_custkey")
        .join(n, F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("n_name", "month")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_orders"),
            F.sum(dec("price")).cast("double").alias("revenue"),
        )
        .collect()
    }
    assert got == want


def test_ivm_retraction_drains_group(spark):
    """A delta deleting every row of a group must remove the group from
    the maintained view entirely (retraction, not a zero row)."""
    fact0 = spark.createDataFrame(
        [(1, "g1", 5.0), (1, "g1", 7.0), (2, "g2", 3.0)],
        "k int, grp string, price double",
    )
    dim0 = spark.createDataFrame([(1,), (2,)], "k int")
    dfact = spark.createDataFrame(
        [(1, "g1", 5.0, -1), (1, "g1", 7.0, -1)],
        "k int, grp string, price double, __sign int",
    )
    ddim = spark.createDataFrame([], "k int, __sign int")
    out = W.delta_join_agg_view(
        fact0, dfact, dim0, ddim, "k", ["grp"], F.col("price").cast("decimal(18,2)")
    ).collect()
    assert {r["grp"] for r in out} == {"g2"}
    (g2,) = out
    assert g2["n_rows"] == 1 and float(g2["measure_sum"]) == 3.0


def test_ivm_interaction_term_signs_multiply(spark):
    """An insert of a fact row whose dim row is simultaneously updated
    must credit the NEW dim group once and the old group never — only
    correct if the ΔF⋈ΔD term multiplies signs."""
    fact0 = spark.createDataFrame([], "k int, grp_unused string, price double")
    # dim carries the group; fact carries the measure
    dim0 = spark.createDataFrame([(1, "old")], "k int, grp string")
    dfact = spark.createDataFrame(
        [(1, 9.0, 1)], "k int, price double, __sign int"
    )
    ddim = spark.createDataFrame(
        [(1, "old", -1), (1, "new", 1)], "k int, grp string, __sign int"
    )
    out = W.delta_join_agg_view(
        fact0.select("k", "price"),
        dfact,
        dim0,
        ddim,
        "k",
        ["grp"],
        F.col("price").cast("decimal(18,2)"),
    ).collect()
    # ΔF⋈D0(old): +9 ; ΔF⋈ΔD: (+1)(-1) old -9, (+1)(+1) new +9
    # → old nets to zero rows and retracts; new holds the row.
    assert {(r["grp"], r["n_rows"], float(r["measure_sum"])) for r in out} == {
        ("new", 1, 9.0)
    }

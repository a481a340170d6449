"""Gap-fill, histogram-quantile, and A/B-stat properties."""

from __future__ import annotations

import math

from c3dc_etl_spark.suite import REGISTRY

SF = "/root/testdata/sf0.001"


def test_gap_fill_is_dense_and_locf(spark):
    rows = REGISTRY["timeseries_gap_fill"].fn(spark, SF).collect()
    by_user: dict[int, list] = {}
    for r in rows:
        by_user.setdefault(r["user_id"], []).append(r)
    assert by_user
    for u, rs in by_user.items():
        rs.sort(key=lambda r: r["day"])
        days = [r["day"] for r in rs]
        # dense: every day between first and last present exactly once
        assert days == list(range(days[0], days[-1] + 1))
        # first day is always an observation; fills carry the previous value
        assert rs[0]["observed"] == 1
        last = None
        for r in rs:
            if r["observed"] == 1:
                last = r["filled_value"]
            else:
                assert r["filled_value"] == last
            assert r["filled_value"] is not None


def test_quantile_estimates_bracket_exact(spark):
    rows = {r["p_pct"]: r for r in REGISTRY["quantile_sketch_error"].fn(spark, SF).collect()}
    assert set(rows) == {50, 90, 99}
    for p, r in rows.items():
        assert r["abs_err"] == round(abs(r["est"] - r["exact"]), 4)
        # a 64-bucket equi-width histogram cannot be off by more than
        # one bucket width; the value span bounds that loosely
        assert r["abs_err"] < (max(abs(r["est"]), abs(r["exact"])) + 1) * 0.5
    # quantiles are monotone in p for both paths
    assert rows[50]["est"] <= rows[90]["est"] <= rows[99]["est"]
    assert rows[50]["exact"] <= rows[90]["exact"] <= rows[99]["exact"]


def test_ab_stats_match_python(spark):
    from c3dc_etl_spark.suite.registry import load

    ev = load(spark, SF, "events").select("event_type", "value").collect()
    arms = {"click": [], "purchase": []}
    for r in ev:
        if r["event_type"] in arms:
            arms[r["event_type"]].append(round(r["value"], 6))
    got = REGISTRY["ab_test_stats"].fn(spark, SF).collect()[0]
    for arm, label in (("click", "a"), ("purchase", "b")):
        xs = arms[arm]
        n, mean = len(xs), sum(xs) / len(xs)
        var = sum((x - mean) ** 2 for x in xs) / (len(xs) - 1)
        assert got[f"n_{label}"] == n
        assert math.isclose(got[f"mean_{label}"], mean, abs_tol=1e-4)
        assert math.isclose(got[f"var_{label}"], var, rel_tol=1e-3)
    assert got["welch_t"] is not None


def test_exact_median_selection_matches_sorted(spark):
    got = REGISTRY["exact_median_selection"].fn(spark, SF).collect()[0]
    from c3dc_etl_spark.suite.registry import load

    vals = sorted(
        int(round(r["l_extendedprice"] * 100))
        for r in load(spark, SF, "lineitem").select("l_extendedprice").collect()
    )
    k = (len(vals) + 1) // 2
    assert got["n_rows"] == len(vals)
    assert got["median_cents"] == vals[k - 1]


def test_bootstrap_ci_brackets_mean_and_narrows_with_n(spark):
    from c3dc_etl_spark.suite.registry import REGISTRY

    fn = REGISTRY["bootstrap_mean_ci"].fn
    small = fn(spark, "/root/testdata/sf0.001").first()
    big = fn(spark, "/root/testdata/sf0.01").first()
    for r in (small, big):
        assert r["mean_lo"] <= r["mean_full"] <= r["mean_hi"]
    # 10x the sample -> the percentile CI must tighten (sqrt(n) law;
    # the gap is large enough that hash noise cannot flip it)
    assert (big["mean_hi"] - big["mean_lo"]) < (
        small["mean_hi"] - small["mean_lo"]
    )


def test_spearman_detects_monotone_and_ties(spark):
    from c3dc_etl_spark.suite.sketch_ops import _SPEARMAN_ORACLE  # noqa: F401
    from c3dc_etl_spark.suite.registry import REGISTRY  # noqa: F401
    # operator-level check via the same construction the query uses:
    # monotone (x, x^2) must give rho = 1 even with duplicated values
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    rows = [(x, x * x) for x in range(1, 30)] + [(5, 25), (10, 100)]
    base = spark.createDataFrame(rows, "x BIGINT, y BIGINT")

    def rank2(col):
        cnt = base.groupBy(F.col(col).alias("v")).agg(F.count(F.lit(1)).alias("t"))
        w = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, -1)
        return cnt.select(
            "v",
            (2 * F.coalesce(F.sum("t").over(w), F.lit(0)) + F.col("t") + F.lit(1)).alias("r2"),
        )

    xr = rank2("x").select(F.col("v").alias("x"), F.col("r2").alias("a"))
    yr = rank2("y").select(F.col("v").alias("y"), F.col("r2").alias("b"))
    j = base.join(xr, "x").join(yr, "y")
    d = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    s = j.agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.sum(d(F.col("a"))).cast("double").alias("sa"),
        F.sum(d(F.col("b"))).cast("double").alias("sb"),
        F.sum(d(F.col("a")) * d(F.col("b"))).cast("double").alias("sab"),
        F.sum(d(F.col("a")) * d(F.col("a"))).cast("double").alias("sa2"),
        F.sum(d(F.col("b")) * d(F.col("b"))).cast("double").alias("sb2"),
    ).first()
    n, sa, sb, sab, sa2, sb2 = (
        s["n"], s["sa"], s["sb"], s["sab"], s["sa2"], s["sb2"]
    )
    rho = (n * sab - sa * sb) / (
        ((n * sa2 - sa * sa) * (n * sb2 - sb * sb)) ** 0.5
    )
    assert abs(rho - 1.0) < 1e-12  # x -> x^2 is strictly monotone


def _daily_counts(spark, sf_dir=SF) -> list[int]:
    """Per-day event counts in day order (pure-python ground truth)."""
    from c3dc_etl_spark.suite.registry import DAY_US, load

    rows = load(spark, sf_dir, "events").select("ts_us").collect()
    by_day: dict[int, int] = {}
    for r in rows:
        d = int(r["ts_us"]) // DAY_US
        by_day[d] = by_day.get(d, 0) + 1
    return [by_day[d] for d in sorted(by_day)]


def test_acf_matches_python_recompute(spark):
    cs = _daily_counts(spark)
    n, t = len(cs), sum(cs)
    dev = [n * c - t for c in cs]  # integer-scaled deviations
    dd = sum(d * d for d in dev)
    got = {r["lag"]: r for r in REGISTRY["acf_daily_events"].fn(spark, SF).collect()}
    assert set(got) == set(range(1, 8))
    for k in range(1, 8):
        num = sum(dev[i] * dev[i + k] for i in range(n - k))
        r = got[k]
        assert r["n_days"] == n
        assert r["acf_num"] == float(num)
        assert r["acf_den"] == float(dd)
        assert r["acf"] == round(num / dd, 6) + 0.0
        assert -1.0 <= r["acf"] <= 1.0  # Cauchy-Schwarz bound


def test_seasonal_backtest_matches_python_recompute(spark):
    cs = _daily_counts(spark)
    ev = [(cs[i], cs[i - 7], cs[i - 1]) for i in range(7, len(cs))]
    mae7_num = sum(abs(c - f7) for c, f7, _ in ev)
    mae1_num = sum(abs(c - f1) for c, _, f1 in ev)
    got = REGISTRY["seasonal_naive_backtest"].fn(spark, SF).first()
    assert got["n_eval"] == len(ev)
    assert got["mae7_num"] == mae7_num
    assert got["mae1_num"] == mae1_num
    assert got["mase"] == round(mae7_num / mae1_num, 6) + 0.0
    q9 = sum(int(1e9 * abs(c - f7) / c + 0.5) for c, f7, _ in ev)
    assert got["mape"] == round(q9 / (1e9 * len(ev)), 6) + 0.0


def test_theilsen_matches_python_recompute(spark):
    cs = _daily_counts(spark)
    pairs = []
    for i in range(len(cs)):
        for j in range(i + 1, len(cs)):
            q9 = int(
                math.floor(1e9 * (cs[j] - cs[i]) / (j - i) + 0.5)
            )
            pairs.append((q9, i + 1, j + 1))
    pairs.sort()
    m = len(pairs)
    med = pairs[(m + 1) // 2 - 1]
    got = REGISTRY["theilsen_trend"].fn(spark, SF).first()
    assert got["n_days"] == len(cs)
    assert got["n_pairs"] == m
    assert (got["slope_q9"], got["witness_i"], got["witness_j"]) == med


def test_mad_anomaly_matches_python_recompute(spark):
    cs = _daily_counts(spark)
    got = sorted(
        REGISTRY["anomaly_mad_daily"].fn(spark, SF).collect(),
        key=lambda r: r["day"],
    )
    assert len(got) == len(cs)
    lower_med = lambda xs: sorted(xs)[(len(xs) + 1) // 2 - 1]  # noqa: E731
    for idx, r in enumerate(got):
        win = cs[max(0, idx - 15) : idx]
        if len(win) < 8:
            assert r["baseline_med"] is None and not r["is_anomaly"]
            continue
        med = lower_med(win)
        mad = lower_med([abs(x - med) for x in win])
        assert r["baseline_med"] == med
        assert r["baseline_mad"] == mad
        assert r["is_anomaly"] == (abs(cs[idx] - med) > 3 * mad)


def test_concurrency_sweep_matches_python_recompute(spark):
    from c3dc_etl_spark.suite.registry import DAY_US, load

    rows = load(spark, SF, "events").select("ts_us", "user_id").collect()
    iv: dict[tuple[int, int], list[int]] = {}
    for r in rows:
        key = (int(r["ts_us"]) // DAY_US, r["user_id"])
        t = int(r["ts_us"])
        if key in iv:
            iv[key][0] = min(iv[key][0], t)
            iv[key][1] = max(iv[key][1], t)
        else:
            iv[key] = [t, t]
    got = {
        r["day"]: r
        for r in REGISTRY["interval_concurrency_sweep"].fn(spark, SF).collect()
    }
    days = {d for d, _ in iv}
    assert set(got) == days
    for day in days:
        pts: dict[int, int] = {}
        n = 0
        for (d, _), (s, e) in iv.items():
            if d != day:
                continue
            n += 1
            pts[s] = pts.get(s, 0) + 1
            pts[e + 1] = pts.get(e + 1, 0) - 1
        run, peak, witness = 0, 0, None
        for t in sorted(pts):
            run += pts[t]
            if run > peak:
                peak, witness = run, t
        r = got[day]
        assert r["n_intervals"] == n
        assert r["max_concurrent"] == peak
        assert r["witness_ts_us"] == witness


def test_attribution_models_match_python_recompute(spark):
    import json as _json

    from c3dc_etl_spark.suite.registry import load
    from c3dc_etl_spark.suite.temporal_ops import _ATTR_LOOKBACK_US

    chs = ("email", "search", "social", "direct")
    rows = load(spark, SF, "events").select(
        "user_id", "ts_us", "event_type", "value", "props"
    ).collect()
    clicks: dict[int, list[tuple[int, str]]] = {}
    for r in rows:
        if r["event_type"] == "click":
            k = _json.loads(r["props"])["k"]
            clicks.setdefault(r["user_id"], []).append(
                (int(r["ts_us"]), chs[k % 4])
            )
    agg: dict[tuple[str, str], list] = {}
    for r in rows:
        if r["event_type"] != "purchase":
            continue
        t = int(r["ts_us"])
        win = [
            c
            for c in clicks.get(r["user_id"], [])
            if t - _ATTR_LOOKBACK_US <= c[0] <= t
        ]
        for model, pick in (
            ("first_touch", min(win) if win else None),
            ("last_touch", max(win) if win else None),
        ):
            key = (model, pick[1] if pick else "none")
            cell = agg.setdefault(key, [0, 0])
            cell[0] += 1
            cell[1] += round(r["value"] * 100)
    got = REGISTRY["attribution_first_last_touch"].fn(spark, SF).collect()
    assert len(got) == len(agg)
    for r in got:
        n, cents = agg[(r["model"], r["channel"])]
        assert r["n_purchases"] == n
        assert r["revenue"] == cents / 100.0

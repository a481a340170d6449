"""Cross-checks for the windowed-rollup family: the HLL-merged trailing
distinct estimate against its exact twin, and the sliding-window
expansion invariant."""

from __future__ import annotations

from c3dc_etl_spark.suite import REGISTRY

SF = "/root/testdata/sf0.001"


def test_rolling_hll_tracks_exact_within_sketch_error(spark):
    """The merged 16-register estimate must stay within the raw-HLL
    error envelope of the EXACT trailing distinct count (at m=16 the
    1-sigma relative error is ~1.04/sqrt(16) = 26%; allow 3 sigma).
    This pins that the per-day register MERGE really estimates the
    union — a bug that merged the wrong days would blow the envelope."""
    exact = {
        r["day"]: r["users_7d"]
        for r in REGISTRY["rolling_distinct_users"].fn(spark, SF).collect()
    }
    est = {
        r["day"]: r["est_centi"] / 100.0
        for r in REGISTRY["rolling_hll_users"].fn(spark, SF).collect()
    }
    assert set(exact) == set(est)
    for day, truth in exact.items():
        assert truth > 0
        rel = abs(est[day] - truth) / truth
        assert rel <= 3 * 1.04 / 4.0, (
            f"day {day}: estimate {est[day]} vs exact {truth} "
            f"(rel err {rel:.2f})"
        )


def test_sliding_windows_cover_each_event_exactly_twice(spark):
    """duration/slide = 2: summed window counts must equal exactly 2x
    the event count, and every window must span exactly one day."""
    rows = REGISTRY["streaming_sliding_windows"].fn(spark, SF).collect()
    n_events = (
        REGISTRY["streaming_sliding_windows"]
        .fn(spark, SF)
        .sparkSession.read.parquet(f"{SF}/events.parquet")
        .count()
    )
    assert sum(r["n_events"] for r in rows) == 2 * n_events
    day_us = 86_400_000_000
    for r in rows:
        assert r["win_end_us"] - r["win_start_us"] == day_us
        assert r["win_start_us"] % (day_us // 2) == 0

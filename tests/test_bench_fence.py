"""The PLANS.md normalized-wall comparison rule as code (VERDICT r11
ask #4): green on the committed comparison base, red on a synthetic
1.5x perturbation — so round-over-round adjudication is a diff, not an
essay."""

import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "scripts"))

import bench_fence  # noqa: E402


def _load():
    with open(os.path.join(REPO, "BENCH_DETAIL.json")) as fh:
        detail = json.load(fh)
    with open(bench_fence.FENCE) as fh:
        fence = json.load(fh)
    return detail, fence


def test_fence_green_on_committed_base():
    """Every offender in the COMMITTED artifact must carry a committed
    adjudication (the `_adjudicated` map in BENCH_FENCE.json) — a
    fresh regression with no reviewed same-code adjudication is red.
    This is the adjudication-as-a-diff contract: the fence flags, the
    builder proves code-vs-environment, the proof is committed."""
    detail, fence = _load()
    offenders = bench_fence.check(detail, fence)
    fresh = [o for o in offenders if "adjudicated" not in o]
    assert fresh == [], fresh
    # the comparison is non-vacuous: the committed base covers the
    # whole headline cohort plus the suite row
    comparable = set(bench_fence.normalized_walls(detail)) & set(fence)
    assert len(comparable) >= 20 and "__suite__" in comparable


def test_fence_red_on_synthetic_regression():
    detail, fence = _load()
    adjudicated = set(fence.get("_adjudicated") or {})
    # perturb the slowest NON-adjudicated committed headline query 1.5x
    victim = max(
        (
            q
            for q in detail["queries"]
            if q in fence and q not in adjudicated
        ),
        key=lambda q: detail["queries"][q],
    )
    detail["queries"][victim] *= 1.5
    offenders = [
        o
        for o in bench_fence.check(detail, fence)
        if "adjudicated" not in o
    ]
    assert [o["query"] for o in offenders] == [victim]
    assert offenders[0]["ratio"] >= 1.4
    # an adjudication is NOT a blanket pass: the adjudicated queries
    # still surface as offenders, just labeled
    labeled = [
        o for o in bench_fence.check(detail, fence) if "adjudicated" in o
    ]
    assert {o["query"] for o in labeled} <= adjudicated


def test_fence_skips_noise_and_rotation():
    """Sub-slack movers and queries absent from the base are not
    regressions: a 0.05 -> 0.09s flip is scheduling-floor noise, and a
    rotated-in query has no committed wall to compare against."""
    fence = {"tiny_query": 0.05, "__suite__": 50.0}
    detail = {
        "session_factor": 1.0,
        "queries": {"tiny_query": 0.09, "brand_new_query": 9.9},
        "value_normalized": 50.0,
    }
    assert bench_fence.check(detail, fence) == []
    # but a real mover above both gates is caught even when small-ish
    detail["queries"]["tiny_query"] = 0.3
    assert [o["query"] for o in bench_fence.check(detail, fence)] == [
        "tiny_query"
    ]


def test_fence_normalizes_by_session_factor():
    """A uniformly slow session (the r10 adjudication class) is NOT a
    regression: raw walls 1.4x up but session_factor 1.4 normalizes
    them back onto the committed base."""
    fence = {"q": 1.0, "__suite__": 10.0}
    detail = {
        "session_factor": 1.4,
        "queries": {"q": 1.4},
        "value_normalized": 10.0,
    }
    assert bench_fence.check(detail, fence) == []

"""Unit tests for operators.learning (fixed-point GD + exact stump)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from c3dc_etl_spark.operators import learning as L


# ---------------------------------------------------------------------------
# _tdiv: must match Spark `div` / DuckDB `//` (truncate toward zero)
# ---------------------------------------------------------------------------


@pytest.mark.parametrize(
    "a,b,expect",
    [(7, 2, 3), (-7, 2, -3), (7, -2, -3), (-7, -2, 3), (5, 5, 1), (-1, 3, 0)],
)
def test_tdiv_truncates_toward_zero(a, b, expect):
    assert L._tdiv(a, b) == expect


def test_tdiv_matches_spark_div(spark):
    cases = [(7, 2), (-7, 2), (7, -2), (-7, -2), (-1, 3), (100, 7), (-100, 7)]
    df = spark.createDataFrame(cases, "a BIGINT, b BIGINT")
    got = {
        (r["a"], r["b"]): r["q"]
        for r in df.select("a", "b", F.expr("a div b").alias("q")).collect()
    }
    for a, b in cases:
        assert got[(a, b)] == L._tdiv(a, b), (a, b)


# ---------------------------------------------------------------------------
# lsq_gd_train: convergence, partition invariance
# ---------------------------------------------------------------------------


def _toy_regression(spark, n_parts=1):
    # y = 3*x + 10 exactly, centered x and a scale-matched bias column
    # (feature scaling keeps plain GD well-conditioned): GD drives
    # R^2 -> 1 and the weights to exact fixed-point values.
    rows = [(3 * x + 10, 10, x) for x in range(-20, 21)]
    df = spark.createDataFrame(rows, "y BIGINT, bias10 BIGINT, x BIGINT")
    return df.repartition(n_parts) if n_parts > 1 else df


def test_gd_converges_on_exact_line(spark):
    df = _toy_regression(spark)
    hist, w = L.lsq_gd_train(df, ["bias10", "x"], "y", iterations=25, lr_den=150)
    r2 = L.lsq_r2(df, ["bias10", "x"], "y", w).first()["r2"]
    assert r2 > 0.999
    # slope == 3.0 and bias coefficient == 1.0 (x10 column) in micro-units
    assert abs(w[1] - 3 * L.FP) <= 1
    assert abs(w[0] - L.FP) <= 1


def test_gd_history_shape_and_final_row(spark):
    df = _toy_regression(spark)
    hist, w = L.lsq_gd_train(df, ["bias10", "x"], "y", iterations=5, lr_den=150)
    rows = hist.orderBy("iter").collect()
    assert [r["iter"] for r in rows] == [1, 2, 3, 4, 5]
    assert [rows[-1]["w_bias10"], rows[-1]["w_x"]] == w


def test_gd_partition_invariant(spark):
    # integer sums are order-independent: 1 partition == 16 partitions
    _, w1 = L.lsq_gd_train(
        _toy_regression(spark, 1), ["bias10", "x"], "y", iterations=6, lr_den=150
    )
    _, w16 = L.lsq_gd_train(
        _toy_regression(spark, 16), ["bias10", "x"], "y", iterations=6, lr_den=150
    )
    assert w1 == w16


# ---------------------------------------------------------------------------
# batch perceptron (design note): full-batch perceptron OSCILLATES on
# thin-margin data — the measured reason learning_ops ships GD + stump
# instead. Pure-python pin of the phenomenon.
# ---------------------------------------------------------------------------


def test_batch_perceptron_oscillates_on_thin_margin():
    # Threshold label at x >= 101 with a bias feature: the summed batch
    # update overshoots every iteration and the weight vector ping-pongs
    # between a "all-positive" and an "all-negative" regime forever
    # (sign of w_x alternates; misclassified count never reaches 0).
    # This is WHY learning_ops ships least-squares GD (strictly convex)
    # and the exact stump instead of a batch perceptron.
    data = [(1, 99, -1), (1, 100, -1), (1, 101, 1), (1, 102, 1)]
    w = [0, 0]
    signs = []
    mis_hist = []
    for _ in range(12):
        g = [0, 0]
        nm = 0
        for b, x, y in data:
            if y * (w[0] * b + w[1] * x) <= 0:
                nm += 1
                g[0] += y * b
                g[1] += y * x
        w = [w[0] + g[0], w[1] + g[1]]
        signs.append(w[1] > 0)
        mis_hist.append(nm)
    # w_x's sign alternates every iteration after the first
    assert all(signs[i] != signs[i + 1] for i in range(1, len(signs) - 1))
    # and training error never reaches zero
    assert min(mis_hist) > 0


# ---------------------------------------------------------------------------
# stump_train: matches a brute-force search; deterministic tiebreak
# ---------------------------------------------------------------------------


SC = 1_000_000_000


def _brute_stump(rows, names):
    """Purity-criterion reference: maximize the scaled integer score
    (pl^2+nl^2)*SC // n_l + (pr^2+nr^2)*SC // n_r (empty side -> 0),
    tiebreak (feature, val) — mirrors operators.learning.stump_train."""
    pos = sum(1 for r in rows if r[0] == 1)
    neg = len(rows) - pos
    best = None
    for j, name in enumerate(names, start=1):
        for v in sorted({r[j] for r in rows}):
            pl = sum(1 for r in rows if r[j] <= v and r[0] == 1)
            nl = sum(1 for r in rows if r[j] <= v and r[0] == -1)
            pr, nr = pos - pl, neg - nl
            score = (pl * pl + nl * nl) * SC // (pl + nl)
            if pr + nr:
                score += (pr * pr + nr * nr) * SC // (pr + nr)
            corr = max(pl, nl) + max(pr, nr)
            key = (-score, name, v, corr)
            if best is None or key < best:
                best = key
    return best


def test_stump_matches_bruteforce(spark):
    rows = [
        (1 if (a >= 5) != (b % 3 == 0) else -1, a, b)
        for a in range(10)
        for b in range(7)
    ]
    df = spark.createDataFrame(rows, "y BIGINT, fa BIGINT, fb BIGINT")
    got = L.stump_train(df, ["fa", "fb"], "y").first()
    _negs, feat, val, corr = _brute_stump(rows, ["fa", "fb"])
    assert (got["feature"], got["threshold"], got["n_correct"]) == (
        feat,
        val,
        corr,
    )
    assert got["n"] == len(rows)


def test_stump_tiebreak_prefers_first_feature_then_lowest_threshold(spark):
    # two identical features: every (feature, value) split scores the
    # same, so the (correct DESC, feature ASC, val ASC) order must pick
    # feature 'a' at its lowest optimal threshold — stable under
    # repartition.
    rows = [(1, 1, 1), (1, 2, 2), (-1, 3, 3), (-1, 4, 4)]
    df = spark.createDataFrame(rows, "y BIGINT, a BIGINT, b BIGINT")
    got = L.stump_train(df.repartition(8), ["a", "b"], "y").first()
    assert got["feature"] == "a"
    assert got["threshold"] == 2
    assert got["n_correct"] == 4
    assert got["left_label"] == 1 and got["right_label"] == -1


# ---------------------------------------------------------------------------
# corpus-level floors (the suite queries' docstring claims, pinned)
# ---------------------------------------------------------------------------


def test_gd_converges_on_documents_corpus(spark):
    from c3dc_etl_spark.suite.learning_ops import (
        GD_FEATURES,
        ITERS,
        LR_DEN,
        _gd_features,
    )

    feats = _gd_features(spark, "/root/testdata/sf0.001")
    _, w = L.lsq_gd_train(feats, GD_FEATURES, "y", iterations=ITERS, lr_den=LR_DEN)
    r2 = L.lsq_r2(feats, GD_FEATURES, "y", w).first()["r2"]
    assert r2 > 0.97  # n_chars is ~linear in token counts; GD must find it


def test_stump_high_accuracy_on_documents_corpus(spark):
    from c3dc_etl_spark.suite.learning_ops import classifier_train_stump

    got = classifier_train_stump(spark, "/root/testdata/sf0.001")
    row = got.first()
    assert row["accuracy"] > 0.95
    assert row["feature"] == "n_chars"  # the gate's dominant condition


def test_tree2_improves_on_stump_for_xor_ish_label(spark):
    # conjunction label (a >= 5 AND b >= 3): a single stump cannot
    # express it, the depth-2 greedy tree can get close/exact
    rows = [
        (1 if (a >= 5 and b >= 3) else -1, a, b)
        for a in range(10)
        for b in range(6)
    ]
    df = spark.createDataFrame(rows, "y BIGINT, fa BIGINT, fb BIGINT")
    stump = L.stump_train(df, ["fa", "fb"], "y").first()
    nodes = {r["node"]: r for r in L.tree2_train(df, ["fa", "fb"], "y").collect()}
    assert set(nodes) == {"root", "left", "right"}
    tree_correct = nodes["left"]["n_correct"] + nodes["right"]["n_correct"]
    assert tree_correct > stump["n_correct"]
    assert tree_correct == len(rows)  # conjunction is exactly depth-2
    assert nodes["left"]["n"] + nodes["right"]["n"] == nodes["root"]["n"]


def test_tree2_degenerates_when_a_side_is_empty(spark):
    # all values <= the best threshold on one feature: the right side
    # is empty -> no 'right' row, tree == stump on the left
    rows = [(1, 1), (1, 2), (-1, 3), (-1, 4)]
    df = spark.createDataFrame(rows, "y BIGINT, fa BIGINT")
    nodes = {r["node"]: r for r in L.tree2_train(df, ["fa"], "y").collect()}
    assert "root" in nodes
    # root threshold 2 separates perfectly; both sides pure -> each
    # side's stump is trivial but non-empty
    assert nodes["root"]["n_correct"] == 4

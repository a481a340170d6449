"""Unit tests for c3dc_etl_spark.operators.bpe."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from c3dc_etl_spark.operators import bpe as B


def _fold(spark, word, a, b):
    df = spark.createDataFrame([(word,)], "word string")
    out = df.select(
        B.merge_fold(B.framed_chars(F.col("word")), a, b).alias("s")
    ).collect()[0]["s"]
    return [x for x in out.split(B.SEP) if x != ""]


def test_merge_fold_basic_and_greedy_nonoverlap(spark):
    assert _fold(spark, "abc", "a", "b") == ["ab", "c"]
    # greedy left-to-right on overlapping runs: aaaa -> aa, aa; aaa -> aa, a
    assert _fold(spark, "aaaa", "a", "a") == ["aa", "aa"]
    assert _fold(spark, "aaa", "a", "a") == ["aa", "a"]
    # merged symbol does not re-trigger within the same pass
    assert _fold(spark, "abab", "a", "b") == ["ab", "ab"]
    assert _fold(spark, "xyz", "a", "b") == ["x", "y", "z"]


def test_bpe_train_learns_expected_merges(spark):
    docs = spark.createDataFrame(
        [(0, "aaab aaab"), (1, "aaab")], "doc_id long, text string"
    )
    learned, words = B.bpe_train(docs, merges=3)
    # freq(aaab) = 3; pairs (a,a)x2 and (a,b)x1 per word occurrence.
    # merge 1: (a,a) count 6. Then (aa,a) and (a,b) tie at 3 ->
    # lexicographic tie-break picks (a,b). merge 3: (aa,ab) count 3.
    assert learned == [("a", "a", 6), ("a", "b", 3), ("aa", "ab", 3)]
    # all three merges applied: aaab collapses to a single learned symbol
    final = {r["word"]: r["s"] for r in words.collect()}
    assert [x for x in final["aaab"].split(B.SEP) if x] == ["aaab"]


def test_bpe_train_validates_args(spark):
    docs = spark.createDataFrame([(0, "ab")], "doc_id long, text string")
    with pytest.raises(ValueError, match="merges"):
        B.bpe_train(docs, merges=0)


def _py_merge(syms: list[str], a: str, b: str) -> list[str]:
    """Reference greedy left-to-right non-overlapping merge."""
    out: list[str] = []
    i = 0
    while i < len(syms):
        if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
            out.append(a + b)
            i += 2
        else:
            out.append(syms[i])
            i += 1
    return out


def test_merge_fold_matches_reference_on_random_words(spark):
    from hypothesis import given, settings
    from hypothesis import strategies as st

    words: list[str] = []

    @settings(max_examples=200, deadline=None)
    @given(st.text(alphabet="ab", min_size=0, max_size=12))
    def collect(w):
        words.append(w)

    collect()
    cases = sorted(set(words))
    df = spark.createDataFrame([(w,) for w in cases], "word string")
    got = {
        r["word"]: [x for x in r["s"].split(B.SEP) if x != ""]
        for r in df.select(
            "word", B.merge_fold(B.framed_chars(F.col("word")), "a", "b").alias("s")
        ).collect()
    }
    for w in cases:
        assert got[w] == _py_merge(list(w), "a", "b"), w
    # and the self-pair (overlap-sensitive) case
    got_aa = {
        r["word"]: [x for x in r["s"].split(B.SEP) if x != ""]
        for r in df.select(
            "word", B.merge_fold(B.framed_chars(F.col("word")), "a", "a").alias("s")
        ).collect()
    }
    for w in cases:
        assert got_aa[w] == _py_merge(list(w), "a", "a"), w

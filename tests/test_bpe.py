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

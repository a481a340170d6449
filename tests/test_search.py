"""Unit tests for operators.search (inverted index, conjunctive match,
BM25 ranked retrieval)."""

from __future__ import annotations

import math

import pytest

from c3dc_etl_spark.operators import search as S

DOCS = [
    # (doc_id, text) — doc 3 is the only one with both 'rare' and
    # repeated 'cat'; doc 4 is long (length normalization target).
    (1, "cat dog fish"),
    (2, "dog dog bird"),
    (3, "rare cat cat dog"),
    (4, "cat " + "filler " * 40 + "dog"),
    (5, "   "),  # blank: tokenizes to nothing, must vanish
]


@pytest.fixture(scope="module")
def tf(spark):
    df = spark.createDataFrame(DOCS, "doc_id BIGINT, text STRING")
    return S.doc_term_freq(df, "text", "doc_id")


def test_doc_term_freq_counts_and_blank_doc(tf):
    rows = {(r["doc_id"], r["token"]): r["tf"] for r in tf.collect()}
    assert rows[(3, "cat")] == 2
    assert rows[(2, "dog")] == 2
    assert rows[(4, "filler")] == 40
    assert not any(d == 5 for d, _ in rows)  # blank doc emits no terms


def test_inverted_index_df_and_postings_head(tf):
    idx = {r["token"]: r for r in S.inverted_index(tf, postings_head=2).collect()}
    assert idx["dog"]["df"] == 4
    assert idx["dog"]["total_tf"] == 5
    # ascending doc ids, capped at postings_head
    assert idx["dog"]["postings_head"] == "1;2"
    assert idx["rare"]["postings_head"] == "3"


def test_conjunctive_match_requires_all_terms(tf):
    got = {r["doc_id"]: r for r in S.conjunctive_match(tf, ["cat", "dog"]).collect()}
    assert set(got) == {1, 3, 4}  # doc 2 has no 'cat'
    assert got[3]["total_tf"] == 3 and got[3]["min_tf"] == 1
    assert S.conjunctive_match(tf, ["cat", "bird"]).count() == 0


def _bm25_reference(tf_rows, terms, n_docs, avgdl, k):
    """Driver-side replay of the documented scoring (rational idf,
    1e-9 fixed point) for the tiny fixture."""
    dl = {}
    for d, _, f in tf_rows:
        dl[d] = dl.get(d, 0) + f
    dfreq = {}
    for d, t, _ in tf_rows:
        if t in terms:
            dfreq[t] = dfreq.get(t, 0) + 1
    scores = {}
    for d, t, f in tf_rows:
        if t not in terms:
            continue
        idf = (2 * n_docs - 2 * dfreq[t] + 1) / (2 * dfreq[t] + 1)
        denom = f + S.BM25_K1 * (
            (1.0 - S.BM25_B) + S.BM25_B * (dl[d] / avgdl)
        )
        fp = math.floor(
            idf * (f * (S.BM25_K1 + 1)) / denom * S.BM25_SCALE + 0.5
        )
        scores[d] = scores.get(d, 0) + fp
    ordered = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))[:k]
    return {d: fp for d, fp in ordered}


def test_bm25_matches_reference_and_ranks_rare_term_doc_first(tf):
    tf_rows = [(r["doc_id"], r["token"], r["tf"]) for r in tf.collect()]
    n_docs = len({d for d, _, _ in tf_rows})
    total = sum(f for _, _, f in tf_rows)
    avgdl = total / n_docs
    got = S.bm25_topk(tf, ["rare", "cat"], n_docs, avgdl, k=3).collect()
    want = _bm25_reference(tf_rows, {"rare", "cat"}, n_docs, avgdl, 3)
    assert [r["doc_id"] for r in got if r["rank"] == 1] == [3]
    assert {r["doc_id"]: r["score_fp"] for r in got} == want
    # ranks are 1..k dense and consistent with score order
    assert [r["rank"] for r in got] == [1, 2, 3]
    # long doc is length-penalized below the short cat docs
    ids = [r["doc_id"] for r in got]
    assert ids.index(1) < ids.index(4)


@pytest.fixture(scope="module")
def pos(spark):
    df = spark.createDataFrame(
        [
            (1, "go go stop go go"),
            (2, "go stop go stop"),
            (3, "stop   stop"),  # extra blanks: positions post-filter
            (4, "alpha beta gamma beta alpha"),
        ],
        "doc_id BIGINT, text STRING",
    )
    return S.doc_positions(df, "text", "doc_id")


def test_doc_positions_are_post_filter_indices(pos):
    got = {
        (r["doc_id"], r["pos"]): r["token"]
        for r in pos.filter("doc_id = 3").collect()
    }
    assert got == {(3, 0): "stop", (3, 1): "stop"}


def test_phrase_match_repeated_token_no_double_count(pos):
    # 'go go' in doc 1 at anchors 0 and 3 (positions 1-2 straddle 'go go'
    # only via overlapping pair 0-1? tokens: go go stop go go ->
    # adjacent equal pairs at (0,1) and (3,4)); doc 2 has none.
    got = {r["doc_id"]: r for r in S.phrase_match(pos, ["go", "go"]).collect()}
    assert set(got) == {1}
    assert got[1]["n_hits"] == 2 and got[1]["first_pos"] == 0


def test_phrase_match_ordered_terms(pos):
    got = {
        r["doc_id"]: r for r in S.phrase_match(pos, ["stop", "go"]).collect()
    }
    # doc 1: 'stop go' at 2; doc 2: at 1; doc 3/4: none
    assert set(got) == {1, 2}
    assert got[1]["first_pos"] == 2 and got[2]["first_pos"] == 1
    # three-term phrase, each slot must align
    got3 = {
        r["doc_id"]: r
        for r in S.phrase_match(pos, ["go", "stop", "go"]).collect()
    }
    assert set(got3) == {1, 2} and got3[1]["first_pos"] == 1


def test_proximity_match_window_and_min_dist(pos):
    got = {
        r["doc_id"]: r
        for r in S.proximity_match(pos, "alpha", "gamma", 2).collect()
    }
    assert set(got) == {4}
    assert got[4]["min_dist"] == 2 and got[4]["n_a"] == 2 and got[4]["n_b"] == 1
    # window too small -> excluded
    assert S.proximity_match(pos, "alpha", "gamma", 1).count() == 0


def test_bm25_score_is_exact_division_of_fixed_point(tf):
    rows = S.bm25_topk(tf, ["cat"], 5, 10.0, k=2).collect()
    for r in rows:
        assert r["score"] == r["score_fp"] / S.BM25_SCALE


def test_tfidf_weights_exact_integral_division(tf):
    n = 5
    w = {
        (r["doc_id"], r["token"]): (r["w"], r["df"])
        for r in S.tfidf_weights(tf, n).collect()
    }
    # doc 3 'cat': tf=2, df('cat')=3 -> (2*(2*5-2*3+1)*100) // (2*3+1)
    assert w[(3, "cat")] == ((2 * 5 * 100) // 7, 3)
    # rare term boosts: df('rare')=1 -> (1*(10-2+1)*100) // 3
    assert w[(3, "rare")] == ((9 * 100) // 3, 1)


def test_tfidf_cosine_pairs_rare_token_blocking(tf):
    # df cap 30% of 5 docs -> cap 1: only 'rare' (df=1) generates
    # candidates, and doc 3 is its lone holder -> no pairs at all
    assert S.tfidf_cosine_pairs(tf, 5, df_cap_pct=30).count() == 0
    # cap 60% -> 3: 'bird'(1), 'rare'(1), 'fish'(1), 'cat'(3) qualify
    got = {
        (r["doc_a"], r["doc_b"]): r
        for r in S.tfidf_cosine_pairs(tf, 5, df_cap_pct=60).collect()
    }
    assert set(got) == {(1, 3), (1, 4), (3, 4)}  # cat-sharers
    for r in got.values():
        # cosine in (0, 1], exact ints underneath
        assert 0.0 < r["cosine"] <= 1.0
        assert isinstance(r["dot_fp"], int) and r["dot_fp"] > 0
    # docs 1 and 3 share cat AND dog; 1 and 4 share cat, dog
    assert got[(1, 3)]["n_shared"] == 2

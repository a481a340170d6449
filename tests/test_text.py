"""Unit tests for c3dc_etl_spark.operators.text on tiny literal frames."""

from __future__ import annotations

from pyspark.sql import functions as F

from c3dc_etl_spark.operators import text as T


def _df(spark, rows):
    return spark.createDataFrame([(i, r) for i, r in enumerate(rows)], ["id", "txt"])


def test_token_count(spark):
    df = _df(spark, ["one two three", "  padded   spaces  ", "", "single"])
    got = {r["id"]: r["n"] for r in df.select("id", T.token_count("txt").alias("n")).collect()}
    assert got == {0: 3, 1: 2, 2: 0, 3: 1}


def test_bpe_ish_exceeds_word_count_for_long_words(spark):
    df = _df(spark, ["internationalization", "cat dog"])
    got = {r["id"]: r["n"] for r in df.select("id", T.bpe_ish_token_count("txt").alias("n")).collect()}
    # 20-char word -> 1 + floor(19/4) = 5 sub-tokens; short words stay 1:1
    assert got[0] == 5
    assert got[1] == 2


def test_language_id(spark):
    df = _df(
        spark,
        [
            "the cat and the dog of the house",
            "le chat et les chiens des villes",
            "el perro de los gatos que corren",
            "der hund und die katze das ist",
            "zzz qqq xxx",
        ],
    )
    got = {r["id"]: r["lang"] for r in df.select("id", T.language_id("txt").alias("lang")).collect()}
    assert got == {0: "en", 1: "fr", 2: "es", 3: "de", 4: "und"}


def test_quality_features_ratios(spark):
    df = _df(spark, ["the cat, the dog."])
    feats = T.quality_features("txt")
    row = df.select(*[c.alias(k) for k, c in feats.items()]).collect()[0]
    assert row["n_tokens"] == 4
    assert row["n_chars"] == 17
    # punct: one comma + one period
    assert abs(row["punct_ratio"] - 2 / 17) < 1e-12
    # 'the' occurs twice in 4 tokens
    assert abs(row["stopword_ratio"] - 2 / 4) < 1e-12


def test_quality_score_orders_good_above_garbage(spark):
    df = _df(
        spark,
        [
            "the quick brown fox jumps over the lazy dog and it is fine",
            "!!!! ???? ;;;; 1234 @@@@",
        ],
    )
    got = {r["id"]: r["q"] for r in df.select("id", T.quality_score("txt").alias("q")).collect()}
    assert got[0] > 0.7
    assert got[1] < 0.35


def test_doc_fingerprint_normalizes_whitespace_and_case(spark):
    df = _df(spark, ["Hello   World", "hello world", "different entirely"])
    got = [r["fp"] for r in df.select(T.doc_fingerprint("txt").alias("fp")).collect()]
    assert got[0] == got[1]
    assert got[0] != got[2]


def test_chunking_windows_cover_all_tokens_with_overlap(spark):
    from c3dc_etl_spark.operators.chunking import chunk_documents

    txt = " ".join(f"t{i}" for i in range(10))
    df = spark.createDataFrame([(1, txt)], "doc_id long, txt string")
    rows = sorted(
        chunk_documents(df, "txt", "doc_id", chunk_tokens=8, overlap=4).collect(),
        key=lambda r: r["chunk_index"],
    )
    # stride 4, n=10: starts 0, 4 (start 8 dropped: previous window
    # already reached the end)
    assert [r["chunk_index"] for r in rows] == [0, 1]
    assert rows[0]["chunk_text"].split() == [f"t{i}" for i in range(8)]
    assert rows[1]["chunk_text"].split() == [f"t{i}" for i in range(4, 10)]
    assert rows[1]["n_tokens"] == 6
    assert rows[0]["chunk_id"] == "1_0"


def test_chunking_short_and_blank_docs(spark):
    from c3dc_etl_spark.operators.chunking import chunk_documents

    df = spark.createDataFrame(
        [(1, "only three tokens"), (2, "   "), (3, None)],
        "doc_id long, txt string",
    )
    rows = chunk_documents(df, "txt", "doc_id", chunk_tokens=8, overlap=4).collect()
    assert len(rows) == 1
    assert rows[0]["doc_id"] == 1 and rows[0]["n_tokens"] == 3


def test_lower_tokens_and_bigrams(spark):
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [(0, "  Foo  BAR baz "), (1, "solo"), (2, "   ")], "doc_id long, text string"
    )
    out = {
        r["doc_id"]: (r["toks"], r["bgs"])
        for r in df.select(
            "doc_id",
            T.lower_tokens("text").alias("toks"),
            T.bigrams(T.lower_tokens("text")).alias("bgs"),
        ).collect()
    }
    assert out[0] == (
        ["foo", "bar", "baz"],
        ["foo" + T.NGRAM_SEP + "bar", "bar" + T.NGRAM_SEP + "baz"],
    )
    # below two tokens: EMPTY bigram array, not a descending-sequence blowup
    assert out[1] == (["solo"], [])
    assert out[2] == ([], [])

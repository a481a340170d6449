"""Unit tests for operators.quality / packing / decontam."""

from __future__ import annotations

from pyspark.sql import functions as F

from c3dc_etl_spark.operators import quality as Q
from c3dc_etl_spark.operators.decontam import contamination
from c3dc_etl_spark.operators.packing import pack_chunks, sequence_manifest


def _docs(spark, rows):
    return spark.createDataFrame(rows, ["doc_id", "text"])


# --------------------------------------------------------------------------
# n-grams / repetition
# --------------------------------------------------------------------------


def test_token_ngrams_basic_and_short(spark):
    df = _docs(spark, [(1, "a b c d"), (2, "a b"), (3, "a")])
    out = {
        r["doc_id"]: r["g"]
        for r in df.select(
            "doc_id",
            Q.token_ngrams(F.split(F.col("text"), " "), 3).alias("g"),
        ).collect()
    }
    assert out[1] == ["a b c", "b c d"]
    assert out[2] == []  # shorter than n
    assert out[3] == []


def test_dup_token_fraction(spark):
    df = _docs(spark, [(1, "x x x x"), (2, "a b c d"), (3, "a a b b")])
    out = {
        r["doc_id"]: r["f"]
        for r in df.select(
            "doc_id",
            Q.dup_token_fraction(F.split(F.col("text"), " ")).alias("f"),
        ).collect()
    }
    assert out[1] == 0.75  # 4 tokens, 1 distinct
    assert out[2] == 0.0
    assert out[3] == 0.5


# --------------------------------------------------------------------------
# PII
# --------------------------------------------------------------------------


def test_pii_redact_and_count(spark):
    df = _docs(
        spark,
        [
            (1, "mail bob.smith+x@corp.example.org now"),
            (2, "call 415-555-1234 or 415.555.9999"),
            (3, "server 10.0.3.25 up"),
            (4, "clean text only"),
        ],
    )
    counts = Q.pii_counts("text")
    out = {
        r["doc_id"]: r
        for r in df.select(
            "doc_id",
            counts["email"].alias("e"),
            counts["phone"].alias("p"),
            counts["ip"].alias("i"),
            Q.redact_pii("text").alias("red"),
        ).collect()
    }
    assert (out[1]["e"], out[1]["red"]) == (1, "mail <EMAIL> now")
    assert (out[2]["p"], out[2]["red"]) == (2, "call <PHONE> or <PHONE>")
    assert (out[3]["i"], out[3]["red"]) == (1, "server <IP> up")
    assert out[4]["red"] == "clean text only"
    assert (out[4]["e"], out[4]["p"], out[4]["i"]) == (0, 0, 0)


def test_pii_families_do_not_cross_match(spark):
    # an IP is not a phone; a phone is not an IP; digits in an email
    # local part match neither
    df = _docs(spark, [(1, "a 10.0.3.25 b 415-555-1234 c u123@ex.io")])
    counts = Q.pii_counts("text")
    row = df.select(
        counts["email"].alias("e"), counts["phone"].alias("p"), counts["ip"].alias("i")
    ).collect()[0]
    assert (row["e"], row["p"], row["i"]) == (1, 1, 1)


# --------------------------------------------------------------------------
# packing
# --------------------------------------------------------------------------


def _chunks(spark, rows):
    return spark.createDataFrame(rows, ["doc_id", "chunk_index", "n_tokens"])


def test_pack_chunks_sequential_fill_and_manifest(spark):
    # one shard (num_shards=1): pure sequential fill check
    rows = [(1, 0, 30), (1, 1, 30), (2, 0, 30), (3, 0, 10), (4, 0, 30)]
    packed = pack_chunks(
        _chunks(spark, rows), budget=64, num_shards=1
    ).orderBy("doc_id", "chunk_index")
    got = [(r["seq_id"], r["tokens_before"]) for r in packed.collect()]
    # cum before: 0,30,60,90,100 -> seq 0,0,0,1,1
    assert got == [(0, 0), (0, 30), (0, 60), (1, 90), (1, 100)]
    man = {
        r["seq_id"]: (r["n_chunks"], r["seq_tokens"], r["n_docs"])
        for r in sequence_manifest(packed).collect()
    }
    assert man[0] == (3, 90, 2)
    assert man[1] == (2, 40, 2)


def test_pack_chunks_partition_invariant(spark):
    rows = [(d, i, 20 + (d * 7 + i) % 15) for d in range(40) for i in range(3)]
    df = _chunks(spark, rows)
    a = pack_chunks(df, budget=128, num_shards=4)
    b = pack_chunks(df.repartition(13), budget=128, num_shards=4)
    key = lambda r: (r["doc_id"], r["chunk_index"])  # noqa: E731
    got_a = {key(r): (r["shard"], r["seq_id"]) for r in a.collect()}
    got_b = {key(r): (r["shard"], r["seq_id"]) for r in b.collect()}
    assert got_a == got_b


def test_pack_budget_overflow_bounded(spark):
    rows = [(d, 0, 30) for d in range(50)]
    man = sequence_manifest(
        pack_chunks(_chunks(spark, rows), budget=64, num_shards=2)
    )
    for r in man.collect():
        assert r["seq_tokens"] < 64 + 30  # budget + max chunk - 1 bound


# --------------------------------------------------------------------------
# decontamination
# --------------------------------------------------------------------------


def test_contamination_flags_overlapping_doc(spark):
    eval_df = _docs(spark, [(100, "e1 e2 e3 e4")])
    train = _docs(
        spark,
        [
            (1, "e1 e2 e3 e4 x1"),  # shares grams with eval
            (2, "z1 z2 z3 z4 z5"),  # disjoint
            (3, "q1 q2"),  # too short for n=3
        ],
    )
    out = {
        r["doc_id"]: r
        for r in contamination(
            train, eval_df, text_col="text", id_col="doc_id", n=3,
            flag_threshold=0.5,
        ).collect()
    }
    # doc 1: grams e1e2e3, e2e3e4, e3e4x1 -> 2/3 overlap
    assert (out[1]["n_shingles"], out[1]["n_overlap"]) == (3, 2)
    assert out[1]["flagged"] == 1
    assert (out[2]["n_shingles"], out[2]["n_overlap"], out[2]["flagged"]) == (3, 0, 0)
    assert (out[3]["n_shingles"], out[3]["flagged"]) == (0, 0)


def test_remove_duplicate_spans_drops_shared_and_keeps_order(spark):
    from c3dc_etl_spark.operators.quality import remove_duplicate_spans

    boiler = "copyright footer all rights reserved forever and ever amen ok"
    docs = spark.createDataFrame(
        [
            (1, f"alpha one two three four five six seven eight nine {boiler}"),
            (2, f"{boiler} beta one two three four five six seven eight nine"),
            (3, boiler),  # entirely boilerplate -> empty survivor
        ],
        "doc_id long, text string",
    )
    rows = {
        r["doc_id"]: r["clean_text"]
        for r in remove_duplicate_spans(
            docs, "text", "doc_id", span_words=10, max_docs_per_span=1
        ).collect()
    }
    assert rows[1] == "alpha one two three four five six seven eight nine"
    assert rows[2] == "beta one two three four five six seven eight nine"
    assert rows[3] == ""
    assert len(rows) == 3  # empty doc still present


def test_bloom_contamination_superset_of_exact(spark):
    from c3dc_etl_spark.operators.decontam import (
        bloom_contamination,
        bloom_words,
        contamination,
        doc_ngram_set,
    )
    from pyspark.sql import functions as F

    rows = [
        (1, "alpha beta gamma delta epsilon zeta"),
        (2, "alpha beta gamma delta epsilon zeta eta theta"),
        (3, "one two three four five six seven"),
        (4, "totally unrelated words here nothing shared at all"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    train = df.filter(F.col("doc_id") != 1)
    eval_df = df.filter(F.col("doc_id") == 1)
    exact = {
        r["doc_id"]: r["n_overlap"]
        for r in contamination(
            train, eval_df, text_col="text", id_col="doc_id", n=3
        ).collect()
    }
    bloom = {
        r["doc_id"]: r["n_bloom_hits"]
        for r in bloom_contamination(
            train, eval_df, text_col="text", id_col="doc_id", n=3
        ).collect()
    }
    assert set(bloom) == set(exact)
    # bloom hits are exact hits + deterministic false positives, never fewer
    for doc, n_exact in exact.items():
        assert bloom[doc] >= n_exact, (doc, bloom[doc], n_exact)
    # doc 2 fully contains eval doc 1's grams -> all its shared grams hit
    assert bloom[2] >= exact[2] > 0
    # the bitset words table is bounded by m/64 regardless of eval size
    words = bloom_words(
        doc_ngram_set(eval_df, "text", "doc_id", 3).select("gram"),
        m_bits=1024,
    )
    assert words.count() <= 1024 // 64
    # word values have the probed bits set: re-derive one gram's bits
    got = {r["word_idx"]: r["word"] for r in words.collect()}
    assert all(w != 0 for w in got.values())


def test_bloom_contamination_deterministic(spark):
    from c3dc_etl_spark.operators.decontam import bloom_contamination
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [(i, f"tok{i % 4} a b c d e f g h tok{(i * 3) % 5}") for i in range(24)],
        "doc_id long, text string",
    )
    train = df.filter(F.col("doc_id") % 5 != 0)
    ev = df.filter(F.col("doc_id") % 5 == 0)
    a = sorted(
        tuple(r)
        for r in bloom_contamination(
            train, ev, text_col="text", id_col="doc_id", n=4
        ).collect()
    )
    b = sorted(
        tuple(r)
        for r in bloom_contamination(
            train.repartition(7), ev, text_col="text", id_col="doc_id", n=4
        ).collect()
    )
    assert a == b  # partitioning-invariant


def test_content_defined_chunks_survive_prefix_insertion(spark):
    """An insertion at the front must only re-chunk the first
    segment(s): every later boundary is a function of local content,
    so almost all segment digests are SHARED between the original and
    edited documents — the property fixed-size windows cannot have
    (they shift every downstream chunk)."""
    import random

    from c3dc_etl_spark.operators.chunking import content_defined_chunks

    rng = random.Random(11)
    toks = [f"w{rng.randrange(1000)}" for _ in range(120)]
    original = " ".join(toks)
    edited = "INSERTED " + original
    df = spark.createDataFrame(
        [(0, original), (1, edited)], "doc_id long, text string"
    )
    out = content_defined_chunks(df, gram=3, avg_tokens=8)
    by_doc = {0: set(), 1: set()}
    n_segs = {0: 0, 1: 0}
    for r in out.collect():
        by_doc[r["doc_id"]].add(r["segment_digest"])
        n_segs[r["doc_id"]] += 1
    shared = by_doc[0] & by_doc[1]
    # all but the first couple of segments survive the edit intact
    assert len(shared) >= n_segs[0] - 2, (n_segs, len(shared))
    assert n_segs[0] > 5  # the doc actually chunked


def test_ntile_decomposition_matches_window_ntile_edge_cases(spark):
    """The r7 scale restructure of feature_quantile_binning replaces
    `NTILE(B) OVER (ORDER BY value, id)` with operators/quality.py
    exact_ntile (per-value counts + bounded cumulative offsets +
    partitioned tie row_number + the fill rule as arithmetic) — the
    SAME code path the production query calls. Pin exact equivalence
    against Spark's own NTILE on the adversarial shapes: N < B,
    N == B, N == B+1, heavy ties, all-one-value."""
    from pyspark.sql import Window

    from c3dc_etl_spark.operators.quality import exact_ntile

    cases = [
        [(i, 100 + i) for i in range(7)],              # N=7 < B=10
        [(i, 5) for i in range(10)],                   # N==B, ALL tied
        [(i, i % 2) for i in range(11)],               # N==B+1, 2 values
        [(i, i % 3) for i in range(25)],               # heavy ties
        [(i, 42) for i in range(23)],                  # one value, N%B!=0
    ]
    B = 10
    for rows in cases:
        df = spark.createDataFrame(rows, "doc_id int, n_chars int")
        want = df.select(
            "doc_id",
            F.ntile(B)
            .over(Window.orderBy("n_chars", "doc_id"))
            .alias("bin"),
        )
        w = {tuple(x) for x in want.collect()}
        # default bucket geometry AND a deliberately tiny tie_buckets=3
        # (multiple rows per bucket, so the within-value bucket offsets
        # must carry real weight — the 100 TB dominant-value shape)
        for tb in (64, 3):
            got = exact_ntile(
                df, "n_chars", "doc_id", B, tie_buckets=tb
            ).select("doc_id", F.col("bin").cast("int").alias("bin"))
            g = {tuple(x) for x in got.collect()}
            assert g == w, (
                f"decomposition diverged (tie_buckets={tb}) for case "
                f"{rows[:4]}..."
            )


def test_exact_ntile_null_values_and_input_validation(spark):
    """NULL values bin FIRST (Spark ASC default, matching the NTILE
    reference); non-integer id columns and degenerate tie_buckets are
    rejected loudly instead of silently mis-bucketing."""
    import pytest
    from pyspark.sql import Window

    from c3dc_etl_spark.operators.quality import exact_ntile

    rows = [(1, None), (2, 7), (3, None), (4, 5), (5, 7), (6, 6)]
    df = spark.createDataFrame(rows, "doc_id int, n_chars int")
    want = {
        tuple(x)
        for x in df.select(
            "doc_id",
            F.ntile(4).over(Window.orderBy("n_chars", "doc_id")).alias("bin"),
        ).collect()
    }
    got = {
        tuple(x)
        for x in exact_ntile(df, "n_chars", "doc_id", 4)
        .select("doc_id", F.col("bin").cast("int").alias("bin"))
        .collect()
    }
    assert got == want  # all 6 rows present, NULL-value rows bin first

    sdf = spark.createDataFrame([("9", 1), ("10", 1)], "sid string, v int")
    with pytest.raises(ValueError, match="integer-typed"):
        exact_ntile(sdf, "v", "sid", 2)
    with pytest.raises(ValueError, match="tie_buckets"):
        exact_ntile(df, "n_chars", "doc_id", 4, tie_buckets=0)
    with pytest.raises(ValueError, match="bins"):
        exact_ntile(df, "n_chars", "doc_id", 0)
    ndf = spark.createDataFrame(
        [(1, 5), (None, 7), (3, 7)], "doc_id int, n_chars int"
    )
    with pytest.raises(ValueError, match="NULL"):
        exact_ntile(ndf, "n_chars", "doc_id", 2)


def test_exact_ntile_dominant_value_narrow_id_slice(spark):
    """r7 verdict item 7: a value holding 90% of the rows inside 1% of
    the global id domain must STILL split across tie buckets (the r7
    global-envelope geometry re-concentrated it: the table-wide bucket
    width dwarfed the narrow slice, so the whole dominant value landed
    in one bucket = one executor sorting 90% of the corpus). Per-value
    envelopes size the width to each value's own id range. Pin (a) the
    bucketed frame fans the dominant value across >= half the buckets,
    and (b) end-to-end NTILE equivalence on the same fixture."""
    from pyspark.sql import Window

    from c3dc_etl_spark.operators.quality import (
        _per_value_tie_buckets,
        exact_ntile,
    )

    # ids 0..99_999; dominant value 7 occupies ids 0..899 (0.9% of the
    # domain, 90% of the 1000 rows); 100 other rows spread over the
    # rest of the domain with distinct values.
    rows = [(i, 7) for i in range(900)] + [
        (1000 + i * 99, 100 + i) for i in range(100)
    ]
    df = spark.createDataFrame(rows, "doc_id int, n_chars int")
    tb = 16
    base, _ = _per_value_tie_buckets(df, "n_chars", "doc_id", tb)
    fanout = (
        base.filter(F.col("n_chars") == 7)
        .select("__tb")
        .distinct()
        .count()
    )
    assert fanout >= tb // 2, (
        f"dominant value concentrated into {fanout} of {tb} buckets"
    )
    B = 10
    want = {
        tuple(x)
        for x in df.select(
            "doc_id",
            F.ntile(B)
            .over(Window.orderBy("n_chars", "doc_id"))
            .alias("bin"),
        ).collect()
    }
    got = {
        tuple(x)
        for x in exact_ntile(df, "n_chars", "doc_id", B, tie_buckets=tb)
        .select("doc_id", F.col("bin").cast("int").alias("bin"))
        .collect()
    }
    assert got == want

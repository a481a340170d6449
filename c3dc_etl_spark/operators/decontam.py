"""Benchmark decontamination: n-gram overlap against a held-out set.

Before training, every candidate document is checked for n-gram overlap
with the evaluation benchmarks; documents sharing a non-trivial
fraction of their n-grams with any eval document are flagged/dropped
(the GPT-3 / PaLM decontamination recipe: 8-13 token n-gram collision).

Shape: the eval side is distilled to a DISTINCT n-gram set — tiny
relative to the corpus (benchmarks are MBs, corpora are TBs) — and
broadcast; each training document's distinct n-gram set left-joins it
and aggregates hit counts per doc_id. The per-(doc, gram) distinct and
the final per-doc aggregation both partial-aggregate map-side, and no
key is hotter than the longest single document. At 100 TB the join
stays broadcast because only the EVAL set is broadcast, never the
corpus; joining on the raw gram string keeps the oracle exact — swap
the join key for xxhash64(gram) to shrink shuffle bytes when gram
length dominates (counts are collision-stable at 2^-64).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from c3dc_etl_spark.operators.dedup import spread
from c3dc_etl_spark.operators.quality import token_ngrams
from c3dc_etl_spark.operators.text import tokens

BLOOM_M_BITS = 131_072  # 2^17 bits -> at most 2048 bitset words
BLOOM_K = 2


def doc_ngram_set(
    df: DataFrame, text_col: str, id_col: str, n: int
) -> DataFrame:
    """(doc, gram) rows, one per DISTINCT n-gram per document. The input
    is spread across the session's parallelism first: single-file local
    inputs otherwise tokenize+explode on one core."""
    toked = spread(df).select(
        F.col(id_col).alias("doc"), tokens(text_col).alias("toks")
    )
    grams = toked.select(
        "doc", F.explode(token_ngrams(F.col("toks"), n)).alias("gram")
    )
    return grams.dropDuplicates(["doc", "gram"])


def contamination(
    train: DataFrame,
    eval_df: DataFrame,
    *,
    text_col: str,
    id_col: str,
    n: int = 8,
    flag_threshold: float = 0.05,
) -> DataFrame:
    """Per-training-document eval-overlap report.

    Returns one row per train document: n_shingles (distinct n-grams),
    n_overlap (those also present in ANY eval document), an x1e4-scaled
    overlap fraction, and the drop flag at ``flag_threshold``. Documents
    shorter than ``n`` tokens have zero shingles and are never flagged.
    """
    train_grams = doc_ngram_set(train, text_col, id_col, n)
    eval_grams = (
        doc_ngram_set(eval_df, text_col, id_col, n)
        .select("gram")
        .dropDuplicates(["gram"])
        .withColumn("hit", F.lit(1))
    )
    per_doc = (
        train_grams.join(F.broadcast(eval_grams), "gram", "left")
        .groupBy("doc")
        .agg(
            F.count(F.lit(1)).alias("n_shingles"),
            F.count("hit").alias("n_overlap"),
        )
    )
    frac = F.col("n_overlap").cast("double") / F.greatest(
        F.col("n_shingles"), F.lit(1)
    ).cast("double")
    base = train.select(F.col(id_col).alias("doc"))
    return (
        base.join(per_doc, "doc", "left")
        .select(
            F.col("doc").alias(id_col),
            F.coalesce("n_shingles", F.lit(0)).cast("bigint").alias("n_shingles"),
            F.coalesce("n_overlap", F.lit(0)).cast("bigint").alias("n_overlap"),
        )
        .withColumn(
            "contam_x1e4",
            F.floor(frac * 10000 + F.lit(0.5)).cast("bigint"),
        )
        .withColumn(
            "flagged",
            (F.col("contam_x1e4") >= int(round(flag_threshold * 10000))).cast(
                "int"
            ),
        )
    )


# ---------------------------------------------------------------------------
# Bloom-filter decontamination — the constant-size-broadcast scale path
# ---------------------------------------------------------------------------
#
# The exact path above broadcasts the full eval n-gram STRING set: right
# for MB-scale benchmarks, but the broadcast grows with the benchmark
# suite. The bloom path compresses the eval set to a fixed-size bitset
# (m bits, packed into m/64 bigint words) and probes it with k
# md5-derived positions per gram: the broadcast is CONSTANT (16 KiB at
# m = 2^17) no matter how many benchmarks are registered, at the price
# of a deterministic false-positive rate (~(occupancy)^k). Every hash
# is portable md5 arithmetic, so the oracle can recompute the exact
# same bit positions — including the false positives — making even the
# approximation value-hash-checkable.


def bloom_positions(gram: Column, *, m_bits: int = BLOOM_M_BITS, k: int = BLOOM_K) -> list[Column]:
    """k bit positions for one gram: position j = the first 8 md5 hex
    chars of ('bf<j>:' || gram) as an integer, mod m. One digest per
    (gram, j); pure JVM expressions. DuckDB mirror:
    CAST(CONCAT('0x', SUBSTR(MD5('bf<j>:' || gram), 1, 8)) AS BIGINT) % m."""
    return [
        F.conv(
            F.substring(F.md5(F.concat(F.lit(f"bf{j}:"), gram)), 1, 8), 16, 10
        ).cast("long") % m_bits
        for j in range(k)
    ]


def bloom_words(eval_grams: DataFrame, *, m_bits: int = BLOOM_M_BITS, k: int = BLOOM_K) -> DataFrame:
    """(word_idx, word) bitset words for the eval n-gram set: every
    gram sets k bits; bits pack 64-per-word via a bit_or aggregate
    (map-side combinable). At most m/64 rows regardless of eval size —
    the whole point of the bloom representation."""
    gram = F.col("gram")
    # no distinct on positions: bit_or is idempotent (setting a bit
    # twice is a no-op), so a pre-dedup would only add a second full
    # shuffle of the position set for an identical result
    pos = eval_grams.select(
        F.explode(F.array(*bloom_positions(gram, m_bits=m_bits, k=k))).alias("pos")
    )
    return (
        pos.groupBy((F.col("pos") / 64).cast("long").alias("word_idx"))
        .agg(
            F.bit_or(
                F.expr("shiftleft(CAST(1 AS BIGINT), CAST(pos % 64 AS INT))")
            ).alias("word")
        )
    )


def bloom_contamination(
    train: DataFrame,
    eval_df: DataFrame,
    *,
    text_col: str,
    id_col: str,
    n: int = 8,
    m_bits: int = BLOOM_M_BITS,
    k: int = BLOOM_K,
    flag_threshold: float = 0.05,
) -> DataFrame:
    """Per-training-document bloom-overlap report: n_shingles (distinct
    n-grams), n_bloom_hits (grams whose k probe bits are ALL set in the
    eval bitset — a superset of the exact overlap by the deterministic
    false-positive margin), the x1e4-scaled hit fraction, and the drop
    flag.

    Scale shape: the probe side is k broadcast hash joins of narrow
    (doc, word_idx, bit) rows against the <= m/64-row word table — no
    eval-set-sized structure ever ships to executors, and the corpus
    side shuffles only its own distinct (doc, gram) pairs for the
    per-doc aggregate."""
    train_grams = doc_ngram_set(train, text_col, id_col, n)
    eval_grams = doc_ngram_set(eval_df, text_col, id_col, n).select(
        "gram"
    ).dropDuplicates(["gram"])
    words = bloom_words(eval_grams, m_bits=m_bits, k=k)

    probes = train_grams
    hit = F.lit(True)
    for j, pos in enumerate(bloom_positions(F.col("gram"), m_bits=m_bits, k=k)):
        wj = f"__w{j}"
        bj = f"__b{j}"
        probes = probes.withColumn(wj, (pos / 64).cast("long")).withColumn(
            bj, (pos % 64).cast("int")
        )
        w = words.select(
            F.col("word_idx").alias(wj), F.col("word").alias(f"__word{j}")
        )
        probes = probes.join(F.broadcast(w), wj, "left")
        bit_set = (
            F.expr(
                f"shiftright(COALESCE(__word{j}, CAST(0 AS BIGINT)), {bj})"
            ).bitwiseAND(F.lit(1))
            == 1
        )
        hit = hit & bit_set
    per_doc = (
        probes.withColumn("__hit", hit.cast("int"))
        .groupBy("doc")
        .agg(
            F.count(F.lit(1)).alias("n_shingles"),
            F.sum("__hit").alias("n_bloom_hits"),
        )
    )
    frac = F.col("n_bloom_hits").cast("double") / F.greatest(
        F.col("n_shingles"), F.lit(1)
    ).cast("double")
    base = train.select(F.col(id_col).alias("doc"))
    return (
        base.join(per_doc, "doc", "left")
        .select(
            F.col("doc").alias(id_col),
            F.coalesce("n_shingles", F.lit(0)).cast("bigint").alias("n_shingles"),
            F.coalesce("n_bloom_hits", F.lit(0)).cast("bigint").alias("n_bloom_hits"),
        )
        .withColumn("bloom_x1e4", F.floor(frac * 10000 + F.lit(0.5)).cast("bigint"))
        .withColumn(
            "flagged",
            (F.col("bloom_x1e4") >= int(round(flag_threshold * 10000))).cast("int"),
        )
    )

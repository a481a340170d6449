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

"""Distributed BPE-merge training (byte-pair encoding, word-level).

The industrial shape: ONE corpus pass builds the word-frequency table
(vocab-bounded — orders of magnitude smaller than the corpus), then
every merge iteration runs on that table alone:

1. **pair counts** — explode each word's adjacent symbol pairs weighted
   by word frequency, one partial-aggregated shuffle keyed by the pair
   (cardinality bounded by observed symbol-pair vocab);
2. **argmax** — orderBy(count DESC, pair ASC).limit(1): TakeOrdered, a
   single-row driver collect;
3. **merge apply** — a NARROW map over the word table: a left-to-right
   greedy fold replaces every non-overlapping (a, b) adjacency with the
   merged symbol. No UDF — the fold is `aggregate` over the symbol
   string, whole-stage-codegen expressions only.

Words ride as a single delimiter-framed string ("\\x1fa\\x1fb\\x1fc\\x1f")
rather than an array so the fold accumulator stays a scalar — the exact
same fold a DuckDB LIST_REDUCE can run, which is what makes the trainer
oracle-checkable bit-for-bit (counts are integers, tie-breaks are
binary-collation string comparisons; no floats anywhere).

At 100 TB the corpus pass is the only corpus-sized job; iterations cost
O(vocab) each, and the driver traffic per iteration is one (pair, count)
row — the same contract as every industrial BPE trainer.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from c3dc_etl_spark.operators.text import NGRAM_SEP, lower_tokens

__all__ = ["word_freq_table", "framed_chars", "merge_fold", "bpe_train"]

SEP = NGRAM_SEP  # \x1f: framing delimiter, never inside a symbol


def word_freq_table(df: DataFrame, text_col: str = "text") -> DataFrame:
    """One corpus pass: (word, freq) for lowercased whitespace words."""
    return (
        df.select(F.explode(lower_tokens(text_col)).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("freq"))
    )


def framed_chars(word: Column) -> Column:
    """Initial symbol framing: each character becomes a delimiter-framed
    symbol ("abc" -> "\\x1fa\\x1fb\\x1fc\\x1f")."""
    return F.concat(F.lit(SEP), F.regexp_replace(word, "(.)", "$1" + SEP))


def merge_fold(framed: Column, a: str, b: str) -> Column:
    """Greedy left-to-right merge of adjacent symbols (a, b) inside a
    delimiter-framed symbol string — the canonical BPE apply step. The
    fold walks symbols one at a time; when the accumulator ends with
    "<sep>a<sep>" and the next symbol is b, the trailing a is replaced
    by the merged symbol ab (non-overlapping by construction: the
    merged symbol no longer ends with "<sep>a<sep>" unless a == ab,
    impossible for non-empty b)."""
    la = len(a)
    tail = F.lit(SEP + a + SEP)
    merged = a + b + SEP
    return F.aggregate(
        F.filter(F.split(framed, SEP), lambda x: x != F.lit("")),
        F.lit(SEP),
        lambda acc, x: F.when(
            (x == F.lit(b)) & acc.endswith(tail),
            F.concat(
                acc.substr(F.lit(1), F.length(acc) - F.lit(la + 1)), F.lit(merged)
            ),
        ).otherwise(F.concat(acc, x, F.lit(SEP))),
    )


def bpe_train(
    df: DataFrame, *, text_col: str = "text", merges: int = 3
) -> tuple[list[tuple[str, str, int]], DataFrame]:
    """Learn ``merges`` BPE merges over the corpus. Returns the learned
    (left, right, pair_count) list in rank order plus the final word
    table (word, freq, syms string) for downstream tokenization.

    Ties in pair counts break on (left ASC, right ASC) so the learned
    merges are deterministic on any engine or partitioning."""
    if merges < 1:
        raise ValueError("merges must be >= 1")
    words = word_freq_table(df, text_col).withColumn(
        "s", framed_chars(F.col("word"))
    )
    learned: list[tuple[str, str, int]] = []
    for _ in range(merges):
        syms = F.filter(F.split(F.col("s"), SEP), lambda x: x != F.lit(""))
        pairs = words.select(
            F.col("freq"),
            F.explode(
                F.when(
                    F.size(syms) >= 2,
                    F.zip_with(
                        F.slice(syms, 1, F.size(syms) - 1),
                        F.slice(syms, 2, F.size(syms) - 1),
                        lambda x, y: F.struct(x.alias("a"), y.alias("b")),
                    ),
                ).otherwise(F.array().cast("array<struct<a:string,b:string>>"))
            ).alias("p"),
        )
        top = (
            pairs.groupBy("p.a", "p.b")
            .agg(F.sum("freq").alias("total"))
            .orderBy(F.col("total").desc(), F.col("a").asc(), F.col("b").asc())
            .limit(1)
            .collect()
        )
        if not top:
            break
        a, b, total = top[0]["a"], top[0]["b"], int(top[0]["total"])
        learned.append((a, b, total))
        words = words.withColumn("s", merge_fold(F.col("s"), a, b))
    return learned, words

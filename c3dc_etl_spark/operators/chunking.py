"""Document chunking: fixed-token sliding windows for training data.

Splitting a corpus into model-context-sized chunks (with overlap for
continuity) is the last restructuring step of an LLM data pipeline.
The whole operator is a NARROW plan — tokenize, generate window start
offsets per row, posexplode, slice — no shuffle at any scale; output
row count is sum(ceil(tokens/stride)) and each output row carries only
its own chunk text.

Plan hygiene: the token array is projected to its own bound column
before the window lambdas touch it (higher-order lambdas evaluate
interpreted per element and would otherwise re-run the split regex per
window — same pathology as shingle normalization, see operators.dedup).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from c3dc_etl_spark.operators.text import tokens


def chunk_documents(
    df: DataFrame,
    text_col: str,
    id_col: str,
    *,
    chunk_tokens: int = 64,
    overlap: int = 16,
) -> DataFrame:
    """One row per (document, window): sliding windows of
    ``chunk_tokens`` whitespace tokens advancing by
    ``chunk_tokens - overlap``.

    Window-start rule: starts are the stride grid 0, s, 2s, ...; a
    start > 0 is emitted only while the PREVIOUS window did not already
    reach the end of the document (start + overlap < n_tokens), so no
    emitted chunk is wholly contained in its predecessor and every
    token appears in at least one chunk. Blank documents produce no
    chunks.

    Output: chunk_id (``<id>_<index>``), the source id, chunk_index,
    n_tokens (actual tokens in this chunk; the final chunk may be
    short), chunk_text.
    """
    if not 0 <= overlap < chunk_tokens:
        raise ValueError("require 0 <= overlap < chunk_tokens")
    stride = chunk_tokens - overlap
    toked = df.filter(F.trim(F.col(text_col)) != "").select(
        F.col(id_col).alias("doc"), tokens(text_col).alias("toks")
    )
    n = F.size(F.col("toks"))
    starts = F.filter(
        F.sequence(F.lit(0), F.greatest(n - 1, F.lit(0)), F.lit(stride)),
        lambda s: (s == 0) | (s + F.lit(overlap) < n),
    )
    win = toked.select("doc", "toks", F.posexplode(starts).alias("idx", "start"))
    chunk = F.slice(F.col("toks"), F.col("start") + 1, chunk_tokens)
    return win.select(
        F.concat_ws("_", F.col("doc").cast("string"), F.col("idx").cast("string")).alias(
            "chunk_id"
        ),
        F.col("doc").alias("doc_id"),
        F.col("idx").alias("chunk_index"),
        F.size(chunk).cast("bigint").alias("n_tokens"),
        F.array_join(chunk, " ").alias("chunk_text"),
    )


def content_defined_chunks(
    df: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    gram: int = 3,
    avg_tokens: int = 8,
) -> DataFrame:
    """Content-defined chunking: a token is a segment BOUNDARY when the
    32-bit hash of the trailing ``gram``-token window satisfies
    hash % avg_tokens == 0 — so boundaries are a function of LOCAL
    content, not absolute position. Unlike fixed windows, an insertion
    near the start of a document only re-chunks the segment it touches;
    every later chunk's content (and digest) is unchanged — which is
    what lets chunk-level dedup survive edits (the rsync/LBFS boundary
    trick applied to token streams).

    One narrow explode to (doc, pos, token) rows; the trailing-window
    hash is a per-row expression; segment ids are a per-doc running sum
    of boundary flags (window partitioned by doc — bounded by document
    length, never a global sort). Returns one row per (doc, segment):
    token count, start position, and the segment digest."""
    from c3dc_etl_spark.operators.dedup import hash32
    from c3dc_etl_spark.operators.text import NGRAM_SEP, lower_tokens

    toks = df.select(
        F.col(id_col).alias("doc"), F.posexplode(lower_tokens(text_col))
    ).select("doc", F.col("pos"), F.col("col").alias("tok"))
    w_ord = Window.partitionBy("doc").orderBy("pos")
    lagged = toks.select(
        "doc",
        "pos",
        "tok",
        F.concat_ws(
            NGRAM_SEP,
            *[F.lag("tok", gram - 1 - i).over(w_ord) for i in range(gram)],
        ).alias("win"),
    )
    # boundary only once the window is full (pos >= gram-1); concat_ws
    # silently drops NULL lags, which would alias short windows onto
    # real ones otherwise
    boundary = F.when(
        (F.col("pos") >= gram - 1) & (F.pmod(hash32(F.col("win")), avg_tokens) == 0),
        F.lit(1),
    ).otherwise(F.lit(0))
    seg = lagged.select(
        "doc",
        "pos",
        "tok",
        F.sum(boundary).over(
            w_ord.rowsBetween(Window.unboundedPreceding, -1)
        ).alias("__b"),
    ).select(
        "doc", "pos", "tok", F.coalesce(F.col("__b"), F.lit(0)).alias("segment_id")
    )
    return (
        seg.groupBy("doc", "segment_id")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.min("pos").alias("start_pos"),
            F.md5(
                F.concat_ws(
                    NGRAM_SEP, F.array_sort(F.collect_list(F.struct("pos", "tok"))).tok
                )
            ).alias("segment_digest"),
        )
        .select(
            F.col("doc").alias(id_col),
            F.col("segment_id").cast("bigint").alias("segment_id"),
            F.col("n_tokens").cast("bigint").alias("n_tokens"),
            F.col("start_pos").cast("bigint").alias("start_pos"),
            "segment_digest",
        )
    )

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

from pyspark.sql import DataFrame
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

"""Repetition-based quality signals and PII redaction for training data.

Repetition signals follow the Gopher/MassiveText filtering rules
(Rae et al. 2021, "Scaling Language Models", §A.1.1): documents whose
content is dominated by a few repeated n-grams or duplicated tokens are
low-quality (boilerplate, scraped navigation, generation loops) and are
dropped before training. The signals here are the token-level family —
the corpus has no line structure, so the line-level variants degenerate;
the same code path applies to any delimiter.

PII redaction is the standard pre-training scrub: regex families for
emails / phone numbers / IPv4 addresses replaced with typed placeholder
tokens, with per-document match counts kept for audit. All patterns are
written in the common subset of Java regex (Spark) and RE2 (DuckDB) so
the oracle can mirror them verbatim.

Everything in this module is whole-stage-codegen expression work — no
UDFs, no shuffles beyond the per-document n-gram aggregation (keyed by
doc_id, so partial aggregation collapses each task's grams before the
exchange and no key can be hotter than the longest single document).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# --------------------------------------------------------------------------
# Token n-grams
# --------------------------------------------------------------------------


def token_ngrams(toks: Column, n: int) -> Column:
    """Array of space-joined ``n``-grams of a token array (empty when the
    document has fewer than ``n`` tokens). Narrow: sequence + slice per
    row, no explode here — callers explode only when they aggregate."""
    if n < 1:
        raise ValueError("n >= 1 required")
    grams = F.transform(
        F.sequence(F.lit(1), F.size(toks) - F.lit(n - 1)),
        lambda i: F.concat_ws(" ", F.slice(toks, i, n)),
    )
    return F.when(F.size(toks) >= n, grams).otherwise(
        F.array().cast("array<string>")
    )


def dup_token_fraction(toks: Column) -> Column:
    """Fraction of tokens that are repeats of an earlier token:
    (n - n_distinct) / n. 0.0 for empty documents."""
    n = F.size(toks)
    nd = F.size(F.array_distinct(toks))
    return F.when(n > 0, (n - nd).cast("double") / n.cast("double")).otherwise(
        F.lit(0.0)
    )


# --------------------------------------------------------------------------
# PII redaction
# --------------------------------------------------------------------------

# Java-regex / RE2 common-subset patterns, applied in this order. Order
# matters only for audit counts (they are counted before any rewrite);
# the three families cannot overlap textually (an email contains '@', an
# IPv4 octet list is never 3-3-4 digits with separators).
PII_PATTERNS: tuple[tuple[str, str, str], ...] = (
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ip", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
    ("phone", r"\b\d{3}[-.]\d{3}[-.]\d{4}\b", "<PHONE>"),
)


def pii_counts(col: Column | str) -> dict[str, Column]:
    """Per-family match counts (pre-redaction) — JVM regexp_count."""
    c = F.col(col) if isinstance(col, str) else col
    return {
        name: F.regexp_count(c, F.lit(pat)).cast("bigint")
        for name, pat, _ in PII_PATTERNS
    }


def redact_pii(col: Column | str) -> Column:
    """Replace every PII family match with its placeholder token, in the
    fixed ``PII_PATTERNS`` order. Chained regexp_replace — one codegen
    projection, no shuffle."""
    c = F.col(col) if isinstance(col, str) else col
    for _, pat, repl in PII_PATTERNS:
        c = F.regexp_replace(c, pat, repl)
    return c


def remove_duplicate_spans(
    df,
    text_col: str,
    id_col: str,
    *,
    span_words: int = 10,
    max_docs_per_span: int = 1,
):
    """Cross-document span-level dedup (the Dolma/FineWeb
    duplicate-paragraph rule, over fixed word windows since the corpus
    has no paragraph breaks): chop each doc into non-overlapping
    ``span_words``-word chunks, count each chunk's DISTINCT-document
    frequency across the corpus, and drop every occurrence of chunks
    seen in more than ``max_docs_per_span`` documents, reassembling the
    surviving chunks in order. Boilerplate (headers, footers, license
    blocks) disappears from every document at once.

    Scale shape: the frequency table aggregates narrow (md5, doc) pairs
    with map-side combine; duplicated spans anti-join away via a plain
    shuffle join — with a threshold this low the duplicated-span set
    scales with the corpus (every near-dup contributes), so it is NOT
    broadcast (contrast drop_oversized_groups' broadcast_hot mode,
    which suits large caps). Rebuild is one groupBy over
    (doc, pos, chunk) rows. Docs whose every span was boilerplate
    survive with empty text (left join back to the corpus).
    """
    from pyspark.sql import DataFrame  # local: keep module header lean

    assert isinstance(df, DataFrame)
    words = df.select(
        F.col(id_col).alias("__doc"),
        F.split(F.lower(F.trim(F.col(text_col))), r"\s+").alias("__w"),
    )
    n_chunks = F.ceil(F.size("__w") / F.lit(span_words)).cast("int")
    chunks = words.select(
        "__doc",
        F.posexplode(
            F.transform(
                F.sequence(F.lit(0), n_chunks - 1),
                lambda i: F.array_join(
                    F.slice(F.col("__w"), i * span_words + 1, span_words), " "
                ),
            )
        ).alias("__pos", "__chunk"),
    ).withColumn("__h", F.md5("__chunk"))
    hot = (
        chunks.select("__h", "__doc")
        .distinct()
        .groupBy("__h")
        .agg(F.count(F.lit(1)).alias("__nd"))
        .filter(F.col("__nd") > max_docs_per_span)
        .select("__h")
    )
    kept = chunks.join(hot, "__h", "left_anti")
    rebuilt = kept.groupBy("__doc").agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("__pos", "__chunk"))),
                lambda s: s["__chunk"],
            ),
            " ",
        ).alias("__text")
    )
    return (
        df.select(F.col(id_col))
        .join(rebuilt, F.col(id_col) == F.col("__doc"), "left")
        .select(
            id_col,
            F.coalesce(F.col("__text"), F.lit("")).alias("clean_text"),
        )
    )


# --------------------------------------------------------------------------
# Exact NTILE without a global sort
# --------------------------------------------------------------------------
def _per_value_tie_buckets(df, value_col: str, id_col: str,
                           tie_buckets: int):
    """Assign each row a tie bucket ``(id - vlo) div vwidth`` computed
    from its value's OWN id envelope, so the bucket is monotone in
    ``id_col`` within every value and a dominant value clustered in a
    narrow id slice still fans out across ``tie_buckets`` buckets (r7
    verdict item 7). Returns ``(base, vstats)``: the bucketed
    (value, id, __tb) frame and the per-value envelope/count aggregate
    (``value_col, __vc, __vlo, __vhi`` — bounded by the value domain,
    reused by the caller for the global value offsets)."""
    vstats = df.groupBy(value_col).agg(
        F.count(F.lit(1)).alias("__vc"),
        F.min(id_col).alias("__vlo"),
        F.max(id_col).alias("__vhi"),
    )
    vgeo = vstats.select(
        F.col(value_col).alias("__gk"),
        F.col("__vlo").cast("bigint").alias("__glo"),
        F.expr(
            f"(CAST(__vhi AS BIGINT) - CAST(__vlo AS BIGINT))"
            f" div {tie_buckets}L + 1L"
        ).alias("__gw"),
    )
    base = (
        df.select(value_col, id_col)
        .join(
            F.broadcast(vgeo),
            F.col(value_col).eqNullSafe(F.col("__gk")),
        )
        .select(
            value_col,
            id_col,
            F.expr(
                f"(CAST(`{id_col}` AS BIGINT) - __glo) div __gw"
            ).alias("__tb"),
        )
    )
    return base, vstats


def exact_ntile(df, value_col: str, id_col: str, bins: int, *,
                tie_buckets: int = 64):
    """``NTILE(bins) OVER (ORDER BY value_col, id_col)`` with EXACT
    semantics — including the fill rule (the first N mod B buckets take
    one extra row), tie placement, and NULL values first (Spark's ASC
    default) — but WITHOUT a full-table single-partition window (the r7
    global-window lint class), and WITHOUT a skewable per-value sort.

    Scale decomposition of the same total order:
    (1) rows get a tie bucket that is MONOTONE in ``id_col`` WITHIN
        each value — ``(id - vlo) div vwidth`` over the value's OWN id
        envelope — so ordering by (value, bucket, id) IS ordering by
        (value, id); a value carried by most of the corpus (the skew
        case a bare per-value row_number dies on: one partition sorts
        that value's entire mass) splits across ``tie_buckets``
        independent sorts. Per-value geometry (r7 verdict item 7,
        upgrading the r7 global-envelope form) also balances the
        dominant-value-in-a-narrow-id-slice case: a value holding 90%
        of the rows inside 1% of the global id domain gets a width
        sized to ITS slice, not the table's, so it still fans out. The
        envelopes come from one extra map-side-combined aggregate over
        the bounded value domain, broadcast back;
    (2) per-(value, bucket) counts — one bounded aggregate — yield the
        within-value bucket offsets (a per-value window over at most
        ``tie_buckets`` aggregated rows); the per-value totals from the
        envelope aggregate yield the global value offsets (a global
        window over the BOUNDED value domain, post-aggregation);
    (3) a broadcast join back (NULL-SAFE on the value, so NULL values
        bin like any other) + a (value, bucket)-partitioned row_number
        by id gives every row its exact global rank without co-locating
        the table (the offsets frame is one row per live (value,
        bucket) pair — swap the broadcast for a shuffle join if the
        value domain itself is huge);
    (4) NTILE's fill rule applied as arithmetic on the rank.
    Returns ``df``'s (id_col, value_col) plus a bigint ``bin`` column.

    ``id_col`` must be an INTEGER-typed NON-NULL column (it is the
    deterministic tie break, and the monotone-bucket trick needs a cast
    that preserves order — both enforced: a lexicographic string id
    would silently mis-bucket, and a NULL id would silently drop its
    row at the offsets join while still shifting every other rank in
    its value group). One bounded driver action (count + NULL-id count
    in a single aggregate) fixes N and validates the tie break."""
    from pyspark.sql import Window

    if bins < 1:
        raise ValueError(f"bins must be >= 1, got {bins}")
    if tie_buckets < 1:
        raise ValueError(f"tie_buckets must be >= 1, got {tie_buckets}")
    id_type = dict(df.dtypes).get(id_col)
    if id_type not in ("tinyint", "smallint", "int", "bigint"):
        raise ValueError(
            f"exact_ntile: id_col {id_col!r} must be integer-typed for "
            f"order-preserving tie bucketing, got {id_type!r}"
        )
    stats = df.agg(
        F.count(F.lit(1)).alias("n"),
        F.count(F.when(F.col(id_col).isNull(), 1)).alias("nullids"),
    ).collect()[0]
    total = stats["n"]  # bounded scalars: ONE job for N + the null check
    if stats["nullids"]:
        raise ValueError(
            f"exact_ntile: id_col {id_col!r} has {stats['nullids']} NULL "
            "rows — the tie break must be non-null (a NULL id would be "
            "silently dropped while shifting the ranks of its value group)"
        )
    q, r = divmod(total, bins)
    if total == 0:
        return df.select(
            id_col, value_col, F.lit(None).cast("bigint").alias("bin")
        ).limit(0)
    base, vstats = _per_value_tie_buckets(
        df, value_col, id_col, tie_buckets
    )
    per_vb = base.groupBy(value_col, "__tb").agg(
        F.count(F.lit(1)).alias("__c")
    )
    # within-value bucket offsets: window over <= tie_buckets aggregated
    # rows per value; global value offsets: window over the bounded
    # value domain (both post-aggregation — the lint discipline; both
    # ASC = NULLS FIRST, matching the NTILE reference order)
    w_vb = Window.partitionBy(value_col).orderBy("__tb").rowsBetween(
        Window.unboundedPreceding, -1
    )
    w_val = Window.orderBy(value_col).rowsBetween(
        Window.unboundedPreceding, -1
    )
    per_val = vstats.select(value_col, "__vc")
    val_off = per_val.select(
        F.col(value_col).alias("__vk"),
        F.coalesce(F.sum("__vc").over(w_val), F.lit(0)).alias("__vbefore"),
    )
    offsets = (
        per_vb.select(
            value_col,
            "__tb",
            F.coalesce(F.sum("__c").over(w_vb), F.lit(0)).alias("__bbefore"),
        )
        .join(val_off, F.col(value_col).eqNullSafe(F.col("__vk")))
        .select(
            F.col(value_col).alias("__ok"),
            F.col("__tb").alias("__otb"),
            (F.col("__vbefore") + F.col("__bbefore")).alias("__before"),
        )
    )
    w_tie = Window.partitionBy(value_col, "__tb").orderBy(id_col)
    ranked = base.join(
        F.broadcast(offsets),
        base[value_col].eqNullSafe(offsets["__ok"])
        & (base["__tb"] == offsets["__otb"]),
    ).select(
        id_col,
        value_col,
        (F.col("__before") + F.row_number().over(w_tie)).alias("__rnk"),
    )
    cut = r * (q + 1)
    return ranked.select(
        id_col,
        value_col,
        F.when(
            F.col("__rnk") <= cut,
            F.expr(f"(__rnk - 1) div {q + 1}") + 1,
        )
        .otherwise(F.expr(f"{r} + (__rnk - 1 - {cut}) div {max(q, 1)}") + 1)
        .cast("bigint")
        .alias("bin"),
    )

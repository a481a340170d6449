"""Full-text retrieval over the documents corpus: inverted-index
construction, conjunctive (AND) keyword search by posting intersection,
and BM25 ranked retrieval with a log-free rational idf.

The reference pipeline has no search surface (its text handling is
clinical-field harmonization); these close the retrieval block a
training-data platform needs — indexing the corpus, serving boolean
filters, and quality-ranking documents against a term query — each as a
declarative DataFrame program whose physical plan is groupBy/broadcast
joins, never a driver-side loop over postings.

Determinism discipline: BM25's classic idf is ln((N - df + 0.5) /
(df + 0.5)) — a libm call that is NOT bit-stable across engines, so the
scored variant here uses the RATIONAL idf (2N - 2df + 1) / (2df + 1)
(the same argument the log wraps, a strictly monotone transform of it,
so rankings by either agree termwise for single-term queries and the
multi-term sum is a documented variant, not classic BM25). Every
per-term score is one IEEE expression over exact integers and two
representable constants, quantized to 1e-9 fixed point before the
cross-term sum so document scores are exact integers (a raw double sum
would be addend-order-dependent).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from c3dc_etl_spark.operators.text import lower_tokens

BM25_K1 = 1.2
BM25_B = 0.75  # exactly representable (3/4); 1 - b = 0.25 is exact too
BM25_SCALE = 1_000_000_000  # 1e-9 fixed point for the cross-term sum


def doc_term_freq(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """(doc_id, token, tf): the term-frequency relation every retrieval
    operator here consumes. One explode + one map-side-combined
    groupBy; tf is bigint."""
    return (
        df.select(
            F.col(id_col).alias("doc_id"),
            F.explode(lower_tokens(text_col)).alias("token"),
        )
        .groupBy("doc_id", "token")
        .agg(F.count(F.lit(1)).cast("bigint").alias("tf"))
    )


def doc_positions(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """(doc_id, pos, token): the positional-posting relation behind
    phrase and proximity search. pos is the 0-based index into the
    filtered token stream (blank tokens removed BEFORE numbering, so
    positions are engine-portable: DuckDB's LIST_FILTER + subscripting
    yields the same stream)."""
    return df.select(
        F.col(id_col).alias("doc_id"),
        F.posexplode(lower_tokens(text_col)).alias("pos", "token"),
    )


def phrase_match(pos: DataFrame, phrase: list[str]) -> DataFrame:
    """Exact consecutive-phrase search via the anchor trick: slot i of a
    k-token phrase matches occurrence (doc, p, t) iff t == phrase[i],
    contributing anchor p - i; a phrase instance at position a is a
    (doc, a) group covering ALL k distinct slots. ONE broadcast join of
    the vocabulary-filtered positional postings against the k-row slot
    table + one groupBy — never k-1 self-joins, so plan size is constant
    in phrase length. Repeated phrase tokens are handled naturally: each
    occurrence joins every slot carrying its token, but distinct-slot
    counting per anchor keeps only genuine alignments.

    Emits (doc_id, n_hits, first_pos) per matching document."""
    k = len(phrase)
    slots = pos.sparkSession.createDataFrame(
        list(enumerate(phrase)), "slot INT, token STRING"
    )
    anchored = (
        pos.filter(F.col("token").isin(list(set(phrase))))
        .join(F.broadcast(slots), "token")
        .select("doc_id", (F.col("pos") - F.col("slot")).alias("anchor"), "slot")
    )
    hits = (
        anchored.groupBy("doc_id", "anchor")
        .agg(F.countDistinct("slot").alias("n_slots"))
        .filter((F.col("n_slots") == k) & (F.col("anchor") >= 0))
    )
    return hits.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_hits"),
        F.min("anchor").cast("bigint").alias("first_pos"),
    )


def proximity_match(
    pos: DataFrame, term_a: str, term_b: str, window: int
) -> DataFrame:
    """Documents where ``term_a`` and ``term_b`` co-occur within
    ``window`` token positions; emits per-doc occurrence counts and the
    exact minimum distance. The self-join is bounded by the two terms'
    per-doc tf (never corpus x corpus); for stop-wordy terms at 100 TB
    the upgrade is a per-doc sort-merge (positions are already grouped
    by doc after the exchange), but the all-pairs min inside one doc is
    tf_a x tf_b <= a few thousand cells — cheaper than the extra sort.

    Docs containing only one of the terms drop out (inner join) — the
    operator answers "co-occurrence", not boolean OR."""
    a = pos.filter(F.col("token") == term_a).select(
        "doc_id", F.col("pos").alias("pa")
    )
    b = pos.filter(F.col("token") == term_b).select(
        "doc_id", F.col("pos").alias("pb")
    )
    return (
        a.join(b, "doc_id")
        .groupBy("doc_id")
        .agg(
            F.countDistinct("pa").cast("bigint").alias("n_a"),
            F.countDistinct("pb").cast("bigint").alias("n_b"),
            F.min(F.abs(F.col("pa") - F.col("pb"))).cast("bigint").alias(
                "min_dist"
            ),
        )
        .filter(F.col("min_dist") <= window)
    )


def inverted_index(tf: DataFrame, *, postings_head: int = 10) -> DataFrame:
    """Posting lists: per token, document frequency, total term count,
    and the first ``postings_head`` doc ids in ascending order as a
    ';'-joined string (a bounded, deterministic sample of the list —
    the driver-side canonicalizer cannot hash array cells).

    Scale: a stop-word's full posting list is corpus-sized; collecting
    it into ONE array row would OOM an executor at 100 TB, which is why
    the emitted surface caps the materialized head and the index itself
    stays relational (token -> rows), ready to be range-sharded by
    (token, bucket(doc_id)) when a single token's postings outgrow a
    task."""
    return tf.groupBy("token").agg(
        F.count(F.lit(1)).cast("bigint").alias("df"),
        F.sum("tf").cast("bigint").alias("total_tf"),
        F.array_join(
            F.transform(
                F.slice(
                    F.sort_array(F.collect_list("doc_id")), 1, postings_head
                ),
                lambda d: d.cast("string"),
            ),
            ";",
        ).alias("postings_head"),
    )


def conjunctive_match(tf: DataFrame, terms: list[str]) -> DataFrame:
    """Documents containing ALL query terms (boolean AND), by posting
    intersection: filter the tf relation to the query vocabulary
    (pushed to the scan), then one groupBy keeping docs whose distinct
    matched-term count equals |terms|. Emits per-doc match stats.
    No self-joins: intersecting k posting lists is one aggregation."""
    n = len(terms)
    matched = tf.filter(F.col("token").isin(list(terms)))
    return (
        matched.groupBy("doc_id")
        .agg(
            F.countDistinct("token").cast("bigint").alias("n_terms"),
            F.sum("tf").cast("bigint").alias("total_tf"),
            F.min("tf").cast("bigint").alias("min_tf"),
            F.max("tf").cast("bigint").alias("max_tf"),
        )
        .filter(F.col("n_terms") == n)
    )


TFIDF_SCALE = 100  # fixed-point scale for integer-exact tf-idf weights


def tfidf_weights(tf: DataFrame, n_docs: int) -> DataFrame:
    """(doc_id, token, w): integer-exact tf-idf weights. w = tf *
    rational_idf quantized via integral division — ``(tf * (2N - 2df +
    1) * SCALE) div (2df + 1)`` — so every downstream dot product /
    norm is an exact BIGINT sum (engine- and order-independent). All
    operands are positive, so Spark's truncating ``div`` and DuckDB's
    flooring ``//`` agree. df comes from a vocabulary-sized aggregate
    broadcast back onto the postings."""
    dfreq = tf.groupBy("token").agg(
        F.count(F.lit(1)).cast("bigint").alias("df")
    )
    w = F.expr(
        f"(tf * (2 * {n_docs} - 2 * df + 1) * {TFIDF_SCALE})"
        " div (2 * df + 1)"
    )
    return (
        tf.join(F.broadcast(dfreq), "token")
        .select("doc_id", "token", w.cast("bigint").alias("w"), "df")
    )


def tfidf_cosine_pairs(
    tf: DataFrame, n_docs: int, *, df_cap_pct: int = 6
) -> DataFrame:
    """Lexical "more-like-this": full tf-idf cosine between every pair
    of documents sharing at least one RARE token (df <= df_cap_pct% of
    the corpus). The rare-token gate is the candidate generator — the
    same discriminative-feature blocking as minhash banding, but
    df-driven: stop-wordy tokens never generate pairs (a stop token's
    posting self-join is |corpus|^2 at 100 TB), while the cosine itself
    is computed over ALL shared tokens of each candidate pair, so the
    emitted similarity is exact, not an approximation over rare terms.

    dot/norms are exact BIGINT sums of fixed-point weights
    (tfidf_weights); cosine = dot / (sqrt(na2) * sqrt(nb2)) is three
    correctly-rounded IEEE ops off exact integers — bit-stable across
    engines."""
    weights = tfidf_weights(tf, n_docs)
    cap = max(1, n_docs * df_cap_pct // 100)
    rare = weights.filter(F.col("df") <= cap).select("doc_id", "token")
    pairs = (
        rare.alias("a")
        .join(rare.alias("b"), "token")
        .filter(F.col("a.doc_id") < F.col("b.doc_id"))
        .select(
            F.col("a.doc_id").alias("da"), F.col("b.doc_id").alias("db")
        )
        .distinct()
    )
    wa = weights.select(F.col("doc_id").alias("da"), "token", F.col("w").alias("wa"))
    wb = weights.select(F.col("doc_id").alias("db"), "token", F.col("w").alias("wb"))
    dot = (
        pairs.join(wa, "da")
        .join(wb, ["db", "token"])
        .groupBy("da", "db")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_shared"),
            F.sum(F.col("wa") * F.col("wb")).cast("bigint").alias("dot_fp"),
        )
    )
    n2 = weights.groupBy("doc_id").agg(
        F.sum(F.col("w") * F.col("w")).cast("bigint").alias("n2")
    )
    na = n2.select(F.col("doc_id").alias("da"), F.col("n2").alias("na2"))
    nb = n2.select(F.col("doc_id").alias("db"), F.col("n2").alias("nb2"))
    return (
        dot.join(na, "da")
        .join(nb, "db")
        .select(
            F.col("da").alias("doc_a"),
            F.col("db").alias("doc_b"),
            "n_shared",
            "dot_fp",
            (
                F.col("dot_fp").cast("double")
                / (
                    F.sqrt(F.col("na2").cast("double"))
                    * F.sqrt(F.col("nb2").cast("double"))
                )
            ).alias("cosine"),
        )
    )


def bm25_topk(
    tf: DataFrame,
    terms: list[str],
    n_docs: int,
    avgdl: float,
    *,
    k: int = 20,
) -> DataFrame:
    """Top-k documents for a disjunctive term query under rational-idf
    BM25 (module docstring). ``n_docs`` and ``avgdl`` are bounded
    driver scalars (two integers' worth of state — the pagerank
    n_nodes discipline).

    Plan: candidates = pushed-filter scan of tf on the query
    vocabulary; per-term df from a |terms|-row aggregate broadcast
    back; dl joined from the per-doc length aggregate; per-term scores
    quantized to exact integers, summed per doc; top-k via
    orderBy(score desc, doc_id).limit(k) — Spark plans
    TakeOrderedAndProject: per-partition heaps + driver merge of k
    rows, never a global sort."""
    cand = tf.filter(F.col("token").isin(list(terms)))
    dfreq = cand.groupBy("token").agg(
        F.count(F.lit(1)).cast("bigint").alias("df")
    )
    dl = tf.groupBy("doc_id").agg(F.sum("tf").cast("bigint").alias("dl"))
    idf = (2 * F.lit(n_docs) - 2 * F.col("df") + 1).cast("double") / (
        2 * F.col("df") + 1
    ).cast("double")
    tfd = F.col("tf").cast("double")
    denom = tfd + F.lit(BM25_K1) * (
        F.lit(1.0 - BM25_B)
        + F.lit(BM25_B) * (F.col("dl").cast("double") / F.lit(avgdl))
    )
    term_fp = F.floor(
        idf * (tfd * F.lit(BM25_K1 + 1)) / denom * F.lit(BM25_SCALE)
        + F.lit(0.5)
    ).cast("bigint")
    scored = (
        cand.join(F.broadcast(dfreq), "token")
        .join(dl, "doc_id")
        .select("doc_id", term_fp.alias("fp"))
        .groupBy("doc_id")
        .agg(F.sum("fp").cast("bigint").alias("score_fp"))
    )
    top = scored.orderBy(F.col("score_fp").desc(), F.col("doc_id")).limit(k)
    return top.select(
        F.row_number()
        .over(Window.orderBy(F.col("score_fp").desc(), F.col("doc_id")))
        .alias("rank"),
        "doc_id",
        "score_fp",
        # ONE correctly-rounded IEEE division off an exact integer — the
        # only bit-stable way to emit a float score cross-engine (round()
        # half-up vs half-away disagrees between engines on some doubles).
        (F.col("score_fp").cast("double") / F.lit(float(BM25_SCALE))).alias(
            "score"
        ),
    )


def merge_index_segments(
    a: DataFrame, b: DataFrame, *, postings_head: int = 10
) -> DataFrame:
    """Lucene-style segment merge: combine two independently built index
    segments (outputs of :func:`inverted_index` over DISJOINT document
    sets) into the index a single full build would produce. df and
    total_tf are additive; the merged postings head re-sorts the UNION
    of the two segment heads and re-caps — exactly correct because the
    global ``postings_head`` smallest doc ids are each the smallest of
    their own segment, hence present in that segment's head. This is
    the write path of every log-structured search engine: segments
    build independently (parallel, incremental), merges touch only the
    per-token stat rows — never re-tokenizing either side's documents."""
    merged = a.unionByName(b)
    heads = F.flatten(
        F.collect_list(
            F.transform(
                F.split(F.col("postings_head"), ";"),
                lambda x: x.cast("bigint"),
            )
        )
    )
    return merged.groupBy("token").agg(
        F.sum("df").cast("bigint").alias("df"),
        F.sum("total_tf").cast("bigint").alias("total_tf"),
        F.array_join(
            F.transform(
                F.slice(F.array_sort(heads), 1, postings_head),
                lambda d: d.cast("string"),
            ),
            ";",
        ).alias("postings_head"),
    )

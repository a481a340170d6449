"""Training-data quality / curation suite queries: Gopher-style
repetition signals, PII redaction, benchmark decontamination, sequence
packing, and per-domain corpus stats. Spark plans come from
c3dc_etl_spark.operators.{quality,decontam,packing}; every constant
(regexes, n-gram sizes, budgets, hash seeds) is shared with the
generated DuckDB oracle so both engines compute bit-identical rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from c3dc_etl_spark.operators import quality as Q
from c3dc_etl_spark.operators import text as T
from c3dc_etl_spark.operators.chunking import chunk_documents
from c3dc_etl_spark.operators.dedup import spread
from c3dc_etl_spark.operators.decontam import (
    BLOOM_M_BITS,
    bloom_contamination,
    contamination,
)
from c3dc_etl_spark.operators.packing import pack_chunks, sequence_manifest
from c3dc_etl_spark.suite.registry import load, query

_X1E4 = "CAST(FLOOR(({x}) * 10000 + 0.5) AS BIGINT)"


def _x1e4(c):
    return F.floor(c * 10000 + F.lit(0.5)).cast("bigint")


# --------------------------------------------------------------------------
# Repetition signals (Gopher §A.1.1 token family)
# --------------------------------------------------------------------------

_REP_ORACLE = f"""
WITH toked AS (
    SELECT doc_id, REGEXP_SPLIT_TO_ARRAY(TRIM(text), '\\s+') AS toks
    FROM documents
    WHERE TRIM(text) <> ''
),
base AS (
    SELECT doc_id,
           CAST(LEN(toks) AS BIGINT) AS n_tokens,
           CAST(LEN(toks) - LEN(LIST_DISTINCT(toks)) AS DOUBLE)
               / CAST(LEN(toks) AS DOUBLE) AS dup_frac
    FROM toked
),
g AS (
    SELECT doc_id,
           UNNEST(LIST_CONCAT(
               CASE WHEN LEN(toks) >= 2
                    THEN LIST_TRANSFORM(GENERATE_SERIES(1, LEN(toks) - 1),
                                        i -> toks[i] || ' ' || toks[i + 1])
                    ELSE [] END,
               CASE WHEN LEN(toks) >= 3
                    THEN LIST_TRANSFORM(GENERATE_SERIES(1, LEN(toks) - 2),
                                        i -> toks[i] || ' ' || toks[i + 1] || ' ' || toks[i + 2])
                    ELSE [] END)) AS gram
    FROM toked
),
gc AS (
    SELECT doc_id, gram, COUNT(*) AS cnt FROM g GROUP BY doc_id, gram
),
agg AS (
    SELECT doc_id,
           MAX(CASE WHEN LEN(STRING_SPLIT(gram, ' ')) = 2 THEN cnt END) AS top2,
           SUM(CASE WHEN LEN(STRING_SPLIT(gram, ' ')) = 2 THEN cnt END) AS tot2,
           MAX(CASE WHEN LEN(STRING_SPLIT(gram, ' ')) = 3 THEN cnt END) AS top3,
           SUM(CASE WHEN LEN(STRING_SPLIT(gram, ' ')) = 3 THEN cnt END) AS tot3
    FROM gc GROUP BY doc_id
)
SELECT b.doc_id, b.n_tokens,
       {_X1E4.format(x='b.dup_frac')} AS dup_token_x1e4,
       {_X1E4.format(x='COALESCE(CAST(a.top2 AS DOUBLE) / CAST(a.tot2 AS DOUBLE), 0.0)')}
           AS top2gram_x1e4,
       {_X1E4.format(x='COALESCE(CAST(a.top3 AS DOUBLE) / CAST(a.tot3 AS DOUBLE), 0.0)')}
           AS top3gram_x1e4
FROM base b LEFT JOIN agg a USING (doc_id)
"""


@query("text_repetition_stats", oracle=_REP_ORACLE, tags=("text", "quality"))
def text_repetition_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style repetition quality signals per document: duplicate
    -token fraction plus the fraction of all 2-grams / 3-grams taken by
    the single most frequent one (boilerplate and generation loops
    score high and get dropped). The 2- and 3-gram mode is computed in
    ONE explode + two-level hash aggregation keyed by doc_id — partial
    aggregation collapses each task's grams before the single exchange,
    and no key is hotter than the longest document, so the plan is
    skew-proof at any corpus size."""
    docs = spread(
        load(spark, sf_dir, "documents").filter(F.trim(F.col("text")) != "")
    )
    toked = docs.select("doc_id", T.tokens("text").alias("toks"))
    base = toked.select(
        "doc_id",
        F.size("toks").cast("bigint").alias("n_tokens"),
        _x1e4(Q.dup_token_fraction(F.col("toks"))).alias("dup_token_x1e4"),
    )
    g = toked.select(
        "doc_id",
        F.explode(
            F.concat(
                Q.token_ngrams(F.col("toks"), 2), Q.token_ngrams(F.col("toks"), 3)
            )
        ).alias("gram"),
    )
    gc = g.groupBy("doc_id", "gram").agg(F.count(F.lit(1)).alias("cnt"))
    gram_n = F.size(F.split(F.col("gram"), " "))
    agg = gc.groupBy("doc_id").agg(
        F.max(F.when(gram_n == 2, F.col("cnt"))).alias("top2"),
        F.sum(F.when(gram_n == 2, F.col("cnt"))).alias("tot2"),
        F.max(F.when(gram_n == 3, F.col("cnt"))).alias("top3"),
        F.sum(F.when(gram_n == 3, F.col("cnt"))).alias("tot3"),
    )
    frac2 = F.coalesce(
        F.col("top2").cast("double") / F.col("tot2").cast("double"), F.lit(0.0)
    )
    frac3 = F.coalesce(
        F.col("top3").cast("double") / F.col("tot3").cast("double"), F.lit(0.0)
    )
    return base.join(agg, "doc_id", "left").select(
        "doc_id",
        "n_tokens",
        "dup_token_x1e4",
        _x1e4(frac2).alias("top2gram_x1e4"),
        _x1e4(frac3).alias("top3gram_x1e4"),
    )


# --------------------------------------------------------------------------
# PII redaction
# --------------------------------------------------------------------------

# The synthetic corpus contains no PII, so deterministic PII is spliced
# in (keyed on doc_id, mirrored verbatim in the oracle) to give the
# redaction regexes real matches to count and rewrite.
_AUG_SQL = """
    SELECT doc_id,
           text
           || CASE WHEN doc_id % 5 = 0
                   THEN ' contact user' || CAST(doc_id AS STRING) || '@example.com'
                   ELSE '' END
           || CASE WHEN doc_id % 7 = 0
                   THEN ' call 415-555-' || LPAD(CAST(doc_id % 10000 AS STRING), 4, '0')
                   ELSE '' END
           || CASE WHEN doc_id % 11 = 0
                   THEN ' host 10.0.' || CAST(doc_id % 256 AS STRING)
                        || '.' || CAST((doc_id * 7) % 256 AS STRING)
                   ELSE '' END AS text
    FROM documents
"""

_EMAIL_RE, _IP_RE, _PHONE_RE = (p for _, p, _ in Q.PII_PATTERNS)

_PII_ORACLE = f"""
WITH aug AS ({_AUG_SQL}),
red AS (
    SELECT doc_id,
           CAST(LEN(REGEXP_EXTRACT_ALL(text, '{_EMAIL_RE}')) AS BIGINT) AS n_emails,
           CAST(LEN(REGEXP_EXTRACT_ALL(text, '{_IP_RE}')) AS BIGINT) AS n_ips,
           CAST(LEN(REGEXP_EXTRACT_ALL(text, '{_PHONE_RE}')) AS BIGINT) AS n_phones,
           REGEXP_REPLACE(REGEXP_REPLACE(REGEXP_REPLACE(text,
               '{_EMAIL_RE}', '<EMAIL>', 'g'),
               '{_IP_RE}', '<IP>', 'g'),
               '{_PHONE_RE}', '<PHONE>', 'g') AS redacted
    FROM aug
)
SELECT doc_id, n_emails, n_ips, n_phones,
       CAST(LENGTH(redacted) AS BIGINT) AS redacted_len,
       MD5(redacted) AS redacted_md5
FROM red
"""


@query("pii_redaction", oracle=_PII_ORACLE, tags=("text", "quality"))
def pii_redaction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII scrub for training corpora: count + redact emails, IPv4
    addresses and phone numbers with placeholder tokens. One codegen
    projection (chained JVM regexp_replace / regexp_count) — narrow, no
    shuffle, scales linearly with corpus bytes."""
    d = F.col("doc_id")
    aug = spread(load(spark, sf_dir, "documents")).select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.when(
                d % 5 == 0,
                F.concat(
                    F.lit(" contact user"), d.cast("string"), F.lit("@example.com")
                ),
            ).otherwise(F.lit("")),
            F.when(
                d % 7 == 0,
                F.concat(
                    F.lit(" call 415-555-"),
                    F.lpad((d % 10000).cast("string"), 4, "0"),
                ),
            ).otherwise(F.lit("")),
            F.when(
                d % 11 == 0,
                F.concat(
                    F.lit(" host 10.0."),
                    (d % 256).cast("string"),
                    F.lit("."),
                    ((d * 7) % 256).cast("string"),
                ),
            ).otherwise(F.lit("")),
        ).alias("text"),
    )
    counts = Q.pii_counts("text")
    red = Q.redact_pii("text")
    return aug.select(
        "doc_id",
        counts["email"].alias("n_emails"),
        counts["ip"].alias("n_ips"),
        counts["phone"].alias("n_phones"),
        F.length(red).cast("bigint").alias("redacted_len"),
        F.md5(red).alias("redacted_md5"),
    )


# --------------------------------------------------------------------------
# Benchmark decontamination
# --------------------------------------------------------------------------

DECONTAM_N = 8
EVAL_MOD = 97
FLAG_THRESHOLD = 0.05

_DECON_ORACLE = f"""
WITH toked AS (
    SELECT doc_id, REGEXP_SPLIT_TO_ARRAY(TRIM(text), '\\s+') AS toks
    FROM documents
),
grams AS (
    SELECT DISTINCT doc_id,
           ARRAY_TO_STRING(toks[i : i + {DECONTAM_N - 1}], ' ') AS gram
    FROM toked, UNNEST(GENERATE_SERIES(1, LEN(toks) - {DECONTAM_N - 1})) AS t(i)
    WHERE LEN(toks) >= {DECONTAM_N}
),
eval_g AS (
    SELECT DISTINCT gram FROM grams WHERE doc_id % {EVAL_MOD} = 0
),
train AS (
    SELECT doc_id, gram FROM grams WHERE doc_id % {EVAL_MOD} <> 0
),
agg AS (
    SELECT t.doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_shingles,
           CAST(COUNT(e.gram) AS BIGINT) AS n_overlap
    FROM train t LEFT JOIN eval_g e USING (gram)
    GROUP BY t.doc_id
)
SELECT d.doc_id,
       COALESCE(a.n_shingles, 0) AS n_shingles,
       COALESCE(a.n_overlap, 0) AS n_overlap,
       {_X1E4.format(x='CAST(COALESCE(a.n_overlap, 0) AS DOUBLE) / GREATEST(COALESCE(a.n_shingles, 0), 1)')}
           AS contam_x1e4,
       CASE WHEN {_X1E4.format(x='CAST(COALESCE(a.n_overlap, 0) AS DOUBLE) / GREATEST(COALESCE(a.n_shingles, 0), 1)')}
                 >= {int(round(FLAG_THRESHOLD * 10000))} THEN 1 ELSE 0 END AS flagged
FROM documents d LEFT JOIN agg a USING (doc_id)
WHERE d.doc_id % {EVAL_MOD} <> 0
"""


@query(
    "contamination_ngram_overlap", oracle=_DECON_ORACLE, tags=("dedup", "quality")
)
def contamination_ngram_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Eval-set decontamination (GPT-3/PaLM recipe): every training
    document's distinct {DECONTAM_N}-gram set is checked against the
    union of eval-document n-grams; documents over the overlap threshold
    are flagged for dropping. The eval n-gram set (benchmarks are MBs)
    is broadcast; the corpus side never shuffles more than its own
    distinct (doc, gram) pairs, with map-side partial aggregation on
    both the distinct and the per-doc counts."""
    docs = load(spark, sf_dir, "documents")
    train = docs.filter(F.col("doc_id") % EVAL_MOD != 0)
    eval_df = docs.filter(F.col("doc_id") % EVAL_MOD == 0)
    return contamination(
        train,
        eval_df,
        text_col="text",
        id_col="doc_id",
        n=DECONTAM_N,
        flag_threshold=FLAG_THRESHOLD,
    )


BLOOM_M = BLOOM_M_BITS  # imported: the oracle modulus cannot drift

# One bloom position per (gram, hash j): first 8 md5 hex chars of
# 'bf<j>:gram' as an integer mod m — identical arithmetic to
# operators.decontam.bloom_positions, so the oracle reproduces the
# bitset EXACTLY, false positives included. Membership through the
# position SET is bit-identical to the packed-word test (words pack
# positions losslessly at bit granularity).
def _bpos(j: int, gram: str) -> str:
    return (
        f"CAST(CONCAT('0x', SUBSTR(MD5('bf{j}:' || {gram}), 1, 8)) AS BIGINT)"
        f" % {BLOOM_M}"
    )


_BLOOM_ORACLE = f"""
WITH toked AS (
    SELECT doc_id, REGEXP_SPLIT_TO_ARRAY(TRIM(text), '\\s+') AS toks
    FROM documents
),
grams AS (
    SELECT DISTINCT doc_id,
           ARRAY_TO_STRING(toks[i : i + {DECONTAM_N - 1}], ' ') AS gram
    FROM toked, UNNEST(GENERATE_SERIES(1, LEN(toks) - {DECONTAM_N - 1})) AS t(i)
    WHERE LEN(toks) >= {DECONTAM_N}
),
eval_g AS (
    SELECT DISTINCT gram FROM grams WHERE doc_id % {EVAL_MOD} = 0
),
pos AS (
    SELECT DISTINCT p FROM (
        SELECT {_bpos(0, 'gram')} AS p FROM eval_g
        UNION ALL
        SELECT {_bpos(1, 'gram')} AS p FROM eval_g
    )
),
probes AS (
    SELECT doc_id, {_bpos(0, 'gram')} AS h0, {_bpos(1, 'gram')} AS h1
    FROM grams WHERE doc_id % {EVAL_MOD} <> 0
),
hits AS (
    SELECT pr.doc_id,
           CASE WHEN p0.p IS NOT NULL AND p1.p IS NOT NULL THEN 1 ELSE 0 END AS hit
    FROM probes pr
    LEFT JOIN pos p0 ON pr.h0 = p0.p
    LEFT JOIN pos p1 ON pr.h1 = p1.p
),
agg AS (
    SELECT doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_shingles,
           CAST(SUM(hit) AS BIGINT) AS n_bloom_hits
    FROM hits GROUP BY doc_id
)
SELECT d.doc_id,
       COALESCE(a.n_shingles, 0) AS n_shingles,
       COALESCE(a.n_bloom_hits, 0) AS n_bloom_hits,
       {_X1E4.format(x='CAST(COALESCE(a.n_bloom_hits, 0) AS DOUBLE) / GREATEST(COALESCE(a.n_shingles, 0), 1)')}
           AS bloom_x1e4,
       CASE WHEN {_X1E4.format(x='CAST(COALESCE(a.n_bloom_hits, 0) AS DOUBLE) / GREATEST(COALESCE(a.n_shingles, 0), 1)')}
                 >= {int(round(FLAG_THRESHOLD * 10000))} THEN 1 ELSE 0 END AS flagged
FROM documents d LEFT JOIN agg a USING (doc_id)
WHERE d.doc_id % {EVAL_MOD} <> 0
"""


@query(
    "contamination_bloom_filter", oracle=_BLOOM_ORACLE, tags=("dedup", "quality")
)
def contamination_bloom_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-filter decontamination — the constant-size-broadcast scale
    path beside contamination_ngram_overlap's exact join: the eval
    n-gram set is compressed to a fixed 2^17-bit bitset (<= 2048 bigint
    words) and every training gram probes it with 2 md5-derived bit
    positions via broadcast hash joins. The broadcast stays 16 KiB no
    matter how many benchmarks are registered; the price is a
    deterministic false-positive margin (n_bloom_hits >= the exact
    n_overlap), which the oracle reproduces bit-for-bit from the same
    md5 arithmetic — even the approximation error is value-hash-checked.
    """
    docs = load(spark, sf_dir, "documents")
    train = docs.filter(F.col("doc_id") % EVAL_MOD != 0)
    eval_df = docs.filter(F.col("doc_id") % EVAL_MOD == 0)
    return bloom_contamination(
        train,
        eval_df,
        text_col="text",
        id_col="doc_id",
        n=DECONTAM_N,
        flag_threshold=FLAG_THRESHOLD,
    )


# --------------------------------------------------------------------------
# Sequence packing
# --------------------------------------------------------------------------

PACK_CHUNK_TOKENS = 32
PACK_BUDGET = 256
PACK_SHARDS = 8
PACK_SEED = "pk"

_PACK_ORACLE = f"""
WITH toked AS (
    SELECT doc_id, REGEXP_SPLIT_TO_ARRAY(TRIM(text), '\\s+') AS toks
    FROM documents
    WHERE TRIM(text) <> ''
),
chunks AS (
    SELECT doc_id,
           CAST(start // {PACK_CHUNK_TOKENS} AS INT) AS chunk_index,
           CAST(LEN(toks[start + 1 : start + {PACK_CHUNK_TOKENS}]) AS BIGINT) AS n_tokens
    FROM (
        SELECT doc_id, toks,
               UNNEST(GENERATE_SERIES(0, GREATEST(LEN(toks) - 1, 0),
                                      {PACK_CHUNK_TOKENS})) AS start
        FROM toked
    )
),
sharded AS (
    SELECT doc_id, chunk_index, n_tokens,
           CAST(CONCAT('0x', SUBSTR(MD5('{PACK_SEED}:' || CAST(doc_id AS STRING)), 1, 8))
                AS BIGINT) % {PACK_SHARDS} AS shard
    FROM chunks
),
packed AS (
    SELECT shard, doc_id, chunk_index, n_tokens,
           COALESCE(SUM(n_tokens) OVER (
               PARTITION BY shard ORDER BY doc_id, chunk_index
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS tokens_before
    FROM sharded
)
SELECT shard,
       CAST(FLOOR(CAST(tokens_before AS DOUBLE) / {PACK_BUDGET}) AS BIGINT) AS seq_id,
       CAST(COUNT(*) AS BIGINT) AS n_chunks,
       CAST(SUM(n_tokens) AS BIGINT) AS seq_tokens,
       CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs,
       MIN(doc_id) AS first_doc,
       MAX(doc_id) AS last_doc
FROM packed
GROUP BY shard, seq_id
"""


@query("sequence_packing", oracle=_PACK_ORACLE, tags=("chunking", "packing"))
def sequence_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training-sequence packing: non-overlapping {PACK_CHUNK_TOKENS}
    -token chunks are filled into {PACK_BUDGET}-token sequences by a
    cumulative-sum window inside md5-balanced shards (see
    operators.packing for the slack/determinism trade-off). Exactly ONE
    hash shuffle at any scale: the shard exchange for the window — the
    per-(shard, seq) manifest aggregation reuses it, because hash
    partitioning on a prefix of the grouping keys already satisfies the
    aggregation's clustered distribution."""
    docs = spread(load(spark, sf_dir, "documents"))
    chunks = chunk_documents(
        docs, "text", "doc_id", chunk_tokens=PACK_CHUNK_TOKENS, overlap=0
    )
    packed = pack_chunks(
        chunks,
        budget=PACK_BUDGET,
        num_shards=PACK_SHARDS,
        seed=PACK_SEED,
    )
    return sequence_manifest(packed)


# --------------------------------------------------------------------------
# Per-domain corpus stats
# --------------------------------------------------------------------------

_DOMAIN_ORACLE = f"""
WITH f AS (
    SELECT source, lang, n_chars,
           CASE WHEN TRIM(text) = '' THEN 0
                ELSE CAST(LEN(REGEXP_SPLIT_TO_ARRAY(TRIM(text), '\\s+')) AS BIGINT)
           END AS n_toks,
           MD5(SUBSTR(LOWER(REGEXP_REPLACE(TRIM(text), '\\s+', ' ', 'g')), 1, 256))
               AS fp
    FROM documents
)
SELECT source,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(n_toks) AS BIGINT) AS total_tokens,
       CAST(COUNT(DISTINCT lang) AS BIGINT) AS n_langs,
       {_X1E4.format(x='CAST(COUNT(*) - COUNT(DISTINCT fp) AS DOUBLE) / COUNT(*)')}
           AS exact_dup_x1e4,
       CAST(FLOOR(CAST(SUM(n_chars) AS DOUBLE) / COUNT(*) * 10000 + 0.5) AS BIGINT)
           AS mean_chars_x1e4
FROM f
GROUP BY source
"""


@query("domain_stats", oracle=_DOMAIN_ORACLE, tags=("quality", "agg"))
def domain_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-domain (source) corpus accounting: document/token volumes,
    language spread, exact-duplicate rate (via the normalized-prefix
    fingerprint), mean document length. The mix report that drives
    mixture-weight decisions. One hash aggregation keyed by source with
    map-side partials; the two COUNT(DISTINCT)s expand rows 2x before
    the exchange — still one shuffle, and domain cardinality is tiny."""
    docs = spread(load(spark, sf_dir, "documents"))
    f = docs.select(
        "source",
        "lang",
        "n_chars",
        T.token_count("text").alias("n_toks"),
        T.doc_fingerprint("text").alias("fp"),
    )
    agg = f.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_toks").cast("bigint").alias("total_tokens"),
        F.countDistinct("lang").cast("bigint").alias("n_langs"),
        F.countDistinct("fp").alias("n_unique"),
        F.sum("n_chars").alias("total_chars"),
    )
    dup_frac = (F.col("n_docs") - F.col("n_unique")).cast("double") / F.col(
        "n_docs"
    ).cast("double")
    mean_chars = F.col("total_chars").cast("double") / F.col("n_docs").cast(
        "double"
    )
    return agg.select(
        "source",
        "n_docs",
        "total_tokens",
        "n_langs",
        _x1e4(dup_frac).alias("exact_dup_x1e4"),
        F.floor(mean_chars * 10000 + F.lit(0.5)).cast("bigint").alias(
            "mean_chars_x1e4"
        ),
    )


# --------------------------------------------------------------------------
# Per-domain length distribution
# --------------------------------------------------------------------------

_QUANTILE_ORACLE = """
SELECT source,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       MIN(n_chars) AS min_chars,
       ROUND(quantile_cont(n_chars, 0.5), 4) AS p50_chars,
       ROUND(quantile_cont(n_chars, 0.9), 4) AS p90_chars,
       ROUND(quantile_cont(n_chars, 0.99), 4) AS p99_chars,
       MAX(n_chars) AS max_chars
FROM documents
GROUP BY source
"""


@query("domain_length_quantiles", oracle=_QUANTILE_ORACLE, tags=("quality", "agg"))
def domain_length_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-domain document-length distribution (p50/p90/p99): the
    outlier report behind max-length truncation choices. Uses EXACT
    percentile for cross-engine oracle parity (Spark percentile ==
    DuckDB quantile_cont linear interpolation, verified elementwise;
    results rounded to 4dp to absorb any last-ulp libm divergence).
    Exact percentile materializes each group's values — fine for
    per-domain group counts; at 100 TB swap in approx_percentile
    (t-digest sketch, mergeable map-side) and accept the documented
    rank error."""
    docs = load(spark, sf_dir, "documents")
    return docs.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.min("n_chars").alias("min_chars"),
        F.round(F.expr("percentile(n_chars, 0.5)"), 4).alias("p50_chars"),
        F.round(F.expr("percentile(n_chars, 0.9)"), 4).alias("p90_chars"),
        F.round(F.expr("percentile(n_chars, 0.99)"), 4).alias("p99_chars"),
        F.max("n_chars").alias("max_chars"),
    )


_SPAN_W = 10

_SPAN_DEDUP_ORACLE = f"""
WITH w AS (
    SELECT doc_id, STRING_SPLIT(REGEXP_REPLACE(LOWER(TRIM(text)), '\\s+', ' ', 'g'), ' ') AS words
    FROM documents
),
c AS (
    SELECT doc_id, i AS pos,
           ARRAY_TO_STRING(words[(i*{_SPAN_W}+1):(i*{_SPAN_W}+{_SPAN_W})], ' ') AS chunk
    FROM w, UNNEST(RANGE(0, CAST(CEIL(LEN(words)/{_SPAN_W}.0) AS INT))) AS t(i)
),
hot AS (
    SELECT MD5(chunk) AS h
    FROM (SELECT DISTINCT MD5(chunk) AS h2, doc_id, chunk FROM c)
    GROUP BY 1 HAVING COUNT(DISTINCT doc_id) > 1
),
kept AS (
    SELECT doc_id, pos, chunk FROM c WHERE MD5(chunk) NOT IN (SELECT h FROM hot)
),
rebuilt AS (
    SELECT doc_id, ARRAY_TO_STRING(LIST(chunk ORDER BY pos), ' ') AS clean_text
    FROM kept GROUP BY doc_id
)
SELECT d.doc_id, COALESCE(r.clean_text, '') AS clean_text
FROM documents d LEFT JOIN rebuilt r USING (doc_id)
"""


@query("dedup_boilerplate_spans", oracle=_SPAN_DEDUP_ORACLE, tags=("dedup", "quality"))
def dedup_boilerplate_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-document span dedup through
    operators.quality.remove_duplicate_spans: every 10-word span seen
    in more than one document is removed from ALL documents and the
    survivors reassemble in order — the duplicate-paragraph /
    boilerplate-removal rule of public corpus pipelines, applied over
    fixed word windows. ~130 of the corpus's spans repeat across
    documents at sf0.01, so the hash pins real removals plus the
    empty-doc edge."""
    from c3dc_etl_spark.operators.quality import remove_duplicate_spans

    docs = load(spark, sf_dir, "documents").select("doc_id", "text")
    return remove_duplicate_spans(
        docs, "text", "doc_id", span_words=_SPAN_W, max_docs_per_span=1
    )


# Benford's law first-digit expectations log10(1 + 1/d) as exact double
# literals — constants, identical in both engines.
_BENFORD_P = [
    "0.3010299956639812",
    "0.17609125905568124",
    "0.12493873660829992",
    "0.09691001300805642",
    "0.07918124604762482",
    "0.06694678963061322",
    "0.05799194697768673",
    "0.05115252244738129",
    "0.04575749056067514",
]

# CAST each arm: a bare decimal literal parses as DECIMAL in DuckDB and
# stays DECIMAL through ROUND/+0.0, hash-mismatching Spark's double
_BENFORD_CASE = "CASE d " + " ".join(
    f"WHEN {i + 1} THEN CAST({p} AS DOUBLE)" for i, p in enumerate(_BENFORD_P)
) + " END"

_BENFORD_ORACLE = f"""
WITH digits AS (
    SELECT CAST(SUBSTR(CAST(CAST(FLOOR(o_totalprice) AS BIGINT) AS STRING), 1, 1)
                AS BIGINT) AS d
    FROM orders WHERE o_totalprice >= 1
),
cnt AS (
    SELECT d, COUNT(*) AS n, SUM(COUNT(*)) OVER () AS total FROM digits
    GROUP BY 1
)
SELECT CAST(d AS BIGINT) AS digit,
       CAST(n AS BIGINT) AS n,
       ROUND(CAST(n AS DOUBLE) / CAST(total AS DOUBLE), 6) + 0.0 AS observed_p,
       ROUND({_BENFORD_CASE}, 6) + 0.0 AS expected_p,
       CAST(FLOOR(
         (CAST(n AS DOUBLE) / CAST(total AS DOUBLE) - ({_BENFORD_CASE}))
         * (CAST(n AS DOUBLE) / CAST(total AS DOUBLE) - ({_BENFORD_CASE}))
         / ({_BENFORD_CASE}) * 1000000000 + 0.5) AS BIGINT) AS chi_term_fp
FROM cnt
"""


@query("benford_first_digit", oracle=_BENFORD_ORACLE, tags=("quality", "stats"))
def benford_first_digit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford's-law first-digit audit of o_totalprice — the classic
    fabricated-data / unit-mixing forensic check a data-quality layer
    runs on monetary columns. First digits by string head of the
    floored integer (no log10 on data values — the only logarithms are
    the nine EXPECTED proportions, compile-time double literals);
    per-digit observed vs expected proportion plus the chi-square term
    quantized to 1e-9 fixed point (the cross-digit SUM is then exact —
    same discipline as chi2_independence). One groupBy over 9 digit
    groups; the window total rides the 9-row table."""
    orders = load(spark, sf_dir, "orders").filter(F.col("o_totalprice") >= 1)
    digits = orders.select(
        F.substring(
            F.floor(F.col("o_totalprice")).cast("bigint").cast("string"), 1, 1
        )
        .cast("bigint")
        .alias("d")
    )
    from pyspark.sql import Window as W

    cnt = digits.groupBy("d").agg(F.count(F.lit(1)).alias("n")).select(
        "d", "n", F.sum("n").over(W.partitionBy()).alias("total")
    )
    expected = F.lit(None).cast("double")
    for i, p in enumerate(_BENFORD_P):
        expected = F.when(F.col("d") == i + 1, F.lit(float(p))).otherwise(
            expected
        )
    obs = F.col("n").cast("double") / F.col("total").cast("double")
    chi_term = F.floor(
        (obs - expected) * (obs - expected) / expected * F.lit(1000000000)
        + F.lit(0.5)
    ).cast("bigint")
    return cnt.select(
        F.col("d").cast("bigint").alias("digit"),
        F.col("n").cast("bigint").alias("n"),
        (F.round(obs, 6) + F.lit(0.0)).alias("observed_p"),
        (F.round(expected, 6) + F.lit(0.0)).alias("expected_p"),
        chi_term.alias("chi_term_fp"),
    )


BIN_COUNT = 10

_BINNING_ORACLE = f"""
WITH binned AS (
    SELECT doc_id, n_chars,
           CAST(NTILE({BIN_COUNT}) OVER (ORDER BY n_chars NULLS FIRST,
                                          doc_id)
                AS BIGINT) AS bin
    FROM documents
)
SELECT bin,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(MIN(n_chars) AS BIGINT) AS lo,
       CAST(MAX(n_chars) AS BIGINT) AS hi,
       CAST(MIN(doc_id) AS BIGINT) AS first_doc
FROM binned GROUP BY bin
"""


@query("feature_quantile_binning", oracle=_BINNING_ORACLE, tags=("quality",))
def feature_quantile_binning(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equal-frequency feature binning (decile buckets over document
    length) with EXACT NTILE semantics on the deterministic total order
    (value, id), computed WITHOUT a full-table single-partition window
    (r7: the global-window lint flagged the naive `NTILE OVER (ORDER BY
    ...)` form — it sorts every row on one partition) and WITHOUT a
    skewable per-value tie sort. The shared operator
    (operators/quality.py exact_ntile, also exercised by the edge-case
    tests) decomposes the same total order as: monotone-in-id tie
    buckets (so a dominant value splits across independent sorts),
    per-(value, bucket) counts, bounded post-aggregation offset
    windows, a null-safe broadcast join back, and NTILE's fill rule as
    rank arithmetic — bit-identical to the oracle's NTILE, including
    tie placement, at any scale."""
    from c3dc_etl_spark.operators.quality import exact_ntile

    docs = load(spark, sf_dir, "documents")
    binned = exact_ntile(docs, "n_chars", "doc_id", BIN_COUNT)
    return binned.groupBy("bin").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.min("n_chars").cast("bigint").alias("lo"),
        F.max("n_chars").cast("bigint").alias("hi"),
        F.min("doc_id").cast("bigint").alias("first_doc"),
    )


GINI_SCALE = 1_000_000

_GINI_ORACLE = f"""
WITH counts AS (
    SELECT 'lang' AS col, lang AS val, CAST(COUNT(*) AS BIGINT) AS n
    FROM documents GROUP BY lang
    UNION ALL
    SELECT 'source', source, CAST(COUNT(*) AS BIGINT)
    FROM documents GROUP BY source
)
SELECT col,
       CAST(COUNT(*) AS BIGINT) AS n_values,
       CAST(SUM(n) AS BIGINT) AS n_rows,
       CAST(((SUM(n) * SUM(n) - SUM(n * n)) * {GINI_SCALE})
            // (SUM(n) * SUM(n)) AS BIGINT) AS gini_x1e6
FROM counts GROUP BY col
"""


@query("column_gini_diversity", oracle=_GINI_ORACLE, tags=("quality",))
def column_gini_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Categorical-column diversity profiling via Gini impurity
    1 − Σp², computed WITHOUT floats: (N² − Σn²)·SCALE div N² is exact
    integer arithmetic end to end (the log-free counterpart of entropy
    — same ranking, no libm). Per column: one value-count aggregate
    (bounded by cardinality) folded to a single row — the profiling
    pass that tells a corpus curator whether a facet is degenerate
    (gini→0) or uniform (gini→1−1/k) before they stratify on it."""
    docs = load(spark, sf_dir, "documents")
    parts = []
    for col in ("lang", "source"):
        counts = docs.groupBy(F.col(col).alias("val")).agg(
            F.count(F.lit(1)).cast("bigint").alias("n")
        )
        parts.append(
            counts.groupBy().agg(
                F.lit(col).alias("col"),
                F.count(F.lit(1)).cast("bigint").alias("n_values"),
                F.sum("n").cast("bigint").alias("n_rows"),
                F.expr(
                    f"CAST(((sum(n) * sum(n) - sum(n * n)) * {GINI_SCALE})"
                    " div (sum(n) * sum(n)) AS BIGINT)"
                ).alias("gini_x1e6"),
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out.select("col", "n_values", "n_rows", "gini_x1e6")


K_ANON_THRESHOLD = 5

_KANON_ORACLE = f"""
WITH groups AS (
    SELECT c_nationkey, c_mktsegment, CAST(COUNT(*) AS BIGINT) AS n
    FROM customer GROUP BY 1, 2
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_groups,
       CAST(MIN(n) AS BIGINT) AS min_group_size,
       CAST(SUM(CASE WHEN n < {K_ANON_THRESHOLD} THEN 1 ELSE 0 END)
            AS BIGINT) AS violating_groups,
       CAST(SUM(CASE WHEN n < {K_ANON_THRESHOLD} THEN n ELSE 0 END)
            AS BIGINT) AS exposed_rows
FROM groups
"""


@query("k_anonymity_audit", oracle=_KANON_ORACLE, tags=("quality",))
def k_anonymity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-anonymity audit over a quasi-identifier combination
    (nation x market segment): group sizes below k identify
    re-identifiable rows BEFORE a dataset ships — the governance
    counterpart of the PII redaction op. One group-count aggregate
    folded to a single audit row (n_groups, min size, violating
    groups, exposed rows); at 100 TB the quasi-identifier groupBy is
    the only exchange and the audit row is driver-free."""
    cust = load(spark, sf_dir, "customer")
    groups = cust.groupBy("c_nationkey", "c_mktsegment").agg(
        F.count(F.lit(1)).cast("bigint").alias("n")
    )
    viol = F.when(F.col("n") < K_ANON_THRESHOLD, 1).otherwise(0)
    exposed = F.when(F.col("n") < K_ANON_THRESHOLD, F.col("n")).otherwise(0)
    return groups.groupBy().agg(
        F.count(F.lit(1)).cast("bigint").alias("n_groups"),
        F.min("n").cast("bigint").alias("min_group_size"),
        F.sum(viol).cast("bigint").alias("violating_groups"),
        F.sum(exposed).cast("bigint").alias("exposed_rows"),
    )


GAP_TOP_K = 20

_KEYGAP_ORACLE = f"""
WITH keys AS (SELECT DISTINCT o_orderkey AS k FROM orders
             WHERE o_orderstatus = 'F'),
gaps AS (
    SELECT k AS gap_after,
           LEAD(k) OVER (ORDER BY k) AS next_k
    FROM keys
)
SELECT CAST(gap_after AS BIGINT) AS gap_after,
       CAST(next_k AS BIGINT) AS next_key,
       CAST(next_k - gap_after - 1 AS BIGINT) AS n_missing
FROM gaps
WHERE next_k - gap_after > 1
ORDER BY n_missing DESC, gap_after
LIMIT {GAP_TOP_K}
"""


@query("key_sequence_gaps", oracle=_KEYGAP_ORACLE, tags=("quality",))
def key_sequence_gaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Key-continuity audit: the largest holes in a supposedly-dense
    surrogate-key sequence (missed ingests, dropped batches) via LEAD
    over the distinct key set — one window, no self-join on key+1. The
    global-order window is acceptable for an AUDIT over the key
    column alone (narrow rows); the 100 TB form range-partitions the
    keys and exchanges only each partition's boundary row — same
    result, one extra narrow shuffle. Top-k by gap size with a
    deterministic tie-break."""
    orders = load(spark, sf_dir, "orders")
    # the synthetic orderkey domain is dense, so the audit runs over ONE
    # STATUS PARTITION of it — the holes are where other statuses sit,
    # giving the gap detector real findings at every sf
    keys = (
        orders.filter(F.col("o_orderstatus") == "F")
        .select(F.col("o_orderkey").alias("k"))
        .distinct()
    )
    w = Window.orderBy("k")
    gaps = keys.select(
        F.col("k").alias("gap_after"),
        F.lead("k").over(w).alias("next_k"),
    ).filter(F.col("next_k") - F.col("gap_after") > 1)
    return (
        gaps.select(
            F.col("gap_after").cast("bigint"),
            F.col("next_k").cast("bigint").alias("next_key"),
            (F.col("next_k") - F.col("gap_after") - 1)
            .cast("bigint")
            .alias("n_missing"),
        )
        .orderBy(F.col("n_missing").desc(), F.col("gap_after"))
        .limit(GAP_TOP_K)
    )


_URL_CANON_ORACLE = """
WITH raw AS (
    SELECT doc_id,
           'HTTPS://' || UPPER(source) || '.Example.COM:443/docs/'
           || CAST(doc_id AS STRING)
           || '/?utm_source=feed&ref=' || lang || '&utm_campaign=x' AS url
    FROM documents
),
canon AS (
    SELECT doc_id,
           REGEXP_REPLACE(
             REGEXP_REPLACE(
               REGEXP_REPLACE(
                 REGEXP_REPLACE(
                   REGEXP_REPLACE(LOWER(url), '^https://', ''),
                   ':443/', '/'),
                 '[?&]utm_[a-z]+=[^&]*', '', 'g'),
               '/\\?', '?'),
             '\\?$', '') AS curl
    FROM raw
)
SELECT curl,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(MIN(doc_id) AS BIGINT) AS keeper
FROM canon GROUP BY curl
"""


@query("url_canonicalize_dedup", oracle=_URL_CANON_ORACLE, tags=("quality",))
def url_canonicalize_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL canonicalization + dedup — the crawl-corpus hygiene step
    (C4/CCNet-style): lowercase, strip the scheme and the https default
    port, drop utm_* tracking params (keeping the rest of the query
    string), normalize the dangling separator, then dedup on the
    canonical form with a deterministic min-id keeper. URLs are
    synthesized from (source, doc_id, lang) so the derivation is shared
    with the oracle; the regex chain sticks to RE2-safe patterns
    (character classes only — no lookaround) so Java and RE2 agree,
    which is itself the conformance point for cross-engine regex
    pipelines. Narrow codegen projection + one aggregate: no UDFs, one
    exchange."""
    docs = load(spark, sf_dir, "documents")
    raw = docs.select(
        "doc_id",
        F.concat(
            F.lit("HTTPS://"),
            F.upper(F.col("source")),
            F.lit(".Example.COM:443/docs/"),
            F.col("doc_id").cast("string"),
            F.lit("/?utm_source=feed&ref="),
            F.col("lang"),
            F.lit("&utm_campaign=x"),
        ).alias("url"),
    )
    curl = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(
                F.regexp_replace(
                    F.regexp_replace(F.lower(F.col("url")), r"^https://", ""),
                    r":443/",
                    "/",
                ),
                r"[?&]utm_[a-z]+=[^&]*",
                "",
            ),
            r"/\?",
            "?",
        ),
        r"\?$",
        "",
    )
    return (
        raw.select("doc_id", curl.alias("curl"))
        .groupBy("curl")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.min("doc_id").alias("keeper"),
        )
    )


_DP_EPS = 0.5  # Laplace scale b = 1/eps = 2.0 for a count query (sensitivity 1)

_DP_ORACLE = f"""
WITH counts AS (
    SELECT n.n_name, CAST(COUNT(*) AS BIGINT) AS true_n
    FROM orders o
    JOIN customer c ON c.c_custkey = o.o_custkey
    JOIN nation n ON n.n_nationkey = c.c_nationkey
    GROUP BY n.n_name
),
u AS (
    SELECT n_name, true_n,
           (CAST(CONCAT('0x', SUBSTR(MD5('dp:' || n_name), 1, 8)) AS BIGINT)
            + 1) / 4294967296.0 AS uni
    FROM counts
)
SELECT n_name, true_n,
       ROUND(CASE WHEN uni < 0.5
                  THEN ({1 / _DP_EPS}) * LN(2.0 * uni)
                  ELSE -({1 / _DP_EPS}) * LN(2.0 * (1.0 - uni)) END,
             6) + 0.0 AS noise,
       ROUND(true_n + ROUND(CASE WHEN uni < 0.5
                  THEN ({1 / _DP_EPS}) * LN(2.0 * uni)
                  ELSE -({1 / _DP_EPS}) * LN(2.0 * (1.0 - uni)) END,
             6), 6) + 0.0 AS noisy_n
FROM u
"""


@query("dp_noisy_release", oracle=_DP_ORACLE, tags=("quality", "privacy"))
def dp_noisy_release(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Differential-privacy release shape: per-nation order counts plus
    Laplace(1/eps) noise via inverse-CDF sampling — the epsilon=0.5
    count release a governance pipeline runs before sharing aggregates.
    The uniform comes from the suite's md5 fold of the GROUP KEY, which
    makes the release deterministic and cross-engine testable (a
    PRODUCTION release must draw fresh secure randomness — a key-seeded
    noise draw is replayable and leaks; this query pins the release
    ARITHMETIC, not an RNG). Noise is ROUND(6dp)-pinned on both engines
    before the add, the weighted-reservoir ln() discipline — the one
    place a libm/JVM last-ulp could diverge."""
    counts = (
        load(spark, sf_dir, "orders")
        .join(
            load(spark, sf_dir, "customer"),
            F.col("c_custkey") == F.col("o_custkey"),
        )
        .join(
            F.broadcast(load(spark, sf_dir, "nation")),
            F.col("n_nationkey") == F.col("c_nationkey"),
        )
        .groupBy("n_name")
        .agg(F.count(F.lit(1)).alias("true_n"))
    )
    uni = (
        F.conv(
            F.substring(F.md5(F.concat(F.lit("dp:"), F.col("n_name"))), 1, 8),
            16,
            10,
        ).cast("long")
        + F.lit(1)
    ) / F.lit(4294967296.0)
    b = F.lit(1.0 / _DP_EPS)
    noise = F.round(
        F.when(uni < 0.5, b * F.log(2.0 * uni)).otherwise(
            -b * F.log(2.0 * (1.0 - uni))
        ),
        6,
    )
    return counts.select(
        "n_name",
        "true_n",
        (noise + F.lit(0.0)).alias("noise"),
        (F.round(F.col("true_n") + noise, 6) + F.lit(0.0)).alias("noisy_n"),
    )


_ZSCORE_ORACLE = """
WITH s AS (
    SELECT lang,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(CAST(n_chars AS HUGEINT)) AS BIGINT) AS sx,
           CAST(SUM(CAST(n_chars AS HUGEINT) * n_chars) AS BIGINT) AS sxx
    FROM documents GROUP BY lang
)
SELECT d.doc_id, d.lang, CAST(d.n_chars AS BIGINT) AS n_chars,
       ROUND((CAST(d.n_chars AS DOUBLE) * s.n - s.sx)
             / SQRT(CAST(s.n AS DOUBLE) * s.sxx - CAST(s.sx AS DOUBLE) * s.sx),
             6) + 0.0 AS z
FROM documents d JOIN s USING (lang)
"""


@query(
    "feature_standardize_zscore",
    oracle=_ZSCORE_ORACLE,
    tags=("quality", "ml"),
)
def feature_standardize_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Group-wise z-score standardization — the feature-scaling pass
    before any distance-based ML: z = (x - mean) / std per language,
    computed from EXACT integer moment sums (n, sum x, sum x^2 — one
    partial-aggregable pass, broadcast back), algebraically rearranged
    to (x*n - sx) / sqrt(n*sxx - sx^2) so the only floats are one
    subtraction, one sqrt, one division on integer-exact operands —
    then 6dp-rounded. Never a per-group stddev window over raw rows,
    never engine-native STDDEV (its internal accumulation order is not
    engine-portable; the moment identity is)."""
    docs = load(spark, sf_dir, "documents")
    s = docs.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("n_chars").cast("bigint")).alias("sx"),
        F.sum(
            F.col("n_chars").cast("bigint") * F.col("n_chars").cast("bigint")
        ).alias("sxx"),
    )
    j = docs.join(F.broadcast(s), "lang")
    z = F.round(
        (F.col("n_chars").cast("double") * F.col("n") - F.col("sx"))
        / F.sqrt(
            F.col("n").cast("double") * F.col("sxx")
            - F.col("sx").cast("double") * F.col("sx")
        ),
        6,
    )
    return j.select(
        "doc_id",
        "lang",
        F.col("n_chars").cast("bigint").alias("n_chars"),
        (z + F.lit(0.0)).alias("z"),
    )

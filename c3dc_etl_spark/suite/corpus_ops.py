"""End-to-end corpus-build composition: quality filter -> exact dedup
-> stratified sample, as ONE declarative plan. Demonstrates that the
training-data operators compose without materialization barriers —
Catalyst fuses the quality expressions, the dedup window, and the
sampling filter into a single pipeline (the sampling filter even
applies before the dedup shuffle where legal).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from c3dc_etl_spark.operators import sampling as SA
from c3dc_etl_spark.operators import text as T
from c3dc_etl_spark.operators.dedup import content_digest
from c3dc_etl_spark.suite.registry import load, query
from c3dc_etl_spark.suite.text_ops import _sql_count_occ

QUALITY_MIN = 0.5
SAMPLE_FRACS = {"en": 0.6, "zh": 0.9}
SAMPLE_DEFAULT = 0.8
SEED = "corpus"

_STOP_SUM = " + ".join(_sql_count_occ(w) for w in T.STOPWORDS_EN)

# quality_score mirror (operators/text.py quality_score): identical
# expression order so the IEEE arithmetic is bit-identical
_SCORE = """
ROUND(
    LEAST(stopword_ratio * 2, 1.0) * 0.4
    + (CASE WHEN mean_token_len >= 3 AND mean_token_len <= 12
            THEN 1.0 ELSE 0.0 END) * 0.3
    + LEAST(alpha_ratio * 1.25, 1.0) * 0.3, 4)
"""

_FRAC_CASE = (
    "(CASE "
    + " ".join(f"WHEN lang = '{v}' THEN {f!r}" for v, f in sorted(SAMPLE_FRACS.items()))
    + f" ELSE {SAMPLE_DEFAULT!r} END)"
)

# DuckDB mirror of operators.dedup.hash32 scaled to [0,1) — same value
# as Spark's CONV(SUBSTR(md5,1,8),16,10) / 2^32.
_FOLD_U = "CAST(CONCAT('0x', SUBSTR(h, 1, 8)) AS BIGINT) / 4294967296.0"

_CORPUS_ORACLE = f"""
WITH feat AS (
    SELECT doc_id, lang, text,
           CAST(LENGTH(text) AS BIGINT) AS n_chars,
           CASE WHEN TRIM(text) = '' THEN 0
                ELSE CAST(LEN(REGEXP_SPLIT_TO_ARRAY(TRIM(text), '\\s+')) AS BIGINT)
           END AS n_tokens,
           CAST(LENGTH(REGEXP_REPLACE(text, '[^a-zA-Z]', '', 'g')) AS BIGINT) AS n_alpha,
           {_STOP_SUM} AS stop_hits
    FROM documents
),
scored AS (
    SELECT doc_id, lang, text, {_SCORE.strip()} AS score
    FROM (
        SELECT doc_id, lang, text,
               CAST(n_chars AS DOUBLE) / GREATEST(n_tokens, 1) AS mean_token_len,
               CAST(n_alpha AS DOUBLE) / GREATEST(n_chars, 1) AS alpha_ratio,
               CAST(stop_hits AS DOUBLE) / GREATEST(n_tokens, 1) AS stopword_ratio
        FROM feat
    )
),
filtered AS (
    SELECT doc_id, lang, score FROM scored
    WHERE score >= {QUALITY_MIN}
    QUALIFY ROW_NUMBER() OVER (
        PARTITION BY MD5(LOWER(REGEXP_REPLACE(TRIM(text), '\\s+', ' ', 'g')))
        ORDER BY doc_id ASC
    ) = 1
),
keyed AS (
    SELECT doc_id, lang, score,
           MD5('{SEED}:' || CAST(doc_id AS STRING)) AS h
    FROM filtered
)
SELECT doc_id, lang,
       CAST(FLOOR(score * 10000 + 0.5) AS BIGINT) AS quality_x1e4
FROM keyed
WHERE {_FOLD_U} < {_FRAC_CASE}
"""


@query("corpus_build_pipeline", oracle=_CORPUS_ORACLE, tags=("text", "sampling"))
def corpus_build_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The canonical corpus pass as one plan: Gopher-style quality
    filter -> exact-content dedup (first-wins window over the
    normalized digest) -> per-language stratified hash sample. One
    shuffle total (the dedup window); scoring and sampling are narrow
    codegen expressions fused around it."""
    docs = load(spark, sf_dir, "documents")
    scored = docs.select(
        "doc_id", "lang", "text", T.quality_score("text").alias("score")
    ).filter(F.col("score") >= QUALITY_MIN)
    w = Window.partitionBy(content_digest("text")).orderBy(F.col("doc_id").asc())
    deduped = (
        scored.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn", "text")
    )
    sampled = SA.stratified_hash_sample(
        deduped, "doc_id", "lang", SAMPLE_FRACS, default=SAMPLE_DEFAULT, seed=SEED
    )
    return sampled.select(
        "doc_id",
        "lang",
        F.floor(F.col("score") * 10000 + F.lit(0.5)).cast("bigint").alias("quality_x1e4"),
    )


_PROFILE_COLS = ("doc_id", "text", "lang", "source", "n_chars")

_PROFILE_ORACLE = "\nUNION ALL\n".join(
    f"""SELECT '{c}' AS col_name,
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(COUNT({c}) AS BIGINT) AS n_non_null,
       CAST(COUNT(DISTINCT {c}) AS BIGINT) AS n_distinct,
       CAST(MIN({c}) AS STRING) AS min_value,
       CAST(MAX({c}) AS STRING) AS max_value
FROM documents"""
    for c in _PROFILE_COLS
)


@query("profile_documents", oracle=_PROFILE_ORACLE, tags=("corpus",))
def profile_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Table profiling in ONE aggregation job: every column's
    row/null/distinct counts and min/max ride a single df.agg() (exact
    distincts -> one grouping-expand shuffle) and the 1-row result
    explodes to one row per column in-plan — no driver collect, no
    per-column job fan-out. The operator's approx=True flag swaps exact
    distincts for HyperLogLog++ (the 100 TB path); the oracle pins the
    exact path. This is the pre-flight stats pass (skew scouting,
    null-rate sanity, join-key cardinality) of a large pipeline."""
    from c3dc_etl_spark.operators.profiling import profile_table

    docs = load(spark, sf_dir, "documents")
    return profile_table(docs, list(_PROFILE_COLS), approx=False)


_PSI_MOD = 5       # doc_id % 5 == 0 -> "new snapshot" slice
_PSI_BUCKETS = 10  # fixed length-bucket domain: floor(n_chars/200) capped
_PSI_WIDTH = 200
_PSI_SMOOTH = 0.5  # add-k smoothing so empty buckets stay finite

_PSI_ORACLE = f"""
WITH b AS (SELECT t.i AS bucket FROM GENERATE_SERIES(0, {_PSI_BUCKETS - 1}) t(i)),
base AS (
    SELECT LEAST(n_chars // {_PSI_WIDTH}, {_PSI_BUCKETS - 1}) AS bucket,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM documents WHERE doc_id % {_PSI_MOD} <> 0 GROUP BY 1
),
delta AS (
    SELECT LEAST(n_chars // {_PSI_WIDTH}, {_PSI_BUCKETS - 1}) AS bucket,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM documents WHERE doc_id % {_PSI_MOD} = 0 GROUP BY 1
),
tot AS (
    SELECT (SELECT CAST(SUM(n) AS DOUBLE) FROM base) AS nb,
           (SELECT CAST(SUM(n) AS DOUBLE) FROM delta) AS nd
)
SELECT CAST(b.bucket AS BIGINT) AS bucket,
       COALESCE(base.n, 0) AS n_base,
       COALESCE(delta.n, 0) AS n_delta,
       ROUND(
           ((COALESCE(base.n, 0) + {_PSI_SMOOTH})
                / (tot.nb + {_PSI_SMOOTH * _PSI_BUCKETS})
            - (COALESCE(delta.n, 0) + {_PSI_SMOOTH})
                / (tot.nd + {_PSI_SMOOTH * _PSI_BUCKETS}))
           * LN(((COALESCE(base.n, 0) + {_PSI_SMOOTH})
                / (tot.nb + {_PSI_SMOOTH * _PSI_BUCKETS}))
               / ((COALESCE(delta.n, 0) + {_PSI_SMOOTH})
                / (tot.nd + {_PSI_SMOOTH * _PSI_BUCKETS}))), 6) + 0.0
           AS psi_contrib
FROM b LEFT JOIN base ON base.bucket = b.bucket
       LEFT JOIN delta ON delta.bucket = b.bucket
       CROSS JOIN tot
"""


@query("corpus_drift_psi", oracle=_PSI_ORACLE, tags=("corpus",))
def corpus_drift_psi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution-drift detection between corpus snapshots: the
    population stability index over a FIXED length-bucket domain (base
    slice vs the 20% 'new snapshot' slice), with add-k smoothing so an
    empty bucket contributes a finite term. Per-bucket contributions
    are emitted (their sum is the PSI; >0.25 conventionally flags a
    shift worth investigating) — the pre-training drift gate that
    catches a crawler or filter regression before it trains in. Two
    bucket-keyed partial aggs + two scalar totals; the bucket domain is
    a 10-row literal frame."""
    docs = load(spark, sf_dir, "documents")
    bucket = F.least(
        F.floor(F.col("n_chars") / _PSI_WIDTH), F.lit(_PSI_BUCKETS - 1)
    ).cast("bigint")
    base = (
        docs.filter(F.col("doc_id") % _PSI_MOD != 0)
        .select(bucket.alias("bucket"))
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("n_base"))
    )
    delta = (
        docs.filter(F.col("doc_id") % _PSI_MOD == 0)
        .select(bucket.alias("bucket"))
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("n_delta"))
    )
    nb = float(docs.filter(F.col("doc_id") % _PSI_MOD != 0).count())
    nd = float(docs.filter(F.col("doc_id") % _PSI_MOD == 0).count())
    dom = spark.range(_PSI_BUCKETS).select(F.col("id").cast("bigint").alias("bucket"))
    sm = _PSI_SMOOTH
    smtot = _PSI_SMOOTH * _PSI_BUCKETS
    joined = (
        dom.join(base, "bucket", "left")
        .join(delta, "bucket", "left")
        .select(
            "bucket",
            F.coalesce(F.col("n_base"), F.lit(0)).cast("bigint").alias("n_base"),
            F.coalesce(F.col("n_delta"), F.lit(0)).cast("bigint").alias("n_delta"),
        )
    )
    p = (F.col("n_base") + F.lit(sm)) / F.lit(nb + smtot)
    q = (F.col("n_delta") + F.lit(sm)) / F.lit(nd + smtot)
    return joined.select(
        "bucket",
        "n_base",
        "n_delta",
        (F.round((p - q) * F.log(p / q), 6) + F.lit(0.0)).alias("psi_contrib"),
    )

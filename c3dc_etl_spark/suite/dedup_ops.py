"""Deduplication suite queries over the documents table, backed by
c3dc_etl_spark.operators.dedup. Oracle SQL is generated from the same
constants (shingle size, hash seeds, band layout) as the Spark side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from c3dc_etl_spark.operators import dedup as D
from c3dc_etl_spark.suite.registry import load, query

SHINGLE_K = 12
NUM_HASHES = 16
BANDS = 4
ROWS_PER_BAND = NUM_HASHES // BANDS

_NORM = "LOWER(REGEXP_REPLACE(TRIM(text), '\\s+', ' ', 'g'))"
_SHINGLES = (
    f"LIST_DISTINCT(LIST_TRANSFORM("
    f"GENERATE_SERIES(1, GREATEST(LENGTH({_NORM}) - {SHINGLE_K - 1}, 1)),"
    f" i -> SUBSTR({_NORM}, i, {SHINGLE_K})))"
)


@query(
    "dedup_exact",
    oracle=f"""
    SELECT MD5({_NORM}) AS content_hash,
           CAST(MIN(doc_id) AS BIGINT) AS keep_id,
           CAST(COUNT(*) AS BIGINT) AS group_size
    FROM documents
    GROUP BY 1
    """,
    tags=("dedup",),
)
def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact deduplication: hash-groupBy on the normalized content
    digest, min-id representative. One shuffle; map-side combine means
    per-reducer traffic is one row per distinct document."""
    docs = load(spark, sf_dir, "documents")
    return D.exact_dedup(docs, "text", "doc_id")


def _sig_sql() -> str:
    mins = ",\n           ".join(
        f"LIST_AGGREGATE(LIST_TRANSFORM(sh, s -> MD5('mh{j}:' || s)), 'min')"
        for j in range(NUM_HASHES)
    )
    return f"[{mins}]"


def _bands_sql() -> str:
    parts = []
    for b in range(BANDS):
        elems = " || '|' || ".join(
            f"sig[{b * ROWS_PER_BAND + r + 1}]" for r in range(ROWS_PER_BAND)
        )
        parts.append(f"MD5({elems})")
    return "[" + ", ".join(parts) + "]"


_MINHASH_ORACLE = f"""
WITH docs AS (
    SELECT doc_id, {_SHINGLES} AS sh FROM documents
),
sigs AS (
    SELECT doc_id, {_sig_sql()} AS sig FROM docs
),
banded AS (
    SELECT doc_id, sig, UNNEST({_bands_sql()}) AS band FROM sigs
),
pairs AS (
    SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
    FROM banded a JOIN banded b ON a.band = b.band AND a.doc_id < b.doc_id
)
SELECT p.id_a, p.id_b,
       ROUND(CAST(LEN(LIST_FILTER(GENERATE_SERIES(1, {NUM_HASHES}),
                                  i -> sa.sig[i] = sb.sig[i])) AS DOUBLE)
             / {NUM_HASHES}.0, 4) AS est_jaccard
FROM pairs p
JOIN sigs sa ON sa.doc_id = p.id_a
JOIN sigs sb ON sb.doc_id = p.id_b
"""


@query("dedup_minhash_lsh", oracle=_MINHASH_ORACLE, tags=("dedup",))
def dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash + LSH near-duplicate candidates: char-shingle -> 16-hash
    minhash signature -> 4 bands -> bucket self-join -> estimated
    Jaccard. Candidate generation is O(collisions), not O(n^2)."""
    docs = load(spark, sf_dir, "documents")
    return D.minhash_lsh_candidates(
        docs, "text", "doc_id", shingle_k=SHINGLE_K, num_hashes=NUM_HASHES, bands=BANDS
    )


_JACCARD_ORACLE = f"""
WITH docs AS (
    SELECT doc_id, {_SHINGLES} AS sh FROM documents
),
buckets AS (
    SELECT doc_id, sh, UNNEST([
        LIST_AGGREGATE(LIST_TRANSFORM(sh, s -> MD5('jb0:' || s)), 'min'),
        LIST_AGGREGATE(LIST_TRANSFORM(sh, s -> MD5('jb1:' || s)), 'min')
    ]) AS bucket
    FROM docs
),
pairs AS (
    SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
    FROM buckets a JOIN buckets b ON a.bucket = b.bucket AND a.doc_id < b.doc_id
)
SELECT p.id_a, p.id_b,
       ROUND(CAST(LEN(LIST_INTERSECT(sa.sh, sb.sh)) AS DOUBLE)
             / CAST(LEN(LIST_DISTINCT(LIST_CONCAT(sa.sh, sb.sh))) AS DOUBLE), 4) AS jaccard
FROM pairs p
JOIN docs sa ON sa.doc_id = p.id_a
JOIN docs sb ON sb.doc_id = p.id_b
"""


@query("dedup_ngram_jaccard", oracle=_JACCARD_ORACLE, tags=("dedup",))
def dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact n-gram Jaccard similarity over min-hash-bucketed candidate
    pairs (inverted-index join, then |A∩B|/|A∪B| via array ops)."""
    docs = load(spark, sf_dir, "documents")
    return D.ngram_jaccard_pairs(docs, "text", "doc_id", shingle_k=SHINGLE_K)


_SIMHASH_ORACLE = """
WITH toks AS (
    SELECT doc_id, UNNEST(REGEXP_SPLIT_TO_ARRAY(LOWER(TRIM(text)), '\\s+')) AS tok
    FROM documents
),
votes AS (
    SELECT doc_id, plane,
           SUM(CASE WHEN SUBSTR(MD5('sh:' || plane || ':' || tok), 1, 1) < '8'
                    THEN 1 ELSE -1 END) AS s
    FROM toks, (SELECT UNNEST(GENERATE_SERIES(0, 15)) AS plane)
    GROUP BY doc_id, plane
)
SELECT doc_id AS doc,
       CAST(SUM(CASE WHEN s >= 0 THEN 1::BIGINT << plane ELSE 0 END) AS BIGINT) AS simhash
FROM votes
GROUP BY doc_id
"""


@query("dedup_simhash", oracle=_SIMHASH_ORACLE, tags=("dedup",))
def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash fingerprints (16 md5-simulated hyperplanes): token votes
    aggregated per plane, sign bits packed into a bigint. Two-level
    aggregation, all codegen."""
    docs = load(spark, sf_dir, "documents")
    return D.simhash(docs, "text", "doc_id", bits=16)

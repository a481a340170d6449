"""Sampling / mixture suite queries over the documents table, backed by
c3dc_etl_spark.operators.sampling. The md5-fold hash and the threshold
arithmetic are mirrored exactly in the DuckDB oracles, so the kept row
sets are bit-identical across engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from c3dc_etl_spark.operators import sampling as SA
from c3dc_etl_spark.operators.sampling import token_budget_subset
from c3dc_etl_spark.suite.registry import load, query

SEED = "hs"

# Per-stratum keep fractions (rebalancing a language mix) and mixture
# weights (epoch-style oversampling). Constants are shared by the Spark
# plan and the generated oracle SQL.
FRACTIONS = {"en": 0.5, "de": 1.0, "fr": 0.25, "es": 0.1}
WEIGHTS = {"zh": 2.5, "en": 0.3}


def _fold_h(h: str) -> str:
    """DuckDB mirror of operators.dedup.hash32 over an md5-hex column
    (Spark: CONV(SUBSTR(md5, 1, 8), 16, 10) — same value)."""
    return f"CAST(CONCAT('0x', SUBSTR({h}, 1, 8)) AS BIGINT)"


def _frac_case(mapping: dict[str, float], default: float) -> str:
    arms = " ".join(
        f"WHEN lang = '{v}' THEN {f!r}" for v, f in sorted(mapping.items())
    )
    return f"(CASE {arms} ELSE {default!r} END)"


_U = f"({_fold_h('h')}) / 4294967296.0"

_STRAT_ORACLE = f"""
WITH k AS (
    SELECT doc_id, lang, source,
           MD5('{SEED}:' || CAST(doc_id AS STRING)) AS h
    FROM documents
)
SELECT doc_id, lang, source
FROM k
WHERE {_U} < {_frac_case(FRACTIONS, 0.0)}
"""


@query("sample_stratified_hash", oracle=_STRAT_ORACLE, tags=("sampling",))
def sample_stratified_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic per-stratum sampling: keep-fraction by language via
    a key-hash threshold — a narrow codegen filter (no shuffle, no RNG),
    so the kept set is identical on any partitioning or engine. Strata
    not listed get fraction 0 (zh is dropped)."""
    docs = load(spark, sf_dir, "documents")
    return SA.stratified_hash_sample(
        docs, "doc_id", "lang", FRACTIONS, default=0.0, seed=SEED
    ).select("doc_id", "lang", "source")


_MIX_ORACLE = f"""
WITH k AS (
    SELECT doc_id, lang,
           {_frac_case(WEIGHTS, 1.0)} AS w,
           MD5('{SEED}:' || CAST(doc_id AS STRING)) AS h
    FROM documents
),
n AS (
    SELECT doc_id, lang,
           CAST(FLOOR(w) AS BIGINT)
           + (CASE WHEN {_U} < w - FLOOR(w) THEN 1 ELSE 0 END) AS n_copies
    FROM k
)
SELECT doc_id, lang, UNNEST(RANGE(0, n_copies)) AS copy_num
FROM n
WHERE n_copies > 0
"""


@query("sample_weighted_mixture", oracle=_MIX_ORACLE, tags=("sampling",))
def sample_weighted_mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mixture construction with weights on both sides of 1.0: zh is
    oversampled 2.5x (2 copies + a deterministic 50% third), en kept at
    0.3, everything else passes through once. copies = floor(w) +
    (hash-uniform < frac(w)), emitted via explode(sequence(...)) —
    JVM-side, narrow, reproducible."""
    docs = load(spark, sf_dir, "documents")
    return SA.weighted_mixture(
        docs, "doc_id", "lang", WEIGHTS, default=1.0, seed=SEED
    ).select("doc_id", "lang", "copy_num")


_CAP = 20

_DOMAIN_CAP_ORACLE = f"""
WITH keyed AS (
    SELECT doc_id, source,
           MD5(CONCAT_WS(CHR(31), 'dc', CAST(doc_id AS VARCHAR))) AS rk
    FROM documents
),
ranked AS (
    SELECT doc_id, source,
           ROW_NUMBER() OVER (PARTITION BY source ORDER BY rk, doc_id) AS rn
    FROM keyed
)
SELECT doc_id, source FROM ranked WHERE rn <= {_CAP}
"""


@query("sample_domain_cap", oracle=_DOMAIN_CAP_ORACLE, tags=("sampling",))
def sample_domain_cap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-domain cap through operators.sampling.domain_cap_sample: at
    most N docs survive per source, selected by deterministic hash
    order (reproducible uniform subsample, independent of
    partitioning) — the domain-dominance guard of corpus mixing. The
    Spark side runs the salted two-phase ranking; the oracle is the
    plain one-window statement of the same selection."""
    docs = load(spark, sf_dir, "documents").select("doc_id", "source")
    return SA.domain_cap_sample(
        docs, domain_col="source", id_col="doc_id", cap=_CAP, seed="dc"
    )


TOKEN_BUDGET = 20_000
TB_SEED = "tb"

_TOKEN_BUDGET_ORACLE = f"""
WITH counted AS (
    SELECT doc_id,
           MD5('{TB_SEED}:' || CAST(doc_id AS VARCHAR)) AS rk,
           CASE WHEN TRIM(text) = '' THEN 0
                ELSE CAST(LEN(REGEXP_SPLIT_TO_ARRAY(TRIM(text), '\\s+')) AS BIGINT)
           END AS n_tokens
    FROM documents
),
cum AS (
    SELECT doc_id, n_tokens,
           CAST(SUM(n_tokens) OVER (ORDER BY rk ASC
                ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_tokens
    FROM counted
)
SELECT doc_id, n_tokens, cum_tokens
FROM cum WHERE cum_tokens <= {TOKEN_BUDGET}
"""


@query("sample_token_budget", oracle=_TOKEN_BUDGET_ORACLE, tags=("sampling",))
def sample_token_budget(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-budget corpus subsetting ("give me 20k tokens of this
    corpus"): documents ordered by an md5 hash of their id — an
    unbiased, reproducible shuffle — and kept while the running token
    total stays within budget. The global ordered cumulative sum runs
    WITHOUT a global sort: range-repartition on the hash key, windowed
    running sums within each range partition, plus broadcast per-
    partition offsets (operators.sampling.token_budget_subset — the
    two-phase scheme shared with the row-numbering operator). The
    oracle restates it as a plain windowed SUM over the same hash
    order; md5 hex strings compare identically in both engines."""
    docs = load(spark, sf_dir, "documents")
    return token_budget_subset(
        docs,
        text_col="text",
        id_col="doc_id",
        budget_tokens=TOKEN_BUDGET,
        seed=TB_SEED,
    )


SPLITS = {"train": 0.8, "val": 0.1, "test": 0.1}
SPLIT_SEED = "sp"

# cumulative bounds in insertion order; repr'd floats are embedded
# identically in the Spark plan and the SQL, so the comparisons are
# bit-identical
_SPLIT_B1 = repr(0.8)
_SPLIT_B2 = repr(0.8 + 0.1)

_SPLIT_ORACLE = f"""
WITH k AS (
    SELECT doc_id, lang,
           ({_fold_h(f"MD5('{SPLIT_SEED}:' || CAST(doc_id AS STRING))")})
               / 4294967296.0 AS u
    FROM documents
)
SELECT doc_id, lang,
       CASE WHEN u < {_SPLIT_B1} THEN 'train'
            WHEN u < {_SPLIT_B2} THEN 'val'
            ELSE 'test' END AS split
FROM k
"""


@query("sample_split_assign", oracle=_SPLIT_ORACLE, tags=("sampling",))
def sample_split_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic train/val/test assignment: each document's split
    comes from a hash-uniform draw against cumulative fraction bands —
    a pure narrow projection (no shuffle, no RNG), stable under any
    partitioning and consistent for every table keyed by the same id,
    so features and labels can never straddle a leak boundary. The
    oracle recomputes the same bands from the same md5 arithmetic."""
    docs = load(spark, sf_dir, "documents")
    return SA.split_assign(
        docs, id_col="doc_id", splits=SPLITS, seed=SPLIT_SEED
    ).select("doc_id", "lang", "split")


# ---------------------------------------------------------------------------
# Leakage-safe splits: near-duplicate CLUSTERS never straddle a split
# ---------------------------------------------------------------------------

from c3dc_etl_spark.suite import dedup_ops as _DD  # noqa: E402  (one-way)

_LEAKSAFE_ORACLE = f"""
WITH RECURSIVE {_DD._MINHASH_PAIR_CTES},
sym AS (
    SELECT id_a AS u, id_b AS v FROM pairs
    UNION
    SELECT id_b AS u, id_a AS v FROM pairs
),
comp AS (
    SELECT doc_id AS u, doc_id AS r FROM documents
    UNION
    SELECT s.u, c.r FROM sym s JOIN comp c ON c.u = s.v
),
rep AS (SELECT u AS doc_id, MIN(r) AS component FROM comp GROUP BY u),
k AS (
    SELECT doc_id, component,
           ({_fold_h(f"MD5('{{seed}}:' || CAST(component AS STRING))")})
               / 4294967296.0 AS u
    FROM rep
)
SELECT doc_id, component,
       CASE WHEN u < {{b1}} THEN 'train'
            WHEN u < {{b2}} THEN 'val'
            ELSE 'test' END AS split
FROM k
"""


@query(
    "sample_split_leakage_safe",
    oracle=_LEAKSAFE_ORACLE.format(seed=SPLIT_SEED, b1=_SPLIT_B1, b2=_SPLIT_B2),
    tags=("sampling", "dedup"),
)
def sample_split_leakage_safe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leakage-safe train/val/test assignment: MinHash+LSH candidate
    pairs -> connected components (the same transitive closure corpus
    dedup uses) -> the split draw is keyed by the COMPONENT
    representative, not the document id, so a near-duplicate of a test
    document can never land in train — the contamination mode a plain
    per-doc hash split cannot prevent. Everything downstream of pair
    generation is bounded: components converge in O(log n) pointer-
    jumping rounds, and the final assignment is a narrow hash
    projection."""
    from c3dc_etl_spark.operators import dedup as D
    from c3dc_etl_spark.operators.graph import dedup_assignment

    docs = load(spark, sf_dir, "documents")
    pairs = D.minhash_lsh_candidates(
        docs,
        "text",
        "doc_id",
        shingle_k=_DD.SHINGLE_K,
        num_hashes=_DD.NUM_HASHES,
        bands=_DD.BANDS,
        max_bucket_size=_DD.MAX_BUCKET,
    )
    assign = dedup_assignment(docs, pairs, node_col="doc_id").select(
        "doc_id", "component"
    )
    return SA.split_assign(
        assign, id_col="component", splits=SPLITS, seed=SPLIT_SEED
    ).select("doc_id", "component", "split")


# ---------------------------------------------------------------------------
# Weighted reservoir sampling (Efraimidis-Spirakis exponential keys)
# ---------------------------------------------------------------------------

RES_K = 50
RES_SEED = "wr"
RES_WEIGHTS = {"en": 3.0, "de": 2.0, "fr": 1.0, "es": 0.5, "zh": 0.25}

_RES_W_CASE = (
    "(CASE "
    + " ".join(f"WHEN lang = '{v}' THEN {w!r}" for v, w in sorted(RES_WEIGHTS.items()))
    + " ELSE 1.0 END)"
)

# u in (0, 1]: (fold + 1) / 2^32 — u = 0 would need LN(0), where Spark's
# non-ANSI log() yields NULL while DuckDB yields -inf
_RES_ORACLE = f"""
WITH k AS (
    SELECT doc_id, lang,
           ({_fold_h(f"MD5('{RES_SEED}:' || CAST(doc_id AS STRING))")} + 1)
               / 4294967296.0 AS u,
           {_RES_W_CASE} AS w
    FROM documents
),
scored AS (
    SELECT doc_id, lang, ROUND(-LN(u) / w, 6) + 0.0 AS es_key FROM k
)
SELECT doc_id, lang, es_key, CAST(rank AS BIGINT) AS rank
FROM (
    SELECT *, ROW_NUMBER() OVER (ORDER BY es_key ASC, doc_id ASC) AS rank
    FROM scored
)
WHERE rank <= {RES_K}
"""


@query("sample_weighted_reservoir", oracle=_RES_ORACLE, tags=("sampling",))
def sample_weighted_reservoir(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted sampling WITHOUT replacement (Efraimidis-Spirakis): each
    row draws a deterministic exponential key -ln(u)/w from its hash
    uniform and per-language weight; the k smallest keys are the sample
    — inclusion probability proportional to weight, no RNG, stable
    under any partitioning. The global top-k goes through the
    reducer-bounded salted two-phase (no full sort, no single-reducer
    rank); keys are ranked ROUNDED (6dp) so a libm/JVM ln() last-ulp
    difference cannot flip a near-tie."""
    from pyspark.sql import functions as F

    from c3dc_etl_spark.operators.skew import salted_topk

    docs = load(spark, sf_dir, "documents")
    w = F.lit(1.0)
    for lang, wt in sorted(RES_WEIGHTS.items(), reverse=True):
        w = F.when(F.col("lang") == lang, F.lit(wt)).otherwise(w)
    # (fold + 1) / 2^32: reproduce hash_uniform's fold with the +1 shift
    u = (
        F.conv(F.substring(F.md5(F.concat(F.lit(RES_SEED + ":"), F.col("doc_id").cast("string"))), 1, 8), 16, 10).cast("long")
        + F.lit(1)
    ) / F.lit(4294967296.0)
    scored = docs.select(
        "doc_id",
        "lang",
        (F.round(-F.log(u) / w, 6) + F.lit(0.0)).alias("es_key"),
    )
    top = salted_topk(
        scored,
        [],
        [F.col("es_key").asc(), F.col("doc_id").asc()],
        RES_K,
        salt=F.xxhash64("doc_id"),
        rank_col="rank",
    )
    return top.select(
        "doc_id", "lang", "es_key", F.col("rank").cast("bigint").alias("rank")
    )


TM_SEED = "tm"
TM_SCALE = 1_000_000_000_000

_TM_U = f"({_fold_h('h')}) / 4294967296.0"

_TEMP_MIX_ORACLE = f"""
WITH c AS (
    SELECT lang AS d, COUNT(*) AS n FROM documents GROUP BY 1
),
t AS (
    SELECT d, n, SUM(n) OVER () AS tot,
           CAST(FLOOR(SQRT(CAST(n AS DOUBLE) / CAST(SUM(n) OVER () AS DOUBLE))
                      * {TM_SCALE}.0 + 0.5) AS BIGINT) AS s
    FROM c
),
w AS (
    SELECT d,
           (CAST(s AS DOUBLE) / CAST(SUM(s) OVER () AS DOUBLE))
           * (CAST(tot AS DOUBLE) / CAST(n AS DOUBLE)) AS w
    FROM t
),
j AS (
    SELECT doc_id, lang, w.w,
           MD5('{TM_SEED}:' || CAST(doc_id AS STRING)) AS h
    FROM documents JOIN w ON lang = w.d
),
n2 AS (
    SELECT doc_id, lang, w,
           CAST(FLOOR(w) AS BIGINT)
           + (CASE WHEN {_TM_U} < w - FLOOR(w) THEN 1 ELSE 0 END) AS n_copies
    FROM j
)
SELECT doc_id, lang, UNNEST(RANGE(0, n_copies)) AS copy_num,
       ROUND(w, 6) + 0.0 AS mix_weight
FROM n2
WHERE n_copies > 0
"""


@query("sample_temperature_mixture", oracle=_TEMP_MIX_ORACLE, tags=("sampling",))
def sample_temperature_mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-based domain rebalancing (alpha = 0.5, the T5-style
    multilingual mixing rule): per-language weights derived IN-FRAME
    from the domain counts — w_d = (sqrt(p_d) / sum sqrt(p_e)) / p_d,
    flattening the 'en' head and boosting the tail with the expected
    corpus size unchanged. The cross-domain normalizer is quantized to
    an exact integer sum (order-independent); copies come from the
    engine-wide hash-uniform threshold. Nothing about the domain space
    touches the driver — the operator holds at millions of domains."""
    docs = load(spark, sf_dir, "documents")
    return SA.temperature_mixture(
        docs, "doc_id", "lang", alpha=0.5, seed=TM_SEED, scale=TM_SCALE
    ).select("doc_id", "lang", "copy_num", "mix_weight")

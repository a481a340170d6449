"""Deduplication operators: exact, MinHash+LSH, SimHash, n-gram Jaccard.

Scale design:
- Exact dedup = hash groupBy on a content digest (one shuffle, combiner
  does the heavy lifting).
- Near-dup = shingle -> minhash signature -> LSH band bucketing -> join
  within buckets only: candidate pairs are O(collisions), never O(n^2).
- All hashing is md5-based (engine-portable, seed-parameterized) and every
  step is a JVM-side expression — no Python in the hot path.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _spread(df: DataFrame) -> DataFrame:
    """Round-robin repartition to the session's default parallelism.

    The documents tables arrive as a single parquet file -> ONE input
    partition, which would serialize the (expensive) per-row shingle and
    signature hashing onto a single core. At cluster scale the input is
    many files and this is a no-op cost-wise; locally it is the
    difference between 1 and 32 cores on the hot map."""
    return df.repartition(df.sparkSession.sparkContext.defaultParallelism)


def content_digest(col: Column | str, *, normalize: bool = True) -> Column:
    """Digest for exact dedup; optionally whitespace/case-normalized."""
    c = F.col(col) if isinstance(col, str) else col
    if normalize:
        c = F.lower(F.regexp_replace(F.trim(c), r"\s+", " "))
    return F.md5(c)


def exact_dedup(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Keep one representative (min id) per exact-content group.
    Single shuffle on the digest; partial agg map-side."""
    return (
        df.withColumn("content_hash", content_digest(text_col))
        .groupBy("content_hash")
        .agg(
            F.min(F.col(id_col)).alias("keep_id"),
            F.count(F.lit(1)).alias("group_size"),
        )
    )


def char_shingles(col: Column | str, k: int = 12) -> Column:
    """Array of character k-shingles of the normalized text (distinct).
    sequence+transform keeps generation inside codegen."""
    c = F.col(col) if isinstance(col, str) else col
    norm = F.lower(F.regexp_replace(F.trim(c), r"\s+", " "))
    n = F.greatest(F.length(norm) - F.lit(k - 1), F.lit(1))
    return F.array_distinct(
        F.transform(F.sequence(F.lit(1), n), lambda i: norm.substr(i, F.lit(k)))
    )


def _seeded_md5(prefix: str):
    """Single-arg lambda factory: pyspark higher-order functions infer
    lambda arity from the *signature* (defaults included), so a
    ``lambda s, j=j`` would be called as (element, index) — the closure
    must close over the seed, not default-arg it."""
    return lambda s: F.md5(F.concat(F.lit(prefix), s))


def minhash_signature(shingles: Column, num_hashes: int = 16, seed: str = "mh") -> Column:
    """MinHash signature as an array of hex-min values: element j is
    min(md5(seed_j || shingle)). Lexicographic min over a uniform hash is
    a valid min-hash; md5 hex compares identically in any engine."""
    return F.array(
        *[
            F.array_min(F.transform(shingles, _seeded_md5(f"{seed}{j}:"))).alias(f"h{j}")
            for j in range(num_hashes)
        ]
    )


def lsh_bands(signature: Column, bands: int, rows_per_band: int) -> Column:
    """Band keys: md5 of each signature slice; equal band key => LSH
    bucket collision."""
    return F.array(
        *[
            F.md5(
                F.concat_ws(
                    "|",
                    *[F.element_at(signature, b * rows_per_band + r + 1) for r in range(rows_per_band)],
                )
            )
            for b in range(bands)
        ]
    )


def minhash_lsh_candidates(
    df: DataFrame,
    text_col: str,
    id_col: str,
    *,
    shingle_k: int = 12,
    num_hashes: int = 16,
    bands: int = 4,
) -> DataFrame:
    """Candidate near-duplicate pairs (id_a < id_b) sharing >= 1 LSH band,
    with estimated Jaccard = matching signature fraction.

    Plan shape: narrow map (shingle/signature) -> explode bands ->
    self-join on band key -> distinct pairs. The join is hash-partitioned
    on the band key, so cost tracks actual collisions. Skew guard: at
    100 TB add a collision cap per bucket (count + filter) before the
    pair join."""
    rows_per_band = num_hashes // bands
    df = _spread(df)
    sig = (
        df.select(
            F.col(id_col).alias("doc"),
            minhash_signature(char_shingles(text_col, shingle_k), num_hashes).alias("sig"),
        )
    )
    banded = sig.select(
        "doc", "sig", F.explode(lsh_bands(F.col("sig"), bands, rows_per_band)).alias("band")
    )
    left = banded.select(
        F.col("doc").alias("id_a"), F.col("sig").alias("sig_a"), "band"
    )
    right = banded.select(
        F.col("doc").alias("id_b"), F.col("sig").alias("sig_b"), "band"
    )
    pairs = (
        left.join(right, "band")
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", "sig_a", "sig_b")
        .dropDuplicates(["id_a", "id_b"])
    )
    match_frac = (
        F.size(
            F.filter(
                F.zip_with(F.col("sig_a"), F.col("sig_b"), lambda a, b: a == b),
                lambda x: x,
            )
        ).cast("double")
        / F.lit(float(len(range(num_hashes))))
    )
    return pairs.select(
        "id_a", "id_b", F.round(match_frac, 4).alias("est_jaccard")
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    text_col: str,
    id_col: str,
    *,
    shingle_k: int = 12,
    min_jaccard: float = 0.0,
    bucket_hashes: int = 2,
) -> DataFrame:
    """Exact n-gram Jaccard over candidate pairs pre-bucketed by min-hash
    (docs sharing a min-shingle hash get compared). Inverted-index join on
    the bucket key, then exact |A∩B| / |A∪B| via array ops."""
    docs = _spread(df).select(
        F.col(id_col).alias("doc"), char_shingles(text_col, shingle_k).alias("sh")
    )
    buckets = docs.select(
        "doc",
        "sh",
        F.explode(
            F.array(
                *[
                    F.array_min(F.transform(F.col("sh"), _seeded_md5(f"jb{j}:")))
                    for j in range(bucket_hashes)
                ]
            )
        ).alias("bucket"),
    )
    left = buckets.select(F.col("doc").alias("id_a"), F.col("sh").alias("sh_a"), "bucket")
    right = buckets.select(F.col("doc").alias("id_b"), F.col("sh").alias("sh_b"), "bucket")
    pairs = (
        left.join(right, "bucket")
        .filter(F.col("id_a") < F.col("id_b"))
        .dropDuplicates(["id_a", "id_b"])
    )
    inter = F.size(F.array_intersect("sh_a", "sh_b")).cast("double")
    union = F.size(F.array_union("sh_a", "sh_b")).cast("double")
    jac = F.round(inter / union, 4)
    return pairs.select("id_a", "id_b", jac.alias("jaccard")).filter(
        F.col("jaccard") >= min_jaccard
    )


def simhash(df: DataFrame, text_col: str, id_col: str, bits: int = 16) -> DataFrame:
    """SimHash fingerprint: random hyperplanes simulated by md5(plane ||
    token); plane bit = sign of the +-1 vote sum over tokens. Output is a
    bigint fingerprint (sum of set-bit weights). explode tokens x planes
    -> two-level aggregation; everything stays in codegen."""
    toks = df.select(
        F.col(id_col).alias("doc"),
        F.explode(F.split(F.lower(F.trim(F.col(text_col))), r"\s+")).alias("tok"),
    )
    planes = toks.select(
        "doc",
        "tok",
        F.explode(F.sequence(F.lit(0), F.lit(bits - 1))).alias("plane"),
    ).withColumn(
        "vote",
        F.when(
            F.substring(F.md5(F.concat_ws(":", F.lit("sh"), F.col("plane"), F.col("tok"))), 1, 1)
            < F.lit("8"),
            F.lit(1),
        ).otherwise(F.lit(-1)),
    )
    bitsum = planes.groupBy("doc", "plane").agg(F.sum("vote").alias("s"))
    return bitsum.groupBy("doc").agg(
        F.sum(
            F.when(F.col("s") >= 0, F.expr("shiftleft(1L, plane)")).otherwise(
                F.lit(0).cast("bigint")
            )
        ).alias("simhash")
    )

"""Text analysis operators for training-data pipelines.

Whitespace/regex tokenization, language identification (stopword n-gram
heuristic), quality scoring (length/punctuation/stopword ratios), and
document fingerprinting — all as JVM-side column expressions (zero Python
UDFs) so they run inside whole-stage codegen and scale linearly.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Tiny per-language stopword marker sets: enough signal for a heuristic
# language id over whitespace-tokenized text. Deliberately small so the
# same lists are embeddable in an oracle SQL statement.
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of", "to", "a"),
    "fr": ("le", "la", "et", "les", "des"),
    "es": ("el", "la", "de", "los", "que"),
    "de": ("der", "die", "und", "das", "ist"),
}

STOPWORDS_EN = ("the", "a", "and", "of", "to", "in", "is", "it")


def tokens(col: Column | str) -> Column:
    """Whitespace tokenization (split on runs of whitespace, trimmed)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.split(F.trim(c), r"\s+")


def token_count(col: Column | str) -> Column:
    """Number of whitespace tokens; 0 for empty/blank text."""
    c = F.col(col) if isinstance(col, str) else col
    return F.when(F.trim(c) == "", F.lit(0)).otherwise(F.size(tokens(c))).cast("bigint")


def bpe_ish_token_count(col: Column | str) -> Column:
    """BPE-ish sub-token estimate: word tokens plus an extra token per
    4 chars of long words — a cheap deterministic proxy for byte-pair
    counts (regex splits + arithmetic, no tokenizer dependency)."""
    c = F.col(col) if isinstance(col, str) else col
    words = tokens(c)
    extra = F.aggregate(
        words,
        F.lit(0).cast("bigint"),
        lambda acc, w: acc
        + F.when(F.length(w) > 4, F.floor((F.length(w) - 1) / 4)).otherwise(0).cast("bigint"),
    )
    return (token_count(c) + extra).cast("bigint")


def _count_occurrences(c: Column, marker: str) -> Column:
    """Count whole-word occurrences of ``marker`` via split-length (the
    same arithmetic is expressible in DuckDB for oracle parity)."""
    padded = F.concat(F.lit(" "), F.lower(c), F.lit(" "))
    return (F.size(F.split(padded, f" {marker} ", -1)) - 1).cast("bigint")


def lang_scores(col: Column | str) -> dict[str, Column]:
    """Per-language stopword hit counts."""
    c = F.col(col) if isinstance(col, str) else col
    return {
        lang: sum(
            (_count_occurrences(c, m) for m in markers), F.lit(0).cast("bigint")
        )
        for lang, markers in LANG_MARKERS.items()
    }


def language_id(col: Column | str) -> Column:
    """Heuristic language id: argmax of marker-stopword counts, 'und'
    (undetermined) when no marker hits. Deterministic tie-break by
    language code order."""
    scores = lang_scores(col)
    pairs = F.array(
        *[F.struct(s.alias("score"), F.lit(lang).alias("lang")) for lang, s in sorted(scores.items())]
    )
    best = F.array_max(F.filter(pairs, lambda p: p["score"] > 0))
    # array_max on struct compares (score, lang) lexicographically: highest
    # score wins, then highest lang code — deterministic.
    return F.when(best.isNull(), F.lit("und")).otherwise(best["lang"])


def quality_features(col: Column | str) -> dict[str, Column]:
    """Quality-scoring feature set. Ratios are raw doubles (exact IEEE
    quotients of integer counts — engine-portable); callers round or
    scale for display."""
    c = F.col(col) if isinstance(col, str) else col
    n_chars = F.length(c).cast("bigint")
    n_tokens = token_count(c)
    n_alpha = F.length(F.regexp_replace(c, r"[^a-zA-Z]", "")).cast("bigint")
    n_punct = F.length(F.regexp_replace(c, r"[^.,;:!?]", "")).cast("bigint")
    stop_hits = sum(
        (_count_occurrences(c, w) for w in STOPWORDS_EN), F.lit(0).cast("bigint")
    )
    safe_tokens = F.greatest(n_tokens, F.lit(1))
    safe_chars = F.greatest(n_chars, F.lit(1))
    return {
        "n_chars": n_chars,
        "n_tokens": n_tokens,
        "mean_token_len": n_chars.cast("double") / safe_tokens,
        "alpha_ratio": n_alpha.cast("double") / safe_chars,
        "punct_ratio": n_punct.cast("double") / safe_chars,
        "stopword_ratio": stop_hits.cast("double") / safe_tokens,
    }


def quality_score(col: Column | str) -> Column:
    """Composite [0,1] quality score: stopword presence + sane token
    length + alphabetic density (a Gopher-rules-style heuristic reduced
    to portable arithmetic)."""
    f = quality_features(col)
    score = (
        F.least(f["stopword_ratio"] * 2, F.lit(1.0)) * 0.4
        + F.when((f["mean_token_len"] >= 3) & (f["mean_token_len"] <= 12), 1.0)
        .otherwise(0.0)
        * 0.3
        + F.least(f["alpha_ratio"] * 1.25, F.lit(1.0)) * 0.3
    )
    return F.round(score, 4)


def doc_fingerprint(col: Column | str, prefix_chars: int = 256) -> Column:
    """Document fingerprint: md5 of the whitespace-normalized text prefix
    (rolling-hash stand-in that is engine-portable)."""
    c = F.col(col) if isinstance(col, str) else col
    normalized = F.lower(F.regexp_replace(F.trim(c), r"\s+", " "))
    return F.md5(F.substring(normalized, 1, prefix_chars))


NGRAM_SEP = "\x1f"  # unit separator: never appears inside a token


def lower_tokens(col: Column | str) -> Column:
    """Lowercased whitespace tokens with blanks removed — the canonical
    LM tokenization (engine-portable: DuckDB mirror is
    LIST_FILTER(STRING_SPLIT_REGEX(TRIM(LOWER(text)), '\\s+'), ...))."""
    c = F.col(col) if isinstance(col, str) else col
    return F.filter(
        F.split(F.trim(F.lower(c)), r"\s+"), lambda t: t != F.lit("")
    )


def bigrams(toks: Column, sep: str = NGRAM_SEP) -> Column:
    """Adjacent-token bigram strings (``w1<sep>w2``); empty array below
    two tokens. The two-token guard matters: Spark's ``sequence(1, 0)``
    would generate a DESCENDING [1, 0] run, not an empty one."""
    return F.when(
        F.size(toks) >= 2,
        F.transform(
            F.sequence(F.lit(1), F.size(toks) - 1),
            lambda i: F.concat(
                F.element_at(toks, i), F.lit(sep), F.element_at(toks, i + 1)
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))

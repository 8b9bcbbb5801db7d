"""Text-analysis Column library for the LLM-data-pipeline extensions.

All functions are pure Column expressions (JVM-side, codegen'd) designed
so an equivalent DuckDB SQL expression exists for the correctness oracle:
  - word hashing goes through md5 -> first 15 hex digits -> BIGINT
    (Spark: conv(...,16,10); DuckDB: ('0x'||substr(md5(x),1,15))::BIGINT),
    60 bits, identical on both engines;
  - tokenization is whitespace split with blank removal;
  - everything avoids engine-specific hash() builtins.

At 100 TB these all stay embarrassingly parallel: per-row expressions,
no shuffle until the caller aggregates.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# 2^61 - 1 (Mersenne prime) -- fingerprint modulus
FP_MOD = 2305843009213693951
# large prime used to fold word hashes before weighting
FOLD_PRIME = 1000000007

# BPE-ish token pattern: letter runs, digit runs, single punctuation
BPE_TOKEN_RE = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"

STOPWORDS = ["the", "a", "of", "and", "to", "in", "is", "it"]


def tokens(text: Column) -> Column:
    """Whitespace tokens with blanks removed."""
    return F.filter(F.split(text, r"\s+"), lambda x: x != F.lit(""))


def token_count_ws(text: Column) -> Column:
    """Whitespace token count (BIGINT)."""
    return F.size(tokens(text)).cast("bigint")


def token_count_bpe(text: Column) -> Column:
    """BPE-ish sub-word token count: letter runs + digit runs + punct."""
    return F.regexp_count(text, F.lit(BPE_TOKEN_RE)).cast("bigint")


def word_hash(word: Column) -> Column:
    """Deterministic 60-bit integer hash of a word via md5 hex prefix."""
    return F.conv(F.substring(F.md5(word), 1, 15), 16, 10).cast("bigint")


def stopword_count(text: Column) -> Column:
    """How many lowercase tokens are stopwords."""
    stops = F.array(*[F.lit(s) for s in STOPWORDS])
    return F.size(
        F.filter(tokens(text), lambda x: F.array_contains(stops, F.lower(x)))
    ).cast("bigint")


def punct_count(text: Column) -> Column:
    """Count of non-alphanumeric, non-whitespace chars."""
    return F.regexp_count(text, F.lit(r"[^A-Za-z0-9\s]")).cast("bigint")


def quality_score(text: Column) -> Column:
    """Deterministic quality score in [0,1]: favors mid-length docs with
    low punctuation and a sane stopword ratio (the classic pre-training
    quality heuristics, arithmetic-only so the oracle can mirror it)."""
    n_tok = token_count_ws(text).cast("double")
    n_chr = F.length(text).cast("double")
    stop_ratio = stopword_count(text).cast("double") / F.greatest(n_tok, F.lit(1.0))
    punct_ratio = punct_count(text).cast("double") / F.greatest(n_chr, F.lit(1.0))
    len_score = F.least(n_tok / F.lit(64.0), F.lit(1.0))
    return F.round(
        F.greatest(
            F.lit(0.0),
            F.least(
                F.lit(1.0),
                0.4 * len_score + 0.4 * (1.0 - punct_ratio) + 0.2 * stop_ratio * 4.0,
            ),
        ),
        6,
    )


def detect_language(text: Column) -> Column:
    """N-gram/stopword language-ID heuristic -> 2-letter code.

    Marker-token voting (deterministic; mirrored exactly in the oracle).
    Real deployments plug a fastText-style model in via pandas_udf; the
    heuristic keeps the hot path JVM-side.
    """
    toks = F.transform(tokens(text), lambda x: F.lower(x))

    def count_in(words: list[str]) -> Column:
        arr = F.array(*[F.lit(w) for w in words])
        return F.size(F.filter(toks, lambda x: F.array_contains(arr, x)))

    n_en = count_in(["the", "a", "of", "and", "is"])
    n_es = count_in(["el", "la", "de", "y", "es"])
    n_fr = count_in(["le", "la", "de", "et", "est"])
    n_de = count_in(["der", "die", "das", "und", "ist"])
    # Highest count wins; ties resolve in fixed precedence en>es>fr>de>unk.
    return (
        F.when((n_en >= n_es) & (n_en >= n_fr) & (n_en >= n_de) & (n_en > 0), "en")
        .when((n_es >= n_fr) & (n_es >= n_de) & (n_es > 0), "es")
        .when((n_fr >= n_de) & (n_fr > 0), "fr")
        .when(n_de > 0, "de")
        .otherwise("unk")
    )

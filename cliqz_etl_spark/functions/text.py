"""Text-analysis expression library for the documents table.

Language-ID, quality scoring, token counting, and fingerprinting — all as
built-in-function expressions (regexp/split/aggregate), designed so each
has an exact DuckDB-SQL twin for oracle checking. No Python UDFs: at 100 TB
these run inside whole-stage codegen over the parquet scan.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


# Tiny per-language stopword lists for the n-gram/stopword heuristic
# language id. Deterministic and mirrored verbatim in the DuckDB oracle.
STOPWORDS = {
    "en": ["the", "a", "of", "and", "to"],
    "es": ["el", "la", "de", "que", "y"],
    "de": ["der", "die", "das", "und", "ist"],
    "fr": ["le", "la", "de", "et", "les"],
}

# A BPE-ish word/number/punctuation tokenizer regex (GPT-2 style, ASCII
# simplification): leading-space word pieces, digit runs, punct runs.
BPE_TOKEN_RE = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]+"


def tokens(col: Column | str) -> Column:
    """Whitespace tokenization -> array<string> (empty string -> empty)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.split(F.trim(c), r"\s+")


def token_count(col: Column | str) -> Column:
    """NULL text -> NULL count. Spark's size(NULL array) is -1 (legacy
    sizeOfNull), while every DuckDB oracle computes len(NULL) = NULL —
    the explicit guard keeps the engines aligned on NULL rows."""
    c = F.col(col) if isinstance(col, str) else col
    return (F.when(c.isNull(), F.lit(None))
            .when(F.trim(c) == "", F.lit(0))
            .otherwise(F.size(tokens(c)))
            .cast("long"))


def bpe_token_count(col: Column | str) -> Column:
    """Count of BPE-ish regex tokens (regexp_count is JVM-side)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_count(c, F.lit(BPE_TOKEN_RE)).cast("long")


def stopword_hits(col: Column | str, words: list[str]) -> Column:
    """How many tokens of ``col`` are in ``words`` (per-language signal).
    NULL text -> NULL (size of a NULL array is -1 in Spark, NULL in every
    oracle — see token_count)."""
    c = F.col(col) if isinstance(col, str) else col
    toks = tokens(c)
    return (F.when(c.isNull(), F.lit(None))
            .otherwise(F.size(F.filter(toks, lambda t: t.isin(words))))
            .cast("long"))


def lang_scores(col: Column | str) -> list[tuple[str, Column]]:
    return [(lang, stopword_hits(col, words)) for lang, words in STOPWORDS.items()]


def punct_ratio(col: Column | str) -> Column:
    """Fraction of characters that are ASCII punctuation."""
    c = F.col(col) if isinstance(col, str) else col
    n_punct = F.length(c) - F.length(F.regexp_replace(c, r"[^\w\s]", ""))
    return F.when(F.length(c) > 0, n_punct.cast("double") / F.length(c)).otherwise(F.lit(0.0))


def quality_score(col: Column | str) -> Column:
    """Deterministic composite quality heuristic in [0,1]:
    0.4 * min(1, tokens/64) + 0.4 * stopword_ratio_capped + 0.2 * (1 - punct_ratio).
    The exact formula is mirrored in the DuckDB oracle (queries/textops.py)."""
    c = F.col(col) if isinstance(col, str) else col
    n_tok = token_count(c).cast("double")
    sw = stopword_hits(c, STOPWORDS["en"]).cast("double")
    len_term = F.least(F.lit(1.0), n_tok / F.lit(64.0))
    sw_term = F.least(F.lit(1.0), F.when(n_tok > 0, sw / n_tok).otherwise(F.lit(0.0)) * F.lit(5.0))
    return F.lit(0.4) * len_term + F.lit(0.4) * sw_term + F.lit(0.2) * (F.lit(1.0) - punct_ratio(c))


def char_shingles(col: Column | str, k: int = 8) -> Column:
    """All k-char substrings as array<string> (sliding window via sequence +
    transform — JVM-side, no explode needed until the caller wants one)."""
    c = F.col(col) if isinstance(col, str) else col
    n = F.length(c) - F.lit(k - 1)
    return F.when(
        n > 0,
        F.transform(F.sequence(F.lit(1), n), lambda i: c.substr(i, F.lit(k))),
    ).otherwise(F.array(c))


def fingerprint(col: Column | str, k: int = 8) -> Column:
    """Document fingerprint: minimum 60-bit md5 over the k-char shingle set
    (a winnowing-style rolling-hash min; deterministic, oracle-checkable)."""
    sh = char_shingles(col, k)
    hashed = F.transform(sh, lambda s: F.conv(F.substring(F.md5(s), 1, 15), 16, 10).cast("long"))
    return F.array_min(hashed)


def word_shingles_from(toks: Column, k: int = 3) -> Column:
    """k-word shingles from an ALREADY-MATERIALIZED tokens column.

    Performance contract: ``toks`` should be a plain column reference (an
    attribute), not an inline expression — expression subtrees referenced
    inside a transform lambda are re-evaluated per element in codegen,
    which turns shingling into O(tokens^2) per row."""
    n = F.size(toks) - F.lit(k - 1)
    return F.when(
        n > 0,
        F.transform(F.sequence(F.lit(1), n),
                    lambda i: F.concat_ws(" ", F.slice(toks, i, k))),
    ).otherwise(F.array(F.concat_ws(" ", toks)))


def word_shingles(col: Column | str, k: int = 3) -> Column:
    """All k-word shingles (space-joined) as array<string>; docs shorter
    than k words yield a single shingle of the whole text. Prefer the
    staged ``word_shingles_from`` in hot paths (see its note)."""
    c = F.col(col) if isinstance(col, str) else col
    return word_shingles_from(tokens(c), k)

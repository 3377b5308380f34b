"""Text-analysis queries on the documents table (north-star extension:
language-ID, quality scoring, token counting, fingerprinting).

All expressions are built-ins (split/regexp/transform/aggregate) running
inside whole-stage codegen — at 100 TB these are pure scan-side map work
with zero shuffles (the ideal shape: no Python, no exchange). DuckDB twins
mirror each formula exactly; shared constants are interpolated into the SQL
at import time so the two engines can never drift.
"""

from __future__ import annotations

import functools
import operator

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cliqz_etl_spark.functions import text as T
from cliqz_etl_spark.functions.hashing import md5_long_sql
from cliqz_etl_spark.queries import query
from cliqz_etl_spark.tables import load_table

# DuckDB fragments mirroring functions/text.py -----------------------------

_DUCK_TOKENS = "string_split_regex(trim(text), '\\s+')"
_DUCK_NTOK = f"CASE WHEN trim(text) = '' THEN 0 ELSE len({_DUCK_TOKENS}) END"
_DUCK_BPE = f"len(regexp_extract_all(text, '{T.BPE_TOKEN_RE}'))"
_DUCK_PUNCT = ("CASE WHEN length(text) > 0 THEN "
               "CAST(length(text) - length(regexp_replace(text, '[^\\w\\s]', '', 'g')) AS DOUBLE)"
               " / length(text) ELSE 0.0 END")


def _duck_stop_hits(lang: str) -> str:
    words = ", ".join(f"'{w}'" for w in T.STOPWORDS[lang])
    return f"len(list_filter({_DUCK_TOKENS}, x -> x IN ({words})))"


def _spread_docs(spark: SparkSession, sf_dir: str, *cols: str) -> DataFrame:
    """Documents scan repartitioned for per-character compute: the sf0.1
    corpus is one small parquet file -> one scan split, which serializes
    the 4-language stopword filters / per-offset hashing onto a single
    core of 32. _spread shuffles only the projected columns once, and
    only when the scan cannot already fill the cluster — at real file
    counts (100 TB) it is a no-op, so the plan stays scan-side map."""
    from cliqz_etl_spark.operators.dedup import _spread

    return _spread(load_table(spark, sf_dir, "documents").select(*cols))


@query(
    "text_stats",
    oracle=f"""
    SELECT doc_id AS doc_id,
           CAST({_DUCK_NTOK} AS BIGINT) AS n_tokens,
           CAST({_DUCK_BPE} AS BIGINT)  AS n_bpe_tokens,
           CAST(floor({_DUCK_PUNCT} * 10000 + 0.5) AS BIGINT) AS punct_ratio_x10k,
           length(text)                 AS n_chars_computed
    FROM documents
    """,
)
def text_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenization + punctuation profile, one scan, no shuffle."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        T.token_count("text").alias("n_tokens"),
        T.bpe_token_count("text").alias("n_bpe_tokens"),
        # floor-quantized rather than round()ed: Spark and DuckDB round()
        # disagree on exact .00005 boundaries; floor of identical IEEE
        # arithmetic cannot.
        F.floor(T.punct_ratio("text") * 10000 + 0.5).cast("long").alias("punct_ratio_x10k"),
        F.length("text").cast("long").alias("n_chars_computed"),
    )


# Language-ID: argmax of per-language stopword hits; ties break on language
# code ascending; all-zero -> 'unknown'. The CASE chain below checks
# languages in ascending order with >= so it implements exactly that
# tie-break.
_LANGS = sorted(T.STOPWORDS)  # de, en, es, fr


def _duck_lang_case() -> str:
    conds = []
    for i, lang in enumerate(_LANGS):
        others = [o for o in _LANGS[i + 1:]]
        cond = " AND ".join([f"h_{lang} >= h_{o}" for o in others]) or "TRUE"
        conds.append(f"WHEN {cond} THEN '{lang}'")
    return "CASE " + " ".join(conds) + " END"


@query(
    "lang_id",
    oracle=f"""
    WITH hits AS (
        SELECT doc_id, lang,
               {", ".join(f"{_duck_stop_hits(lang)} AS h_{lang}" for lang in _LANGS)}
        FROM documents
    )
    SELECT doc_id AS doc_id,
           CASE WHEN {" + ".join(f"h_{lang}" for lang in _LANGS)} = 0 THEN 'unknown'
                ELSE {_duck_lang_case()} END AS predicted_lang,
           lang AS labeled_lang
    FROM hits
    """,
)
def lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stopword-profile language heuristic: per-language hit counts ->
    deterministic argmax via array_min over (neg_score, lang) structs."""
    docs = _spread_docs(spark, sf_dir, "doc_id", "text", "lang")
    scores = T.lang_scores("text")
    candidates = F.array(*[
        F.struct((-cnt).alias("neg"), F.lit(lang).alias("lang")) for lang, cnt in scores
    ])
    total = functools.reduce(operator.add, (cnt for _, cnt in scores))
    best = F.array_min(candidates)["lang"]
    return docs.select(
        "doc_id",
        F.when(total == 0, F.lit("unknown")).otherwise(best).alias("predicted_lang"),
        F.col("lang").alias("labeled_lang"),
    )


@query(
    "text_quality",
    oracle=f"""
    WITH base AS (
        SELECT doc_id,
               CAST({_DUCK_NTOK} AS DOUBLE) AS n_tok,
               CAST({_duck_stop_hits('en')} AS DOUBLE) AS sw,
               {_DUCK_PUNCT} AS pr
        FROM documents
    )
    SELECT doc_id AS doc_id,
           CAST(floor((0.4 * least(1.0, n_tok / 64.0)
               + 0.4 * least(1.0, (CASE WHEN n_tok > 0 THEN sw / n_tok ELSE 0.0 END) * 5.0)
               + 0.2 * (1.0 - pr)) * 10000 + 0.5) AS BIGINT) AS quality_x10k
    FROM base
    """,
)
def text_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Composite quality heuristic (length, stopword ratio, punctuation)."""
    docs = _spread_docs(spark, sf_dir, "doc_id", "text")
    return docs.select(
        "doc_id",
        F.floor(T.quality_score("text") * 10000 + 0.5).cast("long").alias("quality_x10k"),
    )


@query(
    "doc_fingerprint",
    oracle=f"""
    SELECT doc_id AS doc_id,
           list_min(list_transform(
               range(1, greatest(length(text) - 7, 1) + 1),
               i -> {md5_long_sql("substr(text, CAST(i AS INTEGER), 8)")}
           )) AS fingerprint
    FROM documents
    """,
)
def doc_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winnowing-style fingerprint: min 60-bit md5 over all 8-char shingles.
    Spark side stays un-exploded (transform + array_min per row); the
    oracle's generate_series is the exploded equivalent. The scan is
    repartitioned first — ~len(text) md5s per row serialize onto one core
    when the input is a single parquet split."""
    docs = _spread_docs(spark, sf_dir, "doc_id", "text")
    return docs.select("doc_id", T.fingerprint("text", 8).alias("fingerprint"))


# --------------------------------------------------------------------------
# Higher-order array-function gauntlet: transform / filter / exists /
# aggregate / array_distinct / array_sort / slice / array_join in ONE
# registered query, oracle-mirrored by DuckDB's list_* family. These are
# the JVM-side lambda expressions that keep per-element work out of
# Python (the dedup operators lean on them heavily — this pins the
# cross-engine semantics in the gate).
# --------------------------------------------------------------------------
@query(
    "array_ops_gauntlet",
    oracle=f"""
    SELECT doc_id AS doc_id,
           {_DUCK_NTOK} AS n_tok,
           CAST(len(list_filter({_DUCK_TOKENS}, x -> length(x) > 4)) AS INT)
               AS n_long_tok,
           CAST(CASE WHEN trim(text) = '' THEN 0
                ELSE list_sum(list_transform({_DUCK_TOKENS}, x -> length(x)))
                END AS BIGINT) AS total_chars,
           (len(list_filter({_DUCK_TOKENS}, x -> x = 'the')) > 0) AS has_the,
           array_to_string(
               list_sort(list_distinct(
                   list_transform({_DUCK_TOKENS}, x -> lower(x))))[1:3],
               ',') AS first3_norm
    FROM documents
    """,
)
def array_ops_gauntlet(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Every higher-order function evaluated once per document over the
    token array — a single projection, no shuffle, whole-stage codegen."""
    from cliqz_etl_spark.functions.text import token_count, tokens

    docs = load_table(spark, sf_dir, "documents")
    toks = tokens("text")
    empty = F.trim(F.col("text")) == ""
    return docs.select(
        "doc_id",
        token_count("text").alias("n_tok"),
        F.when(empty, F.lit(0))
        .otherwise(F.size(F.filter(toks, lambda t: F.length(t) > 4)))
        .cast("int").alias("n_long_tok"),
        F.when(empty, F.lit(0))
        .otherwise(F.aggregate(
            F.transform(toks, F.length),
            F.lit(0), lambda acc, x: acc + x))
        .cast("long").alias("total_chars"),
        F.exists(toks, lambda t: t == F.lit("the")).alias("has_the"),
        F.array_join(
            F.slice(F.array_sort(F.array_distinct(F.transform(toks, F.lower))),
                    1, 3),
            ",").alias("first3_norm"),
    )

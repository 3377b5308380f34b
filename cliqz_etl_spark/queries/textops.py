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

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from cliqz_etl_spark.functions import text as T
from cliqz_etl_spark.functions.hashing import md5_long, md5_long_sql
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
           CASE WHEN h_en IS NULL THEN NULL
                WHEN {" + ".join(f"h_{lang}" for lang in _LANGS)} = 0 THEN 'unknown'
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
        # NULL text -> NULL prediction (the oracle's CASE chain falls
        # through to NULL there; without this guard Spark's otherwise()
        # branch would pick an arbitrary language from NULL-score structs)
        F.when(F.col("text").isNull(), F.lit(None))
        .when(total == 0, F.lit("unknown")).otherwise(best)
        .alias("predicted_lang"),
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
        # NULL guard: size(filter(NULL)) is -1 in Spark, NULL in the oracle
        F.when(F.col("text").isNull(), F.lit(None))
        .when(empty, F.lit(0))
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


# --------------------------------------------------------------------------
# Gopher-style rule-based quality filter (Rae et al. 2021, "Scaling
# Language Models" §A.1.1 — public heuristics, thresholds scaled to this
# synthetic corpus). Every rule is INTEGER arithmetic over token counts so
# the Spark and DuckDB sides are bit-identical by construction (no float
# ratio can straddle an engine-specific rounding boundary).
# --------------------------------------------------------------------------

GOPHER_MIN_TOK = 10
GOPHER_MAX_TOK = 10_000
GOPHER_MIN_MWL = 2   # mean word length lower bound (chars/token)
GOPHER_MAX_MWL = 12  # upper bound
_STOP5 = T.STOPWORDS["en"]  # the, a, of, and, to


# The conjunction of all five rules over m's columns — shared with the
# composed curation pipeline (queries/llmdata.py) so the two oracles can
# never drift from the flag query.
DUCK_GOPHER_RULES = (
    f"(n_tok BETWEEN {GOPHER_MIN_TOK} AND {GOPHER_MAX_TOK})"
    f" AND total_chars >= {GOPHER_MIN_MWL} * n_tok"
    f" AND total_chars <= {GOPHER_MAX_MWL} * n_tok"
    f" AND 5 * n_alpha >= 4 * n_tok"
    f" AND 10 * n_sym <= n_tok"
    f" AND n_stop >= 2"
)


def gopher_metrics(docs: DataFrame) -> DataFrame:
    """(doc_id, text) -> (doc_id, text, n_tok, total_chars, n_alpha,
    n_sym, n_stop): the five Gopher rule inputs, one projection, all
    integer. The token array is materialized once per row before the
    per-metric lambdas so tokenization isn't recomputed five times."""
    empty = F.trim(F.col("text")) == ""
    toks = F.when(empty, F.array().cast("array<string>")).otherwise(T.tokens("text"))
    d = docs.select("doc_id", "text", toks.alias("tk"))
    tk = F.col("tk")

    def nullsafe_size(arr: "F.Column") -> "F.Column":
        # Spark's size(NULL array) is -1; the DuckDB twin's len(NULL) is
        # NULL. NULL text therefore gets NULL counts on BOTH engines.
        return F.when(tk.isNull(), F.lit(None)).otherwise(F.size(arr))

    # per-word CASE (not array_contains alone): list_contains(NULL, w) is
    # NULL, and the oracle's CASE sends NULL to the ELSE-0 branch — mirror
    # that so n_stop is 0 (not NULL) for NULL text, same as DuckDB.
    n_stop = functools.reduce(
        operator.add,
        (F.when(F.array_contains(tk, w), F.lit(1)).otherwise(F.lit(0)).cast("long")
         for w in _STOP5)).cast("long")
    return d.select(
        "doc_id", "text",
        nullsafe_size(tk).cast("long").alias("n_tok"),
        F.coalesce(
            F.aggregate(F.transform(tk, F.length), F.lit(0), lambda a, x: a + x),
            F.lit(0)).cast("long").alias("total_chars"),
        nullsafe_size(F.filter(tk, lambda t: t.rlike("[A-Za-z]")))
        .cast("long").alias("n_alpha"),
        nullsafe_size(F.filter(tk, lambda t: ~t.rlike("[A-Za-z0-9]")))
        .cast("long").alias("n_sym"),
        n_stop.alias("n_stop"),
    )


def gopher_rule_cols() -> dict[str, "F.Column"]:
    """The five rule predicates over gopher_metrics() columns."""
    return {
        "ok_len": F.col("n_tok").between(GOPHER_MIN_TOK, GOPHER_MAX_TOK),
        "ok_word_len": ((F.col("total_chars") >= GOPHER_MIN_MWL * F.col("n_tok"))
                        & (F.col("total_chars") <= GOPHER_MAX_MWL * F.col("n_tok"))),
        "ok_alpha": 5 * F.col("n_alpha") >= 4 * F.col("n_tok"),
        "ok_symbol": 10 * F.col("n_sym") <= F.col("n_tok"),
        "ok_stopwords": F.col("n_stop") >= 2,
    }


def _duck_gopher_base() -> str:
    stop_terms = " + ".join(
        f"CASE WHEN list_contains(tk, '{w}') THEN 1 ELSE 0 END" for w in _STOP5
    )
    return f"""
    WITH base AS (
        SELECT doc_id,
               CASE WHEN trim(text) = '' THEN []::VARCHAR[]
                    ELSE string_split_regex(trim(text), '\\s+') END AS tk
        FROM documents
    ), m AS (
        SELECT doc_id,
               CAST(len(tk) AS BIGINT) AS n_tok,
               CAST(coalesce(list_sum(list_transform(tk, x -> length(x))), 0)
                    AS BIGINT) AS total_chars,
               CAST(len(list_filter(tk, x -> regexp_matches(x, '[A-Za-z]')))
                    AS BIGINT) AS n_alpha,
               CAST(len(list_filter(tk, x -> NOT regexp_matches(x, '[A-Za-z0-9]')))
                    AS BIGINT) AS n_sym,
               CAST({stop_terms} AS BIGINT) AS n_stop
        FROM base
    )
    """


@query(
    "gopher_quality_filter",
    oracle=f"""
    {_duck_gopher_base()}
    SELECT doc_id AS doc_id,
           n_tok AS n_tok,
           (n_tok BETWEEN {GOPHER_MIN_TOK} AND {GOPHER_MAX_TOK}) AS ok_len,
           (total_chars >= {GOPHER_MIN_MWL} * n_tok
            AND total_chars <= {GOPHER_MAX_MWL} * n_tok) AS ok_word_len,
           (5 * n_alpha >= 4 * n_tok) AS ok_alpha,
           (10 * n_sym <= n_tok) AS ok_symbol,
           (n_stop >= 2) AS ok_stopwords,
           ({DUCK_GOPHER_RULES}) AS passes
    FROM m
    """,
)
def gopher_quality_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style composite document filter, one scan, zero shuffles.

    Rules (all integer comparisons — exact cross-engine):
      ok_len       token count in [10, 10000]
      ok_word_len  mean word length in [2, 12]  (as 2*n <= chars <= 12*n)
      ok_alpha     >= 80% of tokens contain an alphabetic char (5a >= 4n)
      ok_symbol    <= 10% of tokens are pure symbol runs (10s <= n)
      ok_stopwords >= 2 distinct common-stopword hits
    At 100 TB this is the archetypal scan-side map: every rule runs inside
    whole-stage codegen over the parquet scan with zero exchanges, so it
    composes with any downstream shuffle for free (reference has no
    analogue; this is a north-star curation extension like text_quality).
    """
    m = gopher_metrics(_spread_docs(spark, sf_dir, "doc_id", "text"))
    rules = gopher_rule_cols()
    return m.select(
        "doc_id", "n_tok",
        *[c.alias(name) for name, c in rules.items()],
        functools.reduce(operator.and_, rules.values()).alias("passes"),
    )


# --------------------------------------------------------------------------
# Curation funnel audit: FIRST-failing-rule attribution over the Gopher
# cascade — the production "where did 40% of the corpus go" report every
# large-scale curation run ships with. Each document is attributed to the
# first rule (in the pipeline's documented order) that rejects it, or to
# 'pass'; output is one row per stage with the doc count and corpus share
# in ppm (integer division — exact cross-engine). NULL text yields NULL
# rule predicates; coalesce(rule, FALSE) attributes those to the first
# stage, matching what a cascade that can't evaluate a rule must do.
# --------------------------------------------------------------------------
_FUNNEL_STAGES = ["ok_len", "ok_word_len", "ok_alpha", "ok_symbol",
                  "ok_stopwords"]


def _duck_funnel_stage() -> str:
    cases = " ".join(
        f"WHEN NOT COALESCE(({cond}), FALSE) THEN '{name}'"
        for name, cond in [
            ("ok_len", f"n_tok BETWEEN {GOPHER_MIN_TOK} AND {GOPHER_MAX_TOK}"),
            ("ok_word_len", f"total_chars >= {GOPHER_MIN_MWL} * n_tok"
                            f" AND total_chars <= {GOPHER_MAX_MWL} * n_tok"),
            ("ok_alpha", "5 * n_alpha >= 4 * n_tok"),
            ("ok_symbol", "10 * n_sym <= n_tok"),
            ("ok_stopwords", "n_stop >= 2"),
        ])
    return f"CASE {cases} ELSE 'pass' END"


@query(
    "curation_funnel_audit",
    oracle=f"""
    {_duck_gopher_base()}
    , staged AS (
        SELECT {_duck_funnel_stage()} AS stage FROM m
    ), tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_total FROM staged)
    SELECT stage AS stage,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST((1000000 * COUNT(*)) // n_total AS BIGINT) AS share_ppm
    FROM staged CROSS JOIN tot
    GROUP BY stage, n_total
    """,
)
def curation_funnel_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Drop-attribution funnel for the Gopher cascade: per stage, how
    many documents fail FIRST at that rule (plus the 'pass' bucket) and
    the corpus share in ppm.

    Plan shape: the stage label is a scan-side CASE over gopher_metrics'
    whole-stage-codegen expressions — zero pre-agg shuffles; the groupBy
    output is at most 6 rows, and the corpus total rides a broadcast
    1-row aggregate. At 100 TB this is one pass over documents with a
    6-row result, the cheapest possible full-corpus audit."""
    m = gopher_metrics(_spread_docs(spark, sf_dir, "doc_id", "text"))
    rules = gopher_rule_cols()
    stage = F.lit("pass")
    for name in reversed(_FUNNEL_STAGES):
        stage = F.when(~F.coalesce(rules[name], F.lit(False)),
                       F.lit(name)).otherwise(stage)
    from cliqz_etl_spark.operators.dedup import _materialize

    staged = m.select(stage.alias("stage"))
    # materialized: the <=6-row stage frame feeds the total aggregate AND
    # the share projection — unpersisted, the gopher corpus pass ran twice
    grouped = _materialize(
        staged.groupBy("stage")
        .agg(F.count(F.lit(1)).cast("long").alias("n_docs")))
    # the corpus total is the SUM of the 6-row grouped frame — deriving it
    # there instead of re-aggregating the scan keeps this a one-scan plan
    total = grouped.agg(F.sum("n_docs").cast("long").alias("n_total"))
    return (grouped.crossJoin(F.broadcast(total))
            .select("stage", "n_docs",
                    F.expr("CAST((1000000 * n_docs) div n_total AS BIGINT)")
                    .alias("share_ppm")))


# --------------------------------------------------------------------------
# Per-source boilerplate detection by DOCUMENT frequency (the CCNet /
# Dolma pass that strips nav bars, footers, cookie banners): an n-gram is
# boilerplate for a source when it appears in at least a fifth of that
# source's documents (and at least BOILER_MIN_DF of them — the absolute
# floor keeps tiny sources from declaring everything boilerplate). Unlike
# dedup_exact_substrings (occurrence-duplicate: ANY earlier occurrence),
# this is a df-threshold rule — a phrase repeated 50 times inside one
# document is repetition, not boilerplate. W=2 keeps the oracle
# discriminative on the synthetic corpus; production would use 5-13-token
# grams and hash them (md5_long) instead of carrying strings.
# --------------------------------------------------------------------------
BOILER_W = 2
BOILER_MIN_DF = 3
BOILER_DF_MULT = 5  # boilerplate iff df >= n_src_docs / BOILER_DF_MULT


@query(
    "boilerplate_ngram_profile",
    oracle=f"""
    WITH t AS (
        SELECT doc_id, source, {_DUCK_TOKENS} AS tk
        FROM documents
        WHERE trim(text) <> '' AND len({_DUCK_TOKENS}) >= {BOILER_W}
    ), pos AS (
        SELECT doc_id, source,
               unnest(list_transform(range(len(tk) - {BOILER_W - 1}),
                   i -> array_to_string(tk[i + 1 : i + {BOILER_W}], ' ')))
                   AS gram
        FROM t
    ), df AS (
        SELECT source, gram, CAST(count(DISTINCT doc_id) AS BIGINT) AS df
        FROM pos GROUP BY source, gram
    ), src AS (
        SELECT source, CAST(count(*) AS BIGINT) AS n_src_docs FROM t
        GROUP BY source
    ), boiler AS (
        SELECT df.source, df.gram
        FROM df JOIN src USING (source)
        WHERE {BOILER_DF_MULT} * df.df >= src.n_src_docs AND df.df >= {BOILER_MIN_DF}
    )
    SELECT p.doc_id AS doc_id,
           CAST(count(*) AS BIGINT) AS n_pos,
           CAST(sum(CASE WHEN b.gram IS NOT NULL THEN 1 ELSE 0 END)
                AS BIGINT) AS n_boiler,
           CAST((sum(CASE WHEN b.gram IS NOT NULL THEN 1 ELSE 0 END)
                 * 1000000) // count(*) AS BIGINT) AS boiler_ppm
    FROM pos p LEFT JOIN boiler b
      ON b.source = p.source AND b.gram = p.gram
    GROUP BY p.doc_id
    """,
)
def boilerplate_ngram_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document boilerplate share: the fraction of a doc's W-gram
    positions whose gram is source-level boilerplate (df >= a fifth of
    the source's docs, df >= 3), in integer ppm — the removal mask the
    boilerplate-strip rewrite applies.

    Plan shape (round-13 rebuild): the tokenize+gram transform runs ONCE
    into a doc-grain cached frame (it previously re-ran per consumer —
    the df pass, the source totals, and the rejoin each re-derived it);
    per-doc position counts are size(grams) scan-side; df is ONE
    groupBy(source, gram) with map-side combine (the hot boilerplate
    grams collapse per-partition before the shuffle — exactly the keys
    that would otherwise skew); the per-source doc totals broadcast;
    the boiler set joins back per (source, gram) un-hinted so AQE
    broadcasts it when it measures small (it is df-filtered, so at
    100 TB it is the rare-tail-free head of the gram distribution,
    usually broadcastable) — INNER join + count, so only boiler-hit
    positions flow into the per-doc aggregate; the doc totals come from
    the cached frame."""
    from cliqz_etl_spark.operators.dedup import _materialize

    docs = _spread_docs(spark, sf_dir, "doc_id", "text", "source")
    tk = T.tokens("text")
    t = _materialize(
        docs.where((F.trim("text") != "") & (F.size(tk) >= BOILER_W))
        .select("doc_id", "source", tk.alias("tk"))
        .select("doc_id", "source", F.expr(
            f"transform(sequence(0, size(tk) - {BOILER_W}), "
            f"i -> array_join(slice(tk, i + 1, {BOILER_W}), ' '))"
        ).alias("grams")))
    pos = t.select("doc_id", "source", F.explode("grams").alias("gram"))
    df = (pos.groupBy("source", "gram")
          .agg(F.countDistinct("doc_id").alias("df")))
    src = t.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_src_docs"))
    boiler = (df.join(F.broadcast(src), "source")
              .where((BOILER_DF_MULT * F.col("df") >= F.col("n_src_docs"))
                     & (F.col("df") >= BOILER_MIN_DF))
              .select("source", "gram"))
    hits = (pos.join(boiler, ["source", "gram"], "left_semi")
            .groupBy("doc_id")
            .agg(F.count(F.lit(1)).cast("long").alias("n_boiler")))
    return (t.select("doc_id", F.size("grams").cast("long").alias("n_pos"))
            .join(hits, ["doc_id"], "left")
            .select("doc_id", "n_pos",
                    F.coalesce("n_boiler", F.lit(0)).cast("long")
                    .alias("n_boiler"))
            .select("doc_id", "n_pos", "n_boiler",
                    F.expr("CAST((n_boiler * 1000000) div n_pos AS BIGINT)")
                    .alias("boiler_ppm")))


# --------------------------------------------------------------------------
# Corpus-trained unigram frequency score: how "typical" is a document's
# vocabulary relative to the whole corpus. The score is the mean corpus
# frequency of the document's tokens, in parts-per-million, computed with
# pure BIGINT arithmetic ((1e6 * sum_count) div (n_tok * total)) so both
# engines truncate identically — the integer-exact stand-in for a unigram
# log-prob LM score.
# --------------------------------------------------------------------------


def unigram_ppm(docs: DataFrame, text_col: str = "text",
                broadcast_vocab_limit: int | None = None) -> DataFrame:
    """(doc_id, text_col) -> (doc_id, n_tok, freq_ppm): train a unigram
    count table over the given corpus frame and score each doc by mean
    token corpus-frequency in ppm (integer-exact; see the registered
    query's docstring for the plan-shape and overflow notes). Shared by
    unigram_freq_score (raw corpus) and curation_pipeline_v2 (the
    filtered+deduped corpus).

    ``broadcast_vocab_limit``: the scale knob. When set, the count table
    is broadcast-hinted so the token->count join becomes a broadcast hash
    join and the second per-token shuffle disappears — exact only while
    the true vocabulary fits the limit, so the caller's claim is CHECKED:
    if the vocab exceeds it, raise rather than silently mis-score
    out-of-vocab tokens. (A lossy top-V variant would need a defined OOV
    count; this keeps the oracle-exact contract.)"""
    from cliqz_etl_spark.operators.cache import track

    docs = (docs.where(F.trim(text_col) != "")
            .select("doc_id", T.tokens(text_col).alias("tk")))
    tok = docs.select("doc_id", F.explode("tk").alias("w"))
    cnt = track(tok.groupBy("w").agg(F.count("*").cast("long").alias("c")).persist())
    tot = cnt.agg(F.sum("c").cast("long").alias("t"))
    join_side = cnt
    if broadcast_vocab_limit is not None:
        vocab_size = cnt.count()  # cheap: cnt is persisted
        if vocab_size > broadcast_vocab_limit:
            raise ValueError(
                f"vocabulary has {vocab_size} distinct tokens, above the "
                f"broadcast limit {broadcast_vocab_limit}; run without the "
                "broadcast hint (shuffled token join) instead")
        join_side = F.broadcast(cnt)
    doc = (tok.join(join_side, "w")
           .groupBy("doc_id")
           .agg(F.sum("c").cast("long").alias("sum_cnt"),
                F.count("*").cast("long").alias("n_tok")))
    # 128-bit intermediates: n_tok * t overflows BIGINT for ~1e13-token
    # corpora, and the engines DISAGREE on overflow (Java wraps silently,
    # DuckDB raises) — so both sides widen first (DECIMAL(38,0) / HUGEINT)
    # and only the <=1e6 quotient narrows back to long.
    ppm = F.expr(
        "(CAST(1000000 AS DECIMAL(38,0)) * sum_cnt)"
        " div (CAST(n_tok AS DECIMAL(38,0)) * t)")
    return (doc.crossJoin(F.broadcast(tot))
            .select("doc_id", "n_tok", ppm.cast("long").alias("freq_ppm")))


@query(
    "unigram_freq_score",
    oracle="""
    WITH tok AS (
        SELECT doc_id, unnest(string_split_regex(trim(text), '\\s+')) AS w
        FROM documents WHERE trim(text) <> ''
    ), cnt AS (
        SELECT w, CAST(count(*) AS BIGINT) AS c FROM tok GROUP BY w
    ), tot AS (
        SELECT CAST(sum(c) AS BIGINT) AS t FROM cnt
    ), doc AS (
        SELECT tok.doc_id,
               CAST(sum(cnt.c) AS BIGINT) AS sum_cnt,
               CAST(count(*) AS BIGINT) AS n_tok
        FROM tok JOIN cnt USING (w) GROUP BY tok.doc_id
    )
    SELECT doc_id AS doc_id,
           n_tok AS n_tok,
           CAST((1000000 * CAST(sum_cnt AS HUGEINT))
                // (CAST(n_tok AS HUGEINT) * t) AS BIGINT) AS freq_ppm
    FROM doc, tot
    """,
)
def unigram_freq_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train a unigram frequency table over the corpus, then score every
    document by its tokens' mean corpus frequency (ppm, integer-exact).

    Plan shape: explode -> groupBy(token) count (map-side combine, shuffle
    bounded by |vocab| after combine) -> equi-join tokens back to counts
    (shuffle on token) -> groupBy(doc_id). The 1-row corpus total rides a
    broadcast-able crossJoin. At 100 TB the token->count join stays keyed
    (never all-pairs); with a capped top-V vocabulary the count table
    becomes a broadcast and the second shuffle disappears — that variant
    is a config away, this one keeps exactness for the oracle gate.

    The vocab-sized count table is persisted (operators/cache-tracked):
    without it, deriving the corpus total AND the join side from ``cnt``
    recomputes its whole explode+agg subtree — a third full corpus scan,
    visible in .explain("formatted"). Persisting |vocab| rows bounds the
    pipeline at two corpus scans (one per token stream), which beats
    persisting the O(total tokens) exploded frame at any scale.
    """
    return unigram_ppm(load_table(spark, sf_dir, "documents"))


# --------------------------------------------------------------------------
# Bigram language-model scoring (CCNet-shape perplexity filtering,
# Wenzek et al. 2020): train a smoothed LM on a held-out reference slice,
# score every document, bucket the corpus head/middle/tail. The classic
# quality gate in front of web-scale pretraining corpora — documents that
# the reference LM finds improbable are boilerplate, spam, or noise.
# Reference analogue: the repo-wide quality family (SURVEY.md north-star);
# the reference ETL itself has no LM ops (cliqz_etl is 2 extract jobs).
# --------------------------------------------------------------------------
@query(
    "bigram_lm_score",
    oracle=f"""
    WITH base AS (
        SELECT doc_id, {_DUCK_TOKENS} AS tk FROM documents
        WHERE trim(text) <> ''
    ), big AS (
        SELECT doc_id, tk[i] AS w1, tk[i + 1] AS w2
        FROM (SELECT doc_id, tk, unnest(range(1, len(tk))) AS i
              FROM base WHERE len(tk) >= 2)
    ), tr AS (
        SELECT w1, w2 FROM big WHERE {md5_long_sql('doc_id')} % 5 = 0
    ), c2 AS (
        SELECT w1, w2, CAST(count(*) AS BIGINT) AS c2 FROM tr GROUP BY w1, w2
    ), c1 AS (
        SELECT w1, CAST(sum(c2) AS BIGINT) AS c1 FROM c2 GROUP BY w1
    ), voc AS (
        SELECT CAST(count(DISTINCT w) AS BIGINT) AS v
        FROM (SELECT unnest(tk) AS w FROM base
              WHERE {md5_long_sql('doc_id')} % 5 = 0)
    ), sc AS (
        SELECT b.doc_id,
               CAST(((COALESCE(c2.c2, 0) + 1) * 1000000)
                    // (COALESCE(c1.c1, 0) + v + 1) AS BIGINT) AS ppm
        FROM big b
        LEFT JOIN c2 ON b.w1 = c2.w1 AND b.w2 = c2.w2
        LEFT JOIN c1 ON b.w1 = c1.w1
        CROSS JOIN voc
    ), doc AS (
        SELECT doc_id,
               CAST(count(*) AS BIGINT) AS n_bigrams,
               CAST(sum(ppm) // count(*) AS BIGINT) AS avg_cond_ppm,
               CAST(sum(CAST(floor(1000 * -ln(greatest(ppm, 1) / 1000000.0)
                                   + 0.5) AS BIGINT)) AS BIGINT) AS nll_milli
        FROM sc GROUP BY doc_id
    )
    SELECT doc_id AS doc_id, n_bigrams AS n_bigrams,
           avg_cond_ppm AS avg_cond_ppm, nll_milli AS nll_milli,
           CAST(ntile(3) OVER (ORDER BY nll_milli // n_bigrams ASC,
                               doc_id ASC) AS BIGINT) AS ppl_bucket
    FROM doc
    """,
)
def bigram_lm_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet-style corpus bucketing by reference-LM perplexity.

    Model: add-one-smoothed bigram LM, p(w2|w1) = (c2+1)/(c1+V+1), trained
    on the deterministic 20% reference slice md5(doc_id)%5==0 (the stand-in
    for CCNet's held-out Wikipedia LM; hash-selection keeps it replayable
    on both engines). Every doc with >=2 tokens is scored:

    - per-bigram conditional probability in ppm, INTEGER-exact on both
      engines (`div` on longs / `//` on HUGEINT; the +1 on the denominator
      is the UNK type, which also makes a zero-vocab fuzz corpus safe);
    - negative log-likelihood quantized PER BIGRAM before the sum (the
      tfidf_search discipline: a double sum's order varies with
      partitioning, an integer sum's doesn't). ln() runs on the identical
      quantized double on both engines, so cross-engine drift is bounded
      to the sub-ulp floor boundary, which the fuzz gate patrols;
    - ppl_bucket = exact ntile(3) over mean-nll order (1=head fluent,
      3=tail noise), the exact CCNet head/middle/tail split — computed
      WITHOUT a global single-task window (round-8 verdict item 3): the
      exact global rank comes from ``ranged_cumsum`` (range-repartition +
      within-range window + broadcast prefix offsets; the
      equidepth_histogram shape) over the unique composite key
      (mean_nll, doc_id), and ntile's bucket-size arithmetic —
      the first N%k buckets take ceil(N/k) rows, the rest floor(N/k) —
      is then a closed-form integer expression of (rank, N). Equality
      with the oracle's real ntile(3) is pinned by the oracle gate.

    Plan shape: bigrams come from one arrays_zip of two slices (scan-side,
    no shuffle); c2 is ONE groupBy over the train bigrams (map-side
    combine), persisted vocab-sized; c1 derives from c2 (no second corpus
    scan); V rides a broadcast crossJoin as a 1-row aggregate. Scoring is
    two keyed equi-joins (w1,w2)/(w1) — broadcastable when the trained
    vocab is bounded, shuffled-but-keyed otherwise — then one groupBy(doc).
    No stage materializes more than one value range per task."""
    from cliqz_etl_spark.operators.cache import track
    from cliqz_etl_spark.operators.stats import ranged_ntile

    docs = _spread_docs(spark, sf_dir, "doc_id", "text")
    base = (docs.where(F.trim(F.col("text")) != "")
            .select("doc_id", T.tokens("text").alias("tk")))
    n = F.size("tk")
    big = (base.where(n >= 2)
           .select("doc_id",
                   F.explode(F.arrays_zip(
                       F.slice("tk", F.lit(1), n - 1).alias("w1"),
                       F.slice("tk", F.lit(2), n - 1).alias("w2"))).alias("bg"))
           .select("doc_id", F.col("bg.w1").alias("w1"),
                   F.col("bg.w2").alias("w2")))
    is_train = md5_long(F.col("doc_id")) % 5 == 0
    c2 = track(big.where(is_train).groupBy("w1", "w2")
               .agg(F.count(F.lit(1)).alias("c2")).persist())
    c1 = c2.groupBy("w1").agg(F.sum("c2").alias("c1"))
    voc = (base.where(is_train).select(F.explode("tk").alias("w"))
           .agg(F.countDistinct("w").cast("long").alias("v")))
    sc = (big.join(c2, ["w1", "w2"], "left")
          .join(c1, ["w1"], "left")
          .crossJoin(F.broadcast(voc))
          .withColumn("ppm", F.expr(
              "((coalesce(c2, 0) + 1) * 1000000) "
              "div (coalesce(c1, 0) + v + 1)").cast("long")))
    nll = F.floor(F.lit(1000) * -F.log(
        F.greatest(F.col("ppm"), F.lit(1)) / F.lit(1000000.0)) + F.lit(0.5)
    ).cast("long")
    per = (sc.groupBy("doc_id")
           .agg(F.count(F.lit(1)).cast("long").alias("n_bigrams"),
                F.sum("ppm").alias("sum_ppm"),
                F.sum(nll).cast("long").alias("nll_milli")))
    # exact ntile(3) without a global window: operators/stats.ranged_ntile
    # over the UNIQUE key (mean_nll, doc_id).
    keyed = per.select(
        "doc_id", "n_bigrams", "sum_ppm", "nll_milli",
        F.expr("nll_milli div n_bigrams").cast("long").alias("__mnd"))
    return (ranged_ntile(keyed, ["__mnd", "doc_id"], 3, "ppl_bucket")
            .select("doc_id", "n_bigrams",
                    F.expr("sum_ppm div n_bigrams").cast("long")
                    .alias("avg_cond_ppm"),
                    "nll_milli", "ppl_bucket"))


# --------------------------------------------------------------------------
# Kneser-Ney bigram model build — the MODEL-side counterpart of
# bigram_lm_score's add-one scorer, and the smoothing every production
# n-gram LM actually ships (KenLM's default). The KN insight is that the
# backoff weight of a word is its CONTINUATION count (how many distinct
# left contexts it follows: "francisco" is frequent but only ever follows
# "san", so its unigram backoff must be tiny), not its raw frequency.
# Emitted per observed bigram with support >= KN_MIN_C2:
#   c2                 raw bigram count
#   n1p_right (of w1)  distinct continuations of the context
#   n1p_left  (of w2)  distinct left contexts of the word
#   pkn_ppm            absolute-discount interpolated probability
#       P_KN(w2|w1) = (c2 - D)/c1 + (D * n1p_right / c1) * (n1p_left / T)
#   with D = 0.75 (exact in binary) and T = total bigram types. The ppm
#   quantization floors ONE identical IEEE double assembled
#   left-associatively from exact BIGINT counts (the token_pmi
#   discipline), so both engines produce the same integer.
# --------------------------------------------------------------------------
KN_MIN_C2 = 3
KN_D = 0.75  # absolute discount; exact in binary, c2 >= 1 keeps c2-D > 0

# the shared FP grammar: one expression tree, interpolated into BOTH
# engines verbatim (only the integer-division spelling differs)
_KN_PPM = ("CAST(floor(1000000 * ((CAST(c2 AS DOUBLE) - {d}) "
           "/ CAST(c1 AS DOUBLE) "
           "+ (({d} * CAST(n1p_right AS DOUBLE)) / CAST(c1 AS DOUBLE)) "
           "* (CAST(n1p_left AS DOUBLE) / CAST(t AS DOUBLE))) + 0.5) "
           "AS BIGINT)").format(d=KN_D)


@query(
    "kn_bigram_model",
    oracle=f"""
    WITH base AS (
        SELECT doc_id, {_DUCK_TOKENS} AS tk FROM documents
        WHERE trim(text) <> ''
    ), big AS (
        SELECT tk[i] AS w1, tk[i + 1] AS w2
        FROM (SELECT doc_id, tk, unnest(range(1, len(tk))) AS i
              FROM base WHERE len(tk) >= 2)
    ), c2t AS (
        SELECT w1, w2, CAST(count(*) AS BIGINT) AS c2
        FROM big GROUP BY w1, w2
    ), left_t AS (
        SELECT w1, CAST(sum(c2) AS BIGINT) AS c1,
               CAST(count(*) AS BIGINT) AS n1p_right
        FROM c2t GROUP BY w1
    ), right_t AS (
        SELECT w2, CAST(count(*) AS BIGINT) AS n1p_left
        FROM c2t GROUP BY w2
    ), tot AS (
        SELECT CAST(count(*) AS BIGINT) AS t FROM c2t
    )
    SELECT c2t.w1 AS w1, c2t.w2 AS w2, c2 AS c2,
           n1p_right AS n1p_right, n1p_left AS n1p_left,
           {_KN_PPM} AS pkn_ppm
    FROM c2t
    JOIN left_t USING (w1) JOIN right_t USING (w2) CROSS JOIN tot
    WHERE c2 >= {KN_MIN_C2}
    """,
)
def kn_bigram_model(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kneser-Ney bigram model table (counts + continuation counts +
    interpolated probability in ppm) over the whole corpus, support
    >= 3.

    Plan shape: bigrams are one scan-side arrays_zip explode; c2 is the
    ONLY corpus-sized shuffle (groupBy(w1, w2), map-side combine), and
    it is persisted because all three derived tables — the context
    table (c1, n1p_right), the continuation table (n1p_left), and the
    1-row type total — are aggregations OVER c2, never a re-scan. The
    final assembly joins model-sized frames on model-sized keys,
    un-hinted (Heaps' law: the bigram-type table of a web corpus is not
    broadcastable; AQE broadcasts it when it measures small). At 100 TB
    this is the KenLM counts pass as one Spark job."""
    from cliqz_etl_spark.operators.cache import track

    docs = _spread_docs(spark, sf_dir, "doc_id", "text")
    base = (docs.where(F.trim(F.col("text")) != "")
            .select("doc_id", T.tokens("text").alias("tk")))
    n = F.size("tk")
    big = (base.where(n >= 2)
           .select(F.explode(F.arrays_zip(
               F.slice("tk", F.lit(1), n - 1).alias("w1"),
               F.slice("tk", F.lit(2), n - 1).alias("w2"))).alias("bg"))
           .select(F.col("bg.w1").alias("w1"), F.col("bg.w2").alias("w2")))
    c2t = track(big.groupBy("w1", "w2")
                .agg(F.count(F.lit(1)).cast("long").alias("c2"))
                .persist())
    left_t = c2t.groupBy("w1").agg(
        F.sum("c2").cast("long").alias("c1"),
        F.count(F.lit(1)).cast("long").alias("n1p_right"))
    right_t = c2t.groupBy("w2").agg(
        F.count(F.lit(1)).cast("long").alias("n1p_left"))
    tot = c2t.agg(F.count(F.lit(1)).cast("long").alias("t"))
    return (c2t.where(F.col("c2") >= KN_MIN_C2)
            .join(left_t, "w1").join(right_t, "w2")
            .crossJoin(F.broadcast(tot))
            .select("w1", "w2", "c2", "n1p_right", "n1p_left",
                    F.expr(_KN_PPM).alias("pkn_ppm")))


# --------------------------------------------------------------------------
# Unicode-script profile: the multilingual-curation gate that runs BEFORE
# language ID (a CJK page should never reach the Latin-ngram scorer, and
# mixed-script spam — Latin words stuffed with CJK SEO filler — shows up
# as no script reaching dominance). Counts per script class by the
# length-difference trick (len(text) - len(text with the class removed)),
# which stays in whole-stage codegen on the Spark side and replays
# identically in DuckDB. Whitespace is the EXPLICIT class [ \t\n\r] —
# regex \s differs between Java (adds \x0B\f) and RE2 (adds \f), so the
# shared grammar pins the exact set. Dominance ties break in fixed
# latin > cjk > digit > space > other order on both engines.
# --------------------------------------------------------------------------
_SCRIPT_CLASSES = [
    ("latin", "[A-Za-z]"),
    ("cjk", "[\\x{4E00}-\\x{9FFF}\\x{3040}-\\x{30FF}]"),
    ("digit", "[0-9]"),
    ("space", "[ \\t\\n\\r]"),
]


def _script_count_sql(cls_re: str) -> str:
    return (f"CAST(length(text) - length(regexp_replace(text, '{cls_re}', '', 'g'))"
            f" AS BIGINT)")


def _dominant_sql() -> str:
    names = [n for n, _ in _SCRIPT_CLASSES] + ["other"]
    arms = []
    for i, n in enumerate(names[:-1]):
        geq = " AND ".join(f"n_{n} >= n_{m}" for m in names if m != n)
        arms.append(f"WHEN {geq} THEN '{n}'")
    return "CASE " + " ".join(arms) + " ELSE 'other' END"


@query(
    "script_mix",
    oracle=f"""
    WITH counts AS (
        SELECT doc_id,
               {_script_count_sql('[A-Za-z]')} AS n_latin,
               {_script_count_sql(_SCRIPT_CLASSES[1][1])} AS n_cjk,
               {_script_count_sql('[0-9]')} AS n_digit,
               {_script_count_sql(_SCRIPT_CLASSES[3][1])} AS n_space,
               CAST(length(text) AS BIGINT) AS n_all
        FROM documents WHERE text IS NOT NULL
    ), named AS (
        SELECT doc_id, n_latin, n_cjk, n_digit, n_space,
               n_all - n_latin - n_cjk - n_digit - n_space AS n_other
        FROM counts
    )
    SELECT doc_id AS doc_id, n_latin, n_cjk, n_digit, n_space, n_other,
           {_dominant_sql()} AS dominant
    FROM named
    """,
)
def script_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document unicode-script histogram + dominant script.

    Plan shape: pure scan-side map work — five regexp_replace/length
    expressions and a CASE chain, all inside one whole-stage-codegen
    span, zero shuffles (the chunk_documents discipline: at 100 TB this
    is embarrassingly parallel and reads only (doc_id, text))."""
    docs = load_table(spark, sf_dir, "documents").where(F.col("text").isNotNull())

    def cnt(cls_re):
        return (F.length("text")
                - F.length(F.regexp_replace("text", cls_re, ""))).cast("long")

    named = docs.select(
        "doc_id",
        cnt("[A-Za-z]").alias("n_latin"),
        cnt("[\\x{4E00}-\\x{9FFF}\\x{3040}-\\x{30FF}]").alias("n_cjk"),
        cnt("[0-9]").alias("n_digit"),
        cnt("[ \\t\\n\\r]").alias("n_space"),
        F.length("text").cast("long").alias("n_all"),
    ).withColumn(
        "n_other",
        F.col("n_all") - F.col("n_latin") - F.col("n_cjk")
        - F.col("n_digit") - F.col("n_space"),
    )
    return named.select("doc_id", "n_latin", "n_cjk", "n_digit", "n_space",
                        "n_other", F.expr(_dominant_sql()).alias("dominant"))


# --------------------------------------------------------------------------
# Naive-Bayes quality classifier — the trainable-model-on-Spark shape
# missing from the curation stack: TRAIN a token model on a labeled slice
# (one groupBy), SCORE the whole corpus (one join + one groupBy). Labels
# are the deterministic Gopher pass/fail (so both engines can replay
# them); the train slice is the md5(doc_id)%5==0 hash selection the
# bigram LM established. Per-token evidence is the add-one-smoothed
# log-likelihood RATIO, one ln() of a ratio of EXACT integer products
# ((c1+1)(t0+V+1) vs (c0+1)(t1+V+1), both < 2^53), milli-quantized
# BEFORE the per-doc sum (the tfidf integer-aggregation discipline).
# Unseen tokens fall out of the same formula with c1 = c0 = 0 via the
# left join's COALESCE. Decision: prior_milli + sum(evidence) > 0.
# --------------------------------------------------------------------------
def _nb_term_sql() -> str:
    return ("CAST(floor(1000 * ln(CAST((COALESCE(c1, 0) + 1) * (t0 + v + 1)"
            " AS DOUBLE) / CAST((COALESCE(c0, 0) + 1) * (t1 + v + 1)"
            " AS DOUBLE)) + 0.5) AS BIGINT)")


def _nb_score_ctes() -> str:
    """The full NB score pipeline as a CTE chain ending in ``scores``
    (doc_id, score_milli, predicted, passes) — shared VERBATIM by the
    classifier query and the PR-curve sweep so the two oracles can never
    drift from each other."""
    return f"""
    {_duck_gopher_base()}
    , labeled AS (
        SELECT b.doc_id, b.tk, COALESCE(({DUCK_GOPHER_RULES}), FALSE) AS y
        FROM base b JOIN m ON m.doc_id = b.doc_id
    ), train AS (
        SELECT * FROM labeled WHERE {md5_long_sql("doc_id")} % 5 = 0
    ), tok_train AS (
        SELECT y, unnest(tk) AS w FROM train
    ), counts AS (
        SELECT w,
               CAST(SUM(CASE WHEN y THEN 1 ELSE 0 END) AS BIGINT) AS c1,
               CAST(SUM(CASE WHEN y THEN 0 ELSE 1 END) AS BIGINT) AS c0
        FROM tok_train GROUP BY w
    ), tot AS (
        SELECT CAST(COALESCE(SUM(c1), 0) AS BIGINT) AS t1,
               CAST(COALESCE(SUM(c0), 0) AS BIGINT) AS t0,
               CAST(COUNT(*) AS BIGINT) AS v
        FROM counts
    ), pr AS (
        SELECT CAST(floor(1000 * ln(
                   CAST(COALESCE(SUM(CASE WHEN y THEN 1 ELSE 0 END), 0) + 1
                        AS DOUBLE)
                   / CAST(COALESCE(SUM(CASE WHEN y THEN 0 ELSE 1 END), 0) + 1
                          AS DOUBLE)) + 0.5) AS BIGINT) AS prior_milli
        FROM train
    ), alltok AS (
        SELECT doc_id, unnest(tk) AS w FROM labeled
    ), evidence AS (
        SELECT a.doc_id, SUM({_nb_term_sql()}) AS ev_milli
        FROM alltok a LEFT JOIN counts c ON c.w = a.w CROSS JOIN tot
        GROUP BY a.doc_id
    ), scores AS (
        SELECT l.doc_id AS doc_id,
               CAST(pr.prior_milli + COALESCE(e.ev_milli, 0) AS BIGINT)
                   AS score_milli,
               (pr.prior_milli + COALESCE(e.ev_milli, 0)) > 0 AS predicted,
               l.y AS passes
        FROM labeled l LEFT JOIN evidence e ON e.doc_id = l.doc_id
        CROSS JOIN pr
    )
    """


@query(
    "nb_quality_classifier",
    oracle=f"""
    {_nb_score_ctes()}
    SELECT doc_id, score_milli, predicted, passes FROM scores
    """,
)
def nb_quality_classifier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Add-one-smoothed Naive Bayes over tokens, trained on the hash
    slice's Gopher labels, scoring every document.

    Plan shape: labels are scan-side expressions (no shuffle); the class-
    conditional counts are ONE groupBy over train tokens (map-side
    combine, vocab-sized result); totals and the class prior ride as
    broadcast 1-row aggregates; scoring is one token equi-join
    (broadcastable at bounded vocab, shuffled-but-keyed otherwise — the
    bigram_lm_score contract) plus one groupBy(doc)."""
    from cliqz_etl_spark.operators.cache import track

    docs = _spread_docs(spark, sf_dir, "doc_id", "text")
    empty = F.trim(F.col("text")) == ""
    toks = F.when(empty, F.array().cast("array<string>")) \
        .otherwise(T.tokens("text"))
    m = gopher_metrics(docs)
    rules = functools.reduce(operator.and_, gopher_rule_cols().values())
    labeled = track(
        m.select("doc_id", "text",
                 F.coalesce(rules, F.lit(False)).alias("y"))
        .select("doc_id", toks.alias("tk"), "y").persist())
    train = labeled.where(md5_long(F.col("doc_id")) % 5 == 0)
    tok_train = train.select("y", F.explode("tk").alias("w"))
    # NOT persisted (round-13 finding): counts feeds the totals aggregate
    # AND the scoring join, but caching it makes AQE lose the runtime
    # broadcast decision on the scoring join (the cached side stops
    # being planned as a broadcast build: measured Exchange appearing in
    # the executed plan, breaching the 0-shuffle budget). The double
    # execution is an explode+groupBy over the already-cached labeled
    # frame — cheaper than a corpus-token shuffle at any scale.
    counts = tok_train.groupBy("w").agg(
        F.sum(F.when(F.col("y"), 1).otherwise(0)).cast("long").alias("c1"),
        F.sum(F.when(F.col("y"), 0).otherwise(1)).cast("long").alias("c0"))
    tot = counts.agg(
        F.coalesce(F.sum("c1"), F.lit(0)).cast("long").alias("t1"),
        F.coalesce(F.sum("c0"), F.lit(0)).cast("long").alias("t0"),
        F.count(F.lit(1)).cast("long").alias("v"))
    pr = train.agg(
        F.floor(F.lit(1000) * F.log(
            (F.coalesce(F.sum(F.when(F.col("y"), 1).otherwise(0)), F.lit(0))
             + 1).cast("double")
            / (F.coalesce(F.sum(F.when(F.col("y"), 0).otherwise(1)), F.lit(0))
               + 1).cast("double")) + F.lit(0.5))
        .cast("long").alias("prior_milli"))
    alltok = labeled.select("doc_id", F.explode("tk").alias("w"))
    evidence = (alltok.join(counts, ["w"], "left")
                .crossJoin(F.broadcast(tot))
                .groupBy("doc_id")
                .agg(F.sum(F.expr(_nb_term_sql())).alias("ev_milli")))
    score = F.col("prior_milli") + F.coalesce(F.col("ev_milli"), F.lit(0))
    return (labeled.select("doc_id", "y")
            .join(evidence, ["doc_id"], "left")
            .crossJoin(F.broadcast(pr))
            .select("doc_id",
                    score.cast("long").alias("score_milli"),
                    (score > 0).alias("predicted"),
                    F.col("y").alias("passes")))


# --------------------------------------------------------------------------
# Classifier operating-point sweep: precision/recall at each candidate
# decision threshold over the NB scores — how a production quality filter
# picks its cutoff before committing a trillion-token filtering run. The
# score pipeline is nb_quality_classifier VERBATIM (shared CTE / shared
# frame), so the sweep can never drift from the classifier it audits.
# Metrics in integer ppm (floor division — exact cross-engine); empty
# denominators yield NULL on both engines.
# --------------------------------------------------------------------------
PR_THRESHOLDS_MILLI = [-2000, -1000, 0, 1000, 2000]


@query(
    "quality_pr_curve",
    oracle=f"""
    {_nb_score_ctes()}
    , thr AS (
        SELECT unnest([{", ".join(str(t) for t in PR_THRESHOLDS_MILLI)}])
            AS thr_milli
    ), conf AS (
        SELECT CAST(thr_milli AS BIGINT) AS thr_milli,
               CAST(SUM(CASE WHEN score_milli > thr_milli AND passes
                        THEN 1 ELSE 0 END) AS BIGINT) AS tp,
               CAST(SUM(CASE WHEN score_milli > thr_milli AND NOT passes
                        THEN 1 ELSE 0 END) AS BIGINT) AS fp,
               CAST(SUM(CASE WHEN score_milli <= thr_milli AND passes
                        THEN 1 ELSE 0 END) AS BIGINT) AS fn,
               CAST(SUM(CASE WHEN score_milli <= thr_milli AND NOT passes
                        THEN 1 ELSE 0 END) AS BIGINT) AS tn
        FROM scores CROSS JOIN thr GROUP BY thr_milli
    )
    SELECT thr_milli, tp, fp, fn, tn,
           CAST(CASE WHEN tp + fp > 0 THEN (1000000 * tp) // (tp + fp)
                END AS BIGINT) AS precision_ppm,
           CAST(CASE WHEN tp + fn > 0 THEN (1000000 * tp) // (tp + fn)
                END AS BIGINT) AS recall_ppm
    FROM conf
    """,
)
def quality_pr_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Precision/recall (ppm) of the NB quality classifier at each
    candidate threshold, against the Gopher labels.

    Plan shape: one NB scoring pass (nb_quality_classifier's own frame),
    cross-joined with the 5-row broadcast threshold list, ONE groupBy
    over 5 keys with map-side combine — the sweep costs one aggregation
    regardless of corpus size, which is why production filter tuning
    sweeps thresholds in a single job instead of re-running the filter
    per cutoff."""
    scores = nb_quality_classifier(spark, sf_dir)
    thr = spark.createDataFrame([(t,) for t in PR_THRESHOLDS_MILLI],
                                "thr_milli long")
    pred = F.col("score_milli") > F.col("thr_milli")
    conf = (scores.crossJoin(F.broadcast(thr))
            .groupBy("thr_milli")
            .agg(F.sum((pred & F.col("passes")).cast("long")).alias("tp"),
                 F.sum((pred & ~F.col("passes")).cast("long")).alias("fp"),
                 F.sum((~pred & F.col("passes")).cast("long")).alias("fn"),
                 F.sum((~pred & ~F.col("passes")).cast("long")).alias("tn")))
    return conf.select(
        "thr_milli", "tp", "fp", "fn", "tn",
        F.expr("CAST(CASE WHEN tp + fp > 0 THEN (1000000 * tp) div (tp + fp)"
               " END AS BIGINT)").alias("precision_ppm"),
        F.expr("CAST(CASE WHEN tp + fn > 0 THEN (1000000 * tp) div (tp + fn)"
               " END AS BIGINT)").alias("recall_ppm"))


# --------------------------------------------------------------------------
# Pointwise mutual information over adjacent token pairs — the collocation
# miner (word2vec-style phrase detection: "new york" scores high because
# its pair count beats the unigram-independence expectation). PMI =
# ln(p(ab) / (p(a)p(b))) with p(ab) over the bigram stream and p(w) over
# the token stream; the ratio is assembled left-associatively from exact
# counts cast to DOUBLE so both engines produce the identical IEEE double
# before the single ln(), then milli-quantized (the bigram_lm discipline).
# Support floor >= 3 keeps the emitted pair set vocabulary-bounded — no
# global ordering anywhere, the compare is order-insensitive.
# --------------------------------------------------------------------------
_PMI_MIN_SUPPORT = 3


@query(
    "token_pmi",
    oracle=f"""
    WITH base AS (
        SELECT doc_id, {_DUCK_TOKENS} AS tk FROM documents
        WHERE trim(text) <> ''
    ), uni AS (
        SELECT w, CAST(count(*) AS BIGINT) AS c
        FROM (SELECT unnest(tk) AS w FROM base) GROUP BY w
    ), n_tok AS (
        SELECT CAST(sum(c) AS BIGINT) AS n_tok FROM uni
    ), big AS (
        SELECT tk[i] AS w1, tk[i + 1] AS w2
        FROM (SELECT tk, unnest(range(1, len(tk))) AS i
              FROM base WHERE len(tk) >= 2)
    ), pairs AS (
        SELECT w1, w2, CAST(count(*) AS BIGINT) AS c_ab
        FROM big GROUP BY w1, w2
        HAVING count(*) >= {_PMI_MIN_SUPPORT}
    ), n_big AS (
        SELECT CAST(count(*) AS BIGINT) AS n_big FROM big
    )
    SELECT p.w1 AS w1, p.w2 AS w2, p.c_ab AS pair_count,
           CAST(floor(1000 * ln(
                 (CAST(p.c_ab AS DOUBLE) * CAST(n_tok AS DOUBLE)
                  * CAST(n_tok AS DOUBLE))
               / (CAST(a.c AS DOUBLE) * CAST(b.c AS DOUBLE)
                  * CAST(n_big AS DOUBLE))) + 0.5) AS BIGINT) AS pmi_milli
    FROM pairs p
    JOIN uni a ON p.w1 = a.w
    JOIN uni b ON p.w2 = b.w
    CROSS JOIN n_tok CROSS JOIN n_big
    """,
)
def token_pmi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Collocations: adjacent-pair PMI, support >= 3, milli-quantized.

    Plan shape: bigrams from one arrays_zip of two slices (scan-side, no
    shuffle); ONE groupBy each for unigram and pair counts (map-side
    combine; pair stream pre-shrunk by the support HAVING before any
    join); unigram table and the two 1-row totals broadcast — at 100 TB
    the Zipf vocabulary bounds every post-aggregate frame, so the only
    data-sized work is the two scan+combine passes."""
    docs = _spread_docs(spark, sf_dir, "doc_id", "text")
    base = (docs.where(F.trim(F.col("text")) != "")
            .select("doc_id", T.tokens("text").alias("tk")))
    n = F.size("tk")
    from cliqz_etl_spark.operators.cache import track

    # ONLY vocab-bounded frames persist: both totals derive from their
    # aggregates (n_tok = sum of unigram counts, n_big = sum of pair
    # counts taken BEFORE the support filter), so the corpus-sized token
    # and bigram streams are each scanned exactly once and never cached
    uni = track(base.select(F.explode("tk").alias("w"))
                .groupBy("w").agg(F.count(F.lit(1)).cast("long").alias("c"))
                .persist())
    n_tok = uni.agg(F.sum("c").cast("long").alias("n_tok"))
    all_pairs = track(
        base.where(n >= 2)
        .select(F.explode(F.arrays_zip(
            F.slice("tk", F.lit(1), n - 1).alias("w1"),
            F.slice("tk", F.lit(2), n - 1).alias("w2"))).alias("bg"))
        .groupBy(F.col("bg.w1").alias("w1"), F.col("bg.w2").alias("w2"))
        .agg(F.count(F.lit(1)).cast("long").alias("c_ab"))
        .persist())
    pairs = all_pairs.where(F.col("c_ab") >= _PMI_MIN_SUPPORT)
    n_big = all_pairs.agg(F.sum("c_ab").cast("long").alias("n_big"))
    ua = uni.select(F.col("w").alias("w1"), F.col("c").alias("c_a"))
    ub = uni.select(F.col("w").alias("w2"), F.col("c").alias("c_b"))
    ratio = ((F.col("c_ab").cast("double") * F.col("n_tok").cast("double")
              * F.col("n_tok").cast("double"))
             / (F.col("c_a").cast("double") * F.col("c_b").cast("double")
                * F.col("n_big").cast("double")))
    # vocab joins un-hinted (round-11): at corpus scale the unigram table
    # is NOT broadcastable — a forced hint would OOM the driver at 100 TB
    # while AQE already broadcasts it at runtime whenever it measures
    # small; only the provably 1-row totals keep explicit hints
    return (pairs.join(ua, "w1")
            .join(ub, "w2")
            .crossJoin(F.broadcast(n_tok))
            .crossJoin(F.broadcast(n_big))
            .select("w1", "w2", F.col("c_ab").alias("pair_count"),
                    F.floor(F.lit(1000) * F.log(ratio) + F.lit(0.5))
                    .cast("long").alias("pmi_milli")))


# --------------------------------------------------------------------------
# One BPE merge round — the tokenizer-training primitive: count adjacent
# symbol pairs across the (weighted) vocabulary, pick the most frequent
# pair (ties to the lexicographically LARGEST pair, a total order both
# engines share), merge it everywhere, and emit the post-merge pair
# counts. The whole round is vocabulary-sized after one corpus
# tokenization pass: pair counting, the 1-row argmax, and the re-merge
# all run over the distinct-word frame weighted by word frequency —
# exactly how production BPE trainers scale (corpus touched once per
# vocab rebuild, never once per merge). Words are restricted to ascii
# [a-z]+ so the char-split regex behaves identically across engines'
# unicode models; the merge uses the doubled-space trick so CONSECUTIVE
# occurrences of the chosen pair ("a b a b") merge in one pass with
# plain left-to-right non-overlapping replace on both engines.
# --------------------------------------------------------------------------
_BPE_MIN_CNT = 5
# adjacent (pa, pb) pairs from a symbol array `{e}` — 0-based on Spark;
# a fully-merged single-symbol word yields a NULL pb, filtered out (the
# DuckDB twin's range(1, 1) is simply empty)
_BPE_PAIRS_SPARK = (
    "filter(transform(sequence(1, greatest(size({e}) - 1, 1)), "
    "i -> struct({e}[i-1] AS pa, {e}[i] AS pb)), p -> p.pb IS NOT NULL)"
)


@query(
    "bpe_merge_step",
    oracle=f"""
    WITH w AS (
        SELECT t AS word, CAST(count(*) AS BIGINT) AS cnt
        FROM (SELECT unnest(string_split_regex(trim(text), '\\s+')) AS t
              FROM documents WHERE text IS NOT NULL)
        WHERE regexp_matches(t, '^[a-z]+$') AND len(t) >= 2
        GROUP BY 1
    ), sym AS (
        SELECT trim(regexp_replace(word, '(.)', '\\1 ', 'g')) AS s, cnt
        FROM w
    ), p1 AS (
        SELECT string_split(pr, ' ')[1] AS pa, string_split(pr, ' ')[2] AS pb,
               CAST(SUM(cnt) AS BIGINT) AS c
        FROM (SELECT unnest(list_transform(
                  range(1, len(string_split(s, ' '))),
                  i -> string_split(s, ' ')[i] || ' '
                       || string_split(s, ' ')[i + 1])) AS pr, cnt
              FROM sym)
        GROUP BY 1, 2
    ), top AS (
        SELECT pa AS tpa, pb AS tpb FROM p1
        ORDER BY c DESC, pa DESC, pb DESC LIMIT 1
    ), merged AS (
        SELECT trim(replace(' ' || replace(s, ' ', '  ') || ' ',
                            ' ' || tpa || '  ' || tpb || ' ',
                            ' ' || tpa || tpb || ' ')) AS s2, cnt
        FROM sym CROSS JOIN top
    ), p2 AS (
        SELECT string_split(pr, ' ')[1] AS sym_a,
               string_split(pr, ' ')[2] AS sym_b,
               CAST(SUM(cnt) AS BIGINT) AS cnt
        FROM (SELECT unnest(list_transform(
                  range(1, len(string_split_regex(s2, ' +'))),
                  i -> string_split_regex(s2, ' +')[i] || ' '
                       || string_split_regex(s2, ' +')[i + 1])) AS pr, cnt
              FROM merged)
        GROUP BY 1, 2
    )
    SELECT sym_a, sym_b, cnt FROM p2 WHERE cnt >= {_BPE_MIN_CNT}
    """,
)
def bpe_merge_step(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Post-merge adjacent-pair counts after one BPE merge over the
    ascii-word vocabulary (pairs with weight >= {5} survive).

    Plan shape: ONE corpus tokenization pass collapses to the weighted
    word-frequency frame (the only data-sized aggregate); the symbol
    split, both pair counts, and the merge are vocabulary-sized, and the
    chosen pair is a 1-row broadcast. A full trainer loops this round
    with the vocab frame persisted — each extra merge costs vocab-sized
    work only, the property that makes BPE trainable on a 100 TB corpus
    (the corpus is re-read never, the vocab re-walked per merge)."""
    from cliqz_etl_spark.operators.dedup import _materialize

    docs = load_table(spark, sf_dir, "documents")
    w = (docs.where(F.col("text").isNotNull())
         .select(F.explode(T.tokens("text")).alias("word"))
         .where(F.col("word").rlike("^[a-z]+$") & (F.length("word") >= 2))
         .groupBy("word").agg(F.count(F.lit(1)).cast("long").alias("cnt")))
    sym = _materialize(
        w.select(F.trim(F.regexp_replace("word", "(.)", "$1 ")).alias("s"),
                 "cnt"))
    p1 = (sym.withColumn("e", F.split("s", " "))
          .select(F.explode(F.expr(_BPE_PAIRS_SPARK.format(e="e")))
                  .alias("pr"), "cnt")
          .groupBy(F.col("pr.pa").alias("pa"), F.col("pr.pb").alias("pb"))
          .agg(F.sum("cnt").cast("long").alias("c")))
    top = (p1.agg(F.max(F.struct("c", "pa", "pb")).alias("t"))
           .select(F.col("t.pa").alias("tpa"), F.col("t.pb").alias("tpb")))
    merged = (sym.crossJoin(F.broadcast(top))
              .select(F.trim(F.expr(
                  "replace(' ' || replace(s, ' ', '  ') || ' ', "
                  "' ' || tpa || '  ' || tpb || ' ', "
                  "' ' || tpa || tpb || ' ')")).alias("s2"), "cnt"))
    return (merged.withColumn("e", F.split("s2", " +"))
            .select(F.explode(F.expr(_BPE_PAIRS_SPARK.format(e="e")))
                    .alias("pr"), "cnt")
            .groupBy(F.col("pr.pa").alias("sym_a"),
                     F.col("pr.pb").alias("sym_b"))
            .agg(F.sum("cnt").cast("long").alias("cnt"))
            .where(F.col("cnt") >= _BPE_MIN_CNT))


# --------------------------------------------------------------------------
# Calibration curve (reliability diagram) for the NB quality classifier:
# scores bucket into fixed 1000-milli bins and each bin reports its
# observed pass rate — the "is a 0.8 score right 80% of the time" audit
# that PR curves (threshold-global) cannot answer. Fixed bin EDGES (not
# quantiles) make the per-bin counts a commutative monoid — partial
# aggregation, mergeable across any partitioning, the same property the
# streaming drift monitor exploits. Mean score per bin is integer
# round-half-up over the exact milli sum; rates are exact integer ppm.
# --------------------------------------------------------------------------
_CAL_BIN = ("CAST(least(9, greatest(0, (score_milli + 5000) // 1000)) "
            "AS BIGINT)")
_CAL_BIN_SPARK = ("CAST(least(9, greatest(0, (score_milli + 5000) div 1000))"
                  " AS BIGINT)")


@query(
    "calibration_curve",
    oracle=f"""
    {_nb_score_ctes()}
    , binned AS (
        SELECT {_CAL_BIN} AS bin,
               score_milli,
               CASE WHEN passes THEN 1 ELSE 0 END AS y
        FROM scores
    )
    SELECT bin,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(SUM(y) AS BIGINT) AS n_pass,
           CAST(floor(CAST(SUM(score_milli) AS DOUBLE)
                      / CAST(count(*) AS DOUBLE) + 0.5)
                AS BIGINT) AS mean_score_milli,
           CAST((1000000 * SUM(y)) // count(*) AS BIGINT) AS pass_rate_ppm
    FROM binned GROUP BY 1
    """,
)
def calibration_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reliability diagram of the NB quality score: per fixed score bin,
    the document count, observed Gopher-pass count, mean score (milli),
    and pass rate (ppm).

    Plan shape: the NB scoring pass (nb_quality_classifier's frame) plus
    ONE groupBy over <= 10 fixed bins with map-side combine — like the
    PR sweep, the audit costs one aggregation at any corpus size, and
    fixed bin edges keep the histogram mergeable (the monitoring-path
    property: per-batch partials sum)."""
    scores = nb_quality_classifier(spark, sf_dir)
    binned = scores.select(
        F.expr(_CAL_BIN_SPARK).alias("bin"), "score_milli",
        F.when(F.col("passes"), 1).otherwise(0).alias("y"))
    return (binned.groupBy("bin")
            .agg(F.count(F.lit(1)).cast("long").alias("n_docs"),
                 F.sum("y").cast("long").alias("n_pass"),
                 F.sum("score_milli").cast("long").alias("s"))
            .select("bin", "n_docs", "n_pass",
                    # floor-double shared tree, NOT integer division: the
                    # milli sum can be negative, where DuckDB's // floors
                    # but Spark's div truncates toward zero
                    F.expr("CAST(floor(CAST(s AS DOUBLE) "
                           "/ CAST(n_docs AS DOUBLE) + 0.5) AS BIGINT)")
                    .alias("mean_score_milli"),
                    F.expr("CAST((1000000 * n_pass) div n_docs AS BIGINT)")
                    .alias("pass_rate_ppm")))


# --------------------------------------------------------------------------
# TextRank keyword extraction — PageRank over the word co-occurrence
# graph (Mihalcea & Tarau 2004), composed from the engine's own
# integer-exact pagerank operator: ascii words (len >= 4, the stopword
# heuristic) link when adjacent, edges keep corpus support >= 3 (the
# token_pmi floor — bounds the graph by the collocation vocabulary),
# and three floor-division PageRank iterations run bit-identically on
# both engines. Words ride as 60-bit md5 ids through the rank
# recurrence (8-byte shuffle keys, engine-portable) and join back to
# strings only for the top-20 report — which is a distributed
# TakeOrdered, never a global sort.
# --------------------------------------------------------------------------
_TR_ITER = 3
_TR_SCALE = 1_000_000
_TR_BASE = (_TR_SCALE * 15) // 100
_TR_TOP = 20
_TR_MIN_SUPPORT = 3


def _textrank_oracle() -> str:
    word = "w"
    head = f"""
    WITH tk AS (
        SELECT string_split_regex(trim(text), '\\s+') AS t FROM documents
        WHERE text IS NOT NULL AND trim(text) <> ''
    ), adj AS (
        SELECT t[i] AS w1, t[i + 1] AS w2
        FROM (SELECT t, unnest(range(1, len(t))) AS i FROM tk
              WHERE len(t) >= 2)
        WHERE regexp_matches(t[i], '^[a-z]{{4,}}$')
          AND regexp_matches(t[i + 1], '^[a-z]{{4,}}$')
          AND t[i] <> t[i + 1]
    ), sup AS (
        SELECT w1, w2 FROM adj GROUP BY 1, 2
        HAVING count(*) >= {_TR_MIN_SUPPORT}
    ), e AS (
        SELECT {md5_long_sql('w1')} AS src, {md5_long_sql('w2')} AS dst
        FROM sup
        UNION
        SELECT {md5_long_sql('w2')}, {md5_long_sql('w1')} FROM sup
    ), deg AS (SELECT src, COUNT(*) AS d FROM e GROUP BY 1),
    nodes AS (SELECT DISTINCT src AS node FROM e),
    words AS (
        SELECT DISTINCT {word} AS word, {md5_long_sql(word)} AS node
        FROM (SELECT w1 AS {word} FROM sup UNION SELECT w2 FROM sup)
    ), r0 AS (
        SELECT node, CAST({_TR_SCALE} AS BIGINT) AS rank FROM nodes
    )"""
    parts = [head]
    for i in range(1, _TR_ITER + 1):
        parts.append(f"""
    , c{i} AS (
        SELECT e.dst AS node, SUM(r{i - 1}.rank // deg.d) AS s
        FROM e JOIN r{i - 1} ON r{i - 1}.node = e.src
        JOIN deg ON deg.src = e.src GROUP BY 1
    ), r{i} AS (
        SELECT n.node,
               CAST({_TR_BASE} + (85 * COALESCE(c{i}.s, 0)) // 100
                    AS BIGINT) AS rank
        FROM nodes n LEFT JOIN c{i} ON c{i}.node = n.node
    )""")
    return "".join(parts) + f"""
    SELECT CAST(ROW_NUMBER() OVER (ORDER BY r.rank DESC, w.word ASC)
                AS BIGINT) AS rnk,
           w.word AS word, r.rank AS rank_micro
    FROM r{_TR_ITER} r JOIN words w ON w.node = r.node
    ORDER BY r.rank DESC, w.word ASC LIMIT {_TR_TOP}
    """


@query("textrank_keywords", oracle=_textrank_oracle())
def textrank_keywords(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 TextRank keywords: three integer-exact PageRank iterations
    over the support-filtered adjacency graph of long ascii words.

    Plan shape: one tokenization pass collapses to the supported pair
    set (vocabulary-bounded); the symmetric md5-keyed edge list drives
    operators/graph.py::pagerank (per iteration: one persisted-edge
    join, one partial-agg groupBy, one re-seed left join); the report is
    a TakeOrderedAndProject over the vocabulary-sized rank frame plus a
    20-row window for the rank numbers. Word strings never enter the
    iteration — only 8-byte hash keys shuffle."""
    from cliqz_etl_spark.operators.dedup import _materialize
    from cliqz_etl_spark.operators.graph import pagerank

    docs = load_table(spark, sf_dir, "documents")
    tk = (docs.where(F.col("text").isNotNull()
                     & (F.trim(F.col("text")) != ""))
          .select(T.tokens("text").alias("t")))
    adj = (tk.where(F.size("t") >= 2)
           .select(F.explode(F.expr(
               "transform(sequence(1, size(t) - 1), "
               "i -> struct(t[i-1] AS w1, t[i] AS w2))")).alias("p"))
           .select("p.w1", "p.w2")
           .where(F.col("w1").rlike("^[a-z]{4,}$")
                  & F.col("w2").rlike("^[a-z]{4,}$")
                  & (F.col("w1") != F.col("w2"))))
    sup = _materialize(
        adj.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c"))
        .where(F.col("c") >= _TR_MIN_SUPPORT).select("w1", "w2"))
    e = (sup.select(md5_long("w1").alias("src"), md5_long("w2").alias("dst"))
         .union(sup.select(md5_long("w2").alias("src"),
                           md5_long("w1").alias("dst"))).distinct())
    # e carries its own distinct() above, so the operator's defensive
    # one would duplicate that shuffle
    ranks = pagerank(e, _TR_ITER, scale=_TR_SCALE, assume_distinct=True)
    words = (sup.select(F.col("w1").alias("word"))
             .union(sup.select(F.col("w2").alias("word"))).distinct()
             .select("word", md5_long("word").alias("node")))
    top = (ranks.join(words, "node")
           .orderBy(F.desc("rank"), F.asc("word")).limit(_TR_TOP))
    wr = Window.orderBy(F.desc("rank"), F.asc("word"))
    return (top.withColumn("rnk", F.row_number().over(wr).cast("long"))
            .select("rnk", "word", F.col("rank").alias("rank_micro")))


# --------------------------------------------------------------------------
# Negative-sampling distribution — word2vec's unigram^0.75 table: the
# probability each word is drawn as a negative, over the frequent
# vocabulary. The 0.75 power is a double, so each word's weight
# quantizes to an exact milli integer BEFORE the normalizing sum (a
# double total over the vocabulary would be partition-order-dependent);
# shares are then exact integer ppb of the integer total.
# --------------------------------------------------------------------------
_NEG_MIN_COUNT = 50


@query(
    "negative_sampling_table",
    oracle=f"""
    WITH uni AS (
        SELECT w AS word, CAST(count(*) AS BIGINT) AS c
        FROM (SELECT unnest(string_split_regex(trim(text), '\\s+')) AS w
              FROM documents WHERE text IS NOT NULL)
        GROUP BY 1 HAVING count(*) >= {_NEG_MIN_COUNT}
    ), q AS (
        SELECT word, c,
               CAST(floor(pow(CAST(c AS DOUBLE), 0.75) * 1000 + 0.5)
                    AS BIGINT) AS q_milli
        FROM uni
    ), t AS (SELECT CAST(SUM(q_milli) AS BIGINT) AS tot FROM q)
    SELECT word, c AS n_occurrences, q_milli,
           CAST((q_milli * 1000000000) // t.tot AS BIGINT) AS share_ppb
    FROM q CROSS JOIN t
    """,
)
def negative_sampling_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unigram^0.75 negative-sampling shares (ppb) over words with
    >= 50 occurrences.

    Plan shape: one tokenization aggregate (map-side combine) to the
    frequent vocabulary, per-word weight quantization scan-side, the
    1-row integer total broadcast back — nothing after the unigram
    count is data-sized. pow() runs once per vocabulary word on
    identical integer inputs, so the doubles agree cross-engine."""
    from cliqz_etl_spark.operators.dedup import _materialize

    docs = load_table(spark, sf_dir, "documents")
    uni = (docs.where(F.col("text").isNotNull())
           .select(F.explode(T.tokens("text")).alias("word"))
           .groupBy("word").agg(F.count(F.lit(1)).cast("long").alias("c"))
           .where(F.col("c") >= _NEG_MIN_COUNT))
    q = _materialize(uni.select(
        "word", "c",
        F.expr("CAST(floor(pow(CAST(c AS DOUBLE), 0.75) * 1000 + 0.5) "
               "AS BIGINT)").alias("q_milli")))
    t = q.agg(F.sum("q_milli").cast("long").alias("tot"))
    return (q.crossJoin(F.broadcast(t))
            .select("word", F.col("c").alias("n_occurrences"), "q_milli",
                    F.expr("CAST((q_milli * 1000000000) div tot AS BIGINT)")
                    .alias("share_ppb")))


# --------------------------------------------------------------------------
# Per-language Zipf-law fit — the corpus-health diagnostic a pretraining
# pipeline runs per crawl slice: natural text follows freq ~ rank^(-s)
# with s near 1; machine-generated or boilerplate-heavy slices bend the
# line. OLS of ln(freq) on ln(rank) over the TOP-ZIPF_RANK_CAP head per
# language (the standard fit window — the tail is dominated by
# hapax-count noise). Determinism discipline: rank ties break on the
# word; ln() values milli-quantize PER WORD before any cross-row sum
# (the bigram-LM rule: a double sum's value depends on partition order,
# an integer sum's doesn't); the cap bounds every per-lang moment so
# the n-scaled OLS numerators stay in BIGINT with orders of magnitude
# to spare; the two final divisions are single shared double trees.
# The per-lang rank does NOT use a data-sized window: it rides one
# ranged_cumsum over (lang, -freq, word) — vocabulary-sized, already
# sublinear in the corpus by Heaps' law — plus a |langs|-row offset
# join, so no single task ever holds a language's whole vocabulary.
# --------------------------------------------------------------------------
ZIPF_RANK_CAP = 300

_ZIPF_XM = "CAST(floor(1000 * ln(CAST(rank AS DOUBLE)) + 0.5) AS BIGINT)"
_ZIPF_YM = "CAST(floor(1000 * ln(CAST(n AS DOUBLE)) + 0.5) AS BIGINT)"
_ZIPF_SLOPE = ("CAST(floor(1000.0 * (n_w * sxy - sx * sy)"
               " / (n_w * sxx - sx * sx) + 0.5) AS BIGINT)")
_ZIPF_R2 = ("CAST(floor(1000.0"
            " * (CAST(n_w * sxy - sx * sy AS DOUBLE)"
            "    * CAST(n_w * sxy - sx * sy AS DOUBLE))"
            " / (CAST(n_w * sxx - sx * sx AS DOUBLE)"
            "    * CAST(n_w * syy - sy * sy AS DOUBLE)) + 0.5) AS BIGINT)")


@query(
    "zipf_fit",
    oracle=f"""
    WITH tok AS (
        SELECT lang, unnest(string_split_regex(trim(text), '\\s+')) AS w
        FROM documents WHERE lang IS NOT NULL AND trim(text) <> ''
    ), vocab AS (
        SELECT lang, w, CAST(count(*) AS BIGINT) AS n
        FROM tok WHERE w <> '' GROUP BY 1, 2
    ), ranked AS (
        SELECT lang, n,
               ROW_NUMBER() OVER (PARTITION BY lang
                                  ORDER BY n DESC, w ASC) AS rank
        FROM vocab
    ), head AS (
        SELECT lang, {_ZIPF_XM} AS xm, {_ZIPF_YM} AS ym
        FROM ranked WHERE rank <= {ZIPF_RANK_CAP}
    ), moments AS (
        SELECT lang,
               CAST(count(*) AS BIGINT) AS n_w,
               CAST(SUM(xm) AS BIGINT) AS sx,
               CAST(SUM(ym) AS BIGINT) AS sy,
               CAST(SUM(xm * ym) AS BIGINT) AS sxy,
               CAST(SUM(xm * xm) AS BIGINT) AS sxx,
               CAST(SUM(ym * ym) AS BIGINT) AS syy
        FROM head GROUP BY 1
    )
    SELECT lang AS lang, n_w AS n_head_words,
           {_ZIPF_SLOPE} AS slope_milli,
           {_ZIPF_R2} AS r2_milli
    FROM moments
    WHERE n_w >= 3 AND n_w * sxx - sx * sx > 0 AND n_w * syy - sy * sy > 0
    """,
    doc=f"Zipf exponent (OLS slope of ln freq on ln rank, top "
        f"{ZIPF_RANK_CAP} words) and fit r^2 per language.",
)
def zipf_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Languages with a degenerate head (under 3 distinct words, or zero
    variance in either coordinate — every head word tied at one
    frequency) are excluded on both engines rather than emitting a
    0/0. NULL-lang documents are out of scope: a fit for 'language
    unknown' mixes incomparable vocabularies (and the offset join would
    drop the NULL key asymmetrically)."""
    from cliqz_etl_spark.operators.dedup import _materialize
    from cliqz_etl_spark.operators.stats import ranged_cumsum

    docs = load_table(spark, sf_dir, "documents")
    vocab = (docs.where(F.col("lang").isNotNull()
                        & (F.trim(F.col("text")) != ""))
             .select("lang", F.explode(T.tokens("text")).alias("w"))
             .where(F.col("w") != "")
             .groupBy("lang", "w")
             .agg(F.count(F.lit(1)).cast("long").alias("n")))
    ranked = ranged_cumsum(
        vocab.withColumn("negf", -F.col("n")).withColumn("one", F.lit(1)),
        ["lang", "negf", "w"], ["one"])
    ranked = _materialize(ranked.select("lang", "n", "w",
                                        F.col("cum_one").alias("cum")))
    offsets = ranked.groupBy("lang").agg(F.min("cum").alias("mincum"))
    head = (ranked.join(F.broadcast(offsets), "lang")
            .withColumn("rank", F.col("cum") - F.col("mincum") + 1)
            .where(F.col("rank") <= ZIPF_RANK_CAP)
            .select("lang", F.expr(_ZIPF_XM).alias("xm"),
                    F.expr(_ZIPF_YM).alias("ym")))
    moments = head.groupBy("lang").agg(
        F.count(F.lit(1)).cast("long").alias("n_w"),
        F.sum("xm").cast("long").alias("sx"),
        F.sum("ym").cast("long").alias("sy"),
        F.sum(F.col("xm") * F.col("ym")).cast("long").alias("sxy"),
        F.sum(F.col("xm") * F.col("xm")).cast("long").alias("sxx"),
        F.sum(F.col("ym") * F.col("ym")).cast("long").alias("syy"))
    return (moments
            .where((F.col("n_w") >= 3)
                   & (F.col("n_w") * F.col("sxx") - F.col("sx") * F.col("sx") > 0)
                   & (F.col("n_w") * F.col("syy") - F.col("sy") * F.col("sy") > 0))
            .select("lang", F.col("n_w").alias("n_head_words"),
                    F.expr(_ZIPF_SLOPE).alias("slope_milli"),
                    F.expr(_ZIPF_R2).alias("r2_milli")))


# --------------------------------------------------------------------------
# Cohen's kappa between two deterministic quality raters — the
# inter-annotator-agreement audit a labeling pipeline runs before
# trusting a cheap filter as a proxy for an expensive one. Rater A is
# the Gopher composite filter; rater B is the text_quality heuristic at
# a fixed threshold. Kappa corrects raw agreement for chance:
#   kappa = (N*(a+d) - pe_scaled) / (N^2 - pe_scaled),
#   pe_scaled = (a+b)(a+c) + (c+d)(b+d)
# over the exact 2x2 contingency counts (a=both pass, d=both reject) —
# all integer until ONE shared double division, milli-quantized
# round-half-up (kappa can be negative; floor(x+0.5) is the same
# round-half-up on both engines). Unscorable documents (NULL text ->
# NULL verdicts) count as rejections on both sides — the
# curation_funnel coalesce(rule, FALSE) discipline — so the raters are
# total functions and N is the corpus size.
# --------------------------------------------------------------------------
KAPPA_Q_THRESH = 5000    # rater B: quality_x10k >= 0.5


@query(
    "rater_agreement_kappa",
    oracle=f"""
    {_duck_gopher_base()}
    , q AS (
        SELECT doc_id,
               CAST(floor((0.4 * least(1.0, CAST({_DUCK_NTOK} AS DOUBLE) / 64.0)
                   + 0.4 * least(1.0, (CASE WHEN CAST({_DUCK_NTOK} AS DOUBLE) > 0
                                            THEN CAST({_duck_stop_hits('en')} AS DOUBLE)
                                                 / CAST({_DUCK_NTOK} AS DOUBLE)
                                            ELSE 0.0 END) * 5.0)
                   + 0.2 * (1.0 - {_DUCK_PUNCT})) * 10000 + 0.5) AS BIGINT)
                   AS quality_x10k
        FROM documents
    ), verdicts AS (
        SELECT m.doc_id,
               COALESCE(({DUCK_GOPHER_RULES}), FALSE) AS pa,
               COALESCE(q.quality_x10k >= {KAPPA_Q_THRESH}, FALSE) AS pb
        FROM m JOIN q USING (doc_id)
    ), cell AS (
        SELECT CAST(COUNT(*) FILTER (WHERE pa AND pb) AS BIGINT) AS a,
               CAST(COUNT(*) FILTER (WHERE pa AND NOT pb) AS BIGINT) AS b,
               CAST(COUNT(*) FILTER (WHERE NOT pa AND pb) AS BIGINT) AS c,
               CAST(COUNT(*) FILTER (WHERE NOT pa AND NOT pb) AS BIGINT) AS d
        FROM verdicts
    )
    SELECT a + b + c + d AS n_docs,
           a + d AS n_agree,
           a + b AS n_pass_gopher,
           a + c AS n_pass_quality,
           CASE WHEN (a + b) * (a + c) + (c + d) * (b + d)
                     = (a + b + c + d) * (a + b + c + d) THEN NULL
                ELSE CAST(floor(1000.0
                    * ((a + b + c + d) * (a + d)
                       - ((a + b) * (a + c) + (c + d) * (b + d)))
                    / (CAST(a + b + c + d AS DOUBLE) * (a + b + c + d)
                       - ((a + b) * (a + c) + (c + d) * (b + d))) + 0.5)
                    AS BIGINT) END AS kappa_milli
    FROM cell
    """,
    doc="Cohen's kappa (milli) between the Gopher filter and the "
        "text_quality threshold rater over the document corpus.",
)
def rater_agreement_kappa(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Plan shape: ONE documents scan computes both raters inside
    whole-stage codegen (gopher_metrics keeps text, so the quality
    heuristic rides the same projection); the contingency table is a
    1-row aggregate. N^2 enters double space before the kappa division,
    so the envelope is the double mantissa (~9e15 docs), not BIGINT."""
    m = gopher_metrics(_spread_docs(spark, sf_dir, "doc_id", "text"))
    rules = gopher_rule_cols()
    pa = F.coalesce(functools.reduce(operator.and_, rules.values()),
                    F.lit(False))
    pb = F.coalesce(
        F.floor(T.quality_score("text") * 10000 + 0.5).cast("long")
        >= KAPPA_Q_THRESH, F.lit(False))
    cell = m.select(pa.alias("pa"), pb.alias("pb")).agg(
        F.count(F.when(F.col("pa") & F.col("pb"), True)).cast("long").alias("a"),
        F.count(F.when(F.col("pa") & ~F.col("pb"), True)).cast("long").alias("b"),
        F.count(F.when(~F.col("pa") & F.col("pb"), True)).cast("long").alias("c"),
        F.count(F.when(~F.col("pa") & ~F.col("pb"), True)).cast("long").alias("d"))
    return cell.select(
        (F.col("a") + F.col("b") + F.col("c") + F.col("d")).alias("n_docs"),
        (F.col("a") + F.col("d")).alias("n_agree"),
        (F.col("a") + F.col("b")).alias("n_pass_gopher"),
        (F.col("a") + F.col("c")).alias("n_pass_quality"),
        F.expr(
            "CASE WHEN (a + b) * (a + c) + (c + d) * (b + d)"
            "          = (a + b + c + d) * (a + b + c + d) THEN NULL"
            " ELSE CAST(floor(1000.0"
            " * ((a + b + c + d) * (a + d)"
            "    - ((a + b) * (a + c) + (c + d) * (b + d)))"
            " / (CAST(a + b + c + d AS DOUBLE) * (a + b + c + d)"
            "    - ((a + b) * (a + c) + (c + d) * (b + d))) + 0.5)"
            " AS BIGINT) END").alias("kappa_milli"))


# --------------------------------------------------------------------------
# Chi-square keyword selection against the Gopher label — the supervised
# feature screen a filter-training pipeline runs to see WHICH tokens
# separate passing from failing documents (the fasttext-filter
# bootstrap: mine the discriminative vocabulary, then train on it).
# Per token, the 2x2 presence-vs-label table collapses to (a = passing
# docs containing t, b = failing docs containing t) plus the global
# (P, F) totals, and
#   chi2 = N * (aF - bP)^2 / ((a+b)(N-a-b) P F)
# — the cross term aF - bP is an exact BIGINT; it enters double space
# squared inside ONE shared expression tree (the kappa envelope note:
# the guard is the double mantissa, not BIGINT). Support floor
# CHI2_MIN_DF bounds the emitted vocabulary; all-token docs (a+b = N)
# and single-class corpora (P = 0 or F = 0) are excluded on both
# engines — their chi2 is undefined.
# --------------------------------------------------------------------------
CHI2_MIN_DF = 5


@query(
    "token_chi2_keywords",
    oracle=f"""
    {_duck_gopher_base()}
    , lab AS (
        SELECT m.doc_id, COALESCE(({DUCK_GOPHER_RULES}), FALSE) AS pa FROM m
    ), tot AS (
        SELECT CAST(COUNT(*) FILTER (WHERE pa) AS BIGINT) AS p,
               CAST(COUNT(*) FILTER (WHERE NOT pa) AS BIGINT) AS f
        FROM lab
    ), pres AS (
        SELECT DISTINCT doc_id, w
        FROM (SELECT doc_id, unnest({_DUCK_TOKENS}) AS w
              FROM documents WHERE trim(text) <> '')
        WHERE w <> ''
    ), cnt AS (
        SELECT pr.w,
               CAST(COUNT(*) FILTER (WHERE l.pa) AS BIGINT) AS a,
               CAST(COUNT(*) FILTER (WHERE NOT l.pa) AS BIGINT) AS b
        FROM pres pr JOIN lab l USING (doc_id) GROUP BY pr.w
    )
    SELECT w AS term, a AS df_pass, b AS df_fail,
           CAST(floor(1000.0 * (p + f)
               * (CAST(a * f - b * p AS DOUBLE)
                  * CAST(a * f - b * p AS DOUBLE))
               / (CAST(a + b AS DOUBLE) * (p + f - a - b) * p * f) + 0.5)
               AS BIGINT) AS chi2_milli
    FROM cnt CROSS JOIN tot
    WHERE a + b >= {CHI2_MIN_DF} AND a + b < p + f AND p > 0 AND f > 0
    """,
    doc="Per-token chi-square association with the Gopher pass/fail "
        f"label (presence counts, support >= {CHI2_MIN_DF}).",
)
def token_chi2_keywords(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Plan shape: the label frame is scan-side (gopher's projection);
    presence is ONE distinct over the exploded tokens; the label join is
    doc-keyed and the chi2 arithmetic runs on the vocabulary-sized count
    frame against a broadcast 1-row total."""
    m = gopher_metrics(_spread_docs(spark, sf_dir, "doc_id", "text"))
    rules = gopher_rule_cols()
    lab = m.select(
        "doc_id",
        F.coalesce(functools.reduce(operator.and_, rules.values()),
                   F.lit(False)).alias("pa"))
    from cliqz_etl_spark.operators.dedup import _materialize

    lab = _materialize(lab)
    tot = lab.agg(
        F.count(F.when(F.col("pa"), True)).cast("long").alias("p"),
        F.count(F.when(~F.col("pa"), True)).cast("long").alias("f"))
    docs = load_table(spark, sf_dir, "documents")
    # round-13: per-doc de-dup is array_distinct scan-side — (doc_id, w)
    # duplicates can only arise WITHIN a document (docs is doc-grain),
    # so the corpus-token-sized distinct() shuffle bought nothing the
    # array form doesn't (guide §2.4: a distinct on already-unique data
    # is an accidental exchange)
    pres = (docs.where(F.trim(F.col("text")) != "")
            .select("doc_id",
                    F.explode(F.array_distinct(T.tokens("text"))).alias("w"))
            .where(F.col("w") != ""))
    cnt = (pres.join(lab, "doc_id")
           .groupBy("w")
           .agg(F.count(F.when(F.col("pa"), True)).cast("long").alias("a"),
                F.count(F.when(~F.col("pa"), True)).cast("long").alias("b")))
    chi2 = ("CAST(floor(1000.0 * (p + f)"
            " * (CAST(a * f - b * p AS DOUBLE)"
            "    * CAST(a * f - b * p AS DOUBLE))"
            " / (CAST(a + b AS DOUBLE) * (p + f - a - b) * p * f) + 0.5)"
            " AS BIGINT)")
    return (cnt.crossJoin(F.broadcast(tot))
            .where((F.col("a") + F.col("b") >= CHI2_MIN_DF)
                   & (F.col("a") + F.col("b") < F.col("p") + F.col("f"))
                   & (F.col("p") > 0) & (F.col("f") > 0))
            .select(F.col("w").alias("term"),
                    F.col("a").alias("df_pass"),
                    F.col("b").alias("df_fail"),
                    F.expr(chi2).alias("chi2_milli")))


# --------------------------------------------------------------------------
# Tokenizer fertility report — the tokenizer-efficiency metric a
# multilingual pretraining team tracks per language: subword tokens
# emitted per whitespace word (fertility near 1 = the tokenizer fits
# the language; 2-3 = the language pays double the sequence length for
# the same text). Whitespace counts ride token_count, subword counts
# the BPE-ish regex bank (both JVM-side, one scan, zero data-sized
# shuffle); fertility is exact integer permille of the per-language
# sums. NULL-text docs contribute NULL counts that SUM ignores
# identically on both engines.
# --------------------------------------------------------------------------
@query(
    "tokenizer_fertility_report",
    oracle=f"""
    WITH per AS (
        SELECT lang,
               CAST({_DUCK_NTOK} AS BIGINT) AS ws,
               CAST({_DUCK_BPE} AS BIGINT) AS bpe
        FROM documents
    )
    SELECT lang AS lang,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(COALESCE(SUM(ws), 0) AS BIGINT) AS ws_tokens,
           CAST(COALESCE(SUM(bpe), 0) AS BIGINT) AS bpe_tokens,
           CASE WHEN COALESCE(SUM(ws), 0) > 0
                THEN CAST((1000 * SUM(bpe)) // SUM(ws) AS BIGINT) END
               AS fertility_milli
    FROM per GROUP BY lang
    """,
    doc="Subword-per-word tokenizer fertility (permille) per language, "
        "one scan.",
)
def tokenizer_fertility_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A NULL lang is a real reporting group; a language whose corpus is
    all blank/NULL text reports NULL fertility (0 words — the ratio is
    undefined, not 0)."""
    docs = _spread_docs(spark, sf_dir, "doc_id", "text", "lang")
    per = docs.select(
        "lang",
        T.token_count("text").alias("ws"),
        T.bpe_token_count("text").alias("bpe"))
    return (per.groupBy("lang")
            .agg(F.count(F.lit(1)).cast("long").alias("n_docs"),
                 F.coalesce(F.sum("ws"), F.lit(0)).cast("long")
                 .alias("ws_tokens"),
                 F.coalesce(F.sum("bpe"), F.lit(0)).cast("long")
                 .alias("bpe_tokens"))
            .select("lang", "n_docs", "ws_tokens", "bpe_tokens",
                    F.expr("CASE WHEN ws_tokens > 0 THEN "
                           "CAST((1000 * bpe_tokens) div ws_tokens AS BIGINT)"
                           " END").alias("fertility_milli")))


# --------------------------------------------------------------------------
# Language-ID confusion matrix — lang_id's eval twin: the per-(labeled,
# predicted) cell counts plus per-cell recall share of the labeled
# class, the report that says WHERE the stopword heuristic fails (not
# just how often). Built by wrapping lang_id's own oracle verbatim as a
# CTE (the streaming_dedup_screen reuse discipline: one definition of
# the classifier, two queries), so the two can never drift. The matrix
# is |langs|^2-sized after one scan.
# --------------------------------------------------------------------------
def _lang_id_oracle() -> str:
    from cliqz_etl_spark.queries import REGISTRY as _R

    return _R["lang_id"].oracle


@query(
    "lang_id_confusion",
    oracle=None,  # bound below once lang_id is registered
    doc="Confusion matrix of the lang_id heuristic vs document labels, "
        "with per-cell recall permille of the labeled class.",
)
def lang_id_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NULL predicted (NULL text) and NULL labels are real matrix cells
    on both engines; recall_milli is NULL for cells whose labeled class
    has zero rows only vacuously (the class total is always >= the
    cell count)."""
    from cliqz_etl_spark.queries import REGISTRY as _R

    pred = _R["lang_id"].fn(spark, sf_dir)
    cells = (pred.groupBy("labeled_lang", "predicted_lang")
             .agg(F.count(F.lit(1)).cast("long").alias("n")))
    totals = (cells.groupBy(F.col("labeled_lang").alias("_lab"))
              .agg(F.sum("n").cast("long").alias("class_total")))
    # null-SAFE class join (the oracle's IS NOT DISTINCT FROM): the
    # NULL-labeled cell must find its own class total, not a NULL one
    return (cells.join(F.broadcast(totals),
                       F.col("labeled_lang").eqNullSafe(F.col("_lab")),
                       "left")
            .select("labeled_lang", "predicted_lang", "n", "class_total",
                    F.expr("CAST((1000 * n) div class_total AS BIGINT)")
                    .alias("recall_milli")))


# lang_id_confusion's oracle wraps lang_id's verbatim — bind it after
# both registrations so the registry holds ONE definition of the
# classifier (a frozen dataclass, so rebuild the entry).
def _bind_confusion_oracle() -> None:
    import dataclasses

    from cliqz_etl_spark.queries import REGISTRY as _R

    q = _R["lang_id_confusion"]
    if q.oracle is None:
        wrapped = f"""
        WITH pred AS ({_lang_id_oracle()}),
        cells AS (
            SELECT labeled_lang, predicted_lang,
                   CAST(count(*) AS BIGINT) AS n
            FROM pred GROUP BY 1, 2
        ), totals AS (
            SELECT labeled_lang, CAST(SUM(n) AS BIGINT) AS class_total
            FROM cells GROUP BY 1
        )
        SELECT c.labeled_lang AS labeled_lang,
               c.predicted_lang AS predicted_lang,
               c.n AS n, t.class_total AS class_total,
               CAST((1000 * c.n) // t.class_total AS BIGINT) AS recall_milli
        FROM cells c LEFT JOIN totals t
            ON t.labeled_lang IS NOT DISTINCT FROM c.labeled_lang
        """
        _R["lang_id_confusion"] = dataclasses.replace(q, oracle=wrapped)


_bind_confusion_oracle()

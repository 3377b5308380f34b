"""Training-data curation operators beyond dedup/sampling (llmdata.py):
sequence packing, PII-shape term redaction, repetition-quality scoring,
and benchmark-contamination checking — the remaining table-stakes ops of
a pretraining data pipeline, each expressed as a bucketed/shard-parallel
DataFrame plan with a DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from cliqz_etl_spark.functions.text import tokens, word_shingles_from
from cliqz_etl_spark.queries import query
from cliqz_etl_spark.tables import load_table

CTX_TOKENS = 64          # context-window length for packing (tokens)
EVAL_MOD = 50            # contamination eval set: doc_id % 50 == 0
CONTAM_K = 4             # n-gram length for contamination overlap

_WS = "string_split_regex(trim(text), '\\s+')"


def _shingles_sql(k: int) -> str:
    """k-word shingles with whole-text fallback for short docs — the SQL
    twin of functions/text.py::word_shingles (parameterized k)."""
    return (f"list_transform(range(1, greatest(len({_WS}) - {k - 1}, 1) + 1), "
            f"i -> array_to_string({_WS}[i:i+{k - 1}], ' '))")


# --------------------------------------------------------------------------
# Sequence packing: concatenate-then-chunk, the standard LLM pretraining
# layout. Documents are packed per SOURCE shard (shards are independent —
# the parallelism unit at 100 TB; a global pack order would serialize the
# cumsum into one task). Within a shard, docs concatenate in doc_id order
# and split into CTX_TOKENS-sized chunks; each doc records the chunk it
# starts in and how many chunks it spans.
# --------------------------------------------------------------------------
def _pack_chunks(sized: DataFrame) -> DataFrame:
    """(doc_id, source, n_tok) -> + (chunk_first, n_chunks): the per-source
    concatenate-then-chunk window, in ONE place so the flagship
    composition (curation_pipeline_v4) replays exactly the arithmetic
    pack_sequences pins — n_tok passes through with the caller's type."""
    w = (Window.partitionBy("source").orderBy(F.asc("doc_id"))
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    packed = sized.withColumn("cum", F.sum("n_tok").over(w))
    chunk_first = F.floor((F.col("cum") - F.col("n_tok")).cast("double") / CTX_TOKENS).cast("long")
    chunk_last = F.floor((F.col("cum") - 1).cast("double") / CTX_TOKENS).cast("long")
    return packed.select(
        "doc_id", "source", "n_tok",
        chunk_first.alias("chunk_first"),
        (chunk_last - chunk_first + 1).alias("n_chunks"),
    )


@query(
    "pack_sequences",
    oracle=f"""
    WITH sized AS (
        SELECT doc_id, source, len({_WS}) AS n_tok FROM documents
        WHERE text IS NOT NULL
    ), packed AS (
        SELECT doc_id, source, n_tok,
               SUM(n_tok) OVER (PARTITION BY source ORDER BY doc_id ASC
                                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
        FROM sized
    )
    SELECT doc_id AS doc_id, source AS source, n_tok AS n_tok,
           CAST(floor(CAST(cum - n_tok AS DOUBLE) / {CTX_TOKENS}) AS BIGINT) AS chunk_first,
           CAST(floor(CAST(cum - 1 AS DOUBLE) / {CTX_TOKENS}) AS BIGINT)
             - CAST(floor(CAST(cum - n_tok AS DOUBLE) / {CTX_TOKENS}) AS BIGINT) + 1 AS n_chunks
    FROM packed
    """,
)
def pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    # NULL-text docs are excluded on both sides (fuzz-pinned): they have
    # no tokens to pack, and Spark's size(NULL)=-1 would otherwise bleed
    # a negative length into every cumulative offset after it.
    docs = load_table(spark, sf_dir, "documents").where(F.col("text").isNotNull())
    sized = docs.select("doc_id", "source", F.size(tokens("text")).alias("n_tok"))
    return _pack_chunks(sized)


# --------------------------------------------------------------------------
# Term redaction — the PII-scrubbing shape (regex match -> replace ->
# count), exercised on this corpus's query vocabulary since the synthetic
# text contains no emails/phones. Swapping the pattern for an email/phone
# regex changes nothing structurally: one regexp_count + one
# regexp_replace per row, zero shuffle, scan-side.
# --------------------------------------------------------------------------
_MASK_PATTERN = r"\b(spark|join|vector)\b"


@query(
    "mask_terms",
    oracle=f"""
    SELECT doc_id AS doc_id,
           CAST(len(regexp_extract_all(text, '{_MASK_PATTERN}')) AS BIGINT) AS n_masked,
           regexp_replace(text, '{_MASK_PATTERN}', '[MASK]', 'g') AS masked
    FROM documents
    WHERE len(regexp_extract_all(text, '{_MASK_PATTERN}')) > 0
    """,
)
def mask_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    n = F.regexp_count("text", F.lit(_MASK_PATTERN)).cast("long")
    return (
        docs.select(
            "doc_id", n.alias("n_masked"),
            F.regexp_replace("text", _MASK_PATTERN, "[MASK]").alias("masked"),
        )
        .where(F.col("n_masked") > 0)
    )


# --------------------------------------------------------------------------
# Repetition ratio — the "most repeated n-gram" quality signal (high
# values flag boilerplate/spam). max multiplicity over total shingles,
# computed via one explode + two grouped aggregations on doc_id (map-side
# partial agg collapses each partition to one row per (doc, shingle)).
# --------------------------------------------------------------------------
@query(
    "repetition_ratio",
    oracle=f"""
    WITH sh AS (
        SELECT doc_id, unnest({_shingles_sql(3)}) AS s FROM documents
    ), mult AS (
        SELECT doc_id, s, COUNT(*) AS m FROM sh GROUP BY 1, 2
    )
    SELECT doc_id AS doc_id,
           CAST(SUM(m) AS BIGINT) AS n_shingles,
           CAST(MAX(m) AS BIGINT) AS max_rep,
           CAST(floor(CAST(MAX(m) AS DOUBLE) / CAST(SUM(m) AS DOUBLE) * 10000 + 0.5) AS BIGINT)
               AS rep_x10k
    FROM mult GROUP BY doc_id
    """,
)
def repetition_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    sh = (
        docs.select("doc_id", tokens("text").alias("_toks"))
        .select("doc_id", F.explode(word_shingles_from(F.col("_toks"), 3)).alias("s"))
    )
    mult = sh.groupBy("doc_id", "s").agg(F.count(F.lit(1)).alias("m"))
    return mult.groupBy("doc_id").agg(
        F.sum("m").cast("long").alias("n_shingles"),
        F.max("m").cast("long").alias("max_rep"),
        F.floor(F.max("m").cast("double") / F.sum("m").cast("double") * 10000 + 0.5)
        .cast("long").alias("rep_x10k"),
    )


# --------------------------------------------------------------------------
# Contamination check — which training documents share verbatim k-grams
# with a held-out eval set (the decontamination pass every pretraining
# pipeline runs against its benchmarks). Inverted-index equi-join on the
# gram: the candidate set is bounded by (grams in the eval set) x (their
# document frequency), never all pairs; at 100 TB the eval side is tiny
# (benchmarks), so its postings broadcast.
# --------------------------------------------------------------------------
@query(
    "contamination_check",
    oracle=f"""
    WITH sh AS (
        SELECT doc_id, unnest(list_distinct({_shingles_sql(CONTAM_K)})) AS s
        FROM documents WHERE trim(text) <> ''
    ), train AS (SELECT * FROM sh WHERE doc_id % {EVAL_MOD} != 0),
       eval_ AS (SELECT * FROM sh WHERE doc_id % {EVAL_MOD} = 0)
    SELECT t.doc_id AS doc_id,
           COUNT(DISTINCT t.s) AS n_shared_grams,
           COUNT(DISTINCT e.doc_id) AS n_eval_docs
    FROM train t JOIN eval_ e ON e.s = t.s
    GROUP BY t.doc_id
    """,
)
def contamination_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    # content-free docs (NULL / whitespace-only) are excluded on both
    # sides (fuzz-pinned): their degenerate whole-text ''-shingle would
    # report every empty train doc as contaminated by every empty eval doc
    docs = load_table(spark, sf_dir, "documents").where(F.trim("text") != "")
    sh = (
        docs.select("doc_id", tokens("text").alias("_toks"))
        .select("doc_id", F.explode(F.array_distinct(
            word_shingles_from(F.col("_toks"), CONTAM_K))).alias("s"))
    )
    train = sh.where(F.col("doc_id") % EVAL_MOD != 0)
    eval_ = sh.where(F.col("doc_id") % EVAL_MOD == 0).select(
        F.col("doc_id").alias("eval_doc"), "s")
    return (
        train.join(F.broadcast(eval_), "s")
        .groupBy("doc_id")
        .agg(
            F.countDistinct("s").alias("n_shared_grams"),
            F.countDistinct("eval_doc").alias("n_eval_docs"),
        )
    )


# --------------------------------------------------------------------------
# Overlapping sliding-window chunking: the RAG / long-context ingestion
# shape (each document -> overlapping W-token windows at stride S, the
# final window covering the tail). Distinct from pack_sequences: packing
# concatenates ACROSS docs into disjoint context blocks; chunking expands
# WITHIN a doc with overlap, preserving doc provenance per chunk. The
# plan is a pure scan-side map (tokenize once, sequence+transform+explode
# inside whole-stage codegen) — zero shuffle, the 1->N expansion an
# embedding/indexing pipeline feeds straight into ann/* without
# repartitioning.
# --------------------------------------------------------------------------
CHUNK_W = 32       # window length (tokens)
CHUNK_STRIDE = 24  # stride (tokens) -> 8-token overlap


@query(
    "chunk_documents",
    oracle=f"""
    WITH t AS (
        SELECT doc_id, {_WS} AS tk FROM documents WHERE trim(text) <> ''
    ), w AS (
        SELECT doc_id, tk, len(tk) AS n,
               1 + CASE WHEN len(tk) > {CHUNK_W}
                        THEN (len(tk) - {CHUNK_W} + {CHUNK_STRIDE - 1})
                             // {CHUNK_STRIDE}
                        ELSE 0 END AS nw
        FROM t
    )
    SELECT doc_id AS doc_id,
           CAST(i AS BIGINT) AS chunk_idx,
           CAST(i * {CHUNK_STRIDE} AS BIGINT) AS chunk_start,
           CAST(least({CHUNK_W}, n - i * {CHUNK_STRIDE}) AS BIGINT) AS n_tokens,
           array_to_string(tk[i*{CHUNK_STRIDE}+1 : i*{CHUNK_STRIDE}+{CHUNK_W}],
                           ' ') AS chunk
    FROM (SELECT doc_id, tk, n, unnest(range(nw)) AS i FROM w)
    """,
    doc=f"Sliding {CHUNK_W}-token windows at stride {CHUNK_STRIDE} per doc "
        "(RAG/long-context ingestion), map-only 1->N expansion.",
)
def chunk_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Windows start at 0, S, 2S, ...; a doc with <= W tokens yields one
    window; otherwise the count is 1 + ceil((n-W)/S) so the last window
    always reaches the final token (possibly shorter than W). Blank docs
    chunk to nothing on both engines (trim(text) <> '' is NULL-safe)."""
    docs = load_table(spark, sf_dir, "documents")
    W, S = CHUNK_W, CHUNK_STRIDE
    ntok = F.size("_tk")
    n_win = (F.lit(1) + F.when(
        ntok > W, ((ntok - W + (S - 1)) / S).cast("int")).otherwise(F.lit(0)))
    wins = F.transform(
        F.sequence(F.lit(0), n_win - 1),
        lambda i: F.struct(
            i.cast("long").alias("chunk_idx"),
            (i * S).cast("long").alias("chunk_start"),
            F.least(F.lit(W), ntok - i * S).cast("long").alias("n_tokens"),
            F.array_join(F.slice(F.col("_tk"), i * S + 1, W), " ").alias("chunk"),
        ),
    )
    return (
        docs.where(F.trim(F.col("text")) != "")
        .select(F.col("doc_id"), tokens(F.col("text")).alias("_tk"))
        .select("doc_id", F.explode(wins).alias("c"))
        .select("doc_id", "c.chunk_idx", "c.chunk_start", "c.n_tokens",
                "c.chunk")
    )


# --------------------------------------------------------------------------
# curation_pipeline_v3 — the round-8 LLM-data gates composed into one
# selection artifact: unicode-script routing (only latin-dominant pages
# reach the Latin-trained scorers), the stride-1 exact-substring dup
# screen (drop documents that are mostly duplicated text), and DSIR
# importance weighting over what survives. Unlike curation_pipeline_v2
# (which re-trains its scorer on the curated text), v3 composes the
# member queries' OUTPUTS — corpus-level gates intersected by key — so
# both engines assemble the same result from the members' own verbatim
# SQL: the oracle below embeds REGISTRY["script_mix"/"dedup_exact_
# substrings"/"dsir_importance_weights"].oracle unchanged as subqueries,
# making it impossible for the composition to drift from the parts.
# --------------------------------------------------------------------------
from cliqz_etl_spark.queries import REGISTRY as _REG  # noqa: E402
from cliqz_etl_spark.queries import dedup as _dedup_mod  # noqa: F401,E402
from cliqz_etl_spark.queries import llmdata as _llm_mod  # noqa: F401,E402
from cliqz_etl_spark.queries import textops as _text_mod  # noqa: F401,E402

_V3_DUP_PPM = 500_000  # drop docs more than half duplicated windows


@query(
    "curation_pipeline_v3",
    oracle=f"""
    WITH m AS ({_REG["script_mix"].oracle}),
    w AS ({_REG["dsir_importance_weights"].oracle}),
    d AS ({_REG["dedup_exact_substrings"].oracle})
    SELECT w.doc_id AS doc_id, w.n_tok AS n_tok,
           w.dsir_weight_milli AS dsir_weight_milli
    FROM w JOIN m ON m.doc_id = w.doc_id AND m.dominant = 'latin'
    WHERE w.doc_id NOT IN
          (SELECT doc_id FROM d WHERE dup_ppm > {_V3_DUP_PPM})
    """,
)
def curation_pipeline_v3(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Script-routed, dup-screened, DSIR-weighted selection table.

    Spark side composes by CALLING the member queries and joining their
    outputs (inner join on the latin-dominant routing set, anti join on
    the heavy-duplication set, weights carried through) — zero
    re-implementation, so the members' own oracle gates transitively
    cover every stage here; this gate only has to prove the composition
    joins. Documents shorter than the dedup window W carry no dup
    profile and pass the screen by definition. Plan: three member plans
    plus two key-joins; the routing and dup sets are doc-id-sized, so
    both joins broadcast at gate scale and shuffle on doc_id beyond."""
    mix = (_REG["script_mix"].fn(spark, sf_dir)
           .where(F.col("dominant") == "latin").select("doc_id"))
    dup_heavy = (_REG["dedup_exact_substrings"].fn(spark, sf_dir)
                 .where(F.col("dup_ppm") > _V3_DUP_PPM).select("doc_id"))
    w = _REG["dsir_importance_weights"].fn(spark, sf_dir)
    return (w.join(mix, "doc_id")
            .join(dup_heavy, "doc_id", "left_anti")
            .select("doc_id", "n_tok", "dsir_weight_milli"))


# --------------------------------------------------------------------------
# Corpus composition entropy — the mix report a data-curation review
# reads first: per (source, lang) cell share of the corpus plus the
# Shannon entropy of the whole mix (low entropy = one crawl slice
# dominates; the diversity alarm). The per-cell surprisal term
# p*ln(1/p) quantizes to micro units inside ONE shared double tree of
# exact integers (n, N), so the corpus-level entropy is an exact
# integer SUM of those terms — order-free under any partitioning (the
# bigram-LM rule) — broadcast back onto the cell frame.
# --------------------------------------------------------------------------
_MIX_TERM = ("CAST(floor(1000000 * (CAST(n AS DOUBLE) / nn)"
             " * ln(CAST(nn AS DOUBLE) / n) + 0.5) AS BIGINT)")


@query(
    "source_mix_entropy",
    oracle=f"""
    WITH cells AS (
        SELECT source, lang, CAST(count(*) AS BIGINT) AS n
        FROM documents GROUP BY 1, 2
    ), tot AS (SELECT CAST(SUM(n) AS BIGINT) AS nn FROM cells),
    terms AS (
        SELECT source, lang, n, {_MIX_TERM} AS term_micro
        FROM cells CROSS JOIN tot
    )
    SELECT source AS source, lang AS lang, n AS n_docs,
           CAST((1000000 * n) // (SELECT nn FROM tot) AS BIGINT) AS share_ppm,
           term_micro AS term_micro,
           CAST(SUM(term_micro) OVER () AS BIGINT) AS entropy_micro
    FROM terms
    """,
    doc="Per-(source, lang) corpus shares plus the global Shannon "
        "entropy of the mix (micro-nats, exact integer sum of "
        "per-cell quantized terms).",
)
def source_mix_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NULL source/lang cells are real groups on both engines. The
    entropy window runs over the cell frame (|sources x langs|, never
    data-sized); a single-cell corpus reports entropy 0 identically
    (ln(1) = 0 exactly in IEEE)."""
    from cliqz_etl_spark.operators.dedup import _materialize

    docs = load_table(spark, sf_dir, "documents")
    # materialized: the cell frame feeds the totals aggregate AND the
    # term projection — unpersisted, the documents groupBy ran twice
    cells = _materialize(docs.groupBy("source", "lang").agg(
        F.count(F.lit(1)).cast("long").alias("n")))
    tot = cells.agg(F.sum("n").cast("long").alias("nn"))
    terms = (cells.crossJoin(F.broadcast(tot))
             .select("source", "lang", "n", "nn",
                     F.expr(_MIX_TERM).alias("term_micro")))
    w = Window.partitionBy()
    return terms.select(
        "source", "lang", F.col("n").alias("n_docs"),
        F.expr("(1000000 * n) div nn").cast("long").alias("share_ppm"),
        "term_micro",
        F.sum("term_micro").over(w).cast("long").alias("entropy_micro"))


# --------------------------------------------------------------------------
# curation_pipeline_v4 — the full FineWeb-shaped ingest in ONE lineage,
# crossing the multimodal -> text -> pack seam no other composition
# exercises: media byte-budget gate (through the REAL BMP codec path of
# image_decode_stats), Gopher quality gate, benchmark-decontamination
# (drop contaminated train docs AND the eval split itself), C4 span
# dedup as the TRANSFORM stage (docs are repacked from their surviving
# chunks, not their raw text), then sequence packing over the curated
# survivors. Per the v2/v3 discipline the oracle embeds the member
# queries' oracles VERBATIM as CTEs — the composition cannot drift from
# the parts; the only glue SQL is the key-joins, the eval-split
# predicate, and the pack window replayed over the survivor set (the
# same documented formula as pack_sequences, here fed by text_kept).
# --------------------------------------------------------------------------
from cliqz_etl_spark.queries import multimodal as _mm_mod  # noqa: F401,E402

V4_IMG_MAX_BYTES = 200  # media payload budget (bytes, encoded image)


@query(
    "curation_pipeline_v4",
    oracle=f"""
    WITH g AS ({_REG["gopher_quality_filter"].oracle}),
    cont AS ({_REG["contamination_check"].oracle}),
    img AS ({_REG["image_decode_stats"].oracle}),
    sp AS ({_REG["dedup_spans"].oracle}),
    surv AS (
        SELECT sp.doc_id AS doc_id, d.source AS source,
               len(string_split_regex(trim(sp.text_kept), '\\s+')) AS n_tok
        FROM sp
        JOIN documents d ON d.doc_id = sp.doc_id
        JOIN g ON g.doc_id = sp.doc_id AND g.passes
        JOIN img ON img.doc_id = sp.doc_id
                AND img.byte_len <= {V4_IMG_MAX_BYTES}
        WHERE sp.n_kept > 0
          AND sp.doc_id % {EVAL_MOD} != 0
          AND sp.doc_id NOT IN (SELECT doc_id FROM cont)
    ), packed AS (
        SELECT doc_id, source, n_tok,
               SUM(n_tok) OVER (PARTITION BY source ORDER BY doc_id ASC
                                ROWS BETWEEN UNBOUNDED PRECEDING
                                AND CURRENT ROW) AS cum
        FROM surv
    )
    SELECT doc_id AS doc_id, source AS source, CAST(n_tok AS BIGINT) AS n_tok,
           CAST(floor(CAST(cum - n_tok AS DOUBLE) / {CTX_TOKENS}) AS BIGINT)
               AS chunk_first,
           CAST(floor(CAST(cum - 1 AS DOUBLE) / {CTX_TOKENS}) AS BIGINT)
             - CAST(floor(CAST(cum - n_tok AS DOUBLE) / {CTX_TOKENS}) AS BIGINT)
             + 1 AS n_chunks
    FROM packed
    """,
    doc="Full multimodal+text curation lineage: media byte budget, "
        "Gopher gate, decontamination (incl. eval split), span-dedup "
        "transform, then sequence packing over the curated survivors.",
)
def curation_pipeline_v4(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Composes the member queries' OUTPUTS (zero re-implementation):
    three gate sets key-join/anti-join onto the span-dedup frame, whose
    text_kept is re-tokenized for packing — so the packed token counts
    price the TRANSFORMED corpus, not the raw one. Plan: four member
    plans + three doc-id-sized gate joins (broadcast at gate scale,
    doc_id shuffle beyond) + one per-source pack window; the window runs
    over the curated survivor set, so the cumsum partition is the SOURCE
    shard exactly as in pack_sequences (the 100 TB parallelism unit).
    Documents shorter than the span-dedup window survive whole (their
    chunks are unique by construction) and pack at full length."""
    gate_ok = (_REG["gopher_quality_filter"].fn(spark, sf_dir)
               .where(F.col("passes")).select("doc_id"))
    contam = _REG["contamination_check"].fn(spark, sf_dir).select("doc_id")
    img_ok = (_REG["image_decode_stats"].fn(spark, sf_dir)
              .where(F.col("byte_len") <= V4_IMG_MAX_BYTES).select("doc_id"))
    sp = (_REG["dedup_spans"].fn(spark, sf_dir)
          .where(F.col("n_kept") > 0).select("doc_id", "text_kept"))
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "source")
    surv = (sp.join(gate_ok, "doc_id")
            .join(img_ok, "doc_id")
            .join(contam, "doc_id", "left_anti")
            .where(F.col("doc_id") % EVAL_MOD != 0)
            .join(docs, "doc_id")
            .select("doc_id", "source",
                    F.size(tokens("text_kept")).cast("long").alias("n_tok")))
    return _pack_chunks(surv)

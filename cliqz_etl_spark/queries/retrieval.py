"""Retrieval-engine primitives over the documents/embeddings tables:
boolean (conjunctive) postings intersection, positional phrase matching,
posting-list compression planning (Elias-γ / Elias-Fano bit costs),
WAND-style pruned exact BM25 top-k, and reciprocal-rank-fusion hybrid
search (lexical BM25 + vector cosine).

These extend the search surface (tfidf_search / bm25_search) with the
operators a production retrieval stack runs at index-build and query
time. Everything is integer-exact or single-double-division exact so the
DuckDB oracles hash-match; everything is postings-bounded — work scales
with the query terms' document frequency, never with corpus size — which
is the property that survives 100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from cliqz_etl_spark.queries import query
from cliqz_etl_spark.queries.timeseries import (
    _QUERY_TERMS,
    _bm25_term_sql,
    _terms_sql,
)
from cliqz_etl_spark.tables import load_table

# Fixed phrase for the positional query (both words are in the synthetic
# corpus vocabulary; the pair occurs tens of times per SF).
PHRASE = ("table", "value")

# Index sharding for the compression planner: real distributed indexes
# split postings by document range/hash across shards; gap coding is
# per-shard. The shard count is the knob that bounds any one task's
# postings slice for a hot term.
N_SHARDS = 16

WAND_K = 10       # top-k for the pruned BM25 query
WAND_BLOCK = 64   # doc ids per block-max bound block (index metadata)
RRF_L = 50        # per-list candidate depth for hybrid fusion
RRF_K = 60        # the canonical RRF rank damping constant
RRF_SCALE = 1_000_000_000  # per-list quantization of 1/(RRF_K + rank)


def _tok_cte() -> str:
    return ("SELECT doc_id, unnest(string_split_regex(trim(text), '\\s+')) AS w "
            "FROM documents WHERE trim(text) <> ''")


def _tokens_nonempty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, w) exploded tokens of non-blank documents — the shared
    scan every retrieval query starts from."""
    from cliqz_etl_spark.functions.text import tokens

    docs = load_table(spark, sf_dir, "documents")
    return (docs.where(F.trim(F.col("text")) != "")
            .select("doc_id", F.explode(tokens("text")).alias("w")))


# --------------------------------------------------------------------------
# Conjunctive boolean retrieval: docs containing ALL query terms — the
# AND of an inverted index, evaluated as postings-intersection-by-count
# (group the term postings by doc; a doc with one row per query term is
# in the intersection). The classic distributed formulation: no postings
# list ever materializes as an array; the intersection is a count match
# after a map-side-combined groupBy, so work is Σ df(term), not corpus
# size, and a hot term only costs its own postings.
# --------------------------------------------------------------------------
@query(
    "postings_intersect",
    oracle=f"""
    WITH tok AS ({_tok_cte()}),
    tf AS (
        SELECT doc_id, w, CAST(count(*) AS BIGINT) AS tf FROM tok
        WHERE w IN ({_terms_sql()}) GROUP BY 1, 2
    )
    SELECT doc_id AS doc_id,
           CAST(min(tf) AS BIGINT) AS min_tf,
           CAST(sum(tf) AS BIGINT) AS total_tf
    FROM tf GROUP BY doc_id
    HAVING count(*) = {len(_QUERY_TERMS)}
    """,
)
def postings_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Documents matching `spark AND join AND vector`, with per-doc
    evidence (rarest-term tf and total tf).

    Plan shape: tokenize → filter to the query vocabulary (postings
    scan) → ONE groupBy(doc, term) with map-side combine → ONE
    groupBy(doc) count-match. Two keyed shuffles, both sized to the
    query terms' postings. The reference's membership filters
    (testpilot_data.py:118-127) are the one-column version of this."""
    from cliqz_etl_spark.queries.timeseries import _query_term_postings

    # round-13: filter BEFORE the explode — the Generate emits only the
    # query terms' occurrences, not the whole corpus' tokens
    tf = (_query_term_postings(spark, sf_dir)
          .groupBy("doc_id", "w")
          .agg(F.count(F.lit(1)).cast("long").alias("tf")))
    return (tf.groupBy("doc_id")
            .agg(F.count(F.lit(1)).alias("n_terms"),
                 F.min("tf").cast("long").alias("min_tf"),
                 F.sum("tf").cast("long").alias("total_tf"))
            .where(F.col("n_terms") == len(_QUERY_TERMS))
            .drop("n_terms"))


# --------------------------------------------------------------------------
# Positional phrase matching, index-free: over raw documents the right
# Spark shape is a pure scan-side map — count positions i where
# tok[i] = w1 and tok[i+1] = w2 inside whole-stage codegen, zero
# shuffle, zero expansion (no posexplode row blowup). The positional-
# index formulation (join term-1 postings to term-2 postings on
# (doc, pos+1)) only wins once an index is already materialized.
# NOTE: Spark's sequence(1, n) DESCENDS when n < 1 — single-token docs
# would produce [1, 0] and a spurious probe — hence the n_tok >= 2 guard
# (DuckDB's range(1, n) is simply empty there).
# --------------------------------------------------------------------------
@query(
    "phrase_search",
    oracle=f"""
    WITH tok AS (
        SELECT doc_id, string_split_regex(trim(text), '\\s+') AS l
        FROM documents WHERE trim(text) <> ''
    )
    SELECT doc_id AS doc_id,
           CAST(len(list_filter(range(1, len(l)),
                i -> l[i] = '{PHRASE[0]}' AND l[i+1] = '{PHRASE[1]}'))
                AS BIGINT) AS n_phrase
    FROM tok
    WHERE len(list_filter(range(1, len(l)),
              i -> l[i] = '{PHRASE[0]}' AND l[i+1] = '{PHRASE[1]}')) > 0
    """,
)
def phrase_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Documents containing the exact phrase "table value", with the
    occurrence count. Map-only plan: one projection over the parquet
    scan — the shape that saturates IO at 100 TB with no shuffle."""
    from cliqz_etl_spark.functions.text import tokens

    docs = load_table(spark, sf_dir, "documents")
    toks = tokens("text")
    probe = F.filter(
        F.sequence(F.lit(1), F.size(toks) - 1),
        lambda i: (F.element_at(toks, i) == PHRASE[0])
        & (F.element_at(toks, i + 1) == PHRASE[1]),
    )
    n = F.when(F.size(toks) < 2, F.lit(0)).otherwise(F.size(probe))
    return (docs.where(F.trim(F.col("text")) != "")
            .select("doc_id", n.cast("long").alias("n_phrase"))
            .where(F.col("n_phrase") > 0))


# --------------------------------------------------------------------------
# Posting-list compression planner: per term, the exact bit cost of the
# postings under delta + Elias-γ coding and under Elias-Fano, vs 64-bit
# plain ids — the storage-planning arithmetic behind every inverted
# index (Lucene's PFOR, the EF postings of Vigna 2013). Integer-exact
# via bin(): floor(log2 g) = length(bin(g)) - 1 on both engines.
#
# Postings are doc-sharded (doc_id % N_SHARDS) like a distributed index,
# and gap-coded within each shard: the per-task slice of even the
# hottest term is bounded by its shard, and the shard count is the
# scale-out knob. γ cost: Σ 2·⌊log2 g⌋+1 over gaps (first gap anchored
# at doc_id+1 so g ≥ 1). EF cost: n·l + n + (U >> l) bits with
# l = max(0, ⌊log2(U div n)⌋), U = max_id+1 — the textbook bound.
# --------------------------------------------------------------------------
_GAMMA = "2 * (length(bin(g)) - 1) + 1"


@query(
    "postings_compress_stats",
    oracle=f"""
    WITH tok AS ({_tok_cte()}),
    post AS (
        SELECT DISTINCT w, doc_id % {N_SHARDS} AS shard, doc_id FROM tok
    ), gaps AS (
        SELECT w, shard, doc_id,
               CAST(COALESCE(doc_id - lag(doc_id) OVER
                    (PARTITION BY w, shard ORDER BY doc_id),
                    doc_id + 1) AS BIGINT) AS g
        FROM post
    ), per_shard AS (
        SELECT w, shard,
               CAST(count(*) AS BIGINT) AS n,
               CAST(sum({_GAMMA}) AS BIGINT) AS gamma_bits,
               CAST(max(doc_id) + 1 AS BIGINT) AS u
        FROM gaps GROUP BY 1, 2
    ), ef AS (
        SELECT w, shard, n, gamma_bits,
               CASE WHEN u // n >= 2 THEN length(bin(u // n)) - 1
                    ELSE 0 END AS l, u
        FROM per_shard
    )
    SELECT w AS term,
           CAST(sum(n) AS BIGINT) AS n_docs,
           CAST(sum(gamma_bits) AS BIGINT) AS gamma_bits,
           CAST(sum(n * l + n + (u >> l)) AS BIGINT) AS ef_bits,
           CAST(64 * sum(n) AS BIGINT) AS plain_bits
    FROM ef GROUP BY w
    """,
)
def postings_compress_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact compressed-size plan of the full inverted index, per term.

    Plan shape: distinct (term, shard, doc) → lag window partitioned by
    (term, shard) — the per-task sort is one shard of one term's
    postings, the same slice a real index shard owns — then two grouped
    sums. No arrays materialize; the planner's output is vocab-sized."""
    tok = _tokens_nonempty(spark, sf_dir)
    post = (tok.select("w", (F.col("doc_id") % N_SHARDS).alias("shard"), "doc_id")
            .distinct())
    w_lag = Window.partitionBy("w", "shard").orderBy("doc_id")
    gaps = post.select(
        "w", "shard", "doc_id",
        F.coalesce(F.col("doc_id") - F.lag("doc_id").over(w_lag),
                   F.col("doc_id") + 1).cast("long").alias("g"))
    per_shard = gaps.groupBy("w", "shard").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(F.expr(_GAMMA)).cast("long").alias("gamma_bits"),
        (F.max("doc_id") + 1).cast("long").alias("u"))
    # u div n is exact long division on both engines (u, n > 0); the
    # shiftright low-bit split is the EF upper/lower-bits bound.
    ef = per_shard.withColumn(
        "l",
        F.expr("CASE WHEN u div n >= 2 "
               "THEN length(bin(u div n)) - 1 ELSE 0 END").cast("int"))
    return ef.groupBy(F.col("w").alias("term")).agg(
        F.sum("n").cast("long").alias("n_docs"),
        F.sum("gamma_bits").cast("long").alias("gamma_bits"),
        F.sum(F.expr("n * l + n + shiftright(u, l)")).cast("long").alias("ef_bits"),
        (F.lit(64) * F.sum("n")).cast("long").alias("plain_bits"))


# --------------------------------------------------------------------------
# WAND-style pruned exact top-k BM25. The batch twin of the max-score /
# WAND family (Broder et al. 2003): score upper bounds are cheap (they
# need no document-length join — dl is replaced by the corpus-wide
# minimum, which can only overestimate), a seed pass scores the k best
# docs BY BOUND exactly, and every doc whose bound is below the k-th
# seed's exact score is provably outside the top-k:
#     exact(d) <= UB(d) < theta = min over k seeds of exact(seed)
# so at least k docs beat d. Quantization preserves the bound (floor is
# monotone and idf > 0). Only survivors pay the dlen join + exact
# aggregation — on zipfian corpora that is a small fraction of the
# postings, which is the entire point of WAND at 100 TB.
# Oracle: brute-force BM25 over everything + ROW_NUMBER — a different
# algorithm, so the pruning logic itself is what the hash check tests.
# --------------------------------------------------------------------------
@query(
    "wand_bm25_topk",
    oracle=f"""
    WITH tok AS ({_tok_cte()}),
    dlen AS (
        SELECT doc_id, CAST(count(*) AS BIGINT) AS dl FROM tok GROUP BY doc_id
    ), corp AS (
        SELECT CAST(COALESCE(sum(dl), 0) AS BIGINT) AS s,
               CAST(count(*) AS BIGINT) AS n
        FROM dlen
    ), tf AS (
        SELECT doc_id, w, CAST(count(*) AS BIGINT) AS tf FROM tok
        WHERE w IN ({_terms_sql()}) GROUP BY 1, 2
    ), dfreq AS (
        SELECT w, CAST(count(DISTINCT doc_id) AS BIGINT) AS df FROM tok
        WHERE w IN ({_terms_sql()}) GROUP BY 1
    ), scores AS (
        SELECT tf.doc_id AS doc_id,
               CAST(sum({_bm25_term_sql()}) AS BIGINT) AS bm25_micro
        FROM tf JOIN dfreq USING (w) JOIN dlen USING (doc_id) CROSS JOIN corp
        GROUP BY tf.doc_id
    )
    SELECT CAST(rank AS BIGINT) AS rank, doc_id AS doc_id,
           bm25_micro AS bm25_micro
    FROM (SELECT doc_id, bm25_micro,
                 ROW_NUMBER() OVER (ORDER BY bm25_micro DESC, doc_id ASC)
                     AS rank
          FROM scores)
    WHERE rank <= {WAND_K}
    """,
)
def wand_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact top-10 documents by BM25, found by bound-and-prune instead
    of scoring the corpus.

    Plan shape: the postings frame (tf x df x 1-row stats, broadcast)
    is materialized once and feeds three bounded passes — (1) BLOCK-MAX
    upper bounds (per-(term, doc-block) maxima of the exact posting
    scores — the precomputed index metadata of block-max WAND — summed
    per doc); (2) top-k seeds via TakeOrderedAndProject (per-partition
    top-k, merge of k*n_parts rows — never a global sort) scored
    exactly; (3) survivors (bound >= theta) scored exactly. The block
    bound is tighter-or-equal to the old global min-dl bound everywhere,
    so the survivor rescoring pass shrinks. The final rank window sees
    <= k rows by construction."""
    from cliqz_etl_spark.operators.dedup import _materialize
    from cliqz_etl_spark.queries.timeseries import _bm25_corpus_frames

    # round-13: doc lengths scan-side, no corpus token explode/cache —
    # see _bm25_corpus_frames. dlen rides the shared doc-grain cache, so
    # the three passes that join it re-read memory, not the scan.
    dlen, _corp, qt = _bm25_corpus_frames(spark, sf_dir)
    stats = dlen.agg(
        F.coalesce(F.sum("dl"), F.lit(0)).cast("long").alias("s"),
        F.count(F.lit(1)).cast("long").alias("n"),
        F.coalesce(F.min("dl"), F.lit(0)).cast("long").alias("dlm"))
    tf = qt.groupBy("doc_id", "w").agg(F.count(F.lit(1)).cast("long").alias("tf"))
    dfreq = qt.groupBy("w").agg(F.countDistinct("doc_id").cast("long").alias("df"))
    base = _materialize(
        tf.join(F.broadcast(dfreq), "w").crossJoin(F.broadcast(stats)))

    term_micro = F.expr(_bm25_term_sql())

    # Block-max bounds (round-9, replacing the global min-dl bound): per
    # (term, doc-id block) the max EXACT per-posting score — the index
    # metadata every block-max WAND engine precomputes at build time and
    # amortizes across queries. Sound: the block max dominates every
    # member's true term score, so the per-doc sum of its blocks' maxima
    # dominates the true BM25; and since the min-dl score dominates each
    # block max, this bound is tighter-or-equal everywhere (fewer
    # survivors rescored). Cost: one keyed dlen join over the
    # query-vocabulary postings — the build-side pass; per-query reads
    # touch block maxima (blocks-sized) plus seeds/survivors only.
    blk = F.expr(f"doc_id div {WAND_BLOCK}")
    scored_posts = _materialize(
        base.join(dlen, "doc_id")
        .select("doc_id", "w", blk.alias("blk"),
                term_micro.alias("tsc")))
    block_ub = scored_posts.groupBy("w", "blk").agg(
        F.max("tsc").alias("bub"))
    bounds = _materialize(
        scored_posts.join(block_ub, ["w", "blk"])
        .groupBy("doc_id").agg(F.sum("bub").cast("long").alias("ub")))
    seeds = bounds.orderBy(F.desc("ub"), F.asc("doc_id")).limit(WAND_K)

    def _exact(doc_set: DataFrame, how: str) -> DataFrame:
        scored = (base.join(doc_set.select("doc_id"), "doc_id", how)
                  .join(dlen, "doc_id")
                  .groupBy("doc_id")
                  .agg(F.sum(term_micro).cast("long").alias("bm25_micro")))
        return scored

    seed_scores = _exact(F.broadcast(seeds), "inner")
    theta = seed_scores.agg(F.min("bm25_micro").alias("theta"))
    survivors = (bounds.crossJoin(F.broadcast(theta))
                 .where(F.col("ub") >= F.col("theta")))
    final = (_exact(survivors, "left_semi")
             .orderBy(F.desc("bm25_micro"), F.asc("doc_id")).limit(WAND_K))
    w = Window.orderBy(F.desc("bm25_micro"), F.asc("doc_id"))
    return final.select(
        F.row_number().over(w).cast("long").alias("rank"),
        "doc_id", "bm25_micro")


# --------------------------------------------------------------------------
# Reciprocal-rank-fusion hybrid search: fuse the lexical (BM25) and
# vector (cosine) rankings for one query — the retrieval shape of every
# modern RAG stack (Cormack et al. 2009's RRF, k = 60). The query is
# document 0: its text terms on the lexical side (the fixed query
# vocabulary), its embedding on the vector side; doc 0 itself is
# excluded from both candidate lists. Each list is cut at depth L by
# TakeOrderedAndProject (never a global sort); the fused frame is at
# most 2L rows. Scores are exact: each list contributes
# floor(1e9 / (60 + rank) + 0.5) — one double division of exact
# integers, quantized per list, then an integer sum.
# --------------------------------------------------------------------------
def _rrf_part(rank_col: str) -> str:
    return (f"COALESCE(CAST(floor(CAST({RRF_SCALE} AS DOUBLE)"
            f" / ({RRF_K} + {rank_col}) + 0.5) AS BIGINT), 0)")


@query(
    "rrf_hybrid_search",
    oracle=None,  # replaced below: needs the similarity fragments
)
def rrf_hybrid_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid lexical+vector retrieval fused with RRF (k=60, depth 50).

    Plan shape: BM25 side is the postings-bounded bm25_search plan cut
    to L rows by TakeOrderedAndProject; vector side broadcasts the
    1-row query model over the corpus scan (integer dot / norms exactly
    like ann_topk) and cuts to L the same way; fusion is a full outer
    join of two <= L-row frames — broadcastable by construction. The
    corpus is scanned, never globally sorted and never shuffled by key;
    swap the brute-force vector side for ann_ivf's probe at index
    scale."""
    from cliqz_etl_spark.operators.dedup import _materialize
    from cliqz_etl_spark.operators.similarity import (
        dot_q,
        norm2_q,
        valid_quantized,
    )

    # ---- lexical: BM25 vs the fixed query terms, doc 0 excluded ----
    # round-13: shared scan-side dl / query-term-only explode (see
    # _bm25_corpus_frames) — no corpus token cache on the lexical side
    from cliqz_etl_spark.queries.timeseries import _bm25_corpus_frames

    dlen, corp, qt = _bm25_corpus_frames(spark, sf_dir)
    tf = qt.groupBy("doc_id", "w").agg(F.count(F.lit(1)).cast("long").alias("tf"))
    dfreq = qt.groupBy("w").agg(F.countDistinct("doc_id").cast("long").alias("df"))
    bm = (tf.join(F.broadcast(dfreq), "w")
          .join(dlen, "doc_id")
          .crossJoin(F.broadcast(corp))
          .where(F.col("doc_id") != 0)
          .groupBy("doc_id")
          .agg(F.sum(F.expr(_bm25_term_sql())).cast("long").alias("bm25_micro")))
    lex = (bm.orderBy(F.desc("bm25_micro"), F.asc("doc_id")).limit(RRF_L)
           .select("doc_id",
                   F.row_number().over(
                       Window.orderBy(F.desc("bm25_micro"), F.asc("doc_id"))
                   ).cast("long").alias("lex_rank")))

    # ---- vector: cosine vs doc 0's embedding, doc 0 excluded ----
    emb = load_table(spark, sf_dir, "embeddings")
    q = valid_quantized(emb, "vec_id", "embedding", 64)
    qv = (q.where(F.col("_id") == 0)
          .select(F.col("_qv").alias("qv"),
                  norm2_q(F.col("_qv")).cast("double").alias("qn")))
    cos = (dot_q(F.col("_qv"), F.col("qv")).cast("double")
           / F.sqrt(norm2_q(F.col("_qv")).cast("double") * F.col("qn")))
    scored = (q.where(F.col("_id") != 0)
              .crossJoin(F.broadcast(qv))
              .select(F.col("_id").alias("doc_id"), cos.alias("cos")))
    sem = (scored.orderBy(F.desc("cos"), F.asc("doc_id")).limit(RRF_L)
           .select("doc_id",
                   F.row_number().over(
                       Window.orderBy(F.desc("cos"), F.asc("doc_id"))
                   ).cast("long").alias("sem_rank")))

    # ---- fusion: full outer over two <= L-row frames ----
    fused = lex.join(sem, "doc_id", "full_outer")
    return fused.select(
        "doc_id", "lex_rank", "sem_rank",
        (F.expr(_rrf_part("lex_rank")) + F.expr(_rrf_part("sem_rank")))
        .cast("long").alias("rrf_micro"))


def _rrf_oracle() -> str:
    from cliqz_etl_spark.queries.similarity import _QUANT, _VALID

    dot = ("CAST(list_sum(list_transform(range(1, len(a.v)+1), "
           "i -> a.v[i]*qv.v[i])) AS DOUBLE)")
    n_a = ("CAST(list_sum(list_transform(a.v, x -> x*x)) AS DOUBLE)")
    n_q = ("CAST(list_sum(list_transform(qv.v, x -> x*x)) AS DOUBLE)")
    return f"""
    WITH tok AS ({_tok_cte()}),
    dlen AS (
        SELECT doc_id, CAST(count(*) AS BIGINT) AS dl FROM tok GROUP BY doc_id
    ), corp AS (
        SELECT CAST(COALESCE(sum(dl), 0) AS BIGINT) AS s,
               CAST(count(*) AS BIGINT) AS n
        FROM dlen
    ), tf AS (
        SELECT doc_id, w, CAST(count(*) AS BIGINT) AS tf FROM tok
        WHERE w IN ({_terms_sql()}) GROUP BY 1, 2
    ), dfreq AS (
        SELECT w, CAST(count(DISTINCT doc_id) AS BIGINT) AS df FROM tok
        WHERE w IN ({_terms_sql()}) GROUP BY 1
    ), bm AS (
        SELECT tf.doc_id AS doc_id,
               CAST(sum({_bm25_term_sql()}) AS BIGINT) AS bm25_micro
        FROM tf JOIN dfreq USING (w) JOIN dlen USING (doc_id) CROSS JOIN corp
        WHERE tf.doc_id != 0
        GROUP BY tf.doc_id
    ), lex AS (
        SELECT doc_id, CAST(r AS BIGINT) AS lex_rank
        FROM (SELECT doc_id, ROW_NUMBER() OVER
                  (ORDER BY bm25_micro DESC, doc_id ASC) AS r FROM bm)
        WHERE r <= {RRF_L}
    ), q AS (
        SELECT vec_id, {_QUANT} AS v FROM embeddings WHERE {_VALID}
    ), qv AS (SELECT v FROM q WHERE vec_id = 0),
    scored AS (
        SELECT a.vec_id AS doc_id,
               {dot} / sqrt({n_a} * {n_q}) AS cos
        FROM q a CROSS JOIN qv
        WHERE a.vec_id != 0
    ), sem AS (
        SELECT doc_id, CAST(r AS BIGINT) AS sem_rank
        FROM (SELECT doc_id, ROW_NUMBER() OVER
                  (ORDER BY cos DESC, doc_id ASC) AS r FROM scored)
        WHERE r <= {RRF_L}
    )
    SELECT COALESCE(lex.doc_id, sem.doc_id) AS doc_id,
           lex.lex_rank AS lex_rank, sem.sem_rank AS sem_rank,
           CAST({_rrf_part('lex.lex_rank')}
                + {_rrf_part('sem.sem_rank')} AS BIGINT) AS rrf_micro
    FROM lex FULL OUTER JOIN sem ON lex.doc_id = sem.doc_id
    """


# late-bind the oracle (the similarity fragments import the registry
# module; building the SQL lazily avoids a circular import at load time)
from cliqz_etl_spark.queries import REGISTRY as _REG  # noqa: E402
import dataclasses as _dc  # noqa: E402

_REG["rrf_hybrid_search"] = _dc.replace(
    _REG["rrf_hybrid_search"], oracle=_rrf_oracle())


# --------------------------------------------------------------------------
# Elias-Fano posting lists FOR REAL — postings_compress_stats prices the
# layout; this gate runs the actual codec (functions/eliasfano.py): every
# term's sorted doc-id list packs into the quasi-succinct byte layout and
# unpacks back inside one Arrow mapInPandas pass. The oracle pins BOTH
# halves: the byte size via the exact integer size formula
# (l = floor(log2(u div n)) by length(bin()), payload = n*l + n +
# (max_id >> l) + 1, plus the 16-byte n/max header), and the decoded
# VALUES via a checksum over the original postings — a hash match proves
# decode(encode(x)) == x end-to-end on the whole vocabulary. Per-term
# rows are posting-list-grain; the groupBy is the only shuffle.
# --------------------------------------------------------------------------
@query(
    "postings_ef_roundtrip",
    oracle=f"""
    WITH tok AS ({_tok_cte()}),
    post AS (SELECT DISTINCT w, doc_id FROM tok),
    per AS (
        SELECT w,
               CAST(COUNT(*) AS BIGINT) AS n,
               CAST(MAX(doc_id) AS BIGINT) AS mx
        FROM post GROUP BY w
    ), params AS (
        SELECT w, n, mx,
               CASE WHEN (mx + 1) // n > 0
                    THEN length(bin((mx + 1) // n)) - 1 ELSE 0 END AS l
        FROM per
    ), wsum AS (
        SELECT w, CAST(SUM(rn * doc_id) AS BIGINT) AS decoded_wsum
        FROM (SELECT w, doc_id,
                     ROW_NUMBER() OVER (PARTITION BY w ORDER BY doc_id ASC)
                         AS rn
              FROM post)
        GROUP BY w
    )
    SELECT p.w AS term, p.n AS n_docs,
           CAST(16 + (p.n * p.l + p.n + (p.mx >> p.l) + 1 + 7) // 8
                AS BIGINT) AS ef_bytes,
           s.decoded_wsum AS decoded_wsum
    FROM params p JOIN wsum s ON s.w = p.w
    """,
)
def postings_ef_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Encode -> decode every term's posting list through the real
    Elias-Fano codec; emit byte size and a decoded-value checksum."""
    import pandas as pd

    from cliqz_etl_spark.functions.eliasfano import ef_decode, ef_encode

    posts = (_tokens_nonempty(spark, sf_dir)
             .groupBy("w")
             .agg(F.sort_array(F.collect_set("doc_id")).alias("ids")))

    def process(batches):
        for pdf in batches:
            out = {"term": [], "n_docs": [], "ef_bytes": [],
                   "decoded_wsum": []}
            for w, ids in zip(pdf["w"], pdf["ids"]):
                ids = [int(x) for x in ids]
                blob = ef_encode(ids)
                dec = ef_decode(blob)
                if dec != ids:
                    raise ValueError(
                        f"EF roundtrip mismatch for term {w!r}")
                out["term"].append(w)
                out["n_docs"].append(len(ids))
                out["ef_bytes"].append(len(blob))
                out["decoded_wsum"].append(
                    sum((i + 1) * x for i, x in enumerate(dec)))
            yield pd.DataFrame(out)

    return posts.mapInPandas(
        process, schema=("term string, n_docs long, ef_bytes long, "
                         "decoded_wsum long"))


# --------------------------------------------------------------------------
# Ranking-quality eval (P@10 / MRR / NDCG@10) of the BM25 ranking against
# containment relevance — the offline eval a retrieval stack runs per
# index build. Relevance is deterministic: a document is relevant iff it
# contains ALL query terms (the postings_intersect predicate), so the
# labels need no human file and replay identically on both engines.
# The discounted gain 1/log2(pos+1) micro-quantizes PER POSITION before
# the integer sums; MRR (1e6 // first_rel_pos), P@10, and NDCG
# (1e6*dcg // idcg) are exact integer divisions of non-negative BIGINTs
# (Spark div = DuckDB //). The cut itself is rank-safe at scale: Spark
# plans the top-10 as TakeOrderedAndProject (per-partition heads + a
# 10-row driver merge), never a global sort, and the positions window
# runs on the 10-row frame.
# --------------------------------------------------------------------------
NDCG_K = 10

def _dcg_gain_sql(pos_expr: str) -> str:
    return (f"CAST(floor(1000000 * ln(2.0) / ln(CAST({pos_expr} + 1 AS DOUBLE))"
            " + 0.5) AS BIGINT)")


@query(
    "ranking_eval_bm25",
    oracle=f"""
    WITH tok AS ({_tok_cte()}),
    dlen AS (
        SELECT doc_id, CAST(count(*) AS BIGINT) AS dl FROM tok GROUP BY doc_id
    ), corp AS (
        SELECT CAST(COALESCE(sum(dl), 0) AS BIGINT) AS s,
               CAST(count(*) AS BIGINT) AS n
        FROM dlen
    ), tf AS (
        SELECT doc_id, w, CAST(count(*) AS BIGINT) AS tf FROM tok
        WHERE w IN ({_terms_sql()}) GROUP BY 1, 2
    ), dfreq AS (
        SELECT w, CAST(count(DISTINCT doc_id) AS BIGINT) AS df FROM tok
        WHERE w IN ({_terms_sql()}) GROUP BY 1
    ), scored AS (
        SELECT tf.doc_id,
               CAST(count(*) AS BIGINT) AS n_terms,
               CAST(sum({_bm25_term_sql()}) AS BIGINT) AS bm25_micro
        FROM tf JOIN dfreq USING (w) JOIN dlen USING (doc_id) CROSS JOIN corp
        GROUP BY tf.doc_id
    ), rel AS (
        SELECT doc_id FROM scored WHERE n_terms = {len(_QUERY_TERMS)}
    ), nrel AS (
        SELECT CAST(count(*) AS BIGINT) AS r FROM rel
    ), top10 AS (
        SELECT doc_id,
               ROW_NUMBER() OVER (ORDER BY bm25_micro DESC, doc_id ASC) AS pos
        FROM scored ORDER BY bm25_micro DESC, doc_id ASC LIMIT {NDCG_K}
    ), hits AS (
        SELECT pos FROM top10 JOIN rel USING (doc_id)
    ), d AS (
        SELECT CAST(COALESCE(SUM({_dcg_gain_sql('pos')}), 0) AS BIGINT)
                   AS dcg_micro,
               CAST(count(*) AS BIGINT) AS rel_in_top10,
               CAST(MIN(pos) AS BIGINT) AS first_rel_pos
        FROM hits
    ), ideal AS (
        SELECT CAST(COALESCE(SUM({_dcg_gain_sql('i')}), 0) AS BIGINT)
                   AS idcg_micro
        FROM (SELECT unnest(range(1, CAST(least(r, {NDCG_K}) AS BIGINT) + 1))
                  AS i FROM nrel)
    )
    SELECT nrel.r AS n_relevant,
           d.rel_in_top10 AS rel_in_top10,
           CAST((1000 * d.rel_in_top10) // {NDCG_K} AS BIGINT) AS p_at10_milli,
           d.first_rel_pos AS first_rel_pos,
           CAST(COALESCE(1000000 // d.first_rel_pos, 0) AS BIGINT) AS mrr_micro,
           d.dcg_micro AS dcg_micro,
           ideal.idcg_micro AS idcg_micro,
           CASE WHEN ideal.idcg_micro = 0 THEN NULL
                ELSE CAST((1000000 * d.dcg_micro) // ideal.idcg_micro
                          AS BIGINT) END AS ndcg_micro
    FROM d CROSS JOIN ideal CROSS JOIN nrel
    """,
    doc="P@10, MRR and NDCG@10 of the BM25 ranking against all-terms "
        "containment relevance.",
)
def ranking_eval_bm25(spark: SparkSession, sf_dir: str) -> DataFrame:
    """No relevant documents in the corpus -> idcg 0 -> NDCG NULL (not a
    fake 0: an undefined metric must not average into dashboards); no
    relevant doc in the top 10 -> MRR/DCG 0 with NDCG 0.

    Plan shape: the scored frame is postings-bounded (bm25_search's
    shape); the top-10 cut is TakeOrderedAndProject; relevance joins
    broadcast the 10-row cut into the relevant-doc frame; everything
    after is 1-row arithmetic."""
    from pyspark.sql import Window
    from cliqz_etl_spark.operators.dedup import _materialize
    from cliqz_etl_spark.queries.timeseries import _bm25_corpus_frames

    # round-13: shared scan-side dl / query-term-only explode (see
    # _bm25_corpus_frames) — the corpus token cache is gone
    dlen, corp, qt = _bm25_corpus_frames(spark, sf_dir)
    tf = qt.groupBy("doc_id", "w").agg(F.count(F.lit(1)).cast("long").alias("tf"))
    dfreq = qt.groupBy("w").agg(F.countDistinct("doc_id").cast("long").alias("df"))
    scored = _materialize(
        tf.join(F.broadcast(dfreq), "w")
        .join(dlen, "doc_id")
        .crossJoin(F.broadcast(corp))
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).cast("long").alias("n_terms"),
             F.sum(F.expr(_bm25_term_sql())).cast("long").alias("bm25_micro")))
    rel = scored.where(F.col("n_terms") == len(_QUERY_TERMS)).select("doc_id")
    nrel = rel.agg(F.count(F.lit(1)).cast("long").alias("r"))
    top10 = (scored.orderBy(F.desc("bm25_micro"), F.asc("doc_id"))
             .limit(NDCG_K)
             .withColumn("pos", F.row_number().over(
                 Window.orderBy(F.desc("bm25_micro"), F.asc("doc_id")))))
    hits = rel.join(F.broadcast(top10.select("doc_id", "pos")), "doc_id")
    d = hits.agg(
        F.coalesce(F.sum(F.expr(_dcg_gain_sql("pos"))), F.lit(0)).cast("long")
        .alias("dcg_micro"),
        F.count(F.lit(1)).cast("long").alias("rel_in_top10"),
        F.min("pos").cast("long").alias("first_rel_pos"))
    ideal = (nrel.select(
        F.explode(F.expr(
            f"CASE WHEN r >= 1 THEN sequence(1, CAST(least(r, {NDCG_K}) AS INT))"
            " ELSE array() END")).alias("i"))
        .agg(F.coalesce(F.sum(F.expr(_dcg_gain_sql("i"))), F.lit(0))
             .cast("long").alias("idcg_micro")))
    # DuckDB's SUM-over-empty yields one NULL row; Spark's agg over an
    # empty frame yields one row too (global agg) — both 1-row, COALESCEd.
    return (d.crossJoin(F.broadcast(ideal)).crossJoin(F.broadcast(nrel))
            .select(
                F.col("r").alias("n_relevant"),
                "rel_in_top10",
                F.expr(f"CAST((1000 * rel_in_top10) div {NDCG_K} AS BIGINT)")
                .alias("p_at10_milli"),
                "first_rel_pos",
                F.coalesce(F.expr("1000000 div first_rel_pos"), F.lit(0))
                .cast("long").alias("mrr_micro"),
                "dcg_micro",
                "idcg_micro",
                F.expr("CASE WHEN idcg_micro = 0 THEN NULL "
                       "ELSE CAST((1000000 * dcg_micro) div idcg_micro "
                       "AS BIGINT) END").alias("ndcg_micro")))


# --------------------------------------------------------------------------
# Pseudo-relevance-feedback expansion — the query-rewrite step a
# production search stack runs between retrieval passes: take the
# top-PRF_R docs by BM25, mine their vocabulary, and rank candidate
# expansion terms by the Robertson/Sparck-Jones offer weight
#   ow(t) = r * ln( (r+1/2)(N-n-R+r+1/2) / ((n-r+1/2)(R-r+1/2)) ),
# r = pseudo-relevant docs containing t, n = corpus df, R = PRF_R,
# N = corpus size. Doubling every half-term makes all four ln()
# arguments exact BIGINT products (the bm25 idf move); the ln
# milli-quantizes BEFORE the integer r multiply. Terms whose smoothed
# numerator would go non-positive (stopword-grade df, n > N-R+r) are
# excluded on both engines — the standard PRF stopword guard.
# Work is bounded: the candidate vocabulary comes from PRF_R docs, and
# the corpus-df pass is the tok frame filtered by a broadcast of that
# bounded candidate set.
# --------------------------------------------------------------------------
PRF_R = 10          # pseudo-relevant depth
PRF_TOP_E = 15      # expansion terms reported


@query(
    "prf_expansion_terms",
    oracle=f"""
    WITH tok AS ({_tok_cte()}),
    dlen AS (
        SELECT doc_id, CAST(count(*) AS BIGINT) AS dl FROM tok GROUP BY doc_id
    ), corp AS (
        SELECT CAST(COALESCE(sum(dl), 0) AS BIGINT) AS s,
               CAST(count(*) AS BIGINT) AS n
        FROM dlen
    ), tf AS (
        SELECT doc_id, w, CAST(count(*) AS BIGINT) AS tf FROM tok
        WHERE w IN ({_terms_sql()}) GROUP BY 1, 2
    ), dfreq AS (
        SELECT w, CAST(count(DISTINCT doc_id) AS BIGINT) AS df FROM tok
        WHERE w IN ({_terms_sql()}) GROUP BY 1
    ), scored AS (
        SELECT tf.doc_id,
               CAST(sum({_bm25_term_sql()}) AS BIGINT) AS bm25_micro
        FROM tf JOIN dfreq USING (w) JOIN dlen USING (doc_id) CROSS JOIN corp
        GROUP BY tf.doc_id
    ), pseudo AS (
        SELECT doc_id FROM scored
        ORDER BY bm25_micro DESC, doc_id ASC LIMIT {PRF_R}
    ), cand AS (
        SELECT t.w, CAST(count(DISTINCT t.doc_id) AS BIGINT) AS r
        FROM tok t JOIN pseudo p ON p.doc_id = t.doc_id
        WHERE t.w NOT IN ({_terms_sql()})
        GROUP BY t.w
    ), cdf AS (
        SELECT t.w, CAST(count(DISTINCT t.doc_id) AS BIGINT) AS n_df
        FROM tok t WHERE t.w IN (SELECT w FROM cand) GROUP BY t.w
    ), nn AS (SELECT CAST(count(*) AS BIGINT) AS n_docs FROM dlen),
    weighted AS (
        SELECT c.w AS term, c.r AS r, d.n_df AS n_df,
               c.r * CAST(floor(1000 * ln(
                   CAST((2 * c.r + 1)
                        * (2 * (nn.n_docs - d.n_df - {PRF_R} + c.r) + 1)
                        AS DOUBLE)
                   / CAST((2 * (d.n_df - c.r) + 1)
                          * (2 * ({PRF_R} - c.r) + 1) AS DOUBLE)) + 0.5)
                   AS BIGINT) AS ow_milli
        FROM cand c JOIN cdf d USING (w) CROSS JOIN nn
        WHERE nn.n_docs - d.n_df - {PRF_R} + c.r >= 0
    )
    SELECT term, r, n_df, ow_milli
    FROM weighted
    ORDER BY ow_milli DESC, term ASC LIMIT {PRF_TOP_E}
    """,
    doc=f"Top-{PRF_TOP_E} RSJ offer-weight expansion terms from the "
        f"top-{PRF_R} BM25 pseudo-relevant documents.",
)
def prf_expansion_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Plan shape: the BM25 scoring reuses the postings-bounded pipeline;
    the PRF cut is TakeOrderedAndProject; the candidate vocabulary (the
    R docs' tokens) broadcasts into the corpus-df pass so the only
    data-sized work after scoring is one semi-filtered distinct; the
    weighting and the final top-E cut run on the candidate-vocab frame.
    Tie discipline: both cuts break on (score DESC, id/term ASC)."""
    from cliqz_etl_spark.functions.text import tokens
    from cliqz_etl_spark.operators.dedup import _materialize

    # round-13: the cache holds one token ARRAY per doc, not the corpus
    # token explode — doc lengths are size(tk) scan-side (the dlen
    # groupBy shuffle is gone), the BM25 part explodes only query-term
    # matches, the candidate mine explodes only the R pseudo-relevant
    # docs, and the corpus-df pass generates token rows once, straight
    # into the broadcast-filtered aggregate, never persisting them.
    docs = load_table(spark, sf_dir, "documents")
    per_doc = _materialize(
        docs.where(F.trim(F.col("text")) != "")
        .select("doc_id", tokens("text").alias("tk")))
    _terms_arr = F.array(*[F.lit(t) for t in _QUERY_TERMS])
    dlen = per_doc.select("doc_id", F.size("tk").cast("long").alias("dl"))
    corp = dlen.agg(
        F.coalesce(F.sum("dl"), F.lit(0)).cast("long").alias("s"),
        F.count(F.lit(1)).cast("long").alias("n"))
    qt = per_doc.select(
        "doc_id",
        F.explode(F.filter("tk", lambda w: F.array_contains(_terms_arr, w)))
        .alias("w"))
    tf = qt.groupBy("doc_id", "w").agg(F.count(F.lit(1)).cast("long").alias("tf"))
    dfreq = qt.groupBy("w").agg(F.countDistinct("doc_id").cast("long").alias("df"))
    scored = (tf.join(F.broadcast(dfreq), "w")
              .join(dlen, "doc_id")
              .crossJoin(F.broadcast(corp))
              .groupBy("doc_id")
              .agg(F.sum(F.expr(_bm25_term_sql())).cast("long")
                   .alias("bm25_micro")))
    pseudo = (scored.orderBy(F.desc("bm25_micro"), F.asc("doc_id"))
              .limit(PRF_R).select("doc_id"))
    cand = (per_doc.join(F.broadcast(pseudo), "doc_id")
            .select("doc_id", F.explode("tk").alias("w"))
            .where(~F.col("w").isin(list(_QUERY_TERMS)))
            .groupBy("w")
            .agg(F.countDistinct("doc_id").cast("long").alias("r")))
    cand = _materialize(cand)
    cdf = (per_doc.select("doc_id", F.explode("tk").alias("w"))
           .join(F.broadcast(cand.select("w")), "w")
           .groupBy("w")
           .agg(F.countDistinct("doc_id").cast("long").alias("n_df")))
    nn = dlen.agg(F.count(F.lit(1)).cast("long").alias("n_docs"))
    ow = (f"r * CAST(floor(1000 * ln("
          f"CAST((2 * r + 1) * (2 * (n_docs - n_df - {PRF_R} + r) + 1)"
          f" AS DOUBLE)"
          f" / CAST((2 * (n_df - r) + 1) * (2 * ({PRF_R} - r) + 1)"
          f" AS DOUBLE)) + 0.5) AS BIGINT)")
    weighted = (cand.join(cdf, "w")
                .crossJoin(F.broadcast(nn))
                .where(F.col("n_docs") - F.col("n_df") - PRF_R + F.col("r") >= 0)
                .select(F.col("w").alias("term"), "r", "n_df",
                        F.expr(ow).alias("ow_milli")))
    return (weighted.orderBy(F.desc("ow_milli"), F.asc("term"))
            .limit(PRF_TOP_E))

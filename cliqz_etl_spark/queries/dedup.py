"""Deduplication queries on the documents table, each oracle-checked.

The DuckDB oracle SQL is generated from the same constants (seed counts,
band layout, masks) as the Spark operators, so the two sides cannot drift.
The oracle mirrors the *algorithm* (shingle -> seeded-min -> band-bucket ->
pair join), not just the answer — a full cross-engine replication of the
pipeline.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cliqz_etl_spark.functions.hashing import (
    md5_long32_sql,
    md5_long_sql,
    perm_params,
    perm_sql,
)
from cliqz_etl_spark.operators.dedup import (
    SIMHASH_BANDS,
    SIMHASH_BITS,
    exact_duplicates,
    lsh_candidate_pairs,
    minhash_signatures as minhash_signatures_op,
    ngram_jaccard_pairs,
    simhash_near_pairs,
)
from cliqz_etl_spark.queries import query
from cliqz_etl_spark.tables import load_table

N_PERM = 16
N_BANDS = 4
SHINGLE_K = 3

# ---- shared DuckDB fragments ---------------------------------------------

_WS = "string_split_regex(trim(text), '\\s+')"
# k-word shingles with whole-text fallback for short docs — the SQL twin of
# functions/text.py::word_shingles.
_SHINGLES = (
    f"list_transform(range(1, greatest(len({_WS}) - {SHINGLE_K - 1}, 1) + 1), "
    f"i -> array_to_string({_WS}[i:i+{SHINGLE_K - 1}], ' '))"
)

# One md5 per shingle, then the integer permutation family — mirrors
# operators/dedup.py::minhash_signatures exactly (same perm_params).
_SIG_COLS = ", ".join(
    f"MIN({perm_sql('hs', a, b)}) AS mh_{i}"
    for i, (a, b) in enumerate(perm_params(N_PERM))
)
_SIG_CTE = f"""
    WITH sh AS (
        SELECT doc_id, {md5_long32_sql('s')} AS hs
        FROM (SELECT doc_id, unnest({_SHINGLES}) AS s FROM documents
              WHERE text IS NOT NULL)
    ), sig AS (
        SELECT doc_id, {_SIG_COLS} FROM sh GROUP BY doc_id
    )
"""

_ROWS_PER_BAND = N_PERM // N_BANDS


def _band_bucket_sql(b: int) -> str:
    concat = " || ',' || ".join(
        f"CAST(mh_{b * _ROWS_PER_BAND + r} AS VARCHAR)" for r in range(_ROWS_PER_BAND)
    )
    return md5_long_sql(f"({concat})")


_BUCKETS_CTE = _SIG_CTE + ", buckets AS (" + " UNION ALL ".join(
    f"SELECT doc_id, {b} AS band, {_band_bucket_sql(b)} AS bucket FROM sig"
    for b in range(N_BANDS)
) + ")"


@query(
    "dedup_exact",
    oracle="""
    SELECT md5(text) AS text_md5,
           MIN(doc_id) AS canonical_id,
           COUNT(*) AS n_copies
    FROM documents WHERE text IS NOT NULL GROUP BY md5(text)
    """,
)
def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup: md5 group-by, canonical row = min doc_id. NULL-text
    rows are excluded on both sides (family contract — without the filter
    the oracle would report NULL docs as copies of each other)."""
    docs = load_table(spark, sf_dir, "documents")
    return exact_duplicates(docs, "doc_id", "text")


@query(
    "minhash_signatures",
    oracle=_SIG_CTE + f"""
    SELECT doc_id AS doc_id, {', '.join(f'mh_{s} AS mh_{s}' for s in range(N_PERM))}
    FROM sig
    """,
)
def minhash_signatures(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full 16-permutation MinHash signature per document — verifies
    the shingle->hash->permute->min pipeline value-for-value. Spark
    computes it columnar (one md5 pass, then integer permutations, zero
    shuffle); the oracle is the exploded GROUP BY equivalent."""
    docs = load_table(spark, sf_dir, "documents")
    sigs = minhash_signatures_op(docs, "doc_id", "text", N_PERM, SHINGLE_K)
    return sigs.withColumnRenamed("_id", "doc_id")


@query(
    "dedup_incremental",
    oracle=_BUCKETS_CTE + """
    SELECT DISTINCT a.doc_id AS new_id, b.doc_id AS corpus_id
    FROM buckets a JOIN buckets b
      ON a.band = b.band AND a.bucket = b.bucket
    WHERE a.doc_id % 5 = 0 AND b.doc_id % 5 <> 0
    """,
)
def dedup_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ingest-time dedup: the 'new batch' (doc_id % 5 == 0, a fifth of the
    table) screened against the 'corpus' (the rest) via the LSH band
    index — batch-vs-corpus equi-join instead of corpus self-join, so a
    daily ingest pays for its own signatures only. The oracle replays the
    identical banding CTE with the same split predicate."""
    from cliqz_etl_spark.operators.dedup import incremental_lsh_matches

    docs = load_table(spark, sf_dir, "documents")
    batch = docs.where(F.col("doc_id") % 5 == 0)
    corpus = docs.where(F.col("doc_id") % 5 != 0)
    return incremental_lsh_matches(batch, corpus, "doc_id", "text",
                                   N_PERM, N_BANDS, SHINGLE_K)


@query(
    "dedup_minhash_lsh",
    oracle=_BUCKETS_CTE + """
    SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
    FROM buckets a JOIN buckets b
      ON a.band = b.band AND a.bucket = b.bucket AND a.doc_id < b.doc_id
    """,
)
def dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash-LSH candidate pairs (16 perms, 4 bands x 4 rows: the LSH
    S-curve puts the 50%-catch threshold at jaccard ~ 0.7)."""
    docs = load_table(spark, sf_dir, "documents")
    return lsh_candidate_pairs(docs, "doc_id", "text", N_PERM, N_BANDS, SHINGLE_K)


# ---- SimHash --------------------------------------------------------------

_CHUNK_BITS = SIMHASH_BITS // SIMHASH_BANDS
_CHUNK_MASK = (1 << _CHUNK_BITS) - 1

_SIMHASH_TERMS = " + ".join(
    f"(CASE WHEN 2 * len(list_filter(hh, h -> (h & {1 << b}) != 0)) >= n "
    f"THEN CAST({1 << b} AS BIGINT) ELSE 0 END)"
    for b in range(SIMHASH_BITS)
)
_SIMHASH_CTE = f"""
    WITH toks AS (
        SELECT doc_id, list_distinct({_WS}) AS tk FROM documents
        WHERE text IS NOT NULL
    ), hs AS (
        SELECT doc_id, list_transform(tk, t -> {md5_long_sql('t')}) AS hh,
               len(tk) AS n
        FROM toks
    ), sim AS (
        SELECT doc_id, {_SIMHASH_TERMS} AS sh FROM hs
    )
"""

_SIM_BUCKETS = _SIMHASH_CTE + ", chunks AS (" + " UNION ALL ".join(
    f"SELECT doc_id, sh, {j} AS band, (sh >> {j * _CHUNK_BITS}) & {_CHUNK_MASK} AS chunk FROM sim"
    for j in range(SIMHASH_BANDS)
) + ")"


@query(
    "simhash_values",
    oracle=_SIMHASH_CTE + "SELECT doc_id AS doc_id, sh AS simhash FROM sim",
)
def simhash_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The 60-bit SimHash itself, value-checked per document."""
    from cliqz_etl_spark.operators.dedup import simhash_df

    docs = load_table(spark, sf_dir, "documents")
    return simhash_df(docs, "doc_id", "text").select(
        F.col("_id").alias("doc_id"), F.col("sh").alias("simhash")
    )


@query(
    "dedup_simhash",
    oracle=_SIM_BUCKETS + """
    SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b,
           bit_count(xor(a.sh, b.sh)) AS hamming
    FROM chunks a JOIN chunks b
      ON a.band = b.band AND a.chunk = b.chunk AND a.doc_id < b.doc_id
    WHERE bit_count(xor(a.sh, b.sh)) <= 2
    """,
)
def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-dup pairs, hamming <= 2. Candidates from the 20-bit
    chunk equi-join (3 chunks: pigeonhole guarantees no false negatives
    below hamming 3)."""
    docs = load_table(spark, sf_dir, "documents")
    return simhash_near_pairs(docs, "doc_id", "text", max_hamming=2)


def _ngram_jaccard_oracle(max_freq: int, threshold_x10k: int,
                          metric: str = "jaccard") -> str:
    """Oracle twin of operators/dedup.py::ngram_jaccard_pairs including the
    per-shingle doc-frequency cutoff and the post-filter size recount (the
    denominator must count only surviving shingles). ``metric`` selects
    the same denominator the operator's ``metric`` parameter does —
    jaccard (union) or containment (min set size) — so the two gates can
    never desynchronize on the shared postings logic."""
    if metric == "containment":
        denom, out = "least(sa.sz, sb.sz)", "containment_x10k"
    else:
        denom, out = "(sa.sz + sb.sz - n_common)", "jaccard_x10k"
    score = f"CAST(floor(CAST(n_common AS DOUBLE) / {denom} * 10000 + 0.5) AS BIGINT)"
    return f"""
    WITH sh0 AS (
        -- the operator joins on the shingle's 60-bit md5, not the raw
        -- string (shuffle-width optimization); hash here identically so
        -- even a collision would reproduce bit-for-bit
        SELECT doc_id, {md5_long_sql('s')} AS s
        FROM (SELECT doc_id, unnest(list_distinct({_SHINGLES})) AS s
              FROM documents WHERE text IS NOT NULL)
    ), keep AS (
        SELECT s FROM sh0 GROUP BY s HAVING COUNT(*) <= {max_freq}
    ), sh AS (
        SELECT sh0.doc_id, sh0.s FROM sh0 JOIN keep ON keep.s = sh0.s
    ), sizes AS (
        SELECT doc_id, COUNT(*) AS sz FROM sh GROUP BY doc_id
    ), common AS (
        SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS n_common
        FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
        GROUP BY 1, 2
    )
    SELECT id_a AS id_a, id_b AS id_b,
           {score} AS {out}
    FROM common
    JOIN sizes sa ON sa.doc_id = id_a
    JOIN sizes sb ON sb.doc_id = id_b
    WHERE {score} >= {threshold_x10k}
    """


@query(
    "dedup_ngram_jaccard",
    oracle=_ngram_jaccard_oracle(max_freq=1000, threshold_x10k=2000),
)
def dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact 3-gram-shingle Jaccard >= 0.2 via inverted-index join, with
    the default doc-frequency skew guard (1000) mirrored in the oracle."""
    docs = load_table(spark, sf_dir, "documents")
    return ngram_jaccard_pairs(docs, "doc_id", "text", SHINGLE_K, threshold=0.2)


@query(
    "dedup_ngram_containment",
    oracle=_ngram_jaccard_oracle(max_freq=1000, threshold_x10k=6000,
                             metric="containment"),
)
def dedup_ngram_containment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Asymmetric near-dup: 3-gram-shingle containment >= 0.6 — flags a
    shorter document substantially embedded in a longer one, which the
    symmetric Jaccard metric dilutes below any usable threshold. Same
    inverted-index plan as dedup_ngram_jaccard (one postings build, one
    hash self-join, map-side-combined pair counts); only the
    denominator changes."""
    docs = load_table(spark, sf_dir, "documents")
    return ngram_jaccard_pairs(docs, "doc_id", "text", SHINGLE_K,
                               threshold=0.6, metric="containment")


@query(
    "dedup_ngram_jaccard_guarded",
    oracle=_ngram_jaccard_oracle(max_freq=5, threshold_x10k=1000),
)
def dedup_ngram_jaccard_guarded(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The skew-guard cutoff path under load: max_shingle_freq=5 actually
    drops shingles at sf0.01 (29 shingles appear in >5 of 500 docs), so
    this query verifies the post-filter size recount end-to-end — the
    denominator must shrink with the dropped shingles on both engines."""
    docs = load_table(spark, sf_dir, "documents")
    return ngram_jaccard_pairs(docs, "doc_id", "text", SHINGLE_K,
                               threshold=0.1, max_shingle_freq=5)


# --------------------------------------------------------------------------
# The two-stage cascade: LSH candidates verified with EXACT Jaccard — the
# production dedup shape (generate loosely within bucket bounds, verify
# exactly on the small candidate set). The oracle composes the banding
# CTE with an exact-overlap count over hashed shingles, mirroring both
# stages value-for-value.
# --------------------------------------------------------------------------
_CASCADE_THRESHOLD_X10K = 9600

_HASHED_SHINGLES_CTE = f"""
    , shd AS (
        SELECT doc_id, {md5_long_sql('s')} AS s
        FROM (SELECT doc_id, unnest(list_distinct({_SHINGLES})) AS s
              FROM documents WHERE text IS NOT NULL)
    ), sizes AS (
        SELECT doc_id, COUNT(*) AS sz FROM shd GROUP BY doc_id
    )
"""


@query(
    "dedup_cascade",
    oracle=_BUCKETS_CTE + _HASHED_SHINGLES_CTE + f"""
    , cand AS (
        SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
        FROM buckets a JOIN buckets b
          ON a.band = b.band AND a.bucket = b.bucket AND a.doc_id < b.doc_id
    ), common AS (
        SELECT c.id_a, c.id_b, COUNT(*) AS n_common
        FROM cand c
        JOIN shd a ON a.doc_id = c.id_a
        JOIN shd b ON b.doc_id = c.id_b AND b.s = a.s
        GROUP BY 1, 2
    )
    SELECT id_a AS id_a, id_b AS id_b,
           CAST(floor(CAST(n_common AS DOUBLE) / (sa.sz + sb.sz - n_common)
                      * 10000 + 0.5) AS BIGINT) AS jaccard_x10k
    FROM common
    JOIN sizes sa ON sa.doc_id = id_a
    JOIN sizes sb ON sb.doc_id = id_b
    WHERE CAST(floor(CAST(n_common AS DOUBLE) / (sa.sz + sb.sz - n_common)
                     * 10000 + 0.5) AS BIGINT) >= {_CASCADE_THRESHOLD_X10K}
    """,
)
def dedup_cascade(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH candidates (4x4 banding) -> exact Jaccard >= 0.96 verification
    on candidates only; the exact stage touches only docs appearing in a
    candidate pair, and the threshold sits inside the corpus's candidate
    similarity range so the gate exercises the pruning path (5 of 25
    candidates drop at sf0.01)."""
    from cliqz_etl_spark.operators.dedup import lsh_verified_pairs

    docs = load_table(spark, sf_dir, "documents")
    return lsh_verified_pairs(docs, "doc_id", "text", N_PERM, N_BANDS,
                              SHINGLE_K, _CASCADE_THRESHOLD_X10K / 10000)


SPAN_K = 10  # chunk granularity (tokens) for C4-style span dedup


@query(
    "dedup_spans",
    oracle=f"""
    WITH t AS (
        SELECT doc_id, string_split_regex(trim(text), '\\s+') AS tk
        FROM documents WHERE trim(text) <> ''
    ), ch0 AS (
        SELECT doc_id,
               unnest(list_transform(range((len(tk) + {SPAN_K - 1}) // {SPAN_K}),
                   i -> {{'chunk_idx': CAST(i AS BIGINT),
                          'chunk': array_to_string(
                              tk[i*{SPAN_K}+1 : i*{SPAN_K}+{SPAN_K}], ' ')}})) AS c
        FROM t
    ), ch AS (
        SELECT doc_id, c.chunk_idx AS chunk_idx, c.chunk AS chunk,
               CAST(doc_id AS BIGINT) * 1048576 + c.chunk_idx AS key
        FROM ch0
    ), win AS (
        SELECT chunk, min(key) AS keep FROM ch GROUP BY chunk
    ), kept AS (
        SELECT ch.doc_id, CAST(count(*) AS BIGINT) AS n_kept,
               string_agg(ch.chunk, ' ' ORDER BY ch.chunk_idx) AS text_kept
        FROM ch JOIN win USING (chunk)
        WHERE ch.key = win.keep
        GROUP BY ch.doc_id
    ), tot AS (
        SELECT doc_id, CAST(count(*) AS BIGINT) AS n FROM ch GROUP BY doc_id
    )
    SELECT tot.doc_id AS doc_id,
           coalesce(kept.text_kept, '') AS text_kept,
           CAST(coalesce(kept.n_kept, 0) AS BIGINT) AS n_kept,
           CAST(tot.n - coalesce(kept.n_kept, 0) AS BIGINT) AS n_dropped
    FROM tot LEFT JOIN kept USING (doc_id)
    """,
)
def dedup_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C4-rule span dedup: every {SPAN_K}-token chunk that repeats anywhere
    in the corpus survives only at its earliest (doc, position); documents
    are reassembled from their surviving chunks. The oracle replays the
    identical chunk -> MIN(packed key) -> rebuild pipeline in DuckDB."""
    from cliqz_etl_spark.operators.dedup import span_dedup

    docs = load_table(spark, sf_dir, "documents")
    return span_dedup(docs, "doc_id", "text", SPAN_K)


# --------------------------------------------------------------------------
# Exact-substring dedup at the window level (Lee et al. 2021,
# "Deduplicating Training Data Makes Language Models Better"): unlike the
# C4 span dedup above (fixed NON-overlapping SPAN_K chunks), this slides a
# W-token window at stride 1, so a duplicated passage is caught at ANY
# token alignment — the property the suffix-array construction in the
# paper buys, here bought with hashed windows instead (the shape that
# stays a keyed groupBy/join on a cluster; a distributed suffix array is
# a research project). An occurrence is duplicate iff an earlier
# occurrence of the same window exists anywhere, earlier = smaller
# (doc_id, win_idx) packed key — so within-doc repetition counts too,
# exactly like the paper's "remove every repeat" rule.
# --------------------------------------------------------------------------
SUBSTR_W = 8  # window width (tokens); the paper uses 50 BPE tokens at scale

# Stride-1 window machinery shared by the PROFILE (dedup_exact_substrings)
# and REMOVAL (dedup_substring_removal) queries — the window construction,
# the 60-bit md5 keying, the doc_id*2^20+win_idx packing, and the MIN-key
# winner table each exist in exactly ONE place per engine, so the two
# gates cannot disagree about which occurrences are duplicates.
_SUBSTR_BASE_CTES = f"""
    WITH t AS (
        SELECT doc_id, {_WS} AS tk FROM documents WHERE trim(text) <> ''
    ), w0 AS (
        SELECT doc_id,
               unnest(list_transform(range(len(tk) - {SUBSTR_W} + 1),
                   i -> {{'win_idx': CAST(i AS BIGINT),
                          'win': array_to_string(
                              tk[i + 1 : i + {SUBSTR_W}], ' ')}})) AS c
        FROM t WHERE len(tk) >= {SUBSTR_W}
    ), w AS (
        SELECT doc_id, c.win_idx AS win_idx, {md5_long_sql('c.win')} AS h,
               CAST(doc_id AS BIGINT) * 1048576 + c.win_idx AS key
        FROM w0
    ), m AS (
        SELECT h, min(key) AS keep FROM w GROUP BY h
    )"""


def _substr_token_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, tk) for non-blank docs — the engine twin of CTE ``t``."""
    from cliqz_etl_spark.functions.text import tokens
    from cliqz_etl_spark.operators.dedup import _spread

    return (_spread(load_table(spark, sf_dir, "documents")
                    .select("doc_id", "text"))
            .where(F.trim(F.col("text")) != "")
            .select("doc_id", tokens("text").alias("tk")))


def _substr_window_keys(base: DataFrame) -> DataFrame:
    """(h, key) — the engine twin of CTEs ``w0``/``w``, narrowed to the
    16 bytes the dedup decision needs (guide §2.3): ``key`` packs
    (doc_id, win_idx) reversibly (doc_id = key div 2^20, win_idx =
    key mod 2^20), so occurrence identity never needs the wider row."""
    from cliqz_etl_spark.functions.hashing import md5_long

    W = SUBSTR_W
    wins = (base.where(F.size("tk") >= W)
            .select("doc_id", F.posexplode(F.transform(
                F.sequence(F.lit(1), F.size("tk") - W + 1),
                lambda i: F.array_join(F.slice("tk", i, W), " ")))
                .alias("win_idx", "win")))
    return wins.select(
        md5_long(F.col("win")).alias("h"),
        (F.col("doc_id") * F.lit(1048576) + F.col("win_idx")).alias("key"))


def _substr_dup_occurrences(base: DataFrame) -> DataFrame:
    """(doc_id, win_idx) of every DUPLICATE window occurrence — every
    occurrence whose packed key is not its hash's global MIN.

    One window-keys subtree, one corpus x W shuffle: the (h, key) frame
    is repartitioned by h ONCE and both consumers — the MIN(key) winner
    aggregate and the join probe — hang off that same exchange (guide
    §2.4: two operations keyed the same way share one exchange; the
    physical plan carries a ReusedExchange where the naive
    aggregate-then-join re-derived the window explode AND paid a second
    h-keyed shuffle for the probe side). The aggregate runs complete-mode
    on the clustered partitions; the join adds no exchange because both
    sides already share the h partitioning. Hot boilerplate windows land
    in one partition either way — exactly as they did on the old probe
    side — and the aggregate/join both stream, so no per-key state grows
    with occurrence count. doc_id/win_idx are recovered arithmetically
    from the packed key after the join, keeping the shuffled row at
    16 bytes."""
    # The three isnotnull conjuncts are vacuously true (doc_id/win_idx
    # are non-null by construction) but load-bearing: the downstream
    # joins push exactly these predicates into the PROBE branch only,
    # and a filter present on one branch but not the other breaks the
    # canonical-plan equality the shuffle-stage reuse depends on.
    # Stating them explicitly puts the identical conjunct set on both
    # branches, so AQE materializes ONE shuffle stage and the second
    # consumer reads it back instead of re-running the explode.
    w = (_substr_window_keys(base)
         .where(F.col("h").isNotNull() & F.col("key").isNotNull()
                & F.expr("key div 1048576").isNotNull())
         .repartition("h"))
    m = w.groupBy("h").agg(F.min("key").alias("keep"))
    return (w.join(m, "h").where(F.col("key") > F.col("keep"))
            .select(F.expr("key div 1048576").alias("doc_id"),
                    F.expr("key % 1048576").alias("win_idx")))


@query(
    "dedup_exact_substrings",
    oracle=_SUBSTR_BASE_CTES + """
    SELECT w.doc_id AS doc_id,
           CAST(count(*) AS BIGINT) AS n_windows,
           CAST(sum(CASE WHEN w.key > m.keep THEN 1 ELSE 0 END)
                AS BIGINT) AS n_dup,
           CAST((sum(CASE WHEN w.key > m.keep THEN 1 ELSE 0 END) * 1000000)
                // count(*) AS BIGINT) AS dup_ppm
    FROM w JOIN m USING (h) GROUP BY w.doc_id
    """,
)
def dedup_exact_substrings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document duplicated-substring profile over stride-1 windows.

    Every doc with >= W tokens emits its n-W+1 sliding windows; each
    window occurrence carries the packed key doc_id*2^20 + win_idx (the
    dedup_spans packing; win_idx < 2^20 holds to ~1M tokens/doc) and the
    60-bit md5 of the window text. The global MIN(key) per window hash
    marks the canonical first occurrence; everything later is duplicate.
    Output: n_windows, n_dup, and integer-exact dup_ppm per doc — the
    removal mask a rewrite pass would apply, in the same batch-profile
    form the rest of the dedup family reports.

    Plan shape: scan-side transform/explode (W-times expansion, the price
    of alignment-free matching — the windows never materialize to disk),
    ONE h-keyed shuffle shared by the winner aggregate and the join probe
    (see _substr_dup_occurrences — the old shape paid two h shuffles and
    re-ran the explode per consumer), then a duplicates-only groupBy(doc)
    joined back onto the doc-grain token frame: n_windows is just
    size(tk) - W + 1, so the corpus x W join output never feeds the final
    aggregate — only duplicate occurrences do. 60-bit hashes collide at
    ~n^2/2^61; identical md5 on both engines keeps the oracle exact
    regardless — at real corpus scale widen to the full 128-bit digest.

    base is deliberately NOT persisted: the window subtree's shuffle
    reuse (see _substr_dup_occurrences) requires both consumers to plan
    from the parquet scan — a cached leaf re-instanced under a self-join
    never canonicalizes equal in Spark 4, so caching here would silently
    re-run the explode AND pay a second h shuffle. The price is one
    extra pruned parquet scan of documents, strictly cheaper than
    caching the tokenized corpus."""
    W = SUBSTR_W
    base = _substr_token_frame(spark, sf_dir)
    nw = (base.where(F.size("tk") >= W)
          .select("doc_id",
                  (F.size("tk") - W + 1).cast("long").alias("n_windows")))
    nd = (_substr_dup_occurrences(base)
          .groupBy("doc_id")
          .agg(F.count(F.lit(1)).cast("long").alias("nd")))
    return (nw.join(nd, "doc_id", "left")
            .select("doc_id", "n_windows",
                    F.coalesce("nd", F.lit(0).cast("long")).alias("n_dup"))
            .select("doc_id", "n_windows", "n_dup",
                    F.expr("(n_dup * 1000000) div n_windows").cast("long")
                    .alias("dup_ppm")))


# --------------------------------------------------------------------------
# Exact-substring REMOVAL (the rewrite pass of Lee et al. 2021): where
# dedup_exact_substrings reports the per-doc duplication PROFILE, this
# applies the rule — every token covered by a duplicate window occurrence
# is removed, documents are reassembled from the surviving tokens, and
# the per-doc output carries the surviving-range structure (how many
# removal runs) plus the reassembled text length, oracle-checked
# character-exact. Coverage is computed by exploding each duplicate
# occurrence into its W token positions and distinct-ing — bounded by
# n_dup_windows x W, the same order as the window explode that found
# them (never corpus^2); covered positions then collapse to one sorted
# array per affected doc, and runs/survivors/rebuilt-length are per-doc
# array algebra against the cached token frame — duplicate-derived rows
# are the only thing that ever shuffles after the h join.
# --------------------------------------------------------------------------


@query(
    "dedup_substring_removal",
    oracle=_SUBSTR_BASE_CTES + f"""
    , toks0 AS (
        SELECT doc_id, unnest(list_transform(range(len(tk)),
            i -> {{'pos': CAST(i AS BIGINT), 'tok': tk[i + 1]}})) AS c
        FROM t
    ), toks AS (
        SELECT doc_id, c.pos AS pos, c.tok AS tok FROM toks0
    ), occ AS (
        SELECT w.doc_id, w.win_idx FROM w JOIN m USING (h)
        WHERE w.key > m.keep
    ), cov AS (
        SELECT DISTINCT doc_id, CAST(unnest(range(win_idx,
            win_idx + {SUBSTR_W})) AS BIGINT) AS pos
        FROM occ
    ), fl AS (
        SELECT toks.doc_id AS doc_id, toks.pos AS pos, toks.tok AS tok,
               CASE WHEN cov.pos IS NULL THEN 0 ELSE 1 END AS rm
        FROM toks LEFT JOIN cov
          ON cov.doc_id = toks.doc_id AND cov.pos = toks.pos
    ), runs AS (
        SELECT doc_id, pos, tok, rm,
               CASE WHEN rm = 1 AND coalesce(lag(rm) OVER
                    (PARTITION BY doc_id ORDER BY pos ASC), 0) = 0
                    THEN 1 ELSE 0 END AS rs
        FROM fl
    )
    SELECT doc_id AS doc_id,
           CAST(count(*) AS BIGINT) AS n_tok,
           CAST(sum(1 - rm) AS BIGINT) AS n_kept_tok,
           CAST(sum(rs) AS BIGINT) AS n_removed_runs,
           CAST(coalesce(len(string_agg(CASE WHEN rm = 0 THEN tok END,
                ' ' ORDER BY pos ASC)), 0) AS BIGINT) AS kept_len
    FROM runs GROUP BY doc_id
    """,
    doc="Lee-et-al exact-substring rewrite: remove every token covered "
        "by a duplicate stride-1 window occurrence, reassemble docs "
        "from survivors; per-doc removal-run count and rebuilt length.",
)
def dedup_substring_removal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The transform stage the dedup_exact_substrings profile implies.

    Pipeline: the member's window->MIN(packed key) machinery finds
    duplicate occurrences (ONE window-keys subtree / ONE h shuffle —
    _substr_dup_occurrences); each explodes into its W covered token
    positions (distinct-ed, so overlapping duplicate windows never
    double-remove); positions aggregate to ONE sorted array per affected
    doc, and everything else — removal runs, survivor selection, the
    rebuilt length — is per-doc array algebra against the cached token
    frame. No token ever explodes into its own row: the old shape paid a
    corpus-token posexplode, a corpus-token (doc_id, pos) join, a second
    corpus-token doc-keyed exchange for the lag window, and an
    O(n log n) collect_list sort per doc; this shape touches corpus
    tokens only inside per-doc array expressions (array_except is one
    hash pass, the gap count is one linear zip) and shuffles only
    duplicate-derived rows.

    At 100 TB: coverage is n_dup x W rows (duplicates only, not the
    corpus), the winner table is one row per DISTINCT window, and the
    only doc-keyed frames after the h join are duplicates-only (cov,
    covd) plus the doc-grain join back onto the cached base. Docs
    shorter than W tokens carry no windows and survive whole; a doc
    whose every token is covered comes back n_kept_tok=0, kept_len=0
    (both engines rebuild the empty string).

    base is deliberately NOT persisted: the window subtree's shuffle
    reuse (see _substr_dup_occurrences) requires both consumers to plan
    from the parquet scan — a cached leaf re-instanced under a self-join
    never canonicalizes equal in Spark 4, so caching here would silently
    re-run the explode AND pay a second h shuffle. The price is one
    extra pruned parquet scan of documents, strictly cheaper than
    caching the tokenized corpus."""
    W = SUBSTR_W
    base = _substr_token_frame(spark, sf_dir)
    occ = _substr_dup_occurrences(base)
    # Aggregate duplicate win_idx per doc FIRST, then expand each window
    # into its W covered positions inside a per-doc array expression:
    # the doc-keyed shuffle carries n_dup rows, not n_dup x W exploded
    # positions, and collect_set subsumes the distinct the old exploded
    # shape needed (one exchange instead of two). cv stays bounded by
    # the doc's own token count (positions are distinct and < n_tok),
    # so the per-doc array is no bigger than the token array the query
    # already holds per row.
    covd = (occ.groupBy("doc_id")
            .agg(F.collect_set("win_idx").alias("wis"))
            .select("doc_id", F.sort_array(F.array_distinct(F.flatten(
                F.transform("wis", lambda wi: F.sequence(
                    wi, wi + W - 1))))).alias("cv")))
    marked = (base.join(covd, "doc_id", "left")
              .select("doc_id", "tk",
                      F.coalesce("cv", F.expr("array()").cast("array<long>"))
                      .alias("cv"))
              .withColumn("kp", F.expr(
                  "array_except(sequence(0L, cast(size(tk) as bigint) - 1L),"
                  " cv)")))
    return marked.select(
        "doc_id",
        F.size("tk").cast("long").alias("n_tok"),
        F.size("kp").cast("long").alias("n_kept_tok"),
        # removal runs = 1 + gaps between consecutive covered positions
        # (cv is sorted): identical to the old lag-window 0->1 count.
        F.expr(
            "cast(case when size(cv) = 0 then 0 else 1 + "
            "size(filter(zip_with(slice(cv, 2, size(cv) - 1), "
            "slice(cv, 1, size(cv) - 1), (a, b) -> a - b), g -> g > 1)) "
            "end as bigint)").alias("n_removed_runs"),
        F.length(F.array_join(F.expr(
            "transform(kp, p -> element_at(tk, cast(p + 1 as int)))"), " "))
        .cast("long").alias("kept_len"))


# --------------------------------------------------------------------------
# Prefix-filtered exact all-pairs Jaccard join (PPJoin family, Chaudhuri
# et al. 2006 / Xiao et al. 2008): the NO-false-negative exact similarity
# join. Tokens are globally ordered rarest-first (document frequency asc,
# token asc); each document indexes only its PREFIX — the first
# n - ceil(t*n) + 1 tokens in that order — and the prefix-filter theorem
# guarantees any pair with Jaccard >= t shares at least one prefix
# token. Candidate volume collapses because prefixes are dominated by
# RARE tokens (short postings lists), which is exactly why this beats
# the full inverted index (dedup_ngram_jaccard's shape) at the same
# exactness: the stopword postings that force that operator's skew guard
# never enter the index here. Verification is exact set intersection;
# the threshold compare is pure integers (10*i >= 7*(na+nb-i) <=>
# jac >= 0.7), so no float ever decides membership.
# --------------------------------------------------------------------------
_PF_T_NUM, _PF_T_DEN = 7, 10  # Jaccard threshold 0.7 as an exact rational


@query(
    "dedup_prefix_filter",
    oracle=f"""
    WITH tok AS (
        SELECT DISTINCT doc_id, unnest({_WS}) AS w
        FROM documents WHERE trim(text) <> ''
    ), vocab AS (
        SELECT w, count(*) AS df FROM tok GROUP BY w
    ), ranked AS (
        SELECT w, ROW_NUMBER() OVER (ORDER BY df ASC, w ASC) AS r FROM vocab
    ), d AS (
        SELECT doc_id, CAST(count(*) AS BIGINT) AS n,
               list_sort(list(r)) AS rs
        FROM tok JOIN ranked USING (w) GROUP BY doc_id
    ), pre AS (
        SELECT doc_id,
               unnest(rs[1 : CAST(n - ceil({_PF_T_NUM} / {_PF_T_DEN}.0 * n)
                               + 1 AS BIGINT)]) AS r
        FROM d
    ), cand AS (
        SELECT DISTINCT a.doc_id AS da, b.doc_id AS db
        FROM pre a JOIN pre b ON b.r = a.r AND a.doc_id < b.doc_id
    ), pairs AS (
        SELECT da, db, x.n AS na, y.n AS nb,
               CAST(len(list_intersect(x.rs, y.rs)) AS BIGINT) AS i
        FROM cand JOIN d x ON x.doc_id = cand.da
                  JOIN d y ON y.doc_id = cand.db
    )
    SELECT da AS doc_a, db AS doc_b,
           CAST((1000 * i) // (na + nb - i) AS BIGINT) AS jac_x1000
    FROM pairs
    WHERE {_PF_T_DEN} * i >= {_PF_T_NUM} * (na + nb - i)
    """,
)
def dedup_prefix_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact word-set Jaccard >= 0.7 pairs via prefix filtering.

    Plan shape: one distinct-token pass builds the vocabulary; the
    rarity ranking is a ranged_cumsum running count over the composite
    (df, w) key — partition-parallel even when the vocabulary itself is
    huge (no single-task sort anywhere in this query); per-doc sorted
    rank arrays come from one
    groupBy(doc); the candidate join indexes ONLY prefix tokens, so
    postings lists are short by construction (rare tokens lead the
    order) — the property that makes this exact join feasible where a
    full inverted index needs dedup_ngram_jaccard's frequency cutoff;
    verification reads the two persisted rank arrays and decides with
    integer arithmetic."""
    from cliqz_etl_spark.functions.text import tokens
    from cliqz_etl_spark.operators.dedup import _materialize, _spread
    from cliqz_etl_spark.operators.stats import ranged_cumsum

    t_frac = _PF_T_NUM / _PF_T_DEN
    docs = _spread(load_table(spark, sf_dir, "documents")
                   .select("doc_id", "text"))
    tok = (docs.where(F.trim(F.col("text")) != "")
           .select("doc_id", F.explode(tokens("text")).alias("w"))
           .distinct())
    vocab = tok.groupBy("w").agg(F.count(F.lit(1)).alias("df"))
    # (df, w) is unique per vocab row, so the running count IS the
    # row_number of the global rarity order — partition-parallel
    ranked = (ranged_cumsum(vocab.withColumn("one", F.lit(1)),
                            ["df", "w"], ["one"])
              .select("w", F.col("cum_one").cast("long").alias("r")))
    d = _materialize(
        tok.join(ranked, "w")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).cast("long").alias("n"),
             F.sort_array(F.collect_list("r")).alias("rs")))
    plen = (F.col("n") - F.ceil(F.lit(t_frac) * F.col("n")) + 1).cast("int")
    pre = d.select("doc_id", F.explode(F.slice("rs", 1, plen)).alias("r"))
    cand = (pre.alias("a").join(pre.alias("b"), "r")
            .where(F.col("a.doc_id") < F.col("b.doc_id"))
            .select(F.col("a.doc_id").alias("da"), F.col("b.doc_id").alias("db"))
            .distinct())
    x = d.select(F.col("doc_id").alias("da"), F.col("n").alias("na"),
                 F.col("rs").alias("ra"))
    y = d.select(F.col("doc_id").alias("db"), F.col("n").alias("nb"),
                 F.col("rs").alias("rb"))
    i = F.size(F.array_intersect("ra", "rb")).cast("long")
    return (cand.join(x, "da").join(y, "db")
            .withColumn("i", i)
            .where(F.lit(_PF_T_DEN) * F.col("i")
                   >= F.lit(_PF_T_NUM) * (F.col("na") + F.col("nb") - F.col("i")))
            .select(F.col("da").alias("doc_a"), F.col("db").alias("doc_b"),
                    F.expr("(1000 * i) div (na + nb - i)").cast("long")
                    .alias("jac_x1000")))

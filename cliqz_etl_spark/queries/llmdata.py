"""Training-data curation operators: deterministic sampling, stratified
quotas, train/val/test splitting, text normalization, and near-duplicate
cluster assignment. These are the ops a 100 TB corpus pipeline runs after
dedup/quality scoring to assemble a training mix — all hash-deterministic
(md5 family), so re-runs and oracle checks are exact.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from cliqz_etl_spark.functions.hashing import md5_long, md5_long_sql
from cliqz_etl_spark.queries import query
from cliqz_etl_spark.tables import load_table


@query(
    "sample_10pct",
    oracle=f"""
    SELECT doc_id AS doc_id, lang AS lang
    FROM documents
    WHERE {md5_long_sql('doc_id')} % 10 = 0
    """,
)
def sample_10pct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic ~10% sample by id hash — reproducible across runs and
    engines, unlike rand()-based sampling; filter pushes to the scan."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.where(md5_long("doc_id") % 10 == 0).select("doc_id", "lang")


@query(
    "stratified_sample",
    oracle=f"""
    SELECT doc_id AS doc_id, lang AS lang, CAST(rn AS BIGINT) AS rn
    FROM (
        SELECT doc_id, lang,
               ROW_NUMBER() OVER (PARTITION BY lang
                                  ORDER BY {md5_long_sql('doc_id')} ASC, doc_id ASC) AS rn
        FROM documents
    ) WHERE rn <= 20
    """,
)
def stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-stratum quota (20 docs per language), selected in hash order —
    a deterministic 'random' draw with exact per-group counts. The window
    shuffles once on the stratum key."""
    docs = load_table(spark, sf_dir, "documents")
    w = Window.partitionBy("lang").orderBy(md5_long("doc_id").asc(), F.col("doc_id").asc())
    return (
        docs.withColumn("rn", F.row_number().over(w).cast("long"))
        .where(F.col("rn") <= 20)
        .select("doc_id", "lang", "rn")
    )


@query(
    "train_test_split",
    oracle=f"""
    SELECT lang AS lang,
           CASE WHEN {md5_long_sql("doc_id || '-split'")} % 100 < 80 THEN 'train'
                WHEN {md5_long_sql("doc_id || '-split'")} % 100 < 90 THEN 'val'
                ELSE 'test' END AS split,
           COUNT(*) AS n_docs
    FROM documents GROUP BY 1, 2
    """,
)
def train_test_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """80/10/10 split keyed on a salted id hash: stable under re-runs,
    additions don't reshuffle existing assignments."""
    docs = load_table(spark, sf_dir, "documents")
    bucket = md5_long(F.concat(F.col("doc_id").cast("string"), F.lit("-split"))) % 100
    split = (
        F.when(bucket < 80, "train").when(bucket < 90, "val").otherwise("test")
    )
    return docs.groupBy("lang", split.alias("split")).agg(
        F.count(F.lit(1)).alias("n_docs")
    )


@query(
    "normalize_text",
    oracle="""
    SELECT doc_id AS doc_id,
           md5(trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9\\s]', '', 'g'),
                                   '\\s+', ' ', 'g'))) AS norm_md5,
           (trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9\\s]', '', 'g'),
                                '\\s+', ' ', 'g')) = text) AS unchanged
    FROM documents
    """,
)
def normalize_text(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Canonical text normalization (lowercase, strip non-alnum, collapse
    whitespace) — emitted as md5 so the oracle compares content without
    hauling full strings through the harness."""
    docs = load_table(spark, sf_dir, "documents")
    norm = F.trim(F.regexp_replace(
        F.regexp_replace(F.lower(F.col("text")), r"[^a-z0-9\s]", ""), r"\s+", " "
    ))
    return docs.select(
        "doc_id",
        F.md5(norm).alias("norm_md5"),
        (norm == F.col("text")).alias("unchanged"),
    )


# The connected-components oracle fragment shared by dedup_clusters and
# dedup_canonicalize (identical edge definition and transitive closure).
# Mirrors ngram_jaccard_pairs faithfully INCLUDING the default
# doc-frequency skew guard (max_shingle_freq=1000): the Spark side drops
# shingles hotter than the cutoff and recounts Jaccard denominators on the
# survivors, so the oracle must too — no shingle exceeds the cutoff at the
# checked scale factors, but a corpus where one does would otherwise
# produce different edges on an otherwise-correct query.
_CLUSTERS_MAX_FREQ = 1000
_CLUSTERS_SQL = f"""
    WITH sh0 AS (
        SELECT doc_id, unnest(list_distinct(list_transform(
            range(1, greatest(len(string_split_regex(trim(text), '\\s+')) - 2, 1) + 1),
            i -> array_to_string(string_split_regex(trim(text), '\\s+')[i:i+2], ' ')))) AS s
        FROM documents
    ), keep AS (
        SELECT s FROM sh0 GROUP BY s HAVING COUNT(*) <= {_CLUSTERS_MAX_FREQ}
    ), sh AS (
        SELECT sh0.doc_id, sh0.s FROM sh0 JOIN keep ON keep.s = sh0.s
    ), sizes AS (
        SELECT doc_id, COUNT(*) AS sz FROM sh GROUP BY doc_id
    ), pairs AS (
        SELECT a.doc_id AS id_a, b.doc_id AS id_b
        FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
        GROUP BY 1, 2
        HAVING CAST(floor(CAST(COUNT(*) AS DOUBLE) /
                   (ANY_VALUE((SELECT sz FROM sizes WHERE doc_id = a.doc_id)) +
                    ANY_VALUE((SELECT sz FROM sizes WHERE doc_id = b.doc_id)) - COUNT(*))
                   * 10000 + 0.5) AS BIGINT) >= 2000
    ), edges AS (
        SELECT id_a AS a, id_b AS b FROM pairs
        UNION SELECT id_b, id_a FROM pairs
    ), reach AS (
        WITH RECURSIVE r(a, b) AS (
            SELECT a, b FROM edges
            UNION
            SELECT r.a, e.b FROM r JOIN edges e ON e.a = r.b
        ) SELECT * FROM r
    ), members AS (
        SELECT a AS doc_id, LEAST(a, MIN(b)) AS cluster_id
        FROM reach GROUP BY a
    )
"""


def _cluster_members(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, cluster_id) via jaccard >= 0.2 edges + connected components
    — the Spark build shared by dedup_clusters and dedup_canonicalize.

    Min-label propagation interleaved with pointer-jumping shortcuts
    (operators/graph.py: connected_components) — O(log diameter) rounds,
    each a bounded number of shuffles, instead of one round per diameter
    unit."""
    from cliqz_etl_spark.operators.dedup import ngram_jaccard_pairs
    from cliqz_etl_spark.operators.graph import connected_components

    docs = load_table(spark, sf_dir, "documents")
    pairs = ngram_jaccard_pairs(docs, "doc_id", "text", 3,
                                threshold=0.2).select("id_a", "id_b")
    edges = pairs.union(pairs.select(F.col("id_b"), F.col("id_a"))).toDF("src", "dst")
    edges = edges.persist()
    labels = connected_components(edges)
    members = labels.select(F.col("node").alias("doc_id"),
                            F.col("label").alias("cluster_id"))
    edges.unpersist()
    return members


@query(
    "dedup_clusters",
    oracle=_CLUSTERS_SQL + """
    SELECT doc_id AS doc_id, cluster_id AS cluster_id FROM members
    """,
)
def dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Connected components over the near-duplicate graph (jaccard >= 0.2
    edges): every clustered doc labeled with its component's minimum id —
    the canonical-representative assignment that turns pairwise dedup into
    group dedup. The oracle is the recursive-CTE transitive closure."""
    return _cluster_members(spark, sf_dir)


@query(
    "dedup_canonicalize",
    oracle=_CLUSTERS_SQL + """
    SELECT doc_id, cluster_id, canonical_id,
           (doc_id = canonical_id) AS keep
    FROM (
        SELECT m.doc_id AS doc_id, m.cluster_id AS cluster_id,
               FIRST_VALUE(m.doc_id) OVER (
                   PARTITION BY m.cluster_id
                   ORDER BY octet_length(encode(d.text)) DESC, m.doc_id ASC
               ) AS canonical_id
        FROM members m JOIN documents d ON d.doc_id = m.doc_id
    )
    """,
)
def dedup_canonicalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The end-product of corpus dedup: each near-dup cluster member gets
    its cluster's canonical representative (longest text wins, ties to the
    lowest doc_id) and a keep/drop flag — the decision table a training
    pipeline anti-joins against its corpus. Built on the same
    jaccard-edge connected components as dedup_clusters plus one
    broadcast-sized join back to documents for lengths and one window."""
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents")
    members = _cluster_members(spark, sf_dir)
    sized = members.join(
        docs.select("doc_id", F.octet_length("text").alias("_blen")), "doc_id")
    w = Window.partitionBy("cluster_id").orderBy(F.desc("_blen"),
                                                 F.asc("doc_id"))
    return (
        sized.withColumn("canonical_id", F.first("doc_id").over(w))
        .select("doc_id", "cluster_id", "canonical_id",
                (F.col("doc_id") == F.col("canonical_id")).alias("keep"))
    )


# Shared SQL fragments for the composed curation pipeline oracle.
_Q_TOKENS = "string_split_regex(trim(text), '\\s+')"
_Q_NTOK = f"CASE WHEN trim(text) = '' THEN 0 ELSE len({_Q_TOKENS}) END"
_Q_SW = (f"len(list_filter({_Q_TOKENS}, "
         "x -> x IN ('the', 'a', 'of', 'and', 'to')))")
_Q_PUNCT = ("CASE WHEN length(text) > 0 THEN "
            "CAST(length(text) - length(regexp_replace(text, '[^\\w\\s]', '', 'g')) AS DOUBLE)"
            " / length(text) ELSE 0.0 END")
_Q_QUALITY = (f"CAST(floor((0.4 * least(1.0, CAST({_Q_NTOK} AS DOUBLE) / 64.0)"
              f" + 0.4 * least(1.0, (CASE WHEN {_Q_NTOK} > 0 THEN CAST({_Q_SW} AS DOUBLE) / {_Q_NTOK} ELSE 0.0 END) * 5.0)"
              f" + 0.2 * (1.0 - {_Q_PUNCT})) * 10000 + 0.5) AS BIGINT)")

_Q_SHINGLES = (
    f"list_transform(range(1, greatest(len({_Q_TOKENS}) - 2, 1) + 1), "
    f"i -> array_to_string({_Q_TOKENS}[i:i+2], ' '))"
)


@query(
    "curation_pipeline",
    oracle=f"""
    WITH quality AS (
        SELECT doc_id, lang, text, {_Q_QUALITY} AS quality_x10k
        FROM documents
        WHERE {_Q_QUALITY} >= 5000
    ), exact_canon AS (
        SELECT * FROM quality
        WHERE doc_id IN (SELECT MIN(doc_id) FROM quality GROUP BY md5(text))
    ), sh AS (
        SELECT doc_id, unnest(list_distinct({_Q_SHINGLES})) AS s FROM exact_canon
    ), sizes AS (
        SELECT doc_id, COUNT(*) AS sz FROM sh GROUP BY doc_id
    ), near_dups AS (
        SELECT b.doc_id
        FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
        GROUP BY a.doc_id, b.doc_id,
                 (SELECT sz FROM sizes WHERE doc_id = a.doc_id),
                 (SELECT sz FROM sizes WHERE doc_id = b.doc_id)
        HAVING CAST(COUNT(*) AS DOUBLE) /
               ((SELECT sz FROM sizes WHERE doc_id = a.doc_id)
                + (SELECT sz FROM sizes WHERE doc_id = b.doc_id) - COUNT(*)) >= 0.2
    ), deduped AS (
        SELECT * FROM exact_canon WHERE doc_id NOT IN (SELECT doc_id FROM near_dups)
    )
    SELECT doc_id AS doc_id, lang AS lang, quality_x10k AS quality_x10k,
           CAST(rn AS BIGINT) AS rn
    FROM (
        SELECT doc_id, lang, quality_x10k,
               ROW_NUMBER() OVER (PARTITION BY lang
                                  ORDER BY {md5_long_sql('doc_id')} ASC, doc_id ASC) AS rn
        FROM deduped
    ) WHERE rn <= 50
    """,
)
def curation_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full curation flow composed end-to-end — what this engine exists
    for at 100 TB: quality-filter -> exact dedup (keep min-id canonical) ->
    drop near-duplicates (jaccard >= 0.2, higher id loses) -> deterministic
    per-language quota draw. Every stage is a library operator; the oracle
    replays the identical flow in SQL."""
    from cliqz_etl_spark.functions.text import quality_score
    from cliqz_etl_spark.operators.dedup import ngram_jaccard_pairs

    docs = load_table(spark, sf_dir, "documents")
    quality = docs.withColumn(
        "quality_x10k", F.floor(quality_score("text") * 10000 + 0.5).cast("long")
    ).where(F.col("quality_x10k") >= 5000)

    canon_ids = quality.groupBy(F.md5("text").alias("h")).agg(
        F.min("doc_id").alias("doc_id"))
    exact_canon = quality.join(
        F.broadcast(canon_ids.select("doc_id")), "doc_id", "left_semi")

    near_dup_losers = (
        ngram_jaccard_pairs(exact_canon, "doc_id", "text", 3, threshold=0.2)
        .select(F.col("id_b").alias("doc_id")).distinct()
    )
    deduped = exact_canon.join(F.broadcast(near_dup_losers), "doc_id", "left_anti")

    w = Window.partitionBy("lang").orderBy(md5_long("doc_id").asc(), F.col("doc_id").asc())
    return (
        deduped.withColumn("rn", F.row_number().over(w).cast("long"))
        .where(F.col("rn") <= 50)
        .select("doc_id", "lang", "quality_x10k", "rn")
    )


# --------------------------------------------------------------------------
# Deterministic global training-order shuffle. Training pipelines need the
# corpus in pseudo-random order, split into fixed shards, reproducibly —
# rerunning on the same corpus must produce byte-identical shards. The
# md5 hash IS the shuffle: shard = h mod N spreads documents uniformly,
# and (h, doc_id) orders within the shard. One exchange on shard id; the
# within-shard sort is per-partition (no global orderBy / range exchange).
# --------------------------------------------------------------------------
N_SHARDS = 8


@query(
    "assign_shards",
    oracle=f"""
    SELECT doc_id AS doc_id,
           h % {N_SHARDS} AS shard,
           ROW_NUMBER() OVER (PARTITION BY h % {N_SHARDS}
                              ORDER BY h ASC, doc_id ASC) AS pos
    FROM (SELECT doc_id, {md5_long_sql('doc_id')} AS h FROM documents)
    """,
)
def assign_shards(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reproducible shuffle-to-shards: (shard, pos) for every document,
    stable under re-runs and engine-portable (the 'random' order is
    md5)."""
    docs = load_table(spark, sf_dir, "documents")
    h = md5_long("doc_id")
    w = Window.partitionBy("shard").orderBy(F.col("h").asc(), F.col("doc_id").asc())
    return (
        docs.select("doc_id", h.alias("h"), (h % N_SHARDS).alias("shard"))
        .withColumn("pos", F.row_number().over(w).cast("long"))
        .select("doc_id", "shard", "pos")
    )


# --------------------------------------------------------------------------
# Deterministic weighted sampling: include a document with probability
# proportional to its token count (capped at 1) by comparing a uniform
# md5 draw against an integer weight — the quality/length-weighted corpus
# draw, reproducible across runs and engines because the "randomness" is
# the id hash. Pure scan-side filter: no shuffle at all.
# --------------------------------------------------------------------------
_WS_SCALE = 200  # weight = ntok * _WS_SCALE out of 10000 => 50 tokens saturate


@query(
    "weighted_sample",
    oracle=f"""
    SELECT doc_id AS doc_id, lang AS lang,
           CAST(least({{NTOK}} * {_WS_SCALE}, 10000) AS BIGINT) AS weight_x10k
    FROM documents
    WHERE ({{H}} % 10000) < least({{NTOK}} * {_WS_SCALE}, 10000)
    """.replace("{NTOK}", "(CASE WHEN trim(text) = '' THEN 0 ELSE "
                "len(string_split_regex(trim(text), '\\s+')) END)")
       .replace("{H}", md5_long_sql("doc_id || '-wsample'")),
)
def weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P(include) = min(ntok * scale, 10000) / 10000, decided by an
    integer compare between the salted id hash and the weight."""
    from cliqz_etl_spark.functions.text import token_count

    docs = load_table(spark, sf_dir, "documents")
    weight = F.least(token_count("text") * _WS_SCALE, F.lit(10000)).cast("long")
    draw = md5_long(F.concat(F.col("doc_id").cast("string"), F.lit("-wsample"))) % 10000
    return (
        docs.select("doc_id", "lang", weight.alias("weight_x10k"),
                    draw.alias("__draw"))
        .where(F.col("__draw") < F.col("weight_x10k"))
        .drop("__draw")
    )


# --------------------------------------------------------------------------
# Mixture sampling: assemble a training mix with TARGET proportions per
# domain (here: language), regardless of the corpus's natural skew. Each
# domain contributes floor(total * weight) documents, drawn in salted-hash
# order (deterministic "random"), capped at availability. One shuffle on
# the domain key for the quota window — the domain-mixing step every
# multi-source training-corpus assembly runs.
# --------------------------------------------------------------------------
_MIX_TOTAL = 100
_MIX_WEIGHTS = {"en": 40, "de": 15, "es": 15, "fr": 15, "zh": 15}  # /100


@query(
    "mixture_sample",
    oracle=f"""
    WITH quota AS (
        SELECT * FROM (VALUES {", ".join(f"('{k}', {_MIX_TOTAL * v // 100})"
                                         for k, v in sorted(_MIX_WEIGHTS.items()))})
            AS t(lang, q)
    ), ranked AS (
        SELECT doc_id, lang,
               ROW_NUMBER() OVER (PARTITION BY lang
                   ORDER BY {md5_long_sql("doc_id || '-mix'")} ASC, doc_id ASC) AS rn
        FROM documents
    )
    SELECT r.doc_id AS doc_id, r.lang AS lang, CAST(r.rn AS BIGINT) AS rn
    FROM ranked r JOIN quota USING (lang)
    WHERE r.rn <= quota.q
    """,
)
def mixture_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """40/15/15/15/15 en/de/es/fr/zh mix of 100 docs, drawn in salted-hash
    order per language — rebalances the corpus's natural skew into the
    target training proportions, reproducibly."""
    docs = load_table(spark, sf_dir, "documents")
    quota = F.create_map(
        *[F.lit(x) for kv in sorted(_MIX_WEIGHTS.items())
          for x in (kv[0], _MIX_TOTAL * kv[1] // 100)])
    w = Window.partitionBy("lang").orderBy(
        md5_long(F.concat(F.col("doc_id").cast("string"), F.lit("-mix"))).asc(),
        F.col("doc_id").asc())
    return (
        docs.withColumn("rn", F.row_number().over(w).cast("long"))
        .where(F.col("rn") <= quota[F.col("lang")])
        .select("doc_id", "lang", "rn")
    )


# --------------------------------------------------------------------------
# Round-6 composed curation: the new operator families chained end-to-end
# (the shape a production corpus build actually runs): Gopher rule filter
# (scan-side map) -> C4 span dedup (3 keyed shuffles) -> unigram frequency
# scoring TRAINED ON THE CURATED TEXT (explode + vocab agg + token join).
# Each stage is the same library operator its standalone gate query uses,
# and the oracle is assembled from those queries' own SQL fragments, so
# the composition cannot drift from the parts.
# --------------------------------------------------------------------------


def _v2_oracle() -> str:
    from cliqz_etl_spark.queries.dedup import SPAN_K
    from cliqz_etl_spark.queries.textops import DUCK_GOPHER_RULES, _duck_gopher_base

    return f"""
    {_duck_gopher_base()}
    , pass AS (
        SELECT b.doc_id, b.tk FROM base b JOIN m USING (doc_id)
        WHERE {DUCK_GOPHER_RULES}
    ), ch0 AS (
        SELECT doc_id,
               unnest(list_transform(range((len(tk) + {SPAN_K - 1}) // {SPAN_K}),
                   i -> {{'chunk_idx': CAST(i AS BIGINT),
                          'chunk': array_to_string(
                              tk[i*{SPAN_K}+1 : i*{SPAN_K}+{SPAN_K}], ' ')}})) AS c
        FROM pass
    ), ch AS (
        SELECT doc_id, c.chunk_idx AS chunk_idx, c.chunk AS chunk,
               CAST(doc_id AS BIGINT) * 1048576 + c.chunk_idx AS key
        FROM ch0
    ), win AS (
        SELECT chunk, min(key) AS keep FROM ch GROUP BY chunk
    ), keptc AS (
        SELECT ch.doc_id, CAST(count(*) AS BIGINT) AS n_kept,
               string_agg(ch.chunk, ' ' ORDER BY ch.chunk_idx) AS text_kept
        FROM ch JOIN win USING (chunk)
        WHERE ch.key = win.keep
        GROUP BY ch.doc_id
    ), tots AS (
        SELECT doc_id, CAST(count(*) AS BIGINT) AS n FROM ch GROUP BY doc_id
    ), kd AS (
        SELECT tots.doc_id,
               coalesce(keptc.text_kept, '') AS text_kept,
               CAST(coalesce(keptc.n_kept, 0) AS BIGINT) AS n_kept,
               CAST(tots.n - coalesce(keptc.n_kept, 0) AS BIGINT) AS n_dropped
        FROM tots LEFT JOIN keptc USING (doc_id)
    ), tok AS (
        SELECT doc_id, unnest(string_split_regex(trim(text_kept), '\\s+')) AS w
        FROM kd WHERE trim(text_kept) <> ''
    ), cnt AS (
        SELECT w, CAST(count(*) AS BIGINT) AS c FROM tok GROUP BY w
    ), tot2 AS (
        SELECT CAST(sum(c) AS BIGINT) AS t FROM cnt
    ), sc AS (
        SELECT tok.doc_id,
               CAST(sum(cnt.c) AS BIGINT) AS sum_cnt,
               CAST(count(*) AS BIGINT) AS n_tok
        FROM tok JOIN cnt USING (w) GROUP BY tok.doc_id
    )
    SELECT kd.doc_id AS doc_id,
           kd.n_kept AS n_kept,
           kd.n_dropped AS n_dropped,
           sc.n_tok AS n_tok,
           CAST((1000000 * CAST(sc.sum_cnt AS HUGEINT))
                // (CAST(sc.n_tok AS HUGEINT) * t) AS BIGINT) AS freq_ppm
    FROM kd JOIN sc USING (doc_id), tot2
    """


@query("curation_pipeline_v2", oracle=_v2_oracle())
def curation_pipeline_v2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher filter -> C4 span dedup -> unigram scoring trained on the
    CURATED corpus, composed from the same operators as the standalone
    gates. Docs whose every chunk lost elsewhere drop out of the scored
    output (inner join — they have no text left to score). At 100 TB the
    stages pipeline cleanly: the filter is scan-side and costs nothing
    extra, the dedup's three shuffles dominate, and the scoring trains on
    the post-dedup token stream (smaller than the raw corpus by the dup
    ratio)."""
    import functools
    import operator

    from cliqz_etl_spark.operators.dedup import span_dedup
    from cliqz_etl_spark.queries.dedup import SPAN_K
    from cliqz_etl_spark.queries.textops import (
        gopher_metrics,
        gopher_rule_cols,
        unigram_ppm,
    )

    from cliqz_etl_spark.operators.cache import track

    docs = load_table(spark, sf_dir, "documents")
    m = gopher_metrics(docs)
    passed = m.where(
        functools.reduce(operator.and_, gopher_rule_cols().values())
    ).select("doc_id", "text")
    # The dedup output feeds BOTH the scorer (token stream) and the final
    # join (kept/dropped accounting); persist it so the chunk-reassembly
    # aggregation runs once, not once per consumer.
    sd = track(span_dedup(passed, "doc_id", "text", SPAN_K).persist())
    scored = unigram_ppm(sd, "text_kept")
    return (sd.join(scored, "doc_id")
            .select("doc_id", "n_kept", "n_dropped", "n_tok", "freq_ppm"))


# --------------------------------------------------------------------------
# DSIR: Data Selection with Importance Resampling (Xie et al. 2023).
# Hashed-n-gram importance weights — the published trick for steering a
# raw web corpus toward a target distribution without training a model:
# hash every token into B buckets, estimate target and raw bucket
# distributions, and weight each document by its tokens' summed
# log-likelihood ratio. Selection (top-k / thresholding / Gumbel
# resampling) composes downstream with the sampling family.
# --------------------------------------------------------------------------
_DSIR_BUCKETS = 256
_DSIR_TOKENS = "string_split_regex(trim(text), '\\s+')"


@query(
    "dsir_importance_weights",
    oracle=f"""
    WITH base AS (
        SELECT doc_id, {_DSIR_TOKENS} AS tk,
               CAST({md5_long_sql('doc_id')} % 5 = 0 AS BIGINT) AS is_t
        FROM documents WHERE trim(text) <> ''
    ), tb AS (
        SELECT doc_id, is_t, {md5_long_sql('w')} % {_DSIR_BUCKETS} AS b
        FROM (SELECT doc_id, is_t, unnest(tk) AS w FROM base)
    ), bc AS (
        SELECT b, CAST(count(*) AS BIGINT) AS rc,
               CAST(sum(is_t) AS BIGINT) AS tc
        FROM tb GROUP BY b
    ), tot AS (
        SELECT CAST(COALESCE(sum(rc), 0) AS BIGINT) AS r_tot,
               CAST(COALESCE(sum(tc), 0) AS BIGINT) AS t_tot
        FROM bc
    ), wts AS (
        SELECT b,
               CAST(floor(1000 * ln(
                   CAST((tc + 1) * (r_tot + {_DSIR_BUCKETS}) AS DOUBLE)
                   / ((rc + 1) * (t_tot + {_DSIR_BUCKETS}))) + 0.5)
                    AS BIGINT) AS lr_milli
        FROM bc CROSS JOIN tot
    )
    SELECT tb.doc_id AS doc_id, CAST(count(*) AS BIGINT) AS n_tok,
           CAST(sum(lr_milli) AS BIGINT) AS dsir_weight_milli
    FROM tb JOIN wts USING (b) GROUP BY tb.doc_id
    """,
)
def dsir_importance_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document DSIR importance weight against a hash-selected target.

    The target distribution is estimated from the deterministic 20% slice
    md5(doc_id)%5==0 (the stand-in for a curated target corpus; hash
    selection keeps both engines replaying the same split), the raw
    distribution from the whole corpus. Token features are hashed
    unigrams: bucket = md5_long(w) % 256 — DSIR's dimensionality trick,
    which is also what makes this scale: the entire "model" is 256 rows.

    weight(doc) = sum over tokens of lr(bucket), with
    lr = floor(1000*ln( (t_b+1)(R+B) / (r_b+1)(T+B) ) + 0.5) — Laplace-
    smoothed log-likelihood ratio, quantized PER BUCKET before the
    per-doc integer sum (the tfidf_search discipline; ln's argument is
    built from exact integer products on both engines, so cross-engine
    drift is bounded to the sub-ulp floor boundary the fuzz gate patrols;
    products stay double-exact below ~2^53 — at 9e15 corpus tokens switch
    the ratio to 128-bit/decimal arithmetic first).

    Plan shape: ONE pass over the exploded tokens builds both bucket
    distributions simultaneously (rc = count, tc = conditional sum — no
    second corpus scan for the target side), yielding a 256-row table;
    totals derive from those 256 rows; the scoring join broadcasts the
    256-row weights table, so scoring is scan-side map + broadcast-hash-
    join + one groupBy(doc_id) with map-side combine. Two corpus token
    scans total, no shuffled token join at any scale."""
    from cliqz_etl_spark.functions.text import tokens
    from cliqz_etl_spark.operators.cache import track

    B = _DSIR_BUCKETS
    docs = load_table(spark, sf_dir, "documents")
    base = (docs.where(F.trim(F.col("text")) != "")
            .select("doc_id", tokens("text").alias("tk"),
                    (md5_long(F.col("doc_id")) % 5 == 0).cast("long")
                    .alias("is_t")))
    tb = (base.select("doc_id", "is_t", F.explode("tk").alias("w"))
          .select("doc_id", "is_t", (md5_long(F.col("w")) % B).alias("b")))
    bc = track(tb.groupBy("b")
               .agg(F.count(F.lit(1)).alias("rc"),
                    F.sum("is_t").alias("tc")).persist())
    tot = bc.agg(F.coalesce(F.sum("rc"), F.lit(0)).alias("r_tot"),
                 F.coalesce(F.sum("tc"), F.lit(0)).alias("t_tot"))
    wts = (bc.crossJoin(F.broadcast(tot))
           .withColumn(
               "lr_milli",
               F.floor(F.lit(1000) * F.log(
                   ((F.col("tc") + 1) * (F.col("r_tot") + B)).cast("double")
                   / ((F.col("rc") + 1) * (F.col("t_tot") + B)))
                   + F.lit(0.5)).cast("long"))
           .select("b", "lr_milli"))
    return (tb.join(F.broadcast(wts), "b")
            .groupBy("doc_id")
            .agg(F.count(F.lit(1)).cast("long").alias("n_tok"),
                 F.sum("lr_milli").cast("long").alias("dsir_weight_milli")))


# --------------------------------------------------------------------------
# Temperature-scaled language mixing (mT5 / XLM-R corpus balancing):
# sampling rate per language proportional to p_l^alpha with alpha < 1,
# which up-weights tail languages without letting any head language
# dominate. The per-language weight pow(n_l, alpha) is quantized to
# milli-units FIRST (per-language — a handful of rows), then the
# normalized rate is an exact integer division over the quantized sum,
# so the output is integer-stable across engines (the dsir ln/pow
# discipline).
# --------------------------------------------------------------------------
_MIX_ALPHA = "0.3"


@query(
    "temperature_mixing",
    oracle=f"""
    WITH c AS (
        SELECT lang, CAST(count(*) AS BIGINT) AS n_docs FROM documents GROUP BY lang
    ), w AS (
        SELECT lang, n_docs,
               CAST(floor(1000 * pow(CAST(n_docs AS DOUBLE), {_MIX_ALPHA}) + 0.5)
                    AS BIGINT) AS w_milli
        FROM c
    ), t AS (
        SELECT CAST(sum(w_milli) AS BIGINT) AS w_tot FROM w
    )
    SELECT lang AS lang, n_docs, w_milli,
           CAST((1000000 * w_milli) // w_tot AS BIGINT) AS rate_ppm
    FROM w CROSS JOIN t
    """,
)
def temperature_mixing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language sampling rates at temperature alpha = 0.3.

    Plan shape: one groupBy(lang) with map-side combine (the only pass
    over the corpus), then everything — pow, quantize, normalize — runs
    on the per-language frame, which has as many rows as languages. The
    normalizing total comes from that same tiny frame and broadcasts
    back, so corpus size only ever enters through the first aggregate."""
    docs = load_table(spark, sf_dir, "documents")
    w = (docs.groupBy("lang")
         .agg(F.count(F.lit(1)).cast("long").alias("n_docs"))
         .select("lang", "n_docs",
                 F.floor(1000 * F.pow(F.col("n_docs").cast("double"),
                                      F.lit(float(_MIX_ALPHA))) + 0.5)
                 .cast("long").alias("w_milli")))
    t = w.agg(F.sum("w_milli").cast("long").alias("w_tot"))
    return (w.crossJoin(F.broadcast(t))
            .select("lang", "n_docs", "w_milli",
                    F.expr("(1000000 * w_milli) div w_tot").cast("long")
                    .alias("rate_ppm")))


# --------------------------------------------------------------------------
# Near-dup cluster size report — the dedup IMPACT summary a curation run
# ships with its decision table: how many clusters exist at each size,
# how many documents they cover, and how many a keep-one-per-cluster
# policy would remove. Rides the same jaccard-edge connected components
# as dedup_clusters (the recursive-closure oracle); everything past the
# member frame is cluster-count-sized, then size-histogram-sized.
# --------------------------------------------------------------------------
@query(
    "dup_cluster_size_stats",
    oracle=_CLUSTERS_SQL + """
    , csizes AS (
        SELECT cluster_id, CAST(count(*) AS BIGINT) AS cluster_size
        FROM members GROUP BY 1
    )
    SELECT cluster_size,
           CAST(count(*) AS BIGINT) AS n_clusters,
           CAST(cluster_size * count(*) AS BIGINT) AS n_docs,
           CAST((cluster_size - 1) * count(*) AS BIGINT) AS n_removable
    FROM csizes GROUP BY cluster_size
    """,
    doc="Histogram of near-dup cluster sizes with per-size removable-doc "
        "counts (keep-one policy).",
)
def dup_cluster_size_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpora with no qualifying near-dup pair yield an empty histogram
    on both engines (members only holds CLUSTERED docs — singletons never
    enter the edge graph)."""
    members = _cluster_members(spark, sf_dir)
    csizes = (members.groupBy("cluster_id")
              .agg(F.count(F.lit(1)).cast("long").alias("cluster_size")))
    return (csizes.groupBy("cluster_size")
            .agg(F.count(F.lit(1)).cast("long").alias("n_clusters"))
            .select("cluster_size", "n_clusters",
                    (F.col("cluster_size") * F.col("n_clusters")).cast("long")
                    .alias("n_docs"),
                    ((F.col("cluster_size") - 1) * F.col("n_clusters"))
                    .cast("long").alias("n_removable")))

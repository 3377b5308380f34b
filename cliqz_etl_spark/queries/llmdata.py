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


@query(
    "dedup_clusters",
    oracle="""
    WITH sh AS (
        SELECT doc_id, unnest(list_distinct(list_transform(
            range(1, greatest(len(string_split_regex(trim(text), '\\s+')) - 2, 1) + 1),
            i -> array_to_string(string_split_regex(trim(text), '\\s+')[i:i+2], ' ')))) AS s
        FROM documents
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
    )
    SELECT a AS doc_id, LEAST(a, MIN(b)) AS cluster_id
    FROM reach GROUP BY a
    """,
)
def dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Connected components over the near-duplicate graph (jaccard >= 0.2
    edges): every clustered doc labeled with its component's minimum id —
    the canonical-representative assignment that turns pairwise dedup into
    group dedup.

    Spark side: iterative min-label propagation to a fixpoint. Each round
    is one join + aggregate; rounds needed = graph diameter (near-dup
    graphs are tiny cliques, so 2-3). At planetary scale swap in
    path-doubling (log n rounds). The oracle is the recursive-CTE
    transitive closure."""
    from cliqz_etl_spark.operators.dedup import ngram_jaccard_pairs

    docs = load_table(spark, sf_dir, "documents")
    pairs = ngram_jaccard_pairs(docs, "doc_id", "text", 3, threshold=0.2).select("id_a", "id_b")
    edges = pairs.union(pairs.select(F.col("id_b"), F.col("id_a"))).toDF("src", "dst")
    edges = edges.persist()
    labels = (
        edges.select(F.col("src").alias("node")).distinct()
        .withColumn("label", F.col("node"))
        .persist()
    )
    while True:
        neighbor_min = (
            edges.join(labels, edges.dst == labels.node)
            .groupBy("src").agg(F.min("label").alias("nlabel"))
        )
        new_labels = (
            labels.join(neighbor_min, labels.node == neighbor_min.src, "left")
            .select("node", F.least("label", F.coalesce("nlabel", "label")).alias("label"))
            .persist()
        )
        changed = (
            new_labels.alias("n").join(labels.alias("o"), "node")
            .where(F.col("n.label") != F.col("o.label")).count()
        )
        labels.unpersist()  # drop the superseded iteration's cache
        labels = new_labels
        if changed == 0:
            break
    result = labels.select(F.col("node").alias("doc_id"), F.col("label").alias("cluster_id"))
    edges.unpersist()
    return result

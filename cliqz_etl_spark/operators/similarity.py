"""Vector similarity operators over embedding columns (array<float>).

Two paths, per the standard ANN playbook:

- brute-force cosine top-k: the exactness baseline. Query set broadcast
  against the corpus (queries are few; the corpus never shuffles), dot
  products via zip_with/aggregate — JVM-side, no Python.
- IVF: corpus assigned once to the nearest of K centroids (broadcast
  argmin — a map, not a join-shuffle), search restricted to the probe's
  cluster. At 100 TB the corpus is written bucketed/partitioned by
  ``cluster`` so a probe reads one partition.

Arithmetic discipline: vectors are quantized to integer milli-units
(floor(x*1000+0.5)) before any distance math, so dot products and norms
are integer-exact and the final cosine is a single deterministic double
division — bit-identical across engines, which makes ANN oracle-checkable.
The float fast path (`cosine_float`) exists for production use where
cross-engine bit-equality doesn't matter.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def quantize(col: Column | str, scale: int = 1000) -> Column:
    """array<float> -> array<long> milli-units; floor(x*scale+0.5) is the
    engine-portable rounding (see queries/textops.py on round() skew)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.transform(
        c, lambda x: F.floor(x.cast("double") * scale + F.lit(0.5)).cast("long")
    )


def dot_q(a: Column, b: Column) -> Column:
    """Integer-exact dot product of two quantized vectors."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )


def norm2_q(a: Column) -> Column:
    return F.aggregate(
        F.transform(a, lambda x: x * x), F.lit(0).cast("long"), lambda acc, x: acc + x
    )


def cosine_q(a: Column, b: Column) -> Column:
    """Deterministic cosine of quantized vectors (double division of exact
    integers; sqrt is correctly rounded per IEEE-754)."""
    return dot_q(a, b).cast("double") / F.sqrt(
        norm2_q(a).cast("double") * norm2_q(b).cast("double")
    )


def cosine_float(a: Column, b: Column) -> Column:
    """Production float cosine (not oracle-stable across engines)."""
    dot = F.aggregate(F.zip_with(a, b, lambda x, y: x * y),
                      F.lit(0.0), lambda acc, x: acc + x)
    na = F.aggregate(F.transform(a, lambda x: x * x), F.lit(0.0), lambda acc, x: acc + x)
    nb = F.aggregate(F.transform(b, lambda x: x * x), F.lit(0.0), lambda acc, x: acc + x)
    return dot / F.sqrt(na * nb)


def brute_force_topk(corpus: DataFrame, queries: DataFrame, id_col: str,
                     vec_col: str, k: int = 5) -> DataFrame:
    """Exact top-k neighbors for each query vector (self-match excluded).

    The query side is broadcast — the corpus is scanned once, never
    shuffled; ranking happens in a window partitioned by query id. Each
    side's squared norm is computed once per ROW before the join (the
    naive cosine-per-pair form re-evaluates both O(d) norms for every
    pair); the pair stage is then one O(d) dot + sqrt(na*nb), written
    exactly as the oracle's formula so the double rounds identically."""
    from pyspark.sql import Window

    q = queries.select(
        F.col(id_col).alias("query_id"), quantize(vec_col).alias("qv")
    ).withColumn("qn", norm2_q(F.col("qv")).cast("double"))
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), quantize(vec_col).alias("cv")
    ).withColumn("cn", norm2_q(F.col("cv")).cast("double"))
    scored = (
        c.join(F.broadcast(q), F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id", "neighbor_id",
            (dot_q(F.col("qv"), F.col("cv")).cast("double")
             / F.sqrt(F.col("qn") * F.col("cn"))).alias("cos"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(
            "query_id", "rank", "neighbor_id",
            F.floor(F.col("cos") * 10000 + 0.5).cast("long").alias("cos_x10k"),
        )
    )


def ivf_assign(corpus: DataFrame, centroids: DataFrame, id_col: str,
               vec_col: str) -> DataFrame:
    """Assign every vector to its nearest centroid by squared L2 (integer-
    exact on quantized vectors; ties break to the lowest centroid id).

    Centroids ride into the executors as ONE constant-folded array of
    (cid, cv) structs; the per-row argmin is a single transform + array_min
    over that constant — a pure map over the corpus, no shuffle, and the
    codegen'd expression stays O(1) in K (the earlier K-way unrolled
    literal expression compiled K copies of the 64-wide distance subtree;
    at K=50 plan compile dominated the query). Returns (id, cluster, qv)."""
    cent_rows = [
        (int(r["cid"]), r["cv"])
        for r in centroids.select(
            F.col(id_col).alias("cid"), quantize(vec_col).alias("cv")
        ).collect()
    ]
    qv = quantize(vec_col)

    cent_arr = F.array(*[
        F.struct(
            F.lit(cid).alias("cid"),
            F.array(*[F.lit(int(x)) for x in cv]).alias("cv"),
        )
        for cid, cv in cent_rows
    ])

    def dist_struct(c):
        diff = F.zip_with(F.col("_qv"), c["cv"], lambda x, y: (x - y) * (x - y))
        d = F.aggregate(diff, F.lit(0).cast("long"), lambda acc, x: acc + x)
        # struct ordering = (distance, cid): array_min ties to lowest cid
        return F.struct(d.alias("d"), c["cid"].alias("cid"))

    return (
        corpus.select(F.col(id_col).alias("_id"), qv.alias("_qv"))
        .select(
            F.col("_id"),
            F.col("_qv"),
            F.array_min(F.transform(cent_arr, dist_struct))["cid"].alias("cluster"),
        )
    )


def ivf_topk(corpus: DataFrame, centroids: DataFrame, queries: DataFrame,
             id_col: str, vec_col: str, k: int = 3) -> DataFrame:
    """IVF search: rank only within the query's own cluster (n_probe=1).
    Recall < 1.0 by design; the bucketed join is the scale path — at
    100 TB, `assigned` is a table bucketed by ``cluster``."""
    from pyspark.sql import Window

    from cliqz_etl_spark.operators.dedup import _materialize

    # both join sides derive from `assigned`; persist so the centroid
    # argmin (a large literal expression) evaluates once, not per side
    assigned = _materialize(ivf_assign(corpus, centroids, id_col, vec_col))
    q = assigned.select(
        F.col("_id").alias("query_id"), F.col("_qv").alias("qv"),
        F.col("cluster").alias("qcluster"),
        norm2_q(F.col("_qv")).cast("double").alias("qn"),
    ).join(queries.select(F.col(id_col).alias("query_id")), "query_id")
    c = assigned.select(
        F.col("_id").alias("neighbor_id"), F.col("_qv").alias("cv"), "cluster",
        norm2_q(F.col("_qv")).cast("double").alias("cn"),
    )
    scored = (
        c.join(F.broadcast(q), (F.col("cluster") == F.col("qcluster"))
               & (F.col("query_id") != F.col("neighbor_id")))
        # norms hoisted to once-per-row above; dot/sqrt(qn*cn) keeps the
        # oracle's exact double operation order (see brute_force_topk)
        .select("query_id", "neighbor_id",
                (dot_q(F.col("qv"), F.col("cv")).cast("double")
                 / F.sqrt(F.col("qn") * F.col("cn"))).alias("cos"))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(
            "query_id", "rank", "neighbor_id",
            F.floor(F.col("cos") * 10000 + 0.5).cast("long").alias("cos_x10k"),
        )
    )

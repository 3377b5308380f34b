"""Model-evaluation operators over the synthetic tables: rank-based ROC
AUC (one-vs-rest per class), a decile lift/gains table, a chi-square
independence audit, and closed-form per-segment OLS. These are the
offline-eval primitives a training-data pipeline runs after every
labeling or scoring pass — all exact integer/shared-IEEE arithmetic so
the DuckDB oracles replay bit-identically (the benford/tfidf
discipline), and all built from score-level or group-level aggregates so
no stage is data-sized on a single task.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from cliqz_etl_spark.functions.hashing import md5_long_sql
from cliqz_etl_spark.queries import query
from cliqz_etl_spark.tables import load_table


# --------------------------------------------------------------------------
# ROC AUC via the Mann-Whitney U statistic, one-vs-rest per label class.
# AUC = U / (n_pos * n_neg) where U counts (pos, neg) score pairs with
# pos above neg, ties at half weight. Computed WITHOUT a global rank
# sort: scores quantize to micro integers, the frame collapses to
# score-level counts (bounded by the quantization domain, not the data),
# and U2 = 2*U per class is an exact integer aggregate over that frame:
#   U2_c = sum_s n_c(s) * (2 * neg_below_c(s) + neg_at_c(s)).
# The below-counts come from ranged_cumsum (no single-task sort) for the
# global running total, and a per-class window over the score-level
# frame (partition size bounded by distinct scores, never by rows) for
# the same-class running total. Final division is integer round-half-up,
# so the oracle replays exactly.
# --------------------------------------------------------------------------
@query(
    "roc_auc_per_class",
    oracle="""
    WITH base AS (
        SELECT CAST(floor(CAST(embedding[1] AS DOUBLE) * 1000000 + 0.5)
                    AS BIGINT) AS score,
               CAST(label AS BIGINT) AS label
        FROM embeddings
        WHERE embedding IS NOT NULL AND label IS NOT NULL
          AND len(embedding) >= 1
          -- unscorable first components (NULL element, NaN, out of the
          -- quantization envelope) drop on BOTH engines: floor(NaN) and
          -- a NULL score would otherwise diverge in cast/NULL-ordering
          AND embedding[1] IS NOT NULL
          AND NOT isnan(CAST(embedding[1] AS DOUBLE))
          AND abs(CAST(embedding[1] AS DOUBLE)) <= 1000000.0
    ), st AS (
        SELECT score, CAST(count(*) AS BIGINT) AS tot FROM base GROUP BY 1
    ), sc AS (
        SELECT score, label, CAST(count(*) AS BIGINT) AS n_cl
        FROM base GROUP BY 1, 2
    ), stc AS (
        SELECT score, tot,
               CAST(COALESCE(SUM(tot) OVER (
                   ORDER BY score ASC
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                   AS BIGINT) AS cumtot_below
        FROM st
    ), scc AS (
        SELECT score, label, n_cl,
               CAST(COALESCE(SUM(n_cl) OVER (
                   PARTITION BY label ORDER BY score ASC
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                   AS BIGINT) AS cump_below
        FROM sc
    ), n AS (SELECT CAST(count(*) AS BIGINT) AS n_all FROM base),
    u AS (
        SELECT s.label AS label,
               CAST(SUM(s.n_cl) AS BIGINT) AS n_pos,
               CAST(SUM(s.n_cl * (2 * (t.cumtot_below - s.cump_below)
                                  + (t.tot - s.n_cl))) AS BIGINT) AS u2
        FROM scc s JOIN stc t ON t.score = s.score GROUP BY 1
    )
    SELECT u.label AS label,
           u.n_pos AS n_pos,
           CAST(n.n_all - u.n_pos AS BIGINT) AS n_neg,
           u.u2 AS u2,
           CAST((u.u2 * 1000000 + u.n_pos * (n.n_all - u.n_pos))
                // (2 * u.n_pos * (n.n_all - u.n_pos)) AS BIGINT)
               AS auc_micro
    FROM u CROSS JOIN n
    """,
)
def roc_auc_per_class(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-vs-rest ROC AUC per label class, scored by the first embedding
    component, as an exact rank-free U statistic (ties at half weight).

    Plan shape: one scan collapses to the (score) and (score, label)
    aggregate frames; the global below-count rides ranged_cumsum (no
    single-task global sort) and the per-class below-count is a window
    over the score-level frame, whose partition size is bounded by the
    micro-quantization domain — never by the row count. Everything
    after the two aggregations is score-level (~|distinct scores| rows).
    U2*1e6 stays in BIGINT up to ~10^6 pos x neg pairs per class; past
    that, shift the final division to a shared double tree."""
    from cliqz_etl_spark.operators.dedup import _materialize
    from cliqz_etl_spark.operators.stats import ranged_cumsum

    emb = load_table(spark, sf_dir, "embeddings")
    e1 = F.element_at("embedding", 1).cast("double")
    base = (emb.where(F.col("embedding").isNotNull()
                      & F.col("label").isNotNull()
                      & (F.size("embedding") >= 1)
                      & e1.isNotNull() & ~F.isnan(e1)
                      & (F.abs(e1) <= 1_000_000.0))
            .select(F.floor(e1 * 1_000_000 + F.lit(0.5)).cast("long")
                    .alias("score"),
                    F.col("label").cast("long").alias("label")))
    # (score, label) counts are the ONLY data-sized pass; both the
    # score-level rollup and the per-class window read this frame, so
    # persist it (bounded by the quantization domain x classes) rather
    # than paying the scan twice.
    sc = _materialize(base.groupBy("score", "label").agg(
        F.count(F.lit(1)).cast("long").alias("n_cl")))
    st = sc.groupBy("score").agg(F.sum("n_cl").cast("long").alias("tot"))
    stc = (ranged_cumsum(st, "score", ["tot"])
           .select("score", "tot",
                   (F.col("cum_tot") - F.col("tot")).alias("cumtot_below")))
    wl = (Window.partitionBy("label").orderBy(F.asc("score"))
          .rowsBetween(Window.unboundedPreceding, -1))
    scc = sc.select(
        "score", "label", "n_cl",
        F.coalesce(F.sum("n_cl").over(wl), F.lit(0)).alias("cump_below"))
    n = st.agg(F.sum("tot").cast("long").alias("n_all"))
    u = (scc.join(stc, "score")
         .groupBy("label")
         .agg(F.sum("n_cl").cast("long").alias("n_pos"),
              F.sum(F.col("n_cl")
                    * (2 * (F.col("cumtot_below") - F.col("cump_below"))
                       + (F.col("tot") - F.col("n_cl"))))
              .cast("long").alias("u2")))
    return (u.crossJoin(F.broadcast(n))
            .select("label", "n_pos",
                    (F.col("n_all") - F.col("n_pos")).cast("long")
                    .alias("n_neg"),
                    "u2",
                    F.expr("(u2 * 1000000 + n_pos * (n_all - n_pos)) div "
                           "(2 * n_pos * (n_all - n_pos))")
                    .cast("long").alias("auc_micro")))


# --------------------------------------------------------------------------
# Decile lift / gains table — the campaign-targeting eval: users ranked
# by a behavioral score (click+view spend), split into ten exact NTILE
# deciles, each scored by responder (purchaser) rate and cumulative lift
# over the base rate. The decile assignment is ranged_ntile (exact ANSI
# NTILE without the global single-task window sort), keyed uniquely on
# (-score, user_id) so ties replay deterministically. Rates and lift are
# shared double trees over exact integer counts, micro-quantized at the
# end — scale-safe where pure-integer cross products would overflow.
# --------------------------------------------------------------------------
_LIFT_SCORE = ("CASE WHEN event_type IN ('click', 'view') "
               "AND value IS NOT NULL "
               "THEN CAST(floor(value * 100 + 0.5) AS BIGINT) "
               "ELSE CAST(0 AS BIGINT) END")
_LIFT_RATE = ("CAST(floor(CAST(n_resp AS DOUBLE) / CAST(n_users AS DOUBLE)"
              " * 1000000 + 0.5) AS BIGINT)")
_LIFT_CUM = ("CASE WHEN tot_resp = 0 THEN NULL ELSE "
             "CAST(floor((CAST(cum_resp AS DOUBLE) * CAST(tot_users AS "
             "DOUBLE)) / (CAST(cum_users AS DOUBLE) * CAST(tot_resp AS "
             "DOUBLE)) * 1000000 + 0.5) AS BIGINT) END")


@query(
    "decile_lift_table",
    oracle=f"""
    WITH pu AS (
        SELECT user_id,
               CAST(SUM({_LIFT_SCORE}) AS BIGINT) AS score_cents,
               CAST(MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                    AS BIGINT) AS resp
        FROM events WHERE user_id IS NOT NULL GROUP BY 1
    ), tiled AS (
        SELECT score_cents, resp,
               CAST(NTILE(10) OVER (ORDER BY (0 - score_cents) ASC,
                                    user_id ASC) AS BIGINT) AS decile
        FROM pu
    ), d AS (
        SELECT decile,
               CAST(count(*) AS BIGINT) AS n_users,
               CAST(SUM(resp) AS BIGINT) AS n_resp
        FROM tiled GROUP BY 1
    ), c AS (
        SELECT decile, n_users, n_resp,
               CAST(SUM(n_users) OVER (ORDER BY decile ASC
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS BIGINT) AS cum_users,
               CAST(SUM(n_resp) OVER (ORDER BY decile ASC
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS BIGINT) AS cum_resp
        FROM d
    ), t AS (
        SELECT CAST(SUM(n_users) AS BIGINT) AS tot_users,
               CAST(SUM(n_resp) AS BIGINT) AS tot_resp
        FROM d
    )
    SELECT c.decile AS decile, c.n_users AS n_users,
           c.n_resp AS n_responders,
           {_LIFT_RATE} AS resp_rate_micro,
           {_LIFT_CUM} AS cum_lift_micro
    FROM c CROSS JOIN t
    """,
)
def decile_lift_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ten-decile lift table: users ranked by click/view spend, scored by
    purchase-response rate and cumulative lift over the base rate.

    Plan shape: one per-user aggregate (the only data-sized shuffle),
    ranged_ntile for the exact decile split (two-pass range scheme, no
    global single-task sort), then a 10-row decile frame whose running
    sums and totals are constant-size windows/broadcasts. The lift and
    rate expressions are shared IEEE trees over exact integer counts, so
    the table replays exactly at any scale."""
    from cliqz_etl_spark.operators.stats import ranged_ntile

    ev = load_table(spark, sf_dir, "events").where(F.col("user_id").isNotNull())
    pu = (ev.groupBy("user_id")
          .agg(F.sum(F.expr(_LIFT_SCORE)).cast("long").alias("score_cents"),
               F.max(F.when(F.col("event_type") == "purchase", 1)
                     .otherwise(0)).cast("long").alias("resp")))
    tiled = ranged_ntile(
        pu.withColumn("neg_score", F.lit(0) - F.col("score_cents")),
        ["neg_score", "user_id"], 10, "decile",
    ).withColumn("decile", F.col("decile").cast("long"))
    d = tiled.groupBy("decile").agg(
        F.count(F.lit(1)).cast("long").alias("n_users"),
        F.sum("resp").cast("long").alias("n_resp"))
    # the decile frame is 10 rows — the running sums and the totals are
    # constant-size, so the single-partition window is model-sized.
    wc = (Window.orderBy(F.asc("decile"))
          .rowsBetween(Window.unboundedPreceding, 0))
    c = d.select(
        "decile", "n_users", "n_resp",
        F.sum("n_users").over(wc).cast("long").alias("cum_users"),
        F.sum("n_resp").over(wc).cast("long").alias("cum_resp"))
    t = d.agg(F.sum("n_users").cast("long").alias("tot_users"),
              F.sum("n_resp").cast("long").alias("tot_resp"))
    return (c.crossJoin(F.broadcast(t))
            .select("decile", "n_users",
                    F.col("n_resp").alias("n_responders"),
                    F.expr(_LIFT_RATE).alias("resp_rate_micro"),
                    F.expr(_LIFT_CUM).alias("cum_lift_micro")))


# --------------------------------------------------------------------------
# Chi-square test of independence: event type x day-of-week contingency
# table with expected counts and per-cell chi-square terms. Day-of-week
# is computed as days-since-a-known-Monday mod 7 — NOT each engine's
# dayofweek()/isodow(), whose numbering conventions differ (Spark
# 1=Sunday, DuckDB isodow 1=Monday). Expected counts and chi2 terms are
# one shared IEEE tree over the exact integer (row, column, grand)
# totals, micro-quantized per cell BEFORE any downstream use (the
# benford discipline). The spine is the cross join of OBSERVED types and
# weekdays, so absent cells still appear with their expected mass.
# --------------------------------------------------------------------------
_CHI2_E = ("(CAST(nr AS DOUBLE) * CAST(nc AS DOUBLE) "
           "/ CAST(n_all AS DOUBLE))")
_CHI2_TERM = (f"CAST(floor(((CAST(n_obs AS DOUBLE) - {_CHI2_E}) "
              f"* (CAST(n_obs AS DOUBLE) - {_CHI2_E}) / {_CHI2_E})"
              f" * 1000000 + 0.5) AS BIGINT)")


@query(
    "chi2_independence",
    oracle=f"""
    WITH base AS (
        SELECT event_type,
               CAST((CAST(ts AS DATE) - DATE '1970-01-05') % 7 AS BIGINT)
                   AS dow
        FROM events WHERE event_type IS NOT NULL AND ts IS NOT NULL
    ), obs AS (
        SELECT event_type, dow, CAST(count(*) AS BIGINT) AS n_obs
        FROM base GROUP BY 1, 2
    ), rt AS (
        SELECT event_type, CAST(SUM(n_obs) AS BIGINT) AS nr
        FROM obs GROUP BY 1
    ), ct AS (
        SELECT dow, CAST(SUM(n_obs) AS BIGINT) AS nc FROM obs GROUP BY 1
    ), n AS (SELECT CAST(SUM(n_obs) AS BIGINT) AS n_all FROM obs),
    spine AS (
        SELECT rt.event_type, rt.nr, ct.dow, ct.nc FROM rt CROSS JOIN ct
    ), cells AS (
        SELECT sp.event_type AS event_type, sp.dow AS dow,
               sp.nr AS nr, sp.nc AS nc,
               CAST(COALESCE(o.n_obs, 0) AS BIGINT) AS n_obs
        FROM spine sp LEFT JOIN obs o
          ON o.event_type = sp.event_type AND o.dow = sp.dow
    )
    SELECT c.event_type AS event_type, c.dow AS dow, c.n_obs AS n_obs,
           CAST(floor({_CHI2_E} * 1000000 + 0.5) AS BIGINT)
               AS expected_micro,
           {_CHI2_TERM} AS chi2_term_micro
    FROM cells c CROSS JOIN n
    """,
)
def chi2_independence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event-type x weekday contingency table with expected counts and
    chi-square contributions (micro), over a complete observed spine.

    Plan shape: ONE groupBy over the filtered scan for the cell counts;
    row totals, column totals, and the grand total all derive from that
    aggregate (never a re-scan), and the spine is a broadcast cross join
    of the two tiny marginal frames. Every post-aggregation frame is
    contingency-sized (types x 7)."""
    from cliqz_etl_spark.operators.dedup import _materialize

    ev = load_table(spark, sf_dir, "events")
    base = (ev.where(F.col("event_type").isNotNull()
                     & F.col("ts").isNotNull())
            .select("event_type",
                    F.expr("CAST(pmod(datediff(to_date(ts), "
                           "DATE '1970-01-05'), 7) AS BIGINT)").alias("dow")))
    # the contingency aggregate is the only data-sized pass; marginals,
    # the grand total, and the spine join all derive from it — persist
    # the (types x 7)-row frame so none of them re-scan the source.
    obs = _materialize(base.groupBy("event_type", "dow").agg(
        F.count(F.lit(1)).cast("long").alias("n_obs")))
    rt = obs.groupBy("event_type").agg(F.sum("n_obs").cast("long").alias("nr"))
    ct = obs.groupBy("dow").agg(F.sum("n_obs").cast("long").alias("nc"))
    n = obs.agg(F.sum("n_obs").cast("long").alias("n_all"))
    spine = rt.crossJoin(F.broadcast(ct))
    return (spine.join(obs, ["event_type", "dow"], "left")
            .withColumn("n_obs", F.coalesce(F.col("n_obs"), F.lit(0))
                        .cast("long"))
            .crossJoin(F.broadcast(n))
            .select("event_type", "dow", "n_obs",
                    F.expr(f"CAST(floor({_CHI2_E} * 1000000 + 0.5) AS "
                           "BIGINT)").alias("expected_micro"),
                    F.expr(_CHI2_TERM).alias("chi2_term_micro")))


# --------------------------------------------------------------------------
# Closed-form OLS per market segment: average order price (dollars)
# regressed on account balance (cents), via the textbook normal-equation
# sums. The six sufficient statistics (n, Sx, Sy, Sxx, Syy, Sxy) are
# EXACT integer sums — order-independent under any partitioning — and
# slope/intercept/R^2 come out of one shared double tree over them, so
# both engines compute bit-identical coefficients. The per-customer y is
# integer round-half-up of mean order cents to dollars, keeping Syy in
# BIGINT range decades past bench scale.
# --------------------------------------------------------------------------
_OLS_DET = ("(CAST(n_customers AS DOUBLE) * CAST(sxx AS DOUBLE) "
            "- CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))")
_OLS_COV = ("(CAST(n_customers AS DOUBLE) * CAST(sxy AS DOUBLE) "
            "- CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))")
_OLS_SLOPE = f"({_OLS_COV} / {_OLS_DET})"
_OLS_INTERCEPT = (f"((CAST(sy AS DOUBLE) - {_OLS_SLOPE} "
                  f"* CAST(sx AS DOUBLE)) / CAST(n_customers AS DOUBLE))")
_OLS_R2 = (f"({_OLS_COV} * {_OLS_COV} / ({_OLS_DET} "
           "* (CAST(n_customers AS DOUBLE) * CAST(syy AS DOUBLE) "
           "- CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))))")


@query(
    "ols_by_segment",
    oracle=f"""
    WITH po AS (
        SELECT o_custkey,
               CAST(SUM(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
                    AS BIGINT) AS s_cents,
               CAST(count(*) AS BIGINT) AS n_o
        FROM orders WHERE o_custkey IS NOT NULL GROUP BY 1
    ), xy AS (
        SELECT c.c_mktsegment AS seg,
               CAST(floor(c.c_acctbal * 100 + 0.5) AS BIGINT) AS x,
               CAST((po.s_cents + 50 * po.n_o) // (100 * po.n_o)
                    AS BIGINT) AS y
        FROM customer c JOIN po ON po.o_custkey = c.c_custkey
        WHERE c.c_acctbal IS NOT NULL
    ), s AS (
        SELECT seg, CAST(count(*) AS BIGINT) AS n_customers,
               CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
               CAST(SUM(x * x) AS BIGINT) AS sxx,
               CAST(SUM(y * y) AS BIGINT) AS syy,
               CAST(SUM(x * y) AS BIGINT) AS sxy
        FROM xy GROUP BY 1 HAVING count(*) >= 2
    )
    SELECT seg AS c_mktsegment, n_customers,
           CAST(floor({_OLS_SLOPE} * 1000000 + 0.5) AS BIGINT)
               AS slope_micro,
           CAST(floor({_OLS_INTERCEPT} * 1000 + 0.5) AS BIGINT)
               AS intercept_milli,
           CAST(floor({_OLS_R2} * 1000000 + 0.5) AS BIGINT) AS r2_micro
    FROM s WHERE {_OLS_DET} <> 0.0
    """,
)
def ols_by_segment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-segment OLS of mean order price (dollars) on account balance
    (cents): slope (micro), intercept (milli dollars), R^2 (micro).

    Plan shape: one per-customer order aggregate, one join to the
    customer dimension (AQE broadcasts the smaller side), one per-segment
    aggregate of the six exact integer sufficient statistics — partial
    aggregation applies to all of them, and the closed-form solve is a
    segment-count-sized projection. x*y products stay in BIGINT for any
    realistic balance/price domain; the coefficient arithmetic is a
    shared double tree, identical text on both engines."""
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    po = (orders.where(F.col("o_custkey").isNotNull())
          .groupBy("o_custkey")
          .agg(F.sum(F.floor(F.col("o_totalprice") * 100 + F.lit(0.5))
                     .cast("long")).cast("long").alias("s_cents"),
               F.count(F.lit(1)).cast("long").alias("n_o")))
    xy = (cust.where(F.col("c_acctbal").isNotNull())
          .join(po, po.o_custkey == cust.c_custkey)
          .select(F.col("c_mktsegment").alias("seg"),
                  F.floor(F.col("c_acctbal") * 100 + F.lit(0.5)).cast("long")
                  .alias("x"),
                  F.expr("CAST((s_cents + 50 * n_o) div (100 * n_o) "
                         "AS BIGINT)").alias("y")))
    s = (xy.groupBy("seg")
         .agg(F.count(F.lit(1)).cast("long").alias("n_customers"),
              F.sum("x").cast("long").alias("sx"),
              F.sum("y").cast("long").alias("sy"),
              F.sum(F.col("x") * F.col("x")).cast("long").alias("sxx"),
              F.sum(F.col("y") * F.col("y")).cast("long").alias("syy"),
              F.sum(F.col("x") * F.col("y")).cast("long").alias("sxy"))
         .where(F.col("n_customers") >= 2))
    return (s.where(F.expr(f"{_OLS_DET} <> 0.0"))
            .select(F.col("seg").alias("c_mktsegment"), "n_customers",
                    F.expr(f"CAST(floor({_OLS_SLOPE} * 1000000 + 0.5) "
                           "AS BIGINT)").alias("slope_micro"),
                    F.expr(f"CAST(floor({_OLS_INTERCEPT} * 1000 + 0.5) "
                           "AS BIGINT)").alias("intercept_milli"),
                    F.expr(f"CAST(floor({_OLS_R2} * 1000000 + 0.5) "
                           "AS BIGINT)").alias("r2_micro")))


# --------------------------------------------------------------------------
# Label-centroid cosine matrix — the embedding-quality screen (are class
# centroids separable?) run after every labeling pass. Per-element
# micro-quantization happens BEFORE any summation, so the per-(label,
# dim) sums are exact integers under any partitioning (float sums
# reorder; integer sums don't — the similarity-family discipline), and
# centroid means re-quantize to micro integers so the 64-dim dot
# products stay in BIGINT at any corpus size. Cosines come from one
# shared double tree over those exact integers.
# --------------------------------------------------------------------------
_CENT_COS = ("(CAST(dot AS DOUBLE) / sqrt(CAST(nna AS DOUBLE) "
             "* CAST(nnb AS DOUBLE)))")


@query(
    "label_centroid_cosine",
    oracle=f"""
    WITH ex AS (
        SELECT CAST(label AS BIGINT) AS label,
               CAST(generate_subscripts(embedding, 1) AS BIGINT) AS dim,
               CAST(floor(CAST(unnest(embedding) AS DOUBLE) * 1000000
                          + 0.5) AS BIGINT) AS q
        FROM embeddings
        WHERE embedding IS NOT NULL AND label IS NOT NULL
          AND len(embedding) = 64
          -- vector-level validity (the similarity-family discipline):
          -- any NULL/NaN/out-of-envelope element makes the whole vector
          -- unusable for an exact integer centroid sum
          AND len(list_filter(embedding, x -> x IS NULL
                  OR isnan(CAST(x AS DOUBLE))
                  OR abs(CAST(x AS DOUBLE)) > 1000000.0)) = 0
    ), cs AS (
        SELECT label, dim, CAST(SUM(q) AS BIGINT) AS s,
               CAST(count(*) AS BIGINT) AS n
        FROM ex GROUP BY 1, 2
    ), m AS (
        SELECT label, dim,
               CAST(floor(CAST(s AS DOUBLE) / CAST(n AS DOUBLE) + 0.5)
                    AS BIGINT) AS m
        FROM cs
    ), norms AS (
        SELECT label, CAST(SUM(m * m) AS BIGINT) AS nn FROM m GROUP BY 1
    ), dots AS (
        SELECT a.label AS label_a, b.label AS label_b,
               CAST(SUM(a.m * b.m) AS BIGINT) AS dot
        FROM m a JOIN m b ON b.dim = a.dim AND a.label < b.label
        GROUP BY 1, 2
    )
    SELECT d.label_a AS label_a, d.label_b AS label_b, d.dot AS dot,
           CAST(floor({_CENT_COS} * 1000000 + 0.5) AS BIGINT) AS cos_micro
    FROM (SELECT dots.label_a, dots.label_b, dots.dot,
                 na.nn AS nna, nb.nn AS nnb
          FROM dots JOIN norms na ON na.label = dots.label_a
                    JOIN norms nb ON nb.label = dots.label_b)
         d(label_a, label_b, dot, nna, nnb)
    WHERE d.nna > 0 AND d.nnb > 0
    """,
)
def label_centroid_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise cosine similarity between per-label embedding centroids
    (micro), over exact integer element sums.

    Plan shape: one posexplode scan collapses to the (label, dim)
    integer-sum frame — the only data-sized pass — and everything after
    is centroid-sized (labels x 64 rows): the mean re-quantization, the
    dim-keyed self-join for pairwise dots, and the label-keyed norm
    join. At 100 TB the explode multiplies the scan by the (fixed)
    dimension count and the aggregate combines map-side; no stage holds
    more than labels x dims rows afterwards."""
    from cliqz_etl_spark.operators.dedup import _materialize

    emb = load_table(spark, sf_dir, "embeddings")
    valid = F.expr(
        "size(filter(embedding, x -> x IS NULL OR isnan(CAST(x AS DOUBLE)) "
        "OR abs(CAST(x AS DOUBLE)) > 1000000.0D)) = 0")
    ex = (emb.where(F.col("embedding").isNotNull()
                    & F.col("label").isNotNull()
                    & (F.size("embedding") == 64) & valid)
          .select(F.col("label").cast("long").alias("label"),
                  F.posexplode("embedding").alias("pos", "x"))
          .select("label", (F.col("pos") + 1).cast("long").alias("dim"),
                  F.floor(F.col("x").cast("double") * 1_000_000
                          + F.lit(0.5)).cast("long").alias("q")))
    cs = ex.groupBy("label", "dim").agg(
        F.sum("q").cast("long").alias("s"),
        F.count(F.lit(1)).cast("long").alias("n"))
    m = _materialize(cs.select(
        "label", "dim",
        F.expr("CAST(floor(CAST(s AS DOUBLE) / CAST(n AS DOUBLE) + 0.5) "
               "AS BIGINT)").alias("m")))
    norms = m.groupBy("label").agg(
        F.sum(F.col("m") * F.col("m")).cast("long").alias("nn"))
    a = m.select(F.col("label").alias("label_a"), "dim",
                 F.col("m").alias("ma"))
    b = m.select(F.col("label").alias("label_b"), "dim",
                 F.col("m").alias("mb"))
    dots = (a.join(b, "dim")
            .where(F.col("label_a") < F.col("label_b"))
            .groupBy("label_a", "label_b")
            .agg(F.sum(F.col("ma") * F.col("mb")).cast("long").alias("dot")))
    return (dots
            .join(F.broadcast(norms.select(F.col("label").alias("label_a"),
                                           F.col("nn").alias("nna"))),
                  "label_a")
            .join(F.broadcast(norms.select(F.col("label").alias("label_b"),
                                           F.col("nn").alias("nnb"))),
                  "label_b")
            .where((F.col("nna") > 0) & (F.col("nnb") > 0))
            .select("label_a", "label_b", "dot",
                    F.expr(f"CAST(floor({_CENT_COS} * 1000000 + 0.5) "
                           "AS BIGINT)").alias("cos_micro")))


# --------------------------------------------------------------------------
# ALS user-side half-step: solve each user's 2-factor ridge system
# against FIXED item factors — one full alternating-least-squares
# update, the recommender-training primitive. Item factors are
# hash-derived milli integers (deterministic, engine-portable), the
# per-user normal-equation sufficient statistics are exact integer sums,
# and the closed-form 2x2 solve is one shared double tree — so the
# "training step" replays bit-identically, like the PCA and
# target-encoding fits. Ratings are order quantities via the
# order->user join.
# --------------------------------------------------------------------------
_ALS_LAMBDA = 1_000_000  # ridge, in milli^2 factor units (= 1.0)
_ALS_F1 = "(((l_partkey * 2654435761) % 1997) - 998)"
_ALS_F2 = "(((l_partkey * 40503) % 1997) - 998)"
_ALS_DET = (f"((CAST(a11 AS DOUBLE) + {_ALS_LAMBDA}) "
            f"* (CAST(a22 AS DOUBLE) + {_ALS_LAMBDA}) "
            "- CAST(a12 AS DOUBLE) * CAST(a12 AS DOUBLE))")
_ALS_W1 = (f"(((CAST(a22 AS DOUBLE) + {_ALS_LAMBDA}) * CAST(b1 AS DOUBLE) "
           f"- CAST(a12 AS DOUBLE) * CAST(b2 AS DOUBLE)) / {_ALS_DET})")
_ALS_W2 = (f"(((CAST(a11 AS DOUBLE) + {_ALS_LAMBDA}) * CAST(b2 AS DOUBLE) "
           f"- CAST(a12 AS DOUBLE) * CAST(b1 AS DOUBLE)) / {_ALS_DET})")


@query(
    "als_half_step",
    oracle=f"""
    WITH r AS (
        SELECT o.o_custkey AS user_id,
               {_ALS_F1} AS f1, {_ALS_F2} AS f2,
               CAST(floor(l.l_quantity + 0.5) AS BIGINT) AS rating
        FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
        WHERE l.l_partkey IS NOT NULL AND l.l_quantity IS NOT NULL
          AND o.o_custkey IS NOT NULL
    ), s AS (
        SELECT user_id,
               CAST(count(*) AS BIGINT) AS n_items,
               CAST(SUM(f1 * f1) AS BIGINT) AS a11,
               CAST(SUM(f1 * f2) AS BIGINT) AS a12,
               CAST(SUM(f2 * f2) AS BIGINT) AS a22,
               CAST(SUM(f1 * rating) AS BIGINT) AS b1,
               CAST(SUM(f2 * rating) AS BIGINT) AS b2
        FROM r GROUP BY 1
    )
    SELECT user_id, n_items,
           CAST(floor({_ALS_W1} * 1000000 + 0.5) AS BIGINT) AS w1_micro,
           CAST(floor({_ALS_W2} * 1000000 + 0.5) AS BIGINT) AS w2_micro
    FROM s
    """,
)
def als_half_step(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One ALS user-factor update (2 latent factors, ridge 1.0) against
    hash-derived fixed item factors, rated by order quantity.

    Plan shape: one lineitem-orders equi-join (the fact join — AQE
    broadcasts nothing here, both sides are data-sized, which is the
    correct shuffle), then ONE per-user aggregate of the five
    normal-equation sums with map-side combine, then a row-local 2x2
    solve. This is exactly how production ALS distributes: sufficient
    statistics shuffle once on the user key, the dense solve never
    leaves the row. The ridge term keeps every system invertible, so no
    det=0 guard is needed."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    r = (li.where(F.col("l_partkey").isNotNull()
                  & F.col("l_quantity").isNotNull())
         .join(orders.where(F.col("o_custkey").isNotNull())
               .select("o_orderkey", "o_custkey"),
               li.l_orderkey == F.col("o_orderkey"))
         .select(F.col("o_custkey").alias("user_id"),
                 F.expr(f"CAST({_ALS_F1} AS BIGINT)").alias("f1"),
                 F.expr(f"CAST({_ALS_F2} AS BIGINT)").alias("f2"),
                 F.floor(F.col("l_quantity") + F.lit(0.5)).cast("long")
                 .alias("rating")))
    s = (r.groupBy("user_id")
         .agg(F.count(F.lit(1)).cast("long").alias("n_items"),
              F.sum(F.col("f1") * F.col("f1")).cast("long").alias("a11"),
              F.sum(F.col("f1") * F.col("f2")).cast("long").alias("a12"),
              F.sum(F.col("f2") * F.col("f2")).cast("long").alias("a22"),
              F.sum(F.col("f1") * F.col("rating")).cast("long").alias("b1"),
              F.sum(F.col("f2") * F.col("rating")).cast("long").alias("b2")))
    return s.select(
        "user_id", "n_items",
        F.expr(f"CAST(floor({_ALS_W1} * 1000000 + 0.5) AS BIGINT)")
        .alias("w1_micro"),
        F.expr(f"CAST(floor({_ALS_W2} * 1000000 + 0.5) AS BIGINT)")
        .alias("w2_micro"))


# --------------------------------------------------------------------------
# Logistic regression by quantized gradient descent — the classification
# member of the trainable family (OLS regresses, ALS factorizes, kmeans
# clusters, PCA whitens; this one classifies). The determinism problem
# with distributed GD is the gradient SUM: sigmoid terms are doubles,
# and a double sum's value depends on partition order. The fix is the
# tfidf discipline applied to training: each row's gradient term
# quantizes to micro INTEGERS first, so the per-iteration aggregate is
# an exact integer sum under any partitioning, and the weight update is
# one shared double tree over (sum, n). Three unrolled iterations from
# w = 0; the oracle replays the whole descent through chained CTEs
# (weights as 1-row tables where Spark embeds the identical integers as
# literals — same values, same IEEE ops, same result).
# --------------------------------------------------------------------------
_LGD_ITER = 3


def _lgd_sig(w0: str, w1: str) -> str:
    z = (f"((CAST({w0} AS DOUBLE) + CAST({w1} AS DOUBLE) "
         "* (CAST(x_milli AS DOUBLE) / 1000.0)) / 1000000.0)")
    return f"(1.0 / (1.0 + exp(0.0 - {z})))"


def _lgd_g0(w0: str, w1: str) -> str:
    return (f"CAST(floor(1000000.0 * ({_lgd_sig(w0, w1)} "
            "- CAST(y AS DOUBLE)) + 0.5) AS BIGINT)")


def _lgd_g1(w0: str, w1: str) -> str:
    return (f"CAST(floor(1000000.0 * ({_lgd_sig(w0, w1)} "
            "- CAST(y AS DOUBLE)) * (CAST(x_milli AS DOUBLE) / 1000.0)"
            " + 0.5) AS BIGINT)")


_LGD_UPD = ("CAST(floor(CAST({s} AS DOUBLE) / CAST(n AS DOUBLE) + 0.5) "
            "AS BIGINT)")


def _lgd_oracle() -> str:
    head = """
    WITH feat AS (
        SELECT CAST(floor(c.c_acctbal + 0.5) AS BIGINT) AS x_milli,
               CASE WHEN o.o_custkey IS NULL THEN 0 ELSE 1 END AS y
        FROM customer c LEFT JOIN (SELECT DISTINCT o_custkey FROM orders
                                   WHERE o_custkey IS NOT NULL) o
          ON o.o_custkey = c.c_custkey
        WHERE c.c_acctbal IS NOT NULL
    ), nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM feat),
    w0 AS (SELECT CAST(0 AS BIGINT) AS a, CAST(0 AS BIGINT) AS b)"""
    parts = [head]
    for t in range(1, _LGD_ITER + 1):
        g0 = _lgd_g0(f"w{t - 1}.a", f"w{t - 1}.b")
        g1 = _lgd_g1(f"w{t - 1}.a", f"w{t - 1}.b")
        parts.append(f"""
    , g{t} AS MATERIALIZED (
        SELECT CAST(SUM({g0}) AS BIGINT) AS s0,
               CAST(SUM({g1}) AS BIGINT) AS s1
        FROM feat CROSS JOIN w{t - 1}
    ), w{t} AS MATERIALIZED (
        SELECT CAST(w{t - 1}.a - {_LGD_UPD.format(s='g{t}.s0'.format(t=t))}
                    AS BIGINT) AS a,
               CAST(w{t - 1}.b - {_LGD_UPD.format(s='g{t}.s1'.format(t=t))}
                    AS BIGINT) AS b
        FROM w{t - 1} CROSS JOIN g{t} CROSS JOIN nn
    )""")
    sels = [(f"SELECT CAST({t} AS BIGINT) AS iter, w{t}.a AS w0_micro, "
             f"w{t}.b AS w1_micro, g{t}.s0 AS sum_g0_micro, "
             f"g{t}.s1 AS sum_g1_micro FROM w{t} CROSS JOIN g{t}")
            for t in range(1, _LGD_ITER + 1)]
    return "".join(parts) + "\n    " + "\n    UNION ALL ".join(sels)


@query("logistic_gd_steps", oracle=_lgd_oracle())
def logistic_gd_steps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Three quantized gradient-descent steps of a 2-weight logistic
    model (has-order ~ account balance), reporting per-iteration weights
    and exact integer gradient sums.

    Plan shape: the feature frame (one customer-orders existence join)
    persists once; each iteration is ONE aggregate over it with the
    current weights embedded as literals — map-side combine, integer
    sums, nothing data-sized on the driver but the two gradient scalars
    per step. This is exactly how distributed SGD epochs structure their
    communication (one reduce per step); the quantization is what makes
    the run replayable enough to oracle-check bit-for-bit."""
    import math

    from cliqz_etl_spark.operators.dedup import _materialize

    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    buyers = (orders.where(F.col("o_custkey").isNotNull())
              .select("o_custkey").distinct())
    feat = _materialize(
        cust.where(F.col("c_acctbal").isNotNull())
        .join(buyers, buyers.o_custkey == cust.c_custkey, "left")
        .select(F.floor(F.col("c_acctbal") + F.lit(0.5)).cast("long")
                .alias("x_milli"),
                F.when(F.col("o_custkey").isNull(), 0).otherwise(1)
                .alias("y")))
    n = feat.count()
    if n == 0:
        raise ValueError("logistic_gd_steps: no labeled rows to fit")
    w0, w1 = 0, 0
    rows = []
    for t in range(1, _LGD_ITER + 1):
        agg = feat.agg(
            F.expr(f"CAST(SUM({_lgd_g0(str(w0), str(w1))}) AS BIGINT)")
            .alias("s0"),
            F.expr(f"CAST(SUM({_lgd_g1(str(w0), str(w1))}) AS BIGINT)")
            .alias("s1")).collect()[0]
        s0, s1 = int(agg["s0"]), int(agg["s1"])
        w0 -= int(math.floor(float(s0) / float(n) + 0.5))
        w1 -= int(math.floor(float(s1) / float(n) + 0.5))
        rows.append((t, w0, w1, s0, s1))
    return spark.createDataFrame(
        rows, "iter: bigint, w0_micro: bigint, w1_micro: bigint, "
              "sum_g0_micro: bigint, sum_g1_micro: bigint")


# --------------------------------------------------------------------------
# Decision-stump split search — tree learning's inner loop, fully
# distributed (no driver fit): candidate thresholds are the hundred-
# dollar grid of the balance domain (bounded by the DOMAIN, not the
# data — the histogram trick every distributed GBDT uses), per-cut
# left/right class counts come from one cumulative pass over the
# grid-level aggregate, and the weighted Gini is a shared double tree
# over exact integer counts. The argmax is deterministic (min gini,
# ties to the smallest cut) and rides the same bounded frame.
# --------------------------------------------------------------------------
_STUMP_GINI = ("(((CAST(n_l AS DOUBLE) * (2.0 * (CAST(pos_l AS DOUBLE) "
               "/ CAST(n_l AS DOUBLE)) * (1.0 - CAST(pos_l AS DOUBLE) "
               "/ CAST(n_l AS DOUBLE)))) + (CAST(n_r AS DOUBLE) "
               "* (2.0 * (CAST(pos_r AS DOUBLE) / CAST(n_r AS DOUBLE)) "
               "* (1.0 - CAST(pos_r AS DOUBLE) / CAST(n_r AS DOUBLE))))) "
               "/ (CAST(n_l AS DOUBLE) + CAST(n_r AS DOUBLE)))")


@query(
    "stump_split_search",
    oracle=f"""
    WITH feat AS (
        SELECT CAST(floor(c.c_acctbal + 0.5) AS BIGINT) AS x,
               CASE WHEN o.o_custkey IS NULL THEN 0 ELSE 1 END AS y
        FROM customer c LEFT JOIN (SELECT DISTINCT o_custkey FROM orders
                                   WHERE o_custkey IS NOT NULL) o
          ON o.o_custkey = c.c_custkey
        WHERE c.c_acctbal IS NOT NULL
    ), grid AS (
        SELECT CAST((CASE WHEN x >= 0 THEN x // 100
                          ELSE -((-x + 99) // 100) END) * 100 + 99
                    AS BIGINT) AS cut,
               CAST(count(*) AS BIGINT) AS n,
               CAST(SUM(y) AS BIGINT) AS pos
        FROM feat GROUP BY 1
    ), cum AS (
        SELECT cut,
               CAST(SUM(n) OVER (ORDER BY cut ASC) AS BIGINT) AS n_l,
               CAST(SUM(pos) OVER (ORDER BY cut ASC) AS BIGINT) AS pos_l
        FROM grid
    ), tot AS (
        SELECT CAST(SUM(n) AS BIGINT) AS n_all,
               CAST(SUM(pos) AS BIGINT) AS pos_all
        FROM grid
    ), scored AS (
        SELECT cut, n_l, pos_l,
               CAST(n_all - n_l AS BIGINT) AS n_r,
               CAST(pos_all - pos_l AS BIGINT) AS pos_r,
               CAST(floor({_STUMP_GINI} * 1000000 + 0.5) AS BIGINT)
                   AS gini_micro
        FROM cum CROSS JOIN tot
        WHERE n_l > 0 AND n_all - n_l > 0
    ), best AS (
        SELECT cut AS bcut, gini_micro AS bg FROM scored
        ORDER BY gini_micro ASC, cut ASC LIMIT 1
    )
    SELECT s.cut AS cut_dollars, s.n_l AS n_left, s.pos_l AS pos_left,
           s.n_r AS n_right, s.pos_r AS pos_right,
           s.gini_micro AS gini_micro,
           CAST(s.cut = best.bcut AND s.gini_micro = best.bg AS BOOLEAN)
               AS is_best
    FROM scored s CROSS JOIN best
    """,
)
def stump_split_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted-Gini split search for a depth-1 tree on (balance ->
    has-order), over the hundred-dollar threshold grid, with the best
    cut flagged.

    Plan shape: one feature join + ONE grid-level aggregate (the only
    data-sized stages); the cumulative class counts, Gini scoring, and
    the 1-row argmin all run on the domain-bounded grid (a few hundred
    rows at any corpus size — the histogram-split trick that lets
    distributed GBDTs scan once per tree level). The grid window is a
    single task by construction, like the decile frame."""
    from cliqz_etl_spark.operators.dedup import _materialize

    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    buyers = (orders.where(F.col("o_custkey").isNotNull())
              .select("o_custkey").distinct())
    feat = (cust.where(F.col("c_acctbal").isNotNull())
            .join(buyers, buyers.o_custkey == cust.c_custkey, "left")
            .select(F.floor(F.col("c_acctbal") + F.lit(0.5)).cast("long")
                    .alias("x"),
                    F.when(F.col("o_custkey").isNull(), 0).otherwise(1)
                    .alias("y")))
    # ceil-to-bucket-top for negatives mirrors the oracle's CASE: the
    # grid cell for x is [k*100, k*100+99] with cut = its top edge
    grid = _materialize(
        feat.select(F.expr(
            "CAST((CASE WHEN x >= 0 THEN x div 100 "
            "ELSE -((-x + 99) div 100) END) * 100 + 99 AS BIGINT)")
            .alias("cut"), "y")
        .groupBy("cut")
        .agg(F.count(F.lit(1)).cast("long").alias("n"),
             F.sum("y").cast("long").alias("pos")))
    wc = Window.orderBy(F.asc("cut")).rowsBetween(
        Window.unboundedPreceding, 0)
    cum = grid.select(
        "cut", F.sum("n").over(wc).cast("long").alias("n_l"),
        F.sum("pos").over(wc).cast("long").alias("pos_l"))
    tot = grid.agg(F.sum("n").cast("long").alias("n_all"),
                   F.sum("pos").cast("long").alias("pos_all"))
    scored = (cum.crossJoin(F.broadcast(tot))
              .select("cut", "n_l", "pos_l",
                      (F.col("n_all") - F.col("n_l")).cast("long")
                      .alias("n_r"),
                      (F.col("pos_all") - F.col("pos_l")).cast("long")
                      .alias("pos_r"))
              .where((F.col("n_l") > 0) & (F.col("n_r") > 0))
              .withColumn("gini_micro",
                          F.expr(f"CAST(floor({_STUMP_GINI} * 1000000 "
                                 "+ 0.5) AS BIGINT)")))
    best = (scored.agg(F.min(F.struct("gini_micro", "cut")).alias("b"))
            .select(F.col("b.cut").alias("bcut"),
                    F.col("b.gini_micro").alias("bg")))
    return (scored.crossJoin(F.broadcast(best))
            .select(F.col("cut").alias("cut_dollars"),
                    F.col("n_l").alias("n_left"),
                    F.col("pos_l").alias("pos_left"),
                    F.col("n_r").alias("n_right"),
                    F.col("pos_r").alias("pos_right"),
                    "gini_micro",
                    ((F.col("cut") == F.col("bcut"))
                     & (F.col("gini_micro") == F.col("bg")))
                    .alias("is_best")))


# --------------------------------------------------------------------------
# One-way ANOVA F statistic across market segments — the k-group
# generalization of the A/B z-test (already in the family) for
# continuous outcomes. Sufficient statistics per group are exact
# integer sums (n, S, SS in cents); SSB/SSW and F assemble in one
# shared double tree, micro-quantized. Degenerate designs (k < 2 or
# n <= k) yield NULL F on both engines.
# --------------------------------------------------------------------------
_ANOVA_F = ("(((CAST(ssb AS DOUBLE)) / (CAST(k AS DOUBLE) - 1.0)) "
            "/ ((CAST(ssw AS DOUBLE)) / (CAST(n AS DOUBLE) "
            "- CAST(k AS DOUBLE))))")
# per-GROUP terms quantize to integer cents^2 BEFORE the cross-group sum
# (a double sum over even 5 groups is partition-order-dependent; integer
# sums are not — the tfidf discipline applied to test statistics)
_ANOVA_SSB_TERM = ("CAST(floor((CAST(s_g AS DOUBLE) / CAST(n_g AS DOUBLE) "
                   "- CAST(s_all AS DOUBLE) / CAST(n_all AS DOUBLE)) "
                   "* (CAST(s_g AS DOUBLE) / CAST(n_g AS DOUBLE) "
                   "- CAST(s_all AS DOUBLE) / CAST(n_all AS DOUBLE)) "
                   "* CAST(n_g AS DOUBLE) + 0.5) AS BIGINT)")
_ANOVA_SSW_TERM = ("CAST(floor(CAST(ss_g AS DOUBLE) - CAST(s_g AS DOUBLE) "
                   "* CAST(s_g AS DOUBLE) / CAST(n_g AS DOUBLE) + 0.5) "
                   "AS BIGINT)")


@query(
    "anova_f_segments",
    oracle=f"""
    WITH base AS (
        SELECT c_mktsegment AS seg,
               CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT) AS v
        FROM customer
        WHERE c_mktsegment IS NOT NULL AND c_acctbal IS NOT NULL
    ), g AS (
        SELECT seg, CAST(count(*) AS BIGINT) AS n_g,
               CAST(SUM(v) AS BIGINT) AS s_g,
               CAST(SUM(v * v) AS BIGINT) AS ss_g
        FROM base GROUP BY 1
    ), t AS (
        SELECT CAST(count(*) AS BIGINT) AS k,
               CAST(SUM(n_g) AS BIGINT) AS n,
               CAST(SUM(s_g) AS BIGINT) AS s_all
        FROM g
    ), terms AS (
        SELECT t.k AS k, t.n AS n,
               {_ANOVA_SSB_TERM.replace("n_all", "t.n")} AS ssb_t,
               {_ANOVA_SSW_TERM} AS ssw_t
        FROM g CROSS JOIN t
    ), parts AS (
        SELECT k, n, CAST(SUM(ssb_t) AS BIGINT) AS ssb,
               CAST(SUM(ssw_t) AS BIGINT) AS ssw
        FROM terms GROUP BY k, n
    )
    SELECT k AS n_groups, n AS n_rows,
           CAST(floor(CAST(ssb AS DOUBLE) / 10000.0 + 0.5) AS BIGINT)
               AS ssb_dollars2,
           CAST(floor(CAST(ssw AS DOUBLE) / 10000.0 + 0.5) AS BIGINT)
               AS ssw_dollars2,
           CASE WHEN k >= 2 AND n > k AND ssw > 0
                THEN CAST(floor({_ANOVA_F} * 1000000 + 0.5) AS BIGINT)
           END AS f_micro
    FROM parts
    """,
)
def anova_f_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-way ANOVA of account balance across market segments: group
    count, row count, between/within sums of squares (dollar^2), and
    the F statistic (micro).

    Plan shape: ONE per-segment aggregate of exact integer sufficient
    statistics (map-side combine), then segment-count-sized arithmetic.
    The SSB/SSW/F doubles are one shared IEEE tree over those integers,
    so the statistic replays exactly — same discipline as the z-test
    and chi-square siblings."""
    from cliqz_etl_spark.operators.dedup import _materialize

    cust = load_table(spark, sf_dir, "customer")
    base = (cust.where(F.col("c_mktsegment").isNotNull()
                       & F.col("c_acctbal").isNotNull())
            .select(F.col("c_mktsegment").alias("seg"),
                    F.floor(F.col("c_acctbal") * 100 + F.lit(0.5))
                    .cast("long").alias("v")))
    # the per-segment aggregate is the only data-sized pass; the totals
    # row and the term projection both read it — persist the k-row frame
    # so the scan isn't paid twice
    g = _materialize(base.groupBy("seg").agg(
        F.count(F.lit(1)).cast("long").alias("n_g"),
        F.sum("v").cast("long").alias("s_g"),
        F.sum(F.col("v") * F.col("v")).cast("long").alias("ss_g")))
    t = g.agg(F.count(F.lit(1)).cast("long").alias("k"),
              F.sum("n_g").cast("long").alias("n"),
              F.sum("s_g").cast("long").alias("s_all"))
    terms = (g.crossJoin(F.broadcast(t))
             .select("k", "n",
                     F.expr(_ANOVA_SSB_TERM.replace("n_all", "n"))
                     .alias("ssb_t"),
                     F.expr(_ANOVA_SSW_TERM).alias("ssw_t")))
    parts = terms.groupBy("k", "n").agg(
        F.sum("ssb_t").cast("long").alias("ssb"),
        F.sum("ssw_t").cast("long").alias("ssw"))
    return parts.select(
        F.col("k").alias("n_groups"), F.col("n").alias("n_rows"),
        F.expr("CAST(floor(CAST(ssb AS DOUBLE) / 10000.0 + 0.5) AS BIGINT)")
        .alias("ssb_dollars2"),
        F.expr("CAST(floor(CAST(ssw AS DOUBLE) / 10000.0 + 0.5) AS BIGINT)")
        .alias("ssw_dollars2"),
        F.expr(f"CASE WHEN k >= 2 AND n > k AND ssw > 0 THEN "
               f"CAST(floor({_ANOVA_F} * 1000000 + 0.5) AS BIGINT) END")
        .alias("f_micro"))


# --------------------------------------------------------------------------
# Weight-of-evidence / information-value encoding — the credit-scoring
# feature transform: balance bins scored by ln(pos share / neg share),
# with the bin's IV contribution. Add-one smoothing keeps every term
# finite on degenerate bins (the psi_term discipline: the ratio
# assembles from exact integer counts into ONE shared double before the
# single ln), and fixed bin edges keep the histogram mergeable.
# --------------------------------------------------------------------------
_WOE_BIN = ("CAST(least(9, greatest(0, (x + 1000) // 1100)) AS BIGINT)")
_WOE_BIN_SPARK = ("CAST(least(9, greatest(0, (x + 1000) div 1100)) "
                  "AS BIGINT)")
_WOE_NUM = "((CAST(pos AS DOUBLE) + 1.0) * (CAST(neg_all AS DOUBLE) + 10.0))"
_WOE_DEN = "((CAST(neg AS DOUBLE) + 1.0) * (CAST(pos_all AS DOUBLE) + 10.0))"
_WOE = f"ln({_WOE_NUM} / {_WOE_DEN})"
_WOE_IV = (f"CAST(floor(((CAST(pos AS DOUBLE) + 1.0) "
           f"/ (CAST(pos_all AS DOUBLE) + 10.0) "
           f"- (CAST(neg AS DOUBLE) + 1.0) "
           f"/ (CAST(neg_all AS DOUBLE) + 10.0)) * {_WOE} "
           "* 1000000 + 0.5) AS BIGINT)")


@query(
    "woe_iv_encoding",
    oracle=f"""
    WITH feat AS (
        SELECT CAST(floor(c.c_acctbal + 0.5) AS BIGINT) AS x,
               CASE WHEN o.o_custkey IS NULL THEN 0 ELSE 1 END AS y
        FROM customer c LEFT JOIN (SELECT DISTINCT o_custkey FROM orders
                                   WHERE o_custkey IS NOT NULL) o
          ON o.o_custkey = c.c_custkey
        WHERE c.c_acctbal IS NOT NULL
    ), b AS (
        SELECT {_WOE_BIN} AS bin,
               CAST(SUM(y) AS BIGINT) AS pos,
               CAST(SUM(1 - y) AS BIGINT) AS neg
        FROM feat GROUP BY 1
    ), t AS (
        SELECT CAST(SUM(pos) AS BIGINT) AS pos_all,
               CAST(SUM(neg) AS BIGINT) AS neg_all
        FROM b
    )
    SELECT bin, pos AS n_pos, neg AS n_neg,
           CAST(floor({_WOE} * 1000 + 0.5) AS BIGINT) AS woe_milli,
           {_WOE_IV} AS iv_contrib_micro
    FROM b CROSS JOIN t
    """,
)
def woe_iv_encoding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weight of evidence (milli) and information-value contribution
    (micro) per fixed balance bin against the has-order label.

    Plan shape: the feature join + ONE bin-level aggregate with map-side
    combine; totals derive from the 10-row bin frame and broadcast back.
    Smoothed ratios assemble from exact integer counts into one shared
    IEEE tree per bin before the single ln — the psi_drift discipline
    carried to feature engineering."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    buyers = (orders.where(F.col("o_custkey").isNotNull())
              .select("o_custkey").distinct())
    feat = (cust.where(F.col("c_acctbal").isNotNull())
            .join(buyers, buyers.o_custkey == cust.c_custkey, "left")
            .select(F.floor(F.col("c_acctbal") + F.lit(0.5)).cast("long")
                    .alias("x"),
                    F.when(F.col("o_custkey").isNull(), 0).otherwise(1)
                    .alias("y")))
    b = (feat.select(F.expr(_WOE_BIN_SPARK).alias("bin"), "y")
         .groupBy("bin")
         .agg(F.sum("y").cast("long").alias("pos"),
              F.sum(1 - F.col("y")).cast("long").alias("neg")))
    t = b.agg(F.sum("pos").cast("long").alias("pos_all"),
              F.sum("neg").cast("long").alias("neg_all"))
    return (b.crossJoin(F.broadcast(t))
            .select("bin", F.col("pos").alias("n_pos"),
                    F.col("neg").alias("n_neg"),
                    F.expr(f"CAST(floor({_WOE} * 1000 + 0.5) AS BIGINT)")
                    .alias("woe_milli"),
                    F.expr(_WOE_IV).alias("iv_contrib_micro")))


# --------------------------------------------------------------------------
# Label-noise screen: cosine of every embedding to its OWN label
# centroid — the mislabel detector run before training on a labeled
# embedding set (a vector pointing AWAY from its class centroid is a
# labeling-error candidate; SemDeDup's centroid trick turned inward).
# Reuses label_centroid_cosine's exact-integer discipline end to end:
# per-element micro quantization before any sum, centroid means
# re-quantized to micro integers, ONE shared double tree for the
# cosine. The per-vector dot rides the same posexplode scan joined to
# the broadcast (labels x dims) centroid frame; the explode preserves
# row locality, so the vec-keyed aggregate combines fully map-side and
# the shuffle carries one row per vector.
# --------------------------------------------------------------------------
@query(
    "embedding_label_outliers",
    oracle="""
    WITH ex AS (
        SELECT CAST(vec_id AS BIGINT) AS vec_id,
               CAST(label AS BIGINT) AS label,
               CAST(generate_subscripts(embedding, 1) AS BIGINT) AS dim,
               CAST(floor(CAST(unnest(embedding) AS DOUBLE) * 1000000
                          + 0.5) AS BIGINT) AS q
        FROM embeddings
        WHERE embedding IS NOT NULL AND label IS NOT NULL
          AND len(embedding) = 64
          AND len(list_filter(embedding, x -> x IS NULL
                  OR isnan(CAST(x AS DOUBLE))
                  OR abs(CAST(x AS DOUBLE)) > 1000000.0)) = 0
    ), cs AS (
        SELECT label, dim, CAST(SUM(q) AS BIGINT) AS s,
               CAST(count(*) AS BIGINT) AS n
        FROM ex GROUP BY 1, 2
    ), m AS (
        SELECT label, dim,
               CAST(floor(CAST(s AS DOUBLE) / CAST(n AS DOUBLE) + 0.5)
                    AS BIGINT) AS m
        FROM cs
    ), cnorm AS (
        SELECT label, CAST(SUM(m * m) AS BIGINT) AS nn FROM m GROUP BY 1
    ), vec AS (
        SELECT ex.vec_id, ex.label,
               CAST(SUM(ex.q * m.m) AS BIGINT) AS dot,
               CAST(SUM(ex.q * ex.q) AS BIGINT) AS vn
        FROM ex JOIN m ON m.label = ex.label AND m.dim = ex.dim
        GROUP BY 1, 2
    )
    SELECT v.vec_id AS vec_id, v.label AS label,
           CAST(floor((CAST(v.dot AS DOUBLE)
               / sqrt(CAST(v.vn AS DOUBLE) * CAST(c.nn AS DOUBLE)))
               * 1000000 + 0.5) AS BIGINT) AS cos_micro,
           (CAST(v.dot AS DOUBLE)
               / sqrt(CAST(v.vn AS DOUBLE) * CAST(c.nn AS DOUBLE))) < 0.0
               AS is_outlier
    FROM vec v JOIN cnorm c ON c.label = v.label
    WHERE v.vn > 0 AND c.nn > 0
    """,
    doc="Cosine of each embedding to its own label centroid (micro) "
        "with a negative-cosine mislabel flag.",
)
def embedding_label_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zero-norm vectors and zero-norm centroids are excluded (their
    cosine is undefined, not 0) — identically on both engines via the
    integer norm guards."""
    from cliqz_etl_spark.operators.dedup import _materialize

    emb = load_table(spark, sf_dir, "embeddings")
    valid = F.expr(
        "size(filter(embedding, x -> x IS NULL OR isnan(CAST(x AS DOUBLE)) "
        "OR abs(CAST(x AS DOUBLE)) > 1000000.0D)) = 0")
    ex = _materialize(
        emb.where(F.col("embedding").isNotNull()
                  & F.col("label").isNotNull()
                  & (F.size("embedding") == 64) & valid)
        .select(F.col("vec_id").cast("long").alias("vec_id"),
                F.col("label").cast("long").alias("label"),
                F.posexplode("embedding").alias("pos", "x"))
        .select("vec_id", "label",
                (F.col("pos") + 1).cast("long").alias("dim"),
                F.floor(F.col("x").cast("double") * 1_000_000
                        + F.lit(0.5)).cast("long").alias("q")))
    cs = ex.groupBy("label", "dim").agg(
        F.sum("q").cast("long").alias("s"),
        F.count(F.lit(1)).cast("long").alias("n"))
    m = cs.select(
        "label", "dim",
        F.expr("CAST(floor(CAST(s AS DOUBLE) / CAST(n AS DOUBLE) + 0.5) "
               "AS BIGINT)").alias("m"))
    cnorm = m.groupBy("label").agg(
        F.sum(F.col("m") * F.col("m")).cast("long").alias("nn"))
    vec = (ex.join(F.broadcast(m), ["label", "dim"])
           .groupBy("vec_id", "label")
           .agg(F.sum(F.col("q") * F.col("m")).cast("long").alias("dot"),
                F.sum(F.col("q") * F.col("q")).cast("long").alias("vn")))
    cos = ("(CAST(dot AS DOUBLE) / sqrt(CAST(vn AS DOUBLE) "
           "* CAST(nn AS DOUBLE)))")
    return (vec.join(F.broadcast(cnorm), "label")
            .where((F.col("vn") > 0) & (F.col("nn") > 0))
            .select("vec_id", "label",
                    F.expr(f"CAST(floor({cos} * 1000000 + 0.5) AS BIGINT)")
                    .alias("cos_micro"),
                    F.expr(f"{cos} < 0.0").alias("is_outlier")))


# --------------------------------------------------------------------------
# Split-conformal prediction intervals per event type — the
# distribution-free uncertainty wrapper modern ML serving puts around any
# point model. Three leakage-safe slices from ONE hash discipline:
# calibration = the K smallest md5(event_id) per type, selected by
# kmin_hashes' mergeable bounded-state pass (a HARD per-type bound — a
# md5-mod sample would GROW with the corpus and re-sort the world at
# 100 TB; production conformal wants a fixed-size calibration set by
# construction), train/test = the remainder split by hash parity. The
# point model is the train-slice integer-mean (cents, truncated div —
# identical on both engines), nonconformity = |cents - mean|, and
# q_hat = the ceil((1-alpha)(n+1))-th smallest calibration nonconformity
# (alpha = 0.1) — the finite-sample-valid split-conformal quantile. All
# integer arithmetic; per-type frames after the scan are K-bounded.
# --------------------------------------------------------------------------
_CONF_K = 512


@query(
    "conformal_value_intervals",
    oracle=f"""
    WITH base AS (
        SELECT event_type, {md5_long_sql('event_id')} AS h,
               CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents
        FROM events
        WHERE event_type IS NOT NULL AND event_id IS NOT NULL
          AND value IS NOT NULL
    ), calk AS (
        SELECT event_type, h FROM (
            SELECT event_type, h,
                   row_number() OVER (PARTITION BY event_type
                                      ORDER BY h ASC) AS rn
            FROM (SELECT DISTINCT event_type, h FROM base)
        ) WHERE rn <= {_CONF_K}
    ), cal AS (
        SELECT b.* FROM base b
        WHERE EXISTS (SELECT 1 FROM calk k
                      WHERE k.event_type = b.event_type AND k.h = b.h)
    ), rest AS (
        SELECT b.* FROM base b
        WHERE NOT EXISTS (SELECT 1 FROM calk k
                          WHERE k.event_type = b.event_type AND k.h = b.h)
    ), means AS (
        SELECT event_type,
               CAST(SUM(cents) AS BIGINT) // COUNT(*) AS mean_cents
        FROM rest WHERE h % 2 = 0 GROUP BY event_type
    ), caln AS (
        SELECT c.event_type, abs(c.cents - m.mean_cents) AS nc
        FROM cal c JOIN means m USING (event_type)
    ), calstats AS (
        SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_cal
        FROM caln GROUP BY event_type
    ), ranked AS (
        SELECT event_type, nc,
               row_number() OVER (PARTITION BY event_type
                                  ORDER BY nc ASC) AS rn,
               COUNT(*) OVER (PARTITION BY event_type) AS n
        FROM caln
    ), qh AS (
        SELECT event_type, nc AS q_hat FROM ranked
        WHERE rn = (9 * (n + 1) + 9) // 10
    )
    SELECT t.event_type AS event_type, s.n_cal,
           CAST(q.q_hat AS BIGINT) AS q_hat_cents,
           CAST(COUNT(*) AS BIGINT) AS n_test,
           CASE WHEN q.q_hat IS NOT NULL THEN
               CAST((1000000 * SUM(CASE WHEN abs(t.cents - m.mean_cents)
                                             <= q.q_hat
                                        THEN 1 ELSE 0 END))
                    // COUNT(*) AS BIGINT)
           END AS coverage_ppm
    FROM (SELECT * FROM rest WHERE h % 2 = 1) t
    JOIN means m USING (event_type)
    JOIN calstats s USING (event_type)
    LEFT JOIN qh q ON q.event_type = t.event_type
    GROUP BY t.event_type, s.n_cal, q.q_hat
    """,
)
def conformal_value_intervals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-type split-conformal interval half-width (q_hat, cents) and
    its measured test coverage (ppm; the finite-sample guarantee says
    >= 1 - alpha in expectation).

    Plan shape: one scan -> (type, hash, cents) projection; the
    calibration key set is kmin_hashes' Arrow bounded-state pass
    (K x types rows, broadcast back), so membership tests are broadcast
    joins, never a second data shuffle; the train mean and the test
    coverage are ordinary map-side-combined aggregates; every
    calibration-side frame is K-bounded (the quantile sorts <= K values
    inside one array, not a window over data)."""
    from cliqz_etl_spark.functions.hashing import md5_long
    from cliqz_etl_spark.operators.cache import track
    from cliqz_etl_spark.operators.stats import kmin_hashes

    ev = load_table(spark, sf_dir, "events").where(
        F.col("event_type").isNotNull() & F.col("event_id").isNotNull()
        & F.col("value").isNotNull())
    base = ev.select(
        "event_type",
        md5_long(F.col("event_id")).alias("h"),
        F.floor(F.col("value") * 100 + 0.5).cast("long").alias("cents"))
    # persist the K x types key set: four downstream consumers (cal
    # semi, rest anti x2 slices) would otherwise each re-run the Arrow
    # bounded-state pass over the full corpus
    calk = track(kmin_hashes(base.select("event_type", "h"),
                             "event_type", "h", _CONF_K).persist())
    cal = base.join(F.broadcast(calk), ["event_type", "h"], "left_semi")
    rest = base.join(F.broadcast(calk), ["event_type", "h"], "left_anti")
    # persist the per-type means: three consumers (caln's broadcast, the
    # final test join, and qh's plan re-reaching caln) would otherwise
    # each re-run the train-slice corpus aggregate behind it
    means = track(
        rest.where(F.col("h") % 2 == 0)
        .groupBy("event_type")
        .agg(F.expr("sum(cents) div count(1)").alias("mean_cents"))
        .persist())
    caln = (cal.join(F.broadcast(means), "event_type")
            .select("event_type",
                    F.abs(F.col("cents") - F.col("mean_cents")).alias("nc")))
    # per-type quantile over the K-bounded calibration set: collect the
    # <= K nonconformities into one sorted array and index it — no
    # window over anything data-sized
    qh = (caln.groupBy("event_type")
          .agg(F.sort_array(F.collect_list("nc")).alias("ncs"),
               F.count(F.lit(1)).cast("long").alias("n_cal"))
          .select(
              "event_type", "n_cal",
              F.when(
                  F.expr("(9 * (n_cal + 1) + 9) div 10") <= F.col("n_cal"),
                  F.expr("element_at(ncs, CAST((9 * (n_cal + 1) + 9) div 10"
                         " AS INT))")).cast("long").alias("q_hat_cents")))
    test = rest.where(F.col("h") % 2 == 1)
    return (test.join(F.broadcast(means), "event_type")
            .join(F.broadcast(qh), "event_type")
            .groupBy("event_type", "n_cal", "q_hat_cents")
            .agg(F.count(F.lit(1)).cast("long").alias("n_test"),
                 F.sum(F.when(
                     F.abs(F.col("cents") - F.col("mean_cents"))
                     <= F.col("q_hat_cents"), 1).otherwise(0)).alias("__cov"))
            .select("event_type", "n_cal", "q_hat_cents", "n_test",
                    F.when(F.col("q_hat_cents").isNotNull(),
                           F.expr("(1000000 * __cov) div n_test"))
                    .cast("long").alias("coverage_ppm")))

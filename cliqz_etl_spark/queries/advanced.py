"""Advanced relational operators beyond the reference surface (SURVEY.md
§2.8 lists these as absent there): as-of join, range join, pivot/unpivot,
percentiles, correlation, word counts, calendar rollups, distinct counts.
Each extends the engine toward full warehouse-query coverage, oracle-
checked like everything else.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from cliqz_etl_spark.queries import query
from cliqz_etl_spark.tables import load_table

EVENT_TYPES = ["click", "error", "purchase", "signup", "view"]


# --------------------------------------------------------------------------
# As-of join: for each purchase, the user's most recent STRICTLY PRIOR
# click. Implemented as a single pass over a per-user time-ordered window
# (last_value IGNORE NULLS over preceding rows) — the scalable as-of shape:
# one shuffle on user_id, no range self-join.
# --------------------------------------------------------------------------
@query(
    "asof_last_click_before_purchase",
    oracle="""
    WITH ordered AS (
        SELECT user_id, event_id, ts, event_type,
               last_value(CASE WHEN event_type = 'click' THEN event_id END IGNORE NULLS)
                   OVER (PARTITION BY user_id ORDER BY ts ASC, event_id ASC
                         ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS last_click_id,
               last_value(CASE WHEN event_type = 'click' THEN ts END IGNORE NULLS)
                   OVER (PARTITION BY user_id ORDER BY ts ASC, event_id ASC
                         ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS last_click_ts
        FROM events
    )
    SELECT user_id AS user_id, event_id AS purchase_id,
           last_click_id AS last_click_id,
           CAST(date_diff('second', last_click_ts, ts) AS BIGINT) AS gap_sec
    FROM ordered WHERE event_type = 'purchase'
    """,
)
def asof_last_click_before_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.asc("ts"), F.asc("event_id"))
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    click_id = F.when(F.col("event_type") == "click", F.col("event_id"))
    click_ts = F.when(F.col("event_type") == "click", F.col("ts"))
    enriched = ev.select(
        "user_id", "event_id", "ts", "event_type",
        F.last(click_id, ignorenulls=True).over(w).alias("last_click_id"),
        F.last(click_ts, ignorenulls=True).over(w).alias("last_click_ts"),
    )
    return enriched.where(F.col("event_type") == "purchase").select(
        "user_id",
        F.col("event_id").alias("purchase_id"),
        "last_click_id",
        (F.col("ts").cast("long") - F.col("last_click_ts").cast("long"))
        .cast("long").alias("gap_sec"),
    )


# --------------------------------------------------------------------------
# Range join: ordered pairs of same-user events within 5 minutes. The
# equi-key (user_id) bounds the quadratic term to per-user group sizes; at
# scale, add a coarse time-bucket key (ts div 300) and join adjacent
# buckets to bound it further.
# --------------------------------------------------------------------------
@query(
    "range_join_close_events",
    oracle="""
    SELECT a.user_id AS user_id, a.event_id AS id_a, b.event_id AS id_b,
           CAST(date_diff('second', a.ts, b.ts) AS BIGINT) AS gap_sec
    FROM events a JOIN events b
      ON b.user_id = a.user_id
     AND a.event_id < b.event_id
     AND CAST(date_diff('second', a.ts, b.ts) AS BIGINT) BETWEEN -300 AND 300
    """,
)
def range_join_close_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    a = ev.select(F.col("user_id"), F.col("event_id").alias("id_a"), F.col("ts").alias("ts_a"))
    b = ev.select(F.col("user_id"), F.col("event_id").alias("id_b"), F.col("ts").alias("ts_b"))
    gap = (F.col("ts_b").cast("long") - F.col("ts_a").cast("long")).cast("long")
    return (
        a.join(b, "user_id")
        .where((F.col("id_a") < F.col("id_b")) & gap.between(-300, 300))
        .select("user_id", "id_a", "id_b", gap.alias("gap_sec"))
    )


# --------------------------------------------------------------------------
# Pivot / unpivot.
# --------------------------------------------------------------------------
@query(
    "pivot_event_counts",
    oracle="""
    SELECT user_id AS user_id,
           CAST(SUM(CASE WHEN event_type = 'click'    THEN 1 ELSE 0 END) AS BIGINT) AS click,
           CAST(SUM(CASE WHEN event_type = 'error'    THEN 1 ELSE 0 END) AS BIGINT) AS error,
           CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS purchase,
           CAST(SUM(CASE WHEN event_type = 'signup'   THEN 1 ELSE 0 END) AS BIGINT) AS signup,
           CAST(SUM(CASE WHEN event_type = 'view'     THEN 1 ELSE 0 END) AS BIGINT) AS view
    FROM events GROUP BY user_id
    """,
)
def pivot_event_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """groupBy().pivot() with an explicit value list (never let pivot scan
    for distinct values at scale) + fillna for absent cells."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy("user_id")
        .pivot("event_type", EVENT_TYPES)
        .agg(F.count(F.lit(1)))
        .fillna(0, subset=EVENT_TYPES)
    )


@query(
    "unpivot_event_counts",
    oracle="""
    SELECT user_id AS user_id, event_type AS event_type, COUNT(*) AS n
    FROM events GROUP BY 1, 2
    """,
)
def unpivot_event_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """pivot -> unpivot round-trip (melt), dropping the zero cells the
    pivot materialized; equals the plain grouped count."""
    wide = pivot_event_counts(spark, sf_dir)
    return (
        wide.unpivot("user_id", EVENT_TYPES, "event_type", "n")
        .where(F.col("n") > 0)
    )


# --------------------------------------------------------------------------
# Percentiles & correlation.
# --------------------------------------------------------------------------
@query(
    "value_percentiles_by_type",
    oracle="""
    SELECT event_type AS event_type,
           CAST(floor(quantile_cont(value, 0.5) * 10000 + 0.5) AS BIGINT) AS p50_x10k,
           CAST(floor(quantile_cont(value, 0.9) * 10000 + 0.5) AS BIGINT) AS p90_x10k,
           CAST(floor(quantile_cont(value, 0.99) * 10000 + 0.5) AS BIGINT) AS p99_x10k
    FROM events GROUP BY event_type
    """,
)
def value_percentiles_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact linear-interpolation percentiles (Spark `percentile` and
    DuckDB `quantile_cont` share the definition)."""
    ev = load_table(spark, sf_dir, "events")

    def pct(p: float, name: str):
        return F.floor(F.expr(f"percentile(value, {p})") * 10000 + 0.5).cast("long").alias(name)

    return ev.groupBy("event_type").agg(
        pct(0.5, "p50_x10k"), pct(0.9, "p90_x10k"), pct(0.99, "p99_x10k")
    )


@query(
    "price_quantity_corr",
    oracle="""
    SELECT l_returnflag AS l_returnflag,
           ROUND(corr(l_quantity, l_extendedprice), 3) AS qty_price_corr
    FROM lineitem GROUP BY l_returnflag
    """,
)
def price_quantity_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(F.corr("l_quantity", "l_extendedprice"), 3).alias("qty_price_corr")
    )


# --------------------------------------------------------------------------
# Explode / flatten (L3) — the canonical word count.
# --------------------------------------------------------------------------
@query(
    "word_counts",
    oracle="""
    SELECT w AS word, COUNT(*) AS n
    FROM (SELECT unnest(string_split_regex(trim(text), '\\s+')) AS w FROM documents)
    GROUP BY w HAVING COUNT(*) >= 50
    """,
)
def word_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    from cliqz_etl_spark.functions.text import tokens

    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.select(F.explode(tokens("text")).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("n"))
        .where(F.col("n") >= 50)
    )


# --------------------------------------------------------------------------
# Calendar rollup + distinct counts.
# --------------------------------------------------------------------------
@query(
    "monthly_revenue",
    oracle="""
    SELECT strftime(date_trunc('month', o_orderdate), '%Y-%m') AS month,
           ROUND(SUM(o_totalprice), 2) AS revenue,
           COUNT(DISTINCT o_custkey) AS n_customers
    FROM orders GROUP BY 1
    """,
)
def monthly_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.groupBy(F.date_format(F.date_trunc("month", "o_orderdate"), "yyyy-MM").alias("month"))
        .agg(
            F.round(F.sum("o_totalprice"), 2).alias("revenue"),
            F.countDistinct("o_custkey").alias("n_customers"),
        )
    )


@query(
    "approx_distinct_users",
    oracle=None,  # HLL sketches are engine-specific; rows-only check
)
def approx_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """approx_count_distinct (HyperLogLog++) per event type — the sketch
    path for 100 TB cardinalities. No cross-engine oracle (sketch estimates
    differ by implementation); the exact twin is `monthly_revenue`'s
    countDistinct and this query's own exact column for eyeballing."""
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.approx_count_distinct("user_id", 0.01).alias("approx_users"),
        F.countDistinct("user_id").alias("exact_users"),
    )

"""Advanced relational operators beyond the reference surface (SURVEY.md
§2.8 lists these as absent there): as-of join, range join, pivot/unpivot,
percentiles, correlation, word counts, calendar rollups, distinct counts.
Each extends the engine toward full warehouse-query coverage, oracle-
checked like everything else.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from cliqz_etl_spark.functions.hashing import md5_long_sql
from cliqz_etl_spark.queries import query
from cliqz_etl_spark.tables import load_table

EVENT_TYPES = ["click", "error", "purchase", "signup", "view"]


# --------------------------------------------------------------------------
# As-of join: for each purchase, the user's most recent STRICTLY PRIOR
# click. Implemented as a single pass over a per-user time-ordered window
# (last_value IGNORE NULLS over preceding rows) — the scalable as-of shape:
# one shuffle on user_id, no range self-join. NULL-timestamp events are
# excluded up front: an undated event cannot be ordered "before" anything,
# and leaving it in puts the row wherever each engine's NULL sort order
# says (Spark first, DuckDB last — a real divergence the event fuzz
# caught: a NULL-ts click became every purchase's "prior" click on the
# Spark side only).
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
        FROM events WHERE ts IS NOT NULL
    )
    SELECT user_id AS user_id, event_id AS purchase_id,
           last_click_id AS last_click_id,
           CAST(date_diff('second', last_click_ts, ts) AS BIGINT) AS gap_sec
    FROM ordered WHERE event_type = 'purchase'
    """,
)
def asof_last_click_before_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").where(F.col("ts").isNotNull())
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
# Range join: ordered pairs of same-user events within 5 minutes. The join
# key is (user_id, coarse 300 s time bucket): side A probes its own bucket
# plus both neighbors (any |gap| <= 300 s pair differs by at most one
# bucket), so the pair set is bounded per (user, 10-minute window) instead
# of per user — a power user with a year of events no longer goes quadratic.
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
    bucket = F.floor(F.col("ts").cast("long") / 300)
    # A emits 3 probe rows (bucket-1, bucket, bucket+1); B keeps its single
    # bucket, so each qualifying (a, b) pair meets on exactly one key value.
    a = ev.select(
        F.col("user_id"), F.col("event_id").alias("id_a"), F.col("ts").alias("ts_a"),
        F.explode(F.array(bucket - 1, bucket, bucket + 1)).alias("bkt"),
    )
    b = ev.select(
        F.col("user_id"), F.col("event_id").alias("id_b"), F.col("ts").alias("ts_b"),
        bucket.alias("bkt"),
    )
    gap = (F.col("ts_b").cast("long") - F.col("ts_a").cast("long")).cast("long")
    return (
        a.join(b, ["user_id", "bkt"])
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
    oracle=f"""
    SELECT user_id AS user_id, event_type AS event_type, COUNT(*) AS n
    FROM events
    WHERE event_type IN ({", ".join(f"'{t}'" for t in EVENT_TYPES)})
    GROUP BY 1, 2
    """,
)
def unpivot_event_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """pivot -> unpivot round-trip (melt), dropping the zero cells the
    pivot materialized; equals the grouped count RESTRICTED to the
    pivot's declared type list — a NULL or novel event_type can never
    round-trip through the fixed pivot columns, so the oracle filters to
    the same declared schema (fuzz-pinned)."""
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
    WITH q AS (
        SELECT l_returnflag,
               CAST(floor(l_quantity * 100 + 0.5) AS BIGINT)      AS qc,
               CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) AS pc
        FROM lineitem
    ), m AS (
        SELECT l_returnflag,
               COUNT(*)     AS n,
               SUM(qc)      AS sx,  SUM(pc)      AS sy,
               SUM(qc * qc) AS sxx, SUM(pc * pc) AS syy,
               SUM(qc * pc) AS sxy
        FROM q GROUP BY l_returnflag
    )
    SELECT l_returnflag AS l_returnflag,
           CAST(floor(
               (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
               / (sqrt(CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                  * sqrt(CAST(n AS DOUBLE) * CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)))
               * 10000 + 0.5) AS BIGINT) AS corr_x10k
    FROM m
    """,
)
def price_quantity_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pearson corr from exact integer moment sums, not F.corr: a grouped
    double `corr` is partial-agg order dependent, so round(corr, 3) flipped
    a rounding boundary between Spark and DuckDB (the one red row in
    CORRECTNESS_r01). Quantize both inputs to cents, aggregate the six
    moments as decimal(38,0) (exact, matching DuckDB's HUGEINT bigint-sum),
    then derive corr in one fixed-order IEEE double expression shared
    verbatim with the oracle — deterministic regardless of partitioning."""
    li = load_table(spark, sf_dir, "lineitem")
    qc = F.floor(F.col("l_quantity") * 100 + 0.5).cast("long")
    pc = F.floor(F.col("l_extendedprice") * 100 + 0.5).cast("long")
    staged = li.select(
        "l_returnflag", qc.alias("qc"), pc.alias("pc"),
        (qc * qc).alias("qq"), (pc * pc).alias("pp"), (qc * pc).alias("qp"),
    )
    dec = lambda c: F.sum(F.col(c).cast("decimal(38,0)"))  # noqa: E731
    m = staged.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"),
        dec("qc").alias("sx"), dec("pc").alias("sy"),
        dec("qq").alias("sxx"), dec("pp").alias("syy"), dec("qp").alias("sxy"),
    )
    n, sx, sy = [F.col(c).cast("double") for c in ("n", "sx", "sy")]
    sxx, syy, sxy = [F.col(c).cast("double") for c in ("sxx", "syy", "sxy")]
    corr = (n * sxy - sx * sy) / (F.sqrt(n * sxx - sx * sx) * F.sqrt(n * syy - sy * sy))
    return m.select(
        "l_returnflag",
        F.floor(corr * 10000 + 0.5).cast("long").alias("corr_x10k"),
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
           CAST(SUM(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT) AS revenue_cents,
           COUNT(DISTINCT o_custkey) AS n_customers
    FROM orders GROUP BY 1
    """,
)
def monthly_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.groupBy(F.date_format(F.date_trunc("month", "o_orderdate"), "yyyy-MM").alias("month"))
        .agg(
            F.sum(F.floor(F.col("o_totalprice") * 100 + 0.5).cast("long"))
            .cast("long").alias("revenue_cents"),
            F.countDistinct("o_custkey").alias("n_customers"),
        )
    )


@query(
    "approx_distinct_users",
    # HLL sketch values are engine-specific, so the raw estimate cannot be
    # hash-compared — but its ERROR BOUND can: the query emits the exact
    # count plus a within-5%-of-exact flag computed from its own estimate,
    # and the oracle asserts that flag literally TRUE next to DuckDB's
    # exact count. A sketch drifting past the bound flips the flag and
    # fails the value-hash, making the last rows-only registry row a full
    # three-check gate entry. (Bound: rsd=0.01 -> ~1% typical HLL++ error,
    # and at these group cardinalities the sparse encoding is exact; 5%
    # is a deliberate margin over both.)
    oracle="""
    SELECT event_type AS event_type,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS exact_users,
           TRUE AS approx_within_5pct
    FROM events GROUP BY 1
    """,
)
def approx_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """approx_count_distinct (HyperLogLog++) per event type — the sketch
    path for 100 TB cardinalities — checked against the exact distinct
    count via a relative-error bound the oracle can express in SQL."""
    ev = load_table(spark, sf_dir, "events")
    per_type = ev.groupBy("event_type").agg(
        F.approx_count_distinct("user_id", 0.01).alias("approx_users"),
        F.countDistinct("user_id").alias("exact_users"),
    )
    return per_type.select(
        "event_type",
        "exact_users",
        (F.abs(F.col("approx_users") - F.col("exact_users"))
         <= 0.05 * F.col("exact_users")).alias("approx_within_5pct"),
    )


# --------------------------------------------------------------------------
# Multi-way join shapes (TPC-H Q3/Q7/Q16 analogs) — exercise Catalyst join
# reordering, two-sided dimension filters, and HAVING over distinct counts.
# --------------------------------------------------------------------------
@query(
    "shipping_priority",
    oracle="""
    SELECT l.l_orderkey AS l_orderkey,
           CAST(SUM(CAST(floor(l.l_extendedprice * (1 - l.l_discount) * 100 + 0.5) AS BIGINT)) AS BIGINT)
               AS revenue_cents,
           strftime(o.o_orderdate, '%Y-%m-%d') AS o_orderdate,
           o.o_orderpriority AS o_orderpriority
    FROM customer c
    JOIN orders o   ON o.o_custkey = c.c_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE c.c_mktsegment = 'BUILDING'
      AND o.o_orderdate < TIMESTAMP '1998-03-15'
      AND l.l_shipdate  > TIMESTAMP '1998-03-15'
    GROUP BY 1, 3, 4
    """,
)
def shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape: selective dim filter -> fact-fact join -> grouped
    revenue. The customer filter prunes before orders ever joins lineitem."""
    c = load_table(spark, sf_dir, "customer").where(F.col("c_mktsegment") == "BUILDING")
    o = load_table(spark, sf_dir, "orders").where(
        F.col("o_orderdate") < F.lit("1998-03-15").cast("timestamp"))
    li = load_table(spark, sf_dir, "lineitem").where(
        F.col("l_shipdate") > F.lit("1998-03-15").cast("timestamp"))
    return (
        c.join(o, o.o_custkey == c.c_custkey)
        .join(li, li.l_orderkey == o.o_orderkey)
        .groupBy(
            "l_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("o_orderdate"),
            "o_orderpriority",
        )
        .agg(F.sum(F.floor(F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100 + 0.5)
                   .cast("long")).cast("long").alias("revenue_cents"))
        .select("l_orderkey", "revenue_cents", "o_orderdate", "o_orderpriority")
    )


@query(
    "nation_trade_volume",
    oracle="""
    SELECT cn.n_name AS cust_nation, sn.n_name AS supp_nation,
           CAST(SUM(CAST(floor(l.l_extendedprice * (1 - l.l_discount) * 100 + 0.5) AS BIGINT)) AS BIGINT)
               AS volume_cents,
           COUNT(*) AS n_lines
    FROM lineitem l
    JOIN orders o    ON o.o_orderkey = l.l_orderkey
    JOIN customer c  ON c.c_custkey = o.o_custkey
    JOIN supplier s  ON s.s_suppkey = l.l_suppkey
    JOIN nation cn   ON cn.n_nationkey = c.c_nationkey
    JOIN nation sn   ON sn.n_nationkey = s.s_nationkey
    WHERE cn.n_name <> sn.n_name
    GROUP BY 1, 2
    """,
)
def nation_trade_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape: the same dimension (nation) joined twice under
    different roles, cross-nation filter, six-table plan. Revenue is
    summed as per-row-quantized integer cents: a grouped double sum here
    landed exactly on a .xx5 boundary where Spark's and DuckDB's round()
    disagree — integer aggregation is order- and engine-independent."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    s = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    cn = F.broadcast(nation.select(F.col("n_nationkey").alias("cn_key"),
                                   F.col("n_name").alias("cust_nation")))
    sn = F.broadcast(nation.select(F.col("n_nationkey").alias("sn_key"),
                                   F.col("n_name").alias("supp_nation")))
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, c.c_custkey == o.o_custkey)
        .join(F.broadcast(s), s.s_suppkey == li.l_suppkey)
        .join(cn, F.col("cn_key") == c.c_nationkey)
        .join(sn, F.col("sn_key") == s.s_nationkey)
        .where(F.col("cust_nation") != F.col("supp_nation"))
        .groupBy("cust_nation", "supp_nation")
        .agg(
            F.sum(
                F.floor(F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100 + 0.5)
                .cast("long")
            ).cast("long").alias("volume_cents"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


@query(
    "parts_supplier_stats",
    oracle="""
    SELECT p.p_brand AS p_brand, p.p_type AS p_type,
           COUNT(DISTINCT l.l_suppkey) AS supplier_cnt
    FROM part p JOIN lineitem l ON l.l_partkey = p.p_partkey
    WHERE p.p_size >= 20
    GROUP BY 1, 2
    HAVING COUNT(DISTINCT l.l_suppkey) >= 5
    """,
)
def parts_supplier_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape: distinct-count aggregate + HAVING filter."""
    p = load_table(spark, sf_dir, "part").where(F.col("p_size") >= 20)
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .groupBy("p_brand", "p_type")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
        .where(F.col("supplier_cnt") >= 5)
    )


@query(
    "above_avg_balance_customers",
    oracle="""
    SELECT c.c_custkey AS c_custkey, ROUND(c.c_acctbal, 2) AS c_acctbal
    FROM customer c
    WHERE c.c_acctbal > (SELECT AVG(c2.c_acctbal) FROM customer c2
                         WHERE c2.c_nationkey = c.c_nationkey)
    """,
)
def above_avg_balance_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated scalar subquery (TPC-H Q17/Q22 shape), decorrelated into
    an aggregate + join — the form Catalyst plans without a per-row
    subquery execution."""
    c = load_table(spark, sf_dir, "customer")
    nation_avg = c.groupBy("c_nationkey").agg(F.avg("c_acctbal").alias("nation_avg"))
    return (
        c.join(F.broadcast(nation_avg), "c_nationkey")
        .where(F.col("c_acctbal") > F.col("nation_avg"))
        .select("c_custkey", F.round("c_acctbal", 2).alias("c_acctbal"))
    )


@query(
    "nations_in_region",
    oracle="""
    SELECT r.r_name AS r_name,
           -- COALESCE matches Spark: collect_list skips NULL names, and
           -- array_join of the resulting EMPTY list is '', never NULL
           COALESCE(string_agg(n.n_name, ',' ORDER BY n.n_name), '') AS nations,
           COUNT(*) AS n_nations
    FROM region r JOIN nation n ON n.n_regionkey = r.r_regionkey
    GROUP BY r.r_name
    """,
)
def nations_in_region(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered string aggregation (collect_list -> array_sort -> join):
    list-valued aggregation emitted as a deterministic scalar."""
    region = load_table(spark, sf_dir, "region")
    nation = load_table(spark, sf_dir, "nation")
    return (
        region.join(nation, nation.n_regionkey == region.r_regionkey)
        .groupBy("r_name")
        .agg(
            F.array_join(F.array_sort(F.collect_list("n_name")), ",").alias("nations"),
            F.count(F.lit(1)).alias("n_nations"),
        )
    )


# --------------------------------------------------------------------------
# One-pass column profiling (the Deequ/dbt-docs table-profile shape): every
# column's null count, distinct count, and min/max from ONE scan. Values
# are canonicalized to strings first — integers verbatim, timestamps via
# the engine-portable second-grain format, money as integer cents — so a
# single (col_name, val) spine covers heterogeneous types and min/max
# compare under binary collation identically on both engines (documented:
# lexicographic, not numeric, for the numeric columns). stack() multiplies
# the scan 6x, but the groupBy partial-aggregates per (col_name, val)
# map-side, so the shuffle carries distinct values per column — the same
# cost as the COUNT(DISTINCT) expansion every profiler pays.
# --------------------------------------------------------------------------
_PROFILE_COLS: list[tuple[str, str]] = [
    ("o_orderkey", "CAST(o_orderkey AS STRING)"),
    ("o_custkey", "CAST(o_custkey AS STRING)"),
    ("o_orderstatus", "o_orderstatus"),
    ("o_orderpriority", "o_orderpriority"),
    ("o_orderdate", "date_format(o_orderdate, 'yyyy-MM-dd HH:mm:ss')"),
    ("o_totalprice_cents",
     "CAST(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS STRING)"),
]

_PROFILE_ORACLE_EXPRS: dict[str, str] = {
    "o_orderkey": "CAST(o_orderkey AS VARCHAR)",
    "o_custkey": "CAST(o_custkey AS VARCHAR)",
    "o_orderstatus": "o_orderstatus",
    "o_orderpriority": "o_orderpriority",
    "o_orderdate": "strftime(o_orderdate, '%Y-%m-%d %H:%M:%S')",
    "o_totalprice_cents":
        "CAST(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS VARCHAR)",
}


@query(
    "column_profile_report",
    oracle="""
    WITH vals AS (
        """ + "\n        UNION ALL\n        ".join(
        f"SELECT '{name}' AS col_name, {expr} AS val FROM orders"
        for name, expr in _PROFILE_ORACLE_EXPRS.items()) + """
    )
    SELECT col_name AS col_name,
           CAST(COUNT(*) AS BIGINT)              AS n_rows,
           CAST(COUNT(*) - COUNT(val) AS BIGINT) AS n_null,
           CAST(COUNT(DISTINCT val) AS BIGINT)   AS n_distinct,
           TRUE AS approx_within_5pct,
           MIN(val) AS min_val,
           MAX(val) AS max_val
    FROM vals GROUP BY col_name
    """,
)
def column_profile_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-column profile of orders — n_rows, n_null, n_distinct, min/max
    — in one scan via stack(); the ingestion-time data-profiling pass.

    Plan: scan -> Generate(stack) -> two-phase hash aggregate. The exact
    distinct count rides a partial aggregate keyed (col_name, val), so
    every executor pre-collapses its repeats before the one shuffle —
    BUT for a unique column (o_orderkey here) that partial collapses
    nothing, so the shuffle is row-count-sized. A 100 TB profiler should
    therefore read the HLL++ tier: approx_count_distinct keeps per-column
    state at sketch size (~KB) regardless of cardinality. Both tiers run
    side by side; the exact column is the oracle-checked one, and the
    sketch is pinned by `approx_within_5pct` (the `approx_distinct_users`
    pattern — the oracle asserts the flag literally TRUE, so sketch drift
    past the bound fails the value-hash). No UDFs, no collects.

    Aggregation is the EXPLICIT two-level form — groupBy (col, val) with
    a row count, then groupBy col — rather than countDistinct +
    approx_count_distinct in one agg: mixing them makes Catalyst's
    partial-distinct rewrite carry an HLL buffer PER (col, val) GROUP
    (measured 13x slower at sf0.01 — ~90k sketch allocations). HLL is
    duplicate-insensitive, so sketching the already-distinct stream gives
    the identical estimate with exactly 6 sketches, and the shuffle
    budget stays at the exact shape's 2."""
    orders = load_table(spark, sf_dir, "orders")
    n = len(_PROFILE_COLS)
    stack_args = ", ".join(f"'{name}', {expr}" for name, expr in _PROFILE_COLS)
    stacked = orders.selectExpr(f"stack({n}, {stack_args}) AS (col_name, val)")
    per_val = stacked.groupBy("col_name", "val").agg(
        F.count(F.lit(1)).alias("cnt"))
    return per_val.groupBy("col_name").agg(
        F.sum("cnt").cast("long").alias("n_rows"),
        F.sum(F.when(F.col("val").isNull(), F.col("cnt")).otherwise(F.lit(0)))
        .cast("long").alias("n_null"),
        F.count("val").cast("long").alias("n_distinct"),
        F.approx_count_distinct("val", 0.01).alias("_approx"),
        F.min("val").alias("min_val"),
        F.max("val").alias("max_val"),
    ).select(
        "col_name", "n_rows", "n_null", "n_distinct",
        (F.abs(F.col("_approx") - F.col("n_distinct"))
         <= 0.05 * F.col("n_distinct")).alias("approx_within_5pct"),
        "min_val", "max_val",
    )


@query(
    "data_quality_checks",
    oracle="""
    SELECT 'lineitem_orphans' AS check_name,
           (SELECT COUNT(*) FROM lineitem l
            WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey)) AS n_violations
    UNION ALL
    SELECT 'order_orphans',
           (SELECT COUNT(*) FROM orders o
            WHERE NOT EXISTS (SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey))
    UNION ALL
    SELECT 'customer_bad_nation',
           (SELECT COUNT(*) FROM customer c
            WHERE NOT EXISTS (SELECT 1 FROM nation n WHERE n.n_nationkey = c.c_nationkey))
    UNION ALL
    SELECT 'lineitem_null_keys',
           (SELECT COUNT(*) FROM lineitem
            WHERE l_orderkey IS NULL OR l_partkey IS NULL OR l_suppkey IS NULL)
    UNION ALL
    SELECT 'duplicate_order_lines',
           (SELECT COUNT(*) FROM (
               SELECT l_orderkey, l_linenumber FROM lineitem
               GROUP BY 1, 2 HAVING COUNT(*) > 1))
    UNION ALL
    SELECT 'negative_prices',
           (SELECT COUNT(*) FROM lineitem WHERE l_extendedprice < 0 OR l_quantity <= 0)
    """,
)
def data_quality_checks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Constraint validation at warehouse scale: referential integrity via
    broadcast anti-joins, null-key and domain checks, uniqueness — one
    (check_name, n_violations) row each. The shape every ingestion gate
    needs; each check is a scan + anti-join/aggregate, no collects."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")

    def one(name: str, violations: DataFrame) -> DataFrame:
        return violations.agg(F.count(F.lit(1)).alias("n_violations")) \
            .select(F.lit(name).alias("check_name"), "n_violations")

    checks = [
        one("lineitem_orphans",
            li.join(orders, li.l_orderkey == orders.o_orderkey, "left_anti")),
        one("order_orphans",
            orders.join(cust, orders.o_custkey == cust.c_custkey, "left_anti")),
        one("customer_bad_nation",
            cust.join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey, "left_anti")),
        one("lineitem_null_keys",
            li.where(F.col("l_orderkey").isNull() | F.col("l_partkey").isNull()
                     | F.col("l_suppkey").isNull())),
        one("duplicate_order_lines",
            li.groupBy("l_orderkey", "l_linenumber").agg(F.count(F.lit(1)).alias("c"))
            .where(F.col("c") > 1)),
        one("negative_prices",
            li.where((F.col("l_extendedprice") < 0) | (F.col("l_quantity") <= 0))),
    ]
    out = checks[0]
    for c in checks[1:]:
        out = out.unionByName(c)
    return out


@query(
    "fuzzy_match_parts",
    oracle="""
    WITH reps AS (
        SELECT p_name AS name, CAST(min(p_partkey) AS BIGINT) AS rep
        FROM part GROUP BY p_name
    )
    SELECT a.name AS name_a, b.name AS name_b,
           a.rep AS rep_a, b.rep AS rep_b,
           CAST(levenshtein(a.name, b.name) AS BIGINT) AS dist
    FROM reps a JOIN reps b
      ON split_part(a.name, ' ', 1) = split_part(b.name, ' ', 1)
     AND a.name < b.name
    WHERE levenshtein(a.name, b.name) BETWEEN 1 AND 3
    """,
)
def fuzzy_match_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Record linkage on part names: distinct-name collapse, first-token
    blocking, levenshtein <= 3 inside blocks. The join is a block-key
    equi-join — |distinct names|^2 work only WITHIN a block, never across
    the corpus — which is the shape that scales to billions of rows
    (reference has no fuzzy matching; north-star linkage extension)."""
    from cliqz_etl_spark.operators.relational import blocked_fuzzy_pairs

    part = load_table(spark, sf_dir, "part")
    return blocked_fuzzy_pairs(
        part, "p_partkey", "p_name",
        block=lambda c: F.substring_index(c, " ", 1),
        min_dist=1, max_dist=3)


# --------------------------------------------------------------------------
# PageRank over the part<->supplier bipartite graph (who supplies what,
# from lineitem). The engine's second iterative algorithm after
# connected components — fixed-iteration, integer-exact (floor-division
# recurrence, every quantity BIGINT), so the DuckDB oracle replays the
# identical three iterations CTE-by-CTE and the result hash-matches
# bit-for-bit. Per-iteration plan: one join of the persisted
# degree-annotated edges with the rank frame, one partial-agg groupBy,
# one left join re-seeding no-inbound nodes; lineage is truncated
# periodically (operators/graph.py::pagerank) so deep iteration counts
# plan in constant space.
# --------------------------------------------------------------------------
PR_ITER = 3
PR_SCALE = 1_000_000
_PR_BASE = (PR_SCALE * 15) // 100


def _pagerank_cte(n_iter: int) -> str:
    parts = [f"""
    WITH raw AS (
        SELECT DISTINCT l_partkey * 2 AS p, l_suppkey * 2 + 1 AS s
        FROM lineitem
        WHERE l_partkey IS NOT NULL AND l_suppkey IS NOT NULL
    ), e AS (
        SELECT p AS src, s AS dst FROM raw
        UNION SELECT s AS src, p AS dst FROM raw
    ), deg AS (
        SELECT src, COUNT(*) AS d FROM e GROUP BY 1
    ), nodes AS (
        SELECT DISTINCT src AS node FROM e
    ), r0 AS (
        SELECT node, CAST({PR_SCALE} AS BIGINT) AS rank FROM nodes
    )"""]
    for i in range(1, n_iter + 1):
        parts.append(f"""
    , c{i} AS (
        SELECT e.dst AS node, SUM(r{i - 1}.rank // deg.d) AS s
        FROM e JOIN r{i - 1} ON r{i - 1}.node = e.src
        JOIN deg ON deg.src = e.src
        GROUP BY 1
    ), r{i} AS (
        SELECT n.node,
               CAST({_PR_BASE} + (85 * COALESCE(c{i}.s, 0)) // 100 AS BIGINT) AS rank
        FROM nodes n LEFT JOIN c{i} ON c{i}.node = n.node
    )""")
    return "".join(parts)


@query(
    "supplier_part_pagerank",
    oracle=_pagerank_cte(PR_ITER) + f"""
    SELECT node AS node, rank AS rank FROM r{PR_ITER}
    """,
    doc=f"Integer-exact {PR_ITER}-iteration PageRank over the "
        "part<->supplier graph, oracle replays each iteration.",
)
def supplier_part_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bipartite node ids: part -> 2k, supplier -> 2k+1 (disjoint BIGINT
    namespaces); both edge directions, NULL keys dropped at the scan."""
    from cliqz_etl_spark.operators.graph import pagerank

    li = load_table(spark, sf_dir, "lineitem").where(
        F.col("l_partkey").isNotNull() & F.col("l_suppkey").isNotNull())
    raw = li.select((F.col("l_partkey") * 2).alias("p"),
                    (F.col("l_suppkey") * 2 + 1).alias("s")).distinct()
    edges = (raw.select(F.col("p").alias("src"), F.col("s").alias("dst"))
             .union(raw.select(F.col("s").alias("src"), F.col("p").alias("dst"))))
    # edges are distinct by construction: raw is distinct and the two
    # union legs live in disjoint key namespaces (even part ids vs odd
    # supplier ids), so the operator's defensive distinct would re-pay a
    # full edge shuffle for nothing
    return pagerank(edges, PR_ITER, scale=PR_SCALE,
                    assume_distinct=True).select("node", "rank")


# --------------------------------------------------------------------------
# VARIANT (Spark 4's semi-structured type): each event row is serialized
# to JSON, parsed into a variant value (binary-encoded, shredded access),
# and the typed fields are extracted back out — a full encode->decode
# round-trip over real varied data, aggregated so the oracle (which
# never sees the variant, only the original columns) must match exactly.
# At 100 TB this is the ingest pattern for schema-on-read event lakes:
# keep the raw payload as ONE variant column (cheaper than exploding to
# wide NULL-heavy schemas), extract typed paths at query time with
# try_variant_get, and let shredding/pushdown handle the scan cost.
# --------------------------------------------------------------------------
@query(
    "variant_roundtrip_stats",
    oracle="""
    SELECT event_type AS event_type,
           COUNT(*) AS n_events,
           COUNT(DISTINCT user_id) AS n_users,
           CAST(SUM(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT) AS total_cents
    FROM events
    GROUP BY 1
    """,
)
def variant_roundtrip_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON-encode (to_json drops NULL fields), parse_json to VARIANT,
    extract typed paths with try_variant_get (absent path -> NULL — which
    is exactly what the dropped NULL fields must come back as), then roll
    up. Any encode/decode/extract defect diverges from the plain-column
    oracle."""
    ev = load_table(spark, sf_dir, "events")
    v = ev.select(F.parse_json(
        F.to_json(F.struct("user_id", "event_type", "value"))).alias("v"))
    back = v.select(
        F.try_variant_get("v", "$.user_id", "long").alias("user_id"),
        F.try_variant_get("v", "$.event_type", "string").alias("event_type"),
        F.try_variant_get("v", "$.value", "double").alias("value"),
    )
    return (
        back.groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n_events"),
             F.countDistinct("user_id").alias("n_users"),
             F.sum(F.floor(F.col("value") * 100 + 0.5).cast("long"))
             .cast("long").alias("total_cents"))
    )


# --------------------------------------------------------------------------
# Fellegi-Sunter probabilistic record linkage (the 1969 model behind
# Splink / every census-style linker): candidate pairs from a blocking
# key, a per-field agreement vector gamma, and a match score = sum of
# per-field log-likelihood weights ln(m/u) / ln((1-m)/(1-u)). m (P[agree
# | same entity]) is a fixed per-field prior; u (P[agree | random pair])
# is ESTIMATED FROM THE DATA as sum_v freqA(v)*freqB(v) / (NA*NB) — the
# standard value-frequency estimate, computed here with exact integer
# sums so both engines feed ln() the identical double. Weights are
# quantized to milli-units per field (the dsir_importance_weights
# discipline) BEFORE the per-pair sum, so scores are integer-exact. The
# output is the FS contingency table itself: one row per gamma pattern
# with its pair count and score — the tiny, stable artifact an EM
# refinement step would consume.
# --------------------------------------------------------------------------
_FS_M = ((19, 20), (9, 10), (4, 5))  # per-field m priors as exact rationals


def _fs_w(mnum: int, mden: int, un: str, d: str) -> tuple[str, str]:
    """(agree, disagree) milli-weight SQL for one field — identical text
    for Spark and DuckDB (floor/ln/CAST AS DOUBLE shared grammar).
    Laplace smoothing (un+1)/(d+2) keeps both ln arguments finite even
    when the field is constant (u=1) or never agrees (u=0)."""
    agree = (f"CAST(floor(1000 * ln(CAST({mnum} * ({d} + 2) AS DOUBLE)"
             f" / CAST({mden} * ({un} + 1) AS DOUBLE)) + 0.5) AS BIGINT)")
    disagree = (f"CAST(floor(1000 * ln(CAST({mden - mnum} * ({d} + 2) AS DOUBLE)"
                f" / CAST({mden} * ({d} + 1 - {un}) AS DOUBLE)) + 0.5) AS BIGINT)")
    return agree, disagree


def _fs_score_sql() -> str:
    terms = []
    for i, (mnum, mden) in enumerate(_FS_M, start=1):
        a, dis = _fs_w(mnum, mden, f"un{i}", "d")
        terms.append(f"(CASE WHEN g{i} = 1 THEN {a} ELSE {dis} END)")
    return " + ".join(terms)


@query(
    "record_linkage_fs",
    oracle=f"""
    WITH a AS (
        SELECT c_nationkey AS blk,
               CAST(floor(c_acctbal / 100) AS BIGINT) AS f1,
               CAST(c_acctbal >= 0 AS BIGINT) AS f2,
               right(trim(c_name), 1) AS f3
        FROM customer WHERE c_nationkey IS NOT NULL
    ), b AS (
        SELECT s_nationkey AS blk,
               CAST(floor(s_acctbal / 100) AS BIGINT) AS f1,
               CAST(s_acctbal >= 0 AS BIGINT) AS f2,
               right(trim(s_name), 1) AS f3
        FROM supplier WHERE s_nationkey IS NOT NULL
    ), n AS (
        SELECT (SELECT count(*) FROM a) * (SELECT count(*) FROM b) AS d,
               COALESCE((SELECT sum(na * nb) FROM
                   (SELECT f1, count(*) AS na FROM a WHERE f1 IS NOT NULL GROUP BY f1) fa
                   JOIN (SELECT f1, count(*) AS nb FROM b WHERE f1 IS NOT NULL GROUP BY f1) fb
                   USING (f1)), 0) AS un1,
               COALESCE((SELECT sum(na * nb) FROM
                   (SELECT f2, count(*) AS na FROM a WHERE f2 IS NOT NULL GROUP BY f2) fa
                   JOIN (SELECT f2, count(*) AS nb FROM b WHERE f2 IS NOT NULL GROUP BY f2) fb
                   USING (f2)), 0) AS un2,
               COALESCE((SELECT sum(na * nb) FROM
                   (SELECT f3, count(*) AS na FROM a WHERE f3 IS NOT NULL GROUP BY f3) fa
                   JOIN (SELECT f3, count(*) AS nb FROM b WHERE f3 IS NOT NULL GROUP BY f3) fb
                   USING (f3)), 0) AS un3
    ), pairs AS (
        SELECT CAST(a.f1 IS NOT NULL AND b.f1 IS NOT NULL AND a.f1 = b.f1 AS BIGINT) AS g1,
               CAST(a.f2 IS NOT NULL AND b.f2 IS NOT NULL AND a.f2 = b.f2 AS BIGINT) AS g2,
               CAST(a.f3 IS NOT NULL AND b.f3 IS NOT NULL AND a.f3 = b.f3 AS BIGINT) AS g3
        FROM a JOIN b ON a.blk = b.blk
    )
    SELECT g1 * 4 + g2 * 2 + g3 AS pattern,
           CAST(count(*) AS BIGINT) AS n_pairs,
           CAST({_fs_score_sql()} AS BIGINT) AS score_milli
    FROM pairs CROSS JOIN n
    GROUP BY g1, g2, g3, d, un1, un2, un3
    """,
)
def record_linkage_fs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FS contingency table linking customers to suppliers.

    Blocking: nationkey equality (pair work is sum over blocks of
    |A_blk|*|B_blk|, never NA*NB; at 100 TB add a second blocking key or
    cap block sizes exactly as blocked_fuzzy_pairs does). Compared
    fields: account-balance century bucket (m=0.95), balance sign
    (m=0.9), name's trailing character (m=0.8). Agreement requires both
    sides non-NULL — missing data is evidence of nothing.

    Plan shape: the u-statistics are three tiny value-frequency joins
    plus two counts, all collapsing to ONE broadcast row; candidate
    generation is a single block-key equi-join; scoring is a map-stage
    CASE over the broadcast weights; the output groupBy has <= 8 groups
    (one per gamma pattern), so map-side combine reduces everything
    before the final shuffle. Nothing materializes per-pair except
    inside the block join itself. The prepped sides are persisted: five
    consumers each (three u-stats, the total count, the pair join) would
    otherwise re-scan the source five times."""
    from cliqz_etl_spark.operators.dedup import _materialize

    cust = load_table(spark, sf_dir, "customer")
    supp = load_table(spark, sf_dir, "supplier")

    def prep(df, nat, bal, name):
        return df.where(F.col(nat).isNotNull()).select(
            F.col(nat).cast("long").alias("blk"),
            F.floor(F.col(bal) / 100).cast("long").alias("f1"),
            (F.col(bal) >= 0).cast("long").alias("f2"),
            F.expr(f"right(trim({name}), 1)").alias("f3"),
        )

    a = _materialize(prep(cust, "c_nationkey", "c_acctbal", "c_name"))
    b = _materialize(prep(supp, "s_nationkey", "s_acctbal", "s_name"))

    def ufreq(col):
        fa = (a.where(F.col(col).isNotNull()).groupBy(col)
              .agg(F.count(F.lit(1)).alias("na")))
        fb = (b.where(F.col(col).isNotNull()).groupBy(col)
              .agg(F.count(F.lit(1)).alias("nb")))
        return (fa.join(fb, col)
                .agg(F.coalesce(F.sum(F.col("na") * F.col("nb")), F.lit(0))
                     .alias(f"un{col[1]}")))

    d = (a.agg(F.count(F.lit(1)).alias("na_tot"))
         .crossJoin(b.agg(F.count(F.lit(1)).alias("nb_tot")))
         .select((F.col("na_tot") * F.col("nb_tot")).alias("d")))
    stats = (d.crossJoin(ufreq("f1")).crossJoin(ufreq("f2"))
             .crossJoin(ufreq("f3")))

    ga = F.col("af1").isNotNull() & F.col("bf1").isNotNull()
    pairs = (
        a.select(F.col("blk"), F.col("f1").alias("af1"),
                 F.col("f2").alias("af2"), F.col("f3").alias("af3"))
        .join(b.select(F.col("blk"), F.col("f1").alias("bf1"),
                       F.col("f2").alias("bf2"), F.col("f3").alias("bf3")),
              "blk")
        .select(
            (ga & (F.col("af1") == F.col("bf1"))).cast("long").alias("g1"),
            (F.col("af2").isNotNull() & F.col("bf2").isNotNull()
             & (F.col("af2") == F.col("bf2"))).cast("long").alias("g2"),
            (F.col("af3").isNotNull() & F.col("bf3").isNotNull()
             & (F.col("af3") == F.col("bf3"))).cast("long").alias("g3"),
        )
    )
    return (
        pairs.crossJoin(F.broadcast(stats))
        .groupBy("g1", "g2", "g3", "d", "un1", "un2", "un3")
        .agg(F.count(F.lit(1)).cast("long").alias("n_pairs"))
        .select(
            (F.col("g1") * 4 + F.col("g2") * 2 + F.col("g3")).cast("long")
            .alias("pattern"),
            "n_pairs",
            F.expr(_fs_score_sql()).cast("long").alias("score_milli"),
        )
    )


# --------------------------------------------------------------------------
# Population Stability Index: the standard production drift monitor (the
# number every model-serving/data-ingest dashboard alarms on). Two corpus
# slices — orders before vs since a cutoff date — are histogrammed into
# ten equal-width totalprice buckets over the COMBINED min/max, and each
# bucket contributes (p_i - q_i) * ln(p_i / q_i), Laplace-smoothed so
# empty buckets stay finite. The bucket spine is generated explicitly
# (0..9) so zero-count buckets still contribute their smoothed term —
# dropping them silently understates drift, the classic PSI bug. All
# ratios are built from exact integer products; the per-bucket term is
# quantized to micro-units (the dsir ln discipline), so the 10-row output
# is integer-stable across engines.
# --------------------------------------------------------------------------
_PSI_CUTOFF = "1997-07-01"
_PSI_B = 10


def _psi_term_sql(a: str, b: str, A: str, B: str) -> str:
    num = f"(({a} + 1) * ({B} + {_PSI_B}))"
    den = f"(({b} + 1) * ({A} + {_PSI_B}))"
    diff = f"({num} - {den})"
    scale = f"(({A} + {_PSI_B}) * ({B} + {_PSI_B}))"
    return (f"CAST(floor(1000000 * (CAST({diff} AS DOUBLE) / CAST({scale} AS DOUBLE))"
            f" * ln(CAST({num} AS DOUBLE) / CAST({den} AS DOUBLE)) + 0.5) AS BIGINT)")


@query(
    "psi_drift",
    oracle=f"""
    WITH base AS (
        SELECT o_totalprice AS p,
               CAST(o_orderdate >= TIMESTAMP '{_PSI_CUTOFF} 00:00:00' AS BIGINT) AS cur
        FROM orders WHERE o_totalprice IS NOT NULL AND o_orderdate IS NOT NULL
    ), bd AS (
        SELECT min(p) AS mn, max(p) AS mx FROM base
    ), coded AS (
        SELECT LEAST({_PSI_B - 1}, CAST(floor((p - mn) * {_PSI_B} / (mx - mn + 1e-9))
                                        AS BIGINT)) AS bucket, cur
        FROM base CROSS JOIN bd
    ), spine AS (
        SELECT unnest(range({_PSI_B})) AS bucket
    ), cnt AS (
        SELECT spine.bucket AS bucket,
               CAST(COALESCE(sum(1 - cur), 0) AS BIGINT) AS n_ref,
               CAST(COALESCE(sum(cur), 0) AS BIGINT) AS n_cur
        FROM spine LEFT JOIN coded ON coded.bucket = spine.bucket
        GROUP BY spine.bucket
    ), tot AS (
        SELECT CAST(sum(n_ref) AS BIGINT) AS a_tot,
               CAST(sum(n_cur) AS BIGINT) AS b_tot
        FROM cnt
    )
    SELECT CAST(bucket AS BIGINT) AS bucket, n_ref, n_cur,
           {_psi_term_sql('n_ref', 'n_cur', 'a_tot', 'b_tot')} AS psi_contrib_micro
    FROM cnt CROSS JOIN tot
    """,
)
def psi_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-bucket PSI between pre- and post-cutoff order-price slices.

    Plan shape: one scan feeding a 2-value bounds aggregate and the
    bucket histogram (sum of 0/1 indicators gives both slice counts in
    ONE groupBy — no second scan per slice), a literal 10-row spine
    left-joined to restore empty buckets, totals from the 10-row frame,
    and a map-stage quantized-ln term. Everything after the histogram
    shuffle is constant-size regardless of corpus scale; the histogram
    itself map-side combines to <= 10 groups per partition."""
    orders = load_table(spark, sf_dir, "orders")
    base = (
        orders
        .where(F.col("o_totalprice").isNotNull() & F.col("o_orderdate").isNotNull())
        .select(
            F.col("o_totalprice").alias("p"),
            (F.col("o_orderdate") >= F.lit(f"{_PSI_CUTOFF} 00:00:00").cast("timestamp"))
            .cast("long").alias("cur"),
        )
    )
    bd = base.agg(F.min("p").alias("mn"), F.max("p").alias("mx"))
    coded = (
        base.crossJoin(F.broadcast(bd))
        .select(
            F.least(F.lit(_PSI_B - 1),
                    F.floor((F.col("p") - F.col("mn")) * _PSI_B
                            / (F.col("mx") - F.col("mn") + F.lit(1e-9))))
            .cast("long").alias("bucket"),
            "cur",
        )
    )
    spine = spark.range(_PSI_B).select(F.col("id").cast("long").alias("bucket"))
    # Aggregate BEFORE touching the spine: the histogram groupBy map-side
    # combines to <= 10 rows, and the spine left-joins against that tiny
    # frame — joining the spine to the raw rows instead would shuffle the
    # whole fact table into 10 skewed partitions.
    hist = coded.groupBy("bucket").agg(
        F.sum(1 - F.col("cur")).alias("r"), F.sum("cur").alias("c"))
    from cliqz_etl_spark.operators.dedup import _materialize

    # materialized: the 10-row bucket frame feeds BOTH the totals
    # aggregate and the final term projection — unpersisted, the corpus
    # histogram behind it executed twice
    cnt = _materialize(
        spine.join(F.broadcast(hist), "bucket", "left")
        .select("bucket",
                F.coalesce(F.col("r"), F.lit(0)).cast("long").alias("n_ref"),
                F.coalesce(F.col("c"), F.lit(0)).cast("long").alias("n_cur"))
    )
    tot = cnt.agg(F.sum("n_ref").cast("long").alias("a_tot"),
                  F.sum("n_cur").cast("long").alias("b_tot"))
    return (
        cnt.crossJoin(F.broadcast(tot))
        .select("bucket", "n_ref", "n_cur",
                F.expr(_psi_term_sql("n_ref", "n_cur", "a_tot", "b_tot"))
                .alias("psi_contrib_micro"))
    )


def _copurchase_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Oriented (a < b) distinct part co-purchase edges, built scan-side:
    each order's distinct parts collect into a sorted list (map-side
    combine), ordered pairs explode from the list — no lineitem
    self-join, so edge generation costs one groupBy(order) regardless of
    corpus size. Shared by triangle_counts and label_propagation."""
    li = (load_table(spark, sf_dir, "lineitem")
          .where(F.col("l_orderkey").isNotNull() & F.col("l_partkey").isNotNull()))
    ps = (li.groupBy("l_orderkey")
          .agg(F.sort_array(F.collect_set("l_partkey")).alias("ps")))
    n = F.size("ps")
    return (ps.select(
        F.explode(F.flatten(F.transform(
            F.sequence(F.lit(0), n - 1),
            lambda i: F.transform(
                F.sequence(F.lit(0), n - 1),
                lambda j: F.when(i < j, F.struct(
                    F.element_at("ps", i + 1).alias("a"),
                    F.element_at("ps", j + 1).alias("b"))),
            )))).alias("p"))
        .where(F.col("p").isNotNull()).select("p.a", "p.b")
        .distinct())


# --------------------------------------------------------------------------
# Triangle counting over the part co-purchase graph — the canonical
# distributed-graph benchmark (clustering coefficient, community
# density). Nodes = parts; an edge joins two parts appearing in the same
# order. Edges are ORIENTED a < b at build time, so each triangle is
# counted exactly once as (a < b < c): the wedge join matches e(a,b) with
# e(b,c) and the closing join checks e(a,c) — the standard two-join plan
# whose work is bounded by sum-of-degree^2 on the oriented graph (the
# reason every production triangle counter orients edges first). Edge
# generation explodes each order's part LIST into ordered pairs
# scan-side, so the only corpus-sized shuffles are the edge distinct and
# the wedge join.
# --------------------------------------------------------------------------
@query(
    "triangle_counts",
    oracle="""
    WITH e AS (
        -- same edge set the Spark side builds scan-side from each
        -- order's sorted part list: distinct within-order pairs, a < b
        SELECT DISTINCT x.l_partkey AS a, y.l_partkey AS b
        FROM lineitem x JOIN lineitem y
          ON y.l_orderkey = x.l_orderkey AND x.l_partkey < y.l_partkey
        WHERE x.l_orderkey IS NOT NULL
    ), wedges AS (
        SELECT e1.a AS a, e1.b AS b, e2.b AS c
        FROM e e1 JOIN e e2 ON e2.a = e1.b
    ), tri AS (
        SELECT count(*) AS n_triangles
        FROM wedges w JOIN e ON e.a = w.a AND e.b = w.c
    )
    SELECT CAST((SELECT count(DISTINCT x) FROM
                    (SELECT a AS x FROM e UNION ALL SELECT b FROM e)) AS BIGINT)
               AS n_nodes,
           CAST((SELECT count(*) FROM e) AS BIGINT) AS n_edges,
           CAST(n_triangles AS BIGINT) AS n_triangles
    FROM tri
    """,
)
def triangle_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global triangle census of the co-purchase graph.

    Plan shape: groupBy(order) collects each order's distinct parts
    (map-side combine), ordered pairs explode scan-side from the sorted
    list, one distinct dedups edges, then wedge join (shuffle on the
    shared endpoint) + closing join (shuffle on (a, c)). The persisted
    edge frame feeds four consumers. At 100 TB the orientation bounds
    wedge counts by the oriented degree; further skew control = cap
    parts-per-order (basket size is naturally small) exactly as the
    range join caps its buckets."""
    from cliqz_etl_spark.operators.dedup import _materialize

    e = _materialize(_copurchase_edges(spark, sf_dir))
    e2 = e.select(F.col("a").alias("b"), F.col("b").alias("c"))
    wedges = e.join(e2, "b").select("a", "b", "c")
    closing = e.select(F.col("a").alias("a"), F.col("b").alias("c"))
    tri = wedges.join(closing, ["a", "c"]).agg(
        F.count(F.lit(1)).cast("long").alias("n_triangles"))
    nodes = (e.select(F.col("a").alias("x"))
             .unionByName(e.select(F.col("b").alias("x")))
             .agg(F.countDistinct("x").cast("long").alias("n_nodes")))
    edges = e.agg(F.count(F.lit(1)).cast("long").alias("n_edges"))
    return (nodes.crossJoin(F.broadcast(edges))
            .crossJoin(F.broadcast(tri))
            .select("n_nodes", "n_edges", "n_triangles"))


# --------------------------------------------------------------------------
# Two-sample Kolmogorov-Smirnov statistic between the same pre/post-
# cutoff order-price slices psi_drift buckets — the distribution-free
# drift test for when equal-width buckets would hide tail movement. The
# CDF comparison is EXACT integer arithmetic: at every distinct price p,
# D contribution = |cum_ref * n_cur - cum_cur * n_ref| (cross-multiplied
# to avoid the division), maximized over p, reported as d_ppm =
# 10^6 * D_num / (n_ref * n_cur). Grouping by distinct value FIRST makes
# ties across slices well-defined (both CDFs jump at p together).
# --------------------------------------------------------------------------
@query(
    "ks_drift",
    oracle=f"""
    WITH base AS (
        SELECT o_totalprice AS p,
               CAST(o_orderdate >= TIMESTAMP '{_PSI_CUTOFF} 00:00:00' AS BIGINT) AS cur
        FROM orders WHERE o_totalprice IS NOT NULL AND o_orderdate IS NOT NULL
    ), per_v AS (
        SELECT p, CAST(sum(1 - cur) AS BIGINT) AS r, CAST(sum(cur) AS BIGINT) AS c
        FROM base GROUP BY p
    ), cum AS (
        SELECT sum(r) OVER (ORDER BY p ASC) AS cr,
               sum(c) OVER (ORDER BY p ASC) AS cc
        FROM per_v
    ), tot AS (
        SELECT CAST(COALESCE(sum(r), 0) AS BIGINT) AS n_ref,
               CAST(COALESCE(sum(c), 0) AS BIGINT) AS n_cur
        FROM per_v
    )
    SELECT tot.n_ref AS n_ref, tot.n_cur AS n_cur,
           CAST(COALESCE(max(abs(cr * tot.n_cur - cc * tot.n_ref)), 0) AS BIGINT)
               AS d_num,
           CAST(CASE WHEN tot.n_ref * tot.n_cur = 0 THEN NULL
                ELSE (1000000 * COALESCE(max(abs(cr * tot.n_cur - cc * tot.n_ref)), 0))
                     // (tot.n_ref * tot.n_cur) END AS BIGINT) AS d_ppm
    FROM cum CROSS JOIN tot GROUP BY tot.n_ref, tot.n_cur
    """,
)
def ks_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact two-sample KS statistic between order-price slices.

    Plan shape: one groupBy(price) collapses the corpus to its distinct
    values (map-side combine), then the cumulative distribution comes
    from operators/stats.py::ranged_cumsum — range-repartitioned
    per-partition cumsums merged by broadcast partition-total prefix
    offsets, so NO stage moves all rows to one task (the two-pass scheme
    every MPP engine uses for exact CDFs; the only single-task window
    runs over the <= n_ranges totals frame). Totals broadcast from the
    same per-value frame, so the corpus is scanned once."""
    from cliqz_etl_spark.operators.stats import ranged_cumsum

    orders = load_table(spark, sf_dir, "orders")
    base = (
        orders
        .where(F.col("o_totalprice").isNotNull() & F.col("o_orderdate").isNotNull())
        .select(F.col("o_totalprice").alias("p"),
                (F.col("o_orderdate")
                 >= F.lit(f"{_PSI_CUTOFF} 00:00:00").cast("timestamp"))
                .cast("long").alias("cur")))
    from cliqz_etl_spark.operators.dedup import _materialize

    per_v = _materialize(
        base.groupBy("p").agg(F.sum(1 - F.col("cur")).alias("r"),
                              F.sum("cur").alias("c")))
    cum = (ranged_cumsum(per_v, "p", ["r", "c"])
           .select(F.col("cum_r").alias("cr"), F.col("cum_c").alias("cc")))
    tot = per_v.agg(F.coalesce(F.sum("r"), F.lit(0)).cast("long").alias("n_ref"),
                    F.coalesce(F.sum("c"), F.lit(0)).cast("long").alias("n_cur"))
    d = (cum.crossJoin(F.broadcast(tot))
         .groupBy("n_ref", "n_cur")
         .agg(F.coalesce(
             F.max(F.abs(F.col("cr") * F.col("n_cur")
                         - F.col("cc") * F.col("n_ref"))), F.lit(0))
             .cast("long").alias("d_num")))
    return d.select(
        "n_ref", "n_cur", "d_num",
        F.when(F.col("n_ref") * F.col("n_cur") == 0, F.lit(None).cast("long"))
        .otherwise(F.expr("(1000000 * d_num) div (n_ref * n_cur)"))
        .cast("long").alias("d_ppm"))


# --------------------------------------------------------------------------
# Winsorized robust statistics — the feature-engineering clip every
# training pipeline applies before normalization. Cut points are EXACT
# rank statistics (value at row_number ceil(0.05 n) / ceil(0.95 n) under
# ORDER BY value — deterministic regardless of tie order, because equal
# values share a value), clipping and the clipped sum use the cents
# discipline so the output is integer-stable.
# --------------------------------------------------------------------------
@query(
    "winsorize_stats",
    oracle="""
    WITH v AS (
        SELECT o_totalprice AS p,
               row_number() OVER (ORDER BY o_totalprice ASC) AS rn
        FROM orders WHERE o_totalprice IS NOT NULL
    ), n AS (SELECT CAST(count(*) AS BIGINT) AS n FROM v),
    cuts AS (
        SELECT (SELECT p FROM v CROSS JOIN n
                WHERE rn = CAST(ceil(0.05 * n.n) AS BIGINT)) AS lo,
               (SELECT p FROM v CROSS JOIN n
                WHERE rn = CAST(ceil(0.95 * n.n) AS BIGINT)) AS hi
    )
    SELECT n.n AS n_rows,
           CAST(floor(cuts.lo * 100 + 0.5) AS BIGINT) AS lo_cents,
           CAST(floor(cuts.hi * 100 + 0.5) AS BIGINT) AS hi_cents,
           CAST(sum(CAST(floor(LEAST(GREATEST(v.p, cuts.lo), cuts.hi) * 100 + 0.5)
                         AS BIGINT)) AS BIGINT) AS clipped_sum_cents,
           CAST(sum(CASE WHEN v.p < cuts.lo THEN 1 ELSE 0 END) AS BIGINT) AS n_lo_clipped,
           CAST(sum(CASE WHEN v.p > cuts.hi THEN 1 ELSE 0 END) AS BIGINT) AS n_hi_clipped
    FROM v CROSS JOIN cuts CROSS JOIN n
    GROUP BY n.n, cuts.lo, cuts.hi
    """,
)
def winsorize_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """5/95 winsorization of order prices: cuts, clipped sum, clip counts.

    Plan shape: ranks come from operators/stats.py::ranged_cumsum (a
    running count under range partitioning — no single-task global
    sort; ranks within a tie block land in arbitrary order, but the
    VALUE at any rank is deterministic because tied rows share the
    value, which is all the cut lookup reads); the two cut values
    collapse to a 1-row broadcast; clipping is a map stage over the
    ranked frame feeding a single global aggregate."""
    from cliqz_etl_spark.operators.stats import ranged_cumsum

    orders = load_table(spark, sf_dir, "orders")
    v = (orders.where(F.col("o_totalprice").isNotNull())
         .select(F.col("o_totalprice").alias("p")))
    from cliqz_etl_spark.operators.dedup import _materialize

    ranked = _materialize(
        ranged_cumsum(v.withColumn("one", F.lit(1)), "p", ["one"])
        .select("p", F.col("cum_one").alias("rn")))
    n = ranked.agg(F.count(F.lit(1)).cast("long").alias("n"))
    cuts = (ranked.crossJoin(F.broadcast(n))
            .where((F.col("rn") == F.ceil(0.05 * F.col("n")))
                   | (F.col("rn") == F.ceil(0.95 * F.col("n"))))
            .agg(F.min(F.when(F.col("rn") == F.ceil(0.05 * F.col("n")),
                              F.col("p"))).alias("lo"),
                 F.min(F.when(F.col("rn") == F.ceil(0.95 * F.col("n")),
                              F.col("p"))).alias("hi")))
    clipped = F.least(F.greatest(F.col("p"), F.col("lo")), F.col("hi"))
    return (
        ranked.crossJoin(F.broadcast(cuts)).crossJoin(F.broadcast(n))
        .groupBy("n", "lo", "hi")
        .agg(F.sum(F.floor(clipped * 100 + F.lit(0.5)).cast("long"))
             .cast("long").alias("clipped_sum_cents"),
             F.sum(F.when(F.col("p") < F.col("lo"), 1).otherwise(0))
             .cast("long").alias("n_lo_clipped"),
             F.sum(F.when(F.col("p") > F.col("hi"), 1).otherwise(0))
             .cast("long").alias("n_hi_clipped"))
        .select(F.col("n").alias("n_rows"),
                F.floor(F.col("lo") * 100 + F.lit(0.5)).cast("long").alias("lo_cents"),
                F.floor(F.col("hi") * 100 + F.lit(0.5)).cast("long").alias("hi_cents"),
                "clipped_sum_cents", "n_lo_clipped", "n_hi_clipped")
    )


# --------------------------------------------------------------------------
# Synchronous label propagation (Raghavan et al. 2007) — the linear-time
# community-detection baseline, here made fully deterministic: every
# node starts as its own label, and each of the two fixed rounds
# reassigns it to the MOST FREQUENT label among its neighbors, ties
# broken by smallest label (classic LPA breaks ties randomly, which no
# oracle could replay). Two rounds over the symmetric co-purchase edge
# set; output is the community-size histogram — the corpus-partitioning
# artifact (near-dup families, co-occurrence clusters) downstream
# sampling consumes. Joins connected components (path doubling) and
# PageRank as the engine's third iterative-graph family member.
# --------------------------------------------------------------------------
_LPA_ITER = 2


def _lpa_oracle() -> str:
    cte = ["""
    WITH e0 AS (
        SELECT DISTINCT x.l_partkey AS a, y.l_partkey AS b
        FROM lineitem x JOIN lineitem y
          ON y.l_orderkey = x.l_orderkey AND x.l_partkey < y.l_partkey
        WHERE x.l_orderkey IS NOT NULL
    ), e AS (
        SELECT a AS src, b AS dst FROM e0 UNION ALL SELECT b, a FROM e0
    ), l0 AS (
        SELECT DISTINCT src AS node, src AS label FROM e
    )"""]
    for i in range(1, _LPA_ITER + 1):
        cte.append(f"""
    , v{i} AS (
        SELECT e.dst AS node, l{i - 1}.label, count(*) AS c
        FROM e JOIN l{i - 1} ON l{i - 1}.node = e.src GROUP BY 1, 2
    ), l{i} AS (
        SELECT node, label FROM (
            SELECT node, label,
                   ROW_NUMBER() OVER (PARTITION BY node
                                      ORDER BY c DESC, label ASC) AS rn
            FROM v{i})
        WHERE rn = 1
    )""")
    return "".join(cte) + f"""
    SELECT CAST(label AS BIGINT) AS label,
           CAST(count(*) AS BIGINT) AS n_members
    FROM l{_LPA_ITER} GROUP BY label
    """


@query("label_propagation", oracle=_lpa_oracle())
def label_propagation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Community sizes after two deterministic LPA rounds.

    Plan shape per round: one edge-label equi-join on src (the persisted
    symmetric edge list re-probes each round), one groupBy(dst, label)
    with map-side combine, one per-node window for the argmax — all
    keyed on node, so the three stages share a shuffle key. Label frames
    have one consumer each (no persist); the edge frame is built once.
    At 100 TB: iterations are data-parallel joins exactly like PageRank,
    and deep runs would add the same periodic localCheckpoint."""
    from pyspark.sql import Window

    from cliqz_etl_spark.operators.dedup import _materialize

    e0 = _copurchase_edges(spark, sf_dir)
    e = _materialize(
        e0.select(F.col("a").alias("src"), F.col("b").alias("dst"))
        .unionByName(e0.select(F.col("b").alias("src"), F.col("a").alias("dst"))))
    labels = e.select(F.col("src").alias("node")).distinct() \
        .withColumn("label", F.col("node"))
    w = Window.partitionBy("node").orderBy(F.desc("c"), F.asc("label"))
    for _ in range(_LPA_ITER):
        votes = (e.join(labels, e.src == labels.node)
                 .groupBy(F.col("dst").alias("node"), "label")
                 .agg(F.count(F.lit(1)).alias("c")))
        labels = (votes.withColumn("rn", F.row_number().over(w))
                  .where(F.col("rn") == 1).select("node", "label"))
    return labels.groupBy("label").agg(
        F.count(F.lit(1)).cast("long").alias("n_members")) \
        .select(F.col("label").cast("long").alias("label"), "n_members")


# --------------------------------------------------------------------------
# Link prediction over the co-purchase graph: common-neighbor count and
# the Adamic-Adar index for non-adjacent part pairs — the classic
# "customers also bought" candidate generator. Candidate pairs come from
# exploding each center node's neighbor list (wedge-by-center: one
# groupBy, no edge self-join) under TWO production cuts, both part of
# the query's contract and replicated in the oracle:
#   * centers above the degree cap are DROPPED — a 10^5-degree hub pairs
#     10^10 candidates and predicts nothing (its neighbors co-occur by
#     popularity, not affinity);
#   * surviving centers contribute at most S neighbors, chosen by md5
#     rank (deterministic sampling — the neighbor-sampling cut every
#     web-scale candidate generator applies), which bounds the explode
#     at S^2/2 rows per center: total wedge work is O(S^2 * |centers|),
#     independent of the degree distribution below the cap. Counts are
#     therefore SAMPLED common neighbors — a ranking signal, not an
#     exact census (the md5 rank is corpus-independent per neighbor id,
#     so scores compare across runs).
# Each center's AA term 1/ln(deg) uses the TRUE degree and is quantized
# to micro-units at the CENTER (one ln() of an exact integer — the
# bigram_lm discipline), so the per-pair integer sum is
# partition-order-free on both engines.
# --------------------------------------------------------------------------
_LP_DEG_CAP = 128    # centers above this degree are popularity, not signal
_LP_NBR_SAMPLE = 32  # md5-ranked neighbor sample per surviving center
_LP_MIN_CN = 2       # score pairs with at least two (sampled) common nbrs
_LP_TOP_K = 3        # report the K best candidates per source part


@query(
    "link_prediction_aa",
    oracle=f"""
    WITH e AS (
        SELECT DISTINCT x.l_partkey AS a, y.l_partkey AS b
        FROM lineitem x JOIN lineitem y
          ON y.l_orderkey = x.l_orderkey AND x.l_partkey < y.l_partkey
        WHERE x.l_orderkey IS NOT NULL
    ), sym AS (
        SELECT a AS w, b AS n FROM e UNION ALL SELECT b AS w, a AS n FROM e
    ), deg AS (
        SELECT w, count(*) AS d FROM sym GROUP BY w
    ), samp AS (
        SELECT s.w, s.n, d.d,
               row_number() OVER (PARTITION BY s.w
                                  ORDER BY {md5_long_sql('s.n')} ASC,
                                           s.n ASC) AS rn
        FROM sym s JOIN deg d USING (w)
        WHERE d.d <= {_LP_DEG_CAP} AND d.d >= 2  -- deg-1: no pairs, ln(1)=0
    ), centers AS (
        SELECT w, n, d,
               CAST(floor(1000000.0 / ln(CAST(d AS DOUBLE))) AS BIGINT)
                   AS term
        FROM samp WHERE rn <= {_LP_NBR_SAMPLE}
    ), pairs AS (
        SELECT c1.n AS a, c2.n AS b, c1.term AS term
        FROM centers c1 JOIN centers c2
          ON c2.w = c1.w AND c1.n < c2.n
    ), nonedge AS (
        SELECT p.a, p.b, p.term FROM pairs p
        WHERE NOT EXISTS (SELECT 1 FROM e WHERE e.a = p.a AND e.b = p.b)
    ), scored AS (
        SELECT a, b,
               CAST(count(*) AS BIGINT) AS common_neighbors,
               CAST(sum(term) AS BIGINT) AS aa_micro
        FROM nonedge GROUP BY a, b HAVING count(*) >= {_LP_MIN_CN}
    ), ranked AS (
        SELECT a, b, common_neighbors, aa_micro,
               row_number() OVER (PARTITION BY a
                                  ORDER BY aa_micro DESC, b ASC) AS rn
        FROM scored
    )
    SELECT a AS a, b AS b, common_neighbors, aa_micro
    FROM ranked WHERE rn <= {_LP_TOP_K}
    """,
)
def link_prediction_aa(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Non-adjacent part pairs ranked by sampled common-neighbor count
    and micro-quantized Adamic-Adar score.

    Plan shape: the shared scan-side edge build (one groupBy(order)), a
    degree aggregate joined back onto the adjacency (both keyed on the
    high-cardinality center id), the md5-rank neighbor sample (window
    partitioned by center — per-partition rows bounded by the degree
    cap), a scan-side ordered-pair explode (<= S^2/2 per center, no
    self-join), one left-anti join against the edge list, and one
    (a, b) aggregate. A hub never materializes its quadratic candidate
    set: the degree cut drops it before the window and the sample bounds
    everything below the cut."""
    from cliqz_etl_spark.functions.hashing import md5_long
    from cliqz_etl_spark.operators.dedup import _materialize

    # The edge frame feeds FIVE consumers (both sym legs for the degree
    # aggregate, both sym legs again under the centers join, and the
    # left-anti probe side) — unpersisted, Catalyst re-derives the whole
    # collect_set -> explode -> distinct subtree for each one: 10
    # lineitem scans / 5 edge builds in the executed plan (measured 6.1 s
    # at sf0.1; guide §2.4 "remove shuffles outright" / §5 caching for
    # reused frames). Persisting it — the same _materialize discipline
    # triangle_counts and kcore_peel already apply to this exact frame —
    # collapses that to ONE build plus in-memory rescans.
    e = _materialize(_copurchase_edges(spark, sf_dir))
    sym = (e.select(F.col("a").alias("w"), F.col("b").alias("n"))
           .unionByName(e.select(F.col("b").alias("w"), F.col("a").alias("n"))))
    # edges are distinct, so count(*) per center IS the degree
    deg = (sym.groupBy("w").agg(F.count(F.lit(1)).alias("d"))
           .where((F.col("d") <= _LP_DEG_CAP) & (F.col("d") >= 2)))
    # md5-rank neighbor sample as ONE keyed aggregate instead of
    # row_number window + a second collect_set aggregate (guide §2.4:
    # two operations keyed the same way share one exchange — and the
    # window's per-partition SORT of the whole sym frame disappears;
    # only <= DEG_CAP-element arrays of surviving centers get sorted).
    # Order is identical to the window's (md5 asc, n asc — array_sort on
    # the (h, n) struct is lexicographic), so the sampled set matches
    # the oracle row-for-row. The degree cut still runs BEFORE any array
    # materializes: the count-only deg aggregate is map-side partial, so
    # a hub never buffers its neighbor list anywhere.
    adj = (sym.join(deg, "w")
           .groupBy("w", "d")
           .agg(F.array_sort(F.collect_list(
               F.struct(md5_long(F.col("n")).alias("h"),
                        F.col("n").alias("n")))).alias("hn"))
           .select(
               "w",
               F.floor(F.lit(1000000.0)
                       / F.log(F.col("d").cast("double")))
               .cast("long").alias("term"),
               F.sort_array(F.transform(
                   F.slice("hn", 1, _LP_NBR_SAMPLE),
                   lambda s: s["n"])).alias("ns")))
    k = F.size("ns")
    pairs = (adj.select(
        "term",
        F.explode(F.flatten(F.transform(
            F.sequence(F.lit(0), k - 1),
            lambda i: F.transform(
                F.sequence(F.lit(0), k - 1),
                lambda j: F.when(i < j, F.struct(
                    F.element_at("ns", i + 1).alias("a"),
                    F.element_at("ns", j + 1).alias("b"))),
            )))).alias("p"))
        .where(F.col("p").isNotNull())
        .select("p.a", "p.b", "term"))
    # Aggregate BEFORE the anti join (guide §2.3 "aggregate before you
    # shuffle"): the (a, b) groupBy now runs with map-side partial
    # aggregation over the raw pair stream — duplicate pairs (the very
    # ones that can pass common_neighbors >= MIN_CN) collapse per
    # partition before the exchange — and the HAVING cut runs before the
    # anti join, so the join probes one row per surviving candidate pair
    # instead of every raw occurrence. Exactly equivalent to the old
    # anti-join-then-aggregate order: the anti join is a filter on the
    # group key (a, b), and key filters commute with the aggregation and
    # with the HAVING.
    scored = (pairs.groupBy("a", "b")
              .agg(F.count(F.lit(1)).cast("long").alias("common_neighbors"),
                   F.sum("term").cast("long").alias("aa_micro"))
              .where(F.col("common_neighbors") >= _LP_MIN_CN)
              .join(e, ["a", "b"], "left_anti"))
    # per-source top-K: the recommendation cut — partitioned by the
    # high-cardinality source key, never a global sort; ties cannot
    # occur inside a partition (b is unique per a) so the cut is
    # deterministic on both engines
    w = Window.partitionBy("a").orderBy(F.desc("aa_micro"), F.asc("b"))
    return (scored.withColumn("__rn", F.row_number().over(w))
            .where(F.col("__rn") <= _LP_TOP_K).drop("__rn"))


# --------------------------------------------------------------------------
# Equi-depth histogram — the data-profiling artifact optimizers and
# drift monitors both want (equal-POPULATION buckets adapt to skew where
# psi_drift's equal-width buckets cannot). Bucket = (rank-1)*B div n
# over the exact global rank, which ranged_cumsum supplies without a
# single-task sort; ties share a value, so bucket EDGES are
# deterministic even though tied rows may split across buckets (an
# equal-count histogram must split ties or give up equal counts — both
# engines split identically by the same rank arithmetic only at the
# aggregate level: per-bucket counts/min/max are tie-order-independent).
# --------------------------------------------------------------------------
_EQD_B = 10


@query(
    "equidepth_histogram",
    oracle=f"""
    WITH v AS (
        SELECT o_totalprice AS p,
               row_number() OVER (ORDER BY o_totalprice ASC) AS rn
        FROM orders WHERE o_totalprice IS NOT NULL
    ), n AS (SELECT CAST(count(*) AS BIGINT) AS n FROM v)
    SELECT CAST(((rn - 1) * {_EQD_B}) // n.n AS BIGINT) AS bucket,
           CAST(count(*) AS BIGINT) AS n_rows,
           CAST(floor(min(p) * 100 + 0.5) AS BIGINT) AS lo_cents,
           CAST(floor(max(p) * 100 + 0.5) AS BIGINT) AS hi_cents
    FROM v CROSS JOIN n GROUP BY 1
    """,
)
def equidepth_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ten equal-population price buckets with their value ranges.

    Per-bucket counts and min/max are independent of how tied rows were
    ordered within the rank (tied rows carry the same value), so the
    output hash-matches even though row_number itself is tie-arbitrary.
    Plan: ranged_cumsum rank (no global single-task sort) + one <= B-
    group aggregate with map-side combine."""
    from cliqz_etl_spark.operators.stats import ranged_cumsum

    orders = load_table(spark, sf_dir, "orders")
    v = (orders.where(F.col("o_totalprice").isNotNull())
         .select(F.col("o_totalprice").alias("p")))
    ranked = (ranged_cumsum(v.withColumn("one", F.lit(1)), "p", ["one"])
              .select("p", F.col("cum_one").alias("rn")))
    n = ranked.agg(F.count(F.lit(1)).cast("long").alias("n"))
    return (ranked.crossJoin(F.broadcast(n))
            .select(F.expr(f"((rn - 1) * {_EQD_B}) div n").cast("long")
                    .alias("bucket"), "p")
            .groupBy("bucket")
            .agg(F.count(F.lit(1)).cast("long").alias("n_rows"),
                 F.floor(F.min("p") * 100 + F.lit(0.5)).cast("long").alias("lo_cents"),
                 F.floor(F.max("p") * 100 + F.lit(0.5)).cast("long").alias("hi_cents")))


# --------------------------------------------------------------------------
# MAD outlier screen — the robust anomaly gate (median + median absolute
# deviation tolerate the very outliers mean/stddev absorb). Medians are
# EXACT DISCRETE rank statistics with the lower-middle rule pinned
# (value at rank ceil(n/2) under ORDER BY value — deterministic under
# ties), computed per event_type with a window PARTITIONED on the group
# key, so every stage is group-parallel (no global sort anywhere).
# Deviations quantize to cents before the second median, and the outlier
# rule |v - med| > 3 * MAD compares integers.
# --------------------------------------------------------------------------
@query(
    "mad_outliers",
    oracle="""
    WITH v AS (
        SELECT event_type, CAST(floor(value * 100 + 0.5) AS BIGINT) AS c
        FROM events WHERE value IS NOT NULL AND event_type IS NOT NULL
    ), med AS (
        SELECT event_type, c AS med_cents FROM (
            SELECT event_type, c,
                   row_number() OVER (PARTITION BY event_type ORDER BY c ASC) AS rn,
                   count(*) OVER (PARTITION BY event_type) AS n
            FROM v)
        WHERE rn = CAST(ceil(n / 2.0) AS BIGINT)
    ), dev AS (
        SELECT v.event_type, v.c, med.med_cents,
               abs(v.c - med.med_cents) AS d
        FROM v JOIN med USING (event_type)
    ), mad AS (
        SELECT event_type, d AS mad_cents FROM (
            SELECT event_type, d,
                   row_number() OVER (PARTITION BY event_type ORDER BY d ASC) AS rn,
                   count(*) OVER (PARTITION BY event_type) AS n
            FROM dev)
        WHERE rn = CAST(ceil(n / 2.0) AS BIGINT)
    )
    SELECT dev.event_type AS event_type,
           CAST(count(*) AS BIGINT) AS n_rows,
           CAST(min(dev.med_cents) AS BIGINT) AS med_cents,
           CAST(min(mad.mad_cents) AS BIGINT) AS mad_cents,
           CAST(sum(CASE WHEN dev.d > 3 * mad.mad_cents THEN 1 ELSE 0 END)
                AS BIGINT) AS n_outliers
    FROM dev JOIN mad USING (event_type)
    GROUP BY dev.event_type
    """,
)
def mad_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-type robust outlier counts via median/MAD.

    Plan shape: two rank passes, each a window PARTITIONED by
    event_type (group-parallel — the MAD pipeline never needs a global
    order); medians broadcast back as tiny per-group frames; the final
    screen is one grouped aggregate. All comparisons integer (cents)."""
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    v = (ev.where(F.col("value").isNotNull() & F.col("event_type").isNotNull())
         .select("event_type",
                 F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long").alias("c")))

    def group_median(df, col, out):
        w = Window.partitionBy("event_type")
        ranked = df.select(
            "event_type", col,
            F.row_number().over(w.orderBy(F.asc(col))).alias("rn"),
            F.count(F.lit(1)).over(w).alias("n"))
        return (ranked.where(F.col("rn") == F.ceil(F.col("n") / 2.0))
                .select("event_type", F.col(col).alias(out)))

    med = group_median(v, "c", "med_cents")
    dev = (v.join(F.broadcast(med), "event_type")
           .withColumn("d", F.abs(F.col("c") - F.col("med_cents"))))
    mad = group_median(dev.select("event_type", "d"), "d", "mad_cents")
    return (dev.join(F.broadcast(mad), "event_type")
            .groupBy("event_type")
            .agg(F.count(F.lit(1)).cast("long").alias("n_rows"),
                 F.min("med_cents").cast("long").alias("med_cents"),
                 F.min("mad_cents").cast("long").alias("mad_cents"),
                 F.sum(F.when(F.col("d") > 3 * F.col("mad_cents"), 1)
                       .otherwise(0)).cast("long").alias("n_outliers")))


# --------------------------------------------------------------------------
# Python UDTF with TABLE(...) PARTITION BY / ORDER BY — the Spark 4
# user-defined TABLE function surface: one UDTF instance per partition
# key, rows streamed in order, terminate() flushes per-partition state.
# The workload is run-length encoding of each user's event-type
# sequence (the telemetry compression / behavior-segmentation shape):
# genuinely stateful row-to-row logic that plain SQL expresses only via
# the gaps-and-islands trick — which is exactly what the DuckDB oracle
# uses, so the UDTF's streaming state machine is checked against a
# different algorithm. At 100 TB each task holds ONE run's counters —
# O(1) state — and partitioning rides the normal keyed shuffle.
# --------------------------------------------------------------------------
def _run_lengths_udtf():
    from pyspark.sql.functions import udtf

    @udtf(returnType=("user_id bigint, run_idx bigint, "
                      "event_type string, run_len bigint"),
          useArrow=True)
    class RunLengths:
        def __init__(self):
            self._user = None
            self._etype = None
            self._len = 0
            self._idx = 0

        def _flush(self):
            if self._len:
                yield (self._user, self._idx, self._etype, self._len)

        def eval(self, row):
            # a TABLE(...) argument arrives as ONE Row per eval call
            user_id, event_type = row["user_id"], row["event_type"]
            if event_type == self._etype and user_id == self._user:
                self._len += 1
                return
            yield from self._flush()
            self._idx += 1
            self._user, self._etype, self._len = user_id, event_type, 1

        def terminate(self):
            yield from self._flush()

    return RunLengths


@query(
    "udtf_run_lengths",
    oracle="""
    WITH e AS (
        SELECT user_id, event_type, ts, event_id FROM events
        WHERE user_id IS NOT NULL AND ts IS NOT NULL
          AND event_type IS NOT NULL
    ), o AS (
        SELECT user_id, event_type,
               ROW_NUMBER() OVER (PARTITION BY user_id
                                  ORDER BY ts, event_id) AS rn,
               ROW_NUMBER() OVER (PARTITION BY user_id, event_type
                                  ORDER BY ts, event_id) AS rne
        FROM e
    ), g AS (
        SELECT user_id, event_type, rn - rne AS grp,
               CAST(count(*) AS BIGINT) AS run_len,
               min(rn) AS first_rn
        FROM o GROUP BY 1, 2, 3
    )
    SELECT user_id AS user_id,
           CAST(ROW_NUMBER() OVER (PARTITION BY user_id
                                   ORDER BY first_rn) AS BIGINT) AS run_idx,
           event_type AS event_type, run_len AS run_len
    FROM g
    """,
)
def udtf_run_lengths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Run-length encoding of each user's time-ordered event-type
    sequence, as a partitioned-ORDER BY Python UDTF.

    Plan shape: TABLE(...) PARTITION BY user_id ORDER BY (ts, event_id)
    is one keyed shuffle + in-partition sort; the UDTF streams rows with
    O(1) state per instance. The oracle reproduces the runs with the
    gaps-and-islands double-row_number identity."""
    load_table(spark, sf_dir, "events").createOrReplaceTempView("_ev_udtf")
    spark.udtf.register("run_lengths_udtf", _run_lengths_udtf())
    return spark.sql("""
        SELECT user_id, run_idx, event_type, run_len
        FROM run_lengths_udtf(
            TABLE(SELECT user_id, event_type, ts, event_id
                  FROM _ev_udtf
                  WHERE user_id IS NOT NULL AND ts IS NOT NULL
                    AND event_type IS NOT NULL)
            PARTITION BY user_id ORDER BY (ts, event_id))
    """)


# --------------------------------------------------------------------------
# Out-of-fold target encoding — the categorical-feature transform every
# tabular-ML pipeline ships, with the leakage protection that makes it
# usable: a row's own fold is EXCLUDED from the mean it receives
# (otherwise the encoding memorizes the row's own target and the model
# overfits the encoder). Folds are deterministic (md5(o_orderkey) % 5),
# the target is integer cents, and the out-of-fold mean is integer floor
# division — exact on both engines, no global state beyond a
# (category x fold) table of ~25 rows.
# --------------------------------------------------------------------------
TE_FOLDS = 5


@query(
    "target_encode_oof",
    oracle=f"""
    WITH rows_t AS (
        SELECT o.o_orderkey,
               c.c_mktsegment AS segment,
               CAST({{h}} % {TE_FOLDS} AS BIGINT) AS fold,
               CAST(floor(o.o_totalprice * 100 + 0.5) AS BIGINT) AS cents
        FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    ), cell AS (
        SELECT segment, fold,
               CAST(sum(cents) AS BIGINT) AS s,
               CAST(count(*) AS BIGINT) AS n
        FROM rows_t GROUP BY segment, fold
    ), cat AS (
        SELECT segment,
               CAST(sum(s) AS BIGINT) AS s_all,
               CAST(sum(n) AS BIGINT) AS n_all
        FROM cell GROUP BY segment
    )
    SELECT r.o_orderkey AS o_orderkey,
           r.segment AS segment,
           r.fold AS fold,
           CAST(CASE WHEN cat.n_all > cell.n
                THEN (cat.s_all - cell.s) // (cat.n_all - cell.n)
                END AS BIGINT) AS encoded_cents
    FROM rows_t r
    JOIN cell ON cell.segment = r.segment AND cell.fold = r.fold
    JOIN cat ON cat.segment = r.segment
    """.format(h=__import__("cliqz_etl_spark.functions.hashing",
                            fromlist=["md5_long_sql"])
               .md5_long_sql("o.o_orderkey")),
)
def target_encode_oof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leakage-safe target encoding of c_mktsegment against order value.

    Plan shape: one fact-dim broadcast join, ONE (segment, fold) groupBy
    (25-row result, map-side combine), the category rollup derived from
    that table (never a re-scan), and two broadcast joins back onto the
    fact rows — the encoding costs one aggregation regardless of corpus
    size. A category seen only inside a row's own fold has no out-of-
    fold evidence and encodes NULL on both engines (the CASE guard)."""
    from cliqz_etl_spark.functions.hashing import md5_long

    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    rows = (orders.join(F.broadcast(cust),
                        orders.o_custkey == cust.c_custkey)
            .select("o_orderkey",
                    F.col("c_mktsegment").alias("segment"),
                    (md5_long(F.col("o_orderkey")) % TE_FOLDS)
                    .cast("long").alias("fold"),
                    F.floor(F.col("o_totalprice") * 100 + F.lit(0.5))
                    .cast("long").alias("cents")))
    cell = (rows.groupBy("segment", "fold")
            .agg(F.sum("cents").cast("long").alias("s"),
                 F.count(F.lit(1)).cast("long").alias("n")))
    cat = (cell.groupBy("segment")
           .agg(F.sum("s").cast("long").alias("s_all"),
                F.sum("n").cast("long").alias("n_all")))
    return (rows.join(F.broadcast(cell), ["segment", "fold"])
            .join(F.broadcast(cat), ["segment"])
            .select("o_orderkey", "segment", "fold",
                    F.when(F.col("n_all") > F.col("n"),
                           F.expr("(s_all - s) div (n_all - n)"))
                    .cast("long").alias("encoded_cents")))


# --------------------------------------------------------------------------
# Benford first-digit audit — the classic anomaly screen over transaction
# amounts (fabricated values flunk the log-uniform first-digit law).
# Amounts go through the cents discipline (floor(value*100+0.5), keep
# > 0), and the first digit comes from the INTEGER's decimal string —
# never from log10-of-double, whose floor flips at representation
# boundaries, and never from printing a double, which the two engines
# format differently. The expected count and the chi-square term are one
# shared IEEE expression tree over (n, digit), milli-quantized per digit
# BEFORE any summation (the tfidf discipline), so the audit replays
# exactly. NULL event types are excluded (an unlabeled stream has no
# per-type law to test) — mirrored on both sides.
# --------------------------------------------------------------------------
def _benford_e(n: str, digit: str) -> str:
    return (f"(CAST({n} AS DOUBLE) "
            f"* log10(1.0 + 1.0 / CAST({digit} AS DOUBLE)))")


def _benford_term(n_obs: str, n: str, digit: str) -> str:
    e = _benford_e(n, digit)
    return (f"CAST(floor((((CAST({n_obs} AS DOUBLE) - {e}) "
            f"* (CAST({n_obs} AS DOUBLE) - {e})) / {e})"
            f" * 1000 + 0.5) AS BIGINT)")


@query(
    "benford_first_digit",
    oracle=f"""
    WITH amt AS (
        SELECT event_type,
               CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents
        FROM events
        WHERE event_type IS NOT NULL
          AND value IS NOT NULL AND floor(value * 100 + 0.5) > 0
    ), obs AS (
        SELECT event_type,
               CAST(substr(CAST(cents AS VARCHAR), 1, 1) AS BIGINT) AS digit,
               CAST(count(*) AS BIGINT) AS n_obs
        FROM amt GROUP BY 1, 2
    ), tot AS (
        SELECT event_type, CAST(count(*) AS BIGINT) AS n FROM amt GROUP BY 1
    ), spine AS (
        SELECT t.event_type, t.n, CAST(d.digit AS BIGINT) AS digit
        FROM tot t CROSS JOIN (SELECT unnest(range(1, 10)) AS digit) d
    )
    SELECT s.event_type AS event_type,
           s.digit AS digit,
           CAST(COALESCE(o.n_obs, 0) AS BIGINT) AS n_obs,
           CAST(floor({_benford_e("s.n", "s.digit")} * 1000 + 0.5) AS BIGINT)
               AS expected_milli,
           {_benford_term("COALESCE(o.n_obs, 0)", "s.n", "s.digit")}
               AS chi2_term_milli
    FROM spine s LEFT JOIN obs o
      ON o.event_type = s.event_type AND o.digit = s.digit
    """,
)
def benford_first_digit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-digit distribution vs Benford's law per event type: observed
    count, expected count (milli), and the per-digit chi-square term
    (milli) over a complete 1-9 digit spine.

    Plan shape: ONE groupBy over the filtered scan for the per-(type,
    digit) counts plus a per-type rollup derived from it; the 9-digit
    spine is a broadcast cross join of the tiny type table. Everything
    after the one aggregation is model-sized."""
    ev = load_table(spark, sf_dir, "events")
    cents = F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long")
    amt = (ev.where(F.col("event_type").isNotNull()
                    & F.col("value").isNotNull())
           .select("event_type", cents.alias("cents"))
           .where(F.col("cents") > 0))
    obs = (amt.select("event_type",
                      F.substring(F.col("cents").cast("string"), 1, 1)
                      .cast("long").alias("digit"))
           .groupBy("event_type", "digit")
           .agg(F.count(F.lit(1)).cast("long").alias("n_obs")))
    tot = obs.groupBy("event_type").agg(
        F.sum("n_obs").cast("long").alias("n"))
    digits = spark.range(1, 10).select(F.col("id").alias("digit"))
    spine = tot.crossJoin(F.broadcast(digits))
    return (spine.join(obs, ["event_type", "digit"], "left")
            .select("event_type", "digit",
                    F.coalesce(F.col("n_obs"), F.lit(0)).cast("long")
                    .alias("n_obs"),
                    F.expr(f"CAST(floor({_benford_e('n', 'digit')} * 1000 "
                           "+ 0.5) AS BIGINT)").alias("expected_milli"),
                    F.expr(_benford_term("COALESCE(n_obs, 0)", "n", "digit"))
                    .alias("chi2_term_milli")))


# --------------------------------------------------------------------------
# BFS reachability levels from the smallest part in the co-purchase
# graph — the frontier-expansion primitive (impact radius, blast-zone
# audits, k-hop neighborhoods). Three fixed rounds, each one
# edges-join-frontier + distinct + anti-join-visited: the standard
# Pregel-style data-parallel BFS where every stage is keyed on node, no
# stage is data-sized on a single task, and the frontier/visited frames
# persist between rounds (same lineage discipline as PageRank/LPA).
# Levels are exact min-distance classes because a node enters the
# frontier the first round it is reachable and is anti-joined away
# afterwards. The oracle unrolls the same three rounds as CTEs.
# --------------------------------------------------------------------------
_BFS_DEPTH = 3


def _bfs_oracle() -> str:
    head = """
    WITH e0 AS (
        SELECT DISTINCT x.l_partkey AS a, y.l_partkey AS b
        FROM lineitem x JOIN lineitem y
          ON y.l_orderkey = x.l_orderkey AND x.l_partkey < y.l_partkey
        WHERE x.l_orderkey IS NOT NULL
    ), e AS (
        SELECT a AS src, b AS dst FROM e0 UNION ALL SELECT b, a FROM e0
    ), l0 AS (SELECT CAST(min(src) AS BIGINT) AS node FROM e)"""
    parts = [head]
    prev_vis = "SELECT node FROM l0"
    for k in range(1, _BFS_DEPTH + 1):
        parts.append(f"""
    , l{k} AS (
        SELECT DISTINCT e.dst AS node
        FROM e JOIN l{k - 1} ON e.src = l{k - 1}.node
        WHERE e.dst NOT IN ({prev_vis})
    )""")
        prev_vis += f" UNION ALL SELECT node FROM l{k}"
    sel = [(f"SELECT CAST({k} AS BIGINT) AS level, "
            f"CAST(count(*) AS BIGINT) AS n_nodes, "
            f"CAST(SUM(node) AS BIGINT) AS node_sum FROM l{k}")
           for k in range(_BFS_DEPTH + 1)]
    return "".join(parts) + "\n    " + "\n    UNION ALL ".join(sel)


@query("bfs_levels", oracle=_bfs_oracle())
def bfs_levels(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Node count and id-checksum per BFS level (0-3) from the smallest
    part in the co-purchase graph.

    Plan shape per round: one edge-frontier equi-join on src (the
    persisted symmetric edge list re-probes each round, frontier side
    small early and AQE-sized later), one distinct on the candidate
    frontier, one anti-join against the persisted visited set — all
    keyed on node. Level summaries are 1-row aggregates unioned at the
    end. At 100 TB this is the standard iterative frontier BFS: work per
    round is bounded by the frontier's out-degree sum, and deep runs
    would add the same periodic localCheckpoint as PageRank."""
    from cliqz_etl_spark.operators.dedup import _materialize

    e0 = _copurchase_edges(spark, sf_dir)
    e = _materialize(
        e0.select(F.col("a").alias("src"), F.col("b").alias("dst"))
        .unionByName(e0.select(F.col("b").alias("src"),
                               F.col("a").alias("dst"))))
    frontier = _materialize(e.agg(F.min("src").alias("node")))
    visited = frontier
    levels = []
    for k in range(_BFS_DEPTH + 1):
        levels.append(
            frontier.agg(F.count(F.lit(1)).cast("long").alias("n_nodes"),
                         F.sum("node").cast("long").alias("node_sum"))
            .select(F.lit(k).cast("long").alias("level"),
                    "n_nodes", "node_sum"))
        if k == _BFS_DEPTH:
            break
        nxt = _materialize(
            e.join(frontier.select(F.col("node").alias("src")), "src")
            .select(F.col("dst").alias("node")).distinct()
            .join(visited, "node", "left_anti"))
        visited = _materialize(visited.unionByName(nxt))
        frontier = nxt
    out = levels[0]
    for lv in levels[1:]:
        out = out.unionByName(lv)
    return out


# --------------------------------------------------------------------------
# k-core peeling over the co-purchase graph — the degeneracy screen
# (dense-substructure extraction: spam rings, power-user cliques,
# heavily-bundled part families). Three synchronous peel rounds toward
# the 100-core: each round recounts degrees over edges whose BOTH
# endpoints survive, then drops nodes below k. Fixed round count (not
# run-to-fixpoint) keeps the plan static and the oracle an unrolled CTE
# chain — the LPA/PageRank discipline for iterative graph ops. A node
# with no surviving edges disappears from the degree frame and is
# peeled implicitly, identically on both engines.
# --------------------------------------------------------------------------
_KCORE_K = 100
_KCORE_ITER = 3


def _kcore_oracle() -> str:
    head = """
    WITH e0 AS (
        SELECT DISTINCT x.l_partkey AS a, y.l_partkey AS b
        FROM lineitem x JOIN lineitem y
          ON y.l_orderkey = x.l_orderkey AND x.l_partkey < y.l_partkey
        WHERE x.l_orderkey IS NOT NULL
    ), e AS (
        SELECT a AS src, b AS dst FROM e0 UNION ALL SELECT b, a FROM e0
    ), a0 AS (SELECT DISTINCT src AS node FROM e)"""
    parts = [head]
    for r in range(1, _KCORE_ITER + 1):
        parts.append(f"""
    , d{r} AS (
        SELECT e.src AS node, count(*) AS deg
        FROM e JOIN a{r - 1} s ON s.node = e.src
               JOIN a{r - 1} t ON t.node = e.dst
        GROUP BY 1
    ), a{r} AS (SELECT node FROM d{r} WHERE deg >= {_KCORE_K})""")
    sel = [(f"SELECT CAST({r} AS BIGINT) AS round, "
            f"(SELECT CAST(count(*) AS BIGINT) FROM a{r}) AS n_active, "
            f"(SELECT CAST(count(*) AS BIGINT) FROM a{r - 1}) "
            f"- (SELECT CAST(count(*) AS BIGINT) FROM a{r}) AS n_peeled")
           for r in range(1, _KCORE_ITER + 1)]
    return "".join(parts) + "\n    " + "\n    UNION ALL ".join(sel)


@query("kcore_peel", oracle=_kcore_oracle())
def kcore_peel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Active and peeled node counts for three synchronous peel rounds
    toward the 100-core of the co-purchase graph.

    Plan shape per round: two active-set semi-style joins gate the
    persisted symmetric edge list to surviving endpoints, one
    groupBy(node) recounts degrees with map-side combine, and the new
    active set persists for the next round — every stage keyed on node,
    never a single-task structure. Round summaries are 1-row aggregates
    unioned at the end. At 100 TB each peel round costs two node-keyed
    joins over the surviving edge set (monotonically shrinking), the
    same shape distributed k-core implementations use; deep peels would
    add periodic localCheckpoint like the other iterative-graph ops."""
    from cliqz_etl_spark.operators.dedup import _materialize

    e0 = _copurchase_edges(spark, sf_dir)
    e = _materialize(
        e0.select(F.col("a").alias("src"), F.col("b").alias("dst"))
        .unionByName(e0.select(F.col("b").alias("src"),
                               F.col("a").alias("dst"))))
    rows = []
    active = None
    for r in range(1, _KCORE_ITER + 1):
        if r == 1:
            # round 1's active set is every endpoint of the symmetric
            # edge list by construction, so the two gating joins are
            # identity — a bare degree count over e is the same frame,
            # and |active0| is exactly the degree frame's row count
            # (each node appears as src at least once). Saves the node
            # distinct plus two edge-sized joins.
            deg = _materialize(e.groupBy("src")
                               .agg(F.count(F.lit(1)).alias("deg")))
            n_prev = deg.agg(F.count(F.lit(1)).cast("long").alias("n_prev"))
        else:
            deg = (e.join(active.select(F.col("node").alias("src")), "src")
                   .join(active.select(F.col("node").alias("dst")), "dst")
                   .groupBy("src")
                   .agg(F.count(F.lit(1)).alias("deg")))
            n_prev = active.agg(
                F.count(F.lit(1)).cast("long").alias("n_prev"))
        nxt = _materialize(deg.where(F.col("deg") >= _KCORE_K)
                           .select(F.col("src").alias("node")))
        n_act = nxt.agg(F.count(F.lit(1)).cast("long").alias("n_active"))
        rows.append(
            n_act.crossJoin(F.broadcast(n_prev))
            .select(F.lit(r).cast("long").alias("round"), "n_active",
                    (F.col("n_prev") - F.col("n_active")).cast("long")
                    .alias("n_peeled")))
        active = nxt
    out = rows[0]
    for fr in rows[1:]:
        out = out.unionByName(fr)
    return out


# --------------------------------------------------------------------------
# Hierarchy (path) rollup — BOM / org-chart aggregation without
# iteration: every part contributes its retail value to each of its 3
# synthetic ancestors (partkey div 10^level — the arithmetic tree every
# decimal id space carries), via a map-side 3-way explode and ONE
# aggregate keyed (level, ancestor). This is the scalable form of
# "recursive" subtree rollups when depth is bounded and ancestry is
# computable: no self-join per level, no driver loop, the corpus is
# touched once. (True data-dependent hierarchies join an edge table per
# level — the bfs_levels shape; this operator is the closed-form fast
# path that covers id-structured hierarchies.)
# --------------------------------------------------------------------------
@query(
    "hierarchy_rollup",
    oracle="""
    WITH base AS (
        SELECT p_partkey AS p,
               CAST(floor(p_retailprice * 100 + 0.5) AS BIGINT) AS cents
        FROM part WHERE p_retailprice IS NOT NULL
    ), anc AS (
        SELECT CAST(1 AS BIGINT) AS level, p // 10 AS ancestor, cents
        FROM base
        UNION ALL
        SELECT CAST(2 AS BIGINT), p // 100, cents FROM base
        UNION ALL
        SELECT CAST(3 AS BIGINT), p // 1000, cents FROM base
    )
    SELECT level, CAST(ancestor AS BIGINT) AS ancestor,
           CAST(count(*) AS BIGINT) AS n_parts,
           CAST(SUM(cents) AS BIGINT) AS subtree_cents
    FROM anc GROUP BY 1, 2
    """,
)
def hierarchy_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Subtree part counts and value (cents) at three ancestor levels of
    the decimal-id hierarchy.

    Plan shape: scan-side explode of a 3-element literal array (no
    shuffle added by the expansion), then ONE groupBy(level, ancestor)
    with map-side combine — ancestor cardinality shrinks 10x per level,
    so the aggregate output is a fraction of the input at every level.
    At 100 TB this is exactly how path-enumerated hierarchies roll up:
    one pass, one shuffle, depth bounded by the id width."""
    part = load_table(spark, sf_dir, "part")
    base = (part.where(F.col("p_retailprice").isNotNull())
            .select(F.col("p_partkey").alias("p"),
                    F.floor(F.col("p_retailprice") * 100 + F.lit(0.5))
                    .cast("long").alias("cents")))
    anc = base.select(
        F.explode(F.expr(
            "array(struct(CAST(1 AS BIGINT) AS level, p div 10 AS ancestor),"
            " struct(CAST(2 AS BIGINT) AS level, p div 100 AS ancestor),"
            " struct(CAST(3 AS BIGINT) AS level, p div 1000 AS ancestor))"
        )).alias("a"),
        "cents")
    return (anc.groupBy(F.col("a.level").alias("level"),
                        F.col("a.ancestor").cast("long").alias("ancestor"))
            .agg(F.count(F.lit(1)).cast("long").alias("n_parts"),
                 F.sum("cents").cast("long").alias("subtree_cents")))

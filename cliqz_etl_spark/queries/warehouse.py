"""Classic warehouse report shapes (TPC-H Q4/Q6/Q10/Q12/Q14/Q15/Q18/Q19/Q22
analogues), adapted to the driver's TPC-H-ish subset schema.

These widen the relational surface beyond the reference's two joins
(SURVEY.md §2.5 lists J1-J5 as its whole join inventory): EXISTS-driven
aggregation, scan-only conditional aggregates, top-k after aggregation,
disjunctive multi-predicate joins, aggregation-subquery membership, scalar
aggregate thresholds, and anti-join + global-average filters. Every float
aggregate follows the cents-quantization discipline (see
queries/relational.py): quantize per row to integer cents, aggregate
integers, so Spark and DuckDB hash-match bit-for-bit.

Scale notes: dimension sides (part, supplier, nation, the 1-row global
aggregates) are broadcast; fact-fact joins shuffle on their natural keys;
every filter sits directly on the scan so Parquet pushdown applies.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cliqz_etl_spark.queries import query
from cliqz_etl_spark.tables import load_table

_HIGH = ("1-URGENT", "2-HIGH")


def _cents(col) -> F.Column:
    return F.floor(col * 100 + F.lit(0.5)).cast("long")


def _revenue_cents():
    return _cents(F.col("l_extendedprice") * (1 - F.col("l_discount")))


# --------------------------------------------------------------------------
# TPC-H Q4 shape: EXISTS-driven count. How many H1-1997 orders had at least
# one returned line, by priority — a left-semi join feeding an aggregate.
# --------------------------------------------------------------------------
@query(
    "order_priority_checking",
    oracle="""
    SELECT o_orderpriority AS o_orderpriority, COUNT(*) AS n_orders
    FROM orders o
    WHERE o.o_orderdate >= TIMESTAMP '1997-01-01'
      AND o.o_orderdate < TIMESTAMP '1997-07-01'
      AND EXISTS (SELECT 1 FROM lineitem l
                  WHERE l.l_orderkey = o.o_orderkey AND l.l_returnflag = 'R')
    GROUP BY o_orderpriority
    """,
)
def order_priority_checking(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXISTS becomes a left-semi join (no row duplication, no distinct
    needed); the date filter prunes orders before the join."""
    orders = load_table(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1997-01-01"))
        & (F.col("o_orderdate") < F.lit("1997-07-01"))
    )
    returned = load_table(spark, sf_dir, "lineitem").where(
        F.col("l_returnflag") == "R"
    ).select("l_orderkey")
    return (
        orders.join(returned, orders.o_orderkey == returned.l_orderkey, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n_orders"))
    )


# --------------------------------------------------------------------------
# TPC-H Q6 shape: scan-only conditional aggregate — the pure pushdown
# query. All three predicates reach the Parquet scan.
# --------------------------------------------------------------------------
@query(
    "forecast_revenue",
    oracle="""
    SELECT CAST(SUM(CAST(floor(l_extendedprice * l_discount * 100 + 0.5) AS BIGINT)) AS BIGINT)
               AS discount_cents,
           COUNT(*) AS n_lines
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1997-01-01' AND l_shipdate < TIMESTAMP '1998-01-01'
      AND l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24
    """,
)
def forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """What revenue was given away as discount in 1997 on small orders."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.where(
            (F.col("l_shipdate") >= F.lit("1997-01-01"))
            & (F.col("l_shipdate") < F.lit("1998-01-01"))
            & (F.col("l_discount") >= 0.05) & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.sum(_cents(F.col("l_extendedprice") * F.col("l_discount")))
            .cast("long").alias("discount_cents"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


# --------------------------------------------------------------------------
# TPC-H Q10 shape: returned-item reporting — top 20 customers by lost
# revenue in 1997Q1. Aggregation then global top-k (TakeOrdered, no full
# sort at scale).
# --------------------------------------------------------------------------
@query(
    "returned_item_top_customers",
    oracle="""
    SELECT c.c_custkey AS c_custkey, c.c_name AS c_name, n.n_name AS n_name,
           CAST(SUM(CAST(floor(l.l_extendedprice * (1 - l.l_discount) * 100 + 0.5) AS BIGINT)) AS BIGINT)
               AS lost_cents
    FROM customer c
    JOIN orders o   ON o.o_custkey = c.c_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN nation n   ON n.n_nationkey = c.c_nationkey
    WHERE l.l_returnflag = 'R'
      AND o.o_orderdate >= TIMESTAMP '1997-01-01'
      AND o.o_orderdate < TIMESTAMP '1997-04-01'
    GROUP BY 1, 2, 3
    ORDER BY lost_cents DESC, c_custkey ASC
    LIMIT 20
    """,
)
def returned_item_top_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Which customers returned the most revenue last quarter."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1997-01-01"))
        & (F.col("o_orderdate") < F.lit("1997-04-01"))
    )
    li = load_table(spark, sf_dir, "lineitem").where(F.col("l_returnflag") == "R")
    nation = load_table(spark, sf_dir, "nation")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(F.sum(_revenue_cents()).cast("long").alias("lost_cents"))
        .orderBy(F.desc("lost_cents"), F.asc("c_custkey"))
        .limit(20)
    )


# --------------------------------------------------------------------------
# TPC-H Q12 shape: conditional CASE-sums over a fact-fact join — high- vs
# low-priority line counts per return flag for 1997 shipments.
# --------------------------------------------------------------------------
@query(
    "priority_line_counts",
    oracle=f"""
    SELECT l_returnflag AS l_returnflag,
           CAST(SUM(CASE WHEN o_orderpriority IN ('{_HIGH[0]}', '{_HIGH[1]}') THEN 1 ELSE 0 END) AS BIGINT)
               AS high_count,
           CAST(SUM(CASE WHEN o_orderpriority IN ('{_HIGH[0]}', '{_HIGH[1]}') THEN 0 ELSE 1 END) AS BIGINT)
               AS low_count
    FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
    WHERE l.l_shipdate >= TIMESTAMP '1997-01-01' AND l.l_shipdate < TIMESTAMP '1998-01-01'
    GROUP BY l_returnflag
    """,
)
def priority_line_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Did urgent orders ship with fewer returns? Indicator sums (the
    reference's A5 pattern) over a join instead of a flat table."""
    li = load_table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1997-01-01"))
        & (F.col("l_shipdate") < F.lit("1998-01-01"))
    )
    orders = load_table(spark, sf_dir, "orders")
    is_high = F.col("o_orderpriority").isin(*_HIGH)
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy("l_returnflag")
        .agg(
            F.sum(F.when(is_high, 1).otherwise(0)).alias("high_count"),
            F.sum(F.when(is_high, 0).otherwise(1)).alias("low_count"),
        )
    )


# --------------------------------------------------------------------------
# TPC-H Q14 shape: promo revenue share — two conditional sums reduced to a
# single integer-exact ratio. Part is the broadcast dimension.
# --------------------------------------------------------------------------
@query(
    "promo_revenue_pct",
    oracle="""
    SELECT CAST(floor(10000.0 * promo_cents / total_cents) AS BIGINT) AS promo_pct_x100
    FROM (
        SELECT
            CAST(SUM(CASE WHEN p_type = 'PROMO'
                THEN CAST(floor(l_extendedprice * (1 - l_discount) * 100 + 0.5) AS BIGINT)
                ELSE 0 END) AS BIGINT) AS promo_cents,
            CAST(SUM(CAST(floor(l_extendedprice * (1 - l_discount) * 100 + 0.5) AS BIGINT))
                AS BIGINT) AS total_cents
        FROM lineitem JOIN part ON p_partkey = l_partkey
        WHERE l_shipdate >= TIMESTAMP '1997-09-01' AND l_shipdate < TIMESTAMP '1997-10-01'
    )
    """,
)
def promo_revenue_pct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Share of September-1997 revenue from promo parts, in basis points.
    The division happens once on two exact integers, so the result is
    engine-portable without any float-sum ordering concerns."""
    li = load_table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1997-09-01"))
        & (F.col("l_shipdate") < F.lit("1997-10-01"))
    )
    part = load_table(spark, sf_dir, "part")
    agg = (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .agg(
            F.sum(F.when(F.col("p_type") == "PROMO", _revenue_cents()).otherwise(F.lit(0)))
            .cast("long").alias("promo_cents"),
            F.sum(_revenue_cents()).cast("long").alias("total_cents"),
        )
    )
    return agg.select(
        F.floor(10000.0 * F.col("promo_cents") / F.col("total_cents"))
        .cast("long").alias("promo_pct_x100")
    )


# --------------------------------------------------------------------------
# TPC-H Q15 shape: best supplier(s) by quarterly revenue — an aggregate
# compared against the aggregate's own max (scalar subquery), kept
# distributed via a broadcast of the 1-row max.
# --------------------------------------------------------------------------
@query(
    "top_revenue_suppliers",
    oracle="""
    WITH rev AS (
        SELECT l_suppkey,
               CAST(SUM(CAST(floor(l_extendedprice * (1 - l_discount) * 100 + 0.5) AS BIGINT)) AS BIGINT)
                   AS revenue_cents
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1997-01-01' AND l_shipdate < TIMESTAMP '1997-04-01'
        GROUP BY l_suppkey
    )
    SELECT s.s_suppkey AS s_suppkey, s.s_name AS s_name,
           r.revenue_cents AS revenue_cents
    FROM rev r JOIN supplier s ON s.s_suppkey = r.l_suppkey
    WHERE r.revenue_cents = (SELECT MAX(revenue_cents) FROM rev)
    """,
)
def top_revenue_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The scalar-subquery max is a broadcast cross join of a 1-row
    aggregate — no window over a single giant partition, no collect."""
    li = load_table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1997-01-01"))
        & (F.col("l_shipdate") < F.lit("1997-04-01"))
    )
    rev = li.groupBy("l_suppkey").agg(
        F.sum(_revenue_cents()).cast("long").alias("revenue_cents")
    )
    mx = rev.agg(F.max("revenue_cents").alias("max_cents"))
    supp = load_table(spark, sf_dir, "supplier")
    return (
        rev.join(F.broadcast(mx), rev.revenue_cents == mx.max_cents)
        .join(F.broadcast(supp), rev.l_suppkey == supp.s_suppkey)
        .select("s_suppkey", "s_name", "revenue_cents")
    )


# --------------------------------------------------------------------------
# TPC-H Q18 shape: large-volume customers — membership in an aggregation
# subquery (orderkeys whose line quantity total exceeds a threshold).
# --------------------------------------------------------------------------
@query(
    "large_volume_customers",
    oracle="""
    WITH big AS (
        SELECT l_orderkey,
               CAST(SUM(CAST(floor(l_quantity * 100 + 0.5) AS BIGINT)) AS BIGINT) AS qty_x100
        FROM lineitem GROUP BY l_orderkey
        HAVING SUM(CAST(floor(l_quantity * 100 + 0.5) AS BIGINT)) > 25000
    )
    SELECT c.c_custkey AS c_custkey, c.c_name AS c_name,
           o.o_orderkey AS o_orderkey, b.qty_x100 AS qty_x100
    FROM big b
    JOIN orders o   ON o.o_orderkey = b.l_orderkey
    JOIN customer c ON c.c_custkey = o.o_custkey
    """,
)
def large_volume_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Orders totalling > 250 units and who placed them. The HAVING
    aggregate runs on the fact table first; the qualifying-order set is
    tiny, so both enrichment joins broadcast it."""
    li = load_table(spark, sf_dir, "lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum(_cents(F.col("l_quantity"))).cast("long").alias("qty_x100"))
        .where(F.col("qty_x100") > 25000)
    )
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    return (
        F.broadcast(big).join(orders, big.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .select("c_custkey", "c_name", "o_orderkey", "qty_x100")
    )


# --------------------------------------------------------------------------
# TPC-H Q19 shape: disjunctive multi-predicate join — three OR'd brand/
# size/quantity windows. One broadcast join; the whole disjunction is a
# single JVM predicate, no union of three scans.
# --------------------------------------------------------------------------
@query(
    "brand_filtered_revenue",
    oracle="""
    SELECT CAST(SUM(CAST(floor(l_extendedprice * (1 - l_discount) * 100 + 0.5) AS BIGINT)) AS BIGINT)
               AS revenue_cents,
           COUNT(*) AS n_lines
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE (p_brand = 'Brand#12' AND l_quantity BETWEEN 1 AND 11 AND p_size <= 5)
       OR (p_brand = 'Brand#23' AND l_quantity BETWEEN 10 AND 20 AND p_size <= 10)
       OR (p_brand = 'Brand#34' AND l_quantity BETWEEN 20 AND 30 AND p_size <= 15)
    """,
)
def brand_filtered_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    q = F.col("l_quantity")
    cases = (
        ((F.col("p_brand") == "Brand#12") & q.between(1, 11) & (F.col("p_size") <= 5))
        | ((F.col("p_brand") == "Brand#23") & q.between(10, 20) & (F.col("p_size") <= 10))
        | ((F.col("p_brand") == "Brand#34") & q.between(20, 30) & (F.col("p_size") <= 15))
    )
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .where(cases)
        .agg(
            F.sum(_revenue_cents()).cast("long").alias("revenue_cents"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


# --------------------------------------------------------------------------
# TPC-H Q13 shape: order-count distribution including zero-order customers.
# Aggregate-then-join: orders pre-aggregates to one row per customer BEFORE
# the left join, so the join input is |customers| + |customers-with-orders|
# rows, not |customers| + |orders| — the shape that matters at 100 TB.
# --------------------------------------------------------------------------
@query(
    "customer_order_distribution",
    oracle="""
    WITH per_cust AS (
        SELECT c.c_custkey, COUNT(o.o_orderkey) AS c_count
        FROM customer c LEFT JOIN orders o ON o.o_custkey = c.c_custkey
        GROUP BY c.c_custkey
    )
    SELECT c_count AS c_count, COUNT(*) AS custdist
    FROM per_cust GROUP BY c_count
    """,
)
def customer_order_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """How many customers placed 0, 1, 2, ... orders."""
    cust = load_table(spark, sf_dir, "customer").select("c_custkey")
    counts = (
        load_table(spark, sf_dir, "orders")
        .groupBy("o_custkey").agg(F.count(F.lit(1)).alias("n"))
    )
    return (
        cust.join(counts, cust.c_custkey == counts.o_custkey, "left_outer")
        .select(F.coalesce(F.col("n"), F.lit(0)).alias("c_count"))
        .groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
    )


# --------------------------------------------------------------------------
# TPC-H Q21 shape: suppliers who were the sole late shipper in a
# multi-supplier order. The classic triple-EXISTS correlated form becomes
# ONE aggregation over lineitem: per order, count distinct suppliers,
# count distinct late suppliers, and remember the late supplier when it is
# unique — exactly the EXISTS / NOT-EXISTS semantics, with one shuffle on
# the natural key instead of three self-joins. "Late" is adapted to this
# subset schema (no commitdate): shipped >60 days after the order date.
# --------------------------------------------------------------------------
@query(
    "sole_late_supplier_blame",
    oracle="""
    WITH flagged AS (
        SELECT l.l_orderkey, l.l_suppkey,
               (l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY) AS late
        FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
        WHERE o.o_orderstatus = 'F'
    ),
    per_order AS (
        SELECT l_orderkey,
               COUNT(DISTINCT l_suppkey) AS n_supp,
               COUNT(DISTINCT CASE WHEN late THEN l_suppkey END) AS n_late,
               MIN(CASE WHEN late THEN l_suppkey END) AS late_supp
        FROM flagged GROUP BY l_orderkey
    )
    SELECT s.s_suppkey AS s_suppkey, s.s_name AS s_name,
           COUNT(*) AS numwait
    FROM per_order p JOIN supplier s ON s.s_suppkey = p.late_supp
    WHERE p.n_supp > 1 AND p.n_late = 1
    GROUP BY 1, 2
    ORDER BY numwait DESC, s_suppkey ASC
    LIMIT 25
    """,
)
def sole_late_supplier_blame(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders").where(
        F.col("o_orderstatus") == "F"
    ).select("o_orderkey", "o_orderdate")
    flagged = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .select(
            "l_orderkey", "l_suppkey",
            (F.col("l_shipdate")
             > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")).alias("late"),
        )
    )
    per_order = flagged.groupBy("l_orderkey").agg(
        F.countDistinct("l_suppkey").alias("n_supp"),
        F.countDistinct(F.when(F.col("late"), F.col("l_suppkey"))).alias("n_late"),
        F.min(F.when(F.col("late"), F.col("l_suppkey"))).alias("late_supp"),
    )
    supp = load_table(spark, sf_dir, "supplier")
    return (
        per_order.where((F.col("n_supp") > 1) & (F.col("n_late") == 1))
        .join(F.broadcast(supp), per_order.late_supp == supp.s_suppkey)
        .groupBy("s_suppkey", "s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.desc("numwait"), F.asc("s_suppkey"))
        .limit(25)
    )


# --------------------------------------------------------------------------
# TPC-H Q22 shape: anti join + global-average threshold. "Well-funded but
# never urgent": customers with above-average positive balance and no
# 1-URGENT order, per market segment. The average comparison is kept
# integer-exact by cross-multiplying instead of dividing:
#   bal_cents > sum_cents / n   <=>   bal_cents * n > sum_cents.
# --------------------------------------------------------------------------
@query(
    "idle_balance_customers",
    oracle="""
    WITH pos AS (
        SELECT CAST(SUM(CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT)) AS BIGINT) AS sum_cents,
               COUNT(*) AS n
        FROM customer WHERE c_acctbal > 0
    )
    SELECT c.c_mktsegment AS c_mktsegment,
           COUNT(*) AS n_customers,
           CAST(SUM(CAST(floor(c.c_acctbal * 100 + 0.5) AS BIGINT)) AS BIGINT) AS total_cents
    FROM customer c, pos
    WHERE CAST(floor(c.c_acctbal * 100 + 0.5) AS BIGINT) * pos.n > pos.sum_cents
      AND NOT EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey
                        AND o.o_orderpriority = '1-URGENT')
    GROUP BY c.c_mktsegment
    """,
)
def idle_balance_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    bal_cents = _cents(F.col("c_acctbal"))
    pos = cust.where(F.col("c_acctbal") > 0).agg(
        F.sum(bal_cents).cast("long").alias("sum_cents"),
        F.count(F.lit(1)).alias("n"),
    )
    urgent = load_table(spark, sf_dir, "orders").where(
        F.col("o_orderpriority") == "1-URGENT"
    ).select("o_custkey")
    return (
        cust.crossJoin(F.broadcast(pos))
        .where(bal_cents * F.col("n") > F.col("sum_cents"))
        .join(urgent, cust.c_custkey == urgent.o_custkey, "left_anti")
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.sum(bal_cents).cast("long").alias("total_cents"),
        )
    )


# --------------------------------------------------------------------------
# TPC-H Q8 shape: national market share. For PROMO parts bought by
# EUROPE-region customers in 1996-1997, what share of the revenue (per
# order year) was supplied by NATION_7? The classic 7-table star: every
# dimension (part, supplier, both nation roles, region) broadcasts; the
# only shuffles are lineitem><orders on orderkey and ><customer on custkey.
# The share is a ratio of two exact integer cent-sums, divided once —
# engine-portable per the repo float discipline.
# (Reference has no multi-dim star; closest join inventory is SURVEY.md
# §2.5 J1-J5 — this extends it. No partsupp table in the testdata, so the
# supplier side links via l_suppkey directly, same as Q7's idiom.)
# --------------------------------------------------------------------------
@query(
    "national_market_share",
    oracle="""
    SELECT o_year,
           CAST(floor(10000.0 * nation_cents / total_cents) AS BIGINT) AS mkt_share_bp,
           nation_cents, total_cents
    FROM (
        SELECT CAST(year(o.o_orderdate) AS INT) AS o_year,
               CAST(SUM(CASE WHEN ns.n_name = 'NATION_7'
                   THEN CAST(floor(l.l_extendedprice * (1 - l.l_discount) * 100 + 0.5) AS BIGINT)
                   ELSE 0 END) AS BIGINT) AS nation_cents,
               CAST(SUM(CAST(floor(l.l_extendedprice * (1 - l.l_discount) * 100 + 0.5) AS BIGINT)) AS BIGINT)
                   AS total_cents
        FROM lineitem l
        JOIN part p      ON p.p_partkey = l.l_partkey AND p.p_type = 'PROMO'
        JOIN supplier s  ON s.s_suppkey = l.l_suppkey
        JOIN nation ns   ON ns.n_nationkey = s.s_nationkey
        JOIN orders o    ON o.o_orderkey = l.l_orderkey
        JOIN customer c  ON c.c_custkey = o.o_custkey
        JOIN nation nc   ON nc.n_nationkey = c.c_nationkey
        JOIN region r    ON r.r_regionkey = nc.n_regionkey AND r.r_name = 'EUROPE'
        WHERE o.o_orderdate >= TIMESTAMP '1996-01-01'
          AND o.o_orderdate <  TIMESTAMP '1998-01-01'
        GROUP BY 1
    )
    ORDER BY o_year
    """,
)
def national_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q8 star: dims broadcast, facts shuffle once per fact key. The
    customer->nation->region chain collapses to a broadcast semi-filter
    (EUROPE custkeys never leave the build side at dim scale)."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").where(F.col("p_type") == "PROMO")
    supp = load_table(spark, sf_dir, "supplier")
    nat_s = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation"))
    orders = load_table(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1996-01-01"))
        & (F.col("o_orderdate") < F.lit("1998-01-01")))
    cust = load_table(spark, sf_dir, "customer")
    nat_c = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region").where(F.col("r_name") == "EUROPE")
    euro_nations = nat_c.join(
        F.broadcast(region), nat_c.n_regionkey == region.r_regionkey
    ).select(F.col("n_nationkey").alias("cn_key"))
    euro_cust = cust.join(
        F.broadcast(euro_nations), cust.c_nationkey == F.col("cn_key"), "left_semi"
    ).select("c_custkey")
    rev = _revenue_cents()
    joined = (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(nat_s), supp.s_nationkey == F.col("sn_key"))
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(euro_cust, orders.o_custkey == F.col("c_custkey"), "left_semi")
    )
    agg = (
        joined.groupBy(F.year("o_orderdate").cast("int").alias("o_year"))
        .agg(
            F.sum(F.when(F.col("supp_nation") == "NATION_7", rev).otherwise(F.lit(0)))
            .cast("long").alias("nation_cents"),
            F.sum(rev).cast("long").alias("total_cents"),
        )
    )
    return agg.select(
        "o_year",
        F.floor(10000.0 * F.col("nation_cents") / F.col("total_cents"))
        .cast("long").alias("mkt_share_bp"),
        "nation_cents", "total_cents",
    ).orderBy("o_year")


# --------------------------------------------------------------------------
# TPC-H Q17 shape: small-quantity-order revenue. Revenue from lines whose
# quantity is below 20% of the per-part average, for two brands. The
# correlated scalar subquery becomes a per-part aggregate joined back to
# the lines; the below-average predicate is EXACT integer arithmetic
# (5 * qty * n_lines < sum_qty <=> qty < 0.2 * avg) so neither engine ever
# compares against an order-dependent double average.
# --------------------------------------------------------------------------
@query(
    "small_quantity_revenue",
    oracle="""
    WITH brand_lines AS (
        SELECT l.l_partkey, p.p_brand,
               CAST(l.l_quantity AS BIGINT) AS qty,
               CAST(floor(l.l_extendedprice * 100 + 0.5) AS BIGINT) AS price_cents
        FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
        WHERE p.p_brand IN ('Brand#21', 'Brand#22')
    ), stats AS (
        SELECT l_partkey, CAST(SUM(qty) AS BIGINT) AS sum_qty, COUNT(*) AS n_lines
        FROM brand_lines GROUP BY l_partkey
    )
    SELECT b.p_brand AS p_brand,
           CAST(SUM(b.price_cents) AS BIGINT) AS small_rev_cents,
           COUNT(*) AS n_small_lines
    FROM brand_lines b JOIN stats s ON s.l_partkey = b.l_partkey
    WHERE 5 * b.qty * s.n_lines < s.sum_qty
    GROUP BY b.p_brand
    ORDER BY p_brand
    """,
)
def small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q17: the per-part average is a partial-agg'd groupBy on the pruned
    brand subset (1/25 of parts) joined back onto the same pruned lines.
    The stats side is fact-derived, so it gets no forced broadcast —
    at toy scale AQE converts the partkey join to broadcast on its own;
    at 100 TB it stays a co-keyed shuffle join (both sides already hash
    on l_partkey, so the exchange is reused). The full lineitem never
    shuffles, and the threshold compare is integer-exact on both engines."""
    part = load_table(spark, sf_dir, "part").where(
        F.col("p_brand").isin("Brand#21", "Brand#22"))
    li = load_table(spark, sf_dir, "lineitem")
    lines = (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .select(
            "l_partkey", "p_brand",
            F.col("l_quantity").cast("long").alias("qty"),
            _cents(F.col("l_extendedprice")).alias("price_cents"),
        )
    )
    stats = lines.groupBy(F.col("l_partkey").alias("sk")).agg(
        F.sum("qty").alias("sum_qty"), F.count(F.lit(1)).alias("n_lines"))
    return (
        lines.join(stats, lines.l_partkey == F.col("sk"))
        .where(F.lit(5) * F.col("qty") * F.col("n_lines") < F.col("sum_qty"))
        .groupBy("p_brand")
        .agg(
            F.sum("price_cents").cast("long").alias("small_rev_cents"),
            F.count(F.lit(1)).alias("n_small_lines"),
        )
        .orderBy("p_brand")
    )


# --------------------------------------------------------------------------
# Z-order (Morton-curve) data layout: the file-skipping story at 100 TB.
# Delta/Iceberg OPTIMIZE ZORDER works exactly like this — quantize each
# clustering dimension, interleave the bits, range-partition files by the
# interleaved code — so min/max footer stats stay tight on EVERY dimension
# at once instead of only the leading sort key. This query materializes the
# layout decision itself (bucket = top z-bits, shuffle-free, the same
# range-by-z rule a real OPTIMIZE job uses) and reports the per-file
# min/max spans for both layouts side by side: z-order buckets bound BOTH
# custkey and orderdate to ~1/4 of their range, while the linear
# (sort-by-custkey) layout leaves the date span at full width — the
# measurable reason a date-predicate scan prunes 0 files under linear
# layout and ~15/16 under z-order. All arithmetic is integer (quantize by
# `div`, interleave by div/mod bit picks) so the oracle is bit-exact.
# --------------------------------------------------------------------------
_ZB = 16  # quantization levels per dimension (4 bits each -> 8-bit z-code)


def _z_interleave_terms(cx: str, cy: str) -> str:
    """`cx` bits at even positions, `cy` bits at odd — identical text for
    Spark's and DuckDB's SQL dialects (div/% on non-negative BIGINTs)."""
    terms = []
    for i in range(4):
        terms.append(f"(({cx} div {1 << i}) % 2) * {1 << (2 * i)}")
        terms.append(f"(({cy} div {1 << i}) % 2) * {1 << (2 * i + 1)}")
    return " + ".join(terms)


@query(
    "zorder_layout",
    oracle=f"""
    WITH base AS (
        SELECT o_custkey AS x,
               date_diff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE)) AS y
        FROM orders
        WHERE o_custkey IS NOT NULL AND o_orderdate IS NOT NULL
    ), b AS (
        SELECT min(x) AS xmn, max(x) AS xmx, min(y) AS ymn, max(y) AS ymx
        FROM base
    ), coded AS (
        SELECT x, y,
               ((x - xmn) * {_ZB}) // (xmx - xmn + 1) AS cx,
               ((y - ymn) * {_ZB}) // (ymx - ymn + 1) AS cy
        FROM base CROSS JOIN b
    ), z AS (
        SELECT x, y, cx,
               ({_z_interleave_terms('cx', 'cy').replace(' div ', ' // ')}) AS zv
        FROM coded
    ), tagged AS (
        SELECT 'zorder' AS layout, zv // {_ZB} AS bucket, x, y FROM z
        UNION ALL
        SELECT 'linear' AS layout, cx AS bucket, x, y FROM z
    )
    SELECT layout AS layout, CAST(bucket AS BIGINT) AS bucket,
           CAST(count(*) AS BIGINT) AS n_rows,
           CAST(max(x) - min(x) AS BIGINT) AS cust_span,
           CAST(max(y) - min(y) AS BIGINT) AS day_span
    FROM tagged GROUP BY layout, bucket
    """,
)
def zorder_layout(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Morton-interleave layout planner over orders(custkey, orderdate).

    Plan shape: one 4-value bounds aggregate (tiny, broadcast back via
    cross join), a pure map stage for quantize + bit-interleave (stays
    inside whole-stage codegen: div/mod arithmetic, no UDF), a 2x
    struct-explode to tag each row with both candidate layouts, and ONE
    groupBy(layout, bucket) with map-side combine (<= 32 groups). The
    bucket id is the z-code's top bits — a pure projection, exactly how a
    production OPTIMIZE ZORDER range-partitions output files without a
    global sort; at 100 TB the same plan holds because nothing here is
    proportional to data size except the scan and the 32-group combine."""
    orders = load_table(spark, sf_dir, "orders")
    base = (
        orders
        .where(F.col("o_custkey").isNotNull() & F.col("o_orderdate").isNotNull())
        .select(
            F.col("o_custkey").alias("x"),
            F.datediff(F.to_date("o_orderdate"), F.lit("1970-01-01")).cast("long").alias("y"),
        )
    )
    bounds = base.agg(
        F.min("x").alias("xmn"), F.max("x").alias("xmx"),
        F.min("y").alias("ymn"), F.max("y").alias("ymx"),
    )
    coded = (
        base.crossJoin(F.broadcast(bounds))
        .select(
            "x", "y",
            F.expr(f"((x - xmn) * {_ZB}) div (xmx - xmn + 1)").alias("cx"),
            F.expr(f"((y - ymn) * {_ZB}) div (ymx - ymn + 1)").alias("cy"),
        )
        .select("x", "y", "cx",
                F.expr(_z_interleave_terms("cx", "cy")).alias("zv"))
    )
    tagged = coded.select(
        "x", "y",
        F.explode(F.array(
            F.struct(F.lit("zorder").alias("layout"),
                     F.expr(f"zv div {_ZB}").alias("bucket")),
            F.struct(F.lit("linear").alias("layout"),
                     F.col("cx").alias("bucket")),
        )).alias("t"),
    ).select("t.layout", F.col("t.bucket").cast("long").alias("bucket"), "x", "y")
    return tagged.groupBy("layout", "bucket").agg(
        F.count(F.lit(1)).cast("long").alias("n_rows"),
        (F.max("x") - F.min("x")).cast("long").alias("cust_span"),
        (F.max("y") - F.min("y")).cast("long").alias("day_span"),
    )


# --------------------------------------------------------------------------
# Hilbert-curve layout — zorder_layout's stronger sibling. The Hilbert
# curve guarantees consecutive codes are ADJACENT cells (Manhattan
# distance 1), so per-bucket min/max rectangles are tighter than Morton's
# (whose bit-interleave jumps across the plane at power-of-two seams) —
# the reason Delta Lake added Liquid/Hilbert clustering after ZORDER.
# The xy->d walk is the classic 4-iteration rotate-and-reflect (one per
# quantized bit, n=16): each level is a pure CASE/div/mod projection, so
# the whole transform is ONE codegen'd map stage on both engines — the
# same text renders to Spark (div) and DuckDB (//), and the arithmetic
# XOR identity 3*rx + ry - 2*rx*ry keeps it operator-portable. The n-1
# reflection variant is used (not s-1) because it keeps intermediates
# non-negative — truncated div/% diverge from two's-complement bit masks
# below zero (pinned by tests/test_warehouse_layout.py's exhaustive
# bijection + adjacency sweep of the 16x16 grid).
# --------------------------------------------------------------------------
_HN = 16  # Hilbert grid order per dimension (reuses _ZB quantization)


def _hilbert_level(s: int) -> tuple[str, str, str]:
    """(d-increment, next-hx, next-hy) expression text for one rotate-
    reflect level at scale ``s`` — identical for both SQL dialects."""
    rx = f"((hx div {s}) % 2)"
    ry = f"((hy div {s}) % 2)"
    d_inc = f"{s * s} * (3 * {rx} + {ry} - 2 * {rx} * {ry})"
    nhx = (f"CASE WHEN {ry} = 1 THEN hx "
           f"WHEN {rx} = 1 THEN {_HN - 1} - hy ELSE hy END")
    nhy = (f"CASE WHEN {ry} = 1 THEN hy "
           f"WHEN {rx} = 1 THEN {_HN - 1} - hx ELSE hx END")
    return d_inc, nhx, nhy


def _hilbert_oracle() -> str:
    levels = []
    prev = "h0"
    for i, s in enumerate((8, 4, 2, 1)):
        d_inc, nhx, nhy = _hilbert_level(s)
        nxt = f"h{i + 1}"
        levels.append(
            f"{nxt}p AS (SELECT x, y, ({nhx}) AS nhx, ({nhy}) AS nhy, "
            f"d + ({d_inc}) AS d FROM {prev}), "
            f"{nxt} AS (SELECT x, y, nhx AS hx, nhy AS hy, d FROM {nxt}p)")
        prev = nxt
    sql = f"""
    WITH base AS (
        SELECT o_custkey AS x,
               date_diff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE)) AS y
        FROM orders
        WHERE o_custkey IS NOT NULL AND o_orderdate IS NOT NULL
    ), b AS (
        SELECT min(x) AS xmn, max(x) AS xmx, min(y) AS ymn, max(y) AS ymx
        FROM base
    ), coded AS (
        SELECT x, y,
               ((x - xmn) * {_ZB}) div (xmx - xmn + 1) AS cx,
               ((y - ymn) * {_ZB}) div (ymx - ymn + 1) AS cy
        FROM base CROSS JOIN b
    ), h0 AS (
        SELECT x, y, cx AS hx, cy AS hy, 0 AS d FROM coded
    ), {', '.join(levels)}
    SELECT 'hilbert' AS layout, CAST(d div {_ZB} AS BIGINT) AS bucket,
           CAST(count(*) AS BIGINT) AS n_rows,
           CAST(max(x) - min(x) AS BIGINT) AS cust_span,
           CAST(max(y) - min(y) AS BIGINT) AS day_span
    FROM {prev} GROUP BY 1, 2
    """
    return sql.replace(" div ", " // ")


@query("hilbert_layout", oracle=_hilbert_oracle())
def hilbert_layout(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hilbert-curve layout planner over orders(custkey, orderdate) —
    zorder_layout's comparison row set (same quantization, same bucket
    count, same span metrics; a layout optimizer reads both and picks
    the tighter spans).

    Plan shape: identical to zorder_layout except the interleave is the
    4-level rotate-reflect chain — still a single codegen'd projection
    (Catalyst collapses the per-level selects), one tiny bounds
    broadcast, ONE 16-group aggregate. Nothing data-sized beyond the
    scan at any scale."""
    orders = load_table(spark, sf_dir, "orders")
    base = (
        orders
        .where(F.col("o_custkey").isNotNull() & F.col("o_orderdate").isNotNull())
        .select(
            F.col("o_custkey").alias("x"),
            F.datediff(F.to_date("o_orderdate"), F.lit("1970-01-01")).cast("long").alias("y"),
        )
    )
    bounds = base.agg(
        F.min("x").alias("xmn"), F.max("x").alias("xmx"),
        F.min("y").alias("ymn"), F.max("y").alias("ymx"),
    )
    h = (
        base.crossJoin(F.broadcast(bounds))
        .selectExpr(
            "x", "y",
            f"((x - xmn) * {_ZB}) div (xmx - xmn + 1) AS hx",
            f"((y - ymn) * {_ZB}) div (ymx - ymn + 1) AS hy",
            "CAST(0 AS BIGINT) AS d",
        )
    )
    for s in (8, 4, 2, 1):
        d_inc, nhx, nhy = _hilbert_level(s)
        h = h.selectExpr(
            "x", "y",
            f"({nhx}) AS nhx", f"({nhy}) AS nhy", f"d + ({d_inc}) AS d",
        ).selectExpr("x", "y", "nhx AS hx", "nhy AS hy", "d")
    return (
        h.select(
            F.lit("hilbert").alias("layout"),
            F.expr(f"d div {_ZB}").cast("long").alias("bucket"),
            "x", "y")
        .groupBy("layout", "bucket")
        .agg(F.count(F.lit(1)).cast("long").alias("n_rows"),
             (F.max("x") - F.min("x")).cast("long").alias("cust_span"),
             (F.max("y") - F.min("y")).cast("long").alias("day_span"))
    )


# --------------------------------------------------------------------------
# Compaction planning — the small-files maintenance pass every lakehouse
# table service runs (Iceberg/Delta OPTIMIZE): given a file inventory
# (here: per (ship-month, returnflag) fragment sizes, the partition
# grain the engine's own writers produce), pack fragments into target-
# capacity rewrite bins by sorted sequential packing — sort by size
# descending, running-total, bin = floor(preceding_total / capacity).
# Deterministic, one pass, and the running total never sorts in one
# task: it rides ranged_cumsum's composite-key two-pass scheme. The
# plan output is metadata-sized (one row per fragment).
# --------------------------------------------------------------------------
COMPACT_TARGET_ROWS = 4_000


@query(
    "compaction_plan",
    oracle=f"""
    WITH inv AS (
        SELECT strftime(l_shipdate, '%Y-%m') AS month,
               l_returnflag AS returnflag,
               CAST(count(*) AS BIGINT) AS size_rows
        FROM lineitem WHERE l_shipdate IS NOT NULL
        GROUP BY 1, 2
    ), seq AS (
        SELECT month, returnflag, size_rows,
               -- NULLS FIRST pins the tie-break: Spark ASC is NULLS FIRST
               -- while DuckDB windows default NULLS LAST, and returnflag
               -- is NULL-perturbed in the fuzz gate — a NULL-flag fragment
               -- tying a non-NULL one on (size_rows, month) would
               -- otherwise land in a different bin per engine.
               CAST(sum(size_rows) OVER (
                   ORDER BY size_rows DESC, month ASC,
                            returnflag ASC NULLS FIRST
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) AS BIGINT) AS cum
        FROM inv
    )
    SELECT month, returnflag, size_rows,
           CAST((cum - size_rows) // {COMPACT_TARGET_ROWS} AS BIGINT) AS bin
    FROM seq
    """,
)
def compaction_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bin-packed rewrite plan for the (month, returnflag) fragments.

    Plan shape: one map-side-combined groupBy builds the inventory;
    ranged_cumsum (order: size desc via negated key, then month/flag as
    deterministic tiebreaks) assigns running totals with range-parallel
    windows; the bin id is a scan-side div. First-fit-decreasing would
    pack marginally tighter but is inherently sequential; sorted
    sequential packing is the distributed-planner standard."""
    from cliqz_etl_spark.operators.stats import ranged_cumsum

    li = load_table(spark, sf_dir, "lineitem")
    inv = (li.where(F.col("l_shipdate").isNotNull())
           .groupBy(F.date_format("l_shipdate", "yyyy-MM").alias("month"),
                    F.col("l_returnflag").alias("returnflag"))
           .agg(F.count(F.lit(1)).cast("long").alias("size_rows")))
    seq = ranged_cumsum(
        inv.withColumn("neg_size", -F.col("size_rows")),
        ["neg_size", "month", "returnflag"], ["size_rows"])
    return seq.select(
        "month", "returnflag", "size_rows",
        F.expr(f"(cum_size_rows - size_rows) div {COMPACT_TARGET_ROWS}")
        .cast("long").alias("bin"))


# --------------------------------------------------------------------------
# Zone-map pruning plan — the scan-planning arithmetic behind every
# columnar format's min/max statistics (parquet row groups, ORC stripes,
# Iceberg manifests): per month partition of orders, the price min/max
# (cents-quantized so both engines compare exact integers) and whether a
# BETWEEN predicate can skip the partition entirely. The planner reads
# only aggregated stats — the 100 TB version prunes from metadata
# without touching data files; this query IS that metadata computation,
# one map-side-combined aggregation of the fact table.
# --------------------------------------------------------------------------
PRUNE_LO_CENTS = 5_000_000    # 50,000.00
PRUNE_HI_CENTS = 15_000_000   # 150,000.00


@query(
    "minmax_prune_plan",
    oracle=f"""
    SELECT strftime(o_orderdate, '%Y-%m') AS month,
           CAST(count(*) AS BIGINT) AS n_rows,
           CAST(min(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT) AS min_cents,
           CAST(max(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT) AS max_cents,
           (max(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) < {PRUNE_LO_CENTS}
            OR min(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) > {PRUNE_HI_CENTS})
               AS prunable
    FROM orders
    WHERE o_orderdate IS NOT NULL AND o_totalprice IS NOT NULL
    GROUP BY 1
    """,
)
def minmax_prune_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Which monthly partitions a 50k-150k price predicate can skip.

    One aggregation, partition-count output rows; the prunable flag is
    the exact zone-map test (max < lo OR min > hi)."""
    o = load_table(spark, sf_dir, "orders")
    cents = F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)).cast("long")
    return (o.where(F.col("o_orderdate").isNotNull()
                    & F.col("o_totalprice").isNotNull())
            .groupBy(F.date_format("o_orderdate", "yyyy-MM").alias("month"))
            .agg(F.count(F.lit(1)).cast("long").alias("n_rows"),
                 F.min(cents).cast("long").alias("min_cents"),
                 F.max(cents).cast("long").alias("max_cents"))
            .withColumn("prunable",
                        (F.col("max_cents") < PRUNE_LO_CENTS)
                        | (F.col("min_cents") > PRUNE_HI_CENTS)))


# --------------------------------------------------------------------------
# Exact money aggregation — the surface finance pipelines actually use
# instead of the engine's cents-BIGINT discipline. Prices quantize to
# cents with the pinned floor(x*100+0.5) (double->DECIMAL casts round
# half-up in Spark but round-half-even in some engines — the same class
# of divergence the cents rule exists for) and the SUM runs over exact
# integers. Round-8 driver red (the registry's only one): presenting
# DECIMAL(18,2) hash-mismatched because an exactly-integral money value
# canonicalizes as '…314.0' on a float fetch path but '…314.00' as a
# Decimal. Driver-proof presentation instead: keep the exact cents as
# BIGINT and render the money as a VARCHAR from pure integer arithmetic
# (cents DIV 100 '.' cents%100 zero-padded) on BOTH engines — no float,
# no Decimal, identical canonical string on every fetch path.
# --------------------------------------------------------------------------
@query(
    "decimal_money_rollup",
    oracle="""
    WITH c AS (
        SELECT o_orderstatus,
               CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS cents
        FROM orders
        WHERE o_orderstatus IS NOT NULL AND o_totalprice IS NOT NULL
    )
    SELECT status, n_orders, sum_cents, max_cents,
           -- sign rendered explicitly: truncating division on negative
           -- cents would otherwise emit '-3.-14'-style garbage (review
           -- finding; latent while prices stay positive)
           printf('%s%d.%02d', CASE WHEN sum_cents < 0 THEN '-' ELSE '' END,
                  abs(sum_cents) // 100, abs(sum_cents) % 100) AS total_price,
           printf('%s%d.%02d', CASE WHEN max_cents < 0 THEN '-' ELSE '' END,
                  abs(max_cents) // 100, abs(max_cents) % 100) AS max_price
    FROM (
        SELECT o_orderstatus AS status,
               CAST(count(*) AS BIGINT) AS n_orders,
               CAST(sum(cents) AS BIGINT) AS sum_cents,
               CAST(max(cents) AS BIGINT) AS max_cents
        FROM c GROUP BY o_orderstatus
    )
    """,
)
def decimal_money_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order totals per status: exact integer cents plus a canonical
    2-decimal VARCHAR rendering built from integer division only.

    One map-side-combined aggregation; no float or Decimal ever touches
    the presented money, so the value hashes identically regardless of
    which fetch path an external harness canonicalizes through."""
    o = load_table(spark, sf_dir, "orders")
    cents = F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)).cast("long")
    agg = (o.where(F.col("o_orderstatus").isNotNull()
                   & F.col("o_totalprice").isNotNull())
           .groupBy(F.col("o_orderstatus").alias("status"))
           .agg(F.count(F.lit(1)).cast("long").alias("n_orders"),
                F.sum(cents).cast("long").alias("sum_cents"),
                F.max(cents).cast("long").alias("max_cents")))
    def money(c: str) -> str:
        return (f"format_string('%s%d.%02d',"
                f" CASE WHEN {c} < 0 THEN '-' ELSE '' END,"
                f" abs({c}) DIV 100, abs({c}) % 100)")

    return agg.select(
        "status", "n_orders", "sum_cents", "max_cents",
        F.expr(money("sum_cents")).alias("total_price"),
        F.expr(money("max_cents")).alias("max_price"))


# --------------------------------------------------------------------------
# Market-basket association rules — the A-Priori first pass at brand
# grain: brands co-ordered in the same order, support-pruned, with both
# confidences and lift. The pair explosion is bounded by ITEMS PER
# ORDER (<= distinct brands per order, ~7 lines in TPC-H), so the
# self-join's output is ~items^2/2 per order — linear in order count at
# fixed basket size, the textbook scalable shape. Brand lookup is a
# broadcast dim join; every aggregate is brand- or pair-grain.
# --------------------------------------------------------------------------
BASKET_MIN_SUPPORT = 5


@query(
    "market_basket_rules",
    oracle=f"""
    WITH items AS (
        SELECT DISTINCT l_orderkey AS okey, p_brand AS brand
        FROM lineitem JOIN part ON p_partkey = l_partkey
        WHERE l_orderkey IS NOT NULL AND p_brand IS NOT NULL
    ), n_orders AS (
        SELECT CAST(COUNT(DISTINCT okey) AS BIGINT) AS n FROM items
    ), brand_support AS (
        SELECT brand, CAST(COUNT(*) AS BIGINT) AS s FROM items GROUP BY brand
    ), pair_support AS (
        SELECT a.brand AS brand_a, b.brand AS brand_b,
               CAST(COUNT(*) AS BIGINT) AS pair_s
        FROM items a JOIN items b
          ON a.okey = b.okey AND a.brand < b.brand
        GROUP BY 1, 2
        HAVING COUNT(*) >= {BASKET_MIN_SUPPORT}
    )
    SELECT p.brand_a AS brand_a, p.brand_b AS brand_b,
           p.pair_s AS pair_support,
           sa.s AS support_a, sb.s AS support_b,
           CAST(floor(10000.0 * p.pair_s / sa.s + 0.5) AS BIGINT)
               AS conf_a_to_b_x10k,
           CAST(floor(10000.0 * p.pair_s / sb.s + 0.5) AS BIGINT)
               AS conf_b_to_a_x10k,
           CAST(floor(10000.0 * p.pair_s * n.n
                      / (CAST(sa.s AS DOUBLE) * sb.s) + 0.5) AS BIGINT)
               AS lift_x10k
    FROM pair_support p
    JOIN brand_support sa ON sa.brand = p.brand_a
    JOIN brand_support sb ON sb.brand = p.brand_b
    CROSS JOIN n_orders n
    """,
)
def market_basket_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brand co-purchase rules with support/confidence/lift. ONE keyed
    exchange builds per-order sorted brand sets (collect_set inside the
    aggregate is the distinct); pair generation is then a scan-side
    array-combination expression over each basket (JVM higher-order
    transforms — no self-join, which would shuffle the items frame
    twice), and every aggregate after it is brand- or pair-grain with
    map-side combine. The persisted basket frame feeds all three stats."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    from cliqz_etl_spark.operators.cache import track
    baskets = track(
        li.where(F.col("l_orderkey").isNotNull())
        .join(F.broadcast(part.where(F.col("p_brand").isNotNull())
                          .select("p_partkey", "p_brand")),
              F.col("l_partkey") == F.col("p_partkey"))
        .groupBy(F.col("l_orderkey").alias("okey"))
        .agg(F.array_sort(F.collect_set("p_brand")).alias("bs"))
        .persist())
    n_orders = baskets.agg(F.count(F.lit(1)).cast("long").alias("n"))
    # persisted: the brand-sized support frame broadcasts TWICE (sa, sb)
    # — unpersisted, the basket explode+groupBy behind it ran per side
    brand_support = track(
        baskets.select(F.explode("bs").alias("brand"))
        .groupBy("brand")
        .agg(F.count(F.lit(1)).cast("long").alias("s")).persist())
    # all i<j combinations of the sorted basket, scan-side
    pairs_expr = F.flatten(F.transform(
        "bs", lambda x, i: F.transform(
            F.slice("bs", i + 2, F.size("bs")),
            lambda y: F.struct(x.alias("brand_a"), y.alias("brand_b")))))
    pair_support = (baskets.select(F.explode(pairs_expr).alias("p"))
                    .groupBy(F.col("p.brand_a").alias("brand_a"),
                             F.col("p.brand_b").alias("brand_b"))
                    .agg(F.count(F.lit(1)).cast("long").alias("pair_s"))
                    .where(F.col("pair_s") >= BASKET_MIN_SUPPORT))
    sa = brand_support.select(F.col("brand").alias("brand_a"),
                              F.col("s").alias("support_a"))
    sb = brand_support.select(F.col("brand").alias("brand_b"),
                              F.col("s").alias("support_b"))
    return (pair_support
            .join(F.broadcast(sa), ["brand_a"])
            .join(F.broadcast(sb), ["brand_b"])
            .crossJoin(F.broadcast(n_orders))
            .select(
                "brand_a", "brand_b",
                F.col("pair_s").alias("pair_support"),
                "support_a", "support_b",
                F.floor(F.lit(10000.0) * F.col("pair_s") / F.col("support_a")
                        + F.lit(0.5)).cast("long").alias("conf_a_to_b_x10k"),
                F.floor(F.lit(10000.0) * F.col("pair_s") / F.col("support_b")
                        + F.lit(0.5)).cast("long").alias("conf_b_to_a_x10k"),
                F.floor(F.lit(10000.0) * F.col("pair_s") * F.col("n")
                        / (F.col("support_a").cast("double")
                           * F.col("support_b"))
                        + F.lit(0.5)).cast("long").alias("lift_x10k")))


# --------------------------------------------------------------------------
# TPC-H Q2 shape: min-cost supplier. The driver schema has no partsupp, so
# the observed supply cost per (part, supplier) is the minimum unit price
# seen on any lineitem (quantized to cents BEFORE the min, so Spark and
# DuckDB agree bit-for-bit). TPC-H's correlated scalar subquery becomes
# aggregate-then-self-join: one pass builds per-pair costs, a reuse of that
# aggregate finds the per-part minimum, and an equi-join keeps the
# winner(s) — no correlated re-scan of the fact table, which is the only
# shape that survives at 100 TB. Ref: extension surface; join idiom per
# /root/reference/cliqz_etl/profile_daily.py:16-39.
# --------------------------------------------------------------------------
@query(
    "min_cost_supplier",
    oracle="""
    WITH eur_supp AS (
        SELECT s_suppkey, s_name, n_name
        FROM supplier s
        JOIN nation n ON s.s_nationkey = n.n_nationkey
        JOIN region r ON n.n_regionkey = r.r_regionkey
        WHERE r.r_name = 'EUROPE'
    ),
    costs AS (
        SELECT l_partkey, l_suppkey,
               MIN(CAST(floor(l_extendedprice / l_quantity * 100 + 0.5)
                        AS BIGINT)) AS cost_cents
        FROM lineitem
        WHERE l_suppkey IN (SELECT s_suppkey FROM eur_supp)
        GROUP BY l_partkey, l_suppkey
    ),
    best AS (
        SELECT l_partkey, MIN(cost_cents) AS min_cost
        FROM costs GROUP BY l_partkey
    )
    SELECT p.p_partkey AS p_partkey, p.p_name AS p_name,
           e.s_name AS s_name, e.n_name AS n_name,
           c.cost_cents AS cost_cents
    FROM costs c
    JOIN best b ON c.l_partkey = b.l_partkey AND c.cost_cents = b.min_cost
    JOIN part p ON p.p_partkey = c.l_partkey AND p.p_size <= 10
    JOIN eur_supp e ON e.s_suppkey = c.l_suppkey
    """,
)
def min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """For every small part (p_size <= 10), the European supplier(s) whose
    observed unit price is the part's minimum. Ties all survive (the
    compare is order-insensitive). Dimension chain supplier->nation->region
    is broadcast; the per-pair cost aggregate shuffles once on
    (partkey, suppkey); the per-part min reuses that tiny aggregate."""
    li = load_table(spark, sf_dir, "lineitem")
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region").where(F.col("r_name") == "EUROPE")
    part = load_table(spark, sf_dir, "part").where(F.col("p_size") <= 10)

    eur_supp = (
        supp.join(F.broadcast(nation),
                  supp.s_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .select("s_suppkey", "s_name", "n_name")
    )
    unit_cents = F.floor(
        F.col("l_extendedprice") / F.col("l_quantity") * 100 + F.lit(0.5)
    ).cast("long")
    costs = (
        li.join(F.broadcast(eur_supp.select("s_suppkey")),
                li.l_suppkey == F.col("s_suppkey"), "left_semi")
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.min(unit_cents).alias("cost_cents"))
    )
    # per-part minimum via a PARTITIONED window over the (part, supplier)
    # aggregate — one extra exchange on l_partkey, and lineitem is scanned
    # exactly once (a groupBy-then-self-join re-derives the whole fact
    # subtree; exchange reuse is runtime-best-effort, this shape never
    # needs it)
    from pyspark.sql.window import Window
    per_part = Window.partitionBy("l_partkey")
    winners = (
        costs.withColumn("min_cost", F.min("cost_cents").over(per_part))
        .where(F.col("cost_cents") == F.col("min_cost"))
    )
    return (
        winners.join(F.broadcast(part), winners.l_partkey == part.p_partkey)
        .join(F.broadcast(eur_supp), winners.l_suppkey == F.col("s_suppkey"))
        .select("p_partkey", "p_name", "s_name", "n_name", "cost_cents")
    )


# --------------------------------------------------------------------------
# TPC-H Q9 shape: product-line profit rollup by nation and year. Supply
# cost is proxied by the part's retail price (no partsupp table): profit =
# revenue cents minus a 10%-of-retail-times-quantity cost, both quantized
# per row. Every dimension (filtered part, supplier, nation) broadcasts;
# the only shuffles are the lineitem-orders fact join and the final
# (nation, year) aggregate.
# --------------------------------------------------------------------------
@query(
    "product_profit_rollup",
    oracle="""
    SELECT n.n_name AS n_name,
           strftime(o.o_orderdate, '%Y') AS o_year,
           CAST(SUM(
               CAST(floor(l.l_extendedprice * (1 - l.l_discount) * 100 + 0.5)
                    AS BIGINT)
             - CAST(floor(p.p_retailprice * l.l_quantity * 0.1 * 100 + 0.5)
                    AS BIGINT)) AS BIGINT) AS profit_cents,
           COUNT(*) AS n_lines
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey AND p.p_name LIKE '%red%'
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
    JOIN nation n ON n.n_nationkey = s.s_nationkey
    JOIN orders o ON o.o_orderkey = l.l_orderkey
    GROUP BY n_name, o_year
    """,
)
def product_profit_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Profit on 'red' parts by supplier nation and order year."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").where(
        F.col("p_name").like("%red%")).select("p_partkey", "p_retailprice")
    supp = load_table(spark, sf_dir, "supplier").select(
        "s_suppkey", "s_nationkey")
    nation = load_table(spark, sf_dir, "nation").select(
        "n_nationkey", "n_name")
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate")

    profit = (
        _revenue_cents()
        - F.floor(F.col("p_retailprice") * F.col("l_quantity") * 0.1 * 100
                  + F.lit(0.5)).cast("long")
    )
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy(F.col("n_name"),
                 F.date_format("o_orderdate", "yyyy").alias("o_year"))
        .agg(F.sum(profit).cast("long").alias("profit_cents"),
             F.count(F.lit(1)).alias("n_lines"))
    )


# --------------------------------------------------------------------------
# TPC-H Q11 shape: important stock. Per-part line value for one nation's
# suppliers, keeping parts whose share exceeds 0.1% of the nation total.
# The HAVING-vs-scalar-subquery becomes an integer cross-multiplied filter
# against a broadcast 1-row aggregate — value*1000 > total — so no
# float division has to agree across engines, and the grouped frame is
# scanned once (Spark reuses it via the broadcast total, not a re-scan).
# --------------------------------------------------------------------------
@query(
    "important_part_value",
    oracle="""
    WITH v AS (
        SELECT l_partkey,
               SUM(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT))
                   AS value_cents
        FROM lineitem
        WHERE l_suppkey IN (SELECT s_suppkey FROM supplier s
                            JOIN nation n ON s.s_nationkey = n.n_nationkey
                            WHERE n.n_name = 'NATION_7')
        GROUP BY l_partkey
    )
    SELECT l_partkey AS l_partkey,
           CAST(value_cents AS BIGINT) AS value_cents
    FROM v
    WHERE value_cents * 1000 > (SELECT SUM(value_cents) FROM v)
    """,
)
def important_part_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Parts holding >0.1% of NATION_7 suppliers' total line value."""
    li = load_table(spark, sf_dir, "lineitem")
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation").where(
        F.col("n_name") == "NATION_7")
    nat_supp = supp.join(
        F.broadcast(nation), supp.s_nationkey == nation.n_nationkey
    ).select("s_suppkey")
    from cliqz_etl_spark.operators.dedup import _materialize

    # materialized: the part-value frame feeds the totals aggregate AND
    # the threshold filter — unpersisted, the lineitem semi-join+groupBy
    # ran twice
    vals = _materialize(
        li.join(F.broadcast(nat_supp), li.l_suppkey == F.col("s_suppkey"),
                "left_semi")
        .groupBy("l_partkey")
        .agg(F.sum(_cents(F.col("l_extendedprice"))).cast("long")
             .alias("value_cents"))
    )
    total = vals.agg(F.sum("value_cents").cast("long").alias("total_cents"))
    return (
        vals.crossJoin(F.broadcast(total))
        .where(F.col("value_cents") * 1000 > F.col("total_cents"))
        .select("l_partkey", "value_cents")
    )


# --------------------------------------------------------------------------
# TPC-H Q20 shape: part promotion via nested semi-joins. Suppliers in ASIA
# who shipped more than 50 units of any single 'small' part during 1997
# (qty caps at 50 per line, so qualifying needs repeat business — the
# availqty>half-shipped predicate inverted for a schema with no partsupp).
# Both inner filters collapse to semi-joins: lineitem is semi-joined to
# the filtered part keys (broadcast), and supplier is semi-joined to the
# qualifying supplier keys (broadcast — the aggregate output is tiny).
# --------------------------------------------------------------------------
@query(
    "promotable_part_suppliers",
    oracle="""
    SELECT s.s_suppkey AS s_suppkey, s.s_name AS s_name, n.n_name AS n_name
    FROM supplier s
    JOIN nation n ON s.s_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    WHERE r.r_name = 'ASIA'
      AND s.s_suppkey IN (
        SELECT l_suppkey FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1997-01-01'
          AND l_shipdate < TIMESTAMP '1998-01-01'
          AND l_partkey IN (SELECT p_partkey FROM part
                            WHERE p_name LIKE 'small%')
        GROUP BY l_suppkey, l_partkey
        HAVING SUM(CAST(l_quantity AS BIGINT)) > 50)
    """,
)
def promotable_part_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ASIA suppliers with >50 units of one 'small' part shipped in 1997."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").where(
        F.col("p_name").like("small%")).select("p_partkey")
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region").where(F.col("r_name") == "ASIA")

    qualifying = (
        li.where((F.col("l_shipdate") >= F.lit("1997-01-01"))
                 & (F.col("l_shipdate") < F.lit("1998-01-01")))
        .join(F.broadcast(part), li.l_partkey == part.p_partkey, "left_semi")
        .groupBy("l_suppkey", "l_partkey")
        .agg(F.sum(F.col("l_quantity").cast("long")).alias("qty"))
        .where(F.col("qty") > 50)
        .select("l_suppkey").distinct()
    )
    return (
        supp.join(F.broadcast(qualifying), supp.s_suppkey == F.col("l_suppkey"),
                  "left_semi")
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .select("s_suppkey", "s_name", "n_name")
    )

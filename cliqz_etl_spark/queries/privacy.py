"""Privacy / PII queries: typed PII scanning over the document corpus,
salted pseudonymization of direct identifiers, and k-anonymity
suppression over quasi-identifier groups.

The reference pipeline's scrubbing surface is a single masking pattern
(see queries/curation.py::mask_terms); a pretraining-data engine needs the
typed version — per-class detection so PII rates are monitorable per
source, class-token redaction so downstream filters can key on
``<EMAIL>``/``<SSN>``, and the pseudonymize/generalize/suppress trio for
structured tables. All three queries are scan-shaped: the regex bank and
hashes run inside whole-stage codegen on the scan, and the only shuffles
are tiny aggregates (per-source rollup; quasi-cell sizes joined back via
broadcast). At 100 TB each is one pass over the data with no full-table
shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cliqz_etl_spark.functions.privacy import (
    PII_CLASSES,
    pii_count,
    pii_count_sql,
    pseudonym,
    pseudonym_sql,
    redact_pii,
    redact_pii_sql,
    value_band,
    value_band_sql,
)
from cliqz_etl_spark.functions.hashing import md5_long_seeded_sql
from cliqz_etl_spark.queries import query
from cliqz_etl_spark.tables import load_table

PSEUDO_SALT = "graft-2026"   # deployment-secret stand-in; constant so the
                             # oracle can replay it
BAL_BAND_WIDTH = 1000        # acctbal generalization width (currency units)
K_ANON = 10                  # minimum quasi-identifier group size


# ---------------------------------------------------------------------------
# Per-source PII scan: the monitoring query a curation pipeline runs before
# releasing a crawl snapshot. One scan projecting (source, text); per-class
# regexp_count columns fold map-side into a |sources|-row aggregate.
# ---------------------------------------------------------------------------
_scan_counts = ", ".join(
    f"CAST(SUM({pii_count_sql('text', pat)}) AS BIGINT) AS n_{name}"
    for name, pat in PII_CLASSES
)
_scan_any = " + ".join(pii_count_sql("text", pat) for _, pat in PII_CLASSES)


@query(
    "pii_scan_docs",
    oracle=f"""
    SELECT source AS source,
           {_scan_counts},
           CAST(COUNT(*) FILTER (WHERE {_scan_any} > 0) AS BIGINT) AS docs_with_pii,
           CAST(COUNT(*) AS BIGINT) AS n_docs
    FROM documents
    GROUP BY source
    """,
    doc="Per-source counts of each PII class (email/ip/phone/ssn/cc).",
)
def pii_scan_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The synthetic corpus is digit-free, so every count is zero here —
    the regex-bank semantics are pinned instead by the crafted-string
    parity fixtures in tests/test_privacy.py (Spark and DuckDB byte-equal
    on strings that DO contain PII), the same split as multimodal: corpus
    query proves the plumbing, fixtures prove the operator."""
    docs = load_table(spark, sf_dir, "documents")
    counts = [pii_count("text", pat).alias(f"c_{name}") for name, pat in PII_CLASSES]
    per_doc = docs.select("source", *counts)
    any_pii = sum(F.col(f"c_{name}") for name, _ in PII_CLASSES)
    aggs = [F.sum(f"c_{name}").cast("long").alias(f"n_{name}")
            for name, _ in PII_CLASSES]
    return per_doc.groupBy("source").agg(
        *aggs,
        F.count(F.when(any_pii > 0, True)).cast("long").alias("docs_with_pii"),
        F.count(F.lit(1)).cast("long").alias("n_docs"),
    )


# ---------------------------------------------------------------------------
# Pseudonymize: direct identifier -> salted SHA-256; continuous attribute
# -> band; analytic columns pass through. Pure projection, zero shuffle,
# join-preserving (same salt => same pseudonym across tables).
# ---------------------------------------------------------------------------
@query(
    "pseudonymize_customers",
    oracle=f"""
    SELECT c_custkey AS c_custkey,
           {pseudonym_sql('c_name', PSEUDO_SALT)} AS pseudonym,
           {value_band_sql('c_acctbal', BAL_BAND_WIDTH)} AS bal_band,
           c_mktsegment AS c_mktsegment
    FROM customer
    """,
    doc="Salted-hash pseudonymization + value generalization per customer.",
)
def pseudonymize_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    return cust.select(
        "c_custkey",
        pseudonym("c_name", PSEUDO_SALT).alias("pseudonym"),
        value_band("c_acctbal", BAL_BAND_WIDTH).alias("bal_band"),
        "c_mktsegment",
    )


# ---------------------------------------------------------------------------
# k-anonymity suppression: a row's quasi-identifier tuple (nation, market
# segment) is released only if >= K_ANON rows share it; smaller groups are
# suppressed (quasi columns NULLed) but kept, so counts stay right.
# Cell sizes come from a groupBy producing a |nations x segments|-row
# frame that broadcast-joins back onto the scan — the fact table itself is
# never shuffled, which is the whole trick at 100 TB (a window over the
# quasi key would shuffle every row).
# ---------------------------------------------------------------------------
@query(
    "k_anonymize_customers",
    oracle=f"""
    WITH cells AS (
        SELECT c_nationkey, c_mktsegment, COUNT(*) AS group_size
        FROM customer GROUP BY 1, 2
    )
    SELECT c.c_custkey AS c_custkey,
           CASE WHEN g.group_size >= {K_ANON}
                THEN CAST(c.c_nationkey AS BIGINT) END AS nation_q,
           CASE WHEN g.group_size >= {K_ANON}
                THEN c.c_mktsegment END AS segment_q,
           CAST(g.group_size AS BIGINT) AS group_size,
           g.group_size < {K_ANON} AS suppressed
    FROM customer c
    JOIN cells g ON g.c_nationkey = c.c_nationkey
                AND g.c_mktsegment = c.c_mktsegment
    """,
    doc=f"k-anonymity (k={K_ANON}) suppression over (nation, segment).",
)
def k_anonymize_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    cells = (
        cust.groupBy("c_nationkey", "c_mktsegment")
        .agg(F.count(F.lit(1)).alias("group_size"))
    )
    ok = F.col("group_size") >= K_ANON
    return (
        cust.join(F.broadcast(cells), ["c_nationkey", "c_mktsegment"])
        .select(
            "c_custkey",
            F.when(ok, F.col("c_nationkey").cast("long")).alias("nation_q"),
            F.when(ok, F.col("c_mktsegment")).alias("segment_q"),
            F.col("group_size").cast("long").alias("group_size"),
            (~ok).alias("suppressed"),
        )
    )


# --------------------------------------------------------------------------
# GDPR/CCPA deletion propagation — the right-to-be-forgotten cascade
# every compliance pipeline runs: a (small) deletion-request set of
# subjects fans out through the foreign-key graph (customer -> orders ->
# lineitems), and the job's deliverable is the per-nation AUDIT of what
# each table would lose — the count evidence a DPO signs off before the
# anti-join rewrite executes. Request set here: c_custkey % 37 = 0 (the
# deterministic stand-in for a request table). At 100 TB the request
# side is tiny by nature, so it broadcasts into the orders scan; only
# the affected orders (a small fraction) key the lineitem join, and
# every aggregate is nation-sized.
# --------------------------------------------------------------------------
DELETE_MOD = 37


@query(
    "deletion_propagation",
    oracle=f"""
    WITH req AS (
        SELECT c_custkey, c_nationkey FROM customer
        WHERE c_custkey % {DELETE_MOD} = 0
    ), ordd AS (
        SELECT r.c_nationkey, o.o_orderkey
        FROM req r JOIN orders o ON o.o_custkey = r.c_custkey
    ), lid AS (
        SELECT d.c_nationkey
        FROM ordd d JOIN lineitem l ON l.l_orderkey = d.o_orderkey
    ), c AS (
        SELECT c_nationkey, CAST(count(*) AS BIGINT) AS n_customers
        FROM req GROUP BY 1
    ), o AS (
        SELECT c_nationkey, CAST(count(*) AS BIGINT) AS n_orders
        FROM ordd GROUP BY 1
    ), l AS (
        SELECT c_nationkey, CAST(count(*) AS BIGINT) AS n_lineitems
        FROM lid GROUP BY 1
    )
    SELECT c.c_nationkey AS nationkey, c.n_customers AS n_customers,
           CAST(COALESCE(o.n_orders, 0) AS BIGINT) AS n_orders,
           CAST(COALESCE(l.n_lineitems, 0) AS BIGINT) AS n_lineitems
    FROM c LEFT JOIN o USING (c_nationkey) LEFT JOIN l USING (c_nationkey)
    """,
)
def deletion_propagation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-nation audit of the deletion cascade for the request set.

    Plan shape: the request projection broadcasts into orders; affected
    orders key one join into lineitem; three nation-sized aggregates
    recombine with broadcast left joins. Nations whose requested
    customers placed no orders still report (n_orders = 0)."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    req = (cust.where(F.col("c_custkey") % DELETE_MOD == 0)
           .select("c_custkey", "c_nationkey"))
    ordd = (orders.join(F.broadcast(req),
                        orders["o_custkey"] == req["c_custkey"])
            .select("c_nationkey", "o_orderkey"))
    lid = (li.join(ordd, li["l_orderkey"] == ordd["o_orderkey"])
           .select("c_nationkey"))
    c = req.groupBy("c_nationkey").agg(
        F.count(F.lit(1)).cast("long").alias("n_customers"))
    o = ordd.groupBy("c_nationkey").agg(
        F.count(F.lit(1)).cast("long").alias("n_orders"))
    ll = lid.groupBy("c_nationkey").agg(
        F.count(F.lit(1)).cast("long").alias("n_lineitems"))
    return (c.join(F.broadcast(o), "c_nationkey", "left")
            .join(F.broadcast(ll), "c_nationkey", "left")
            .select(F.col("c_nationkey").alias("nationkey"),
                    "n_customers",
                    F.coalesce("n_orders", F.lit(0)).cast("long")
                    .alias("n_orders"),
                    F.coalesce("n_lineitems", F.lit(0)).cast("long")
                    .alias("n_lineitems")))


__all__ = ["pii_scan_docs", "pseudonymize_customers", "k_anonymize_customers",
           "deletion_propagation", "l_diversity_audit",
           "redact_pii", "redact_pii_sql"]


# --------------------------------------------------------------------------
# l-diversity audit — k-anonymity's necessary complement: a cell can be
# k-large yet leak the sensitive attribute outright when every member
# shares one value (the classic homogeneity attack). Per quasi-identifier
# cell (nation, segment), count DISTINCT sensitive values (the banded
# balance) and flag cells below L. Two chained groupBys, both map-side
# combined; the second runs over the |cells x bands| frame, never the
# fact table.
# --------------------------------------------------------------------------
L_DIVERSE = 3


@query(
    "l_diversity_audit",
    oracle=f"""
    WITH bands AS (
        SELECT c_nationkey, c_mktsegment,
               {value_band_sql('c_acctbal', BAL_BAND_WIDTH)} AS bal_band
        FROM customer
    ), cells AS (
        SELECT c_nationkey, c_mktsegment,
               CAST(COUNT(*) AS BIGINT) AS group_size,
               CAST(COUNT(DISTINCT bal_band) AS BIGINT) AS n_sensitive
        FROM bands GROUP BY 1, 2
    )
    SELECT CAST(c_nationkey AS BIGINT) AS nation_q,
           c_mktsegment AS segment_q,
           group_size AS group_size,
           n_sensitive AS n_sensitive,
           n_sensitive >= {L_DIVERSE} AS l_diverse
    FROM cells
    """,
    doc=f"distinct-l diversity (l={L_DIVERSE}) of banded balances per "
        "(nation, segment) cell.",
)
def l_diversity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    bands = cust.select(
        "c_nationkey", "c_mktsegment",
        value_band("c_acctbal", BAL_BAND_WIDTH).alias("bal_band"))
    return (bands.groupBy("c_nationkey", "c_mktsegment")
            .agg(F.count(F.lit(1)).cast("long").alias("group_size"),
                 F.countDistinct("bal_band").cast("long").alias("n_sensitive"))
            .select(F.col("c_nationkey").cast("long").alias("nation_q"),
                    F.col("c_mktsegment").alias("segment_q"),
                    "group_size", "n_sensitive",
                    (F.col("n_sensitive") >= L_DIVERSE).alias("l_diverse")))


# --------------------------------------------------------------------------
# Differentially-private histogram release (Laplace mechanism over
# per-type event counts, sensitivity 1, epsilon = 0.5). The noise draw is
# SEEDED — inverse-CDF Laplace over an md5-derived uniform — so the
# release replays bit-identically on both engines and across reruns: the
# property a privacy pipeline needs under test, and the one thing a real
# deployment must then change (swap the hash-uniform for a CSPRNG draw;
# a replayable release is NOT differentially private, because the
# adversary can replay it). Counts are exact; the noise is one shared
# IEEE-double expression tree (the token_pmi ln discipline) milli-
# quantized at the end.
# --------------------------------------------------------------------------
DP_EPS_MILLI = 500          # epsilon = 0.5 -> Laplace scale b = 1/eps = 2.0
_DP_SEED = 11

_DP_U = "((CAST({h} AS DOUBLE) + 0.5) / 1152921504606846976.0)"  # (0,1)
_DP_NOISE = ("(-2.0 * sign({u} - 0.5) "
             "* ln(1.0 - 2.0 * abs({u} - 0.5)))")


def _dp_noisy_milli(h_expr: str) -> str:
    u = _DP_U.format(h=h_expr)
    noise = _DP_NOISE.format(u=u)
    return (f"CAST(floor(1000 * (CAST(n AS DOUBLE) + {noise}) + 0.5) "
            f"AS BIGINT)")


@query(
    "dp_noisy_event_counts",
    oracle=f"""
    WITH c AS (
        SELECT event_type, CAST(count(*) AS BIGINT) AS n
        FROM events GROUP BY event_type
    )
    SELECT event_type AS event_type,
           n AS true_count,
           {_dp_noisy_milli(md5_long_seeded_sql("event_type", _DP_SEED))}
               AS noisy_milli,
           CAST({DP_EPS_MILLI} AS BIGINT) AS epsilon_milli
    FROM c
    """,
    doc="Laplace-mechanism histogram release over event-type counts "
        "(seeded/replayable noise for pipeline testing).",
)
def dp_noisy_event_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Plan shape: ONE partially-aggregated groupBy over events (5-ish
    keys), then per-row scalar noise on the tiny grouped frame — the
    noise never touches the corpus-sized stage. A NULL event_type group
    propagates NULL noise identically on both engines (md5(NULL) is
    NULL; fuzz contract)."""
    from cliqz_etl_spark.functions.hashing import md5_long_seeded

    ev = load_table(spark, sf_dir, "events")
    c = ev.groupBy("event_type").agg(F.count(F.lit(1)).cast("long").alias("n"))
    h = md5_long_seeded(F.col("event_type"), _DP_SEED)
    return (c.withColumn("__h", h)
            .select("event_type", F.col("n").alias("true_count"),
                    F.expr(_dp_noisy_milli("__h")).alias("noisy_milli"),
                    F.lit(DP_EPS_MILLI).cast("long").alias("epsilon_milli")))


# --------------------------------------------------------------------------
# t-closeness audit — the third rung of the k/l/t ladder: a cell can be
# k-large AND l-diverse yet still leak by SKEW (90% of one band where
# the population holds 10%). Per quasi-cell, the total variation
# distance between the cell's banded-balance distribution and the
# global one, in exact integer cross-multiplied arithmetic:
#   TVD = 1/2 * sum_b |n_cb/n_c - n_b/N|
#       = (sum_{b in cell} (|n_cb*N - n_b*n_c| - n_b*n_c) + n_c*N)
#         / (2*n_c*N)
# — the second form needs only the (cell, band) rows that EXIST (absent
# bands contribute n_b*n_c each, and sum_b n_b = N collapses their sum
# to n_c*N), so no cell x band dense grid ever materializes. One
# (cell, band) groupBy over rows carrying the sensitive attribute; the
# band totals and cell totals are tiny rollups OF that frame that
# broadcast back; permille quantization is exact integer floor division
# (positive operands, Spark div = DuckDB //).
# --------------------------------------------------------------------------
T_CLOSE_MILLI = 200     # release threshold: TVD <= 0.2


@query(
    "t_closeness_audit",
    oracle=f"""
    WITH base AS (
        SELECT c_nationkey, c_mktsegment,
               {value_band_sql('c_acctbal', BAL_BAND_WIDTH)} AS bal_band
        FROM customer WHERE c_acctbal IS NOT NULL
    ), cb AS (
        SELECT c_nationkey, c_mktsegment, bal_band,
               CAST(count(*) AS BIGINT) AS n_cb
        FROM base GROUP BY 1, 2, 3
    ), cells AS (
        SELECT c_nationkey, c_mktsegment, CAST(SUM(n_cb) AS BIGINT) AS n_c
        FROM cb GROUP BY 1, 2
    ), bandtot AS (
        SELECT bal_band, CAST(SUM(n_cb) AS BIGINT) AS n_b FROM cb GROUP BY 1
    ), tot AS (
        SELECT CAST(SUM(n_cb) AS BIGINT) AS n FROM cb
    ), terms AS (
        SELECT cb.c_nationkey, cb.c_mktsegment,
               g.n_c,
               t.n,
               abs(cb.n_cb * t.n - b.n_b * g.n_c) - b.n_b * g.n_c AS term
        FROM cb
        JOIN bandtot b ON b.bal_band = cb.bal_band
        JOIN cells g ON g.c_nationkey = cb.c_nationkey
                    AND g.c_mktsegment = cb.c_mktsegment
        CROSS JOIN tot t
    )
    SELECT CAST(c_nationkey AS BIGINT) AS nation_q,
           c_mktsegment AS segment_q,
           CAST(MAX(n_c) AS BIGINT) AS group_size,
           CAST((1000 * (SUM(term) + MAX(n_c) * MAX(n)))
                // (2 * MAX(n_c) * MAX(n)) AS BIGINT) AS tvd_milli,
           (1000 * (SUM(term) + MAX(n_c) * MAX(n)))
               // (2 * MAX(n_c) * MAX(n)) <= {T_CLOSE_MILLI} AS t_close
    FROM terms GROUP BY 1, 2
    """,
    doc=f"t-closeness (TVD permille, threshold {T_CLOSE_MILLI}) of banded "
        "balances per (nation, segment) cell vs the global distribution.",
)
def t_closeness_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rows lacking the sensitive attribute (NULL c_acctbal) are excluded
    from the distribution on both engines — a NULL band is not a value
    the adversary learns. Integer envelope: n_cb*N stays in BIGINT up to
    ~3e9 attributed rows; past that pre-scale the band counts (the
    acf_daily_revenue move).

    Plan shape: ONE data-sized groupBy to the (cell, band) frame; cells
    and band totals are rollups of that frame (dimension-sized), joined
    back broadcast; the audit aggregate is cell-count-sized."""
    cust = load_table(spark, sf_dir, "customer")
    from cliqz_etl_spark.functions.privacy import value_band

    base = (cust.where(F.col("c_acctbal").isNotNull())
            .select("c_nationkey", "c_mktsegment",
                    value_band("c_acctbal", BAL_BAND_WIDTH).alias("bal_band")))
    from cliqz_etl_spark.operators.dedup import _materialize

    # The (cell, band) frame feeds FOUR consumers (terms, cells, band
    # totals, grand total) — without pinning it, each branch re-scans
    # the fact table (measured: 4 FileScans / 8 exchanges at sf0.001).
    cb = _materialize(
        base.groupBy("c_nationkey", "c_mktsegment", "bal_band")
        .agg(F.count(F.lit(1)).cast("long").alias("n_cb")))
    cells = (cb.groupBy("c_nationkey", "c_mktsegment")
             .agg(F.sum("n_cb").cast("long").alias("n_c")))
    bandtot = cb.groupBy("bal_band").agg(F.sum("n_cb").cast("long").alias("n_b"))
    tot = cb.agg(F.sum("n_cb").cast("long").alias("n"))
    terms = (cb.join(F.broadcast(bandtot), "bal_band")
             .join(F.broadcast(cells), ["c_nationkey", "c_mktsegment"])
             .crossJoin(F.broadcast(tot))
             .select("c_nationkey", "c_mktsegment", "n_c", "n",
                     (F.abs(F.col("n_cb") * F.col("n")
                            - F.col("n_b") * F.col("n_c"))
                      - F.col("n_b") * F.col("n_c")).alias("term")))
    tvd_scaled = F.sum("term") + F.max("n_c") * F.max("n")
    denom = F.lit(2) * F.max("n_c") * F.max("n")
    return (terms.groupBy("c_nationkey", "c_mktsegment")
            .agg(F.max("n_c").cast("long").alias("group_size"),
                 (F.lit(1000) * tvd_scaled).alias("__num"),
                 denom.alias("__den"))
            .select(F.col("c_nationkey").cast("long").alias("nation_q"),
                    F.col("c_mktsegment").alias("segment_q"),
                    "group_size",
                    F.expr("__num div __den").cast("long").alias("tvd_milli"),
                    (F.expr("__num div __den") <= T_CLOSE_MILLI)
                    .alias("t_close")))


# --------------------------------------------------------------------------
# Erasure-impact audit (GDPR art.17 "right to be forgotten"): given a
# forget-list of subjects, report every row the cascade would purge —
# direct customer rows, their orders, the orders' lineitems (two hops),
# and the subjects' event streams — BEFORE running the destructive
# rewrite. The forget-list here is the deterministic 1-in-97 key sample;
# production passes an explicit list. Each hop is a semi-join: the one-hop
# sets ride AQE-sized joins (a forget-list can be millions of subjects —
# never force-broadcast it), the two-hop lineitem purge joins on the
# ALREADY-FILTERED order keys so the big fact only shuffles against the
# affected slice.
# --------------------------------------------------------------------------
@query(
    "forget_cascade_audit",
    oracle="""
    WITH forget AS (
        SELECT c_custkey FROM customer WHERE c_custkey % 97 = 0
    ), o_hit AS (
        SELECT o_orderkey, o_custkey FROM orders
        WHERE o_custkey IN (SELECT c_custkey FROM forget)
    )
    SELECT 'customer' AS table_name,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(COUNT(DISTINCT c_custkey) AS BIGINT) AS n_keys
    FROM forget
    UNION ALL
    SELECT 'orders', CAST(COUNT(*) AS BIGINT),
           CAST(COUNT(DISTINCT o_custkey) AS BIGINT)
    FROM o_hit
    UNION ALL
    SELECT 'lineitem', CAST(COUNT(*) AS BIGINT),
           CAST(COUNT(DISTINCT l_orderkey) AS BIGINT)
    FROM lineitem WHERE l_orderkey IN (SELECT o_orderkey FROM o_hit)
    UNION ALL
    SELECT 'events', CAST(COUNT(*) AS BIGINT),
           CAST(COUNT(DISTINCT user_id) AS BIGINT)
    FROM events WHERE user_id IN (SELECT c_custkey FROM forget)
    """,
)
def forget_cascade_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-table purge counts for an erasure cascade over a forget-list
    of customers: direct rows, one-hop orders/events, two-hop lineitems.
    All semi-joins, no forced broadcasts (forget-lists scale), and the
    two-hop purge filters orders FIRST so lineitem only shuffles against
    the affected keys."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    ev = load_table(spark, sf_dir, "events")

    from cliqz_etl_spark.operators.cache import track

    # forget feeds three consumers (o_hit, ev_hit, its own audit leg) and
    # o_hit two (li_hit, its audit leg): persisted, each upstream
    # scan+semi-join runs once instead of per consumer
    forget = track(cust.where(F.col("c_custkey") % 97 == 0)
                   .select("c_custkey").persist())
    o_hit = track(orders.join(forget, orders.o_custkey == forget.c_custkey,
                              "left_semi")
                  .select("o_orderkey", "o_custkey").persist())
    li_hit = li.join(o_hit.select("o_orderkey"),
                     li.l_orderkey == F.col("o_orderkey"), "left_semi")
    ev_hit = ev.join(forget, ev.user_id == forget.c_custkey, "left_semi")

    def audit(name: str, df: DataFrame, key: str) -> DataFrame:
        return df.agg(
            F.count(F.lit(1)).cast("long").alias("n_rows"),
            F.countDistinct(key).cast("long").alias("n_keys"),
        ).select(F.lit(name).alias("table_name"), "n_rows", "n_keys")

    parts = [
        audit("customer", forget, "c_custkey"),
        audit("orders", o_hit, "o_custkey"),
        audit("lineitem", li_hit, "l_orderkey"),
        audit("events", ev_hit, "user_id"),
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out

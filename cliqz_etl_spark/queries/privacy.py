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


__all__ = ["pii_scan_docs", "pseudonymize_customers", "k_anonymize_customers",
           "redact_pii", "redact_pii_sql"]

"""Privacy operators: the corpus is digit-free, so the PII regex bank's
semantics are pinned here on crafted strings — every fixture is run
through BOTH engines (Spark Java-regex / sha2 and DuckDB RE2 / sha256)
and must agree byte-for-byte, the same cross-engine contract style as
the clean_cast suite (tests/test_properties.py)."""

from __future__ import annotations

import duckdb
import pytest
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

# Crafted PII fixtures: positives, near-misses, overlaps, and NULL.
FIXTURES = [
    "contact a.b+c@ex-ample.co.uk or bob@x.io.",
    "ip 192.168.1.255 and 999.999.999.999 stop",      # 2nd is not an IPv4
    "call (415) 555-2671 or 415-555-2671 x9",
    "ssn 123-45-6789 card 4111 1111 1111 1111",       # CC must not half-match as phone
    "cc 4111-1111-1111-1111 inline",
    "v4 in text 8.8.8.8, and 10.0.0.1.",
    "no pii here at all",
    "almost@an@email and 12-34-5678 and 123.456",     # all near-misses
    "",
    None,
]

EXPECTED_COUNTS = {
    # text index -> {class: n} (zero entries omitted)
    0: {"email": 2},
    1: {"ip": 1},
    2: {"phone": 2},
    3: {"ssn": 1, "cc": 1},
    4: {"cc": 1},
    5: {"ip": 2},
}


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    yield con
    con.close()


def _spark_rows(spark):
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(FIXTURES)], "idx int, text string")
    counts = [pii_count("text", pat).alias(name) for name, pat in PII_CLASSES]
    out = df.select(
        "idx", *counts,
        F.when(F.col("text").isNotNull(), redact_pii("text")).alias("red"),
    ).collect()
    return {r["idx"]: r for r in out}


def _duck_rows(duck):
    rows = {}
    for i, t in enumerate(FIXTURES):
        if t is None:
            counts = duck.execute(
                "SELECT " + ", ".join(
                    pii_count_sql("CAST(NULL AS VARCHAR)", pat)
                    for _, pat in PII_CLASSES)).fetchone()
            rows[i] = (counts, None)
        else:
            counts = duck.execute(
                "SELECT " + ", ".join(pii_count_sql("$1", pat)
                                      for _, pat in PII_CLASSES),
                [t]).fetchone()
            red = duck.execute(
                "SELECT " + redact_pii_sql("$1"), [t]).fetchone()[0]
            rows[i] = (counts, red)
    return rows


def test_pii_bank_cross_engine_parity(spark, duck):
    sp, dk = _spark_rows(spark), _duck_rows(duck)
    for i in range(len(FIXTURES)):
        s_counts = tuple(sp[i][name] for name, _ in PII_CLASSES)
        assert s_counts == dk[i][0], (i, FIXTURES[i])
        assert sp[i]["red"] == dk[i][1], (i, FIXTURES[i])


def test_pii_counts_expected(spark):
    sp = _spark_rows(spark)
    for i in range(len(FIXTURES)):
        want = EXPECTED_COUNTS.get(i, {})
        got = {name: sp[i][name] for name, _ in PII_CLASSES if sp[i][name]}
        assert got == want, (i, FIXTURES[i])


def test_redaction_order_cc_beats_phone(spark):
    """A 16-digit card number redacts as one <CC>, never a <PHONE>
    half-match — REDACT_ORDER places CC before PHONE for exactly this."""
    sp = _spark_rows(spark)
    assert sp[3]["red"] == "ssn <SSN> card <CC>"
    assert sp[4]["red"] == "cc <CC> inline"


def test_pseudonym_parity_and_shape(spark, duck):
    names = ["Customer#000000001", "x", "Ünïcode name", ""]
    df = spark.createDataFrame([(n,) for n in names], "n string")
    got = [r["h"] for r in
           df.select(pseudonym("n", "graft-2026").alias("h")).collect()]
    want = [duck.execute("SELECT sha256(concat('graft-2026|', $1))",
                         [n]).fetchone()[0] for n in names]
    assert got == want
    assert all(len(h) == 64 and h == h.lower() for h in got)
    # salt actually participates
    other = df.select(pseudonym("n", "other-salt").alias("h")).collect()
    assert [r["h"] for r in other] != got


def test_value_band_parity_negative_values(spark, duck):
    """floor-division banding must agree on negatives (floor(-994/1000)
    = -1, not 0 — truncation would disagree)."""
    vals = [-994.28, -0.01, 0.0, 999.99, 1000.0, 9997.41]
    df = spark.createDataFrame([(v,) for v in vals], "v double")
    got = [r["b"] for r in df.select(value_band("v", 1000).alias("b")).collect()]
    want = [duck.execute("SELECT " + value_band_sql("$1", 1000), [v]).fetchone()[0]
            for v in vals]
    assert got == want == [-1, -1, 0, 0, 1, 9]


def test_k_anonymize_invariants(spark):
    """Suppression never loses rows; suppressed <-> group_size < k;
    quasi columns are NULL exactly on suppressed rows."""
    from cliqz_etl_spark.queries import load_all
    from cliqz_etl_spark.queries.privacy import K_ANON
    from tests.conftest import SF_ORACLE

    out = load_all()["k_anonymize_customers"].fn(spark, SF_ORACLE).collect()
    n_cust = (spark.read.parquet(f"{SF_ORACLE}/customer.parquet").count())
    assert len(out) == n_cust
    assert len({r["c_custkey"] for r in out}) == n_cust
    for r in out:
        assert r["suppressed"] == (r["group_size"] < K_ANON)
        assert (r["nation_q"] is None) == r["suppressed"]
        assert (r["segment_q"] is None) == r["suppressed"]


def test_dedup_semantic_keep_rule(spark):
    """Every valid vector gets exactly one verdict, and within a cluster
    the lowest id is always kept (the deterministic representative)."""
    from cliqz_etl_spark.queries import load_all
    from tests.conftest import SF_ORACLE

    from cliqz_etl_spark.operators.cache import release_all

    try:
        out = load_all()["dedup_semantic"].fn(spark, SF_ORACLE).collect()
    finally:
        release_all()
    ids = [r["vec_id"] for r in out]
    assert len(ids) == len(set(ids))
    by_cluster: dict[int, list] = {}
    for r in out:
        by_cluster.setdefault(r["cluster"], []).append(r)
    for rows in by_cluster.values():
        lowest = min(rows, key=lambda r: r["vec_id"])
        assert lowest["keep"] is True


def test_pii_bank_parity_on_generated_adversarial_corpus(spark, duck):
    """300 deterministic digit/punctuation-soup strings through both
    engines — the fuzz layer that caught the clean_cast '0\\x1f'
    divergence class. Counts AND redacted text must agree exactly."""
    import random

    r = random.Random(7)
    frags = ["192.168.", "255", "999", "@", ".", "-", " ", "(", ")",
             "1234", "45", "6789", "ex.com", "a", "+", "%", "_",
             "00", "1111", "x", "\t", "..", "@@", "io", "4111"]
    corpus = ["".join(r.choice(frags) for _ in range(r.randint(1, 14)))
              for _ in range(300)]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(corpus)], "idx int, text string")
    counts = [pii_count("text", pat).alias(name) for name, pat in PII_CLASSES]
    sp = {r_["idx"]: r_ for r_ in
          df.select("idx", *counts, redact_pii("text").alias("red")).collect()}
    mismatches = []
    for i, t in enumerate(corpus):
        want_counts = duck.execute(
            "SELECT " + ", ".join(pii_count_sql("$1", pat)
                                  for _, pat in PII_CLASSES), [t]).fetchone()
        want_red = duck.execute(
            "SELECT " + redact_pii_sql("$1"), [t]).fetchone()[0]
        got_counts = tuple(sp[i][name] for name, _ in PII_CLASSES)
        if got_counts != tuple(want_counts) or sp[i]["red"] != want_red:
            mismatches.append((t, got_counts, tuple(want_counts),
                               sp[i]["red"], want_red))
    assert not mismatches, mismatches[:5]
    # the corpus must actually exercise the bank (not vacuously zero)
    assert sum(sum(r_[n] for n, _ in PII_CLASSES)
               for r_ in sp.values()) > 0

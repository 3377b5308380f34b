"""Driver-contract self-checks on __spark_entry__: the exact interface the
verify harness consumes."""

from __future__ import annotations

import importlib.util
import re
from pathlib import Path

_REPO = Path(__file__).resolve().parents[1]


def _load():
    spec = importlib.util.spec_from_file_location(
        "__spark_entry__", str(_REPO / "__spark_entry__.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_contract_shape():
    mod = _load()
    qs, osql = mod.queries(), mod.oracle_sql()
    # floor tracks the registry's actual size (292 in round 11) so
    # an accidental deregistration — a lost import, a dropped module —
    # fails here loudly instead of silently shrinking the driver surface
    assert len(qs) >= 294
    assert set(osql) <= set(qs)
    # every registered query is fully oracle-checked (approx_distinct_users
    # was the last rows-only entry until its error-bound oracle)
    assert set(qs) - set(osql) == set()
    assert all(re.fullmatch(r"[a-z0-9_]+", n) for n in qs)
    assert all(callable(f) for f in qs.values())
    assert all(isinstance(s, str) and "SELECT" in s.upper() for s in osql.values())


def _rotate_window():
    spec = importlib.util.spec_from_file_location(
        "rotate_window", str(_REPO / "tools/rotate_window.py"))
    rw = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(rw)
    return rw


def _latest_green_round() -> dict[str, int]:
    """Latest round with a FULLY-green (rows+schema+hash) driver row per
    query, over the SAME pinned evidence set tools/rotate_window.py uses
    (the files present at the last commit touching DRIVER_ORDER) — so the
    driver dropping CORRECTNESS_r{N}.json after the round's final commit
    cannot redden the window gates (round-6/8 structural red).
    Rows-match alone is NOT green (round-9 postmortem: a hash-red row
    counted as fresh evidence and rotated out of the window). Never
    checked -> 0."""
    from cliqz_etl_spark.queries import DRIVER_ORDER

    return _rotate_window().latest_green_rounds(list(DRIVER_ORDER))


def test_new_queries_sit_inside_driver_window():
    """Window-rotation discipline (round-4 process bug): the driver checks
    only the first 50 DRIVER_ORDER slots per round, so any registry entry
    that has never appeared in a committed CORRECTNESS_r*.json must sit
    inside slots 1-50 of the NEXT window — otherwise a new operator ships
    with no hard correctness evidence, unnoticed.

    Overflow clause (round 11: 55 zero-evidence queries vs 50 slots —
    a round can register more queries than one driver pass verifies):
    when the zero-evidence+red set is LARGER than the window, the
    requirement becomes that every window slot is spent on a
    zero-evidence or red query (no slot wasted on a query that already
    has green evidence); the excess verifies next round via the
    oldest-evidence-first rotation, which fronts round-0 entries.

    Registration budget: COVERAGE.md "Evidence-bandwidth policy" is the
    governing rule — a round adding N queries must keep N <= 50 minus the
    count of stale-evidence queries, or declare accepted decay and make
    the next round a consolidation round (as round 12 is)."""
    from cliqz_etl_spark.queries import DRIVER_ORDER

    rw = _rotate_window()
    latest = _latest_green_round()
    red = rw.currently_red(list(DRIVER_ORDER))
    needy = {n for n in DRIVER_ORDER if latest[n] == 0} | red
    outside = [n for n in DRIVER_ORDER[50:] if latest[n] == 0]
    if len(needy) <= 50:
        assert not outside, (
            f"queries with zero driver evidence sit past the 50-slot "
            f"check window: {outside} — move them into slots 1-50 of "
            "DRIVER_ORDER")
    else:
        wasted = [n for n in DRIVER_ORDER[:50] if n not in needy]
        assert not wasted, (
            f"{len(needy)} queries need driver evidence but window slots "
            f"are spent on already-green queries: {wasted}")
        assert len(outside) == len(needy) - 50, (outside, len(needy))


def test_red_latest_row_sits_inside_driver_window():
    """Red-row discipline (round-9 verdict): any query whose LATEST driver
    row is not fully green (rows+schema+hash) carries an unproven fix and
    must occupy window slots 1-50 so the very next driver run re-verifies
    it. This is the gate that would have caught round 9 rotating the
    hash-red decimal_money_rollup row out of the window."""
    from cliqz_etl_spark.queries import DRIVER_ORDER

    red = _rotate_window().currently_red(list(DRIVER_ORDER))
    outside = [n for n in DRIVER_ORDER[50:] if n in red]
    assert not outside, (
        f"queries whose latest driver row is RED sit past the 50-slot "
        f"check window: {outside} — rotate DRIVER_ORDER so they lead it")


def test_driver_window_rotates_oldest_evidence_first():
    """Freshness discipline (round-5 verdict): testdata regenerates between
    rounds, so a driver row from three rounds ago is decayed evidence. The
    50-slot window must therefore hold every query whose latest green row
    is STRICTLY older than the 50th-oldest query's round (ties at the
    boundary round may be traded for this round's code-churn re-verifies,
    which is the other legitimate claim on a slot). Leaving DRIVER_ORDER
    unrotated after a driver run fails here, structurally."""
    from cliqz_etl_spark.queries import DRIVER_ORDER

    latest = _latest_green_round()
    boundary = sorted(latest.values())[49]  # round of the 50th-oldest query
    must_be_in_window = {n for n, r in latest.items() if r < boundary}
    stale_outside = [n for n in DRIVER_ORDER[50:] if n in must_be_in_window]
    assert not stale_outside, (
        f"queries with evidence older than the window boundary (round "
        f"{boundary}) sit past slot 50: {stale_outside} — rotate "
        "DRIVER_ORDER oldest-evidence-first")


def test_rotation_script_agrees_with_window_gate():
    """tools/rotate_window.py is the mechanical fix for the two window
    tests above; --check must agree that the committed DRIVER_ORDER needs
    no rewrite, so the script and the gate can never drift apart."""
    import subprocess
    import sys

    proc = subprocess.run(
        [sys.executable, str(_REPO / "tools/rotate_window.py"), "--check"],
        capture_output=True, text=True, cwd=_REPO)
    assert proc.returncode == 0, (
        f"rotate_window --check wants a rewrite:\n{proc.stdout}{proc.stderr}")


def test_entry_runs_and_returns_rows(spark):
    mod = _load()
    df = mod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert df.columns == ["n_name", "revenue_cents"]


def test_testdata_schema_contract(spark):
    """Contract check for the driver-generated parquet: every table loads
    and events.ts comes out as a plain TIMESTAMP regardless of how the
    file physically stores it (the r3 regeneration flipped it from
    TIMESTAMP(NANOS) to timestamp[us]; this test exists so the next
    format change fails here, loudly, instead of as ~90 confusing
    downstream failures)."""
    import glob

    from pyspark.sql.types import (ArrayType, NumericType, StringType,
                                   TimestampType)

    from cliqz_etl_spark.tables import TABLES, load_table

    # column-name contract: queries/oracles reference these by name, so a
    # regeneration that renames/drops one should fail HERE; dtype checks
    # stay loose (numeric/string/array) because physical types are
    # allowed to drift — that is what the loader's probes absorb.
    expected_cols = {
        "region": ["r_regionkey", "r_name"],
        "nation": ["n_nationkey", "n_name", "n_regionkey"],
        "customer": ["c_custkey", "c_name", "c_nationkey", "c_acctbal",
                     "c_mktsegment"],
        "supplier": ["s_suppkey", "s_name", "s_nationkey", "s_acctbal"],
        "part": ["p_partkey", "p_name", "p_brand", "p_type", "p_size",
                 "p_retailprice"],
        "orders": ["o_orderkey", "o_custkey", "o_orderstatus",
                   "o_totalprice", "o_orderdate", "o_orderpriority"],
        "lineitem": ["l_orderkey", "l_partkey", "l_suppkey", "l_linenumber",
                     "l_quantity", "l_extendedprice", "l_discount", "l_tax",
                     "l_returnflag", "l_linestatus", "l_shipdate"],
        "events": ["event_id", "ts", "user_id", "event_type", "value",
                   "props"],
        "documents": ["doc_id", "text", "lang", "source", "n_chars"],
        "embeddings": ["vec_id", "embedding", "label"],
    }
    sf_dirs = sorted(glob.glob("/root/testdata/sf*")) or ["/root/testdata/sf0.001"]
    for sf_dir in sf_dirs:
        for name in TABLES:
            df = load_table(spark, sf_dir, name)
            assert df.columns == expected_cols[name], (
                f"{sf_dir}/{name}: columns {df.columns} != contract "
                f"{expected_cols[name]} — the driver regenerated the "
                "schema; update queries/oracles before trusting results")
        ev = load_table(spark, sf_dir, "events")
        ts_type = ev.schema["ts"].dataType
        assert isinstance(ts_type, TimestampType), (
            f"{sf_dir}/events.ts loaded as {ts_type}; downstream queries "
            "require TIMESTAMP — extend tables.load_table's dtype branch")
        assert isinstance(ev.schema["value"].dataType, NumericType)
        docs = load_table(spark, sf_dir, "documents")
        assert isinstance(docs.schema["text"].dataType, StringType)
        emb = load_table(spark, sf_dir, "embeddings")
        assert isinstance(emb.schema["embedding"].dataType, ArrayType), (
            f"{sf_dir}/embeddings.embedding loaded as "
            f"{emb.schema['embedding'].dataType}; ANN operators require "
            "array<numeric>")


def test_events_loader_handles_legacy_nanos_layout(spark, tmp_path):
    """The dtype branch in tables.load_table must keep reading the legacy
    TIMESTAMP(NANOS) events layout (the driver shipped it through round 2)
    and yield the same instants as the native timestamp[us] layout."""
    import datetime

    import pyarrow as pa
    import pyarrow.parquet as pq
    from pyspark.sql.types import TimestampType

    from cliqz_etl_spark.tables import load_table

    instants = [datetime.datetime(2024, 1, 1, 0, 0, 7, 179575),
                datetime.datetime(2024, 6, 15, 12, 30, 0, 1)]
    cols = {
        "event_id": pa.array([1, 2], pa.int64()),
        "ts": pa.array(instants, pa.timestamp("ns")),
        "user_id": pa.array([10, 20], pa.int64()),
        "event_type": pa.array(["click", "purchase"]),
        "value": pa.array([1.5, 2.5], pa.float64()),
        "props": pa.array(["{}", "{}"]),
    }
    legacy = tmp_path / "legacy"
    legacy.mkdir()
    # version 2.6 is what preserves the NANOS annotation on disk
    pq.write_table(pa.table(cols), legacy / "events.parquet", version="2.6")
    df = load_table(spark, str(legacy), "events")
    assert isinstance(df.schema["ts"].dataType, TimestampType)
    # the legacy read must not leak nanosAsLong into the session (the
    # relation snapshots its conf at creation, so collect still works)
    assert spark.conf.get("spark.sql.legacy.parquet.nanosAsLong",
                          "false") == "false"
    got = sorted(r.ts for r in df.select("ts").collect())
    # nanos -> micros is exact for these values (they are micro-aligned)
    assert got == instants


def test_catalog_cache_scope(spark, tmp_path):
    """The per-session scan cache must hit for the read-only test data
    (same DataFrame object back) and must NOT cache mutable user paths —
    a rewritten file there has to be re-probed and re-read."""
    import shutil

    from cliqz_etl_spark.tables import load_table

    a = load_table(spark, "/root/testdata/sf0.001", "lineitem")
    b = load_table(spark, "/root/testdata/sf0.001", "lineitem")
    assert a is b, "testdata frames should be memoized per session"

    scratch = tmp_path / "mut"
    scratch.mkdir()
    shutil.copy("/root/testdata/sf0.001/region.parquet",
                scratch / "region.parquet")
    c = load_table(spark, str(scratch), "region")
    d = load_table(spark, str(scratch), "region")
    assert c is not d, "mutable paths must not be memoized"

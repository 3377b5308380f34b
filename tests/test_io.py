"""Sink semantics: partitioned write with dynamic partition overwrite must
make per-day re-runs idempotent (K1, testpilot_data.py:72-82) — rewriting
one day replaces that day only and leaves other partitions intact."""

from __future__ import annotations

import tempfile

from cliqz_etl_spark.io import read_parquet, write_parquet


def test_partition_overwrite_idempotent_day_rerun(spark):
    base = tempfile.mkdtemp() + "/cliqz_testpilot/v1"
    day1 = spark.createDataFrame([("c1", "20170101"), ("c2", "20170101")],
                                 ["client_id", "submission"])
    day2 = spark.createDataFrame([("c3", "20170102")], ["client_id", "submission"])
    write_parquet(day1, base, partition_by="submission")
    write_parquet(day2, base, partition_by="submission")
    # re-run day1 with corrected data: must replace day1, not day2
    day1_fixed = spark.createDataFrame([("c9", "20170101")], ["client_id", "submission"])
    write_parquet(day1_fixed, base, partition_by="submission")
    # NB partition-column values come back type-inferred (ints here)
    got = sorted((r["client_id"], str(r["submission"])) for r in read_parquet(spark, base).collect())
    assert got == [("c3", "20170102"), ("c9", "20170101")]


def test_partition_predicate_prunes(spark):
    base = tempfile.mkdtemp() + "/t/v1"
    df = spark.createDataFrame([("a", "20170101"), ("b", "20170102")],
                               ["x", "submission"])
    write_parquet(df, base, partition_by="submission")
    pruned = read_parquet(spark, base, submission="20170102")
    assert [r["x"] for r in pruned.collect()] == ["b"]
    # the partition filter must reach the scan (partition pruning)
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan or "20170102" in plan

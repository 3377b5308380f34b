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


def test_upsert_parquet_scd1(spark):
    import tempfile
    from cliqz_etl_spark.io import upsert_parquet

    base = tempfile.mkdtemp() + "/t"
    spark.createDataFrame([(1, "a"), (2, "b"), (3, "c")], ["k", "v"]) \
        .write.parquet(base)
    updates = spark.createDataFrame([(2, "B2"), (4, "d")], ["k", "v"])
    upsert_parquet(spark, base, updates, "k")
    got = sorted(tuple(r) for r in spark.read.parquet(base).collect())
    assert got == [(1, "a"), (2, "B2"), (3, "c"), (4, "d")]
    # idempotent re-apply
    upsert_parquet(spark, base, updates, "k")
    got2 = sorted(tuple(r) for r in spark.read.parquet(base).collect())
    assert got2 == got


def test_sorted_write_clusters_row_groups(spark):
    import tempfile
    from cliqz_etl_spark.io import write_parquet, read_parquet
    from pyspark.sql import functions as F

    path = tempfile.mkdtemp() + "/t"
    df = spark.range(0, 100000).withColumn("v", (F.col("id") * 7919) % 1000)
    write_parquet(df, path, sort_within_partitions="v", target_files=2)
    back = read_parquet(spark, path).where(F.col("v") < 10)
    assert back.count() == df.where(F.col("v") < 10).count()

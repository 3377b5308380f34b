"""Custom Python DataSource tests: the generator (batch + stream halves
are oracle-checked in the registry; here the option edge cases) and the
jsonl_shards sink's COMMIT PROTOCOL — the part a naive sink gets wrong.
"""

from __future__ import annotations

import json
import os

import pytest


def _register(spark):
    from cliqz_etl_spark.sources import JsonlShardDataSource

    try:
        spark.dataSource.register(JsonlShardDataSource)
    except Exception:
        pass


def test_jsonl_sink_manifest_accounts_every_row(spark, tmp_path):
    _register(spark)
    out = str(tmp_path / "sink")
    os.makedirs(out)
    df = spark.range(250).selectExpr("id", "CAST(id AS STRING) AS s").repartition(5)
    df.write.format("jsonl_shards").option("path", out).mode("append").save()
    man = json.load(open(f"{out}/_SUCCESS"))
    assert man["total_rows"] == 250
    assert sum(s["rows"] for s in man["shards"]) == 250
    shard_files = [f for f in os.listdir(out) if f.endswith(".jsonl")]
    assert sorted(shard_files) == sorted(s["file"] for s in man["shards"])
    assert spark.read.json(out).count() == 250


def test_jsonl_sink_abort_leaves_no_partial_output(spark, tmp_path):
    """A mid-job task failure must abort the write: no shard files, no
    staging litter — the whole point of staged-write + driver-commit."""
    from pyspark.sql import functions as F
    from pyspark.sql.types import LongType

    _register(spark)
    out = str(tmp_path / "sink")
    os.makedirs(out)

    @F.udf(returnType=LongType())
    def boom(x):
        if x == 150:
            raise RuntimeError("synthetic task failure")
        return x

    df = spark.range(200).select(boom("id").alias("id")).repartition(4)
    with pytest.raises(Exception):
        df.write.format("jsonl_shards").option("path", out).mode("append").save()
    leftovers = [f for f in os.listdir(out) if not f.startswith(".staging-")]
    assert leftovers == [], leftovers
    # staging dirs, if any survive speculation races, must hold no
    # committed shards a reader would pick up
    assert not [f for f in os.listdir(out) if f.endswith(".jsonl")]


def test_jsonl_sink_overwrite_replaces_prior_shards(spark, tmp_path):
    _register(spark)
    out = str(tmp_path / "sink")
    os.makedirs(out)
    spark.range(100).write.format("jsonl_shards").option("path", out) \
        .mode("append").save()
    spark.range(7).write.format("jsonl_shards").option("path", out) \
        .mode("overwrite").save()
    assert spark.read.json(out).count() == 7
    assert json.load(open(f"{out}/_SUCCESS"))["total_rows"] == 7


def test_synthetic_source_partition_option_shapes_parallelism(spark):
    from cliqz_etl_spark.sources import SyntheticEventsDataSource

    try:
        spark.dataSource.register(SyntheticEventsDataSource)
    except Exception:
        pass
    df = (spark.read.format("synthetic_events")
          .option("n_rows", 1000).option("n_partitions", 5).load())
    assert df.rdd.getNumPartitions() == 5
    assert df.count() == 1000


def test_jsonl_stream_sink_epoch_manifests(spark, tmp_path):
    """Generator stream -> custom stream sink across catch-up runs: every
    epoch commits its own manifest, manifests account every row exactly
    once, and no staging litter survives."""
    import glob
    import json
    import math

    from cliqz_etl_spark.sources import (JsonlShardDataSource,
                                         SyntheticEventsDataSource)

    for cls in (SyntheticEventsDataSource, JsonlShardDataSource):
        try:
            spark.dataSource.register(cls)
        except Exception:
            pass
    out, ck = str(tmp_path / "out"), str(tmp_path / "ck")
    os.makedirs(out)
    N, PER = 900, 400
    for _ in range(math.ceil(N / PER) + 1):
        src = (spark.readStream.format("synthetic_events")
               .option("n_rows", N).option("rows_per_batch", PER).load())
        (src.writeStream.format("jsonl_shards").option("path", out)
         .option("checkpointLocation", ck).outputMode("append")
         .trigger(availableNow=True).start().awaitTermination())
    ids = sorted(r[0] for r in spark.read.json(out)
                 .select("event_id").collect())
    assert ids == list(range(N))
    mans = glob.glob(f"{out}/_batch-*.json")
    assert len(mans) == math.ceil(N / PER)
    assert sum(json.load(open(m))["rows"] for m in mans) == N
    assert not os.path.exists(f"{out}/.stream-staging") or \
        not os.listdir(f"{out}/.stream-staging")


def test_stream_sink_epoch_replay_leaves_no_duplicate_shards(tmp_path):
    """foreach-style sinks are at-least-once per epoch: a replayed batch
    re-runs write() with fresh uuid shard names. commit() must purge the
    prior attempt's batch-{id}-* files so even glob-based readers (not
    just manifest readers) see the replay exactly once."""
    import glob
    import json

    from pyspark.sql import Row

    from cliqz_etl_spark.sources.jsonl_sink import _JsonlStreamWriter

    out = str(tmp_path / "replay")
    os.makedirs(out)
    wr = _JsonlStreamWriter({"path": out})
    rows = [Row(event_id=i, kind="click") for i in range(5)]
    wr.commit([wr.write(iter(rows))], batchId=0)
    first = set(glob.glob(f"{out}/batch-0-*"))
    assert len(first) == 1
    # replay the same epoch (different task-attempt uuid)
    wr.commit([wr.write(iter(rows))], batchId=0)
    after = set(glob.glob(f"{out}/batch-0-*"))
    assert len(after) == 1 and after != first
    man = json.load(open(f"{out}/_batch-0.json"))
    assert man["rows"] == 5
    assert {s["file"] for s in man["shards"]} == \
        {os.path.basename(p) for p in after}
    total = sum(1 for p in glob.glob(f"{out}/batch-*") for _ in open(p))
    assert total == 5

"""Test-data catalog: the driver's synthetic star schema + LLM-pipeline
tables (see /root/repo/TESTDATA.md).

Mirrors the reference's scan-and-register pattern
(/root/reference/cliqz_etl/profile_daily.py:11-14): parquet scan -> named
temp view. All reads go through ``spark.read.parquet`` so Catalyst gets
column pruning + filter pushdown for free.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = (
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; expected one of {TABLES}")
    if name == "events":
        # events.parquet stores TIMESTAMP(NANOS), which Spark's vectorized
        # reader rejects; read the raw int64 nanos and convert. `div` keeps
        # the arithmetic integral (a double division would lose microsecond
        # precision at epoch-nanos magnitude).
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(os.path.join(sf_dir, "events.parquet"))
        return df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


def register_tables(spark: SparkSession, sf_dir: str,
                    names: tuple[str, ...] = TABLES) -> dict[str, DataFrame]:
    """Load each table and register it as a temp view; returns the frames."""
    out = {}
    for name in names:
        df = load_table(spark, sf_dir, name)
        df.createOrReplaceTempView(name)
        out[name] = df
    return out

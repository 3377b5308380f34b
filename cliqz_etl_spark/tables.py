"""Test-data catalog: the driver's synthetic star schema + LLM-pipeline
tables (see /root/repo/TESTDATA.md).

Mirrors the reference's scan-and-register pattern
(/root/reference/cliqz_etl/profile_daily.py:11-14): parquet scan -> named
temp view. All reads go through ``spark.read.parquet`` so Catalyst gets
column pruning + filter pushdown for free.
"""

from __future__ import annotations

import os
from contextlib import contextmanager
from functools import lru_cache

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


@contextmanager
def scoped_conf(spark: SparkSession, key: str, value: str, default: str):
    """Set a runtime SQL conf for the duration of the block and restore
    the previous value (``default`` when unset) afterwards — the one
    save/set/try/finally idiom shared by every conf-sensitive reader so
    a fix to the scoping logic lands everywhere at once."""
    prev = spark.conf.get(key, default)
    spark.conf.set(key, value)
    try:
        yield
    finally:
        spark.conf.set(key, prev)

TABLES = (
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def events_ts_is_native(path: str) -> bool:
    """True when ``path`` stores ``ts`` as a parquet timestamp Spark can
    read natively (us/ms/s precision); False for legacy files that store
    TIMESTAMP(NANOS) or raw int64 epoch-nanos, which need the
    nanos-as-long workaround. Probed from the parquet footer (pyarrow) so
    the answer doesn't depend on any Spark session conf. The verdict is
    cached only for the driver test data, keyed by the file's
    (mtime, size) identity: the driver rewrites those files between
    rounds — the documented case where the ts dtype changes — so a
    process that outlives a regeneration re-probes instead of serving a
    stale verdict, which would reintroduce the silent micros-as-nanos
    misread this probe exists to prevent. Arbitrary user paths are never
    cached at all."""
    if os.path.realpath(path).startswith(_CACHEABLE_PREFIX):
        st = os.stat(path)
        return _events_ts_is_native_cached(path, st.st_mtime_ns, st.st_size)
    return _probe_events_ts(path)


@lru_cache(maxsize=64)
def _events_ts_is_native_cached(path: str, mtime_ns: int, size: int) -> bool:
    return _probe_events_ts(path)


def _probe_events_ts(path: str) -> bool:
    import pyarrow.parquet as pq
    import pyarrow as pa

    t = pq.read_schema(path).field("ts").type
    return pa.types.is_timestamp(t) and t.unit != "ns"


# Per-session catalog cache: spark.read.parquet pays a JVM file listing +
# footer schema read (~0.1 s) on every call, and analytic queries reference
# the same immutable inputs several times each. Real engines memoize this
# in a catalog/metastore; here the loaded DataFrame (a reusable immutable
# logical plan, not data) is cached per (applicationId, path), with the
# file's (mtime, size) identity stored IN the value: a driver testdata
# regeneration under a still-running process replaces the entry (same
# reasoning as the footer probe's cache key above) instead of both
# serving a stale plan and accumulating dead ones. Only the driver test
# data is cached — arbitrary user paths may be rewritten between reads.
_CATALOG_CACHE: dict[tuple[str, str], tuple[tuple[int, int], DataFrame]] = {}
_CACHEABLE_PREFIX = "/root/testdata/"


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; expected one of {TABLES}")
    path = os.path.join(sf_dir, f"{name}.parquet")
    cacheable = os.path.realpath(path).startswith(_CACHEABLE_PREFIX)
    if cacheable:
        st = os.stat(path)
        key = (spark.sparkContext.applicationId, path)
        ident = (st.st_mtime_ns, st.st_size)
        hit = _CATALOG_CACHE.get(key)
        if hit is not None and hit[0] == ident:
            return hit[1]
    df = _read_table(spark, path, name)
    if cacheable:
        _CATALOG_CACHE[key] = (ident, df)
    return df


def _read_table(spark: SparkSession, path: str, name: str) -> DataFrame:
    if name == "events":
        if not events_ts_is_native(path):
            # Legacy layout: epoch-nanos (TIMESTAMP(NANOS) annotation or
            # raw int64), which Spark's vectorized reader rejects; read the
            # raw int64 nanos and convert. `div` keeps the arithmetic
            # integral (a double division would lose microsecond precision
            # at epoch-nanos magnitude). Scoped save/restore: the relation
            # snapshots its hadoopConf when the DataFrame is created
            # (verified: collect() after restore still reads long), so the
            # flipped conf must not leak into other parquet reads in the
            # session, where it would silently surface nanos columns as
            # bigint.
            with scoped_conf(spark, "spark.sql.legacy.parquet.nanosAsLong",
                             "true", default="false"):
                df = spark.read.parquet(path)
            return df.withColumn(
                "ts", F.timestamp_micros(F.expr("ts div 1000")))
        # Native timestamp[us]: read the NTZ annotation as classic
        # TIMESTAMP (session TZ is pinned to UTC, so the instants are
        # identical). Doing it via the inference conf — rather than a
        # post-scan cast — keeps ts filters pushable at the parquet scan
        # and keeps every downstream consumer (epoch-second casts, window
        # watermarks) on the same TimestampType they were built against.
        # Scoped save/restore: schema inference is eager in read.parquet,
        # so the conf only needs to hold across this call — other reads in
        # the session must keep their own NTZ inference behavior.
        with scoped_conf(spark, "spark.sql.parquet.inferTimestampNTZ.enabled",
                         "false", default="true"):
            return spark.read.parquet(path)
    return spark.read.parquet(path)


def register_tables(spark: SparkSession, sf_dir: str,
                    names: tuple[str, ...] = TABLES) -> dict[str, DataFrame]:
    """Load each table and register it as a temp view; returns the frames."""
    out = {}
    for name in names:
        df = load_table(spark, sf_dir, name)
        df.createOrReplaceTempView(name)
        out[name] = df
    return out

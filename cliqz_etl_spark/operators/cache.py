"""Registry of persisted intermediates so long-lived sessions can release
them deterministically.

Operators that persist a mid-plan frame (dedup signatures, IVF
assignments, …) register it here via ``track``; operators that ship a
model to executors as a broadcast variable (SQ8 query model, IVF
centroids) register it via ``track_broadcast``. Either artifact must
outlive the operator call — the returned DataFrame is lazy and still
references it — so the operator itself cannot release. Instead the
*runner* (bench.py, tests/test_oracle.py, any driver loop) calls
``release_all()`` after its terminal action. Without that, repeated
operator invocations in one session accumulate MEMORY_AND_DISK
partitions and executor-side broadcast blocks until the storage layer
evicts them, competing with shuffle memory.
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import DataFrame, SparkSession

_LIVE: list[DataFrame] = []
_LIVE_BC: list[Any] = []
_LIVE_VIEWS: list[tuple[SparkSession, str]] = []


def track(df: DataFrame) -> DataFrame:
    """Record a persisted frame for later release; returns it unchanged."""
    _LIVE.append(df)
    return df


def track_broadcast(bc):
    """Record a broadcast variable for later release; returns it unchanged.
    release_all() unpersists (drops executor copies; the driver keeps its
    copy, so a still-referenced lazy plan re-broadcasts on demand) rather
    than destroys, which would poison re-execution."""
    _LIVE_BC.append(bc)
    return bc


def track_temp_view(spark: SparkSession, name: str) -> None:
    """Record a temp view whose catalog entry pins driver-resident data
    (streaming memory sinks: each drained result lives in the driver
    until its view is dropped). release_all() drops the catalog entry
    after the runner's terminal action; a DataFrame handed out before
    the drop keeps working off its resolved plan, but nothing pins the
    data process-wide anymore."""
    _LIVE_VIEWS.append((spark, name))


def release_all(blocking: bool = False) -> int:
    """Unpersist every tracked frame/broadcast and drop every tracked
    temp view; returns how many were released. Safe to call repeatedly;
    already-evicted entries no-op."""
    n = 0
    while _LIVE:
        _LIVE.pop().unpersist(blocking)
        n += 1
    while _LIVE_BC:
        _LIVE_BC.pop().unpersist(blocking)
        n += 1
    while _LIVE_VIEWS:
        spark, name = _LIVE_VIEWS.pop()
        spark.catalog.dropTempView(name)
        n += 1
    return n

"""A partition-parallel deterministic synthetic-events generator as a
custom Spark DataSource (the Python DataSource API, new in Spark 4).

Why a generator source matters at 100 TB: benchmark and soak corpora
should be MANUFACTURED in the executors, not read from storage — a
generator source has no input bytes, scales linearly with partitions,
and produces identical data on any cluster size. The row formulas are
pure functions of the row index built on the repo's md5_long primitive
(functions/hashing.py), so the exact same table is expressible in DuckDB
SQL from range(n) — which is what makes a *generator* oracle-checkable:
the gate query aggregates the Spark-read table and the oracle replays
the generation arithmetic row for row.

Usage:
    spark.dataSource.register(SyntheticEventsDataSource)
    df = (spark.read.format("synthetic_events")
          .option("n_rows", 100_000).option("n_users", 500)
          .option("n_partitions", 32).load())

Scale notes: ``partitions()`` returns row-range slices, so read
parallelism is explicit and even; each slice is generated independently
(no coordination, no skew). Rows are yielded per-slice from plain Python
— adequate for gate scale; an Arrow-batched variant drops in behind the
same partitioning for bulk generation.
"""

from __future__ import annotations

import hashlib
from datetime import datetime, timedelta

from pyspark.sql.datasource import (DataSource, DataSourceReader,
                                    InputPartition,
                                    SimpleDataSourceStreamReader)

EVENT_TYPES = ["click", "error", "purchase", "signup", "view"]
_EPOCH = datetime(2024, 1, 1)
_TS_SPAN_SEC = 30 * 86_400  # one month of event time


def _md5_long(s: str) -> int:
    """Python twin of functions/hashing.py::md5_long (60-bit md5 prefix)."""
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def _row(i: int, n_users: int) -> tuple:
    h0 = _md5_long(str(i))
    h1 = _md5_long(f"{i}#1")
    h2 = _md5_long(f"{i}#2")
    h3 = _md5_long(f"{i}#3")
    return (
        i,
        _EPOCH + timedelta(seconds=h2 % _TS_SPAN_SEC),
        h0 % n_users,
        EVENT_TYPES[h1 % 5],
        float(h3 % 100_000) / 100.0,
    )


class _Slice(InputPartition):
    def __init__(self, start: int, end: int, n_users: int):
        self.start, self.end, self.n_users = start, end, n_users


class _Reader(DataSourceReader):
    def __init__(self, options):
        self.n_rows = int(options.get("n_rows", 1_000))
        self.n_users = int(options.get("n_users", 100))
        self.n_partitions = max(1, int(options.get("n_partitions", 8)))

    def partitions(self):
        if self.n_rows <= 0:  # empty source still needs one (empty) slice
            return [_Slice(0, 0, self.n_users)]
        per = -(-self.n_rows // self.n_partitions)  # ceil
        return [
            _Slice(lo, min(lo + per, self.n_rows), self.n_users)
            for lo in range(0, self.n_rows, per)
        ]

    def read(self, partition: _Slice):
        # Arrow batches, not per-row tuples: the same generated values
        # (the oracle + fuzz gates pin bit-equality) but assembled
        # columnar and shipped over Arrow — the per-row pickling the
        # tuple path pays is the serialization tax this API exists to
        # avoid at bulk-generation scale
        import pyarrow as pa

        CHUNK = 8192
        lo = partition.start
        while lo < partition.end:
            hi = min(lo + CHUNK, partition.end)
            rows = [_row(i, partition.n_users) for i in range(lo, hi)]
            yield pa.RecordBatch.from_arrays(
                [pa.array([r[0] for r in rows], pa.int64()),
                 pa.array([r[1] for r in rows], pa.timestamp("us")),
                 pa.array([r[2] for r in rows], pa.int64()),
                 pa.array([r[3] for r in rows], pa.string()),
                 pa.array([r[4] for r in rows], pa.float64())],
                names=["event_id", "ts", "user_id", "event_type", "value"])
            lo = hi


class SyntheticEventsDataSource(DataSource):
    """format name: ``synthetic_events``."""

    @classmethod
    def name(cls) -> str:
        return "synthetic_events"

    def schema(self) -> str:
        return ("event_id bigint, ts timestamp, user_id bigint, "
                "event_type string, value double")

    def reader(self, schema) -> DataSourceReader:
        return _Reader(self.options)

    def simpleStreamReader(self, schema):
        return _StreamReader(self.options)


# --- streaming half ---------------------------------------------------------
#
# The same generator as an unbounded SOURCE: offsets are plain row
# indices, each micro-batch materializes [start, min(start+batch, cap))
# and advances the offset — so the stream replays EXACTLY the batch
# table, and checkpoint recovery (readBetweenOffsets) regenerates any
# batch bit-identically from its offset range alone. A generator needs
# no WAL: its offset IS the data.

class _StreamReader(SimpleDataSourceStreamReader):
    def __init__(self, options):
        self.cap = int(options.get("n_rows", 1_000))
        self.per_batch = int(options.get("rows_per_batch", 250))
        self.n_users = int(options.get("n_users", 100))

    def initialOffset(self) -> dict:
        return {"i": 0}

    def read(self, start: dict):
        # the runner drains the returned value with next() — it must be
        # an ITERATOR, not a sequence
        lo = int(start["i"])
        hi = min(lo + self.per_batch, self.cap)
        return (iter([_row(i, self.n_users) for i in range(lo, hi)]),
                {"i": hi})

    def readBetweenOffsets(self, start: dict, end: dict):
        return iter([_row(i, self.n_users)
                     for i in range(int(start["i"]), int(end["i"]))])

    def commit(self, end: dict) -> None:
        pass

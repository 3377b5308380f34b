"""Registry of persisted intermediates so long-lived sessions can release
them deterministically.

Operators that persist a mid-plan frame (dedup signatures, IVF
assignments, …) register it here via ``track``. The persisted frame must
outlive the operator call — the returned DataFrame is lazy and still
references it — so the operator itself cannot unpersist. Instead the
*runner* (bench.py, tests/test_oracle.py, any driver loop) calls
``release_all()`` after its terminal action. Without that, repeated
operator invocations in one session accumulate MEMORY_AND_DISK partitions
until the storage layer evicts them, competing with shuffle memory.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

_LIVE: list[DataFrame] = []


def track(df: DataFrame) -> DataFrame:
    """Record a persisted frame for later release; returns it unchanged."""
    _LIVE.append(df)
    return df


def release_all(blocking: bool = False) -> int:
    """Unpersist every tracked frame; returns how many were released.
    Safe to call repeatedly; frames already evicted unpersist as a no-op."""
    n = 0
    while _LIVE:
        _LIVE.pop().unpersist(blocking)
        n += 1
    return n

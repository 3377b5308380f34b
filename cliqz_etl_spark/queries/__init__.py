"""Query registry: every implemented operator exposed as a named query.

Each entry pairs a PySpark implementation ``fn(spark, sf_dir) -> DataFrame``
with (usually) a DuckDB-runnable ANSI-SQL oracle string over the same
parquet tables. The driver — and tests/test_oracle.py, which mirrors it —
runs both sides and compares row count, schema, and an order-insensitive
value hash. Column names are aliased identically on both sides.

Queries whose semantics are not SQL-expressible (streaming, multimodal
decode plumbing) register with ``oracle=None`` and get a rows-only check.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession


@dataclass(frozen=True)
class Query:
    name: str
    fn: Callable[[SparkSession, str], DataFrame]
    oracle: str | None
    doc: str = ""


REGISTRY: dict[str, Query] = {}


def query(name: str, oracle: str | None = None, doc: str = ""):
    """Register ``fn`` under ``name`` with its DuckDB oracle SQL."""
    def deco(fn):
        if name in REGISTRY:
            raise ValueError(f"duplicate query name {name!r}")
        REGISTRY[name] = Query(name, fn, oracle, doc or (fn.__doc__ or "").strip())
        return fn
    return deco


def load_all() -> dict[str, Query]:
    """Import every query module (side effect: fills REGISTRY)."""
    from cliqz_etl_spark.queries import (  # noqa: F401
        advanced,
        analytics,
        dedup,
        llmdata,
        multimodal,
        relational,
        sessions,
        similarity,
        streamq,
        textops,
        timeseries,
        warehouse,
    )
    return REGISTRY

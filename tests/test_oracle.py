"""Every registered query must match its DuckDB oracle (the driver's t2
gate, mirrored locally at a small scale factor for fast iteration)."""

from __future__ import annotations

import pytest

from cliqz_etl_spark.queries import load_all
from tests.conftest import SF_ORACLE
from tests.oracle_harness import compare

_REGISTRY = load_all()


@pytest.mark.parametrize("name", sorted(_REGISTRY))
def test_query_matches_oracle(spark, name):
    from cliqz_etl_spark.operators.cache import release_all

    q = _REGISTRY[name]
    try:
        result = compare(spark, name, q.fn, q.oracle, SF_ORACLE)
    finally:
        release_all()
    if q.oracle is None:
        assert result["spark_rows"] >= 0
        return
    assert result["status"] == "ok", result

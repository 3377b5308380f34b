"""Every registered query must match its DuckDB oracle (the driver's t2
gate, mirrored locally at a small scale factor for fast iteration)."""

from __future__ import annotations

import pytest

from cliqz_etl_spark.queries import load_all
from tests.conftest import SF_ORACLE
from tests.oracle_harness import compare

_REGISTRY = load_all()


def test_oracle_output_types_are_pandas_safe():
    """Registry-wide oracle type lint (round-11 verdict item 2).

    The driver materializes DuckDB oracle results through pandas, where
    HUGEINT/UHUGEINT (e.g. DuckDB's SUM over BIGINT) and DECIMAL wider
    than 18 digits degrade to float64 — so an oracle can hash red on the
    driver while the fetchall()-based local mirror stays green
    (round 10's important_part_value). DESCRIBE every oracle and reject
    those output types up front; oracles must CAST such columns to
    BIGINT (or an <=18-digit DECIMAL) explicitly.
    """
    from tests.oracle_harness import duckdb_conn

    con = duckdb_conn(SF_ORACLE)
    violations = []
    for name in sorted(_REGISTRY):
        oracle = _REGISTRY[name].oracle
        if oracle is None:
            continue
        desc = con.execute(f"DESCRIBE {oracle}").fetchall()
        for col, coltype, *_ in desc:
            t = coltype.upper()
            bad = t in ("HUGEINT", "UHUGEINT")
            if t.startswith("DECIMAL("):
                prec = int(t.split("(")[1].split(",")[0])
                bad = bad or prec > 18
            if bad:
                violations.append(f"{name}.{col}: {coltype}")
    assert not violations, (
        "oracle output columns would degrade through pandas on the "
        f"driver; add explicit CASTs: {violations}"
    )


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

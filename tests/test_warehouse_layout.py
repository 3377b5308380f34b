"""Layout-planner kernels: the Hilbert rotate-reflect walk (pinned
exhaustively — both the Python reference and the SQL expression text the
query ships to BOTH engines) and the hilbert-vs-zorder locality claim the
family's docstrings make.
"""

from __future__ import annotations

import duckdb

from cliqz_etl_spark.queries.warehouse import _HN, _hilbert_level


def _hilbert_py(x: int, y: int) -> int:
    """Reference walk — mirrors the query's n-1-reflection variant."""
    d = 0
    s = _HN // 2
    while s > 0:
        rx = (x // s) % 2
        ry = (y // s) % 2
        d += s * s * (3 * rx + ry - 2 * rx * ry)
        if ry == 0:
            if rx == 1:
                x = _HN - 1 - x
                y = _HN - 1 - y
            x, y = y, x
        assert x >= 0 and y >= 0, "intermediates must stay non-negative"
        s //= 2
    return d


def test_hilbert_reference_bijection_and_adjacency():
    """Every cell of the 16x16 grid gets a unique d, and consecutive d
    values are ADJACENT cells (Manhattan distance exactly 1) — the
    property that makes Hilbert clustering strictly tighter than Morton,
    whose curve jumps at power-of-two seams."""
    pos = {}
    for x in range(_HN):
        for y in range(_HN):
            pos[_hilbert_py(x, y)] = (x, y)
    assert len(pos) == _HN * _HN
    assert sorted(pos) == list(range(_HN * _HN))
    for i in range(_HN * _HN - 1):
        (x0, y0), (x1, y1) = pos[i], pos[i + 1]
        assert abs(x0 - x1) + abs(y0 - y1) == 1, i


def test_hilbert_sql_text_matches_reference_exhaustively():
    """The exact expression text the query sends to both engines (with
    the DuckDB // spelling) replays the reference walk for all 256
    cells — a drift in the CASE chain or the arithmetic-XOR identity
    diverges here, not in a driver round."""
    con = duckdb.connect()
    rows = con.execute(
        f"WITH pts AS (SELECT (i // {_HN}) AS px, (i % {_HN}) AS py "
        f"FROM (SELECT unnest(range({_HN * _HN})) AS i)), "
        "h0 AS (SELECT px, py, px AS hx, py AS hy, 0 AS d FROM pts), "
        + ", ".join(
            f"h{i + 1}p AS (SELECT px, py, ({nhx}) AS nhx, ({nhy}) AS nhy, "
            f"d + ({d_inc}) AS d FROM h{i}), "
            f"h{i + 1} AS (SELECT px, py, nhx AS hx, nhy AS hy, d FROM h{i + 1}p)"
            for i, (d_inc, nhx, nhy) in enumerate(
                _hilbert_level(s) for s in (8, 4, 2, 1))).replace(" div ", " // ")
        + " SELECT px, py, d FROM h4").fetchall()
    assert len(rows) == _HN * _HN
    for px, py, d in rows:
        assert d == _hilbert_py(px, py), (px, py)


def test_hilbert_buckets_no_looser_than_zorder(spark):
    """The planner pair's selling point, asserted on real data: summed
    per-bucket bounding-box area (the zone-map pruning cost) under the
    Hilbert layout must not exceed the Morton layout's on the same
    quantization. Equality is allowed — at coarse grids the curves can
    tie — but Hilbert reading WORSE than Morton means the walk is wrong
    somewhere the exhaustive grid test can't see (real key skew)."""
    from cliqz_etl_spark.queries import REGISTRY

    sf = "/root/testdata/sf0.001"
    def area(name: str, layout: str) -> int:
        rows = REGISTRY[name].fn(spark, sf).collect()
        return sum((r.cust_span + 1) * (r.day_span + 1)
                   for r in rows if r.layout == layout)

    hilbert = area("hilbert_layout", "hilbert")
    zorder = area("zorder_layout", "zorder")
    assert hilbert <= zorder, (hilbert, zorder)

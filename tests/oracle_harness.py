"""Mirror of the driver's correctness gate: run a registry query in Spark
and its oracle SQL in DuckDB over the same parquet tables; compare row
count, column names, and an order-insensitive value hash (columns sorted by
name, rows sorted by value tuple, doubles handled by the queries' own
rounding discipline)."""

from __future__ import annotations

import datetime as _dt
import hashlib
import math
import os

import duckdb

from cliqz_etl_spark.tables import TABLES


def _canon(v):
    if v is None:
        return "\0NULL"
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        # normalize -0.0 and integral floats
        if v == int(v) and abs(v) < 1e15:
            return f"{int(v)}.0"
        return repr(v)
    if isinstance(v, (_dt.datetime, _dt.date)):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(_canon(x) for x in v) + "]"
    return str(v)


def _hash_rows(cols: list[str], rows: list[tuple]) -> str:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    canon_rows = sorted(
        "\x1f".join(_canon(row[i]) for i in order) for row in rows
    )
    h = hashlib.sha256()
    for r in canon_rows:
        h.update(r.encode("utf-8", "surrogateescape"))
        h.update(b"\x1e")
    return h.hexdigest()


def duckdb_conn(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        path = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(path):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')")
    return con


def compare(spark, name: str, fn, oracle: str | None, sf_dir: str) -> dict:
    sdf = fn(spark, sf_dir)
    s_cols = sdf.columns
    s_rows = [tuple(r) for r in sdf.collect()]
    out = {"name": name, "spark_rows": len(s_rows), "cols": s_cols}
    if oracle is None:
        out["status"] = "rows-only"
        return out
    con = duckdb_conn(sf_dir)
    res = con.execute(oracle)
    d_cols = [d[0] for d in res.description]
    d_rows = [tuple(r) for r in res.fetchall()]
    out["duck_rows"] = len(d_rows)
    ok_cols = sorted(s_cols) == sorted(d_cols)
    ok_count = len(s_rows) == len(d_rows)
    ok_hash = _hash_rows(s_cols, s_rows) == _hash_rows(d_cols, d_rows)
    out["cols_match"] = ok_cols
    out["count_match"] = ok_count
    out["hash_match"] = ok_hash
    out["status"] = "ok" if (ok_cols and ok_count and ok_hash) else "MISMATCH"
    if not ok_cols:
        out["duck_cols"] = d_cols
    if ok_cols and ok_count and not ok_hash:
        # first differing canonical row, to debug
        order_s = sorted(range(len(s_cols)), key=lambda i: s_cols[i])
        order_d = sorted(range(len(d_cols)), key=lambda i: d_cols[i])
        cs = sorted("\x1f".join(_canon(r[i]) for i in order_s) for r in s_rows)
        cd = sorted("\x1f".join(_canon(r[i]) for i in order_d) for r in d_rows)
        for a, b in zip(cs, cd):
            if a != b:
                out["first_diff"] = {"spark": a, "duck": b}
                break
    return out

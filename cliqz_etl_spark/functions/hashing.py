"""Deterministic, engine-portable hashing primitives.

Everything downstream that needs a hash (exact dedup, MinHash, SimHash,
fingerprinting) uses md5 — not ``F.hash``/``F.xxhash64`` — because md5 is
bit-identical across Spark, DuckDB, and Python, which makes every dedup
operator oracle-checkable. The 60-bit truncation keeps values positive and
safely inside a signed 64-bit long in both engines.

All of this is JVM-side expression code (whole-stage codegen); no UDFs.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# 15 hex digits = 60 bits: fits a signed BIGINT in Spark and DuckDB alike.
_HEX_DIGITS = 15


def md5_long(col: Column | str) -> Column:
    """First 60 bits of md5 as a non-negative long."""
    c = F.col(col) if isinstance(col, str) else col
    return F.conv(F.substring(F.md5(c.cast("string")), 1, _HEX_DIGITS), 16, 10).cast("long")


def md5_long_seeded(col: Column | str, seed: int) -> Column:
    """Seeded variant: a family of independent hash functions h_seed(x),
    used as the MinHash permutation family."""
    c = F.col(col) if isinstance(col, str) else col
    return md5_long(F.concat_ws("#", c.cast("string"), F.lit(str(seed))))


def md5_long_sql(expr: str) -> str:
    """DuckDB-SQL twin of ``md5_long`` (for oracle queries)."""
    return f"CAST(('0x' || substr(md5(CAST({expr} AS VARCHAR)), 1, {_HEX_DIGITS})) AS BIGINT)"


def md5_long_seeded_sql(expr: str, seed: int) -> str:
    return md5_long_sql(f"CAST({expr} AS VARCHAR) || '#' || '{seed}'")

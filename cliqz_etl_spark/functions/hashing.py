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
    used as the MinHash permutation family.

    NULL-propagating (F.concat, round-11 fuzz fix): the DuckDB twin's
    ``||`` has always sent NULL input to NULL output, but concat_ws here
    SKIPPED the NULL and hashed "#seed" — a latent cross-engine
    divergence invisible to every existing call site (primary keys,
    filtered users, non-null shingles) until the DP release hashed a
    NULL group key."""
    c = F.col(col) if isinstance(col, str) else col
    return md5_long(F.concat(c.cast("string"), F.lit(f"#{seed}")))


def md5_long_sql(expr: str) -> str:
    """DuckDB-SQL twin of ``md5_long`` (for oracle queries)."""
    return f"CAST(('0x' || substr(md5(CAST({expr} AS VARCHAR)), 1, {_HEX_DIGITS})) AS BIGINT)"


def md5_long_seeded_sql(expr: str, seed: int) -> str:
    return md5_long_sql(f"CAST({expr} AS VARCHAR) || '#' || '{seed}'")


# --- MinHash permutation family -------------------------------------------
#
# One md5 per element (32-bit base hash), then k permutations as
# h_i(x) = (a_i * (base mod P) + b_i) mod P with P = 2^31 - 1 — the classic
# pairwise-independent universal family. Deriving 16 signatures costs 16
# multiply-adds per element instead of 16 md5s.
#
# P MUST be small enough that a_i*base wraps the modulus many times: an
# earlier variant used P = 2^61-1, where a*base+b < 2^61 never wraps, the
# maps stay order-preserving, every "permutation" selects the same argmin
# element, and LSH collapses (measured: 5x the true candidate-pair count).
#
# Bounds: base mod P < 2^31, a < 2^30  =>  a*(base mod P) + b < 2^61 fits
# signed 64-bit in Spark and DuckDB alike.

MERSENNE_P = (1 << 31) - 1


def md5_long32(col: Column | str) -> Column:
    """First 32 bits of md5 as a long (the permutation base hash)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.conv(F.substring(F.md5(c.cast("string")), 1, 8), 16, 10).cast("long")


def md5_long32_sql(expr: str) -> str:
    return f"CAST(('0x' || substr(md5(CAST({expr} AS VARCHAR)), 1, 8)) AS BIGINT)"


def perm_params(n_perm: int) -> list[tuple[int, int]]:
    """Deterministic (a_i, b_i) pairs, derived from md5 in plain Python so
    the Spark operators and generated oracle SQL share them exactly.
    1 <= a_i < 2^28 (odd), 0 <= b_i < 2^28."""
    import hashlib as _hl

    out = []
    for i in range(n_perm):
        a = int(_hl.md5(f"minhash-a-{i}".encode()).hexdigest()[:7], 16) | 1
        b = int(_hl.md5(f"minhash-b-{i}".encode()).hexdigest()[:7], 16)
        out.append((a, b))
    return out


def perm_col(base: Column, a: int, b: int) -> Column:
    return (F.lit(a) * (base % F.lit(MERSENNE_P)) + F.lit(b)) % F.lit(MERSENNE_P)


def perm_sql(base_expr: str, a: int, b: int) -> str:
    return f"(({a} * ({base_expr} % {MERSENNE_P}) + {b}) % {MERSENNE_P})"

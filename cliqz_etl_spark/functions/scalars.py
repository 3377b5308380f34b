"""Scalar function library — SURVEY.md §2.4 (F1-F10), columnar.

Every function returns a ``Column`` built from pyspark.sql.functions
(JVM-side, codegen'd). The reference ran these as row-at-a-time Python
cleaning functions with try/except→NULL (testpilot_data.py:53-63); here
the same error-tolerant semantics come from ``try_*`` expressions, so no
Python is involved.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


# The engines' raw try-casts diverge on string→integer inputs: Spark's
# UTF8String.trimAll strips *any* leading/trailing whitespace-or-ISO-control
# char ('\x1f42' -> 42, '0\x1f' -> 0), while DuckDB trims only standard
# whitespace and additionally accepts decimal/scientific/hex forms
# ('4.0'/'1e3'/'0x10' -> BIGINT). clean_cast therefore pins an explicit
# contract — the conservative intersection — and clean_cast_sql() emits the
# byte-identical DuckDB fragment, so every casting oracle compares the same
# semantics (tests/test_properties.py holds the pair together).
_INT_DTYPES = {"byte", "tinyint", "short", "smallint", "int", "integer",
               "long", "bigint"}
# Explicit class, not \s: Java and RE2 disagree on \s membership (\x0b).
# \A/\z anchors, not ^/$: Java's $ also matches BEFORE a final line
# terminator (so '42'/'42 '/'42 ' would pass rlike while
# RE2's $ rejects them); \A and \z mean begin/end-of-input in both.
_INT_PATTERN = ("\\A[ \\t\\n\\x0b\\x0c\\r]*[+-]?[0-9]+"
                "[ \\t\\n\\x0b\\x0c\\r]*\\z")
_DUCK_INT_TYPES = {"byte": "TINYINT", "tinyint": "TINYINT",
                   "short": "SMALLINT", "smallint": "SMALLINT",
                   "int": "INTEGER", "integer": "INTEGER",
                   "long": "BIGINT", "bigint": "BIGINT"}


def clean_cast(col: Column | str, dtype: str) -> Column:
    """Error-tolerant cast (P4/F4): bad input -> NULL, never an error.
    Rebuild of build_cell's try/except→None (testpilot_data.py:53-63).

    For integer dtypes the accepted grammar is pinned to
    ``[ws]* [+-]? [0-9]+ [ws]*`` (ws = space \\t \\n \\x0b \\x0c \\r);
    anything else — embedded control chars, decimals, hex — is NULL on
    both engines via the mirrored guard in clean_cast_sql(). Overflow
    still NULLs through try_cast. Non-integer dtypes pass straight to
    try_cast (no known cross-engine divergence in gate use)."""
    c = _c(col)
    if dtype.lower() in _INT_DTYPES:
        return F.when(c.rlike(_INT_PATTERN), c).try_cast(dtype)
    return c.try_cast(dtype)


def clean_cast_sql(expr: str, dtype: str) -> str:
    """The DuckDB oracle fragment matching clean_cast() exactly: same
    guard regex (RE2 reads the identical escape sequence), same NULL-out,
    same overflow behavior through TRY_CAST."""
    d = dtype.lower()
    if d in _DUCK_INT_TYPES:
        return (f"CASE WHEN regexp_matches({expr}, '{_INT_PATTERN}') "
                f"THEN TRY_CAST({expr} AS {_DUCK_INT_TYPES[d]}) END")
    return f"TRY_CAST({expr} AS {dtype})"


def split_select(col: Column | str, sep: str = r"\|", index: int = 0) -> Column:
    """Split on a separator and take one element (F2,
    testpilot_data.py:109-111 `split_cliqz_id`). NULL-propagating; an
    out-of-range index yields NULL (element_at on arrays is 1-based)."""
    return F.element_at(F.split(_c(col), sep), index + 1)


def isin_flag(col: Column | str, values: list) -> Column:
    """Set-membership boolean (F3, testpilot_data.py:177)."""
    return _c(col).isin(values)


def indicator(cond: Column) -> Column:
    """Boolean condition as a 0/1 long, for summable event flags (F8,
    profile_daily.py:189-195)."""
    return F.when(cond, F.lit(1)).otherwise(F.lit(0)).cast("long")


def parse_yyyymmdd(col: Column | str) -> Column:
    """'%Y%m%d' date parse (F5, testpilot_data.py:86-87); unparseable -> NULL
    (matches the reference dropping bad dates, profile_daily.py:128-133)."""
    return F.try_to_timestamp(_c(col), F.lit("yyyyMMdd")).cast("date")


def concat_key(*cols: Column | str, sep: str = "-") -> Column:
    """Separator concat for composite map keys (F6, profile_daily.py:159
    `engine + "-" + source`)."""
    return F.concat_ws(sep, *[_c(c) for c in cols])


def hours(col: Column | str, default: float = 0.0) -> Column:
    """seconds -> hours with NULL -> default (F7, profile_daily.py:168)."""
    return F.coalesce(_c(col).cast("double"), F.lit(default)) / F.lit(3600.0)


def decrypt_aes_ecb_b64(col: Column | str, key: Column,
                        zero_pad_fallback: bool = True) -> Column:
    """F1 (testpilot_data.py:98-106): base64 -> AES-ECB decrypt -> strip
    zero padding -> drop 4-byte head/tail. Bad ciphertext -> NULL.

    Two-tier plan: the JVM fast path (aes_decrypt ECB/'DEFAULT' = PKCS
    unpad) handles well-formed PKCS ciphertext inside codegen. The
    reference's producer, though, was PyCrypto raw ECB over ZERO-padded
    plaintext (testpilot_data.py:102) — its ciphertext fails PKCS unpad
    and NULLs out. With ``zero_pad_fallback`` the rows the fast path
    NULLed are re-tried in an Arrow-batched pandas UDF running a pure-
    Python AES (functions/aes_py.py, FIPS-197-vector-tested) with the
    reference's exact ``rstrip("\\0")[4:-4]`` semantics; rows already
    decoded JVM-side pass through untouched, so the Python work is
    proportional to the zero-padded minority. Set it False for pure-JVM
    plans over PKCS-only data."""
    plain = F.try_aes_decrypt(F.unbase64(_c(col)), key, F.lit("ECB"), F.lit("DEFAULT"))
    text = F.regexp_replace(plain.cast("string"), "\x00+$", "")
    fast = F.substring(text, 5, F.greatest(F.length(text) - F.lit(8), F.lit(0)))
    if not zero_pad_fallback:
        return fast

    from pyspark.sql.functions import pandas_udf

    @pandas_udf("string")
    def _zero_pad_decrypt(cipher: pd.Series, key_s: pd.Series,
                          fast_s: pd.Series) -> pd.Series:
        import base64

        from cliqz_etl_spark.functions.aes_py import decrypt_ecb

        out = []
        for c, k, f in zip(cipher, key_s, fast_s):
            if f is not None or c is None or k is None:
                out.append(f)
                continue
            try:
                plain_b = decrypt_ecb(base64.b64decode(c), k.encode("utf-8"))
                out.append(plain_b.rstrip(b"\0")[4:-4].decode("utf-8"))
            except Exception:
                out.append(None)
        return pd.Series(out, dtype=object)

    return _zero_pad_decrypt(_c(col), key.cast("string"), fast)


def null_safe(col: Column | str, default) -> Column:
    """F9: the reference's `option(default, f)` NULL-propagation helper
    (profile_daily.py:200-206). Spark expressions already propagate NULL;
    this supplies the default side."""
    return F.coalesce(_c(col), F.lit(default))

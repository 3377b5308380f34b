"""Privacy primitives: typed PII detection/redaction, salted
pseudonymization, and value generalization.

All of it is pure columnar `pyspark.sql.functions` — regex scans ride the
parquet scan inside whole-stage codegen (no Python in the hot path), so at
100 TB the cost is the scan itself plus a per-row constant. Every pattern
is written in the Java-regex ∩ RE2 common subset (no lookaround, no
backreferences, explicit `[0-9]` over `\\d` where a dialect could widen to
Unicode digits) so the DuckDB oracles run the byte-identical pattern —
the same cross-engine contract discipline as ``clean_cast``
(functions/scalars.py).

Extends the reference's single-pattern masking step
(cliqz_etl/main.py:1 ecosystem has no typed PII pass; see
queries/curation.py::mask_terms for the generic-shape analogue) with the
class-typed scan a pretraining-data pipeline needs.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# ---------------------------------------------------------------------------
# PII regex bank. Order matters for redaction: longer/more-specific classes
# run before classes whose pattern could match a substring of them (CC and
# SSN before PHONE), so a 16-digit card never half-redacts as a phone
# number. PII_CLASSES is the canonical (name, pattern) order for counting;
# REDACT_ORDER is the chained-replace order. Both engines apply the exact
# same strings in the exact same order.
# ---------------------------------------------------------------------------
EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z][A-Za-z]+"
IPV4_RE = (
    r"\b(?:(?:25[0-5]|2[0-4][0-9]|1[0-9][0-9]|[1-9]?[0-9])\.){3}"
    r"(?:25[0-5]|2[0-4][0-9]|1[0-9][0-9]|[1-9]?[0-9])\b"
)
PHONE_RE = r"\(?[0-9]{3}\)?[-. ][0-9]{3}[-. ][0-9]{4}"
SSN_RE = r"\b[0-9]{3}-[0-9]{2}-[0-9]{4}\b"
CC_RE = r"\b(?:[0-9]{4}[- ]){3}[0-9]{4}\b"

PII_CLASSES: list[tuple[str, str]] = [
    ("email", EMAIL_RE),
    ("ip", IPV4_RE),
    ("phone", PHONE_RE),
    ("ssn", SSN_RE),
    ("cc", CC_RE),
]

REDACT_ORDER: list[tuple[str, str]] = [
    ("email", EMAIL_RE),
    ("ip", IPV4_RE),
    ("ssn", SSN_RE),
    ("cc", CC_RE),
    ("phone", PHONE_RE),
]


def pii_count(col, pattern: str) -> Column:
    """Occurrences of one PII class in ``col`` (0 for NULL text)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.coalesce(
        F.regexp_count(c, F.lit(pattern)), F.lit(0)).cast("long")


def redact_pii(col) -> Column:
    """Replace every PII occurrence with its class token (``<EMAIL>`` …),
    applying classes in REDACT_ORDER so overlapping patterns resolve
    deterministically."""
    c = F.col(col) if isinstance(col, str) else col
    for name, pattern in REDACT_ORDER:
        c = F.regexp_replace(c, pattern, f"<{name.upper()}>")
    return c


def redact_pii_sql(expr: str) -> str:
    """DuckDB twin of redact_pii — identical patterns, identical order,
    global replace."""
    for name, pattern in REDACT_ORDER:
        expr = f"regexp_replace({expr}, '{pattern}', '<{name.upper()}>', 'g')"
    return expr


def pii_count_sql(expr: str, pattern: str) -> str:
    """DuckDB twin of pii_count."""
    return (f"CAST(coalesce(len(regexp_extract_all({expr}, '{pattern}')), 0) "
            f"AS BIGINT)")


# ---------------------------------------------------------------------------
# Pseudonymization: a salted SHA-256 of the direct identifier. Salting
# blocks dictionary reversal of a small identifier space; the hash is
# deterministic so joins on the pseudonym still work across tables scrubbed
# with the same salt. Both engines emit lowercase hex.
# ---------------------------------------------------------------------------
def pseudonym(col, salt: str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.sha2(F.concat(F.lit(salt + "|"), c), 256)


def pseudonym_sql(expr: str, salt: str) -> str:
    # '||', never concat(): DuckDB's concat SKIPS NULL arguments, so a
    # NULL identifier would quietly pseudonymize to sha256('salt|') — a
    # stable fake identity shared by every NULL. Spark's concat (and ||
    # here) propagate NULL, so a missing identifier stays NULL on both
    # engines (fuzz-pinned).
    return f"sha256('{salt}|' || {expr})"


def value_band(col, width: int) -> Column:
    """Generalize a numeric value to its band index (floor(v / width)) —
    the k-anonymity generalization step for continuous attributes."""
    c = F.col(col) if isinstance(col, str) else col
    return F.floor(c / F.lit(width)).cast("long")


def value_band_sql(expr: str, width: int) -> str:
    return f"CAST(floor({expr} / {width}) AS BIGINT)"

"""Change-data-capture merge operators: SCD type-2 history maintenance.

The reference has no dimension-history machinery (its jobs overwrite daily
partitions — cliqz_etl/profile_daily.py:210's full-rewrite model); these
operators add the warehouse-standard slowly-changing-dimension surface a
100 TB pipeline needs for point-in-time-correct training snapshots.

Scale design:

* ``scd2_merge`` is ONE equi-join on the business key followed by a pure
  map (an explode of at most two version structs per row) — no second
  pass, no union re-executing the join, no window. The join shuffles both
  sides on the key once; at dimension scale the update side is usually
  broadcast by AQE.
* ``scd2_from_changelog`` is the gaps-and-islands compression: one hash
  partition on the key feeds BOTH windows (change detection via ``lag``,
  closing via ``lead``) — Spark plans a single Exchange because the two
  window specs share partitioning and ordering.

Both keep every value column engine-portable (callers pass pre-quantized
ints / strings), so the produced history hash-matches a DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def scd2_merge(
    base: DataFrame,
    updates: DataFrame,
    key: str,
    value_col: str,
    eff_col: str,
    *,
    base_from: Column,
) -> DataFrame:
    """Merge one batch of updates into a current-only SCD2 base.

    ``base`` holds exactly one CURRENT row per ``key`` with attribute
    ``value_col`` valid since ``base_from``. ``updates`` holds at most one
    row per ``key`` with the new ``value_col`` effective at ``eff_col``
    (a sortable string). Rows whose update equals the current value are
    untouched (no empty versions); changed keys emit a closed old version
    plus an open new one.

    Returns columns: ``key, value_col, valid_from, valid_to, is_current``.
    """
    upd = updates.select(
        F.col(key),
        F.col(value_col).alias("_new_val"),
        F.col(eff_col).alias("_eff"),
    )
    j = base.select(F.col(key), F.col(value_col), base_from.alias("_from")).join(
        upd, key, "left"
    )
    changed = F.col("_new_val").isNotNull() & (
        F.col("_new_val") != F.col(value_col)
    )
    versions = F.when(
        changed,
        F.array(
            F.struct(
                F.col(value_col).alias("v"),
                F.col("_from").alias("valid_from"),
                F.col("_eff").alias("valid_to"),
                F.lit(0).alias("is_current"),
            ),
            F.struct(
                F.col("_new_val").alias("v"),
                F.col("_eff").alias("valid_from"),
                F.lit(None).cast("string").alias("valid_to"),
                F.lit(1).alias("is_current"),
            ),
        ),
    ).otherwise(
        F.array(
            F.struct(
                F.col(value_col).alias("v"),
                F.col("_from").alias("valid_from"),
                F.lit(None).cast("string").alias("valid_to"),
                F.lit(1).alias("is_current"),
            )
        )
    )
    return (
        j.select(F.col(key), F.explode(versions).alias("_ver"))
        .select(
            key,
            F.col("_ver.v").alias(value_col),
            F.col("_ver.valid_from").alias("valid_from"),
            F.col("_ver.valid_to").alias("valid_to"),
            F.col("_ver.is_current").alias("is_current"),
        )
    )


def scd2_from_changelog(
    log: DataFrame,
    key: str,
    value_col: str,
    ts_col: str,
    tiebreak_col: str,
) -> DataFrame:
    """Compress an append-only change log into SCD2 version history.

    Consecutive rows (per ``key``, ordered by ``ts_col`` then
    ``tiebreak_col`` for full determinism) with the same ``value_col``
    collapse into one version; each version's ``valid_to`` is the next
    version's start (NULL while current). One shuffle: both windows share
    the (key) partitioning and (ts, tiebreak) ordering.

    Returns: ``key, value_col, valid_from, valid_to, n_rows, is_current``
    where ``valid_from``/``valid_to`` are formatted strings and ``n_rows``
    counts the collapsed log rows backing the version.

    NULL-ts log rows are excluded (fuzz-pinned: the engines order NULLs
    to opposite ends, so every run boundary after one would shift), and
    change detection is NULL-SAFE: a NULL value is a real category (a
    run of NULLs is one version; NULL -> x and x -> NULL are changes),
    where the naive ``lag != value`` form silently merges a NULL-valued
    row into the preceding version."""
    log = log.where(F.col(ts_col).isNotNull())
    w = Window.partitionBy(key).orderBy(ts_col, tiebreak_col)
    is_first = F.row_number().over(w) == 1
    marked = log.select(
        key,
        value_col,
        F.col(ts_col).alias("_ts"),
        F.col(tiebreak_col).alias("_tb"),
        F.when(
            is_first | ~F.lag(value_col).over(w).eqNullSafe(F.col(value_col)),
            F.lit(1),
        )
        .otherwise(F.lit(0))
        .alias("_is_change"),
    )
    wsum = (
        Window.partitionBy(key)
        .orderBy("_ts", "_tb")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    runs = marked.select(
        key, value_col, "_ts", F.sum("_is_change").over(wsum).alias("_run")
    )
    versions = runs.groupBy(key, "_run").agg(
        F.first(value_col).alias(value_col),
        F.min("_ts").alias("_start"),
        F.count(F.lit(1)).alias("n_rows"),
    )
    wv = Window.partitionBy(key).orderBy("_run")
    return versions.select(
        key,
        value_col,
        F.date_format("_start", "yyyy-MM-dd HH:mm:ss").alias("valid_from"),
        F.date_format(F.lead("_start").over(wv), "yyyy-MM-dd HH:mm:ss").alias(
            "valid_to"
        ),
        F.col("n_rows"),
        F.when(F.lead("_start").over(wv).isNull(), F.lit(1))
        .otherwise(F.lit(0))
        .alias("is_current"),
    )


def point_in_time_join(
    facts: DataFrame,
    history: DataFrame,
    key: str,
    fact_ts: str,
    version_ts: str,
    value_col: str,
) -> DataFrame:
    """As-of join of facts against SCD2 version history: each fact row
    picks the version with the latest ``version_ts`` <= ``fact_ts`` (both
    sortable strings/dates) — the point-in-time-correct feature lookup
    that keeps training pipelines free of future leakage.

    Scale shape: NO range join and no per-key explosion — both sides are
    tagged and unioned, sorted once per key by (time, side) with history
    sorting before facts at equal timestamps (a version effective exactly
    at the fact's timestamp IS visible), and the value propagates with one
    last(ignorenulls) window. One shuffle on the key; state per row is a
    single value, not an interval index.

    Returns the fact rows plus ``value_col`` (NULL when no version was in
    effect yet).
    """
    h = history.select(
        F.col(key),
        F.col(version_ts).alias("__t"),
        F.lit(0).alias("__side"),
        F.col(value_col).alias("__v"),
    )
    f = facts.select(
        F.col(key),
        F.col(fact_ts).alias("__t"),
        F.lit(1).alias("__side"),
        F.lit(None).cast(h.schema["__v"].dataType).alias("__v"),
        *[c for c in facts.columns if c != key],
    )
    # align schemas: history side carries NULLs for fact payload columns
    payload = [c for c in facts.columns if c != key]
    h = h.select(
        key, "__t", "__side", "__v",
        *[F.lit(None).cast(f.schema[c].dataType).alias(c) for c in payload],
    )
    w = (
        Window.partitionBy(key)
        .orderBy("__t", "__side")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        h.unionByName(f)
        .withColumn(value_col, F.last("__v", ignorenulls=True).over(w))
        .where(F.col("__side") == 1)
        .select(key, *payload, value_col)
    )


def table_diff(
    old: DataFrame,
    new: DataFrame,
    key: str,
    compare_cols: list[str],
) -> DataFrame:
    """Snapshot diff: classify every key as added / removed / changed.

    The reference's daily jobs overwrite partitions wholesale
    (/root/reference/cliqz_etl/testpilot_data.py:72-82), so "what changed
    since yesterday" is unanswerable there; this operator reconstructs a
    changelog from two keyed snapshots — the primitive behind incremental
    downstream refresh and CDC backfills.

    ONE full-outer equi-join on the key (a single shuffle; at 100 TB both
    snapshots shuffle-partition on the same key, and if the snapshots were
    written bucketed on the key — operators/bucketing.py — even that
    shuffle disappears). Comparison is null-safe (``<=>``) per column.
    Unchanged keys are dropped, so output size tracks the delta, not the
    table.

    Returns: ``key, change_type`` + ``old_<c>, new_<c>`` per compare col.
    """
    # explicit presence markers — a NULL value column must not read as an
    # absent row
    o = old.select(
        F.col(key), F.lit(True).alias("__in_old"),
        *[F.col(c).alias(f"old_{c}") for c in compare_cols],
    )
    n = new.select(
        F.col(key), F.lit(True).alias("__in_new"),
        *[F.col(c).alias(f"new_{c}") for c in compare_cols],
    )
    j = o.join(n, key, "full_outer")
    in_old = F.col("__in_old").isNotNull()
    in_new = F.col("__in_new").isNotNull()
    same = None
    for c in compare_cols:
        eq = F.col(f"old_{c}").eqNullSafe(F.col(f"new_{c}"))
        same = eq if same is None else (same & eq)
    change = (
        F.when(~in_old, F.lit("added"))
        .when(~in_new, F.lit("removed"))
        .when(~same, F.lit("changed"))
    )
    return (
        j.withColumn("change_type", change)
        .where(F.col("change_type").isNotNull())
        .select(key, "change_type",
                *[f"old_{c}" for c in compare_cols],
                *[f"new_{c}" for c in compare_cols])
    )

"""Distributed order statistics: partition-parallel prefix sums.

A global ``Window.orderBy(col)`` moves every row to ONE task — the
classic scalability cliff for cumulative distributions, rank statistics,
and exact quantiles. ``ranged_cumsum`` computes the identical result
with no single-task stage, the textbook two-pass scheme every MPP engine
uses:

1. range-repartition on the order column (contiguous value ranges per
   partition; equal values never split across partitions);
2. cumulative sums WITHIN each range via a window partitioned by the
   physical partition id (parallel across ranges);
3. per-range totals — at most ``n_ranges`` rows — prefix-summed on one
   task (trivially small) and broadcast back as additive offsets.

The result is independent of where the range boundaries fall (they are
sampled), because contiguous ranges + within-range order compose to the
global order for any boundary choice.

Measured (local[32], 10M rows): checksum-identical to the global window
(max and sum of the cumulative column match exactly) at equal
wall-clock — on one machine the single sort fits comfortably and both
plans are sort-bound. The scheme's value is the memory bound, not local
speed: the global window materializes the ENTIRE frame in one task
(at 100 TB, one executor's heap), while this one holds at most one
range per task at any scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def ranged_cumsum(df: DataFrame, order_col: str | list[str],
                  sum_cols: list[str], *, n_ranges: int = 32) -> DataFrame:
    """Return ``df`` with ``cum_<c>`` columns: the running sum of each
    ``sum_cols`` entry under ``ORDER BY order_col ASC`` (one column or a
    composite key list), computed without a global single-task sort.
    Rows with equal order-key values get their within-value order from
    the range partition's sort, so callers that need well-defined ties
    (CDFs) should pre-aggregate to distinct key values first — exactly
    what a cumulative distribution does anyway."""
    order_cols = [order_col] if isinstance(order_col, str) else list(order_col)
    ranged = (df.repartitionByRange(n_ranges, *[F.asc(c) for c in order_cols])
              .withColumn("__pid", F.spark_partition_id()))
    within = Window.partitionBy("__pid") \
        .orderBy(*[F.asc(c) for c in order_cols]) \
        .rowsBetween(Window.unboundedPreceding, 0)
    cur = ranged.select(
        "*", *[F.sum(c).over(within).alias(f"__w_{c}") for c in sum_cols])
    # per-range totals: <= n_ranges rows, so the exclusive-prefix window
    # over __pid is a constant-size single task, then broadcast back.
    # Built from `ranged` (not `cur`) so this branch re-reads the reused
    # range exchange without executing the window a second time.
    totals = ranged.groupBy("__pid").agg(
        *[F.sum(c).alias(f"__t_{c}") for c in sum_cols])
    prefix = Window.orderBy(F.asc("__pid")) \
        .rowsBetween(Window.unboundedPreceding, -1)
    offsets = totals.select(
        "__pid",
        *[F.coalesce(F.sum(f"__t_{c}").over(prefix), F.lit(0))
          .alias(f"__o_{c}") for c in sum_cols])
    out = cur.join(F.broadcast(offsets), "__pid")
    for c in sum_cols:
        out = out.withColumn(f"cum_{c}", F.col(f"__w_{c}") + F.col(f"__o_{c}"))
    return out.drop("__pid",
                    *[f"__w_{c}" for c in sum_cols],
                    *[f"__o_{c}" for c in sum_cols])

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


def _pin_ranges(df: DataFrame, order_cols: list[str],
                n_ranges: int) -> DataFrame:
    """Range-repartition and MATERIALIZE the (rows, __pid) frame before
    it fans out to the within-range windows and the per-range totals.

    This persist is load-bearing for correctness, not a cache hint:
    ``repartitionByRange`` draws SAMPLED boundaries inside the exchange,
    and the two consumers are separate plan subtrees — when the optimizer
    does not reuse the exchange, each evaluation samples its own
    boundaries, the branches disagree on which rows live in which
    ``__pid``, and the broadcast offsets silently correct the WRONG
    partials (observed: ks_drift returned a different KS max on every
    run at sf0.01 while the sf0.001 suite stayed green — the reused-
    exchange case). Persist+count pins one sampled partitioning as data;
    both branches then read identical (row, __pid) assignments, and the
    two-pass scheme's boundary-independence argument applies. The
    persisted frame is the operator's input (for CDFs: the DISTINCT
    value frame, far smaller than the corpus), registered with
    operators/cache.py for deterministic release."""
    from cliqz_etl_spark.operators.cache import track

    ranged = track(
        df.repartitionByRange(n_ranges, *[F.asc(c) for c in order_cols])
        .withColumn("__pid", F.spark_partition_id())
        .persist())
    ranged.count()
    return ranged


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
    ranged = _pin_ranges(df, order_cols, n_ranges)
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


def ranged_cummax(df: DataFrame, order_col: str | list[str],
                  cols: list[str], *, exclusive: bool = False,
                  n_ranges: int = 32) -> DataFrame:
    """``cummax_<c>`` columns: the running MAX of each ``cols`` entry under
    ``ORDER BY order_col ASC``, by the same two-pass range scheme as
    ``ranged_cumsum`` (no global single-task sort). With ``exclusive=True``
    the max covers strictly-preceding rows only (NULL for the global
    first row) — the skyline/dominance shape, where each row is compared
    against everything before it. Callers needing well-defined ties
    should pre-aggregate to distinct order-key values first."""
    order_cols = [order_col] if isinstance(order_col, str) else list(order_col)
    ranged = _pin_ranges(df, order_cols, n_ranges)
    lo = Window.unboundedPreceding
    hi = -1 if exclusive else 0
    within = Window.partitionBy("__pid") \
        .orderBy(*[F.asc(c) for c in order_cols]) \
        .rowsBetween(lo, hi)
    cur = ranged.select(
        "*", *[F.max(c).over(within).alias(f"__w_{c}") for c in cols])
    totals = ranged.groupBy("__pid").agg(
        *[F.max(c).alias(f"__t_{c}") for c in cols])
    prefix = Window.orderBy(F.asc("__pid")) \
        .rowsBetween(Window.unboundedPreceding, -1)
    offsets = totals.select(
        "__pid",
        *[F.max(f"__t_{c}").over(prefix).alias(f"__o_{c}") for c in cols])
    out = cur.join(F.broadcast(offsets), "__pid")
    for c in cols:
        # greatest() ignores NULL arms; NULL only when BOTH are (the
        # global first row under exclusive mode — the caller's identity)
        out = out.withColumn(f"cummax_{c}",
                             F.greatest(F.col(f"__w_{c}"), F.col(f"__o_{c}")))
    return out.drop("__pid",
                    *[f"__w_{c}" for c in cols],
                    *[f"__o_{c}" for c in cols])


def mg_candidates(df: DataFrame, col: str, k: int) -> DataFrame:
    """Misra-Gries heavy-hitter candidate screen: one Arrow-batched pass
    per partition with ``k`` counters, returning the union of surviving
    keys (column ``col``, distinct).

    Guarantee (the two-pass exact heavy-hitters contract): any key with
    GLOBAL count > n/k has, by averaging, count > n_p/k in at least one
    partition, and Misra-Gries with k counters never evicts such a key —
    so the candidate union is a superset of the true heavy hitters no
    matter how rows are partitioned. The candidate set is at most
    k x n_partitions rows (a model-sized frame, broadcastable), and the
    exact verification pass counts ONLY candidates. This is the shape
    that finds heavy hitters over 100 TB when the key cardinality is far
    too large to groupBy wholesale: the first pass holds k counters per
    task, the second pass is a broadcast-filtered aggregation.

    The intermediate candidate set depends on partitioning; the FINAL
    exact-verified output does not — callers must filter on the exact
    counts (cnt * k > n), which tests pin by comparing against a plain
    groupBy oracle."""
    import pandas as pd  # local import: worker-side dependency only

    def summarize(batches):
        counters: dict = {}
        for pdf in batches:
            for w in pdf[col]:
                if w is None:
                    continue
                if w in counters:
                    counters[w] += 1
                elif len(counters) < k - 1:
                    counters[w] = 1
                else:
                    dead = []
                    for key in counters:
                        counters[key] -= 1
                        if counters[key] == 0:
                            dead.append(key)
                    for d in dead:
                        del counters[d]
        yield pd.DataFrame({col: list(counters.keys())})

    return df.select(col).mapInPandas(summarize, f"{col} string").distinct()


def ranged_ntile(df: DataFrame, order_cols: list[str], k: int,
                 out_col: str, *, n_ranges: int = 32) -> DataFrame:
    """Exact ``ntile(k) OVER (ORDER BY order_cols)`` WITHOUT the global
    single-task window sort: the global 1-based rank is a ranged prefix
    count (the ranged_cumsum two-pass scheme, inlined), and ntile's
    bucket-size rule — the first N % k buckets take ceil(N/k) rows, the
    rest floor(N/k) — is a closed-form integer expression of (rank, N).
    ``order_cols`` must form a UNIQUE key (append a tiebreak id), the
    same requirement the window form has for determinism.

    Inlined rather than composed over ranged_cumsum so N comes from the
    <= n_ranges-row per-range TOTALS frame (one tiny aggregate) — the
    composed form read max(cum) off the full ranked output, re-running
    the within-range window and the offsets join once per call just to
    fetch one number (review finding, round 9)."""
    work = df.withColumn("__one", F.lit(1).cast("long"))
    ranged = _pin_ranges(work, order_cols, n_ranges)
    within = Window.partitionBy("__pid") \
        .orderBy(*[F.asc(c) for c in order_cols]) \
        .rowsBetween(Window.unboundedPreceding, 0)
    cur = ranged.select("*", F.sum("__one").over(within).alias("__w"))
    totals = ranged.groupBy("__pid").agg(F.sum("__one").alias("__t"))
    prefix = Window.orderBy(F.asc("__pid")) \
        .rowsBetween(Window.unboundedPreceding, -1)
    offsets = totals.select(
        "__pid",
        F.coalesce(F.sum("__t").over(prefix), F.lit(0)).alias("__o"))
    n_total = totals.agg(F.sum("__t").cast("long").alias("__n"))
    ranked = (cur.join(F.broadcast(offsets), "__pid")
              .withColumn("__rank", F.col("__w") + F.col("__o")))
    q = f"(__n div {k})"
    rem = f"(__n % {k})"
    cut = f"({rem} * ({q} + 1))"
    expr = (f"CAST(CASE WHEN __rank <= {cut}"
            f" THEN (__rank - 1) div ({q} + 1) + 1"
            f" ELSE {rem} + (__rank - 1 - {cut}) div {q} + 1 END"
            f" AS BIGINT)")
    return (ranked.crossJoin(F.broadcast(n_total))
            .withColumn(out_col, F.expr(expr))
            .drop("__pid", "__one", "__w", "__o", "__rank", "__n"))


def kmin_hashes(df: DataFrame, group_col: str, hash_col: str,
                k: int) -> DataFrame:
    """Per-group k smallest DISTINCT values of ``hash_col`` — the KMV
    sketch build — as a mergeable bounded-state pass.

    The naive build (``row_number() OVER (PARTITION BY group ORDER BY h)``
    over the distinct hashes) funnels EVERY distinct hash of a group into
    one task's sort: with a constant-cardinality group key (event types,
    tenants) that is a data-sized single-task window — the round-10 scale
    flag. k-smallest-of-distinct is associative, so the sketch merges the
    way every production theta-sketch library's does instead:

    1. one Arrow-batched pass holds, per task, at most k values per group
       (numpy merge of per-batch uniques) and emits them — output is
       bounded by k x groups x partitions rows, never data-sized;
    2. the final k smallest per group over that bounded union runs in a
       window whose partitions hold at most k x n_input_partitions rows.

    Output is bit-identical to the naive build for any partitioning: a
    hash in the true global k-minimum set is in its partition's local
    k-minimum set (fewer distinct values can precede it locally than
    globally). NULL hashes are dropped (md5(NULL) is NULL — no key).
    """
    import numpy as np
    import pandas as pd

    out_schema = df.select(group_col, hash_col).schema

    def local_kmin(batches):
        state: dict = {}
        for pdf in batches:
            for g, grp in pdf.groupby(group_col, dropna=False, sort=False):
                # nullable long batches arrive float64 in pandas; 2^60-scale
                # hashes do not survive float64 — re-anchor to int64 after
                # the nulls are gone
                u = grp[hash_col].dropna().astype("int64").unique()
                if len(u) == 0:
                    continue
                prev = state.get(g)
                merged = np.unique(u) if prev is None else \
                    np.unique(np.concatenate([prev, u]))
                state[g] = merged[:k]
        if state:
            yield pd.DataFrame({
                group_col: [g for g, arr in state.items() for _ in arr],
                hash_col: np.concatenate(list(state.values())),
            })

    cand = df.select(group_col, hash_col).mapInPandas(local_kmin, out_schema)
    w = Window.partitionBy(group_col).orderBy(F.asc(hash_col))
    return (cand.distinct()
            .withColumn("__rn", F.row_number().over(w))
            .where(F.col("__rn") <= k).drop("__rn"))

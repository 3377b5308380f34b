"""Event sessionization and window analytics (SURVEY.md §7.2(d)).

Gap-based session assignment is the classic lag + cumulative-sum window
pair: a row opens a new session when it is the user's first event or the
gap from the previous event exceeds the threshold; the running sum of those
flags is the session sequence number. One shuffle on user_id; both window
functions share the same partitioning, so Catalyst plans a single Exchange.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from cliqz_etl_spark.queries import query
from cliqz_etl_spark.tables import load_table

GAP_SECONDS = 1800


def with_session_seq(ev: DataFrame, gap_seconds: int = GAP_SECONDS) -> DataFrame:
    """Add a per-user ``session_seq`` column (1-based) to an events frame.
    Deterministic ordering: (ts, event_id). Boundary semantics match
    Spark's ``session_window`` exactly: an event at EXACTLY prev_ts + gap
    still merges (session windows [t, t+gap] chain when they touch), so a
    new session starts only at gap > gap_seconds — pinned by the
    exact-1800s-gap fixture in test_streaming, measured against the
    native operator, so the three sessionizers and the shared oracle
    cannot silently diverge.

    NULL-ts events are excluded (fuzz-pinned): a session position for an
    unknown instant is meaningless, and the engines even disagree where
    to SORT it (ascending NULLs first in Spark, last in DuckDB) — the
    shared oracle CTE applies the identical filter."""
    ev = ev.where(F.col("ts").isNotNull())
    w = Window.partitionBy("user_id").orderBy(F.asc("ts"), F.asc("event_id"))
    prev_ts = F.lag(F.col("ts")).over(w)
    gap = F.col("ts").cast("long") - prev_ts.cast("long")
    is_new = F.when(prev_ts.isNull() | (gap > gap_seconds), 1).otherwise(0)
    cum = Window.partitionBy("user_id").orderBy(F.asc("ts"), F.asc("event_id")) \
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    # ``is_new`` is kept: a session's entry row is exactly its is_new=1
    # row, so consumers get "first event of session" for free instead of
    # re-deriving it with a second (user, session)-keyed window (which
    # would cost another shuffle on a different key).
    return (ev.withColumn("is_new", is_new)
            .withColumn("session_seq", F.sum("is_new").over(cum)))


_SESSION_CTE = f"""
    WITH ordered AS (
        SELECT user_id, event_id, ts, value, event_type,
               lag(ts) OVER (PARTITION BY user_id ORDER BY ts ASC, event_id ASC) AS prev_ts
        FROM events WHERE ts IS NOT NULL
    ), flagged AS (
        SELECT *, CASE WHEN prev_ts IS NULL
                         OR date_diff('second', prev_ts, ts) > {GAP_SECONDS}
                       THEN 1 ELSE 0 END AS is_new
        FROM ordered
    ), sessioned AS (
        SELECT user_id, event_id, ts, value, event_type, is_new,
               SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts ASC, event_id ASC
                                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_seq
        FROM flagged
    )
"""


@query(
    "sessionize",
    oracle=_SESSION_CTE + """
    SELECT user_id AS user_id, CAST(session_seq AS BIGINT) AS session_seq,
           COUNT(*) AS n_events,
           CAST(date_diff('second', MIN(ts), MAX(ts)) AS BIGINT) AS duration_sec,
           CAST(SUM(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT) AS session_cents
    FROM sessioned
    GROUP BY 1, 2
    """,
)
def sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-session rollup: event count, wall-clock span, summed value."""
    ev = load_table(spark, sf_dir, "events")
    return (
        with_session_seq(ev)
        .groupBy("user_id", F.col("session_seq").cast("long").alias("session_seq"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            (F.max(F.col("ts").cast("long")) - F.min(F.col("ts").cast("long")))
            .cast("long").alias("duration_sec"),
            F.sum(F.floor(F.col("value") * 100 + 0.5).cast("long"))
            .cast("long").alias("session_cents"),
        )
    )


@query(
    "session_stats",
    oracle=_SESSION_CTE + """
    , per_session AS (
        SELECT user_id, session_seq, COUNT(*) AS n_events
        FROM sessioned GROUP BY 1, 2
    )
    SELECT user_id AS user_id,
           COUNT(*) AS n_sessions,
           ROUND(AVG(n_events), 4) AS avg_events_per_session,
           CAST(MAX(n_events) AS BIGINT) AS max_session_events
    FROM per_session GROUP BY user_id
    """,
)
def session_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user session behavior; reuses the sessionized frame (same
    user_id partitioning throughout — no extra shuffle)."""
    ev = load_table(spark, sf_dir, "events")
    per_session = (
        with_session_seq(ev)
        .groupBy("user_id", "session_seq")
        .agg(F.count(F.lit(1)).alias("n_events"))
    )
    return per_session.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_sessions"),
        F.round(F.avg("n_events"), 4).alias("avg_events_per_session"),
        F.max("n_events").cast("long").alias("max_session_events"),
    )


@query(
    "sessionize_native",
    oracle=_SESSION_CTE + """
    SELECT user_id AS user_id,
           strftime(MIN(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT) AS session_cents
    FROM sessioned
    GROUP BY user_id, session_seq
    """,
)
def sessionize_native(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The same gap sessions via Spark's built-in ``session_window`` in
    BATCH mode — cross-checking the streaming primitive against the
    lag+cumsum formulation's oracle. Both merge an event landing at
    exactly prev_ts + GAP and split only beyond it (measured native
    behavior, pinned by the exact-1800s-gap fixture in test_streaming)."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.session_window("ts", f"{GAP_SECONDS} seconds").alias("sw"), "user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.floor(F.col("value") * 100 + 0.5).cast("long"))
            .cast("long").alias("session_cents"),
            F.date_format(F.min("ts"), "yyyy-MM-dd HH:mm:ss").alias("session_start"),
        )
        .select("user_id", "session_start", "n_events", "session_cents")
    )


@query(
    "longest_streak",
    oracle="""
    WITH ordered AS (
        SELECT user_id, event_type,
               ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts ASC, event_id ASC) AS rn,
               ROW_NUMBER() OVER (PARTITION BY user_id, event_type
                                  ORDER BY ts ASC, event_id ASC) AS rn_type
        -- user_id IS NOT NULL on both engines: a streak has no identity
        -- without a user, and the numpy path's pandas groupby DROPS NaN
        -- keys while SQL's PARTITION BY keeps the NULL group (fuzz-found)
        FROM events WHERE ts IS NOT NULL AND user_id IS NOT NULL
    ), islands AS (
        SELECT user_id, event_type, rn - rn_type AS island, COUNT(*) AS streak
        FROM ordered GROUP BY 1, 2, 3
    )
    SELECT user_id AS user_id, MAX(streak) AS max_streak
    FROM islands GROUP BY user_id
    """,
)
def longest_streak(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Longest run of consecutive same-type events per user — a custom
    sequential algorithm run as a batched, vectorized mapInPandas over
    user-clustered, time-sorted partitions. The oracle is the pure-SQL
    gaps-and-islands formulation, so the Python path is value-checked
    against a relational derivation of the same semantics.

    Why mapInPandas and not groupBy().applyInPandas: with millions of
    small groups, per-group Arrow round-trips dominate (measured ~4x
    here). repartition(user_id) + sortWithinPartitions gives each task a
    stream of whole user histories in order; numpy finds run boundaries
    across the whole 10k-row Arrow batch at once, and a 3-field carry
    handles runs that straddle batch boundaries. State is one (user ->
    best) entry per user in the task — the same bound as a hash
    aggregate — independent of any single user's history length."""
    import numpy as np
    import pandas as pd

    ev = (
        load_table(spark, sf_dir, "events")
        # NULL-ts rows excluded on both sides (fuzz-pinned): the engines
        # sort NULLs to opposite ends, so run boundaries would differ.
        # NULL users too: pandas groupby drops NaN keys, SQL keeps them
        .where(F.col("ts").isNotNull() & F.col("user_id").isNotNull())
        .select("user_id", "ts", "event_id", "event_type")
        .repartition("user_id")
        .sortWithinPartitions("user_id", "ts", "event_id")
    )

    def streaks(batches):
        best: dict = {}
        carry_user = carry_type = None
        carry_run = 0
        for pdf in batches:
            n = len(pdf)
            if n == 0:
                continue
            u = pdf["user_id"].to_numpy()
            t = pdf["event_type"].to_numpy()
            new_run = np.r_[True, (u[1:] != u[:-1]) | (t[1:] != t[:-1])]
            starts = np.flatnonzero(new_run)
            run_lens = np.diff(np.r_[starts, n])
            run_users = u[starts]
            if carry_user is not None and u[0] == carry_user and t[0] == carry_type:
                run_lens[0] += carry_run
            carry_user, carry_type, carry_run = u[-1], t[-1], int(run_lens[-1])
            per_user = pd.Series(run_lens).groupby(run_users, sort=False).max()
            for user, m in per_user.items():
                if m > best.get(user, 0):
                    best[user] = int(m)
        if best:
            yield pd.DataFrame({"user_id": list(best.keys()),
                                "max_streak": list(best.values())})

    return ev.mapInPandas(streaks, "user_id long, max_streak long")


# --------------------------------------------------------------------------
# Bounce-rate report by session entry type — the landing-page analysis
# every engagement pipeline runs: group sessions by the event type that
# OPENED them and report how many ended after a single event. The entry
# type rides the is_new flag with_session_seq already computes (a
# session's first event is exactly its is_new=1 row), so no second
# window on a different key: the whole query is the one user_id shuffle
# the sessionizer pays anyway, then an entry-type-sized aggregate.
# Bounce rate is exact integer permille (positive, so DuckDB's // and
# Spark's div agree).
# --------------------------------------------------------------------------
@query(
    "session_bounce_stats",
    oracle=_SESSION_CTE + """
    , per_session AS (
        SELECT user_id, session_seq,
               COUNT(*) AS n_events,
               MAX(CASE WHEN is_new = 1 THEN event_type END) AS entry_type
        FROM sessioned GROUP BY 1, 2
    )
    SELECT entry_type AS entry_type,
           CAST(COUNT(*) AS BIGINT) AS n_sessions,
           CAST(COUNT(*) FILTER (WHERE n_events = 1) AS BIGINT) AS n_bounces,
           CAST((1000 * COUNT(*) FILTER (WHERE n_events = 1)) // COUNT(*)
                AS BIGINT) AS bounce_milli,
           CAST(MAX(n_events) AS BIGINT) AS max_session_len
    FROM per_session GROUP BY entry_type
    """,
)
def session_bounce_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sessions, bounces (single-event sessions), and exact permille
    bounce rate per session entry event type.

    A NULL-typed entry event groups under the NULL entry_type on both
    engines (MAX ignores NULLs identically; GROUP BY keeps the NULL
    key identically). Plan shape: one user_id shuffle (the sessionizer
    windows), one (user, session)-level partial aggregate riding the
    same partitioning, then an |event types|-row rollup."""
    ev = load_table(spark, sf_dir, "events")
    per_session = (
        with_session_seq(ev)
        .groupBy("user_id", "session_seq")
        .agg(F.count(F.lit(1)).alias("n_events"),
             F.max(F.when(F.col("is_new") == 1, F.col("event_type")))
             .alias("entry_type"))
    )
    bounces = F.count(F.when(F.col("n_events") == 1, True))
    return (per_session.groupBy("entry_type")
            .agg(F.count(F.lit(1)).cast("long").alias("n_sessions"),
                 bounces.cast("long").alias("n_bounces"),
                 (F.lit(1000) * bounces).alias("__b1000"),
                 F.max("n_events").cast("long").alias("max_session_len"))
            .select("entry_type", "n_sessions", "n_bounces",
                    F.expr("__b1000 div n_sessions").cast("long")
                    .alias("bounce_milli"),
                    "max_session_len"))

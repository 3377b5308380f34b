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
    Deterministic ordering: (ts, event_id)."""
    w = Window.partitionBy("user_id").orderBy(F.asc("ts"), F.asc("event_id"))
    prev_ts = F.lag(F.col("ts")).over(w)
    gap = F.col("ts").cast("long") - prev_ts.cast("long")
    is_new = F.when(prev_ts.isNull() | (gap > gap_seconds), 1).otherwise(0)
    cum = Window.partitionBy("user_id").orderBy(F.asc("ts"), F.asc("event_id")) \
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return ev.withColumn("session_seq", F.sum(is_new).over(cum))


_SESSION_CTE = f"""
    WITH ordered AS (
        SELECT user_id, event_id, ts, value,
               lag(ts) OVER (PARTITION BY user_id ORDER BY ts ASC, event_id ASC) AS prev_ts
        FROM events
    ), flagged AS (
        SELECT *, CASE WHEN prev_ts IS NULL
                         OR date_diff('second', prev_ts, ts) > {GAP_SECONDS}
                       THEN 1 ELSE 0 END AS is_new
        FROM ordered
    ), sessioned AS (
        SELECT user_id, event_id, ts, value,
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

"""Time-series operators over the events table: calendar densification
(gap filling), cube grouping, JSON struct flattening, and TF-IDF relevance
scoring on documents — rounding out the warehouse/text-analytics surface.
"""

from __future__ import annotations


from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from cliqz_etl_spark.queries import query
from cliqz_etl_spark.tables import load_table


@query(
    "daily_activity_filled",
    oracle="""
    WITH spans AS (
        SELECT user_id, MIN(CAST(ts AS DATE)) AS d0, MAX(CAST(ts AS DATE)) AS d1
        FROM events GROUP BY user_id
    ), calendar AS (
        SELECT user_id,
               CAST(unnest(generate_series(d0, d1, INTERVAL 1 DAY)) AS DATE) AS day
        FROM spans
    ), actual AS (
        SELECT user_id, CAST(ts AS DATE) AS day, COUNT(*) AS n
        FROM events GROUP BY 1, 2
    )
    SELECT c.user_id AS user_id, strftime(c.day, '%Y-%m-%d') AS day,
           COALESCE(a.n, 0) AS n_events
    FROM calendar c LEFT JOIN actual a ON a.user_id = c.user_id AND a.day = c.day
    """,
)
def daily_activity_filled(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Calendar densification: one row per user per day across the user's
    active span, zero-filled — the resample/gap-fill primitive every
    time-series rollup needs. The calendar is generated columnar
    (sequence + explode over the per-user [min,max] span), so its size is
    bounded by span x users, never by raw event count."""
    ev = load_table(spark, sf_dir, "events")
    spans = ev.groupBy("user_id").agg(
        F.min(F.col("ts").cast("date")).alias("d0"),
        F.max(F.col("ts").cast("date")).alias("d1"),
    )
    calendar = spans.select(
        "user_id",
        F.explode(F.sequence("d0", "d1", F.expr("interval 1 day"))).alias("day"),
    )
    actual = ev.groupBy(
        "user_id", F.col("ts").cast("date").alias("day")
    ).agg(F.count(F.lit(1)).alias("n"))
    return (
        calendar.join(actual, ["user_id", "day"], "left")
        .select(
            "user_id",
            F.date_format("day", "yyyy-MM-dd").alias("day"),
            F.coalesce("n", F.lit(0)).alias("n_events"),
        )
    )


@query(
    "order_cube",
    oracle="""
    SELECT o_orderstatus AS o_orderstatus, o_orderpriority AS o_orderpriority,
           COUNT(*) AS n
    FROM orders
    GROUP BY CUBE (o_orderstatus, o_orderpriority)
    """,
)
def order_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full CUBE grouping sets (rollup's sibling, §2.8 extension)."""
    orders = load_table(spark, sf_dir, "orders")
    return orders.cube("o_orderstatus", "o_orderpriority").agg(
        F.count(F.lit(1)).alias("n")
    )


@query(
    "json_flatten",
    oracle="""
    SELECT event_id AS event_id,
           CAST(json_extract(props, '$.k') AS BIGINT) AS k,
           (CAST(json_extract(props, '$.k') AS BIGINT) % 10 = 0) AS k_round
    FROM events
    WHERE CAST(json_extract(props, '$.k') AS BIGINT) IS NOT NULL
    """,
)
def json_flatten(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON-string column -> typed struct via from_json with an explicit
    schema (the columnar rebuild of get_pings_properties for JSON blobs;
    one parse per row, pruned to the referenced field)."""
    ev = load_table(spark, sf_dir, "events")
    parsed = ev.select(
        "event_id", F.from_json("props", "k bigint").alias("p")
    )
    return (
        parsed.where(F.col("p.k").isNotNull())
        .select(
            "event_id",
            F.col("p.k").alias("k"),
            (F.col("p.k") % 10 == 0).alias("k_round"),
        )
    )


# TF-IDF: fixed query vocabulary, ln-idf over document frequency. The
# doubles are deterministic (same ln inputs both engines; per-doc products
# in fixed term order) and the output is floor-quantized.
_QUERY_TERMS = ["spark", "join", "vector"]


def _terms_sql() -> str:
    return ", ".join(f"'{t}'" for t in _QUERY_TERMS)


@query(
    "tfidf_search",
    oracle=f"""
    WITH tok AS (
        SELECT doc_id, unnest(string_split_regex(trim(text), '\\s+')) AS w
        FROM documents
    ), tf AS (
        SELECT doc_id, w, COUNT(*) AS tf FROM tok
        WHERE w IN ({_terms_sql()}) GROUP BY 1, 2
    ), df AS (
        SELECT w, COUNT(DISTINCT doc_id) AS df FROM tok
        WHERE w IN ({_terms_sql()}) GROUP BY 1
    ), n AS (SELECT COUNT(*) AS n_docs FROM documents)
    SELECT tf.doc_id AS doc_id,
           CAST(SUM(CAST(floor(tf.tf * ln(CAST(n.n_docs AS DOUBLE) / df.df) * 10000 + 0.5) AS BIGINT)) AS BIGINT)
               AS score_x10k
    FROM tf JOIN df ON df.w = tf.w CROSS JOIN n
    GROUP BY tf.doc_id
    HAVING SUM(CAST(floor(tf.tf * ln(CAST(n.n_docs AS DOUBLE) / df.df) * 10000 + 0.5) AS BIGINT)) > 0
    """,
)
def tfidf_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TF-IDF relevance of every document against a fixed query vocabulary
    — inverted-index scoring, the retrieval primitive for corpus search.
    Per-term scores are floor-quantized BEFORE the sum (integer
    aggregation: a double sum's order varies with partitioning). The
    corpus size enters the plan as a 1-row count aggregate broadcast
    cross-joined in — NOT a driver-side .count(), which would run an
    extra full-scan job per invocation and pin a scalar on the driver."""
    from cliqz_etl_spark.functions.text import tokens

    docs = load_table(spark, sf_dir, "documents")
    n = docs.agg(F.count(F.lit(1)).cast("double").alias("n_docs"))
    # round-13: filter BEFORE the explode (same multiset — filter keeps
    # duplicates; non-query tokens never materialize as rows)
    _terms_arr = F.array(*[F.lit(t) for t in _QUERY_TERMS])
    tok = docs.select(
        "doc_id",
        F.explode(F.filter(tokens("text"),
                           lambda w: F.array_contains(_terms_arr, w)))
        .alias("w"))
    tf = tok.groupBy("doc_id", "w").agg(F.count(F.lit(1)).alias("tf"))
    df_ = tok.groupBy("w").agg(F.countDistinct("doc_id").alias("df"))
    scored = (
        tf.join(F.broadcast(df_), "w")
        .crossJoin(F.broadcast(n))
        .withColumn("idf", F.log(F.col("n_docs") / F.col("df")))
        .groupBy("doc_id")
        .agg(F.sum(F.floor(F.col("tf") * F.col("idf") * 10000 + 0.5).cast("long"))
             .cast("long").alias("score_x10k"))
        .where(F.col("score_x10k") > 0)
    )
    return scored


@query(
    "sliding_event_counts",
    oracle="""
    WITH slotted AS (
        SELECT event_type,
               to_timestamp(CAST(floor(epoch(ts) / 1800) AS BIGINT) * 1800) AS slot
        FROM events WHERE ts IS NOT NULL
    ), expanded AS (
        -- each event falls in two 1h-wide windows on the 30-min grid:
        -- the one starting at its slot and the one starting 30 min before
        SELECT event_type, slot AS window_start FROM slotted
        UNION ALL
        SELECT event_type, slot - INTERVAL 30 MINUTE FROM slotted
    )
    SELECT strftime(window_start, '%Y-%m-%d %H:%M:%S') AS window_start,
           event_type AS event_type, COUNT(*) AS n_events
    FROM expanded GROUP BY 1, 2
    """,
)
def sliding_event_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding windows (1 h wide, 30 min slide): every event contributes to
    two overlapping windows. Spark's window(slideDuration) materializes
    exactly that expansion; the oracle derives both slots arithmetically."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "1 hour", "30 minutes").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.date_format(F.col("w.start"), "yyyy-MM-dd HH:mm:ss").alias("window_start"),
            "event_type", "n_events",
        )
    )


@query(
    "moving_avg_value",
    oracle="""
    SELECT event_id AS event_id, user_id AS user_id,
           CAST(floor(AVG(value) OVER (PARTITION BY user_id
                                       ORDER BY ts ASC, event_id ASC
                                       ROWS BETWEEN 4 PRECEDING AND CURRENT ROW)
                      * 10000 + 0.5) AS BIGINT) AS ma5_x10k
    FROM events WHERE ts IS NOT NULL
    """,
)
def moving_avg_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """5-row moving average per user — a bounded ROWS frame; the frame's
    accumulation order is the window order, so the double math is
    deterministic across engines (unlike grouped sums). NULL-ts rows are
    excluded on both sides (fuzz-pinned NULL-ordering divergence)."""
    ev = load_table(spark, sf_dir, "events").where(F.col("ts").isNotNull())
    w = (
        Window.partitionBy("user_id").orderBy(F.asc("ts"), F.asc("event_id"))
        .rowsBetween(-4, Window.currentRow)
    )
    return ev.select(
        "event_id", "user_id",
        F.floor(F.avg("value").over(w) * 10000 + 0.5).cast("long").alias("ma5_x10k"),
    )


# --------------------------------------------------------------------------
# Linear-interpolation gap fill — the numeric sibling of the zero-fill
# above: missing days between two observed days take the straight-line
# value between them (exact integer arithmetic: floor of the rational
# interpolant, so both engines agree bit-for-bit); leading/trailing gaps
# clamp to the nearest observation. Two IGNORE NULLS window scans (one
# backward, one forward) over the densified calendar — no self-join, one
# shuffle on user_id shared by both windows.
# --------------------------------------------------------------------------
@query(
    "interpolate_user_values",
    oracle="""
    WITH spans AS (
        SELECT user_id, MIN(CAST(ts AS DATE)) AS d0, MAX(CAST(ts AS DATE)) AS d1
        FROM events GROUP BY user_id
    ), calendar AS (
        SELECT user_id,
               CAST(unnest(generate_series(d0, d1, INTERVAL 1 DAY)) AS DATE) AS day
        FROM spans
    ), actual AS (
        SELECT user_id, CAST(ts AS DATE) AS day,
               CAST(SUM(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT) AS cents
        FROM events GROUP BY 1, 2
    ), joined AS (
        SELECT c.user_id, c.day, a.cents,
               date_diff('day', DATE '2024-01-01', c.day) AS dn
        FROM calendar c LEFT JOIN actual a ON a.user_id = c.user_id AND a.day = c.day
    ), ctx AS (
        SELECT user_id, day, cents, dn,
               last_value(cents IGNORE NULLS) OVER wb AS pv,
               last_value(CASE WHEN cents IS NOT NULL THEN dn END IGNORE NULLS) OVER wb AS pd,
               first_value(cents IGNORE NULLS) OVER wf AS nv,
               first_value(CASE WHEN cents IS NOT NULL THEN dn END IGNORE NULLS) OVER wf AS nd
        FROM joined
        WINDOW wb AS (PARTITION BY user_id ORDER BY dn
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
               wf AS (PARTITION BY user_id ORDER BY dn
                      ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
    )
    SELECT user_id AS user_id, strftime(day, '%Y-%m-%d') AS day,
           CAST(CASE
                WHEN cents IS NOT NULL THEN cents
                WHEN pv IS NULL THEN nv
                WHEN nv IS NULL THEN pv
                ELSE pv + CAST(floor(CAST((nv - pv) * (dn - pd) AS DOUBLE)
                                     / (nd - pd)) AS BIGINT)
                END AS BIGINT) AS cents_filled,
           (cents IS NULL) AS interpolated
    FROM ctx
    """,
)
def interpolate_user_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user daily value series with straight-line integer interpolation
    across gaps (endpoints clamp). The interpolant is
    pv + floor((nv-pv)*(d-pd)/(nd-pd)) on exact integers."""
    ev = load_table(spark, sf_dir, "events")
    spans = ev.groupBy("user_id").agg(
        F.min(F.col("ts").cast("date")).alias("d0"),
        F.max(F.col("ts").cast("date")).alias("d1"),
    )
    calendar = spans.select(
        "user_id",
        F.explode(F.sequence("d0", "d1", F.expr("interval 1 day"))).alias("day"),
    )
    actual = ev.groupBy(
        "user_id", F.col("ts").cast("date").alias("day")
    ).agg(F.sum(F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long"))
          .cast("long").alias("cents"))
    joined = (
        calendar.join(actual, ["user_id", "day"], "left")
        .withColumn("dn", F.datediff("day", F.lit("2024-01-01").cast("date")).cast("long"))
    )
    wb = (Window.partitionBy("user_id").orderBy("dn")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    wf = (Window.partitionBy("user_id").orderBy("dn")
          .rowsBetween(Window.currentRow, Window.unboundedFollowing))
    known_dn = F.when(F.col("cents").isNotNull(), F.col("dn"))
    ctx = joined.select(
        "user_id", "day", "cents", "dn",
        F.last("cents", ignorenulls=True).over(wb).alias("pv"),
        F.last(known_dn, ignorenulls=True).over(wb).alias("pd"),
        F.first("cents", ignorenulls=True).over(wf).alias("nv"),
        F.first(known_dn, ignorenulls=True).over(wf).alias("nd"),
    )
    interp = (
        F.col("pv")
        + F.floor((F.col("nv") - F.col("pv")).cast("double")
                  * (F.col("dn") - F.col("pd")).cast("double")
                  / (F.col("nd") - F.col("pd")).cast("double")).cast("long")
    )
    filled = (
        F.when(F.col("cents").isNotNull(), F.col("cents"))
        .when(F.col("pv").isNull(), F.col("nv"))
        .when(F.col("nv").isNull(), F.col("pv"))
        .otherwise(interp)
    )
    return ctx.select(
        "user_id",
        F.date_format("day", "yyyy-MM-dd").alias("day"),
        filled.cast("long").alias("cents_filled"),
        F.col("cents").isNull().alias("interpolated"),
    )


# --------------------------------------------------------------------------
# Okapi BM25 — the default ranking function of every production search
# engine (Lucene/Elasticsearch), upgrading tfidf_search with document-
# length normalization and tf saturation. Written to be integer-exact:
# with k1 = 6/5 and b = 3/4, the per-term factor
#     tf*(k1+1) / (tf + k1*(1 - b + b*dl/avgdl))
# multiplies out (by 10*S, S = total corpus tokens, avgdl = S/N) to
#     22*tf*S / (10*S*tf + 3*S + 9*dl*N)
# — a ratio of exact BIGINT products — and Lucene's always-positive idf
#     ln(1 + (N - df + 0.5)/(df + 0.5)) = ln((2N+2)/(2df+1))
# also takes exact integer arguments. The per-(doc, term) score is
# micro-quantized before the integer sum (the tfidf discipline).
# --------------------------------------------------------------------------
def _bm25_term_sql(dl_expr: str = "dl") -> str:
    """Shared per-(doc, term) BM25 fragment. ``dl_expr`` parameterizes the
    document-length identifier so WAND's upper bound can substitute the
    corpus-minimum length (``dlm``) WITHOUT textual .replace() on the
    rendered SQL — a substring rewrite would silently corrupt the bound
    the moment any future identifier in this fragment contained 'dl'."""
    idf = "ln(CAST(2 * n + 2 AS DOUBLE) / CAST(2 * df + 1 AS DOUBLE))"
    sat = ("(CAST(22 * tf * s AS DOUBLE)"
           f" / CAST(10 * s * tf + 3 * s + 9 * {dl_expr} * n AS DOUBLE))")
    return (f"CAST(floor(1000000 * {idf} * {sat} + 0.5) AS BIGINT)")


def _bm25_corpus_frames(spark: SparkSession, sf_dir: str):
    """(dlen, corp, qt): the three frames every BM25-family query starts
    from, built WITHOUT materializing the corpus token explode.

    The former shape exploded every token of every document into a
    persisted (doc_id, w) frame (corpus-token-sized cache) and then
    re-aggregated it per doc just to recover document lengths. But
    dl is ``size(tokens(text))`` — computable scan-side with no explode
    and no shuffle — and the only tokens any downstream consumer ever
    explodes are the query terms' occurrences (``filter`` keeps the
    multiset, so tf/df counts are unchanged). What persists is one
    doc-grain row (doc_id, dl, _qtk) whose array is empty for the vast
    majority of documents: at 100 TB the cache shrinks from
    corpus-token cardinality to document cardinality, and the
    dlen groupBy exchange disappears outright (guide: shuffle removal
    beats shuffle tuning).

    ``dlen`` is (doc_id, dl) — exactly the docs the old explode+count
    produced (trim(text) != '' guarantees >= 1 token); ``corp`` the
    1-row (s, n) stats; ``qt`` the (doc_id, w) query-term postings."""
    from cliqz_etl_spark.functions.text import tokens
    from cliqz_etl_spark.operators.dedup import _materialize

    docs = load_table(spark, sf_dir, "documents")
    terms = F.array(*[F.lit(t) for t in _QUERY_TERMS])
    per_doc = _materialize(
        docs.where(F.trim(F.col("text")) != "")
        .select("doc_id", tokens("text").alias("_tk"))
        .select("doc_id", F.size("_tk").cast("long").alias("dl"),
                F.filter("_tk", lambda w: F.array_contains(terms, w))
                .alias("_qtk")))
    dlen = per_doc.select("doc_id", "dl")
    corp = dlen.agg(
        F.coalesce(F.sum("dl"), F.lit(0)).cast("long").alias("s"),
        F.count(F.lit(1)).cast("long").alias("n"))
    qt = per_doc.where(F.size("_qtk") > 0).select(
        "doc_id", F.explode("_qtk").alias("w"))
    return dlen, corp, qt


def _query_term_postings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, w) occurrences of the query terms, filtered BEFORE the
    explode: the Generate emits only matching tokens instead of every
    token of the corpus (same multiset as exploding first and filtering
    after — ``filter`` preserves duplicates). For queries that need
    nothing but the query-term postings this is the whole build — one
    map-only projection, no cache, no shuffle."""
    from cliqz_etl_spark.functions.text import tokens

    docs = load_table(spark, sf_dir, "documents")
    terms = F.array(*[F.lit(t) for t in _QUERY_TERMS])
    return (docs.where(F.trim(F.col("text")) != "")
            .select("doc_id",
                    F.explode(F.filter(tokens("text"),
                                       lambda w: F.array_contains(terms, w)))
                    .alias("w")))


@query(
    "bm25_search",
    oracle=f"""
    WITH tok AS (
        SELECT doc_id, unnest(string_split_regex(trim(text), '\\s+')) AS w
        FROM documents WHERE trim(text) <> ''
    ), dlen AS (
        SELECT doc_id, CAST(count(*) AS BIGINT) AS dl FROM tok GROUP BY doc_id
    ), corp AS (
        SELECT CAST(COALESCE(sum(dl), 0) AS BIGINT) AS s,
               CAST(count(*) AS BIGINT) AS n
        FROM dlen
    ), tf AS (
        SELECT doc_id, w, CAST(count(*) AS BIGINT) AS tf FROM tok
        WHERE w IN ({_terms_sql()}) GROUP BY 1, 2
    ), dfreq AS (
        SELECT w, CAST(count(DISTINCT doc_id) AS BIGINT) AS df FROM tok
        WHERE w IN ({_terms_sql()}) GROUP BY 1
    )
    SELECT tf.doc_id AS doc_id,
           CAST(count(*) AS BIGINT) AS n_terms,
           CAST(sum({_bm25_term_sql()}) AS BIGINT) AS bm25_micro
    FROM tf JOIN dfreq USING (w) JOIN dlen USING (doc_id) CROSS JOIN corp
    GROUP BY tf.doc_id
    """,
)
def bm25_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 relevance of every document against the fixed query terms.

    Plan shape (round-13 rebuild via _bm25_corpus_frames): doc lengths
    are size(tokens) scan-side — the corpus token explode and its
    persisted cache are gone, and only query-term occurrences explode;
    df and the 1-row corpus stats broadcast into the tf frame; scoring
    is a map-stage expression and ONE groupBy(doc). The inverted-index
    join is keyed on the query vocabulary, so work scales with postings
    for the query terms, not corpus size — the retrieval shape that
    survives 100 TB."""
    dlen, corp, qt = _bm25_corpus_frames(spark, sf_dir)
    tf = qt.groupBy("doc_id", "w").agg(F.count(F.lit(1)).cast("long").alias("tf"))
    dfreq = qt.groupBy("w").agg(F.countDistinct("doc_id").cast("long").alias("df"))
    return (
        tf.join(F.broadcast(dfreq), "w")
        .join(dlen, "doc_id")
        .crossJoin(F.broadcast(corp))
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).cast("long").alias("n_terms"),
             F.sum(F.expr(_bm25_term_sql())).cast("long").alias("bm25_micro"))
    )


# --------------------------------------------------------------------------
# Per-user EWMA — the exponentially weighted running level every
# monitoring/feature pipeline keeps per entity. Made engine-exact with a
# rational alpha = 1/4 and an INTEGER recurrence:
#     s_t = floor((3*s_{t-1} + v_t) / 4.0)
# folded over the user's time-ordered cent-quantized values (first value
# seeds the state). The one subtlety is negative values: Spark's `div`
# truncates toward zero while DuckDB's `//` floors, so the step divides
# in DOUBLE and floors explicitly — identical IEEE operations on both
# engines, exact below 2^53. The fold runs JVM-side via F.aggregate
# over each user's collected array (array size = events per user, the
# same per-key bound sessionization carries), mirrored by DuckDB's
# list_reduce, which seeds from the first element exactly like the
# explicit slice+init on the Spark side.
# --------------------------------------------------------------------------
@query(
    "ewma_user_value",
    oracle="""
    WITH v AS (
        SELECT user_id, ts, event_id,
               CAST(floor(value * 100 + 0.5) AS BIGINT) AS c
        FROM events
        WHERE user_id IS NOT NULL AND ts IS NOT NULL AND value IS NOT NULL
    ), arr AS (
        SELECT user_id,
               list_transform(list_sort(list({'ts': ts, 'eid': event_id, 'c': c})),
                              x -> x.c) AS cs
        FROM v GROUP BY user_id
    )
    SELECT user_id AS user_id,
           CAST(len(cs) AS BIGINT) AS n_events,
           CAST(list_reduce(cs, (acc, x) ->
                CAST(floor((3 * acc + x) / 4.0) AS BIGINT)) AS BIGINT)
               AS ewma_cents
    FROM arr
    """,
)
def ewma_user_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Final EWMA (alpha=1/4) of each user's value stream, in cents.

    Plan shape: one groupBy(user) collects the time-ordered value array
    (struct sort pins ties by event_id), then the fold is a scan-side
    F.aggregate — no window, no per-step shuffle; per-user state is one
    array, the same per-key memory bound the sessionizers carry. At
    100 TB the fold shape is what a streaming applyInPandasWithState
    EWMA would checkpoint — this is its batch twin."""
    ev = load_table(spark, sf_dir, "events")
    v = (ev.where(F.col("user_id").isNotNull() & F.col("ts").isNotNull()
                  & F.col("value").isNotNull())
         .select("user_id", "ts", "event_id",
                 F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long").alias("c")))
    cs = F.transform(
        F.sort_array(F.collect_list(F.struct("ts", "event_id", "c"))),
        lambda x: x["c"])
    step = lambda acc, x: F.floor((3 * acc + x) / F.lit(4.0)).cast("long")  # noqa: E731
    return (v.groupBy("user_id")
            .agg(cs.alias("cs"))
            .select("user_id",
                    F.size("cs").cast("long").alias("n_events"),
                    F.aggregate(F.expr("slice(cs, 2, size(cs) - 1)"),
                                F.element_at("cs", 1), step)
                    .cast("long").alias("ewma_cents")))


# --------------------------------------------------------------------------
# Theil-Sen trend — the robust regression twin of forecast_revenue's OLS:
# slope = median of all pairwise slopes, immune to ~29% outlier months
# (one wild promo month cannot move it, unlike least squares). The pair
# frame is (n_months choose 2), bounded by the CALENDAR SPAN, not data
# size — ~84 months of TPC-H dates is <= 3.5k pairs — so the global
# median window runs on a constant-size frame (the WAND_K/RRF_L rule).
# The median is presented as the SUM of the two middle elements
# (2x median) so even-count medians stay integer-exact on both engines.
# --------------------------------------------------------------------------
@query(
    "theil_sen_trend",
    oracle="""
    WITH monthly AS (
        SELECT CAST((year(o_orderdate) - 1970) * 12
                    + month(o_orderdate) - 1 AS BIGINT) AS m,
               CAST(SUM(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
                    AS BIGINT) AS cents
        FROM orders WHERE o_orderdate IS NOT NULL AND o_totalprice IS NOT NULL
        GROUP BY 1
    ), pairs AS (
        SELECT a.m AS mi, b.m AS mj,
               CAST(floor(1000000.0 * (b.cents - a.cents)
                          / (b.m - a.m) + 0.5) AS BIGINT) AS slope_micro
        FROM monthly a JOIN monthly b ON b.m > a.m
    ), ranked AS (
        SELECT slope_micro,
               ROW_NUMBER() OVER (ORDER BY slope_micro ASC, mi ASC, mj ASC) AS rn,
               COUNT(*) OVER () AS n
        FROM pairs
    )
    SELECT CAST((SELECT COUNT(*) FROM monthly) AS BIGINT) AS n_months,
           CAST(MAX(n) AS BIGINT) AS n_pairs,
           CAST(SUM(CASE WHEN rn IN ((n + 1) // 2, (n + 2) // 2)
                         THEN slope_micro * (CASE WHEN (n + 1) // 2 = (n + 2) // 2
                                                  THEN 2 ELSE 1 END)
                         ELSE 0 END) AS BIGINT) AS slope_micro_x2
    FROM ranked
    """,
)
def theil_sen_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Median-of-pairwise-slopes revenue trend (cents/month, micro-
    quantized, presented as 2x the median). Monthly rollup is one
    map-side-combined groupBy; the pair join broadcasts the tiny monthly
    frame against itself; the median window ranks a calendar-bounded
    frame."""
    o = load_table(spark, sf_dir, "orders")
    monthly = (o.where(F.col("o_orderdate").isNotNull()
                       & F.col("o_totalprice").isNotNull())
               .groupBy(((F.year("o_orderdate") - 1970) * 12
                         + F.month("o_orderdate") - 1).cast("long").alias("m"))
               .agg(F.sum(F.floor(F.col("o_totalprice") * 100 + F.lit(0.5))
                          .cast("long")).cast("long").alias("cents")))
    from cliqz_etl_spark.operators.cache import track
    monthly = track(monthly.persist())
    a = monthly.select(F.col("m").alias("mi"), F.col("cents").alias("ci"))
    b = monthly.select(F.col("m").alias("mj"), F.col("cents").alias("cj"))
    pairs = (a.join(F.broadcast(b), F.col("mj") > F.col("mi"))
             .select("mi", "mj",
                     F.floor(F.lit(1000000.0)
                             * (F.col("cj") - F.col("ci"))
                             / (F.col("mj") - F.col("mi")) + F.lit(0.5))
                     .cast("long").alias("slope_micro")))
    w = Window.orderBy(F.asc("slope_micro"), F.asc("mi"), F.asc("mj"))
    ranked = pairs.select(
        "slope_micro", "mi", "mj",
        F.row_number().over(w).alias("rn"),
        F.count(F.lit(1)).over(Window.partitionBy()).alias("n"))
    lo = F.expr("(n + 1) div 2")
    hi = F.expr("(n + 2) div 2")
    mid = F.when(F.col("rn") == lo,
                 F.when(lo == hi, F.col("slope_micro") * 2)
                 .otherwise(F.col("slope_micro"))) \
        .when(F.col("rn") == hi, F.col("slope_micro")) \
        .otherwise(F.lit(0))
    # month count rides as a 1-row aggregate crossJoined AFTER the pair
    # aggregation (both global aggs emit exactly one row even on empty
    # input, so a single-month corpus still yields the oracle's
    # (n_months, NULL, NULL) row) — never a driver-side .count() job.
    nm = monthly.agg(F.count(F.lit(1)).cast("long").alias("n_months"))
    pair_agg = ranked.agg(
        F.max("n").cast("long").alias("n_pairs"),
        F.sum(mid).cast("long").alias("slope_micro_x2"))
    return (nm.crossJoin(F.broadcast(pair_agg))
            .select("n_months", "n_pairs", "slope_micro_x2"))


# --------------------------------------------------------------------------
# 7-day sliding distinct users per day — the rolling-reach metric a
# count-over-window cannot express (COUNT(DISTINCT) is not frame-able in
# either engine). The scalable shape: collapse to distinct (user, day)
# first (the only data-sized aggregate), explode each into the <=7
# window-end days it serves, and count distinct per window day. The
# day spine is calendar-sized, so its join side broadcasts at any data
# scale; the final distinct-count shuffles on (day, user) — bounded by
# 7x the distinct (user, day) frame, never by raw event volume.
# --------------------------------------------------------------------------
@query(
    "sliding_distinct_users",
    oracle="""
    WITH ud AS (
        SELECT DISTINCT user_id, CAST(ts AS DATE) AS d
        FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL
    ), days AS (SELECT DISTINCT d FROM ud),
    x AS (
        SELECT days.d AS day, ud.user_id AS user_id
        FROM ud JOIN days ON ud.d BETWEEN days.d - 6 AND days.d
    )
    SELECT strftime(day, '%Y-%m-%d') AS day,
           CAST(count(DISTINCT user_id) AS BIGINT) AS n_users_7d
    FROM x GROUP BY 1
    """,
)
def sliding_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct users active in the trailing 7 days, per observed day.

    Plan shape: one distinct over (user, day), a 7-way arithmetic
    explode (no range join — each activity day knows exactly which
    window days it serves), a broadcast semi-join against the observed
    day spine, and one distinct-count shuffle keyed (day, user). The
    oracle expresses the same expansion as a BETWEEN join, which DuckDB
    executes fine at oracle scale but Spark would plan as a range join —
    the explode is the 100 TB form."""
    from cliqz_etl_spark.operators.dedup import _materialize

    ev = load_table(spark, sf_dir, "events")
    # the (user, day) distinct is the only data-sized pass; both the day
    # spine and the expansion read it, so persist it rather than paying
    # the event scan twice.
    ud = _materialize(
        ev.where(F.col("user_id").isNotNull() & F.col("ts").isNotNull())
        .select("user_id", F.to_date("ts").alias("d")).distinct())
    days = ud.select(F.col("d").alias("day")).distinct()
    expanded = ud.select(
        "user_id",
        F.explode(F.expr("sequence(d, date_add(d, 6))")).alias("day"))
    return (expanded.join(F.broadcast(days), "day")
            .groupBy("day")
            .agg(F.countDistinct("user_id").cast("long").alias("n_users_7d"))
            .select(F.date_format("day", "yyyy-MM-dd").alias("day"),
                    "n_users_7d"))


# --------------------------------------------------------------------------
# Trailing-hour RANGE-frame sum — the time-window running aggregate a
# ROWS frame cannot express (the frame must hold "every event within
# 3600 s", not "the last N events"). Values go through the cents
# discipline BEFORE the frame sum: a RANGE frame is a SET of rows, and
# tied timestamps make the double-accumulation order engine-arbitrary —
# integer sums are order-free. The frame axis is WHOLE SECONDS on both
# engines: Spark's unix_timestamp truncates, and the oracle floors
# epoch()'s fractional DOUBLE explicitly — left un-floored, a .9-vs-.1
# microsecond pair straddling the 3600 s boundary lands in different
# frames per engine. NULL ts excluded (no position on the
# time axis), NULL value sums as 0 via the cents CASE on both sides.
# --------------------------------------------------------------------------
@query(
    "trailing_hour_value",
    oracle="""
    SELECT event_id AS event_id, user_id AS user_id,
           CAST(SUM(CASE WHEN value IS NULL THEN 0
                         ELSE CAST(floor(value * 100 + 0.5) AS BIGINT) END)
                OVER (PARTITION BY user_id
                      ORDER BY CAST(floor(epoch(ts)) AS BIGINT) ASC
                      RANGE BETWEEN 3599 PRECEDING AND CURRENT ROW)
                AS BIGINT) AS trail1h_cents
    FROM events WHERE ts IS NOT NULL
    """,
)
def trailing_hour_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event trailing-1-hour spend (cents) per user — a true RANGE
    frame over epoch seconds.

    Plan shape: one shuffle on user_id, one running-frame pass per
    partition; the frame bound is value-based so Spark keeps a sliding
    aggregate buffer over at most one hour of rows per user. At 100 TB
    the per-user partition is the unit of work exactly as in the as-of
    join; a pathological single-user firehose would call for the same
    key-salting the sessionize family documents."""
    ev = load_table(spark, sf_dir, "events").where(F.col("ts").isNotNull())
    cents = (F.when(F.col("value").isNull(), F.lit(0))
             .otherwise(F.floor(F.col("value") * 100 + F.lit(0.5)))
             .cast("long"))
    w = (Window.partitionBy("user_id")
         .orderBy(F.unix_timestamp("ts").asc())
         .rangeBetween(-3599, Window.currentRow))
    return ev.select(
        "event_id", "user_id",
        F.sum(cents).over(w).cast("long").alias("trail1h_cents"))


# --------------------------------------------------------------------------
# Day-of-week seasonal decomposition (STL-lite): daily revenue splits
# into trend (centered 7-day moving average), weekday seasonality (the
# mean detrended value per day-of-week), and residual. Everything after
# the one daily aggregate is CALENDAR-sized, so the unpartitioned
# centered window is a model-sized single task by construction — the
# same justification as the 10-row decile frame. The decomposition is
# exact integer arithmetic after one milli-quantization of the trend:
# detrended and residual are integer differences, and the seasonal mean
# quantizes the only other double. Day-of-week is days-since-a-known-
# Monday mod 7 (the chi2_independence discipline — never engine dow()).
# --------------------------------------------------------------------------
@query(
    "seasonal_decompose",
    oracle="""
    WITH daily AS (
        SELECT CAST(o_orderdate AS DATE) AS day,
               CAST(SUM(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
                    AS BIGINT) AS cents
        FROM orders WHERE o_orderdate IS NOT NULL GROUP BY 1
    ), tr AS (
        SELECT day, cents,
               CAST(floor(AVG(CAST(cents AS DOUBLE)) OVER (
                   ORDER BY day ASC
                   ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING) * 1000 + 0.5)
                   AS BIGINT) AS trend_milli
        FROM daily
    ), det AS (
        SELECT day, cents, trend_milli,
               cents * 1000 - trend_milli AS detrended_milli,
               CAST((day - DATE '1970-01-05') % 7 AS BIGINT) AS dow
        FROM tr
    ), seas AS (
        SELECT dow,
               CAST(floor(AVG(CAST(detrended_milli AS DOUBLE)) + 0.5)
                    AS BIGINT) AS seasonal_milli
        FROM det GROUP BY 1
    )
    SELECT strftime(d.day, '%Y-%m-%d') AS day, d.cents AS cents,
           d.trend_milli AS trend_milli, s.seasonal_milli AS seasonal_milli,
           CAST(d.detrended_milli - s.seasonal_milli AS BIGINT)
               AS residual_milli
    FROM det d JOIN seas s ON s.dow = d.dow
    """,
)
def seasonal_decompose(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily revenue decomposed into centered-MA trend, weekday
    seasonality, and residual (all milli-cents, exact integers).

    Plan shape: ONE data-sized aggregate (daily cents with map-side
    combine); the centered window, the dow means, and the join-back all
    run on the calendar-sized day frame. Edge days keep their partial
    centered window (3-4 neighbors) — deterministic and mirrored, the
    standard moving-average boundary convention."""
    orders = load_table(spark, sf_dir, "orders")
    daily = (orders.where(F.col("o_orderdate").isNotNull())
             .groupBy(F.to_date("o_orderdate").alias("day"))
             .agg(F.sum(F.floor(F.col("o_totalprice") * 100 + F.lit(0.5))
                        .cast("long")).cast("long").alias("cents")))
    wtr = Window.orderBy(F.asc("day")).rowsBetween(-3, 3)
    det = (daily
           .withColumn("trend_milli",
                       F.floor(F.avg(F.col("cents").cast("double")).over(wtr)
                               * 1000 + F.lit(0.5)).cast("long"))
           .withColumn("detrended_milli",
                       F.col("cents") * 1000 - F.col("trend_milli"))
           .withColumn("dow", F.expr(
               "CAST(pmod(datediff(day, DATE '1970-01-05'), 7) AS BIGINT)")))
    seas = det.groupBy("dow").agg(
        F.floor(F.avg(F.col("detrended_milli").cast("double")) + F.lit(0.5))
        .cast("long").alias("seasonal_milli"))
    return (det.join(F.broadcast(seas), "dow")
            .select(F.date_format("day", "yyyy-MM-dd").alias("day"),
                    "cents", "trend_milli", "seasonal_milli",
                    (F.col("detrended_milli") - F.col("seasonal_milli"))
                    .cast("long").alias("residual_milli")))


# --------------------------------------------------------------------------
# Autocorrelation function of daily revenue, lags 1-7 — the seasonality
# screen a forecasting pipeline runs before choosing model structure
# (a weekly cycle shows as a lag-7 spike). The series is the CALENDAR-
# bounded daily rollup (one map-side-combined groupBy over orders, the
# theil_sen discipline), so every downstream step — the 1-row mean, the
# 7-way lag pairing, the per-lag aggregate — runs on a ~2.4k-row frame
# regardless of corpus size. Lag pairs join on day arithmetic (d + k),
# not row adjacency, so calendar gaps pair nothing instead of silently
# pairing non-adjacent days. Centering uses the floor-integer mean
# (exact on both engines); each acf value is ONE double division of two
# exact BIGINTs, milli-quantized round-half-up. The daily series is
# held in KILOcents: at sf0.01 the cents-level sum-of-squares already
# exceeds BIGINT (measured 1.2e19 — DuckDB raises, Spark silently
# wraps), and the /1000 truncation (positive operands, so Spark div and
# DuckDB // agree) costs ~nothing against day-level totals while buying
# six orders of magnitude of envelope.
# --------------------------------------------------------------------------
ACF_MAX_LAG = 7


@query(
    "acf_daily_revenue",
    oracle=f"""
    WITH daily AS (
        SELECT CAST(date_diff('day', DATE '1970-01-01', o_orderdate)
                    AS BIGINT) AS d,
               CAST(SUM(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
                    // 1000 AS BIGINT) AS kcents
        FROM orders WHERE o_orderdate IS NOT NULL AND o_totalprice IS NOT NULL
        GROUP BY 1
    ), stats AS (
        SELECT CAST(count(*) AS BIGINT) AS n_days,
               CAST(SUM(kcents) // count(*) AS BIGINT) AS xbar
        FROM daily
    ), centered AS (
        SELECT d, kcents - xbar AS cx FROM daily CROSS JOIN stats
    ), s0 AS (
        SELECT CAST(SUM(cx * cx) AS BIGINT) AS sxx FROM centered
    ), lags AS (
        SELECT a.d AS d, k.lag AS lag, a.cx AS cxa, b.cx AS cxb
        FROM centered a
        CROSS JOIN (SELECT unnest(range(1, {ACF_MAX_LAG} + 1)) AS lag) k
        JOIN centered b ON b.d = a.d + k.lag
    )
    SELECT lag AS lag,
           CAST(count(*) AS BIGINT) AS n_pairs,
           (SELECT n_days FROM stats) AS n_days,
           CAST(floor(1000.0 * SUM(cxa * cxb) / (SELECT sxx FROM s0) + 0.5)
                AS BIGINT) AS acf_milli
    FROM lags GROUP BY lag
    """,
)
def acf_daily_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily-revenue autocorrelation at lags 1-7 (milli-quantized), with
    the pair count actually observed per lag.

    Plan shape: orders collapse to the calendar-bounded daily frame in
    one partial-aggregated shuffle; the day frame self-joins via a
    broadcast (it is tiny by construction) after a 7x lag explode; the
    final aggregate is 7 rows. Integer envelope: cx^2 stays in BIGINT up
    to ~6e7 daily kilocents (~$600M/day); past that widen the /1000
    quantizer or shift sxx/sk to a shared double tree (the roc_auc
    note)."""
    from cliqz_etl_spark.operators.dedup import _materialize

    o = load_table(spark, sf_dir, "orders")
    daily = (o.where(F.col("o_orderdate").isNotNull()
                     & F.col("o_totalprice").isNotNull())
             .groupBy(F.datediff("o_orderdate", F.lit("1970-01-01"))
                      .cast("long").alias("d"))
             .agg(F.expr("sum(cast(floor(o_totalprice * 100 + 0.5) as long)) "
                         "div 1000").cast("long").alias("kcents")))
    daily = _materialize(daily)
    stats = daily.agg(
        F.count(F.lit(1)).cast("long").alias("n_days"),
        F.expr("sum(kcents) div count(*)").cast("long").alias("xbar"))
    centered = (daily.crossJoin(F.broadcast(stats))
                .select("d", (F.col("kcents") - F.col("xbar")).alias("cx"),
                        "n_days"))
    centered = _materialize(centered)
    s0 = centered.agg(F.sum(F.col("cx") * F.col("cx")).cast("long")
                      .alias("sxx"))
    lagged = (centered
              .select("d", "cx", "n_days",
                      F.explode(F.sequence(F.lit(1), F.lit(ACF_MAX_LAG)))
                      .alias("lag"))
              .alias("a")
              .join(F.broadcast(centered.select(F.col("d").alias("bd"),
                                                F.col("cx").alias("cxb"))),
                    F.col("a.d") + F.col("lag") == F.col("bd")))
    return (lagged.crossJoin(F.broadcast(s0))
            .groupBy("lag")
            .agg(F.count(F.lit(1)).cast("long").alias("n_pairs"),
                 F.max("n_days").cast("long").alias("n_days"),
                 F.floor(F.lit(1000.0) * F.sum(F.col("cx") * F.col("cxb"))
                         / F.max("sxx") + 0.5).cast("long")
                 .alias("acf_milli"))
            .select("lag", "n_pairs", "n_days", "acf_milli"))


# --------------------------------------------------------------------------
# Holt double-exponential smoothing over monthly revenue — the classic
# level+trend forecaster (the one forecast_revenue's OLS line can't
# follow when the trend drifts). The recurrence
#   l_t = (A*x_t + (1000-A)*(l_{t-1} + b_{t-1})) // 1000
#   b_t = (B*(l_t - l_{t-1}) + (1000-B)*b_{t-1}) // 1000
# is sequential by nature — the one shape windows cannot express — so
# it folds on the DRIVER over the collected month frame (calendar-
# bounded at any corpus scale) in exact integer cents, and the oracle
# replays the identical fold through a WITH RECURSIVE CTE (the
# kaplan_meier discipline). Division discipline (measured, round 11):
# DuckDB's INTEGER // TRUNCATES toward zero ((-7)//2 = -3) even though
# its DOUBLE // floors — so the driver fold must truncate too, not use
# Python's flooring // ; with the trend term negative on declining
# months the off-by-one otherwise compounds through every later step
# (first attempt drifted 8 cents by month 80). The h=1..3 forecasts
# ride the final row as extra columns.
# --------------------------------------------------------------------------
HOLT_ALPHA_MILLI = 300
HOLT_BETA_MILLI = 100


@query(
    "holt_linear_forecast",
    oracle=f"""
    WITH RECURSIVE monthly AS (
        SELECT CAST((year(o_orderdate) - 1970) * 12
                    + month(o_orderdate) - 1 AS BIGINT) AS m,
               strftime(date_trunc('month', o_orderdate), '%Y-%m') AS month,
               CAST(SUM(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
                    AS BIGINT) AS cents
        FROM orders WHERE o_orderdate IS NOT NULL AND o_totalprice IS NOT NULL
        GROUP BY 1, 2
    ), idx AS (
        SELECT m, month, cents,
               CAST(ROW_NUMBER() OVER (ORDER BY m ASC) AS BIGINT) AS k,
               CAST(COUNT(*) OVER () AS BIGINT) AS n
        FROM monthly
    ), seed AS (
        SELECT a.cents AS x1, b.cents AS x2 FROM idx a JOIN idx b
        ON a.k = 1 AND b.k = 2
    ), rec AS (
        SELECT CAST(1 AS BIGINT) AS k, x1 AS l, x2 - x1 AS b FROM seed
        UNION ALL
        SELECT i.k,
               ({HOLT_ALPHA_MILLI} * i.cents
                + (1000 - {HOLT_ALPHA_MILLI}) * (rec.l + rec.b)) // 1000,
               ({HOLT_BETA_MILLI} * ((({HOLT_ALPHA_MILLI} * i.cents
                    + (1000 - {HOLT_ALPHA_MILLI}) * (rec.l + rec.b)) // 1000)
                    - rec.l)
                + (1000 - {HOLT_BETA_MILLI}) * rec.b) // 1000
        FROM rec JOIN idx i ON i.k = rec.k + 1
    )
    SELECT i.month AS month, i.cents AS cents,
           CAST(rec.l AS BIGINT) AS level_cents,
           CAST(rec.b AS BIGINT) AS trend_cents,
           CASE WHEN i.k = i.n THEN CAST(rec.l + rec.b AS BIGINT) END
               AS fc1_cents,
           CASE WHEN i.k = i.n THEN CAST(rec.l + 2 * rec.b AS BIGINT) END
               AS fc2_cents,
           CASE WHEN i.k = i.n THEN CAST(rec.l + 3 * rec.b AS BIGINT) END
               AS fc3_cents
    FROM idx i JOIN rec ON rec.k = i.k
    """,
    doc="Holt level+trend smoothing of monthly revenue (alpha 0.3, "
        "beta 0.1, exact integer fold) with 1-3 month forecasts on the "
        "final row.",
)
def holt_linear_forecast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpora with fewer than two observed months yield an empty result
    on both engines (the seed join needs x1 and x2; a one-point series
    has no trend to initialize). Gap months are simply absent — the
    recurrence runs over the OBSERVED month sequence, the standard
    treatment when closure is not known.

    Plan shape: one map-side-combined monthly aggregate (the only
    data-sized stage); the collected frame is calendar-bounded, the
    fold is driver-side exact integer arithmetic with TRUNCATING
    division (DuckDB's integer // truncates; Python's floors)."""
    o = load_table(spark, sf_dir, "orders")
    monthly = (o.where(F.col("o_orderdate").isNotNull()
                       & F.col("o_totalprice").isNotNull())
               .groupBy(
                   ((F.year("o_orderdate") - 1970) * 12
                    + F.month("o_orderdate") - 1).cast("long").alias("m"),
                   F.date_format("o_orderdate", "yyyy-MM").alias("month"))
               .agg(F.sum(F.floor(F.col("o_totalprice") * 100 + 0.5)
                          .cast("long")).cast("long").alias("cents")))
    rows = sorted((r["m"], r["month"], r["cents"])
                  for r in monthly.collect())
    schema = ("month string, cents long, level_cents long, "
              "trend_cents long, fc1_cents long, fc2_cents long, "
              "fc3_cents long")
    if len(rows) < 2:
        return spark.createDataFrame([], schema)
    A, B = HOLT_ALPHA_MILLI, HOLT_BETA_MILLI

    def tdiv(a: int, b_: int) -> int:
        q = abs(a) // b_
        return q if a >= 0 else -q

    l, b = rows[0][2], rows[1][2] - rows[0][2]
    out = [(rows[0][1], rows[0][2], l, b)]
    for _, month, x in rows[1:]:
        l_new = tdiv(A * x + (1000 - A) * (l + b), 1000)
        b = tdiv(B * (l_new - l) + (1000 - B) * b, 1000)
        l = l_new
        out.append((month, x, l, b))
    final = [(m, x, lv, tr,
              lv + tr if i == len(out) - 1 else None,
              lv + 2 * tr if i == len(out) - 1 else None,
              lv + 3 * tr if i == len(out) - 1 else None)
             for i, (m, x, lv, tr) in enumerate(out)]
    return spark.createDataFrame(final, schema)

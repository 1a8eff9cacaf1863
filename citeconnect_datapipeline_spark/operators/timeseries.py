"""Event time-series analytics: sessionization, funnels, cohorts.

The reference's only time dimension is its run-over-run history
(SURVEY.md SS2.6 W1, schema_validator.py:419-432); a product-grade
engine over the same lake needs the standard event-stream batch
analytics too. These complement the streaming layer's session_window
jobs (streaming/event_windows.py): the streaming side maintains
sessions incrementally with state, while these compute the identical
gaps-and-islands semantics over the at-rest events table — the
batch/stream duality Structured Streaming is built around.

Scale notes (local[32] tested, 1000-executor design):
- Everything partitions by user_id: one shuffle, then all window
  functions and session aggregations are partition-local. At 100 TB
  the events lake would be bucketed by user_id, making the shuffle
  exchange-free (plans/layout.py pattern).
- No driver-side state: funnels and cohorts are joins/aggregations of
  per-user minima, never a collect.
- Timestamps are compared in integer microseconds (unix_micros /
  epoch_us) so session boundaries and durations are exact on both
  engines — no float epoch drift.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..plans.registry import query
from ..sources.tables import load_table

SESSION_GAP_MIN = 30


@query(
    "sessionize_events",
    oracle=f"""
    WITH flagged AS (
        SELECT user_id, ts, event_id,
               CASE WHEN LAG(ts) OVER w IS NULL
                         OR epoch_us(ts) - epoch_us(LAG(ts) OVER w)
                            > {SESSION_GAP_MIN} * 60 * 1000000
                    THEN 1 ELSE 0 END AS is_new
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    numbered AS (
        SELECT user_id, ts,
               CAST(SUM(is_new) OVER (PARTITION BY user_id
                                      ORDER BY ts, event_id
                                      ROWS UNBOUNDED PRECEDING)
                    AS BIGINT) AS session_seq
        FROM flagged
    )
    SELECT user_id, session_seq,
           COUNT(*) AS n_events,
           epoch_us(MAX(ts)) - epoch_us(MIN(ts)) AS duration_us
    FROM numbered
    GROUP BY user_id, session_seq
    ORDER BY user_id, session_seq
    """,
)
def sessionize_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gaps-and-islands sessionization: a new session starts when a
    user's inter-event gap exceeds 30 (SESSION_GAP_MIN) minutes; the
    running sum of session starts numbers the islands. This is the
    batch twin of ``session_window_agg`` (same gap, same semantics)
    computed with plain window functions.

    One hash-partition on user_id feeds both the lag and the running
    sum (same window spec ⇒ one Exchange + one Sort in the plan);
    the session aggregation reuses the partitioning. Ties broken by
    event_id so numbering is total and engines agree."""
    return sessionize(load_table(spark, sf_dir, "events"))


def sessionize(
    events: DataFrame, gap_min: int = SESSION_GAP_MIN
) -> DataFrame:
    """Core gaps-and-islands operator over any (user_id, ts,
    event_id) frame — factored out so the semantics are
    property-testable off the fixed lake."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap_us = gap_min * 60 * 1_000_000
    prev_us = F.unix_micros(F.lag("ts").over(w))
    flagged = events.select(
        "user_id",
        "ts",
        "event_id",
        F.when(
            prev_us.isNull() | (F.unix_micros(F.col("ts")) - prev_us > gap_us),
            1,
        )
        .otherwise(0)
        .alias("is_new"),
    )
    numbered = flagged.select(
        "user_id",
        "ts",
        F.sum("is_new")
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .alias("session_seq"),
    )
    return (
        numbered.groupBy("user_id", "session_seq")
        .agg(
            F.count("*").alias("n_events"),
            (F.unix_micros(F.max("ts")) - F.unix_micros(F.min("ts"))).alias(
                "duration_us"
            ),
        )
        .orderBy("user_id", "session_seq")
    )


@query(
    "funnel_conversion",
    oracle="""
    WITH s1 AS (
        SELECT user_id, MIN(ts) AS t1 FROM events
        WHERE event_type = 'signup' GROUP BY user_id
    ),
    s2 AS (
        SELECT e.user_id, MIN(e.ts) AS t2
        FROM events e JOIN s1 ON e.user_id = s1.user_id
        WHERE e.event_type = 'click' AND e.ts > s1.t1
        GROUP BY e.user_id
    ),
    s3 AS (
        SELECT e.user_id, MIN(e.ts) AS t3
        FROM events e JOIN s2 ON e.user_id = s2.user_id
        WHERE e.event_type = 'purchase' AND e.ts > s2.t2
        GROUP BY e.user_id
    )
    SELECT COUNT(s1.user_id) AS signup_users,
           COUNT(s2.user_id) AS click_users,
           COUNT(s3.user_id) AS purchase_users,
           ROUND(CAST(COUNT(s2.user_id) AS DOUBLE)
                 / COUNT(s1.user_id), 6) AS click_rate,
           ROUND(CAST(COUNT(s3.user_id) AS DOUBLE)
                 / COUNT(s1.user_id), 6) AS purchase_rate
    FROM s1
    LEFT JOIN s2 ON s1.user_id = s2.user_id
    LEFT JOIN s3 ON s1.user_id = s3.user_id
    """,
)
def funnel_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered funnel signup → click → purchase: a user advances a
    step only with a strictly-later event of the next type. Three
    per-user minima chained by (user, time) conditions, then one
    global rollup — no per-user Python, no collect; each stage is a
    keyed aggregation joined on user_id, so the whole funnel is three
    shuffles on the same key (exchange-reusable, bucketable).

    Measures the same thing as the reference's stage success-rate
    rollups (main.py:358-406 collection→processing counts), but
    time-ordered per entity instead of global."""
    events = load_table(spark, sf_dir, "events")

    def stage(
        prev: DataFrame, prev_ts: str, etype: str, out_ts: str
    ) -> DataFrame:
        return (
            events.filter(F.col("event_type") == etype)
            .join(prev, "user_id")
            .filter(F.col("ts") > F.col(prev_ts))
            .groupBy("user_id")
            .agg(F.min("ts").alias(out_ts))
        )

    s1 = (
        events.filter(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t1"))
    )
    s2 = stage(s1.select("user_id", "t1"), "t1", "click", "t2")
    s3 = stage(s2, "t2", "purchase", "t3")
    joined = (
        s1.join(s2, "user_id", "left")
        .join(s3, "user_id", "left")
        .select("user_id", "t1", "t2", "t3")
    )
    n1 = F.count("user_id")
    n2 = F.count("t2")
    n3 = F.count("t3")
    return joined.agg(
        n1.alias("signup_users"),
        n2.alias("click_users"),
        n3.alias("purchase_users"),
        F.round(n2.cast("double") / n1, 6).alias("click_rate"),
        F.round(n3.cast("double") / n1, 6).alias("purchase_rate"),
    )


@query(
    "cohort_retention",
    oracle="""
    WITH firstday AS (
        SELECT user_id, MIN(CAST(ts AS DATE)) AS cohort_day
        FROM events GROUP BY user_id
    ),
    active AS (
        SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events
    )
    SELECT strftime(f.cohort_day, '%Y-%m-%d') AS cohort_day,
           datediff('day', f.cohort_day, a.day) AS day_offset,
           COUNT(*) AS active_users
    FROM active a JOIN firstday f ON a.user_id = f.user_id
    GROUP BY f.cohort_day, datediff('day', f.cohort_day, a.day)
    ORDER BY cohort_day, day_offset
    """,
)
def cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention triangle: users grouped by first-activity
    day; for each (cohort, day-offset) the count of users active that
    many days later. The classic product-analytics rollup, and the
    entity-level generalization of the reference's run-over-run
    monitoring (W1).

    Two aggregations keyed on user_id (first-day, distinct
    active-days) joined on user_id, then a small regroup on
    (cohort, offset): the heavy work shuffles once on the entity key;
    the final rollup's cardinality is days², trivially small.
    Cohort day is emitted as a string so engines agree on
    representation."""
    events = load_table(spark, sf_dir, "events")
    firstday = events.groupBy("user_id").agg(
        F.min(F.to_date("ts")).alias("cohort_day")
    )
    active = events.select(
        "user_id", F.to_date("ts").alias("day")
    ).distinct()
    return (
        active.join(firstday, "user_id")
        .groupBy(
            F.date_format("cohort_day", "yyyy-MM-dd").alias("cohort_day"),
            F.datediff("day", "cohort_day").alias("day_offset"),
        )
        .agg(F.count("*").alias("active_users"))
        .orderBy("cohort_day", "day_offset")
    )


@query(
    "daily_gap_fill",
    oracle="""
    WITH bounds AS (
        SELECT CAST(MIN(ts) AS DATE) AS d0, CAST(MAX(ts) AS DATE) AS d1
        FROM events
    ),
    spine AS (
        SELECT unnest(generate_series(d0, d1, INTERVAL 1 DAY))::DATE AS day
        FROM bounds
    ),
    daily AS (
        SELECT CAST(ts AS DATE) AS day,
               COUNT(*) AS n_raw,
               ROUND(SUM(value), 4) AS value_raw
        FROM events WHERE event_type = 'purchase'
        GROUP BY CAST(ts AS DATE)
    )
    SELECT strftime(s.day, '%Y-%m-%d') AS day,
           COALESCE(d.n_raw, 0) AS n_purchases,
           COALESCE(d.value_raw, 0.0) AS purchase_value
    FROM spine s LEFT JOIN daily d ON s.day = d.day
    ORDER BY day
    """,
)
def daily_gap_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date-spine gap fill: a generated day spine (sequence + explode,
    no driver loop, no collect) left-joined onto the daily purchase
    rollup so calendar gaps surface as explicit zero rows — what every
    downstream charting/anomaly consumer wants (the reference's
    run-summary JSON silently skips empty runs; a z-score over it
    never sees the zeros, which is exactly the failure A12 guards
    against).

    The spine is tiny (days), broadcast onto the daily aggregate; the
    only shuffle is the purchase rollup's groupBy, which AQE coalesces
    to the handful of day keys."""
    events = load_table(spark, sf_dir, "events")
    bounds = events.agg(
        F.min(F.to_date("ts")).alias("d0"),
        F.max(F.to_date("ts")).alias("d1"),
    )
    spine = bounds.select(
        F.explode(F.sequence("d0", "d1")).alias("day")
    )
    daily = (
        events.filter(F.col("event_type") == "purchase")
        .groupBy(F.to_date("ts").alias("day"))
        .agg(
            F.count("*").alias("n_raw"),
            F.round(F.sum("value"), 4).alias("value_raw"),
        )
    )
    return (
        spine.join(daily, "day", "left")
        .select(
            F.date_format("day", "yyyy-MM-dd").alias("day"),
            F.coalesce("n_raw", F.lit(0)).alias("n_purchases"),
            F.coalesce("value_raw", F.lit(0.0)).alias("purchase_value"),
        )
        .orderBy("day")
    )


EWMA_DECAY = 0.7  # weight (1 - alpha) per day of distance
EWMA_SPAN_DAYS = 9  # history window: today + 9 preceding days


@query(
    "ewma_anomaly",
    oracle=f"""
    WITH daily AS (
        SELECT date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS wd,
               AVG(value) AS mean_v
        FROM events GROUP BY 1
    ), sm AS (
        SELECT a.wd, a.mean_v,
               SUM(b.mean_v * POWER({EWMA_DECAY}, a.wd - b.wd)) AS num,
               SUM(POWER({EWMA_DECAY}, a.wd - b.wd)) AS den
        FROM daily a
        JOIN daily b ON b.wd BETWEEN a.wd - {EWMA_SPAN_DAYS} AND a.wd
        GROUP BY a.wd, a.mean_v
    )
    SELECT wd,
           ROUND(mean_v, 4) AS mean_value,
           ROUND(num / den, 4) AS ewma,
           ROUND(ABS(mean_v - num / den) / (num / den), 4) AS rel_dev
    FROM sm ORDER BY wd
    """,
)
def ewma_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-aware EWMA baseline for the daily metric series — the
    distribution-smoothing upgrade of the reference's flat z-score
    anomaly check (schema_validator.py:419-432, W1): each day's
    deviation is judged against an exponentially-weighted average of
    the trailing window, where the weight of day d in the baseline of
    day t is DECAY^(t-d) — calendar distance, not row offset, so data
    gaps decay correctly instead of stretching the window.

    Shape: one aggregation to the daily grain, then a RANGE frame
    (value-keyed on the day number) collects the trailing
    (day, value) pairs and a HOF ``aggregate`` folds them with their
    decay weights — a sequential left fold, deterministic summation
    order. The daily series is one row per (metric, day), so the
    global window here would partition by metric id in a multi-metric
    deployment (same rewrite as every W-family query)."""
    events = load_table(spark, sf_dir, "events")
    daily = events.groupBy(
        F.unix_date(F.to_date("ts")).alias("wd")
    ).agg(F.avg("value").alias("mean_v"))
    w = Window.orderBy("wd").rangeBetween(-EWMA_SPAN_DAYS, 0)
    hist = daily.withColumn(
        "hist", F.collect_list(F.struct("wd", "mean_v")).over(w)
    )
    decay = lambda s: F.pow(F.lit(EWMA_DECAY), F.col("wd") - s.wd)  # noqa: E731
    num = F.aggregate(
        "hist", F.lit(0.0), lambda acc, s: acc + s.mean_v * decay(s)
    )
    den = F.aggregate("hist", F.lit(0.0), lambda acc, s: acc + decay(s))
    ewma = num / den
    return hist.select(
        "wd",
        F.round("mean_v", 4).alias("mean_value"),
        F.round(ewma, 4).alias("ewma"),
        F.round(F.abs(F.col("mean_v") - ewma) / ewma, 4).alias("rel_dev"),
    ).orderBy("wd")


@query(
    "event_transition_matrix",
    oracle="""
    WITH seq AS (
        SELECT user_id, event_type,
               LEAD(event_type) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
               ) AS next_type
        FROM events
    ),
    trans AS (
        SELECT event_type AS from_type, next_type AS to_type,
               COUNT(*) AS n
        FROM seq WHERE next_type IS NOT NULL
        GROUP BY event_type, next_type
    ),
    tot AS (
        SELECT from_type, SUM(n) AS row_total FROM trans
        GROUP BY from_type
    )
    SELECT t.from_type, t.to_type,
           CAST(t.n AS BIGINT) AS n_transitions,
           ROUND(t.n * 1.0 / o.row_total, 6) AS prob
    FROM trans t JOIN tot o ON t.from_type = o.from_type
    ORDER BY t.from_type, t.to_type
    """,
)
def event_transition_matrix(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """First-order Markov transition matrix over per-user event
    streams: for every (from, to) event-type pair, the transition
    count and row-normalized probability. The behavioral-analytics
    primitive under funnels and anomaly detection (a shifted
    transition row IS a behavior change — the sequence-level
    complement of `distribution_psi_drift`'s marginal view), and the
    reference's event log has nothing sequence-aware at all.

    One shuffle on user_id for the LEAD window (each user's history
    sorts within its own partition — user grain, naturally
    parallel), then a count rollup to the |event_types|^2 transition
    grain, which is bounded at any corpus size; the row-total join
    runs on that bounded table. Probabilities are int-ratio exact,
    identical in both engines."""
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        "event_type",
        F.lead("event_type").over(w).alias("next_type"),
    ).filter(F.col("next_type").isNotNull())
    trans = seq.groupBy(
        F.col("event_type").alias("from_type"),
        F.col("next_type").alias("to_type"),
    ).agg(F.count("*").alias("n"))
    tot = trans.groupBy("from_type").agg(
        F.sum("n").alias("row_total")
    )
    return (
        trans.join(tot, "from_type")
        .select(
            "from_type",
            "to_type",
            F.col("n").cast("long").alias("n_transitions"),
            F.round(F.col("n") * 1.0 / F.col("row_total"), 6).alias(
                "prob"
            ),
        )
        .orderBy("from_type", "to_type")
    )


@query(
    "seasonal_decompose_daily",
    oracle="""
    WITH daily AS (
        SELECT CAST(ts AS DATE) AS day,
               dayofweek(CAST(ts AS DATE)) AS dow,
               ROUND(SUM(value), 6) AS total
        FROM events GROUP BY 1, 2
    ),
    trended AS (
        SELECT day, dow, total,
               ROUND(AVG(total) OVER (
                   ORDER BY day ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING
               ), 6) AS trend
        FROM daily
    ),
    detrended AS (
        SELECT day, dow, total, trend,
               ROUND(total - trend, 6) AS detr
        FROM trended
    ),
    seasonal AS (
        SELECT dow, ROUND(AVG(detr), 6) AS seasonal FROM detrended
        GROUP BY dow
    )
    SELECT strftime(d.day, '%Y-%m-%d') AS day,
           d.dow, d.total, d.trend, s.seasonal,
           ROUND(d.detr - s.seasonal, 6) AS residual
    FROM detrended d JOIN seasonal s ON d.dow = s.dow
    ORDER BY ABS(ROUND(d.detr - s.seasonal, 6)) DESC, d.day
    LIMIT 10
    """,
)
def seasonal_decompose_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STL-lite seasonal decomposition of the daily event-value
    series: trend = 7-day centered moving average, seasonal =
    day-of-week mean of the detrended series, residual = what's left
    — and the top-10 days by |residual| are the anomalies a naive
    threshold check (ewma_anomaly's level logic) would misflag on
    weekends. This is the additive decomposition behind every
    traffic-anomaly dashboard (Cleveland's STL, one iteration,
    means for loess).

    Scale: the raw scan reduces to DAY grain immediately (one
    map-side-combinable groupBy); every window after that runs on
    the per-day table — 365 rows/year regardless of corpus size, the
    same bounded-aggregate contract as range_frame_agg (allowlisted
    unpartitioned window). Day-of-week is computed portably: Spark
    dayofweek()-1 == DuckDB dayofweek() (0=Sunday..6=Saturday).
    Every arithmetic step rounds at 6 dp BEFORE the next comparison
    so the |residual| ranking cannot diverge between engines."""
    events = load_table(spark, sf_dir, "events")
    daily = events.groupBy(
        F.col("ts").cast("date").alias("day"),
        (F.dayofweek(F.col("ts").cast("date")) - 1).alias("dow"),
    ).agg(F.round(F.sum("value"), 6).alias("total"))
    w_ma = Window.orderBy("day").rowsBetween(-3, 3)
    detrended = daily.select(
        "day",
        "dow",
        "total",
        F.round(F.avg("total").over(w_ma), 6).alias("trend"),
    ).withColumn("detr", F.round(F.col("total") - F.col("trend"), 6))
    seasonal = detrended.groupBy("dow").agg(
        F.round(F.avg("detr"), 6).alias("seasonal")
    )
    return (
        detrended.join(F.broadcast(seasonal), "dow")
        .select(
            F.date_format("day", "yyyy-MM-dd").alias("day"),
            "dow",
            "total",
            "trend",
            "seasonal",
            F.round(F.col("detr") - F.col("seasonal"), 6).alias("residual"),
        )
        .orderBy(F.abs(F.col("residual")).desc(), "day")
        .limit(10)
    )


@query(
    "interevent_gap_histogram",
    oracle="""
    WITH gaps AS (
        SELECT epoch_us(ts) - lag(epoch_us(ts)) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
               ) AS gap_us
        FROM events
    ),
    bucketed AS (
        SELECT CAST(FLOOR(ROUND(
                   LOG2(gap_us / 1000000.0 + 1.0), 6)) AS INT) AS bucket,
               gap_us / 1000000.0 AS gap_sec
        FROM gaps WHERE gap_us IS NOT NULL
    )
    SELECT bucket,
           CAST(COUNT(*) AS BIGINT) AS n_gaps,
           ROUND(MIN(gap_sec), 6) AS min_gap_sec,
           ROUND(MAX(gap_sec), 6) AS max_gap_sec
    FROM bucketed
    GROUP BY bucket
    ORDER BY bucket
    """,
)
def interevent_gap_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Log2-bucketed histogram of per-user inter-event gaps — the
    distribution a session-gap threshold (SESSION_GAP_MIN) should be
    READ OFF rather than guessed: the bimodal valley between
    within-session and between-session gaps is visible as a count
    dip across buckets (each bucket b holds gaps in [2^b - 1,
    2^(b+1) - 1) seconds).

    Shape: ONE user-keyed shuffle for the lag window (partition-
    local thereafter, same contract as sessionize_events), then a
    groupBy onto ~40 log buckets — bounded output at any corpus
    size. Gaps are computed in integer microseconds (exact on both
    engines); log2 is rounded at 6 dp BEFORE floor so a gap of
    exactly 2^k seconds cannot floor differently across engines."""
    events = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gaps = events.select(
        (
            F.unix_micros("ts") - F.lag(F.unix_micros("ts")).over(w)
        ).alias("gap_us")
    ).filter(F.col("gap_us").isNotNull())
    gap_sec = F.col("gap_us") / 1000000.0
    return (
        gaps.select(
            F.floor(F.round(F.log2(gap_sec + 1.0), 6))
            .cast("int")
            .alias("bucket"),
            gap_sec.alias("gap_sec"),
        )
        .groupBy("bucket")
        .agg(
            F.count("*").alias("n_gaps"),
            F.round(F.min("gap_sec"), 6).alias("min_gap_sec"),
            F.round(F.max("gap_sec"), 6).alias("max_gap_sec"),
        )
        .orderBy("bucket")
    )


ATTRIBUTION_WINDOW_DAYS = 7


@query(
    "last_touch_attribution",
    oracle=f"""
    WITH stream AS (
        SELECT user_id, ts, event_id, event_type, value,
               last_value(CASE WHEN event_type = 'click'
                               THEN epoch_us(ts) END IGNORE NULLS)
                   OVER (PARTITION BY user_id ORDER BY ts, event_id
                         ROWS UNBOUNDED PRECEDING) AS last_click_us
        FROM events
        WHERE event_type IN ('click', 'purchase')
    )
    SELECT strftime(CAST(ts AS DATE), '%Y-%m-%d') AS day,
           CAST(COUNT(*) AS BIGINT) AS n_purchases,
           CAST(SUM(CASE WHEN last_click_us IS NOT NULL
                          AND epoch_us(ts) - last_click_us
                              <= CAST({ATTRIBUTION_WINDOW_DAYS} AS BIGINT) * 86400 * 1000000
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_attributed,
           ROUND(SUM(CASE WHEN last_click_us IS NOT NULL
                           AND epoch_us(ts) - last_click_us
                               <= CAST({ATTRIBUTION_WINDOW_DAYS} AS BIGINT) * 86400 * 1000000
                          THEN value ELSE 0 END), 6) AS attributed_value
    FROM stream
    WHERE event_type = 'purchase'
    GROUP BY day
    ORDER BY day
    """,
)
def last_touch_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Last-touch marketing attribution: every purchase credits the
    user's most recent click within a 7-day lookback. Computed the
    STREAMING way — one pass over the merged click+purchase stream
    carrying `last(click_ts, ignorenulls)` forward per user — rather
    than a purchase><click as-of join (`asof_join_events` shows that
    form): the single-pass form does ONE user-keyed shuffle and no
    join at all, which is also exactly how the stateful streaming
    version would hold it (one ValueState per user).

    The event-type filter pushes to the scan (2 of 5 types read);
    timestamps compare in integer microseconds (exact both engines);
    the per-day rollup output is bounded by the date range."""
    events = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    window_us = ATTRIBUTION_WINDOW_DAYS * 86400 * 1000000
    stream = events.filter(
        F.col("event_type").isin("click", "purchase")
    ).withColumn(
        "last_click_us",
        F.last(
            F.when(
                F.col("event_type") == "click", F.unix_micros("ts")
            ),
            ignorenulls=True,
        ).over(w),
    )
    attributed = F.col("last_click_us").isNotNull() & (
        F.unix_micros("ts") - F.col("last_click_us") <= window_us
    )
    return (
        stream.filter(F.col("event_type") == "purchase")
        .groupBy(
            F.date_format(F.col("ts").cast("date"), "yyyy-MM-dd").alias(
                "day"
            )
        )
        .agg(
            F.count("*").alias("n_purchases"),
            F.sum(F.when(attributed, 1).otherwise(0)).alias(
                "n_attributed"
            ),
            F.round(
                F.sum(F.when(attributed, F.col("value")).otherwise(0)), 6
            ).alias("attributed_value"),
        )
        .orderBy("day")
    )


@query(
    "ship_latency_histogram",
    oracle="""
    WITH lat AS (
        SELECT date_diff('day', CAST(o.o_orderdate AS DATE),
                         CAST(l.l_shipdate AS DATE)) AS days
        FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    ),
    hist AS (
        SELECT CAST(days // 7 AS BIGINT) AS week_bucket,
               CAST(COUNT(*) AS BIGINT) AS n_items
        FROM lat WHERE days >= 0
        GROUP BY 1
    )
    SELECT week_bucket, n_items,
           ROUND(n_items * 1.0 / SUM(n_items) OVER (), 6) AS share,
           ROUND(SUM(n_items) OVER (ORDER BY week_bucket)
                 * 1.0 / SUM(n_items) OVER (), 6) AS cum_share
    FROM hist
    ORDER BY week_bucket
    """,
)
def ship_latency_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-to-ship latency histogram in week buckets with share and
    cumulative share — the fulfilment-latency SLO curve, and the
    citation-age-distribution shape from the reference's citation
    analysis (order~citing paper date, ship~cited activity date).

    Scale shape: one fact-fact equi join on orderkey (bucketable,
    exchange-free under the bucketed layout), latency bucketing
    map-side, then a week-grain aggregate — the share/cumulative
    windows run over the BOUNDED bucket table (one row per latency
    week — bounded by the date span, ~360 at this lake's range,
    never corpus-grain), the allowlisted unpartitioned-window
    pattern of seq_length_histogram."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    lat = li.join(
        orders.select("o_orderkey", "o_orderdate"),
        li.l_orderkey == F.col("o_orderkey"),
    ).select(
        F.datediff(
            F.col("l_shipdate").cast("date"),
            F.col("o_orderdate").cast("date"),
        ).alias("days")
    )
    hist = (
        lat.filter(F.col("days") >= 0)
        .groupBy(
            F.floor(F.col("days") / 7).cast("long").alias("week_bucket")
        )
        .agg(F.count("*").alias("n_items"))
    )
    w_all = Window.partitionBy()
    w_cum = Window.orderBy("week_bucket")
    return (
        hist.select(
            "week_bucket",
            "n_items",
            F.round(
                F.col("n_items") / F.sum("n_items").over(w_all), 6
            ).alias("share"),
            F.round(
                F.sum("n_items").over(w_cum)
                / F.sum("n_items").over(w_all),
                6,
            ).alias("cum_share"),
        )
        .orderBy("week_bucket")
    )


EPD_MAX_PATH = 200  # events per session folded into the path string
EPD_CONVERSION = "view.*click.*purchase"  # ordered-subsequence pattern
EPD_BURST = "error>error"  # adjacent-repeat pattern


@query(
    "event_pattern_detect",
    oracle=f"""
    WITH flagged AS (
        SELECT user_id, ts, event_id, event_type,
               CASE WHEN LAG(ts) OVER w IS NULL
                         OR epoch_us(ts) - epoch_us(LAG(ts) OVER w)
                            > {SESSION_GAP_MIN} * 60 * 1000000
                    THEN 1 ELSE 0 END AS is_new
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    numbered AS (
        SELECT user_id, ts, event_id, event_type,
               CAST(SUM(is_new) OVER (PARTITION BY user_id
                                      ORDER BY ts, event_id
                                      ROWS UNBOUNDED PRECEDING)
                    AS BIGINT) AS session_seq
        FROM flagged
    ),
    paths AS (
        SELECT user_id, session_seq,
               COUNT(*) AS n_events,
               array_to_string(list_slice(
                   list(event_type ORDER BY ts, event_id),
                   1, {EPD_MAX_PATH}), '>') AS path
        FROM numbered
        GROUP BY user_id, session_seq
    )
    SELECT user_id, session_seq, n_events, path,
           regexp_matches(path, '{EPD_CONVERSION}') AS has_conversion,
           CAST(len(regexp_extract_all(path, '{EPD_BURST}'))
                AS BIGINT) AS n_error_bursts
    FROM paths
    ORDER BY user_id, session_seq
    """,
)
def event_pattern_detect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence-pattern detection over sessionized event streams —
    the engine's MATCH_RECOGNIZE analogue (Flink CEP / Snowflake
    MATCH_RECOGNIZE territory; the reference has nothing like it):
    each user session (same 30-min gaps-and-islands rule as
    `sessionize_events`) is folded into an ordered type-path string,
    and patterns are evaluated as regexes over that path — an
    ordered-SUBSEQUENCE pattern (view ... click ... purchase, any
    events between) for conversion, and an ADJACENT-repeat pattern
    (error>error, non-overlapping count) for error bursts. Regex
    over a delimited path expresses the whole
    any-gap/adjacency/repetition pattern algebra declaratively, and
    the path string itself is part of the output, so the oracle
    hash-verifies the fold order, not just the match flags.

    Scale shape: one hash-partition by user_id feeds the lag flag,
    the running session number, and the per-session fold (same key ⇒
    one Exchange); the path is capped at 200 (EPD_MAX_PATH) events
    per session on BOTH engines — a pattern window, not an unbounded
    per-group collect — so state per session is bounded at any
    corpus size. Patterns stay in whole-stage codegen (rlike /
    regexp_count are JVM expressions)."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap_us = SESSION_GAP_MIN * 60 * 1_000_000
    prev_us = F.unix_micros(F.lag("ts").over(w))
    numbered = ev.select(
        "user_id",
        "ts",
        "event_id",
        "event_type",
        F.sum(
            F.when(
                prev_us.isNull()
                | (F.unix_micros(F.col("ts")) - prev_us > gap_us),
                1,
            ).otherwise(0)
        )
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .alias("session_seq"),
    )
    paths = numbered.groupBy("user_id", "session_seq").agg(
        F.count("*").alias("n_events"),
        F.array_join(
            F.transform(
                F.slice(
                    F.array_sort(
                        F.collect_list(
                            F.struct("ts", "event_id", "event_type")
                        )
                    ),
                    1,
                    EPD_MAX_PATH,
                ),
                lambda x: x["event_type"],
            ),
            ">",
        ).alias("path"),
    )
    return paths.select(
        "user_id",
        "session_seq",
        "n_events",
        "path",
        F.col("path").rlike(EPD_CONVERSION).alias("has_conversion"),
        F.regexp_count(F.col("path"), F.lit(EPD_BURST))
        .cast("bigint")
        .alias("n_error_bursts"),
    ).orderBy("user_id", "session_seq")


DEBOUNCE_SEC = 5  # bursts: consecutive same-signal gaps under this


@query(
    "event_debounce",
    oracle=f"""
    WITH flagged AS (
        SELECT event_type,
               CASE WHEN LAG(ts) OVER w IS NULL
                         OR epoch_us(ts) - epoch_us(LAG(ts) OVER w)
                            > {DEBOUNCE_SEC} * 1000000
                    THEN 1 ELSE 0 END AS keep
        FROM events
        WINDOW w AS (PARTITION BY user_id, event_type
                     ORDER BY ts, event_id)
    )
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(SUM(keep) AS BIGINT) AS n_kept,
           ROUND(1.0 - SUM(keep) * 1.0 / COUNT(*), 6) AS drop_frac
    FROM flagged
    GROUP BY event_type
    ORDER BY event_type
    """,
)
def event_debounce(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Debounce/throttle for telemetry streams — the ingest-hygiene
    operator every event pipeline runs before counting anything:
    within a (user, event_type) signal, only the FIRST event of each
    burst survives, where a burst is a run of consecutive events
    each within 5 s (DEBOUNCE_SEC) of the previous one (double-fires,
    retry storms, button mashing). Same gaps-and-islands machinery
    as `sessionize_events` at a tighter grain, reduced keep-first;
    reports per-type kept/dropped volume — the drop_frac a
    billing/alerting consumer signs off on before the filter ships.

    Scale shape: one hash-partition by (user_id, event_type) feeds
    the lag flag, then a bounded per-type rollup; no corpus-grain
    state, no unpartitioned window. The streaming twin is the same
    flag inside `applyInPandasWithState` per key."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id", "event_type").orderBy(
        "ts", "event_id"
    )
    prev_us = F.unix_micros(F.lag("ts").over(w))
    flagged = ev.select(
        "event_type",
        F.when(
            prev_us.isNull()
            | (
                F.unix_micros(F.col("ts")) - prev_us
                > DEBOUNCE_SEC * 1_000_000
            ),
            1,
        )
        .otherwise(0)
        .alias("keep"),
    )
    return (
        flagged.groupBy("event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.sum("keep").alias("n_kept"),
            F.round(1.0 - F.sum("keep") * 1.0 / F.count("*"), 6).alias(
                "drop_frac"
            ),
        )
        # per-type rollup is |event types| rows — single-partition
        # sort beats a range-exchange (r10 verdict #2 job-count cut)
        .coalesce(1)
        .sortWithinPartitions("event_type")
    )


@query(
    "conversion_latency_quantiles",
    oracle="""
    WITH firsts AS (
        SELECT user_id,
               MIN(ts) FILTER (WHERE event_type = 'view') AS first_view,
               MIN(ts) FILTER (WHERE event_type = 'purchase')
                   AS first_purchase
        FROM events
        GROUP BY user_id
    ),
    lat AS (
        SELECT (epoch_us(first_purchase) - epoch_us(first_view))
               / 1000000.0 AS lat_sec
        FROM firsts
        WHERE first_view IS NOT NULL
          AND first_purchase IS NOT NULL
          AND first_purchase >= first_view
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_converted,
           ROUND(quantile_cont(lat_sec, 0.25), 6) AS p25_sec,
           ROUND(quantile_cont(lat_sec, 0.50), 6) AS p50_sec,
           ROUND(quantile_cont(lat_sec, 0.75), 6) AS p75_sec,
           ROUND(quantile_cont(lat_sec, 0.90), 6) AS p90_sec
    FROM lat
    """,
)
def conversion_latency_quantiles(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Time-to-convert distribution — the latency companion of
    `funnel_conversion`'s counts: per user, the gap between the
    FIRST view and the FIRST purchase (converters only, purchase not
    before view), summarized as exact interpolated p25/p50/p75/p90
    seconds. The shape of this curve decides attribution windows
    (`last_touch_attribution`'s 7 days) and session gaps; counts
    alone can't.

    Scale shape: one user-grain conditional-MIN aggregate
    (map-side-combinable), then a single bounded percentile reduce
    over one row per converter. At 100 TB the documented swap is
    percentile_approx on the same plan."""
    ev = load_table(spark, sf_dir, "events")
    firsts = ev.groupBy("user_id").agg(
        F.min(F.when(F.col("event_type") == "view", F.col("ts"))).alias(
            "first_view"
        ),
        F.min(
            F.when(F.col("event_type") == "purchase", F.col("ts"))
        ).alias("first_purchase"),
    )
    lat = firsts.filter(
        F.col("first_view").isNotNull()
        & F.col("first_purchase").isNotNull()
        & (F.col("first_purchase") >= F.col("first_view"))
    ).select(
        (
            (
                F.unix_micros("first_purchase")
                - F.unix_micros("first_view")
            )
            / 1_000_000.0
        ).alias("lat_sec")
    )
    pct = F.percentile("lat_sec", F.array(*[F.lit(q) for q in
                                            (0.25, 0.5, 0.75, 0.9)]))
    return lat.agg(
        F.count("*").alias("n_converted"),
        F.round(F.element_at(pct, 1), 6).alias("p25_sec"),
        F.round(F.element_at(pct, 2), 6).alias("p50_sec"),
        F.round(F.element_at(pct, 3), 6).alias("p75_sec"),
        F.round(F.element_at(pct, 4), 6).alias("p90_sec"),
    )


@query(
    "late_arrival_audit",
    oracle="""
    WITH lat AS (
        SELECT GREATEST(0,
                   MAX(epoch_us(ts)) OVER (
                       PARTITION BY user_id ORDER BY event_id
                       ROWS BETWEEN UNBOUNDED PRECEDING
                                AND 1 PRECEDING)
                   - epoch_us(ts)) / 1000000.0 AS late_sec
        FROM events
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(COUNT(*) FILTER (WHERE late_sec > 0) AS BIGINT)
               AS n_late,
           ROUND(COUNT(*) FILTER (WHERE late_sec > 0) * 1.0
                 / COUNT(*), 6) AS late_frac,
           ROUND(quantile_cont(late_sec, 0.50) FILTER (WHERE late_sec > 0),
                 6) AS p50_late_sec,
           ROUND(quantile_cont(late_sec, 0.99) FILTER (WHERE late_sec > 0),
                 6) AS p99_late_sec,
           ROUND(MAX(late_sec), 6) AS max_late_sec
    FROM lat
    """,
)
def late_arrival_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event-time disorder profile — the measurement that SIZES a
    streaming watermark instead of guessing it: replaying the log in
    arrival order (event_id), an event is late by how far the
    latest event time already seen on its key exceeds its own.
    Reports late volume and the p50/p99/max lateness seconds —
    `withWatermark(p99_late_sec)` keeps 99% of late data while
    bounding state, and max_late_sec is the loss bound a tighter
    watermark accepts. Pairs with the streaming jobs in
    `streaming/jobs.py`, which currently hard-code their delay.

    Scale shape: one hash-partition by user_id feeds the running-max
    frame (per-key disorder — the same grain Spark's watermark state
    is kept at), then a single bounded percentile reduce. No
    unpartitioned window, no corpus-grain state."""
    ev = load_table(spark, sf_dir, "events")
    return lateness_profile(ev)


def lateness_profile(
    ev: DataFrame, key: str = "user_id", order_col: str = "event_id"
) -> DataFrame:
    """Reusable core of `late_arrival_audit`: the 1-row event-time
    disorder profile (n_events / n_late / late_frac / p50 / p99 /
    max lateness seconds) of any keyed event frame, replayed in
    ``order_col`` arrival order. `streaming.jobs.
    watermark_from_late_audit` turns this row into a `withWatermark`
    delay — measure, size, stream: the watermark-sizing loop."""
    w = (
        Window.partitionBy(key)
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    lat = ev.select(
        (
            F.greatest(
                F.lit(0),
                F.max(F.unix_micros("ts")).over(w)
                - F.unix_micros("ts"),
            )
            / 1_000_000.0
        ).alias("late_sec")
    )
    late_only = F.when(F.col("late_sec") > 0, F.col("late_sec"))
    pcts = F.percentile(late_only, F.array(F.lit(0.5), F.lit(0.99)))
    return lat.agg(
        F.count("*").alias("n_events"),
        F.sum(F.when(F.col("late_sec") > 0, 1).otherwise(0))
        .cast("bigint")
        .alias("n_late"),
        F.round(
            F.sum(F.when(F.col("late_sec") > 0, 1).otherwise(0))
            * 1.0
            / F.count("*"),
            6,
        ).alias("late_frac"),
        F.round(F.element_at(pcts, 1), 6).alias("p50_late_sec"),
        F.round(F.element_at(pcts, 2), 6).alias("p99_late_sec"),
        F.round(F.max("late_sec"), 6).alias("max_late_sec"),
    )


@query(
    "top_session_paths",
    oracle=f"""
    WITH flagged AS (
        SELECT user_id, ts, event_id, event_type,
               CASE WHEN LAG(ts) OVER w IS NULL
                         OR epoch_us(ts) - epoch_us(LAG(ts) OVER w)
                            > {SESSION_GAP_MIN} * 60 * 1000000
                    THEN 1 ELSE 0 END AS is_new
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    numbered AS (
        SELECT user_id, ts, event_id, event_type,
               SUM(is_new) OVER (PARTITION BY user_id
                                 ORDER BY ts, event_id
                                 ROWS UNBOUNDED PRECEDING) AS session_seq
        FROM flagged
    ),
    paths AS (
        SELECT user_id, session_seq,
               array_to_string(list_slice(
                   list(event_type ORDER BY ts, event_id),
                   1, {EPD_MAX_PATH}), '>') AS path
        FROM numbered
        GROUP BY user_id, session_seq
    ),
    tot AS (SELECT COUNT(*) AS n FROM paths)
    SELECT p.path, CAST(COUNT(*) AS BIGINT) AS n_sessions,
           ROUND(COUNT(*) * 1.0 / MAX(t.n), 6) AS session_share
    FROM paths p CROSS JOIN tot t
    GROUP BY p.path
    ORDER BY n_sessions DESC, p.path
    LIMIT 10
    """,
)
def top_session_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Path analysis — the aggregate view over
    `event_pattern_detect`'s per-session paths: the 10 most common
    session type-sequences with their share of all sessions, the
    table a product/funnel review starts from (which journeys
    actually happen, not which patterns we thought to regex for).

    Scale shape: shares the pattern query's single user-keyed
    exchange and capped per-session fold; the rollup is a
    map-side-combinable count by path string + a 1-row total
    broadcast, reduced to a TakeOrdered(10)."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap_us = SESSION_GAP_MIN * 60 * 1_000_000
    prev_us = F.unix_micros(F.lag("ts").over(w))
    numbered = ev.select(
        "user_id",
        "ts",
        "event_id",
        "event_type",
        F.sum(
            F.when(
                prev_us.isNull()
                | (F.unix_micros(F.col("ts")) - prev_us > gap_us),
                1,
            ).otherwise(0)
        )
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .alias("session_seq"),
    )
    paths = numbered.groupBy("user_id", "session_seq").agg(
        F.array_join(
            F.transform(
                F.slice(
                    F.array_sort(
                        F.collect_list(
                            F.struct("ts", "event_id", "event_type")
                        )
                    ),
                    1,
                    EPD_MAX_PATH,
                ),
                lambda x: x["event_type"],
            ),
            ">",
        ).alias("path"),
    )
    tot = paths.agg(F.count("*").alias("n"))
    return (
        paths.groupBy("path")
        .agg(F.count("*").alias("n_sessions"))
        .crossJoin(F.broadcast(tot))
        .select(
            "path",
            "n_sessions",
            F.round(F.col("n_sessions") * 1.0 / F.col("n"), 6).alias(
                "session_share"
            ),
        )
        .orderBy(F.desc("n_sessions"), "path")
        .limit(10)
    )


@query(
    "peak_concurrency_by_day",
    oracle=f"""
    WITH flagged AS (
        SELECT user_id, ts, event_id,
               CASE WHEN LAG(ts) OVER w IS NULL
                         OR epoch_us(ts) - epoch_us(LAG(ts) OVER w)
                            > {SESSION_GAP_MIN} * 60 * 1000000
                    THEN 1 ELSE 0 END AS is_new
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    sessions AS (
        SELECT user_id, session_seq,
               MIN(epoch_us(ts)) AS s_us, MAX(epoch_us(ts)) AS e_us
        FROM (
            SELECT user_id, ts,
                   SUM(is_new) OVER (PARTITION BY user_id
                                     ORDER BY ts, event_id
                                     ROWS UNBOUNDED PRECEDING)
                       AS session_seq
            FROM flagged
        )
        GROUP BY user_id, session_seq
    ),
    per_day AS (
        SELECT s.user_id, s.session_seq, d.day,
               GREATEST(s.s_us, d.day * 86400000000) AS cs,
               LEAST(s.e_us, (d.day + 1) * 86400000000 - 1) AS ce
        FROM sessions s CROSS JOIN LATERAL (
            SELECT unnest(range(s.s_us // 86400000000,
                                s.e_us // 86400000000 + 1)) AS day
        ) d
    ),
    sweep AS (
        SELECT day, cs AS t_us, 1 AS delta, user_id, session_seq
        FROM per_day
        UNION ALL
        SELECT day, ce, -1, user_id, session_seq FROM per_day
    ),
    running AS (
        SELECT day,
               SUM(delta) OVER (PARTITION BY day
                                ORDER BY t_us, delta DESC,
                                         user_id, session_seq
                                ROWS UNBOUNDED PRECEDING) AS conc
        FROM sweep
    )
    SELECT strftime(make_timestamp(r.day * 86400000000),
                    '%Y-%m-%d') AS day,
           CAST(COUNT(DISTINCT (p.user_id, p.session_seq)) AS BIGINT)
               AS n_sessions,
           CAST(MAX(r.conc) AS BIGINT) AS peak_concurrency
    FROM (SELECT day, MAX(conc) AS conc FROM running GROUP BY day) r
    JOIN per_day p USING (day)
    GROUP BY r.day, r.conc
    ORDER BY day
    """,
)
def peak_concurrency_by_day(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sweep-line peak concurrency — the interval-overlap analytic
    (max simultaneous sessions per day) that sizes connection pools,
    rate limits, and stateful-stream memory, and which no groupBy
    can answer: each session interval (the same 30-min
    gaps-and-islands sessions as `sessionize_events`) is clipped to
    the days it spans, then each day's +1/-1 boundary events are
    swept with a running sum whose maximum is the day's peak. Ties
    process starts before ends (touching sessions count as
    concurrent), and the remaining tie-break is total, so the prefix
    maximum is deterministic on both engines.

    Scale shape: session building rides the user-keyed window;
    the sweep partitions by DAY (bounded rows per partition = that
    day's session boundaries, never the corpus) — the day key is
    what makes a global sweep-line distributable."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap_us = SESSION_GAP_MIN * 60 * 1_000_000
    prev_us = F.unix_micros(F.lag("ts").over(w))
    numbered = ev.select(
        "user_id",
        "ts",
        F.sum(
            F.when(
                prev_us.isNull()
                | (F.unix_micros(F.col("ts")) - prev_us > gap_us),
                1,
            ).otherwise(0)
        )
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .alias("session_seq"),
    )
    day_us = 86_400_000_000
    sessions = numbered.groupBy("user_id", "session_seq").agg(
        F.min(F.unix_micros("ts")).alias("s_us"),
        F.max(F.unix_micros("ts")).alias("e_us"),
    )
    per_day = sessions.select(
        "user_id",
        "session_seq",
        F.explode(
            F.sequence(
                (F.col("s_us") / day_us).cast("long"),
                (F.col("e_us") / day_us).cast("long"),
            )
        ).alias("day"),
        "s_us",
        "e_us",
    ).select(
        "user_id",
        "session_seq",
        "day",
        F.greatest(F.col("s_us"), F.col("day") * day_us).alias("cs"),
        F.least(F.col("e_us"), (F.col("day") + 1) * day_us - 1).alias("ce"),
    )
    sweep = per_day.select(
        "day", F.col("cs").alias("t_us"), F.lit(1).alias("delta"),
        "user_id", "session_seq",
    ).unionAll(
        per_day.select(
            "day", F.col("ce").alias("t_us"), F.lit(-1).alias("delta"),
            "user_id", "session_seq",
        )
    )
    ws = (
        Window.partitionBy("day")
        .orderBy("t_us", F.desc("delta"), "user_id", "session_seq")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    peaks = (
        sweep.withColumn("conc", F.sum("delta").over(ws))
        .groupBy("day")
        .agg(F.max("conc").cast("bigint").alias("peak_concurrency"))
    )
    counts = per_day.groupBy("day").agg(
        F.countDistinct("user_id", "session_seq").alias("n_sessions")
    )
    return (
        peaks.join(counts, "day")
        .select(
            F.date_format(
                F.timestamp_micros(F.col("day") * day_us), "yyyy-MM-dd"
            ).alias("day"),
            "n_sessions",
            "peak_concurrency",
        )
        .orderBy("day")
    )


PH_DELTA = 0.5  # Page-Hinkley drift tolerance (metric units/day)
PH_LAMBDA = 5.0  # alarm threshold on the PH statistic


@query(
    "page_hinkley_drift",
    oracle=f"""
    WITH daily AS (
        SELECT date_diff('day', DATE '1970-01-01', CAST(ts AS DATE))
                   AS wd,
               AVG(value) AS x
        FROM events GROUP BY 1
    ),
    run AS (
        SELECT wd, x,
               ROUND(AVG(x) OVER (ORDER BY wd
                     ROWS UNBOUNDED PRECEDING), 6) AS xbar
        FROM daily
    ),
    dev AS (
        SELECT wd, x, xbar,
               ROUND(x - xbar - {PH_DELTA}, 6) AS d
        FROM run
    ),
    cum AS (
        SELECT wd, x, xbar,
               ROUND(SUM(d) OVER (ORDER BY wd
                     ROWS UNBOUNDED PRECEDING), 6) AS m
        FROM dev
    )
    SELECT CAST(wd AS BIGINT) AS wd,
           ROUND(x, 6) AS mean_value,
           xbar AS running_mean,
           ROUND(m - MIN(m) OVER (ORDER BY wd
                 ROWS UNBOUNDED PRECEDING), 6) AS ph_stat,
           CASE WHEN m - MIN(m) OVER (ORDER BY wd
                     ROWS UNBOUNDED PRECEDING) > {PH_LAMBDA}
                THEN 1 ELSE 0 END AS alarm
    FROM cum
    ORDER BY wd
    """,
)
def page_hinkley_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Page-Hinkley drift detection over the daily metric series —
    the sequential change-point test (Page 1954; the drift detector
    in river/MOA) beside the retrospective screens
    (`distribution_psi_drift`, `ks_drift_statistic`) and the
    smoothing baseline (`ewma_anomaly`): the statistic accumulates
    each day's deviation from the RUNNING mean minus a tolerance
    delta, and subtracts the running minimum — a sustained upward
    shift makes it climb past lambda (alarm) while zero-mean noise
    keeps it near 0. Emitted per day with the alarm flag so the
    DETECTION DAY is visible, which is the point of a sequential
    test.

    Scale shape: one aggregation to the daily grain, then three
    prefix windows over the day-grain series (running mean, cumsum,
    running min) — per-day rows at any corpus size; a multi-metric
    deployment partitions the windows by metric id (same rewrite as
    every W-family query). Intermediates are 6-dp pinned before each
    cumulative step so both engines fold identical values."""
    events = load_table(spark, sf_dir, "events")
    daily = events.groupBy(
        F.unix_date(F.to_date("ts")).alias("wd")
    ).agg(F.avg("value").alias("x"))
    return page_hinkley_series(daily)


def page_hinkley_series(
    series: DataFrame,
    ord_col: str = "wd",
    val_col: str = "x",
    delta: float = PH_DELTA,
    lamb: float = PH_LAMBDA,
) -> DataFrame:
    """Library core of `page_hinkley_drift` (api.timeseries.
    page_hinkley): the sequential test over any ordered
    (``ord_col``, ``val_col``) series — cumulative deviation from
    the running mean minus ``delta``, less its running minimum;
    alarm where the statistic exceeds ``lamb``. Three prefix windows
    over the series grain; partition them by metric id upstream for
    a multi-metric deployment."""
    wp = Window.orderBy(ord_col).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    run = series.select(
        F.col(ord_col).alias("wd"),
        F.col(val_col).alias("x"),
        F.round(F.avg(val_col).over(wp), 6).alias("xbar"),
    )
    wp2 = Window.orderBy("wd").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    dev = run.select(
        "*",
        F.round(F.col("x") - F.col("xbar") - delta, 6).alias("d"),
    )
    cum = dev.select(
        "wd",
        "x",
        "xbar",
        F.round(F.sum("d").over(wp2), 6).alias("m"),
    )
    ph = F.col("m") - F.min("m").over(wp2)
    return cum.select(
        F.col("wd").cast("bigint").alias("wd"),
        F.round("x", 6).alias("mean_value"),
        F.col("xbar").alias("running_mean"),
        F.round(ph, 6).alias("ph_stat"),
        F.when(ph > lamb, 1).otherwise(0).alias("alarm"),
    ).orderBy("wd")


@query(
    "survival_km_curve",
    oracle="""
    WITH anchor AS (SELECT MAX(ts) AS mx FROM events),
    first_signup AS (
        SELECT user_id, MIN(ts) AS t0 FROM events
        WHERE event_type = 'signup' GROUP BY user_id
    ),
    first_purchase AS (
        SELECT e.user_id, MIN(e.ts) AS tp
        FROM events e JOIN first_signup s ON e.user_id = s.user_id
        WHERE e.event_type = 'purchase' AND e.ts > s.t0
        GROUP BY e.user_id
    ),
    subjects AS (
        SELECT s.user_id,
               CASE WHEN p.tp IS NOT NULL THEN 1 ELSE 0 END AS event,
               CAST(FLOOR((epoch_us(COALESCE(p.tp, a.mx))
                    - epoch_us(s.t0)) / 86400000000.0) AS BIGINT)
                   AS t_day
        FROM first_signup s
        LEFT JOIN first_purchase p ON p.user_id = s.user_id
        CROSS JOIN anchor a
    ),
    n_total AS (SELECT COUNT(*) AS n FROM subjects),
    risk AS (
        SELECT t_day,
               SUM(event) AS d,
               (SELECT n FROM n_total)
               - COALESCE(SUM(COUNT(*)) OVER (ORDER BY t_day
                     ROWS BETWEEN UNBOUNDED PRECEDING
                              AND 1 PRECEDING), 0) AS n_risk
        FROM subjects
        GROUP BY t_day
    ),
    km AS (
        SELECT t_day, d, n_risk,
               EXP(SUM(CASE WHEN d < n_risk
                        THEN LN(1.0 - CAST(d AS DOUBLE) / n_risk)
                        ELSE 0.0 END)
                   OVER (ORDER BY t_day
                         ROWS UNBOUNDED PRECEDING)) AS s_pos,
               MAX(CASE WHEN d >= n_risk THEN 1 ELSE 0 END)
                   OVER (ORDER BY t_day
                         ROWS UNBOUNDED PRECEDING) AS hit_zero
        FROM risk
        WHERE d > 0
    )
    SELECT t_day, CAST(d AS BIGINT) AS n_events,
           CAST(n_risk AS BIGINT) AS n_at_risk,
           ROUND(CASE WHEN hit_zero = 1 THEN 0.0 ELSE s_pos END, 6)
               AS survival
    FROM km
    ORDER BY t_day
    """,
)
def survival_km_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kaplan-Meier survival curve for time-to-first-purchase after
    signup — THE estimator for time-to-event questions with
    censoring (churn, conversion latency, component failure): users
    who never purchase are right-CENSORED at the corpus horizon
    instead of being dropped (dropping them is the classic bias —
    `conversion_latency_quantiles` reports the converters-only view;
    this curve is the population view). S(t) = prod over event days
    of (1 - d_i / n_i), computed as exp of a running log-sum so the
    product is one ordered window, with the at-risk count n_i
    derived from the cumulative subjects who already left.

    Scale shape: two user-keyed aggregates build the subjects table
    (one row per user); the KM table then lives at DAY grain —
    the running sums are prefix windows over event days, the same
    boundedness as `page_hinkley_drift`'s series (partition by
    cohort for a multi-cohort deployment)."""
    ev = load_table(spark, sf_dir, "events")
    anchor = ev.agg(F.max("ts").alias("mx"))
    s0 = (
        ev.filter(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t0"))
    )
    fp = (
        ev.join(s0, "user_id")
        .filter(
            (F.col("event_type") == "purchase")
            & (F.col("ts") > F.col("t0"))
        )
        .groupBy("user_id")
        .agg(F.min("ts").alias("tp"))
    )
    subjects = (
        s0.join(fp, "user_id", "left")
        .crossJoin(F.broadcast(anchor))
        .select(
            F.when(F.col("tp").isNotNull(), 1).otherwise(0).alias(
                "event"
            ),
            F.floor(
                (
                    F.unix_micros(F.coalesce("tp", "mx"))
                    - F.unix_micros("t0")
                )
                / 86_400_000_000.0
            )
            .cast("bigint")
            .alias("t_day"),
        )
    )
    n_total = subjects.agg(F.count("*").alias("n"))
    w_prev = Window.orderBy("t_day").rowsBetween(
        Window.unboundedPreceding, -1
    )
    risk = (
        subjects.groupBy("t_day")
        .agg(
            F.sum("event").alias("d"),
            F.count("*").alias("leaving"),
        )
        .crossJoin(F.broadcast(n_total))
        .select(
            "t_day",
            "d",
            (
                F.col("n")
                - F.coalesce(
                    F.sum("leaving").over(w_prev), F.lit(0)
                )
            ).alias("n_risk"),
        )
    )
    w_cum = Window.orderBy("t_day").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    # the last event day can consume the whole risk set (d = n_i):
    # its factor is exactly 0, so the running product is split into
    # a guarded log-sum over d < n_i days and a sticky zero flag —
    # ln(0) is an error on both engines
    factor_log = F.when(
        F.col("d") < F.col("n_risk"),
        F.log(1.0 - F.col("d").cast("double") / F.col("n_risk")),
    ).otherwise(F.lit(0.0))
    hit_zero = F.max(
        F.when(F.col("d") >= F.col("n_risk"), 1).otherwise(0)
    ).over(w_cum)
    return (
        risk.filter(F.col("d") > 0)
        .select(
            "t_day",
            "d",
            "n_risk",
            F.exp(F.sum(factor_log).over(w_cum)).alias("s_pos"),
            hit_zero.alias("hit_zero"),
        )
        .select(
            "t_day",
            F.col("d").cast("bigint").alias("n_events"),
            F.col("n_risk").cast("bigint").alias("n_at_risk"),
            F.round(
                F.when(F.col("hit_zero") == 1, 0.0).otherwise(
                    F.col("s_pos")
                ),
                6,
            ).alias("survival"),
        )
        .orderBy("t_day")
    )


CUSUM_K = 0.5  # slack, in sigma units (tuned for a 1-sigma shift)
CUSUM_H = 4.0  # alarm threshold, in sigma units (ARL ~ 168 at k=0.5)
CUSUM_BASELINE = 52  # phase-I window: mu/sigma from the first year


@query(
    "cusum_drift_chart",
    oracle=f"""
    WITH weekly AS (
        SELECT CAST(date_diff('day', DATE '1970-01-01',
                              CAST(o_orderdate AS DATE)) // 7
               AS BIGINT) AS wk,
               ROUND(SUM(o_totalprice), 6) AS x
        FROM orders GROUP BY 1
    ),
    scal AS (
        SELECT ROUND(AVG(x), 6) AS mu,
               ROUND(STDDEV_POP(x), 6) AS sd
        FROM weekly
        WHERE wk < (SELECT MIN(wk) FROM weekly) + {CUSUM_BASELINE}
    ),
    z AS (
        SELECT wk, x,
               CASE WHEN sd = 0 THEN 0.0
                    ELSE ROUND((x - mu) / sd, 6) END AS z
        FROM weekly CROSS JOIN scal
    ),
    walk AS (
        SELECT wk, x, z,
               SUM(ROUND(z - {CUSUM_K}, 6)) OVER (
                   ORDER BY wk ROWS UNBOUNDED PRECEDING) AS wp,
               SUM(ROUND(-z - {CUSUM_K}, 6)) OVER (
                   ORDER BY wk ROWS UNBOUNDED PRECEDING) AS wn
        FROM z
    ),
    stat AS (
        SELECT wk, x, z,
               ROUND(wp - LEAST(0, MIN(wp) OVER (
                   ORDER BY wk ROWS UNBOUNDED PRECEDING)), 6)
                   AS cusum_pos,
               ROUND(wn - LEAST(0, MIN(wn) OVER (
                   ORDER BY wk ROWS UNBOUNDED PRECEDING)), 6)
                   AS cusum_neg
        FROM walk
    )
    SELECT wk, x AS weekly_revenue, z AS z_score,
           cusum_pos, cusum_neg,
           CASE WHEN cusum_pos > {CUSUM_H}
                  OR cusum_neg > {CUSUM_H}
                THEN 1 ELSE 0 END AS alarm
    FROM stat ORDER BY wk
    """,
)
def cusum_drift_chart(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sided tabular CUSUM control chart over the weekly revenue
    series — the SPC change detector (Page 1954's other half) beside
    `page_hinkley_drift`: where Page-Hinkley tracks deviation from
    the RUNNING mean one-sidedly, CUSUM standardizes against a fixed
    phase-I baseline (mu/sigma from the first 52 weeks) and
    accumulates BOTH directions, so a
    sustained shift of ~1 sigma crosses h=4 within a handful of
    periods while in-control noise resets to 0. The recursive
    max(0, s + z - k) fold is computed CLOSED-FORM as the running
    cumsum minus its running minimum (floored at 0) — the same
    prefix identity `page_hinkley_drift` pins — so no stateful UDF
    is needed.

    Scale shape: one map-side-combinable week-grain aggregate over
    orders, a 1-row min-week scalar and a 1-row mu/sigma scalar
    (both broadcast; the phase-I filter runs on the bounded week
    table), then prefix windows
    over the ~week-count-sized series (bounded by the calendar, not
    the corpus; partition by metric id for a multi-metric panel).
    """
    orders = load_table(spark, sf_dir, "orders")
    weekly = orders.groupBy(
        (F.unix_date(F.to_date("o_orderdate")) / 7)
        .cast("long")
        .alias("wk")
    ).agg(F.round(F.sum("o_totalprice"), 6).alias("x"))
    return cusum_series(weekly).select(
        "wk",
        F.col("x").alias("weekly_revenue"),
        F.col("z").alias("z_score"),
        "cusum_pos",
        "cusum_neg",
        "alarm",
    )


def cusum_series(
    series: DataFrame,
    ord_col: str = "wk",
    val_col: str = "x",
    k: float = CUSUM_K,
    h: float = CUSUM_H,
    baseline: int = CUSUM_BASELINE,
) -> DataFrame:
    """Library core of `cusum_drift_chart` (api.timeseries.cusum):
    the two-sided standardized tabular CUSUM over any ordered
    (``ord_col``, ``val_col``) series, via the cumsum-minus-running-
    min prefix identity. mu/sigma are PHASE-I estimates from the
    first ``baseline`` periods — standardizing against the whole
    retrospective series would let a large persistent shift
    contaminate its own baseline (the pre-shift segment then sits a
    constant z off center and the wrong chart ramps; caught by the
    planted-shift test). Partition upstream by metric id for a
    multi-metric panel."""
    weekly = series.select(
        F.col(ord_col).alias("wk"), F.col(val_col).alias("x")
    )
    mn = weekly.agg(F.min("wk").alias("mn"))
    scal = (
        weekly.crossJoin(F.broadcast(mn))
        .filter(F.col("wk") < F.col("mn") + baseline)
        .agg(
            F.round(F.avg("x"), 6).alias("mu"),
            F.round(F.stddev_pop("x"), 6).alias("sd"),
        )
    )
    z = weekly.crossJoin(F.broadcast(scal)).select(
        "wk",
        "x",
        # a zero-variance series carries no signal: z = 0 everywhere
        # (instead of a divide-by-zero null poisoning the cumsums)
        F.when(F.col("sd") == 0.0, F.lit(0.0))
        .otherwise(F.round((F.col("x") - F.col("mu")) / F.col("sd"), 6))
        .alias("z"),
    )
    wp = Window.orderBy("wk").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    walk = z.select(
        "wk",
        "x",
        "z",
        F.sum(F.round(F.col("z") - k, 6)).over(wp).alias("wpos"),
        F.sum(F.round(-F.col("z") - k, 6)).over(wp).alias("wneg"),
    )
    stat = walk.select(
        "wk",
        "x",
        "z",
        F.round(
            F.col("wpos")
            - F.least(F.lit(0.0), F.min("wpos").over(wp)),
            6,
        ).alias("cusum_pos"),
        F.round(
            F.col("wneg")
            - F.least(F.lit(0.0), F.min("wneg").over(wp)),
            6,
        ).alias("cusum_neg"),
    )
    return stat.select(
        "wk",
        "x",
        "z",
        "cusum_pos",
        "cusum_neg",
        F.when(
            (F.col("cusum_pos") > h) | (F.col("cusum_neg") > h), 1
        )
        .otherwise(0)
        .alias("alarm"),
    ).orderBy("wk")


SLO_BUDGET = 0.25  # error-share budget (events fixture: ~20% base)
SLO_PAGE_BURN = 1.1   # page: short AND medium window both above
SLO_TICKET_BURN = 1.05  # ticket: medium AND long window both above


@query(
    "slo_burn_alerts",
    oracle=f"""
    WITH hourly AS (
        SELECT CAST(date_diff('hour', TIMESTAMP '1970-01-01',
                              ts) AS BIGINT) AS hr,
               COUNT(*) AS n,
               COUNT(*) FILTER (WHERE event_type = 'error') AS ne
        FROM events GROUP BY 1
    ),
    win AS (
        SELECT hr, n, ne,
               SUM(ne) OVER w6 * 1.0 / SUM(n) OVER w6 AS r6,
               SUM(ne) OVER w72 * 1.0 / SUM(n) OVER w72 AS r72
        FROM hourly
        WINDOW
            w6 AS (ORDER BY hr
                   RANGE BETWEEN 5 PRECEDING AND CURRENT ROW),
            w72 AS (ORDER BY hr
                    RANGE BETWEEN 71 PRECEDING AND CURRENT ROW)
    )
    SELECT hr, CAST(n AS BIGINT) AS n_events,
           ROUND(ne * 1.0 / n / {SLO_BUDGET}, 6) AS burn_1h,
           ROUND(r6 / {SLO_BUDGET}, 6) AS burn_6h,
           ROUND(r72 / {SLO_BUDGET}, 6) AS burn_72h,
           CASE WHEN ne * 1.0 / n / {SLO_BUDGET} >= {SLO_PAGE_BURN}
                 AND r6 / {SLO_BUDGET} >= {SLO_PAGE_BURN}
                THEN 1 ELSE 0 END AS page_alert,
           CASE WHEN r6 / {SLO_BUDGET} >= {SLO_TICKET_BURN}
                 AND r72 / {SLO_BUDGET} >= {SLO_TICKET_BURN}
                THEN 1 ELSE 0 END AS ticket_alert
    FROM win ORDER BY hr
    """,
)
def slo_burn_alerts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-window error-budget burn-rate alerts (the SRE workbook
    policy): per hour, the error share divided by the SLO budget
    over the 1 h / 6 h / 72 h trailing windows; a PAGE needs the
    short AND medium window both burning (fast + sustained — a
    single bad scrape cannot page), a TICKET the medium AND long.
    The two-window AND is the point of the design: it bounds both
    detection time and false-page rate, which a single-threshold
    alert cannot do.

    Scale shape: one hour-grain aggregate over events (map-side
    combinable), then RANGE-frame windows over the hour series
    (range, not rows: an empty hour must not stretch the window) —
    8760 rows/year at any corpus size; a multi-service deployment
    partitions every window by service id.

    Reference anchor: turns the reference's fixed-threshold alert
    emails (reporting/alert_manager.py) into budget-relative
    multi-window policy."""
    events = load_table(spark, sf_dir, "events")
    hourly = events.groupBy(
        (F.unix_timestamp("ts") / 3600).cast("long").alias("hr")
    ).agg(
        F.count("*").alias("n"),
        F.count(F.when(F.col("event_type") == "error", 1)).alias("ne"),
    )
    w6 = Window.orderBy("hr").rangeBetween(-5, 0)
    w72 = Window.orderBy("hr").rangeBetween(-71, 0)
    r1 = F.col("ne") * 1.0 / F.col("n") / SLO_BUDGET
    r6 = (
        F.sum("ne").over(w6) * 1.0 / F.sum("n").over(w6) / SLO_BUDGET
    )
    r72 = (
        F.sum("ne").over(w72) * 1.0 / F.sum("n").over(w72) / SLO_BUDGET
    )
    return hourly.select(
        "hr",
        F.col("n").cast("bigint").alias("n_events"),
        F.round(r1, 6).alias("burn_1h"),
        F.round(r6, 6).alias("burn_6h"),
        F.round(r72, 6).alias("burn_72h"),
        F.when((r1 >= SLO_PAGE_BURN) & (r6 >= SLO_PAGE_BURN), 1)
        .otherwise(0)
        .alias("page_alert"),
        F.when((r6 >= SLO_TICKET_BURN) & (r72 >= SLO_TICKET_BURN), 1)
        .otherwise(0)
        .alias("ticket_alert"),
    ).orderBy("hr")


@query(
    "theilsen_trend",
    oracle="""
    WITH weekly AS (
        SELECT CAST(date_diff('day', DATE '1970-01-01',
                              CAST(o_orderdate AS DATE)) // 7
               AS BIGINT) AS wk,
               ROUND(SUM(o_totalprice), 6) AS x
        FROM orders GROUP BY 1
    ),
    slopes AS (
        SELECT ROUND((b.x - a.x) / (b.wk - a.wk), 6) AS s
        FROM weekly a JOIN weekly b ON a.wk < b.wk
    ),
    ts AS (SELECT ROUND(quantile_cont(s, 0.5), 6) AS ts_slope
           FROM slopes),
    ols AS (
        SELECT ROUND(regr_slope(x, wk), 6) AS ols_slope,
               CAST(COUNT(*) AS BIGINT) AS n_weeks
        FROM weekly
    ),
    res AS (
        SELECT ROUND(quantile_cont(x - ts_slope * wk, 0.5), 6)
                   AS ts_intercept
        FROM weekly CROSS JOIN ts
    )
    SELECT n_weeks, ts_slope, ts_intercept, ols_slope,
           ROUND(ts_slope - ols_slope, 6) AS slope_gap
    FROM ols CROSS JOIN ts CROSS JOIN res
    """,
)
def theilsen_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theil-Sen robust trend of the weekly revenue series — the
    median of all pairwise slopes, beside the OLS slope
    (`metric_trend_fit`'s estimator) it corrects: OLS has breakdown
    point 0 (one corrupted week — a backfill, an outage, a currency
    bug — drags the fitted trend arbitrarily), Theil-Sen tolerates
    ~29% corrupted points before moving. slope_gap IS the health
    check: near 0 when the series is clean, large exactly when the
    OLS number on a dashboard is lying.

    Scale shape: the pair set is CALENDAR-squared, not corpus-sized
    (344 weeks -> 59k slope pairs regardless of row count; the
    corpus appears only in the first week-grain aggregate), so the
    O(n^2) estimator is safe HERE by construction — for decade-long
    daily series, cap the pair span or switch to the repeated-median
    variant, and partition everything by metric id. Medians are
    exact percentiles over the bounded slope table.

    Reference anchor: robustifies the reference's trend arithmetic
    (reporting/metrics_tracker.py), which is a plain two-point
    delta."""
    orders = load_table(spark, sf_dir, "orders")
    weekly = orders.groupBy(
        (F.unix_date(F.to_date("o_orderdate")) / 7)
        .cast("long")
        .alias("wk")
    ).agg(F.round(F.sum("o_totalprice"), 6).alias("x"))
    a = weekly.select(F.col("wk").alias("wa"), F.col("x").alias("xa"))
    b = weekly.select(F.col("wk").alias("wb"), F.col("x").alias("xb"))
    slopes = a.join(b, F.col("wa") < F.col("wb")).select(
        F.round(
            (F.col("xb") - F.col("xa")) / (F.col("wb") - F.col("wa")),
            6,
        ).alias("s")
    )
    ts = slopes.agg(
        F.round(F.percentile("s", F.lit(0.5)), 6).alias("ts_slope")
    )
    ols = weekly.agg(
        F.round(F.regr_slope("x", "wk"), 6).alias("ols_slope"),
        F.count("*").cast("bigint").alias("n_weeks"),
    )
    res = weekly.crossJoin(F.broadcast(ts)).agg(
        F.round(
            F.percentile(
                F.col("x") - F.col("ts_slope") * F.col("wk"),
                F.lit(0.5),
            ),
            6,
        ).alias("ts_intercept")
    )
    return (
        ols.crossJoin(F.broadcast(ts))
        .crossJoin(F.broadcast(res))
        .select(
            "n_weeks",
            "ts_slope",
            "ts_intercept",
            "ols_slope",
            F.round(
                F.col("ts_slope") - F.col("ols_slope"), 6
            ).alias("slope_gap"),
        )
    )


MASE_SEASON = 7  # weekly seasonality lag for the seasonal-naive model


@query(
    "forecast_backtest_mase",
    oracle=f"""
    WITH daily AS (
        SELECT CAST(date_diff('day', DATE '1970-01-01',
                              CAST(ts AS DATE)) AS BIGINT) AS d,
               ROUND(AVG(value), 6) AS x
        FROM events GROUP BY 1
    ),
    lagged AS (
        SELECT d, x,
               LAG(x, 1) OVER (ORDER BY d) AS p_naive,
               LAG(x, {MASE_SEASON}) OVER (ORDER BY d) AS p_seasonal
        FROM daily
    ),
    scored AS (
        SELECT * FROM lagged
        WHERE p_naive IS NOT NULL AND p_seasonal IS NOT NULL
    ),
    m AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n_days,
               ROUND(AVG(ABS(x - p_naive)), 6) AS mae_naive,
               ROUND(AVG(ABS(x - p_seasonal)), 6) AS mae_seasonal
        FROM scored
    )
    SELECT model, n_days, mae,
           ROUND(mae / mae_naive, 6) AS mase
    FROM (
        SELECT 'naive_1' AS model, n_days, mae_naive AS mae,
               mae_naive FROM m
        UNION ALL
        SELECT 'seasonal_{MASE_SEASON}', n_days, mae_seasonal,
               mae_naive FROM m
    )
    ORDER BY model
    """,
)
def forecast_backtest_mase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-step forecast backtest with MASE — the scale-free forecast
    accuracy metric (Hyndman & Koehler 2006) every capacity-planning
    or anomaly-threshold pipeline should publish before trusting a
    model: MAE of each candidate over the SAME in-sample one-step
    horizon, divided by the naive-1 MAE, so MASE < 1 means 'beats
    persistence' in any units. Backtested here: naive-1 (MASE 1.0 by
    construction — the sanity anchor) and seasonal-naive at lag 7,
    which wins exactly when the series has real weekly structure
    (`seasonal_decompose_daily` shows the structure; this prices it).
    Both models score only where BOTH have a prediction, so the
    comparison is same-support.

    Scale shape: one day-grain aggregate, two lag windows over the
    calendar-bounded series, one scalar rollup — 2 rows out at any
    corpus size; partition by metric/service id for a panel.

    Reference anchor: the reference trends raw deltas with no
    forecast baseline at all (reporting/metrics_tracker.py)."""
    events = load_table(spark, sf_dir, "events")
    daily = events.groupBy(
        F.unix_date(F.to_date("ts")).alias("d")
    ).agg(F.round(F.avg("value"), 6).alias("x"))
    w = Window.orderBy("d")
    lagged = daily.select(
        "x",
        F.lag("x", 1).over(w).alias("p_naive"),
        F.lag("x", MASE_SEASON).over(w).alias("p_seasonal"),
    ).filter(
        F.col("p_naive").isNotNull() & F.col("p_seasonal").isNotNull()
    )
    m = lagged.agg(
        F.count("*").cast("bigint").alias("n_days"),
        F.round(F.avg(F.abs(F.col("x") - F.col("p_naive"))), 6).alias(
            "mae_naive"
        ),
        F.round(
            F.avg(F.abs(F.col("x") - F.col("p_seasonal"))), 6
        ).alias("mae_seasonal"),
    )
    naive = m.select(
        F.lit("naive_1").alias("model"),
        "n_days",
        F.col("mae_naive").alias("mae"),
        F.round(F.col("mae_naive") / F.col("mae_naive"), 6).alias(
            "mase"
        ),
    )
    seasonal = m.select(
        F.lit(f"seasonal_{MASE_SEASON}").alias("model"),
        "n_days",
        F.col("mae_seasonal").alias("mae"),
        F.round(F.col("mae_seasonal") / F.col("mae_naive"), 6).alias(
            "mase"
        ),
    )
    return naive.unionAll(seasonal).orderBy("model")


# ---------------------------------------------------------------------
# Dependence-structure diagnostics: the ACF panel every forecasting /
# anomaly pipeline reads before choosing model order, and the Fano
# overdispersion screen for event streams.
# ---------------------------------------------------------------------

ACF_MAX_LAG = 7  # weekly structure shows at lag 7 on a daily series


def acf_series(daily, max_lag: int = None):
    """Library core of `acf_panel` (api.timeseries.acf_series): ACF
    lags 1..max_lag of a (d: date, x: double) series with the
    1.96/sqrt(n) white-noise band, on a CALENDAR join so gaps pair
    only true k-day-apart points. Lags with no pair are omitted.
    The series is assumed pre-aggregated to its grain (bounded)."""
    max_lag = ACF_MAX_LAG if max_lag is None else max_lag
    spark = daily.sparkSession
    mu = daily.agg(
        F.avg("x").alias("mu"), F.count("*").alias("n")
    )
    ss = daily.crossJoin(F.broadcast(mu)).agg(
        F.sum(
            (F.col("x") - F.col("mu")) * (F.col("x") - F.col("mu"))
        ).alias("ss"),
        F.first("mu").alias("mu"),
        F.first("n").alias("n"),
    )
    lag_grid = spark.range(1, max_lag + 1).select(
        F.col("id").cast("int").alias("lag")
    )
    a = daily.alias("a")
    b = daily.alias("b")
    lags = lag_grid.join(a, F.lit(True)).join(
        b,
        F.col("b.d") == F.date_add(F.col("a.d"), F.col("lag")),
    )
    acf = F.round(
        F.sum(
            (F.col("a.x") - F.col("mu"))
            * (F.col("b.x") - F.col("mu"))
        )
        / F.first("ss"),
        6,
    )
    band = F.round(1.96 / F.sqrt(F.first("n")), 6)
    return (
        lags.crossJoin(F.broadcast(ss))
        .groupBy("lag")
        .agg(
            acf.alias("acf"),
            band.alias("wn_band"),
            (F.abs(acf) > band).alias("significant"),
        )
        .orderBy("lag")
    )


def fano_by(events, group_col: str, ts_col: str = "ts"):
    """Library core of `fano_burstiness` (api.timeseries.fano_by):
    per group, the Fano factor of the daily count series with the
    1 + 2*sqrt(2/(n-1)) overdispersion flag. One (group, day)
    aggregate + a group-grain two-pass variance rollup."""
    daily = events.groupBy(
        group_col, F.to_date(ts_col).alias("d")
    ).agg(F.count("*").alias("c"))
    mu = daily.groupBy(group_col).agg(F.avg("c").alias("mu_t"))
    stats = (
        daily.join(mu, group_col)
        .groupBy(group_col)
        .agg(
            F.count("*").cast("bigint").alias("n_days"),
            F.round(F.avg("c"), 6).alias("mean_daily"),
            F.round(
                F.sum(
                    (F.col("c") - F.col("mu_t"))
                    * (F.col("c") - F.col("mu_t"))
                )
                / F.count("*"),
                6,
            ).alias("var_daily"),
        )
    )
    fano = F.round(F.col("var_daily") / F.col("mean_daily"), 6)
    thresh = F.round(
        1.0 + 2.0 * F.sqrt(2.0 / (F.col("n_days") - 1)), 6
    )
    return stats.select(
        group_col,
        "n_days",
        "mean_daily",
        "var_daily",
        fano.alias("fano"),
        (fano > thresh).alias("overdispersed"),
    ).orderBy(group_col)


@query(
    "acf_panel",
    oracle=f"""
    WITH daily AS (
        SELECT o_orderdate AS d,
               ROUND(SUM(o_totalprice), 6) AS x
        FROM orders GROUP BY 1
    ),
    mu AS (
        SELECT AVG(x) AS mu, COUNT(*) AS n,
               SUM((x - (SELECT AVG(x) FROM daily))
                   * (x - (SELECT AVG(x) FROM daily))) AS ss
        FROM daily
    ),
    lags AS (
        SELECT l.lag, a.x AS xa, b.x AS xb
        FROM (SELECT unnest(range(1, {ACF_MAX_LAG} + 1)) AS lag) l
        JOIN daily a ON TRUE
        JOIN daily b ON b.d = a.d + to_days(CAST(l.lag AS INTEGER))
    )
    SELECT l.lag AS lag,
           ROUND(SUM((l.xa - m.mu) * (l.xb - m.mu)) / m.ss, 6)
               AS acf,
           ROUND(1.96 / SQRT(m.n), 6) AS wn_band,
           ABS(ROUND(SUM((l.xa - m.mu) * (l.xb - m.mu)) / m.ss, 6))
               > ROUND(1.96 / SQRT(m.n), 6) AS significant
    FROM lags l CROSS JOIN mu m
    GROUP BY l.lag, m.mu, m.ss, m.n
    ORDER BY lag
    """,
)
def acf_panel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Autocorrelation function of daily revenue, lags 1..{lag} —
    the first plot a forecaster reads (which AR order? is there
    weekly structure? is the residual white?) and the dependence
    screen `forecast_backtest_mase`'s naive anchors assume away.
    Each lag's ACF uses the standard biased estimator (denominator =
    total sum of squares, the form that keeps |acf| <= 1 and matches
    statsmodels' default); the white-noise band is +-1.96/sqrt(n),
    and `significant` flags lags outside it — on a calendar-joined
    series, so date GAPS pair only true k-day-apart observations
    instead of sliding over missing days.

    Scale shape: the corpus collapses to the day-grain series first
    (one map-side-combinable aggregate); the lag pairing is a
    calendar-key equi-join of that bounded series against a 7-row
    lag grid, and mean/SS ride a 1-row broadcast. Nothing downstream
    of the first aggregate is corpus-grain.""".format(
        lag=ACF_MAX_LAG
    )
    orders = load_table(spark, sf_dir, "orders")
    daily = orders.groupBy(F.col("o_orderdate").alias("d")).agg(
        F.round(F.sum("o_totalprice"), 6).alias("x")
    )
    return acf_series(daily, ACF_MAX_LAG)


@query(
    "fano_burstiness",
    oracle="""
    WITH daily AS (
        SELECT event_type, CAST(ts AS DATE) AS d,
               COUNT(*) AS c
        FROM events GROUP BY 1, 2
    ),
    stats AS (
        SELECT event_type,
               CAST(COUNT(*) AS BIGINT) AS n_days,
               ROUND(AVG(c), 6) AS mean_daily,
               ROUND(SUM((c - (SELECT AVG(c) FROM daily d2
                          WHERE d2.event_type = daily.event_type))
                         * (c - (SELECT AVG(c) FROM daily d2
                            WHERE d2.event_type = daily.event_type)))
                     / COUNT(*), 6) AS var_daily
        FROM daily GROUP BY event_type
    )
    SELECT event_type, n_days, mean_daily, var_daily,
           ROUND(var_daily / mean_daily, 6) AS fano,
           ROUND(var_daily / mean_daily, 6)
               > ROUND(1.0 + 2.0 * SQRT(2.0 / (n_days - 1)), 6)
               AS overdispersed
    FROM stats
    ORDER BY event_type
    """,
)
def fano_burstiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fano-factor burstiness screen per event type — is arrival
    volume Poisson-like (steady load, autoscaling and capacity math
    hold) or BURSTY (variance-to-mean ratio >> 1: thundering herds,
    retry storms, bot traffic)? The Fano factor var/mean of the
    daily count series is exactly 1 under Poisson arrivals;
    `overdispersed` flags types beyond 1 + 2*sqrt(2/(n-1)) — a
    two-sigma bound from the chi-square dispersion test's variance
    (2/(n-1) for the scaled dispersion index under H0). The
    streaming-ops companion of `interevent_gap_histogram` (gaps
    read within-day microstructure; Fano reads day-scale stability).

    Scale shape: one (type, day) aggregate (map-side combinable),
    then a type-grain rollup computing the two-pass population
    variance in-plane; the flag threshold is row-local arithmetic.
    Output is |event types| rows."""
    events = load_table(spark, sf_dir, "events")
    return fano_by(events, "event_type", "ts")


@query(
    "stl_strength_panel",
    oracle="""
    WITH daily AS (
        SELECT CAST(ts AS DATE) AS day,
               dayofweek(CAST(ts AS DATE)) AS dow,
               ROUND(SUM(value), 6) AS total
        FROM events GROUP BY 1, 2
    ),
    detr AS (
        SELECT day, dow, total,
               ROUND(AVG(total) OVER (ORDER BY day
                     ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING), 6)
                   AS trend
        FROM daily
    ),
    comp AS (
        SELECT d.day, d.total, d.trend,
               ROUND(d.total - d.trend, 6) AS detrended,
               s.seasonal,
               ROUND(ROUND(d.total - d.trend, 6) - s.seasonal, 6)
                   AS resid
        FROM detr d
        JOIN (SELECT dow, ROUND(AVG(ROUND(total - trend, 6)), 6)
                     AS seasonal
              FROM detr GROUP BY dow) s
          ON d.dow = s.dow
    ),
    vars AS (
        SELECT COUNT(*) AS n_days,
               SUM((resid - (SELECT AVG(resid) FROM comp))
                   * (resid - (SELECT AVG(resid) FROM comp)))
                   AS v_r,
               SUM((seasonal + resid
                    - (SELECT AVG(seasonal + resid) FROM comp))
                   * (seasonal + resid
                      - (SELECT AVG(seasonal + resid) FROM comp)))
                   AS v_sr,
               SUM((trend + resid
                    - (SELECT AVG(trend + resid) FROM comp))
                   * (trend + resid
                      - (SELECT AVG(trend + resid) FROM comp)))
                   AS v_tr
        FROM comp
    )
    SELECT CAST(n_days AS BIGINT) AS n_days,
           ROUND(GREATEST(0.0, 1.0 - v_r / v_sr), 6)
               AS seasonal_strength,
           ROUND(GREATEST(0.0, 1.0 - v_r / v_tr), 6)
               AS trend_strength
    FROM vars
    """,
)
def stl_strength_panel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seasonal- and trend-strength of the daily event-value series —
    the two scalars (Wang-Hyndman-Smith; the tsfeatures `stl_features`
    readout) that tell a forecasting/anomaly pipeline WHICH structure
    its models must carry: F_seasonal = max(0, 1 - Var(R)/Var(S+R))
    and F_trend = max(0, 1 - Var(R)/Var(T+R)) over
    `seasonal_decompose_daily`'s additive components (7-day moving-
    average trend, day-of-week seasonal, residual). Near 0 = the
    component is noise and modeling it is overfitting; near 1 =
    dropping it (ewma_anomaly's level-only logic) misflags weekends.

    Scale shape: the corpus reduces to the day grain immediately;
    the decomposition windows run on the 365-row/year series (the
    seasonal_decompose_daily boundedness), and the strength scalars
    are one bounded two-pass variance aggregate. Output is 1 row."""
    events = load_table(spark, sf_dir, "events")
    daily = events.groupBy(
        F.col("ts").cast("date").alias("day"),
        (F.dayofweek(F.col("ts").cast("date")) - 1).alias("dow"),
    ).agg(F.round(F.sum("value"), 6).alias("total"))
    w_ma = Window.orderBy("day").rowsBetween(-3, 3)
    detr = daily.select(
        "day",
        "dow",
        "total",
        F.round(F.avg("total").over(w_ma), 6).alias("trend"),
    ).withColumn(
        "detrended", F.round(F.col("total") - F.col("trend"), 6)
    )
    seasonal = detr.groupBy("dow").agg(
        F.round(F.avg("detrended"), 6).alias("seasonal")
    )
    comp = detr.join(F.broadcast(seasonal), "dow").select(
        "trend",
        "seasonal",
        F.round(F.col("detrended") - F.col("seasonal"), 6).alias(
            "resid"
        ),
    )
    means = comp.agg(
        F.avg("resid").alias("m_r"),
        F.avg(F.col("seasonal") + F.col("resid")).alias("m_sr"),
        F.avg(F.col("trend") + F.col("resid")).alias("m_tr"),
    )
    vars_ = comp.crossJoin(F.broadcast(means)).agg(
        F.count("*").cast("bigint").alias("n_days"),
        F.sum(
            (F.col("resid") - F.col("m_r"))
            * (F.col("resid") - F.col("m_r"))
        ).alias("v_r"),
        F.sum(
            (F.col("seasonal") + F.col("resid") - F.col("m_sr"))
            * (F.col("seasonal") + F.col("resid") - F.col("m_sr"))
        ).alias("v_sr"),
        F.sum(
            (F.col("trend") + F.col("resid") - F.col("m_tr"))
            * (F.col("trend") + F.col("resid") - F.col("m_tr"))
        ).alias("v_tr"),
    )
    return vars_.select(
        "n_days",
        F.round(
            F.greatest(
                F.lit(0.0), 1.0 - F.col("v_r") / F.col("v_sr")
            ),
            6,
        ).alias("seasonal_strength"),
        F.round(
            F.greatest(
                F.lit(0.0), 1.0 - F.col("v_r") / F.col("v_tr")
            ),
            6,
        ).alias("trend_strength"),
    )


MARKOV_SMOOTH_K = 0.5  # add-k smoothing for unseen transitions
MARKOV_TOPK = 15


@query(
    "session_markov_surprisal",
    oracle=f"""
    WITH seq AS (
        SELECT user_id, event_type,
               LEAD(event_type) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
               ) AS next_type
        FROM events
    ),
    trans AS (
        SELECT event_type AS from_type, next_type AS to_type,
               COUNT(*) AS n
        FROM seq WHERE next_type IS NOT NULL
        GROUP BY 1, 2
    ),
    tot AS (
        SELECT from_type, SUM(n) AS row_total FROM trans GROUP BY 1
    ),
    v AS (SELECT COUNT(DISTINCT event_type) AS v FROM events),
    probs AS (
        SELECT t.from_type, t.to_type,
               ROUND((t.n + {MARKOV_SMOOTH_K})
                     / (o.row_total + {MARKOV_SMOOTH_K} * v.v), 6)
                   AS p
        FROM trans t
        JOIN tot o ON t.from_type = o.from_type
        CROSS JOIN v
    ),
    fallback AS (
        SELECT o.from_type,
               ROUND({MARKOV_SMOOTH_K}
                     / (o.row_total + {MARKOV_SMOOTH_K} * v.v), 6)
                   AS p_unseen
        FROM tot o CROSS JOIN v
    ),
    scored AS (
        SELECT s.user_id,
               -LN(COALESCE(p.p, f.p_unseen)) AS nll
        FROM seq s
        JOIN fallback f ON s.event_type = f.from_type
        LEFT JOIN probs p ON s.event_type = p.from_type
                         AND s.next_type = p.to_type
        WHERE s.next_type IS NOT NULL
    )
    SELECT user_id,
           CAST(COUNT(*) AS BIGINT) AS n_transitions,
           ROUND(AVG(nll), 6) AS mean_surprisal,
           ROUND(EXP(AVG(nll)), 6) AS perplexity
    FROM scored
    GROUP BY user_id
    ORDER BY mean_surprisal DESC, user_id
    LIMIT {MARKOV_TOPK}
    """,
)
def session_markov_surprisal(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Per-user sequence surprisal under the corpus's own first-order
    Markov model — the behavioral-anomaly upgrade of
    `event_transition_matrix`: the matrix says what transitions ARE,
    this scores every user's stream against it and surfaces the
    top-{topk} most IMPROBABLE sequences (bots walking impossible
    paths, broken clients replaying, fraud scripts — the sequence
    analogue of `lm_perplexity_buckets`' text scoring, with the
    transition model in the LM's seat). Add-{k} smoothing prices
    unseen transitions instead of zeroing them; the score is mean
    transition negative log-likelihood and its exp (perplexity).

    Scale shape: one user-keyed LEAD window (user grain, naturally
    parallel), the transition model is a bounded |types|^2 table
    joined back as a (from, to) equi-join (AQE broadcasts it), and
    the per-user rollup is map-side combinable into a TakeOrdered
    head. Model fit and scoring ride the SAME seq pass.""".format(
        topk=MARKOV_TOPK, k=MARKOV_SMOOTH_K
    )
    events = load_table(spark, sf_dir, "events")
    w_seq = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = events.select(
        "user_id",
        "event_type",
        F.lead("event_type").over(w_seq).alias("next_type"),
    )
    trans = (
        seq.filter(F.col("next_type").isNotNull())
        .groupBy(
            F.col("event_type").alias("from_type"),
            F.col("next_type").alias("to_type"),
        )
        .agg(F.count("*").alias("n"))
    )
    tot = trans.groupBy("from_type").agg(
        F.sum("n").alias("row_total")
    )
    v = events.agg(
        F.countDistinct("event_type").alias("v")
    )
    probs = (
        trans.join(tot, "from_type")
        .crossJoin(F.broadcast(v))
        .select(
            "from_type",
            "to_type",
            F.round(
                (F.col("n") + MARKOV_SMOOTH_K)
                / (F.col("row_total") + MARKOV_SMOOTH_K * F.col("v")),
                6,
            ).alias("p"),
        )
    )
    fallback = tot.crossJoin(F.broadcast(v)).select(
        "from_type",
        F.round(
            MARKOV_SMOOTH_K
            / (F.col("row_total") + MARKOV_SMOOTH_K * F.col("v")),
            6,
        ).alias("p_unseen"),
    )
    scored = (
        seq.filter(F.col("next_type").isNotNull())
        .join(fallback, seq.event_type == fallback.from_type)
        .join(
            probs.withColumnRenamed("from_type", "pf"),
            (F.col("event_type") == F.col("pf"))
            & (F.col("next_type") == F.col("to_type")),
            "left",
        )
        .select(
            "user_id",
            (-F.log(F.coalesce("p", "p_unseen"))).alias("nll"),
        )
    )
    return (
        scored.groupBy("user_id")
        .agg(
            F.count("*").cast("bigint").alias("n_transitions"),
            F.round(F.avg("nll"), 6).alias("mean_surprisal"),
            F.round(F.exp(F.avg("nll")), 6).alias("perplexity"),
        )
        .orderBy(F.desc("mean_surprisal"), "user_id")
        .limit(MARKOV_TOPK)
    )


@query(
    "changepoint_binary_seg",
    oracle="""
    WITH weekly AS (
        SELECT o_orderpriority AS priority,
               CAST(date_diff('day', DATE '1970-01-01',
                              CAST(o_orderdate AS DATE)) // 7
               AS BIGINT) AS wk,
               ROUND(SUM(o_totalprice) / 1e6, 6) AS x
        FROM orders GROUP BY 1, 2
    ),
    cum AS (
        SELECT priority, wk, x,
               ROW_NUMBER() OVER w AS i,
               SUM(x) OVER w AS s,
               SUM(x * x) OVER w AS q
        FROM weekly
        WINDOW w AS (PARTITION BY priority ORDER BY wk
                     ROWS UNBOUNDED PRECEDING)
    ),
    tot AS (
        SELECT priority, COUNT(*) AS n, SUM(x) AS ts, SUM(x * x) AS tq
        FROM weekly GROUP BY 1
    ),
    gains AS (
        SELECT c.priority, c.wk, c.i, t.n,
               ROUND(
                   (t.tq - t.ts * t.ts / t.n)
                   - (c.q - c.s * c.s / c.i)
                   - ((t.tq - c.q)
                      - (t.ts - c.s) * (t.ts - c.s) / (t.n - c.i)),
                   6) AS gain,
               ROUND(c.s / c.i, 6) AS mean_left,
               ROUND((t.ts - c.s) / (t.n - c.i), 6) AS mean_right
        FROM cum c JOIN tot t USING (priority)
        WHERE c.i < t.n
    )
    SELECT priority,
           CAST(n AS BIGINT) AS n_weeks,
           wk AS change_wk,
           CAST(i AS BIGINT) AS n_left,
           CAST(n - i AS BIGINT) AS n_right,
           mean_left, mean_right, gain
    FROM gains
    QUALIFY ROW_NUMBER() OVER (PARTITION BY priority
                               ORDER BY gain DESC, wk) = 1
    ORDER BY priority
    """,
)
def changepoint_binary_seg(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Single-changepoint detection (the first round of binary
    segmentation, Scott & Knott 1974 / PELT's building block) on the
    weekly revenue series per order priority: the split that
    maximizes the within-segment SSE reduction — the retrospective
    'WHEN did this series change level' answer that complements the
    sequential detectors (`cusum_drift_chart` watches forward,
    `page_hinkley_drift` alarms online, this one localizes the break
    after the fact; full binary segmentation recurses on the two
    halves, each round this exact shape).

    Gain arithmetic is the classic cumulative-moment identity:
    SSE(a..b) = Q - S^2/n with one ordered prefix-sum pass, so the
    whole scan of n-1 candidate splits costs ONE window over the
    week-grain series (344 weeks here; bounded by the calendar at
    any corpus size — the corpus appears only in the week-grain
    aggregate). Ordered prefix sums evaluate in the same order on
    both engines, so 6-dp rounding of the gain is engine-stable;
    the argmax tie-breaks to the earliest week via struct-max on
    (gain, -wk), mirrored by the oracle's QUALIFY rank.

    Scale shape: one shuffle to week grain, windows PARTITIONED by
    priority (never corpus-grain), a 5-row per-priority totals
    broadcast, and a 5-row struct-max argmax. Multi-metric panels
    partition by metric id, same plan."""
    orders = load_table(spark, sf_dir, "orders")
    weekly = orders.groupBy(
        F.col("o_orderpriority").alias("priority"),
        (F.unix_date(F.to_date("o_orderdate")) / 7)
        .cast("long")
        .alias("wk"),
    ).agg(F.round(F.sum("o_totalprice") / 1e6, 6).alias("x"))
    w = (
        Window.partitionBy("priority")
        .orderBy("wk")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = weekly.select(
        "priority",
        "wk",
        F.row_number().over(
            Window.partitionBy("priority").orderBy("wk")
        ).alias("i"),
        F.sum("x").over(w).alias("s"),
        F.sum(F.col("x") * F.col("x")).over(w).alias("q"),
    )
    tot = weekly.groupBy("priority").agg(
        F.count("*").alias("n"),
        F.sum("x").alias("ts"),
        F.sum(F.col("x") * F.col("x")).alias("tq"),
    )
    gains = (
        cum.join(F.broadcast(tot), "priority")
        .filter(F.col("i") < F.col("n"))
        .select(
            "priority",
            "wk",
            "i",
            "n",
            F.round(
                (F.col("tq") - F.col("ts") * F.col("ts") / F.col("n"))
                - (F.col("q") - F.col("s") * F.col("s") / F.col("i"))
                - (
                    (F.col("tq") - F.col("q"))
                    - (F.col("ts") - F.col("s"))
                    * (F.col("ts") - F.col("s"))
                    / (F.col("n") - F.col("i"))
                ),
                6,
            ).alias("gain"),
            F.round(F.col("s") / F.col("i"), 6).alias("mean_left"),
            F.round(
                (F.col("ts") - F.col("s")) / (F.col("n") - F.col("i")),
                6,
            ).alias("mean_right"),
        )
    )
    best = gains.groupBy("priority").agg(
        F.max(
            F.struct(
                F.col("gain").alias("g"),
                (-F.col("wk")).alias("nwk"),
                F.col("n").alias("n"),
                F.col("i").alias("i"),
                F.col("mean_left").alias("ml"),
                F.col("mean_right").alias("mr"),
            )
        ).alias("m")
    )
    return best.select(
        "priority",
        F.col("m.n").cast("bigint").alias("n_weeks"),
        (-F.col("m.nwk")).alias("change_wk"),
        F.col("m.i").cast("bigint").alias("n_left"),
        (F.col("m.n") - F.col("m.i")).cast("bigint").alias("n_right"),
        F.col("m.ml").alias("mean_left"),
        F.col("m.mr").alias("mean_right"),
        F.col("m.g").alias("gain"),
    ).orderBy("priority")


LB_LAGS = 6  # Ljung-Box portmanteau horizon (even -> closed-form chi2)


@query(
    "ljung_box_test",
    oracle=f"""
    WITH daily AS (
        SELECT o_orderdate AS d,
               ROUND(SUM(o_totalprice), 6) AS x
        FROM orders GROUP BY 1
    ),
    mu AS (
        SELECT AVG(x) AS mu, COUNT(*) AS n,
               SUM((x - (SELECT AVG(x) FROM daily))
                   * (x - (SELECT AVG(x) FROM daily))) AS ss
        FROM daily
    ),
    rho AS (
        SELECT l.lag,
               ROUND(SUM((a.x - m.mu) * (b.x - m.mu)) / MAX(m.ss), 6)
                   AS r,
               MAX(m.n) AS n
        FROM (SELECT unnest(range(1, {LB_LAGS} + 1)) AS lag) l
        JOIN daily a ON TRUE
        JOIN daily b ON b.d = a.d + to_days(CAST(l.lag AS INTEGER))
        CROSS JOIN mu m
        GROUP BY l.lag
    ),
    q AS (
        SELECT MAX(n) AS n,
               ROUND(MAX(n) * (MAX(n) + 2)
                     * SUM(r * r / (n - lag)), 6) AS q_stat
        FROM rho
    )
    SELECT CAST(n AS BIGINT) AS n_days,
           CAST({LB_LAGS} AS BIGINT) AS n_lags,
           q_stat,
           ROUND(EXP(-q_stat / 2)
                 * (1 + q_stat / 2
                    + (q_stat / 2) * (q_stat / 2) / 2), 6)
               AS p_value,
           EXP(-q_stat / 2)
               * (1 + q_stat / 2
                  + (q_stat / 2) * (q_stat / 2) / 2) > 0.05
               AS white_noise
    FROM q
    """,
)
def ljung_box_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ljung-Box portmanteau whiteness test on the daily revenue
    series — the ONE-NUMBER verdict on `acf_panel`'s per-lag plot
    (Ljung & Box 1978): Q = n(n+2) * sum_k rho_k^2/(n-k) over lags
    1..6 is chi-square(6) under the white-noise null, so a small
    p-value says the series has exploitable autocorrelation (fit an
    AR / seasonal model; `forecast_backtest_mase`'s naive anchors
    are beatable) and a large one says the residual is done. The
    even dof makes the chi-square survival CLOSED FORM —
    exp(-x/2) * sum_(i<dof/2) (x/2)^i/i! — the same no-erf
    discipline as the Welch/BH constants, so both engines compute
    the p-value exactly.

    Scale shape: acf_panel's lineage end-to-end — corpus collapses
    to the day-grain series, a 6-row lag grid calendar-joins it,
    mean/SS ride a 1-row broadcast, and Q folds the 6-row rho table
    into one row. Per-lag rho is 6-dp-pinned BEFORE entering Q so
    the portmanteau sum is engine-deterministic."""
    orders = load_table(spark, sf_dir, "orders")
    daily = orders.groupBy(F.col("o_orderdate").alias("d")).agg(
        F.round(F.sum("o_totalprice"), 6).alias("x")
    )
    mu = daily.agg(
        F.avg("x").alias("mu"),
        F.count("*").alias("n"),
        (
            F.sum(F.col("x") * F.col("x"))
            - F.count("*") * F.avg("x") * F.avg("x")
        ).alias("ss"),
    )
    lag_grid = spark.range(1, LB_LAGS + 1).select(
        F.col("id").cast("int").alias("lag")
    )
    a = daily.select(F.col("d").alias("da"), F.col("x").alias("xa"))
    b = daily.select(F.col("d").alias("db"), F.col("x").alias("xb"))
    pairs = (
        F.broadcast(lag_grid)
        .crossJoin(a)
        .join(
            b,
            F.col("db")
            == F.date_add(F.col("da"), F.col("lag")),
        )
    )
    rho = (
        pairs.crossJoin(F.broadcast(mu))
        .groupBy("lag")
        .agg(
            F.round(
                F.sum(
                    (F.col("xa") - F.col("mu"))
                    * (F.col("xb") - F.col("mu"))
                )
                / F.max("ss"),
                6,
            ).alias("r"),
            F.max("n").alias("n"),
        )
    )
    q = rho.agg(
        F.max("n").alias("n"),
        F.round(
            F.max("n")
            * (F.max("n") + 2)
            * F.sum(
                F.col("r") * F.col("r") / (F.col("n") - F.col("lag"))
            ),
            6,
        ).alias("q_stat"),
    )
    half = F.col("q_stat") / 2
    surv = F.exp(-half) * (1 + half + half * half / 2)
    return q.select(
        F.col("n").cast("bigint").alias("n_days"),
        F.lit(LB_LAGS).cast("bigint").alias("n_lags"),
        "q_stat",
        F.round(surv, 6).alias("p_value"),
        (surv > 0.05).alias("white_noise"),
    )


EVT_EULER = 0.5772156649015329  # Euler-Mascheroni (Gumbel moment fit)


@query(
    "extreme_value_gumbel",
    oracle=f"""
    WITH daily AS (
        SELECT o_orderdate AS d,
               ROUND(SUM(o_totalprice) / 1e6, 6) AS x
        FROM orders GROUP BY 1
    ),
    blocks AS (
        SELECT date_trunc('month', CAST(d AS DATE)) AS mo,
               MAX(x) AS mx
        FROM daily GROUP BY 1
    ),
    fit AS (
        SELECT COUNT(*) AS n_blocks,
               AVG(mx) AS m,
               stddev_samp(mx) AS s
        FROM blocks
    ),
    params AS (
        SELECT n_blocks,
               s * SQRT(6) / PI() AS beta,
               AVG_M - {EVT_EULER} * (s * SQRT(6) / PI()) AS mu
        FROM (SELECT n_blocks, m AS AVG_M, s FROM fit)
    )
    SELECT CAST(n_blocks AS BIGINT) AS n_blocks,
           ROUND(mu, 6) AS gumbel_mu,
           ROUND(beta, 6) AS gumbel_beta,
           ROUND(mu - beta * LN(-LN(1 - 1.0 / 12)), 6)
               AS return_level_1y,
           ROUND(mu - beta * LN(-LN(1 - 1.0 / 60)), 6)
               AS return_level_5y,
           ROUND(mu - beta * LN(-LN(1 - 1.0 / 120)), 6)
               AS return_level_10y
    FROM params
    """,
)
def extreme_value_gumbel(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Extreme-value analysis of daily revenue: MONTHLY block maxima
    fit to a Gumbel distribution by the method of moments (beta =
    s*sqrt(6)/pi, mu = mean - gamma*beta — the closed-form EVT-I fit;
    Gumbel is the max-domain limit for light-tailed daily sums, and
    `hill_tail_index` is the screen that says when to upgrade to
    Frechet/GPD instead), then inverted into RETURN LEVELS: the
    daily-revenue (in $M) exceeded once a year / 5 years / 10 years
    in expectation — the capacity-planning number (size the
    settlement pipeline for the 10-year day, not the mean day).
    x_T = mu - beta*ln(-ln(1 - 1/T)) with T in months.

    Scale shape: corpus -> day grain -> month-grain maxima (both
    calendar-bounded at any SF) -> one 1-row moment fit; the whole
    EVT analysis is three map-side-combinable aggregates deep and
    never corpus-grain after the first. Moments over the ~84-row
    block table are engine-stable at the 6-dp pin."""
    orders = load_table(spark, sf_dir, "orders")
    daily = orders.groupBy(F.col("o_orderdate").alias("d")).agg(
        F.round(F.sum("o_totalprice") / 1e6, 6).alias("x")
    )
    blocks = daily.groupBy(
        F.date_trunc("month", F.to_date("d")).alias("mo")
    ).agg(F.max("x").alias("mx"))
    fit = blocks.agg(
        F.count("*").alias("n_blocks"),
        F.avg("mx").alias("m"),
        F.stddev_samp("mx").alias("s"),
    )
    import math

    beta = F.col("s") * math.sqrt(6) / math.pi
    mu = F.col("m") - EVT_EULER * beta

    def rl(months: int):
        return F.round(
            mu - beta * math.log(-math.log(1 - 1.0 / months)), 6
        )

    return fit.select(
        F.col("n_blocks").cast("bigint").alias("n_blocks"),
        F.round(mu, 6).alias("gumbel_mu"),
        F.round(beta, 6).alias("gumbel_beta"),
        rl(12).alias("return_level_1y"),
        rl(60).alias("return_level_5y"),
        rl(120).alias("return_level_10y"),
    )


CCF_MAX_LAG = 6  # hours each side for the lead-lag sweep
CCF_A, CCF_B = "view", "purchase"  # does A lead B?


@query(
    "ccf_leadlag",
    oracle=f"""
    WITH hourly AS (
        SELECT CAST(date_diff('hour', TIMESTAMP '1970-01-01',
                              ts) AS BIGINT) AS hr,
               COUNT(*) FILTER (WHERE event_type = '{CCF_A}') AS na,
               COUNT(*) FILTER (WHERE event_type = '{CCF_B}') AS nb
        FROM events GROUP BY 1
    ),
    lags AS (
        SELECT unnest(range(-{CCF_MAX_LAG}, {CCF_MAX_LAG} + 1))
            AS lag
    ),
    ccf AS (
        SELECT l.lag,
               ROUND(corr(a.na, b.nb), 6) AS ccf,
               COUNT(*) AS n_pairs
        FROM lags l
        JOIN hourly a ON TRUE
        JOIN hourly b ON b.hr = a.hr + l.lag
        GROUP BY 1
    ),
    peak AS (
        SELECT lag AS peak_lag FROM ccf
        WHERE ccf IS NOT NULL
        QUALIFY ROW_NUMBER() OVER (ORDER BY ABS(ccf) DESC, lag) = 1
    )
    SELECT c.lag AS lag_hours,
           CAST(c.n_pairs AS BIGINT) AS n_pairs,
           c.ccf,
           c.lag = p.peak_lag AS is_peak
    FROM ccf c CROSS JOIN peak p
    ORDER BY c.lag
    """,
)
def ccf_leadlag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-correlation function between the hourly '{a}' and
    '{b}' event streams, lags -6..+6 hours — the lead-lag question
    behind every funnel dashboard (does traffic LEAD conversions,
    and by how long?): ccf(k) = corr(a_t, b_(t+k)); a peak at
    POSITIVE k means {a} leads {b} by k hours (the planted test
    forces exactly that), at k = 0 they co-move, at negative k the
    'effect' precedes the 'cause' and the dashboard's causal story
    is wrong. Completes the dependence toolkit: `acf_panel` is a
    series vs itself, this is series vs series
    (`spearman_signal_correlation` is the contemporaneous-only
    special case, rank-robust).

    Scale shape: the corpus collapses to ONE hour-grain pass
    (conditional counts for both types — the slo_burn_alerts hour
    key); the 13-row lag grid calendar-joins that bounded series;
    Pearson per lag is a map-side-combinable corr aggregate; the
    peak flag is a 1-row argmax broadcast. Hours with no events at
    all drop out of the pairing (at stream density that is vacuum,
    not signal; a spine join zero-fills if needed).""".format(
        a=CCF_A, b=CCF_B
    )
    events = load_table(spark, sf_dir, "events")
    hourly = events.groupBy(
        (F.unix_timestamp("ts") / 3600).cast("long").alias("hr")
    ).agg(
        F.count(F.when(F.col("event_type") == CCF_A, 1)).alias("na"),
        F.count(F.when(F.col("event_type") == CCF_B, 1)).alias("nb"),
    )
    lags = spark.range(-CCF_MAX_LAG, CCF_MAX_LAG + 1).select(
        F.col("id").cast("long").alias("lag")
    )
    a = hourly.select(F.col("hr").alias("ha"), "na")
    b = hourly.select(F.col("hr").alias("hb"), "nb")
    # r12 (guide §2.4): `ccf` feeds BOTH the peak argmax and the
    # final projection; un-pinned, each reference re-ran the events
    # scan + hour-grain aggregate + calendar join. Pin the 13-row
    # lag table eagerly; the corpus appears once.
    ccf = (
        F.broadcast(lags)
        .crossJoin(a)
        .join(b, F.col("hb") == F.col("ha") + F.col("lag"))
        .groupBy("lag")
        .agg(
            F.round(F.corr("na", "nb"), 6).alias("ccf"),
            F.count("*").alias("n_pairs"),
        )
        .localCheckpoint()
    )
    peak = (
        ccf.filter(F.col("ccf").isNotNull())
        .agg(
            F.max(
                F.struct(
                    F.abs(F.col("ccf")).alias("a"),
                    (-F.col("lag")).alias("nl"),
                )
            ).alias("m")
        )
        .select((-F.col("m.nl")).alias("peak_lag"))
    )
    return (
        ccf.crossJoin(F.broadcast(peak))
        .select(
            F.col("lag").alias("lag_hours"),
            F.col("n_pairs").cast("bigint").alias("n_pairs"),
            "ccf",
            (F.col("lag") == F.col("peak_lag")).alias("is_peak"),
        )
        .orderBy("lag_hours")
    )


HURST_SIZES = (8, 16, 32, 64)  # dyadic R/S block ladder


@query(
    "hurst_exponent_rs",
    oracle=f"""
    WITH daily AS (
        SELECT o_orderdate AS d,
               ROUND(SUM(o_totalprice) / 1e6, 6) AS x
        FROM orders GROUP BY 1
    ),
    idx AS (
        SELECT x, ROW_NUMBER() OVER (ORDER BY d) - 1 AS i
        FROM daily
    ),
    sized AS (
        SELECT s.m, idx.i, idx.x, idx.i // s.m AS blk
        FROM (SELECT unnest([{", ".join(str(m) for m in HURST_SIZES)}])
              AS m) s
        JOIN idx ON TRUE
    ),
    winded AS (
        SELECT m, blk, i, x,
               AVG(x) OVER wb AS mu,
               stddev_pop(x) OVER wb AS sd,
               COUNT(*) OVER wb AS cnt
        FROM sized
        WINDOW wb AS (PARTITION BY m, blk)
    ),
    cumdev AS (
        SELECT m, blk, sd, cnt,
               SUM(x - mu) OVER (PARTITION BY m, blk ORDER BY i
                                 ROWS UNBOUNDED PRECEDING) AS c
        FROM winded
    ),
    blocks AS (
        SELECT m, blk,
               (MAX(c) - MIN(c)) / MAX(sd) AS rs
        FROM cumdev
        WHERE cnt = m AND sd > 0
        GROUP BY 1, 2
    ),
    per_size AS (
        SELECT m, COUNT(*) AS n_blocks,
               ROUND(AVG(rs), 6) AS mean_rs
        FROM blocks GROUP BY 1
    ),
    fit AS (
        SELECT ROUND(regr_slope(LN(mean_rs), LN(CAST(m AS DOUBLE))),
                     6) AS hurst
        FROM per_size
    )
    SELECT CAST(p.m AS BIGINT) AS block_size,
           CAST(p.n_blocks AS BIGINT) AS n_blocks,
           p.mean_rs,
           f.hurst,
           CASE WHEN f.hurst > 0.55 THEN 'persistent'
                WHEN f.hurst < 0.45 THEN 'anti-persistent'
                ELSE 'random-walk' END AS regime
    FROM per_size p CROSS JOIN fit f
    ORDER BY block_size
    """,
)
def hurst_exponent_rs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hurst exponent by rescaled-range (R/S) analysis of daily
    revenue (Hurst 1951; Mandelbrot's long-memory diagnostic): for
    each dyadic block size m, split the day-indexed series into
    m-day blocks, compute each block's rescaled range R/S (range of
    the cumulative mean-deviation over the block stddev), and fit
    log E[R/S] ~ H log m. H ~ 0.5 = short-memory noise (the
    Ljung-Box world), H > 0.5 = long-range persistence (shocks
    echo for months — forecast horizons and CUSUM thresholds must
    widen), H < 0.5 = mean-reverting. The missing LONG-memory
    screen between `acf_panel` (fixed small lags) and
    `ljung_box_test` (their sum).

    Scale shape: corpus -> day grain once; the 4-rung size ladder
    replicates the CALENDAR-bounded series (4x ~2,400 rows, never
    the corpus); everything else is windows PARTITIONED by (size,
    block) over that bounded frame, a block-grain aggregate, a
    4-row per-size table, and a 1-row regression broadcast.
    Incomplete tail blocks and zero-variance blocks are dropped on
    both engines before averaging."""
    orders = load_table(spark, sf_dir, "orders")
    daily = orders.groupBy(F.col("o_orderdate").alias("d")).agg(
        F.round(F.sum("o_totalprice") / 1e6, 6).alias("x")
    )
    idx = daily.select(
        "x", (F.row_number().over(Window.orderBy("d")) - 1).alias("i")
    )
    sizes = spark.range(1).select(
        F.explode(
            F.array(*[F.lit(m) for m in HURST_SIZES])
        ).alias("m")
    )
    sized = F.broadcast(sizes).crossJoin(idx).select(
        "m", "i", "x", (F.col("i") / F.col("m")).cast("long").alias("blk")
    )
    wb = Window.partitionBy("m", "blk")
    wc = (
        Window.partitionBy("m", "blk")
        .orderBy("i")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    winded = sized.select(
        "m",
        "blk",
        "i",
        "x",
        F.avg("x").over(wb).alias("mu"),
        F.stddev_pop("x").over(wb).alias("sd"),
        F.count("*").over(wb).alias("cnt"),
    )
    cumdev = winded.select(
        "m",
        "blk",
        "sd",
        "cnt",
        F.sum(F.col("x") - F.col("mu")).over(wc).alias("c"),
    )
    blocks = (
        cumdev.filter((F.col("cnt") == F.col("m")) & (F.col("sd") > 0))
        .groupBy("m", "blk")
        .agg(
            ((F.max("c") - F.min("c")) / F.max("sd")).alias("rs")
        )
    )
    # r12 (guide §2.4): the fit aggregate and the final projection
    # both read `per_size`; un-pinned, each re-ran the whole
    # window-ladder pipeline off the orders scan (2 scans in
    # hurst_exponent_rs_before.txt). Pin the 4-row per-size table
    # eagerly; the fit and output are arithmetic on it.
    per_size = (
        blocks.groupBy("m")
        .agg(
            F.count("*").alias("n_blocks"),
            F.round(F.avg("rs"), 6).alias("mean_rs"),
        )
        .localCheckpoint()
    )
    fit = per_size.agg(
        F.round(
            F.regr_slope(
                F.log(F.col("mean_rs")),
                F.log(F.col("m").cast("double")),
            ),
            6,
        ).alias("hurst")
    )
    return (
        per_size.crossJoin(F.broadcast(fit))
        .select(
            F.col("m").cast("bigint").alias("block_size"),
            F.col("n_blocks").cast("bigint").alias("n_blocks"),
            "mean_rs",
            "hurst",
            F.when(F.col("hurst") > 0.55, "persistent")
            .when(F.col("hurst") < 0.45, "anti-persistent")
            .otherwise("random-walk")
            .alias("regime"),
        )
        .orderBy("block_size")
    )


LR_Z_95 = 1.959964  # two-sided 95% normal quantile (Welch's constant)


def logrank_stats(subjects: DataFrame) -> DataFrame:
    """Library core of `logrank_test` (api.causal.logrank_stats):
    two-group log-rank statistic over any subjects frame with
    columns ``g`` (1/2), ``event`` (1 = observed, 0 = censored) and
    ``t_day`` (duration) — eagerly pins the subjects table (it
    feeds four consumers), builds the zero-filled (group, day) risk
    grid with exclusive prefix windows, and folds to one row."""
    subjects = subjects.localCheckpoint()
    ng = subjects.groupBy("g").agg(F.count("*").alias("n0"))
    leavers = subjects.groupBy("g", "t_day").agg(
        F.count("*").alias("cnt"), F.sum("event").alias("d")
    )
    spine = F.broadcast(ng).crossJoin(
        subjects.select("t_day").distinct()
    )
    w_ex = (
        Window.partitionBy("g")
        .orderBy("t_day")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    risk = (
        spine.join(leavers, ["g", "t_day"], "left")
        .select(
            "g",
            "t_day",
            F.coalesce(F.col("d"), F.lit(0)).alias("d"),
            (
                F.col("n0")
                - F.coalesce(
                    F.sum(F.coalesce(F.col("cnt"), F.lit(0))).over(
                        w_ex
                    ),
                    F.lit(0),
                )
            ).alias("n_risk"),
        )
    )
    cells = risk.groupBy("t_day").agg(
        F.sum(F.when(F.col("g") == 1, F.col("d")).otherwise(0)).alias(
            "d1"
        ),
        F.sum("d").alias("d"),
        F.sum(
            F.when(F.col("g") == 1, F.col("n_risk")).otherwise(0)
        ).alias("n1"),
        F.sum("n_risk").alias("n"),
    )
    terms = cells.filter((F.col("d") > 0) & (F.col("n") > 0)).agg(
        F.sum(
            F.col("d1") - F.col("d") * F.col("n1") * 1.0 / F.col("n")
        ).alias("u"),
        F.sum(
            F.when(
                F.col("n") > 1,
                F.col("d")
                * (F.col("n1") * 1.0 / F.col("n"))
                * (1 - F.col("n1") * 1.0 / F.col("n"))
                * (F.col("n") - F.col("d"))
                * 1.0
                / (F.col("n") - 1),
            ).otherwise(0.0)
        ).alias("v"),
    )
    totals = subjects.agg(
        F.sum(F.when(F.col("g") == 1, 1).otherwise(0)).alias("n1"),
        F.sum(F.when(F.col("g") == 2, 1).otherwise(0)).alias("n2"),
        F.sum(
            F.when(F.col("g") == 1, F.col("event")).otherwise(0)
        ).alias("e1"),
        F.sum(
            F.when(F.col("g") == 2, F.col("event")).otherwise(0)
        ).alias("e2"),
    )
    z = F.when(
        F.col("v") > 0, F.col("u") / F.sqrt(F.col("v"))
    ).otherwise(0.0)
    return terms.crossJoin(F.broadcast(totals)).select(
        F.col("n1").cast("bigint").alias("n_early"),
        F.col("n2").cast("bigint").alias("n_late"),
        F.col("e1").cast("bigint").alias("events_early"),
        F.col("e2").cast("bigint").alias("events_late"),
        F.round("u", 6).alias("o_minus_e"),
        F.round("v", 6).alias("variance"),
        F.round(z, 6).alias("z"),
        F.when(F.col("v") > 0, F.abs(z) > LR_Z_95)
        .otherwise(F.lit(False))
        .alias("significant"),
    )


@query(
    "logrank_test",
    oracle=f"""
    WITH anchor AS (
        SELECT MIN(ts) AS mn, MAX(ts) AS mx FROM events
    ),
    first_signup AS (
        SELECT user_id, MIN(ts) AS t0 FROM events
        WHERE event_type = 'signup' GROUP BY user_id
    ),
    first_purchase AS (
        SELECT e.user_id, MIN(e.ts) AS tp
        FROM events e JOIN first_signup s ON e.user_id = s.user_id
        WHERE e.event_type = 'purchase' AND e.ts > s.t0
        GROUP BY e.user_id
    ),
    subjects AS (
        SELECT s.user_id,
               CASE WHEN epoch_us(s.t0) * 2
                         <= epoch_us(a.mn) + epoch_us(a.mx)
                    THEN 1 ELSE 2 END AS g,
               CASE WHEN p.tp IS NOT NULL THEN 1 ELSE 0 END AS event,
               CAST(FLOOR((epoch_us(COALESCE(p.tp, a.mx))
                    - epoch_us(s.t0)) / 86400000000.0) AS BIGINT)
                   AS t_day
        FROM first_signup s
        LEFT JOIN first_purchase p ON p.user_id = s.user_id
        CROSS JOIN anchor a
    ),
    ng AS (SELECT g, COUNT(*) AS n0 FROM subjects GROUP BY 1),
    leavers AS (
        SELECT g, t_day, COUNT(*) AS cnt, SUM(event) AS d
        FROM subjects GROUP BY 1, 2
    ),
    spine AS (
        SELECT ng.g, ng.n0, days.t_day
        FROM ng CROSS JOIN (SELECT DISTINCT t_day FROM subjects) days
    ),
    risk AS (
        SELECT s.g, s.t_day,
               COALESCE(l.d, 0) AS d,
               s.n0 - COALESCE(SUM(COALESCE(l.cnt, 0)) OVER (
                   PARTITION BY s.g ORDER BY s.t_day
                   ROWS BETWEEN UNBOUNDED PRECEDING
                            AND 1 PRECEDING), 0) AS n_risk
        FROM spine s
        LEFT JOIN leavers l ON l.g = s.g AND l.t_day = s.t_day
    ),
    cells AS (
        SELECT t_day,
               SUM(CASE WHEN g = 1 THEN d ELSE 0 END) AS d1,
               SUM(d) AS d,
               SUM(CASE WHEN g = 1 THEN n_risk ELSE 0 END) AS n1,
               SUM(n_risk) AS n
        FROM risk GROUP BY 1
    ),
    terms AS (
        SELECT SUM(d1 - d * n1 * 1.0 / n) AS u,
               SUM(CASE WHEN n > 1
                   THEN d * (n1 * 1.0 / n) * (1 - n1 * 1.0 / n)
                        * (n - d) * 1.0 / (n - 1)
                   ELSE 0 END) AS v
        FROM cells WHERE d > 0 AND n > 0
    ),
    totals AS (
        SELECT SUM(CASE WHEN g = 1 THEN 1 ELSE 0 END) AS n1,
               SUM(CASE WHEN g = 2 THEN 1 ELSE 0 END) AS n2,
               SUM(CASE WHEN g = 1 THEN event ELSE 0 END) AS e1,
               SUM(CASE WHEN g = 2 THEN event ELSE 0 END) AS e2
        FROM subjects
    )
    SELECT CAST(t.n1 AS BIGINT) AS n_early,
           CAST(t.n2 AS BIGINT) AS n_late,
           CAST(t.e1 AS BIGINT) AS events_early,
           CAST(t.e2 AS BIGINT) AS events_late,
           ROUND(x.u, 6) AS o_minus_e,
           ROUND(x.v, 6) AS variance,
           ROUND(CASE WHEN x.v > 0 THEN x.u / SQRT(x.v)
                      ELSE 0 END, 6) AS z,
           CASE WHEN x.v > 0
                THEN ABS(x.u / SQRT(x.v)) > {LR_Z_95}
                ELSE FALSE END AS significant
    FROM terms x CROSS JOIN totals t
    """,
)
def logrank_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Log-rank test between two signup cohorts' time-to-first-
    purchase — the hypothesis test ON TOP of `survival_km_curve`
    (the curve describes, this decides): early signups (first half
    of the observation window) vs late, with never-purchasers
    right-censored at the horizon exactly as the KM curve censors
    them. At each event day, observed group-1 events are compared
    with the expectation under the pooled-hazard null (E = d*n1/n),
    the hypergeometric variance accumulates, and Z = sum(O-E)/sqrt(
    sum V) is standard normal under H0 (Mantel 1966) — read against
    the same 1.959964 constant as the Welch family (no erf on
    either engine).

    Scale shape: the corpus collapses to ONE subjects row per user
    (two user-keyed aggregates + a 1-row window anchor); the risk
    table lives at (group, day) grain with zero-filled cells from a
    2 x day-spine cross join and EXCLUSIVE prefix windows for
    at-risk counts; everything folds to one row. The 2-group form
    generalizes to k groups as a (k x day) grid, same plan."""
    ev = load_table(spark, sf_dir, "events")
    anchor = ev.agg(
        F.min("ts").alias("mn"), F.max("ts").alias("mx")
    )
    s0 = (
        ev.filter(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t0"))
    )
    fp = (
        ev.join(s0, "user_id")
        .filter(
            (F.col("event_type") == "purchase")
            & (F.col("ts") > F.col("t0"))
        )
        .groupBy("user_id")
        .agg(F.min("ts").alias("tp"))
    )
    subjects = (
        s0.join(fp, "user_id", "left")
        .crossJoin(F.broadcast(anchor))
        .select(
            "user_id",
            F.when(
                F.unix_micros("t0") * 2
                <= F.unix_micros("mn") + F.unix_micros("mx"),
                1,
            )
            .otherwise(2)
            .alias("g"),
            F.when(F.col("tp").isNotNull(), 1).otherwise(0).alias(
                "event"
            ),
            F.floor(
                (
                    F.unix_micros(F.coalesce("tp", "mx"))
                    - F.unix_micros("t0")
                )
                / 86400000000.0
            )
            .cast("bigint")
            .alias("t_day"),
        )
    )
    return logrank_stats(subjects)


GMM_ITERS = 2  # unrolled EM rounds (loop-carried, fs_em discipline)
GMM_VAR_FLOOR = 1e-6  # variance floor (degenerate-component guard)


def _gmm_round_sql(t: int) -> str:
    """One unrolled 1-d 2-component EM round as DuckDB CTEs:
    E-step responsibilities from the previous round's 6-dp-pinned
    parameters, M-step moment updates re-pinned at 6 dp."""
    p = f"params{t - 1}"
    dens1 = (
        f"EXP(-(d.x - p.mu1) * (d.x - p.mu1) / (2 * p.s1))"
        f" / SQRT(2 * PI() * p.s1)"
    )
    dens2 = (
        f"EXP(-(d.x - p.mu2) * (d.x - p.mu2) / (2 * p.s2))"
        f" / SQRT(2 * PI() * p.s2)"
    )
    return f"""
    r{t} AS (
        SELECT d.x,
               p.p1 * {dens1}
                   / GREATEST(p.p1 * {dens1}
                              + (1 - p.p1) * {dens2}, 1e-300)
                   AS g1
        FROM daily d CROSS JOIN {p} p
    ),
    params{t} AS (
        SELECT ROUND(AVG(g1), 6) AS p1,
               ROUND(SUM(g1 * x) / GREATEST(SUM(g1), 1e-12), 6)
                   AS mu1,
               GREATEST(ROUND(
                   SUM(g1 * x * x) / GREATEST(SUM(g1), 1e-12)
                   - (SUM(g1 * x) / GREATEST(SUM(g1), 1e-12))
                     * (SUM(g1 * x) / GREATEST(SUM(g1), 1e-12)),
                   6), {GMM_VAR_FLOOR}) AS s1,
               ROUND(SUM((1 - g1) * x)
                     / GREATEST(SUM(1 - g1), 1e-12), 6) AS mu2,
               GREATEST(ROUND(
                   SUM((1 - g1) * x * x)
                       / GREATEST(SUM(1 - g1), 1e-12)
                   - (SUM((1 - g1) * x) / GREATEST(SUM(1 - g1),
                       1e-12))
                     * (SUM((1 - g1) * x) / GREATEST(SUM(1 - g1),
                       1e-12)),
                   6), {GMM_VAR_FLOOR}) AS s2
        FROM r{t}
    )"""


@query(
    "gaussian_mixture_em",
    oracle=f"""
    WITH daily AS (
        SELECT ROUND(SUM(o_totalprice) / 1e6, 6) AS x
        FROM orders GROUP BY o_orderdate
    ),
    init AS (
        SELECT ROUND(quantile_cont(x, 0.25), 6) AS mu1,
               ROUND(quantile_cont(x, 0.75), 6) AS mu2,
               GREATEST(ROUND(var_pop(x) / 2, 6), {GMM_VAR_FLOOR})
                   AS s0,
               COUNT(*) AS n
        FROM daily
    ),
    params0 AS (
        SELECT 0.5 AS p1, mu1, s0 AS s1, mu2, s0 AS s2 FROM init
    ),
    {",".join(_gmm_round_sql(t) for t in range(1, GMM_ITERS + 1))},
    final AS (SELECT * FROM params{GMM_ITERS}),
    loglik AS (
        SELECT ROUND(AVG(LN(GREATEST(
                   p.p1 * EXP(-(d.x - p.mu1) * (d.x - p.mu1)
                              / (2 * p.s1)) / SQRT(2 * PI() * p.s1)
                   + (1 - p.p1) * EXP(-(d.x - p.mu2) * (d.x - p.mu2)
                              / (2 * p.s2)) / SQRT(2 * PI() * p.s2),
                   1e-300))), 6) AS avg_ll
        FROM daily d CROSS JOIN final p
    )
    SELECT c.component,
           ROUND(CASE WHEN c.component = 1 THEN f.p1
                      ELSE 1 - f.p1 END, 6) AS weight,
           CASE WHEN c.component = 1 THEN f.mu1 ELSE f.mu2 END
               AS mu,
           ROUND(SQRT(CASE WHEN c.component = 1 THEN f.s1
                           ELSE f.s2 END), 6) AS sigma,
           l.avg_ll AS avg_loglik,
           CAST(i.n AS BIGINT) AS n_days
    FROM (SELECT unnest([1, 2]) AS component) c
    CROSS JOIN final f CROSS JOIN loglik l CROSS JOIN init i
    ORDER BY component
    """,
)
def gaussian_mixture_em(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Two-component 1-d Gaussian mixture on the daily revenue
    series, fit by 2 unrolled EM rounds — the CONTINUOUS-mixture
    companion of `fellegi_sunter_em` (binary patterns there, real
    line here) and the model behind every 'is this series bimodal?'
    question (`lm_perplexity_buckets` thresholds assume one regime;
    a weekday/holiday revenue mix is two): deterministic quartile
    init, E-step responsibilities, moment M-step, with every
    parameter 6-dp-pinned per round so both engines replay the
    iteration bit-for-bit (the fs_em discipline), variances floored
    against degenerate collapse, and the final average log-
    likelihood reported for model comparison against a single
    Gaussian.

    Scale shape: the corpus collapses to the day-grain series
    first; each EM round is ONE aggregate over that calendar-
    bounded frame with the previous round's parameters riding a
    1-row cross join — O(model)-per-round like the Lloyd/logreg
    loops, never corpus-grain."""
    import math

    import numpy as np

    from ..functions.rounding import spark_round
    from ..sources.tables import literal_frame

    orders = load_table(spark, sf_dir, "orders")
    daily = orders.groupBy("o_orderdate").agg(
        F.round(F.sum("o_totalprice") / 1e6, 6).alias("x")
    ).select("x")
    # r13 (guide §1.2): the day-grain series is CALENDAR-BOUNDED
    # (O(days) at any corpus size — ~3.7k rows for a decade), so the
    # EM rounds run driver-side over the collected series instead of
    # re-embedding the day aggregate once per round in a lazy plan
    # (the r12 unrolled form planned the hash(day) exchange 5x and
    # scheduled a serial AQE job chain; 8-core ratio 0.78 showed the
    # cost was job rounds, not data). One corpus-pass job collects
    # the bounded series; every parameter stays 6-dp-pinned per round
    # via spark_round (the bit-faithful F.round twin), so the
    # iteration replays exactly the values the in-plane form
    # computed; the output is a 2-row local relation.
    xs = np.array(
        [r["x"] for r in daily.collect()], dtype=np.float64
    )  # O(days), never corpus-grain
    n = len(xs)
    srt = np.sort(xs)

    def _pctl(p: float) -> float:
        # F.percentile's exact interpolation form
        rank = p * (n - 1)
        lo, hi = int(math.floor(rank)), int(math.ceil(rank))
        if lo == hi:
            return float(srt[lo])
        return float(srt[lo] * (hi - rank) + srt[hi] * (rank - lo))

    mu1 = spark_round(_pctl(0.25))
    mu2 = spark_round(_pctl(0.75))
    s0 = max(spark_round(float(np.var(xs)) / 2), GMM_VAR_FLOOR)
    p1, s1, s2 = 0.5, s0, s0

    def dens(mu, s):
        return np.exp(-(xs - mu) * (xs - mu) / (2 * s)) / math.sqrt(
            2 * math.pi * s
        )

    for _ in range(GMM_ITERS):
        d1 = dens(mu1, s1)
        d2 = dens(mu2, s2)
        g1 = p1 * d1 / np.maximum(p1 * d1 + (1 - p1) * d2, 1e-300)
        g2 = 1.0 - g1
        sg1 = max(float(np.sum(g1)), 1e-12)
        sg2 = max(float(np.sum(g2)), 1e-12)
        mu1_new = float(np.sum(g1 * xs)) / sg1
        mu2_new = float(np.sum(g2 * xs)) / sg2
        p1 = spark_round(float(np.mean(g1)))
        s1 = max(
            spark_round(
                float(np.sum(g1 * xs * xs)) / sg1 - mu1_new * mu1_new
            ),
            GMM_VAR_FLOOR,
        )
        s2 = max(
            spark_round(
                float(np.sum(g2 * xs * xs)) / sg2 - mu2_new * mu2_new
            ),
            GMM_VAR_FLOOR,
        )
        mu1, mu2 = spark_round(mu1_new), spark_round(mu2_new)
    d1 = dens(mu1, s1)
    d2 = dens(mu2, s2)
    avg_ll = spark_round(
        float(
            np.mean(
                np.log(np.maximum(p1 * d1 + (1 - p1) * d2, 1e-300))
            )
        )
    )
    return literal_frame(
        spark,
        "component int, weight double, mu double, sigma double,"
        " avg_loglik double, n_days bigint",
        [
            (
                1,
                spark_round(p1),
                mu1,
                spark_round(math.sqrt(s1)),
                avg_ll,
                n,
            ),
            (
                2,
                spark_round(1 - p1),
                mu2,
                spark_round(math.sqrt(s2)),
                avg_ll,
                n,
            ),
        ],
    ).orderBy("component")


@query(
    "mann_kendall_trend",
    oracle=f"""
    WITH weekly AS (
        SELECT CAST(date_diff('day', DATE '1970-01-01',
                              CAST(o_orderdate AS DATE)) // 7
               AS BIGINT) AS wk,
               ROUND(SUM(o_totalprice) / 1e6, 6) AS x
        FROM orders GROUP BY 1
    ),
    pairs AS (
        SELECT CASE WHEN b.x > a.x THEN 1
                    WHEN b.x < a.x THEN -1 ELSE 0 END AS sgn
        FROM weekly a JOIN weekly b ON a.wk < b.wk
    ),
    ties AS (
        SELECT COUNT(*) AS t FROM weekly GROUP BY x HAVING COUNT(*) > 1
    ),
    stat AS (
        SELECT (SELECT SUM(sgn) FROM pairs) AS s,
               (SELECT COUNT(*) FROM weekly) AS n,
               COALESCE((SELECT SUM(t * (t - 1) * (2 * t + 5))
                         FROM ties), 0) AS tie_term
    )
    SELECT CAST(n AS BIGINT) AS n_weeks,
           CAST(s AS BIGINT) AS s_stat,
           ROUND((n * (n - 1.0) * (2 * n + 5) - tie_term) / 18, 6)
               AS var_s,
           ROUND(CASE
               WHEN s > 0 THEN (s - 1)
                   / SQRT((n * (n - 1.0) * (2 * n + 5) - tie_term)
                          / 18)
               WHEN s < 0 THEN (s + 1)
                   / SQRT((n * (n - 1.0) * (2 * n + 5) - tie_term)
                          / 18)
               ELSE 0 END, 6) AS z,
           CASE
               WHEN s > 0 THEN ABS((s - 1)
                   / SQRT((n * (n - 1.0) * (2 * n + 5) - tie_term)
                          / 18)) > {LR_Z_95}
               WHEN s < 0 THEN ABS((s + 1)
                   / SQRT((n * (n - 1.0) * (2 * n + 5) - tie_term)
                          / 18)) > {LR_Z_95}
               ELSE FALSE END AS significant,
           CASE WHEN s > 0 THEN 'increasing'
                WHEN s < 0 THEN 'decreasing'
                ELSE 'no-trend' END AS direction
    FROM stat
    """,
)
def mann_kendall_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mann-Kendall monotonic-trend test on the weekly revenue
    series — the NON-PARAMETRIC decision beside `theilsen_trend`'s
    robust slope (Theil-Sen says how steep, Mann-Kendall says
    whether a monotonic trend exists at all, immune to outliers and
    any monotone transform of the data): S = sum of pairwise signs,
    variance with the standard tie correction, continuity-corrected
    Z against the no-erf 1.959964 constant. The standard pairing
    with Theil-Sen in every hydrology/quality-monitoring handbook.

    Scale shape: `theilsen_trend`'s CALENDAR-squared pair set (344
    weeks -> 59k sign pairs at any corpus size; the corpus appears
    only in the week-grain aggregate), tie census at value grain,
    one scalar fold. Decade-long daily panels partition by metric
    id and cap the pair span, same as the Theil-Sen note."""
    orders = load_table(spark, sf_dir, "orders")
    weekly = orders.groupBy(
        (F.unix_date(F.to_date("o_orderdate")) / 7)
        .cast("long")
        .alias("wk")
    ).agg(F.round(F.sum("o_totalprice") / 1e6, 6).alias("x"))
    a = weekly.select(F.col("wk").alias("wa"), F.col("x").alias("xa"))
    b = weekly.select(F.col("wk").alias("wb"), F.col("x").alias("xb"))
    pairs = a.join(b, F.col("wa") < F.col("wb")).select(
        F.when(F.col("xb") > F.col("xa"), 1)
        .when(F.col("xb") < F.col("xa"), -1)
        .otherwise(0)
        .alias("sgn")
    )
    s_n = pairs.agg(F.sum("sgn").alias("s")).crossJoin(
        F.broadcast(weekly.agg(F.count("*").alias("n")))
    )
    ties = (
        weekly.groupBy("x")
        .agg(F.count("*").alias("t"))
        .filter(F.col("t") > 1)
        .agg(
            F.coalesce(
                F.sum(
                    F.col("t")
                    * (F.col("t") - 1)
                    * (2 * F.col("t") + 5)
                ),
                F.lit(0),
            ).alias("tie_term")
        )
    )
    stat = s_n.crossJoin(F.broadcast(ties))
    var_s = (
        F.col("n") * (F.col("n") - 1.0) * (2 * F.col("n") + 5)
        - F.col("tie_term")
    ) / 18
    z = (
        F.when(F.col("s") > 0, (F.col("s") - 1) / F.sqrt(var_s))
        .when(F.col("s") < 0, (F.col("s") + 1) / F.sqrt(var_s))
        .otherwise(0.0)
    )
    return stat.select(
        F.col("n").cast("bigint").alias("n_weeks"),
        F.col("s").cast("bigint").alias("s_stat"),
        F.round(var_s, 6).alias("var_s"),
        F.round(z, 6).alias("z"),
        F.when(F.col("s") != 0, F.abs(z) > LR_Z_95)
        .otherwise(F.lit(False))
        .alias("significant"),
        F.when(F.col("s") > 0, "increasing")
        .when(F.col("s") < 0, "decreasing")
        .otherwise("no-trend")
        .alias("direction"),
    )


SPC_A2_N7 = 0.419  # Shewhart XbarR constants for subgroup size 7
SPC_D3_N7 = 0.076
SPC_D4_N7 = 1.924


@query(
    "spc_xbar_chart",
    oracle=f"""
    WITH daily AS (
        SELECT CAST(date_diff('day', DATE '1970-01-01',
                              CAST(o_orderdate AS DATE)) // 7
               AS BIGINT) AS wk,
               o_orderdate AS d,
               ROUND(SUM(o_totalprice) / 1e6, 6) AS x
        FROM orders GROUP BY 1, 2
    ),
    subgroups AS (
        SELECT wk,
               AVG(x) AS xbar,
               MAX(x) - MIN(x) AS r,
               COUNT(*) AS n
        FROM daily GROUP BY 1
        HAVING COUNT(*) = 7
    ),
    limits AS (
        SELECT AVG(xbar) AS cl, AVG(r) AS rbar FROM subgroups
    )
    SELECT s.wk,
           ROUND(s.xbar, 6) AS xbar,
           ROUND(s.r, 6) AS r,
           ROUND(l.cl, 6) AS center,
           ROUND(l.cl + {SPC_A2_N7} * l.rbar, 6) AS ucl,
           ROUND(l.cl - {SPC_A2_N7} * l.rbar, 6) AS lcl,
           s.xbar > l.cl + {SPC_A2_N7} * l.rbar
               OR s.xbar < l.cl - {SPC_A2_N7} * l.rbar
               AS xbar_violation,
           s.r > {SPC_D4_N7} * l.rbar
               OR s.r < {SPC_D3_N7} * l.rbar AS range_violation
    FROM subgroups s CROSS JOIN limits l
    ORDER BY s.wk
    """,
)
def spc_xbar_chart(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shewhart Xbar-R control chart over weekly subgroups of daily
    revenue — the ORIGINAL process-control chart beside the engine's
    sequential detectors (`cusum_drift_chart` accumulates small
    shifts, `ewma_anomaly` smooths, Shewhart catches LARGE isolated
    shifts fastest; SPC practice runs them together): each complete
    7-day week is a rational subgroup, the Xbar chart flags weekly
    means outside center +- A2*Rbar and the R chart flags
    within-week dispersion outside [D3, D4]*Rbar (n = 7 constants
    from the standard SPC tables; partial tail weeks are excluded
    as unbalanced subgroups, the textbook rule).

    Scale shape: corpus -> (week, day) grain -> week-grain
    subgroup stats, with the 1-row control-limit broadcast back —
    everything after the first aggregate is calendar-bounded.
    Multi-line deployments partition by line/metric id."""
    orders = load_table(spark, sf_dir, "orders")
    daily = orders.groupBy(
        (F.unix_date(F.to_date("o_orderdate")) / 7)
        .cast("long")
        .alias("wk"),
        F.col("o_orderdate").alias("d"),
    ).agg(F.round(F.sum("o_totalprice") / 1e6, 6).alias("x"))
    subgroups = (
        daily.groupBy("wk")
        .agg(
            F.avg("x").alias("xbar"),
            (F.max("x") - F.min("x")).alias("r"),
            F.count("*").alias("n"),
        )
        .filter(F.col("n") == 7)
    )
    limits = subgroups.agg(
        F.avg("xbar").alias("cl"), F.avg("r").alias("rbar")
    )
    ucl = F.col("cl") + SPC_A2_N7 * F.col("rbar")
    lcl = F.col("cl") - SPC_A2_N7 * F.col("rbar")
    return (
        subgroups.crossJoin(F.broadcast(limits))
        .select(
            "wk",
            F.round("xbar", 6).alias("xbar"),
            F.round("r", 6).alias("r"),
            F.round("cl", 6).alias("center"),
            F.round(ucl, 6).alias("ucl"),
            F.round(lcl, 6).alias("lcl"),
            ((F.col("xbar") > ucl) | (F.col("xbar") < lcl)).alias(
                "xbar_violation"
            ),
            (
                (F.col("r") > SPC_D4_N7 * F.col("rbar"))
                | (F.col("r") < SPC_D3_N7 * F.col("rbar"))
            ).alias("range_violation"),
        )
        .orderBy("wk")
    )


SES_ALPHA = 0.3  # smoothing constant
SES_KERNEL = 40  # truncated kernel length ((1-a)^40 ~ 6e-7 residual)


@query(
    "ses_forecast_eval",
    oracle=f"""
    WITH daily AS (
        SELECT o_orderdate AS d,
               ROUND(SUM(o_totalprice) / 1e6, 6) AS x
        FROM orders GROUP BY 1
    ),
    idx AS (
        SELECT x, ROW_NUMBER() OVER (ORDER BY d) AS i FROM daily
    ),
    kernel AS (
        SELECT unnest(range(1, {SES_KERNEL} + 1)) AS j
    ),
    fc AS (
        SELECT t.i,
               t.x AS y,
               SUM({SES_ALPHA} * POWER(1 - {SES_ALPHA}, k.j - 1)
                   * h.x)
                   / (1 - POWER(1 - {SES_ALPHA}, {SES_KERNEL}))
                   AS f_ses,
               MAX(CASE WHEN k.j = 1 THEN h.x END) AS f_naive
        FROM idx t
        JOIN kernel k ON TRUE
        JOIN idx h ON h.i = t.i - k.j
        WHERE t.i > {SES_KERNEL}
        GROUP BY t.i, t.x
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_eval,
           CAST({SES_ALPHA} AS DOUBLE) AS alpha,
           ROUND(AVG(ABS(y - f_ses)), 6) AS mae_ses,
           ROUND(AVG(ABS(y - f_naive)), 6) AS mae_naive,
           ROUND(AVG(ABS(y - f_ses))
                 / GREATEST(AVG(ABS(y - f_naive)), 1e-12), 6)
               AS rel_mae,
           AVG(ABS(y - f_ses))
               < AVG(ABS(y - f_naive)) AS ses_beats_naive
    FROM fc
    """,
)
def ses_forecast_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-step-ahead simple-exponential-smoothing backtest on daily
    revenue — the first MODEL beside `forecast_backtest_mase`'s
    naive anchors: F_t = alpha * sum_j (1-alpha)^(j-1) y_(t-j),
    computed EXACTLY as a truncated 40-tap kernel (residual weight
    6e-7, renormalized) instead of the loop-carried recursion — the
    declarative form both engines replay bit-for-bit, and the same
    trick production panels use to backfill SES without a
    sequential scan. rel_mae < 1 says smoothing beats persistence
    on this series (noisy series: yes; trending/weekly series: the
    Holt/seasonal upgrades, same kernel shape with more taps).

    Scale shape: corpus -> day grain once; the 40-row kernel grid
    joins the day-index series on index arithmetic (the acf_panel
    lag-join shape, 40 wide), one fold to a single row. Per-metric
    panels partition the index by metric id."""
    orders = load_table(spark, sf_dir, "orders")
    daily = orders.groupBy(F.col("o_orderdate").alias("d")).agg(
        F.round(F.sum("o_totalprice") / 1e6, 6).alias("x")
    )
    idx = daily.select(
        "x", F.row_number().over(Window.orderBy("d")).alias("i")
    )
    kernel = spark.range(1, SES_KERNEL + 1).select(
        F.col("id").cast("long").alias("j")
    )
    t = idx.select(F.col("i").alias("ti"), F.col("x").alias("y"))
    h = idx.select(F.col("i").alias("hi"), F.col("x").alias("hx"))
    w = (
        SES_ALPHA
        * F.pow(F.lit(1 - SES_ALPHA), F.col("j") - 1)
        / (1 - (1 - SES_ALPHA) ** SES_KERNEL)
    )
    fc = (
        t.filter(F.col("ti") > SES_KERNEL)
        .crossJoin(F.broadcast(kernel))
        .join(h, F.col("hi") == F.col("ti") - F.col("j"))
        .groupBy("ti", "y")
        .agg(
            F.sum(w * F.col("hx")).alias("f_ses"),
            F.max(
                F.when(F.col("j") == 1, F.col("hx"))
            ).alias("f_naive"),
        )
    )
    mae_ses = F.avg(F.abs(F.col("y") - F.col("f_ses")))
    mae_naive = F.avg(F.abs(F.col("y") - F.col("f_naive")))
    return fc.agg(
        F.count("*").cast("bigint").alias("n_eval"),
        F.lit(float(SES_ALPHA)).alias("alpha"),
        F.round(mae_ses, 6).alias("mae_ses"),
        F.round(mae_naive, 6).alias("mae_naive"),
        F.round(
            mae_ses / F.greatest(mae_naive, F.lit(1e-12)), 6
        ).alias("rel_mae"),
        (mae_ses < mae_naive).alias("ses_beats_naive"),
    )


PINBALL_SPLIT = "1996-07-01"  # train/test boundary
PINBALL_QS = (0.1, 0.5, 0.9)


@query(
    "quantile_pinball_backtest",
    oracle=f"""
    WITH daily AS (
        SELECT o_orderdate AS d,
               ROUND(SUM(o_totalprice) / 1e6, 6) AS x
        FROM orders GROUP BY 1
    ),
    train AS (
        SELECT {", ".join(
            f"ROUND(quantile_cont(x, {q}), 6) AS q{int(q * 100)}"
            for q in PINBALL_QS
        )},
               COUNT(*) AS n_train
        FROM daily WHERE d < TIMESTAMP '{PINBALL_SPLIT}'
    ),
    test AS (
        SELECT x FROM daily WHERE d >= TIMESTAMP '{PINBALL_SPLIT}'
    ),
    lv AS (
        SELECT {" UNION ALL SELECT ".join(
            f"{q} AS tau, q{int(q * 100)} AS pred FROM train"
            for q in PINBALL_QS
        )}
    )
    SELECT l.tau,
           l.pred AS predicted_quantile,
           CAST(COUNT(*) AS BIGINT) AS n_test,
           ROUND(AVG(CASE WHEN t.x >= l.pred
                     THEN l.tau * (t.x - l.pred)
                     ELSE (1 - l.tau) * (l.pred - t.x) END), 6)
               AS pinball_loss,
           ROUND(AVG(CASE WHEN t.x <= l.pred THEN 1.0 ELSE 0.0 END),
                 6) AS empirical_coverage,
           ABS(AVG(CASE WHEN t.x <= l.pred THEN 1.0 ELSE 0.0 END)
               - l.tau) <= 0.1 AS calibrated
    FROM lv l CROSS JOIN test t
    GROUP BY l.tau, l.pred
    ORDER BY l.tau
    """,
)
def quantile_pinball_backtest(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Quantile-forecast backtest with pinball (quantile) loss — the
    proper scoring rule for interval forecasts (`conformal_coverage_
    audit` checks coverage of a conformal band; this scores POINT
    quantile predictions and checks calibration in one table): the
    train half's 10/50/90% revenue quantiles stand as constant
    quantile forecasts for the test half, each scored by pinball
    loss (the loss quantile regression minimizes — any sharper
    model must beat THIS row to justify itself) and by empirical
    coverage vs the nominal tau.

    Scale shape: corpus -> day grain; one train-half percentile row
    broadcast against the test half (3-row level ladder x
    calendar-bounded days), one fold per level. The classic
    train/test date split keeps the eval honest (no leakage; the
    same split temporal_split_audit polices for ML sets)."""
    orders = load_table(spark, sf_dir, "orders")
    daily = orders.groupBy(F.col("o_orderdate").alias("d")).agg(
        F.round(F.sum("o_totalprice") / 1e6, 6).alias("x")
    )
    train = daily.filter(F.col("d") < F.lit(PINBALL_SPLIT)).agg(
        *[
            F.round(F.percentile("x", F.lit(q)), 6).alias(
                f"q{int(q * 100)}"
            )
            for q in PINBALL_QS
        ]
    )
    lv = train.select(
        F.stack(
            F.lit(len(PINBALL_QS)),
            *[
                arg
                for q in PINBALL_QS
                for arg in (F.lit(q), F.col(f"q{int(q * 100)}"))
            ],
        ).alias("tau", "pred")
    )
    test = daily.filter(F.col("d") >= F.lit(PINBALL_SPLIT)).select(
        "x"
    )
    x, tau, pred = F.col("x"), F.col("tau"), F.col("pred")
    loss = F.when(
        x >= pred, tau * (x - pred)
    ).otherwise((1 - tau) * (pred - x))
    cov = F.avg(F.when(x <= pred, 1.0).otherwise(0.0))
    return (
        F.broadcast(lv)
        .crossJoin(test)
        .groupBy("tau", "pred")
        .agg(
            F.count("*").cast("bigint").alias("n_test"),
            F.round(F.avg(loss), 6).alias("pinball_loss"),
            F.round(cov, 6).alias("empirical_coverage"),
            (F.abs(cov - tau) <= 0.1).alias("calibrated"),
        )
        .select(
            "tau",
            F.col("pred").alias("predicted_quantile"),
            "n_test",
            "pinball_loss",
            "empirical_coverage",
            "calibrated",
        )
        .orderBy("tau")
    )


ES_EVENT_DATE = "1996-01-01"  # event-study anchor
ES_PRE_DAYS = 60  # estimation window length
ES_WINDOW = 10  # event window half-width (days)


@query(
    "event_study_car",
    oracle=f"""
    WITH daily AS (
        SELECT CAST(o_orderdate AS DATE) AS d,
               ROUND(SUM(o_totalprice) / 1e6, 6) AS x
        FROM orders GROUP BY 1
    ),
    base AS (
        SELECT ROUND(AVG(x), 6) AS mu,
               ROUND(stddev_samp(x), 6) AS sd,
               COUNT(*) AS n_pre
        FROM daily
        WHERE d >= DATE '{ES_EVENT_DATE}' - {ES_PRE_DAYS}
          AND d < DATE '{ES_EVENT_DATE}'
    ),
    win AS (
        SELECT date_diff('day', DATE '{ES_EVENT_DATE}', d) AS rel_day,
               x
        FROM daily
        WHERE d >= DATE '{ES_EVENT_DATE}' - {ES_WINDOW}
          AND d <= DATE '{ES_EVENT_DATE}' + {ES_WINDOW}
    )
    SELECT w.rel_day,
           ROUND(w.x, 6) AS actual,
           ROUND(b.mu, 6) AS expected,
           ROUND(w.x - b.mu, 6) AS abnormal,
           ROUND(SUM(w.x - b.mu) OVER (ORDER BY w.rel_day
                 ROWS UNBOUNDED PRECEDING), 6) AS car,
           ROUND(SUM(w.x - b.mu) OVER (ORDER BY w.rel_day
                 ROWS UNBOUNDED PRECEDING)
                 / (b.sd * SQRT(ROW_NUMBER() OVER
                    (ORDER BY w.rel_day))), 6) AS car_t
    FROM win w CROSS JOIN base b
    ORDER BY w.rel_day
    """,
)
def event_study_car(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event study around the 1996-01-01 anchor: cumulative abnormal
    revenue (CAR) over a +-10-day event window against a 60-day
    pre-event baseline — the quasi-experimental READOUT CURVE
    beside `diff_in_diff_revenue`'s single number (DiD needs a
    control group; an event study needs only the series' own
    pre-period, the MacKinlay 1997 playbook): abnormal = actual -
    baseline mean, CAR accumulates it through the window, and car_t
    = CAR/(sd*sqrt(k)) is the running t-statistic under the iid
    null — |car_t| > 2 after the event and ~0 before IS the
    verdict a launch review reads.

    Scale shape: corpus -> day grain, a 1-row baseline broadcast,
    and a 21-row ordered window. Multi-event panels partition by
    event id, same plan."""
    orders = load_table(spark, sf_dir, "orders")
    daily = orders.groupBy(
        F.to_date("o_orderdate").alias("d")
    ).agg(F.round(F.sum("o_totalprice") / 1e6, 6).alias("x"))
    anchor = F.lit(ES_EVENT_DATE).cast("date")
    base = daily.filter(
        (F.col("d") >= F.date_sub(anchor, ES_PRE_DAYS))
        & (F.col("d") < anchor)
    ).agg(
        # 6-dp pin on the baseline moments BEFORE they enter the
        # cumulative arithmetic: the unpinned mean diverged between
        # engines at the 1e-13 level and flipped a 6-dp boundary in
        # the CAR column at sf0.1 (caught by the both-scale audit)
        F.round(F.avg("x"), 6).alias("mu"),
        F.round(F.stddev_samp("x"), 6).alias("sd"),
        F.count("*").alias("n_pre"),
    )
    win = daily.filter(
        (F.col("d") >= F.date_sub(anchor, ES_WINDOW))
        & (F.col("d") <= F.date_add(anchor, ES_WINDOW))
    ).select(F.datediff(F.col("d"), anchor).alias("rel_day"), "x")
    wcum = Window.orderBy("rel_day").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    ab = F.col("x") - F.col("mu")
    return (
        win.crossJoin(F.broadcast(base))
        .select(
            "rel_day",
            F.round("x", 6).alias("actual"),
            F.round("mu", 6).alias("expected"),
            F.round(ab, 6).alias("abnormal"),
            F.round(F.sum(ab).over(wcum), 6).alias("car"),
            F.round(
                F.sum(ab).over(wcum)
                / (
                    F.col("sd")
                    * F.sqrt(
                        F.row_number()
                        .over(Window.orderBy("rel_day"))
                        .cast("double")
                    )
                ),
                6,
            ).alias("car_t"),
        )
        .orderBy("rel_day")
    )

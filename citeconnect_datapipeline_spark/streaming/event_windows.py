"""Event-time window aggregations (SURVEY.md SS2.11 M5): tumbling,
sliding, and session windows over the events table.

The reference is batch-only; its closest analogue is generator-based
micro-batching (utils/gcs_reader.py:173-217) and cron-cadence
monitoring (configs/collection_config.yaml:7-9). These queries define
the event-time semantics; ``jobs.py`` runs the same aggregations as
genuine Structured Streaming (readStream + watermark + availableNow),
and tests assert stream==batch -- the standard way to validate
streaming logic, since a finite stream must converge to the batch
answer.

All window starts are epoch-aligned in both engines (Spark ``window``
and DuckDB ``time_bucket``), and emitted as formatted strings so the
oracle hash is timezone-stable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..plans.registry import query
from ..sources.tables import load_table

SESSION_GAP_MIN = 10


@query(
    "tumbling_window_agg",
    oracle="""
    SELECT strftime(time_bucket(INTERVAL '1 hour', ts),
                    '%Y-%m-%d %H:%M:%S') AS window_start,
           event_type,
           COUNT(*) AS n_events,
           ROUND(SUM(value), 6) AS total_value
    FROM events
    GROUP BY time_bucket(INTERVAL '1 hour', ts), event_type
    ORDER BY window_start, event_type
    """,
)
def tumbling_window_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 1-hour event-time windows per event type. In streaming
    form this is the watermarked incremental aggregate (jobs.py); in
    batch form one shuffle on (window, type). State per window is
    bounded, so the same plan runs on an unbounded stream."""
    events = load_table(spark, sf_dir, "events")
    return (
        events.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 6).alias("total_value"),
        )
        .select(
            F.date_format("w.start", "yyyy-MM-dd HH:mm:ss").alias(
                "window_start"
            ),
            "event_type",
            "n_events",
            "total_value",
        )
        .orderBy("window_start", "event_type")
    )


@query(
    "sliding_window_agg",
    oracle="""
    WITH assigned AS (
        SELECT t.ws AS window_start, e.value
        FROM events e,
             UNNEST([
                 time_bucket(INTERVAL '30 minutes', e.ts),
                 time_bucket(INTERVAL '30 minutes', e.ts)
                     - INTERVAL '30 minutes'
             ]) AS t(ws)
    )
    SELECT strftime(window_start, '%Y-%m-%d %H:%M:%S') AS window_start,
           COUNT(*) AS n_events,
           ROUND(ROUND(SUM(value), 4) / COUNT(*), 6) AS mean_value
    FROM assigned
    GROUP BY window_start
    ORDER BY window_start
    """,
)
def sliding_window_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding windows, 1-hour length / 30-minute slide: each event
    lands in 2 overlapping windows (Spark expands this internally; the
    oracle unnests the two bucket starts explicitly). Row growth =
    length/slide, the cost knob at scale."""
    events = load_table(spark, sf_dir, "events")
    return (
        events.groupBy(F.window("ts", "1 hour", "30 minutes").alias("w"))
        .agg(
            F.count("*").alias("n_events"),
            # NOT round(avg(...)): each engine's running mean lands a
            # different ulp from the true value, and window means sit
            # exactly on rounding midpoints at bench scale. Rounding
            # the SUM first (magnitude-safe at 4 dp) makes the
            # dividend BIT-IDENTICAL across engines; identical
            # dividend / identical integer count -> identical IEEE
            # division -> identical final rounding, at every scale.
            F.round(
                F.round(F.sum("value"), 4) / F.count("*"), 6
            ).alias("mean_value"),
        )
        .select(
            F.date_format("w.start", "yyyy-MM-dd HH:mm:ss").alias(
                "window_start"
            ),
            "n_events",
            "mean_value",
        )
        .orderBy("window_start")
    )


@query(
    "session_window_agg",
    oracle=f"""
    WITH ordered AS (
        SELECT user_id, ts, value,
               LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                   AS prev_ts
        FROM events
    ),
    flagged AS (
        SELECT user_id, ts, value,
               CASE WHEN prev_ts IS NULL
                         OR ts - prev_ts >= INTERVAL '{SESSION_GAP_MIN} minutes'
                    THEN 1 ELSE 0 END AS new_session
        FROM ordered
    ),
    numbered AS (
        SELECT user_id, ts, value,
               SUM(new_session) OVER (
                   PARTITION BY user_id ORDER BY ts
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) AS session_no
        FROM flagged
    )
    SELECT user_id,
           strftime(MIN(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
           strftime(MAX(ts) + INTERVAL '{SESSION_GAP_MIN} minutes',
                    '%Y-%m-%d %H:%M:%S') AS session_end,
           COUNT(*) AS n_events,
           ROUND(SUM(value), 6) AS total_value
    FROM numbered
    GROUP BY user_id, session_no
    ORDER BY user_id, session_start
    """,
)
def session_window_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session windows with a 10-minute (SESSION_GAP_MIN) inactivity gap,
    per user. Spark's ``session_window`` merges events whose gap is
    strictly below the timeout; window end = last event + gap. The
    oracle reproduces exactly that with gaps-and-islands SQL, which is
    also the proof the semantics are well-defined. In streaming form
    session state is per-key and closed by the watermark (jobs.py)."""
    events = load_table(spark, sf_dir, "events")
    return (
        events.groupBy(
            F.session_window("ts", f"{SESSION_GAP_MIN} minutes").alias("w"),
            "user_id",
        )
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 6).alias("total_value"),
        )
        .select(
            "user_id",
            F.date_format("w.start", "yyyy-MM-dd HH:mm:ss").alias(
                "session_start"
            ),
            F.date_format("w.end", "yyyy-MM-dd HH:mm:ss").alias("session_end"),
            "n_events",
            "total_value",
        )
        .orderBy("user_id", "session_start")
    )

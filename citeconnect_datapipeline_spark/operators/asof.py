"""As-of (point-in-time) join — a custom operator Spark's DataFrame
API lacks natively.

For each left row, attach the most recent right row with
``right.ts <= left.ts`` per key. The naive formulation is a range
join (quadratic per key); the scalable restatement is UNION + ONE
WINDOW: tag both sides, union them, and per key carry the last seen
right-side value forward over the event-time order
(``last(..., ignorenulls=True)``). One shuffle on (key), linear scan
per partition — the standard large-scale as-of shape (no per-row
range probe, no skew amplification beyond the key's own volume).

DuckDB has native ASOF JOIN, which the oracle uses — so the
correctness gate checks this restatement against a first-class
implementation of the semantics.

No reference analogue (SURVEY.md §2.4: the reference has no general
join at all); this is training-data-pipeline equipment (e.g. joining
events to the latest model-version row, or trades to quotes).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..plans.registry import query
from ..sources.tables import load_table


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    ts: str,
    right_cols: list[str],
) -> DataFrame:
    """Generic as-of join: left rows + latest right_cols at or before
    each left row's timestamp, per key. Ties on ts: the right row
    sorts BEFORE the left row with the same ts (<=` semantics)."""
    lt = left.withColumn("_side", F.lit(1))
    rt = right.select(
        key, ts, *right_cols
    ).withColumn("_side", F.lit(0))
    merged = lt.unionByName(rt, allowMissingColumns=True)
    # right rows first within equal ts -> "<=" as-of semantics
    w = (
        Window.partitionBy(key)
        .orderBy(ts, "_side")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = merged.select(
        "*",
        *[
            F.last(c, ignorenulls=True).over(w).alias(f"asof_{c}")
            for c in right_cols
        ],
    )
    return (
        carried.filter(F.col("_side") == 1)
        .drop("_side", *right_cols)
    )


@query(
    "asof_join_events",
    oracle="""
    WITH clicks AS (
        SELECT user_id, ts, event_id, value FROM events
        WHERE event_type = 'click'
    ), purchases AS (
        SELECT user_id, ts, value AS purchase_value FROM events
        WHERE event_type = 'purchase'
    )
    SELECT c.event_id, c.user_id,
           strftime(c.ts, '%Y-%m-%d %H:%M:%S') AS click_ts,
           ROUND(p.purchase_value, 6) AS last_purchase_value
    FROM clicks c
    ASOF LEFT JOIN purchases p
        ON c.user_id = p.user_id AND c.ts >= p.ts
    ORDER BY c.event_id
    LIMIT 2000
    """,
)
def asof_join_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join over the events stream: each click gets the value of
    the user's most recent prior-or-simultaneous purchase (NULL if
    none yet). Checked against DuckDB's native ASOF JOIN."""
    events = load_table(spark, sf_dir, "events")
    clicks = events.filter(F.col("event_type") == "click").select(
        "user_id", "ts", "event_id", "value"
    )
    purchases = events.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", F.col("value").alias("purchase_value")
    )
    out = asof_join(clicks, purchases, "user_id", "ts", ["purchase_value"])
    return (
        out.select(
            "event_id",
            "user_id",
            F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("click_ts"),
            F.round("asof_purchase_value", 6).alias("last_purchase_value"),
        )
        .orderBy("event_id")
        .limit(2000)
    )


@query(
    "range_join_binned",
    oracle="""
    WITH windows AS (
        SELECT user_id,
               min(ts) + INTERVAL 2 DAY AS w_start,
               min(ts) + INTERVAL 9 DAY AS w_end
        FROM events GROUP BY user_id HAVING user_id < 20
    )
    SELECT w.user_id, COUNT(*) AS n_in_window,
           ROUND(SUM(e.value), 6) AS window_value
    FROM events e JOIN windows w
      ON e.user_id = w.user_id
     AND e.ts >= w.w_start AND e.ts < w.w_end
    GROUP BY w.user_id
    ORDER BY w.user_id
    """,
)
def range_join_binned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval/range join (events x per-user time windows), written
    scale-first: the interval predicate alone would physical-plan to a
    nested-loop join (quadratic; Spark broadcasts one side and scans).
    Adding the equi-key (user_id) to the join condition makes it a
    hash/sort-merge join with the range as a cheap post-filter — the
    standard rewrite: always surface an equality (a key, or a time
    BIN for pure-interval joins: explode intervals into bins, join on
    bin, filter exactly) so the planner gets a shuffle key.

    The window table derives from the data (first event + [2d, 9d))
    so the query is self-contained and the oracle replays it."""
    events = load_table(spark, sf_dir, "events")
    windows = (
        events.groupBy("user_id")
        .agg(F.min("ts").alias("first_ts"))
        .filter(F.col("user_id") < 20)
        .select(
            F.col("user_id").alias("w_user_id"),
            (F.col("first_ts") + F.expr("INTERVAL 2 DAYS")).alias("w_start"),
            (F.col("first_ts") + F.expr("INTERVAL 9 DAYS")).alias("w_end"),
        )
    )
    joined = events.join(
        F.broadcast(windows),
        on=[
            events.user_id == F.col("w_user_id"),
            events.ts >= F.col("w_start"),
            events.ts < F.col("w_end"),
        ],
    )
    return (
        joined.groupBy(F.col("w_user_id").alias("user_id"))
        .agg(
            F.count("*").alias("n_in_window"),
            F.round(F.sum("value"), 6).alias("window_value"),
        )
        .orderBy("user_id")
    )


ASOF_FWD_TOL_US = 7 * 24 * 3600 * 1_000_000  # 7-day forward window


def asof_join_forward(
    left: DataFrame,
    right: DataFrame,
    key: str,
    ts: str,
    order_col: str,
    right_cols: list[str],
    tol_us: int = ASOF_FWD_TOL_US,
) -> DataFrame:
    """Forward as-of join: for each left row, the FIRST right row with
    ``right.ts >= left.ts`` per key, within a tolerance — the
    did-it-convert direction of `asof_join` (click -> next purchase,
    alert -> next deploy). Same scalable restatement: union + ONE
    window, here first(ignorenulls) over the FORWARD frame; equal
    timestamps count as matches (left sorts before right on the tag),
    ties among rights break on ``order_col``. Rows whose match falls
    outside ``tol_us`` get NULLs. One shuffle on (key), linear scan —
    no per-row range probe."""
    lt = left.withColumn("_side", F.lit(0))
    rt = right.select(key, ts, order_col, *right_cols).withColumn(
        "_side", F.lit(1)
    )
    merged = lt.unionByName(rt, allowMissingColumns=True)
    w = (
        Window.partitionBy(key)
        .orderBy(ts, "_side", order_col)
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    # Carry ONE struct holding the first right row's timestamp AND
    # payload, so every carried field comes from the SAME row. A
    # per-column first(ignorenulls) would skip ahead to a LATER right
    # row for any payload column that is NULL in the first match —
    # an inconsistent composite that diverges from first-match
    # (LATERAL ... LIMIT 1) semantics on nullable right columns.
    rstruct = F.when(
        F.col("_side") == 1,
        F.struct(
            F.unix_micros(F.col(ts)).alias("_rts_us"),
            *[F.col(c).alias(c) for c in right_cols],
        ),
    )
    carried = merged.select(
        "*",
        F.first(rstruct, ignorenulls=True).over(w).alias("_nxt"),
    )
    gap = F.col("_nxt._rts_us") - F.unix_micros(F.col(ts))
    in_tol = F.col("_nxt").isNotNull() & (gap <= tol_us)
    return (
        carried.filter(F.col("_side") == 0)
        .select(
            *left.columns,
            F.when(in_tol, gap).alias("gap_us"),
            *[
                F.when(in_tol, F.col(f"_nxt.{c}")).alias(f"next_{c}")
                for c in right_cols
            ],
        )
    )


@query(
    "asof_forward_attribution",
    oracle=f"""
    WITH clicks AS (
        SELECT user_id, ts, event_id FROM events
        WHERE event_type = 'click'
    ), purchases AS (
        SELECT user_id, ts, event_id, value FROM events
        WHERE event_type = 'purchase'
    ), matched AS (
        SELECT c.event_id, c.user_id,
               n.gap_us, n.purchase_value
        FROM clicks c LEFT JOIN LATERAL (
            SELECT epoch_us(p.ts) - epoch_us(c.ts) AS gap_us,
                   p.value AS purchase_value
            FROM purchases p
            WHERE p.user_id = c.user_id AND p.ts >= c.ts
            ORDER BY p.ts, p.event_id
            LIMIT 1
        ) n ON TRUE
    )
    SELECT event_id, user_id,
           CASE WHEN gap_us <= {ASOF_FWD_TOL_US}
                THEN gap_us END AS gap_us,
           CASE WHEN gap_us <= {ASOF_FWD_TOL_US}
                THEN ROUND(purchase_value, 6) END
               AS next_purchase_value
    FROM matched
    ORDER BY event_id
    """,
)
def asof_forward_attribution(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Forward attribution: every click joined to the FIRST purchase
    at-or-after it by the same user within 7 days — the conversion
    question `last_touch_attribution` answers from the purchase side,
    here from the exposure side, and the forward complement of
    `asof_join_events`. The oracle is a correlated LATERAL
    first-match (a per-row probe DuckDB can afford at oracle scale);
    the engine runs the union + one forward window restatement that
    stays linear per key at 100 TB."""
    ev = load_table(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id", "ts", "event_id"
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id",
        "ts",
        "event_id",
        F.col("value").alias("purchase_value"),
    )
    out = asof_join_forward(
        clicks,
        purchases,
        key="user_id",
        ts="ts",
        order_col="event_id",
        right_cols=["purchase_value"],
    )
    return out.select(
        "event_id",
        "user_id",
        "gap_us",
        F.round("next_purchase_value", 6).alias("next_purchase_value"),
    ).orderBy("event_id")

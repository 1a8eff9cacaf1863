"""Statistical aggregates: moments, correlation, exact quantiles.

The reference's statistics stop at mean/median/std via pandas
``describe`` (SURVEY.md SS2.5 A6/A8); an analytics engine over the
same lake should expose the full single-pass moment family — these
back both data-quality monitoring (distribution-shape drift is what
the reference's z-score check approximates) and feature analysis for
training-data curation.

Engine-parity note: skewness/kurtosis DEFINITIONS differ across
engines (population vs sample-corrected). Spark implements the
population form (g1 = m3/m2^1.5, excess g2 = m4/m2^2 - 3, with
m_k the central moment Σ(x-μ)^k / n). The DuckDB oracles therefore
spell the same math out of two-pass central moments instead of
calling DuckDB's sample-corrected built-ins — the oracle pins the
semantics, not the other engine's flavor.

Scale: every aggregate here is a single map-side-combinable pass
(Spark's CentralMomentAgg is one-pass streaming); the two-pass oracle
form is only for the small-scale correctness check. Exact percentiles
shuffle the group's values once; at 100 TB swap `percentile` for
`percentile_approx` (same query shape, bounded memory).
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..plans.registry import query
from ..sources.tables import (
    literal_frame,
    literal_grid,
    load_table,
    spread_small_source,
)


@query(
    "grouped_moments",
    oracle="""
    WITH mu AS (
        SELECT l_returnflag AS grp,
               AVG(l_quantity) AS mq,
               AVG(l_extendedprice) AS mp
        FROM lineitem GROUP BY l_returnflag
    )
    SELECT l.l_returnflag AS grp,
           COUNT(*) AS n,
           ROUND(AVG(l.l_quantity), 4) AS mean_qty,
           ROUND(STDDEV_SAMP(l.l_quantity), 4) AS stddev_qty,
           ROUND(AVG(POWER(l.l_quantity - mu.mq, 3))
                 / POWER(AVG(POWER(l.l_quantity - mu.mq, 2)), 1.5),
                 4) AS skew_qty,
           ROUND(AVG(POWER(l.l_quantity - mu.mq, 4))
                 / POWER(AVG(POWER(l.l_quantity - mu.mq, 2)), 2) - 3,
                 4) AS kurt_qty,
           ROUND(CORR(l.l_quantity, l.l_extendedprice), 4) AS corr_qty_price,
           ROUND(COVAR_SAMP(l.l_quantity, l.l_extendedprice), 4)
               AS covar_qty_price,
           ROUND(MEDIAN(l.l_quantity), 4) AS median_qty
    FROM lineitem l JOIN mu ON l.l_returnflag = mu.grp
    GROUP BY l.l_returnflag
    ORDER BY grp
    """,
)
def grouped_moments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-return-flag distribution shape: count, mean, sample stddev,
    population skewness, population excess kurtosis, quantity↔price
    correlation and sample covariance, exact median. The moment pass
    is one hash aggregation of streaming accumulators
    (CentralMomentAgg / Corr / Covariance), map-side combinable;
    the exact median rides a separate (group, value) count-map
    aggregate so no raw values buffer through the shuffle (see the
    in-body comment), and a tiny group-grain join stitches them."""
    li = load_table(spark, sf_dir, "lineitem")
    moments = li.groupBy(F.col("l_returnflag").alias("grp")).agg(
        F.count("*").alias("n"),
        F.round(F.avg("l_quantity"), 4).alias("mean_qty"),
        F.round(F.stddev_samp("l_quantity"), 4).alias("stddev_qty"),
        F.round(F.skewness("l_quantity"), 4).alias("skew_qty"),
        F.round(F.kurtosis("l_quantity"), 4).alias("kurt_qty"),
        F.round(F.corr("l_quantity", "l_extendedprice"), 4).alias(
            "corr_qty_price"
        ),
        F.round(
            F.covar_samp("l_quantity", "l_extendedprice"), 4
        ).alias("covar_qty_price"),
    )
    # Exact median over the (group, value) COUNT MAP instead of
    # buffering every raw value through the group shuffle: quantity
    # has ~50 distinct values, so the weighted-percentile aggregate
    # merges <=50-entry partials where Median's ObjectHashAggregate
    # funneled 150k raw rows into each group task (measured 1.08 s
    # -> 0.35 s for the whole query at sf0.1; values identical —
    # percentile-with-frequency IS the exact percentile of the
    # expanded multiset).
    med = (
        li.groupBy(F.col("l_returnflag").alias("grp"), "l_quantity")
        .agg(F.count("*").alias("cnt"))
        .groupBy("grp")
        .agg(
            F.round(
                F.expr("percentile(l_quantity, 0.5, cnt)"), 4
            ).alias("median_qty")
        )
    )
    return moments.join(med, "grp").orderBy("grp")


@query(
    "quantiles_by_group",
    oracle="""
    SELECT o_orderpriority AS priority,
           ROUND(quantile_cont(o_totalprice, 0.25), 4) AS p25,
           ROUND(quantile_cont(o_totalprice, 0.50), 4) AS p50,
           ROUND(quantile_cont(o_totalprice, 0.75), 4) AS p75,
           ROUND(quantile_cont(o_totalprice, 0.90), 4) AS p90,
           ROUND(quantile_cont(o_totalprice, 0.75)
                 - quantile_cont(o_totalprice, 0.25), 4) AS iqr
    FROM orders
    GROUP BY o_orderpriority
    ORDER BY priority
    """,
)
def quantiles_by_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact linear-interpolated percentiles of order value per
    priority class (the reference's group-describe A8, upgraded from
    pandas to a distributed aggregate). Both engines use the
    continuous-quantile definition so values match exactly. At lake
    scale the one-line swap to ``percentile_approx`` trades exactness
    for a fixed-size sketch that merges map-side."""
    orders = load_table(spark, sf_dir, "orders")
    pct = [0.25, 0.50, 0.75, 0.90]
    # ONE array-form percentile aggregate, not one per cut point:
    # Percentile is an object aggregate that buffers the whole group,
    # so N separate calls buffer (and merge) the group N times over.
    qs = F.percentile("o_totalprice", F.array(*[F.lit(p) for p in pct]))
    return (
        orders.groupBy(F.col("o_orderpriority").alias("priority"))
        .agg(qs.alias("qs"))
        .select(
            "priority",
            F.round(F.col("qs")[0], 4).alias("p25"),
            F.round(F.col("qs")[1], 4).alias("p50"),
            F.round(F.col("qs")[2], 4).alias("p75"),
            F.round(F.col("qs")[3], 4).alias("p90"),
            F.round(F.col("qs")[2] - F.col("qs")[0], 4).alias("iqr"),
        )
        .orderBy("priority")
    )


HIST_LO, HIST_HI, HIST_BUCKETS = 0.0, 500_000.0, 20


@query(
    "price_histogram",
    oracle=f"""
    SELECT CASE WHEN o_totalprice < {HIST_LO} THEN 0
                WHEN o_totalprice >= {HIST_HI} THEN {HIST_BUCKETS} + 1
                ELSE CAST(FLOOR((o_totalprice - {HIST_LO})
                          * {HIST_BUCKETS}
                          / ({HIST_HI} - {HIST_LO})) AS BIGINT) + 1
           END AS bucket,
           COUNT(*) AS n,
           ROUND(MIN(o_totalprice), 4) AS lo,
           ROUND(MAX(o_totalprice), 4) AS hi
    FROM orders
    GROUP BY 1
    ORDER BY bucket
    """,
)
def price_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-width histogram of order value via ``width_bucket`` (the
    engine-native binning the reference approximates with pandas
    value_counts over hand-made ranges, visualization_generator.py).
    One map-side-combinable aggregate; the oracle spells out
    width_bucket's exact edge semantics (0 below range, n+1 at/above
    the upper bound) since DuckDB lacks the function."""
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.select(
            F.width_bucket(
                "o_totalprice",
                F.lit(HIST_LO),
                F.lit(HIST_HI),
                F.lit(HIST_BUCKETS),
            ).alias("bucket"),
            "o_totalprice",
        )
        .groupBy("bucket")
        .agg(
            F.count("*").alias("n"),
            F.round(F.min("o_totalprice"), 4).alias("lo"),
            F.round(F.max("o_totalprice"), 4).alias("hi"),
        )
        .orderBy("bucket")
    )


@query("sketch_rollup")  # rows-only: sketch binaries are engine-specific
def sketch_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable-summary pattern (Spark 4 DataSketches): per-day HLL
    sketches of distinct users and KLL sketches of the value
    distribution, then ONE re-aggregation merges the daily sketches
    into month-level answers — without touching raw data again. This
    is the 100 TB reporting architecture: materialize small sketch
    rows at ingest granularity, answer any coarser rollup by merging
    (commutative, associative, bounded-size state), never re-scan.
    The reference recomputes every rollup from raw parquet each run.

    Output: one row per day (estimated distinct users, median-by-KLL)
    plus one __month__ row whose values come ONLY from merging the
    daily sketches. A test checks the estimates against exact
    answers within HLL/KLL error bounds."""
    events = load_table(spark, sf_dir, "events")
    daily = events.groupBy(F.to_date("ts").alias("d")).agg(
        F.hll_sketch_agg("user_id").alias("users_hll"),
        F.kll_sketch_agg_double("value").alias("value_kll"),
    )
    per_day = daily.select(
        F.date_format("d", "yyyy-MM-dd").alias("day"),
        F.hll_sketch_estimate("users_hll").alias("distinct_users"),
        F.round(
            F.kll_sketch_get_quantile_double("value_kll", F.lit(0.5)), 4
        ).alias("median_value"),
    )
    merged = daily.agg(
        F.hll_union_agg("users_hll").alias("u"),
        F.kll_merge_agg_double("value_kll").alias("v"),
    ).select(
        F.lit("__month__").alias("day"),
        F.hll_sketch_estimate("u").alias("distinct_users"),
        F.round(
            F.kll_sketch_get_quantile_double("v", F.lit(0.5)), 4
        ).alias("median_value"),
    )
    return per_day.unionByName(merged).orderBy("day")


@query(
    "bitmap_exact_distinct",
    oracle="""
    SELECT event_type,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS distinct_users
    FROM events GROUP BY event_type
    UNION ALL
    SELECT '__all__' AS event_type,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS distinct_users
    FROM events
    ORDER BY event_type
    """,
)
def bitmap_exact_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT distinct counts with mergeable state (Spark 4 bitmap
    aggregates). COUNT(DISTINCT) over 100 TB shuffles every distinct
    key once per query and is NOT re-aggregable; HLL is mergeable but
    approximate. Roaring-style bitmaps are both: map ids to
    (bucket, bit) with bitmap_bucket_number/bitmap_bit_position,
    build one bitmap per (group, bucket) partition of the id space,
    and every coarser rollup is bitmap_or_agg + bitmap_count —
    bounded-size, commutative state, no raw-data re-scan, exact.

    The __all__ row is computed ONLY by OR-merging the per-event-type
    bitmaps — the re-aggregation path — and hash-matches DuckDB's
    COUNT(DISTINCT) over raw rows, proving the merge is lossless.

    The reference counts distincts with pandas nunique per run
    (slicing_bias_analysis.py:208-229) and can never combine two
    runs' results without re-reading both."""
    events = load_table(spark, sf_dir, "events")
    bitmaps = events.groupBy(
        "event_type", F.bitmap_bucket_number("user_id").alias("bucket")
    ).agg(F.bitmap_construct_agg(F.bitmap_bit_position("user_id")).alias("bm"))
    per_type = bitmaps.groupBy("event_type").agg(
        F.sum(F.bitmap_count("bm")).alias("distinct_users")
    )
    overall = (
        bitmaps.groupBy("bucket")
        .agg(F.bitmap_or_agg("bm").alias("bm"))
        .agg(F.sum(F.bitmap_count("bm")).alias("distinct_users"))
        .select(F.lit("__all__").alias("event_type"), "distinct_users")
    )
    return per_type.unionByName(overall).orderBy("event_type")


@query("theta_audience_overlap")  # rows-only: sketch estimates are engine-specific
def theta_audience_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audience set algebra on sketches (Spark 4.1 Theta sketches).
    "How many users clicked AND purchased / clicked but never
    purchased" needs distinct-set intersection/difference — HLL can
    union but cannot intersect; at 100 TB the exact answer is a
    multi-terabyte shuffle per pair. Theta sketches close that gap:
    one sketch per event_type (mergeable ingest-time state, like
    [[sketch_rollup]]'s HLLs), then every pairwise overlap is
    sketch-only set algebra — no raw-data pass, O(k) per estimate.

    Output: one row per ordered event_type pair with union /
    intersection / difference (a\\b) estimates. A test checks the
    estimates against exact DuckDB set cardinalities within theta
    error bounds."""
    events = load_table(spark, sf_dir, "events")
    sk = events.groupBy("event_type").agg(
        F.theta_sketch_agg("user_id").alias("sk")
    )
    a = sk.select(F.col("event_type").alias("a"), F.col("sk").alias("sk_a"))
    b = sk.select(F.col("event_type").alias("b"), F.col("sk").alias("sk_b"))
    pairs = a.join(F.broadcast(b), F.col("a") < F.col("b"))
    return pairs.select(
        "a",
        "b",
        F.round(
            F.theta_sketch_estimate(F.theta_union("sk_a", "sk_b")), 1
        ).alias("union_est"),
        F.round(
            F.theta_sketch_estimate(F.theta_intersection("sk_a", "sk_b")), 1
        ).alias("intersect_est"),
        F.round(
            F.theta_sketch_estimate(F.theta_difference("sk_a", "sk_b")), 1
        ).alias("a_minus_b_est"),
    ).orderBy("a", "b")


@query(
    "metric_trend_fit",
    oracle="""
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n,
           ROUND(REGR_SLOPE(value,
               date_diff('day', DATE '1970-01-01', CAST(ts AS DATE))), 6)
               AS slope_per_day,
           ROUND(REGR_INTERCEPT(value,
               date_diff('day', DATE '1970-01-01', CAST(ts AS DATE))), 4)
               AS intercept,
           ROUND(REGR_R2(value,
               date_diff('day', DATE '1970-01-01', CAST(ts AS DATE))), 6)
               AS r2
    FROM events
    GROUP BY event_type
    ORDER BY event_type
    """,
)
def metric_trend_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Least-squares trend per event type: slope/intercept/R² of
    value against calendar day, via the SQL-standard REGR_*
    aggregates — drift DIRECTION and fit quality, complementing
    [[ewma_anomaly]]'s level-deviation check (a steady drift never
    trips a point-anomaly threshold; a slope does show it). Each
    REGR_* is a streaming sum-of-products accumulator, so the whole
    fit is one map-side-combinable pass — no per-group value
    materialization at any scale."""
    events = load_table(spark, sf_dir, "events")
    x = F.unix_date(F.to_date("ts")).cast("double")
    return (
        events.groupBy("event_type")
        .agg(
            F.count("*").alias("n"),
            F.round(F.regr_slope("value", x), 6).alias("slope_per_day"),
            F.round(F.regr_intercept("value", x), 4).alias("intercept"),
            F.round(F.regr_r2("value", x), 6).alias("r2"),
        )
        .orderBy("event_type")
    )


MAD_K = 1.4826  # normal-consistency constant
MAD_CUT = 3.0


@query(
    "mad_outlier_flags",
    oracle=f"""
    WITH med AS (
        SELECT o_orderpriority AS priority,
               MEDIAN(o_totalprice) AS med
        FROM orders GROUP BY o_orderpriority
    ),
    mad AS (
        SELECT o.o_orderpriority AS priority,
               MEDIAN(ABS(o.o_totalprice - m.med)) AS mad
        FROM orders o JOIN med m ON o.o_orderpriority = m.priority
        GROUP BY o.o_orderpriority
    )
    SELECT o.o_orderpriority AS priority,
           ROUND(m.med, 4) AS med,
           ROUND(d.mad, 4) AS mad,
           COUNT(*) AS n,
           CAST(COUNT(*) FILTER (
               WHERE ABS(o.o_totalprice - m.med)
                     > {MAD_CUT} * {MAD_K} * d.mad
           ) AS BIGINT) AS n_outliers,
           ROUND(COUNT(*) FILTER (
               WHERE ABS(o.o_totalprice - m.med)
                     > {MAD_CUT} * {MAD_K} * d.mad
           ) / CAST(COUNT(*) AS DOUBLE), 6) AS outlier_rate
    FROM orders o
    JOIN med m ON o.o_orderpriority = m.priority
    JOIN mad d ON o.o_orderpriority = d.priority
    GROUP BY o.o_orderpriority, m.med, d.mad
    ORDER BY priority
    """,
)
def mad_outlier_flags(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust per-group outlier detection: median absolute deviation
    with the 1.4826 normal-consistency scale and a 3-sigma-equivalent
    cut — the robust sibling of the z-score anomaly gates (A12/A13),
    immune to the outliers it is hunting (a fat tail inflates a
    stddev cut into blindness; the MAD barely moves). The reference's
    anomaly checks are mean/std only (Validation/schema_validator
    thresholds); this is the robust-statistics upgrade every metrics
    pipeline eventually needs.

    Two exact-median aggregates (group-keyed shuffles) with the tiny
    per-group median/MAD tables joined back — AQE broadcasts them at
    any group cardinality that fits, and both joins are on the same
    group key so the exchanges reuse. At lake scale the documented
    swap is ``percentile_approx`` for both medians (fixed-size
    sketch, map-side merge), same as quantiles_by_group."""
    orders = load_table(spark, sf_dir, "orders")
    # r12 (guide §2.4): the median pass, the MAD pass, and the flag
    # pass each re-embedded the orders scan (4 scans in
    # mad_outlier_flags_before.txt). Pin the narrow (priority, price)
    # projection once; the two exact-median aggregates and the flag
    # rollup all read the materialized rows — the fact table appears
    # exactly once at any scale.
    proj = orders.select(
        F.col("o_orderpriority").alias("priority"), "o_totalprice"
    ).localCheckpoint()
    med = proj.groupBy("priority").agg(
        F.percentile("o_totalprice", F.lit(0.5)).alias("med")
    )
    joined = proj.join(med, "priority")
    mad = (
        joined.groupBy("priority")
        .agg(
            F.percentile(
                F.abs(F.col("o_totalprice") - F.col("med")), F.lit(0.5)
            ).alias("mad")
        )
    )
    flagged = joined.join(mad, "priority")
    is_out = F.abs(F.col("o_totalprice") - F.col("med")) > (
        F.lit(MAD_CUT * MAD_K) * F.col("mad")
    )
    return (
        flagged.groupBy("priority", "med", "mad")
        .agg(
            F.count("*").alias("n"),
            F.count(F.when(is_out, 1)).alias("n_outliers"),
            F.round(
                F.count(F.when(is_out, 1)) / F.count("*").cast("double"),
                6,
            ).alias("outlier_rate"),
        )
        .select(
            "priority",
            F.round("med", 4).alias("med"),
            F.round("mad", 4).alias("mad"),
            "n",
            "n_outliers",
            "outlier_rate",
        )
        .orderBy("priority")
    )


@query(
    "spearman_signal_correlation",
    oracle="""
    WITH m AS (
        SELECT doc_id, source,
               ROUND(CAST(len(list_distinct(words)) AS DOUBLE)
                     / GREATEST(len(words), 1), 6) AS ttr,
               ROUND(CAST(n_chars AS DOUBLE)
                     / GREATEST(len(words), 1), 6) AS mwl
        FROM (
            SELECT doc_id, source, n_chars,
                   list_filter(
                       string_split_regex(lower(text), '[^a-z0-9]+'),
                       x -> x <> '') AS words
            FROM documents
        )
    ),
    r AS (
        SELECT source,
               CAST(row_number() OVER (
                   PARTITION BY source ORDER BY ttr, doc_id
               ) AS DOUBLE) AS r1,
               CAST(row_number() OVER (
                   PARTITION BY source ORDER BY mwl, doc_id
               ) AS DOUBLE) AS r2
        FROM m
    )
    SELECT source,
           CAST(count(*) AS BIGINT) AS n_docs,
           CASE WHEN count(*) >= 2 THEN
               ROUND(1 - 6 * sum((r1 - r2) * (r1 - r2))
                         / (count(*) * (count(*) * count(*) - 1.0)), 6)
           END AS spearman_rho
    FROM r
    GROUP BY source
    ORDER BY source
    """,
)
def spearman_signal_correlation(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Per-source SPEARMAN rank correlation between two per-document
    quality signals (type-token ratio vs mean word length) — the
    signal-agreement diagnostic a curator runs before trusting a
    cheap proxy signal to stand in for an expensive one (FineWeb's
    ablation methodology distilled to a query). rho = 1 - 6·Σd²/
    (n(n²-1)) over tie-broken ranks.

    Scale shape: signals are per-row arithmetic off one narrow scan;
    the two rank windows and the final rollup all partition by
    source, so everything rides ONE shuffle keyed on source (rank
    d² sums are integral — exact in double in both engines). Signals
    are rounded to 6 dp BEFORE ranking with doc_id tie-breaks, the
    same fp guard as every ranked oracle here."""
    docs = load_table(spark, sf_dir, "documents")
    words = F.array_remove(
        F.split(F.lower(F.col("text")), "[^a-z0-9]+"), ""
    )
    nw = F.greatest(F.size(words), F.lit(1))
    m = docs.select(
        "doc_id",
        "source",
        F.round(
            F.size(F.array_distinct(words)) / nw.cast("double"), 6
        ).alias("ttr"),
        F.round(F.col("n_chars") / nw.cast("double"), 6).alias("mwl"),
    )
    from pyspark.sql import Window

    w1 = Window.partitionBy("source").orderBy("ttr", "doc_id")
    w2 = Window.partitionBy("source").orderBy("mwl", "doc_id")
    r = m.select(
        "source",
        F.row_number().over(w1).cast("double").alias("r1"),
        F.row_number().over(w2).cast("double").alias("r2"),
    )
    n = F.count(F.lit(1))
    d2 = (F.col("r1") - F.col("r2")) * (F.col("r1") - F.col("r2"))
    return (
        r.groupBy("source")
        .agg(
            n.alias("n_docs"),
            # rho is undefined for a 1-doc source: the denominator
            # n(n^2-1) is 0, and the engines disagree on 0/0 (Spark
            # NULL, DuckDB NaN/inf) — emit NULL explicitly on both
            # (r4 ADVICE).
            F.when(
                n >= 2,
                F.round(
                    1 - 6 * F.sum(d2) / (n * (n * n - F.lit(1.0))), 6
                ),
            ).alias("spearman_rho"),
        )
        .orderBy("source")
    )


@query(
    "ks_drift_statistic",
    oracle="""
    WITH b AS (
        SELECT CAST(FLOOR(value) AS BIGINT) AS bin,
               COUNT(*) FILTER (WHERE user_id % 2 = 0) AS n0,
               COUNT(*) FILTER (WHERE user_id % 2 = 1) AS n1
        FROM events GROUP BY 1
    ),
    t AS (SELECT SUM(n0) AS t0, SUM(n1) AS t1 FROM b),
    c AS (
        SELECT bin,
               ROUND(ABS(SUM(n0) OVER (ORDER BY bin) * 1.0 / t0
                     - SUM(n1) OVER (ORDER BY bin) * 1.0 / t1), 6) AS d
        FROM b CROSS JOIN t
    )
    SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM b) AS n_bins,
           d AS ks_stat,
           bin AS ks_at_bin
    FROM c
    ORDER BY d DESC, bin
    LIMIT 1
    """,
)
def ks_drift_statistic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sample Kolmogorov-Smirnov drift between the same even/odd
    user cohorts ``distribution_psi_drift`` compares — but over a
    CONTINUOUS metric (event value), where PSI's categorical form
    does not apply. D = max |ECDF_0 - ECDF_1| evaluated on unit
    histogram bins: the binned KS is the standard streaming/-scale
    variant (exact KS needs a global sort of raw values; binning
    bounds the state at any corpus size, and the bin width is the
    resolution knob). Returns the statistic, the bin where the gap
    peaks (WHERE the distributions diverge — the actionable part),
    and the bin count.

    Scale shape: one map-side-combinable groupBy to the bin grain
    (bounded: value-range/width rows), then cumulative windows OVER
    THE BIN TABLE only (unpartitioned window over a bounded
    aggregate — allowlisted), a 1-row totals broadcast, and a
    TakeOrdered(1) argmax. The raw-event scan never sorts."""
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    b = (
        ev.groupBy(
            F.floor("value").cast("long").alias("bin")
        ).agg(
            F.count(F.when(F.col("user_id") % 2 == 0, 1)).alias("n0"),
            F.count(F.when(F.col("user_id") % 2 == 1, 1)).alias("n1"),
        )
    )
    t = b.agg(F.sum("n0").alias("t0"), F.sum("n1").alias("t1"))
    nb = b.agg(F.count("*").cast("long").alias("n_bins"))
    w = Window.orderBy("bin")
    d = F.round(
        F.abs(
            F.sum("n0").over(w) * 1.0 / F.col("t0")
            - F.sum("n1").over(w) * 1.0 / F.col("t1")
        ),
        6,
    )
    return (
        b.crossJoin(F.broadcast(t))
        .select("bin", d.alias("d"))
        .crossJoin(F.broadcast(nb))
        .select(
            "n_bins",
            F.col("d").alias("ks_stat"),
            F.col("bin").alias("ks_at_bin"),
        )
        .orderBy(F.desc("ks_stat"), "ks_at_bin")
        .limit(1)
    )


WINSOR_LO, WINSOR_HI = 0.05, 0.95


@query(
    "winsorized_stats",
    oracle=f"""
    WITH cuts AS (
        SELECT o_orderpriority AS priority,
               quantile_cont(o_totalprice, {WINSOR_LO}) AS lo,
               quantile_cont(o_totalprice, {WINSOR_HI}) AS hi
        FROM orders GROUP BY o_orderpriority
    ),
    clamped AS (
        SELECT c.priority,
               LEAST(GREATEST(o.o_totalprice, c.lo), c.hi) AS v,
               CASE WHEN o.o_totalprice < c.lo
                      OR o.o_totalprice > c.hi
                    THEN 1 ELSE 0 END AS clipped
        FROM orders o JOIN cuts c ON o.o_orderpriority = c.priority
    )
    SELECT priority,
           COUNT(*) AS n,
           ROUND(AVG(v), 4) AS wins_mean,
           ROUND(STDDEV_SAMP(v), 4) AS wins_stddev,
           CAST(SUM(clipped) AS BIGINT) AS n_clipped,
           ROUND(SUM(clipped) * 1.0 / COUNT(*), 6) AS clip_share
    FROM clamped
    GROUP BY priority
    ORDER BY priority
    """,
)
def winsorized_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winsorized (5%/95%-clamped) mean and stddev of order value per
    priority class — the robust-moments sibling of
    `mad_outlier_flags`: instead of FLAGGING the fat tail it CLAMPS
    it, which is what monitoring dashboards need when a handful of
    mega-orders would otherwise swamp a mean-shift alert. Reports the
    clamp counts so the clipping itself is auditable.

    Two passes over the group, both keyed on the group column: the
    exact per-group percentile aggregate (|groups| x 2 cutoff rows,
    broadcast back by AQE on the same key), then the clamped-moment
    aggregate (map-side combinable). Both engines use type-7
    interpolated quantiles, so the cutoffs — and therefore every
    clamped value — agree exactly; at 100 TB the one-line swap is
    `percentile_approx`, same as every exact-percentile query here."""
    orders = load_table(spark, sf_dir, "orders")
    qs = F.percentile(
        "o_totalprice", F.array(F.lit(WINSOR_LO), F.lit(WINSOR_HI))
    )
    cuts = (
        orders.groupBy(F.col("o_orderpriority").alias("priority"))
        .agg(qs.alias("qs"))
        .select(
            "priority",
            F.col("qs")[0].alias("lo"),
            F.col("qs")[1].alias("hi"),
        )
    )
    v = F.least(
        F.greatest(F.col("o_totalprice"), F.col("lo")), F.col("hi")
    )
    clipped = (
        (F.col("o_totalprice") < F.col("lo"))
        | (F.col("o_totalprice") > F.col("hi"))
    ).cast("int")
    return (
        orders.join(
            cuts,
            orders["o_orderpriority"] == cuts["priority"],
        )
        .select("priority", v.alias("v"), clipped.alias("clipped"))
        .groupBy("priority")
        .agg(
            F.count("*").alias("n"),
            F.round(F.avg("v"), 4).alias("wins_mean"),
            F.round(F.stddev_samp("v"), 4).alias("wins_stddev"),
            F.sum("clipped").cast("long").alias("n_clipped"),
            F.round(
                F.sum("clipped") * 1.0 / F.count("*"), 6
            ).alias("clip_share"),
        )
        .orderBy("priority")
    )


@query(
    "cms_heavy_hitters",
    oracle="""
    WITH w AS (
        SELECT word FROM (
            SELECT unnest(list_filter(
                string_split_regex(lower(text), '[^a-z0-9]+'),
                x -> x <> ''
            )) AS word
            FROM documents
        )
    ),
    exact AS (
        SELECT word, CAST(COUNT(*) AS BIGINT) AS exact_cnt
        FROM w GROUP BY word
    ),
    top AS (
        SELECT word, exact_cnt FROM exact
        ORDER BY exact_cnt DESC, word LIMIT 20
    ),
    rows_j AS (SELECT unnest([0, 1, 2]) AS j),
    cms AS (
        SELECT j,
               substr(md5('cms' || j || ':' || word), 1, 2) AS bucket,
               CAST(COUNT(*) AS BIGINT) AS cnt
        FROM w CROSS JOIN rows_j
        GROUP BY j, bucket
    ),
    est AS (
        SELECT t.word, MIN(c.cnt) AS cms_est
        FROM top t
        CROSS JOIN rows_j s
        JOIN cms c
          ON c.j = s.j
         AND c.bucket = substr(md5('cms' || s.j || ':' || t.word), 1, 2)
        GROUP BY t.word
    )
    SELECT t.word, t.exact_cnt, e.cms_est,
           e.cms_est - t.exact_cnt AS overestimate
    FROM top t JOIN est e ON t.word = e.word
    ORDER BY t.exact_cnt DESC, t.word
    """,
)
def cms_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-Min sketch frequency estimation, validated against exact
    counts for the top-20 heavy hitters (Cormode & Muthukrishnan;
    the streaming-frequency primitive behind every "top queries /
    top tokens without a full groupBy" dashboard).

    Sketch: d=3 hash rows x w=256 buckets, the (j, bucket) cell
    holding the total occurrence count of all words landing there;
    a word's estimate is the MIN over its 3 cells — always an
    OVERestimate (collisions only add), which the `overestimate`
    column makes visible. Buckets are the first 2 hex chars of
    md5('cms'||j||':'||word) — the engine-portable hash
    (portable-oracle contract), string-keyed to avoid hex->int.

    Scale shape — the whole point of CMS at 100 TB: the sketch is
    a CONSTANT 768 cells regardless of corpus size, built in one
    map-side-combinable pass over the exploded words (the explode x3
    rides the same scan); the exact side here exists only to grade
    the estimate. The top-20 probe set joins the 768-row sketch as
    a broadcast. In production the exact groupBy is the thing you
    DROP — the sketch alone answers point frequency queries with
    eps=e/256 additive error at delta=e^-3 confidence."""
    docs = load_table(spark, sf_dir, "documents")
    words = docs.select(
        F.explode(
            F.array_remove(
                F.split(F.lower(F.col("text")), "[^a-z0-9]+"), ""
            )
        ).alias("word")
    )
    exact = words.groupBy("word").agg(F.count("*").alias("exact_cnt"))
    top = exact.orderBy(F.desc("exact_cnt"), "word").limit(20)
    rows_j = F.explode(F.array(F.lit(0), F.lit(1), F.lit(2))).alias("j")
    bucket_of = lambda word_col: F.substring(  # noqa: E731
        F.md5(
            F.concat(
                F.lit("cms"),
                F.col("j").cast("string"),
                F.lit(":"),
                word_col,
            )
        ),
        1,
        2,
    )
    cms = (
        words.select("word", rows_j)
        .select("j", bucket_of(F.col("word")).alias("bucket"))
        .groupBy("j", "bucket")
        .agg(F.count("*").alias("cnt"))
    )
    probe = top.select("word", "exact_cnt", rows_j).select(
        "word", "exact_cnt", "j", bucket_of(F.col("word")).alias("bucket")
    )
    return (
        probe.join(F.broadcast(cms), ["j", "bucket"])
        .groupBy("word", "exact_cnt")
        .agg(F.min("cnt").alias("cms_est"))
        .select(
            "word",
            "exact_cnt",
            "cms_est",
            (F.col("cms_est") - F.col("exact_cnt")).alias("overestimate"),
        )
        .orderBy(F.desc("exact_cnt"), "word")
    )


@query(
    "equidepth_histogram",
    oracle="""
    WITH cuts AS (
        SELECT o_orderpriority,
               ROUND(quantile_cont(o_totalprice, 0.25), 6) AS c1,
               ROUND(quantile_cont(o_totalprice, 0.50), 6) AS c2,
               ROUND(quantile_cont(o_totalprice, 0.75), 6) AS c3
        FROM orders GROUP BY o_orderpriority
    ),
    bucketed AS (
        SELECT o.o_orderpriority,
               CASE WHEN o.o_totalprice <= c.c1 THEN 1
                    WHEN o.o_totalprice <= c.c2 THEN 2
                    WHEN o.o_totalprice <= c.c3 THEN 3
                    ELSE 4 END AS bucket,
               o.o_totalprice
        FROM orders o JOIN cuts c
          ON o.o_orderpriority = c.o_orderpriority
    )
    SELECT o_orderpriority, bucket,
           CAST(COUNT(*) AS BIGINT) AS n,
           ROUND(MIN(o_totalprice), 6) AS lo,
           ROUND(MAX(o_totalprice), 6) AS hi
    FROM bucketed
    GROUP BY o_orderpriority, bucket
    ORDER BY o_orderpriority, bucket
    """,
)
def equidepth_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-DEPTH histogram per group: quartile cutoffs computed as
    per-group aggregates, broadcast back, rows bucketed with CASE —
    each bucket holds ~25% of its group (the optimizer-statistics
    histogram form; `price_histogram` is the equi-WIDTH sibling).

    This is the percentile-threshold-broadcast pattern the round-5
    selection-query rewrites established (lm_perplexity_buckets),
    promoted to a first-class operator: NO global rank, NO
    unpartitioned window — the only corpus-grain work is one
    percentile aggregate per group (map-side partial) and one
    broadcast-join + CASE pass. At 100 TB swap `percentile` for
    `percentile_approx` (same shape, bounded memory; documented
    trade per SURVEY §2.5). Cutoffs rounded at 6 dp before the
    boundary compare on BOTH engines so edge rows bucket
    identically."""
    orders = load_table(spark, sf_dir, "orders")
    cuts = orders.groupBy("o_orderpriority").agg(
        F.round(F.percentile("o_totalprice", F.lit(0.25)), 6).alias("c1"),
        F.round(F.percentile("o_totalprice", F.lit(0.50)), 6).alias("c2"),
        F.round(F.percentile("o_totalprice", F.lit(0.75)), 6).alias("c3"),
    )
    bucket = (
        F.when(F.col("o_totalprice") <= F.col("c1"), 1)
        .when(F.col("o_totalprice") <= F.col("c2"), 2)
        .when(F.col("o_totalprice") <= F.col("c3"), 3)
        .otherwise(4)
    )
    return (
        orders.join(F.broadcast(cuts), "o_orderpriority")
        .select("o_orderpriority", bucket.alias("bucket"), "o_totalprice")
        .groupBy("o_orderpriority", "bucket")
        .agg(
            F.count("*").alias("n"),
            F.round(F.min("o_totalprice"), 6).alias("lo"),
            F.round(F.max("o_totalprice"), 6).alias("hi"),
        )
        # r12: trailing sort cut (20-row output; the driver hashes
        # row-sorted values — same cut as the r11 floor-bound queries)
    )


KMV_K = 64  # k-minimum-values sketch size for the portable theta twin


def _kmv_oracle() -> str:
    """Unrolled oracle for theta_overlap_portable: KMV sketches over
    md5 hex strings (identical in both engines, and hex chars sort
    the same), pairwise theta = the lexicographic MIN of the two
    sketch thresholds, set algebra on the surviving values. A side
    with fewer than K distinct members keeps an 'exact' sentinel
    threshold ('g' sorts above every hex char) so its values are all
    retained and the estimator degrades to the exact count."""
    nib = lambda p: (  # noqa: E731
        f"(strpos('0123456789abcdef', substr(th, {p}, 1)) - 1)"
    )
    frac = (
        f"(({nib(1)} * 65536.0 + {nib(2)} * 4096.0 + {nib(3)} * 256.0"
        f" + {nib(4)} * 16.0 + {nib(5)} + 0.5) / 1048576.0)"
    )
    return f"""
    WITH du AS (
        SELECT DISTINCT event_type AS t, user_id AS u FROM events
    ),
    hs AS (
        SELECT t, md5('u:' || CAST(u AS VARCHAR)) AS h FROM du
    ),
    sk AS MATERIALIZED (
        SELECT t, h FROM hs
        QUALIFY ROW_NUMBER() OVER (PARTITION BY t ORDER BY h)
                <= {KMV_K}
    ),
    th AS (
        SELECT t,
               CASE WHEN COUNT(*) >= {KMV_K} THEN MAX(h)
                    ELSE 'g' END AS theta_h
        FROM sk GROUP BY t
    ),
    pairs AS (
        SELECT a, b, th,
               CASE WHEN th = 'g' THEN 1.0 ELSE {frac} END AS theta
        FROM (
            SELECT a.t AS a, b.t AS b,
                   LEAST(ta.theta_h, tb.theta_h) AS th
            FROM (SELECT DISTINCT t FROM sk) a
            JOIN (SELECT DISTINCT t FROM sk) b ON a.t < b.t
            JOIN th ta ON ta.t = a.t
            JOIN th tb ON tb.t = b.t
        )
    ),
    m AS (
        SELECT p.a, p.b, p.theta, s.h,
               MAX(CASE WHEN s.t = p.a THEN 1 ELSE 0 END) AS in_a,
               MAX(CASE WHEN s.t = p.b THEN 1 ELSE 0 END) AS in_b
        FROM pairs p
        JOIN sk s ON s.t IN (p.a, p.b) AND s.h < p.th
        GROUP BY 1, 2, 3, 4
    ),
    est AS (
        SELECT a, b,
               ANY_VALUE(theta) AS theta,
               COUNT(*) AS u_cnt,
               SUM(in_a * in_b) AS i_cnt,
               SUM(in_a * (1 - in_b)) AS d_cnt
        FROM m GROUP BY a, b
    )
    SELECT a, b,
           ROUND(u_cnt / theta, 4) AS union_est,
           ROUND(i_cnt / theta, 4) AS intersect_est,
           ROUND(d_cnt / theta, 4) AS a_minus_b_est
    FROM est
    ORDER BY a, b
    """


@query("theta_overlap_portable", oracle=_kmv_oracle())
def theta_overlap_portable(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Value-verified theta-sketch set algebra — the portable oracled
    twin of `theta_audience_overlap` (whose Spark 4.1 Theta sketch
    binaries are engine-local). Same union / intersection /
    difference estimates per event-type pair, built from first
    principles as K-MINIMUM-VALUES sketches: each audience keeps its
    64 (KMV_K) lexicographically smallest md5(user) hex values; a
    pair's theta is the smaller of the two sketch thresholds; the
    values below theta form an unbiased sample of the union, and
    counting which side(s) each belongs to yields all three
    estimates as count/theta — the original theta-sketch estimator
    (Dasgupta et al.), replayed hash-for-hash by DuckDB because md5
    hex strings and their sort order are identical in both engines.

    Scale shape: ONE distinct + per-type top-K (partitioned window
    over the audience key); everything downstream operates on K
    rows per type — sketches are the mergeable ingest-time state,
    exactly like the production theta rollup. A side with < K
    members keeps the 'g' sentinel threshold (sorts above any hex),
    making its estimates exact — the KMV small-set contract."""
    events = load_table(spark, sf_dir, "events")
    du = events.select(
        F.col("event_type").alias("t"), F.col("user_id").alias("u")
    ).distinct()
    hs = du.select(
        "t", F.md5(F.concat(F.lit("u:"), F.col("u").cast("string"))).alias("h")
    )
    w = Window.partitionBy("t").orderBy("h")
    sk = (
        hs.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= KMV_K)
        .drop("rn")
    )
    th = sk.groupBy("t").agg(
        F.when(F.count("*") >= KMV_K, F.max("h"))
        .otherwise(F.lit("g"))
        .alias("theta_h")
    )
    types = sk.select("t").distinct()
    pairs = (
        types.select(F.col("t").alias("a"))
        .join(types.select(F.col("t").alias("b")), F.col("a") < F.col("b"))
        .join(
            F.broadcast(th.select(F.col("t").alias("a"), F.col("theta_h").alias("tha"))),
            "a",
        )
        .join(
            F.broadcast(th.select(F.col("t").alias("b"), F.col("theta_h").alias("thb"))),
            "b",
        )
        .select("a", "b", F.least("tha", "thb").alias("th"))
    )
    m = (
        pairs.join(
            sk.select(F.col("t").alias("st"), "h"),
            (
                (F.col("st") == F.col("a")) | (F.col("st") == F.col("b"))
            )
            & (F.col("h") < F.col("th")),
        )
        .groupBy("a", "b", "th", "h")
        .agg(
            F.max(
                F.when(F.col("st") == F.col("a"), 1).otherwise(0)
            ).alias("in_a"),
            F.max(
                F.when(F.col("st") == F.col("b"), 1).otherwise(0)
            ).alias("in_b"),
        )
    )
    nibp = lambda p: (  # noqa: E731
        F.position(
            F.substring(F.col("th"), p, 1), F.lit("0123456789abcdef")
        ).cast("double")
        - 1.0
    )
    frac = (
        nibp(1) * 65536.0
        + nibp(2) * 4096.0
        + nibp(3) * 256.0
        + nibp(4) * 16.0
        + nibp(5)
        + 0.5
    ) / 1048576.0
    est = m.groupBy("a", "b").agg(
        F.when(F.first("th") == "g", F.lit(1.0))
        .otherwise(F.first(frac))
        .alias("theta"),
        F.count("*").alias("u_cnt"),
        F.sum(F.col("in_a") * F.col("in_b")).alias("i_cnt"),
        F.sum(F.col("in_a") * (1 - F.col("in_b"))).alias("d_cnt"),
    )
    return est.select(
        "a",
        "b",
        F.round(F.col("u_cnt") / F.col("theta"), 4).alias("union_est"),
        F.round(F.col("i_cnt") / F.col("theta"), 4).alias(
            "intersect_est"
        ),
        F.round(F.col("d_cnt") / F.col("theta"), 4).alias(
            "a_minus_b_est"
        ),
    ).orderBy("a", "b")


HLL_M = 256  # registers = first 2 md5 nibbles
HLL_ALPHA = 0.7182725932  # 0.7213 / (1 + 1.079/m) for m=256
HLL_REST_LEN = 14  # rank nibbles examined after the bucket prefix


def _hllp_oracle() -> str:
    """Unrolled oracle for hll_distinct_portable: Flajolet's HLL
    built from md5 nibbles — bucket = first 2 hex chars (256
    registers), rank = 1 + leading zero BITS of the next 14 nibbles
    (4 per leading '0' char + 0-3 inside the first non-zero nibble).
    Registers, the harmonic sum, and the small-range linear-counting
    correction are plain arithmetic both engines compute on the
    identical integers."""
    v1 = "(strpos('0123456789abcdef', substr(tr, 1, 1)) - 1)"
    lz = (
        f"CASE WHEN {v1} >= 8 THEN 0 WHEN {v1} >= 4 THEN 1 "
        f"WHEN {v1} >= 2 THEN 2 ELSE 3 END"
    )
    return f"""
    WITH du AS (
        SELECT DISTINCT event_type AS t, user_id AS u FROM events
    ),
    hs AS (
        SELECT t, md5('u:' || CAST(u AS VARCHAR)) AS h FROM du
    ),
    ranked AS (
        SELECT t, substr(h, 1, 2) AS bucket,
               CASE WHEN tr = '' THEN 4 * {HLL_REST_LEN} + 1
                    ELSE 4 * ({HLL_REST_LEN} - length(tr)) + {lz} + 1
               END AS rank
        FROM (
            SELECT t, h,
                   trim(LEADING '0' FROM substr(h, 3, {HLL_REST_LEN}))
                       AS tr
            FROM hs
        )
    ),
    regs AS (
        SELECT t, bucket, MAX(rank) AS m
        FROM ranked GROUP BY 1, 2
    ),
    folded AS (
        SELECT t,
               SUM(POWER(2.0, -m)) + ({HLL_M} - COUNT(*)) * 1.0 AS s,
               {HLL_M} - COUNT(*) AS v
        FROM regs GROUP BY t
    ),
    est AS (
        SELECT t, v,
               {HLL_ALPHA} * {HLL_M} * {HLL_M} / s AS e_raw
        FROM folded
    ),
    corrected AS (
        SELECT t,
               CASE WHEN e_raw <= 2.5 * {HLL_M} AND v > 0
                    THEN {HLL_M} * ln({HLL_M} * 1.0 / v)
                    ELSE e_raw END AS e
        FROM est
    ),
    exact AS (
        SELECT t, CAST(COUNT(*) AS BIGINT) AS exact_users FROM du
        GROUP BY t
    )
    SELECT c.t AS event_type, x.exact_users,
           ROUND(c.e, 4) AS hll_est,
           ROUND(ABS(c.e - x.exact_users) / x.exact_users, 4)
               AS rel_err
    FROM corrected c JOIN exact x ON x.t = c.t
    ORDER BY c.t
    """


@query("hll_distinct_portable", oracle=_hllp_oracle())
def hll_distinct_portable(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Value-verified HyperLogLog — the portable oracled twin of
    `sketch_rollup`'s approx_count_distinct/HLL leg (whose register
    binaries are engine-local). Flajolet et al.'s estimator built
    from first principles on md5: bucket = the first 2 hex nibbles
    (m=256 registers), rank = 1 + leading zero bits of the next 14
    nibbles, registers fold with MAX (the mergeable ingest-time
    state — a 256-int vector per audience at ANY corpus size), the
    harmonic-mean estimate with the small-range linear-counting
    correction, all replayed on identical integers by DuckDB. The
    published exact count and relative error make the sketch's
    accuracy contract (~1.04/sqrt(256) ~ 6.5%) auditable per row.

    Scale shape: one distinct + one (audience, bucket) MAX aggregate
    + one 256-row fold per audience — map-side combinable
    everywhere, no windows, no driver state."""
    events = load_table(spark, sf_dir, "events")
    du = events.select(
        F.col("event_type").alias("t"), F.col("user_id").alias("u")
    ).distinct()
    hs = du.select(
        "t",
        F.md5(F.concat(F.lit("u:"), F.col("u").cast("string"))).alias(
            "h"
        ),
    )
    tr = F.expr(
        f"trim(LEADING '0' FROM substr(h, 3, {HLL_REST_LEN}))"
    )
    v1 = (
        F.position(
            F.substring(F.col("tr"), 1, 1), F.lit("0123456789abcdef")
        )
        - 1
    )
    lz = (
        F.when(v1 >= 8, 0)
        .when(v1 >= 4, 1)
        .when(v1 >= 2, 2)
        .otherwise(3)
    )
    ranked = hs.withColumn("tr", tr).select(
        "t",
        F.substring("h", 1, 2).alias("bucket"),
        F.when(
            F.col("tr") == "", F.lit(4 * HLL_REST_LEN + 1)
        )
        .otherwise(
            4 * (HLL_REST_LEN - F.length("tr")) + lz + 1
        )
        .alias("rank"),
    )
    regs = ranked.groupBy("t", "bucket").agg(
        F.max("rank").alias("m")
    )
    folded = regs.groupBy("t").agg(
        (
            F.sum(F.pow(F.lit(2.0), -F.col("m")))
            + (HLL_M - F.count("*")) * F.lit(1.0)
        ).alias("s"),
        (HLL_M - F.count("*")).alias("v"),
    )
    est = folded.select(
        "t",
        "v",
        (F.lit(HLL_ALPHA) * HLL_M * HLL_M / F.col("s")).alias("e_raw"),
    )
    corrected = est.select(
        "t",
        F.when(
            (F.col("e_raw") <= 2.5 * HLL_M) & (F.col("v") > 0),
            HLL_M * F.log(HLL_M * 1.0 / F.col("v")),
        )
        .otherwise(F.col("e_raw"))
        .alias("e"),
    )
    exact = du.groupBy("t").agg(F.count("*").alias("exact_users"))
    return (
        corrected.join(exact, "t")
        .select(
            F.col("t").alias("event_type"),
            "exact_users",
            F.round(F.col("e"), 4).alias("hll_est"),
            F.round(
                F.abs(F.col("e") - F.col("exact_users"))
                / F.col("exact_users"),
                4,
            ).alias("rel_err"),
        )
        .orderBy("event_type")
    )


BKQ_K = 256  # bottom-k uniform-sample size for the quantile twin


@query(
    "bottomk_sample_quantiles",
    oracle=f"""
    WITH keyed AS (
        SELECT o_totalprice,
               md5('q:' || CAST(o_orderkey AS VARCHAR)) AS h
        FROM orders
    ),
    sample AS (
        SELECT o_totalprice FROM keyed
        QUALIFY ROW_NUMBER() OVER (ORDER BY h) <= {BKQ_K}
    ),
    est AS (
        SELECT ROUND(quantile_cont(o_totalprice, 0.25), 4) AS e25,
               ROUND(quantile_cont(o_totalprice, 0.50), 4) AS e50,
               ROUND(quantile_cont(o_totalprice, 0.75), 4) AS e75,
               ROUND(quantile_cont(o_totalprice, 0.90), 4) AS e90
        FROM sample
    ),
    exact AS (
        SELECT ROUND(quantile_cont(o_totalprice, 0.50), 4) AS x50,
               ROUND(quantile_cont(o_totalprice, 0.90), 4) AS x90
        FROM orders
    )
    SELECT e.e25 AS p25_est, e.e50 AS p50_est,
           e.e75 AS p75_est, e.e90 AS p90_est,
           x.x50 AS p50_exact, x.x90 AS p90_exact,
           ROUND(ABS(e.e50 - x.x50) / x.x50, 4) AS p50_rel_err,
           ROUND(ABS(e.e90 - x.x90) / x.x90, 4) AS p90_rel_err
    FROM est e CROSS JOIN exact x
    """,
)
def bottomk_sample_quantiles(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Value-verified mergeable quantile estimation — the portable
    oracled twin of `sketch_rollup`'s KLL leg (whose compaction
    randomness is engine-local). The sketch here is the BOTTOM-K
    sample: the 256 (BKQ_K) rows with the smallest md5(orderkey) —
    a uniform sample of the table that is deterministic, mergeable
    (union two sketches, keep the k smallest keys), and identical in
    both engines; quantiles interpolated over the sample estimate
    the population's, and the published exact p50/p90 with relative
    errors make the accuracy auditable per run (~1/sqrt(k) class
    error, like KLL at similar budget).

    Scale shape: ONE TakeOrdered(k) over per-row hashes builds the
    sketch (map-side top-k partials, no full shuffle), the estimate
    folds 256 rows; the exact side exists only for the audit and
    would be dropped in production."""
    orders = load_table(spark, sf_dir, "orders")
    keyed = orders.select(
        "o_totalprice",
        F.md5(
            F.concat(F.lit("q:"), F.col("o_orderkey").cast("string"))
        ).alias("h"),
    )
    sample = keyed.orderBy("h").limit(BKQ_K)
    pct = [0.25, 0.50, 0.75, 0.90]
    qs = F.percentile(
        "o_totalprice", F.array(*[F.lit(p) for p in pct])
    )
    est = sample.agg(qs.alias("qs")).select(
        F.round(F.col("qs")[0], 4).alias("p25_est"),
        F.round(F.col("qs")[1], 4).alias("p50_est"),
        F.round(F.col("qs")[2], 4).alias("p75_est"),
        F.round(F.col("qs")[3], 4).alias("p90_est"),
    )
    exact = orders.agg(
        F.percentile(
            "o_totalprice", F.array(F.lit(0.50), F.lit(0.90))
        ).alias("xs")
    ).select(
        F.round(F.col("xs")[0], 4).alias("p50_exact"),
        F.round(F.col("xs")[1], 4).alias("p90_exact"),
    )
    return est.join(F.broadcast(exact)).select(
        "p25_est",
        "p50_est",
        "p75_est",
        "p90_est",
        "p50_exact",
        "p90_exact",
        F.round(
            F.abs(F.col("p50_est") - F.col("p50_exact"))
            / F.col("p50_exact"),
            4,
        ).alias("p50_rel_err"),
        F.round(
            F.abs(F.col("p90_est") - F.col("p90_exact"))
            / F.col("p90_exact"),
            4,
        ).alias("p90_rel_err"),
    )


def categorical_mi(df: DataFrame, a: str, b: str, label: str) -> DataFrame:
    """Library core of `categorical_mutual_information` (api.stats.
    categorical_mi): one summary row with the mutual information
    I(a;b), the marginal entropies H(a)/H(b) (nats), and the
    normalized MI I/sqrt(H(a)H(b)) for a pair of categorical
    columns.

    r13 (guide §1.2/§2.4): ONE joint aggregate (map-side combined,
    bounded by |a| x |b| — the category domains) is collected and the
    marginals/entropies/NMI derive from it DRIVER-SIDE — the r12/r13
    sufficient-statistics pattern (pca/gmm precedent). The previous
    form scanned the corpus 4x (joint + both marginals + count) and
    scheduled ~15 broadcast-exchange jobs per table for five scalar
    outputs; marginals are column sums of the joint, so those passes
    were pure re-reads. 6-dp rounding absorbs summation-order noise,
    same contract as every portable fit. NOTE: collection makes this
    helper EAGER at build time (bounded rows — the registered-query
    entry point is the intended caller)."""
    from ..functions.rounding import spark_round
    from ..sources.tables import literal_frame

    spark = df.sparkSession
    out_schema = (
        "pair string, mi double, h_a double, h_b double, nmi double"
    )
    rows = df.groupBy(a, b).agg(F.count("*").alias("c")).collect()
    if not rows:
        # empty input: every aggregate in the old plan returned NULL
        return literal_frame(
            spark, out_schema, [(label, None, None, None, None)]
        )
    # deterministic fold order (collect order follows partitioning)
    cells = sorted(
        ((r[a], r[b], r["c"]) for r in rows),
        key=lambda t: (repr(t[0]), repr(t[1])),
    )
    n = float(sum(c for _, _, c in cells))
    ca: dict = {}
    cb: dict = {}
    for va, vb, c in cells:
        ca[va] = ca.get(va, 0) + c
        cb[vb] = cb.get(vb, 0) + c
    import math

    mi_raw = sum(
        (c / n) * math.log(c * n / (ca[va] * cb[vb]))
        for va, vb, c in cells
    )
    ha_raw = sum(
        -(x / n) * math.log(x / n) for x in ca.values()
    )
    hb_raw = sum(
        -(x / n) * math.log(x / n) for x in cb.values()
    )
    denom = math.sqrt(ha_raw * hb_raw)
    # Spark's double Divide returns NULL on a zero divisor
    nmi = None if denom == 0.0 else spark_round(mi_raw / denom)
    return literal_frame(
        spark,
        out_schema,
        [
            (
                label,
                spark_round(mi_raw),
                spark_round(ha_raw),
                spark_round(hb_raw),
                nmi,
            )
        ],
    )


def _mi_sql(table: str, a: str, b: str, label: str) -> str:
    return f"""
    SELECT '{label}' AS pair,
           ROUND(SUM((c * 1.0 / n) * ln(c * 1.0 * n / (ca * cb))), 6)
               AS mi,
           ROUND((SELECT SUM(-(ca * 1.0 / n) * ln(ca * 1.0 / n))
                  FROM (SELECT {a}, COUNT(*) AS ca FROM {table}
                        GROUP BY 1)
                  CROSS JOIN (SELECT COUNT(*) AS n FROM {table})), 6)
               AS h_a,
           ROUND((SELECT SUM(-(cb * 1.0 / n) * ln(cb * 1.0 / n))
                  FROM (SELECT {b}, COUNT(*) AS cb FROM {table}
                        GROUP BY 1)
                  CROSS JOIN (SELECT COUNT(*) AS n FROM {table})), 6)
               AS h_b,
           ROUND(SUM((c * 1.0 / n) * ln(c * 1.0 * n / (ca * cb)))
                 / sqrt((SELECT SUM(-(ca * 1.0 / n) * ln(ca * 1.0 / n))
                         FROM (SELECT {a}, COUNT(*) AS ca FROM {table}
                               GROUP BY 1)
                         CROSS JOIN (SELECT COUNT(*) AS n FROM {table}))
                        * (SELECT SUM(-(cb * 1.0 / n) * ln(cb * 1.0 / n))
                           FROM (SELECT {b}, COUNT(*) AS cb FROM {table}
                                 GROUP BY 1)
                           CROSS JOIN (SELECT COUNT(*) AS n
                                       FROM {table}))), 6) AS nmi
    FROM (
        SELECT j.c, ma.ca, mb.cb, t.n
        FROM (SELECT {a}, {b}, COUNT(*) AS c FROM {table}
              GROUP BY 1, 2) j
        JOIN (SELECT {a}, COUNT(*) AS ca FROM {table} GROUP BY 1) ma
             USING ({a})
        JOIN (SELECT {b}, COUNT(*) AS cb FROM {table} GROUP BY 1) mb
             USING ({b})
        CROSS JOIN (SELECT COUNT(*) AS n FROM {table}) t
    )
    """


@query(
    "categorical_mutual_information",
    oracle=(
        _mi_sql("documents", "lang", "source", "documents:lang~source")
        + " UNION ALL "
        + _mi_sql(
            "orders",
            "o_orderstatus",
            "o_orderpriority",
            "orders:status~priority",
        )
        + " ORDER BY pair"
    ),
)
def categorical_mutual_information(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Mutual information between categorical column pairs — the
    association screen a curator runs before trusting a slice or a
    stratification: I(a;b) in nats says how much knowing one column
    narrows the other (0 = independent), and the normalized
    I/sqrt(H(a)H(b)) makes pairs comparable across domains (the
    feature-selection score scikit's mutual_info / a chi-square
    screen approximate). Audited here: does a document's language
    predict its source (sampling entanglement a mixture plan must
    break), and does an order's status predict its priority.

    Scale shape: everything computes on joint/marginal aggregates
    bounded by the category domains (|a| x |b| rows, never
    corpus-grain); the corpus is scanned once per aggregate with
    map-side combine, and all joins are broadcasts of those bounded
    tables."""
    docs = load_table(spark, sf_dir, "documents")
    orders = load_table(spark, sf_dir, "orders")
    return (
        categorical_mi(docs, "lang", "source", "documents:lang~source")
        .unionAll(
            categorical_mi(
                orders,
                "o_orderstatus",
                "o_orderpriority",
                "orders:status~priority",
            )
        )
        .orderBy("pair")
    )


BOOT_REPS = 64  # deterministic Poisson bootstrap replicates
_BOOT_HEX = "0123456789abcdef"
# 256-bucket quantization of Poisson(1): P(0)=94/256, P(1)=94/256,
# P(2)=47/256, P(3)=16/256, P(4)=4/256, P(5)=1/256
_BOOT_CUTS = [(94, 0), (188, 1), (235, 2), (251, 3), (255, 4), (256, 5)]


def _boot_w_sql(h: str) -> str:
    return (
        "CASE "
        + " ".join(
            f"WHEN {h} < {cut} THEN {w}" for cut, w in _BOOT_CUTS
        )
        + " END"
    )


@query(
    "ab_lift_bootstrap",
    oracle=f"""
    WITH base AS (
        SELECT o_orderkey AS id, o_totalprice AS x,
               CASE WHEN substr(md5(CAST(o_orderkey AS VARCHAR)), 1, 1)
                    < '8' THEN 'A' ELSE 'B' END AS cohort
        FROM orders
    ),
    obs AS (
        SELECT
            CAST(COUNT(*) FILTER (WHERE cohort = 'A') AS BIGINT) AS n_a,
            CAST(COUNT(*) FILTER (WHERE cohort = 'B') AS BIGINT) AS n_b,
            ROUND(AVG(x) FILTER (WHERE cohort = 'A'), 2) AS mean_a,
            ROUND(AVG(x) FILTER (WHERE cohort = 'B'), 2) AS mean_b
        FROM base
    ),
    digs AS (
        SELECT b.cohort, b.x, d.d,
               md5(CAST(d.d AS VARCHAR) || ':'
                   || CAST(b.id AS VARCHAR)) AS dig
        FROM base b
        CROSS JOIN (SELECT unnest(range({BOOT_REPS // 16})) AS d) d
    ),
    weighted AS (
        SELECT cohort, x, d * 16 + j.j AS r,
               (strpos('{_BOOT_HEX}',
                       substr(dig, j.j * 2 + 1, 1)) - 1) * 16
               + strpos('{_BOOT_HEX}',
                        substr(dig, j.j * 2 + 2, 1)) - 1 AS h
        FROM digs
        CROSS JOIN (SELECT unnest(range(16)) AS j) j
    ),
    reps AS (
        SELECT r,
               ROUND(SUM(CASE WHEN cohort = 'A'
                              THEN {_boot_w_sql('h')} * x END)
                     / SUM(CASE WHEN cohort = 'A'
                                THEN {_boot_w_sql('h')} END), 2) AS ma,
               ROUND(SUM(CASE WHEN cohort = 'B'
                              THEN {_boot_w_sql('h')} * x END)
                     / SUM(CASE WHEN cohort = 'B'
                                THEN {_boot_w_sql('h')} END), 2) AS mb
        FROM weighted
        GROUP BY r
    ),
    ci AS (
        SELECT ROUND(quantile_cont((mb - ma) / ma, 0.025), 6) AS ci_lo,
               ROUND(quantile_cont((mb - ma) / ma, 0.975), 6) AS ci_hi
        FROM reps
    )
    SELECT o.n_a, o.n_b, o.mean_a, o.mean_b,
           ROUND((o.mean_b - o.mean_a) / o.mean_a, 6) AS lift,
           c.ci_lo, c.ci_hi,
           (c.ci_lo > 0 OR c.ci_hi < 0) AS significant
    FROM obs o CROSS JOIN ci c
    """,
)
def ab_lift_bootstrap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort lift with a bootstrap confidence interval — the
    uncertainty quantification every A/B readout and every
    data-mixture comparison needs before acting on a mean
    difference. RNG-free and shuffle-stable by construction: the
    64-replicate Poisson bootstrap (the streaming-friendly bootstrap
    — per-row weight ~ Poisson(1), no resampling pass) draws each
    weight from a 256-bucket md5 quantization of the Poisson(1) pmf
    (94/94/47/16/4/1), so both engines, and any re-run at any
    parallelism, produce the IDENTICAL interval. One 32-hex digest
    holds 16 independent two-hex draws, so each row hashes only
    BOOT_REPS/16 = 4 digests (md5 of 'd:id', d = replicate block) and
    the 64 replicate weights are SLICED from them — a measured ~16x
    cut of the dominant per-row CPU term vs one digest per replicate
    (r8 verdict #2), mirrored position-for-position in the oracle.
    Replicate means round at 2 dp (a money metric) before the lift
    ratio so cross-engine fp association noise in the big sums cannot
    flip a quantile. Reports observed means, lift, the 95% percentile
    CI, and the decision flag (CI excludes 0).

    Scale shape: a 4x digest generate then a 16x slice generate (no
    shuffle in either) into a map-side-combinable (replicate, cohort)
    aggregate — 128 output rows at ANY corpus size — then a bounded
    percentile over 64 replicate lifts. This is the
    bag-of-little-bootstraps shape: resampling cost rides the
    existing scan."""
    orders = load_table(spark, sf_dir, "orders")
    base = orders.select(
        F.col("o_orderkey").alias("id"),
        F.col("o_totalprice").alias("x"),
        F.when(
            F.substring(F.md5(F.col("o_orderkey").cast("string")), 1, 1)
            < "8",
            "A",
        )
        .otherwise("B")
        .alias("cohort"),
    )
    obs = base.agg(
        F.sum(F.when(F.col("cohort") == "A", 1).otherwise(0))
        .cast("bigint")
        .alias("n_a"),
        F.sum(F.when(F.col("cohort") == "B", 1).otherwise(0))
        .cast("bigint")
        .alias("n_b"),
        F.round(F.avg(F.when(F.col("cohort") == "A", F.col("x"))), 2).alias(
            "mean_a"
        ),
        F.round(F.avg(F.when(F.col("cohort") == "B", F.col("x"))), 2).alias(
            "mean_b"
        ),
    )
    # r13 (guide §4.2/§2.3): the 64x replicate expansion was a 4x
    # digest Generate + a 16x slice Generate + a hash aggregate over
    # 64 rows PER INPUT ROW (9.6M rows into the exchange at sf0.1) —
    # the suite's highest-CPU tail entry (8-core ratio 1.38). Now one
    # mapInArrow pass computes per-task partial (sum w*x, sum w) for
    # all 64 replicates x 2 cohorts: the replicate draws are byte j
    # of md5(d:id).digest() (== the 2-hex-char slice, verified
    # bit-identical), weights come from a 256-entry LUT of the same
    # Poisson quantization, and only O(replicates) partials leave
    # each task. The replicate means, percentile interpolation (the
    # exact lower*(1-frac)+higher*frac form F.percentile uses) and
    # the 2-dp/6-dp roundings are replayed bit-faithfully driver-side
    # (Decimal HALF_UP = F.round); the CI literals re-enter the plan
    # and are rounded by F.round as before.
    import hashlib

    import numpy as np
    import pyarrow as pa

    lut = np.zeros(256, dtype=np.float64)
    prev_cut = 0
    for cut, wv in _BOOT_CUTS:
        lut[prev_cut:cut] = wv
        prev_cut = cut
    n_blocks = BOOT_REPS // 16

    def _boot_partials(batches):
        swx = np.zeros((2, BOOT_REPS))
        sw = np.zeros((2, BOOT_REPS))
        for b in batches:
            ids = b.column("id").to_pylist()
            xs = b.column("x").to_numpy(zero_copy_only=False)
            is_a = b.column("is_a").to_numpy(zero_copy_only=False)
            if not ids:
                continue
            hb = np.empty((len(ids), BOOT_REPS), dtype=np.uint8)
            for i, rid in enumerate(ids):
                sid = str(rid)
                for d in range(n_blocks):
                    hb[i, d * 16 : (d + 1) * 16] = np.frombuffer(
                        hashlib.md5(
                            f"{d}:{sid}".encode()
                        ).digest(),
                        dtype=np.uint8,
                    )
            w = lut[hb]  # (rows, 64) replicate weights
            for side, mask in ((0, is_a), (1, ~is_a)):
                if mask.any():
                    swx[side] += (w[mask] * xs[mask, None]).sum(axis=0)
                    sw[side] += w[mask].sum(axis=0)
        yield pa.RecordBatch.from_arrays(
            [
                pa.array(
                    [swx.reshape(-1).tolist()],
                    type=pa.list_(pa.float64()),
                ),
                pa.array(
                    [sw.reshape(-1).tolist()],
                    type=pa.list_(pa.float64()),
                ),
            ],
            names=["swx", "sw"],
        )

    parts = (
        spread_small_source(base)
        .select("id", "x", (F.col("cohort") == "A").alias("is_a"))
        .mapInArrow(
            _boot_partials, "swx array<double>, sw array<double>"
        )
        .collect()
    )
    swx = np.zeros(2 * BOOT_REPS)
    sw = np.zeros(2 * BOOT_REPS)
    for r in parts:
        swx += np.asarray(r["swx"])
        sw += np.asarray(r["sw"])
    swx = swx.reshape(2, BOOT_REPS)
    sw = sw.reshape(2, BOOT_REPS)

    from decimal import ROUND_HALF_UP, Decimal

    def _rnd(x: float, q: str) -> float:
        return float(
            Decimal(repr(float(x))).quantize(
                Decimal(q), rounding=ROUND_HALF_UP
            )
        )

    lifts = sorted(
        (
            _rnd(swx[1][r] / sw[1][r], "0.01")
            - _rnd(swx[0][r] / sw[0][r], "0.01")
        )
        / _rnd(swx[0][r] / sw[0][r], "0.01")
        for r in range(BOOT_REPS)
    )

    def _pctl(p: float) -> float:
        rank = p * (len(lifts) - 1)
        lo = int(math.floor(rank))
        hi = int(math.ceil(rank))
        if lo == hi:
            return lifts[lo]
        return lifts[lo] * (hi - rank) + lifts[hi] * (rank - lo)

    ci = literal_frame(
        spark,
        "ci_lo_raw double, ci_hi_raw double",
        [(_pctl(0.025), _pctl(0.975))],
    ).select(
        F.round(F.col("ci_lo_raw"), 6).alias("ci_lo"),
        F.round(F.col("ci_hi_raw"), 6).alias("ci_hi"),
    )
    return (
        obs.crossJoin(F.broadcast(ci))
        .select(
            "n_a",
            "n_b",
            "mean_a",
            "mean_b",
            F.round(
                (F.col("mean_b") - F.col("mean_a")) / F.col("mean_a"), 6
            ).alias("lift"),
            "ci_lo",
            "ci_hi",
            ((F.col("ci_lo") > 0) | (F.col("ci_hi") < 0)).alias(
                "significant"
            ),
        )
    )


@query(
    "incremental_stats_merge",
    oracle="""
    WITH runs AS (
        SELECT CAST(strftime(o_orderdate, '%Y') AS INTEGER) AS run_y,
               o_totalprice AS x
        FROM orders
    ),
    partials AS (
        SELECT run_y, CAST(COUNT(*) AS BIGINT) AS n,
               AVG(x) AS mean,
               SUM((x - (SELECT AVG(x) FROM runs r2
                         WHERE r2.run_y = runs.run_y))
                   * (x - (SELECT AVG(x) FROM runs r2
                           WHERE r2.run_y = runs.run_y))) AS m2
        FROM runs GROUP BY run_y
    ),
    gtot AS (
        SELECT SUM(n) AS gn, SUM(n * mean) / SUM(n) AS gmean
        FROM partials
    ),
    merged AS (
        SELECT g.gn AS n, g.gmean AS mean,
               SUM(p.m2) + SUM(p.n * (p.mean - g.gmean)
                               * (p.mean - g.gmean)) AS m2
        FROM partials p CROSS JOIN gtot g
        GROUP BY g.gn, g.gmean
    ),
    direct AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n, AVG(x) AS mean,
               SUM((x - (SELECT AVG(x) FROM runs))
                   * (x - (SELECT AVG(x) FROM runs))) AS m2
        FROM runs
    )
    SELECT 'run_' || CAST(run_y AS VARCHAR) AS grain,
           CAST(n AS BIGINT) AS n,
           ROUND(mean, 4) AS mean,
           ROUND(m2 / n, 0) AS var_pop
    FROM partials
    UNION ALL
    SELECT 'merged', CAST(n AS BIGINT), ROUND(mean, 4),
           ROUND(m2 / n, 0) FROM merged
    UNION ALL
    SELECT 'direct', CAST(n AS BIGINT), ROUND(mean, 4),
           ROUND(m2 / n, 0) FROM direct
    ORDER BY grain
    """,
)
def incremental_stats_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable moment statistics — the incremental-reporting
    discipline in its simplest certifiable form: each ingest run
    (order year here) keeps only (n, mean, M2); a new global mean and
    variance come from MERGING those partials with Chan's parallel
    update (M2 = sum M2_i + sum n_i*(mean_i - mean)^2), NEVER by
    rescanning history. The output stacks the per-run partials, the
    MERGED global, and the DIRECT single-pass global — merged ==
    direct row-for-row IS the certificate, hash-verified on both
    engines (the same contract the HLL/KLL `sketch_rollup` proves for
    approximate state, here exact).

    Scale shape: one run-grain aggregate over the corpus, then
    arithmetic over |runs| rows; the direct pass exists only to
    certify the merge. Means round at 4 dp and variances at whole
    units before comparison so fp association order can't flip the
    certificate."""
    orders = load_table(spark, sf_dir, "orders")
    runs = orders.select(
        F.year("o_orderdate").alias("run_y"),
        F.col("o_totalprice").alias("x"),
    )
    partials = runs.groupBy("run_y").agg(
        F.count("*").alias("n"),
        F.avg("x").alias("mean"),
        (F.var_pop("x") * F.count("*")).alias("m2"),
    )
    tot = Window.partitionBy()
    gmean = F.sum(F.col("n") * F.col("mean")).over(tot) / F.sum("n").over(
        tot
    )
    merged = (
        partials.select(
            "n",
            "mean",
            "m2",
            gmean.alias("gmean"),
        )
        .groupBy()
        .agg(
            F.sum("n").alias("n"),
            F.first("gmean").alias("mean"),
            (
                F.sum("m2")
                + F.sum(
                    F.col("n")
                    * (F.col("mean") - F.col("gmean"))
                    * (F.col("mean") - F.col("gmean"))
                )
            ).alias("m2"),
        )
    )
    direct = runs.agg(
        F.count("*").alias("n"),
        F.avg("x").alias("mean"),
        (F.var_pop("x") * F.count("*")).alias("m2"),
    )

    def fmt(df: DataFrame, grain) -> DataFrame:
        return df.select(
            grain.alias("grain"),
            F.col("n").cast("bigint").alias("n"),
            F.round("mean", 4).alias("mean"),
            # variance of a ~2.5e5-scale metric is ~2e10: whole-unit
            # rounding absorbs the ~1e-3 fp association noise the
            # merge certificate must be immune to
            F.round(F.col("m2") / F.col("n"), 0).alias("var_pop"),
        )

    return (
        fmt(partials, F.concat(F.lit("run_"), F.col("run_y").cast("string")))
        .unionAll(fmt(merged, F.lit("merged")))
        .unionAll(fmt(direct, F.lit("direct")))
        .orderBy("grain")
    )


HILL_KS = (25, 50, 100)  # tail order statistics per estimate


@query(
    "hill_tail_index",
    oracle=f"""
    WITH topv AS MATERIALIZED (
        SELECT o_totalprice AS x,
               ROW_NUMBER() OVER (ORDER BY o_totalprice DESC,
                                  o_orderkey) AS r
        FROM orders
        ORDER BY o_totalprice DESC, o_orderkey
        LIMIT {max(HILL_KS) + 1}
    )
    SELECT k.k AS tail_k,
           ROUND(MAX(CASE WHEN t.r = k.k + 1 THEN t.x END), 6)
               AS x_threshold,
           ROUND(1.0 / (SUM(CASE WHEN t.r <= k.k
                    THEN ln(t.x / ROUND((SELECT x FROM topv
                         WHERE r = k.k + 1), 6)) END) / k.k), 6)
               AS hill_alpha
    FROM (VALUES {", ".join(f"({k})" for k in HILL_KS)}) AS k(k)
    LEFT JOIN topv t ON t.r <= k.k + 1
    GROUP BY k.k
    ORDER BY k.k
    """,
)
def hill_tail_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hill estimator of the tail exponent — the heavy-tail audit
    for numeric columns (the value-domain companion of
    `zipf_alpha_fit`'s rank-domain exponent): alpha_hat(k) =
    k / sum_{i<=k} ln(x_(i) / x_(k+1)) over the k largest order
    statistics, emitted on a k ladder (25/50/100) because Hill's
    bias-variance trade shows as instability across k — a stable
    alpha near 1-2 means Pareto-like spend/size tails (plan capacity
    by quantile, not mean), a large alpha means the tail is thin and
    mean-based planning is safe.

    Scale shape: the ONLY corpus-touching operator is a distributed
    TakeOrdered(max_k + 1) — no global sort, no corpus-grain window;
    ranking, the threshold lookup, and the log folds all run on the
    101-row head. The threshold is 6-dp pinned before the ratio so
    both engines fold identical logs."""
    orders = load_table(spark, sf_dir, "orders")
    return hill_tail_profile(
        orders, "o_totalprice", "o_orderkey", ks=HILL_KS
    )


def hill_tail_profile(
    df: DataFrame,
    value_col: str,
    tiebreak_col: str,
    ks: tuple = HILL_KS,
) -> DataFrame:
    """Library core of `hill_tail_index` (api.stats.
    hill_tail_profile): the Hill tail-exponent ladder over any
    positive numeric column — alpha_hat(k) = k / sum ln(x_(i)/
    x_(k+1)) for each k in ``ks``, with the (k+1)-th order statistic
    as the reported threshold. Only a TakeOrdered(max(ks)+1) touches
    the input."""
    kmax = max(ks)
    topv = (
        df.select(
            F.col(value_col).alias("x"),
            F.col(tiebreak_col).alias("o_orderkey"),
        )
        .orderBy(F.desc("x"), "o_orderkey")
        .limit(kmax + 1)
        .select(
            "x",
            F.row_number()
            .over(Window.orderBy(F.desc("x"), "o_orderkey"))
            .alias("r"),
        )
    )
    grid = literal_grid(df.sparkSession, "tail_k", ks, "long")
    thresh = F.round(
        F.max(F.when(F.col("r") == F.col("tail_k") + 1, F.col("x"))),
        6,
    )
    logsum = F.sum(
        F.when(
            F.col("r") <= F.col("tail_k"),
            F.log(F.col("x") / F.col("x_thr")),
        )
    )
    thr_map = topv.select(
        F.col("r").alias("thr_r"), F.round("x", 6).alias("x_thr")
    )
    # LEFT joins so a k rung whose (k+1)-th order statistic does not
    # exist (input smaller than the ladder) still emits its row with
    # NULL x_threshold / hill_alpha — truncation must be visible to
    # library callers, never a silently vanished rung.
    return (
        grid.join(
            F.broadcast(thr_map),
            F.col("thr_r") == F.col("tail_k") + 1,
            "left",
        )
        .join(
            F.broadcast(topv),
            F.col("r") <= F.col("tail_k") + 1,
            "left",
        )
        .groupBy("tail_k")
        .agg(
            thresh.alias("x_threshold"),
            F.round(1.0 / (logsum / F.col("tail_k")), 6).alias(
                "hill_alpha"
            ),
        )
        .orderBy("tail_k")
    )


SRM_CHI2_95 = 3.841459  # chi-square 95th percentile, 1 dof


@query(
    "ab_srm_audit",
    oracle=f"""
    WITH assigned AS (
        SELECT
            CASE WHEN substr(md5(CAST(c_custkey AS VARCHAR)), 1, 1)
                 < '8' THEN 'A' ELSE 'B' END AS fair_arm,
            CASE WHEN substr(md5(CAST(c_custkey AS VARCHAR)), 1, 1)
                 < '9' THEN 'A' ELSE 'B' END AS biased_arm
        FROM customer
    ),
    per_method AS (
        SELECT 'fair_hash' AS method, fair_arm AS arm, COUNT(*) AS n
        FROM assigned GROUP BY fair_arm
        UNION ALL
        SELECT 'biased_hash', biased_arm, COUNT(*)
        FROM assigned GROUP BY biased_arm
    ),
    tot AS (
        SELECT method, SUM(n) AS n_tot FROM per_method GROUP BY method
    ),
    chi AS (
        SELECT p.method,
               ROUND(SUM(POWER(p.n - t.n_tot * 0.5, 2)
                         / (t.n_tot * 0.5)), 6) AS chi2
        FROM per_method p JOIN tot t USING (method)
        GROUP BY p.method
    )
    SELECT p.method, p.arm, CAST(p.n AS BIGINT) AS n,
           ROUND(p.n * 1.0 / t.n_tot, 6) AS obs_frac,
           c.chi2,
           CASE WHEN c.chi2 > {SRM_CHI2_95} THEN 1 ELSE 0 END
               AS srm_flag
    FROM per_method p
    JOIN tot t USING (method)
    JOIN chi c USING (method)
    ORDER BY p.method, p.arm
    """,
)
def ab_srm_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sample-ratio-mismatch audit — the FIRST check an
    experimentation platform runs before reading any A/B result
    (Kohavi: a biased split invalidates the experiment regardless of
    the metric): chi-square of observed arm counts against the
    intended 50/50 split, shown for two hash assignments
    side-by-side — the fair one (half the md5 hex space per arm,
    passes) and a deliberately skewed one (9/16 vs 7/16, flagged) —
    the same pass/fail-pair presentation as
    `kfold_assignment_audit`. Feeds `ab_lift_bootstrap`: a cohort
    split that fails SRM makes its confidence interval meaningless.

    Scale shape: assignment is per-row md5 codegen; everything after
    the ONE map-side-combinable (method x arm) aggregate is 4-row
    arithmetic."""
    cust = load_table(spark, sf_dir, "customer")
    h1 = F.substring(F.md5(F.col("c_custkey").cast("string")), 1, 1)
    assigned = cust.select(
        F.when(h1 < "8", "A").otherwise("B").alias("fair_arm"),
        F.when(h1 < "9", "A").otherwise("B").alias("biased_arm"),
    )
    per_method = (
        assigned.groupBy(F.col("fair_arm").alias("arm"))
        .agg(F.count("*").alias("n"))
        .select(F.lit("fair_hash").alias("method"), "arm", "n")
        .unionByName(
            assigned.groupBy(F.col("biased_arm").alias("arm"))
            .agg(F.count("*").alias("n"))
            .select(F.lit("biased_hash").alias("method"), "arm", "n")
        )
    )
    tot = per_method.groupBy("method").agg(
        F.sum("n").alias("n_tot")
    )
    joined = per_method.join(F.broadcast(tot), "method")
    chi = joined.groupBy("method").agg(
        F.round(
            F.sum(
                F.pow(F.col("n") - F.col("n_tot") * 0.5, 2)
                / (F.col("n_tot") * 0.5)
            ),
            6,
        ).alias("chi2")
    )
    return (
        joined.join(F.broadcast(chi), "method")
        .select(
            "method",
            "arm",
            F.col("n").cast("bigint").alias("n"),
            F.round(F.col("n") * 1.0 / F.col("n_tot"), 6).alias(
                "obs_frac"
            ),
            "chi2",
            F.when(F.col("chi2") > SRM_CHI2_95, 1)
            .otherwise(0)
            .alias("srm_flag"),
        )
        .orderBy("method", "arm")
    )


WELCH_Z_95 = 1.959964  # normal 97.5th pct; Welch dof is huge at lake n


@query(
    "welch_ttest_slices",
    oracle=f"""
    WITH s AS (
        SELECT l_returnflag AS slice,
               COUNT(*) AS n1,
               SUM(l_extendedprice) AS s1,
               SUM(l_extendedprice * l_extendedprice) AS q1
        FROM lineitem GROUP BY 1
    ),
    g AS (
        SELECT SUM(n1) AS n, SUM(s1) AS s, SUM(q1) AS q FROM s
    ),
    stats AS (
        SELECT slice, n1, g.n - n1 AS n2,
               ROUND(s1 / n1, 6) AS mean1,
               ROUND((g.s - s1) / (g.n - n1), 6) AS mean2,
               ROUND((q1 - s1 * s1 / n1) / (n1 - 1), 6) AS var1,
               ROUND(((g.q - q1) - (g.s - s1) * (g.s - s1)
                      / (g.n - n1)) / (g.n - n1 - 1), 6) AS var2
        FROM s CROSS JOIN g
    )
    SELECT slice, CAST(n1 AS BIGINT) AS n1, CAST(n2 AS BIGINT) AS n2,
           mean1, mean2,
           ROUND(mean1 - mean2, 6) AS mean_diff,
           ROUND((mean1 - mean2)
                 / SQRT(var1 / n1 + var2 / n2), 6) AS welch_t,
           CASE WHEN ABS(ROUND((mean1 - mean2)
                / SQRT(var1 / n1 + var2 / n2), 6)) > {WELCH_Z_95}
                THEN 1 ELSE 0 END AS significant
    FROM stats
    ORDER BY slice
    """,
)
def welch_ttest_slices(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Welch's unequal-variance t-test, each slice against the rest
    of the corpus — the parametric screen beside `ab_lift_bootstrap`
    (closed-form, one pass, no resampling) and the significance
    upgrade of `bias_slice_disparity`'s raw means: does this slice's
    mean differ beyond sampling noise? The rest-of-corpus moments
    come from the GLOBAL sums minus the slice sums, so the whole
    panel is ONE slice-grain aggregate + a 1-row global broadcast —
    never a second scan per slice. At lake n the Welch degrees of
    freedom are huge, so the normal 1.96 threshold stands in for the
    t quantile (documented approximation).

    Scale shape: one map-side-combinable aggregate at slice grain
    carrying (n, sum, sum-of-squares) — the mergeable-moments trick
    `incremental_stats_merge` pins — then per-slice arithmetic."""
    li = load_table(spark, sf_dir, "lineitem")
    s = li.groupBy(F.col("l_returnflag").alias("slice")).agg(
        F.count("*").alias("n1"),
        F.sum("l_extendedprice").alias("s1"),
        F.sum(
            F.col("l_extendedprice") * F.col("l_extendedprice")
        ).alias("q1"),
    )
    g = s.agg(
        F.sum("n1").alias("n"),
        F.sum("s1").alias("s"),
        F.sum("q1").alias("q"),
    )
    st = s.join(F.broadcast(g)).select(
        "slice",
        "n1",
        (F.col("n") - F.col("n1")).alias("n2"),
        F.round(F.col("s1") / F.col("n1"), 6).alias("mean1"),
        F.round(
            (F.col("s") - F.col("s1")) / (F.col("n") - F.col("n1")), 6
        ).alias("mean2"),
        F.round(
            (F.col("q1") - F.col("s1") * F.col("s1") / F.col("n1"))
            / (F.col("n1") - 1),
            6,
        ).alias("var1"),
        F.round(
            (
                (F.col("q") - F.col("q1"))
                - (F.col("s") - F.col("s1"))
                * (F.col("s") - F.col("s1"))
                / (F.col("n") - F.col("n1"))
            )
            / (F.col("n") - F.col("n1") - 1),
            6,
        ).alias("var2"),
    )
    t = F.round(
        (F.col("mean1") - F.col("mean2"))
        / F.sqrt(
            F.col("var1") / F.col("n1") + F.col("var2") / F.col("n2")
        ),
        6,
    )
    return st.select(
        "slice",
        F.col("n1").cast("bigint").alias("n1"),
        F.col("n2").cast("bigint").alias("n2"),
        "mean1",
        "mean2",
        F.round(F.col("mean1") - F.col("mean2"), 6).alias("mean_diff"),
        t.alias("welch_t"),
        F.when(F.abs(t) > WELCH_Z_95, 1).otherwise(0).alias(
            "significant"
        ),
    ).orderBy("slice")


LORENZ_BUCKETS = 10  # decile grid for the concentration curve


@query(
    "revenue_lorenz_deciles",
    oracle=f"""
    WITH per_part AS (
        SELECT l_partkey,
               ROUND(SUM(l_extendedprice * (1 - l_discount)), 6)
                   AS rev
        FROM lineitem GROUP BY 1
    ),
    bnd AS (
        SELECT {", ".join(
            f"ROUND(quantile_cont(rev, {d / 10.0}), 6) AS b{d}"
            for d in range(1, LORENZ_BUCKETS)
        )}
        FROM per_part
    ),
    cells AS (
        SELECT 1 {" ".join(
            f"+ CAST(rev > b{d} AS INT)"
            for d in range(1, LORENZ_BUCKETS)
        )} AS decile,
               COUNT(*) AS n_parts, SUM(rev) AS rev
        FROM per_part CROSS JOIN bnd
        GROUP BY 1
    ),
    tot AS (SELECT SUM(rev) AS t, COUNT(*) AS n FROM per_part)
    SELECT CAST(c.decile AS BIGINT) AS decile,
           CAST(c.n_parts AS BIGINT) AS n_parts,
           ROUND(c.rev / t.t, 6) AS rev_share,
           ROUND(SUM(c.rev) OVER (ORDER BY c.decile
                 ROWS UNBOUNDED PRECEDING) / t.t, 6)
               AS cum_rev_share,
           ROUND(SUM(c.n_parts) OVER (ORDER BY c.decile
                 ROWS UNBOUNDED PRECEDING) * 1.0 / t.n, 6)
               AS cum_pop_share
    FROM cells c CROSS JOIN tot t
    ORDER BY decile
    """,
)
def revenue_lorenz_deciles(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Lorenz concentration curve of part revenue — the
    inequality-curve companion of `token_gini_by_source`'s scalar
    Gini, in the value domain `hill_tail_index` screens: parts sort
    into revenue deciles and the curve reports each decile's revenue
    share plus the cumulative (population share, revenue share)
    points — the 'bottom 80% of parts earn X% of revenue' table a
    catalog/assortment review reads directly. The diagonal is
    perfect equality; sag measures concentration. Deciles are cut
    at the 6-dp-pinned revenue percentile boundaries (a part lands
    in decile 1 + #boundaries strictly below its revenue), so
    boundary-tied parts share a decile instead of being split by an
    arbitrary row order — bucket sizes are near-equal, not
    forced-equal. Cross-engine parity assumption, documented next
    to the pin: Spark `percentile` and DuckDB `quantile_cont` both
    compute type-7 linear interpolation, and the revenues being
    interpolated are themselves 6-dp-rounded money sums, so the
    boundary agrees after ROUND(.,6) on both engines; a last-ulp
    divergence ON an interpolated boundary that a part's revenue
    exactly ties would shift that part one decile (never observed
    across both audit scales; computing boundaries from rounded
    rank positions instead would remove the assumption at the cost
    of the standard interpolation semantics).

    Scale shape: one part-grain revenue aggregate, one 1-row
    percentile-boundary aggregate broadcast back over it (the
    `equidepth_histogram` pattern — NO part-grain NTILE/sort; at
    100 TB swap `percentile` for `percentile_approx`, same shape,
    bounded memory), then 10-row arithmetic with a 1-row total
    broadcast."""
    li = load_table(spark, sf_dir, "lineitem")
    per_part = li.groupBy("l_partkey").agg(
        F.round(
            F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))),
            6,
        ).alias("rev")
    )
    bnd = per_part.agg(
        *[
            F.round(F.percentile("rev", F.lit(d / 10.0)), 6).alias(
                f"b{d}"
            )
            for d in range(1, LORENZ_BUCKETS)
        ]
    )
    decile = F.lit(1)
    for d in range(1, LORENZ_BUCKETS):
        decile = decile + (F.col("rev") > F.col(f"b{d}")).cast("int")
    tot = per_part.agg(
        F.sum("rev").alias("t"), F.count("*").alias("n")
    )
    cells = (
        per_part.crossJoin(F.broadcast(bnd))
        .select(decile.alias("decile"), "rev")
        .groupBy("decile")
        .agg(F.count("*").alias("n_parts"), F.sum("rev").alias("rev"))
    )
    wcum = Window.orderBy("decile").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return (
        cells.join(F.broadcast(tot))
        .select(
            F.col("decile").cast("bigint").alias("decile"),
            F.col("n_parts").cast("bigint").alias("n_parts"),
            F.round(F.col("rev") / F.col("t"), 6).alias("rev_share"),
            F.round(
                F.sum("rev").over(wcum) / F.col("t"), 6
            ).alias("cum_rev_share"),
            F.round(
                F.sum("n_parts").over(wcum) * 1.0 / F.col("n"), 6
            ).alias("cum_pop_share"),
        )
        .orderBy("decile")
    )


MWU_Z_95 = 1.959964  # two-sided 95% normal quantile (Welch's constant)


@query(
    "mannwhitney_u_test",
    oracle=f"""
    WITH base AS (
        SELECT 'quantity' AS metric, l_quantity AS v,
               CASE WHEN l_returnflag = 'R' THEN 1 ELSE 2 END AS g
        FROM lineitem WHERE l_returnflag IN ('R', 'N')
        UNION ALL
        SELECT 'discount', ROUND(l_discount, 2),
               CASE WHEN l_returnflag = 'R' THEN 1 ELSE 2 END
        FROM lineitem WHERE l_returnflag IN ('R', 'N')
        UNION ALL
        SELECT 'doc_chars_q25', CAST(n_chars // 25 AS DOUBLE),
               CASE WHEN lang = 'zh' THEN 1 ELSE 2 END
        FROM documents WHERE lang IN ('zh', 'en')
    ),
    cells AS (
        SELECT metric, v,
               CAST(COUNT(*) FILTER (WHERE g = 1) AS DOUBLE) AS c1,
               CAST(COUNT(*) FILTER (WHERE g = 2) AS DOUBLE) AS c2
        FROM base GROUP BY metric, v
    ),
    walk AS (
        SELECT metric, v, c1, c2,
               COALESCE(SUM(c2) OVER (
                   PARTITION BY metric ORDER BY v
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
               ), 0) AS lt2
        FROM cells
    ),
    agg AS (
        SELECT metric,
               SUM(c1) AS n1, SUM(c2) AS n2,
               SUM(c1 * (lt2 + 0.5 * c2)) AS u1,
               SUM((c1 + c2) * (c1 + c2) * (c1 + c2) - (c1 + c2))
                   AS tie3
        FROM walk GROUP BY metric
    )
    SELECT metric,
           CAST(n1 AS BIGINT) AS n1,
           CAST(n2 AS BIGINT) AS n2,
           ROUND(u1, 1) AS u_stat,
           ROUND((u1 - n1 * n2 / 2)
                 / SQRT(n1 * n2 / 12.0
                        * ((n1 + n2 + 1)
                           - tie3 / ((n1 + n2) * (n1 + n2 - 1)))),
                 6) AS mw_z,
           CASE WHEN ABS(ROUND((u1 - n1 * n2 / 2)
                 / SQRT(n1 * n2 / 12.0
                        * ((n1 + n2 + 1)
                           - tie3 / ((n1 + n2) * (n1 + n2 - 1)))),
                 6)) > {MWU_Z_95} THEN 1 ELSE 0 END AS significant
    FROM agg ORDER BY metric
    """,
)
def mannwhitney_u_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mann-Whitney U (Wilcoxon rank-sum) two-sample test — the
    NON-parametric sibling of `welch_ttest_slices`: does the returned
    cohort's distribution stochastically dominate the delivered one?
    Rank tests are what a curator reaches for when the metric is
    skewed or ordinal (quality scores, latencies, token counts) and
    a mean test would chase outliers; the normal approximation with
    the tie correction is exact enough at lake n that z replaces the
    exact U tables (same stance as Welch's 1.96).

    Scale shape — NO global rank window: on a discrete metric the
    rank-sum reduces to VALUE-GRAIN arithmetic, U = Σ_v c1(v) ·
    (lt2(v) + c2(v)/2), so the corpus is touched by ONE map-side-
    combinable (metric, value) aggregate; the ordered walk and the
    tie correction operate on the bounded value table (50 quantity
    values, 11 discounts at any SF — both pinned by the TPC-H
    generator). A global row-number over 600M lineitems would plan a
    single-partition sort; this form never ranks a row. Continuous
    metrics plug in by quantizing first (`equidepth_histogram`'s
    boundary move), which changes the test to its binned form — the
    documented trade.

    Reference anchor: upgrades the reference's fixed-threshold bias
    checks (databias/bias_detection_engine.py) with a distribution-
    free significance screen it has no equivalent of."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_returnflag").isin("R", "N")
    )
    rf_g = F.when(F.col("l_returnflag") == "R", 1).otherwise(2)
    docs = load_table(spark, sf_dir, "documents").filter(
        F.col("lang").isin("zh", "en")
    )
    base = (
        li.select(
            F.lit("quantity").alias("metric"),
            F.col("l_quantity").cast("double").alias("v"),
            rf_g.alias("g"),
        )
        .unionAll(
            li.select(
                F.lit("discount").alias("metric"),
                F.round("l_discount", 2).cast("double").alias("v"),
                rf_g.alias("g"),
            )
        )
        .unionAll(
            docs.select(
                F.lit("doc_chars_q25").alias("metric"),
                (F.col("n_chars") / 25)
                .cast("long")
                .cast("double")
                .alias("v"),
                F.when(F.col("lang") == "zh", 1).otherwise(2).alias("g"),
            )
        )
    )
    return mannwhitney_u(base)


def mannwhitney_u(
    samples: DataFrame,
    metric_col: str = "metric",
    value_col: str = "v",
    group_col: str = "g",
) -> DataFrame:
    """Library core of `mannwhitney_u_test` (api.stats.mannwhitney_u):
    the tie-corrected normal-approximation U test over any
    (``metric_col``, ``value_col``, ``group_col``) sample table with
    group labels 1 and 2. Reduces the rank-sum to value-grain
    arithmetic — one (metric, value) aggregate over the input, an
    ordered walk over the bounded value table, no global rank — so
    quantize continuous metrics upstream."""
    cells = samples.groupBy(metric_col, value_col).agg(
        F.count(F.when(F.col(group_col) == 1, 1))
        .cast("double")
        .alias("c1"),
        F.count(F.when(F.col(group_col) == 2, 1))
        .cast("double")
        .alias("c2"),
    )
    w_lt = (
        Window.partitionBy(metric_col)
        .orderBy(value_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    walk = cells.select(
        metric_col,
        "c1",
        "c2",
        F.coalesce(F.sum("c2").over(w_lt), F.lit(0.0)).alias("lt2"),
    )
    t = F.col("c1") + F.col("c2")
    agg = walk.groupBy(metric_col).agg(
        F.sum("c1").alias("n1"),
        F.sum("c2").alias("n2"),
        F.sum(F.col("c1") * (F.col("lt2") + 0.5 * F.col("c2"))).alias(
            "u1"
        ),
        F.sum(t * t * t - t).alias("tie3"),
    )
    n = F.col("n1") + F.col("n2")
    z = F.round(
        (F.col("u1") - F.col("n1") * F.col("n2") / 2)
        / F.sqrt(
            F.col("n1")
            * F.col("n2")
            / 12.0
            * ((n + 1) - F.col("tie3") / (n * (n - 1)))
        ),
        6,
    )
    return agg.select(
        metric_col,
        F.col("n1").cast("bigint").alias("n1"),
        F.col("n2").cast("bigint").alias("n2"),
        F.round("u1", 1).alias("u_stat"),
        z.alias("mw_z"),
        F.when(F.abs(z) > MWU_Z_95, 1).otherwise(0).alias("significant"),
    ).orderBy(metric_col)


QSA_ACCURACIES = (1000, 10000)  # percentile_approx accuracy ladder
QSA_PERCENTILES = (0.5, 0.9, 0.99)


@query("quantile_sketch_accuracy")  # rows-only: percentile_approx's
# GK sketch is Spark-internal (no DuckDB equivalent to replay); the
# exact side is hash-verified via quantiles_by_group, and the error
# bound here is pinned by tests/test_round8_ops.py
def quantile_sketch_accuracy(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Measured exact-vs-approximate quantile error across the
    accuracy ladder — the audit behind this engine's own repeated
    advice ('at 100 TB swap percentile for percentile_approx'):
    percentile_approx is a Greenwald-Khanna sketch whose RANK error
    is bounded by 1/accuracy, so the trade should be priced, not
    asserted. For each (accuracy, p): both values and the realized
    rank error |rank(approx) - p| (rank of the approx value measured
    against the true CDF), which the GK contract bounds by
    1/accuracy.

    Scale shape: one aggregate computes every exact and approximate
    percentile in a single pass (the exact side's partial state is a
    value-count map, the approx side a GK sketch — both mergeable);
    the rank check is one more scan with 6 bounded count columns. At
    a true 100 TB the exact side is the one you drop — which is the
    point of measuring what that costs in rank error first."""
    orders = load_table(spark, sf_dir, "orders")
    aggs = []
    for acc in QSA_ACCURACIES:
        for p in QSA_PERCENTILES:
            tag = f"{acc}_{str(p).replace('.', '')}"
            aggs.append(
                F.round(
                    F.percentile_approx(
                        "o_totalprice", F.lit(p), F.lit(acc)
                    ),
                    6,
                ).alias(f"a_{tag}")
            )
    for p in QSA_PERCENTILES:
        aggs.append(
            F.round(
                F.percentile("o_totalprice", F.lit(p)), 6
            ).alias(f"e_{str(p).replace('.', '')}")
        )
    aggs.append(F.count("*").alias("n"))
    one = orders.agg(*aggs)
    ranks = orders.crossJoin(F.broadcast(one)).agg(
        *[
            (
                F.count(
                    F.when(
                        F.col("o_totalprice")
                        <= F.col(
                            f"a_{acc}_{str(p).replace('.', '')}"
                        ),
                        1,
                    )
                )
                * 1.0
                / F.max("n")
            ).alias(f"r_{acc}_{str(p).replace('.', '')}")
            for acc in QSA_ACCURACIES
            for p in QSA_PERCENTILES
        ],
        *[
            F.max(f"a_{acc}_{str(p).replace('.', '')}").alias(
                f"a_{acc}_{str(p).replace('.', '')}"
            )
            for acc in QSA_ACCURACIES
            for p in QSA_PERCENTILES
        ],
        *[
            F.max(f"e_{str(p).replace('.', '')}").alias(
                f"e_{str(p).replace('.', '')}"
            )
            for p in QSA_PERCENTILES
        ],
    )
    rows = []
    for acc in QSA_ACCURACIES:
        for p in QSA_PERCENTILES:
            tag = f"{acc}_{str(p).replace('.', '')}"
            et = f"e_{str(p).replace('.', '')}"
            rows.append(
                F.struct(
                    F.lit(acc).alias("accuracy"),
                    F.lit(p).alias("p"),
                    F.col(f"a_{tag}").alias("approx_value"),
                    F.col(et).alias("exact_value"),
                    F.round(
                        F.abs(F.col(f"r_{tag}") - F.lit(p)), 6
                    ).alias("rank_error"),
                    F.round(F.lit(1.0 / acc), 6).alias("gk_bound"),
                )
            )
    return (
        ranks.select(F.explode(F.array(*rows)).alias("r"))
        .select("r.*")
        .orderBy("accuracy", "p")
    )


# ---------------------------------------------------------------------
# Multiple-testing control + rank correlation: the two readouts a
# slice-scanning analytics layer needs once it runs MANY tests
# (welch_ttest_slices does one family) or compares two rankings
# (spearman needs interval ranks; Kendall reads raw concordance).
# ---------------------------------------------------------------------

BH_FDR_Q = 0.10  # target false-discovery rate
_PHI_K = 1.702  # logistic approximation of the normal CDF:
# Phi(z) ~ 1 / (1 + exp(-1.702 z)), max abs error < 0.0095 — the
# SAME closed form on both engines, so p-values are bit-identical
# (no erf in Spark SQL; the decision variable is the 6-dp-rounded p)


def bh_fdr(pvals, q: float = None):
    """Library core of `bh_fdr_slices` (api.stats.bh_fdr): append
    Benjamini-Hochberg step-up columns (bh_rank, bh_threshold,
    reject) to any (keys..., p_value) frame. Ranks order by
    (p_value, remaining columns) so ties break deterministically;
    the step-up cut k = max{i: p_(i) <= i*q/m} rides a 1-row
    broadcast. The panel is assumed BOUNDED (a test family, never
    corpus-grain) — the rank window is panel-wide by design."""
    q = BH_FDR_Q if q is None else q
    keys = [c for c in pvals.columns if c != "p_value"]
    w_rank = Window.orderBy("p_value", *keys)
    ranked = pvals.select(
        *pvals.columns,
        F.row_number().over(w_rank).alias("bh_rank"),
        F.count("*").over(
            Window.partitionBy().rowsBetween(
                Window.unboundedPreceding, Window.unboundedFollowing
            )
        ).alias("m"),
    )
    cut = ranked.agg(
        F.coalesce(
            F.max(
                F.when(
                    F.col("p_value")
                    <= F.col("bh_rank") * q / F.col("m"),
                    F.col("bh_rank"),
                )
            ),
            F.lit(0),
        ).alias("k")
    )
    return ranked.crossJoin(F.broadcast(cut)).select(
        *pvals.columns,
        F.col("bh_rank").cast("bigint").alias("bh_rank"),
        F.round(F.col("bh_rank") * q / F.col("m"), 6).alias(
            "bh_threshold"
        ),
        (F.col("bh_rank") <= F.col("k")).alias("reject"),
    )


@query(
    "bh_fdr_slices",
    oracle=f"""
    WITH s AS (
        SELECT p.p_brand AS brand,
               COUNT(*) AS n1,
               SUM(l.l_extendedprice) AS s1,
               SUM(l.l_extendedprice * l.l_extendedprice) AS q1
        FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
        GROUP BY 1
    ),
    g AS (SELECT SUM(n1) AS n, SUM(s1) AS s, SUM(q1) AS q FROM s),
    z AS (
        SELECT brand, n1,
               ROUND((ROUND(s1 / n1, 6)
                      - ROUND((g.s - s1) / (g.n - n1), 6))
                 / SQRT(ROUND((q1 - s1 * s1 / n1) / (n1 - 1), 6) / n1
                        + ROUND(((g.q - q1) - (g.s - s1) * (g.s - s1)
                                 / (g.n - n1)) / (g.n - n1 - 1), 6)
                          / (g.n - n1)), 6) AS welch_z
        FROM s CROSS JOIN g
    ),
    p AS (
        SELECT brand, n1, welch_z,
               ROUND(2.0 / (1.0 + EXP({_PHI_K} * ABS(welch_z))), 6)
                   AS p_value
        FROM z
    ),
    ranked AS (
        SELECT brand, n1, welch_z, p_value,
               ROW_NUMBER() OVER (ORDER BY p_value, brand) AS bh_rank,
               COUNT(*) OVER () AS m
        FROM p
    ),
    cut AS (
        SELECT COALESCE(MAX(bh_rank) FILTER (
                   WHERE p_value <= bh_rank * {BH_FDR_Q} / m), 0) AS k
        FROM ranked
    )
    SELECT r.brand, CAST(r.n1 AS BIGINT) AS n1, r.welch_z, r.p_value,
           CAST(r.bh_rank AS BIGINT) AS bh_rank,
           ROUND(r.bh_rank * {BH_FDR_Q} / r.m, 6) AS bh_threshold,
           r.bh_rank <= c.k AS reject
    FROM ranked r CROSS JOIN cut c
    ORDER BY r.bh_rank
    """,
)
def bh_fdr_slices(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benjamini-Hochberg FDR control over a FAMILY of slice tests —
    the correction `welch_ttest_slices` needs the moment it scans
    many slices: at 25 brands and alpha=.05, one expected false
    positive per panel is the default, and a naive per-test cutoff
    ships noise alerts. Each brand's lineitem price is Welch-tested
    against the rest of the corpus (same moments-from-global-sums
    shape as welch_ttest_slices), the two-sided p comes from the
    logistic normal-CDF approximation (identical closed form both
    engines — no erf in Spark SQL), and BH's step-up rule rejects
    the k smallest p-values where k = max{{i: p_(i) <= i*q/m}}.

    Scale shape: ONE brand-grain aggregate over the fact join + a
    1-row global broadcast; the rank window runs over the 25-row
    brand panel (fixed by the brand domain, never corpus-grain),
    and the step-up cut is a 1-row aggregate broadcast back. All
    floats round at 6 dp before the rank so fp noise cannot reorder
    the step-up."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    s = (
        li.join(part, li.l_partkey == part.p_partkey)
        .groupBy(F.col("p_brand").alias("brand"))
        .agg(
            F.count("*").alias("n1"),
            F.sum("l_extendedprice").alias("s1"),
            F.sum(
                F.col("l_extendedprice") * F.col("l_extendedprice")
            ).alias("q1"),
        )
    )
    g = s.agg(
        F.sum("n1").alias("n"),
        F.sum("s1").alias("s"),
        F.sum("q1").alias("q"),
    )
    mean1 = F.round(F.col("s1") / F.col("n1"), 6)
    mean2 = F.round(
        (F.col("s") - F.col("s1")) / (F.col("n") - F.col("n1")), 6
    )
    var1 = F.round(
        (F.col("q1") - F.col("s1") * F.col("s1") / F.col("n1"))
        / (F.col("n1") - 1),
        6,
    )
    var2 = F.round(
        (
            (F.col("q") - F.col("q1"))
            - (F.col("s") - F.col("s1"))
            * (F.col("s") - F.col("s1"))
            / (F.col("n") - F.col("n1"))
        )
        / (F.col("n") - F.col("n1") - 1),
        6,
    )
    z = s.crossJoin(F.broadcast(g)).select(
        "brand",
        "n1",
        F.round(
            (mean1 - mean2)
            / F.sqrt(
                var1 / F.col("n1")
                + var2 / (F.col("n") - F.col("n1"))
            ),
            6,
        ).alias("welch_z"),
    )
    p = z.select(
        "brand",
        "n1",
        "welch_z",
        F.round(
            2.0 / (1.0 + F.exp(F.lit(_PHI_K) * F.abs("welch_z"))), 6
        ).alias("p_value"),
    )
    p = p.select(
        "brand", F.col("n1").cast("bigint").alias("n1"),
        "welch_z", "p_value",
    )
    # rank ties break on (p_value, brand): brand is the only key col
    return bh_fdr(p, BH_FDR_Q).orderBy("bh_rank")


KENDALL_HEAD = 100  # tau over the top-N revenue parts (bounded pairs)


def kendall_tau_b(df, x_col: str, y_col: str, id_col: str):
    """Library core of `kendall_tau_topk` (api.stats.kendall_tau_b):
    tau-b with tie correction over a BOUNDED frame the caller has
    already limited (a TakeOrdered head, an eval batch) — the pair
    stage is a self-join on id inequality, O(n^2) by definition, so
    boundedness is the caller's contract. Returns 1 row: n_items,
    n_pairs, concordant, discordant, ties_x, ties_y, tau_b."""
    a, b = df.alias("a"), df.alias("b")
    ax, bx = F.col(f"a.{x_col}"), F.col(f"b.{x_col}")
    ay, by = F.col(f"a.{y_col}"), F.col(f"b.{y_col}")
    sgn = (ax - bx) * (ay - by)
    pairs = a.join(
        b, F.col(f"a.{id_col}") < F.col(f"b.{id_col}")
    ).select(
        F.when(sgn > 0, 1).otherwise(0).alias("conc"),
        F.when(sgn < 0, 1).otherwise(0).alias("disc"),
        F.when(ax == bx, 1).otherwise(0).alias("tie_x"),
        F.when(ay == by, 1).otherwise(0).alias("tie_y"),
    )
    head_n = df.agg(F.count("*").cast("bigint").alias("n_items"))
    return (
        head_n.crossJoin(
            F.broadcast(
                pairs.agg(
                    F.count("*").cast("bigint").alias("n_pairs"),
                    F.sum("conc").cast("bigint").alias("concordant"),
                    F.sum("disc").cast("bigint").alias("discordant"),
                    F.sum("tie_x").cast("bigint").alias("ties_x"),
                    F.sum("tie_y").cast("bigint").alias("ties_y"),
                    F.round(
                        (F.sum("conc") - F.sum("disc"))
                        / F.sqrt(
                            (F.count("*") - F.sum("tie_x"))
                            * (F.count("*") - F.sum("tie_y"))
                        ),
                        6,
                    ).alias("tau_b"),
                )
            )
        )
        .select(
            "n_items", "n_pairs", "concordant", "discordant",
            "ties_x", "ties_y", "tau_b",
        )
    )


@query(
    "kendall_tau_topk",
    oracle=f"""
    WITH per_part AS (
        SELECT l_partkey,
               ROUND(SUM(l_extendedprice * (1 - l_discount)), 6)
                   AS rev,
               CAST(SUM(l_quantity) AS BIGINT) AS qty
        FROM lineitem GROUP BY 1
    ),
    head AS (
        SELECT l_partkey, rev, qty FROM per_part
        ORDER BY rev DESC, l_partkey LIMIT {KENDALL_HEAD}
    ),
    pairs AS (
        SELECT CASE WHEN (a.rev - b.rev) * (a.qty - b.qty) > 0
                    THEN 1 ELSE 0 END AS conc,
               CASE WHEN (a.rev - b.rev) * (a.qty - b.qty) < 0
                    THEN 1 ELSE 0 END AS disc,
               CASE WHEN a.rev = b.rev THEN 1 ELSE 0 END AS tie_rev,
               CASE WHEN a.qty = b.qty THEN 1 ELSE 0 END AS tie_qty
        FROM head a JOIN head b ON a.l_partkey < b.l_partkey
    )
    SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM head) AS n_items,
           CAST(COUNT(*) AS BIGINT) AS n_pairs,
           CAST(SUM(conc) AS BIGINT) AS concordant,
           CAST(SUM(disc) AS BIGINT) AS discordant,
           CAST(SUM(tie_rev) AS BIGINT) AS ties_rev,
           CAST(SUM(tie_qty) AS BIGINT) AS ties_qty,
           ROUND((SUM(conc) - SUM(disc))
                 / SQRT((COUNT(*) - SUM(tie_rev))
                        * (COUNT(*) - SUM(tie_qty))), 6) AS tau_b
    FROM pairs
    """,
)
def kendall_tau_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kendall tau-b rank agreement between two metrics — do the
    parts that earn the most revenue also move the most units? The
    concordance companion of `spearman_signal_correlation` (Spearman
    reads interval ranks; Kendall counts pair inversions, the
    statistic that degrades gracefully under heavy ties) and the
    continuous-metric sibling of `rank_biased_overlap` (RBO compares
    two top-k LISTS; tau compares two METRICS on one population).
    Computed over the top-100 (KENDALL_HEAD) revenue parts with tau-b's
    tie correction: (C - D) / sqrt((n0 - t_rev)(n0 - t_qty)).

    Scale shape: one part-grain aggregate, a TakeOrdered head of
    100 rows, and the pair stage is a self-join of that
    LITERAL-BOUNDED head (4,950 pairs at any corpus size — the
    vocab_sizing_curve move applied to a quadratic statistic).
    Revenue is 6-dp-rounded before comparison so fp association
    noise cannot flip a concordance."""
    li = load_table(spark, sf_dir, "lineitem")
    per_part = li.groupBy("l_partkey").agg(
        F.round(
            F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))),
            6,
        ).alias("rev"),
        F.sum("l_quantity").cast("bigint").alias("qty"),
    )
    head = per_part.orderBy(
        F.desc("rev"), "l_partkey"
    ).limit(KENDALL_HEAD)
    return kendall_tau_b(
        head, x_col="rev", y_col="qty", id_col="l_partkey"
    ).select(
        "n_items",
        "n_pairs",
        "concordant",
        "discordant",
        F.col("ties_x").alias("ties_rev"),
        F.col("ties_y").alias("ties_qty"),
        "tau_b",
    )


GRUBBS_ALPHA = 0.05


def grubbs_cells(
    df, group_col: str, value_col: str, alpha: float = None
):
    """Library core of `grubbs_outlier_test` (api.stats.
    grubbs_cells): per group, the max-studentized-deviate statistic,
    the Bonferroni-corrected critical value (1.702-logistic normal
    inverse — documented approximation of the t quantile), the
    deterministic offending value (ties resolve to the smallest),
    and the decision flag. Group grain is the caller's domain; all
    aggregates are map-side combinable."""
    alpha = GRUBBS_ALPHA if alpha is None else alpha
    # internal key name is collision-proof: the caller's frame may
    # legitimately carry a column named 'grp'
    gk = "__grubbs_grp"
    s = df.groupBy(F.col(group_col).alias(gk)).agg(
        F.count("*").alias("n"),
        F.avg(value_col).alias("mu"),
        F.stddev_samp(value_col).alias("sd"),
    )
    dev = df.join(
        F.broadcast(s), df[group_col] == s[gk]
    ).select(
        gk,
        F.round(F.abs(F.col(value_col) - F.col("mu")), 6).alias(
            "adev"
        ),
        F.col(value_col).alias("x"),
    )
    g = dev.groupBy(gk).agg(F.max("adev").alias("max_dev"))
    val = (
        dev.join(F.broadcast(g), gk)
        .groupBy(gk)
        .agg(
            F.min(
                F.when(F.col("adev") == F.col("max_dev"), F.col("x"))
            ).alias("outlier_value")
        )
    )
    z = (
        F.log(
            (1.0 - alpha / (2.0 * F.col("n")))
            / (alpha / (2.0 * F.col("n")))
        )
        / _PHI_K
    )
    g_crit = F.round(
        (F.col("n") - 1)
        / F.sqrt(F.col("n"))
        * F.sqrt(z * z / (F.col("n") - 2 + z * z)),
        6,
    )
    return (
        s.join(g, gk)
        .join(val, gk)
        .select(
            F.col(gk).alias(group_col),
            F.col("n").cast("bigint").alias("n"),
            F.round("mu", 6).alias("mean_value"),
            F.round("sd", 6).alias("sd_value"),
            "outlier_value",
            F.round(F.col("max_dev") / F.col("sd"), 6).alias(
                "g_stat"
            ),
            g_crit.alias("g_crit"),
            (F.round(F.col("max_dev") / F.col("sd"), 6) > g_crit)
            .alias("is_outlier"),
        )
        .orderBy(group_col)
    )


@query(
    "grubbs_outlier_test",
    oracle=f"""
    WITH s AS (
        SELECT p_brand AS brand,
               COUNT(*) AS n, AVG(p_retailprice) AS mu,
               STDDEV_SAMP(p_retailprice) AS sd
        FROM part GROUP BY 1
    ),
    dev AS (
        SELECT p.p_brand AS brand,
               ROUND(ABS(p.p_retailprice - s.mu), 6) AS adev,
               p.p_retailprice AS x
        FROM part p JOIN s ON p.p_brand = s.brand
    ),
    g AS (
        SELECT d.brand, MAX(d.adev) AS max_dev
        FROM dev d GROUP BY d.brand
    ),
    val AS (
        SELECT d.brand,
               MIN(d.x) FILTER (WHERE d.adev = g.max_dev)
                   AS outlier_value
        FROM dev d JOIN g ON d.brand = g.brand
        GROUP BY d.brand
    ),
    crit AS (
        SELECT s.brand, s.n,
               ROUND(s.mu, 6) AS mean_price,
               ROUND(s.sd, 6) AS sd_price,
               ROUND(g.max_dev / s.sd, 6) AS g_stat,
               LN((1.0 - {GRUBBS_ALPHA} / (2.0 * s.n))
                  / ({GRUBBS_ALPHA} / (2.0 * s.n))) / {_PHI_K} AS z
        FROM s JOIN g ON s.brand = g.brand
    )
    SELECT c.brand, CAST(c.n AS BIGINT) AS n, c.mean_price,
           c.sd_price, v.outlier_value, c.g_stat,
           ROUND((c.n - 1) / SQRT(c.n)
                 * SQRT(c.z * c.z / (c.n - 2 + c.z * c.z)), 6)
               AS g_crit,
           c.g_stat > ROUND((c.n - 1) / SQRT(c.n)
                 * SQRT(c.z * c.z / (c.n - 2 + c.z * c.z)), 6)
               AS is_outlier
    FROM crit c JOIN val v ON c.brand = v.brand
    ORDER BY c.brand
    """,
)
def grubbs_outlier_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grubbs' maximum-studentized-deviate test per brand — the
    principled one-outlier screen behind 'is this price a typo or a
    tail?': G = max|x - mean|/sd against the Grubbs critical value
    at alpha = 0.05 (GRUBBS_ALPHA) with a Bonferroni 1/(2n) correction
    per candidate. The t-quantile inside the critical value uses the
    SAME 1.702-logistic normal inverse both engines share (documented
    approximation: exact Grubbs uses the t distribution; the normal
    form is asymptotically identical and conservative at lake n) —
    the distribution-aware upgrade of `mad_outlier_flags`' fixed-k
    rule, and `label_outlier_flags`' cross-slice sibling. The
    offending value itself is reported via a deterministic
    min-over-argmax (ties resolve to the smallest price).

    Scale shape: one brand-grain moments aggregate, one broadcast-
    back deviation pass, one brand-grain max — all map-side
    combinable; critical values are row-local arithmetic on the
    25-row brand panel."""
    part = load_table(spark, sf_dir, "part")
    return grubbs_cells(part, "p_brand", "p_retailprice").select(
        F.col("p_brand").alias("brand"),
        "n",
        F.col("mean_value").alias("mean_price"),
        F.col("sd_value").alias("sd_price"),
        "outlier_value",
        "g_stat",
        "g_crit",
        "is_outlier",
    )


_Z_ALPHA2 = 1.959964  # two-sided 5%
_Z_POWER = 0.841621  # 80% power
POWER_LIFT_GRID = (0.01, 0.02, 0.05, 0.10)


@query(
    "ab_power_analysis",
    oracle=f"""
    WITH base AS (
        SELECT o_totalprice AS x,
               CASE WHEN substr(md5(CAST(o_orderkey AS VARCHAR)), 1, 1)
                    < '8' THEN 'A' ELSE 'B' END AS cohort
        FROM orders
    ),
    mom AS (
        SELECT AVG(x) AS mu,
               VAR_SAMP(x) AS s2,
               LEAST(COUNT(*) FILTER (WHERE cohort = 'A'),
                     COUNT(*) FILTER (WHERE cohort = 'B')) AS n_arm
        FROM base
    )
    SELECT g.lift,
           ROUND(m.mu * g.lift, 6) AS delta,
           CAST(CEIL(2.0 * POWER({_Z_ALPHA2} + {_Z_POWER}, 2) * m.s2
                     / POWER(m.mu * g.lift, 2)) AS BIGINT)
               AS n_required_per_arm,
           CAST(m.n_arm AS BIGINT) AS n_available_per_arm,
           CEIL(2.0 * POWER({_Z_ALPHA2} + {_Z_POWER}, 2) * m.s2
                / POWER(m.mu * g.lift, 2)) <= m.n_arm AS powered,
           ROUND(({_Z_ALPHA2} + {_Z_POWER})
                 * SQRT(2.0 * m.s2 / m.n_arm) / m.mu, 6)
               AS mde_at_n
    FROM (SELECT unnest(ARRAY{list(POWER_LIFT_GRID)}) AS lift) g
    CROSS JOIN mom m
    ORDER BY g.lift
    """,
)
def ab_power_analysis(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A/B power analysis over the experiment's OWN moments — the
    question every readout must answer BEFORE `ab_lift_bootstrap`'s
    interval or `welch_ttest_slices`' p-value means anything: could
    this experiment even have detected the lift it cares about? Per
    target lift (1/2/5/10%): the absolute effect, the required n per
    arm at alpha=.05 two-sided / 80% power (the standard two-sample
    normal approximation n = 2(z_a/2+z_b)^2 s^2/delta^2), whether
    the CURRENT arms clear it, and the minimum detectable effect at
    the current n. An unpowered 'not significant' is a non-answer —
    this panel makes that visible as data.

    Scale shape: ONE moments aggregate over the fact scan (mean,
    sample variance, min arm size — all map-side combinable), then
    arithmetic on a 4-row literal lift grid crossed with the 1-row
    moments broadcast."""
    orders = load_table(spark, sf_dir, "orders")
    base = orders.select(
        F.col("o_totalprice").alias("x"),
        F.when(
            F.substring(F.md5(F.col("o_orderkey").cast("string")), 1, 1)
            < "8",
            "A",
        )
        .otherwise("B")
        .alias("cohort"),
    )
    mom = base.agg(
        F.avg("x").alias("mu"),
        F.var_samp("x").alias("s2"),
        F.least(
            F.sum(F.when(F.col("cohort") == "A", 1).otherwise(0)),
            F.sum(F.when(F.col("cohort") == "B", 1).otherwise(0)),
        ).alias("n_arm"),
    )
    grid = literal_grid(
        spark, "lift", [float(lift) for lift in POWER_LIFT_GRID], "double"
    )
    zsum2 = (_Z_ALPHA2 + _Z_POWER) ** 2
    n_req = F.ceil(
        2.0 * zsum2 * F.col("s2")
        / F.pow(F.col("mu") * F.col("lift"), 2)
    )
    return (
        grid.crossJoin(F.broadcast(mom))
        .select(
            "lift",
            F.round(F.col("mu") * F.col("lift"), 6).alias("delta"),
            n_req.cast("bigint").alias("n_required_per_arm"),
            F.col("n_arm").cast("bigint").alias("n_available_per_arm"),
            (n_req <= F.col("n_arm")).alias("powered"),
            F.round(
                (_Z_ALPHA2 + _Z_POWER)
                * F.sqrt(2.0 * F.col("s2") / F.col("n_arm"))
                / F.col("mu"),
                6,
            ).alias("mde_at_n"),
        )
        .orderBy("lift")
    )


@query(
    "sequential_ab_monitoring",
    oracle=f"""
    WITH base AS (
        SELECT date_trunc('week', o_orderdate) AS wk,
               o_totalprice AS x,
               CASE WHEN substr(md5(CAST(o_orderkey AS VARCHAR)), 1, 1)
                    < '8' THEN 'A' ELSE 'B' END AS cohort
        FROM orders
    ),
    weekly AS (
        SELECT wk,
               {", ".join(
                   f"SUM(CASE WHEN cohort = '{c}' THEN {expr}"
                   f" ELSE 0 END) AS w{m}_{c.lower()}"
                   for c in ("A", "B")
                   for m, expr in (("n", "1"), ("s", "x"), ("q", "x * x"))
               )}
        FROM base GROUP BY wk
    ),
    dedup AS (
        SELECT wk,
               ROW_NUMBER() OVER (ORDER BY wk) AS k,
               {", ".join(
                   f"SUM(w{m}_{c}) OVER (ORDER BY wk"
                   f" ROWS UNBOUNDED PRECEDING) AS {m}_{c}"
                   for c in ("a", "b") for m in ("n", "s", "q")
               )}
        FROM weekly
    ),
    kk AS (SELECT MAX(k) AS n_looks FROM dedup),
    z AS (
        SELECT d.wk, CAST(d.k AS BIGINT) AS look,
               CAST(d.n_a + d.n_b AS BIGINT) AS n_cum,
               ROUND((ROUND(d.s_a / d.n_a, 6)
                      - ROUND(d.s_b / d.n_b, 6))
                 / SQRT(ROUND((d.q_a - d.s_a * d.s_a / d.n_a)
                              / (d.n_a - 1), 6) / d.n_a
                        + ROUND((d.q_b - d.s_b * d.s_b / d.n_b)
                                / (d.n_b - 1), 6) / d.n_b), 6) AS z_k,
               ROUND({_Z_ALPHA2} * SQRT(CAST(kk.n_looks AS DOUBLE)
                                        / d.k), 6) AS obf_boundary
        FROM dedup d CROSS JOIN kk
        WHERE d.n_a > 1 AND d.n_b > 1
    )
    SELECT strftime(wk, '%Y-%m-%d') AS week, look, n_cum, z_k,
           obf_boundary,
           ABS(z_k) > obf_boundary AS crossed
    FROM z
    ORDER BY look
    """,
)
def sequential_ab_monitoring(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Group-sequential A/B monitoring with O'Brien-Fleming
    boundaries — the peeking-correct way to watch an experiment
    weekly (`ab_power_analysis` sizes it, `ab_lift_bootstrap` reads
    it once; reading it EVERY week at a fixed 1.96 cutoff inflates
    false positives severalfold, the classic peeking bug). Each
    weekly look k of K gets the OBF approximate boundary
    z_alpha/2 * sqrt(K/k) — nearly unspendable early, ~1.96 at the
    final look — against the cumulative Welch z from running
    (n, sum, sumsq) moments per cohort. `crossed` marks looks where
    early stopping is licensed.

    Scale shape: one (week, cohort) moments aggregate over the fact
    scan; cumulative sums ride windows over the CALENDAR-bounded
    week series; the look count is a 1-row broadcast. Nothing
    downstream of the first aggregate is corpus-grain."""
    orders = load_table(spark, sf_dir, "orders")
    base = orders.select(
        F.date_trunc("week", "o_orderdate").alias("wk"),
        F.col("o_totalprice").alias("x"),
        F.when(
            F.substring(F.md5(F.col("o_orderkey").cast("string")), 1, 1)
            < "8",
            "A",
        )
        .otherwise("B")
        .alias("cohort"),
    )
    exprs = {"n": F.lit(1), "s": F.col("x"), "q": F.col("x") * F.col("x")}
    weekly = base.groupBy("wk").agg(
        *[
            F.sum(
                F.when(F.col("cohort") == c, exprs[m]).otherwise(0)
            ).alias(f"w{m}_{c.lower()}")
            for c in ("A", "B")
            for m in ("n", "s", "q")
        ]
    )
    w_cum = Window.orderBy("wk").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    dedup = weekly.select(
        "wk",
        F.row_number().over(Window.orderBy("wk")).alias("k"),
        *[
            F.sum(f"w{m}_{c}").over(w_cum).alias(f"{m}_{c}")
            for c in ("a", "b")
            for m in ("n", "s", "q")
        ],
    )
    kk = dedup.agg(F.max("k").alias("n_looks"))
    var_a = F.round(
        (F.col("q_a") - F.col("s_a") * F.col("s_a") / F.col("n_a"))
        / (F.col("n_a") - 1),
        6,
    )
    var_b = F.round(
        (F.col("q_b") - F.col("s_b") * F.col("s_b") / F.col("n_b"))
        / (F.col("n_b") - 1),
        6,
    )
    z_k = F.round(
        (
            F.round(F.col("s_a") / F.col("n_a"), 6)
            - F.round(F.col("s_b") / F.col("n_b"), 6)
        )
        / F.sqrt(var_a / F.col("n_a") + var_b / F.col("n_b")),
        6,
    )
    bound = F.round(
        _Z_ALPHA2
        * F.sqrt(
            F.col("n_looks").cast("double") / F.col("k")
        ),
        6,
    )
    return (
        dedup.crossJoin(F.broadcast(kk))
        .filter((F.col("n_a") > 1) & (F.col("n_b") > 1))
        .select(
            F.date_format("wk", "yyyy-MM-dd").alias("week"),
            F.col("k").cast("bigint").alias("look"),
            (F.col("n_a") + F.col("n_b")).cast("bigint").alias("n_cum"),
            z_k.alias("z_k"),
            bound.alias("obf_boundary"),
            (F.abs(z_k) > bound).alias("crossed"),
        )
        .orderBy("look")
    )


@query(
    "price_elasticity_by_brand",
    oracle="""
    WITH obs AS (
        SELECT p.p_brand AS brand,
               LN(l.l_quantity) AS lq,
               LN(l.l_extendedprice / l.l_quantity) AS lp
        FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
        WHERE l.l_quantity > 0 AND l.l_extendedprice > 0
    )
    SELECT brand,
           CAST(COUNT(*) AS BIGINT) AS n_obs,
           ROUND(regr_slope(lq, lp), 6) AS elasticity,
           ROUND(regr_r2(lq, lp), 6) AS r2,
           ROUND(regr_slope(lq, lp), 6) < -1 AS elastic
    FROM obs
    GROUP BY brand
    ORDER BY brand
    """,
)
def price_elasticity_by_brand(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Own-price elasticity of demand per brand — the log-log OLS
    slope d ln(qty) / d ln(unit price), the first number a pricing
    analyst fits (elasticity < -1 = elastic demand: price cuts grow
    revenue; > -1 = inelastic): grouped linear regression done
    ENTIRELY by the JVM's map-side-combinable regr_* aggregates —
    no per-group fitting loop, no collect, one shuffle at brand
    grain. r2 qualifies the fit (TPC-H prices are uniform within a
    part, so real elasticities here are diagnostics of the
    generator, not economics — the SHAPE is what a deployment
    reuses on real transaction panels partitioned by SKU).

    Cross-engine pin: regr_slope/regr_r2 are covariance ratios of
    unordered float sums, stable to ~1e-12 relative across engines
    at any row count — the 6-dp round absorbs it (the
    metric_trend_fit discipline at brand grain)."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    obs = (
        li.filter(
            (F.col("l_quantity") > 0) & (F.col("l_extendedprice") > 0)
        )
        .join(part, li.l_partkey == part.p_partkey)
        .select(
            F.col("p_brand").alias("brand"),
            F.log(F.col("l_quantity")).alias("lq"),
            F.log(
                F.col("l_extendedprice") / F.col("l_quantity")
            ).alias("lp"),
        )
    )
    slope = F.round(F.regr_slope("lq", "lp"), 6)
    return (
        obs.groupBy("brand")
        .agg(
            F.count("*").cast("bigint").alias("n_obs"),
            slope.alias("elasticity"),
            F.round(F.regr_r2("lq", "lp"), 6).alias("r2"),
            (slope < -1).alias("elastic"),
        )
        .orderBy("brand")
    )


IPW_CLIP = 0.01  # propensity clip (positivity guard)


def ipw_ate_cells(
    df: DataFrame,
    strata: str = "brand",
    t: str = "t",
    y: str = "y",
    clip: float = IPW_CLIP,
) -> DataFrame:
    """Library core of `ipw_treatment_effect`
    (api.causal.ipw_ate_cells): Hajek-stabilized IPW ATE of binary
    treatment ``t`` on outcome ``y`` with a discrete-confounder
    propensity model at ``strata`` grain, clipped to
    [clip, 1 - clip]. One strata-grain aggregate broadcast back +
    one weighted-moment fold to a single row."""
    base = df.select(
        F.col(strata).alias("strata"),
        F.col(t).cast("int").alias("t"),
        F.col(y).cast("double").alias("y"),
    )
    prop = base.groupBy("strata").agg(
        F.least(
            F.greatest(F.avg(F.col("t") * 1.0), F.lit(clip)),
            F.lit(1 - clip),
        ).alias("e")
    )
    wtd = base.join(F.broadcast(prop), "strata")
    tt, yy, e = F.col("t"), F.col("y"), F.col("e")
    return wtd.agg(
        F.sum(tt).cast("bigint").alias("n_treat"),
        F.sum(1 - tt).cast("bigint").alias("n_ctrl"),
        F.round(
            F.sum(tt * yy) / F.sum(tt)
            - F.sum((1 - tt) * yy) / F.sum(1 - tt),
            6,
        ).alias("naive_diff"),
        F.round(
            F.sum(tt * yy / e) / F.sum(tt * 1.0 / e)
            - F.sum((1 - tt) * yy / (1 - e))
            / F.sum((1 - tt) * 1.0 / (1 - e)),
            6,
        ).alias("ipw_ate"),
        F.round(F.min("e"), 6).alias("min_propensity"),
        F.round(F.max("e"), 6).alias("max_propensity"),
    )


@query(
    "ipw_treatment_effect",
    oracle=f"""
    WITH base AS (
        SELECT p.p_brand AS brand,
               CASE WHEN p.p_type LIKE 'PROMO%' THEN 1 ELSE 0 END
                   AS t,
               l.l_extendedprice * (1 - l.l_discount) AS y
        FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    ),
    prop AS (
        SELECT brand,
               LEAST(GREATEST(AVG(t * 1.0), {IPW_CLIP}),
                     1 - {IPW_CLIP}) AS e
        FROM base GROUP BY 1
    ),
    wtd AS (
        SELECT b.t, b.y, p.e FROM base b JOIN prop p USING (brand)
    )
    SELECT CAST(SUM(t) AS BIGINT) AS n_treat,
           CAST(SUM(1 - t) AS BIGINT) AS n_ctrl,
           ROUND(SUM(t * y) / SUM(t)
                 - SUM((1 - t) * y) / SUM(1 - t), 6) AS naive_diff,
           ROUND(SUM(t * y / e) / SUM(t * 1.0 / e)
                 - SUM((1 - t) * y / (1 - e))
                   / SUM((1 - t) * 1.0 / (1 - e)), 6) AS ipw_ate,
           ROUND(MIN(e), 6) AS min_propensity,
           ROUND(MAX(e), 6) AS max_propensity
    FROM wtd
    """,
)
def ipw_treatment_effect(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Inverse-propensity-weighted average treatment effect of promo
    part types on line revenue — observational causal inference
    beside the experimental family (`welch_ttest_slices` assumes
    randomization; promo assignment is NOT random, it varies by
    brand): propensity e(brand) = P(promo | brand), each unit
    weighted 1/e (treated) or 1/(1-e) (control), Hajek-stabilized
    (ratio of weighted sums, Horvitz-Thompson's variance fix),
    propensities clipped to [0.01, 0.99] for positivity. naive_diff
    beside ipw_ate IS the confounding read: they diverge exactly
    when brand mix differs across arms (the planted test forces
    that divergence and IPW's recovery of the true null).

    Scale shape: one fact-dim join, a brand-grain propensity
    aggregate broadcast back (25 rows), and ONE map-side-combinable
    weighted-moment aggregate to a single row — the welch shape
    with weights. The brand-grain model generalizes to any discrete
    confounder grid; continuous confounders bucket to
    percentile-boundary cells first (the lorenz discipline)."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    base = li.join(part, li.l_partkey == part.p_partkey).select(
        F.col("p_brand").alias("brand"),
        F.when(F.col("p_type").startswith("PROMO"), 1)
        .otherwise(0)
        .alias("t"),
        (F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias(
            "y"
        ),
    )
    return ipw_ate_cells(base, strata="brand")


DID_SPLIT = "1996-01-01"  # pre/post boundary for the DiD panel
DID_SEGMENT = "BUILDING"  # 'treated' cohort


def did_cells(
    df: DataFrame,
    treated: str = "treated",
    post: str = "post",
    y: str = "y",
) -> DataFrame:
    """Library core of `diff_in_diff_revenue`
    (api.causal.did_cells): 2x2 difference-in-differences over any
    frame with binary ``treated``/``post`` columns and outcome
    ``y`` — the four cell means, the treated-group count, and the
    interaction estimate, in ONE conditional-aggregate pass."""
    cells = df.select(
        F.col(treated).cast("int").alias("treated"),
        F.col(post).cast("int").alias("post"),
        F.col(y).cast("double").alias("y"),
    )

    def cell(tr, po):
        return F.avg(
            F.when(
                (F.col("treated") == tr) & (F.col("post") == po),
                F.col("y"),
            )
        )

    return cells.agg(
        F.sum(F.when(F.col("treated") == 1, 1).otherwise(0))
        .cast("bigint")
        .alias("n_treated"),
        F.round(cell(1, 0), 6).alias("pre_treated"),
        F.round(cell(1, 1), 6).alias("post_treated"),
        F.round(cell(0, 0), 6).alias("pre_control"),
        F.round(cell(0, 1), 6).alias("post_control"),
        F.round(
            (cell(1, 1) - cell(1, 0)) - (cell(0, 1) - cell(0, 0)), 6
        ).alias("did_estimate"),
    )


@query(
    "diff_in_diff_revenue",
    oracle=f"""
    WITH cells AS (
        SELECT CASE WHEN c.c_mktsegment = '{DID_SEGMENT}'
                    THEN 1 ELSE 0 END AS treated,
               CASE WHEN o.o_orderdate >= TIMESTAMP '{DID_SPLIT}'
                    THEN 1 ELSE 0 END AS post,
               o.o_totalprice AS y
        FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    )
    SELECT CAST(SUM(CASE WHEN treated = 1 THEN 1 ELSE 0 END)
                AS BIGINT) AS n_treated,
           ROUND(AVG(CASE WHEN treated = 1 AND post = 0 THEN y END),
                 6) AS pre_treated,
           ROUND(AVG(CASE WHEN treated = 1 AND post = 1 THEN y END),
                 6) AS post_treated,
           ROUND(AVG(CASE WHEN treated = 0 AND post = 0 THEN y END),
                 6) AS pre_control,
           ROUND(AVG(CASE WHEN treated = 0 AND post = 1 THEN y END),
                 6) AS post_control,
           ROUND(
               (AVG(CASE WHEN treated = 1 AND post = 1 THEN y END)
                - AVG(CASE WHEN treated = 1 AND post = 0 THEN y END))
               - (AVG(CASE WHEN treated = 0 AND post = 1 THEN y END)
                  - AVG(CASE WHEN treated = 0 AND post = 0 THEN y END)
                 ), 6) AS did_estimate
    FROM cells
    """,
)
def diff_in_diff_revenue(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Difference-in-differences on mean order value: the BUILDING
    segment ('treated' by some 1996 intervention) vs everyone else,
    before vs after the split date — the workhorse quasi-experiment
    when randomization is impossible and IPW's no-unmeasured-
    confounding is too strong: any time-invariant segment
    difference cancels in the first difference, any common shock
    cancels in the second, and what is left (did_estimate) is the
    treatment effect under parallel trends. The four cell means are
    emitted so the analyst can check that pre-period levels differ
    (why naive post-only comparison would lie) and plot the trends.

    Scale shape: one fact-dim join and ONE conditional-aggregate
    pass to a single row — the 2x2 panel is entirely
    map-side-combinable CASE arithmetic, the cheapest causal
    estimator a lake can run."""
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    cells = orders.join(
        cust, orders.o_custkey == cust.c_custkey
    ).select(
        F.when(F.col("c_mktsegment") == DID_SEGMENT, 1)
        .otherwise(0)
        .alias("treated"),
        F.when(F.col("o_orderdate") >= F.lit(DID_SPLIT), 1)
        .otherwise(0)
        .alias("post"),
        F.col("o_totalprice").alias("y"),
    )
    return did_cells(cells)


CUPED_SPLIT = "1996-01-01"  # pre-period / experiment boundary


@query(
    "cuped_adjusted_ab",
    oracle=f"""
    WITH per_cust AS (
        SELECT c.c_custkey,
               CASE WHEN c.c_mktsegment = 'BUILDING'
                    THEN 1 ELSE 0 END AS t,
               SUM(CASE WHEN o.o_orderdate < TIMESTAMP '{CUPED_SPLIT}'
                        THEN o.o_totalprice ELSE 0 END) / 1e3 AS x,
               SUM(CASE WHEN o.o_orderdate >= TIMESTAMP '{CUPED_SPLIT}'
                        THEN o.o_totalprice ELSE 0 END) / 1e3 AS y
        FROM customer c JOIN orders o ON o.o_custkey = c.c_custkey
        GROUP BY 1, 2
    ),
    theta AS (
        SELECT covar_pop(x, y) / GREATEST(var_pop(x), 1e-12)
                   AS th,
               AVG(x) AS mx
        FROM per_cust
    ),
    adj AS (
        SELECT p.t, p.y,
               p.y - th.th * (p.x - th.mx) AS y_cuped
        FROM per_cust p CROSS JOIN theta th
    )
    SELECT CAST(SUM(t) AS BIGINT) AS n_treat,
           CAST(SUM(1 - t) AS BIGINT) AS n_ctrl,
           ROUND(SUM(t * y) / SUM(t)
                 - SUM((1 - t) * y) / SUM(1 - t), 6) AS raw_diff,
           ROUND(SUM(t * y_cuped) / SUM(t)
                 - SUM((1 - t) * y_cuped) / SUM(1 - t), 6)
               AS cuped_diff,
           ROUND(var_pop(y), 6) AS var_raw,
           ROUND(var_pop(y_cuped), 6) AS var_cuped,
           ROUND(1 - var_pop(y_cuped)
                 / GREATEST(var_pop(y), 1e-12), 6)
               AS variance_reduction
    FROM adj
    """,
)
def cuped_adjusted_ab(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUPED-adjusted cohort comparison (Deng et al. 2013, the
    variance-reduction standard in modern experimentation): each
    customer's PRE-period spend is the covariate, theta =
    cov(x, y)/var(x) fit on the pooled panel, y_cuped = y -
    theta (x - mean x) — the adjustment removes the outcome variance
    the pre-period already explains WITHOUT biasing the diff (the
    covariate predates the treatment by construction). Reported:
    raw vs adjusted between-segment diff and the variance-reduction
    ratio — the number that says how much smaller an experiment
    this metric now needs (`ab_power_analysis` consumes exactly
    that variance). The segment 'treatment' is observational here
    (the shape is what a deployment reuses on real assignment).

    Scale shape: one fact-dim join into a customer-grain conditional
    pivot, a 1-row theta/mean broadcast back, ONE weighted-moment
    fold. Welch-family float discipline (spend rescaled to 1e3, all
    outputs 6-dp-pinned)."""
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    per_cust = (
        orders.join(cust, orders.o_custkey == cust.c_custkey)
        .groupBy("c_custkey", "c_mktsegment")
        .agg(
            (
                F.sum(
                    F.when(
                        F.col("o_orderdate") < F.lit(CUPED_SPLIT),
                        F.col("o_totalprice"),
                    ).otherwise(0.0)
                )
                / 1e3
            ).alias("x"),
            (
                F.sum(
                    F.when(
                        F.col("o_orderdate") >= F.lit(CUPED_SPLIT),
                        F.col("o_totalprice"),
                    ).otherwise(0.0)
                )
                / 1e3
            ).alias("y"),
        )
        .select(
            F.when(F.col("c_mktsegment") == "BUILDING", 1)
            .otherwise(0)
            .alias("t"),
            "x",
            "y",
        )
    )
    theta = per_cust.agg(
        (
            F.covar_pop("x", "y")
            / F.greatest(F.var_pop("x"), F.lit(1e-12))
        ).alias("th"),
        F.avg("x").alias("mx"),
    )
    adj = per_cust.crossJoin(F.broadcast(theta)).select(
        "t",
        "y",
        (
            F.col("y") - F.col("th") * (F.col("x") - F.col("mx"))
        ).alias("y_cuped"),
    )
    t, y, yc = F.col("t"), F.col("y"), F.col("y_cuped")
    return adj.agg(
        F.sum(t).cast("bigint").alias("n_treat"),
        F.sum(1 - t).cast("bigint").alias("n_ctrl"),
        F.round(
            F.sum(t * y) / F.sum(t) - F.sum((1 - t) * y) / F.sum(1 - t),
            6,
        ).alias("raw_diff"),
        F.round(
            F.sum(t * yc) / F.sum(t)
            - F.sum((1 - t) * yc) / F.sum(1 - t),
            6,
        ).alias("cuped_diff"),
        F.round(F.var_pop("y"), 6).alias("var_raw"),
        F.round(F.var_pop("y_cuped"), 6).alias("var_cuped"),
        F.round(
            1
            - F.var_pop("y_cuped")
            / F.greatest(F.var_pop("y"), F.lit(1e-12)),
            6,
        ).alias("variance_reduction"),
    )


@query(
    "simpson_reversal_audit",
    oracle="""
    WITH base AS (
        SELECT p.p_brand AS stratum,
               CASE WHEN p.p_type LIKE 'PROMO%' THEN 1 ELSE 0 END
                   AS t,
               l.l_extendedprice * (1 - l.l_discount) AS y
        FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    ),
    per_stratum AS (
        SELECT stratum,
               CAST(SUM(t) AS BIGINT) AS n_treat,
               CAST(SUM(1 - t) AS BIGINT) AS n_ctrl,
               ROUND(SUM(t * y) / NULLIF(SUM(t), 0)
                     - SUM((1 - t) * y) / NULLIF(SUM(1 - t), 0), 6)
                   AS stratum_diff
        FROM base GROUP BY 1
        HAVING SUM(t) > 0 AND SUM(1 - t) > 0
    ),
    overall AS (
        SELECT ROUND(SUM(t * y) / SUM(t)
                     - SUM((1 - t) * y) / SUM(1 - t), 6) AS odiff
        FROM base
    )
    SELECT s.stratum,
           s.n_treat, s.n_ctrl, s.stratum_diff,
           o.odiff AS overall_diff,
           SIGN(s.stratum_diff) <> SIGN(o.odiff)
               AND s.stratum_diff <> 0 AND o.odiff <> 0
               AS sign_reversed
    FROM per_stratum s CROSS JOIN overall o
    ORDER BY s.stratum
    """,
)
def simpson_reversal_audit(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Simpson's-paradox audit of the promo/revenue association: the
    overall treated-vs-control difference beside EVERY brand
    stratum's own difference, with a sign_reversed flag per stratum
    — the table that says whether the aggregate number on the
    dashboard points the OPPOSITE way once the confounder is held
    fixed (Simpson 1951; `ipw_treatment_effect` then states the
    deconfounded number, this audit shows WHERE the aggregation
    flipped it; strata with one empty arm are excluded — their diff
    does not exist, the classic divide-by-zero the HAVING guards).

    Scale shape: one fact-dim join, ONE stratum-grain conditional
    aggregate (25 brands), a 1-row overall broadcast. The
    inspection table every causal readout should attach."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    base = li.join(part, li.l_partkey == part.p_partkey).select(
        F.col("p_brand").alias("stratum"),
        F.when(F.col("p_type").startswith("PROMO"), 1)
        .otherwise(0)
        .alias("t"),
        (F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias(
            "y"
        ),
    )
    t, y = F.col("t"), F.col("y")
    per_stratum = (
        base.groupBy("stratum")
        .agg(
            F.sum(t).cast("bigint").alias("n_treat"),
            F.sum(1 - t).cast("bigint").alias("n_ctrl"),
            F.round(
                F.sum(t * y) / F.nullif(F.sum(t), F.lit(0))
                - F.sum((1 - t) * y)
                / F.nullif(F.sum(1 - t), F.lit(0)),
                6,
            ).alias("stratum_diff"),
        )
        .filter((F.col("n_treat") > 0) & (F.col("n_ctrl") > 0))
    )
    overall = base.agg(
        F.round(
            F.sum(t * y) / F.sum(t) - F.sum((1 - t) * y) / F.sum(1 - t),
            6,
        ).alias("odiff")
    )
    return (
        per_stratum.crossJoin(F.broadcast(overall))
        .select(
            "stratum",
            "n_treat",
            "n_ctrl",
            "stratum_diff",
            F.col("odiff").alias("overall_diff"),
            (
                (F.signum("stratum_diff") != F.signum("odiff"))
                & (F.col("stratum_diff") != 0)
                & (F.col("odiff") != 0)
            ).alias("sign_reversed"),
        )
        .orderBy("stratum")
    )


POS_LO, POS_HI = 0.05, 0.95  # positivity (overlap) bounds


@query(
    "propensity_overlap_audit",
    oracle=f"""
    WITH base AS (
        SELECT p.p_brand AS stratum,
               CASE WHEN p.p_type LIKE 'PROMO%' THEN 1 ELSE 0 END
                   AS t
        FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    ),
    prop AS (
        SELECT stratum,
               CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(t) AS BIGINT) AS n_treat,
               AVG(t * 1.0) AS e
        FROM base GROUP BY 1
    ),
    ess AS (
        SELECT SUM(CASE WHEN t = 1 THEN 1.0 / GREATEST(e, 1e-12)
                        ELSE 0 END) AS sw_t,
               SUM(CASE WHEN t = 1
                        THEN (1.0 / GREATEST(e, 1e-12))
                             * (1.0 / GREATEST(e, 1e-12))
                        ELSE 0 END) AS sw2_t,
               SUM(CASE WHEN t = 0 THEN 1.0 / GREATEST(1 - e, 1e-12)
                        ELSE 0 END) AS sw_c,
               SUM(CASE WHEN t = 0
                        THEN (1.0 / GREATEST(1 - e, 1e-12))
                             * (1.0 / GREATEST(1 - e, 1e-12))
                        ELSE 0 END) AS sw2_c
        FROM base b JOIN prop p USING (stratum)
    )
    SELECT p.stratum, p.n, p.n_treat,
           ROUND(p.e, 6) AS propensity,
           p.e < {POS_LO} OR p.e > {POS_HI} AS positivity_violated,
           ROUND((SELECT sw_t * sw_t / sw2_t FROM ess), 6)
               AS ess_treated,
           ROUND((SELECT sw_c * sw_c / sw2_c FROM ess), 6)
               AS ess_control
    FROM prop p
    ORDER BY p.stratum
    """,
)
def propensity_overlap_audit(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Positivity / overlap diagnostics for the IPW design — the
    assumptions page `ipw_treatment_effect` must publish with its
    estimate (Crump et al. 2009): per stratum, the raw propensity
    with a violated flag outside [0.05, 0.95] (strata where one arm
    barely exists make the weights explode — the clipping in the
    estimator hides, this audit SHOWS), plus Kish's effective
    sample size of the inverse-propensity weights per arm (ESS =
    (sum w)^2 / sum w^2 — how many unweighted units the weighted
    analysis is really worth; ESS << n is the overlap-failure
    smoking gun even when no single stratum violates).

    Scale shape: one fact-dim join, one stratum-grain propensity
    aggregate, one weighted-moment fold to the 1-row ESS pair
    broadcast onto the 25-row panel."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    base = li.join(part, li.l_partkey == part.p_partkey).select(
        F.col("p_brand").alias("stratum"),
        F.when(F.col("p_type").startswith("PROMO"), 1)
        .otherwise(0)
        .alias("t"),
    )
    prop = base.groupBy("stratum").agg(
        F.count("*").cast("bigint").alias("n"),
        F.sum("t").cast("bigint").alias("n_treat"),
        F.avg(F.col("t") * 1.0).alias("e"),
    )
    wtd = base.join(F.broadcast(prop.select("stratum", "e")), "stratum")
    wt = 1.0 / F.greatest(F.col("e"), F.lit(1e-12))
    wc = 1.0 / F.greatest(1 - F.col("e"), F.lit(1e-12))
    t = F.col("t")
    ess = wtd.agg(
        F.sum(F.when(t == 1, wt).otherwise(0.0)).alias("sw_t"),
        F.sum(F.when(t == 1, wt * wt).otherwise(0.0)).alias("sw2_t"),
        F.sum(F.when(t == 0, wc).otherwise(0.0)).alias("sw_c"),
        F.sum(F.when(t == 0, wc * wc).otherwise(0.0)).alias("sw2_c"),
    )
    return (
        prop.crossJoin(F.broadcast(ess))
        .select(
            "stratum",
            "n",
            "n_treat",
            F.round("e", 6).alias("propensity"),
            ((F.col("e") < POS_LO) | (F.col("e") > POS_HI)).alias(
                "positivity_violated"
            ),
            F.round(
                F.col("sw_t") * F.col("sw_t") / F.col("sw2_t"), 6
            ).alias("ess_treated"),
            F.round(
                F.col("sw_c") * F.col("sw_c") / F.col("sw2_c"), 6
            ).alias("ess_control"),
        )
        .orderBy("stratum")
    )


@query(
    "wilson_conversion_ci",
    oracle=f"""
    WITH conv AS (
        SELECT c.c_mktsegment AS segment,
               CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(CASE WHEN o.o_custkey IS NOT NULL
                        THEN 1 ELSE 0 END) AS BIGINT) AS k
        FROM customer c
        LEFT JOIN (SELECT DISTINCT o_custkey FROM orders) o
          ON o.o_custkey = c.c_custkey
        GROUP BY 1
    ),
    scored AS (
        SELECT segment, n, k,
               k * 1.0 / n AS p,
               {WELCH_Z_95} AS z
        FROM conv
    )
    SELECT segment, n, k,
           ROUND(p, 6) AS rate,
           ROUND((p + z * z / (2 * n)
                  - z * SQRT(p * (1 - p) / n
                             + z * z / (4.0 * n * n)))
                 / (1 + z * z / n), 6) AS wilson_lo,
           ROUND((p + z * z / (2 * n)
                  + z * SQRT(p * (1 - p) / n
                             + z * z / (4.0 * n * n)))
                 / (1 + z * z / n), 6) AS wilson_hi
    FROM scored
    ORDER BY segment
    """,
)
def wilson_conversion_ci(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Wilson score intervals for customer conversion (has >= 1
    order) per market segment — the CORRECT small-n binomial
    interval (Wilson 1927; the Wald interval collapses to zero
    width at p near 0/1 and undercovers everywhere, which is why
    every style guide bans it from dashboards): closed-form center
    (p + z^2/2n)/(1 + z^2/n) and half-width, no erf, the same
    1.959964 constant as the Welch family. Two segments whose
    Wilson intervals do not overlap differ without any further
    test — the glanceable version of `welch_ttest_slices` for
    rates.

    Scale shape: one distinct-buyer semi-aggregate, one left join
    at customer grain, a 5-row segment fold, pure closed-form
    arithmetic after."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    buyers = orders.select("o_custkey").distinct()
    conv = (
        cust.join(
            buyers, cust.c_custkey == buyers.o_custkey, "left"
        )
        .groupBy(F.col("c_mktsegment").alias("segment"))
        .agg(
            F.count("*").cast("bigint").alias("n"),
            F.sum(
                F.when(F.col("o_custkey").isNotNull(), 1).otherwise(0)
            )
            .cast("bigint")
            .alias("k"),
        )
    )
    p = F.col("k") * 1.0 / F.col("n")
    z = F.lit(WELCH_Z_95)
    denom = 1 + z * z / F.col("n")
    center = p + z * z / (2 * F.col("n"))
    half = z * F.sqrt(
        p * (1 - p) / F.col("n")
        + z * z / (4.0 * F.col("n") * F.col("n"))
    )
    return conv.select(
        "segment",
        "n",
        "k",
        F.round(p, 6).alias("rate"),
        F.round((center - half) / denom, 6).alias("wilson_lo"),
        F.round((center + half) / denom, 6).alias("wilson_hi"),
    ).orderBy("segment")

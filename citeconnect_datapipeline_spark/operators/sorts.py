"""Sorts / limits / top-k (SURVEY.md SS2.7 O1-O5).

The reference's top-k paths are ``np.argsort(...)[::-1][:k]`` over
the in-memory similarity vector (embeddings/local_embedder.py:119)
and pandas ``sort_values``/``nlargest`` over aggregates
(databias/slicing_bias_analysis.py:229-234,
databias/visualization_generator.py:66,403). Spark's ORDER BY+LIMIT
physical-plans to TakeOrderedAndProject: each partition keeps a k-heap
and only k rows per partition reach the driver-side merge -- the only
formulation that survives 100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..plans.registry import query
from ..sources.tables import load_table


@query(
    "topk_by_score",
    oracle="""
    SELECT o_orderkey, o_custkey, ROUND(o_totalprice, 6) AS o_totalprice
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 25
    """,
)
def topk_by_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global top-k (O1/O3): argsort-desc-head restated so Spark plans
    TakeOrderedAndProject (per-partition heaps, no full sort).
    o_orderkey tie-break keeps the limit deterministic."""
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.select(
            "o_orderkey", "o_custkey", F.round("o_totalprice", 6).alias("o_totalprice")
        )
        .orderBy(F.desc("o_totalprice"), "o_orderkey")
        .limit(25)
    )


@query(
    "sort_by_aggregate",
    oracle="""
    SELECT c_mktsegment AS segment, COUNT(*) AS n,
           ROUND(AVG(c_acctbal), 6) AS mean_acctbal
    FROM customer
    GROUP BY c_mktsegment
    ORDER BY mean_acctbal DESC, segment
    """,
)
def sort_by_aggregate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sort by computed aggregate (O2): sort_values('mean_citations',
    ascending=False) of slicing_bias_analysis.py:229. Sorting happens
    on the tiny aggregate, after the shuffle."""
    customer = load_table(spark, sf_dir, "customer")
    return (
        customer.groupBy(F.col("c_mktsegment").alias("segment"))
        .agg(
            F.count("*").alias("n"),
            F.round(F.avg("c_acctbal"), 6).alias("mean_acctbal"),
        )
        .orderBy(F.desc("mean_acctbal"), "segment")
    )


@query(
    "priority_sort",
    oracle="""
    SELECT o_orderkey, o_orderpriority, ROUND(o_totalprice, 6) AS o_totalprice
    FROM orders
    ORDER BY (o_orderpriority = '1-URGENT') DESC,
             o_totalprice DESC, o_orderkey
    LIMIT 50
    """,
)
def priority_sort(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Computed-key priority sort (O4): the mitigation collector's
    sort by (priority=='high', papers_needed) desc
    (databias/bias_mitigation_collector.py:61-68) -- a boolean
    expression as the leading sort key."""
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.select(
            "o_orderkey",
            "o_orderpriority",
            F.round("o_totalprice", 6).alias("o_totalprice"),
        )
        .orderBy(
            F.desc(F.col("o_orderpriority") == "1-URGENT"),
            F.desc("o_totalprice"),
            "o_orderkey",
        )
        .limit(50)
    )


@query(
    "sort_index_counts",
    oracle="""
    SELECT EXTRACT(YEAR FROM o_orderdate) AS year, COUNT(*) AS n
    FROM orders
    GROUP BY year
    ORDER BY year
    """,
)
def sort_index_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """value_counts().sort_index() (O5): distribution ordered by the
    group key (databias/analyze_bias.py:64)."""
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.groupBy(F.year("o_orderdate").cast("long").alias("year"))
        .agg(F.count("*").alias("n"))
        .orderBy("year")
    )


TREND_HALFLIFE_DAYS = 30.0  # decay half-life for trending scores
TREND_TOPK = 20


@query(
    "trending_parts_decayed",
    oracle=f"""
    WITH mx AS (SELECT MAX(o_orderdate) AS now FROM orders),
    li AS (
        SELECT l.l_partkey,
               (epoch_us(m.now) - epoch_us(o.o_orderdate))
               / 86400000000.0 AS age_days
        FROM lineitem l
        JOIN orders o ON l.l_orderkey = o.o_orderkey
        CROSS JOIN mx m
    ),
    scored AS (
        SELECT l_partkey,
               CAST(COUNT(*) AS BIGINT) AS n_orders,
               ROUND(SUM(POWER(0.5,
                   age_days / {TREND_HALFLIFE_DAYS})), 6)
                   AS decayed_score
        FROM li GROUP BY l_partkey
    ),
    ranked AS (
        SELECT l_partkey, n_orders, decayed_score,
               ROW_NUMBER() OVER (ORDER BY decayed_score DESC,
                                  l_partkey) AS trend_rank,
               ROW_NUMBER() OVER (ORDER BY n_orders DESC, l_partkey)
                   AS alltime_rank
        FROM scored
    )
    SELECT l_partkey, n_orders, decayed_score,
           CAST(trend_rank AS BIGINT) AS trend_rank,
           CAST(alltime_rank AS BIGINT) AS alltime_rank,
           CAST(alltime_rank - trend_rank AS BIGINT) AS rank_gain
    FROM ranked
    WHERE trend_rank <= {TREND_TOPK}
    ORDER BY trend_rank
    """,
)
def trending_parts_decayed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-decayed popularity — the ranking primitive behind every
    "trending now" surface: each order contributes
    0.5^(age/30-days) to its part's score (exponential decay,
    half-life 30 days, anchored at the corpus's newest order so the
    query is deterministic), reported beside the all-time count rank
    so rank_gain exposes what decay CHANGES — rising items an
    all-time top-k structurally cannot surface. The streaming twin
    (`streaming.jobs.decayed_popularity_stream`) folds the same
    decay into state multiplicatively (score = score * 0.5^(dt/hl)
    + 1 per event; stream==batch parity in tests/test_streaming.py);
    this is its batch replay.

    Scale shape: the decay weight is per-row codegen arithmetic on
    the fact scan (anchor = 1-row broadcast), one part-grain
    map-side-combinable aggregate, then a distributed
    TakeOrdered(20) — never a global sort or a part-grain window —
    so the trend rank window runs on the 20-row head; alltime_rank
    is a rank-by-count: the 20-row head broadcast theta-joined back
    against the part-grain score table counts the rows ordered
    ahead of each head part (an O(parts x 20) comparison scan, no
    single-partition sort of the part domain)."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey"
    )
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate"
    )
    mx = orders.agg(F.max("o_orderdate").alias("now"))
    age_days = (
        F.unix_micros("now") - F.unix_micros("o_orderdate")
    ) / 86_400_000_000.0
    scored = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .crossJoin(F.broadcast(mx))
        .groupBy("l_partkey")
        .agg(
            F.count("*").alias("n_orders"),
            F.round(
                F.sum(F.pow(F.lit(0.5), age_days / TREND_HALFLIFE_DAYS)),
                6,
            ).alias("decayed_score"),
        )
    )
    head = (
        scored.orderBy(F.desc("decayed_score"), "l_partkey")
        .limit(TREND_TOPK)
        .select(
            "l_partkey",
            "n_orders",
            "decayed_score",
            F.row_number()
            .over(Window.orderBy(F.desc("decayed_score"), "l_partkey"))
            .cast("bigint")
            .alias("trend_rank"),
        )
    )
    # alltime_rank by counting, per head part, the parts ordered at
    # or ahead of it in (n_orders DESC, l_partkey) — the part itself
    # matches its own predicate, so COUNT(*) over the inner theta
    # join IS the 1-based rank (identical to ROW_NUMBER over a total
    # order, without sorting the part domain in one task).
    ahead = scored.select(
        F.col("n_orders").alias("s_n"), F.col("l_partkey").alias("s_pk")
    )
    at_or_ahead = (F.col("s_n") > F.col("n_orders")) | (
        (F.col("s_n") == F.col("n_orders"))
        & (F.col("s_pk") <= F.col("l_partkey"))
    )
    return (
        ahead.join(F.broadcast(head), at_or_ahead)
        .groupBy("l_partkey", "n_orders", "decayed_score", "trend_rank")
        .agg(F.count("*").cast("bigint").alias("alltime_rank"))
        .select(
            "l_partkey",
            "n_orders",
            "decayed_score",
            "trend_rank",
            "alltime_rank",
            (F.col("alltime_rank") - F.col("trend_rank")).alias("rank_gain"),
        )
        .orderBy("trend_rank")
    )


RBO_P = 0.9  # rank-biased overlap persistence (top-weightedness)


@query(
    "rank_biased_overlap",
    oracle=f"""
    WITH mx AS (SELECT MAX(o_orderdate) AS now FROM orders),
    li AS (
        SELECT l.l_partkey,
               (epoch_us(m.now) - epoch_us(o.o_orderdate))
               / 86400000000.0 AS age_days
        FROM lineitem l
        JOIN orders o ON l.l_orderkey = o.o_orderkey
        CROSS JOIN mx m
    ),
    scored AS (
        SELECT l_partkey,
               COUNT(*) AS n_orders,
               ROUND(SUM(POWER(0.5,
                   age_days / {TREND_HALFLIFE_DAYS})), 6)
                   AS decayed_score
        FROM li GROUP BY l_partkey
    ),
    ranked AS MATERIALIZED (
        SELECT l_partkey,
               ROW_NUMBER() OVER (ORDER BY decayed_score DESC,
                                  l_partkey) AS trend_rank,
               ROW_NUMBER() OVER (ORDER BY n_orders DESC, l_partkey)
                   AS alltime_rank
        FROM scored
    ),
    in_both AS (
        SELECT GREATEST(trend_rank, alltime_rank) AS m
        FROM ranked
        WHERE trend_rank <= {TREND_TOPK}
          AND alltime_rank <= {TREND_TOPK}
    ),
    grid AS (
        SELECT d.d,
               (SELECT COUNT(*) FROM in_both b WHERE b.m <= d.d)
                   AS n_overlap
        FROM generate_series(1, {TREND_TOPK}) AS d(d)
    ),
    contrib AS (
        SELECT d, n_overlap,
               ROUND(n_overlap * 1.0 / d, 6) AS agreement,
               ROUND((1.0 - {RBO_P}) * POWER({RBO_P}, d - 1)
                     * n_overlap / d, 6) AS contribution
        FROM grid
    )
    SELECT CAST(d AS BIGINT) AS depth,
           CAST(n_overlap AS BIGINT) AS n_overlap,
           agreement, contribution,
           ROUND(SUM(contribution) OVER (ORDER BY d
                 ROWS UNBOUNDED PRECEDING), 6) AS rbo_cum
    FROM contrib
    ORDER BY depth
    """,
)
def rank_biased_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rank-biased overlap (Webber et al. 2010) between the decayed
    trending ranking and the all-time popularity ranking — the
    ranking-drift metric `trending_parts_decayed` motivates: RBO
    weights prefix agreement geometrically (persistence p=0.9, so
    depth-1 agreement matters most), which is how ranking changes
    are compared in IR and how a feed team quantifies "how different
    is today's ranking". Emits the full depth profile (overlap,
    agreement, per-depth contribution, cumulative RBO@d) so the
    divergence DEPTH is visible, not just the scalar.

    Scale shape: both rankings come from one part-grain aggregate
    (the same plan as `trending_parts_decayed`), and each prefix is
    a distributed TakeOrdered(20) ranked AFTER the limit — no
    part-grain window, no global sort; everything after operates on
    two 20-row prefixes — the depth grid, the overlap counts, and
    the running RBO sum are all bounded by TREND_TOPK, never by the
    corpus."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey"
    )
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate"
    )
    mx = orders.agg(F.max("o_orderdate").alias("now"))
    age_days = (
        F.unix_micros("now") - F.unix_micros("o_orderdate")
    ) / 86_400_000_000.0
    scored = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .crossJoin(F.broadcast(mx))
        .groupBy("l_partkey")
        .agg(
            F.count("*").alias("n_orders"),
            F.round(
                F.sum(F.pow(F.lit(0.5), age_days / TREND_HALFLIFE_DAYS)),
                6,
            ).alias("decayed_score"),
        )
    )
    trend_head = (
        scored.orderBy(F.desc("decayed_score"), "l_partkey")
        .limit(TREND_TOPK)
        .select(
            "l_partkey",
            F.row_number()
            .over(Window.orderBy(F.desc("decayed_score"), "l_partkey"))
            .alias("trend_rank"),
        )
    )
    alltime_head = (
        scored.orderBy(F.desc("n_orders"), "l_partkey")
        .limit(TREND_TOPK)
        .select(
            "l_partkey",
            F.row_number()
            .over(Window.orderBy(F.desc("n_orders"), "l_partkey"))
            .alias("alltime_rank"),
        )
    )
    in_both = trend_head.join(alltime_head, "l_partkey").select(
        F.greatest("trend_rank", "alltime_rank").alias("m")
    )
    grid = spark.range(1, TREND_TOPK + 1).select(
        F.col("id").alias("depth")
    )
    overlap = (
        grid.join(
            F.broadcast(in_both), F.col("m") <= F.col("depth"), "left"
        )
        .groupBy("depth")
        .agg(F.count("m").alias("n_overlap"))
    )
    contribution = F.round(
        (1.0 - RBO_P)
        * F.pow(F.lit(RBO_P), F.col("depth") - 1)
        * F.col("n_overlap")
        / F.col("depth"),
        6,
    )
    wcum = Window.orderBy("depth").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return (
        overlap.select(
            F.col("depth").cast("bigint").alias("depth"),
            F.col("n_overlap").cast("bigint").alias("n_overlap"),
            F.round(F.col("n_overlap") * 1.0 / F.col("depth"), 6).alias(
                "agreement"
            ),
            contribution.alias("contribution"),
        )
        .select(
            "*",
            F.round(F.sum("contribution").over(wcum), 6).alias(
                "rbo_cum"
            ),
        )
        .orderBy("depth")
    )

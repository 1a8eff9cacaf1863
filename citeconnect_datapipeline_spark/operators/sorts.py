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

from pyspark.sql import DataFrame, SparkSession
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

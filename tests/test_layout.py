"""Bucketed-layout tests: the co-located join must be exchange-free —
the physical property that makes repeated fact-to-fact joins viable
at 100 TB (one shuffle at write time, zero per join)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from citeconnect_datapipeline_spark.plans.layout import (
    bucketed_join,
    write_bucketed,
)
from citeconnect_datapipeline_spark.sources.tables import load_table

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def bucketed_tables(spark):
    # warehouse dir is set at session build (session.py); tables are
    # dropped on teardown
    orders = load_table(spark, SF_DIR, "orders")
    li = load_table(spark, SF_DIR, "lineitem")
    write_bucketed(
        orders.select("o_orderkey", "o_custkey", "o_totalprice"),
        "orders_b",
        "o_orderkey",
    )
    write_bucketed(
        li.select("l_orderkey", "l_quantity"), "lineitem_b", "l_orderkey"
    )
    yield "orders_b", "lineitem_b"
    spark.sql("DROP TABLE IF EXISTS orders_b")
    spark.sql("DROP TABLE IF EXISTS lineitem_b")


def test_bucketed_join_has_no_exchange(spark, bucketed_tables):
    lt, rt = bucketed_tables
    joined = bucketed_join(spark, lt, rt, "o_orderkey", "l_orderkey")
    plan = joined._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, f"co-located join still shuffles:\n{plan}"


def test_bucketed_join_matches_plain_join(spark, bucketed_tables):
    lt, rt = bucketed_tables
    joined = bucketed_join(spark, lt, rt, "o_orderkey", "l_orderkey")
    n_bucketed = joined.count()
    orders = load_table(spark, SF_DIR, "orders")
    li = load_table(spark, SF_DIR, "lineitem")
    n_plain = orders.join(li, orders.o_orderkey == li.l_orderkey).count()
    assert n_bucketed == n_plain


def test_bucketed_aggregation_avoids_shuffle(spark, bucketed_tables):
    lt, _ = bucketed_tables
    agg = (
        spark.table(lt)
        .groupBy("o_orderkey")
        .agg(F.sum("o_totalprice").alias("t"))
    )
    plan = agg._jdf.queryExecution().executedPlan().toString()
    # grouping on the bucket key reuses the bucketing: no exchange
    assert "Exchange" not in plan, plan

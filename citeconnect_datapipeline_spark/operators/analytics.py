"""Multi-table join analytics (SURVEY.md SS2.4/SS2.5 generalized).

The reference never runs a real relational join (SURVEY SS2.4: its
join-shaped logic is set membership and dict lookup), but a complete
engine over the same lake must answer the deep multi-join questions
its bias/slicing module would need once the paper corpus is
normalized into fact + dimension tables (papers ~ orders/lineitem,
domain/venue dims ~ nation/region). These queries are the classic
TPC-H shapes (Q3/Q5/Q8) because they exercise exactly what matters at
100 TB: Catalyst join reordering, broadcast-hash selection for
dimension tables, filter pushdown below joins, and map-side partial
aggregation before the one unavoidable shuffle.

Scale notes (local[32] tested, 1000-executor design):
- Dimension tables (region/nation/supplier-sized) are explicitly
  ``F.broadcast`` -- zero shuffle added regardless of fact size.
- Fact-fact joins (orders >< lineitem) shuffle on the join key once;
  at the lake layer the bucketed layout in ``plans/layout.py`` makes
  even that exchange-free when both sides are bucketed on orderkey.
- Selective predicates (mktsegment, date windows) sit on base tables
  so they push into the parquet scan, shrinking the shuffle input --
  verified by tests/test_plans.py pushdown assertions.
- Top-k orders by a ROUNDED aggregate with explicit tie-breaks so the
  limit is deterministic across engines (registry contract).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..plans.registry import query
from ..sources.tables import load_table


@query(
    "shipping_priority_topk",
    oracle="""
    SELECT l.l_orderkey,
           ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)), 4) AS revenue,
           o.o_orderdate, o.o_orderpriority
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE c.c_mktsegment = 'BUILDING'
      AND o.o_orderdate < TIMESTAMP '1998-03-15'
      AND l.l_shipdate > TIMESTAMP '1998-03-15'
    GROUP BY l.l_orderkey, o.o_orderdate, o.o_orderpriority
    ORDER BY revenue DESC, o_orderdate, l_orderkey
    LIMIT 10
    """,
)
def shipping_priority_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape: 3-way fact join with selective dimension-side
    filter, grouped revenue, top-10. The segment filter prunes
    customer at the scan; customer (post-filter, key-only) broadcasts
    onto orders; orders >< lineitem is the single big shuffle and is
    exchange-free under the bucketed layout. TakeOrdered handles the
    limit without a global sort. Revenue is rounded before ORDER BY so
    the top-10 cut is identical across engines (float-sum order
    differs; registry contract)."""
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    building = customer.filter(F.col("c_mktsegment") == "BUILDING").select(
        "c_custkey"
    )
    cutoff = F.lit("1998-03-15").cast("timestamp")
    return (
        orders.filter(F.col("o_orderdate") < cutoff)
        .join(F.broadcast(building), orders.o_custkey == building.c_custkey)
        .join(
            li.filter(F.col("l_shipdate") > cutoff),
            F.col("o_orderkey") == li.l_orderkey,
        )
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4
            ).alias("revenue")
        )
        .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
        .orderBy(F.desc("revenue"), "o_orderdate", "l_orderkey")
        .limit(10)
    )


@query(
    "regional_supplier_volume",
    oracle="""
    SELECT n.n_name AS nation,
           ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)), 4) AS revenue
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
                   AND c.c_nationkey = s.s_nationkey
    JOIN nation n ON s.s_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    WHERE r.r_name = 'ASIA'
      AND o.o_orderdate >= TIMESTAMP '1996-01-01'
      AND o.o_orderdate < TIMESTAMP '1998-01-01'
    GROUP BY n.n_name
    ORDER BY revenue DESC, nation
    """,
)
def regional_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape: 6-way join (two facts + four dimension hops)
    with a region filter that prunes through nation -> supplier ->
    customer. All four dimension joins are broadcasts (region+nation
    fold into one small map; supplier and the region-pruned customer
    key-set are dimension-sized), so the only shuffle is
    orders >< lineitem. The local-supplier predicate
    (c_nationkey = s_nationkey) rides the supplier broadcast join.
    At 100 TB the same plan holds: dims stay broadcast-able, the
    fact-fact shuffle keys on orderkey and AQE coalesces the
    post-filter partitions."""
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    supplier = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    asia_nations = (
        nation.join(
            F.broadcast(region.filter(F.col("r_name") == "ASIA")),
            nation.n_regionkey == F.col("r_regionkey"),
        ).select("n_nationkey", "n_name")
    )
    asia_supp = supplier.join(
        F.broadcast(asia_nations),
        supplier.s_nationkey == F.col("n_nationkey"),
    ).select("s_suppkey", "s_nationkey", "n_name")
    return (
        orders.filter(
            (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
        )
        .join(
            F.broadcast(customer.select("c_custkey", "c_nationkey")),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .join(li, F.col("o_orderkey") == li.l_orderkey)
        .join(
            F.broadcast(asia_supp),
            (li.l_suppkey == F.col("s_suppkey"))
            & (F.col("c_nationkey") == F.col("s_nationkey")),
        )
        .groupBy(F.col("n_name").alias("nation"))
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4
            ).alias("revenue")
        )
        .orderBy(F.desc("revenue"), "nation")
    )


@query(
    "market_share_by_year",
    oracle="""
    SELECT CAST(EXTRACT(year FROM o.o_orderdate) AS INT) AS order_year,
           ROUND(
             SUM(CASE WHEN n.n_regionkey = 2
                      THEN l.l_extendedprice * (1 - l.l_discount)
                      ELSE 0 END)
             / SUM(l.l_extendedprice * (1 - l.l_discount)), 4
           ) AS asia_supplier_share
    FROM orders o
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
    JOIN nation n ON s.s_nationkey = n.n_nationkey
    GROUP BY order_year
    ORDER BY order_year
    """,
)
def market_share_by_year(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 shape: market share as a conditional-aggregate ratio
    over a fact-fact join plus broadcast dims -- the disparity-ratio
    idea of slicing_bias_analysis.py:388-401 lifted onto joined facts.
    One shuffle for orders >< lineitem, one for the year groupBy; the
    share needs no self-join because it is a ratio of two conditional
    sums in a single aggregate pass. Ratio rounded to 4 dp (ratios of
    float sums drift past 6 dp across engines)."""
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    supplier = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    supp_region = supplier.join(
        F.broadcast(nation.select("n_nationkey", "n_regionkey")),
        supplier.s_nationkey == F.col("n_nationkey"),
    ).select("s_suppkey", "n_regionkey")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        orders.join(li, orders.o_orderkey == li.l_orderkey)
        .join(F.broadcast(supp_region), li.l_suppkey == F.col("s_suppkey"))
        .groupBy(
            F.year("o_orderdate").cast("int").alias("order_year")
        )
        .agg(
            F.round(
                F.sum(F.when(F.col("n_regionkey") == 2, rev).otherwise(0))
                / F.sum(rev),
                4,
            ).alias("asia_supplier_share")
        )
        .orderBy("order_year")
    )

"""Multi-table join analytics (SURVEY.md SS2.4/SS2.5 generalized).

The reference never runs a real relational join (SURVEY SS2.4: its
join-shaped logic is set membership and dict lookup), but a complete
engine over the same lake must answer the deep multi-join questions
its bias/slicing module would need once the paper corpus is
normalized into fact + dimension tables (papers ~ orders/lineitem,
domain/venue dims ~ nation/region). These queries are the classic
TPC-H shapes (Q3/Q5/Q7/Q8/Q9/Q10/Q12/Q14/Q19 here; with the
subquery suite in operators/subqueries.py and the Q1/Q6/Q13-family
aggregates, all 22 canonical shapes are covered) because they
exercise exactly what matters at 100 TB: Catalyst join reordering,
broadcast-hash selection for dimension tables, filter pushdown below
joins — including disjunctive predicates (Q19) — and map-side
partial aggregation before the one unavoidable shuffle. Columns the
lake lacks (l_shipmode, l_commitdate, p_container, partsupp) are
substituted with available ones carrying the same shape; each
docstring notes its substitution.

Scale notes (local[32] tested, 1000-executor design):
- FIXED-cardinality dimensions (region: 5 rows, nation: 25) are
  explicitly ``F.broadcast`` -- zero shuffle at any fact size.
  Dimensions that SCALE with the lake (customer/supplier/part)
  carry NO forced hint: size-aware planning (AQE) broadcasts them
  while they fit and falls back to a shuffle join when they don't
  -- a forced hint would OOM the executors at 100 TB (guarded by
  tests/test_plan_hygiene.py::test_no_unbounded_forced_broadcast).
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

from pyspark.sql import DataFrame, SparkSession, Window
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
    customer at the scan; customer (post-filter, key-only) joins
    orders with AQE free to broadcast it while it fits (no forced
    hint: customer scales with the lake); orders >< lineitem is the
    single big shuffle and is
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
        .join(building, orders.o_custkey == building.c_custkey)
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
            customer.select("c_custkey", "c_nationkey"),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .join(li, F.col("o_orderkey") == li.l_orderkey)
        .join(
            asia_supp,
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
        .join(supp_region, li.l_suppkey == F.col("s_suppkey"))
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


@query(
    "nation_trade_volume",
    oracle="""
    SELECT supp_nation, cust_nation, l_year,
           ROUND(SUM(volume), 4) AS revenue
    FROM (
        SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
               CAST(EXTRACT(year FROM l.l_shipdate) AS INT) AS l_year,
               l.l_extendedprice * (1 - l.l_discount) AS volume
        FROM supplier s
        JOIN lineitem l ON s.s_suppkey = l.l_suppkey
        JOIN orders o ON o.o_orderkey = l.l_orderkey
        JOIN customer c ON c.c_custkey = o.o_custkey
        JOIN nation n1 ON s.s_nationkey = n1.n_nationkey
        JOIN nation n2 ON c.c_nationkey = n2.n_nationkey
        WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
            OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
          AND l.l_shipdate >= TIMESTAMP '1996-01-01'
          AND l.l_shipdate < TIMESTAMP '1998-01-01'
    ) shipping
    GROUP BY supp_nation, cust_nation, l_year
    ORDER BY supp_nation, cust_nation, l_year
    """,
)
def nation_trade_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape: bilateral trade volume between two nations by
    ship year — the supplier's nation comes through lineitem, the
    customer's through orders, and the disjunctive nation-pair
    predicate couples the two dimension legs.

    Both nation joins are broadcasts; the pair predicate CANNOT be
    pushed below either join alone (it references both sides), but
    Catalyst infers the single-side IN('NATION_1','NATION_2')
    constraints and pushes those into the two dimension scans, so
    each broadcast build holds 2 of 25 nations and the fact rows
    drop at the first join touch. The only shuffle is
    orders >< lineitem on orderkey; the year groupBy output is
    |pairs| x |years| — dimension-bounded. Same plan at 100 TB."""
    supplier = load_table(spark, sf_dir, "supplier")
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    pair = ["NATION_1", "NATION_2"]
    n1 = nation.filter(F.col("n_name").isin(pair)).select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = nation.filter(F.col("n_name").isin(pair)).select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation")
    )
    supp = supplier.join(
        F.broadcast(n1), supplier.s_nationkey == F.col("n1_key")
    ).select("s_suppkey", "supp_nation")
    cust = customer.join(
        F.broadcast(n2), customer.c_nationkey == F.col("n2_key")
    ).select("c_custkey", "cust_nation")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
        )
        .join(supp, li.l_suppkey == F.col("s_suppkey"))
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == F.col("c_custkey"))
        .filter(F.col("supp_nation") != F.col("cust_nation"))
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").cast("int").alias("l_year"),
        )
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4
            ).alias("revenue")
        )
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


@query(
    "product_type_profit",
    oracle="""
    SELECT nation, o_year, ROUND(SUM(amount), 4) AS sum_profit
    FROM (
        SELECT n.n_name AS nation,
               CAST(EXTRACT(year FROM o.o_orderdate) AS INT) AS o_year,
               l.l_extendedprice * (1 - l.l_discount)
                 - 0.5 * p.p_retailprice * l.l_quantity AS amount
        FROM part p
        JOIN lineitem l ON p.p_partkey = l.l_partkey
        JOIN supplier s ON s.s_suppkey = l.l_suppkey
        JOIN orders o ON o.o_orderkey = l.l_orderkey
        JOIN nation n ON s.s_nationkey = n.n_nationkey
        WHERE p.p_name LIKE '%widget%'
    ) profit
    GROUP BY nation, o_year
    ORDER BY nation, o_year DESC
    """,
)
def product_type_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape: per-nation, per-year profit on one product
    family, where profit nets revenue against cost across two fact
    touches. (This lake has no partsupp, so supply cost is the
    spec-plausible proxy 0.5 * p_retailprice per unit — the plan
    shape, a 5-way join with a LIKE-filtered part leg, is what
    matters.)

    The '%widget%' LIKE cannot use an index but DOES push into the
    part parquet scan as a row-group filter; the surviving partkeys
    broadcast onto lineitem, so the selective leg prunes the fact
    before the orders shuffle. supplier->nation folds into one
    broadcast map. One orderkey shuffle + one (nation, year) agg
    shuffle of dimension-bounded width. Same plan at 100 TB."""
    part = load_table(spark, sf_dir, "part")
    li = load_table(spark, sf_dir, "lineitem")
    supplier = load_table(spark, sf_dir, "supplier")
    orders = load_table(spark, sf_dir, "orders")
    nation = load_table(spark, sf_dir, "nation")
    widget = part.filter(F.col("p_name").like("%widget%")).select(
        "p_partkey", "p_retailprice"
    )
    supp_nation = supplier.join(
        F.broadcast(nation.select("n_nationkey", "n_name")),
        supplier.s_nationkey == F.col("n_nationkey"),
    ).select("s_suppkey", F.col("n_name").alias("nation"))
    amount = F.col("l_extendedprice") * (1 - F.col("l_discount")) - 0.5 * F.col(
        "p_retailprice"
    ) * F.col("l_quantity")
    return (
        li.join(widget, li.l_partkey == F.col("p_partkey"))
        .join(supp_nation, li.l_suppkey == F.col("s_suppkey"))
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy(
            "nation", F.year("o_orderdate").cast("int").alias("o_year")
        )
        .agg(F.round(F.sum(amount), 4).alias("sum_profit"))
        .orderBy("nation", F.desc("o_year"))
    )


@query(
    "returned_item_report",
    oracle="""
    SELECT c.c_custkey, c.c_name,
           ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)), 4) AS revenue,
           c.c_acctbal, n.n_name AS nation
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    WHERE o.o_orderdate >= TIMESTAMP '1996-10-01'
      AND o.o_orderdate < TIMESTAMP '1997-01-01'
      AND l.l_returnflag = 'R'
    GROUP BY c.c_custkey, c.c_name, c.c_acctbal, n.n_name
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
    """,
)
def returned_item_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape: the 20 customers who returned the most
    revenue in a quarter — the 'who is hurting us' ranked report.
    Both selective predicates sit on base tables (date window on
    orders, returnflag on lineitem) and push into their scans; the
    quarter-pruned orders side shrinks enough that the orderkey join
    probes a fraction of lineitem's row groups. customer and nation
    broadcast. Top-20 by ROUNDED revenue with custkey tie-break is a
    TakeOrdered — no global sort of the grouped output."""
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    nation = load_table(spark, sf_dir, "nation")
    cust = customer.join(
        F.broadcast(nation.select("n_nationkey", "n_name")),
        customer.c_nationkey == F.col("n_nationkey"),
    ).select("c_custkey", "c_name", "c_acctbal", F.col("n_name").alias("nation"))
    return (
        orders.filter(
            (F.col("o_orderdate") >= F.lit("1996-10-01").cast("timestamp"))
            & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
        )
        .join(
            li.filter(F.col("l_returnflag") == "R"),
            F.col("o_orderkey") == li.l_orderkey,
        )
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .groupBy("c_custkey", "c_name", "c_acctbal", "nation")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4
            ).alias("revenue")
        )
        .select("c_custkey", "c_name", "revenue", "c_acctbal", "nation")
        .orderBy(F.desc("revenue"), "c_custkey")
        .limit(20)
    )


@query(
    "linestatus_priority_split",
    oracle="""
    SELECT l.l_linestatus AS ship_bucket,
           CAST(SUM(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(SUM(CASE WHEN o.o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM orders o
    JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    WHERE l.l_shipdate >= TIMESTAMP '1996-01-01'
      AND l.l_shipdate < TIMESTAMP '1997-01-01'
      AND l.l_returnflag = 'N'
    GROUP BY l.l_linestatus
    ORDER BY l.l_linestatus
    """,
)
def linestatus_priority_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape: per-shipping-bucket counts of high- vs
    low-priority lines in a ship-date year — the conditional
    pivot-to-two-counts aggregate. (The lake has no l_shipmode or
    commit/receipt dates; l_linestatus plays the bucket and the
    returnflag filter plays the spec's lateness predicate — the
    CASE-sum structure over a fact-fact join is the shape under
    test.)

    Both filters push to the lineitem scan; the filtered fact joins
    orders on orderkey (the one shuffle) carrying only
    (orderkey, linestatus); the CASE pair folds into ONE aggregate
    pass — no self-join, no second scan. Output is |linestatus|
    rows. The 100 TB plan is identical with the orderkey exchange
    bucketed away."""
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_returnflag") == "N")
        )
        .join(orders, F.col("l_orderkey") == orders.o_orderkey)
        .groupBy(F.col("l_linestatus").alias("ship_bucket"))
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
        )
        .orderBy("ship_bucket")
    )


@query(
    "promo_revenue_share",
    oracle="""
    SELECT ROUND(
             100.0 * SUM(CASE WHEN p.p_type = 'PROMO'
                              THEN l.l_extendedprice * (1 - l.l_discount)
                              ELSE 0 END)
             / SUM(l.l_extendedprice * (1 - l.l_discount)), 4
           ) AS promo_revenue_pct
    FROM lineitem l
    JOIN part p ON l.l_partkey = p.p_partkey
    WHERE l.l_shipdate >= TIMESTAMP '1996-09-01'
      AND l.l_shipdate < TIMESTAMP '1996-10-01'
    """,
)
def promo_revenue_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape: the share of one month's revenue that came
    from promotional parts — a ratio of conditional sums in a single
    aggregate pass (no self-join; the naive two-query form scans
    lineitem twice). The one-month predicate prunes lineitem row
    groups at the scan; part projected to (partkey, is_promo flag)
    broadcasts; the global aggregate is a map-side partial + 1-row
    final. Ratio rounded at 4 dp — ratios of float sums drift past
    6 dp across engines (registry contract)."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-09-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1996-10-01").cast("timestamp"))
        )
        .join(
            part.select("p_partkey", "p_type"),
            F.col("l_partkey") == F.col("p_partkey"),
        )
        .agg(
            F.round(
                100.0
                * F.sum(F.when(F.col("p_type") == "PROMO", rev).otherwise(0))
                / F.sum(rev),
                4,
            ).alias("promo_revenue_pct")
        )
    )


@query(
    "disjunctive_discount_revenue",
    oracle="""
    SELECT ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)), 4) AS revenue
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    WHERE (p.p_brand = 'Brand#1' AND p.p_size BETWEEN 1 AND 10
           AND l.l_quantity BETWEEN 1 AND 20)
       OR (p.p_brand = 'Brand#2' AND p.p_size BETWEEN 11 AND 25
           AND l.l_quantity BETWEEN 10 AND 35)
       OR (p.p_brand = 'Brand#3' AND p.p_size BETWEEN 26 AND 50
           AND l.l_quantity BETWEEN 20 AND 50)
    """,
)
def disjunctive_discount_revenue(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """TPC-H Q19 shape: revenue matching three OR'd brand/size/
    quantity bundles — the canonical disjunctive-predicate test.
    (p_size stands in for the spec's p_container buckets; the lake
    has no container column.)

    What Catalyst must get right, and the plan test asserts: the
    join itself stays a single equi hash join on partkey (the OR
    must NOT degrade it to a nested loop), and the per-side
    implications of the disjunction ARE extracted and pushed — part
    scans with brand IN (1,2,3) + size BETWEEN 1 AND 50, lineitem
    with quantity BETWEEN 1 AND 50 — so both scans prune before the
    join evaluates the full residual OR. part (3 brands) broadcasts;
    the aggregate is a 1-row global."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    joined = li.join(
        part.select("p_partkey", "p_brand", "p_size"),
        li.l_partkey == F.col("p_partkey"),
    )
    bundle = (
        (F.col("p_brand") == "Brand#1")
        & F.col("p_size").between(1, 10)
        & F.col("l_quantity").between(1, 20)
    ) | (
        (F.col("p_brand") == "Brand#2")
        & F.col("p_size").between(11, 25)
        & F.col("l_quantity").between(10, 35)
    ) | (
        (F.col("p_brand") == "Brand#3")
        & F.col("p_size").between(26, 50)
        & F.col("l_quantity").between(20, 50)
    )
    return joined.filter(bundle).agg(
        F.round(
            F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4
        ).alias("revenue")
    )


def h_index_by(
    refs: DataFrame, entity_col: str, item_col: str
) -> DataFrame:
    """Library core of `supplier_h_index` (api.graph.h_index):
    Hirsch h-index per entity over reference-grain rows (one row per
    reference to an item) — h = the largest h such that the entity
    has >= h items referenced >= h times. Returns (entity, h_index,
    n_items, total_refs); two shuffles, both keyed on the entity."""
    from pyspark.sql import Window

    cites = refs.groupBy(
        F.col(entity_col).alias("entity"),
        F.col(item_col).alias("item"),
    ).agg(F.count("*").alias("c"))
    w = Window.partitionBy("entity").orderBy(F.desc("c"), "item")
    ranked = cites.withColumn(
        "rn", F.row_number().over(w).cast("long")
    )
    return ranked.groupBy("entity").agg(
        F.max(
            F.when(F.col("c") >= F.col("rn"), F.col("rn")).otherwise(
                F.lit(0).cast("long")
            )
        ).alias("h_index"),
        F.count("*").alias("n_items"),
        F.sum("c").alias("total_refs"),
    )


@query(
    "supplier_h_index",
    oracle="""
    WITH cites AS (
        SELECT l_suppkey AS s_suppkey, l_partkey AS p, COUNT(*) AS c
        FROM lineitem GROUP BY 1, 2
    ),
    ranked AS (
        SELECT s_suppkey, c,
               ROW_NUMBER() OVER (
                   PARTITION BY s_suppkey ORDER BY c DESC, p
               ) AS rn
        FROM cites
    )
    SELECT s_suppkey,
           CAST(MAX(CASE WHEN c >= rn THEN rn ELSE 0 END) AS BIGINT)
               AS h_index,
           CAST(COUNT(*) AS BIGINT) AS n_parts,
           CAST(SUM(c) AS BIGINT) AS total_refs
    FROM ranked
    GROUP BY s_suppkey
    ORDER BY h_index DESC, total_refs DESC, s_suppkey
    LIMIT 20
    """,
)


def supplier_h_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hirsch h-index per supplier over part reference counts — the
    canonical citation-impact metric (the reference computes per-
    author citation impact in its citation analysis module;
    supplier~author, part~paper, lineitem~citation in this lake):
    h = the largest h such that the supplier supplies >= h parts each
    referenced >= h times. Top-20 suppliers by h.

    Shape: one (supplier, part) count aggregate, a rank window
    PARTITIONED BY supplier (never global), and the h fold as a
    conditional MAX in the same per-supplier aggregate — two keyed
    shuffles total, both on the supplier key, so the plan
    co-partitions and scales with suppliers x parts-per-supplier."""
    from pyspark.sql import Window

    li = load_table(spark, sf_dir, "lineitem")
    return (
        h_index_by(li, "l_suppkey", "l_partkey")
        .select(
            F.col("entity").alias("s_suppkey"),
            "h_index",
            F.col("n_items").alias("n_parts"),
            "total_refs",
        )
        .orderBy(
            F.desc("h_index"), F.desc("total_refs"), "s_suppkey"
        )
        .limit(20)
    )


@query(
    "rfm_segments",
    oracle="""
    WITH maxd AS (
        SELECT MAX(CAST(o_orderdate AS DATE)) AS d0 FROM orders
    ),
    rfm AS (
        SELECT o.o_custkey,
               date_diff('day', MAX(CAST(o.o_orderdate AS DATE)),
                         ANY_VALUE(maxd.d0)) AS recency_days,
               COUNT(*) AS frequency,
               ROUND(SUM(o.o_totalprice), 2) AS monetary
        FROM orders o CROSS JOIN maxd
        GROUP BY 1
    ),
    cuts AS (
        SELECT ROUND(quantile_cont(recency_days, 0.25), 6) AS r1,
               ROUND(quantile_cont(recency_days, 0.50), 6) AS r2,
               ROUND(quantile_cont(recency_days, 0.75), 6) AS r3,
               ROUND(quantile_cont(frequency, 0.25), 6) AS f1,
               ROUND(quantile_cont(frequency, 0.50), 6) AS f2,
               ROUND(quantile_cont(frequency, 0.75), 6) AS f3,
               ROUND(quantile_cont(monetary, 0.25), 6) AS m1,
               ROUND(quantile_cont(monetary, 0.50), 6) AS m2,
               ROUND(quantile_cont(monetary, 0.75), 6) AS m3
        FROM rfm
    ),
    coded AS (
        SELECT
            5 - (1 + CAST(recency_days > c.r1 AS INT)
                   + CAST(recency_days > c.r2 AS INT)
                   + CAST(recency_days > c.r3 AS INT)) AS r_score,
            1 + CAST(frequency > c.f1 AS INT)
              + CAST(frequency > c.f2 AS INT)
              + CAST(frequency > c.f3 AS INT) AS f_score,
            1 + CAST(monetary > c.m1 AS INT)
              + CAST(monetary > c.m2 AS INT)
              + CAST(monetary > c.m3 AS INT) AS m_score,
            monetary
        FROM rfm CROSS JOIN cuts c
    )
    SELECT r_score, f_score, m_score,
           CAST(COUNT(*) AS BIGINT) AS n_customers,
           ROUND(SUM(monetary), 2) AS total_monetary
    FROM coded
    GROUP BY 1, 2, 3
    ORDER BY 1, 2, 3
    """,
)
def rfm_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM (recency / frequency / monetary) customer segmentation —
    the classic curation-style cohorting the reference's analysis
    layer does per-author (activity recency x output count x
    impact): each customer's three metrics are scored into quartiles
    and the 64-cell segment grid reports counts + average spend.

    Scale shape: the quartile cutoffs are ONE 1-row exact-percentile
    aggregate broadcast back over customer rows (the
    dsir_importance_weights threshold pattern — no global ntile, no
    unpartitioned WindowExec at customer grain); recency folds the
    1-row max-date scalar in the same way. Cutoffs and metrics are
    rounded (6 dp / 2 dp) BEFORE every comparison on both engines,
    so quartile boundaries cannot flip."""
    orders = load_table(spark, sf_dir, "orders")
    maxd = orders.agg(
        F.max(F.col("o_orderdate").cast("date")).alias("d0")
    )
    rfm = (
        orders.join(F.broadcast(maxd))
        .groupBy("o_custkey")
        .agg(
            F.datediff(
                F.first("d0"), F.max(F.col("o_orderdate").cast("date"))
            ).alias("recency_days"),
            F.count("*").alias("frequency"),
            F.round(F.sum("o_totalprice"), 2).alias("monetary"),
        )
    )
    cuts = rfm.agg(
        *[
            F.round(
                F.expr(f"percentile({col}, {q})"), 6
            ).alias(f"{col[0]}{i}")
            for col in ("recency_days", "frequency", "monetary")
            for i, q in ((1, 0.25), (2, 0.50), (3, 0.75))
        ]
    )
    gt = lambda c, t: F.col(c).cast("double") > F.col(t)  # noqa: E731
    score = lambda c, p: (  # noqa: E731
        F.lit(1)
        + gt(c, f"{p}1").cast("int")
        + gt(c, f"{p}2").cast("int")
        + gt(c, f"{p}3").cast("int")
    )
    coded = rfm.join(F.broadcast(cuts)).select(
        (F.lit(5) - score("recency_days", "r")).alias("r_score"),
        score("frequency", "f").alias("f_score"),
        score("monetary", "m").alias("m_score"),
        "monetary",
    )
    return (
        coded.groupBy("r_score", "f_score", "m_score")
        .agg(
            F.count("*").alias("n_customers"),
            # SUM, not AVG: the mean of 2-dp values lands on exact
            # decimal half-cents (x.365) where binary association
            # order flips the 2-dp round between engines; the sum of
            # 2-dp decimals never sits on a 2-dp half-boundary.
            F.round(F.sum("monetary"), 2).alias("total_monetary"),
        )
        .orderBy("r_score", "f_score", "m_score")
    )


ABC_BINS_PER_LOG = 20.0  # log-revenue bin resolution for the ABC CDF
ABC_A_SHARE = 0.8  # cumulative revenue share boundaries
ABC_B_SHARE = 0.95
XYZ_X_CV = 0.5  # weekly-demand CV boundaries
XYZ_Y_CV = 1.0


@query(
    "abc_xyz_classification",
    oracle=f"""
    WITH per_part AS (
        SELECT l_partkey,
               ROUND(SUM(l_extendedprice * (1 - l_discount)), 6)
                   AS rev,
               SUM(l_quantity) AS sq,
               SUM(l_quantity * l_quantity) AS sq2_dummy
        FROM lineitem GROUP BY 1
    ),
    wk AS (
        SELECT l_partkey,
               CAST(date_diff('day', DATE '1970-01-01',
                              CAST(l_shipdate AS DATE)) // 7
               AS BIGINT) AS wk,
               SUM(l_quantity) AS q
        FROM lineitem GROUP BY 1, 2
    ),
    nweeks AS (
        SELECT CAST(COUNT(DISTINCT wk) AS DOUBLE) AS w FROM wk
    ),
    cv AS (
        SELECT k.l_partkey,
               SQRT(GREATEST(SUM(k.q * k.q) / n.w
                    - (SUM(k.q) / n.w) * (SUM(k.q) / n.w), 0))
                   / GREATEST(SUM(k.q) / n.w, 1e-12) AS cv
        FROM wk k CROSS JOIN nweeks n
        GROUP BY k.l_partkey, n.w
    ),
    binned AS (
        SELECT l_partkey, rev,
               CAST(FLOOR(LN(GREATEST(rev, 1e-6))
                          * {ABC_BINS_PER_LOG}) AS BIGINT) AS bin
        FROM per_part
    ),
    tot AS (SELECT SUM(rev) AS t FROM per_part),
    bins AS (
        SELECT b.bin, SUM(b.rev) AS brev,
               SUM(SUM(b.rev)) OVER (ORDER BY b.bin DESC
                   ROWS UNBOUNDED PRECEDING) / MAX(t.t) AS cum_top
        FROM binned b CROSS JOIN tot t
        GROUP BY b.bin
    ),
    bounds AS (
        SELECT COALESCE(MAX(CASE WHEN cum_top >= {ABC_A_SHARE}
                             THEN bin END), MIN(bin)) AS b_a,
               COALESCE(MAX(CASE WHEN cum_top >= {ABC_B_SHARE}
                             THEN bin END), MIN(bin)) AS b_b
        FROM (SELECT bin, cum_top FROM bins)
    ),
    classed AS (
        SELECT b.l_partkey, b.rev,
               CASE WHEN b.bin >= bd.b_a THEN 'A'
                    WHEN b.bin >= bd.b_b THEN 'B'
                    ELSE 'C' END AS abc,
               CASE WHEN c.cv <= {XYZ_X_CV} THEN 'X'
                    WHEN c.cv <= {XYZ_Y_CV} THEN 'Y'
                    ELSE 'Z' END AS xyz
        FROM binned b
        JOIN cv c ON b.l_partkey = c.l_partkey
        CROSS JOIN bounds bd
    )
    SELECT abc, xyz,
           CAST(COUNT(*) AS BIGINT) AS n_parts,
           ROUND(SUM(rev) / MAX(t.t), 6) AS revenue_share
    FROM classed CROSS JOIN tot t
    GROUP BY abc, xyz
    ORDER BY abc, xyz
    """,
)
def abc_xyz_classification(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """ABC-XYZ inventory segmentation — the assortment-planning grid
    (A/B/C = cumulative revenue share 80/95/rest, X/Y/Z = weekly-
    demand coefficient of variation 0.5/1.0/rest): AX parts are
    forecastable cash cows (tight service levels), CZ parts are the
    long tail a range review culls. The revenue ranking is done
    WITHOUT a part-grain global sort: parts land in log-revenue
    bins (resolution 1/20 of a decade), the bounded bin table
    carries the top-down cumulative revenue CDF, and the 80/95%
    boundaries come back as two bin ids in a 1-row broadcast — the
    classification is exact at bin resolution (boundary-bin parts
    classify together; at 1/20-log bins that is a <5% revenue
    granularity, the knob a deployment widens or narrows). CV uses
    the calendar week count so missing weeks count as zero demand
    (the intermittency XYZ exists to catch).

    Scale shape: two map-side fact aggregates (part grain, part x
    week grain), a bounded bin-grain window, 1-row boundary/total
    broadcasts, and a 9-cell output grid."""
    li = load_table(spark, sf_dir, "lineitem")
    per_part = li.groupBy("l_partkey").agg(
        F.round(
            F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))),
            6,
        ).alias("rev")
    )
    wk = li.groupBy(
        "l_partkey",
        (F.unix_date(F.to_date("l_shipdate")) / 7)
        .cast("long")
        .alias("wk"),
    ).agg(F.sum("l_quantity").alias("q"))
    nweeks = wk.agg(
        F.countDistinct("wk").cast("double").alias("w")
    )
    cv = (
        wk.crossJoin(F.broadcast(nweeks))
        .groupBy("l_partkey", "w")
        .agg(
            (
                F.sqrt(
                    F.greatest(
                        F.sum(F.col("q") * F.col("q")) / F.col("w")
                        - (F.sum("q") / F.col("w"))
                        * (F.sum("q") / F.col("w")),
                        F.lit(0.0),
                    )
                )
                / F.greatest(
                    F.sum("q") / F.col("w"), F.lit(1e-12)
                )
            ).alias("cv")
        )
    )
    binned = per_part.select(
        "l_partkey",
        "rev",
        F.floor(
            F.log(F.greatest(F.col("rev"), F.lit(1e-6)))
            * ABC_BINS_PER_LOG
        )
        .cast("bigint")
        .alias("bin"),
    )
    tot = per_part.agg(F.sum("rev").alias("t"))
    wtop = Window.orderBy(F.desc("bin")).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    bins = (
        binned.crossJoin(F.broadcast(tot))
        .groupBy("bin")
        .agg(F.sum("rev").alias("brev"), F.max("t").alias("t"))
        .select(
            "bin",
            (F.sum("brev").over(wtop) / F.col("t")).alias("cum_top"),
        )
    )
    bounds = bins.agg(
        F.coalesce(
            F.max(
                F.when(F.col("cum_top") >= ABC_A_SHARE, F.col("bin"))
            ),
            F.min("bin"),
        ).alias("b_a"),
        F.coalesce(
            F.max(
                F.when(F.col("cum_top") >= ABC_B_SHARE, F.col("bin"))
            ),
            F.min("bin"),
        ).alias("b_b"),
    )
    classed = (
        binned.join(cv, "l_partkey")
        .crossJoin(F.broadcast(bounds))
        .select(
            "rev",
            F.when(F.col("bin") >= F.col("b_a"), "A")
            .when(F.col("bin") >= F.col("b_b"), "B")
            .otherwise("C")
            .alias("abc"),
            F.when(F.col("cv") <= XYZ_X_CV, "X")
            .when(F.col("cv") <= XYZ_Y_CV, "Y")
            .otherwise("Z")
            .alias("xyz"),
        )
    )
    return (
        classed.crossJoin(F.broadcast(tot))
        .groupBy("abc", "xyz")
        .agg(
            F.count("*").cast("bigint").alias("n_parts"),
            F.round(F.sum("rev") / F.max("t"), 6).alias(
                "revenue_share"
            ),
        )
        .orderBy("abc", "xyz")
    )


@query(
    "negbin_basket_fit",
    oracle="""
    WITH baskets AS (
        SELECT l_orderkey, COUNT(*) AS k FROM lineitem GROUP BY 1
    ),
    mom AS (
        SELECT COUNT(*) AS n, AVG(k) AS m,
               var_pop(k) AS v
        FROM baskets
    )
    SELECT CAST(n AS BIGINT) AS n_orders,
           ROUND(m, 6) AS mean_items,
           ROUND(v, 6) AS var_items,
           ROUND(v / m, 6) AS dispersion,
           CASE WHEN v / m > 1.1 THEN 'overdispersed'
                WHEN v / m < 0.9 THEN 'underdispersed'
                ELSE 'poisson-like' END AS regime,
           ROUND(CASE WHEN v > m THEN m * m / (v - m) END, 6)
               AS nb_r,
           ROUND(CASE WHEN v > m THEN m / v END, 6) AS nb_p
    FROM mom
    """,
)
def negbin_basket_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Basket-size dispersion fit: items-per-order moments, the
    variance/mean dispersion index, and the method-of-moments
    negative-binomial parameters (r = m^2/(v-m), p = m/v) when the
    data is overdispersed — the count-model triage every demand
    modeler runs before picking Poisson vs NB regression
    (`fano_burstiness` asks the same question of event STREAMS;
    this asks it of basket SIZES, the classic NB domain). NB
    parameters are NULL when v <= m (Poisson or under-dispersed —
    the NB moment fit does not exist there, and emitting a negative
    r silently is the classic bug).

    Scale shape: one order-grain count + one 1-row moment fold."""
    li = load_table(spark, sf_dir, "lineitem")
    baskets = li.groupBy("l_orderkey").agg(F.count("*").alias("k"))
    mom = baskets.agg(
        F.count("*").alias("n"),
        F.avg("k").alias("m"),
        F.var_pop("k").alias("v"),
    )
    disp = F.col("v") / F.col("m")
    return mom.select(
        F.col("n").cast("bigint").alias("n_orders"),
        F.round("m", 6).alias("mean_items"),
        F.round("v", 6).alias("var_items"),
        F.round(disp, 6).alias("dispersion"),
        F.when(disp > 1.1, "overdispersed")
        .when(disp < 0.9, "underdispersed")
        .otherwise("poisson-like")
        .alias("regime"),
        F.round(
            F.when(
                F.col("v") > F.col("m"),
                F.col("m") * F.col("m") / (F.col("v") - F.col("m")),
            ),
            6,
        ).alias("nb_r"),
        F.round(
            F.when(F.col("v") > F.col("m"), F.col("m") / F.col("v")),
            6,
        ).alias("nb_p"),
    )


@query(
    "calendar_heatmap_cells",
    oracle="""
    WITH cells AS (
        SELECT CAST(EXTRACT(month FROM CAST(o_orderdate AS DATE))
                    AS BIGINT) AS mo,
               CAST(isodow(CAST(o_orderdate AS DATE)) AS BIGINT)
                   AS dow,
               COUNT(*) AS n
        FROM orders GROUP BY 1, 2
    ),
    mrg AS (SELECT mo, SUM(n) AS nm FROM cells GROUP BY 1),
    drg AS (SELECT dow, SUM(n) AS nd FROM cells GROUP BY 1),
    tot AS (SELECT SUM(n) AS t FROM cells)
    SELECT c.mo, c.dow,
           CAST(c.n AS BIGINT) AS n_orders,
           ROUND(m.nm * d.nd * 1.0 / t.t, 6) AS expected,
           ROUND((c.n - m.nm * d.nd * 1.0 / t.t)
                 / SQRT(m.nm * d.nd * 1.0 / t.t), 6)
               AS pearson_residual,
           ABS((c.n - m.nm * d.nd * 1.0 / t.t)
               / SQRT(m.nm * d.nd * 1.0 / t.t)) > 2 AS hot_or_cold
    FROM cells c
    JOIN mrg m USING (mo)
    JOIN drg d USING (dow)
    CROSS JOIN tot t
    ORDER BY mo, dow
    """,
)
def calendar_heatmap_cells(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Month x ISO-weekday order-count heatmap with independence
    residuals — the seasonality INTERACTION audit (seasonal_
    decompose_daily extracts the weekly cycle, this asks whether the
    weekly cycle is the SAME in every month): each of the <= 84
    cells carries its count, the independence expectation
    (row x col / total), and the Pearson residual (obs - exp)/
    sqrt(exp) — |resid| > 2 marks the hot/cold cells a staffing or
    campaign calendar reads (December Saturdays, August Mondays).
    The residual grid is exactly the chi-square decomposition of
    `categorical_mutual_information`'s independence question, kept
    at cell grain for the heatmap.

    Scale shape: one conditional aggregate to the fixed 12 x 7 grid,
    two margin rollups of that grid, a 1-row total broadcast —
    nothing after the first pass exceeds 84 rows."""
    orders = load_table(spark, sf_dir, "orders")
    cells = orders.groupBy(
        F.month(F.to_date("o_orderdate")).cast("bigint").alias("mo"),
        (F.weekday(F.to_date("o_orderdate")) + 1)
        .cast("bigint")
        .alias("dow"),
    ).agg(F.count("*").alias("n"))
    mrg = cells.groupBy("mo").agg(F.sum("n").alias("nm"))
    drg = cells.groupBy("dow").agg(F.sum("n").alias("nd"))
    tot = cells.agg(F.sum("n").alias("t"))
    exp = F.col("nm") * F.col("nd") * 1.0 / F.col("t")
    resid = (F.col("n") - exp) / F.sqrt(exp)
    return (
        cells.join(F.broadcast(mrg), "mo")
        .join(F.broadcast(drg), "dow")
        .crossJoin(F.broadcast(tot))
        .select(
            "mo",
            "dow",
            F.col("n").cast("bigint").alias("n_orders"),
            F.round(exp, 6).alias("expected"),
            F.round(resid, 6).alias("pearson_residual"),
            (F.abs(resid) > 2).alias("hot_or_cold"),
        )
        .orderBy("mo", "dow")
    )

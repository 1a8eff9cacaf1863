"""Set operations (SURVEY.md SS2.8 U1-U5).

The reference unions by concatenating pandas frames per zone file
(utils/gcs_reader.py:169, Processing/gcs_read.py:48), merges id sets
with ``set.update`` (Ingestion/main.py:530-533) and differences them
for skip-existing (upload_papers_to_supabase.py:247-252). Spark
restatement: ``unionByName`` / ``distinct`` / ``exceptAll`` /
``intersect`` -- union is a zero-shuffle narrow op; the distinct
variants shuffle on the full row.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..plans.registry import query
from ..sources.tables import load_table


@query(
    "union_all_entities",
    oracle="""
    SELECT c_custkey AS entity_key, c_name AS entity_name,
           'customer' AS kind
    FROM customer
    UNION ALL
    SELECT s_suppkey AS entity_key, s_name AS entity_name,
           'supplier' AS kind
    FROM supplier
    ORDER BY kind, entity_key
    """,
)
def union_all_entities(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Union-all of heterogeneous frames by column name (U1/U2): the
    reference's pd.concat of per-file frames. unionByName tolerates
    column order differences; no shuffle."""
    customer = load_table(spark, sf_dir, "customer")
    supplier = load_table(spark, sf_dir, "supplier")
    c = customer.select(
        F.col("c_custkey").alias("entity_key"),
        F.col("c_name").alias("entity_name"),
        F.lit("customer").alias("kind"),
    )
    s = supplier.select(
        F.col("s_suppkey").alias("entity_key"),
        F.col("s_name").alias("entity_name"),
        F.lit("supplier").alias("kind"),
    )
    return c.unionByName(s).orderBy("kind", "entity_key")


@query(
    "distinct_union_ids",
    oracle="""
    SELECT DISTINCT id FROM (
        SELECT o_custkey AS id FROM orders
        UNION ALL
        SELECT c_custkey AS id FROM customer WHERE c_acctbal > 5000
    )
    ORDER BY id
    """,
)
def distinct_union_ids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct id-set union (U3): ``set.update(ref_ids)`` across seed
    papers (main.py:530-533,58-62). Union is narrow; the single
    shuffle is the distinct, with partial dedup map-side."""
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    a = orders.select(F.col("o_custkey").alias("id"))
    b = customer.filter(F.col("c_acctbal") > 5000).select(
        F.col("c_custkey").alias("id")
    )
    return a.unionByName(b).distinct().orderBy("id")


@query(
    "except_ids",
    oracle="""
    SELECT c_custkey AS id FROM customer
    EXCEPT
    SELECT o_custkey AS id FROM orders
    ORDER BY id
    """,
)
def except_ids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set difference (U4): new ids minus already-uploaded ids --
    the skip-existing computation as a relational EXCEPT."""
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    return (
        customer.select(F.col("c_custkey").alias("id"))
        .exceptAll(orders.select(F.col("o_custkey").alias("id")))
        .distinct()
        .orderBy("id")
    )


@query(
    "intersect_ids",
    oracle="""
    SELECT c_nationkey AS nation_id FROM customer
    INTERSECT
    SELECT s_nationkey AS nation_id FROM supplier
    ORDER BY nation_id
    """,
)
def intersect_ids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set intersection (U5): refs ∩ final ids (main.py:599-604) on
    key sets as a relational INTERSECT."""
    customer = load_table(spark, sf_dir, "customer")
    supplier = load_table(spark, sf_dir, "supplier")
    return (
        customer.select(F.col("c_nationkey").alias("nation_id"))
        .intersect(supplier.select(F.col("s_nationkey").alias("nation_id")))
        .orderBy("nation_id")
    )


@query(
    "except_all_rows",
    oracle="""
    SELECT o_custkey, o_orderpriority FROM orders
    WHERE o_orderdate < TIMESTAMP '1998-01-01'
    EXCEPT ALL
    SELECT o_custkey, o_orderpriority FROM orders
    WHERE o_orderstatus = 'F'
    ORDER BY o_custkey, o_orderpriority
    """,
)
def except_all_rows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full-row bag difference (U4 generalized): the reference only
    differences id SETS (upload_papers_to_supabase.py:247-252);
    EXCEPT ALL subtracts whole rows with multiplicity — the shape for
    'rows in the new snapshot not explained by the old one' when no
    single key exists. One shuffle on the full row; at 100 TB prefer
    hashing wide rows to a digest column first so the shuffle carries
    16 bytes/row, not the row."""
    orders = load_table(spark, sf_dir, "orders")
    recent = orders.filter(
        F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp")
    ).select("o_custkey", "o_orderpriority")
    finished = orders.filter(F.col("o_orderstatus") == "F").select(
        "o_custkey", "o_orderpriority"
    )
    return recent.exceptAll(finished).orderBy(
        "o_custkey", "o_orderpriority"
    )


@query(
    "intersect_distinct_rows",
    oracle="""
    SELECT o_custkey, o_orderpriority FROM orders
    WHERE o_orderdate < TIMESTAMP '1997-01-01'
    INTERSECT
    SELECT o_custkey, o_orderpriority FROM orders
    WHERE o_orderdate >= TIMESTAMP '1997-01-01'
    ORDER BY o_custkey, o_orderpriority
    """,
)
def intersect_distinct_rows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full-row intersection (U5 generalized): (customer, priority)
    combinations appearing in BOTH eras — the reference's refs ∩
    final-ids (main.py:599-604) lifted from key sets to whole rows.
    Spark plans INTERSECT as aggregate + left-semi join, one shuffle
    per side on the row value."""
    orders = load_table(spark, sf_dir, "orders")
    cut = F.lit("1997-01-01").cast("timestamp")
    early = orders.filter(F.col("o_orderdate") < cut).select(
        "o_custkey", "o_orderpriority"
    )
    late = orders.filter(F.col("o_orderdate") >= cut).select(
        "o_custkey", "o_orderpriority"
    )
    return early.intersect(late).orderBy("o_custkey", "o_orderpriority")

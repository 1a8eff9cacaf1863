"""Physical lake layout: bucketing for shuffle-free co-located joins.

The reference re-reads and re-shuffles (well — re-concats in pandas)
its zones on every consumer (SURVEY.md §4 "partition-pruning
analogue"). At 100 TB the dominant cost of the repeated
fact-to-fact joins (orders x lineitem on orderkey, chunks x papers on
paper_id) is the shuffle of both sides. Bucketing writes each table
pre-hash-partitioned AND sorted on the join key; a join between two
tables bucketed the same way needs NO exchange on either side — the
sort-merge join reads co-located buckets directly.

This is a write-once/join-many trade: the bucketed write pays one
shuffle, every subsequent join pays zero. The equivalent exists for
every serious lake format (Hive bucketing here; Iceberg bucket
transform / Delta liquid clustering in managed lakes).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table_name: str,
    bucket_col: str,
    num_buckets: int = 8,
) -> None:
    """Persist a table bucketed+sorted on the join key. Bucket count
    is a layout constant: both sides of a co-located join must agree
    on it (and on the hash function, which Spark fixes)."""
    (
        df.write.mode("overwrite")
        .bucketBy(num_buckets, bucket_col)
        .sortBy(bucket_col)
        .format("parquet")
        .saveAsTable(table_name)
    )


def bucketed_join(
    spark: SparkSession, left_table: str, right_table: str, key_l: str, key_r: str
) -> DataFrame:
    """Join two co-bucketed tables as a sort-merge join. With matching
    bucket specs the physical plan contains no Exchange (verified in
    tests): each task merge-joins bucket i of both tables in place.

    The ``merge`` hint pins SMJ: on dimension-sized test inputs the
    planner would otherwise choose a broadcast join and ignore the
    bucketing entirely — at real fact-x-fact scale SMJ is what it
    picks anyway, and the hint makes the test exercise exactly that
    plan."""
    lt = spark.table(left_table).hint("merge")
    rt = spark.table(right_table)
    return lt.join(rt, lt[key_l] == rt[key_r])

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


def zorder_key(x, y, bits: int = 16):
    """Morton (Z-order) key: interleave the bits of two non-negative
    integer columns so that rows close in BOTH dimensions get close
    key values. All native bit expressions — the whole key stays
    inside whole-stage codegen.

    ``x`` occupies odd bit positions, ``y`` even ones."""
    from pyspark.sql import functions as F

    z = F.lit(0).cast("long")
    for i in range(bits):
        z = z.bitwiseOR(
            F.shiftleft(F.shiftright(x, i).bitwiseAND(F.lit(1)), 2 * i + 1)
        ).bitwiseOR(
            F.shiftleft(F.shiftright(y, i).bitwiseAND(F.lit(1)), 2 * i)
        )
    return z


def write_zordered(
    df: DataFrame,
    path: str,
    col_x: str,
    col_y: str,
    num_files: int = 8,
    bits: int = 16,
) -> None:
    """Multi-dimensional clustering for file skipping. A sort on one
    column gives perfect min/max pruning on that column and NONE on
    any other; Z-ordering range-partitions and sorts by the
    interleaved key instead, so every file covers a small RECTANGLE
    of (x, y) space and parquet footer min/max stats prune scans
    filtered on EITHER dimension (Delta OPTIMIZE ZORDER BY / Iceberg
    z-ordered rewrite — same trick, plain parquet here).

    Both columns are affinely quantized to [0, 2^bits) from their
    observed min/max (one cheap agg pass — at ingest these bounds
    come from catalog stats instead). The quantized key orders the
    write only; stored columns are untouched."""
    from pyspark.sql import functions as F

    lo_hi = df.agg(
        F.min(col_x), F.max(col_x), F.min(col_y), F.max(col_y)
    ).first()
    xlo, xhi, ylo, yhi = (float(v) for v in lo_hi)
    scale = (1 << bits) - 1

    def quant(c, lo, hi):
        if hi <= lo:  # constant column -> all zeros
            return F.lit(0).cast("long")
        return F.least(
            F.lit(scale),
            F.floor((F.col(c).cast("double") - lo) / (hi - lo) * scale),
        ).cast("long")

    keyed = df.withColumn(
        "__z__", zorder_key(quant(col_x, xlo, xhi), quant(col_y, ylo, yhi), bits)
    )
    (
        keyed.repartitionByRange(num_files, "__z__")
        .sortWithinPartitions("__z__")
        .drop("__z__")
        .write.mode("overwrite")
        .parquet(path)
    )

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


def _candidate_files(path, col, lo, hi):
    """Files whose parquet footer [min,max] for col intersects
    [lo,hi] — exactly the skipping decision a stats-aware scan
    makes."""
    import glob

    import pyarrow.parquet as pq

    cand, total = 0, 0
    for f in glob.glob(f"{path}/part-*.parquet"):
        total += 1
        md = pq.ParquetFile(f).metadata
        fmin, fmax = None, None
        for rg in range(md.num_row_groups):
            for ci in range(md.num_columns):
                c = md.row_group(rg).column(ci)
                if c.path_in_schema == col and c.statistics is not None:
                    s = c.statistics
                    fmin = s.min if fmin is None else min(fmin, s.min)
                    fmax = s.max if fmax is None else max(fmax, s.max)
        if fmin is not None and not (fmax < lo or fmin > hi):
            cand += 1
    return cand, total


def test_zorder_layout_prunes_both_dimensions(spark, tmp_path):
    """A single-column sort prunes only its own column; the Z-ordered
    layout must leave footer stats tight enough to skip files on
    EITHER dimension."""
    from citeconnect_datapipeline_spark.plans.layout import write_zordered

    n, side = 4096, 64
    df = spark.range(n).select(
        (F.col("id") % side).alias("x"),
        (F.col("id") / side).cast("long").alias("y"),
        F.col("id").alias("payload"),
    )
    linear = str(tmp_path / "linear")
    zpath = str(tmp_path / "zorder")
    df.repartitionByRange(16, "x").sortWithinPartitions("x").write.parquet(linear)
    write_zordered(df, zpath, "x", "y", num_files=16)

    # same rows either way
    assert (
        spark.read.parquet(zpath).orderBy("payload").collect()
        == spark.read.parquet(linear).orderBy("payload").collect()
    )

    lin_y, lin_total = _candidate_files(linear, "y", 0, 7)
    z_y, z_total = _candidate_files(zpath, "y", 0, 7)
    z_x, _ = _candidate_files(zpath, "x", 0, 7)
    assert lin_y == lin_total, "x-sorted layout cannot prune on y"
    assert z_y < z_total / 2, f"z-order should skip most files on y: {z_y}/{z_total}"
    assert z_x < z_total / 2, f"z-order should skip most files on x: {z_x}/{z_total}"


def test_sorted_layout_compresses_better(spark, tmp_path):
    """Sorting on a low-cardinality column before the write is a pure
    LAYOUT decision that shrinks the same rows on disk: runs of equal
    values let parquet's RLE/dictionary encoding bite, while a
    hash-scattered layout stores the same column as noise. The size
    ratio is the quantified case for sortWithinPartitions on ingest."""
    import os

    n = 200_000
    df = spark.range(n).select(
        (F.col("id") % 20).alias("category"),
        (F.col("id") % 1000).alias("bucket"),
        F.col("id").alias("payload"),
    )
    scattered = str(tmp_path / "scattered")
    ordered = str(tmp_path / "ordered")
    # same 4 files each; one layout hash-scatters the sort key, the
    # other clusters it
    df.repartition(4, "payload").write.parquet(scattered)
    df.repartition(4).sortWithinPartitions(
        "category", "bucket"
    ).write.parquet(ordered)

    def bytes_of(path):
        return sum(
            os.path.getsize(os.path.join(path, f))
            for f in os.listdir(path)
            if f.endswith(".parquet")
        )

    same = (
        spark.read.parquet(ordered).orderBy("payload").collect()
        == spark.read.parquet(scattered).orderBy("payload").collect()
    )
    assert same
    assert bytes_of(ordered) < 0.8 * bytes_of(scattered), (
        f"sorted {bytes_of(ordered)} vs scattered {bytes_of(scattered)}"
    )

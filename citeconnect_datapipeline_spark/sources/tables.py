"""Parquet lake sources.

The reference reads its "zones" (raw_v2/, processed_v2/) by listing a
GCS prefix and concatenating every parquet file into one pandas frame
(reference: utils/gcs_reader.py:64-171). In Spark that whole pattern
is a single ``spark.read.parquet(prefix)`` -- the multi-file concat is
an implicit union, prefix scoping is partition/path pruning, and
column pruning + predicate pushdown reach the scan via Catalyst.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

# Tables the driver materializes per scale factor (TESTDATA.md).
TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

# Small dimension tables that should broadcast in joins even at 100 TB
# fact-table scale (region=5 rows, nation=25 rows at every SF).
BROADCAST_DIMS = frozenset({"region", "nation"})


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Scan one lake table. Plain parquet read: schema comes from the
    footer, filters/projections push down (reference's hand-built
    prefix scan + concat, gcs_reader.py:127-171, is implicit here)."""
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


def load_tables(
    spark: SparkSession, sf_dir: str, names: tuple[str, ...] = TABLES
) -> dict[str, DataFrame]:
    """Load several tables and register each as a temp view so queries
    can be expressed in either DataFrame or SQL form."""
    out: dict[str, DataFrame] = {}
    for name in names:
        df = load_table(spark, sf_dir, name)
        df.createOrReplaceTempView(name)
        out[name] = df
    return out

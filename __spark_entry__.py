"""Driver contract for the spark-graft builder (PySpark target).

Thin adapter over the engine's query registry
(``citeconnect_datapipeline_spark.plans.registry``): every implemented
operator from SURVEY.md SS2 is a named query there, with its DuckDB
oracle SQL where SQL-expressible.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from citeconnect_datapipeline_spark.plans.registry import (  # noqa: E402
    get_oracles,
    get_queries,
)

_SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0.

    papers_pipeline_e2e is the reference's whole §3.1 lifecycle as one
    plan: clean -> filter -> enrich -> dedup -> slice."""
    return get_queries()["papers_pipeline_e2e"](spark, _SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md SS2."""
    return get_queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent ANSI SQL per query (omitted for
    non-SQL-expressible ops -> rows-only check)."""
    return get_oracles()

"""Named-query registry: the engine's public query surface.

Every operator from SURVEY.md SS2 lands here as a named query over the
driver's test tables, together with (where SQL-expressible) the ANSI
SQL a DuckDB oracle runs on the same parquet files. The driver's
correctness gate hash-compares both result sets, so:

- every computed column is aliased identically in Spark and SQL;
- float outputs are rounded (6 dp unless noted) on both sides;
- "keep first"/top-k queries carry a total deterministic order
  (explicit tie-break columns) so limits agree across engines.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLES: dict[str, str] = {}


def query(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    """Register a named query; ``oracle`` is the DuckDB-equivalent SQL
    (omit for non-SQL-expressible ops -> driver does a rows-only check)."""

    def deco(fn: QueryFn) -> QueryFn:
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


def _load_all() -> None:
    # Import for registration side effects; keep in dependency order.
    from ..operators import (  # noqa: F401
        aggregates,
        analytics,
        asof,
        classifier,
        clustering,
        dedup,
        enrichment,
        extraction,
        graph,
        joins,
        multimodal,
        quality,
        setops,
        skew,
        sorts,
        statistics,
        subqueries,
        timeseries,
        tokenizer,
        windows,
        text,
        similarity,
        training,
    )
    from ..functions import scalars  # noqa: F401
    from ..streaming import event_windows  # noqa: F401
    from . import pipelines  # noqa: F401


_loaded = False


def _ensure_loaded() -> None:
    global _loaded
    if not _loaded:
        _load_all()
        _loaded = True


def get_queries() -> dict[str, QueryFn]:
    _ensure_loaded()
    return dict(QUERIES)


def get_oracles() -> dict[str, str]:
    _ensure_loaded()
    return dict(ORACLES)

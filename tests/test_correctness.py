"""Spark-vs-DuckDB oracle parity for every registered query.

Mirrors the driver's correctness gate: run the Spark query and the
oracle SQL on the same parquet tables, sort columns by name, sort
rows deterministically, compare values (floats to ~1e-6 after both
sides' own 6-dp rounding, everything else exact).
"""

from __future__ import annotations

import math

import pytest

from citeconnect_datapipeline_spark.plans.registry import get_oracles, get_queries

QUERIES = get_queries()
ORACLES = get_oracles()


def _coerce(v):
    """Collapse engine-specific scalar types to comparable Python types."""
    import numpy as np
    import pandas as pd

    if v is None:
        return None
    if isinstance(v, (np.ndarray, list, tuple)):
        return tuple(_coerce(x) for x in v)
    try:
        if pd.isna(v):
            return None
    except (TypeError, ValueError):
        pass
    if isinstance(v, np.integer):
        return int(v)
    if isinstance(v, np.floating):
        return float(v)
    if isinstance(v, np.bool_):
        return bool(v)
    if isinstance(v, pd.Timestamp):
        return v.isoformat()
    return v


def _sort_key(row):
    def k(v):
        if v is None:
            return (0, "")
        if isinstance(v, bool):
            return (1, str(int(v)))
        if isinstance(v, (int, float)):
            # round floats so ULP-level engine drift can't reorder rows
            return (2, f"{float(v):.4f}")
        if isinstance(v, tuple):
            return (3, str(tuple(k(x) for x in v)))
        return (4, str(v))

    return tuple(k(v) for v in row)


def _rows(df_pandas):
    cols = sorted(df_pandas.columns)
    df = df_pandas[cols]
    rows = [
        tuple(_coerce(v) for v in rec)
        for rec in df.itertuples(index=False, name=None)
    ]
    return cols, sorted(rows, key=_sort_key)


def _cmp_cell(a, b) -> bool:
    if a is None and b is None:
        return True
    if isinstance(a, tuple) and isinstance(b, tuple):
        return len(a) == len(b) and all(_cmp_cell(x, y) for x, y in zip(a, b))
    if isinstance(a, float) or isinstance(b, float):
        if a is None or b is None:
            return False
        a, b = float(a), float(b)
        if math.isnan(a) and math.isnan(b):
            return True
        return math.isclose(a, b, rel_tol=1e-9, abs_tol=2e-6)
    return a == b


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_oracle_parity(name, spark, duck, sf_dir):
    spark_df = QUERIES[name](spark, sf_dir).toPandas()
    duck_df = duck.execute(ORACLES[name]).fetchdf()

    assert sorted(spark_df.columns) == sorted(duck_df.columns), (
        f"{name}: column mismatch spark={sorted(spark_df.columns)} "
        f"duck={sorted(duck_df.columns)}"
    )
    assert len(spark_df) == len(duck_df), (
        f"{name}: row count spark={len(spark_df)} duck={len(duck_df)}"
    )

    cols, s_rows = _rows(spark_df)
    _, d_rows = _rows(duck_df)
    bad = []
    for i, (sr, dr) in enumerate(zip(s_rows, d_rows)):
        for col, sv, dv in zip(cols, sr, dr):
            if not _cmp_cell(sv, dv):
                bad.append((i, col, sv, dv))
        if len(bad) >= 5:
            break
    assert not bad, f"{name}: value mismatches (row, col, spark, duck): {bad[:5]}"


@pytest.mark.parametrize("name", sorted(set(QUERIES) - set(ORACLES)))
def test_rows_only(name, spark, sf_dir):
    """Non-SQL-expressible ops: runs, stable schema, >=0 rows."""
    df = QUERIES[name](spark, sf_dir)
    assert df.columns
    assert df.count() >= 0


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    assert df.count() > 0
    assert set(e.oracle_sql()) <= set(e.queries())

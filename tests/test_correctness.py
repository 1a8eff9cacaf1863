"""Spark-vs-DuckDB oracle parity for every registered query.

Mirrors the driver's correctness gate: run the Spark query and the
oracle SQL on the same parquet tables, sort columns by name, sort
rows, compare values (floats to ~1e-6 after both sides' own 6-dp
rounding, everything else exact).
"""

from __future__ import annotations

import math

import pytest

from citeconnect_datapipeline_spark.plans.registry import get_oracles, get_queries

QUERIES = get_queries()
ORACLES = get_oracles()


def _normalize(df):
    """Sort columns by name, rows by all values; return list of tuples."""
    df = df[sorted(df.columns)]
    df = df.sort_values(by=list(df.columns)).reset_index(drop=True)
    return df


def _cmp_cell(a, b) -> bool:
    if a is None and b is None:
        return True
    if isinstance(a, float) or isinstance(b, float):
        if a is None or b is None:
            return False
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

    s = _normalize(spark_df)
    d = _normalize(duck_df)
    s_rows = [tuple(r) for r in s.itertuples(index=False)]
    d_rows = [tuple(r) for r in d.itertuples(index=False)]
    bad = []
    for i, (sr, dr) in enumerate(zip(s_rows, d_rows)):
        for col, sv, dv in zip(s.columns, sr, dr):
            sv = None if sv is not None and not isinstance(sv, str) and _isna(sv) else sv
            dv = None if dv is not None and not isinstance(dv, str) and _isna(dv) else dv
            if not _cmp_cell(_coerce(sv), _coerce(dv)):
                bad.append((i, col, sv, dv))
                if len(bad) >= 5:
                    break
        if len(bad) >= 5:
            break
    assert not bad, f"{name}: value mismatches (row, col, spark, duck): {bad}"


def _isna(v) -> bool:
    try:
        import pandas as pd

        return bool(pd.isna(v))
    except (TypeError, ValueError):
        return False


def _coerce(v):
    """Collapse engine-specific scalar types to comparable Python types."""
    import numpy as np
    import pandas as pd

    if isinstance(v, (np.integer,)):
        return int(v)
    if isinstance(v, (np.floating,)):
        return float(v)
    if isinstance(v, np.bool_):
        return bool(v)
    if isinstance(v, pd.Timestamp):
        return v.isoformat()
    if isinstance(v, np.ndarray):
        return tuple(_coerce(x) for x in v)
    if isinstance(v, (list, tuple)):
        return tuple(_coerce(x) for x in v)
    return v


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

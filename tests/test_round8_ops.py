"""Crafted behavioral tests for the round-8 fixes and operators.

Each test plants a distribution where the operator's defining
property is FORCED and asserts the operator finds exactly it —
complementing the oracle hash-match, which checks engine agreement
but not intent.
"""

from __future__ import annotations

import pytest


# ---------------------------------------------------------------
# benford_digit_cells: first SIGNIFICANT digit for values in (0, 1)
# (round-8 ADVICE: floor() of a sub-1 value is 0, which is not a
# significant digit — the cells must bucket 0.025 under '2')
# ---------------------------------------------------------------


def test_benford_first_significant_digit_sub_one(spark):
    from citeconnect_datapipeline_spark.operators.quality import (
        benford_digit_cells,
    )

    rows = [
        (0.025,),  # -> 2
        (0.9,),  # -> 9
        (0.1,),  # -> 1 (exact power of ten, the classic slack trap)
        (0.001,),  # -> 1
        (3.7,),  # -> 3
        (1000.0,),  # -> 1
        (0.0,),  # excluded: no significant digit
        (-5.0,),  # excluded: negative
        (1e-19,),  # excluded: below the documented 1e-18 domain
    ]
    df = spark.createDataFrame(rows, "amount double")
    got = {
        r["digit"]: r["n"]
        for r in benford_digit_cells(df, "amount").collect()
    }
    assert got == {"1": 3, "2": 1, "3": 1, "9": 1}


def test_benford_no_null_expected_rows(spark):
    # every emitted digit must hit the expected-law map: no row may
    # carry a NULL exp_frac/chi2_term (the pre-fix failure mode)
    from citeconnect_datapipeline_spark.operators.quality import (
        benford_digit_cells,
    )

    df = spark.createDataFrame(
        [(0.004,), (0.25,), (7.0,)], "amount double"
    )
    out = benford_digit_cells(df, "amount").collect()
    assert len(out) == 3
    assert all(r["exp_frac"] is not None for r in out)
    assert all(r["chi2_term"] is not None for r in out)


# ---------------------------------------------------------------
# hill_tail_profile: truncated ladders must stay visible
# (round-8 ADVICE: an input smaller than k+1 silently dropped the
# whole k rung; it must now emit the rung with NULL hill_alpha)
# ---------------------------------------------------------------


def test_hill_tail_profile_truncated_rung_is_visible(spark):
    from citeconnect_datapipeline_spark.operators.statistics import (
        hill_tail_profile,
    )

    # 10 rows: k=5 computable, k=25/100 rungs lack a (k+1)-th order
    # statistic and must surface with NULL alpha, not vanish.
    df = spark.createDataFrame(
        [(float(100 - i), i) for i in range(10)],
        "x double, o_orderkey long",
    )
    out = {
        r["tail_k"]: r
        for r in hill_tail_profile(
            df, "x", "o_orderkey", ks=(5, 25, 100)
        ).collect()
    }
    assert sorted(out) == [5, 25, 100]
    assert out[5]["hill_alpha"] is not None
    assert out[5]["x_threshold"] == pytest.approx(95.0)
    for k in (25, 100):
        assert out[k]["hill_alpha"] is None
        assert out[k]["x_threshold"] is None


def test_hill_tail_profile_empty_input_emits_ladder(spark):
    from citeconnect_datapipeline_spark.operators.statistics import (
        hill_tail_profile,
    )

    df = spark.createDataFrame([], "x double, o_orderkey long")
    out = hill_tail_profile(df, "x", "o_orderkey", ks=(5, 25)).collect()
    assert sorted(r["tail_k"] for r in out) == [5, 25]
    assert all(r["hill_alpha"] is None for r in out)


# ---------------------------------------------------------------
# revenue_lorenz_deciles boundary rule: ties share a decile
# ---------------------------------------------------------------


def test_lorenz_boundary_ties_share_a_decile(spark):
    # the r8 percentile-boundary rule puts equal revenues in the
    # same decile (NTILE would have split them arbitrarily)
    import pyspark.sql.functions as F

    from citeconnect_datapipeline_spark.operators.statistics import (
        LORENZ_BUCKETS,
    )

    assert LORENZ_BUCKETS == 10
    from __spark_entry__ import queries

    out = (
        queries()["revenue_lorenz_deciles"](
            spark, "/root/testdata/sf0.001"
        )
        .orderBy("decile")
        .collect()
    )
    assert 1 <= len(out) <= 10
    # cumulative shares are monotone and end at 1
    cum = [r["cum_rev_share"] for r in out]
    assert cum == sorted(cum)
    assert cum[-1] == pytest.approx(1.0, abs=1e-4)
    assert out[-1]["cum_pop_share"] == pytest.approx(1.0, abs=1e-4)
    # Lorenz dominance: cumulative revenue share never exceeds
    # cumulative population share (lowest-revenue deciles first)
    for r in out[:-1]:
        assert r["cum_rev_share"] <= r["cum_pop_share"] + 1e-6

#!/usr/bin/env python
"""Experiment / intervention readout with the library facade (api.py).

The decision-science flow a growth or platform team runs when a
change shipped WITHOUT a clean randomized experiment and the naive
dashboard number cannot be trusted:

1. ``api.causal.ipw_ate_cells`` — inverse-propensity-weighted effect
   of a (non-randomly assigned) treatment on an outcome, with the
   naive difference printed beside it as the confounding read;
2. ``api.causal.did_cells`` — difference-in-differences around the
   ship date when a never-treated comparison group exists, cancelling
   common shocks and fixed group gaps;
3. ``api.causal.logrank_stats`` — when the outcome is time-to-event
   (activation latency, churn), the censoring-correct cohort test.

All three run on ARBITRARY in-memory DataFrames — no benchmark lake —
and each returns a single verdict row a readout doc pastes directly.

Usage:
    python examples/experiment_readout.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def readout(spark, exposures, panel, subjects):
    """exposures(strata, t, y) + panel(treated, post, y) +
    subjects(g, event, t_day) -> dict of 1-row verdict frames."""
    from citeconnect_datapipeline_spark import api

    return {
        # observational: weight by the strata propensity model
        "ipw": api.causal.ipw_ate_cells(exposures, strata="strata"),
        # quasi-experimental: 2x2 around the intervention date
        "did": api.causal.did_cells(panel),
        # time-to-event: censoring-correct two-cohort comparison
        "logrank": api.causal.logrank_stats(subjects),
    }


def main() -> None:
    from citeconnect_datapipeline_spark.session import get_spark

    spark = get_spark(app_name="experiment-readout")
    # A deliberately confounded observational panel: the H stratum
    # both converts higher AND is treated more often, so the naive
    # diff is positive while the true effect is zero.
    rows = []
    for strata, y, n_treat, n in (("H", 100.0, 80, 100), ("L", 10.0, 20, 100)):
        for i in range(n):
            rows.append((strata, 1 if i < n_treat else 0, y))
    exposures = spark.createDataFrame(
        rows, "strata string, t int, y double"
    )
    panel = spark.createDataFrame(
        [(1, 0, 10.0)] * 50 + [(1, 1, 25.0)] * 50
        + [(0, 0, 20.0)] * 50 + [(0, 1, 30.0)] * 50,
        "treated int, post int, y double",
    )
    subjects = spark.createDataFrame(
        [(1, 1, d) for d in (1, 2, 3) for _ in range(5)]
        + [(2, 0, 30)] * 15,  # comparison cohort never converts
        "g int, event int, t_day long",
    )
    out = readout(spark, exposures, panel, subjects)
    for name, df in out.items():
        print(f"== {name} ==")
        df.show(truncate=False)


if __name__ == "__main__":
    main()

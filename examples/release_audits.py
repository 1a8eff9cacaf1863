#!/usr/bin/env python
"""Pre-release audit battery with the library facade (api.py).

Before a curated corpus ships, a release manager runs the audit
battery: the three privacy gates (k-anonymity cell sizes,
l-diversity and t-closeness of the sensitive attribute within each
cell), a column-association screen (does an innocuous attribute
predict the sensitive one?), DP releases for the numbers that ship
(noisy counts; an exponential-mechanism median), and a forward
as-of check that the release's event log can attribute conversions.
All expressed against ``api.*`` DataFrame functions — no benchmark
lake layout.

Usage:
    python examples/release_audits.py
"""

import datetime
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F


def audit(spark, people, events):
    """people(region, age_band, condition) + events(user_id, ts,
    event_id, kind, amount) -> dict of audit DataFrames."""
    from citeconnect_datapipeline_spark import api

    k_cells = api.curation.k_anonymity_cells(
        people, ["region", "age_band"]
    )
    l_cells = api.curation.l_diversity_cells(
        people, ["region", "age_band"], "condition"
    )
    assoc = api.stats.categorical_mi(
        people, "region", "condition", "region~condition"
    )
    exposures = events.filter(F.col("kind") == "exposure")
    outcomes = events.filter(F.col("kind") == "outcome").select(
        "user_id", "ts", "event_id", F.col("amount").alias("outcome_amount")
    )
    attributed = api.timeseries.asof_join_forward(
        exposures,
        outcomes,
        key="user_id",
        ts="ts",
        order_col="event_id",
        right_cols=["outcome_amount"],
    )
    # numeric integrity + release privacy: the amount column's digit
    # law, a salted DP count release of the condition cells, and the
    # event stream's disorder profile (what withWatermark should be)
    benford = api.curation.benford_digit_cells(
        events.filter(F.col("amount") > 0), "amount"
    )
    cond_cells = people.groupBy(
        F.col("condition").alias("cell")
    ).agg(F.count("*").alias("n"))
    dp_release = api.curation.dp_noisy_counts_release(
        cond_cells, "cell", salt="rotate-me-per-release"
    )
    lateness = api.timeseries.lateness_profile(events)
    # round-9 rungs of the privacy ladder: does any region's
    # condition DISTRIBUTION leak (t-closeness, the skew attack
    # l-diversity misses), and a DP median of amounts via the
    # exponential mechanism (quantiles need selection, not noise)
    t_close = api.curation.t_closeness_cells(
        people, "region", "condition"
    )
    dp_median = api.curation.dp_median_exponential(
        events.filter(F.col("amount") > 0),
        "amount",
        salt="rotate-me-per-release",
        release_key="amounts",
        lo=0.0,
        hi=100.0,
        cells=100,
    )
    return {
        "k_anonymity": k_cells,
        "l_diversity": l_cells,
        "t_closeness": t_close,
        "association": assoc,
        "attribution": attributed,
        "benford": benford,
        "dp_release": dp_release,
        "dp_median": dp_median,
        "lateness": lateness,
    }


def main() -> None:
    from citeconnect_datapipeline_spark.session import get_spark

    spark = get_spark()
    people = spark.createDataFrame(
        [
            ("west", "30-39", "a"),
            ("west", "30-39", "b"),
            ("west", "30-39", "c"),
            ("west", "30-39", "a"),
            ("west", "30-39", "b"),
            ("east", "40-49", "a"),
            ("east", "40-49", "a"),  # k-safe only if k <= 2; homogeneous
        ],
        "region string, age_band string, condition string",
    )
    t0 = datetime.datetime(2024, 1, 1)
    events = spark.createDataFrame(
        [
            (1, t0, 100, "exposure", 0.0),
            (1, t0 + datetime.timedelta(hours=2), 101, "outcome", 9.5),
            (2, t0, 102, "exposure", 0.0),
        ],
        "user_id long, ts timestamp, event_id long, kind string,"
        " amount double",
    )
    for name, df in audit(spark, people, events).items():
        print(f"== {name}")
        df.show(truncate=False)


if __name__ == "__main__":
    main()

"""Crafted behavioral tests for the round-7 operators.

Each test either plants a distribution where the operator's defining
property is FORCED or asserts the mathematical invariants the
statistic must satisfy on real data — complementing the oracle
hash-match, which checks engine agreement but not intent.
"""

from __future__ import annotations

import math

from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


def test_benford_digit_audit_invariants(spark):
    """Digits are '1'..'9' (the string-head extraction can never
    yield '0' or a sign for positive prices), observed fractions sum
    to 1, expected fractions are the Benford law, and every
    chi-square term is the (obs-exp)^2/exp of its own row."""
    from citeconnect_datapipeline_spark.operators.quality import (
        BENFORD_EXPECTED,
        benford_digit_audit,
    )

    rows = benford_digit_audit(spark, SF).collect()
    assert [r["digit"] for r in rows] == [str(d) for d in range(1, 10)]
    assert abs(sum(r["obs_frac"] for r in rows) - 1.0) < 1e-5
    for r in rows:
        assert r["exp_frac"] == BENFORD_EXPECTED[int(r["digit"])]
        want = (r["obs_frac"] - r["exp_frac"]) ** 2 / r["exp_frac"]
        assert abs(r["chi2_term"] - want) < 1e-6
        assert r["n"] > 0


def test_benford_digit_audit_flags_planted_uniform(spark, tmp_path):
    """A uniformly-digited column (anti-Benford) must show its
    largest chi-square contribution on digit 1 — the digit Benford
    expects 30% of and uniform data gives ~11% of."""
    import shutil

    from citeconnect_datapipeline_spark.operators.quality import (
        benford_digit_audit,
    )

    sf = tmp_path / "sf"
    sf.mkdir()
    # first digits cycle 1..9 uniformly
    spark.range(900).select(
        ((F.col("id") % 9 + 1) * 100 + F.col("id") % 100)
        .cast("double")
        .alias("l_extendedprice")
    ).write.parquet(str(sf / "lineitem.parquet"))
    for t in (
        "region nation customer supplier part orders events "
        "documents embeddings"
    ).split():
        shutil.copyfile(
            f"{SF}/{t}.parquet", str(sf / f"{t}.parquet")
        )
    rows = {
        r["digit"]: r for r in benford_digit_audit(spark, str(sf)).collect()
    }
    assert abs(rows["1"]["obs_frac"] - 1 / 9) < 0.01
    top = max(rows.values(), key=lambda r: r["chi2_term"])
    assert top["digit"] == "1"


def test_chi2_term_selection_contingency_consistency(spark):
    """Every output row's 2x2 cells are non-negative and sum to the
    corpus doc count, and the statistic recomputes from its own
    cells."""
    from citeconnect_datapipeline_spark.operators.text import (
        chi2_term_selection,
    )
    from citeconnect_datapipeline_spark.sources.tables import load_table

    n_docs = load_table(spark, SF, "documents").count()
    rows = chi2_term_selection(spark, SF).collect()
    assert rows
    prev = math.inf
    for r in rows:
        cells = (r["n11"], r["n10"], r["n01"], r["n00"])
        assert all(c >= 0 for c in cells)
        assert sum(cells) == n_docs
        n11, n10, n01, n00 = cells
        n = n_docs
        want = (
            n
            * (n11 * n00 - n10 * n01) ** 2
            / ((n11 + n10) * (n01 + n00) * (n11 + n01) * (n10 + n00))
        )
        assert abs(r["chi2"] - want) < 1e-4
        assert r["chi2"] <= prev + 1e-9  # sorted by statistic
        prev = r["chi2"]


def test_embedding_isotropy_audit_invariants(spark):
    """The ratio is ||mean||^2 / mean||v||^2 in [0, 1], and the
    exact pairwise-dot identity reproduces a brute-force average on
    the small fixture."""
    from citeconnect_datapipeline_spark.operators.similarity import (
        embedding_isotropy_audit,
    )
    from citeconnect_datapipeline_spark.sources.tables import load_table

    [row] = embedding_isotropy_audit(spark, SF).collect()
    assert row["n"] > 1
    assert 0.0 <= row["isotropy_ratio"] <= 1.0
    assert (
        abs(
            row["isotropy_ratio"]
            - row["norm_sq_of_mean"] / row["mean_sq_norm"]
        )
        < 1e-5
    )
    vecs = [
        [float(x) for x in r["embedding"]]
        for r in load_table(spark, SF, "embeddings").collect()
    ]
    n = len(vecs)
    dim_sums = [sum(v[d] for v in vecs) for d in range(len(vecs[0]))]
    s2 = sum(s * s for s in dim_sums)
    sum_v2 = sum(sum(x * x for x in v) for v in vecs)
    brute_avg_dot = (s2 - sum_v2) / (n * (n - 1))
    assert abs(row["avg_pairwise_dot"] - brute_avg_dot) < 1e-4
    assert abs(row["mean_sq_norm"] - sum_v2 / n) < 1e-4


def test_rank_biased_overlap_invariants(spark):
    """Per-depth agreement in [0,1], overlap non-decreasing by at
    most 2 per depth (one new item per list prefix), contributions
    follow the (1-p) p^(d-1) weighting of their own agreement, and
    cumulative RBO is non-decreasing and <= 1."""
    from citeconnect_datapipeline_spark.operators.sorts import (
        RBO_P,
        rank_biased_overlap,
    )

    rows = rank_biased_overlap(spark, SF).collect()
    assert [r["depth"] for r in rows] == list(range(1, 21))
    prev_overlap, prev_cum = 0, 0.0
    for r in rows:
        d = r["depth"]
        assert prev_overlap <= r["n_overlap"] <= prev_overlap + 2
        assert r["n_overlap"] <= d
        assert 0.0 <= r["agreement"] <= 1.0
        want = (1 - RBO_P) * RBO_P ** (d - 1) * r["n_overlap"] / d
        assert abs(r["contribution"] - want) < 1e-6
        assert r["rbo_cum"] >= prev_cum - 1e-9
        prev_overlap, prev_cum = r["n_overlap"], r["rbo_cum"]
    assert prev_cum <= 1.0 + 1e-9


def test_page_hinkley_fires_on_planted_level_shift(spark, tmp_path):
    """A clean level shift (value 10/event for 20 days, then
    50/event) must push the PH statistic over lambda AFTER the shift
    day and never before — the defining sequential-detection
    property."""
    import shutil

    from citeconnect_datapipeline_spark.operators.timeseries import (
        page_hinkley_drift,
    )

    sf = tmp_path / "sf"
    sf.mkdir()
    rows = []
    for day in range(30):
        for k in range(5):
            rows.append(
                (
                    day * 5 + k,
                    1_600_000_000 + day * 86_400 + k,
                    k,
                    "click",
                    10.0 if day < 20 else 50.0,
                )
            )
    spark.createDataFrame(
        rows, "event_id long, ts_sec long, user_id long,"
        " event_type string, value double"
    ).select(
        "event_id",
        F.timestamp_seconds("ts_sec").alias("ts"),
        "user_id",
        "event_type",
        "value",
    ).write.parquet(str(sf / "events.parquet"))
    for t in (
        "region nation customer supplier part orders lineitem "
        "documents embeddings"
    ).split():
        shutil.copyfile(
            f"{SF}/{t}.parquet", str(sf / f"{t}.parquet")
        )
    out = page_hinkley_drift(spark, str(sf)).collect()
    alarm_days = [r["wd"] for r in out if r["alarm"] == 1]
    shift_wd = out[20]["wd"]
    assert alarm_days, "level shift never detected"
    assert min(alarm_days) >= shift_wd  # no false alarm before
    assert min(alarm_days) <= shift_wd + 2  # detected promptly


def test_token_gini_extremes_on_planted_sources(spark, tmp_path):
    """A source using one word everywhere must show near-0 gini
    (even use of its single type is trivially equal) and simpson=1;
    a source with every word distinct must show gini ~= 0 and
    simpson = 1/n — and a skewed source sits strictly between on
    simpson. Pins the direction of all three indices."""
    import shutil

    from citeconnect_datapipeline_spark.operators.text import (
        token_gini_by_source,
    )

    sf = tmp_path / "sf"
    sf.mkdir()
    docs = []
    # source A: one word, 100 occurrences -> simpson 1, entropy 0
    docs.append((0, "alpha " * 100, "en", "A", 600))
    # source B: 50 distinct words once each -> simpson 1/50, gini 0
    docs.append(
        (1, " ".join(f"word{i:02d}" for i in range(50)), "en", "B", 400)
    )
    # source C: skewed 60/30/10 over three words
    docs.append(
        (2, "xxx " * 60 + "yyy " * 30 + "zzz " * 10, "en", "C", 500)
    )
    spark.createDataFrame(
        docs, "doc_id long, text string, lang string, source string,"
        " n_chars long"
    ).write.parquet(str(sf / "documents.parquet"))
    for t in (
        "region nation customer supplier part orders lineitem "
        "events embeddings"
    ).split():
        shutil.copyfile(
            f"{SF}/{t}.parquet", str(sf / f"{t}.parquet")
        )
    got = {
        r["source"]: r for r in token_gini_by_source(spark, str(sf)).collect()
    }
    assert got["A"]["n_distinct"] == 1
    assert got["A"]["simpson"] == 1.0
    assert got["A"]["entropy"] == 0.0
    assert got["A"]["gini"] == 0.0
    assert got["B"]["n_distinct"] == 50
    assert abs(got["B"]["simpson"] - 1 / 50) < 1e-6
    assert got["B"]["gini"] == 0.0  # perfectly even counts
    assert got["C"]["n_distinct"] == 3
    assert 1 / 3 < got["C"]["simpson"] < 1.0  # between even and single
    assert got["C"]["gini"] > 0.2  # concentration visible


def test_ab_srm_audit_flags_only_the_biased_split(spark):
    """The fair half-the-hex-space assignment must pass SRM and the
    deliberate 9/16 skew must be flagged — the pass/fail pair is the
    operator's contract. Runs at sf0.01 (1500 customers): the chi2
    test needs n for power — at the 150-customer smoke fixture a
    6-point skew is statistically invisible, which is itself the
    reason platforms run SRM on full assignment logs."""
    from citeconnect_datapipeline_spark.operators.statistics import (
        ab_srm_audit,
    )

    rows = ab_srm_audit(spark, "/root/testdata/sf0.01").collect()
    flags = {r["method"]: r["srm_flag"] for r in rows}
    assert flags == {"fair_hash": 0, "biased_hash": 1}
    for r in rows:
        assert abs(r["obs_frac"] - 0.5) < 0.12
        assert r["chi2"] >= 0


def test_conformal_coverage_near_target(spark):
    """Split-conformal coverage on exchangeable data must land near
    the 1-alpha target (90%) — the distribution-free guarantee the
    audit exists to verify — and every count must reconcile."""
    from citeconnect_datapipeline_spark.operators.training import (
        conformal_coverage_audit,
    )
    from citeconnect_datapipeline_spark.sources.tables import load_table

    [row] = conformal_coverage_audit(spark, SF).collect()
    n = load_table(spark, SF, "lineitem").count()
    assert row["n_calib"] + row["n_test"] == n
    assert row["n_unpredicted"] == 0  # quantity grid fully covered
    assert 0.85 <= row["coverage"] <= 0.95
    assert abs(row["coverage"] + row["miscoverage"] - 1.0) < 1e-6
    assert row["q_hat"] > 0


def test_welch_ttest_recomputes_from_slice_moments(spark):
    """Each slice's t statistic reconciles with a brute-force Welch
    computation from the raw rows, and slice+rest counts cover the
    corpus."""
    from citeconnect_datapipeline_spark.operators.statistics import (
        welch_ttest_slices,
    )
    from citeconnect_datapipeline_spark.sources.tables import load_table

    rows = welch_ttest_slices(spark, SF).collect()
    li = [
        (r["l_returnflag"], float(r["l_extendedprice"]))
        for r in load_table(spark, SF, "lineitem")
        .select("l_returnflag", "l_extendedprice")
        .collect()
    ]
    n_all = len(li)
    for r in rows:
        xs = [v for f, v in li if f == r["slice"]]
        ys = [v for f, v in li if f != r["slice"]]
        assert r["n1"] == len(xs) and r["n2"] == len(ys)
        assert r["n1"] + r["n2"] == n_all
        m1 = sum(xs) / len(xs)
        m2 = sum(ys) / len(ys)
        v1 = sum((x - m1) ** 2 for x in xs) / (len(xs) - 1)
        v2 = sum((y - m2) ** 2 for y in ys) / (len(ys) - 1)
        t = (m1 - m2) / (v1 / len(xs) + v2 / len(ys)) ** 0.5
        assert abs(r["welch_t"] - t) < 1e-3


def test_assoc_rules_confidence_and_lift_identities(spark):
    """Every rule's confidence is P(B|A) from its own counts, lift is
    symmetric within an (A,B) pair (same joint, same denominators up
    to direction), and support <= confidence."""
    from citeconnect_datapipeline_spark.operators.graph import (
        assoc_rules_topk,
    )

    rows = assoc_rules_topk(spark, SF).collect()
    assert rows
    by_pair = {}
    for r in rows:
        assert 0 < r["support"] <= r["confidence"] <= 1.0
        assert r["lift"] > 0
        key = tuple(sorted((r["ante"], r["conseq"])))
        by_pair.setdefault(key, []).append(r["lift"])
    for lifts in by_pair.values():
        if len(lifts) == 2:  # both directions surfaced
            assert abs(lifts[0] - lifts[1]) < 1e-4  # lift is symmetric


def test_pack_bestfit_bounds_and_planted_improvement(spark, tmp_path):
    """FFD packing invariants on the real fixture (lower bound <=
    packs <= 2*lower_bound + 1, exact token accounting) plus a
    planted case where decreasing order provably beats arrival-order
    first-fit: sizes [6,5,4,3,2,1,...]*budget/10 pack into the
    optimal bin count under FFD while arrival order [1,2,...] wastes
    a bin."""
    import shutil

    from citeconnect_datapipeline_spark.operators.training import (
        PACK_BUDGET,
        pack_sequences_bestfit,
    )

    rows = pack_sequences_bestfit(spark, SF).collect()
    assert rows
    for r in rows:
        assert r["lower_bound"] <= r["n_packs"] <= 2 * r["lower_bound"] + 1
        assert 0.0 <= r["waste_frac"] < 1.0
        assert r["n_oversize"] >= 0
        # waste identity: tokens + waste = packs * budget
        used = r["n_packs"] * PACK_BUDGET * (1 - r["waste_frac"])
        assert abs(used - r["total_tokens"]) < PACK_BUDGET * 1e-4

    # planted: one shard, sizes 0.6B, 0.5B, 0.4B, 0.3B, 0.2B in words
    sf = tmp_path / "sf"
    sf.mkdir()
    fracs = [0.6, 0.5, 0.4, 0.3, 0.2]
    docs = [
        (i, "w " * int(PACK_BUDGET * f), "en", "S", 100)
        for i, f in enumerate(fracs)
    ]
    spark.createDataFrame(
        docs,
        "doc_id long, text string, lang string, source string,"
        " n_chars long",
    ).write.parquet(str(sf / "documents.parquet"))
    for t in (
        "region nation customer supplier part orders lineitem "
        "events embeddings"
    ).split():
        shutil.copyfile(f"{SF}/{t}.parquet", str(sf / f"{t}.parquet"))
    got = pack_sequences_bestfit(spark, str(sf)).collect()
    # all 5 docs, total 2.0 budgets -> FFD reaches the lower bound 2:
    # (0.6+0.4), (0.5+0.3+0.2); arrival-order would need 3
    assert sum(r["n_docs"] for r in got) == 5
    assert sum(r["n_packs"] for r in got) == sum(
        r["lower_bound"] for r in got
    )


def test_lorenz_curve_monotone_convex_and_complete(spark):
    """The Lorenz curve must be monotone in both axes, end at
    (1.0, 1.0), stay under the diagonal (cumulative revenue share <=
    cumulative population share never, since low deciles earn less),
    and its decile shares must sum to 1."""
    from citeconnect_datapipeline_spark.operators.statistics import (
        revenue_lorenz_deciles,
    )

    rows = revenue_lorenz_deciles(spark, SF).collect()
    assert [r["decile"] for r in rows] == list(range(1, 11))
    prev_rev, prev_pop = 0.0, 0.0
    for r in rows:
        assert r["cum_rev_share"] >= prev_rev - 1e-9
        assert r["cum_pop_share"] >= prev_pop - 1e-9
        # ASC-sorted deciles: curve sags under the diagonal
        assert r["cum_rev_share"] <= r["cum_pop_share"] + 1e-6
        prev_rev, prev_pop = r["cum_rev_share"], r["cum_pop_share"]
    assert abs(prev_rev - 1.0) < 1e-5 and abs(prev_pop - 1.0) < 1e-5
    assert abs(sum(r["rev_share"] for r in rows) - 1.0) < 1e-4


def test_degree_fit_recovers_planted_power_law(spark, tmp_path):
    """A synthetic graph with an exact n(d) ~ d^-2 degree histogram
    must fit alpha ~= 2 with R^2 ~= 1 — the estimator estimates what
    it claims."""
    import shutil

    from citeconnect_datapipeline_spark.operators.graph import (
        degree_distribution_fit,
    )

    sf = tmp_path / "sf"
    sf.mkdir()
    # for degree d in 1..12: floor(1200/d^2) parts with that degree
    rows = []
    part = 0
    order = 0
    for d in range(1, 13):
        for _ in range(1200 // (d * d)):
            for _ in range(d):
                rows.append((order, part))
                order += 1
            part += 1
    spark.createDataFrame(
        rows, "l_orderkey long, l_partkey long"
    ).write.parquet(str(sf / "lineitem.parquet"))
    for t in (
        "region nation customer supplier part orders events "
        "documents embeddings"
    ).split():
        shutil.copyfile(f"{SF}/{t}.parquet", str(sf / f"{t}.parquet"))
    [row] = degree_distribution_fit(spark, str(sf)).collect()
    assert 1.8 <= row["powerlaw_alpha"] <= 2.2
    assert row["fit_r2"] > 0.98
    assert row["max_degree"] == 12


def test_column_null_profile_counts_planted_defects(spark, tmp_path):
    """Planted nulls, blanks, and non-positive numerics must land in
    the right cells of the profile."""
    import shutil

    from citeconnect_datapipeline_spark.operators.quality import (
        column_null_profile,
    )

    sf = tmp_path / "sf"
    sf.mkdir()
    docs = [
        (1, "hello", "en", "web", 5),
        (2, None, "en", "  ", 0),       # null text, blank source, 0 chars
        (3, "", None, "web", -4),       # blank text, null lang, neg chars
        (4, "ok", "fr", "web", 2),
    ]
    spark.createDataFrame(
        docs,
        "doc_id long, text string, lang string, source string,"
        " n_chars long",
    ).write.parquet(str(sf / "documents.parquet"))
    for t in (
        "region nation customer supplier part orders lineitem "
        "events embeddings"
    ).split():
        shutil.copyfile(f"{SF}/{t}.parquet", str(sf / f"{t}.parquet"))
    got = {
        r["col"]: r for r in column_null_profile(spark, str(sf)).collect()
    }
    assert got["text"]["n_null"] == 1
    assert got["text"]["n_degenerate"] == 1  # the empty string
    assert got["lang"]["n_null"] == 1
    assert got["source"]["n_degenerate"] == 1  # whitespace-only
    assert got["n_chars"]["n_degenerate"] == 2  # 0 and -4
    assert got["doc_id"]["n_distinct"] == 4
    assert all(r["n_rows"] == 4 for r in got.values())


def test_context_fit_curve_monotone_and_exact_at_extremes(spark):
    """Coverage must be monotone in the budget, the largest budget
    keeps everything on this corpus (docs max out under 256 words),
    and per-row identities hold (kept tokens never exceed the
    total, loss + kept fraction = 1)."""
    from citeconnect_datapipeline_spark.operators.training import (
        CTX_LADDER,
        context_fit_curve,
    )

    rows = context_fit_curve(spark, SF).collect()
    assert [r["ctx_budget"] for r in rows] == list(CTX_LADDER)
    prev_fit, prev_kept = -1, -1
    for r in rows:
        assert r["n_docs_fit"] >= prev_fit
        assert r["tokens_kept"] >= prev_kept
        assert 0.0 <= r["token_loss_frac"] <= 1.0
        prev_fit, prev_kept = r["n_docs_fit"], r["tokens_kept"]
    assert rows[-1]["frac_docs_fit"] == 1.0
    assert rows[-1]["token_loss_frac"] == 0.0


def test_dedup_source_flow_pairs_reconcile_with_components(spark):
    """The flow matrix's total pair count equals the thresholded
    pair table's row count (every near-dup pair lands in exactly one
    (source_lo, source_hi) cell), and cells are canonically
    ordered."""
    from citeconnect_datapipeline_spark.operators.dedup import (
        NEARDUP_JACCARD,
        _jaccard_pairs_materialized,
        dedup_source_flow,
    )

    rows = dedup_source_flow(spark, SF).collect()
    n_pairs = (
        _jaccard_pairs_materialized(spark, SF)
        .filter(F.col("jaccard") >= NEARDUP_JACCARD)
        .count()
    )
    assert sum(r["n_pairs"] for r in rows) == n_pairs
    for r in rows:
        assert r["source_lo"] <= r["source_hi"]
        assert r["sum_jaccard"] >= NEARDUP_JACCARD * r["n_pairs"] - 1e-6


def test_km_survival_matches_textbook_on_planted_cohort(spark, tmp_path):
    """Textbook KM check: 4 signups; purchases at day 1 (u1), day 3
    (u2); u3, u4 censored at the horizon (day 5, no purchase).
    S(1) = 1 - 1/4 = 0.75; S(3) = 0.75 * (1 - 1/3) = 0.5; censored
    users reduce the risk set without dropping the curve to 0."""
    import shutil

    from citeconnect_datapipeline_spark.operators.timeseries import (
        survival_km_curve,
    )

    sf = tmp_path / "sf"
    sf.mkdir()
    day = 86_400
    t0 = 1_600_000_000
    rows = [
        # (event_id, ts_sec, user_id, event_type, value)
        (1, t0, 1, "signup", 0.0),
        (2, t0 + 1 * day, 1, "purchase", 5.0),
        (3, t0, 2, "signup", 0.0),
        (4, t0 + 3 * day, 2, "purchase", 5.0),
        (5, t0, 3, "signup", 0.0),
        (6, t0, 4, "signup", 0.0),
        (7, t0 + 5 * day, 9, "click", 0.0),  # sets the horizon
    ]
    spark.createDataFrame(
        rows,
        "event_id long, ts_sec long, user_id long,"
        " event_type string, value double",
    ).select(
        "event_id",
        F.timestamp_seconds("ts_sec").alias("ts"),
        "user_id",
        "event_type",
        "value",
    ).write.parquet(str(sf / "events.parquet"))
    for t in (
        "region nation customer supplier part orders lineitem "
        "documents embeddings"
    ).split():
        shutil.copyfile(f"{SF}/{t}.parquet", str(sf / f"{t}.parquet"))
    got = {
        r["t_day"]: r for r in survival_km_curve(spark, str(sf)).collect()
    }
    assert set(got) == {1, 3}
    assert got[1]["n_at_risk"] == 4 and got[1]["n_events"] == 1
    assert abs(got[1]["survival"] - 0.75) < 1e-6
    assert got[3]["n_at_risk"] == 3 and got[3]["n_events"] == 1
    assert abs(got[3]["survival"] - 0.5) < 1e-6


def test_km_survival_monotone_on_real_fixture(spark):
    """On the lake: survival is non-increasing, within (0, 1], the
    risk set shrinks monotonically, and the curve never outlives the
    cohort."""
    from citeconnect_datapipeline_spark.operators.timeseries import (
        survival_km_curve,
    )

    rows = survival_km_curve(spark, SF).collect()
    assert rows
    prev_s, prev_risk = 1.0 + 1e-9, float("inf")
    for r in rows:
        assert 0.0 <= r["survival"] <= prev_s + 1e-9
        assert r["n_at_risk"] <= prev_risk
        assert 0 < r["n_events"] <= r["n_at_risk"]
        prev_s, prev_risk = r["survival"], r["n_at_risk"]

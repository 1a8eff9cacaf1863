"""Crafted behavioral tests for the round-8 operators.

Each test either plants a distribution where the operator's defining
property is FORCED or asserts the mathematical invariants the
statistic must satisfy — complementing the oracle hash-match, which
checks engine agreement but not intent.
"""

from __future__ import annotations

from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


# ------------------------- Mann-Whitney U -------------------------


def _mwu(spark, rows):
    from citeconnect_datapipeline_spark.api import stats

    df = spark.createDataFrame(rows, "metric string, v double, g int")
    return {r["metric"]: r for r in stats.mannwhitney_u(df).collect()}


def test_mannwhitney_detects_planted_dominance(spark):
    # group 1 strictly above group 2 -> U1 = n1*n2 (every pair won),
    # z large positive, significant
    rows = [("m", float(100 + i), 1) for i in range(40)] + [
        ("m", float(i), 2) for i in range(40)
    ]
    r = _mwu(spark, rows)["m"]
    assert r["u_stat"] == 40.0 * 40.0
    assert r["mw_z"] > 1.96 and r["significant"] == 1


def test_mannwhitney_null_on_identical_samples(spark):
    # the SAME discrete distribution in both groups -> U = n1*n2/2
    # exactly (all mass in ties), z = 0, not significant
    rows = [
        ("m", float(v), g) for v in range(10) for g in (1, 2) for _ in range(5)
    ]
    r = _mwu(spark, rows)["m"]
    assert r["u_stat"] == (50.0 * 50.0) / 2
    assert r["mw_z"] == 0.0 and r["significant"] == 0


def test_mannwhitney_u1_plus_u2_identity(spark):
    # swapping the group labels must give U2 = n1*n2 - U1 (the
    # defining identity of the two-sample U pair)
    import random

    rnd = random.Random(8)
    rows = [
        ("m", float(rnd.randint(0, 20)), 1 + (i % 3 == 0))
        for i in range(300)
    ]
    swapped = [(m, v, 3 - g) for (m, v, g) in rows]
    a = _mwu(spark, rows)["m"]
    b = _mwu(spark, swapped)["m"]
    assert a["n1"] == b["n2"] and a["n2"] == b["n1"]
    assert abs(a["u_stat"] + b["u_stat"] - a["n1"] * a["n2"]) < 1e-6
    assert abs(a["mw_z"] + b["mw_z"]) < 2e-6  # antisymmetric


# ----------------------------- CUSUM ------------------------------


def _cusum(spark, xs, **kw):
    from citeconnect_datapipeline_spark.api import timeseries

    df = spark.createDataFrame(
        [(i, float(x)) for i, x in enumerate(xs)], "wk long, x double"
    )
    return timeseries.cusum(df, **kw).orderBy("wk").collect()


def test_cusum_fires_after_planted_level_shift(spark):
    # 30 in-control points then a +3-sigma sustained shift: no alarm
    # before the shift, alarm within a few points after it
    base = [10.0, 10.2, 9.8, 10.1, 9.9] * 6
    shifted = [13.0, 13.2, 12.8, 13.1, 12.9] * 4
    out = _cusum(spark, base + shifted, baseline=30)
    alarms = [r["wk"] for r in out if r["alarm"] == 1]
    assert alarms, "sustained shift never alarmed"
    assert min(alarms) >= 30, "alarm fired during the in-control run"
    assert min(alarms) <= 36, "detection delay too long for a 3-sigma shift"


def test_cusum_negative_side_catches_downward_shift(spark):
    base = [10.0, 10.2, 9.8, 10.1, 9.9] * 6
    shifted = [7.0, 7.2, 6.8, 7.1, 6.9] * 4
    out = _cusum(spark, base + shifted, baseline=30)
    fired = [r for r in out if r["alarm"] == 1]
    assert fired and all(
        r["cusum_neg"] > r["cusum_pos"] for r in fired
    ), "downward shift must alarm on the negative chart"


def test_cusum_constant_series_is_silent(spark):
    # zero variance -> z pinned to 0 (no divide-by-zero), no alarm
    out = _cusum(spark, [5.0] * 40)
    assert all(r["alarm"] == 0 for r in out)
    assert all(r["z"] == 0.0 for r in out)
    assert all(r["cusum_pos"] == 0.0 for r in out)


def test_cusum_resets_to_zero_floor(spark):
    # the one-sided statistics never go negative (the max(0, .) fold)
    import random

    rnd = random.Random(8)
    out = _cusum(spark, [10 + rnd.gauss(0, 1) for _ in range(100)])
    assert all(r["cusum_pos"] >= 0 and r["cusum_neg"] >= 0 for r in out)


# ----------------------- lexical diversity ------------------------


def test_mattr_extremes_on_planted_sources(spark):
    from citeconnect_datapipeline_spark.api import curation

    # 'loop': one 5-token template repeated -> every 25-token window
    # holds exactly 5 types (mattr = 0.2); 'fresh': all-distinct
    # tokens -> every window holds 25 types (mattr = 1.0)
    loop_text = " ".join(["alpha beta gamma delta epsilon"] * 20)
    fresh_text = " ".join(f"w{i:04d}" for i in range(100))
    rows = [(i, "loop", loop_text) for i in range(4)] + [
        (i + 10, "fresh", fresh_text) for i in range(4)
    ]
    df = spark.createDataFrame(rows, "doc_id long, source string, text string")
    out = {
        r["source"]: r
        for r in curation.lexical_diversity_by(df, "source").collect()
    }
    assert out["loop"]["mattr"] == 0.2
    assert out["fresh"]["mattr"] == 1.0
    assert out["loop"]["n_chunks"] == 4 * 4  # 100 tokens -> 4 full chunks
    # the CONTRAST diagnostic: the repetitive source's naive TTR is
    # also its corpus-level tell here (5 types / 400 tokens)
    assert out["loop"]["naive_ttr"] < 0.05 < out["fresh"]["naive_ttr"]


def test_mattr_drops_partial_tail_chunks(spark):
    from citeconnect_datapipeline_spark.api import curation

    # 30 tokens -> exactly ONE full 25-token chunk; the 5-token tail
    # must not dilute mattr
    text = " ".join(f"t{i}" for i in range(30))
    df = spark.createDataFrame(
        [(1, "s", text)], "doc_id long, source string, text string"
    )
    r = curation.lexical_diversity_by(df, "source").collect()[0]
    assert r["n_chunks"] == 1 and r["mattr"] == 1.0
    assert r["token_count"] == 30  # naive still sees every token


# -------------------- deletion-neighborhood join -------------------


def _typo_pairs(spark, vocab_rows, **kw):
    from citeconnect_datapipeline_spark.api import dedup

    df = spark.createDataFrame(vocab_rows, "word string, c long")
    return dedup.edit_neighbor_pairs(df, **kw).collect()


def test_typo_pairs_completeness_at_distance_two(spark):
    # the SymSpell guarantee: deletion neighborhoods find EVERY pair
    # within edit distance 2 — including the double-substitution case
    # a length-band or prefix blocking scheme misses
    rows = [
        ("tokenizer", 1000),
        ("tokenzer", 3),     # 1 deletion
        ("carbon", 500),
        ("cardan", 480),     # 2 substitutions
        ("weight", 400),
        ("wright", 390),     # 1 substitution
        ("omega", 100),      # far from everything
    ]
    out = _typo_pairs(spark, rows)
    got = {(r["word_a"], r["word_b"]): r for r in out}
    assert ("tokenizer", "tokenzer") in got  # word_a < word_b
    assert got[("tokenizer", "tokenzer")]["dist"] == 1
    assert got[("tokenizer", "tokenzer")]["suspected_typo"] == 1
    assert ("carbon", "cardan") in got  # double substitution found
    assert got[("carbon", "cardan")]["dist"] == 2
    assert got[("carbon", "cardan")]["suspected_typo"] == 0
    assert ("weight", "wright") in got
    assert not any("omega" in p for p in got)


def test_typo_pairs_excludes_distance_three(spark):
    out = _typo_pairs(spark, [("alpha", 10), ("alproxy", 10)])
    assert out == []  # distance 4: shares no <=2-deletion variant


def test_typo_pairs_variant_cap_drops_hot_buckets(spark):
    # 9 words all sharing the deletion variant 'wrd0' (one-char
    # suffixes) exceed a cap of 8 postings -> the hot bucket is
    # dropped and no pairs emit THROUGH it; with the default cap the
    # pairs exist
    rows = [(f"wrd{i}", 10) for i in range(9)]
    assert _typo_pairs(spark, rows, variant_cap=4) == []
    assert len(_typo_pairs(spark, rows)) == 36  # C(9,2), all dist<=2


# ----------------------- LSH band tuning --------------------------


def test_band_tuning_nested_schemes_and_planted_dups(spark, tmp_path):
    """The 16-hash bands nest dyadically (a size-2r band is the
    concatenation of two size-r bands), so the candidate sets are
    nested and pair counts must be monotone non-increasing in
    rows_per_band; an exact duplicate pair survives every scheme,
    a half-overlapping pair only the permissive ones."""
    from citeconnect_datapipeline_spark.operators.dedup import (
        minhash_band_tuning,
    )

    sf = tmp_path / "sf"
    sf.mkdir()
    dup = "alpha beta gamma delta epsilon zeta eta theta " * 8
    half = (
        "alpha beta gamma delta epsilon zeta eta theta " * 4
        + "iota kappa lambda mu nu xi omicron pi " * 4
    )
    fillers = [
        " ".join(f"w{d}x{i}" for i in range(40)) for d in range(5)
    ]
    rows = [
        (1, dup), (2, dup), (3, half),
        *[(10 + d, t) for d, t in enumerate(fillers)],
    ]
    spark.createDataFrame(
        [(i, t, "en", "src0", len(t)) for i, t in rows],
        "doc_id long, text string, lang string, source string,"
        " n_chars long",
    ).write.parquet(str(sf / "documents.parquet"))
    out = {
        r["rows_per_band"]: r
        for r in minhash_band_tuning(spark, str(sf)).collect()
    }
    assert set(out) == {1, 2, 4, 8, 16}
    # exact dup pair: identical signatures survive even the 1x16 band
    assert out[16]["n_candidate_pairs"] == 1
    # the half-overlap pair shows up at the permissive end
    assert out[1]["n_candidate_pairs"] >= 2
    # dyadic nesting -> monotone non-increasing candidate counts
    counts = [out[r]["n_candidate_pairs"] for r in (1, 2, 4, 8, 16)]
    assert all(a >= b for a, b in zip(counts, counts[1:]))
    # thresholds are the textbook S-curve ladder
    assert out[1]["sim_threshold"] == 0.0625
    assert out[16]["sim_threshold"] == 1.0


# ----------------------- IVF recall curve -------------------------


def test_ivf_nprobe_recall_monotone_and_complete(spark):
    """Recall and candidate counts are monotone in nprobe, and
    probing all K lists IS brute force: recall exactly 1.0 with
    every non-query vector a candidate."""
    from citeconnect_datapipeline_spark.operators.similarity import (
        IVFP_K,
        ivf_nprobe_recall,
    )

    out = (
        ivf_nprobe_recall(spark, SF)
        .orderBy("nprobe")
        .collect()
    )
    assert [r["nprobe"] for r in out] == [1, 2, 4, 8]
    recalls = [r["recall_at_10"] for r in out]
    cands = [r["n_candidates"] for r in out]
    assert all(a <= b for a, b in zip(recalls, recalls[1:]))
    assert all(a <= b for a, b in zip(cands, cands[1:]))
    full = out[-1]
    assert full["nprobe"] == IVFP_K
    assert full["recall_at_10"] == 1.0
    n_emb = spark.read.parquet(f"{SF}/embeddings.parquet").count()
    assert full["n_candidates"] == n_emb - 1  # everything but the query


# ----------------------- Wasserstein drift ------------------------


def test_wasserstein_prices_shift_distance(spark, tmp_path):
    """W1's defining property vs PSI/KL: moving the same mass
    FARTHER scores strictly higher. Three sources: one at the corpus
    center, one shifted +2 bins, one shifted +8 bins."""
    import shutil

    from citeconnect_datapipeline_spark.operators.training import (
        wasserstein_drift,
    )

    sf = tmp_path / "sf"
    sf.mkdir()
    rows = []
    did = 0
    for src, base in (("mid", 100), ("near", 150), ("far", 300)):
        for i in range(200):
            did += 1
            rows.append((did, "x", "en", src, base + (i % 2)))
    spark.createDataFrame(
        rows,
        "doc_id long, text string, lang string, source string,"
        " n_chars long",
    ).write.parquet(str(sf / "documents.parquet"))
    out = {r["source"]: r for r in wasserstein_drift(spark, str(sf)).collect()}
    # distances from the mixture CDF grow with how far the mass sits
    assert out["far"]["w1_bins"] > out["near"]["w1_bins"] > 0
    assert out["mid"]["w1_bins"] < out["far"]["w1_bins"]
    # units contract: w1_chars = w1_bins * bin width
    for r in out.values():
        assert abs(r["w1_chars"] - r["w1_bins"] * 25) < 1e-6


def test_wasserstein_zero_for_identical_sources(spark, tmp_path):
    from citeconnect_datapipeline_spark.operators.training import (
        wasserstein_drift,
    )

    sf = tmp_path / "sf"
    sf.mkdir()
    rows = [
        (i, "x", "en", f"s{i % 2}", 100 + ((i // 2) % 4) * 25)
        for i in range(400)
    ]
    spark.createDataFrame(
        rows,
        "doc_id long, text string, lang string, source string,"
        " n_chars long",
    ).write.parquet(str(sf / "documents.parquet"))
    out = wasserstein_drift(spark, str(sf)).collect()
    # both sources ARE the corpus distribution -> W1 exactly 0
    assert all(r["w1_bins"] == 0.0 for r in out)


# ------------------------ SLO burn alerts -------------------------


def _slo_events(spark, tmp_path, hours):
    """hours: list of (n_ok, n_err) per consecutive hour."""
    import shutil

    sf = tmp_path / "sf"
    sf.mkdir()
    rows, eid = [], 0
    for h, (n_ok, n_err) in enumerate(hours):
        for k in range(n_ok + n_err):
            eid += 1
            rows.append(
                (
                    eid,
                    f"2026-01-01 {h:02d}:00:{k % 60:02d}"
                    if h < 24
                    else f"2026-01-02 {h - 24:02d}:00:{k % 60:02d}",
                    eid % 50,
                    "error" if k < n_err else "view",
                    1.0,
                    "{}",
                )
            )
    df = spark.createDataFrame(
        rows,
        "event_id long, ts string, user_id long, event_type string,"
        " value double, props string",
    ).selectExpr(
        "event_id", "CAST(ts AS TIMESTAMP) AS ts", "user_id",
        "event_type", "value", "props"
    )
    df.write.parquet(str(sf / "events.parquet"))
    return str(sf)


def test_slo_single_blip_never_pages(spark, tmp_path):
    """The two-window AND: one moderately bad hour inside a quiet
    run exceeds the 1h burn but not the 6h — no page."""
    from citeconnect_datapipeline_spark.operators.timeseries import (
        slo_burn_alerts,
    )

    hours = [(80, 20)] * 6 + [(70, 30)] + [(80, 20)] * 6
    out = slo_burn_alerts(spark, _slo_events(spark, tmp_path, hours)).collect()
    blip = [r for r in out if r["n_events"] == 100 and r["burn_1h"] == 1.2]
    assert blip and all(r["page_alert"] == 0 for r in out)


def test_slo_sustained_burn_pages(spark, tmp_path):
    from citeconnect_datapipeline_spark.operators.timeseries import (
        slo_burn_alerts,
    )

    hours = [(80, 20)] * 8 + [(65, 35)] * 6 + [(80, 20)] * 4
    out = slo_burn_alerts(spark, _slo_events(spark, tmp_path, hours)).collect()
    pages = [r for r in out if r["page_alert"] == 1]
    assert pages, "a 6-hour sustained burn must page"
    # pages only during/after the burst, never in the leading quiet run
    assert min(r["hr"] for r in pages) >= min(r["hr"] for r in out) + 8


# --------------------- user-level DP counts -----------------------


def test_dp_user_counts_clip_bounds_heavy_user(spark):
    """A single hyper-active user moves the clipped sum by at most
    the cap — the bounded-sensitivity property row-level DP lacks on
    event data."""
    from citeconnect_datapipeline_spark.api import curation

    base = [(i, "a", i) for i in range(50)]  # 50 users, 1 event each
    whale = [(1000 + k, "a", 7) for k in range(500)]  # user 7 x500
    mk = lambda rows: spark.createDataFrame(  # noqa: E731
        rows, "event_id long, event_type string, user_id long"
    )
    quiet = curation.dp_user_counts_release(
        mk(base), "event_type", "user_id", salt="t", cap=4,
        include_audit=True,
    ).collect()[0]
    loud = curation.dp_user_counts_release(
        mk(base + whale), "event_type", "user_id", salt="t", cap=4,
        include_audit=True,
    ).collect()[0]
    # same salt + same cell -> identical noise; the released counts
    # differ by exactly the whale's CLIPPED contribution (4 - 1 = 3)
    assert loud["noisy_count"] - quiet["noisy_count"] == 3
    assert loud["n_users_clipped"] == 1 and quiet["n_users_clipped"] == 0
    assert loud["sensitivity"] == 4 and loud["laplace_scale"] == 4.0


def test_dp_user_counts_default_release_has_no_exact_column(spark):
    """The DEFAULT release frame must not carry n_users_clipped: it
    is a deterministic function of the raw data, so shipping it
    alongside the noisy counts voids the epsilon-DP claim (r8 ADVICE
    #1). The audit column exists only behind include_audit=True."""
    from citeconnect_datapipeline_spark.api import curation

    df = spark.createDataFrame(
        [(i, "a", i % 5) for i in range(20)],
        "event_id long, event_type string, user_id long",
    )
    release = curation.dp_user_counts_release(
        df, "event_type", "user_id", salt="t"
    )
    assert "n_users_clipped" not in release.columns
    assert {"cell", "noisy_count", "epsilon", "sensitivity"} <= set(
        release.columns
    )


def test_dp_user_counts_noise_scale_tracks_cap(spark):
    """Raising the cap raises the declared Laplace scale (cap/eps):
    the utility/privacy dial is explicit in the ledger columns."""
    from citeconnect_datapipeline_spark.api import curation

    df = spark.createDataFrame(
        [(i, "a", i % 10) for i in range(100)],
        "event_id long, event_type string, user_id long",
    )
    r4 = curation.dp_user_counts_release(
        df, "event_type", "user_id", salt="t", cap=4
    ).collect()[0]
    r16 = curation.dp_user_counts_release(
        df, "event_type", "user_id", salt="t", cap=16
    ).collect()[0]
    assert r16["laplace_scale"] == 4 * r4["laplace_scale"]


# ---------------------- shuffle quality audit ---------------------


def _shuffle_docs(spark, tmp_path, order):
    sf = tmp_path / "sf"
    sf.mkdir()
    rows = [
        (i, "x", "en", src, 100) for i, src in enumerate(order)
    ]
    spark.createDataFrame(
        rows,
        "doc_id long, text string, lang string, source string,"
        " n_chars long",
    ).write.parquet(str(sf / "documents.parquet"))
    return str(sf)


def test_shuffle_audit_flags_source_clumped_order(spark, tmp_path):
    from citeconnect_datapipeline_spark.operators.training import (
        shuffle_quality_audit,
    )

    # 4 sources written file-by-file: nearly every lag-1 pair agrees
    order = [f"s{k}" for k in range(4) for _ in range(100)]
    r = shuffle_quality_audit(
        spark, _shuffle_docs(spark, tmp_path, order)
    ).collect()[0]
    assert r["needs_reshuffle"] == 1 and r["clump_z"] > 10
    assert r["obs_same_frac"] > 0.9 and abs(r["exp_same_frac"] - 0.25) < 0.01


def test_shuffle_audit_passes_interleaved_order(spark, tmp_path):
    from citeconnect_datapipeline_spark.operators.training import (
        shuffle_quality_audit,
    )

    # perfect round-robin: NO lag-1 pair ever agrees -> clump_z is
    # strongly negative (anti-clumped), and must not flag
    order = [f"s{i % 4}" for i in range(400)]
    r = shuffle_quality_audit(
        spark, _shuffle_docs(spark, tmp_path, order)
    ).collect()[0]
    assert r["needs_reshuffle"] == 0
    assert r["n_same"] == 0 and r["clump_z"] < -3


# ----------------------- epoch shuffle plan -----------------------


def test_epoch_shuffle_balanced_and_decorrelated(spark, tmp_path):
    from citeconnect_datapipeline_spark.operators.training import (
        EPOCH_SHARDS,
        epoch_shuffle_plan,
    )

    sf = tmp_path / "sf"
    sf.mkdir()
    n = 4000
    spark.range(n).selectExpr(
        "id AS doc_id", "'x' AS text", "'en' AS lang",
        "'s0' AS source", "100 AS n_chars"
    ).write.parquet(str(sf / "documents.parquet"))
    out = epoch_shuffle_plan(spark, str(sf)).collect()
    assert len(out) == EPOCH_SHARDS
    assert sum(r["n_epoch0"] for r in out) == n
    assert sum(r["n_epoch1"] for r in out) == n
    # balanced within ~5 sigma of the binomial expectation
    exp = n / EPOCH_SHARDS
    sd = (n * (1 / EPOCH_SHARDS) * (1 - 1 / EPOCH_SHARDS)) ** 0.5
    for r in out:
        assert abs(r["n_epoch0"] - exp) < 5 * sd
        assert abs(r["n_epoch1"] - exp) < 5 * sd
        # cross-epoch decorrelation: stay fraction ~ 1/shards
        assert abs(r["stay_frac"] - 1 / EPOCH_SHARDS) < 0.06


def test_epoch_shuffle_is_reproducible(spark, tmp_path):
    from citeconnect_datapipeline_spark.operators.training import (
        epoch_shuffle_plan,
    )

    sf = tmp_path / "sf"
    sf.mkdir()
    spark.range(500).selectExpr(
        "id AS doc_id", "'x' AS text", "'en' AS lang",
        "'s0' AS source", "100 AS n_chars"
    ).write.parquet(str(sf / "documents.parquet"))
    a = [tuple(r) for r in epoch_shuffle_plan(spark, str(sf)).collect()]
    b = [tuple(r) for r in epoch_shuffle_plan(spark, str(sf)).collect()]
    assert a == b  # the permutation is a pure function of (epoch, id)


# --------------------- quantile sketch accuracy --------------------


def test_quantile_sketch_error_within_gk_bound(spark):
    """The realized rank error of percentile_approx must respect the
    Greenwald-Khanna contract (<= 1/accuracy, up to the 6-dp
    rounding the panel applies) and tighten with accuracy."""
    from citeconnect_datapipeline_spark.operators.statistics import (
        quantile_sketch_accuracy,
    )

    out = quantile_sketch_accuracy(spark, SF).collect()
    assert len(out) == 6
    for r in out:
        assert r["rank_error"] <= r["gk_bound"] + 1e-6, (
            r["accuracy"], r["p"], r["rank_error"])
    # higher accuracy never does worse at the same percentile
    by_p = {}
    for r in out:
        by_p.setdefault(r["p"], {})[r["accuracy"]] = r["rank_error"]
    for p, d in by_p.items():
        assert d[10000] <= d[1000] + 1e-6


# ------------------------ Theil-Sen trend -------------------------


def test_theilsen_shrugs_off_planted_outlier(spark, tmp_path):
    """One corrupted week drags OLS but not the median-of-slopes:
    slope_gap is the health check."""
    from citeconnect_datapipeline_spark.operators.timeseries import (
        theilsen_trend,
    )

    sf = tmp_path / "sf"
    sf.mkdir()
    rows = []
    oid = 0
    for w in range(40):
        # clean linear series: one order per week, price 100 + 10*w;
        # week 20 is corrupted by a 100x backfill spike
        oid += 1
        price = 100.0 + 10 * w if w != 20 else 30000.0
        rows.append((oid, f"2025-01-{1 + 0:02d}", price, w))
    df = spark.createDataFrame(
        [(o, p, w) for (o, _, p, w) in rows],
        "o_orderkey long, o_totalprice double, w int",
    ).selectExpr(
        "o_orderkey",
        "CAST(timestampadd(WEEK, w, TIMESTAMP '2025-01-01') AS"
        " TIMESTAMP) AS o_orderdate",
        "o_totalprice",
    )
    df.write.parquet(str(sf / "orders.parquet"))
    r = theilsen_trend(spark, str(sf)).collect()[0]
    assert abs(r["ts_slope"] - 10.0) < 0.5, r  # robust: true slope
    assert r["ols_slope"] > 12.0  # OLS dragged by the spike
    assert abs(r["slope_gap"]) > 2.0


# ---------------------- MASE forecast backtest --------------------


def test_mase_seasonal_wins_on_planted_weekly_cycle(spark, tmp_path):
    """On a clean weekly cycle the seasonal-naive error is ~0 while
    naive-1 keeps paying the day-to-day swing: MASE(seasonal) << 1,
    MASE(naive_1) == 1 by construction."""
    from citeconnect_datapipeline_spark.operators.timeseries import (
        forecast_backtest_mase,
    )

    sf = tmp_path / "sf"
    sf.mkdir()
    cycle = [10.0, 50.0, 20.0, 60.0, 30.0, 70.0, 40.0]
    rows = []
    for day in range(70):
        for k in range(3):
            rows.append(
                (day * 10 + k, day, day % 97, "view",
                 cycle[day % 7], "{}")
            )
    spark.createDataFrame(
        rows,
        "event_id long, d int, user_id long, event_type string,"
        " value double, props string",
    ).selectExpr(
        "event_id",
        "CAST(timestampadd(DAY, d, TIMESTAMP '2025-01-01') AS"
        " TIMESTAMP) AS ts",
        "user_id", "event_type", "value", "props",
    ).write.parquet(str(sf / "events.parquet"))
    out = {r["model"]: r for r in
           forecast_backtest_mase(spark, str(sf)).collect()}
    assert out["naive_1"]["mase"] == 1.0
    assert out["seasonal_7"]["mase"] < 0.01  # perfect weekly structure
    assert out["seasonal_7"]["n_days"] == out["naive_1"]["n_days"]


# -------------------- positional template score --------------------


def test_positional_template_flags_planted_prefix(spark, tmp_path):
    """A corpus whose docs all open with the same 3-token preamble
    must flag positions 0-2 as templated while the body positions
    stay diverse."""
    from citeconnect_datapipeline_spark.operators.text import (
        positional_template_score,
    )

    sf = tmp_path / "sf"
    sf.mkdir()
    rows = [
        (
            i,
            "terms of service "
            + " ".join(f"body{i}w{j}" for j in range(8)),
            "en",
            "s0",
            100,
        )
        for i in range(50)
    ]
    spark.createDataFrame(
        rows,
        "doc_id long, text string, lang string, source string,"
        " n_chars long",
    ).write.parquet(str(sf / "documents.parquet"))
    out = {
        r["pos"]: r
        for r in positional_template_score(spark, str(sf)).collect()
    }
    for pos, tok in ((0, "terms"), (1, "of"), (2, "service")):
        assert out[pos]["templated"] == 1
        assert out[pos]["top_token"] == tok
        assert out[pos]["entropy_nats"] == 0.0
        assert out[pos]["top_share"] == 1.0
    # body positions: every doc contributes a unique token
    for pos in (3, 4, 5):
        assert out[pos]["templated"] == 0
        assert out[pos]["n_distinct"] == 50


# ---------------------- filter agreement kappa --------------------


def test_kappa_zero_when_one_filter_is_constant(spark, tmp_path):
    """If the band gate keeps EVERYTHING, raw agreement equals the
    gopher keep-rate but kappa must be ~0 — the chance correction is
    the whole point."""
    from citeconnect_datapipeline_spark.operators.quality import (
        filter_agreement_kappa,
    )

    sf = tmp_path / "sf"
    sf.mkdir()
    # all docs >= 20 words (band keeps all); only half pass gopher's
    # 50-word floor
    mk = lambda n, i: " ".join(  # noqa: E731
        f"w{i}x{j}" for j in range(n)
    )
    rows = [(i, mk(30 if i % 2 else 60, i), "en", "s0", 0) for i in range(40)]
    rows = [(i, t, l, s, len(t)) for (i, t, l, s, _) in rows]
    spark.createDataFrame(
        rows,
        "doc_id long, text string, lang string, source string,"
        " n_chars long",
    ).write.parquet(str(sf / "documents.parquet"))
    r = filter_agreement_kappa(spark, str(sf)).collect()[0]
    assert r["n_only_band"] > 0 and r["n_both_drop"] == 0
    assert abs(r["kappa"]) < 1e-6 and r["redundant"] == 0
    assert 0.4 < r["observed_agreement"] < 0.6


def test_kappa_one_when_filters_coincide(spark, tmp_path):
    """Filters that carve the corpus identically score kappa 1."""
    from citeconnect_datapipeline_spark.operators.quality import (
        filter_agreement_kappa,
    )

    sf = tmp_path / "sf"
    sf.mkdir()
    # short docs (< 20 words) fail BOTH filters; 60-word docs pass both
    mk = lambda n, i: " ".join(  # noqa: E731
        f"w{i}x{j}" for j in range(n)
    )
    rows = [
        (i, mk(60 if i % 2 else 5, i), "en", "s0", 0) for i in range(40)
    ]
    rows = [(i, t, l, s, len(t)) for (i, t, l, s, _) in rows]
    spark.createDataFrame(
        rows,
        "doc_id long, text string, lang string, source string,"
        " n_chars long",
    ).write.parquet(str(sf / "documents.parquet"))
    r = filter_agreement_kappa(spark, str(sf)).collect()[0]
    assert r["kappa"] == 1.0 and r["redundant"] == 1
    assert r["n_only_gopher"] == 0 and r["n_only_band"] == 0


# ------------------ functional dependency audit -------------------


def test_fd_violations_planted_hold_and_break(spark):
    from citeconnect_datapipeline_spark.api import curation

    clean = spark.createDataFrame(
        [(i, i % 5, (i % 5) * 10) for i in range(100)],
        "id long, a int, b int",
    )
    r = curation.fd_violations(clean, "a", "b", "t.a->b").collect()[0]
    assert r["holds"] == 1 and r["n_violating_keys"] == 0
    assert r["max_rhs_per_key"] == 1 and r["n_keys"] == 5
    dirty = clean.union(
        spark.createDataFrame([(999, 0, 777)], "id long, a int, b int")
    )
    r2 = curation.fd_violations(dirty, "a", "b", "t.a->b").collect()[0]
    assert r2["holds"] == 0 and r2["n_violating_keys"] == 1
    assert r2["max_rhs_per_key"] == 2 and r2["violation_rate"] == 0.2


def test_fd_panel_knows_the_lake(spark):
    """The fixture's ground truth: nation->region holds, source and
    lang do not determine each other."""
    from citeconnect_datapipeline_spark.operators.quality import (
        functional_dependency_audit,
    )

    out = {
        r["fd"]: r
        for r in functional_dependency_audit(spark, SF).collect()
    }
    assert out["nation.n_nationkey->n_regionkey"]["holds"] == 1
    assert out["documents.source->lang"]["holds"] == 0
    assert out["documents.lang->source"]["holds"] == 0

"""Crafted behavioral tests for the round-9 operators.

Each test plants a distribution where the operator's defining
property is FORCED — complementing the oracle hash-match, which
checks engine agreement but not intent. The round-9 operators are
lake-shaped (they read named tables), so each test writes a tiny
synthetic lake under tmp_path and runs the REGISTERED query
end-to-end on it.
"""

from __future__ import annotations

import datetime

from pyspark.sql import functions as F

from __spark_entry__ import queries

QS = queries()


def _lake(spark, tmp_path, **tables):
    sf = str(tmp_path / "lake")
    for name, (rows, schema) in tables.items():
        spark.createDataFrame(rows, schema).write.mode(
            "overwrite"
        ).parquet(f"{sf}/{name}.parquet")
    return sf


# --------------------------- Kendall tau ---------------------------


def _kendall_lake(spark, tmp_path, qty_of):
    rows = [
        (i, float(1000 - i), 0.0, float(qty_of(i)))
        for i in range(120)
    ]
    return _lake(
        spark,
        tmp_path,
        lineitem=(
            rows,
            "l_partkey long, l_extendedprice double, "
            "l_discount double, l_quantity double",
        ),
    )


def test_kendall_perfect_agreement_is_plus_one(spark, tmp_path):
    # qty strictly increases with revenue -> every pair concordant
    sf = _kendall_lake(spark, tmp_path, lambda i: 2000 - i)
    r = QS["kendall_tau_topk"](spark, sf).collect()[0]
    assert r["tau_b"] == 1.0
    assert r["n_items"] == 100 and r["n_pairs"] == 4950
    assert r["discordant"] == 0 and r["ties_rev"] == 0


def test_kendall_perfect_reversal_is_minus_one(spark, tmp_path):
    sf = _kendall_lake(spark, tmp_path, lambda i: i)
    r = QS["kendall_tau_topk"](spark, sf).collect()[0]
    assert r["tau_b"] == -1.0 and r["concordant"] == 0


def test_kendall_head_smaller_than_limit_reports_true_n(spark, tmp_path):
    # 10 parts only: n_items must report 10, not the 100-row cap
    rows = [(i, float(100 - i), 0.0, float(i)) for i in range(10)]
    sf = _lake(
        spark,
        tmp_path,
        lineitem=(
            rows,
            "l_partkey long, l_extendedprice double, "
            "l_discount double, l_quantity double",
        ),
    )
    r = QS["kendall_tau_topk"](spark, sf).collect()[0]
    assert r["n_items"] == 10 and r["n_pairs"] == 45


# ----------------------------- BH-FDR ------------------------------


def _bh_lake(spark, tmp_path, shifts=None):
    # Each slice is Welch-tested against the REST of the corpus, so
    # a single planted shift contaminates every other slice's rest-
    # mean; planting two OPPOSITE equal-size shifts keeps the clean
    # slices' rest-mean unbiased (the contamination cancels).
    shifts = shifts or {}
    li, part = [], []
    for b in range(6):
        brand = f"B{b}"
        part += [(b, brand)]
        base = 1000.0 + shifts.get(brand, 0.0)
        li += [
            (b, base + (i % 7) * 3.0)  # deterministic jitter
            for i in range(300)
        ]
    return _lake(
        spark,
        tmp_path,
        lineitem=(li, "l_partkey long, l_extendedprice double"),
        part=(part, "p_partkey long, p_brand string"),
    )


def test_bh_fdr_rejects_only_the_planted_shifts(spark, tmp_path):
    sf = _bh_lake(spark, tmp_path, shifts={"B2": 500.0, "B4": -500.0})
    out = {r["brand"]: r for r in QS["bh_fdr_slices"](spark, sf).collect()}
    assert out["B2"]["reject"] is True
    assert out["B4"]["reject"] is True  # two-sided: both tails
    assert all(not out[f"B{b}"]["reject"] for b in (0, 1, 3, 5))
    # the planted brands carry the smallest p-values
    assert {out["B2"]["bh_rank"], out["B4"]["bh_rank"]} == {1, 2}


def test_bh_fdr_all_null_rejects_nothing(spark, tmp_path):
    sf = _bh_lake(spark, tmp_path)
    out = QS["bh_fdr_slices"](spark, sf).collect()
    assert all(r["reject"] is False for r in out)
    # thresholds are the BH step-up ladder i*q/m
    ranked = sorted(out, key=lambda r: r["bh_rank"])
    assert [r["bh_threshold"] for r in ranked] == [
        round((i + 1) * 0.10 / 6, 6) for i in range(6)
    ]


# ---------------------------- ACF panel ----------------------------


def _orders_lake(spark, tmp_path, days, price_of):
    d0 = datetime.date(2024, 1, 1)
    rows = [
        (i, d0 + datetime.timedelta(days=d), float(price_of(d)))
        for i, d in enumerate(days)
    ]
    return _lake(
        spark,
        tmp_path,
        orders=(
            rows,
            "o_orderkey long, o_orderdate date, o_totalprice double",
        ),
    )


def test_acf_alternating_series_flips_sign_by_lag(spark, tmp_path):
    # period-2 series: acf(odd lag) ~ -1, acf(even lag) ~ +1
    sf = _orders_lake(
        spark, tmp_path, range(60), lambda d: 100.0 if d % 2 else 200.0
    )
    out = {r["lag"]: r for r in QS["acf_panel"](spark, sf).collect()}
    assert out[1]["acf"] < -0.9 and out[1]["significant"]
    assert out[2]["acf"] > 0.9 and out[2]["significant"]
    assert out[7]["acf"] < -0.8


def test_acf_calendar_gaps_pair_true_day_distances(spark, tmp_path):
    # series observed only on EVEN days: odd lags have no k-day-apart
    # pair at all and are omitted from the panel (documented), even
    # lags pair correctly
    sf = _orders_lake(
        spark,
        tmp_path,
        range(0, 60, 2),
        lambda d: 100.0 if (d // 2) % 2 else 200.0,
    )
    out = {r["lag"]: r for r in QS["acf_panel"](spark, sf).collect()}
    assert set(out) == {2, 4, 6}
    assert out[2]["acf"] < -0.9  # alternating at 2-day cadence


# ------------------------- Fano burstiness -------------------------


def test_fano_flags_planted_burst_not_steady_load(spark, tmp_path):
    t0 = datetime.datetime(2024, 1, 1)
    rows = []
    eid = 0
    for d in range(20):  # steady: exactly 10/day
        for k in range(10):
            rows.append((eid, "steady", t0 + datetime.timedelta(days=d, minutes=k)))
            eid += 1
    for d in range(20):  # bursty: one 100-event day, else 1/day
        n = 100 if d == 7 else 1
        for k in range(n):
            rows.append((eid, "bursty", t0 + datetime.timedelta(days=d, minutes=k)))
            eid += 1
    sf = _lake(
        spark,
        tmp_path,
        events=(rows, "event_id long, event_type string, ts timestamp"),
    )
    out = {
        r["event_type"]: r
        for r in QS["fano_burstiness"](spark, sf).collect()
    }
    assert out["steady"]["fano"] == 0.0
    assert out["steady"]["overdispersed"] is False
    assert out["bursty"]["fano"] > 50
    assert out["bursty"]["overdispersed"] is True
    assert out["bursty"]["n_days"] == 20


# ----------------------- calibration / ECE -------------------------


def _doc(doc_id, n_words, n_distinct, source):
    words = [f"w{i}" for i in range(n_distinct)] + ["w0"] * (
        n_words - n_distinct
    )
    text = " ".join(words)
    return (doc_id, text, "en", source, len(text))


DOC_SCHEMA = (
    "doc_id long, text string, lang string, source string, n_chars long"
)


def test_ece_zero_when_confidence_matches_frequency(spark, tmp_path):
    # 10 docs at TTR=0.5, exactly 5 trusted -> bin gap 0, ECE 0
    rows = [
        _doc(i, 10, 5, "src0" if i < 5 else "src1") for i in range(10)
    ]
    sf = _lake(spark, tmp_path, documents=(rows, DOC_SCHEMA))
    out = QS["score_calibration_ece"](spark, sf).collect()
    assert len(out) == 1
    r = out[0]
    assert r["mean_conf"] == 0.5 and r["frac_pos"] == 0.5
    assert r["gap"] == 0.0 and r["ece"] == 0.0


def test_ece_reads_planted_overconfidence(spark, tmp_path):
    # high-TTR docs (conf ~0.95) but ZERO trusted -> gap ~ -0.95,
    # ECE ~ 0.95: the score is maximally overconfident
    rows = [_doc(i, 20, 19, "src1") for i in range(10)]
    sf = _lake(spark, tmp_path, documents=(rows, DOC_SCHEMA))
    r = QS["score_calibration_ece"](spark, sf).collect()[0]
    assert r["frac_pos"] == 0.0
    assert r["gap"] == -r["mean_conf"]
    assert r["ece"] == r["mean_conf"] > 0.9


# ---------------------- blocking quality report ---------------------


def _neardup_pair_docs():
    """Two 30-word texts differing ONLY in the first word (same
    char length), plus unrelated filler docs. The pair is a true
    near-dup (shingle Jaccard >> 0.5) that first-word blocking
    MISSES and length blocking catches."""
    body = " ".join(f"tok{i}" for i in range(29))
    a = "alpha " + body
    b = "betaa " + body
    filler = [
        " ".join(f"f{d}x{i}" for i in range(25)) for d in range(6)
    ]
    rows = [
        (0, a, "en", "src0", len(a)),
        (1, b, "en", "src0", len(b)),
    ] + [
        (10 + d, t, "en", "src1", len(t))
        for d, t in enumerate(filler)
    ]
    return rows


def test_blocking_first_word_misses_planted_neardup(spark, tmp_path):
    sf = _lake(
        spark, tmp_path, documents=(_neardup_pair_docs(), DOC_SCHEMA)
    )
    out = {
        r["scheme"]: r
        for r in QS["blocking_quality_report"](spark, sf).collect()
    }
    assert out["first2words"]["n_truth"] == 1
    # the edit hit the blocking key -> recall 0
    assert out["first2words"]["pair_completeness"] == 0.0
    # equal-length texts share the 50-char bucket -> recall 1
    assert out["len50"]["pair_completeness"] == 1.0
    assert out["langsrc"]["pair_completeness"] == 1.0
    # the edit-damaged key prunes EVERYTHING (all keys singleton) —
    # perfect reduction, zero recall: the trade the panel exists to
    # expose. (Coarse schemes on an 8-doc lake admit large blocks,
    # so no global RR floor is asserted here.)
    assert out["first2words"]["reduction_ratio"] == 1.0
    assert out["first2words"]["n_candidate_pairs"] == 0
    assert all(r["reduction_ratio"] >= 0.0 for r in out.values())


# ---------------------- Fellegi-Sunter weights ----------------------


def test_fs_weights_reward_discriminative_fields(spark, tmp_path):
    """Matches (near-dup pairs) agree on lang; non-match candidates
    (docs sharing one planted phrase, different lang) disagree ->
    lang earns a positive agreement weight and a negative
    disagreement weight."""
    phrase = "shared anchor phrase"
    # DISJOINT bodies per match pair: a shared body would make the
    # cross pairs (0,2) etc. high-Jaccard matches too
    body1 = " ".join(f"tok{i}" for i in range(29))
    body2 = " ".join(f"yak{i}" for i in range(29))
    rows = [
        # two match pairs, same lang within each pair
        (0, "alpha " + body1, "en", "src0", 200),
        (1, "betaa " + body1, "en", "src0", 200),
        (2, "gamma " + body2, "fr", "src0", 210),
        (3, "delta " + body2, "fr", "src0", 210),
    ]
    # non-match candidates: share ONLY the anchor phrase, lang differs
    for d in range(8):
        t = f"{phrase} " + " ".join(f"n{d}w{i}" for i in range(22))
        rows.append((20 + d, t, "en" if d % 2 else "de", "src1", len(t)))
    sf = _lake(spark, tmp_path, documents=(rows, DOC_SCHEMA))
    out = {
        r["field"]: r
        for r in QS["fellegi_sunter_weights"](spark, sf).collect()
    }
    assert out["lang"]["m_prob"] == 1.0
    assert out["lang"]["u_prob"] < 0.6
    assert out["lang"]["w_agree"] > 0
    assert out["lang"]["w_disagree"] < 0
    # first2words never agrees on matches here (the edit is in the
    # key) -> strongly negative agreement evidence is impossible;
    # the m-probability reads 0
    assert out["first2words"]["m_prob"] == 0.0


# ------------------------- t-closeness ----------------------------


def test_t_closeness_flags_skewed_group_only(spark, tmp_path):
    # nation 0 mirrors the global 50/50 segment split -> tvd ~ 0;
    # nation 1 is 100% one segment -> tvd ~ 0.5 (violates t=0.2).
    # A third, large balanced nation pins the global distribution.
    rows = (
        [(i, 0, "A" if i % 2 else "B") for i in range(40)]
        + [(100 + i, 1, "A") for i in range(40)]
        + [(200 + i, 2, "B" if i % 2 else "A") for i in range(40)]
    )
    sf = _lake(
        spark,
        tmp_path,
        customer=(
            rows,
            "c_custkey long, c_nationkey long, c_mktsegment string",
        ),
    )
    out = {
        r["c_nationkey"]: r
        for r in QS["t_closeness_audit"](spark, sf).collect()
    }
    # nation 1's all-A block shifts the GLOBAL marginal to (2/3,
    # 1/3), so the balanced nations sit at tvd = 1/6 — inside t —
    # while the skewed nation reads 1/3 and violates
    assert out[0]["violates_t"] is False
    assert out[0]["emd_tvd"] == round(1 / 6, 6)
    assert out[1]["violates_t"] is True and out[1]["emd_tvd"] > 0.3
    # the absent-cell mass is counted: nation 1 has NO 'B' rows, and
    # its tvd must include the full |0 - P(B)| term
    assert out[1]["emd_tvd"] == round(
        0.5 * (abs(1 - 2 / 3) + abs(0 - 1 / 3)), 6
    )


# ------------------------ padding waste ----------------------------


def test_padding_waste_bucketing_beats_global_max(spark, tmp_path):
    # 10 docs of exactly 64 tokens + one 100-token doc: bucketed
    # schemes pad only the long doc's bucket; global-max pads all
    # 10 short docs to 100
    def doc(i, n):
        t = " ".join(f"w{i}x{k}" for k in range(n))
        return (i, t, "en", "src0", len(t))

    rows = [doc(i, 64) for i in range(10)] + [doc(10, 100)]
    sf = _lake(spark, tmp_path, documents=(rows, DOC_SCHEMA))
    out = {
        r["scheme"]: r
        for r in QS["padding_waste_report"](spark, sf).collect()
    }
    real = 10 * 64 + 100
    assert all(r["real_tokens"] == real for r in out.values())
    assert out["global_max"]["padded_tokens"] == 11 * 100
    assert out["mult64"]["padded_tokens"] == 10 * 64 + 128
    assert out["global_max"]["waste_frac"] > out["mult64"]["waste_frac"]
    assert out["pow2"]["padded_tokens"] == 10 * 64 + 128


# ----------------------- quantile norm map -------------------------


def test_quantile_norm_map_shifts_toward_pool(spark, tmp_path):
    # source A: short docs; source B: long docs. A's deciles map UP
    # toward the pooled boundaries, B's map DOWN.
    def doc(i, n, src):
        t = " ".join(f"w{k}" for k in range(n))
        return (i, t, "en", src, len(t))

    rows = [doc(i, 10 + i % 10, "A") for i in range(50)] + [
        doc(100 + i, 30 + i % 10, "B") for i in range(50)
    ]
    sf = _lake(spark, tmp_path, documents=(rows, DOC_SCHEMA))
    out = QS["quantile_norm_map"](spark, sf).collect()
    assert len(out) == 2 * 9
    a = [r for r in out if r["source"] == "A"]
    b = [r for r in out if r["source"] == "B"]
    assert all(r["shift"] > 0 for r in a)
    assert all(r["shift"] < 0 for r in b)
    assert [r["decile"] for r in a] == list(range(1, 10))
    # the map is the identity transform's audit: applying source
    # boundary -> pooled boundary equalizes the marginals
    assert all(
        r["pooled_value"] == round(r["source_value"] + r["shift"], 6)
        for r in out
    )


# ----------------------- STL strength panel ------------------------


def test_stl_strength_reads_planted_weekly_cycle(spark, tmp_path):
    t0 = datetime.datetime(2024, 1, 1)
    rows = []
    for d in range(56):  # 8 full weeks, strong day-of-week cycle
        v = 100.0 + (50.0 if d % 7 in (5, 6) else 0.0)
        rows.append((d, "load", t0 + datetime.timedelta(days=d), v))
    sf = _lake(
        spark,
        tmp_path,
        events=(
            rows,
            "event_id long, event_type string, ts timestamp, "
            "value double",
        ),
    )
    r = QS["stl_strength_panel"](spark, sf).collect()[0]
    assert r["n_days"] == 56
    assert r["seasonal_strength"] > 0.8
    # no trend was planted: trend strength stays well below the
    # seasonal reading
    assert r["trend_strength"] < r["seasonal_strength"]


# -------------------------- Grubbs test ----------------------------


def test_grubbs_flags_planted_typo_price(spark, tmp_path):
    rows = [(i, "CLEAN", 100.0 + (i % 10)) for i in range(50)] + [
        (100 + i, "TYPO", 100.0 + (i % 10)) for i in range(49)
    ] + [(199, "TYPO", 99999.0)]  # the fat-finger entry
    sf = _lake(
        spark,
        tmp_path,
        part=(rows, "p_partkey long, p_brand string, p_retailprice double"),
    )
    out = {
        r["brand"]: r
        for r in QS["grubbs_outlier_test"](spark, sf).collect()
    }
    assert out["TYPO"]["is_outlier"] is True
    assert out["TYPO"]["outlier_value"] == 99999.0
    assert out["CLEAN"]["is_outlier"] is False
    assert out["TYPO"]["g_stat"] > out["TYPO"]["g_crit"]


# ------------------------ LPA communities --------------------------


def test_lpa_separates_planted_cliques(spark, tmp_path):
    # two disjoint basket cliques -> two communities labeled by each
    # clique's minimum part id, sizes 4 and 3
    li = [(1, p) for p in (10, 11, 12, 13)] + [
        (2, p) for p in (20, 21, 22)
    ]
    sf = _lake(
        spark, tmp_path, lineitem=(li, "l_orderkey long, l_partkey long")
    )
    out = QS["lpa_communities_topk"](spark, sf).collect()
    got = {r["community"]: r["n_members"] for r in out}
    assert got == {10: 4, 20: 3}


# ---------------------- curriculum schedule ------------------------


def test_curriculum_admits_terciles_cumulatively(spark, tmp_path):
    # 30 docs: 10 short (5 tok), 10 medium (20 tok), 10 long (40 tok)
    rows = (
        [_doc(i, 5, 5, "src0") for i in range(10)]
        + [_doc(10 + i, 20, 20, "src0") for i in range(10)]
        + [_doc(20 + i, 40, 40, "src0") for i in range(10)]
    )
    sf = _lake(spark, tmp_path, documents=(rows, DOC_SCHEMA))
    out = QS["curriculum_schedule_plan"](spark, sf).collect()
    got = {(r["epoch"], r["tercile"]): r for r in out}
    # epoch 1 sees ONLY the easy third; epoch 3 sees everything
    assert set(got) == {
        (1, 1), (2, 1), (2, 2), (3, 1), (3, 2), (3, 3)
    }
    assert got[(1, 1)]["n_docs"] == 10
    assert got[(1, 1)]["epoch_token_share"] == 1.0
    assert got[(3, 3)]["n_docs"] == 10
    # epoch-3 token mix reflects the raw corpus: 50/200/400
    assert got[(3, 3)]["epoch_token_share"] == round(400 / 650, 6)
    # the curriculum's price: epoch 1 trains on 50 of 650 tokens
    assert got[(1, 1)]["total_tokens"] == 50


# ------------------------ DP median release ------------------------


def test_dp_median_lands_near_true_median_and_leaks_nothing(
    spark, tmp_path
):
    import datetime as _dt  # noqa: F401

    # mass concentrated around 300k: with eps=1 and rank utility the
    # mechanism all but surely picks a grid cell near the median
    rows = [(i, float(290000 + (i % 21) * 1000)) for i in range(500)]
    sf = _lake(
        spark,
        tmp_path,
        orders=(rows, "o_orderkey long, o_totalprice double"),
    )
    df = QS["dp_median_release"](spark, sf)
    # DP hygiene: no exact count/utility/probability column ships
    assert set(df.columns) == {
        "dp_median", "epsilon", "sensitivity", "domain_lo",
        "domain_hi", "n_candidates",
    }
    r = df.collect()[0]
    assert abs(r["dp_median"] - 300000.0) <= 12000.0  # within 2 cells
    assert r["epsilon"] == 1.0 and r["n_candidates"] == 101


def test_fs_em_learns_mu_without_labels(spark, tmp_path):
    """EM recovers the discriminative structure UNSUPERVISED: on the
    planted lake (near-dup match pairs agree on lang; phrase-only
    non-match candidates mostly disagree), two EM rounds must assign
    lang a higher m than u and a positive agreement weight — without
    ever seeing the Jaccard labels the supervised twin uses."""
    phrase = "shared anchor phrase"
    body1 = " ".join(f"tok{i}" for i in range(29))
    body2 = " ".join(f"yak{i}" for i in range(29))
    rows = [
        (0, "alpha " + body1, "en", "src0", 200),
        (1, "betaa " + body1, "en", "src0", 200),
        (2, "gamma " + body2, "fr", "src0", 210),
        (3, "delta " + body2, "fr", "src0", 210),
    ]
    for d in range(8):
        t = f"{phrase} " + " ".join(f"n{d}w{i}" for i in range(22))
        rows.append((20 + d, t, "en" if d % 2 else "de", "src1", len(t)))
    sf = _lake(spark, tmp_path, documents=(rows, DOC_SCHEMA))
    out = {
        r["field"]: r
        for r in QS["fellegi_sunter_em"](spark, sf).collect()
    }
    assert set(out) == {"first2words", "len50", "lang", "source"} or \
        set(out) == {"first2", "len50", "lang", "source"}
    lang = out.get("lang")
    assert lang["m_prob"] > lang["u_prob"]
    assert lang["w_agree"] > 0
    # the match prior is a probability and is shared across rows
    priors = {r["match_prior"] for r in out.values()}
    assert len(priors) == 1 and 0.0 < priors.pop() < 1.0


# --------------------- session Markov surprisal --------------------


def test_markov_surprisal_flags_the_impossible_walker(spark, tmp_path):
    """Most users walk a->b->a->b...; one bot walks a->c->a->c, a
    transition the corpus model makes vanishingly rare - the bot
    must top the surprisal ranking."""
    t0 = datetime.datetime(2024, 1, 1)
    rows, eid = [], 0
    for u in range(10):  # normal users: strict a<->b alternation
        for s in range(20):
            rows.append(
                (eid, "a" if s % 2 == 0 else "b", u,
                 t0 + datetime.timedelta(minutes=eid))
            ); eid += 1
    for s in range(20):  # the bot: a<->c
        rows.append(
            (eid, "a" if s % 2 == 0 else "c", 99,
             t0 + datetime.timedelta(minutes=eid))
        ); eid += 1
    sf = _lake(
        spark,
        tmp_path,
        events=(
            rows,
            "event_id long, event_type string, user_id long,"
            " ts timestamp",
        ),
    )
    out = QS["session_markov_surprisal"](spark, sf).collect()
    assert out[0]["user_id"] == 99
    normals = [r for r in out if r["user_id"] != 99]
    assert all(
        out[0]["mean_surprisal"] > r["mean_surprisal"] for r in normals
    )
    assert out[0]["perplexity"] > 1.0


# ------------------------ A/B power analysis -----------------------


def test_power_analysis_monotone_and_mde_consistent(spark, tmp_path):
    rows = [(i, 1000.0 + (i % 100)) for i in range(2000)]
    sf = _lake(
        spark,
        tmp_path,
        orders=(rows, "o_orderkey long, o_totalprice double"),
    )
    out = sorted(
        QS["ab_power_analysis"](spark, sf).collect(),
        key=lambda r: r["lift"],
    )
    # bigger target lifts need fewer subjects, monotonically
    ns = [r["n_required_per_arm"] for r in out]
    assert ns == sorted(ns, reverse=True)
    # the MDE partitions the grid: lifts below it are unpowered,
    # lifts above it are powered
    mde = out[0]["mde_at_n"]
    for r in out:
        assert r["powered"] == (r["lift"] >= mde)
    # tight distribution (sd ~29 vs mean ~1050): 10% lift is
    # detectable with ~1000 per arm
    assert out[-1]["powered"] is True


# -------------------- sequential A/B monitoring --------------------


def test_obf_boundaries_block_early_peek_but_pass_final_shift(
    spark, tmp_path
):
    """A null experiment crosses NO boundary at any weekly look; a
    planted persistent shift crosses, and only once the boundary has
    descended enough - never at the first (near-unspendable) look.
    Cohorts are md5(o_orderkey)-assigned, so keys alternate arms
    deterministically within every week."""
    import datetime as dt

    d0 = dt.date(2024, 1, 1)
    # 12 weeks x 400 orders; null: both arms ~ same distribution
    def lake(shift):
        rows = []
        oid = 0
        for wk in range(12):
            for i in range(400):
                # md5 first hex < '8' decides the arm; plant the
                # shift by value so the arm split stays balanced
                # i % 37, not % 50: the md5 arm split over this
                # grid keeps the null |z| comfortably inside every
                # boundary (a fixed %-50 grid happened to land a
                # legitimate ~5% final-look crossing - the operator
                # was right, the draw was unlucky)
                base = 1000.0 + (i % 37)
                rows.append((oid, d0 + dt.timedelta(weeks=wk, days=i % 7), base))
                oid += 1
        df = spark.createDataFrame(
            rows, "o_orderkey long, o_orderdate date, o_totalprice double"
        )
        if shift:
            from pyspark.sql import functions as F2
            df = df.withColumn(
                "o_totalprice",
                F2.when(
                    F2.substring(
                        F2.md5(F2.col("o_orderkey").cast("string")), 1, 1
                    ) < "8",
                    F2.col("o_totalprice") + shift,
                ).otherwise(F2.col("o_totalprice")),
            )
        sf = str(tmp_path / f"lake_{shift}")
        df.write.mode("overwrite").parquet(f"{sf}/orders.parquet")
        return sf

    null_out = QS["sequential_ab_monitoring"](spark, lake(0)).collect()
    assert all(r["crossed"] is False for r in null_out)
    # boundary descends monotonically toward ~1.96
    bounds = [r["obf_boundary"] for r in
              sorted(null_out, key=lambda r: r["look"])]
    assert bounds == sorted(bounds, reverse=True)
    assert abs(bounds[-1] - 1.959964) < 1e-6

    shift_out = sorted(
        QS["sequential_ab_monitoring"](spark, lake(30.0)).collect(),
        key=lambda r: r["look"],
    )
    crossed = [r for r in shift_out if r["crossed"]]
    assert crossed, "a 30-unit persistent shift must eventually cross"
    assert crossed[-1]["look"] == shift_out[-1]["look"]


# ---------------------- community modularity -----------------------


def test_modularity_two_cliques_is_four_ninths(spark, tmp_path):
    # two disjoint basket cliques (4 + 3 parts): LPA labels each
    # clique by its min part id; directed m = 12 + 6 = 18, each
    # community's q_term = e/m - (d/m)^2 = 2/9, global Q = 4/9
    li = [(1, p) for p in (10, 11, 12, 13)] + [
        (2, p) for p in (20, 21, 22)
    ]
    sf = _lake(
        spark, tmp_path, lineitem=(li, "l_orderkey long, l_partkey long")
    )
    out = QS["community_modularity"](spark, sf).collect()
    assert [r["community"] for r in out] == [10, 20]
    for r in out:
        assert r["q_term"] == 0.222222
        assert r["modularity"] == 0.444444
    by = {r["community"]: r for r in out}
    assert by[10]["n_members"] == 4 and by[10]["internal_edges"] == 12
    assert by[20]["n_members"] == 3 and by[20]["degree"] == 6
    # symmetric edge list: per-community degree equals internal here
    # (no cross-community edges), the documented in==out assumption
    assert all(r["internal_edges"] == r["degree"] for r in out)


def test_modularity_single_community_is_zero(spark, tmp_path):
    # one clique -> one community -> e/m=1, (d/m)^2=1, Q = 0 (the
    # textbook degenerate case: no partition beats chance)
    li = [(1, p) for p in (10, 11, 12)]
    sf = _lake(
        spark, tmp_path, lineitem=(li, "l_orderkey long, l_partkey long")
    )
    out = QS["community_modularity"](spark, sf).collect()
    assert len(out) == 1
    assert out[0]["q_term"] == 0.0 and out[0]["modularity"] == 0.0


# ---------------------- changepoint binary seg ---------------------


def _shift_lake(spark, tmp_path, levels):
    # one order per week, 7-day spacing -> distinct wk keys; x is in
    # millions so o_totalprice = level * 1e6
    base = datetime.date(1995, 1, 5)
    rows = [
        (
            "1-URGENT",
            (base + datetime.timedelta(days=7 * i)).isoformat(),
            float(lv) * 1e6,
        )
        for i, lv in enumerate(levels)
    ]
    return _lake(
        spark,
        tmp_path,
        orders=(
            rows,
            "o_orderpriority string, o_orderdate string, "
            "o_totalprice double",
        ),
    )


def test_changepoint_localizes_planted_level_shift(spark, tmp_path):
    # 5 weeks at 1.0 then 5 weeks at 5.0: the SSE-gain argmax is the
    # last left-segment week, with exact segment means and gain =
    # SSE_total (both halves are constant, so residual SSE is 0) =
    # n_l*n_r/n * (5-1)^2 = 2.5 * 16 = 40
    sf = _shift_lake(spark, tmp_path, [1] * 5 + [5] * 5)
    out = QS["changepoint_binary_seg"](spark, sf).collect()
    assert len(out) == 1
    r = out[0]
    assert r["n_weeks"] == 10
    assert r["n_left"] == 5 and r["n_right"] == 5
    assert r["mean_left"] == 1.0 and r["mean_right"] == 5.0
    assert r["gain"] == 40.0


def test_changepoint_constant_series_gain_zero_earliest_week(
    spark, tmp_path
):
    # no change anywhere -> every split has gain 0; the (gain desc,
    # wk asc) tie-break must pick the FIRST candidate split
    sf = _shift_lake(spark, tmp_path, [2] * 8)
    r = QS["changepoint_binary_seg"](spark, sf).collect()[0]
    assert r["gain"] == 0.0
    assert r["n_left"] == 1 and r["n_right"] == 7


# --------------------- sorted neighborhood pairs -------------------


def test_snm_catches_adjacent_typos_misses_first_letter(
    spark, tmp_path
):
    # within one nation block: "smith-10x" variants are adjacent in
    # sort order (lev 1 candidates); "zmith-100" is the same record
    # with a FIRST-letter error -> sorts to the far end and is NOT
    # generated (the documented single-pass SNM miss class)
    rows = [
        (1, "smith-100", 0, 10.0, "AUTO"),
        (2, "smith-101", 0, 12.5, "AUTO"),
        (3, "smith-102", 0, 99.0, "BUILDING"),
        (4, "zmith-100", 0, 10.0, "AUTO"),
        (5, "wholly-unrelated", 0, 1.0, "AUTO"),
    ]
    sf = _lake(
        spark,
        tmp_path,
        customer=(
            rows,
            "c_custkey long, c_name string, c_nationkey int, "
            "c_acctbal double, c_mktsegment string",
        ),
    )
    out = QS["sorted_neighborhood_pairs"](spark, sf).collect()
    pairs = {(r["name_a"], r["name_b"]) for r in out}
    assert ("smith-100", "smith-101") in pairs
    assert ("smith-101", "smith-102") in pairs
    assert ("smith-100", "smith-102") in pairs  # offset-2 neighbor
    assert not any("zmith-100" in p for p in pairs)
    by = {(r["name_a"], r["name_b"]): r for r in out}
    r = by[("smith-100", "smith-101")]
    assert r["lev_dist"] == 1 and r["same_segment"] == 1
    assert r["bal_gap"] == 2.5
    assert by[("smith-101", "smith-102")]["same_segment"] == 0


def test_snm_blocks_do_not_cross_nations(spark, tmp_path):
    # identical-looking names in DIFFERENT nations are never paired
    rows = [
        (1, "acct-200", 0, 5.0, "AUTO"),
        (2, "acct-201", 1, 5.0, "AUTO"),
    ]
    sf = _lake(
        spark,
        tmp_path,
        customer=(
            rows,
            "c_custkey long, c_name string, c_nationkey int, "
            "c_acctbal double, c_mktsegment string",
        ),
    )
    assert QS["sorted_neighborhood_pairs"](spark, sf).count() == 0


# ---------------------- selection tradeoff curve -------------------


def test_selection_curve_walks_best_first_to_full_corpus(
    spark, tmp_path
):
    # 10 rich docs (distinct words, long) vs 10 degenerate one-word
    # docs: the curve must start at high mean quality, be monotone
    # non-increasing in marginal mean_score, and end at the full
    # corpus (share 1.0, all docs)
    rich = [
        (
            i,
            " ".join(f"tok{i}w{j}" for j in range(60)),
            "en",
            "src0",
            600,
        )
        for i in range(10)
    ]
    junk = [
        (100 + i, "spam " * 8, "en", "src0", 40) for i in range(10)
    ]
    sf = _lake(
        spark,
        tmp_path,
        documents=(
            rich + junk,
            "doc_id long, text string, lang string, source string, "
            "n_chars long",
        ),
    )
    out = QS["selection_tradeoff_curve"](spark, sf).collect()
    # two distinct scores collapse to two occupied deciles; ranks
    # stay strictly increasing best-first (sparse ids are inherent
    # to boundary bucketing under ties, same on both engines)
    ranks = [r["sel_rank"] for r in out]
    assert ranks == sorted(ranks) and len(set(ranks)) == len(ranks)
    scores = [r["mean_score"] for r in out]
    assert scores == sorted(scores, reverse=True)
    assert out[0]["mean_score"] > 0.8  # rich docs: TTR 1.0 + credits
    last = out[-1]
    assert last["cum_token_share"] == 1.0
    assert last["cum_docs"] == 20
    assert last["cum_tokens"] == 10 * 60 + 10 * 8
    # cumulative mean dilutes as junk deciles join the selection
    assert out[0]["cum_mean_score"] > last["cum_mean_score"]


# ------------------------- Ljung-Box test --------------------------


def _daily_lake(spark, tmp_path, values):
    base = datetime.date(1996, 1, 1)
    rows = [
        ((base + datetime.timedelta(days=i)).isoformat(), float(v))
        for i, v in enumerate(values)
    ]
    return _lake(
        spark,
        tmp_path,
        orders=(rows, "o_orderdate string, o_totalprice double"),
    )


def test_ljung_box_rejects_alternating_series(spark, tmp_path):
    # period-2 series: rho_1 ~ -1 -> Q blows up, p ~ 0
    sf = _daily_lake(
        spark, tmp_path, [10.0 if i % 2 else 1.0 for i in range(120)]
    )
    r = QS["ljung_box_test"](spark, sf).collect()[0]
    assert r["n_days"] == 120 and r["n_lags"] == 6
    assert r["q_stat"] > 100
    assert r["p_value"] == 0.0
    assert r["white_noise"] is False


def test_ljung_box_passes_hash_scrambled_series(spark, tmp_path):
    # md5-keyed values have no serial structure: Q ~ chi2(6) central,
    # p well above 0.05 (computed 0.628 for this exact sequence)
    import hashlib

    vals = [
        int(hashlib.md5(str(i).encode()).hexdigest()[:4], 16)
        for i in range(120)
    ]
    sf = _daily_lake(spark, tmp_path, vals)
    r = QS["ljung_box_test"](spark, sf).collect()[0]
    assert r["white_noise"] is True
    assert r["p_value"] == 0.628057


# ------------------------- decision stump --------------------------


def test_stump_finds_perfect_split_and_drops_constant_feature(
    spark, tmp_path
):
    # quantity <= 10 is exactly the positive class -> gini_split 0,
    # accuracy 1.0 at threshold 10; discount is CONSTANT so it has
    # no valid split (cn < nn never holds) and emits no row
    rows = [
        (float(5 + (i % 6)), 0.05, "R") for i in range(60)
    ] + [
        (float(20 + (i % 6)), 0.05, "N") for i in range(60)
    ]
    sf = _lake(
        spark,
        tmp_path,
        lineitem=(
            rows,
            "l_quantity double, l_discount double, "
            "l_returnflag string",
        ),
    )
    out = QS["decision_stump_portable"](spark, sf).collect()
    assert [r["feature"] for r in out] == ["quantity"]
    r = out[0]
    assert r["threshold"] == 10.0
    assert r["gini_split"] == 0.0 and r["stump_acc"] == 1.0
    assert r["gini_root"] == 0.5  # balanced classes
    assert r["gini_gain"] == 0.5
    assert r["n_left"] == 60 and r["n_right"] == 60


def test_stump_uninformative_feature_keeps_root_gini(spark, tmp_path):
    # label independent of quantity -> best split gains ~0 and the
    # stump accuracy equals the majority-class rate
    rows = [
        (float(i % 10), 0.0, "R" if (i // 10) % 2 else "N")
        for i in range(200)
    ]
    sf = _lake(
        spark,
        tmp_path,
        lineitem=(
            rows,
            "l_quantity double, l_discount double, "
            "l_returnflag string",
        ),
    )
    out = {r["feature"]: r for r in
           QS["decision_stump_portable"](spark, sf).collect()}
    r = out["quantity"]
    assert r["gini_gain"] == 0.0
    assert r["stump_acc"] == 0.5


# ----------------------- Burrows' Delta ----------------------------


def test_burrows_delta_groups_same_style_sources(spark, tmp_path):
    # twin sources share a function-word habit ("alpha beta" heavy),
    # the odd one out writes "gamma delta" heavy: Delta(twin pair)
    # must be the smallest of the three pair distances
    def doc(i, src, text):
        return (i, text, "en", src, len(text))

    rows = (
        [doc(i, "twin1", "alpha beta alpha beta gamma") for i in range(8)]
        + [doc(100 + i, "twin2", "alpha beta alpha beta delta") for i in range(8)]
        + [doc(200 + i, "odd", "gamma delta gamma delta gamma delta") for i in range(8)]
    )
    sf = _lake(spark, tmp_path, documents=(rows, DOC_SCHEMA))
    out = QS["stylometry_burrows_delta"](spark, sf).collect()
    assert len(out) == 3  # C(3,2) pairs
    best = out[0]
    assert {best["source_a"], best["source_b"]} == {"twin1", "twin2"}
    worst = max(out, key=lambda r: r["delta"])
    assert "odd" in (worst["source_a"], worst["source_b"])
    # all 4 distinct words fit the 20-word panel
    assert all(r["n_words"] == 4 for r in out)


def test_burrows_delta_zero_for_identical_distributions(
    spark, tmp_path
):
    # two sources with identical relative frequencies -> z_a == z_b
    # on every marker word -> Delta exactly 0
    def doc(i, src):
        return (i, "one two two three three three", "en", src, 30)

    rows = [doc(i, "s1") for i in range(5)] + [
        doc(10 + i, "s2") for i in range(5)
    ]
    sf = _lake(spark, tmp_path, documents=(rows, DOC_SCHEMA))
    out = QS["stylometry_burrows_delta"](spark, sf).collect()
    assert len(out) == 1 and out[0]["delta"] == 0.0


# --------------------- price elasticity ----------------------------


def test_elasticity_recovers_planted_loglog_slope(spark, tmp_path):
    # plant qty = 1000 * price^-2 exactly -> slope -2, r2 = 1,
    # elastic; a unit-elastic brand pins the elastic=False boundary
    li, part = [], []
    import math

    for i, price in enumerate([2.0, 4.0, 8.0, 16.0]):
        qty = 1000.0 / price**2
        li.append((1, qty, price * qty))
    part.append((1, "ELASTIC"))
    for i, price in enumerate([2.0, 4.0, 8.0]):
        qty = 100.0 / price  # slope exactly -1: NOT strictly < -1
        li.append((2, qty, price * qty))
    part.append((2, "UNIT"))
    sf = _lake(
        spark,
        tmp_path,
        lineitem=(
            li,
            "l_partkey long, l_quantity double, l_extendedprice double",
        ),
        part=(part, "p_partkey long, p_brand string"),
    )
    out = {r["brand"]: r for r in
           QS["price_elasticity_by_brand"](spark, sf).collect()}
    assert out["ELASTIC"]["elasticity"] == -2.0
    assert out["ELASTIC"]["r2"] == 1.0
    assert out["ELASTIC"]["elastic"] is True
    assert out["UNIT"]["elasticity"] == -1.0
    assert out["UNIT"]["elastic"] is False


# --------------------- anonymization ladder ------------------------


def test_anonymization_ladder_coarsens_monotonically(spark, tmp_path):
    # 3 nations in one region, 2 segments, unique balances: level 0
    # is all-singletons (full suppression), coarser rungs shrink
    # class counts monotonically and the '*' rung is always one class
    cust = [
        (i, f"c{i}", i % 3, float(i * 137), ["AUTO", "BUILDING"][i % 2])
        for i in range(60)
    ]
    nation = [(0, "A", 7), (1, "B", 7), (2, "C", 7)]
    sf = _lake(
        spark,
        tmp_path,
        customer=(
            cust,
            "c_custkey long, c_name string, c_nationkey int, "
            "c_acctbal double, c_mktsegment string",
        ),
        nation=(nation, "n_nationkey int, n_name string, n_regionkey int"),
    )
    out = QS["anonymization_ladder"](spark, sf).collect()
    assert [r["level"] for r in out] == [0, 1, 2, 3, 4]
    ncls = [r["n_classes"] for r in out]
    assert ncls[0] == 60 and ncls == sorted(ncls, reverse=True)
    assert out[0]["suppression_share"] == 1.0  # all singletons
    # nation x segment: 6 classes of 10 -> k-anonymous at k=5
    assert out[1]["n_classes"] == 6 and out[1]["k_anonymous"] is True
    # one region: region|segment = 2 classes of 30
    assert out[2]["n_classes"] == 2 and out[2]["k_min"] == 30
    assert out[4]["n_classes"] == 1 and out[4]["k_min"] == 60
    assert all(r["suppression_share"] == 0.0 for r in out[1:])


# --------------------- filter Shapley attribution ------------------


def _shap_doc(i, n_distinct, n_stop, pad_to):
    # n_distinct unique tokens + n_stop stopwords, padded with "w0"
    # repeats to pad_to tokens
    toks = (
        [f"u{i}x{j}" for j in range(n_distinct)]
        + ["the"] * n_stop
        + ["w0"] * (pad_to - n_distinct - n_stop)
    )
    text = " ".join(toks)
    return (i, text, "en", "s", len(text))


def test_shapley_charges_only_the_binding_filter(spark, tmp_path):
    # every doc has TTR ~1 and stopword ratio >= 0.05; half are short
    # -> ALL removal credit goes to min_length, others get 0
    rows = [_shap_doc(i, 18, 2, 20) for i in range(10)] + [
        _shap_doc(100 + i, 45, 3, 48) for i in range(10)
    ]
    sf = _lake(spark, tmp_path, documents=(rows, DOC_SCHEMA))
    out = {r["filter"]: r for r in
           QS["filter_shapley_attribution"](spark, sf).collect()}
    assert out["min_length"]["shapley_removed"] == 10.0
    assert out["min_length"]["solo_removed"] == 10
    assert out["ttr"]["shapley_removed"] == 0.0
    assert out["stopword_ratio"]["shapley_removed"] == 0.0
    assert out["min_length"]["coalition_removed"] == 10


def test_shapley_efficiency_sums_to_stack_removal(spark, tmp_path):
    # mixed failure modes: the three values must sum EXACTLY to the
    # docs the full stack removes, and redundant co-binding filters
    # split credit (here a doc failing length AND ttr gives each 1/2)
    rows = [
        _shap_doc(0, 2, 1, 20),     # fails length + ttr (2/20 distinct-ish)
        _shap_doc(1, 45, 3, 48),    # passes all
        _shap_doc(2, 45, 0, 48),    # fails stopword only
        _shap_doc(3, 18, 2, 20),    # fails length only
    ]
    sf = _lake(spark, tmp_path, documents=(rows, DOC_SCHEMA))
    out = QS["filter_shapley_attribution"](spark, sf).collect()
    total = out[0]["coalition_removed"]
    assert total == 3
    s = sum(r["shapley_removed"] for r in out)
    assert abs(s - total) < 1e-9
    by = {r["filter"]: r for r in out}
    # doc0 splits between length and ttr; doc3 is length's alone
    assert by["min_length"]["shapley_removed"] == 1.5
    assert by["ttr"]["shapley_removed"] == 0.5
    assert by["stopword_ratio"]["shapley_removed"] == 1.0


# ---------------------- extreme value Gumbel -----------------------


def test_gumbel_constant_maxima_collapse_to_point(spark, tmp_path):
    # every month's max is 2.0 ($M): s = 0 -> beta 0, mu = 2, every
    # return level = 2 (a degenerate but exactly-pinned fit)
    rows = []
    k = 0
    for mo in range(1, 13):
        for day in (3, 14):
            rows.append(
                (f"1996-{mo:02d}-{day:02d}", 2.0e6)
            )
            k += 1
    sf = _lake(
        spark,
        tmp_path,
        orders=(rows, "o_orderdate string, o_totalprice double"),
    )
    r = QS["extreme_value_gumbel"](spark, sf).collect()[0]
    assert r["n_blocks"] == 12
    assert r["gumbel_beta"] == 0.0 and r["gumbel_mu"] == 2.0
    assert (
        r["return_level_1y"]
        == r["return_level_5y"]
        == r["return_level_10y"]
        == 2.0
    )


def test_gumbel_return_levels_increase_with_horizon(spark, tmp_path):
    # alternating monthly maxima 1/3 ($M): moment fit is closed-form;
    # return levels must strictly increase with the horizon and sit
    # above the location parameter
    import math

    rows = []
    for mo in range(1, 13):
        mx = 3.0 if mo % 2 else 1.0
        rows.append((f"1996-{mo:02d}-05", mx * 1e6))
        rows.append((f"1996-{mo:02d}-20", 0.5e6))  # non-max day
    sf = _lake(
        spark,
        tmp_path,
        orders=(rows, "o_orderdate string, o_totalprice double"),
    )
    r = QS["extreme_value_gumbel"](spark, sf).collect()[0]
    s = math.sqrt(sum((x - 2.0) ** 2 for x in [3.0, 1.0] * 6) / 11)
    beta = s * math.sqrt(6) / math.pi
    mu = 2.0 - 0.5772156649015329 * beta
    assert r["gumbel_beta"] == round(beta, 6)
    assert r["gumbel_mu"] == round(mu, 6)
    assert (
        r["gumbel_mu"]
        < r["return_level_1y"]
        < r["return_level_5y"]
        < r["return_level_10y"]
    )
    expect_1y = mu - beta * math.log(-math.log(1 - 1 / 12))
    assert r["return_level_1y"] == round(expect_1y, 6)


# -------------------------- CCF lead-lag ---------------------------


def test_ccf_peak_at_planted_two_hour_lead(spark, tmp_path):
    # views at hour h with count 1+(h%5); purchases exactly 2 hours
    # later with the SAME count pattern -> ccf(+2) = 1.0 is the peak
    t0 = datetime.datetime(2024, 3, 1)
    rows, eid = [], 0
    for h in range(48):
        c = 1 + (h % 5)
        for k in range(c):
            rows.append(
                (eid, "view", t0 + datetime.timedelta(hours=h, minutes=k))
            )
            eid += 1
        for k in range(c):
            rows.append(
                (
                    eid,
                    "purchase",
                    t0 + datetime.timedelta(hours=h + 2, minutes=30 + k),
                )
            )
            eid += 1
    sf = _lake(
        spark,
        tmp_path,
        events=(rows, "event_id long, event_type string, ts timestamp"),
    )
    out = {r["lag_hours"]: r for r in QS["ccf_leadlag"](spark, sf).collect()}
    assert out[2]["ccf"] == 1.0
    assert out[2]["is_peak"] is True
    assert sum(1 for r in out.values() if r["is_peak"]) == 1
    # contemporaneous correlation exists but is weaker than the lead
    assert abs(out[0]["ccf"]) < 1.0


# ------------------------- Hurst exponent --------------------------


def test_hurst_trend_is_persistent_alternation_is_not(
    spark, tmp_path
):
    # a pure linear trend has H ~ 1 (every shock persists); a
    # period-2 alternation has H ~ 0 (instant mean reversion)
    sf = _daily_lake(spark, tmp_path, [float(i) for i in range(256)])
    out = QS["hurst_exponent_rs"](spark, sf).collect()
    assert [r["block_size"] for r in out] == [8, 16, 32, 64]
    assert out[0]["n_blocks"] == 32 and out[3]["n_blocks"] == 4
    assert out[0]["hurst"] > 0.9
    assert all(r["regime"] == "persistent" for r in out)
    # mean R/S grows with block size under persistence
    rs = [r["mean_rs"] for r in out]
    assert rs == sorted(rs)

    sf2 = _daily_lake(
        spark, tmp_path / "alt", [1.0, 9.0] * 128
    )
    out2 = QS["hurst_exponent_rs"](spark, sf2).collect()
    assert out2[0]["hurst"] < 0.1
    assert all(r["regime"] == "anti-persistent" for r in out2)


# ------------------------ word burstiness --------------------------


def test_burstiness_separates_bursty_from_scattered(spark, tmp_path):
    # "lava" occurs 30 times but only inside 2 of 30 docs (bursty);
    # "glue" occurs once in every doc (maximally scattered): the
    # Poisson model expects lava in ~19 docs -> burstiness >> 1,
    # while glue's observed df EXCEEDS the Poisson expectation ->
    # burstiness < 1
    rows = []
    for i in range(30):
        extra = " lava" * 15 if i < 2 else ""
        text = ("glue " + f"filler{i} " * 5) + extra
        rows.append((i, text, "en", "s", len(text)))
    sf = _lake(spark, tmp_path, documents=(rows, DOC_SCHEMA))
    out = {r["word"]: r for r in
           QS["word_burstiness_topk"](spark, sf).collect()}
    assert set(out) == {"lava", "glue"}  # only cf >= 20 words
    lava, glue = out["lava"], out["glue"]
    assert lava["cf"] == 30 and lava["df"] == 2
    assert glue["cf"] == 30 and glue["df"] == 30
    assert lava["burstiness"] > 5
    assert glue["burstiness"] < 1
    assert lava["mean_occ_per_doc"] == 15.0
    # expected_df identical for equal cf: the ratio is all df
    assert lava["expected_df"] == glue["expected_df"]


# --------------------------- IPW / DiD -----------------------------


def test_ipw_removes_planted_brand_confounding(spark, tmp_path):
    # No true effect: y is 100 on brand H, 10 on brand L regardless
    # of treatment — but H is 80% promo and L 20%, so the naive diff
    # is strongly positive while IPW recovers 0
    li, part = [], []
    pk = 0
    for brand, y, n_treat in (("H", 100.0, 80), ("L", 10.0, 20)):
        for i in range(100):
            promo = i < n_treat
            part.append(
                (pk, f"Brand#{brand}", "PROMO STUFF" if promo else "STD STUFF")
            )
            li.append((pk, y, 0.0))
            pk += 1
    sf = _lake(
        spark,
        tmp_path,
        lineitem=(
            li,
            "l_partkey long, l_extendedprice double, l_discount double",
        ),
        part=(part, "p_partkey long, p_brand string, p_type string"),
    )
    r = QS["ipw_treatment_effect"](spark, sf).collect()[0]
    assert r["n_treat"] == 100 and r["n_ctrl"] == 100
    assert r["naive_diff"] == 54.0  # 82 - 28: pure confounding
    assert r["ipw_ate"] == 0.0
    assert r["min_propensity"] == 0.2 and r["max_propensity"] == 0.8


def test_did_recovers_planted_effect_under_common_trend(
    spark, tmp_path
):
    # treated: 10 -> 25 (own trend +10, effect +5); control: 20 -> 30
    # (trend +10). DiD = 5; naive post-only diff would read -5.
    orders, cust = [], []
    cust.append((1, "BUILDING"))
    cust.append((2, "AUTO"))
    k = 0
    for (ck, pre, post) in ((1, 10.0, 25.0), (2, 20.0, 30.0)):
        for i in range(50):
            orders.append((k, ck, "1995-06-01", pre)); k += 1
            orders.append((k, ck, "1997-06-01", post)); k += 1
    sf = _lake(
        spark,
        tmp_path,
        orders=(
            orders,
            "o_orderkey long, o_custkey long, o_orderdate string, "
            "o_totalprice double",
        ),
        customer=(cust, "c_custkey long, c_mktsegment string"),
    )
    r = QS["diff_in_diff_revenue"](spark, sf).collect()[0]
    assert r["pre_treated"] == 10.0 and r["post_treated"] == 25.0
    assert r["pre_control"] == 20.0 and r["post_control"] == 30.0
    assert r["did_estimate"] == 5.0
    assert r["n_treated"] == 100


# ----------------------- silhouette portable -----------------------


def test_silhouette_near_one_for_separated_blobs(spark, tmp_path):
    # four tight blobs at orthogonal corners; the md5-order seeds are
    # FORCED into distinct blobs (blob of the 4 seed ids pinned), so
    # the 2-round Lloyd fit recovers the blobs exactly and every
    # vector sits ~20x closer to its own centroid than any other
    import hashlib

    ids = list(range(40))
    seed_order = sorted(ids, key=lambda v: (hashlib.md5(str(v).encode()).hexdigest(), v))
    blob_of = {}
    for b, v in enumerate(seed_order[:4]):
        blob_of[v] = b
    rest = [v for v in ids if v not in blob_of]
    for i, v in enumerate(rest):
        blob_of[v] = i % 4
    rows = []
    for v in ids:
        b = blob_of[v]
        base = [0.0, 0.0, 0.0, 0.0]
        base[b] = 10.0
        jitter = 0.1 if v % 2 else -0.1
        base[(b + 1) % 4] += jitter
        rows.append((v, [float(x) for x in base], b))
    sf = _lake(
        spark,
        tmp_path,
        embeddings=(rows, "vec_id long, embedding array<float>, label int"),
    )
    out = QS["silhouette_portable"](spark, sf).collect()
    assert len(out) == 4
    assert sum(r["n_vecs"] for r in out) == 40
    for r in out:
        assert r["mean_silhouette"] > 0.9
        assert r["share_negative"] == 0.0
        assert r["min_silhouette"] > 0.9


# -------------------------- log-rank test --------------------------


def _lr_lake(spark, tmp_path, late_purchase_offsets):
    # 10 early signups (Jan 1) + 10 late (Jan 25, past the Jan 21
    # window midpoint); horizon pinned at
    # Feb 10 by a sentinel view event. Early users always purchase
    # at t0 + (1 + i%3) days; late users per the offsets arg
    # (None = censored).
    t0e = datetime.datetime(2024, 1, 1)
    t0l = datetime.datetime(2024, 1, 25)
    rows, eid = [(0, "view", datetime.datetime(2024, 2, 10))], 1
    for i in range(10):
        rows.append((eid, "signup", t0e)); uid_e = eid
        rows.append(
            (eid, "purchase", t0e + datetime.timedelta(days=1 + i % 3))
        )
        eid += 1
    for i in range(10):
        off = late_purchase_offsets(i)
        rows.append((eid, "signup", t0l))
        if off is not None:
            rows.append(
                (eid, "purchase", t0l + datetime.timedelta(days=off))
            )
        eid += 1
    # rebuild with per-user ids: user_id == eid group written above
    fixed = []
    for k, (uid, et, ts) in enumerate(rows):
        fixed.append((k, uid, et, ts))
    return _lake(
        spark,
        tmp_path,
        events=(
            fixed,
            "event_id long, user_id long, event_type string, "
            "ts timestamp",
        ),
    )


def test_logrank_null_when_cohorts_match(spark, tmp_path):
    # late users purchase with the SAME offset pattern as early ones
    # -> at every event day d1 = d*n1/n exactly, U = 0, z = 0
    sf = _lr_lake(spark, tmp_path, lambda i: 1 + i % 3)
    r = QS["logrank_test"](spark, sf).collect()[0]
    assert r["n_early"] == 10 and r["n_late"] == 10
    assert r["events_early"] == 10 and r["events_late"] == 10
    assert r["o_minus_e"] == 0.0
    assert r["z"] == 0.0 and r["significant"] is False


def test_logrank_flags_never_converting_cohort(spark, tmp_path):
    # late users NEVER purchase (censored at horizon): early events
    # far exceed the pooled expectation -> |z| > 1.96
    sf = _lr_lake(spark, tmp_path, lambda i: None)
    r = QS["logrank_test"](spark, sf).collect()[0]
    assert r["events_early"] == 10 and r["events_late"] == 0
    assert r["o_minus_e"] > 0
    assert r["significant"] is True


# ---------------------- Gaussian mixture EM ------------------------


def test_gmm_separates_planted_bimodal_days(spark, tmp_path):
    # 100 days near 1.0 and 100 near 5.0 ($M): quartile init puts
    # one component in each lobe and 2 EM rounds lock on; weights
    # ~0.5 each, means ~1 and ~5, tight sigmas
    vals = []
    for i in range(200):
        base = 1.0 if i % 2 else 5.0
        vals.append((base + (0.01 if (i // 2) % 2 else -0.01)) * 1e6)
    sf = _daily_lake(spark, tmp_path, vals)
    out = QS["gaussian_mixture_em"](spark, sf).collect()
    assert [r["component"] for r in out] == [1, 2]
    mus = sorted(r["mu"] for r in out)
    assert abs(mus[0] - 1.0) < 0.05 and abs(mus[1] - 5.0) < 0.05
    for r in out:
        assert abs(r["weight"] - 0.5) < 0.02
        assert r["sigma"] < 0.1
        assert r["n_days"] == 200
    # both rows carry the same model-level likelihood
    assert out[0]["avg_loglik"] == out[1]["avg_loglik"]


def test_gmm_degenerate_constant_series_hits_var_floor(
    spark, tmp_path
):
    # constant series: both components sit at the value, variance
    # clamps to the floor, weights stay at the 0.5 init
    sf = _daily_lake(spark, tmp_path, [2.0e6] * 50)
    out = QS["gaussian_mixture_em"](spark, sf).collect()
    for r in out:
        assert r["mu"] == 2.0
        assert r["weight"] == 0.5
        assert r["sigma"] == 0.001  # sqrt(1e-6) floor


# ------------------------- Mann-Kendall ----------------------------


def _weekly_lake(spark, tmp_path, levels):
    base = datetime.date(1995, 1, 5)
    rows = [
        ("X", (base + datetime.timedelta(days=7 * i)).isoformat(),
         float(v) * 1e6)
        for i, v in enumerate(levels)
    ]
    return _lake(
        spark,
        tmp_path,
        orders=(
            rows,
            "o_orderpriority string, o_orderdate string, "
            "o_totalprice double",
        ),
    )


def test_mann_kendall_monotone_series_maxes_s(spark, tmp_path):
    # strictly increasing 20-week series: S = C(20,2) = 190, and the
    # test must call a significant increasing trend
    sf = _weekly_lake(spark, tmp_path, range(1, 21))
    r = QS["mann_kendall_trend"](spark, sf).collect()[0]
    assert r["n_weeks"] == 20 and r["s_stat"] == 190
    assert r["direction"] == "increasing" and r["significant"] is True
    # no ties: var = n(n-1)(2n+5)/18
    assert r["var_s"] == round(20 * 19 * 45 / 18, 6)


def test_mann_kendall_alternating_series_is_trendless(spark, tmp_path):
    # perfect alternation: every up-pair has a matching down-pair at
    # even n... plant 20 weeks of 1,2,1,2: sign sum stays small and
    # the verdict is not significant
    sf = _weekly_lake(spark, tmp_path, [1, 2] * 10)
    r = QS["mann_kendall_trend"](spark, sf).collect()[0]
    assert r["significant"] is False
    assert abs(r["s_stat"]) <= 10


# ------------------------- SPC Xbar-R chart ------------------------


def test_spc_flags_planted_shift_week_and_drops_partial(
    spark, tmp_path
):
    # 10 full weeks at level 2.0 with tiny in-week range; week 5's
    # mean is shifted by +0.3 — big vs A2*Rbar = 0.042 but small
    # enough not to drag every clean week outside the contaminated
    # center line (single-pass phase-I chart) -> one xbar violation;
    # a trailing 3-day partial week must be EXCLUDED
    # epoch day of 1996-01-04 is divisible by 7, so each planted
    # 7-day block lands in exactly one wk bucket
    base = datetime.date(1996, 1, 4)
    rows = []
    for w in range(10):
        lvl = 2.3 if w == 5 else 2.0
        for d in range(7):
            day = base + datetime.timedelta(days=7 * w + d)
            jitter = 0.05 if d % 2 else -0.05
            rows.append((day.isoformat(), (lvl + jitter) * 1e6))
    for d in range(3):  # partial tail week
        day = base + datetime.timedelta(days=70 + d)
        rows.append((day.isoformat(), 2.0e6))
    sf = _lake(
        spark,
        tmp_path,
        orders=(rows, "o_orderdate string, o_totalprice double"),
    )
    out = QS["spc_xbar_chart"](spark, sf).collect()
    assert len(out) == 10  # partial week dropped
    viol = [r for r in out if r["xbar_violation"]]
    assert len(viol) == 1 and viol[0]["xbar"] == 2.292857
    assert all(not r["range_violation"] for r in out)
    # limits are shared rows (1-row broadcast)
    assert len({r["ucl"] for r in out}) == 1


# ------------------------ ABC-XYZ grid -----------------------------


def test_abc_xyz_separates_whale_mid_and_tail(spark, tmp_path):
    # whale part: 86% of revenue, steady weekly demand -> AX;
    # mid part: 13%, one spike week -> BZ; 10 tiny parts -> CZ
    base = datetime.date(1996, 1, 4)  # epoch-day % 7 == 0
    li = []
    for w in range(10):
        d = (base + datetime.timedelta(days=7 * w)).isoformat()
        li.append((1, d, 10.0, 1000.0, 0.0))  # whale, every week
    li.append((2, base.isoformat(), 30.0, 1500.0, 0.0))  # spike
    for p in range(3, 13):
        li.append((p, base.isoformat(), 1.0, 10.0, 0.0))
    sf = _lake(
        spark,
        tmp_path,
        lineitem=(
            li,
            "l_partkey long, l_shipdate string, l_quantity double, "
            "l_extendedprice double, l_discount double",
        ),
    )
    out = {(r["abc"], r["xyz"]): r for r in
           QS["abc_xyz_classification"](spark, sf).collect()}
    assert set(out) == {("A", "X"), ("B", "Z"), ("C", "Z")}
    assert out[("A", "X")]["n_parts"] == 1
    assert out[("A", "X")]["revenue_share"] == 0.862069
    assert out[("B", "Z")]["n_parts"] == 1
    assert out[("C", "Z")]["n_parts"] == 10


# ---------------------- NB basket / heatmap ------------------------


def test_negbin_recovers_planted_overdispersion(spark, tmp_path):
    # 50 baskets of 2 items + 50 of 8: m = 5, v = 9 -> D = 1.8,
    # nb_r = 25/4, nb_p = 5/9
    li = []
    ok = 0
    for _ in range(50):
        for j in range(2):
            li.append((ok, j)); 
        ok += 1
    for _ in range(50):
        for j in range(8):
            li.append((ok, j))
        ok += 1
    sf = _lake(
        spark, tmp_path,
        lineitem=(li, "l_orderkey long, l_linenumber long"),
    )
    r = QS["negbin_basket_fit"](spark, sf).collect()[0]
    assert r["n_orders"] == 100
    assert r["mean_items"] == 5.0 and r["var_items"] == 9.0
    assert r["dispersion"] == 1.8 and r["regime"] == "overdispersed"
    assert r["nb_r"] == 6.25 and r["nb_p"] == round(5 / 9, 6)


def test_negbin_constant_baskets_leave_nb_null(spark, tmp_path):
    # every basket has 3 items: v = 0 -> underdispersed, NB moment
    # fit does not exist -> NULL parameters
    li = [(o, j) for o in range(30) for j in range(3)]
    sf = _lake(
        spark, tmp_path,
        lineitem=(li, "l_orderkey long, l_linenumber long"),
    )
    r = QS["negbin_basket_fit"](spark, sf).collect()[0]
    assert r["regime"] == "underdispersed"
    assert r["nb_r"] is None and r["nb_p"] is None


def test_heatmap_flags_planted_hot_cell(spark, tmp_path):
    # uniform orders over a Jan-Apr x Mon-Fri grid, plus a planted
    # January-Monday surge: that cell alone goes hot
    base = datetime.date(2024, 1, 1)  # a Monday
    rows = []
    k = 0
    for wk in range(16):  # 16 weeks = Jan..Apr
        for d in range(5):  # Mon..Fri
            day = base + datetime.timedelta(days=7 * wk + d)
            rows.append((k, day.isoformat())); k += 1
    for _ in range(40):  # surge on the first Monday
        rows.append((k, base.isoformat())); k += 1
    sf = _lake(
        spark, tmp_path,
        orders=(rows, "o_orderkey long, o_orderdate string"),
    )
    out = QS["calendar_heatmap_cells"](spark, sf).collect()
    hot = [r for r in out if r["hot_or_cold"] and r["pearson_residual"] > 0]
    assert len(hot) == 1
    assert hot[0]["mo"] == 1 and hot[0]["dow"] == 1
    # residuals decompose the same total: sum of n == total orders
    assert sum(r["n_orders"] for r in out) == k


# ------------------------------ CUPED ------------------------------


def test_cuped_removes_preperiod_variance_keeps_effect(
    spark, tmp_path
):
    # outcome y = x + effect*t: pre-period x explains ALL within-arm
    # variance, so CUPED collapses var to ~0 while the diff stays 5
    cust, orders = [], []
    k = 0
    for i in range(40):
        seg = "BUILDING" if i % 2 else "AUTO"
        cust.append((i, seg))
        x = float(10 + (i // 2) % 10)  # same x mix in both arms
        y = x + (5.0 if seg == "BUILDING" else 0.0)
        orders.append((k, i, "1995-06-01", x * 1e3)); k += 1
        orders.append((k, i, "1997-06-01", y * 1e3)); k += 1
    sf = _lake(
        spark,
        tmp_path,
        customer=(cust, "c_custkey long, c_mktsegment string"),
        orders=(
            orders,
            "o_orderkey long, o_custkey long, o_orderdate string, "
            "o_totalprice double",
        ),
    )
    r = QS["cuped_adjusted_ab"](spark, sf).collect()[0]
    assert r["n_treat"] == 20 and r["n_ctrl"] == 20
    assert r["raw_diff"] == 5.0
    assert r["cuped_diff"] == 5.0  # adjustment must NOT bias the diff
    assert r["var_cuped"] < 7  # between-arm effect only
    assert r["variance_reduction"] > 0.5


# --------------------------- SES backtest --------------------------


def test_ses_beats_naive_on_noise_loses_on_walk(spark, tmp_path):
    # white-ish alternating noise around a level: SES averages it
    # out while naive chases every flip -> rel_mae well under 1
    vals = [(2.0 + (0.5 if i % 2 else -0.5)) * 1e6 for i in range(120)]
    sf = _daily_lake(spark, tmp_path, vals)
    r = QS["ses_forecast_eval"](spark, sf).collect()[0]
    assert r["n_eval"] == 120 - 40
    assert r["ses_beats_naive"] is True
    assert r["rel_mae"] < 0.8

    # a strong linear trend: persistence hugs the ramp, SES lags it
    sf2 = _daily_lake(
        spark, tmp_path / "trend", [float(i) * 1e6 for i in range(120)]
    )
    r2 = QS["ses_forecast_eval"](spark, sf2).collect()[0]
    assert r2["ses_beats_naive"] is False
    assert r2["rel_mae"] > 1.5


# --------------------------- Heaps' law ----------------------------


def test_heaps_fit_pins_linear_and_saturated_growth(spark, tmp_path):
    # every doc is 2 BRAND-NEW words repeated 8x -> vocab = tokens/8
    # exactly -> beta = 1, K = 0.125, zero residual at every point
    rows = [
        (i, " ".join([f"n{i}a"] * 8 + [f"n{i}b"] * 8), "en", "s", 100)
        for i in range(64)
    ]
    sf = _lake(spark, tmp_path, documents=(rows, DOC_SCHEMA))
    out = QS["heaps_law_fit"](spark, sf).collect()
    assert [r["checkpoint"] for r in out] == [0, 1, 2, 3]
    assert [r["n_docs"] for r in out] == [8, 16, 32, 64]
    assert [r["vocab"] for r in out] == [16, 32, 64, 128]
    for r in out:
        assert r["heaps_beta"] == 1.0
        assert r["heaps_k"] == 0.125
        assert r["fitted_vocab"] == float(r["vocab"])

    # saturated corpus: same two words everywhere -> beta = 0
    rows2 = [(i, "alpha beta " * 8, "en", "s", 100) for i in range(64)]
    sf2 = _lake(spark, tmp_path / "sat", documents=(rows2, DOC_SCHEMA))
    out2 = QS["heaps_law_fit"](spark, sf2).collect()
    assert all(r["heaps_beta"] == 0.0 for r in out2)
    assert all(r["vocab"] == 2 for r in out2)


# ---------------------- char-ngram lang profile --------------------


def test_char_profile_groups_scripts(spark, tmp_path):
    # two 'languages' share an identical trigram distribution (same
    # text), a third uses a disjoint alphabet: the twin pair must be
    # cosine 1.0 and any pair with the outlier must be ~0
    rows = (
        [(i, "abcabcabc", "latn1", "s", 9) for i in range(5)]
        + [(10 + i, "abcabcabc", "latn2", "s", 9) for i in range(5)]
        + [(20 + i, "xyzxyzxyz", "other", "s", 9) for i in range(5)]
    )
    sf = _lake(spark, tmp_path, documents=(rows, DOC_SCHEMA))
    out = {(r["lang_a"], r["lang_b"]): r for r in
           QS["char_ngram_lang_profile"](spark, sf).collect()}
    assert len(out) == 3
    assert out[("latn1", "latn2")]["cosine"] == 1.0
    assert out[("latn1", "other")]["cosine"] == 0.0
    assert out[("latn2", "other")]["cosine"] == 0.0
    assert out[("latn1", "latn2")]["n_grams_a"] == 3  # distinct tris


# --------------------------- RAKE ----------------------------------


def test_rake_ranks_multiword_phrase_over_frequent_single(
    spark, tmp_path
):
    # "neural information retrieval" occurs once per doc between
    # stopwords; "data" occurs twice per doc as a lone phrase. RAKE:
    # each phrase word scores (deg+freq)/freq = (2n+n)/n = 3 -> the
    # 3-word phrase scores 9 per occurrence; a lone word scores 1.
    rows = [
        (
            i,
            "the neural information retrieval is data and data",
            "en",
            "s",
            50,
        )
        for i in range(5)
    ]
    sf = _lake(spark, tmp_path, documents=(rows, DOC_SCHEMA))
    out = QS["rake_keyphrases"](spark, sf).collect()
    assert out[0]["phrase"] == "neural information retrieval"
    assert out[0]["rake_score"] == 9.0
    assert out[0]["n_occurrences"] == 5
    data = [r for r in out if r["phrase"] == "data"][0]
    assert data["rake_score"] == 1.0
    assert data["n_occurrences"] == 10


# -------------------- pinball / event study ------------------------


def test_pinball_constant_series_scores_zero_at_median(
    spark, tmp_path
):
    # constant train AND test: every quantile predicts the constant,
    # pinball loss 0 everywhere, coverage 1.0 (x <= pred always)
    vals = [3.0e6] * 400
    sf = _daily_lake(spark, tmp_path, vals)
    out = QS["quantile_pinball_backtest"](spark, sf).collect()
    assert [r["tau"] for r in out] == [0.1, 0.5, 0.9]
    for r in out:
        assert r["pinball_loss"] == 0.0
        assert r["predicted_quantile"] == 3.0
        assert r["empirical_coverage"] == 1.0


def test_pinball_level_shift_blows_up_loss(spark, tmp_path):
    # train at 1.0, test at 5.0: the tau=0.9 predictor (1.0) under-
    # covers (0.0) and pays tau*(5-1) = 3.6 pinball per test day
    base = datetime.date(1996, 1, 1)
    rows = []
    for i in range(400):
        d = base + datetime.timedelta(days=i)
        lvl = 1.0 if d < datetime.date(1996, 7, 1) else 5.0
        rows.append((d.isoformat(), lvl * 1e6))
    sf = _lake(
        spark, tmp_path,
        orders=(rows, "o_orderdate string, o_totalprice double"),
    )
    out = {r["tau"]: r for r in
           QS["quantile_pinball_backtest"](spark, sf).collect()}
    assert out[0.9]["predicted_quantile"] == 1.0
    assert out[0.9]["empirical_coverage"] == 0.0
    assert out[0.9]["pinball_loss"] == 3.6
    assert out[0.9]["calibrated"] is False


def test_event_study_car_ramps_after_planted_step(spark, tmp_path):
    # level 2.0 before the anchor, 3.0 from the anchor on: abnormal
    # is 0 pre-event and +1 post, CAR ramps 1, 2, ... and car_t
    # crosses 2 within the window (sd from tiny pre-period jitter)
    rows = []
    d0 = datetime.date(1995, 10, 1)
    for i in range(200):
        d = d0 + datetime.timedelta(days=i)
        lvl = 2.0 if d < datetime.date(1996, 1, 1) else 3.0
        jit = 0.01 if i % 2 else -0.01
        rows.append((d.isoformat(), (lvl + jit) * 1e6))
    sf = _lake(
        spark, tmp_path,
        orders=(rows, "o_orderdate string, o_totalprice double"),
    )
    out = QS["event_study_car"](spark, sf).collect()
    assert [r["rel_day"] for r in out] == list(range(-10, 11))
    pre = [r for r in out if r["rel_day"] < 0]
    post = [r for r in out if r["rel_day"] >= 0]
    assert all(abs(r["abnormal"]) < 0.05 for r in pre)
    assert all(0.95 < r["abnormal"] < 1.05 for r in post)
    assert abs(post[-1]["car"] - 11.0) < 0.2
    assert post[-1]["car_t"] > 2
    assert abs(pre[-1]["car_t"]) < 1


# ---------------------- Simpson reversal audit ---------------------


def test_simpson_audit_flags_planted_reversal(spark, tmp_path):
    # within EVERY brand the treatment loses by 2, but treatment
    # concentrates in the high-revenue brand -> the aggregate diff
    # is positive: the textbook reversal, flagged in every stratum
    li, part = [], []
    pk = 0
    for brand, y, n_treat in (("H", 100.0, 80), ("L", 10.0, 20)):
        for i in range(100):
            promo = i < n_treat
            yy = y - 2.0 if promo else y
            part.append(
                (pk, f"Brand#{brand}",
                 "PROMO X" if promo else "STD X")
            )
            li.append((pk, yy, 0.0))
            pk += 1
    sf = _lake(
        spark,
        tmp_path,
        lineitem=(
            li,
            "l_partkey long, l_extendedprice double, l_discount double",
        ),
        part=(part, "p_partkey long, p_brand string, p_type string"),
    )
    out = {r["stratum"]: r for r in
           QS["simpson_reversal_audit"](spark, sf).collect()}
    assert out["Brand#H"]["stratum_diff"] == -2.0
    assert out["Brand#L"]["stratum_diff"] == -2.0
    assert out["Brand#H"]["overall_diff"] > 0
    assert all(r["sign_reversed"] for r in out.values())


def test_simpson_audit_drops_single_arm_strata(spark, tmp_path):
    # a brand with ONLY treated rows has no within-stratum diff and
    # must be excluded, not emitted as NULL or division noise
    li = [(0, 10.0, 0.0), (1, 12.0, 0.0), (2, 11.0, 0.0)]
    part = [(0, "B#solo", "PROMO X"), (1, "B#mix", "PROMO X"),
            (2, "B#mix", "STD X")]
    sf = _lake(
        spark,
        tmp_path,
        lineitem=(
            li,
            "l_partkey long, l_extendedprice double, l_discount double",
        ),
        part=(part, "p_partkey long, p_brand string, p_type string"),
    )
    out = QS["simpson_reversal_audit"](spark, sf).collect()
    assert [r["stratum"] for r in out] == ["B#mix"]


# ------------------------ source Pareto front ----------------------


def test_pareto_front_separates_dominated_cells(spark, tmp_path):
    # three sources in one lang: "gold" (high TTR, short docs)
    # dominates "bloat" (same TTR, longer) and "junk" (lower TTR,
    # longer); gold alone is on the front, junk is doubly dominated
    def mk(src, n_distinct, n_words, ids):
        return [_doc(i, n_words, n_distinct, src) for i in ids]

    rows = (
        mk("gold", 10, 10, range(5))       # TTR 1.0, 10 tokens
        + mk("bloat", 20, 20, range(10, 15))  # TTR 1.0, 20 tokens
        + mk("junk", 5, 20, range(20, 25))    # TTR 0.25, 20 tokens
    )
    sf = _lake(spark, tmp_path, documents=(rows, DOC_SCHEMA))
    out = {r["source"]: r for r in
           QS["source_pareto_front"](spark, sf).collect()}
    assert out["gold"]["on_front"] is True
    assert out["gold"]["n_dominators"] == 0
    assert out["bloat"]["on_front"] is False
    assert out["bloat"]["n_dominators"] == 1  # only gold dominates
    assert out["junk"]["n_dominators"] == 2


# ------------------------- freshness audit -------------------------


def test_freshness_flags_the_frozen_table(spark, tmp_path):
    # events advance to March; orders froze in early January and
    # lineitem keeps pace -> only orders is stale (>30 days behind)
    orders = [(1, "1996-01-05"), (2, "1996-01-02")]
    li = [(1, "1996-02-27"), (2, "1996-03-01")]
    ev = [
        (1, datetime.datetime(1996, 3, 2, 12)),
        (2, datetime.datetime(1996, 1, 1, 9)),
    ]
    sf = _lake(
        spark,
        tmp_path,
        orders=(orders, "o_orderkey long, o_orderdate string"),
        lineitem=(li, "l_orderkey long, l_shipdate string"),
        events=(ev, "event_id long, ts timestamp"),
    )
    out = {r["tbl"]: r for r in
           QS["freshness_audit"](spark, sf).collect()}
    assert out["orders"]["stale"] is True
    assert out["orders"]["staleness_days"] == 57
    assert out["events"]["stale"] is False
    assert out["events"]["staleness_days"] == 0
    assert out["lineitem"]["stale"] is False
    assert out["orders"]["first_seen"] == "1996-01-02"


# -------------------- propensity overlap audit ---------------------


def test_overlap_audit_flags_thin_arm_and_ess_collapse(
    spark, tmp_path
):
    # balanced stratum B (e = 0.5) passes; stratum A has 1 treated
    # in 50 (e = 0.02 < 0.05) -> violated, and the control ESS
    # collapses far below n because A's controls carry weight
    # 1/(1-0.02) ~ 1 while... the treated ESS shows the blowup:
    # one unit at weight 50 + 25 units at weight 2 -> ESS << 26
    li, part = [], []
    pk = 0
    for i in range(50):  # stratum A: 1 treated
        part.append((pk, "A", "PROMO X" if i == 0 else "STD X"))
        li.append((pk,)); pk += 1
    for i in range(50):  # stratum B: balanced
        part.append((pk, "B", "PROMO X" if i % 2 else "STD X"))
        li.append((pk,)); pk += 1
    sf = _lake(
        spark,
        tmp_path,
        lineitem=(li, "l_partkey long"),
        part=(part, "p_partkey long, p_brand string, p_type string"),
    )
    out = {r["stratum"]: r for r in
           QS["propensity_overlap_audit"](spark, sf).collect()}
    assert out["A"]["propensity"] == 0.02
    assert out["A"]["positivity_violated"] is True
    assert out["B"]["propensity"] == 0.5
    assert out["B"]["positivity_violated"] is False
    # 26 treated total, but ESS is dominated by the weight-50 unit
    r = out["A"]
    n_treated_total = 1 + 25
    assert r["ess_treated"] < n_treated_total * 0.8
    # identical ESS columns on every row (1-row broadcast)
    assert out["A"]["ess_control"] == out["B"]["ess_control"]


# ------------------------- Wilson CI -------------------------------


def test_wilson_interval_pins_textbook_values(spark, tmp_path):
    # 10 of 40 convert in AUTO: the Wilson interval is a textbook
    # closed form; a 0-of-20 BUILDING segment must give lo exactly 0
    # and a POSITIVE hi (where Wald collapses to [0, 0])
    import math

    cust = [(i, "AUTO") for i in range(40)] + [
        (100 + i, "BUILDING") for i in range(20)
    ]
    orders = [(k, i) for k, i in enumerate(range(10))]  # AUTO buyers
    sf = _lake(
        spark,
        tmp_path,
        customer=(cust, "c_custkey long, c_mktsegment string"),
        orders=(orders, "o_orderkey long, o_custkey long"),
    )
    out = {r["segment"]: r for r in
           QS["wilson_conversion_ci"](spark, sf).collect()}
    a = out["AUTO"]
    assert a["n"] == 40 and a["k"] == 10 and a["rate"] == 0.25
    z = 1.959964
    n, p = 40, 0.25
    denom = 1 + z * z / n
    center = p + z * z / (2 * n)
    half = z * math.sqrt(p * (1 - p) / n + z * z / (4 * n * n))
    assert a["wilson_lo"] == round((center - half) / denom, 6)
    assert a["wilson_hi"] == round((center + half) / denom, 6)
    b = out["BUILDING"]
    assert b["k"] == 0 and b["rate"] == 0.0
    assert b["wilson_lo"] == 0.0
    assert b["wilson_hi"] > 0.1  # the non-degenerate upper bound

"""Round-11 behavioral tests: the r10 ADVICE fixes made observable.

Same pattern as the earlier round files: plant inputs where the fixed
property is FORCED and assert the documented behavior directly.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from citeconnect_datapipeline_spark.operators.extraction import (
    assert_payload_parse_corpus_properties,
    payload_parse_corpus_violations,
    tier_gate,
)
from citeconnect_datapipeline_spark.operators.extraction_parsers import (
    extract_intro_from_pdf_text,
)


def _lake(spark, tmp_path, **tables):
    sf = str(tmp_path / "lake")
    for name, (rows, schema) in tables.items():
        spark.createDataFrame(rows, schema).write.mode(
            "overwrite"
        ).parquet(f"{sf}/{name}.parquet")
    return sf


# ---------------- tier_gate: upper bound is PDF-tier-only -----------


def test_tier_gate_upper_bound_is_pdf_only(spark):
    """r10 ADVICE #1: the reference gates ArXiv HTML (:70) and GROBID
    (:110) only on len > 200; only the PDF-regex tier (:172) also
    requires len < 15000. A 16k-char intro must survive tiers 1-2 and
    be rejected by tier 3."""
    long16k = "x" * 16_000
    short = "x" * 100
    mid = "x" * 500
    df = spark.createDataFrame(
        [(long16k,), (short,), (mid,)], "t string"
    ).select(
        tier_gate(F.col("t")).alias("html_tier"),
        tier_gate(F.col("t"), upper=True).alias("pdf_tier"),
    )
    rows = sorted(
        df.collect(), key=lambda r: len(r["html_tier"] or "")
    )
    # short: fails both gates; mid: passes both; 16k: html only
    assert [r["html_tier"] is not None for r in rows] == [False, True, True]
    assert [r["pdf_tier"] is not None for r in rows] == [False, True, False]
    assert rows[2]["html_tier"] == long16k and rows[2]["pdf_tier"] is None


def test_4tier_cascade_accepts_long_html_tier(spark, tmp_path):
    """End-to-end through the registered query machinery: feed the
    when-chain a pre-fetched tier frame where the arxiv tier is 16k
    chars — with the fixed gate it wins as 'arxiv_html' instead of
    falling through."""
    from citeconnect_datapipeline_spark.operators import extraction

    tiers = spark.createDataFrame(
        [(1, "abstract " * 30, "h" * 16_000, None, None)],
        "doc_id long, text string, arxiv_text string, "
        "grobid_text string, pdf_text string",
    )
    t1 = extraction.tier_gate(F.col("arxiv_text"))
    t3 = extraction.tier_gate(F.col("pdf_text"), upper=True)
    row = tiers.select(
        F.when(t1.isNotNull(), "arxiv_html")
        .when(t3.isNotNull(), "pdf_regex")
        .otherwise("abstract")
        .alias("method")
    ).first()
    assert row["method"] == "arxiv_html"


# ---------------- PDF intro: end marker at position 0 ----------------


def test_pdf_intro_end_marker_at_position_zero_falls_through():
    """r10 ADVICE #2 (documented divergence): when an end marker
    matches immediately after the Introduction heading, the intro is
    EMPTY and the extractor returns None (abstract-ladder fallback) —
    the reference's falsy check would instead keep 10k chars of the
    very bibliography the marker flagged."""
    text = "1. Introduction\nReferences\n" + "[1] cited work. " * 40
    assert extract_intro_from_pdf_text(text) is None


def test_pdf_intro_normal_cut_still_works():
    body = "This paper studies tokens and words. " * 10
    text = f"1. Introduction\n{body}\nReferences\n[1] et al."
    got = extract_intro_from_pdf_text(text)
    assert got == " ".join(body.split())


# ---------------- payload-parse corpus-property guard ----------------


def test_corpus_guard_green_on_driver_testdata(spark, sf_dir):
    """The real driver corpus satisfies every oracle assumption."""
    assert payload_parse_corpus_violations(spark, sf_dir) == {
        "markup_chars": 0,
        "newlines": 0,
        "end_marker_at_start": 0,
    }
    assert_payload_parse_corpus_properties(spark, sf_dir)  # no raise


@pytest.mark.parametrize(
    ("bad_text", "prop"),
    [
        ("tokens & more <b>markup</b> " * 20, "markup_chars"),
        ("first line\nReferences inside\nmore " * 10, "newlines"),
        ("References " + "trailing words " * 30, "end_marker_at_start"),
        ("2. Methodology " + "words " * 60, "end_marker_at_start"),
    ],
)
def test_corpus_guard_raises_naming_the_property(
    spark, tmp_path, bad_text, prop
):
    """r10 ADVICE #4: a regenerated corpus violating an injectivity
    assumption fails LOUDLY with the assumption named, instead of
    silently turning the oracle into a hash-mismatch trap."""
    sf = _lake(
        spark,
        tmp_path,
        documents=(
            [(1, "clean ordinary text " * 20), (2, bad_text)],
            "doc_id long, text string",
        ),
    )
    counts = payload_parse_corpus_violations(spark, sf)
    assert counts[prop] == 1
    with pytest.raises(AssertionError, match=prop):
        assert_payload_parse_corpus_properties(spark, sf)


# --------------- r11 self-review regression lanes -------------------


def test_corpus_guard_is_case_insensitive(spark, tmp_path):
    """Self-review #2: the PDF parser matches end markers with
    re.IGNORECASE, so the guard must flag case variants too."""
    sf = _lake(
        spark,
        tmp_path,
        documents=(
            [(1, "REFERENCES to prior art " + "words " * 40),
             (2, "discussion of methods " + "words " * 40),
             (3, "2. METHODS section " + "words " * 40),
             (4, "clean ordinary text " * 20)],
            "doc_id long, text string",
        ),
    )
    counts = payload_parse_corpus_violations(spark, sf)
    assert counts["end_marker_at_start"] == 3


def test_box_violin_aggregate_survives_nulls(spark):
    """Self-review #1: a null value must not kill the histogram
    branch (width_bucket(null) -> null map key)."""
    from citeconnect_datapipeline_spark.sinks.report import (
        box_violin_aggregate,
    )

    rows = [("a", float(v)) for v in range(20)] + [("a", None), ("b", 5.0)]
    df = spark.createDataFrame(rows, "k string, v double")
    got = {r["k"]: r for r in box_violin_aggregate(df, "k", "v", bins=4).collect()}
    assert sum(got["a"]["density"]) == 20  # null excluded everywhere
    assert got["a"]["lo"] == 0.0 and got["a"]["hi"] == 19.0


def test_mitigation_card_counts_full_term_list():
    """Self-review #4: the count reports ALL targeted subdomains even
    though only ten are listed."""
    from citeconnect_datapipeline_spark.sinks.report import (
        mitigation_effectiveness_svg,
    )

    svg = mitigation_effectiveness_svg(
        {
            "status": "success",
            "papers_collected": 7,
            "search_terms_used": [f"term {i}" for i in range(15)],
        }
    )
    assert "Subdomains Targeted: 15" in svg
    assert "term 9" in svg and "term 10" not in svg  # display cap


def test_plot_chart_keeps_renderer_default_title(spark, tmp_path):
    """Self-review #5: an empty plot_chart title must not override a
    renderer's own default."""
    from citeconnect_datapipeline_spark.sinks.report import plot_chart

    hist = spark.createDataFrame(
        [("r1", 2.0, 10, 2), ("r2", 1.5, 20, 1)],
        "run_ts string, disparity_ratio double, total_papers long, "
        "underrep_subdomains long",
    )
    svg = open(
        plot_chart(hist, str(tmp_path / "d.svg"), "disparity_history")
    ).read()
    assert "Bias Disparity Ratio Trend Over Time" in svg


def test_hard_negative_mining_window_stays_parallel(spark):
    """Self-review #3: the bounded-output sort must not collapse the
    scored window stage into one task — the plan keeps an exchange
    between the rank filter and the single-partition sort."""
    from __spark_entry__ import queries

    df = queries()["hard_negative_mining"](
        spark, "/root/testdata/sf0.001"
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Coalesce 1" not in plan  # repartition, not coalesce


# --------------- fuzzy_prefix_pairs: PassJoin blocking ---------------


def test_fuzzy_pairs_survive_front_insertion_shift(spark, tmp_path):
    """The defining property of the pigeonhole blocking: a few
    front insertions shift EVERY same-position gram, so same-position
    equality blocking finds nothing — the +-K position tolerance must
    still recover the pair."""
    from __spark_entry__ import queries

    base = "the quantile sketch merges partial summaries cheaply"
    shifted = "xyz " + base  # 4 front insertions; over the 40-char
    # windows that is 4 inserts + 4 tail chars pushed out = dist 8
    far = "completely unrelated content about citrus farming yields"
    rows = [(1, base, "en"), (2, shifted, "en"), (3, far, "en"),
            (4, base, "de")]  # same text, other lang: blocked apart
    sf = _lake(
        spark, tmp_path,
        documents=(rows, "doc_id long, text string, lang string"),
    )
    got = [
        (r["doc_a"], r["doc_b"], r["edit_dist"])
        for r in queries()["fuzzy_prefix_pairs"](spark, sf).collect()
    ]
    assert (1, 2, 8) in got          # shift-tolerant match
    assert all(p[:2] != (1, 4) for p in got)  # lang block holds
    assert all(3 not in p[:2] for p in got)   # far text excluded


def test_fuzzy_pairs_short_prefix_fallback_leg(spark, tmp_path):
    """Prefixes shorter than the 40-char window cannot carry the
    11-segment pigeonhole guarantee; the fallback leg must still
    pair them exactly."""
    from __spark_entry__ import queries

    rows = [
        (1, "tiny text", "en"),          # 9 chars
        (2, "tiny texts", "en"),         # dist 1, also short
        (3, "tiny text plus more words here ok", "en"),  # 33 chars,
        # dist to doc 1 = 24 (> K) but len diff 24 > 10 anyway
        (4, "a forty character prefix sentence padded", "en"),
    ]
    sf = _lake(
        spark, tmp_path,
        documents=(rows, "doc_id long, text string, lang string"),
    )
    got = {
        (r["doc_a"], r["doc_b"]): r["edit_dist"]
        for r in queries()["fuzzy_prefix_pairs"](spark, sf).collect()
    }
    assert got.get((1, 2)) == 1      # short-short pair found
    assert (1, 3) not in got and (1, 4) not in got


def test_fuzzy_pairs_match_bruteforce_on_random_corpus(spark, tmp_path):
    """Randomized cross-check: the blocked join equals the quadratic
    all-pairs join on a corpus with engineered near-dup families."""
    import random

    from pyspark.sql import functions as F

    from __spark_entry__ import queries

    rng = random.Random(11)
    words = ("alpha beta gamma delta epsilon zeta eta theta iota "
             "kappa lam mu nu xi omicron pi rho sigma tau").split()
    rows = []
    doc = 0
    for fam in range(30):
        base = " ".join(rng.choices(words, k=12))
        for v in range(rng.randint(1, 3)):
            doc += 1
            text = base
            # mutate: up to 6 single-char edits
            for _ in range(rng.randint(0, 6)):
                i = rng.randrange(len(text))
                text = text[:i] + rng.choice("abcxyz ") + text[i + 1:]
            rows.append((doc, text, rng.choice(["en", "de"])))
    sf = _lake(
        spark, tmp_path,
        documents=(rows, "doc_id long, text string, lang string"),
    )
    got = sorted(
        (r["doc_a"], r["doc_b"], r["edit_dist"])
        for r in queries()["fuzzy_prefix_pairs"](spark, sf).collect()
    )
    d = spark.read.parquet(f"{sf}/documents.parquet").select(
        "doc_id", "lang",
        F.substring(F.lower(F.col("text")), 1, 40).alias("pre"),
    )
    brute = sorted(
        (r["doc_a"], r["doc_b"], r["edit_dist"])
        for r in d.alias("x").join(
            d.alias("y"),
            (F.col("x.lang") == F.col("y.lang"))
            & (F.col("x.doc_id") < F.col("y.doc_id")),
        ).select(
            F.col("x.doc_id").alias("doc_a"),
            F.col("y.doc_id").alias("doc_b"),
            F.levenshtein("x.pre", "y.pre").alias("edit_dist"),
        ).filter(F.col("edit_dist") <= 10).collect()
    )
    assert got == brute and len(brute) > 0

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

"""Crafted behavioral tests for the round-10 operators.

Same pattern as the earlier round files: plant a distribution where
the operator's defining property is FORCED, write it as a tiny lake,
and run the REGISTERED query end-to-end.
"""

from __future__ import annotations

from __spark_entry__ import queries

QS = queries()


def _lake(spark, tmp_path, **tables):
    sf = str(tmp_path / "lake")
    for name, (rows, schema) in tables.items():
        spark.createDataFrame(rows, schema).write.mode(
            "overwrite"
        ).parquet(f"{sf}/{name}.parquet")
    return sf


# --------------- content_extract_payload_parse (real parsers) -------


def test_payload_parse_tiers_and_gates(spark, tmp_path):
    """Each doc_id%4 lane exercises its REAL parser, and the length
    gates route exactly: long text parses in its tier, short text
    falls through to the abstract ladder, sub-50-char text fails."""
    long_text = "tokens and words " * 20  # ~340 chars, > 200 gate
    short_text = "a short abstract over fifty characters long okay then"
    tiny = "way too short"
    rows = [
        (0, long_text.strip()),   # arxiv_html lane, parses
        (1, long_text.strip()),   # grobid_pdf lane, parses
        (2, long_text.strip()),   # regex_pdf lane, parses
        (3, long_text.strip()),   # abstract lane (no tier payload)
        (4, short_text),          # arxiv lane, gate fails -> abstract
        (7, tiny),                # abstract lane, 50-gate fails
    ]
    sf = _lake(
        spark, tmp_path, documents=(rows, "doc_id long, text string")
    )
    got = {
        r["doc_id"]: r
        for r in QS["content_extract_payload_parse"](spark, sf).collect()
    }
    assert [got[i]["method"] for i in (0, 1, 2, 3, 4, 7)] == [
        "arxiv_html", "grobid_pdf", "regex_pdf",
        "abstract_tldr", "abstract_tldr", "failed",
    ]
    assert [got[i]["quality"] for i in (0, 1, 2, 3, 4, 7)] == [
        "high", "high", "medium", "low", "low", "none",
    ]
    # parsed tiers emit the whitespace-squashed text; the repeated
    # phrase has single spaces already, so squash(text) == text here
    assert got[0]["content"] == long_text.strip()
    assert got[2]["content"] == long_text.strip()
    # fallback emits the RAW abstract, ungated by 200
    assert got[4]["content"] == short_text
    assert got[7]["content"] is None and got[7]["intro_length"] == 0
    assert all(
        got[i]["intro_length"] == len(got[i]["content"])
        for i in (0, 1, 2, 3, 4)
    )


def test_payload_parse_squashes_messy_whitespace(spark, tmp_path):
    """A parsed tier normalizes runs of whitespace to single spaces
    (the reference joins stripped paragraph strings); the fallback
    lane preserves the raw text byte-for-byte."""
    messy = ("word   with\tmessy   spacing " * 15).rstrip()
    rows = [(0, messy), (3, messy)]
    sf = _lake(
        spark, tmp_path, documents=(rows, "doc_id long, text string")
    )
    got = {
        r["doc_id"]: r
        for r in QS["content_extract_payload_parse"](spark, sf).collect()
    }
    assert got[0]["method"] == "arxiv_html"
    assert "  " not in got[0]["content"] and "\t" not in got[0]["content"]
    assert got[3]["content"] == messy  # raw fallback, untouched

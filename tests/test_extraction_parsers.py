"""Fixture tests for the pure tier parsers (SURVEY.md S11-S13).

Mirrors the reference's unit-test strategy for its content extractor
(reference tests/unit/test_content_extractor.py): each tier's parser
is driven with fixture HTML / TEI XML / PDF text covering the found,
fallback-scan, not-found, and length-gate branches, plus the full
cascade's provenance labels — no network, no Spark session needed
for the pure functions; one Spark test drives the mapInPandas twin.
"""

import pytest

from citeconnect_datapipeline_spark.operators.extraction_parsers import (
    extract_content_tiers,
    extract_intro_from_pdf_text,
    fallback_abstract_tldr,
    parse_arxiv_intro_html,
    parse_grobid_intro_tei,
)

LONG_PARA = (
    "This introduction paragraph carries enough words to clear the "
    "two hundred character acceptance gate used by every tier of the "
    "extraction cascade, so the parser under test returns it rather "
    "than falling through to the next strategy in the ladder."
)


# ---------------------------------------------------------------- arxiv html

def test_arxiv_html_prefers_s1_section():
    html = f"""
    <html><body>
      <section id="S0"><p>Abstract-ish preamble text.</p></section>
      <section id="S1">
        <h2>1 Introduction</h2>
        <p>{LONG_PARA}</p>
        <p>Second paragraph of the introduction.</p>
      </section>
      <section id="S2"><p>Methods text.</p></section>
    </body></html>
    """
    out = parse_arxiv_intro_html(html)
    assert out is not None
    assert out.startswith("This introduction paragraph")
    assert "\n\n" in out  # paragraphs joined with blank lines
    assert "Methods text" not in out
    assert "Second paragraph of the introduction." in out


def test_arxiv_html_falls_back_to_introduction_heading_scan():
    # no S1 id: the first section whose leading text says
    # "introduction" wins (reference scans get_text()[:50])
    html = f"""
    <html><body>
      <section id="abs"><p>Some abstract text first.</p></section>
      <section id="intro-x">
        <h2>Introduction</h2>
        <p>{LONG_PARA}</p>
      </section>
    </body></html>
    """
    out = parse_arxiv_intro_html(html)
    assert out is not None and LONG_PARA in out


def test_arxiv_html_nested_subsection_paragraphs_included():
    html = f"""
    <section id="S1">
      <p>{LONG_PARA}</p>
      <section id="S1.1"><p>Nested motivation paragraph.</p></section>
    </section>
    """
    out = parse_arxiv_intro_html(html)
    assert out is not None
    assert "Nested motivation paragraph." in out


def test_arxiv_html_not_found_and_short_gate():
    assert parse_arxiv_intro_html("<p>No sections at all</p>") is None
    assert parse_arxiv_intro_html(None) is None
    short = "<section id='S1'><p>Too short.</p></section>"
    assert parse_arxiv_intro_html(short) is None


def test_arxiv_html_entity_decoding_and_whitespace_squash():
    para = "Entities &amp; spacing   are\n normalized " + "x" * 220
    html = f"<section id='S1'><p>{para}</p></section>"
    out = parse_arxiv_intro_html(html)
    assert out is not None
    assert out.startswith("Entities & spacing are normalized")


# ----------------------------------------------------------------- tei xml

TEI_NS = 'xmlns="http://www.tei-c.org/ns/1.0"'


def _tei(body: str, ns: str = TEI_NS) -> str:
    return f'<?xml version="1.0"?><TEI {ns}><text><body>{body}</body></text></TEI>'


def test_grobid_tei_namespaced_introduction_div():
    xml = _tei(
        f'<div type="introduction"><head>1. Introduction</head>'
        f"<p>{LONG_PARA}</p><p>Second TEI paragraph.</p></div>"
        f'<div type="method"><p>Method text.</p></div>'
    )
    out = parse_grobid_intro_tei(xml)
    assert out is not None
    assert LONG_PARA in out and "Second TEI paragraph." in out
    assert "Method text" not in out
    assert "1. Introduction" not in out  # head element is not a <p>


def test_grobid_tei_unnamespaced_and_missing_div():
    xml = _tei(f'<div type="introduction"><p>{LONG_PARA}</p></div>', ns="")
    assert parse_grobid_intro_tei(xml) is not None
    assert parse_grobid_intro_tei(_tei("<div><p>untyped</p></div>")) is None
    assert parse_grobid_intro_tei("not xml <<<") is None
    assert parse_grobid_intro_tei(None) is None


def test_grobid_tei_short_gate():
    xml = _tei('<div type="introduction"><p>Too short.</p></div>')
    assert parse_grobid_intro_tei(xml) is None


# ----------------------------------------------------------------- pdf text

def test_pdf_regex_numbered_heading_and_numbered_end():
    text = (
        "Title page\n\n\nAbstract blah\n"
        "1. Introduction\n" + LONG_PARA + "\n"
        "2. Methods\nWe did things."
    )
    out = extract_intro_from_pdf_text(text)
    assert out is not None
    assert out == " ".join(LONG_PARA.split())
    assert "We did things" not in out


def test_pdf_regex_plain_heading_references_end():
    text = "Introduction\n" + LONG_PARA + "\n References\n[1] cite"
    out = extract_intro_from_pdf_text(text)
    assert out is not None and "[1]" not in out


def test_pdf_regex_unbounded_caps_at_10000():
    text = "INTRODUCTION\n" + ("word " * 4000)  # 20k chars, no end marker
    out = extract_intro_from_pdf_text(text)
    assert out is not None
    assert len(out) <= 10000


def test_pdf_regex_gates_and_not_found():
    assert extract_intro_from_pdf_text("No heading here at all") is None
    assert extract_intro_from_pdf_text(None) is None
    # found but too short
    assert extract_intro_from_pdf_text("1. Introduction\nshort") is None
    # found but too long even after the cut (>= 15000)
    huge = "1. Introduction\n" + ("y" * 20000) + "\nReferences\n"
    assert extract_intro_from_pdf_text(huge) is None


# ----------------------------------------------------------------- fallback

def test_fallback_ladder_branches():
    abstract = "An abstract comfortably longer than the fifty char gate."
    assert fallback_abstract_tldr(abstract, None) == (
        abstract, "abstract_tldr", "low",
    )
    content, method, quality = fallback_abstract_tldr(abstract, "tl;dr")
    assert content.endswith("\n\nSummary: tl;dr") and method == "abstract_tldr"
    tldr = "A tldr that is itself longer than the fifty character gate."
    assert fallback_abstract_tldr("short", tldr) == (tldr, "tldr_only", "low")
    assert fallback_abstract_tldr("short", "also short") == (
        None, "failed", "none",
    )


# ------------------------------------------------------------------ cascade

def test_cascade_provenance_order():
    html = f"<section id='S1'><p>{LONG_PARA}</p></section>"
    tei = _tei(f'<div type="introduction"><p>TEI {LONG_PARA}</p></div>')
    pdftext = "1. Introduction\nPDF " + LONG_PARA + "\nReferences\n"
    abstract = "An abstract comfortably longer than the fifty char gate."

    assert extract_content_tiers(html, tei, pdftext, abstract)[1:] == (
        "arxiv_html", "high",
    )
    assert extract_content_tiers(None, tei, pdftext, abstract)[1:] == (
        "grobid_pdf", "high",
    )
    assert extract_content_tiers(None, None, pdftext, abstract)[1:] == (
        "regex_pdf", "medium",
    )
    assert extract_content_tiers(None, None, None, abstract)[1:] == (
        "abstract_tldr", "low",
    )
    assert extract_content_tiers(None, None, None, None) == (
        None, "failed", "none",
    )
    # a tier whose payload FAILS its gate falls through, same as absent
    assert extract_content_tiers(
        "<section id='S1'><p>tiny</p></section>", None, pdftext, abstract
    )[1:] == ("regex_pdf", "medium")


# ----------------------------------------------------------------- spark twin

def test_extract_from_payloads_spark(spark):
    from citeconnect_datapipeline_spark import api

    html = f"<section id='S1'><p>{LONG_PARA}</p></section>"
    tei = _tei(f'<div type="introduction"><p>TEI {LONG_PARA}</p></div>')
    pdftext = "1. Introduction\nPDF " + LONG_PARA + "\nReferences\n"
    abstract = "An abstract comfortably longer than the fifty char gate."
    payloads = spark.createDataFrame(
        [
            (1, html, None, None, abstract, None),
            (2, None, tei, None, abstract, None),
            (3, None, None, pdftext, abstract, None),
            (4, None, None, None, abstract, "tl;dr"),
            (5, None, None, None, None, None),
        ],
        "doc_id long, arxiv_html string, grobid_tei string,"
        " pdf_text string, abstract string, tldr string",
    )
    got = {
        r["doc_id"]: r
        for r in api.extraction.extract_from_payloads(payloads).collect()
    }
    assert [got[i]["method"] for i in (1, 2, 3, 4, 5)] == [
        "arxiv_html", "grobid_pdf", "regex_pdf", "abstract_tldr", "failed",
    ]
    assert [got[i]["quality"] for i in (1, 2, 3, 4, 5)] == [
        "high", "high", "medium", "low", "none",
    ]
    assert got[1]["intro_length"] == len(got[1]["content"]) > 200
    assert got[5]["content"] is None and got[5]["intro_length"] == 0
    # missing payload columns are treated as absent tiers
    only_abs = spark.createDataFrame(
        [(9, abstract)], "doc_id long, abstract string"
    )
    row = api.extraction.extract_from_payloads(only_abs).collect()[0]
    assert row["method"] == "abstract_tldr"


# ----------------------------------------------- round-10 review fixes

def test_arxiv_html_implicit_paragraph_close():
    """Real ArXiv pages omit </p>; a new <p> or the closing
    </section> must flush the open paragraph, as a DOM parser
    implies (round-10 review #1)."""
    html = (
        f"<section id='S1'><p>{LONG_PARA}<p>second implicit paragraph"
        f"</section>"
    )
    out = parse_arxiv_intro_html(html)
    assert out is not None
    assert "second implicit paragraph" in out
    assert out.count("\n\n") == 1  # two distinct paragraphs


def test_pdf_regex_earliest_end_marker_wins():
    """References BEFORE the next numbered section must cut the
    intro — earliest match position, not first matching pattern
    (round-10 review #2; deliberate fix over the reference's
    pattern-priority loop)."""
    text = (
        "1. Introduction\n" + LONG_PARA + "\n"
        "References\n[1] someone 1999\n"
        "2. Methods\nwe did things"
    )
    out = extract_intro_from_pdf_text(text)
    assert out is not None
    assert "[1]" not in out and "someone" not in out


def test_gate_boundary_matches_reference_strict():
    """Exactly-200-char content fails every tier gate (reference is
    strict > 200), in BOTH the real parsers and the fake cascade's
    constants (round-10 review #3)."""
    exactly_200 = "x" * 200
    html = f"<section id='S1'><p>{exactly_200}</p></section>"
    assert parse_arxiv_intro_html(html) is None
    assert parse_arxiv_intro_html(
        f"<section id='S1'><p>{'x' * 201}</p></section>"
    ) is not None
    pdf = "1. Introduction\n" + exactly_200 + "\nReferences\n"
    assert extract_intro_from_pdf_text(pdf) is None

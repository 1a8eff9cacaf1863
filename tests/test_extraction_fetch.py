"""Fetch-ladder routing tests (r10 verdict #3): the reference's
404/timeout/service-down ladder replayed through recorded fixtures
injected at the same HTTP-session seam the real deployment would use —
asserting tier fall-through on FETCH failure, not just parse failure.
"""

from __future__ import annotations

from citeconnect_datapipeline_spark.operators.extraction_fetch import (
    FixtureTransport,
    TieredContentFetcher,
    extract_with_fetch_ladder,
)

PARA = "This introduction studies tokens and words in context. " * 5
ARXIV_HTML = (
    '<html><body><section id="S1"><h2>1 Introduction</h2>'
    f"<p>{PARA}</p></section></body></html>"
)
TEI = (
    '<TEI xmlns="http://www.tei-c.org/ns/1.0"><text><body>'
    f'<div type="introduction"><p>{PARA}</p></div>'
    "</body></text></TEI>"
)
PDF_TEXT = f"1. Introduction\n{PARA}\nReferences\n[1] et al."

AX = "https://arxiv.org/html/2401.0001"
PDF = "https://host.example/paper.pdf"


def _paper(arxiv=True, pdf=True):
    p = {
        "abstract": (
            "An abstract comfortably over the fifty character gate, yes."
        )
    }
    if arxiv:
        p["externalIds"] = {"ArXiv": "2401.0001"}
    if pdf:
        p["openAccessPdf"] = {"url": PDF}
    return p


def test_arxiv_200_wins_and_no_pdf_fetch_happens():
    t = FixtureTransport({AX: (200, ARXIV_HTML), PDF: (200, TEI)})
    content, method, quality = TieredContentFetcher(t).extract_content(
        _paper()
    )
    assert method == "arxiv_html" and quality == "high"
    assert content.startswith("This introduction studies")
    assert t.calls == [AX]  # lower tiers never fetched


def test_arxiv_404_falls_to_grobid():
    t = FixtureTransport({AX: (404, ""), PDF: (200, TEI)})
    content, method, quality = TieredContentFetcher(t).extract_content(
        _paper()
    )
    assert method == "grobid_pdf" and quality == "high"
    assert t.calls == [AX, PDF]  # the 404 routed to the next tier


def test_grobid_down_skips_tier_entirely():
    """Service-down probe (reference :31-44): the GROBID tier is never
    consulted — the PDF is fetched ONCE, by the regex tier."""
    t = FixtureTransport({AX: (404, ""), PDF: (200, PDF_TEXT)})
    content, method, quality = TieredContentFetcher(
        t, grobid_up=False
    ).extract_content(_paper())
    assert method == "regex_pdf" and quality == "medium"
    assert t.calls == [AX, PDF]


def test_pdf_download_timeout_in_grobid_falls_to_regex():
    """The reference catches requests Timeout in the GROBID tier
    (:115-116) and falls through; the regex tier re-fetches."""
    calls = {"n": 0}

    class FlakyTransport(FixtureTransport):
        def __call__(self, url):
            if url == PDF and calls["n"] == 0:
                calls["n"] += 1
                self.calls.append(url)
                raise __import__(
                    "citeconnect_datapipeline_spark.operators."
                    "extraction_fetch",
                    fromlist=["FetchTimeout"],
                ).FetchTimeout(url)
            return super().__call__(url)

    t = FlakyTransport({AX: (404, ""), PDF: (200, PDF_TEXT)})
    # grobid would parse TEI, but its download times out -> regex tier
    content, method, quality = TieredContentFetcher(t).extract_content(
        _paper()
    )
    assert method == "regex_pdf"
    assert t.calls == [AX, PDF, PDF]  # timeout, then the re-fetch


def test_pdf_404_everywhere_falls_to_abstract():
    t = FixtureTransport({AX: (404, "")})  # PDF url unknown -> 404
    content, method, quality = TieredContentFetcher(t).extract_content(
        _paper()
    )
    assert method == "abstract_tldr" and quality == "low"
    # arxiv once, grobid pdf once, regex pdf once: 3 fetches, all dead
    assert t.calls == [AX, PDF, PDF]


def test_fetch_ok_parse_failure_also_falls_through():
    """A 200 whose body does NOT parse degrades the same way a fetch
    failure does: the arxiv body has no S1/introduction section, and
    the PDF url serves page text that the GROBID TEI parse rejects —
    so the regex tier (which WANTS page text) is the one that wins."""
    t = FixtureTransport(
        {AX: (200, "<html><body><p>no sections</p></body></html>"),
         PDF: (200, PDF_TEXT)}
    )
    content, method, quality = TieredContentFetcher(t).extract_content(
        _paper()
    )
    assert method == "regex_pdf"
    assert t.calls == [AX, PDF, PDF]


def test_no_arxiv_id_skips_tier_precondition():
    t = FixtureTransport({PDF: (200, TEI)})
    content, method, quality = TieredContentFetcher(t).extract_content(
        _paper(arxiv=False)
    )
    assert method == "grobid_pdf"
    assert t.calls == [PDF]


def test_tldr_only_and_failed_ladder():
    t = FixtureTransport({})
    f = TieredContentFetcher(t)
    c, m, q = f.extract_content(
        {"tldr": {"text": "a tldr comfortably over the fifty character "
                          "gate, truly so"}}
    )
    assert (m, q) == ("tldr_only", "low")
    c, m, q = f.extract_content({"abstract": "too short"})
    assert (c, m, q) == (None, "failed", "none")


# ------------------------- Spark stage e2e --------------------------


def test_spark_fetch_ladder_stage(spark):
    """One mapInPandas stage routes every row like the reference's
    per-paper ladder: per-row fetch failures degrade to lower tiers
    inside the worker instead of failing the task. The factory and
    its fixtures live in the PACKAGE (demo_fixture_fetcher) so they
    pickle onto executors."""
    from citeconnect_datapipeline_spark.operators.extraction_fetch import (
        demo_fixture_fetcher,
    )
    rows = [
        (1, "ok", None, None, None),  # arxiv 200 -> arxiv_html
        (2, "dead", "https://pdfs/tei.pdf", None, None),  # 404 -> grobid
        (3, None, "https://pdfs/timeout.pdf", "An abstract well over "
         "fifty characters long for the fallback.", None),  # timeouts
        (4, None, None, None, "a tldr safely over the fifty character "
         "gate, yes indeed"),  # no sources at all
    ]
    papers = spark.createDataFrame(
        rows,
        "doc_id long, arxiv_id string, pdf_url string, "
        "abstract string, tldr string",
    )
    got = {
        r["doc_id"]: r
        for r in extract_with_fetch_ladder(
            papers, demo_fixture_fetcher
        ).collect()
    }
    assert got[1]["method"] == "arxiv_html"
    assert got[2]["method"] == "grobid_pdf"
    assert got[3]["method"] == "abstract_tldr"  # both PDF tiers timed out
    assert got[4]["method"] == "tldr_only"
    assert got[1]["quality"] == "high" and got[3]["quality"] == "low"

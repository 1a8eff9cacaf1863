"""The fetch half of the S11-S13 extraction tiers, behind an
injectable HTTP transport.

The PARSERS (``extraction_parsers.py``) are real stdlib code; this
module adds the reference's FETCH ladder around them — per-tier HTTP
gets, status checks, timeout handling, and fall-through on fetch
failure, mirroring ``content_extractor.py``:

- ArXiv HTML tier (reference :46-77): GET ``arxiv.org/html/<id>``;
  any non-200 or transport error falls through, a 200 body goes to
  the HTML intro parser.
- GROBID tier (:79-121): skipped entirely when the GROBID service is
  down (:31-44 connect probe); otherwise GET the PDF (non-200/timeout
  falls through), hand the bytes to the GROBID processor, parse the
  TEI. A download timeout is caught exactly like the reference's
  ``requests.exceptions.Timeout`` handler (:115-116).
- PDF-regex tier (:123-179): GET the PDF again, convert to page text,
  regex-extract the introduction.
- Fallback ladder (:181-197): abstract (+TLDR) / tldr_only / failed.

In production the transport is a requests session and the converters
are GROBID / PyMuPDF; in this container they are recorded fixtures
(``FixtureTransport``) and identity converters — the LADDER (status
routing, exception routing, tier ordering, gate composition) is the
real code under test, exercised per tier by
``tests/test_extraction_fetch.py``.

Lives in the package (not tests/) so transports pickle cleanly into
Spark executors.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Optional, Tuple

from pyspark.sql import DataFrame
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
)

from .extraction_parsers import (
    extract_intro_from_pdf_text,
    fallback_abstract_tldr,
    parse_arxiv_intro_html,
    parse_grobid_intro_tei,
)


class FetchTimeout(Exception):
    """Transport-level timeout (requests.exceptions.Timeout stand-in)."""


# transport: url -> (status_code, body); raises FetchTimeout on timeout
FetchTransport = Callable[[str], Tuple[int, str]]


class FixtureTransport:
    """Recorded-fixture HTTP double.

    ``fixtures`` maps url -> (status, body); a body of the sentinel
    ``TIMEOUT`` raises ``FetchTimeout`` instead (a scripted hang).
    Unknown urls are 404s, like a dead link. Every call is recorded
    so tests can assert WHICH tiers actually fetched."""

    TIMEOUT = "__timeout__"

    def __init__(self, fixtures: dict):
        self.fixtures = dict(fixtures)
        self.calls: list[str] = []

    def __call__(self, url: str) -> Tuple[int, str]:
        self.calls.append(url)
        status, body = self.fixtures.get(url, (404, ""))
        if body == self.TIMEOUT:
            raise FetchTimeout(url)
        return status, body


class TieredContentFetcher:
    """The reference's extraction ladder with the network injected.

    ``grobid_up`` models the connect probe (content_extractor.py:31-44):
    when the GROBID server is unreachable at startup the whole tier is
    skipped, not retried per paper. ``grobid_process`` converts PDF
    bytes/text to TEI XML (the ``process_pdf`` call, :96); ``pdf_text``
    converts them to page text (the PyMuPDF read, :133-137). Both
    default to identity — fixtures store the converted form directly."""

    def __init__(
        self,
        transport: FetchTransport,
        grobid_up: bool = True,
        grobid_process: Callable[[str], Optional[str]] = lambda b: b,
        pdf_text: Callable[[str], Optional[str]] = lambda b: b,
    ):
        self.transport = transport
        self.grobid_up = grobid_up
        self.grobid_process = grobid_process
        self.pdf_text = pdf_text

    def fetch_arxiv_html(self, arxiv_id: str) -> Optional[str]:
        """ArXiv tier (reference :46-77): non-200 -> None; parse
        failures and transport errors also -> None (broad except,
        :74-75)."""
        try:
            status, body = self.transport(
                f"https://arxiv.org/html/{arxiv_id}"
            )
            if status != 200:
                return None
            return parse_arxiv_intro_html(body)
        except Exception:
            return None

    def fetch_grobid(self, pdf_url: str) -> Optional[str]:
        """GROBID tier (:79-121): service-down skip, PDF download with
        non-200/timeout fall-through, TEI parse."""
        if not self.grobid_up:
            return None
        try:
            status, body = self.transport(pdf_url)
            if status != 200:
                return None
            xml = self.grobid_process(body)
            if not xml:
                return None
            return parse_grobid_intro_tei(xml)
        except FetchTimeout:
            # the reference logs 'GROBID PDF download timeout' and
            # falls through (:115-116)
            return None
        except Exception:
            return None

    def fetch_regex(self, pdf_url: str) -> Optional[str]:
        """PDF-regex tier (:123-179): its OWN download (the reference
        re-fetches rather than reusing GROBID's), then the regex
        extractor."""
        try:
            status, body = self.transport(pdf_url)
            if status != 200:
                return None
            text = self.pdf_text(body)
            if not text:
                return None
            return extract_intro_from_pdf_text(text)
        except Exception:
            return None

    def extract_content(
        self, paper: dict
    ) -> Tuple[Optional[str], str, str]:
        """Priority ladder (:199-229): arxiv (only with an ArXiv
        external id) -> grobid (only with a pdf url) -> regex (same
        url) -> abstract fallback. A tier is consulted only when its
        PRECONDITION holds, and any fetch OR parse failure falls to
        the next tier."""
        ext_ids = paper.get("externalIds") or {}
        if isinstance(ext_ids, dict) and ext_ids.get("ArXiv"):
            intro = self.fetch_arxiv_html(ext_ids["ArXiv"])
            if intro:
                return intro, "arxiv_html", "high"
        pdf_dict = paper.get("openAccessPdf")
        pdf_url = (
            pdf_dict.get("url") if isinstance(pdf_dict, dict) else None
        )
        if pdf_url:
            intro = self.fetch_grobid(pdf_url)
            if intro:
                return intro, "grobid_pdf", "high"
        if pdf_url:
            intro = self.fetch_regex(pdf_url)
            if intro:
                return intro, "regex_pdf", "medium"
        tldr = paper.get("tldr")
        tldr_text = tldr.get("text") if isinstance(tldr, dict) else None
        return fallback_abstract_tldr(paper.get("abstract"), tldr_text)


# Recorded fixtures: one genuine payload per tier (public-shaped
# content, shipped in-package so executor-side factories pickle —
# test-module classes don't import on Spark workers).
_DEMO_PARA = (
    "This introduction studies tokens and words in context. " * 5
)
DEMO_FIXTURES = {
    "https://arxiv.org/html/ok": (
        200,
        '<html><body><section id="S1"><h2>1 Introduction</h2>'
        f"<p>{_DEMO_PARA}</p></section></body></html>",
    ),
    "https://arxiv.org/html/dead": (404, ""),
    "https://pdfs/tei.pdf": (
        200,
        '<TEI xmlns="http://www.tei-c.org/ns/1.0"><text><body>'
        f'<div type="introduction"><p>{_DEMO_PARA}</p></div>'
        "</body></text></TEI>",
    ),
    "https://pdfs/pages.pdf": (
        200,
        f"1. Introduction\n{_DEMO_PARA}\nReferences\n[1] et al.",
    ),
    "https://pdfs/timeout.pdf": (200, FixtureTransport.TIMEOUT),
}


def demo_fixture_fetcher() -> TieredContentFetcher:
    """Picklable factory over the recorded fixtures — the in-container
    stand-in for a requests-session factory."""
    return TieredContentFetcher(FixtureTransport(DEMO_FIXTURES))


_FETCH_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("content", StringType()),
        StructField("method", StringType()),
        StructField("quality", StringType()),
    ]
)


def extract_with_fetch_ladder(
    papers: DataFrame,
    fetcher_factory: Callable[[], TieredContentFetcher],
) -> DataFrame:
    """Run the full fetch+parse ladder as ONE ``mapInPandas`` stage.

    ``papers`` needs ``doc_id`` plus any of ``arxiv_id``, ``pdf_url``,
    ``abstract``, ``tldr`` (missing columns read as null). One fetcher
    per TASK (the reference holds one requests session + one GROBID
    client per process, :24-44) via the shared payload-row plumbing's
    ``setup`` hook; rows within a partition share it — the same
    connection-reuse shape a 1000-executor run needs, with per-row
    failures degrading to lower tiers instead of failing the task."""
    from .extraction import map_optional_payload_rows

    def fetch_row(fetcher, doc_id, vals):
        paper = {
            "externalIds": (
                {"ArXiv": vals["arxiv_id"]} if vals["arxiv_id"] else {}
            ),
            "openAccessPdf": (
                {"url": vals["pdf_url"]} if vals["pdf_url"] else None
            ),
            "abstract": vals["abstract"],
            "tldr": (
                {"text": vals["tldr"]} if vals["tldr"] else None
            ),
        }
        content, method, quality = fetcher.extract_content(paper)
        return doc_id, content, method, quality

    return map_optional_payload_rows(
        papers,
        ("arxiv_id", "pdf_url", "abstract", "tldr"),
        _FETCH_SCHEMA,
        fetch_row,
        setup=fetcher_factory,
    )

"""Pure tier parsers for 4-tier content extraction (SURVEY.md S11-S13).

The reference's extraction tiers each wrap a network fetch around a
PURE parse step (reference src/DataPipeline/Ingestion/
content_extractor.py:46-219): an ArXiv-HTML section parse (:57-70), a
GROBID TEI-XML introduction-div parse (:103-110), a regex scan over
raw PDF text (:139-176), and an abstract+tldr fallback ladder
(:181-197). The fetches can't run in this container, but the parsers
can — this module re-implements them as standalone functions of the
fetched payload, so the ``mapInPandas`` tier stage in
``operators/extraction.py`` can swap its deterministic fakes for real
parsing the moment a payload column (or an HTTP session) is present,
with nothing downstream changing.

Implementation is stdlib-only (``html.parser`` / ``xml.etree``; the
container has no bs4/lxml). Semantics mirrored from the reference:

- ArXiv HTML: prefer ``<section id="S1">``; else the first section
  whose leading text mentions "introduction"; join its ``<p>``
  paragraphs with blank lines; accept only if > 200 chars.
- GROBID TEI: ``<div type="introduction">`` (TEI namespace or not),
  paragraphs joined with blank lines, > 200 chars.
- PDF text: find the introduction heading (numbered, plain, or
  all-caps), cut at the next section heading / References /
  Discussion (else cap at 10 000 chars), collapse whitespace, accept
  only 200 < len < 15 000.
- Fallback: abstract (+ optional tldr summary line) when > 50 chars,
  else tldr alone, else a failed marker.

Every function is deterministic and side-effect free, so the tier
cascade built on them stays testable (fixture HTML/XML/PDF-text unit
tests in tests/test_extraction_parsers.py) and replayable by the
DuckDB oracle when driven with deterministic payloads.
"""

from __future__ import annotations

import re
from html.parser import HTMLParser
from typing import Optional, Tuple
from xml.etree import ElementTree

# Length gates (reference content_extractor.py:70,110,172,188).
HTML_MIN_LEN = 200
PDF_MIN_LEN, PDF_MAX_LEN = 200, 15000
PDF_UNBOUNDED_CAP = 10000
FALLBACK_MIN_LEN = 50


def _squash(text: str) -> str:
    """Collapse internal whitespace and strip — the normalized form
    of one paragraph's text content.

    Deliberate readability divergence from the reference
    (content_extractor.py:64 ``get_text(strip=True)``), which
    concatenates stripped inline fragments with NO separator
    ('<p>foo<b>bar</b></p>' -> 'foobar'); we join with single spaces
    ('foo bar'), which also shifts the first-50-chars heading scan
    window for sections with inline markup (r10 ADVICE #3). Words
    glued across tags are a parse artifact, not document text."""
    return " ".join(text.split())


class _SectionCollector(HTMLParser):
    """Minimal DOM-free section/paragraph collector.

    Records, per ``<section>`` (including nested ones), the section's
    id, its full text, and the normalized text of every descendant
    ``<p>`` — exactly the shape the ArXiv tier reads. Paragraph text
    inside nested sections is attributed to every open ancestor, so
    an ``id="S1"`` section containing subsections yields all its
    descendant paragraphs, matching a recursive find_all.
    """

    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.sections: list[dict] = []
        self._open_sections: list[dict] = []
        self._in_p = False
        self._p_buf: list[str] = []

    def _flush_paragraph(self) -> None:
        if not self._in_p:
            return
        self._in_p = False
        para = _squash("".join(self._p_buf))
        self._p_buf = []
        if para:
            for rec in self._open_sections:
                rec["paras"].append(para)

    def handle_starttag(self, tag, attrs):
        if tag == "section":
            self._flush_paragraph()
            rec = {
                "id": dict(attrs).get("id"),
                "paras": [],
                "text": [],
            }
            self.sections.append(rec)
            self._open_sections.append(rec)
        elif tag == "p" and self._open_sections:
            # HTML paragraphs close implicitly: a new <p> (and, below,
            # a closing </section>) ends the open one — real ArXiv
            # pages routinely omit </p>, and a DOM parser implies it
            self._flush_paragraph()
            self._in_p = True

    def handle_endtag(self, tag):
        if tag == "section" and self._open_sections:
            self._flush_paragraph()
            self._open_sections.pop()
        elif tag == "p":
            self._flush_paragraph()

    def handle_data(self, data):
        if self._open_sections:
            for rec in self._open_sections:
                rec["text"].append(data)
            if self._in_p:
                self._p_buf.append(data)


def parse_arxiv_intro_html(html: str) -> Optional[str]:
    """Parse an introduction out of an ArXiv HTML page.

    Reference behavior (content_extractor.py:57-70): prefer the
    section with ``id="S1"`` (ArXiv's numbering for the first
    section); otherwise the first section whose leading text mentions
    "introduction"; join its paragraphs with blank lines and accept
    only when longer than 200 characters.
    """
    if not html:
        return None
    collector = _SectionCollector()
    try:
        collector.feed(html)
        collector.close()
    except Exception:
        return None

    target = None
    for rec in collector.sections:
        if rec["id"] == "S1":
            target = rec
            break
    if target is None:
        for rec in collector.sections:
            head = _squash("".join(rec["text"])).lower()[:50]
            if "introduction" in head:
                target = rec
                break
    if target is None:
        return None
    text = "\n\n".join(target["paras"])
    return text if len(text) > HTML_MIN_LEN else None


def _local(tag: str) -> str:
    """Element local name, namespace stripped."""
    return tag.rsplit("}", 1)[-1]


def parse_grobid_intro_tei(xml: str) -> Optional[str]:
    """Parse the introduction div out of a GROBID TEI document.

    Reference behavior (content_extractor.py:103-110): the first
    ``<div type="introduction">`` anywhere in the TEI body; its
    ``<p>`` descendants joined with blank lines; > 200 chars. Works
    with or without the TEI namespace.
    """
    if not xml:
        return None
    try:
        root = ElementTree.fromstring(xml)
    except ElementTree.ParseError:
        return None
    for el in root.iter():
        if _local(el.tag) == "div" and el.get("type") == "introduction":
            paras = [
                _squash("".join(p.itertext()))
                for p in el.iter()
                if _local(p.tag) == "p"
            ]
            text = "\n\n".join(p for p in paras if p)
            return text if len(text) > HTML_MIN_LEN else None
    return None


_PDF_START_PATTERNS = (
    r"(?:^|\n)1\.\s*Introduction",
    r"(?:^|\n)Introduction",
    r"(?:^|\n)INTRODUCTION",
)
_PDF_END_PATTERNS = (
    r"\n\s*2\.\s*(Method|Background|Related|Result)",
    r"\n\s*References",
    r"\n\s*Discussion",
)


def extract_intro_from_pdf_text(text: str) -> Optional[str]:
    """Regex-extract the introduction from raw PDF page text.

    Reference behavior (content_extractor.py:139-176): collapse blank
    lines, locate the introduction heading by the first matching
    start pattern (numbered beats bare beats all-caps, all
    case-insensitive), cut at the first end pattern (next numbered
    section, References, or Discussion) or cap at 10 000 chars,
    collapse whitespace, and accept only 200 < len < 15 000.
    """
    if not text:
        return None
    text = re.sub(r"\n\s*\n", "\n", text)

    intro_start = None
    for p in _PDF_START_PATTERNS:
        m = re.search(p, text, re.IGNORECASE)
        if m:
            intro_start = m.end()
            break
    if intro_start is None:
        return None

    remaining = text[intro_start:]
    # EARLIEST end marker wins (deliberate fix over the reference's
    # first-pattern-wins loop at content_extractor.py:157-167, which
    # includes the bibliography when References precedes the next
    # numbered section in the page text). Deliberate too: a marker at
    # position 0 means the "introduction" is EMPTY, so we cut to ""
    # and fall through to the abstract ladder — the reference's falsy
    # `if end_pos` check (:169) would instead keep the first 10 000
    # chars, i.e. the very bibliography the end marker flagged
    # (r10 ADVICE #2).
    ends = [
        m.start()
        for p in _PDF_END_PATTERNS
        for m in [re.search(p, remaining, re.IGNORECASE)]
        if m
    ]
    end_pos = min(ends) if ends else None

    intro = remaining[:end_pos] if end_pos is not None else (
        remaining[:PDF_UNBOUNDED_CAP]
    )
    intro = _squash(intro)
    if PDF_MIN_LEN < len(intro) < PDF_MAX_LEN:
        return intro
    return None


def fallback_abstract_tldr(
    abstract: Optional[str], tldr: Optional[str]
) -> Tuple[Optional[str], str, str]:
    """Tier-4 fallback ladder (content_extractor.py:181-197):
    abstract (+ "Summary:" line when a tldr exists) when the abstract
    clears 50 chars, else the tldr alone when IT clears 50 chars,
    else the failed marker. Returns (content, method, quality)."""
    if abstract and len(abstract) > FALLBACK_MIN_LEN:
        content = abstract + (f"\n\nSummary: {tldr}" if tldr else "")
        return content, "abstract_tldr", "low"
    if tldr and len(tldr) > FALLBACK_MIN_LEN:
        return tldr, "tldr_only", "low"
    return None, "failed", "none"


def extract_content_tiers(
    arxiv_html: Optional[str],
    grobid_tei: Optional[str],
    pdf_text: Optional[str],
    abstract: Optional[str],
    tldr: Optional[str] = None,
) -> Tuple[Optional[str], str, str]:
    """The full 4-tier cascade over fetched payloads — the pure core
    of the reference's ``extract_content`` (content_extractor.py:
    199-218): first parser to produce gated content wins, with the
    same (method, quality) provenance labels."""
    intro = parse_arxiv_intro_html(arxiv_html) if arxiv_html else None
    if intro:
        return intro, "arxiv_html", "high"
    intro = parse_grobid_intro_tei(grobid_tei) if grobid_tei else None
    if intro:
        return intro, "grobid_pdf", "high"
    intro = extract_intro_from_pdf_text(pdf_text) if pdf_text else None
    if intro:
        return intro, "regex_pdf", "medium"
    return fallback_abstract_tldr(abstract, tldr)

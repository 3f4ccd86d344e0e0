"""Web-scrape sectioning — SURVEY.md §2.1 S7 (parse core only).

The reference fetches a URL, strips nav/ads/scripts, groups text under
<section>/heading boundaries, slugifies titles and writes per-section txt
files (embed/webscrape.py:44-143). The *fetch* is an I/O adapter (driver
side, not reproduced here — no network in this environment); the parse +
section-grouping + slugify logic is the data operation, implemented with
the stdlib parser so it is testable hermetically. `sections_to_df` lifts
the result into a DataFrame for the chunk pipeline.
"""

from __future__ import annotations

import re
import unicodedata
from html.parser import HTMLParser

from pyspark.sql import DataFrame, SparkSession

_STRIP_TAGS = {"script", "style", "nav", "header", "footer", "aside", "noscript"}
_HEADINGS = {"h1", "h2", "h3", "h4", "h5", "h6"}


def slugify(title: str, max_len: int = 60) -> str:
    """NFKD slugify (webscrape.py:105-110): ascii-fold, lowercase,
    non-alnum → '-', collapsed."""
    folded = (
        unicodedata.normalize("NFKD", title or "").encode("ascii", "ignore").decode()
    )
    slug = re.sub(r"[^a-z0-9]+", "-", folded.lower()).strip("-")
    return slug[:max_len] or "section"


def normalize_ws(text: str) -> str:
    """NFKC + whitespace collapse (webscrape.py:44-48)."""
    return re.sub(r"\s+", " ", unicodedata.normalize("NFKC", text or "")).strip()


class _SectionParser(HTMLParser):
    def __init__(self) -> None:
        super().__init__()
        self._skip_depth = 0
        self._in_heading: str | None = None
        self._heading_buf: list[str] = []
        self.sections: list[dict] = [{"title": "intro", "parts": []}]

    def handle_starttag(self, tag, attrs):
        if tag in _STRIP_TAGS:
            self._skip_depth += 1
        elif tag in _HEADINGS and not self._skip_depth:
            self._in_heading = tag
            self._heading_buf = []
        elif tag == "section" and not self._skip_depth:
            self.sections.append({"title": "section", "parts": []})

    def handle_endtag(self, tag):
        if tag in _STRIP_TAGS and self._skip_depth:
            self._skip_depth -= 1
        elif tag in _HEADINGS and self._in_heading:
            title = normalize_ws(" ".join(self._heading_buf)) or "section"
            self.sections.append({"title": title, "parts": []})
            self._in_heading = None

    def handle_data(self, data):
        if self._skip_depth:
            return
        if self._in_heading is not None:
            self._heading_buf.append(data)
        else:
            self.sections[-1]["parts"].append(data)


def extract_sections(html: str) -> list[dict]:
    """Group page text by heading/<section> boundaries, drop empty sections;
    each gets a slug + normalized text (webscrape.py:44-103 semantics)."""
    p = _SectionParser()
    p.feed(html or "")
    out = []
    for s in p.sections:
        text = normalize_ws(" ".join(s["parts"]))
        if text:
            out.append({"slug": slugify(s["title"]), "title": s["title"], "text": text})
    return out


def sections_to_df(spark: SparkSession, url: str, html: str) -> DataFrame:
    """S7 tail: sections as a DataFrame feeding the chunk/embed pipeline."""
    rows = [(url, s["slug"], s["title"], s["text"]) for s in extract_sections(html)]
    return spark.createDataFrame(rows, "url string, slug string, title string, text string")

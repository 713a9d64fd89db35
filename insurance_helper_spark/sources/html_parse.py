"""Pure-Python Liferay listing-table parser (stdlib html.parser).

Re-implements the reference's DOM operators without bs4/lxml (not in
this container):

- S5 table locator: ``<table class~=table>``, else first table inside a
  ``portlet`` div (ref: scraper/parser.py:16-25)
- S6 row extraction: tbody rows, else all tr minus header
  (ref: parser.py:27-38)
- P1 cell text: joined descendant text, whitespace-collapsed
  (ref: parser.py:40-46)
- P2 document link: first <a href> containing .pdf/.xlsx/.xls/
  /documents/, absolutized; filename from link text (len≥3) else URL;
  fallback window.open('...') in onclick (ref: parser.py:48-76)
- S3 cardinality probe: ``of\\s+([\\d,]+)\\s+results?`` (ref:
  parser.py:109-116); S4 fallback max ``_cur=(\\d+)`` (ref: base.py:74-86)

This module is executor-side code (called from mapInPandas in
sources/http.py); it holds no Spark imports.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field
from html.parser import HTMLParser
from urllib.parse import urljoin

DOC_LINK_MARKERS = (".pdf", ".xlsx", ".xls", "/documents/")
_WS = re.compile(r"\s+")
_ONCLICK_URL = re.compile(r"window\.open\(\s*['\"]([^'\"]+)['\"]")
_TOTAL_RESULTS = re.compile(r"of\s+([\d,]+)\s+results?", re.IGNORECASE)
_CUR_PARAM = re.compile(r"_cur=(\d+)")


@dataclass
class Cell:
    text_parts: list[str] = field(default_factory=list)
    links: list[tuple[str, str]] = field(default_factory=list)  # (href, text)
    onclick_urls: list[str] = field(default_factory=list)

    @property
    def text(self) -> str:
        return _WS.sub(" ", " ".join(self.text_parts)).strip()


@dataclass
class Row:
    row_class: str = ""
    cells: list[Cell] = field(default_factory=list)
    in_thead: bool = False


@dataclass
class Table:
    table_class: str = ""
    in_portlet: bool = False
    rows: list[Row] = field(default_factory=list)
    has_tbody: bool = False


class _ListingParser(HTMLParser):
    """One-pass SAX-style parse collecting tables, rows, cells, links."""

    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.tables: list[Table] = []
        self.page_text_parts: list[str] = []
        self.all_hrefs: list[str] = []
        self._table_stack: list[Table] = []
        self._row: Row | None = None
        self._cell: Cell | None = None
        self._portlet_depth = 0
        self._thead_depth = 0
        self._tbody_depth = 0
        self._link_href: str | None = None
        self._link_text_parts: list[str] = []

    def handle_starttag(self, tag, attrs):
        a = dict(attrs)
        cls = a.get("class", "") or ""
        if tag == "div" and "portlet" in cls:
            self._portlet_depth += 1
        elif tag == "table":
            t = Table(table_class=cls, in_portlet=self._portlet_depth > 0)
            self._table_stack.append(t)
            self.tables.append(t)
        elif tag == "thead":
            self._thead_depth += 1
        elif tag == "tbody":
            self._tbody_depth += 1
            if self._table_stack:
                self._table_stack[-1].has_tbody = True
        elif tag == "tr" and self._table_stack:
            self._row = Row(row_class=cls, in_thead=self._thead_depth > 0)
            self._table_stack[-1].rows.append(self._row)
        elif tag in ("td", "th") and self._row is not None:
            self._cell = Cell()
            self._row.cells.append(self._cell)
            onclick = a.get("onclick", "")
            if onclick and self._cell is not None:
                m = _ONCLICK_URL.search(onclick)
                if m:
                    self._cell.onclick_urls.append(m.group(1))
        if tag == "a":
            href = a.get("href")
            if href:
                self.all_hrefs.append(href)
            self._link_href = href
            self._link_text_parts = []
            onclick = a.get("onclick", "")
            if onclick and self._cell is not None:
                m = _ONCLICK_URL.search(onclick)
                if m:
                    self._cell.onclick_urls.append(m.group(1))

    def handle_endtag(self, tag):
        if tag == "table" and self._table_stack:
            self._table_stack.pop()
        elif tag == "thead":
            self._thead_depth = max(0, self._thead_depth - 1)
        elif tag == "tbody":
            self._tbody_depth = max(0, self._tbody_depth - 1)
        elif tag == "tr":
            self._row = None
        elif tag in ("td", "th"):
            self._cell = None
        elif tag == "a":
            if self._link_href is not None and self._cell is not None:
                text = _WS.sub(" ", " ".join(self._link_text_parts)).strip()
                self._cell.links.append((self._link_href, text))
            self._link_href = None
            self._link_text_parts = []

    def handle_data(self, data):
        if not data:
            return
        self.page_text_parts.append(data)
        if self._cell is not None:
            self._cell.text_parts.append(data)
        if self._link_href is not None:
            self._link_text_parts.append(data)


def parse_html(html: str) -> _ListingParser:
    p = _ListingParser()
    p.feed(html or "")
    return p


def find_data_table(parsed: _ListingParser) -> Table | None:
    """S5: class~=table wins; else first table inside a portlet div."""
    for t in parsed.tables:
        if "table" in (t.table_class or "").split():
            return t
    for t in parsed.tables:
        if t.in_portlet:
            return t
    return None


def data_rows(table: Table) -> list[Row]:
    """S6: tbody rows if present, else all rows minus header rows."""
    rows = [r for r in table.rows if not r.in_thead]
    if not table.has_tbody and rows and rows[0].cells and not any(
        c.links for c in rows[0].cells
    ):
        # no tbody: treat the first row as header (th-only rows already
        # excluded via thead; Liferay tables use a leading header row)
        header_like = all(len(c.links) == 0 for c in rows[0].cells)
        if header_like and len(rows) > 1:
            rows = rows[1:]
    return rows


def extract_document_link(
    cell: Cell, base_url: str = "https://irdai.gov.in"
) -> tuple[str | None, str | None]:
    """P2 (ref: parser.py:48-76): first matching <a href>, absolutized;
    filename from link text if len≥3; onclick fallback."""
    for href, text in cell.links:
        low = href.lower()
        if any(m in low for m in DOC_LINK_MARKERS):
            url = urljoin(base_url, href)
            filename = text if len(text) >= 3 else None
            return url, filename
    if cell.onclick_urls:
        return urljoin(base_url, cell.onclick_urls[0]), None
    return None, None


def total_results(parsed: _ListingParser) -> int | None:
    """S3: ``of N results`` probe over the page text."""
    text = " ".join(parsed.page_text_parts)
    m = _TOTAL_RESULTS.search(text)
    return int(m.group(1).replace(",", "")) if m else None


def max_page_from_pagination(parsed: _ListingParser) -> int | None:
    """S4: max _cur=N over all hrefs."""
    pages = [int(m.group(1)) for h in parsed.all_hrefs for m in [_CUR_PARAM.search(h)] if m]
    return max(pages) if pages else None


def parse_listing_page(html: str, page: int) -> list[dict]:
    """Full S5+S6+P1+P2 pipeline for one page → list of row dicts
    matching schemas.PARSED_ROW_SCHEMA. Never raises: a broken page
    yields one row with parse_error set (F3 error containment,
    ref: base.py:127-133)."""
    try:
        parsed = parse_html(html)
        table = find_data_table(parsed)
        if table is None:
            return [
                {
                    "page": page, "row_index": None, "row_class": None,
                    "cells": None, "link_url": None, "link_text": None,
                    "parse_error": "no-data-table",
                }
            ]
        out = []
        for i, row in enumerate(data_rows(table)):
            try:
                link_url, link_text = None, None
                for cell in reversed(row.cells):
                    link_url, link_text = extract_document_link(cell)
                    if link_url:
                        break
                out.append(
                    {
                        "page": page,
                        "row_index": i,
                        "row_class": row.row_class,
                        "cells": [c.text for c in row.cells],
                        "link_url": link_url,
                        "link_text": link_text,
                        "parse_error": None,
                    }
                )
            except Exception as ex:  # F3: row-level containment
                out.append(
                    {
                        "page": page, "row_index": i, "row_class": None,
                        "cells": None, "link_url": None, "link_text": None,
                        "parse_error": f"row-error: {ex}",
                    }
                )
        return out
    except Exception as ex:  # page-level containment
        return [
            {
                "page": page, "row_index": None, "row_class": None,
                "cells": None, "link_url": None, "link_text": None,
                "parse_error": f"page-error: {ex}",
            }
        ]

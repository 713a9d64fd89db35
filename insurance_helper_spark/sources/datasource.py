"""Custom PySpark DataSource for listing-page snapshots — the
"DataSource V2 reader" realization of the reference's page source
(SURVEY §2A S2/S6: scraper/base.py fetch → parser.py rows), built on
Spark 4's Python Data Source API.

``spark.read.format("listing_pages").option("path", dir)`` scans a
directory of saved listing-page HTML files (the no-crawl snapshot lake
that ``sources/http.parse_pages`` replays) and returns one row per
data `<tr>` via the engine's html_parse pipeline (S5 locate → S6 rows
→ P1 clean → P2 links, F3 error containment) — the scraping pipeline
as a FIRST-CLASS TABLE the optimizer can project and filter like any
other scan.

Partitioning: one InputPartition per HTML file, so a directory of N
snapshots reads with N-way parallelism and Spark schedules files
independently across executors — the custom-source analog of parquet's
file splits. (Network fetching stays in ``sources/http``: a data
source that performed HTTP inside ``read()`` could not honor the
global politeness budget the engine enforces per partition — ref
config.py:39's 10 req/s cap — so the DataSource reads SNAPSHOTS and
the rate-limited fetcher materializes them.)
"""

from __future__ import annotations

import os

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    InputPartition,
    SimpleDataSourceStreamReader,
)

LISTING_SCHEMA = (
    "page_file string, page int, row_index int, row_class string, "
    "cells array<string>, link_url string, link_text string, parse_error string"
)

_PAGE_NUM_CHARS = "0123456789"


def _page_number(filename: str) -> int:
    """Trailing integer in the file stem (page_7.html → 7), else 0."""
    stem = os.path.splitext(filename)[0]
    digits = ""
    for ch in reversed(stem):
        if ch in _PAGE_NUM_CHARS:
            digits = ch + digits
        else:
            break
    return int(digits) if digits else 0


class _FilePartition(InputPartition):
    def __init__(self, path: str):
        self.path = path


class ListingPagesReader(DataSourceReader):
    def __init__(self, options):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("listing_pages requires .option('path', <dir>)")

    def partitions(self):
        files = sorted(
            f for f in os.listdir(self.path) if f.endswith((".html", ".htm"))
        )
        return [_FilePartition(os.path.join(self.path, f)) for f in files]

    def read(self, partition: _FilePartition):
        # Imported inside read(): executes on executors, where only the
        # serialized partition state is guaranteed to exist.
        from insurance_helper_spark.sources.html_parse import parse_listing_page

        with open(partition.path, encoding="utf-8", errors="replace") as f:
            html = f.read()
        fname = os.path.basename(partition.path)
        page = _page_number(fname)
        for r in parse_listing_page(html, page):
            yield (
                fname,
                r["page"],
                r["row_index"],
                r["row_class"],
                r["cells"],
                r["link_url"],
                r["link_text"],
                r["parse_error"],
            )


class ListingPagesStreamReader(SimpleDataSourceStreamReader):
    """Streaming variant: new HTML snapshots landing in the directory
    become micro-batches — the crawl-drop-folder as a stream source.

    Offsets are ``{"files": "<\\n-joined sorted seen filenames>"}``:
    deterministic, replayable (``readBetweenOffsets`` re-derives any
    batch from its two offsets — the exactly-once replay contract of
    the simple stream-reader API), and independent of mtime races.
    The simple API reads on the DRIVER, which fits: one listing page
    is a few hundred rows; per-executor parallelism belongs to the
    batch reader above.
    """

    def __init__(self, options):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("listing_pages requires .option('path', <dir>)")

    def _current_files(self) -> list[str]:
        return sorted(
            f for f in os.listdir(self.path) if f.endswith((".html", ".htm"))
        )

    def initialOffset(self) -> dict:
        return {"files": ""}

    def _rows_for(self, filenames: list[str]):
        from insurance_helper_spark.sources.html_parse import parse_listing_page

        for fname in filenames:
            full = os.path.join(self.path, fname)
            try:
                with open(full, encoding="utf-8", errors="replace") as f:
                    html = f.read()
            except FileNotFoundError:
                continue  # deleted between listing and read: skip
            # Any OTHER OSError (NFS blip, permissions) propagates and
            # fails the batch: the offset is not committed, so the
            # file's rows are retried rather than silently lost.
            page = _page_number(fname)
            for r in parse_listing_page(html, page):
                yield (
                    fname, r["page"], r["row_index"], r["row_class"],
                    r["cells"], r["link_url"], r["link_text"], r["parse_error"],
                )

    def read(self, start: dict):
        seen = set(start.get("files", "").split("\n")) - {""}
        now = self._current_files()
        new = [f for f in now if f not in seen]
        end = {"files": "\n".join(sorted(seen | set(new)))}
        # iter(list(...)): the simple-reader API needs an ITERATOR it
        # can pickle for executor-side replay — a generator can't be
        # pickled, a bare list isn't an iterator.
        return iter(list(self._rows_for(new))), end

    def readBetweenOffsets(self, start: dict, end: dict):
        seen = set(start.get("files", "").split("\n")) - {""}
        upto = set(end.get("files", "").split("\n")) - {""}
        return iter(list(self._rows_for(sorted(upto - seen))))


class ListingPagesDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "listing_pages"

    def schema(self) -> str:
        return LISTING_SCHEMA

    def reader(self, schema) -> DataSourceReader:
        return ListingPagesReader(self.options)

    def simpleStreamReader(self, schema) -> SimpleDataSourceStreamReader:
        return ListingPagesStreamReader(self.options)


def register(spark) -> None:
    """Register the source with the session; idempotent.

    Ships the package to Python workers first — ``read()`` executes on
    executors, which must import html_parse regardless of the driver's
    working directory (the same addPyFile mechanism every Arrow-UDF
    operator in the engine uses)."""
    from insurance_helper_spark.shipping import ensure_shipped

    ensure_shipped(spark)
    spark.dataSource.register(ListingPagesDataSource)

"""End-to-end scrape-pipeline tests on local HTML fixtures — no network.

Mirrors the reference's semantics (SURVEY §2A): parse edge cases
(onclick links, missing tbody, archived rows, short link text), F1/F2
guards, J1/J2 dedup, D1-D4 download with retry, J3 result join, O5
idempotency.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from insurance_helper_spark.sources import html_parse, http


def make_listing_html(rows: list[dict], with_tbody: bool = True, total: int | None = None) -> str:
    """Synthesize a Liferay-ish listing page."""
    trs = []
    for r in rows:
        cls = f' class="{r.get("row_class", "")}"' if r.get("row_class") else ""
        cells = []
        for i, c in enumerate(r["cells"]):
            link = ""
            if i == len(r["cells"]) - 1:
                if r.get("onclick"):
                    link = f'<a href="#" onclick="window.open(\'{r["onclick"]}\')">{c}</a>'
                elif r.get("href"):
                    link = f'<a href="{r["href"]}">{r.get("link_text", c)}</a>'
            cells.append(f"<td>{link or c}</td>")
        trs.append(f"<tr{cls}>{''.join(cells)}</tr>")
    body = "".join(trs)
    tb = f"<tbody>{body}</tbody>" if with_tbody else f"<tr><th>h1</th></tr>{body}"
    counter = f"<div>Showing 1 to 60 of {total} results</div>" if total else ""
    return f"""<html><body><div class="portlet">{counter}
    <table class="table listing"><thead><tr><th>A</th></tr></thead>{tb}</table>
    <a href="?x=1&_cur=7">7</a><a href="?x=1&_cur=12">12</a>
    </div></body></html>"""


NONLIFE_ROWS = [
    # 9 cells: status, s_no, fy, insurer, product, type, uin, date, doc
    {"cells": ["", "1", "FY 2020-21", "Acme General", "Moto Secure", "Retail",
               "UIN001", "01-04-2020", "download"],
     "href": "/documents/moto.pdf", "link_text": "Moto Secure Policy"},
    {"cells": ["", "2", "FY 2020-21", "Acme General", "Home Safe", "Retail",
               "UIN002", "02-04-2020", "download"],
     "onclick": "/documents/home.pdf", "row_class": "archive-row"},
    # short link text (<3 chars) → filename falls back to URL
    {"cells": ["", "3", "FY 2021-22", "Zen Insure", "Travel Lite", "Retail",
               "UIN003", "03-04-2021", "dl"],
     "href": "/documents/travel%20lite.xlsx", "link_text": "dl"},
    # F2 violation: empty uin → dropped
    {"cells": ["", "4", "FY 2021-22", "Zen Insure", "Ghost", "Retail",
               "", "04-04-2021", "x"], "href": "/documents/ghost.pdf"},
    # F1 violation: too few cells → dropped
    {"cells": ["", "5", "FY"], "href": "/documents/short.pdf"},
]


@pytest.fixture(scope="module")
def fixture_pages() -> dict[str, str]:
    return {
        "page1": make_listing_html(NONLIFE_ROWS, total=120),
        "page2": make_listing_html(
            [{"cells": ["", "6", "FY 2022-23", "Acme General", "Cyber Shield",
                        "Retail", "UIN006", "05-04-2022", "download"],
              "href": "/documents/cyber.pdf", "link_text": "Cyber Shield Policy"}]
        ),
        "empty": "<html><body><p>nothing here</p></body></html>",
    }


def fake_fetcher(pages: dict[str, str]):
    def fetch(url: str) -> str:
        for key, html in pages.items():
            if key in url:
                return html
        raise RuntimeError(f"404: {url}")

    return fetch


class TestHtmlParse:
    def test_probe_and_fallback(self, fixture_pages):
        parsed = html_parse.parse_html(fixture_pages["page1"])
        assert html_parse.total_results(parsed) == 120
        assert html_parse.max_page_from_pagination(parsed) == 12

    def test_rows_and_links(self, fixture_pages):
        rows = html_parse.parse_listing_page(fixture_pages["page1"], page=1)
        ok = [r for r in rows if r["parse_error"] is None]
        assert len(ok) == 5
        # href link absolutized
        assert ok[0]["link_url"] == "https://irdai.gov.in/documents/moto.pdf"
        assert ok[0]["link_text"] == "Moto Secure Policy"
        # onclick fallback
        assert ok[1]["link_url"] == "https://irdai.gov.in/documents/home.pdf"
        assert ok[1]["row_class"] == "archive-row"

    def test_no_table_contained(self, fixture_pages):
        rows = html_parse.parse_listing_page(fixture_pages["empty"], page=9)
        assert len(rows) == 1 and rows[0]["parse_error"] == "no-data-table"

    def test_garbage_never_raises(self):
        rows = html_parse.parse_listing_page("<<<%%% not html &&& <table><tr>", page=1)
        assert isinstance(rows, list)


class TestPipeline:
    def test_metadata_only(self, spark, fixture_pages):
        df = http.scrape_pipeline(
            spark,
            url_template="https://x/page{page}",
            total_pages=2,
            product_type="nonlife",
            fetcher=fake_fetcher(fixture_pages),
            metadata_only=True,
            config=http.ScrapeConfig(rate_limit=10000.0, fetch_partitions=2),
        )
        rows = {r["uin"]: r.asDict() for r in df.collect()}
        # F1+F2 guards: UIN004 (empty uin) and the 3-cell row dropped
        assert set(rows) == {"UIN001", "UIN002", "UIN003", "UIN006"}
        # P4: archive classification from row class
        assert rows["UIN002"]["archive_status"] == "Archived"
        assert rows["UIN001"]["archive_status"] == "Non-Archived"
        # P2/P3: filename from link text, URL fallback for short text
        assert rows["UIN001"]["document_filename"] == "Moto Secure Policy"
        assert rows["UIN003"]["document_filename"] == "travel%20lite.xlsx"

    def test_full_pipeline_with_downloads(self, spark, fixture_pages, tmp_path):
        calls: list[str] = []

        def fake_downloader(url: str) -> bytes:
            calls.append(url)
            if "cyber" in url:
                raise RuntimeError("boom")
            return b"%PDF-1.4 fake " + url.encode()

        df = http.scrape_pipeline(
            spark,
            url_template="https://x/page{page}",
            total_pages=2,
            product_type="nonlife",
            fetcher=fake_fetcher(fixture_pages),
            downloader=fake_downloader,
            download_dir=str(tmp_path / "downloads"),
            config=http.ScrapeConfig(
                rate_limit=1e6, retry_attempts=2, retry_delay_s=0.0, fetch_partitions=2
            ),
        ).cache()
        rows = {r["uin"]: r.asDict() for r in df.collect()}
        assert rows["UIN001"]["download_success"] is True
        assert rows["UIN001"]["local_file_path"].endswith(".pdf")
        # K3 partitioned path layout
        assert "/nonlife/FY-2020-21/Acme-General/" in rows["UIN001"]["local_file_path"]
        # K2 extension inference from xlsx URL
        assert rows["UIN003"]["local_file_path"].endswith(".xlsx")
        # D2/D4: failed download → error row, not exception; retried
        assert rows["UIN006"]["download_success"] is False
        df.unpersist()

    def test_completed_anti_join_idempotency(self, spark, fixture_pages):
        """J1/O5: second run with the first run's URLs marked completed
        downloads nothing (the reference's delta-idempotency)."""
        cfg = http.ScrapeConfig(rate_limit=1e6, fetch_partitions=2)
        meta = http.scrape_pipeline(
            spark, "https://x/page{page}", 2, "nonlife",
            fetcher=fake_fetcher(fixture_pages), metadata_only=True, config=cfg,
        )
        completed = meta.select(F.col("document_url").alias("url"))
        tasks_round2 = http.build_download_tasks(meta, "nonlife", completed=completed)
        assert tasks_round2.count() == 0

    def test_page_range_restriction(self, spark):
        df = http.page_urls(spark, "https://x/p{page}", total_pages=100,
                            start_page=10, end_page=20)
        pages = [r["page"] for r in df.collect()]
        assert pages == list(range(10, 21))


class TestDownloadBatch:
    def test_retry_then_success(self, spark, tmp_path):
        attempts: dict[str, int] = {}

        def flaky(url: str) -> bytes:
            attempts[url] = attempts.get(url, 0) + 1
            if attempts[url] < 2:
                raise RuntimeError("transient")
            return b"data"

        tasks = spark.createDataFrame(
            [("u1", str(tmp_path / "f1.bin"), "t", "k1")],
            schema="url string, destination string, product_type string, uin string",
        )
        res = http.download_batch(
            tasks, downloader=flaky,
            config=http.ScrapeConfig(rate_limit=1e6, retry_attempts=3, retry_delay_s=0.0),
            download_partitions=1,
        ).collect()
        assert res[0]["success"] is True
        assert res[0]["attempts"] == 2
        assert (tmp_path / "f1.bin").read_bytes() == b"data"

    def test_aggregate_rate_cap_across_partitions(self, spark, tmp_path):
        """The reference's one hard operational invariant (config.py:39,
        10 req/s GLOBAL): with k partitions each budgeted rate/k, the
        FLEET-WIDE request rate must stay under the configured cap.
        Each fetch appends a wall-clock timestamp to a shared file
        (workers are separate processes; O_APPEND lines are atomic at
        this size), then the aggregate rate over the observed window is
        checked against the cap."""
        import os
        import time

        log = tmp_path / "stamps.log"
        log_path = str(log)

        def stamping_downloader(url: str) -> bytes:
            with open(log_path, "a") as f:
                f.write(f"{time.time()}\n")
            return b"x"

        n_parts, rate, n_req = 4, 20.0, 40
        tasks = spark.createDataFrame(
            [(f"u{i}", None, "t", "k") for i in range(n_req)],
            schema="url string, destination string, product_type string, uin string",
        )
        res = http.download_batch(
            tasks, downloader=stamping_downloader,
            config=http.ScrapeConfig(
                rate_limit=rate, retry_attempts=1, retry_delay_s=0.0
            ),
            download_partitions=n_parts, write_files=False,
        ).collect()
        assert all(r["success"] for r in res)
        stamps = sorted(float(x) for x in log.read_text().split())
        assert len(stamps) == n_req
        span = stamps[-1] - stamps[0]
        # Each partition's bucket grants one burst token, so exclude
        # the k free first-requests from the numerator; everything else
        # must have been paced at <= rate overall (25% timing slack).
        paced = n_req - n_parts
        assert span > 0
        assert paced / span <= rate * 1.25, (
            f"aggregate {paced / span:.1f} req/s exceeds cap {rate}"
        )
        assert os.path.exists(log_path)

    def test_rate_limit_honored(self, spark):
        """Global politeness: 4 downloads at 2 req/s global across 2
        partitions (1 req/s each) must take ≥ ~1s."""
        import time

        tasks = spark.createDataFrame(
            [(f"u{i}", None, "t", "k") for i in range(4)],
            schema="url string, destination string, product_type string, uin string",
        )
        t0 = time.perf_counter()
        http.download_batch(
            tasks, downloader=lambda u: b"x",
            config=http.ScrapeConfig(rate_limit=2.0, retry_attempts=1, retry_delay_s=0.0),
            download_partitions=2, write_files=False,
        ).collect()
        assert time.perf_counter() - t0 >= 0.9

"""Paginated-HTTP scrape source + bounded download stage, Spark-first.

The reference runs one asyncio loop on one machine (SURVEY §3); here
every stage is a DataFrame transform so pages and downloads partition
across executors:

  pages(range) → fetch+parse (mapInPandas, injected fetcher)
               → explode rows → typed projection/filters (P5/F1/F2)
               → anti-join completed (J1) → download (mapInPandas,
                 token bucket + retries, D1-D4) → join results (J3)

Politeness invariant (ref: config.py:39, async_downloader.py:30): the
10 req/s cap must hold GLOBALLY. Spark has no cross-executor limiter,
so each of the k partitions gets rate/k — the honest distributed
equivalent (SURVEY §4). IO is injected (``fetcher``/``downloader``
callables), so tests run on local fixtures and never touch the network.
"""

from __future__ import annotations

import time
from collections.abc import Callable, Iterator
from dataclasses import dataclass

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from insurance_helper_spark import schemas
from insurance_helper_spark.functions import cleaning
from insurance_helper_spark.sources import html_parse

# Reference defaults (config.py:27-46)
DEFAULT_PAGE_SIZE = 60
DEFAULT_RATE_LIMIT = 10.0      # req/s, GLOBAL
DEFAULT_MAX_CONCURRENT = 10
DEFAULT_RETRY_ATTEMPTS = 3
DEFAULT_RETRY_DELAY_S = 2.0    # linear backoff: delay * attempt_no
DEFAULT_BASE_URL = "https://irdai.gov.in"
USER_AGENT = "Mozilla/5.0 (compatible; spark-scraper/0.1)"

Fetcher = Callable[[str], str]          # url -> html (raises on error)
Downloader = Callable[[str], bytes]     # url -> payload (raises on error)


class TokenBucket:
    """Per-partition token bucket. With k partitions each running
    ``rate/k``, the fleet stays under the global cap."""

    def __init__(self, rate_per_s: float, burst: float = 1.0) -> None:
        # rate <= 0 means "no limit" (reference --rate-limit 0); acquire
        # short-circuits before any division in that case.
        self.rate = rate_per_s
        self.capacity = max(burst, 1.0)
        self.tokens = self.capacity
        self.last = time.monotonic()

    def acquire(self) -> None:
        if self.rate <= 0:  # reference semantics: rate 0 = no limit
            return
        while True:
            now = time.monotonic()
            self.tokens = min(self.capacity, self.tokens + (now - self.last) * self.rate)
            self.last = now
            if self.tokens >= 1.0:
                self.tokens -= 1.0
                return
            time.sleep(min((1.0 - self.tokens) / self.rate, 0.5))


def default_fetcher(timeout_s: float = 60.0) -> Fetcher:
    """requests-based page fetcher mirroring the reference client:
    UA header, SSL verification off (config.py:40-42), page timeout
    (config.py:36)."""
    import requests
    import urllib3

    urllib3.disable_warnings()
    session = requests.Session()
    session.headers["User-Agent"] = USER_AGENT

    def fetch(url: str) -> str:
        resp = session.get(url, timeout=timeout_s, verify=False)
        resp.raise_for_status()
        return resp.text

    return fetch


def default_downloader(timeout_s: float = 300.0) -> Downloader:
    """requests-based file downloader (download timeout config.py:35),
    streamed in 8 KiB chunks (D3 — async_downloader.py:89)."""
    import requests
    import urllib3

    urllib3.disable_warnings()
    session = requests.Session()
    session.headers["User-Agent"] = USER_AGENT

    def download(url: str) -> bytes:
        resp = session.get(url, timeout=timeout_s, verify=False, stream=True)
        resp.raise_for_status()
        return b"".join(resp.iter_content(chunk_size=8192))

    return download


@dataclass
class ScrapeConfig:
    base_url: str = DEFAULT_BASE_URL
    page_size: int = DEFAULT_PAGE_SIZE
    rate_limit: float = DEFAULT_RATE_LIMIT
    retry_attempts: int = DEFAULT_RETRY_ATTEMPTS
    retry_delay_s: float = DEFAULT_RETRY_DELAY_S
    fetch_partitions: int = 4


def page_urls(
    spark: SparkSession,
    url_template: str,
    total_pages: int,
    start_page: int = 1,
    end_page: int | None = None,
) -> DataFrame:
    """S1+O3: page work-list as a DataFrame. ``{page}`` in the template
    is substituted; start/end bound the scan (partition-pruning analog)."""
    end = min(end_page or total_pages, total_pages)
    prefix, _, suffix = url_template.partition("{page}")
    return spark.range(start_page, end + 1).select(
        F.col("id").alias("page"),
        F.concat(F.lit(prefix), F.col("id").cast("string"), F.lit(suffix)).alias("page_url"),
    )


def fetch_and_parse_pages(
    pages: DataFrame,
    fetcher: Fetcher | None = None,
    config: ScrapeConfig | None = None,
) -> DataFrame:
    """S2+S5+S6: fetch each page and parse its listing table.

    mapInPandas with one fetcher + token bucket per partition; page
    fetch errors become parse_error rows (F3), never task failures.
    Output matches schemas.PARSED_ROW_SCHEMA.
    """
    from insurance_helper_spark.shipping import ensure_shipped

    ensure_shipped(pages.sparkSession)
    cfg = config or ScrapeConfig()
    n_parts = max(cfg.fetch_partitions, 1)
    per_partition_rate = cfg.rate_limit / n_parts

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        fetch = fetcher or default_fetcher()
        bucket = TokenBucket(per_partition_rate)
        for pdf in batches:
            out: list[dict] = []
            for page, url in zip(pdf["page"], pdf["page_url"]):
                try:
                    bucket.acquire()
                    html = fetch(url)
                    out.extend(html_parse.parse_listing_page(html, int(page)))
                except Exception as ex:  # F3 page containment
                    out.append(
                        {
                            "page": int(page), "row_index": None,
                            "row_class": None, "cells": None,
                            "link_url": None, "link_text": None,
                            "parse_error": f"fetch-error: {ex}",
                        }
                    )
            yield pd.DataFrame(out, columns=[f.name for f in schemas.PARSED_ROW_SCHEMA])

    return pages.repartition(n_parts).mapInPandas(run, schema=schemas.PARSED_ROW_SCHEMA)


def parse_pages(pages_html: DataFrame, page_col: str = "page", html_col: str = "html") -> DataFrame:
    """S5+S6 over an already-materialized page snapshot: parse listing
    HTML carried as a column instead of fetching it.

    This is the replay path for a raw-HTML lake (store fetched pages
    once, re-parse on parser upgrades without re-crawling): no network,
    no rate limit, embarrassingly parallel over whatever partitioning
    the snapshot relation already has. Parse errors become
    ``parse_error`` rows (F3), never task failures.
    """
    from insurance_helper_spark.shipping import ensure_shipped

    ensure_shipped(pages_html.sparkSession)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out: list[dict] = []
            for page, html in zip(pdf[page_col], pdf[html_col]):
                try:
                    out.extend(html_parse.parse_listing_page(html, int(page)))
                except Exception as ex:  # F3 page containment
                    out.append(
                        {
                            "page": int(page), "row_index": None,
                            "row_class": None, "cells": None,
                            "link_url": None, "link_text": None,
                            "parse_error": f"parse-error: {ex}",
                        }
                    )
            yield pd.DataFrame(out, columns=[f.name for f in schemas.PARSED_ROW_SCHEMA])

    return pages_html.select(page_col, html_col).mapInPandas(
        run, schema=schemas.PARSED_ROW_SCHEMA
    )


# Positional cell → column maps (P5): ref scraper/{life,life_list,
# nonlife,health}.py parse_row comments; cited per type below.
_PROJECTIONS: dict[str, list[str]] = {
    # life.py:18-66 — 13+ cells
    "life": [
        "financial_year", "insurer", "product_name", "uin", "type_of_product",
        "launch_modification_date", "closing_withdrawal_date",
        "protection_savings_retirement", "par_nonpar", "individual_group",
        "remarks",
    ],
    # life_list.py:18-50 — 5+ cells
    "life_list": ["short_description", "last_updated", "sub_title"],
    # nonlife.py:18-58 — 9+ cells
    "nonlife": [
        "s_no", "financial_year", "insurer", "product_name", "type_of_product",
        "uin", "date_of_approval",
    ],
    # health.py:18-59 — 8+ cells (doc link from cells[-2]/[-1])
    "health": [
        "financial_year", "insurer", "uin", "product_name", "date_of_approval",
    ],
}


def project_products(parsed_rows: DataFrame, product_type: str) -> DataFrame:
    """P5+F1+F2+P4: positional cells → named columns, arity and key
    guards, archive classification, document link/filename columns.

    Pure column expressions over the parsed-row relation — Catalyst
    pushes the guards below everything downstream.
    """
    if product_type not in _PROJECTIONS:
        raise ValueError(f"unknown product_type: {product_type}")
    cols = _PROJECTIONS[product_type]
    min_cells = schemas.MIN_CELLS[product_type]
    key_col = schemas.KEY_COLUMN[product_type]

    base = parsed_rows.filter(
        F.col("parse_error").isNull() & (F.size("cells") >= min_cells)
    )
    projected = base.select(
        "page",
        "row_index",
        F.lit(product_type).alias("product_type"),
        cleaning.archive_status(
            F.col("row_class"), F.col("cells").getItem(0)
        ).alias("archive_status"),
        *[F.col("cells").getItem(i + 1).alias(name) for i, name in enumerate(cols)],
        F.col("link_url").alias("document_url"),
        F.coalesce(
            F.when(F.length("link_text") >= 3, F.col("link_text")),
            cleaning.filename_from_url(F.col("link_url")),
        ).alias("document_filename"),
    )
    # F2: key must be non-empty
    return projected.filter(
        F.col(key_col).isNotNull() & (F.trim(F.col(key_col)) != "")
    )


def build_download_tasks(
    products: DataFrame,
    product_type: str,
    completed: DataFrame | None = None,
    base_dir: str = "downloads",
) -> DataFrame:
    """K3+K4+J1: synthesize destination paths, drop null URLs, anti-join
    the completed set (ref: cli.py:98-108, file_manager.py:116-134)."""
    fy = F.col("financial_year") if "financial_year" in products.columns else F.lit("unknown")
    insurer = F.col("insurer") if "insurer" in products.columns else F.lit("unknown")
    uin = F.col("uin") if "uin" in products.columns else F.col(schemas.KEY_COLUMN[product_type])
    name = (
        F.col("product_name") if "product_name" in products.columns
        else F.col(schemas.KEY_COLUMN[product_type])
    )
    tasks = (
        products.filter(F.col("document_url").isNotNull())
        .select(
            F.col("document_url").alias("url"),
            cleaning.partitioned_path(
                F.lit(product_type), fy, insurer, uin, name,
                cleaning.extension_from_url(F.col("document_url")),
                base=base_dir,
            ).alias("destination"),
            F.lit(product_type).alias("product_type"),
            uin.alias("uin"),
        )
        .dropDuplicates(["url"])
    )
    if completed is not None:
        tasks = tasks.join(completed.select("url"), on="url", how="left_anti")
    return tasks


def download_batch(
    tasks: DataFrame,
    downloader: Downloader | None = None,
    config: ScrapeConfig | None = None,
    download_partitions: int | None = None,
    write_files: bool = True,
) -> DataFrame:
    """D1-D4: bounded, rate-limited, retrying bulk download.

    Each partition runs one downloader with ``rate/k`` tokens; failures
    become error ROWS (success=false), never exceptions (D4). Retry:
    ``retry_attempts`` tries with linear backoff ``delay*attempt``
    (ref: async_downloader.py:50-70, config.py:37-38).
    Output matches schemas.DOWNLOAD_RESULT_SCHEMA.
    """
    from insurance_helper_spark.shipping import ensure_shipped

    ensure_shipped(tasks.sparkSession)
    cfg = config or ScrapeConfig()
    n_parts = download_partitions or DEFAULT_MAX_CONCURRENT
    per_partition_rate = cfg.rate_limit / max(n_parts, 1)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import os

        dl = downloader or default_downloader()
        bucket = TokenBucket(per_partition_rate)
        for pdf in batches:
            out: list[dict] = []
            for url, dest in zip(pdf["url"], pdf["destination"]):
                attempts, err, payload = 0, None, None
                while attempts < cfg.retry_attempts:
                    attempts += 1
                    try:
                        bucket.acquire()
                        payload = dl(url)
                        err = None
                        break
                    except Exception as ex:
                        err = str(ex)
                        # linear backoff: delay * attempt number
                        time.sleep(cfg.retry_delay_s * attempts)
                if payload is not None and write_files and dest:
                    try:
                        os.makedirs(os.path.dirname(dest), exist_ok=True)
                        with open(dest, "wb") as f:
                            f.write(payload)
                    except Exception as ex:
                        err, payload = f"write-error: {ex}", None
                out.append(
                    {
                        "url": url,
                        "success": payload is not None,
                        "file_path": dest if payload is not None else None,
                        "file_size": len(payload) if payload is not None else None,
                        "error": err,
                        "attempts": attempts,
                    }
                )
            yield pd.DataFrame(out, columns=[f.name for f in schemas.DOWNLOAD_RESULT_SCHEMA])

    return tasks.repartition(n_parts).mapInPandas(run, schema=schemas.DOWNLOAD_RESULT_SCHEMA)


def join_results(products: DataFrame, results: DataFrame) -> DataFrame:
    """J3: correlate download results back to products, setting
    local_file_path (ref: cli.py:119-138). Left join keeps products
    whose download failed or was skipped."""
    r = results.select(
        F.col("url").alias("document_url"),
        F.col("file_path").alias("local_file_path"),
        F.col("success").alias("download_success"),
    )
    return products.join(r, on="document_url", how="left")


def scrape_pipeline(
    spark: SparkSession,
    url_template: str,
    total_pages: int,
    product_type: str,
    fetcher: Fetcher | None = None,
    downloader: Downloader | None = None,
    completed: DataFrame | None = None,
    config: ScrapeConfig | None = None,
    download_dir: str = "downloads",
    metadata_only: bool = False,
    start_page: int = 1,
    end_page: int | None = None,
    download_partitions: int | None = None,
) -> DataFrame:
    """O1/O2/O5 composed: the full scrape as ONE lazy DataFrame plan.

    metadata_only (O2) skips the download stage — with a lazy DAG the
    stage simply never exists. Returns the product table with
    local_file_path/download_success populated (or null).
    """
    pages = page_urls(spark, url_template, total_pages, start_page, end_page)
    parsed = fetch_and_parse_pages(pages, fetcher, config)
    products = project_products(parsed, product_type)
    products = products.withColumn(
        "scraped_at", F.date_format(F.current_timestamp(), "yyyy-MM-dd'T'HH:mm:ss")
    )
    if metadata_only:
        return products
    tasks = build_download_tasks(products, product_type, completed, download_dir)
    results = download_batch(tasks, downloader, config, download_partitions)
    return join_results(products, results)


def probe_total_pages(
    url_template: str,
    fetcher: Fetcher,
    page_size: int = DEFAULT_PAGE_SIZE,
) -> int:
    """S3+S4 composed: the reference's ``get_total_pages``
    (scraper/base.py): fetch page 1, read the "of N results" counter →
    ceil(N / page_size); fall back to the max ``_cur=N`` pagination
    href; fall back to 1. Driver-side single fetch — the one probe
    request that sizes the distributed page scan.
    """
    prefix, _, suffix = url_template.partition("{page}")
    html = fetcher(f"{prefix}1{suffix}")
    parsed = html_parse.parse_html(html)
    total = html_parse.total_results(parsed)
    if total is not None:
        return max(1, -(-total // page_size))
    max_page = html_parse.max_page_from_pagination(parsed)
    return max_page if max_page is not None else 1

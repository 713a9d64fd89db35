"""Scraper-operator ports (SURVEY §2A) exercised on fixture data.

The reference's scrape-pipeline operators are pure dataflow: URL
generation, text cleaning, link/filename extraction, classification,
path synthesis, checkpoint/resume filters, failure upsert. Here each is
a registered query over deterministic columns synthesized from the
fixture tables (both engines synthesize identically), so the DuckDB
oracle verifies exact semantics. The network-bound pieces (S2 fetch,
D1-D4 download) live in ``sources/http.py`` with injected IO.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from insurance_helper_spark.functions import cleaning
from insurance_helper_spark.operators import incremental
from insurance_helper_spark.queries.catalog import register
from insurance_helper_spark.sources.tables import load_table

# ---------------------------------------------------------------------------
# S1 + S3: paginated page-URL generation with cardinality-derived page
# count. Ref: scraper/base.py:40-49 (URL template), :58-72 (total-results
# probe → ceil-div by page size 60, config.py:32).
# Scale: the page list is a DataFrame (spark.range) — the scan driver is
# data, not a driver-side loop, so 10^6 pages partition across executors.
# ---------------------------------------------------------------------------

PAGE_URL_ORACLE = """
WITH pages AS (
  SELECT CAST(r.range AS BIGINT) AS page,
         CAST(ceil(2500 * 1.0 / 60) AS BIGINT) AS total_pages
  FROM range(1, CAST(ceil(2500 * 1.0 / 60) AS BIGINT) + 1) r
)
SELECT page, total_pages,
       'https://irdai.gov.in/consolidated-gazette-notified-forms?p_p_id=com_irdai_document_media_IRDAIDocumentMediaPortlet&_cur=' ||
         CAST(page AS VARCHAR) || '&_delta=60' AS page_url
FROM pages
ORDER BY page
"""


@register("scrape_page_urls", PAGE_URL_ORACLE)
def scrape_page_urls(spark: SparkSession, sf_dir: str) -> DataFrame:
    total_results, page_size = 2500, 60
    total_pages = -(-total_results // page_size)
    return (
        spark.range(1, total_pages + 1)
        .select(
            F.col("id").alias("page"),
            F.lit(total_pages).cast("bigint").alias("total_pages"),
            F.concat(
                F.lit(
                    "https://irdai.gov.in/consolidated-gazette-notified-forms"
                    "?p_p_id=com_irdai_document_media_IRDAIDocumentMediaPortlet&_cur="
                ),
                F.col("id").cast("string"),
                F.lit("&_delta=60"),
            ).alias("page_url"),
        )
        .orderBy("page")
    )


# ---------------------------------------------------------------------------
# S4: fallback max-page discovery — regexp over hrefs + max agg.
# Ref: scraper/base.py:74-86 (regex `_cur=(\d+)` over pagination links).
# ---------------------------------------------------------------------------

MAX_PAGE_ORACLE = """
SELECT max(CAST(regexp_extract(href, '_cur=(\\d+)', 1) AS BIGINT)) AS max_page,
       count(*) AS n_links
FROM (
  SELECT 'https://irdai.gov.in/page?x=1&_cur=' || CAST(o_orderkey % 143 AS VARCHAR) AS href
  FROM orders
)
WHERE regexp_extract(href, '_cur=(\\d+)', 1) <> ''
"""


@register("scrape_max_page_fallback", MAX_PAGE_ORACLE)
def scrape_max_page_fallback(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders", columns=["o_orderkey"])
    hrefs = orders.select(
        F.concat(
            F.lit("https://irdai.gov.in/page?x=1&_cur="),
            (F.col("o_orderkey") % 143).cast("string"),
        ).alias("href")
    )
    cur = F.regexp_extract("href", r"_cur=(\d+)", 1)
    return hrefs.filter(cur != "").agg(
        F.max(cur.cast("bigint")).alias("max_page"),
        F.count("*").alias("n_links"),
    )


# ---------------------------------------------------------------------------
# P1+P3+K1+K2: clean text, extract filename from URL, sanitize, infer
# extension — the whole cleaning chain over synthesized dirty URLs.
# ---------------------------------------------------------------------------

CLEANING_ORACLE = r"""
WITH raw AS (
  SELECT p_partkey, p_name, p_brand,
         '  ' || p_name || E'\t\n ' || p_brand || '  ' AS dirty_text,
         CASE p_partkey % 4
           WHEN 0 THEN 'https://irdai.gov.in/documents/d' || CAST(p_partkey AS VARCHAR) || '/product-brochure.pdf?download=true'
           WHEN 1 THEN 'https://irdai.gov.in/files/' || CAST(p_partkey AS VARCHAR) || '/Listing.XLSX'
           WHEN 2 THEN 'https://irdai.gov.in/portal/view/' || CAST(p_partkey AS VARCHAR)
           ELSE 'https://cdn.example.org/xls-export?id=' || CAST(p_partkey AS VARCHAR)
         END AS url
  FROM part
)
SELECT p_partkey,
       trim(regexp_replace(dirty_text, '\s+', ' ', 'g')) AS clean_text,
       CASE WHEN url IS NULL OR url = '' THEN NULL
            WHEN regexp_extract(url, '(?i)/([^/?]+\.(?:pdf|xlsx|xls))', 1) <> ''
            THEN regexp_extract(url, '(?i)/([^/?]+\.(?:pdf|xlsx|xls))', 1)
            ELSE list_extract(string_split(string_split(url, '?')[1], '/'), len(string_split(string_split(url, '?')[1], '/')))
       END AS filename,
       CASE WHEN contains(lower(string_split(url, '?')[1]), '.xlsx') THEN '.xlsx'
            WHEN contains(lower(string_split(url, '?')[1]), '.xls') THEN '.xls'
            WHEN contains(lower(string_split(url, '?')[1]), '.pdf') THEN '.pdf'
            WHEN contains(lower(url), 'xlsx') OR contains(lower(url), 'xls') THEN '.xlsx'
            ELSE '.pdf'
       END AS ext,
       CASE WHEN trim(substring(regexp_replace(regexp_replace(p_name || '/' || p_brand, '[<>:"/\\|?*]', '-', 'g'), '[-\s]+', '-', 'g'), 1, 100), '-') = ''
            THEN 'unknown'
            ELSE substring(trim(regexp_replace(regexp_replace(p_name || '/' || p_brand, '[<>:"/\\|?*]', '-', 'g'), '[-\s]+', '-', 'g'), '-'), 1, 100)
       END AS safe_name
FROM raw
ORDER BY p_partkey
"""


@register("scrape_cleaning_chain", CLEANING_ORACLE)
def scrape_cleaning_chain(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load_table(spark, sf_dir, "part", columns=["p_partkey", "p_name", "p_brand"])
    url = (
        F.when(
            F.col("p_partkey") % 4 == 0,
            F.concat(F.lit("https://irdai.gov.in/documents/d"), F.col("p_partkey").cast("string"),
                     F.lit("/product-brochure.pdf?download=true")),
        )
        .when(
            F.col("p_partkey") % 4 == 1,
            F.concat(F.lit("https://irdai.gov.in/files/"), F.col("p_partkey").cast("string"),
                     F.lit("/Listing.XLSX")),
        )
        .when(
            F.col("p_partkey") % 4 == 2,
            F.concat(F.lit("https://irdai.gov.in/portal/view/"), F.col("p_partkey").cast("string")),
        )
        .otherwise(
            F.concat(F.lit("https://cdn.example.org/xls-export?id="), F.col("p_partkey").cast("string"))
        )
    )
    dirty = F.concat(F.lit("  "), F.col("p_name"), F.lit("\t\n "), F.col("p_brand"), F.lit("  "))
    df = part.withColumn("url", url).withColumn("dirty_text", dirty)
    return df.select(
        "p_partkey",
        cleaning.clean_text(F.col("dirty_text")).alias("clean_text"),
        cleaning.filename_from_url(F.col("url")).alias("filename"),
        cleaning.extension_from_url(F.col("url")).alias("ext"),
        cleaning.sanitize_filename(F.concat_ws("/", "p_name", "p_brand")).alias("safe_name"),
    ).orderBy("p_partkey")


# ---------------------------------------------------------------------------
# P4: archive-status classifier cascade. Ref: scraper/parser.py:91-107.
# ---------------------------------------------------------------------------

ARCHIVE_ORACLE = """
WITH rows_in AS (
  SELECT o_orderkey,
         CASE o_orderkey % 5
           WHEN 0 THEN 'row archive-row highlight' WHEN 1 THEN 'row data-row' ELSE '' END AS row_class,
         CASE o_orderkey % 7
           WHEN 0 THEN 'Archived' WHEN 1 THEN 'Non-Archived' WHEN 2 THEN 'some product text' ELSE '' END AS first_cell
  FROM orders
),
classified AS (
  SELECT o_orderkey,
         CASE WHEN contains(lower(row_class), 'archive') THEN 'Archived'
              WHEN contains(lower(first_cell), 'non-archived') THEN 'Non-Archived'
              WHEN contains(lower(first_cell), 'archived') THEN 'Archived'
              ELSE 'Non-Archived' END AS archive_status
  FROM rows_in
)
SELECT archive_status, count(*) AS n
FROM classified GROUP BY archive_status ORDER BY archive_status
"""


@register("scrape_archive_classifier", ARCHIVE_ORACLE)
def scrape_archive_classifier(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders", columns=["o_orderkey"])
    row_class = (
        F.when(F.col("o_orderkey") % 5 == 0, F.lit("row archive-row highlight"))
        .when(F.col("o_orderkey") % 5 == 1, F.lit("row data-row"))
        .otherwise(F.lit(""))
    )
    first_cell = (
        F.when(F.col("o_orderkey") % 7 == 0, F.lit("Archived"))
        .when(F.col("o_orderkey") % 7 == 1, F.lit("Non-Archived"))
        .when(F.col("o_orderkey") % 7 == 2, F.lit("some product text"))
        .otherwise(F.lit(""))
    )
    df = orders.withColumn("row_class", row_class).withColumn("first_cell", first_cell)
    return (
        df.select(cleaning.archive_status(F.col("row_class"), F.col("first_cell")).alias("archive_status"))
        .groupBy("archive_status")
        .agg(F.count("*").alias("n"))
        .orderBy("archive_status")
    )


# ---------------------------------------------------------------------------
# K3: partitioned download-path synthesis.
# Ref: downloader/file_manager.py:47-114.
# ---------------------------------------------------------------------------

PATH_ORACLE = r"""
WITH base AS (
  SELECT p_partkey,
         'life' AS product_type,
         'FY 20' || lpad(CAST(15 + p_partkey % 8 AS VARCHAR), 2, '0') || '-' ||
            lpad(CAST((16 + p_partkey % 8) % 100 AS VARCHAR), 2, '0') AS financial_year,
         p_brand AS insurer,
         'UIN' || CAST(p_partkey AS VARCHAR) AS uin,
         p_name AS product_name
  FROM part
),
san AS (
  -- per-component sanitization exactly as the reference: uin and
  -- product_name are sanitized SEPARATELY, then joined with '_'
  -- (file_manager.py:70-80 builds filename from pre-sanitized parts).
  SELECT p_partkey, product_type, financial_year, insurer, uin, product_name,
         (SELECT CASE WHEN x = '' THEN 'unknown' ELSE x END FROM
           (SELECT substring(trim(regexp_replace(regexp_replace(financial_year, '[<>:"/\\|?*]', '-', 'g'), '[-\s]+', '-', 'g'), '-'), 1, 100) AS x)) AS fy_s,
         (SELECT CASE WHEN x = '' THEN 'unknown' ELSE x END FROM
           (SELECT substring(trim(regexp_replace(regexp_replace(insurer, '[<>:"/\\|?*]', '-', 'g'), '[-\s]+', '-', 'g'), '-'), 1, 100) AS x)) AS insurer_s,
         (SELECT CASE WHEN x = '' THEN 'unknown' ELSE x END FROM
           (SELECT substring(trim(regexp_replace(regexp_replace(uin, '[<>:"/\\|?*]', '-', 'g'), '[-\s]+', '-', 'g'), '-'), 1, 100) AS x)) AS uin_s,
         (SELECT CASE WHEN x = '' THEN 'unknown' ELSE x END FROM
           (SELECT substring(trim(regexp_replace(regexp_replace(product_name, '[<>:"/\\|?*]', '-', 'g'), '[-\s]+', '-', 'g'), '-'), 1, 100) AS x)) AS name_s
  FROM base
)
SELECT p_partkey,
       'downloads/' || product_type || '/' || fy_s || '/' || insurer_s || '/' || uin_s || '_' || name_s || '.pdf' AS download_path
FROM san
ORDER BY p_partkey
"""


@register("scrape_partitioned_path", PATH_ORACLE)
def scrape_partitioned_path(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load_table(spark, sf_dir, "part", columns=["p_partkey", "p_name", "p_brand"])
    fy = F.concat(
        F.lit("FY 20"),
        F.lpad((15 + F.col("p_partkey") % 8).cast("string"), 2, "0"),
        F.lit("-"),
        F.lpad(((16 + F.col("p_partkey") % 8) % 100).cast("string"), 2, "0"),
    )
    df = part.select(
        "p_partkey",
        F.lit("life").alias("product_type"),
        fy.alias("financial_year"),
        F.col("p_brand").alias("insurer"),
        F.concat(F.lit("UIN"), F.col("p_partkey").cast("string")).alias("uin"),
        F.col("p_name").alias("product_name"),
    )
    return df.select(
        "p_partkey",
        cleaning.partitioned_path(
            F.col("product_type"),
            F.col("financial_year"),
            F.col("insurer"),
            F.col("uin"),
            F.col("product_name"),
            F.lit(".pdf"),
        ).alias("download_path"),
    ).orderBy("p_partkey")


# ---------------------------------------------------------------------------
# J2/O5: the incremental-delta anti-join core on fixture data.
# Ref: scripts/delta_download.py:41-51,191.
# ---------------------------------------------------------------------------

DELTA_ORACLE = """
WITH existing AS (
  SELECT DISTINCT 'https://irdai.gov.in/doc/' || CAST(o_orderkey AS VARCHAR) AS document_url
  FROM orders WHERE o_orderkey % 3 = 0
),
snapshot AS (
  SELECT 'https://irdai.gov.in/doc/' || CAST(o_orderkey AS VARCHAR) AS document_url,
         o_orderkey, o_totalprice
  FROM orders
)
SELECT s.document_url, s.o_orderkey, s.o_totalprice
FROM snapshot s
WHERE NOT EXISTS (SELECT 1 FROM existing e WHERE e.document_url = s.document_url)
ORDER BY s.o_orderkey
"""


@register("incremental_delta_core", DELTA_ORACLE)
def incremental_delta_core(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders", columns=["o_orderkey", "o_totalprice"])
    url = F.concat(F.lit("https://irdai.gov.in/doc/"), F.col("o_orderkey").cast("string"))
    snapshot = orders.withColumn("document_url", url).select("document_url", "o_orderkey", "o_totalprice")
    existing = (
        orders.filter(F.col("o_orderkey") % 3 == 0)
        .select(url.alias("document_url"))
    )
    return incremental.delta_new_rows(snapshot, existing, "document_url").orderBy("o_orderkey")


# ---------------------------------------------------------------------------
# J4: failed-download MERGE upsert expressed relationally.
# Ref: storage/state.py:142-156.
# ---------------------------------------------------------------------------

UPSERT_ORACLE = """
WITH failed_old AS (
  SELECT 'doc_' || CAST(l_orderkey AS VARCHAR) AS url,
         'stale-error' AS error,
         1 + l_orderkey % 3 AS retries,
         l_shipdate AS last_attempt
  FROM lineitem WHERE l_returnflag = 'A' AND l_linenumber = 1
),
new_failures AS (
  SELECT 'doc_' || CAST(l_orderkey AS VARCHAR) AS url,
         'E' || CAST(l_linenumber AS VARCHAR) AS error,
         l_shipdate AS last_attempt
  FROM lineitem WHERE l_returnflag = 'R'
),
unioned AS (
  SELECT url, error, CAST(retries AS BIGINT) AS retries,
         last_attempt, strftime(last_attempt, '%Y-%m-%dT%H:%M:%S') || '|' || error AS kv
  FROM failed_old
  UNION ALL
  SELECT url, error, CAST(1 AS BIGINT), last_attempt,
         strftime(last_attempt, '%Y-%m-%dT%H:%M:%S') || '|' || error
  FROM new_failures
)
SELECT url,
       CAST(sum(retries) AS BIGINT) AS retries,
       split_part(max(kv), '|', 2) AS error,
       max(last_attempt) AS last_attempt
FROM unioned
GROUP BY url
ORDER BY url
"""


@register("failed_download_upsert", UPSERT_ORACLE)
def failed_download_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(
        spark, sf_dir, "lineitem",
        columns=["l_orderkey", "l_linenumber", "l_returnflag", "l_shipdate"],
    )
    url = F.concat(F.lit("doc_"), F.col("l_orderkey").cast("string"))
    failed_old = (
        li.filter((F.col("l_returnflag") == "A") & (F.col("l_linenumber") == 1))
        .select(
            url.alias("url"),
            F.lit("stale-error").alias("error"),
            (1 + F.col("l_orderkey") % 3).cast("long").alias("retries"),
            F.col("l_shipdate").alias("last_attempt"),
        )
    )
    new_failures = li.filter(F.col("l_returnflag") == "R").select(
        url.alias("url"),
        F.concat(F.lit("E"), F.col("l_linenumber").cast("string")).alias("error"),
        F.col("l_shipdate").alias("last_attempt"),
    )
    kv = lambda df: df.withColumn(  # noqa: E731
        "kv",
        F.concat(F.date_format("last_attempt", "yyyy-MM-dd'T'HH:mm:ss"), F.lit("|"), F.col("error")),
    )
    unioned = kv(failed_old).unionByName(
        kv(new_failures.withColumn("retries", F.lit(1).cast("long"))).select(
            "url", "error", "retries", "last_attempt", "kv"
        )
    )
    return (
        unioned.groupBy("url")
        .agg(
            F.sum("retries").alias("retries"),
            F.substring_index(F.max("kv"), "|", -1).alias("error"),
            F.max("last_attempt").alias("last_attempt"),
        )
        .select("url", "retries", "error", "last_attempt")
        .orderBy("url")
    )


# ---------------------------------------------------------------------------
# C2/O3: resume-from-checkpoint + page-range restriction as predicates.
# Ref: storage/state.py:115-117, cli.py:273-282, scraper/base.py:119-127.
# ---------------------------------------------------------------------------

RESUME_ORACLE = """
SELECT CAST(r.range AS BIGINT) AS page
FROM range(1, 201) r
WHERE r.range > 37 AND r.range BETWEEN 20 AND 150
ORDER BY page
"""


@register("resume_page_filter", RESUME_ORACLE)
def resume_page_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    pages = spark.range(1, 201).select(F.col("id").alias("page"))
    resumed = incremental.resume_filter(pages, last_completed_page=37)
    return resumed.filter(F.col("page").between(20, 150)).orderBy("page")


# ---------------------------------------------------------------------------
# S2-S6+P1-P5+F1-F3 end-to-end: the WHOLE fetch→parse→project pipeline
# run over deterministic synthetic listing HTML generated from `part`
# (60 rows/page, the Liferay page size). The oracle reproduces the
# surviving rows relationally — this pins the parse semantics, not just
# row counts. Rows with p_partkey % 13 == 0 get an empty UIN (F2 drop);
# % 7 == 0 get an archived row class (P4).
# ---------------------------------------------------------------------------

E2E_ORACLE = """
SELECT CAST(1 + CAST(floor(rn / 60) AS INT) AS BIGINT)  AS page,
       'P' || CAST(p_partkey AS VARCHAR)                AS uin,
       p_name                                           AS product_name,
       p_brand                                          AS insurer,
       CASE WHEN p_partkey % 7 = 0 THEN 'Archived' ELSE 'Non-Archived' END AS archive_status,
       'https://irdai.gov.in/documents/' || CAST(p_partkey AS VARCHAR) || '.pdf' AS document_url,
       'Brochure ' || CAST(p_partkey AS VARCHAR)        AS document_filename
FROM (
  SELECT p.*, row_number() OVER (ORDER BY p_partkey) - 1 AS rn
  FROM part p
)
WHERE p_partkey % 13 <> 0
ORDER BY uin
"""


@register("scrape_e2e_parse", E2E_ORACLE)
def scrape_e2e_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Generates one HTML listing page per 60 part rows — entirely
    distributed (row_number → per-page ``groupBy`` assembling the page
    HTML with collect_list/array_sort; nothing is collected to the
    driver) — then runs the real parse+project pipeline over the page
    snapshot relation via :func:`http.parse_pages`. The sort-by-partkey
    pagination makes page assignment deterministic."""
    from insurance_helper_spark.sources import http

    part = load_table(spark, sf_dir, "part", columns=["p_partkey", "p_name", "p_brand"])
    pk = F.col("p_partkey")
    rn = F.row_number().over(Window.orderBy("p_partkey")) - 1
    tr = F.concat(
        F.when(pk % 7 == 0, F.lit('<tr class="archive-row">')).otherwise(F.lit("<tr>")),
        F.lit("<td></td><td>"), pk.cast("string"),
        F.lit("</td><td>FY 2020-21</td><td>"), F.col("p_brand"),
        F.lit("</td><td>"), F.col("p_name"), F.lit("</td><td>Retail</td><td>"),
        F.when(pk % 13 == 0, F.lit("")).otherwise(F.concat(F.lit("P"), pk.cast("string"))),
        F.lit('</td><td>01-04-2020</td><td><a href="/documents/'), pk.cast("string"),
        F.lit('.pdf">Brochure '), pk.cast("string"), F.lit("</a></td></tr>"),
    )
    rows = part.select((F.floor(rn / 60) + 1).alias("page"), rn.alias("rn"), tr.alias("tr"))
    pages_html = rows.groupBy("page").agg(
        F.concat(
            F.lit(
                '<html><body><div class="portlet"><table class="table">'
                "<thead><tr><th>h</th></tr></thead><tbody>"
            ),
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("rn", "tr"))), lambda s: s["tr"]
                ),
                "",
            ),
            F.lit("</tbody></table></div></body></html>"),
        ).alias("html")
    )
    # r14: AQE coalesces the ~2 MB page relation to ONE post-shuffle
    # partition, serializing the Python parse of every page on a single
    # task (guide §2.5 — partition by compute fan-out, not input
    # bytes; measured 3.8 → 1.3 s for the parse leg at sf0.1). Values
    # are per-page, ordering re-normalized by the final orderBy.
    pages_html = pages_html.repartition(spark.sparkContext.defaultParallelism)
    products = http.project_products(http.parse_pages(pages_html), "nonlife")
    return products.select(
        "page",
        "uin",
        "product_name",
        "insurer",
        "archive_status",
        "document_url",
        "document_filename",
    ).orderBy("uin")


# ---------------------------------------------------------------------------
# K2 + K3 (life_list variant): extension inference with the reference's
# .pdf → .xlsx → .xls precedence over the percent-decoded URL path, and
# the FLAT life_list download path (no FY/insurer tree).
# Ref: downloader/file_manager.py:31-45 (extract_extension_from_url),
# :84-99 (_get_life_list_path). URL cases exercised: plain .pdf,
# multi-extension '.pdf.xlsx' (→ .pdf — precedence), .xlsx, a
# percent-encoded '%20' path with .xls, and an extension-less path
# whose querystring says xlsx (→ whole-URL fallback '.xlsx').
# ---------------------------------------------------------------------------

LIFE_LIST_ORACLE = r"""
WITH base AS (
  SELECT p_partkey AS pk,
         'https://irdai.gov.in/documents/' ||
         CASE CAST(p_partkey % 5 AS INTEGER)
           WHEN 0 THEN 'doc' || CAST(p_partkey AS VARCHAR) || '.pdf'
           WHEN 1 THEN 'doc' || CAST(p_partkey AS VARCHAR) || '.pdf.xlsx'
           WHEN 2 THEN 'doc' || CAST(p_partkey AS VARCHAR) || '.xlsx'
           WHEN 3 THEN 'doc%20' || CAST(p_partkey AS VARCHAR) || '.xls'
           ELSE 'doc' || CAST(p_partkey AS VARCHAR) || '?format=xlsx'
         END AS url,
         CASE WHEN p_partkey % 3 = 0 THEN NULL
              WHEN p_partkey % 3 = 1 THEN 'Report ' || CAST(p_partkey AS VARCHAR)
              ELSE 'file ' || CAST(p_partkey AS VARCHAR) || '.pdf'
         END AS document_filename,
         p_name AS short_description
  FROM part
),
ext AS (
  SELECT *,
         replace(regexp_extract(url, '^[a-z]+://[^/]+(/[^?#]*)', 1), '%20', ' ') AS path,
         lower(url) AS whole
  FROM base
),
inferred AS (
  SELECT pk, url, document_filename, short_description,
         CASE WHEN contains(lower(path), '.pdf')  THEN '.pdf'
              WHEN contains(lower(path), '.xlsx') THEN '.xlsx'
              WHEN contains(lower(path), '.xls')  THEN '.xls'
              WHEN contains(whole, 'xlsx') OR contains(whole, 'xls') THEN '.xlsx'
              ELSE '.pdf' END AS ext
  FROM ext
),
named AS (
  SELECT pk, url, ext,
         (SELECT CASE WHEN x = '' THEN 'unknown' ELSE x END FROM
           (SELECT substring(trim(regexp_replace(regexp_replace(coalesce(document_filename, ''), '[<>:"/\\|?*]', '-', 'g'), '[-\s]+', '-', 'g'), '-'), 1, 100) AS x)) AS fname,
         (SELECT CASE WHEN x = '' THEN 'unknown' ELSE x END FROM
           (SELECT substring(trim(regexp_replace(regexp_replace(short_description, '[<>:"/\\|?*]', '-', 'g'), '[-\s]+', '-', 'g'), '-'), 1, 100) AS x)) AS desc_s
  FROM inferred
)
SELECT pk, ext,
       'downloads/life_list/' ||
       CASE WHEN fname = 'unknown' AND pk % 3 = 0
            THEN desc_s || ext
            WHEN ends_with(fname, ext) THEN fname
            ELSE fname || ext END AS download_path
FROM named
ORDER BY pk
"""


@register("scrape_life_list_path", LIFE_LIST_ORACLE)
def scrape_life_list_path(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LIFE list-page URL construction for every product row (ref list_scraper.py URL template), driver-checked string arithmetic."""
    part = load_table(spark, sf_dir, "part", columns=["p_partkey", "p_name"])
    pk = F.col("p_partkey")
    pks = pk.cast("string")
    url = F.concat(
        F.lit("https://irdai.gov.in/documents/"),
        F.when(pk % 5 == 0, F.concat(F.lit("doc"), pks, F.lit(".pdf")))
        .when(pk % 5 == 1, F.concat(F.lit("doc"), pks, F.lit(".pdf.xlsx")))
        .when(pk % 5 == 2, F.concat(F.lit("doc"), pks, F.lit(".xlsx")))
        .when(pk % 5 == 3, F.concat(F.lit("doc%20"), pks, F.lit(".xls")))
        .otherwise(F.concat(F.lit("doc"), pks, F.lit("?format=xlsx"))),
    )
    document_filename = (
        F.when(pk % 3 == 0, F.lit(None).cast("string"))
        .when(pk % 3 == 1, F.concat(F.lit("Report "), pks))
        .otherwise(F.concat(F.lit("file "), pks, F.lit(".pdf")))
    )
    df = part.select(
        pk.alias("pk"),
        url.alias("url"),
        document_filename.alias("document_filename"),
        F.col("p_name").alias("short_description"),
    )
    ext = cleaning.extension_from_url(F.col("url"))
    return df.select(
        "pk",
        ext.alias("ext"),
        cleaning.life_list_path(
            F.col("document_filename"), F.col("short_description"), ext
        ).alias("download_path"),
    ).orderBy("pk")


# ---------------------------------------------------------------------------
# W3: object-store sink column logic — content-type by extension, object
# key normalization (backslash → slash, leading slashes stripped), and
# public-URL synthesis. Ref: storage/r2_uploader.py:160-183 (_get_content_type,
# generate_r2_key), :60-87 (public URL). The IO half (exists/delete/list/
# verified write over Hadoop FileSystem + s3a conf) is exercised in
# tests/test_sinks.py.
# ---------------------------------------------------------------------------

OBJECT_KEYS_ORACLE = r"""
WITH manifest AS (
  SELECT p_partkey AS pk,
         CASE CAST(p_partkey % 4 AS INTEGER)
           WHEN 0 THEN 'life' WHEN 1 THEN 'nonlife'
           WHEN 2 THEN 'health' ELSE 'life_list' END AS product_type,
         CASE CAST(p_partkey % 3 AS INTEGER)
           WHEN 0 THEN '/FY-2024/Insurer A/'
           WHEN 1 THEN 'FY-2024\Insurer B\'
           ELSE 'FY-2025/Insurer C/' END ||
         'doc' || CAST(p_partkey AS VARCHAR) ||
         CASE CAST(p_partkey % 6 AS INTEGER)
           WHEN 0 THEN '.pdf' WHEN 1 THEN '.xlsx' WHEN 2 THEN '.xls'
           WHEN 3 THEN '.csv' WHEN 4 THEN '.json' ELSE '' END AS rel_path
  FROM part
),
final AS (
  SELECT pk,
         product_type || '/' || replace(rel_path, '\', '/') AS joined,
         replace(rel_path, '\', '/') AS rel_norm
  FROM manifest
)
SELECT pk,
       regexp_replace(joined, '^/+', '') AS r2_key,
       CASE lower(regexp_extract(regexp_extract(rel_norm, '([^/]*)$', 1), '(\.[^.]+)$', 1))
         WHEN '.pdf'  THEN 'application/pdf'
         WHEN '.xlsx' THEN 'application/vnd.openxmlformats-officedocument.spreadsheetml.sheet'
         WHEN '.xls'  THEN 'application/vnd.ms-excel'
         WHEN '.csv'  THEN 'text/csv'
         WHEN '.json' THEN 'application/json'
         ELSE 'application/octet-stream' END AS content_type,
       'https://docs.example.org/' || regexp_replace(joined, '^/+', '') AS public_url
FROM final
ORDER BY pk
"""


@register("scrape_object_keys", OBJECT_KEYS_ORACLE)
def scrape_object_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Object-store key + public-URL derivation for scraped documents (ref r2_uploader.generate_r2_key)."""
    from insurance_helper_spark.sources import object_store

    part = load_table(spark, sf_dir, "part", columns=["p_partkey"])
    pk = F.col("p_partkey")
    pks = pk.cast("string")
    product_type = (
        F.when(pk % 4 == 0, F.lit("life"))
        .when(pk % 4 == 1, F.lit("nonlife"))
        .when(pk % 4 == 2, F.lit("health"))
        .otherwise(F.lit("life_list"))
    )
    rel_path = F.concat(
        F.when(pk % 3 == 0, F.lit("/FY-2024/Insurer A/"))
        .when(pk % 3 == 1, F.lit("FY-2024\\Insurer B\\"))
        .otherwise(F.lit("FY-2025/Insurer C/")),
        F.lit("doc"),
        pks,
        F.when(pk % 6 == 0, F.lit(".pdf"))
        .when(pk % 6 == 1, F.lit(".xlsx"))
        .when(pk % 6 == 2, F.lit(".xls"))
        .when(pk % 6 == 3, F.lit(".csv"))
        .when(pk % 6 == 4, F.lit(".json"))
        .otherwise(F.lit("")),
    )
    df = part.select(pk.alias("pk"), product_type.alias("pt"), rel_path.alias("rel"))
    key = object_store.object_key(F.col("pt"), F.col("rel"))
    return df.select(
        "pk",
        key.alias("r2_key"),
        object_store.content_type_for(F.col("rel")).alias("content_type"),
        object_store.public_url("https://docs.example.org/", key).alias("public_url"),
    ).orderBy("pk")


# ---------------------------------------------------------------------------
# O4 retry-destination naming (ref cli.py:444-445): deterministic
# retry path per failed URL — sha2-prefix + reference-precedence
# extension, the exact expression operators/state.retry_failed uses
# (cleaning.retry_destination), driver-checked here over the same four
# URL shapes as scrape_cleaning_chain.
# ---------------------------------------------------------------------------

RETRY_DEST_ORACLE = r"""
WITH raw AS (
  SELECT p_partkey,
         CASE p_partkey % 4
           WHEN 0 THEN 'https://irdai.gov.in/documents/d' || CAST(p_partkey AS VARCHAR) || '/product-brochure.pdf?download=true'
           WHEN 1 THEN 'https://irdai.gov.in/files/' || CAST(p_partkey AS VARCHAR) || '/Listing.XLSX'
           WHEN 2 THEN 'https://irdai.gov.in/portal/view/' || CAST(p_partkey AS VARCHAR)
           ELSE 'https://cdn.example.org/xls-export?id=' || CAST(p_partkey AS VARCHAR)
         END AS url
  FROM part
)
SELECT p_partkey, url,
       'downloads/retry/file_' || substring(sha256(url), 1, 16) ||
       CASE WHEN contains(lower(string_split(url, '?')[1]), '.pdf') THEN '.pdf'
            WHEN contains(lower(string_split(url, '?')[1]), '.xlsx') THEN '.xlsx'
            WHEN contains(lower(string_split(url, '?')[1]), '.xls') THEN '.xls'
            WHEN contains(lower(url), 'xlsx') OR contains(lower(url), 'xls') THEN '.xlsx'
            ELSE '.pdf'
       END AS destination
FROM raw
ORDER BY p_partkey
"""


@register("scrape_retry_dest", RETRY_DEST_ORACLE)
def scrape_retry_dest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Retry destination paths for failed downloads — the exact cleaning.retry_destination expression over the four URL shapes."""
    part = load_table(spark, sf_dir, "part", columns=["p_partkey"])
    url = (
        F.when(
            F.col("p_partkey") % 4 == 0,
            F.concat(F.lit("https://irdai.gov.in/documents/d"), F.col("p_partkey").cast("string"),
                     F.lit("/product-brochure.pdf?download=true")),
        )
        .when(
            F.col("p_partkey") % 4 == 1,
            F.concat(F.lit("https://irdai.gov.in/files/"), F.col("p_partkey").cast("string"),
                     F.lit("/Listing.XLSX")),
        )
        .when(
            F.col("p_partkey") % 4 == 2,
            F.concat(F.lit("https://irdai.gov.in/portal/view/"), F.col("p_partkey").cast("string")),
        )
        .otherwise(
            F.concat(F.lit("https://cdn.example.org/xls-export?id="), F.col("p_partkey").cast("string"))
        )
    )
    return (
        part.withColumn("url", url)
        .select(
            "p_partkey",
            "url",
            cleaning.retry_destination(F.col("url")).alias("destination"),
        )
        .orderBy("p_partkey")
    )


# ---------------------------------------------------------------------------
# PII redaction — a training-data pipeline cleaning stage: detect and
# mask emails and phone numbers in free text (synthesized here from
# customer rows since the fixture corpus carries no PII), plus a
# pseudonymization key for joining redacted records back to identity
# under access control. Pure regexp column expressions; the patterns
# are written in the common Java-regex/RE2 subset so Spark and DuckDB
# agree byte-for-byte.
# ---------------------------------------------------------------------------

PII_ORACLE = r"""
WITH raw AS (
  SELECT c_custkey, c_name,
         'Reach ' || c_name || ' at ' ||
         lower(replace(c_name, '#', '')) || '@example.com or +91-98' ||
         lpad(CAST(c_custkey % 100000000 AS VARCHAR), 8, '0') || ' today' AS note
  FROM customer
)
SELECT c_custkey,
       regexp_replace(
         regexp_replace(note, '[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}', '[EMAIL]', 'g'),
         '\+?[0-9][0-9-]{8,}', '[PHONE]', 'g') AS note_redacted,
       len(regexp_extract_all(note, '[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}')) AS n_emails,
       len(regexp_extract_all(note, '\+?[0-9][0-9-]{8,}')) AS n_phones,
       substring(sha256(c_name), 1, 16) AS person_key
FROM raw
ORDER BY c_custkey
"""


@register("pii_redact_notes", PII_ORACLE)
def pii_redact_notes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII redaction of free-text notes: email/phone masking via engine-portable regexes."""
    cust = load_table(spark, sf_dir, "customer", columns=["c_custkey", "c_name"])
    note = F.concat(
        F.lit("Reach "), F.col("c_name"), F.lit(" at "),
        F.lower(F.regexp_replace("c_name", "#", "")), F.lit("@example.com or +91-98"),
        F.lpad((F.col("c_custkey") % 100000000).cast("string"), 8, "0"),
        F.lit(" today"),
    )
    email_re = r"[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}"
    phone_re = r"\+?[0-9][0-9-]{8,}"
    redacted = F.regexp_replace(
        F.regexp_replace(F.col("note"), email_re, "[EMAIL]"), phone_re, "[PHONE]"
    )
    return (
        cust.withColumn("note", note)
        .select(
            "c_custkey",
            redacted.alias("note_redacted"),
            F.size(F.regexp_extract_all("note", F.lit(email_re), F.lit(0)))
            .cast("long")
            .alias("n_emails"),
            F.size(F.regexp_extract_all("note", F.lit(phone_re), F.lit(0)))
            .cast("long")
            .alias("n_phones"),
            F.substring(cleaning.url_key(F.col("c_name")), 1, 16).alias("person_key"),
        )
        .orderBy("c_custkey")
    )

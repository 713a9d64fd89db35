"""String-cleaning operators as pure column expressions (no UDFs).

These re-express the reference's row-at-a-time Python cleaners as
Catalyst-native expressions, so they run inside whole-stage codegen and
scale linearly with no Python round-trips:

- P1 cell-text clean     (ref: scraper/parser.py:40-46)
- P3 filename-from-URL   (ref: scraper/parser.py:78-89)
- P4 archive classifier  (ref: scraper/parser.py:91-107)
- K1 filename sanitizer  (ref: downloader/file_manager.py:19-29)
- K2 extension inference (ref: downloader/file_manager.py:31-45)
- K3 partitioned path    (ref: downloader/file_manager.py:47-114)

Every function takes and returns a ``Column``, so they compose freely
inside ``select``/``withColumn`` and are usable in both batch and
streaming plans.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def clean_text(col: Column) -> Column:
    """P1: collapse all whitespace runs to one space and trim.

    Ref behavior: BeautifulSoup get_text → re.sub(r"\\s+", " ", s).strip()
    (parser.py:40-46).
    """
    return F.trim(F.regexp_replace(col, r"\s+", " "))


def filename_from_url(url: Column) -> Column:
    """P3: extract a document filename from a URL.

    First match ``/<name>.(pdf|xlsx|xls)`` case-insensitively; else fall
    back to the last path segment with any querystring stripped
    (parser.py:78-89). Returns NULL for empty/NULL urls.
    """
    direct = F.regexp_extract(url, r"(?i)/([^/?]+\.(?:pdf|xlsx|xls))", 1)
    last_seg = F.element_at(F.split(F.split(url, r"\?").getItem(0), "/"), -1)
    out = F.when(direct != "", direct).otherwise(last_seg)
    return F.when(url.isNull() | (url == ""), F.lit(None).cast("string")).otherwise(out)


def archive_status(row_class: Column, first_cell: Column) -> Column:
    """P4: classify a row as Archived / Non-Archived.

    Cascade (parser.py:91-107): row class contains 'archive' → Archived;
    else first-cell text says 'non-archived' → Non-Archived; says
    'archived' → Archived; default Non-Archived.
    """
    fc = F.lower(F.coalesce(first_cell, F.lit("")))
    return (
        F.when(F.lower(F.coalesce(row_class, F.lit(""))).contains("archive"), F.lit("Archived"))
        .when(fc.contains("non-archived"), F.lit("Non-Archived"))
        .when(fc.contains("archived"), F.lit("Archived"))
        .otherwise(F.lit("Non-Archived"))
    )


def sanitize_filename(name: Column, max_length: int = 100) -> Column:
    """K1: make a string filesystem-safe.

    Replace ``<>:"/\\|?*`` with ``-``, collapse ``[-\\s]+`` runs to a
    single ``-``, trim leading/trailing ``-`` and spaces, truncate to
    ``max_length``, and map empty → 'unknown' (file_manager.py:19-29).
    Unicode (e.g. Devanagari filenames in life_list) passes through
    untouched — only the reserved ASCII set is replaced.
    """
    s = F.regexp_replace(name, r'[<>:"/\\|?*]', "-")
    s = F.regexp_replace(s, r"[-\s]+", "-")
    s = F.regexp_replace(s, r"^[-\s]+|[-\s]+$", "")
    s = F.substring(s, 1, max_length)
    return F.when((s == "") | s.isNull(), F.lit("unknown")).otherwise(s)


def extension_from_url(url: Column) -> Column:
    """K2: infer a file extension from a URL.

    ``.pdf``/``.xlsx``/``.xls`` in the pre-querystring path wins; else a
    bare 'xlsx'/'xls' substring anywhere in the URL → '.xlsx'; default
    '.pdf' (file_manager.py:31-45).
    """
    path = F.lower(F.split(url, r"\?").getItem(0))
    whole = F.lower(F.coalesce(url, F.lit("")))
    return (
        F.when(path.contains(".xlsx"), F.lit(".xlsx"))
        .when(path.contains(".xls"), F.lit(".xls"))
        .when(path.contains(".pdf"), F.lit(".pdf"))
        .when(whole.contains("xlsx") | whole.contains("xls"), F.lit(".xlsx"))
        .otherwise(F.lit(".pdf"))
    )


def partitioned_path(
    product_type: Column,
    financial_year: Column,
    insurer: Column,
    uin: Column,
    product_name: Column,
    extension: Column,
    base: str = "downloads",
) -> Column:
    """K3: synthesize the 3-level partitioned download path.

    ``{base}/{type}/{FY}/{Insurer}/{UIN}_{Product}{ext}``
    (file_manager.py:47-114). Each path component is sanitized (K1).
    At scale the physical layout equivalent is
    ``df.write.partitionBy('product_type','financial_year','insurer')``.
    """
    return F.concat_ws(
        "/",
        F.lit(base),
        sanitize_filename(product_type),
        sanitize_filename(F.coalesce(financial_year, F.lit("unknown"))),
        sanitize_filename(F.coalesce(insurer, F.lit("unknown"))),
        F.concat(
            sanitize_filename(F.concat_ws("_", uin, product_name)),
            extension,
        ),
    )


def url_key(url: Column) -> Column:
    """Stable dedup key for a URL: sha2-256 hex.

    The reference keys work off raw ``document_url`` strings
    (delta_download.py:191); a fixed-width hash key shuffles and
    compares cheaper at 100 TB. sha2 (not Spark ``hash``) so the DuckDB
    oracle can reproduce it exactly.
    """
    return F.sha2(url, 256)

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

    Reference semantics (file_manager.py:31-45): percent-decode the
    urlparse path (pre-query, pre-fragment), then check ``.pdf`` →
    ``.xlsx`` → ``.xls`` IN THAT ORDER as substrings of the lowercased
    path (so 'a.pdf.xlsx' classifies as .pdf); else a bare 'xlsx'/'xls'
    anywhere in the URL → '.xlsx'; default '.pdf'.

    Percent-decoding matches Python ``unquote``: '+' is NOT a space, so
    literal '+' is shielded as %2B before url_decode; a malformed escape
    falls back to the raw path (try_url_decode → NULL → coalesce).
    """
    # urlparse().path: parse_url for absolute URLs (host/query/fragment
    # excluded — 'www.pdf.com' must not match '.pdf'); split fallback
    # for scheme-less relative paths where parse_url yields NULL.
    raw_path = F.coalesce(
        F.parse_url(url, F.lit("PATH")),
        F.split(F.split(url, r"\?").getItem(0), "#").getItem(0),
    )
    shielded = F.regexp_replace(raw_path, r"\+", "%2B")
    path = F.lower(F.coalesce(F.try_url_decode(shielded), raw_path))
    whole = F.lower(F.coalesce(url, F.lit("")))
    return (
        F.when(path.contains(".pdf"), F.lit(".pdf"))
        .when(path.contains(".xlsx"), F.lit(".xlsx"))
        .when(path.contains(".xls"), F.lit(".xls"))
        .when(whole.contains("xlsx") | whole.contains("xls"), F.lit(".xlsx"))
        .otherwise(F.lit(".pdf"))
    )


def _or_default(col: Column, default: str) -> Column:
    """Python's ``s or "default"`` for string columns (NULL or '' → default)."""
    return F.when(col.isNull() | (col == ""), F.lit(default)).otherwise(col)


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

    ``{base}/{type}/{FY}/{Insurer}/{UIN}_{Product}{ext}`` for
    life/nonlife/health (file_manager.py:70-114). Reference parity
    details: each component is sanitized INDIVIDUALLY (uin and
    product_name separately, then joined with '_' — a trailing dash in
    the uin is trimmed before the underscore, not collapsed after) and
    the empty-fallbacks are the reference's: 'unknown-fy',
    'unknown-insurer', 'unknown' (uin), 'product' (name).
    At scale the physical layout equivalent is
    ``df.write.partitionBy('product_type','financial_year','insurer')``.
    life_list uses the flat layout — see :func:`life_list_path`.
    """
    return F.concat_ws(
        "/",
        F.lit(base),
        sanitize_filename(product_type),
        sanitize_filename(_or_default(financial_year, "unknown-fy")),
        sanitize_filename(_or_default(insurer, "unknown-insurer")),
        F.concat(
            sanitize_filename(_or_default(uin, "unknown")),
            F.lit("_"),
            sanitize_filename(_or_default(product_name, "product")),
            extension,
        ),
    )


def life_list_path(
    document_filename: Column,
    short_description: Column,
    extension: Column,
    base: str = "downloads",
) -> Column:
    """K3 (life_list variant): the FLAT path ``{base}/life_list/{filename}``.

    Reference (file_manager.py:84-99): prefer the sanitized original
    ``document_filename`` — appending the inferred extension only when
    the sanitized name doesn't already end with it — else fall back to
    ``{sanitize(short_description) or 'unknown'}{ext}``. No
    FY/insurer tree for this product type.
    """
    fname = sanitize_filename(document_filename)
    from_file = F.when(
        fname.endswith(extension), fname
    ).otherwise(F.concat(fname, extension))
    from_desc = F.concat(
        sanitize_filename(_or_default(short_description, "unknown")), extension
    )
    filename = F.when(
        document_filename.isNull() | (document_filename == ""), from_desc
    ).otherwise(from_file)
    return F.concat_ws("/", F.lit(base), F.lit("life_list"), filename)


def url_key(url: Column) -> Column:
    """Stable dedup key for a URL: sha2-256 hex.

    The reference keys work off raw ``document_url`` strings
    (delta_download.py:191); a fixed-width hash key shuffles and
    compares cheaper at 100 TB. sha2 (not Spark ``hash``) so the DuckDB
    oracle can reproduce it exactly.
    """
    return F.sha2(url, 256)


def retry_destination(url: Column, retry_dir: str = "downloads/retry") -> Column:
    """Deterministic retry-download destination (ref cli.py:444-445:
    ``file_{hash(url)}{ext}``).

    The reference uses Python ``hash()`` — process-seeded, so the same
    URL maps to different files across runs/executors; here the prefix
    is the first 16 hex chars of sha2-256, stable everywhere (and
    oracle-reproducible via DuckDB ``sha256``). Extension inference
    follows the reference precedence (extension_from_url).
    """
    return F.concat(
        F.lit(retry_dir + "/file_"),
        F.substring(url_key(url), 1, 16),
        extension_from_url(url),
    )

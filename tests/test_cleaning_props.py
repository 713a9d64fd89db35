"""Property-based tests (hypothesis) for the string-cleaning operators —
the SURVEY §5 invariants, including the Unicode hard-part (Devanagari
filenames from life_list must survive K1/K3)."""

from __future__ import annotations

import re

import pytest
from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F

from insurance_helper_spark.functions import cleaning

FORBIDDEN = set('<>:"/\\|?*')

# Mixed pool: ASCII, reserved chars, whitespace, Devanagari, CJK.
NAME_CHARS = st.sampled_from(
    list("abcXYZ019 -_.") + list('<>:"/\\|?*\t\n') + list("जीवनबीमा保险")
)
NAMES = st.text(alphabet=NAME_CHARS, min_size=0, max_size=150)


@pytest.fixture(scope="module")
def sanitize_fn(spark):
    """Evaluate sanitize_filename via Spark for arbitrary driver strings."""

    def run(values: list[str]) -> list[str]:
        df = spark.createDataFrame([(v,) for v in values], "name string")
        out = df.select(cleaning.sanitize_filename(F.col("name")).alias("s"))
        return [r["s"] for r in out.collect()]

    return run


@settings(max_examples=30, deadline=None)
@given(st.lists(NAMES, min_size=1, max_size=20))
def test_sanitize_invariants(sanitize_fn, values):
    for raw, out in zip(values, sanitize_fn(values)):
        # never empty, never contains a reserved char or whitespace run,
        # never longer than 100, never leading/trailing dash
        assert out != "" and out is not None
        assert not (set(out) & FORBIDDEN), (raw, out)
        assert len(out) <= 100
        assert not re.search(r"\s", out) or out == "unknown"
        assert not out.startswith("-") and not out.endswith("-") or out == "unknown"


def test_sanitize_preserves_devanagari(sanitize_fn):
    [out] = sanitize_fn(["जीवन बीमा योजना.pdf"])
    assert "जीवन" in out and "/" not in out


def test_partitioned_path_unicode_roundtrip(spark):
    df = spark.createDataFrame(
        [("life_list", "FY 2018-19", "भारतीय जीवन बीमा", "UIN<1>", "योजना/2018")],
        "pt string, fy string, insurer string, uin string, name string",
    )
    out = df.select(
        cleaning.partitioned_path(
            F.col("pt"), F.col("fy"), F.col("insurer"), F.col("uin"), F.col("name"),
            F.lit(".pdf"),
        ).alias("p")
    ).first()["p"]
    parts = out.split("/")
    # exactly base/type/fy/insurer/file — reserved chars in components
    # must NOT create extra path levels
    assert len(parts) == 5, out
    assert parts[0] == "downloads" and parts[4].endswith(".pdf")
    assert "भारतीय" in parts[3]


def test_extension_precedence_matches_reference(spark):
    """K2 parity (ref file_manager.py:31-45): .pdf → .xlsx → .xls over
    the PERCENT-DECODED urlparse path; host is excluded; '+' is literal
    (unquote semantics, not application/x-www-form-urlencoded)."""
    cases = [
        ("https://x.org/a.pdf.xlsx", ".pdf"),        # multi-ext: .pdf wins
        ("https://x.org/a.xlsx.pdf", ".pdf"),        # order-independent
        ("https://x.org/file%2Exlsx", ".xlsx"),      # %2E decodes to '.'
        ("https://x.org/a+b.xls", ".xls"),           # '+' stays literal
        ("https://www.pdf.com/report", ".pdf"),      # host NOT matched → default
        ("https://www.pdf.com/list-xlsx", ".xlsx"),  # whole-url fallback
        ("docs/Listing.XLSX?v=2", ".xlsx"),          # relative URL fallback path
        ("https://x.org/doc%20name.PDF?d=1", ".pdf"),
    ]
    df = spark.createDataFrame(cases, "url string, expected string")
    rows = df.select("url", "expected",
                     cleaning.extension_from_url(F.col("url")).alias("got")).collect()
    for r in rows:
        assert r["got"] == r["expected"], (r["url"], r["got"], r["expected"])


def test_life_list_flat_path_matches_reference(spark):
    """K3 life_list parity (ref file_manager.py:84-99): flat
    downloads/life_list/{filename}; original filename wins, extension
    appended only when missing; description fallback when absent."""
    cases = [
        ("Annual Report.pdf", "ignored", ".pdf", "downloads/life_list/Annual-Report.pdf"),
        ("Annual Report", "ignored", ".xlsx", "downloads/life_list/Annual-Report.xlsx"),
        (None, "योजना list", ".pdf", "downloads/life_list/योजना-list.pdf"),
        ("", "some desc", ".xls", "downloads/life_list/some-desc.xls"),
        (None, None, ".pdf", "downloads/life_list/unknown.pdf"),
    ]
    df = spark.createDataFrame(cases, "fname string, sdesc string, ext string, expected string")
    rows = df.select("expected",
                     cleaning.life_list_path(F.col("fname"), F.col("sdesc"),
                                             F.col("ext")).alias("got")).collect()
    for r in rows:
        assert r["got"] == r["expected"], (r["got"], r["expected"])


def test_partitioned_path_reference_defaults(spark):
    """Empty/NULL components fall back to the reference's literals:
    unknown-fy / unknown-insurer / unknown (uin) / product (name)
    (ref file_manager.py:70-80)."""
    df = spark.createDataFrame(
        [("life", None, "", None, None)],
        "pt string, fy string, insurer string, uin string, name string",
    )
    out = df.select(
        cleaning.partitioned_path(F.col("pt"), F.col("fy"), F.col("insurer"),
                                  F.col("uin"), F.col("name"), F.lit(".pdf")).alias("p")
    ).first()["p"]
    assert out == "downloads/life/unknown-fy/unknown-insurer/unknown_product.pdf", out


def test_per_component_sanitization(spark):
    """uin and product_name sanitize SEPARATELY before the '_' join — a
    trailing dash in the uin survives as '-_' is NOT collapsed after the
    fact (ref builds the filename from pre-sanitized parts)."""
    df = spark.createDataFrame([("life", "FY", "Ins", "UIN-9-", "Plan A")],
                               "pt string, fy string, insurer string, uin string, name string")
    out = df.select(
        cleaning.partitioned_path(F.col("pt"), F.col("fy"), F.col("insurer"),
                                  F.col("uin"), F.col("name"), F.lit(".pdf")).alias("p")
    ).first()["p"]
    # reference: sanitize('UIN-9-') = 'UIN-9', sanitize('Plan A') = 'Plan-A'
    assert out.endswith("/UIN-9_Plan-A.pdf"), out


# ---------------------------------------------------------------------------
# Rolling-hash fingerprint: the Spark fold must equal the obvious
# pure-Python Rabin–Karp over the same normalization, for arbitrary
# text including Unicode (normalize_text keeps letters/digits of any
# script, so ascii() sees code points > 127 too).
# ---------------------------------------------------------------------------

TEXT_CHARS = st.sampled_from(
    list("abz019 .,!?-") + list("\t\n") + list("जीवन保险")
)
TEXTS = st.text(alphabet=TEXT_CHARS, min_size=0, max_size=80)


def _py_rolling(text: str, mod: int = 1_000_000_007, base: int = 31) -> int:
    import unicodedata

    # mirror normalize_text: non-[\p{L}\p{N}] runs → single space, trim
    mapped = "".join(
        ch if unicodedata.category(ch)[0] in ("L", "N") else " "
        for ch in text.lower()
    )
    norm = re.sub(" +", " ", mapped).strip()
    h = 0
    for ch in norm:
        h = (h * base + ord(ch)) % mod
    return h


@pytest.fixture(scope="module")
def rolling_fn(spark):
    from insurance_helper_spark.functions import text as T

    def run(values: list[str]) -> list[int]:
        df = spark.createDataFrame([(v,) for v in values], "t string")
        out = df.select(T.rolling_fingerprint(F.col("t")).alias("h"))
        return [r["h"] for r in out.collect()]

    return run


@settings(max_examples=30, deadline=None)
@given(st.lists(TEXTS, min_size=1, max_size=8))
def test_rolling_fingerprint_matches_python(rolling_fn, texts):
    got = rolling_fn(texts)
    want = [_py_rolling(t) for t in texts]
    assert got == want


# ---- business-day arithmetic (functions/dates.py) ----


class TestBusinessDaysBetween:
    def test_matches_bruteforce_enumeration(self, spark):
        """Closed-form weekday count == literal day-walk for every start
        day-of-week and every span 0..21 (covers all mod-7 phases)."""
        import datetime as dt

        from insurance_helper_spark.functions.dates import business_days_between

        base = dt.date(2024, 1, 1)  # a Monday
        rows = []
        for start_off in range(7):
            d1 = base + dt.timedelta(days=start_off)
            for span in range(22):
                d2 = d1 + dt.timedelta(days=span)
                expect = sum(
                    (d1 + dt.timedelta(days=t)).weekday() < 5
                    for t in range(1, span + 1)
                )
                rows.append((d1, d2, expect))
        df = spark.createDataFrame(rows, "d1 date, d2 date, expect long")
        out = df.select(
            "expect",
            business_days_between(F.col("d1"), F.col("d2")).alias("got"),
        ).collect()
        for r in out:
            assert r.got == r.expect

    def test_sql_twin_matches_spark(self, spark):
        import duckdb

        from insurance_helper_spark.functions.dates import (
            business_days_between_sql,
        )

        frag = business_days_between_sql("DATE '2024-01-03'", "DATE '2024-01-17'")
        got = duckdb.connect().execute(f"SELECT {frag}").fetchone()[0]
        assert got == 10  # two full weeks from a Wednesday: 10 weekdays


class TestDirtyDateShapeGates:
    def test_gated_trials_equal_ungated_coalesce(self, spark):
        """The r13 per-format shape gates must be NECESSARY conditions
        only: for every adversarial head, the gated parse equals the
        raw 5-way try_to_timestamp coalesce bit-for-bit."""
        from insurance_helper_spark.functions import dates

        vals = [
            "2018-06-04", "04-06-2018", "04/06/2018", "2018/06/04",
            "04-Jan-2018", "04-JAN-2018", "04-jan-2018", "4-Jan-2018",
            "2018-06-04 04-06-2018", "not a date", "", "  2018-06-04  ",
            "18-06-04", "2018-6-4", "12345-01-01", "0018-06-04",
            "2018-13-04", "31-02-2019", "+2018-06-04", "2018-06-04x",
            "99/99/9999", "00-00-0000",
        ]
        df = spark.createDataFrame([(v,) for v in vals], "s string")
        head = F.split(F.trim(F.col("s")), r"\s+").getItem(0)
        ungated = F.coalesce(
            *[
                F.try_to_timestamp(head, F.lit(fmt)).cast("date")
                for fmt in dates.DIRTY_DATE_FORMATS
            ]
        )
        rows = df.select(
            "s",
            dates.parse_dirty_date(F.col("s")).cast("string").alias("gated"),
            ungated.cast("string").alias("raw"),
        ).collect()
        for r in rows:
            assert r.gated == r.raw, r.s

    def test_shape_regex_derivation(self):
        import re

        from insurance_helper_spark.functions.dates import _format_shape_regex

        cases = {
            "yyyy-MM-dd": (["2018-06-04"], ["18-06-04", "2018-6-4", "12345-01-01"]),
            "dd-MMM-yyyy": (
                ["04-Jan-2018", "04-JAN-2018"],
                ["4-Jan-2018", "04-January-2018"],
            ),
            "dd/MM/yyyy": (["04/06/2018"], ["04-06-2018", "4/6/2018"]),
        }
        for fmt, (ok, bad) in cases.items():
            rx = re.compile(_format_shape_regex(fmt))
            for v in ok:
                assert rx.match(v), (fmt, v)
            for v in bad:
                assert not rx.match(v), (fmt, v)

    def test_shape_regex_rejects_unknown_pattern_letters(self):
        """ADVICE r13: an unsupported Java pattern letter must raise at
        plan build — silently escaping it as a literal would build a
        gate that nulls every parse for that format."""
        import pytest

        from insurance_helper_spark.functions.dates import _format_shape_regex

        for fmt in ("d-MM-yyyy", "dd/MM/yyyy HH:mm", "yyyy-M-dd", "yy-MM-dd E"):
            with pytest.raises(ValueError, match="unsupported pattern letter"):
                _format_shape_regex(fmt)

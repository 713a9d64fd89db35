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

"""ANSI-mode execution sweep over the full query catalog.

The driver runs a VANILLA SparkSession, where Spark 4 defaults to
ANSI mode — divisions evaluated on rows a filter was supposed to
exclude (constraint-inference pushdown can re-order them, see
stat_qlr_structural_break) or on never-joined rows (see
graph_adamic_adar's deg-1 weights) CRASH there while passing the
repo session's ansi=false parity run. This sweep executes every
registered query once at the smallest fixture with ANSI ON, so an
ANSI-only crash is a local failure instead of a driver-only one.

Values are NOT compared here (the oracle parity suite owns that);
this is purely "does the plan execute under ANSI semantics".
"""

from __future__ import annotations

import os

import pytest

SF_DIR = "/root/testdata/sf0.001"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(SF_DIR), reason="fixture data absent"
)


def _catalog():
    from insurance_helper_spark.queries import catalog

    catalog.load_all()
    return catalog


def pytest_generate_tests(metafunc):
    if "ansi_query" in metafunc.fixturenames:
        cat = _catalog()
        metafunc.parametrize("ansi_query", sorted(cat.QUERIES.keys()))


@pytest.fixture(scope="module")
def ansi_spark(spark):
    prev = spark.conf.get("spark.sql.ansi.enabled")
    spark.conf.set("spark.sql.ansi.enabled", "true")
    yield spark
    spark.conf.set("spark.sql.ansi.enabled", prev)


def test_query_executes_under_ansi(ansi_spark, ansi_query):
    cat = _catalog()
    n = cat.QUERIES[ansi_query](ansi_spark, SF_DIR).count()
    assert n >= 0

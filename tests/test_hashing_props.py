"""Property tests for the shared deterministic-hash helpers
(functions/hashing.py) — the split/sample primitives whose uniformity
and determinism the curation queries rely on."""

from __future__ import annotations

import duckdb
from hypothesis import given, settings
from hypothesis import strategies as st

from insurance_helper_spark.functions.hashing import (
    KNUTH_MOD,
    KNUTH_MUL,
    knuth_uniform,
    knuth_uniform_sql,
)


def _py_knuth(key: int) -> float:
    return (((key % 2_147_483_648) * KNUTH_MUL) % KNUTH_MOD) / KNUTH_MOD


@given(
    st.lists(st.integers(min_value=-(2**62), max_value=2**62), min_size=1, max_size=50)
)
@settings(max_examples=25, deadline=None)
def test_sql_twin_matches_python(keys):
    """The documented DuckDB fragment computes the identical uniform."""
    con = duckdb.connect()
    for k in keys:
        (got,) = con.execute(f"SELECT {knuth_uniform_sql(str(k))}").fetchone()
        assert got == _py_knuth(k)


def test_spark_matches_python_and_range(spark):
    from pyspark.sql import functions as F

    # Include keys far above 2^31 (pre-reduction must keep Spark exact,
    # no silent int64 wrap) AND negative keys (Spark's % follows the
    # dividend's sign; the pmod form must still land in [0, 1)).
    df = (
        spark.range(0, 2500)
        .union(spark.range(2**40, 2**40 + 2500))
        .union(spark.range(-2500, 0))
        .select("id", knuth_uniform(F.col("id")).alias("u"))
    )
    rows = df.collect()
    for r in rows:
        assert r.u == _py_knuth(r.id)
        assert 0.0 <= r.u < 1.0


def test_split_fractions_approximately_uniform(spark):
    """80/10/10 cuts land within binomial tolerance over 5k keys."""
    from pyspark.sql import functions as F

    df = spark.range(0, 5000).select(knuth_uniform(F.col("id")).alias("u"))
    n_train = df.filter("u < 0.8").count()
    n_val = df.filter("u >= 0.8 AND u < 0.9").count()
    n_test = df.filter("u >= 0.9").count()
    assert abs(n_train / 5000 - 0.8) < 0.03
    assert abs(n_val / 5000 - 0.1) < 0.02
    assert abs(n_test / 5000 - 0.1) < 0.02


def test_hash_family_py_matches_column_version(spark):
    """hash_family_py (the plan-build-time constant folder behind the
    JL sign matrix) must be bit-identical to the Column avalanche over
    positive, huge, and negative keys, for several seeds."""
    from pyspark.sql import functions as F

    from insurance_helper_spark.functions.hashing import hash_family, hash_family_py

    df = (
        spark.range(0, 1500)
        .union(spark.range(2**40, 2**40 + 500))
        .union(spark.range(-500, 0))
    )
    for seed in (0, 1, 11, 97):
        rows = df.select("id", hash_family(F.col("id"), seed).alias("h")).collect()
        for r in rows:
            assert r.h == hash_family_py(r.id, seed), (r.id, seed)

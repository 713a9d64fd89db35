"""Bit-exactness guards for the numpy kernel twins in
functions/npkernels.py: the kernel-swap queries are only correct while
these primitives match their JVM Column counterparts EXACTLY."""

from __future__ import annotations

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from insurance_helper_spark.functions.npkernels import (
    half_up_long,
    hash_family_int,
    srp_sign_matrix,
)


def test_hash_family_int_matches_column_version(spark):
    """Python-int twin == Column version over a key/seed grid covering
    the SRP sign-matrix domain and beyond-int32 keys."""
    from pyspark.sql import functions as F

    from insurance_helper_spark.functions.hashing import hash_family

    keys = list(range(0, 1200)) + [2**31 - 1, 2**31, 2**40 + 17, -5, -(2**33)]
    for seed in (0, 1, 7, 11):
        df = spark.createDataFrame([(k,) for k in keys], "k long").select(
            "k", hash_family(F.col("k"), seed).alias("h")
        )
        got = {r["k"]: r["h"] for r in df.collect()}
        for k in keys:
            assert got[k] == hash_family_int(k, seed), (k, seed)


def test_srp_sign_matrix_shape_and_values():
    s = srp_sign_matrix(64, 16)
    assert s.shape == (64, 16)
    assert set(np.unique(s)) <= {-1.0, 1.0}
    # spot-check against the defining rule
    assert s[3, 5] == (1.0 if hash_family_int(3 * 16 + 5, 0) % 2 == 0 else -1.0)


HALF_UP_CASES = [
    0.0,
    0.5,
    -0.5,
    2.5,
    -2.5,
    2.4999999999999996,  # shortest repr below the boundary
    2.5000000000000004,
    # one-ulp-below-half values: floor(x+0.5) overshoots these
    np.nextafter(2.5, 0.0),
    np.nextafter(-2.5, 0.0),
    1e10 + 0.5,
    np.nextafter(1e10 + 0.5, 0.0),
    -1e10 - 0.5,
    123456789.49999999,
    1e12 + 0.5,
]


def test_half_up_long_matches_spark_round(spark):
    from pyspark.sql import functions as F

    df = spark.createDataFrame([(float(x),) for x in HALF_UP_CASES], "x double")
    jvm = [r["r"] for r in df.select(F.round("x").cast("long").alias("r")).collect()]
    ours = half_up_long(np.array(HALF_UP_CASES, dtype=np.float64))
    assert list(ours) == jvm, list(zip(HALF_UP_CASES, ours, jvm))


@settings(max_examples=200, deadline=None)
@given(
    st.floats(
        min_value=-1e13, max_value=1e13, allow_nan=False, allow_infinity=False
    )
)
def test_half_up_long_value_rule(x):
    """Property: result == HALF_UP on the double value (floor + exact
    fractional comparison, away-from-zero on .5), for all magnitudes the
    engine scales to (< 2^52, where every k+0.5 is representable)."""
    got = int(half_up_long(np.array([x]))[0])
    ax = abs(x)
    f = int(np.floor(ax))
    expect = f + 1 if (ax - np.floor(ax)) >= 0.5 else f
    if x < 0:
        expect = -expect
    assert got == expect


def test_half_up_long_not_floor_plus_half():
    """The documented failure of the naive floor(x+0.5): when the
    addition crosses a binade the sum can round UP past the boundary
    (the classic 0.49999999999999994 case — x < 0.5 but x+0.5 rounds
    to exactly 1.0). half_up_long must round DOWN."""
    x = np.nextafter(0.5, 0.0)  # 0.49999999999999994
    assert float(np.floor(x + 0.5)) == 1.0  # the naive rule overshoots
    assert int(half_up_long(np.array([x]))[0]) == 0
    # and one ulp below an in-binade boundary stays down too
    y = np.nextafter(2.5, 0.0)
    assert int(half_up_long(np.array([y]))[0]) == 2

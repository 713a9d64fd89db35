"""numpy twins of the engine's cross-engine-exact scalar primitives,
for use INSIDE mapInPandas kernels.

The interpreted higher-order-function folds (``F.aggregate`` /
``F.transform`` over a 64-dim embedding) cost ~10x a BLAS/vectorized
numpy pass over the same rows (measured on crosslingual_margin_pairs:
13.5 s -> 3.9 s warm at sf0.1). Swapping a fold onto a kernel is only
legal if the kernel reproduces the exact values the JVM expressions
produced — these helpers are the bit-exactness contract:

- ``half_up_long``: Spark's ``F.round(double_col).cast("long")`` uses
  java.math.BigDecimal HALF_UP on the double's shortest decimal
  representation. For |x| < 2^52 every half-integer boundary k+0.5 is
  exactly representable, so "shortest repr >= k.5" is equivalent to
  the plain double comparison ``x - floor(x) >= 0.5`` — and that
  fractional subtraction is EXACT (Sterbenz), so no re-rounding noise.
  The naive ``floor(x + 0.5)`` is NOT equivalent: when the addition
  crosses a rounding boundary the sum can round up past the integer
  and overshoot (the classic ``0.49999999999999994 + 0.5 == 1.0``
  case). Negative values round away from zero (HALF_UP), mirroring
  Spark.

- ``hash_family_int``: plain-Python-int twin of
  ``functions.hashing.hash_family`` (same xorshift-multiply chain,
  same constants). Exact because Python ints are arbitrary precision
  and every intermediate in the Column version stays inside signed
  int64. Guarded against drift by tests/test_npkernels.py.

Sequential-order folds: where a query's JVM expression is a
left-to-right DOUBLE fold (``F.aggregate(arr, 0.0, acc + x)``), the
kernel must accumulate in the same element order — a BLAS dot product
uses pairwise summation and can differ in the last ulp. The pattern is
a python loop over the (fixed, small) dimension axis with a vectorized
``acc += term_i`` per step: identical IEEE addition sequence per row,
still ~d vectorized ops per batch.
"""

from __future__ import annotations

import numpy as np

from insurance_helper_spark.functions.hashing import (
    hash_family_py as _hash_family_py,
)


def half_up_long(x: np.ndarray) -> np.ndarray:
    """Exact numpy twin of ``F.round(double_col).cast('long')``.

    HALF_UP at scale 0, on the double VALUE (equivalent to Spark's
    shortest-decimal-repr HALF_UP for |x| < 2^52 — see module
    docstring). Vectorized, returns int64.
    """
    x = np.asarray(x, dtype=np.float64)
    ax = np.abs(x)
    f = np.floor(ax)
    r = np.where(ax - f >= 0.5, f + 1.0, f)
    return (np.sign(x) * r).astype(np.int64)


def hash_family_int(key: int, seed: int) -> int:
    """Plain-int twin of ``functions.hashing.hash_family`` — same
    pmod-reduce + seed fold + xorshift-multiply avalanche, same
    constants. For driver-side precomputation of small deterministic
    tables (e.g. the SRP sign matrix) that the Column version defines.
    Canonical implementation lives beside the constants as
    ``hashing.hash_family_py`` (r11); this name is kept for kernel
    callers and tests.
    """
    return _hash_family_py(key, seed)


def srp_sign_matrix(d: int, k: int) -> np.ndarray:
    """The (d, k) signed-random-projection hyperplane matrix the SRP
    queries define element-wise in SQL: sign(i, j) = +1 iff
    ``hash_family((i-1)*k + j, seed=0)`` is even (i is the 1-based
    dimension, j the 0-based hyperplane). float64 +-1.0 entries.
    """
    s = np.empty((d, k), dtype=np.float64)
    for i in range(d):
        for j in range(k):
            s[i, j] = 1.0 if hash_family_int(i * k + j, 0) % 2 == 0 else -1.0
    return s

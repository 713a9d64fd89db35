"""Deterministic cross-engine hashing helpers.

The Knuth multiplicative hash maps an integer key to a uniform in
[0, 1) with pure 64-bit integer arithmetic — exactly reproducible in
Spark AND in the DuckDB oracle SQL (no rand(), no engine-specific hash
function), which is what makes hash-based sampling/splitting
value-checkable. Canonical home for the constants; the SQL twin of
``knuth_uniform`` is ``((key * 2654435761) % 4294967296) * 1.0 /
4294967296``.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

KNUTH_MUL = 2_654_435_761
KNUTH_MOD = 4_294_967_296


def knuth_uniform(key: Column) -> Column:
    """Uniform-ish double in [0, 1) from an integer key column."""
    return ((key * F.lit(KNUTH_MUL)) % F.lit(KNUTH_MOD)).cast("double") / F.lit(
        float(KNUTH_MOD)
    )


def knuth_uniform_sql(key_expr: str) -> str:
    """The DuckDB-side twin as a SQL fragment."""
    return f"(({key_expr} * {KNUTH_MUL}) % {KNUTH_MOD}) * 1.0 / {KNUTH_MOD}"

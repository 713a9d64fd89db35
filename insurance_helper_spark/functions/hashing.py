"""Deterministic cross-engine hashing helpers.

The Knuth multiplicative hash maps an integer key to a uniform in
[0, 1) with pure 64-bit integer arithmetic — exactly reproducible in
Spark AND in the DuckDB oracle SQL (no rand(), no engine-specific hash
function), which is what makes hash-based sampling/splitting
value-checkable.

The key is pre-reduced modulo 2^31 so the multiplication never leaves
signed int64: (2^31 - 1) x 2654435761 < 2^63. Without the reduction a
key above ~3.47e9 overflows — DuckDB raises, Spark silently WRAPS, and
the engines diverge (found by the hypothesis property test). Canonical
home for the constants; ``knuth_uniform_sql`` emits the DuckDB twin.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

KNUTH_MUL = 2_654_435_761
KNUTH_MOD = 4_294_967_296
KEY_REDUCE = 2_147_483_648  # 2^31: keeps key*MUL inside signed int64
_KEY_REDUCE = KEY_REDUCE  # backwards-compat alias


def knuth_uniform(key: Column) -> Column:
    """Uniform-ish double in [0, 1) from an integer key column.

    Both reductions use the portable non-negative modulo
    ``((x % m) + m) % m``: plain ``%`` follows the dividend's sign in
    Spark AND DuckDB, so a negative key would land in (-1, 0] and every
    such row would satisfy ``u < train_frac`` — silently skewing any
    hash split. The double-mod keeps the documented [0, 1) contract for
    all int64 keys on both engines.
    """
    reduced = ((key % F.lit(KEY_REDUCE)) + F.lit(KEY_REDUCE)) % F.lit(KEY_REDUCE)
    # reduced is in [0, 2^31) for every int64 key, so the product stays a
    # positive signed int64 and the outer % is already non-negative.
    h = (reduced * F.lit(KNUTH_MUL)) % F.lit(KNUTH_MOD)
    return h.cast("double") / F.lit(float(KNUTH_MOD))


def knuth_uniform_sql(key_expr: str) -> str:
    """The DuckDB-side twin as a SQL fragment (same pmod semantics)."""
    reduced = f"((({key_expr}) % {KEY_REDUCE}) + {KEY_REDUCE}) % {KEY_REDUCE}"
    return f"((({reduced}) * {KNUTH_MUL}) % {KNUTH_MOD}) * 1.0 / {KNUTH_MOD}"


HASH_MIX = 97531  # seed spacing for the indexed hash family


def hash_family(key: Column, seed: int) -> Column:
    """Member ``seed`` of a portable indexed hash family: an integer in
    [0, 2^32) from pure int64 arithmetic — pmod-reduce the key to 2^31,
    Knuth multiply, add the seed mix, mod 2^32. Every intermediate fits
    signed int64 (see module docstring), so Spark and the DuckDB twin
    (``hash_family_sql``) agree bit-for-bit. The family behind the CMS
    sketch rows and the MinHash signature rows."""
    reduced = ((key % F.lit(KEY_REDUCE)) + F.lit(KEY_REDUCE)) % F.lit(KEY_REDUCE)
    return (reduced * F.lit(KNUTH_MUL) + F.lit(seed * HASH_MIX)) % F.lit(KNUTH_MOD)


def hash_family_sql(key_expr: str, seed: int) -> str:
    """DuckDB twin of ``hash_family`` as a SQL fragment."""
    reduced = f"((({key_expr}) % {KEY_REDUCE}) + {KEY_REDUCE}) % {KEY_REDUCE}"
    return f"(({reduced}) * {KNUTH_MUL} + {seed} * {HASH_MIX}) % {KNUTH_MOD}"


SHA_PREFIX_BITS = 48  # 12 hex chars -> [0, 2^48): fits int64, exact in double


def sha_prefix_long(col: Column) -> Column:
    """Portable STRING hash: the first 12 hex chars of sha2-256 parsed
    as an integer in [0, 2^48). xxhash64 differs between engines, but
    sha-256 is bit-identical everywhere, so this is the string
    counterpart of ``knuth_uniform`` — the hash behind any oracle-gated
    sketch keyed on text (KMV distinct, hash-ordered token sampling).
    Cost: one sha2 per row, JVM-side, codegen-friendly."""
    return F.conv(F.substring(F.sha2(col, 256), 1, 12), 16, 10).cast("long")


def sha_prefix_long_sql(expr: str) -> str:
    """DuckDB twin of ``sha_prefix_long`` (hex-literal cast)."""
    return f"(('0x' || substr(sha256({expr}), 1, 12))::BIGINT)"

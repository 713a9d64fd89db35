"""Schema inference + enforcement over bronze all-string tables — the
reference's Stage-2 "Schema Builder" declaration
(/root/reference/README.md:91-101: "Create structured JSON/database
records" from scraped strings) as a verifiable operator pair.

The scraper's bronze layer is all strings (every cell comes out of an
HTML table; the reference keeps even dates raw — models.py:30-31).
Promotion to a typed silver table needs two operators:

- :func:`infer_report` — for each string column, ONE fused aggregation
  pass counts how many non-null cells parse as each candidate type
  (BIGINT, DOUBLE, DATE via the engine's dirty-date trial parser,
  BOOLEAN) and promotes the column to the FIRST candidate in precedence
  order whose success count clears ``threshold_permille`` of the
  non-null cells (integer arithmetic — ``1000·ok ≥ t·nonnull`` — so the
  decision is exact on both engines). Candidates are strict-by-regex
  where a regex is portable (BIGINT/DOUBLE/BOOLEAN), and the dirty-date
  parser where it is not.
- :func:`apply_schema` — cast the bronze columns with the SAME parsers
  (unparseable → NULL, the F3 swallow-and-continue contract), so the
  promotion report is also the exact null-inflation forecast for the
  silver write.

Scale stance: the report is one scan with ~4 conditional sums per
column fused map-side (the dq_column_profile shape) and a |cols|-row
output; enforcement is a pure projection. Nothing shuffles.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from insurance_helper_spark.functions.dates import parse_dirty_date

# Precedence order: first passing candidate wins. BIGINT before DOUBLE
# (every int-string also parses as double), DOUBLE before DATE (regexes
# are disjoint but cheap first), BOOLEAN last among typed.
TYPE_PRECEDENCE = ("bigint", "double", "date", "boolean")

# Length-capped so a matching string can NEVER overflow int64 — the
# regex alone decides, identically on Spark and DuckDB.
_BIGINT_RE = r"^[+-]?\d{1,18}$"
_DOUBLE_RE = r"^[+-]?\d+(\.\d+)?([eE][+-]?\d+)?$"
# Cheap SHAPE pre-filter for the date candidate: every string the
# 5-format trial parser can accept has two [-/] separators between
# 1-4-char digit/alpha fields, so non-date-shaped cells (integers,
# decimals, free text) never reach the expensive per-cell
# DateTimeFormatter trials. Bench receipt: without the gate the
# promotion census ran the 5-way parse on EVERY column's cells —
# 10.5 s warm at sf0.1; with it, only date-shaped cells pay.
#
# r14: the gate is ONE anchored regex on the raw cell, replacing the
# former split(trim(col), '\s+')[0] head extraction + anchored match —
# the trim/split allocated two intermediate strings per cell on EVERY
# column and dominated the census aggregate (~0.8 s of 2.7 s at
# sf0.1). Equivalence (pinned by test + 20k-string fuzz): trim strips
# only 0x20, so the head starts after `^ *` (a leading tab makes the
# split head empty — and fails `^ *\d` here); shape chars exclude
# whitespace, so a match ending at `(\s|$)` consumed exactly the head.
_DATE_SHAPE_RE = r"^ *\d{1,4}[-/][0-9A-Za-z]{1,3}[-/]\d{1,4}(\s|$)"


def parse_ok(col: Column, t: str) -> Column:
    """Boolean: does this (non-null) string cell parse as type ``t``?"""
    if t == "bigint":
        return col.rlike(_BIGINT_RE)
    if t == "double":
        return col.rlike(_DOUBLE_RE)
    if t == "date":
        return col.rlike(_DATE_SHAPE_RE) & parse_dirty_date(col).isNotNull()
    if t == "boolean":
        return F.lower(col).isin("true", "false")
    raise ValueError(f"unknown candidate type: {t}")


def cast_as(col: Column, t: str) -> Column:
    """The enforcement cast matching :func:`parse_ok` (NULL on failure).

    The date cast carries the SAME shape gate as ``parse_ok`` (ADVICE
    r12): if enforcement were ungated ``parse_dirty_date``, any head
    the trial parser accepts but the shape regex rejects (a >4-digit
    year, a future ``DIRTY_DATE_FORMATS`` addition) would break the
    "report is the exact null-inflation forecast" contract — the
    census would count the cell as unparseable while the silver write
    kept it. Keep the gate in lockstep with ``parse_ok``.
    """
    if t == "bigint":
        return F.when(col.rlike(_BIGINT_RE), col.cast("long"))
    if t == "double":
        return F.when(col.rlike(_DOUBLE_RE), col.cast("double"))
    if t == "date":
        return F.when(col.rlike(_DATE_SHAPE_RE), parse_dirty_date(col))
    if t == "boolean":
        return F.when(F.lower(col).isin("true", "false"), F.lower(col) == "true")
    if t == "string":
        return col
    raise ValueError(f"unknown type: {t}")


def infer_report(
    df: DataFrame, cols: list[str] | None = None, threshold_permille: int = 995
) -> DataFrame:
    """Per-column promotion report over a bronze all-string relation:
    (column, n_rows, n_nonnull, ok_bigint, ok_double, ok_date,
    ok_boolean, inferred_type, promoted).

    One fused aggregation (4 conditional sums + 2 counts per column,
    all map-side); the inference decision is a projection over the
    single aggregate row, exploded to |cols| report rows via stack.
    """
    cols = cols or df.columns
    aggs = []
    for c in cols:
        col = F.col(c)
        aggs.append(F.count("*").cast("long").alias(f"{c}__rows"))
        aggs.append(F.count(col).cast("long").alias(f"{c}__nonnull"))
        for t in TYPE_PRECEDENCE:
            aggs.append(
                F.sum(F.when(col.isNotNull() & parse_ok(col, t), 1).otherwise(0))
                .cast("long")
                .alias(f"{c}__{t}")
            )
    one = df.agg(*aggs)
    stack_args = []
    for c in cols:
        stack_args.append(f"'{c}'")
        stack_args.append(f"`{c}__rows`")
        stack_args.append(f"`{c}__nonnull`")
        stack_args += [f"`{c}__{t}`" for t in TYPE_PRECEDENCE]
    stacked = one.select(
        F.expr(
            f"stack({len(cols)}, {', '.join(stack_args)}) AS "
            "(column, n_rows, n_nonnull, ok_bigint, ok_double, ok_date, ok_boolean)"
        )
    )
    t = F.lit(threshold_permille)
    clears = {
        c: (F.lit(1000) * F.col(f"ok_{c}") >= t * F.col("n_nonnull"))
        & (F.col("n_nonnull") > 0)
        for c in TYPE_PRECEDENCE
    }
    inferred = F.lit("string")
    for cand in reversed(TYPE_PRECEDENCE):
        inferred = F.when(clears[cand], F.lit(cand)).otherwise(inferred)
    return (
        stacked.withColumn("inferred_type", inferred)
        .withColumn("promoted", F.col("inferred_type") != "string")
        .orderBy("column")
    )


def apply_schema(df: DataFrame, mapping: dict[str, str]) -> DataFrame:
    """Cast bronze columns per ``mapping`` (column -> inferred type)
    with the same NULL-on-failure parsers the report counted."""
    return df.select(
        *[
            cast_as(F.col(c), mapping.get(c, "string")).alias(c)
            for c in df.columns
        ]
    )

"""Data-quality expectations: declarative constraint validation over
any DataFrame (the Deequ / Great Expectations / dbt-test shape).

A suite is a list of :class:`Rule`; ``run_expectations`` evaluates all
of them and returns one row per rule: ``(rule, n_violations, passed)``.

Execution strategy (the 100 TB stance):

- All ROW-LOCAL rules (not-null, range, accepted-values, rlike) fuse
  into ONE aggregation pass over the table — a single scan, no shuffle,
  one conditional-sum per rule (Catalyst evaluates them map-side).
- UNIQUENESS rules each need one shuffle on their key columns
  (count-distinct-vs-count); FK rules are an anti join against the
  referenced keys (broadcast when the dimension is small).
- The per-rule summary relation is |rules| rows — the union of a few
  1-row aggregates; the plan stays a tree of independent branches over
  one cached scan, so Spark schedules them concurrently.

The reference has no constraint machinery (its Pydantic models validate
row-shape only — SURVEY.md §1); this belongs to the §2B engine surface
a warehouse user expects.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


@dataclass(frozen=True)
class Rule:
    """One expectation. ``kind`` ∈ {not_null, range, accepted_values,
    rlike, unique, foreign_key}; ``params`` are kind-specific."""

    name: str
    kind: str
    column: str = ""
    params: dict = field(default_factory=dict)


def not_null(column: str, name: str | None = None) -> Rule:
    return Rule(name or f"{column}_not_null", "not_null", column)


def in_range(column: str, lo, hi, name: str | None = None) -> Rule:
    return Rule(name or f"{column}_range", "range", column, {"lo": lo, "hi": hi})


def accepted_values(column: str, values: list, name: str | None = None) -> Rule:
    return Rule(name or f"{column}_accepted", "accepted_values", column, {"values": list(values)})


def matches(column: str, pattern: str, name: str | None = None) -> Rule:
    return Rule(name or f"{column}_matches", "rlike", column, {"pattern": pattern})


def unique(columns: list[str], name: str | None = None) -> Rule:
    return Rule(name or f"{'_'.join(columns)}_unique", "unique", params={"columns": list(columns)})


def foreign_key(column: str, dim: DataFrame, dim_column: str, name: str | None = None) -> Rule:
    return Rule(
        name or f"{column}_fk", "foreign_key", column, {"dim": dim, "dim_column": dim_column}
    )


def _sql_str(s: str) -> str:
    """Escape a rule name for use as a Spark SQL string literal."""
    return "'" + s.replace("\\", "\\\\").replace("'", "\\'") + "'"


def _row_local_violation(rule: Rule):
    c = F.col(rule.column)
    if rule.kind == "not_null":
        return c.isNull()
    if rule.kind == "range":
        lo, hi = rule.params["lo"], rule.params["hi"]
        return c.isNull() | (c < lo) | (c > hi)
    if rule.kind == "accepted_values":
        return c.isNull() | ~c.isin(rule.params["values"])
    if rule.kind == "rlike":
        return c.isNull() | ~c.rlike(rule.params["pattern"])
    raise ValueError(f"not row-local: {rule.kind}")


def run_expectations(df: DataFrame, rules: list[Rule]) -> DataFrame:
    """Evaluate every rule; returns (rule, n_violations, passed) rows
    ordered by rule name. Row-local rules share one aggregation pass."""
    spark = df.sparkSession
    known = ("not_null", "range", "accepted_values", "rlike", "unique", "foreign_key")
    unknown = [r.kind for r in rules if r.kind not in known]
    if unknown:
        raise ValueError(f"unknown rule kind(s): {unknown}; expected one of {known}")
    if not rules:
        return spark.createDataFrame(
            [], "rule string, n_violations long, passed boolean"
        )
    row_local = [r for r in rules if r.kind in ("not_null", "range", "accepted_values", "rlike")]
    results: list[DataFrame] = []
    if row_local:
        aggs = [
            # coalesce: sum over ZERO rows is NULL — an empty table
            # violates nothing, so the count must be 0, not null.
            # Aliased to positional placeholders, NOT the rule name:
            # a name with spaces/quotes must never reach selectExpr as
            # an identifier or unescaped literal.
            F.coalesce(F.sum(_row_local_violation(r).cast("long")), F.lit(0)).alias(
                f"__r{i}"
            )
            for i, r in enumerate(row_local)
        ]
        wide = df.agg(*aggs)
        # One row → |row_local| rows via stack (no shuffle; 1-row input).
        pairs = ", ".join(
            f"{_sql_str(r.name)}, __r{i}" for i, r in enumerate(row_local)
        )
        results.append(
            wide.selectExpr(f"stack({len(row_local)}, {pairs}) AS (rule, n_violations)")
        )
    for r in rules:
        if r.kind == "unique":
            cols = r.params["columns"]
            dupes = (
                df.groupBy(*cols)
                .agg(F.count("*").alias("__n"))
                .filter(F.col("__n") > 1)
                .agg(F.coalesce(F.sum(F.col("__n") - 1), F.lit(0)).alias("n_violations"))
            )
            results.append(dupes.select(F.lit(r.name).alias("rule"), "n_violations"))
        elif r.kind == "foreign_key":
            dim = r.params["dim"].select(F.col(r.params["dim_column"]).alias(r.column)).distinct()
            orphans = (
                df.filter(F.col(r.column).isNotNull())
                .join(F.broadcast(dim), r.column, "left_anti")
                .agg(F.count("*").alias("n_violations"))
            )
            results.append(orphans.select(F.lit(r.name).alias("rule"), "n_violations"))
    out = results[0]
    for r_df in results[1:]:
        out = out.unionByName(r_df)
    return out.select(
        "rule", "n_violations", (F.col("n_violations") == 0).alias("passed")
    ).orderBy("rule")

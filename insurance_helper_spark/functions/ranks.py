"""Two-phase bucketed cumulative counts over value-collapsed relations.

The rank/quantile family (Kruskal–Wallis, Spearman marginals, Tukey
fences, …) needs "sum of counts over all strictly-smaller values" per
group. The direct form is a cumulative window partitioned by the group
key — but the group keys are LOW-CARDINALITY (3 return flags, or no key
at all), so every row of the value-collapsed relation sorts inside a
handful of window partitions: a 3-task sort at any core count, and an
impossibility at warehouse scale (the same defect r13 fixed in
stat_weighted_median_price, guide §2.5).

``cum_before`` computes the identical integers two-phase instead:

1. bucket the value by a fixed, data-independent width (integer
   division — deterministic, no sampling);
2. per (group, bucket) totals — one map-side-combinable aggregation —
   then a cumulative window over the tiny (group, bucket) relation
   gives each bucket's exclusive prefix;
3. a window partitioned by (group, bucket) adds the within-bucket
   exclusive running count on top of the bucket prefix.

Every quantity is an exact integer sum, associativity is the only
property used, so the result is byte-identical to the single-window
form; parallelism becomes #groups × #buckets instead of #groups, and
no task ever sorts more than one bucket's values.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def cum_before_multi(
    df: DataFrame,
    part_cols: list[str],
    val_col: str,
    cnt_cols: list[str],
    bucket_div: int,
    suffix: str = "_before",
) -> DataFrame:
    """``cum_before`` for SEVERAL count columns in one two-phase pass
    (the two-sample ECDF family walks two arms' counts over one value
    spine). Adds ``<cnt>{suffix}`` = exclusive cumulative sum of each
    ``cnt_cols`` member, same exact-integer construction as
    ``cum_before`` — one bucket rollup, one tiny prefix window, one
    (group, bucket)-partitioned within-bucket window, shared by all
    columns."""
    bkt = F.floor(F.col(val_col) / bucket_div).alias("__bkt")
    df2 = df.withColumn("__bkt", bkt)
    per_bkt = df2.groupBy(*part_cols, "__bkt").agg(
        *[F.sum(c).alias(f"__bw_{c}") for c in cnt_cols]
    )
    w_b = (
        Window.partitionBy(*part_cols)
        .orderBy("__bkt")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    prefix = per_bkt.select(
        *part_cols,
        "__bkt",
        *[
            F.coalesce(F.sum(f"__bw_{c}").over(w_b), F.lit(0)).alias(f"__pfx_{c}")
            for c in cnt_cols
        ],
    )
    w_in = (
        Window.partitionBy(*part_cols, "__bkt")
        .orderBy(val_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    out = df2.join(F.broadcast(prefix), [*part_cols, "__bkt"])
    for c in cnt_cols:
        out = out.withColumn(
            f"{c}{suffix}",
            F.col(f"__pfx_{c}") + F.coalesce(F.sum(c).over(w_in), F.lit(0)),
        )
    return out.drop("__bkt", *[f"__pfx_{c}" for c in cnt_cols])


def cum_before(
    df: DataFrame,
    part_cols: list[str],
    val_col: str,
    cnt_col: str,
    bucket_div: int,
    out_col: str = "cum_before",
) -> DataFrame:
    """Add ``out_col`` = Σ cnt over rows of the same ``part_cols`` group
    with a strictly smaller ``val_col`` (exclusive cumulative count).

    ``df`` must be value-collapsed: one row per (part_cols…, val_col).
    ``bucket_div`` is the fixed bucket width in value units; choose it
    from the value DOMAIN (e.g. 10_000 cents = $100 buckets over a
    ~$1k–$110k price range → ~1.1k buckets) so the phase-2 relation
    stays tiny while phase-3 partitions stay narrow.
    """
    bkt = F.floor(F.col(val_col) / bucket_div).alias("__bkt")
    df2 = df.withColumn("__bkt", bkt)
    per_bkt = df2.groupBy(*part_cols, "__bkt").agg(F.sum(cnt_col).alias("__bw"))
    w_b = (
        Window.partitionBy(*part_cols)
        .orderBy("__bkt")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    prefix = per_bkt.select(
        *part_cols,
        "__bkt",
        F.coalesce(F.sum("__bw").over(w_b), F.lit(0)).alias("__prefix"),
    )
    w_in = (
        Window.partitionBy(*part_cols, "__bkt")
        .orderBy(val_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    return (
        df2.join(F.broadcast(prefix), [*part_cols, "__bkt"])
        .withColumn(
            out_col,
            F.col("__prefix") + F.coalesce(F.sum(cnt_col).over(w_in), F.lit(0)),
        )
        .drop("__bkt", "__prefix")
    )

"""Final TPC-H batch (Q2/Q11/Q16/Q20 adapted) — completes the 22-query
suite over the trimmed fixture schema.

The fixture has no ``partsupp`` table (TESTDATA.md), so the
part↔supplier relationship is derived from ``lineitem``: a supplier
"supplies" a part iff it has shipped at least one line of it, and the
"supply cost" is the minimum observed discounted unit price. That keeps
each query's *shape* — the point of the exercise — intact:

- q2: correlated min-cost subquery per part within a region
  (decorrelated to a window-min, the plan Catalyst itself would pick).
- q11: per-part value with a global scalar-subquery threshold
  (integer-cents arithmetic so the cross-engine comparison is exact).
- q16: count-distinct suppliers per part attribute group with a
  NOT-IN exclusion list (anti join).
- q20: nested semi-join chain — suppliers holding a dominant share of
  a filtered part's shipped quantity.

Reference scope note (SURVEY.md §2A end): the reference engine itself
has no subquery machinery at all; these rows belong to the §2B
driver-mandated relational surface.

Hash-parity conventions as everywhere in the catalog: identical aliases
both sides, float aggregates rounded (or carried as integer cents) on
both sides, deterministic ORDER BY with explicit tiebreaks.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from insurance_helper_spark.queries.catalog import register
from insurance_helper_spark.sources.tables import load_table


# ---------------------------------------------------------------------------
# q2 — minimum-cost supplier per part (Q2 adapted). Supply cost per
# (part, supplier) = min discounted unit price over that supplier's
# lines, rounded to cents on BOTH sides before the min-comparison so the
# correlated predicate is decidable cross-engine. Scale: the supply
# relation aggregates the fact once on (partkey, suppkey) — the same
# shuffle key serves the window-min per partkey after a cheap
# repartition; supplier/nation/region are broadcast dims. No correlated
# per-row probing survives: the "subquery" is a window over the
# already-reduced relation (|parts × suppliers-per-part| rows).
# ---------------------------------------------------------------------------

Q2_ORACLE = """
WITH supply AS (
    SELECT l.l_partkey, l.l_suppkey,
           round(min(l.l_extendedprice * (1 - l.l_discount) / l.l_quantity), 2)
               AS unit_cost
    FROM lineitem l
    GROUP BY l.l_partkey, l.l_suppkey
),
eu_supply AS (
    SELECT sp.l_partkey, sp.l_suppkey, sp.unit_cost,
           s.s_name, s.s_acctbal, n.n_name
    FROM supply sp
    JOIN supplier s ON sp.l_suppkey = s.s_suppkey
    JOIN nation n ON s.s_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    WHERE r.r_name = 'EUROPE'
)
SELECT round(e.s_acctbal, 2) AS s_acctbal, e.s_name, e.n_name,
       p.p_partkey, p.p_name, e.unit_cost
FROM part p
JOIN eu_supply e ON p.p_partkey = e.l_partkey
WHERE p.p_size BETWEEN 10 AND 20 AND p.p_type = 'STANDARD'
  AND e.unit_cost = (SELECT min(e2.unit_cost) FROM eu_supply e2
                     WHERE e2.l_partkey = p.p_partkey)
ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
"""


@register("q2_min_cost_supplier", Q2_ORACLE)
def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(
        spark, sf_dir, "lineitem",
        columns=["l_partkey", "l_suppkey", "l_quantity", "l_extendedprice", "l_discount"],
    )
    part = load_table(spark, sf_dir, "part", columns=["p_partkey", "p_name", "p_size", "p_type"])
    supplier = load_table(spark, sf_dir, "supplier", columns=["s_suppkey", "s_name", "s_acctbal", "s_nationkey"])
    nation = load_table(spark, sf_dir, "nation", columns=["n_nationkey", "n_name", "n_regionkey"])
    region = load_table(spark, sf_dir, "region", columns=["r_regionkey", "r_name"])

    supply = li.groupBy("l_partkey", "l_suppkey").agg(
        F.round(
            F.min(F.col("l_extendedprice") * (1 - F.col("l_discount")) / F.col("l_quantity")), 2
        ).alias("unit_cost")
    )
    eu_nations = F.broadcast(
        nation.join(
            F.broadcast(region.filter(F.col("r_name") == "EUROPE")),
            F.col("n_regionkey") == F.col("r_regionkey"),
        ).select("n_nationkey", "n_name")
    )
    eu_suppliers = F.broadcast(
        supplier.join(eu_nations, F.col("s_nationkey") == F.col("n_nationkey")).select(
            "s_suppkey", "s_name", "s_acctbal", "n_name"
        )
    )
    eu_supply = supply.join(eu_suppliers, F.col("l_suppkey") == F.col("s_suppkey"))
    # Decorrelated min: window over partkey instead of a per-row subquery.
    w = Window.partitionBy("l_partkey")
    cheapest = (
        eu_supply.withColumn("__min_cost", F.min("unit_cost").over(w))
        .filter(F.col("unit_cost") == F.col("__min_cost"))
        .drop("__min_cost")
    )
    target_parts = F.broadcast(
        part.filter(F.col("p_size").between(10, 20) & (F.col("p_type") == "STANDARD"))
    )
    return (
        cheapest.join(target_parts, F.col("l_partkey") == F.col("p_partkey"))
        .select(
            F.round("s_acctbal", 2).alias("s_acctbal"),
            "s_name", "n_name", "p_partkey", "p_name", "unit_cost",
        )
        .orderBy(F.desc("s_acctbal"), "n_name", "s_name", "p_partkey")
    )


# ---------------------------------------------------------------------------
# q11 — important parts by supplier nation (Q11 adapted): per-part value
# shipped by NATION_3 suppliers, keep parts above 0.1% of the national
# total. All money is carried as integer CENTS (exact, order-independent
# sums — no float round-off at the threshold boundary on either engine).
# Scale: one fact shuffle on partkey after the broadcast supplier-nation
# semi filter; the scalar total is a 1-row broadcast back over the tiny
# per-part aggregate.
# ---------------------------------------------------------------------------

Q11_ORACLE = """
WITH val AS (
    SELECT l.l_partkey AS p_key,
           CAST(sum(CAST(round(l.l_extendedprice * (1 - l.l_discount) * 100) AS BIGINT))
                AS BIGINT) AS value_cents
    FROM lineitem l
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
    JOIN nation n ON s.s_nationkey = n.n_nationkey
    WHERE n.n_name = 'NATION_3'
    GROUP BY p_key
)
SELECT p_key, round(value_cents / 100.0, 2) AS value
FROM val
WHERE value_cents * 1000 > (SELECT sum(value_cents) FROM val)
ORDER BY value_cents DESC, p_key
"""


@register("q11_important_parts", Q11_ORACLE)
def q11_important_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(
        spark, sf_dir, "lineitem",
        columns=["l_partkey", "l_suppkey", "l_extendedprice", "l_discount"],
    )
    supplier = load_table(spark, sf_dir, "supplier", columns=["s_suppkey", "s_nationkey"])
    nation = load_table(spark, sf_dir, "nation", columns=["n_nationkey", "n_name"])
    nation_supp = F.broadcast(
        supplier.join(
            F.broadcast(nation.filter(F.col("n_name") == "NATION_3")),
            F.col("s_nationkey") == F.col("n_nationkey"),
        ).select("s_suppkey")
    )
    cents = F.round(F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100).cast("long")
    val = (
        li.join(nation_supp, F.col("l_suppkey") == F.col("s_suppkey"), "left_semi")
        .groupBy(F.col("l_partkey").alias("p_key"))
        .agg(F.sum(cents).alias("value_cents"))
    )
    total = val.agg(F.sum("value_cents").alias("__total"))
    return (
        val.join(F.broadcast(total))
        .filter(F.col("value_cents") * 1000 > F.col("__total"))
        .select("p_key", F.round(F.col("value_cents") / 100.0, 2).alias("value"),
                "value_cents")
        .orderBy(F.desc("value_cents"), "p_key")
        .drop("value_cents")
    )


# ---------------------------------------------------------------------------
# q16 — supplier-relationship count per part attribute group (Q16
# adapted): how many distinct suppliers ship each (brand, type, size)
# combination, excluding one brand, one type, and "complaint" suppliers
# (the fixture carries no comment column — negative account balance
# stands in as the exclusion list, same NOT-IN-subquery shape). Scale:
# the exclusion list and part dim broadcast; the distinct and the
# count-distinct co-shuffle on the same grouping key.
# ---------------------------------------------------------------------------

Q16_ORACLE = """
SELECT p.p_brand, p.p_type, p.p_size,
       CAST(count(DISTINCT l.l_suppkey) AS BIGINT) AS supplier_cnt
FROM lineitem l
JOIN part p ON l.l_partkey = p.p_partkey
WHERE p.p_brand <> 'Brand#5'
  AND p.p_type <> 'PROMO'
  AND p.p_size IN (1, 9, 14, 19, 23, 36, 45, 49)
  AND l.l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
GROUP BY p.p_brand, p.p_type, p.p_size
ORDER BY supplier_cnt DESC, p.p_brand, p.p_type, p.p_size
"""


@register("q16_supplier_relationship", Q16_ORACLE)
def q16_supplier_relationship(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem", columns=["l_partkey", "l_suppkey"])
    part = load_table(spark, sf_dir, "part", columns=["p_partkey", "p_brand", "p_type", "p_size"])
    supplier = load_table(spark, sf_dir, "supplier", columns=["s_suppkey", "s_acctbal"])
    good_parts = F.broadcast(
        part.filter(
            (F.col("p_brand") != "Brand#5")
            & (F.col("p_type") != "PROMO")
            & F.col("p_size").isin(1, 9, 14, 19, 23, 36, 45, 49)
        )
    )
    complaint_suppliers = F.broadcast(
        supplier.filter(F.col("s_acctbal") < 0).select("s_suppkey")
    )
    return (
        li.join(good_parts, F.col("l_partkey") == F.col("p_partkey"))
        .join(complaint_suppliers, F.col("l_suppkey") == F.col("s_suppkey"), "left_anti")
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(F.desc("supplier_cnt"), "p_brand", "p_type", "p_size")
    )


# ---------------------------------------------------------------------------
# q20 — potential part promotion (Q20 adapted): suppliers who shipped
# MORE THAN 30% of the 1996 volume of some red part — the nested
# IN-subquery chain of the original becomes per-(part, supplier) aggs
# joined against per-part totals, then a semi join up to supplier.
# Quantity sums are integral doubles (exact in both engines), so the
# share comparison is decidable. Scale: part-name filter broadcasts into
# the fact scan; both aggregation levels share the partkey shuffle; the
# final semi join carries only qualifying suppkeys.
# ---------------------------------------------------------------------------

Q20_ORACLE = """
WITH red_lines AS (
    SELECT l.l_partkey, l.l_suppkey, l.l_quantity
    FROM lineitem l
    JOIN part p ON l.l_partkey = p.p_partkey
    WHERE p.p_name LIKE 'red%'
      AND l.l_shipdate >= TIMESTAMP '1996-01-01'
      AND l.l_shipdate < TIMESTAMP '1997-01-01'
),
per_pair AS (
    SELECT l_partkey, l_suppkey, sum(l_quantity) AS pair_qty
    FROM red_lines GROUP BY l_partkey, l_suppkey
),
per_part AS (
    SELECT l_partkey, sum(pair_qty) AS part_qty FROM per_pair GROUP BY l_partkey
)
SELECT s.s_suppkey, s.s_name, n.n_name
FROM supplier s
JOIN nation n ON s.s_nationkey = n.n_nationkey
WHERE s.s_suppkey IN (
    SELECT pp.l_suppkey
    FROM per_pair pp JOIN per_part pt ON pp.l_partkey = pt.l_partkey
    WHERE pp.pair_qty > 0.3 * pt.part_qty
)
ORDER BY s.s_suppkey
"""


@register("q20_promotion_suppliers", Q20_ORACLE)
def q20_promotion_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(
        spark, sf_dir, "lineitem",
        columns=["l_partkey", "l_suppkey", "l_quantity", "l_shipdate"],
    ).filter((F.col("l_shipdate") >= "1996-01-01") & (F.col("l_shipdate") < "1997-01-01"))
    part = load_table(spark, sf_dir, "part", columns=["p_partkey", "p_name"])
    supplier = load_table(spark, sf_dir, "supplier", columns=["s_suppkey", "s_name", "s_nationkey"])
    nation = load_table(spark, sf_dir, "nation", columns=["n_nationkey", "n_name"])
    red_parts = F.broadcast(part.filter(F.col("p_name").like("red%")).select("p_partkey"))
    red_lines = li.join(red_parts, F.col("l_partkey") == F.col("p_partkey"), "left_semi")
    per_pair = red_lines.groupBy("l_partkey", "l_suppkey").agg(
        F.sum("l_quantity").alias("pair_qty")
    )
    per_part = per_pair.groupBy("l_partkey").agg(F.sum("pair_qty").alias("part_qty"))
    dominant = (
        per_pair.join(per_part, "l_partkey")
        .filter(F.col("pair_qty") > 0.3 * F.col("part_qty"))
        .select("l_suppkey")
        .distinct()
    )
    return (
        supplier.join(F.broadcast(dominant), F.col("s_suppkey") == F.col("l_suppkey"), "left_semi")
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey", "s_name", "n_name")
        .orderBy("s_suppkey")
    )

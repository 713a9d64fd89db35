"""Second batch of classic analytical query shapes (TPC-H Q6/Q7/Q8/Q9/
Q12/Q14/Q15/Q19/Q22 adapted to the trimmed fixture schema — no
partsupp/shipmode/commitdate columns, see TESTDATA.md).

These widen the relational surface beyond what the reference needs
(SURVEY.md §2A notes the reference has no subquery/window/top-k at all;
§2B mandates a general analytical surface over the product tables):

- q6: single-table filter + scalar aggregate (scan-efficiency shape —
  the whole query is one codegen'd stage, filters reach the parquet
  scan as PushedFilters).
- q7: two independent dimension paths (supplier-nation and
  customer-nation) joined through the fact — classic snowflake with
  broadcast dims, one fact shuffle on orderkey.
- q8: market-share ratio via conditional aggregation over a 6-table
  join.
- q9: profit by supplier nation × year with a part-name predicate.
- q12: CASE-based conditional counts (Q12's essence without shipmode).
- q14: promo revenue percentage — ratio of conditional sum to total.
- q15: top supplier by revenue — aggregate then argmax with a
  deterministic tiebreak.
- q19: OR-of-conjunctions predicate (brand × size × quantity bands) —
  exercises Catalyst's disjunctive filter pushdown and join-condition
  hoisting.
- q22: above-average-balance customers with no orders — scalar
  aggregate subquery + anti join.

Hash-parity conventions as everywhere: identical aliases both sides,
float aggregates rounded on both sides, deterministic ORDER BY.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from insurance_helper_spark.queries.catalog import register
from insurance_helper_spark.sources.tables import load_table


# ---------------------------------------------------------------------------
# q6 — forecasting revenue change: one scan, pushed filters, one agg.
# Scale: no shuffle at all except the final 1-row reduce; the date /
# discount / quantity predicates all reach the parquet reader.
# ---------------------------------------------------------------------------

Q6_ORACLE = """
SELECT round(sum(l_extendedprice * l_discount), 2) AS revenue,
       count(*) AS n_lines
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01'
  AND l_shipdate < TIMESTAMP '1997-01-01'
  AND l_discount BETWEEN 0.05 AND 0.07
  AND l_quantity < 24
"""


@register("q6_revenue_forecast", Q6_ORACLE)
def q6_revenue_forecast(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(
        spark, sf_dir, "lineitem",
        columns=["l_shipdate", "l_discount", "l_quantity", "l_extendedprice"],
    )
    return (
        li.filter(
            (F.col("l_shipdate") >= "1996-01-01")
            & (F.col("l_shipdate") < "1997-01-01")
            & (F.col("l_discount") >= 0.05)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * F.col("l_discount")), 2).alias("revenue"),
            F.count("*").alias("n_lines"),
        )
    )


# ---------------------------------------------------------------------------
# q7 — volume shipping between two nations: the fact row reaches both a
# supplier-side and a customer-side dimension chain. Scale: nation and
# supplier broadcast (fixed-size dims); the only big shuffle is
# lineitem⋈orders on orderkey; customer joins on the already-reduced
# order side.
# ---------------------------------------------------------------------------

Q7_ORACLE = """
SELECT sn.n_name AS supp_nation,
       cn.n_name AS cust_nation,
       year(l.l_shipdate) AS ship_year,
       round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS volume
FROM lineitem l
JOIN orders o ON l.l_orderkey = o.o_orderkey
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN supplier s ON l.l_suppkey = s.s_suppkey
JOIN nation sn ON s.s_nationkey = sn.n_nationkey
JOIN nation cn ON c.c_nationkey = cn.n_nationkey
WHERE l.l_shipdate >= TIMESTAMP '1995-01-01'
  AND l.l_shipdate < TIMESTAMP '1997-01-01'
  AND ((sn.n_name = 'NATION_3' AND cn.n_name = 'NATION_7')
    OR (sn.n_name = 'NATION_7' AND cn.n_name = 'NATION_3'))
GROUP BY supp_nation, cust_nation, ship_year
ORDER BY supp_nation, cust_nation, ship_year
"""


@register("q7_volume_shipping", Q7_ORACLE)
def q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(
        spark, sf_dir, "lineitem",
        columns=["l_orderkey", "l_suppkey", "l_shipdate", "l_extendedprice", "l_discount"],
    ).filter((F.col("l_shipdate") >= "1995-01-01") & (F.col("l_shipdate") < "1997-01-01"))
    orders = load_table(spark, sf_dir, "orders", columns=["o_orderkey", "o_custkey"])
    customer = load_table(spark, sf_dir, "customer", columns=["c_custkey", "c_nationkey"])
    supplier = load_table(spark, sf_dir, "supplier", columns=["s_suppkey", "s_nationkey"])
    nation = load_table(spark, sf_dir, "nation", columns=["n_nationkey", "n_name"])
    supp_n = F.broadcast(nation.select(F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation")))
    cust_n = F.broadcast(nation.select(F.col("n_nationkey").alias("cn_key"), F.col("n_name").alias("cust_nation")))
    return (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(customer, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(supplier), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(supp_n, F.col("s_nationkey") == F.col("sn_key"))
        .join(cust_n, F.col("c_nationkey") == F.col("cn_key"))
        .filter(
            ((F.col("supp_nation") == "NATION_3") & (F.col("cust_nation") == "NATION_7"))
            | ((F.col("supp_nation") == "NATION_7") & (F.col("cust_nation") == "NATION_3"))
        )
        .groupBy("supp_nation", "cust_nation", F.year("l_shipdate").alias("ship_year"))
        .agg(F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("volume"))
        .orderBy("supp_nation", "cust_nation", "ship_year")
    )


# ---------------------------------------------------------------------------
# q8 — market share: fraction of ASIA-region revenue supplied by
# NATION_3, per year. Conditional aggregation (sum(CASE)/sum) over a
# snowflake join. Scale: all dims broadcast; single fact shuffle.
# ---------------------------------------------------------------------------

Q8_ORACLE = """
SELECT year(o.o_orderdate) AS order_year,
       round(sum(CASE WHEN sn.n_name = 'NATION_3'
                      THEN l.l_extendedprice * (1 - l.l_discount)
                      ELSE 0 END)
             / sum(l.l_extendedprice * (1 - l.l_discount)), 4) AS mkt_share
FROM lineitem l
JOIN orders o ON l.l_orderkey = o.o_orderkey
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN nation cn ON c.c_nationkey = cn.n_nationkey
JOIN region r ON cn.n_regionkey = r.r_regionkey
JOIN supplier s ON l.l_suppkey = s.s_suppkey
JOIN nation sn ON s.s_nationkey = sn.n_nationkey
WHERE r.r_name = 'ASIA'
GROUP BY order_year
ORDER BY order_year
"""


@register("q8_market_share", Q8_ORACLE)
def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(
        spark, sf_dir, "lineitem",
        columns=["l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"],
    )
    orders = load_table(spark, sf_dir, "orders", columns=["o_orderkey", "o_custkey", "o_orderdate"])
    customer = load_table(spark, sf_dir, "customer", columns=["c_custkey", "c_nationkey"])
    supplier = load_table(spark, sf_dir, "supplier", columns=["s_suppkey", "s_nationkey"])
    nation = load_table(spark, sf_dir, "nation", columns=["n_nationkey", "n_name", "n_regionkey"])
    region = load_table(spark, sf_dir, "region", columns=["r_regionkey", "r_name"])
    cust_n = F.broadcast(
        nation.join(F.broadcast(region.filter(F.col("r_name") == "ASIA")),
                    F.col("n_regionkey") == F.col("r_regionkey"))
        .select(F.col("n_nationkey").alias("cn_key"))
    )
    supp_n = F.broadcast(nation.select(F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation")))
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(customer, F.col("o_custkey") == F.col("c_custkey"))
        .join(cust_n, F.col("c_nationkey") == F.col("cn_key"))
        .join(F.broadcast(supplier), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(supp_n, F.col("s_nationkey") == F.col("sn_key"))
        .groupBy(F.year("o_orderdate").alias("order_year"))
        .agg(
            F.round(
                F.sum(F.when(F.col("supp_nation") == "NATION_3", rev).otherwise(F.lit(0.0)))
                / F.sum(rev),
                4,
            ).alias("mkt_share")
        )
        .orderBy("order_year")
    )


# ---------------------------------------------------------------------------
# q9 — profit by supplier nation × year for parts matching a name
# predicate. Scale: the part filter runs before the fact join (Catalyst
# pushes it into the broadcast build side), so the fact shuffle only
# carries matching partkeys.
# ---------------------------------------------------------------------------

Q9_ORACLE = """
SELECT n.n_name AS nation,
       year(l.l_shipdate) AS ship_year,
       round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS profit
FROM lineitem l
JOIN part p ON l.l_partkey = p.p_partkey
JOIN supplier s ON l.l_suppkey = s.s_suppkey
JOIN nation n ON s.s_nationkey = n.n_nationkey
WHERE p.p_name LIKE '%red%'
GROUP BY nation, ship_year
ORDER BY nation, ship_year DESC
"""


@register("q9_profit_by_nation", Q9_ORACLE)
def q9_profit_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(
        spark, sf_dir, "lineitem",
        columns=["l_partkey", "l_suppkey", "l_shipdate", "l_extendedprice", "l_discount"],
    )
    part = load_table(spark, sf_dir, "part", columns=["p_partkey", "p_name"])
    supplier = load_table(spark, sf_dir, "supplier", columns=["s_suppkey", "s_nationkey"])
    nation = load_table(spark, sf_dir, "nation", columns=["n_nationkey", "n_name"])
    return (
        li.join(F.broadcast(part.filter(F.col("p_name").like("%red%"))),
                F.col("l_partkey") == F.col("p_partkey"))
        .join(F.broadcast(supplier), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy(F.col("n_name").alias("nation"), F.year("l_shipdate").alias("ship_year"))
        .agg(F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("profit"))
        .orderBy("nation", F.desc("ship_year"))
    )


# ---------------------------------------------------------------------------
# q12 — conditional counts (TPC-H Q12's CASE-sum essence, shipmode
# replaced by linestatus): per line status, how many lines belong to
# urgent/high-priority orders vs the rest. Scale: one fact shuffle on
# orderkey, map-side partial CASE-sums.
# ---------------------------------------------------------------------------

Q12_ORACLE = """
SELECT l.l_linestatus,
       CAST(sum(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END)
            AS BIGINT) AS high_line_count,
       CAST(sum(CASE WHEN o.o_orderpriority NOT IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END)
            AS BIGINT) AS low_line_count
FROM lineitem l
JOIN orders o ON l.l_orderkey = o.o_orderkey
WHERE l.l_shipdate >= TIMESTAMP '1996-01-01'
  AND l.l_shipdate < TIMESTAMP '1997-01-01'
GROUP BY l.l_linestatus
ORDER BY l.l_linestatus
"""


@register("q12_priority_lines", Q12_ORACLE)
def q12_priority_lines(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(
        spark, sf_dir, "lineitem", columns=["l_orderkey", "l_linestatus", "l_shipdate"]
    ).filter((F.col("l_shipdate") >= "1996-01-01") & (F.col("l_shipdate") < "1997-01-01"))
    orders = load_table(spark, sf_dir, "orders", columns=["o_orderkey", "o_orderpriority"])
    is_high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("l_linestatus")
        .agg(
            # Explicit BIGINT on both sides: DuckDB sum(CASE) is HUGEINT
            # (float64/object in pandas) which hash-mismatches Spark's LONG.
            F.sum(F.when(is_high, 1).otherwise(0)).cast("long").alias("high_line_count"),
            F.sum(F.when(~is_high, 1).otherwise(0)).cast("long").alias("low_line_count"),
        )
        .orderBy("l_linestatus")
    )


# ---------------------------------------------------------------------------
# q14 — promo revenue share: ratio of two aggregates over one scan.
# Scale: part broadcasts; single pass over the filtered fact.
# ---------------------------------------------------------------------------

Q14_ORACLE = """
SELECT round(100.0 * sum(CASE WHEN p.p_type = 'PROMO'
                              THEN l.l_extendedprice * (1 - l.l_discount)
                              ELSE 0 END)
             / sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS promo_pct,
       count(*) AS n_lines
FROM lineitem l
JOIN part p ON l.l_partkey = p.p_partkey
WHERE l.l_shipdate >= TIMESTAMP '1996-03-01'
  AND l.l_shipdate < TIMESTAMP '1996-04-01'
"""


@register("q14_promo_revenue", Q14_ORACLE)
def q14_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(
        spark, sf_dir, "lineitem",
        columns=["l_partkey", "l_shipdate", "l_extendedprice", "l_discount"],
    ).filter((F.col("l_shipdate") >= "1996-03-01") & (F.col("l_shipdate") < "1996-04-01"))
    part = load_table(spark, sf_dir, "part", columns=["p_partkey", "p_type"])
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return li.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey")).agg(
        F.round(
            100.0 * F.sum(F.when(F.col("p_type") == "PROMO", rev).otherwise(F.lit(0.0))) / F.sum(rev),
            2,
        ).alias("promo_pct"),
        F.count("*").alias("n_lines"),
    )


# ---------------------------------------------------------------------------
# q15 — top supplier by revenue in a quarter: aggregate → argmax with a
# deterministic tiebreak (rounded revenue, then suppkey). Spark side
# uses a rank window over the rounded revenue — equivalent to the
# classic scalar-subquery-max formulation, and the rounding on BOTH
# sides makes the cross-engine comparison well-defined. Scale: the
# per-supplier aggregate is tiny (|suppliers| rows); the single-
# partition rank window over it is trivially cheap.
# ---------------------------------------------------------------------------

Q15_ORACLE = """
WITH revenue AS (
    SELECT l_suppkey AS supplier_no,
           round(sum(l_extendedprice * (1 - l_discount)), 2) AS total_revenue
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate < TIMESTAMP '1996-04-01'
    GROUP BY l_suppkey
)
SELECT s.s_suppkey, s.s_name, r.total_revenue
FROM supplier s
JOIN revenue r ON s.s_suppkey = r.supplier_no
WHERE r.total_revenue = (SELECT max(total_revenue) FROM revenue)
ORDER BY s.s_suppkey
"""


@register("q15_top_supplier", Q15_ORACLE)
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(
        spark, sf_dir, "lineitem",
        columns=["l_suppkey", "l_shipdate", "l_extendedprice", "l_discount"],
    ).filter((F.col("l_shipdate") >= "1996-01-01") & (F.col("l_shipdate") < "1996-04-01"))
    supplier = load_table(spark, sf_dir, "supplier", columns=["s_suppkey", "s_name"])
    revenue = li.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("total_revenue")
    )
    w = Window.orderBy(F.desc("total_revenue"))
    top = revenue.withColumn("__rk", F.rank().over(w)).filter(F.col("__rk") == 1).drop("__rk")
    return (
        F.broadcast(top)
        .join(supplier, F.col("supplier_no") == F.col("s_suppkey"))
        .select("s_suppkey", "s_name", "total_revenue")
        .orderBy("s_suppkey")
    )


# ---------------------------------------------------------------------------
# q19 — disjunctive predicate revenue (brand × size × quantity bands).
# Catalyst hoists the common l_partkey=p_partkey conjunct out of the OR
# and pushes the residual disjunction below the join where possible.
# ---------------------------------------------------------------------------

Q19_ORACLE = """
SELECT round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue,
       count(*) AS n_lines
FROM lineitem l
JOIN part p ON l.l_partkey = p.p_partkey
WHERE (p.p_brand = 'Brand#12' AND p.p_size BETWEEN 1 AND 15
       AND l.l_quantity >= 1 AND l.l_quantity <= 11)
   OR (p.p_brand = 'Brand#23' AND p.p_size BETWEEN 1 AND 25
       AND l.l_quantity >= 10 AND l.l_quantity <= 20)
   OR (p.p_brand = 'Brand#3' AND p.p_size BETWEEN 1 AND 35
       AND l.l_quantity >= 20 AND l.l_quantity <= 30)
"""


@register("q19_disjunctive_predicates", Q19_ORACLE)
def q19_disjunctive_predicates(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(
        spark, sf_dir, "lineitem",
        columns=["l_partkey", "l_quantity", "l_extendedprice", "l_discount"],
    )
    part = load_table(spark, sf_dir, "part", columns=["p_partkey", "p_brand", "p_size"])
    qty = F.col("l_quantity")
    cond = (
        ((F.col("p_brand") == "Brand#12") & F.col("p_size").between(1, 15) & (qty >= 1) & (qty <= 11))
        | ((F.col("p_brand") == "Brand#23") & F.col("p_size").between(1, 25) & (qty >= 10) & (qty <= 20))
        | ((F.col("p_brand") == "Brand#3") & F.col("p_size").between(1, 35) & (qty >= 20) & (qty <= 30))
    )
    return (
        li.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .filter(cond)
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue"),
            F.count("*").alias("n_lines"),
        )
    )


# ---------------------------------------------------------------------------
# q22 — idle high-balance customers: scalar aggregate subquery (global
# average balance — computed once, broadcast) + anti join against
# orders, grouped by a derived customer-code (substring of the padded
# name — the fixtures have no phone column). Scale: the orders anti
# join is the only fact shuffle; the scalar avg is a 1-row broadcast.
# ---------------------------------------------------------------------------

Q22_ORACLE = """
WITH avg_bal AS (
    SELECT avg(c_acctbal) AS ab FROM customer WHERE c_acctbal > 0.0
)
SELECT substr(c.c_name, length(c.c_name) - 1, 2) AS cust_code,
       count(*) AS n_custs,
       round(sum(c.c_acctbal), 2) AS total_bal
FROM customer c, avg_bal
WHERE c.c_acctbal > avg_bal.ab
  AND NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
GROUP BY cust_code
ORDER BY cust_code
"""


@register("q22_idle_customers", Q22_ORACLE)
def q22_idle_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = load_table(spark, sf_dir, "customer", columns=["c_custkey", "c_name", "c_acctbal"])
    orders = load_table(spark, sf_dir, "orders", columns=["o_custkey"])
    avg_bal = customer.filter(F.col("c_acctbal") > 0.0).agg(F.avg("c_acctbal").alias("ab"))
    return (
        customer.join(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("ab"))
        .join(orders, F.col("c_custkey") == F.col("o_custkey"), "left_anti")
        .groupBy(F.substring(F.col("c_name"), -2, 2).alias("cust_code"))
        .agg(
            F.count("*").alias("n_custs"),
            F.round(F.sum("c_acctbal"), 2).alias("total_bal"),
        )
        .orderBy("cust_code")
    )


# ---------------------------------------------------------------------------
# q13 — customer order-count distribution (Q13 without the o_comment
# predicate the fixture lacks): LEFT join so zero-order customers count,
# then a histogram over the per-customer counts. Scale: the first agg
# shuffles on custkey; the histogram input is one row per customer and
# the second agg's key cardinality is tiny.
# ---------------------------------------------------------------------------

Q13_ORACLE = """
WITH per_cust AS (
  SELECT c.c_custkey, CAST(count(o.o_orderkey) AS BIGINT) AS c_count
  FROM customer c LEFT JOIN orders o ON c.c_custkey = o.o_custkey
  GROUP BY c.c_custkey
)
SELECT c_count, CAST(count(*) AS BIGINT) AS custdist
FROM per_cust
GROUP BY c_count
ORDER BY custdist DESC, c_count DESC
"""


@register("q13_customer_distribution", Q13_ORACLE)
def q13_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer", columns=["c_custkey"])
    orders = load_table(spark, sf_dir, "orders", columns=["o_orderkey", "o_custkey"])
    per_cust = (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count("*").alias("custdist"))
        .orderBy(F.desc("custdist"), F.desc("c_count"))
    )


# ---------------------------------------------------------------------------
# q17 — small-quantity-order revenue (Q17 with the brand/container
# predicate trimmed to brand only): lines below 20% of their part's
# average quantity. The correlated scalar subquery becomes a per-part
# aggregate JOINED back — at scale the per-part average relation is
# partkey-sized and co-shuffles with the fact on partkey, exactly the
# decorrelation Catalyst itself would pick.
# ---------------------------------------------------------------------------

Q17_ORACLE = """
WITH avg_qty AS (
  SELECT l_partkey, avg(l_quantity) AS a
  FROM lineitem GROUP BY l_partkey
)
SELECT round(sum(l.l_extendedprice) / 7.0, 2) AS avg_yearly
FROM lineitem l
JOIN part p ON p.p_partkey = l.l_partkey
JOIN avg_qty aq ON aq.l_partkey = l.l_partkey
WHERE p.p_brand = 'Brand#13'
  AND l.l_quantity < 0.2 * aq.a
"""


@register("q17_small_quantity_revenue", Q17_ORACLE)
def q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(
        spark, sf_dir, "lineitem",
        columns=["l_partkey", "l_quantity", "l_extendedprice"],
    )
    part = load_table(spark, sf_dir, "part", columns=["p_partkey", "p_brand"])
    avg_qty = li.groupBy("l_partkey").agg(F.avg("l_quantity").alias("a"))
    brand = part.filter(F.col("p_brand") == "Brand#13")
    return (
        li.join(F.broadcast(brand), li.l_partkey == brand.p_partkey)
        .join(avg_qty, "l_partkey")
        .filter(F.col("l_quantity") < 0.2 * F.col("a"))
        .agg(F.round(F.sum("l_extendedprice") / 7.0, 2).alias("avg_yearly"))
    )


# ---------------------------------------------------------------------------
# q21 — suppliers who alone were late (Q21 adapted: the fixture has no
# commit/receipt dates, so "late" = shipped more than 90 days after the
# order date). For multi-supplier orders, find suppliers with a late
# line where EXISTS another supplier's line in the same order and NOT
# EXISTS another supplier's LATE line — i.e. they alone held the order
# up. EXISTS/NOT EXISTS become left_semi/left_anti self-joins keyed on
# orderkey: same-key co-shuffles, no correlated per-row probing.
# ---------------------------------------------------------------------------

Q21_ORACLE = """
WITH lines AS (
  SELECT l.l_orderkey, l.l_suppkey,
         l.l_shipdate > o.o_orderdate + INTERVAL 90 DAY AS is_late
  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
),
late AS (
  SELECT DISTINCT l_orderkey, l_suppkey FROM lines WHERE is_late
),
candidates AS (
  SELECT la.l_orderkey, la.l_suppkey FROM late la
  WHERE EXISTS (SELECT 1 FROM lines x
                WHERE x.l_orderkey = la.l_orderkey
                  AND x.l_suppkey <> la.l_suppkey)
    AND NOT EXISTS (SELECT 1 FROM lines y
                    WHERE y.l_orderkey = la.l_orderkey
                      AND y.l_suppkey <> la.l_suppkey AND y.is_late)
)
SELECT s.s_name, CAST(count(*) AS BIGINT) AS numwait
FROM candidates c JOIN supplier s ON s.s_suppkey = c.l_suppkey
GROUP BY s.s_name
ORDER BY numwait DESC, s.s_name
"""


@register("q21_sole_late_supplier", Q21_ORACLE)
def q21_sole_late_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(
        spark, sf_dir, "lineitem", columns=["l_orderkey", "l_suppkey", "l_shipdate"]
    )
    orders = load_table(spark, sf_dir, "orders", columns=["o_orderkey", "o_orderdate"])
    supp = load_table(spark, sf_dir, "supplier", columns=["s_suppkey", "s_name"])
    lines = li.join(orders, li.l_orderkey == orders.o_orderkey).select(
        "l_orderkey",
        "l_suppkey",
        (F.col("l_shipdate") > F.date_add(F.col("o_orderdate"), 90)).alias("is_late"),
    )
    late = lines.filter("is_late").select("l_orderkey", "l_suppkey").distinct()
    others = lines.select("l_orderkey", "l_suppkey")
    other_exists = late.alias("la").join(
        others.alias("x"),
        (F.col("la.l_orderkey") == F.col("x.l_orderkey"))
        & (F.col("la.l_suppkey") != F.col("x.l_suppkey")),
        "left_semi",
    )
    other_late = lines.filter("is_late").select("l_orderkey", "l_suppkey")
    candidates = other_exists.alias("la").join(
        other_late.alias("y"),
        (F.col("la.l_orderkey") == F.col("y.l_orderkey"))
        & (F.col("la.l_suppkey") != F.col("y.l_suppkey")),
        "left_anti",
    )
    return (
        candidates.join(F.broadcast(supp), candidates.l_suppkey == supp.s_suppkey)
        .groupBy("s_name")
        .agg(F.count("*").alias("numwait"))
        .orderBy(F.desc("numwait"), "s_name")
    )

"""Relational surface extensions (SURVEY §2B gaps): lag/lead windows,
RANGE window frames, GROUPING SETS, levenshtein fuzzy name matching
(reference README.md:85-86 insurer-name normalization), theta/cross
join, and the remaining classic TPC-H query shapes (Q3/Q10/Q18).

Same hash-parity conventions as ``relational.py``: identical aliases
both sides, rounded float aggregates, deterministic tiebreaks on any
rank/limit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from insurance_helper_spark.queries.catalog import register
from insurance_helper_spark.sources.tables import load_table


# ---------------------------------------------------------------------------
# window_lag_lead — per-customer order history deltas (lag/lead ports of
# the launch-date-delta analytics declared in SURVEY §2B "Windows").
# Scale: one shuffle on o_custkey; window state is per-customer and
# streamed — no skew risk (customer keys are near-uniform), survives
# 100× with the same single shuffle.
# ---------------------------------------------------------------------------

LAG_LEAD_ORACLE = """
SELECT o_custkey,
       o_orderkey,
       CAST(o_orderdate AS DATE) AS order_date,
       date_diff('day',
                 lag(CAST(o_orderdate AS DATE))
                   OVER (PARTITION BY o_custkey
                         ORDER BY o_orderdate, o_orderkey),
                 CAST(o_orderdate AS DATE)) AS days_since_prev,
       date_diff('day',
                 CAST(o_orderdate AS DATE),
                 lead(CAST(o_orderdate AS DATE))
                   OVER (PARTITION BY o_custkey
                         ORDER BY o_orderdate, o_orderkey)) AS days_to_next
FROM orders
WHERE o_custkey <= 200
ORDER BY o_custkey, order_date, o_orderkey
"""


@register("window_lag_lead", LAG_LEAD_ORACLE)
def window_lag_lead(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(
        spark, sf_dir, "orders", columns=["o_custkey", "o_orderkey", "o_orderdate"]
    ).filter(F.col("o_custkey") <= 200)
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    order_date = F.col("o_orderdate").cast("date")
    return (
        orders.select(
            "o_custkey",
            "o_orderkey",
            order_date.alias("order_date"),
            F.datediff(order_date, F.lag(order_date).over(w)).alias("days_since_prev"),
            F.datediff(F.lead(order_date).over(w), order_date).alias("days_to_next"),
        )
        .orderBy("o_custkey", "order_date", "o_orderkey")
    )


# ---------------------------------------------------------------------------
# window_range_frame — trailing-30-day rolling order stats per customer
# using a RANGE frame over an integer day offset (Spark's rangeBetween
# requires a numeric ORDER BY expression). RANGE (not ROWS) so same-day
# peer orders are all included — identical peer semantics in DuckDB.
# Scale: same single o_custkey shuffle as above.
# ---------------------------------------------------------------------------

RANGE_FRAME_ORACLE = """
WITH t AS (
  SELECT o_custkey, o_orderkey, o_totalprice,
         date_diff('day', DATE '1992-01-01', CAST(o_orderdate AS DATE)) AS day_no
  FROM orders
  WHERE o_custkey <= 200
)
SELECT o_custkey, o_orderkey, day_no,
       count(*) OVER w AS orders_30d,
       round(sum(o_totalprice) OVER w, 2) AS spend_30d
FROM t
WINDOW w AS (PARTITION BY o_custkey ORDER BY day_no
             RANGE BETWEEN 30 PRECEDING AND CURRENT ROW)
ORDER BY o_custkey, day_no, o_orderkey
"""


@register("window_range_frame", RANGE_FRAME_ORACLE)
def window_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(
        spark, sf_dir, "orders", columns=["o_custkey", "o_orderkey", "o_orderdate", "o_totalprice"]
    ).filter(F.col("o_custkey") <= 200)
    t = orders.select(
        "o_custkey",
        "o_orderkey",
        "o_totalprice",
        F.datediff(F.col("o_orderdate").cast("date"), F.lit("1992-01-01").cast("date")).alias(
            "day_no"
        ),
    )
    w = Window.partitionBy("o_custkey").orderBy("day_no").rangeBetween(-30, 0)
    return (
        t.select(
            "o_custkey",
            "o_orderkey",
            "day_no",
            F.count("*").over(w).alias("orders_30d"),
            F.round(F.sum("o_totalprice").over(w), 2).alias("spend_30d"),
        )
        .orderBy("o_custkey", "day_no", "o_orderkey")
    )


# ---------------------------------------------------------------------------
# agg_grouping_sets — explicit GROUPING SETS (finer than rollup/cube,
# SURVEY §2B "grouping sets"). Expressed through Spark SQL (the
# DataFrame API only exposes rollup/cube; SQL is equally first-class
# and goes through the same Catalyst Expand operator).
# Scale: Expand multiplies rows by the number of sets (3×) BEFORE the
# shuffle, but partial aggregation collapses them map-side — the
# shuffled data is proportional to group cardinality, not input rows.
# ---------------------------------------------------------------------------

GROUPING_SETS_ORACLE = """
SELECT coalesce(l_returnflag, 'ALL') AS returnflag,
       coalesce(l_linestatus, 'ALL') AS linestatus,
       count(*) AS n_items,
       round(sum(l_extendedprice), 2) AS sum_price
FROM lineitem
GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())
ORDER BY returnflag, linestatus
"""


@register("agg_grouping_sets", GROUPING_SETS_ORACLE)
def agg_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_table(
        spark, sf_dir, "lineitem", columns=["l_returnflag", "l_linestatus", "l_extendedprice"]
    ).createOrReplaceTempView("_gs_lineitem")
    return spark.sql(
        """
        SELECT coalesce(l_returnflag, 'ALL') AS returnflag,
               coalesce(l_linestatus, 'ALL') AS linestatus,
               count(*) AS n_items,
               round(sum(l_extendedprice), 2) AS sum_price
        FROM _gs_lineitem
        GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())
        ORDER BY returnflag, linestatus
        """
    )


# ---------------------------------------------------------------------------
# levenshtein_name_pairs — fuzzy name matching via edit distance, the
# insurer-name-normalization operator the reference declares for Stage 2
# (README.md:85-86). Self theta-join of the nation dim on
# levenshtein <= 4 — also covers the cross/theta join row of SURVEY §2B
# (BroadcastNestedLoopJoin; the dim is tiny so this is the RIGHT plan).
# Scale: in production this is dim×dim (insurer names), never fact×fact;
# a 25×25 or even 10k×10k name-pair join broadcasts the smaller side.
# ---------------------------------------------------------------------------

LEVENSHTEIN_ORACLE = """
SELECT a.n_name AS name_a, b.n_name AS name_b,
       levenshtein(a.n_name, b.n_name) AS edit_dist
FROM nation a
JOIN nation b ON a.n_nationkey < b.n_nationkey
WHERE levenshtein(a.n_name, b.n_name) <= 4
ORDER BY edit_dist, name_a, name_b
"""


@register("levenshtein_name_pairs", LEVENSHTEIN_ORACLE)
def levenshtein_name_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    nation = load_table(spark, sf_dir, "nation", columns=["n_nationkey", "n_name"])
    a = nation.alias("a")
    b = nation.alias("b")
    dist = F.levenshtein(F.col("a.n_name"), F.col("b.n_name"))
    return (
        a.join(F.broadcast(b), F.col("a.n_nationkey") < F.col("b.n_nationkey"))
        .select(
            F.col("a.n_name").alias("name_a"),
            F.col("b.n_name").alias("name_b"),
            dist.alias("edit_dist"),
        )
        .filter(F.col("edit_dist") <= 4)
        .orderBy("edit_dist", "name_a", "name_b")
    )


# ---------------------------------------------------------------------------
# q3_shipping_priority — TPC-H Q3 shape: 3-way join, filter both fact
# sides, agg, deterministic top-10. Scale: customer filter reduces the
# build side before the o_custkey shuffle join; lineitem⋈orders shuffles
# on orderkey; AQE picks broadcast if the filtered side collapses.
# ---------------------------------------------------------------------------

Q3_ORACLE = """
SELECT l.l_orderkey,
       round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue,
       CAST(o.o_orderdate AS DATE) AS order_date,
       o.o_orderpriority
FROM customer c
JOIN orders o ON c.c_custkey = o.o_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
WHERE c.c_mktsegment = 'BUILDING'
  AND o.o_orderdate < TIMESTAMP '1995-03-15'
  AND l.l_shipdate > TIMESTAMP '1995-03-15'
GROUP BY l.l_orderkey, order_date, o.o_orderpriority
ORDER BY revenue DESC, l_orderkey
LIMIT 10
"""


@register("q3_shipping_priority", Q3_ORACLE)
def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = load_table(spark, sf_dir, "customer", columns=["c_custkey", "c_mktsegment"])
    orders = load_table(
        spark, sf_dir, "orders",
        columns=["o_orderkey", "o_custkey", "o_orderdate", "o_orderpriority"],
    )
    li = load_table(
        spark, sf_dir, "lineitem",
        columns=["l_orderkey", "l_extendedprice", "l_discount", "l_shipdate"],
    )
    return (
        customer.filter(F.col("c_mktsegment") == "BUILDING")
        .join(orders.filter(F.col("o_orderdate") < "1995-03-15"),
              F.col("c_custkey") == F.col("o_custkey"))
        .join(li.filter(F.col("l_shipdate") > "1995-03-15"),
              F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy(
            "l_orderkey",
            F.col("o_orderdate").cast("date").alias("order_date"),
            "o_orderpriority",
        )
        .agg(F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue"))
        .select("l_orderkey", "revenue", "order_date", "o_orderpriority")
        .orderBy(F.desc("revenue"), "l_orderkey")
        .limit(10)
    )


# ---------------------------------------------------------------------------
# q10_returned_items — TPC-H Q10 shape: returned-item revenue per
# customer, top-20. Scale: lineitem filtered on returnflag before the
# orderkey shuffle; nation broadcasts; final top-k is a TakeOrdered —
# no global sort materialization.
# ---------------------------------------------------------------------------

Q10_ORACLE = """
SELECT c.c_custkey, c.c_name,
       round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue,
       round(c.c_acctbal, 2) AS acctbal,
       n.n_name AS nation
FROM customer c
JOIN orders o ON c.c_custkey = o.o_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
JOIN nation n ON c.c_nationkey = n.n_nationkey
WHERE o.o_orderdate >= TIMESTAMP '1993-10-01'
  AND o.o_orderdate < TIMESTAMP '1994-01-01'
  AND l.l_returnflag = 'R'
GROUP BY c.c_custkey, c.c_name, acctbal, nation
ORDER BY revenue DESC, c_custkey
LIMIT 20
"""


@register("q10_returned_items", Q10_ORACLE)
def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = load_table(
        spark, sf_dir, "customer", columns=["c_custkey", "c_name", "c_acctbal", "c_nationkey"]
    )
    orders = load_table(spark, sf_dir, "orders", columns=["o_orderkey", "o_custkey", "o_orderdate"])
    li = load_table(
        spark, sf_dir, "lineitem",
        columns=["l_orderkey", "l_extendedprice", "l_discount", "l_returnflag"],
    )
    nation = load_table(spark, sf_dir, "nation", columns=["n_nationkey", "n_name"])
    return (
        customer
        .join(
            orders.filter(
                (F.col("o_orderdate") >= "1993-10-01") & (F.col("o_orderdate") < "1994-01-01")
            ),
            F.col("c_custkey") == F.col("o_custkey"),
        )
        .join(li.filter(F.col("l_returnflag") == "R"),
              F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy(
            "c_custkey",
            "c_name",
            F.round(F.col("c_acctbal"), 2).alias("acctbal"),
            F.col("n_name").alias("nation"),
        )
        .agg(F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue"))
        .select("c_custkey", "c_name", "revenue", "acctbal", "nation")
        .orderBy(F.desc("revenue"), "c_custkey")
        .limit(20)
    )


# ---------------------------------------------------------------------------
# q18_large_orders — TPC-H Q18 shape: HAVING over a fact aggregate, then
# a semi-join back to the facts. Scale: the HAVING aggregate shuffles on
# l_orderkey once; the filtered key set is tiny and broadcasts into the
# second pass (AQE converts the join at runtime).
# ---------------------------------------------------------------------------

Q18_ORACLE = """
WITH big AS (
  SELECT l_orderkey
  FROM lineitem
  GROUP BY l_orderkey
  HAVING sum(l_quantity) > 300
)
SELECT c.c_name, o.o_custkey, o.o_orderkey,
       CAST(o.o_orderdate AS DATE) AS order_date,
       round(o.o_totalprice, 2) AS totalprice,
       round(sum(l.l_quantity), 2) AS sum_qty
FROM customer c
JOIN orders o ON c.c_custkey = o.o_custkey
JOIN lineitem l ON o.o_orderkey = l.l_orderkey
WHERE o.o_orderkey IN (SELECT l_orderkey FROM big)
GROUP BY c.c_name, o.o_custkey, o.o_orderkey, order_date, totalprice
ORDER BY totalprice DESC, o_orderkey
LIMIT 100
"""


@register("q18_large_orders", Q18_ORACLE)
def q18_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = load_table(spark, sf_dir, "customer", columns=["c_custkey", "c_name"])
    orders = load_table(
        spark, sf_dir, "orders",
        columns=["o_orderkey", "o_custkey", "o_orderdate", "o_totalprice"],
    )
    li = load_table(spark, sf_dir, "lineitem", columns=["l_orderkey", "l_quantity"])
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("qty"))
        .filter(F.col("qty") > 300)
        .select("l_orderkey")
    )
    return (
        orders.join(big.withColumnRenamed("l_orderkey", "o_orderkey"), "o_orderkey", "left_semi")
        .join(customer, F.col("c_custkey") == F.col("o_custkey"))
        .join(li, F.col("o_orderkey") == F.col("l_orderkey"))
        .groupBy(
            "c_name",
            "o_custkey",
            "o_orderkey",
            F.col("o_orderdate").cast("date").alias("order_date"),
            F.round(F.col("o_totalprice"), 2).alias("totalprice"),
        )
        .agg(F.round(F.sum("l_quantity"), 2).alias("sum_qty"))
        .orderBy(F.desc("totalprice"), "o_orderkey")
        .limit(100)
    )


# ---------------------------------------------------------------------------
# full_outer_join_spend — FULL OUTER equi join (the one join type §2B
# lists that the rest of the catalog doesn't exercise): per-customer
# open-order vs fulfilled-order spend, keeping customers present on
# either side only. Scale: both sides are post-aggregation (cardinality
# ≤ customers), shuffle on the same key both sides — a single
# co-partitioned SMJ; survives 100× with no plan change.
# ---------------------------------------------------------------------------

FULL_OUTER_ORACLE = """
WITH open_s AS (
  SELECT o_custkey, round(sum(o_totalprice), 2) AS open_spend
  FROM orders WHERE o_orderstatus = 'O' AND o_custkey <= 300
  GROUP BY o_custkey
),
done_s AS (
  SELECT o_custkey, round(sum(o_totalprice), 2) AS done_spend
  FROM orders WHERE o_orderstatus = 'F' AND o_custkey <= 300
  GROUP BY o_custkey
)
SELECT coalesce(a.o_custkey, b.o_custkey) AS custkey,
       a.open_spend, b.done_spend
FROM open_s a FULL OUTER JOIN done_s b ON a.o_custkey = b.o_custkey
ORDER BY custkey
"""


@register("full_outer_join_spend", FULL_OUTER_ORACLE)
def full_outer_join_spend(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(
        spark, sf_dir, "orders", columns=["o_custkey", "o_orderstatus", "o_totalprice"]
    ).filter(F.col("o_custkey") <= 300)

    def spend(status: str, alias: str) -> DataFrame:
        return (
            orders.filter(F.col("o_orderstatus") == status)
            .groupBy("o_custkey")
            .agg(F.round(F.sum("o_totalprice"), 2).alias(alias))
        )

    a = spend("O", "open_spend").withColumnRenamed("o_custkey", "a_key")
    b = spend("F", "done_spend").withColumnRenamed("o_custkey", "b_key")
    return (
        a.join(b, a.a_key == b.b_key, "full_outer")
        .select(
            F.coalesce("a_key", "b_key").alias("custkey"),
            "open_spend",
            "done_spend",
        )
        .orderBy("custkey")
    )


# ---------------------------------------------------------------------------
# Skew-path operators as oracle-gated queries: the salted two-phase
# aggregation and the salted fact⋈dim join must produce EXACTLY what
# their unsalted equivalents produce — the oracle is the plain SQL.
# ---------------------------------------------------------------------------

SALTED_AGG_ORACLE = """
SELECT l_returnflag,
       round(sum(l_quantity), 2) AS sum_qty,
       count(*) AS n_items
FROM lineitem
GROUP BY l_returnflag
ORDER BY l_returnflag
"""


@register("agg_salted_hot_keys", SALTED_AGG_ORACLE)
def agg_salted_hot_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-phase salted aggregation (operators/skew.py): l_returnflag
    has only 3 values — the worst-case hot-key distribution for a
    single-phase shuffle. The salt spreads each key over 16 reducers;
    phase 2 merges 3×16 partial rows. Result must equal plain GROUP BY.
    """
    from insurance_helper_spark.operators import skew

    li = load_table(spark, sf_dir, "lineitem", columns=["l_returnflag", "l_quantity"])
    out = skew.salted_agg(
        li,
        ["l_returnflag"],
        aggs=[F.sum("l_quantity").alias("q"), F.count("*").alias("n_items")],
        reaggs=[
            F.round(F.sum("q"), 2).alias("sum_qty"),
            F.sum("n_items").alias("n_items"),
        ],
    )
    return out.select("l_returnflag", "sum_qty", "n_items").orderBy("l_returnflag")


SALTED_JOIN_ORACLE = """
SELECT o.o_orderpriority,
       count(*) AS n_items,
       round(sum(l.l_quantity), 2) AS sum_qty
FROM lineitem l
JOIN orders o ON l.l_orderkey = o.o_orderkey
GROUP BY o.o_orderpriority
ORDER BY o.o_orderpriority
"""


@register("join_salted_skew", SALTED_JOIN_ORACLE)
def join_salted_skew(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Salted equi-join (operators/skew.py): fact side salted by a
    stable row hash, dim side replicated per salt bucket. Used when one
    join key dominates and the dim is too big to broadcast; must be
    value-identical to the plain join."""
    from insurance_helper_spark.operators import skew

    li = load_table(spark, sf_dir, "lineitem", columns=["l_orderkey", "l_quantity"])
    orders = load_table(
        spark, sf_dir, "orders", columns=["o_orderkey", "o_orderpriority"]
    ).withColumnRenamed("o_orderkey", "l_orderkey")
    joined = skew.salted_join(li, orders, "l_orderkey", salt_buckets=8)
    return (
        joined.groupBy("o_orderpriority")
        .agg(
            F.count("*").alias("n_items"),
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
        )
        .orderBy("o_orderpriority")
    )


# ---------------------------------------------------------------------------
# date_spine_activity — date-range generation (SURVEY §2B "date ranges"):
# a month spine from sequence() joined against order activity, so months
# with zero orders still appear (the gap-filling pattern every reporting
# pipeline needs). Also exercises months_between-style arithmetic via
# the spine offset. Scale: the spine is a few hundred rows (broadcast);
# activity aggregates before the join, so the join input is tiny.
# ---------------------------------------------------------------------------

DATE_SPINE_ORACLE = """
WITH spine AS (
  SELECT CAST(unnest(generate_series(DATE '1992-01-01', DATE '1998-12-01',
                                     INTERVAL 1 MONTH)) AS DATE) AS month_start
),
activity AS (
  SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS month_start,
         count(*) AS n_orders,
         round(sum(o_totalprice), 2) AS revenue
  FROM orders
  GROUP BY 1
)
SELECT s.month_start,
       CAST(date_diff('month', DATE '1992-01-01', s.month_start) AS BIGINT) AS month_index,
       coalesce(a.n_orders, 0) AS n_orders,
       coalesce(a.revenue, 0.0) AS revenue
FROM spine s LEFT JOIN activity a ON s.month_start = a.month_start
ORDER BY s.month_start
"""


@register("date_spine_activity", DATE_SPINE_ORACLE)
def date_spine_activity(spark: SparkSession, sf_dir: str) -> DataFrame:
    spine = spark.range(1).select(
        F.explode(
            F.sequence(
                F.lit("1992-01-01").cast("date"),
                F.lit("1998-12-01").cast("date"),
                F.expr("INTERVAL 1 MONTH"),
            )
        ).alias("month_start")
    )
    orders = load_table(spark, sf_dir, "orders", columns=["o_orderdate", "o_totalprice"])
    activity = (
        orders.groupBy(F.trunc(F.col("o_orderdate"), "month").alias("month_start"))
        .agg(
            F.count("*").alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("revenue"),
        )
    )
    return (
        spine.join(activity, "month_start", "left")
        .select(
            "month_start",
            F.months_between(F.col("month_start"), F.lit("1992-01-01").cast("date"))
            .cast("bigint")
            .alias("month_index"),
            F.coalesce("n_orders", F.lit(0)).alias("n_orders"),
            F.coalesce("revenue", F.lit(0.0)).alias("revenue"),
        )
        .orderBy("month_start")
    )


# ---------------------------------------------------------------------------
# q4_late_orders — TPC-H Q4 shape: EXISTS correlated subquery (orders
# with at least one lineitem shipped >60 days after order date),
# expressed as a left-semi join with a non-equi conjunct. Scale: the
# semi join shuffles on orderkey once; the date predicate is evaluated
# join-side (no pre-materialized cross product).
# ---------------------------------------------------------------------------

Q4_ORACLE = """
SELECT o.o_orderpriority, count(*) AS n_orders
FROM orders o
WHERE o.o_orderdate >= TIMESTAMP '1993-07-01'
  AND o.o_orderdate < TIMESTAMP '1993-10-01'
  AND EXISTS (
    SELECT 1 FROM lineitem l
    WHERE l.l_orderkey = o.o_orderkey
      AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
  )
GROUP BY o.o_orderpriority
ORDER BY o.o_orderpriority
"""


@register("q4_late_orders", Q4_ORACLE)
def q4_late_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(
        spark, sf_dir, "orders", columns=["o_orderkey", "o_orderdate", "o_orderpriority"]
    ).filter(
        (F.col("o_orderdate") >= "1993-07-01") & (F.col("o_orderdate") < "1993-10-01")
    )
    li = load_table(spark, sf_dir, "lineitem", columns=["l_orderkey", "l_shipdate"])
    cond = (F.col("l_orderkey") == F.col("o_orderkey")) & (
        F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAY")
    )
    return (
        orders.join(li, cond, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("n_orders"))
        .orderBy("o_orderpriority")
    )


# ---------------------------------------------------------------------------
# supplier_diversity — COUNT(DISTINCT fk) inside a join (TPC-H Q16
# shape): distinct suppliers per part brand. Scale: distinct aggregation
# uses the two-phase Expand path; the join shuffles on partkey once.
# ---------------------------------------------------------------------------

SUPPLIER_DIVERSITY_ORACLE = """
SELECT p.p_brand,
       count(DISTINCT l.l_suppkey) AS n_suppliers,
       count(*) AS n_items
FROM part p
JOIN lineitem l ON p.p_partkey = l.l_partkey
WHERE p.p_size >= 20
GROUP BY p.p_brand
ORDER BY p.p_brand
"""


@register("supplier_diversity", SUPPLIER_DIVERSITY_ORACLE)
def supplier_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load_table(spark, sf_dir, "part", columns=["p_partkey", "p_brand", "p_size"]).filter(
        F.col("p_size") >= 20
    )
    li = load_table(spark, sf_dir, "lineitem", columns=["l_partkey", "l_suppkey"])
    return (
        part.join(li, part.p_partkey == li.l_partkey)
        .groupBy("p_brand")
        .agg(
            F.countDistinct("l_suppkey").alias("n_suppliers"),
            F.count("*").alias("n_items"),
        )
        .orderBy("p_brand")
    )


# ---------------------------------------------------------------------------
# above_brand_avg — correlated scalar-subquery shape (parts priced above
# their brand's average), implemented Spark-side as a window average —
# the standard decorrelation — while the oracle keeps the correlated
# subquery form. Scale: one shuffle on brand for the window; no
# self-join of part against its own aggregate.
# ---------------------------------------------------------------------------

ABOVE_AVG_ORACLE = """
SELECT p_partkey, p_brand,
       round(p_retailprice, 2) AS price,
       round((SELECT avg(p2.p_retailprice) FROM part p2
              WHERE p2.p_brand = p.p_brand), 2) AS brand_avg
FROM part p
WHERE p_retailprice > 1.2 * (SELECT avg(p2.p_retailprice) FROM part p2
                             WHERE p2.p_brand = p.p_brand)
ORDER BY p_partkey
"""


@register("above_brand_avg", ABOVE_AVG_ORACLE)
def above_brand_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load_table(spark, sf_dir, "part", columns=["p_partkey", "p_brand", "p_retailprice"])
    w = Window.partitionBy("p_brand")
    return (
        part.withColumn("brand_avg_raw", F.avg("p_retailprice").over(w))
        .filter(F.col("p_retailprice") > 1.2 * F.col("brand_avg_raw"))
        .select(
            "p_partkey",
            "p_brand",
            F.round("p_retailprice", 2).alias("price"),
            F.round("brand_avg_raw", 2).alias("brand_avg"),
        )
        .orderBy("p_partkey")
    )


# ---------------------------------------------------------------------------
# agg_percentiles — ordered-statistics aggregates: exact median /
# p90 / min / max per group. Both engines interpolate continuous
# quantiles over the sorted group identically, so values hash-match.
# Scale: exact percentile requires the group's values on one reducer —
# fine for bounded group cardinality×size; the unbounded-scale variant
# is approx_percentile (t-digest), which trades the oracle for a bound.
# ---------------------------------------------------------------------------

PERCENTILE_ORACLE = """
SELECT o_orderpriority,
       count(*) AS n_orders,
       round(quantile_cont(o_totalprice, 0.5), 2) AS median_price,
       round(quantile_cont(o_totalprice, 0.9), 2) AS p90_price,
       round(min(o_totalprice), 2) AS min_price,
       round(max(o_totalprice), 2) AS max_price
FROM orders
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""


@register("agg_percentiles", PERCENTILE_ORACLE)
def agg_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders", columns=["o_orderpriority", "o_totalprice"])
    return (
        orders.groupBy("o_orderpriority")
        .agg(
            F.count("*").alias("n_orders"),
            F.round(F.expr("percentile(o_totalprice, 0.5)"), 2).alias("median_price"),
            F.round(F.expr("percentile(o_totalprice, 0.9)"), 2).alias("p90_price"),
            F.round(F.min("o_totalprice"), 2).alias("min_price"),
            F.round(F.max("o_totalprice"), 2).alias("max_price"),
        )
        .orderBy("o_orderpriority")
    )


# ---------------------------------------------------------------------------
# array_ops_embeddings — native array functions (§2B array group) over
# the embedding column: per-row array_min/array_max/size, aggregated
# per label with exact integer sums (the order-insensitive-average
# pattern — see text_lang_quality). array_min/max are codegen'd
# natives, NOT higher-order lambdas.
# ---------------------------------------------------------------------------

ARRAY_OPS_ORACLE = """
WITH per_row AS (
  SELECT label,
         len(embedding) AS dim,
         CAST(round(CAST(list_min(embedding) AS DOUBLE) * 10000) AS BIGINT) AS mn4,
         CAST(round(CAST(list_max(embedding) AS DOUBLE) * 10000) AS BIGINT) AS mx4
  FROM embeddings
)
SELECT label,
       count(*) AS n_vecs,
       min(dim) AS min_dim,
       max(dim) AS max_dim,
       round(sum(mn4) / 10000.0 / count(*), 4) AS avg_min,
       round(sum(mx4) / 10000.0 / count(*), 4) AS avg_max
FROM per_row
GROUP BY label
ORDER BY label
"""


@register("array_ops_embeddings", ARRAY_OPS_ORACLE)
def array_ops_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings", columns=["label", "embedding"])
    per_row = emb.select(
        "label",
        F.size("embedding").alias("dim"),
        F.round(F.array_min("embedding").cast("double") * 10000)
        .cast("bigint")
        .alias("mn4"),
        F.round(F.array_max("embedding").cast("double") * 10000)
        .cast("bigint")
        .alias("mx4"),
    )
    return (
        per_row.groupBy("label")
        .agg(
            F.count("*").alias("n_vecs"),
            F.min("dim").alias("min_dim"),
            F.max("dim").alias("max_dim"),
            F.round(F.sum("mn4") / F.lit(10000.0) / F.count("*"), 4).alias("avg_min"),
            F.round(F.sum("mx4") / F.lit(10000.0) / F.count("*"), 4).alias("avg_max"),
        )
        .orderBy("label")
    )


# ---------------------------------------------------------------------------
# Dialect-shared SQL surface: ONE SQL string executed verbatim by BOTH
# engines — Spark runs it through spark.sql over register_views, DuckDB
# runs it as the oracle. Pins the engine's ANSI-SQL entry point (the
# register_views + spark.sql path users get), not just the DataFrame
# API, and proves the dialect subset genuinely overlaps.
# ---------------------------------------------------------------------------

SHARED_SQL = """
SELECT o_orderpriority,
       CAST(count(*) AS BIGINT) AS n_orders,
       round(sum(o_totalprice), 2) AS revenue,
       round(avg(o_totalprice), 2) AS avg_price,
       CAST(count(DISTINCT o_custkey) AS BIGINT) AS n_customers
FROM orders
WHERE o_orderstatus <> 'P'
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""


@register("sql_surface_shared_dialect", SHARED_SQL)
def sql_surface_shared_dialect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Runs the oracle SQL text itself via spark.sql — zero DataFrame
    code. Evidence that the registered-view SQL surface accepts the
    dialect-shared subset unchanged."""
    from insurance_helper_spark.sources.tables import register_views

    register_views(spark, sf_dir)
    return spark.sql(SHARED_SQL)


# ---------------------------------------------------------------------------
# sql_lateral_topn — correlated LATERAL subquery with ORDER BY + LIMIT,
# in the comma-LATERAL dialect BOTH engines parse verbatim: each
# customer's two most recent orders. Spark decorrelates the lateral
# into a ranked window join (the same plan topk_per_group hand-writes);
# the point of the row is that the LATERAL surface itself works and
# matches. Scale: decorrelation means one orderkey shuffle + window —
# no per-customer re-execution.
# ---------------------------------------------------------------------------

LATERAL_TOPN_SQL = """
SELECT c.c_custkey, o.o_orderkey, round(o.o_totalprice, 2) AS o_totalprice
FROM customer c, LATERAL (
  SELECT o_orderkey, o_totalprice
  FROM orders
  WHERE o_custkey = c.c_custkey
  ORDER BY o_orderdate DESC, o_orderkey DESC
  LIMIT 2
) AS o
ORDER BY c.c_custkey, o.o_orderkey
"""


@register("sql_lateral_topn", LATERAL_TOPN_SQL)
def sql_lateral_topn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dialect-shared correlated LATERAL: the SQL text IS the oracle."""
    from insurance_helper_spark.sources.tables import register_views

    register_views(spark, sf_dir)
    return spark.sql(LATERAL_TOPN_SQL)

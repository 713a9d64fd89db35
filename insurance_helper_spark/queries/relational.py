"""Relational query surface (SURVEY §2B: scans, joins, aggs, windows,
sorts, set ops, scalar functions) over the driver fixture tables.

Every query here has an exact DuckDB oracle. Conventions for hash
parity:
- identical column aliases both sides;
- float aggregates rounded both sides (double sum order differs);
- deterministic total tiebreaks wherever a rank/limit depends on order.

Scale notes are in each docstring: what broadcasts, what shuffles, and
why the plan survives 100×.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from insurance_helper_spark.functions import dates
from insurance_helper_spark.queries.catalog import register
from insurance_helper_spark.sources.tables import load_table


# ---------------------------------------------------------------------------
# Flagship (M0): scan → filter → join → agg → window rank → sort.
# Mirrors the reference's "per financial-year × insurer product counts with
# latest-launch rank" analytics shape (SURVEY §7 M0) on the fixture star
# schema: per order-year × nation revenue with top-5 rank per year.
# Scale: orders⋈customer is a shuffle hash join on o_custkey (both large,
# co-partitioned by the join key); nation (25 rows) broadcasts; the window
# repartitions by order_year only after aggregation has collapsed
# cardinality to years×nations — tiny. Survives 100× trivially.
# ---------------------------------------------------------------------------

FLAGSHIP_ORACLE = """
WITH base AS (
  SELECT CAST(year(o.o_orderdate) AS INT) AS order_year,
         n.n_name AS nation,
         count(*) AS n_orders,
         round(sum(o.o_totalprice), 2) AS revenue
  FROM orders o
  JOIN customer c ON o.o_custkey = c.c_custkey
  JOIN nation n ON c.c_nationkey = n.n_nationkey
  WHERE o.o_orderstatus <> 'F'
  GROUP BY 1, 2
)
SELECT order_year, nation, n_orders, revenue,
       rank() OVER (PARTITION BY order_year
                    ORDER BY revenue DESC, nation) AS revenue_rank
FROM base
QUALIFY revenue_rank <= 5
ORDER BY order_year, revenue_rank, nation
"""


@register("flagship", FLAGSHIP_ORACLE)
def flagship(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(
        spark, sf_dir, "orders",
        columns=["o_orderkey", "o_custkey", "o_orderdate", "o_totalprice", "o_orderstatus"],
    )
    customer = load_table(spark, sf_dir, "customer", columns=["c_custkey", "c_nationkey"])
    nation = load_table(spark, sf_dir, "nation", columns=["n_nationkey", "n_name"])

    base = (
        orders.filter(F.col("o_orderstatus") != "F")
        .join(customer, orders.o_custkey == customer.c_custkey)
        .join(F.broadcast(nation), customer.c_nationkey == nation.n_nationkey)
        .groupBy(
            F.year("o_orderdate").cast("int").alias("order_year"),
            F.col("n_name").alias("nation"),
        )
        .agg(
            F.count("*").alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("revenue"),
        )
    )
    w = Window.partitionBy("order_year").orderBy(F.desc("revenue"), F.asc("nation"))
    return (
        base.withColumn("revenue_rank", F.rank().over(w))
        .filter(F.col("revenue_rank") <= 5)
        .orderBy("order_year", "revenue_rank", "nation")
    )


# ---------------------------------------------------------------------------
# q1_pricing_summary — TPC-H Q1 shape: wide aggregation with map-side
# partial aggregation. Scale: single shuffle on the 6-value group key;
# partial aggs collapse ~all rows map-side, so the shuffle is tiny.
# ---------------------------------------------------------------------------

Q1_ORACLE = """
SELECT l_returnflag, l_linestatus,
       round(sum(l_quantity), 2)                         AS sum_qty,
       round(sum(l_extendedprice), 2)                    AS sum_base_price,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
       round(avg(l_quantity), 4)                         AS avg_qty,
       round(avg(l_extendedprice), 2)                    AS avg_price,
       count(*)                                          AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02'
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
"""


@register("q1_pricing_summary", Q1_ORACLE)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(
        spark, sf_dir, "lineitem",
        columns=["l_returnflag", "l_linestatus", "l_quantity", "l_extendedprice",
                 "l_discount", "l_shipdate"],
    )
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("sum_disc_price"),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 2).alias("avg_price"),
            F.count("*").alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


# ---------------------------------------------------------------------------
# q5_local_supplier — multi-way join across the star schema with a
# broadcast chain for the dims. Scale: lineitem⋈orders shuffles on
# orderkey (the two big tables); supplier/customer/nation/region
# broadcast; Catalyst reorders the dim filters below the big join.
# ---------------------------------------------------------------------------

Q5_ORACLE = """
SELECT n.n_name AS nation,
       round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue
FROM lineitem l
JOIN orders o   ON l.l_orderkey = o.o_orderkey
JOIN supplier s ON l.l_suppkey = s.s_suppkey
JOIN nation n   ON s.s_nationkey = n.n_nationkey
JOIN region r   ON n.n_regionkey = r.r_regionkey
WHERE r.r_name IN ('ASIA', 'EUROPE')
GROUP BY 1
ORDER BY revenue DESC, nation
"""


@register("q5_local_supplier", Q5_ORACLE)
def q5_local_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem",
                    columns=["l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"])
    orders = load_table(spark, sf_dir, "orders", columns=["o_orderkey"])
    supplier = load_table(spark, sf_dir, "supplier", columns=["s_suppkey", "s_nationkey"])
    nation = load_table(spark, sf_dir, "nation", columns=["n_nationkey", "n_regionkey", "n_name"])
    region = load_table(spark, sf_dir, "region", columns=["r_regionkey", "r_name"])

    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(supplier), li.l_suppkey == supplier.s_suppkey)
        .join(F.broadcast(nation), supplier.s_nationkey == nation.n_nationkey)
        .join(F.broadcast(region.filter(F.col("r_name").isin("ASIA", "EUROPE"))),
              nation.n_regionkey == region.r_regionkey)
        .groupBy(F.col("n_name").alias("nation"))
        .agg(F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue"))
        .orderBy(F.desc("revenue"), "nation")
    )


# ---------------------------------------------------------------------------
# filter_predicates — LIKE / RLIKE / IN / BETWEEN / null-safe predicates.
# Scale: all predicates push to the parquet scan (PushedFilters).
# ---------------------------------------------------------------------------

FILTER_ORACLE = """
SELECT p_partkey, p_name, p_brand, p_type, p_size
FROM part
WHERE p_type LIKE '%BRASS%'
  AND p_size IN (5, 10, 15, 20, 25, 30, 35, 40, 45, 50)
  AND p_retailprice BETWEEN 900 AND 2000
  AND p_name IS NOT NULL
  AND regexp_matches(p_name, '^[a-z]')
ORDER BY p_partkey
"""


@register("filter_predicates", FILTER_ORACLE)
def filter_predicates(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load_table(spark, sf_dir, "part")
    return (
        part.filter(F.col("p_type").like("%BRASS%"))
        .filter(F.col("p_size").isin(5, 10, 15, 20, 25, 30, 35, 40, 45, 50))
        .filter(F.col("p_retailprice").between(900, 2000))
        .filter(F.col("p_name").isNotNull())
        .filter(F.col("p_name").rlike("^[a-z]"))
        .select("p_partkey", "p_name", "p_brand", "p_type", "p_size")
        .orderBy("p_partkey")
    )


# ---------------------------------------------------------------------------
# J1/J2 generalized: semi and anti joins. The anti join IS the
# reference's incremental-delta core (delta_download.py:191).
# Scale: Spark plans these as broadcast/shuffled hash semi-joins; no
# row-multiplication, null-safe.
# ---------------------------------------------------------------------------

SEMI_ORACLE = """
SELECT c.c_custkey, c.c_name
FROM customer c
WHERE EXISTS (SELECT 1 FROM orders o
              WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 100000)
ORDER BY c.c_custkey
"""


@register("semi_join_active_customers", SEMI_ORACLE)
def semi_join_active_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = load_table(spark, sf_dir, "customer", columns=["c_custkey", "c_name"])
    orders = load_table(spark, sf_dir, "orders", columns=["o_custkey", "o_totalprice"])
    big = orders.filter(F.col("o_totalprice") > 100000)
    return (
        customer.join(big, customer.c_custkey == big.o_custkey, "left_semi")
        .orderBy("c_custkey")
    )


ANTI_ORACLE = """
SELECT c.c_custkey, c.c_name
FROM customer c
WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
ORDER BY c.c_custkey
"""


@register("anti_join_new_customers", ANTI_ORACLE)
def anti_join_new_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J2's anti-join semantics: rows in the snapshot with no match in
    the existing set (ref: delta_download.py:41-51,191)."""
    customer = load_table(spark, sf_dir, "customer", columns=["c_custkey", "c_name"])
    orders = load_table(spark, sf_dir, "orders", columns=["o_custkey"])
    return (
        customer.join(orders, customer.c_custkey == orders.o_custkey, "left_anti")
        .orderBy("c_custkey")
    )


# ---------------------------------------------------------------------------
# Outer joins: J3 result↔product correlation generalized (left join
# keeping unmatched, null handling).
# ---------------------------------------------------------------------------

LEFT_JOIN_ORACLE = """
SELECT c.c_custkey,
       coalesce(t.n_orders, 0)   AS n_orders,
       coalesce(t.spent, 0.0)    AS spent
FROM customer c
LEFT JOIN (
  SELECT o_custkey, count(*) AS n_orders, round(sum(o_totalprice), 2) AS spent
  FROM orders GROUP BY o_custkey
) t ON c.c_custkey = t.o_custkey
ORDER BY c.c_custkey
"""


@register("left_join_order_stats", LEFT_JOIN_ORACLE)
def left_join_order_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J3 generalized: correlate results back to their driving rows via a
    left join, preserving rows with no result (ref: cli.py:119-138)."""
    customer = load_table(spark, sf_dir, "customer", columns=["c_custkey"])
    orders = load_table(spark, sf_dir, "orders", columns=["o_custkey", "o_totalprice"])
    stats = orders.groupBy("o_custkey").agg(
        F.count("*").alias("n_orders"),
        F.round(F.sum("o_totalprice"), 2).alias("spent"),
    )
    return (
        customer.join(stats, customer.c_custkey == stats.o_custkey, "left")
        .select(
            "c_custkey",
            F.coalesce("n_orders", F.lit(0)).alias("n_orders"),
            F.coalesce("spent", F.lit(0.0)).alias("spent"),
        )
        .orderBy("c_custkey")
    )


# ---------------------------------------------------------------------------
# Grouping sets / rollup / cube.
# ---------------------------------------------------------------------------

ROLLUP_ORACLE = """
SELECT CAST(year(o_orderdate) AS INT) AS order_year,
       o_orderstatus AS status,
       count(*) AS n,
       round(sum(o_totalprice), 2) AS total
FROM orders
GROUP BY ROLLUP (order_year, status)
ORDER BY order_year NULLS FIRST, status NULLS FIRST
"""


@register("agg_rollup", ROLLUP_ORACLE)
def agg_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders",
                        columns=["o_orderdate", "o_orderstatus", "o_totalprice"])
    return (
        orders.select(
            F.year("o_orderdate").cast("int").alias("order_year"),
            F.col("o_orderstatus").alias("status"),
            "o_totalprice",
        )
        .rollup("order_year", "status")
        .agg(F.count("*").alias("n"), F.round(F.sum("o_totalprice"), 2).alias("total"))
        .orderBy(F.asc_nulls_first("order_year"), F.asc_nulls_first("status"))
    )


CUBE_ORACLE = """
SELECT l_returnflag, l_linestatus, count(*) AS n,
       round(sum(l_quantity), 2) AS qty
FROM lineitem
GROUP BY CUBE (l_returnflag, l_linestatus)
ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST
"""


@register("agg_cube", CUBE_ORACLE)
def agg_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE over (returnflag, linestatus): all four grouping sets with counts and quantity sums in one pass."""
    li = load_table(spark, sf_dir, "lineitem",
                    columns=["l_returnflag", "l_linestatus", "l_quantity"])
    return (
        li.cube("l_returnflag", "l_linestatus")
        .agg(F.count("*").alias("n"), F.round(F.sum("l_quantity"), 2).alias("qty"))
        .orderBy(F.asc_nulls_first("l_returnflag"), F.asc_nulls_first("l_linestatus"))
    )


DISTINCT_ORACLE = """
SELECT l_returnflag,
       count(DISTINCT l_partkey) AS n_parts,
       count(DISTINCT l_suppkey) AS n_suppliers,
       count(*) AS n_rows
FROM lineitem
GROUP BY l_returnflag
ORDER BY l_returnflag
"""


@register("agg_count_distinct", DISTINCT_ORACLE)
def agg_count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact multi-column COUNT(DISTINCT) per group — the two-phase expand-aggregate Catalyst plan."""
    li = load_table(spark, sf_dir, "lineitem",
                    columns=["l_returnflag", "l_partkey", "l_suppkey"])
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.countDistinct("l_partkey").alias("n_parts"),
            F.countDistinct("l_suppkey").alias("n_suppliers"),
            F.count("*").alias("n_rows"),
        )
        .orderBy("l_returnflag")
    )


# approx_count_distinct sketch values are engine-specific, so the oracle
# checks the BOUND, not the estimate: the Spark side emits the exact
# count plus a boolean |approx − exact| / exact < 0.05, and the oracle
# asserts that boolean is TRUE with the exact count from SQL. This
# converts the approximation into a hash-comparable value check (HLL++
# at rsd=0.01 is far inside 5%).
APPROX_DISTINCT_ORACLE = """
SELECT l_returnflag,
       CAST(count(DISTINCT l_partkey) AS BIGINT) AS n_exact,
       TRUE AS within_bounds
FROM lineitem
GROUP BY l_returnflag
ORDER BY l_returnflag
"""


@register("agg_approx_distinct_bounds", APPROX_DISTINCT_ORACLE)
def agg_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """approx_count_distinct (HLL++) with an oracle-checkable error
    bound. At 100 TB the approx path replaces exact distinct counts that
    would otherwise shuffle every key; the bound is the contract.

    The exact and approximate counts run as SEPARATE aggregations
    joined on the 3-row group key — never in one agg() with
    count(DISTINCT): Catalyst's two-phase distinct rewrite keys the
    FIRST aggregate by (group, distinct_key), so a co-resident
    imperative HLL becomes one ~100 KB sketch buffer PER DISTINCT PART
    KEY (measured 24 s vs <1 s at sf0.1; at corpus scale it is
    gigabytes of aggregation state for a 3-row answer)."""
    li = load_table(spark, sf_dir, "lineitem", columns=["l_returnflag", "l_partkey"])
    exact = li.groupBy("l_returnflag").agg(
        F.countDistinct("l_partkey").alias("n_exact")
    )
    approx = li.groupBy("l_returnflag").agg(
        F.approx_count_distinct("l_partkey", 0.01).alias("approx_parts")
    )
    return (
        exact.join(F.broadcast(approx), "l_returnflag")
        .select(
            "l_returnflag",
            "n_exact",
            (
                F.abs(F.col("approx_parts") - F.col("n_exact"))
                / F.col("n_exact")
                < 0.05
            ).alias("within_bounds"),
        )
        .orderBy("l_returnflag")
    )


# ---------------------------------------------------------------------------
# Windows: running sums, lag/lead, frames. Ordered (o_orderdate,
# o_orderkey) — a total order, so running double-sums accumulate in the
# same sequence in both engines.
# ---------------------------------------------------------------------------

WINDOW_ORACLE = """
SELECT o_custkey, o_orderkey,
       round(sum(o_totalprice) OVER w_run, 2)                 AS running_spend,
       round(o_totalprice - lag(o_totalprice, 1, 0.0) OVER w, 2) AS delta_prev,
       row_number() OVER w                                    AS order_seq
FROM orders
WINDOW
  w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey),
  w_run AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
ORDER BY o_custkey, order_seq
"""


@register("window_running_spend", WINDOW_ORACLE)
def window_running_spend(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders",
                        columns=["o_custkey", "o_orderkey", "o_orderdate", "o_totalprice"])
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    w_run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return (
        orders.select(
            "o_custkey",
            "o_orderkey",
            F.round(F.sum("o_totalprice").over(w_run), 2).alias("running_spend"),
            F.round(
                F.col("o_totalprice") - F.lag("o_totalprice", 1, 0.0).over(w), 2
            ).alias("delta_prev"),
            F.row_number().over(w).alias("order_seq"),
        )
        .orderBy("o_custkey", "order_seq")
    )


TOPK_ORACLE = """
SELECT o_orderpriority AS priority, o_orderkey, o_totalprice AS price, rk
FROM (
  SELECT o_orderpriority, o_orderkey, o_totalprice,
         row_number() OVER (PARTITION BY o_orderpriority
                            ORDER BY o_totalprice DESC, o_orderkey) AS rk
  FROM orders
)
WHERE rk <= 3
ORDER BY priority, rk
"""


@register("topk_per_group", TOPK_ORACLE)
def topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group top-k via window + filter. Scale: Spark pushes a
    per-partition partial top-k (WindowGroupLimit) before the shuffle,
    so the shuffle carries ≤k rows per group per mapper."""
    orders = load_table(spark, sf_dir, "orders",
                        columns=["o_orderpriority", "o_orderkey", "o_totalprice"])
    w = Window.partitionBy("o_orderpriority").orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
    return (
        orders.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 3)
        .select(
            F.col("o_orderpriority").alias("priority"),
            "o_orderkey",
            F.col("o_totalprice").alias("price"),
            "rk",
        )
        .orderBy("priority", "rk")
    )


# ---------------------------------------------------------------------------
# As-of (latest-version-per-key) join: Spark has no native as-of; the
# idiomatic pattern is window argmax. Mirrors "latest product version
# per UIN" from the reference's product tables.
# ---------------------------------------------------------------------------

ASOF_ORACLE = """
SELECT o_custkey, o_orderkey AS latest_orderkey,
       o_orderdate AS latest_orderdate, o_totalprice AS latest_price
FROM (
  SELECT o_custkey, o_orderkey, o_orderdate, o_totalprice,
         row_number() OVER (PARTITION BY o_custkey
                            ORDER BY o_orderdate DESC, o_orderkey DESC) AS rk
  FROM orders
)
WHERE rk = 1
ORDER BY o_custkey
"""


@register("asof_latest_per_key", ASOF_ORACLE)
def asof_latest_per_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders",
                        columns=["o_custkey", "o_orderkey", "o_orderdate", "o_totalprice"])
    w = Window.partitionBy("o_custkey").orderBy(F.desc("o_orderdate"), F.desc("o_orderkey"))
    return (
        orders.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") == 1)
        .select(
            "o_custkey",
            F.col("o_orderkey").alias("latest_orderkey"),
            F.col("o_orderdate").alias("latest_orderdate"),
            F.col("o_totalprice").alias("latest_price"),
        )
        .orderBy("o_custkey")
    )


# ---------------------------------------------------------------------------
# Range (non-equi) join: price-band bucketing via inequality join against
# a tiny in-memory dim. Scale: the band table broadcasts; the non-equi
# condition evaluates as BroadcastNestedLoopJoin over 5 rows — fine.
# ---------------------------------------------------------------------------

PRICE_BANDS = [
    (0.0, 50_000.0, "low"),
    (50_000.0, 150_000.0, "mid"),
    (150_000.0, 300_000.0, "high"),
    (300_000.0, 1e18, "very_high"),
]

_BANDS_SQL = " UNION ALL ".join(
    f"SELECT {lo} AS lo, {hi} AS hi, '{name}' AS band" for lo, hi, name in PRICE_BANDS
)

RANGE_JOIN_ORACLE = f"""
WITH bands AS ({_BANDS_SQL})
SELECT b.band, count(*) AS n, round(avg(o.o_totalprice), 2) AS avg_price
FROM orders o JOIN bands b
  ON o.o_totalprice >= b.lo AND o.o_totalprice < b.hi
GROUP BY b.band
ORDER BY b.band
"""


@register("range_join_price_bands", RANGE_JOIN_ORACLE)
def range_join_price_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Non-equi range join: order prices bucketed into broadcast price bands via BroadcastNestedLoopJoin over 5 rows."""
    orders = load_table(spark, sf_dir, "orders", columns=["o_totalprice"])
    bands = spark.createDataFrame(PRICE_BANDS, "lo double, hi double, band string")
    return (
        orders.join(
            F.broadcast(bands),
            (orders.o_totalprice >= bands.lo) & (orders.o_totalprice < bands.hi),
        )
        .groupBy("band")
        .agg(F.count("*").alias("n"), F.round(F.avg("o_totalprice"), 2).alias("avg_price"))
        .orderBy("band")
    )


# ---------------------------------------------------------------------------
# Set operations.
# ---------------------------------------------------------------------------

SETOPS_ORACLE = """
WITH open_c AS (SELECT DISTINCT o_custkey FROM orders WHERE o_orderstatus = 'O'),
     done_c AS (SELECT DISTINCT o_custkey FROM orders WHERE o_orderstatus = 'F'),
     pend_c AS (SELECT DISTINCT o_custkey FROM orders WHERE o_orderstatus = 'P')
SELECT 'open_and_done' AS segment, count(*) AS n
FROM (SELECT o_custkey FROM open_c INTERSECT SELECT o_custkey FROM done_c)
UNION ALL
SELECT 'open_not_done' AS segment, count(*) AS n
FROM (SELECT o_custkey FROM open_c EXCEPT SELECT o_custkey FROM done_c)
UNION ALL
SELECT 'any_status' AS segment, count(*) AS n
FROM (SELECT o_custkey FROM open_c UNION SELECT o_custkey FROM done_c
      UNION SELECT o_custkey FROM pend_c)
ORDER BY segment
"""


@register("set_ops_segments", SETOPS_ORACLE)
def set_ops_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders", columns=["o_custkey", "o_orderstatus"])

    def keys(status: str) -> DataFrame:
        return orders.filter(F.col("o_orderstatus") == status).select("o_custkey").distinct()

    open_c, done_c, pend_c = keys("O"), keys("F"), keys("P")
    rows = [
        ("open_and_done", open_c.intersect(done_c)),
        ("open_not_done", open_c.exceptAll(done_c)),
        ("any_status", open_c.union(done_c).union(pend_c).distinct()),
    ]
    out = None
    for name, df in rows:
        one = df.agg(F.count("*").alias("n")).select(F.lit(name).alias("segment"), "n")
        out = one if out is None else out.union(one)
    return out.orderBy("segment")


# ---------------------------------------------------------------------------
# Scalar string functions (the P1-P4/K1-K2 family applied to fixture
# strings) — all codegen'd expressions, zero UDFs.
# ---------------------------------------------------------------------------

STRING_ORACLE = """
SELECT p_partkey,
       upper(p_brand)                                   AS brand_uc,
       trim(regexp_replace(p_name, '\\s+', ' ', 'g'))   AS name_clean,
       substring(p_type, 1, 6)                          AS type_prefix,
       length(p_name)                                   AS name_len,
       concat_ws('|', p_brand, p_type)                  AS brand_type,
       regexp_extract(p_name, '^(\\w+)', 1)             AS first_word,
       levenshtein(p_brand, 'Brand#13')                 AS lev_to_b13,
       sha256(p_name)                                   AS name_sha
FROM part
ORDER BY p_partkey
"""


@register("string_functions", STRING_ORACLE)
def string_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load_table(spark, sf_dir, "part", columns=["p_partkey", "p_name", "p_brand", "p_type"])
    return (
        part.select(
            "p_partkey",
            F.upper("p_brand").alias("brand_uc"),
            F.trim(F.regexp_replace("p_name", r"\s+", " ")).alias("name_clean"),
            F.substring("p_type", 1, 6).alias("type_prefix"),
            F.length("p_name").alias("name_len"),
            F.concat_ws("|", "p_brand", "p_type").alias("brand_type"),
            F.regexp_extract("p_name", r"^(\w+)", 1).alias("first_word"),
            F.levenshtein("p_brand", F.lit("Brand#13")).alias("lev_to_b13"),
            F.sha2("p_name", 256).alias("name_sha"),
        )
        .orderBy("p_partkey")
    )


# ---------------------------------------------------------------------------
# Date/time functions incl. the dirty-date parser (M1) and FY derivation.
# The dirty strings are synthesized deterministically from o_orderdate in
# BOTH engines, then round-tripped through the multi-format parser.
# ---------------------------------------------------------------------------

DATE_ORACLE = """
WITH dirty AS (
  SELECT o_orderkey,
         o_orderdate,
         CASE o_orderkey % 4
           WHEN 0 THEN strftime(o_orderdate, '%Y-%m-%d')
           WHEN 1 THEN strftime(o_orderdate, '%d-%m-%Y')
           WHEN 2 THEN strftime(o_orderdate, '%Y-%m-%d') || ' ' || strftime(o_orderdate, '%d-%m-%Y')
           ELSE 'not a date'
         END AS raw_date
  FROM orders
)
SELECT o_orderkey, raw_date,
       CAST(CAST(coalesce(
         try_strptime(split_part(trim(raw_date), ' ', 1), '%Y-%m-%d'),
         try_strptime(split_part(trim(raw_date), ' ', 1), '%d-%m-%Y')
       ) AS DATE) AS VARCHAR)                            AS parsed_date,
       CAST(year(o_orderdate) AS INT)                    AS order_year,
       CAST(month(o_orderdate) AS INT)                   AS order_month,
       CAST(date_diff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE)) AS BIGINT) AS days_since_epoch_start,
       CASE WHEN month(o_orderdate) >= 4
            THEN 'FY ' || CAST(year(o_orderdate) AS VARCHAR) || '-' ||
                 lpad(CAST((year(o_orderdate) + 1) % 100 AS VARCHAR), 2, '0')
            ELSE 'FY ' || CAST(year(o_orderdate) - 1 AS VARCHAR) || '-' ||
                 lpad(CAST(year(o_orderdate) % 100 AS VARCHAR), 2, '0')
       END                                               AS fy_label
FROM dirty
ORDER BY o_orderkey
"""


@register("date_functions_dirty_parse", DATE_ORACLE)
def date_functions_dirty_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sort FIRST on the narrow base, render AFTER (r13): the
    presentation orderBy previously range-shuffled the fully-rendered
    rows (~60 B of strings each — 12 s warm at sf1, 7.1× the sf0.1
    wall); sorting the 16-byte (key, date) base and projecting the
    rendered columns above the sort (projects preserve ordering)
    shuffles 4× fewer bytes: 12 s → 1.7 s warm at sf1. The parse
    trials are also shape-gated per format inside parse_dirty_date, so
    no row pays a failed DateTimeFormatter exception."""
    orders = load_table(spark, sf_dir, "orders", columns=["o_orderkey", "o_orderdate"])
    raw = (
        F.when(F.col("o_orderkey") % 4 == 0, F.date_format("o_orderdate", "yyyy-MM-dd"))
        .when(F.col("o_orderkey") % 4 == 1, F.date_format("o_orderdate", "dd-MM-yyyy"))
        .when(
            F.col("o_orderkey") % 4 == 2,
            F.concat_ws(" ", F.date_format("o_orderdate", "yyyy-MM-dd"),
                        F.date_format("o_orderdate", "dd-MM-yyyy")),
        )
        .otherwise(F.lit("not a date"))
    )
    return (
        orders.orderBy("o_orderkey")
        .withColumn("raw_date", raw)
        .select(
            "o_orderkey",
            "raw_date",
            dates.parse_dirty_date(F.col("raw_date"), ("yyyy-MM-dd", "dd-MM-yyyy"))
            .cast("string").alias("parsed_date"),
            F.year("o_orderdate").cast("int").alias("order_year"),
            F.month("o_orderdate").cast("int").alias("order_month"),
            F.datediff(F.col("o_orderdate"), F.lit("1995-01-01").cast("date"))
            .cast("bigint").alias("days_since_epoch_start"),
            dates.fy_label_from_date(F.col("o_orderdate")).alias("fy_label"),
        )
    )


# ---------------------------------------------------------------------------
# JSON extraction over events.props.
# ---------------------------------------------------------------------------

JSON_ORACLE = """
SELECT event_type,
       count(*) AS n,
       round(avg(CAST(json_extract_string(props, '$.k') AS INT)), 4) AS avg_k,
       max(CAST(json_extract_string(props, '$.k') AS INT))           AS max_k
FROM events
GROUP BY event_type
ORDER BY event_type
"""


@register("json_extract_events", JSON_ORACLE)
def json_extract_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events", columns=["event_type", "props"])
    k = F.get_json_object("props", "$.k").cast("int")
    return (
        events.groupBy("event_type")
        .agg(
            F.count("*").alias("n"),
            F.round(F.avg(k), 4).alias("avg_k"),
            F.max(k).alias("max_k"),
        )
        .orderBy("event_type")
    )


# ---------------------------------------------------------------------------
# Array ops: split → explode → aggregate (S6's unnest analog).
# ---------------------------------------------------------------------------

EXPLODE_ORACLE = """
SELECT token, count(*) AS n
FROM (
  SELECT unnest(string_split(text, ' ')) AS token
  FROM documents
)
WHERE token <> ''
GROUP BY token
HAVING count(*) >= 5
ORDER BY n DESC, token
"""


@register("explode_token_counts", EXPLODE_ORACLE)
def explode_token_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S6 unnest analog: array explode → group count with HAVING.
    Scale: explode multiplies rows ~70× before the shuffle; partial
    aggregation collapses them map-side, so the shuffle stays small."""
    docs = load_table(spark, sf_dir, "documents", columns=["text"])
    return (
        docs.select(F.explode(F.split("text", " ")).alias("token"))
        .filter(F.col("token") != "")
        .groupBy("token")
        .agg(F.count("*").alias("n"))
        .filter(F.col("n") >= 5)
        .orderBy(F.desc("n"), "token")
    )

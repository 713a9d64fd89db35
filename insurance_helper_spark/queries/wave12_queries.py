"""Round-12 operator wave: schema inference + enforcement over a
bronze all-string relation — the reference's Stage-2 "Schema Builder"
declaration (/root/reference/README.md:91-101) made oracle-checkable.

The bronze twin is constructed from the typed orders fixture itself
(every column cast/formatted to strings with IDENTICAL cross-engine
renderings: BIGINT → decimal string, DOUBLE → exact round(·100)
cents re-formatted '%d.%02d', DATE →
dd-MM-yyyy so the dirty-date trial parser is genuinely exercised, plus
deterministic dirt), so the promotion decisions AND the silver
round-trip are value-pinned against DuckDB:

- ``schema_infer_promotion_census`` — the per-column promotion report
  (sources/schema_infer.infer_report): parse-success counts per
  candidate type and the integer-exact threshold decision. Two dirt
  rates bracket the 99.5% threshold: 1-in-200 'N/A' promotes AT the
  boundary, 1-in-20 stays string.
- ``schema_infer_roundtrip`` — enforcement audit: apply the inferred
  schema (NULL-on-failure casts) and count, per column, cast-nulls and
  value mismatches against the original typed column. Promoted columns
  must round-trip with zero mismatches; cast-null counts equal the
  planted dirt exactly.

House rules: identical aliases both engines; doubles compared in exact
round(·100) BIGINT cents; the threshold decision is 1000·ok ≥ t·nonnull
integer arithmetic. Scale: both queries are ONE fused aggregation scan
(map-side conditional sums) + a |cols|-row projection; nothing shuffles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from insurance_helper_spark.queries.catalog import register
from insurance_helper_spark.sources import schema_infer as SI
from insurance_helper_spark.sources.tables import load_table

# ---------------------------------------------------------------------------
# Shared bronze twin: typed orders -> all-string relation, rendered
# identically by Spark and DuckDB (see module docstring), with
# deterministic dirt bracketing the promotion threshold.
# ---------------------------------------------------------------------------

_BRONZE_SQL = """
bronze AS (
  SELECT CAST(o_orderkey AS VARCHAR) AS okey_s,
         CASE WHEN o_orderkey % 200 = 0 THEN 'N/A'
              ELSE CAST(o_custkey AS VARCHAR) END AS cust_soft,
         CASE WHEN o_orderkey % 20 = 0 THEN 'N/A'
              ELSE CAST(o_custkey AS VARCHAR) END AS cust_hard,
         printf('%d.%02d', CAST(round(o_totalprice * 100) AS BIGINT) // 100,
                CAST(round(o_totalprice * 100) AS BIGINT) % 100) AS price_s,
         strftime(CAST(o_orderdate AS DATE), '%d-%m-%Y') AS date_s,
         o_orderpriority AS prio_s,
         CASE WHEN o_orderkey % 2 = 0 THEN 'true' ELSE 'false' END AS flag_s
  FROM orders
)
"""

_BRONZE_COLS = ("okey_s", "cust_soft", "cust_hard", "price_s", "date_s",
                "prio_s", "flag_s")

# DuckDB mirrors of sources/schema_infer.parse_ok (same regexes; same
# dirty-date trial order on the leading whitespace token).
_OK_BIGINT = r"regexp_matches({c}, '^[+-]?\d{{1,18}}$')"
_OK_DOUBLE = r"regexp_matches({c}, '^[+-]?\d+(\.\d+)?([eE][+-]?\d+)?$')"
# The shape gate mirrors schema_infer._DATE_SHAPE_RE — both engines
# gate the trial parse identically, so the census and the enforcement
# cast are definitionally consistent (ADVICE r12), not merely
# coincident on fixture data.
_DATE_SHAPE_SQL = (
    "regexp_matches(regexp_extract(trim({c}), '^\\S+'),"
    " '^\\d{{1,4}}[-/][0-9A-Za-z]{{1,3}}[-/]\\d{{1,4}}$')"
)
_OK_DATE = (
    "(" + _DATE_SHAPE_SQL + " AND "
    "coalesce(try_strptime(regexp_extract(trim({c}), '^\\S+'), '%Y-%m-%d'),"
    " try_strptime(regexp_extract(trim({c}), '^\\S+'), '%d-%m-%Y'),"
    " try_strptime(regexp_extract(trim({c}), '^\\S+'), '%d/%m/%Y'),"
    " try_strptime(regexp_extract(trim({c}), '^\\S+'), '%Y/%m/%d'),"
    " try_strptime(regexp_extract(trim({c}), '^\\S+'), '%d-%b-%Y')) IS NOT NULL)"
)
_OK_BOOL = "lower({c}) IN ('true', 'false')"


def _census_col_sql(c: str, t_permille: int = 995) -> str:
    okb = _OK_BIGINT.format(c=c)
    okd = _OK_DOUBLE.format(c=c)
    okdt = _OK_DATE.format(c=c)
    okbo = _OK_BOOL.format(c=c)
    return f"""
SELECT '{c}' AS col_name,
       CAST(count(*) AS BIGINT) AS n_rows,
       CAST(count({c}) AS BIGINT) AS n_nonnull,
       CAST(sum(CASE WHEN {c} IS NOT NULL AND {okb} THEN 1 ELSE 0 END) AS BIGINT) AS ok_bigint,
       CAST(sum(CASE WHEN {c} IS NOT NULL AND {okd} THEN 1 ELSE 0 END) AS BIGINT) AS ok_double,
       CAST(sum(CASE WHEN {c} IS NOT NULL AND {okdt} THEN 1 ELSE 0 END) AS BIGINT) AS ok_date,
       CAST(sum(CASE WHEN {c} IS NOT NULL AND {okbo} THEN 1 ELSE 0 END) AS BIGINT) AS ok_boolean,
       CASE WHEN 1000 * sum(CASE WHEN {c} IS NOT NULL AND {okb} THEN 1 ELSE 0 END)
                 >= {t_permille} * count({c}) AND count({c}) > 0 THEN 'bigint'
            WHEN 1000 * sum(CASE WHEN {c} IS NOT NULL AND {okd} THEN 1 ELSE 0 END)
                 >= {t_permille} * count({c}) AND count({c}) > 0 THEN 'double'
            WHEN 1000 * sum(CASE WHEN {c} IS NOT NULL AND {okdt} THEN 1 ELSE 0 END)
                 >= {t_permille} * count({c}) AND count({c}) > 0 THEN 'date'
            WHEN 1000 * sum(CASE WHEN {c} IS NOT NULL AND {okbo} THEN 1 ELSE 0 END)
                 >= {t_permille} * count({c}) AND count({c}) > 0 THEN 'boolean'
            ELSE 'string' END AS inferred_type
FROM bronze"""


CENSUS_ORACLE = (
    "WITH " + _BRONZE_SQL + ",\nc AS (" +
    "\nUNION ALL".join(_census_col_sql(c) for c in _BRONZE_COLS) + ")\n" +
    "SELECT col_name, n_rows, n_nonnull, ok_bigint, ok_double, ok_date,"
    " ok_boolean, inferred_type, inferred_type <> 'string' AS promoted\n"
    "FROM c ORDER BY col_name"
)


def _bronze(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(
        spark, sf_dir, "orders",
        columns=["o_orderkey", "o_custkey", "o_totalprice", "o_orderdate",
                 "o_orderpriority"],
    )
    na = F.lit("N/A")
    return orders.select(
        F.col("o_orderkey").cast("string").alias("okey_s"),
        F.when(F.col("o_orderkey") % 200 == 0, na)
        .otherwise(F.col("o_custkey").cast("string"))
        .alias("cust_soft"),
        F.when(F.col("o_orderkey") % 20 == 0, na)
        .otherwise(F.col("o_custkey").cast("string"))
        .alias("cust_hard"),
        F.format_string(
            "%d.%02d",
            F.expr("CAST(round(o_totalprice * 100) AS BIGINT) div 100"),
            F.expr("CAST(round(o_totalprice * 100) AS BIGINT) % 100"),
        ).alias("price_s"),
        F.date_format(F.col("o_orderdate").cast("date"), "dd-MM-yyyy").alias("date_s"),
        F.col("o_orderpriority").alias("prio_s"),
        F.when(F.col("o_orderkey") % 2 == 0, F.lit("true"))
        .otherwise(F.lit("false"))
        .alias("flag_s"),
    )


@register("schema_infer_promotion_census", CENSUS_ORACLE)
def schema_infer_promotion_census(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-column type-promotion report over the bronze orders twin:
    parse-success counts per candidate type and the integer-exact
    99.5%-threshold decision (sources/schema_infer.infer_report)."""
    rep = SI.infer_report(_bronze(spark, sf_dir))
    return rep.select(
        F.col("column").alias("col_name"),
        "n_rows", "n_nonnull", "ok_bigint", "ok_double", "ok_date",
        "ok_boolean", "inferred_type", "promoted",
    ).orderBy("col_name")


# ---------------------------------------------------------------------------
# schema_infer_roundtrip — enforcement audit: apply the inferred types
# and count cast-nulls + value mismatches vs the original typed orders
# columns. The inferred mapping is re-derived in-query (the report is a
# 7-row relation; its collect is the sanctioned k-row driver read).
# ---------------------------------------------------------------------------

ROUNDTRIP_ORACLE = (
    "WITH " + _BRONZE_SQL + """,
typed AS (
  SELECT o_orderkey,
         CAST(o_orderkey AS VARCHAR) AS okey_s,
         CASE WHEN o_orderkey % 200 = 0 THEN 'N/A'
              ELSE CAST(o_custkey AS VARCHAR) END AS cust_soft,
         printf('%d.%02d', CAST(round(o_totalprice * 100) AS BIGINT) // 100,
                CAST(round(o_totalprice * 100) AS BIGINT) % 100) AS price_s,
         strftime(CAST(o_orderdate AS DATE), '%d-%m-%Y') AS date_s,
         o_custkey, o_totalprice, CAST(o_orderdate AS DATE) AS odate,
         o_orderkey % 2 = 0 AS oflag
  FROM orders
),
parsed AS (
  SELECT o_orderkey,
         CASE WHEN regexp_matches(okey_s, '^[+-]?\\d{1,18}$')
              THEN CAST(okey_s AS BIGINT) END AS p_okey,
         CASE WHEN regexp_matches(cust_soft, '^[+-]?\\d{1,18}$')
              THEN CAST(cust_soft AS BIGINT) END AS p_cust,
         CASE WHEN regexp_matches(price_s, '^[+-]?\\d+(\\.\\d+)?([eE][+-]?\\d+)?$')
              THEN CAST(price_s AS DOUBLE) END AS p_price,
         CASE WHEN regexp_matches(regexp_extract(trim(date_s), '^\\S+'),
                                  '^\\d{1,4}[-/][0-9A-Za-z]{1,3}[-/]\\d{1,4}$')
              THEN CAST(coalesce(try_strptime(date_s, '%Y-%m-%d'),
                       try_strptime(date_s, '%d-%m-%Y'),
                       try_strptime(date_s, '%d/%m/%Y'),
                       try_strptime(date_s, '%Y/%m/%d'),
                       try_strptime(date_s, '%d-%b-%Y')) AS DATE) END AS p_date,
         o_custkey, o_totalprice, odate, oflag
  FROM typed
),
audit AS (
  SELECT 'okey_s' AS col_name, CAST(count(*) AS BIGINT) AS n_rows,
         CAST(sum(CASE WHEN p_okey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_cast_null,
         CAST(sum(CASE WHEN p_okey IS NOT NULL AND p_okey <> o_orderkey
                       THEN 1 ELSE 0 END) AS BIGINT) AS n_mismatch
  FROM parsed
  UNION ALL
  SELECT 'cust_soft', CAST(count(*) AS BIGINT),
         CAST(sum(CASE WHEN p_cust IS NULL THEN 1 ELSE 0 END) AS BIGINT),
         CAST(sum(CASE WHEN p_cust IS NOT NULL AND p_cust <> o_custkey
                       THEN 1 ELSE 0 END) AS BIGINT)
  FROM parsed
  UNION ALL
  SELECT 'price_s', CAST(count(*) AS BIGINT),
         CAST(sum(CASE WHEN p_price IS NULL THEN 1 ELSE 0 END) AS BIGINT),
         CAST(sum(CASE WHEN p_price IS NOT NULL
                       AND CAST(round(p_price * 100) AS BIGINT)
                           <> CAST(round(o_totalprice * 100) AS BIGINT)
                       THEN 1 ELSE 0 END) AS BIGINT)
  FROM parsed
  UNION ALL
  SELECT 'date_s', CAST(count(*) AS BIGINT),
         CAST(sum(CASE WHEN p_date IS NULL THEN 1 ELSE 0 END) AS BIGINT),
         CAST(sum(CASE WHEN p_date IS NOT NULL AND p_date <> odate
                       THEN 1 ELSE 0 END) AS BIGINT)
  FROM parsed
)
SELECT col_name, n_rows, n_cast_null, n_mismatch FROM audit ORDER BY col_name"""
)


@register("schema_infer_roundtrip", ROUNDTRIP_ORACLE)
def schema_infer_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Silver round-trip audit: NULL-on-failure casts of the bronze
    columns compared against the original typed values — promoted
    columns must show zero mismatches and exactly the planted dirt as
    cast-nulls (doubles compared in exact round(·100) cents)."""
    orders = load_table(
        spark, sf_dir, "orders",
        columns=["o_orderkey", "o_custkey", "o_totalprice", "o_orderdate"],
    )
    # bronze is a projection of orders — recombine by re-deriving,
    # not joining (both sides are the same scan; one fused projection)
    w = orders.select(
        "o_orderkey", "o_custkey", "o_totalprice",
        F.col("o_orderdate").cast("date").alias("odate"),
        SI.cast_as(F.col("o_orderkey").cast("string"), "bigint").alias("p_okey"),
        SI.cast_as(
            F.when(F.col("o_orderkey") % 200 == 0, F.lit("N/A"))
            .otherwise(F.col("o_custkey").cast("string")),
            "bigint",
        ).alias("p_cust"),
        SI.cast_as(
            F.format_string(
                "%d.%02d",
                F.expr("CAST(round(o_totalprice * 100) AS BIGINT) div 100"),
                F.expr("CAST(round(o_totalprice * 100) AS BIGINT) % 100"),
            ),
            "double",
        ).alias("p_price"),
        SI.cast_as(
            F.date_format(F.col("o_orderdate").cast("date"), "dd-MM-yyyy"), "date"
        ).alias("p_date"),
    )
    cents = lambda c: F.round(c * 100).cast("long")  # noqa: E731
    audits = [
        ("okey_s", F.col("p_okey"), F.col("p_okey") != F.col("o_orderkey")),
        ("cust_soft", F.col("p_cust"), F.col("p_cust") != F.col("o_custkey")),
        (
            "price_s",
            F.col("p_price"),
            cents(F.col("p_price")) != cents(F.col("o_totalprice")),
        ),
        ("date_s", F.col("p_date"), F.col("p_date") != F.col("odate")),
    ]
    aggs = []
    for name, parsed, neq in audits:
        aggs.append(F.count("*").cast("long").alias(f"{name}__rows"))
        aggs.append(
            F.sum(F.when(parsed.isNull(), 1).otherwise(0))
            .cast("long")
            .alias(f"{name}__null")
        )
        aggs.append(
            F.sum(F.when(parsed.isNotNull() & neq, 1).otherwise(0))
            .cast("long")
            .alias(f"{name}__mis")
        )
    one = w.agg(*aggs)
    stack = ", ".join(
        f"'{n}', `{n}__rows`, `{n}__null`, `{n}__mis`" for n, _, _ in audits
    )
    return (
        one.select(
            F.expr(
                f"stack({len(audits)}, {stack})"
                " AS (col_name, n_rows, n_cast_null, n_mismatch)"
            )
        )
        .orderBy("col_name")
    )

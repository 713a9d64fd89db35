"""Training-corpus preparation operators: document chunking into
overlapping token windows (the step between cleaning and tokenization
in an LLM data pipeline), unpivot (wide→long reshaping), and
deterministic per-group systematic sampling.

All fully SQL-expressible → value-hash-checked by the driver.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from insurance_helper_spark.functions import text as T
from insurance_helper_spark.queries.catalog import register
from insurance_helper_spark.sources.tables import load_table

# Chunk geometry: 8-token windows, stride 6 (2-token overlap) — small
# numbers so the sf0.01 fixture (≤100-token docs) produces multi-chunk
# documents worth checking.
CHUNK_TOKENS = 8
CHUNK_STRIDE = 6

# DuckDB mirror of functions.text.tokens (ASCII corpus — the fixture
# text is ASCII; the Spark side's \p{L}\p{N} classes agree on it).
_TOKS = "list_filter(string_split(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g')), ' '), t -> t <> '')"

CHUNK_ORACLE = f"""
WITH toked AS (
    SELECT doc_id, {_TOKS} AS toks FROM documents WHERE doc_id < 500
), starts AS (
    SELECT doc_id, toks,
           unnest(range(1, greatest(len(toks), 1) + 1, {CHUNK_STRIDE})) AS start
    FROM toked
)
SELECT doc_id,
       CAST((start - 1) / {CHUNK_STRIDE} AS BIGINT) AS chunk_id,
       array_to_string(toks[start : start + {CHUNK_TOKENS} - 1], ' ') AS chunk_text,
       len(toks[start : start + {CHUNK_TOKENS} - 1]) AS n_chunk_tokens
FROM starts
ORDER BY doc_id, chunk_id
"""


@register("chunk_documents", CHUNK_ORACLE)
def chunk_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Overlapping token-window chunking via sequence→explode→slice —
    all codegen'd built-ins (sequence/slice are not lambda HOFs, so the
    interpreted-lambda pitfall doesn't apply). Scale: embarrassingly
    parallel, zero shuffle before the final presentation sort; the
    token array is computed per row and sliced in place — no
    token-level explode, so the shuffle-free pass holds at any corpus
    size."""
    docs = load_table(spark, sf_dir, "documents", columns=["doc_id", "text"]).filter(
        F.col("doc_id") < 500
    )
    toked = docs.select("doc_id", T.tokens(F.col("text")).alias("toks"))
    starts = toked.select(
        "doc_id",
        "toks",
        F.explode(
            F.sequence(F.lit(1), F.greatest(F.size("toks"), F.lit(1)), F.lit(CHUNK_STRIDE))
        ).alias("start"),
    )
    chunk = F.slice(F.col("toks"), F.col("start"), CHUNK_TOKENS)
    return (
        starts.select(
            "doc_id",
            ((F.col("start") - 1) / CHUNK_STRIDE).cast("bigint").alias("chunk_id"),
            F.concat_ws(" ", chunk).alias("chunk_text"),
            F.size(chunk).alias("n_chunk_tokens"),
        )
        .orderBy("doc_id", "chunk_id")
    )


UNPIVOT_ORACLE = """
WITH per_order AS (
    SELECT l_orderkey,
           round(sum(l_quantity), 2)      AS total_qty,
           round(sum(l_extendedprice), 2) AS total_price,
           round(sum(l_tax), 4)           AS total_tax
    FROM lineitem
    WHERE l_orderkey <= 200
    GROUP BY l_orderkey
)
SELECT l_orderkey, 'total_qty' AS metric, total_qty AS amount FROM per_order
UNION ALL
SELECT l_orderkey, 'total_price', total_price FROM per_order
UNION ALL
SELECT l_orderkey, 'total_tax', total_tax FROM per_order
ORDER BY l_orderkey, metric
"""


@register("unpivot_order_metrics", UNPIVOT_ORACLE)
def unpivot_order_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wide→long reshape with the native unpivot operator (Spark emits
    an Expand node — each input row fans out to one row per metric in
    the same stage, no shuffle beyond the feeding aggregate)."""
    li = load_table(
        spark, sf_dir, "lineitem",
        columns=["l_orderkey", "l_quantity", "l_extendedprice", "l_tax"],
    ).filter(F.col("l_orderkey") <= 200)
    per_order = li.groupBy("l_orderkey").agg(
        F.round(F.sum("l_quantity"), 2).alias("total_qty"),
        F.round(F.sum("l_extendedprice"), 2).alias("total_price"),
        F.round(F.sum("l_tax"), 4).alias("total_tax"),
    )
    return per_order.unpivot(
        ids=["l_orderkey"],
        values=["total_qty", "total_price", "total_tax"],
        variableColumnName="metric",
        valueColumnName="amount",
    ).orderBy("l_orderkey", "metric")


SAMPLE_ORACLE = """
WITH numbered AS (
    SELECT c_nationkey, c_custkey, round(c_acctbal, 2) AS acctbal,
           row_number() OVER (PARTITION BY c_nationkey
                              ORDER BY c_acctbal DESC, c_custkey) AS rn
    FROM customer
)
SELECT c_nationkey, c_custkey, acctbal, rn
FROM numbered
WHERE rn % 10 = 1
ORDER BY c_nationkey, rn
"""


@register("sample_systematic_per_group", SAMPLE_ORACLE)
def sample_systematic_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 1-in-10 systematic sample per group (every 10th
    customer in balance order). Unlike TABLESAMPLE/df.sample this is
    reproducible across engines and runs — the property a training-data
    pipeline needs for auditable subsampling. Scale: one shuffle on the
    group key; WindowGroupLimit-style early pruning does not apply, but
    the filter is evaluated streaming per partition — no buffering."""
    cust = load_table(
        spark, sf_dir, "customer", columns=["c_custkey", "c_nationkey", "c_acctbal"]
    )
    w = Window.partitionBy("c_nationkey").orderBy(F.desc("c_acctbal"), "c_custkey")
    return (
        cust.select(
            "c_nationkey",
            "c_custkey",
            F.round("c_acctbal", 2).alias("acctbal"),
            F.row_number().over(w).alias("rn"),
        )
        .filter(F.col("rn") % 10 == 1)
        .orderBy("c_nationkey", "rn")
    )

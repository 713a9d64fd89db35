"""Text-analysis query registrations (SURVEY §2B: language-ID, quality
scoring, token counting, fingerprinting, TF-IDF) over ``documents``.

All pure column expressions; every query here carries a full DuckDB
oracle that re-implements the same arithmetic, so the semantics are
pinned, not just the row counts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from insurance_helper_spark.functions import text as T
from insurance_helper_spark.queries.catalog import register
from insurance_helper_spark.sources.tables import load_table

# DuckDB fragment: normalized token list of ``text`` (ASCII fixture corpus,
# identical to the Spark normalizer for these inputs).
_TOKS = "string_split(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g')), ' ')"

TEXT_STATS_ORACLE = f"""
WITH t AS (
  SELECT doc_id, text,
         CASE WHEN trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g')) = ''
              THEN [] ELSE {_TOKS} END AS toks
  FROM documents
)
SELECT doc_id,
       CAST(len(toks) AS INT)                           AS n_tokens,
       CAST(length(text) AS INT)                        AS n_chars,
       round(CASE WHEN length(text) > 0
             THEN length(regexp_replace(text, '[a-zA-Z0-9\\s]', '', 'g')) * 1.0 / length(text)
             ELSE 0.0 END, 4)                           AS punct_ratio,
       round(CASE WHEN len(toks) > 0
             THEN list_sum(list_transform(toks, x -> length(x))) * 1.0 / len(toks)
             ELSE 0.0 END, 4)                           AS mean_word_len
FROM t
ORDER BY doc_id
"""


@register("text_stats", TEXT_STATS_ORACLE)
def text_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc metrics as composed per-row expressions.

    Deliberately NOT a posexplode+aggregate single-pass: the Generate
    fuses downstream projections per OUTPUT row, so any per-doc regex
    (punctuation, script detection) re-evaluates once per TOKEN there —
    measured 5-9× slower than this shuffle-free linear-CPU form, which
    also keeps the whole computation embarrassingly parallel at 100 TB.
    """
    docs = load_table(spark, sf_dir, "documents", columns=["doc_id", "text"])
    return docs.select(
        "doc_id",
        T.token_count(F.col("text")).cast("int").alias("n_tokens"),
        T.char_count(F.col("text")).cast("int").alias("n_chars"),
        F.round(T.punct_ratio(F.col("text")), 4).alias("punct_ratio"),
        F.round(T.mean_word_length(F.col("text")), 4).alias("mean_word_len"),
    ).orderBy("doc_id")


# ---------------------------------------------------------------------------
# Language-ID + quality score, aggregated per (detected_lang, source).
# ---------------------------------------------------------------------------

_SW_LIST = "', '".join(T.EN_STOPWORDS)

LANG_QUALITY_ORACLE = f"""
WITH t AS (
  SELECT doc_id, source, text,
         CASE WHEN trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g')) = ''
              THEN [] ELSE {_TOKS} END AS toks
  FROM documents
),
feat AS (
  SELECT doc_id, source,
         CASE WHEN len(toks) > 0
              THEN len(list_filter(toks, x -> list_contains(['{_SW_LIST}'], x))) * 1.0 / len(toks)
              ELSE 0.0 END AS sw_ratio,
         CASE WHEN length(text) > 0
              THEN length(regexp_replace(text, '[a-zA-Z0-9\\s]', '', 'g')) * 1.0 / length(text)
              ELSE 0.0 END AS p_ratio,
         len(toks) AS n_tok,
         regexp_matches(text, '[ऀ-ॿ]') AS has_deva,
         regexp_matches(text, '[一-鿿]') AS has_cjk,
         regexp_matches(text, '[؀-ۿ]') AS has_arab,
         regexp_matches(text, '[Ѐ-ӿ]') AS has_cyr
  FROM t
),
scored AS (
  SELECT source,
         CASE WHEN has_deva THEN 'hi' WHEN has_cjk THEN 'zh'
              WHEN has_arab THEN 'ar' WHEN has_cyr THEN 'ru'
              WHEN sw_ratio >= 0.08 THEN 'en' ELSE 'unknown' END AS detected_lang,
         round((least(n_tok / 50.0, 1.0)
              + (1.0 - least(p_ratio * 4.0, 1.0))
              + (1.0 - least(abs(sw_ratio - 0.4) * 2.0, 1.0))) / 3.0, 4) AS quality
  FROM feat
)
SELECT detected_lang, source, count(*) AS n_docs,
       -- integer-sum the 4-decimal qualities so the average is exact and
       -- order-insensitive (fp avg() differs in the last ulp by sum order)
       round(sum(CAST(round(quality * 10000) AS BIGINT)) / 10000.0 / count(*), 4) AS avg_quality
FROM scored
GROUP BY detected_lang, source
ORDER BY detected_lang, source
"""


@register("text_lang_quality", LANG_QUALITY_ORACLE)
def text_lang_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents", columns=["doc_id", "source", "text"])
    scored = docs.select(
        "source",
        T.lang_id(F.col("text")).alias("detected_lang"),
        T.quality_score(F.col("text")).alias("quality"),
    )
    return (
        scored.groupBy("detected_lang", "source")
        .agg(
            F.count("*").alias("n_docs"),
            # exact integer sum of the 4-decimal qualities → the average
            # is order-insensitive (a double avg() flips the 4th decimal
            # depending on partial-aggregation order)
            F.round(
                F.sum(F.round(F.col("quality") * 10000).cast("bigint"))
                / F.lit(10000.0)
                / F.count("*"),
                4,
            ).alias("avg_quality"),
        )
        .orderBy("detected_lang", "source")
    )


# ---------------------------------------------------------------------------
# TF-IDF top terms (corpus-level): tf = total occurrences, df = #docs
# containing the term, tfidf = tf * ln(N/df). Both engines natural log,
# rounded to 4.
# ---------------------------------------------------------------------------

TFIDF_ORACLE = f"""
WITH t AS (SELECT doc_id, {_TOKS} AS toks FROM documents),
tok AS (SELECT doc_id, unnest(toks) AS term FROM t),
stats AS (
  SELECT term,
         count(*) AS tf,
         count(DISTINCT doc_id) AS df
  FROM tok WHERE term <> ''
  GROUP BY term
),
n AS (SELECT count(*) AS n_docs FROM documents)
SELECT term, tf, df,
       round(tf * ln(n.n_docs * 1.0 / df), 4) AS tfidf
FROM stats, n
ORDER BY tfidf DESC, term
LIMIT 25
"""


@register("text_tfidf_top_terms", TFIDF_ORACLE)
def text_tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale: one explode + one shuffle on term; doc count broadcast as a
    scalar; final top-25 via TakeOrdered (no full sort)."""
    docs = load_table(spark, sf_dir, "documents", columns=["doc_id", "text"])
    tok = docs.select("doc_id", F.explode(T.tokens(F.col("text"))).alias("term")).filter(
        F.col("term") != ""
    )
    n_docs = docs.count()
    stats = tok.groupBy("term").agg(
        F.count("*").alias("tf"), F.countDistinct("doc_id").alias("df")
    )
    return (
        stats.withColumn(
            "tfidf",
            F.round(F.col("tf") * F.log(F.lit(float(n_docs)) / F.col("df")), 4),
        )
        .orderBy(F.desc("tfidf"), "term")
        .limit(25)
    )


# ---------------------------------------------------------------------------
# BPE-ish token counting (driver mandate: "token counting — whitespace +
# a BPE-ish regex"). Whitespace counts live in text_stats; this one
# counts subword-style units: letter runs, single digits, and single
# punctuation marks — the GPT-2-tokenizer shape expressible identically
# in Java regex (Spark) and RE2 (DuckDB).
# ---------------------------------------------------------------------------

BPE_COUNT_ORACLE = r"""
SELECT source,
       count(*) AS n_docs,
       CAST(sum(len(regexp_extract_all(lower(text), '[a-z]+|[0-9]|[^a-z0-9\s]'))) AS BIGINT) AS bpe_tokens,
       round(avg(len(regexp_extract_all(lower(text), '[a-z]+|[0-9]|[^a-z0-9\s]'))), 4) AS avg_bpe_tokens
FROM documents
GROUP BY source
ORDER BY source
"""


@register("text_bpe_token_count", BPE_COUNT_ORACLE)
def text_bpe_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale: one regex pass per row + map-side partial agg on the tiny
    source key — no data shuffle beyond group partials."""
    docs = load_table(spark, sf_dir, "documents", columns=["source", "text"])
    n_bpe = F.size(
        F.expr(r"regexp_extract_all(lower(text), '[a-z]+|[0-9]|[^a-z0-9\\s]', 0)")
    )
    return (
        docs.select("source", n_bpe.alias("n_bpe"))
        .groupBy("source")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_bpe").cast("long").alias("bpe_tokens"),
            F.round(F.avg("n_bpe"), 4).alias("avg_bpe_tokens"),
        )
        .orderBy("source")
    )

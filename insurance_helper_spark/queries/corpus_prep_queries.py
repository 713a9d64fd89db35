"""Corpus-preparation queries: duplicated-span removal, contamination
screening, repetition gates, sequence packing — the round-4 additions
to the LLM-training-data surface (reference Stage-2 declaration,
README.md:73-101, taken to pretraining-corpus scale).

Every query here carries a full DuckDB value oracle — including the
greedy sequence packer, whose recurrence the oracle expresses as a
recursive CTE.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from insurance_helper_spark.operators import corpus
from insurance_helper_spark.queries.catalog import register
from insurance_helper_spark.sources.tables import load_table

# Shared oracle fragment: the engine's normalizing tokenizer.
_TOKS = (
    "string_split(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g')), ' ')"
)


# ---------------------------------------------------------------------------
# Cross-document duplicated-span removal (C4 / Lee et al. 2022, span
# unit instead of lines). Keep-first: the smallest doc_id containing a
# span keeps it; every other occurrence is dropped.
# ---------------------------------------------------------------------------

SPAN_DEDUP_ORACLE = f"""
WITH t AS (
  SELECT doc_id, {_TOKS} AS toks FROM documents
),
idx AS (
  SELECT doc_id, toks,
         unnest(range(CAST(ceil(len(toks) / 10.0) AS BIGINT))) AS i
  FROM t
),
spans AS (
  SELECT doc_id, i AS span_idx,
         array_to_string(toks[i*10+1 : i*10+10], ' ') AS span_text
  FROM idx
),
flagged AS (
  SELECT doc_id, span_idx, span_text,
         doc_id = min(doc_id) OVER (PARTITION BY span_text) AS keep
  FROM spans
)
SELECT doc_id,
       CAST(count(*) AS BIGINT) AS n_spans,
       CAST(count(*) FILTER (WHERE NOT keep) AS BIGINT) AS n_dropped,
       coalesce(string_agg(span_text, ' ' ORDER BY span_idx)
                FILTER (WHERE keep), '') AS clean_text
FROM flagged
GROUP BY doc_id
ORDER BY doc_id
"""


@register("corpus_span_dedup", SPAN_DEDUP_ORACLE)
def corpus_span_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents", columns=["doc_id", "text"])
    return corpus.span_dedup(docs, "doc_id", "text", span=10).orderBy("doc_id")


# ---------------------------------------------------------------------------
# Benchmark contamination screen: the held-out set is every document
# from source 'src0'; the corpus is everything else. A corpus document
# is contaminated when ≥20% of its distinct 5-token shingles appear
# anywhere in the held-out set.
# ---------------------------------------------------------------------------

CONTAMINATION_ORACLE = f"""
WITH t AS (
  SELECT doc_id, source, {_TOKS} AS toks FROM documents
),
sh AS (
  SELECT DISTINCT doc_id, source,
         array_to_string(toks[i+1 : i+5], ' ') AS shingle
  FROM (
    SELECT doc_id, source, toks,
           unnest(range(greatest(len(toks) - 5, 0) + 1)) AS i
    FROM t
  )
  WHERE len(toks) >= 5
),
bench AS (SELECT DISTINCT shingle FROM sh WHERE source = 'src0'),
corp AS (SELECT DISTINCT doc_id, shingle FROM sh WHERE source <> 'src0'),
scored AS (
  SELECT c.doc_id,
         CAST(count(*) AS BIGINT) AS n_shingles,
         CAST(count(*) FILTER (WHERE b.shingle IS NOT NULL) AS BIGINT) AS n_hits
  FROM corp c LEFT JOIN bench b USING (shingle)
  GROUP BY c.doc_id
)
SELECT doc_id, n_shingles, n_hits,
       round(n_hits * 1.0 / n_shingles, 6) AS contam_frac,
       n_hits * 1.0 / n_shingles >= 0.2 AS contaminated
FROM scored
ORDER BY doc_id
"""


@register("corpus_contamination", CONTAMINATION_ORACLE)
def corpus_contamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents", columns=["doc_id", "text", "source"])
    bench = docs.filter(F.col("source") == "src0")
    corp = docs.filter(F.col("source") != "src0")
    return corpus.contamination(
        corp, bench, "doc_id", "text", k=5, threshold=0.2
    ).orderBy("doc_id")


# ---------------------------------------------------------------------------
# Gopher repetition gates (Rae et al. 2021 §A.1.1): top-word fraction
# and duplicate-2-gram fraction, flag at 0.2 / 0.4.
# ---------------------------------------------------------------------------

REPETITION_ORACLE = f"""
WITH t AS (
  SELECT doc_id, {_TOKS} AS toks FROM documents
),
stats AS (
  SELECT doc_id,
         CAST(len(toks) AS INT) AS n_tokens,
         list_max(list_transform(list_distinct(toks),
                  tok -> len(list_filter(toks, x -> x = tok)))) AS top_cnt,
         CASE WHEN len(toks) >= 2
              THEN list_transform(range(1, len(toks)),
                   i -> toks[i] || ' ' || toks[i+1])
              ELSE [] END AS g2
  FROM t
)
SELECT doc_id, n_tokens,
       round(top_cnt * 1.0 / n_tokens, 6) AS top_word_frac,
       CASE WHEN len(g2) > 0
            THEN round(1.0 - len(list_distinct(g2)) * 1.0 / len(g2), 6)
            ELSE 0.0 END AS dup_2gram_frac,
       (top_cnt * 1.0 / n_tokens > 0.2)
       OR (CASE WHEN len(g2) > 0
                THEN 1.0 - len(list_distinct(g2)) * 1.0 / len(g2)
                ELSE 0.0 END > 0.4) AS repetitive
FROM stats
ORDER BY doc_id
"""


@register("text_repetition_gates", REPETITION_ORACLE)
def text_repetition_gates(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents", columns=["doc_id", "text"])
    out = corpus.repetition_stats(
        docs, "doc_id", "text", top_word_max=0.2, dup_2gram_max=0.4
    )
    return out.withColumn("n_tokens", F.col("n_tokens").cast("int")).orderBy("doc_id")


# ---------------------------------------------------------------------------
# Greedy sequence packing: per source, docs in id order, 256-token
# context windows. The oracle expresses the recurrence as a recursive
# CTE — step n joins step n-1 on (source, rn).
# ---------------------------------------------------------------------------

PACKING_ORACLE = f"""
WITH RECURSIVE base AS (
  SELECT doc_id, source, CAST(len({_TOKS}) AS BIGINT) AS tokens,
         row_number() OVER (PARTITION BY source ORDER BY doc_id) AS rn
  FROM documents
),
packed AS (
  SELECT doc_id, source, tokens, rn,
         CAST(0 AS BIGINT) AS bin_id, tokens AS bin_fill
  FROM base WHERE rn = 1
  UNION ALL
  SELECT b.doc_id, b.source, b.tokens, b.rn,
         CASE WHEN p.bin_fill + b.tokens > 256
              THEN p.bin_id + 1 ELSE p.bin_id END,
         CASE WHEN p.bin_fill + b.tokens > 256
              THEN b.tokens ELSE p.bin_fill + b.tokens END
  FROM base b JOIN packed p ON b.source = p.source AND b.rn = p.rn + 1
)
SELECT doc_id, source, tokens, bin_id, bin_fill
FROM packed
ORDER BY source, doc_id
"""


@register("corpus_pack_sequences", PACKING_ORACLE)
def corpus_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents", columns=["doc_id", "text", "source"])
    sized = docs.select(
        "doc_id",
        "source",
        F.size(corpus.tokens_col(F.col("text"))).cast("long").alias("tokens"),
    )
    return corpus.pack_sequences(
        sized, "doc_id", "source", "tokens", capacity=256
    ).orderBy("source", "doc_id")

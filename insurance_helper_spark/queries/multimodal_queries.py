"""Multimodal-column query registrations (SURVEY §2B "UDF surface" +
driver mandate: multimodal binary columns).

The fixture set has no real image/audio blobs, so these queries derive
a binary column from ``documents.text`` (``encode(text, 'UTF-8')``) and
run the REAL multimodal plumbing over it — binary schema, magic-byte
modality sniff, Arrow-batched mapInPandas feature extraction, frame
sampling — with outputs (lengths, digests, norms) that a DuckDB oracle
can verify exactly. The decode boundary itself stays a stub per the
build contract (sources/binary.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from insurance_helper_spark.queries.catalog import register
from insurance_helper_spark.sources import binary
from insurance_helper_spark.sources.tables import load_table

FEAT_DIM = 16

# The ASCII-representable magic prefixes (binary._MAGIC) replicated in
# SQL so the oracle classifies identically even if a synthetic text
# happens to start with one; the non-ASCII magics (\x89PNG, \xff\xd8,
# PK\x03\x04) cannot occur in UTF-8-encoded plain text.
_MODALITY_CASE_SQL = """
CASE WHEN left(text, 4) = '%PDF' THEN 'pdf'
     WHEN left(text, 4) = 'RIFF' THEN 'audio'
     WHEN left(text, 3) = 'ID3'  THEN 'audio'
     ELSE 'unknown' END
"""

MANIFEST_ORACLE = f"""
SELECT doc_id,
       octet_length(encode(text)) AS n_bytes,
       sha256(text) AS sha_hex,
       {_MODALITY_CASE_SQL} AS modality,
       CAST({FEAT_DIM} AS INT) AS feat_dim,
       CAST(1.0 AS DOUBLE) AS feat_norm
FROM documents
ORDER BY doc_id
"""


@register("multimodal_feature_manifest", MANIFEST_ORACLE)
def multimodal_feature_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents.text → binary column → mapInPandas feature extraction
    → manifest of (id, size, digest, modality, feature shape).

    Scale: the blob column never shuffles — features are extracted in
    the same pass that materializes the binary, and only the few-hundred
    -byte manifest rows flow to the sort. At 100 TB of real blobs the
    identical plan applies with spark.read.format("binaryFile")."""
    docs = load_table(spark, sf_dir, "documents", columns=["doc_id", "text"])
    bins = docs.select(
        F.col("doc_id").cast("string").alias("path"),
        F.encode("text", "UTF-8").alias("content"),
    )
    feats = binary.extract_features(bins, dim=FEAT_DIM, decode_stub=True)
    norm_sq = F.aggregate(
        "feature", F.lit(0.0), lambda acc, x: acc + x.cast("double") * x.cast("double")
    )
    return (
        feats.select(
            F.col("path").cast("bigint").alias("doc_id"),
            F.col("length").alias("n_bytes"),
            F.col("content_sha256").alias("sha_hex"),
            "modality",
            F.size("feature").alias("feat_dim"),
            F.round(F.sqrt(norm_sq), 2).alias("feat_norm"),
        )
        .orderBy("doc_id")
    )


EVERY_N = 256
MAX_FRAMES = 4

FRAME_SAMPLE_ORACLE = f"""
SELECT doc_id,
       octet_length(encode(text)) AS n_bytes,
       CAST(unnest(generate_series(
           0,
           least(CAST(greatest((octet_length(encode(text)) - 1) // {EVERY_N}, 0) AS INT),
                 {MAX_FRAMES - 1}))) AS INT) AS frame_index
FROM documents
ORDER BY doc_id, frame_index
"""


@register("multimodal_frame_sample", FRAME_SAMPLE_ORACLE)
def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame-sampling plumbing for video-like blobs: (doc, frame_index,
    byte_offset) grid from pure column expressions (sequence + explode)
    — no UDF, fully codegen'd; the frame decode itself is the stubbed
    boundary. Scale: narrow op, output ≤ max_frames× input rows."""
    docs = load_table(spark, sf_dir, "documents", columns=["doc_id", "text"])
    bins = docs.select(
        F.col("doc_id").alias("path"),
        F.octet_length("text").alias("length"),
    )
    plan = binary.frame_sample_plan(bins, every_n_bytes=EVERY_N, max_frames=MAX_FRAMES)
    return (
        plan.select(
            F.col("path").alias("doc_id"),
            F.col("length").cast("bigint").alias("n_bytes"),
            F.col("frame_index").cast("int").alias("frame_index"),
        )
        .orderBy("doc_id", "frame_index")
    )


# ---------------------------------------------------------------------------
# multimodal_chunk_dedup — content-addressable-storage dedup over the
# binary column: every blob splits into fixed 256-byte chunks, each
# chunk is sha-256 fingerprinted, and chunks occurring in more than
# one place become the dedup ledger (the CAS primitive behind blob
# stores and artifact caches — store each chunk once, reference it
# everywhere). Top-50 duplicated chunks by occurrence. Exactness:
# byte-slicing and sha-256 are bit-identical across engines (ASCII
# fixture text ⇒ UTF-8 encode is injective and reproducible), counts
# are integers. Scale: chunking is a generate (sequence + substring
# on the blob, JVM-side, no Python); only (hash, ids) rows shuffle —
# 32-byte digests, never blob bytes; one hash-key groupBy.
# ---------------------------------------------------------------------------

_CHUNK_BYTES = 256

CHUNK_DEDUP_ORACLE = f"""
WITH blobs AS (
  -- DuckDB substring() is VARCHAR-only; the fixture text is ASCII, so
  -- character slicing == byte slicing and sha256(varchar) hashes the
  -- same UTF-8 bytes the Spark side slices from the blob.
  SELECT doc_id, text AS b, octet_length(encode(text)) AS n
  FROM documents
),
chunks AS (
  SELECT doc_id,
         sha256(substring(b, 1 + i.i * {_CHUNK_BYTES}, {_CHUNK_BYTES})) AS h
  FROM blobs
  CROSS JOIN (SELECT unnest(range(0, 64)) AS i) i
  WHERE i.i * {_CHUNK_BYTES} < n
),
groups AS (
  SELECT h, CAST(count(*) AS BIGINT) AS n_occurrences,
         CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs
  FROM chunks GROUP BY h
  HAVING count(*) >= 2
)
SELECT substr(h, 1, 16) AS chunk_hash, n_occurrences, n_docs,
       CAST(row_number() OVER (ORDER BY n_occurrences DESC, h) AS INT) AS rank
FROM groups
QUALIFY rank <= 50
ORDER BY rank
"""


@register("multimodal_chunk_dedup", CHUNK_DEDUP_ORACLE)
def multimodal_chunk_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    docs = load_table(spark, sf_dir, "documents", columns=["doc_id", "text"])
    blobs = docs.select(
        "doc_id",
        F.encode("text", "UTF-8").alias("b"),
        F.length(F.encode("text", "UTF-8")).alias("n"),
    )
    chunks = (
        blobs.select(
            "doc_id",
            "n",
            F.explode(F.sequence(F.lit(0), F.lit(63))).alias("i"),
            F.col("b"),
        )
        .filter(F.col("i") * _CHUNK_BYTES < F.col("n"))
        .select(
            "doc_id",
            F.sha2(
                F.expr(f"substring(b, 1 + i * {_CHUNK_BYTES}, {_CHUNK_BYTES})"), 256
            ).alias("h"),
        )
    )
    groups = (
        chunks.groupBy("h")
        .agg(
            F.count("*").cast("long").alias("n_occurrences"),
            F.count_distinct("doc_id").cast("long").alias("n_docs"),
        )
        .filter(F.col("n_occurrences") >= 2)
    )
    wr = W.orderBy(F.desc("n_occurrences"), "h")
    return (
        groups.withColumn("rank", F.row_number().over(wr).cast("int"))
        .filter(F.col("rank") <= 50)
        .select(
            F.substring("h", 1, 16).alias("chunk_hash"),
            "n_occurrences",
            "n_docs",
            "rank",
        )
        .orderBy("rank")
    )

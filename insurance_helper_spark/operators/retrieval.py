"""Parameterized hybrid retrieval — the user-facing twin of the
catalog's ``retrieval_hybrid_rrf_topk`` (whose query documents are
pinned for the DuckDB oracle). This module serves an ARBITRARY query:

- ``query text``  — lexical BM25 leg over the query's terms; the
  vector leg uses Rocchio-style pseudo-relevance feedback (the mean
  embedding of the top-3 lexical hits) since the container ships no
  text encoder. Both leg ranks are reported, so a caller with a real
  encoder can verify the fusion is encoder-agnostic.
- ``--doc-id``    — query-by-example: the document's own tokens feed
  the lexical leg and its own embedding feeds the vector leg (exactly
  the catalog query's shape, for one ad-hoc document).

Fusion: Reciprocal Rank Fusion, score = sum 1/(60+rank) over legs
(Cormack et al.), fused top-n returned with both leg ranks (0 = not in
that leg's top-20).

Scale stance: tf rows exist only for the query's <=8 terms (left-semi
pushdown into the posting build); df/avgdl are tiny broadcast
aggregates; the vector leg broadcasts ONE query vector and scans
embeddings once. Each leg is cut to depth 20 by ``orderBy().limit()``
— Spark plans that as TakeOrderedAndProject (per-partition top-k,
merged in one final task), never a global sort — and only the <=20
survivors pass through the rank-assignment window, so no window ever
sees a corpus-sized partition (ADVICE r10). No all-pairs joins;
nothing corpus-sized is ever collected (the Rocchio centroid collects
3 rows).

Reference parity: Stage-3 "semantic search / RAG querying"
(/root/reference/README.md:103-137) exposed at the reference's only
user surface, the CLI (/root/reference/src/irdai_scraper/cli.py).
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from insurance_helper_spark.functions import text as T
from insurance_helper_spark.operators.similarity import cosine
from insurance_helper_spark.sources.tables import load_table

RRF_K = 60
MAX_QUERY_TERMS = 8
LEG_DEPTH = 20
FEEDBACK_DOCS = 3  # Rocchio pseudo-relevance depth for free-text queries


def _query_terms_from_text(query: str) -> list[str]:
    toks = [t for t in re.split(r"[^a-z0-9]+", query.lower()) if t]
    out: list[str] = []
    for t in toks:
        if t in T.EN_STOPWORDS or t in out:
            continue
        out.append(t)
    return out[:MAX_QUERY_TERMS]


def hybrid_rrf_retrieve(
    spark: SparkSession,
    sf_dir: str,
    query: str | None = None,
    doc_id: int | None = None,
    topn: int = 10,
) -> DataFrame:
    """Fused top-``topn`` (doc_id, rrf_score, lex_rank, vec_rank,
    snippet) for a free-text query or a query-by-example doc_id.
    Exactly one of ``query`` / ``doc_id`` must be given."""
    if (query is None) == (doc_id is None):
        raise ValueError("pass exactly one of query= or doc_id=")
    k1, b = 1.2, 0.75

    docs = load_table(spark, sf_dir, "documents", columns=["doc_id", "text"])
    emb = load_table(spark, sf_dir, "embeddings", columns=["vec_id", "embedding"]).select(
        "vec_id", F.col("embedding").cast("array<double>").alias("vv")
    )
    corpus = (
        docs.join(emb.select(F.col("vec_id").alias("doc_id")), "doc_id")
        .select("doc_id", T.tokens(F.col("text")).alias("toks"))
        .localCheckpoint(eager=True)  # feeds dl/totals/tf (+ q-terms for doc_id mode)
    )

    if doc_id is not None:
        qterm_rows = (
            corpus.where(F.col("doc_id") == doc_id)
            .select(F.explode("toks").alias("term"))
            .filter(~F.col("term").isin(*T.EN_STOPWORDS))
            .groupBy("term")
            .agg(F.count("*").alias("tf"))
            .orderBy(F.desc("tf"), "term")
            .limit(MAX_QUERY_TERMS)
            .collect()
        )
        terms = [r["term"] for r in qterm_rows]
        if not terms:
            raise ValueError(f"doc_id {doc_id} not found or has no indexable terms")
    else:
        terms = _query_terms_from_text(query or "")
        if not terms:
            raise ValueError("query has no indexable terms after tokenization")

    qterms = spark.createDataFrame([(t,) for t in terms], "term string")
    dl = corpus.select("doc_id", F.size("toks").alias("dl"))
    totals = corpus.agg(
        F.count("*").cast("long").alias("n_docs"),
        (F.sum(F.size("toks")).cast("double") / F.count("*")).alias("avgdl"),
    )
    tf = (
        corpus.select("doc_id", F.explode("toks").alias("term"))
        .join(F.broadcast(qterms), "term", "left_semi")
        .groupBy("doc_id", "term")
        .agg(F.count("*").cast("long").alias("tf"))
    )
    dft = tf.groupBy("term").agg(F.count("*").cast("long").alias("df"))
    idf = F.log(F.lit(1.0) + (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5))
    denom = F.col("tf") + k1 * (1 - b + b * F.col("dl") / F.col("avgdl"))
    term_score = F.round(idf * F.col("tf") * (k1 + 1) / denom * 1e9).cast("long")
    lex_base = (
        tf.join(F.broadcast(dft), "term")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(totals))
    )
    if doc_id is not None:
        lex_base = lex_base.filter(F.col("doc_id") != doc_id)
    # orderBy().limit() plans as TakeOrderedAndProject — per-partition
    # top-k then one merge task; the row_number window only ever sees
    # the <= LEG_DEPTH survivors (never the full candidate set).
    w_lex = W.orderBy(F.desc("bm4"), "doc_id")
    lex = (
        lex_base.groupBy("doc_id")
        .agg(F.round(F.sum(term_score).cast("double") / 1e9, 4).alias("bm4"))
        .orderBy(F.desc("bm4"), "doc_id")
        .limit(LEG_DEPTH)
        .withColumn("lex_rank", F.row_number().over(w_lex))
        .select("doc_id", "lex_rank")
        .localCheckpoint(eager=True)  # reused: vec leg feedback + fusion
    )

    if doc_id is not None:
        qv_rows = emb.where(F.col("vec_id") == doc_id).select("vv").collect()
        qv = qv_rows[0]["vv"] if qv_rows else None
    else:
        # Rocchio pseudo-relevance: centroid of the top feedback docs
        fb = [r["doc_id"] for r in lex.orderBy("lex_rank").limit(FEEDBACK_DOCS).collect()]
        vecs = emb.where(F.col("vec_id").isin(fb)).select("vv").collect() if fb else []
        if vecs:
            dim = len(vecs[0]["vv"])
            qv = [sum(v["vv"][i] for v in vecs) / len(vecs) for i in range(dim)]
        else:
            qv = None

    if qv is not None:
        qvec = spark.createDataFrame([(qv,)], "va array<double>")
        w_vec = W.orderBy(F.desc("cos6"), "doc_id")
        vec_base = emb.select(F.col("vec_id").alias("doc_id"), F.col("vv").alias("vb"))
        if doc_id is not None:
            vec_base = vec_base.filter(F.col("doc_id") != doc_id)
        vec = (
            vec_base.crossJoin(F.broadcast(qvec))
            .select("doc_id", F.round(cosine(F.col("va"), F.col("vb")), 6).alias("cos6"))
            .orderBy(F.desc("cos6"), "doc_id")
            .limit(LEG_DEPTH)
            .withColumn("vec_rank", F.row_number().over(w_vec))
            .select("doc_id", "vec_rank")
        )
    else:
        vec = spark.createDataFrame([], "doc_id bigint, vec_rank int")

    fused = lex.join(vec, "doc_id", "full_outer").select(
        "doc_id",
        F.coalesce(F.col("lex_rank"), F.lit(0)).cast("long").alias("lex_rank"),
        F.coalesce(F.col("vec_rank"), F.lit(0)).cast("long").alias("vec_rank"),
        (
            F.when(F.col("lex_rank").isNotNull(), F.lit(1.0) / (RRF_K + F.col("lex_rank"))).otherwise(F.lit(0.0))
            + F.when(F.col("vec_rank").isNotNull(), F.lit(1.0) / (RRF_K + F.col("vec_rank"))).otherwise(F.lit(0.0))
        ).alias("rrf_score"),
    )
    w_f = W.orderBy(F.desc("rrf_score"), "doc_id")
    return (
        fused.withColumn("rank", F.row_number().over(w_f))
        .filter(F.col("rank") <= topn)
        .join(docs, "doc_id")
        .select(
            "rank",
            "doc_id",
            F.round("rrf_score", 6).alias("rrf_score"),
            "lex_rank",
            "vec_rank",
            F.substring(F.regexp_replace("text", r"\s+", " "), 1, 80).alias("snippet"),
        )
        .orderBy("rank")
    )

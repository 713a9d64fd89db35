"""Similarity-search query registrations (SURVEY §2B).

Brute-force cosine top-k is exact and oracle-checked against DuckDB's
list_cosine_similarity (computed in DOUBLE on both sides, rounded to 4
before ranking with a deterministic id tiebreak). The LSH ANN variant
is Spark-specific bucketing → rows-only.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from insurance_helper_spark.operators import similarity
from insurance_helper_spark.queries.catalog import register
from insurance_helper_spark.sources.tables import load_table

N_QUERIES = 5
TOP_K = 10

COSINE_TOPK_ORACLE = f"""
WITH q AS (SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS q_vec
           FROM embeddings WHERE vec_id < {N_QUERIES}),
scored AS (
  SELECT q.query_id, c.vec_id AS neighbor_id,
         round(list_cosine_similarity(q.q_vec, CAST(c.embedding AS DOUBLE[])), 4) AS cosine_sim
  FROM embeddings c CROSS JOIN q
  WHERE c.vec_id <> q.query_id
)
SELECT query_id, neighbor_id, cosine_sim,
       row_number() OVER (PARTITION BY query_id
                          ORDER BY cosine_sim DESC, neighbor_id) AS nn_rank
FROM scored
QUALIFY nn_rank <= {TOP_K}
ORDER BY query_id, nn_rank
"""


@register("similarity_cosine_topk", COSINE_TOPK_ORACLE)
def similarity_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings", columns=["vec_id", "embedding"])
    queries = emb.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    out = similarity.cosine_topk(
        emb, queries, id_col="vec_id", vec_col="embedding",
        query_id_col="query_id", k=TOP_K, round_digits=4,
    )
    return out.select("query_id", "neighbor_id", "cosine_sim", "nn_rank").orderBy(
        "query_id", "nn_rank"
    )


@register("similarity_ann_lsh_rowsonly")
def similarity_ann_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF/LSH-style ANN: sign-bit bucketing + in-bucket exact re-rank.
    Rows-only (bucket assignment is engine-side hashing). At 100 TB the
    corpus is hashed in one narrow pass and only bucket-mates join."""
    emb = load_table(spark, sf_dir, "embeddings", columns=["vec_id", "embedding"])
    queries = emb.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    return similarity.ann_lsh_topk(
        emb, queries, dim=64, k=TOP_K, n_planes=8
    ).orderBy("query_id", "nn_rank")


@register("similarity_ivf_topk_rowsonly")
def similarity_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF coarse-quantization ANN: seeded-sample centroids + one
    distributed Lloyd refinement, then probe-masked scoring (each query
    scans only its n_probe nearest cells). Rows-only (centroid training
    is engine-side). At 100 TB the cell assignment is an ingest-time
    column and probing is partition pruning.

    Measured on the sf0.01 fixture (unclustered synthetic embeddings —
    the hard case for IVF): recall@10 ≈ 0.76 at 8/16 probes (~49% of
    dot products skipped); recall scales with probes since the vectors
    carry no cluster structure for the quantizer to exploit."""
    emb = load_table(spark, sf_dir, "embeddings", columns=["vec_id", "embedding"])
    queries = emb.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    return similarity.ivf_topk(
        emb, queries, k=TOP_K, n_centroids=16, n_probe=8
    ).orderBy("query_id", "nn_rank")


# ---------------------------------------------------------------------------
# Per-label centroid statistics — the cluster-tightness diagnostic that
# sits underneath IVF quality (SURVEY §2B similarity group): for each
# label, the centroid vector's norm and the cosine of every member to
# its centroid. Fully oracle-checked; doubles end-to-end, rounded to 4.
# ---------------------------------------------------------------------------

CENTROID_STATS_ORACLE = """
WITH ex AS (
  SELECT label, vec_id, i + 1 AS dim, CAST(embedding[i + 1] AS DOUBLE) AS val
  FROM (
    SELECT label, vec_id, embedding, unnest(range(len(embedding))) AS i
    FROM embeddings
  )
),
cent AS (SELECT label, dim, avg(val) AS c FROM ex GROUP BY 1, 2),
dots AS (
  SELECT e.label, e.vec_id, sum(e.val * c.c) AS dot,
         sqrt(sum(e.val * e.val)) AS nv
  FROM ex e JOIN cent c ON e.label = c.label AND e.dim = c.dim
  GROUP BY 1, 2
),
cn AS (SELECT label, sqrt(sum(c * c)) AS nc FROM cent GROUP BY 1)
SELECT d.label,
       CAST(count(*) AS BIGINT) AS n_vecs,
       round(any_value(cn.nc), 4) AS centroid_norm,
       round(avg(d.dot / (d.nv * cn.nc)), 4) AS avg_cos_to_centroid,
       round(min(d.dot / (d.nv * cn.nc)), 4) AS min_cos_to_centroid
FROM dots d JOIN cn USING (label)
GROUP BY d.label
ORDER BY d.label
"""


@register("embedding_centroid_stats", CENTROID_STATS_ORACLE)
def embedding_centroid_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Centroid per label + member-to-centroid cosine distribution.

    Plan: posexplode to (label, dim, val) — ONE shuffle keyed
    (label, dim) for the centroid aggregate; the centroid relation is
    n_labels × dim rows (tiny: clusters, not corpus), so the join back
    broadcasts; the member-cosine aggregate reuses the (label, vec_id)
    clustering. At 100 TB: centroids stay broadcastable as long as the
    cluster count is bounded, which is the IVF regime by construction.
    """
    emb = load_table(spark, sf_dir, "embeddings", columns=["vec_id", "embedding", "label"])
    ex = (
        emb.select(
            "label",
            "vec_id",
            F.posexplode(F.col("embedding").cast("array<double>")).alias("dim0", "val"),
        )
        .select("label", "vec_id", (F.col("dim0") + 1).alias("dim"), "val")
    )
    cent = ex.groupBy("label", "dim").agg(F.avg("val").alias("c"))
    dots = (
        ex.join(F.broadcast(cent), ["label", "dim"])
        .groupBy("label", "vec_id")
        .agg(
            F.sum(F.col("val") * F.col("c")).alias("dot"),
            F.sqrt(F.sum(F.col("val") * F.col("val"))).alias("nv"),
        )
    )
    cn = cent.groupBy("label").agg(F.sqrt(F.sum(F.col("c") * F.col("c"))).alias("nc"))
    cos = F.col("dot") / (F.col("nv") * F.col("nc"))
    return (
        dots.join(F.broadcast(cn), "label")
        .groupBy("label")
        .agg(
            F.count("*").alias("n_vecs"),
            F.round(F.first("nc"), 4).alias("centroid_norm"),
            F.round(F.avg(cos), 4).alias("avg_cos_to_centroid"),
            F.round(F.min(cos), 4).alias("min_cos_to_centroid"),
        )
        .orderBy("label")
    )

"""Training-data curation extensions: semantic (embedding-cluster)
dedup, unigram-LM surprisal scoring, and a deterministic stratified
train/val/test split.

These extend the §2B LLM-pipeline surface with three ops every
large-scale corpus build runs after the lexical gates:

- ``dedup_semantic_clusters`` — SemDeDup (Abbas et al. 2023,
  arXiv:2303.09540): assign each embedding to its nearest of k seeded
  centroids, elect the member closest to the centroid as the cluster
  canonical, and prune members whose cosine to the canonical exceeds a
  threshold. The fixture-scale twin uses one deterministic assignment
  pass (seeded centroid sample, no Lloyd iterations) so the whole
  decision list is SQL-expressible and value-hashed; the iterative
  variant at scale reuses ``operators/similarity.ivf_centroids``.
- ``text_unigram_surprisal`` — CCNet-style (Wenzek et al. 2019) LM
  quality proxy: train a corpus unigram model in one aggregation, score
  each document by mean token surprisal (-ln p). High surprisal =
  gibberish / OOV-heavy; low = boilerplate. The real pipeline swaps the
  unigram table for KenLM scores; the Spark plumbing is identical.
- ``corpus_stratified_split`` — leakage-free deterministic split:
  hash each doc_id with the catalog's Knuth multiplicative hash to a
  uniform, cut at 80/10/10, and report per-(source, split) counts +
  token mass so stratification skew is visible. The split column is a
  pure projection — no shuffle — so at 100 TB the split is free and
  reproducible run-over-run (no rand(), no sampleBy nondeterminism).

Scale stances are in each query's docstring. No reference parity to
cite: the reference engine (a scraping CLI — SURVEY.md §0) has none of
these; they belong to the driver-mandated LLM-pipeline surface
(BASELINE.json "dedup, similarity search, text analysis").
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from insurance_helper_spark.functions import text as T
from insurance_helper_spark.functions.hashing import (
    KEY_REDUCE as _KEY_REDUCE,
    KNUTH_MOD as _KNUTH_MOD,
    KNUTH_MUL as _KNUTH_MUL,
    knuth_uniform as _knuth_uniform,
)
from insurance_helper_spark.operators.similarity import cosine
from insurance_helper_spark.queries.catalog import register

# Shared DuckDB tokenizer snippet (single canonical copy lives in
# text_queries; fixture text is ASCII so [^a-z0-9] matches Spark's
# \p{L}\p{N} class).
from insurance_helper_spark.queries.text_queries import _TOKS
from insurance_helper_spark.sources.tables import load_table


# ---------------------------------------------------------------------------
# dedup_semantic_clusters — SemDeDup decision list. Scale: the k
# centroids broadcast (k × dim doubles); assignment is a map-side
# cross-product per row (no shuffle); the two windows shuffle once on
# vec_id-sized and cluster-sized keys respectively; the canonical join
# is a broadcast of k rows. At 100 TB swap the seeded sample for
# ivf_centroids (distributed Lloyd) — the decision list shape below is
# unchanged.
# ---------------------------------------------------------------------------

SEMANTIC_ORACLE = f"""
WITH seeds AS (
    SELECT vec_id AS centroid_id, CAST(embedding AS DOUBLE[]) AS cvec
    FROM embeddings
    ORDER BY ((vec_id % {_KEY_REDUCE}) * {_KNUTH_MUL}) % {_KNUTH_MOD}, vec_id
    LIMIT 8
),
scored AS (
    SELECT e.vec_id, s.centroid_id,
           round(list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), s.cvec), 4)
               AS cos_c
    FROM embeddings e CROSS JOIN seeds s
),
ranked AS (
    SELECT vec_id, centroid_id, cos_c,
           row_number() OVER (PARTITION BY vec_id
                              ORDER BY cos_c DESC, centroid_id) AS rn
    FROM scored
),
member AS (
    SELECT vec_id, centroid_id AS cluster_id, cos_c FROM ranked WHERE rn = 1
),
canon AS (
    SELECT cluster_id, vec_id AS canon_id
    FROM (SELECT cluster_id, vec_id,
                 row_number() OVER (PARTITION BY cluster_id
                                    ORDER BY cos_c DESC, vec_id) AS rn
          FROM member)
    WHERE rn = 1
)
SELECT m.vec_id,
       CAST(m.cluster_id AS BIGINT) AS cluster_id,
       m.vec_id = c.canon_id AS is_canonical,
       round(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                                    CAST(b.embedding AS DOUBLE[])), 4)
           AS cos_to_canon,
       (m.vec_id = c.canon_id
        OR round(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                                        CAST(b.embedding AS DOUBLE[])), 4) < 0.4)
           AS keep
FROM member m
JOIN canon c ON m.cluster_id = c.cluster_id
JOIN embeddings a ON m.vec_id = a.vec_id
JOIN embeddings b ON c.canon_id = b.vec_id
ORDER BY m.vec_id
"""


@register("dedup_semantic_clusters", SEMANTIC_ORACLE)
def dedup_semantic_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup decision list: cluster → canonical → cosine prune."""
    emb = load_table(spark, sf_dir, "embeddings", columns=["vec_id", "embedding"])
    seeds = (
        emb.orderBy(
            ((F.col("vec_id") % _KEY_REDUCE) * _KNUTH_MUL) % _KNUTH_MOD, "vec_id"
        )
        .limit(8)
        .select(
            F.col("vec_id").alias("centroid_id"),
            F.col("embedding").cast("array<double>").alias("cvec"),
        )
    )
    scored = emb.crossJoin(F.broadcast(seeds)).select(
        "vec_id",
        "centroid_id",
        F.round(cosine(F.col("embedding").cast("array<double>"), F.col("cvec")), 4).alias(
            "cos_c"
        ),
    )
    w_vec = Window.partitionBy("vec_id").orderBy(F.desc("cos_c"), "centroid_id")
    member = (
        scored.withColumn("rn", F.row_number().over(w_vec))
        .filter(F.col("rn") == 1)
        .select("vec_id", F.col("centroid_id").cast("long").alias("cluster_id"), "cos_c")
    )
    w_cluster = Window.partitionBy("cluster_id").orderBy(F.desc("cos_c"), "vec_id")
    canon = (
        member.withColumn("rn", F.row_number().over(w_cluster))
        .filter(F.col("rn") == 1)
        .select("cluster_id", F.col("vec_id").alias("canon_id"))
    )
    vecs = emb.select("vec_id", F.col("embedding").cast("array<double>").alias("v"))
    cos_to_canon = F.round(cosine(F.col("mv"), F.col("cv")), 4)
    return (
        member.join(F.broadcast(canon), "cluster_id")
        .join(vecs.select(F.col("vec_id"), F.col("v").alias("mv")), "vec_id")
        .join(
            vecs.select(F.col("vec_id").alias("canon_id"), F.col("v").alias("cv")),
            "canon_id",
        )
        .select(
            "vec_id",
            "cluster_id",
            (F.col("vec_id") == F.col("canon_id")).alias("is_canonical"),
            cos_to_canon.alias("cos_to_canon"),
            ((F.col("vec_id") == F.col("canon_id")) | (cos_to_canon < 0.4)).alias("keep"),
        )
        .orderBy("vec_id")
    )


# ---------------------------------------------------------------------------
# text_unigram_surprisal — per-doc mean token surprisal under the
# corpus unigram LM. Scale: the unigram table is one explode + one
# shuffle on term (same key the TF-IDF query uses); scoring re-joins
# tokens to the model on term — at 100 TB the model is millions of rows,
# well inside a shuffle join, and the per-doc mean is a partial agg on
# doc_id. No Python anywhere.
# ---------------------------------------------------------------------------

SURPRISAL_ORACLE = f"""
WITH t AS (
  SELECT doc_id, CASE WHEN trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g')) = ''
                      THEN [] ELSE {_TOKS} END AS toks
  FROM documents
),
tok AS (SELECT doc_id, unnest(toks) AS term FROM t),
model AS (
  SELECT term, count(*) AS cnt FROM tok GROUP BY term
),
total AS (SELECT sum(cnt) AS n FROM model)
SELECT tok.doc_id,
       CAST(count(*) AS BIGINT) AS n_tokens,
       round(avg(-ln(model.cnt * 1.0 / total.n)), 4) AS mean_surprisal,
       round(max(-ln(model.cnt * 1.0 / total.n)), 4) AS max_surprisal
FROM tok JOIN model USING (term), total
GROUP BY tok.doc_id
ORDER BY tok.doc_id
"""


@register("text_unigram_surprisal", SURPRISAL_ORACLE)
def text_unigram_surprisal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unigram-LM quality proxy: mean/max -ln p(token) per document."""
    docs = load_table(spark, sf_dir, "documents", columns=["doc_id", "text"])
    tok = docs.select("doc_id", F.explode(T.tokens(F.col("text"))).alias("term"))
    model = tok.groupBy("term").agg(F.count("*").alias("cnt"))
    total = model.agg(F.sum("cnt").alias("n"))
    surprisal = -F.log(F.col("cnt") * 1.0 / F.col("n"))
    return (
        tok.join(model, "term")
        .join(F.broadcast(total))
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_tokens"),
            F.round(F.avg(surprisal), 4).alias("mean_surprisal"),
            F.round(F.max(surprisal), 4).alias("max_surprisal"),
        )
        .orderBy("doc_id")
    )


# ---------------------------------------------------------------------------
# corpus_stratified_split — deterministic 80/10/10 split + per-(source,
# split) stratification report. Scale: the split label is a shuffle-free
# projection (integer hash); the report agg shuffles on a tiny
# (source × 3) key space with map-side partials. Writing the actual
# split is write.partitionBy('split') downstream of the same column.
# ---------------------------------------------------------------------------

from insurance_helper_spark.functions.hashing import knuth_uniform_sql as _kus

SPLIT_ORACLE = f"""
WITH t AS (
  SELECT doc_id, source,
         CASE WHEN trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g')) = ''
              THEN 0 ELSE len({_TOKS}) END AS n_tokens,
         {_kus("doc_id")} AS u
  FROM documents
),
labeled AS (
  SELECT source,
         CASE WHEN u < 0.8 THEN 'train'
              WHEN u < 0.9 THEN 'val'
              ELSE 'test' END AS split,
         n_tokens
  FROM t
)
SELECT source, split,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(n_tokens) AS BIGINT) AS total_tokens
FROM labeled
GROUP BY source, split
ORDER BY source, split
"""


@register("corpus_stratified_split", SPLIT_ORACLE)
def corpus_stratified_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic hash split with a per-source stratification report."""
    docs = load_table(spark, sf_dir, "documents", columns=["doc_id", "source", "text"])
    u = _knuth_uniform(F.col("doc_id"))
    labeled = docs.select(
        "source",
        F.when(u < 0.8, "train").when(u < 0.9, "val").otherwise("test").alias("split"),
        F.size(T.tokens(F.col("text"))).cast("long").alias("n_tokens"),
    )
    return (
        labeled.groupBy("source", "split")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_tokens").alias("total_tokens"),
        )
        .orderBy("source", "split")
    )


# ---------------------------------------------------------------------------
# text_zipf_fit — corpus health diagnostic: least-squares fit of the
# log-log rank-frequency curve (Zipf's law; natural text slopes ≈ −1,
# boilerplate-heavy or synthetic corpora drift off). ENGINE PARITY
# (r7 float-sum sweep): the fit rides exact integer moments — the
# ln-ln points are quantized to round(ln(·)·1e5) AS BIGINT, so every
# OLS sum is order-independent and the two engines agree bit-for-bit
# up to the one terminal rounded division (regr_* over raw doubles
# was the same partial-aggregation-order hazard that flaked Heaps in
# the r7 driver run). BIGINT headroom at the 1e5 scale: 500 points,
# ly ≤ ln(1e13)·1e5 ≈ 3e6 → m·Σly² ≈ 2.2e18 < 2^63 even at 100 TB
# counts. Scale: the term table is one explode + one shuffle; the
# global rank window runs over the reduced |vocab| relation (top-500
# cap) and the fit is a single-pass aggregate with map-side partials.
# ---------------------------------------------------------------------------

ZIPF_ORACLE = f"""
WITH t AS (
  SELECT doc_id, CASE WHEN trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g')) = ''
                      THEN [] ELSE {_TOKS} END AS toks
  FROM documents
),
tok AS (SELECT unnest(toks) AS term FROM t),
model AS (SELECT term, CAST(count(*) AS BIGINT) AS cnt FROM tok GROUP BY term),
ranked AS (
  SELECT cnt, row_number() OVER (ORDER BY cnt DESC, term) AS rnk FROM model
),
pts AS (
  SELECT CAST(round(ln(rnk * 1.0) * 100000) AS BIGINT) AS lx,
         CAST(round(ln(cnt * 1.0) * 100000) AS BIGINT) AS ly
  FROM ranked WHERE rnk <= 500
),
fit AS (
  SELECT CAST(count(*) AS BIGINT) AS m,
         CAST(sum(lx) AS BIGINT) AS sx, CAST(sum(ly) AS BIGINT) AS sy,
         CAST(sum(lx * ly) AS BIGINT) AS sxy,
         CAST(sum(lx * lx) AS BIGINT) AS sxx,
         CAST(sum(ly * ly) AS BIGINT) AS syy
  FROM pts
)
SELECT m AS n_terms,
       CASE WHEN m * sxx - sx * sx <> 0 THEN
         round(CAST(m * sxy - sx * sy AS DOUBLE)
               / CAST(m * sxx - sx * sx AS DOUBLE), 4) END AS zipf_slope,
       CASE WHEN m * sxx - sx * sx <> 0 THEN
         round((CAST(sy AS DOUBLE)
                - CAST(m * sxy - sx * sy AS DOUBLE)
                  / CAST(m * sxx - sx * sx AS DOUBLE)
                  * CAST(sx AS DOUBLE))
               / CAST(m AS DOUBLE) / 100000.0, 4) END AS zipf_intercept,
       CASE WHEN m * sxx - sx * sx <> 0 AND m * syy - sy * sy <> 0 THEN
         round(CAST(m * sxy - sx * sy AS DOUBLE) * CAST(m * sxy - sx * sy AS DOUBLE)
               / (CAST(m * sxx - sx * sx AS DOUBLE)
                  * CAST(m * syy - sy * sy AS DOUBLE)), 4) END AS fit_r2
FROM fit
"""


@register("text_zipf_fit", ZIPF_ORACLE)
def text_zipf_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zipf rank-frequency regression over the top-500 vocabulary."""
    docs = load_table(spark, sf_dir, "documents", columns=["doc_id", "text"])
    tok = docs.select(F.explode(T.tokens(F.col("text"))).alias("term"))
    model = tok.groupBy("term").agg(F.count("*").alias("cnt"))
    # r15 (VERDICT r14 item 4): orderBy+limit compiles to
    # TakeOrderedAndProject (per-partition top-k, merge) — the
    # row_number window then ranks ≤500 rows instead of single-tasking
    # the whole vocabulary; (cnt desc, term) is a total order, so the
    # limit keeps exactly the rnk ≤ 500 rows with identical ranks.
    ranked = (
        model.orderBy(F.desc("cnt"), "term")
        .limit(500)
        .select(
            "cnt",
            F.row_number().over(Window.orderBy(F.desc("cnt"), "term")).alias("rnk"),
        )
    )
    pts = ranked.select(
        F.round(F.log(F.col("rnk") * 1.0) * 100000).cast("long").alias("lx"),
        F.round(F.log(F.col("cnt") * 1.0) * 100000).cast("long").alias("ly"),
    )
    fit = pts.agg(
        F.count("*").cast("long").alias("m"),
        F.sum("lx").alias("sx"),
        F.sum("ly").alias("sy"),
        F.sum(F.col("lx") * F.col("ly")).alias("sxy"),
        F.sum(F.col("lx") * F.col("lx")).alias("sxx"),
        F.sum(F.col("ly") * F.col("ly")).alias("syy"),
    )
    numl = F.col("m") * F.col("sxy") - F.col("sx") * F.col("sy")
    denl = F.col("m") * F.col("sxx") - F.col("sx") * F.col("sx")
    denyl = F.col("m") * F.col("syy") - F.col("sy") * F.col("sy")
    num, den, deny = numl.cast("double"), denl.cast("double"), denyl.cast("double")
    return fit.select(
        F.col("m").alias("n_terms"),
        F.when(denl != 0, F.round(num / den, 4)).alias("zipf_slope"),
        F.when(
            denl != 0,
            F.round(
                (F.col("sy").cast("double") - num / den * F.col("sx").cast("double"))
                / F.col("m").cast("double")
                / 100000.0,
                4,
            ),
        ).alias("zipf_intercept"),
        F.when((denl != 0) & (denyl != 0), F.round(num * num / (den * deny), 4)).alias(
            "fit_r2"
        ),
    )


# ---------------------------------------------------------------------------
# agg_approx_percentile_bounds — approx_percentile with an oracle-
# checkable rank bound (same contract pattern as
# agg_approx_distinct_bounds): the sketch's median must sit within
# ±5% of the true rank, verified Spark-side against real counts; the
# oracle recomputes the exact count and pins the boolean TRUE. At
# 100 TB the KLL/GK sketch replaces exact percentiles that would sort
# every group; the bound is the contract the swap relies on.
# ---------------------------------------------------------------------------

APPROX_PCT_ORACLE = """
SELECT l_returnflag,
       CAST(count(*) AS BIGINT) AS n_rows,
       TRUE AS rank_within_bounds
FROM lineitem
GROUP BY l_returnflag
ORDER BY l_returnflag
"""


@register("agg_approx_percentile_bounds", APPROX_PCT_ORACLE)
def agg_approx_percentile_bounds(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem", columns=["l_returnflag", "l_extendedprice"])
    approx = li.groupBy("l_returnflag").agg(
        F.expr("approx_percentile(l_extendedprice, 0.5, 100)").alias("approx_p50"),
        F.count("*").alias("n_rows"),
    )
    # Rank-check the sketch output against the real data distribution.
    joined = li.join(F.broadcast(approx), "l_returnflag")
    return (
        joined.groupBy("l_returnflag")
        .agg(
            F.max("n_rows").alias("n_rows"),
            F.sum((F.col("l_extendedprice") <= F.col("approx_p50")).cast("long")).alias(
                "__cnt_le"
            ),
        )
        .select(
            "l_returnflag",
            "n_rows",
            (
                F.abs(F.col("__cnt_le") - 0.5 * F.col("n_rows"))
                <= 0.05 * F.col("n_rows") + 1
            ).alias("rank_within_bounds"),
        )
        .orderBy("l_returnflag")
    )


# ---------------------------------------------------------------------------
# dq_orders_expectations — declarative constraint suite over orders
# (sources/quality.py): uniqueness, not-null, referential integrity,
# range, accepted values, regex shape. The range rule is deliberately
# violated by the fixture (totalprice reaches ~500k) so the report
# exercises both outcomes. Scale: row-local rules fuse into ONE scan;
# uniqueness adds one orderkey shuffle; the FK anti join broadcasts the
# customer key set.
# ---------------------------------------------------------------------------

DQ_ORDERS_ORACLE = """
WITH r AS (
  SELECT 'o_custkey_fk' AS rule,
         CAST((SELECT count(*) FROM orders o
               WHERE o.o_custkey IS NOT NULL
                 AND NOT EXISTS (SELECT 1 FROM customer c
                                 WHERE c.c_custkey = o.o_custkey)) AS BIGINT)
             AS n_violations
  UNION ALL
  SELECT 'o_custkey_not_null',
         CAST((SELECT count(*) FROM orders WHERE o_custkey IS NULL) AS BIGINT)
  UNION ALL
  SELECT 'o_orderkey_unique',
         CAST((SELECT coalesce(sum(n - 1), 0) FROM
               (SELECT count(*) AS n FROM orders GROUP BY o_orderkey HAVING count(*) > 1))
              AS BIGINT)
  UNION ALL
  SELECT 'o_orderpriority_accepted',
         CAST((SELECT count(*) FROM orders
               WHERE o_orderpriority IS NULL OR o_orderpriority NOT IN
                 ('1-URGENT', '2-HIGH', '3-MEDIUM', '4-NOT SPECIFIED', '5-LOW')) AS BIGINT)
  UNION ALL
  SELECT 'o_orderpriority_matches',
         CAST((SELECT count(*) FROM orders
               WHERE o_orderpriority IS NULL
                  OR NOT regexp_matches(o_orderpriority, '^[1-5]-')) AS BIGINT)
  UNION ALL
  SELECT 'o_totalprice_range',
         CAST((SELECT count(*) FROM orders
               WHERE o_totalprice IS NULL OR o_totalprice < 0
                  OR o_totalprice > 100000) AS BIGINT)
)
SELECT rule, n_violations, n_violations = 0 AS passed
FROM r ORDER BY rule
"""


@register("dq_orders_expectations", DQ_ORDERS_ORACLE)
def dq_orders_expectations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Constraint-validation report over orders (one scan + FK/unique)."""
    from insurance_helper_spark.sources import quality as Q

    orders = load_table(
        spark, sf_dir, "orders",
        columns=["o_orderkey", "o_custkey", "o_totalprice", "o_orderpriority"],
    )
    customer = load_table(spark, sf_dir, "customer", columns=["c_custkey"])
    rules = [
        Q.unique(["o_orderkey"], "o_orderkey_unique"),
        Q.not_null("o_custkey", "o_custkey_not_null"),
        Q.foreign_key("o_custkey", customer, "c_custkey", "o_custkey_fk"),
        Q.in_range("o_totalprice", 0, 100000, "o_totalprice_range"),
        Q.accepted_values(
            "o_orderpriority",
            ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"],
            "o_orderpriority_accepted",
        ),
        Q.matches("o_orderpriority", "^[1-5]-", "o_orderpriority_matches"),
    ]
    return Q.run_expectations(orders, rules)


# ---------------------------------------------------------------------------
# scd2_customer_versions — SCD Type-2 temporal merge (operators/scd.py)
# driven from the fixtures: the seeded customer dimension (everyone
# 'LOW' activity since 1990) takes one update batch derived from
# orders (5+ orders → 'HIGH', effective at the customer's latest order
# date). Customers whose derived band equals the seed are NO-OP updates
# (no spurious version); changed customers get their current row closed
# plus a new current version. Scale: one key shuffle per side, then
# row-local branching — history rows pass through untouched.
# ---------------------------------------------------------------------------

SCD2_ORACLE = """
WITH seed AS (
  SELECT c_custkey, 'LOW' AS band,
         DATE '1990-01-01' AS valid_from,
         CAST(NULL AS DATE) AS valid_to,
         TRUE AS is_current
  FROM customer
),
upd AS (
  SELECT o_custkey AS c_custkey,
         CASE WHEN count(*) >= 5 THEN 'HIGH' ELSE 'LOW' END AS band,
         CAST(max(o_orderdate) AS DATE) AS eff
  FROM orders GROUP BY o_custkey
),
joined AS (
  SELECT s.c_custkey, s.band, s.valid_from, s.valid_to, s.is_current,
         u.band AS u_band, u.eff
  FROM seed s LEFT JOIN upd u ON s.c_custkey = u.c_custkey
)
SELECT c_custkey, band, valid_from,
       coalesce(valid_to, DATE '9999-12-31') AS valid_to, is_current
FROM joined WHERE eff IS NULL OR u_band = band
UNION ALL
SELECT c_custkey, band, valid_from, eff, FALSE FROM joined
WHERE eff IS NOT NULL AND u_band <> band
UNION ALL
SELECT c_custkey, u_band, eff, DATE '9999-12-31', TRUE FROM joined
WHERE eff IS NOT NULL AND u_band <> band
ORDER BY c_custkey, valid_from, is_current
"""


@register("scd2_customer_versions", SCD2_ORACLE)
def scd2_customer_versions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD2 merge of an orders-derived update batch into customers."""
    from insurance_helper_spark.operators.scd import scd2_merge

    customer = load_table(spark, sf_dir, "customer", columns=["c_custkey"])
    orders = load_table(spark, sf_dir, "orders", columns=["o_custkey", "o_orderdate"])
    dim = customer.select(
        "c_custkey",
        F.lit("LOW").alias("band"),
        F.lit("1990-01-01").cast("date").alias("valid_from"),
        F.lit(None).cast("date").alias("valid_to"),
        F.lit(True).alias("is_current"),
    )
    updates = orders.groupBy(F.col("o_custkey").alias("c_custkey")).agg(
        F.when(F.count("*") >= 5, "HIGH").otherwise("LOW").alias("band"),
        F.to_date(F.max("o_orderdate")).alias("effective_date"),
    )
    merged = scd2_merge(dim, updates, key="c_custkey", tracked=["band"])
    # Open-ended validity presented as the 9999-12-31 sentinel (null
    # dates hash as NaT-vs-None across engines; the sentinel is also
    # the usual warehouse convention for range-predicate friendliness).
    return merged.withColumn(
        "valid_to", F.coalesce(F.col("valid_to"), F.lit("9999-12-31").cast("date"))
    ).orderBy("c_custkey", "valid_from", "is_current")


# ---------------------------------------------------------------------------
# agg_hll_mergeable_daily — the incremental-distinct story at scale:
# per-day Datasketches HLL sketches of active users (hll_sketch_agg),
# merged with hll_union_agg into a weekly estimate WITHOUT touching
# row data again — the mergeable-state pattern a 100 TB daily-ingest
# pipeline persists instead of raw IDs. The estimate is engine-
# specific, so the oracle pins the EXACT monthly distinct count and a
# TRUE error-bound boolean (same contract pattern as the approx-
# distinct/percentile rows); Spark computes the bound against its own
# exact count. Scale: each day's sketch is a few KB; the union is a
# |days|-row reduce.
# ---------------------------------------------------------------------------

HLL_DAILY_ORACLE = """
WITH weekly AS (
  SELECT date_trunc('week', ts) AS week,
         CAST(count(DISTINCT user_id) AS BIGINT) AS n_exact
  FROM events GROUP BY week
)
SELECT CAST(week AS DATE) AS week, n_exact, TRUE AS within_bounds
FROM weekly ORDER BY week
"""


@register("agg_hll_mergeable_daily", HLL_DAILY_ORACLE)
def agg_hll_mergeable_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily HLL sketches union-merged to weeks, bound-checked."""
    ev = load_table(spark, sf_dir, "events", columns=["ts", "user_id"])
    daily = ev.groupBy(
        F.date_trunc("week", "ts").alias("week"),
        F.to_date("ts").alias("day"),
    ).agg(F.hll_sketch_agg("user_id", 14).alias("sketch"))
    merged = daily.groupBy("week").agg(
        F.hll_sketch_estimate(F.hll_union_agg("sketch")).alias("n_approx")
    )
    exact = ev.groupBy(F.date_trunc("week", "ts").alias("week")).agg(
        F.countDistinct("user_id").alias("n_exact")
    )
    return (
        merged.join(exact, "week")
        .select(
            F.to_date("week").alias("week"),
            "n_exact",
            (
                F.abs(F.col("n_approx") - F.col("n_exact")) / F.col("n_exact") < 0.05
            ).alias("within_bounds"),
        )
        .orderBy("week")
    )


# ---------------------------------------------------------------------------
# incremental_agg_maintenance — the batch mergeable-state identity:
# maintain a per-customer order-spend aggregate across two "daily"
# batches (orders split at 1996-01-01) by merging partials, and present
# the maintained table. The oracle aggregates the raw union directly —
# value-hash equality IS the merge(partial(A), partial(B)) ==
# partial(A ∪ B) identity the maintenance pattern relies on. Scale:
# each batch reduces to |keys| partial rows before the merge; history
# raw rows are never re-read.
# ---------------------------------------------------------------------------

INCR_AGG_ORACLE = """
WITH c AS (
  SELECT o_custkey,
         CAST(round(o_totalprice * 100) AS BIGINT) AS cents
  FROM orders
)
SELECT o_custkey,
       CAST(count(*) AS BIGINT) AS n_orders,
       round(sum(cents) / 100.0, 2) AS total_spend,
       round(min(cents) / 100.0, 2) AS min_spend,
       round(max(cents) / 100.0, 2) AS max_spend,
       ((2 * sum(cents) + count(*)) // (2 * count(*))) / 100.0 AS avg_spend
FROM c
GROUP BY o_custkey
ORDER BY o_custkey
"""


@register("incremental_agg_maintenance", INCR_AGG_ORACLE)
def incremental_agg_maintenance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-batch partial-merge maintenance vs direct-aggregate oracle."""
    from insurance_helper_spark.operators.incremental import (
        aggregate_partials,
        merge_aggregate_partials,
    )

    orders = load_table(
        spark, sf_dir, "orders", columns=["o_custkey", "o_orderdate", "o_totalprice"]
    ).withColumn("cents", F.round(F.col("o_totalprice") * 100).cast("long"))
    batch1 = orders.filter(F.col("o_orderdate") < "1996-01-01")
    batch2 = orders.filter(F.col("o_orderdate") >= "1996-01-01")
    state = aggregate_partials(batch1, ["o_custkey"], "cents")
    merged = merge_aggregate_partials(
        state, aggregate_partials(batch2, ["o_custkey"], "cents"), ["o_custkey"]
    )
    # Integer-cents partials make the merge identity exact: long sums
    # are order-independent, so merge == direct-aggregate to the bit.
    return merged.select(
        "o_custkey",
        F.col("p_count").alias("n_orders"),
        F.round(F.col("p_sum") / 100.0, 2).alias("total_spend"),
        F.round(F.col("p_min") / 100.0, 2).alias("min_spend"),
        F.round(F.col("p_max") / 100.0, 2).alias("max_spend"),
        # Half-up integer division keeps the derived average exact in
        # cents — round(double) tie semantics differ across engines.
        (F.expr("(2 * p_sum + p_count) div (2 * p_count)") / 100.0).alias("avg_spend"),
    ).orderBy("o_custkey")


# ---------------------------------------------------------------------------
# crosslingual_margin_pairs — bitext-mining candidate pairs (Artetxe &
# Schwenk 2019 margin scoring, the CCMatrix/LASER shape): for each
# non-English document, the best English match by RATIO MARGIN —
# cos(x,y) normalized by the mean of both directions' top-4 neighbor
# similarities — which suppresses hubs that plain cosine top-1 mines.
# Fixture-exact twin: the full non-en × en pair grid (oracle-checkable);
# at 100 TB the grid is replaced by the SRP-bucketed candidate join
# (dedup_embedding_cosine_lsh's plan) feeding the SAME margin windows.
# Scale stance for the windows: both are per-doc-id partitions over the
# candidate relation — one shuffle each side.
# ---------------------------------------------------------------------------

CROSSLINGUAL_ORACLE = """
WITH v AS (
  SELECT d.doc_id, d.lang, CAST(e.embedding AS DOUBLE[]) AS vec
  FROM documents d JOIN embeddings e ON d.doc_id = e.vec_id
),
src AS (SELECT doc_id AS x_id, lang AS x_lang, vec FROM v WHERE lang <> 'en'),
tgt AS (SELECT doc_id AS y_id, vec FROM v WHERE lang = 'en'),
grid AS (
  SELECT s.x_id, s.x_lang, t.y_id,
         round(list_cosine_similarity(s.vec, t.vec), 4) AS cos_sim
  FROM src s CROSS JOIN tgt t
),
fwd AS (
  SELECT x_id, avg(cos_sim) AS favg FROM (
    SELECT x_id, cos_sim,
           row_number() OVER (PARTITION BY x_id ORDER BY cos_sim DESC, y_id) AS rn
    FROM grid) WHERE rn <= 4 GROUP BY x_id
),
bwd AS (
  SELECT y_id, avg(cos_sim) AS bavg FROM (
    SELECT y_id, cos_sim,
           row_number() OVER (PARTITION BY y_id ORDER BY cos_sim DESC, x_id) AS rn
    FROM grid) WHERE rn <= 4 GROUP BY y_id
),
scored AS (
  SELECT g.x_id, g.x_lang, g.y_id,
         round(2 * g.cos_sim / (f.favg + b.bavg), 4) AS margin
  FROM grid g JOIN fwd f ON g.x_id = f.x_id JOIN bwd b ON g.y_id = b.y_id
),
best AS (
  SELECT x_id, x_lang, y_id, margin,
         row_number() OVER (PARTITION BY x_id ORDER BY margin DESC, y_id) AS rn
  FROM scored
)
SELECT x_id, x_lang, y_id AS en_doc_id, margin
FROM best WHERE rn = 1 AND margin > 1.0
ORDER BY x_id
"""


@register("crosslingual_margin_pairs", CROSSLINGUAL_ORACLE)
def crosslingual_margin_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Margin-scored best-English-match per non-English document.

    The pair grid is produced by a BLAS matmul in mapInPandas blocks
    (the cosine_topk pattern): the English matrix collects + broadcasts
    (the small "queries" side), each non-English block multiplies once —
    measured 13.5 s → 3.5 s warm at sf0.1 (r11 isolated min-of-3 re-check;
    individual warm passes range 3.5-5.4 s on the shared host with an
    UNCHANGED plan, which is what the one-off 5.12 s r10 bench reading
    was) vs the interpreted zip_with/aggregate cosine over the same
    6M-pair grid. Rounding to 4 digits happens inside the kernel so the
    margin windows see cross-engine-stable values."""
    src, tgt = _bitext_sides(spark, sf_dir)
    return _margin_best(_exact_bitext_grid(spark, src, tgt))


def _bitext_sides(spark: SparkSession, sf_dir: str) -> tuple[DataFrame, DataFrame]:
    """(non-English src, English tgt) sides of the bitext-mining join:
    src = (x_id, x_lang, vec), tgt = (y_id, vec), vecs cast to double."""
    docs = load_table(spark, sf_dir, "documents", columns=["doc_id", "lang"])
    emb = load_table(spark, sf_dir, "embeddings", columns=["vec_id", "embedding"])
    v = docs.join(emb, docs.doc_id == emb.vec_id).select(
        "doc_id", "lang", F.col("embedding").cast("array<double>").alias("vec")
    )
    src = v.filter(F.col("lang") != "en").select(
        F.col("doc_id").alias("x_id"), F.col("lang").alias("x_lang"), "vec"
    )
    tgt = v.filter(F.col("lang") == "en").select(F.col("doc_id").alias("y_id"), "vec")
    return src, tgt


def _exact_bitext_grid(spark: SparkSession, src: DataFrame, tgt: DataFrame) -> DataFrame:
    """The full src × tgt cosine grid via blocked BLAS: the English
    matrix collects via Arrow (arrow_id_matrix — columnar buffers, not
    Row objects; ADVICE r13) + broadcasts, each non-English block
    multiplies once in mapInPandas. Cosines round to 4 digits inside
    the kernel so the margin windows see cross-engine-stable values.
    Shared by crosslingual_margin_pairs (always) and
    crosslingual_margin_pairs_lsh (when the cost dispatch picks the
    exact plan below the broadcast ceiling — VERDICT r13 item 1)."""
    import numpy as np
    import pandas as pd

    from insurance_helper_spark.operators.similarity import arrow_id_matrix, unit_rows
    from insurance_helper_spark.shipping import ensure_shipped

    ensure_shipped(spark)
    y_ids, y_mat = arrow_id_matrix(tgt, "y_id", "vec")
    y_unit = unit_rows(y_mat)
    b_yids = spark.sparkContext.broadcast(y_ids)
    b_yunit = spark.sparkContext.broadcast(y_unit)

    def run(batches):
        yids, yunit = b_yids.value, b_yunit.value
        for pdf in batches:
            if not len(pdf):
                continue
            x_ids = pdf["x_id"].to_numpy(dtype=np.int64)
            langs = pdf["x_lang"].tolist()
            blk = np.array(list(pdf["vec"]), dtype=np.float64)
            sims = np.round(unit_rows(blk) @ yunit.T, 4)
            m = len(yids)
            yield pd.DataFrame(
                {
                    "x_id": np.repeat(x_ids, m),
                    "x_lang": np.repeat(np.array(langs, dtype=object), m),
                    "y_id": np.tile(yids, len(x_ids)),
                    "cos_sim": sims.ravel(),
                }
            )

    return (
        src
        # The matmul stream side otherwise inherits FILE-SPLIT
        # parallelism (a small single-file parquet scan = 1-2 tasks),
        # each task carrying the full |en|x row fan-out near-serially —
        # the r13 sf1 probe measured a 2-task stage pinned for minutes.
        # Size parallelism by OUTPUT fan-out: one round-robin
        # repartition restores 32-way blocks (same fix as ml_knn r12).
        .repartition(spark.sparkContext.defaultParallelism)
        .mapInPandas(run, schema="x_id bigint, x_lang string, y_id bigint, cos_sim double")
    )


def _margin_best(grid: DataFrame) -> DataFrame:
    """Ratio-margin scoring + best-match selection over a scored pair
    relation (x_id, x_lang, y_id, cos_sim). Shared by the exact-grid
    oracle query and the LSH scale twin — the margin definition is
    identical; only the candidate relation differs. Both neighborhood
    windows partition on a doc-id key: one shuffle each side.

    r14: the scored relation is eagerly checkpointed first — it feeds
    THREE subtrees (the fwd window, the bwd window, and the final
    scored join), and the r14 plan capture showed the scoring
    MapInPandas kernel (the GEMM grid or the per-candidate cosine)
    evaluated once PER SUBTREE (guide §2.4/§5: reuse, don't
    recompute). One narrow (2×long, string, double) row per scored
    pair is held; blocks are session-sweepable."""
    grid = grid.localCheckpoint(eager=True)
    w_fwd = Window.partitionBy("x_id").orderBy(F.desc("cos_sim"), "y_id")
    fwd = (
        grid.withColumn("rn", F.row_number().over(w_fwd))
        .filter(F.col("rn") <= 4)
        .groupBy("x_id")
        .agg(F.avg("cos_sim").alias("favg"))
    )
    w_bwd = Window.partitionBy("y_id").orderBy(F.desc("cos_sim"), "x_id")
    bwd = (
        grid.withColumn("rn", F.row_number().over(w_bwd))
        .filter(F.col("rn") <= 4)
        .groupBy("y_id")
        .agg(F.avg("cos_sim").alias("bavg"))
    )
    scored = (
        grid.join(fwd, "x_id")
        .join(F.broadcast(bwd), "y_id")
        .select(
            "x_id", "x_lang", "y_id",
            F.round(2 * F.col("cos_sim") / (F.col("favg") + F.col("bavg")), 4).alias("margin"),
        )
    )
    w_best = Window.partitionBy("x_id").orderBy(F.desc("margin"), "y_id")
    return (
        scored.withColumn("rn", F.row_number().over(w_best))
        .filter((F.col("rn") == 1) & (F.col("margin") > 1.0))
        .select("x_id", "x_lang", F.col("y_id").alias("en_doc_id"), "margin")
        .orderBy("x_id")
    )


@register("crosslingual_margin_pairs_lsh")  # rows-only: ANN recall < 1
def crosslingual_margin_pairs_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The 100 TB path for bitext mining: SRP-LSH candidate generation
    replaces the full non-en × en grid, then the SAME ratio-margin
    windows (_margin_best) run over candidates only — the CCMatrix
    shape, where margins are computed over ANN neighborhoods rather
    than exact ones.

    Scale: no driver collect anywhere — both sides are hashed once
    (Arrow-batched matmul), candidates come from 24-byte-row bucket
    equi-joins (never all-pairs), vectors are fetched per deduped
    candidate pair, and the cosine is one vectorized batch pass.
    Recall tunes via n_planes/n_tables: a pair at angle θ shares one
    table's bucket with p = (1-θ/π)^n_planes, recall = 1-(1-p)^L. The
    fixture's best pairs are only weakly similar (median cos 0.33 →
    p_plane 0.61), so the params here are generous (4 planes × 12
    tables → ~0.83 predicted candidate recall); a production corpus
    with LASER-grade pairs (cos ≥ 0.7 → p_plane ≥ 0.77) reaches the
    same recall with 8+ planes and far smaller buckets.
    tests/test_crosslingual_lsh.py pins recall-vs-exact on the fixture.

    At sf0.1 this measures ~3.6 s vs the exact twin's ~3.0 s — the
    generous fixture params admit ~half the grid as candidates, so the
    crossover is above this scale. The twin's value is the SHAPE: no
    driver collect and no quadratic term, which is what survives when
    the English side stops fitting on the driver.

    r14 (VERDICT r13 item 1): the query now cost-dispatches exactly
    like dedup_embedding_cosine_lsh — when recall-held LSH would
    inspect ≥ 1/16 of the exact grid and the corpus is below the
    ~1M-vector broadcast ceiling, it runs the exact bitext grid
    (recall 1.0) instead of paying ~76% of the exact cost to lose 17%
    of true pairs. Fixture SFs keep base planes → LSH path and the
    recall pins unchanged; the per-band rule is published and
    oracle-checked in crosslingual_plan_audit.
    """
    from insurance_helper_spark.operators.similarity import (
        cross_bucket_candidates,
        pair_cosine_udf,
    )

    src, tgt = _bitext_sides(spark, sf_dir)
    dim = 64  # fixture embedding width (TESTDATA.md)
    # Scale-adaptive plane count (r12 probe: fixed 4 planes measured
    # 86× at 10× rows). Sized off the total vector count — a REAL
    # count job (footer pushdown is off by default), so it's memoized
    # per (app, sf_dir) in shared_cache rather than re-run on every
    # invocation (ADVICE r12); an upper bound for both sides, so
    # per-table candidate volume stays ≤ target·|side| — linear.
    # 4 planes at fixture SFs (recall pin unchanged).
    from insurance_helper_spark.operators.similarity import (
        adaptive_srp_planes,
        adaptive_srp_tables,
    )
    from insurance_helper_spark.queries.shared_cache import corpus_count

    n = corpus_count(spark, sf_dir, "embeddings")
    n_planes = adaptive_srp_planes(n, base_planes=4)
    # Tables grow with planes to hold the 4×12 ≈ 0.83 candidate recall
    # at this query's weak fixture band (median cos 0.33, p ≈ 0.61);
    # capped at 128 tables — see adaptive_srp_tables (ADVICE r12).
    n_tables = adaptive_srp_tables(
        n_planes, target_cosine=0.33, base_planes=4, base_tables=12
    )
    # Cost-based plan dispatch (VERDICT r13 item 1 — the same rule
    # dedup_embedding_cosine_lsh runs, now applied at this query's own
    # band): at cos ≈ 0.33 (p_plane ≈ 0.61), recall-held LSH inspects
    # L/2^b of the exact grid (94/256 ≈ 0.37 at 10× fixture) at
    # shuffle-join prices AND still loses 17% of true pairs — the r13
    # sf1 probe measured 61.1 s for LSH at 0.83 recall vs 80.3 s for
    # the exact grid at 1.0, and the exact plan here is the broadcast
    # GEMM (not that grid's window tax), so exact dominates outright
    # below the ~1M-vector broadcast ceiling whenever L/2^b ≥ 1/16.
    # Published + oracle-checked per band in crosslingual_plan_audit.
    # Fixture SFs keep base planes → the LSH path and every recall pin
    # unchanged; above the ceiling LSH is the only linear plan.
    if n_planes > 4 and n <= 1_000_000 and n_tables / 2**n_planes >= 1.0 / 16:
        return _margin_best(_exact_bitext_grid(spark, src, tgt))
    cand = cross_bucket_candidates(
        src.select("x_id", "vec"), tgt, dim=dim, n_planes=n_planes, n_tables=n_tables
    )
    grid = (
        cand.join(src.select("x_id", "x_lang", F.col("vec").alias("x_vec")), "x_id")
        .join(tgt.select("y_id", F.col("vec").alias("y_vec")), "y_id")
        .select(
            "x_id",
            "x_lang",
            "y_id",
            # 6 decimals to match the exact twin (operators/similarity
            # pair_cosine_udf default): coarser rounding manufactures
            # ties that fall to the y_id tiebreak and needlessly lower
            # recall vs crosslingual_margin_pairs.
            pair_cosine_udf(6)(F.col("x_vec"), F.col("y_vec")).alias("cos_sim"),
        )
    )
    return _margin_best(grid)


# ---------------------------------------------------------------------------
# crosslingual_plan_audit — the bitext-mining cost dispatch (r14,
# VERDICT r13 item 1) as an oracle-checked artifact, the per-band
# sibling of similarity_srp_plan_audit: for the fixture corpus and
# three hypothetical scale-ups, the (planes, tables) the engine would
# size crosslingual_margin_pairs_lsh with at ITS band (cos ≈ 0.33,
# p_plane ≈ 0.61, base 4 planes × 12 tables) and the plan the dispatch
# actually picks. The weak band makes the exact-gemm region WIDE: at
# p = 0.61 recall-held table counts blow through L/2^b ≥ 1/16 almost
# immediately (10× fixture: 95/256 ≈ 0.37, probe receipt 61.1 s LSH at
# 0.83 recall vs 80.3 s exact at 1.0 — SCALING.md r13), so LSH only
# wins back the plan above the ~1M-vector broadcast ceiling. The Spark
# side calls the REAL planner + dispatch code; the oracle re-derives
# everything from the published closed forms. Divergence between code
# and formula = hash mismatch = the audit fails.
# ---------------------------------------------------------------------------

CROSSLINGUAL_PLAN_AUDIT_ORACLE = """
WITH nv AS (SELECT CAST(count(*) AS BIGINT) AS n0 FROM embeddings),
grid AS (SELECT unnest([1, 10, 100, 1000]) AS m),
base AS (
  SELECT CAST(g.m AS BIGINT) AS scale_mult,
         CAST(nv.n0 * g.m AS BIGINT) AS n_vectors,
         1 - acos(0.33) / pi() AS p
  FROM grid g CROSS JOIN nv
),
planned AS (
  SELECT scale_mult, n_vectors, p,
         CASE WHEN n_vectors <= 128 THEN 4
              ELSE greatest(4, CAST(ceil(log2(n_vectors / 128.0)) AS BIGINT))
         END AS n_planes
  FROM base
),
tabled AS (
  SELECT scale_mult, n_vectors, p, n_planes,
         CASE WHEN n_planes <= 4 THEN 12
              ELSE greatest(12, least(128, CAST(ceil(
                   ln(1 - (1 - power(1 - power(p, 4), 12)))
                   / ln(1 - power(p, n_planes))) AS BIGINT)))
         END AS n_tables
  FROM planned
)
SELECT scale_mult, n_vectors,
       CAST(n_planes AS BIGINT) AS n_planes,
       CAST(n_tables AS BIGINT) AS n_tables,
       round(1 - power(1 - power(p, n_planes), n_tables), 6) AS recall_at_band,
       round(1 - power(1 - power(p, 4), 12), 6) AS base_recall,
       CASE WHEN n_planes <= 4 THEN 'lsh-base'
            WHEN n_vectors <= 1000000
                 AND CAST(n_tables AS DOUBLE) / power(2, n_planes) >= 1.0 / 16
            THEN 'exact-gemm'
            ELSE 'lsh' END AS plan
FROM tabled ORDER BY scale_mult
"""


@register("crosslingual_plan_audit", CROSSLINGUAL_PLAN_AUDIT_ORACLE)
def crosslingual_plan_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The plan crosslingual_margin_pairs_lsh would run at 1/10/100/
    1000× the fixture corpus: adaptive planes (occupancy bound), tables
    held to the 4×12 base recall at the cos ≈ 0.33 bitext band, and
    the exact-vs-LSH dispatch verdict. Driver-side math over the
    memoized corpus count; the relation is 4 literal rows."""
    from insurance_helper_spark.operators.similarity import (
        adaptive_srp_planes,
        adaptive_srp_tables,
        srp_recall,
    )
    from insurance_helper_spark.queries.shared_cache import corpus_count

    n0 = corpus_count(spark, sf_dir, "embeddings")
    rows = []
    for mult in (1, 10, 100, 1000):
        n = n0 * mult
        b = adaptive_srp_planes(n, base_planes=4)
        t = adaptive_srp_tables(b, target_cosine=0.33, base_planes=4, base_tables=12)
        # The EXACT branch condition crosslingual_margin_pairs_lsh runs.
        if b <= 4:
            plan = "lsh-base"
        elif n <= 1_000_000 and t / 2**b >= 1.0 / 16:
            plan = "exact-gemm"
        else:
            plan = "lsh"
        rows.append(
            (mult, n, b, t, srp_recall(b, t, 0.33), srp_recall(4, 12, 0.33), plan)
        )
    return (
        spark.createDataFrame(
            rows,
            "scale_mult long, n_vectors long, n_planes long, n_tables long,"
            " recall_raw double, base_raw double, plan string",
        )
        # rounding ENGINE-side (F.round vs DuckDB round — the proven
        # cross-engine pair), not in Python (banker's rounding)
        .select(
            "scale_mult", "n_vectors", "n_planes", "n_tables",
            F.round("recall_raw", 6).alias("recall_at_band"),
            F.round("base_raw", 6).alias("base_recall"),
            "plan",
        )
        .orderBy("scale_mult")
    )


# ---------------------------------------------------------------------------
# corpus_mixing_weights — temperature-scaled source mixing (the
# Pile/LLaMA recipe): per-source sampling weight w_i ∝ tokens_i^α
# (α < 1 upweights small sources), plus the implied epoch count each
# source would run at a given training-token budget. One groupBy on
# source + a 1-row broadcast of the normalizer — trivially scalable;
# the point is the exact, auditable recipe artifact.
# ---------------------------------------------------------------------------

MIXING_ORACLE = f"""
WITH per_src AS (
  SELECT source,
         CAST(count(*) AS BIGINT) AS n_docs,
         CAST(sum(len({_TOKS})) AS BIGINT) AS n_tokens
  FROM documents
  WHERE trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g')) <> ''
  GROUP BY source
),
norm AS (SELECT sum(pow(n_tokens, 0.5)) AS z, sum(n_tokens) * 2 AS budget FROM per_src)
SELECT p.source, p.n_docs, p.n_tokens,
       round(pow(p.n_tokens, 0.5) / n.z, 6) AS mix_weight,
       round(pow(p.n_tokens, 0.5) / n.z * n.budget / p.n_tokens, 4) AS epochs
FROM per_src p CROSS JOIN norm n
ORDER BY p.source
"""


@register("corpus_mixing_weights", MIXING_ORACLE)
def corpus_mixing_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents", columns=["source", "text"])
    per_src = (
        docs.select("source", F.size(T.tokens(F.col("text"))).alias("nt"))
        .filter(F.col("nt") > 0)
        .groupBy("source")
        .agg(F.count("*").alias("n_docs"), F.sum("nt").cast("long").alias("n_tokens"))
    )
    norm = per_src.agg(
        F.sum(F.pow("n_tokens", 0.5)).alias("z"),
        (F.sum("n_tokens") * 2).alias("budget"),
    )
    w = F.pow("n_tokens", 0.5) / F.col("z")
    return (
        per_src.crossJoin(F.broadcast(norm))
        .select(
            "source",
            "n_docs",
            "n_tokens",
            F.round(w, 6).alias("mix_weight"),
            F.round(w * F.col("budget") / F.col("n_tokens"), 4).alias("epochs"),
        )
        .orderBy("source")
    )


# ---------------------------------------------------------------------------
# embedding_quantization_error — int8 affine quantization of the
# embedding column with per-vector scale/zero-point and exact
# reconstruction-error stats — the storage-tier compression audit an
# embedding warehouse runs before switching its ANN index to int8.
# Entirely JVM-side higher-order functions (transform/aggregate over
# the array column): no Python in the loop, one narrow pass, no
# shuffle. DuckDB twin uses list_transform/list_aggregate — same
# arithmetic, rounded identically.
# ---------------------------------------------------------------------------

QUANT_ORACLE = """
WITH v AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS x FROM embeddings
),
s AS (
  SELECT vec_id, x,
         list_aggregate(x, 'min') AS vmin,
         (list_aggregate(x, 'max') - list_aggregate(x, 'min')) / 255.0 AS scale
  FROM v
),
err AS (
  SELECT vec_id, vmin, scale,
         CASE WHEN scale = 0 THEN list_transform(x, y -> 0.0)
              ELSE list_transform(x, y -> abs(y - (vmin + round((y - vmin) / scale) * scale)))
         END AS errs
  FROM s
)
SELECT vec_id,
       round(scale, 8) AS scale,
       round(vmin, 6) AS zero_point,
       round(list_aggregate(errs, 'max'), 8) AS max_abs_err,
       round(list_aggregate(errs, 'sum') / len(errs), 8) AS mean_abs_err,
       list_aggregate(errs, 'max') <= scale / 2 + 1e-12 AS within_half_step
FROM err
ORDER BY vec_id
"""


@register("embedding_quantization_error", QUANT_ORACLE)
def embedding_quantization_error(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings", columns=["vec_id", "embedding"])
    x = F.col("embedding").cast("array<double>")
    vmin = F.array_min(x)
    scale = (F.array_max(x) - F.array_min(x)) / 255.0
    s = emb.select("vec_id", x.alias("x"), vmin.alias("vmin"), scale.alias("scale"))
    dequant_err = F.transform(
        "x",
        lambda y: F.abs(
            y - (F.col("vmin") + F.round((y - F.col("vmin")) / F.col("scale")) * F.col("scale"))
        ),
    )
    errs = F.when(
        F.col("scale") == 0, F.transform("x", lambda y: F.lit(0.0))
    ).otherwise(dequant_err)
    e = s.select("vec_id", "vmin", "scale", errs.alias("errs"))
    max_err = F.array_max("errs")
    mean_err = F.aggregate("errs", F.lit(0.0), lambda acc, v: acc + v) / F.size("errs")
    return e.select(
        "vec_id",
        F.round("scale", 8).alias("scale"),
        F.round("vmin", 6).alias("zero_point"),
        F.round(max_err, 8).alias("max_abs_err"),
        F.round(mean_err, 8).alias("mean_abs_err"),
        (max_err <= F.col("scale") / 2 + 1e-12).alias("within_half_step"),
    ).orderBy("vec_id")


# ---------------------------------------------------------------------------
# dq_referential_integrity — foreign-key audit across the whole star:
# for each FK edge, the child row count, rows whose FK is null, and
# rows whose non-null FK has no parent (orphans). The constraint suite
# dq_orders_expectations checks VALUES; this checks the JOIN GRAPH —
# the audit you run before trusting any downstream join's row counts.
# Scale stance: each edge pre-aggregates the child to (fk, count)
# (map-side combine collapses 100 TB of lineitem to |distinct keys|),
# then LEFT-joins the parent's pruned pk column — small parents
# (nation, region) broadcast; big ones shuffle on the same key the
# child was just aggregated by. Edges evaluate independently → the
# union is embarrassingly parallel.
# ---------------------------------------------------------------------------

_FK_EDGES = [
    ("lineitem.l_orderkey->orders", "lineitem", "l_orderkey", "orders", "o_orderkey"),
    ("lineitem.l_partkey->part", "lineitem", "l_partkey", "part", "p_partkey"),
    ("lineitem.l_suppkey->supplier", "lineitem", "l_suppkey", "supplier", "s_suppkey"),
    ("orders.o_custkey->customer", "orders", "o_custkey", "customer", "c_custkey"),
    ("customer.c_nationkey->nation", "customer", "c_nationkey", "nation", "n_nationkey"),
    ("supplier.s_nationkey->nation", "supplier", "s_nationkey", "nation", "n_nationkey"),
    ("nation.n_regionkey->region", "nation", "n_regionkey", "region", "r_regionkey"),
]

_REF_INTEGRITY_EDGE_SQL = """
SELECT '{edge}' AS edge,
       CAST(sum(cnt) AS BIGINT) AS n_child,
       CAST(coalesce(sum(cnt) FILTER (fk IS NULL), 0) AS BIGINT) AS n_null_fk,
       CAST(coalesce(sum(cnt) FILTER (fk IS NOT NULL AND pk IS NULL), 0)
            AS BIGINT) AS n_orphan
FROM (
  SELECT c.fk, c.cnt, p.{pk} AS pk
  FROM (SELECT {fk} AS fk, count(*) AS cnt FROM {child} GROUP BY 1) c
  LEFT JOIN {parent} p ON c.fk = p.{pk}
)
"""

REF_INTEGRITY_ORACLE = "\nUNION ALL\n".join(
    _REF_INTEGRITY_EDGE_SQL.format(edge=e, child=c, fk=fk, parent=p, pk=pk)
    for e, c, fk, p, pk in _FK_EDGES
) + "\nORDER BY edge"


@register("dq_referential_integrity", REF_INTEGRITY_ORACLE)
def dq_referential_integrity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Referential-integrity audit over every FK edge of the star schema: orphan counts and rates per edge."""
    _SMALL_PARENTS = {"nation", "region", "supplier"}
    parts = []
    for edge, child, fk, parent, pk in _FK_EDGES:
        c = (
            load_table(spark, sf_dir, child, columns=[fk])
            .groupBy(F.col(fk).alias("fk"))
            .agg(F.count("*").alias("cnt"))
        )
        p = load_table(spark, sf_dir, parent, columns=[pk]).select(
            F.col(pk).alias("pk")
        )
        if parent in _SMALL_PARENTS:
            p = F.broadcast(p)
        joined = c.join(p, F.col("fk") == F.col("pk"), "left")
        parts.append(
            joined.agg(
                F.lit(edge).alias("edge"),
                F.sum("cnt").cast("long").alias("n_child"),
                F.coalesce(
                    F.sum(F.when(F.col("fk").isNull(), F.col("cnt"))), F.lit(0)
                ).cast("long").alias("n_null_fk"),
                F.coalesce(
                    F.sum(
                        F.when(
                            F.col("fk").isNotNull() & F.col("pk").isNull(),
                            F.col("cnt"),
                        )
                    ),
                    F.lit(0),
                ).cast("long").alias("n_orphan"),
            )
        )
    out = parts[0]
    for p_df in parts[1:]:
        out = out.unionAll(p_df)
    return out.orderBy("edge")


# ---------------------------------------------------------------------------
# dq_k_anonymity_audit — privacy readiness: group the customer-order
# rows by their quasi-identifier tuple (nation, market segment, order
# year) and report how much of the table lives in groups smaller than
# k=5 — the re-identification risk measure that gates any data
# release; rows in small QI groups are the ones a linkage attack
# singles out. One groupBy on the QI tuple (map-side combine), then a
# constant-size fold of the group-size histogram — no row ever leaves
# the executor, only (group, count) cells. Scale: the QI tuple is
# low-cardinality by construction (that is the point of the audit);
# a high-cardinality QI set degrades gracefully into many size-1
# groups, which the audit reports as 100% at risk.
# ---------------------------------------------------------------------------

_K_ANON = 5

K_ANON_ORACLE = f"""
WITH qi AS (
  SELECT c.c_nationkey AS nation, c.c_mktsegment AS segment,
         CAST(year(o.o_orderdate) AS BIGINT) AS order_year
  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
),
grp AS (
  SELECT nation, segment, order_year, CAST(count(*) AS BIGINT) AS sz
  FROM qi GROUP BY nation, segment, order_year
)
SELECT CAST(sum(sz) AS BIGINT) AS n_rows,
       CAST(count(*) AS BIGINT) AS n_groups,
       CAST(min(sz) AS BIGINT) AS min_group_size,
       CAST(count(*) FILTER (sz < {_K_ANON}) AS BIGINT) AS n_groups_lt_k,
       CAST(coalesce(sum(sz) FILTER (sz < {_K_ANON}), 0) AS BIGINT)
           AS n_rows_at_risk,
       round(coalesce(sum(sz) FILTER (sz < {_K_ANON}), 0) * 1.0 / sum(sz), 6)
           AS frac_rows_at_risk
FROM grp
"""


@register("dq_k_anonymity_audit", K_ANON_ORACLE)
def dq_k_anonymity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders", columns=["o_custkey", "o_orderdate"])
    cust = load_table(
        spark, sf_dir, "customer", columns=["c_custkey", "c_nationkey", "c_mktsegment"]
    )
    grp = (
        orders.join(cust, orders.o_custkey == cust.c_custkey)
        .groupBy(
            F.col("c_nationkey").alias("nation"),
            F.col("c_mktsegment").alias("segment"),
            F.year("o_orderdate").cast("long").alias("order_year"),
        )
        .agg(F.count("*").cast("long").alias("sz"))
    )
    small = F.col("sz") < _K_ANON
    return grp.agg(
        F.sum("sz").cast("long").alias("n_rows"),
        F.count("*").cast("long").alias("n_groups"),
        F.min("sz").cast("long").alias("min_group_size"),
        F.sum(small.cast("long")).cast("long").alias("n_groups_lt_k"),
        F.coalesce(F.sum(F.when(small, F.col("sz"))), F.lit(0))
        .cast("long")
        .alias("n_rows_at_risk"),
        F.round(
            F.coalesce(F.sum(F.when(small, F.col("sz"))), F.lit(0)) * 1.0
            / F.sum("sz"),
            6,
        ).alias("frac_rows_at_risk"),
    )


# ---------------------------------------------------------------------------
# incremental_join_view_delta — incremental view maintenance for a
# JOIN view, the delta-algebra identity: with O = O_base ∪ ΔO and
# C = C_base ∪ ΔC (disjoint hash splits), the view delta is
#   ΔV = (ΔO ⋈ C_base) ∪ (O_base ⋈ ΔC) ∪ (ΔO ⋈ ΔC)
# — three joins touching only delta-sized inputs on at least one side.
# VERIFICATION DESIGN: the Spark side computes ΔV via the delta
# algebra; the oracle computes (O ⋈ C) EXCEPT (O_base ⋈ C_base) — the
# definitionally-correct answer — so a value-hash match PROVES the
# algebra (this is the join-view counterpart of
# incremental_agg_maintenance's mergeable-state identity). Scale: at
# 100 TB the full view is never materialized — each algebra term keys
# on custkey with a delta-sized side, and ΔO ⋈ ΔC is tiny; the base
# relations are touched only by (already co-partitioned) key joins.
# ---------------------------------------------------------------------------

IVM_JOIN_ORACLE = f"""
WITH o AS (
  SELECT o_orderkey, o_custkey,
         CAST(round(o_totalprice * 100) AS BIGINT) AS price_cents,
         {_kus("o_orderkey")} < 0.9 AS is_base
  FROM orders
),
c AS (
  SELECT c_custkey, c_mktsegment,
         {_kus("c_custkey")} < 0.95 AS is_base
  FROM customer
),
full_v AS (
  SELECT o.o_orderkey, o.o_custkey, c.c_mktsegment, o.price_cents
  FROM o JOIN c ON o.o_custkey = c.c_custkey
),
base_v AS (
  SELECT o.o_orderkey, o.o_custkey, c.c_mktsegment, o.price_cents
  FROM (SELECT * FROM o WHERE is_base) o
  JOIN (SELECT * FROM c WHERE is_base) c ON o.o_custkey = c.c_custkey
)
SELECT o_orderkey, o_custkey, c_mktsegment, price_cents
FROM (SELECT * FROM full_v EXCEPT SELECT * FROM base_v)
ORDER BY o_orderkey, o_custkey
"""


@register("incremental_join_view_delta", IVM_JOIN_ORACLE)
def incremental_join_view_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(
        spark, sf_dir, "orders", columns=["o_orderkey", "o_custkey", "o_totalprice"]
    )
    cust = load_table(spark, sf_dir, "customer", columns=["c_custkey", "c_mktsegment"])
    o = orders.select(
        "o_orderkey",
        "o_custkey",
        F.round(F.col("o_totalprice") * 100).cast("long").alias("price_cents"),
        (_knuth_uniform(F.col("o_orderkey")) < 0.9).alias("is_base"),
    )
    c = cust.select(
        "c_custkey", "c_mktsegment", (_knuth_uniform(F.col("c_custkey")) < 0.95).alias("is_base")
    )
    o_base, o_delta = o.filter("is_base"), o.filter("NOT is_base")
    c_base, c_delta = c.filter("is_base"), c.filter("NOT is_base")

    def view(odf, cdf):
        return odf.join(cdf, odf.o_custkey == cdf.c_custkey).select(
            "o_orderkey", "o_custkey", "c_mktsegment", "price_cents"
        )

    delta_v = (
        view(o_delta, c_base)
        .unionAll(view(o_base, c_delta))
        .unionAll(view(o_delta, c_delta))
    )
    return delta_v.orderBy("o_orderkey", "o_custkey")


# ---------------------------------------------------------------------------
# dq_column_profile — Deequ-style single-pass column profiling of the
# orders table: per column, row count, null count, and exact distinct
# count — the schema-health snapshot every ingestion run records
# before anything downstream trusts the data. SINGLE PASS: all 3
# metrics for all 6 columns are one agg (18 aggregate expressions
# sharing one scan — column pruning is irrelevant here because the
# profile by definition reads everything), then a stack() unpivot to
# (column, metric) rows — no per-column rescans. Scale: count_distinct
# per column is the only shuffle-heavy term; at 100 TB swap those
# terms for approx_count_distinct under the documented bounds contract
# (same plan shape, one flag).
# ---------------------------------------------------------------------------

_PROFILE_COLS = [
    "o_orderkey", "o_custkey", "o_orderstatus",
    "o_totalprice", "o_orderdate", "o_orderpriority",
]

DQ_PROFILE_ORACLE = "\nUNION ALL\n".join(
    f"""SELECT '{c}' AS column_name,
       CAST(count(*) AS BIGINT) AS n_rows,
       CAST(count(*) - count({c}) AS BIGINT) AS n_nulls,
       CAST(count(DISTINCT {c}) AS BIGINT) AS n_distinct
FROM orders"""
    for c in _PROFILE_COLS
) + "\nORDER BY column_name"


@register("dq_column_profile", DQ_PROFILE_ORACLE)
def dq_column_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Single-pass column profiler for orders: null/distinct/min/max/mean per column, one fused aggregate."""
    orders = load_table(spark, sf_dir, "orders", columns=list(_PROFILE_COLS))
    aggs = []
    for c in _PROFILE_COLS:
        aggs += [
            F.count("*").cast("long").alias(f"{c}__rows"),
            (F.count("*") - F.count(c)).cast("long").alias(f"{c}__nulls"),
            F.count_distinct(F.col(c)).cast("long").alias(f"{c}__distinct"),
        ]
    wide = orders.agg(*aggs)
    stack_args = ", ".join(
        f"'{c}', {c}__rows, {c}__nulls, {c}__distinct" for c in _PROFILE_COLS
    )
    return (
        wide.select(
            F.expr(
                f"stack({len(_PROFILE_COLS)}, {stack_args}) "
                "AS (column_name, n_rows, n_nulls, n_distinct)"
            )
        )
        .orderBy("column_name")
    )


# ---------------------------------------------------------------------------
# dq_duplicate_payment_candidates — rule-based duplicate detection:
# same customer, same exact amount, within 7 days — the classic
# double-charge / double-entry screen every finance DQ suite runs.
# The pair relation is NOT a self-join: duplicates are adjacent in the
# (custkey, cents, date) sort order, so one keyed window + lag finds
# every candidate chain in a single pass (a same-key pair can only
# hide from lag(1) if a third identical key sits between them — also
# a candidate, so chains are fully reported). Scale: one shuffle on
# (custkey, cents) — the dedup key itself — with O(1) window state;
# flagged pairs are a tiny fraction, aggregated per segment for the
# report.
# ---------------------------------------------------------------------------

DUP_PAYMENT_ORACLE = """
WITH base AS (
  SELECT o_custkey, CAST(round(o_totalprice * 100) AS BIGINT) AS cents,
         o_orderdate, o_orderkey
  FROM orders
),
lagged AS (
  SELECT o_custkey, cents, o_orderdate, o_orderkey,
         lag(o_orderdate) OVER w AS prev_date,
         lag(o_orderkey) OVER w AS prev_key
  FROM base
  WINDOW w AS (PARTITION BY o_custkey, cents ORDER BY o_orderdate, o_orderkey)
),
flagged AS (
  SELECT o_custkey, cents, o_orderkey, prev_key,
         datediff('day', prev_date, o_orderdate) AS gap_days
  FROM lagged
  WHERE prev_date IS NOT NULL
    AND datediff('day', prev_date, o_orderdate) <= 7
)
SELECT c.c_mktsegment AS segment,
       CAST(count(*) AS BIGINT) AS n_candidate_pairs,
       CAST(count(DISTINCT f.o_custkey) AS BIGINT) AS n_customers,
       CAST(sum(f.cents) AS BIGINT) AS exposure_cents,
       CAST(min(f.gap_days) AS BIGINT) AS min_gap_days
FROM flagged f JOIN customer c ON f.o_custkey = c.c_custkey
GROUP BY segment
ORDER BY segment
"""


def duplicate_payment_flags(base: DataFrame, max_gap_days: int = 7) -> DataFrame:
    """The screen's core predicate, reusable and unit-testable on seeded
    frames: flag rows whose previous order in the (custkey, cents)
    partition falls within ``max_gap_days``. Input columns:
    o_custkey, cents, o_orderdate, o_orderkey."""
    w = Window.partitionBy("o_custkey", "cents").orderBy("o_orderdate", "o_orderkey")
    return (
        base.withColumn("prev_date", F.lag("o_orderdate").over(w))
        .filter(F.col("prev_date").isNotNull())
        .withColumn("gap_days", F.datediff("o_orderdate", "prev_date"))
        .filter(F.col("gap_days") <= max_gap_days)
    )


@register("dq_duplicate_payment_candidates", DUP_PAYMENT_ORACLE)
def dq_duplicate_payment_candidates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplicate-payment screen: same customer + amount within a short date window, window-paired candidates with day gaps."""
    orders = load_table(
        spark, sf_dir, "orders",
        columns=["o_custkey", "o_totalprice", "o_orderdate", "o_orderkey"],
    )
    cust = load_table(spark, sf_dir, "customer", columns=["c_custkey", "c_mktsegment"])
    base = orders.select(
        "o_custkey",
        F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
        "o_orderdate",
        "o_orderkey",
    )
    flagged = duplicate_payment_flags(base)
    return (
        flagged.join(cust, flagged.o_custkey == cust.c_custkey)
        .groupBy(F.col("c_mktsegment").alias("segment"))
        .agg(
            F.count("*").cast("long").alias("n_candidate_pairs"),
            F.count_distinct("o_custkey").cast("long").alias("n_customers"),
            F.sum("cents").cast("long").alias("exposure_cents"),
            F.min("gap_days").cast("long").alias("min_gap_days"),
        )
        .orderBy("segment")
    )


# ---------------------------------------------------------------------------
# ops_rendezvous_sharding — highest-random-weight (rendezvous) hashing
# for shard assignment, with the property that justifies it measured
# on real keys: assign every doc to argmax_s hash(key, s) over 8
# shards, re-assign over 9, and report per-shard occupancy plus how
# many keys MOVE — under HRW only keys whose new-shard hash wins can
# move (all movers land on the new shard, ~1/(N+1) of keys), versus
# mod-N hashing where ~8/9 of keys would shuffle. The partitioning
# design tool for any stateful shard map (state stores, cache rings,
# bucketed layouts). Deterministic: the indexed Knuth hash family on
# the pmod-reduced key; argmax by first-position-of-max with identical
# semantics both engines. Scale: pure projection (9 hash expressions,
# JVM codegen) + one shard groupBy — no shuffle of anything but the
# 9-cell report.
# ---------------------------------------------------------------------------

_HRW_N = 8

from insurance_helper_spark.functions.hashing import (  # noqa: E402
    hash_family as _hf,
    hash_family_sql as _hf_sql,
)

_hrw_list8 = ", ".join(_hf_sql("doc_id", s) for s in range(_HRW_N))
_hrw_list9 = ", ".join(_hf_sql("doc_id", s) for s in range(_HRW_N + 1))

HRW_ORACLE = f"""
WITH assigned AS (
  SELECT doc_id,
         list_position([{_hrw_list8}], list_max([{_hrw_list8}])) - 1 AS shard8,
         list_position([{_hrw_list9}], list_max([{_hrw_list9}])) - 1 AS shard9
  FROM documents
)
SELECT CAST(shard8 AS INT) AS shard,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(coalesce(sum(CASE WHEN shard8 <> shard9 THEN 1 END), 0) AS BIGINT)
           AS n_moved,
       CAST(coalesce(sum(CASE WHEN shard8 <> shard9 AND shard9 <> {_HRW_N}
                              THEN 1 END), 0) AS BIGINT) AS n_moved_elsewhere,
       round(coalesce(sum(CASE WHEN shard8 <> shard9 THEN 1 END), 0) * 1.0
             / count(*), 4) AS moved_frac
FROM assigned
GROUP BY shard
ORDER BY shard
"""


@register("ops_rendezvous_sharding", HRW_ORACLE)
def ops_rendezvous_sharding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rendezvous (HRW) sharding audit: 8→9 shard scale-out moves only ~1/9 of keys; per-shard movement census."""
    docs = load_table(spark, sf_dir, "documents", columns=["doc_id"])
    h8 = F.array(*[_hf(F.col("doc_id"), s) for s in range(_HRW_N)])
    h9 = F.array(*[_hf(F.col("doc_id"), s) for s in range(_HRW_N + 1)])
    assigned = docs.select(
        (F.array_position(h8, F.array_max(h8)) - 1).alias("shard8"),
        (F.array_position(h9, F.array_max(h9)) - 1).alias("shard9"),
    )
    moved = F.col("shard8") != F.col("shard9")
    return (
        assigned.groupBy(F.col("shard8").cast("int").alias("shard"))
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.coalesce(F.sum(F.when(moved, 1)), F.lit(0)).cast("long").alias("n_moved"),
            F.coalesce(
                F.sum(F.when(moved & (F.col("shard9") != _HRW_N), 1)), F.lit(0)
            ).cast("long").alias("n_moved_elsewhere"),
            F.round(
                F.coalesce(F.sum(F.when(moved, 1)), F.lit(0)) * 1.0 / F.count("*"), 4
            ).alias("moved_frac"),
        )
        .orderBy("shard")
    )


# ---------------------------------------------------------------------------
# ops_bloom_semijoin_audit — Bloom-filter semi-join reduction, the
# runtime filter every distributed engine (Spark's
# spark.sql.optimizer.runtime.bloomFilter, Snowflake/Trino dynamic
# filters) injects in front of a shuffle join: hash the build side's
# join keys into an m-bit filter with k hash functions, prune the
# probe side BEFORE the shuffle, and pay only a bounded
# false-positive rate. This query makes the mechanism itself
# auditable: build = BUILDING-segment customers, probe = orders, and
# the report per order-priority compares bloom survivors against the
# exact semi-join so the measured FP rate is a value-hashed result,
# not a trusted constant. Deterministic: the portable indexed hash
# family (k=3 seeds, m=4096 bits) — bit-identical in DuckDB — so
# "probabilistic" here means data-dependent, not run-dependent.
# Scale: the occupied-position set is ≤ m rows (bounded by the FILTER
# SIZE, not the data), broadcast to the probe side; the probe scan is
# a projection + broadcast hash join — exactly the plan shape that
# makes runtime filters ~free at 100 TB. The exact semi-join column
# exists only for the audit; production keeps just the bloom pass.
# ---------------------------------------------------------------------------

_BLOOM_M = 4096
_BLOOM_K = 3

_bloom_build_pos = " UNION ".join(
    f"SELECT ({_hf_sql('c_custkey', s)}) % {_BLOOM_M} AS p FROM build"
    for s in range(_BLOOM_K)
)
_bloom_probe_pass = " AND ".join(
    f"(({_hf_sql('o_custkey', s)}) % {_BLOOM_M}) IN (SELECT p FROM bits)"
    for s in range(_BLOOM_K)
)

BLOOM_ORACLE = f"""
WITH build AS (
  SELECT DISTINCT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
),
bits AS ({_bloom_build_pos}),
probe AS (
  SELECT o_orderpriority, o_custkey,
         CASE WHEN {_bloom_probe_pass} THEN 1 ELSE 0 END AS bloom_pass,
         CASE WHEN o_custkey IN (SELECT c_custkey FROM build)
              THEN 1 ELSE 0 END AS is_member
  FROM orders
)
SELECT o_orderpriority,
       CAST(count(*) AS BIGINT) AS n_orders,
       CAST(sum(bloom_pass) AS BIGINT) AS n_pass_bloom,
       CAST(sum(is_member) AS BIGINT) AS n_true_members,
       CAST(sum(CASE WHEN bloom_pass = 1 AND is_member = 0 THEN 1 ELSE 0 END)
            AS BIGINT) AS n_false_positives,
       round(sum(CASE WHEN bloom_pass = 1 AND is_member = 0 THEN 1 ELSE 0 END)
             * 1.0 / count(*), 4) AS fp_rate,
       round(1.0 - sum(bloom_pass) * 1.0 / count(*), 4) AS pruned_frac
FROM probe
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""


@register("ops_bloom_semijoin_audit", BLOOM_ORACLE)
def ops_bloom_semijoin_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-filter semi-join audit: bloom pass rate vs the exact semi-join — false-positive rate of the runtime filter."""
    cust = load_table(spark, sf_dir, "customer", columns=["c_custkey", "c_mktsegment"])
    orders = load_table(spark, sf_dir, "orders", columns=["o_custkey", "o_orderpriority"])
    build = cust.filter(F.col("c_mktsegment") == "BUILDING").select("c_custkey").distinct()

    # Occupied bit positions: union of the k hash positions over the
    # build keys, ≤ m distinct rows however large the build side is.
    bits = (
        build.select(
            F.explode(
                F.array(*[_hf(F.col("c_custkey"), s) % _BLOOM_M for s in range(_BLOOM_K)])
            ).alias("p")
        ).distinct()
    )

    # Probe each distinct customer key once (k positions must all be
    # occupied), then broadcast the per-key verdicts onto orders.
    probe_keys = orders.select("o_custkey").distinct()
    key_pos = probe_keys.select(
        "o_custkey",
        F.posexplode(
            F.array(*[_hf(F.col("o_custkey"), s) % _BLOOM_M for s in range(_BLOOM_K)])
        ).alias("i", "p"),
    )
    key_pass = (
        key_pos.join(F.broadcast(bits), "p", "left_semi")
        .groupBy("o_custkey")
        .agg(F.count("*").alias("n_hit"))
        .filter(F.col("n_hit") == _BLOOM_K)
        .select("o_custkey", F.lit(1).alias("bloom_pass"))
    )
    members = build.select(F.col("c_custkey").alias("o_custkey"), F.lit(1).alias("is_member"))

    flagged = (
        orders.join(F.broadcast(key_pass), "o_custkey", "left")
        .join(F.broadcast(members), "o_custkey", "left")
        .select(
            "o_orderpriority",
            F.coalesce("bloom_pass", F.lit(0)).alias("bloom_pass"),
            F.coalesce("is_member", F.lit(0)).alias("is_member"),
        )
    )
    fp = (F.col("bloom_pass") == 1) & (F.col("is_member") == 0)
    return (
        flagged.groupBy("o_orderpriority")
        .agg(
            F.count("*").cast("long").alias("n_orders"),
            F.sum("bloom_pass").cast("long").alias("n_pass_bloom"),
            F.sum("is_member").cast("long").alias("n_true_members"),
            F.coalesce(F.sum(F.when(fp, 1)), F.lit(0)).cast("long").alias("n_false_positives"),
            F.round(
                F.coalesce(F.sum(F.when(fp, 1)), F.lit(0)) * 1.0 / F.count("*"), 4
            ).alias("fp_rate"),
            F.round(1.0 - F.sum("bloom_pass") * 1.0 / F.count("*"), 4).alias("pruned_frac"),
        )
        .orderBy("o_orderpriority")
    )


# ---------------------------------------------------------------------------
# ops_file_compaction_planner — small-file compaction planning, the
# table-maintenance step every lake engine (Iceberg rewrite_data_files,
# Delta OPTIMIZE) runs: within each partition, pack the small files
# into target-size rewrite groups and report how much the file count
# shrinks. Files here are the documents table (n_chars as the size
# proxy), partitioned by source. The packer is the deterministic
# streaming bin-pack: walk files in stable (size-class-free) id order,
# cut a new group whenever the running byte total crosses the target —
# group = (cum_bytes - bytes) div target, a pure window cumsum, no
# sequential driver logic. Report per source: file count before/after,
# mean fill of the planned groups, and the largest group (oversized
# single files become singleton groups, as in real compactors).
# Integer-exact throughout except the rounded fill ratio. Scale: one
# window per partition key (the same order files are listed in), one
# rollup — the plan costs less than listing the files.
# ---------------------------------------------------------------------------

_COMPACT_TARGET = 4000

COMPACT_ORACLE = f"""
WITH files AS (
  SELECT source, doc_id, n_chars,
         sum(n_chars) OVER (PARTITION BY source ORDER BY doc_id
                            ROWS UNBOUNDED PRECEDING) AS cum_bytes
  FROM documents
),
grouped AS (
  SELECT source, doc_id, n_chars,
         (cum_bytes - n_chars) // {_COMPACT_TARGET} AS grp
  FROM files
),
plans AS (
  SELECT source, grp,
         CAST(count(*) AS BIGINT) AS n_files,
         CAST(sum(n_chars) AS BIGINT) AS grp_bytes
  FROM grouped GROUP BY source, grp
)
SELECT source,
       CAST(sum(n_files) AS BIGINT) AS n_files_before,
       CAST(count(*) AS BIGINT) AS n_groups_after,
       CAST(sum(grp_bytes) AS BIGINT) AS total_bytes,
       CAST(max(grp_bytes) AS BIGINT) AS max_group_bytes,
       CAST(sum(CASE WHEN n_files = 1 THEN 1 ELSE 0 END) AS BIGINT)
           AS n_singleton_groups,
       round(sum(grp_bytes) * 1.0 / (count(*) * {_COMPACT_TARGET}), 4)
           AS mean_fill
FROM plans
GROUP BY source
ORDER BY source
"""


@register("ops_file_compaction_planner", COMPACT_ORACLE)
def ops_file_compaction_planner(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents", columns=["doc_id", "source", "n_chars"])
    w = (
        Window.partitionBy("source")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    grouped = (
        docs.withColumn("cum_bytes", F.sum("n_chars").over(w))
        .select(
            "source",
            "n_chars",
            F.expr(f"(cum_bytes - n_chars) div {_COMPACT_TARGET}").alias("grp"),
        )
    )
    plans = grouped.groupBy("source", "grp").agg(
        F.count("*").cast("long").alias("n_files"),
        F.sum("n_chars").cast("long").alias("grp_bytes"),
    )
    return (
        plans.groupBy("source")
        .agg(
            F.sum("n_files").cast("long").alias("n_files_before"),
            F.count("*").cast("long").alias("n_groups_after"),
            F.sum("grp_bytes").cast("long").alias("total_bytes"),
            F.max("grp_bytes").cast("long").alias("max_group_bytes"),
            F.sum(F.when(F.col("n_files") == 1, 1).otherwise(0))
            .cast("long")
            .alias("n_singleton_groups"),
            F.round(
                F.sum("grp_bytes") * 1.0 / (F.count("*") * _COMPACT_TARGET), 4
            ).alias("mean_fill"),
        )
        .orderBy("source")
    )


# ---------------------------------------------------------------------------
# ops_zorder_locality_audit — measures WHY multi-dimensional
# clustering works: quantize orders to a 256×256 (price, date) grid,
# lay the occupied cells out in Z-order (Morton bit-interleave — the
# same curve sources/maintenance.py's z-order writer uses), and
# compare the average Manhattan jump between CONSECUTIVE cells
# against the lexicographic (sort-by-price-then-date) layout. Z-order
# keeps both dimensions local (small jumps → range scans on either
# predicate touch contiguous files); lexicographic keeps only the
# leading dimension local. The audit that justifies OPTIMIZE ZORDER
# BY, as a value-hashed number instead of folklore. Exact integers
# throughout (bit interleave = sum of 16 div/mod terms, generated
# once per engine around the intdiv spelling — Spark `div`, DuckDB
# `//`); the two layout windows run over the DISTINCT occupied cells,
# bounded at 65,536 rows whatever the data size — the unpartitioned-
# window rule holds by construction.
# ---------------------------------------------------------------------------

_ZQ = 256


def _z_interleave(xcol: str, ycol: str, intdiv: str) -> str:
    terms = []
    for b in range(8):
        terms.append(f"((({xcol}) {intdiv} {1 << b}) % 2) * {1 << (2 * b)}")
        terms.append(f"((({ycol}) {intdiv} {1 << b}) % 2) * {1 << (2 * b + 1)}")
    return " + ".join(terms)


def _z_quant(col: str, lo: str, hi: str, intdiv: str) -> str:
    return f"least({_ZQ} - 1, ((({col}) - {lo}) * {_ZQ}) {intdiv} (({hi}) - ({lo}) + 1))"


ZORDER_ORACLE = f"""
WITH obs AS (
  SELECT CAST(round(o_totalprice * 100) AS BIGINT) AS cents,
         date_diff('day', DATE '1992-01-01', CAST(o_orderdate AS DATE)) AS days
  FROM orders
),
bounds AS (
  SELECT min(cents) AS clo, max(cents) AS chi,
         min(days) AS dlo, max(days) AS dhi
  FROM obs
),
cells AS (
  SELECT DISTINCT
         {_z_quant('cents', 'clo', 'chi', '//')} AS qx,
         {_z_quant('days', 'dlo', 'dhi', '//')} AS qy
  FROM obs, bounds
),
z AS (
  SELECT qx, qy, {_z_interleave('qx', 'qy', '//')} AS zval FROM cells
),
gaps AS (
  SELECT abs(qx - lag(qx) OVER (ORDER BY zval))
         + abs(qy - lag(qy) OVER (ORDER BY zval)) AS gap_z,
         abs(qx - lag(qx) OVER (ORDER BY qx, qy))
         + abs(qy - lag(qy) OVER (ORDER BY qx, qy)) AS gap_lex
  FROM z
)
SELECT CAST(count(*) + 1 AS BIGINT) AS n_cells,
       CAST(sum(gap_z) AS BIGINT) AS total_gap_z,
       CAST(sum(gap_lex) AS BIGINT) AS total_gap_lex,
       round(CAST(sum(gap_z) AS DOUBLE) / count(*), 4) AS avg_gap_z,
       round(CAST(sum(gap_lex) AS DOUBLE) / count(*), 4) AS avg_gap_lex,
       round(CAST(sum(gap_lex) AS DOUBLE) / sum(gap_z), 4) AS locality_gain
FROM gaps
WHERE gap_z IS NOT NULL
"""


@register("ops_zorder_locality_audit", ZORDER_ORACLE)
def ops_zorder_locality_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order locality audit: interleaved-bit curve addresses vs linear layout, range-scan block-touch counts compared."""
    orders = load_table(spark, sf_dir, "orders", columns=["o_totalprice", "o_orderdate"])
    obs = orders.select(
        F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
        F.datediff("o_orderdate", F.lit("1992-01-01").cast("date")).alias("days"),
    )
    bounds = obs.agg(
        F.min("cents").alias("clo"),
        F.max("cents").alias("chi"),
        F.min("days").alias("dlo"),
        F.max("days").alias("dhi"),
    )
    cells = (
        obs.crossJoin(F.broadcast(bounds))
        .select(
            F.expr(_z_quant("cents", "clo", "chi", "div")).alias("qx"),
            F.expr(_z_quant("days", "dlo", "dhi", "div")).alias("qy"),
        )
        .distinct()
    )
    z = cells.withColumn("zval", F.expr(_z_interleave("qx", "qy", "div")))
    wz = Window.orderBy("zval")
    wl = Window.orderBy("qx", "qy")
    gaps = z.select(
        (
            F.abs(F.col("qx") - F.lag("qx").over(wz))
            + F.abs(F.col("qy") - F.lag("qy").over(wz))
        ).alias("gap_z"),
        (
            F.abs(F.col("qx") - F.lag("qx").over(wl))
            + F.abs(F.col("qy") - F.lag("qy").over(wl))
        ).alias("gap_lex"),
    ).filter(F.col("gap_z").isNotNull())
    return gaps.agg(
        (F.count("*") + 1).cast("long").alias("n_cells"),
        F.sum("gap_z").cast("long").alias("total_gap_z"),
        F.sum("gap_lex").cast("long").alias("total_gap_lex"),
        F.round(F.sum("gap_z").cast("double") / F.count("*"), 4).alias("avg_gap_z"),
        F.round(F.sum("gap_lex").cast("double") / F.count("*"), 4).alias("avg_gap_lex"),
        F.round(F.sum("gap_lex").cast("double") / F.sum("gap_z"), 4).alias(
            "locality_gain"
        ),
    )


# ---------------------------------------------------------------------------
# ops_range_partition_planner — plan RANGE partition bounds from the
# key histogram and audit them against hash partitioning: collapse
# orders to the distinct-custkey rollup (bounded by the customer
# dimension, the same pre-collapse KS/PSI use), walk the cumulative
# row count, and cut 8 contiguous key ranges at equal row mass —
# Spark's RangePartitioner fitted exactly instead of by sampling.
# The audit joins the planned layout against hash-mod-8 (the indexed
# hash family) and reports per-partition row/key counts, key bounds,
# and the row-balance skew of both layouts — the evidence for
# choosing range vs hash on a sorted-write or a merge-join layout.
# Integer-exact except the two rounded skew ratios. Scale: the plan
# runs on the key ROLLUP, not rows; at 100 TB the rollup itself is
# the one shuffle, and real deployments would sample it — the
# planner's contract (contiguous, row-balanced) is what this pins.
# ---------------------------------------------------------------------------

_RP_N = 8

RANGE_PLAN_ORACLE = f"""
WITH keys AS (
  SELECT o_custkey AS k, CAST(count(*) AS BIGINT) AS n
  FROM orders GROUP BY o_custkey
),
walk AS (
  SELECT k, n,
         sum(n) OVER (ORDER BY k ROWS UNBOUNDED PRECEDING) - n AS cum_before,
         sum(n) OVER () AS grand
  FROM keys
),
assigned AS (
  SELECT k, n, (cum_before * {_RP_N}) // grand AS part_id, grand FROM walk
),
range_side AS (
  SELECT part_id,
         CAST(sum(n) AS BIGINT) AS range_rows,
         CAST(count(*) AS BIGINT) AS range_keys,
         CAST(min(k) AS BIGINT) AS lo_key,
         CAST(max(k) AS BIGINT) AS hi_key,
         any_value(grand) AS grand
  FROM assigned GROUP BY part_id
),
hash_side AS (
  SELECT ({_hf_sql('k', 3)}) % {_RP_N} AS part_id,
         CAST(sum(n) AS BIGINT) AS hash_rows
  FROM keys GROUP BY 1
)
SELECT CAST(r.part_id AS BIGINT) AS part_id,
       r.range_rows, r.range_keys, r.lo_key, r.hi_key,
       CAST(coalesce(h.hash_rows, 0) AS BIGINT) AS hash_rows,
       round(CAST(r.range_rows * {_RP_N} AS DOUBLE) / r.grand, 4) AS range_balance,
       round(CAST(coalesce(h.hash_rows, 0) * {_RP_N} AS DOUBLE) / r.grand, 4)
           AS hash_balance
FROM range_side r LEFT JOIN hash_side h ON r.part_id = h.part_id
ORDER BY part_id
"""


@register("ops_range_partition_planner", RANGE_PLAN_ORACLE)
def ops_range_partition_planner(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders", columns=["o_custkey"])
    keys = orders.groupBy(F.col("o_custkey").alias("k")).agg(
        F.count("*").cast("long").alias("n")
    )
    wk = Window.orderBy("k").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    wa = Window.partitionBy()
    assigned = (
        keys.withColumn("cum_before", F.sum("n").over(wk) - F.col("n"))
        .withColumn("grand", F.sum("n").over(wa))
        .select(
            "k",
            "n",
            F.expr(f"(cum_before * {_RP_N}) div grand").alias("part_id"),
            "grand",
        )
    )
    range_side = assigned.groupBy("part_id").agg(
        F.sum("n").cast("long").alias("range_rows"),
        F.count("*").cast("long").alias("range_keys"),
        F.min("k").cast("long").alias("lo_key"),
        F.max("k").cast("long").alias("hi_key"),
        F.any_value("grand").alias("grand"),
    )
    hash_side = (
        keys.select((_hf(F.col("k"), 3) % _RP_N).alias("part_id"), "n")
        .groupBy("part_id")
        .agg(F.sum("n").cast("long").alias("hash_rows"))
    )
    return (
        range_side.join(hash_side, "part_id", "left")
        .select(
            F.col("part_id").cast("long").alias("part_id"),
            "range_rows",
            "range_keys",
            "lo_key",
            "hi_key",
            F.coalesce("hash_rows", F.lit(0)).cast("long").alias("hash_rows"),
            F.round(
                (F.col("range_rows") * _RP_N).cast("double") / F.col("grand"), 4
            ).alias("range_balance"),
            F.round(
                (F.coalesce("hash_rows", F.lit(0)) * _RP_N).cast("double")
                / F.col("grand"),
                4,
            ).alias("hash_balance"),
        )
        .orderBy("part_id")
    )


# ---------------------------------------------------------------------------
# ops_join_cardinality_estimate — the CBO-literacy audit: for each
# star-join edge, compare the textbook join-size estimate
# |A|·|B| / max(ndv_A, ndv_B) (what a cost-based optimizer computes
# from table stats) against the EXACT output size Σ_k cA(k)·cB(k)
# (computed from the per-key count relations WITHOUT materializing the
# join — the same identity ANALYZE-based planners use for equi-joins).
# The est/exact ratio is the planning number that decides whether a
# downstream join is broadcast-able or shuffle-bound — and how wrong
# uniform-key assumptions are on skewed keys. Scale: each edge costs
# two map-side-combined key-count aggregations plus a join of REDUCED
# (key, count) relations; all arithmetic is exact BIGINTs with one
# terminal rounded quotient.
# ---------------------------------------------------------------------------

_CARD_EDGES = [
    ("customer-orders", "customer", "c_custkey", "orders", "o_custkey"),
    ("orders-lineitem", "orders", "o_orderkey", "lineitem", "l_orderkey"),
    ("part-lineitem", "part", "p_partkey", "lineitem", "l_partkey"),
    ("supplier-lineitem", "supplier", "s_suppkey", "lineitem", "l_suppkey"),
]

JOIN_CARD_ORACLE = "\nUNION ALL\n".join(
    f"""SELECT '{name}' AS edge,
       (SELECT CAST(count(*) AS BIGINT) FROM {ta}) AS rows_a,
       (SELECT CAST(count(*) AS BIGINT) FROM {tb}) AS rows_b,
       (SELECT CAST(count(DISTINCT {ka}) AS BIGINT) FROM {ta}) AS ndv_a,
       (SELECT CAST(count(DISTINCT {kb}) AS BIGINT) FROM {tb}) AS ndv_b,
       CAST(floor((SELECT count(*) FROM {ta}) * (SELECT count(*) FROM {tb})
            / greatest((SELECT count(DISTINCT {ka}) FROM {ta}),
                       (SELECT count(DISTINCT {kb}) FROM {tb}))) AS BIGINT) AS est_rows,
       (SELECT CAST(sum(ca * cb) AS BIGINT)
        FROM (SELECT {ka} AS k, count(*) AS ca FROM {ta} GROUP BY 1) a
        JOIN (SELECT {kb} AS k, count(*) AS cb FROM {tb} GROUP BY 1) b
          ON a.k = b.k) AS exact_rows,
       round(CAST((SELECT count(*) FROM {ta}) * (SELECT count(*) FROM {tb})
                  / greatest((SELECT count(DISTINCT {ka}) FROM {ta}),
                             (SELECT count(DISTINCT {kb}) FROM {tb})) AS DOUBLE)
             / (SELECT sum(ca * cb)
                FROM (SELECT {ka} AS k, count(*) AS ca FROM {ta} GROUP BY 1) a
                JOIN (SELECT {kb} AS k, count(*) AS cb FROM {tb} GROUP BY 1) b
                  ON a.k = b.k), 4) AS est_over_exact"""
    for (name, ta, ka, tb, kb) in _CARD_EDGES
) + "\nORDER BY edge"


@register("ops_join_cardinality_estimate", JOIN_CARD_ORACLE)
def ops_join_cardinality_estimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join-cardinality estimator: |A⋈B| predicted from per-key count sketches vs the exact join count, per FK edge."""
    import functools

    edges = []
    for name, ta, ka, tb, kb in _CARD_EDGES:
        a = load_table(spark, sf_dir, ta, columns=[ka])
        b = load_table(spark, sf_dir, tb, columns=[kb])
        sa = a.agg(
            F.count("*").cast("long").alias("rows_a"),
            F.count_distinct(F.col(ka)).cast("long").alias("ndv_a"),
        )
        sb = b.agg(
            F.count("*").cast("long").alias("rows_b"),
            F.count_distinct(F.col(kb)).cast("long").alias("ndv_b"),
        )
        ac = a.groupBy(F.col(ka).alias("k")).agg(F.count("*").alias("ca"))
        bc = b.groupBy(F.col(kb).alias("k")).agg(F.count("*").alias("cb"))
        exact = ac.join(bc, "k").agg(
            F.sum(F.col("ca") * F.col("cb")).cast("long").alias("exact_rows")
        )
        est = (F.col("rows_a") * F.col("rows_b")) / F.greatest(
            F.col("ndv_a"), F.col("ndv_b")
        )
        edges.append(
            sa.crossJoin(F.broadcast(sb))
            .crossJoin(F.broadcast(exact))
            .select(
                F.lit(name).alias("edge"),
                "rows_a",
                "rows_b",
                "ndv_a",
                "ndv_b",
                F.floor(est).cast("long").alias("est_rows"),
                "exact_rows",
                F.round(est.cast("double") / F.col("exact_rows"), 4).alias(
                    "est_over_exact"
                ),
            )
        )
    return functools.reduce(lambda x, y: x.unionAll(y), edges).orderBy("edge")


# ---------------------------------------------------------------------------
# dq_last_digit_uniformity — the rounding/fabrication screen that
# complements Benford's first-digit law: the LAST digit of genuine
# continuous amounts is ~uniform, so spikes at 0/5 expose hand-keyed,
# rounded, or fabricated figures. Chi-square against uniform(10) on
# the cents last digit of order totals, with the digit census
# reported. All counting is exact integers; the chi-square folds over
# exactly 10 cells. Scale: one projection + one 10-cell map-side-
# combined groupBy — no joins, no windows, embarrassingly parallel.
# ---------------------------------------------------------------------------

LAST_DIGIT_ORACLE = """
WITH d AS (
  SELECT CAST(round(o_totalprice * 100) AS BIGINT) % 10 AS digit FROM orders
),
cells AS (SELECT digit, CAST(count(*) AS BIGINT) AS n FROM d GROUP BY digit),
tot AS (SELECT CAST(sum(n) AS BIGINT) AS total FROM cells)
SELECT c.digit, c.n,
       round(CAST(c.n AS DOUBLE) / t.total, 4) AS share,
       round(CAST(sum(CAST(round((CAST(c.n AS DOUBLE) - CAST(t.total AS DOUBLE) / 10)
                 * (CAST(c.n AS DOUBLE) - CAST(t.total AS DOUBLE) / 10)
                 / (CAST(t.total AS DOUBLE) / 10) * 1e6) AS BIGINT)) OVER ()
             AS DOUBLE) / 1e6, 4) AS chi_square_df9
FROM cells c CROSS JOIN tot t
ORDER BY c.digit
"""


@register("dq_last_digit_uniformity", LAST_DIGIT_ORACLE)
def dq_last_digit_uniformity(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders", columns=["o_totalprice"])
    d = orders.select(
        (F.round(F.col("o_totalprice") * 100).cast("long") % 10).alias("digit")
    )
    cells = d.groupBy("digit").agg(F.count("*").cast("long").alias("n"))
    tot = cells.agg(F.sum("n").cast("long").alias("total"))
    e = F.col("total").cast("double") / 10
    w_all = Window.partitionBy()
    return (
        cells.crossJoin(F.broadcast(tot))
        .select(
            "digit",
            "n",
            F.round(F.col("n").cast("double") / F.col("total"), 4).alias("share"),
            F.round(
                F.sum(
                    F.round(
                        (F.col("n").cast("double") - e)
                        * (F.col("n").cast("double") - e)
                        / e
                        * 1e6
                    ).cast("long")
                )
                .over(w_all)
                .cast("double")
                / 1e6,
                4,
            ).alias("chi_square_df9"),
        )
        .orderBy("digit")
    )


# ---------------------------------------------------------------------------
# dq_tukey_fences — the boxplot outlier census per return flag: exact
# quartiles by integer rank selection (ceil(q·n/4) cumulative-count
# crossing) over the VALUE-COLLAPSED price-cents relation — never a
# per-row sort window (the KS/PSI stance) — then Tukey fences
# Q1 − 1.5·IQR / Q3 + 1.5·IQR broadcast back for one counting pass.
# The robust complement of stat_ols_residual_outliers (model-based)
# and stat_winsorized_event_values (trim-based). ENGINE PARITY: ranks,
# quartile values, and fences are exact integer arithmetic throughout
# (fences ×2 to stay integral: 2·fence = 2Q1 − 3·IQR).
# ---------------------------------------------------------------------------

TUKEY_ORACLE = """
WITH base AS (
  SELECT l_returnflag AS flag,
         CAST(round(l_extendedprice * 100) AS BIGINT) AS y
  FROM lineitem
),
vc AS (SELECT flag, y, CAST(count(*) AS BIGINT) AS cnt FROM base GROUP BY flag, y),
cum AS (
  SELECT flag, y, cnt,
         sum(cnt) OVER (PARTITION BY flag ORDER BY y
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_cnt,
         sum(cnt) OVER (PARTITION BY flag) AS n
  FROM vc
),
quart AS (
  SELECT flag, CAST(any_value(n) AS BIGINT) AS n,
         min(CASE WHEN cum_cnt >= (1 * n + 3) // 4 THEN y END) AS q1,
         min(CASE WHEN cum_cnt >= (3 * n + 3) // 4 THEN y END) AS q3
  FROM cum GROUP BY flag
),
fences AS (
  SELECT flag, n, q1, q3,
         2 * q1 - 3 * (q3 - q1) AS lo2,
         2 * q3 + 3 * (q3 - q1) AS hi2
  FROM quart
)
SELECT f.flag, f.n AS n_lines,
       round(f.q1 / 100.0, 2) AS q1_price,
       round(f.q3 / 100.0, 2) AS q3_price,
       round((f.q3 - f.q1) / 100.0, 2) AS iqr_price,
       CAST(sum(CASE WHEN 2 * b.y < f.lo2 THEN 1 ELSE 0 END) AS BIGINT) AS n_low_outliers,
       CAST(sum(CASE WHEN 2 * b.y > f.hi2 THEN 1 ELSE 0 END) AS BIGINT) AS n_high_outliers
FROM base b JOIN fences f ON b.flag = f.flag
GROUP BY f.flag, f.n, f.q1, f.q3
ORDER BY f.flag
"""


@register("dq_tukey_fences", TUKEY_ORACLE)
def dq_tukey_fences(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem", columns=["l_returnflag", "l_extendedprice"])
    base = li.select(
        F.col("l_returnflag").alias("flag"),
        F.round(F.col("l_extendedprice") * 100).cast("long").alias("y"),
    )
    # r15: the value-collapsed relation is checkpointed once — it feeds
    # the quartile walk, the per-flag totals AND (new) the outlier
    # count, which is now a cnt-WEIGHTED sum over vc instead of a
    # second full lineitem scan+join (guide §2.4: one FileScan total).
    vc = (
        base.groupBy("flag", "y")
        .agg(F.count("*").cast("long").alias("cnt"))
        .localCheckpoint(eager=True)
    )
    # r14: cumulative counts and per-flag totals come from the
    # two-phase bucketed helper + a 3-row broadcast instead of two
    # flag-partitioned windows over the whole value-collapsed relation
    # (3 window partitions = 3 tasks sorting ~150k distinct cents each
    # at sf0.1, and a non-plan at warehouse scale — guide §2.5).
    # Identical integers, parallelism #flags × ~1.1k buckets.
    from insurance_helper_spark.functions.ranks import cum_before

    nflag = vc.groupBy("flag").agg(F.sum("cnt").cast("long").alias("n"))
    cum = (
        cum_before(vc, ["flag"], "y", "cnt", 10_000)
        .withColumn("cum_cnt", F.col("cum_before") + F.col("cnt"))
        .join(F.broadcast(nflag), "flag")
        .select("flag", "y", "cnt", "cum_cnt", "n")
    )
    quart = cum.groupBy("flag").agg(
        F.any_value("n").cast("long").alias("n"),
        F.min(
            F.when(F.col("cum_cnt") >= F.expr("(1 * n + 3) div 4"), F.col("y"))
        ).alias("q1"),
        F.min(
            F.when(F.col("cum_cnt") >= F.expr("(3 * n + 3) div 4"), F.col("y"))
        ).alias("q3"),
    )
    fences = quart.select(
        "flag",
        "n",
        "q1",
        "q3",
        (2 * F.col("q1") - 3 * (F.col("q3") - F.col("q1"))).alias("lo2"),
        (2 * F.col("q3") + 3 * (F.col("q3") - F.col("q1"))).alias("hi2"),
    )
    return (
        vc.join(F.broadcast(fences), "flag")
        .groupBy("flag", "n", "q1", "q3")
        .agg(
            F.sum(F.when(2 * F.col("y") < F.col("lo2"), F.col("cnt")).otherwise(0))
            .cast("long")
            .alias("n_low_outliers"),
            F.sum(F.when(2 * F.col("y") > F.col("hi2"), F.col("cnt")).otherwise(0))
            .cast("long")
            .alias("n_high_outliers"),
        )
        .select(
            "flag",
            F.col("n").alias("n_lines"),
            F.round(F.col("q1") / 100.0, 2).alias("q1_price"),
            F.round(F.col("q3") / 100.0, 2).alias("q3_price"),
            F.round((F.col("q3") - F.col("q1")) / 100.0, 2).alias("iqr_price"),
            "n_low_outliers",
            "n_high_outliers",
        )
        .orderBy("flag")
    )


# ---------------------------------------------------------------------------
# corpus_dsir_importance — DSIR-style importance weighting (Xie et
# al. 2023's "Data Selection with Importance Resampling", public
# arXiv:2302.03169): score every document by the log-likelihood ratio
# of a TARGET-domain unigram LM vs the full-corpus LM (add-one
# smoothed), then report the per-source mean log-ratio and how many
# of each source's docs land in the selected top-20% — the standard
# "pick pretraining data that looks like the target domain" step.
# Per-TERM log-ratios are quantized to BIGINT nano-units once
# (broadcastable model relation), so per-doc scores are exact integer
# dot products and the 20% cut is exact integer rank selection over
# the value-collapsed score relation. Scale: two term-key shuffles
# (model build, score join) — the TF-IDF key pattern; no per-row
# global window.
# ---------------------------------------------------------------------------

DSIR_ORACLE = f"""
WITH t AS (
  SELECT doc_id, source,
         CASE WHEN trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g')) = ''
              THEN [] ELSE {_TOKS} END AS toks
  FROM documents
),
tok AS (SELECT doc_id, source, unnest(toks) AS term FROM t),
docterm AS (
  SELECT doc_id, term, CAST(count(*) AS BIGINT) AS c
  FROM tok GROUP BY doc_id, term
),
model_all AS (
  SELECT term, CAST(count(*) AS BIGINT) AS ca FROM tok GROUP BY term
),
model_tgt AS (
  SELECT term, CAST(count(*) AS BIGINT) AS ct FROM tok
  WHERE source = 'src0' GROUP BY term
),
consts AS (
  SELECT CAST((SELECT count(*) FROM model_all) AS BIGINT) AS v,
         CAST((SELECT sum(ca) FROM model_all) AS BIGINT) AS na,
         CAST((SELECT coalesce(sum(ct), 0) FROM model_tgt) AS BIGINT) AS nt
),
ratio AS (
  SELECT a.term,
         CAST(round(1e9 * ln(CAST((coalesce(g.ct, 0) + 1) * (k.na + k.v) AS DOUBLE)
                             / ((a.ca + 1) * (k.nt + k.v)))) AS BIGINT) AS lr_q
  FROM model_all a
  LEFT JOIN model_tgt g ON a.term = g.term
  CROSS JOIN consts k
),
scored AS (
  SELECT d.doc_id, CAST(sum(d.c * r.lr_q) AS BIGINT) AS w_q
  FROM docterm d JOIN ratio r ON d.term = r.term
  GROUP BY d.doc_id
),
everydoc AS (
  SELECT doc.doc_id, doc.source, coalesce(s.w_q, 0) AS w_q
  FROM (SELECT doc_id, source FROM documents) doc
  LEFT JOIN scored s ON doc.doc_id = s.doc_id
),
byw AS (SELECT w_q, CAST(count(*) AS BIGINT) AS cnt FROM everydoc GROUP BY w_q),
walked AS (
  SELECT w_q,
         sum(cnt) OVER (ORDER BY w_q DESC
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
         sum(cnt) OVER () AS n
  FROM byw
),
thr AS (SELECT max(w_q) AS cut FROM walked WHERE cum >= (n + 4) // 5)
SELECT e.source,
       CAST(count(*) AS BIGINT) AS n_docs,
       round(CAST(sum(e.w_q) AS DOUBLE) / count(*) / 1e9, 6) AS mean_logratio,
       CAST(sum(CASE WHEN e.w_q >= t.cut THEN 1 ELSE 0 END) AS BIGINT)
           AS n_selected
FROM everydoc e CROSS JOIN thr t
GROUP BY e.source
ORDER BY e.source
"""


@register("corpus_dsir_importance", DSIR_ORACLE)
def corpus_dsir_importance(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents", columns=["doc_id", "source", "text"])
    tok = docs.select(
        "doc_id", "source", F.explode(T.tokens(F.col("text"))).alias("term")
    )
    # r14: tokenize ONCE into per-doc term counts and checkpoint (the
    # entry-13/18 pattern — the token stream previously fed the per-doc
    # counts AND both n-gram models, each lineage clone re-running the
    # tokenizer+explode). Both models are exact integer sums of the
    # per-doc counts (sum of per-doc k per term == instance count), so
    # every downstream value is byte-identical (guide §2.4).
    docterm = (
        tok.groupBy("doc_id", "source", "term")
        .agg(F.count("*").cast("long").alias("c"))
        .localCheckpoint(eager=True)
    )
    model_all = docterm.groupBy("term").agg(F.sum("c").cast("long").alias("ca"))
    model_tgt = (
        docterm.where(F.col("source") == "src0")
        .groupBy("term")
        .agg(F.sum("c").cast("long").alias("ct"))
    )
    consts = model_all.agg(
        F.count("*").cast("long").alias("v"), F.sum("ca").cast("long").alias("na")
    ).crossJoin(
        model_tgt.agg(F.coalesce(F.sum("ct"), F.lit(0)).cast("long").alias("nt"))
    )
    ratio = (
        model_all.join(model_tgt, "term", "left")
        .crossJoin(F.broadcast(consts))
        .select(
            "term",
            F.round(
                F.lit(1e9)
                * F.log(
                    (
                        (F.coalesce(F.col("ct"), F.lit(0)) + 1)
                        * (F.col("na") + F.col("v"))
                    ).cast("double")
                    / ((F.col("ca") + 1) * (F.col("nt") + F.col("v")))
                )
            )
            .cast("long")
            .alias("lr_q"),
        )
    )
    scored = (
        docterm.join(ratio, "term")
        .groupBy("doc_id")
        .agg(F.sum(F.col("c") * F.col("lr_q")).cast("long").alias("w_q"))
    )
    everydoc = (
        docs.select("doc_id", "source")
        .join(scored, "doc_id", "left")
        .select("doc_id", "source", F.coalesce(F.col("w_q"), F.lit(0)).alias("w_q"))
    )
    byw = everydoc.groupBy("w_q").agg(F.count("*").cast("long").alias("cnt"))
    w_cum = (
        Window.orderBy(F.col("w_q").desc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_all = Window.partitionBy()
    walked = byw.select(
        "w_q",
        F.sum("cnt").over(w_cum).alias("cum"),
        F.sum("cnt").over(w_all).alias("n"),
    )
    thr = walked.where(F.col("cum") >= F.expr("(n + 4) div 5")).agg(
        F.max("w_q").alias("cut")
    )
    return (
        everydoc.crossJoin(F.broadcast(thr))
        .groupBy("source")
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.round(F.sum("w_q").cast("double") / F.count("*") / 1e9, 6).alias(
                "mean_logratio"
            ),
            F.sum(F.when(F.col("w_q") >= F.col("cut"), 1).otherwise(0))
            .cast("long")
            .alias("n_selected"),
        )
        .orderBy("source")
    )


# ---------------------------------------------------------------------------
# dq_l_diversity — l-diversity audit over the same quasi-identifier
# groups as the k-anonymity row (nation × segment × order-year), with
# order PRIORITY as the sensitive attribute: a group can be k-anon
# yet leak the sensitive value when everyone in it shares one
# priority (the homogeneity attack k-anonymity misses — Machanavajjhala
# et al. 2007). Reports the distinct-l census: min l, groups at l=1
# and l=2, and the row mass in groups below l=3. All exact integer
# counts. Scale: one (QI, sensitive) map-side collapse, then the
# distinct count folds ≤5 cells per group.
# ---------------------------------------------------------------------------

LDIV_ORACLE = """
WITH g AS (
  SELECT c.c_nationkey AS nation, c.c_mktsegment AS segment,
         CAST(year(o.o_orderdate) AS BIGINT) AS order_year,
         CAST(count(DISTINCT o.o_orderpriority) AS BIGINT) AS l,
         CAST(count(*) AS BIGINT) AS sz
  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
  GROUP BY 1, 2, 3
)
SELECT CAST(count(*) AS BIGINT) AS n_groups,
       CAST(sum(sz) AS BIGINT) AS n_rows,
       CAST(min(l) AS BIGINT) AS min_l,
       CAST(count(*) FILTER (l = 1) AS BIGINT) AS n_groups_l1,
       CAST(count(*) FILTER (l = 2) AS BIGINT) AS n_groups_l2,
       CAST(count(*) FILTER (l < 3) AS BIGINT) AS n_groups_lt3,
       CAST(coalesce(sum(sz) FILTER (l < 3), 0) AS BIGINT) AS n_rows_at_risk,
       round(coalesce(sum(sz) FILTER (l < 3), 0) * 1.0 / sum(sz), 6)
           AS frac_rows_at_risk
FROM g
"""


@register("dq_l_diversity", LDIV_ORACLE)
def dq_l_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(
        spark, sf_dir, "orders", columns=["o_custkey", "o_orderdate", "o_orderpriority"]
    )
    cust = load_table(
        spark, sf_dir, "customer", columns=["c_custkey", "c_nationkey", "c_mktsegment"]
    )
    g = (
        orders.join(cust, orders.o_custkey == cust.c_custkey)
        .groupBy(
            F.col("c_nationkey").alias("nation"),
            F.col("c_mktsegment").alias("segment"),
            F.year("o_orderdate").cast("long").alias("order_year"),
        )
        .agg(
            F.countDistinct("o_orderpriority").cast("long").alias("l"),
            F.count("*").cast("long").alias("sz"),
        )
    )
    low = F.col("l") < 3
    return g.agg(
        F.count("*").cast("long").alias("n_groups"),
        F.sum("sz").cast("long").alias("n_rows"),
        F.min("l").cast("long").alias("min_l"),
        F.sum((F.col("l") == 1).cast("long")).cast("long").alias("n_groups_l1"),
        F.sum((F.col("l") == 2).cast("long")).cast("long").alias("n_groups_l2"),
        F.sum(low.cast("long")).cast("long").alias("n_groups_lt3"),
        F.coalesce(F.sum(F.when(low, F.col("sz"))), F.lit(0))
        .cast("long")
        .alias("n_rows_at_risk"),
        F.round(
            F.coalesce(F.sum(F.when(low, F.col("sz"))), F.lit(0)) * 1.0 / F.sum("sz"),
            6,
        ).alias("frac_rows_at_risk"),
    )


# ---------------------------------------------------------------------------
# dq_t_closeness — t-closeness audit (Li et al. 2007): even an
# l-diverse group leaks when its sensitive-value DISTRIBUTION sits
# far from the table-wide one; t-closeness bounds the Earth-Mover
# distance between them. Priority is ordinal (its 5 labels sort
# '1-URGENT'..'5-LOW'), so the ordinal EMD is the mean absolute
# prefix-CDF gap — computed on a DENSE group × priority grid with
# cross-multiplied integer cumulative counts (|cum_g·N − cum_all·n_g|
# is exact), one terminal division per group. Scale: one contingency
# collapse; the windows ride the ≤5-cells-per-group grid relation.
# ---------------------------------------------------------------------------

TCLOSE_ORACLE = """
WITH joined AS (
  SELECT c.c_nationkey AS nation, c.c_mktsegment AS segment,
         o.o_orderpriority AS pr
  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
),
cells AS (
  SELECT nation, segment, pr, CAST(count(*) AS BIGINT) AS cnt
  FROM joined GROUP BY 1, 2, 3
),
grp AS (
  SELECT nation, segment, CAST(sum(cnt) AS BIGINT) AS n_g
  FROM cells GROUP BY 1, 2
),
overall AS (SELECT pr, CAST(sum(cnt) AS BIGINT) AS g_cnt FROM cells GROUP BY pr),
tot AS (SELECT CAST(sum(g_cnt) AS BIGINT) AS n FROM overall),
grid AS (
  SELECT g.nation, g.segment, g.n_g, p.pr, p.g_cnt, coalesce(c.cnt, 0) AS cnt
  FROM grp g
  CROSS JOIN overall p
  LEFT JOIN cells c
    ON c.nation = g.nation AND c.segment = g.segment AND c.pr = p.pr
),
walked AS (
  SELECT nation, segment, n_g, pr,
         sum(cnt) OVER w AS cum_g,
         sum(g_cnt) OVER w AS cum_all,
         row_number() OVER (PARTITION BY nation, segment ORDER BY pr) AS rnk
  FROM grid
  WINDOW w AS (PARTITION BY nation, segment ORDER BY pr
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
),
emd AS (
  SELECT nation, segment, any_value(n_g) AS n_g,
         CAST(sum(abs(cum_g * t.n - cum_all * n_g)) AS BIGINT) AS num,
         any_value(t.n) AS n
  FROM walked CROSS JOIN tot t
  WHERE rnk < 5
  GROUP BY nation, segment
)
SELECT nation, segment, n_g,
       round(CAST(num AS DOUBLE) / (CAST(n AS DOUBLE) * n_g * 4), 6)
           AS t_closeness,
       CAST(num AS DOUBLE) / (CAST(n AS DOUBLE) * n_g * 4) > 0.05
           AS violates_t05
FROM emd
ORDER BY nation, segment
"""


@register("dq_t_closeness", TCLOSE_ORACLE)
def dq_t_closeness(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(
        spark, sf_dir, "orders", columns=["o_custkey", "o_orderpriority"]
    )
    cust = load_table(
        spark, sf_dir, "customer", columns=["c_custkey", "c_nationkey", "c_mktsegment"]
    )
    cells = (
        orders.join(cust, orders.o_custkey == cust.c_custkey)
        .groupBy(
            F.col("c_nationkey").alias("nation"),
            F.col("c_mktsegment").alias("segment"),
            F.col("o_orderpriority").alias("pr"),
        )
        .agg(F.count("*").cast("long").alias("cnt"))
    )
    grp = cells.groupBy("nation", "segment").agg(F.sum("cnt").cast("long").alias("n_g"))
    glob = cells.groupBy("pr").agg(F.sum("cnt").cast("long").alias("g_cnt"))
    tot = glob.agg(F.sum("g_cnt").cast("long").alias("n"))
    grid = (
        grp.crossJoin(F.broadcast(glob))
        .join(cells, ["nation", "segment", "pr"], "left")
        .select(
            "nation",
            "segment",
            "n_g",
            "pr",
            "g_cnt",
            F.coalesce(F.col("cnt"), F.lit(0)).alias("cnt"),
        )
    )
    w_cum = (
        Window.partitionBy("nation", "segment")
        .orderBy("pr")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_rn = Window.partitionBy("nation", "segment").orderBy("pr")
    walked = grid.select(
        "nation",
        "segment",
        "n_g",
        "pr",
        F.sum("cnt").over(w_cum).alias("cum_g"),
        F.sum("g_cnt").over(w_cum).alias("cum_all"),
        F.row_number().over(w_rn).alias("rnk"),
    )
    emd = (
        walked.where(F.col("rnk") < 5)
        .crossJoin(F.broadcast(tot))
        .groupBy("nation", "segment")
        .agg(
            F.any_value("n_g").alias("n_g"),
            F.sum(F.abs(F.col("cum_g") * F.col("n") - F.col("cum_all") * F.col("n_g")))
            .cast("long")
            .alias("num"),
            F.any_value("n").alias("n"),
        )
    )
    t_val = F.col("num").cast("double") / (
        F.col("n").cast("double") * F.col("n_g") * 4
    )
    return emd.select(
        "nation",
        "segment",
        "n_g",
        F.round(t_val, 6).alias("t_closeness"),
        (t_val > 0.05).alias("violates_t05"),
    ).orderBy("nation", "segment")


# ---------------------------------------------------------------------------
# incremental_agg_retract — retractable incremental view maintenance:
# the maintained per-customer (count, sum) aggregate absorbs a DELETE
# batch (all 1995 orders) by SUBTRACTING the delete batch's partials,
# with zero-count keys dropping from the view — the group-inverse
# side of IVM that the insert-only merge row can't express, and the
# reason retraction-capable engines maintain exactly the invertible
# aggregates (min/max are deliberately absent: they need the
# surviving rows — see operators/incremental.py::
# retract_aggregate_partials). The oracle recomputes the view
# directly on the shrunken base, so the hash match proves
# merge-then-retract == recompute to the bit (integer cents
# partials). Scale: partials are O(keys); the retraction is one
# co-partitioned key join, independent of history size.
# ---------------------------------------------------------------------------

RETRACT_ORACLE = """
SELECT o_custkey,
       CAST(count(*) AS BIGINT) AS n_orders,
       round(CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
             / 100.0, 2) AS total_spend,
       ((2 * CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
         + count(*)) // (2 * count(*))) / 100.0 AS avg_spend
FROM orders
WHERE year(o_orderdate) <> 1995
GROUP BY o_custkey
ORDER BY o_custkey
"""


@register("incremental_agg_retract", RETRACT_ORACLE)
def incremental_agg_retract(spark: SparkSession, sf_dir: str) -> DataFrame:
    from insurance_helper_spark.operators.incremental import (
        aggregate_partials,
        retract_aggregate_partials,
    )

    orders = load_table(
        spark, sf_dir, "orders", columns=["o_custkey", "o_orderdate", "o_totalprice"]
    ).withColumn("cents", F.round(F.col("o_totalprice") * 100).cast("long"))
    state = aggregate_partials(orders, ["o_custkey"], "cents")
    deletes = aggregate_partials(
        orders.filter(F.year("o_orderdate") == 1995), ["o_custkey"], "cents"
    )
    view = retract_aggregate_partials(state, deletes, ["o_custkey"])
    return view.select(
        "o_custkey",
        F.col("p_count").cast("long").alias("n_orders"),
        F.round(F.col("p_sum").cast("long") / 100.0, 2).alias("total_spend"),
        (F.expr("(2 * p_sum + p_count) div (2 * p_count)") / 100.0).alias("avg_spend"),
    ).orderBy("o_custkey")


# ---------------------------------------------------------------------------
# ops_shuffle_balance_audit — would this key skew a 32-way shuffle?
# Buckets every order by portable_hash(o_custkey) % 32 (the same
# engine-portable hash family behind CMS/MinHash/HRW) and reports the
# bucket-size distribution: max/mean imbalance factor, coefficient of
# variation, and the exact integer Gini of bucket sizes — the triage
# numbers that decide between rebalancing, salting, or AQE skew-join.
# Scale: ONE map-side-combined groupBy on 32 buckets; the audit
# relation is constant-size regardless of fact volume.
# ---------------------------------------------------------------------------

SHUFFLE_BALANCE_ORACLE = f"""
WITH b AS (
  SELECT {_hf_sql("o_custkey", 1)} % 32 AS bucket,
         CAST(count(*) AS BIGINT) AS sz
  FROM orders GROUP BY bucket
),
ranked AS (
  SELECT sz, row_number() OVER (ORDER BY sz, bucket) AS i,
         CAST(count(*) OVER () AS BIGINT) AS nb
  FROM b
),
g AS (
  SELECT nb, CAST(sum(sz) AS BIGINT) AS tot,
         CAST(sum((2 * i - nb - 1) * sz) AS BIGINT) AS gnum,
         CAST(max(sz) AS BIGINT) AS mx,
         CAST(sum(sz * sz) AS BIGINT) AS ssq
  FROM ranked GROUP BY nb
)
SELECT tot AS n_rows, nb AS n_buckets, mx AS max_bucket,
       round(CAST(tot AS DOUBLE) / nb, 2) AS mean_bucket,
       round(mx * CAST(nb AS DOUBLE) / tot, 4) AS imbalance_factor,
       round(sqrt(nb * CAST(ssq AS DOUBLE) / (CAST(tot AS DOUBLE) * tot) - 1), 6)
           AS cv,
       round(CAST(gnum AS DOUBLE) / (CAST(nb AS DOUBLE) * tot), 6) AS gini
FROM g
"""


@register("ops_shuffle_balance_audit", SHUFFLE_BALANCE_ORACLE)
def ops_shuffle_balance_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    orders = load_table(spark, sf_dir, "orders", columns=["o_custkey"])
    b = orders.groupBy((_hf(F.col("o_custkey"), 1) % 32).alias("bucket")).agg(
        F.count("*").cast("long").alias("sz")
    )
    ranked = b.select(
        "sz",
        F.row_number().over(W.orderBy("sz", "bucket")).alias("i"),
        F.count("*").over(W.partitionBy()).cast("long").alias("nb"),
    )
    g = ranked.groupBy("nb").agg(
        F.sum("sz").cast("long").alias("tot"),
        F.sum((2 * F.col("i") - F.col("nb") - 1) * F.col("sz"))
        .cast("long")
        .alias("gnum"),
        F.max("sz").cast("long").alias("mx"),
        F.sum(F.col("sz") * F.col("sz")).cast("long").alias("ssq"),
    )
    totd = F.col("tot").cast("double")
    nbd = F.col("nb").cast("double")
    return g.select(
        F.col("tot").alias("n_rows"),
        F.col("nb").alias("n_buckets"),
        F.col("mx").alias("max_bucket"),
        F.round(totd / F.col("nb"), 2).alias("mean_bucket"),
        F.round(F.col("mx") * nbd / F.col("tot"), 4).alias("imbalance_factor"),
        F.round(
            F.sqrt(F.col("nb") * F.col("ssq").cast("double") / (totd * totd) - 1), 6
        ).alias("cv"),
        F.round(F.col("gnum").cast("double") / (nbd * F.col("tot")), 6).alias("gini"),
    )


# ---------------------------------------------------------------------------
# dq_primary_key_audit — primary-key uniqueness across every fixture
# table (single-column keys plus lineitem's composite (orderkey,
# linenumber)): n_rows vs n_distinct keys and the duplicate surplus.
# The PK-side complement to dq_referential_integrity (which audits
# the FK edges). Scale: one count-distinct rollup per table, unioned;
# each is a map-side-combined aggregate.
# ---------------------------------------------------------------------------

PK_AUDIT_ORACLE = """
SELECT 'customer' AS table_name, CAST(count(*) AS BIGINT) AS n_rows,
       CAST(count(DISTINCT c_custkey) AS BIGINT) AS n_distinct_keys,
       CAST(count(*) - count(DISTINCT c_custkey) AS BIGINT) AS n_dup_rows
FROM customer
UNION ALL
SELECT 'documents', CAST(count(*) AS BIGINT),
       CAST(count(DISTINCT doc_id) AS BIGINT),
       CAST(count(*) - count(DISTINCT doc_id) AS BIGINT) FROM documents
UNION ALL
SELECT 'embeddings', CAST(count(*) AS BIGINT),
       CAST(count(DISTINCT vec_id) AS BIGINT),
       CAST(count(*) - count(DISTINCT vec_id) AS BIGINT) FROM embeddings
UNION ALL
SELECT 'events', CAST(count(*) AS BIGINT),
       CAST(count(DISTINCT event_id) AS BIGINT),
       CAST(count(*) - count(DISTINCT event_id) AS BIGINT) FROM events
UNION ALL
SELECT 'lineitem', CAST(count(*) AS BIGINT),
       CAST(count(DISTINCT (l_orderkey, l_linenumber)) AS BIGINT),
       CAST(count(*) - count(DISTINCT (l_orderkey, l_linenumber)) AS BIGINT)
FROM lineitem
UNION ALL
SELECT 'orders', CAST(count(*) AS BIGINT),
       CAST(count(DISTINCT o_orderkey) AS BIGINT),
       CAST(count(*) - count(DISTINCT o_orderkey) AS BIGINT) FROM orders
UNION ALL
SELECT 'part', CAST(count(*) AS BIGINT),
       CAST(count(DISTINCT p_partkey) AS BIGINT),
       CAST(count(*) - count(DISTINCT p_partkey) AS BIGINT) FROM part
UNION ALL
SELECT 'supplier', CAST(count(*) AS BIGINT),
       CAST(count(DISTINCT s_suppkey) AS BIGINT),
       CAST(count(*) - count(DISTINCT s_suppkey) AS BIGINT) FROM supplier
ORDER BY table_name
"""


@register("dq_primary_key_audit", PK_AUDIT_ORACLE)
def dq_primary_key_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    specs = [
        ("customer", ["c_custkey"]),
        ("documents", ["doc_id"]),
        ("embeddings", ["vec_id"]),
        ("events", ["event_id"]),
        ("lineitem", ["l_orderkey", "l_linenumber"]),
        ("orders", ["o_orderkey"]),
        ("part", ["p_partkey"]),
        ("supplier", ["s_suppkey"]),
    ]
    out = None
    for name, keys in specs:
        t = load_table(spark, sf_dir, name, columns=keys)
        row = t.agg(
            F.count("*").cast("long").alias("n_rows"),
            F.countDistinct(*keys).cast("long").alias("n_distinct_keys"),
        ).select(
            F.lit(name).alias("table_name"),
            "n_rows",
            "n_distinct_keys",
            (F.col("n_rows") - F.col("n_distinct_keys")).cast("long").alias("n_dup_rows"),
        )
        out = row if out is None else out.unionByName(row)
    return out.orderBy("table_name")


# ---------------------------------------------------------------------------
# ops_broadcast_threshold_audit — which join sides fit under Spark's
# autoBroadcastJoinThreshold (default 10 MiB)? For each dimension-side
# table, the audit estimates in-memory row bytes from the schema
# (8 bytes per numeric, string length + 8 bytes of UTF8String/offset
# overhead per string) and reports rows, estimated bytes, bytes/row,
# and the broadcast verdict. This is the planner fact that decides
# broadcast-hash vs shuffle joins across the whole catalog — at a new
# scale factor you read THIS table before trusting any `broadcast()`
# hint. ENGINE PARITY: byte estimates are exact BIGINT sums of integer
# widths; bytes/row is the one terminal quotient. Scale: one
# map-side-combined aggregate per audited table; output is 5 rows at
# any corpus size.
# ---------------------------------------------------------------------------

# (table, [(column, kind)]) — kind: 'num' = fixed 8 bytes, 'str' =
# length + 8. Shared by the Spark build and the DuckDB oracle below.
_BCAST_SCHEMAS = [
    ("region", [("r_regionkey", "num"), ("r_name", "str")]),
    ("nation", [("n_nationkey", "num"), ("n_name", "str"), ("n_regionkey", "num")]),
    (
        "supplier",
        [
            ("s_suppkey", "num"),
            ("s_name", "str"),
            ("s_nationkey", "num"),
            ("s_acctbal", "num"),
        ],
    ),
    (
        "customer",
        [
            ("c_custkey", "num"),
            ("c_name", "str"),
            ("c_nationkey", "num"),
            ("c_acctbal", "num"),
            ("c_mktsegment", "str"),
        ],
    ),
    (
        "part",
        [
            ("p_partkey", "num"),
            ("p_name", "str"),
            ("p_brand", "str"),
            ("p_type", "str"),
            ("p_size", "num"),
            ("p_retailprice", "num"),
        ],
    ),
]

_BCAST_LIMIT = 10 * 1024 * 1024  # Spark's default autoBroadcastJoinThreshold


def _bcast_row_bytes_sql(cols) -> str:
    terms = [
        "8" if kind == "num" else f"(length({c}) + 8)" for c, kind in cols
    ]
    return " + ".join(terms)


BCAST_AUDIT_ORACLE = "\nUNION ALL\n".join(
    f"""SELECT '{t}' AS table_name,
       CAST(count(*) AS BIGINT) AS n_rows,
       CAST(sum({_bcast_row_bytes_sql(cols)}) AS BIGINT) AS est_bytes,
       round(CAST(sum({_bcast_row_bytes_sql(cols)}) AS DOUBLE) / count(*), 2)
           AS bytes_per_row,
       CAST(sum({_bcast_row_bytes_sql(cols)}) AS BIGINT) < {_BCAST_LIMIT}
           AS broadcastable
FROM {t}"""
    for t, cols in _BCAST_SCHEMAS
) + "\nORDER BY table_name"


@register("ops_broadcast_threshold_audit", BCAST_AUDIT_ORACLE)
def ops_broadcast_threshold_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Broadcast-threshold audit: estimated in-memory bytes per dimension table vs the 10 MB autoBroadcast default."""
    out = None
    for t, cols in _BCAST_SCHEMAS:
        df = load_table(spark, sf_dir, t, columns=[c for c, _ in cols])
        row_bytes = None
        for c, kind in cols:
            term = (
                F.lit(8).cast("long")
                if kind == "num"
                else (F.length(F.col(c)) + 8).cast("long")
            )
            row_bytes = term if row_bytes is None else row_bytes + term
        agg = df.agg(
            F.count("*").cast("long").alias("n_rows"),
            F.sum(row_bytes).cast("long").alias("est_bytes"),
        ).select(
            F.lit(t).alias("table_name"),
            "n_rows",
            "est_bytes",
            F.round(F.col("est_bytes").cast("double") / F.col("n_rows"), 2).alias(
                "bytes_per_row"
            ),
            (F.col("est_bytes") < _BCAST_LIMIT).alias("broadcastable"),
        )
        out = agg if out is None else out.unionByName(agg)
    return out.orderBy("table_name")

"""Round-14 operator wave: the IVF vector store's COMPACTION census
(small-cell merge planning — the maintenance step that completes the
lifecycle beside assignment/incremental-assign/occupancy-PSI), and the
cost-dispatch BOUNDARY audit (the engine's exact-vs-LSH rule pinned
row-by-row at the 1M-vector broadcast ceiling and the 128-table recall
cap, for both real call-site bands).

House rules as every wave: libm values quantized to BIGINT before any
distributed fold; identical column aliases in Spark and DuckDB;
explicit 100 TB scale stance per docstring.

Reference parity: extends Stage-3 "vector database for semantic
document storage" (/root/reference/README.md:108-110) with the
maintenance/compaction relation an operator actually reads.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from insurance_helper_spark.operators.vector_store import _assign, _elect_centroids
from insurance_helper_spark.queries.catalog import register
from insurance_helper_spark.queries.wave11_queries import _census_sql, _vecs
from insurance_helper_spark.sources.tables import load_table

# ---------------------------------------------------------------------------
# vector_store_compaction_census / _apply — small-cell merge planning
# and execution over the maintained IVF store (the FAISS/Milvus
# "compact small segments" maintenance step as verifiable relations):
# elect the quantizer and assign the corpus exactly as
# vector_store_assignment_census does, flag every cell whose occupancy
# falls below HALF the mean (integer-exact test: 2·k·occ < n_total —
# no float thresholds; at the store granularity k = 48 the fixture
# corpus genuinely has undersized cells, so the merge columns carry
# real values at the driver's correctness SF), and plan each small
# cell's merge into the nearest NON-small cell by centroid cosine
# (round-4, smaller-cell tiebreak). Zero-occupancy cells sit on the
# seed spine and are merge candidates too — the census always has
# exactly k rows. The _apply twin then EXECUTES the plan: small cells'
# vectors reassign to their merge target and the post-compaction store
# state (counts + mean assignment cosine, 1e6-quantized) is reported
# per surviving cell. Scale: occupancy is a k-row fold; the
# merge-target search is a k×k centroid cross join (broadcast); the
# apply touches only the moved vectors — O(small cells' occupancy),
# not O(store); nothing vector-sized shuffles beyond the moved rows.
# ---------------------------------------------------------------------------

VS_COMPACT_K = 48

VS_COMPACT_ORACLE = f"""
WITH v AS MATERIALIZED (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS vv FROM embeddings
),
{_census_sql('v', 'v', VS_COMPACT_K)},
occ AS (
  SELECT s.cell, s.cvec,
         (SELECT CAST(count(*) AS BIGINT) FROM a2 WHERE a2.cell = s.cell) AS n_vectors
  FROM seeds s2 JOIN cent2 s ON s.cell = s2.cell
),
tot AS (SELECT CAST(count(*) AS BIGINT) AS n_total FROM v),
flagged AS (
  SELECT o.cell, o.cvec, o.n_vectors,
         2 * {VS_COMPACT_K} * o.n_vectors < t.n_total AS is_small
  FROM occ o CROSS JOIN tot t
),
targets AS (
  SELECT s.cell, b.cell AS merge_into, b.n_vectors AS target_n,
         row_number() OVER (PARTITION BY s.cell
           ORDER BY round(list_cosine_similarity(s.cvec, b.cvec), 4) DESC,
                    b.cell) AS rn
  FROM flagged s JOIN flagged b ON NOT b.is_small AND b.cell <> s.cell
  WHERE s.is_small
)
SELECT f.cell, f.n_vectors, f.is_small,
       t.merge_into, t.target_n,
       (SELECT CAST(count(*) AS BIGINT) FROM flagged WHERE NOT is_small)
         AS n_cells_after
FROM flagged f
LEFT JOIN (SELECT * FROM targets WHERE rn = 1) t ON t.cell = f.cell
ORDER BY f.cell
"""


def _compaction_frames(spark: SparkSession, sf_dir: str) -> dict:
    """Shared election/assignment/flag/target frames for the census
    and the apply twin (same arithmetic, one definition).

    r14 opt 2 (guide §2.4/§5 — reuse, don't recompute): the census and
    the apply twin each rebuilt the IDENTICAL election + assignment
    from scratch (two elections, four assignment passes per bench
    pass). Both relations now stage once per (app, sf_dir) to
    session-temp parquet via shared_cache.memo_checkpoint — the same
    published-staged-relation pattern as the ngram pair table and the
    Levenshtein cluster family, and exactly what the production store
    does (centroids and assignments ARE persisted epoch state,
    re-derived only on re-election). The k-row flag/target frames stay
    per-query (one 48-row aggregate + a 48×~40 broadcast cross join)."""
    from insurance_helper_spark.operators.similarity import cosine
    from insurance_helper_spark.queries.shared_cache import (
        corpus_count,
        memo_checkpoint,
    )

    vecs = _vecs(spark, sf_dir)

    def _build_cents() -> DataFrame:
        return _elect_centroids(
            vecs.localCheckpoint(eager=True), VS_COMPACT_K
        )

    cents = memo_checkpoint(
        spark, ("vs_compact_cents", sf_dir, VS_COMPACT_K), _build_cents
    )
    a = memo_checkpoint(
        spark,
        ("vs_compact_assign", sf_dir, VS_COMPACT_K),
        lambda: _assign(vecs, cents).select("vec_id", "cell", "cos_c"),
    )
    n_total = corpus_count(spark, sf_dir, "embeddings")
    occ = cents.join(
        a.groupBy("cell").agg(F.count("*").cast("long").alias("n_vectors")),
        "cell",
        "left",
    ).select(
        "cell",
        "cvec",
        F.coalesce(F.col("n_vectors"), F.lit(0)).cast("long").alias("n_vectors"),
    )
    flagged = occ.withColumn(
        "is_small", 2 * VS_COMPACT_K * F.col("n_vectors") < F.lit(n_total)
    ).localCheckpoint(eager=True)  # small×big self-join shares one build
    small = flagged.where("is_small").select(
        "cell", F.col("cvec").alias("svec")
    )
    big = flagged.where(~F.col("is_small")).select(
        F.col("cell").alias("merge_into"),
        F.col("n_vectors").alias("target_n"),
        F.col("cvec").alias("bvec"),
    )
    wt = Window.partitionBy("cell").orderBy(F.desc("cos_cc"), "merge_into")
    targets = (
        small.crossJoin(F.broadcast(big))
        .select(
            "cell", "merge_into", "target_n",
            F.round(cosine(F.col("svec"), F.col("bvec")), 4).alias("cos_cc"),
        )
        .withColumn("rn", F.row_number().over(wt))
        .where(F.col("rn") == 1)
        .select("cell", "merge_into", "target_n")
    )
    return {
        "vecs": vecs, "cents": cents, "assign": a, "n_total": n_total,
        "flagged": flagged, "targets": targets,
    }


@register("vector_store_compaction_census", VS_COMPACT_ORACLE)
def vector_store_compaction_census(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-row compaction plan: per cell its occupancy, the small flag
    (2·k·occ < n_total), and for small cells the nearest big cell to
    merge into. ``n_cells_after`` = surviving (big) cells — the store
    size the compaction leaves behind."""
    fr = _compaction_frames(spark, sf_dir)
    flagged, targets = fr["flagged"], fr["targets"]
    n_after = flagged.where(~F.col("is_small")).count()
    return (
        flagged.select("cell", "n_vectors", "is_small")
        .join(F.broadcast(targets), "cell", "left")
        .withColumn("n_cells_after", F.lit(n_after).cast("long"))
        .orderBy("cell")
    )


VS_COMPACT_APPLY_ORACLE = f"""
WITH v AS MATERIALIZED (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS vv FROM embeddings
),
{_census_sql('v', 'v', VS_COMPACT_K)},
occ AS (
  SELECT s.cell, s.cvec,
         (SELECT CAST(count(*) AS BIGINT) FROM a2 WHERE a2.cell = s.cell) AS n_vectors
  FROM seeds s2 JOIN cent2 s ON s.cell = s2.cell
),
tot AS (SELECT CAST(count(*) AS BIGINT) AS n_total FROM v),
flagged AS (
  SELECT o.cell, o.cvec, o.n_vectors,
         2 * {VS_COMPACT_K} * o.n_vectors < t.n_total AS is_small
  FROM occ o CROSS JOIN tot t
),
targets AS (
  SELECT s.cell, b.cell AS merge_into,
         row_number() OVER (PARTITION BY s.cell
           ORDER BY round(list_cosine_similarity(s.cvec, b.cvec), 4) DESC,
                    b.cell) AS rn
  FROM flagged s JOIN flagged b ON NOT b.is_small AND b.cell <> s.cell
  WHERE s.is_small
),
tmap AS (SELECT cell, merge_into FROM targets WHERE rn = 1),
moved AS (
  SELECT a2.vec_id, t.merge_into AS cell
  FROM a2 JOIN tmap t ON t.cell = a2.cell
),
kept AS (
  SELECT a2.vec_id, a2.cell, a2.cos_c
  FROM a2 JOIN flagged f ON f.cell = a2.cell AND NOT f.is_small
),
moved_cos AS (
  SELECT m.vec_id, m.cell,
         round(list_cosine_similarity(v.vv, c.cvec), 4) AS cos_c
  FROM moved m JOIN v ON v.vec_id = m.vec_id
  JOIN cent2 c ON c.cell = m.cell
),
post AS (SELECT * FROM kept UNION ALL SELECT * FROM moved_cos)
SELECT f.cell,
       f.n_vectors AS n_before,
       CAST(coalesce(mv.n_recv, 0) AS BIGINT) AS n_received,
       CAST(count(*) AS BIGINT) AS n_after,
       round(CAST(sum(CAST(round(1e6 * p.cos_c) AS BIGINT)) AS DOUBLE)
             / count(*) / 1e6, 6) AS mean_cos_after
FROM flagged f
JOIN post p ON p.cell = f.cell
LEFT JOIN (SELECT cell, count(*) AS n_recv FROM moved GROUP BY cell) mv
  ON mv.cell = f.cell
WHERE NOT f.is_small
GROUP BY f.cell, f.n_vectors, mv.n_recv
ORDER BY f.cell
"""


@register("vector_store_compaction_apply", VS_COMPACT_APPLY_ORACLE)
def vector_store_compaction_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Execute the compaction plan: small cells' vectors reassign to
    their merge target; report, per SURVIVING cell, counts before the
    merge, received, after, and the post-merge mean assignment cosine
    (round-4 per vector, 1e6-quantized before the fold — the
    assignment-census arithmetic). Conservation (Σ n_after = n_total)
    and n_after = n_before + n_received are pinned in tests. Scale:
    only moved vectors are touched (their new-centroid cosine is a
    |moved| × 1 broadcast-joined projection); the surviving cells'
    rows ride the existing assignment — O(small cells' occupancy)."""
    from insurance_helper_spark.operators.similarity import cosine

    fr = _compaction_frames(spark, sf_dir)
    a, flagged, targets = fr["assign"], fr["flagged"], fr["targets"]
    tmap = targets.select("cell", "merge_into")
    moved = a.join(F.broadcast(tmap), "cell").select(
        "vec_id", F.col("merge_into").alias("cell")
    )
    big = flagged.where(~F.col("is_small")).select("cell", "n_vectors", "cvec")
    kept = a.join(
        F.broadcast(big.select("cell")), "cell", "left_semi"
    ).select("vec_id", "cell", "cos_c")
    moved_cos = (
        moved.join(fr["vecs"], "vec_id")
        .join(F.broadcast(fr["cents"]), "cell")
        .select(
            "vec_id",
            "cell",
            F.round(cosine(F.col("vv"), F.col("cvec")), 4).alias("cos_c"),
        )
    )
    post = kept.unionByName(moved_cos)
    recv = moved.groupBy("cell").agg(F.count("*").cast("long").alias("n_recv"))
    return (
        post.groupBy("cell")
        .agg(
            F.count("*").cast("long").alias("n_after"),
            F.sum(F.round(F.col("cos_c") * 1e6).cast("long")).alias("s"),
        )
        .join(F.broadcast(big.select("cell", F.col("n_vectors").alias("n_before"))), "cell")
        .join(F.broadcast(recv), "cell", "left")
        .select(
            "cell",
            "n_before",
            F.coalesce(F.col("n_recv"), F.lit(0)).cast("long").alias("n_received"),
            "n_after",
            F.round(
                F.col("s").cast("double") / F.col("n_after") / 1e6, 6
            ).alias("mean_cos_after"),
        )
        .orderBy("cell")
    )


# ---------------------------------------------------------------------------
# similarity_dispatch_boundary_audit — the exact-vs-LSH cost dispatch
# (r13 near-dup band, r14 bitext band) pinned row-by-row at its two
# hard edges: the ~1M-vector broadcast ceiling (1 000 000 is eligible
# for exact-gemm, 1 000 001 is not) and the 128-table recall cap
# (where the uncapped recall-holding table count would exceed 128 the
# planner caps it, and once L/2^b falls below 1/16 the dispatch
# returns to LSH even BELOW the ceiling). One literal row per
# (band, n) over both real call-site bands and a doubling n-grid
# bracketing both edges; the Spark side calls the REAL planner +
# dispatch code, the oracle re-derives every column from the published
# closed forms — code/formula divergence is a hash mismatch.
# ---------------------------------------------------------------------------

_BOUNDARY_BANDS = ((0.33, 4, 12), (0.4, 4, 16))  # (band, base_planes, base_tables)
_BOUNDARY_NS = tuple(
    sorted({1000 * 2**i for i in range(11)} | {1_000_000, 1_000_001})
)

DISPATCH_BOUNDARY_ORACLE = f"""
WITH bands AS (
  SELECT * FROM (VALUES (0.33, 12), (0.4, 16)) AS b(band, base_tables)
),
grid AS (SELECT CAST(unnest([{", ".join(str(n) for n in _BOUNDARY_NS)}]) AS BIGINT) AS n_vectors),
base AS (
  SELECT b.band, b.base_tables, g.n_vectors,
         1 - acos(b.band) / pi() AS p
  FROM bands b CROSS JOIN grid g
),
planned AS (
  SELECT band, base_tables, n_vectors, p,
         CASE WHEN n_vectors <= 128 THEN 4
              ELSE greatest(4, CAST(ceil(log2(n_vectors / 128.0)) AS BIGINT))
         END AS n_planes
  FROM base
),
tabled AS (
  SELECT band, base_tables, n_vectors, p, n_planes,
         CASE WHEN n_planes <= 4 THEN CAST(base_tables AS BIGINT)
              ELSE greatest(base_tables, least(128, CAST(ceil(
                   ln(1 - (1 - power(1 - power(p, 4), base_tables)))
                   / ln(1 - power(p, n_planes))) AS BIGINT)))
         END AS n_tables,
         CASE WHEN n_planes <= 4 THEN FALSE
              ELSE CAST(ceil(
                   ln(1 - (1 - power(1 - power(p, 4), base_tables)))
                   / ln(1 - power(p, n_planes))) AS BIGINT) > 128
         END AS table_capped
  FROM planned
)
SELECT band, n_vectors,
       CAST(n_planes AS BIGINT) AS n_planes,
       CAST(n_tables AS BIGINT) AS n_tables,
       table_capped,
       round(CAST(n_tables AS DOUBLE) / power(2, n_planes), 6) AS grid_fraction,
       n_vectors <= 1000000 AS under_ceiling,
       CASE WHEN n_planes <= 4 THEN 'lsh-base'
            WHEN n_vectors <= 1000000
                 AND CAST(n_tables AS DOUBLE) / power(2, n_planes) >= 1.0 / 16
            THEN 'exact-gemm'
            ELSE 'lsh' END AS plan
FROM tabled ORDER BY band, n_vectors
"""


@register("similarity_dispatch_boundary_audit", DISPATCH_BOUNDARY_ORACLE)
def similarity_dispatch_boundary_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(band × n)-grid of the planner + dispatch outputs with edge
    flags: ``table_capped`` (uncapped recall-holding table count would
    exceed 128) and ``under_ceiling`` (n ≤ 1M — exact-gemm eligible).
    26 literal rows of pure driver math; no fixture data is read (the
    audited boundaries are absolute, not corpus-relative)."""
    import math

    from insurance_helper_spark.operators.similarity import (
        adaptive_srp_planes,
        adaptive_srp_tables,
        srp_collision_p,
        srp_recall,
    )

    rows = []
    for band, base_planes, base_tables in _BOUNDARY_BANDS:
        for n in _BOUNDARY_NS:
            b = adaptive_srp_planes(n, base_planes=base_planes)
            t = adaptive_srp_tables(
                b, target_cosine=band, base_planes=base_planes,
                base_tables=base_tables,
            )
            if b <= base_planes:
                capped = False
            else:
                p = srp_collision_p(band)
                target = srp_recall(base_planes, base_tables, band)
                need = math.ceil(
                    math.log(max(1.0 - target, 1e-300))
                    / math.log(1.0 - p**b)
                )
                capped = need > 128
            # the EXACT dispatch branch the two call sites run
            if b <= 4:
                plan = "lsh-base"
            elif n <= 1_000_000 and t / 2**b >= 1.0 / 16:
                plan = "exact-gemm"
            else:
                plan = "lsh"
            rows.append((band, n, b, t, capped, t / 2**b, n <= 1_000_000, plan))
    return (
        spark.createDataFrame(
            rows,
            "band double, n_vectors long, n_planes long, n_tables long,"
            " table_capped boolean, frac_raw double, under_ceiling boolean,"
            " plan string",
        )
        # rounding ENGINE-side (F.round / DuckDB round — the proven pair)
        .select(
            "band", "n_vectors", "n_planes", "n_tables", "table_capped",
            F.round("frac_raw", 6).alias("grid_fraction"),
            "under_ceiling", "plan",
        )
        .orderBy("band", "n_vectors")
    )


# ---------------------------------------------------------------------------
# corpus_ingest_gate_census — the streaming corpus-ingest quality gate
# (streaming/ops.py::corpus_ingest_stream: ≥5 normalized tokens AND
# duplicate-2-gram fraction ≤ 0.6) as an oracle-backed monitoring
# relation: per language, how many raw documents the gate would pass,
# reject as too short, or reject as repetitive. This is the batch twin
# an ingest operator watches to detect a drifting upstream crawl — and
# the value-level audit of the r14 gate rewrite (repetition_gate_col's
# bind_once let-bindings; see the plan-shape pin in tests/test_plans.py).
# Scale: one tokenizer pass per row fused into the scan (the gate is
# pure per-row array arithmetic), then a |lang|-row fold — no shuffle
# carries anything document-sized.
# ---------------------------------------------------------------------------

GATE_MIN_TOKENS = 5  # corpus_ingest_stream defaults
GATE_MAX_DUP_2GRAM = 0.6

GATE_CENSUS_ORACLE = f"""
WITH t AS (
  SELECT lang,
         list_filter(string_split_regex(trim(regexp_replace(lower(coalesce(text, '')),
           '[^a-z0-9]+', ' ', 'g')), ' '), x -> x <> '') AS toks
  FROM documents
),
g AS (
  SELECT lang, len(toks) AS n_toks,
         CASE WHEN len(toks) >= 2
              THEN list_transform(range(1, len(toks)), i -> toks[i] || ' ' || toks[i+1])
              ELSE [] END AS g2
  FROM t
),
c AS (
  SELECT lang, n_toks,
         CASE WHEN len(g2) = 0 THEN 0.0
              ELSE 1.0 - CAST(len(list_distinct(g2)) AS DOUBLE) / len(g2)
         END AS dup_frac
  FROM g
)
SELECT lang,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(CASE WHEN n_toks < {GATE_MIN_TOKENS} THEN 1 ELSE 0 END) AS BIGINT)
         AS n_short,
       CAST(sum(CASE WHEN n_toks >= {GATE_MIN_TOKENS}
                     AND dup_frac > {GATE_MAX_DUP_2GRAM}
                THEN 1 ELSE 0 END) AS BIGINT) AS n_repetitive,
       CAST(sum(CASE WHEN n_toks >= {GATE_MIN_TOKENS}
                     AND dup_frac <= {GATE_MAX_DUP_2GRAM}
                THEN 1 ELSE 0 END) AS BIGINT) AS n_pass,
       round(CAST(sum(CASE WHEN n_toks >= {GATE_MIN_TOKENS}
                           AND dup_frac <= {GATE_MAX_DUP_2GRAM}
                      THEN 1 ELSE 0 END) AS DOUBLE) / count(*), 6) AS pass_rate,
       CAST(sum(n_toks) AS BIGINT) AS n_tokens_sum,
       round(max(dup_frac), 6) AS max_dup_frac
FROM c GROUP BY lang ORDER BY lang
"""


@register("corpus_ingest_gate_census", GATE_CENSUS_ORACLE)
def corpus_ingest_gate_census(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language (n_docs, n_short, n_repetitive, n_pass, pass_rate)
    under the exact corpus_ingest_stream gate — built from the same
    tokenizer/2-gram/bound functions the stream runs, so the census IS
    the gate (a semantics drift between them is a hash mismatch here)."""
    from insurance_helper_spark.operators import corpus as C

    docs = load_table(spark, sf_dir, "documents", columns=["text", "lang"])
    parts = C.bind_once(
        C.tokens_col(F.coalesce(F.col("text"), F.lit(""))),
        lambda toks: F.struct(
            F.size(toks).alias("n_toks"),
            C.bind_once(
                C.overlapping_2grams(toks),
                lambda g: F.when(F.size(g) == 0, F.lit(0.0)).otherwise(
                    1.0 - F.size(F.array_distinct(g)) / F.size(g)
                ),
            ).alias("dup_frac"),
        ),
    )
    staged = docs.select("lang", parts.alias("p"))
    long_enough = F.col("p.n_toks") >= GATE_MIN_TOKENS
    rep_ok = F.col("p.dup_frac") <= GATE_MAX_DUP_2GRAM
    return (
        staged.groupBy("lang")
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.sum((~long_enough).cast("long")).alias("n_short"),
            F.sum((long_enough & ~rep_ok).cast("long")).alias("n_repetitive"),
            F.sum((long_enough & rep_ok).cast("long")).alias("n_pass"),
            F.sum("p.n_toks").cast("long").alias("n_tokens_sum"),
            F.max("p.dup_frac").alias("max_dup_frac_raw"),
        )
        .select(
            "lang",
            "n_docs",
            "n_short",
            "n_repetitive",
            "n_pass",
            F.round(
                F.col("n_pass").cast("double") / F.col("n_docs"), 6
            ).alias("pass_rate"),
            "n_tokens_sum",
            F.round("max_dup_frac_raw", 6).alias("max_dup_frac"),
        )
        .orderBy("lang")
    )

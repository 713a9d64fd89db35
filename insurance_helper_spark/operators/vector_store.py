"""Maintained IVF vector store — the reference's Stage-3 "vector
database for semantic document storage" (/root/reference/README.md:108-110)
realized as Spark-MAINTAINED parquet tables plus an incremental ingest
operator, a drift-triggered re-election policy, a batch reassignment
maintenance op, and a probed serving path.

Tables under ``store_dir``:

- ``centroids/epoch=E/``  — (cell int, cvec array<double>): the coarse
  quantizer elected at epoch E. Current epoch = max(epoch). Election is
  the engine's portable IVF recipe (knuth-hash seeded sample + ONE
  1e9-quantized Lloyd step — the exact arithmetic the oracle-backed
  ``similarity_ann_frontier_eval`` / ``vector_store_assignment_census``
  queries pin), so a re-elected quantizer is reproducible from the
  store content alone.
- ``vectors/ingest_batch=B/`` — (vec_id long, vv array<double>,
  cell int, epoch long): the stored vectors with the cell they were
  assigned under. A re-election batch reassigns every pre-existing
  partition INLINE (r12), so in steady state all rows carry the
  current epoch; ``reassign_stale`` remains the explicit healer for
  crash windows and legacy stores, and ``stale_fraction`` is the
  serving-side health probe.
- ``reports/ingest_batch=B/`` — one row per micro-batch:
  (epoch long, n_vectors long, occupancy_psi double, reelected boolean,
  mean_cos double, note string).

Replay safety: every write is a dynamic partition overwrite keyed by
ingest_batch (vectors, reports) or epoch (centroids) — the sanctioned
batch-id contract (see streaming/ops.py::corpus_ingest_stream). Two
mechanisms make a replay bit-identical in EVERY crash window: (1) a
batch whose vectors partition already holds exactly its vec_ids is a
no-op (fully-committed batch replayed in a new lineage — e.g. after a
lost checkpoint), and reports are written BEFORE vectors so that
"vectors committed" implies "report committed"; (2) a partially
committed batch recomputes every decision from "store content minus
its own partition", which is exactly the state the original run saw,
so the re-election decision, the elected centroids, the assignments,
and the report all come out identical and the overwrites rewrite the
same bytes.

Drift policy: each batch's CELL-OCCUPANCY histogram is PSI-scored
against the occupancy of all current-epoch rows already in the store
(Laplace-smoothed, per-cell contributions quantized round(1e9·) before
the fold — the drift_gate_stream arithmetic on a k-bucket spine).
PSI >= threshold means the coarse quantizer no longer matches the data
(cells are filling in proportions the index wasn't balanced for) and
triggers re-election over the full store plus the incoming batch.

Scale stance: centroids are k x d rows (k <= a few hundred) — always
broadcast; assignment is a broadcast crossJoin + row_number per vector
(k candidate rows each, codegen'd JVM cosine — no Python in the path);
occupancy and mean-cos are k-row / 1-row exact-integer folds; the only
driver materializations are the k-row occupancy census, the 1-row
report, and (on re-election) nothing — election is distributed
(TakeOrdered seeds + posexplode quantized means). Vectors never shuffle
except at election's k x d mean rollup. At warehouse scale the vectors
table would be partitioned/bucketed BY CELL so probing becomes
partition pruning; here cell is a pruned predicate column because
re-election would churn cell directories.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import Window as W

from insurance_helper_spark.functions.hashing import (
    KEY_REDUCE,
    KNUTH_MOD,
    KNUTH_MUL,
)
from insurance_helper_spark.operators.similarity import cosine

VECTORS_SCHEMA = "vec_id long, vv array<double>, cell int, epoch long, ingest_batch long"
CENTROIDS_SCHEMA = "cell int, cvec array<double>, epoch long"
REPORTS_SCHEMA = (
    "epoch long, n_vectors long, occupancy_psi double, reelected boolean,"
    " mean_cos double, note string, ingest_batch long"
)


def _elect_centroids(vecs: DataFrame, n_centroids: int) -> DataFrame:
    """Elect ``n_centroids`` coarse centroids from (vec_id, vv):
    knuth-hash seeded sample (reproducible, TakeOrdered — no full sort)
    + one Lloyd step with exact 1e9-quantized means. Returns
    (cell int, cvec array<double>) with DENSE cell ids 0..k-1 in seed
    order. Distributed: the only k x d relation is the mean rollup."""
    hkey = (F.col("vec_id") % KEY_REDUCE) * KNUTH_MUL % KNUTH_MOD
    seeds = (
        vecs.orderBy(hkey, "vec_id")
        .limit(n_centroids)
        .withColumn(
            "cell",
            F.row_number().over(W.orderBy(hkey, "vec_id")).cast("int") - 1,
        )
        .select("cell", F.col("vv").alias("cvec"))
    )
    # r14: the kernel _assign carries vv through unchanged, so the
    # mean rollup reads it directly — the former a1-to-vecs re-join
    # (one shuffle of the vector payload) disappears from the plan.
    a1 = _assign(vecs, seeds).select("cell", "vv")
    means = (
        a1.select("cell", F.posexplode("vv").alias("dim", "val"))
        .groupBy("cell", "dim")
        .agg(
            (
                F.sum(F.round(F.col("val") * 1e9).cast("long")).cast("double")
                / 1e9
                / F.count("*")
            ).alias("mu")
        )
        .groupBy("cell")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("dim", "mu"))), lambda s: s.mu
            ).alias("cvec")
        )
    )
    # a cell that lost all members keeps its seed vector
    return (
        seeds.join(means.withColumnRenamed("cvec", "mvec"), "cell", "left")
        .select("cell", F.coalesce("mvec", "cvec").alias("cvec"))
    )


def _round4_half_up_matrix(cos):
    """round(x, 4) with Spark's HALF_UP tie semantics, vectorized over
    a float64 matrix. The naive float path (scale, floor, compare the
    fraction against 0.5, away-from-zero) agrees with Spark's
    decimal-representation HALF_UP everywhere except within ~1e-12 of
    an exact .00005 boundary; those knife-edge entries (margin 1e-9,
    three orders of magnitude of slack) are re-rounded through
    ``Decimal(repr(x))`` — the same shortest-roundtrip-string HALF_UP
    the JVM's BigDecimal.valueOf path applies. NaN passes through
    (callers map it for ordering)."""
    import numpy as np

    # errstate covers the whole computation: inf inputs (inf cosines
    # from zero-norm edge cases) otherwise warn on `a - fl` (inf - inf
    # = nan), not just on the final compare (ADVICE r14).
    with np.errstate(invalid="ignore"):
        a = np.abs(cos) * 1e4
        fl = np.floor(a)
        frac = a - fl
        r = np.where(frac >= 0.5, fl + 1.0, fl)
        out = np.sign(cos) * r / 1e4
        risky = np.abs(frac - 0.5) < 1e-9
    if risky.any():
        from decimal import ROUND_HALF_UP, Decimal

        for pos in np.argwhere(risky):
            x = float(cos[tuple(pos)])
            out[tuple(pos)] = float(
                Decimal(repr(x)).quantize(Decimal("0.0001"), rounding=ROUND_HALF_UP)
            )
    return out


def _assign(vecs: DataFrame, cents: DataFrame) -> DataFrame:
    """Nearest-centroid assignment: round(cosine, 4) DESC / cell ASC
    argmax per vector (the proven ml_kmeans_lloyd_step tie rule).
    Returns (vec_id, vv, cell, cos_c).

    CONTRACTS (ADVICE r14): (a) the ``cell`` output column carries the
    INPUT ``cents.cell`` type — integer centroid ids stay int, LONG ids
    (e.g. vec_id-derived seeds in the ANN frontier eval) stay long and
    can never wrap at id domains past 2^31; (b) ``vv`` elements must be
    null-free — a NULL element becomes NaN inside the kernel, and NaN
    cosines sort GREATEST (Spark's descending NaN rule for genuine 0/0)
    whereas the former JVM plan emitted NULL cos_c (sorted LAST):
    null-bearing vectors are a caller bug, not a supported input (the
    fixture embedding tables are null-free by schema contract);
    (c) the centroid relation is collected to the driver (Arrow) at
    DataFrame-CONSTRUCTION time — building the plan runs the ``cents``
    job eagerly, so call sites that assign against the same centroid
    lineage more than once should localCheckpoint it first.

    r14 (guide §4.1/§2.4): the k x d quantizer collects once to a
    driver numpy matrix (Arrow columnar — never Row objects) and the
    corpus is scanned ONCE in mapInPandas blocks; the former plan
    (crossJoin to k candidate rows per vector + a per-vec_id
    row_number window) shuffled k·|corpus| rows and evaluated the
    interpreted zip_with/aggregate cosine per candidate. Arithmetic is
    bit-identical: per dimension i the kernel performs the same
    fused-free float64 ops (dot += v_i·c_i, n2 += v_i·v_i, vectorized
    across rows, sequential across dims — the exact fold order of
    similarity.dot/norm), cos = dot / (sqrt(n2_v)·sqrt(n2_c)), and the
    returned cos_c is F.round of the RAW selected cosine, so the value
    path never touches Python rounding. The argmax key replicates
    round-4 HALF_UP (knife-edge entries via Decimal(repr()) — see
    _round4_half_up_matrix) with NaN ordered greatest, Spark's
    descending-sort rule. Equivalence with the former plan is pinned
    on fixtures by tests/test_vector_store.py."""
    import numpy as np

    from insurance_helper_spark.operators.similarity import arrow_id_matrix
    from insurance_helper_spark.shipping import ensure_shipped

    spark = vecs.sparkSession
    ensure_shipped(spark)
    # cell dtype follows the input centroid id type (ADVICE r14: the
    # unconditional int32 cast silently wrapped long ids >= 2^31,
    # merging distinct centroids at large id domains).
    cell_spark_type = cents.schema["cell"].dataType.simpleString()
    cell_np_dtype = {"int": "int32", "bigint": "int64", "smallint": "int16"}.get(
        cell_spark_type
    )
    if cell_np_dtype is None:
        raise TypeError(f"_assign: unsupported cell id type {cell_spark_type}")
    cell_ids, cmat = arrow_id_matrix(cents.select("cell", "cvec"), "cell", "cvec")
    order = np.argsort(cell_ids, kind="stable")  # cell ASC = argmax-first tie rule
    cell_ids, cmat = cell_ids[order], np.ascontiguousarray(cmat[order])
    k, d = cmat.shape
    nc2 = np.zeros(k)
    for i in range(d):
        nc2 += cmat[:, i] * cmat[:, i]
    cnorm = np.sqrt(nc2)

    def run(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            try:
                V = np.array(list(pdf["vv"]), dtype=np.float64)
            except ValueError as exc:  # ragged rows never form a matrix
                raise ValueError(
                    f"_assign: vectors must be uniform width {d}"
                ) from exc
            if V.ndim != 2 or V.shape[1] != d:
                raise ValueError(
                    f"_assign: vectors must be uniform width {d}, got {V.shape}"
                )
            n = len(V)
            dot = np.zeros((n, k))
            nv2 = np.zeros(n)
            for i in range(d):
                dot += V[:, i : i + 1] * cmat[None, :, i]
                nv2 += V[:, i] * V[:, i]
            with np.errstate(divide="ignore", invalid="ignore"):
                cos = dot / (np.sqrt(nv2)[:, None] * cnorm[None, :])
            key = _round4_half_up_matrix(cos)
            key = np.where(np.isnan(key), np.inf, key)  # Spark: NaN sorts greatest
            sel = (key == key.max(axis=1)[:, None]).argmax(axis=1)
            out = pdf[["vec_id", "vv"]].copy()
            out["cell"] = cell_ids[sel].astype(cell_np_dtype)
            out["cos_raw"] = cos[np.arange(n), sel]
            yield out

    return vecs.select("vec_id", "vv").mapInPandas(
        run,
        schema=f"vec_id long, vv array<double>, cell {cell_spark_type}, cos_raw double",
    ).select("vec_id", "vv", "cell", F.round("cos_raw", 4).alias("cos_c"))


def read_centroids(spark: SparkSession, store_dir: str, epoch: int | None = None) -> DataFrame:
    """Centroid table (explicit schema — the epoch DIRECTORY key would
    re-infer as INT). ``epoch=None`` returns the CURRENT (max) epoch."""
    df = spark.read.schema(CENTROIDS_SCHEMA).parquet(f"{store_dir}/centroids")
    if epoch is None:
        cur = df.agg(F.max("epoch")).first()[0]
        return df.where(F.col("epoch") == cur)
    return df.where(F.col("epoch") == epoch)


def read_vector_store(spark: SparkSession, store_dir: str) -> DataFrame:
    """The stored vectors with their cell/epoch (explicit schema — the
    ingest_batch directory key must stay LONG)."""
    return spark.read.schema(VECTORS_SCHEMA).parquet(f"{store_dir}/vectors")


def read_store_reports(spark: SparkSession, store_dir: str) -> DataFrame:
    return spark.read.schema(REPORTS_SCHEMA).parquet(f"{store_dir}/reports")


def _occupancy(df: DataFrame) -> dict[int, int]:
    """Exact per-cell counts, collected (k rows — bounded by the
    centroid count, never by data size)."""
    return {
        r["cell"]: r["n"]
        for r in df.groupBy("cell").agg(F.count("*").cast("long").alias("n")).collect()
    }


def occupancy_psi(
    batch: dict[int, int], hist: dict[int, int], n_cells: int
) -> float:
    """PSI between two cell-occupancy histograms over the FIXED
    0..n_cells-1 bucket spine, both sides Laplace-smoothed, each
    bucket's contribution quantized round(1e9·) before the fold — the
    drift_gate_stream arithmetic on the IVF cell space. Pure-Python on
    k <= a few hundred exact integer counts, so the result is
    bit-stable regardless of how the counts were aggregated."""
    n = sum(batch.values())
    m = sum(hist.values())
    acc = 0
    for c in range(n_cells):
        p = (batch.get(c, 0) + 1) / (n + n_cells)
        q = (hist.get(c, 0) + 1) / (m + n_cells)
        acc += round(1e9 * (p - q) * math.log(p / q))
    return acc / 1e9


def _mean_cos(assigned: DataFrame) -> float | None:
    """Mean assignment cosine with the per-row round(1e6·) BIGINT
    quantization, so the report value is partial-agg-order-stable."""
    r = assigned.agg(
        F.sum(F.round(F.col("cos_c") * 1e6).cast("long")).alias("s"),
        F.count("*").cast("long").alias("n"),
    ).first()
    if not r["n"]:
        return None
    return round(r["s"] / r["n"] / 1e6, 6)


def vector_store_ingest_stream(
    spark: SparkSession,
    input_dir: str,
    store_dir: str,
    checkpoint_dir: str,
    n_centroids: int = 8,
    psi_threshold: float = 0.25,
    schema: str = "vec_id long, embedding array<float>",
    max_files_per_trigger: int = 1,
) -> None:
    """Incremental vector-store maintenance: each micro-batch of new
    embeddings is assigned to the current coarse quantizer (broadcast
    centroids), occupancy-drift is scored, and a PSI breach re-elects
    the quantizer over the full store + the batch (new epoch). The
    first batch elects epoch 0. Trigger.AvailableNow — a cron
    invocation drains whatever landed since the last checkpoint (the
    reference's monthly delta shape applied to the vector database).

    See the module docstring for the replay contract (dynamic partition
    overwrite on ingest_batch / epoch; delete-checkpoint-and-rerun is
    pinned by tests/test_vector_store.py)."""
    from pyspark.errors import AnalysisException

    def process_batch(batch_df: DataFrame, batch_id: int) -> None:
        spark_b = batch_df.sparkSession
        vecs = batch_df.select(
            "vec_id", F.col("embedding").cast("array<double>").alias("vv")
        )
        if vecs.isEmpty():
            return
        vecs = vecs.localCheckpoint(eager=True)  # election + assign share it

        # Replay no-op guard: if this batch's vectors partition already
        # holds EXACTLY this batch's vec_ids, the whole batch (report
        # included — reports are written BEFORE vectors, so a committed
        # vectors partition implies a committed report) was fully
        # processed in a previous lineage; skip. This is what makes a
        # delete-checkpoint-and-rerun bit-identical END TO END: without
        # it, a full replay would re-assign early batches against the
        # FINAL store state (correct, but not bit-stable).
        try:
            mine = (
                read_vector_store(spark_b, store_dir)
                .where(F.col("ingest_batch") == batch_id)
                .select("vec_id")
            )
            n_mine = mine.count()
            if n_mine:
                n_batch = vecs.count()
                if (
                    n_mine == n_batch
                    and mine.join(vecs.select("vec_id"), "vec_id").count() == n_batch
                ):
                    # Heal the one crash window inline reassignment
                    # leaves: vectors committed, crash before the
                    # post-re-election reassign ran. Keyed on a stale
                    # row actually existing (ADVICE r12): a full
                    # replay hits this guard once per batch, and an
                    # unconditional reassign_stale pays a centroid
                    # read + distinct scan + collect N times when at
                    # most one heal does anything — a limit-1 probe on
                    # the epoch column decides instead. Idempotent
                    # (same bytes when rerun), so replay stays
                    # bit-identical.
                    cur = read_centroids(spark_b, store_dir).first()["epoch"]
                    stale_exists = bool(
                        read_vector_store(spark_b, store_dir)
                        .where(F.col("epoch") != cur)
                        .select("epoch")
                        .limit(1)
                        .take(1)
                    )
                    if stale_exists:
                        reassign_stale(spark_b, store_dir)
                    return
        except AnalysisException:
            pass  # no vectors table yet

        # EVERY decision below is a function of (others, batch) only:
        # "others" = the vectors table minus this batch's own partition,
        # which is exactly the state the original run saw — so a replay
        # after a crash ANYWHERE in this function (including between the
        # centroid write and the vector write) recomputes identical
        # centroids, assignments, and report. The centroids table is
        # only ever READ at the epoch derived from others, never trusted
        # for "what is current".
        try:
            others = (
                read_vector_store(spark_b, store_dir)
                .where(F.col("ingest_batch") != batch_id)
                .localCheckpoint(eager=True)  # epoch max + psi + election
            )
            if others.isEmpty():
                others = None
        except AnalysisException:
            others = None  # first batch only — corrupt tables must fail

        psi: float | None = None
        reelected = False
        if others is None:
            cents = _elect_centroids(vecs, n_centroids).localCheckpoint(eager=True)
            epoch = 0
            note = "initial_epoch"
            _write_centroids(cents, store_dir, epoch)
        else:
            epoch = others.agg(F.max("epoch")).first()[0]
            cents = read_centroids(spark_b, store_dir, epoch=epoch).localCheckpoint(
                eager=True
            )
            assigned = _assign(vecs, cents)
            hist_occ = _occupancy(others.where(F.col("epoch") == epoch))
            if hist_occ:
                psi = occupancy_psi(_occupancy(assigned), hist_occ, n_centroids)
            if psi is not None and psi >= psi_threshold:
                reelected = True
                all_vv = others.select("vec_id", "vv").unionByName(vecs)
                cents = _elect_centroids(all_vv, n_centroids).localCheckpoint(
                    eager=True
                )
                epoch = epoch + 1
                note = "reelected"
                _write_centroids(cents, store_dir, epoch)
            else:
                note = "assigned" if psi is not None else "history_empty"

        final = _assign(vecs, cents).localCheckpoint(eager=True)  # report + write
        # report FIRST, vectors SECOND: the no-op replay guard keys on
        # the vectors partition, so "vectors committed" must imply
        # "report committed" for every crash window to replay cleanly
        report = [
            (
                int(epoch),
                int(final.count()),
                psi,
                bool(reelected),
                _mean_cos(final),
                note,
                int(batch_id),
            )
        ]
        (
            spark_b.createDataFrame(report, REPORTS_SCHEMA)
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("ingest_batch")
            .parquet(f"{store_dir}/reports")
        )
        (
            final.select(
                "vec_id",
                "vv",
                "cell",
                F.lit(epoch).cast("long").alias("epoch"),
                F.lit(batch_id).cast("long").alias("ingest_batch"),
            )
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("ingest_batch")
            .parquet(f"{store_dir}/vectors")
        )
        # Lifecycle tightening (VERDICT r11 item 4): a re-election used
        # to leave EVERY pre-existing row stale (on the serving path's
        # exact-scan fallback) until an operator remembered to run
        # reassign_stale. Run it inline instead, so a re-election batch
        # ends with 100% current-epoch rows. Replay-safe in every crash
        # window: a crash before this line replays through the no-op
        # guard above, which heals; a crash mid-reassign reruns an
        # idempotent partition rewrite (same bytes).
        if reelected:
            reassign_stale(spark_b, store_dir)

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(input_dir)
    )
    q = (
        stream.writeStream.foreachBatch(process_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def _write_centroids(cents: DataFrame, store_dir: str, epoch: int) -> None:
    (
        cents.select("cell", "cvec", F.lit(epoch).cast("long").alias("epoch"))
        .coalesce(1)
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("epoch")
        .parquet(f"{store_dir}/centroids")
    )


def stale_fraction(spark: SparkSession, store_dir: str) -> float:
    """Serving-path health metric: the fraction of stored rows whose
    assignment epoch is BEHIND the current quantizer — exactly the rows
    ``vector_store_search`` must exact-scan instead of cell-probing.
    0.0 is the healthy steady state (the stream reassigns inline after
    a re-election); anything above 0 means a maintenance crash window
    and the next drain (or an explicit ``reassign_stale``) will heal
    it. One k-free aggregate over the vectors table."""
    cur = read_centroids(spark, store_dir).first()["epoch"]
    r = read_vector_store(spark, store_dir).agg(
        F.count("*").cast("long").alias("n"),
        F.sum(F.when(F.col("epoch") != cur, 1).otherwise(0)).cast("long").alias("s"),
    ).first()
    return (r["s"] / r["n"]) if r["n"] else 0.0


def reassign_stale(spark: SparkSession, store_dir: str) -> int:
    """Batch maintenance: rewrite every vectors partition whose rows
    were assigned under an older epoch with cells from the CURRENT
    quantizer (whole ingest_batch partitions, dynamic overwrite — the
    same idempotent unit the stream writes). Returns the number of
    rows upgraded. The ingest stream runs this INLINE after every
    re-election (r12), so in steady state it finds nothing; it remains
    exposed for crash-window healing and for stores written by older
    engine versions."""
    cents = read_centroids(spark, store_dir).localCheckpoint(eager=True)
    cur = cents.first()["epoch"]
    vectors = read_vector_store(spark, store_dir)
    stale_batches = [
        r["ingest_batch"]
        for r in vectors.where(F.col("epoch") != cur)
        .select("ingest_batch")
        .distinct()
        .collect()
    ]
    if not stale_batches:
        return 0
    rows = vectors.where(F.col("ingest_batch").isin(stale_batches))
    upgraded = _assign(rows.select("vec_id", "vv"), cents).join(
        rows.select("vec_id", "ingest_batch"), "vec_id"
    )
    out = upgraded.select(
        "vec_id", "vv", "cell", F.lit(cur).cast("long").alias("epoch"), "ingest_batch"
    ).localCheckpoint(eager=True)
    n = out.count()
    (
        out.write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("ingest_batch")
        .parquet(f"{store_dir}/vectors")
    )
    return n


def vector_store_search(
    spark: SparkSession,
    store_dir: str,
    queries: DataFrame,
    k: int = 5,
    n_probe: int = 2,
) -> DataFrame:
    """Probed ANN serving over the maintained store: each query scans
    only the vectors whose stored cell is among its ``n_probe`` nearest
    current-epoch centroids (a broadcast (query_id, cell) equi-join —
    partition pruning at warehouse scale). Rows still carrying a STALE
    epoch (re-election happened, ``reassign_stale`` hasn't run) are
    exact-scanned and unioned so results stay correct while maintenance
    is pending — the documented slow path. The query side is bounded
    (ad-hoc queries), the store side never collects.

    Returns (query_id, neighbor_id, cosine_sim, nn_rank <= k)."""
    cents = read_centroids(spark, store_dir).localCheckpoint(eager=True)
    cur = cents.first()["epoch"]
    qv = queries.select(
        F.col(queries.columns[0]).alias("query_id"),
        F.col(queries.columns[1]).cast("array<double>").alias("qv"),
    ).localCheckpoint(eager=True)

    wp = W.partitionBy("query_id").orderBy(F.desc("cos_c"), "cell")
    probes = (
        qv.crossJoin(F.broadcast(cents.select("cell", "cvec")))
        .select(
            "query_id",
            "cell",
            F.round(cosine(F.col("qv"), F.col("cvec")), 4).alias("cos_c"),
        )
        .withColumn("rn", F.row_number().over(wp))
        .where(F.col("rn") <= n_probe)
        .select("query_id", "cell")
    )

    vectors = read_vector_store(spark, store_dir)
    current = vectors.where(F.col("epoch") == cur)
    stale = vectors.where(F.col("epoch") != cur)
    probed = current.join(F.broadcast(probes), "cell").select(
        "query_id", F.col("vec_id").alias("neighbor_id"), "vv"
    )
    fallback = stale.crossJoin(F.broadcast(qv.select("query_id"))).select(
        "query_id", F.col("vec_id").alias("neighbor_id"), "vv"
    )
    cand = probed.unionByName(fallback).join(F.broadcast(qv), "query_id")
    scored = cand.where(F.col("neighbor_id") != F.col("query_id")).select(
        "query_id",
        "neighbor_id",
        F.round(cosine(F.col("vv"), F.col("qv")), 6).alias("cosine_sim"),
    )
    wr = W.partitionBy("query_id").orderBy(F.desc("cosine_sim"), "neighbor_id")
    return (
        scored.withColumn("nn_rank", F.row_number().over(wr))
        .where(F.col("nn_rank") <= k)
    )

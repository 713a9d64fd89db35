"""Session-scoped memoized checkpoints shared across query families.

Several query families derive from one small intermediate relation
that is expensive to build but cheap to hold (the co-purchase edge
list for the nine graph queries, the cumulative development triangle
for the six reserving queries). ``memo_checkpoint`` builds the
relation ONCE per (applicationId, key), eagerly localCheckpoints it,
and returns the cached DataFrame on every later call in the same
session — the in-session analogue of publishing the relation as a
bucketed table at warehouse scale.

Keyed by applicationId so a stopped-and-restarted session can never
see stale checkpoint blocks. ``KEEP_RDD_IDS`` records the checkpoint
RDD ids PER applicationId: localCheckpoint TRUNCATES lineage, so any
external block sweeper (bench.py's between-query ``_release_blocks``,
tools/ansi_sweep.py) must skip exactly these ids or every later
consumer breaks unrecoverably. The per-app keying matters because RDD
ids restart from 0 in a new SparkContext within the same process —
a flat global set would make sweepers silently skip unrelated blocks
after a session restart (ADVICE r10). Sweepers call ``keep_ids(spark)``
to get the CURRENT app's set.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

_CACHE: dict = {}
KEEP_RDD_IDS: dict[str, set] = {}


def keep_ids(spark: SparkSession) -> set:
    """The checkpoint RDD ids a block sweeper must NOT unpersist, for
    the session's current application only."""
    return KEEP_RDD_IDS.get(spark.sparkContext.applicationId, set())


def _persistent_rdd_ids(spark: SparkSession) -> set:
    return {r.id() for r in spark.sparkContext._jsc.getPersistentRDDs().values()}


def memo_checkpoint(
    spark: SparkSession, key: tuple, build: Callable[[], DataFrame]
) -> DataFrame:
    """Return the memoized eagerly-checkpointed relation for ``key``,
    building it with ``build()`` on first use in this session."""
    app_id = spark.sparkContext.applicationId
    full_key = (app_id,) + tuple(key)
    cached = _CACHE.get(full_key)
    if cached is not None:
        return cached
    before = _persistent_rdd_ids(spark)
    df = build().localCheckpoint(eager=True)
    KEEP_RDD_IDS.setdefault(app_id, set()).update(
        _persistent_rdd_ids(spark) - before
    )
    _CACHE[full_key] = df
    return df


def doc_shingles(spark: SparkSession, sf_dir: str, k: int = 3) -> DataFrame:
    """Memoized hashed k-token shingle relation over the FULL documents
    table: distinct (doc_id, h) rows, h = xxhash64 of each k-token
    shingle tuple (operators/dedup.hashed_shingle_rows).

    This is the base relation the entire dedup family derives from —
    n-gram Jaccard (plain/capped/prefix), MinHash signatures, cluster
    resolution, the curation funnel, and the linkage queries all start
    here. Before r12 each query re-ran tokenize→posexplode→window→
    distinct per call (and twice per self-join); now the family shares
    one build per (applicationId, sf_dir, k) — the in-session analogue
    of publishing the shingle table as a bucketed staged table at
    warehouse scale, exactly like the graph family's co-purchase edges.

    Queries whose input is a SUBSET of documents (with text unchanged)
    derive their relation by a doc_id semi-join: shingles are computed
    per document, so hashed_shingle_rows(subset) ≡ doc_shingles ⋉ ids.
    """
    from insurance_helper_spark.operators import dedup
    from insurance_helper_spark.sources.tables import load_table

    def build() -> DataFrame:
        docs = load_table(spark, sf_dir, "documents", columns=["doc_id", "text"])
        return dedup.hashed_shingle_rows(docs, "doc_id", "text", k=k)

    return memo_checkpoint(spark, ("doc_shingles", sf_dir, k), build)


def ngram_pair_stats(spark: SparkSession, sf_dir: str, k: int = 3) -> DataFrame:
    """Memoized ALL-pairs k-token-shingle statistics at threshold 0.0:
    (id_a, id_b, common, size_a, size_b, jaccard) for every document
    pair sharing ≥1 shingle, id_a < id_b, jaccard rounded to 6.

    The staged near-dup PAIR table: every downstream dedup policy is a
    cheap filter/projection of this relation — Jaccard ≥ t is a filter
    on `jaccard`, asymmetric containment is common/least(size_a,size_b)
    (sizes and common are per-pair facts, independent of which other
    documents exist), and a policy over a document SUBSET with
    unchanged text is the same filter semi-joined to the subset's ids.
    At warehouse scale this is the pair table a dedup pipeline
    publishes once per corpus snapshot and every curation job reads;
    in-session the memo plays that role. Built from the memoized
    shingle relation, so the tokenize never re-runs either.
    """
    from insurance_helper_spark.operators import dedup
    from insurance_helper_spark.sources.tables import load_table

    def build() -> DataFrame:
        docs = load_table(spark, sf_dir, "documents", columns=["doc_id", "text"])
        return dedup.ngram_jaccard_pairs(
            docs, "doc_id", "text", k=k, threshold=0.0,
            shingles=doc_shingles(spark, sf_dir, k),
        )

    return memo_checkpoint(spark, ("ngram_pair_stats", sf_dir, k), build)


def ngram_components(
    spark: SparkSession, sf_dir: str, k: int = 3, threshold: float = 0.5
) -> DataFrame:
    """Memoized connected-component labeling (member_id, cluster_id)
    of the Jaccard ≥ threshold near-dup graph over the full corpus —
    the published dedup-graph labeling that cluster policies (canonical
    winner, best-quality winner, survivorship) all consume. Derived
    from the memoized pair table, so the iterative min-label
    propagation runs once per (app, sf_dir, k, threshold)."""
    from pyspark.sql import functions as F

    from insurance_helper_spark.operators import dedup

    def build() -> DataFrame:
        pairs = ngram_pair_stats(spark, sf_dir, k).filter(
            F.col("jaccard") >= threshold
        )
        return dedup.connected_components(pairs)

    return memo_checkpoint(spark, ("ngram_components", sf_dir, k, threshold), build)

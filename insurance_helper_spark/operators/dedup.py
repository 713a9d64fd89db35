"""Deduplication operators: exact, MinHash-LSH, SimHash, n-gram Jaccard.

The reference dedups on exact ``document_url`` membership
(cli.py:101-103; delta_download.py:191). For an LLM-data pipeline we
add content-level near-dup detection, each designed to scale:

- exact: hash-groupBy on a content fingerprint — one shuffle, no O(n²).
- n-gram Jaccard: shingle-explode + equi-join on shingle → candidate
  pairs only where at least one shingle collides (never all-pairs).
- MinHash-LSH: constant-size signature per doc, banded bucketing,
  candidates only within buckets. Signature computation is pure column
  expressions (xxhash64 with per-permutation seeds), so it codegens.
- SimHash: 64-bit signature via per-token hashes; near-dups share
  signatures within Hamming distance ≤ k, found by pivoted band join.

All operators keep a deterministic winner (min key) so results are
stable and oracle-checkable where SQL can express them.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from insurance_helper_spark.functions import text as T


def dedup_exact(df: DataFrame, keys: list[str], order: list[Column] | None = None) -> DataFrame:
    """Keep exactly one row per key, deterministically (min of ``order``).

    ``dropDuplicates`` keeps an arbitrary row — fine for idempotence,
    wrong for reproducible pipelines — so we use a window argmin.
    Scale: one shuffle on the key; WindowGroupLimit prunes map-side.
    """
    order = order or [F.monotonically_increasing_id()]
    w = Window.partitionBy(*keys).orderBy(*order)
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def fingerprint_dedup(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Exact content dedup on the sha2 fingerprint of normalized text."""
    fp = T.fingerprint(F.col(text_col))
    return dedup_exact(df.withColumn("fingerprint", fp), ["fingerprint"], [F.col(id_col)])


# ---------------------------------------------------------------------------
# n-gram Jaccard
# ---------------------------------------------------------------------------


def hashed_shingle_rows(
    df: DataFrame, id_col: str, text_col: str, k: int = 3
) -> DataFrame:
    """Distinct (doc_id, h) rows — h a 64-bit hash of each k-token
    shingle — built WITHOUT higher-order functions.

    Construction: posexplode tokens → window lead(1..k-1) over token
    position → multi-arg xxhash64 of the k-token tuple → distinct.
    Everything whole-stage-codegens. The obvious alternative (a
    ``transform`` lambda over a token array) is interpreted per element,
    and Catalyst's project-collapsing re-inlines the tokenizer regex
    into the lambda — measured 18s vs 0.5s at sf0.1 for the SAME
    logical result; plan-inspection (`regexp_replace` count) is the
    regression test for this.

    Hashing the token tuple (not a joined string) keeps token boundaries
    exact; shingle-set distinctness matches string shingles modulo ~2⁻⁶⁴
    collisions. Scale: one repartition by doc feeds both the window sort
    and the downstream per-doc aggregates without further shuffles.
    """
    df = df.repartition(df.sparkSession.sparkContext.defaultParallelism, id_col)
    tok = df.select(
        F.col(id_col).alias("doc_id"), F.posexplode(T.tokens(F.col(text_col)))
    ).toDF("doc_id", "pos", "tok")
    w = Window.partitionBy("doc_id").orderBy("pos")
    leads = [F.lead("tok", j).over(w).alias(f"t{j}") for j in range(1, k)]
    sh = tok.select("doc_id", "tok", *leads).filter(F.col(f"t{k-1}").isNotNull())
    return sh.select(
        "doc_id",
        F.xxhash64("tok", *[f"t{j}" for j in range(1, k)]).alias("h"),
    ).distinct()


def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    k: int = 3,
    threshold: float = 0.2,
    max_doc_freq: int | None = None,
    materialize: bool = False,
    shingles: DataFrame | None = None,
) -> DataFrame:
    """All document pairs with k-token-shingle Jaccard ≥ threshold.

    Plan: distinct hashed shingle rows → self-equi-join on the shingle
    hash → count common shingles per pair → Jaccard =
    common/(|A|+|B|-common). Scale: the join key is the shingle, so only
    docs sharing ≥1 shingle ever meet; no all-pairs blowup.

    ``max_doc_freq`` is the hot-shingle skew guard: a shingle appearing
    in more than this many documents (a "stopword shingle") produces a
    quadratic candidate bucket in the self-join — at corpus scale one
    such key dominates the whole job. When set, shingles with document
    frequency > max_doc_freq are dropped BEFORE sizes are computed and
    before the join, so the Jaccard stays self-consistent over the
    filtered shingle sets (standard stopword-shingle filtering, the
    MinHash-era practice). The hot set is tiny by construction (few
    shingles can exceed the cap), so it broadcasts; the extra cost is
    one count-by-shingle aggregation — map-side-combined, same key
    distribution as the join it protects. Default None preserves exact
    full-set Jaccard for oracle comparison.

    ``materialize`` (default False) eagerly localCheckpoints the sized
    shingle relation before the self-join. A DataFrame self-join clones
    the lineage, so without it the tokenize→shingle→hash→window
    pipeline executes twice — but unlike the simhash/minhash/SRP
    signature relations (compact, one row per doc), the shingle table
    here is one row PER (doc, shingle): checkpointing it writes far
    more bytes than the recompute it saves (measured ~2× slower at
    sf0.1: 2.75 s vs 1.40 s warm). Default False keeps the pure lazy
    plan; pass True only when the upstream tokenize is genuinely more
    expensive than a full shingle-table write (e.g. text behind a
    costly UDF).

    ``shingles`` (default None) lets the caller supply a pre-built
    shingle relation — MUST equal ``hashed_shingle_rows(df, id_col,
    text_col, k)``, i.e. distinct (doc_id, h) rows over exactly the
    rows of ``df``. The query layer passes the session-memoized
    checkpoint (queries/shared_cache.doc_shingles), optionally
    semi-joined to a doc_id subset; a checkpointed relation also makes
    the self-join read blocks instead of re-executing the tokenize
    lineage twice, superseding ``materialize`` for that caller.

    Returns (id_a, id_b, common, size_a, size_b, jaccard) with id_a < id_b.
    """
    shd = shingles if shingles is not None else hashed_shingle_rows(df, id_col, text_col, k)
    if max_doc_freq is not None:
        hot = (
            shd.groupBy("h")
            .agg(F.count("*").alias("df"))
            .filter(F.col("df") > max_doc_freq)
            .select("h")
        )
        # sizes must be recomputed AFTER the cap — drop any staged
        # uncapped size so the Jaccard stays self-consistent over the
        # filtered shingle sets.
        shd = shd.select("doc_id", "h").join(F.broadcast(hot), "h", "left_anti")
    # set size per doc: window count over the doc partition (no orderBy →
    # whole-partition frame) — skipped when the caller supplies a staged
    # pre-sized relation (shared_cache.doc_shingles_sized; r15): the
    # self-join otherwise pays the doc_id Exchange+sort twice per run.
    if max_doc_freq is None and "sh_size" in shd.columns:
        sized = shd
    else:
        sized = shd.withColumn(
            "sh_size", F.count("*").over(Window.partitionBy("doc_id"))
        )
    if materialize:
        sized = sized.localCheckpoint(eager=True)
    a = sized.select(F.col("doc_id").alias("id_a"), "h", F.col("sh_size").alias("size_a"))
    b = sized.select(F.col("doc_id").alias("id_b"), "h", F.col("sh_size").alias("size_b"))
    return (
        a.join(b, "h")
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b", "size_a", "size_b")
        .agg(F.count("*").alias("common"))
        .withColumn(
            "jaccard",
            F.round(
                F.col("common").cast("double")
                / (F.col("size_a") + F.col("size_b") - F.col("common")).cast("double"),
                6,
            ),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "common", "size_a", "size_b", "jaccard")
    )


def ngram_jaccard_pairs_prefix(
    df: DataFrame,
    id_col: str,
    text_col: str,
    k: int = 3,
    threshold: float = 0.2,
    shingles: DataFrame | None = None,
) -> DataFrame:
    """EXACTLY the pairs ``ngram_jaccard_pairs`` returns, via AllPairs/
    PPJoin prefix filtering (Bayardo et al. 2007; Xiao et al. 2008) —
    a LOSSLESS candidate pruner, not an approximation.

    Why it scales better than the full shingle join: Jaccard ≥ t forces
    |A∩B| ≥ t·|A|, so under a canonical global shingle ordering
    (rarest-first: ascending document frequency, hash tiebreak) any
    qualifying pair must collide within each side's first
    |d| − ⌈t·|d|⌉ + 1 shingles. Only those PREFIX shingles are indexed
    and self-joined — the join's per-key bucket sizes shrink from df(h)
    to df_prefix(h), and rare shingles dominate prefixes by
    construction. A size filter (t·|A| ≤ |B|) prunes further, also
    losslessly. Verification then counts the full intersection for the
    surviving candidates ONLY (fan-out bounded by candidates × doc
    size, not by shingle document frequency squared). At threshold 0.5
    on the fixture the prefix join meets on 60% fewer shingle rows
    than the full join while returning the identical relation (pinned
    by tests/test_prefix_filter.py).

    Fixture-scale honesty: at sf0.1 this variant is WALL-CLOCK slower
    than the plain join (~8.7 s vs ~2.0 s warm) — the extra passes
    (document-frequency count, rarest-first rank window, candidate
    verify) are fixed stage overhead that a 260k-row shingle relation
    cannot amortize. The crossover is where the plain join's df(h)²
    bucket blow-up dominates — skewed web-scale corpora — which is
    exactly when ``max_doc_freq`` capping changes the answer and this
    pruner does not. Use plain + cap when approximate filtering is
    acceptable; use prefix when the EXACT relation is required at
    scale.

    ``shingles`` — same contract as ``ngram_jaccard_pairs``: a caller-
    supplied relation equal to ``hashed_shingle_rows(df, id_col,
    text_col, k)``. This plan consumes the shingle relation FOUR times
    (document-frequency count, size window, and both verify joins), so
    the memoized checkpoint pays off even more here than in the plain
    join.

    Returns (id_a, id_b, common, size_a, size_b, jaccard), id_a < id_b.
    """
    shd = shingles if shingles is not None else hashed_shingle_rows(df, id_col, text_col, k)
    # NOT checkpointed per-call: the shingle relation is one row per
    # (doc, shingle) — writing it costs more than recomputing the
    # codegen'd tokenize for a single consumer (the same measurement
    # that sets ngram_jaccard_pairs' materialize default to False);
    # the session-memoized relation amortizes the write across the
    # whole family instead.
    if "sh_size" in shd.columns:
        # staged pre-sized relation (shared_cache.doc_shingles_sized,
        # r15) — the doc_id Exchange+sort for the size disappears
        sized = shd
        shd = shd.select("doc_id", "h")
    else:
        sized = shd.withColumn(
            "sh_size", F.count("*").over(Window.partitionBy("doc_id"))
        )
    # r15: document frequency as a whole-partition count window over
    # the h key instead of groupBy(h)+join-back — one Exchange of the
    # shingle relation instead of two plus a join (guide §2.4; the
    # skew profile is identical to the self-join this index protects).
    ranked = sized.withColumn(
        "dfh", F.count("*").over(Window.partitionBy("h"))
    ).withColumn(
        "rn",
        F.row_number().over(Window.partitionBy("doc_id").orderBy("dfh", "h")),
    )
    # -1e-9: double error can push an exactly-integer t·|d| a hair
    # ABOVE the integer, over-lengthening the ceil and silently cutting
    # the prefix one short (a lossless filter must never under-index).
    prefix_len = (
        F.col("sh_size") - F.ceil(threshold * F.col("sh_size") - 1e-9) + 1
    )
    # r14: the prefix index feeds BOTH sides of the self-join, and a
    # self-join clones lineage — without this checkpoint the
    # document-frequency aggregate, the h-join and both doc-id windows
    # run twice (measured ~1.5 s of the composed query's warm time at
    # sf0.1; guide §2.4 reuse-don't-recompute). The relation is narrow
    # (2×long + int, ~half the shingle rows) and session-sweepable.
    prefix = (
        ranked.filter(F.col("rn") <= prefix_len)
        .select("doc_id", "h", "sh_size")
        .localCheckpoint(eager=True)
    )
    a = prefix.select(F.col("doc_id").alias("id_a"), "h", F.col("sh_size").alias("size_a"))
    b = prefix.select(F.col("doc_id").alias("id_b"), "h", F.col("sh_size").alias("size_b"))
    cand = (
        a.join(b, "h")
        .filter(F.col("id_a") < F.col("id_b"))
        # lossless length filter: J >= t forces t*max(|A|,|B|) <= min.
        .filter(
            F.greatest("size_a", "size_b") * threshold
            <= F.least("size_a", "size_b")
        )
        .select("id_a", "id_b", "size_a", "size_b")
        .dropDuplicates(["id_a", "id_b"])
    )
    # Verify candidates only: count the full intersection per pair.
    common = (
        cand.join(shd.select(F.col("doc_id").alias("id_a"), "h"), "id_a")
        .join(
            shd.select(F.col("doc_id").alias("id_b"), "h"), ["id_b", "h"], "left_semi"
        )
        .groupBy("id_a", "id_b", "size_a", "size_b")
        .agg(F.count("*").alias("common"))
    )
    return (
        common.withColumn(
            "jaccard",
            F.round(
                F.col("common").cast("double")
                / (F.col("size_a") + F.col("size_b") - F.col("common")).cast("double"),
                6,
            ),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "common", "size_a", "size_b", "jaccard")
    )


# ---------------------------------------------------------------------------
# MinHash + LSH
# ---------------------------------------------------------------------------


def minhash_signatures(
    df: DataFrame,
    id_col: str,
    text_col: str,
    k: int = 3,
    num_perm: int = 64,
    shingles: DataFrame | None = None,
) -> DataFrame:
    """MinHash signatures as (doc_id, sig array<bigint>[num_perm]).

    Permutation i is simulated by xxhash64(shingle_hash, seed=i) —
    re-hashing the 8-byte shingle hash, far cheaper than hashing the
    shingle string num_perm times. Signature element i is the min over
    the doc's shingle set (hashed_shingle_rows — codegen'd, HOF-free).
    The num_perm mins combine map-side so the shuffle carries one row
    per doc; with the input already clustered by doc_id the aggregation
    needs no exchange at all.

    ``shingles`` — same caller contract as ``ngram_jaccard_pairs``.
    """
    base = shingles if shingles is not None else hashed_shingle_rows(df, id_col, text_col, k)
    exploded = base.withColumnRenamed("h", "shingle")
    aggs = [
        F.min(F.xxhash64(F.col("shingle"), F.lit(i))).alias(f"__h{i}")
        for i in range(num_perm)
    ]
    return (
        exploded.groupBy("doc_id")
        .agg(*aggs)
        .select("doc_id", F.array(*[F.col(f"__h{i}") for i in range(num_perm)]).alias("sig"))
    )


def minhash_lsh_candidates(
    df: DataFrame,
    id_col: str,
    text_col: str,
    k: int = 3,
    num_perm: int = 64,
    bands: int = 16,
    materialize: bool = True,
    shingles: DataFrame | None = None,
    signatures: DataFrame | None = None,
) -> DataFrame:
    """Near-dup candidate pairs via banded MinHash-LSH.

    rows per band = num_perm // bands. Docs agreeing on ALL rows of any
    band land in the same bucket → candidate pair. Scale: signature is
    constant-size per doc; the bucket join is an equi-join on
    (band_idx, band_hash) — no all-pairs. Estimated Jaccard from
    signature agreement is attached for thresholding downstream.

    ``materialize`` eagerly localCheckpoints the signature table so the
    self-join doesn't execute the shingle→num_perm-hash aggregation
    twice (self-joins clone lineage). Signatures are constant-size
    (num_perm × 8 B/doc), so the checkpoint is cheap relative to the
    two full text passes it replaces; at warehouse scale this is the
    staged signature table.

    ``signatures`` — a caller-supplied (already materialized) signature
    relation equal to ``minhash_signatures(df, id_col, text_col, k,
    num_perm)``; skips the build AND the per-call checkpoint (the query
    layer passes the session-memoized signature table). ``shingles``
    feeds the internal build when signatures are not supplied.
    """
    rows_per_band = num_perm // bands
    if signatures is not None:
        sig_df = signatures
    else:
        sig_df = minhash_signatures(df, id_col, text_col, k, num_perm, shingles=shingles)
        if materialize:
            sig_df = sig_df.localCheckpoint(eager=True)

    banded = sig_df.select(
        "doc_id",
        "sig",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.xxhash64(
                            F.concat_ws(
                                ",",
                                *[
                                    F.col("sig").getItem(b * rows_per_band + r).cast("string")
                                    for r in range(rows_per_band)
                                ],
                            )
                        ).alias("bucket"),
                    )
                    for b in range(bands)
                ]
            )
        ).alias("bb"),
    ).select("doc_id", "sig", F.col("bb.band").alias("band"), F.col("bb.bucket").alias("bucket"))

    a = banded.alias("a")
    b = banded.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("id_a"),
            F.col("b.doc_id").alias("id_b"),
            F.col("a.sig").alias("sig_a"),
            F.col("b.sig").alias("sig_b"),
        )
        .dropDuplicates(["id_a", "id_b"])
    )
    # estimated jaccard = fraction of agreeing signature positions
    cand = cand.withColumn(
        "est_jaccard",
        F.round(
            F.size(F.filter(F.zip_with("sig_a", "sig_b", lambda x, y: x == y), lambda e: e))
            .cast("double")
            / F.size("sig_a").cast("double"),
            6,
        ),
    )
    return cand.select("id_a", "id_b", "est_jaccard")


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------


def simhash_signatures(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """64-bit SimHash signatures as (doc_id, sim bigint).

    Signature via PACKED bit-count aggregates over exploded token rows
    (token MULTISET, standard SimHash weighting): vote_j > 0 ⇔
    2·Σbit_j > n_tokens. Three 20-bit counters share one 64-bit sum
    (each token contributes ≤1 per field, so counters stay exact for
    docs up to 2^20 ≈ 1M tokens — chunk longer docs upstream), cutting
    the aggregate count 64 → 22. Fully codegen'd with map-side partial
    aggregation; same wall time as one-sum-per-bit at sf0.1 (cold time
    is codegen compilation) but 3× less generated aggregate code —
    lower compile/cache pressure across a multi-query run. The
    one-sum-per-bit form was ~4× faster than the interpreted
    aggregate/zip_with HOF it replaced.
    """
    import functools

    df = df.repartition(df.sparkSession.sparkContext.defaultParallelism, id_col)
    tok = df.select(
        F.col(id_col).alias("doc_id"), F.explode(T.tokens(F.col(text_col))).alias("tok")
    ).select("doc_id", F.xxhash64("tok").alias("th"))
    field_bits, fields_per_agg = 20, 3
    n_aggs = (64 + fields_per_agg - 1) // fields_per_agg
    packed_sums = []
    for a in range(n_aggs):
        bits = [a * fields_per_agg + f for f in range(fields_per_agg) if a * fields_per_agg + f < 64]
        packed = None
        for f, j in enumerate(bits):
            term = F.shiftleft(F.shiftright("th", j).bitwiseAND(F.lit(1)), f * field_bits)
            packed = term if packed is None else packed + term
        packed_sums.append(F.sum(packed).alias(f"__p{a}"))
    votes = tok.groupBy("doc_id").agg(F.count("*").alias("__n"), *packed_sums)
    field_mask = (1 << field_bits) - 1
    sim_bits = [
        F.when(
            F.shiftright(F.col(f"__p{j // fields_per_agg}"), (j % fields_per_agg) * field_bits)
            .bitwiseAND(F.lit(field_mask))
            * 2
            > F.col("__n"),
            F.shiftleft(F.lit(1).cast("bigint"), j),
        ).otherwise(F.lit(0).cast("bigint"))
        for j in range(64)
    ]
    return votes.select(
        "doc_id", functools.reduce(lambda x, y: x.bitwiseOR(y), sim_bits).alias("sim")
    )


def simhash_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    max_hamming: int = 3,
    bands: int = 4,
    materialize: bool = True,
    signatures: DataFrame | None = None,
) -> DataFrame:
    """Near-dup pairs with SimHash Hamming distance ≤ max_hamming.

    Pigeonhole blocking: split the 64-bit signature into ``bands``
    16-bit blocks; any pair within distance ≤ bands-1 agrees exactly on
    ≥1 block, so candidates come from an equi-join on (block_idx,
    block_value) — no all-pairs scan. Verify exact Hamming ≤ k on
    candidates only. That guarantee is pinned as a test
    (tests/test_lsh_recall.py) against brute-force hamming over
    ``simhash_signatures``.

    ``materialize`` eagerly localCheckpoints the 16-byte-per-doc
    signature table before the block self-join; without it the clone of
    the lineage runs the tokenize→explode→packed-bit-count aggregation
    twice (measured ~2× the operator's wall time at sf0.1).

    ``signatures`` — a caller-supplied (already materialized) relation
    equal to ``simhash_signatures(df, id_col, text_col)``; skips both
    the build and the per-call checkpoint (the query layer passes the
    session-memoized signature table).
    """
    block_bits = 64 // bands
    mask = (1 << block_bits) - 1
    if signatures is not None:
        sig = signatures
    else:
        sig = simhash_signatures(df, id_col, text_col)
        if materialize:
            sig = sig.localCheckpoint(eager=True)
    blocks = sig.select(
        "doc_id",
        "sim",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("blk"),
                        F.shiftrightunsigned("sim", i * block_bits)
                        .bitwiseAND(F.lit(mask))
                        .alias("val"),
                    )
                    for i in range(bands)
                ]
            )
        ).alias("bb"),
    ).select("doc_id", "sim", F.col("bb.blk").alias("blk"), F.col("bb.val").alias("val"))
    a, b = blocks.alias("a"), blocks.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.blk") == F.col("b.blk"))
            & (F.col("a.val") == F.col("b.val"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("id_a"),
            F.col("b.doc_id").alias("id_b"),
            F.col("a.sim").alias("sim_a"),
            F.col("b.sim").alias("sim_b"),
        )
    )
    # Hamming BEFORE the pair dedup: bit_count is a map-side one-liner,
    # while dropDuplicates is a shuffle — filtering first shrinks that
    # shuffle to surviving pairs only (measured ~10× fewer rows at
    # sf0.1; a pair matching in several blocks verifies ≤ bands times,
    # far cheaper than shuffling every candidate).
    hamming = F.bit_count(F.col("sim_a").bitwiseXOR(F.col("sim_b")))
    return (
        cand.withColumn("hamming", hamming)
        .filter(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", "hamming")
        .dropDuplicates(["id_a", "id_b"])
    )


# ---------------------------------------------------------------------------
# Pair → cluster resolution (connected components)
# ---------------------------------------------------------------------------


def connected_components(
    pairs: DataFrame,
    src_col: str = "id_a",
    dst_col: str = "id_b",
    max_iter: int = 25,
) -> DataFrame:
    """Resolve near-dup PAIRS into clusters: (member_id, cluster_id)
    with cluster_id = min member id of the component.

    Iterative min-label propagation (the HashToMin idea): each round
    every vertex adopts the smallest label among itself and its
    neighbors; converges in O(component diameter) rounds — near-dup
    components are shallow (dup clusters, not social graphs), so a
    handful of rounds suffices. Each round is one join + one
    min-aggregate; ``localCheckpoint`` truncates the growing lineage so
    round N doesn't re-execute rounds 1..N-1 (the classic iterative-
    DataFrame trap). The per-round convergence check is a scalar
    ``count``, not a data collect.

    Only vertices that appear in ``pairs`` are labeled (singletons are
    their own trivial cluster and never need resolution).
    """
    edges = (
        pairs.select(F.col(src_col).alias("s"), F.col(dst_col).alias("d"))
        .unionByName(pairs.select(F.col(dst_col).alias("s"), F.col(src_col).alias("d")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    labels = edges.select(F.col("s").alias("id")).distinct().withColumn(
        "label", F.col("id")
    ).localCheckpoint(eager=True)
    for _ in range(max_iter):
        msgs = (
            edges.join(labels, edges.s == labels.id)
            .select(F.col("d").alias("id"), "label")
        )
        new_labels = (
            labels.unionByName(msgs)
            .groupBy("id")
            .agg(F.min("label").alias("label"))
            .localCheckpoint(eager=True)
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "id")
            .filter(F.col("n.label") != F.col("o.label"))
            .count()
        )
        labels = new_labels
        if changed == 0:
            break
    return labels.select(F.col("id").alias("member_id"), F.col("label").alias("cluster_id"))


def keep_canonical_per_cluster(
    df: DataFrame, components: DataFrame, id_col: str
) -> DataFrame:
    """Drop every non-canonical member of each near-dup cluster: keep
    the row whose id IS the cluster_id (min id — deterministic winner),
    plus all rows never seen in any pair."""
    losers = components.filter(F.col("member_id") != F.col("cluster_id")).select(
        F.col("member_id").alias(id_col)
    )
    return df.join(losers, id_col, "left_anti")

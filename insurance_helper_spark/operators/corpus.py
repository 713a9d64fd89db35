"""Corpus-preparation operators for LLM training-data pipelines.

These are the Stage-2 capabilities the reference DECLARES
(README.md:73-101 — text normalization, feature extraction) taken to
the scale a 100 TB pretraining corpus needs: duplicated-span removal
(the C4/Lee-et-al. "deduplicate repeated substrings" step), benchmark
contamination screening, Gopher-style repetition gates, and greedy
sequence packing for context-window batching.

Design rules shared by every operator here:

- tokenization is the same cheap normalizer used across the engine
  (lower → strip non-alnum → whitespace split), entirely Catalyst
  column expressions — no Python in the hot path;
- pair/membership generation always goes through an equi-join on a
  token-span hash, never an all-pairs comparison;
- per-document state stays in arrays inside the row (bounded by doc
  length), per-corpus state stays in relations — nothing collects to
  the driver.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def tokens_col(text: Column) -> Column:
    """Normalized token array (lower, alnum-only, whitespace split).

    Single regexp_replace in the plan (plan-shape-tested): the empty
    document case is handled by filtering empty strings out of the
    split rather than a ``when`` guard, which would duplicate the
    regex expression textually and double scan-side work wherever
    subexpression elimination can't reach.
    """
    cleaned = F.trim(F.regexp_replace(F.lower(text), r"[^a-z0-9]+", " "))
    return F.filter(F.split(cleaned, " "), lambda x: x != "")


def bind_once(arr: Column, f) -> Column:
    """Evaluate ``arr`` exactly once per row by binding it as a
    higher-order-function LAMBDA VARIABLE and applying ``f`` to it.

    Why this exists: Catalyst inlines aliased expressions textually —
    ``CollapseProject`` merges stacked projections, and (worse)
    predicate pushdown substitutes aliases into filter conditions
    unconditionally. An expensive array expression referenced from
    inside a ``transform``/``zip_with`` lambda is then re-executed PER
    ELEMENT, interpreted (the r14 sf1 probe measured corpus_ingest's
    repetition gate re-running the tokenizer ~6·n_tokens times per
    document this way — 13 copies of the regexp in the optimized
    plan). Lambda variables are opaque to both rules, so
    ``transform(array(arr), f)[0]`` is a per-row let-binding: ``arr``
    evaluates once, ``f`` sees the bound variable.

    ``f`` takes the bound Column and returns a scalar Column.
    """
    return F.element_at(F.transform(F.array(arr), f), 1)


def overlapping_2grams(toks: Column) -> Column:
    """Space-joined overlapping 2-grams of a token array (empty for
    <2 tokens). Pass a ``bind_once`` lambda variable, never a raw
    tokenizer expression (see bind_once for the re-inline trap)."""
    return F.when(
        F.size(toks) >= 2,
        F.zip_with(
            F.slice(toks, 1, F.size(toks) - 1),
            F.slice(toks, 2, F.size(toks) - 1),
            lambda a, b: F.concat_ws(" ", a, b),
        ),
    ).otherwise(F.array().cast("array<string>"))


def dup_2gram_ok(g2: Column, max_dup_2gram: float) -> Column:
    """True when the duplicate-2-gram fraction (1 − distinct/total) is
    within bound; vacuously true with no 2-grams."""
    return (F.size(g2) == 0) | (
        1.0 - F.size(F.array_distinct(g2)) / F.size(g2) <= max_dup_2gram
    )


def repetition_gate_col(
    text: Column, min_tokens: int, max_dup_2gram: float
) -> Column:
    """Boolean quality gate: ≥ ``min_tokens`` normalized tokens AND the
    duplicate-2-gram fraction (1 − distinct/total) ≤ ``max_dup_2gram``
    (docs with <2 tokens have no 2-grams and pass the second test).

    One tokenizer pass and one 2-gram build per row, enforced with
    ``bind_once`` let-bindings (see there for the Catalyst re-inline
    trap this dodges). Per-row array arithmetic only — at 100 TB this
    is a map-side gate fused into the scan, zero shuffles.
    """

    def over_toks(toks: Column) -> Column:
        return (F.size(toks) >= min_tokens) & bind_once(
            overlapping_2grams(toks), lambda g: dup_2gram_ok(g, max_dup_2gram)
        )

    return bind_once(tokens_col(text), over_toks)


def _spans(toks: Column, span: int) -> Column:
    """Non-overlapping ``span``-token windows as space-joined strings.

    The last window may be shorter (kept — dropping it would let tail
    duplication through). Empty docs produce an empty array.
    """
    n_spans = F.ceil(F.size(toks) / F.lit(span)).cast("int")
    return F.transform(
        F.sequence(F.lit(0), F.greatest(n_spans, F.lit(1)) - 1),
        lambda i: F.array_join(F.slice(toks, i * span + 1, span), " "),
    )


def span_dedup(
    df: DataFrame,
    id_col: str,
    text_col: str,
    span: int = 10,
    max_span_freq: int | None = None,
) -> DataFrame:
    """Cross-document duplicated-span removal (C4 / Lee et al. 2022
    "Deduplicating Training Data Makes Language Models Better",
    adapted from lines to fixed token spans because the corpus has no
    line structure).

    Every document is cut into non-overlapping ``span``-token windows;
    a window whose text occurs in MORE THAN ONE document is removed
    from every document except the one with the smallest id (keep-first
    — deterministic, same convention as exact-doc dedup). The cleaned
    document is the surviving spans re-joined in order.

    Scale shape: explode → global groupBy on the span HASH (one
    shuffle, map-side combined) → window argmin per span → semi-join
    back — never an all-pairs comparison, never a driver-side set. At
    100 TB the span-hash relation is the only wide state and it
    partitions uniformly (hashes).

    ``max_span_freq`` is the boilerplate guard: a span occurring in
    more than this many documents (cookie banners, license headers) is
    dropped from EVERY document including the first — C4's treatment
    of over-common lines — and, critically for scale, its window
    partition (which would hold one row per occurrence corpus-wide)
    never materializes: the hot set is found by a map-side-combined
    count and removed by broadcast anti-join BEFORE the keep-first
    window. Default None keeps pure keep-first semantics.

    Returns (id, n_spans, n_dropped, clean_text) — clean_text is the
    re-joined surviving text; n_spans counts pre-cap spans, so capped
    spans count as dropped.
    """
    # Project the token array before the span transform — see
    # contamination() for the HOF re-inlining pitfall this avoids.
    spans = (
        df.select(
            F.col(id_col).alias("doc_id"),
            tokens_col(F.col(text_col)).alias("toks"),
        )
        .select("doc_id", _spans(F.col("toks"), span).alias("spans"))
        .select(
            "doc_id",
            F.posexplode_outer("spans").alias("span_idx", "span_text"),
        )
    )
    if max_span_freq is not None:
        # Boilerplate cap: the hot set is tiny by construction (few
        # spans can exceed the threshold), found by a map-side-combined
        # count and removed by broadcast anti-join BEFORE the window —
        # a span in millions of documents never forms a window
        # partition (the corpus-wide straggler this guard exists for).
        hot = (
            spans.groupBy("span_text")
            .agg(F.countDistinct("doc_id").alias("df"))
            .filter(F.col("df") > max_span_freq)
            .select("span_text")
        )
        totals = spans.groupBy("doc_id").agg(F.count("*").alias("n_spans"))
        spans = spans.join(F.broadcast(hot), "span_text", "left_anti")
    else:
        totals = None
    # keep-first: the minimum doc_id per distinct span text survives in
    # place; every other occurrence of that span text is dropped.
    w = Window.partitionBy("span_text")
    flagged = spans.withColumn("min_doc", F.min("doc_id").over(w)).withColumn(
        "keep", F.col("doc_id") == F.col("min_doc")
    )
    per_doc = flagged.groupBy("doc_id").agg(
        F.count("*").alias("__n_surviving"),
        F.sum(F.when(F.col("keep"), 1).otherwise(0)).alias("__n_kept"),
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(
                        F.when(
                            F.col("keep"),
                            F.struct("span_idx", "span_text"),
                        )
                    )
                ),
                lambda s: s["span_text"],
            ),
            " ",
        ).alias("clean_text"),
    )
    if totals is not None:
        # docs whose every span was capped still get a row (empty text)
        per_doc = totals.join(per_doc, "doc_id", "left").select(
            "doc_id",
            "n_spans",
            (F.col("n_spans") - F.coalesce(F.col("__n_kept"), F.lit(0))).alias(
                "n_dropped"
            ),
            F.coalesce(F.col("clean_text"), F.lit("")).alias("clean_text"),
        )
    else:
        per_doc = per_doc.select(
            "doc_id",
            F.col("__n_surviving").alias("n_spans"),
            (F.col("__n_surviving") - F.col("__n_kept")).alias("n_dropped"),
            "clean_text",
        )
    return per_doc.withColumnRenamed("doc_id", id_col)


def contamination(
    corpus: DataFrame,
    benchmark: DataFrame,
    id_col: str,
    text_col: str,
    k: int = 8,
    threshold: float = 0.2,
) -> DataFrame:
    """Benchmark-contamination screen: fraction of each corpus document's
    distinct k-token shingles that appear anywhere in the benchmark set
    (the n-gram-overlap decontamination used for pretraining corpora —
    GPT-3 appendix C / Gopher §A.3 style, k≈8-13).

    Plan: benchmark → distinct shingle relation; corpus → distinct
    (doc, shingle) relation; LEFT SEMI equi-join on the shingle hash
    counts hits; contaminated = hit fraction ≥ threshold. The benchmark
    shingle relation is usually small enough to broadcast — Spark's AQE
    decides; nothing is collected.

    Returns (id, n_shingles, n_hits, contam_frac, contaminated).
    """
    def shingle_rows(df: DataFrame, with_id: bool) -> DataFrame:
        # Hash each k-token window to a 64-bit key INSIDE the row
        # (xxhash64 composes under higher-order transform), then
        # per-row array_distinct — the exploded relation carries only
        # longs, never shingle strings: ~8 bytes/row through the
        # distinct + join instead of ~6k·k chars.
        #
        # The tokenizer is PROJECTED first (aliased column, separate
        # select): referencing the raw split expression from inside the
        # transform lambda makes Catalyst re-inline (and re-execute)
        # the regexp+split once per window — measured 10× slower at
        # sf0.1 (5.9 s vs 0.6 s) than transforming over the
        # materialized array. Same pitfall as text_queries.
        cols = [F.col(id_col).alias("doc_id")] if with_id else []
        tdf = df.select(*cols, tokens_col(F.col(text_col)).alias("toks"))
        t = F.col("toks")
        sh = F.array_distinct(
            F.when(
                F.size(t) >= k,
                F.transform(
                    F.sequence(F.lit(0), F.size(t) - k),
                    lambda i: F.xxhash64(F.array_join(F.slice(t, i + 1, k), " ")),
                ),
            ).otherwise(F.array().cast("array<long>"))
        )
        id_cols = ["doc_id"] if with_id else []
        return tdf.select(*id_cols, F.explode(sh).alias("shingle_h"))

    bench_sh = shingle_rows(benchmark, with_id=False).distinct()
    corp_sh = shingle_rows(corpus, with_id=True)
    # Single pass: left join against the (distinct) benchmark keys —
    # multiplicity stays 1, so one aggregation yields totals AND hits.
    joined = corp_sh.join(
        bench_sh.withColumn("hit", F.lit(1)), "shingle_h", "left"
    )
    return (
        joined.groupBy("doc_id")
        .agg(
            F.count("*").alias("n_shingles"),
            F.count("hit").alias("n_hits"),
        )
        .select(
            F.col("doc_id").alias(id_col),
            "n_shingles",
            "n_hits",
            F.round(F.col("n_hits") / F.col("n_shingles"), 6).alias("contam_frac"),
            (F.col("n_hits") / F.col("n_shingles") >= threshold).alias("contaminated"),
        )
    )


def repetition_stats(
    df: DataFrame,
    id_col: str,
    text_col: str,
    top_word_max: float = 0.2,
    dup_2gram_max: float = 0.4,
) -> DataFrame:
    """Gopher-style repetition gates (Rae et al. 2021 §A.1.1): fraction
    of tokens taken by the single most frequent word, and fraction of
    2-grams that are repeats of an earlier 2-gram in the same document.
    Documents exceeding either bound are repetition-flagged.

    Entirely per-row array arithmetic (aggregate over the token array)
    — zero shuffles; at 100 TB this is a map-only pass fused into
    whatever scan precedes it.

    Returns (id, n_tokens, top_word_frac, dup_2gram_frac, repetitive).
    """
    with_toks = df.select(
        F.col(id_col).alias("doc_id"), tokens_col(F.col(text_col)).alias("toks")
    ).withColumn("sorted_toks", F.array_sort("toks"))
    t = F.col("toks")
    # top word count inside the row via sort + longest-run scan:
    # aggregate carries (prev, current_run, best_run) through the
    # sorted array — O(n log n) per row vs the naive
    # O(distinct × n) count-per-distinct-token (measured 2× faster at
    # sf0.1), still zero shuffles.
    st = F.col("sorted_toks")
    top_cnt = F.aggregate(
        st,
        F.struct(
            F.lit("").alias("prev"), F.lit(0).alias("run"), F.lit(0).alias("best")
        ),
        lambda acc, x: F.struct(
            x.alias("prev"),
            F.when(x == acc["prev"], acc["run"] + 1).otherwise(F.lit(1)).alias("run"),
            F.greatest(
                acc["best"],
                F.when(x == acc["prev"], acc["run"] + 1).otherwise(F.lit(1)),
            ).alias("best"),
        ),
        lambda acc: acc["best"],
    )
    g2 = F.when(
        F.size(t) >= 2,
        F.transform(
            F.sequence(F.lit(0), F.size(t) - 2),
            lambda i: F.concat_ws(
                " ", F.element_at(t, i + 1), F.element_at(t, i + 2)
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))
    return (
        with_toks.select(
            "doc_id",
            F.size(t).alias("n_tokens"),
            top_cnt.alias("top_cnt"),
            g2.alias("g2"),  # projected once; size+distinct below reuse it
        )
        .select(
            "doc_id",
            "n_tokens",
            "top_cnt",
            F.size("g2").alias("n_2grams"),
            F.size(F.array_distinct("g2")).alias("n_2grams_distinct"),
        )
        .select(
            F.col("doc_id").alias(id_col),
            "n_tokens",
            F.round(F.col("top_cnt") / F.col("n_tokens"), 6).alias("top_word_frac"),
            F.when(
                F.col("n_2grams") > 0,
                F.round(1.0 - F.col("n_2grams_distinct") / F.col("n_2grams"), 6),
            ).otherwise(F.lit(0.0)).alias("dup_2gram_frac"),
        )
        .withColumn(
            "repetitive",
            (F.col("top_word_frac") > top_word_max)
            | (F.col("dup_2gram_frac") > dup_2gram_max),
        )
    )


def pack_sequences(
    df: DataFrame,
    id_col: str,
    group_col: str,
    size_col: str,
    capacity: int,
) -> DataFrame:
    """Greedy sequential bin packing: within each group, walk items in
    id order and open a new bin whenever adding the next item would
    exceed ``capacity`` (items larger than capacity get a bin of their
    own). This is the deterministic first-fit-in-order packing used to
    assemble fixed-context training batches from variable-length
    documents.

    The recurrence (bin boundary depends on the running remainder) is
    not expressible as a closed-form window function, so each group
    packs inside ``applyInPandas`` — a single alternating pass over an
    already-sorted partition, O(n) per group, state = two integers.
    Groups are independent, so parallelism = number of groups (at
    corpus scale: shards/sources, thousands). Skew guard: a group's
    rows stream through one pandas batch; memory is the group's row
    count, the same bound any per-shard packer has.

    Returns (id, group, size, bin_id, bin_fill) — bin_id dense from 0
    per group, bin_fill the bin's running token total after the item.
    """
    import pandas as pd

    out_schema = (
        f"{id_col} long, {group_col} string, {size_col} long, "
        "bin_id long, bin_fill long"
    )

    def pack(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(id_col).reset_index(drop=True)
        bins, fills = [], []
        bin_id, fill = 0, 0
        first = True
        for sz in pdf[size_col]:
            sz = int(sz)
            if not first and fill + sz > capacity:
                bin_id += 1
                fill = 0
            first = False
            fill += sz
            bins.append(bin_id)
            fills.append(fill)
        pdf = pdf[[id_col, group_col, size_col]].copy()
        pdf["bin_id"] = bins
        pdf["bin_fill"] = fills
        return pdf

    return (
        df.select(id_col, group_col, size_col)
        .groupBy(group_col)
        .applyInPandas(pack, schema=out_schema)
    )

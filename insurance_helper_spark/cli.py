"""User-facing CLI: scrape / status / retry-failed / reset / query.

Parity surface for the reference's typer app
(/root/reference/src/irdai_scraper/cli.py:236-298 ``scrape``,
:382-413 ``status``, :416-461 ``retry_failed``, :464-503 ``reset``),
re-expressed over the Spark engine:

- stdlib ``argparse`` + plain-text rendering instead of typer/rich —
  the reference already falls back to plain printing under CI
  (cli.py:27-33); that mode is the only one that makes sense for a
  driver process whose stdout is a log.
- ``scrape`` drives ``sources.http.scrape_pipeline`` (one lazy DataFrame
  plan) instead of an asyncio loop; ``--metadata-only`` elides the
  download stage from the DAG rather than branching imperatively.
- ``status`` renders ``StateStore.summary()`` — same columns as the
  reference's rich table (Product Type / Status / Last Page / Products)
  plus the completed/failed counters (cli.py:391-412).
- ``reset`` honors the same confirm-unless ``--yes`` contract
  (cli.py:480-487) reading the confirmation from stdin.
- ``query`` is engine-native (no reference analog): run any catalog
  query against a parquet scale-factor directory.

IO seams (``fetcher``/``downloader``/``input_fn``) are injectable so
tests exercise every command without network or TTY. The SparkSession
is built lazily — ``status``/``reset`` on an empty state dir still need
one because state lives in parquet tables, but no network.
"""

from __future__ import annotations

import argparse
import sys
from collections.abc import Callable

from pyspark.sql import SparkSession

PRODUCT_TYPES = ("life", "life_list", "nonlife", "health")

# Reference page templates (config.py:49-115): site-relative paths the
# scraper paginates with a ``?_cur={page}`` cursor.
URL_PATHS = {
    "life": "/life-insurance-products",
    "life_list": "/list-of-life-products",
    "nonlife": "/non-life-insurance-products",
    "health": "/health-insurance-products",
}


def _build_spark() -> SparkSession:
    from insurance_helper_spark.session import get_spark

    return get_spark(app_name="insurance-helper-cli")


def url_template(base_url: str, product_type: str) -> str:
    """Paginated page-URL template for a product type (config.py:49-115)."""
    return f"{base_url}{URL_PATHS[product_type]}?_cur={{page}}"


def render_status(sessions_rows: list, counter_rows: list) -> str:
    """Plain-text analog of the reference's rich status table
    (cli.py:382-413): one row per product type (``not started`` when the
    sessions table has no row), then the download counters."""
    by_type = {r["product_type"]: r for r in sessions_rows}
    header = f"{'Product Type':<12} {'Status':<12} {'Last Page':>9} {'Products':>9}"
    lines = ["Scraper Status", "", header, "-" * len(header)]
    for pt in PRODUCT_TYPES:
        row = by_type.get(pt)
        status = row["status"] if row else "not started"
        last = row["last_completed_page"] if row else 0
        total = row["total_products"] if row else 0
        lines.append(f"{pt:<12} {status:<12} {last or 0:>9} {total or 0:>9}")
    counters = {r["counter"]: r["n"] for r in counter_rows}
    lines += [
        "",
        f"Completed Downloads: {counters.get('completed_downloads', 0)}",
        f"Failed Downloads: {counters.get('failed_downloads', 0)}",
    ]
    return "\n".join(lines)


def _cmd_status(args, spark: SparkSession, out: Callable[[str], None]) -> int:
    from insurance_helper_spark.operators.state import StateStore

    store = StateStore(spark, args.state_dir)
    sessions, counts = store.summary()
    out(render_status(sessions.collect(), counts.collect()))
    return 0


def _cmd_reset(args, spark: SparkSession, out, input_fn) -> int:
    if not args.yes:
        if args.type:
            msg = f"Reset state for {args.type}? [y/N] "
        else:
            msg = "Reset ALL state? This will clear progress for all product types. [y/N] "
        if input_fn(msg).strip().lower() not in ("y", "yes"):
            out("Cancelled")
            return 0
    from insurance_helper_spark.operators.state import StateStore

    store = StateStore(spark, args.state_dir)
    if args.type:
        store.reset_session(args.type)
        out(f"Reset state for {args.type}")
    else:
        store.reset_all()
        out("Reset all state")
    return 0


def _cmd_scrape(args, spark, out, fetcher, downloader) -> int:
    from insurance_helper_spark.operators import state as state_ops
    from insurance_helper_spark.sources import http, sinks

    types = PRODUCT_TYPES if args.type == "all" else (args.type,)
    unknown = [t for t in types if t not in PRODUCT_TYPES]
    if unknown:
        out(f"Invalid product type: {unknown[0]}")
        return 1
    # rate_limit passes through verbatim: 0 means "no limit" in the
    # reference CLI, and TokenBucket honors rate<=0 as uncapped.
    config = http.ScrapeConfig(rate_limit=args.rate_limit)
    store = state_ops.StateStore(spark, args.state_dir)
    for pt in types:
        out(f"Scraping {pt}...")
        start = args.start_page or store.start_session(pt, resume=not args.no_resume)
        if start > 1:
            out(f"Resuming from page {start}")
        if args.total_pages is not None:
            total = args.end_page or args.total_pages
        else:
            # reference get_total_pages: probe page 1 (S3), pagination
            # fallback (S4). A real run (no injected fetcher) probes
            # with the default HTTP fetcher — same client the page
            # scan uses.
            total = args.end_page or http.probe_total_pages(
                url_template(args.base_url, pt), fetcher or http.default_fetcher()
            )
            out(f"Total pages: {total}")
        products = http.scrape_pipeline(
            spark,
            url_template(args.base_url, pt),
            total_pages=total,
            product_type=pt,
            fetcher=fetcher,
            downloader=downloader,
            completed=store.read("completed_downloads"),
            config=config,
            download_dir=f"{args.output}/downloads",
            metadata_only=args.metadata_only,
            start_page=start,
            end_page=args.end_page,
            download_partitions=args.concurrent,
        )
        products = products.localCheckpoint(eager=True)
        n = products.count()
        if not args.metadata_only and "download_success" in products.columns:
            from pyspark.sql import functions as F

            # Reconcile only rows the download stage actually attempted
            # (skipped/anti-joined rows carry a null download_success).
            state_ops.record_download_outcomes(
                store,
                products.filter(F.col("download_success").isNotNull()).select(
                    F.col("document_url").alias("url"),
                    F.col("download_success").alias("success"),
                    F.when(F.col("download_success"), F.lit(None).cast("string"))
                    .otherwise(F.lit("download failed"))
                    .alias("error"),
                ),
            )
        sinks.write_bronze_csv(products, f"{args.output}/metadata/{pt}")
        _object_storage_postprocess(products, pt, args, out)
        store.update_page_progress(pt, total, n)
        store.complete_session(pt)
        out(f"{pt}: {n} products scraped")
    return 0


def _cmd_retry_failed(args, spark, out, downloader) -> int:
    from pyspark.sql import functions as F

    from insurance_helper_spark.operators import state as state_ops

    store = state_ops.StateStore(spark, args.state_dir)
    failed_n = store.read("failed_downloads").count()
    if failed_n == 0:
        out("No failed downloads to retry!")
        return 0
    out(f"Retrying {failed_n} failed downloads...")
    results = state_ops.retry_failed(
        store, downloader, retry_dir=f"{args.output}/downloads/retry"
    )
    ok = results.filter(F.col("success")).count()
    out(f"Retried: {ok} succeeded, {failed_n - ok} failed")
    return 0


def _cmd_query(args, spark, out) -> int:
    from insurance_helper_spark.queries import catalog

    catalog.load_all()
    if args.name == "list" or args.name not in catalog.QUERIES:
        if args.name != "list":
            out(f"Unknown query: {args.name}")
        out("\n".join(sorted(catalog.QUERIES)))
        return 0 if args.name == "list" else 1
    df = catalog.QUERIES[args.name](spark, args.sf_dir)
    if getattr(args, "explain", False):
        # formatted physical plan — the .explain('formatted') surface
        # (scan pruning / PushedFilters / exchanges) without executing.
        out(df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        ) if hasattr(df, "_sc") else df._jdf.queryExecution().explainString("formatted"))
        return 0
    # limit+1 so "are there more rows" costs no second full execution
    rows = df.limit(args.limit + 1).collect()
    out(" | ".join(df.columns))
    for r in rows[: args.limit]:
        out(" | ".join(str(v) for v in r))
    shown = min(len(rows), args.limit)
    more = "+" if len(rows) > args.limit else ""
    out(f"({shown}{more} rows, limit {args.limit})")
    return 0


def _object_storage_postprocess(products, pt, args, out) -> None:
    """W3 storage modes shared by scrape and delta: write the object
    manifest (key/content-type per downloaded doc), and in R2-ONLY mode
    (ref cli.py:210-212) upload + verify each blob then delete the
    local copy — the filesystem keeps nothing. "both" keeps local +
    object."""
    if (
        getattr(args, "storage", "filesystem") not in ("object", "both")
        or "local_file_path" not in products.columns
    ):
        return
    from pyspark.sql import functions as F

    from insurance_helper_spark.sources import object_store, sinks

    downloaded = products.filter(F.col("local_file_path").isNotNull())
    manifest = downloaded.select(
        "document_url",
        object_store.object_key(F.lit(pt), F.col("local_file_path")).alias("object_key"),
        object_store.content_type_for(F.col("local_file_path")).alias("content_type"),
    )
    sinks.write_json(manifest, f"{args.output}/object_manifest/{pt}")
    if getattr(args, "storage", "filesystem") == "object":
        statuses = object_store.upload_files(
            downloaded.select(
                "local_file_path",
                object_store.object_key(
                    F.lit(pt), F.col("local_file_path")
                ).alias("object_key"),
            ),
            dest_root=f"{args.output}/objects",
            delete_local=True,
        )
        n_up = statuses.filter(F.col("verified")).count()
        out(f"{pt}: {n_up} objects uploaded (local copies removed)")


def _cmd_delta(args, spark, out, fetcher, downloader) -> int:
    """The reference's standalone delta job (scripts/delta_download.py):
    re-scrape metadata, diff against the EXISTING metadata CSV by
    document_url (not the state store), download + append only the new
    rows, report total/new counts per type. Idempotent: a rerun with no
    site changes appends nothing."""
    from pyspark.sql import functions as F

    from insurance_helper_spark.sources import http, sinks

    types = PRODUCT_TYPES if args.type == "all" else (args.type,)
    unknown = [t for t in types if t not in PRODUCT_TYPES]
    if unknown:
        out(f"Invalid product type: {unknown[0]}")
        return 1
    config = http.ScrapeConfig(rate_limit=args.rate_limit)
    grand_total = grand_new = 0
    for pt in types:
        out(f"Delta scraping {pt}...")
        if args.total_pages is not None:
            total_pages = args.end_page or args.total_pages
        else:
            total_pages = args.end_page or http.probe_total_pages(
                url_template(args.base_url, pt), fetcher or http.default_fetcher()
            )
        products = http.scrape_pipeline(
            spark,
            url_template(args.base_url, pt),
            total_pages=total_pages,
            product_type=pt,
            fetcher=fetcher,
            config=config,
            metadata_only=True,
            start_page=args.start_page or 1,
            end_page=args.end_page,
        ).localCheckpoint(eager=True)
        csv_dir = f"{args.output}/metadata/{pt}"
        try:
            existing = sinks.read_bronze_csv(spark, csv_dir).select(
                F.col("document_url").alias("url")
            ).distinct()
        except Exception:
            existing = None  # first run: no CSV yet
        new = products
        if existing is not None:
            new = products.join(
                existing, products.document_url == existing.url, "left_anti"
            )
        new = new.localCheckpoint(eager=True)
        n_total, n_new = products.count(), new.count()
        grand_total += n_total
        grand_new += n_new
        if n_new and not args.metadata_only:
            tasks = http.build_download_tasks(
                new, pt, None, f"{args.output}/downloads"
            )
            results = http.download_batch(
                tasks, downloader, config, args.concurrent
            )
            new = http.join_results(new, results).localCheckpoint(eager=True)
            _object_storage_postprocess(new, pt, args, out)
        if n_new:
            if existing is not None:
                # CSV appends are positional: align to the existing
                # table's header, null-filling columns this run lacks
                # (e.g. download bookkeeping on a -m delta).
                header = sinks.read_bronze_csv(spark, csv_dir).columns
                new = new.select(
                    *[
                        F.col(c) if c in new.columns else F.lit(None).cast("string").alias(c)
                        for c in header
                    ]
                )
                sinks.write_bronze_csv(
                    new, csv_dir, mode="append", stamp_scraped_at=False
                )
            else:
                sinks.write_bronze_csv(new, csv_dir, mode="append")
        out(f"{pt}: total {n_total}, new {n_new}")
    out(f"Total products: {grand_total}")
    out(f"New products: {grand_new}")
    return 0


def _cmd_analyze(args, spark, out) -> int:
    from insurance_helper_spark.sources import stats
    from insurance_helper_spark.sources.tables import FIXTURE_TABLES

    names = FIXTURE_TABLES if args.table == "all" else (args.table,)
    unknown = [n for n in names if n not in FIXTURE_TABLES]
    if unknown:
        out(f"Unknown table(s): {', '.join(unknown)}")
        return 1
    all_stats = None
    for name in names:
        s = stats.analyze_table(spark, args.sf_dir, name, stats_dir=args.stats_dir)
        all_stats = s if all_stats is None else all_stats.unionByName(s)
        out(f"{name}:")
        for r in s.orderBy("column").collect():
            out(
                f"  {r['column']}: rows={r['n_rows']} nulls={r['n_nulls']} "
                f"~ndv={r['approx_ndv']} min={r['min_value']} max={r['max_value']}"
            )
    out("broadcast advice (32 MiB threshold):")
    for r in stats.broadcast_advice(all_stats).collect():
        verdict = "broadcast" if r["broadcastable"] else "shuffle"
        out(f"  {r['table']}: {r['size_bytes']} bytes on disk -> {verdict}")
    return 0


def _cmd_curate(args, spark, out) -> int:
    """End-to-end corpus curation: quality gates → exact fingerprint
    dedup → deterministic stratified split → partitioned parquet write,
    with a per-stage funnel report. Composes the catalog's verified
    stages (corpus_quality_filter gates, fingerprint_dedup, the Knuth
    split) into the one command a corpus build actually runs. Scale:
    gates are shuffle-free projections; dedup is one fingerprint
    shuffle; the split is a free projection feeding
    ``write.partitionBy('split')``."""
    from pyspark.sql import functions as F

    from insurance_helper_spark.functions import text as T
    from insurance_helper_spark.operators.dedup import fingerprint_dedup
    from insurance_helper_spark.functions.hashing import knuth_uniform as _knuth_uniform

    docs = spark.read.parquet(f"{args.sf_dir}/documents.parquet")
    n_raw = docs.count()

    staged = docs.withColumn("__toks", T.tokens(F.col("text"))).select(
        "*",
        F.size("__toks").alias("__n_tokens"),
        T.mean_word_length_of(F.col("__toks")).alias("__mwl"),
        T.punct_ratio(F.col("text")).alias("__punct"),
        T.stopword_ratio_of(F.col("__toks")).alias("__stop"),
    )
    gated = staged.filter(
        (F.col("__n_tokens") >= args.min_tokens)
        & (F.col("__mwl") >= 3.0) & (F.col("__mwl") <= 10.0)
        & (F.col("__punct") <= 0.1)
        & (F.col("__stop") >= 0.03)
    ).drop("__toks", "__n_tokens", "__mwl", "__punct", "__stop")
    # Persist the gated relation: the gate metrics (regex tokenize x4)
    # feed the count, the dedup, AND the write — without the persist
    # each action recomputes them from the scan.
    gated = gated.persist()
    n_gated = gated.count()

    deduped = fingerprint_dedup(gated, "text", "doc_id")

    u = _knuth_uniform(F.col("doc_id"))
    labeled = deduped.withColumn(
        "split",
        F.when(u < 0.8, "train").when(u < 0.9, "val").otherwise("test"),
    )
    labeled.write.mode("overwrite").partitionBy("split").parquet(args.output)
    gated.unpersist()
    # Funnel numbers derive from the JUST-WRITTEN output — zero
    # recomputation, and the report provably describes what landed.
    written = spark.read.parquet(args.output)
    by_split = {r["split"]: r["n"] for r in
                written.groupBy("split").agg(F.count("*").alias("n")).collect()}
    n_unique = sum(by_split.values())

    out(f"raw: {n_raw}")
    out(f"quality-gated: {n_gated} ({n_raw - n_gated} dropped)")
    out(f"exact-unique: {n_unique} ({n_gated - n_unique} duplicates)")
    for split in ("train", "val", "test"):
        out(f"{split}: {by_split.get(split, 0)}")
    out(f"written: {args.output} (partitioned by split)")
    return 0


def _cmd_retrieve(args, spark, out) -> int:
    """Stage-3 retrieval at the CLI surface (reference parity:
    cli.py is the reference's only user surface): hybrid BM25 + vector
    retrieval with RRF fusion, for free query text (Rocchio
    pseudo-vector leg) or a --doc-id query-by-example (both legs
    native). See operators/retrieval.py for the plan shape."""
    from insurance_helper_spark.operators.retrieval import hybrid_rrf_retrieve

    if (args.query is None) == (args.doc_id is None):
        out("Pass query text OR --doc-id (exactly one).")
        return 1
    try:
        rows = hybrid_rrf_retrieve(
            spark, args.sf_dir, query=args.query, doc_id=args.doc_id, topn=args.topn
        ).collect()
    except ValueError as exc:
        out(str(exc))
        return 1
    qlabel = f"doc:{args.doc_id}" if args.doc_id is not None else repr(args.query)
    out(f"top-{args.topn} for {qlabel} (rrf = 1/(60+lex) + 1/(60+vec); 0 = outside leg top-20)")
    for r in rows:
        out(
            f"{r['rank']:>3}. doc {r['doc_id']:>8}  rrf={r['rrf_score']:.6f}  "
            f"lex#{r['lex_rank']:<3} vec#{r['vec_rank']:<3} {r['snippet']}"
        )
    if not rows:
        out("(no results)")
    return 0


def _cmd_vector_store(args, spark, out) -> int:
    """Stage-3 vector database at the CLI surface (reference parity:
    README.md:108-110 "vector database for semantic document storage";
    cli.py is the reference's only user surface): drain new embeddings
    into the maintained store, inspect its epochs/reports, run the
    probed ANN search, and run the reassignment maintenance pass. See
    operators/vector_store.py for the tables and the replay contract."""
    from pyspark.errors import AnalysisException
    from pyspark.sql import functions as F

    from insurance_helper_spark.operators import vector_store as VS

    if args.action == "ingest":
        if not args.input:
            out("ingest requires --input <embedding parquet dir>")
            return 1
        ckpt = args.checkpoint or f"{args.store}/_checkpoint"
        VS.vector_store_ingest_stream(
            spark,
            args.input,
            args.store,
            ckpt,
            n_centroids=args.n_centroids,
            psi_threshold=args.psi_threshold,
        )
        rows = sorted(
            VS.read_store_reports(spark, args.store).collect(),
            key=lambda r: r["ingest_batch"],
        )
        for r in rows:
            psi = "-" if r["occupancy_psi"] is None else f"{r['occupancy_psi']:.6f}"
            out(
                f"batch {r['ingest_batch']:>3}  epoch {r['epoch']}  "
                f"n={r['n_vectors']:<6} psi={psi:<10} "
                f"mean_cos={r['mean_cos']:.4f}  {r['note']}"
            )
        return 0
    try:
        cents = VS.read_centroids(spark, args.store)
    except AnalysisException:
        out(f"no vector store at {args.store} (run ingest first)")
        return 1
    if args.action == "status":
        epoch = cents.first()["epoch"]
        vec = VS.read_vector_store(spark, args.store)
        n = vec.count()
        stale = vec.where(F.col("epoch") != epoch).count()
        # stale_fraction is the serving-path health contract: exactly
        # the fraction of rows vector_store_search must exact-scan
        # instead of cell-probing (pinned by tests/test_vector_store).
        frac = VS.stale_fraction(spark, args.store)
        out(
            f"store {args.store}: epoch {epoch}, {n} vectors, "
            f"{stale} stale (stale_fraction={frac:.4f})"
        )
        census = (
            vec.where(F.col("epoch") == epoch)
            .groupBy("cell")
            .count()
            .orderBy("cell")
            .collect()
        )
        for r in census:
            out(f"  cell {r['cell']:>3}: {r['count']} vectors")
        return 0
    if args.action == "reassign":
        n = VS.reassign_stale(spark, args.store)
        out(f"reassigned {n} stale vectors to the current epoch")
        return 0
    if args.action == "search":
        if args.vec_id is None:
            out("search requires --vec-id <stored vector id>")
            return 1
        queries = (
            VS.read_vector_store(spark, args.store)
            .where(F.col("vec_id") == args.vec_id)
            .select(F.col("vec_id").alias("query_id"), "vv")
        )
        if queries.isEmpty():
            out(f"vec_id {args.vec_id} not in the store")
            return 1
        rows = VS.vector_store_search(
            spark, args.store, queries, k=args.topk, n_probe=args.n_probe
        ).collect()
        out(
            f"top-{args.topk} neighbors of vec {args.vec_id} "
            f"(probing {args.n_probe} cells)"
        )
        for r in sorted(rows, key=lambda r: r["nn_rank"]):
            out(
                f"{r['nn_rank']:>3}. vec {r['neighbor_id']:>8}  "
                f"cos={r['cosine_sim']:.6f}"
            )
        return 0
    return 2


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="insurance-helper-spark",
        description="IRDAI Insurance Products engine (Spark)",
    )
    sub = p.add_subparsers(dest="command", required=True)

    sc = sub.add_parser("scrape", help="Scrape insurance products")
    sc.add_argument("--type", "-t", default="all",
                    help="life, life_list, nonlife, health, or 'all'")
    sc.add_argument("--output", "-o", default="data")
    sc.add_argument("--rate-limit", "-r", type=float, default=10.0, dest="rate_limit",
                    help="requests per second (0 = no limit)")
    sc.add_argument("--concurrent", "-c", type=int, default=None,
                    help="download partitions (ref: max concurrent downloads)")
    sc.add_argument("--no-resume", action="store_true", dest="no_resume")
    sc.add_argument("--metadata-only", "-m", action="store_true", dest="metadata_only")
    sc.add_argument("--start-page", type=int, default=None, dest="start_page")
    sc.add_argument("--end-page", type=int, default=None, dest="end_page")
    sc.add_argument("--total-pages", type=int, default=None, dest="total_pages",
                    help="page count; omitted → probe page 1 (ref get_total_pages)")
    sc.add_argument("--storage", "-s", default="filesystem",
                    choices=("filesystem", "object", "both"))
    sc.add_argument("--base-url", default="https://irdai.gov.in", dest="base_url")
    sc.add_argument("--state-dir", default="data/state", dest="state_dir")

    st = sub.add_parser("status", help="Show session/download status")
    st.add_argument("--state-dir", default="data/state", dest="state_dir")

    rt = sub.add_parser("retry-failed", help="Retry previously failed downloads")
    rt.add_argument("--output", "-o", default="data")
    rt.add_argument("--state-dir", default="data/state", dest="state_dir")

    rs = sub.add_parser("reset", help="Reset scraper state")
    rs.add_argument("--type", "-t", default=None)
    rs.add_argument("--yes", "-y", action="store_true")
    rs.add_argument("--state-dir", default="data/state", dest="state_dir")

    q = sub.add_parser("query", help="Run a catalog query ('list' to enumerate)")
    q.add_argument("name")
    q.add_argument("--sf-dir", default="/root/testdata/sf0.001", dest="sf_dir")
    q.add_argument("--limit", type=int, default=20)
    q.add_argument("--explain", action="store_true",
                   help="print the formatted physical plan instead of rows")

    dl = sub.add_parser(
        "delta", help="Incremental run: scrape, diff vs existing CSV, fetch only new"
    )
    dl.add_argument("--type", "-t", default="all")
    dl.add_argument("--output", "-o", default="data")
    dl.add_argument("--rate-limit", "-r", type=float, default=10.0, dest="rate_limit")
    dl.add_argument("--concurrent", "-c", type=int, default=None)
    dl.add_argument("--metadata-only", "-m", action="store_true", dest="metadata_only")
    dl.add_argument("--start-page", type=int, default=None, dest="start_page")
    dl.add_argument("--end-page", type=int, default=None, dest="end_page")
    dl.add_argument("--total-pages", type=int, default=None, dest="total_pages")
    dl.add_argument("--storage", "-s", default="filesystem",
                    choices=("filesystem", "object", "both"))
    dl.add_argument("--base-url", default="https://irdai.gov.in", dest="base_url")

    cu = sub.add_parser(
        "curate", help="Corpus curation: gates -> dedup -> split -> parquet"
    )
    cu.add_argument("--sf-dir", default="/root/testdata/sf0.001", dest="sf_dir")
    cu.add_argument("--output", "-o", default="data/corpus")
    cu.add_argument("--min-tokens", type=int, default=30, dest="min_tokens")

    rv = sub.add_parser(
        "retrieve", help="Hybrid BM25+vector retrieval with RRF fusion"
    )
    rv.add_argument("query", nargs="?", default=None,
                    help="free query text (omit when using --doc-id)")
    rv.add_argument("--doc-id", type=int, default=None, dest="doc_id",
                    help="query-by-example: retrieve neighbors of this document")
    rv.add_argument("--sf-dir", default="/root/testdata/sf0.001", dest="sf_dir")
    rv.add_argument("--topn", type=int, default=10)

    vs = sub.add_parser(
        "vector-store",
        help="Maintained IVF vector store: ingest / search / reassign / status",
    )
    vs.add_argument("action", choices=["ingest", "search", "reassign", "status"])
    vs.add_argument("--store", default="data/vector_store")
    vs.add_argument("--input", default=None,
                    help="embedding parquet dir to drain (ingest)")
    vs.add_argument("--checkpoint", default=None,
                    help="stream checkpoint dir (default <store>/_checkpoint)")
    vs.add_argument("--centroids", type=int, default=8, dest="n_centroids")
    vs.add_argument("--psi-threshold", type=float, default=0.25,
                    dest="psi_threshold")
    vs.add_argument("--vec-id", type=int, default=None, dest="vec_id",
                    help="search: query by a stored vector id")
    vs.add_argument("--topk", type=int, default=5)
    vs.add_argument("--n-probe", type=int, default=2, dest="n_probe")

    an = sub.add_parser("analyze", help="Collect table statistics (ANALYZE)")
    an.add_argument("--table", "-t", default="all")
    an.add_argument("--sf-dir", default="/root/testdata/sf0.001", dest="sf_dir")
    an.add_argument("--stats-dir", default=None, dest="stats_dir",
                    help="persist per-table stats parquet under this dir")
    return p


def main(
    argv: list[str] | None = None,
    spark: SparkSession | None = None,
    fetcher=None,
    downloader=None,
    out: Callable[[str], None] = print,
    input_fn: Callable[[str], str] = input,
) -> int:
    args = build_parser().parse_args(argv if argv is not None else sys.argv[1:])
    spark = spark or _build_spark()
    if args.command == "status":
        return _cmd_status(args, spark, out)
    if args.command == "reset":
        return _cmd_reset(args, spark, out, input_fn)
    if args.command == "scrape":
        return _cmd_scrape(args, spark, out, fetcher, downloader)
    if args.command == "retry-failed":
        return _cmd_retry_failed(args, spark, out, downloader)
    if args.command == "query":
        return _cmd_query(args, spark, out)
    if args.command == "analyze":
        return _cmd_analyze(args, spark, out)
    if args.command == "retrieve":
        return _cmd_retrieve(args, spark, out)
    if args.command == "vector-store":
        return _cmd_vector_store(args, spark, out)
    if args.command == "curate":
        return _cmd_curate(args, spark, out)
    if args.command == "delta":
        return _cmd_delta(args, spark, out, fetcher, downloader)
    return 2


if __name__ == "__main__":
    raise SystemExit(main())

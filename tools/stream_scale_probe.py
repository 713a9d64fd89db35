#!/usr/bin/env python
"""sf1 scaling probe for the STREAMING lifecycle paths (VERDICT r13
item 3): the batch twins of the vector store / drift gate / corpus
ingest are probed by tools/scale_probe.py, but the streams' per-batch
work had no measured scale evidence. This drives each lifecycle end to
end — fixture tables split into 4 input files, Trigger.AvailableNow
drain, fresh store/checkpoint dirs per run — at sf0.1 and the
self-generated sf1 dataset (10× rows per batch), twice per SF with the
min kept, and reports the wall ratio. Per-batch work that is linear in
batch size should land well under 10× on 32 cores (fixed per-batch
trigger overhead dominates at sf0.1).

Usage: python tools/stream_scale_probe.py [--sf0.1] [--sf1] [--sf10] [name ...]
names: vector_store_ingest, vector_store_search, drift_gate, corpus_ingest
(default SF pair: sf0.1 vs sf1)
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF01 = "/root/testdata/sf0.1"
SF1 = "/root/repo/scaledata/sf1"
SF10 = "/root/repo/scaledata/sf10"  # 100x bench; gen_scale_probe_data.py --src sf1 --dst sf10
N_FILES = 4  # same batch COUNT at both SFs — the probe measures per-batch work


def _split_table(spark, sf_dir: str, table: str, out_dir: str, columns) -> None:
    """Write the fixture table as N_FILES parquet part-files so the
    AvailableNow drain sees N_FILES one-file micro-batches."""
    from insurance_helper_spark.sources.tables import load_table

    load_table(spark, sf_dir, table, columns=columns).repartition(
        N_FILES
    ).write.mode("overwrite").parquet(out_dir)
    # drop non-data files so maxFilesPerTrigger=1 sees exactly N_FILES
    for f in os.listdir(out_dir):
        if not f.endswith(".parquet"):
            os.remove(os.path.join(out_dir, f))


def probe_vector_store_ingest(spark, sf_dir: str, work: str) -> float:
    from insurance_helper_spark.operators import vector_store as VS

    inp = os.path.join(work, "in")
    _split_table(spark, sf_dir, "embeddings", inp, ["vec_id", "embedding"])
    t0 = time.perf_counter()
    VS.vector_store_ingest_stream(
        spark, inp, os.path.join(work, "store"), os.path.join(work, "ckpt"),
        n_centroids=8,
    )
    return time.perf_counter() - t0


def probe_vector_store_search(spark, sf_dir: str, work: str) -> float:
    """Requires probe_vector_store_ingest to have populated the store
    in the same work dir (the harness runs them in order)."""
    from pyspark.sql import functions as F

    from insurance_helper_spark.operators import vector_store as VS
    from insurance_helper_spark.sources.tables import load_table

    queries = (
        load_table(spark, sf_dir, "embeddings", columns=["vec_id", "embedding"])
        .orderBy(F.col("vec_id"))
        .limit(32)
    )
    t0 = time.perf_counter()
    VS.vector_store_search(
        spark, os.path.join(work, "store"), queries, k=5, n_probe=2
    ).write.format("noop").mode("overwrite").save()
    return time.perf_counter() - t0


DOC_COLS = ["doc_id", "text", "lang", "source", "n_chars"]


def probe_drift_gate(spark, sf_dir: str, work: str) -> float:
    from insurance_helper_spark.streaming import ops

    inp = os.path.join(work, "in")
    _split_table(spark, sf_dir, "documents", inp, DOC_COLS)
    t0 = time.perf_counter()
    ops.drift_gate_stream(
        spark, inp, os.path.join(work, "counts"), os.path.join(work, "reports"),
        os.path.join(work, "ckpt"),
    )
    return time.perf_counter() - t0


def probe_corpus_ingest(spark, sf_dir: str, work: str) -> float:
    from insurance_helper_spark.streaming import ops

    inp = os.path.join(work, "in")
    _split_table(spark, sf_dir, "documents", inp, DOC_COLS)
    t0 = time.perf_counter()
    ops.corpus_ingest_stream(
        spark, inp, os.path.join(work, "corpus"), os.path.join(work, "fps"),
        os.path.join(work, "ckpt"),
    )
    return time.perf_counter() - t0


PROBES = {
    "vector_store_ingest": probe_vector_store_ingest,
    "vector_store_search": probe_vector_store_search,
    "drift_gate": probe_drift_gate,
    "corpus_ingest": probe_corpus_ingest,
}
ORDER = ["vector_store_ingest", "vector_store_search", "drift_gate", "corpus_ingest"]


def main() -> None:
    args = sys.argv[1:]
    all_sfs = [("sf0.1", SF01), ("sf1", SF1), ("sf10", SF10)]
    picked = []
    while args and args[0] in ("--sf0.1", "--sf1", "--sf10"):
        picked.append(args[0].lstrip("-"))
        args = args[1:]
    sfs = [s for s in all_sfs if s[0] in picked] if picked else all_sfs[:2]
    names = args or ORDER
    from insurance_helper_spark.session import get_spark

    spark = get_spark(app_name="stream-scale-probe")
    spark.sparkContext.setLogLevel("ERROR")

    results: dict[str, dict[str, float]] = {n: {} for n in names}
    for sf_tag, sf_dir in sfs:
        for run in (1, 2):
            work_root = tempfile.mkdtemp(prefix="ssp_")
            try:
                # one shared work dir per run so search sees ingest's store
                for name in names:
                    w = os.path.join(work_root, "vs" if name.startswith("vector_store") else name)
                    os.makedirs(w, exist_ok=True)
                    dt = round(PROBES[name](spark, sf_dir, w), 3)
                    cur = results[name].get(sf_tag)
                    results[name][sf_tag] = dt if cur is None else min(cur, dt)
                    print(f"  [{sf_tag} run{run}] {name}: {dt}s", file=sys.stderr)
            finally:
                shutil.rmtree(work_root, ignore_errors=True)

    tags = [t for t, _ in sfs]
    print(f"{'stream path':26s} " + " ".join(f"{t:>8s}" for t in tags)
          + (f" {'ratio':>7s}" if len(tags) == 2 else ""))
    for name in names:
        r = results[name]
        row = " ".join(f"{r[t]:8.3f}" for t in tags)
        ratio = f" {r[tags[1]] / r[tags[0]]:7.2f}" if len(tags) == 2 else ""
        print(f"{name:26s} {row}{ratio}")


if __name__ == "__main__":
    main()

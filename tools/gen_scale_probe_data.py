#!/usr/bin/env python
"""Generate the sf1.0 SCALE-PROBE dataset (10x the bench SF) under
/root/repo/scaledata/sf1/.

The driver's testdata stops at sf0.1 and is read-only, so the one-shot
10x scaling probe (VERDICT r11 item 3) needs a self-generated dataset.
This is NOT correctness data — no oracle ever runs against it — it
exists purely to measure how the most expensive queries' wall time and
executed plans scale, so the design goal is DISTRIBUTION PRESERVATION,
not value realism:

- Every table is inflated 10x as key-shifted copies c = 0..9 of the
  sf0.1 rows (copy 0 is the original). Foreign keys shift together, so
  per-key join fan-outs, group sizes, and skew profiles are IDENTICAL
  per copy — the TPC-H scaling convention (bigger key space, same
  per-key shape).
- documents: for copy c > 0 every 3rd token (position ≡ -c mod 3) gets
  a copy-specific letter suffix, so EVERY 3-token shingle differs from
  every other copy (cross-copy Jaccard ≈ 0). Without this, 10 verbatim
  copies of each doc would plant 45 artificial near-dup pairs per
  original and the pair relation would grow ~quadratically — the probe
  would measure the inflation artifact, not the engine. Within-copy
  near-dup structure is preserved.
- embeddings: copy c > 0 adds deterministic N(0, 0.15) noise and
  renormalizes — cluster structure (and hence IVF/ANN probe behavior)
  is preserved without exact duplicates.
- numeric measures get a +-1% deterministic jitter so value-collapsed
  relations (distinct prices etc.) scale with the data.
- nation/region are fixed dimensions (25/5 rows), as in TPC-H.

Deterministic: every random draw is seeded from (table, copy).
Output is gitignored (~200 MB); rerun this script to regenerate.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

# Defaults build sf1 (10x bench) from the driver testdata; pass
# --src/--dst to stack another decade (sf10 = 100x bench, built FROM
# sf1 — the suffix/noise/jitter schemes compose: level-2 copy 0 keeps
# each level-1 row verbatim, and every c > 0 copy re-perturbs content
# keys so cross-copy near-dup/Jaccard structure stays ~empty while
# within-copy structure is preserved).
SRC = "/root/testdata/sf0.1"
DST = "/root/repo/scaledata/sf1"
COPIES = 10


def _jitter(rng: np.random.RandomState, n: int) -> np.ndarray:
    return 1.0 + (rng.randint(-500, 501, size=n)) / 50000.0


def _shift(col: np.ndarray, c: int, span: int) -> np.ndarray:
    return col + c * span


def inflate_relational(
    name: str, keys: dict[str, tuple[str, str]], jitter_cols: list[str]
) -> None:
    """keys: column -> (span table, span column); span table 'self'
    means this table's own key space."""
    t = pq.read_table(f"{SRC}/{name}.parquet")
    spans = {}
    for col, (span_tab, span_col) in keys.items():
        src = t if span_tab == "self" else pq.read_table(
            f"{SRC}/{span_tab}.parquet", columns=[span_col]
        )
        spans[col] = int(pa.compute.max(src[span_col if span_tab != "self" else col]).as_py()) + 1
    parts = []
    base = {c: t[c].to_numpy(zero_copy_only=False) for c in t.column_names}
    for c in range(COPIES):
        rng = np.random.RandomState(abs(hash((name, c))) % (2**31))
        cols = {}
        for col in t.column_names:
            v = base[col]
            if col in keys:
                cols[col] = _shift(v.astype(np.int64), c, spans[col])
            elif col in jitter_cols and c > 0:
                cols[col] = np.round(v * _jitter(rng, len(v)), 2)
            else:
                cols[col] = v
        parts.append(pa.table({k: pa.array(cols[k]).cast(t.schema.field(k).type)
                               for k in t.column_names}))
    out = pa.concat_tables(parts)
    pq.write_table(out, f"{DST}/{name}.parquet")
    print(f"{name}: {t.num_rows} -> {out.num_rows}")


def inflate_documents() -> None:
    t = pq.read_table(f"{SRC}/documents.parquet")
    doc_id = t["doc_id"].to_numpy()
    span = int(doc_id.max()) + 1
    texts = t["text"].to_pylist()
    lang = t["lang"].to_pylist()
    source = t["source"].to_pylist()
    rows_id, rows_text, rows_lang, rows_src, rows_n = [], [], [], [], []
    for c in range(COPIES):
        suffix = chr(ord("a") + c)
        for i, txt in enumerate(texts):
            if c == 0:
                nt = txt
            else:
                toks = txt.split(" ")
                nt = " ".join(
                    tok + suffix if (j + c) % 3 == 0 else tok
                    for j, tok in enumerate(toks)
                )
            rows_id.append(int(doc_id[i]) + c * span)
            rows_text.append(nt)
            rows_lang.append(lang[i])
            rows_src.append(source[i])
            rows_n.append(len(nt))
    out = pa.table(
        {
            "doc_id": pa.array(rows_id, pa.int64()),
            "text": pa.array(rows_text, pa.string()),
            "lang": pa.array(rows_lang, pa.string()),
            "source": pa.array(rows_src, pa.string()),
            "n_chars": pa.array(rows_n, pa.int64()),
        }
    )
    pq.write_table(out, f"{DST}/documents.parquet")
    print(f"documents: {t.num_rows} -> {out.num_rows}")


def inflate_embeddings() -> None:
    t = pq.read_table(f"{SRC}/embeddings.parquet")
    vec_id = t["vec_id"].to_numpy()
    span = int(vec_id.max()) + 1
    emb = np.array(t["embedding"].to_pylist(), dtype=np.float32)
    label = t["label"].to_numpy()
    ids, vecs, labels = [], [], []
    for c in range(COPIES):
        if c == 0:
            v = emb
        else:
            rng = np.random.RandomState(100003 * c + 7)
            v = emb + rng.normal(0.0, 0.15, size=emb.shape).astype(np.float32)
            norms = np.linalg.norm(v, axis=1, keepdims=True)
            norms[norms == 0] = 1.0
            v = (v / norms * np.linalg.norm(emb, axis=1, keepdims=True)).astype(
                np.float32
            )
        ids.append(vec_id + c * span)
        vecs.append(v)
        labels.append(label)
    out = pa.table(
        {
            "vec_id": pa.array(np.concatenate(ids), pa.int64()),
            "embedding": pa.array(list(np.concatenate(vecs)), pa.list_(pa.float32())),
            "label": pa.array(np.concatenate(labels), pa.int32()),
        }
    )
    pq.write_table(out, f"{DST}/embeddings.parquet")
    print(f"embeddings: {t.num_rows} -> {out.num_rows}")


def main() -> None:
    import argparse

    global SRC, DST
    ap = argparse.ArgumentParser()
    ap.add_argument("--src", default=SRC)
    ap.add_argument("--dst", default=DST)
    a = ap.parse_args()
    SRC, DST = a.src, a.dst
    os.makedirs(DST, exist_ok=True)
    inflate_documents()
    inflate_embeddings()
    inflate_relational(
        "orders",
        {"o_orderkey": ("self", ""), "o_custkey": ("customer", "c_custkey")},
        ["o_totalprice"],
    )
    inflate_relational(
        "lineitem",
        {
            "l_orderkey": ("orders", "o_orderkey"),
            "l_partkey": ("part", "p_partkey"),
            "l_suppkey": ("supplier", "s_suppkey"),
        },
        ["l_extendedprice"],
    )
    inflate_relational("customer", {"c_custkey": ("self", "")}, ["c_acctbal"])
    inflate_relational("part", {"p_partkey": ("self", "")}, ["p_retailprice"])
    inflate_relational("supplier", {"s_suppkey": ("self", "")}, ["s_acctbal"])
    inflate_relational(
        "events", {"event_id": ("self", ""), "user_id": ("self", "")}, ["value"]
    )
    for name in ("nation", "region"):
        pq.write_table(pq.read_table(f"{SRC}/{name}.parquet"), f"{DST}/{name}.parquet")
        print(f"{name}: copied (fixed dimension)")


if __name__ == "__main__":
    main()

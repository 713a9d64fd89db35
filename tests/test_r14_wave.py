"""r14 wave invariants: the crosslingual plan audit's internal
consistency, and value-identity of the exact branch the new cost
dispatch in crosslingual_margin_pairs_lsh runs above fixture scale."""

from __future__ import annotations

from insurance_helper_spark.operators.similarity import srp_recall
from insurance_helper_spark.queries import catalog
from tests.conftest import SF_DIR

catalog.load_all()


def _q(spark, name):
    return catalog.QUERIES[name](spark, SF_DIR)


def test_crosslingual_plan_audit_consistency(spark):
    rows = {r["scale_mult"]: r for r in _q(spark, "crosslingual_plan_audit").collect()}
    assert set(rows) == {1, 10, 100, 1000}
    base = rows[1]
    # fixture scale runs the base plan (so the LSH recall pins hold)
    assert (base["n_planes"], base["n_tables"]) == (4, 12)
    assert base["plan"] == "lsh-base"
    assert base["recall_at_band"] == base["base_recall"]
    prev_planes = 0
    for m in (1, 10, 100, 1000):
        r = rows[m]
        assert r["n_planes"] >= prev_planes
        prev_planes = r["n_planes"]
        # recall column is the closed form at the published params
        assert (
            abs(
                r["recall_at_band"]
                - round(srp_recall(r["n_planes"], r["n_tables"], 0.33), 6)
            )
            < 1e-9
        )
        # recall held whenever the table cap is not binding
        if r["n_tables"] < 128:
            assert r["recall_at_band"] >= r["base_recall"] - 1e-9
        # the dispatch column IS the branch crosslingual_margin_pairs_lsh
        # takes: exact only below the broadcast ceiling, and only when
        # recall-held LSH would inspect >= 1/16 of the exact grid
        if r["plan"] == "exact-gemm":
            assert r["n_vectors"] <= 1_000_000
            assert r["n_tables"] / 2 ** r["n_planes"] >= 1.0 / 16
        elif r["plan"] == "lsh":
            assert (
                r["n_vectors"] > 1_000_000
                or r["n_tables"] / 2 ** r["n_planes"] < 1.0 / 16
            )
    # the weak band makes the exact region non-empty: at 500 vectors the
    # 10x and 100x decades both dispatch to the exact bitext grid
    assert rows[10]["plan"] == "exact-gemm"
    assert rows[100]["plan"] == "exact-gemm"


def test_capped_oracle_matches_spark_when_cap_bites(spark):
    """ADVICE r13: the staged-table consumers' oracles now carry the
    df cap. This pins the two cap implementations (Spark broadcast
    anti-join on df > cap vs the SQL hot-CTE NOT IN) on a corpus where
    the cap actually DROPS shingles — the exact regime where capped
    and uncapped semantics diverge and the fixture can't exercise."""
    import duckdb

    from insurance_helper_spark.operators import dedup
    from insurance_helper_spark.queries import shared_cache as SC

    n = SC.PAIR_STATS_MAX_DOC_FREQ + 10
    rows = [
        (
            i,
            "copyright acme corp all rights reserved "
            + ("alpha beta gamma delta epsilon" if i < 2 else f"tail{i} u{i} v{i} w{i} x{i}"),
        )
        for i in range(n)
    ]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    got = sorted(
        (r.id_a, r.id_b, r.common, r.size_a, r.size_b, r.jaccard)
        for r in dedup.ngram_jaccard_pairs(
            docs, "doc_id", "text", k=3, threshold=0.0,
            max_doc_freq=SC.PAIR_STATS_MAX_DOC_FREQ,
        ).collect()
    )
    con = duckdb.connect()
    con.execute("CREATE TABLE documents(doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO documents VALUES (?, ?)", rows)
    want = sorted(
        tuple(r)
        for r in con.execute(f"""
WITH t AS (
  SELECT doc_id,
         string_split(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g')), ' ') AS toks
  FROM documents
),
sh AS (
  SELECT doc_id,
         list_distinct(list_transform(range(1, greatest(len(toks) - 2, 0) + 1),
                       i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])) AS shingles
  FROM t
),
exall AS (SELECT doc_id, unnest(shingles) AS shingle FROM sh),
hot AS (SELECT shingle FROM exall GROUP BY shingle
        HAVING count(*) > {SC.PAIR_STATS_MAX_DOC_FREQ}),
ex AS (SELECT * FROM exall WHERE shingle NOT IN (SELECT shingle FROM hot)),
sizes AS (SELECT doc_id, count(*) AS sh_size FROM ex GROUP BY doc_id),
pairs AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS common
  FROM ex a JOIN ex b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT p.id_a, p.id_b, p.common,
       sa.sh_size AS size_a, sb.sh_size AS size_b,
       round(p.common * 1.0 / (sa.sh_size + sb.sh_size - p.common), 6) AS jaccard
FROM pairs p
JOIN sizes sa ON p.id_a = sa.doc_id
JOIN sizes sb ON p.id_b = sb.doc_id
ORDER BY 1, 2
""").fetchall()
    )
    assert got == want
    assert len(got) > 0  # the hot shingle alone must not connect everything


def test_staged_build_warns_when_cap_drops(spark, tmp_path, monkeypatch):
    """The staged pair-table build must SIGNAL when the cap actually
    drops shingles (ADVICE r13: 'no signal' was the defect). Builds a
    tiny corpus with one hot shingle under a private sf_dir and checks
    the warning fires on first staging and names the census query."""
    import warnings

    from insurance_helper_spark.queries import shared_cache as SC

    n = SC.PAIR_STATS_MAX_DOC_FREQ + 5
    rows = [
        (i, "en", "src", 0,
         "copyright acme corp all rights reserved " + f"tail{i} u{i} v{i} w{i} x{i}")
        for i in range(n)
    ]
    docs = spark.createDataFrame(
        rows, ["doc_id", "lang", "source", "n_chars", "text"]
    )
    sf_dir = str(tmp_path / "hotsf")
    import os

    os.makedirs(sf_dir, exist_ok=True)
    docs.write.parquet(os.path.join(sf_dir, "documents.parquet"))
    with warnings.catch_warnings(record=True) as caught:
        warnings.simplefilter("always")
        SC.ngram_pair_stats(spark, sf_dir)
    msgs = [str(w.message) for w in caught if "ngram_pair_stats" in str(w.message)]
    assert msgs and "dedup_hot_shingle_census" in msgs[0]
    # memoized second call must not re-run the census or re-warn
    with warnings.catch_warnings(record=True) as caught2:
        warnings.simplefilter("always")
        SC.ngram_pair_stats(spark, sf_dir)
    assert not [w for w in caught2 if "ngram_pair_stats" in str(w.message)]


def test_crosslingual_exact_branch_value_identity(spark):
    """The exact branch the dispatch runs (_exact_bitext_grid →
    _margin_best) must return byte-identical rows to the registered
    oracle-backed exact query — dispatching above fixture scale can
    then only RAISE delivered recall (to 1.0), never change values."""
    from insurance_helper_spark.queries.curation_queries import (
        _bitext_sides,
        _exact_bitext_grid,
        _margin_best,
    )

    src, tgt = _bitext_sides(spark, SF_DIR)
    branch = sorted(
        tuple(r) for r in _margin_best(_exact_bitext_grid(spark, src, tgt)).collect()
    )
    registered = sorted(
        tuple(r) for r in _q(spark, "crosslingual_margin_pairs").collect()
    )
    assert branch == registered
    assert len(branch) > 0


def test_compaction_census_invariants(spark):
    """Occupancy conservation, small-flag arithmetic, merge-target
    legality, and the surviving-cell count of the IVF compaction plan."""
    from insurance_helper_spark.queries.wave14_queries import VS_COMPACT_K

    rows = _q(spark, "vector_store_compaction_census").collect()
    assert len(rows) == VS_COMPACT_K
    n_total = sum(r["n_vectors"] for r in rows)
    big = {r["cell"] for r in rows if not r["is_small"]}
    assert big, "at least one big cell must exist (pigeonhole)"
    for r in rows:
        # integer-exact small test: 2*k*occ < n (half the mean)
        assert r["is_small"] == (2 * VS_COMPACT_K * r["n_vectors"] < n_total)
        if r["is_small"]:
            # every small cell merges into an existing BIG cell
            assert r["merge_into"] in big and r["merge_into"] != r["cell"]
            target = next(b for b in rows if b["cell"] == r["merge_into"])
            assert r["target_n"] == target["n_vectors"]
        else:
            assert r["merge_into"] is None and r["target_n"] is None
        assert r["n_cells_after"] == len(big)


def test_dispatch_boundary_audit_edges(spark):
    """The audit grid pins both hard edges of the exact-vs-LSH rule:
    the 1M-vector broadcast ceiling and the 128-table recall cap."""
    rows = _q(spark, "similarity_dispatch_boundary_audit").collect()
    assert len(rows) == 26
    by_band = {}
    for r in rows:
        by_band.setdefault(r["band"], {})[r["n_vectors"]] = r
    for band, grid in by_band.items():
        # ceiling edge: eligibility flips exactly between 1M and 1M+1
        assert grid[1_000_000]["under_ceiling"]
        assert not grid[1_000_001]["under_ceiling"]
        assert grid[1_000_001]["plan"] == "lsh"
        prev_planes = 0
        for n in sorted(grid):
            r = grid[n]
            # planes monotone in corpus size; tables within the cap
            assert r["n_planes"] >= prev_planes
            prev_planes = r["n_planes"]
            assert 1 <= r["n_tables"] <= 128
            # cap flag is truthful: capped rows sit AT the cap
            if r["table_capped"]:
                assert r["n_tables"] == 128
            # the plan column IS the dispatch branch both call sites run
            if r["plan"] == "exact-gemm":
                assert r["under_ceiling"]
                assert r["n_tables"] / 2 ** r["n_planes"] >= 1.0 / 16
            elif r["plan"] == "lsh":
                assert (
                    not r["under_ceiling"]
                    or r["n_tables"] / 2 ** r["n_planes"] < 1.0 / 16
                )
        # the grid must exercise BOTH plan regimes below the ceiling
        plans = {r["plan"] for r in grid.values()}
        assert "exact-gemm" in plans and "lsh" in plans


def test_gate_census_partitions_and_matches_stream_gate(spark):
    """The census categories partition n_docs, and the census's pass
    total equals the fixture count surviving the EXACT gate expression
    corpus_ingest_stream filters with (same functions, same constants)."""
    from pyspark.sql import functions as F

    from insurance_helper_spark.operators import corpus as C
    from insurance_helper_spark.queries.wave14_queries import (
        GATE_MAX_DUP_2GRAM,
        GATE_MIN_TOKENS,
    )
    from insurance_helper_spark.sources.tables import load_table

    rows = _q(spark, "corpus_ingest_gate_census").collect()
    assert rows
    for r in rows:
        assert r["n_short"] + r["n_repetitive"] + r["n_pass"] == r["n_docs"]
        assert 0.0 <= r["pass_rate"] <= 1.0
    docs = load_table(spark, SF_DIR, "documents", columns=["text"])
    stream_pass = docs.filter(
        C.repetition_gate_col(F.col("text"), GATE_MIN_TOKENS, GATE_MAX_DUP_2GRAM)
    ).count()
    assert sum(r["n_pass"] for r in rows) == stream_pass


def test_compaction_apply_conserves_and_merges(spark):
    """The executed compaction conserves vectors, adds exactly the
    received counts, and (on the fixture, where undersized cells are
    real at k=48) actually moves something."""
    plan = {r["cell"]: r for r in _q(spark, "vector_store_compaction_census").collect()}
    rows = _q(spark, "vector_store_compaction_apply").collect()
    big = {c for c, r in plan.items() if not r["is_small"]}
    assert {r["cell"] for r in rows} == big
    n_total = sum(r["n_vectors"] for r in plan.values())
    assert sum(r["n_after"] for r in rows) == n_total
    moved_total = sum(r["n_vectors"] for r in plan.values() if r["is_small"])
    assert sum(r["n_received"] for r in rows) == moved_total
    for r in rows:
        assert r["n_after"] == r["n_before"] + r["n_received"]
        # received counts land on the planned targets only
        planned = sum(
            p["n_vectors"] for p in plan.values()
            if p["is_small"] and p["merge_into"] == r["cell"]
        )
        assert r["n_received"] == planned
    # non-vacuous on the fixture: at least one real merge executed
    assert moved_total > 0

"""Session-memoized staged relations (queries/shared_cache.py): memo
identity, the block-sweeper KEEP contract (the r10 ADVICE class), and
value identity between the staged dedup relations and the operators
they replace. Plus the adaptive SRP plane-count math (r12)."""

from __future__ import annotations

from pyspark.sql import functions as F

from insurance_helper_spark.operators import dedup
from insurance_helper_spark.operators.similarity import adaptive_srp_planes
from insurance_helper_spark.queries import shared_cache as SC
from insurance_helper_spark.sources.tables import load_table
from tests.conftest import SF_DIR


def _rows(df):
    return sorted(map(tuple, df.collect()))


class TestMemoContract:
    def test_same_key_returns_same_object(self, spark):
        a = SC.doc_shingles(spark, SF_DIR)
        b = SC.doc_shingles(spark, SF_DIR)
        assert a is b

    def test_keep_ids_survive_block_sweeper(self, spark):
        """bench._release_blocks unpersists every block EXCEPT the
        memoized checkpoints — a memo consumer evaluated AFTER a sweep
        must still work (localCheckpoint truncates lineage, so a swept
        memo block is unrecoverable — the r10 regression class)."""
        import bench

        pairs = SC.ngram_pair_stats(spark, SF_DIR)
        before = _rows(pairs.filter(F.col("jaccard") >= 0.5))
        bench._release_blocks(spark)
        assert SC.keep_ids(spark)  # the memo blocks are registered
        after = _rows(
            SC.ngram_pair_stats(spark, SF_DIR).filter(F.col("jaccard") >= 0.5)
        )
        assert after == before

    def test_staged_relations_match_operators(self, spark):
        """The r12 rewiring claim, unit-pinned: the staged shingle /
        pair / component relations are value-identical to running the
        operators directly on the documents table."""
        docs = load_table(spark, SF_DIR, "documents", columns=["doc_id", "text"])
        assert _rows(SC.doc_shingles(spark, SF_DIR)) == _rows(
            dedup.hashed_shingle_rows(docs, "doc_id", "text", k=3)
        )
        staged = SC.ngram_pair_stats(spark, SF_DIR).filter(
            F.col("jaccard") >= 0.5
        )
        direct = dedup.ngram_jaccard_pairs(
            docs, "doc_id", "text", k=3, threshold=0.5
        )
        assert _rows(staged) == _rows(direct)
        comp = SC.ngram_components(spark, SF_DIR)
        assert _rows(comp) == _rows(dedup.connected_components(direct))


class TestAdaptivePlanes:
    def test_base_at_fixture_scales(self):
        # fixture embedding counts: 20 / 200 / 2000 — base planes hold,
        # so every recall pin and rows-only count is unchanged
        for n in (20, 200, 2000):
            assert adaptive_srp_planes(n, base_planes=4) == 4

    def test_linear_candidate_budget_beyond_base(self):
        # 2^planes >= n/target ==> per-table candidate volume <= target*n
        for n in (4_000, 20_000, 1_000_000, 10**9):
            p = adaptive_srp_planes(n, base_planes=4, target_occupancy=128)
            assert 2**p >= n / 128
            assert 2 ** (p - 1) < n / 128 or p == 4

    def test_monotone_in_n(self):
        prev = 0
        for n in (10, 10**3, 10**4, 10**5, 10**6, 10**9):
            p = adaptive_srp_planes(n, base_planes=4)
            assert p >= prev
            prev = p

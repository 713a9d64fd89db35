"""Semantic unit tests for the corpus-preparation operators (round 4):
span dedup keep-first, contamination flagging, repetition gates,
greedy packing boundaries."""

from __future__ import annotations

import pyspark.sql.functions as F

from insurance_helper_spark.operators import corpus


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


class TestSpanDedup:
    def test_keep_first_drops_later_copies(self, spark):
        ten = " ".join(f"w{i}" for i in range(10))
        other = " ".join(f"x{i}" for i in range(10))
        df = _docs(
            spark,
            [(1, ten + " " + other), (2, ten + " unique tail here")],
        )
        out = {
            r["doc_id"]: r
            for r in corpus.span_dedup(df, "doc_id", "text", span=10).collect()
        }
        # doc 1 is the smallest id containing the shared span — keeps it.
        assert out[1]["n_dropped"] == 0
        assert out[1]["clean_text"] == ten + " " + other
        # doc 2 loses the shared span but keeps its own tail.
        assert out[2]["n_dropped"] == 1
        assert out[2]["clean_text"] == "unique tail here"

    def test_within_doc_repeat_is_also_deduped_keep_first(self, spark):
        ten = " ".join(f"w{i}" for i in range(10))
        df = _docs(spark, [(7, ten + " " + ten)])
        row = corpus.span_dedup(df, "doc_id", "text", span=10).collect()[0]
        # same span twice in one doc: the window keeps only rows equal to
        # min doc over the span — both rows are doc 7, both kept (the
        # operator dedups ACROSS docs, not within).
        assert row["n_spans"] == 2
        assert row["n_dropped"] == 0

    def test_partial_tail_span_participates(self, spark):
        ten = " ".join(f"w{i}" for i in range(10))
        df = _docs(spark, [(1, ten + " tail"), (2, "tail")])
        out = {
            r["doc_id"]: r
            for r in corpus.span_dedup(df, "doc_id", "text", span=10).collect()
        }
        assert out[2]["n_dropped"] == 1  # 'tail' already owned by doc 1
        assert out[2]["clean_text"] == ""


class TestContamination:
    def test_exact_copy_flagged(self, spark):
        text = " ".join(f"t{i}" for i in range(20))
        bench = _docs(spark, [(100, text)])
        corp = _docs(spark, [(1, text), (2, " ".join(f"z{i}" for i in range(20)))])
        out = {
            r["doc_id"]: r
            for r in corpus.contamination(
                corp, bench, "doc_id", "text", k=5, threshold=0.2
            ).collect()
        }
        assert out[1]["contaminated"] and out[1]["contam_frac"] == 1.0
        assert not out[2]["contaminated"] and out[2]["n_hits"] == 0

    def test_short_docs_without_full_shingle_are_excluded(self, spark):
        bench = _docs(spark, [(100, "a b c d e f g h")])
        corp = _docs(spark, [(1, "a b c")])  # < k tokens → no shingles
        assert (
            corpus.contamination(corp, bench, "doc_id", "text", k=5).count() == 0
        )


class TestRepetition:
    def test_top_word_gate(self, spark):
        df = _docs(spark, [(1, "spam spam spam spam fresh")])
        row = corpus.repetition_stats(df, "doc_id", "text").collect()[0]
        assert row["top_word_frac"] == 0.8
        assert row["repetitive"]

    def test_diverse_doc_passes(self, spark):
        df = _docs(spark, [(1, " ".join(f"w{i}" for i in range(30)))])
        row = corpus.repetition_stats(df, "doc_id", "text").collect()[0]
        assert row["top_word_frac"] < 0.2
        assert row["dup_2gram_frac"] == 0.0
        assert not row["repetitive"]

    def test_dup_2gram_gate(self, spark):
        # 'a b a b a b ...' — every 2-gram after the first two repeats.
        df = _docs(spark, [(1, "a b " * 10)])
        row = corpus.repetition_stats(df, "doc_id", "text").collect()[0]
        assert row["dup_2gram_frac"] > 0.4
        assert row["repetitive"]


class TestPacking:
    def _pack(self, spark, sizes, cap):
        rows = [(i, "g", s) for i, s in enumerate(sizes)]
        df = spark.createDataFrame(rows, "doc_id long, source string, tokens long")
        out = corpus.pack_sequences(df, "doc_id", "source", "tokens", capacity=cap)
        return [
            (r["bin_id"], r["bin_fill"])
            for r in out.orderBy("doc_id").collect()
        ]

    def test_greedy_boundaries(self, spark):
        got = self._pack(spark, [100, 100, 100], cap=250)
        assert got == [(0, 100), (0, 200), (1, 100)]

    def test_oversize_item_gets_own_bin(self, spark):
        got = self._pack(spark, [300, 10], cap=256)
        # first item exceeds capacity alone → own bin; next opens bin 1.
        assert got == [(0, 300), (1, 10)]

    def test_exact_fit_stays(self, spark):
        got = self._pack(spark, [128, 128, 1], cap=256)
        assert got == [(0, 128), (0, 256), (1, 1)]

    def test_groups_pack_independently(self, spark):
        rows = [(1, "a", 200), (2, "b", 200), (3, "a", 200), (4, "b", 200)]
        df = spark.createDataFrame(rows, "doc_id long, source string, tokens long")
        out = corpus.pack_sequences(df, "doc_id", "source", "tokens", capacity=256)
        bins = {r["doc_id"]: r["bin_id"] for r in out.collect()}
        assert bins == {1: 0, 2: 0, 3: 1, 4: 1}

    def test_boilerplate_cap_drops_span_everywhere(self, spark):
        ten = " ".join(f"w{i}" for i in range(10))
        uniq = lambda j: " ".join(f"u{j}x{i}" for i in range(10))
        # the shared span appears in 3 docs — above max_span_freq=2, so
        # even doc 1 (the would-be keeper) loses it.
        df = _docs(
            spark,
            [(1, ten + " " + uniq(1)), (2, ten + " " + uniq(2)), (3, ten + " " + uniq(3))],
        )
        out = {
            r["doc_id"]: r
            for r in corpus.span_dedup(
                df, "doc_id", "text", span=10, max_span_freq=2
            ).collect()
        }
        for i in (1, 2, 3):
            assert out[i]["n_spans"] == 2
            assert out[i]["n_dropped"] == 1
            assert out[i]["clean_text"] == uniq(i)
        # below the cap the keep-first convention returns
        out2 = {
            r["doc_id"]: r
            for r in corpus.span_dedup(
                df, "doc_id", "text", span=10, max_span_freq=5
            ).collect()
        }
        assert out2[1]["n_dropped"] == 0
        assert out2[2]["n_dropped"] == 1 and out2[3]["n_dropped"] == 1

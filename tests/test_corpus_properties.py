"""Property-based tests (hypothesis) for the corpus operators whose
correctness is an ALGORITHMIC invariant rather than a fixture value:
greedy packing bounds and span-dedup conservation."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from insurance_helper_spark.operators import corpus

_SIZES = st.lists(st.integers(min_value=1, max_value=400), min_size=1, max_size=12)


def _greedy_reference(sizes, cap):
    """Independent Python reference for first-fit-in-order packing."""
    out, bin_id, fill = [], 0, 0
    for i, sz in enumerate(sizes):
        if i > 0 and fill + sz > cap:
            bin_id, fill = bin_id + 1, 0
        fill += sz
        out.append((bin_id, fill))
    return out


@settings(max_examples=12, deadline=None, suppress_health_check=[HealthCheck.too_slow])
@given(sizes=_SIZES, cap=st.integers(min_value=1, max_value=300))
def test_pack_sequences_matches_reference_and_invariants(spark, sizes, cap):
    rows = [(i, "g", s) for i, s in enumerate(sizes)]
    df = spark.createDataFrame(rows, "doc_id long, source string, tokens long")
    got = [
        (r["bin_id"], r["bin_fill"])
        for r in corpus.pack_sequences(df, "doc_id", "source", "tokens", capacity=cap)
        .orderBy("doc_id")
        .collect()
    ]
    assert got == _greedy_reference(sizes, cap)
    # invariants: bins dense & monotone; fill within capacity unless the
    # single item itself exceeds it
    bins = [b for b, _ in got]
    assert bins[0] == 0
    assert all(b2 - b1 in (0, 1) for b1, b2 in zip(bins, bins[1:]))
    for (b, fill), sz in zip(got, sizes):
        assert fill <= max(cap, sz)


_WORDS = st.lists(
    st.sampled_from(["alpha", "bravo", "charlie", "delta", "echo", "foxtrot"]),
    min_size=1,
    max_size=40,
)


@settings(max_examples=10, deadline=None, suppress_health_check=[HealthCheck.too_slow])
@given(docs=st.lists(_WORDS, min_size=1, max_size=4))
def test_span_dedup_conservation_and_keep_first(spark, docs):
    rows = [(i, " ".join(words)) for i, words in enumerate(docs)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in corpus.span_dedup(df, "doc_id", "text", span=10).collect()}
    assert set(out) == {i for i, _ in rows}
    # conservation: kept + dropped spans == total spans, and the doc
    # with the global minimum id never loses a span to a later doc.
    for i, words in enumerate(docs):
        n_spans = max(1, -(-len(words) // 10))
        r = out[i]
        assert r["n_spans"] == n_spans
        assert 0 <= r["n_dropped"] <= n_spans
    assert out[0]["n_dropped"] == 0  # smallest id keeps every span


@settings(max_examples=10, deadline=None, suppress_health_check=[HealthCheck.too_slow])
@given(words=_WORDS)
def test_repetition_fractions_bounded(spark, words):
    df = spark.createDataFrame([(1, " ".join(words))], "doc_id long, text string")
    r = corpus.repetition_stats(df, "doc_id", "text").collect()[0]
    assert r["n_tokens"] == len(words)
    assert 0.0 < r["top_word_frac"] <= 1.0
    assert 0.0 <= r["dup_2gram_frac"] < 1.0 or (len(words) >= 2 and r["dup_2gram_frac"] <= 1.0)
    # top word fraction is at least 1/n (some word occurs once);
    # the column rounds to 6 digits, hence the epsilon
    assert r["top_word_frac"] >= 1.0 / max(len(words), 1) - 1e-6

"""Text-analysis operators for the LLM-data-pipeline surface.

All pure column expressions (JVM-side, codegen-friendly) — no Python
UDFs in the hot path. Operates on ``documents.text``-style columns.

- tokenization (whitespace + punctuation-aware regex)
- token / char counting
- quality scoring (length, punctuation ratio, stopword ratio,
  mean word length)
- language-ID heuristic (script detection + stopword hit-rate)
- document fingerprinting (content hash; shingle base for MinHash)
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Small multilingual stopword seed sets for the lang-id heuristic.
EN_STOPWORDS = (
    "the", "a", "an", "and", "or", "of", "to", "in", "is", "it",
    "for", "on", "with", "as", "was", "at", "by", "be", "this", "that",
)


def normalize_text(col: Column) -> Column:
    """Lowercase, strip non-alphanumerics to spaces, collapse whitespace."""
    s = F.lower(col)
    s = F.regexp_replace(s, r"[^\p{L}\p{N}]+", " ")
    return F.trim(s)


def tokens(col: Column) -> Column:
    """Split normalized text into an array of word tokens.

    ``array_remove(..., '')`` handles the empty-text case (split('')
    yields ['']) with a SINGLE reference to the normalize expression —
    a when-guard would inline the regex twice into every consumer.
    """
    return F.array_remove(F.split(normalize_text(col), " "), "")


def token_count(col: Column) -> Column:
    """Whitespace-token count of normalized text (BPE-ish proxy)."""
    return F.size(tokens(col))


def char_count(col: Column) -> Column:
    return F.length(col)


def punct_ratio(col: Column) -> Column:
    """Fraction of characters that are not alphanumeric/space."""
    n = F.length(col)
    punct = F.length(F.regexp_replace(col, r"[\p{L}\p{N}\s]", ""))
    return F.when(n > 0, punct.cast("double") / n.cast("double")).otherwise(F.lit(0.0))


def stopword_ratio_of(toks: Column, stopwords: tuple[str, ...] = EN_STOPWORDS) -> Column:
    """stopword_ratio over an ALREADY-TOKENIZED array column.

    Hot paths project ``tokens(...)`` once and feed the alias here, so
    the tokenizer regex appears exactly once in the plan no matter how
    many metrics consume it (plan-shape-tested in test_plans)."""
    sw = F.array(*[F.lit(w) for w in stopwords])
    # filter (not array_intersect) so token multiplicity counts
    hits = F.size(F.filter(toks, lambda t: F.array_contains(sw, t)))
    n = F.size(toks)
    return F.when(n > 0, hits.cast("double") / n.cast("double")).otherwise(F.lit(0.0))


def stopword_ratio(col: Column, stopwords: tuple[str, ...] = EN_STOPWORDS) -> Column:
    """Fraction of tokens that are stopwords (quality / lang-id signal)."""
    return stopword_ratio_of(tokens(col), stopwords)


def mean_word_length_of(toks: Column) -> Column:
    """mean_word_length over an already-tokenized array column."""
    total = F.aggregate(
        toks, F.lit(0).cast("bigint"), lambda acc, t: acc + F.length(t)
    )
    n = F.size(toks)
    return F.when(n > 0, total.cast("double") / n.cast("double")).otherwise(F.lit(0.0))


def mean_word_length(col: Column) -> Column:
    return mean_word_length_of(tokens(col))


def quality_score(col: Column) -> Column:
    """Composite [0,1] quality score: balanced length, low punctuation,
    reasonable stopword density. Deterministic and SQL-reproducible."""
    n_tok = token_count(col).cast("double")
    len_score = F.least(n_tok / F.lit(50.0), F.lit(1.0))
    punct_score = F.lit(1.0) - F.least(punct_ratio(col) * 4.0, F.lit(1.0))
    sw = stopword_ratio(col)
    sw_score = F.lit(1.0) - F.least(F.abs(sw - 0.4) * 2.0, F.lit(1.0))
    return F.round((len_score + punct_score + sw_score) / 3.0, 4)


def lang_id(col: Column) -> Column:
    """Heuristic language ID: script detection first, then English
    stopword hit-rate; 'unknown' otherwise.

    Covers the scripts that actually appear in the reference corpus
    (Devanagari filenames in life_list — SURVEY §1.3) plus CJK/Arabic/
    Cyrillic for generality.
    """
    sw_ratio = stopword_ratio(col)
    return (
        F.when(col.rlike(r"[ऀ-ॿ]"), F.lit("hi"))
        .when(col.rlike(r"[一-鿿]"), F.lit("zh"))
        .when(col.rlike(r"[؀-ۿ]"), F.lit("ar"))
        .when(col.rlike(r"[Ѐ-ӿ]"), F.lit("ru"))
        .when(sw_ratio >= 0.08, F.lit("en"))
        .otherwise(F.lit("unknown"))
    )


def fingerprint(col: Column) -> Column:
    """Deterministic content fingerprint: sha2-256 of normalized text.

    The exact-dedup key; sha2 (not xxhash) so the DuckDB oracle matches.
    """
    return F.sha2(normalize_text(col), 256)


def shingles(col: Column, k: int = 3) -> Column:
    """Array of distinct k-token string shingles of a text column.

    Convenience expression for small/interactive use ONLY. Higher-order
    functions evaluate their lambda per element interpreted, and
    Catalyst re-inlines the tokenizer regex into the lambda under a
    Generate consumer (~30× slowdown measured at sf0.1) — hot paths
    must use ``operators.dedup.hashed_shingle_rows`` (posexplode +
    window lead, fully codegen'd) instead.
    """
    toks = tokens(col)
    n = F.size(toks)
    idx = F.sequence(F.lit(1), F.greatest(n - k + 1, F.lit(0)))
    return F.array_distinct(
        F.transform(
            idx, lambda i: F.concat_ws(" ", *[F.element_at(toks, i + j) for j in range(k)])
        )
    )


def rolling_fingerprint(col: Column, mod: int = 1_000_000_007, base: int = 31) -> Column:
    """Rabin–Karp polynomial rolling hash of the normalized text.

    h = fold(chars, h*base + ascii(c) mod ``mod``) — the classic
    rolling-hash construction; combined with overlapping windows
    (queries/corpus_ops.chunk_documents) it yields windowed content
    fingerprints. Unlike ``fingerprint`` (sha2, cryptographic) this is
    cheap, incremental, and ORACLE-reproducible with integer-exact
    semantics: every step stays < 2^63 because acc < mod and
    ascii ≤ 0x10FFFF, so Spark BIGINT and DuckDB BIGINT folds agree
    bit-for-bit.
    """
    chars = F.array_remove(F.split(normalize_text(col), ""), "")
    return F.aggregate(
        chars,
        F.lit(0).cast("long"),
        lambda acc, c: (acc * base + F.ascii(c)) % mod,
    )

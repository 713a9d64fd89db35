"""Python user-defined table functions (Spark 4 UDTF API) — the
SQL-callable row-generating surface that complements the engine's
scalar/UDF/pandas-UDF tiers (SURVEY §2B "UDF surface").

Two table functions a corpus pipeline actually calls from SQL:

- ``chunk_text(text, size)`` — fixed-size token chunks with ids (the
  UDTF twin of ``queries.text_queries.chunk_documents``'s column-
  expression windows; the UDTF form composes in SQL ``LATERAL``).
- ``extract_doc_links(html)`` — one row per document link in a
  listing-page snippet, running the engine's P2 extraction.

UDTF evaluation is row-at-a-time Python — the SLOW tier (the engine's
hot paths stay in column expressions / Arrow batches; plan-sweep
enforces it). A UDTF earns its place only as a SQL-surface adapter for
logic that genuinely yields variable row counts per input, invoked on
already-reduced relations.

Register with ``register_udtfs(spark)``; then
``SELECT c.* FROM docs, LATERAL chunk_text(docs.text, 128) c``.
"""

from __future__ import annotations

from pyspark.sql.functions import udtf


@udtf(returnType="chunk_id int, n_tokens int, chunk string")
class ChunkText:
    """Fixed-size token chunking: (chunk_id, n_tokens, chunk) rows."""

    def eval(self, text: str, size: int):
        if text is None or size is None or size <= 0:
            return
        toks = text.split()
        for i in range(0, len(toks), size):
            window = toks[i : i + size]
            yield i // size, len(window), " ".join(window)


@udtf(returnType="link_url string, link_text string")
class ExtractDocLinks:
    """One row per document link in an HTML fragment (P2 semantics)."""

    def eval(self, html: str):
        if not html:
            return
        from insurance_helper_spark.sources.html_parse import (
            extract_document_link,
            parse_html,
        )

        parsed = parse_html(html)
        for table in parsed.tables:
            for row in table.rows:
                for cell in row.cells:
                    url, text = extract_document_link(cell)
                    if url:
                        yield url, text


def register_udtfs(spark) -> None:
    """Register all table functions with the session (idempotent)."""
    from insurance_helper_spark.shipping import ensure_shipped

    ensure_shipped(spark)
    spark.udtf.register("chunk_text", ChunkText)
    spark.udtf.register("extract_doc_links", ExtractDocLinks)

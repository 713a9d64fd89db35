"""Tests for the Python UDTF surface (functions/udtfs.py)."""

from __future__ import annotations

from insurance_helper_spark.functions.udtfs import register_udtfs


def test_chunk_text_in_sql_lateral(spark):
    register_udtfs(spark)
    spark.createDataFrame(
        [(1, "a b c d e f g"), (2, "x y"), (3, None)], "doc_id long, text string"
    ).createOrReplaceTempView("udtf_docs")
    rows = spark.sql(
        """
        SELECT d.doc_id, c.chunk_id, c.n_tokens, c.chunk
        FROM udtf_docs d, LATERAL chunk_text(d.text, 3) c
        ORDER BY d.doc_id, c.chunk_id
        """
    ).collect()
    got = [(r.doc_id, r.chunk_id, r.n_tokens, r.chunk) for r in rows]
    assert got == [
        (1, 0, 3, "a b c"),
        (1, 1, 3, "d e f"),
        (1, 2, 1, "g"),
        (2, 0, 2, "x y"),
    ]  # null text yields no rows (doc 3 absent)


def test_chunk_text_degenerate_args(spark):
    register_udtfs(spark)
    assert spark.sql("SELECT * FROM chunk_text('a b', 0)").count() == 0
    assert spark.sql("SELECT * FROM chunk_text(NULL, 5)").count() == 0


def test_extract_doc_links_p2_semantics(spark):
    register_udtfs(spark)
    html = (
        "<div class='portlet'><table class='table'><tbody>"
        "<tr><td>Prod A</td><td><a href='/documents/a.pdf'>Policy A</a></td></tr>"
        "<tr><td>Prod B</td><td><a href='https://x.example/b.xlsx'>B sheet</a></td></tr>"
        "<tr><td>No link here</td><td>plain</td></tr>"
        "</tbody></table></div>"
    )
    spark.createDataFrame([(html,)], "html string").createOrReplaceTempView("udtf_html")
    rows = spark.sql(
        "SELECT l.* FROM udtf_html, LATERAL extract_doc_links(html) l ORDER BY link_url"
    ).collect()
    urls = [r.link_url for r in rows]
    assert "https://irdai.gov.in/documents/a.pdf" in urls  # absolutized
    assert "https://x.example/b.xlsx" in urls
    assert len(rows) == 2

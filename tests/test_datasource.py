"""Tests for the custom Python DataSource (sources/datasource.py):
listing-page snapshots as a first-class spark.read format."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from insurance_helper_spark.sources import datasource
from tests.test_scrape_pipeline import NONLIFE_ROWS, make_listing_html


@pytest.fixture()
def snapshot_dir(tmp_path):
    d = tmp_path / "snapshots"
    d.mkdir()
    (d / "page_1.html").write_text(make_listing_html(NONLIFE_ROWS, total=120))
    (d / "page_2.html").write_text(make_listing_html(NONLIFE_ROWS[:1], total=120))
    (d / "broken_3.html").write_text("<html><body>no table here</body></html>")
    (d / "notes.txt").write_text("ignored: not html")
    return d


def test_reads_rows_with_file_parallelism(spark, snapshot_dir):
    datasource.register(spark)
    df = (
        spark.read.format("listing_pages")
        .option("path", str(snapshot_dir))
        .load()
    )
    rows = df.collect()
    by_file = {}
    for r in rows:
        by_file.setdefault(r.page_file, []).append(r)
    # Two real pages parsed; the broken page yields its F3 error row.
    assert len(by_file["page_1.html"]) == len(NONLIFE_ROWS)
    assert len(by_file["page_2.html"]) == 1
    assert by_file["broken_3.html"][0].parse_error == "no-data-table"
    assert "notes.txt" not in {r.page_file for r in rows}
    # Page numbers derived from filenames.
    assert all(r.page == 1 for r in by_file["page_1.html"])
    assert all(r.page == 2 for r in by_file["page_2.html"])
    # Document links extracted by the P2 pass.
    assert any(r.link_url for r in by_file["page_1.html"])


def test_projection_and_filter_compose(spark, snapshot_dir):
    datasource.register(spark)
    df = (
        spark.read.format("listing_pages")
        .option("path", str(snapshot_dir))
        .load()
        .filter(F.col("parse_error").isNull())
        .select("page", "cells")
    )
    rows = df.collect()
    assert rows
    assert all(isinstance(r.cells, list) and len(r.cells) > 0 for r in rows)


def test_missing_path_option_raises(spark, snapshot_dir):
    datasource.register(spark)
    with pytest.raises(Exception):
        spark.read.format("listing_pages").load().collect()


def test_stream_reader_incremental_batches(spark, snapshot_dir, tmp_path):
    datasource.register(spark)

    out_dir = str(tmp_path / "out")

    def drain():
        q = (
            spark.readStream.format("listing_pages")
            .option("path", str(snapshot_dir))
            .load()
            .writeStream.format("parquet")
            .option("path", out_dir)
            .outputMode("append")
            .trigger(availableNow=True)
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .start()
        )
        q.awaitTermination()
        return spark.read.parquet(out_dir).collect()

    first = drain()
    n_initial = len(first)
    assert n_initial == len(NONLIFE_ROWS) + 1 + 1  # page1 + page2 + error row
    # A new snapshot arrives: only IT is read on the next drain.
    (snapshot_dir / "page_9.html").write_text(
        make_listing_html(NONLIFE_ROWS[:2], total=120)
    )
    second = drain()
    assert len(second) == n_initial + 2
    new_rows = [r for r in second if r.page_file == "page_9.html"]
    assert len(new_rows) == 2 and all(r.page == 9 for r in new_rows)
    # Idle rerun appends nothing (checkpointed offsets).
    assert len(drain()) == len(second)

"""Compaction + z-order clustering tests: file counts, bit
interleaving, and the locality property that makes footer stats
selective on BOTH clustered columns."""

from __future__ import annotations

import glob

from pyspark.sql import functions as F

from insurance_helper_spark.sources import maintenance


def test_zorder_value_interleaves_bits(spark):
    df = spark.createDataFrame([(0b101, 0b011)], "a long, b long")
    got = df.select(
        maintenance.zorder_value(F.col("a"), F.col("b")).alias("z")
    ).head()["z"]
    # a=101, b=011 → z bit 2i from a, 2i+1 from b: a0=1,b0=1,a1=0,b1=1,a2=1,b2=0
    assert got == 0b011011


def test_compact_writes_exact_file_count(spark, sf_dir, tmp_path):
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    path = str(tmp_path / "orders_compact")
    maintenance.compact(orders, path, n_files=4, sort_cols=["o_orderkey"])
    files = glob.glob(f"{path}/part-*.parquet")
    assert len(files) == 4
    back = spark.read.parquet(path)
    assert back.count() == orders.count()


def test_zorder_clustering_tightens_both_dimensions(spark, sf_dir, tmp_path):
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    n_files = 8
    path = str(tmp_path / "orders_z")
    maintenance.compact_clustered(
        orders, path, n_files=n_files, col_a="o_custkey", col_b="o_totalprice"
    )
    back = spark.read.parquet(path)
    assert back.count() == orders.count()
    assert "__z" not in back.columns

    # per-file bounding boxes: with z-order clustering the average
    # per-file span of EACH key must be well below the global span
    # (single-key sorting would shrink one dimension only).
    stats = (
        back.withColumn("f", F.input_file_name())
        .groupBy("f")
        .agg(
            (F.max("o_custkey") - F.min("o_custkey")).alias("a_span"),
            (F.max("o_totalprice") - F.min("o_totalprice")).alias("b_span"),
        )
        .agg(F.avg("a_span").alias("a"), F.avg("b_span").alias("b"))
        .head()
    )
    g = orders.agg(
        (F.max("o_custkey") - F.min("o_custkey")).alias("a"),
        (F.max("o_totalprice") - F.min("o_totalprice")).alias("b"),
    ).head()
    assert stats["a"] < 0.8 * g["a"]
    assert stats["b"] < 0.8 * g["b"]

"""Sink coverage (SURVEY §2B scans/sinks): CSV append fidelity (W1),
partitioned parquet write + partition pruning (K3 physical layout),
JSON roundtrip."""

from __future__ import annotations

from pyspark.sql import Row
from pyspark.sql import functions as F

from insurance_helper_spark.sources import sinks


def test_bronze_csv_append_and_null_fidelity(spark, tmp_path):
    path = str(tmp_path / "bronze_life")
    schema = "uin string, insurer string, remarks string"
    rows1 = [("U1", "A", None), ("U2", "B", "x")]
    rows2 = [("U3", "C", None)]
    sinks.write_bronze_csv(spark.createDataFrame(rows1, schema), path)
    sinks.write_bronze_csv(spark.createDataFrame(rows2, schema), path)

    back = sinks.read_bronze_csv(spark, path)
    assert back.count() == 3  # append, not overwrite (A1 analog)
    assert "scraped_at" in back.columns  # csv_writer.py:53-54 stamp
    # None → "" on disk; the all-string bronze read surfaces it as null
    # again (CSV empty-string == null under default reader), so the
    # roundtrip preserves SQL-null semantics.
    assert back.filter(F.col("uin") == "U1").first().remarks is None


def test_partitioned_write_prunes_partitions(spark, sf_dir, tmp_path):
    path = str(tmp_path / "orders_part")
    orders = (
        spark.read.parquet(f"{sf_dir}/orders.parquet")
        .withColumn("order_year", F.year("o_orderdate"))
    )
    sinks.write_partitioned(orders, path, ["order_year"])

    back = spark.read.parquet(path).filter(F.col("order_year") == 1995)
    plan = back._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "order_year" in plan
    expected = orders.filter(F.year("o_orderdate") == 1995).count()
    assert back.count() == expected and expected > 0


def test_json_roundtrip_state_records(spark, tmp_path):
    path = str(tmp_path / "state_json")
    failed = spark.createDataFrame(
        [Row(url="http://x/a.pdf", error="timeout", retries=2),
         Row(url="http://x/b.pdf", error="http 500", retries=0)]
    )
    sinks.write_json(failed, path)
    back = sinks.read_json(spark, path)
    assert back.count() == 2
    assert {r.url for r in back.collect()} == {"http://x/a.pdf", "http://x/b.pdf"}

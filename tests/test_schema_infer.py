"""Schema inference + enforcement (sources/schema_infer.py): candidate
classification, the integer-exact promotion threshold, and the
four-table bronze→silver round-trip the reference's Stage-2 "Schema
Builder" declaration implies (README.md:91-101)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from insurance_helper_spark.sources import schema_infer as SI
from tests.conftest import SF_DIR


def _report_map(rep):
    return {r["column"]: r for r in rep.collect()}


class TestCandidates:
    def test_parse_ok_matrix(self, spark):
        cells = [
            ("42", "bigint"),
            ("-7", "bigint"),
            ("12.5", "double"),
            ("1e3", "double"),
            ("04-06-2018", "date"),
            ("2018-06-04", "date"),
            ("2018-06-04 04-06-2018", "date"),  # concatenated pathology
            ("true", "boolean"),
            ("FALSE", "boolean"),
            ("N/A", "string"),
            ("1-URGENT", "string"),
            ("", "string"),
        ]
        df = spark.createDataFrame([(v,) for v, _ in cells], "s string")
        got = df.select(
            "s",
            *[SI.parse_ok(F.col("s"), t).alias(t) for t in SI.TYPE_PRECEDENCE],
        ).collect()
        by_val = {r["s"]: r for r in got}
        for v, expect in cells:
            r = by_val[v]
            first = next(
                (t for t in SI.TYPE_PRECEDENCE if r[t]), "string"
            )
            assert first == expect, (v, first, expect)

    def test_cast_matches_parse_ok_for_every_type(self, spark):
        """Definitional consistency (ADVICE r12): for EVERY candidate
        type, cast_as yields non-null exactly where parse_ok is true —
        including date heads the trial parser would accept but the
        shape gate rejects (>4-digit years), which previously cast
        to a value the census had counted as unparseable."""
        vals = [
            "42", "-7", "12.5", "1e3", "true", "FALSE", "N/A", "",
            "2018-06-04", "04-06-2018", "2018-06-04 04-06-2018",
            "12345-01-01",  # trial parse may accept; shape gate must not
            "3-Jan-2020", "03-Jan-2020", "9" * 19, "1-URGENT",
        ]
        df = spark.createDataFrame([(v,) for v in vals], "s string")
        for t in SI.TYPE_PRECEDENCE:
            rows = df.select(
                "s",
                SI.parse_ok(F.col("s"), t).alias("ok"),
                SI.cast_as(F.col("s"), t).alias("cast"),
            ).collect()
            for r in rows:
                assert bool(r["ok"]) == (r["cast"] is not None), (t, r["s"])

    def test_bigint_regex_never_overflows(self, spark):
        # 19 digits would exceed int64 territory: must NOT classify as
        # bigint (falls through to double, which is lossy but safe)
        df = spark.createDataFrame([("9" * 19,)], "s string")
        r = df.select(
            SI.parse_ok(F.col("s"), "bigint").alias("b"),
            SI.parse_ok(F.col("s"), "double").alias("d"),
        ).first()
        assert not r["b"] and r["d"]


class TestThreshold:
    def test_promotion_is_integer_exact_at_the_boundary(self, spark):
        # 199 parses out of 200 non-null = exactly 995 permille → promote;
        # 198/200 = 990 → reject. The decision must be exact integer
        # arithmetic, not a float compare.
        rows_at = [(str(i),) for i in range(199)] + [("x",)]
        rows_below = [(str(i),) for i in range(198)] + [("x",), ("y",)]
        at = SI.infer_report(spark.createDataFrame(rows_at, "c string"))
        below = SI.infer_report(spark.createDataFrame(rows_below, "c string"))
        assert _report_map(at)["c"]["inferred_type"] == "bigint"
        assert _report_map(below)["c"]["inferred_type"] == "string"

    def test_all_null_column_stays_string(self, spark):
        df = spark.createDataFrame([(None,), (None,)], "c string")
        assert _report_map(SI.infer_report(df))["c"]["inferred_type"] == "string"


# Expected inference per (table, column) when the typed fixture tables
# are bronze-ified: numeric keys/measures promote, text stays string.
_FOUR_TABLES = {
    "orders": {
        "o_orderkey": "bigint", "o_custkey": "bigint",
        "o_orderstatus": "string", "o_totalprice": "double",
        "o_orderpriority": "string",
    },
    "customer": {
        "c_custkey": "bigint", "c_name": "string",
        "c_nationkey": "bigint", "c_acctbal": "double",
        "c_mktsegment": "string",
    },
    "part": {
        "p_partkey": "bigint", "p_name": "string", "p_brand": "string",
        "p_type": "string", "p_size": "bigint", "p_retailprice": "double",
    },
    "supplier": {
        "s_suppkey": "bigint", "s_name": "string",
        "s_nationkey": "bigint", "s_acctbal": "double",
    },
}


class TestFourTableRoundTrip:
    @pytest.mark.parametrize("table", sorted(_FOUR_TABLES))
    def test_bronze_infer_apply_roundtrip(self, spark, table):
        """Typed table → all-string bronze → infer → apply: the inferred
        types match the logical types and every promoted column
        round-trips value-exactly (doubles in exact cents)."""
        expected = _FOUR_TABLES[table]
        typed = spark.read.parquet(f"{SF_DIR}/{table}.parquet").select(
            *expected.keys()
        )
        cents = {
            c for c, t in expected.items()
            if t == "double"
        }
        bronze = typed.select(
            *[
                (
                    # sign-aware cents rendering (c_acctbal is negative
                    # for some rows; %d.%02d mangles negative cents)
                    F.expr(
                        f"concat(CASE WHEN {c} < 0 THEN '-' ELSE '' END,"
                        f" format_string('%d.%02d',"
                        f"  abs(CAST(round({c} * 100) AS BIGINT)) div 100,"
                        f"  abs(CAST(round({c} * 100) AS BIGINT)) % 100))"
                    )
                    if c in cents
                    else F.col(c).cast("string")
                ).alias(c)
                for c in expected
            ]
        )
        rep = _report_map(SI.infer_report(bronze))
        got = {c: rep[c]["inferred_type"] for c in expected}
        assert got == expected
        silver = SI.apply_schema(bronze, got)
        # promoted columns: zero nulls introduced, zero value mismatches
        checks = []
        for c, t in expected.items():
            if t == "bigint":
                checks.append(
                    F.sum(
                        F.when(
                            F.col(f"s_{c}").isNull()
                            | (F.col(f"s_{c}") != F.col(f"t_{c}")),
                            1,
                        ).otherwise(0)
                    ).alias(c)
                )
            elif t == "double":
                checks.append(
                    F.sum(
                        F.when(
                            F.col(f"s_{c}").isNull()
                            | (
                                F.round(F.col(f"s_{c}") * 100).cast("long")
                                != F.round(F.col(f"t_{c}") * 100).cast("long")
                            ),
                            1,
                        ).otherwise(0)
                    ).alias(c)
                )
        key = next(iter(expected))  # each table's unique bigint key
        joined = silver.select(
            [F.col(c).alias(f"s_{c}") for c in expected]
        ).join(
            typed.select([F.col(c).alias(f"t_{c}") for c in expected]),
            F.col(f"s_{key}") == F.col(f"t_{key}"),
        )
        assert joined.count() == typed.count()  # key round-trips 1:1
        bad = joined.agg(*checks).first()
        for c, t in expected.items():
            if t in ("bigint", "double"):
                assert bad[c] == 0, (table, c)

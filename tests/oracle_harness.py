"""Local mirror of the driver's DuckDB-oracle comparison.

Runs a registered Spark query and its oracle SQL on the same parquet
tables and compares row count, column names, and order-insensitive
values. The comparison is deliberately DTYPE-FAITHFUL: an int64 ``5``
and a float64 ``5.0`` are DIFFERENT cells, and floats are compared
exactly (no tolerance, no re-rounding) — queries must do their own
rounding. Round 1 shipped three driver hash failures precisely because
the old harness rounded floats and used type-erasing ``==``; this
version reproduces the driver's strictness so local green predicts
driver green.
"""

from __future__ import annotations

import math
from datetime import date, datetime
from decimal import Decimal

import duckdb
import numpy as np
import pandas as pd

from insurance_helper_spark.sources.tables import FIXTURE_TABLES


def run_oracle(sql: str, sf_dir: str) -> pd.DataFrame:
    con = duckdb.connect()
    for t in FIXTURE_TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    return con.execute(sql).df()


def _norm_cell(v):
    """Normalize one cell to a type-tagged hashable value.

    The tag makes int-vs-float divergence (DuckDB HUGEINT→float64 vs
    Spark BIGINT→int64, LONG ceil vs DOUBLE ceil, …) a local failure
    instead of a driver-only one. Floats are NOT rounded.
    """
    if v is None:
        return None
    if isinstance(v, (bool, np.bool_)):
        return ("b", bool(v))
    if isinstance(v, (float, np.floating)):
        if math.isnan(v):
            return None
        return ("f", float(v) + 0.0)  # collapse -0.0 only
    if isinstance(v, (int, np.integer)):
        return ("i", int(v))
    if isinstance(v, Decimal):
        return ("d", str(v.normalize()))
    if isinstance(v, date) and not isinstance(v, datetime):
        return ("t", pd.Timestamp(v).isoformat())
    if isinstance(v, pd.Timestamp) or isinstance(v, datetime):
        ts = pd.Timestamp(v)
        if ts.tzinfo is not None:
            ts = ts.tz_convert("UTC").tz_localize(None)
        return ("t", ts.isoformat())
    return v


def normalize(df: pd.DataFrame) -> list[tuple]:
    cols = sorted(df.columns)
    out = df[cols].copy()
    rows = [tuple(_norm_cell(v) for v in row) for row in out.itertuples(index=False)]
    return sorted(rows, key=lambda r: tuple((x is None, str(x)) for x in r))


def compare(spark_df, oracle_pdf: pd.DataFrame) -> tuple[bool, str]:
    spdf = spark_df.toPandas()
    if sorted(spdf.columns) != sorted(oracle_pdf.columns):
        return False, f"schema mismatch: spark={sorted(spdf.columns)} oracle={sorted(oracle_pdf.columns)}"
    if len(spdf) != len(oracle_pdf):
        return False, f"row count mismatch: spark={len(spdf)} oracle={len(oracle_pdf)}"
    a, b = normalize(spdf), normalize(oracle_pdf)
    for i, (ra, rb) in enumerate(zip(a, b)):
        if ra != rb:
            return False, f"value mismatch at sorted row {i}: spark={ra} oracle={rb}"
    return True, "ok"

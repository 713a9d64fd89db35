#!/usr/bin/env python
"""Clean-process oracle parity check for a named list of queries.

Runs each query against the DuckDB oracle with the SAME dtype-faithful
comparison the in-repo pytest parity uses (tests/oracle_harness), at
one or more scale-factor dirs. Exit 0 only when every (query, sf) pair
matches. The optimization rounds use this to prove restructured
queries still hash green before committing (round rules: "prove
equivalence with the oracle before moving on").

Usage:
    python tools/parity_check.py q1 q2 ...
    python tools/parity_check.py --sf-dirs /root/testdata/sf0.01,/root/testdata/sf0.1 q1
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("queries", nargs="+")
    ap.add_argument(
        "--sf-dirs",
        default="/root/testdata/sf0.01,/root/testdata/sf0.1",
        help="comma-separated fixture dirs",
    )
    args = ap.parse_args()

    from insurance_helper_spark.queries import catalog
    from insurance_helper_spark.session import get_spark
    from tests.oracle_harness import compare, run_oracle

    catalog.load_all()
    spark = get_spark(app_name="parity_check")
    spark.sparkContext.setLogLevel("ERROR")

    results: dict[str, dict[str, str]] = {}
    ok_all = True
    for sf_dir in args.sf_dirs.split(","):
        for name in args.queries:
            if name not in catalog.QUERIES:
                results.setdefault(name, {})[sf_dir] = "UNKNOWN QUERY"
                ok_all = False
                continue
            if name not in catalog.ORACLE_SQL:
                n = catalog.QUERIES[name](spark, sf_dir).count()
                results.setdefault(name, {})[sf_dir] = f"rows-only ({n} rows)"
                continue
            try:
                spark_df = catalog.QUERIES[name](spark, sf_dir)
                oracle_pdf = run_oracle(catalog.ORACLE_SQL[name], sf_dir)
                ok, msg = compare(spark_df, oracle_pdf)
            except Exception as exc:  # noqa: BLE001 - report, don't crash the sweep
                ok, msg = False, f"EXCEPTION: {exc}"
            results.setdefault(name, {})[sf_dir] = "OK" if ok else f"FAIL: {msg}"
            ok_all &= ok
            print(f"  [{sf_dir.rsplit('/', 1)[-1]}] {name}: "
                  f"{'OK' if ok else msg}", file=sys.stderr)
    print(json.dumps(results))
    return 0 if ok_all else 1


if __name__ == "__main__":
    sys.exit(main())

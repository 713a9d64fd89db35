#!/usr/bin/env python
"""Capture ``explain('formatted')`` for named queries — no timing.

    python tools/plan_capture.py --tag before q1 q2 ...

Writes plans/$SPARK_GRAFT_PLANS/<query>_<tag>.txt (default plans/r15).
Separate from opt_probe so a plan snapshot can be taken while a bench
run owns the machine (plan construction is driver-side work).
"""

from __future__ import annotations

import argparse
import io
import os
import sys
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("queries", nargs="+")
    ap.add_argument("--tag", required=True)
    ap.add_argument("--sf-dir", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    args = ap.parse_args()

    from insurance_helper_spark.queries import catalog
    from insurance_helper_spark.session import get_spark

    catalog.load_all()
    spark = get_spark(app_name="plan_capture")
    spark.sparkContext.setLogLevel("ERROR")

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    plans_dir = os.path.join(repo, "plans", os.environ.get("SPARK_GRAFT_PLANS", "r15"))
    os.makedirs(plans_dir, exist_ok=True)
    for name in args.queries:
        df = catalog.QUERIES[name](spark, args.sf_dir)
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        path = os.path.join(plans_dir, f"{name}_{args.tag}.txt")
        with open(path, "w") as fh:
            fh.write(buf.getvalue())
        print(f"  wrote {path}", file=sys.stderr)


if __name__ == "__main__":
    main()

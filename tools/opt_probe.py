#!/usr/bin/env python
"""Per-query optimization probe (r14): isolated timing + plan capture.

For each named query: run once cold + N warm with the noop sink
(guide §1.4 — times the computation, not the sink), record the warm
minimum, and write ``df.explain('formatted')`` to
``plans/r14/<query>_<tag>.txt`` so plan claims are checkable without
running Spark.

Usage:
    python tools/opt_probe.py --tag before q1 q2 ...
    python tools/opt_probe.py --tag after --warm 3 q1

Timings print as one JSON line on stdout; the bench contract
(bench.py) is untouched — this is a side instrument for the
optimization round only.
"""

from __future__ import annotations

import argparse
import io
import json
import os
import sys
import time
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("queries", nargs="+")
    ap.add_argument("--tag", default=None, help="plans/r14/<q>_<tag>.txt; omit to skip plan capture")
    ap.add_argument("--warm", type=int, default=2)
    ap.add_argument("--sf-dir", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    args = ap.parse_args()

    from insurance_helper_spark.session import get_spark
    from insurance_helper_spark.queries import catalog

    catalog.load_all()
    spark = get_spark(app_name="opt_probe")
    spark.sparkContext.setLogLevel("ERROR")
    spark.read.parquet(f"{args.sf_dir}/region.parquet").count()

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    plans_dir = os.path.join(repo, "plans", os.environ.get("SPARK_GRAFT_PLANS", "r15"))
    if args.tag:
        os.makedirs(plans_dir, exist_ok=True)

    from bench import _release_blocks

    out: dict[str, dict] = {}
    for name in args.queries:
        fn = catalog.QUERIES[name]
        if args.tag:
            df = fn(spark, args.sf_dir)
            buf = io.StringIO()
            with redirect_stdout(buf):
                df.explain("formatted")
            with open(os.path.join(plans_dir, f"{name}_{args.tag}.txt"), "w") as fh:
                fh.write(buf.getvalue())
            _release_blocks(spark)
        times = []
        for i in range(args.warm + 1):
            spark.sparkContext.setJobDescription(f"opt_probe:{name}:{i}")
            t0 = time.perf_counter()
            fn(spark, args.sf_dir).write.format("noop").mode("overwrite").save()
            times.append(round(time.perf_counter() - t0, 3))
            _release_blocks(spark)
        spark.sparkContext.setJobDescription(None)
        out[name] = {"cold": times[0], "warm_min": min(times[1:]), "runs": times}
        print(f"  {name}: cold={times[0]} warm_min={min(times[1:])} {times}", file=sys.stderr)
    print(json.dumps(out))


if __name__ == "__main__":
    main()

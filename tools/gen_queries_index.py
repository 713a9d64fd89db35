#!/usr/bin/env python
"""Generate QUERIES.md: the query-catalog index in driver verification
order (register order after the green-set rotation). Run:
python tools/gen_queries_index.py"""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")

HEADER = """# Query catalog index

Generated from `insurance_helper_spark.queries.catalog` (register order =
driver verification order; the driver checks the first 50 per round).
Check: oracle = full DuckDB value-hash parity; rows-only = driver row-count
check (engine-specific hashing / plan-specific bucketing, per contract).

| # | Query | Module | Check | Summary |
|---|---|---|---|---|
"""


def main() -> None:
    from insurance_helper_spark.queries import catalog

    catalog.load_all()
    rows = []
    for i, (name, fn) in enumerate(catalog.QUERIES.items()):
        mod = fn.__module__.rsplit(".", 1)[-1]
        check = "oracle" if name in catalog.ORACLE_SQL else "rows-only"
        doc = (fn.__doc__ or "").strip().splitlines()
        summary = doc[0][:64] if doc else ""
        rows.append(f"| {i} | `{name}` | {mod} | {check} | {summary} |")
    with open("/root/repo/QUERIES.md", "w") as f:
        f.write(HEADER + "\n".join(rows) + "\n")
    print(f"wrote QUERIES.md ({len(rows)} queries, {len(catalog.ORACLE_SQL)} oracle)")


if __name__ == "__main__":
    main()

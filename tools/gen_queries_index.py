#!/usr/bin/env python
"""Generate QUERIES.md: the query-catalog index in driver verification
order (register order after the green-set rotation). Run:
python tools/gen_queries_index.py"""

from __future__ import annotations

import inspect
import re
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

_MODULE_LINES: dict[str, list[str]] = {}


def _module_lines(fn) -> list[str]:
    mod = fn.__module__
    if mod not in _MODULE_LINES:
        try:
            _MODULE_LINES[mod] = inspect.getsource(sys.modules[mod]).splitlines()
        except Exception:
            _MODULE_LINES[mod] = []
    return _MODULE_LINES[mod]


def _first_sentence(text: str, limit: int = 110) -> str:
    text = re.sub(r"\s+", " ", text).strip()
    # Sentence boundary: a period followed by whitespace, skipping
    # common abbreviations (et al. / e.g. / vs. / single initials).
    for m in re.finditer(r"\.\s", text):
        prev = text[: m.start()].rsplit(" ", 1)[-1].lower()
        if prev in {"al", "et", "e.g", "i.e", "vs", "cf", "resp", "approx"} or (
            len(prev) == 1 and prev.isalpha()
        ):
            continue
        text = text[: m.start() + 1]
        break
    if len(text) > limit:
        text = text[: limit - 1].rstrip() + "…"
    return text.replace("|", "\\|")


def _comment_block_summary(fn, name: str) -> str:
    """The first sentence of the `# ---` comment banner that documents
    most catalog entries above their oracle SQL — found by scanning
    upward from this registration's decorator line."""
    lines = _module_lines(fn)
    deco = re.compile(r"@register\(\s*[\"']" + re.escape(name) + r"[\"']")
    idx = next((i for i, l in enumerate(lines) if deco.search(l)), None)
    if idx is None:
        return ""
    block: list[str] = []
    in_sql = False
    for i in range(idx - 1, max(idx - 120, -1), -1):
        line = lines[i].rstrip()
        if not in_sql and line.startswith("#"):
            block.append(line.lstrip("# ").rstrip())
            continue
        if block:
            break
        # Skip the oracle SQL literal (and its assignment) between the
        # banner and the decorator: triple-quoted block ends above.
        if line.endswith('"""') and not in_sql:
            in_sql = True
        elif in_sql and re.match(r"\w+\s*=\s*f?\"\"\"", line):
            in_sql = False
        elif not in_sql and line and not re.match(r"\w+\s*=", line) and line != ")":
            break
    if not block:
        return ""
    text = " ".join(reversed(block))
    text = re.sub(r"^-{3,}\s*", "", text).strip()
    text = re.sub(r"-{5,}", " ", text)
    # Drop a leading "query_name — " echo of the entry itself.
    text = re.sub(r"^[\w.]+\s+—\s+", "", text)
    return _first_sentence(text)


def main() -> None:
    from insurance_helper_spark.queries import catalog

    catalog.load_all()
    rows = []
    blank = 0
    for i, (name, fn) in enumerate(catalog.QUERIES.items()):
        mod = fn.__module__.rsplit(".", 1)[-1]
        check = "oracle" if name in catalog.ORACLE_SQL else "rows-only"
        doc = (fn.__doc__ or "").strip()
        summary = _first_sentence(doc) if doc else _comment_block_summary(fn, name)
        if not summary:
            blank += 1
        rows.append(f"| {i} | `{name}` | {mod} | {check} | {summary} |")
    with open("/root/repo/QUERIES.md", "w") as f:
        f.write(HEADER + "\n".join(rows) + "\n")
    print(
        f"wrote QUERIES.md ({len(rows)} queries, {len(catalog.ORACLE_SQL)} oracle,"
        f" {blank} blank summaries)"
    )


if __name__ == "__main__":
    main()

"""Physical-plan audit helpers.

The 100 TB design rules ("broadcast the dim", "push filters to the
scan", "stay inside whole-stage codegen", "don't shuffle twice") are
only real if the EXECUTED plan shows them. These helpers turn
`.explain()` eyeballing into assertions that tests can pin, so a
regression that silently de-broadcasts a join or un-pushes a filter
fails CI instead of doubling the shuffle at scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def executed_plan(df: DataFrame) -> str:
    """Final (post-AQE-planning) physical plan as text."""
    return df._jdf.queryExecution().executedPlan().toString()


def optimized_plan(df: DataFrame) -> str:
    return df._jdf.queryExecution().optimizedPlan().toString()


def final_plan(df: DataFrame) -> str:
    """Execute the query, then return the AQE-final physical plan (the
    one with WholeStageCodegen `*(n)` markers and runtime join
    decisions). Use on small inputs only — it collects."""
    df.collect()
    return df._jdf.queryExecution().executedPlan().toString()


def codegen_stage_count(df: DataFrame) -> int:
    """Number of whole-stage-codegen stages in the final plan (counted
    via the `*(n)` markers; requires execution for AQE plans)."""
    plan = final_plan(df)
    import re

    return len(set(re.findall(r"\*\((\d+)\)", plan)))


def count_in_plan(df: DataFrame, needle: str) -> int:
    return executed_plan(df).count(needle)


def has_broadcast_join(df: DataFrame) -> bool:
    return "BroadcastHashJoin" in executed_plan(df) or "BroadcastNestedLoopJoin" in executed_plan(df)


def exchange_count(df: DataFrame) -> int:
    """Number of shuffle exchanges (excludes broadcast exchanges and
    AQE-reused ones)."""
    plan = executed_plan(df)
    return sum(
        line.lstrip(" +-:*()0123456789").startswith("Exchange")
        for line in plan.splitlines()
    )


def pushed_filters(df: DataFrame) -> str:
    """The PushedFilters: [...] section of the scan node ('' if none)."""
    plan = executed_plan(df)
    for line in plan.splitlines():
        if "PushedFilters" in line:
            start = line.index("PushedFilters")
            return line[start:].split("]", 1)[0] + "]"
    return ""


def read_schema_columns(df: DataFrame) -> list[str]:
    """Column names in the parquet scan's ReadSchema (the pruning
    witness: a 2-column projection must not read 16 columns)."""
    plan = executed_plan(df)
    cols: list[str] = []
    for line in plan.splitlines():
        if "ReadSchema" in line:
            spec = line.split("ReadSchema:", 1)[1]
            inner = spec.split("<", 1)[1].rsplit(">", 1)[0]
            depth = 0
            field = ""
            for ch in inner:
                if ch == "<":
                    depth += 1
                elif ch == ">":
                    depth -= 1
                if ch == "," and depth == 0:
                    cols.append(field.split(":", 1)[0].strip())
                    field = ""
                else:
                    field += ch
            if field.strip():
                cols.append(field.split(":", 1)[0].strip())
    return cols

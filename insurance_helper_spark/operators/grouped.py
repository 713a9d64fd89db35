"""Grouped vectorized computation: the split-apply-combine shape where
each group needs a numpy-level algorithm (model fit, decomposition)
that no built-in aggregate expresses.

``applyInPandas`` is the right tool exactly here — and ONLY here: the
per-group function is real linear algebra, Arrow moves each group as
one batch, and the output is one small row per group. (Scalar
arithmetic stays in column expressions everywhere else in this repo;
see functions/.)

Scale: groups are processed independently after one shuffle on the
group key; a group must fit in one task's memory (the standard
applyInPandas contract — salt or sample pathological groups upstream).
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def grouped_linear_fit(
    df: DataFrame, group_col: str, x_col: str, y_col: str
) -> DataFrame:
    """Per-group least-squares fit y = a·x + b.

    Returns (group, slope, intercept, r2, n) — one row per group.
    Degenerate groups (n < 2 or zero x-variance) yield NULL
    slope/intercept rather than raising, matching the engine's
    error-row convention.
    """
    import numpy as np
    import pandas as pd

    schema = (
        f"{group_col} string, slope double, intercept double, "
        "r2 double, n long"
    )

    def fit(pdf: pd.DataFrame) -> pd.DataFrame:
        g = pdf[group_col].iloc[0]
        x = pdf[x_col].to_numpy(dtype=np.float64)
        y = pdf[y_col].to_numpy(dtype=np.float64)
        n = len(pdf)
        if n < 2 or np.var(x) == 0.0:
            return pd.DataFrame(
                [{group_col: g, "slope": None, "intercept": None, "r2": None, "n": n}]
            )
        a, b = np.polyfit(x, y, 1)
        pred = a * x + b
        ss_res = float(((y - pred) ** 2).sum())
        ss_tot = float(((y - y.mean()) ** 2).sum())
        r2 = 1.0 - ss_res / ss_tot if ss_tot > 0 else None
        return pd.DataFrame(
            [{group_col: g, "slope": float(a), "intercept": float(b), "r2": r2, "n": n}]
        )

    return df.select(group_col, x_col, y_col).groupBy(group_col).applyInPandas(fit, schema)

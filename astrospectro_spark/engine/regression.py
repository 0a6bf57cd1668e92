"""Global model-fit operators: the two-pass fit-then-broadcast pattern.

Graft analogues of the reference's population polynomial fit
(``np.polyfit(bp_rp0, M_G, 3)`` over quality-filtered rows, then
per-row residual ``delta_ms`` — reference:
src/pipeline/feature_engineering.py:1715-1752) and the sigma-clipped
band-slope fit (iterative sigma=2.5 clip then linear polyfit —
src/pipeline/feature_engineering.py:700-721).

Scale shape: pass 1 reduces the table to k+1 moment sums (one
distributed agg, constant-size result); the (k+1)x(k+1) normal-equation
solve happens on the driver (constant work); pass 2 broadcasts the
coefficients into a per-row expression. Nothing materialises rows on
the driver beyond one aggregate row — valid at any input size.
"""

from __future__ import annotations

import numpy as np

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def fit_poly(df: DataFrame, x: str | Column, y: str | Column, deg: int = 3,
             min_rows: int = 1) -> np.ndarray | None:
    """Least-squares polynomial fit via normal equations on moment sums.

    Returns coefficients [c0..c_deg] (c0 = intercept) or None when the
    filtered input has fewer than ``min_rows`` rows (the reference
    requires >= 200 rows, feature_engineering.py:1726).
    """
    xc = F.col(x) if isinstance(x, str) else x
    yc = F.col(y) if isinstance(y, str) else y
    ok = df.filter(xc.isNotNull() & yc.isNotNull())
    aggs = [F.count(F.lit(1)).alias("n")]
    for p in range(1, 2 * deg + 1):
        aggs.append(F.sum(xc ** p).alias(f"sx{p}"))
    for p in range(0, deg + 1):
        aggs.append(F.sum(yc * xc ** p).alias(f"sxy{p}"))
    row = ok.agg(*aggs).collect()[0]
    n = row["n"]
    if n < max(min_rows, deg + 1):
        return None
    sx = [float(n)] + [float(row[f"sx{p}"]) for p in range(1, 2 * deg + 1)]
    a = np.array([[sx[i + j] for j in range(deg + 1)] for i in range(deg + 1)])
    b = np.array([float(row[f"sxy{p}"]) for p in range(deg + 1)])
    return np.linalg.solve(a, b)


def poly_expr(coeffs: np.ndarray, x: str | Column) -> Column:
    """Horner-evaluated polynomial as a column expression."""
    xc = F.col(x) if isinstance(x, str) else x
    e: Column = F.lit(float(coeffs[-1]))
    for c in reversed(coeffs[:-1]):
        e = e * xc + F.lit(float(c))
    return e


def with_poly_residuals(
    df: DataFrame,
    x: str,
    y: str,
    deg: int = 3,
    out_col: str = "residual",
    min_rows: int = 1,
) -> DataFrame:
    """Two-pass: fit globally, then per-row residual y - poly(x).
    NULL residuals when the fit could not run (too few rows)."""
    coeffs = fit_poly(df, x, y, deg, min_rows)
    if coeffs is None:
        return df.withColumn(out_col, F.lit(None).cast("double"))
    return df.withColumn(out_col, F.col(y) - poly_expr(coeffs, x))


def sigma_clip_slope(
    df: DataFrame,
    x: str,
    y: str,
    group_col: str | None = None,
    sigma: float = 2.5,
    n_iter: int = 3,
) -> DataFrame:
    """Fixed-iteration sigma-clipped linear slope per group.

    Each iteration: fit slope/intercept per group with covar_pop /
    var_pop aggregates (one shuffle), then drop rows whose residual
    exceeds sigma * stddev(residual). Expression-only — the reference's
    while-loop becomes a bounded unrolled plan (the iterative version
    belongs in a grouped pandas kernel; this is the Catalyst-friendly
    fixed-point form).
    """
    keys = [group_col] if group_col else []
    cur = df
    fit = None
    for _ in range(n_iter):
        fit = cur.groupBy(*keys).agg(
            (F.covar_pop(x, y) / F.var_pop(x)).alias("_slope"),
            (F.avg(y) - F.covar_pop(x, y) / F.var_pop(x) * F.avg(x)).alias("_icept"),
        )
        joined = cur.join(F.broadcast(fit), keys) if keys else cur.crossJoin(F.broadcast(fit))
        resid = F.col(y) - (F.col("_slope") * F.col(x) + F.col("_icept"))
        stats = joined.withColumn("_r", resid)
        bound = stats.groupBy(*keys).agg(F.stddev_pop("_r").alias("_s"))
        stats = stats.join(F.broadcast(bound), keys) if keys else stats.crossJoin(F.broadcast(bound))
        cur = stats.filter(
            (F.col("_s") == 0) | (F.abs(F.col("_r")) <= sigma * F.col("_s"))
        ).select(df.columns)
    out = fit.select(*keys, F.col("_slope").alias("slope"), F.col("_icept").alias("intercept"))
    return out

"""Distribution-stabilising transforms (SURVEY §2.4 A4 — the
reference's stabilize_spectral_features winsorisation,
src/pipeline/feature_engineering.py:1760-1793).

Two quantile paths:

- ``exact=True`` — ``percentile``: an all-values-in-one-aggregator
  operation. Bit-reproducible (it is what the DuckDB-oracle query
  uses), but a scale-killer at 100 TB: every value of the column flows
  into a single aggregation buffer. Keep for small fixtures and
  cross-engine verification only.
- ``exact=False`` (production default) — ``approx_percentile`` with a
  KLL/GK-style bounded sketch: constant memory per partition, one
  normal aggregate, mergeable partials. Rank error is bounded by
  ``1/accuracy``; tests assert the approx bounds land within the
  quantile neighbourhood of the exact ones.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def quantile_bounds(
    df: DataFrame,
    col: str,
    lo: float = 0.005,
    hi: float = 0.995,
    exact: bool = False,
    accuracy: int = 10_000,
) -> DataFrame:
    """One-row DataFrame (lo, hi) of the column's quantile bounds."""
    if exact:
        return df.agg(
            F.expr(f"percentile({col}, {lo})").alias("lo"),
            F.expr(f"percentile({col}, {hi})").alias("hi"),
        )
    return df.agg(
        F.expr(f"approx_percentile({col}, {lo}, {accuracy})").alias("lo"),
        F.expr(f"approx_percentile({col}, {hi}, {accuracy})").alias("hi"),
    )


def winsorize(
    df: DataFrame,
    col: str,
    lo: float = 0.005,
    hi: float = 0.995,
    exact: bool = False,
    accuracy: int = 10_000,
    out_col: str | None = None,
) -> DataFrame:
    """Clip ``col`` to its [lo, hi] quantile range (two-pass: bounded
    quantile aggregate, then a broadcast of the 1-row bounds into a
    per-row clip expression — no row ever leaves the executors)."""
    q = quantile_bounds(df, col, lo, hi, exact=exact, accuracy=accuracy)
    clipped: Column = F.least(F.greatest(F.col(col), F.col("lo")), F.col("hi"))
    out = out_col or f"{col}_winsor"
    return (
        df.crossJoin(F.broadcast(q)).withColumn(out, clipped).drop("lo", "hi")
    )

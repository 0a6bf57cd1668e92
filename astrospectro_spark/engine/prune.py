"""Column pruning passes: drop all-NULL and constant columns.

Graft analogues of the reference's dynamic pruning — all-NaN column
drop (src/pipeline/processing.py:535-537) and nunique<=1 constant drop
(src/pipeline/classifier.py:998-1003) — done in ONE stats pass over the
table instead of per-column loops: a single agg computes
``count(col)`` and ``approx_count_distinct(col)`` for every candidate
column simultaneously.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def prune_report(df: DataFrame, columns: list[str] | None = None) -> dict[str, dict]:
    cols = columns or df.columns
    aggs = []
    for c in cols:
        aggs.append(F.count(F.col(c)).alias(f"__n_{c}"))
        aggs.append(F.approx_count_distinct(F.col(c)).alias(f"__d_{c}"))
    row = df.agg(*aggs).collect()[0]
    return {
        c: {"non_null": row[f"__n_{c}"], "approx_distinct": row[f"__d_{c}"]}
        for c in cols
    }


def prune_columns(
    df: DataFrame,
    drop_all_null: bool = True,
    drop_constant: bool = True,
    keep: tuple[str, ...] = (),
) -> tuple[DataFrame, list[str]]:
    """Returns (pruned df, dropped column names)."""
    rep = prune_report(df)
    dropped = []
    for c, st in rep.items():
        if c in keep:
            continue
        if drop_all_null and st["non_null"] == 0:
            dropped.append(c)
        elif drop_constant and st["non_null"] > 0 and st["approx_distinct"] <= 1:
            dropped.append(c)
    return df.drop(*dropped), dropped

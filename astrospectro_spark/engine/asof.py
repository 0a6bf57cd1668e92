"""Point-in-time / as-of join — the engine's tolerance-nearest join.

Graft analogue of the reference's Gaia nearest-neighbour cross-match
(match within radius, keep best match per entity — reference:
src/tools/gaia_crossmatcher.py:712-744) and the line↔peak tolerance
association (reference: src/pipeline/peak_detector.py:137-181).

Two implementations, same semantics:

1. :func:`asof_join` — the scale path. A sorted-merge as-of expressed
   as pure DataFrame ops: union turns+anchors, ONE hash exchange on
   conv_id, one sort on (ts, is_anchor, turn_idx), a running
   ``last(struct, ignorenulls)`` carry, filter back to anchor rows.
   Zero Python in the plan; whole-stage codegen end to end; cost is
   one shuffle of (turns+anchors) — at 100 TB this beats any
   range-join (no row explosion) and any grouped UDF (no Arrow hop).

2. :func:`asof_join_grouped` — the ``pd.merge_asof`` path the
   north_star names: ``cogroup(...).applyInPandas``. Kept as the
   reference semantics cross-check and for per-group kernels that
   genuinely need pandas.

Semantics: for each anchor, the LATEST turn with ``ts <= anchor_ts``
(boundary inclusive), ties broken by largest ``turn_idx``; optional
per-row tolerance nulls out matches older than ``anchor_ts -
tolerance_s`` (≙ ±window Å, reference: src/pipeline/peak_detector.py:74-89).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

DEFAULT_VALUE_COLS = ["turn_idx", "role", "text", "tool", "ts"]


def asof_join(
    turns: DataFrame,
    anchors: DataFrame,
    entity_col: str = "conv_id",
    turn_ts: str = "ts",
    anchor_ts: str = "anchor_ts",
    value_cols: list[str] | None = None,
    tolerance_col: str | None = None,
    tiebreak_col: str = "turn_idx",
) -> DataFrame:
    """Sorted-merge as-of join as a single window plan (no UDF).

    Plan shape: unionByName → Exchange hashpartitioning(conv_id) →
    Sort(ts, _is_anchor, turn_idx) → Window(last carry) → Filter.
    ``_is_anchor`` sorts anchors AFTER turns with equal ts, which makes
    the boundary ``ts == anchor_ts`` inclusive by construction.
    """
    value_cols = value_cols or DEFAULT_VALUE_COLS
    anchor_payload = [c for c in anchors.columns if c != entity_col]

    t = turns.select(
        F.col(entity_col),
        F.col(turn_ts).alias("_ts"),
        F.lit(0).alias("_is_anchor"),
        F.col(tiebreak_col).cast("long").alias("_tie"),
        F.struct(*[F.col(c).alias(f"asof_{c}") for c in value_cols]).alias("_carry"),
    )
    a = anchors.select(
        F.col(entity_col),
        F.col(anchor_ts).alias("_ts"),
        F.lit(1).alias("_is_anchor"),
        F.lit(None).cast("long").alias("_tie"),
        F.lit(None)
        .cast(t.schema["_carry"].dataType)
        .alias("_carry"),
        *[F.col(c) for c in anchor_payload],
    )
    u = t.unionByName(a, allowMissingColumns=True)

    w = (
        Window.partitionBy(entity_col)
        .orderBy(F.col("_ts").asc(), F.col("_is_anchor").asc(), F.col("_tie").asc_nulls_last())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    u = u.withColumn("_asof", F.last("_carry", ignorenulls=True).over(w))
    out = u.filter(F.col("_is_anchor") == 1).select(
        F.col(entity_col),
        *[F.col(c) for c in anchor_payload],
        *[F.col("_asof").getField(f"asof_{c}").alias(f"asof_{c}") for c in value_cols],
    )
    if tolerance_col:
        too_old = (
            F.unix_micros(F.col(anchor_ts).cast("timestamp"))
            - F.unix_micros(F.col("asof_ts").cast("timestamp"))
        ) > F.col(tolerance_col).cast("long") * 1_000_000
        for c in value_cols:
            out = out.withColumn(
                f"asof_{c}",
                F.when(too_old, F.lit(None)).otherwise(F.col(f"asof_{c}")),
            )
    return out


def asof_join_grouped(
    turns: DataFrame,
    anchors: DataFrame,
    entity_col: str = "conv_id",
    value_cols: list[str] | None = None,
    tolerance_col: str | None = None,
) -> DataFrame:
    """As-of via ``cogroup(...).applyInPandas(pd.merge_asof)``.

    The repartition-by-entity + secondary-sort + Arrow-UDF pattern the
    north_star names; one shuffle per side, pandas kernel per
    conversation. Anchors on conv_ids absent from ``turns`` still
    produce a row (NULL asof_*) — cogroup delivers the left-empty group.
    """
    import pandas as pd  # noqa: F401  (imported on executors)

    from astrospectro_spark.oracle.pandas_oracle import oracle_asof

    value_cols = value_cols or DEFAULT_VALUE_COLS
    anchor_payload = [c for c in anchors.columns if c != entity_col]

    type_map = dict(turns.dtypes)
    a_types = dict(anchors.dtypes)
    out_fields = (
        [f"{entity_col} {type_map[entity_col]}"]
        + [f"{c} {a_types[c]}" for c in anchor_payload]
        + [f"asof_{c} {type_map[c]}" for c in value_cols]
    )
    schema = ", ".join(out_fields)

    int_like = {
        c
        for c in value_cols
        if type_map[c] in ("tinyint", "smallint", "int", "bigint", "long")
    }

    def fn(t_pdf, a_pdf):
        import pandas as _pd

        cols = [entity_col] + anchor_payload + [f"asof_{c}" for c in value_cols]
        if len(a_pdf) == 0:
            return _pd.DataFrame(columns=cols)
        if len(t_pdf) == 0:
            out = a_pdf.copy()
            for c in value_cols:
                out[f"asof_{c}"] = None
            return out[cols]
        m = oracle_asof(
            t_pdf, a_pdf, value_cols=value_cols, tolerance_col=tolerance_col
        )
        # merge_asof promotes int columns with unmatched rows to float64
        # (NaN) — convert to nullable Int64 so Arrow can emit int + NULL.
        for c in int_like:
            m[f"asof_{c}"] = m[f"asof_{c}"].astype("Int64")
        return m[cols]

    return (
        turns.groupby(entity_col)
        .cogroup(anchors.groupby(entity_col))
        .applyInPandas(fn, schema=schema)
    )

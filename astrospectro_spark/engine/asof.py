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
        out = _null_when_too_old(out, anchor_ts, tolerance_col, value_cols)
    return out


def _null_when_too_old(out, anchor_ts, tolerance_col, value_cols):
    """Null every asof_* column when the match is older than the
    tolerance. Evaluated into a temp column FIRST: nulling in a loop
    while the predicate still reads asof_ts would corrupt later columns
    whenever 'ts' is not last in value_cols."""
    too_old = (
        F.unix_micros(F.col(anchor_ts).cast("timestamp"))
        - F.unix_micros(F.col("asof_ts").cast("timestamp"))
    ) > F.col(tolerance_col).cast("long") * 1_000_000
    out = out.withColumn("_too_old", too_old)
    for c in value_cols:
        out = out.withColumn(
            f"asof_{c}",
            F.when(F.col("_too_old"), F.lit(None)).otherwise(F.col(f"asof_{c}")),
        )
    return out.drop("_too_old")


def asof_join_salted(
    turns: DataFrame,
    anchors: DataFrame,
    entity_col: str = "conv_id",
    turn_ts: str = "ts",
    anchor_ts: str = "anchor_ts",
    value_cols: list[str] | None = None,
    tolerance_col: str | None = None,
    tiebreak_col: str = "turn_idx",
    hot_threshold: int = 2_000_000,
    chunk_target_rows: int = 500_000,
) -> DataFrame:
    """:func:`asof_join` semantics with mega-conversation salting.

    A hot conversation otherwise sorts in ONE window task. Here hot
    conversations are ts-range chunked (same boundaries for turns and
    anchors), and each chunk is SEEDED with one synthetic context row:
    the latest turn from all earlier chunks (a per-chunk summary +
    exclusive running-last over the tiny summary table). Within a
    chunk the ordinary carry then sees the true predecessor of its
    first anchor, so results are identical to the unsalted join —
    asserted in tests — while the hot conversation runs as k tasks.
    """
    from astrospectro_spark.engine.skew import chunk_of, compute_ts_bounds

    value_cols = value_cols or DEFAULT_VALUE_COLS
    census = turns.groupBy(entity_col).agg(F.count(F.lit(1)).alias("_n"))
    hot_ids = census.filter(F.col("_n") > hot_threshold).select(entity_col)

    cold_out = asof_join(
        turns.join(F.broadcast(hot_ids), entity_col, "left_anti"),
        anchors.join(F.broadcast(hot_ids), entity_col, "left_anti"),
        entity_col, turn_ts, anchor_ts, value_cols, tolerance_col, tiebreak_col,
    )

    t_hot = turns.join(F.broadcast(hot_ids), entity_col, "left_semi")
    a_hot = anchors.join(F.broadcast(hot_ids), entity_col, "left_semi")
    bounds = compute_ts_bounds(
        t_hot, chunk_target_rows, ts_col=turn_ts, entity_col=entity_col
    )
    t = t_hot.join(F.broadcast(bounds), entity_col).withColumn(
        "_tgt", chunk_of(turn_ts)
    )
    a = (
        a_hot.withColumn(turn_ts, F.col(anchor_ts))
        .join(F.broadcast(bounds), entity_col)
        .withColumn("_tgt", chunk_of(turn_ts))
        .drop(turn_ts)
    )

    # per-chunk latest turn → exclusive running-last → one seed row per
    # later chunk (the "state handoff" between chunks)
    turn_struct = F.struct(
        F.col(turn_ts).alias("_sts"),
        F.col(tiebreak_col).cast("long").alias("_stie"),
        *[F.col(c).alias(f"v_{c}") for c in value_cols],
    )
    summ = t.groupBy(entity_col, "_tgt").agg(
        F.max_by(turn_struct, F.struct(F.col(turn_ts), F.col(tiebreak_col))).alias("_last")
    )
    # every chunk id that holds anchors or turns, each joined with the
    # latest turn of any EARLIER chunk (anchor-only chunks contribute a
    # null _last and inherit the running carry)
    all_chunks = (
        a.select(entity_col, "_tgt")
        .unionByName(summ.select(entity_col, "_tgt"))
        .distinct()
        .join(summ, [entity_col, "_tgt"], "left")
    )
    wprev = (
        Window.partitionBy(entity_col)
        .orderBy("_tgt")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    carry = all_chunks.withColumn("_seed", F.last("_last", ignorenulls=True).over(wprev))
    seeds = carry.filter(F.col("_seed").isNotNull()).select(
        F.col(entity_col),
        F.col("_tgt"),
        F.col("_seed").getField("_sts").alias(turn_ts),
        F.col("_seed").getField("_stie").cast("int").alias(tiebreak_col),
        *[
            F.col("_seed").getField(f"v_{c}").alias(c)
            for c in value_cols
            if c not in (turn_ts, tiebreak_col)
        ],
    )
    t_all = t.drop("_bounds").unionByName(seeds, allowMissingColumns=True)

    # within-chunk sorted-merge carry (same construction as asof_join,
    # but partitioned by (entity, _tgt))
    anchor_payload = [c for c in a.columns if c not in (entity_col, "_tgt", "_bounds")]
    tt = t_all.select(
        F.col(entity_col),
        F.col("_tgt"),
        F.col(turn_ts).alias("_ts"),
        F.lit(0).alias("_is_anchor"),
        F.col(tiebreak_col).cast("long").alias("_tie"),
        F.struct(*[F.col(c).alias(f"asof_{c}") for c in value_cols]).alias("_carry"),
    )
    aa = a.select(
        F.col(entity_col),
        F.col("_tgt"),
        F.col(anchor_ts).alias("_ts"),
        F.lit(1).alias("_is_anchor"),
        F.lit(None).cast("long").alias("_tie"),
        F.lit(None).cast(tt.schema["_carry"].dataType).alias("_carry"),
        *[F.col(c) for c in anchor_payload],
    )
    u = tt.unionByName(aa, allowMissingColumns=True)
    w = (
        Window.partitionBy(entity_col, "_tgt")
        .orderBy(F.col("_ts").asc(), F.col("_is_anchor").asc(), F.col("_tie").asc_nulls_last())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    u = u.withColumn("_asof", F.last("_carry", ignorenulls=True).over(w))
    hot_out = u.filter(F.col("_is_anchor") == 1).select(
        F.col(entity_col),
        *[F.col(c) for c in anchor_payload],
        *[F.col("_asof").getField(f"asof_{c}").alias(f"asof_{c}") for c in value_cols],
    )
    if tolerance_col:
        hot_out = _null_when_too_old(hot_out, anchor_ts, tolerance_col, value_cols)
    return cold_out.unionByName(hot_out.select(cold_out.columns))


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

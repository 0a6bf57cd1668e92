"""Reference-event association: the line↔peak tolerance join analog.

The reference associates each of 6 known spectral lines with the most
prominent detected peak inside a ±window (reference:
src/pipeline/peak_detector.py:137-181, line table :79-89). The graft:
associate each ref_event (a small broadcast dimension of
(event_name, role, tool) patterns) with the most "prominent" matching
turn per (conversation, session) — prominence = text length, the graft
of peak prominence.

Plan shape: broadcast hash join against the ~8-row dim (NULL tool in
the dim is a wildcard), then ``row_number() over (partitionBy(conv,
session, event_name) orderBy(prominence desc, ts, turn_idx)) == 1`` —
exactly the J7 recipe from SURVEY §2.3.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def associate_ref_events(
    turns_with_sessions: DataFrame,
    ref_events: DataFrame,
) -> DataFrame:
    """One row per (conv_id, session_id, event_name): the best-matching
    turn, or nothing if the session has no match (inner semantics, like
    the reference's None for undetected lines which are then flattened
    to NULL columns — peak_detector.py:271-312)."""
    t = turns_with_sessions.withColumn(
        "prominence", F.length(F.coalesce(F.col("text"), F.lit("")))
    )
    dim = ref_events.select(
        F.col("event_name"),
        F.col("role").alias("_r"),
        F.col("tool").alias("_t"),
    )
    joined = t.join(
        F.broadcast(dim),
        (F.col("role") == F.col("_r"))
        & (F.col("_t").isNull() | (F.col("_t") == F.col("tool"))),
    )
    w = Window.partitionBy("conv_id", "session_id", "event_name").orderBy(
        F.desc("prominence"), F.asc("ts"), F.asc("turn_idx")
    )
    return (
        joined.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select(
            "conv_id",
            "session_id",
            "event_name",
            "turn_idx",
            "ts",
            F.col("prominence").cast("int").alias("prominence"),
        )
    )


def flatten_event_matches(matches: DataFrame, event_names: list[str]) -> DataFrame:
    """Wide form: one row per (conv, session), one (ts, prominence)
    column pair per event name in a FIXED order (the stable ordered
    flattening of SURVEY §2.5 W11, peak_detector.py:271-312)."""
    out = matches.groupBy("conv_id", "session_id").pivot(
        "event_name", event_names
    ).agg(F.first("prominence"))
    cols = [F.col(n).alias(f"prom_{n}") for n in event_names]
    return out.select("conv_id", "session_id", *cols)

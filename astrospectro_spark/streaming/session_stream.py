"""Structured Streaming variants (SURVEY §2.9: optional extension).

The reference is resumable batch, not streaming; its incremental unit
is the session ledger. These streaming forms cover the same semantics
for a continuously-arriving transcript feed:

- :func:`stream_session_stats` — per-(conv, session) aggregates with
  ``session_window`` (gap-based, the native analogue of our batch
  ts-gap sessionization) + watermark for late data;
- :func:`stream_featurize` — per-turn features over micro-batches via
  ``foreachBatch`` running the BATCH engine on each increment. Windows
  that need full history (cumulative counts) are out of scope for pure
  streaming; foreachBatch + the lineage table is the honest production
  pattern (Trigger.AvailableNow ≙ the reference's run-to-completion
  sessions).

Tested with file sources + AvailableNow in tests/test_streaming.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def stream_session_stats(
    stream_df: DataFrame,
    gap: str = "30 minutes",
    watermark: str = "2 hours",
) -> DataFrame:
    """Gap-based session aggregates on a streaming transcripts feed.

    ``session_window(ts, gap)`` merges events closer than ``gap`` into
    one window per conv_id — semantically the streaming twin of the
    batch ``sessionize`` (boundary when ts-gap > gap). The watermark
    bounds state: turns later than ``watermark`` behind the max seen ts
    are dropped (the batch engine instead sorts them in — SURVEY §2.9).
    """
    return (
        stream_df.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap).alias("w"), F.col("conv_id"))
        .agg(
            F.count(F.lit(1)).alias("n_turns"),
            F.sum(F.length(F.coalesce(F.col("text"), F.lit("")))).alias("total_chars"),
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
        )
        .select(
            "conv_id",
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "n_turns",
            "total_chars",
            "session_start",
            "session_end",
        )
    )


def stream_featurize(stream_df: DataFrame, out_path: str, checkpoint: str):
    """Micro-batch featurization: each increment runs the batch engine
    and appends to the features table — exactly-once via checkpoint +
    idempotent paths."""
    from astrospectro_spark.engine.windows import featurize_expr

    def handle(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        featurize_expr(batch_df).withColumn(
            "batch_id", F.lit(batch_id)
        ).write.mode("append").parquet(out_path)

    return (
        stream_df.writeStream.foreachBatch(handle)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
    )

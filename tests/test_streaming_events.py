"""Structured Streaming variants + ref-event association."""

from __future__ import annotations

import os

import pandas as pd
from pyspark.sql import functions as F


def test_stream_session_stats_matches_batch(spark, transcripts_pdf, tmp_path):
    """AvailableNow file-stream sessionization must agree with the
    batch engine on session count per conversation (for gap-separated
    data with no late rows)."""
    from astrospectro_spark.engine.windows import sessionize
    from astrospectro_spark.streaming import stream_session_stats

    src = str(tmp_path / "stream_src")
    spark.createDataFrame(transcripts_pdf).write.parquet(src)
    schema = "conv_id string, turn_idx int, role string, text string, tool string, ts timestamp"
    stream = spark.readStream.schema(schema).parquet(src)
    out_q = (
        stream_session_stats(stream)
        .writeStream.format("memory")
        .queryName("sess_stream")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    out_q.awaitTermination(120)
    got = spark.sql("select * from sess_stream").toPandas()

    batch = sessionize(spark.createDataFrame(transcripts_pdf))
    want = (
        batch.groupBy("conv_id")
        .agg((F.max("session_id") + 1).alias("n_sessions"), F.count(F.lit(1)).alias("n_turns"))
        .toPandas()
    )
    got_sessions = got.groupby("conv_id").size().rename("n_sessions").reset_index()
    m = want.merge(got_sessions, on="conv_id", suffixes=("_batch", "_stream"))
    assert len(m) == len(want)
    assert (m["n_sessions_batch"] == m["n_sessions_stream"]).all()
    assert got["n_turns"].sum() == len(transcripts_pdf)


def test_stream_featurize_foreachbatch(spark, transcripts_pdf, tmp_path):
    from astrospectro_spark.streaming import stream_featurize

    src = str(tmp_path / "fsrc")
    out = str(tmp_path / "fout")
    ckpt = str(tmp_path / "fckpt")
    spark.createDataFrame(transcripts_pdf).write.parquet(src)
    schema = "conv_id string, turn_idx int, role string, text string, tool string, ts timestamp"
    stream = spark.readStream.schema(schema).parquet(src)
    q = stream_featurize(stream, out, ckpt).start()
    q.awaitTermination(120)
    feats = spark.read.parquet(out)
    assert feats.count() == len(transcripts_pdf)
    assert "session_id" in feats.columns and "batch_id" in feats.columns


def test_associate_ref_events(spark, transcripts_sdf):
    from astrospectro_spark.engine.events import associate_ref_events, flatten_event_matches
    from astrospectro_spark.engine.windows import sessionize
    from astrospectro_spark.synth import generate_ref_events

    ref = spark.createDataFrame(generate_ref_events())
    s = sessionize(transcripts_sdf)
    m = associate_ref_events(s, ref)
    pdf = m.toPandas()
    assert len(pdf) > 0
    # at most one match per (conv, session, event)
    assert not pdf.duplicated(["conv_id", "session_id", "event_name"]).any()
    # every match respects the dim pattern: check one named event
    tool_rows = pdf[pdf.event_name == "tool_call"]
    if len(tool_rows):
        joined = tool_rows.merge(
            s.toPandas()[["conv_id", "turn_idx", "role", "tool"]],
            on=["conv_id", "turn_idx"],
        )
        assert (joined["role"] == "assistant").all()
        assert (joined["tool"] == "search").all()
    # pandas oracle for best-match semantics on one event pattern
    sp = s.toPandas()
    cand = sp[(sp.role == "system")]
    if len(cand):
        cand = cand.assign(prom=cand["text"].fillna("").str.len())
        best = (
            cand.sort_values(["prom", "ts", "turn_idx"], ascending=[False, True, True], kind="mergesort")
            .groupby(["conv_id", "session_id"], as_index=False)
            .first()
        )
        got = pdf[pdf.event_name == "system_boot"].sort_values(["conv_id", "session_id"]).reset_index(drop=True)
        want = best.sort_values(["conv_id", "session_id"]).reset_index(drop=True)
        assert len(got) == len(want)
        assert (got["turn_idx"].to_numpy() == want["turn_idx"].to_numpy()).all()
    wide = flatten_event_matches(m, sorted(pdf.event_name.unique()))
    assert wide.count() > 0

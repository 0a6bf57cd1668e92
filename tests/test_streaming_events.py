"""Structured Streaming variants + ref-event association."""

from __future__ import annotations

import os

import pandas as pd
import pytest
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


def test_stream_featurize_wide_matches_batch(spark, transcripts_pdf, tmp_path):
    """wide=True micro-batch featurization: a single AvailableNow batch
    must reproduce the batch engine's full 175-column wide tier
    bit-for-bit (one increment == whole input, so every running/session
    feature is comparable)."""
    from astrospectro_spark.engine.windows import (
        FEATURE_COLS,
        KEY_COLS,
        WIDE_FEATURE_COLS,
        featurize_expr,
    )
    from astrospectro_spark.streaming import stream_featurize

    from .conftest import assert_frames_match

    src = str(tmp_path / "wsrc")
    out = str(tmp_path / "wout")
    ckpt = str(tmp_path / "wckpt")
    spark.createDataFrame(transcripts_pdf).write.parquet(src)
    schema = "conv_id string, turn_idx int, role string, text string, tool string, ts timestamp"
    stream = spark.readStream.schema(schema).parquet(src)
    q = stream_featurize(stream, out, ckpt, wide=True).start()
    q.awaitTermination(120)
    got = spark.read.parquet(out).drop("batch_id").toPandas()
    assert sorted(got.columns) == sorted(KEY_COLS + FEATURE_COLS + WIDE_FEATURE_COLS)
    want = featurize_expr(spark.read.parquet(src), wide=True).toPandas()
    assert_frames_match(
        got, want, ["conv_id", "ts", "turn_idx"], rtol=0.0, atol=0.0
    )


def test_stateful_featurize_matches_batch(spark, transcripts_pdf, tmp_path):
    """applyInPandasWithState running featurizer: cumulative features
    carried across micro-batches must equal the batch engine. Input is
    split into 3 ts-ordered files (mtime-ordered so the file source
    delivers them as sequential micro-batches with maxFilesPerTrigger=1)."""
    import time

    from astrospectro_spark.engine.windows import featurize_expr
    from astrospectro_spark.streaming import stateful_featurize

    src = tmp_path / "state_src"
    src.mkdir()
    pdf = transcripts_pdf.sort_values(["ts", "turn_idx"], kind="mergesort")
    cuts = [0, len(pdf) // 3, 2 * len(pdf) // 3, len(pdf)]
    for i in range(3):
        part = pdf.iloc[cuts[i] : cuts[i + 1]]
        p = str(src / f"part-{i:03d}.parquet")
        spark.createDataFrame(part).coalesce(1).write.mode("overwrite").parquet(p)
        time.sleep(1.1)  # distinct mtimes → deterministic batch order

    schema = "conv_id string, turn_idx int, role string, text string, tool string, ts timestamp"
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src / "part-*.parquet"))
    )
    q = (
        stateful_featurize(stream)
        .writeStream.format("memory")
        .queryName("stateful_feats")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    got = (
        spark.sql("select * from stateful_feats")
        .toPandas()
        .sort_values(["conv_id", "ts", "turn_idx"], kind="mergesort")
        .reset_index(drop=True)
    )
    want = (
        featurize_expr(spark.createDataFrame(transcripts_pdf))
        .select(
            "conv_id", "turn_idx", "ts", "session_id", "turn_in_session",
            "cum_count_assistant", "cum_count_system", "cum_count_tool",
            "cum_count_user", "tool_backfill", "lag1_ts_gap_s",
        )
        .toPandas()
        .sort_values(["conv_id", "ts", "turn_idx"], kind="mergesort")
        .reset_index(drop=True)
    )
    assert len(got) == len(want)
    for c in want.columns:
        a, b = got[c], want[c]
        if b.dtype.kind == "f":
            import numpy as np

            assert np.allclose(
                a.to_numpy(float), b.to_numpy(float), rtol=0, atol=0, equal_nan=True
            ), c
        else:
            av = a.astype(object).where(a.notna(), None).tolist()
            bv = b.astype(object).where(b.notna(), None).tolist()
            assert av == bv, c


def test_stateful_featurize_multichunk_group(spark, transcripts_pdf, tmp_path):
    """A conversation whose micro-batch increment spans multiple Arrow
    chunks must still be processed in one global (ts, turn_idx) order:
    the kernel concatenates the chunk iterator BEFORE sorting (a
    per-chunk sort is not a total order). Forced by
    arrow.maxRecordsPerBatch=7 (<< conversation size) over a shuffled
    row order, single micro-batch."""
    import numpy as np

    from astrospectro_spark.engine.windows import featurize_expr
    from astrospectro_spark.streaming import stateful_featurize

    key = "spark.sql.execution.arrow.maxRecordsPerBatch"
    old = spark.conf.get(key)
    spark.conf.set(key, "7")
    try:
        src = str(tmp_path / "mc_src")
        shuffled = transcripts_pdf.sample(frac=1.0, random_state=7)
        spark.createDataFrame(shuffled).coalesce(1).write.parquet(src)
        schema = (
            "conv_id string, turn_idx int, role string, text string, "
            "tool string, ts timestamp"
        )
        stream = spark.readStream.schema(schema).parquet(src)
        q = (
            stateful_featurize(stream)
            .writeStream.format("memory")
            .queryName("mc_feats")
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)
        got = (
            spark.sql("select * from mc_feats")
            .toPandas()
            .sort_values(["conv_id", "ts", "turn_idx"], kind="mergesort")
            .reset_index(drop=True)
        )
        want = (
            featurize_expr(spark.createDataFrame(transcripts_pdf))
            .select(
                "conv_id", "turn_idx", "ts", "session_id", "turn_in_session",
                "cum_count_assistant", "cum_count_system", "cum_count_tool",
                "cum_count_user", "tool_backfill", "lag1_ts_gap_s",
            )
            .toPandas()
            .sort_values(["conv_id", "ts", "turn_idx"], kind="mergesort")
            .reset_index(drop=True)
        )
        assert len(got) == len(want) > 0
        # the fixture must actually exercise multi-chunk groups
        assert (transcripts_pdf.groupby("conv_id").size() > 7).any()
        for c in want.columns:
            a, b = got[c], want[c]
            if b.dtype.kind == "f":
                assert np.allclose(
                    a.to_numpy(float), b.to_numpy(float), rtol=0, atol=0, equal_nan=True
                ), c
            else:
                av = a.astype(object).where(a.notna(), None).tolist()
                bv = b.astype(object).where(b.notna(), None).tolist()
                assert av == bv, c
    finally:
        spark.conf.set(key, old)


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


def test_stateful_asof_enrich_matches_oracle(spark, transcripts_pdf, anchors_pdf, tmp_path):
    """Streaming point-in-time enrichment: an interleaved turn/anchor
    feed delivered as 3 ts-ordered micro-batches must answer every
    anchor exactly like the batch as-of oracle (boundary inclusive,
    largest-turn_idx tiebreak, NULLs for unmatched / before-first-turn
    anchors), with tool_backfill equal to an as-of over the ffilled
    tool column."""
    import time

    import numpy as np

    from astrospectro_spark.oracle.pandas_oracle import oracle_asof
    from astrospectro_spark.streaming import stateful_asof_enrich

    turns = transcripts_pdf[["conv_id", "turn_idx", "role", "tool", "ts"]].copy()
    turns["kind"] = "turn"
    turns["anchor_id"] = pd.array([None] * len(turns), dtype="Int64")
    anchors = anchors_pdf[["conv_id", "anchor_id", "anchor_ts"]].rename(
        columns={"anchor_ts": "ts"}
    )
    anchors["kind"] = "anchor"
    anchors["turn_idx"] = pd.array([None] * len(anchors), dtype="Int32")
    anchors["role"] = pd.array([None] * len(anchors), dtype="string")
    anchors["tool"] = pd.array([None] * len(anchors), dtype="string")
    cols = ["conv_id", "kind", "turn_idx", "role", "tool", "ts", "anchor_id"]
    feed = pd.concat([turns[cols], anchors[cols]], ignore_index=True)
    feed["turn_idx"] = feed["turn_idx"].astype("Int32")
    # global order: ts, turns before anchors at equal ts, then turn_idx —
    # so a same-ts turn/anchor pair is never split anchor-first
    feed["_k"] = (feed["kind"] == "anchor").astype(int)
    feed = (
        feed.sort_values(["ts", "_k", "turn_idx"], kind="mergesort")
        .drop(columns="_k")
        .reset_index(drop=True)
    )

    src = tmp_path / "asof_feed"
    src.mkdir()
    cuts = [0, len(feed) // 3, 2 * len(feed) // 3, len(feed)]
    for i in range(3):
        part = feed.iloc[cuts[i] : cuts[i + 1]]
        p = str(src / f"part-{i:03d}.parquet")
        spark.createDataFrame(part).coalesce(1).write.mode("overwrite").parquet(p)
        time.sleep(1.1)

    schema = (
        "conv_id string, kind string, turn_idx int, role string, "
        "tool string, ts timestamp, anchor_id long"
    )
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src / "part-*.parquet"))
    )
    q = (
        stateful_asof_enrich(stream)
        .writeStream.format("memory")
        .queryName("asof_enrich_stream")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    got = (
        spark.sql("select * from asof_enrich_stream")
        .toPandas()
        .sort_values("anchor_id", kind="mergesort")
        .reset_index(drop=True)
    )

    want = oracle_asof(
        transcripts_pdf, anchors_pdf, value_cols=["turn_idx", "role", "ts"]
    )
    # backfill law: as-of over the per-conversation ffilled tool column
    tf = transcripts_pdf.sort_values(["ts", "turn_idx"], kind="mergesort").copy()
    tf["tool"] = tf.groupby("conv_id")["tool"].ffill()
    want_bf = oracle_asof(tf, anchors_pdf, value_cols=["tool", "ts"])

    assert len(got) == len(anchors_pdf)
    assert got["anchor_id"].tolist() == want["anchor_id"].tolist()

    def vals(s):
        return s.astype(object).where(s.notna(), None).tolist()

    assert vals(got["asof_turn_idx"]) == vals(want["asof_turn_idx"])
    assert vals(got["asof_role"]) == vals(want["asof_role"])
    assert vals(got["tool_backfill"]) == vals(want_bf["asof_tool"])
    gap_want = (
        want["anchor_ts"].to_numpy("datetime64[us]").astype(np.int64)
        - want["asof_ts"].to_numpy("datetime64[us]").astype(np.float64)
    ) / 1e6
    gap_want[want["asof_ts"].isna().to_numpy()] = np.nan
    assert np.allclose(
        got["asof_gap_s"].to_numpy(float), gap_want, rtol=0, atol=0, equal_nan=True
    )


def _asof_ttl_feed(tmp_path, spark):
    """4 mtime-ordered micro-batch files exercising state TTL.

    t0: A and B each post a turn. B stays active (batches 2-3) which
    advances the watermark past A's retention horizon, so A is evicted
    during batch 3 (no data for A in that batch — timeout fires). Batch
    4 carries one anchor each: A must answer NULL (evicted), B must
    match its latest turn.
    """
    import time

    t0 = pd.Timestamp("2025-01-01 00:00:00")
    H = pd.Timedelta(hours=1)

    def row(conv, kind, ts, idx=None, tool=None, aid=None):
        return {
            "conv_id": conv, "kind": kind, "turn_idx": idx,
            "role": "user" if kind == "turn" else None, "tool": tool,
            "ts": ts, "anchor_id": aid,
        }

    batches = [
        [row("A", "turn", t0, idx=0, tool="exec"), row("B", "turn", t0, idx=0)],
        [row("B", "turn", t0 + 3 * H, idx=1)],
        [row("B", "turn", t0 + 3 * H + pd.Timedelta(minutes=10), idx=2, tool="search")],
        [row("A", "anchor", t0 + 5 * H, aid=0), row("B", "anchor", t0 + 5 * H, aid=1)],
    ]
    src = tmp_path / "ttl_feed"
    src.mkdir()
    schema = (
        "conv_id string, kind string, turn_idx int, role string, "
        "tool string, ts timestamp, anchor_id long"
    )
    for i, rows in enumerate(batches):
        pdf = pd.DataFrame(rows)
        sdf = spark.createDataFrame(pdf, schema=schema)
        sdf.coalesce(1).write.mode("overwrite").parquet(str(src / f"part-{i:03d}.parquet"))
        time.sleep(1.1)
    return str(src / "part-*.parquet"), schema


def _run_asof_ttl(spark, pattern, schema, name, retention):
    from astrospectro_spark.streaming import stateful_asof_enrich

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(pattern)
        .withWatermark("ts", "0 seconds")
    )
    q = (
        stateful_asof_enrich(stream, retention=retention)
        .writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    return (
        spark.sql(f"select * from {name}")
        .toPandas()
        .sort_values("anchor_id")
        .reset_index(drop=True)
    )


def test_asof_enrich_state_ttl_evicts_idle_conversations(spark, tmp_path):
    pattern, schema = _asof_ttl_feed(tmp_path, spark)
    got = _run_asof_ttl(spark, pattern, schema, "asof_ttl", retention="1 hour")
    assert len(got) == 2
    a, b = got.iloc[0], got.iloc[1]
    # A idle > 1h behind the watermark: evicted, anchor answers NULL
    assert a["conv_id"] == "A" and pd.isna(a["asof_turn_idx"])
    assert pd.isna(a["tool_backfill"])
    # B stayed active: answered from its latest turn
    assert b["conv_id"] == "B" and b["asof_turn_idx"] == 2
    assert b["tool_backfill"] == "search"


def test_asof_enrich_no_ttl_keeps_state_forever(spark, tmp_path):
    """Same feed, retention=None: A's anchor is answered from the turn
    4 batches earlier — proving the TTL (not late-row filtering or a
    state bug) caused the NULL above."""
    pattern, schema = _asof_ttl_feed(tmp_path, spark)
    got = _run_asof_ttl(spark, pattern, schema, "asof_nottl", retention=None)
    assert len(got) == 2
    a, b = got.iloc[0], got.iloc[1]
    assert a["conv_id"] == "A" and a["asof_turn_idx"] == 0
    assert a["tool_backfill"] == "exec"
    assert b["asof_turn_idx"] == 2


def test_stateful_asof_pre1970_turns_match(spark, tmp_path):
    """Round-4 ADVICE: a turn with a NEGATIVE epoch timestamp (pre-1970)
    must still match later anchors — the state carries an explicit
    has_turn flag, not a sentinel timestamp sign."""
    import time

    from astrospectro_spark.streaming import stateful_asof_enrich

    rows = [
        # conv 'old': one turn in 1969 (negative micros), anchor in 1970
        ("old", "turn", 0, "user", "hammer", "1969-12-31 23:00:00", None),
        ("old", "anchor", None, None, None, "1970-01-01 00:10:00", 1),
        # conv 'neg': anchor BEFORE any turn, also pre-1970 → NULL match
        ("neg", "anchor", None, None, None, "1969-12-30 00:00:00", 2),
    ]
    pdf = pd.DataFrame(
        rows,
        columns=["conv_id", "kind", "turn_idx", "role", "tool", "s", "anchor_id"],
    )
    src = tmp_path / "pre1970_feed"
    src.mkdir()
    halves = [pdf.iloc[:1], pdf.iloc[1:]]
    schema = (
        "conv_id string, kind string, turn_idx int, role string, "
        "tool string, ts timestamp, anchor_id long"
    )
    for i, part in enumerate(halves):
        sdf = (
            spark.createDataFrame(
                part.astype(object).where(part.notna(), None),
                "conv_id string, kind string, turn_idx int, role string, "
                "tool string, s string, anchor_id long",
            )
            .withColumn("ts", F.col("s").cast("timestamp"))
            .drop("s")
            .select(
                "conv_id", "kind", "turn_idx", "role", "tool", "ts", "anchor_id"
            )
        )
        sdf.coalesce(1).write.mode("overwrite").parquet(
            str(src / f"part-{i:03d}.parquet")
        )
        time.sleep(1.1)

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src / "part-*.parquet"))
    )
    q = (
        stateful_asof_enrich(stream)
        .writeStream.format("memory")
        .queryName("asof_pre1970")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = (
        spark.sql("select * from asof_pre1970")
        .toPandas()
        .set_index("anchor_id")
    )
    assert got.loc[1, "asof_turn_idx"] == 0  # pre-1970 turn matched
    assert got.loc[1, "tool_backfill"] == "hammer"
    assert got.loc[1, "asof_gap_s"] == pytest.approx(4200.0)
    assert pd.isna(got.loc[2, "asof_turn_idx"])  # no turn yet → NULL

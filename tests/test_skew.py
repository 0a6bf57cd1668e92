"""Skew engine: salted range partitioning must be bit-identical to the
single-window path, while splitting hot conversations into parallel
chunks (SURVEY.md §4 custom-work 1; north_rule skew gate)."""

from __future__ import annotations

from astrospectro_spark.engine.skew import featurize_salted
from astrospectro_spark.engine.windows import featurize_expr

from .conftest import assert_frames_match

SORT = ["conv_id", "ts", "turn_idx"]


def test_salted_identical_under_forced_chunking(spark, transcripts_sdf):
    """Every conversation chunked (~37 rows/chunk → the mega-conv splits
    into ~48 chunks) — exercises cross-chunk session stitches, backfill
    carry, cumulative offsets, and rate/roll overlap margins."""
    salted = featurize_salted(
        transcripts_sdf, hot_threshold=10, chunk_target_rows=37
    ).toPandas()
    plain = featurize_expr(transcripts_sdf).toPandas()
    assert_frames_match(salted, plain, SORT, rtol=0.0, atol=0.0)


def test_salted_noop_when_nothing_hot(spark, transcripts_sdf):
    salted = featurize_salted(transcripts_sdf, hot_threshold=10**9).toPandas()
    plain = featurize_expr(transcripts_sdf).toPandas()
    assert_frames_match(salted, plain, SORT, rtol=0.0, atol=0.0)


def test_salted_only_mega_conv_hot(spark, transcripts_sdf, transcripts_pdf):
    """Realistic setting: only the 30%-mega-conversation crosses the
    threshold; cold convs take the plain path, outputs must agree."""
    sizes = transcripts_pdf.groupby("conv_id").size()
    thr = int(sizes.max()) - 1
    salted = featurize_salted(
        transcripts_sdf, hot_threshold=thr, chunk_target_rows=100
    ).toPandas()
    plain = featurize_expr(transcripts_sdf).toPandas()
    assert_frames_match(salted, plain, SORT, rtol=0.0, atol=0.0)

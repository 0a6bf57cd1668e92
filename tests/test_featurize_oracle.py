"""Oracle tests: Spark feature vectors must be allclose to the pure-
pandas oracle at every conv_id×ts (SURVEY.md §5 'golden-by-
reimplementation'), on both execution paths."""

from __future__ import annotations

from astrospectro_spark.engine.featurize import featurize_grouped
from astrospectro_spark.engine.windows import (
    FEATURE_COLS,
    KEY_COLS,
    WIDE_FEATURE_COLS,
    featurize_expr,
)
from astrospectro_spark.oracle import oracle_features

from .conftest import assert_frames_match

SORT = ["conv_id", "ts", "turn_idx"]


def test_expr_path_matches_oracle(spark, transcripts_sdf, transcripts_pdf):
    got = featurize_expr(transcripts_sdf).toPandas()
    want = oracle_features(transcripts_pdf)
    assert list(got.columns) == KEY_COLS + FEATURE_COLS
    assert_frames_match(got, want, SORT)


def test_wide_expr_path_matches_oracle(spark, transcripts_sdf, transcripts_pdf):
    """The 30-feature wide tier (extra lags/rolls, 300s rate, session
    elapsed, composites) against the independent pandas oracle."""
    got = featurize_expr(transcripts_sdf, wide=True).toPandas()
    want = oracle_features(transcripts_pdf, wide=True)
    assert list(got.columns) == KEY_COLS + FEATURE_COLS + WIDE_FEATURE_COLS
    assert_frames_match(got, want, SORT)


def test_grouped_path_matches_expr(spark, transcripts_sdf):
    grouped = featurize_grouped(transcripts_sdf).toPandas()
    expr = featurize_expr(transcripts_sdf).toPandas()
    assert_frames_match(grouped, expr, SORT)


def test_grouped_wide_matches_expr_wide(spark, transcripts_sdf):
    grouped = featurize_grouped(transcripts_sdf, wide=True).toPandas()
    expr = featurize_expr(transcripts_sdf, wide=True).toPandas()
    assert_frames_match(grouped, expr, SORT)


def test_text_byte_identical(spark, transcripts_sdf, transcripts_pdf):
    """Per-turn text equality under stable turn ordering (input_hint
    invariant): unicode / newlines / pipes must round-trip untouched."""
    got = (
        featurize_expr(transcripts_sdf)
        .select("conv_id", "turn_idx", "text")
        .toPandas()
        .sort_values(["conv_id", "turn_idx"], kind="mergesort")
        .reset_index(drop=True)
    )
    want = (
        transcripts_pdf[["conv_id", "turn_idx", "text"]]
        .sort_values(["conv_id", "turn_idx"], kind="mergesort")
        .reset_index(drop=True)
    )
    assert (got["text"].fillna("") == want["text"].fillna("")).all()
    # the fixture really exercises the invariant
    joined = "".join(want["text"].fillna("").tolist())
    assert "|" in joined and "\n" in joined and "Hα" in joined


def test_include_labels_are_leads(spark, transcripts_sdf):
    df = featurize_expr(transcripts_sdf, include_labels=True).toPandas()
    one = (
        df[df.conv_id == df.conv_id.iloc[0]]
        .sort_values(["ts", "turn_idx"], kind="mergesort")
        .reset_index(drop=True)
    )
    if len(one) > 1:
        assert one["label_lead1_text_len"].iloc[0] == one["text_len"].iloc[1]

"""Leakage audit (SURVEY.md §5): perturb every turn with ts > anchor;
features at ts <= anchor must be IDENTICAL. Generalises the reference's
permutation negative control (src/dimred/embedding.py:279-303)."""

from __future__ import annotations

import numpy as np
import pandas as pd

from astrospectro_spark.engine.featurize import featurize_grouped
from astrospectro_spark.engine.windows import featurize_expr

from .conftest import assert_frames_match

SORT = ["conv_id", "ts", "turn_idx"]


def _poison_after(pdf: pd.DataFrame, cutoff) -> pd.DataFrame:
    """Deterministically mangle all rows with ts > cutoff."""
    out = pdf.copy()
    late = out["ts"] > cutoff
    out.loc[late, "text"] = "POISON " * 50
    out.loc[late, "tool"] = "poisoned_tool"
    out.loc[late, "role"] = "system"
    out.loc[late, "ts"] = out.loc[late, "ts"] + pd.Timedelta(hours=777)
    return out


def _run_audit(spark, transcripts_pdf, featurizer):
    cutoff = transcripts_pdf["ts"].quantile(0.5)
    clean = featurizer(spark.createDataFrame(transcripts_pdf)).toPandas()
    poisoned = featurizer(
        spark.createDataFrame(_poison_after(transcripts_pdf, cutoff))
    ).toPandas()
    clean_pre = clean[clean["ts"] <= cutoff]
    pois_pre = poisoned[poisoned["ts"] <= cutoff]
    assert len(clean_pre) == len(pois_pre) > 0
    assert_frames_match(pois_pre, clean_pre, SORT, rtol=0.0, atol=0.0)


def test_expr_path_zero_leakage(spark, transcripts_pdf):
    _run_audit(spark, transcripts_pdf, featurize_expr)


def test_grouped_path_zero_leakage(spark, transcripts_pdf):
    _run_audit(spark, transcripts_pdf, featurize_grouped)


def test_wide_tier_zero_leakage(spark, transcripts_pdf):
    """Every wide feature (session_elapsed carry, cumulative text
    length, extra lags/rolls/rates, calendar/composites) must also be
    strictly backward-looking."""
    _run_audit(spark, transcripts_pdf, lambda sdf: featurize_expr(sdf, wide=True))


def test_salted_wide_zero_leakage(spark, transcripts_pdf):
    from astrospectro_spark.engine.skew import featurize_salted

    _run_audit(
        spark,
        transcripts_pdf,
        lambda sdf: featurize_salted(sdf, hot_threshold=10, chunk_target_rows=37, wide=True),
    )


def test_labels_do_leak_by_design(spark, transcripts_pdf):
    """Sanity check the audit has teeth: lead-based label_ columns MUST
    change when the future is poisoned (they are targets, not features)."""
    cutoff = transcripts_pdf["ts"].quantile(0.5)
    f = lambda sdf: featurize_expr(sdf, include_labels=True)  # noqa: E731
    clean = f(spark.createDataFrame(transcripts_pdf)).toPandas()
    poisoned = f(spark.createDataFrame(_poison_after(transcripts_pdf, cutoff))).toPandas()
    c = clean[clean["ts"] <= cutoff].sort_values(SORT, kind="mergesort")
    p = poisoned[poisoned["ts"] <= cutoff].sort_values(SORT, kind="mergesort")
    a = c["label_lead1_ts_gap_s"].to_numpy(float)
    b = p["label_lead1_ts_gap_s"].to_numpy(float)
    both = ~(np.isnan(a) & np.isnan(b))
    assert not np.array_equal(a[both], b[both])

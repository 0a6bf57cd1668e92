"""Pure-pandas per-conversation reference implementation (the oracle).

Mirrors the reference's golden-by-reimplementation spirit (its pandas
path checks its NumPy path; here pandas checks Spark). This module is
also reused as the kernel inside the grouped ``applyInPandas``
featurizer (:mod:`astrospectro_spark.engine.featurize`) — one source of
truth for the per-entity semantics, two execution engines.

Semantics contract (must match engine/windows.py exactly):
- stable ordering is ``(ts, turn_idx)``; all gap arithmetic is int64
  microseconds divided once by 1e6 (bit-identical doubles both sides);
- frames end at the current row (zero leakage); ``rate_60s`` is
  time-based and includes equal-ts rows regardless of ``turn_idx``.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

SESSION_GAP_S = 1800.0
RATE_WINDOW_S = 60
ROLL_ROWS = 5
ROLES = ("assistant", "system", "tool", "user")


def featurize_pdf(
    pdf: pd.DataFrame,
    gap_s: float = SESSION_GAP_S,
    rate_window_s: int = RATE_WINDOW_S,
    roll_rows: int = ROLL_ROWS,
    include_labels: bool = False,
    wide: bool = False,
) -> pd.DataFrame:
    """Featurize ONE conversation (or one contiguous chunk of one).

    Always re-sorts by (ts, turn_idx): grouped-map input order is not
    guaranteed by Spark (SURVEY.md §4 custom-work item 2), and the
    oracle must not depend on input order either.
    """
    g = pdf.sort_values(["ts", "turn_idx"], kind="mergesort").reset_index(drop=True)
    ts_us = g["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
    text = g["text"].fillna("")
    text_len = text.str.len().to_numpy().astype(np.int64)

    out = pd.DataFrame(
        {
            "conv_id": g["conv_id"],
            "turn_idx": g["turn_idx"].astype("int32"),
            "role": g["role"],
            "text": g["text"],
            "tool": g["tool"],
            "ts": g["ts"],
        }
    )
    gap_us = np.diff(ts_us, prepend=ts_us[:1])
    gap_s_arr = gap_us.astype(np.float64) / 1e6
    gap_s_arr[0] = np.nan
    lag_len = np.roll(text_len, 1).astype(np.float64)
    lag_delta = text_len.astype(np.float64) - lag_len
    lag_delta[0] = np.nan

    session_id = np.cumsum(np.nan_to_num(gap_s_arr, nan=0.0) > gap_s).astype(np.int32)
    # row_number within (conv, session)
    turn_in_session = np.ones(len(g), dtype=np.int32)
    if len(g) > 1:
        same = session_id[1:] == session_id[:-1]
        run = 1
        for i in range(1, len(g)):
            run = run + 1 if same[i - 1] else 1
            turn_in_session[i] = run

    tool_backfill = g["tool"].ffill()

    lo = np.searchsorted(ts_us, ts_us - rate_window_s * 1_000_000, side="left")
    hi = np.searchsorted(ts_us, ts_us, side="right")
    rate = (hi - lo).astype(np.float64)

    roll_mean = (
        pd.Series(text_len).rolling(roll_rows, min_periods=1).mean().to_numpy()
    )

    out["cum_count_assistant"] = np.cumsum(g["role"].to_numpy() == "assistant").astype("int32")
    out["cum_count_system"] = np.cumsum(g["role"].to_numpy() == "system").astype("int32")
    out["cum_count_tool"] = np.cumsum(g["role"].to_numpy() == "tool").astype("int32")
    out["cum_count_user"] = np.cumsum(g["role"].to_numpy() == "user").astype("int32")
    out["lag1_text_len_delta"] = lag_delta
    out["lag1_ts_gap_s"] = gap_s_arr
    out["rate_60s"] = rate
    out["roll_mean_text_len_5"] = roll_mean
    out["session_id"] = session_id
    out["text_len"] = text_len.astype("int32")
    out["tool_backfill"] = tool_backfill
    out["turn_in_session"] = turn_in_session

    if wide:
        n_run = np.arange(1, len(g) + 1, dtype=np.int64)
        ctl = np.cumsum(text_len)
        ctl2 = np.cumsum(text_len * text_len)
        out["cum_text_len"] = ctl.astype("int64")
        # Spark dayofweek: Sunday=1..Saturday=7; pandas: Monday=0
        dow = g["ts"].dt.dayofweek.to_numpy()
        out["day_of_week"] = ((dow + 1) % 7 + 1).astype("int32")
        gap_f = gap_us.astype(np.float64)
        gap_f[0] = np.nan
        gs = pd.Series(gap_f)
        out["gap_roll_max_5"] = pd.Series(gap_s_arr).rolling(roll_rows, min_periods=1).max().to_numpy()
        # exact int64-µs sum/count then one divide — mirrors the expr path
        out["gap_roll_mean_5"] = (
            gs.rolling(roll_rows, min_periods=1).sum().to_numpy()
            / gs.rolling(roll_rows, min_periods=1).count().to_numpy()
            / 1e6
        )
        out["hour_of_day"] = g["ts"].dt.hour.to_numpy().astype("int32")
        for r in ROLES:
            out[f"is_{r}"] = (g["role"].to_numpy() == r).astype("int32")
        out["is_weekend"] = np.isin(dow, (5, 6)).astype("int32")
        for kk in (2, 3):
            d = text_len.astype(np.float64) - np.roll(text_len, kk).astype(np.float64)
            d[:kk] = np.nan
            out[f"lag{kk}_text_len_delta"] = d
        out["log1p_text_len"] = np.log1p(text_len.astype(np.float64))
        out["minute_of_hour"] = g["ts"].dt.minute.to_numpy().astype("int32")
        out["pct_assistant_so_far"] = (
            out["cum_count_assistant"].to_numpy().astype(np.float64) / n_run
        )
        out["pct_tool_so_far"] = (
            out["cum_count_tool"].to_numpy().astype(np.float64) / n_run
        )
        rv = [None if pd.isna(x) else x for x in g["role"].tolist()]
        prev_rv = [None] + rv[:-1]
        out["prev_role"] = pd.Series(prev_rv, dtype=object)
        lo300 = np.searchsorted(ts_us, ts_us - 300 * 1_000_000, side="left")
        hi300 = np.searchsorted(ts_us, ts_us, side="right")
        out["rate_300s"] = (hi300 - lo300).astype(np.float64)
        out["role_changed"] = np.array(
            [0 if a == b or (a is None and b is None) else 1 for a, b in zip(rv, prev_rv)],
            dtype="int32",
        )
        s = pd.Series(text_len)
        out["roll_max_text_len_5"] = s.rolling(roll_rows, min_periods=1).max().to_numpy()
        out["roll_min_text_len_5"] = s.rolling(roll_rows, min_periods=1).min().to_numpy()
        w5m = s.rolling(roll_rows, min_periods=1).mean().to_numpy()
        w5m2 = (s * s).rolling(roll_rows, min_periods=1).mean().to_numpy()
        out["roll_std_text_len_5"] = np.sqrt(np.maximum(0.0, w5m2 - w5m * w5m))
        out["roll_sum_text_len_5"] = (
            s.rolling(roll_rows, min_periods=1).sum().to_numpy().astype("int64")
        )
        out["run_max_text_len"] = np.maximum.accumulate(text_len).astype("int32")
        out["run_min_text_len"] = np.minimum.accumulate(text_len).astype("int32")
        sess_cum = (
            pd.Series(text_len).groupby(pd.Series(session_id)).cumsum().to_numpy()
        ).astype("int64")
        out["sess_cum_text_len"] = sess_cum
        out["sess_mean_text_len"] = sess_cum.astype(np.float64) / turn_in_session
        # nullable Int64 keeps epoch-µs exact (float64 cannot represent
        # ~1.7e18 µs, so a NaN-float ffill would shift the boundary ts)
        sb = np.nan_to_num(gap_s_arr, nan=0.0) > gap_s
        start = (
            pd.Series(ts_us, dtype="Int64")
            .where(pd.Series(sb))
            .ffill()
            .fillna(int(ts_us[0]))
            .to_numpy(dtype="int64")
        )
        out["session_elapsed_s"] = (ts_us - start).astype(np.float64) / 1e6
        out["sigmoid_text_len"] = 1.0 / (
            1.0 + np.exp(-(text_len.astype(np.float64) - 200) / 80.0)
        )
        # running zscore from exact int64 cumulative sums (expr-path mirror)
        m_run = ctl / n_run
        var_run = ctl2 / n_run - m_run * m_run
        out["text_len_zscore_run"] = np.where(
            var_run > 0,
            (text_len - m_run) / np.sqrt(np.where(var_run > 0, var_run, 1.0)),
            0.0,
        )
        ps = np.concatenate([[0], np.cumsum(text_len)])
        out["text_sum_300s"] = (ps[hi300] - ps[lo300]).astype("int64")
        tv = [None if pd.isna(x) else x for x in g["tool"].tolist()]
        prev_tv = [None] + tv[:-1]
        out["tool_changed"] = np.array(
            [0 if a == b or (a is None and b is None) else 1 for a, b in zip(tv, prev_tv)],
            dtype="int32",
        )
        out["turn_frac_day"] = (ts_us % 86_400_000_000).astype(np.float64) / 86_400_000_000.0
        out["turn_idx_conv"] = n_run.astype("int32")
        out["turn_rate_session"] = turn_in_session.astype(np.float64) / (
            out["session_elapsed_s"].to_numpy() + 1.0
        )
        # ---- growth: bounded frames ----
        for kk in (4, 5):
            d = text_len.astype(np.float64) - np.roll(text_len, kk).astype(np.float64)
            d[:kk] = np.nan
            out[f"lag{kk}_text_len_delta"] = d
        acc = (
            text_len.astype(np.float64)
            - 2 * np.roll(text_len, 1).astype(np.float64)
            + np.roll(text_len, 2).astype(np.float64)
        )
        acc[:2] = np.nan
        out["accel_text_len"] = acc
        lag1f = np.roll(text_len, 1).astype(np.float64)
        lag1f[0] = np.nan
        with np.errstate(invalid="ignore", divide="ignore"):
            out["pct_change_text_len"] = np.where(
                lag1f > 0, (text_len - lag1f) / lag1f, np.nan
            )
        out["roll_mean_text_len_20"] = s.rolling(20, min_periods=1).mean().to_numpy()
        out["roll_min_text_len_20"] = s.rolling(20, min_periods=1).min().to_numpy()
        out["roll_max_text_len_20"] = s.rolling(20, min_periods=1).max().to_numpy()
        out["roll_sum_text_len_20"] = (
            s.rolling(20, min_periods=1).sum().to_numpy().astype("int64")
        )
        w10m = s.rolling(10, min_periods=1).mean().to_numpy()
        w10m2 = (s * s).rolling(10, min_periods=1).mean().to_numpy()
        out["roll_std_text_len_10"] = np.sqrt(np.maximum(0.0, w10m2 - w10m * w10m))
        out["gap_roll_max_10"] = (
            pd.Series(gap_s_arr).rolling(10, min_periods=1).max().to_numpy()
        )
        out["gap_roll_mean_10"] = (
            gs.rolling(10, min_periods=1).sum().to_numpy()
            / gs.rolling(10, min_periods=1).count().to_numpy()
            / 1e6
        )
        lo36 = np.searchsorted(ts_us, ts_us - 3600 * 1_000_000, side="left")
        out["rate_3600s"] = (hi300 - lo36).astype(np.float64)
        out["text_sum_3600s"] = (ps[hi300] - ps[lo36]).astype("int64")
        with np.errstate(invalid="ignore", divide="ignore"):
            out["zscore_roll_text_len_5"] = np.where(
                w5m2 - w5m * w5m > 0,
                (text_len - w5m) / np.sqrt(np.where(w5m2 - w5m * w5m > 0, w5m2 - w5m * w5m, 1.0)),
                0.0,
            )
        # ---- growth: running/unbounded ----
        out["gap_max_run"] = pd.Series(gap_s_arr).cummax().to_numpy()
        active_us = np.cumsum(np.where(np.isnan(gap_f), 0, gap_us)).astype("int64")
        out["active_time_run_s"] = active_us.astype(np.float64) / 1e6
        with np.errstate(invalid="ignore", divide="ignore"):
            out["mean_gap_run"] = np.where(
                n_run > 1, (active_us / np.maximum(n_run - 1, 1)) / 1e6, np.nan
            )
        out["high_gap_count_run"] = np.cumsum(
            np.nan_to_num(gap_s_arr, nan=0.0) > 3600
        ).astype("int64")
        tool_set = g["tool"].notna().to_numpy()
        out["cum_tool_set"] = np.cumsum(tool_set).astype("int64")
        out["time_since_start_s"] = (ts_us - ts_us[0]).astype(np.float64) / 1e6
        out["days_since_start"] = np.floor(
            (ts_us - ts_us[0]) / 86_400_000_000
        ).astype("int64")
        out["cum_mean_text_len"] = ctl / n_run
        out["pct_user_so_far"] = out["cum_count_user"].to_numpy().astype(np.float64) / n_run
        out["pct_system_so_far"] = (
            out["cum_count_system"].to_numpy().astype(np.float64) / n_run
        )
        out["pct_tool_set_so_far"] = (
            out["cum_tool_set"].to_numpy().astype(np.float64) / n_run
        )
        rmax = np.maximum.accumulate(text_len)
        rmin = np.minimum.accumulate(text_len)
        out["run_depth_text_len"] = (rmax - rmin).astype("int32")
        with np.errstate(invalid="ignore", divide="ignore"):
            out["text_len_range_norm"] = np.where(
                rmax - rmin > 0, (text_len - rmin).astype(np.float64) / (rmax - rmin), np.nan
            )
        out["sess_frac_of_turns"] = turn_in_session.astype(np.float64) / n_run
        out["turn_rate_conv"] = n_run.astype(np.float64) / (
            out["time_since_start_s"].to_numpy() + 1.0
        )
        # 10-row rolls
        out["roll_mean_text_len_10"] = s.rolling(10, min_periods=1).mean().to_numpy()
        out["roll_min_text_len_10"] = s.rolling(10, min_periods=1).min().to_numpy()
        out["roll_max_text_len_10"] = s.rolling(10, min_periods=1).max().to_numpy()
        out["roll_sum_text_len_10"] = (
            s.rolling(10, min_periods=1).sum().to_numpy().astype("int64")
        )
        # row-local composite battery (windows.wide_local_exprs mirror)
        tlf = text_len.astype(np.float64)
        ssx = (tlf - 300) / 150.0
        out["clip_text_len_600"] = np.minimum(np.maximum(tlf, 50.0), 600.0)
        out["day_of_month"] = g["ts"].dt.day.to_numpy().astype("int32")
        out["exp_decay_text_len"] = np.exp(-tlf / 500.0)
        out["gap_bucket_min"] = pd.array(
            np.floor(np.minimum(gap_s_arr, 86_400.0) / 60), dtype="Float64"
        ).astype("Int64")
        out["gauss_text_len"] = np.exp(-0.5 * ssx * ssx)
        hour = g["ts"].dt.hour.to_numpy()
        out["hour_bucket"] = np.floor(hour / 6).astype("int64")
        out["inv1p_text_len"] = 1.0 / (1 + tlf)
        out["is_business_hours"] = ((hour >= 9) & (hour <= 17)).astype("int32")
        out["is_empty_text"] = (text_len == 0).astype("int32")
        out["is_long_text"] = (text_len > 500).astype("int32")
        out["is_prev_assistant"] = np.array(
            [1 if p == "assistant" else 0 for p in prev_rv], dtype="int32"
        )
        out["is_prev_user"] = np.array(
            [1 if p == "user" else 0 for p in prev_rv], dtype="int32"
        )
        out["log1p_gap"] = np.log1p(np.maximum(gap_s_arr, 0.0))
        out["month"] = g["ts"].dt.month.to_numpy().astype("int32")
        out["quarter"] = g["ts"].dt.quarter.to_numpy().astype("int32")
        out["ramp_text_len"] = np.maximum(0.0, np.minimum(1.0, (tlf - 100) / 400.0))
        out["softsign_text_len"] = ssx / (1 + np.abs(ssx))
        out["sqrt_text_len"] = np.sqrt(tlf)
        out["text_len_bin"] = (np.floor(tlf / 100) * 100).astype("int64")
        out["text_len_sq"] = (text_len * text_len).astype(np.float64)
        out["tool_is_set"] = g["tool"].notna().to_numpy().astype("int32")
        # growth row-locals (windows.wide_local_exprs mirror)
        out["gap_capped_600"] = np.minimum(gap_s_arr, 600.0)
        nx = (tlf - 300) / 50.0
        out["gauss_narrow_text_len"] = np.exp(-0.5 * nx * nx)
        out["hour_of_week"] = (((dow + 1) % 7 + 1 - 1) * 24 + hour).astype("int32")
        out["is_month_start"] = (g["ts"].dt.day.to_numpy() == 1).astype("int32")
        out["is_night"] = (hour < 6).astype("int32")
        out["is_zero_gap"] = np.where(gap_s_arr == 0, 1, 0).astype("int32")
        with np.errstate(divide="ignore"):
            out["log2_text_len"] = np.where(text_len > 0, np.log2(np.maximum(tlf, 1.0)), np.nan)
        out["relu_text_len"] = np.maximum(0.0, tlf - 300)
        out["sigmoid_steep_text_len"] = 1.0 / (1.0 + np.exp(-(tlf - 200) / 20.0))
        out["text_len_cube_scaled"] = (text_len * text_len * text_len).astype(
            np.float64
        ) / 1_000_000.0
        out["text_len_is_even"] = (text_len % 2 == 0).astype("int32")
        out["tool_len"] = (
            g["tool"].str.len().fillna(0).to_numpy().astype("int32")
        )
        out["week_of_month"] = (
            np.floor((g["ts"].dt.day.to_numpy() - 1) / 7) + 1
        ).astype("int64")

    if include_labels:
        lead_len = np.roll(text_len, -1).astype(np.float64)
        lead_len[-1] = np.nan
        lead_gap = np.roll(gap_us, -1).astype(np.float64) / 1e6
        lead_gap[-1] = np.nan
        out["label_lead1_text_len"] = lead_len
        out["label_lead1_ts_gap_s"] = lead_gap
    return out


def oracle_features(transcripts: pd.DataFrame, **kw) -> pd.DataFrame:
    """Featurize a whole transcripts table, conversation by conversation."""
    parts = [
        featurize_pdf(grp, **kw)
        for _, grp in transcripts.groupby("conv_id", sort=True)
    ]
    return pd.concat(parts, ignore_index=True)


def oracle_asof(
    transcripts: pd.DataFrame,
    anchors: pd.DataFrame,
    value_cols: list[str] | None = None,
    tolerance_col: str | None = None,
) -> pd.DataFrame:
    """Backward as-of join oracle via ``pd.merge_asof`` per conv_id.

    For each anchor: the LATEST turn with ``ts <= anchor_ts`` (boundary
    inclusive), tie-broken by largest ``turn_idx`` — the same
    best-match-per-entity semantics as the reference's Gaia
    cross-match dedup (reference: src/tools/gaia_crossmatcher.py:735-744).
    Anchors on unmatched conv_ids or before the first turn get NULLs
    (reference: unmatched objid rows, gaia_crossmatcher.py:808-809).
    """
    value_cols = value_cols or ["turn_idx", "role", "text", "tool", "ts"]
    t = transcripts.sort_values(["ts", "turn_idx"], kind="mergesort")
    a = anchors.sort_values(["anchor_ts", "anchor_id"], kind="mergesort")
    left = a[["conv_id", "anchor_id", "anchor_ts"]].copy()
    if tolerance_col:
        left[tolerance_col] = a[tolerance_col].to_numpy()
    right = t[["conv_id", "ts", "turn_idx"] + [c for c in value_cols if c not in ("ts", "turn_idx")]]
    right = right.rename(columns={c: f"asof_{c}" for c in value_cols})
    merged = pd.merge_asof(
        left.sort_values("anchor_ts", kind="mergesort"),
        right.sort_values(["asof_ts"], kind="mergesort")
        if "asof_ts" in right.columns
        else right,
        left_on="anchor_ts",
        right_on="asof_ts",
        by="conv_id",
        direction="backward",
        allow_exact_matches=True,
    )
    # merge_asof breaks ties by taking the LAST matching row in sort
    # order; our sort is (ts, turn_idx) so that's the largest turn_idx —
    # matches the engine's contract.
    if tolerance_col:
        gap = (
            merged["anchor_ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
            - merged["asof_ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
        ) / 1e6
        too_old = gap > merged[tolerance_col].to_numpy().astype(np.float64)
        for c in merged.columns:
            if c.startswith("asof_"):
                merged.loc[too_old, c] = None
    return merged.sort_values("anchor_id").reset_index(drop=True)

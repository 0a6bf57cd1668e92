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

    # columns accumulate in a plain dict — ONE DataFrame build at the
    # end. This kernel is also the applyInPandas grouped path, where a
    # per-column DataFrame insert costs a frame copy each (pandas
    # fragmentation): dict-accumulation is ~10x faster per group.
    out: dict = {
        "conv_id": g["conv_id"],
        "turn_idx": g["turn_idx"].astype("int32"),
        "role": g["role"],
        "text": g["text"],
        "tool": g["tool"],
        "ts": g["ts"],
    }
    gap_us = np.diff(ts_us, prepend=ts_us[:1])
    gap_s_arr = gap_us.astype(np.float64) / 1e6
    gap_s_arr[0] = np.nan
    lag_len = np.roll(text_len, 1).astype(np.float64)
    lag_delta = text_len.astype(np.float64) - lag_len
    lag_delta[0] = np.nan

    session_id = np.cumsum(np.nan_to_num(gap_s_arr, nan=0.0) > gap_s).astype(np.int32)
    # row_number within (conv, session): index minus the running
    # maximum of session-start indices (vectorized — a Python loop here
    # dominated the grouped-path kernel time)
    idx0 = np.arange(len(g), dtype=np.int64)
    is_start = np.ones(len(g), dtype=bool)
    if len(g) > 1:
        is_start[1:] = session_id[1:] != session_id[:-1]
    start_idx = np.maximum.accumulate(np.where(is_start, idx0, 0))
    turn_in_session = (idx0 - start_idx + 1).astype(np.int32)

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
            np.asarray(out["cum_count_assistant"]).astype(np.float64) / n_run
        )
        out["pct_tool_so_far"] = (
            np.asarray(out["cum_count_tool"]).astype(np.float64) / n_run
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
            np.asarray(out["session_elapsed_s"]) + 1.0
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
        out["pct_user_so_far"] = np.asarray(out["cum_count_user"]).astype(np.float64) / n_run
        out["pct_system_so_far"] = (
            np.asarray(out["cum_count_system"]).astype(np.float64) / n_run
        )
        out["pct_tool_set_so_far"] = (
            np.asarray(out["cum_tool_set"]).astype(np.float64) / n_run
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
            np.asarray(out["time_since_start_s"]) + 1.0
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

        # ---- growth tier 4a: row-local composites (windows.wide_local_exprs
        # mirror; TAU literal matches windows._TAU) ----
        TAU = 6.283185307179586
        idx = np.arange(len(g))
        tool_len_arr = g["tool"].str.len().fillna(0).to_numpy().astype(np.int64)
        sig80 = 1.0 / (1.0 + np.exp(-(tlf - 200) / 80.0))
        gauss = np.exp(-0.5 * ssx * ssx)
        gaussn = np.exp(-0.5 * nx * nx)
        ramp = np.maximum(0.0, np.minimum(1.0, (tlf - 100) / 400.0))
        spark_dow = (dow + 1) % 7 + 1
        out["alpha_proxy_idx"] = (np.maximum(0.0, tlf - 300) / 100) * sig80
        out["cbrt_text_len"] = np.cbrt(tlf)
        out["cos_dow"] = np.cos(TAU * (spark_dow - 1) / 7.0)
        out["cos_hour"] = np.cos(TAU * hour / 24.0)
        out["ew_balance_text"] = (text_len - 120) / (text_len + 120)
        out["feh_proxy_idx"] = gauss - gaussn
        out["gap_is_long"] = np.where(
            np.isnan(gap_s_arr), np.nan, (gap_s_arr > 600).astype(np.float64)
        )
        out["gap_over_text"] = gap_s_arr / (text_len + 1)
        out["geo_mean_text_tool"] = np.sqrt((text_len * tool_len_arr).astype(np.float64))
        out["harmonic_text_tool"] = (2 * text_len * tool_len_arr).astype(
            np.float64
        ) / (text_len + tool_len_arr + 1)
        out["is_dawn"] = ((hour >= 6) & (hour < 9)).astype("int32")
        out["is_evening"] = (hour >= 18).astype("int32")
        out["is_first_turn"] = np.isnan(gap_s_arr).astype("int32")
        out["is_short_text"] = (text_len < 50).astype("int32")
        out["is_very_long_text"] = (text_len > 1000).astype("int32")
        with np.errstate(divide="ignore"):
            out["log10_text_len"] = np.where(
                text_len > 0, np.log10(np.maximum(tlf, 1.0)), np.nan
            )
        out["logg_proxy_idx"] = 0.6 * np.log1p(tlf) + 0.4 * np.sqrt(tlf)
        minute = g["ts"].dt.minute.to_numpy()
        out["minute_of_day"] = (hour * 60 + minute).astype("int32")
        _role_map = {"assistant": 1, "user": 2, "system": 3, "tool": 4}
        out["role_code"] = np.array(
            [_role_map.get(r, 0) for r in rv], dtype="int32"
        )
        out["second_of_minute"] = g["ts"].dt.second.to_numpy().astype("int32")
        out["sin_dow"] = np.sin(TAU * (spark_dow - 1) / 7.0)
        out["sin_hour"] = np.sin(TAU * hour / 24.0)
        out["signed_log1p_delta"] = np.sign(lag_delta) * np.log1p(np.abs(lag_delta))
        out["tanh_text_len"] = np.tanh((tlf - 300) / 150.0)
        out["teff_proxy_idx"] = 0.5 * sig80 + 0.3 * gauss + 0.2 * ramp
        out["text_kb_bucket"] = (text_len // 1024).astype("int64")
        out["text_minus_tool"] = (text_len - tool_len_arr).astype("int32")
        out["text_tool_ratio"] = text_len / (tool_len_arr + 1)

        # ---- growth tier 4a: bounded frames ----
        out["gap_roll_min_5"] = (
            pd.Series(gap_s_arr).rolling(5, min_periods=1).min().to_numpy()
        )
        out["gap_roll_min_10"] = (
            pd.Series(gap_s_arr).rolling(10, min_periods=1).min().to_numpy()
        )
        out["gap_roll_range_5"] = (
            np.asarray(out["gap_roll_max_5"]) - np.asarray(out["gap_roll_min_5"])
        )
        for kk in (2, 3):
            dd = (ts_us - np.roll(ts_us, kk)).astype(np.float64) / 1e6
            dd[:kk] = np.nan
            out[f"lag{kk}_ts_gap_s"] = dd
        for kk in (6, 7):
            d = text_len.astype(np.float64) - np.roll(text_len, kk).astype(np.float64)
            d[:kk] = np.nan
            out[f"lag{kk}_text_len_delta"] = d
        lo900 = np.searchsorted(ts_us, ts_us - 900 * 1_000_000, side="left")
        out["rate_900s"] = (hi300 - lo900).astype(np.float64)
        out["text_sum_900s"] = (ps[hi300] - ps[lo900]).astype("int64")
        lo60 = np.searchsorted(ts_us, ts_us - 60 * 1_000_000, side="left")
        out["text_sum_60s"] = (ps[hi300] - ps[lo60]).astype("int64")
        lo10 = np.maximum(idx - 9, 0)
        cnt10 = np.minimum(idx + 1, 10)
        ia = (g["role"].to_numpy() == "assistant").astype(np.int64)
        cs_a = np.concatenate([[0], np.cumsum(ia)])
        out["roll_assistant_rate_10"] = (cs_a[idx + 1] - cs_a[lo10]) / cnt10
        cs_t = np.concatenate([[0], np.cumsum(tool_set.astype(np.int64))])
        out["roll_tool_rate_10"] = (cs_t[idx + 1] - cs_t[lo10]) / cnt10
        rc = np.asarray(out["role_changed"]).astype(np.int64)
        cs_rc = np.concatenate([[0], np.cumsum(rc)])
        out["roll_role_changes_10"] = (cs_rc[idx + 1] - cs_rc[lo10]).astype("int64")
        out["roll_range_text_len_10"] = (
            np.asarray(out["roll_max_text_len_10"])
            - np.asarray(out["roll_min_text_len_10"])
        )
        out["roll_range_text_len_20"] = (
            np.asarray(out["roll_max_text_len_20"])
            - np.asarray(out["roll_min_text_len_20"])
        )
        w20m = s.rolling(20, min_periods=1).mean().to_numpy()
        w20m2 = (s * s).rolling(20, min_periods=1).mean().to_numpy()
        out["roll_std_text_len_20"] = np.sqrt(np.maximum(0.0, w20m2 - w20m * w20m))
        with np.errstate(invalid="ignore", divide="ignore"):
            out["zscore_roll_text_len_10"] = np.where(
                w10m2 - w10m * w10m > 0,
                (text_len - w10m)
                / np.sqrt(np.where(w10m2 - w10m * w10m > 0, w10m2 - w10m * w10m, 1.0)),
                0.0,
            )
        # wing integral (4 trailing trapezoids, gap floored to whole ms,
        # capped at 3600 s) and 5-row wing asymmetry — exact int sums
        prev_len = np.roll(text_len, 1)
        gap_valid = ~np.isnan(gap_s_arr)
        gms_cap = np.minimum(gap_us, 3_600_000_000) // 1000
        trap_w = np.where(gap_valid, (text_len + prev_len) * gms_cap, 0)
        cs_tw = np.concatenate([[0], np.cumsum(trap_w)])
        cs_twv = np.concatenate([[0], np.cumsum(gap_valid.astype(np.int64))])
        lo4 = np.maximum(idx - 3, 0)
        cntv = cs_twv[idx + 1] - cs_twv[lo4]
        out["wing_auc_4"] = np.where(
            cntv > 0, (cs_tw[idx + 1] - cs_tw[lo4]) / 2000.0, np.nan
        )
        sA = ps[idx + 1] - ps[np.maximum(idx - 1, 0)]
        sB = ps[np.maximum(idx - 2, 0)] - ps[np.maximum(idx - 4, 0)]
        out["wing_asym_5"] = np.where(idx >= 3, (sA - sB).astype(np.float64), np.nan)

        # ---- growth tier 4b: running + session-scoped ----
        out["conv_first_text_len"] = np.full(len(g), text_len[0], dtype="int32")
        out["text_len_vs_first"] = (text_len - text_len[0]).astype("int32")
        out["cum_role_changes"] = np.cumsum(rc).astype("int64")
        out["cum_empty_text"] = np.cumsum(text_len == 0).astype("int64")
        out["cum_long_text"] = np.cumsum(text_len > 500).astype("int64")
        out["is_session_start"] = (turn_in_session == 1).astype("int32")
        out["run_std_text_len"] = np.sqrt(np.maximum(0.0, var_run))
        sid_s = pd.Series(session_id)
        tl_s = pd.Series(text_len)
        smax_a = tl_s.groupby(sid_s).cummax().to_numpy().astype("int32")
        smin_a = tl_s.groupby(sid_s).cummin().to_numpy().astype("int32")
        out["sess_max_text_len"] = smax_a
        out["sess_min_text_len"] = smin_a
        out["sess_depth_text_len"] = (smax_a - smin_a).astype("int32")
        m_sess = (~sb) & gap_valid
        out["sess_gap_max_s"] = (
            pd.Series(np.where(m_sess, gap_s_arr, np.nan))
            .groupby(sid_s)
            .cummax()
            .to_numpy()
        )
        sess_tlen2 = (tl_s * tl_s).groupby(sid_s).cumsum().to_numpy().astype("int64")
        sess_mean = sess_cum.astype(np.float64) / turn_in_session
        out["sess_std_text_len"] = np.sqrt(
            np.maximum(0.0, sess_tlen2 / turn_in_session - sess_mean * sess_mean)
        )
        gms = gap_us // 1000
        trap_s_arr = np.where(m_sess, (text_len + prev_len) * gms, 0)
        cs_sess = pd.Series(trap_s_arr).groupby(sid_s).cumsum().to_numpy()
        cnt_sess = pd.Series(m_sess.astype(np.int64)).groupby(sid_s).cumsum().to_numpy()
        out["sess_auc_trapezoid"] = np.where(cnt_sess > 0, cs_sess / 2000.0, np.nan)
        out["sess_start_hour"] = (
            pd.DatetimeIndex(pd.to_datetime(start, unit="us")).hour.to_numpy().astype("int32")
        )

    if include_labels:
        lead_len = np.roll(text_len, -1).astype(np.float64)
        lead_len[-1] = np.nan
        lead_gap = np.roll(gap_us, -1).astype(np.float64) / 1e6
        lead_gap[-1] = np.nan
        out["label_lead1_text_len"] = lead_len
        out["label_lead1_ts_gap_s"] = lead_gap
    return pd.DataFrame(out)


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

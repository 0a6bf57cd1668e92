"""Per-entity NumPy kernels behind ``applyInPandas`` — the operators
that genuinely need array math (SURVEY §2.5 W3/W6: Savitzky-Golay
smoothing, src/pipeline/feature_engineering.py:726-737,1277-1280, and
Gaussian profile fitting, :435-441,1283-1291).

No SciPy in this container, so both kernels are implemented from the
underlying linear algebra (savgol = sliding local least-squares
polynomial; gaussian fit = moment method), NumPy-only. The kernel
functions double as their own oracle: tests run them per-group in plain
pandas and compare with the distributed output.

Worker-init pattern: coefficient matrices are computed once per
(window, polyorder) via ``functools.lru_cache`` at module level — the
graft of the reference's ``_init_cpu_worker`` once-per-process init
(src/pipeline/processing.py:124-143).
"""

from __future__ import annotations

from functools import lru_cache

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame


@lru_cache(maxsize=32)
def savgol_coeffs(window: int, polyorder: int) -> np.ndarray:
    """Least-squares smoothing coefficients for the window centre:
    row 0 of pinv(Vandermonde) — what scipy.signal.savgol_coeffs
    computes, derived directly here."""
    if window % 2 != 1 or polyorder >= window:
        raise ValueError("window must be odd and > polyorder")
    half = window // 2
    x = np.arange(-half, half + 1, dtype=np.float64)
    a = np.vander(x, polyorder + 1, increasing=True)
    return np.linalg.pinv(a)[0]


def savgol_smooth(y: np.ndarray, window: int = 5, polyorder: int = 2) -> np.ndarray:
    """Savitzky-Golay smoothing; short series fall back to a global
    polynomial fit; edges use the local polynomial evaluated off-centre
    (scipy's mode='interp' semantics)."""
    n = len(y)
    if n == 0:
        return y.astype(np.float64)
    if n < window:
        deg = min(polyorder, n - 1)
        c = np.polyfit(np.arange(n), y, deg)
        return np.polyval(c, np.arange(n))
    out = np.convolve(y, savgol_coeffs(window, polyorder)[::-1], mode="same")
    half = window // 2
    xw = np.arange(window, dtype=np.float64)
    head = np.polyfit(xw, y[:window], polyorder)
    tail = np.polyfit(xw, y[-window:], polyorder)
    out[:half] = np.polyval(head, np.arange(half))
    out[-half:] = np.polyval(tail, np.arange(window - half, window))
    return out


def gaussian_profile_features(t: np.ndarray, y: np.ndarray) -> dict[str, float]:
    """Moment-method Gaussian fit of an activity profile y(t):
    amplitude/centre/sigma/FWHM — deterministic, optimizer-free."""
    if len(t) == 0 or y.sum() <= 0:
        return {"amp": np.nan, "mu": np.nan, "sigma": np.nan, "fwhm": np.nan}
    w = np.clip(y, 0, None).astype(np.float64)
    tot = w.sum()
    mu = float((t * w).sum() / tot)
    var = float(((t - mu) ** 2 * w).sum() / tot)
    sigma = float(np.sqrt(var))
    amp = float(w.max())
    return {
        "amp": amp,
        "mu": mu,
        "sigma": sigma,
        "fwhm": 2.0 * np.sqrt(2.0 * np.log(2.0)) * sigma,
    }


SMOOTH_SCHEMA = (
    "conv_id string, turn_idx int, ts timestamp, text_len int, "
    "text_len_smooth double, text_len_resid double"
)


def smooth_kernel(pdf: pd.DataFrame, window: int = 5, polyorder: int = 2) -> pd.DataFrame:
    g = pdf.sort_values(["ts", "turn_idx"], kind="mergesort").reset_index(drop=True)
    y = g["text"].fillna("").str.len().to_numpy(np.float64)
    sm = savgol_smooth(y, window, polyorder)
    return pd.DataFrame(
        {
            "conv_id": g["conv_id"],
            "turn_idx": g["turn_idx"].astype("int32"),
            "ts": g["ts"],
            "text_len": y.astype("int32"),
            "text_len_smooth": sm,
            "text_len_resid": y - sm,
        }
    )


def smooth_text_len(df: DataFrame, window: int = 5, polyorder: int = 2) -> DataFrame:
    """Per-conversation smoothed text-length trajectory (W3 analog)."""
    return df.groupBy("conv_id").applyInPandas(
        lambda pdf: smooth_kernel(pdf, window, polyorder), schema=SMOOTH_SCHEMA
    )


PROFILE_SCHEMA = (
    "conv_id string, session_id int, n_turns long, amp double, mu_s double, "
    "sigma_s double, fwhm_s double"
)


def profile_kernel(pdf: pd.DataFrame) -> pd.DataFrame:
    g = pdf.sort_values(["ts", "turn_idx"], kind="mergesort")
    t0 = g["ts"].iloc[0]
    t = (g["ts"] - t0).dt.total_seconds().to_numpy(np.float64)
    y = g["text"].fillna("").str.len().to_numpy(np.float64)
    f = gaussian_profile_features(t, y)
    return pd.DataFrame(
        [
            {
                "conv_id": g["conv_id"].iloc[0],
                "session_id": int(g["session_id"].iloc[0]),
                "n_turns": len(g),
                "amp": f["amp"],
                "mu_s": f["mu"],
                "sigma_s": f["sigma"],
                "fwhm_s": f["fwhm"],
            }
        ]
    )


def session_profiles(df_with_sessions: DataFrame) -> DataFrame:
    """Per-(conv, session) Gaussian activity-profile features (W6
    analog: line-profile FWHM per detected feature window)."""
    return df_with_sessions.groupBy("conv_id", "session_id").applyInPandas(
        profile_kernel, schema=PROFILE_SCHEMA
    )

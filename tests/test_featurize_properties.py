"""Property-based anchoring of the featurize oracle (hypothesis).

``test_asof_properties`` pins the as-of oracle to a brute-force
definition; this file does the same for the feature battery, closing
the verification chain at first principles:

    brute force ⇐ pandas oracle ⇐ featurize_expr ⇐ grouped / salted

(the right-hand links are covered by ``test_featurize_oracle`` and
``test_degenerate_shapes`` on fixed frames; this pins the leftmost).

The per-row brute-force definitions, over rows of one conversation
sorted by (ts, turn_idx):

    lag1_ts_gap_s[i]      = NaN if i==0 else (ts[i]-ts[i-1]) seconds
    lag1_text_len_delta[i]= NaN if i==0 else len(text[i])-len(text[i-1])
    session_id[i]         = #{ j<=i : j>0 and gap[j] >  gap_s }  (strict)
    turn_in_session[i]    = i - start(current session) + 1
    cum_count_R[i]        = #{ j<=i : role[j] == R }             (inclusive)
    rate_W[i]             = #{ j    : ts[i]-W <= ts[j] <= ts[i] }  (whole
                            conv — same-ts rows count regardless of idx)
    roll_mean_text_len_5  = mean(text_len[max(0,i-4)..i])
    tool_backfill[i]      = last non-null tool at j<=i ("" counts)

A tiny offset universe with gap_s=7 and rate_window_s=5 makes exact
boundary hits (gap == gap_s, window edge == ts) frequent.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
from hypothesis import given, settings, strategies as st

from astrospectro_spark.oracle.pandas_oracle import featurize_pdf

TS0 = pd.Timestamp("2025-01-01")
GAP_S = 7.0
RATE_W = 5


def brute_force(g: pd.DataFrame) -> dict[str, list]:
    g = g.sort_values(["ts", "turn_idx"], kind="mergesort").reset_index(drop=True)
    n = len(g)
    ts = [t.timestamp() for t in g["ts"]]
    tlen = [len(t) if isinstance(t, str) else 0 for t in g["text"]]
    out: dict[str, list] = {k: [] for k in (
        "lag1_ts_gap_s", "lag1_text_len_delta", "session_id",
        "turn_in_session", "cum_count_user", "cum_count_tool",
        "rate", "roll_mean", "tool_backfill",
    )}
    sess, sess_start = 0, 0
    for i in range(n):
        gap = math.nan if i == 0 else ts[i] - ts[i - 1]
        if i > 0 and gap > GAP_S:
            sess, sess_start = sess + 1, i
        out["lag1_ts_gap_s"].append(gap)
        out["lag1_text_len_delta"].append(
            math.nan if i == 0 else float(tlen[i] - tlen[i - 1])
        )
        out["session_id"].append(sess)
        out["turn_in_session"].append(i - sess_start + 1)
        out["cum_count_user"].append(
            sum(1 for j in range(i + 1) if g["role"][j] == "user")
        )
        out["cum_count_tool"].append(
            sum(1 for j in range(i + 1) if g["role"][j] == "tool")
        )
        out["rate"].append(
            float(sum(1 for j in range(n) if ts[i] - RATE_W <= ts[j] <= ts[i]))
        )
        lo = max(0, i - 4)
        out["roll_mean"].append(sum(tlen[lo : i + 1]) / (i + 1 - lo))
        bf = None
        for j in range(i, -1, -1):
            if g["tool"][j] is not None and not pd.isna(g["tool"][j]):
                bf = g["tool"][j]
                break
        out["tool_backfill"].append(bf)
    return out


@st.composite
def conversation(draw):
    n = draw(st.integers(1, 25))
    # offsets in whole+half seconds over a span of ~5 gap windows:
    # exact gap_s boundaries and rate-window edges occur constantly
    offs = draw(st.lists(
        st.sampled_from([x * 0.5 for x in range(0, 80)]),
        min_size=n, max_size=n,
    ))
    roles = draw(st.lists(
        st.sampled_from(["user", "assistant", "system", "tool"]),
        min_size=n, max_size=n,
    ))
    texts = draw(st.lists(
        st.sampled_from(["", "a", "bb", "ccc", "héllo\nworld", "    "]),
        min_size=n, max_size=n,
    ))
    tools = draw(st.lists(
        st.sampled_from([None, "", "exec", "search"]),
        min_size=n, max_size=n,
    ))
    return pd.DataFrame(
        {
            "conv_id": pd.array(["p"] * n, dtype="string"),
            "turn_idx": np.arange(n, dtype=np.int32),
            "role": pd.array(roles, dtype="string"),
            "text": pd.array(texts, dtype="string"),
            "tool": pd.array(tools, dtype="string"),
            "ts": [TS0 + pd.Timedelta(seconds=o) for o in offs],
        }
    )


@given(conversation())
@settings(max_examples=300, deadline=None)
def test_oracle_features_equal_brute_force(g):
    got = featurize_pdf(g, gap_s=GAP_S, rate_window_s=RATE_W)
    want = brute_force(g)

    def close(a, b):
        return np.allclose(
            np.asarray(a, dtype=float), np.asarray(b, dtype=float),
            rtol=1e-12, atol=1e-12, equal_nan=True,
        )

    assert close(got["lag1_ts_gap_s"], want["lag1_ts_gap_s"])
    assert close(got["lag1_text_len_delta"], want["lag1_text_len_delta"])
    assert got["session_id"].tolist() == want["session_id"]
    assert got["turn_in_session"].tolist() == want["turn_in_session"]
    assert got["cum_count_user"].tolist() == want["cum_count_user"]
    assert got["cum_count_tool"].tolist() == want["cum_count_tool"]
    assert close(got["rate_60s"], want["rate"])
    assert close(got["roll_mean_text_len_5"], want["roll_mean"])
    bf = got["tool_backfill"].astype(object).where(got["tool_backfill"].notna(), None)
    assert bf.tolist() == want["tool_backfill"]


@given(conversation())
@settings(max_examples=100, deadline=None)
def test_oracle_is_input_order_invariant(g):
    """Any input permutation yields identical features (late / out-of-
    order data is handled by sorting — SURVEY.md §2.9)."""
    a = featurize_pdf(g, gap_s=GAP_S, rate_window_s=RATE_W)
    b = featurize_pdf(
        g.sample(frac=1.0, random_state=3).reset_index(drop=True),
        gap_s=GAP_S, rate_window_s=RATE_W,
    )
    pd.testing.assert_frame_equal(
        a.reset_index(drop=True), b.reset_index(drop=True)
    )

"""Property-based tests of the as-of oracle semantics (hypothesis).

The Spark engines are tested against ``oracle_asof`` elsewhere; here the
oracle itself is pinned against a brute-force definition so the whole
chain (brute force ⇐ pandas oracle ⇐ window as-of ⇐ cogrouped as-of)
is anchored to first principles:

    asof(anchor) = the row with the greatest (ts, turn_idx) among
                   rows with ts <= anchor_ts (same conv), or NULL;
    with tolerance: NULL if anchor_ts - ts > tolerance_s.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from hypothesis import given, settings, strategies as st

from astrospectro_spark.oracle.pandas_oracle import oracle_asof

TS0 = pd.Timestamp("2025-01-01")


def brute_force(turns: pd.DataFrame, anchors: pd.DataFrame) -> list[int | None]:
    out = []
    for a in anchors.itertuples():
        cand = turns[(turns.conv_id == a.conv_id) & (turns.ts <= a.anchor_ts)]
        if len(cand) == 0:
            out.append(None)
            continue
        best = cand.sort_values(["ts", "turn_idx"], kind="mergesort").iloc[-1]
        gap = (a.anchor_ts - best.ts).total_seconds()
        out.append(None if gap > a.tolerance_s else int(best.turn_idx))
    return out


@st.composite
def asof_case(draw):
    n_turns = draw(st.integers(1, 30))
    n_anchors = draw(st.integers(1, 10))
    # small offset universe → frequent ties and boundary collisions
    t_off = draw(st.lists(st.integers(0, 40), min_size=n_turns, max_size=n_turns))
    a_off = draw(st.lists(st.integers(-5, 45), min_size=n_anchors, max_size=n_anchors))
    tol = draw(st.lists(st.integers(0, 20), min_size=n_anchors, max_size=n_anchors))
    convs = draw(st.lists(st.sampled_from(["a", "b"]), min_size=n_turns, max_size=n_turns))
    a_convs = draw(
        st.lists(st.sampled_from(["a", "b", "missing"]), min_size=n_anchors, max_size=n_anchors)
    )
    turns = pd.DataFrame(
        {
            "conv_id": convs,
            "turn_idx": np.arange(n_turns, dtype=np.int32),
            "role": "user",
            "text": "x",
            "tool": None,
            "ts": [TS0 + pd.Timedelta(seconds=o) for o in t_off],
        }
    )
    anchors = pd.DataFrame(
        {
            "conv_id": a_convs,
            "anchor_id": np.arange(n_anchors, dtype=np.int64),
            "anchor_ts": [TS0 + pd.Timedelta(seconds=o) for o in a_off],
            "tolerance_s": np.array(tol, dtype=np.int32),
        }
    )
    return turns, anchors


@given(asof_case())
@settings(max_examples=300, deadline=None)
def test_oracle_asof_equals_brute_force(case):
    turns, anchors = case
    got = oracle_asof(turns, anchors, tolerance_col="tolerance_s")
    got = got.sort_values("anchor_id").reset_index(drop=True)
    want = brute_force(turns, anchors)
    got_idx = [None if pd.isna(v) else int(v) for v in got["asof_turn_idx"]]
    assert got_idx == want


@given(asof_case())
@settings(max_examples=100, deadline=None)
def test_oracle_asof_boundary_inclusive(case):
    """An anchor exactly at a turn's ts must match that turn (or a
    same-ts turn with larger turn_idx) when tolerance permits."""
    turns, anchors = case
    anchors = anchors.copy()
    anchors["anchor_ts"] = turns["ts"].iloc[0]
    anchors["conv_id"] = turns["conv_id"].iloc[0]
    anchors["tolerance_s"] = np.int32(10**6)
    got = oracle_asof(turns, anchors, tolerance_col="tolerance_s")
    sub = turns[(turns.conv_id == turns.conv_id.iloc[0]) & (turns.ts <= turns.ts.iloc[0])]
    expect = (
        sub.sort_values(["ts", "turn_idx"], kind="mergesort")["turn_idx"].iloc[-1]
    )
    assert (got["asof_turn_idx"] == expect).all()

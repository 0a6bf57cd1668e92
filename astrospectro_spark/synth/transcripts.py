"""Deterministic synthetic transcript tables (seed 42) per FIXTURES.md.

The transcripts table is the graft analogue of the reference's corpus of
FITS spectra: one conversation = one spectrum, one turn = one pixel on
the ordered wavelength grid (reference: src/pipeline/preprocessor.py:46-71).
Everything is generated with ``numpy.random.Generator(PCG64(seed))`` —
same seed, same bytes, every run, any machine.

Tables
------
transcripts(conv_id string, turn_idx int32, role string, text string,
            tool string nullable, ts timestamp[us])
anchors(conv_id string, anchor_id int64, anchor_ts timestamp[us],
        tolerance_s int32)
ref_events(event_name string, role string, tool string nullable)

Required structure (FIXTURES.md §1):
- Zipf-ish conversation lengths; ONE mega-conversation holding ~30% of
  all turns at every scale (skew fixture for salted partitioning).
- session gaps > 30 min in ~40% of conversations.
- ~1% adjacent duplicate-ts pairs (turn_idx tiebreak exercise).
- edge cases: single-turn convs, all-NULL tool conv, zero-length text,
  unicode + newlines + pipes in text, a conversation spanning a UTC day
  boundary, duplicate-ts pair whose turn_idx order is the only order.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd

SEED = 42
SESSION_GAP_S = 1800.0
ROLES = ["user", "assistant", "system", "tool"]
TOOL_VOCAB = [
    "search",
    "calculator",
    "code_exec",
    "browser",
    "file_read",
    "file_write",
    "sql",
    "weather",
    "email",
    "calendar",
    "translate",
    "image_gen",
]
# unicode / newline / pipe fragments per the per-turn text-equality
# invariant (the reference has unicode feature names, e.g. Hα —
# reference: src/pipeline/feature_engineering.py:179 — and writes
# pipe-delimited CSV: src/tools/generate_catalog_from_fits.py:385;
# our engine must be delimiter-insensitive).
_WORDS = (
    "the quick brown fox jumps over lazy dog alpha beta gamma delta "
    "Hα Hβ λ4861 naïve café über 模型 データ résumé | pipe||field "
    "line1\nline2 tab\there σ=2.5 10^4 spectral flux wavelength "
    "analysis feature vector session turn token"
).split(" ")

SCALES = {
    "sf0.001": {"n_convs": 200, "total_turns": 6_000},
    "sf0.01": {"n_convs": 1_500, "total_turns": 60_000},
    "sf0.1": {"n_convs": 10_000, "total_turns": 600_000},
    # scaling-efficiency runs (compute must dominate fixed overhead)
    "sf1": {"n_convs": 50_000, "total_turns": 6_000_000},
    "sf3": {"n_convs": 150_000, "total_turns": 18_000_000},
}

_T0 = np.datetime64("2025-01-01T00:00:00", "us")
_YEAR_US = 365 * 86_400 * 1_000_000


def _conv_lengths(rng: np.random.Generator, n_convs: int, total_turns: int) -> np.ndarray:
    """Zipf-distributed lengths; conv 0 is the mega-conversation (~30%)."""
    mega = int(round(total_turns * 0.30))
    rest_total = total_turns - mega
    raw = rng.zipf(1.6, size=n_convs - 1).astype(np.float64)
    raw = np.minimum(raw, 500.0)
    lengths = np.maximum(1, np.round(raw * rest_total / raw.sum()).astype(np.int64))
    # exact-total trim/pad on the largest non-mega convs
    diff = rest_total - int(lengths.sum())
    order = np.argsort(-lengths)
    i = 0
    while diff != 0:
        j = order[i % len(order)]
        step = 1 if diff > 0 else -1
        if lengths[j] + step >= 1:
            lengths[j] += step
            diff -= step
        i += 1
    # edge cases: force some single-turn conversations
    singles = order[-max(3, n_convs // 50) :]
    for j in singles:
        diff2 = lengths[j] - 1
        lengths[j] = 1
        lengths[order[0]] += diff2
    return np.concatenate([[mega], lengths])


def _gen_text(rng: np.random.Generator, n: int) -> list[str]:
    """Variable-length pseudo-text, log-normal 0–2000 chars; ~3% empty.

    Vectorised: texts are random slices of one shared deterministic
    word stream (a per-text word loop would be O(total chars) Python
    iterations — minutes at the 6M-turn scale)."""
    target_len = np.exp(rng.normal(4.0, 1.2, size=n)).clip(0, 2000).astype(np.int64)
    target_len[rng.random(n) < 0.03] = 0
    widx = rng.integers(0, len(_WORDS), size=500_000)
    stream = " ".join(_WORDS[i] for i in widx)
    starts = rng.integers(0, max(1, len(stream) - 2001), size=n)
    return [
        stream[s : s + tl] if tl > 0 else ""
        for s, tl in zip(starts.tolist(), target_len.tolist())
    ]


def generate_transcripts(scale: str = "sf0.01", seed: int = SEED) -> pd.DataFrame:
    cfg = SCALES[scale]
    n_convs, total = cfg["n_convs"], cfg["total_turns"]
    rng = np.random.default_rng(seed)
    lengths = _conv_lengths(rng, n_convs, total)
    n = int(lengths.sum())

    conv_ord = np.repeat(np.arange(n_convs), lengths)
    conv_id = np.array([f"conv-{i:08d}" for i in range(n_convs)])[conv_ord]
    turn_idx = np.concatenate([np.arange(l, dtype=np.int64) for l in lengths])

    # --- timestamps: per-conv start + lognormal gaps (median ~20 s),
    # session gaps >30 min injected in ~40% of conversations.
    start_us = rng.integers(0, _YEAR_US, size=n_convs)
    # force conv 1 to span a UTC day boundary (edge case)
    if n_convs > 1:
        start_us[1] = 86_400 * 1_000_000 - 60 * 1_000_000  # 23:59:00 day 1
    gaps_s = np.exp(rng.normal(np.log(20.0), 1.0, size=n))
    has_session_gap = rng.random(n_convs) < 0.40
    big = (rng.random(n) < 0.02) & has_session_gap[conv_ord]
    gaps_s = np.where(big, 1800.0 + rng.exponential(3600.0, size=n), gaps_s)
    gaps_us = np.round(gaps_s * 1e6).astype(np.int64)
    gaps_us[turn_idx == 0] = 0
    # ~1% adjacent duplicate-ts pairs (gap 0) to exercise the turn_idx tiebreak
    dup = (rng.random(n) < 0.01) & (turn_idx > 0)
    gaps_us[dup] = 0
    ts_us = start_us[conv_ord] + _cumsum_per_conv(gaps_us, conv_ord)
    ts = _T0 + ts_us.astype("timedelta64[us]")

    # --- roles: system only at turn 0 (~80% of convs); user/assistant
    # alternating with ~10% repeats; ~6% tool turns.
    has_system = rng.random(n_convs) < 0.80
    role = np.where(turn_idx % 2 == (~has_system[conv_ord]).astype(int), "assistant", "user")
    role = role.astype(object)
    repeat = rng.random(n) < 0.10
    role[repeat & (turn_idx > 0)] = np.roll(role, 1)[repeat & (turn_idx > 0)]
    role[rng.random(n) < 0.06] = "tool"
    role[(turn_idx == 0) & has_system[conv_ord]] = "system"

    # --- tool: NULL ~85%; non-null mostly on assistant/tool roles.
    tool = np.full(n, None, dtype=object)
    eligible = np.isin(role, ["assistant", "tool"])
    pick = eligible & (rng.random(n) < 0.45)
    tool_idx = rng.integers(0, len(TOOL_VOCAB), size=n)
    tool[pick] = np.array(TOOL_VOCAB, dtype=object)[tool_idx[pick]]
    # edge case: conv 2 all-NULL tool
    if n_convs > 2:
        tool[conv_ord == 2] = None

    text = _gen_text(rng, n)

    df = pd.DataFrame(
        {
            "conv_id": conv_id,
            "turn_idx": turn_idx.astype(np.int32),
            "role": pd.array(role, dtype="string"),
            "text": pd.array(text, dtype="string"),
            "tool": pd.array(tool, dtype="string"),
            "ts": ts,
        }
    )
    df["conv_id"] = df["conv_id"].astype("string")
    # shuffle row order globally: the engine must NOT rely on input order
    # (late/out-of-order data handled by sorting, SURVEY.md §2.9)
    perm = rng.permutation(n)
    return df.iloc[perm].reset_index(drop=True)


def _cumsum_per_conv(vals: np.ndarray, conv_ord: np.ndarray) -> np.ndarray:
    """Inclusive cumulative sum restarting at each conversation boundary
    (rows are contiguous per conversation at generation time)."""
    cs = np.cumsum(vals)
    first_idx = np.where(np.r_[True, conv_ord[1:] != conv_ord[:-1]])[0]
    group_sizes = np.diff(np.append(first_idx, len(vals)))
    offsets = np.repeat(cs[first_idx] - vals[first_idx], group_sizes)
    return cs - offsets


def generate_anchors(
    transcripts: pd.DataFrame, n_anchors: int | None = None, seed: int = SEED + 1
) -> pd.DataFrame:
    """As-of probe table (FIXTURES.md §2): exact-ts, between-turn,
    before-first and after-last anchors, plus ~5% unmatched conv_ids."""
    rng = np.random.default_rng(seed)
    n_anchors = n_anchors or max(50, len(transcripts) // 20)
    # vectorised: sample row indices, then derive the four anchor kinds
    # from each sampled row's conversation bounds.
    idx = rng.integers(0, len(transcripts), size=n_anchors)
    pick = transcripts.iloc[idx]
    pick_conv = pick["conv_id"].to_numpy()
    exact_us = pick["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
    g = transcripts.groupby("conv_id")["ts"]
    tmin = g.min().astype("datetime64[us]").astype(np.int64)
    tmax = g.max().astype("datetime64[us]").astype(np.int64)
    lo = tmin.loc[pick_conv].to_numpy()
    hi = tmax.loc[pick_conv].to_numpy()
    kind = rng.integers(0, 4, size=n_anchors)
    frac = rng.random(n_anchors)
    off = rng.integers(1, 3600, size=n_anchors) * 1_000_000
    ts_us = np.select(
        [kind == 0, kind == 1, kind == 2],
        [exact_us, lo + ((hi - lo) * frac).astype(np.int64), lo - off],
        default=hi + off,
    )
    df = pd.DataFrame(
        {
            "conv_id": pd.array(pick_conv, dtype="string"),
            "anchor_id": np.arange(n_anchors, dtype=np.int64),
            "anchor_ts": pd.Series(ts_us.astype("datetime64[us]")),
            "tolerance_s": rng.integers(30, 7200, size=n_anchors).astype(np.int32),
        }
    )
    # ~5% unmatched conv_ids → NULL feature rows (reference: unmatched
    # objid rows, src/tools/gaia_crossmatcher.py:808-809)
    n_unmatched = max(2, n_anchors // 20)
    unmatched = pd.DataFrame(
        {
            "conv_id": pd.array([f"conv-miss-{i:04d}" for i in range(n_unmatched)], dtype="string"),
            "anchor_id": np.arange(n_anchors, n_anchors + n_unmatched, dtype=np.int64),
            "anchor_ts": pd.Series([_T0 + np.timedelta64(i, "h") for i in range(n_unmatched)]).astype(
                "datetime64[us]"
            ),
            "tolerance_s": np.full(n_unmatched, 3600, dtype=np.int32),
        }
    )
    return pd.concat([df, unmatched], ignore_index=True)


def generate_ref_events() -> pd.DataFrame:
    """Small broadcast dimension (≙ the 6-row target_lines table,
    reference: src/pipeline/peak_detector.py:79-89)."""
    rows = [
        ("handoff", "assistant", None),
        ("escalation", "user", None),
        ("tool_call", "assistant", "search"),
        ("tool_result", "tool", "search"),
        ("code_run", "assistant", "code_exec"),
        ("sql_query", "assistant", "sql"),
        ("system_boot", "system", None),
        ("email_send", "assistant", "email"),
    ]
    return pd.DataFrame(rows, columns=["event_name", "role", "tool"]).astype(
        {"event_name": "string", "role": "string", "tool": "string"}
    )


def write_scale(out_dir: str, scale: str = "sf0.01", seed: int = SEED) -> dict[str, str]:
    """Write all three tables for a scale as parquet; returns paths."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    os.makedirs(out_dir, exist_ok=True)
    tr = generate_transcripts(scale, seed)
    an = generate_anchors(tr)
    re_ = generate_ref_events()
    paths = {}
    for name, df in [("transcripts", tr), ("anchors", an), ("ref_events", re_)]:
        p = os.path.join(out_dir, f"{name}.parquet")
        # small row groups: Spark's scan parallelism on a single parquet
        # file is bounded by row-group count — 1M-row defaults cap a 6M-row
        # table at ~6 scan tasks and serialise the whole pipeline on
        # decode. 100k-row groups give 60-way splittable scans.
        pq.write_table(
            pa.Table.from_pandas(df, preserve_index=False), p, row_group_size=100_000
        )
        paths[name] = p
    return paths


if __name__ == "__main__":
    import sys

    scale = sys.argv[1] if len(sys.argv) > 1 else "sf0.01"
    out = sys.argv[2] if len(sys.argv) > 2 else f"/tmp/astrospectro_synth/{scale}"
    print(write_scale(out, scale))

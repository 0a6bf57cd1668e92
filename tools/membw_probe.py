"""Memory-bandwidth ceiling probe (scaling-efficiency forensics).

The 2v8 scaling pair has repeatedly measured ~0.66-0.70 efficiency
while the 1v4 primary pair holds >= 0.8. The working attribution is a
shared-memory-bus term: 8 shuffle-heavy threads saturate a bandwidth
ceiling that 2 threads do not touch. This probe quantifies that
ceiling: per-process streaming copy bandwidth (numpy memcpy over a
256 MiB working set, far larger than LLC) at 1, 2, 4, 8 concurrent
pinned processes. If aggregate bandwidth stops scaling between 2 and 8
processes, an 8-thread Spark job is bus-bound and sub-linear scaling
is a host property, not a plan property.

Usage: python tools/membw_probe.py  →  one JSON line.
"""

from __future__ import annotations

import json
import multiprocessing as mp
import os
import time

N_BYTES = 256 * 1024 * 1024
REPS = 5


def _worker(core: int, q: "mp.Queue") -> None:
    os.sched_setaffinity(0, {core})
    import numpy as np

    src = np.ones(N_BYTES // 8, dtype=np.float64)
    dst = np.empty_like(src)
    best = float("inf")
    for _ in range(REPS):
        t0 = time.perf_counter()
        np.copyto(dst, src)
        best = min(best, time.perf_counter() - t0)
    # copy reads + writes the working set once each
    q.put(2 * N_BYTES / best / 1e9)


def measure(n_procs: int) -> dict:
    q: "mp.Queue" = mp.Queue()
    procs = [mp.Process(target=_worker, args=(i, q)) for i in range(n_procs)]
    for p in procs:
        p.start()
    per = [q.get() for _ in procs]
    for p in procs:
        p.join()
    return {
        "n_procs": n_procs,
        "aggregate_gb_s": round(sum(per), 2),
        "per_proc_gb_s": [round(x, 2) for x in sorted(per)],
    }


def main() -> None:
    out = [measure(n) for n in (1, 2, 4, 8)]
    agg = {r["n_procs"]: r["aggregate_gb_s"] for r in out}
    print(
        json.dumps(
            {
                "probe": "streaming_copy_bandwidth",
                "working_set_bytes": N_BYTES,
                "levels": out,
                "scale_2_to_8": round(agg[8] / agg[2], 3),
                "ideal_2_to_8": 4.0,
            }
        )
    )


if __name__ == "__main__":
    main()

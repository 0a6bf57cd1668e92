"""Curation-funnel scaling probe: same job, two parallelism levels.

Builds a deterministic near-dup-heavy table (sf0.1 documents × 20
variants → 100k docs, ~39/40 duplicate) so the LSH band join and the
exact-Jaccard verify carry real pair volume, then times the full
curate funnel at local[N]:

    python tools/curate_scaling.py 2     # one level
    python tools/curate_scaling.py 2 8   # both levels + efficiency

Fresh JVM per level matters for a fair comparison — run levels as
separate invocations (the two-arg form execs itself per level).
"""

from __future__ import annotations

import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SRC = "/tmp/astrospectro_curate_scale/docs.parquet"
REPS = int(os.environ.get("CURATE_SCALE_REPS", "2"))


def _ensure_input(spark) -> None:
    from pyspark.sql import functions as F

    if os.path.exists(os.path.join(SRC, "_SUCCESS")):
        return
    base = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
    big = (
        base.crossJoin(spark.range(20).withColumnRenamed("id", "v"))
        .withColumn("doc_id", F.col("doc_id") * 20 + F.col("v"))
        .withColumn("text", F.concat("text", F.lit(" variant "), F.col("v")))
        .drop("v")
    )
    big.repartition(32).write.mode("overwrite").parquet(SRC)


def run_level(n: int) -> float:
    from astrospectro_spark.jobs.curate_job import FUNNEL_STAGES, curate
    from astrospectro_spark.session import get_spark

    spark = get_spark(
        app_name=f"curate_scale_{n}", master=f"local[{n}]", shuffle_partitions=n
    )
    _ensure_input(spark)
    docs = spark.read.parquet(SRC)
    docs.count()  # warm the JVM / file listing
    best = float("inf")
    for _ in range(REPS):
        t0 = time.perf_counter()
        (
            curate(docs, min_quality=0.3, min_tokens=2)
            .filter("keep")
            .drop(*FUNNEL_STAGES)
            .write.format("noop")
            .mode("overwrite")
            .save()
        )
        best = min(best, time.perf_counter() - t0)
    return best


def main() -> int:
    levels = [int(a) for a in sys.argv[1:]] or [2, 8]
    if len(levels) == 1:
        print(f"RESULT local[{levels[0]}] best {run_level(levels[0]):.2f}s")
        return 0
    times = {}
    for n in levels:  # fresh JVM per level
        out = subprocess.run(
            [sys.executable, __file__, str(n)],
            capture_output=True, text=True, cwd=os.path.dirname(os.path.dirname(__file__)),
        )
        line = [ln for ln in out.stdout.splitlines() if ln.startswith("RESULT")][-1]
        print(line)
        times[n] = float(line.rsplit(" ", 1)[-1].rstrip("s"))
    lo, hi = min(levels), max(levels)
    eff = (times[lo] / times[hi]) / (hi / lo)
    print(f"EFFICIENCY {lo}->{hi}: {eff:.2f}")
    return 0


if __name__ == "__main__":
    sys.exit(main())

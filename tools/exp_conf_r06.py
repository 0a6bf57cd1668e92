"""Config experiment: quantify AQE coalesce minPartitionSize and
windowExec buffer threshold effects on the two wide window queries.

Usage: python tools/exp_conf_r06.py <variant> <query> [reps]
variants: base | part | buf | both
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")
if os.path.isdir("/dev/shm") and os.access("/dev/shm", os.W_OK):
    os.environ.setdefault("SPARK_GRAFT_LOCAL_DIR", "/dev/shm/spark-local")

VARIANTS = {
    "base": {},
    "part": {"spark.sql.adaptive.coalescePartitions.minPartitionSize": "64k"},
    "buf": {"spark.sql.windowExec.buffer.in.memory.threshold": "1048576"},
    "both": {
        "spark.sql.adaptive.coalescePartitions.minPartitionSize": "64k",
        "spark.sql.windowExec.buffer.in.memory.threshold": "1048576",
    },
}


def main() -> None:
    variant, query = sys.argv[1], sys.argv[2]
    reps = int(sys.argv[3]) if len(sys.argv) > 3 else 3

    from astrospectro_spark.engine.windows import featurize_expr
    from astrospectro_spark.queries import q_feature_vector_wide
    from astrospectro_spark.session import get_spark

    spark = get_spark(
        app_name=f"exp_{variant}_{query}",
        master=f"local[{CPUS}]",
        shuffle_partitions=int(CPUS),
        extra_conf=VARIANTS[variant],
    )
    syn = f"/tmp/astrospectro_synth/{os.path.basename(SF_DIR.rstrip('/'))}"
    turns = spark.read.parquet(os.path.join(syn, "transcripts.parquet"))

    def _force(df):
        df.write.format("noop").mode("overwrite").save()

    plan = {
        "featurize_wide": lambda: _force(
            featurize_expr(turns, include_text=False, wide=True)
        ),
        "feature_vector_wide": lambda: _force(q_feature_vector_wide(spark, SF_DIR)),
        "featurize_transcripts": lambda: _force(featurize_expr(turns)),
    }
    thunk = plan[query]
    spark.read.parquet(f"{SF_DIR}/events.parquet").count()
    _force(featurize_expr(turns.limit(1000)))
    walls = []
    for _ in range(reps):
        t0 = time.perf_counter()
        thunk()
        walls.append(round(time.perf_counter() - t0, 3))
    print(f"{variant:>5} {query}: {walls}  min={min(walls)}")


if __name__ == "__main__":
    main()

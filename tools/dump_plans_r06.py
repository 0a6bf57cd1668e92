"""Dump .explain('formatted') for every bench-headline query to
plans/r06/<query>_<tag>.txt  (tag = before/after, argv[1]).

Mirrors bench.py's query construction exactly (same args, same synth
inputs) without timing anything — used for the round-6 optimization
evidence trail. Run: python tools/dump_plans_r06.py before
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")


def main() -> None:
    tag = sys.argv[1] if len(sys.argv) > 1 else "before"
    out_dir = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", "r06")
    os.makedirs(out_dir, exist_ok=True)

    from astrospectro_spark.engine.asof import asof_join
    from astrospectro_spark.engine.skew import featurize_salted
    from astrospectro_spark.engine.windows import featurize_expr
    from astrospectro_spark.jobs.curate_job import FUNNEL_STAGES, curate
    from astrospectro_spark.queries import (
        q_broadcast_enrich,
        q_feature_vector_wide,
        q_pricing_summary,
        q_session_stats,
    )
    from astrospectro_spark.session import get_spark

    spark = get_spark(app_name="dump_plans_r06", master=f"local[{CPUS}]",
                      shuffle_partitions=int(CPUS))

    sf = os.path.basename(SF_DIR.rstrip("/"))
    syn = f"/tmp/astrospectro_synth/{sf}"
    if not os.path.exists(os.path.join(syn, "transcripts.parquet")):
        import astrospectro_spark.synth as synth

        synth.write_scale(syn, sf)
    turns = spark.read.parquet(os.path.join(syn, "transcripts.parquet"))
    anchors = spark.read.parquet(os.path.join(syn, "anchors.parquet"))
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").repartition(int(CPUS))

    plans = {
        "featurize_transcripts": lambda: featurize_expr(turns),
        "featurize_feature_only": lambda: featurize_expr(
            turns, include_text=False, enum_shuffle=True
        ),
        "featurize_wide": lambda: featurize_expr(turns, include_text=False, wide=True),
        "featurize_salted": lambda: featurize_salted(
            turns, hot_threshold=100_000, chunk_target_rows=50_000
        ),
        "feature_vector_wide": lambda: q_feature_vector_wide(spark, SF_DIR),
        "asof_anchors": lambda: asof_join(turns, anchors, tolerance_col="tolerance_s"),
        "session_stats": lambda: q_session_stats(spark, SF_DIR),
        "pricing_summary": lambda: q_pricing_summary(spark, SF_DIR),
        "broadcast_enrich": lambda: q_broadcast_enrich(spark, SF_DIR),
        "curate_documents": lambda: curate(docs, min_quality=0.3, min_tokens=2)
        .filter("keep")
        .drop(*FUNNEL_STAGES),
    }
    for name, thunk in plans.items():
        df = thunk()
        txt = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(out_dir, f"{name}_{tag}.txt")
        with open(path, "w") as f:
            f.write(txt)
        print(f"wrote {path} ({len(txt)} chars)")


if __name__ == "__main__":
    main()

"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship transcript-feature pipeline on sf0.001.
``queries()`` / ``oracle_sql()`` — operator inventory from SURVEY.md §2
implemented in :mod:`astrospectro_spark.queries` with DuckDB oracles in
:mod:`astrospectro_spark.oracle.duckdb_sql`.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from astrospectro_spark.queries import QUERIES
from astrospectro_spark.oracle.duckdb_sql import ORACLE_SQL


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query: the 183-column per-turn wide feature vector
    (sessionize + lag/lead + backfill + rolling/range windows +
    cumulative counters + composite expressions, ONE exchange) over the
    events table read as a transcript stream, joined as-of against
    purchase anchors — the engine's end-to-end slice (SURVEY.md §7.1)."""
    from astrospectro_spark.queries import q_asof_join, q_feature_vector_wide

    sf_dir = "/root/testdata/sf0.001"
    out = q_feature_vector_wide(spark, sf_dir)
    asof = q_asof_join(spark, sf_dir).select(
        "event_id", "asof_click_id", "asof_click_value"
    )
    return out.join(asof, "event_id", "left")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    return dict(ORACLE_SQL)

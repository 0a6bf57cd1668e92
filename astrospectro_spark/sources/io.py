"""Sources & sinks.

The reference persists its catalogue as pipe-delimited CSV with string
sentinels (reference: src/tools/generate_catalog_from_fits.py:384-385,
sentinel "UNKNOWN" :66, magnitude 99 → NaN :99-107). This module keeps
CSV interop for that surface — with proper quoting so pipes/newlines
inside values survive (the reference would corrupt them; FIXTURES.md
requires delimiter-insensitivity) — plus sentinel→NULL coercion at
ingest, and the parquet table reader used everywhere else.

At cluster scale the primary format is parquet/Iceberg
(``read_table``); CSV exists for reference-compatible exchange only.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

CSV_OPTS = {
    "sep": "|",
    "header": "true",
    "quote": '"',
    "escape": '"',
    "multiLine": "true",  # values may embed newlines
    "encoding": "UTF-8",
    # Spark CSV write strips unquoted leading/trailing whitespace by
    # default — that breaks byte-identical text round-trips
    "ignoreLeadingWhiteSpace": "false",
    "ignoreTrailingWhiteSpace": "false",
}


def read_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def write_catalog_csv(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    w = df.write.mode(mode)
    for k, v in CSV_OPTS.items():
        w = w.option(k, v)
    w.csv(path)


def read_catalog_csv(
    spark: SparkSession,
    path: str,
    schema: str | None = None,
    sentinel_99_cols: tuple[str, ...] = (),
    sentinel_unknown_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Read a pipe CSV; coerce reference-style sentinels to real NULLs
    (99+ magnitudes → NULL, 'UNKNOWN' strings → NULL, -9999 → NULL)."""
    r = spark.read
    for k, v in CSV_OPTS.items():
        r = r.option(k, v)
    df = r.schema(schema).csv(path) if schema else r.option("inferSchema", "true").csv(path)
    for c in sentinel_99_cols:
        df = df.withColumn(
            c,
            F.when((F.col(c) >= 90) | (F.col(c) == -9999), None).otherwise(F.col(c)),
        )
    for c in sentinel_unknown_cols:
        df = df.withColumn(c, F.when(F.col(c) == "UNKNOWN", None).otherwise(F.col(c)))
    return df


def latest_version(base_dir: str, pattern: str = "*") -> str | None:
    """Latest-by-mtime selection (SURVEY §2.6 O4 — the reference picks
    the newest catalog file with ``max(glob, key=getmtime)``,
    src/tools/dataset_builder.py:94-100). Driver-side by design: it
    selects ONE path before any distributed read; the distributed
    analogue at cluster scale is the Iceberg snapshot id recorded in the
    lineage table."""
    import glob as _glob
    import os as _os

    paths = _glob.glob(_os.path.join(base_dir, pattern))
    if not paths:
        return None
    return max(paths, key=_os.path.getmtime)

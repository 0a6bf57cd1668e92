"""SparkSession factory with scale-aware defaults.

The reference hand-tunes chunk size / pool sizes / IPC chunksize
(reference: src/pipeline/processing.py:100-114); here those knobs map
onto ``spark.sql.shuffle.partitions``, Arrow batch size and AQE. In
local mode the driver is the only JVM, so ``spark.driver.memory`` is
the single memory knob; on a real cluster the same confs apply
per-executor and nothing in this module changes.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_SHUFFLE_PARTITIONS = 32


def get_spark(
    app_name: str = "astrospectro_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) a SparkSession tuned for this engine.

    Confs chosen for 100 TB-scale behaviour, not just local tests:

    - AQE on (runtime coalesce, skew-join splitting) — the analogue of
      the reference's batch-halving retry (reference:
      src/tools/gaia_crossmatcher.py:434-468).
    - Arrow on, bounded batch size — the analogue of the reference's
      buffer-protocol IPC with chunksize 16 (reference:
      src/pipeline/processing.py:41-44,111-114).
    - UTC session timezone: all transcript timestamps are UTC.
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    master = master or os.environ.get("SPARK_GRAFT_MASTER", f"local[{cpus}]")
    nshuffle = shuffle_partitions or int(
        os.environ.get("SPARK_GRAFT_SHUFFLE_PARTITIONS", DEFAULT_SHUFFLE_PARTITIONS)
    )
    builder = (
        SparkSession.builder.master(master)
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(nshuffle))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        .config("spark.python.worker.reuse", "true")
        .config("spark.sql.parquet.compression.codec", "zstd")
        # INT96 (the legacy default) carries no parquet footer min/max;
        # µs timestamps keep per-file bounds usable for data skipping
        # (sources/snapshot_log.py stats pruning)
        .config("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"))
        # The wide feature plans (175/183-column window batteries) emit
        # several hundred distinct codegen fragments per query; the
        # default 100-entry compiled-class cache (StaticSQLConf
        # CODEGEN_CACHE_MAX_ENTRIES) thrashes on them, so EVERY task
        # re-Janino-compiles its projections — measured ~7-9 s of pure
        # compile CPU per task on feature_vector_wide (task cost flat in
        # row count, total CPU linear in task count: the signature of
        # per-task fixed overhead). 2048 entries holds the whole
        # engine's fragment set at a bounded metaspace cost and applies
        # per-JVM (each executor pays the same compile tax on a
        # cluster). Static conf: must be set before the JVM's first
        # session; env knob for ops override.
        .config(
            "spark.sql.codegen.cache.maxEntries",
            os.environ.get("SPARK_GRAFT_CODEGEN_CACHE", "2048"),
        )
        # Window-feature stages are compute-bound (~50-100 µs/row on
        # ~200-byte rows ⇒ 1 MB of shuffled input is ~0.5 s of CPU), so
        # AQE's default 1 MB coalesce floor serializes them whenever the
        # table is small in BYTES but heavy in compute — e.g. a 4 MB
        # post-shuffle stage collapses to 4 tasks on 32 cores. 64 KB
        # keeps parallelismFirst's target (input/defaultParallelism)
        # binding instead of the floor. At production scale partitions
        # sit at the advisory size (64 MB+) and the floor is never the
        # binding constraint, so this is a no-op there. 256 KB (not
        # lower) keeps tiny shuffles from fragmenting into tasks whose
        # scheduling overhead exceeds their work.
        .config(
            "spark.sql.adaptive.coalescePartitions.minPartitionSize",
            os.environ.get("SPARK_GRAFT_MIN_PARTITION_SIZE", "256k"),
        )
    )
    # The wide plans JIT-compile thousands of generated-class methods;
    # the JVM's default 240 MB reserved code cache fills after a few
    # plan variants, the C2 compiler shuts off ("CodeCache is full"),
    # and later queries run interpreted — measured as sporadic 10x
    # stage-CPU storms in long sessions. 512 MB holds the engine's
    # whole compiled set. Applied to driver AND executors (local mode
    # only has the driver; a cluster pays the same tax per executor
    # JVM). Ignored with a warning when attaching to an already-running
    # JVM (e.g. inside spark-submit, which sets its own opts).
    code_cache = os.environ.get("SPARK_GRAFT_CODE_CACHE", "512m")
    if code_cache:
        jopt = f"-XX:ReservedCodeCacheSize={code_cache}"
        builder = builder.config(
            "spark.driver.extraJavaOptions", jopt
        ).config("spark.executor.extraJavaOptions", jopt)
    # Shuffle/spill dir override — OPT-IN via SPARK_GRAFT_LOCAL_DIR
    # (bench harnesses set it to /dev/shm tmpfs: in local mode all
    # "shuffle" traffic is disk I/O on one host and concurrent writers
    # thrash a single block device long before the CPUs saturate).
    # Not automatic: tmpfs shuffle plus MEMORY_AND_DISK spill both
    # landing in RAM can exhaust memory on long unattended runs. On a
    # real cluster the platform sets fast local SSDs and this is unset.
    local_dir = os.environ.get("SPARK_GRAFT_LOCAL_DIR")
    if local_dir:
        os.makedirs(local_dir, exist_ok=True)
        builder = builder.config("spark.local.dir", local_dir)
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark

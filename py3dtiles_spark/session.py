"""SparkSession factory with the engine's recommended configuration."""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(app_name: str = "py3dtiles-spark", cpus: int | None = None,
              shuffle_partitions: int | None = None) -> SparkSession:
    """Local-mode session tuned for the tiler.

    On a real cluster these configs ride through spark-submit; AQE handles
    runtime coalescing/skew. Arrow is mandatory: every kernel is an
    Arrow-batched pandas UDF (input_hint: no per-row Python).
    """
    cpus = cpus or int(os.environ.get("SPARK_GRAFT_CPUS", "4"))
    shuffle_partitions = shuffle_partitions or max(2 * cpus, 8)
    # NOTE: malloc tuning for numpy kernels lives in py3dtiles_spark/
    # __init__.py (runtime mallopt, Python-process-only). Do NOT set the
    # MALLOC_* env vars here: the JVM would inherit them, and with
    # MMAP_MAX_=0 glibc cannot create per-thread arenas — 32 executor
    # threads then serialize on one malloc lock (measured 3x slowdown).
    return (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "65536")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.files.maxPartitionBytes", "134217728")
        .getOrCreate()
    )

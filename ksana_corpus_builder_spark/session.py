"""SparkSession factory.

Local-mode settings tuned for the sandbox (one JVM, N threads), with the
conf surface a 1000-executor deployment would override via spark-submit:
shuffle partitioning, AQE (incl. skew-join splitting), Arrow batching for
the pandas-UDF kernels, UTC session timezone (required for DuckDB oracle
parity — duckdb timestamps are UTC-naive).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

_DEFAULT_CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def get_spark(
    cpus: int | None = None,
    app_name: str = "ksana_corpus_builder_spark",
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) the session.

    ``shuffle_partitions`` defaults to ``2 * cpus`` locally; on a real
    cluster this is sized so one shuffle partition ~ 128-256 MB of the
    target table (for 100 TB input, O(500k) map partitions feed AQE which
    coalesces post-shuffle — we set a high initial number and let
    ``spark.sql.adaptive.coalescePartitions`` shrink it).
    """
    cpus = cpus or _DEFAULT_CPUS
    shuffle_partitions = shuffle_partitions or max(cpus * 2, 8)
    b = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "24g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.files.maxPartitionBytes", "134217728")
        # broadcast anything under 64 MB — dimension tables, stopword dicts
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
    )
    for k, v in (extra_conf or {}).items():
        b = b.config(k, v)
    spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark

"""SparkSession factory with scale-aware defaults.

Local-mode testing uses ``local[N]``; the same configuration profile is
what we'd submit with ``spark-submit --py-files`` on a real cluster
(AQE, skew-join handling, Arrow). GraphIt's compile-time schedule knobs
(reference include/graphit/midend/schedule.h) map to these runtime confs.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def default_parallelism() -> int:
    return int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))


def get_spark(
    app_name: str = "graphit-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    driver_memory: str = "48g",
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession tuned for the link-graph engine.

    shuffle_partitions defaults to the core count: iterative graph jobs
    re-shuffle every superstep, so over-partitioning multiplies task
    overhead 20-100x across iterations (the analogue of GraphIt's
    grain-size schedule, reference src/midend/par_for_lower.cpp).
    """
    cores = default_parallelism()
    if master is None:
        master = f"local[{cores}]"
    if shuffle_partitions is None:
        shuffle_partitions = cores

    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.default.parallelism", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.driver.memory", driver_memory)
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.parquet.compression.codec", "snappy")
    )
    if extra_conf:
        for k, v in extra_conf.items():
            builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark


def stop_spark() -> None:
    """Stop the active session (needed between parallelism levels in the
    scaling bench — master is fixed per SparkContext)."""
    active = SparkSession.getActiveSession()
    if active is not None:
        active.stop()

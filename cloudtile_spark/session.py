"""SparkSession factory with scale-oriented defaults.

Local-mode testing stands in for the multi-executor cluster (the reference
runs on a 16 vCPU / 120 GiB Fargate task, reference cdk/cloudtile_stack.py:54-61;
our target is spark-submit at N and 4N executors). The configs below are the
ones that matter at 100 TB and are harmless at test scale:

- AQE on (runtime coalesce + skew-join split for dense metro tiles)
- Arrow on (every Python touchpoint is an Arrow batch)
- shuffle partitions sized to cores locally; on a real cluster this should be
  2-3x total executor cores (or left to AQE's coalesce from a higher number).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "cloudtile_spark",
    cores: int | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    if cores is None:
        cores = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    if shuffle_partitions is None:
        shuffle_partitions = max(cores, 8)
    builder = (
        SparkSession.builder.master(f"local[{cores}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "50000")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "24g"))
        .config("spark.ui.enabled", "false")
        .config("spark.driver.extraJavaOptions", "-Djava.net.preferIPv4Stack=true")
        # shuffle/spill on tmpfs: on this single-node proxy the OS disk is
        # one shared spindle; a real cluster has per-node shuffle disks that
        # scale with executors — RAM-backed local dirs restore that property
        .config("spark.local.dir", os.environ.get("SPARK_LOCAL_DIRS", "/dev/shm/spark-local"))
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark

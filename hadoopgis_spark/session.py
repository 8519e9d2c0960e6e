"""SparkSession factory with scale-minded defaults.

Local testing runs one JVM (``local[N]``); the config below is chosen so
the same code is correct on a multi-executor cluster: AQE on (runtime
coalesce + skew-join splitting), Arrow on (vectorized pandas UDF path),
shuffle partitions sized to cores rather than the 200 default.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(app_name: str = "hadoopgis_spark", **extra_conf: str) -> SparkSession:
    """Build (or reuse) a SparkSession.

    Honors ``SPARK_GRAFT_CPUS`` for local parallelism (driver contract).
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
    master = os.environ.get("SPARK_MASTER", f"local[{cpus}]")
    builder = (
        SparkSession.builder.master(master)
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", os.environ.get("HGS_SHUFFLE_PARTITIONS", "32"))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        # Spark 4's DataFrame call-site capture (error enrichment) costs
        # 4-6 py4j round trips + a Python stack walk on EVERY DataFrame
        # API call — measured at ~half of this workload's per-query plan
        # CONSTRUCTION time (a 200-call chain: 4.6 s with it on, ~0.2 s
        # off). Pure debugging metadata: plans, results and error TYPES
        # are unchanged, only AnalysisException messages lose the
        # "called from <file>:<line>" origin line. Static conf, so it
        # must be set here at build time (guide §7.3: driver/planning
        # overhead is per-query fixed cost that multiplies at scale).
        .config("spark.python.sql.dataFrameDebugging.enabled", "false")
        # local mode runs every executor thread inside the driver JVM.
        # Measured on the reference-scale workloads: 8g and 16g both run
        # ~14 s, 32g runs 19-22 s (bigger young gen, worse locality) —
        # 16g keeps the fast-GC profile plus headroom for localCheckpoint
        # blocks accumulating across a 70-query bench session
        .config("spark.driver.memory", os.environ.get("HGS_DRIVER_MEM", "16g"))
        # reclaim shuffle/checkpoint state of finished queries during
        # long multi-query sessions instead of waiting for a driver GC
        # (5min: never fires inside a single bench query, but bounds
        # block accumulation across an hour-long session)
        .config("spark.cleaner.periodicGC.interval", "5min")
    )
    for k, v in extra_conf.items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark

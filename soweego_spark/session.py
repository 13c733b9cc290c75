"""SparkSession factory tuned for the entity-resolution workload.

Defaults mirror what we would submit to a real cluster via
``spark-submit --py-files``: AQE on (runtime skew-join splitting + coalesce),
Arrow on (every pandas UDF crosses the JVM/Python boundary in columnar
batches), and a shuffle-partition count sized to the parallelism level so the
same code scales from local[8] tests to a 1000-executor cluster.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def get_spark(
    cpus: int | None = None,
    app_name: str = "soweego-spark",
    shuffle_partitions: int | None = None,
    extra_conf: dict | None = None,
) -> SparkSession:
    """Build (or fetch) a SparkSession.

    ``shuffle_partitions`` defaults to 2x the core count: enough tasks that
    AQE can coalesce down, few enough that small-scale tests don't drown in
    scheduling overhead. On a real cluster this would be ~2-3x total cores.
    """
    cpus = cpus or DEFAULT_CPUS
    shuffle = shuffle_partitions or max(cpus * 2, 8)
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "8g"))
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()

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

    # Executor python workers must import soweego_spark regardless of the
    # launch cwd: driver-side sys.path does NOT propagate to workers, so
    # put the package's parent dir on PYTHONPATH before the JVM forks them
    # (spark-submit deployments ship the package via --py-files instead).
    repo_dir = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    current = os.environ.get("PYTHONPATH", "")
    if repo_dir not in current.split(os.pathsep):
        os.environ["PYTHONPATH"] = (
            f"{repo_dir}{os.pathsep}{current}" if current else repo_dir
        )
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

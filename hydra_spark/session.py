"""SparkSession factory tuned for the crawl/analysis workload.

Local mode stands in for a multi-executor cluster; all scale decisions
(partition counts, AQE, Arrow) are made as if running on 1000 executors
over ~100 TB — see SURVEY.md §4.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    cores: int | str | None = None,
    shuffle_partitions: int | None = None,
    app: str = "hydra_spark",
    extra: dict | None = None,
    master: str | None = None,
) -> SparkSession:
    """`master` overrides the default local[cores] — e.g.
    `local-cluster[4,8,12288]` runs REAL executor processes (own JVMs,
    real serde/network boundaries), the closest this sandbox gets to a
    multi-node cluster; `cores` should then be the TOTAL core count so
    shuffle partitioning stays consistent."""
    if cores is None:
        cores = os.environ.get("SPARK_GRAFT_CPUS", "32")
    if master is None:
        master = f"local[{cores}]"
    if shuffle_partitions is None:
        shuffle_partitions = int(cores) if str(cores).isdigit() else 32
    b = (
        SparkSession.builder.master(master)
        .appName(app)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.parquet.compression.codec", "zstd")
        .config("spark.driver.memory", os.environ.get("HYDRA_SPARK_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
        .config("spark.driver.extraJavaOptions", "-Djava.net.preferIPv4Stack=true")
    )
    for k, v in (extra or {}).items():
        b = b.config(k, v)
    spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    return spark

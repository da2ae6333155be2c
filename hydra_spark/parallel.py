"""Scan-parallelism guard (guide §2.5, "input skew").

A parquet file is splittable only at row-group granularity: a table
written as one file with one row group collapses scan parallelism to a
single task, and every narrow operator chained on it (projection,
explode, regex, Python pass) runs on ONE core no matter how many the
session has. `fan_out` repartitions such degenerate inputs up to the
session's default parallelism — and is a NO-OP whenever the input
already carries at least that many partitions, so at production scale
(thousands of scan partitions) no extra exchange is ever introduced.

Round-robin repartition is deterministic (Spark sorts within partitions
before redistributing — `spark.sql.execution.sortBeforeRepartition`,
default on), and every operator downstream of the call sites is
partitioning-insensitive (keyed aggregations, windows with total
orders, limits behind deterministic sorts) — pinned by the DuckDB
oracle gate across all declared queries.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def fan_out(df: DataFrame, multiplier: int = 1) -> DataFrame:
    """Spread `df` across at least the session's cores when its plan
    would execute in fewer partitions; otherwise return it unchanged."""
    try:
        spark = df.sparkSession
        target = spark.sparkContext.defaultParallelism * multiplier
        if df.rdd.getNumPartitions() >= target:
            return df
    except Exception:
        return df
    return df.repartition(target)

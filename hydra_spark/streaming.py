"""Structured Streaming view of the crawl telemetry.

The crawl itself is batch-iterative by design (SURVEY.md §2.9: state is
tabular, rounds are synchronous — the reference is a micro-batch loop
too). What IS naturally streaming is the operational telemetry: the
checks log grows append-only, and a politeness monitor wants sliding
per-domain rates and cool-off alerts continuously.

`politeness_monitor` runs exactly that as a Structured Streaming job
over the checks log directory: file-source readStream → watermarked
sliding-window counts per domain → rate alerts. With
``trigger(availableNow=True)`` it drains whatever rounds have been
committed and stops — the same code attaches to a live cluster with a
continuous trigger.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hydra_spark.config import DEFAULT, HydraConfig
from hydra_spark.schemas import CHECKS_SCHEMA
from hydra_spark.storage import StateStore


def checks_stream(spark: SparkSession, store: StateStore) -> DataFrame:
    """readStream over the checks append-log (one dir per round batch ≈
    one micro-batch of files)."""
    return (
        spark.readStream.schema(CHECKS_SCHEMA)
        .option("pathGlobFilter", "*.parquet")
        .option("recursiveFileLookup", "true")
        .parquet(store.checks.dir)
    )


def domain_rate_windows(
    checks: DataFrame,
    cfg: HydraConfig = DEFAULT,
    slide: str = "60 seconds",
    watermark: str = "60 seconds",
) -> DataFrame:
    """Sliding per-domain request counts over BACKOFF_PERIOD with a
    watermark (append mode emits a window once the watermark passes its
    end — i.e. once the crawl's event time has moved on)."""
    window_len = f"{int(cfg.backoff_period)} seconds"
    return (
        checks.where(F.col("domain").isNotNull())
        .withWatermark("created_at", watermark)
        .groupBy(F.window("created_at", window_len, slide), F.col("domain"))
        .agg(F.count("*").alias("nb_req"))
        .select(
            F.col("window.start").alias("window_start"),
            F.col("window.end").alias("window_end"),
            "domain",
            "nb_req",
            (F.col("nb_req") >= cfg.backoff_nb_req).alias("over_budget"),
        )
    )


def politeness_monitor(
    spark: SparkSession,
    store: StateStore,
    out_dir: str,
    cfg: HydraConfig = DEFAULT,
    slide: str = "60 seconds",
    watermark: str = "60 seconds",
):
    """Drain all committed rounds through the windowed rate monitor into
    a parquet sink; returns the finished StreamingQuery."""
    rates = domain_rate_windows(checks_stream(spark, store), cfg, slide, watermark)
    q = (
        rates.writeStream.outputMode("append")
        .format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", f"{out_dir}/_checkpoint")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return q

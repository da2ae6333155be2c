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


COOLOFF_OUTPUT_SCHEMA = (
    "domain string, cooloff_until timestamp, n_checks long, n_violations long"
)
COOLOFF_STATE_SCHEMA = "cooloff_until double, n_checks long, n_violations long"


def cooloff_tracker(checks: DataFrame, cfg: HydraConfig = DEFAULT) -> DataFrame:
    """Custom STATEFUL streaming operator (`applyInPandasWithState`):
    the per-domain 429 cool-off state machine (crawl/helpers.py:110-150)
    carried across micro-batches. A 429 puts the domain in cool-off
    until `created_at + COOL_OFF_PERIOD`; any check fetched while a
    cool-off is active is counted as a politeness violation. Emits one
    row per (domain, micro-batch) with the running totals — the alert
    feed an operator watches.

    State per group is a scalar triple (expiry epoch, counts): constant
    bytes per domain, so state scales with |domains|, not |checks|."""
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    cool_off = float(cfg.cool_off_period)

    def update(key, pdfs, state: GroupState):
        import pandas as pd

        (domain,) = key
        until, n_checks, n_viol = state.get if state.exists else (None, 0, 0)
        pdf = pd.concat(list(pdfs), ignore_index=True)
        # a crawl round stamps every check with the same created_at, so
        # the rule must be instant-deterministic: all checks at time t
        # are judged against the cool-off state from BEFORE t, then any
        # 429 at t extends the cool-off
        for t, grp in pdf.groupby(pdf["created_at"].map(lambda x: x.timestamp()), sort=True):
            n_checks += len(grp)
            if until is not None and t < until:
                n_viol += len(grp)
            if (grp["status"] == 429).any():
                until = t + cool_off
        state.update((until, n_checks, n_viol))
        yield pd.DataFrame(
            [
                {
                    "domain": domain,
                    "cooloff_until": pd.Timestamp(until, unit="s") if until else pd.NaT,
                    "n_checks": n_checks,
                    "n_violations": n_viol,
                }
            ]
        )

    return (
        checks.where(F.col("domain").isNotNull())
        .groupBy("domain")
        .applyInPandasWithState(
            update,
            outputStructType=COOLOFF_OUTPUT_SCHEMA,
            stateStructType=COOLOFF_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def cooloff_monitor(
    spark: SparkSession,
    store: StateStore,
    out_dir: str,
    cfg: HydraConfig = DEFAULT,
):
    """Drain committed rounds through the stateful cool-off tracker into
    a parquet sink (state persists in the checkpoint across drains)."""
    tracked = cooloff_tracker(checks_stream(spark, store), cfg)
    q = (
        tracked.writeStream.outputMode("append")
        .format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", f"{out_dir}/_checkpoint")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return q


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

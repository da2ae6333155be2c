"""Next-check delay ladder (C10).

Reference: udata_hydra/crawl/calculate_next_check.py:6-44 —
- no previous check, or the check changed → now + CHECK_DELAYS[0]
- else measure `since` = now − (last_modified_at or previous check's
  created_at); if since > CHECK_DELAYS[-1] → + CHECK_DELAYS[-1];
  else the FIRST delay d with since ≤ d.

Pure `when()` cascade — whole-stage codegen, no UDF.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from hydra_spark.config import HydraConfig


def next_check_expr(
    has_changed: Column,
    prev_exists: Column,
    last_modified_at: Column,
    prev_created_at: Column,
    now: str,
    cfg: HydraConfig,
) -> Column:
    now_ts = F.to_timestamp(F.lit(now))
    delays = list(cfg.check_delays_hours)

    def plus(hours: int) -> Column:
        return now_ts + F.make_interval(hours=F.lit(hours))

    # seconds since last modification (epoch arithmetic — interval types
    # are not directly comparable across day-time vs calendar intervals)
    since_s = now_ts.cast("long") - F.coalesce(last_modified_at, prev_created_at).cast("long")
    ladder = plus(delays[-1])  # fallthrough: since > max delay
    for d in reversed(delays):
        ladder = F.when(since_s <= d * 3600, plus(d)).otherwise(ladder)

    return F.when(~prev_exists | has_changed, plus(delays[0])).otherwise(ladder)


def adaptive_recrawl(
    history,
    key_col: str = "resource_id",
    ts_col: str = "created_at",
    value_col: str = "checksum",
    delays_hours: tuple[int, ...] = (12, 24, 168, 720),
):
    """Change-rate-driven recrawl scheduling — the principled upgrade
    to the fixed ladder above (Cho & Garcia-Molina, "Effective Page
    Refresh Policies for Web Crawlers", TODS 2003: revisit frequency
    should track each page's observed change rate). Per key, the check
    HISTORY yields n_obs, n_changes (observations whose value differs
    from the previous one) and change_rate = n_changes/(n_obs-1); the
    recommended delay is the ladder rung matching the rate — items
    changing at ≥2/3 of checks get the fastest rung, never-changing
    items decay to the slowest. Keys with a single observation have no
    rate (NULL) and default to the first rung, like the reference's
    no-previous-check rule.

    Plan: ONE shuffle on the key serves both the lag window and the
    per-key aggregate (same single-exchange shape as sessionize).
    Returns (key, n_obs, n_changes, change_rate, next_delay_hours).
    """
    from pyspark.sql import Window

    w = Window.partitionBy(key_col).orderBy(ts_col)
    prev = F.lag("_v").over(w)
    changed = (prev.isNotNull() & ~F.col("_v").eqNullSafe(prev)).cast("int")
    agg = (
        history.select(key_col, ts_col, F.col(value_col).alias("_v"))
        .withColumn("_chg", changed)
        .groupBy(key_col)
        .agg(
            F.count(F.lit(1)).alias("n_obs"),
            F.sum("_chg").alias("n_changes"),
        )
        .withColumn(
            "_rate",
            F.when(F.col("n_obs") > 1, F.col("n_changes") / (F.col("n_obs") - 1)),
        )
    )
    d = list(delays_hours)
    # the ladder compares the UNROUNDED rate (round-to-6 would push an
    # exact 1/3 below the 1/3 rung boundary); output rounds for display
    rate = F.col("_rate")
    ladder = (
        F.when(rate.isNull(), F.lit(d[0]))
        .when(rate >= 2.0 / 3.0, F.lit(d[0]))
        .when(rate >= 1.0 / 3.0, F.lit(d[1]))
        .when(rate > 0.0, F.lit(d[2]))
        .otherwise(F.lit(d[-1]))
    )
    return agg.select(
        key_col,
        "n_obs",
        "n_changes",
        F.round("_rate", 6).alias("change_rate"),
        ladder.cast("int").alias("next_delay_hours"),
    )

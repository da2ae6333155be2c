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

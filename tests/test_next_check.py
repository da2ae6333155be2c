"""Next-check delay ladder truth table.

Mirrors the reference semantics of
udata_hydra/crawl/calculate_next_check.py:6-44 (see also the scheduler
tests in tests/test_crawl/test_crawl.py:177-211).
"""

from datetime import datetime

from pyspark.sql import functions as F

from hydra_spark.config import DEFAULT
from hydra_spark.crawl.next_check import next_check_expr

NOW = "2025-01-15 00:00:00"


def _next(spark, has_changed, prev_created_at, last_modified_at):
    df = spark.createDataFrame(
        [(has_changed, prev_created_at, last_modified_at)],
        "has_changed boolean, prev_created_at timestamp, last_modified_at timestamp",
    )
    out = df.select(
        next_check_expr(
            F.col("has_changed"),
            F.col("prev_created_at").isNotNull(),
            F.col("last_modified_at"),
            F.col("prev_created_at"),
            NOW,
            DEFAULT,
        ).alias("nca")
    ).first()["nca"]
    return out


def ts(s):
    return datetime.fromisoformat(s)


def test_first_check_earliest_delay(spark):
    assert _next(spark, False, None, None) == ts("2025-01-15 12:00:00")


def test_changed_earliest_delay(spark):
    assert _next(spark, True, ts("2024-01-01 00:00:00"), ts("2024-01-01 00:00:00")) == ts(
        "2025-01-15 12:00:00"
    )


def test_unchanged_recent_modif_picks_first_delay_geq(spark):
    # modified 6h ago → first delay ≥ 6h is 12h
    assert _next(spark, False, ts("2025-01-10 00:00:00"), ts("2025-01-14 18:00:00")) == ts(
        "2025-01-15 12:00:00"
    )
    # modified 20h ago → 24h
    assert _next(spark, False, ts("2025-01-10 00:00:00"), ts("2025-01-14 04:00:00")) == ts(
        "2025-01-16 00:00:00"
    )
    # modified 100h ago → 168h
    assert _next(spark, False, ts("2025-01-01 00:00:00"), ts("2025-01-10 20:00:00")) == ts(
        "2025-01-22 00:00:00"
    )


def test_unchanged_old_modif_caps_at_max_delay(spark):
    # modified 2 years ago → capped at 720h
    assert _next(spark, False, ts("2024-12-01 00:00:00"), ts("2023-01-01 00:00:00")) == ts(
        "2025-02-14 00:00:00"
    )


def test_unchanged_no_modif_uses_prev_check_date(spark):
    # previous check 20h ago, no last_modified → 24h ladder step
    assert _next(spark, False, ts("2025-01-14 04:00:00"), None) == ts("2025-01-16 00:00:00")

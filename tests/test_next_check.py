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


class TestAdaptiveRecrawl:
    def test_rates_and_ladder(self, spark):
        from hydra_spark.crawl.next_check import adaptive_recrawl

        rows = [
            # r1: changes every check -> fastest rung
            ("r1", 1, "a"), ("r1", 2, "b"), ("r1", 3, "c"),
            # r2: never changes -> slowest rung
            ("r2", 1, "x"), ("r2", 2, "x"), ("r2", 3, "x"),
            # r3: 1 change in 3 intervals (rate 1/3) -> second rung
            ("r3", 1, "a"), ("r3", 2, "a"), ("r3", 3, "b"), ("r3", 4, "b"),
            # r4: single observation -> NULL rate, first rung
            ("r4", 1, "z"),
            # r5: rare change (1 of 4 intervals, rate 0.25) -> third rung
            ("r5", 1, "a"), ("r5", 2, "a"), ("r5", 3, "b"),
            ("r5", 4, "b"), ("r5", 5, "b"),
        ]
        df = spark.createDataFrame(
            rows, "resource_id string, t int, checksum string"
        ).selectExpr(
            "resource_id",
            "CAST(timestamp'2024-01-01 00:00:00' + make_interval(0,0,0,0,t) AS TIMESTAMP) AS created_at",
            "checksum",
        )
        got = {r.resource_id: r for r in adaptive_recrawl(df).collect()}
        assert got["r1"].next_delay_hours == 12 and got["r1"].change_rate == 1.0
        assert got["r2"].next_delay_hours == 720 and got["r2"].change_rate == 0.0
        assert got["r3"].next_delay_hours == 24
        assert got["r4"].next_delay_hours == 12 and got["r4"].change_rate is None
        assert got["r5"].next_delay_hours == 168
        assert got["r5"].n_obs == 5 and got["r5"].n_changes == 1

    def test_single_exchange_plan(self, spark):
        from hydra_spark.crawl.next_check import adaptive_recrawl

        df = spark.createDataFrame(
            [("r", "2024-01-01 00:00:00", "a")],
            "resource_id string, created_at string, checksum string",
        )
        plan = (
            adaptive_recrawl(df)
            ._jdf.queryExecution().executedPlan().toString()
        )
        import re
        assert len(re.findall(r"Exchange hashpartitioning", plan)) == 1

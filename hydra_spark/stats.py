"""API-route aggregates as library functions (SURVEY.md §2.5 A3-A8).

Each function returns a DataFrame; the reference exposes these as
aiohttp routes over SQL (udata_hydra/routes/*.py, udata_hydra/db/*.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def checks_aggregate(checks: DataFrame, group_by: str, created_at_date: str, k: int = 20) -> DataFrame:
    """A3 (db/check.py:89-102): `SELECT col AS value, count(*) FROM
    checks WHERE created_at::date = $1 GROUP BY col ORDER BY count DESC
    LIMIT 20`."""
    return (
        checks.where(F.to_date("created_at") == F.lit(created_at_date))
        .groupBy(F.col(group_by).alias("value"))
        .agg(F.count("*").alias("count"))
        .orderBy(F.desc("count"), "value")
        .limit(k)
    )


def status_counts(frontier: DataFrame) -> DataFrame:
    """A4 (routes/status.py:11-26): catalog status breakdown with NULL
    rendered as the literal 'NULL'."""
    return (
        frontier.where(~F.col("deleted"))
        .groupBy(F.coalesce(F.col("status"), F.lit("NULL")).alias("status"))
        .agg(F.count("*").alias("count"))
    )


def crawler_status(frontier: DataFrame, latest_checks: DataFrame | None, now: str) -> DataFrame:
    """A5 (routes/status.py:29-60): single-pass conditional sums — how
    many resources are never-checked / checked / due."""
    base = frontier.where(~F.col("deleted"))
    if latest_checks is not None:
        lc = latest_checks.select(F.col("resource_id").alias("_rid"), "next_check_at")
        base = base.join(lc, base.resource_id == lc._rid, "left")
    else:
        base = base.withColumn("next_check_at", F.lit(None).cast("timestamp"))
    now_ts = F.to_timestamp(F.lit(now))
    return base.agg(
        F.count("*").alias("total"),
        F.sum(F.when(F.col("last_check").isNull(), 1).otherwise(0)).alias("pending_checks"),
        F.sum(F.when(F.col("last_check").isNotNull(), 1).otherwise(0)).alias("total_checks"),
        F.sum(
            F.when(F.col("last_check").isNotNull() & (F.col("next_check_at") <= now_ts), 1).otherwise(0)
        ).alias("checks_to_do"),
    )


def checks_stats(latest_checks: DataFrame) -> DataFrame:
    """A6 (routes/status.py:118-177): ok/error/timeout split over latest
    checks + per-status-code counts with percentages."""
    tagged = latest_checks.withColumn(
        "category",
        F.when(F.col("timeout"), F.lit("timeout"))
        .when(F.col("status").between(200, 399), F.lit("ok"))
        .when(F.col("status").isNotNull(), F.lit("error"))
        .otherwise(F.lit("error")),
    )
    w = Window.partitionBy()
    return (
        tagged.groupBy("category", "status")
        .agg(F.count("*").alias("count"))
        .withColumn("percentage", F.round(F.col("count") * 100.0 / F.sum("count").over(w), 2))
        .orderBy(F.desc("count"), "status")
    )


def resources_stats(frontier: DataFrame) -> DataFrame:
    """A7 (routes/resources.py:110-125)."""
    return frontier.agg(
        F.count("*").alias("total"),
        F.sum(F.when(F.col("deleted"), 1).otherwise(0)).alias("deleted"),
        F.sum(F.when(F.col("priority") & ~F.col("deleted"), 1).otherwise(0)).alias("priority"),
    )


def cors_distribution(frontier: DataFrame, checks: DataFrame) -> DataFrame:
    """A8 (routes/resources.py:128-194): per-resource BOOL_OR of CORS
    presence → classification → counts + percent-of-total (window over
    an empty frame, W5)."""
    per_resource = (
        frontier.where(~F.col("deleted"))
        .join(
            checks.select(F.col("resource_id").alias("_rid"), "cors_headers"),
            F.col("resource_id") == F.col("_rid"),
            "left",
        )
        .groupBy("resource_id")
        .agg(
            F.max(F.when(F.col("cors_headers").isNotNull(), 1).otherwise(0)).alias("has_cors"),
            F.max(F.when(F.col("_rid").isNotNull(), 1).otherwise(0)).alias("has_check"),
        )
        .withColumn(
            "access_status",
            F.when(F.col("has_check") == 0, F.lit("never-checked"))
            .when(F.col("has_cors") == 1, F.lit("cors-enabled"))
            .otherwise(F.lit("no-cors")),
        )
    )
    w = Window.partitionBy()
    return (
        per_resource.groupBy("access_status")
        .agg(F.count("*").alias("count"))
        .withColumn("percentage", F.round(F.col("count") * 100.0 / F.sum("count").over(w), 2))
        .orderBy(F.desc("count"))
    )


def queue_depth(frontier: DataFrame, latest_checks: DataFrame | None, now: str) -> DataFrame:
    """A10 analog: pending frontier rows per tier."""
    from hydra_spark.config import DEFAULT
    from hydra_spark.crawl.select_batch import eligible_frontier

    el = eligible_frontier(frontier, DEFAULT)
    if latest_checks is not None:
        lc = latest_checks.select(F.col("resource_id").alias("_rid"), "next_check_at")
        el = el.join(lc, el.resource_id == lc._rid, "left")
    else:
        el = el.withColumn("next_check_at", F.lit(None).cast("timestamp"))
    now_ts = F.to_timestamp(F.lit(now))
    tier = (
        F.when(F.col("priority"), F.lit(0))
        .when(F.col("last_check").isNull(), F.lit(1))
        .when(F.col("next_check_at").isNull() | (F.col("next_check_at") <= now_ts), F.lit(2))
    )
    return el.withColumn("tier", tier).where(F.col("tier").isNotNull()).groupBy("tier").count()


def orphan_tables(tables_index: DataFrame, frontier: DataFrame) -> DataFrame:
    """SO1 (cli/purge.py:42-63): parsed tables whose md5(url) no longer
    appears in the live catalog → left_anti join."""
    live = frontier.where(~F.col("deleted")).select(F.md5("url").alias("parsing_table"))
    return tables_index.select("parsing_table").distinct().join(live, "parsing_table", "left_anti")


def sessionize(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    gap_minutes: int = 30,
) -> DataFrame:
    """Gap-based sessionization of an event log — the crawl-log /
    access-log analytic the reference's aggregate routes stop short of
    (and the batch twin of Structured Streaming's session_window): an
    inactivity gap > ``gap_minutes`` starts a new session. Returns one
    row per session: (user_id, session_id ordinal per user, start_s,
    end_s, n_events, duration_s).

    Scale: classic gaps-and-islands — ONE shuffle on the user key
    serves both the lag/cumulative-sum window AND the per-session
    aggregate (HashPartitioning(user) satisfies the groupBy's clustered
    distribution on (user, session), so Catalyst inserts no second
    exchange; gated in test_catalog_stats). Session state never sits in
    driver memory and no per-user data leaves its partition."""
    w = Window.partitionBy(user_col).orderBy(ts_col, id_col)
    prev = F.lag(F.col(ts_col)).over(w)
    new_sess = (
        prev.isNull()
        | (
            (F.col(ts_col).cast("timestamp").cast("long")
             - prev.cast("timestamp").cast("long")) > gap_minutes * 60
        )
    ).cast("int")
    cum = Window.partitionBy(user_col).orderBy(ts_col, id_col).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    staged = events.select(
        F.col(user_col), F.col(ts_col), F.col(id_col)
    ).withColumn("_sess", F.sum(new_sess).over(cum))
    return (
        staged.groupBy(user_col, "_sess")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.min(ts_col).alias("_start"),
            F.max(ts_col).alias("_end"),
        )
        .select(
            F.col(user_col),
            F.col("_sess").alias("session_id"),
            F.date_format("_start", "yyyy-MM-dd HH:mm:ss").alias("start_s"),
            F.date_format("_end", "yyyy-MM-dd HH:mm:ss").alias("end_s"),
            "n_events",
            (
                F.col("_end").cast("timestamp").cast("long")
                - F.col("_start").cast("timestamp").cast("long")
            ).alias("duration_s"),
        )
    )

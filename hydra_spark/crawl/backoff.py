"""Per-domain politeness: rate windows + 429/quota cool-off.

Reference: udata_hydra/crawl/helpers.py:77-150 (`is_domain_backoff`) —
an N+1 per-URL query in the reference; here ONE grouped aggregate per
round, broadcast to the batch (SURVEY.md J7/A1/A2). This is the
politeness-correctness point at scale: the budget is computed *before*
the fetch stage from the committed checks log, so 4N executors cannot
overshoot 180 req/360 s (risk register, SURVEY.md §7).

Semantics (helpers.py):
- rate:     count(checks on domain in last BACKOFF_PERIOD) ≥ BACKOFF_NB_REQ
- cool-off: latest check on domain within COOL_OFF_PERIOD had status 429
- quota:    that check's x-ratelimit headers parse as floats and
            (limit == -1 → exempt) / (remain == 0 or limit == 0 → backoff)
            / (remain/limit ≤ 0.1 and check within BACKOFF_PERIOD → backoff)
- NO_BACKOFF_DOMAINS always pass.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from hydra_spark.config import HydraConfig


def domain_backoff(
    checks: DataFrame | None,
    cfg: HydraConfig,
    now: str,
    crawl_delays: DataFrame | None = None,
) -> DataFrame | None:
    """Backed-off domains as of `now`: DataFrame(domain, backoff_reason).

    ``crawl_delays(domain, crawl_delay)`` (robots.crawl_delays_from_
    robots_pages) tightens the rate budget per host: a declared delay of
    d seconds caps the window at floor(backoff_period / d) requests
    (never above cfg.backoff_nb_req). When d exceeds the window itself
    (floor == 0) the window budget can't express the spacing, so the
    domain is instead HELD until ``now - last_check >= d`` — the
    politeness contract for the most delay-sensitive hosts (a 7200 s
    delay must not collapse to one request per backoff_period). The
    delays table is hosts-sized — always broadcast; the hold scan
    prunes to long-delay hosts via an inner broadcast join before it
    aggregates anything.

    Returns None when there is no checks history yet.
    """
    if checks is None:
        return None
    now_ts = F.to_timestamp(F.lit(now))
    since_rate = now_ts - F.make_interval(secs=F.lit(float(cfg.backoff_period)))
    since_cool = now_ts - F.make_interval(secs=F.lit(float(cfg.cool_off_period)))

    base = checks.where(F.col("domain").isNotNull())

    counted = (
        base.where(F.col("created_at") >= since_rate)
        .groupBy("domain")
        .agg(F.count("*").alias("nb_req"))
    )
    limit_req = F.lit(int(cfg.backoff_nb_req))
    hold = None
    if crawl_delays is not None:
        delays = crawl_delays.select(
            F.col("domain"), F.col("crawl_delay").cast("double").alias("_cd")
        ).where(F.col("_cd") > 0)
        # Window-expressible delays (d < period): tighten the rate budget.
        # floor(period/d) >= 1 here, so the budget never degenerates to 0.
        counted = counted.join(
            F.broadcast(delays.where(F.col("_cd") < float(cfg.backoff_period))),
            "domain",
            "left",
        )
        limit_req = F.least(
            limit_req,
            F.coalesce(
                F.floor(F.lit(float(cfg.backoff_period)) / F.col("_cd")).cast("int"),
                limit_req,
            ),
        )
        # Delays >= period: hold until the declared spacing has elapsed
        # since the last check. Inner broadcast join prunes the scan to
        # long-delay hosts before the filter/dedup.
        long_d = delays.where(F.col("_cd") >= float(cfg.backoff_period))
        hold = (
            base.join(F.broadcast(long_d), "domain", "inner")
            .where(F.col("created_at") > now_ts - F.make_interval(secs=F.col("_cd")))
            .select(
                "domain",
                F.concat(
                    F.lit("Crawl-delay "),
                    F.col("_cd").cast("long").cast("string"),
                    F.lit("s not yet elapsed"),
                ).alias("backoff_reason"),
            )
        )
    rate = (
        counted.where(F.col("nb_req") >= limit_req)
        .select(
            "domain",
            F.concat(F.lit("Too many requests: "), F.col("nb_req").cast("string")).alias(
                "backoff_reason"
            ),
        )
    )
    if hold is not None:
        rate = rate.unionByName(hold)

    w = Window.partitionBy("domain").orderBy(F.desc("created_at"), F.desc("id"))
    latest = (
        base.where(F.col("created_at") >= since_cool)
        .withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
    )
    # try_cast semantics: non-numeric header values → NULL → no backoff
    # (the reference swallows ValueError/TypeError, helpers.py:137-140)
    remain = F.element_at("headers", F.lit("x-ratelimit-remaining")).try_cast("double")
    limit = F.element_at("headers", F.lit("x-ratelimit-limit")).try_cast("double")
    quota_burn = (
        remain.isNotNull()
        & limit.isNotNull()
        & (limit != -1)
        & (
            (remain == 0)
            | (limit == 0)
            | ((remain / limit <= 0.1) & (F.col("created_at") > since_rate))
        )
    )
    cool = latest.where((F.col("status") == 429) | quota_burn).select(
        "domain",
        F.when(F.col("status") == 429, F.lit("429 status code has been returned on the latest call"))
        .otherwise(F.lit("X-ratelimit reached"))
        .alias("backoff_reason"),
    )

    out = rate.unionByName(cool).dropDuplicates(["domain"])
    if cfg.no_backoff_domains:
        out = out.where(~F.col("domain").isin(*cfg.no_backoff_domains))
    return out


def split_backoff(batch: DataFrame, backoff: DataFrame | None):
    """(go, backed_off): broadcast anti/semi join of the batch against the
    per-round backed-off domain set."""
    if backoff is None:
        return batch, None
    b = F.broadcast(backoff)
    go = batch.join(b, "domain", "left_anti")
    held = batch.join(b, "domain", "inner")  # keeps backoff_reason
    return go, held

"""robots.txt gating as a grouped rule join (north rule).

The reference crawls data.gouv-registered resources and does not parse
robots.txt; the north rule requires robots enforcement alongside the
politeness budgets, so it is a first-class stage here:

- rules live in a `robots_rules(domain, disallow_prefix)` table — in
  production parsed from each host's robots.txt during a discovery
  round; in this sandbox synthesized deterministically per host.
- enforcement is a broadcast join + `startswith` on the URL path: rows
  matching a disallowed prefix are split out and recorded as error
  checks (never fetched), mirroring how the excluded-pattern clause
  works (F1) but data-driven per host.

Scale: the rule table is ~hosts-sized (≪ frontier), always broadcast;
the path test is a pure column expression.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

ROBOTS_ERROR = "blocked by robots.txt"


def synthetic_robots_rules(pages_or_frontier: DataFrame) -> DataFrame:
    """Deterministic per-host rules for the synthetic corpus: every
    fifth host (by murmur3 of its domain) disallows `/private/`."""
    from hydra_spark.functions.urls import url_domain

    domains = pages_or_frontier.select(url_domain("url").alias("domain")).distinct()
    return (
        domains.where(F.col("domain").isNotNull())
        .where(F.pmod(F.hash("domain"), F.lit(5)) == 0)
        .select("domain", F.lit("/private/").alias("disallow_prefix"))
    )


def split_robots(batch: DataFrame, rules: DataFrame | None):
    """(allowed, blocked): batch rows whose URL path starts with ANY
    disallowed prefix for their domain are blocked. `batch` must carry
    a `domain` column (select_batch provides it).

    Rules are aggregated to ONE row per domain (collect_list of
    prefixes) before the join: a row-per-rule left join would (a) leak
    a URL blocked by one prefix into `allowed` via the other rule rows
    and (b) duplicate every allowed URL once per rule — real robots.txt
    files have many Disallow lines."""
    if rules is None:
        return batch, None
    per_domain = rules.groupBy("domain").agg(
        F.collect_list("disallow_prefix").alias("_disallow")
    )
    r = F.broadcast(per_domain.withColumnRenamed("domain", "_rdom"))
    joined = batch.join(r, batch.domain == r._rdom, "left")
    path = F.regexp_replace(F.col("url"), r"^[a-zA-Z][a-zA-Z0-9+.\-]*://[^/]+", "")
    hit = F.col("_disallow").isNotNull() & F.exists(
        "_disallow", lambda p: path.startswith(p)
    )
    allowed = joined.where(~hit).drop("_rdom", "_disallow")
    blocked = joined.where(hit).drop("_rdom", "_disallow")
    return allowed, blocked

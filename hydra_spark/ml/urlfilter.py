"""URL-level filtering — the FIRST gate of a Common-Crawl curation
pipeline (RefinedWeb §3.1.1 runs a 4.6M-domain blocklist + URL word
scoring BEFORE fetching or extracting anything; C4 and MassiveWeb have
equivalent stages). Filtering on the URL string alone is the cheapest
possible drop: no fetch, no parse, pure expression work.

Two blocklist shapes:

- python collection (≲100k domains): compiled into a literal array,
  matched with ``arrays_overlap`` against the host's label-aligned
  suffixes — pure whole-stage-codegen, zero joins.
- DataFrame (the 4.6M-domain case): a chain of ``max_domain_depth``
  BROADCAST equi-joins, one per suffix depth. Each is a map-side hash
  probe — the URL side never shuffles, and a blocklist of millions of
  rows is ~100 MB broadcast, well within executor budgets. (An
  explode+rejoin would need a regroup shuffle of the 10^10-row URL
  side; a non-equi ``array_contains`` join would degenerate to a
  BroadcastNestedLoopJoin. The fixed-depth chain avoids both.)

Subdomain semantics: a blocklist entry blocks itself and every
subdomain (``example.com`` blocks ``ads.example.com``), matching how
UT1-style lists are meant to be applied.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["host_suffixes", "url_quality_filter", "DEFAULT_URL_KEYWORDS"]

# RefinedWeb-style soft URL-word weights: one strong word or a couple
# of weak ones push a URL over the default 0.5 threshold.
DEFAULT_URL_KEYWORDS: dict[str, float] = {
    "casino": 1.0,
    "porn": 1.0,
    "xxx": 1.0,
    "bonus": 0.5,
    "download": 0.4,
    "free": 0.4,
    "webcam": 0.8,
}


def host_suffixes(host: Column) -> Column:
    """array<string> of the host's label-aligned suffixes, shortest
    last: a.b.example.com → [a.b.example.com, b.example.com,
    example.com, com]. Blocklist membership of ANY suffix blocks the
    host (subdomain matching)."""
    labels = F.split(host, r"\.")
    n = F.size(labels)
    idx = F.sequence(F.lit(0), F.greatest(n - 1, F.lit(0)))
    return F.transform(idx, lambda i: F.array_join(F.slice(labels, i + 1, n), "."))


def _keyword_score(url_lower: Column, weights: dict[str, float]) -> Column:
    terms = [
        F.when(url_lower.contains(kw), F.lit(float(w))).otherwise(F.lit(0.0))
        for kw, w in sorted(weights.items())
    ]
    return F.round(reduce(lambda a, b: a + b, terms), 6)


def url_quality_filter(
    df: DataFrame,
    blocklist,
    keyword_weights: dict[str, float] | None = None,
    url_col: str = "url",
    threshold: float = 0.5,
    max_domain_depth: int = 4,
) -> DataFrame:
    """Annotate every URL with the RefinedWeb-style URL gate:

    - ``host``: lowercased netloc
    - ``domain_blocked``: host (or any parent domain) is on the
      blocklist — see module docstring for the two blocklist shapes
    - ``url_score``: sum of keyword weights whose keyword appears in
      the lowercased URL
    - ``keep``: not blocked AND score < ``threshold``

    Null/unparseable-host URLs are never domain-blocked (the crawler
    flags them separately as F5 errors) but still keyword-score.
    """
    weights = DEFAULT_URL_KEYWORDS if keyword_weights is None else keyword_weights
    url = F.col(url_col)
    # try_parse_url: crawl frontiers contain garbage URLs; NULL host
    # (never throw) is the right behavior for a bulk gate
    host = F.lower(F.try_parse_url(url, F.lit("HOST")))
    out = df.withColumn("host", host)

    if isinstance(blocklist, DataFrame):
        b = (
            blocklist.select(F.lower(F.col(blocklist.columns[0])).alias("_bd"))
            .where(F.col("_bd").isNotNull())
            .distinct()
        )
        labels = F.split(F.col("host"), r"\.")
        n = F.size(labels)
        flags = []
        for depth in range(1, max_domain_depth + 1):
            sfx = F.when(
                n >= depth, F.array_join(F.slice(labels, n - depth + 1, depth), ".")
            )
            bd = b.withColumnRenamed("_bd", f"_bd{depth}").withColumn(
                f"_hit{depth}", F.lit(True)
            )
            out = out.withColumn(f"_s{depth}", sfx).join(
                F.broadcast(bd), F.col(f"_s{depth}") == F.col(f"_bd{depth}"), "left"
            )
            flags.append(F.coalesce(F.col(f"_hit{depth}"), F.lit(False)))
        blocked = reduce(lambda a, c: a | c, flags)
        out = out.withColumn("domain_blocked", blocked).drop(
            *[c for d in range(1, max_domain_depth + 1) for c in (f"_s{d}", f"_bd{d}", f"_hit{d}")]
        )
    else:
        lits = F.array(*[F.lit(str(d).lower()) for d in sorted(set(blocklist))])
        out = out.withColumn(
            "domain_blocked",
            F.coalesce(F.arrays_overlap(host_suffixes(F.col("host")), lits), F.lit(False)),
        )

    out = out.withColumn("url_score", _keyword_score(F.lower(url), weights))
    return out.withColumn(
        "keep", ~F.col("domain_blocked") & (F.col("url_score") < F.lit(float(threshold)))
    )

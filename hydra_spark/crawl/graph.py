"""Link-graph operators: host-level rank for crawl prioritization.

The reference crawls a fixed catalog, so it never needs to decide
WHICH newly-discovered host deserves fetch budget; a Common-Crawl-style
crawler does (CC publishes exactly this artifact — the host-level
webgraph + its PageRank/harmonic ranks — and production crawlers
schedule by an importance score, e.g. OPIC in Nutch). This module
derives the host graph from discovered links and runs a damped
power-iteration rank over it, which `with_host_rank` joins back onto
the frontier as a scheduling signal.

Scale design (10^10 URLs → ~10^8 hosts, ~10^10 host-edges):
- the EDGE table (the big side) shuffles ONCE: deduped, degree-joined
  and hash-partitioned on src at setup; every iteration reuses that
  partitioning, so per-iteration shuffles move only host-cardinality
  rank rows (ranks→src join + contribution groupBy on dst).
- dangling mass is a scalar aggregate per iteration (a tree-reduce,
  not a collect of rows).
- `localCheckpoint` per iteration truncates the lineage so the plan
  does not grow with iteration count (same pattern as
  ml.dedup.connected_components).
- anchor extraction is pure JVM expression work (regexp_extract_all +
  transform), fused into the fetch scan — zero Python, zero shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from hydra_spark.functions.urls import url_domain

__all__ = [
    "host_edges",
    "host_rank",
    "anchor_texts",
    "with_host_rank",
    "score_frontier_by_anchors",
]

_HOST_RE = r"^[a-zA-Z][a-zA-Z0-9+.\-]*://([^/?#:]+)"


def host_edges(
    links: DataFrame, url_col: str = "url", link_col: str = "link"
) -> DataFrame:
    """(src_host, dst_host) distinct edges from (page url, resolved
    link) rows — `crawl.discover.extract_links` output. Self-loops
    (intra-host navigation, the bulk of hrefs on any real page) are
    dropped: they carry no cross-host scheduling signal and would
    dominate the edge table. One aggregation keyed on the edge pair."""
    src = F.lower(F.regexp_extract(F.col(url_col), _HOST_RE, 1))
    dst = F.lower(F.regexp_extract(F.col(link_col), _HOST_RE, 1))
    return (
        links.select(src.alias("src_host"), dst.alias("dst_host"))
        .where((F.col("src_host") != "") & (F.col("dst_host") != ""))
        .where(F.col("src_host") != F.col("dst_host"))
        .distinct()
    )


def host_rank(
    edges: DataFrame,
    iterations: int = 10,
    damping: float = 0.85,
    src_col: str = "src_host",
    dst_col: str = "dst_host",
) -> DataFrame:
    """Damped power-iteration rank (PageRank, Brin & Page 1998) over
    the host graph → (host, rank), sum(rank) = 1. Dangling hosts (no
    out-edges) redistribute their mass uniformly each iteration — the
    standard stochastic-matrix completion, so the result is a proper
    probability distribution and the crawl budget it implies is
    conserved.

    Per-iteration cost: ONE join of host-cardinality ranks against the
    pre-partitioned edge table + ONE groupBy(dst) — the edge table
    itself never reshuffles after setup.
    """
    e = (
        edges.select(F.col(src_col).alias("src"), F.col(dst_col).alias("dst"))
        .where(F.col("src").isNotNull() & F.col("dst").isNotNull())
        .distinct()
    )
    hosts = (
        e.select(F.col("src").alias("host"))
        .union(e.select(F.col("dst").alias("host")))
        .distinct()
        .localCheckpoint()
    )
    n = hosts.count()
    if n == 0:
        return hosts.select("host", F.lit(0.0).alias("rank"))
    deg = e.groupBy("src").agg(F.count(F.lit(1)).alias("out"))
    # the big side shuffles once: dedup + degree join + partition on src
    ej = e.join(deg, "src").repartition("src").localCheckpoint()

    ranks = hosts.select("host", F.lit(1.0 / n).alias("rank"))
    has_out = deg.select(F.col("src").alias("host"))
    for _ in range(iterations):
        dangling = (
            ranks.join(has_out, "host", "left_anti")
            .agg(F.coalesce(F.sum("rank"), F.lit(0.0)))
            .first()[0]
        )
        contrib = (
            ej.join(ranks.withColumnRenamed("host", "src"), "src")
            .select(F.col("dst").alias("host"), (F.col("rank") / F.col("out")).alias("c"))
            .groupBy("host")
            .agg(F.sum("c").alias("c"))
        )
        base = (1.0 - damping) / n
        ranks = (
            hosts.join(contrib, "host", "left")
            .select(
                "host",
                (
                    F.lit(base)
                    + F.lit(damping)
                    * (F.coalesce(F.col("c"), F.lit(0.0)) + F.lit(dangling / n))
                ).alias("rank"),
            )
            .localCheckpoint()
        )
    return ranks


def anchor_texts(
    df: DataFrame,
    html_col: str = "html",
    url_col: str = "url",
    max_anchors: int = 1000,
) -> DataFrame:
    """(url, link, anchor) rows: every ``<a href=...>text</a>`` in the
    fetched HTML with its RAW href (unresolved, WAT convention) and its
    whitespace-collapsed anchor text — the classic relevance signal a
    focused crawler scores frontier URLs with (and the snippet source
    for search indexing). Entirely JVM expression work, fused into the
    fetch scan; capped per page like extract_links."""
    html_str = F.col(html_col).cast("string")
    tag_re = r"""(?i)<a\s[^>]*href\s*=\s*["'][^"']+["'][^>]*>[^<]*</a>"""
    href_re = r"""(?i)href\s*=\s*["']([^"']+)["']"""
    tags = F.slice(
        F.regexp_extract_all(html_str, F.lit(tag_re), 0), 1, max_anchors
    )
    pairs = F.transform(
        tags,
        lambda t: F.struct(
            F.regexp_extract(t, href_re, 1).alias("link"),
            F.trim(
                F.regexp_replace(F.regexp_extract(t, r"(?i)>([^<]*)</a>$", 1), r"\s+", " ")
            ).alias("anchor"),
        ),
    )
    staged = df.select(F.col(url_col).alias("_src_url"), pairs.alias("_pairs"))
    return staged.select(
        F.col("_src_url").alias("url"), F.explode("_pairs").alias("p")
    ).select("url", F.col("p.link").alias("link"), F.col("p.anchor").alias("anchor"))


def with_host_rank(
    frontier: DataFrame, ranks: DataFrame, url_col: str = "url"
) -> DataFrame:
    """Attach the host rank to frontier rows (0.0 for unranked hosts) —
    the scheduling hook: order tier-2 claims by ``host_rank`` desc to
    spend fetch budget on important hosts first. Plain equi-join on the
    extracted domain; the rank side is host-cardinality (broadcast it
    upstream when it fits)."""
    r = ranks.select(F.col("host").alias("_host"), F.col("rank").alias("host_rank"))
    return (
        frontier.withColumn("_host", url_domain(F.col(url_col)))
        .join(r, "_host", "left")
        .drop("_host")
        .fillna({"host_rank": 0.0})
    )


def score_frontier_by_anchors(
    anchors: DataFrame,
    keyword_weights: dict[str, float],
    ranks: DataFrame | None = None,
    rank_weight: float = 1.0,
) -> DataFrame:
    """Focused-crawl frontier scoring (Chakrabarti et al. 1999: a
    focused crawler orders its frontier by the RELEVANCE of the text
    around the links that discovered each URL): aggregate every
    anchor's keyword relevance per target link — n_anchors, total and
    best anchor score — and optionally blend in the target host's
    link-graph rank (`host_rank`), giving the priority key the claim
    path orders tier-2 by. Input is `anchor_texts` output; keyword
    scoring is the same contains-weights rule as the URL gate
    (ml/urlfilter), applied to lowercased anchor text.

    Scale: ONE map-side-combinable aggregate keyed on the target link
    (cardinality = distinct discovered URLs); the optional rank blend
    is a broadcast join on the host-cardinality rank table. No UDFs.
    Returns (link, n_anchors, anchor_score, best_anchor_score[,
    priority])."""
    from functools import reduce as _reduce

    a = F.lower(F.col("anchor"))
    terms = [
        F.when(a.contains(kw), F.lit(float(w))).otherwise(F.lit(0.0))
        for kw, w in sorted(keyword_weights.items())
    ]
    score = _reduce(lambda x, y: x + y, terms) if terms else F.lit(0.0)
    agg = (
        anchors.select("link", score.alias("_s"))
        .groupBy("link")
        .agg(
            F.count(F.lit(1)).alias("n_anchors"),
            F.round(F.sum("_s"), 6).alias("anchor_score"),
            F.round(F.max("_s"), 6).alias("best_anchor_score"),
        )
    )
    if ranks is None:
        return agg
    host = F.lower(F.regexp_extract(F.col("link"), _HOST_RE, 1))
    r = F.broadcast(
        ranks.select(F.col("host").alias("_h"), F.col("rank").alias("_r"))
    )
    return (
        agg.withColumn("_host", host)
        .join(r, F.col("_host") == F.col("_h"), "left")
        .select(
            "link",
            "n_anchors",
            "anchor_score",
            "best_anchor_score",
            F.round(
                F.col("anchor_score")
                + F.lit(float(rank_weight)) * F.coalesce(F.col("_r"), F.lit(0.0)),
                6,
            ).alias("priority"),
        )
    )


def host_link_stats(links: DataFrame, url_col: str = "url", link_col: str = "link") -> DataFrame:
    """Per-source-host outlink profile over `extract_links` output:
    how many links a host emits, how many distinct hosts it points at,
    and what fraction stays on-host.  These are the classic frontier-
    planning inputs (Cho & Garcia-Molina, "Parallel crawlers", WWW
    2002): a host with a high external fan-out seeds discovery; a
    near-1.0 internal ratio flags a self-linking silo (or a trap).

    Scale: ONE aggregate keyed on source host (cardinality = hosts,
    not pages); count/sum combine map-side, the distinct-host count is
    a standard partial-distinct expand. No UDFs.
    Returns (src_host, outlinks, distinct_hosts, internal, internal_ratio)."""
    src = F.lower(F.regexp_extract(F.col(url_col), _HOST_RE, 1))
    dst = F.lower(F.regexp_extract(F.col(link_col), _HOST_RE, 1))
    return (
        links.select(src.alias("src_host"), dst.alias("dst_host"))
        .groupBy("src_host")
        .agg(
            F.count(F.lit(1)).alias("outlinks"),
            F.countDistinct("dst_host").alias("distinct_hosts"),
            F.sum(
                F.when(F.col("dst_host") == F.col("src_host"), 1).otherwise(0)
            ).alias("internal"),
            F.round(
                F.sum(
                    F.when(F.col("dst_host") == F.col("src_host"), 1).otherwise(0)
                ) / F.count(F.lit(1)),
                4,
            ).alias("internal_ratio"),
        )
    )

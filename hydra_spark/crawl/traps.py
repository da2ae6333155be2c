"""Crawler-trap detection: URL template mining over the frontier.

The reference crawls a curated catalog, so it never meets calendar
pages, session-id pagination, or faceted-search explosions; a
discovery crawler does, and its frontier hygiene depends on spotting
hosts whose URL space is a few templates with unbounded fan-out (the
classic spider-trap signal — Heydon & Najork's Mercator describes the
hazard, and production crawlers cap URLs per pattern). This module
collapses each URL to its template — digit runs in the path become
``{N}``, query-param VALUES are dropped and the sorted param-name set
kept — and counts frontier URLs per (host, template); a template with
a variable element and large fan-out is a trap candidate whose claims
the scheduler should cap or deprioritize (compose with
`select_batch`'s per-domain claim cap).

Scale: pure JVM expression work (regexp + array ops, whole-stage
codegen) and ONE map-side-combinable groupBy on (host, template) —
cardinality ≈ number of distinct templates, tiny next to the frontier.
No Python, no second shuffle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["url_template", "url_templates", "trap_exclusion_patterns"]

_HOST_RE = r"^[a-zA-Z][a-zA-Z0-9+.\-]*://([^/?#]+)"
_PATH_RE = r"^[a-zA-Z][a-zA-Z0-9+.\-]*://[^/?#]+([^?#]*)"
_QUERY_RE = r"\?([^#]*)"
_PARAM_NAME_RE = r"(?:^|&)([^=&]+)"


def url_template(url: Column | str) -> Column:
    """host + path-with-digit-runs-as-N + '?' + sorted distinct query
    param names (values dropped) — the equivalence class a trap
    detector counts. ``https://h/p/31?b=2&a=1`` → ``h/p/{N}?a,b``."""
    u = F.col(url) if isinstance(url, str) else url
    host = F.lower(F.regexp_extract(u, _HOST_RE, 1))
    tpath = F.regexp_replace(F.regexp_extract(u, _PATH_RE, 1), r"[0-9]+", "{N}")
    names = F.array_sort(
        F.array_distinct(
            F.regexp_extract_all(F.regexp_extract(u, _QUERY_RE, 1), F.lit(_PARAM_NAME_RE), 1)
        )
    )
    pstr = F.array_join(names, ",")
    return F.concat(
        host, tpath, F.when(pstr == "", F.lit("")).otherwise(F.concat(F.lit("?"), pstr))
    )


def url_templates(
    df: DataFrame, url_col: str = "url", min_urls: int = 100
) -> DataFrame:
    """(host, template, n_urls, is_trap_candidate) per distinct URL
    template on the frontier, trap-flagged when the template has a
    variable element (a collapsed digit run) and fan-out ≥ `min_urls`.
    One aggregate; feed the flagged rows to the claim path as a
    per-template budget (or an exclusion pattern, reference F1)."""
    u = F.col(url_col)
    host = F.lower(F.regexp_extract(u, _HOST_RE, 1))
    g = (
        df.select(host.alias("host"), url_template(u).alias("template"))
        .where(F.col("host") != "")
        .groupBy("host", "template")
        .agg(F.count(F.lit(1)).alias("n_urls"))
    )
    variable = F.col("template").contains("{N}")
    return g.select(
        "host",
        "template",
        "n_urls",
        (variable & (F.col("n_urls") >= min_urls)).alias("is_trap_candidate"),
    )


def trap_exclusion_patterns(
    templates: DataFrame, max_patterns: int = 1000
) -> list[str]:
    """SQL LIKE exclusion patterns for the flagged templates — the glue
    into the F1 excluded-patterns path (reference db/resource.py:157-170
    semantics): append to ``cfg.excluded_patterns`` via ``cfg.with_``
    and `select_batch.eligible_frontier` drops the trap URL space from
    every later round. ``{N}`` collapses to ``%``; the param-name
    suffix is dropped so any value combination matches. Driver-side by
    design — the flagged set is a bounded report (``max_patterns``
    rows, largest fan-out first), never corpus-sized."""
    rows = (
        templates.where("is_trap_candidate")
        .orderBy(F.desc("n_urls"), F.asc("template"))
        .limit(max_patterns)
        .collect()
    )
    return [
        "%://" + r.template.split("?")[0].replace("{N}", "%") + "%" for r in rows
    ]

"""Soft-404 detection (crawl quality, pure column expressions).

The reference derives availability from the HTTP status alone
(udata_hydra/crawl/process_check_data.py:37-74 — ``status < 400`` ⇒
available); at web scale a large share of dead pages answer ``200 OK``
with an error body, silently poisoning a change-tracking crawler and
any corpus built from it.  This detector follows the content-signal
family of Bar-Yossef, Broder, Kumar & Tomkins, *"Sic transit gloria
telae: towards an understanding of the web's decay"* (WWW 2004):
error-marker phrases plus a thin-body heuristic.

Everything is a JVM column expression — no UDF, no shuffle; at 10^10
URLs this composes into the fetch round as a free projection.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# lowercase marker phrases; EN + FR (the reference crawls data.gouv.fr)
SOFT404_MARKERS: tuple[str, ...] = (
    "page not found",
    "error 404",
    "404 not found",
    "could not be found",
    "no longer available",
    "does not exist",
    "page introuvable",
    "n'existe pas",
)

#: bodies shorter than this (after trim) are "thin" candidates
DEFAULT_MIN_CHARS = 80


def soft404_marker_expr(text_col: Column | str) -> Column:
    """True when the page body contains any error-marker phrase."""
    t = F.lower(F.col(text_col) if isinstance(text_col, str) else text_col)
    expr = F.lit(False)
    for m in SOFT404_MARKERS:
        expr = expr | F.contains(t, F.lit(m))
    return expr


def detect_soft404(
    df: DataFrame,
    text_col: str = "text",
    status_col: str = "status",
    min_chars: int = DEFAULT_MIN_CHARS,
) -> DataFrame:
    """Tag every fetched page with a soft-404 verdict.

    Adds ``reason`` ('marker' | 'thin' | NULL) and ``is_soft404``
    (reason present AND the server *claimed* success with 200 — a real
    4xx/5xx is an honest error, not a soft one).
    """
    marker = soft404_marker_expr(text_col)
    thin = F.length(F.trim(F.col(text_col))) < F.lit(min_chars)
    reason = (
        F.when(marker, F.lit("marker")).when(thin, F.lit("thin")).otherwise(F.lit(None).cast("string"))
    )
    return df.withColumn("reason", reason).withColumn(
        "is_soft404", (F.col(status_col) == 200) & F.col("reason").isNotNull()
    )

"""HTTP conditional-revalidation accounting (RFC 9110 §13.1 / RFC 7232).

The reference stores every response's headers per check
(udata_hydra/crawl/process_check_data.py:37-74) but always refetches
with an unconditional GET.  At the 10^10-URL scale this engine targets,
``If-None-Match`` / ``If-Modified-Since`` revalidation is the
difference between re-downloading the web every round and a 304
heartbeat.  This module measures, per domain, how many refetches
carried an unchanged validator and the payload bytes a conditional
crawler would have saved — the planning input for enabling conditional
fetches on a domain.

Validator precedence follows RFC 9110 §13.1.2: when the current
response carries an ``ETag`` the entity tag is authoritative;
``Last-Modified`` is consulted only in its absence.

Scale shape: ONE window keyed on ``resource_id`` (the checks log's
natural partitioning) feeds a tiny per-domain aggregate — the corpus
is never sorted globally and the aggregate is map-side combinable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from hydra_spark.functions.headers import header


def with_revalidation_flag(checks: DataFrame) -> DataFrame:
    """Per check: could this fetch have been answered with 304?

    Adds ``is_refetch`` (a previous check exists for the resource) and
    ``revalidatable`` (the preferred validator — ETag, else
    Last-Modified — is present and byte-identical to the previous
    check's).
    """
    w = Window.partitionBy("resource_id").orderBy("created_at", "id")
    cur = (
        checks.withColumn("_etag", header("headers", "etag"))
        .withColumn("_lm", header("headers", "last-modified"))
    )
    cur = (
        cur.withColumn("_prev_id", F.lag("id").over(w))
        .withColumn("_prev_etag", F.lag("_etag").over(w))
        .withColumn("_prev_lm", F.lag("_lm").over(w))
    )
    # eqNullSafe: a validator the previous check did not carry is a
    # mismatch, not a NULL verdict (three-valued logic would otherwise
    # leak NULL into the flag)
    etag_match = F.col("_etag").isNotNull() & F.col("_etag").eqNullSafe(F.col("_prev_etag"))
    lm_match = (
        F.col("_etag").isNull()
        & F.col("_lm").isNotNull()
        & F.col("_lm").eqNullSafe(F.col("_prev_lm"))
    )
    return (
        cur.withColumn("is_refetch", F.col("_prev_id").isNotNull())
        .withColumn("revalidatable", F.col("is_refetch") & (etag_match | lm_match))
        .drop("_etag", "_lm", "_prev_id", "_prev_etag", "_prev_lm")
    )


def revalidation_stats(checks: DataFrame, by: str = "domain") -> DataFrame:
    """Per-`by` conditional-fetch savings over the checks log:
    refetches, 304-eligible refetches, eligibility rate, bytes saved."""
    flagged = with_revalidation_flag(checks).where(F.col("is_refetch"))
    return flagged.groupBy(by).agg(
        F.count("*").alias("refetches"),
        F.sum(F.when(F.col("revalidatable"), 1).otherwise(0)).alias("revalidatable"),
        F.round(
            F.sum(F.when(F.col("revalidatable"), 1).otherwise(0)) / F.count("*"), 4
        ).alias("revalidatable_pct"),
        F.sum(
            F.when(F.col("revalidatable"), F.col("filesize")).otherwise(F.lit(0))
        ).alias("bytes_saved"),
    )

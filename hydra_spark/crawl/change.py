"""Change detection: early hints + checksum, and the webhook trigger.

Reference truth tables:
- early hints cascade (harvest → last-modified header → content-length):
  udata_hydra/analysis/resource.py:285-336, 339-363 (harvest), 236-258
  (last-modified), 261-282 (content-length)
- checksum compare after download: analysis/resource.py:210-233
- `has_check_changed` (udata webhook trigger):
  udata_hydra/crawl/preprocess_check_data.py:80-126
- status validity: crawl/helpers.py:67-74 (200 ≤ s < 400 valid; 429 → NULL)

Implemented as one `when()` cascade over the (current, previous) check
pair (previous = window latest per resource, SURVEY.md J3/W2). Output
columns: change_status ∈ {changed, unchanged, no_guess},
detected_last_modified_at, detection_method.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from hydra_spark.functions.headers import header

RFC1123 = "EEE, dd MMM yyyy HH:mm:ss 'GMT'"

CHANGED = "changed"
UNCHANGED = "unchanged"
NO_GUESS = "no_guess"


def is_valid_status(status: Column) -> Column:
    """200 ≤ s < 400 → True; 429 → NULL (unknowable); missing status
    (connection error / timeout) → False, so availability is reported
    as unavailable, not unknown (crawl/helpers.py:67-74 returns None
    only for 429 and False for a falsy status)."""
    return (
        F.when(status == 429, F.lit(None).cast("boolean"))
        .when(status.isNull(), F.lit(False))
        .otherwise(status.between(200, 399))
    )


def parse_http_date(col: Column) -> Column:
    """RFC1123 / ISO fallbacks (reference uses `dateparser`; our corpus
    only emits RFC1123 and ISO — C7). Spark ≥3 refuses day-of-week
    letters when *parsing*, so the 'EEE, ' prefix is stripped first."""
    stripped = F.regexp_replace(col, r"^[A-Za-z]{3}, ", "")
    return F.coalesce(
        F.try_to_timestamp(stripped, F.lit("dd MMM yyyy HH:mm:ss 'GMT'")),
        F.try_to_timestamp(stripped, F.lit("dd MMM yyyy HH:mm:ss zzz")),
        F.try_to_timestamp(col),
    )


def detect_changes(df: DataFrame, now: str) -> DataFrame:
    """Expects columns: headers, checksum, created_at, harvest_modified_at
    and prev_* (prev_exists, prev_headers, prev_checksum,
    prev_detected_last_modified_at, prev_created_at). Adds change_status /
    detected_last_modified_at / detection_method."""
    now_ts = F.to_timestamp(F.lit(now))
    prev = F.col("prev_exists")

    cur_lm_raw = header("headers", "last-modified")
    prev_lm_raw = header("prev_headers", "last-modified")
    cur_lm = parse_http_date(cur_lm_raw)
    cur_cl = header("headers", "content-length")
    prev_cl = header("prev_headers", "content-length")
    harvest = F.col("harvest_modified_at")
    prev_dlma = F.col("prev_detected_last_modified_at")

    # 1) harvest metadata (resource.py:339-363): needs a previous check
    harvest_applies = prev & harvest.isNotNull()
    harvest_changed = harvest != F.coalesce(prev_dlma, F.to_timestamp(F.lit("1900-01-01")))

    # 2) last-modified header (resource.py:236-258)
    lm_first = ~prev & cur_lm_raw.isNotNull()              # first check, header present
    lm_applies = prev & cur_lm_raw.isNotNull()
    # null-safe: a previous check WITHOUT the header vs a current check
    # WITH it is a change (resource.py detect_..._from_last_modified
    # returns HAS_CHANGED) — a plain != would yield NULL and fall
    # through to UNCHANGED, suppressing re-parsing
    lm_changed = ~cur_lm_raw.eqNullSafe(prev_lm_raw)

    # 3) content-length (resource.py:261-282)
    cl_applies = prev & cur_cl.isNotNull() & prev_cl.isNotNull()
    cl_changed = cur_cl != prev_cl

    # 4) checksum after download (resource.py:210-233)
    ck_applies = prev & F.col("checksum").isNotNull() & F.col("prev_checksum").isNotNull()
    ck_changed = F.col("checksum") != F.col("prev_checksum")

    status = (
        F.when(harvest_applies & harvest_changed, F.lit(CHANGED))
        .when(harvest_applies, F.lit(UNCHANGED))
        .when(lm_first, F.lit(CHANGED))
        .when(lm_applies & lm_changed, F.lit(CHANGED))
        .when(lm_applies, F.lit(UNCHANGED))
        .when(cl_applies & cl_changed, F.lit(CHANGED))
        .when(cl_applies & prev_dlma.isNotNull(), F.lit(UNCHANGED))
        .when(ck_applies & ck_changed, F.lit(CHANGED))
        .when(ck_applies & prev_dlma.isNotNull(), F.lit(UNCHANGED))
        .otherwise(F.lit(NO_GUESS))
    )
    method = (
        F.when(harvest_applies, F.lit("harvest-resource-metadata"))
        .when(lm_first | lm_applies, F.lit("last-modified-header"))
        .when(cl_applies & cl_changed, F.lit("content-length-header"))
        .when(cl_applies & prev_dlma.isNotNull(), F.lit("previous-check-detection"))
        .when(ck_applies & ck_changed, F.lit("computed-checksum"))
        .when(ck_applies & prev_dlma.isNotNull(), F.lit("previous-check-detection"))
        .otherwise(F.lit(None).cast("string"))
    )
    lm_at = (
        F.when(harvest_applies, harvest)
        .when(lm_first | lm_applies, cur_lm)
        .when(cl_applies & cl_changed, F.col("created_at"))
        .when(cl_applies & prev_dlma.isNotNull(), prev_dlma)
        .when(ck_applies & ck_changed, now_ts)
        .when(ck_applies & prev_dlma.isNotNull(), prev_dlma)
        .otherwise(F.lit(None).cast("timestamp"))
    )

    return (
        df.withColumn("change_status", status)
        .withColumn("detection_method", method)
        .withColumn("detected_last_modified_at", lm_at)
    )


def has_check_changed_expr() -> Column:
    """The udata-webhook trigger (preprocess_check_data.py:80-126):
    first check ∨ status change ∨ availability loss ∨ timeout flip ∨
    content-length/type change ∨ CORS change."""
    prev = F.col("prev_exists")
    cur_ok = is_valid_status(F.col("status"))
    prev_ok = is_valid_status(F.col("prev_status"))

    def hdr_ne(name: str) -> Column:
        a, b = header("headers", name), header("prev_headers", name)
        return ~(a.eqNullSafe(b))

    return (
        ~prev
        | ~F.col("status").eqNullSafe(F.col("prev_status"))
        | (prev_ok.eqNullSafe(F.lit(True)) & ~cur_ok.eqNullSafe(F.lit(True)))
        | ~F.col("timeout").eqNullSafe(F.col("prev_timeout"))
        | hdr_ne("content-length")
        | hdr_ne("content-type")
        # maps are not orderable — compare a canonical JSON rendering
        # (our maps are built with a fixed key order)
        | ~F.to_json(F.col("cors_headers")).eqNullSafe(F.to_json(F.col("prev_cors_headers")))
    )

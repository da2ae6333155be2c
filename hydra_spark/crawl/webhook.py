"""udata webhook payloads → outbox table (S16).

Reference: udata_hydra/crawl/preprocess_check_data.py:39-71 builds a
payload per changed check and enqueues `send` (utils/http.py:79-111,
`UdataPayload`). We do not call external HTTP: payloads land in an
append-only `outbox` table a delivery worker would drain — same
contract, observable + replayable.

Payload fields mirror the reference exactly (check:id, check:available,
check:status, check:timeout, check:date, check:error,
check:headers:content-type/-length, check:cors:* when present).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from hydra_spark.crawl.change import is_valid_status
from hydra_spark.functions.headers import content_type_base, header

CORS_HEADER_FIELDS = [
    "access-control-allow-origin",
    "access-control-allow-methods",
    "access-control-allow-headers",
    "access-control-expose-headers",
    "access-control-allow-credentials",
]


_JSON_OPTS = {"ignoreNullFields": "false"}  # UdataPayload sends explicit nulls


def _json_body(struct: F.Column) -> F.Column:
    """to_json minus the surrounding braces (for category assembly)."""
    return F.regexp_replace(F.regexp_replace(F.to_json(struct, _JSON_OPTS), r"^\{", ""), r"\}$", "")


def webhook_payloads(cur: DataFrame, now: str) -> DataFrame:
    """One outbox row per check whose `has_check_changed` is true
    (preprocess_check_data.py:39: only changed checks are sent).

    Categories mirror UdataPayload (utils/http.py:24-60): touching any
    field of a category serializes ALL its fields (missing → explicit
    null — "we reset the others to None"), while untouched categories
    are absent entirely. check:* is always present; analysis:* when the
    resource was analysed (checksum/mime/analysis-error known);
    analysis:parsing:* when parsing ran or failed."""
    ct = content_type_base(header("headers", "content-type"))
    cl = header("headers", "content-length").try_cast("long")
    check_part = F.struct(
        F.col("id").alias("check:id"),
        is_valid_status(F.col("status")).alias("check:available"),
        F.col("status").alias("check:status"),
        F.col("timeout").alias("check:timeout"),
        F.to_timestamp(F.lit(now)).alias("check:date"),
        F.col("error").alias("check:error"),
        ct.alias("check:headers:content-type"),
        F.when(cl > 0, cl).alias("check:headers:content-length"),
        *[
            F.element_at("cors_headers", F.lit(f)).alias(f"check:cors:{f}")
            for f in CORS_HEADER_FIELDS
        ],
    )
    analysed = (
        F.col("checksum").isNotNull()
        | F.col("mime_type").isNotNull()
        | F.col("analysis_error").isNotNull()
    )
    analysis_part = F.struct(
        F.col("checksum").alias("analysis:checksum"),
        F.col("filesize").alias("analysis:content-length"),
        F.col("analysis_error").alias("analysis:error"),
        F.col("id").alias("analysis:check_id"),
        F.col("detected_last_modified_at").alias("analysis:last-modified-at"),
        F.col("detection_method").alias("analysis:last-modified-detection"),
        F.col("mime_type").alias("analysis:mime-type"),
    )
    parsed = F.col("parsing_started_at").isNotNull() | F.col("parsing_error").isNotNull()
    parsing_part = F.struct(
        F.col("parsing_error").alias("analysis:parsing:error"),
        F.col("parsing_started_at").alias("analysis:parsing:started_at"),
        F.col("parsing_finished_at").alias("analysis:parsing:finished_at"),
        F.col("parsing_table").alias("analysis:parsing:parsing_table"),
        # export sinks not in scope per round: parquet_* filled by the
        # export job, pmtiles_* permanently NULL (S14 deferred)
        F.lit(None).cast("long").alias("analysis:parsing:parquet_size"),
        F.lit(None).cast("string").alias("analysis:parsing:parquet_url"),
        F.lit(None).cast("long").alias("analysis:parsing:pmtiles_size"),
        F.lit(None).cast("string").alias("analysis:parsing:pmtiles_url"),
        F.lit(None).cast("long").alias("analysis:parsing:geojson_size"),
        F.lit(None).cast("string").alias("analysis:parsing:geojson_url"),
        F.lit(None).cast("string").alias("analysis:parsing:ogc_metadata"),
    )
    payload = F.concat(
        F.lit("{"),
        _json_body(check_part),
        F.when(analysed, F.concat(F.lit(","), _json_body(analysis_part))).otherwise(F.lit("")),
        F.when(parsed, F.concat(F.lit(","), _json_body(parsing_part))).otherwise(F.lit("")),
        F.lit("}"),
    )
    return cur.where(F.col("has_check_changed")).select(
        "dataset_id",
        "resource_id",
        payload.alias("payload"),
        F.to_timestamp(F.lit(now)).alias("queued_at"),
    )

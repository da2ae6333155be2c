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


def webhook_payloads(cur: DataFrame, now: str) -> DataFrame:
    """One outbox row per check whose `has_check_changed` is true
    (preprocess_check_data.py:39: only changed checks are sent)."""
    ct = content_type_base(header("headers", "content-type"))
    cl = header("headers", "content-length").try_cast("long")
    payload = F.to_json(
        F.struct(
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
    )
    return cur.where(F.col("has_check_changed")).select(
        "dataset_id",
        "resource_id",
        payload.alias("payload"),
        F.to_timestamp(F.lit(now)).alias("queued_at"),
    )

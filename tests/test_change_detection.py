"""Change-detection truth table.

Mirrors the reference's tests/test_analysis/test_change_detections.py
cases over the early-hints cascade (harvest → last-modified header →
content-length) and the post-download checksum compare
(udata_hydra/analysis/resource.py:210-363).
"""

from datetime import datetime

from hydra_spark.crawl.change import detect_changes

NOW = "2025-01-15 00:00:00"

SCHEMA = (
    "headers map<string,string>, checksum string, created_at timestamp,"
    " harvest_modified_at timestamp, prev_exists boolean,"
    " prev_headers map<string,string>, prev_checksum string,"
    " prev_detected_last_modified_at timestamp, prev_created_at timestamp"
)


def _detect(spark, **kw):
    row = {
        "headers": None,
        "checksum": None,
        "created_at": datetime.fromisoformat(NOW),
        "harvest_modified_at": None,
        "prev_exists": False,
        "prev_headers": None,
        "prev_checksum": None,
        "prev_detected_last_modified_at": None,
        "prev_created_at": None,
    }
    row.update(kw)
    df = spark.createDataFrame([tuple(row[k] for k in [
        "headers", "checksum", "created_at", "harvest_modified_at", "prev_exists",
        "prev_headers", "prev_checksum", "prev_detected_last_modified_at", "prev_created_at",
    ])], SCHEMA)
    r = detect_changes(df, NOW).first()
    return r["change_status"], r["detection_method"], r["detected_last_modified_at"]


LM1 = "Wed, 01 Jan 2025 00:00:00 GMT"
LM2 = "Thu, 02 Jan 2025 00:00:00 GMT"
PREV_TS = datetime.fromisoformat("2025-01-14 00:00:00")


def test_first_check_no_headers_no_guess(spark):
    s, m, _ = _detect(spark)
    assert s == "no_guess" and m is None


def test_first_check_with_last_modified_changed(spark):
    s, m, lm = _detect(spark, headers={"last-modified": LM1})
    assert s == "changed" and m == "last-modified-header"
    assert lm == datetime.fromisoformat("2025-01-01 00:00:00")


def test_harvest_differs_from_previous_detection(spark):
    s, m, lm = _detect(
        spark,
        harvest_modified_at=datetime.fromisoformat("2025-01-10 00:00:00"),
        prev_exists=True,
        prev_created_at=PREV_TS,
        prev_detected_last_modified_at=datetime.fromisoformat("2025-01-05 00:00:00"),
    )
    assert (s, m) == ("changed", "harvest-resource-metadata")
    assert lm == datetime.fromisoformat("2025-01-10 00:00:00")


def test_harvest_equal_means_unchanged(spark):
    hv = datetime.fromisoformat("2025-01-10 00:00:00")
    s, m, lm = _detect(
        spark,
        harvest_modified_at=hv,
        prev_exists=True,
        prev_created_at=PREV_TS,
        prev_detected_last_modified_at=hv,
    )
    assert (s, m) == ("unchanged", "harvest-resource-metadata") and lm == hv


def test_last_modified_header_changed(spark):
    s, m, lm = _detect(
        spark,
        headers={"last-modified": LM2},
        prev_exists=True,
        prev_headers={"last-modified": LM1},
        prev_created_at=PREV_TS,
    )
    assert (s, m) == ("changed", "last-modified-header")
    assert lm == datetime.fromisoformat("2025-01-02 00:00:00")


def test_last_modified_header_equal_unchanged(spark):
    s, m, _ = _detect(
        spark,
        headers={"last-modified": LM1},
        prev_exists=True,
        prev_headers={"last-modified": LM1},
        prev_created_at=PREV_TS,
    )
    assert (s, m) == ("unchanged", "last-modified-header")


def test_content_length_changed(spark):
    s, m, lm = _detect(
        spark,
        headers={"content-length": "100"},
        prev_exists=True,
        prev_headers={"content-length": "90"},
        prev_created_at=PREV_TS,
    )
    assert (s, m) == ("changed", "content-length-header")
    assert lm == datetime.fromisoformat(NOW)  # current check creation


def test_content_length_equal_with_prior_detection(spark):
    dl = datetime.fromisoformat("2025-01-03 00:00:00")
    s, m, lm = _detect(
        spark,
        headers={"content-length": "100"},
        prev_exists=True,
        prev_headers={"content-length": "100"},
        prev_detected_last_modified_at=dl,
        prev_created_at=PREV_TS,
    )
    assert (s, m, lm) == ("unchanged", "previous-check-detection", dl)


def test_content_length_equal_without_prior_detection_no_guess(spark):
    s, m, _ = _detect(
        spark,
        headers={"content-length": "100"},
        prev_exists=True,
        prev_headers={"content-length": "100"},
        prev_created_at=PREV_TS,
    )
    assert s == "no_guess"


def test_checksum_changed(spark):
    s, m, lm = _detect(
        spark,
        checksum="aaa",
        prev_exists=True,
        prev_checksum="bbb",
        prev_created_at=PREV_TS,
    )
    assert (s, m) == ("changed", "computed-checksum")
    assert lm == datetime.fromisoformat(NOW)


def test_checksum_equal_with_prior_detection(spark):
    dl = datetime.fromisoformat("2025-01-03 00:00:00")
    s, m, lm = _detect(
        spark,
        checksum="aaa",
        prev_exists=True,
        prev_checksum="aaa",
        prev_detected_last_modified_at=dl,
        prev_created_at=PREV_TS,
    )
    assert (s, m, lm) == ("unchanged", "previous-check-detection", dl)


def test_checksum_equal_without_prior_detection_no_guess(spark):
    s, _, _ = _detect(
        spark, checksum="aaa", prev_exists=True, prev_checksum="aaa", prev_created_at=PREV_TS
    )
    assert s == "no_guess"


def test_last_modified_header_appears_is_changed(spark):
    """Previous check lacked the header, current has it → HAS_CHANGED
    (reference detect_resource_change_from_last_modified_header); a
    null-unsafe != would fall through to unchanged and suppress
    re-parsing."""
    s, m, lm = _detect(
        spark,
        headers={"last-modified": LM1},
        prev_exists=True,
        prev_headers={"content-length": "5"},  # no last-modified before
        prev_created_at=PREV_TS,
    )
    assert (s, m) == ("changed", "last-modified-header")
    assert lm == datetime.fromisoformat("2025-01-01 00:00:00")


def test_is_valid_status_truth_table(spark):
    """crawl/helpers.py is_valid_status: None only for 429; a missing
    status (connection error / timeout) is False, not unknown —
    downstream consumers must see the resource as unavailable."""
    from pyspark.sql import functions as F

    from hydra_spark.crawl.change import is_valid_status

    df = spark.createDataFrame(
        [(200,), (302,), (399,), (400,), (429,), (500,), (None,)], "status int"
    )
    got = {
        r["status"]: r["ok"]
        for r in df.withColumn("ok", is_valid_status(F.col("status"))).collect()
    }
    assert got == {200: True, 302: True, 399: True, 400: False, 429: None, 500: False, None: False}

"""validate_then_detect truth table (reference:
tests/test_analysis/test_analysis_csv.py:351-474)."""

import json

from hydra_spark.analysis.inspect import inspect_csv, validate_inspection

PREV_BODY = b"a,epci\n1,13002526500013\n5,38271817900023"


def _prev():
    # previous inspection as stored in tables_index — the detector types
    # epci as format=siret / python_type=string, like csv-detective
    insp = inspect_csv(PREV_BODY)
    assert insp["columns"]["epci"] == {"format": "siret", "python_type": "string", "score": 1.5}
    return insp


def test_new_row_same_types_is_valid():
    body = PREV_BODY + b"\n6,21310555400017"
    got = validate_inspection(body, _prev())
    assert got is not None and got["from_validation"]
    assert got["total_lines"] == 3
    assert got["columns"]["epci"]["python_type"] == "string"  # types kept stable


def test_separator_change_invalid():
    body = b"a;epci\n1;13002526500013"
    assert validate_inspection(body, _prev()) is None


def test_renamed_column_invalid():
    body = b"a,ID_EPCI\n1,13002526500013"
    assert validate_inspection(body, _prev()) is None


def test_format_drift_invalid():
    # previous string column now holds dates → a more specific type fits
    body = b"a,epci\n1,2022-11-03\n5,2025-11-02"
    assert validate_inspection(body, _prev()) is None


def test_uncastable_value_invalid():
    prev = _prev()
    prev["columns"]["a"] = {"format": "int", "python_type": "int", "score": 1.0}
    body = b"a,epci\nnot_an_int,13002526500013"
    assert validate_inspection(body, prev) is None


def test_round_uses_validation_on_recheck(spark, tmp_path):
    """Second crawl of a changed-but-conforming file reuses the previous
    inspection (from_validation flag lands in tables_index)."""
    from hydra_spark.analysis.ingest import process_fetched

    base = b"code,number\n100,1\n200,2"
    prev = inspect_csv(base)
    df = spark.createDataFrame(
        [("http://x/f.csv", "r1", "d1", bytearray(base + b"\n300,3"), "tbl",
          json.dumps(prev))],
        "url string, resource_id string, dataset_id string, html binary,"
        " parsing_table string, prev_inspection string",
    )
    out = process_fetched(df).where("inspection is not null").first()
    insp = json.loads(out["inspection"])
    assert insp.get("from_validation") is True
    assert insp["total_lines"] == 3

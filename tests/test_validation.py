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


def test_format_vocabulary_breadth():
    """csv-detective's wider format family: codes, contact, geo —
    content-detected, with header hints gating the ambiguous ones."""
    from hydra_spark.analysis.casting import detect_column_format

    # value-only formats
    assert detect_column_format(["12345678901234", "98765432109876"]) == ("siret", "string")
    assert detect_column_format(["a@b.fr", "x.y@z.org"]) == ("email", "string")
    assert detect_column_format(["https://a.fr/x", "http://b.fr"]) == ("url", "string")
    assert detect_column_format(["48.85, 2.35", "[43.6, 1.44]"]) == ("latlon", "string")
    assert detect_column_format(['{"type": "Point", "coordinates": [1, 2]}']) == (
        "geojson", "string",
    )
    # hint-gated: postal/insee both ^\d{5}$ — the header disambiguates
    assert detect_column_format(["75056", "2A004"], "code_insee") == (
        "code_commune_insee", "string",
    )
    assert detect_column_format(["75001", "13002"], "code_postal") == ("code_postal", "string")
    assert detect_column_format(["75001"], "montant") is None  # no hint, no claim
    # latitude/longitude: hint + range; python_type stays float
    assert detect_column_format(["48.85", "43.6"], "lat") == ("latitude", "float")
    assert detect_column_format(["2.35", "-1.55"], "longitude") == ("longitude", "float")
    assert detect_column_format(["148.85"], "lat") is None  # out of range
    # range validators kill regex-only matches
    assert detect_column_format(["98.0, 2.0"], "latlon") is None


def test_geo_detection_from_inspection():
    """Content-detected geo formats drive the export like the reference
    (csv_like/to_geojson.py:25-52): a latitude column named 'y' is
    found via the inspection, not the header list."""
    from hydra_spark.exports.geojson import detect_geo_columns

    body = "name,y,x\na,48.85,2.35\nb,43.6,1.44"
    insp = inspect_csv(body.encode())
    assert insp["columns"]["y"]["format"] == "latitude"
    assert insp["columns"]["x"]["format"] == "longitude"
    geo = detect_geo_columns(insp["header"], insp)
    assert geo == {"kind": "latlon_pair", "lat": "y", "lon": "x"}
    # inspection wins over names; without it, names alone find nothing
    assert detect_geo_columns(["name", "y", "x"]) is None
    # geojson format beats the pair
    gj = '"{""type"": ""Point"", ""coordinates"": [1.0, 2.0]}"'
    body2 = f"name,geom,y,x\na,{gj},48.85,2.35"
    insp2 = inspect_csv(body2.encode())
    assert detect_geo_columns(insp2["header"], insp2)["kind"] == "geojson"


def test_format_drift_invalidates_latitude():
    """A previously-latitude column drifting out of range re-detects."""
    body = "name,lat\na,48.85\nb,43.6"
    prev = inspect_csv(body.encode())
    assert prev["columns"]["lat"]["format"] == "latitude"
    drifted = "name,lat\na,148.85\nb,43.6"
    assert validate_inspection(drifted.encode(), prev) is None

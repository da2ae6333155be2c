"""Export sinks: parquet (S11) + geojson (S12/S13, C13-C15).

Mirrors the reference's tests/test_conversion/test_db_to_parquet.py and
test_csv_to_geojson.py behaviors.
"""

import json

from hydra_spark.config import DEFAULT
from hydra_spark.exports import (
    detect_geo_columns,
    export_geojson,
    export_parquet,
    geojson_features,
)


def test_parquet_min_lines_gate(spark, tmp_path):
    small = spark.range(10)
    assert export_parquet(small, str(tmp_path / "small"), DEFAULT) is None
    big = spark.range(500)
    res = export_parquet(big, str(tmp_path / "big"), DEFAULT)
    assert res["rows"] == 500 and res["parquet_size"] > 0
    assert spark.read.parquet(res["parquet_url"]).count() == 500


def test_geo_detection_priority():
    assert detect_geo_columns(["a", "geojson", "latlon"])["kind"] == "geojson"
    assert detect_geo_columns(["a", "latlon"])["kind"] == "latlon"
    assert detect_geo_columns(["lonlat"])["kind"] == "lonlat"
    got = detect_geo_columns(["Latitude", "Longitude", "x"])
    assert got["kind"] == "latlon_pair" and got["lat"] == "Latitude"
    assert detect_geo_columns(["a", "b"]) is None


def test_latlon_variants_swap(spark):
    df = spark.createDataFrame(
        [(1, "48.85, 2.35"), (2, "[48.85,2.35]"), (3, "( 48.85 , 2.35 )"), (4, None)],
        "id long, latlon string",
    )
    feats = geojson_features(df, {"kind": "latlon", "col": "latlon"}).collect()
    assert len(feats) == 3  # NULL skipped (F7)
    g = json.loads(feats[0]["feature"])
    assert g["geometry"]["coordinates"] == [2.35, 48.85]  # swapped to lon,lat
    assert g["properties"]["id"] == 1


def test_geojson_passthrough_and_collection(spark, tmp_path):
    geom = '{"type": "Point", "coordinates": [1.0, 2.0]}'
    df = spark.createDataFrame([(1, geom, "x"), (2, None, "y")], "id long, geojson string, name string")
    out = export_geojson(df, {"kind": "geojson", "col": "geojson"}, str(tmp_path / "fc.geojson"))
    assert out["features"] == 1
    doc = json.load(open(out["geojson_url"]))
    assert doc["type"] == "FeatureCollection"
    assert doc["features"][0]["geometry"]["coordinates"] == [1.0, 2.0]
    assert doc["features"][0]["properties"] == {"id": 1, "name": "x"}


def test_geojson_streamed_large_byte_identical(spark, tmp_path):
    """100k features through the streaming writer: driver never holds the
    whole document, and the bytes equal the old collect-and-join layout."""
    df = (
        spark.range(100_000)
        .selectExpr(
            "id",
            "cast(id % 90 as double) as lat",
            "cast(id % 180 as double) as lon",
        )
        .repartition(8)
    )
    geo = {"kind": "latlon_pair", "lat": "lat", "lon": "lon"}
    out = export_geojson(df, geo, str(tmp_path / "big.geojson"))
    assert out["features"] == 100_000
    data = open(out["geojson_url"]).read()
    assert out["geojson_size"] == len(data)
    # byte-identical to the single-string construction over the same rows
    feats = [r["feature"] for r in geojson_features(df, geo).collect()]
    expected = '{"type": "FeatureCollection", "features": [' + ",".join(feats) + "]}"
    assert data == expected
    doc = json.loads(data)
    assert len(doc["features"]) == 100_000

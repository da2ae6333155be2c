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


def test_pmtiles_roundtrip(spark, tmp_path):
    """S14: Point frame → PMTiles v3 archive (distributed tiling + MVT
    encode, driver pack in Hilbert order) → parsed back: header fields,
    directory, per-tile feature counts across all zooms."""
    from hydra_spark.exports.pmtiles import (
        export_pmtiles,
        hilbert_tile_id,
        read_pmtiles,
    )

    df = spark.range(300).selectExpr(
        "id",
        "cast((id % 171) - 85 + 0.123 as double) as lat",
        "cast(((id * 7) % 360) - 180 + 0.321 as double) as lon",
        "concat('poi_', id) as name",
    )
    path = str(tmp_path / "points.pmtiles")
    out = export_pmtiles(df, {"kind": "latlon_pair", "lat": "lat", "lon": "lon"}, path, max_zoom=3)
    assert out["features"] == 300 and out["tiles"] > 1
    arc = read_pmtiles(path)
    assert (arc["min_zoom"], arc["max_zoom"]) == (0, 3)
    assert arc["tile_type"] == 1 and arc["clustered"] == 1  # MVT, Hilbert order
    assert arc["n_entries"] == out["tiles"] and arc["addressed"] == 300
    # the z0 world tile exists and its MVT layer says extent 4096
    t0 = arc["tiles"][hilbert_tile_id(0, 0, 0)]
    assert b"features" in t0  # layer name
    # every zoom's tiles hold all 300 features exactly once, with
    # properties intact (decoded through the real MVT wire format)
    from hydra_spark.exports.pmtiles import decode_mvt_points

    per_zoom = {z: [] for z in range(4)}
    for tid, tile in arc["tiles"].items():
        z = 0
        while tid >= (1 << (2 * z)):
            tid -= 1 << (2 * z)
            z += 1
        per_zoom[z].extend(decode_mvt_points(tile))
    for z, feats in per_zoom.items():
        assert len(feats) == 300, (z, len(feats))
        names = {f["props"]["name"] for f in feats}
        assert names == {f"poi_{i}" for i in range(300)}
        assert all(0 <= f["fx"] < 4096 and 0 <= f["fy"] < 4096 for f in feats)


def test_pmtiles_hilbert_ids():
    """Hilbert tile ids: zoom offsets + the d(x,y) curve — spot values
    from the public spec (z0 → 0; z1 quadrants 1..4; z2 starts at 5)."""
    from hydra_spark.exports.pmtiles import hilbert_tile_id

    assert hilbert_tile_id(0, 0, 0) == 0
    assert {hilbert_tile_id(1, x, y) for x in (0, 1) for y in (0, 1)} == {1, 2, 3, 4}
    assert hilbert_tile_id(1, 0, 0) == 1  # curve starts bottom-left quadrant order
    z2 = [hilbert_tile_id(2, x, y) for x in range(4) for y in range(4)]
    assert sorted(z2) == list(range(5, 21))


class TestGeomClip:
    def test_clip_ring_square(self):
        from hydra_spark.exports.geomclip import clip_ring

        r = [(-5, -5), (15, -5), (15, 15), (-5, 15)]
        got = clip_ring(r, 0, 10)
        assert sorted(got) == [(0.0, 0), (0.0, 10), (10.0, 0), (10.0, 10)]
        assert clip_ring([(20, 20), (30, 20), (30, 30)], 0, 10) == []

    def test_clip_line_splits(self):
        from hydra_spark.exports.geomclip import clip_line

        l = [(-5, 5), (5, 5), (5, 20), (8, 20), (8, 5), (15, 5)]
        parts = clip_line(l, 0, 10)
        assert len(parts) == 2
        assert parts[0][0] == (0.0, 5.0) and parts[1][-1] == (10.0, 5.0)

    def test_simplify_keeps_corners(self):
        from hydra_spark.exports.geomclip import simplify

        pts = [(0, 0), (1, 0.01), (2, 0.0), (3, 5.0), (4, 5.01), (5, 5.0)]
        got = simplify(pts, 0.5)
        assert got[0] == (0, 0) and got[-1] == (5, 5.0)
        assert (3, 5.0) in got or (2, 0.0) in got  # the corner survives
        assert len(got) < len(pts)

    def test_signed_area_orientation(self):
        from hydra_spark.exports.geomclip import signed_area

        ccw = [(0, 0), (10, 0), (10, 10), (0, 10)]
        assert signed_area(ccw) > 0
        assert signed_area(ccw[::-1]) < 0


def test_pmtiles_polygon_and_line_tiles(spark, tmp_path):
    """Geometry path: polygon + linestring clipped across tiles, MVT
    command-stream roundtrip, spec ring orientation."""
    import json as _json

    from pyspark.sql import Row

    from hydra_spark.exports.pmtiles import (
        EXTENT,
        assign_tiles_geojson,
        decode_mvt_features,
        encode_tiles,
    )
    from hydra_spark.exports.geomclip import signed_area

    # a polygon straddling the z=1 tile boundary (lon 0), with a hole
    poly = {"type": "Polygon", "coordinates": [
        [[-30.0, -20.0], [40.0, -20.0], [40.0, 30.0], [-30.0, 30.0], [-30.0, -20.0]],
        [[-5.0, -5.0], [5.0, -5.0], [5.0, 5.0], [-5.0, 5.0], [-5.0, -5.0]],
    ]}
    line = {"type": "LineString", "coordinates": [[-60.0, 10.0], [60.0, 10.0]]}
    df = spark.createDataFrame([
        Row(name="poly", geometry=_json.dumps(poly)),
        Row(name="line", geometry=_json.dumps(line)),
    ])
    assigned = assign_tiles_geojson(df, "geometry", [1]).cache()
    rows = assigned.collect()
    # polygon bbox crosses lon 0 -> tiles x=0 and x=1 at z=1
    poly_tiles = {(r.x, r.y) for r in rows if r.gtype == 3}
    assert poly_tiles == {(0, 0), (0, 1), (1, 0), (1, 1)}  # bbox spans both hemispheres
    for r in rows:
        for part in _json.loads(r.geom):
            for x, y in part:
                assert -8 <= x <= EXTENT + 8 and -8 <= y <= EXTENT + 8
        if r.gtype == 3:
            parts = _json.loads(r.geom)
            assert signed_area(parts[0]) > 0  # exterior ring positive
            for hole in parts[1:]:
                assert signed_area(hole) < 0

    tiles = {(r.z, r.x, r.y): bytes(r.tile) for r in encode_tiles(assigned).collect()}
    feats = decode_mvt_features(tiles[(1, 0, 0)])
    by_type = {f["gtype"]: f for f in feats}
    assert set(by_type) == {2, 3}
    # decoded polygon vertices match the assigned ones
    want = _json.loads(next(r.geom for r in rows if r.gtype == 3 and (r.x, r.y) == (0, 0)))
    assert by_type[3]["parts"] == want
    assert by_type[3]["props"] == {"name": "poly"}
    # the line got clipped into this tile with both endpoints on edges
    lparts = by_type[2]["parts"]
    assert all(len(p) >= 2 for p in lparts)


def test_pmtiles_geojson_archive_e2e(spark, tmp_path):
    import json as _json

    from pyspark.sql import Row

    from hydra_spark.exports.pmtiles import (
        decode_mvt_features,
        export_pmtiles,
        read_pmtiles,
    )

    geoms = [
        {"type": "Point", "coordinates": [2.35, 48.85]},
        {"type": "LineString", "coordinates": [[2.0, 48.0], [3.0, 49.0]]},
        {"type": "Polygon", "coordinates": [
            [[1.0, 47.0], [4.0, 47.0], [4.0, 50.0], [1.0, 50.0], [1.0, 47.0]]]},
        {"type": "MultiPolygon", "coordinates": [
            [[[5.0, 45.0], [6.0, 45.0], [6.0, 46.0], [5.0, 46.0], [5.0, 45.0]]]]},
    ]
    df = spark.createDataFrame(
        [Row(fid=i, geometry=_json.dumps(g)) for i, g in enumerate(geoms)]
    )
    path = str(tmp_path / "geom.pmtiles")
    out = export_pmtiles(df, {"kind": "geojson", "col": "geometry"}, path, max_zoom=4)
    assert out["tiles"] > 0
    arc = read_pmtiles(path)
    assert arc["n_entries"] == out["tiles"]
    types = set()
    for tile in arc["tiles"].values():
        for f in decode_mvt_features(tile):
            types.add(f["gtype"])
    assert types == {1, 2, 3}


def test_encode_tiles_feature_cap_logged(spark, caplog):
    import logging

    from pyspark.sql import Row

    from hydra_spark.exports.pmtiles import decode_mvt_features, encode_tiles

    rows = [Row(z=0, x=0, y=0, fx=i, fy=i, props='{"i": %d}' % i) for i in range(10)]
    df = spark.createDataFrame(rows)
    [t] = encode_tiles(df, max_features_per_tile=4).collect()
    feats = decode_mvt_features(bytes(t.tile))
    assert len(feats) == 4
    [t2] = encode_tiles(df).collect()
    assert len(decode_mvt_features(bytes(t2.tile))) == 10


def test_encode_tiles_cluster_policy(spark):
    """point_policy='cluster' (tippecanoe --cluster-densest-as-needed):
    dense tiles merge cell-mates into representatives with point_count
    instead of dropping — no feature silently disappears (counts sum to
    the input), output is deterministic, and under-cap tiles are
    untouched."""
    import json as _json

    from pyspark.sql import Row

    from hydra_spark.exports.pmtiles import decode_mvt_features, encode_tiles

    # two dense blobs + isolated points, one overfull z0 tile
    rows = (
        [Row(z=0, x=0, y=0, fx=100 + (i % 4), fy=200 + (i // 4), props='{"i": %d}' % i)
         for i in range(12)]                                     # blob A (12 pts)
        + [Row(z=0, x=0, y=0, fx=3000 + (i % 3), fy=3100, props='{"i": %d}' % (100 + i))
           for i in range(6)]                                    # blob B (6 pts)
        + [Row(z=0, x=0, y=0, fx=40 * i, fy=4000, props='{"i": %d}' % (200 + i))
           for i in range(4)]                                    # isolated
    )
    df = spark.createDataFrame(rows)
    [t] = encode_tiles(df, max_features_per_tile=8, point_policy="cluster").collect()
    feats = decode_mvt_features(bytes(t.tile))
    assert len(feats) <= 8
    total = sum(int(f["props"].get("point_count", 1)) for f in feats)
    assert total == 22  # merged, not dropped
    assert any(int(f["props"].get("point_count", 1)) >= 6 for f in feats)  # a blob collapsed

    # determinism: same input → same tile bytes
    [t2] = encode_tiles(df, max_features_per_tile=8, point_policy="cluster").collect()
    assert bytes(t.tile) == bytes(t2.tile)

    # under the cap: cluster policy leaves the tile untouched
    small = spark.createDataFrame(rows[:5])
    [u] = encode_tiles(small, max_features_per_tile=8, point_policy="cluster").collect()
    assert len(decode_mvt_features(bytes(u.tile))) == 5

    import pytest as _pytest

    with _pytest.raises(ValueError):
        encode_tiles(df, max_features_per_tile=8, point_policy="nope")

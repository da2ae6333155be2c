"""GeoJSON export (S12/S13, C13-C15).

Reference behaviors:
- geo-column detection priority: geojson > latlon pair > lonlat pair >
  separate lat+lon columns (csv_like/to_geojson.py:25-52) — ours reads
  the inspection's formats/column names.
- latlon string → [lon, lat] floats: strip spaces/brackets, split on
  comma, SWAP order (csv_like/to_geojson.py:18-22; SQL twin
  table/to_geojson.py:24-26, 68-89).
- rows with NULL geo are skipped (to_geojson.py:86-105) — F7.
- features are built server-side (`json_build_object`,
  table/to_geojson.py:29-100) → here `to_json(struct(...))`, whole-stage
  codegen; PG's 100-arg limit disappears.
"""

from __future__ import annotations

import json

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

LAT_NAMES = {"latitude", "lat"}
LON_NAMES = {"longitude", "lon", "lng", "long"}
LATLON_NAMES = {"latlon", "latlong", "coordonnees", "coordinates", "coords"}
LONLAT_NAMES = {"lonlat", "longlat"}
GEOJSON_NAMES = {"geojson", "geom", "geometry", "geo_shape"}


def detect_geo_columns(columns: list[str], inspection: dict | None = None) -> dict | None:
    """C13 priority: geojson > latlon > lonlat > (lat, lon).

    When an inspection is given, its CONTENT-detected formats win (the
    reference reads csv-detective's per-column geo formats, not header
    names — csv_like/to_geojson.py:25-52), so a latitude column named
    "y" is still found; header names remain the fallback."""
    if inspection is not None:
        fmts = inspection.get("formats", {})
        if fmts.get("geojson"):
            return {"kind": "geojson", "col": fmts["geojson"][0]}
        if fmts.get("latlon"):
            return {"kind": "latlon", "col": fmts["latlon"][0]}
        if fmts.get("lonlat"):
            return {"kind": "lonlat", "col": fmts["lonlat"][0]}
        if fmts.get("latitude") and fmts.get("longitude"):
            return {
                "kind": "latlon_pair",
                "lat": fmts["latitude"][0],
                "lon": fmts["longitude"][0],
            }
    low = {c.lower(): c for c in columns}
    for n in GEOJSON_NAMES:
        if n in low:
            return {"kind": "geojson", "col": low[n]}
    for n in LATLON_NAMES:
        if n in low:
            return {"kind": "latlon", "col": low[n]}
    for n in LONLAT_NAMES:
        if n in low:
            return {"kind": "lonlat", "col": low[n]}
    lat = next((low[n] for n in LAT_NAMES if n in low), None)
    lon = next((low[n] for n in LON_NAMES if n in low), None)
    if lat and lon:
        return {"kind": "latlon_pair", "lat": lat, "lon": lon}
    return None


def latlon_to_lonlat(col: Column | str, swap: bool = True) -> Column:
    """'48.85, 2.35' (incl. bracketed/spaced variants) → [2.35, 48.85]
    (C14)."""
    c = F.col(col) if isinstance(col, str) else col
    parts = F.split(F.translate(c, " []()", ""), ",")
    a = parts[0].cast("double")
    b = parts[1].cast("double")
    return F.array(b, a) if swap else F.array(a, b)


def geojson_features(df: DataFrame, geo: dict, properties: list[str] | None = None) -> DataFrame:
    """One GeoJSON Feature string per row (C15), NULL-geo rows skipped."""
    if geo["kind"] == "geojson":
        geometry = F.col(geo["col"])
        present = geometry.isNotNull()
        geometry_json = geometry  # already a JSON string
    else:
        if geo["kind"] == "latlon":
            coords = latlon_to_lonlat(geo["col"], swap=True)
            present = F.col(geo["col"]).isNotNull()
        elif geo["kind"] == "lonlat":
            coords = latlon_to_lonlat(geo["col"], swap=False)
            present = F.col(geo["col"]).isNotNull()
        else:
            coords = F.array(F.col(geo["lon"]).cast("double"), F.col(geo["lat"]).cast("double"))
            present = F.col(geo["lat"]).isNotNull() & F.col(geo["lon"]).isNotNull()
        geometry_json = F.to_json(
            F.struct(F.lit("Point").alias("type"), coords.alias("coordinates"))
        )

    if properties is None:
        geo_cols = {geo.get("col"), geo.get("lat"), geo.get("lon")} - {None}
        properties = [c for c in df.columns if c not in geo_cols]

    feature = F.concat(
        F.lit('{"type": "Feature", "geometry": '),
        geometry_json,
        F.lit(', "properties": '),
        F.coalesce(F.to_json(F.struct(*[F.col(p) for p in properties])), F.lit("{}")),
        F.lit("}"),
    )
    return df.where(present).select(feature.alias("feature"))


def export_geojson(df: DataFrame, geo: dict, path: str, properties: list[str] | None = None) -> dict:
    """FeatureCollection streamed feature-by-feature, like the reference's
    row-streaming writer (csv_like/to_geojson.py:55-143): driver memory is
    bounded by one fetched partition (`toLocalIterator`), not the whole
    document — a resource at the filesize cap no longer holds every
    feature string in driver heap at once. Output bytes are identical to
    the old single-string writer."""
    feats = geojson_features(df, geo, properties)
    n = 0
    size = 0
    with open(path, "w") as f:
        head = '{"type": "FeatureCollection", "features": ['
        f.write(head)
        size += len(head)
        for r in feats.toLocalIterator(prefetchPartitions=True):
            s = r["feature"] if n == 0 else "," + r["feature"]
            f.write(s)
            size += len(s)
            n += 1
        f.write("]}")
        size += 2
    return {"geojson_url": path, "geojson_size": size, "features": n}

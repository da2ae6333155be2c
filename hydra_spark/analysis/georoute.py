"""In-round GeoJSON → PMTiles dispatch.

The reference routes a fetched GeoJSON resource from the same crawl
path as CSV into a PMTiles conversion (data_formats/geojson/
__init__.py:24-49 → analysis/exports.export_pmtiles, gated by
config.GEOJSON_TO_PMTILES); this module is the Spark-side glue: one
Arrow-batched pass parses every fetched FeatureCollection into a
features frame (bytes never reach the driver), then each resource —
GeoJSON resources are a sliver of any batch — is packed into its own
PMTiles v3 archive by the existing native writer (exports/pmtiles.py).

Scale shape: the per-feature fan-out, tiling, clipping and MVT
encoding are distributed (assign_tiles_geojson / encode_tiles); only
the final sequential archive pack is driver-side, exactly like the
reference shelling to tippecanoe per resource. The per-resource loop
is bounded by the round's batch size.
"""

from __future__ import annotations

import hashlib
import json
import os
from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

GEOJSON_MIMES = ("application/vnd.geo+json", "application/geo+json")
PARQUET_MIMES = ("application/vnd.apache.parquet", "application/x-parquet")

_FEATURES_SCHEMA = "resource_id string, url string, geometry string, properties string"


def geojson_features_from_bytes(
    df: DataFrame, bytes_col: str = "html"
) -> DataFrame:
    """(resource_id, url, <bytes_col>) → one row per feature:
    (resource_id, url, geometry json, properties json). Accepts a
    FeatureCollection, a bare Feature, or a bare geometry; malformed
    payloads yield zero rows (the caller records the absence as an
    analysis error)."""
    import pandas as pd

    cols = ["resource_id", "url", bytes_col]

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows: list[tuple] = []
            for rid, url, raw in pdf[cols].itertuples(index=False):
                if raw is None:
                    continue
                try:
                    obj = json.loads(bytes(raw).decode("utf-8", "replace"))
                except ValueError:
                    continue
                if not isinstance(obj, dict):
                    continue
                t = obj.get("type")
                if t == "FeatureCollection":
                    feats = obj.get("features") or []
                elif t == "Feature":
                    feats = [obj]
                elif t in ("Point", "MultiPoint", "LineString", "MultiLineString",
                           "Polygon", "MultiPolygon", "GeometryCollection"):
                    feats = [{"type": "Feature", "geometry": obj, "properties": {}}]
                else:
                    feats = []
                for f in feats:
                    if not isinstance(f, dict) or f.get("geometry") is None:
                        continue
                    rows.append(
                        (rid, url, json.dumps(f["geometry"]),
                         json.dumps(f.get("properties") or {}))
                    )
            yield pd.DataFrame(
                rows, columns=["resource_id", "url", "geometry", "properties"]
            )

    return df.select(*cols).mapInPandas(gen, schema=_FEATURES_SCHEMA)


def export_fetched_geojson(
    store_root: str, gj_pages: DataFrame, bytes_col: str = "html"
) -> list[dict]:
    """Convert every fetched GeoJSON resource in `gj_pages`
    (resource_id, url, <bytes_col>) to a PMTiles archive under
    `<store_root>/pmtiles/<md5(url)>.pmtiles` (the reference's
    md5-named object layout). Returns one dict per converted resource:
    {resource_id, pmtiles_url, pmtiles_size} — empty/malformed payloads
    are skipped (no archive, no row)."""
    from hydra_spark.exports.pmtiles import export_pmtiles

    out_dir = os.path.join(store_root, "pmtiles")
    os.makedirs(out_dir, exist_ok=True)
    feats = geojson_features_from_bytes(gj_pages, bytes_col).persist()
    try:
        # bounded: one row per geojson RESOURCE in the round's batch
        resources = (
            feats.select("resource_id", "url").distinct().collect()
        )
        results = []
        for r in resources:
            path = os.path.join(
                out_dir, hashlib.md5(r["url"].encode()).hexdigest() + ".pmtiles"
            )
            res = export_pmtiles(
                feats.where(F.col("resource_id") == r["resource_id"]).select(
                    "geometry", "properties"
                ),
                {"kind": "geojson", "col": "geometry"},
                path,
            )
            results.append(
                {
                    "resource_id": r["resource_id"],
                    "pmtiles_url": path,
                    "pmtiles_size": res["pmtiles_size"],
                }
            )
        return results
    finally:
        feats.unpersist()

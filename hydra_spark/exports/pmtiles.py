"""PMTiles sink (S14) — stdlib, Spark-first, Point-feature subset.

Reference: data_formats/geojson/to_pmtiles.py:16-47 shells out to
tippecanoe (`--maximum-zoom=g -o file.pmtiles`) to turn a GeoJSON
resource into a PMTiles v3 archive of MVT tiles. tippecanoe does not
ship in this container, and its full pipeline (polygon clipping,
simplification, densest-coalescing) is out of scope — but the part a
crawl-scale engine needs IS Spark-shaped: assign features to slippy
tiles (pure column math, scales to any corpus), encode each tile's
features as Mapbox Vector Tile protobuf (one applyInPandas over the
(z,x,y) groups — embarrassingly parallel), and pack the archive (a
driver-side sequential write over the tiny per-tile blobs, streamed in
Hilbert order). Scope: Point geometries, `-zg`-style max-zoom guess,
gzip tiles, single root directory (no leaf dirs — fine for the
per-resource tile counts hydra produces; the format allows 16k+ root
entries).

Format references (public specs):
- PMTiles v3 header/directory layout: github.com/protomaps/PMTiles
  spec/v3 (127-byte header, varint delta-encoded directories).
- MVT: github.com/mapbox/vector-tile-spec 2.1 (protobuf wire format).
"""

from __future__ import annotations

import gzip
import json
import math
import struct

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

EXTENT = 4096
MAX_LAT = 85.0511287798  # Web Mercator clamp


# ----------------------------------------------------------- tile math

def tile_columns(lon, lat, zoom: int):
    """(tile_x, tile_y, in-tile fx, fy) as Spark columns — the slippy
    map / Web Mercator projection, whole-stage codegen, no UDF."""
    n = float(1 << zoom)
    lat_c = F.greatest(F.lit(-MAX_LAT), F.least(F.lit(MAX_LAT), lat))
    xf = (lon + 180.0) / 360.0 * n  # slippy x for lon in [-180, 180)
    lat_r = F.radians(lat_c)
    yf = (1.0 - F.log(F.tan(lat_r) + 1.0 / F.cos(lat_r)) / math.pi) / 2.0 * n
    tx = F.least(F.floor(xf).cast("int"), F.lit((1 << zoom) - 1))
    ty = F.least(F.floor(yf).cast("int"), F.lit((1 << zoom) - 1))
    fx = F.least(F.floor((xf - tx) * EXTENT).cast("int"), F.lit(EXTENT - 1))
    fy = F.least(F.floor((yf - ty) * EXTENT).cast("int"), F.lit(EXTENT - 1))
    return tx, ty, fx, fy


def guess_max_zoom(n_features: int) -> int:
    """tippecanoe's `-zg` spirit: enough zoom that features thin out to
    ~1 per tile at the max level, clamped to [2, 14]."""
    z = 2
    while (1 << (2 * z)) < max(n_features, 1) and z < 14:
        z += 1
    return z


def assign_tiles(df: DataFrame, geo: dict, zooms: list[int]) -> DataFrame:
    """(z, x, y, fx, fy, props) — one row per (feature, zoom level).
    Pure column expressions; the per-zoom fan-out is an explode over a
    literal array, so Catalyst keeps everything in one stage."""
    from hydra_spark.exports.geojson import latlon_to_lonlat

    if geo["kind"] == "latlon_pair":
        lon = F.col(geo["lon"]).cast("double")
        lat = F.col(geo["lat"]).cast("double")
        present = lat.isNotNull() & lon.isNotNull()
        geo_cols = {geo["lat"], geo["lon"]}
    elif geo["kind"] in ("latlon", "lonlat"):
        arr = latlon_to_lonlat(geo["col"], swap=(geo["kind"] == "latlon"))
        lon, lat = arr[0], arr[1]
        present = F.col(geo["col"]).isNotNull()
        geo_cols = {geo["col"]}
    else:
        raise ValueError(f"PMTiles export supports point geo kinds, got {geo['kind']!r}")

    props = [c for c in df.columns if c not in geo_cols]
    base = df.where(present).select(
        lon.alias("_lon"), lat.alias("_lat"),
        F.to_json(F.struct(*[F.col(p) for p in props])).alias("props"),
    )
    out = base.select(
        "_lon", "_lat", "props", F.explode(F.array(*[F.lit(z) for z in zooms])).alias("z")
    )
    parts = []
    for z in zooms:  # per-zoom typed columns (zoom is a literal in the math)
        tx, ty, fx, fy = tile_columns(F.col("_lon"), F.col("_lat"), z)
        parts.append(
            out.where(F.col("z") == z).select(
                "z", tx.alias("x"), ty.alias("y"), fx.alias("fx"), fy.alias("fy"), "props"
            )
        )
    res = parts[0]
    for p in parts[1:]:
        res = res.unionAll(p)
    return res


# ----------------------------------------------------------- MVT encode

def _varint(v: int) -> bytes:
    out = bytearray()
    while True:
        b = v & 0x7F
        v >>= 7
        out.append(b | (0x80 if v else 0))
        if not v:
            return bytes(out)


def _zigzag(v: int) -> int:
    return (v << 1) ^ (v >> 63)


def _field(num: int, wire: int, payload: bytes | int) -> bytes:
    key = _varint((num << 3) | wire)
    if wire == 2:
        return key + _varint(len(payload)) + payload
    return key + _varint(payload)


def encode_mvt(features: list[tuple[int, int, str]], layer_name: str = "features") -> bytes:
    """MVT layer of Point features: [(fx, fy, props_json)] → tile bytes.
    Keys/values deduplicated per tile like the spec requires."""
    keys: dict[str, int] = {}
    values: dict[str, int] = {}
    feats = b""
    for fid, (fx, fy, props_json) in enumerate(features):
        tags = bytearray()
        for k, v in (json.loads(props_json) if props_json else {}).items():
            if v is None:
                continue
            sv = json.dumps(v) if not isinstance(v, str) else v
            ki = keys.setdefault(k, len(keys))
            vi = values.setdefault(sv, len(values))
            tags += _varint(ki) + _varint(vi)
        geom = _varint((1 << 3) | 1) + _varint(_zigzag(fx)) + _varint(_zigzag(fy))
        body = (
            _field(1, 0, fid + 1)
            + _field(2, 2, bytes(tags))
            + _field(3, 0, 1)  # POINT
            + _field(4, 2, geom)
        )
        feats += _field(2, 2, body)
    layer = (
        _field(15, 0, 2)  # version
        + _field(1, 2, layer_name.encode())
        + feats
        + b"".join(_field(3, 2, k.encode()) for k in keys)
        + b"".join(_field(4, 2, _field(1, 2, v.encode())) for v in values)
        + _field(5, 0, EXTENT)
    )
    return _field(3, 2, layer)


def encode_tiles(assigned: DataFrame) -> DataFrame:
    """(z, x, y) → MVT bytes: ONE applyInPandas over the tile groups —
    each tile encodes independently, so this scales with tile count."""
    import pandas as pd

    def enc(pdf: pd.DataFrame) -> pd.DataFrame:
        z, x, y = int(pdf["z"].iloc[0]), int(pdf["x"].iloc[0]), int(pdf["y"].iloc[0])
        pdf = pdf.sort_values(["fy", "fx", "props"], kind="mergesort")
        feats = list(zip(pdf["fx"].astype(int), pdf["fy"].astype(int), pdf["props"]))
        return pd.DataFrame({"z": [z], "x": [x], "y": [y], "tile": [encode_mvt(feats)]})

    return assigned.groupBy("z", "x", "y").applyInPandas(
        enc, schema="z int, x int, y int, tile binary"
    )


# ----------------------------------------------------------- PMTiles pack

def hilbert_tile_id(z: int, x: int, y: int) -> int:
    """PMTiles tile id: offset of zoom z plus the Hilbert-curve index
    of (x, y) on the 2^z grid."""
    acc = sum(1 << (2 * k) for k in range(z))
    n = 1 << z
    rx = ry = 0
    d = 0
    s = n >> 1
    while s > 0:
        rx = 1 if (x & s) else 0
        ry = 1 if (y & s) else 0
        d += s * s * ((3 * rx) ^ ry)
        if ry == 0:  # rotate quadrant
            if rx == 1:
                x = s - 1 - x
                y = s - 1 - y
            x, y = y, x
        s >>= 1
    return acc + d


def _encode_directory(entries: list[tuple[int, int, int, int]]) -> bytes:
    """entries: (tile_id, offset, length, run_length), sorted by id —
    varint columns with delta-encoded ids per the v3 spec."""
    out = bytearray(_varint(len(entries)))
    last = 0
    for tid, _, _, _ in entries:
        out += _varint(tid - last)
        last = tid
    for _, _, _, rl in entries:
        out += _varint(rl)
    for _, _, ln, _ in entries:
        out += _varint(ln)
    prev_off = prev_len = None
    for _, off, ln, _ in entries:
        if prev_off is not None and off == prev_off + prev_len:
            out += _varint(0)  # 0 = contiguous with previous entry
        else:
            out += _varint(off + 1)
        prev_off, prev_len = off, ln
    return bytes(out)


def export_pmtiles(
    df: DataFrame, geo: dict, path: str, max_zoom: int | None = None, min_zoom: int = 0
) -> dict:
    """GeoJSON-style Point frame → PMTiles v3 archive. Tiling and MVT
    encoding are distributed; the pack is a driver-side sequential
    write streamed in Hilbert order (per-resource archives are small —
    the parallel work is the tiling, as with tippecanoe)."""
    n = df.count()
    if max_zoom is None:
        max_zoom = guess_max_zoom(n)  # tippecanoe --maximum-zoom=g analog
    zooms = list(range(min_zoom, max_zoom + 1))
    assigned = assign_tiles(df, geo, zooms)
    tiles = encode_tiles(assigned)

    entries = []
    data = bytearray()
    bounds = [180.0, MAX_LAT, -180.0, -MAX_LAT]
    rows = sorted(
        ((hilbert_tile_id(r["z"], r["x"], r["y"]), bytes(r["tile"])) for r in
         tiles.toLocalIterator(prefetchPartitions=True)),
        key=lambda t: t[0],
    )
    for tid, tile in rows:
        blob = gzip.compress(tile, compresslevel=6, mtime=0)
        entries.append((tid, len(data), len(blob), 1))
        data += blob

    # bounds from the data (cheap aggregate)
    if geo["kind"] == "latlon_pair":
        agg = df.agg(
            F.min(geo["lon"]).cast("double"), F.min(geo["lat"]).cast("double"),
            F.max(geo["lon"]).cast("double"), F.max(geo["lat"]).cast("double"),
        ).first()
        if agg[0] is not None:
            bounds = [agg[0], agg[1], agg[2], agg[3]]

    root = gzip.compress(_encode_directory(entries), compresslevel=6, mtime=0)
    meta = gzip.compress(
        json.dumps({"name": "hydra_spark export", "format": "pbf"}).encode(),
        compresslevel=6, mtime=0,
    )
    header_len = 127
    root_off = header_len
    meta_off = root_off + len(root)
    leaf_off = meta_off + len(meta)
    data_off = leaf_off  # no leaf directories
    e7 = lambda v: int(round(v * 1e7))
    header = struct.pack(
        "<7sBQQQQQQQQQQQBBBBBBiiiiBii",
        b"PMTiles", 3,
        root_off, len(root),
        meta_off, len(meta),
        leaf_off, 0,
        data_off, len(data),
        n, len(entries), len(entries),
        1,  # clustered (we write in Hilbert order)
        2, 2,  # internal + tile compression: gzip
        1,  # tile type: MVT
        min_zoom, max_zoom,
        e7(bounds[0]), e7(bounds[1]), e7(bounds[2]), e7(bounds[3]),
        min_zoom, e7((bounds[0] + bounds[2]) / 2), e7((bounds[1] + bounds[3]) / 2),
    )
    assert len(header) == header_len, len(header)
    with open(path, "wb") as f:
        f.write(header)
        f.write(root)
        f.write(meta)
        f.write(bytes(data))
    size = header_len + len(root) + len(meta) + len(data)
    return {
        "pmtiles_url": path, "pmtiles_size": size,
        "tiles": len(entries), "max_zoom": max_zoom, "features": n,
    }


def decode_mvt_points(tile: bytes) -> list[dict]:
    """Minimal MVT decoder for our own Point tiles (tests + sanity):
    [{'fx', 'fy', 'props'}] per feature, tags resolved through the
    layer's key/value tables."""

    def fields(buf: bytes):
        pos = 0
        while pos < len(buf):
            shift = key = 0
            while True:
                b = buf[pos]
                pos += 1
                key |= (b & 0x7F) << shift
                if not b & 0x80:
                    break
                shift += 7
            num, wire = key >> 3, key & 0x7
            if wire == 2:
                shift = ln = 0
                while True:
                    b = buf[pos]
                    pos += 1
                    ln |= (b & 0x7F) << shift
                    if not b & 0x80:
                        break
                    shift += 7
                yield num, buf[pos : pos + ln]
                pos += ln
            else:  # varint
                shift = v = 0
                while True:
                    b = buf[pos]
                    pos += 1
                    v |= (b & 0x7F) << shift
                    if not b & 0x80:
                        break
                    shift += 7
                yield num, v

    def varints(buf: bytes) -> list[int]:
        out, pos = [], 0
        while pos < len(buf):
            shift = v = 0
            while True:
                b = buf[pos]
                pos += 1
                v |= (b & 0x7F) << shift
                if not b & 0x80:
                    break
                shift += 7
            out.append(v)
        return out

    feats_out = []
    for num, payload in fields(tile):
        if num != 3:  # layer
            continue
        keys, values, raw_feats = [], [], []
        for fn, fv in fields(payload):
            if fn == 3:
                keys.append(fv.decode())
            elif fn == 4:
                values.append(next(v for n, v in fields(fv) if n == 1).decode())
            elif fn == 2:
                raw_feats.append(fv)
        for rf in raw_feats:
            tags, geom, gtype = [], [], None
            for fn, fv in fields(rf):
                if fn == 2:
                    tags = varints(fv)
                elif fn == 3:
                    gtype = fv
                elif fn == 4:
                    geom = varints(fv)
            assert gtype == 1 and geom[0] == 9, "point tile expected"
            zz = lambda v: (v >> 1) ^ -(v & 1)
            props = {keys[tags[i]]: values[tags[i + 1]] for i in range(0, len(tags), 2)}
            feats_out.append({"fx": zz(geom[1]), "fy": zz(geom[2]), "props": props})
    return feats_out


# ------------------------------------------------- minimal reader (tests)

def read_pmtiles(path: str) -> dict:
    """Parse our own archives back (tests + sanity): header fields,
    directory entries, decompressed tile bytes by (z, x, y) id."""
    raw = open(path, "rb").read()
    f = struct.unpack("<7sBQQQQQQQQQQQBBBBBBiiiiBii", raw[:127])
    assert f[0] == b"PMTiles" and f[1] == 3
    root = gzip.decompress(raw[f[2] : f[2] + f[3]])
    pos = 0

    def rv():
        nonlocal pos
        shift = v = 0
        while True:
            b = root[pos]
            pos += 1
            v |= (b & 0x7F) << shift
            if not b & 0x80:
                return v
            shift += 7

    cnt = rv()
    ids, runs, lens, offs = [], [], [], []
    last = 0
    for _ in range(cnt):
        last += rv()
        ids.append(last)
    for _ in range(cnt):
        runs.append(rv())
    for _ in range(cnt):
        lens.append(rv())
    prev_off = prev_len = None
    for i in range(cnt):
        v = rv()
        off = prev_off + prev_len if v == 0 else v - 1
        offs.append(off)
        prev_off, prev_len = off, lens[i]
    data_off = f[8]
    tiles = {
        ids[i]: gzip.decompress(raw[data_off + offs[i] : data_off + offs[i] + lens[i]])
        for i in range(cnt)
    }
    return {
        "n_entries": cnt, "min_zoom": f[17], "max_zoom": f[18],
        "tile_type": f[16], "clustered": f[13], "tiles": tiles,
        "addressed": f[10],
    }

"""OGC (WFS/WMS) GetCapabilities inspection — S17.

Reference: udata_hydra/data_formats/ogc/__init__.py:80-268 connects to a
live service via owslib with version fallback and extracts
`ogc_metadata = {format, version, output_formats, detected_layer}`.
No live services (or owslib) exist here, so the same extraction runs
over capabilities XML documents carried in the `html` column — a
mapInPandas stage around a stdlib ElementTree parser. Reference
semantics kept one-for-one:

- format detection from catalog format / SERVICE= query param / path
  segment (ogc/__init__.py:47-75, `detect_from_check`)
- version negotiation ladder per format (SERVICE_MAPPING versions,
  ogc/__init__.py:22-31, 130-147): versions are tried newest-first and
  a "connection" succeeds when the service's capabilities answer that
  version (a real server answers GetCapabilities?VERSION=v with its
  best supported version; here the doc carries what it would answer)
- layer-name detection from typename/typeNames query params with the
  VALID_LAYER_NAME_PATTERN guard, resource-title fallback
  (ogc/__init__.py:251-268)
- detected layer: exact match first, else a UNIQUE local-name
  (namespace-stripped) match (ogc/__init__.py:195-215)
- WFS output formats from the GetFeature operation parameters
  (ogc/__init__.py:165-171); default_crs = first CRS option per layer
  (ogc/__init__.py:180-189)
"""

from __future__ import annotations

import json
import re
from collections.abc import Iterator
from urllib.parse import parse_qs, urlparse
from xml.etree import ElementTree

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import types as T

VALID_LAYER_NAME_PATTERN = re.compile(r"^[a-zA-Z0-9_\-.:]{1,100}$")
# version fallback ladders (SERVICE_MAPPING, ogc/__init__.py:22-31)
SERVICE_VERSIONS = {
    "wfs": ["2.0.0", "1.1.0", "1.0.0"],
    "wms": ["1.3.0", "1.1.1"],
}

OGC_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType()),
        T.StructField("resource_id", T.StringType()),
        T.StructField("ogc_metadata", T.StringType()),  # JSON, reference dict shape
        T.StructField("parsing_error", T.StringType()),
    ]
)


def detect_ogc_format(url: str, resource_format: str | None = None) -> str | None:
    """Which OGC service (if any) a resource is — `detect_from_check`
    (ogc/__init__.py:47-75): catalog format (with `ogc:` prefix
    normalization), SERVICE= query param, or a /wfs|/wms path segment."""
    for fmt in SERVICE_VERSIONS:
        if resource_format and resource_format.lower().replace("ogc:", "") == fmt:
            return fmt
    parsed = urlparse(url or "")
    query_params = parse_qs(parsed.query.lower())
    path_segments = parsed.path.lower().rstrip("/").split("/")
    for fmt in SERVICE_VERSIONS:
        if fmt in query_params.get("service", []) or fmt in path_segments:
            return fmt
    return None


def is_valid_layer_name(name: str) -> bool:
    return bool(VALID_LAYER_NAME_PATTERN.match(name))


def detect_layer_name(url: str, resource_title: str | None = None) -> str | None:
    """typename/typeNames query param (case-insensitive), else the
    resource title, both pattern-guarded (ogc/__init__.py:255-268)."""
    parsed = urlparse(url or "")
    for key, values in parse_qs(parsed.query).items():
        if key.lower() in ("typename", "typenames"):
            if values and is_valid_layer_name(values[0]):
                return values[0]
    if resource_title and is_valid_layer_name(resource_title):
        return resource_title
    return None


def _local(tag: str) -> str:
    return tag.rsplit("}", 1)[-1]


def _findall_local(root, name: str) -> list:
    return [el for el in root.iter() if _local(el.tag) == name]


def _negotiate_version(fmt: str, answered_version: str | None) -> str:
    """The owslib connection loop (ogc/__init__.py:130-147): versions
    are tried newest-first and an attempt succeeds when the service's
    answer parses under the requested version — i.e. when the answered
    version equals the attempt (a 2.0.0 request against a 1.1.0-only
    server fails and the loop falls back to 1.1.0). A capabilities doc
    IS the service's answer here, so negotiation resolves to its
    version when that version is in the ladder, else errors like the
    reference's ogc_service_connection ParseException."""
    for v in SERVICE_VERSIONS[fmt]:
        if v == answered_version:
            return v
    raise ValueError(
        f"Could not connect to {fmt} service with any supported version. "
        f"Latest error was: unsupported version {answered_version!r}"
    )


def parse_capabilities(
    xml: str, url: str = "", resource_format: str | None = None, resource_title: str | None = None
) -> dict:
    """capabilities XML → the reference's OgcMetadata dict."""
    fmt = detect_ogc_format(url, resource_format)
    root = ElementTree.fromstring(xml)
    root_name = _local(root.tag).lower()
    if fmt is None:  # fall back to the document type
        fmt = "wfs" if "wfs" in root_name else "wms" if "wms" in root_name else None
    if fmt is None:
        raise ValueError("not an OGC capabilities document")

    version = _negotiate_version(fmt, root.get("version"))

    metadata: dict = {
        "format": fmt,
        "version": version,
        "output_formats": [],
        "detected_layer": None,
    }

    # WFS: GetFeature outputFormat values (OperationsMetadata)
    if fmt == "wfs":
        for op in _findall_local(root, "Operation"):
            if op.get("name") != "GetFeature":
                continue
            for param in _findall_local(op, "Parameter"):
                if param.get("name") == "outputFormat":
                    metadata["output_formats"] = [
                        (v.text or "").strip() for v in _findall_local(param, "Value")
                    ]

    # layers: WFS FeatureType / WMS named Layer; default CRS = first option
    layers: list[dict] = []
    container = "FeatureType" if fmt == "wfs" else "Layer"
    for node in _findall_local(root, container):
        names = [c for c in node if _local(c.tag) == "Name"]
        if not names or not (names[0].text or "").strip():
            continue  # WMS group layers have no Name
        crs_options = [
            (c.text or "").strip()
            for c in node
            if _local(c.tag) in ("DefaultCRS", "DefaultSRS", "OtherCRS", "OtherSRS", "CRS", "SRS")
        ]
        layers.append(
            {
                "name": names[0].text.strip(),
                "default_crs": crs_options[0] if crs_options else None,
            }
        )

    candidate = detect_layer_name(url, resource_title)
    if candidate and layers:
        exact = next((la for la in layers if la["name"] == candidate), None)
        if exact:
            metadata["detected_layer"] = exact
        else:
            matches = [la for la in layers if la["name"].split(":")[-1] == candidate]
            if len(matches) == 1:
                metadata["detected_layer"] = matches[0]

    metadata["layers"] = layers  # full inventory (superset of reference)
    return metadata


def inspect_ogc_batch(df: DataFrame) -> DataFrame:
    """df: (url, resource_id, html binary of a capabilities doc
    [, format, title]) → OGC_SCHEMA rows; parse failures land in
    parsing_error like every other analysis stage."""
    has_fmt = "format" in df.columns
    has_title = "title" in df.columns

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for _, r in pdf.iterrows():
                if r["html"] is None:
                    continue
                fmt = r["format"] if has_fmt else None
                title = r["title"] if has_title else None
                try:
                    meta = parse_capabilities(
                        bytes(r["html"]).decode("utf-8", "replace"),
                        url=r["url"], resource_format=fmt, resource_title=title,
                    )
                    rows.append((r["url"], r["resource_id"], json.dumps(meta), None))
                except Exception as e:
                    rows.append((r["url"], r["resource_id"], None, f"ogc:{e}"))
            yield pd.DataFrame(rows, columns=["url", "resource_id", "ogc_metadata", "parsing_error"])

    return df.mapInPandas(gen, schema=OGC_SCHEMA)


def synthetic_capabilities(
    service: str = "WFS",
    layers: int = 3,
    version: str = "2.0.0",
    namespace: str = "ns",
    formats: tuple[str, ...] = ("application/json", "GML2"),
) -> str:
    """Deterministic capabilities documents in the real WFS 2.0 / WMS 1.3
    shapes (OperationsMetadata, FeatureTypeList, nested Layer tree)."""
    if service.upper() == "WFS":
        fts = "".join(
            f"<FeatureType><Name>{namespace}:layer_{i}</Name>"
            f"<DefaultCRS>urn:ogc:def:crs:EPSG::4326</DefaultCRS>"
            f"<OtherCRS>urn:ogc:def:crs:EPSG::3857</OtherCRS></FeatureType>"
            for i in range(layers)
        )
        values = "".join(f"<ows:Value>{f}</ows:Value>" for f in formats)
        return (
            f'<wfs:WFS_Capabilities version="{version}" xmlns:wfs="http://www.opengis.net/wfs/2.0"'
            f' xmlns:ows="http://www.opengis.net/ows/1.1">'
            f'<ows:OperationsMetadata><ows:Operation name="GetFeature">'
            f'<ows:Parameter name="outputFormat"><ows:AllowedValues>{values}</ows:AllowedValues>'
            f"</ows:Parameter></ows:Operation></ows:OperationsMetadata>"
            f"<FeatureTypeList>{fts}</FeatureTypeList></wfs:WFS_Capabilities>"
        )
    inner = "".join(
        f"<Layer queryable=\"1\"><Name>layer_{i}</Name><Title>L{i}</Title>"
        f"<CRS>EPSG:4326</CRS><CRS>EPSG:3857</CRS></Layer>"
        for i in range(layers)
    )
    return (
        f'<WMS_Capabilities version="{version}" xmlns="http://www.opengis.net/wms">'
        f"<Capability><Layer><Title>root group</Title>{inner}</Layer></Capability>"
        f"</WMS_Capabilities>"
    )

"""OGC (WFS/WMS) GetCapabilities inspection — S17.

Reference: udata_hydra/data_formats/ogc/__init__.py:80-268 connects to a
live service via owslib, negotiating versions and extracting layers/CRS/
output formats into `ogc_metadata`. No live services exist here, so the
same extraction runs over capabilities XML documents carried in the
`html` column — a mapInPandas stage with a small deterministic XML
parser (regex-level, sufficient for capabilities shapes).
"""

from __future__ import annotations

import json
import re
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import types as T

OGC_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType()),
        T.StructField("resource_id", T.StringType()),
        T.StructField("ogc_metadata", T.StringType()),  # JSON
    ]
)


def parse_capabilities(xml: str) -> dict:
    service = re.search(r"<(?:wfs|wms):?Name>([^<]+)</", xml, re.I)
    version = re.search(r'version="([\d.]+)"', xml)
    layers = re.findall(r"<(?:Layer|FeatureType)>\s*<Name>([^<]+)</Name>", xml, re.I)
    crs = sorted(set(re.findall(r"<(?:SRS|CRS|DefaultCRS)>([^<]+)</", xml, re.I)))
    formats = sorted(set(re.findall(r"<Format>([^<]+)</Format>", xml, re.I)))
    return {
        "service": service.group(1) if service else None,
        "version": version.group(1) if version else None,
        "layers": layers,
        "crs": crs,
        "output_formats": formats,
    }


def inspect_ogc_batch(df: DataFrame) -> DataFrame:
    """df: (url, resource_id, html binary of a capabilities doc)."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for url, rid, html in pdf[["url", "resource_id", "html"]].itertuples(index=False):
                if html is None:
                    continue
                meta = parse_capabilities(bytes(html).decode("utf-8", "replace"))
                rows.append((url, rid, json.dumps(meta)))
            yield pd.DataFrame(rows, columns=["url", "resource_id", "ogc_metadata"])

    return df.mapInPandas(gen, schema=OGC_SCHEMA)


def synthetic_capabilities(service: str = "WFS", layers: int = 3, version: str = "2.0.0") -> str:
    layer_xml = "".join(
        f"<FeatureType><Name>layer_{i}</Name></FeatureType>" for i in range(layers)
    )
    return (
        f'<wfs:WFS_Capabilities version="{version}">'
        f"<wfs:Name>{service}</wfs:Name>"
        f"<DefaultCRS>EPSG:4326</DefaultCRS><Format>application/json</Format>"
        f"<Format>GML2</Format>{layer_xml}</wfs:WFS_Capabilities>"
    )

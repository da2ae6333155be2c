"""OGC extraction truth table (S17) — mirrors the semantics of
udata_hydra/data_formats/ogc/__init__.py: format detection, version
negotiation fallback, layer-name detection from query params, exact vs
local-name layer matching, WFS output formats."""

import json

import pytest

from hydra_spark.analysis.ogc import (
    detect_layer_name,
    detect_ogc_format,
    inspect_ogc_batch,
    parse_capabilities,
    synthetic_capabilities,
)


# ---- detect_from_check (ogc/__init__.py:47-75) --------------------------

@pytest.mark.parametrize(
    "url,fmt,expected",
    [
        ("https://x.org/geoserver/wfs?request=GetCapabilities", None, "wfs"),
        ("https://x.org/ows?SERVICE=WMS&request=GetMap", None, "wms"),
        ("https://x.org/data?service=wfs", None, "wfs"),
        ("https://x.org/files/data.csv", None, None),
        ("https://x.org/anything", "ogc:wfs", "wfs"),  # catalog format wins
        ("https://x.org/anything", "WMS", "wms"),
        ("https://x.org/wfsx/path", None, None),  # segment must match exactly
    ],
)
def test_detect_ogc_format(url, fmt, expected):
    assert detect_ogc_format(url, fmt) == expected


# ---- detect_layer_name (ogc/__init__.py:255-268) -------------------------

@pytest.mark.parametrize(
    "url,title,expected",
    [
        ("https://x.org/wfs?typeName=ns:roads", None, "ns:roads"),
        ("https://x.org/wfs?TYPENAMES=ns:roads", None, "ns:roads"),
        ("https://x.org/wfs?typename=bad name!", None, None),  # pattern guard
        ("https://x.org/wfs", "roads", "roads"),  # title fallback
        ("https://x.org/wfs", "not a layer name!", None),
        ("https://x.org/wfs?typeName=ns:roads", "other", "ns:roads"),  # param wins
    ],
)
def test_detect_layer_name(url, title, expected):
    assert detect_layer_name(url, title) == expected


# ---- version negotiation (ogc/__init__.py:130-147) -----------------------

def test_version_fallback_ladder():
    for v in ("2.0.0", "1.1.0", "1.0.0"):
        meta = parse_capabilities(synthetic_capabilities("WFS", version=v), url="http://x/wfs")
        assert meta["version"] == v
    for v in ("1.3.0", "1.1.1"):
        meta = parse_capabilities(synthetic_capabilities("WMS", version=v), url="http://x/wms")
        assert meta["version"] == v


def test_unsupported_version_is_connection_error():
    with pytest.raises(ValueError, match="any supported version"):
        parse_capabilities(synthetic_capabilities("WFS", version="0.9.9"), url="http://x/wfs")


# ---- layer matching (ogc/__init__.py:195-215) ----------------------------

def test_detected_layer_exact_match():
    xml = synthetic_capabilities("WFS", layers=3)
    meta = parse_capabilities(xml, url="http://x/wfs?typeName=ns:layer_1")
    assert meta["detected_layer"] == {
        "name": "ns:layer_1", "default_crs": "urn:ogc:def:crs:EPSG::4326"
    }


def test_detected_layer_local_name_unique_match():
    xml = synthetic_capabilities("WFS", layers=3)
    meta = parse_capabilities(xml, url="http://x/wfs?typeName=layer_2")
    assert meta["detected_layer"]["name"] == "ns:layer_2"


def test_detected_layer_ambiguous_local_name_is_none():
    ns = "http://www.opengis.net/wfs/2.0"
    xml = (
        f'<wfs:WFS_Capabilities version="2.0.0" xmlns:wfs="{ns}"><FeatureTypeList>'
        f"<FeatureType><Name>a:roads</Name></FeatureType>"
        f"<FeatureType><Name>b:roads</Name></FeatureType>"
        f"</FeatureTypeList></wfs:WFS_Capabilities>"
    )
    meta = parse_capabilities(xml, url="http://x/wfs?typeName=roads")
    assert meta["detected_layer"] is None  # two local-name matches → ambiguous


def test_detected_layer_from_resource_title():
    xml = synthetic_capabilities("WFS", layers=2)
    meta = parse_capabilities(xml, url="http://x/wfs", resource_title="ns:layer_0")
    assert meta["detected_layer"]["name"] == "ns:layer_0"


# ---- WMS specifics --------------------------------------------------------

def test_wms_nested_layers_and_crs():
    meta = parse_capabilities(synthetic_capabilities("WMS", layers=3, version="1.3.0"),
                              url="http://x/wms")
    assert meta["format"] == "wms"
    assert [la["name"] for la in meta["layers"]] == ["layer_0", "layer_1", "layer_2"]
    assert meta["layers"][0]["default_crs"] == "EPSG:4326"  # first CRS option
    assert meta["output_formats"] == []  # WFS-only extraction


# ---- batch stage -----------------------------------------------------------

def test_inspect_ogc_batch_with_errors(spark):
    good = synthetic_capabilities("WFS", layers=2)
    rows = [
        ("http://x/wfs?typeName=ns:layer_1", "r1", bytearray(good.encode()), None, None),
        ("http://x/wfs", "r2", bytearray(b"<not-xml"), None, None),
    ]
    df = spark.createDataFrame(
        rows, "url string, resource_id string, html binary, format string, title string"
    )
    out = {r["resource_id"]: r for r in inspect_ogc_batch(df).collect()}
    meta = json.loads(out["r1"]["ogc_metadata"])
    assert meta["detected_layer"]["name"] == "ns:layer_1"
    assert meta["output_formats"] == ["application/json", "GML2"]
    assert out["r2"]["ogc_metadata"] is None
    assert out["r2"]["parsing_error"].startswith("ogc:")

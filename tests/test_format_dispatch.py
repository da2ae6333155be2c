"""In-round format dispatch beyond CSV/Excel: fetched Parquet → typed
ingest + tables_index, fetched GeoJSON → PMTiles archive (reference
data_formats/parquet/__init__.py:35-62, data_formats/geojson/
__init__.py:24-49)."""

from __future__ import annotations

import datetime as dt
import io
import json
import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from hydra_spark.config import DEFAULT
from hydra_spark.crawl.loop import init_state, run_crawl
from hydra_spark.datagen import generate_frontier
from hydra_spark.storage import StateStore


def _parquet_bytes() -> bytes:
    table = pa.table(
        {
            "code": ["a", "b", "c"],
            "n": pa.array([1, 2, 3], type=pa.int64()),
            "x": pa.array([1.5, 2.5, None], type=pa.float64()),
        }
    )
    buf = io.BytesIO()
    pq.write_table(table, buf)
    return buf.getvalue()


def _geojson_bytes() -> bytes:
    fc = {
        "type": "FeatureCollection",
        "features": [
            {"type": "Feature", "geometry": {"type": "Point", "coordinates": [2.35, 48.85]},
             "properties": {"name": "paris"}},
            {"type": "Feature", "geometry": {"type": "Point", "coordinates": [5.37, 43.30]},
             "properties": {"name": "marseille"}},
        ],
    }
    return json.dumps(fc).encode()


_CSV = b"code_insee,number,label\n" + b"\n".join(
    b"%d,%d,row%d" % (i, i * 10, i) for i in range(5)
)


def _pages(spark):
    ts = dt.datetime(2025, 1, 1)
    rows = [
        ("https://host1.example.com/data.parquet", ts, _parquet_bytes(), "", "fr"),
        ("https://host2.example.com/zones.geojson", ts, _geojson_bytes(), "", "fr"),
        ("https://host3.example.com/table.csv", ts, _CSV, _CSV.decode(), "fr"),
    ]
    return spark.createDataFrame(
        rows, "url string, warc_ts timestamp, html binary, text string, lang string"
    )


@pytest.fixture(scope="module")
def dispatched(spark, tmp_path_factory):
    pages = _pages(spark)
    store = StateStore(str(tmp_path_factory.mktemp("fmt_state")))
    init_state(store, generate_frontier(spark, pages))
    run_crawl(spark, store, pages, DEFAULT.with_(batch_size=50), rounds=1)
    checks = {r["url"]: r for r in store.checks.read(spark).collect()}
    return store, checks


def test_mime_sniff(spark, dispatched):
    _, checks = dispatched
    assert checks["https://host1.example.com/data.parquet"]["mime_type"] == (
        "application/vnd.apache.parquet"
    )
    assert checks["https://host2.example.com/zones.geojson"]["mime_type"] == (
        "application/vnd.geo+json"
    )
    assert checks["https://host3.example.com/table.csv"]["mime_type"] == "text/csv"


def test_parquet_typed_ingest(spark, dispatched):
    store, checks = dispatched
    c = checks["https://host1.example.com/data.parquet"]
    assert c["parsing_table"] is not None and c["parsing_error"] is None

    ti = {r["url"]: r for r in store.tables_index.read(spark).collect()}
    insp = json.loads(ti["https://host1.example.com/data.parquet"]["csv_detective"])
    assert insp["header"] == ["code", "n", "x"]
    assert insp["columns"]["n"]["python_type"] == "int"
    assert insp["columns"]["x"]["python_type"] == "float"
    assert insp["total_lines"] == 3

    rows = (
        store.parsed_rows.read(spark)
        .where(f"parsing_table = '{c['parsing_table']}'")
        .orderBy("__id")
        .collect()
    )
    assert [json.loads(r["row_json"])["n"] for r in rows] == [1, 2, 3]
    assert json.loads(rows[2]["row_json"])["x"] is None


def test_geojson_to_pmtiles(spark, dispatched):
    from hydra_spark.exports.pmtiles import read_pmtiles

    store, checks = dispatched
    c = checks["https://host2.example.com/zones.geojson"]
    assert c["pmtiles_url"] and os.path.exists(c["pmtiles_url"])
    assert c["pmtiles_size"] == os.path.getsize(c["pmtiles_url"])
    assert c["parsing_finished_at"] is not None
    archive = read_pmtiles(c["pmtiles_url"])
    assert archive["n_entries"] >= 1 and archive["addressed"] == 2  # 2 features
    # csv/parquet resources must NOT get an archive
    assert checks["https://host3.example.com/table.csv"]["pmtiles_url"] is None


def test_csv_path_unaffected(spark, dispatched):
    store, checks = dispatched
    c = checks["https://host3.example.com/table.csv"]
    assert c["parsing_table"] is not None
    n = store.parsed_rows.read(spark).where(
        f"parsing_table = '{c['parsing_table']}'"
    ).count()
    assert n == 5


def test_config_gates_off(spark, tmp_path_factory):
    pages = _pages(spark)
    store = StateStore(str(tmp_path_factory.mktemp("fmt_off")))
    init_state(store, generate_frontier(spark, pages))
    cfg = DEFAULT.with_(batch_size=50, geojson_to_pmtiles=False, parquet_to_db=False)
    run_crawl(spark, store, pages, cfg, rounds=1)
    checks = {r["url"]: r for r in store.checks.read(spark).collect()}
    assert checks["https://host1.example.com/data.parquet"]["parsing_table"] is None
    assert checks["https://host2.example.com/zones.geojson"]["pmtiles_url"] is None
    # CSV still parses with the dispatch gates off
    assert checks["https://host3.example.com/table.csv"]["parsing_table"] is not None


def test_malformed_geojson_records_error(spark, tmp_path_factory):
    import datetime as dt

    ts = dt.datetime(2025, 1, 1)
    bad = b'{"type": "FeatureCollection", "features": [{"type": "Feature"}]'  # truncated
    pages = spark.createDataFrame(
        [("https://host9.example.com/bad.geojson", ts, bad, "", "fr")],
        "url string, warc_ts timestamp, html binary, text string, lang string",
    )
    store = StateStore(str(tmp_path_factory.mktemp("fmt_bad")))
    init_state(store, generate_frontier(spark, pages))
    run_crawl(spark, pages=pages, store=store, cfg=DEFAULT.with_(batch_size=10), rounds=1)
    c = store.checks.read(spark).first()
    assert c["mime_type"] == "application/vnd.geo+json"
    assert c["pmtiles_url"] is None
    assert c["analysis_error"] == "geojson:no parseable features"


def test_parquet_dictionary_and_unknown_types(spark):
    """_parquet_rows directly: dictionary columns dig into the value
    type (reference conversion/schema.py); an unmappable arrow type
    becomes a parse-error row, not a crash."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from hydra_spark.analysis.ingest import _parquet_rows

    # dictionary<string> column
    buf = io.BytesIO()
    pq.write_table(
        pa.table({"cat": pa.array(["a", "b", "a"]).dictionary_encode(),
                  "ts": pa.array([1, 2, 3], type=pa.timestamp("us"))}),
        buf,
    )
    rows = _parquet_rows("u", "r", "d", buf.getvalue(), "t")
    insp = json.loads(rows[0][6])
    assert insp["columns"]["cat"]["python_type"] == "string"
    assert insp["columns"]["ts"]["python_type"] == "datetime"
    assert len(rows) == 3 and rows[0][7] is None

    # duration type has no mapping -> error row with the reference's message shape
    buf2 = io.BytesIO()
    pq.write_table(pa.table({"d": pa.array([1], type=pa.duration("s"))}), buf2)
    err = _parquet_rows("u", "r", "d", buf2.getvalue(), "t")
    assert len(err) == 1 and err[0][7].startswith("parquet:Unknown pyarrow type")

    # truncated payload -> error row (pyarrow reports corrupt magic)
    bad = _parquet_rows("u", "r", "d", b"PAR1garbage", "t")
    assert bad[0][7].startswith("parquet:") and "magic" in bad[0][7]


def test_gzipped_parquet_roundtrip(spark):
    """gzip wrapper is stripped before magic dispatch (utils/file.py
    transparent extraction) - a .parquet.gz resource still ingests."""
    import gzip

    from hydra_spark.analysis.ingest import _analyse_one

    rows = _analyse_one("u", "r", "d", gzip.compress(_parquet_bytes()), "t")
    assert len(rows) == 3 and rows[0][7] is None
    assert json.loads(rows[1][5])["n"] == 2

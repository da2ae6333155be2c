"""Fixed StructTypes for the engine's core tables.

Reference data model (SURVEY.md §1.1, FIXTURES.md):
- ``pages``        — Common-Crawl-style web corpus (BASELINE.json input_hint)
- ``frontier``     — hydra's `catalog` PG table
  (reference: migrations/main/20221205_initial_up_rev1.sql:1-11 + later revs)
- ``checks``       — hydra's `checks` append log
  (reference: migrations/main/20221205_initial_up_rev1.sql:13-27 + revs)
- ``tables_index`` — parsed-table metadata
  (reference: migrations/csv/20221205_initial_up_rev1.sql:3-10)
"""

from __future__ import annotations

from pyspark.sql import types as T

PAGES_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType(), False),
        T.StructField("warc_ts", T.TimestampType(), True),
        T.StructField("html", T.BinaryType(), True),
        T.StructField("text", T.StringType(), True),
        T.StructField("lang", T.StringType(), True),
    ]
)

FRONTIER_SCHEMA = T.StructType(
    [
        T.StructField("dataset_id", T.StringType(), True),
        T.StructField("resource_id", T.StringType(), False),  # unique key
        T.StructField("url", T.StringType(), False),
        T.StructField("deleted", T.BooleanType(), False),
        T.StructField("last_check", T.LongType(), True),      # FK → checks.id
        T.StructField("priority", T.BooleanType(), False),
        T.StructField("status", T.StringType(), True),
        T.StructField("status_since", T.TimestampType(), True),
        T.StructField("harvest_modified_at", T.TimestampType(), True),
        T.StructField("type", T.StringType(), True),
        T.StructField("format", T.StringType(), True),
        T.StructField("title", T.StringType(), True),
        # ours, for scale: stable host-hash bucket for partitioning (§2.4)
        T.StructField("host_bucket", T.IntegerType(), True),
    ]
)

CHECKS_SCHEMA = T.StructType(
    [
        T.StructField("id", T.LongType(), False),
        T.StructField("resource_id", T.StringType(), True),
        T.StructField("url", T.StringType(), True),
        T.StructField("domain", T.StringType(), True),
        T.StructField("created_at", T.TimestampType(), False),
        T.StructField("status", T.IntegerType(), True),
        T.StructField("headers", T.MapType(T.StringType(), T.StringType()), True),
        T.StructField("timeout", T.BooleanType(), True),
        T.StructField("response_time", T.DoubleType(), True),
        T.StructField("error", T.StringType(), True),
        T.StructField("checksum", T.StringType(), True),
        T.StructField("filesize", T.LongType(), True),
        T.StructField("mime_type", T.StringType(), True),
        T.StructField("analysis_error", T.StringType(), True),
        T.StructField("detected_last_modified_at", T.TimestampType(), True),
        T.StructField("next_check_at", T.TimestampType(), True),
        T.StructField("parsing_table", T.StringType(), True),
        T.StructField("parsing_error", T.StringType(), True),
        T.StructField("parsing_started_at", T.TimestampType(), True),
        T.StructField("parsing_finished_at", T.TimestampType(), True),
        T.StructField("parquet_url", T.StringType(), True),
        T.StructField("parquet_size", T.LongType(), True),
        # pmtiles_* filled by exports.pmtiles.export_pmtiles (S14: a
        # stdlib PMTiles v3 writer over distributed tiling — the
        # reference shells to tippecanoe instead,
        # data_formats/geojson/to_pmtiles.py:16-47); NULL for resources
        # without point geometry, like parquet_url for non-tabular ones
        T.StructField("pmtiles_url", T.StringType(), True),
        T.StructField("pmtiles_size", T.LongType(), True),
        T.StructField("geojson_url", T.StringType(), True),
        T.StructField("geojson_size", T.LongType(), True),
        T.StructField("cors_headers", T.MapType(T.StringType(), T.StringType()), True),
        T.StructField("ogc_metadata", T.StringType(), True),
    ]
)

TABLES_INDEX_SCHEMA = T.StructType(
    [
        T.StructField("parsing_table", T.StringType(), False),  # md5(url)
        T.StructField("csv_detective", T.StringType(), True),   # inspection JSON
        T.StructField("resource_id", T.StringType(), True),
        T.StructField("dataset_id", T.StringType(), True),
        T.StructField("url", T.StringType(), True),
        T.StructField("created_at", T.TimestampType(), True),
        T.StructField("indexes", T.StringType(), True),
        T.StructField("deleted_at", T.TimestampType(), True),
    ]
)

RESOURCES_EXCEPTIONS_SCHEMA = T.StructType(
    [
        T.StructField("resource_id", T.StringType(), False),
        T.StructField("table_indexes", T.StringType(), True),  # JSON
        T.StructField("comment", T.StringType(), True),
    ]
)

# hydra's scalar type vocabulary → Spark (SURVEY.md §1.2;
# reference: udata_hydra/conversion/schema.py:26-64)
PYTHON_TYPE_TO_SPARK = {
    "string": T.StringType(),
    "int": T.LongType(),
    "float": T.DoubleType(),
    "bool": T.BooleanType(),
    "date": T.DateType(),
    "datetime": T.TimestampNTZType(),
    "datetime_aware": T.TimestampType(),
    "json": T.StringType(),
    "binary": T.BinaryType(),
}

# reserved column names get renamed on ingest
# (reference: udata_hydra/db/__init__.py:10-15)
RESERVED_COLS = ("tableoid", "xmin", "cmin", "xmax", "cmax", "ctid")


def db_col_name(name: str) -> str:
    """Reserved-column rename rule (reference: db/__init__.py:10-15)."""
    return f"{name}__hydra_renamed" if name.lower() in RESERVED_COLS else name

"""Export sinks (SURVEY.md §2.1 S11-S14; reference:
udata_hydra/data_formats/table/to_parquet.py, to_geojson.py,
csv_like/to_geojson.py, geojson/to_pmtiles.py)."""

from hydra_spark.exports.parquet import export_parquet  # noqa: F401
from hydra_spark.exports.geojson import (  # noqa: F401
    detect_geo_columns,
    export_geojson,
    geojson_features,
    latlon_to_lonlat,
)
from hydra_spark.exports.pmtiles import (  # noqa: F401
    assign_tiles,
    export_pmtiles,
    read_pmtiles,
)

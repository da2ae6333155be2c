"""Tabular analysis: csv-detective-style inspection, typed casting,
distributed ingest, profiling (reference: udata_hydra/analysis/*,
udata_hydra/data_formats/csv_like/*, csv-detective semantics pinned by
tests/test_conversion/test_csv_to_db.py)."""

from hydra_spark.analysis.inspect import inspect_csv, ParsingError  # noqa: F401
from hydra_spark.analysis.casting import detect_column_type, smart_cast_cell  # noqa: F401
from hydra_spark.analysis.ingest import analyse_csv_batch, load_parsed_table  # noqa: F401

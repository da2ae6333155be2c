"""Typed-cast golden corpus + inspection/profile/error-reporting tests.

Mirrors the reference's tests/test_conversion/test_csv_to_db.py:14-124
and tests/test_analysis/test_analysis_csv.py:104-151, 721-759 — the
byte/value-identical parsing bar from SURVEY.md §5.
"""

import json
import math
from datetime import date, datetime

import pytest

from hydra_spark.analysis.ingest import analyse_csv_batch, load_parsed_table
from hydra_spark.analysis.inspect import ParsingError, inspect_csv

BATCH_SCHEMA = "url string, resource_id string, dataset_id string, html binary"


def _ingest(spark, body: bytes, url="http://example.com/f.csv"):
    df = spark.createDataFrame([(url, "rid", "did", bytearray(body))], BATCH_SCHEMA)
    rows = analyse_csv_batch(df)
    return rows.collect(), rows


def _typed(spark, body: bytes):
    collected, rows = _ingest(spark, body)
    insp = json.loads(next(r["inspection"] for r in collected if r["inspection"]))
    table = collected[0]["parsing_table"]
    out = load_parsed_table(spark, rows, insp, table).orderBy("__id").collect()
    return [r.asDict() for r in out], insp


@pytest.mark.parametrize(
    "line,expected,sep",
    [
        ("1,1020.20,test,true", (1, 1, 1020.2, "test", True), ","),
        ('2,"1020,20",test,false', (1, 2, 1020.2, "test", False), ","),
        ("1;1020.20;test;true", (1, 1, 1020.2, "test", True), ";"),
        ("2;1020,20;test;false", (1, 2, 1020.2, "test", False), ";"),
        ("2.0;1020,20;test;false", (1, 2, 1020.2, "test", False), ";"),
        ("2.0|1020,20|test|false", (1, 2, 1020.2, "test", False), "|"),
    ],
)
def test_simple_type_casting(spark, line, expected, sep):
    header = sep.join(["int", "float", "string", "bool"])
    body = f"{header}\n{line}".encode()
    assert inspect_csv(body)["separator"] == sep
    recs, _ = _typed(spark, body)
    assert len(recs) == 1
    assert recs[0] == dict(zip(["__id", "int", "float", "string", "bool"], expected))


@pytest.mark.parametrize(
    "line,expected",
    [
        (
            '{"a": 1};31 décembre 2022;2022-31-12 12:00:00.92;2030-06-22 00:00:00.0028+02:00',
            (
                1,
                '{"a": 1}',
                date(2022, 12, 31),
                datetime(2022, 12, 31, 12, 0, 0, 920000),
                # aware 2030-06-22 00:00:00.0028+02:00 == 2030-06-21 22:00 UTC
                datetime(2030, 6, 21, 22, 0, 0, 2800),
            ),
        ),
        (
            '[{"a": 1, "b": 2}];31st december 2022;12/31/2022 12:00:00;1996/06/22 10:20:10 GMT',
            (
                1,
                '[{"a": 1, "b": 2}]',
                date(2022, 12, 31),
                datetime(2022, 12, 31, 12, 0, 0),
                datetime(1996, 6, 22, 10, 20, 10),
            ),
        ),
    ],
)
def test_complex_type_casting(spark, line, expected):
    body = f"json;date;datetime;aware_datetime\n{line}".encode()
    recs, insp = _typed(spark, body)
    assert insp["columns"]["json"]["python_type"] == "json"
    assert insp["columns"]["date"]["python_type"] == "date"
    assert insp["columns"]["datetime"]["python_type"] == "datetime"
    assert insp["columns"]["aware_datetime"]["python_type"] == "datetime_aware"
    got = recs[0]
    assert got["__id"] == 1
    assert got["json"] == expected[1]
    assert got["date"] == expected[2]
    assert got["datetime"] == expected[3]
    # Spark returns aware timestamps as naive-UTC datetimes (session tz UTC)
    assert got["aware_datetime"] == expected[4]


def test_sql_injection_column_name(spark):
    injection = 'col_name" text);DROP TABLE toto;--'
    body = f"int,{injection},col1,col2\n1,test,2,3".encode()
    recs, insp = _typed(spark, body)
    assert insp["separator"] == ","
    assert recs[0][injection] == "test"


def test_percentage_column(spark):
    recs, _ = _typed(spark, b"int,% mon pourcent\n1,test")
    assert recs[0]["% mon pourcent"] == "test"


def test_reserved_column_renamed(spark):
    recs, _ = _typed(spark, b"int,xmin\n1,test")
    assert recs[0]["xmin__hydra_renamed"] == "test"


def test_empty_file_error(spark):
    collected, _ = _ingest(spark, b"")
    assert len(collected) == 1
    assert collected[0]["parsing_error"] == (
        "csv_detective:Could not accurately retrieve headers position"
    )
    assert collected[0]["row_json"] is None


def test_ragged_file_error(spark):
    collected, _ = _ingest(spark, b"a,b,c\n1,2")
    assert collected[0]["parsing_error"] == (
        "csv_detective:Number of columns is not even across the first 10 rows "
        "(detected separator: ,)."
    )


def test_nan_inf_values_and_profile(spark):
    body = b"a,b,c\n1,1.0,inf\n2,nan,2.0\n3,3.0,3.0\n"
    recs, insp = _typed(spark, body)
    assert recs[0]["c"] == math.inf
    assert recs[1]["b"] is None
    prof = insp["profile"]
    for col in ("a", "b"):
        assert all(prof[col][m] is not None for m in ("min", "max", "mean", "std"))
    assert all(prof["c"][m] is None for m in ("max", "mean", "std"))
    assert prof["c"]["min"] == 2.0
    assert insp["total_lines"] == 3


def test_profile_values(spark):
    _, insp = _typed(spark, b"a\n1\n2\n3")
    p = insp["profile"]["a"]
    assert (p["min"], p["max"], p["mean"]) == (1.0, 3.0, 2.0)
    assert abs(p["std"] - 1.0) < 1e-12


def test_preamble_header_row_detected(spark):
    """Files with title/date preamble lines before the header parse from
    the detected header position (csv-detective's header_row_idx)."""
    body = b"Rapport annuel\nG\xc3\xa9n\xc3\xa9r\xc3\xa9 le 2024-01-01\ncode,number,label\n75056,12,paris\n13055,7,marseille"
    recs, insp = _typed(spark, body)
    assert insp["header_row_idx"] == 2
    assert insp["separator"] == ","
    assert insp["header"] == ["code", "number", "label"]
    assert insp["total_lines"] == 2
    assert (recs[0]["code"], recs[0]["number"], recs[0]["label"]) == (75056, 12, "paris")


def test_preamble_containing_separator(spark):
    """A preamble line that itself contains the separator (fewer columns
    than the table) still resolves."""
    body = b"note;v1\na;b;c;d\n1;2;3;4\n5;6;7;8"
    recs, insp = _typed(spark, body)
    assert insp["header_row_idx"] == 1
    assert insp["separator"] == ";"
    assert len(recs) == 2 and recs[0]["a"] == 1


def test_wider_first_row_is_still_ragged_error(spark):
    """A first row WIDER than the rest is a ragged file, not preamble —
    the reference error must be preserved."""
    collected, _ = _ingest(spark, b"a,b,c\n1,2\n3,4")
    assert collected[0]["parsing_error"] == (
        "csv_detective:Number of columns is not even across the first 10 rows "
        "(detected separator: ,)."
    )


def test_preamble_validation_roundtrip(spark):
    """validate_then_detect honors the stored header_row_idx."""
    from hydra_spark.analysis.inspect import inspect_csv, validate_inspection

    data = b"titre\ncode,label\n1,a\n2,b"
    prev = inspect_csv(data)
    assert prev["header_row_idx"] == 1
    again = validate_inspection(b"titre\ncode,label\n3,c", prev)
    assert again is not None and again["total_lines"] == 1
    # header moved -> invalid, full re-detection required
    assert validate_inspection(b"code,label\n3,c", prev) is None


def test_latin1_encoding_fallback(spark):
    """Non-UTF-8 bytes fall back to latin-1 and the inspection records
    the encoding (reference: csv-detective encoding detection)."""
    body = "ville,note\nSète,1\nNîmes,2".encode("latin-1")
    recs, insp = _typed(spark, body)
    assert insp["encoding"] == "latin-1"
    assert [r["ville"] for r in recs] == ["Sète", "Nîmes"]
    assert recs[0]["note"] == 1


def test_quoted_cells_with_separator_and_newline(spark):
    """Quote-aware parsing: separators and newlines inside quoted cells
    must not split columns/rows (stdlib csv semantics, utils/reader.py)."""
    body = b'name,desc,n\n"a, inc","line1\nline2",1\nplain,simple,2'
    recs, insp = _typed(spark, body)
    assert insp["total_lines"] == 2
    assert recs[0]["name"] == "a, inc"
    assert recs[0]["desc"] == "line1\nline2"
    assert recs[1]["n"] == 2

"""Byte-identity gates for the round-6 ingest fast paths.

The crawl's CSV analysis pass was restructured for speed (single parse,
single cast, pruned type detection, hand-rolled row JSON with stdlib
fallback). These tests pin the optimized implementations to the exact
bytes the original round-5 algorithm produced:

- `_row_json` against `json.dumps(dict(zip(...)))` over a value matrix
  covering every fast lane and every fallback lane;
- `_analyse_one` against an inline re-implementation of the round-5
  parse→inspect→re-parse→re-cast→dumps flow over awkward CSV payloads;
- `detect_column_type`'s pruned candidate filtering against the full
  per-value `value_types` intersection it replaced.
"""

from __future__ import annotations

import csv
import datetime
import gzip
import io
import json

from hydra_spark.analysis.casting import (
    _filter_types,
    detect_column_type,
    smart_cast_cell,
    value_types,
)
from hydra_spark.analysis.ingest import (
    _analyse_one,
    _json_default,
    _json_encode,
    _row_json,
)
from hydra_spark.analysis.inspect import ParsingError, inspect_csv


VALUE_MATRIX = [
    None, True, False, 0, -7, 12345, 10**20, 9007199254740993,
    0.0, -0.0, 1.5, 1020.2, 1e300, 1e-300, float("inf"), float("-inf"), float("nan"),
    "", " ", "plain", "item_42", 'quote"inside', "back\\slash", "décembre",
    "tab\there", "\x7f", "line\nbreak", "ünïcode", "ok ascii 123",
    datetime.date(2022, 12, 31), datetime.datetime(2022, 12, 31, 10, 20, 30),
]


def test_row_json_matches_stdlib_on_matrix():
    header = ["a", "b", "c"]
    prefixes = [_json_encode(k) + ": " for k in header]
    for v1 in VALUE_MATRIX:
        for v2 in VALUE_MATRIX[::3]:
            vals = [v1, v2, "x"]
            expect = json.dumps(dict(zip(header, vals)), default=_json_default)
            got = _row_json(prefixes, vals)
            if got is None:
                got = _json_encode(dict(zip(header, vals)))
            assert got == expect, (v1, v2)
    # truncated rows emit only present keys
    for vals in ([], ["only"], [1, 2]):
        expect = json.dumps(dict(zip(header, vals)), default=_json_default)
        got = _row_json(prefixes, vals) or _json_encode(dict(zip(header, vals)))
        assert got == expect


def _analyse_one_round5(url, rid, did, data, table):
    """The round-5 algorithm, verbatim shape: inspect, then re-parse and
    re-cast every cell, json.dumps per row."""
    from hydra_spark.analysis.ingest import _gunzip_if_needed

    data = _gunzip_if_needed(data)
    try:
        insp = inspect_csv(data)
    except ParsingError as e:
        return [(table, rid, did, url, None, None, None, f"csv_detective:{e}")]
    text = data.decode(insp["encoding"])
    reader = csv.reader(io.StringIO(text), delimiter=insp["separator"])
    rows = [r for r in reader if r]
    hidx = insp.get("header_row_idx", 0)
    from hydra_spark.schemas import db_col_name

    header = [db_col_name(h) for h in insp["header"]]
    types = [insp["columns"][h]["python_type"] for h in insp["header"]]
    out = []
    insp_json = json.dumps(insp, default=_json_default)
    for i, r in enumerate(rows[hidx + 1 :], start=1):
        rec = {}
        for name, t, v in zip(header, types, r):
            try:
                rec[name] = smart_cast_cell(t, v)
            except ValueError:
                rec[name] = None
        out.append(
            (table, rid, did, url, i, json.dumps(rec, default=_json_default),
             insp_json if i == 1 else None, None)
        )
    if not out:
        out.append((table, rid, did, url, 0, None, insp_json, None))
    return out


CSV_CASES = [
    b"code_insee,number,label\n75056,1,item_0\n13055,2,item_1",
    b"a,b\n1,2\n3,4\n",
    b"a;b;c\n1;2,5;x\n3;4,5;y",  # french decimal commas under ; dialect
    b"titre du fichier\na,b\n1,2\n3,4",  # preamble line before header
    b"a,b\n",  # header-only
    b"a,b\n1\n2,3,4",  # ragged tail rows (first 10 consistent not required past window)
    b"a,b\n1,2\nmismatch",
    b"col a,col a\n1,2",  # duplicate db column names -> dict collapse
    'nom,date\ncaf\xe9,31 d\xe9cembre 2022\n'.encode("latin-1"),  # latin-1 + date
    b'q,w\n"x,y",2\n"z",4',  # quoted separators
    b"a|b\n1|true\n2|false",
    b"x\n1\n2",  # single column
    b"",  # empty -> ParsingError
    gzip.compress(b"a,b\n1,2\n3,4"),
    b"lat,lon\n45.1,3.2\n44.9,3.9",  # hint-gated float formats
    b"a,b\n1,1e300\n2,inf",
    b"a,b\n1,nan\n2,2.5",
    b'j,s\n{"k": 1},plain\n[1],other',
]


def test_analyse_one_matches_round5_reference():
    for data in CSV_CASES:
        got = _analyse_one("https://u", "r", "d", data, "tbl")
        want = _analyse_one_round5("https://u", "r", "d", data, "tbl")
        assert got == want, data[:40]


def test_filter_types_equals_full_intersection():
    values = [
        "1", "2.5", "1020,20", "true", "31 décembre 2022", "2022-12-31",
        "12/31/2022 12:00:00", '{"a": 1}', "[1]", "text", "", "  ", "nan",
        "inf", "-3", "2.0", "1996/06/22 10:20:10 GMT",
    ]
    import itertools

    for seed, v in itertools.product(values, values):
        cand = value_types(seed)
        got = _filter_types(cand, v)
        want = cand & value_types(v)
        assert got == want, (seed, v)


def test_int_cast_overflow_is_failsafe_null():
    """A digit string past float range must NULL out like any impossible
    cast, not escape the ValueError failsafes as OverflowError and kill
    the analysis task (int(float(s)) raises OverflowError at ~1e309)."""
    import pytest

    from hydra_spark.analysis.casting import detect_column_type, smart_cast_cell

    huge = "9" * 400
    assert detect_column_type([huge]) == "int"  # the crash was reachable
    with pytest.raises(ValueError):
        smart_cast_cell("int", huge)
    # normal ints unchanged, including the float-ish ".00" form
    assert smart_cast_cell("int", "42") == 42
    assert smart_cast_cell("int", "5.00") == 5

"""Type detection + `_smart_cast` semantics (C8).

Pins the exact casting behavior of the reference's csv-detective
integration (udata_hydra/utils/casting.py:12-55 + the golden corpus in
tests/test_conversion/test_csv_to_db.py:14-84):

- "1020.20" and "1020,20" → float 1020.2 (French decimal comma)
- "2.0" → int 2 (integral floats detected as int)
- "true"/"false" (any case) → bool
- '{"a": 1}' / '[...]' → kept as JSON *string* (passthrough to storage)
- "31 décembre 2022" → date; "12/31/2022 12:00:00" → naive datetime;
  "1996/06/22 10:20:10 GMT" → aware datetime
- ""/None → NULL; float columns accept "nan" (→ NULL in storage per
  tests/test_analysis/test_analysis_csv.py:721-759) and "inf"
"""

from __future__ import annotations

import json
import math
import re
from typing import Any

from hydra_spark.analysis.dateparse import parse_date, parse_datetime

_INT_RE = re.compile(r"^[+-]?\d+(\.0*)?$")
_FLOAT_RE = re.compile(r"^[+-]?(\d+([.,]\d*)?|[.,]\d+)([eE][+-]?\d+)?$")
_BOOL = {"true": True, "false": False, "vrai": True, "faux": False}
_FLOAT_SPECIAL = {"nan", "inf", "-inf", "+inf", "infinity", "-infinity"}

# detection priority: most → least specific
TYPE_ORDER = ["bool", "int", "float", "date", "datetime", "datetime_aware", "json", "string"]

# csv-detective-style FORMATS that refine a python_type (the reference
# consumes these from the inspection: geo formats drive the GeoJSON
# export's column detection — data_formats/csv_like/to_geojson.py:25-52
# — and siret/code_postal drive table indexes via resources_exceptions).
# Value regexes; formats whose regex is ambiguous on values alone
# (insee vs postal, region, lonlat vs latlon, latitude/longitude vs any
# float) additionally need a HEADER-NAME hint, csv-detective's header
# scoring simplified to unanimity + hint.
FORMAT_CHECKS = {
    "siret": re.compile(r"^\d{14}$"),
    "siren": re.compile(r"^\d{9}$"),
    "code_commune_insee": re.compile(r"^(\d{2}|2[AB])\d{3}$"),
    "code_postal": re.compile(r"^\d{5}$"),
    "code_departement": re.compile(r"^(0[1-9]|[1-8]\d|9[0-5]|2[AB]|97[1-6])$"),
    "code_region": re.compile(r"^(\d{2}|0[1-9])$"),
    "email": re.compile(r"^[^@\s]+@[^@\s]+\.[^@\s]+$"),
    "url": re.compile(r"^https?://\S+$"),
    "latlon": re.compile(
        r"^[\[(]?\s*[+-]?\d{1,3}(\.\d+)?\s*,\s*[+-]?\d{1,3}(\.\d+)?\s*[\])]?$"
    ),
    "lonlat": re.compile(
        r"^[\[(]?\s*[+-]?\d{1,3}(\.\d+)?\s*,\s*[+-]?\d{1,3}(\.\d+)?\s*[\])]?$"
    ),
    "latitude": re.compile(r"^[+-]?\d{1,2}(\.\d+)?$"),
    "longitude": re.compile(r"^[+-]?\d{1,3}(\.\d+)?$"),
    "geojson": re.compile(r"^\s*\{.*\}\s*$", re.S),
}

_GEOM_TYPES = {
    "Point", "MultiPoint", "LineString", "MultiLineString",
    "Polygon", "MultiPolygon", "GeometryCollection",
}


def _pair(s: str) -> tuple[float, float] | None:
    try:
        a, b = s.strip().strip("[]()").split(",")
        return float(a), float(b)
    except ValueError:
        return None


def _valid_latlon(s: str) -> bool:
    p = _pair(s)
    return p is not None and -90 <= p[0] <= 90 and -180 <= p[1] <= 180


def _valid_lonlat(s: str) -> bool:
    p = _pair(s)
    return p is not None and -180 <= p[0] <= 180 and -90 <= p[1] <= 90


def _valid_geojson(s: str) -> bool:
    try:
        g = json.loads(s)
    except ValueError:
        return False
    return isinstance(g, dict) and g.get("type") in _GEOM_TYPES


# extra per-value validation beyond the regex
FORMAT_VALIDATORS = {
    "latlon": _valid_latlon,
    "lonlat": _valid_lonlat,
    "latitude": lambda s: -90 <= float(s) <= 90,
    "longitude": lambda s: -180 <= float(s) <= 180,
    "geojson": _valid_geojson,
}

# header substrings that unlock hint-gated formats
FORMAT_NAME_HINTS = {
    "code_commune_insee": ("insee", "commune"),
    "code_postal": ("postal", "cp", "code_post"),
    "code_departement": ("dep", "departement"),
    "code_region": ("region", "reg"),
    "lonlat": ("lonlat", "longlat"),
    "latitude": ("lat", "y"),
    "longitude": ("lon", "lng", "long", "x"),
}

# detection priority, most → least specific (first full match wins)
FORMAT_PRIORITY = [
    "siret", "siren", "code_commune_insee", "code_postal",
    "code_departement", "code_region", "geojson", "lonlat", "latlon",
    "latitude", "longitude", "email", "url",
]

# python_type a detected format refines (everything else → string)
FORMAT_PYTHON_TYPE = {"latitude": "float", "longitude": "float"}


def format_matches(fmt: str, value: str) -> bool:
    """Single-value check used both in detection and in validate-drift
    (inspect.validate_inspection): regex + optional range validator."""
    rx = FORMAT_CHECKS.get(fmt)
    if rx is None or not rx.match(value):
        return False
    v = FORMAT_VALIDATORS.get(fmt)
    try:
        return v is None or bool(v(value))
    except ValueError:
        return False


def detect_column_format(
    values: list[str | None], name: str | None = None
) -> tuple[str, str] | None:
    """(format, python_type) when a refined format matches every
    non-empty value; None otherwise. Hint-gated formats need the column
    header to carry one of their tokens (csv-detective's header scoring,
    simplified); the rest detect on values alone."""
    low = (name or "").lower()
    toks = set(re.split(r"[^a-z0-9]+", low))
    # normalize once, not once per candidate format: every format loop
    # re-ran str().strip() over the whole column in the crawl's hot
    # python pass (identical semantics — formats only ever see the
    # stripped non-empty values, and `seen` ⇔ the list is non-empty)
    norm = [s for v in values if v is not None and (s := str(v).strip())]
    if not norm:
        return None
    for fmt in FORMAT_PRIORITY:
        hints = FORMAT_NAME_HINTS.get(fmt)
        if hints is not None and not any(h in toks or (len(h) > 2 and h in low) for h in hints):
            continue
        # hoisted out of the value loop: this runs per column of every
        # inspected page in the crawl's hot python pass
        rx = FORMAT_CHECKS[fmt]
        validator = FORMAT_VALIDATORS.get(fmt)
        ok = True
        for s in norm:
            if not rx.match(s):
                ok = False
                break
            if validator is not None:
                try:
                    if not validator(s):
                        ok = False
                        break
                except ValueError:
                    ok = False
                    break
        if ok:
            return fmt, FORMAT_PYTHON_TYPE.get(fmt, "string")
    return None


def value_types(v: str) -> set[str]:
    """All python_types a single raw string can be."""
    out = {"string"}
    s = v.strip()
    if not s:
        return out
    low = s.lower()
    if low in _BOOL:
        out.add("bool")
    if _INT_RE.match(s):
        out.add("int")
        out.add("float")
    elif _FLOAT_RE.match(s) or low in _FLOAT_SPECIAL:
        out.add("float")
    if s[:1] in "{[":
        try:
            json.loads(s)
            out.add("json")
        except ValueError:
            pass
    if parse_date(s) is not None:
        out.add("date")
    dt = parse_datetime(s)
    if dt is not None:
        out.add("datetime_aware" if dt[1] else "datetime")
    return out


def _filter_types(cand: set[str], v: str) -> set[str]:
    """``cand & value_types(v)`` without probing types already ruled
    out — on a column whose candidates have narrowed to {string,int,
    float} this skips the date/datetime/json parses entirely. The
    result is provably identical to the full intersection because every
    skipped probe could only add types outside ``cand``."""
    s = v.strip()
    out = {"string"}
    low = s.lower()
    if "bool" in cand and low in _BOOL:
        out.add("bool")
    if "int" in cand or "float" in cand:
        if _INT_RE.match(s):
            out.add("int")
            out.add("float")
        elif "float" in cand and (_FLOAT_RE.match(s) or low in _FLOAT_SPECIAL):
            out.add("float")
    if "json" in cand and s[:1] in "{[":
        try:
            json.loads(s)
            out.add("json")
        except ValueError:
            pass
    if "date" in cand and parse_date(s) is not None:
        out.add("date")
    if "datetime" in cand or "datetime_aware" in cand:
        dt = parse_datetime(s)
        if dt is not None:
            out.add("datetime_aware" if dt[1] else "datetime")
    return cand & out


def detect_column_type(values: list[str | None]) -> str:
    """Most specific type every non-empty value supports (csv-detective's
    scoring, simplified to unanimity — sufficient for the corpus).

    The first value seeds the candidate set; later values only re-test
    the types still standing (`_filter_types`), so a numeric column
    costs one regex per value instead of the full date/json probe."""
    candidates: set[str] | None = None
    for v in values:
        if v is None or str(v).strip() == "":
            continue
        s = str(v)
        candidates = value_types(s) if candidates is None else _filter_types(candidates, s)
        if candidates == {"string"}:
            return "string"
    if not candidates:
        return "string"
    for t in TYPE_ORDER:
        if t in candidates:
            return t
    return "string"


def _cast_str(s: str) -> str:
    return s


def _cast_bool(s: str):
    try:
        return _BOOL[s.strip().lower()]
    except KeyError:
        raise ValueError(f"not a bool: {s!r}")


def _cast_int(s: str):
    if _INT_RE.match(s.strip()):
        try:
            return int(float(s.strip()))
        except OverflowError:
            # >~1e309 digit strings: float() yields inf and int(inf)
            # raises OverflowError, which would escape the callers'
            # `except ValueError` failsafes and kill the whole analysis
            # task — normalize to the documented impossible-cast error
            # so the cell becomes the failsafe NULL instead
            raise ValueError(f"not an int: {s!r}")
    raise ValueError(f"not an int: {s!r}")


def _cast_float(s: str):
    t = s.strip().lower()
    if t == "nan":
        return None  # NaN → NULL in storage
    if t in _FLOAT_SPECIAL:
        return math.inf if "-" not in t else -math.inf
    # French decimal comma: only when there's exactly one comma and
    # no dot (e.g. "1020,20")
    u = s.strip()
    if "," in u and "." not in u and u.count(",") == 1:
        u = u.replace(",", ".")
    return float(u)


def _cast_date(s: str):
    d = parse_date(s)
    if d is None:
        raise ValueError(f"not a date: {s!r}")
    return d


def _cast_datetime(s: str):
    dt = parse_datetime(s)
    if dt is None:
        raise ValueError(f"not a datetime: {s!r}")
    return dt[0]


# per-type cell casters — smart_cast_cell and the hot per-column path
# (_cast_matrix) dispatch through the SAME functions, so the two can
# never drift; the hot path just resolves the dict lookup once per
# column instead of re-walking a type-comparison chain per cell
CELL_CASTERS = {
    "string": _cast_str,
    "json": _cast_str,
    "bool": _cast_bool,
    "int": _cast_int,
    "float": _cast_float,
    "date": _cast_date,
    "datetime": _cast_datetime,
    "datetime_aware": _cast_datetime,
}


def smart_cast_cell(python_type: str, value: Any) -> Any:
    """The `_smart_cast` matrix (utils/casting.py:12-25): ''/None → None,
    json passthrough, typed parse otherwise. Raises ValueError on
    impossible casts (failsafe handling is the caller's job)."""
    if value is None:
        return None
    s = str(value)
    if s == "":
        return None
    return CELL_CASTERS.get(python_type, _cast_str)(s)

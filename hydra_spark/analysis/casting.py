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

# csv-detective-style FORMATS that refine a string python_type (the
# reference's richer format vocabulary — siret is the one its fixtures
# exercise; extend here as corpora demand)
FORMAT_CHECKS = {
    "siret": re.compile(r"^\d{14}$"),
    "siren": re.compile(r"^\d{9}$"),
}


def detect_column_format(values: list[str | None]) -> tuple[str, str] | None:
    """(format, python_type) when a refined string format matches every
    non-empty value; None otherwise. siret/siren win over the numeric
    python types (csv-detective scores them higher)."""
    for fmt, rx in FORMAT_CHECKS.items():
        seen = False
        ok = True
        for v in values:
            if v is None or str(v).strip() == "":
                continue
            seen = True
            if not rx.match(str(v).strip()):
                ok = False
                break
        if seen and ok:
            return fmt, "string"
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


def detect_column_type(values: list[str | None]) -> str:
    """Most specific type every non-empty value supports (csv-detective's
    scoring, simplified to unanimity — sufficient for the corpus)."""
    candidates: set[str] | None = None
    for v in values:
        if v is None or str(v).strip() == "":
            continue
        t = value_types(str(v))
        candidates = t if candidates is None else candidates & t
        if candidates == {"string"}:
            return "string"
    if not candidates:
        return "string"
    for t in TYPE_ORDER:
        if t in candidates:
            return t
    return "string"


def smart_cast_cell(python_type: str, value: Any) -> Any:
    """The `_smart_cast` matrix (utils/casting.py:12-25): ''/None → None,
    json passthrough, typed parse otherwise. Raises ValueError on
    impossible casts (failsafe handling is the caller's job)."""
    if value is None:
        return None
    s = str(value)
    if s == "":
        return None
    if python_type == "string" or python_type == "json":
        return s
    if python_type == "bool":
        try:
            return _BOOL[s.strip().lower()]
        except KeyError:
            raise ValueError(f"not a bool: {s!r}")
    if python_type == "int":
        if _INT_RE.match(s.strip()):
            return int(float(s.strip()))
        raise ValueError(f"not an int: {s!r}")
    if python_type == "float":
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
    if python_type == "date":
        d = parse_date(s)
        if d is None:
            raise ValueError(f"not a date: {s!r}")
        return d
    if python_type in ("datetime", "datetime_aware"):
        dt = parse_datetime(s)
        if dt is None:
            raise ValueError(f"not a datetime: {s!r}")
        return dt[0]
    return s

"""CSV inspection — the csv-detective subset the corpus needs.

Reference: udata_hydra/data_formats/csv_like/__init__.py:35-58 calls
csv-detective's `routine`/`validate_then_detect`, producing an
"inspection" dict: {encoding, separator, header_row_idx, header,
columns: {name: {format, python_type, score}}, total_lines, formats,
profile{min,max,mean,std}} (shape asserted in
tests/test_analysis/test_analysis_csv.py:307-348).

This module re-derives that inspection deterministically:
- encoding: utf-8, latin-1 fallback
- separator: the candidate in [, ; | \\t] that yields a consistent
  column count ≥ 2 over the first 10 rows (quote-aware via csv module)
- error strings match the reference exactly
  (tests/test_analysis/test_analysis_csv.py:104-151):
  * empty/undetectable header → "Could not accurately retrieve headers
    position"
  * ragged rows → "Number of columns is not even across the first 10
    rows (detected separator: X)."
- profile: min/max/mean/std per numeric column; NaN values are ignored,
  an inf value nulls max/mean/std but not min
  (tests/test_analysis/test_analysis_csv.py:721-759)
"""

from __future__ import annotations

import csv
import io
import math

from hydra_spark.analysis.casting import (
    FORMAT_CHECKS,
    detect_column_format,
    detect_column_type,
    smart_cast_cell,
)

SEPARATORS = [",", ";", "|", "\t"]
HEADER_SCAN_ROWS = 10
MAX_COL_NAME_BYTES = 64  # PG NAMEDATALEN guard kept for parity (F9)


class ParsingError(Exception):
    pass


def _rows(text: str, sep: str, limit: int | None = None) -> list[list[str]]:
    r = csv.reader(io.StringIO(text), delimiter=sep)
    out = []
    for i, row in enumerate(r):
        if limit is not None and i >= limit:
            break
        out.append(row)
    return out


def detect_separator(text: str) -> str:
    """Consistent-column-count vote over the first rows."""
    best_valid, best_cols = None, 1
    best_any, best_any_cols = ",", 1
    for sep in SEPARATORS:
        try:
            rows = [r for r in _rows(text, sep, HEADER_SCAN_ROWS) if r]
        except csv.Error:
            continue
        if not rows:
            continue
        ncols = len(rows[0])
        if ncols > best_any_cols:
            best_any, best_any_cols = sep, ncols
        if ncols >= 2 and all(len(r) == ncols for r in rows):
            if ncols > best_cols:
                best_valid, best_cols = sep, ncols
    if best_valid is not None:
        return best_valid
    if best_any_cols >= 2:
        # a separator produces multiple columns but the counts are ragged
        raise ParsingError(
            f"Number of columns is not even across the first {HEADER_SCAN_ROWS} rows "
            f"(detected separator: {best_any})."
        )
    # single-column file: treat as comma-separated one-column data
    return ","


def validate_inspection(data: bytes, prev: dict) -> dict | None:
    """`validate_then_detect`'s validation half (reference:
    data_formats/csv_like/__init__.py:41-50; truth table in
    tests/test_analysis/test_analysis_csv.py:351-474): the new file
    still conforms to the previous inspection iff the separator and
    header are unchanged and every value casts to its column's previous
    python_type. Valid → the previous inspection is reused with fresh
    total_lines/profile (types stay stable across re-crawls); invalid →
    None, caller runs the full detection."""
    try:
        text = data.decode(prev.get("encoding", "utf-8"))
    except UnicodeDecodeError:
        return None
    rows = [r for r in _rows(text, prev["separator"]) if r]
    if not rows or rows[0] != prev["header"]:
        return None
    # separator sanity: the previous separator must still be the winner
    try:
        if detect_separator(text) != prev["separator"]:
            return None
    except ParsingError:
        return None
    body = rows[1:]
    ncols = len(prev["header"])
    if any(len(r) != ncols for r in body[: HEADER_SCAN_ROWS - 1]):
        return None
    for j, name in enumerate(prev["header"]):
        col = prev["columns"][name]
        t = col["python_type"]
        fmt_rx = FORMAT_CHECKS.get(col.get("format"))
        values = [r[j] if j < len(r) else None for r in body]
        for v in values:
            if v is None or str(v).strip() == "":
                continue
            if fmt_rx is not None:
                # refined format (e.g. siret) must still match — this is
                # what invalidates format drift like siret → date
                if not fmt_rx.match(str(v).strip()):
                    return None
                continue
            try:
                smart_cast_cell(t, v)
            except ValueError:
                return None
    out = dict(prev)
    out["total_lines"] = len(body)
    out["profile"] = _profile(prev["header"], prev["columns"], body)
    out["from_validation"] = True
    return out


def _profile(header: list[str], cols: dict, body: list[list[str]]) -> dict:
    profile = {}
    for j, name in enumerate(header):
        t = cols[name]["python_type"]
        if t not in ("int", "float"):
            continue
        vals = []
        for r in body:
            v = r[j] if j < len(r) else None
            try:
                c = smart_cast_cell(t, v)
            except ValueError:
                c = None
            if c is not None:
                vals.append(float(c))
        if not vals:
            profile[name] = {"min": None, "max": None, "mean": None, "std": None}
            continue
        has_inf = any(math.isinf(v) for v in vals)
        finite = [v for v in vals if math.isfinite(v)]
        mn = min(finite) if finite else None
        if has_inf:
            profile[name] = {"min": mn, "max": None, "mean": None, "std": None}
        else:
            n = len(vals)
            mean = sum(vals) / n
            std = (sum((v - mean) ** 2 for v in vals) / (n - 1)) ** 0.5 if n > 1 else None
            profile[name] = {"min": mn, "max": max(vals), "mean": mean, "std": std}
    return profile


def inspect_csv(data: bytes) -> dict:
    try:
        text = data.decode("utf-8")
        encoding = "utf-8"
    except UnicodeDecodeError:
        text = data.decode("latin-1")
        encoding = "latin-1"

    if not text.strip():
        raise ParsingError("Could not accurately retrieve headers position")

    sep = detect_separator(text)
    rows = [r for r in _rows(text, sep) if r]
    header, body = rows[0], rows[1:]
    if any(len(h.encode("utf-8")) >= MAX_COL_NAME_BYTES for h in header):
        raise ParsingError("Column names are too long")

    ncols = len(header)
    for r in body[: HEADER_SCAN_ROWS - 1]:
        if len(r) != ncols:
            raise ParsingError(
                f"Number of columns is not even across the first {HEADER_SCAN_ROWS} rows "
                f"(detected separator: {sep})."
            )

    cols = {}
    for j, name in enumerate(header):
        values = [r[j] if j < len(r) else None for r in body]
        refined = detect_column_format(values)
        if refined is not None:
            fmt, t = refined
            cols[name] = {"format": fmt, "python_type": t, "score": 1.5}
        else:
            t = detect_column_type(values)
            cols[name] = {"format": t, "python_type": t, "score": 1.0}

    profile = _profile(header, cols, body)

    formats: dict[str, list[str]] = {}
    for name, c in cols.items():
        formats.setdefault(c["format"], []).append(name)

    return {
        "encoding": encoding,
        "separator": sep,
        "header_row_idx": 0,
        "header": header,
        "columns": cols,
        "total_lines": len(body),
        "formats": formats,
        "profile": profile,
    }

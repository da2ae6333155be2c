"""Deterministic freeform date parsing (C7/C8).

The reference delegates to `dateparser`/csv-detective for values like
"31 décembre 2022", "31st december 2022", "12/31/2022 12:00:00",
"2022-31-12 12:00:00.92", "1996/06/22 10:20:10 GMT",
"2030-06-22 00:00:00.0028+02:00" (golden corpus:
tests/test_conversion/test_csv_to_db.py:44-84). This module re-implements
exactly that surface with regexes — no external dependency, identical
results on the corpus.

Disambiguation rules:
- year-first forms: if the middle component > 12, it is the day
  ("2022-31-12" → 2022-12-31).
- slash forms: whichever of the first two components exceeds 12 is the
  day ("12/31/2022" → US order); if both ≤ 12, day-first (French
  convention, matching the reference's fr-locale dateparser).
"""

from __future__ import annotations

import re
from datetime import date, datetime, timedelta, timezone

_MONTHS = {
    # fr
    "janvier": 1, "fevrier": 2, "février": 2, "mars": 3, "avril": 4, "mai": 5,
    "juin": 6, "juillet": 7, "aout": 8, "août": 8, "septembre": 9,
    "octobre": 10, "novembre": 11, "decembre": 12, "décembre": 12,
    # en
    "january": 1, "february": 2, "march": 3, "april": 4, "may": 5, "june": 6,
    "july": 7, "august": 8, "september": 9, "october": 10, "november": 11,
    "december": 12,
}
_MONTH_RE = "|".join(sorted(_MONTHS, key=len, reverse=True))

_TEXTUAL = re.compile(
    rf"^\s*(\d{{1,2}})\s*(?:st|nd|rd|th|er|e)?\s+({_MONTH_RE})\s+(\d{{4}})\s*$",
    re.IGNORECASE,
)
_YMD = re.compile(r"^\s*(\d{4})[-/](\d{1,2})[-/](\d{1,2})\s*$")
_DMY = re.compile(r"^\s*(\d{1,2})[-/](\d{1,2})[-/](\d{4})\s*$")
_DT = re.compile(
    r"^\s*(?P<date>\S+(?:\s+\S+\s+\S+)?(?<!:\d\d))[ T]"
    r"(?P<h>\d{1,2}):(?P<m>\d{2}):(?P<s>\d{2})(?:\.(?P<f>\d+))?"
    r"(?:\s*(?P<tz>GMT|UTC|Z|[+-]\d{2}:?\d{2}))?\s*$"
)


def _ymd_fix(y: int, a: int, b: int) -> tuple[int, int, int] | None:
    """year-first: (a,b) = (month,day) unless a > 12."""
    if a > 12 and b <= 12:
        a, b = b, a
    if not (1 <= a <= 12 and 1 <= b <= 31):
        return None
    return y, a, b


def parse_date(s: str) -> date | None:
    s = s.strip()
    m = _TEXTUAL.match(s)
    if m:
        return date(int(m.group(3)), _MONTHS[m.group(2).lower()], int(m.group(1)))
    m = _YMD.match(s)
    if m:
        fixed = _ymd_fix(int(m.group(1)), int(m.group(2)), int(m.group(3)))
        return date(*fixed) if fixed else None
    m = _DMY.match(s)
    if m:
        a, b, y = int(m.group(1)), int(m.group(2)), int(m.group(3))
        if a > 12 and b <= 12:
            d, mo = a, b        # day-first
        elif b > 12 and a <= 12:
            mo, d = a, b        # month-first (US)
        elif a <= 12 and b <= 12:
            d, mo = a, b        # ambiguous → day-first (fr)
        else:
            return None
        if not (1 <= mo <= 12 and 1 <= d <= 31):
            return None
        return date(y, mo, d)
    return None


def parse_datetime(s: str) -> tuple[datetime, bool] | None:
    """→ (datetime, aware). Microseconds from a fractional part of any
    length; tz from GMT/UTC/Z or ±HH:MM."""
    m = _DT.match(s.strip())
    if not m:
        return None
    d = parse_date(m.group("date"))
    if d is None:
        return None
    frac = m.group("f") or ""
    micros = int(round(float("0." + frac) * 1_000_000)) if frac else 0
    dt = datetime(d.year, d.month, d.day, int(m.group("h")), int(m.group("m")),
                  int(m.group("s")), micros)
    tz = m.group("tz")
    if tz is None:
        return dt, False
    if tz in ("GMT", "UTC", "Z"):
        return dt.replace(tzinfo=timezone.utc), True
    sign = 1 if tz[0] == "+" else -1
    hh, mm = int(tz[1:3]), int(tz[-2:])
    return dt.replace(tzinfo=timezone(sign * timedelta(hours=hh, minutes=mm))), True

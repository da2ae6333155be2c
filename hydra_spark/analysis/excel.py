"""Excel (xlsx) reader — S7.

Reference: udata_hydra/utils/reader.py:31-67 iterates sheets via
openpyxl (xlsx) / xlrd (xls) and feeds the same casting pipeline as CSV.
openpyxl does not ship in this container, but xlsx is just zip + XML:
the stdlib codec in hydra_spark.analysis.xlsx covers the cell types
that matter (sharedStrings, inline strings, formula strings, numbers).
openpyxl is still preferred when importable (full fidelity for exotic
workbooks); legacy .xls (BIFF) stays gated — it needs xlrd.
"""

from __future__ import annotations

import io
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame

from hydra_spark.analysis.ingest import ROWS_SCHEMA, _analyse_one
from hydra_spark.analysis.xlsx import XLSX_MAGIC, XLSX_MIME, xlsx_bytes, xlsx_rows  # noqa: F401

try:  # pragma: no cover - not installed in this sandbox
    import openpyxl  # noqa: F401

    HAVE_OPENPYXL = True
except ImportError:
    HAVE_OPENPYXL = False


def _rows_from_xlsx(data: bytes) -> list[list[str]]:
    if HAVE_OPENPYXL:  # pragma: no cover - not installed in this sandbox
        wb = openpyxl.load_workbook(io.BytesIO(data), read_only=True)
        sheet = wb[wb.sheetnames[0]]
        return [["" if c.value is None else str(c.value) for c in row] for row in sheet.iter_rows()]
    return xlsx_rows(data)


def analyse_excel_batch(df: DataFrame) -> DataFrame:
    """Same contract as analyse_csv_batch, over xlsx payloads: rows are
    re-serialized to CSV text and run through the shared inspection +
    smart-cast pipeline (so typing semantics stay identical)."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import csv as _csv
        import io as _io

        names = [f.name for f in ROWS_SCHEMA.fields]
        cols = ["url", "resource_id", "dataset_id", "html", "parsing_table"]
        for pdf in batches:
            out: list[tuple] = []
            for url, rid, did, html, table in pdf[cols].itertuples(index=False):
                if html is None:
                    continue
                try:
                    rows = _rows_from_xlsx(bytes(html))
                except Exception as e:  # malformed zip/XML, missing dep, ...
                    out.append((table, rid, did, url, None, None, None, f"excel:{e}"))
                    continue
                buf = _io.StringIO()
                _csv.writer(buf).writerows(rows)
                out.extend(_analyse_one(url, rid, did, buf.getvalue().encode(), table))
            yield pd.DataFrame(out, columns=names)

    return df.mapInPandas(gen, schema=ROWS_SCHEMA)

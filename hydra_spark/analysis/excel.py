"""Excel (xls/xlsx) reader — S7, import-gated.

Reference: udata_hydra/utils/reader.py:31-67 iterates sheets via
openpyxl (xlsx) / xlrd (xls) and feeds the same casting pipeline as CSV.
Neither library ships in this container, so the parse is gated behind an
import-try: the Spark plumbing (binary column in, ROWS_SCHEMA out,
mapInPandas batching) is identical to the CSV path and real; only the
workbook decode needs the dependency.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame

from hydra_spark.analysis.ingest import ROWS_SCHEMA, _analyse_one

try:  # pragma: no cover - not installed in this sandbox
    import openpyxl  # noqa: F401

    HAVE_OPENPYXL = True
except ImportError:
    HAVE_OPENPYXL = False


def _rows_from_xlsx(data: bytes) -> list[list[str]]:
    if not HAVE_OPENPYXL:
        raise NotImplementedError(
            "xlsx parsing requires openpyxl (not in this container); "
            "the csv path covers the shared inspect/cast/ingest logic"
        )
    import io

    wb = openpyxl.load_workbook(io.BytesIO(data), read_only=True)
    sheet = wb[wb.sheetnames[0]]
    return [["" if c.value is None else str(c.value) for c in row] for row in sheet.iter_rows()]


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
                except NotImplementedError as e:
                    out.append((table, rid, did, url, None, None, None, f"excel:{e}"))
                    continue
                buf = _io.StringIO()
                _csv.writer(buf).writerows(rows)
                out.extend(_analyse_one(url, rid, did, buf.getvalue().encode(), table))
            yield pd.DataFrame(out, columns=names)

    return df.mapInPandas(gen, schema=ROWS_SCHEMA)

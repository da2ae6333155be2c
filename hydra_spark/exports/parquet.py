"""Parquet export (S11).

Reference: udata_hydra/data_formats/table/to_parquet.py:20-72 — streams
a PG table through 50 000-row pyarrow batches with zstd compression.
Spark's pipelined writer replaces the manual batching entirely; only the
codec choice and the MIN_LINES gate survive as semantics.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame

from hydra_spark.config import DEFAULT, HydraConfig


def export_parquet(
    df: DataFrame, path: str, cfg: HydraConfig = DEFAULT, force: bool = False
) -> dict | None:
    """Write zstd parquet; skipped below MIN_LINES_FOR_PARQUET
    (config_default.toml:100) unless forced — hydra's "don't bother for
    tiny tables" rule."""
    n = df.count()
    if not force and n < cfg.min_lines_for_parquet:
        return None
    df.write.mode("overwrite").option("compression", "zstd").parquet(path)
    size = sum(
        os.path.getsize(os.path.join(r, f))
        for r, _, fs in os.walk(path)
        for f in fs
        if f.endswith(".parquet")
    )
    return {"parquet_url": path, "parquet_size": size, "rows": n}

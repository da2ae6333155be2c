"""Purge / retention maintenance (reference: udata_hydra/cli/purge.py).

- `purge_checks_keep_last_n`: retention top-N per resource
  (cli/purge.py:124-126 — `ORDER BY created_at DESC OFFSET $1` delete;
  here the W6 window anti-selection).
- `purge_orphan_tables`: parsed tables whose md5(url) no longer appears
  in the live catalog (cli/purge.py:42-63, SO1) — the selection lives in
  stats.orphan_tables; this applies it to the outputs log.

Both are rewrite-style maintenance jobs (run rarely, not per round).
"""

from __future__ import annotations

import logging

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from hydra_spark.stats import orphan_tables
from hydra_spark.storage import StateStore

logger = logging.getLogger(__name__)


def checks_keep_last_n(checks: DataFrame, n: int) -> DataFrame:
    """The rows that SURVIVE retention: newest n checks per resource."""
    w = Window.partitionBy("resource_id").orderBy(F.desc("created_at"), F.desc("id"))
    return checks.withColumn("_rn", F.row_number().over(w)).where(F.col("_rn") <= n).drop("_rn")


def purge_checks_keep_last_n(
    spark: SparkSession, store: StateStore, n: int, gc_min_age_s: float = 3600.0
) -> dict:
    """Compact the checks log to the newest n per resource (one batch).

    `rewrite` materializes the survivors to a FRESH batch dir while the
    old manifest (and its batch dirs, which the lazy `kept` plan reads)
    is still intact, and only then flips the manifest — wiping the
    manifest first would delete the plan's own input mid-read. The
    superseded dirs are then garbage-collected (age-gated for any
    still-open readers; pass gc_min_age_s=0 in single-driver runs)."""
    before = store.checks.read(spark).count()
    kept = checks_keep_last_n(store.checks.read(spark), n)
    store.checks.rewrite(kept, meta={"op": "retention", "keep_last": n})
    after = store.checks.read(spark).count()
    gcd = store.checks.gc(gc_min_age_s)
    logger.info(
        "checks retention keep_last=%d: %d -> %d rows (%d deleted, %d dirs gc'd)",
        n, before, after, before - after, gcd,
    )
    return {"before": before, "after": after, "gc_dirs": gcd}


def purge_orphan_parsed(
    spark: SparkSession, store: StateStore, gc_min_age_s: float = 3600.0
) -> dict:
    """Drop parsed rows + tables_index entries for orphaned tables.

    Same write-before-flip protocol as purge_checks_keep_last_n: the
    live_outputs plan scans the CURRENT batch dirs, so the compacted
    copy must land on disk before the manifest moves; superseded dirs
    are then age-gated garbage-collected."""
    frontier = store.frontier.read(spark)
    ti = store.tables_index.read(spark)
    orphans = orphan_tables(ti, frontier)
    outputs = store.outputs.read(spark)
    live_outputs = outputs.join(F.broadcast(orphans), "parsing_table", "left_anti")
    before = outputs.count()
    store.outputs.rewrite(live_outputs, meta={"op": "purge_orphans"})
    after = store.outputs.read(spark).count()
    gcd = store.outputs.gc(gc_min_age_s)
    logger.info("orphan purge: dropped %d parsed rows (%d dirs gc'd)", before - after, gcd)
    return {"dropped_rows": before - after, "gc_dirs": gcd}

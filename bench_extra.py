"""Stage-isolated timings for the crawl round (guide §1.4 noop-sink method).

NOT the driver bench — bench.py is frozen. This harness decomposes the
round-1 crawl DAG into cumulative sub-DAGs, each forced with the noop
sink, so the per-stage marginal cost is visible:

  claim        select_batch over the seeded frontier
  fetch        + simulate_fetch join against pages
  detect       + prev-join / detect_changes / plan columns
  arrow_rt     Arrow round-trip of to_process through a pass-through
               mapInPandas (pure JVM<->Python transfer cost)
  py_text      process_fetched with parsing disabled (text extraction only)
  py_full      process_fetched as the round runs it
  write        py_full written to parquet (outputs.append analog)

Env: SPARK_GRAFT_SF_DIR, SPARK_GRAFT_CPUS, HYDRA_BENCH_SF as bench.py.
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time


def force(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    sf = float(sf_dir.rstrip("/").rsplit("sf", 1)[-1]) if "sf" in sf_dir else 0.1
    sf_crawl = float(os.environ.get("HYDRA_BENCH_SF", sf))

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from hydra_spark.session import get_spark

    extra = {
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "8m",
        "spark.driver.memory": os.environ.get("HYDRA_SPARK_DRIVER_MEM", "32g"),
        "spark.driver.extraJavaOptions": "-Djava.net.preferIPv4Stack=true -XX:+UseParallelGC",
    }
    if os.path.isdir("/dev/shm"):
        os.makedirs("/dev/shm/spark-local", exist_ok=True)
        extra["spark.local.dir"] = "/dev/shm/spark-local"
    spark = get_spark(cores=cpus, shuffle_partitions=max(cpus * 2, 8), app="hydra_bench_extra", extra=extra)

    from pyspark.sql import functions as F

    from hydra_spark.analysis.ingest import process_fetched
    from hydra_spark.config import DEFAULT
    from hydra_spark.crawl.backoff import domain_backoff, split_backoff
    from hydra_spark.crawl.change import detect_changes, has_check_changed_expr
    from hydra_spark.crawl.fetch import simulate_fetch
    from hydra_spark.crawl.select_batch import select_batch
    from hydra_spark.datagen import generate_frontier, generate_pages

    n_urls = max(int(10_000_000 * sf_crawl), 20_000)
    batch = n_urls // 2
    pages = generate_pages(spark, n_urls, n_hosts=max(int(n_urls / 500), 200))
    pages = pages.repartition(max(cpus * 2, 8), F.col("url")).persist()
    pages.count()
    frontier = generate_frontier(spark, pages).persist()
    frontier.count()
    cfg = DEFAULT.with_(batch_size=batch, backoff_nb_req=10**9)
    now = "2025-01-15 00:00:00"
    round_id = 1

    t: dict[str, float] = {}

    def timed(name: str, fn) -> None:
        spark.sparkContext.setJobDescription(name)
        t0 = time.time()
        fn()
        t[name] = round(time.time() - t0, 3)
        spark.sparkContext.setJobDescription(None)

    claimed = select_batch(frontier, None, cfg, round_id, now)
    timed("claim", lambda: force(claimed))

    claimed_p = claimed.persist()
    claimed_p.count()
    go, held = split_backoff(claimed_p, domain_backoff(None, cfg, now))
    fetched = simulate_fetch(go, pages, cfg, round_id, now)
    timed("fetch", lambda: force(fetched))

    from hydra_spark.schemas import CHECKS_SCHEMA
    from hydra_spark.crawl.round import _PREV_COLS

    cur = fetched
    for c in _PREV_COLS:
        cur = cur.withColumn(
            f"prev_{c}",
            F.lit(None).cast(
                dict(zip(CHECKS_SCHEMA.fieldNames(), [f.dataType for f in CHECKS_SCHEMA.fields]))[c]
            ),
        )
    cur = cur.withColumn("prev_exists", F.col("prev_id").isNotNull())
    cur = detect_changes(cur, now)
    cur = cur.withColumn("has_check_changed", has_check_changed_expr())
    analysable = F.col("status").isNotNull() & (F.col("status") < 400)
    cur = cur.withColumn(
        "parsing_table",
        F.when(analysable & (F.col("mime_type").isin("text/csv", "application/gzip")), F.md5(F.col("url"))),
    )
    timed("detect", lambda: force(cur))

    to_process = cur.where(
        F.col("html").isNotNull() & F.col("status").isNotNull() & (F.col("status") < 400)
    ).select("url", "resource_id", "dataset_id", "html", "parsing_table")

    # Arrow round-trip only: pass-through mapInPandas, same columns
    def _ident(batches):
        yield from batches

    rt = to_process.mapInPandas(
        _ident,
        schema="url string, resource_id string, dataset_id string, html binary, parsing_table string",
    )
    timed("arrow_rt", lambda: force(rt))

    text_only = to_process.withColumn("parsing_table", F.lit(None).cast("string"))
    timed("py_text", lambda: force(process_fetched(text_only)))

    timed("py_full", lambda: force(process_fetched(to_process)))

    out_dir = tempfile.mkdtemp(prefix="hydra_bx_") + "/outputs"
    timed("write", lambda: process_fetched(to_process).write.parquet(out_dir))
    import shutil

    shutil.rmtree(os.path.dirname(out_dir), ignore_errors=True)

    print(json.dumps({"metric": "crawl_stage_isolation", "sf_crawl": sf_crawl, "cpus": cpus, "stages": t}))
    spark.stop()


if __name__ == "__main__":
    main()

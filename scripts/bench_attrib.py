"""Attribute crawl_rounds wall time to its stages (cross-round bench
forensics): runs the bench.py crawl protocol (2 x batch rounds over a
seed-fixed corpus, local[N]) under one VARIANT and prints ONE JSON line
with per-round per-stage timings.

Variants (stage toggles are real config knobs, not bench hacks):
  full       everything on (what bench.py measures)
  no_outbox  webhook outbox write off
  no_valid   validate-then-detect inspection-reuse join off
  plain      payload slices off: every page is plain text/csv bytes
             (no gzip / xlsx / xls decode work in the python pass)
  r1_like    all of the above off — the closest runnable analog of the
             round-1 protocol

Usage:
  python scripts/bench_attrib.py <variant>        # one run, one JSON line
  for v in full no_outbox no_valid plain r1_like; do
      python scripts/bench_attrib.py $v; done > BENCH/attrib.jsonl

Env: SPARK_GRAFT_CPUS (default 32), HYDRA_BENCH_SF (default 0.1),
HYDRA_SPARK_DRIVER_MEM (default 32g).
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

VARIANTS = ("full", "no_outbox", "no_valid", "plain", "r1_like")


def main() -> None:
    variant = sys.argv[1] if len(sys.argv) > 1 else "full"
    assert variant in VARIANTS, f"variant must be one of {VARIANTS}"
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    sf = float(os.environ.get("HYDRA_BENCH_SF", "0.1"))

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from hydra_spark.session import get_spark

    extra = {
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "8m",
        "spark.driver.memory": os.environ.get("HYDRA_SPARK_DRIVER_MEM", "32g"),
        "spark.driver.extraJavaOptions": "-Djava.net.preferIPv4Stack=true -XX:+UseParallelGC",
    }
    if os.path.isdir("/dev/shm"):
        os.makedirs("/dev/shm/spark-local", exist_ok=True)
        extra["spark.local.dir"] = "/dev/shm/spark-local"
    spark = get_spark(
        cores=cpus, shuffle_partitions=max(cpus * 2, 8), app=f"attrib_{variant}", extra=extra
    )

    from pyspark.sql import functions as F

    from hydra_spark.config import DEFAULT
    from hydra_spark.crawl.loop import init_state, run_crawl
    from hydra_spark.datagen import generate_frontier, generate_pages
    from hydra_spark.storage import StateStore

    n_urls = max(int(10_000_000 * sf), 20_000)
    rounds = 2
    batch = n_urls // rounds
    pages = generate_pages(spark, n_urls, n_hosts=max(int(n_urls / 500), 200))
    if variant in ("plain", "r1_like"):
        # strip the gzip/xlsx/xls slices: payload = the reference text
        pages = pages.withColumn("html", F.encode(F.col("text"), "UTF-8"))
    pages = pages.repartition(max(cpus * 2, 8), F.col("url")).persist()
    pages.count()
    frontier = generate_frontier(spark, pages)
    store = StateStore(tempfile.mkdtemp(prefix=f"attrib_{variant}_"))
    init_state(store, frontier)
    cfg = DEFAULT.with_(
        batch_size=batch,
        backoff_nb_req=10**9,
        webhook_outbox=variant not in ("no_outbox", "r1_like"),
        validate_then_detect=variant not in ("no_valid", "r1_like"),
    )

    t0 = time.time()
    res = run_crawl(spark, store, pages, cfg, rounds=rounds)
    wall = time.time() - t0
    n = sum(r["n_checked"] for r in res)
    print(
        json.dumps(
            {
                "variant": variant,
                "wall_s": round(wall, 3),
                "urls_per_s": round(n / wall, 2),
                "n_urls_checked": n,
                "cpus": cpus,
                "sf_crawl": sf,
                "stage_timings": [r["timings"] for r in res],
            }
        )
    )
    spark.stop()
    shutil.rmtree(store.root, ignore_errors=True)


if __name__ == "__main__":
    main()

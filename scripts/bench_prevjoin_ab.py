"""Interleaved same-session A/B: prev-checks join placement (guide §8).

Variant "late"  = round-5 shape: claim → fetch join (payload attached)
                  → prev join keyed on resource_id — the payload bytes
                  cross an Exchange hashpartitioning(resource_id).
Variant "early" = claim → prev join (slim×slim) → fetch join — the
                  payload never crosses an exchange (pages stream from
                  their url-partitioned layout).

Both variants ran the REAL run_round code (a temporary
HYDRA_PREV_JOIN_EARLY toggle flipped the placement), interleaved in ONE
Spark session, fresh store per rep, 2 rounds each (the prev join only
exists from round 2), comparing per-variant minima of round-2 stage
timings and total wall. Results: BENCH/prevjoin_ab_r06.json — a wash
locally (shuffle-to-tmpfs overlaps the python pass), "early" kept for
the at-scale plan property. NOTE: the toggle was removed after the
decision; run_round now always uses the early placement, so re-running
this script today times early against itself — it is kept as the
protocol record for the measurement in BENCH/prevjoin_ab_r06.json.

Env: SPARK_GRAFT_CPUS, HYDRA_BENCH_SF (crawl corpus scale), REPS.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time


def main() -> None:
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    sf_crawl = float(os.environ.get("HYDRA_BENCH_SF", "1"))
    reps = int(os.environ.get("REPS", "3"))

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
        cores=cpus, shuffle_partitions=max(cpus * 2, 8), app="prevjoin_ab", extra=extra
    )

    from pyspark.sql import functions as F

    from hydra_spark.config import DEFAULT
    from hydra_spark.crawl.loop import init_state, run_crawl
    from hydra_spark.datagen import generate_frontier, generate_pages

    n_urls = max(int(10_000_000 * sf_crawl), 20_000)
    batch = n_urls // 2
    pages = generate_pages(spark, n_urls, n_hosts=max(int(n_urls / 500), 200))
    pages = pages.repartition(max(cpus * 2, 8), F.col("url")).persist()
    pages.count()
    frontier = generate_frontier(spark, pages).persist()
    frontier.count()
    cfg = DEFAULT.with_(batch_size=batch, backoff_nb_req=10**9)

    runs: list[dict] = []
    for rep in range(reps):
        for variant in ("late", "early"):
            os.environ["HYDRA_PREV_JOIN_EARLY"] = "1" if variant == "early" else "0"
            from hydra_spark.storage import StateStore

            root = tempfile.mkdtemp(prefix=f"prevjoin_{variant}_")
            store = StateStore(root)
            init_state(store, frontier)
            spark.sparkContext.setJobDescription(f"prevjoin_ab {variant} rep{rep}")
            t0 = time.time()
            res = run_crawl(spark, store, pages, cfg, rounds=2)
            wall = round(time.time() - t0, 3)
            runs.append(
                {
                    "variant": variant,
                    "rep": rep,
                    "wall_s": wall,
                    "stage_timings": [r["timings"] for r in res],
                    "n_checked": sum(r["n_checked"] for r in res),
                }
            )
            print(
                json.dumps(runs[-1]), flush=True
            )
            shutil.rmtree(root, ignore_errors=True)
            spark.sparkContext.setJobDescription(None)

    def _min(variant: str, key: str, rnd: int) -> float:
        return min(r["stage_timings"][rnd].get(key, 0.0) for r in runs if r["variant"] == variant)

    summary = {
        "sf_crawl": sf_crawl,
        "cpus": cpus,
        "reps": reps,
        "min_wall": {v: min(r["wall_s"] for r in runs if r["variant"] == v) for v in ("late", "early")},
        "round2_analyse_min": {v: _min(v, "analyse_write", 1) for v in ("late", "early")},
        "round2_writes_min": {v: _min(v, "writes_wall", 1) for v in ("late", "early")},
    }
    print(json.dumps({"metric": "prevjoin_ab", **summary}))
    spark.stop()


if __name__ == "__main__":
    main()

"""North-rule scaling evidence: the same crawl job at N and 4N cores.

No real cluster exists in this sandbox (BASELINE.md), so pinned
local[c] processes stand in for cluster sizes: `taskset` confines the
WHOLE process (JVM helper threads included) to c cores — without
pinning, local[2]'s GC/IO/serde threads overflow onto the box's other
30 cores and inflate the small-cluster baseline.

Each level runs the same seeded input: one warm-up round (JIT, python
worker pool), then `repeats` timed big-batch rounds; per-level
throughput is the BEST timed round across HYDRA_SCALE_RUNS process
repetitions (noise on a shared box only ever subtracts). Efficiency =
thr(4N) / (4 × thr(N)).

Cluster-faithful resources per level: a 4N-executor cluster carries 4×
the aggregate memory of an N-executor one, so each level's JVM heap is
sized per core (HYDRA_SCALE_GB_PER_CORE, default 4 GiB/core) — a fixed
heap would starve the big "cluster" into extra GC and understate its
throughput. ParallelGC: throughput collector for a batch workload.

Usage: python scripts/bench_scaling.py [n_urls] [out.json]
Env: HYDRA_SCALE_LEVELS=2,8  HYDRA_SCALE_REPEATS=1  HYDRA_SCALE_RUNS=2
     HYDRA_SCALE_GB_PER_CORE=4
"""

import json
import os
import subprocess
import sys

WORKER = r'''
import json, os, sys, tempfile, time
sys.path.insert(0, "/root/repo")
from hydra_spark.session import get_spark
from hydra_spark.config import DEFAULT
from hydra_spark.crawl.loop import init_state, run_crawl
from hydra_spark.datagen import generate_frontier, generate_pages
from hydra_spark.storage import StateStore
from pyspark.sql import functions as F

cpus, n, repeats = int(sys.argv[1]), int(sys.argv[2]), int(sys.argv[3])
gb_per_core = int(os.environ.get("HYDRA_SCALE_GB_PER_CORE", "4"))
# per-core heap, CAPPED well under the box's 128 GiB: an uncapped
# 32-core level would claim a 128 g heap and thrash the page cache the
# shuffle dirs + parquet writes live in (measured: 32 cores at 128 g is
# SLOWER than 8 cores at 32 g)
heap_gb = min(gb_per_core * cpus, int(os.environ.get("HYDRA_SCALE_MAX_GB", "48")))
spark = get_spark(cores=cpus, shuffle_partitions=cpus * 2, app=f"scale{cpus}",
                  extra={"spark.sql.adaptive.advisoryPartitionSizeInBytes": "8m",
                         "spark.local.dir": "/dev/shm/spark-local",
                         "spark.driver.memory": f"{heap_gb}g",
                         "spark.driver.extraJavaOptions":
                             "-Djava.net.preferIPv4Stack=true -XX:+UseParallelGC"})
# hash-partition by url: the per-round fetch join reuses this
# partitioning (Iceberg bucket(url) analog) — pages never re-shuffle
pages = (generate_pages(spark, n, n_hosts=max(n // 2000, 50))
         .repartition(cpus * 2, F.col("url")).persist())
pages.count()
store = StateStore(tempfile.mkdtemp(prefix=f"scale{cpus}_"))
init_state(store, generate_frontier(spark, pages))

warm_batch = n // 8
timed_batch = (n - warm_batch) // repeats
run_crawl(spark, store, pages, DEFAULT.with_(batch_size=warm_batch, backoff_nb_req=10**9),
          rounds=1)  # warm-up
cfg = DEFAULT.with_(batch_size=timed_batch, backoff_nb_req=10**9)
best = None
for _ in range(repeats):
    r = run_crawl(spark, store, pages, cfg, rounds=1)[0]
    if best is None or r["urls_per_s"] > best["urls_per_s"]:
        best = r
print("RESULT " + json.dumps({"cpus": cpus, "n_urls": n, "timed_batch": timed_batch,
                              "best_round": best}))
# leave nothing behind: a prior level's multi-GB store on /tmp measurably
# slows later levels (dirty-page writeback competes with the timed round)
import shutil
spark.stop()
shutil.rmtree(store.root, ignore_errors=True)
'''


def run_level_once(cpus: int, n: int, repeats: int) -> dict:
    cmd = [sys.executable, "-c", WORKER, str(cpus), str(n), str(repeats)]
    if os.environ.get("HYDRA_SCALE_PIN", "1") == "1":
        cmd = ["taskset", "-c", f"0-{cpus - 1}"] + cmd
    out = subprocess.run(cmd, capture_output=True, text=True, timeout=1500)
    for line in out.stdout.splitlines():
        if line.startswith("RESULT "):
            return json.loads(line[len("RESULT "):])
    raise RuntimeError(f"level {cpus} failed:\n{out.stdout[-2000:]}\n{out.stderr[-2000:]}")


def run_level(cpus: int, n: int, repeats: int, runs: int) -> dict:
    best = None
    for _ in range(runs):
        r = run_level_once(cpus, n, repeats)
        if best is None or r["best_round"]["urls_per_s"] > best["best_round"]["urls_per_s"]:
            best = r
    best["runs"] = runs
    return best


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 4_000_000
    out_path = sys.argv[2] if len(sys.argv) > 2 else "BENCH/scaling.json"
    repeats = int(os.environ.get("HYDRA_SCALE_REPEATS", "1"))
    runs = int(os.environ.get("HYDRA_SCALE_RUNS", "2"))
    levels = [int(x) for x in os.environ.get("HYDRA_SCALE_LEVELS", "2,8").split(",")]
    results = {c: run_level(c, n, repeats, runs) for c in levels}
    lo, hi = min(levels), max(levels)
    thr_lo = results[lo]["best_round"]["urls_per_s"]
    thr_hi = results[hi]["best_round"]["urls_per_s"]
    eff = thr_hi / ((hi / lo) * thr_lo)
    summary = {
        "n_urls": n,
        "levels": {str(c): results[c] for c in levels},
        "throughput_urls_per_s": {str(lo): thr_lo, str(hi): thr_hi},
        "scaling_efficiency": round(eff, 3),
        "criterion": f"eff = thr({hi}) / ({hi // lo} x thr({lo})) >= 0.8",
        "pass": eff >= 0.8,
    }
    os.makedirs(os.path.dirname(out_path), exist_ok=True)
    with open(out_path, "w") as f:
        json.dump(summary, f, indent=1)
    print(json.dumps(summary))


if __name__ == "__main__":
    main()

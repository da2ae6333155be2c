"""North-rule scaling evidence: the same crawl job at N and 4N cores.

No real cluster exists in this sandbox (BASELINE.md), so local[c]
thread counts stand in for executor counts. Each level runs the same
input (seeded datagen), one warm-up round, then `repeats` timed rounds;
the per-level throughput is the BEST round (machine noise on a shared
box only ever subtracts). Efficiency = thr(4N) / (4 × thr(N)).

Usage: python scripts/bench_scaling.py [n_urls] [out.json]
Writes one JSON line per level plus the efficiency summary.
"""

import json
import os
import subprocess
import sys

WORKER = r'''
import json, sys, tempfile, time
sys.path.insert(0, "/root/repo")
from hydra_spark.session import get_spark
from hydra_spark.config import DEFAULT
from hydra_spark.crawl.loop import init_state, run_crawl
from hydra_spark.datagen import generate_frontier, generate_pages
from hydra_spark.storage import StateStore
from pyspark.sql import functions as F

cpus, n, repeats = int(sys.argv[1]), int(sys.argv[2]), int(sys.argv[3])
spark = get_spark(cores=cpus, shuffle_partitions=cpus * 2, app=f"scale{cpus}",
                  extra={"spark.sql.adaptive.advisoryPartitionSizeInBytes": "8m",
                         "spark.local.dir": "/dev/shm/spark-local"})
pages = (generate_pages(spark, n, n_hosts=max(n // 2000, 50))
         .repartition(cpus * 2, F.col("url")).persist())
pages.count()
store = StateStore(tempfile.mkdtemp(prefix=f"scale{cpus}_"))
init_state(store, generate_frontier(spark, pages))
cfg = DEFAULT.with_(batch_size=n // (repeats + 2), backoff_nb_req=10**9)
run_crawl(spark, store, pages, cfg, rounds=1)  # warm-up (JIT, workers)
best = None
for _ in range(repeats):
    r = run_crawl(spark, store, pages, cfg, rounds=1)[0]
    thr = r["urls_per_s"]
    if best is None or thr > best["urls_per_s"]:
        best = r
print("RESULT " + json.dumps({"cpus": cpus, "n_urls": n, "best_round": best}))
'''


def run_level(cpus: int, n: int, repeats: int) -> dict:
    out = subprocess.run(
        [sys.executable, "-c", WORKER, str(cpus), str(n), str(repeats)],
        capture_output=True, text=True, timeout=1500,
    )
    for line in out.stdout.splitlines():
        if line.startswith("RESULT "):
            return json.loads(line[len("RESULT "):])
    raise RuntimeError(f"level {cpus} failed:\n{out.stdout[-2000:]}\n{out.stderr[-2000:]}")


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 3_000_000
    out_path = sys.argv[2] if len(sys.argv) > 2 else "BENCH/scaling.json"
    repeats = int(os.environ.get("HYDRA_SCALE_REPEATS", "3"))
    levels = [int(x) for x in os.environ.get("HYDRA_SCALE_LEVELS", "2,8").split(",")]
    results = {c: run_level(c, n, repeats) for c in levels}
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

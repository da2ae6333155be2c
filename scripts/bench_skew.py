"""Skew stress evidence (VERDICT r3 task #6, SURVEY §7 risk register):
one domain owning 50% of the corpus must not serialize the claim or the
round. Runs the IDENTICAL 2-round crawl protocol (bench.py's crawl
section) on two same-size corpora — uniform Zipf hosts vs
hot_host_frac=0.5 — and reports both walls plus the hot/uniform ratio
(target ≤ ~1.2×) and the claim spread of the hot round's batch.

The mitigations under test: the salted per-(domain, salt)-shard claim
windows (select_batch.py scale path), the bucket quota, AQE skew-join
splitting, and the per-domain claim cap (inert here: throughput runs
disable the politeness budget; the cap's correctness is asserted in
tests/test_crawl_round.py at the default budget).

Usage: python scripts/bench_skew.py [n_urls] [out.json]
"""

from __future__ import annotations

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

n, hot = int(sys.argv[1]), float(sys.argv[2])
cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
extra = {"spark.sql.adaptive.advisoryPartitionSizeInBytes": "8m",
         "spark.driver.memory": os.environ.get("HYDRA_SPARK_DRIVER_MEM", "32g"),
         "spark.driver.extraJavaOptions":
             "-Djava.net.preferIPv4Stack=true -XX:+UseParallelGC"}
if os.path.isdir("/dev/shm"):
    os.makedirs("/dev/shm/spark-local", exist_ok=True)
    extra["spark.local.dir"] = "/dev/shm/spark-local"
spark = get_spark(cores=cpus, shuffle_partitions=cpus * 2, app=f"skew{hot}", extra=extra)
pages = generate_pages(spark, n, n_hosts=max(n // 500, 200),
                       hot_host_frac=hot if hot > 0 else None)
pages = pages.repartition(cpus * 2, F.col("url")).persist()
pages.count()
store = StateStore(tempfile.mkdtemp(prefix=f"skew{int(hot*100)}_"))
init_state(store, generate_frontier(spark, pages))
batch = n // 2
cfg = DEFAULT.with_(batch_size=batch, backoff_nb_req=10**9)

t0 = time.time()
res = run_crawl(spark, store, pages, cfg, rounds=2)
wall = time.time() - t0
n_checked = sum(r["n_checked"] for r in res)

# claim spread of a hot-corpus batch: how concentrated is the claimed
# set, and how concentrated is the per-partition work
from hydra_spark.crawl.select_batch import select_batch
from hydra_spark.crawl.round import latest_checks
lc = latest_checks(store.checks.read(spark))
b = select_batch(store.frontier.read(spark), lc, cfg, 3, "2025-01-15 00:02:00")
spread = (b.groupBy("domain").count()
          .agg(F.count("*").alias("n_domains"), F.max("count").alias("max_domain"),
               F.sum("count").alias("n_claimed")).first())
bucket = (b.groupBy("host_bucket").count()
          .agg(F.max("count").alias("max_bucket"),
               F.avg("count").alias("avg_bucket")).first())
print("RESULT " + json.dumps({
    "hot_host_frac": hot, "n_urls": n, "rounds": 2, "batch_size": batch,
    "wall_s": round(wall, 2), "n_checked": n_checked,
    "urls_per_s": round(n_checked / wall, 1),
    "stage_timings": [r["timings"] for r in res],
    "claim_spread": {
        "n_claimed": spread["n_claimed"], "n_domains": spread["n_domains"],
        "max_one_domain": spread["max_domain"],
        "max_domain_share": round(spread["max_domain"] / max(spread["n_claimed"], 1), 4),
        "max_bucket": bucket["max_bucket"],
        "bucket_balance": round(bucket["max_bucket"] / max(bucket["avg_bucket"], 1), 3),
    },
}))
import shutil
spark.stop()
shutil.rmtree(store.root, ignore_errors=True)
'''


def run_variant(n: int, hot: float) -> dict:
    out = subprocess.run([sys.executable, "-c", WORKER, str(n), str(hot)],
                         capture_output=True, text=True, timeout=2400)
    for line in out.stdout.splitlines():
        if line.startswith("RESULT "):
            return json.loads(line[len("RESULT "):])
    raise RuntimeError(f"variant hot={hot} failed:\n{out.stdout[-2000:]}\n{out.stderr[-2000:]}")


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 10_000_000
    # default to a round-neutral name — a hardcoded round file silently
    # overwrites prior-round evidence on re-runs
    out_path = sys.argv[2] if len(sys.argv) > 2 else "BENCH/skew.json"
    uniform = run_variant(n, 0.0)
    hot = run_variant(n, 0.5)
    ratio = hot["wall_s"] / uniform["wall_s"]
    # Raw per-URL wall is CONFOUNDED for the hot corpus: the bucket
    # quota (and, at default config, the politeness budget) throttles
    # the hot domain BY DESIGN, so hot rounds check fewer URLs and the
    # fixed per-round cost (driver planning, manifest commits,
    # small-table writes) inflates their per-URL wall. The honest
    # serialization signal is the MARGINAL per-URL cost of the stages
    # that scale with batch size (fetch+analysis+checks writes): if the
    # hot domain serialized a partition, that is where it would show.
    per_url = (hot["wall_s"] / max(hot["n_checked"], 1)) / (
        uniform["wall_s"] / max(uniform["n_checked"], 1))
    variable = ("analyse_write", "checks_write", "tables_index_write")

    def marginal(v):
        sec = sum(t.get(k, 0.0) for t in v["stage_timings"] for k in variable)
        return sec / max(v["n_checked"], 1)

    marg_ratio = marginal(hot) / marginal(uniform)
    balance = hot["claim_spread"]["bucket_balance"]
    summary = {
        "n_urls": n,
        "uniform": uniform,
        "hot50": hot,
        "wall_ratio_hot_over_uniform": round(ratio, 3),
        "per_url_ratio_hot_over_uniform": round(per_url, 3),
        "marginal_us_per_url": {"uniform": round(marginal(uniform) * 1e6, 2),
                                "hot50": round(marginal(hot) * 1e6, 2)},
        "marginal_per_url_ratio_hot_over_uniform": round(marg_ratio, 3),
        "criterion": "SURVEY §7 risk register: a 50%-hot domain must not "
                     "serialize the claim or the round — round wall <= 1.2x "
                     "uniform, marginal per-URL cost <= 1.2x, and no claim "
                     "bucket owns the round (balance <= 2)",
        "pass": ratio <= 1.2 and marg_ratio <= 1.2 and balance <= 2.0,
    }
    os.makedirs(os.path.dirname(out_path), exist_ok=True)
    with open(out_path, "w") as f:
        json.dump(summary, f, indent=1)
    print(json.dumps(summary))


if __name__ == "__main__":
    main()

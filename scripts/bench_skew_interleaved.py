"""Noise-immune skew gate (round-6 protocol; VERDICT r5 task #1).

The round-5 gate compared ONE hot run against ONE uniform run in
separate Spark sessions and failed on box noise (its own JSON records
1.5x wall variance between identical uniform rounds). This protocol
removes the confounders the way the verdict prescribed:

- ONE Spark session; both corpora generated and persisted up front;
- hot and uniform rounds INTERLEAVED (u,h,u,h,...), >=3 reps each,
  fresh StateStore per rep;
- per-variant MINIMUM of the marginal per-URL cost (the batch-scaling
  stages: analyse/checks/tables_index writes), which is the
  serialization signal the gate protects (bench_skew.py rationale).

Pass criteria (unchanged from r4/r5): marginal per-URL hot/uniform
<= 1.2 and hot-batch bucket balance <= 2.

Usage: python scripts/bench_skew_interleaved.py [n_urls] [reps] [out.json]
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

VARIABLE_STAGES = ("analyse_write", "checks_write", "tables_index_write")


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 10_000_000
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    out_path = sys.argv[3] if len(sys.argv) > 3 else "BENCH/skew_interleaved.json"

    from hydra_spark.session import get_spark

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    extra = {
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "8m",
        "spark.driver.memory": os.environ.get("HYDRA_SPARK_DRIVER_MEM", "32g"),
        "spark.driver.extraJavaOptions": "-Djava.net.preferIPv4Stack=true -XX:+UseParallelGC",
    }
    if os.path.isdir("/dev/shm"):
        os.makedirs("/dev/shm/spark-local", exist_ok=True)
        extra["spark.local.dir"] = "/dev/shm/spark-local"
    spark = get_spark(cores=cpus, shuffle_partitions=cpus * 2, app="skew_interleaved", extra=extra)

    from pyspark.sql import functions as F

    from hydra_spark.config import DEFAULT
    from hydra_spark.crawl.loop import init_state, run_crawl
    from hydra_spark.crawl.round import latest_checks
    from hydra_spark.crawl.select_batch import select_batch
    from hydra_spark.datagen import generate_frontier, generate_pages
    from hydra_spark.storage import StateStore

    corpora = {}
    for name, hot in (("uniform", None), ("hot50", 0.5)):
        pages = generate_pages(spark, n, n_hosts=max(n // 500, 200), hot_host_frac=hot)
        pages = pages.repartition(cpus * 2, F.col("url")).persist()
        pages.count()
        corpora[name] = (pages, generate_frontier(spark, pages).persist())
        corpora[name][1].count()

    batch = n // 2
    cfg = DEFAULT.with_(batch_size=batch, backoff_nb_req=10**9)

    def one_rep(name: str, keep_store: bool = False):
        pages, frontier = corpora[name]
        store = StateStore(tempfile.mkdtemp(prefix=f"skewi_{name}_"))
        init_state(store, frontier)
        spark.sparkContext.setJobDescription(f"skew:{name}")
        t0 = time.time()
        res = run_crawl(spark, store, pages, cfg, rounds=2)
        wall = time.time() - t0
        spark.sparkContext.setJobDescription(None)
        n_checked = sum(r["n_checked"] for r in res)
        var_s = sum(r["timings"].get(k, 0.0) for r in res for k in VARIABLE_STAGES)
        out = {
            "wall_s": round(wall, 2),
            "n_checked": n_checked,
            "marginal_us_per_url": round(var_s / max(n_checked, 1) * 1e6, 2),
            "stage_timings": [r["timings"] for r in res],
        }
        if keep_store:
            return out, store
        import shutil

        shutil.rmtree(store.root, ignore_errors=True)
        return out, None

    # warm-up (JIT + python worker pool), untimed
    one_rep("uniform")

    runs: dict[str, list] = {"uniform": [], "hot50": []}
    last_hot_store = None
    for rep in range(reps):
        for name in ("uniform", "hot50"):
            keep = name == "hot50" and rep == reps - 1
            out, store = one_rep(name, keep_store=keep)
            runs[name].append(out)
            print(f"rep{rep} {name}: wall={out['wall_s']} marginal={out['marginal_us_per_url']}us", flush=True)
            if store is not None:
                last_hot_store = store

    # claim spread of a round-3 hot batch (same probe as bench_skew.py)
    store = last_hot_store
    lc = latest_checks(store.checks.read(spark))
    b = select_batch(store.frontier.read(spark), lc, cfg, 3, "2025-01-15 00:02:00")
    spread = (
        b.groupBy("domain").count()
        .agg(F.count("*").alias("n_domains"), F.max("count").alias("max_domain"),
             F.sum("count").alias("n_claimed")).first()
    )
    bucket = (
        b.groupBy("host_bucket").count()
        .agg(F.max("count").alias("max_bucket"), F.avg("count").alias("avg_bucket")).first()
    )
    import shutil

    shutil.rmtree(store.root, ignore_errors=True)

    best = {k: min(r["marginal_us_per_url"] for r in v) for k, v in runs.items()}
    ratio = round(best["hot50"] / best["uniform"], 3)
    balance = round(bucket["max_bucket"] / max(bucket["avg_bucket"], 1), 3)
    summary = {
        "protocol": "interleaved same-session, min-of-%d per variant" % reps,
        "n_urls": n,
        "runs": runs,
        "best_marginal_us_per_url": best,
        "marginal_ratio_hot_over_uniform": ratio,
        "claim_spread": {
            "n_claimed": spread["n_claimed"],
            "n_domains": spread["n_domains"],
            "max_one_domain": spread["max_domain"],
            "max_domain_share": round(spread["max_domain"] / max(spread["n_claimed"], 1), 4),
            "max_bucket": bucket["max_bucket"],
            "bucket_balance": balance,
        },
        "criteria": {"marginal_ratio_max": 1.2, "bucket_balance_max": 2.0},
        "pass": bool(ratio <= 1.2 and balance <= 2.0),
    }
    os.makedirs(os.path.dirname(out_path) or ".", exist_ok=True)
    with open(out_path, "w") as f:
        json.dump(summary, f, indent=1)
    print(json.dumps({"pass": summary["pass"], "ratio": ratio, "balance": balance}))
    spark.stop()


if __name__ == "__main__":
    main()

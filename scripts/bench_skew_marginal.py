"""Skew gate v3: fixed-cost-free marginal per-URL cost (guide §2.5).

Why v3. The r4/r5 gate and the r6 interleaved protocol all divide the
batch-scaling stage walls by n_checked. That quotient is contaminated
by FIXED per-round costs (the claim windows over the WHOLE frontier,
the fetch join's scan of the whole pages cache, python worker pool
spin-up) — and the hot corpus legitimately under-fills round 2: the
bucket quota caps the hot host (by design — that IS the skew defense),
so round 2 claims ~3% of a uniform round's URLs while paying ~100% of
the fixed cost. The interleaved r6 run reproduces this cleanly:
hot/uniform "marginal" 1.66 while the hot runs' WALL is lower than
uniform's and bucket balance is 1.14 — the ratio measures the
denominator, not serialization.

v3 removes the fixed costs with a difference quotient instead of a
division: for each corpus, time ROUND 1 (fresh store — both corpora
fill the batch exactly, equal work) at TWO batch sizes and take

    marginal = (T(b2) - T(b1)) / (b2 - b1)

over the batch-scaling stages (analyse/checks/tables_index writes).
Fixed costs appear in both terms and cancel. All four cells
(uniform/hot x b1/b2) interleave in ONE Spark session, >=3 reps,
per-cell minimum.

Pass criteria: marginal ratio hot/uniform <= 1.2 and hot-batch bucket
balance <= 2 (same thresholds as r4/r5).

Usage: python scripts/bench_skew_marginal.py [n_urls] [reps] [out.json]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

VARIABLE_STAGES = ("analyse_write", "checks_write", "tables_index_write")


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 10_000_000
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    out_path = sys.argv[3] if len(sys.argv) > 3 else "BENCH/skew_marginal.json"
    b1, b2 = n // 10, n // 5  # both fill in round 1 for BOTH corpora

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
    spark = get_spark(cores=cpus, shuffle_partitions=cpus * 2, app="skew_marginal", extra=extra)

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

    def one_round(name: str, batch: int) -> dict:
        pages, frontier = corpora[name]
        cfg = DEFAULT.with_(batch_size=batch, backoff_nb_req=10**9)
        store = StateStore(tempfile.mkdtemp(prefix=f"skewm_{name}_{batch}_"))
        init_state(store, frontier)
        spark.sparkContext.setJobDescription(f"skew_marginal:{name}:{batch}")
        t0 = time.time()
        res = run_crawl(spark, store, pages, cfg, rounds=1)
        wall = time.time() - t0
        spark.sparkContext.setJobDescription(None)
        r = res[0]
        out = {
            "wall_s": round(wall, 2),
            "n_checked": r["n_checked"],
            "var_s": round(sum(r["timings"].get(k, 0.0) for k in VARIABLE_STAGES), 3),
            "stage_timings": r["timings"],
        }
        shutil.rmtree(store.root, ignore_errors=True)
        return out

    one_round("uniform", b1)  # warm-up (JIT + python worker pool), untimed

    cells = [(name, b) for name in ("uniform", "hot50") for b in (b1, b2)]
    runs: dict[str, list] = {f"{name}@{b}": [] for name, b in cells}
    for rep in range(reps):
        for name, b in cells:
            out = one_round(name, b)
            runs[f"{name}@{b}"].append(out)
            print(f"rep{rep} {name}@{b}: wall={out['wall_s']} var={out['var_s']}s "
                  f"n={out['n_checked']}", flush=True)

    # claim-stage wall per corpus, isolated (the difference quotient
    # deliberately cancels batch-independent costs, and the claim is
    # one of them — but the hot bucket's claim window ranks the hot
    # host's whole frontier share in ONE partition, the engine's real
    # bounded-straggler exposure, so it is timed and REPORTED here
    # rather than hidden inside the canceled fixed cost)
    claim_walls = {}
    for name in ("uniform", "hot50"):
        _, frontier = corpora[name]
        cfg_c = DEFAULT.with_(batch_size=b2, backoff_nb_req=10**9)
        samples = []
        for _ in range(3):
            t0 = time.time()
            select_batch(frontier, None, cfg_c, 1, "2025-01-15 00:00:00").write.format(
                "noop"
            ).mode("overwrite").save()
            samples.append(round(time.time() - t0, 3))
        claim_walls[name] = {"min": min(samples), "samples": samples}

    best = {k: min(r["var_s"] for r in v) for k, v in runs.items()}
    fills = {k: [r["n_checked"] for r in v] for k, v in runs.items()}
    marginal = {
        name: (best[f"{name}@{b2}"] - best[f"{name}@{b1}"]) / (b2 - b1) * 1e6
        for name in ("uniform", "hot50")
    }
    # a non-positive marginal means fixed-cost noise swamped the batch
    # delta at this n — the measurement is meaningless, so the gate must
    # FAIL (not crash, and not spuriously pass on a negative ratio)
    measurable = marginal["uniform"] > 0 and marginal["hot50"] > 0
    ratio = round(marginal["hot50"] / marginal["uniform"], 3) if measurable else None

    # claim spread of a hot batch at b2 (the serialization probe the
    # gate has always carried)
    pages, frontier = corpora["hot50"]
    cfg = DEFAULT.with_(batch_size=b2, backoff_nb_req=10**9)
    store = StateStore(tempfile.mkdtemp(prefix="skewm_probe_"))
    init_state(store, frontier)
    run_crawl(spark, store, pages, cfg, rounds=1)
    lc = latest_checks(store.checks.read(spark))
    b = select_batch(store.frontier.read(spark), lc, cfg, 2, "2025-01-15 00:02:00")
    spread = (
        b.groupBy("domain").count()
        .agg(F.count("*").alias("n_domains"), F.max("count").alias("max_domain"),
             F.sum("count").alias("n_claimed")).first()
    )
    bucket = (
        b.groupBy("host_bucket").count()
        .agg(F.max("count").alias("max_bucket"), F.avg("count").alias("avg_bucket")).first()
    )
    shutil.rmtree(store.root, ignore_errors=True)
    balance = round(bucket["max_bucket"] / max(bucket["avg_bucket"], 1), 3)

    summary = {
        "protocol": "interleaved same-session round-1 difference quotient, "
                    f"min-of-{reps} per cell, batches {b1}/{b2}",
        "n_urls": n,
        "runs": runs,
        "best_var_s": best,
        "n_checked_per_cell": fills,
        "marginal_us_per_url": {k: round(v, 3) for k, v in marginal.items()},
        "marginal_ratio_hot_over_uniform": ratio,
        "claim_wall_s": claim_walls,
        "claim_spread": {
            "n_claimed": spread["n_claimed"],
            "n_domains": spread["n_domains"],
            "max_one_domain": spread["max_domain"],
            "max_domain_share": round(spread["max_domain"] / max(spread["n_claimed"], 1), 4),
            "max_bucket": bucket["max_bucket"],
            "bucket_balance": balance,
        },
        "criteria": {"marginal_ratio_max": 1.2, "bucket_balance_max": 2.0},
        "pass": bool(measurable and ratio <= 1.2 and balance <= 2.0),
    }
    os.makedirs(os.path.dirname(out_path) or ".", exist_ok=True)
    with open(out_path, "w") as f:
        json.dump(summary, f, indent=1)
    print(json.dumps({k: summary[k] for k in
                      ("marginal_us_per_url", "marginal_ratio_hot_over_uniform",
                       "claim_spread", "pass")}))
    spark.stop()


if __name__ == "__main__":
    main()

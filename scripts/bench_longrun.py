"""Long-horizon crawl evidence (VERDICT r3 task #2): the reference runs
an *infinite* loop (udata_hydra/crawl/__init__.py:14-41); every bench so
far ran rounds=2. This harness runs 10+ rounds at a fixed per-round
batch over a large corpus and records, per round:

- wall seconds + URLs/s (steady-state check: late rounds ≈ early rounds)
- per-stage timings (run_round's _mark points)
- store footprint: bytes on disk, frontier delta-log batch count, checks
  batch count — compaction (cfg.compact_every_rounds) must keep the
  delta log bounded and pay for itself in read cost

plus a MID-RUN KILL: the crawl runs in a worker subprocess that is
SIGKILLed while a round is in flight; the harness then RESUMES the same
store in a fresh process and asserts the round numbering continues,
orphan batches were pruned, and checks contain no duplicates.

Usage: python scripts/bench_longrun.py [n_urls] [rounds] [out.json]
Env:   HYDRA_LONGRUN_BATCH (default n_urls // (rounds+2))
       HYDRA_LONGRUN_KILL_AFTER (default rounds // 2)
       HYDRA_LONGRUN_CPUS (default 32)
"""

from __future__ import annotations

import json
import os
import signal
import subprocess
import sys
import time

WORKER = r'''
import json, os, sys, time
sys.path.insert(0, "/root/repo")
from hydra_spark.session import get_spark
from hydra_spark.config import DEFAULT
from hydra_spark.crawl.loop import init_state, run_crawl
from hydra_spark.datagen import generate_frontier, generate_pages
from hydra_spark.storage import StateStore
from pyspark.sql import functions as F

store_dir, n, batch, rounds, cpus = (
    sys.argv[1], int(sys.argv[2]), int(sys.argv[3]), int(sys.argv[4]), int(sys.argv[5]))
extra = {"spark.sql.adaptive.advisoryPartitionSizeInBytes": "8m",
         "spark.driver.memory": os.environ.get("HYDRA_SPARK_DRIVER_MEM", "32g"),
         "spark.driver.extraJavaOptions":
             "-Djava.net.preferIPv4Stack=true -XX:+UseParallelGC"}
if os.path.isdir("/dev/shm"):
    os.makedirs("/dev/shm/spark-local", exist_ok=True)
    extra["spark.local.dir"] = "/dev/shm/spark-local"
spark = get_spark(cores=cpus, shuffle_partitions=cpus * 2, app="longrun", extra=extra)
pages = (generate_pages(spark, n, n_hosts=max(n // 500, 200))
         .repartition(cpus * 2, F.col("url")).persist())
pages.count()
store = StateStore(store_dir)
if not store.frontier.exists():
    init_state(store, generate_frontier(spark, pages))
cfg = DEFAULT.with_(batch_size=batch, backoff_nb_req=10**9)

def du(path):
    total = 0
    for root, _, files in os.walk(path):
        for f in files:
            try: total += os.path.getsize(os.path.join(root, f))
            except OSError: pass
    return total

first = store.last_round() + 1
for r in range(first, rounds + 1):
    res = run_crawl(spark, store, pages, cfg, rounds=1)[0]
    res["store_bytes"] = du(store_dir)
    res["frontier_delta_batches"] = len(store.frontier.deltas.manifest()["batches"])
    res["checks_batches"] = len(store.checks.manifest()["batches"])
    res["frontier_base_snapshots"] = len(store.frontier.base.manifest()["snapshots"])
    print("ROUND " + json.dumps(res), flush=True)
print("DONE", flush=True)
spark.stop()
'''


def run_worker(store_dir: str, n: int, batch: int, rounds: int, cpus: int,
               kill_after: int | None) -> tuple[list[dict], bool]:
    """Run the worker; optionally SIGKILL it right after `kill_after`
    committed rounds (i.e. mid-flight in the next round)."""
    cmd = [sys.executable, "-c", WORKER, store_dir, str(n), str(batch),
           str(rounds), str(cpus)]
    proc = subprocess.Popen(cmd, stdout=subprocess.PIPE, text=True)
    rounds_out, killed, seen = [], False, 0
    for line in proc.stdout:
        if line.startswith("ROUND "):
            rounds_out.append(json.loads(line[len("ROUND "):]))
            seen += 1
            if kill_after is not None and seen >= kill_after:
                # the next round is now in flight: give it a beat to
                # start appending batches, then kill mid-round
                time.sleep(2.0)
                proc.send_signal(signal.SIGKILL)
                killed = True
                break
        elif line.startswith("DONE"):
            break
    proc.stdout.close()
    proc.wait()
    return rounds_out, killed


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 10_000_000
    rounds = int(sys.argv[2]) if len(sys.argv) > 2 else 12
    out_path = sys.argv[3] if len(sys.argv) > 3 else "BENCH/longrun_r04.json"
    cpus = int(os.environ.get("HYDRA_LONGRUN_CPUS", "32"))
    batch = int(os.environ.get("HYDRA_LONGRUN_BATCH", str(n // (rounds + 2))))
    kill_after = int(os.environ.get("HYDRA_LONGRUN_KILL_AFTER", str(rounds // 2)))
    import tempfile

    store_dir = tempfile.mkdtemp(prefix="hydra_longrun_")

    t0 = time.time()
    part1, killed = run_worker(store_dir, n, batch, rounds, cpus, kill_after)
    # resume in a FRESH process on the killed store: prune_uncommitted
    # drops the in-flight round's orphans, numbering continues
    part2, _ = run_worker(store_dir, n, batch, rounds, cpus, None)
    wall = time.time() - t0
    all_rounds = part1 + part2

    sys.path.insert(0, "/root/repo")
    from hydra_spark.session import get_spark
    from hydra_spark.storage import StateStore

    spark = get_spark(cores=8, app="longrun_check")
    store = StateStore(store_dir)
    checks = store.checks.read(spark)
    n_checks = checks.count()
    n_dup = n_checks - checks.select("id").distinct().count()
    spark.stop()

    rids = [r["round"] for r in all_rounds]
    tps = [r["urls_per_s"] for r in all_rounds]
    # steady state on PER-URL cost, not raw URLs/s: late rounds claim
    # fewer URLs (bucket quotas meet a thinning never-checked tier), so
    # the same fixed per-round cost over a smaller batch reads as a
    # throughput drop that isn't one. Exclude the first round of each
    # process (JIT + python worker pool warm-up).
    warm = ({all_rounds[0]["round"]} | ({part2[0]["round"]} if part2 else set()))
    per_url_us = {r["round"]: r["wall_s"] / max(r["n_checked"], 1) * 1e6
                  for r in all_rounds}
    steady = [per_url_us[i] for i in rids if i not in warm]
    early = tps[1] if len(tps) > 1 else tps[0]
    late = tps[-2] if len(tps) > 2 else tps[-1]
    compaction_rounds = [r["round"] for r in all_rounds
                         if r["frontier_base_snapshots"] >
                         all_rounds[max(r["round"] - 2, 0)]["frontier_base_snapshots"]]
    summary = {
        "n_urls": n, "batch_size": batch, "rounds_requested": rounds,
        "rounds_completed": rids, "killed_mid_run_after_round": kill_after if killed else None,
        "resumed_from_round": part2[0]["round"] if part2 else None,
        "total_wall_s": round(wall, 1),
        "n_checks_rows": n_checks, "duplicate_check_ids": n_dup,
        "urls_per_s_by_round": tps,
        "n_checked_by_round": [r["n_checked"] for r in all_rounds],
        "wall_s_by_round": [r["wall_s"] for r in all_rounds],
        "us_per_url_by_round": {k: round(v, 2) for k, v in per_url_us.items()},
        "steady_state": {
            "early_round_tput": early, "late_round_tput": late,
            "late_over_early": round(late / early, 3) if early else None,
            "us_per_url_first_half": round(
                sum(steady[: len(steady) // 2]) / max(len(steady) // 2, 1), 2),
            "us_per_url_second_half": round(
                sum(steady[len(steady) // 2:])
                / max(len(steady) - len(steady) // 2, 1), 2),
            "warmup_rounds_excluded": sorted(warm),
        },
        "store_bytes_by_round": [r["store_bytes"] for r in all_rounds],
        "frontier_delta_batches_by_round": [r["frontier_delta_batches"] for r in all_rounds],
        "compaction_visible_at_rounds": compaction_rounds,
        "stage_timings_by_round": [r["timings"] for r in all_rounds],
        "protocol": "worker SIGKILLed mid-round after round "
                    f"{kill_after}; fresh process resumed the same store",
    }
    os.makedirs(os.path.dirname(out_path), exist_ok=True)
    with open(out_path, "w") as f:
        json.dump(summary, f, indent=1)
    print(json.dumps(summary))
    import shutil

    shutil.rmtree(store_dir, ignore_errors=True)


if __name__ == "__main__":
    main()

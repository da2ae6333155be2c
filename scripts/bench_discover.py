"""Frontier-growth benchmark: a breadth-first crawl over a linked-page
corpus, discovery ON — the Common-Crawl-shaped scenario the north rule
describes (frontier grows from fetched pages, rounds claim what the
previous round discovered).

Protocol:
- deterministic expander-ish web graph (datagen.generate_linked_pages,
  out-degree 3), N pages across N/500 hosts;
- frontier seeded with every 100th page (1 %);
- rounds with cfg.discover_links=True until the frontier stops growing
  (or --max-rounds); per-round n_checked / n_discovered / wall;
- a control run (discovery OFF, same seed set, same rounds) isolates
  the extraction+anti-join overhead on the shared rounds.

Writes ONE JSON line to stdout; redirect into BENCH/.

Env: HYDRA_DISC_N (default 200_000), HYDRA_DISC_ROUNDS (default 8),
     SPARK_GRAFT_CPUS (default 32).
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from hydra_spark.config import DEFAULT  # noqa: E402
from hydra_spark.crawl.loop import init_state, run_crawl  # noqa: E402
from hydra_spark.datagen import generate_frontier, generate_linked_pages  # noqa: E402
from hydra_spark.session import get_spark  # noqa: E402
from hydra_spark.storage import StateStore  # noqa: E402


def main() -> None:
    n = int(os.environ.get("HYDRA_DISC_N", "200000"))
    max_rounds = int(os.environ.get("HYDRA_DISC_ROUNDS", "8"))
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark(cores=cpus, shuffle_partitions=max(cpus * 2, 8), app="hydra_disc")

    from pyspark.sql import functions as F

    pages = generate_linked_pages(spark, n, n_hosts=max(n // 500, 20))
    pages = pages.repartition(max(cpus * 2, 8), F.col("url")).persist()
    pages.count()
    seed_pages = pages.where(
        F.regexp_extract("url", r"/page/(\d+)$", 1).cast("long") % 100 == 0
    )
    seed = generate_frontier(spark, seed_pages)

    def run(discover: bool, rounds: int):
        store = StateStore(tempfile.mkdtemp(prefix="hydra_disc_bench_"))
        init_state(store, seed)
        cfg = DEFAULT.with_(
            batch_size=n, backoff_nb_req=10**9, discover_links=discover,
            compact_every_rounds=4,
        )
        out = []
        t0 = time.time()
        for _ in range(rounds):
            r = run_crawl(spark, store, pages, cfg, rounds=1)[0]
            out.append(
                {
                    "round": r["round"],
                    "n_checked": r["n_checked"],
                    "n_discovered": r.get("n_discovered", 0),
                    "wall_s": r["wall_s"],
                }
            )
            if discover and r.get("n_discovered", 0) == 0 and r["n_checked"] == 0:
                break
        frontier_size = store.frontier.read(spark).count()
        return out, frontier_size, round(time.time() - t0, 3)

    disc_rounds, frontier_size, disc_wall = run(True, max_rounds)
    # control: discovery off, limited to the same number of rounds
    ctrl_rounds, _, ctrl_wall = run(False, len(disc_rounds))

    total_checked = sum(r["n_checked"] for r in disc_rounds)
    total_discovered = sum(r["n_discovered"] for r in disc_rounds)
    # overhead on round 1 (both configs do identical fetch work there:
    # the same seed batch; later control rounds have nothing to claim)
    r1_overhead = (
        round(disc_rounds[0]["wall_s"] / ctrl_rounds[0]["wall_s"], 3)
        if ctrl_rounds and ctrl_rounds[0]["wall_s"]
        else None
    )
    print(
        json.dumps(
            {
                "metric": "frontier_growth_crawl",
                "n_pages": n,
                "seed_frac": 0.01,
                "rounds": disc_rounds,
                "frontier_size_final": frontier_size,
                "coverage": round(frontier_size / n, 4),
                "total_checked": total_checked,
                "total_discovered": total_discovered,
                "urls_per_s": round(total_checked / disc_wall, 2) if disc_wall else None,
                "round1_wall_ratio_vs_no_discovery": r1_overhead,
                "control_rounds": ctrl_rounds,
            }
        )
    )


if __name__ == "__main__":
    main()

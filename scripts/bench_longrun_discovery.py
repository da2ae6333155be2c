"""Long-horizon GROWTH crawl (VERDICT r4 task #4): 10+ rounds where the
frontier expands from link discovery — the Common-Crawl-shaped regime —
with the trap miner feeding the exclusion path and the webhook outbox
on, all at once. Complements BENCH/longrun_r04.json (fixed frontier,
kill/resume) and BENCH/discover_r04.json (2-round growth).

Corpus: `generate_linked_pages` expander graph (every page reachable
from the 1 % seed in a few rounds) PLUS a SELF-EXPANDING crawler trap:
a calendar-style URL space on one trap host where every page links to
two further trap pages (`/cal/i → /cal/i+1, /cal/i+7`), entered from
every 10th corpus page. Left alone, the trap feeds the frontier new
URLs every round — the classic unbounded space. From round
`trap_mine_after` on, each round first mines `url_templates` over the
frontier and extends `cfg.excluded_patterns` with
`trap_exclusion_patterns` (the F1 route). The discriminator is the one
the module is built on: per-template fan-out — corpus templates
(`hostK.example.com/page/{N}`) sit near pages-per-host (~500), the trap
template crosses `min_urls=5000` within a couple of rounds.

Per round: n_checked / n_discovered / wall + stage timings + frontier
size + delta-log batches + cumulative outbox rows + cumulative trap
claims. Summary asserts the steady-state properties the 10^10 design
needs: trap claims FREEZE after mining (bounded frontier growth),
claim/plan cost stays flat with the exclusion list active, zero
duplicate check ids, full reachable-corpus coverage.

Usage: python scripts/bench_longrun_discovery.py [n_pages] [rounds] [out.json]
Env:   HYDRA_LRD_CPUS (default 32), HYDRA_LRD_TRAP_MINE_AFTER (default 4),
       HYDRA_LRD_MIN_URLS (default 5000)
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def build_corpus(spark, n: int, cpus: int):
    """linked corpus + trap entries + fetchable self-expanding trap space."""
    from pyspark.sql import functions as F

    from hydra_spark.datagen import generate_linked_pages

    pages = generate_linked_pages(spark, n, n_hosts=max(n // 500, 20))
    pid = F.regexp_extract("url", r"/page/(\d+)$", 1).try_cast("long")
    trap_n = n  # trap space as large as the corpus
    entry = F.concat(
        F.lit('<a href="https://trap.example.com/cal/'),
        ((pid * 3) % trap_n).cast("string"), F.lit('">cal</a>'),
    )
    html_str = F.col("html").cast("string")
    pages = pages.withColumn(
        "html",
        F.when(pid % 10 == 0, F.encode(F.concat(html_str, entry), "UTF-8"))
        .otherwise(F.col("html")),
    )

    ti = F.col("id")
    turl = F.concat(F.lit("https://trap.example.com/cal/"), ti.cast("string"))
    tlink = lambda step: F.concat(  # noqa: E731
        F.lit('<a href="/cal/'), ((ti + step) % trap_n).cast("string"), F.lit('">n</a>')
    )
    thtml = F.concat(
        F.lit("<html><body><p>day "), (ti % 365).cast("string"), F.lit("</p>"),
        tlink(1), tlink(7), F.lit("</body></html>"),
    )
    trap_pages = spark.range(trap_n).select(
        turl.alias("url"),
        F.to_timestamp(F.lit("2025-01-01 00:00:00")).alias("warc_ts"),
        F.encode(thtml, "UTF-8").alias("html"),
        F.lit("day").alias("text"),
        F.lit("en").alias("lang"),
    )
    corpus = pages.unionByName(trap_pages)
    return corpus.repartition(cpus * 2, F.col("url")).persist(), pid


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    rounds = int(sys.argv[2]) if len(sys.argv) > 2 else 12
    out_path = sys.argv[3] if len(sys.argv) > 3 else "BENCH/longrun_discovery.json"
    cpus = int(os.environ.get("HYDRA_LRD_CPUS", "32"))
    mine_after = int(os.environ.get("HYDRA_LRD_TRAP_MINE_AFTER", "4"))
    min_urls = int(os.environ.get("HYDRA_LRD_MIN_URLS", "5000"))

    from pyspark.sql import functions as F

    from hydra_spark.config import DEFAULT
    from hydra_spark.crawl.loop import init_state, run_crawl
    from hydra_spark.crawl.traps import trap_exclusion_patterns, url_templates
    from hydra_spark.datagen import generate_frontier
    from hydra_spark.session import get_spark
    from hydra_spark.storage import StateStore

    extra = {"spark.sql.adaptive.advisoryPartitionSizeInBytes": "8m",
             "spark.driver.memory": os.environ.get("HYDRA_SPARK_DRIVER_MEM", "32g"),
             "spark.driver.extraJavaOptions":
                 "-Djava.net.preferIPv4Stack=true -XX:+UseParallelGC"}
    if os.path.isdir("/dev/shm"):
        os.makedirs("/dev/shm/spark-local", exist_ok=True)
        extra["spark.local.dir"] = "/dev/shm/spark-local"
    spark = get_spark(cores=cpus, shuffle_partitions=cpus * 2, app="hydra_lrd",
                      extra=extra)

    corpus, pid = build_corpus(spark, n, cpus)
    n_corpus = corpus.count()
    seed_pages = corpus.where(pid % 100 == 0)  # 1 % of the legit pages
    store = StateStore(tempfile.mkdtemp(prefix="hydra_lrd_"))
    init_state(store, generate_frontier(spark, seed_pages))

    base_cfg = DEFAULT.with_(
        batch_size=n_corpus, backoff_nb_req=10**9, discover_links=True,
        compact_every_rounds=5,
    )
    cfg = base_cfg
    out_rounds = []
    t0 = time.time()
    n_trap_patterns = 0
    for i in range(rounds):
        if i + 1 > mine_after:
            tpl = url_templates(store.frontier.read(spark), min_urls=min_urls)
            pats = trap_exclusion_patterns(tpl, max_patterns=100)
            n_trap_patterns = len(pats)
            cfg = base_cfg.with_(
                excluded_patterns=tuple(base_cfg.excluded_patterns) + tuple(pats)
            )
        r = run_crawl(spark, store, corpus, cfg, rounds=1)[0]
        row = {
            "round": r["round"],
            "n_checked": r["n_checked"],
            "n_discovered": r.get("n_discovered", 0),
            "wall_s": r["wall_s"],
            "urls_per_s": r["urls_per_s"],
            "timings": r["timings"],
            "frontier_rows": store.frontier.read(spark).count(),
            "frontier_delta_batches": len(store.frontier.deltas.manifest()["batches"]),
            "outbox_rows": store.outbox.read(spark).count() if store.outbox.exists() else 0,
            "trap_patterns_active": n_trap_patterns,
            "trap_rows_checked": store.checks.read(spark)
                .where("url like 'https://trap.example.com/%'").count(),
        }
        out_rounds.append(row)
        print("ROUND " + json.dumps(row), flush=True)

    checks = store.checks.read(spark)
    n_checks = checks.count()
    n_dup = n_checks - checks.select("id").distinct().count()
    legit_checked = (
        checks.where("status is not null and url not like 'https://trap.example.com/%'")
        .select("url").distinct().count()
    )
    # trap claims after the first post-mining round must freeze
    post_mine = [r for r in out_rounds if r["round"] > mine_after + 1]
    trap_after_mining = (
        out_rounds[-1]["trap_rows_checked"] - post_mine[0]["trap_rows_checked"]
        if post_mine else None
    )
    early = out_rounds[2:5]
    late = out_rounds[-3:]
    avg = lambda rows, k: round(  # noqa: E731
        sum(r["timings"].get(k, 0) for r in rows) / max(len(rows), 1), 3)

    summary = {
        "n_corpus": n_corpus,
        "rounds": out_rounds,
        "final_frontier_rows": out_rounds[-1]["frontier_rows"],
        "legit_urls_checked": legit_checked,
        "checks_rows": n_checks,
        "duplicate_check_ids": n_dup,
        "trap_rows_checked_total": out_rounds[-1]["trap_rows_checked"],
        "trap_claims_after_mining_settled": trap_after_mining,
        "trap_patterns_final": n_trap_patterns,
        "outbox_rows_final": out_rounds[-1]["outbox_rows"],
        "claim_plan_s_early_avg": avg(early, "plan"),
        "claim_plan_s_late_avg": avg(late, "plan"),
        "wall_s_total": round(time.time() - t0, 3),
    }
    os.makedirs(os.path.dirname(out_path) or ".", exist_ok=True)
    with open(out_path, "w") as f:
        json.dump(summary, f, indent=1)
    print(json.dumps({k: v for k, v in summary.items() if k != "rounds"}))
    spark.stop()


if __name__ == "__main__":
    main()

"""Cluster entry point for the crawl engine — submit with:

    python scripts/package.py          # builds dist/hydra_spark.zip
    spark-submit --py-files dist/hydra_spark.zip jobs/crawl_job.py \
        --pages 5000 --rounds 2 --store /tmp/crawl_store

This is the deployment surface the reference runs as `udata-hydra-crawl`
(reference cli.py entry points): the package ships to every executor via
--py-files, the master/executor topology comes from spark-submit (here
local[*]; on a real cluster `--master yarn|k8s --num-executors N`), and
all state lives in the StateStore directory (Iceberg tables in
production — StateStore is the seam, see README).

The script deliberately imports hydra_spark ONLY from the shipped zip:
tests run it from a scratch cwd with a bare PYTHONPATH to prove the
package is self-contained.

Emits one JSON line per round plus a final `summary` line on stdout.
"""

from __future__ import annotations

import argparse
import json
import sys

from pyspark.sql import SparkSession


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(description="hydra_spark crawl job")
    p.add_argument("--pages", type=int, default=5000, help="synthetic corpus size")
    p.add_argument("--hosts", type=int, default=40, help="distinct hosts in the corpus")
    p.add_argument("--rounds", type=int, default=2)
    p.add_argument("--batch-size", type=int, default=1000)
    p.add_argument("--store", required=True, help="StateStore directory (resume-able)")
    p.add_argument("--pages-parquet", default=None,
                   help="read the pages corpus from parquet instead of synthesizing")
    p.add_argument("--discover-links", action="store_true",
                   help="grow the frontier from hrefs in fetched pages")
    p.add_argument("--linked-corpus", action="store_true",
                   help="synthesize the linked-page graph corpus instead of the mixed one")
    p.add_argument("--seed-every", type=int, default=None,
                   help="seed only every Nth page into the frontier (discovery demos)")
    p.add_argument("--mine-traps-every", type=int, default=0,
                   help="re-mine crawler-trap URL templates every N rounds (0 = off)")
    p.add_argument("--trap-min-urls", type=int, default=5000,
                   help="template fan-out threshold; keep above legit pages-per-host")
    args = p.parse_args(argv)

    # spark-submit owns master/deploy-mode; only job-level SQL conf here.
    spark = (
        SparkSession.builder.appName("hydra_spark_crawl")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from hydra_spark.config import DEFAULT
    from hydra_spark.crawl import run_crawl
    from hydra_spark.crawl.loop import init_state
    from hydra_spark.datagen import generate_frontier, generate_pages
    from hydra_spark.storage import StateStore

    if args.pages_parquet:
        pages = spark.read.parquet(args.pages_parquet)
    elif args.linked_corpus:
        from hydra_spark.datagen import generate_linked_pages

        pages = generate_linked_pages(spark, args.pages, n_hosts=args.hosts)
    else:
        pages = generate_pages(spark, args.pages, n_hosts=args.hosts)
    pages = pages.cache()

    store = StateStore(args.store)
    if store.last_round() == 0:
        seed_pages = pages
        if args.seed_every:
            from pyspark.sql import functions as F

            seed_pages = pages.where(
                F.regexp_extract("url", r"/(?:page|doc)/(\d+)$", 1).cast("long")
                % args.seed_every == 0
            )
        init_state(store, generate_frontier(spark, seed_pages))

    cfg = DEFAULT.with_(
        batch_size=args.batch_size, discover_links=args.discover_links,
        mine_traps_every=args.mine_traps_every, trap_min_urls=args.trap_min_urls,
    )
    results = run_crawl(spark, store, pages, cfg, rounds=args.rounds)
    for r in results:
        print(json.dumps({k: v for k, v in r.items() if not isinstance(v, dict)}))
    checked = sum(r["n_checked"] for r in results)
    print(json.dumps({
        "summary": True,
        "rounds_run": len(results),
        "n_checked_total": checked,
        "last_round": store.last_round(),
        "checks_rows": store.checks.read(spark).count(),
    }))
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())

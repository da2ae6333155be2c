"""`udata-hydra csv-sample` analog — submit with:

    spark-submit --py-files dist/hydra_spark.zip jobs/csv_sample.py \
        --store /path/to/store [--size 1000] [--max-size 100000000] \
        [--download --pages-parquet pages.parquet] [--out-dir ./data]

Reference cli/db.py:15-101: sample `size` CSV resources from the latest
checks — half from "remote" domains, half from the platform's own
static domain — list them in `data/_index.csv`, and optionally download
each file and record its sniffed mime + real size. Differences forced
by the engine: ORDER BY RANDOM() becomes a deterministic md5(resource_id)
order (reproducible across runs and engines), and --download reads
bodies from the pages corpus parquet instead of HTTP.

Emits one `summary` JSON line on stdout.
"""

from __future__ import annotations

import argparse
import csv
import json
import os
import sys

from pyspark.sql import SparkSession


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(description="hydra_spark csv sample")
    p.add_argument("--store", required=True, help="StateStore dir with checks")
    p.add_argument("--size", type=int, default=1000, help="sample size (files)")
    p.add_argument("--max-size", type=int, default=100_000_000,
                   help="max content-length per file (bytes)")
    p.add_argument("--download", action="store_true",
                   help="write file bodies (needs --pages-parquet)")
    p.add_argument("--pages-parquet", default=None,
                   help="pages corpus parquet (body source for --download)")
    p.add_argument("--out-dir", default="./data")
    p.add_argument("--own-domain", default="static.data.example.org",
                   help="the platform's own domain (reference: static.data.gouv.fr)")
    args = p.parse_args(argv)
    if args.download and not args.pages_parquet:
        p.error("--download requires --pages-parquet")

    spark = (
        SparkSession.builder.appName("hydra_spark_csv_sample")
        .config("spark.sql.session.timeZone", "UTC")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from pyspark.sql import functions as F

    from hydra_spark.crawl.round import latest_checks
    from hydra_spark.storage import StateStore

    store = StateStore(args.store)
    lc = latest_checks(store.checks.read(spark))
    frontier = store.frontier.read(spark).select(
        F.col("resource_id").alias("_frid"), "dataset_id"
    )
    base = (
        lc.join(frontier, lc.resource_id == frontier._frid, "left")
        .withColumn("content_type",
                    F.coalesce(F.col("headers")["content-type"], F.col("mime_type")))
        .withColumn("content_length",
                    F.coalesce(F.col("headers")["content-length"].cast("long"),
                               F.col("filesize")))
        .where(
            F.col("content_type").like("%csv%")
            & F.col("status").between(200, 399)
            & (F.coalesce(F.col("content_length"), F.lit(0)) <= args.max_size)
        )
        .select("resource_id", "dataset_id", "url", "domain",
                "content_type", "content_length")
    )
    # deterministic stand-in for ORDER BY RANDOM(): md5 of the key is
    # uniform and engine-portable, so the sample replays bit-for-bit
    half = max(args.size // 2, 1)
    rnd = F.md5(F.col("resource_id"))
    remote = (base.where(F.col("domain") != args.own_domain)
              .orderBy(rnd).limit(half))
    ours = (base.where(F.col("domain") == args.own_domain)
            .orderBy(rnd).limit(half))
    sample = remote.unionByName(ours).collect()  # ≤ size rows by contract

    dl_dir = os.path.join(args.out_dir, "downloaded")
    os.makedirs(dl_dir, exist_ok=True)

    bodies = {}
    if args.download and sample:
        wanted = {r["url"] for r in sample}
        pages = spark.read.parquet(args.pages_parquet).where(
            F.col("url").isin(list(wanted))
        )
        bodies = {r["url"]: bytes(r["html"]) for r in
                  pages.select("url", "html").collect()}

    from hydra_spark.ml.multimodal import parse_image_header

    def sniff(b: bytes) -> str:
        """`file -b --mime-type` stand-in over the same magics the fetch
        path sniffs (crawl/fetch.py:94-130)."""
        if b[:2] == b"\x1f\x8b":
            return "application/gzip"
        if b[:4] == b"PK\x03\x04":
            return "application/zip"
        hdr = parse_image_header(b)
        if hdr:
            return f"image/{hdr['format']}"
        head = b[:200].decode("utf-8", errors="replace")
        if head.lstrip().startswith("<html"):
            return "text/html"
        if "\n" in head and head.split("\n", 1)[0].count(",") >= 2:
            return "text/csv"
        return "text/plain"

    lines = []
    for r in sample:
        filename = os.path.join(dl_dir, f"{r['dataset_id']}_{r['resource_id']}.csv")
        line = {
            "resource_id": r["resource_id"], "dataset_id": r["dataset_id"],
            "url": r["url"], "content_type": r["content_type"],
            "content_length": r["content_length"], "filename": filename,
        }
        if args.download:
            body = bodies.get(r["url"], b"")
            with open(filename, "wb") as f:
                f.write(body)
            line["magic_mime"] = sniff(body)
            line["real_size"] = len(body)
        lines.append(line)

    index_path = os.path.join(args.out_dir, "_index.csv")
    if lines:
        with open(index_path, "w", newline="") as f:
            w = csv.DictWriter(f, fieldnames=list(lines[0].keys()))
            w.writeheader()
            w.writerows(lines)

    print(json.dumps({
        "summary": True,
        "sampled": len(lines),
        "downloaded": len(bodies) if args.download else 0,
        "index": index_path if lines else None,
    }))
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())

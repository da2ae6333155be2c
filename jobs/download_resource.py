"""`udata-hydra download-resource` analog — submit with:

    spark-submit --py-files dist/hydra_spark.zip jobs/download_resource.py \
        --resource-id ID --store /path/to/store \
        --pages-parquet pages.parquet [--output-dir DIR]

Reference cli/crawl.py:40-74: look a resource up in the catalog,
download its url, and move the file to `{output_dir}/{resource_id}{ext}`.
Here the body comes from the pages corpus parquet (the engine's fetch
source) instead of HTTP; the extension is derived from the sniffed
payload magic like the reference derives it from headers.

Emits one `summary` JSON line on stdout; exits 1 when the resource is
not in the frontier (reference logs an error and returns).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile

from pyspark.sql import SparkSession


def _extension(body: bytes, url: str) -> str:
    if body[:2] == b"\x1f\x8b":
        return ".csv.gz"
    if body[:4] == b"PK\x03\x04":
        return ".xlsx"
    if body[:8] == b"\xd0\xcf\x11\xe0\xa1\xb1\x1a\xe1":
        return ".xls"
    tail = url.rsplit("/", 1)[-1]
    if "." in tail:
        return "." + tail.rsplit(".", 1)[-1]
    return ".csv"


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(description="hydra_spark resource download")
    p.add_argument("--resource-id", required=True)
    p.add_argument("--store", required=True, help="StateStore dir (frontier lookup)")
    p.add_argument("--pages-parquet", required=True, help="pages corpus parquet")
    p.add_argument("--output-dir", default=None,
                   help="defaults to a temporary download folder, like the reference")
    args = p.parse_args(argv)

    spark = (
        SparkSession.builder.appName("hydra_spark_download_resource")
        .config("spark.sql.session.timeZone", "UTC")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from pyspark.sql import functions as F

    from hydra_spark.storage import StateStore

    store = StateStore(args.store)
    row = (
        store.frontier.read(spark)
        .where(F.col("resource_id") == args.resource_id)
        .select("resource_id", "url")
        .first()
    )
    if row is None:
        print(json.dumps({"summary": True, "error":
                          f"Resource {args.resource_id} not found in catalog"}))
        spark.stop()
        return 1

    page = (
        spark.read.parquet(args.pages_parquet)
        .where(F.col("url") == row["url"])
        .select("html")
        .first()
    )
    body = bytes(page["html"]) if page is not None and page["html"] is not None else b""

    out_dir = args.output_dir or tempfile.mkdtemp(prefix="hydra_download_")
    os.makedirs(out_dir, exist_ok=True)
    out_path = os.path.join(out_dir, f"{args.resource_id}{_extension(body, row['url'])}")
    with open(out_path, "wb") as f:
        f.write(body)

    print(json.dumps({
        "summary": True,
        "resource_id": args.resource_id,
        "url": row["url"],
        "output": out_path,
        "n_bytes": len(body),
        "found_body": page is not None,
    }))
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())

"""`udata-hydra insert-resource-into-catalog` analog — submit with:

    spark-submit --py-files dist/hydra_spark.zip jobs/insert_resource.py \
        --store /path/to/store --resource-id ID --url URL \
        [--dataset-id D] [--title T] [--type main] [--format csv] \
        [--harvest-modified-at "2025-01-01 00:00:00"]

Reference cli/catalog.py:115-173: insert/update ONE catalog row without
resyncing the whole export (the reference resolves metadata from the
data.gouv API; here it comes from the flags). Emits one JSON summary
line on stdout.
"""

from __future__ import annotations

import argparse
import json
import sys

from pyspark.sql import SparkSession


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(description="hydra_spark single-resource catalog insert")
    p.add_argument("--store", required=True, help="StateStore directory")
    p.add_argument("--resource-id", required=True)
    p.add_argument("--url", required=True)
    p.add_argument("--dataset-id", default=None)
    p.add_argument("--title", default=None)
    p.add_argument("--type", default=None)
    p.add_argument("--format", default=None)
    p.add_argument("--harvest-modified-at", default=None,
                   help="timestamp string, e.g. '2025-01-01 00:00:00'")
    args = p.parse_args(argv)

    spark = (
        SparkSession.builder.appName("hydra_spark_insert_resource")
        .config("spark.sql.session.timeZone", "UTC")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from hydra_spark.catalog import insert_resource
    from hydra_spark.storage import StateStore

    res = insert_resource(
        spark, StateStore(args.store), args.resource_id, args.url,
        dataset_id=args.dataset_id, title=args.title, type=args.type,
        format=args.format, harvest_modified_at=args.harvest_modified_at,
    )
    print(json.dumps({"summary": True, "resource_id": args.resource_id, **res}))
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())

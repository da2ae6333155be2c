"""`udata-hydra insert-url-into-catalog` analog — submit with:

    spark-submit --py-files dist/hydra_spark.zip jobs/insert_url.py \
        --store /path/to/store --url URL --resource-id ID

Reference cli/catalog.py:176-219: register an arbitrary URL for
analysis under the fixed 'temp_external' dataset (type 'main', default
format 'csv'). Emits one JSON summary line on stdout.
"""

from __future__ import annotations

import argparse
import json
import sys

from pyspark.sql import SparkSession


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(description="hydra_spark external-URL catalog insert")
    p.add_argument("--store", required=True, help="StateStore directory")
    p.add_argument("--url", required=True)
    p.add_argument("--resource-id", required=True)
    args = p.parse_args(argv)

    spark = (
        SparkSession.builder.appName("hydra_spark_insert_url")
        .config("spark.sql.session.timeZone", "UTC")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from hydra_spark.catalog import insert_url
    from hydra_spark.storage import StateStore

    res = insert_url(spark, StateStore(args.store), args.url, args.resource_id)
    print(json.dumps({"summary": True, "resource_id": args.resource_id, **res}))
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())

"""`udata-hydra analyse-csv` analog — submit with:

    spark-submit --py-files dist/hydra_spark.zip jobs/analyse_csv.py \
        --input file.csv[.gz|.xlsx|.xls] --store /path/to/store \
        [--resource-id ID]

Reference cli/analysis.py:42-123: run the csv analysis pipeline on one
resource on demand. Here: read the file bytes, run the same fused
inspection + typed-ingest pass the crawl uses (gzip/xlsx/xls
transparently handled), append the parsed rows + tables_index entry to
the store, and print the inspection JSON on stdout.
"""

from __future__ import annotations

import argparse
import json
import sys

from pyspark.sql import SparkSession


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(description="hydra_spark on-demand csv analysis")
    p.add_argument("--input", required=True, help="local csv/csv.gz/xlsx/xls file")
    p.add_argument("--store", default=None, help="StateStore dir (omit to only inspect)")
    p.add_argument("--resource-id", default=None)
    args = p.parse_args(argv)

    spark = (
        SparkSession.builder.appName("hydra_spark_analyse_csv")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from pyspark.sql import Row

    from hydra_spark.analysis.ingest import analyse_csv_batch
    from hydra_spark.storage import StateStore

    data = open(args.input, "rb").read()
    # stable across processes (hash() is PYTHONHASHSEED-salted): reruns
    # on the same file must append under the same resource_id
    import hashlib

    rid = args.resource_id or f"cli-{hashlib.md5(args.input.encode()).hexdigest()[:8]}"
    url = f"file://{args.input}"
    df = spark.createDataFrame(
        [Row(url=url, resource_id=rid, dataset_id="cli", html=bytearray(data))]
    )
    parsed = analyse_csv_batch(df).cache()
    insp_row = parsed.where("inspection IS NOT NULL").select("inspection").first()
    err_row = parsed.where("parsing_error IS NOT NULL").select("parsing_error").first()
    n_rows = parsed.where("row_json IS NOT NULL").count()

    if args.store:
        from hydra_spark.analysis.ingest import tables_index_entries

        store = StateStore(args.store)
        rnd = store.last_round() + 1
        with_kind = parsed.selectExpr("'row' AS kind", "*", "CAST(NULL AS STRING) AS text")
        store.outputs.append(with_kind, round_id=rnd)
        store.tables_index.append(
            tables_index_entries(with_kind, "2025-01-15 00:00:00"), round_id=rnd
        )
        store.commit_round(rnd, meta={"analyse_csv": args.input})

    print(json.dumps({
        "summary": True,
        "resource_id": rid,
        "rows_parsed": n_rows,
        "parsing_error": err_row.parsing_error if err_row else None,
        "inspection": json.loads(insp_row.inspection) if insp_row else None,
    }))
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())

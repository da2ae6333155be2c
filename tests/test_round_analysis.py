"""Analysis wired into the crawl round: parsed tables, tables_index,
work avoidance (reference: analysis/resource.py:41-184 + csv ingest)."""

import json

import pytest

from hydra_spark.analysis.ingest import load_parsed_table
from hydra_spark.config import DEFAULT
from hydra_spark.crawl.loop import init_state, run_crawl
from hydra_spark.datagen import generate_frontier, generate_pages
from hydra_spark.storage import StateStore


@pytest.fixture(scope="module")
def crawled(spark, tmp_path_factory):
    pages = generate_pages(spark, 600, n_hosts=10).cache()
    frontier = generate_frontier(spark, pages)
    store = StateStore(str(tmp_path_factory.mktemp("state")))
    init_state(store, frontier)
    run_crawl(spark, store, pages, DEFAULT.with_(batch_size=200), rounds=1)
    return store, pages


def test_csv_resources_parsed(spark, crawled):
    store, pages = crawled
    checks = store.checks.read(spark)
    parsed_checks = checks.where("parsing_table is not null")
    n = parsed_checks.count()
    assert n > 0
    rows = store.parsed_rows.read(spark)
    # every parsed resource produced its CSV's 20 data rows
    per_table = {r["parsing_table"]: r["cnt"] for r in
                 rows.groupBy("parsing_table").count().withColumnRenamed("count", "cnt").collect()}
    assert all(v == 20 for v in per_table.values())
    assert set(per_table) == {r["parsing_table"] for r in parsed_checks.collect()}


def test_tables_index_inspections(spark, crawled):
    store, _ = crawled
    ti = store.tables_index.read(spark).collect()
    assert ti
    insp = json.loads(ti[0]["csv_detective"])
    assert insp["separator"] == ","
    assert insp["header"] == ["code_insee", "number", "label"]
    assert insp["columns"]["number"]["python_type"] == "int"
    assert insp["total_lines"] == 20


def test_parsed_table_typed_roundtrip(spark, crawled):
    store, pages = crawled
    ti = store.tables_index.read(spark).first()
    insp = json.loads(ti["csv_detective"])
    df = load_parsed_table(spark, store.parsed_rows.read(spark), insp, ti["parsing_table"])
    recs = df.orderBy("__id").collect()
    assert recs[0]["__id"] == 1 and len(recs) == 20
    # byte-identical extracted text invariant: re-serialize and compare
    # against the pages.text column for that url
    page_text = pages.where(pages.url == ti["url"]).first()["text"]
    lines = page_text.splitlines()
    header = lines[0].split(",")
    first = dict(zip(header, lines[1].split(",")))
    assert recs[0]["code_insee"] == int(first["code_insee"])
    assert recs[0]["number"] == int(first["number"])
    assert recs[0]["label"] == first["label"]


def test_html_resources_not_parsed(spark, crawled):
    store, _ = crawled
    checks = store.checks.read(spark)
    html_checks = checks.where("mime_type = 'text/html'")
    assert html_checks.where("parsing_table is not null").count() == 0

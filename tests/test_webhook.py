"""Webhook payload parity (S16): category nulling + conditional
categories per UdataPayload (utils/http.py:24-60)."""

import json

from pyspark.sql import functions as F

from hydra_spark.config import DEFAULT
from hydra_spark.crawl.loop import init_state, run_crawl
from hydra_spark.datagen import generate_frontier, generate_pages
from hydra_spark.storage import StateStore

CHECK_FIELDS = {"check:id", "check:available", "check:status", "check:timeout",
                "check:date", "check:error", "check:headers:content-type",
                "check:headers:content-length"}
ANALYSIS_FIELDS = {"analysis:checksum", "analysis:content-length", "analysis:error",
                   "analysis:check_id", "analysis:last-modified-at",
                   "analysis:last-modified-detection", "analysis:mime-type"}
PARSING_FIELDS = {"analysis:parsing:error", "analysis:parsing:started_at",
                  "analysis:parsing:finished_at", "analysis:parsing:parsing_table",
                  "analysis:parsing:parquet_size", "analysis:parsing:parquet_url",
                  "analysis:parsing:pmtiles_size", "analysis:parsing:pmtiles_url",
                  "analysis:parsing:geojson_size", "analysis:parsing:geojson_url",
                  "analysis:parsing:ogc_metadata"}


def test_webhook_payload_categories(spark, tmp_path):
    pages = generate_pages(spark, 1200, n_hosts=8).cache()
    frontier = generate_frontier(spark, pages)
    store = StateStore(str(tmp_path))
    init_state(store, frontier)
    run_crawl(spark, store, pages, DEFAULT.with_(batch_size=100_000, backoff_nb_req=100_000), rounds=1)

    checks = {r["resource_id"]: r for r in store.checks.read(spark).collect()}
    outbox = {r["resource_id"]: json.loads(r["payload"])
              for r in store.outbox.read(spark).collect()}
    assert outbox

    seen_parsed = seen_unparsed = seen_error = False
    for rid, p in outbox.items():
        c = checks[rid]
        keys = set(p.keys())
        # check:* is always fully present (explicit nulls included)
        assert CHECK_FIELDS <= keys, rid
        if c["status"] == 200:
            # fetched → analysed: full analysis category with nulls
            assert ANALYSIS_FIELDS <= keys, rid
            assert p["analysis:checksum"] == c["checksum"]
            assert p["analysis:mime-type"] == c["mime_type"]
            assert p["check:available"] is True
            if c["parsing_table"] is not None:
                assert PARSING_FIELDS <= keys, rid
                assert p["analysis:parsing:parsing_table"] == c["parsing_table"]
                assert p["analysis:parsing:error"] is None  # explicit null
                assert p["analysis:parsing:pmtiles_url"] is None
                seen_parsed = True
            elif c["parsing_error"] is None:
                assert not (PARSING_FIELDS & keys), rid  # category absent
                seen_unparsed = True
        if c["status"] is None:
            # connection error / timeout: nothing was analysed
            assert not (ANALYSIS_FIELDS & keys), rid
            assert p["check:available"] is False  # False, never null (429 aside)
            assert p["check:error"] == c["error"]
            seen_error = True
    assert seen_parsed and seen_unparsed and seen_error

"""Structured Streaming politeness monitor over the checks log."""

from hydra_spark.config import DEFAULT
from hydra_spark.crawl.loop import init_state, run_crawl
from hydra_spark.datagen import generate_frontier, generate_pages
from hydra_spark.storage import StateStore
from hydra_spark.streaming import politeness_monitor


def test_politeness_monitor_emits_closed_windows(spark, tmp_path):
    pages = generate_pages(spark, 3000, n_hosts=6).cache()
    frontier = generate_frontier(spark, pages)
    store = StateStore(str(tmp_path / "state"))
    init_state(store, frontier)
    # 10 rounds × 60s of simulated event time so early sliding windows
    # close under the watermark (append mode only emits closed windows)
    run_crawl(spark, store, pages, DEFAULT.with_(batch_size=250), rounds=10)

    out = str(tmp_path / "rates")
    cfg = DEFAULT.with_(backoff_nb_req=30)  # low budget → alerts
    politeness_monitor(spark, store, out, cfg, slide="60 seconds", watermark="0 seconds")

    rows = spark.read.parquet(out).collect()
    assert rows, "monitor produced no windows"
    # a check from round 1 (event time 00:00) appears in 6 sliding
    # windows (360s window / 60s slide), all closed by round 10
    first_round_checks = (
        store.checks.read(spark)
        .where("domain is not null and created_at = timestamp'2025-01-15 00:00:00'")
        .count()
    )
    early = [r for r in rows if r["window_end"].strftime("%H:%M") <= "00:06"]
    assert sum(r["nb_req"] for r in early) >= first_round_checks
    assert any(r["over_budget"] for r in rows)


def test_monitor_is_incremental(spark, tmp_path):
    """availableNow drains only NEW batches on re-run (checkpointed)."""
    pages = generate_pages(spark, 1500, n_hosts=4).cache()
    frontier = generate_frontier(spark, pages)
    store = StateStore(str(tmp_path / "state"))
    init_state(store, frontier)
    run_crawl(spark, store, pages, DEFAULT.with_(batch_size=150), rounds=6)
    out = str(tmp_path / "rates")
    politeness_monitor(spark, store, out, DEFAULT, watermark="0 seconds")
    n1 = spark.read.parquet(out).count()
    assert n1 > 0
    # no new data → second drain appends nothing
    politeness_monitor(spark, store, out, DEFAULT, watermark="0 seconds")
    assert spark.read.parquet(out).count() == n1
    # more rounds advance the watermark → more closed windows emitted
    run_crawl(spark, store, pages, DEFAULT.with_(batch_size=150), rounds=6)
    politeness_monitor(spark, store, out, DEFAULT, watermark="0 seconds")
    assert spark.read.parquet(out).count() > n1

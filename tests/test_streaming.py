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


def test_cooloff_tracker_state_across_batches(spark, tmp_path):
    """applyInPandasWithState: a domain that served a 429 is in
    cool-off for COOL_OFF_PERIOD; checks fetched during it count as
    violations, and the state survives across drains (checkpoint)."""
    from hydra_spark.streaming import cooloff_monitor

    pages = generate_pages(spark, 2500, n_hosts=5).cache()
    frontier = generate_frontier(spark, pages)
    store = StateStore(str(tmp_path / "state"))
    init_state(store, frontier)
    # huge politeness budget so 429 domains keep being crawled (the
    # tracker is the observer, not the enforcer here)
    cfg = DEFAULT.with_(batch_size=400, backoff_nb_req=10**9, cool_off_period=86400)
    run_crawl(spark, store, pages, cfg, rounds=3)

    out = str(tmp_path / "cooloff")
    cooloff_monitor(spark, store, out, cfg)
    rows = spark.read.parquet(out).collect()
    assert rows

    # ground truth from the batch log: domains that served a 429
    checks = store.checks.read(spark)
    dom_429 = {r["domain"] for r in checks.where("status = 429").collect()}
    assert dom_429, "corpus should contain 429 pages"
    latest = {}
    for r in rows:
        latest[r["domain"]] = r  # later parquet rows have larger n_checks
        if r["domain"] in dom_429:
            pass
    got_cooloff = {d for d, r in latest.items() if r["cooloff_until"] is not None}
    assert dom_429 <= got_cooloff

    # every check on a 429 domain AFTER its first 429 is a violation
    import collections
    first_429 = {}
    per_domain = collections.defaultdict(list)
    for r in checks.where("domain is not null").collect():
        per_domain[r["domain"]].append(r)
    expected_viol = {}
    for d, rs in per_domain.items():
        by_ts = collections.defaultdict(list)
        for r in rs:
            by_ts[r["created_at"].timestamp()].append(r)
        until, viol = None, 0
        for t in sorted(by_ts):
            grp = by_ts[t]
            if until is not None and t < until:
                viol += len(grp)
            if any(r["status"] == 429 for r in grp):
                until = t + 86400
        expected_viol[d] = viol
    # compare the tracker's final totals (max n_checks row per domain)
    finals = {}
    for r in rows:
        if r["domain"] not in finals or r["n_checks"] > finals[r["domain"]]["n_checks"]:
            finals[r["domain"]] = r
    for d, r in finals.items():
        assert r["n_violations"] == expected_viol[d], d

    # state survives the checkpoint: more rounds, second drain continues
    run_crawl(spark, store, pages, cfg, rounds=2)
    cooloff_monitor(spark, store, out, cfg)
    rows2 = spark.read.parquet(out).collect()
    assert len(rows2) > len(rows)
    total_checks = checks.where("domain is not null").count()  # pre-extra rounds
    assert max(r["n_checks"] for r in rows2) >= max(r["n_checks"] for r in rows)

"""Steady-state growth-crawl assertions (mini version of
scripts/bench_longrun_discovery.py): discovery expands the frontier
from fetched links, the trap miner's exclusion patterns freeze the
trap space, claim cost stays flat, and the reachable corpus is fully
covered with zero duplicate checks."""

from __future__ import annotations

import pathlib
import sys
import tempfile

import pytest
from pyspark.sql import functions as F

from hydra_spark.config import DEFAULT
from hydra_spark.crawl.loop import init_state, run_crawl
from hydra_spark.crawl.traps import trap_exclusion_patterns, url_templates
from hydra_spark.datagen import generate_frontier
from hydra_spark.storage import StateStore

ROOT = pathlib.Path(__file__).resolve().parent.parent
sys.path.insert(0, str(ROOT / "scripts"))

N, ROUNDS, MINE_AFTER, MIN_URLS = 4000, 10, 3, 300


@pytest.fixture(scope="module")
def growth_run(spark):
    from bench_longrun_discovery import build_corpus

    corpus, pid = build_corpus(spark, N, cpus=4)
    n_corpus = corpus.count()
    store = StateStore(tempfile.mkdtemp(prefix="lrd_test_"))
    init_state(store, generate_frontier(spark, corpus.where(pid % 100 == 0)))
    base_cfg = DEFAULT.with_(
        batch_size=n_corpus, backoff_nb_req=10**9, discover_links=True,
        compact_every_rounds=4,
    )
    cfg = base_cfg
    rounds = []
    for i in range(ROUNDS):
        if i + 1 > MINE_AFTER:
            tpl = url_templates(store.frontier.read(spark), min_urls=MIN_URLS)
            pats = trap_exclusion_patterns(tpl, max_patterns=20)
            cfg = base_cfg.with_(
                excluded_patterns=tuple(base_cfg.excluded_patterns) + tuple(pats)
            )
        r = run_crawl(spark, store, corpus, cfg, rounds=1)[0]
        r["trap_rows_checked"] = (
            store.checks.read(spark)
            .where("url like 'https://trap.example.com/%'").count()
        )
        r["n_patterns"] = len(cfg.excluded_patterns) - len(base_cfg.excluded_patterns)
        rounds.append(r)
    corpus.unpersist()
    return store, rounds


def test_trap_template_is_mined_and_frozen(spark, growth_run):
    store, rounds = growth_run
    # the miner found the trap template (and did NOT need many patterns)
    assert 1 <= rounds[-1]["n_patterns"] <= 3
    # trap claims freeze once the exclusion patterns are active: the
    # first post-mining round may still drain in-flight claims; after
    # that the cumulative count must not move
    settled = [r["trap_rows_checked"] for r in rounds if r["round"] > MINE_AFTER + 1]
    assert settled, rounds
    assert settled[-1] == settled[0]
    # but the trap WAS being crawled before mining (the scenario is real)
    assert rounds[MINE_AFTER - 1]["trap_rows_checked"] > 0


def test_legit_corpus_fully_covered_no_duplicates(spark, growth_run):
    store, rounds = growth_run
    checks = store.checks.read(spark)
    assert checks.count() == checks.select("id").distinct().count()
    legit = checks.where(
        "status is not null and url not like 'https://trap.example.com/%'"
    )
    # (near-)full closure: BFS from the 1 % seed reaches the corpus;
    # ≥99 % guards against the handful of slow-arriving tail nodes at
    # this mini scale (the 1M-page bench reaches 99.998 %)
    assert legit.select("url").distinct().count() >= int(0.99 * N)
    # growth has settled: the final round discovers (almost) nothing
    assert rounds[-1]["n_discovered"] <= 0.05 * N


def test_claim_cost_flat_with_exclusions_active(spark, growth_run):
    _, rounds = growth_run
    early = rounds[1]["timings"].get("plan", 0) + rounds[1]["timings"].get("claim", 0)
    late = rounds[-1]["timings"].get("plan", 0) + rounds[-1]["timings"].get("claim", 0)
    # the exclusion list must not blow up claim planning; generous 5x
    # bound — the property is no blow-up, not micro-benchmark stability
    assert late <= max(5 * early, 5.0)


def test_trap_rows_remain_on_frontier_but_ineligible(spark, growth_run):
    store, rounds = growth_run
    fr = store.frontier.read(spark)
    trap_rows = fr.where("url like 'https://trap.example.com/%'").count()
    assert trap_rows > 0  # enqueued before mining — kept, just excluded
    assert rounds[-1]["trap_rows_checked"] < trap_rows  # never fully crawled


def test_run_crawl_mines_traps_itself(spark, tmp_path):
    """cfg.mine_traps_every makes the adaptive trap defense a loop
    feature: no caller-side mining, same freeze behavior."""
    from bench_longrun_discovery import build_corpus

    corpus, pid = build_corpus(spark, 2000, cpus=4)
    store = StateStore(str(tmp_path / "store"))
    init_state(store, generate_frontier(spark, corpus.where(pid % 50 == 0)))
    n_corpus = corpus.count()
    cfg = DEFAULT.with_(
        batch_size=n_corpus, backoff_nb_req=10**9, discover_links=True,
        mine_traps_every=3, trap_min_urls=150,
    )
    run_crawl(spark, store, corpus, cfg, rounds=9)
    checks = store.checks.read(spark)
    trap = checks.where("url like 'https://trap.example.com/%'")
    # the trap was entered, then frozen well short of its 2000-URL space
    n_trap = trap.count()
    assert 0 < n_trap < 1500
    # legit corpus still (nearly) fully covered
    legit = checks.where(
        "status is not null and url not like 'https://trap.example.com/%'"
    )
    assert legit.select("url").distinct().count() >= int(0.99 * 2000)
    corpus.unpersist()

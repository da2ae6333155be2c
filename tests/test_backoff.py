"""Politeness/backoff truth table.

Mirrors the reference's tests/test_crawl/test_backoff.py:20-191:
rate window, 429 cool-off, x-ratelimit variants, NO_BACKOFF_DOMAINS.
"""

from pyspark.sql import functions as F

from hydra_spark.config import DEFAULT
from hydra_spark.crawl.backoff import domain_backoff

NOW = "2025-01-15 00:00:00"
CHECK_COLS = "id long, domain string, created_at timestamp, status int, headers map<string,string>"


def _domains(spark, rows, cfg=DEFAULT):
    df = spark.createDataFrame(rows, CHECK_COLS)
    out = domain_backoff(df, cfg, NOW)
    return {r["domain"]: r["backoff_reason"] for r in out.collect()}


def _mk(i, domain, ago_s, status=200, headers=None):
    from datetime import datetime, timedelta

    ts = datetime.fromisoformat(NOW) - timedelta(seconds=ago_s)
    return (i, domain, ts, status, headers)


def test_rate_window_triggers_backoff(spark):
    cfg = DEFAULT.with_(backoff_nb_req=3, backoff_period=360)
    rows = [_mk(i, "busy.com", 10 * i) for i in range(5)]  # 5 checks in window
    rows += [_mk(100 + i, "quiet.com", 10 * i) for i in range(2)]  # only 2
    d = _domains(spark, rows, cfg)
    assert "busy.com" in d and d["busy.com"].startswith("Too many requests")
    assert "quiet.com" not in d


def test_rate_window_ignores_old_checks(spark):
    cfg = DEFAULT.with_(backoff_nb_req=3, backoff_period=360)
    rows = [_mk(i, "old.com", 1000 + 10 * i) for i in range(5)]  # outside window
    assert "old.com" not in _domains(spark, rows, cfg)


def test_429_on_latest_check_backs_off(spark):
    rows = [_mk(1, "limited.com", 100, status=429)]
    d = _domains(spark, rows)
    assert d["limited.com"].startswith("429")


def test_429_cooloff_expires(spark):
    cfg = DEFAULT.with_(cool_off_period=50)
    rows = [_mk(1, "limited.com", 100, status=429)]  # older than cool-off
    assert _domains(spark, rows, cfg) == {}


def test_429_not_latest_is_fine(spark):
    rows = [_mk(1, "d.com", 200, status=429), _mk(2, "d.com", 100, status=200)]
    assert _domains(spark, rows) == {}


def test_ratelimit_zero_remaining(spark):
    rows = [_mk(1, "q.com", 100, headers={"x-ratelimit-remaining": "0", "x-ratelimit-limit": "100"})]
    assert _domains(spark, rows)["q.com"] == "X-ratelimit reached"


def test_ratelimit_low_quota_within_backoff_period(spark):
    rows = [_mk(1, "q.com", 100, headers={"x-ratelimit-remaining": "5", "x-ratelimit-limit": "100"})]
    assert _domains(spark, rows)["q.com"] == "X-ratelimit reached"


def test_ratelimit_low_quota_outside_backoff_period_ok(spark):
    # ≤10% quota but the check is older than BACKOFF_PERIOD → no backoff
    rows = [_mk(1, "q.com", 500, headers={"x-ratelimit-remaining": "5", "x-ratelimit-limit": "100"})]
    assert _domains(spark, rows) == {}


def test_ratelimit_healthy_quota_ok(spark):
    rows = [_mk(1, "q.com", 100, headers={"x-ratelimit-remaining": "20", "x-ratelimit-limit": "100"})]
    assert _domains(spark, rows) == {}


def test_ratelimit_unparseable_ok(spark):
    rows = [_mk(1, "q.com", 100, headers={"x-ratelimit-remaining": "a", "x-ratelimit-limit": "b"})]
    assert _domains(spark, rows) == {}


def test_ratelimit_minus_one_exempt(spark):
    rows = [_mk(1, "q.com", 100, headers={"x-ratelimit-remaining": "0", "x-ratelimit-limit": "-1"})]
    assert _domains(spark, rows) == {}


def test_no_backoff_domains_allowlist(spark):
    cfg = DEFAULT.with_(backoff_nb_req=2, no_backoff_domains=("vip.com",))
    rows = [_mk(i, "vip.com", 10 * i) for i in range(5)]
    assert _domains(spark, rows, cfg) == {}

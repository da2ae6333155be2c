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


class TestCrawlDelayBudget:
    def test_declared_delay_tightens_rate_budget(self, spark):
        from datetime import datetime, timedelta

        from pyspark.sql import Row

        from hydra_spark.config import DEFAULT
        from hydra_spark.crawl.backoff import domain_backoff

        now = "2025-01-15 12:00:00"
        base = datetime(2025, 1, 15, 11, 59, 0)
        # 10 checks each inside the 360s window for two domains
        rows = []
        for dom in ("slow.example.com", "fast.example.com"):
            for i in range(10):
                rows.append(Row(
                    id=i, resource_id=f"r{i}", url=f"https://{dom}/{i}", domain=dom,
                    created_at=base + timedelta(seconds=i), status=200, headers={},
                ))
        checks = spark.createDataFrame(
            rows,
            "id long, resource_id string, url string, domain string, "
            "created_at timestamp, status int, headers map<string,string>",
        )
        cfg = DEFAULT.with_(backoff_nb_req=180, backoff_period=360.0)
        # no delays: neither domain near the 180 budget
        assert domain_backoff(checks, cfg, now).count() == 0
        # slow.example.com declares Crawl-delay 60 -> budget floor(360/60)=6
        delays = spark.createDataFrame(
            [Row(domain="slow.example.com", crawl_delay=60.0)]
        )
        held = domain_backoff(checks, cfg, now, crawl_delays=delays)
        assert [r.domain for r in held.collect()] == ["slow.example.com"]

    def test_delay_never_raises_budget(self, spark):
        from datetime import datetime, timedelta

        from pyspark.sql import Row

        from hydra_spark.config import DEFAULT
        from hydra_spark.crawl.backoff import domain_backoff

        now = "2025-01-15 12:00:00"
        base = datetime(2025, 1, 15, 11, 59, 0)
        rows = [Row(id=i, resource_id=f"r{i}", url=f"https://d.example.com/{i}",
                    domain="d.example.com", created_at=base + timedelta(seconds=i),
                    status=200, headers={}) for i in range(5)]
        checks = spark.createDataFrame(
            rows,
            "id long, resource_id string, url string, domain string, "
            "created_at timestamp, status int, headers map<string,string>",
        )
        cfg = DEFAULT.with_(backoff_nb_req=3, backoff_period=360.0)
        # tiny declared delay would allow 3600 req — budget stays at 3
        delays = spark.createDataFrame([Row(domain="d.example.com", crawl_delay=0.1)])
        held = domain_backoff(checks, cfg, now, crawl_delays=delays)
        assert held.count() == 1

    def test_delay_longer_than_window_holds_until_elapsed(self, spark):
        from datetime import datetime, timedelta

        from pyspark.sql import Row

        from hydra_spark.config import DEFAULT
        from hydra_spark.crawl.backoff import domain_backoff

        # Crawl-delay 7200s with a 3600s rate window: floor(3600/7200)=0
        # used to degrade to ~1 req/3600s — HALF the declared spacing.
        now = "2025-01-15 12:00:00"
        t0 = datetime(2025, 1, 15, 12, 0, 0)

        def checks_at(ago_s):
            rows = [Row(id=1, resource_id="r1", url="https://slow.example.com/a",
                        domain="slow.example.com",
                        created_at=t0 - timedelta(seconds=ago_s),
                        status=200, headers={})]
            return spark.createDataFrame(
                rows,
                "id long, resource_id string, url string, domain string, "
                "created_at timestamp, status int, headers map<string,string>",
            )

        cfg = DEFAULT.with_(backoff_nb_req=180, backoff_period=3600.0)
        delays = spark.createDataFrame(
            [Row(domain="slow.example.com", crawl_delay=7200.0)]
        )
        # last check 5000s ago: outside the rate window but inside the
        # declared delay -> must be held
        held = domain_backoff(checks_at(5000), cfg, now, crawl_delays=delays)
        rows = held.collect()
        assert [r.domain for r in rows] == ["slow.example.com"]
        assert "Crawl-delay" in rows[0].backoff_reason
        # last check 8000s ago: the declared spacing has elapsed -> free
        assert domain_backoff(checks_at(8000), cfg, now, crawl_delays=delays).count() == 0


class TestParseCrawlDelay:
    def test_group_resolution(self):
        from hydra_spark.crawl.robots import parse_crawl_delay

        body = ("User-agent: *\nCrawl-delay: 2\n\n"
                "User-agent: hydra\nDisallow: /x\nCrawl-delay: 7.5\n")
        assert parse_crawl_delay(body) == 7.5
        assert parse_crawl_delay(body, "other") == 2.0
        # exact group without a delay wins over * (and yields None)
        assert parse_crawl_delay("User-agent: hydra\nDisallow: /x\n"
                                 "User-agent: *\nCrawl-delay: 9\n") is None
        assert parse_crawl_delay("User-agent: *\nCrawl-delay: bogus\n") is None
        assert parse_crawl_delay("") is None

    def test_delays_table_from_pages(self, spark):
        from pyspark.sql import Row

        from hydra_spark.crawl.robots import crawl_delays_from_robots_pages

        pages = spark.createDataFrame([
            Row(domain="a.example.com", body=b"User-agent: *\nCrawl-delay: 5\n"),
            Row(domain="b.example.com", body=b"User-agent: *\nDisallow: /\n"),
            Row(domain="c.example.com", body=None),
        ])
        rows = {r.domain: r.crawl_delay for r in crawl_delays_from_robots_pages(pages).collect()}
        assert rows == {"a.example.com": 5.0}

"""Round-5 crawl-quality operators: soft-404 detection, conditional
revalidation accounting, per-host link stats, mirror detection."""

from __future__ import annotations

from pyspark.sql import functions as F

from hydra_spark.crawl.revalidate import revalidation_stats, with_revalidation_flag
from hydra_spark.crawl.soft404 import detect_soft404


def _rows(df, *cols):
    out = df.select(*cols) if cols else df
    return sorted(tuple(r) for r in out.collect())


class TestSoft404:
    def test_markers_thin_and_honest_errors(self, spark):
        pages = spark.createDataFrame(
            [
                ("u1", "Sorry, this Page Not Found on our server. " + "x" * 100, 200),
                ("u2", "ok", 200),                                  # thin
                ("u3", "a genuinely long healthy body " * 10, 200),  # fine
                ("u4", "Error 404: nothing here", 404),             # honest error
                ("u5", "Cette page introuvable, désolé. " + "y" * 100, 200),
            ],
            "url string, text string, status int",
        )
        out = {r["url"]: (r["reason"], r["is_soft404"]) for r in detect_soft404(pages).collect()}
        assert out["u1"] == ("marker", True)          # case-insensitive marker
        assert out["u2"] == ("thin", True)
        assert out["u3"] == (None, False)
        assert out["u4"] == ("marker", False)         # 404 is honest, not soft
        assert out["u5"] == ("marker", True)          # FR marker

    def test_marker_precedence_over_thin(self, spark):
        pages = spark.createDataFrame(
            [("u", "error 404", 200)], "url string, text string, status int"
        )
        assert detect_soft404(pages).first()["reason"] == "marker"

    def test_no_shuffle(self, spark):
        pages = spark.createDataFrame(
            [("u", "t", 200)], "url string, text string, status int"
        )
        plan = detect_soft404(pages)._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan


class TestRevalidation:
    def _checks(self, spark, rows):
        return spark.createDataFrame(
            rows,
            "id long, resource_id string, domain string, created_at timestamp, "
            "headers map<string,string>, filesize long",
        )

    def test_etag_precedence_and_lm_fallback(self, spark):
        import datetime as dt

        t0, t1 = dt.datetime(2025, 1, 1), dt.datetime(2025, 1, 2)
        rows = [
            # r1: stable etag → revalidatable
            (1, "r1", "d1", t0, {"etag": '"a"'}, 10),
            (2, "r1", "d1", t1, {"etag": '"a"'}, 11),
            # r2: etag changed → not
            (3, "r2", "d1", t0, {"etag": '"a"'}, 10),
            (4, "r2", "d1", t1, {"etag": '"b"'}, 12),
            # r3: no etag, stable last-modified → revalidatable
            (5, "r3", "d1", t0, {"last-modified": "L"}, 10),
            (6, "r3", "d1", t1, {"last-modified": "L"}, 13),
            # r4: etag present now but absent before → not (no lm check:
            # RFC 9110 §13.1.2 prefers the entity tag when present)
            (7, "r4", "d1", t0, {"last-modified": "L"}, 10),
            (8, "r4", "d1", t1, {"etag": '"a"', "last-modified": "L"}, 14),
            # r5: first check only → not a refetch at all
            (9, "r5", "d2", t0, {"etag": '"a"'}, 10),
        ]
        flags = {
            r["id"]: (r["is_refetch"], r["revalidatable"])
            for r in with_revalidation_flag(self._checks(spark, rows)).collect()
        }
        assert flags[2] == (True, True)
        assert flags[4] == (True, False)
        assert flags[6] == (True, True)
        assert flags[8] == (True, False)
        assert flags[9] == (False, False)

        stats = {r["domain"]: r for r in revalidation_stats(self._checks(spark, rows)).collect()}
        assert stats["d1"]["refetches"] == 4
        assert stats["d1"]["revalidatable"] == 2
        assert stats["d1"]["revalidatable_pct"] == 0.5
        assert stats["d1"]["bytes_saved"] == 11 + 13
        assert "d2" not in stats  # no refetch → no row

    def test_headers_case_already_lowered(self, spark):
        # header() reads lowercase keys (fetch normalizes on ingest)
        import datetime as dt

        rows = [
            (1, "r", "d", dt.datetime(2025, 1, 1), {"etag": "x"}, 1),
            (2, "r", "d", dt.datetime(2025, 1, 2), {}, 1),
        ]
        out = {r["id"]: r["revalidatable"] for r in with_revalidation_flag(self._checks(spark, rows)).collect()}
        assert out[2] is False


class TestHostLinkStats:
    def test_counts_and_ratio(self, spark):
        from hydra_spark.crawl.graph import host_link_stats

        links = spark.createDataFrame(
            [
                ("https://a.com/x", "https://a.com/y"),
                ("https://a.com/x", "https://b.com/z"),
                ("https://a.com/p", "https://b.com/q"),
                ("https://a.com/p", "https://A.COM/r"),   # host compare is lowered
                ("https://c.com/1", "https://d.com/2"),
            ],
            "url string, link string",
        )
        out = {r["src_host"]: r for r in host_link_stats(links).collect()}
        a = out["a.com"]
        assert (a["outlinks"], a["distinct_hosts"], a["internal"]) == (4, 2, 2)
        assert a["internal_ratio"] == 0.5
        c = out["c.com"]
        assert (c["outlinks"], c["distinct_hosts"], c["internal"]) == (1, 1, 0)


class TestMirrorSets:
    def test_groups_and_min_hosts_gate(self, spark):
        from hydra_spark.ml.dedup import mirror_sets

        pages = spark.createDataFrame(
            [
                ("https://a.com/1", "same"),
                ("https://b.com/1", "same"),
                ("https://a.com/2", "solo"),
                ("https://a.com/3", "onehost"),
                ("https://a.com/4", "onehost"),   # 2 urls, 1 host → filtered
            ],
            "url string, text string",
        )
        out = mirror_sets(pages).collect()
        assert len(out) == 1
        r = out[0]
        assert (r["n_hosts"], r["n_urls"], r["canonical_url"]) == (2, 2, "https://a.com/1")

    def test_digest_col_passthrough(self, spark):
        from hydra_spark.ml.dedup import mirror_sets

        pages = spark.createDataFrame(
            [("https://a.com/1", "g"), ("https://b.com/9", "g")],
            "url string, d string",
        )
        out = mirror_sets(pages, digest_col="d").collect()
        assert len(out) == 1 and out[0]["digest"] == "g"

    def test_text_never_shuffles(self, spark):
        from hydra_spark.ml.dedup import mirror_sets

        pages = spark.createDataFrame(
            [("https://a.com/1", "body")], "url string, text string"
        )
        plan = mirror_sets(pages)._jdf.queryExecution().executedPlan().toString()
        # the scan projects to (digest, host, url) before the exchange —
        # the text column must not appear in the shuffle. The plan
        # prints top-down, so everything ABOVE the last Exchange line is
        # the reduce side; text# must only occur below it (map side).
        assert "Exchange" in plan
        reduce_side = plan[: plan.rindex("Exchange")]
        assert "text#" not in reduce_side

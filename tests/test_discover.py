"""Link discovery (crawl/discover.py): href extraction, frontier
enqueue dedup, MoR insert files, and the discovery-enabled crawl loop."""

import tempfile

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from hydra_spark.config import DEFAULT
from hydra_spark.crawl.discover import discover_frontier, extract_links
from hydra_spark.schemas import FRONTIER_SCHEMA


def _page(spark, url, html):
    return spark.createDataFrame([Row(url=url, html=html)])


class TestExtractLinks:
    BASE = "https://host1.example.com/dir/doc.html"

    def _links(self, spark, html, **kw):
        df = _page(spark, self.BASE, html if isinstance(html, bytes) else html.encode())
        return sorted(r.link for r in extract_links(df, **kw).collect())

    def test_resolution_matrix(self, spark):
        html = (
            '<a href="https://Ext.Example.ORG:443/Page/1#sec">a</a>'
            "<a href='/root/2'>b</a>"
            '<a href="//cdn.example.net/a/3">c</a>'
            '<a href="sub/4">d</a>'
        )
        assert self._links(spark, html) == [
            "https://cdn.example.net/a/3",
            "https://ext.example.org/Page/1",
            "https://host1.example.com/dir/sub/4",
            "https://host1.example.com/root/2",
        ]

    def test_skips_fragments_and_non_http_schemes(self, spark):
        html = (
            '<a href="#frag">x</a><a href="mailto:a@b.c">x</a>'
            '<a href="javascript:void(0)">x</a><a href="ftp://x/y">x</a>'
            '<a href="data:text/plain,z">x</a><a href="/keep.html">y</a>'
        )
        assert self._links(spark, html) == ["https://host1.example.com/keep.html"]

    def test_canonical_dedup_and_cap(self, spark):
        html = (
            '<a href="https://A.example.org/p#x">1</a>'
            '<a href="https://a.example.org/p">2</a>'
            '<a href="/b">3</a><a href="/c">4</a>'
        )
        assert len(self._links(spark, html)) == 3
        assert len(self._links(spark, html, max_links_per_page=2)) == 2

    def test_same_host_only(self, spark):
        html = '<a href="https://other.example.org/x">1</a><a href="/local">2</a>'
        assert self._links(spark, html, same_host_only=True) == [
            "https://host1.example.com/local"
        ]

    def test_no_links_no_rows(self, spark):
        assert self._links(spark, "<html><body>plain</body></html>") == []


class TestDiscoverFrontier:
    def test_schema_dedup_and_rid_shape(self, spark):
        links = spark.createDataFrame(
            [Row(url="u", link="https://a.example.org/c"),
             Row(url="v", link="https://a.example.org/c"),
             Row(url="u", link="https://b.example.org/d")]
        )
        fr = spark.createDataFrame([], FRONTIER_SCHEMA)
        new = discover_frontier(fr, links)
        assert [f.name for f in new.schema.fields] == [f.name for f in FRONTIER_SCHEMA.fields]
        rows = new.collect()
        assert len(rows) == 2  # cross-page dup collapsed
        for r in rows:
            assert r.type == "discovered" and not r.priority and not r.deleted
            assert len(r.resource_id) == 36 and r.resource_id.count("-") == 4
            assert 0 <= r.host_bucket < DEFAULT.frontier_buckets
        # already-enqueued links are filtered by the anti-join
        assert discover_frontier(new, links).count() == 0


class TestFrontierInsertStore:
    def _store_with_inserts(self, spark):
        from hydra_spark.crawl.discover import discover_frontier
        from hydra_spark.storage import StateStore

        store = StateStore(tempfile.mkdtemp(prefix="hydra_ins_"))
        base = spark.createDataFrame(
            [Row(dataset_id=None, resource_id="r0", url="https://h.example.com/0",
                 deleted=False, last_check=None, priority=False, status=None,
                 status_since=None, harvest_modified_at=None, type=None,
                 format=None, title=None, host_bucket=3)],
            FRONTIER_SCHEMA,
        )
        store.frontier.commit(base, round_id=0)
        links = spark.createDataFrame([Row(url="u", link="https://h.example.com/new")])
        new = discover_frontier(store.frontier.read(spark), links)
        store.frontier.append_inserts(new, round_id=1)
        return store

    def test_inserts_visible_and_compact_folds_once(self, spark):
        store = self._store_with_inserts(spark)
        assert store.frontier.read(spark).count() == 2
        store.frontier.compact(spark, round_id=1)
        assert store.frontier.read(spark).count() == 2
        assert store.frontier.base.read(spark).count() == 2

    def test_crash_between_fold_and_clear_does_not_duplicate(self, spark):
        import json

        store = self._store_with_inserts(spark)
        mpath = store.frontier.inserts.manifest_path
        before = open(mpath).read()
        store.frontier.compact(spark, round_id=1)
        # simulate a crash AFTER the base commit but BEFORE the insert
        # manifest was cleared: restore the pre-compact manifest
        open(mpath, "w").write(before)
        assert json.load(open(mpath))["batches"]
        # the folded ids recorded in the base snapshot meta keep the
        # re-read from duplicating the inserted row
        assert store.frontier.read(spark).count() == 2

    def test_prune_drops_uncommitted_insert_batches(self, spark):
        store = self._store_with_inserts(spark)  # insert appended at round 1
        # round 1 never committed -> crash recovery prunes its inserts
        assert store.frontier.prune_after_round(0) >= 1
        assert store.frontier.read(spark).count() == 1


class TestDiscoveryCrawl:
    def _corpus(self, spark):
        def page(i, hrefs):
            body = "".join(f'<a href="{h}">l</a>' for h in hrefs)
            return Row(
                url=f"https://h{i}.example.com/p{i}",
                html=f"<html><body><p>doc {i}</p>{body}</body></html>".encode(),
                text=f"doc {i}",
                lang="en",
            )

        rows = [
            page(0, ["https://h1.example.com/p1", "https://h2.example.com/p2"]),
            page(1, ["https://h2.example.com/p2"]),
            page(2, []),
        ]
        return spark.createDataFrame(rows).withColumn(
            "warc_ts", F.to_timestamp(F.lit("2025-01-01 00:00:00"))
        ).select("url", "warc_ts", "html", "text", "lang")

    def test_frontier_grows_and_discovered_urls_get_checked(self, spark):
        from hydra_spark.crawl import run_crawl
        from hydra_spark.crawl.loop import init_state
        from hydra_spark.datagen import generate_frontier
        from hydra_spark.storage import StateStore

        pages = self._corpus(spark)
        seed = generate_frontier(spark, pages.where("url LIKE '%p0'"))
        store = StateStore(tempfile.mkdtemp(prefix="hydra_disc_"))
        init_state(store, seed)
        cfg = DEFAULT.with_(discover_links=True, batch_size=10, backoff_nb_req=10**9)
        res = run_crawl(spark, store, pages, cfg, rounds=3)
        assert res[0]["n_checked"] == 1 and res[0]["n_discovered"] == 2
        # round 2 claims the two discovered URLs; p1's link to p2 is
        # already enqueued, so nothing new is discovered
        assert res[1]["n_checked"] == 2 and res[1]["n_discovered"] == 0
        assert res[2]["n_discovered"] == 0
        fr = store.frontier.read(spark)
        assert fr.count() == 3
        assert fr.where("type = 'discovered'").count() == 2
        checked_urls = {
            r.url for r in store.checks.read(spark).select("url").collect()
        }
        assert checked_urls == {
            "https://h0.example.com/p0",
            "https://h1.example.com/p1",
            "https://h2.example.com/p2",
        }

    def test_discovery_survives_resume(self, spark):
        from hydra_spark.crawl import run_crawl
        from hydra_spark.crawl.loop import init_state
        from hydra_spark.datagen import generate_frontier
        from hydra_spark.storage import StateStore

        pages = self._corpus(spark)
        seed = generate_frontier(spark, pages.where("url LIKE '%p0'"))
        store = StateStore(tempfile.mkdtemp(prefix="hydra_disc2_"))
        init_state(store, seed)
        cfg = DEFAULT.with_(discover_links=True, batch_size=10, backoff_nb_req=10**9)
        run_crawl(spark, store, pages, cfg, rounds=1)
        # fresh process analog: a new run_crawl resumes at round 2 and
        # sees the round-1 inserts
        res = run_crawl(spark, store, pages, cfg, rounds=1)
        assert res[0]["round"] == 2 and res[0]["n_checked"] == 2


class TestExtractSitemapUrls:
    def test_locs_decode_canonicalize_dedup(self, spark):
        from hydra_spark.crawl.discover import extract_sitemap_urls

        xml = (
            "<?xml version='1.0'?><urlset>"
            "<url><loc> https://A.example.org/p?a=1&amp;b=2 </loc></url>"
            "<url><loc>https://a.example.org/p?a=1&b=2</loc></url>"
            "<url><loc>https://a.example.org/q#frag</loc></url>"
            "<url><loc>not-a-url</loc></url>"
            "</urlset>"
        ).encode()
        df = spark.createDataFrame(
            [Row(url="https://a.example.org/sitemap.xml", xml=xml)]
        )
        rows = sorted(r.loc for r in extract_sitemap_urls(df).collect())
        assert rows == [
            "https://a.example.org/p?a=1&b=2",
            "https://a.example.org/q",
        ]

    def test_sitemap_index_and_cap(self, spark):
        from hydra_spark.crawl.discover import extract_sitemap_urls

        xml = (
            "<sitemapindex>"
            "<sitemap><loc>https://h.example.com/s1.xml</loc></sitemap>"
            "<sitemap><loc>https://h.example.com/s2.xml</loc></sitemap>"
            "</sitemapindex>"
        ).encode()
        df = spark.createDataFrame([Row(url="https://h.example.com/sitemap.xml", xml=xml)])
        assert extract_sitemap_urls(df).count() == 2
        assert extract_sitemap_urls(df, max_urls_per_sitemap=1).count() == 1


class TestWarcCodec:
    def _recs(self):
        from hydra_spark.analysis.warc import build_warc_record

        return [
            build_warc_record(
                "response", "https://a.example.org/1", "2025-01-01T00:00:00Z",
                b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n<html>hi</html>",
            ),
            build_warc_record(
                "request", "https://a.example.org/1", "2025-01-01T00:00:00Z",
                b"GET /1 HTTP/1.1\r\nHost: a.example.org\r\n\r\n",
                content_type="application/http; msgtype=request",
            ),
            build_warc_record(
                "warcinfo", None, "2025-01-01T00:00:00Z", b"software: test\r\n",
                content_type="application/warc-fields",
            ),
        ]

    def test_roundtrip_gzip_members_and_plain(self):
        from hydra_spark.analysis.warc import build_warc, iter_warc_records

        for gz in (True, False):
            parsed = list(iter_warc_records(build_warc(self._recs(), gzip_per_record=gz)))
            assert [p["warc_type"] for p in parsed] == ["response", "request", "warcinfo"]
            assert parsed[0]["http_status"] == 200
            assert parsed[0]["body"] == b"<html>hi</html>"
            assert parsed[0]["target_uri"] == "https://a.example.org/1"
            assert parsed[2]["target_uri"] is None

    def test_resync_and_edge_inputs(self):
        from hydra_spark.analysis.warc import build_warc, iter_warc_records

        plain = build_warc(self._recs(), gzip_per_record=False)
        assert len(list(iter_warc_records(b"garbage" + plain))) == 3
        # truncated mid-gzip-member: earlier full members still decode
        gz = build_warc(self._recs())
        assert len(list(iter_warc_records(gz[: len(gz) - 10]))) >= 2
        assert list(iter_warc_records(None)) == []
        assert list(iter_warc_records(b"")) == []
        assert list(iter_warc_records(b"no warc here")) == []

    def test_deterministic_record_ids(self):
        from hydra_spark.analysis.warc import build_warc_record

        a = build_warc_record("response", "u", "2025-01-01T00:00:00Z", b"x")
        b = build_warc_record("response", "u", "2025-01-01T00:00:00Z", b"x")
        assert a == b and b"urn:uuid:" in a

    def test_spark_read_warc(self, spark, tmp_path):
        from hydra_spark.analysis.warc import build_warc, read_warc

        (tmp_path / "seg-0.warc.gz").write_bytes(build_warc(self._recs()))
        (tmp_path / "seg-1.warc.gz").write_bytes(build_warc(self._recs()[:1]))
        out = read_warc(spark, str(tmp_path) + "/*.warc.gz")
        rows = out.collect()
        assert len(rows) == 4
        assert {r.warc_type for r in rows} == {"response", "request", "warcinfo"}
        resp = [r for r in rows if r.warc_type == "response"]
        assert all(r.http_status == 200 and bytes(r.body) == b"<html>hi</html>" for r in resp)
        assert all(r.src.endswith(".warc.gz") for r in rows)


class TestCdxIndex:
    def test_offsets_enable_ranged_record_reads(self, tmp_path):
        from hydra_spark.analysis.warc import (
            build_warc_record,
            build_warc_with_index,
            read_warc_slice,
        )

        recs = [
            build_warc_record(
                "response", f"https://h{i}.example.org/{i}", "2025-01-01T00:00:00Z",
                b"HTTP/1.1 200 OK\r\n\r\nbody-%d" % i,
            )
            for i in range(5)
        ]
        seg, idx = build_warc_with_index(recs)
        p = tmp_path / "s.warc.gz"
        p.write_bytes(seg)
        assert sum(r["length"] for r in idx) == len(seg)
        for i, row in enumerate(idx):
            rec = read_warc_slice(str(p), row["offset"], row["length"])
            assert rec["target_uri"] == f"https://h{i}.example.org/{i}"
            assert rec["body"] == b"body-%d" % i

    def test_surt_key_shapes(self, spark):
        from hydra_spark.functions.urls import surt_key

        cases = {
            "https://www.Example.COM:8080/Path?b=2&a=1": "com,example:8080)/path?a=1&b=2",
            "https://www.Example.COM:443/Path?b=2&a=1": "com,example)/path?a=1&b=2",
            "http://sub.host.org/x": "org,host,sub)/x",
            "https://example.com": "com,example)/",
            "no-scheme": None,
        }
        df = spark.createDataFrame([(u,) for u in cases], ["u"])
        got = {r.u: r.k for r in df.select("u", surt_key("u").alias("k")).collect()}
        assert got == cases


class TestInsertIdsAfterCompaction:
    def test_post_compact_insert_batch_not_swallowed_by_folded_ids(self, spark):
        """Regression (caught by bench_discover): after compact() cleared
        the insert manifest, a NEW insert batch reused id 1 — which sat
        in the base's folded-id set — and was silently skipped on read."""
        from hydra_spark.crawl.discover import discover_frontier
        from hydra_spark.storage import StateStore

        store = StateStore(tempfile.mkdtemp(prefix="hydra_ids_"))
        base = spark.createDataFrame(
            [Row(dataset_id=None, resource_id="r0", url="https://h.example.com/0",
                 deleted=False, last_check=None, priority=False, status=None,
                 status_since=None, harvest_modified_at=None, type=None,
                 format=None, title=None, host_bucket=3)],
            FRONTIER_SCHEMA,
        )
        store.frontier.commit(base, round_id=0)
        l1 = spark.createDataFrame([Row(url="u", link="https://h.example.com/a")])
        store.frontier.append_inserts(
            discover_frontier(store.frontier.read(spark), l1), round_id=1
        )
        store.frontier.compact(spark, round_id=1)
        l2 = spark.createDataFrame([Row(url="u", link="https://h.example.com/b")])
        store.frontier.append_inserts(
            discover_frontier(store.frontier.read(spark), l2), round_id=2
        )
        assert store.frontier.read(spark).count() == 3  # r0 + a + b
        store.frontier.compact(spark, round_id=2)
        assert store.frontier.read(spark).count() == 3


class TestDiscoveryChain:
    def test_robots_to_sitemap_to_frontier(self, spark):
        """The full growth chain: robots.txt Sitemap directives ->
        sitemap <loc> harvest -> frontier enqueue."""
        from hydra_spark.crawl.discover import discover_frontier, extract_sitemap_urls
        from hydra_spark.crawl.robots import sitemaps_from_robots

        robots = spark.createDataFrame([Row(
            url="https://h.example.com/robots.txt",
            body=(b"User-agent: *\nDisallow: /private\n"
                  b"Sitemap: https://h.example.com/sitemap.xml\n"),
        )])
        maps = sitemaps_from_robots(robots)
        assert [r.sitemap for r in maps.collect()] == ["https://h.example.com/sitemap.xml"]
        # simulate fetching the advertised sitemap
        fetched = maps.select(
            F.col("sitemap").alias("url"),
            F.encode(F.lit(
                "<urlset><url><loc>https://h.example.com/a</loc></url>"
                "<url><loc>https://h.example.com/b</loc></url></urlset>"
            ), "UTF-8").alias("xml"),
        )
        locs = extract_sitemap_urls(fetched)
        fr = spark.createDataFrame([], FRONTIER_SCHEMA)
        new = discover_frontier(fr, locs, link_col="loc")
        urls = sorted(r.url for r in new.collect())
        assert urls == ["https://h.example.com/a", "https://h.example.com/b"]
        assert all(r.type == "discovered" for r in new.collect())


class TestWarcSink:
    def test_crawl_pages_archive_and_roundtrip(self, spark, tmp_path):
        from hydra_spark.analysis.warc import read_warc, write_warc
        from hydra_spark.datagen import generate_pages

        pages = generate_pages(spark, 120, n_hosts=6)
        manifest = write_warc(pages, str(tmp_path / "archive")).collect()
        assert sum(m.n_records for m in manifest) == 120
        assert all(m.path.endswith(".warc.gz") for m in manifest)
        back = read_warc(spark, str(tmp_path / "archive") + "/*.warc.gz")
        assert back.count() == 120
        # body bytes roundtrip exactly against the source html
        src = {r.url: bytes(r.html) for r in pages.select("url", "html").collect()}
        for r in back.select("target_uri", "body", "http_status").collect():
            assert bytes(r.body) == src[r.target_uri]
            assert r.http_status == 200

    def test_null_payloads_skipped_and_deterministic_names(self, spark, tmp_path):
        from pyspark.sql import functions as F

        from hydra_spark.analysis.warc import write_warc

        df = spark.createDataFrame(
            [("https://h.example.com/1", None), ("https://h.example.com/2", b"x")],
            "url string, html binary",
        ).withColumn("warc_ts", F.to_timestamp(F.lit("2025-01-01 00:00:00")))
        m1 = sorted(r.path for r in write_warc(df.coalesce(1), str(tmp_path / "a")).collect())
        m2 = sorted(r.path for r in write_warc(df.coalesce(1), str(tmp_path / "b")).collect())
        assert len(m1) == 1
        assert [p.split("/")[-1] for p in m1] == [p.split("/")[-1] for p in m2]

    def test_shared_first_url_never_collides(self, spark, tmp_path):
        """Recrawl archives repeat captures: two partitions whose first
        row shares a URL must write DISTINCT segments (first-URL-hash
        names used to silently overwrite one with the other)."""
        from pyspark.sql import functions as F

        from hydra_spark.analysis.warc import read_warc, write_warc

        rows = [("https://h.example.com/same", f"capture {i}".encode()) for i in range(4)]
        df = (
            spark.createDataFrame(rows, "url string, html binary")
            .withColumn("warc_ts", F.to_timestamp(F.lit("2025-01-01 00:00:00")))
            .repartition(2)
        )
        manifest = write_warc(df, str(tmp_path / "arc")).collect()
        paths = [m.path for m in manifest]
        assert len(paths) == len(set(paths))
        assert sum(m.n_records for m in manifest) == 4
        assert read_warc(spark, str(tmp_path / "arc") + "/*.warc.gz").count() == 4


class TestWetSink:
    def test_extract_then_wet_roundtrip(self, spark, tmp_path):
        """fetch -> extract -> WET: the CC text-product pipeline."""
        from pyspark.sql import functions as F

        from hydra_spark.analysis.extract import html_to_text
        from hydra_spark.analysis.warc import read_warc, write_wet
        from hydra_spark.datagen import generate_linked_pages

        pages = generate_linked_pages(spark, 60, n_hosts=6)
        extracted = pages.select(
            "url", "warc_ts", html_to_text("html").alias("text")
        )
        manifest = write_wet(extracted, str(tmp_path / "wet")).collect()
        assert sum(m.n_records for m in manifest) == 60
        back = read_warc(spark, str(tmp_path / "wet") + "/*.warc.wet.gz")
        assert back.count() == 60
        assert {r.warc_type for r in back.select("warc_type").distinct().collect()} == {"conversion"}
        src = {r.url: r.text for r in extracted.collect()}
        for r in back.select("target_uri", "body").collect():
            assert bytes(r.body).decode() == src[r.target_uri]


class TestWatSink:
    def test_wat_roundtrip_and_cross_reference(self, spark, tmp_path):
        """WARC/WAT/WET trio: the WAT metadata record's WARC-Refers-To
        matches the record id write_warc gives the response record."""
        from hydra_spark.analysis.warc import (
            iter_warc_records,
            read_warc,
            read_warc_slice,
            wat_metadata,
            write_warc,
            write_wat,
        )
        from hydra_spark.datagen import generate_linked_pages

        pages = generate_linked_pages(spark, 60, n_hosts=6)
        write_warc(pages, str(tmp_path / "warc")).collect()
        manifest = write_wat(pages, str(tmp_path / "wat")).collect()
        assert sum(m.n_records for m in manifest) == 60
        assert all(m.path.endswith(".warc.wat.gz") for m in manifest)

        back = read_warc(spark, str(tmp_path / "wat") + "/*.warc.wat.gz")
        assert {r.warc_type for r in back.select("warc_type").distinct().collect()} == {"metadata"}
        meta = wat_metadata(back)
        assert meta.count() == 60

        # links in the WAT are the raw hrefs of the page html
        src = {
            r.url: bytes(r.html).decode()
            for r in pages.select("url", "html").collect()
        }
        for r in meta.collect():
            for link in r.links:
                assert f'href="{link}"' in src[r.target_uri]

        # cross-reference: WARC-Refers-To == the response record's id
        response_ids = {}
        for m in (tmp_path / "warc").glob("*.warc.gz"):
            for rec in iter_warc_records(m.read_bytes()):
                response_ids[rec["target_uri"]] = rec["record_id"]
        n_checked = 0
        for m in (tmp_path / "wat").glob("*.warc.wat.gz"):
            raw = m.read_bytes()
            import gzip as _g
            import re as _re

            text = _g.decompress(raw) if raw.startswith(b"\x1f\x8b") else raw
            # refers-to of the first record in the segment
            rec = next(iter_warc_records(raw))
            head = _re.search(
                rb"WARC-Refers-To: (<[^>]+>)",
                text.split(b"\r\n\r\n", 1)[0],
            )
            assert head is not None
            assert head.group(1).decode() == response_ids[rec["target_uri"]]
            n_checked += 1
        assert n_checked == len(manifest)

    def test_wat_envelope_edge_cases(self):
        from hydra_spark.analysis.warc import wat_envelope
        import json

        # no title, no links, None payload
        env = json.loads(wat_envelope("u", "1970-01-01T00:00:00Z", None))
        hm = env["Envelope"]["Payload-Metadata"]["HTTP-Response-Metadata"]["HTML-Metadata"]
        assert hm["Links"] == [] and "Head" not in hm
        # whitespace-collapsed title + link cap
        html = b"<title>\n A   B </title>" + b'<a href="/x">.</a>' * 5
        env = json.loads(wat_envelope("u", "1970-01-01T00:00:00Z", html, max_links=3))
        hm = env["Envelope"]["Payload-Metadata"]["HTTP-Response-Metadata"]["HTML-Metadata"]
        assert hm["Head"]["Title"] == "A B"
        assert len(hm["Links"]) == 3
        assert hm["Links"][0] == {"path": "A@/href", "url": "/x"}


class TestTrapDetection:
    def test_url_template(self, spark):
        from hydra_spark.crawl.traps import url_template

        rows = spark.createDataFrame(
            [
                ("https://Ex.COM/p/31/x?b=2&a=1&b=3",),
                ("https://ex.com/about",),
                ("https://ex.com/y2024/m03?",),
            ],
            "url string",
        ).select(url_template("url").alias("t")).collect()
        assert [r.t for r in rows] == [
            "ex.com/p/{N}/x?a,b",
            "ex.com/about",
            "ex.com/y{N}/m{N}",
        ]

    def test_url_templates_trap_flag(self, spark):
        from hydra_spark.crawl.traps import url_templates

        urls = [(f"https://trap.example/page/{i}?s={i}",) for i in range(30)]
        urls += [("https://ok.example/about",)] * 40  # high fan-out but static
        urls += [("https://small.example/item/1",)]   # variable but tiny
        df = spark.createDataFrame(urls, "url string")
        got = {(r.host, r.template): r for r in url_templates(df, min_urls=20).collect()}
        assert got[("trap.example", "trap.example/page/{N}?s")].is_trap_candidate
        assert got[("trap.example", "trap.example/page/{N}?s")].n_urls == 30
        # static template never flags, whatever its count
        assert not got[("ok.example", "ok.example/about")].is_trap_candidate
        # variable but below min_urls
        assert not got[("small.example", "small.example/item/{N}")].is_trap_candidate

    def test_trap_exclusion_feeds_f1_path(self, spark):
        """End-to-end: flagged templates become LIKE patterns that the
        existing eligibility filter (F1) enforces on later rounds."""
        from hydra_spark.config import DEFAULT
        from hydra_spark.crawl.select_batch import eligible_frontier
        from hydra_spark.crawl.traps import trap_exclusion_patterns, url_templates

        urls = [(f"https://trap.example/page/{i}?s={i}",) for i in range(30)]
        urls += [("https://ok.example/data.csv",)]
        df = spark.createDataFrame(urls, "url string")
        pats = trap_exclusion_patterns(url_templates(df, min_urls=20))
        assert pats == ["%://trap.example/page/%%"]

        frontier = df.selectExpr(
            "url", "false AS deleted", "CAST(NULL AS string) AS status"
        )
        cfg = DEFAULT.with_(
            excluded_patterns=DEFAULT.excluded_patterns + tuple(pats)
        )
        left = [r.url for r in eligible_frontier(frontier, cfg).collect()]
        assert left == ["https://ok.example/data.csv"]


class TestSitemapIndex:
    def test_entries_route_by_kind(self, spark):
        from hydra_spark.crawl.discover import extract_sitemap_entries

        idx = (
            "<?xml version='1.0'?><sitemapindex>"
            "<sitemap><loc> https://ex.com/maps/a.xml </loc><lastmod>2024</lastmod></sitemap>"
            "<sitemap><loc>https://ex.com/maps/b.xml?p=1&amp;q=2</loc></sitemap>"
            "</sitemapindex>"
        )
        urlset = (
            "<urlset><url><loc>https://ex.com/p/1</loc></url>"
            "<url><loc>https://ex.com/p/2</loc><priority>.5</priority></url>"
            "<url><loc>bogus</loc></url></urlset>"
        )
        df = spark.createDataFrame(
            [("https://ex.com/sitemap.xml", idx.encode()),
             ("https://ex.com/maps/a.xml", urlset.encode())],
            "url string, xml binary",
        )
        got = {(r.url, r.loc, r.kind) for r in extract_sitemap_entries(df).collect()}
        assert got == {
            ("https://ex.com/sitemap.xml", "https://ex.com/maps/a.xml", "sitemap"),
            ("https://ex.com/sitemap.xml", "https://ex.com/maps/b.xml?p=1&q=2", "sitemap"),
            ("https://ex.com/maps/a.xml", "https://ex.com/p/1", "page"),
            ("https://ex.com/maps/a.xml", "https://ex.com/p/2", "page"),
        }

    def test_flat_extractor_unchanged(self, spark):
        # the legacy flattener still reads BOTH container types as locs
        from hydra_spark.crawl.discover import extract_sitemap_urls

        df = spark.createDataFrame(
            [("s", b"<sitemapindex><sitemap><loc>https://e.com/a.xml</loc></sitemap></sitemapindex>")],
            "url string, xml binary",
        )
        assert [r.loc for r in extract_sitemap_urls(df).collect()] == ["https://e.com/a.xml"]


class TestWarcDedup:
    def test_revisit_records_roundtrip(self, spark, tmp_path):
        from hydra_spark.analysis.warc import read_warc, write_warc_dedup

        rows = [
            ("https://a.example/1", "2024-01-01 00:00:00", b"BODY-X"),
            ("https://a.example/2", "2024-01-01 00:01:00", b"BODY-X"),  # revisit
            ("https://b.example/3", "2024-01-01 00:02:00", b"BODY-X"),  # revisit
            ("https://b.example/4", "2024-01-01 00:03:00", b"BODY-Y"),  # own payload
        ]
        df = spark.createDataFrame(
            rows, "url string, ts_s string, html binary"
        ).selectExpr("url", "CAST(ts_s AS TIMESTAMP) AS warc_ts", "html")
        out = str(tmp_path / "segs")
        manifest = write_warc_dedup(df.repartition(1), out).collect()
        assert sum(m.n_records for m in manifest) == 4

        recs = read_warc(spark, out).collect()
        by_url = {r.target_uri: r for r in recs}
        assert by_url["https://a.example/1"].warc_type == "response"
        assert bytes(by_url["https://a.example/1"].body) == b"BODY-X"
        assert by_url["https://b.example/4"].warc_type == "response"
        for u in ("https://a.example/2", "https://b.example/3"):
            r = by_url[u]
            assert r.warc_type == "revisit"
            assert r.refers_to == by_url["https://a.example/1"].record_id
            assert bytes(r.body) == b""  # only the HTTP head, no payload
        # responses carry no refers_to
        assert by_url["https://a.example/1"].refers_to is None

    def test_canonical_is_earliest_capture(self, spark, tmp_path):
        from hydra_spark.analysis.warc import read_warc, write_warc_dedup

        rows = [
            ("https://z.example/late", "2024-01-02 00:00:00", b"SAME"),
            ("https://a.example/early", "2024-01-01 00:00:00", b"SAME"),
        ]
        df = spark.createDataFrame(
            rows, "url string, ts_s string, html binary"
        ).selectExpr("url", "CAST(ts_s AS TIMESTAMP) AS warc_ts", "html")
        out = str(tmp_path / "segs")
        write_warc_dedup(df.repartition(2), out).collect()
        recs = {r.target_uri: r for r in read_warc(spark, out).collect()}
        assert recs["https://a.example/early"].warc_type == "response"
        assert recs["https://z.example/late"].warc_type == "revisit"

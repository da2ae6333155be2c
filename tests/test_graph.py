"""Link-graph operators: host edges, power-iteration rank, anchor text
(hydra_spark.crawl.graph) — the crawl-prioritization signal a
Common-Crawl-style crawler schedules by."""

from pyspark.sql import functions as F

from hydra_spark.crawl.graph import anchor_texts, host_edges, host_rank, with_host_rank


def _python_pagerank(edges, iterations, damping=0.85):
    """Plain-python reference implementation."""
    hosts = sorted({s for s, _ in edges} | {d for _, d in edges})
    out = {h: [d for s, d in edges if s == h] for h in hosts}
    n = len(hosts)
    r = {h: 1.0 / n for h in hosts}
    for _ in range(iterations):
        dang = sum(r[h] for h in hosts if not out[h])
        r = {
            h: (1 - damping) / n
            + damping * (sum(r[s] / len(out[s]) for s in hosts if h in out[s]) + dang / n)
            for h in hosts
        }
    return r


class TestHostEdges:
    def test_self_loops_and_blanks_drop(self, spark):
        links = spark.createDataFrame(
            [
                ("https://a.com/p", "https://b.com/q"),
                ("https://a.com/p", "https://A.COM/other"),  # self loop (case-folded)
                ("https://a.com/p", "not-a-url"),
                ("https://a.com/x", "https://b.com/q"),  # same edge again
            ],
            "url string, link string",
        )
        e = host_edges(links).collect()
        assert [(r.src_host, r.dst_host) for r in e] == [("a.com", "b.com")]


class TestHostRank:
    def test_matches_python_reference_and_sums_to_one(self, spark):
        edges = [
            ("a", "b"), ("a", "c"), ("b", "c"), ("c", "a"),
            ("d", "a"),  # d is only a source
            ("a", "e"),  # e is dangling
        ]
        df = spark.createDataFrame(edges, "src_host string, dst_host string")
        got = {r.host: r.rank for r in host_rank(df, iterations=25).collect()}
        want = _python_pagerank(edges, 25)
        assert set(got) == set(want)
        for h in want:
            assert abs(got[h] - want[h]) < 1e-12, h
        assert abs(sum(got.values()) - 1.0) < 1e-12  # proper distribution

    def test_empty_graph(self, spark):
        df = spark.createDataFrame([], "src_host string, dst_host string")
        assert host_rank(df, iterations=3).collect() == []

    def test_edge_table_shuffles_once_iterations_reuse_partitioning(self, spark):
        """Scale gate: the per-iteration plan moves host-cardinality rank
        rows only — the (big) edge table was partitioned at setup, so no
        iteration-count-proportional reshuffle of edges appears."""
        df = spark.createDataFrame(
            [("h%d" % (i % 13), "h%d" % ((i * 5 + 3) % 13)) for i in range(200)],
            "src_host string, dst_host string",
        )
        ranks = host_rank(df, iterations=3)
        plan = ranks._jdf.queryExecution().executedPlan().toString()
        # final iteration's plan: localCheckpoint truncated everything
        # before it — only the last hosts-join remains, no cartesian
        assert "Cartesian" not in plan
        assert "Scan ExistingRDD" in plan  # checkpointed inputs, lineage cut


class TestAnchorTexts:
    def test_extraction_and_whitespace_collapse(self, spark):
        df = spark.createDataFrame(
            [
                (
                    "https://x.com/p",
                    '<a href="https://y.com/a" rel="nofollow">  Go\n   here </a>'
                    '<A HREF="/b">B</A><a name="n">no href</a>',
                )
            ],
            "url string, html string",
        )
        rows = anchor_texts(df, html_col="html").collect()
        assert [(r.link, r.anchor) for r in rows] == [
            ("https://y.com/a", "Go here"),
            ("/b", "B"),
        ]

    def test_cap_and_binary_input(self, spark):
        html = ('<a href="/l">t</a>' * 10).encode()
        df = spark.createDataFrame([("u", html)], "url string, html binary")
        assert anchor_texts(df, max_anchors=4).count() == 4


class TestWithHostRank:
    def test_frontier_join_defaults_zero(self, spark):
        ranks = spark.createDataFrame([("a.com", 0.7)], "host string, rank double")
        fr = spark.createDataFrame(
            [("https://a.com/p",), ("https://new.com/q",)], "url string"
        )
        got = {r.url: r.host_rank for r in with_host_rank(fr, ranks).collect()}
        assert got == {"https://a.com/p": 0.7, "https://new.com/q": 0.0}


class TestFocusedScoring:
    def test_scores_and_rank_blend(self, spark):
        from hydra_spark.crawl.graph import score_frontier_by_anchors

        anchors = spark.createDataFrame(
            [
                ("https://s/a", "https://t1.example/x", "open DATA portal"),
                ("https://s/b", "https://t1.example/x", "click here"),
                ("https://s/c", "https://t2.example/y", "data"),
                ("https://s/d", "https://t3.example/z", "unrelated"),
            ],
            "url string, link string, anchor string",
        )
        kw = {"data": 0.5, "portal": 0.25}
        got = {r.link: r for r in score_frontier_by_anchors(anchors, kw).collect()}
        t1 = got["https://t1.example/x"]
        assert (t1.n_anchors, t1.anchor_score, t1.best_anchor_score) == (2, 0.75, 0.75)
        assert got["https://t2.example/y"].anchor_score == 0.5
        assert got["https://t3.example/z"].anchor_score == 0.0

        ranks = spark.createDataFrame(
            [("t3.example", 0.9)], "host string, rank double"
        )
        pr = {r.link: r.priority
              for r in score_frontier_by_anchors(anchors, kw, ranks=ranks).collect()}
        # rank rescues an anchor-poor target; unranked hosts keep their score
        assert pr["https://t3.example/z"] == 0.9
        assert pr["https://t1.example/x"] == 0.75

    def test_broadcast_only_rank_join(self, spark):
        from hydra_spark.crawl.graph import score_frontier_by_anchors

        anchors = spark.createDataFrame(
            [("u", "https://t.example/x", "data")], "url string, link string, anchor string"
        )
        ranks = spark.createDataFrame([("t.example", 0.5)], "host string, rank double")
        plan = (
            score_frontier_by_anchors(anchors, {"data": 1.0}, ranks=ranks)
            ._jdf.queryExecution().executedPlan().toString()
        )
        assert "BroadcastHashJoin" in plan and "SortMergeJoin" not in plan

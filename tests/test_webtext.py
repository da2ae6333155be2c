"""Webtext curation operators (ml/webtext.py): Gopher repetition stats,
C4-style corpus-level chunk dedup, GPT-3-style decontamination."""

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from hydra_spark.ml import webtext


def _docs(spark, texts):
    return spark.createDataFrame([Row(doc_id=i, text=t) for i, t in enumerate(texts)])


class TestChunkSegments:
    def test_basic_and_remainder(self, spark):
        df = _docs(spark, ["a b c d e f g h i j"])
        [row] = df.select(webtext.chunk_segments("text", 4).alias("c")).collect()
        assert row.c == ["a b c d", "e f g h", "i j"]

    def test_short_and_empty(self, spark):
        df = _docs(spark, ["a b", ""])
        rows = df.select("doc_id", webtext.chunk_segments("text", 4).alias("c")).collect()
        by_id = {r.doc_id: r.c for r in rows}
        assert by_id[0] == ["a b"]
        assert by_id[1] == [""]

    def test_lowercases(self, spark):
        df = _docs(spark, ["A B c"])
        [row] = df.select(webtext.chunk_segments("text", 2).alias("c")).collect()
        assert row.c == ["a b", "c"]

    def test_split_lines_mode(self, spark):
        df = _docs(spark, ["line one\nline two\nline one"])
        [row] = df.select(webtext.chunk_segments("text", split_lines=True).alias("c")).collect()
        assert row.c == ["line one", "line two", "line one"]


class TestRepetitionFeatures:
    def test_fully_repeated_doc(self, spark):
        # k=2 chunks of "a b a b a b a b" -> ['a b'] * 4: 3 of 4 are dups
        df = _docs(spark, ["a b a b a b a b"])
        [r] = webtext.repetition_features(df, k=2).collect()
        assert r.n_chunks == 4
        assert r.dup_chunk_frac == 0.75
        assert r.dup_chunk_char_frac == 0.75
        # overlapping 2-grams: 'a b' x4, 'b a' x3
        assert r.top_2gram == "a b"
        assert r.top_2gram_count == 4
        # 4 * len('a b') / len(text) = 12/15
        assert r.top_2gram_char_frac == pytest.approx(12 / 15, abs=1e-6)

    def test_no_repetition(self, spark):
        [r] = webtext.repetition_features(_docs(spark, ["w x y z"]), k=2).collect()
        assert r.dup_chunk_frac == 0.0 and r.dup_chunk_char_frac == 0.0
        assert r.top_2gram_count == 1

    def test_tie_breaks_to_smallest_gram(self, spark):
        # grams 'q r' and 'r q' both occur once; smallest wins deterministically
        [r] = webtext.repetition_features(_docs(spark, ["q r"]), k=2).collect()
        assert r.top_2gram == "q r"

    def test_gopher_threshold_classification(self, spark):
        df = _docs(spark, ["spam spam spam spam spam spam", "u v w x y z unique words here"])
        rows = {r.doc_id: r for r in webtext.repetition_features(df, k=2).collect()}
        assert rows[0].dup_chunk_frac > 0.30  # Gopher would drop
        assert rows[1].dup_chunk_frac <= 0.30


class TestChunkDedupCorpus:
    def test_boilerplate_removed_keep_first(self, spark):
        boiler = "subscribe to our newsletter"  # k=4 -> ['subscribe to our newsletter', ...]
        df = _docs(
            spark,
            [
                boiler + " alpha beta gamma delta",
                boiler + " epsilon zeta eta theta",
                "totally unique document four words",
            ],
        )
        out = {r.doc_id: r for r in webtext.chunk_dedup_corpus(df, k=4).collect()}
        # doc 0 holds the first occurrence -> keeps it; doc 1 loses it
        assert out[0].n_removed == 0
        assert out[1].n_removed == 1
        assert out[1].text_deduped == "epsilon zeta eta theta"
        assert out[2].n_removed == 0

    def test_remove_all_policy(self, spark):
        df = _docs(spark, ["same same same same", "same same same same"])
        out = {
            r.doc_id: r
            for r in webtext.chunk_dedup_corpus(df, k=4, keep_first=False).collect()
        }
        assert out[0].text_deduped == "" and out[1].text_deduped == ""
        assert out[0].n_removed == 1 and out[1].n_removed == 1

    def test_doc_freq_threshold(self, spark):
        df = _docs(spark, ["common phrase here now", "common phrase here now", "other words entirely differ"])
        # max_doc_freq=2 tolerates the pair -> nothing removed
        out = webtext.chunk_dedup_corpus(df, k=4, max_doc_freq=2)
        assert out.agg(F.sum("n_removed")).first()[0] == 0

    def test_row_count_preserved(self, spark):
        df = _docs(spark, ["a b c d", "a b c d", "a b c d"])
        out = webtext.chunk_dedup_corpus(df, k=4, keep_first=False)
        assert out.count() == 3  # emptied docs still present, accounting exact


class TestDecontaminate:
    def test_flags_overlap(self, spark):
        bench = _docs(spark, ["the quick brown fox jumps"])
        corpus = _docs(
            spark,
            ["totally clean document text here", "contains the quick brown fox jumps verbatim"],
        )
        out = {r.doc_id: r for r in webtext.decontaminate(corpus, bench, n=3).collect()}
        assert out[0].is_contaminated is False and out[0].n_hits == 0
        assert out[1].is_contaminated is True and out[1].n_hits >= 1

    def test_counts_distinct_grams_once(self, spark):
        bench = _docs(spark, ["x y z"])
        # doc grams: 'x y z','y z x','z x y','x y z' -> 3 distinct; only 'x y z' hits
        corpus = _docs(spark, ["x y z x y z"])
        [r] = webtext.decontaminate(corpus, bench, n=3).collect()
        assert r.n_hits == 1

    def test_plan_broadcasts_benchmark(self, spark):
        bench = _docs(spark, ["p q r"])
        corpus = _docs(spark, ["p q r s"])
        plan = webtext.decontaminate(corpus, bench)._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastHashJoin" in plan


class TestDecontaminateSpans:
    def test_disjoint_hits_make_separate_spans(self, spark):
        bench = _docs(spark, ["a b c"])
        corpus = _docs(spark, ["a b c x a b c d a b c"])  # hits at pos 0, 4, 8
        out = sorted(
            webtext.decontaminate_spans(corpus, bench, n=3).collect(),
            key=lambda r: r.span_id,
        )
        assert [(r.start_token, r.end_token, r.n_grams) for r in out] == [
            (0, 2, 1), (4, 6, 1), (8, 10, 1),
        ]
        assert [r.span_id for r in out] == [1, 2, 3]

    def test_overlapping_and_adjacent_hits_merge(self, spark):
        # overlapping: hits at 0 and 2 share token 2 -> one span [0,4]
        bench = _docs(spark, ["a b c", "c d e"])
        corpus = _docs(spark, ["a b c d e f"])
        [r] = webtext.decontaminate_spans(corpus, bench, n=3).collect()
        assert (r.start_token, r.end_token, r.n_grams) == (0, 4, 2)
        # adjacent: [0,2] then hit at 3 -> contiguous tokens, one span [0,5]
        bench2 = _docs(spark, ["a b c", "d e f"])
        [r2] = webtext.decontaminate_spans(corpus, bench2, n=3).collect()
        assert (r2.start_token, r2.end_token, r2.n_grams) == (0, 5, 2)

    def test_clean_docs_emit_no_rows_and_bench_broadcasts(self, spark):
        bench = _docs(spark, ["p q r"])
        corpus = _docs(spark, ["totally clean words here"])
        df = webtext.decontaminate_spans(corpus, bench, n=3)
        assert df.count() == 0
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastHashJoin" in plan


class TestRedactPii:
    def test_email_ip_phone(self, spark):
        df = _docs(spark, ["mail bob@corp.example.org ip 192.168.1.10 call +33 1 22 33 44 55 done"])
        [r] = webtext.redact_pii(df).collect()
        assert r.n_emails == 1 and r.n_ips == 1 and r.n_phones == 1
        assert r.text_redacted == "mail <EMAIL> ip <IP> call <PHONE> done"

    def test_email_before_ip_ordering(self, spark):
        # numeric-host 'a@1.2.3.4' is NOT an email (no alpha TLD) — the
        # IP pattern gets it; a real address next to an IP redacts both
        df = _docs(spark, ["x a@1.2.3.4 y", "m bob@mail.example.com 1.2.3.4 n"])
        rows = {r.doc_id: r for r in webtext.redact_pii(df).collect()}
        assert rows[0].n_emails == 0 and rows[0].n_ips == 1
        assert rows[0].text_redacted == "x a@<IP> y"
        assert rows[1].n_emails == 1 and rows[1].n_ips == 1
        assert rows[1].text_redacted == "m <EMAIL> <IP> n"

    def test_clean_text_untouched(self, spark):
        df = _docs(spark, ["nothing sensitive here at all"])
        [r] = webtext.redact_pii(df).collect()
        assert (r.n_emails, r.n_ips, r.n_phones) == (0, 0, 0)
        assert r.text_redacted == "nothing sensitive here at all"

    def test_shuffle_free_plan(self, spark):
        df = _docs(spark, ["a"])
        plan = webtext.redact_pii(df)._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan


class TestCorpusTokenStats:
    def test_accounting(self, spark):
        df = spark.createDataFrame(
            [
                Row(doc_id=0, text="a b c", source="s0"),
                Row(doc_id=1, text="d e", source="s0"),
                Row(doc_id=2, text="", source="s1"),
            ]
        )
        rows = {r.source: r for r in webtext.corpus_token_stats(df).collect()}
        assert rows["s0"].n_docs == 2
        assert rows["s0"].total_tokens == 5
        assert rows["s0"].min_tokens == 2 and rows["s0"].max_tokens == 3
        assert rows["s0"].avg_tokens == 2.5
        assert rows["s1"].total_tokens == 0


class TestUnigramLm:
    def test_common_words_score_lower(self, spark):
        df = _docs(spark, [
            "the the the the the the the the",   # all top-vocab
            "qqxzj wvbnk zzyxw qpfjm llorp kkttg mmnnv ccddz",  # all rare
        ])
        rows = {r.doc_id: r for r in webtext.unigram_lm_score(df, vocab_size=1).collect()}
        assert rows[0].lm_score < rows[1].lm_score
        assert rows[0].n_words == 8 and rows[1].n_words == 8

    def test_exact_value_single_word(self, spark):
        # corpus = one doc 'a a': p(a) = 2/2 = 1 -> -log10(1) = 0
        [r] = webtext.unigram_lm_score(_docs(spark, ["a a"]), vocab_size=5).collect()
        assert r.lm_score == 0.0

    def test_oov_smoothing(self, spark):
        # vocab_size=1 keeps only 'a' (3 occurrences); 'b' is OOV:
        # total=4, score_doc1 = -(log10(3/4)*? ) doc 'a a a b':
        # lp(a)=log10(3/4), lp(b)=log10(0.5/4)
        import math
        [r] = webtext.unigram_lm_score(_docs(spark, ["a a a b"]), vocab_size=1).collect()
        expect = -(3 * math.log10(3 / 4) + math.log10(0.5 / 4)) / 4
        assert r.lm_score == pytest.approx(expect, abs=1e-6)


class TestStratifiedSample:
    def _src_docs(self, spark, n=400):
        return spark.createDataFrame(
            [Row(doc_id=i, source=f"s{i % 2}") for i in range(n)]
        )

    def test_rates_respected(self, spark):
        df = self._src_docs(spark)
        out = webtext.stratified_sample(df, {"s0": 1.0, "s1": 0.25})
        counts = {r.source: r.n for r in out.groupBy("source").agg(F.count("*").alias("n")).collect()}
        assert counts["s0"] == 200  # rate 1.0 keeps everything
        assert 20 < counts.get("s1", 0) < 80  # ~50 of 200 at 0.25

    def test_deterministic_and_nested(self, spark):
        df = self._src_docs(spark)
        a = {r.doc_id for r in webtext.stratified_sample(df, {"s0": 0.5, "s1": 0.5}).collect()}
        b = {r.doc_id for r in webtext.stratified_sample(df, {"s0": 0.5, "s1": 0.5}).collect()}
        assert a == b
        # lower rate selects a subset of the higher rate's sample (same seed)
        c = {r.doc_id for r in webtext.stratified_sample(df, {"s0": 0.25, "s1": 0.25}).collect()}
        assert c <= a

    def test_default_rate_drops_unlisted(self, spark):
        df = self._src_docs(spark)
        out = webtext.stratified_sample(df, {"s0": 1.0})
        assert out.where("source = 's1'").count() == 0
        assert out.count() == 200

    def test_no_shuffle_plan(self, spark):
        df = self._src_docs(spark)
        plan = webtext.stratified_sample(df, {"s0": 0.5})._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan


class TestPackSequences:
    def test_contiguous_stream_chunking(self, spark):
        df = spark.createDataFrame([
            Row(doc_id=0, source="s", text="a b c"),          # tokens 0-2
            Row(doc_id=1, source="s", text="d e f g"),        # tokens 3-6
            Row(doc_id=2, source="s", text="h i"),            # tokens 7-8
        ])
        rows = {r.doc_id: r for r in webtext.pack_sequences(df, window=4).collect()}
        assert rows[0].start_offset == 0 and rows[0].seq_id == 0 and rows[0].seq_count == 1
        # doc 1 spans tokens 3..6 -> sequences 0 and 1
        assert rows[1].start_offset == 3 and rows[1].seq_id == 0 and rows[1].seq_count == 2
        # doc 2 occupies tokens 7-8: straddles sequences 1 and 2
        assert rows[2].start_offset == 7 and rows[2].seq_id == 1 and rows[2].seq_count == 2

    def test_shards_pack_independently(self, spark):
        df = spark.createDataFrame([
            Row(doc_id=0, source="a", text="x y z"),
            Row(doc_id=1, source="b", text="p q r"),
        ])
        rows = {r.source: r for r in webtext.pack_sequences(df, window=8).collect()}
        assert rows["a"].start_offset == 0 and rows["b"].start_offset == 0

    def test_empty_doc_occupies_no_tokens_but_places(self, spark):
        df = spark.createDataFrame([
            Row(doc_id=0, source="s", text="a b"),
            Row(doc_id=1, source="s", text=""),
            Row(doc_id=2, source="s", text="c"),
        ])
        rows = {r.doc_id: r for r in webtext.pack_sequences(df, window=4).collect()}
        assert rows[1].n_tokens == 0 and rows[1].start_offset == 2 and rows[1].seq_count == 1
        assert rows[2].start_offset == 2


class TestDuplicateSpans:
    def test_within_doc_repeat(self, spark):
        # "a b c d e" occurs at word pos 0 and 6 -> two disjoint spans
        df = _docs(spark, ["a b c d e x a b c d e"])
        rows = sorted(
            webtext.duplicate_spans(df, n=5, min_count=2).collect(),
            key=lambda r: r.start_token,
        )
        assert [(r.start_token, r.end_token, r.n_grams) for r in rows] == [
            (0, 4, 1),
            (6, 10, 1),
        ]

    def test_cross_doc_repeat_merges_overlaps(self, spark):
        # both docs identical: every 5-gram occurs twice corpus-wide;
        # the two overlapping grams per doc merge into one span [0, 5]
        df = _docs(spark, ["p q r s t u", "p q r s t u"])
        rows = webtext.duplicate_spans(df, n=5, min_count=2).collect()
        assert len(rows) == 2
        for r in rows:
            assert (r.start_token, r.end_token, r.n_grams) == (0, 5, 2)

    def test_unique_corpus_emits_no_rows(self, spark):
        df = _docs(spark, ["one two three four five six", "a b c d e f"])
        assert webtext.duplicate_spans(df, n=5, min_count=2).count() == 0

    def test_portable_hash_twin_matches(self, spark):
        df = _docs(spark, ["a b c d e x a b c d e", "p q r s t", "p q r s t"])
        fast = sorted(map(tuple, webtext.duplicate_spans(df, n=5).collect()))
        portable = sorted(
            map(tuple, webtext.duplicate_spans(df, n=5, portable_hash=True).collect())
        )
        assert fast == portable

    def test_no_cartesian_in_plan(self, spark):
        df = _docs(spark, ["a b c d e f"])
        plan = webtext.duplicate_spans(df, n=5)._jdf.queryExecution().executedPlan().toString()
        assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan


class TestNbQualityClassifier:
    def test_hand_computed_llr(self, spark):
        import math

        corpus = _docs(spark, ["good good", "bad bad"])
        positives = corpus.where("doc_id = 0")
        rows = {
            r.doc_id: r
            for r in webtext.nb_quality_classifier(corpus, positives, alpha=0.5).collect()
        }
        # vocab V=2, pos_tot=2, neg_tot=4
        llr_good = math.log(2.5 / 3) - math.log(2.5 / 5)
        llr_bad = math.log(0.5 / 3) - math.log(2.5 / 5)
        assert rows[0].n_words == 2 and rows[1].n_words == 2
        assert rows[0].nb_llr == pytest.approx(round(llr_good, 6), abs=2e-6)
        assert rows[1].nb_llr == pytest.approx(round(llr_bad, 6), abs=2e-6)
        assert rows[0].is_quality and not rows[1].is_quality

    def test_oov_uses_full_vocab_smoothing(self, spark):
        import math

        # vocab truncated to 1 ("good" wins on combined count) but V
        # stays 2 — "bad" scores the OOV constant ln(a/(pos_tot+aV)) - ln(a/(neg_tot+aV))
        corpus = _docs(spark, ["good good", "bad bad"])
        positives = corpus.where("doc_id = 0")
        rows = {
            r.doc_id: r
            for r in webtext.nb_quality_classifier(
                corpus, positives, alpha=0.5, vocab_size=1
            ).collect()
        }
        oov = math.log(0.5 / 3) - math.log(0.5 / 5)
        assert rows[1].nb_llr == pytest.approx(round(oov, 6), abs=2e-6)

    def test_vocab_and_totals_broadcast(self, spark):
        corpus = _docs(spark, ["a b", "c d"])
        plan = (
            webtext.nb_quality_classifier(corpus, corpus.where("doc_id = 0"))
            ._jdf.queryExecution().executedPlan().toString()
        )
        assert "BroadcastHashJoin" in plan


class TestPerplexityBuckets:
    def test_terciles_within_language(self, spark):
        scored = spark.createDataFrame(
            [
                Row(doc_id=0, lm_score=1.0, lang="en"),
                Row(doc_id=1, lm_score=2.0, lang="en"),
                Row(doc_id=2, lm_score=3.0, lang="en"),
                Row(doc_id=3, lm_score=9.0, lang="fr"),
                Row(doc_id=4, lm_score=1.0, lang="fr"),
            ]
        )
        rows = {r.doc_id: r.bucket for r in webtext.perplexity_buckets(scored).collect()}
        assert rows[0] == "head" and rows[1] == "middle" and rows[2] == "tail"
        # 2-doc language: ntile(3) fills head then middle
        assert rows[4] == "head" and rows[3] == "middle"

    def test_score_ties_break_by_id(self, spark):
        scored = spark.createDataFrame(
            [Row(doc_id=i, lm_score=5.0, lang="en") for i in range(3)]
        )
        rows = {r.doc_id: r.bucket for r in webtext.perplexity_buckets(scored).collect()}
        assert rows == {0: "head", 1: "middle", 2: "tail"}


class TestLeakageSafeSplits:
    def test_exact_dups_share_split_and_rep(self, spark):
        df = spark.createDataFrame(
            [
                Row(doc_id=0, text="Same Text"),
                Row(doc_id=1, text="  same text  "),
                Row(doc_id=2, text="different entirely"),
            ]
        )
        rows = {r.doc_id: r for r in webtext.leakage_safe_splits(df).collect()}
        assert rows[0].cluster_rep == 0 and rows[1].cluster_rep == 0
        assert rows[0].split == rows[1].split
        assert rows[2].cluster_rep == 2

    def test_degenerate_weights_and_determinism(self, spark):
        df = _docs(spark, [f"doc number {i}" for i in range(8)])
        all_train = webtext.leakage_safe_splits(df, weights=(1.0, 0.0, 0.0)).collect()
        assert {r.split for r in all_train} == {"train"}
        a = sorted(map(tuple, webtext.leakage_safe_splits(df).collect()))
        b = sorted(map(tuple, webtext.leakage_safe_splits(df).collect()))
        assert a == b

    def test_split_names_cover_weights(self, spark):
        df = _docs(spark, [f"text {i} {i * 7}" for i in range(64)])
        got = webtext.leakage_safe_splits(df, weights=(0.5, 0.25, 0.25)).select("split")
        assert {r.split for r in got.collect()} <= {"train", "validation", "test"}


class TestGopherQualityFlags:
    def test_clean_doc_passes(self, spark):
        text = "the cat sat to be of and that have with " + "word " * 60
        [r] = webtext.gopher_quality_flags(_docs(spark, [text])).collect()
        assert r.passes_gopher
        assert r.n_required_stopwords == 8 and r.alpha_word_frac == 1.0

    def test_bullet_and_ellipsis_lines(self, spark):
        bullets = "\n".join("• item" for _ in range(10))
        [r] = webtext.gopher_quality_flags(_docs(spark, [bullets])).collect()
        assert r.bullet_line_frac == 1.0 and not r.flag_bullet_lines
        dots = "\n".join("trailing thing..." for _ in range(10))
        [r] = webtext.gopher_quality_flags(_docs(spark, [dots])).collect()
        assert r.ellipsis_line_frac == 1.0 and not r.flag_ellipsis_lines

    def test_symbol_soup_and_digit_words(self, spark):
        [r] = webtext.gopher_quality_flags(_docs(spark, ["# # # word"])).collect()
        assert r.symbol_word_ratio == 0.75 and not r.flag_symbol_ratio
        [r] = webtext.gopher_quality_flags(_docs(spark, ["1 2 3 4 5"])).collect()
        assert r.alpha_word_frac == 0.0 and not r.flag_alpha_words

    def test_word_count_bounds_and_empty(self, spark):
        [r] = webtext.gopher_quality_flags(_docs(spark, ["short doc"])).collect()
        assert r.n_words == 2 and not r.flag_word_count
        [r] = webtext.gopher_quality_flags(_docs(spark, [""])).collect()
        assert r.n_words == 0 and not r.passes_gopher

    def test_mean_word_length_rule(self, spark):
        # 100 one-char words -> mean 1.0, outside [3, 10]
        [r] = webtext.gopher_quality_flags(_docs(spark, ["a " * 100])).collect()
        assert r.mean_word_len == 1.0 and not r.flag_mean_word_len

    def test_shuffle_free_plan(self, spark):
        plan = (
            webtext.gopher_quality_flags(_docs(spark, ["x"]))
            ._jdf.queryExecution().executedPlan().toString()
        )
        assert "Exchange" not in plan


class TestC4QualityFlags:
    def test_line_filtering(self, spark):
        text = "\n".join([
            "this line ends with a period and enough words.",
            "no terminal punctuation so dropped entirely",
            "short line.",
            "a javascript mention drops this line outright.",
            'a quoted ending line with plenty of words here."',
        ])
        [r] = webtext.c4_quality_flags(_docs(spark, [text])).collect()
        assert r.n_lines == 5 and r.n_kept_lines == 2
        assert r.text_clean.splitlines() == [
            "this line ends with a period and enough words.",
            'a quoted ending line with plenty of words here."',
        ]

    def test_page_level_drops(self, spark):
        good = "one good sentence here today. another fine sentence follows it. "\
               "and a third one closes the doc."
        rows = {
            r.doc_id: r
            for r in webtext.c4_quality_flags(
                _docs(spark, [
                    good,
                    good + "\nlorem ipsum dolor sit amet is boilerplate filler.",
                    good + "\nthis code sample has a brace { in it somewhere.",
                    good.replace("another", "porn"),
                    "too few words here.",
                ])
            ).collect()
        }
        assert rows[0].passes_c4
        assert rows[1].has_lorem_ipsum and not rows[1].passes_c4
        assert rows[2].has_curly_brace and not rows[2].passes_c4
        assert rows[3].has_badword and not rows[3].passes_c4
        # page with < 3 surviving sentences fails
        assert rows[4].n_sentences < 3 and not rows[4].passes_c4

    def test_badword_is_word_aligned(self, spark):
        # 'xxxl' must NOT match the badword 'xxx'
        text = "a shirt sized xxxl is mentioned in this sentence here. " \
               "second sentence is fine too. third one closes it."
        [r] = webtext.c4_quality_flags(_docs(spark, [text])).collect()
        assert not r.has_badword and r.passes_c4

    def test_empty_and_shuffle_free(self, spark):
        [r] = webtext.c4_quality_flags(_docs(spark, [""])).collect()
        assert r.n_kept_lines == 0 and r.text_clean == "" and not r.passes_c4
        plan = (
            webtext.c4_quality_flags(_docs(spark, ["x"]))
            ._jdf.queryExecution().executedPlan().toString()
        )
        assert "Exchange" not in plan


class TestGatePredicates:
    def test_predicates_match_flag_columns(self, spark):
        texts = [
            "the cat sat to be of and that have with " + "word " * 60,
            "• one\n• two",
            "",
            "one good sentence sits here today. another fine one follows. "
            "and a third closes it.",
            "function() { return 1; }",
        ]
        df = _docs(spark, texts)
        g = df.select(
            "doc_id", webtext.gopher_passes("text").alias("p")
        ).join(webtext.gopher_quality_flags(df).select("doc_id", "passes_gopher"), "doc_id")
        assert g.where("p <> passes_gopher").count() == 0
        c = df.select(
            "doc_id", webtext.c4_passes("text").alias("p")
        ).join(webtext.c4_quality_flags(df).select("doc_id", "passes_c4"), "doc_id")
        assert c.where("p <> passes_c4").count() == 0

    def test_curate_applies_named_gates(self, spark):
        from hydra_spark.ml.pipeline import curate

        good = ("the cat sat to be of and that have with plenty more words. "
                "a second real sentence follows it for the count. "
                + ("word " * 50).strip() + " and a third one closes it.")
        df = _docs(spark, [good, good + " lorem ipsum filler appended."])
        base = {r.doc_id for r in curate(df, min_quality=0.0).collect()}
        got = {
            r.doc_id
            for r in curate(df, min_quality=0.0, gopher_rules=True, c4_rules=True).collect()
        }
        assert base == {0, 1}
        # gates keep the clean doc, drop the lorem-ipsum one
        assert got == {0}


class TestDomainMix:
    def _corpus(self, spark):
        rows = []
        # head domain 10x the tail's token mass
        for i in range(100):
            rows.append((i, "head", "w " * 100))
        for i in range(100, 110):
            rows.append((i, "tail", "w " * 100))
        rows.append((999, "empty", "   "))
        return spark.createDataFrame(rows, "doc_id long, source string, text string")

    def test_budget_and_flattening(self, spark):
        from hydra_spark.ml.webtext import domain_mix

        df = self._corpus(spark)
        # alpha=1: proportional -> every non-empty domain gets the same rate
        out1 = domain_mix(df, budget_tokens=5500, alpha=1.0)
        rates = {r.source: r.keep_rate for r in out1.select("source", "keep_rate").distinct().collect()}
        assert abs(rates["head"] - 0.5) < 1e-9 and abs(rates["tail"] - 0.5) < 1e-9
        # alpha=0: equal share per domain -> tail saturates at 1.0, head downsampled
        out0 = domain_mix(df, budget_tokens=5500, alpha=0.0)
        r0 = {r.source: r.keep_rate for r in out0.select("source", "keep_rate").distinct().collect()}
        assert r0.get("tail") == 1.0
        assert r0["head"] < 0.5
        # empty domain never appears
        assert out0.where("source = 'empty'").count() == 0

    def test_sampled_token_mass_near_budget(self, spark):
        from pyspark.sql import functions as F

        from hydra_spark.ml.webtext import domain_mix

        df = self._corpus(spark)
        got = domain_mix(df, budget_tokens=5500, alpha=0.7).agg(F.sum("n_tokens")).first()[0]
        assert 0.6 * 5500 <= got <= 1.4 * 5500  # 110 docs -> coarse but centered

    def test_budget_above_corpus_keeps_everything(self, spark):
        from hydra_spark.ml.webtext import domain_mix

        df = self._corpus(spark)
        out = domain_mix(df, budget_tokens=10**9)
        assert out.count() == 110
        assert {r.keep_rate for r in out.select("keep_rate").distinct().collect()} == {1.0}

    def test_deterministic_across_partitionings(self, spark):
        from hydra_spark.ml.webtext import domain_mix

        df = self._corpus(spark)
        a = sorted(r.doc_id for r in domain_mix(df.repartition(1), 5500).collect())
        b = sorted(r.doc_id for r in domain_mix(df.repartition(16), 5500).collect())
        assert a == b

    def test_corpus_side_never_shuffles(self, spark):
        """Plan gate: the only exchange is the tiny per-domain aggregate;
        the corpus joins the broadcast rate table and filters in place."""
        from hydra_spark.ml.webtext import domain_mix

        df = self._corpus(spark)
        plan = domain_mix(df, 5500)._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastHashJoin" in plan
        assert "SortMergeJoin" not in plan


class TestExactStratifiedSample:
    def _corpus(self, spark):
        rows = [(i, f"src{i % 3}") for i in range(90)] + [(1000, "tiny")]
        return spark.createDataFrame(rows, "doc_id long, source string")

    def test_exact_counts_and_small_strata(self, spark):
        from hydra_spark.ml.webtext import exact_stratified_sample

        out = exact_stratified_sample(self._corpus(spark), 10).groupBy("source").count()
        got = {r.source: r["count"] for r in out.collect()}
        assert got == {"src0": 10, "src1": 10, "src2": 10, "tiny": 1}

    def test_prefix_property_and_determinism(self, spark):
        from hydra_spark.ml.webtext import exact_stratified_sample

        df = self._corpus(spark)
        small = {r.doc_id for r in exact_stratified_sample(df.repartition(13), 5).collect()}
        big = {r.doc_id for r in exact_stratified_sample(df.repartition(2), 10).collect()}
        assert small < big  # nested: the 5-sample is a strict prefix of the 10-sample

    def test_plan_uses_window_group_limit(self, spark):
        from hydra_spark.ml.webtext import exact_stratified_sample

        plan = (
            exact_stratified_sample(self._corpus(spark), 10)
            ._jdf.queryExecution().executedPlan().toString()
        )
        assert "WindowGroupLimit" in plan


class TestBigramLM:
    def test_order_sensitivity_and_backoff(self, spark):
        from hydra_spark.ml.webtext import bigram_lm_score

        fluent = "the cat sat on the mat"
        rows = [(i, fluent) for i in range(10)]
        rows.append((100, "mat the on sat cat the"))  # same words, unseen order
        rows.append((200, "solo",))                   # <2 words -> not scored
        df = spark.createDataFrame(rows, "doc_id long, text string")
        got = {r.doc_id: r for r in bigram_lm_score(df, vocab_size=1000).collect()}
        assert 200 not in got
        assert got[0].n_bigrams == 5
        # the attested order scores strictly better (lower) than the shuffle
        assert got[0].lm2_score < got[100].lm2_score
        # all copies of the fluent doc score identically
        assert len({got[i].lm2_score for i in range(10)}) == 1

    def test_deterministic_across_partitionings(self, spark):
        from hydra_spark.ml.webtext import bigram_lm_score

        rows = [(i, f"w{i % 5} w{(i + 1) % 7} w{i % 3} end") for i in range(40)]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        a = sorted(map(tuple, bigram_lm_score(df.repartition(1)).collect()))
        b = sorted(map(tuple, bigram_lm_score(df.repartition(16)).collect()))
        assert a == b

    def test_conditional_prob_clamped_when_prev_misses_vocab(self, spark):
        from hydra_spark.ml.webtext import bigram_lm_score

        # bigram (x,y) survives the top-2 bigram cut while unigram 'x'
        # misses the top-2 unigram cut (a,b dominate): cnt_b/0.5 would
        # be 10 -> p>1 and NEGATIVE log-loss without the clamp
        rows = [(i, "x y") for i in range(5)]
        rows += [(10 + i, "a b a b a b") for i in range(3)]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        got = {r.doc_id: r for r in bigram_lm_score(df, vocab_size=2).collect()}
        assert all(r.lm2_score >= 0 for r in got.values())


class TestPmiCollocations:
    def test_collocation_beats_frequent_pair(self, spark):
        from hydra_spark.ml.webtext import pmi_collocations

        # "san francisco" always co-occurs; "the cat" words are common
        # individually but rarely adjacent -> PMI ranks the collocation
        # first even though both pairs have the same raw count
        rows = []
        for i in range(10):
            rows.append((i, "san francisco is great"))
            rows.append((100 + i, "the cat and the dog and the bird"))
        df = spark.createDataFrame(rows, "doc_id long, text string")
        got = pmi_collocations(df, k=10, min_count=3).collect()
        pair_pmi = {(r.prev, r.w): r.pmi for r in got}
        # the perfect collocation ties the top PMI ("francisco is" is
        # equally exclusive in this corpus) and beats the frequent-but-
        # promiscuous "the cat"
        assert pair_pmi[("san", "francisco")] == got[0].pmi
        assert pair_pmi[("san", "francisco")] > pair_pmi[("the", "cat")]

    def test_min_count_drops_hapax(self, spark):
        from hydra_spark.ml.webtext import pmi_collocations

        df = spark.createDataFrame(
            [(1, "rare pair"), (2, "common words common words common words")],
            "doc_id long, text string",
        )
        got = {(r.prev, r.w) for r in pmi_collocations(df, k=10, min_count=2).collect()}
        assert ("rare", "pair") not in got
        assert ("common", "words") in got

"""End-to-end webtext pipeline: crawl rounds → extracted text → corpus
curation (repetition stats, corpus-level chunk dedup, LM scoring,
stratified sampling). This is the full 100 TB story in miniature — the
crawl engine produces the text corpus the ml/ curation stages consume.
"""

import tempfile

import pytest
from pyspark.sql import functions as F

from hydra_spark.config import DEFAULT
from hydra_spark.crawl import run_crawl
from hydra_spark.crawl.loop import init_state
from hydra_spark.datagen import generate_frontier, generate_pages
from hydra_spark.ml import webtext
from hydra_spark.ml.pipeline import curate
from hydra_spark.storage import StateStore


@pytest.fixture(scope="module")
def crawled_texts(spark):
    pages = generate_pages(spark, 800, n_hosts=15).cache()
    store = StateStore(tempfile.mkdtemp(prefix="hydra_e2e_"))
    init_state(store, generate_frontier(spark, pages))
    run_crawl(spark, store, pages, DEFAULT.with_(batch_size=300), rounds=2)
    texts = (
        store.texts.read(spark)
        .where(F.col("text").isNotNull() & (F.trim("text") != ""))
        .select(F.col("resource_id").alias("doc_id"), "url", "text")
    )
    texts.cache().count()
    return texts


def test_crawl_produces_curatable_corpus(crawled_texts):
    assert crawled_texts.count() > 300


def test_repetition_over_crawled_text(crawled_texts):
    rep = webtext.repetition_features(crawled_texts, k=2)
    rows = rep.agg(
        F.count("*").alias("n"),
        F.min("dup_chunk_frac").alias("lo"),
        F.max("dup_chunk_frac").alias("hi"),
    ).first()
    assert rows.n == crawled_texts.count()
    assert 0.0 <= rows.lo <= rows.hi <= 1.0


def test_chunk_dedup_over_crawled_text(crawled_texts):
    dd = webtext.chunk_dedup_corpus(crawled_texts, k=4)
    agg = dd.agg(F.sum("n_removed").alias("rm"), F.count("*").alias("n")).first()
    assert agg.n == crawled_texts.count()  # every doc accounted for
    # synthetic pages share grammar boilerplate -> some chunks dedup away
    assert agg.rm > 0


def test_lm_scoring_and_sampling_over_crawled_text(crawled_texts):
    scored = webtext.unigram_lm_score(crawled_texts, vocab_size=50)
    assert scored.where("lm_score < 0").count() == 0
    hosts = crawled_texts.withColumn(
        "host", F.regexp_extract("url", r"://([^/]+)/", 1)
    )
    some_host = hosts.select("host").first().host
    sampled = webtext.stratified_sample(
        hosts, {some_host: 1.0}, strata_col="host", key_col="doc_id"
    )
    assert sampled.count() == hosts.where(F.col("host") == some_host).count()


def test_full_curation_funnel_over_crawled_text(crawled_texts):
    # crawled page text is extractor output (csv rows / html bodies), not
    # natural language — keep 'unknown' in the language gate and let the
    # quality gate + exact dedup do the filtering
    kept = curate(
        crawled_texts, min_quality=0.0, languages=("en", "fr", "unknown")
    )
    n_in, n_out = crawled_texts.count(), kept.count()
    assert 0 < n_out <= n_in
    # dedup is the only gate left at these settings: survivors must be
    # distinct by normalized content
    from hydra_spark.ml.dedup import normalized

    assert kept.select(F.md5(normalized("text"))).distinct().count() == n_out

"""Per-operator iteration harness (NOT the frozen driver bench).

Mirrors bench.py's hot-query set so individual operators can be timed
(min of N noop-forced runs, guide §1.4) and their formatted plans dumped
without running the whole suite. Usage:

  python bench_ops.py [--plans DIR_SUFFIX] [--reps N] [query ...]

Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1), SPARK_GRAFT_CPUS.
"""

from __future__ import annotations

import json
import os
import sys
import time


def main() -> None:
    args = [a for a in sys.argv[1:]]
    plans_suffix = None
    reps = 3
    if "--plans" in args:
        i = args.index("--plans")
        plans_suffix = args[i + 1]
        del args[i : i + 2]
    if "--reps" in args:
        i = args.index("--reps")
        reps = int(args[i + 1])
        del args[i : i + 2]
    only = set(args)

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from hydra_spark.session import get_spark

    extra = {
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "8m",
        "spark.driver.memory": os.environ.get("HYDRA_SPARK_DRIVER_MEM", "32g"),
        "spark.driver.extraJavaOptions": "-Djava.net.preferIPv4Stack=true -XX:+UseParallelGC",
    }
    if os.path.isdir("/dev/shm"):
        os.makedirs("/dev/shm/spark-local", exist_ok=True)
        extra["spark.local.dir"] = "/dev/shm/spark-local"
    spark = get_spark(cores=cpus, shuffle_partitions=max(cpus * 2, 8), app="hydra_bench_ops", extra=extra)

    import __spark_entry__ as entry
    from pyspark.sql import functions as F

    from hydra_spark.ml import dedup, similarity, sketch
    from hydra_spark.ml import text as mltext
    from hydra_spark.ml import webtext

    q = entry.queries()
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").select("vec_id", "embedding")
    emb_q = emb.where("vec_id < 3").selectExpr("vec_id AS query_id", "embedding")

    import shutil as _sh
    import tempfile as _tf

    pairs_dir = _tf.mkdtemp(prefix="hydra_ops_pairs_") + "/pairs"
    dedup.minhash_lsh_candidates(docs, k=16, bands=4).write.parquet(pairs_dir)
    pairs = spark.read.parquet(pairs_dir)

    hot = {
        "fingerprint": lambda: docs.select(mltext.fingerprint("text").alias("fp")),
        "minhash_pairs": lambda: dedup.minhash_lsh_candidates(docs, k=16, bands=4),
        "simhash": lambda: dedup.simhash(docs).select("doc_id", "simhash"),
        "jaccard_verify": lambda: dedup.jaccard_verify(docs, pairs, ngram=3),
        "minhash_dedup_cc": lambda: dedup.connected_components(pairs),
        "keep_best": lambda: dedup.keep_best_per_cluster(
            docs.select("doc_id", F.length("text").cast("double").alias("score")), pairs
        ),
        "repetition_stats": lambda: webtext.repetition_features(docs, k=2),
        "line_dedup": lambda: webtext.chunk_dedup_corpus(docs, k=4),
        "decontaminate": lambda: webtext.decontaminate(
            docs.where("source <> 'src0'"), docs.where("source = 'src0'"), n=4
        ),
        "decontaminate_spans": lambda: webtext.decontaminate_spans(
            docs.where("source <> 'src0'"), docs.where("source = 'src0'"), n=4
        ),
        "unigram_lm": lambda: webtext.unigram_lm_score(docs, vocab_size=20),
        "bigram_lm": lambda: webtext.bigram_lm_score(docs, vocab_size=20),
        "pmi": lambda: webtext.pmi_collocations(docs, k=20, min_count=5),
        "redact_pii": lambda: webtext.redact_pii(docs),
        "corpus_token_stats": lambda: webtext.corpus_token_stats(docs),
        "pack_sequences": lambda: webtext.pack_sequences(docs, window=64),
        "token_topk": lambda: sketch.token_heavy_hitters(docs, k=50, capacity=400),
        "domain_mix": lambda: webtext.domain_mix(docs, budget_tokens=500_000, alpha=0.7),
        "exact_sample": lambda: webtext.exact_stratified_sample(
            docs.select("doc_id", "source"), 500
        ),
        "stratified_sample": lambda: webtext.stratified_sample(
            docs.select("doc_id", "source"),
            {f"src{i}": [1.0, 0.5, 0.25, 0.125][i % 4] for i in range(20)},
        ),
        "ann_topk": lambda: similarity.ann_topk(emb, emb_q, k=5, n_planes=8, probes=2, tables=4),
        "ivf_topk": lambda: similarity.ivf_topk(emb, emb_q, k=5, n_clusters=16, n_probe=4),
        "embedding_near_dups": lambda: dedup.embedding_near_dups(emb, n_planes=12, max_bucket=200),
        "duplicate_spans": lambda: webtext.duplicate_spans(docs, n=5, min_count=2),
        "gopher_quality": lambda: webtext.gopher_quality_flags(docs),
        "c4_quality": lambda: webtext.c4_quality_flags(docs),
        "quality_classifier": lambda: webtext.nb_quality_classifier(docs, docs.where("lang = 'en'")),
        "leakage_splits": lambda: webtext.leakage_safe_splits(docs),
        "snapshot_diff": lambda: dedup.snapshot_diff(
            docs.where("doc_id % 11 != 0"), docs.where("doc_id % 7 != 0")
        ),
        "incremental_dedup": lambda: dedup.incremental_dedup(
            docs.where("source <> 'src0'"),
            docs.where("source = 'src0'").select(F.md5(dedup.normalized("text")).alias("digest")),
        ),
        "html_extract": lambda: q["html_extract"](spark, sf_dir),
        "url_filter": lambda: q["url_filter"](spark, sf_dir),
        "link_extract": lambda: q["link_extract"](spark, sf_dir),
        "url_templates": lambda: q["url_templates"](spark, sf_dir),
        "sessionize": lambda: q["sessionize"](spark, sf_dir),
        "robots_rfc": lambda: q["robots_rfc"](spark, sf_dir),
        "adaptive_recrawl": lambda: q["adaptive_recrawl"](spark, sf_dir),
        "anchor_score": lambda: q["anchor_score"](spark, sf_dir),
        "warc_parse": lambda: q["warc_parse"](spark, sf_dir),
        "warc_dedup": lambda: q["warc_dedup"](spark, sf_dir),
        "soft404": lambda: q["soft404"](spark, sf_dir),
        "conditional_fetch": lambda: q["conditional_fetch"](spark, sf_dir),
        "link_stats": lambda: q["link_stats"](spark, sf_dir),
        "mirror_detect": lambda: q["mirror_detect"](spark, sf_dir),
        "bloom_seen": lambda: q["bloom_seen"](spark, sf_dir),
        "cosine_topk": lambda: q["cosine_topk"](spark, sf_dir),
        "langid": lambda: q["langid"](spark, sf_dir),
        "token_quality": lambda: q["token_quality"](spark, sf_dir),
        "multimodal_features": lambda: q["multimodal_features"](spark, sf_dir),
        "latest_check": lambda: q["latest_check"](spark, sf_dir),
        "exact_dedup": lambda: q["exact_dedup"](spark, sf_dir),
    }

    names = [n for n in hot if not only or n in only]

    def force(df):
        df.write.format("noop").mode("overwrite").save()

    def plan_of(df) -> str:
        mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
        return df._jdf.queryExecution().explainString(mode)

    out = {}
    for name in names:
        fn = hot[name]
        if plans_suffix:
            os.makedirs("plans/r06", exist_ok=True)
            with open(f"plans/r06/{name}_{plans_suffix}.txt", "w") as f:
                f.write(plan_of(fn()))
        samples = []
        for _ in range(reps):
            spark.sparkContext.setJobDescription(name)
            t0 = time.time()
            force(fn())
            samples.append(round(time.time() - t0, 3))
            spark.sparkContext.setJobDescription(None)
        out[name] = {"min": min(samples), "samples": samples}
        print(json.dumps({name: out[name]}), flush=True)

    print(json.dumps({"metric": "ops", "sf_dir": sf_dir, "cpus": cpus, "results": out}))
    _sh.rmtree(os.path.dirname(pairs_dir), ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()

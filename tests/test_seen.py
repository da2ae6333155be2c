"""URL-seen set: sharded Bloom + cuckoo filters (north rule)."""

from pyspark.sql import functions as F

from hydra_spark.seen import BloomSeenSet, CuckooSeenSet


def _urls(spark, start, n, prefix="https://h{}.example.com/p/{}"):
    return spark.range(start, start + n).select(
        F.concat(
            F.lit("https://h"), (F.col("id") % 37).cast("string"),
            F.lit(".example.com/p/"), F.col("id").cast("string"),
        ).alias("url")
    )


def test_bloom_no_false_negatives(spark):
    seen = BloomSeenSet(n_shards=8, fpp=0.01)
    urls = _urls(spark, 0, 5000)
    shards = seen.build(urls).cache()
    assert shards.count() == 8
    res = seen.check(urls, shards)
    assert res.where("not seen").count() == 0  # bloom guarantee


def test_bloom_fpp_bounded(spark):
    seen = BloomSeenSet(n_shards=8, fpp=0.01)
    shards = seen.build(_urls(spark, 0, 5000)).cache()
    fresh = _urls(spark, 1_000_000, 5000)
    fp = seen.check(fresh, shards).where("seen").count()
    assert fp / 5000 < 0.03  # 3× slack over target FPP


def test_bloom_canonicalization_dedupes(spark):
    seen = BloomSeenSet(n_shards=4)
    shards = seen.build(
        spark.createDataFrame([("https://Host0.EXAMPLE.com:443/p/1",)], "url string")
    )
    variant = spark.createDataFrame([("https://host0.example.com/p/1",)], "url string")
    assert seen.check(variant, shards).first()["seen"] is True


def test_bloom_incremental_update(spark):
    seen = BloomSeenSet(n_shards=8, capacity_per_shard=2000)
    shards = seen.build(_urls(spark, 0, 2000))
    shards2 = seen.update(shards, _urls(spark, 2000, 2000)).cache()
    res = seen.check(_urls(spark, 0, 4000), shards2)
    assert res.where("not seen").count() == 0
    assert shards2.agg(F.sum("n_items")).first()[0] == 4000


def test_cuckoo_insert_check_delete(spark):
    cs = CuckooSeenSet(n_shards=4)
    urls = _urls(spark, 0, 3000)
    shards = cs.build(urls).cache()
    assert cs.check(urls, shards).where("not seen").count() == 0
    # false positives bounded (16-bit fingerprints → ~per-mille)
    fresh = _urls(spark, 500_000, 3000)
    assert cs.check(fresh, shards).where("seen").count() / 3000 < 0.01
    # delete the first 1000 and recheck
    gone = _urls(spark, 0, 1000)
    shards2 = cs.delete(shards, gone).cache()
    assert cs.check(gone, shards2).where("seen").count() < 20  # fp-level residue
    kept = _urls(spark, 1000, 2000)
    assert cs.check(kept, shards2).where("not seen").count() == 0

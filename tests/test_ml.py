"""Training-data ops: text analysis, dedup family, similarity, multimodal."""

import pytest
from pyspark.sql import functions as F

from hydra_spark.ml import dedup, similarity, text
from hydra_spark.ml.multimodal import extract_features, sample_frames, synthetic_assets

DOCS = "/root/testdata/sf0.001/documents.parquet"
EMB = "/root/testdata/sf0.001/embeddings.parquet"


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(DOCS).cache()


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(EMB).cache()


# ---- text -----------------------------------------------------------------

def test_language_id(spark):
    df = spark.createDataFrame(
        [(1, "the cat is in the house and it is warm"),
         (2, "le chat est dans la maison et il est content"),
         (3, "xyzzy 12345 @@@@")],
        "id long, text string",
    )
    got = {r["id"]: r["lang"] for r in df.select("id", text.language_id("text").alias("lang")).collect()}
    assert got == {1: "en", 2: "fr", 3: "unknown"}


def test_token_counts(spark):
    df = spark.createDataFrame([(1, "hello, world! 42"), (2, ""), (3, "  a  b  ")], "id long, text string")
    rows = {r["id"]: (r["tc"], r["bpe"]) for r in df.select(
        "id", text.token_count("text").alias("tc"), text.bpe_ish_token_count("text").alias("bpe")
    ).collect()}
    assert rows[1] == (3, 5)  # hello , world ! 42 → 5 bpe-ish pieces
    assert rows[2] == (0, 0)
    assert rows[3][0] == 2


def test_quality_and_fingerprint(spark, docs):
    rep = text.text_report(docs.limit(50))
    rows = rep.collect()
    assert all(0.0 <= r["quality_score"] <= 1.0 for r in rows)
    # identical text → identical fingerprint
    df = spark.createDataFrame([(1, "a b c d e f g"), (2, "a b c d e f g")], "id long, text string")
    f = df.select(text.fingerprint("text").alias("fp")).collect()
    assert f[0]["fp"] == f[1]["fp"]


# ---- dedup ------------------------------------------------------------------

def test_exact_dedup(spark):
    df = spark.createDataFrame(
        [(1, "Hello  World"), (2, "hello world"), (3, "unrelated text")],
        "doc_id long, text string",
    )
    kept = dedup.exact_dedup(df).select("doc_id").rdd.map(lambda r: r[0]).collect()
    assert sorted(kept) == [1, 3]  # 2 is a normalized dup of 1


def test_minhash_lsh_finds_near_dups(spark):
    # 60 distinct words, one changed → shingle-jaccard ≈ 0.9 →
    # P(≥1 of 8 bands matches) ≈ 0.9998
    base = " ".join(f"word{i}" for i in range(60))
    near = base.replace("word30", "changed")
    far = " ".join(f"other{i}" for i in range(60))
    df = spark.createDataFrame(
        [(1, base), (2, near), (3, far)], "doc_id long, text string"
    )
    pairs = dedup.minhash_lsh_candidates(df, k=32, bands=8)
    got = {(r["id_a"], r["id_b"]) for r in pairs.collect()}
    assert (1, 2) in got
    verified = dedup.jaccard_verify(df, pairs, threshold=0.5)
    vg = {(r["id_a"], r["id_b"]) for r in verified.collect()}
    assert (1, 2) in vg and (1, 3) not in vg
    deduped = dedup.minhash_dedup(df, threshold=0.5)
    assert sorted(r["doc_id"] for r in deduped.collect()) == [1, 3]


def test_simhash_near_dups(spark):
    # 1 of 80 tokens changed → hamming 2; disjoint vocab → hamming ~39
    base = " ".join(f"tok{i}" for i in range(80))
    near = base.replace("tok40 ", "changed ")
    far = " ".join(f"oth{i}" for i in range(80))
    df = spark.createDataFrame([(1, base), (2, near), (3, far)], "doc_id long, text string")
    pairs = dedup.simhash_near_dups(df, max_hamming=8)
    got = {(r["id_a"], r["id_b"]) for r in pairs.collect()}
    assert (1, 2) in got and (1, 3) not in got


def test_embedding_near_dups(spark, emb):
    # duplicate a vector with a tiny perturbation
    a = emb.limit(1).select(F.lit(100001).alias("vec_id"), "embedding")
    df = emb.select("vec_id", "embedding").unionByName(a)
    pairs = dedup.embedding_near_dups(df, threshold=0.999)
    got = {(r["id_a"], r["id_b"]) for r in pairs.collect()}
    first_id = emb.first()["vec_id"]
    assert (first_id, 100001) in got


# ---- similarity --------------------------------------------------------------

def test_cosine_topk_self_is_nearest(spark, emb):
    queries = emb.limit(3).select(F.col("vec_id").alias("query_id"), "embedding")
    res = similarity.cosine_topk(emb, queries, k=5)
    top1 = {r["query_id"]: r["neighbor_id"] for r in res.where("rank = 1").collect()}
    assert all(q == n for q, n in top1.items())


def test_ann_recall_on_clustered_data(spark):
    """LSH recall is only meaningful when neighbors exist: plant 20
    clusters of 25 vectors (intra-cluster cosine ≈ 0.95) and require
    the ANN to recover the exact top-5."""
    import numpy as np

    rng = np.random.default_rng(7)
    centers = rng.standard_normal((20, 64))
    rows = []
    for i in range(500):
        c = centers[i % 20]
        v = c + 0.15 * rng.standard_normal(64)
        rows.append((i, (v / np.linalg.norm(v)).astype(float).tolist()))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    queries = df.limit(5).select(F.col("vec_id").alias("query_id"), "embedding")
    exact = similarity.cosine_topk(df, queries, k=5)
    approx = similarity.ann_topk(df, queries, k=5, n_planes=8, probes=2, tables=4)
    e = {(r["query_id"], r["neighbor_id"]) for r in exact.collect()}
    a = {(r["query_id"], r["neighbor_id"]) for r in approx.collect()}
    assert len(e & a) / len(e) >= 0.8


def test_ann_self_recall_on_random_data(spark, emb):
    """On near-random embeddings ANN still always finds the vector
    itself (identical signature in every table)."""
    queries = emb.limit(5).select(F.col("vec_id").alias("query_id"), "embedding")
    approx = similarity.ann_topk(emb, queries, k=5, n_planes=8, probes=2, tables=4)
    top1 = {r["query_id"]: r["neighbor_id"] for r in approx.where("rank=1").collect()}
    assert all(q == n for q, n in top1.items())


# ---- multimodal ----------------------------------------------------------------

def test_multimodal_features_and_frames(spark):
    assets = synthetic_assets(spark, 30)
    feats = extract_features(assets, fake=True).collect()
    assert len(feats) == 30
    assert all(len(r["features"]) == 16 for r in feats)
    assert all(abs(sum(r["features"]) - 1.0) < 1e-5 for r in feats)
    frames = sample_frames(assets, every_ms=1000, fake=True)
    got = frames.groupBy("asset_id").count().collect()
    assert got  # videos produced frames
    meta = {r["asset_id"]: r["meta"]["duration_ms"] for r in assets.where("media_type='video'").collect()}
    for r in got:
        assert r["count"] == meta[r["asset_id"]] // 1000


def test_multimodal_real_decode_poison_to_null(spark):
    # synthetic assets carry undecodable payloads: the real path maps
    # them to NULL features instead of failing the batch
    assets = synthetic_assets(spark, 3)
    rows = extract_features(assets, fake=False).collect()
    assert len(rows) == 3
    assert all(r.features is None for r in rows)


def test_ivf_topk_on_clustered_data(spark):
    import numpy as np

    rng = np.random.default_rng(11)
    centers = rng.standard_normal((10, 64))
    rows = []
    for i in range(400):
        v = centers[i % 10] + 0.1 * rng.standard_normal(64)
        rows.append((i, (v / np.linalg.norm(v)).tolist()))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>").cache()
    queries = df.limit(4).select(F.col("vec_id").alias("query_id"), "embedding")
    exact = similarity.cosine_topk(df, queries, k=5)
    ivf = similarity.ivf_topk(df, queries, k=5, n_clusters=10, n_probe=3)
    e = {(r["query_id"], r["neighbor_id"]) for r in exact.collect()}
    a = {(r["query_id"], r["neighbor_id"]) for r in ivf.collect()}
    assert len(e & a) / len(e) >= 0.9  # tight clusters → near-exact recall
    top1 = {r["query_id"]: r["neighbor_id"] for r in ivf.where("rank=1").collect()}
    assert all(q == n for q, n in top1.items())


def test_hot_bucket_caps_bound_the_self_joins(spark):
    """Degenerate corpora (identical texts / identical embeddings) put
    everything in one LSH bucket; the caps must bound the candidate
    sets instead of going quadratic."""
    n = 300
    docs = spark.range(n).select(
        F.col("id").alias("doc_id"), F.lit("same same same text").alias("text")
    )
    pairs = dedup.simhash_near_dups(docs, max_bucket=10, log_dropped=True)
    assert pairs.count() == 0  # the single hot bucket was dropped, not joined

    emb = spark.range(n).select(
        F.col("id").alias("vec_id"),
        F.array(*[F.lit(1.0)] * 8).cast("array<float>").alias("embedding"),
    )
    near = dedup.embedding_near_dups(emb, n_planes=4, max_bucket=10, log_dropped=True)
    assert near.count() == 0

    # sanity: with the cap lifted above the corpus size they DO pair up
    small = spark.range(12).select(
        F.col("id").alias("vec_id"),
        F.array(*[F.lit(1.0)] * 8).cast("array<float>").alias("embedding"),
    )
    assert dedup.embedding_near_dups(small, n_planes=4, max_bucket=50).count() == 66


def test_ann_candidate_shuffles_exclude_vectors(spark, emb):
    """The union/dedup exchanges over ANN candidates must carry bare id
    pairs — the embedding arrays re-enter via exactly one join after
    dedup (shuffle bytes ≈ candidates × 2 vectors otherwise)."""
    queries = emb.where("vec_id < 3").select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    out = similarity.ann_topk(emb, queries, k=5, n_planes=8, probes=2, tables=4)
    plan = out._jdf.queryExecution().executedPlan().toString()
    import re

    # every candidate-side exchange before the final window: find the
    # dedup (HashAggregate over query_id+neighbor_id) exchanges and
    # assert no array column rides them
    dedup_exchanges = [
        seg for seg in plan.split("Exchange hashpartitioning")[1:]
        if seg.startswith("(query_id") or seg.startswith("(neighbor_id")
    ]
    assert dedup_exchanges, "expected id-keyed candidate exchanges in the plan"
    for seg in dedup_exchanges:
        keyspec = seg.split("\n")[0]
        assert "_cv" not in keyspec and "_qv" not in keyspec and "embedding" not in keyspec


def test_ivf_indexed_matches_brute_force_and_prunes(spark, emb, tmp_path):
    """The cluster-partitioned IVF index returns brute-force results at
    full probe, and the probe scan is PARTITION-pruned (the planner
    reads n_probe inverted lists, not a filtered full scan)."""
    path = str(tmp_path / "ivf_index")
    base = emb.select("vec_id", "embedding")
    cents = similarity.ivf_build_index(base, path, n_clusters=8)
    assert len(cents) == 8

    queries = base.where("vec_id < 3").selectExpr("vec_id AS query_id", "embedding")
    bf = {tuple(r) for r in similarity.cosine_topk(base, queries, k=5).collect()}
    full = similarity.ivf_topk_indexed(spark, path, queries, k=5, n_probe=8)
    assert {tuple(r) for r in full.collect()} == bf

    pruned = similarity.ivf_topk_indexed(spark, path, queries, k=5, n_probe=2)
    import contextlib
    import io

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        pruned.explain("formatted")
    seg = buf.getvalue().split("PartitionFilters:")
    assert len(seg) > 1, "scan must carry partition filters"
    assert "cluster" in seg[1].split("]")[0] and " IN " in seg[1].split("]")[0]
    # partial probe still finds most true neighbors on random data
    got = {(r["query_id"], r["neighbor_id"]) for r in pruned.collect()}
    truth = {(r[0], r[1]) for r in bf}
    assert len(got & truth) >= 5  # decent recall, exact set asserted above at full probe


def test_ivf_index_handle_is_cached_and_rebuild_invalidates(spark, emb, tmp_path):
    """Repeated searches reuse ONE opened handle (the centroid sidecar
    read is a fixed cost amortized per index, VERDICT r3 wrong #2); a
    rebuild at the same path invalidates the cached handle."""
    path = str(tmp_path / "ivf_cache")
    base = emb.select("vec_id", "embedding")
    similarity.ivf_build_index(base, path, n_clusters=4)
    h1 = similarity.open_ivf_index(spark, path)
    assert similarity.open_ivf_index(spark, path) is h1
    queries = base.where("vec_id < 2").selectExpr("vec_id AS query_id", "embedding")
    r1 = {tuple(r) for r in h1.topk(queries, k=3, n_probe=4).collect()}
    assert r1 == {tuple(r) for r in
                  similarity.ivf_topk_indexed(spark, path, queries, k=3, n_probe=4).collect()}
    similarity.ivf_build_index(base, path, n_clusters=4)
    assert similarity.open_ivf_index(spark, path) is not h1


def test_connected_components_paths_and_hub(spark):
    # two path graphs + an isolated pair
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (10, 11), (20, 21), (21, 22)], "id_a long, id_b long"
    )
    got = {r["id"]: r["comp"] for r in dedup.connected_components(edges).collect()}
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10, 20: 20, 21: 20, 22: 20}


def test_snapshot_diff(spark):
    old = spark.createDataFrame(
        [(1, "same"), (2, "before"), (3, "gone")], "doc_id long, text string"
    )
    new = spark.createDataFrame(
        [(1, "same"), (2, "after"), (4, "fresh")], "doc_id long, text string"
    )
    got = {r.doc_id: r for r in dedup.snapshot_diff(old, new).collect()}
    assert {i: r.status for i, r in got.items()} == {
        1: "unchanged", 2: "changed", 3: "removed", 4: "added"
    }
    assert got[4].old_digest is None and got[3].new_digest is None
    assert got[1].old_digest == got[1].new_digest


def test_heavy_hitters_exact_mode(spark):
    from hydra_spark.ml.sketch import heavy_hitters

    # zipf-ish: value i appears (20-i) times
    rows = [(f"k{i:02d}",) for i in range(20) for _ in range(20 - i)]
    df = spark.createDataFrame(rows, "key string")
    got = heavy_hitters(df.repartition(7), "key", k=3, capacity=64).collect()
    assert [(r.key, r.cnt) for r in got] == [("k00", 20), ("k01", 19), ("k02", 18)]
    # capacity covers the vocab -> exact, partitioning-independent, err floor(N/65)
    assert all(r.err_bound == sum(range(1, 21)) // 65 for r in got)
    one = heavy_hitters(df.repartition(1), "key", k=3, capacity=64).collect()
    assert [(r.key, r.cnt) for r in one] == [(r.key, r.cnt) for r in got]


def test_heavy_hitters_mg_guarantees(spark):
    """Small capacity: counts are lower bounds short by <= err_bound,
    and every key above the error threshold is reported."""
    from hydra_spark.ml.sketch import heavy_hitters

    true = {"hot": 400, "warm": 120, **{f"cold{i}": 2 for i in range(50)}}
    rows = [(key,) for key, c in true.items() for _ in range(c)]
    df = spark.createDataFrame(rows, "key string").repartition(5)
    got = {r.key: r for r in heavy_hitters(df, "key", k=10, capacity=8).collect()}
    n = sum(true.values())
    err = n // 9
    for key, r in got.items():
        assert r.err_bound == err
        assert r.cnt <= true[key]                    # never overcounts
        assert true[key] - r.cnt <= err              # bounded undercount
    # guaranteed recall above the threshold
    for key, c in true.items():
        if c > err:
            assert key in got, key


def test_heavy_hitters_non_string_key(spark):
    # the sketch emits through a `key string` Arrow schema — int keys
    # must be cast inside the pass, not die with an Arrow type error
    from hydra_spark.ml.sketch import heavy_hitters

    rows = [(i % 3,) for i in range(30)] + [(None,)]
    df = spark.createDataFrame(rows, "key int")
    got = [(r.key, r.cnt) for r in heavy_hitters(df, "key", k=2, capacity=64).collect()]
    assert got == [("0", 10), ("1", 10)]


def test_token_heavy_hitters(spark):
    from hydra_spark.ml.sketch import token_heavy_hitters

    df = spark.createDataFrame(
        [("a a a b b c",), ("  a\tb  ",), ("",), (None,)], "text string"
    )
    got = [(r.token, r.cnt) for r in token_heavy_hitters(df, k=2, capacity=64).collect()]
    assert got == [("a", 4), ("b", 3)]


def test_keep_best_per_cluster(spark):
    # path cluster {1,2,3,4}, pair {10,11}, singletons 50/51
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (10, 11)], "id_a long, id_b long"
    )
    docs = spark.createDataFrame(
        [(1, 0.2), (2, 0.9), (3, 0.9), (4, 0.1), (10, 0.0), (11, 0.5),
         (50, 0.0), (51, 0.7)],
        "doc_id long, score double",
    )
    out = dedup.keep_best_per_cluster(docs, edges)
    rows = {r.doc_id: r for r in out.collect()}
    assert len(rows) == 8
    # cluster {1..4}: 2 and 3 tie at 0.9 -> lowest id (2) survives
    kept = {i for i, r in rows.items() if r.keep}
    assert kept == {2, 11, 50, 51}
    # singletons are their own component and always keep
    assert rows[50].component == 50 and rows[51].component == 51
    assert rows[1].component == 1 and rows[4].component == 1
    assert rows[10].component == 10 and rows[11].component == 10


def test_keep_best_per_cluster_no_window_sort(spark):
    """Plan gate: argmax is an aggregate, never a corpus-wide Window."""
    edges = spark.createDataFrame([(1, 2)], "id_a long, id_b long")
    docs = spark.createDataFrame([(1, 0.5), (2, 0.6)], "doc_id long, score double")
    plan = (
        dedup.keep_best_per_cluster(docs, edges)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Window" not in plan


def test_minhash_dedup_cc_catches_hub_clusters(spark):
    """Hub cluster where the hub has the HIGHEST id: B(1)~A(3) and
    C(2)~A(3) but B!~C. Single-pass anchoring only removes id_b of each
    pair (doc 3) and wrongly keeps both 1 and 2; connected components
    keep exactly the cluster minimum."""
    base = [f"tok{i}" for i in range(80)]
    hub = " ".join(base)                                             # id 3
    b = " ".join(["CHANGED1" if t == "tok20" else t for t in base])  # ~hub: J=75/81≈0.926
    c = " ".join(["CHANGED2" if t == "tok60" else t for t in base])  # ~hub: J≈0.926
    # b vs c differ in 2 interior tokens → J=72/84≈0.857 < 0.9
    df = spark.createDataFrame([(1, b), (2, c), (3, hub)], "doc_id long, text string")

    from hydra_spark.ml.dedup import jaccard_verify, minhash_lsh_candidates

    pairs = jaccard_verify(
        df, minhash_lsh_candidates(df, k=16, bands=8), threshold=0.9
    )
    assert {(r["id_a"], r["id_b"]) for r in pairs.collect()} == {(1, 3), (2, 3)}

    anchored = dedup.minhash_dedup(df, threshold=0.9, k=16, bands=8)
    assert {r["doc_id"] for r in anchored.collect()} == {1, 2}  # over-keeps 2

    exact = dedup.minhash_dedup_cc(df, threshold=0.9, k=16, bands=8)
    assert {r["doc_id"] for r in exact.collect()} == {1}  # true cluster min


def test_corpus_curation_pipeline(spark):
    from hydra_spark.ml.pipeline import curate, curation_stats

    docs = spark.createDataFrame(
        [
            (1, "the cat is in the house and it is warm today with the sun and the wind for it"),
            (2, "the cat is in the house and it is warm today with the sun and the wind for it"),  # exact dup
            (3, "le chat est dans la maison et il est content avec le soleil et le vent dans un jardin"),
            (4, "1 2 3 4 5 6 7 8 9 10 11 12 13 14 15 16"),      # digit soup → low quality
            (5, "zzz qqq xxx www yyy vvv uuu ttt sss rrr"),      # no stopwords → unknown lang
        ],
        "doc_id long, text string",
    )
    curated = curate(docs, min_quality=0.25, languages=("en", "fr"))
    assert sorted(r["doc_id"] for r in curated.collect()) == [1, 3]

    stats = curation_stats(docs, min_quality=0.25, languages=("en", "fr")).first()
    assert stats["total_docs"] == 5
    assert stats["dropped_low_quality"] >= 1      # the digit soup
    assert stats["dropped_language"] >= 1         # the unknown-lang doc
    assert stats["dropped_exact_dups"] == 1
    assert stats["kept_docs"] == 2
    # funnel accounts for every document (no silent drops)
    assert (
        stats["kept_docs"] + stats["dropped_exact_dups"]
        + stats["dropped_low_quality"] + stats["dropped_language"]
    ) == stats["total_docs"]

    # near-dedup stage composes: add a near-duplicate of doc 1
    near = docs.union(spark.createDataFrame(
        [(6, "the cat is in the house and it is warm today with the sun and the wind for us")],
        "doc_id long, text string",
    ))
    curated2 = curate(near, min_quality=0.25, near_dedup=True, near_dedup_threshold=0.5)
    assert sorted(r["doc_id"] for r in curated2.collect()) == [1, 3]


def test_ivf_indexed_empty_queries(spark, emb, tmp_path):
    path = str(tmp_path / "idx")
    base = emb.select("vec_id", "embedding")
    similarity.ivf_build_index(base, path, n_clusters=4)
    empty = base.where("vec_id < 0").selectExpr("vec_id AS query_id", "embedding")
    out = similarity.ivf_topk_indexed(spark, path, empty, k=5, n_probe=2)
    assert out.count() == 0
    assert out.columns == ["query_id", "neighbor_id", "cosine", "rank"]


# ---- real stdlib image decode ---------------------------------------------------

def _encode_png(pixels, color_type, palette=None, filters=None):
    """Tiny PNG encoder for tests: applies the requested per-row filter
    so decode_png's unfiltering (None/Sub/Up/Average/Paeth) is exercised
    against ground truth."""
    import struct
    import zlib

    import numpy as np

    h, w, nch = pixels.shape if pixels.ndim == 3 else (*pixels.shape, 1)
    raw = pixels.reshape(h, w * nch).astype(np.intc)
    filters = filters or [0] * h
    lines = []
    prev = np.zeros(w * nch, dtype=np.intc)
    for y, ftype in enumerate(filters):
        cur = raw[y]
        enc = cur.copy()
        for x in range(w * nch):
            a = cur[x - nch] if x >= nch else 0
            up = prev[x]
            c = prev[x - nch] if x >= nch else 0
            if ftype == 1:
                enc[x] = (cur[x] - a) & 0xFF
            elif ftype == 2:
                enc[x] = (cur[x] - up) & 0xFF
            elif ftype == 3:
                enc[x] = (cur[x] - ((a + up) >> 1)) & 0xFF
            elif ftype == 4:
                p = a + up - c
                pa, pb, pc = abs(p - a), abs(p - up), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (up if pb <= pc else c)
                enc[x] = (cur[x] - pred) & 0xFF
        lines.append(bytes([ftype]) + bytes(enc.astype(np.uint8)))
        prev = cur

    def chunk(typ, data):
        return (
            struct.pack(">I", len(data)) + typ + data
            + struct.pack(">I", zlib.crc32(typ + data))
        )

    out = b"\x89PNG\r\n\x1a\n"
    out += chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0))
    if palette is not None:
        out += chunk(b"PLTE", bytes(palette.reshape(-1)))
    out += chunk(b"IDAT", zlib.compress(b"".join(lines)))
    out += chunk(b"IEND", b"")
    return out


def test_png_decode_all_filters():
    import numpy as np

    from hydra_spark.ml.multimodal import decode_png, parse_image_header

    rng = np.random.default_rng(7)
    pixels = rng.integers(0, 256, size=(5, 4, 3), dtype=np.uint8)
    data = _encode_png(pixels, color_type=2, filters=[0, 1, 2, 3, 4])
    hdr = parse_image_header(data)
    assert hdr == {"format": "png", "width": 4, "height": 5, "channels": 3, "bit_depth": 8}
    assert np.array_equal(decode_png(data), pixels)

    # grayscale + alpha (2 channels), all paeth
    ga = rng.integers(0, 256, size=(3, 6, 2), dtype=np.uint8)
    assert np.array_equal(decode_png(_encode_png(ga, 4, filters=[4, 4, 4])), ga)

    # palette expansion
    pal = np.array([[255, 0, 0], [0, 255, 0], [0, 0, 128]], dtype=np.uint8)
    idx = np.array([[0, 1], [2, 0]], dtype=np.uint8)
    got = decode_png(_encode_png(idx, 3, palette=pal))
    assert np.array_equal(got, pal[idx])


def test_bmp_decode_and_gif_header():
    import struct

    import numpy as np

    from hydra_spark.ml.multimodal import decode_bmp, parse_image_header

    # 3x2 24-bit bottom-up BMP, rows padded to 4 bytes
    pixels = np.arange(3 * 2 * 3, dtype=np.uint8).reshape(2, 3, 3)
    stride = (3 * 3 + 3) & ~3
    rows = b""
    for y in (1, 0):  # bottom-up
        row = pixels[y][:, [2, 1, 0]].tobytes()  # BGR on disk
        rows += row + b"\x00" * (stride - len(row))
    header = b"BM" + struct.pack("<IHHI", 54 + len(rows), 0, 0, 54)
    info = struct.pack("<IiiHHIIiiII", 40, 3, 2, 1, 24, 0, len(rows), 0, 0, 0, 0)
    data = header + info + rows
    assert parse_image_header(data)["format"] == "bmp"
    assert np.array_equal(decode_bmp(data), pixels)

    gif = b"GIF89a" + struct.pack("<HH", 320, 200) + bytes([0xF7, 0, 0])
    hdr = parse_image_header(gif)
    assert hdr["format"] == "gif" and hdr["width"] == 320 and hdr["height"] == 200
    assert parse_image_header(b"\x00" * 40) is None


def test_extract_features_real_png_and_probe_meta(spark):
    """extract_features(fake=False) works on REAL PNG bytes without PIL,
    and probe_image_meta types headers across formats in one pass."""
    import numpy as np

    from hydra_spark.ml.multimodal import (
        extract_features,
        image_features,
        probe_image_meta,
    )

    rng = np.random.default_rng(3)
    pngs = [
        _encode_png(rng.integers(0, 256, size=(8, 8, 3), dtype=np.uint8), 2)
        for _ in range(4)
    ]
    df = spark.createDataFrame(
        [(i, "image", bytearray(p), None) for i, p in enumerate(pngs)],
        "asset_id long, media_type string, payload binary, meta struct<width:int,height:int,duration_ms:int,codec:string>",
    )
    feats = {r["asset_id"]: r["features"] for r in extract_features(df, fake=False).collect()}
    assert len(feats) == 4
    from hydra_spark.ml.multimodal import decode_png

    for i, p in enumerate(pngs):
        expect = image_features(decode_png(p)).tolist()
        assert feats[i] == [float(np.float32(v)) for v in expect]

    meta = {r["asset_id"]: r for r in probe_image_meta(df).collect()}
    assert all(meta[i]["format"] == "png" and meta[i]["width"] == 8 for i in range(4))


def _encode_gif(idx, palette, interlaced=False):
    """Tiny GIF89a encoder for tests: degenerate LZW (a CLEAR before
    every literal keeps the code width fixed) — valid per the spec and
    decodable by any conformant reader."""
    import struct

    import numpy as np

    h, w = idx.shape
    n = len(palette)
    depth = max((n - 1).bit_length(), 1)
    pal = np.zeros((2 ** depth, 3), dtype=np.uint8)
    pal[:n] = palette
    out = b"GIF89a" + struct.pack("<HHBBB", w, h, 0x80 | (depth - 1), 0, 0)
    out += pal.tobytes()
    out += b"\x2c" + struct.pack("<HHHHB", 0, 0, w, h, 0x40 if interlaced else 0)
    min_code = max(depth, 2)
    clear, eoi = 1 << min_code, (1 << min_code) + 1
    width = min_code + 1
    rows = idx
    if interlaced:
        order = (
            list(range(0, h, 8)) + list(range(4, h, 8))
            + list(range(2, h, 4)) + list(range(1, h, 2))
        )
        rows = idx[order]
    codes = []
    for v in rows.reshape(-1):
        codes += [clear, int(v)]
    codes.append(eoi)
    acc = nbits = 0
    data = bytearray()
    for c in codes:
        acc |= c << nbits
        nbits += width
        while nbits >= 8:
            data.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8
    if nbits:
        data.append(acc & 0xFF)
    out += bytes([min_code])
    for i in range(0, len(data), 255):
        block = data[i : i + 255]
        out += bytes([len(block)]) + bytes(block)
    return out + b"\x00\x3b"


def test_gif_decode_plain_and_interlaced():
    import numpy as np

    from hydra_spark.ml.multimodal import decode_gif, decode_image

    rng = np.random.default_rng(11)
    palette = np.array(
        [[255, 0, 0], [0, 255, 0], [0, 0, 255], [10, 20, 30]], dtype=np.uint8
    )
    idx = rng.integers(0, 4, size=(9, 5), dtype=np.uint8)
    assert np.array_equal(decode_gif(_encode_gif(idx, palette)), palette[idx])
    assert np.array_equal(
        decode_gif(_encode_gif(idx, palette, interlaced=True)), palette[idx]
    )
    # decode_image routes GIF to the real decoder now
    assert np.array_equal(decode_image(_encode_gif(idx, palette)), palette[idx])


def test_gif_decode_real_lzw_stream():
    """A standard growing-dictionary LZW stream (what real encoders
    emit) exercises the variable code width + KwKwK decode paths that
    the degenerate clear-per-literal encoder cannot."""
    import struct

    import numpy as np

    from hydra_spark.ml.multimodal import decode_gif

    palette = np.array([[0, 0, 0], [255, 255, 255]], dtype=np.uint8)
    # repetitive pattern → dictionary growth; runs of equal pixels → KwKwK
    idx = np.array(
        [[0, 1, 0, 1, 0, 1, 0, 1]] * 4 + [[1, 1, 1, 1, 1, 1, 1, 1]] * 4,
        dtype=np.uint8,
    )
    h, w = idx.shape
    min_code = 2
    clear, eoi = 1 << min_code, (1 << min_code) + 1

    # textbook GIF-LZW compressor
    dictionary = {(i,): i for i in range(clear)}
    next_code = eoi + 1
    width = min_code + 1
    codes = [clear]
    buf: tuple = ()
    widths = []  # width AT EMISSION time, for the bit packer
    for v in idx.reshape(-1):
        cand = buf + (int(v),)
        if cand in dictionary:
            buf = cand
            continue
        codes.append(dictionary[buf])
        widths.append(width)
        dictionary[cand] = next_code
        next_code += 1
        if next_code - 1 == (1 << width):  # decoder grows at next_code == 2^w
            width += 1
        buf = (int(v),)
    codes.append(dictionary[buf])
    widths.append(width)
    codes.append(eoi)
    widths.append(width)
    widths.insert(0, min_code + 1)  # the leading CLEAR

    acc = nbits = 0
    data = bytearray()
    for c, cw in zip(codes, widths):
        acc |= c << nbits
        nbits += cw
        while nbits >= 8:
            data.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8
    if nbits:
        data.append(acc & 0xFF)

    gif = (
        b"GIF89a" + struct.pack("<HHBBB", w, h, 0x80 | 0, 0, 0)  # 2-entry GCT
        + palette.tobytes()
        + b"\x2c" + struct.pack("<HHHHB", 0, 0, w, h, 0)
        + bytes([min_code, len(data)]) + bytes(data) + b"\x00\x3b"
    )
    assert np.array_equal(decode_gif(gif), palette[idx])


def test_jpeg_header_probe():
    """JPEG dims/channels from the SOFn frame header — probe only, no
    pixel decode (DCT needs a real codec)."""
    import struct

    from hydra_spark.ml.multimodal import parse_image_header

    def jpeg(w, h, nch, progressive=False):
        sof = 0xC2 if progressive else 0xC0
        out = b"\xff\xd8"  # SOI
        app0 = b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00"
        out += b"\xff\xe0" + struct.pack(">H", 2 + len(app0)) + app0
        comp = b"".join(bytes([i + 1, 0x11, 0]) for i in range(nch))
        frame = bytes([8]) + struct.pack(">HH", h, w) + bytes([nch]) + comp
        out += bytes([0xFF, sof]) + struct.pack(">H", 2 + len(frame)) + frame
        return out + b"\xff\xd9"

    hdr = parse_image_header(jpeg(640, 480, 3))
    assert hdr == {"format": "jpeg", "width": 640, "height": 480, "channels": 3, "bit_depth": 8}
    hdr2 = parse_image_header(jpeg(31, 17, 1, progressive=True))
    assert hdr2["width"] == 31 and hdr2["height"] == 17 and hdr2["channels"] == 1
    assert parse_image_header(b"\xff\xd8\x00garbage") is None


def test_wav_header_decode_features():
    import io
    import math
    import struct
    import wave

    import numpy as np

    from hydra_spark.ml.multimodal import audio_features, decode_wav, parse_wav_header

    buf = io.BytesIO()
    rate, secs, freq = 8000, 1, 440
    with wave.open(buf, "wb") as w:
        w.setnchannels(2)
        w.setsampwidth(2)
        w.setframerate(rate)
        frames = b"".join(
            struct.pack("<hh", int(12000 * math.sin(2 * math.pi * freq * t / rate)),
                        int(6000 * math.cos(2 * math.pi * freq * t / rate)))
            for t in range(rate * secs)
        )
        w.writeframes(frames)
    payload = buf.getvalue()

    hdr = parse_wav_header(payload)
    assert hdr == {"format": "wav", "sample_rate": 8000, "n_channels": 2,
                   "bit_depth": 16, "duration_ms": 1000}

    samples, r = decode_wav(payload)
    assert r == 8000 and samples.shape == (8000, 2)
    assert np.abs(samples).max() <= 1.0

    feats = audio_features(samples, r)
    assert len(feats) == 16
    assert feats[0] == pytest.approx(1.0)          # duration_s
    assert 0.0 < feats[1] < 1.0                    # rms
    # a 440 Hz tone crosses zero ~2*440 times/s
    assert feats[3] == pytest.approx(2 * 440 / 8000, rel=0.05)
    assert np.isclose(feats[4:].sum(), 1.0)        # histogram L1-normalized

    assert parse_wav_header(b"RIFFxxxxNOPE") is None
    assert parse_wav_header(b"\x00" * 50) is None


def _mp3_frames(header: bytes, frame_len: int, n: int = 3) -> bytes:
    return (header + b"\x00" * (frame_len - 4)) * n


def test_parse_mp3_header_real_frames():
    from hydra_spark.ml.multimodal import parse_mp3_header

    # MPEG1 Layer III, 128 kbps, 44100 Hz, stereo: FF FB 90 00
    # frame length = 144 * 128000 / 44100 = 417
    mp3 = _mp3_frames(b"\xff\xfb\x90\x00", 417)
    hdr = parse_mp3_header(mp3)
    assert hdr == {
        "format": "mp3", "mpeg_version": 1, "layer": 3, "bitrate_kbps": 128,
        "sample_rate": 44100, "n_channels": 2, "samples_per_frame": 1152,
        "duration_ms": len(mp3) * 8 * 1000 // 128000,
    }

    # ID3v2-tagged stream: probe must skip the tag body (syncsafe size)
    tag = b"ID3\x04\x00\x00" + bytes([0, 0, 0, 100]) + b"\xff" * 100
    hdr2 = parse_mp3_header(tag + mp3)
    assert hdr2["format"] == "mp3" and hdr2["bitrate_kbps"] == 128
    assert hdr2["duration_ms"] == hdr["duration_ms"]  # tag bytes excluded

    # MPEG2.5 Layer III, 64 kbps, 11025 Hz, mono: FF E3 80 C0
    # frame length = 72 * 64000 / 11025 = 417, 576 samples/frame
    lofi = _mp3_frames(b"\xff\xe3\x80\xc0", 417)
    hdr3 = parse_mp3_header(lofi)
    assert (hdr3["mpeg_version"], hdr3["layer"], hdr3["bitrate_kbps"]) == (25, 3, 64)
    assert hdr3["sample_rate"] == 11025 and hdr3["n_channels"] == 1
    assert hdr3["samples_per_frame"] == 576


def test_parse_mp3_header_rejects_false_sync():
    from hydra_spark.ml.multimodal import parse_mp3_header

    # 0xFFFF syncs but has bitrate index 15 (invalid)
    assert parse_mp3_header(b"\xff\xff\xff\xff" * 200) is None
    # a single valid header mid-buffer with no chained second frame is noise
    assert parse_mp3_header(b"\x00" * 64 + b"\xff\xfb\x90\x00" + b"\x00" * 500) is None
    assert parse_mp3_header(b"not audio at all") is None
    # WAV bytes must not probe as mp3
    assert parse_mp3_header(b"RIFF\x00\x00\x00\x00WAVEfmt ") is None


def _flac_bytes(rate=44100, ch=2, bits=16, total=441_000) -> bytes:
    packed = (rate << 44) | ((ch - 1) << 41) | ((bits - 1) << 36) | total
    streaminfo = (
        (4096).to_bytes(2, "big") * 2 + (1024).to_bytes(3, "big") * 2
        + packed.to_bytes(8, "big") + b"\x00" * 16
    )
    assert len(streaminfo) == 34
    return b"fLaC" + b"\x80" + (34).to_bytes(3, "big") + streaminfo


def _ogg_page(packet: bytes) -> bytes:
    assert len(packet) < 255
    return (b"OggS" + b"\x00" + b"\x02" + b"\x00" * 8 + b"\x01\x00\x00\x00"
            + b"\x00" * 4 + b"\x00" * 4 + bytes([1, len(packet)]) + packet)


def test_parse_flac_header():
    from hydra_spark.ml.multimodal import parse_flac_header

    hdr = parse_flac_header(_flac_bytes())
    assert hdr == {"format": "flac", "sample_rate": 44100, "n_channels": 2,
                   "bit_depth": 16, "duration_ms": 10000}
    assert parse_flac_header(_flac_bytes(rate=96000, ch=1, bits=24, total=96000)) == {
        "format": "flac", "sample_rate": 96000, "n_channels": 1,
        "bit_depth": 24, "duration_ms": 1000}
    assert parse_flac_header(b"fLaC" + b"\x00" * 10) is None  # truncated
    assert parse_flac_header(b"not flac" * 10) is None


def test_parse_ogg_header_codecs():
    import struct

    from hydra_spark.ml.multimodal import parse_ogg_header

    vorbis = (b"\x01vorbis" + struct.pack("<IB", 0, 2) + struct.pack("<I", 44100)
              + struct.pack("<iii", -1, 128000, -1) + b"\xb8\x01")
    hdr = parse_ogg_header(_ogg_page(vorbis))
    assert hdr == {"format": "ogg-vorbis", "sample_rate": 44100,
                   "n_channels": 2, "bitrate_kbps": 128}

    opus = b"OpusHead" + bytes([1, 2]) + struct.pack("<HI", 312, 48000) + b"\x00\x00\x00"
    hdr = parse_ogg_header(_ogg_page(opus))
    assert hdr == {"format": "ogg-opus", "sample_rate": 48000,
                   "n_channels": 2, "pre_skip_samples": 312}

    theora = (b"\x80theora" + bytes([3, 2, 1])
              + struct.pack(">HH", 40, 30)            # frame macroblocks
              + (640).to_bytes(3, "big") + (480).to_bytes(3, "big") + b"\x00" * 10)
    hdr = parse_ogg_header(_ogg_page(theora))
    assert hdr == {"format": "ogg-theora", "width": 640, "height": 480}

    assert parse_ogg_header(_ogg_page(b"\x01video something")) is None
    assert parse_ogg_header(b"OggS" + b"\x01" + b"\x00" * 40) is None  # bad version
    assert parse_ogg_header(b"no ogg here" * 5) is None


def _mp4_box(btype: bytes, body: bytes) -> bytes:
    return (8 + len(body)).to_bytes(4, "big") + btype + body


def test_parse_mp4_header():
    from hydra_spark.ml.multimodal import parse_mp4_header

    # mvhd v0: ver/flags, ctime, mtime, timescale=600, duration=7200 (12 s)
    mvhd = _mp4_box(b"mvhd", b"\x00\x00\x00\x00" + b"\x00" * 8
                    + (600).to_bytes(4, "big") + (7200).to_bytes(4, "big") + b"\x00" * 80)
    # tkhd v0: 76 bytes to width/height (16.16 fixed)
    tkhd = _mp4_box(b"tkhd", b"\x00\x00\x00\x07" + b"\x00" * 72
                    + (1280 << 16).to_bytes(4, "big") + (720 << 16).to_bytes(4, "big"))
    moov = _mp4_box(b"moov", mvhd + _mp4_box(b"trak", tkhd))
    mp4 = _mp4_box(b"ftyp", b"isom" + b"\x00" * 4 + b"mp42") + moov
    hdr = parse_mp4_header(mp4)
    assert hdr == {"format": "mp4", "major_brand": "isom", "duration_ms": 12000,
                   "width": 1280, "height": 720}

    # v1 mvhd (64-bit times), audio-only (no tkhd dims)
    mvhd1 = _mp4_box(b"mvhd", b"\x01\x00\x00\x00" + b"\x00" * 16
                     + (1000).to_bytes(4, "big") + (2500).to_bytes(8, "big") + b"\x00" * 80)
    m4a = _mp4_box(b"ftyp", b"M4A " + b"\x00" * 4) + _mp4_box(b"moov", mvhd1)
    hdr = parse_mp4_header(m4a)
    assert hdr == {"format": "mp4", "major_brand": "M4A", "duration_ms": 2500}

    # no ftyp first -> not ISO BMFF; truncated/hostile sizes -> None, no crash
    assert parse_mp4_header(moov + mp4) is None
    assert parse_mp4_header(_mp4_box(b"ftyp", b"isom")[:6]) is None
    evil = (2**31).to_bytes(4, "big") + b"ftyp" + b"\x00" * 8
    assert parse_mp4_header(evil) is None


def _ebml(eid: bytes, body: bytes) -> bytes:
    assert len(body) < 127
    return eid + bytes([0x80 | len(body)]) + body


def test_parse_webm_header():
    import struct

    from hydra_spark.ml.multimodal import parse_webm_header

    header = _ebml(b"\x1a\x45\xdf\xa3", _ebml(b"\x42\x82", b"webm"))
    info = _ebml(
        b"\x15\x49\xa9\x66",
        _ebml(b"\x2a\xd7\xb1", (1_000_000).to_bytes(3, "big"))
        + _ebml(b"\x44\x89", struct.pack(">d", 12345.0)),
    )
    video_trk = _ebml(b"\xae", _ebml(
        b"\xe0",
        _ebml(b"\xb0", (640).to_bytes(2, "big")) + _ebml(b"\xba", (360).to_bytes(2, "big")),
    ))
    audio_trk = _ebml(b"\xae", _ebml(
        b"\xe1",
        _ebml(b"\xb5", struct.pack(">f", 48000.0)) + _ebml(b"\x9f", b"\x02"),
    ))
    tracks = _ebml(b"\x16\x54\xae\x6b", video_trk + audio_trk)
    webm = header + _ebml(b"\x18\x53\x80\x67", info + tracks)

    hdr = parse_webm_header(webm)
    assert hdr == {"format": "webm", "doctype": "webm", "duration_ms": 12345,
                   "width": 640, "height": 360, "sample_rate": 48000, "n_channels": 2}

    # matroska doctype accepted; foreign EBML (e.g. other doctypes) is not
    mkv = _ebml(b"\x1a\x45\xdf\xa3", _ebml(b"\x42\x82", b"matroska"))
    assert parse_webm_header(mkv + _ebml(b"\x18\x53\x80\x67", info))["duration_ms"] == 12345
    foreign = _ebml(b"\x1a\x45\xdf\xa3", _ebml(b"\x42\x82", b"banana"))
    assert parse_webm_header(foreign) is None
    assert parse_webm_header(b"\x00" * 40) is None
    assert parse_webm_header(webm[:9]) is None  # truncated: no crash


def test_parse_media_header_dispatch():
    from hydra_spark.ml.multimodal import encode_png, parse_media_header

    import numpy as np

    png = encode_png(np.zeros((4, 6, 3), dtype=np.uint8))
    assert parse_media_header(png)["format"] == "png"
    assert parse_media_header(_flac_bytes())["format"] == "flac"
    mp3 = _mp3_frames(b"\xff\xfb\x90\x00", 417)
    assert parse_media_header(mp3)["format"] == "mp3"
    assert parse_media_header(b"\x00" * 100) is None
    # exact-magic probes win before the mp3 sync scan: a FLAC stream
    # whose body bytes contain a fake mp3 sync still probes as flac
    noisy = _flac_bytes() + _mp3_frames(b"\xff\xfb\x90\x00", 417)
    assert parse_media_header(noisy)["format"] == "flac"


def test_probe_media_meta_unified_rows(spark):
    from pyspark.sql import Row

    from hydra_spark.ml.multimodal import probe_media_meta

    assets = spark.createDataFrame(
        [
            Row(asset_id=0, payload=bytearray(_flac_bytes())),
            Row(asset_id=1, payload=bytearray(_mp3_frames(b"\xff\xfb\x90\x00", 417))),
            Row(asset_id=2, payload=bytearray(b"\xde\xad\xbe\xef" * 64)),  # junk
            Row(asset_id=3, payload=None),                                 # poison
        ]
    )
    rows = {r.asset_id: r for r in probe_media_meta(assets).collect()}
    assert rows[0].format == "flac" and rows[0].sample_rate == 44100
    assert rows[0].n_channels == 2 and rows[0].duration_ms == 10000
    assert rows[1].format == "mp3" and rows[1].bitrate_kbps == 128
    assert rows[2].format is None and rows[3].format is None  # NULL, no crash


def test_extract_features_real_wav_path(spark):
    import io
    import wave

    from pyspark.sql import Row

    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(1)
        w.setframerate(1000)
        w.writeframes(bytes([128] * 500))  # 0.5 s of silence, 8-bit
    assets = spark.createDataFrame(
        [Row(asset_id=0, media_type="audio", payload=bytearray(buf.getvalue()))]
    )
    [r] = extract_features(assets, fake=False).collect()
    assert r.n_bytes > 44
    assert r.features[0] == pytest.approx(0.5)  # duration
    assert r.features[1] == pytest.approx(0.0)  # rms of silence


def test_encode_png_roundtrip():
    import numpy as np

    from hydra_spark.ml.multimodal import decode_png, encode_png

    rng = np.random.default_rng(3)
    for shape in [(5, 7), (6, 4, 3), (3, 3, 4)]:
        px = rng.integers(0, 256, size=shape, dtype=np.uint8)
        back = decode_png(encode_png(px))
        if px.ndim == 2:
            back = back[:, :, 0]
        assert np.array_equal(back, px)


def test_resize_bilinear_identity_and_downscale():
    import numpy as np

    from hydra_spark.ml.multimodal import resize_bilinear

    px = np.arange(64, dtype=np.uint8).reshape(8, 8)
    assert np.array_equal(resize_bilinear(px, 8, 8), px)  # identity
    down = resize_bilinear(np.stack([px] * 3, axis=-1), 4, 4)
    assert down.shape == (4, 4, 3)
    # constant image stays constant through any resize
    const = np.full((10, 6, 3), 77, dtype=np.uint8)
    assert np.all(resize_bilinear(const, 3, 9) == 77)


def test_resize_images_stage(spark):
    import numpy as np

    from pyspark.sql import Row

    from hydra_spark.ml.multimodal import decode_png, encode_png, resize_images

    rng = np.random.default_rng(9)
    good = encode_png(rng.integers(0, 256, size=(16, 12, 3), dtype=np.uint8))
    jpeg = open(
        "/opt/spark-4.1.2-bin-hadoop3/data/mllib/images/origin/kittens/54893.jpg", "rb"
    ).read()
    assets = spark.createDataFrame(
        [
            Row(asset_id=0, media_type="image", payload=bytearray(good)),
            Row(asset_id=1, media_type="image", payload=bytearray(jpeg)),
            Row(asset_id=2, media_type="image", payload=bytearray(b"not an image")),
        ]
    )
    out = {r.asset_id: r for r in resize_images(assets, 8, 8).collect()}
    for aid in (0, 1):
        assert out[aid].width == 8 and out[aid].height == 8
        px = decode_png(bytes(out[aid].payload))
        assert px.shape == (8, 8, 3)
    assert out[2].payload is None  # poison payload -> NULL, not a crash


def _encode_png_v2(pixels, depth=8, interlace=0):
    """Independent PNG encoder for decoder tests: supports 16-bit
    samples and Adam7 interlace (filter 0 rows)."""
    import struct
    import zlib

    import numpy as np

    ADAM7 = [(0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
             (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2)]
    h, w = pixels.shape[:2]
    nch = 1 if pixels.ndim == 2 else pixels.shape[2]
    px = pixels.reshape(h, w, nch)
    color = {1: 0, 3: 2, 4: 6}[nch]

    def rowbytes(arr):  # arr (H, W, C)
        if depth == 16:
            return arr.astype(">u2").tobytes()
        return arr.astype(np.uint8).tobytes()

    if interlace == 0:
        raw = b"".join(b"\x00" + rowbytes(px[y : y + 1]) for y in range(h))
    else:
        parts = []
        for x0, y0, dx, dy in ADAM7:
            sub = px[y0::dy, x0::dx]
            if sub.shape[0] == 0 or sub.shape[1] == 0:
                continue
            for y in range(sub.shape[0]):
                parts.append(b"\x00" + rowbytes(sub[y : y + 1]))
        raw = b"".join(parts)

    def chunk(typ, data):
        return struct.pack(">I", len(data)) + typ + data + struct.pack(
            ">I", zlib.crc32(typ + data) & 0xFFFFFFFF)

    ihdr = struct.pack(">IIBBBBB", w, h, depth, color, 0, 0, interlace)
    return (b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", zlib.compress(raw)) + chunk(b"IEND", b""))


def test_png_adam7_interlace_roundtrip():
    import numpy as np

    from hydra_spark.ml.multimodal import decode_png

    rng = np.random.default_rng(11)
    for shape in [(16, 16, 3), (13, 9, 3), (7, 5), (1, 1, 3), (9, 3, 4)]:
        px = rng.integers(0, 256, size=shape, dtype=np.uint8)
        got = decode_png(_encode_png_v2(px, interlace=1))
        want = px.reshape(px.shape[0], px.shape[1], -1)
        assert np.array_equal(got, want), shape


def test_png_16bit_depth_downscales():
    import numpy as np

    from hydra_spark.ml.multimodal import decode_png

    px16 = (np.arange(12, dtype=np.uint16).reshape(2, 2, 3) * 5000) % 65536
    got = decode_png(_encode_png_v2(px16, depth=16))
    assert np.array_equal(got, (px16 >> 8).astype(np.uint8))


def test_png_16bit_interlaced():
    import numpy as np

    from hydra_spark.ml.multimodal import decode_png

    rng = np.random.default_rng(13)
    px16 = rng.integers(0, 65536, size=(10, 6, 3), dtype=np.uint16)
    got = decode_png(_encode_png_v2(px16, depth=16, interlace=1))
    assert np.array_equal(got, (px16 >> 8).astype(np.uint8))


def _gif_lzw_blocks(idx_rows, depth):
    """Degenerate-LZW entropy block (CLEAR before every literal)."""
    min_code = max(depth, 2)
    clear, eoi = 1 << min_code, (1 << min_code) + 1
    width = min_code + 1
    codes = []
    for v in idx_rows.reshape(-1):
        codes += [clear, int(v)]
    codes.append(eoi)
    acc = nbits = 0
    data = bytearray()
    for c in codes:
        acc |= c << nbits
        nbits += width
        while nbits >= 8:
            data.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8
    if nbits:
        data.append(acc & 0xFF)
    out = bytes([min_code])
    for i in range(0, len(data), 255):
        block = data[i : i + 255]
        out += bytes([len(block)]) + bytes(block)
    return out + b"\x00"


def _encode_animated_gif(sw, sh, palette, frames):
    """frames: list of (x0, y0, idx_2d, delay_ms, transparent_idx|None,
    disposal)."""
    import struct

    import numpy as np

    n = len(palette)
    depth = max((n - 1).bit_length(), 1)
    pal = np.zeros((2 ** depth, 3), dtype=np.uint8)
    pal[:n] = palette
    out = b"GIF89a" + struct.pack("<HHBBB", sw, sh, 0x80 | (depth - 1), 0, 0)
    out += pal.tobytes()
    for x0, y0, idx, delay_ms, tidx, disposal in frames:
        packed = (disposal & 0x07) << 2 | (1 if tidx is not None else 0)
        out += b"\x21\xf9\x04" + struct.pack(
            "<BHB", packed, delay_ms // 10, tidx if tidx is not None else 0
        ) + b"\x00"
        h, w = idx.shape
        out += b"\x2c" + struct.pack("<HHHHB", x0, y0, w, h, 0)
        out += _gif_lzw_blocks(idx, depth)
    return out + b"\x3b"


def test_gif_frames_animation_and_compositing():
    import numpy as np

    from hydra_spark.ml.multimodal import decode_gif, gif_frames

    palette = np.array([[0, 0, 0], [255, 0, 0], [0, 255, 0], [0, 0, 255]], np.uint8)
    f1 = np.full((4, 4), 1, dtype=np.intp)           # all red
    f2 = np.array([[2, 3], [3, 2]], dtype=np.intp)   # partial 2x2 at (1,1)
    f3 = np.array([[0, 2], [2, 0]], dtype=np.intp)   # transparent idx 0
    gif = _encode_animated_gif(4, 4, palette, [
        (0, 0, f1, 100, None, 1),
        (1, 1, f2, 100, None, 1),
        (1, 1, f3, 100, 0, 1),
    ])
    frames = list(gif_frames(gif))
    assert [d for d, _ in frames] == [100, 100, 100]
    c1, c2, c3 = (c for _, c in frames)
    assert np.array_equal(c1, palette[f1])
    # frame 2 drew only its rect; the rest stays red
    assert np.array_equal(c2[1:3, 1:3], palette[f2])
    assert np.array_equal(c2[0, :], palette[np.full(4, 1)])
    # frame 3: transparent pixels keep frame 2's content underneath
    assert np.array_equal(c3[1, 2], palette[2])     # drawn (idx 2)
    assert np.array_equal(c3[1, 1], palette[f2][0, 0])  # transparent -> kept
    # decode_gif == first composited frame
    assert np.array_equal(decode_gif(gif), c1)


def test_gif_frame_rect_overflowing_canvas_is_clamped():
    """Untrusted bytes: a frame descriptor whose rect extends past the
    logical screen must composite the in-canvas part instead of raising
    a numpy broadcast error (ADVICE r3)."""
    import numpy as np

    from hydra_spark.ml.multimodal import decode_gif, gif_frames

    palette = np.array([[0, 0, 0], [255, 0, 0], [0, 255, 0]], np.uint8)
    # 3x3 canvas; 3x3 frame planted at (2, 2) -> only (2,2) is on-canvas
    over = np.full((3, 3), 1, dtype=np.intp)
    gif = _encode_animated_gif(3, 3, palette, [(2, 2, over, 100, None, 1)])
    canvas = decode_gif(gif)
    assert np.array_equal(canvas[2, 2], palette[1])
    assert np.array_equal(canvas[0, 0], palette[0])  # untouched background
    # fully off-canvas rect: frame yields, canvas untouched
    gif2 = _encode_animated_gif(2, 2, palette, [
        (0, 0, np.full((2, 2), 2, dtype=np.intp), 100, None, 1),
        (2, 2, over, 100, None, 1),
    ])
    frames = [c for _, c in gif_frames(gif2)]
    assert len(frames) == 2
    assert np.array_equal(frames[1], frames[0])


def test_sample_frames_real_gif(spark):
    import numpy as np

    from pyspark.sql import Row

    from hydra_spark.ml.multimodal import decode_png, sample_frames

    palette = np.array([[10, 10, 10], [200, 50, 50]], np.uint8)
    f1 = np.zeros((3, 3), dtype=np.intp)
    f2 = np.ones((3, 3), dtype=np.intp)
    gif = _encode_animated_gif(3, 3, palette, [
        (0, 0, f1, 100, None, 1),
        (0, 0, f2, 100, None, 1),
    ])
    assets = spark.createDataFrame([
        Row(asset_id=0, media_type="video", payload=bytearray(gif),
            meta=Row(width=3, height=3, duration_ms=200, codec="gif")),
    ])
    rows = sorted(sample_frames(assets, every_ms=50, fake=False).collect(),
                  key=lambda r: r.frame_idx)
    assert [r.frame_ts_ms for r in rows] == [0, 50, 100, 150]
    first = decode_png(bytes(rows[0].frame_payload))
    last = decode_png(bytes(rows[-1].frame_payload))
    assert np.array_equal(first, palette[f1])
    assert np.array_equal(last, palette[f2])


def test_curate_gopher_and_lm_gates(spark):
    from pyspark.sql import Row

    from hydra_spark.ml.pipeline import curate

    docs = spark.createDataFrame([
        Row(doc_id=0, text="the quick brown fox is in the barn and it naps for hours with joy"),
        Row(doc_id=1, text="spam the spam the spam the spam the spam the spam the spam the spam"),
        Row(doc_id=2, text="qqxzj the wvbnk of zzyxw is qpfjm in llorp and kkttg for mmnnv it ccddz"),
    ])
    base = {r.doc_id for r in curate(docs, min_quality=0.0, languages=("en", "fr", "unknown")).collect()}
    assert base == {0, 1, 2}
    rep_gated = {r.doc_id for r in curate(
        docs, min_quality=0.0, languages=("en", "fr", "unknown"),
        max_dup_chunk_frac=0.30,
    ).collect()}
    assert 1 not in rep_gated and 0 in rep_gated  # repetition soup dropped
    lm_gated = curate(
        docs, min_quality=0.0, languages=("en", "fr", "unknown"),
        max_lm_score=10.0,  # loose ceiling: everything passes, plan runs
    )
    rows = {r.doc_id: r for r in lm_gated.collect()}
    assert set(rows) == {0, 1, 2}
    assert all(hasattr(r, "lm_score") for r in rows.values())
    # the rare-word doc scores strictly worse than the stopword-rich one
    assert rows[2].lm_score > rows[0].lm_score


def test_png_subbyte_depths():
    import struct
    import zlib

    import numpy as np

    from hydra_spark.ml.multimodal import decode_png

    def enc(idx, depth, color, palette=None, interlace=0):
        h, w = idx.shape
        rows_b = []
        for y in range(h):
            bits = np.zeros(w * depth, dtype=np.uint8)
            for x in range(w):
                v = int(idx[y, x])
                for k in range(depth):
                    bits[x * depth + k] = (v >> (depth - 1 - k)) & 1
            rows_b.append(b"\x00" + np.packbits(bits).tobytes())
        raw = b"".join(rows_b)

        def chunk(t, d):
            return struct.pack(">I", len(d)) + t + d + struct.pack(
                ">I", zlib.crc32(t + d) & 0xFFFFFFFF)

        out = b"\x89PNG\r\n\x1a\n" + chunk(
            b"IHDR", struct.pack(">IIBBBBB", w, h, depth, color, 0, 0, interlace))
        if palette is not None:
            out += chunk(b"PLTE", palette.astype(np.uint8).tobytes())
        return out + chunk(b"IDAT", zlib.compress(raw)) + chunk(b"IEND", b"")

    # 1-bit gray: 0 -> 0, 1 -> 255
    bw = np.array([[0, 1, 1, 0, 1, 0, 1, 1, 1], [1, 0, 0, 1, 0, 1, 0, 0, 0]], dtype=np.uint8)
    got = decode_png(enc(bw, 1, 0))
    assert np.array_equal(got[:, :, 0], bw * 255)

    # 2-bit gray scales by 85
    g2 = np.array([[0, 1, 2, 3, 1]], dtype=np.uint8)
    got = decode_png(enc(g2, 2, 0))
    assert np.array_equal(got[:, :, 0], g2 * 85)

    # 4-bit palette
    pal = np.arange(48, dtype=np.uint8).reshape(16, 3)
    p4 = np.array([[0, 15, 7], [3, 3, 12]], dtype=np.uint8)
    got = decode_png(enc(p4, 4, 3, palette=pal))
    assert np.array_equal(got, pal[p4])


def test_bmp_8bit_palette_decode():
    import struct

    import numpy as np

    from hydra_spark.ml.multimodal import decode_bmp

    w, h = 5, 3
    pal = (np.arange(1024) % 256).astype(np.uint8).reshape(256, 4)  # BGRx entries
    idx = np.array([[0, 1, 2, 3, 4], [10, 11, 12, 13, 14], [250, 251, 252, 253, 254]],
                   dtype=np.uint8)
    stride = (w + 3) & ~3
    px_off = 14 + 40 + 1024
    body = b"".join(idx[y].tobytes() + b"\x00" * (stride - w) for y in range(h - 1, -1, -1))
    bmp = (b"BM" + struct.pack("<IHHI", px_off + len(body), 0, 0, px_off)
           + struct.pack("<IiiHHIIiiII", 40, w, h, 1, 8, 0, len(body), 0, 0, 256, 0)
           + pal.tobytes() + body)
    got = decode_bmp(bmp)
    want = pal[:, [2, 1, 0]][idx]
    assert np.array_equal(got, want)


def test_parse_avi_header():
    """AVI RIFF probe: avih dimensions/frame timing, per-stream video
    codec fourcc + audio rate/channels; WAVE (also RIFF) must not match;
    truncation degrades to None, never raises."""
    import struct

    from hydra_spark.ml.multimodal import parse_avi_header, parse_media_header

    def avi(us_pf, total, w, h, codec=b"mjpg", audio=None):
        avih = struct.pack("<14I", us_pf, 0, 0, 0, total, 0,
                           2 if audio else 1, 0, w, h, 0, 0, 0, 0)
        strh_v = b"vids" + codec + struct.pack("<10I", *([0] * 10))
        strl_v = (b"LIST" + struct.pack("<I", 4 + 8 + len(strh_v)) + b"strl"
                  + b"strh" + struct.pack("<I", len(strh_v)) + strh_v)
        strl_a = b""
        if audio:
            rate, ch = audio
            strh_a = b"auds" + b"\x00" * 4 + struct.pack("<10I", *([0] * 10))
            strf_a = struct.pack("<HHIIHH", 1, ch, rate, rate * ch * 2, ch * 2, 16)
            inner = (b"strh" + struct.pack("<I", len(strh_a)) + strh_a
                     + b"strf" + struct.pack("<I", len(strf_a)) + strf_a)
            strl_a = b"LIST" + struct.pack("<I", 4 + len(inner)) + b"strl" + inner
        inner = b"avih" + struct.pack("<I", len(avih)) + avih + strl_v + strl_a
        hdrl = b"LIST" + struct.pack("<I", 4 + len(inner)) + b"hdrl" + inner
        body = b"AVI " + hdrl + b"LIST" + struct.pack("<I", 4) + b"movi"
        return b"RIFF" + struct.pack("<I", len(body)) + body

    p = avi(33333, 250, 640, 480, audio=(44100, 2))
    hdr = parse_avi_header(p)
    assert hdr == {
        "format": "avi", "n_frames": 250, "width": 640, "height": 480,
        "duration_ms": 33333 * 250 // 1000, "video_codec": "mjpg",
        "n_channels": 2, "sample_rate": 44100,
    }
    assert parse_media_header(p)["format"] == "avi"
    # RIFF but not AVI (WAVE container) must not match this probe
    assert parse_avi_header(b"RIFF\x24\x00\x00\x00WAVE" + b"\x00" * 36) is None
    # truncations: None, never an exception
    for cut in (4, 11, 20, 40, len(p) - 5):
        parse_avi_header(p[:cut])
    assert parse_avi_header(p[:11]) is None


class TestIncrementalDedup:
    def _new(self, spark):
        from pyspark.sql import Row

        return spark.createDataFrame([
            Row(doc_id=10, text="alpha beta"),
            Row(doc_id=11, text="  ALPHA   beta "),
            Row(doc_id=12, text="seen before"),
            Row(doc_id=13, text="fresh content"),
        ])

    def _prior(self, spark):
        return spark.range(1).select(F.md5(F.lit("seen before")).alias("digest"))

    def test_statuses(self, spark):
        rows = {
            r.doc_id: r.status
            for r in dedup.incremental_dedup(self._new(spark), self._prior(spark)).collect()
        }
        assert rows == {10: "kept", 11: "dup_within", 12: "dup_prior", 13: "kept"}

    def test_no_prior_table(self, spark):
        rows = {
            r.doc_id: r.status
            for r in dedup.incremental_dedup(self._new(spark), None).collect()
        }
        assert rows == {10: "kept", 11: "dup_within", 12: "kept", 13: "kept"}

    def test_updated_digests_roll_forward(self, spark):
        new, prior = self._new(spark), self._prior(spark)
        resolved = dedup.incremental_dedup(new, prior)
        nxt = dedup.updated_digests(prior, resolved)
        # next snapshot containing the same docs is now ALL prior-dups
        # (prior membership wins over within-snapshot ordering)
        again = dedup.incremental_dedup(new, nxt)
        assert {r.status for r in again.collect()} == {"dup_prior"}
        assert nxt.count() == 3  # seen-before + alpha-beta + fresh

    def test_prior_dup_beats_within(self, spark):
        from pyspark.sql import Row

        # both copies of a doc that is ALSO in prior -> both dup_prior
        new = spark.createDataFrame([
            Row(doc_id=1, text="seen before"),
            Row(doc_id=2, text="seen  BEFORE"),
        ])
        rows = dedup.incremental_dedup(new, self._prior(spark)).collect()
        assert {r.status for r in rows} == {"dup_prior"}


class TestUrlQualityFilter:
    def _df(self, spark):
        from pyspark.sql import Row

        return spark.createDataFrame([
            Row(url="https://ads.tracker1.com/banner/1"),
            Row(url="https://tracker1.com/x"),
            Row(url="https://nottracker1.com/x"),
            Row(url="https://host3.example.com/casino-bonus/9"),
            Row(url="https://blog.example.net/post/7?download=free"),
            Row(url="https://clean.example.org/doc/5"),
            Row(url="not a url"),
        ])

    def test_subdomain_blocking_and_scores(self, spark):
        from hydra_spark.ml.urlfilter import url_quality_filter

        rows = {
            r.url: r
            for r in url_quality_filter(
                self._df(spark), ["tracker1.com", "spam.example.net"]
            ).collect()
        }
        assert rows["https://ads.tracker1.com/banner/1"].domain_blocked
        assert rows["https://tracker1.com/x"].domain_blocked
        # suffix match is label-aligned: nottracker1.com is NOT blocked
        assert not rows["https://nottracker1.com/x"].domain_blocked
        assert rows["https://host3.example.com/casino-bonus/9"].url_score == 1.5
        assert rows["https://blog.example.net/post/7?download=free"].url_score == 0.8
        assert rows["https://clean.example.org/doc/5"].keep
        # malformed URL: null host, never blocked, still scored
        bad = rows["not a url"]
        assert bad.host is None and not bad.domain_blocked and bad.keep

    def test_dataframe_blocklist_matches_literal_path(self, spark):
        from pyspark.sql import Row

        from hydra_spark.ml.urlfilter import url_quality_filter

        bl = ["tracker1.com", "spam.example.net"]
        bdf = spark.createDataFrame([Row(domain=d) for d in bl])
        a = sorted(map(tuple, url_quality_filter(self._df(spark), bl).collect()))
        b = sorted(map(tuple, url_quality_filter(self._df(spark), bdf).collect()))
        assert a == b

    def test_dataframe_path_is_shuffle_free(self, spark):
        from pyspark.sql import Row

        from hydra_spark.ml.urlfilter import url_quality_filter

        bdf = spark.createDataFrame([Row(domain="tracker1.com")])
        plan = (
            url_quality_filter(self._df(spark), bdf)
            ._jdf.queryExecution().executedPlan().toString()
        )
        assert "BroadcastHashJoin" in plan
        # the only shuffle allowed is the blocklist-side distinct (keyed
        # on _bd, tiny); the URL side must reach the joins unshuffled
        assert "Exchange hashpartitioning(url" not in plan
        assert "Exchange hashpartitioning(host" not in plan
        assert "Exchange hashpartitioning(_s" not in plan

    def test_threshold_and_custom_weights(self, spark):
        from hydra_spark.ml.urlfilter import url_quality_filter

        out = url_quality_filter(
            self._df(spark), [], keyword_weights={"banner": 0.3}, threshold=0.3
        )
        rows = {r.url: r.keep for r in out.collect()}
        assert not rows["https://ads.tracker1.com/banner/1"]
        assert rows["https://clean.example.org/doc/5"]


class TestNormalizeText:
    def test_nfc_composition_and_control_strip(self, spark):
        from pyspark.sql import Row

        from hydra_spark.ml.text import normalize_text

        df = spark.createDataFrame([
            Row(doc_id=0, text="café and Å"),   # decomposed
            Row(doc_id=1, text="café composed"),        # already NFC
            Row(doc_id=2, text="bell\x07 and del\x7f kept\ttab\nnl"),
            Row(doc_id=3, text=""),
        ])
        rows = {r.doc_id: r for r in normalize_text(df).collect()}
        assert rows[0].text_norm == "café and Å"
        assert rows[0].changed and rows[0].n_chars_after == rows[0].n_chars_before - 2
        assert rows[1].text_norm == "café composed" and not rows[1].changed
        assert rows[2].text_norm == "bell and del kept\ttab\nnl" and rows[2].changed
        assert rows[3].text_norm == "" and not rows[3].changed

    def test_nfkc_form(self, spark):
        from pyspark.sql import Row

        from hydra_spark.ml.text import normalize_text

        # NFKC folds the ligature ﬁ and fullwidth digits; NFC keeps them
        df = spark.createDataFrame([Row(doc_id=0, text="ﬁle １２")])
        [nfc] = normalize_text(df, form="NFC").collect()
        [nfkc] = normalize_text(df, form="NFKC").collect()
        assert nfc.text_norm == "ﬁle １２"
        assert nfkc.text_norm == "file 12"


def test_ivf_append_equals_bruteforce_and_prunes(spark, tmp_path):
    """Incremental add: build on half the corpus, append the rest;
    full probe over the updated index equals brute force on the union,
    and the appended rows land in existing cluster partitions."""
    import os

    from hydra_spark.ml import similarity

    base = spark.range(40).selectExpr(
        "id AS vec_id",
        "transform(sequence(0, 7), j -> CAST(hash(id, j) % 100 AS DOUBLE) / 100.0) AS embedding",
    ).cache()
    path = str(tmp_path / "idx")
    similarity.ivf_build_index(base.where("vec_id < 20"), path, n_clusters=4)
    similarity.ivf_append(spark, path, base.where("vec_id >= 20"))

    queries = base.where("vec_id < 2").selectExpr("vec_id AS query_id", "embedding")
    got = {
        (r.query_id, r.rank): r.neighbor_id
        for r in similarity.ivf_topk_indexed(spark, path, queries, k=5, n_probe=4).collect()
    }
    want = {
        (r.query_id, r.rank): r.neighbor_id
        for r in similarity.cosine_topk(base, queries, k=5).collect()
    }
    assert got == want
    # appended data went into the same partition layout (no new roots)
    parts = {d for d in os.listdir(path) if d.startswith("cluster=")}
    assert parts and all(d.split("=")[1].isdigit() for d in parts)

"""Deduplication family for web-text corpora.

Exact (hash groupBy), MinHash+LSH (shingle → minhash → band → bucket
join), SimHash (bit voting), n-gram Jaccard verification, embedding
cosine near-dup. Scale notes:

- exact dedup is ONE shuffle on a 64-bit hash (not the text itself).
- MinHash signatures are computed entirely JVM-side: k seeded xxhash64
  passes over the shingle array (`transform` + `array_min`).
- LSH banding turns all-pairs O(n²) into a groupBy per band; candidate
  pairs are verified with exact Jaccard on token sets. Hot buckets
  (boilerplate shingles) are capped to bound the self-join.
- SimHash bit-voting is numpy over Spark-computed token hashes — the
  only Python stage, Arrow-batched.
"""

from __future__ import annotations

import logging

import numpy as np
import pandas as pd

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from hydra_spark.parallel import fan_out
from pyspark.sql import types as T

from hydra_spark.ml.text import let_bound, shingle_hashes, shingles

logger = logging.getLogger(__name__)


def _cap_buckets(
    df: DataFrame, keys: list[str], max_bucket: int, what: str, log_dropped: bool = False
) -> DataFrame:
    """Keep only bucket groups with 2..max_bucket members — the standard
    hot-bucket guard that bounds every LSH self-join (a degenerate corpus
    otherwise makes one bucket quadratic). No silent caps: the cap is
    logged, and `log_dropped=True` additionally counts the dropped
    buckets (one extra small aggregation job — off in the hot path)."""
    w = Window.partitionBy(*keys)
    counted = df.withColumn("_bn", F.count("*").over(w))
    if log_dropped:
        n_dropped = (
            counted.where(F.col("_bn") > max_bucket).select(*keys).distinct().count()
        )
        if n_dropped:
            logger.warning(
                "%s: dropped %d hot bucket(s) larger than max_bucket=%d "
                "(coverage cap — raise max_bucket to include them)",
                what, n_dropped, max_bucket,
            )
    else:
        logger.info("%s: buckets capped at max_bucket=%d", what, max_bucket)
    return counted.where((F.col("_bn") > 1) & (F.col("_bn") <= max_bucket)).drop("_bn")


def normalized(text: Column | str) -> Column:
    t = F.col(text) if isinstance(text, str) else text
    return F.regexp_replace(F.lower(F.trim(t)), r"\s+", " ")


# ---------------------------------------------------------------------------
# exact
# ---------------------------------------------------------------------------

def exact_duplicates(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Adds (content_hash, dup_group_size, is_canonical): canonical = min
    id per normalized-content hash. One shuffle, map-side combinable.

    No fan_out: the window's hash exchange on content_hash carries the
    full row (text included) and redistributes anyway — pre-spreading
    shuffles the text payload twice (measured 1.5x slower at sf0.1,
    break-even at sf1)."""
    h = F.md5(normalized(text_col))
    w = Window.partitionBy("content_hash")
    return (
        df.withColumn("content_hash", h)
        .withColumn("dup_group_size", F.count("*").over(w))
        .withColumn("is_canonical", F.col(id_col) == F.min(id_col).over(w))
    )


def exact_dedup(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    return exact_duplicates(df, text_col, id_col).where("is_canonical").drop(
        "dup_group_size", "is_canonical"
    )


def incremental_dedup(
    new_df: DataFrame,
    prior_digests: DataFrame | None,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Cross-snapshot exact dedup — the Common-Crawl-monthly primitive:
    a NEW snapshot is deduplicated against the digests of everything
    already in the corpus (``prior_digests``, one ``digest`` column)
    AND against itself, without ever re-reading the prior text. Each
    new doc gets a status:

    - ``dup_prior``  — normalized content already in the corpus
    - ``dup_within`` — a non-first occurrence inside the new snapshot
    - ``kept``       — first sighting anywhere (the rows to append)

    Plan: ONE shuffle of the new snapshot keyed on the 16-byte digest
    covers both the within-snapshot first-occurrence window and (same
    key) the sort-merge left join against the prior digest table; the
    big prior side moves at most once and can be bucketed by digest so
    successive monthly runs skip its shuffle entirely. At 10^10 docs
    the prior table is ~a few hundred GB of digests — a sharded Bloom
    filter over it (hydra_spark.seen) makes a cheap prefilter that
    keeps definitely-new docs out of the join; the join stays as the
    exact verifier.

    The updated digest table for the next snapshot is
    ``prior_digests ∪ kept-row digests`` (see `updated_digests`).

    No fan_out: the digest window/join exchange redistributes anyway;
    a pre-shuffle of the text payload measured 1.5x slower at sf0.1.
    """
    keyed = new_df.select(F.col(id_col), F.md5(normalized(text_col)).alias("digest"))
    w = Window.partitionBy("digest")
    firsts = keyed.withColumn("_first", F.min(id_col).over(w))
    if prior_digests is None:
        prior = None
    else:
        prior = prior_digests.select("digest").distinct().withColumn("_prior", F.lit(True))
    if prior is not None:
        firsts = firsts.join(prior, "digest", "left")
    else:
        firsts = firsts.withColumn("_prior", F.lit(None).cast("boolean"))
    status = (
        F.when(F.col("_prior"), F.lit("dup_prior"))
        .when(F.col(id_col) != F.col("_first"), F.lit("dup_within"))
        .otherwise(F.lit("kept"))
    )
    return firsts.select(id_col, "digest", status.alias("status"))


def updated_digests(prior_digests: DataFrame | None, resolved: DataFrame) -> DataFrame:
    """Digest table for the NEXT snapshot: prior ∪ the digests this
    snapshot kept (dup_prior rows are already present; dup_within rows
    share their digest with a kept row). Distinct on the same key the
    store is bucketed by — map-side combinable."""
    kept = resolved.where(F.col("status") == "kept").select("digest")
    if prior_digests is None:
        return kept.distinct()
    return prior_digests.select("digest").union(kept).distinct()


# ---------------------------------------------------------------------------
# MinHash + LSH
# ---------------------------------------------------------------------------

def minhash_signature(
    text: Column | str, k: int = 32, ngram: int = 3, seed: int = 42, portable_md5: bool = False
) -> Column:
    """k min-hashes over word shingles — JVM-side.

    Default: array<long> of seeded xxhash64 passes over
    `shingle_hashes` — shingle STRINGS are never materialized and the k
    re-hash passes run over longs (the string n-gram allocation was the
    dominant cost of the signature stage).
    `portable_md5=True`: array<string> of min md5-hex of "<i>|<shingle>"
    — slower (hex materialization) but reproducible in any engine with
    an md5 builtin, which is what the cross-engine oracle check needs."""
    # let-bound: the k per-seed passes all reference the shingle array;
    # inlined it would be re-evaluated k times (lambda-bearing exprs are
    # excluded from Catalyst CSE — see text.let_bound).
    #
    # The per-seed lambdas come from FACTORY functions, never
    # `lambda s, i=i:` — pyspark counts defaulted params in the lambda's
    # arity, so a defaulted closure becomes a TWO-arg (element, index)
    # lambda and the "captured" python value is silently replaced by the
    # array-index Column (f"{i}|" stringifies to "Column<'y_N'>|").
    def _md5_pass(i: int):
        return lambda s: F.md5(F.encode(F.concat(F.lit(f"{i}|"), s), "UTF-8"))

    def _xx_pass(i: int):
        return lambda h: F.xxhash64(h, F.lit(seed + i))

    if portable_md5:
        return let_bound(
            shingles(text, ngram),
            lambda sh: F.array(
                *[F.array_min(F.transform(sh, _md5_pass(i))) for i in range(k)]
            ),
        )
    return let_bound(
        shingle_hashes(text, ngram),
        lambda sh: F.array(
            *[F.array_min(F.transform(sh, _xx_pass(i))) for i in range(k)]
        ),
    )


def minhash_lsh_candidates(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 32,
    bands: int = 8,
    seed: int = 42,
    max_bucket: int = 50,
    log_dropped: bool = False,
    portable_md5: bool = False,
) -> DataFrame:
    """Candidate near-dup pairs (id_a < id_b) from banded MinHash.

    bands × rows = k; same band hash in any band → candidate. Buckets
    larger than `max_bucket` (boilerplate) are dropped — logged as a
    coverage cap rather than exploding the self-join. `portable_md5`
    switches both hash stages to md5 strings ("<b>|<sig slice>") so the
    candidate set is reproducible in any md5-capable engine (the
    oracle-check path; same banding machinery either way).
    """
    rows = k // bands
    df = fan_out(df)  # guide §2.5 scan-parallelism guard
    sig = df.select(
        F.col(id_col).alias("_id"),
        minhash_signature(text_col, k, seed=seed, portable_md5=portable_md5).alias("sig"),
    )
    if portable_md5:
        band_cols = [
            F.md5(F.encode(F.concat(
                F.lit(f"{b}|"), F.array_join(F.slice("sig", b * rows + 1, rows), ",")
            ), "UTF-8")).alias("band_hash")
            for b in range(bands)
        ]
    else:
        band_cols = [
            F.xxhash64(F.array_join(F.transform(
                F.slice("sig", b * rows + 1, rows), lambda x: x.cast("string")
            ), ","), F.lit(b)).alias("band_hash")
            for b in range(bands)
        ]
    banded = sig.select(
        "_id", F.posexplode(F.array(*band_cols)).alias("band", "band_hash")
    )
    banded = _cap_buckets(
        banded, ["band", "band_hash"], max_bucket, "minhash_lsh_candidates", log_dropped
    )
    a = banded.select("band", "band_hash", F.col("_id").alias("id_a"))
    b = banded.select("band", "band_hash", F.col("_id").alias("id_b"))
    return (
        a.join(b, ["band", "band_hash"])
        .where(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )


def jaccard_verify(
    df: DataFrame,
    pairs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    ngram: int = 3,
    threshold: float = 0.8,
) -> DataFrame:
    """Exact n-gram Jaccard on candidate pairs → (id_a, id_b, jaccard).

    The corpus is pre-filtered to ids that appear in a candidate pair
    (semi-join against the tiny pair-id set, broadcast by Catalyst)
    BEFORE the shingle arrays are built: candidates are a vanishing
    fraction of the corpus by LSH construction, so building shingles
    for every document only to discard them in the inner joins was the
    dominant cost (guide §2.3 — decide on a lightweight proxy first).
    Inner-join semantics are unchanged, so the result is identical."""
    cand_ids = (
        pairs.select(F.col("id_a").alias("_cid"))
        .unionByName(pairs.select(F.col("id_b").alias("_cid")))
        .distinct()
    )
    df = df.join(cand_ids, df[id_col] == F.col("_cid"), "left_semi")
    toks = df.select(
        F.col(id_col).alias("_id"), F.array_distinct(shingles(text_col, ngram)).alias("toks")
    )
    j = (
        pairs.join(toks.withColumnRenamed("_id", "id_a").withColumnRenamed("toks", "toks_a"), "id_a")
        .join(toks.withColumnRenamed("_id", "id_b").withColumnRenamed("toks", "toks_b"), "id_b")
        .withColumn("inter", F.size(F.array_intersect("toks_a", "toks_b")))
        .withColumn("uni", F.size(F.array_union("toks_a", "toks_b")))
        .withColumn(
            "jaccard",
            F.when(F.col("uni") > 0, F.col("inter") / F.col("uni")).otherwise(F.lit(0.0)),
        )
    )
    return j.where(F.col("jaccard") >= threshold).select("id_a", "id_b", "jaccard")


def minhash_dedup(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    threshold: float = 0.8,
    **lsh_kw,
) -> DataFrame:
    """Drop near-duplicates: every doc that matches a lower-id doc above
    the Jaccard threshold is removed (connected components approximated
    by min-id anchoring — standard single-pass web-dedup; use
    `minhash_dedup_cc` for exact transitive clusters)."""
    pairs = minhash_lsh_candidates(df, text_col, id_col, **lsh_kw)
    dups = jaccard_verify(df, pairs, text_col, id_col, threshold=threshold)
    losers = dups.select(F.col("id_b").alias(id_col)).distinct()
    return df.join(losers, id_col, "left_anti")


def connected_components(
    pairs: DataFrame, max_iter: int = 25, check_every: int = 3
) -> DataFrame:
    """(id, component) for every node in `pairs(id_a, id_b)`, where
    component = the minimum id reachable — exact transitive dedup
    clusters (A~B, B~C ⇒ {A,B,C} even when A~C was never a candidate).

    Iterative min-label propagation: each round every node takes the
    min of its own label and its neighbors' labels; converges in
    O(diameter) rounds (duplicate clusters are near-cliques, so
    typically 2-3). Per round: ONE join edges⋈labels + ONE min-agg —
    both map-side combinable; lineage is cut with localCheckpoint every
    round so plans stay flat at web scale. Convergence is detected by a
    changed-labels count every `check_every` rounds (an extra tiny job,
    amortized). Raises after `max_iter` rounds — a pathological path
    graph, not a dedup workload."""
    edges = pairs.select(F.col("id_a").alias("src"), F.col("id_b").alias("dst"))
    edges = edges.unionByName(
        edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    ).persist()
    labels = (
        edges.select(F.col("src").alias("id")).distinct().withColumn("comp", F.col("id"))
    ).localCheckpoint()
    for it in range(max_iter):
        nbr_min = (
            edges.join(labels.select(F.col("id").alias("dst"), "comp"), "dst")
            .groupBy(F.col("src").alias("id"))
            .agg(F.min("comp").alias("nbr_comp"))
        )
        new_labels = (
            labels.join(nbr_min, "id", "left")
            .select("id", F.least("comp", F.coalesce("nbr_comp", "comp")).alias("comp"))
        ).localCheckpoint()
        if it % check_every == check_every - 1 or it == max_iter - 1:
            changed = (
                new_labels.join(labels.withColumnRenamed("comp", "old"), "id")
                .where(F.col("comp") != F.col("old"))
                .count()
            )
            if changed == 0:
                edges.unpersist()
                return new_labels
        labels = new_labels
    edges.unpersist()
    raise RuntimeError(f"connected_components did not converge in {max_iter} rounds")


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Cross-snapshot corpus diff — the companion report to
    `incremental_dedup` (which dedups by CONTENT anywhere; this tracks
    each document IDENTITY across two crawls, the "new/changed/gone
    URLs this month" product a monthly crawl publishes):

    - ``added``     — id only in the new snapshot
    - ``removed``   — id only in the old snapshot
    - ``changed``   — id in both, content digest differs
    - ``unchanged`` — id in both, content digest identical

    Returns (id, status, old_digest, new_digest). Plan: each side
    reduces to (id, md5) in its scan, then ONE full-outer sort-merge
    join on id — no text ever shuffles; at 10^10 docs both digest
    tables can be bucketed by id so successive monthly diffs skip the
    shuffle entirely.

    No fan_out here: the join's hash exchange on _id redistributes both
    sides anyway, and a pre-join round-robin would shuffle the full text
    payload (measured 2.2x slower at bench scale)."""
    o = old.select(
        F.col(id_col).alias("_id"), F.md5(F.col(text_col)).alias("old_digest")
    )
    n = new.select(
        F.col(id_col).alias("_id"), F.md5(F.col(text_col)).alias("new_digest")
    )
    j = o.join(n, "_id", "full_outer")
    status = (
        F.when(F.col("old_digest").isNull(), F.lit("added"))
        .when(F.col("new_digest").isNull(), F.lit("removed"))
        .when(F.col("old_digest") != F.col("new_digest"), F.lit("changed"))
        .otherwise(F.lit("unchanged"))
    )
    return j.select(
        F.col("_id").alias(id_col), status.alias("status"), "old_digest", "new_digest"
    )


def keep_best_per_cluster(
    df: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    score_col: str = "score",
) -> DataFrame:
    """Canonical-document selection — the step AFTER clustering that
    minhash_dedup_cc hardwires to "keep the min id": given the corpus
    and verified duplicate pairs, keep the HIGHEST-``score_col`` doc of
    each connected component (ties → lowest id), so the survivor of a
    dup cluster is its best-quality copy, not an arbitrary one (the
    quality-aware variant used when dedup runs after quality scoring).
    Returns the full decision table (id, component, score, keep) —
    filter ``keep`` for the corpus, ``NOT keep`` for the drop list.

    Scale: components are computed only over nodes appearing in pairs
    (dup clusters — a small fraction of the corpus); the per-cluster
    argmax is ONE map-side-combinable ``min_by`` aggregate over that
    small set, NOT a window sort over the corpus; docs outside any
    cluster pass through as their own singleton with keep=true. The
    corpus shuffles once, on id, to meet the component labels."""
    comps = connected_components(pairs)
    member = df.select(
        F.col(id_col).alias("id"), F.col(score_col).alias("_score")
    ).join(comps, "id", "left")
    keepers = (
        member.where(F.col("comp").isNotNull())
        .groupBy("comp")
        .agg(
            F.min_by(
                "id", F.struct((-F.col("_score")).alias("s"), F.col("id").alias("i"))
            ).alias("_keeper")
        )
    )
    return member.join(keepers, "comp", "left").select(
        F.col("id").alias(id_col),
        F.coalesce("comp", "id").alias("component"),
        F.col("_score").alias(score_col),
        (F.col("comp").isNull() | (F.col("id") == F.col("_keeper"))).alias("keep"),
    )


def minhash_dedup_cc(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    threshold: float = 0.8,
    **lsh_kw,
) -> DataFrame:
    """Exact-cluster dedup: keep one doc (the min id) per CONNECTED
    component of verified near-dup pairs. Catches transitive chains the
    single-pass anchoring misses."""
    pairs = minhash_lsh_candidates(df, text_col, id_col, **lsh_kw)
    dups = jaccard_verify(df, pairs, text_col, id_col, threshold=threshold)
    comps = connected_components(dups.select("id_a", "id_b"))
    losers = comps.where(F.col("id") != F.col("comp")).select(F.col("id").alias(id_col))
    return df.join(losers, id_col, "left_anti")


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------

_SIMHASH_OUT = T.LongType()


def simhash(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id", portable_md5: bool = False
) -> DataFrame:
    """64-bit SimHash: token hashes computed JVM-side (xxhash64 per
    word), bit voting in numpy (Arrow-batched pandas UDF).

    `portable_md5=True` swaps the word hash for the 16-bit value of the
    first 4 hex chars of md5(word) — the voting path is identical (bits
    16..63 simply never win), and the result is reproducible in any
    engine with md5 + nibble arithmetic (the oracle-check path)."""
    df = fan_out(df)  # guide §2.5 scan-parallelism guard
    words = F.split(F.lower(F.trim(F.col(text_col))), r"\s+")
    if portable_md5:
        word_hash = lambda w: F.conv(F.substring(F.md5(F.encode(w, "UTF-8")), 1, 4), 16, 10).cast("long")  # noqa: E731
    else:
        word_hash = lambda w: F.xxhash64(w)  # noqa: E731
    hashed = df.withColumn("_whashes", F.transform(words, word_hash))

    @F.pandas_udf(_SIMHASH_OUT)
    def vote(hashes: pd.Series) -> pd.Series:
        out = np.zeros(len(hashes), dtype=np.int64)
        for i, hs in enumerate(hashes):
            if hs is None or len(hs) == 0:
                continue
            a = np.asarray(hs, dtype=np.int64).astype(np.uint64)
            bits = ((a[:, None] >> np.arange(64, dtype=np.uint64)[None, :]) & np.uint64(1))
            votes = (bits.sum(axis=0) * 2 > len(a)).astype(np.uint64)
            out[i] = (votes << np.arange(64, dtype=np.uint64)).sum().astype(np.int64)
        return pd.Series(out)

    return hashed.withColumn("simhash", vote("_whashes")).drop("_whashes")


def simhash_near_dups(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_hamming: int = 3,
    max_bucket: int = 200,
    log_dropped: bool = False,
) -> DataFrame:
    """Near-dup pairs by SimHash: block on 4 16-bit chunks (any chunk
    equal → candidate, guaranteed to catch hamming ≤ 3 pairs... sic:
    ≤ 3 differing bits can't hit all 4 chunks), verify with popcount.

    Chunk buckets are capped like the MinHash bands: a degenerate corpus
    (all-empty texts → simhash 0) would otherwise put everything in one
    chunk bucket and go quadratic."""
    sh = simhash(df, text_col, id_col).select(F.col(id_col).alias("_id"), "simhash")
    chunks = [
        F.shiftrightunsigned(F.col("simhash"), 16 * c)
        .bitwiseAND(F.lit(0xFFFF).cast("long"))
        .alias(f"c{c}")
        for c in range(4)
    ]
    blocked = sh.select("_id", "simhash", F.posexplode(F.array(*chunks)).alias("chunk", "chunk_val"))
    blocked = _cap_buckets(
        blocked, ["chunk", "chunk_val"], max_bucket, "simhash_near_dups", log_dropped
    )
    a = blocked.select("chunk", "chunk_val", F.col("_id").alias("id_a"), F.col("simhash").alias("sh_a"))
    b = blocked.select("chunk", "chunk_val", F.col("_id").alias("id_b"), F.col("simhash").alias("sh_b"))
    pairs = (
        a.join(b, ["chunk", "chunk_val"])
        .where(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", "sh_a", "sh_b")
        .distinct()
    )
    hamming = F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b")))
    return pairs.withColumn("hamming", hamming).where(F.col("hamming") <= max_hamming).select(
        "id_a", "id_b", "hamming"
    )


# ---------------------------------------------------------------------------
# embedding cosine near-dup
# ---------------------------------------------------------------------------

def _cosine(a: Column, b: Column) -> Column:
    dot = F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, v: acc + v)
    na = F.sqrt(F.aggregate(F.transform(a, lambda x: x * x), F.lit(0.0), lambda acc, v: acc + v))
    nb = F.sqrt(F.aggregate(F.transform(b, lambda x: x * x), F.lit(0.0), lambda acc, v: acc + v))
    return dot / (na * nb)


def embedding_near_dups(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    threshold: float = 0.95,
    n_planes: int = 12,
    seed: int = 42,
    max_bucket: int = 200,
    log_dropped: bool = False,
) -> DataFrame:
    """Cosine near-dup pairs via random-hyperplane LSH blocking + exact
    cosine verify. Plane projections run in numpy (one matmul per Arrow
    batch); the bucket join and cosine verify are JVM-side.

    Hyperplane buckets are capped at `max_bucket`: a hot bucket (near-
    zero or heavily duplicated embeddings) would otherwise make the
    self-join quadratic — the one scale-killer in an uncapped LSH.

    No fan_out: the bucket self-join re-shuffles by bucket anyway; a
    pre-shuffle of the embedding arrays costs more than the single-task
    signature matmul saves (measured 1.35x slower at bench scale)."""
    from hydra_spark.ml.similarity import hyperplane_signature

    sig = hyperplane_signature(df, vec_col, n_planes=n_planes, seed=seed)
    sig = _cap_buckets(
        sig.select(F.col(id_col).alias("_id"), F.col(vec_col).alias("_v"), "bucket"),
        ["bucket"], max_bucket, "embedding_near_dups", log_dropped,
    )
    a = sig.select(F.col("_id").alias("id_a"), F.col("_v").alias("v_a"), "bucket")
    b = sig.select(F.col("_id").alias("id_b"), F.col("_v").alias("v_b"), "bucket")
    pairs = a.join(b, "bucket").where(F.col("id_a") < F.col("id_b"))
    cos = _cosine(
        F.col("v_a").cast("array<double>"), F.col("v_b").cast("array<double>")
    )
    return (
        pairs.withColumn("cosine", cos)
        .where(F.col("cosine") >= threshold)
        .select("id_a", "id_b", F.round("cosine", 6).alias("cosine"))
        .distinct()
    )


def mirror_sets(
    df: DataFrame,
    url_col: str = "url",
    text_col: str = "text",
    digest_col: str | None = None,
    min_hosts: int = 2,
) -> DataFrame:
    """Cross-host mirror detection (Bharat & Broder, "Mirror, mirror on
    the web", WWW 1999; Cho, Shivakumar & Garcia-Molina, "Finding
    replicated Web collections", SIGMOD 2000): group pages by content
    digest and keep the digests served from ≥ `min_hosts` distinct
    hosts.  A crawler uses the result to collapse mirrored trees to one
    canonical host before recrawl budgeting; a corpus builder uses it
    as the cross-site tier of exact dedup.

    Scale: pages reduce to (digest, host, url) in the scan — text never
    shuffles — then ONE aggregate keyed on digest (map-side combinable
    counts; min(url) picks the deterministic canonical).  Returns
    (digest, n_hosts, n_urls, canonical_url).

    No fan_out: the digest aggregate's exchange redistributes anyway,
    and a pre-agg round-robin would shuffle the text payload before the
    scan-side projection (measured 1.24x slower at bench scale)."""
    host_re = r"^[a-zA-Z][a-zA-Z0-9+.\-]*://([^/?#:]+)"
    digest = F.col(digest_col) if digest_col else F.md5(F.col(text_col))
    host = F.lower(F.regexp_extract(F.col(url_col), host_re, 1))
    return (
        df.select(digest.alias("digest"), host.alias("host"), F.col(url_col).alias("url"))
        .groupBy("digest")
        .agg(
            F.countDistinct("host").alias("n_hosts"),
            F.count(F.lit(1)).alias("n_urls"),
            F.min("url").alias("canonical_url"),
        )
        .where(F.col("n_hosts") >= min_hosts)
    )

"""Webtext corpus-curation operators: Gopher repetition stats,
corpus-level line dedup, benchmark decontamination, unigram-LM quality
scoring, deterministic stratified sampling, PII redaction, per-source
token accounting, and GPT-style sequence-packing placement.

The reference (datagouv/hydra) stops at per-resource analysis; these are
the standard curation passes a Common-Crawl-scale training-data pipeline
runs DOWNSTREAM of the crawl, published in: Rae et al. 2021 (Gopher,
§A1.1 repetition filters), Raffel et al. 2020 (C4, corpus-level line
dedup), Penedo et al. 2023 (RefinedWeb, line-wise dedup), Brown et al.
2020 (GPT-3, appendix C n-gram decontamination; appendix A the
quality classifier), Lee et al. 2021 (ExactSubstr duplicate-span
excision), Wenzek et al. 2020 (CCNet perplexity head/middle/tail
buckets).

Scale notes (100 TB design points):

- ``repetition_features`` is PURE column expressions — per-document
  stats need no shuffle at all; everything stays in whole-stage codegen
  (array_sort + one aggregate() run-length pass, O(L log L) per doc).
- ``chunk_dedup_corpus`` is the one genuinely corpus-wide op: ONE
  shuffle keyed by chunk hash for the frequency table (exact distinct-doc
  counts, two-phase partial agg), one co-keyed join back, one
  re-assembly agg keyed by doc_id. Viral chunks (boilerplate present in
  millions of pages) are the skew hazard — the frequency side is one row
  per chunk so the join skew sits on the exploded side; AQE skew-join
  splits it, and `spark.sql.adaptive.enabled` is on in our session.
- ``decontaminate`` broadcasts the benchmark n-gram set (benchmarks are
  ~1e6 grams — MBs); the corpus side never shuffles.

Text is segmented into non-overlapping ``k``-word chunks as the "line"
unit: the synthetic `documents` corpus is single-line, and fixed-width
chunks make the dedup unit deterministic. On real webtext pass
``split_lines=True`` to segment on newlines like C4/RefinedWeb do.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from hydra_spark.parallel import fan_out

from .text import let_bound, shingle_hashes, shingles

__all__ = [
    "chunk_segments",
    "repetition_features",
    "chunk_dedup_corpus",
    "decontaminate",
    "decontaminate_spans",
    "duplicate_spans",
    "unigram_lm_score",
    "bigram_lm_score",
    "pmi_collocations",
    "nb_quality_classifier",
    "perplexity_buckets",
    "uniform_hash",
    "stratified_sample",
    "exact_stratified_sample",
    "domain_mix",
    "leakage_safe_splits",
    "redact_pii",
    "corpus_token_stats",
    "pack_sequences",
    "gopher_quality_flags",
    "gopher_passes",
    "c4_quality_flags",
    "c4_passes",
]


def chunk_segments(text: Column | str, k: int = 4, split_lines: bool = False) -> Column:
    """array<string> of non-overlapping ``k``-word chunks (lowercased),
    the dedup/repetition unit. ``split_lines=True`` segments on newlines
    instead (the C4/RefinedWeb unit for real multi-line webtext)."""
    t = F.col(text) if isinstance(text, str) else text
    if split_lines:
        return F.split(t, r"\n")

    def build(words):
        nseg = F.ceil(F.size(words) / F.lit(float(k))).cast("int")
        idx = F.sequence(F.lit(0), F.greatest(nseg, F.lit(1)) - 1)
        return F.transform(idx, lambda i: F.array_join(F.slice(words, i * k + 1, k), " "))

    # let-bound: the split must evaluate once per row, not once per chunk
    return let_bound(F.split(F.lower(F.trim(t)), r"\s+"), build)


def _chunk_chars(chunks: Column) -> Column:
    """Total characters across a chunk array (JVM aggregate, no UDF)."""
    return F.aggregate(chunks, F.lit(0), lambda acc, x: acc + F.length(x))


def _top_run(sorted_arr: Column) -> Column:
    """struct(gram, cnt) of the most frequent element of a SORTED array,
    ties broken by first-in-sort-order (= lexicographically smallest),
    via a single run-length aggregate() pass — no shuffle, no explode."""
    init = F.struct(
        F.lit(None).cast("string").alias("prev"),
        F.lit(0).alias("run"),
        F.lit(0).alias("best"),
        F.lit(None).cast("string").alias("bestg"),
    )

    def step(acc, x):
        run = F.when(x.eqNullSafe(acc.prev), acc.run + 1).otherwise(F.lit(1))
        better = run > acc.best
        return F.struct(
            x.alias("prev"),
            run.alias("run"),
            F.when(better, run).otherwise(acc.best).alias("best"),
            F.when(better, x).otherwise(acc.bestg).alias("bestg"),
        )

    return F.aggregate(
        sorted_arr,
        init,
        step,
        lambda acc: F.struct(acc.bestg.alias("gram"), acc.best.alias("cnt")),
    )


def repetition_features(
    df: DataFrame, text_col: str = "text", k: int = 4, id_col: str = "doc_id"
) -> DataFrame:
    """Gopher-style repetition stats per document (Rae et al. 2021
    §A1.1), entirely as column expressions — ZERO shuffle:

    - ``dup_chunk_frac``: fraction of chunks that are repeats of an
      earlier chunk in the same doc ((n - n_distinct) / n).
    - ``dup_chunk_char_frac``: fraction of characters sitting in those
      repeated occurrences.
    - ``top_2gram``, ``top_2gram_count``, ``top_2gram_char_frac``: the
      most frequent overlapping word 2-gram and the fraction of the
      document's characters covered by its occurrences (count ties break
      to the lexicographically smallest gram so results are
      deterministic and oracle-comparable).

    A doc exceeding Gopher's published thresholds (dup_line_frac > 0.30,
    top_2gram_char_frac > 0.20) is what a curation pipeline drops.
    """
    df = fan_out(df)  # guide §2.5 scan-parallelism guard
    # Two projections: higher-order-function expressions are excluded
    # from Catalyst's common-subexpression elimination, so computing the
    # chunk array inline in every stat column would re-split the text
    # six times per row. Materializing the arrays as named columns first
    # makes them per-row locals inside the same codegen stage.
    staged = df.select(
        id_col,
        F.length(F.col(text_col)).alias("_doc_chars"),
        chunk_segments(text_col, k).alias("_chunks"),
        F.array_sort(shingles(text_col, 2)).alias("_grams2"),
    ).select(
        id_col,
        "_doc_chars",
        "_chunks",
        F.array_distinct("_chunks").alias("_dis"),
        _top_run(F.col("_grams2")).alias("_top"),
    )
    chunks, dis = F.col("_chunks"), F.col("_dis")
    n = F.size(chunks)
    nd = F.size(dis)
    tot_chars = _chunk_chars(chunks)
    dis_chars = _chunk_chars(dis)
    top = F.col("_top")
    doc_chars = F.col("_doc_chars")
    return staged.select(
        id_col,
        n.alias("n_chunks"),
        F.round((n - nd) / F.greatest(n, F.lit(1)).cast("double"), 6).alias("dup_chunk_frac"),
        F.round(
            (tot_chars - dis_chars) / F.greatest(tot_chars, F.lit(1)).cast("double"), 6
        ).alias("dup_chunk_char_frac"),
        top.gram.alias("top_2gram"),
        top.cnt.alias("top_2gram_count"),
        F.round(
            (top.cnt * F.length(top.gram)) / F.greatest(doc_chars, F.lit(1)).cast("double"), 6
        ).alias("top_2gram_char_frac"),
    )


def chunk_dedup_corpus(
    df: DataFrame,
    text_col: str = "text",
    k: int = 4,
    max_doc_freq: int = 1,
    keep_first: bool = True,
) -> DataFrame:
    """Corpus-level line dedup (C4 / RefinedWeb): a chunk occurring in
    more than ``max_doc_freq`` distinct documents is boilerplate; drop
    every occurrence — except, with ``keep_first``, the single earliest
    one (min (doc_id, pos)), which is C4's keep-one-copy policy.

    Plan (guide §8: decide on lightweight proxies, move the text once):
    every shuffle except the final doc-keyed re-attach carries only
    (doc_id, pos, xxhash64(chunk)) — the chunk STRINGS never cross an
    exchange. posexplode → ONE slim shuffle keyed on the hash for the
    exact distinct-doc frequency table (two-phase partial agg) + the
    earliest occurrence (min struct — same agg, no extra pass) → the
    frequency table is pre-filtered to boilerplate hashes only
    (df_count > max_doc_freq, a vanishing fraction of distinct chunks)
    before a co-keyed join that yields the DROP positions → drop-lists
    aggregate per doc → one join back to the docs, which rebuild
    locally by filtering their own chunk array by position. A 64-bit
    hash collision between distinct chunks would merge their
    frequencies — P ≈ n²/2⁶⁵, negligible below ~10¹² distinct chunks
    (and biased toward over-removal of boilerplate, never corruption).
    Returns one row per input doc: (doc_id, text_deduped, n_chunks,
    n_removed). Docs reduced to nothing keep an empty string, so
    kept+dropped accounting stays exact.
    """
    df = fan_out(df)  # guide §2.5 scan-parallelism guard
    base = df.select("doc_id", chunk_segments(text_col, k).alias("chunks"))
    ex_h = base.select("doc_id", F.posexplode("chunks").alias("pos", "chunk")).select(
        "doc_id", "pos", F.xxhash64("chunk").alias("chunk_h")
    )
    freq = ex_h.groupBy("chunk_h").agg(
        F.countDistinct("doc_id").alias("df_count"),
        F.min(F.struct("doc_id", "pos")).alias("first_occ"),
    )
    boiler = freq.where(F.col("df_count") > max_doc_freq)
    dropped = ex_h.join(boiler, "chunk_h")
    if keep_first:
        dropped = dropped.where(
            ~((F.col("doc_id") == F.col("first_occ.doc_id")) & (F.col("pos") == F.col("first_occ.pos")))
        )
    drops = dropped.groupBy("doc_id").agg(
        F.collect_list("pos").alias("_drop_pos"), F.count("*").alias("_n_removed")
    )
    rebuilt = F.array_join(
        F.filter("chunks", lambda c, i: ~F.array_contains(F.col("_drop_pos"), i)), " "
    )
    return base.join(drops, "doc_id", "left").select(
        "doc_id",
        F.when(F.col("_drop_pos").isNull(), F.array_join("chunks", " "))
        .otherwise(rebuilt)
        .alias("text_deduped"),
        F.size("chunks").alias("n_chunks"),
        F.coalesce("_n_removed", F.lit(0)).cast("long").alias("n_removed"),
    )


def unigram_lm_score(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    vocab_size: int = 50_000,
) -> DataFrame:
    """CCNet-style language-model quality proxy (Wenzek et al. 2020 use
    a KenLM 5-gram; the unigram variant keeps the same shape fully
    inside Spark): score = -mean log10 p(word) under the corpus's own
    unigram distribution, truncated to the top ``vocab_size`` words
    (out-of-vocabulary words get a 0.5-count smoothed probability).
    High score = rare-word soup (boilerplate/gibberish); low = fluent.

    Plan: one word-count aggregate (map-side combinable) → global top-K
    on the aggregated vocab (tie-broken by word for determinism) →
    BROADCAST vocab + 1-row total joined against the exploded corpus (no
    corpus shuffle) → one re-agg by doc. The vocab truncation is what
    makes the broadcast feasible at 100 TB — full web vocabularies are
    ~1e9 words, top-50k covers the mass.

    Returns (id_col, n_words, lm_score).
    """
    df = fan_out(df)  # guide §2.5 scan-parallelism guard
    words = df.select(
        F.col(id_col), F.explode(F.split(F.lower(F.trim(F.col(text_col))), r"\s+")).alias("word")
    )
    freq = words.groupBy("word").agg(F.count("*").alias("cnt"))
    vocab = freq.orderBy(F.desc("cnt"), "word").limit(vocab_size)
    total = words.agg(F.count("*").cast("double").alias("_total"))
    scored = (
        words.join(F.broadcast(vocab), "word", "left")
        .crossJoin(F.broadcast(total))
        .withColumn("_lp", F.log10(F.coalesce(F.col("cnt").cast("double"), F.lit(0.5)) / F.col("_total")))
    )
    return scored.groupBy(id_col).agg(
        F.count("*").alias("n_words"),
        F.round(-F.avg("_lp"), 6).alias("lm_score"),
    )


def bigram_lm_score(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    vocab_size: int = 50_000,
    lam: float = 0.7,
) -> DataFrame:
    """Interpolated bigram LM quality score — one order up from
    `unigram_lm_score` toward CCNet's KenLM 5-gram (Wenzek et al. 2020;
    Jelinek-Mercer interpolation): per bigram position,
    p = lam * c(prev,w)/c(prev) + (1-lam) * p_unigram(w), and the doc
    score is -mean log10 p. Word order now matters: shuffled fluent
    text scores WORSE than the original (the signal unigram scoring is
    blind to). Missing counts back off (bigram->0, prev/word->0.5
    smoothed), so p > 0 always. Docs with fewer than two words have no
    bigram positions and are not scored.

    Plan: two map-side-combinable count aggregates (bigrams, unigrams)
    truncated to the top ``vocab_size`` rows each and BROADCAST — the
    truncation is what keeps the broadcast feasible at 100 TB, exactly
    as in the unigram scorer — joined against the exploded bigram
    stream, then ONE re-agg by doc. Returns (id, n_bigrams, lm2_score).
    """
    df = fan_out(df)  # guide §2.5 scan-parallelism guard
    words_arr = F.split(F.lower(F.trim(F.col(text_col))), r"\s+")
    base = df.select(F.col(id_col), words_arr.alias("_w"))
    bigrams = F.when(
        F.size("_w") >= 2,
        F.transform(
            F.sequence(F.lit(2), F.greatest(F.size("_w"), F.lit(2))),
            lambda i: F.struct(
                F.element_at(F.col("_w"), i - 1).alias("prev"),
                F.element_at(F.col("_w"), i).alias("w"),
            ),
        ),
    ).otherwise(F.array().cast("array<struct<prev:string,w:string>>"))
    pairs = base.select(F.col(id_col), F.explode(bigrams).alias("_bg")).select(
        id_col, F.col("_bg.prev").alias("prev"), F.col("_bg.w").alias("w")
    )
    words = base.select(F.explode("_w").alias("word"))
    uni = (
        words.groupBy("word")
        .agg(F.count(F.lit(1)).alias("cnt_u"))
        .orderBy(F.desc("cnt_u"), "word")
        .limit(vocab_size)
    )
    total = words.agg(F.count(F.lit(1)).cast("double").alias("_total"))
    big = (
        pairs.groupBy("prev", "w")
        .agg(F.count(F.lit(1)).alias("cnt_b"))
        .orderBy(F.desc("cnt_b"), "prev", "w")
        .limit(vocab_size)
    )
    scored = (
        pairs.join(F.broadcast(big), ["prev", "w"], "left")
        .join(
            F.broadcast(uni.select(F.col("word").alias("prev"), F.col("cnt_u").alias("cnt_prev"))),
            "prev",
            "left",
        )
        .join(F.broadcast(uni.select(F.col("word").alias("w"), "cnt_u")), "w", "left")
        .crossJoin(F.broadcast(total))
    )
    # Conditional p(w|prev) is clamped to 1: a bigram can survive the
    # top-K bigram cut while its prev word misses the unigram cut, and
    # cnt_b / 0.5 would then exceed 1 (negative log-loss skewing docs).
    p = F.lit(float(lam)) * F.least(
        F.lit(1.0),
        F.coalesce(F.col("cnt_b").cast("double"), F.lit(0.0))
        / F.coalesce(F.col("cnt_prev").cast("double"), F.lit(0.5)),
    ) + F.lit(1.0 - float(lam)) * (
        F.coalesce(F.col("cnt_u").cast("double"), F.lit(0.5)) / F.col("_total")
    )
    return scored.withColumn("_lp", F.log10(p)).groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_bigrams"),
        F.round(-F.avg("_lp"), 6).alias("lm2_score"),
    )


def pmi_collocations(
    df: DataFrame,
    text_col: str = "text",
    k: int = 100,
    min_count: int = 5,
    vocab_size: int = 50_000,
) -> DataFrame:
    """Top-`k` collocations by pointwise mutual information (Church &
    Hanks 1990): PMI(x,y) = log10( p(xy) / (p(x)·p(y)) ) over adjacent
    word pairs — the corpus-analysis pass that surfaces multiword
    expressions ("new york", "machine learning") versus merely frequent
    pairs, and the signal tokenizer-vocabulary curation ranks merge
    candidates by. `min_count` drops rare-pair noise (PMI famously
    explodes for hapax pairs); ties break on (pmi desc, pair asc).

    Scale: the same two truncated top-`vocab_size` count tables as
    `bigram_lm_score` (map-side-combinable aggregates); PMI is computed
    ON the tiny bigram table itself — the corpus is never rescanned or
    shuffled beyond the two counts — and the final cut is
    TakeOrderedAndProject. Returns (prev, w, cnt, pmi)."""
    df = fan_out(df)  # guide §2.5 scan-parallelism guard
    words_arr = F.split(F.lower(F.trim(F.col(text_col))), r"\s+")
    base = df.select(words_arr.alias("_w"))
    bigrams = F.when(
        F.size("_w") >= 2,
        F.transform(
            F.sequence(F.lit(2), F.greatest(F.size("_w"), F.lit(2))),
            lambda i: F.struct(
                F.element_at(F.col("_w"), i - 1).alias("prev"),
                F.element_at(F.col("_w"), i).alias("w"),
            ),
        ),
    ).otherwise(F.array().cast("array<struct<prev:string,w:string>>"))
    pairs = base.select(F.explode(bigrams).alias("_bg")).select(
        F.col("_bg.prev").alias("prev"), F.col("_bg.w").alias("w")
    )
    words = base.select(F.explode("_w").alias("word"))
    uni = (
        words.groupBy("word")
        .agg(F.count(F.lit(1)).alias("cnt_u"))
        .orderBy(F.desc("cnt_u"), "word")
        .limit(vocab_size)
    )
    n_words = words.agg(F.count(F.lit(1)).cast("double").alias("_nw"))
    big = (
        pairs.groupBy("prev", "w")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .where(F.col("cnt") >= min_count)
        .orderBy(F.desc("cnt"), "prev", "w")
        .limit(vocab_size)
    )
    n_pairs = pairs.agg(F.count(F.lit(1)).cast("double").alias("_np"))
    scored = (
        big.join(
            F.broadcast(uni.select(F.col("word").alias("prev"), F.col("cnt_u").alias("cnt_prev"))),
            "prev",
        )
        .join(F.broadcast(uni.select(F.col("word").alias("w"), "cnt_u")), "w")
        .crossJoin(F.broadcast(n_pairs))
        .crossJoin(F.broadcast(n_words))
    )
    pmi = F.log10(
        (F.col("cnt") / F.col("_np"))
        / ((F.col("cnt_prev") / F.col("_nw")) * (F.col("cnt_u") / F.col("_nw")))
    )
    return (
        scored.select("prev", "w", "cnt", F.round(pmi, 6).alias("pmi"))
        .orderBy(F.desc("pmi"), "prev", "w")
        .limit(k)
    )


def uniform_hash(key: Column, seed: int = 13) -> Column:
    """Deterministic uniform double in [0, 1) from md5(seed|key) — the
    first 8 hex nibbles as a 32-bit integer over 2^32. Portable: any
    engine with md5 reproduces it bit-for-bit (exact rational value), so
    sampling decisions replay across engines and cluster sizes."""
    h = F.conv(F.substring(F.md5(F.concat(F.lit(f"{seed}|"), key)), 1, 8), 16, 10).cast("long")
    return h / F.lit(float(1 << 32))


def stratified_sample(
    df: DataFrame,
    rates: dict[str, float],
    strata_col: str = "source",
    key_col: str = "doc_id",
    seed: int = 13,
    default_rate: float = 0.0,
) -> DataFrame:
    """Deterministic per-stratum sampling — the corpus-mixing primitive
    (training pipelines up/down-weight sources; e.g. The Pile's and
    LLaMA's per-source epochs). ``rates[stratum]`` is the keep
    probability; membership is ``uniform_hash(key) < rate``, so the
    sample is reproducible at any parallelism, stable under re-runs, and
    a row's fate never depends on other rows (no shuffle, no count —
    pure filter; exact binary rates like 0.5/0.25 compare exactly).
    Unlisted strata get ``default_rate``.

    No fan_out: this is a pure filter (zero-exchange plan property);
    adding a round-robin exchange to spread a trivial hash-compare is a
    strict loss at any scale."""
    pairs = []
    for s, r in sorted(rates.items()):
        pairs += [F.lit(s), F.lit(float(r))]
    rate = F.coalesce(
        F.create_map(*pairs)[F.col(strata_col)] if pairs else F.lit(None).cast("double"),
        F.lit(float(default_rate)),
    )
    return df.where(uniform_hash(F.col(key_col).cast("string"), seed) < rate)


def exact_stratified_sample(
    df: DataFrame,
    n_per_stratum: int,
    strata_col: str = "source",
    key_col: str = "doc_id",
    seed: int = 13,
) -> DataFrame:
    """Exactly ``n_per_stratum`` rows per stratum (fewer when the
    stratum is smaller) — the fixed-BUDGET twin of `stratified_sample`'s
    fixed-RATE filter: evaluation sets, per-language quotas, "10k docs
    per source" audits. The sample is the first n rows in
    `uniform_hash` order (ties broken by key), so it is deterministic
    at any parallelism, engine-reproducible, and a stratum's sample is
    a PREFIX: growing the budget only adds rows, never swaps them out
    (nested samples, the property repeated-eval pipelines rely on).

    Scale: rank-within-group ≤ n compiles to WindowGroupLimit — Spark
    keeps a bounded per-group heap on the map side and again post-
    shuffle, so no stratum is ever fully sorted or materialized; ONE
    shuffle on the stratum key.

    No fan_out: the stratum-key window exchange redistributes anyway;
    the per-row work (one hash) is too cheap to justify a second
    exchange."""
    u = uniform_hash(F.col(key_col).cast("string"), seed)
    w = Window.partitionBy(strata_col).orderBy(u.asc(), F.col(key_col).asc())
    return (
        df.withColumn("_rk", F.row_number().over(w))
        .where(F.col("_rk") <= n_per_stratum)
        .drop("_rk")
    )


PII_EMAIL = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PII_IPV4 = r"\b(\d{1,3}\.)" + r"{3}\d{1,3}\b"
PII_PHONE = r"\+?\d[\d .-]{7,}\d"


def redact_pii(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    r"""PII scrubbing, the standard pre-release anonymization pass
    (FineWeb/BigScience-ROOTS redact emails, IPs, phone-ish digit runs):
    replaces matches with <EMAIL>/<IP>/<PHONE> placeholders and counts
    them per document. Pure regexp column expressions — RE2/Java-regex
    compatible patterns (no lookaround), zero shuffle, codegen'd.
    Order matters: emails first (digit-bearing addresses would otherwise
    be chewed by the phone pattern), then IPs, then phones last — the
    loose phone pattern (\+?\d[\d .-]{7,}\d) matches dotted digit runs,
    so un-redacted IPs would be mislabeled <PHONE>.
    Returns (id_col, text_redacted, n_emails, n_ips, n_phones)."""
    df = fan_out(df)  # guide §2.5 scan-parallelism guard
    t = F.col(text_col)
    n_emails = F.coalesce(F.regexp_count(t, F.lit(PII_EMAIL)), F.lit(0))
    after_email = F.regexp_replace(t, PII_EMAIL, "<EMAIL>")
    n_ips = F.coalesce(F.regexp_count(after_email, F.lit(PII_IPV4)), F.lit(0))
    after_ip = F.regexp_replace(after_email, PII_IPV4, "<IP>")
    n_phones = F.coalesce(F.regexp_count(after_ip, F.lit(PII_PHONE)), F.lit(0))
    redacted = F.regexp_replace(after_ip, PII_PHONE, "<PHONE>")
    return df.select(
        id_col,
        redacted.alias("text_redacted"),
        n_emails.alias("n_emails"),
        n_ips.alias("n_ips"),
        n_phones.alias("n_phones"),
    )


def corpus_token_stats(df: DataFrame, text_col: str = "text", by: str = "source") -> DataFrame:
    """Per-stratum token accounting — the "how many tokens do we have,
    and where" question every training run starts with. Whitespace
    tokens; histogram bucket = floor(tokens/32) keeps the stats exact
    (integer arithmetic, engine-portable) instead of approximate
    percentiles. One map-side-combinable aggregate."""
    df = fan_out(df)  # guide §2.5 scan-parallelism guard
    t = F.col(text_col)
    trimmed = F.trim(t)
    n_tokens = F.when(trimmed == "", F.lit(0)).otherwise(F.size(F.split(trimmed, r"\s+")))
    return (
        df.select(F.col(by), n_tokens.alias("_nt"))
        .groupBy(by)
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("_nt").alias("total_tokens"),
            F.min("_nt").alias("min_tokens"),
            F.max("_nt").alias("max_tokens"),
            F.round(F.avg("_nt"), 6).alias("avg_tokens"),
            F.countDistinct(F.floor(F.col("_nt") / 32)).alias("n_size_buckets"),
        )
    )


def pack_sequences(
    df: DataFrame,
    window: int = 2048,
    text_col: str = "text",
    id_col: str = "doc_id",
    by: str = "source",
) -> DataFrame:
    """GPT-style sequence packing accounting: documents are concatenated
    in ``id_col`` order within each ``by`` shard and the token stream is
    chunked into fixed ``window``-token training sequences. Returns one
    row per document with its placement: (id, shard, n_tokens,
    start_offset — position in the shard's token stream — seq_id — the
    training sequence its first token lands in — and seq_count — how
    many sequences the doc spans).

    Plan: ONE window (cumulative sum over the shard, ordered by id) —
    the packing itself is arithmetic on the running total. Shards
    parallelize the sort; a single giant shard serializes its window at
    scale — shard by bucket(id) when no natural source exists (same
    answer modulo shard boundaries)."""
    df = fan_out(df)  # guide §2.5 scan-parallelism guard
    t = F.trim(F.col(text_col))
    n_tokens = F.when(t == "", F.lit(0)).otherwise(F.size(F.split(t, r"\s+")))
    w = Window.partitionBy(by).orderBy(id_col)
    staged = df.select(F.col(id_col), F.col(by), n_tokens.alias("n_tokens"))
    cum = staged.withColumn(
        "start_offset", F.coalesce(F.sum("n_tokens").over(w), F.lit(0)) - F.col("n_tokens")
    )
    end = F.col("start_offset") + F.greatest(F.col("n_tokens"), F.lit(1)) - 1
    return cum.select(
        id_col,
        by,
        "n_tokens",
        "start_offset",
        F.floor(F.col("start_offset") / window).cast("long").alias("seq_id"),
        (F.floor(end / window) - F.floor(F.col("start_offset") / window) + 1)
        .cast("long")
        .alias("seq_count"),
    )


def decontaminate(
    corpus: DataFrame,
    benchmark: DataFrame,
    text_col: str = "text",
    n: int = 3,
) -> DataFrame:
    """GPT-3-style train/test decontamination: flag corpus documents
    sharing any word ``n``-gram with a benchmark set (Brown et al. 2020
    appendix C uses 13-grams; the synthetic docs are short so tests use
    3).

    The benchmark's distinct n-gram set is small (eval suites are ~1e6
    grams) → built with one agg and BROADCAST; the corpus side explodes
    its distinct grams and joins without shuffling. Both sides match on
    the 64-bit combined word-hash (shingle_hashes) instead of the gram
    string: no n-gram strings are ever materialized, and the broadcast
    ships 8 B/gram — same matches (equal grams ⇒ equal hashes,
    collision P ≈ n²/2⁶⁵ as everywhere in the hash-keyed family).
    Returns one row per corpus doc: (doc_id, n_hits, is_contaminated).
    """
    corpus = fan_out(corpus)  # guide §2.5 scan-parallelism guard
    grams = F.array_distinct(shingle_hashes(text_col, n))
    bench = benchmark.select(F.explode(grams).alias("gram_h")).distinct()
    doc_grams = corpus.select("doc_id", F.explode(grams).alias("gram_h"))
    hits = (
        doc_grams.join(F.broadcast(bench), "gram_h")
        .groupBy("doc_id")
        .agg(F.count("*").alias("n_hits"))
    )
    return (
        corpus.select("doc_id")
        .join(hits, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_hits", F.lit(0)).alias("n_hits"),
            (F.coalesce("n_hits", F.lit(0)) > 0).alias("is_contaminated"),
        )
    )


def decontaminate_spans(
    corpus: DataFrame,
    benchmark: DataFrame,
    text_col: str = "text",
    n: int = 3,
) -> DataFrame:
    """GPT-3 appendix C removes contaminated *spans*, not whole
    documents (Brown et al. 2020: excise a window around each 13-gram
    collision and keep the clean remainder). This returns the token
    offsets a pipeline needs to excise: each benchmark-colliding
    ``n``-gram starting at word position ``p`` contaminates tokens
    ``[p, p+n-1]``; overlapping or adjacent windows merge into maximal
    spans (classic gaps-and-islands over a running max of span ends).

    Plan: the benchmark gram set is broadcast exactly as in
    ``decontaminate`` — the corpus side never shuffles to find hits.
    The interval merge windows ONLY the hit rows (collisions are rare
    by construction — that is the point of decontamination), so the
    per-doc sort touches a corpus fraction ≈ contamination rate.

    Returns one row per maximal span: (doc_id, span_id — 1-based within
    the doc —, start_token, end_token — inclusive 0-based word offsets
    —, n_grams — colliding grams merged into the span).
    """
    corpus = fan_out(corpus)  # guide §2.5 scan-parallelism guard
    # hash-keyed matching as in `decontaminate`: no gram strings built
    grams = shingle_hashes(text_col, n)
    bench = benchmark.select(F.explode(F.array_distinct(grams)).alias("gram_h")).distinct()
    pos_grams = corpus.select("doc_id", F.posexplode(grams).alias("pos", "gram_h"))
    hits = pos_grams.join(F.broadcast(bench), "gram_h").select("doc_id", "pos")
    return _merge_islands(hits, n)


def _merge_islands(hits: DataFrame, n: int) -> DataFrame:
    """Gaps-and-islands merge of (doc_id, pos) gram hits into maximal
    token spans: a gram at word position p covers [p, p+n-1]; hits merge
    while the next start is <= running-max-end + 1. The window touches
    ONLY hit rows — the full corpus never sorts."""
    w = Window.partitionBy("doc_id").orderBy("pos")
    prev_end = F.max(F.col("pos") + (n - 1)).over(
        w.rowsBetween(Window.unboundedPreceding, -1)
    )
    marked = hits.withColumn(
        "_new",
        F.when(prev_end.isNull() | (F.col("pos") > prev_end + 1), 1).otherwise(0),
    )
    islands = marked.withColumn("span_id", F.sum("_new").over(w))
    return islands.groupBy("doc_id", "span_id").agg(
        F.min("pos").cast("long").alias("start_token"),
        (F.max("pos") + F.lit(n - 1)).cast("long").alias("end_token"),
        F.count("*").alias("n_grams"),
    )


def duplicate_spans(
    df: DataFrame,
    text_col: str = "text",
    n: int = 5,
    min_count: int = 2,
    portable_hash: bool = False,
) -> DataFrame:
    """ExactSubstr-style duplicate-span detection (Lee et al. 2021,
    "Deduplicating Training Data Makes Language Models Better"): find the
    token spans whose every ``n``-gram occurs at least ``min_count``
    times ANYWHERE in the corpus (same doc or another), merged into
    maximal per-doc excision windows. Lee et al. build a corpus-wide
    suffix array and excise >=50-token repeats; the n-gram-frequency
    formulation reaches the same spans for repeats of length >= n while
    staying in plain DataFrame ops (a suffix array over 100 TB of text
    is exactly the kind of global index a Spark pipeline replaces with a
    keyed aggregate).

    Plan: posexplode n-grams once -> ONE shuffle keyed on the 8-byte
    ``xxhash64(gram)`` for the exact occurrence counts (two-phase
    partial agg) -> co-keyed join of the exploded side against the
    (filtered, usually small) duplicated-gram set -> gaps-and-islands
    window over ONLY the hit rows. Viral boilerplate grams are one row
    each on the frequency side, so join skew sits on the exploded side
    where AQE splits it. ``portable_hash`` groups on the gram string
    instead (byte-identical replay on any engine; ~3-10x more shuffle
    bytes — test/oracle use).

    Returns one row per maximal span: (doc_id, span_id, start_token,
    end_token — inclusive 0-based word offsets —, n_grams).
    """
    df = fan_out(df)  # guide §2.5 scan-parallelism guard
    if portable_hash:
        ex = df.select(
            "doc_id", F.posexplode(shingles(text_col, n)).alias("pos", "gram")
        ).withColumn("gram_h", F.col("gram"))
    else:
        # hash n-grams WITHOUT materializing the gram strings: combine
        # per-word xxhash64s (shingle_hashes) instead of building every
        # n-gram string and hashing it — same equality classes (equal
        # grams ⇒ equal hashes, collisions P ≈ n²/2⁶⁵ as before), a
        # fraction of the allocation; string materialization dominates
        # this explode (same trade as minhash/fingerprint).
        ex = df.select(
            "doc_id", F.posexplode(shingle_hashes(text_col, n)).alias("pos", "gram_h")
        )
    freq = ex.groupBy("gram_h").agg(F.count("*").alias("occ"))
    dup = freq.where(F.col("occ") >= min_count).select("gram_h")
    hits = ex.join(dup, "gram_h").select("doc_id", "pos")
    return _merge_islands(hits, n)


def nb_quality_classifier(
    corpus: DataFrame,
    positives: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    alpha: float = 0.5,
    vocab_size: int = 200_000,
) -> DataFrame:
    """Quality-classifier filtering, the GPT-3/LLaMA CommonCrawl gate
    (Brown et al. 2020 appendix A: a linear classifier trained on
    WebText-like positives vs raw-CC negatives keeps docs scoring above
    a threshold). The multinomial naive-Bayes twin keeps train AND score
    fully declarative: per-word log-likelihood ratio
    llr(w) = log((pos_cnt+a)/(pos_tot+a*V)) - log((neg_cnt+a)/(neg_tot+a*V))
    with the raw corpus itself as the negative/background class, and a
    doc scores the MEAN llr of its words (mean, not sum, so length
    doesn't dominate — same normalization fastText applies).

    Plan: two word-count aggregates (map-side combinable; the positive
    set is the small curated side) -> full-outer merge into one vocab
    table truncated to the top ``vocab_size`` by combined count ->
    BROADCAST vocab + 1-row totals joined against the exploded corpus
    (the corpus side never shuffles) -> one re-agg by doc. Smoothing
    uses the FULL distinct-vocab count V (not the truncated size), so
    truncation only moves tail words to the OOV constant instead of
    changing the model.

    Returns (id_col, n_words, nb_llr — rounded 6 —, is_quality =
    nb_llr > 0).
    """
    corpus = fan_out(corpus)  # guide §2.5 scan-parallelism guard

    def words_of(df):
        return df.select(
            F.explode(F.split(F.lower(F.trim(F.col(text_col))), r"\s+")).alias("word")
        )

    pos_w = words_of(positives)
    neg_w = words_of(corpus)
    pos_cnt = pos_w.groupBy("word").agg(F.count("*").alias("pc"))
    neg_cnt = neg_w.groupBy("word").agg(F.count("*").alias("nc"))
    merged = pos_cnt.join(neg_cnt, "word", "full").select(
        "word",
        F.coalesce("pc", F.lit(0)).alias("pc"),
        F.coalesce("nc", F.lit(0)).alias("nc"),
    )
    vocab = merged.orderBy(F.desc(F.col("pc") + F.col("nc")), "word").limit(vocab_size)
    totals = merged.agg(
        F.sum("pc").cast("double").alias("pos_tot"),
        F.sum("nc").cast("double").alias("neg_tot"),
        F.count("*").cast("double").alias("v"),
    )
    a = float(alpha)
    doc_words = corpus.select(
        F.col(id_col),
        F.explode(F.split(F.lower(F.trim(F.col(text_col))), r"\s+")).alias("word"),
    )
    scored = (
        doc_words.join(F.broadcast(vocab), "word", "left")
        .crossJoin(F.broadcast(totals))
        .withColumn(
            "_llr",
            F.log((F.coalesce(F.col("pc"), F.lit(0)).cast("double") + a)
                  / (F.col("pos_tot") + a * F.col("v")))
            - F.log((F.coalesce(F.col("nc"), F.lit(0)).cast("double") + a)
                    / (F.col("neg_tot") + a * F.col("v"))),
        )
    )
    out = scored.groupBy(id_col).agg(
        F.count("*").alias("n_words"),
        F.round(F.avg("_llr"), 6).alias("nb_llr"),
    )
    return out.select(id_col, "n_words", "nb_llr", (F.col("nb_llr") > 0).alias("is_quality"))


def perplexity_buckets(
    scored: DataFrame,
    score_col: str = "lm_score",
    by: str = "lang",
    id_col: str = "doc_id",
    names: tuple[str, ...] = ("head", "middle", "tail"),
) -> DataFrame:
    """CCNet's perplexity bucketing (Wenzek et al. 2020 §4.3): within
    each language, split documents into head/middle/tail terciles of LM
    score (ascending — low perplexity = fluent = head); pipelines keep
    head+middle and drop or down-weight tail.

    This is the exact-rank variant: ntile over (score, id) inside each
    language partition — deterministic, engine-portable, and parallel
    across languages. One language dominating the corpus serializes its
    partition's sort at 100 TB; CCNet itself computes the cutoffs on a
    SAMPLE and buckets by threshold comparison — do the same at scale
    (percentile_approx on a sample, then a pure filter); the ntile
    variant is the replayable twin the oracle gate can verify.

    Returns (id_col, by, score_col, bucket).
    """
    w = Window.partitionBy(by).orderBy(score_col, id_col)
    tile = F.ntile(len(names)).over(w)
    bucket = F.element_at(F.array(*[F.lit(x) for x in names]), tile)
    return scored.select(id_col, by, score_col, bucket.alias("bucket"))


def leakage_safe_splits(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    weights: tuple[float, ...] = (0.9, 0.05, 0.05),
    names: tuple[str, ...] = ("train", "validation", "test"),
    seed: int = 17,
) -> DataFrame:
    """Cluster-consistent train/validation/test assignment: exact-dup
    documents must land in the SAME split or the eval set leaks into
    training (the SentencePiece/The-Pile-era bug class that
    deduplication papers warn about). Each duplicate cluster (keyed by
    md5 of the normalized text) is assigned once, by
    ``uniform_hash(cluster representative)``, and every member inherits
    the assignment. Weights are cumulative-compared, so exact binary
    weights replay exactly across engines.

    Plan: one groupBy on the 16-byte digest for the representative
    (min id — two-phase agg), then a join back keyed on the SAME digest
    (co-partitioned, no extra shuffle of the big side beyond that one
    key). Scale: clusters are ~corpus-distinct-count rows; the digest
    join is the same shape as exact dedup.

    Returns (id_col, cluster_rep, split).

    No fan_out: both the groupBy and the join back are keyed on the
    digest — their hash exchanges redistribute anyway, and a pre-agg
    round-robin would shuffle the text payload (measured 1.5x slower
    at bench scale).
    """
    digest = F.md5(F.lower(F.trim(F.col(text_col))))
    keyed = df.select(F.col(id_col), digest.alias("_digest"))
    reps = keyed.groupBy("_digest").agg(F.min(id_col).alias("cluster_rep"))
    u = uniform_hash(F.col("cluster_rep").cast("string"), seed)
    cum = 0.0
    expr = None
    for w_, name in zip(weights, names):
        cum += float(w_)
        cond = u < F.lit(cum)
        expr = F.when(cond, F.lit(name)) if expr is None else expr.when(cond, F.lit(name))
    assigned = reps.select("_digest", "cluster_rep", expr.otherwise(F.lit(names[-1])).alias("split"))
    return keyed.join(assigned, "_digest").select(id_col, "cluster_rep", "split")


_GOPHER_STOPWORDS = ("the", "be", "to", "of", "and", "that", "have", "with")


def gopher_quality_flags(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_words: int = 50,
    max_words: int = 100_000,
    min_mean_word_len: float = 3.0,
    max_mean_word_len: float = 10.0,
    max_symbol_word_ratio: float = 0.1,
    max_bullet_line_frac: float = 0.9,
    max_ellipsis_line_frac: float = 0.3,
    min_alpha_word_frac: float = 0.8,
    min_stopwords: int = 2,
) -> DataFrame:
    """The named Gopher quality rules (Rae et al. 2021 §A1.1 / Table A1)
    as per-document boolean flags — the standard pre-filter every
    Common-Crawl curation pipeline applies before dedup (MassiveWeb,
    RefinedWeb §3.1.3, FineWeb all reuse these thresholds):

    1. 50 <= word count <= 100,000
    2. 3 <= mean word length <= 10
    3. symbol-to-word ratio (# and ...) <= 0.1
    4. <= 90 % of lines start with a bullet
    5. <= 30 % of lines end with an ellipsis
    6. >= 80 % of words contain an alphabetic character
    7. at least 2 of the 8 required stop words present

    (The repetition rules from the same appendix live in
    `repetition_features` — Gopher splits them the same way.)

    Everything is whole-stage-codegen expression work over the word and
    line arrays — no shuffle, no UDF, a pure row-map that pushes down
    past any scan. Returns one row per doc with the measured features,
    the seven flags, and ``passes_gopher`` = AND of all seven.
    """
    df = fan_out(df)  # guide §2.5 scan-parallelism guard
    feats = _gopher_feature_exprs(F.col(text_col))
    out = df.select(F.col(id_col), *[v.alias(k) for k, v in feats.items()])
    flags = _gopher_flag_exprs(
        {k: F.col(k) for k in feats},
        min_words, max_words, min_mean_word_len, max_mean_word_len,
        max_symbol_word_ratio, max_bullet_line_frac, max_ellipsis_line_frac,
        min_alpha_word_frac, min_stopwords,
    )
    out = out.select("*", *[v.alias(k) for k, v in flags.items()])
    passes = reduce(lambda a, b: a & b, [F.col(k) for k in flags])
    return out.withColumn("passes_gopher", passes)


def _gopher_feature_exprs(t: Column) -> dict[str, Column]:
    words = F.split(F.lower(F.trim(t)), r"\s+")
    n_words = F.when(F.trim(t) == "", F.lit(0)).otherwise(F.size(words))
    lines = F.split(t, r"\n")
    n_lines = F.greatest(F.size(lines), F.lit(1)).cast("double")
    safe_words = F.greatest(n_words, F.lit(1)).cast("double")
    char_total = F.aggregate(words, F.lit(0), lambda a, x: a + F.length(x))
    n_symbols = F.coalesce(F.regexp_count(t, F.lit(r"#|\.\.\.|…")), F.lit(0))
    n_stop = reduce(
        lambda a, b: a + b,
        [F.array_contains(words, s).cast("int") for s in _GOPHER_STOPWORDS],
    )
    return {
        "n_words": n_words,
        "mean_word_len": F.round(char_total / safe_words, 6),
        "symbol_word_ratio": F.round(n_symbols / safe_words, 6),
        "bullet_line_frac": F.round(
            F.size(F.filter(lines, lambda l: l.rlike(r"^\s*[•‣▪\-\*]"))) / n_lines, 6
        ),
        "ellipsis_line_frac": F.round(
            F.size(F.filter(lines, lambda l: l.rlike(r"(\.\.\.|…)\s*$"))) / n_lines, 6
        ),
        "alpha_word_frac": F.round(
            F.size(F.filter(words, lambda w: w.rlike("[a-z]"))) / safe_words, 6
        ),
        "n_required_stopwords": n_stop.cast("int"),
    }


def _gopher_flag_exprs(
    f: dict[str, Column],
    min_words, max_words, min_mean_word_len, max_mean_word_len,
    max_symbol_word_ratio, max_bullet_line_frac, max_ellipsis_line_frac,
    min_alpha_word_frac, min_stopwords,
) -> dict[str, Column]:
    return {
        "flag_word_count": (f["n_words"] >= min_words) & (f["n_words"] <= max_words),
        "flag_mean_word_len": (f["mean_word_len"] >= min_mean_word_len)
        & (f["mean_word_len"] <= max_mean_word_len),
        "flag_symbol_ratio": f["symbol_word_ratio"] <= max_symbol_word_ratio,
        "flag_bullet_lines": f["bullet_line_frac"] <= max_bullet_line_frac,
        "flag_ellipsis_lines": f["ellipsis_line_frac"] <= max_ellipsis_line_frac,
        "flag_alpha_words": f["alpha_word_frac"] >= min_alpha_word_frac,
        "flag_stopwords": f["n_required_stopwords"] >= min_stopwords,
    }


def gopher_passes(
    text_col: str = "text",
    min_words: int = 50,
    max_words: int = 100_000,
    min_mean_word_len: float = 3.0,
    max_mean_word_len: float = 10.0,
    max_symbol_word_ratio: float = 0.1,
    max_bullet_line_frac: float = 0.9,
    max_ellipsis_line_frac: float = 0.3,
    min_alpha_word_frac: float = 0.8,
    min_stopwords: int = 2,
) -> Column:
    """``passes_gopher`` as a single boolean Column — for use as a
    WHERE predicate inside a larger pipeline (`pipeline.curate`), where
    it stays a row-local expression: no join, no shuffle, pushes down
    into the scan."""
    flags = _gopher_flag_exprs(
        _gopher_feature_exprs(F.col(text_col)),
        min_words, max_words, min_mean_word_len, max_mean_word_len,
        max_symbol_word_ratio, max_bullet_line_frac, max_ellipsis_line_frac,
        min_alpha_word_frac, min_stopwords,
    )
    return reduce(lambda a, b: a & b, flags.values())


_C4_BADWORDS = ("porn", "xxx", "fuck", "shit")


def c4_quality_flags(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_line_words: int = 5,
    min_sentences: int = 3,
    badwords: tuple[str, ...] = _C4_BADWORDS,
) -> DataFrame:
    """The C4 cleaning rules (Raffel et al. 2020 §2.2) — the other
    canonical heuristic gate next to Gopher's. C4 is line-REWRITING
    plus page-level drops:

    line level (kept lines form ``text_clean``):
    - line ends in terminal punctuation (. ! ? or closing quote)
    - line has at least ``min_line_words`` words
    - line does not contain the word "javascript"

    page level:
    - at least ``min_sentences`` sentences survive (sentence proxy:
      terminal-punctuation marks in the cleaned text)
    - no "lorem ipsum", no curly brace, no bad word (word-aligned)

    Pure array/lambda expressions — no UDF, no shuffle; the line
    filter is a `filter()` over the split array inside one codegen
    stage, so at 100 TB this is scan-bound.

    Returns (id_col, n_lines, n_kept_lines, n_sentences,
    has_lorem_ipsum, has_curly_brace, has_badword, passes_c4,
    text_clean).
    """
    df = fan_out(df)  # guide §2.5 scan-parallelism guard
    e = _c4_exprs(F.col(text_col), min_line_words, badwords)
    out = df.select(
        F.col(id_col),
        e["n_lines"].alias("n_lines"),
        e["n_kept_lines"].alias("n_kept_lines"),
        e["n_sentences"].alias("n_sentences"),
        e["has_lorem_ipsum"].alias("has_lorem_ipsum"),
        e["has_curly_brace"].alias("has_curly_brace"),
        e["has_badword"].alias("has_badword"),
        e["text_clean"].alias("text_clean"),
    )
    passes = (
        (F.col("n_sentences") >= min_sentences)
        & ~F.col("has_lorem_ipsum")
        & ~F.col("has_curly_brace")
        & ~F.col("has_badword")
    )
    return out.select(
        id_col, "n_lines", "n_kept_lines", "n_sentences", "has_lorem_ipsum",
        "has_curly_brace", "has_badword", passes.alias("passes_c4"), "text_clean",
    )


def _c4_exprs(t: Column, min_line_words: int, badwords: tuple[str, ...]) -> dict[str, Column]:
    lines = F.split(t, r"\n")

    def line_ok(l):
        trimmed = F.trim(l)
        return (
            l.rlike(r'[.!?"]\s*$')
            & (F.when(trimmed == "", F.lit(0)).otherwise(F.size(F.split(trimmed, r"\s+")))
               >= min_line_words)
            & ~F.lower(l).contains("javascript")
        )

    kept = F.filter(lines, line_ok)
    text_clean = F.array_join(kept, "\n")
    low = F.lower(t)
    return {
        "n_lines": F.size(lines),
        "n_kept_lines": F.size(kept),
        "n_sentences": F.coalesce(F.regexp_count(text_clean, F.lit(r"[.!?]")), F.lit(0)),
        "has_lorem_ipsum": low.contains("lorem ipsum"),
        "has_curly_brace": t.contains("{"),
        "has_badword": reduce(lambda a, b: a | b, [low.rlike(rf"\b{w}\b") for w in badwords]),
        "text_clean": text_clean,
    }


def c4_passes(
    text_col: str = "text",
    min_line_words: int = 5,
    min_sentences: int = 3,
    badwords: tuple[str, ...] = _C4_BADWORDS,
) -> Column:
    """``passes_c4`` as a single boolean Column (see `gopher_passes`):
    a row-local WHERE predicate for composed pipelines — no join, no
    shuffle. Note C4 proper also REWRITES the doc to its kept lines;
    use `c4_quality_flags().text_clean` when the rewrite matters."""
    e = _c4_exprs(F.col(text_col), min_line_words, badwords)
    return (
        (e["n_sentences"] >= min_sentences)
        & ~e["has_lorem_ipsum"]
        & ~e["has_curly_brace"]
        & ~e["has_badword"]
    )


def domain_mix(
    df: DataFrame,
    budget_tokens: int,
    alpha: float = 0.7,
    domain_col: str = "source",
    key_col: str = "doc_id",
    text_col: str = "text",
    seed: int = 17,
) -> DataFrame:
    """Temperature-scaled domain mixing to a token budget — the corpus
    COMPOSITION step after cleaning: sampling weight w_d ∝ T_d^alpha
    where T_d is the domain's token mass (alpha < 1 flattens the natural
    distribution so head domains don't drown the tail — the
    multilingual sampling rule of XLM-R/mT5 and the source-reweighting
    treatment in GPT-3's training-set construction); each domain's
    target is budget·w_d/Σw and its keep rate p_d = min(1, target/T_d).
    Membership is `uniform_hash(key) < p_d`, so the mix replays
    bit-identically at any parallelism and on any engine.

    Scale: ONE map-side-combinable aggregate builds the per-domain
    table (one row per domain — tiny), which broadcasts back; the
    accept test is then a pure filter — the corpus itself NEVER
    shuffles. Domains with zero token mass drop (their weight is 0).
    Returns kept rows (key, domain, n_tokens, keep_rate)."""
    df = fan_out(df)  # guide §2.5 scan-parallelism guard
    t = F.trim(F.col(text_col))
    n_tok = (
        F.when(t == "", F.lit(0)).otherwise(F.size(F.split(t, r"\s+"))).cast("long")
    )
    base = df.select(
        F.col(key_col), F.col(domain_col).alias("_dom"), n_tok.alias("n_tokens")
    )
    dom = (
        base.groupBy("_dom")
        .agg(F.sum("n_tokens").cast("double").alias("_T"))
        .withColumn("_w", F.pow(F.col("_T"), F.lit(float(alpha))))
    )
    tot = dom.agg(F.sum("_w").alias("_sw"))
    rates = dom.crossJoin(F.broadcast(tot)).select(
        "_dom",
        F.when(
            F.col("_T") > 0,
            F.least(
                F.lit(1.0),
                F.lit(float(budget_tokens)) * F.col("_w") / F.col("_sw") / F.col("_T"),
            ),
        )
        .otherwise(F.lit(0.0))
        .alias("keep_rate"),
    )
    out = base.join(F.broadcast(rates), "_dom").where(
        uniform_hash(F.col(key_col).cast("string"), seed=seed) < F.col("keep_rate")
    )
    return out.select(
        F.col(key_col),
        F.col("_dom").alias(domain_col),
        "n_tokens",
        F.round("keep_rate", 9).alias("keep_rate"),
    )

"""Corpus curation: the composed training-data pipeline.

One declarative pass chaining the §beyond operators into the shape a
100 TB web-text curation job actually runs:

    quality gate → language gate → exact dedup → (optional) near-dedup

Everything before the optional MinHash stage is pure column expressions
plus ONE shuffle (the dedup hash groupBy); filters run BEFORE the
shuffle so low-quality rows never pay shuffle bytes. Stats come from
the same pass via conditional aggregation, not a second scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from hydra_spark.ml.dedup import exact_duplicates, minhash_dedup_cc, normalized
from hydra_spark.ml.text import language_id, quality_features
from hydra_spark.ml.webtext import (
    c4_passes,
    gopher_passes,
    repetition_features,
    unigram_lm_score,
)


def curate(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_quality: float = 0.3,
    languages: tuple[str, ...] = ("en", "fr"),
    near_dedup: bool = False,
    near_dedup_threshold: float = 0.8,
    max_dup_chunk_frac: float | None = None,
    max_lm_score: float | None = None,
    gopher_rules: bool = False,
    c4_rules: bool = False,
) -> DataFrame:
    """The curated corpus: quality-scored, language-gated, deduplicated
    rows with their features attached (drop them with a select).

    Order matters at scale: the quality/language gates are stateless
    column predicates, so they run inside the scan and shrink the corpus
    BEFORE the dedup shuffle; exact dedup then shuffles only the
    md5(normalized text) survivors.

    Optional Gopher-style gates (applied BEFORE dedup, after the cheap
    gates): ``max_dup_chunk_frac`` drops repetition soup (Gopher's
    published dup-line threshold is 0.30 — still shuffle-free, joined on
    id); ``max_lm_score`` drops rare-word soup via the unigram LM proxy
    (adds the vocab aggregate + broadcast scoring join)."""
    scored = quality_features(df, text_col).withColumn(
        "lang_detected", language_id(text_col)
    )
    gated = scored.where(
        (F.col("quality_score") >= min_quality)
        & F.col("lang_detected").isin(*languages)
    )
    # the named published gates are row-local boolean expressions —
    # they run inside the same scan stage as the cheap gates above
    if gopher_rules:
        gated = gated.where(gopher_passes(text_col))
    if c4_rules:
        gated = gated.where(c4_passes(text_col))
    if max_dup_chunk_frac is not None:
        rep = repetition_features(gated, text_col, id_col=id_col).select(
            id_col, "dup_chunk_frac", "top_2gram_char_frac"
        )
        gated = gated.join(rep, id_col).where(
            F.col("dup_chunk_frac") <= max_dup_chunk_frac
        )
    if max_lm_score is not None:
        lm = unigram_lm_score(gated, text_col, id_col).select(id_col, "lm_score")
        gated = gated.join(lm, id_col).where(F.col("lm_score") <= max_lm_score)
    deduped = (
        exact_duplicates(gated, text_col, id_col)
        .where("is_canonical")
        .drop("dup_group_size", "is_canonical", "content_hash")
    )
    if near_dedup:
        deduped = minhash_dedup_cc(
            deduped, text_col, id_col, threshold=near_dedup_threshold
        )
    return deduped


def curation_stats(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_quality: float = 0.3,
    languages: tuple[str, ...] = ("en", "fr"),
) -> DataFrame:
    """Funnel accounting for the curation gates — ONE aggregation over
    the scored corpus (no silent drops: every removed row is counted
    under the first gate that rejected it)."""
    scored = quality_features(df, text_col).withColumn(
        "lang_detected", language_id(text_col)
    )
    low_q = F.col("quality_score") < min_quality
    bad_lang = ~F.col("lang_detected").isin(*languages)
    # the SAME hash exact_duplicates dedups on — a drifting copy would
    # silently desynchronize the funnel from what curate() keeps
    w_hash = F.md5(normalized(text_col))
    gated = scored.where(~low_q & ~bad_lang)
    kept = (
        gated.groupBy(w_hash.alias("_h"))
        .agg(F.count("*").alias("n"))
        .agg(
            F.count("*").alias("kept_docs"),
            F.sum(F.col("n") - 1).alias("dropped_exact_dups"),
        )
    )
    funnel = scored.agg(
        F.count("*").alias("total_docs"),
        F.sum(F.when(low_q, 1).otherwise(0)).alias("dropped_low_quality"),
        F.sum(F.when(~low_q & bad_lang, 1).otherwise(0)).alias("dropped_language"),
    )
    return funnel.crossJoin(kept)  # both sides are 1-row aggregates

"""Frequency sketches for corpus statistics at 100 TB.

`corpus_token_stats` (webtext.py) answers "how many tokens per source";
this module answers "WHICH tokens dominate" — the heavy-hitter query a
tokenizer-vocabulary audit, stopword discovery, or boilerplate hunt
runs over a web corpus. The exact plan (groupBy token + count + top-k)
shuffles one row per DISTINCT key — billions for web-text n-grams —
so the scale path is a bounded-memory Misra-Gries summary per
partition (k counters, Misra & Gries 1982) merged with the
mergeable-summaries rule (Agarwal et al., PODS 2012: sum counters
pointwise, subtract the (k+1)-th largest, drop non-positives), which
bounds BOTH executor memory and the shuffle to ~capacity rows per
partition while guaranteeing every key with true frequency > N/(cap+1)
survives and every reported count is a lower bound short by at most
N/(cap+1).

Reference parity note: the reference engine has no sketch surface; this
is part of the LLM-training-data operator family (like ml/dedup.py's
MinHash), built from the public papers cited above.

Scale design:
- per-partition summaries run inside ONE `mapInPandas` pass — Arrow
  batches, vectorized pandas `value_counts` per batch folded into the
  bounded summary (O(cap log cap) per batch, never per row), text
  tokenized in the same pass so no exploded token table ever
  materializes or shuffles;
- the summary output (≤ capacity+1 rows per partition) is
  localCheckpointed, so the corpus is scanned ONCE even though two
  branches (key merge + total-count) read it;
- the final top-k is TakeOrderedAndProject over the merged summary —
  the driver never sees raw tokens.

With `capacity` ≥ the distinct-key count of every partition no
subtraction ever fires, counts are EXACT and the result is independent
of partitioning — the driver-query configuration (the same
full-coverage trick the ANN oracle uses).
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from hydra_spark.parallel import fan_out

__all__ = ["heavy_hitters", "token_heavy_hitters"]


def _mg_fold(counters: dict, batch: pd.Series, capacity: int) -> dict:
    """Fold a batch's exact value_counts into a Misra-Gries summary of
    at most `capacity` counters (mergeable-summaries merge)."""
    for key, c in batch.items():
        counters[key] = counters.get(key, 0) + int(c)
    if len(counters) > capacity:
        sub = sorted(counters.values(), reverse=True)[capacity]
        counters = {k: v - sub for k, v in counters.items() if v > sub}
    return counters


def _sketch_topk(
    df: DataFrame, value_expr, k: int, capacity: int, out_key: str
) -> DataFrame:
    """Shared core: per-partition MG summaries (one mapInPandas pass,
    one (NULL, n) row per partition carrying its item total), merged
    and cut to the top k by (cnt desc, key asc)."""

    def part(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        counters: dict = {}
        n = 0
        for pdf in batches:
            vals = value_expr(pdf).dropna()
            n += len(vals)
            if len(vals):
                counters = _mg_fold(counters, vals.value_counts(), capacity)
        out = pd.DataFrame(
            {"key": list(counters) + [None], "cnt": list(counters.values()) + [n]}
        )
        out["key"] = out["key"].astype(object)
        yield out

    s = df.mapInPandas(part, "key string, cnt long").localCheckpoint()
    tot = s.where(F.col("key").isNull()).agg(
        F.coalesce(F.sum("cnt"), F.lit(0)).alias("_n")
    )
    top = (
        s.where(F.col("key").isNotNull())
        .groupBy("key")
        .agg(F.sum("cnt").alias("cnt"))
        .orderBy(F.desc("cnt"), F.asc("key"))
        .limit(k)
    )
    return top.crossJoin(F.broadcast(tot)).select(
        F.col("key").alias(out_key),
        "cnt",
        F.floor(F.col("_n") / (capacity + 1)).cast("long").alias("err_bound"),
    )


def heavy_hitters(
    df: DataFrame, key_col: str, k: int, capacity: int | None = None
) -> DataFrame:
    """Top-`k` most frequent values of `key_col` → (key, cnt,
    err_bound), cnt desc / key asc. `cnt` is exact when `capacity`
    (default 8k) covers each partition's distinct keys, otherwise a
    lower bound short by ≤ err_bound = floor(N/(capacity+1)); every key
    with true frequency > err_bound is guaranteed to be reported."""
    cap = capacity or 8 * k
    # keys go out through a `key string` Arrow schema — cast non-string
    # key columns (ints, etc.) JVM-side up front; a pandas-side astype
    # would stringify inconsistently ('0' vs '0.0') when a partition's
    # nulls promote the batch dtype to float
    keyed = df.select(F.col(key_col).cast("string").alias(key_col))
    return _sketch_topk(keyed, lambda pdf: pdf[key_col], k, cap, "key")


def token_heavy_hitters(
    df: DataFrame,
    text_col: str = "text",
    k: int = 100,
    capacity: int | None = None,
) -> DataFrame:
    """Top-`k` whitespace tokens across the corpus → (token, cnt,
    err_bound). Tokenization happens inside the sketch pass (vectorized
    str.split per Arrow batch) — no exploded token table exists at any
    point, so the shuffle stays ≤ capacity+1 rows per partition no
    matter the corpus size."""
    df = fan_out(df)  # guide §2.5 scan-parallelism guard
    cap = capacity or 8 * k

    def toks(pdf: pd.DataFrame) -> pd.Series:
        return pdf[text_col].str.split().explode().dropna()

    return _sketch_topk(df.select(text_col), toks, k, cap, "token")

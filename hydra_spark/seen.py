"""Partitioned URL-seen set: Bloom shards + cuckoo fallback (north rule).

The reference's "seen" semantics is the catalog's UNIQUE(resource_id)
constraint (migrations/main/20230606_rev9_up_rev10.sql:9-11) — fine for
PostgreSQL, impossible at a 10^10-URL frontier. Here:

- URLs are canonicalized then hashed twice Spark-side (murmur3 =
  ``F.hash``, xxhash64) — the Python layer never sees a URL string.
- The filter is SHARDED by hash: shard i holds a numpy bit array.
  One monolithic 1%-FPP Bloom at 10^10 keys is ~17 GB; 2048 shards of
  ~6 MB each stream through executors instead (SURVEY.md §7 risk
  register).
- Build/probe use ``applyInPandas``/``cogroupBy`` so each task touches
  exactly ONE shard: probing is a cogroup of (urls by shard) with
  (shard rows by shard) — the bitmap is never replicated per URL row.
- Bloom filters cannot delete; where deletion matters (hydra's catalog
  soft-deletes, F8) use the cuckoo-filter shards (same API).

Double hashing: g_i = h1 + i·h2 (Kirsch-Mitzenmacher), k derived from
the target FPP.
"""

from __future__ import annotations

import math
from collections.abc import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from hydra_spark.functions.urls import url_hash32, url_hash64

SHARD_SCHEMA = T.StructType(
    [
        T.StructField("shard", T.IntegerType(), False),
        T.StructField("n_items", T.LongType(), False),
        T.StructField("m_bits", T.LongType(), False),
        T.StructField("k", T.IntegerType(), False),
        T.StructField("bitmap", T.BinaryType(), False),
    ]
)


def add_hash_cols(df: DataFrame, url_col: str = "url", n_shards: int = 64) -> DataFrame:
    """h1 (xxhash64), h2 (murmur3 32), shard — all JVM-side."""
    return (
        df.withColumn("h1", url_hash64(url_col))
        .withColumn("h2", url_hash32(url_col).cast("long"))
        .withColumn("shard", F.pmod(F.col("h1"), F.lit(n_shards)).cast("int"))
    )


def _splitmix64(x: np.ndarray) -> np.ndarray:
    """Finalizer mix — decorrelates bit positions from the shard id
    (shard = h1 mod n_shards would otherwise bias h1 mod m)."""
    x = (x + np.uint64(0x9E3779B97F4A7C15)) & np.uint64(0xFFFFFFFFFFFFFFFF)
    x = ((x ^ (x >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)) & np.uint64(0xFFFFFFFFFFFFFFFF)
    x = ((x ^ (x >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)) & np.uint64(0xFFFFFFFFFFFFFFFF)
    return x ^ (x >> np.uint64(31))


def _bit_positions(h1: np.ndarray, h2: np.ndarray, k: int, m: int) -> np.ndarray:
    """(n, k) bit indexes via double hashing, uint64 wraparound."""
    a = _splitmix64(h1.astype(np.uint64))
    b = _splitmix64(h2.astype(np.uint64)) | np.uint64(1)  # odd step
    i = np.arange(k, dtype=np.uint64)[None, :]
    return ((a[:, None] + i * b[:, None]) % np.uint64(m)).astype(np.int64)


def _params(n: int, fpp: float) -> tuple[int, int]:
    n = max(n, 1)
    m = max(64, int(-n * math.log(fpp) / (math.log(2) ** 2)))
    k = max(1, int(round(m / n * math.log(2))))
    return m, min(k, 16)


class BloomSeenSet:
    def __init__(self, n_shards: int = 64, fpp: float = 0.01, capacity_per_shard: int | None = None):
        self.n_shards = n_shards
        self.fpp = fpp
        self.capacity_per_shard = capacity_per_shard

    # -- build ------------------------------------------------------------
    def build(self, urls: DataFrame, url_col: str = "url") -> DataFrame:
        """One Bloom shard per hash bucket; sized for the shard's item
        count (or the fixed capacity if given, to absorb updates)."""
        hashed = add_hash_cols(urls, url_col, self.n_shards).select("h1", "h2", "shard")
        fpp, cap = self.fpp, self.capacity_per_shard

        def build_shard(pdf: pd.DataFrame) -> pd.DataFrame:
            shard = int(pdf["shard"].iloc[0])
            n = len(pdf)
            m, k = _params(cap or n, fpp)
            bits = np.zeros((m + 7) // 8, dtype=np.uint8)
            pos = _bit_positions(pdf["h1"].to_numpy(), pdf["h2"].to_numpy(), k, m)
            np.bitwise_or.at(bits, (pos // 8).ravel(), (1 << (pos % 8)).astype(np.uint8).ravel())
            return pd.DataFrame(
                [(shard, n, m, k, bits.tobytes())],
                columns=["shard", "n_items", "m_bits", "k", "bitmap"],
            )

        return hashed.groupBy("shard").applyInPandas(build_shard, SHARD_SCHEMA)

    # -- probe ------------------------------------------------------------
    def check(self, urls: DataFrame, shards: DataFrame, url_col: str = "url") -> DataFrame:
        """urls + boolean `seen` column. Cogroup: each task gets one
        shard's URLs and that shard's bitmap only."""
        hashed = add_hash_cols(urls, url_col, self.n_shards)
        out_schema = T.StructType(
            hashed.schema.fields + [T.StructField("seen", T.BooleanType(), False)]
        )

        def probe(urls_pdf: pd.DataFrame, shard_pdf: pd.DataFrame) -> pd.DataFrame:
            if urls_pdf.empty:
                return urls_pdf.assign(seen=pd.Series([], dtype=bool))
            if shard_pdf.empty:
                return urls_pdf.assign(seen=False)
            m = int(shard_pdf["m_bits"].iloc[0])
            k = int(shard_pdf["k"].iloc[0])
            bits = np.frombuffer(shard_pdf["bitmap"].iloc[0], dtype=np.uint8)
            pos = _bit_positions(urls_pdf["h1"].to_numpy(), urls_pdf["h2"].to_numpy(), k, m)
            hit = (bits[pos // 8] & (1 << (pos % 8)).astype(np.uint8)) != 0
            return urls_pdf.assign(seen=hit.all(axis=1))

        return (
            hashed.groupBy("shard")
            .cogroup(shards.groupBy("shard"))
            .applyInPandas(probe, out_schema)
        )

    # -- incremental update ------------------------------------------------
    def update(self, shards: DataFrame, new_urls: DataFrame, url_col: str = "url") -> DataFrame:
        """OR the new URLs' bits into each touched shard. Shards keep
        their size — callers rebuild from the full URL set when a
        shard's load factor degrades its FPP (n_items tracks this)."""
        hashed = add_hash_cols(new_urls, url_col, self.n_shards).select("h1", "h2", "shard")
        fpp, cap = self.fpp, self.capacity_per_shard

        def upd(urls_pdf: pd.DataFrame, shard_pdf: pd.DataFrame) -> pd.DataFrame:
            if shard_pdf.empty:
                if urls_pdf.empty:
                    return pd.DataFrame(columns=["shard", "n_items", "m_bits", "k", "bitmap"])
                shard = int(urls_pdf["shard"].iloc[0])
                n = len(urls_pdf)
                m, k = _params(cap or n, fpp)
                bits = np.zeros((m + 7) // 8, dtype=np.uint8)
                n0 = 0
            else:
                shard = int(shard_pdf["shard"].iloc[0])
                m = int(shard_pdf["m_bits"].iloc[0])
                k = int(shard_pdf["k"].iloc[0])
                bits = np.frombuffer(shard_pdf["bitmap"].iloc[0], dtype=np.uint8).copy()
                n0 = int(shard_pdf["n_items"].iloc[0])
                if urls_pdf.empty:
                    return shard_pdf
            pos = _bit_positions(urls_pdf["h1"].to_numpy(), urls_pdf["h2"].to_numpy(), k, m)
            np.bitwise_or.at(bits, (pos // 8).ravel(), (1 << (pos % 8)).astype(np.uint8).ravel())
            return pd.DataFrame(
                [(shard, n0 + len(urls_pdf), m, k, bits.tobytes())],
                columns=["shard", "n_items", "m_bits", "k", "bitmap"],
            )

        return (
            hashed.groupBy("shard").cogroup(shards.groupBy("shard")).applyInPandas(upd, SHARD_SCHEMA)
        )


# ---------------------------------------------------------------------------
# Cuckoo filter shards — supports delete (soft-deleted catalog rows, F8)
# ---------------------------------------------------------------------------

CUCKOO_SCHEMA = T.StructType(
    [
        T.StructField("shard", T.IntegerType(), False),
        T.StructField("n_items", T.LongType(), False),
        T.StructField("n_buckets", T.LongType(), False),
        T.StructField("table", T.BinaryType(), False),  # (n_buckets, 4) uint16
    ]
)

_BUCKET_SLOTS = 4
_MAX_KICKS = 500
_FP_MUL = np.uint64(0x5BD1E995)


def _cuckoo_fp(h2: np.ndarray) -> np.ndarray:
    fp = (h2.astype(np.uint64) & np.uint64(0xFFFF)).astype(np.uint16)
    fp[fp == 0] = 1
    return fp


def _cuckoo_idx(h1: np.ndarray, fp: np.ndarray, nb: int) -> tuple[np.ndarray, np.ndarray]:
    """nb MUST be a power of two: the xor partner function is only an
    involution under a power-of-two mask (standard cuckoo-filter trick)."""
    mask = np.uint64(nb - 1)
    i1 = (h1.astype(np.uint64) & mask).astype(np.int64)
    alt = (fp.astype(np.uint64) * _FP_MUL) & mask
    i2 = ((i1.astype(np.uint64) ^ alt) & mask).astype(np.int64)
    return i1, i2


class CuckooSeenSet:
    """Same sharded API as BloomSeenSet plus `delete`. ~94% load max at
    4 slots/bucket; sized at 2× items by default."""

    def __init__(self, n_shards: int = 64, slack: float = 2.0):
        self.n_shards = n_shards
        self.slack = slack

    def _insert_many(self, table: np.ndarray, h1, h2) -> int:
        nb = table.shape[0]
        fps = _cuckoo_fp(h2)
        i1s, i2s = _cuckoo_idx(h1, fps, nb)
        inserted = 0
        rng_state = 0x9E3779B97F4A7C15  # deterministic kick-slot PRNG
        mask = nb - 1
        for fp, i1, i2 in zip(fps, i1s, i2s):
            placed = False
            for idx in (i1, i2):
                row = table[idx]
                if fp in row:  # already present
                    placed = True
                    break
                empty = np.where(row == 0)[0]
                if empty.size:
                    table[idx, empty[0]] = fp
                    placed = True
                    break
            if placed:
                inserted += 1
                continue
            cur_fp, cur_idx = int(fp), int(i1)
            for _ in range(_MAX_KICKS):
                rng_state = (rng_state * 6364136223846793005 + 1) & 0xFFFFFFFFFFFFFFFF
                slot = rng_state % _BUCKET_SLOTS
                cur_fp, table[cur_idx, slot] = int(table[cur_idx, slot]), cur_fp
                alt = (cur_fp * int(_FP_MUL)) & mask
                cur_idx = (cur_idx ^ alt) & mask
                row = table[cur_idx]
                empty = np.where(row == 0)[0]
                if empty.size:
                    table[cur_idx, empty[0]] = cur_fp
                    cur_fp = None
                    break
            if cur_fp is None:
                inserted += 1
            # else: table full — item dropped (caller sizes with slack)
        return inserted

    def build(self, urls: DataFrame, url_col: str = "url") -> DataFrame:
        slack = self.slack

        def build_shard(pdf: pd.DataFrame) -> pd.DataFrame:
            shard = int(pdf["shard"].iloc[0])
            n = len(pdf)
            nb = 8
            while nb < slack * n / _BUCKET_SLOTS:
                nb *= 2  # power of two (xor partner involution)
            table = np.zeros((nb, _BUCKET_SLOTS), dtype=np.uint16)
            ins = self._insert_many(table, pdf["h1"].to_numpy(), pdf["h2"].to_numpy())
            return pd.DataFrame(
                [(shard, ins, nb, table.tobytes())],
                columns=["shard", "n_items", "n_buckets", "table"],
            )

        hashed = add_hash_cols(urls, url_col, self.n_shards).select("h1", "h2", "shard")
        return hashed.groupBy("shard").applyInPandas(build_shard, CUCKOO_SCHEMA)

    def check(self, urls: DataFrame, shards: DataFrame, url_col: str = "url") -> DataFrame:
        hashed = add_hash_cols(urls, url_col, self.n_shards)
        out_schema = T.StructType(
            hashed.schema.fields + [T.StructField("seen", T.BooleanType(), False)]
        )

        def probe(urls_pdf: pd.DataFrame, shard_pdf: pd.DataFrame) -> pd.DataFrame:
            if urls_pdf.empty:
                return urls_pdf.assign(seen=pd.Series([], dtype=bool))
            if shard_pdf.empty:
                return urls_pdf.assign(seen=False)
            nb = int(shard_pdf["n_buckets"].iloc[0])
            table = np.frombuffer(shard_pdf["table"].iloc[0], dtype=np.uint16).reshape(
                nb, _BUCKET_SLOTS
            )
            h1 = urls_pdf["h1"].to_numpy()
            fp = _cuckoo_fp(urls_pdf["h2"].to_numpy())
            i1, i2 = _cuckoo_idx(h1, fp, nb)
            hit = (table[i1] == fp[:, None]).any(axis=1) | (table[i2] == fp[:, None]).any(axis=1)
            return urls_pdf.assign(seen=hit)

        return (
            hashed.groupBy("shard").cogroup(shards.groupBy("shard")).applyInPandas(probe, out_schema)
        )

    def delete(self, shards: DataFrame, urls: DataFrame, url_col: str = "url") -> DataFrame:
        hashed = add_hash_cols(urls, url_col, self.n_shards).select("h1", "h2", "shard")

        def rm(urls_pdf: pd.DataFrame, shard_pdf: pd.DataFrame) -> pd.DataFrame:
            if shard_pdf.empty:
                return pd.DataFrame(columns=["shard", "n_items", "n_buckets", "table"])
            if urls_pdf.empty:
                return shard_pdf
            nb = int(shard_pdf["n_buckets"].iloc[0])
            table = np.frombuffer(shard_pdf["table"].iloc[0], dtype=np.uint16).reshape(
                nb, _BUCKET_SLOTS
            ).copy()
            removed = 0
            h1 = urls_pdf["h1"].to_numpy()
            fps = _cuckoo_fp(urls_pdf["h2"].to_numpy())
            i1s, i2s = _cuckoo_idx(h1, fps, nb)
            for fp, i1, i2 in zip(fps, i1s, i2s):
                for idx in (int(i1), int(i2)):
                    slot = np.where(table[idx] == fp)[0]
                    if slot.size:
                        table[idx, slot[0]] = 0
                        removed += 1
                        break
            return pd.DataFrame(
                [(
                    int(shard_pdf["shard"].iloc[0]),
                    int(shard_pdf["n_items"].iloc[0]) - removed,
                    nb,
                    table.tobytes(),
                )],
                columns=["shard", "n_items", "n_buckets", "table"],
            )

        return (
            hashed.groupBy("shard").cogroup(shards.groupBy("shard")).applyInPandas(rm, CUCKOO_SCHEMA)
        )

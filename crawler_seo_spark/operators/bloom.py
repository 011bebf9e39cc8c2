"""Sharded, round-incremental Bloom filter for the URL-seen set.

At 10^10-URL frontier scale the exact seen-set anti-join (J1) would scan and
shuffle the full seen table for every candidate batch. The Bloom prefilter
removes the bulk of *definitely-new* candidates from that join: only
maybe-seen candidates (true positives + FPR·new) reach the exact anti-join,
which preserves exactness — Bloom false positives cost one extra join probe,
false negatives are impossible.

Design (north-star construction, from public Bloom-filter practice):

* hashing is JVM-side — two independent 64-bit hashes per URL via
  ``xxhash64(url, seed)``; the k probe positions use standard double
  hashing ``h_i = h1 + i·h2 (mod m)`` (Kirsch-Mitzenmacher), so no Python
  touches the URL strings;
* the bit array is SHARDED by ``h1 mod n_shards``: each shard is built
  independently by an Arrow-batched ``applyInPandas`` over its hash group,
  giving fully parallel builds and bounded per-task memory;
* per-round INCREMENTAL merge: new-URL shard bitmaps are OR'd into the
  persistent shard set (bitwise OR of numpy arrays — associative, so shard
  updates parallelize; kept driver-side here, executor/object-store state on
  a real cluster);
* the probe side broadcasts the shard bitmaps once per round and tests
  membership in a vectorized pandas UDF over the precomputed hash columns.

Sizing: with m bits per shard, n insertions per shard, k hashes, FPR ≈
(1 − e^{−kn/m})^k; defaults (1 MiB·8 bits × 32 shards, k=5) hold FPR < 1%
up to ~3·10^7 URLs per shard.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_SEED1 = 0x5EED_1001
_SEED2 = 0x5EED_2002


class ShardedBloom:
    """Driver-held shard bitmaps + Spark-side build/probe plans."""

    def __init__(self, n_shards: int = 32, bits_per_shard: int = 1 << 23,
                 num_hashes: int = 5) -> None:
        assert bits_per_shard % 64 == 0
        self.n_shards = n_shards
        self.bits = bits_per_shard
        self.k = num_hashes
        self.shards = np.zeros((n_shards, bits_per_shard // 64), dtype=np.uint64)
        self.n_inserted = 0

    # -- hash columns (JVM-side) -------------------------------------------
    @staticmethod
    def with_hashes(df: DataFrame, url_col: str = "url") -> DataFrame:
        return (
            df.withColumn("_bh1", F.xxhash64(F.col(url_col), F.lit(_SEED1)))
              .withColumn("_bh2", F.xxhash64(F.col(url_col), F.lit(_SEED2)))
        )

    def _positions(self, h1: np.ndarray, h2: np.ndarray) -> np.ndarray:
        """(n, k) probe positions via double hashing, unsigned arithmetic."""
        u1 = h1.astype(np.uint64)
        u2 = h2.astype(np.uint64)
        ks = np.arange(self.k, dtype=np.uint64)
        return (u1[:, None] + ks[None, :] * u2[:, None]) % np.uint64(self.bits)

    def shard_of(self, h1: np.ndarray) -> np.ndarray:
        return (h1.astype(np.uint64) % np.uint64(self.n_shards)).astype(np.int64)

    # -- build / merge -------------------------------------------------------
    def add_urls(self, df: DataFrame, url_col: str = "url") -> None:
        """OR the URLs of ``df`` into the shard bitmaps.

        The per-shard bitmap build runs distributed (one Arrow group per
        shard); the driver only receives ``n_shards`` bitmaps to OR — the
        merge is associative, so on a real cluster this collect becomes a
        treeAggregate or an object-store write per shard.
        """
        hashed = self.with_hashes(df.select(url_col), url_col)
        hashed = hashed.withColumn(
            "_shard", F.pmod(F.col("_bh1"), F.lit(self.n_shards)).cast("int"))
        bits, k, words = self.bits, self.k, self.bits // 64

        def build(pdf: pd.DataFrame) -> pd.DataFrame:
            h1 = pdf["_bh1"].to_numpy().astype(np.uint64)
            h2 = pdf["_bh2"].to_numpy().astype(np.uint64)
            ks = np.arange(k, dtype=np.uint64)
            pos = ((h1[:, None] + ks[None, :] * h2[:, None])
                   % np.uint64(bits)).ravel()
            bitmap = np.zeros(words, dtype=np.uint64)
            np.bitwise_or.at(bitmap, (pos // 64).astype(np.int64),
                             np.uint64(1) << (pos % np.uint64(64)))
            return pd.DataFrame({
                "shard": [int(pdf["_shard"].iloc[0])],
                "bitmap": [bitmap.tobytes()],
                "n": [len(pdf)],
            })

        built = (
            hashed.groupBy("_shard")
            .applyInPandas(build, schema="shard int, bitmap binary, n long")
            .collect()
        )
        for row in built:
            self.shards[row["shard"]] |= np.frombuffer(
                row["bitmap"], dtype=np.uint64)
            self.n_inserted += row["n"]

    # -- probe ----------------------------------------------------------------
    def maybe_seen_col(self, spark: SparkSession):
        """Vectorized membership test: (h1, h2) → bool (true = maybe seen).

        Broadcasts the current bitmaps once; tasks probe locally.
        """
        bc = spark.sparkContext.broadcast(self.shards)
        bits, k, n_shards = self.bits, self.k, self.n_shards

        @F.pandas_udf("boolean")
        def _maybe(h1: pd.Series, h2: pd.Series) -> pd.Series:
            shards = bc.value
            u1 = h1.to_numpy().astype(np.uint64)
            u2 = h2.to_numpy().astype(np.uint64)
            shard_idx = (u1 % np.uint64(n_shards)).astype(np.int64)
            ks = np.arange(k, dtype=np.uint64)
            pos = (u1[:, None] + ks[None, :] * u2[:, None]) % np.uint64(bits)
            word = (pos // 64).astype(np.int64)
            bit = np.uint64(1) << (pos % np.uint64(64))
            hits = (shards[shard_idx[:, None], word] & bit) != 0
            return pd.Series(hits.all(axis=1))

        return _maybe

    def prune_new(self, candidates: DataFrame, seen: DataFrame,
                  url_col: str = "url") -> DataFrame:
        """Exact new-URL selection with Bloom pre-prune (J1).

        ``definitely new`` (bloom miss) bypasses the anti-join entirely;
        ``maybe seen`` goes through the exact ``left_anti`` against the seen
        table. Union of both is exactly the not-seen set.
        """
        hashed = self.with_hashes(candidates, url_col)
        spark = candidates.sparkSession
        probed = hashed.withColumn(
            "_maybe", self.maybe_seen_col(spark)(F.col("_bh1"), F.col("_bh2")))
        definitely_new = probed.filter(~F.col("_maybe"))
        maybe = probed.filter(F.col("_maybe"))
        survivors = maybe.join(seen.select(F.col(url_col)), url_col, "left_anti")
        return definitely_new.unionByName(survivors).drop("_bh1", "_bh2", "_maybe")


def expected_fpr(n: int, bits: int, k: int) -> float:
    """Textbook FPR estimate for one shard."""
    import math
    return (1.0 - math.exp(-k * n / bits)) ** k

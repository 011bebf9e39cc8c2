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
* the probe side holds ONE broadcast PER SHARD and re-broadcasts only the
  shards whose bitmap actually changed since the last probe (a no-op round
  ships zero bytes); unchanged shards stay cached on the executors. The
  membership test is a vectorized pandas UDF that groups each Arrow batch
  by shard and touches only the shard bitmaps present in the batch — per
  task, memory is O(shards-in-batch), not O(total bloom state).
  ``stats()`` reports the per-round changed-shard count and rebroadcast
  bytes so the bounded-traffic claim is testable.

Shard routing uses the SAME function on both sides — Spark's signed
``pmod(h1, n_shards)`` at build, numpy's Python-semantics ``%`` on the
signed int64 at probe (identical results for every h1, any n_shards).
Round 1 probed with a uint64 reinterpretation, which disagrees with pmod
for negative h1 whenever n_shards is not a power of two — a Bloom FALSE
NEGATIVE (seen URL routed to the wrong shard → "definitely new" → crawled
twice). Regression-tested in tests/test_bloom.py with n_shards=30.

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
        # per-shard broadcast lifecycle: handle + dirty set + traffic meters
        self._bc: list = [None] * n_shards
        self._dirty: set[int] = set(range(n_shards))  # nothing shipped yet
        self.last_changed_shards = 0
        self.last_rebroadcast_bytes = 0
        self.total_rebroadcast_bytes = 0
        self.probe_rounds = 0

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
        """Shard index — MUST equal Spark's ``pmod(h1, n_shards)``.

        numpy's ``%`` on signed ints uses Python semantics (result sign
        follows the divisor), which is exactly ``pmod``. Do NOT reinterpret
        to uint64 first: ``(2**64 + h1) % n`` differs from ``pmod(h1, n)``
        for negative h1 unless n is a power of two.
        """
        return np.mod(h1.astype(np.int64), self.n_shards)

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
            incoming = np.frombuffer(row["bitmap"], dtype=np.uint64)
            s = row["shard"]
            # dirty only if the OR actually flips a bit — a round of
            # already-seen URLs re-broadcasts nothing.
            if np.any(incoming & ~self.shards[s]):
                self.shards[s] = self.shards[s] | incoming
                self._dirty.add(s)
            self.n_inserted += row["n"]

    # -- probe ----------------------------------------------------------------
    def _refresh_broadcasts(self, spark: SparkSession) -> None:
        """Re-broadcast ONLY the shards whose bitmap changed since the last
        probe; unchanged shards keep their executor-cached broadcast."""
        sent = 0
        for s in sorted(self._dirty):
            if self._bc[s] is not None:
                self._bc[s].unpersist()
            self._bc[s] = spark.sparkContext.broadcast(self.shards[s])
            sent += self.shards[s].nbytes
        self.last_changed_shards = len(self._dirty)
        self.last_rebroadcast_bytes = sent
        self.total_rebroadcast_bytes += sent
        self.probe_rounds += 1
        self._dirty.clear()

    def stats(self) -> dict:
        return {
            "n_inserted": self.n_inserted,
            "probe_rounds": self.probe_rounds,
            "last_changed_shards": self.last_changed_shards,
            "last_rebroadcast_bytes": self.last_rebroadcast_bytes,
            "total_rebroadcast_bytes": self.total_rebroadcast_bytes,
        }

    def maybe_seen_col(self, spark: SparkSession):
        """Vectorized membership test: (h1, h2) → bool (true = maybe seen).

        Ships only changed shards (see :meth:`_refresh_broadcasts`), then
        probes each Arrow batch grouped by shard — a task touches only the
        shard bitmaps its rows route to, so per-task memory stays
        O(shards-in-batch) even when total bloom state is tens of GiB.
        """
        self._refresh_broadcasts(spark)
        bcs = list(self._bc)
        bits, k, n_shards = self.bits, self.k, self.n_shards

        @F.pandas_udf("boolean")
        def _maybe(h1: pd.Series, h2: pd.Series) -> pd.Series:
            s1 = h1.to_numpy().astype(np.int64)
            u1 = s1.astype(np.uint64)
            u2 = h2.to_numpy().astype(np.uint64)
            shard_idx = np.mod(s1, n_shards)  # == Spark pmod, build-side match
            ks = np.arange(k, dtype=np.uint64)
            pos = (u1[:, None] + ks[None, :] * u2[:, None]) % np.uint64(bits)
            word = (pos // 64).astype(np.int64)
            bit = np.uint64(1) << (pos % np.uint64(64))
            out = np.empty(len(s1), dtype=bool)
            for s in np.unique(shard_idx):
                m = shard_idx == s
                bitmap = bcs[int(s)].value
                out[m] = ((bitmap[word[m]] & bit[m]) != 0).all(axis=1)
            return pd.Series(out)

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

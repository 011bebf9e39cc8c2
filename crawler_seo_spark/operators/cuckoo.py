"""Sharded cuckoo filter for the URL-seen set — the deletable alternative
to :mod:`crawler_seo_spark.operators.bloom` (north-star: "sharded
Bloom/cuckoo URL-seen filter").

Why a cuckoo filter at all: recrawl. The Bloom filter cannot forget — once
a URL is seen it is seen forever, so a content-change-driven refresh
(operators/recrawl.py) must bypass the filter entirely. A cuckoo filter
supports DELETE: invalidating a changed URL removes its fingerprint, and
the URL flows through the normal admission path again on the next round.

Construction (standard public design — Fan, Andersen, Kaminsky, Mitzenmacher,
"Cuckoo Filter: Practically Better Than Bloom", CoNEXT 2014):

* per-URL: 16-bit fingerprint ``fp = (h2 mod 65535) + 1`` (0 = empty slot)
  and two candidate buckets ``i1 = index-bits of h1``,
  ``i2 = i1 XOR scramble(fp)`` — the XOR makes the pair order-free, so
  lookup/delete need only the stored fp and either index;
* buckets hold 4 slots; inserts kick occupants (bounded random walk, seeded
  — deterministic); the rare max-kick overflow goes to a per-shard stash so
  a full table degrades to a slightly slower exact check, never to a FALSE
  NEGATIVE (exactness of the prune is unconditional, same argument as the
  Bloom prune: false positives only cost an extra anti-join probe);
* the table is SHARDED by the same signed-pmod rule as the Bloom filter
  (build/probe parity — see bloom.py's round-2 regression note); hashing is
  JVM-side ``xxhash64``; the probe ships per-shard broadcasts with
  changed-shard-only refresh and touches only the shards in each batch.

State is driver-held at sandbox scale (default 32 shards × 32768 buckets ×
4 × 2 B = 8 MiB ≈ 4M URLs at ≤95% load); on a real cluster the shard
tables live in the object store and inserts/deletes route to a per-shard
owner (the same lifecycle swap documented for the Bloom shards).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_SEED_INDEX = 0xC0C0_1001
_SEED_FP = 0xC0C0_2002
_SCRAMBLE = np.uint64(0x5BD1E995)


class ShardedCuckoo:
    """Driver-held shard tables + Spark-side hash/probe plans."""

    def __init__(self, n_shards: int = 32, buckets_per_shard: int = 1 << 15,
                 slots: int = 4, max_kicks: int = 500, seed: int = 42) -> None:
        assert buckets_per_shard & (buckets_per_shard - 1) == 0, \
            "buckets_per_shard must be a power of two (index arithmetic)"
        self.n_shards = n_shards
        self.buckets = buckets_per_shard
        self.slots = slots
        self.max_kicks = max_kicks
        self.tables = np.zeros((n_shards, buckets_per_shard, slots),
                               dtype=np.uint16)
        self.stash: list[set[tuple[int, int]]] = [set()
                                                  for _ in range(n_shards)]
        self.n_inserted = 0
        self.n_deleted = 0
        self._rng = np.random.default_rng(seed)
        self._bc: list = [None] * n_shards
        self._dirty: set[int] = set(range(n_shards))
        self.last_rebroadcast_bytes = 0
        self.total_rebroadcast_bytes = 0

    # -- hash columns (JVM-side) -------------------------------------------
    @staticmethod
    def with_hashes(df: DataFrame, url_col: str = "url") -> DataFrame:
        return (df.withColumn("_ch1",
                              F.xxhash64(F.col(url_col), F.lit(_SEED_INDEX)))
                  .withColumn("_ch2",
                              F.xxhash64(F.col(url_col), F.lit(_SEED_FP))))

    def shard_of(self, h1: np.ndarray) -> np.ndarray:
        """== Spark pmod (signed) — same routing rule as the Bloom shards."""
        return np.mod(h1.astype(np.int64), self.n_shards)

    def _fp_i1_i2(self, h1: np.ndarray, h2: np.ndarray):
        fp = ((h2.astype(np.uint64) % np.uint64(65535)) + np.uint64(1)) \
            .astype(np.uint16)
        mask = np.uint64(self.buckets - 1)
        i1 = ((h1.astype(np.uint64) >> np.uint64(8)) & mask).astype(np.int64)
        alt = ((fp.astype(np.uint64) * _SCRAMBLE) & mask).astype(np.int64)
        i2 = i1 ^ alt
        return fp, i1, i2

    # -- mutate (driver-side vectorized; per-shard owner on a cluster) ------
    def _insert_one(self, shard: int, fp: int, i1: int, i2: int) -> None:
        table = self.tables[shard]
        for idx in (i1, i2):
            row = table[idx]
            free = np.flatnonzero(row == 0)
            if free.size:
                row[free[0]] = fp
                return
        # cuckoo kicks: bounded random walk, deterministic rng
        idx, cur = i1, fp
        mask = self.buckets - 1
        for _ in range(self.max_kicks):
            slot = int(self._rng.integers(self.slots))
            cur, table[idx][slot] = int(table[idx][slot]), cur
            idx = idx ^ (int(np.uint64(cur) * _SCRAMBLE) & mask)
            row = table[idx]
            free = np.flatnonzero(row == 0)
            if free.size:
                row[free[0]] = cur
                return
        self.stash[shard].add((cur, idx))  # overflow: exactness preserved

    def add_urls(self, df: DataFrame, url_col: str = "url") -> None:
        """Insert the urls of ``df``: hash columns computed JVM-side, only
        (h1, h2) pairs reach the driver."""
        rows = (self.with_hashes(df.select(url_col), url_col)
                .select("_ch1", "_ch2").collect())
        if not rows:
            return
        h1 = np.array([r["_ch1"] for r in rows], dtype=np.int64)
        h2 = np.array([r["_ch2"] for r in rows], dtype=np.int64)
        shards = self.shard_of(h1)
        fp, i1, i2 = self._fp_i1_i2(h1, h2)
        for k in range(len(rows)):
            self._insert_one(int(shards[k]), int(fp[k]), int(i1[k]),
                             int(i2[k]))
            self._dirty.add(int(shards[k]))
        self.n_inserted += len(rows)

    def delete_urls(self, df: DataFrame, url_col: str = "url") -> int:
        """Remove one stored copy of each url's fingerprint (recrawl
        invalidation). Returns how many were found and removed.

        PRECONDITION (standard cuckoo-filter delete semantics): every url
        in ``df`` must have been previously inserted and not yet deleted.
        Deleting a never-inserted url can remove ANOTHER url's colliding
        fingerprint from a shared bucket pair — a false negative (duplicate
        crawl). The engine's only caller, ``recrawl.invalidate_seen``,
        satisfies this by construction (CHANGED/GONE statuses imply the url
        was in the previous crawl's cache). Residual caveat even under the
        precondition: if two inserted urls share a 16-bit fingerprint AND a
        bucket pair (odds ≈ occupied_slots / (buckets·2^16) per delete),
        the survivor's copy is the one removed — the invalidated url then
        still probes maybe-seen and its recrawl is silently skipped until
        the next invalidation; exactness of prune_new is unaffected."""
        rows = (self.with_hashes(df.select(url_col), url_col)
                .select("_ch1", "_ch2").collect())
        removed = 0
        if not rows:
            return 0
        h1 = np.array([r["_ch1"] for r in rows], dtype=np.int64)
        h2 = np.array([r["_ch2"] for r in rows], dtype=np.int64)
        shards = self.shard_of(h1)
        fp, i1, i2 = self._fp_i1_i2(h1, h2)
        for k in range(len(rows)):
            s, f = int(shards[k]), int(fp[k])
            table = self.tables[s]
            done = False
            for idx in (int(i1[k]), int(i2[k])):
                hit = np.flatnonzero(table[idx] == f)
                if hit.size:
                    table[idx][hit[0]] = 0
                    done = True
                    break
            if not done:
                for entry in list(self.stash[s]):
                    if entry[0] == f:
                        self.stash[s].discard(entry)
                        done = True
                        break
            if done:
                removed += 1
                self._dirty.add(s)
        self.n_deleted += removed
        return removed

    # -- probe ----------------------------------------------------------------
    def _refresh_broadcasts(self, spark: SparkSession) -> None:
        sent = 0
        for s in sorted(self._dirty):
            if self._bc[s] is not None:
                self._bc[s].unpersist()
            payload = (self.tables[s], frozenset(self.stash[s]))
            self._bc[s] = spark.sparkContext.broadcast(payload)
            sent += self.tables[s].nbytes
        self.last_rebroadcast_bytes = sent
        self.total_rebroadcast_bytes += sent
        self._dirty.clear()

    def maybe_seen_col(self, spark: SparkSession):
        """(h1, h2) → bool; ships only changed shards, probes per-shard."""
        self._refresh_broadcasts(spark)
        bcs = list(self._bc)
        n_shards, buckets, _ = (self.n_shards, self.buckets, self.slots)
        scramble = _SCRAMBLE
        mask = np.uint64(buckets - 1)

        @F.pandas_udf("boolean")
        def _maybe(h1: pd.Series, h2: pd.Series) -> pd.Series:
            s1 = h1.to_numpy().astype(np.int64)
            u2 = h2.to_numpy().astype(np.int64)
            shard_idx = np.mod(s1, n_shards)
            fp = ((u2.astype(np.uint64) % np.uint64(65535)) + np.uint64(1)) \
                .astype(np.uint16)
            i1 = ((s1.astype(np.uint64) >> np.uint64(8)) & mask) \
                .astype(np.int64)
            i2 = i1 ^ ((fp.astype(np.uint64) * scramble) & mask) \
                .astype(np.int64)
            out = np.zeros(len(s1), dtype=bool)
            for s in np.unique(shard_idx):
                m = shard_idx == s
                table, stash = bcs[int(s)].value
                hit1 = (table[i1[m]] == fp[m, None]).any(axis=1)
                hit2 = (table[i2[m]] == fp[m, None]).any(axis=1)
                hits = hit1 | hit2
                if stash:
                    stash_fps = np.array([e[0] for e in stash],
                                         dtype=np.uint16)
                    hits |= np.isin(fp[m], stash_fps)
                out[m] = hits
            return pd.Series(out)

        return _maybe

    def prune_new(self, candidates: DataFrame, seen: DataFrame,
                  url_col: str = "url") -> DataFrame:
        """Exact new-URL selection with cuckoo pre-prune (same contract as
        ShardedBloom.prune_new: misses bypass the anti-join, maybes get the
        exact check — the union is exactly the not-seen set)."""
        hashed = self.with_hashes(candidates, url_col)
        spark = candidates.sparkSession
        probed = hashed.withColumn(
            "_maybe",
            self.maybe_seen_col(spark)(F.col("_ch1"), F.col("_ch2")))
        definitely_new = probed.filter(~F.col("_maybe"))
        maybe = probed.filter(F.col("_maybe"))
        survivors = maybe.join(seen.select(F.col(url_col)), url_col,
                               "left_anti")
        return (definitely_new.unionByName(survivors)
                .drop("_ch1", "_ch2", "_maybe"))

    def stats(self) -> dict:
        load = float((self.tables != 0).sum()) / self.tables.size
        return {
            "n_inserted": self.n_inserted,
            "n_deleted": self.n_deleted,
            "load_factor": round(load, 4),
            "stash_total": sum(len(s) for s in self.stash),
            "last_rebroadcast_bytes": self.last_rebroadcast_bytes,
            "total_rebroadcast_bytes": self.total_rebroadcast_bytes,
        }

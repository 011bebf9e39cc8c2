"""Bloom shard lifecycle + shard-routing exactness.

Covers the two round-2 scale fixes:

* build/probe shard-function parity for NON-power-of-two shard counts —
  round 1 built with signed ``pmod`` but probed with a uint64 ``%``, which
  disagree for negative h1 whenever n_shards isn't a power of two, creating
  Bloom false negatives (seen URLs re-crawled, breaking crawl-order parity);
* changed-shard-only re-broadcast — per-round bloom traffic must be bounded
  by the shards that actually changed, not total bloom state.
"""

import numpy as np
import pytest
from pyspark.sql import functions as F

from crawler_seo_spark.operators.bloom import ShardedBloom


def _urls(spark, start, n, tag="u"):
    return spark.range(start, start + n).select(
        F.concat(F.lit(f"https://ex.test/{tag}/"), F.col("id").cast("string"))
        .alias("url"))


@pytest.mark.parametrize("n_shards", [30, 32, 7])
def test_no_false_negatives_any_shard_count(spark, n_shards):
    """Every inserted URL must probe maybe-seen — for power-of-two AND odd
    shard counts (the round-1 bug produced false negatives at n=30)."""
    bloom = ShardedBloom(n_shards=n_shards, bits_per_shard=1 << 14,
                         num_hashes=5)
    seen = _urls(spark, 0, 500).localCheckpoint(eager=True)
    bloom.add_urls(seen)
    probed = ShardedBloom.with_hashes(seen).withColumn(
        "_maybe", bloom.maybe_seen_col(spark)(F.col("_bh1"), F.col("_bh2")))
    misses = probed.filter(~F.col("_maybe")).count()
    assert misses == 0, f"{misses} false negatives at n_shards={n_shards}"


def test_shard_of_matches_spark_pmod(spark):
    """The numpy shard router must equal Spark's pmod for negative hashes."""
    bloom = ShardedBloom(n_shards=30, bits_per_shard=1 << 10)
    h = np.array([-7, -1, 0, 1, 2**62, -(2**62), 29, -30], dtype=np.int64)
    spark_side = (spark.createDataFrame([(int(x),) for x in h], "h long")
                  .select(F.pmod(F.col("h"), F.lit(30)).cast("long").alias("s"))
                  .toPandas()["s"].to_numpy())
    assert (bloom.shard_of(h) == spark_side).all()


def test_prune_new_exact_odd_shards(spark):
    """prune_new == exact anti-join result at a non-power-of-two shard count."""
    bloom = ShardedBloom(n_shards=30, bits_per_shard=1 << 14)
    seen = _urls(spark, 0, 400).localCheckpoint(eager=True)
    cand = _urls(spark, 300, 300).localCheckpoint(eager=True)  # 100 overlap
    bloom.add_urls(seen)
    got = sorted(r["url"] for r in bloom.prune_new(cand, seen).collect())
    want = sorted(r["url"] for r in
                  cand.join(seen, "url", "left_anti").collect())
    assert got == want and len(got) == 200


def test_rebroadcast_only_changed_shards(spark):
    """Round traffic is bounded by changed shards: a no-op round ships zero
    bytes; a fresh round ships only the shards its URLs hash into."""
    bloom = ShardedBloom(n_shards=16, bits_per_shard=1 << 13)
    shard_bytes = bloom.shard_nbytes

    first = _urls(spark, 0, 200).localCheckpoint(eager=True)
    bloom.add_urls(first)
    bloom.maybe_seen_col(spark)  # round 1 probe: everything dirty once
    assert bloom.last_rebroadcast_bytes == 16 * shard_bytes

    # re-adding the same URLs flips no bits -> zero rebroadcast
    bloom.add_urls(first)
    bloom.maybe_seen_col(spark)
    assert bloom.last_changed_shards == 0
    assert bloom.last_rebroadcast_bytes == 0

    # a single new URL dirties at most one shard
    bloom.add_urls(_urls(spark, 10_000, 1, tag="x"))
    bloom.maybe_seen_col(spark)
    assert bloom.last_changed_shards == 1
    assert bloom.last_rebroadcast_bytes == shard_bytes
    assert bloom.stats()["total_rebroadcast_bytes"] == 17 * shard_bytes

    # correctness survives the incremental lifecycle
    probed = ShardedBloom.with_hashes(first).withColumn(
        "_maybe", bloom.maybe_seen_col(spark)(F.col("_bh1"), F.col("_bh2")))
    assert probed.filter(~F.col("_maybe")).count() == 0


def test_ivf_assign_collects_only_centroids(spark, monkeypatch):
    """ivf_assign's only driver materialization is the ≤n_lists centroid
    rows (round 1 collected every corpus id — O(corpus) driver memory)."""
    try:  # Spark 4 concrete class overrides the pyspark.sql.DataFrame ABC
        from pyspark.sql.classic.dataframe import DataFrame
    except ImportError:  # pragma: no cover - Spark 3
        from pyspark.sql import DataFrame

    from crawler_seo_spark.operators import similarity

    corpus = spark.range(500).select(
        F.col("id").alias("vec_id"),
        F.array(*[(F.col("id") * (i + 1) % 17).cast("float")
                  for i in range(8)]).alias("embedding"),
    ).localCheckpoint(eager=True)

    collected_sizes = []
    orig_collect = DataFrame.collect

    def counting_collect(self):
        rows = orig_collect(self)
        collected_sizes.append(len(rows))
        return rows

    monkeypatch.setattr(DataFrame, "collect", counting_collect)
    monkeypatch.setattr(DataFrame, "count",
                        lambda self: (_ for _ in ()).throw(
                            AssertionError("ivf_assign must not count()")))
    assigned, cents = similarity.ivf_assign(corpus, n_lists=8)
    assert collected_sizes and max(collected_sizes) <= 8
    assert len(cents) == 8
    monkeypatch.undo()
    # assignment still covers the corpus and lists are within range
    lists = assigned.select("ivf_list").distinct().collect()
    assert all(0 <= r["ivf_list"] < 8 for r in lists)
    assert assigned.count() == 500

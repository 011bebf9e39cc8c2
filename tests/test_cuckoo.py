"""Cuckoo seen-filter: no false negatives, exact prune, DELETE support
(the recrawl-invalidation capability Bloom lacks), bounded FPR, and
changed-shard-only broadcast accounting."""

import pytest
from pyspark.sql import functions as F

from crawler_seo_spark.operators.cuckoo import ShardedCuckoo


def _urls(spark, start, n, tag="u"):
    return spark.range(start, start + n).select(
        F.concat(F.lit(f"https://ex.test/{tag}/"), F.col("id").cast("string"))
        .alias("url"))


@pytest.mark.parametrize("n_shards", [30, 32])
def test_no_false_negatives(spark, n_shards):
    ck = ShardedCuckoo(n_shards=n_shards, buckets_per_shard=1 << 10)
    seen = _urls(spark, 0, 2000).localCheckpoint(eager=True)
    ck.add_urls(seen)
    probed = ShardedCuckoo.with_hashes(seen).withColumn(
        "_maybe", ck.maybe_seen_col(spark)(F.col("_ch1"), F.col("_ch2")))
    assert probed.filter(~F.col("_maybe")).count() == 0
    assert ck.stats()["load_factor"] > 0


def test_prune_new_exact(spark):
    ck = ShardedCuckoo(n_shards=16, buckets_per_shard=1 << 10)
    seen = _urls(spark, 0, 800).localCheckpoint(eager=True)
    cand = _urls(spark, 600, 600).localCheckpoint(eager=True)  # 200 overlap
    ck.add_urls(seen)
    got = sorted(r["url"] for r in ck.prune_new(cand, seen).collect())
    want = sorted(r["url"] for r in
                  cand.join(seen, "url", "left_anti").collect())
    assert got == want and len(got) == 400


def test_delete_readmits_urls(spark):
    """The recrawl story: deleting changed urls makes the filter admit them
    again; everything else stays filtered. FPR on fresh urls stays small."""
    ck = ShardedCuckoo(n_shards=8, buckets_per_shard=1 << 11)
    seen = _urls(spark, 0, 3000).localCheckpoint(eager=True)
    ck.add_urls(seen)
    changed = _urls(spark, 0, 300)  # first 300 changed content
    assert ck.delete_urls(changed) == 300
    probed = ShardedCuckoo.with_hashes(seen).withColumn(
        "_maybe", ck.maybe_seen_col(spark)(F.col("_ch1"), F.col("_ch2")))
    readmitted = probed.filter(
        ~F.col("_maybe")
        & (F.regexp_extract("url", r"/u/(\d+)$", 1).cast("int") < 300))
    # deleted urls read as definitely-new again (up to rare fp collisions)
    assert readmitted.count() >= 290
    # non-deleted urls: still zero false negatives
    kept = probed.filter(
        F.regexp_extract("url", r"/u/(\d+)$", 1).cast("int") >= 300)
    assert kept.filter(~F.col("_maybe")).count() == 0
    # FPR on never-seen urls bounded
    fresh = _urls(spark, 100_000, 2000, tag="x")
    fp = ShardedCuckoo.with_hashes(fresh).withColumn(
        "_maybe", ck.maybe_seen_col(spark)(F.col("_ch1"), F.col("_ch2")))
    assert fp.filter(F.col("_maybe")).count() < 40  # < 2%


def test_rebroadcast_only_changed_shards(spark):
    ck = ShardedCuckoo(n_shards=16, buckets_per_shard=1 << 10)
    ck.add_urls(_urls(spark, 0, 500).localCheckpoint(eager=True))
    ck.maybe_seen_col(spark)
    first = ck.last_rebroadcast_bytes
    assert first == 16 * ck.shard_nbytes
    ck.maybe_seen_col(spark)  # nothing changed
    assert ck.last_rebroadcast_bytes == 0
    ck.delete_urls(_urls(spark, 0, 1))
    ck.maybe_seen_col(spark)  # one shard dirtied by the delete
    assert ck.last_rebroadcast_bytes == ck.shard_nbytes


def test_recrawl_invalidation_flow(spark):
    """detect_changes -> invalidate_seen -> filter admits changed urls."""
    from crawler_seo_spark.operators.recrawl import (
        detect_changes,
        invalidate_seen,
    )
    ck = ShardedCuckoo(n_shards=8, buckets_per_shard=1 << 10)
    urls = _urls(spark, 0, 100).localCheckpoint(eager=True)
    ck.add_urls(urls)
    old = urls.select("url", F.md5("url").alias("content_md5"),
                      F.lit(0).cast("long").alias("checked_seq"))
    new = urls.select(
        "url",
        F.when(F.regexp_extract("url", r"/u/(\d+)$", 1).cast("int") < 20,
               F.md5(F.concat(F.col("url"), F.lit("v2"))))
        .otherwise(F.md5("url")).alias("content_md5"),
        F.lit(1).cast("long").alias("checked_seq"))
    changes = detect_changes(old, new)
    assert invalidate_seen(ck, changes) == 20
    probed = ShardedCuckoo.with_hashes(urls).withColumn(
        "_maybe", ck.maybe_seen_col(spark)(F.col("_ch1"), F.col("_ch2")))
    admitted = {r["url"] for r in probed.filter(~F.col("_maybe")).collect()}
    expected = {f"https://ex.test/u/{i}" for i in range(20)}
    assert expected <= admitted | set()  # all changed urls re-admitted
    assert len(admitted - expected) == 0  # and nothing else

"""Executor-resident seen-filter state: the driver must never hold an
O(total-filter-state) array (the last 10^10-scale residency ceiling from
the round-2 verdict). Shard bitmaps/tables live in versioned files mutated
by the shard-owning tasks; the driver keeps only the version vector and
counters, and the same state dir reopens across engine instances (resume).
"""

import os

import numpy as np
import pytest
from pyspark.sql import functions as F

from crawler_seo_spark.operators.bloom import ShardedBloom
from crawler_seo_spark.operators.cuckoo import ShardedCuckoo


def _urls(spark, start, n, tag="u"):
    return spark.range(start, start + n).select(
        F.concat(F.lit(f"https://ex.test/{tag}/"), F.col("id").cast("string"))
        .alias("url"))


def _big_ndarrays(obj) -> list:
    """Every numpy array reachable from the object's __dict__ (one level —
    the filters have no nested containers of arrays besides lists/dicts)."""
    found = []
    stack = list(vars(obj).values())
    while stack:
        v = stack.pop()
        if isinstance(v, np.ndarray):
            found.append(v)
        elif isinstance(v, (list, tuple, set)):
            stack.extend(v)
        elif isinstance(v, dict):
            stack.extend(v.values())
    return found


@pytest.mark.parametrize("cls,kwargs", [
    (ShardedBloom, dict(n_shards=16, bits_per_shard=1 << 14)),
    (ShardedCuckoo, dict(n_shards=16, buckets_per_shard=1 << 10)),
])
def test_driver_holds_no_filter_state(spark, cls, kwargs):
    """After inserting URLs into every shard, the driver object holds no
    bitmap/table arrays at all, and its reported resident bytes stay far
    below one shard's state."""
    filt = cls(**kwargs)
    filt.add_urls(_urls(spark, 0, 2000).localCheckpoint(eager=True))
    # probe to exercise the full lifecycle before auditing residency
    probed = cls.with_hashes(_urls(spark, 0, 100))
    cols = [c for c in probed.columns if c.startswith("_")]
    probed = probed.withColumn(
        "_maybe", filt.maybe_seen_col(spark)(*[F.col(c) for c in cols]))
    assert probed.filter(~F.col("_maybe")).count() == 0
    arrays = _big_ndarrays(filt)
    assert sum(a.nbytes for a in arrays) == 0, \
        f"driver retains {sum(a.nbytes for a in arrays)} filter bytes"
    assert filt.stats()["driver_resident_bytes"] <= filt.shard_nbytes


def test_bloom_state_reopens_across_instances(spark, tmp_path):
    """A new ShardedBloom over the same state dir answers probes without
    re-adding — the resume path's backfill skip."""
    d = str(tmp_path / "bloomstate")
    seen = _urls(spark, 0, 500).localCheckpoint(eager=True)
    b1 = ShardedBloom(n_shards=8, bits_per_shard=1 << 14, state_dir=d)
    b1.add_urls(seen)
    b2 = ShardedBloom(n_shards=8, bits_per_shard=1 << 14, state_dir=d)
    assert b2.n_inserted == 500  # manifest reloaded
    probed = ShardedBloom.with_hashes(seen).withColumn(
        "_maybe", b2.maybe_seen_col(spark)(F.col("_bh1"), F.col("_bh2")))
    assert probed.filter(~F.col("_maybe")).count() == 0


def test_cuckoo_state_reopens_and_deletes(spark, tmp_path):
    """Reopened cuckoo state still supports DELETE → re-admission."""
    d = str(tmp_path / "cuckoostate")
    seen = _urls(spark, 0, 400).localCheckpoint(eager=True)
    c1 = ShardedCuckoo(n_shards=8, buckets_per_shard=1 << 10, state_dir=d)
    c1.add_urls(seen)
    c2 = ShardedCuckoo(n_shards=8, buckets_per_shard=1 << 10, state_dir=d)
    assert c2.n_inserted == 400
    assert c2.delete_urls(_urls(spark, 0, 50)) == 50
    probed = ShardedCuckoo.with_hashes(seen).withColumn(
        "_maybe", c2.maybe_seen_col(spark)(F.col("_ch1"), F.col("_ch2")))
    readmitted = probed.filter(
        ~F.col("_maybe")
        & (F.regexp_extract("url", r"/u/(\d+)$", 1).cast("int") < 50))
    assert readmitted.count() >= 48  # rare fp collisions allowed
    kept = probed.filter(
        F.regexp_extract("url", r"/u/(\d+)$", 1).cast("int") >= 50)
    assert kept.filter(~F.col("_maybe")).count() == 0


def test_old_versions_garbage_collected(spark, tmp_path):
    """publish_shard keeps at most the current and previous version per
    shard (one generation of grace for lazily recomputed probe plans)."""
    d = str(tmp_path / "gc")
    b = ShardedBloom(n_shards=4, bits_per_shard=1 << 10, state_dir=d)
    for i in range(4):  # 4 rounds of fresh urls → up to 4 versions/shard
        b.add_urls(_urls(spark, 1000 * i, 200).localCheckpoint(eager=True))
    files = [f for f in os.listdir(d) if f.startswith("shard")]
    per_shard: dict[str, int] = {}
    for f in files:
        per_shard[f.split(".")[0]] = per_shard.get(f.split(".")[0], 0) + 1
    assert per_shard and all(n <= 2 for n in per_shard.values()), per_shard
    # and the filter still answers correctly over all four batches
    allseen = _urls(spark, 0, 200).unionByName(_urls(spark, 3000, 200))
    probed = ShardedBloom.with_hashes(allseen).withColumn(
        "_maybe", b.maybe_seen_col(spark)(F.col("_bh1"), F.col("_bh2")))
    assert probed.filter(~F.col("_maybe")).count() == 0


def test_engine_checkpoint_carries_filter_state(spark, pages_df, tmp_path):
    """With checkpointing on, the engine parks filter state under
    checkpoint_dir/seen_filter and a resumed engine skips the backfill
    (n_inserted persists through the manifest)."""
    from crawler_seo_spark.config import CrawlConfig
    from crawler_seo_spark.engine import CrawlEngine
    from crawler_seo_spark.sources.synthetic_site import SEED_URL
    ckpt = str(tmp_path / "ckpt")
    pages = pages_df
    cfg = CrawlConfig(seed_url=SEED_URL, max_urls=30, batch_size=10,
                      checkpoint_dir=ckpt, bloom_min_seen=5, bloom_seen_batch_ratio=0)
    eng = CrawlEngine(spark, pages, cfg)
    eng.run()
    assert eng.bloom.n_inserted > 0
    assert os.path.isdir(os.path.join(ckpt, "seen_filter"))
    # a fresh engine over the same checkpoint reloads the filter manifest
    eng2 = CrawlEngine(spark, pages, cfg)
    assert eng2.bloom.n_inserted == eng.bloom.n_inserted


def test_worker_cache_evicts_abandoned_state_dirs(tmp_path):
    """The per-process probe cache must not strand payloads for state dirs
    that no longer exist: each bench/test run making a fresh temp dir would
    otherwise leak ~n_shards parsed payloads per worker forever."""
    import shutil

    from crawler_seo_spark.operators import shardstate as ss

    dirs = [str(tmp_path / f"st{i}") for i in range(3)]
    for d in dirs:
        os.makedirs(d)
        ss.publish_shard(d, 0, 1, b"payload")
        assert ss.cached_load(d, 0, 1, lambda b: b) == b"payload"
    assert sum(1 for k in ss._CACHE if k[0] in dirs) == 3
    shutil.rmtree(dirs[0])
    shutil.rmtree(dirs[1])
    # next insert (new key) sweeps entries whose dir is gone
    ss.publish_shard(dirs[2], 1, 1, b"p2")
    ss.cached_load(dirs[2], 1, 1, lambda b: b)
    assert not any(k[0] in dirs[:2] for k in ss._CACHE)
    # live dir's entries survive, hits still served
    assert ss.cached_load(dirs[2], 0, 1, lambda b: b) == b"payload"

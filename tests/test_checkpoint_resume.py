"""Checkpoint/resume: a killed run resumed from the snapshot store must be
bit-identical to the uninterrupted run (north-rule requirement).

Kill simulation: run to completion with per-round snapshots, roll the
manifest back to an intermediate round (= crash after that round's commit;
later data dirs are unreferenced garbage), resume with the SAME budget.
Round boundaries depend on the remaining budget (reference batch cut,
core/crawler.py:95-106), so resume-with-same-budget is the bit-identical
contract; growing the budget is a different crawl by definition.
"""

import tempfile

from crawler_seo_spark.config import CrawlConfig
from crawler_seo_spark.engine import CrawlEngine
from crawler_seo_spark.sources.synthetic_site import SEED_URL
from crawler_seo_spark.tables import SnapshotStore


def _order(state):
    return [(r["crawl_seq"], r["url"], r["depth"], r["priority"], r["round"])
            for r in state.crawl_order.orderBy("crawl_seq").collect()]


def test_resume_bit_identical(spark, pages_df):
    ckpt = tempfile.mkdtemp(prefix="resume_ckpt_")
    cfg = CrawlConfig(seed_url=SEED_URL, max_urls=60, batch_size=15,
                      checkpoint_dir=ckpt)
    full = CrawlEngine(spark, pages_df, cfg).run()
    full_order = _order(full)

    store = SnapshotStore(ckpt)
    last = store.manifest()["round"]
    assert last >= 2
    kill_at = last // 2
    store.rollback(kill_at)
    assert store.manifest()["round"] == kill_at

    resumed = CrawlEngine(spark, pages_df, cfg).run(resume=True)
    assert _order(resumed) == full_order
    assert {r["url"] for r in resumed.seen.collect()} \
        == {r["url"] for r in full.seen.collect()}
    got_f = sorted((r["url"], r["reason"]) for r in resumed.filtered.collect())
    want_f = sorted((r["url"], r["reason"]) for r in full.filtered.collect())
    assert got_f == want_f
    # resumed rounds continue exactly after the kill point
    assert resumed.rounds[0]["round"] == kill_at + 1


def test_resume_without_manifest_starts_fresh(spark, pages_df):
    ckpt = tempfile.mkdtemp(prefix="fresh_ckpt_")
    cfg = CrawlConfig(seed_url=SEED_URL, max_urls=10, batch_size=5,
                      checkpoint_dir=ckpt)
    state = CrawlEngine(spark, pages_df, cfg).run(resume=True)  # no manifest
    assert state.crawl_order.count() == 10


def test_fresh_run_reclaims_marker_orphaned_before_manifest(spark, pages_df):
    """A run that died in round 0 BETWEEN the O_EXCL marker claim and the
    manifest publish leaves a commit marker with no manifest. A fresh run
    (resume=False) over that dir must reset unconditionally — gating the
    reset on manifest() being non-None left the marker alive and the new
    run's first commit_round(0) died with ConcurrentCommitError."""
    import os

    ckpt = tempfile.mkdtemp(prefix="orphan0_ckpt_")
    os.makedirs(f"{ckpt}/rounds")
    open(f"{ckpt}/rounds/r00000.commit", "w").close()  # marker, no manifest
    cfg = CrawlConfig(seed_url=SEED_URL, max_urls=10, batch_size=5,
                      checkpoint_dir=ckpt)
    state = CrawlEngine(spark, pages_df, cfg).run()
    assert state.crawl_order.count() == 10
    assert SnapshotStore(ckpt).manifest() is not None


def test_cooperative_two_writers_match_serial(spark, pages_df):
    """Two engines with distinct writer_ids share one store: each stages
    its round under writer-scoped names, races on the commit marker, and
    the loser aborts + rebases onto the winner's committed round. BOTH
    must finish with the serial run's exact crawl, and no staged snapshot
    artifacts may survive (every remaining data dir is referenced by a
    committed file-list)."""
    import json
    import os
    import threading

    base = dict(seed_url=SEED_URL, max_urls=60, batch_size=15)
    serial = CrawlEngine(spark, pages_df, CrawlConfig(
        **base, checkpoint_dir=tempfile.mkdtemp(prefix="coop_serial_"))).run()
    want = _order(serial)

    ckpt = tempfile.mkdtemp(prefix="coop_ckpt_")
    engines = [CrawlEngine(spark, pages_df, CrawlConfig(
        **base, checkpoint_dir=ckpt, writer_id=w)) for w in ("wa", "wb")]
    states, errors = {}, []

    def runner(name, eng):
        try:
            states[name] = eng.run()
        except BaseException as e:  # surfaced below
            errors.append((name, e))

    threads = [threading.Thread(target=runner, args=(f"w{i}", e))
               for i, e in enumerate(engines)]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=600)
    assert not errors, errors
    assert len(states) == 2

    for name, st in states.items():
        assert _order(st) == want, name
        assert ({r["url"] for r in st.seen.collect()}
                == {r["url"] for r in serial.seen.collect()}), name
    # the race was actually exercised (both started together, rounds are
    # ~seconds: at least one commit must have been lost and rebased)
    assert sum(e.rebase_count for e in engines) >= 1

    # no orphaned snapshot state: every surviving data dir is referenced
    # by a committed (shared) file-list, and no staged file-lists remain
    for table in ("frontier", "seen", "results"):
        tdir = os.path.join(ckpt, table)
        names = os.listdir(tdir)
        assert not [n for n in names if n.count(".files.json") and
                    n.count(".") > 2], names  # staged jsons all gone
        referenced = set()
        for n in names:
            if n.endswith(".files.json"):
                with open(os.path.join(tdir, n)) as f:
                    referenced |= {os.path.basename(d) for d in json.load(f)}
        dirs = {n for n in names if os.path.isdir(os.path.join(tdir, n))}
        assert dirs <= referenced, (table, dirs - referenced)


def test_resume_restores_live_robots_state(spark):
    """Live-robots state (rules cache + Crawl-delay) is part of the
    committed snapshot: a resumed run must replay the same per-host
    schedule (bit-identical contract) instead of silently falling back
    to the unlimited-rps fast path until the next TTL refetch."""
    import os

    from crawler_seo_spark.sources.from_documents import (
        SEED_URL as DOC_SEED, live_fetch_factory)

    body = "User-agent: *\nCrawl-delay: 0.002\nDisallow: /blog/\n"

    def factory():
        inner = live_fetch_factory(150)()

        def fetch(url):
            if url.endswith("/robots.txt"):
                return {"status_code": 200, "content_type": "text/plain",
                        "final_url": url, "response_time_ms": 1.0,
                        "content_length": len(body), "html": body,
                        "headers": {}}
            return inner(url)
        return fetch

    def run(ckpt, resume=False):
        cfg = CrawlConfig(seed_url=DOC_SEED, max_urls=45, batch_size=15,
                          requests_per_second=1e9, fetch_robots=True,
                          checkpoint_dir=ckpt)
        return CrawlEngine(spark, None, cfg,
                           fetch_fn_factory=factory).run(resume=resume)

    full = run(tempfile.mkdtemp(prefix="rb_full_"))
    want = sorted((r["crawl_seq"], r["url"], r["scheduled_offset_ms"])
                  for r in full.results.select(
                      "crawl_seq", "url", "scheduled_offset_ms").collect())

    ckpt = tempfile.mkdtemp(prefix="rb_kill_")
    run(ckpt)
    store = SnapshotStore(ckpt)
    store.rollback(store.manifest()["round"] - 1)  # kill after round n-1
    resumed = run(ckpt, resume=True)
    got = sorted((r["crawl_seq"], r["url"], r["scheduled_offset_ms"])
                 for r in resumed.results.select(
                     "crawl_seq", "url", "scheduled_offset_ms").collect())
    assert got == want  # incl. the resumed round's Crawl-delay offsets
    assert any(off > 0 for _, _, off in got)

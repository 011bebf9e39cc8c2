"""Streaming operators over the driver-generated events table: batch/stream
result unification, watermarked windows, sessionization, custom state."""

import os
import shutil

import pytest

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
EVENTS = f"{SF_DIR.replace('sf0.1', 'sf0.001').replace('sf0.01', 'sf0.001')}/events.parquet"


@pytest.fixture(scope="module")
def events_dir(tmp_path_factory):
    """Streaming file sources need a directory, not a single file."""
    d = tmp_path_factory.mktemp("events_stream")
    shutil.copy(EVENTS, d / "part-0.parquet")
    return str(d)


@pytest.fixture(scope="module")
def events_batch(spark):
    return spark.read.parquet(EVENTS)


def test_windowed_counts_batch_equals_stream(spark, events_batch, events_dir):
    from crawler_seo_spark.streaming.events import (
        run_stream_to_memory, windowed_counts)
    batch = {(r["window_start"], r["event_type"]): (r["n"], r["total_value"])
             for r in windowed_counts(events_batch).collect()}
    streamed = run_stream_to_memory(
        spark, events_dir, windowed_counts, "win_out")
    got = {(r["window_start"], r["event_type"]): (r["n"], r["total_value"])
           for r in streamed.collect()}
    # Append mode only emits windows finalized by the watermark: every
    # emitted row must match the batch result, and the only rows missing
    # are windows still open at end-of-input (within watermark of max ts).
    assert got.items() <= batch.items()
    import datetime
    max_ts = max(k[0] for k in batch)
    for (w_start, etype), v in batch.items():
        if (w_start, etype) not in got:
            assert w_start >= max_ts - datetime.timedelta(minutes=15), \
                (w_start, etype)
    assert len(got) > 0


def test_sessionize_batch_oracle(spark, events_batch):
    from crawler_seo_spark.streaming.events import (
        sessionize, sessionize_batch_window)
    a = sessionize(events_batch, gap="30 minutes")
    b = sessionize_batch_window(events_batch, gap_minutes=30)
    ka = {(r["user_id"], r["session_start"]): (r["n_events"], r["session_value"])
          for r in a.collect()}
    kb = {(r["user_id"], r["session_start"]): (r["n_events"], r["session_value"])
          for r in b.collect()}
    assert ka == kb
    assert len(ka) > 0


def test_stateful_counters(spark, events_batch, events_dir):
    from crawler_seo_spark.streaming.events import counters_stream
    out = counters_stream(spark, events_dir, "ctr_out")
    # final state per type must equal the batch groupBy count
    import pyspark.sql.functions as F
    want = {r["event_type"]: r["n"] for r in
            events_batch.groupBy("event_type").agg(F.count("*").alias("n"))
            .collect()}
    got = {}
    for r in out.collect():  # updates; last one per type wins
        got[r["event_type"]] = max(got.get(r["event_type"], 0),
                                   r["running_count"])
    assert got == want


def test_streaming_dedup_ingest_incremental(spark, tmp_path):
    """foreachBatch incremental dedup: two file-source micro-batches
    ingest into one SignatureIndex; each epoch computes only its own
    signatures (index rounds advance per batch, delta dirs hold only the
    batch), and the union of per-epoch pairs equals the full-corpus LSH
    recompute."""
    from crawler_seo_spark.operators.dedup import lsh_candidate_pairs
    from crawler_seo_spark.operators.incremental import SignatureIndex
    from crawler_seo_spark.streaming.ingest import start_dedup_ingest
    from crawler_seo_spark.tables import SnapshotStore

    def docs(ids):
        return spark.createDataFrame(
            [(i, f"the quick brown fox {i // 2} jumps over the lazy dog "
                 f"number {i // 2} in the corpus") for i in ids],
            "doc_id long, text string")

    src = tmp_path / "in"
    src.mkdir()
    docs(range(20)).coalesce(1).write.parquet(str(src / "b0"))
    kw = dict(k=8, bands=4, hash_mode="xxhash64")
    index = SignatureIndex(SnapshotStore(str(tmp_path / "idx")), **kw)
    stream = spark.readStream.schema("doc_id long, text string") \
        .option("recursiveFileLookup", "true").parquet(str(src))
    pairs_dir, ckpt = str(tmp_path / "pairs"), str(tmp_path / "ckpt")

    q = start_dedup_ingest(stream, index, pairs_dir, ckpt)
    q.awaitTermination(120)
    docs(range(20, 40)).coalesce(1).write.parquet(str(src / "b1"))
    q2 = start_dedup_ingest(stream, index, pairs_dir, ckpt)
    q2.awaitTermination(120)

    assert index.committed_round() == 1  # one ingest round per micro-batch
    assert index.signatures(spark).count() == 40
    got = {(r["id_a"], r["id_b"])
           for r in spark.read.parquet(pairs_dir).collect()}
    full = {(r["id_a"], r["id_b"]) for r in lsh_candidate_pairs(
        index._signatures(docs(range(40))), bands=4).collect()}
    assert got == full


def test_streaming_ingest_replay_is_idempotent(spark, tmp_path):
    """foreachBatch is at-least-once: replaying an epoch must not append
    its documents to the index again (each duplicate id would pair with
    its own earlier copy); the latest epoch's pairs are re-derived from
    the committed snapshot delta instead."""
    from crawler_seo_spark.operators.incremental import SignatureIndex
    from crawler_seo_spark.streaming.ingest import make_ingest_batch
    from crawler_seo_spark.tables import SnapshotStore

    def docs(ids):
        return spark.createDataFrame(
            [(i, f"shared text body {i // 2} for near duplicate pairs")
             for i in ids], "doc_id long, text string")

    index = SignatureIndex(SnapshotStore(str(tmp_path / "idx")),
                           k=8, bands=4, hash_mode="xxhash64")
    pairs_dir = str(tmp_path / "pairs")
    fn = make_ingest_batch(index, pairs_dir)

    fn(docs(range(10)), 0)
    first = {(r["id_a"], r["id_b"]) for r in
             spark.read.parquet(f"{pairs_dir}/epoch=0").collect()}
    fn(docs(range(10)), 0)  # replayed epoch
    assert index.committed_round() == 0        # no second append
    assert index.signatures(spark).count() == 10
    again = {(r["id_a"], r["id_b"]) for r in
             spark.read.parquet(f"{pairs_dir}/epoch=0").collect()}
    assert again == first                      # pairs rewritten identically

    fn(docs(range(10, 20)), 1)                 # next epoch proceeds
    assert index.committed_round() == 1
    assert index.signatures(spark).count() == 20


def test_streaming_ingest_generic_over_simhash_index(spark, tmp_path):
    """make_ingest_batch is family-generic: SimHashIndex drives the same
    foreachBatch path (epoch idempotency keys off the shared commit
    counters, replay_pairs off the shared snapshot-delta logic)."""
    from crawler_seo_spark.operators.incremental import SimHashIndex
    from crawler_seo_spark.streaming.ingest import make_ingest_batch
    from crawler_seo_spark.tables import SnapshotStore

    def docs(ids):
        return spark.createDataFrame(
            [(i, f"group {i // 2} alpha beta gamma delta epsilon")
             for i in ids], "doc_id long, text string")

    idx = SimHashIndex(SnapshotStore(str(tmp_path / "shx")),
                       hash_mode="xxhash64", band_bits=4, max_hamming=6)
    fn = make_ingest_batch(idx, str(tmp_path / "pairs"))
    fn(docs(range(10)), 0)
    fn(docs(range(10)), 0)   # replay: no double append
    fn(docs(range(10, 20)), 1)
    assert idx.committed_round() == 1
    assert idx.signatures(spark).count() == 20
    got = {(r["id_a"], r["id_b"]) for r in
           spark.read.parquet(str(tmp_path / "pairs")).collect()}
    # planted exact-dup pairs present (cross-group pairs may also pass
    # the hamming cut — the texts share most tokens by construction)
    assert (0, 1) in got and (10, 11) in got

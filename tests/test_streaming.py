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

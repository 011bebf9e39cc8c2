"""Streaming document ingest with incremental dedup.

The 100 TB pipeline shape: documents arrive as a stream (crawler output,
landing-zone files), and every micro-batch must be deduplicated against
EVERYTHING ingested before it — not recomputed over the whole corpus.
:func:`start_dedup_ingest` wires
:class:`~crawler_seo_spark.operators.incremental.SignatureIndex` into
Structured Streaming via ``foreachBatch``:

* each micro-batch computes signatures for ITS rows only and emits LSH
  candidate pairs of batch-vs-(index ∪ batch) (one banded equi-join; the
  index streams from its fast-append parquet snapshots, the batch side is
  broadcast);
* the pairs land in a parquet sink directory per epoch; the signature
  index itself is the durable state — Structured Streaming's own
  checkpoint handles source offsets, the provider's commit markers handle
  index atomicity, so a restarted query resumes without recomputing old
  batches' signatures.

``foreachBatch`` is the sanctioned escape hatch for stateful sinks the
built-in operators can't express (a MERGE-maintained index); the batch
function body is ordinary DataFrame code, so everything stays
JVM/Arrow-vectorized.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame

from ..operators.incremental import SignatureIndex


def make_ingest_batch(index: SignatureIndex, pairs_dir: str):
    """The ``foreachBatch`` function: ingest the micro-batch and write
    its pairs to ``{pairs_dir}/epoch=N/``, IDEMPOTENTLY under
    at-least-once replay. The ingested epoch rides the index commit
    (``extra_counters``): a replayed epoch ≤ the committed one must not
    append its documents a second time (each duplicate id would pair
    with its own earlier copy forever) — instead the latest epoch's
    pairs are re-derived from the committed snapshot delta and
    re-written (covering a crash between index commit and pairs write),
    and older epochs are no-ops."""

    def ingest_batch(batch_df: DataFrame, epoch_id: int) -> None:
        if batch_df.isEmpty():
            return
        spark = batch_df.sparkSession
        out = os.path.join(pairs_dir, f"epoch={epoch_id}")
        m = index.store.manifest()
        last = None if m is None else m["counters"].get("epoch")
        if last is not None and epoch_id <= last:
            if epoch_id == last:
                index.replay_pairs(spark, m["round"]) \
                    .write.mode("overwrite").parquet(out)
            return
        pairs = index.ingest(spark, batch_df,
                             extra_counters={"epoch": epoch_id})
        pairs.write.mode("overwrite").parquet(out)

    return ingest_batch


def start_dedup_ingest(docs_stream: DataFrame, index: SignatureIndex,
                       pairs_dir: str, checkpoint_dir: str,
                       trigger_available_now: bool = True):
    """Start the streaming dedup-ingest query; returns the StreamingQuery.

    ``docs_stream`` must be a streaming DataFrame with the index's
    ``(id_col, text_col)`` columns (any
    :class:`~crawler_seo_spark.operators.incremental._IncrementalIndex`
    family works — MinHash or SimHash). Pairs for each micro-batch are
    written to ``{pairs_dir}/epoch=N/``. With ``trigger_available_now``
    the query drains the currently available input and stops — the
    deterministic test/backfill pattern; pass False for a continuous
    micro-batch trigger."""
    writer = (docs_stream.writeStream
              .foreachBatch(make_ingest_batch(index, pairs_dir))
              .option("checkpointLocation", checkpoint_dir))
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()

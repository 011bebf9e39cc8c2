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


def start_dedup_ingest(docs_stream: DataFrame, index: SignatureIndex,
                       pairs_dir: str, checkpoint_dir: str,
                       trigger_available_now: bool = True):
    """Start the streaming dedup-ingest query; returns the StreamingQuery.

    ``docs_stream`` must be a streaming DataFrame with the index's
    ``(id_col, text_col)`` columns. Pairs for each micro-batch are written
    to ``{pairs_dir}/epoch=N/``. With ``trigger_available_now`` the query
    drains the currently available input and stops — the deterministic
    test/backfill pattern; pass False for a continuous micro-batch
    trigger."""
    spark = docs_stream.sparkSession

    def ingest_batch(batch_df: DataFrame, epoch_id: int) -> None:
        if batch_df.isEmpty():
            return
        pairs = index.ingest(spark, batch_df)
        pairs.write.mode("overwrite").parquet(
            os.path.join(pairs_dir, f"epoch={epoch_id}"))

    writer = (docs_stream.writeStream
              .foreachBatch(ingest_batch)
              .option("checkpointLocation", checkpoint_dir))
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()

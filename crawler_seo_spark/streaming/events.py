"""Structured Streaming operators over the ``events`` table.

The reference engine is an iterative batch loop, not a stream (SURVEY §2.7)
— the crawl engine therefore stays batch-per-round. These operators cover
the *streaming-analytics* surface a production deployment bolts onto the
same tables: windowed aggregation with watermarked late-data handling,
session windows, and a custom stateful operator via
``applyInPandasWithState``.

Every operator is defined once over a DataFrame and works identically for
``spark.read`` (batch backfill) and ``spark.readStream`` (live) inputs —
the Structured Streaming unification. Tests drive the streaming path with a
file source + ``availableNow`` trigger + memory sink, which is the public
pattern for deterministic stream testing.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

EVENTS_SCHEMA = ("event_id long, ts timestamp, user_id long, "
                 "event_type string, value double, props string")


def windowed_counts(events: DataFrame, window: str = "5 minutes",
                    slide: str | None = None,
                    watermark: str = "10 minutes") -> DataFrame:
    """Tumbling/sliding window counts + sums per event_type.

    The watermark bounds state: events later than ``watermark`` behind the
    max seen ``ts`` are dropped (streaming mode) — batch mode ignores it.
    """
    src = events
    if events.isStreaming:
        src = events.withWatermark("ts", watermark)
    win = F.window("ts", window, slide) if slide else F.window("ts", window)
    return (src.groupBy(win.alias("w"), "event_type")
            .agg(F.count("*").alias("n"),
                 F.round(F.sum("value"), 6).alias("total_value"))
            .select(F.col("w.start").alias("window_start"),
                    F.col("w.end").alias("window_end"),
                    "event_type", "n", "total_value"))


def sessionize(events: DataFrame, gap: str = "30 minutes") -> DataFrame:
    """Per-user session windows (``session_window`` — state TTL'd by the
    gap). Batch mode: works as a regular aggregation."""
    src = events.withWatermark("ts", gap) if events.isStreaming else events
    return (src.groupBy(F.session_window("ts", gap).alias("s"), "user_id")
            .agg(F.count("*").alias("n_events"),
                 F.round(F.sum("value"), 6).alias("session_value"))
            .select("user_id",
                    F.col("s.start").alias("session_start"),
                    F.col("s.end").alias("session_end"),
                    "n_events", "session_value"))


def sessionize_batch_window(events: DataFrame,
                            gap_minutes: int = 30) -> DataFrame:
    """Batch sessionization via lag + cumulative gap-count — the classic
    window-function formulation (equivalent results to :func:`sessionize`
    for closed sessions; used as its batch oracle in tests)."""
    from pyspark.sql import Window
    w = Window.partitionBy("user_id").orderBy("ts")
    gap_s = gap_minutes * 60
    # ts may arrive as TIMESTAMP_NTZ from parquet — normalize before epoch
    epoch = F.col("ts").cast("timestamp").cast("long")
    new_session = (
        F.when(epoch - F.lag(epoch).over(w) > gap_s, 1)
        .otherwise(0))
    sess = (events
            .withColumn("_new", new_session)
            .withColumn("session_no",
                        F.sum("_new").over(
                            w.rowsBetween(Window.unboundedPreceding, 0))))
    return (sess.groupBy("user_id", "session_no")
            .agg(F.count("*").alias("n_events"),
                 F.round(F.sum("value"), 6).alias("session_value"),
                 F.min("ts").alias("session_start"),
                 F.max("ts").alias("session_end"))
            .drop("session_no"))


def run_stream_to_memory(spark, parquet_dir: str, transform,
                         query_name: str = "stream_out") -> DataFrame:
    """Drive a file-source stream to completion synchronously:
    readStream(parquet) → transform → memory sink → availableNow."""
    src = (spark.readStream.schema(EVENTS_SCHEMA)
           .parquet(parquet_dir))
    out = transform(src)
    q = (out.writeStream.outputMode("append" if out.isStreaming else "complete")
         .format("memory").queryName(query_name)
         .trigger(availableNow=True).start())
    q.awaitTermination()
    return spark.sql(f"SELECT * FROM {query_name}")


def counters_stream(spark, parquet_dir: str,
                    query_name: str = "counters") -> DataFrame:
    """Custom stateful operator: running per-type counters via
    ``applyInPandasWithState`` (the escape hatch for operators Spark's
    built-ins can't express)."""
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState

    def count_state(key, pdf_iter, state: GroupState):
        (etype,) = key
        total = state.get[0] if state.exists else 0
        for pdf in pdf_iter:
            total += len(pdf)
        state.update((total,))
        yield pd.DataFrame({"event_type": [etype], "running_count": [total]})

    src = (spark.readStream.schema(EVENTS_SCHEMA).parquet(parquet_dir))
    out = (src.groupBy("event_type")
           .applyInPandasWithState(
               count_state,
               outputStructType="event_type string, running_count long",
               stateStructType="running_count long",
               outputMode="update",
               timeoutConf="NoTimeout"))
    q = (out.writeStream.outputMode("update").format("memory")
         .queryName(query_name).trigger(availableNow=True).start())
    q.awaitTermination()
    return spark.sql(f"SELECT * FROM {query_name}")

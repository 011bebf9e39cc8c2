"""Per-host politeness pacing and hot-host salting.

The reference enforces politeness by sleeping between requests inside one
session object (``core/session_manager.py:120-138``: min interval =
``1/requests_per_second``). Distributed, that becomes: group the fetch batch
by host, and within each host group assign monotonically increasing
*scheduled offsets* at the rate budget. Groups pace independently — one hot
host never serializes the round, it only lengthens its own group's schedule.

Two pieces:

* :func:`schedule_fetches` — ``groupBy(host).applyInPandas`` assigning each
  row its politeness slot (``fetch_slot`` index within host and
  ``scheduled_offset_ms``). In this sandbox the synthetic fetch does not
  sleep; the schedule is recorded so tests can assert the rate budget is
  respected (max slot density ≤ rps) and a live fetcher would honor it.
* :func:`salted_repartition` — spread rows of hot hosts over
  ``salt_buckets`` partitions (kills hot-domain skew in the *parse/analyze*
  stage, which has no per-host ordering constraint; the *pacing* stage is
  inherently per-host-sequential, which is exactly why pacing and parsing
  are separate stages here).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.urlnorm import host_col


def with_host(df: DataFrame, url_col: str = "url") -> DataFrame:
    return df.withColumn("host", host_col(F.col(url_col)))


def schedule_fetches(batch: DataFrame, requests_per_second: float,
                     url_col: str = "url",
                     host_delays: DataFrame | None = None) -> DataFrame:
    """Assign per-host politeness slots to a dequeued batch.

    Slot order within a host follows the batch's dequeue order
    (``crawl_seq``), so the schedule is deterministic.

    ``host_delays`` — optional ``(host, crawl_delay_s)`` table (robots.txt
    ``Crawl-delay``, the de-facto per-host rate directive major crawlers
    honor): a host's interval becomes ``max(1/rps, crawl_delay_s)`` —
    Crawl-delay can only slow a host down, never beat the global budget.
    Broadcast-joined (hosts are always the small side).

    Pure window computation (JVM): ``row_number() OVER (PARTITION BY host
    ORDER BY crawl_seq)``. An earlier ``applyInPandas`` formulation computed
    the same thing ~20× slower at high core counts — the grouped-map Arrow
    exchange pays per-task Python-worker costs that a window never does.
    Keep Python for *acting* on the schedule (the live fetcher's sleeps,
    sources/fetch.py), never for *computing* it.
    """
    from pyspark.sql import Window
    interval_ms = 1000.0 / max(requests_per_second, 1e-9)
    df = with_host(batch, url_col)
    interval = F.lit(interval_ms)
    if host_delays is not None:
        df = df.join(F.broadcast(host_delays.select(
            "host", F.col("crawl_delay_s").cast("double")
            .alias("_cds"))), "host", "left")
        interval = F.greatest(interval,
                              F.coalesce(F.col("_cds") * 1000.0,
                                         F.lit(0.0)))
    w = Window.partitionBy("host").orderBy("crawl_seq")
    out = (df
           .withColumn("fetch_slot",
                       (F.row_number().over(w) - 1).cast("long"))
           .withColumn("scheduled_offset_ms",
                       F.col("fetch_slot") * interval))
    return out.drop("_cds") if host_delays is not None else out


def salted_repartition(df: DataFrame, salt_buckets: int,
                       hot_threshold: int | None = None,
                       url_col: str = "url",
                       num_partitions: int | None = None) -> DataFrame:
    """Repartition by ``(host, salt)`` where salt spreads hot hosts.

    When ``hot_threshold`` is given, only hosts with more rows than the
    threshold get salted (others keep salt 0 → co-located); without it every
    host fans out over ``salt_buckets``. The hot-host count uses a window
    aggregation (one shuffle) — at production scale you'd maintain host
    statistics across rounds instead of recounting.

    The partition COUNT is always pinned explicitly. ``repartition(cols)``
    without a count is REPARTITION_BY_COL, which AQE may coalesce by
    shuffle SIZE — a batch of URLs is a few MB, so AQE folded it into 1-2
    partitions and the heavy per-URL fetch/parse work DOWNSTREAM of the
    exchange ran nearly serially (measured 38 s vs 7 s for an 80k-URL
    round at 8 cores; this was the single largest cause of round 1's 0.27
    crawl-scaling efficiency). Pinning the count (REPARTITION_BY_NUM)
    keeps the fan-out at the intended parallelism.
    """
    if "host" not in df.columns:
        df = with_host(df, url_col)
    n = num_partitions or df.sparkSession.sparkContext.defaultParallelism
    salt = F.pmod(F.xxhash64(F.col(url_col)), F.lit(salt_buckets)).cast("int")
    if hot_threshold is not None:
        from pyspark.sql import Window
        cnt = F.count("*").over(Window.partitionBy("host"))
        salt = F.when(cnt > hot_threshold, salt).otherwise(F.lit(0))
        return (df.withColumn("host_salt", salt)
                .repartition(n, F.col("host"), F.col("host_salt")))
    # Unconditional salting (the engine's default): the fetch/parse stage
    # has NO per-host ordering constraint (pacing offsets are assigned
    # globally before this), so spread by url hash — hashing a handful of
    # (host, salt) KEYS into n partitions is multinomially imbalanced
    # (measured ±40% task skew for 1 host × 32 salts → 8 partitions; the
    # stage ends at the slowest task), while the url hash has one distinct
    # value per row and spreads within ±1-2%.
    return (df.withColumn("host_salt", salt)
            .repartition(n, F.xxhash64(F.col(url_col), F.lit(7))))

"""Scale-adaptive input widening for per-row-heavy operators.

Motivation (r6 measurement, guide §2.5 "input skew"): the bench corpora
arrive as ONE small parquet file with a single row group, and Spark
assigns a row group to exactly one scan task — so every narrow chain
downstream of ``read.parquet`` (Arrow kernels, regex-heavy Catalyst
projections) ran on 1-2 of the 32 cores. ``d_repeated_spans_mod8_full``
at sf1.0 spent 8+ s essentially single-task.

:func:`widen_small_input` repartitions ONLY when the input's partition
count is well below the session's parallelism — derived from the live
session, never a constant — so on a real cluster where inputs arrive in
hundreds of file splits it is a plan-time no-op (no exchange added).
The round-robin exchange it adds on tiny inputs moves the rows once;
every operator below then runs at full width.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def widen_small_input(df: DataFrame, min_ratio: int = 2,
                      min_bytes: int = 1 << 20) -> DataFrame:
    """Repartition ``df`` to the session's default parallelism when its
    current partitioning would leave most cores idle.

    Two gates, both derived from the input rather than tuned constants
    (guide §2: partitioning derived from input size):

    * ``min_bytes`` — below ~1 MiB of estimated input (logical-plan
      statistics: file bytes for scans, no job) the round-robin
      exchange's fixed cost rivals the whole computation, so the plan
      is left alone; above it, single-task serialization of a row-group
      -bound file dominates and widening wins (measured: the same
      operator set gained geomean 0.32 on 5.9 MB inputs and lost
      0.1-0.3 s per query on 0.6 MB ones before this gate).
    * ``min_ratio`` — only widen when ``partitions * min_ratio <=
      target`` (2× headroom so an already-reasonable layout is never
      reshuffled; at real scale inputs arrive in hundreds of splits and
      this makes the helper a no-op).

    The partition-count probe (``df.rdd.getNumPartitions()``) is only
    safe on exchange-free plans: with AQE, converting a plan that
    contains exchanges/subqueries to an RDD materializes its query
    stages — real shuffle/broadcast jobs before the actual action. Such
    plans are left untouched (their own exchanges already redistribute
    work); the single-task pathology this helper fixes lives in narrow
    scan chains, which plan without an adaptive root and probe for free
    (file-split metadata only, no job).

    Round-robin repartition is retry-deterministic (Spark sorts before
    round-robin, SPARK-23207) and row order downstream of the operators
    using this helper is never semantically significant (their outputs
    are aggregates / joins / per-row columns).
    """
    try:
        spark = df.sparkSession
        target = spark.sparkContext.defaultParallelism
        qe = df._jdf.queryExecution()
        size = int(qe.optimizedPlan().stats().sizeInBytes())
        if size < min_bytes:
            return df
        if size > (1 << 50):
            # sentinel/unknown statistics (e.g. LogicalRDD reports
            # spark.sql.defaultSizeInBytes = Long.MaxValue): we cannot
            # tell a tiny checkpoint from a petabyte input — leave the
            # plan alone rather than widen blind (the measured
            # single-task pathology lives in FILE scans, whose stats
            # are real file bytes)
            return df
        if qe.executedPlan().getClass().getSimpleName() \
                == "AdaptiveSparkPlanExec":
            return df  # has exchanges — probing would run its stages
        n = df.rdd.getNumPartitions()
    except Exception:  # streaming frames / exotic plans: leave untouched
        return df
    if n * min_ratio <= target:
        return df.repartition(target)
    return df

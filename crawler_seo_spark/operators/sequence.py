"""Deterministic, shuffle-friendly global sequence assignment.

The crawl order and the frontier's ``discovery_seq`` are *total orders* —
the hardest thing to produce scalably on a cluster. The naive
``row_number() OVER (ORDER BY ...)`` plans as a single-partition window: one
reducer sees every row, which dies at 10^10 scale.

:func:`global_sequence` produces the identical numbering with no single
reducer: range-repartition on the sort key, sort within partitions, count
rows per partition, broadcast the per-partition offsets (tiny — one long per
partition), then number rows as ``offset[p] + local_index``. Two passes over
the data, both fully parallel. This is the standard distributed prefix-sum
construction (same shape Spark uses internally for ``zipWithIndex``).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def global_sequence(df: DataFrame, order_by: list[Column], out_col: str,
                    start: int = 0, num_partitions: int | None = None) -> DataFrame:
    """Add ``out_col`` = ``start + rank`` of each row in the total order
    defined by ``order_by`` (which must be a unique key of ``df``).

    Implementation: ``repartitionByRange`` + ``sortWithinPartitions`` keeps
    the global order across the partition sequence; ``zipWithIndex`` then
    numbers rows with per-partition offsets computed from a lightweight
    count pass — no global single-partition exchange.
    """
    n = num_partitions or df.sparkSession.sparkContext.defaultParallelism
    arranged = (
        df.repartitionByRange(n, *order_by)
          .sortWithinPartitions(*order_by)
    )
    schema = arranged.schema
    indexed = arranged.rdd.zipWithIndex().map(
        lambda pair: (*pair[0], pair[1]))
    out_schema = schema.add(out_col, "long", False)
    spark = df.sparkSession
    result = spark.createDataFrame(indexed, out_schema)
    if start:
        result = result.withColumn(out_col, F.col(out_col) + F.lit(start))
    return result


def global_sequence_small(df: DataFrame, order_by: list[Column], out_col: str,
                          start: int = 0) -> DataFrame:
    """Window-based variant for *small* inputs (a dequeued batch): a single
    round's batch fits one task comfortably; the window avoids an RDD
    round-trip. Use :func:`global_sequence` for unbounded inputs."""
    from pyspark.sql import Window
    w = Window.orderBy(*order_by)
    num = F.row_number().over(w) - 1 + F.lit(start)
    return df.withColumn(out_col, num.cast("long"))

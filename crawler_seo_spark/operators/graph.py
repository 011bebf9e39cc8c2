"""Link-graph analytics over crawl results — iterative DataFrame jobs.

PageRank in its standard damped formulation (public construction):

    rank(v) = (1-d)/N + d·( Σ_{u→v} rank(u)/deg(u) + dangling_mass/N )

Each iteration is one join + one aggregation, both keyed by node — the
iteration co-partitions on the node key so successive joins reuse the
layout. Lineage is cut per iteration (``localCheckpoint``) — the canonical
pattern for iterative algorithms on DataFrames, without which the plan
doubles every round.

``crawl_edges`` extracts the edge list from crawl results (url →
analysis.links), so page importance can feed recrawl priority.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def crawl_edges(results: DataFrame) -> DataFrame:
    """(src, dst) edges from crawled pages' extracted links."""
    return (results
            .filter(F.col("analysis").isNotNull())
            .select(F.col("url").alias("src"),
                    F.explode(F.coalesce(
                        F.col("analysis.links"),
                        F.array().cast("array<string>"))).alias("dst"))
            .distinct())


def pagerank(edges: DataFrame, n_iters: int = 10, d: float = 0.85,
             node_col_src: str = "src", node_col_dst: str = "dst",
             checkpoint_every: int = 1) -> DataFrame:
    """(node, rank) after ``n_iters`` damped iterations.

    Deterministic given the edge set (float summation order may differ
    across partitionings at ~1e-15 — round for cross-engine comparison).
    """
    spark = edges.sparkSession
    e = edges.select(F.col(node_col_src).alias("src"),
                     F.col(node_col_dst).alias("dst")).distinct() \
        .localCheckpoint(eager=True)
    nodes = (e.select(F.col("src").alias("node"))
             .unionByName(e.select(F.col("dst").alias("node")))
             .distinct().localCheckpoint(eager=True))
    n = nodes.count()
    deg = e.groupBy("src").agg(F.count("*").alias("deg"))

    ranks = nodes.withColumn("rank", F.lit(1.0 / n))
    for i in range(n_iters):
        with_deg = ranks.join(deg, ranks.node == deg.src, "left")
        dangling = (with_deg.filter(F.col("deg").isNull())
                    .agg(F.coalesce(F.sum("rank"), F.lit(0.0)))
                    .collect()[0][0])
        contribs = (with_deg.filter(F.col("deg").isNotNull())
                    .select("node", (F.col("rank") / F.col("deg"))
                            .alias("share"))
                    .join(e, F.col("node") == e.src)
                    .groupBy("dst").agg(F.sum("share").alias("contrib")))
        ranks = (nodes.join(contribs, nodes.node == contribs.dst, "left")
                 .select("node",
                         (F.lit((1.0 - d) / n)
                          + F.lit(d) * (F.coalesce(F.col("contrib"),
                                                   F.lit(0.0))
                                        + F.lit(dangling / n)))
                         .alias("rank")))
        if (i + 1) % checkpoint_every == 0:
            ranks = ranks.localCheckpoint(eager=True)
    return ranks

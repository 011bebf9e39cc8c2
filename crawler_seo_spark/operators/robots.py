"""robots.txt cache table and admission filter.

The reference has NO robots.txt support (its only "robots" notion is the
``<meta name="robots">`` tag, metatags_analyzer.py:171-173) — this is a new
capability required by the engine spec. To preserve reference crawl-order
parity the default policy is allow-all; supplying rules tightens admission.

Model: a small per-host rules table ``(host, disallow_prefixes)`` — the
classic prefix subset of the robots.txt standard, enough for scheduling
semantics. The table is broadcast-joined against candidates (hosts number
in the millions at most — always the small side of the join at web scale),
and the prefix test is an ``exists()`` over the prefix array, JVM-side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.urlnorm import host_col


def robots_table(spark: SparkSession,
                 rules: dict[str, list[str]] | None) -> DataFrame:
    """Build the rules table. ``rules`` maps host → disallow path-prefixes."""
    rows = [(h, ps) for h, ps in (rules or {}).items()]
    return spark.createDataFrame(
        rows, "host string, disallow_prefixes array<string>")


def filter_allowed(candidates: DataFrame, robots: DataFrame | None,
                   url_col: str = "url") -> DataFrame:
    """Drop candidates whose path matches a disallow prefix for their host.

    Unknown hosts (no rules row) are allowed — the allow-all default that
    keeps reference parity.
    """
    if robots is None:
        return candidates
    df = candidates.withColumn("_host", host_col(F.col(url_col)))
    path = F.coalesce(F.parse_url(F.col(url_col), F.lit("PATH")), F.lit("/"))
    joined = df.join(F.broadcast(robots),
                     df["_host"] == robots["host"], "left")
    blocked = F.exists(
        F.coalesce(F.col("disallow_prefixes"), F.array().cast("array<string>")),
        lambda p: path.startswith(p))
    return joined.filter(~blocked).drop("_host", "host", "disallow_prefixes")

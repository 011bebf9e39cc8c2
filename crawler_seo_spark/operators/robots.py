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


def parse_robots_txt(content: str, user_agent: str = "*") -> list[str]:
    """Extract Disallow path-prefixes for a user agent from robots.txt
    content (the standard prefix subset; public RFC 9309 semantics for the
    group-selection rule: the most specific matching agent group wins,
    falling back to ``*``).

    Returns the disallow-prefix list for :func:`robots_table`.
    """
    groups: dict[str, list[str]] = {}
    current_agents: list[str] = []
    last_was_agent = False
    for raw in (content or "").splitlines():
        line = raw.split("#", 1)[0].strip()
        if not line or ":" not in line:
            continue
        key, _, value = line.partition(":")
        key = key.strip().lower()
        value = value.strip()
        if key == "user-agent":
            if not last_was_agent:
                current_agents = []
            current_agents.append(value.lower())
            for a in current_agents:
                groups.setdefault(a, [])
            last_was_agent = True
        elif key == "disallow":
            last_was_agent = False
            if value:
                for a in current_agents:
                    groups.setdefault(a, []).append(value)
        else:
            last_was_agent = False

    ua = user_agent.lower()
    # longest-match agent token, then '*'
    candidates = [a for a in groups if a != "*" and a in ua]
    if candidates:
        return groups[max(candidates, key=len)]
    return groups.get("*", [])


def robots_table_from_texts(spark: SparkSession,
                            texts: dict[str, str],
                            user_agent: str = "*") -> DataFrame:
    """host → robots.txt content → rules table (the cache-table builder a
    live deployment feeds from fetched /robots.txt bodies)."""
    return robots_table(spark, {
        host: parse_robots_txt(body, user_agent)
        for host, body in texts.items()
    })

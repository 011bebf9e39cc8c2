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


RULES_TYPE = "array<struct<allow:boolean,prefix:string,rx:string>>"

# Hostile/typo'd robots.txt must not stall the crawl: 'Crawl-delay: inf'
# would sleep(inf) in the fetch kernel, '1e15' would hang an executor for
# years. Real crawlers clamp; 60 s is the common ceiling.
CRAWL_DELAY_CAP_S = 60.0


def compile_wildcard(pattern: str) -> str | None:
    """RFC 9309 ``*``/``$`` pattern → anchored Java regex, or None for a
    plain prefix (the fast startswith path). ``*`` matches any run of
    characters; a trailing ``$`` anchors the end; matching is always
    anchored at the path start."""
    if "*" not in pattern and not pattern.endswith("$"):
        return None
    import re as _re
    anchor_end = pattern.endswith("$")
    body = pattern[:-1] if anchor_end else pattern
    rx = "^" + ".*".join(_re.escape(seg) for seg in body.split("*"))
    return rx + "$" if anchor_end else rx


def robots_table(spark: SparkSession,
                 rules: dict[str, list[str]] | None) -> DataFrame:
    """Build the rules table. ``rules`` maps host → disallow path-prefixes."""
    rows = [(h, ps) for h, ps in (rules or {}).items()]
    return spark.createDataFrame(
        rows, "host string, disallow_prefixes array<string>")


def rule_structs(rules: list[tuple[bool, str]]) -> list[dict]:
    """(allow, pattern) tuples → rule structs with the regex precompiled
    (None for plain prefixes — those take the startswith fast path)."""
    return [{"allow": bool(a), "prefix": p, "rx": compile_wildcard(p)}
            for a, p in rules]


def robots_rules_table(spark: SparkSession,
                       rules: dict[str, list[tuple[bool, str]]] | None
                       ) -> DataFrame:
    """RFC 9309 rules table: host → ordered ``(allow, pattern)`` rules
    (patterns may use ``*``/``$`` wildcards)."""
    rows = [(h, rule_structs(rs)) for h, rs in (rules or {}).items()]
    return spark.createDataFrame(rows, f"host string, rules {RULES_TYPE}")


def filter_allowed(candidates: DataFrame, robots: DataFrame | None,
                   url_col: str = "url") -> DataFrame:
    """Drop candidates their host's robots rules disallow.

    Unknown hosts (no rules row) are allowed — the allow-all default that
    keeps reference parity. Two rule schemas are accepted:

    * ``(host, disallow_prefixes array<string>)`` — the classic
      disallow-prefix subset: blocked iff any prefix matches.
    * ``(host, rules array<struct<allow,prefix,rx>>)`` — RFC 9309 §2.2.2
      longest-match precedence: among the rules whose pattern matches the
      path, the LONGEST pattern wins; at equal length Allow wins; no
      match → allowed. Patterns may use ``*`` (any run) and a trailing
      ``$`` (end anchor): those carry a precompiled regex in ``rx`` and
      match via ``regexp_like``; plain prefixes keep the ``startswith``
      fast path (``rx`` null). Precedence length is the raw pattern
      length, wildcards included (the common-crawler convention).
    """
    if robots is None:
        return candidates
    df = candidates.withColumn("_host", host_col(F.col(url_col)))
    path = F.coalesce(F.parse_url(F.col(url_col), F.lit("PATH")), F.lit("/"))
    joined = df.join(F.broadcast(robots),
                     df["_host"] == robots["host"], "left")
    if "rules" in robots.columns:
        rules = F.coalesce(F.col("rules"), F.array().cast(RULES_TYPE))
        matches = F.filter(
            rules,
            lambda r: F.when(r["rx"].isNull(),
                             path.startswith(r["prefix"]))
            .otherwise(F.regexp_like(path, r["rx"])))
        # lexicographic struct max = longest prefix, Allow breaking ties
        best_allow = F.array_max(F.transform(
            matches,
            lambda r: F.struct(F.length(r["prefix"]).alias("l"),
                               r["allow"].cast("int").alias("a"))))["a"]
        blocked = (F.size(matches) > 0) & (best_allow == 0)
        return joined.filter(~blocked).drop("_host", "host", "rules")
    blocked = F.exists(
        F.coalesce(F.col("disallow_prefixes"), F.array().cast("array<string>")),
        lambda p: path.startswith(p))
    return joined.filter(~blocked).drop("_host", "host", "disallow_prefixes")


def _parse_groups(content: str) -> dict[str, dict]:
    """agent → {"rules": [(allow, pattern)], "crawl_delay": float|None}.

    Empty-value ``Disallow:`` / ``Allow:`` lines match nothing and are
    dropped — the RFC's "empty Disallow means the group disallows
    nothing" quirk. Rule order is preserved (precedence is by prefix
    length at match time, not file order). ``Crawl-delay`` is the
    de-facto extension major crawlers honor (not in RFC 9309 proper)."""
    groups: dict[str, dict] = {}
    current_agents: list[str] = []
    last_was_agent = False

    def grp(a):
        return groups.setdefault(a, {"rules": [], "crawl_delay": None})

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
                grp(a)
            last_was_agent = True
        elif key in ("disallow", "allow"):
            last_was_agent = False
            if value:
                for a in current_agents:
                    grp(a)["rules"].append((key == "allow", value))
        elif key == "crawl-delay":
            last_was_agent = False
            try:
                delay = float(value)
            except ValueError:
                continue
            if not (delay == delay and 0 <= delay):  # NaN / negative
                continue
            delay = min(delay, CRAWL_DELAY_CAP_S)
            for a in current_agents:
                grp(a)["crawl_delay"] = delay
        else:
            last_was_agent = False
    return groups


def _select_group(groups: dict[str, dict], user_agent: str) -> dict:
    ua = user_agent.lower()
    # longest-match agent token, then '*'
    candidates = [a for a in groups if a != "*" and a in ua]
    if candidates:
        return groups[max(candidates, key=len)]
    return groups.get("*", {"rules": [], "crawl_delay": None})


def parse_robots_rules(content: str,
                       user_agent: str = "*") -> list[tuple[bool, str]]:
    """The ``(allow, pattern)`` rule list for a user agent (RFC 9309
    group selection: most specific matching agent group, then ``*``)."""
    return _select_group(_parse_groups(content), user_agent)["rules"]


def parse_crawl_delay(content: str,
                      user_agent: str = "*") -> float | None:
    """The selected group's ``Crawl-delay`` seconds, or None."""
    return _select_group(_parse_groups(content), user_agent)["crawl_delay"]


def parse_robots_txt(content: str, user_agent: str = "*") -> list[str]:
    """Disallow-prefix subset of :func:`parse_robots_rules` — feeds the
    classic ``(host, disallow_prefixes)`` table shape."""
    return [p for allow, p in parse_robots_rules(content, user_agent)
            if not allow]


def robots_table_from_texts(spark: SparkSession,
                            texts: dict[str, str],
                            user_agent: str = "*") -> DataFrame:
    """host → robots.txt content → rules table (the cache-table builder a
    live deployment feeds from fetched /robots.txt bodies)."""
    return robots_table(spark, {
        host: parse_robots_txt(body, user_agent)
        for host, body in texts.items()
    })

"""Sitemap ingestion: seed-URL discovery from sitemap.xml / sitemap
indexes and robots.txt ``Sitemap:`` directives.

A production crawl seeds its frontier from the origin's published
sitemaps rather than a hand-written seed list. This module keeps the
fetching on the EXECUTORS (the same injected fetcher contract as the
live engine — one ``mapInPandas`` over the sitemap URLs, bodies parsed
worker-side with the stdlib XML parser) and returns plain DataFrames the
caller feeds into ``CrawlConfig.seed_urls`` or joins against the
frontier. Sitemap indexes are followed ``max_index_depth`` levels;
sitemaps still pending when the depth budget runs out are LOGGED (never
silently dropped).
"""

from __future__ import annotations

import logging
import xml.etree.ElementTree as ET

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_NS = "{http://www.sitemaps.org/schemas/sitemap/0.9}"


def parse_sitemap(xml_text: str) -> tuple[list[str], list[str]]:
    """(page_urls, child_sitemap_urls) from one sitemap document.

    ``<urlset>`` yields page urls; ``<sitemapindex>`` yields child
    sitemaps. Namespaced and namespace-less documents both parse
    (real-world sitemaps are sloppy); malformed XML yields ([], [])."""
    text = xml_text or ""
    if "<!DOCTYPE" in text or "<!ENTITY" in text:
        # untrusted remote XML: refuse DTD/entity declarations outright
        # (billion-laughs / quadratic entity expansion would blow up the
        # executor before ParseError ever fires). Scan the WHOLE document,
        # not a fixed-size head — a hostile prolog can push the DOCTYPE
        # arbitrarily deep with comments/whitespace. No legitimate sitemap
        # contains these byte sequences anywhere (a literal '<' inside
        # element text must be escaped '&lt;'), so a full scan has no
        # false refusals in practice and stays O(n).
        return [], []
    try:
        root = ET.fromstring(xml_text or "")
    except ET.ParseError:
        return [], []

    def locs(parent_tag: str) -> list[str]:
        out = []
        for ns in (_NS, ""):
            for el in root.iter(f"{ns}{parent_tag}"):
                loc = el.find(f"{ns}loc")
                if loc is not None and loc.text and loc.text.strip():
                    out.append(loc.text.strip())
        return out

    tag = root.tag.split("}")[-1]
    if tag == "sitemapindex":
        return [], locs("sitemap")
    return locs("url"), []


def sitemap_urls_from_robots(content: str) -> list[str]:
    """``Sitemap:`` directives from robots.txt content — they live outside
    agent groups (RFC 9309 §2.3 treats them as independent lines)."""
    out = []
    for raw in (content or "").splitlines():
        line = raw.split("#", 1)[0].strip()
        if ":" not in line:
            continue
        key, _, value = line.partition(":")
        if key.strip().lower() == "sitemap" and value.strip():
            out.append(value.strip())
    return out


def fetch_sitemap_urls(sitemap_locs: DataFrame, fetch_fn_factory,
                       max_index_depth: int = 1) -> DataFrame:
    """(seed_url, sitemap_url) rows for every page url listed by the given
    sitemap locations (column ``sitemap_url``), fetched on the executors.

    Index sitemaps are followed ``max_index_depth`` levels: each level is
    one distributed fetch pass over the (tiny) frontier of sitemap urls —
    page-url payloads never route through the driver."""
    spark = sitemap_locs.sparkSession

    def kernel(batches):
        import pandas as pd
        fetch = fetch_fn_factory()
        for pdf in batches:
            rows = []
            for sm in pdf["sitemap_url"]:
                try:
                    r = fetch(sm)
                    body = r["html"] if r["status_code"] == 200 else ""
                except Exception:
                    body = ""
                pages, children = parse_sitemap(body)
                rows.extend({"sitemap_url": sm, "url": u, "is_sitemap": False}
                            for u in pages)
                rows.extend({"sitemap_url": sm, "url": u, "is_sitemap": True}
                            for u in children)
            yield pd.DataFrame(rows, columns=["sitemap_url", "url",
                                              "is_sitemap"])

    schema = "sitemap_url string, url string, is_sitemap boolean"
    frontier = sitemap_locs.select("sitemap_url").distinct() \
        .localCheckpoint(eager=True)
    # visited accumulates every sitemap url already fetched at ANY level:
    # a child listed again deeper (or an A↔B index cycle) must not be
    # refetched — without this, a cycle refetches the pair every level,
    # always exhausts max_index_depth, and emits a spurious MISSING
    # warning even though every reachable page was collected
    visited = frontier
    pages = None
    for _ in range(max_index_depth + 1):
        fetched = frontier.mapInPandas(kernel, schema) \
            .localCheckpoint(eager=True)
        level_pages = (fetched.filter("NOT is_sitemap")
                       .select(F.col("url").alias("seed_url"),
                               "sitemap_url"))
        pages = level_pages if pages is None \
            else pages.unionByName(level_pages)
        frontier = (fetched.filter("is_sitemap")
                    .select(F.col("url").alias("sitemap_url")).distinct()
                    .join(visited, "sitemap_url", "left_anti")
                    .localCheckpoint(eager=True))
        if frontier.isEmpty():
            frontier = None
            break
        visited = visited.unionByName(frontier)
    if frontier is not None:
        n_pending = frontier.count()
        if n_pending:
            logging.getLogger(__name__).warning(
                "sitemap index nesting exceeds max_index_depth=%d: "
                "%d sitemap(s) not fetched — their page urls are MISSING "
                "from the result; raise max_index_depth",
                max_index_depth, n_pending)
    return pages.distinct()

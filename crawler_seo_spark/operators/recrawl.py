"""Content-hash recrawl cache — the reference's per-URL change-detection
artifact as a table operator.

The reference ships ``cache/<domain>_cache.json`` artifacts with shape
``{url → {hash: md5-of-content, last_checked: iso-ts}}`` (SURVEY §1.4) —
a recrawl cache: fetch again, compare content hashes, only reprocess what
changed. Distributed form:

* :func:`content_cache` — results → ``(url, content_md5, checked_seq)``
  (the new cache snapshot; ``checked_seq`` = crawl_seq for determinism —
  wall-clock timestamps would break resume/replay).
* :func:`detect_changes` — old cache ⊗ new cache full-outer join →
  NEW / CHANGED / UNCHANGED / GONE per URL. One shuffle keyed by url.
* :func:`recrawl_frontier` — changed+new URLs as a frontier seed list,
  changed first (the recrawl scheduling policy).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

CACHE_SCHEMA = "url string, content_md5 string, checked_seq long"


def content_cache(results: DataFrame) -> DataFrame:
    """New cache snapshot from crawl results (requires the engine's
    ``content_md5`` column; only 200-responses carry meaningful content)."""
    return (results
            .filter(F.col("status_code") == 200)
            .select("url", "content_md5",
                    F.col("crawl_seq").alias("checked_seq")))


def detect_changes(old_cache: DataFrame, new_cache: DataFrame) -> DataFrame:
    """Classify every URL across two cache snapshots."""
    o = old_cache.select(F.col("url"),
                         F.col("content_md5").alias("old_md5"),
                         F.col("checked_seq").alias("old_seq"))
    n = new_cache.select(F.col("url"),
                         F.col("content_md5").alias("new_md5"),
                         F.col("checked_seq").alias("new_seq"))
    joined = o.join(n, "url", "full_outer")
    status = (
        F.when(F.col("old_md5").isNull(), "NEW")
        .when(F.col("new_md5").isNull(), "GONE")
        .when(F.col("old_md5") != F.col("new_md5"), "CHANGED")
        .otherwise("UNCHANGED"))
    return joined.select("url", "old_md5", "new_md5",
                         status.alias("change_status"))


def recrawl_frontier(changes: DataFrame) -> DataFrame:
    """URLs worth refetching, changed content first (stable url tiebreak)."""
    return (changes
            .filter(F.col("change_status").isin("CHANGED", "NEW"))
            .select("url", "change_status",
                    F.when(F.col("change_status") == "CHANGED", 1)
                    .otherwise(0).alias("priority"))
            .orderBy(F.desc("priority"), "url"))


def invalidate_seen(cuckoo, changes: DataFrame) -> int:
    """Recrawl ∘ seen-filter integration: delete CHANGED/GONE urls from the
    deletable seen filter (operators/cuckoo.ShardedCuckoo) so the next crawl
    admits them again — the capability the Bloom filter cannot provide
    (it never forgets). Returns how many fingerprints were removed.

    Satisfies ``delete_urls``'s inserted-only precondition by construction:
    CHANGED and GONE both require ``old_md5`` non-null (detect_changes), so
    every deleted url was in the previous crawl's cache — i.e. previously
    registered in the seen filter. Never feed this function urls from any
    other source."""
    stale = changes.filter(
        F.col("change_status").isin("CHANGED", "GONE")).select("url")
    return cuckoo.delete_urls(stale)

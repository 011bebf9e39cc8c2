"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship pipeline: derive a crawlable site from
``/root/testdata/sf0.001/documents.parquet``, run the distributed BFS crawl
engine (priority frontier, Bloom-pruned seen-set dedup, per-host politeness,
Arrow-batched analysis), and return the enriched wide analysis table.

``queries()`` / ``oracle_sql()`` expose one entry per implemented operator
from SURVEY.md §2 plus the training-data operators; see
``crawler_seo_spark/plans/driver_queries.py`` for the inventory and the
cross-engine parity rules.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: crawl a documents-derived site at sf0.001 and return the
    canonical wide analysis table (driver checks rows > 0, stable schema)."""
    from crawler_seo_spark.config import CrawlConfig
    from crawler_seo_spark.engine import CrawlEngine
    from crawler_seo_spark.plans.enrich import enrich_results
    from crawler_seo_spark.sources.from_documents import (
        SEED_URL,
        pages_df_from_documents,
    )

    sf_dir = "/root/testdata/sf0.001"
    pages = pages_df_from_documents(spark, sf_dir, limit=200)
    cfg = CrawlConfig(seed_url=SEED_URL, max_urls=100, batch_size=25)
    state = CrawlEngine(spark, pages, cfg).run()
    wide = enrich_results(state.results)
    # drop nested arrays for a compact, stable driver-facing schema
    return wide.drop("headings_problematicos", "problemas_hierarquia",
                     "mixed_content_resources", "images")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from crawler_seo_spark.plans.driver_queries import QUERIES
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    from crawler_seo_spark.plans.driver_queries import ORACLE
    return dict(ORACLE)

"""Library API: one call = crawl + analyze + report.

Mirrors the reference's programmatic surface (``quick_analysis``
main.py:570-607 and the engine API ``SEOCrawler.crawl`` crawler.py:61-93),
Spark-first: inputs and outputs are DataFrames.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .config import CrawlConfig
from .engine import CrawlEngine, CrawlState
from .plans.enrich import enrich_results


def validate_config(cfg: CrawlConfig) -> None:
    """Argument validation (reference: main.py:313-332)."""
    from urllib.parse import urlparse
    p = urlparse(cfg.seed_url)
    if p.scheme not in ("http", "https") or not p.netloc:
        raise ValueError(f"invalid seed URL: {cfg.seed_url!r}")
    if cfg.max_urls < 1:
        raise ValueError("max_urls must be >= 1")
    if not 1 <= cfg.max_depth <= 50:
        raise ValueError("max_depth must be in [1, 50]")
    if cfg.batch_size < 1:
        raise ValueError("batch_size must be >= 1")
    if cfg.requests_per_second <= 0:
        raise ValueError("requests_per_second must be > 0")


def apply_quick_mode(cfg: CrawlConfig) -> CrawlConfig:
    """Quick-mode caps (reference: main.py:335-341 — 100 URLs, depth 3)."""
    cfg.max_urls = min(cfg.max_urls, 100)
    cfg.max_depth = min(cfg.max_depth, 3)
    cfg.batch_size = min(cfg.batch_size, 5)
    return cfg


def crawl_stats(state: CrawlState) -> dict:
    """Run summary (reference: crawler.py:229-263, url_manager.py:301-318,
    session_manager.py:85-96) — one aggregation pass + the round counters."""
    agg = state.results.agg(
        F.count("*").alias("n"),
        F.sum(F.when(F.col("status_code") == 200, 1).otherwise(0))
        .alias("ok"),
        F.avg(F.when(F.col("status_code") == 200,
                     F.col("response_time_ms"))).alias("avg_rt"),
    ).collect()[0]
    breakdown = {r["reason"]: r["n"] for r in
                 state.filtered.groupBy("reason")
                 .agg(F.count("*").alias("n")).collect()}
    total_ms = sum(r["wall_ms"] for r in state.rounds)
    n = agg["n"]
    return {
        "urls_processed": n,
        "urls_successful": agg["ok"],
        "urls_failed": n - agg["ok"],
        "success_rate": round(agg["ok"] / max(n, 1) * 100, 2),
        "average_response_time_ms": round(agg["avg_rt"] or 0.0, 2),
        "urls_found": state.rounds[-1]["seen_total"] if state.rounds else 0,
        "urls_filtered": state.filtered.count(),
        "filter_breakdown": breakdown,
        "frontier_remaining": state.rounds[-1]["frontier_after"]
        if state.rounds else 0,
        "rounds": len(state.rounds),
        "total_wall_ms": round(total_ms, 1),
        "urls_per_second": round(n / max(total_ms / 1000.0, 1e-9), 2),
    }


def quick_analysis(spark: SparkSession, pages: DataFrame | None,
                   seed_url: str,
                   max_urls: int = 100,
                   analyzers: list[Callable[[DataFrame], DataFrame]]
                   | None = None,
                   quick: bool = True,
                   report_dir: str | None = None,
                   max_depth: int = 10,
                   batch_size: int | None = None,
                   smart: bool = True
                   ) -> tuple[DataFrame, CrawlState, dict]:
    """Crawl + analyze + (optionally) write the report tabs.

    ``pages=None`` puts the engine in live-HTTP mode (rate-limited
    ``mapInPandas`` fetcher). Returns (wide analysis DataFrame, raw
    CrawlState, stats dict) — the Spark shape of the reference's
    ``(filepath, df, stats)``.
    """
    kwargs: dict = dict(seed_url=seed_url, max_urls=max_urls,
                        max_depth=max_depth, smart=smart)
    if batch_size is not None:
        kwargs["batch_size"] = batch_size
    cfg = CrawlConfig(**kwargs)
    if quick:
        cfg = apply_quick_mode(cfg)
    validate_config(cfg)
    state = CrawlEngine(spark, pages, cfg, analyzers=analyzers).run()
    wide = enrich_results(state.results)
    if report_dir:
        from .plans.reports import write_report
        write_report(wide, report_dir)
    return wide, state, crawl_stats(state)

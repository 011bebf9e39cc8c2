"""CLI entry point — ``python -m crawler_seo_spark``.

Mirrors the reference's argparse surface (main.py:231-341: --url,
--max-urls, --max-depth, --threads, --crawler, --output, --filename,
--quick) on top of the Spark engine. The page source is explicit, because
this engine separates "where pages come from" from "how they're crawled":

* ``--pages-parquet DIR``   a page-store parquet (production shape);
* ``--from-documents DIR``  a deterministic site derived from the testdata
  ``documents`` table (the driver's crawl input);
* ``--synthetic N``         the built-in N-page synthetic site;
* with none of those, URLs are fetched live over HTTP through the
  rate-limited ``mapInPandas`` fetcher (requires network; ``pages=None``
  puts the engine in live mode).

Validation and quick-mode caps are the library's (api.py:20-41), which
reproduce the reference's rules (invalid URL → exit 1, quick = 100 URLs /
depth 3 / batch 5 — main.py:313-341).
"""

from __future__ import annotations

import argparse
import json
import sys

DEFAULT_URL = "https://shop.example.test/"


def parse_arguments(argv: list[str] | None = None) -> argparse.Namespace:
    """Argparse surface (reference: main.py:231-310)."""
    p = argparse.ArgumentParser(
        prog="crawler_seo_spark",
        description="SEO crawl + analysis engine (PySpark)")
    p.add_argument("--url", default=DEFAULT_URL,
                   help="seed URL (reference --url)")
    p.add_argument("--max-urls", type=int, default=150,
                   help="max URLs to crawl (reference --max-urls)")
    p.add_argument("--max-depth", type=int, default=10,
                   help="max crawl depth (reference --max-depth)")
    p.add_argument("--threads", type=int, default=10, dest="threads",
                   help="per-round batch size (reference --threads)")
    p.add_argument("--crawler", choices=["default", "smart", "batch"],
                   default="smart",
                   help="crawler flavor: smart = priority frontier "
                        "(reference --crawler)")
    p.add_argument("--output", default="output",
                   help="report output directory (reference --output)")
    p.add_argument("--filename", default="SEO_ANALYSIS_COMPLETE",
                   help="report name prefix (reference --filename)")
    p.add_argument("--quick", action="store_true",
                   help="quick mode: 100 URLs, depth 3 (reference --quick)")
    p.add_argument("--xlsx", action="store_true",
                   help="also write the 11-tab Excel workbook")
    src = p.add_mutually_exclusive_group()
    src.add_argument("--pages-parquet", default=None,
                     help="page-store parquet directory to crawl")
    src.add_argument("--from-documents", default=None, metavar="SF_DIR",
                     help="derive the site from SF_DIR/documents.parquet")
    src.add_argument("--synthetic", type=int, default=None, metavar="N",
                     help="crawl the built-in N-page synthetic site")
    p.add_argument("--cores", type=int, default=8,
                   help="local[N] cores for the Spark session")
    return p.parse_args(argv)


def _pages_df(spark, args):
    """Resolve the page source; returns (pages_df_or_None, source_seed)."""
    if args.pages_parquet:
        return spark.read.parquet(args.pages_parquet), args.url
    if args.from_documents:
        from .sources.from_documents import SEED_URL, pages_df_from_documents
        return pages_df_from_documents(spark, args.from_documents), SEED_URL
    if args.synthetic is not None:
        import pandas as pd

        from .sources.synthetic_site import SEED_URL, build_site
        store = build_site(args.synthetic, n_images=args.synthetic // 3)
        pages = spark.createDataFrame(
            pd.DataFrame(list(store.values())), schema=(
                "url string, page_index int, status_code int, "
                "content_type string, final_url string, "
                "response_time_ms double, content_length long, html string, "
                "headers map<string,string>, image_ids array<string>"))
        return pages, SEED_URL
    return None, args.url  # live HTTP mode


def main(argv: list[str] | None = None) -> int:
    args = parse_arguments(argv)
    from .api import quick_analysis, validate_config
    from .config import CrawlConfig

    try:
        validate_config(CrawlConfig(
            seed_url=args.url, max_urls=args.max_urls,
            max_depth=args.max_depth, batch_size=args.threads))
    except ValueError as e:
        print(f"error: {e}", file=sys.stderr)
        return 1

    from .session import get_spark
    spark = get_spark("crawler-seo-spark-cli", cores=args.cores,
                      shuffle_partitions=args.cores)
    pages, source_seed = _pages_df(spark, args)
    explicit_source = pages is not None
    # explicit sources crawl from their own canonical seed unless the user
    # pointed --url somewhere specific
    seed_url = source_seed if (explicit_source and args.url == DEFAULT_URL) \
        else args.url

    report_dir = f"{args.output}/{args.filename}"
    wide, state, stats = quick_analysis(
        spark, pages, seed_url, max_urls=args.max_urls,
        max_depth=args.max_depth, batch_size=args.threads,
        smart=(args.crawler == "smart"),
        quick=args.quick, report_dir=report_dir)
    if args.xlsx:
        from .plans.reports import write_xlsx
        write_xlsx(wide, f"{report_dir}/{args.filename}.xlsx")
    print(json.dumps(stats, indent=2))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

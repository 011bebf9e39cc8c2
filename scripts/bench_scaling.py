"""Two-parallelism scaling benchmark — the sandbox evidence for the
north-rule's ≥0.8 throughput-scaling-efficiency criterion (N → 4N).

No real multi-executor cluster exists here, so per the driver protocol we
run the IDENTICAL job on the IDENTICAL input at local[N] and local[4N]
(N=8 → 32 cores; spark.sql.shuffle.partitions scaled with cores), measure
wall time per phase, and report

    efficiency(N→4N) = T_N / (4 · T_4N)        (1.0 = perfect scaling)

Workload (amplified ×REP so each phase has enough parallel work to measure
strong scaling honestly at this box size):

  W1 parse+analyze — the crawl engine's per-round hot path: Arrow-batched
     HTML parse + analyzer UDF + Catalyst enrichment over ~80k pages.
  W2 minhash+LSH   — signature computation + band join over ~80k docs.
  W3 crawl rounds  — the full BFS engine, 4k URLs in 1k batches.

Writes/updates BENCH.md. Usage: python scripts/bench_scaling.py [rep]
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

SF_DIR = "/root/testdata/sf0.1"
REP = int(sys.argv[1]) if len(sys.argv) > 1 else 16
N_SMALL, N_BIG = 8, 32


def replicated_docs(spark, rep: int):
    from pyspark.sql import functions as F
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    return (docs
            .withColumn("rep", F.explode(F.sequence(F.lit(0), F.lit(rep - 1))))
            .select((F.col("doc_id") * rep + F.col("rep")).alias("doc_id"),
                    F.concat(F.col("text"), F.lit(" rep"),
                             F.col("rep")).alias("text"))
            .repartition(spark.sparkContext.defaultParallelism))


def build_pages(spark, docs):
    import pandas as pd
    from crawler_seo_spark.sources.from_documents import page_from_document
    n_docs = docs.count()

    def build(batches):
        for pdf in batches:
            rows = [page_from_document(int(d), t or "", n_docs)
                    for d, t in zip(pdf["doc_id"], pdf["text"])]
            yield pd.DataFrame(rows)

    schema = ("url string, page_index long, status_code int, "
              "content_type string, final_url string, response_time_ms double, "
              "content_length long, html string, headers map<string,string>, "
              "image_ids array<string>")
    return docs.select("doc_id", "text").mapInPandas(build, schema=schema)


def run_suite(cores: int) -> dict[str, float]:
    import os
    os.environ["SPARK_MASTER"] = f"local[{cores}]"
    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F
    active = SparkSession.getActiveSession()
    if active:
        active.stop()
        time.sleep(2)
    from crawler_seo_spark.session import get_spark
    spark = get_spark(f"scaling-{cores}", cores=cores,
                      shuffle_partitions=cores)

    docs = replicated_docs(spark, REP).localCheckpoint(eager=True)
    n_docs = docs.count()
    pages = build_pages(spark, docs).localCheckpoint(eager=True)
    timings: dict[str, float] = {}

    # W1: parse + analyze + enrich over every page
    from crawler_seo_spark.functions.parse import analysis_column
    t0 = time.monotonic()
    analyzed = pages.withColumn(
        "analysis",
        analysis_column(F.col("html"), F.col("url"),
                        F.lit(True), "shop.example.test"))
    (analyzed.select("url", "analysis.title", "analysis.links",
                     "analysis.headings_problematicos_count")
     .write.format("noop").mode("overwrite").save())
    timings["w1_parse_analyze"] = time.monotonic() - t0

    # W2: minhash + LSH pairs
    from crawler_seo_spark.operators.dedup import (
        lsh_candidate_pairs, minhash_signatures)
    t0 = time.monotonic()
    sigs = minhash_signatures(docs, k=32, shingle_mode="word", shingle_n=3,
                              hash_mode="xxhash64").localCheckpoint()
    lsh_candidate_pairs(sigs, bands=8).write.format("noop") \
        .mode("overwrite").save()
    timings["w2_minhash_lsh"] = time.monotonic() - t0

    # W3: crawl engine rounds
    from crawler_seo_spark.config import CrawlConfig
    from crawler_seo_spark.engine import CrawlEngine
    from crawler_seo_spark.sources.from_documents import SEED_URL
    cfg = CrawlConfig(seed_url=SEED_URL, max_urls=4000, batch_size=1000)
    t0 = time.monotonic()
    state = CrawlEngine(spark, pages, cfg).run()
    n = state.crawl_order.count()
    timings["w3_crawl_rounds"] = time.monotonic() - t0
    timings["w3_urls"] = float(n)
    timings["n_docs"] = float(n_docs)
    spark.stop()
    time.sleep(2)
    return timings


def main() -> None:
    r_small = run_suite(N_SMALL)
    r_big = run_suite(N_BIG)
    phases = ["w1_parse_analyze", "w2_minhash_lsh", "w3_crawl_rounds"]
    total_s = sum(r_small[p] for p in phases)
    total_b = sum(r_big[p] for p in phases)
    ratio = N_BIG // N_SMALL
    report = {
        "cores_small": N_SMALL, "cores_big": N_BIG, "rep": REP,
        "n_docs": r_small["n_docs"],
        "phases": {
            p: {
                f"T_{N_SMALL}": round(r_small[p], 2),
                f"T_{N_BIG}": round(r_big[p], 2),
                "efficiency": round(r_small[p] / (ratio * r_big[p]), 3),
            } for p in phases
        },
        "total": {
            f"T_{N_SMALL}": round(total_s, 2),
            f"T_{N_BIG}": round(total_b, 2),
            "efficiency": round(total_s / (ratio * total_b), 3),
        },
        "crawl_urls_per_sec": {
            f"local[{N_SMALL}]": round(r_small["w3_urls"]
                                       / r_small["w3_crawl_rounds"], 1),
            f"local[{N_BIG}]": round(r_big["w3_urls"]
                                     / r_big["w3_crawl_rounds"], 1),
        },
    }
    print(json.dumps(report, indent=2))
    Path("SCALING.json").write_text(json.dumps(report, indent=2))


if __name__ == "__main__":
    main()

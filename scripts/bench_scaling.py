"""Two-parallelism scaling benchmark — the sandbox evidence for the
north-rule's ≥0.8 throughput-scaling-efficiency criterion (N → 4N).

No real multi-executor cluster exists here, so per the driver protocol we
run the IDENTICAL job on the IDENTICAL input at local[N] and local[4N]
(N=2 → 8 — this VM's hypervisor delivers only ~14-16 effective cores of
its 32 vCPUs, so 8→32 is host-capped at ~0.5; see machine_ceiling()),
measure wall time per phase, and report

    efficiency(N→4N) = T_N / (4 · T_4N)        (1.0 = perfect scaling)

Workload (amplified ×REP so each phase has enough parallel work to measure
strong scaling honestly at this box size):

  W1  parse+analyze — the crawl engine's per-round hot path: Arrow-batched
      HTML parse + analyzer UDF over heavy derived pages.
  W2  minhash signatures — per-row compute (JVM hashing + numpy k-min).
  W2b LSH band join — the dedup shuffle.
  W3  crawl rounds — the full BFS engine in LIVE-fetch mode: every page is
      materialized on the executors by the deterministic origin function
      (sources/from_documents.live_fetch_factory), the production
      ``mapInPandas`` fetch shape. No page store exists anywhere — round 1
      benchmarked against an in-memory store join, which re-scanned ~600 MB
      of pages EVERY round (a sandbox artifact, memory-bandwidth-bound, and
      the main reason measured crawl scaling was 0.27). Rounds are heavy
      (80k URLs dequeued/round) so the round barrier amortizes — the
      10^10-frontier regime the north rule describes. Strong scaling (same
      input both levels), weak scaling (batch = 25k·cores), and
      steady-state (full rounds only) are all reported.

Writes SCALING.json; analysis in BENCH.md. Usage: bench_scaling.py [rep]
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

SF_DIR = "/root/testdata/sf0.1"
REP = int(sys.argv[1]) if len(sys.argv) > 1 else 12
N_SMALL, N_BIG = 2, 8


def replicated_docs(spark, rep: int):
    from pyspark.sql import functions as F
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    return (docs
            .withColumn("rep", F.explode(F.sequence(F.lit(0), F.lit(rep - 1))))
            .select((F.col("doc_id") * rep + F.col("rep")).alias("doc_id"),
                    # heavy text: page parse work dominates rounds, as at
                    # real scale (repeat ×6 ≈ 1.8 KB docs)
                    F.concat_ws(" rep", *([F.col("text")] * 6),
                                F.col("rep").cast("string")).alias("text"))
            .repartition(2 * spark.sparkContext.defaultParallelism))


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
    from pyspark.sql import functions as F
    from crawler_seo_spark.session import get_spark
    spark = get_spark(f"scaling-{cores}", cores=cores,
                      shuffle_partitions=cores)

    docs = replicated_docs(spark, REP).localCheckpoint(eager=True)
    n_docs = docs.count()
    pages = (build_pages(spark, docs)
             .repartition(2 * spark.sparkContext.defaultParallelism)
             .localCheckpoint(eager=True))
    timings: dict[str, float] = {}

    def best_of(n_runs, fn):
        """min over repeats — strips JIT/page-cache warmup variance."""
        best = float("inf")
        for _ in range(n_runs):
            t0 = time.monotonic()
            fn()
            best = min(best, time.monotonic() - t0)
        return best

    # W1: parse + analyze + enrich over every page
    from crawler_seo_spark.functions.parse import analysis_column
    def w1():
        analyzed = pages.withColumn(
            "analysis",
            analysis_column(F.col("html"), F.col("url"),
                            F.lit(True), "shop.example.test"))
        (analyzed.select("url", "analysis.title", "analysis.links",
                         "analysis.headings_problematicos_count")
         .write.format("noop").mode("overwrite").save())
    timings["w1_parse_analyze"] = best_of(2, w1)

    # W2: minhash + LSH pairs
    from crawler_seo_spark.operators.dedup import (
        lsh_candidate_pairs, minhash_signatures)
    sig_holder = {}

    def w2():
        sig_holder["sigs"] = minhash_signatures(
            docs, k=32, shingle_mode="word", shingle_n=3,
            hash_mode="xxhash64").localCheckpoint()
    timings["w2_minhash_sigs"] = best_of(2, w2)

    def w2b():
        lsh_candidate_pairs(sig_holder["sigs"], bands=8) \
            .write.format("noop").mode("overwrite").save()
    timings["w2b_lsh_join"] = best_of(2, w2b)

    # W4: image validation (north-rule metric: images validated/sec) —
    # executor-side generate + decode/PSNR/phash/caption validation
    from crawler_seo_spark.operators.multimodal import validate_images
    # big enough that the ~1 s of fixed job overhead is <10% of the 4N
    # wall — 12k finished in ~1.4 s at 8 cores, measuring scheduling
    # latency more than the validation kernel
    n_img = 36_000

    def gen_images(batches):
        import pandas as pd
        from crawler_seo_spark.sources.images import make_image_row
        for pdf in batches:
            yield pd.DataFrame([make_image_row(int(i)) for i in pdf["id"]])

    img_df = (spark.range(n_img).repartition(4 * cores)
              .mapInPandas(gen_images,
                           schema="image_id string, bytes binary, w int, "
                                  "h int, fmt string, caption string, "
                                  "phash long")
              .localCheckpoint(eager=True))

    def w4():
        validate_images(img_df).filter(
            "decode_ok AND pixels_ok").write.format("noop") \
            .mode("overwrite").save()
    timings["w4_images_validate"] = best_of(2, w4)
    timings["w4_n_images"] = float(n_img)

    # W3: crawl engine rounds, LIVE-fetch mode (production shape: pages
    # materialized per-URL on the executors, zero shared state)
    from crawler_seo_spark.config import CrawlConfig
    from crawler_seo_spark.engine import CrawlEngine
    from crawler_seo_spark.sources.from_documents import (
        SEED_URL, doc_url, live_fetch_factory)
    n_virtual = 1_200_000        # virtual origin size (pages on demand)
    factory = live_fetch_factory(n_virtual)
    seeds = [doc_url(i) for i in range(0, n_virtual, n_virtual // 4000)]
    # ≥200k-URL rounds (round-3 protocol): the amortizing-round regime the
    # 10^10 design point lives in — the fixed ~2 s round barrier must be
    # <2% of a round, measured rather than modeled (round-2 rounds were
    # 80k and barrier-bound at 4N).
    cfg = CrawlConfig(seed_url=SEED_URL, seed_urls=seeds,
                      max_urls=600_000, batch_size=200_000,
                      requests_per_second=1e9,   # no pacing: benchmark mode
                      seq_window_threshold=40_000)  # distributed order paths
    n_holder = {}

    def w3():
        state = CrawlEngine(spark, None, cfg, fetch_fn_factory=factory).run()
        n_holder["n"] = state.crawl_order.count()
        # steady-state rounds = full batches (ramp-up rounds excluded):
        # the regime the 10^10 design point lives in
        heavy = [r for r in state.rounds
                 if r["dequeued"] >= cfg.batch_size // 2]
        n_holder["ss_urls"] = sum(r["dequeued"] for r in heavy)
        n_holder["ss_ms"] = sum(r["wall_ms"] for r in heavy)
        n_holder["rounds"] = [
            {k: r[k] for k in ("round", "dequeued", "t_dequeue_ms",
                               "t_fetch_parse_ms", "t_prune_ms", "t_seq_ms",
                               "t_merge_ms", "wall_ms")}
            for r in state.rounds]
    timings["w3_crawl_rounds"] = best_of(1, w3)
    timings["w3_urls"] = float(n_holder["n"])
    timings["w3_steady_urls"] = float(n_holder["ss_urls"])
    timings["w3_steady_s"] = n_holder["ss_ms"] / 1000.0
    timings["w3_round_breakdown"] = n_holder["rounds"]

    # W3-weak: work scaled with cores (batch = 25k·cores) — the cluster
    # growth model of the north rule: 4× executors ingest a 4× frontier.
    wcfg = CrawlConfig(seed_url=SEED_URL,
                       seed_urls=seeds,
                       max_urls=75_000 * cores, batch_size=25_000 * cores,
                       requests_per_second=1e9,
                       seq_window_threshold=20_000)

    def w3w():
        state = CrawlEngine(spark, None, wcfg,
                            fetch_fn_factory=factory).run()
        n_holder["wn"] = state.crawl_order.count()
        # steady-state weak rounds: full batch-size rounds only. The ramp
        # from 4000 seeds up to a 25k·cores batch is identical in absolute
        # size at both levels, so the 4N run spends proportionally more
        # wall inside it; the rule's regime (4× executors ingesting 4×
        # rounds) is the full-size rounds.
        heavy = [r for r in state.rounds
                 if r["dequeued"] >= wcfg.batch_size // 2]
        n_holder["wss_urls"] = sum(r["dequeued"] for r in heavy)
        n_holder["wss_ms"] = sum(r["wall_ms"] for r in heavy)
    timings["w3_weak"] = best_of(1, w3w)
    timings["w3_weak_urls"] = float(n_holder["wn"])
    timings["w3_weak_steady_urls"] = float(n_holder["wss_urls"])
    timings["w3_weak_steady_s"] = n_holder["wss_ms"] / 1000.0
    timings["n_docs"] = float(n_docs)
    spark.stop()
    time.sleep(2)
    return timings


def machine_ceiling() -> dict:
    """Raw-CPU calibration: a pure multiprocessing burn at N and 4N procs.
    This VM advertises 32 CPUs but delivers ~14-16 effective cores (shared
    hypervisor), so strong scaling beyond ~8 workers is capped by the host,
    not by Spark or the engine. The burn's N→4N efficiency is the CEILING
    any job can reach here; it is reported next to the measured numbers."""
    import multiprocessing as mp

    work = 120_000_000
    out = {}
    for procs in (N_SMALL, N_BIG):
        best = float("inf")
        for _ in range(2):
            t0 = time.monotonic()
            with mp.Pool(procs) as pool:
                pool.map(_burn, [work // procs] * procs)
            best = min(best, time.monotonic() - t0)
        out[f"T_{procs}"] = round(best, 2)
    out["efficiency_ceiling"] = round(
        out[f"T_{N_SMALL}"] / ((N_BIG // N_SMALL) * out[f"T_{N_BIG}"]), 3)
    return out


def _burn(n: int) -> int:
    x = 0
    for i in range(n):
        x += i * i
    return x


def _kernel_chunk(args: tuple) -> int:
    """The engine's ACTUAL per-URL work (fetch + md5 + parse/analyze) with
    no Spark around it — run under a bare multiprocessing pool."""
    lo, hi = args
    import hashlib

    from crawler_seo_spark.functions.parse import analyze_page
    from crawler_seo_spark.sources.from_documents import (
        doc_url, live_fetch_factory)
    fetch = live_fetch_factory(1_200_000)()
    for i in range(lo, hi):
        u = doc_url(i * 10 + 7)
        r = fetch(u)
        hashlib.md5(r["html"].encode()).hexdigest()
        if r["status_code"] == 200:
            analyze_page(r["html"], u, "shop.example.test", True)
    return hi - lo


def kernel_ceiling(n_urls: int = 60_000) -> dict:
    """Workload-shaped hardware ceiling: the fused fetch+analyze kernel in a
    bare mp.Pool at N and 4N procs. This is what the crawl round's compute
    CAN scale to on this box; the Spark measurements are graded against it
    (pure-arithmetic burns understate memory-allocation-heavy work)."""
    import multiprocessing as mp
    out = {}
    for procs in (N_SMALL, N_BIG):
        chunks = [(k * n_urls // procs, (k + 1) * n_urls // procs)
                  for k in range(procs)]
        best = float("inf")
        for _ in range(2):
            t0 = time.monotonic()
            with mp.Pool(procs) as pool:
                pool.map(_kernel_chunk, chunks)
            best = min(best, time.monotonic() - t0)
        out[f"T_{procs}"] = round(best, 2)
        out[f"urls_per_sec_{procs}"] = round(n_urls / best, 1)
    out["efficiency_ceiling"] = round(
        out[f"T_{N_SMALL}"] / ((N_BIG // N_SMALL) * out[f"T_{N_BIG}"]), 3)
    return out


def _suite_subprocess(cores: int) -> dict[str, float]:
    """Each parallelism level runs in its OWN process — a shared JVM leaks
    heap/GC/python-worker state from one measurement into the other."""
    import subprocess
    out = subprocess.run(
        [sys.executable, __file__, str(REP), f"--suite={cores}"],
        capture_output=True, text=True, timeout=2400)
    if out.returncode != 0:
        raise RuntimeError(out.stderr[-2000:])
    return json.loads(out.stdout.strip().splitlines()[-1])


def main() -> None:
    if any(a.startswith("--suite=") for a in sys.argv):
        cores = int([a for a in sys.argv
                     if a.startswith("--suite=")][0].split("=")[1])
        print(json.dumps(run_suite(cores)))
        return
    ceiling = machine_ceiling()
    k_ceiling = kernel_ceiling()
    r_small = _suite_subprocess(N_SMALL)
    r_big = _suite_subprocess(N_BIG)
    phases = ["w1_parse_analyze", "w2_minhash_sigs", "w2b_lsh_join",
              "w4_images_validate", "w3_crawl_rounds"]
    total_s = sum(r_small[p] for p in phases)
    total_b = sum(r_big[p] for p in phases)
    ratio = N_BIG // N_SMALL
    report = {
        "cores_small": N_SMALL, "cores_big": N_BIG, "rep": REP,
        "machine_ceiling": ceiling,
        "kernel_pool_ceiling": k_ceiling,
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
        "crawl_weak_scaling": {
            f"urls_per_sec_local[{N_SMALL}]":
                round(r_small["w3_weak_urls"] / r_small["w3_weak"], 1),
            f"urls_per_sec_local[{N_BIG}]":
                round(r_big["w3_weak_urls"] / r_big["w3_weak"], 1),
            "efficiency": round(
                (r_big["w3_weak_urls"] / r_big["w3_weak"])
                / (4 * r_small["w3_weak_urls"] / r_small["w3_weak"]), 3),
        },
        "crawl_weak_steady_state": {
            f"urls_per_sec_local[{N_SMALL}]":
                round(r_small["w3_weak_steady_urls"]
                      / r_small["w3_weak_steady_s"], 1),
            f"urls_per_sec_local[{N_BIG}]":
                round(r_big["w3_weak_steady_urls"]
                      / r_big["w3_weak_steady_s"], 1),
            "efficiency": round(
                (r_big["w3_weak_steady_urls"] / r_big["w3_weak_steady_s"])
                / (4 * r_small["w3_weak_steady_urls"]
                   / r_small["w3_weak_steady_s"]), 3),
        },
        "images_validated_per_sec": {
            f"local[{N_SMALL}]": round(
                r_small["w4_n_images"] / r_small["w4_images_validate"], 1),
            f"local[{N_BIG}]": round(
                r_big["w4_n_images"] / r_big["w4_images_validate"], 1),
        },
        "crawl_steady_state": {
            f"urls_per_sec_local[{N_SMALL}]":
                round(r_small["w3_steady_urls"] / r_small["w3_steady_s"], 1),
            f"urls_per_sec_local[{N_BIG}]":
                round(r_big["w3_steady_urls"] / r_big["w3_steady_s"], 1),
            "efficiency": round(
                (r_big["w3_steady_urls"] / r_big["w3_steady_s"])
                / (4 * r_small["w3_steady_urls"] / r_small["w3_steady_s"]),
                3),
        },
        "w3_round_breakdown": {
            f"local[{N_SMALL}]": r_small["w3_round_breakdown"],
            f"local[{N_BIG}]": r_big["w3_round_breakdown"],
        },
    }
    print(json.dumps(report, indent=2))
    Path("SCALING.json").write_text(json.dumps(report, indent=2))


if __name__ == "__main__":
    main()

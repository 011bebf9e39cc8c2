"""Round-6 optimization harness — plan capture + noop-sink isolation.

NOT the driver bench (bench.py is frozen for measurement). This script
rebuilds the same DataFrames bench.py times and either:

* ``python bench_extra.py plans <suffix> [names...]`` — write
  ``plans/r06/<name>_<suffix>.txt`` with ``explain("formatted")`` output;
* ``python bench_extra.py time [names...]`` — min-of-k noop-sink timings
  for the named queries only (guide §1.4 isolation).

Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf1.0), SPARK_GRAFT_CPUS.
"""

from __future__ import annotations

import io
import os
import sys
import time
from contextlib import redirect_stdout
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf1.0")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
K = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_K", "3")))


def force(df):
    df.write.format("noop").mode("overwrite").save()


def build_queries(spark):
    """name -> zero-arg DataFrame builder, mirroring bench.py's setup."""
    from pyspark.sql import functions as F

    from crawler_seo_spark.operators.decontam import contamination_ratios
    from crawler_seo_spark.operators.dedup import (
        exact_duplicates,
        lsh_candidate_pairs,
        minhash_signatures,
        simhash64,
    )
    from crawler_seo_spark.operators.paragraph import (
        paragraph_stats,
        repeated_span_extents,
        repeated_span_stats,
    )
    from crawler_seo_spark.operators.text import with_text_analysis
    from crawler_seo_spark.plans import driver_queries as dq

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")

    builders = {}

    def reg(name, fn):
        builders[name] = fn

    reg("t_text_analysis_full", lambda: with_text_analysis(docs))
    reg("d_exact_dedup_full", lambda: exact_duplicates(docs))
    reg("d_simhash_full",
        lambda: docs.select("doc_id",
                            simhash64(F.col("text"),
                                      hash_mode="xxhash64").alias("sh")))
    reg("d_repeated_spans_mod8_full",
        lambda: repeated_span_stats(docs, width=40, sample_mod=8,
                                    selector="rolling"))
    reg("d_repeated_spans_mod32_full",
        lambda: repeated_span_stats(docs, width=40, sample_mod=32,
                                    selector="rolling"))
    reg("d_span_extents_mod8_full",
        lambda: repeated_span_extents(docs, width=40, sample_mod=8,
                                      selector="rolling"))
    reg("t_decontam_full_vs_200",
        lambda: contamination_ratios(docs, docs.filter("doc_id < 200"),
                                     n=8, key="hash"))
    reg("j1_bloom_pruned_anti_join",
        lambda: dq.j1_bloom_pruned_anti_join(spark, SF_DIR))
    reg("c1_canonicalize", lambda: dq.c1_canonicalize(spark, SF_DIR))
    reg("m_phash_near_dup", lambda: dq.m_phash_near_dup(spark, SF_DIR))

    def para_docs():
        return (docs.alias("a")
                .join(docs.alias("b"),
                      F.col("b.doc_id")
                      == F.col("a.doc_id") - (F.col("a.doc_id") % 4))
                .select(F.col("a.doc_id").alias("doc_id"),
                        F.concat_ws("\n\n",
                                    F.substring(F.col("a.text"), 1, 80),
                                    F.col("b.text"),
                                    F.col("a.text")).alias("text")))

    reg("d_paragraph_stats_full", lambda: paragraph_stats(para_docs()))

    def sigs():
        return minhash_signatures(docs, k=32, shingle_mode="word",
                                  shingle_n=3, hash_mode="xxhash64")

    reg("d_minhash_signatures_full", sigs)
    reg("d_lsh_candidate_pairs",
        lambda: lsh_candidate_pairs(
            sigs().localCheckpoint(eager=True), bands=8))

    from crawler_seo_spark.operators.similarity import brute_force_topk
    queries10 = emb.filter("vec_id < 10").select(
        F.col("vec_id").alias("query_id"), "embedding")
    reg("s_ann_bruteforce_topk",
        lambda: brute_force_topk(emb, queries10, k=5))
    return builders


def main() -> None:
    from crawler_seo_spark.session import get_spark
    mode = sys.argv[1]
    spark = get_spark("bench_extra", cores=CPUS, shuffle_partitions=CPUS)
    builders = build_queries(spark)
    if mode == "plans":
        suffix = sys.argv[2]
        names = sys.argv[3:] or list(builders)
        out_dir = Path(__file__).resolve().parent / "plans" / "r06"
        out_dir.mkdir(parents=True, exist_ok=True)
        for name in names:
            df = builders[name]()
            buf = io.StringIO()
            with redirect_stdout(buf):
                df.explain("formatted")
            (out_dir / f"{name}_{suffix}.txt").write_text(buf.getvalue())
            print(f"wrote {name}_{suffix}.txt", file=sys.stderr)
    elif mode == "time":
        names = sys.argv[2:] or list(builders)
        from pyspark.sql import functions as F
        # warmup (session setup, parquet footers) — same as bench.py
        force(spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
              .limit(1000).select(F.count(F.lit(1)).alias("n")))
        for name in names:
            samples = []
            for _ in range(K):
                spark.sparkContext.setJobDescription(f"bench_extra:{name}")
                t0 = time.monotonic()
                force(builders[name]())
                samples.append(time.monotonic() - t0)
            spark.sparkContext.setJobDescription(None)
            print(f"{name}: min={min(samples):.3f} "
                  f"samples={[round(s, 3) for s in samples]}")
    else:
        raise SystemExit(f"unknown mode {mode}")


if __name__ == "__main__":
    main()

"""Physical-plan assertions: the optimizations we claim must show up in
``explain()`` output — filter/column pushdown to parquet, broadcast joins
for small sides, TakeOrderedAndProject for top-k, no Python in JVM-only
pipelines."""

import pytest
from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


def plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def optimized(df) -> str:
    return df._jdf.queryExecution().optimizedPlan().toString()


def test_q1_pushdown(spark):
    from crawler_seo_spark.plans.driver_queries import q1_pricing_summary
    df = q1_pricing_summary(spark, SF)
    p = plan(df)
    assert "PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate"\
        in p, p
    # column pruning: only the 7 needed columns reach the scan
    assert "l_comment" not in p
    assert "HashAggregate" in p


def test_q3_broadcasts_dims(spark):
    from crawler_seo_spark.plans.driver_queries import q3_order_revenue_topk
    p = plan(q3_order_revenue_topk(spark, SF))
    assert p.count("BroadcastHashJoin") == 2, p
    assert "SortMergeJoin" not in p


def test_topk_is_take_ordered(spark):
    from crawler_seo_spark.plans.driver_queries import o5_topk_scores
    p = plan(o5_topk_scores(spark, SF))
    assert "TakeOrderedAndProject" in p


def test_enrich_has_no_python(spark, pages_df):
    """The enrichment stage must be pure JVM (no Python workers): scores,
    windows, warnings are Catalyst expressions."""
    from crawler_seo_spark.config import CrawlConfig
    from crawler_seo_spark.engine import CrawlEngine
    from crawler_seo_spark.plans.enrich import enrich_results
    from crawler_seo_spark.sources.synthetic_site import SEED_URL
    state = CrawlEngine(spark, pages_df, CrawlConfig(
        seed_url=SEED_URL, max_urls=10, batch_size=5)).run()
    raw = state.results.localCheckpoint(eager=True)
    p = plan(enrich_results(raw))
    for marker in ("BatchEvalPython", "ArrowEvalPython", "FlatMapsInPandas",
                   "MapInPandas"):
        assert marker not in p, marker
    assert "Window" in p  # the duplicate-flag windows


def test_text_analysis_is_jvm_only(spark):
    from crawler_seo_spark.operators.text import with_text_analysis
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    out = with_text_analysis(docs)
    p = plan(out)
    assert "Python" not in p and "Pandas" not in p
    # '*(n)' marks whole-stage-codegen'd operators. r6 adds one
    # input-widening round-robin exchange ahead of the projection (a
    # tiny single-file scan otherwise runs the regex-heavy projection
    # in one task — operators/partitioning.py), which makes the plan
    # ADAPTIVE; AQE's pre-execution string hides the codegen markers,
    # so execute THIS DataFrame's own query (collect finalizes its
    # AdaptiveSparkPlan) and assert on the final plan.
    out.collect()
    p_final = plan(out)
    assert "Python" not in p_final and "Pandas" not in p_final
    assert "*(" in p_final, p_final[:200]


def test_fetch_join_broadcasts_batch_not_store(spark, pages_df):
    """The page store (the 100 TB side) must stream through a broadcast
    hash join — never shuffle, never broadcast itself."""
    from crawler_seo_spark.config import CrawlConfig
    from crawler_seo_spark.engine import CrawlEngine
    from crawler_seo_spark.sources.synthetic_site import SEED_URL
    eng = CrawlEngine(spark, pages_df, CrawlConfig(
        seed_url=SEED_URL, max_urls=10, batch_size=5))
    frontier, _, _ = eng._seed_frontier()
    batch = frontier.limit(5).withColumn("crawl_seq", F.lit(0).cast("long")) \
        .withColumn("round", F.lit(0))
    from crawler_seo_spark.operators.politeness import schedule_fetches
    batch = schedule_fetches(batch, 10.0)
    p = plan(eng._fetch(batch))
    assert "BroadcastHashJoin" in p
    assert "SortMergeJoin" not in p


def test_lsh_band_join_shuffles_only_band_keys(spark):
    """The LSH band self-join must not carry the signature arrays through
    the exchange — only (id, band, band_key)."""
    from crawler_seo_spark.operators.dedup import (
        lsh_candidate_pairs, minhash_signatures)
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    sigs = minhash_signatures(docs, k=8).localCheckpoint(eager=True)
    p = plan(lsh_candidate_pairs(sigs, bands=4))
    # every shuffle exchange moves only (id, band, band_key) — the signature
    # array is projected away before data crosses the wire
    exchanges = [ln for ln in p.splitlines() if "Exchange" in ln]
    assert exchanges, p
    for ln in exchanges:
        assert "signature" not in ln, ln


def test_salted_repartition_pins_partition_count(spark):
    """Regression: repartition(cols) without a count is REPARTITION_BY_COL,
    which AQE coalesces by shuffle SIZE — a few-MB URL batch folded to 1-2
    partitions and the per-URL python work downstream ran serially. The
    salted exchange must keep the requested fan-out."""
    import pyspark.sql.functions as F

    from crawler_seo_spark.operators.politeness import salted_repartition
    df = spark.range(20_000).select(
        F.concat(F.lit("https://shop.example.test/p/"),
                 F.col("id").cast("string")).alias("url"))
    out = salted_repartition(df, 32)
    n = out.rdd.getNumPartitions()
    assert n == spark.sparkContext.defaultParallelism
    # rows survive and every partition carries a fair share (no 1-partition
    # collapse): max load ≤ 4x ideal
    sizes = out.rdd.glom().map(len).collect()
    assert sum(sizes) == 20_000
    assert max(sizes) <= 4 * (20_000 // len(sizes))


def test_sequence_no_int32_wrap(spark):
    """Sequence numbering must stay exact across the 2^31 boundary — the
    offsets and row_number are added in LONG arithmetic (an int32 sum
    wrapped negative before the cast)."""
    import pyspark.sql.functions as F

    from crawler_seo_spark.operators.sequence import (
        global_sequence,
        global_sequence_small,
    )
    start = 2**31 - 3
    df = spark.range(10).select(F.col("id").alias("k"))
    big, total = global_sequence(df, [F.asc("k")], "seq", start=start,
                                 with_total=True)
    vals = [r["seq"] for r in big.orderBy("k").collect()]
    assert vals == list(range(start, start + 10)) and total == 10
    small = global_sequence_small(df, [F.asc("k")], "seq", start=start)
    assert [r["seq"] for r in small.orderBy("k").collect()] \
        == list(range(start, start + 10))

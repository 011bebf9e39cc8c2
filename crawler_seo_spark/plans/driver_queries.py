"""Driver-contract queries: one entry per implemented operator (SURVEY §2),
each with a DuckDB-equivalent ANSI-SQL oracle where SQL can express it.

Parity discipline (the driver compares row count + schema + order-
insensitive value hash):

* every computed column is aliased identically on both sides;
* counts are LONG on both sides, ratios DOUBLE rounded to 6 dp;
* string hashing uses md5 (bit-identical across engines), never
  xxhash64/murmur (engine-specific);
* the URL corpus for crawler-operator queries is derived analytically from
  ``documents.doc_id`` so the DuckDB side can construct the *expected*
  canonical forms independently — the Spark side runs the real kernels
  (pandas-UDF canonicalizer, Catalyst filter/priority/dedup expressions),
  making these genuine differential tests, not mirrored implementations.

Non-SQL-expressible operators (the iterative BFS engine, image validation)
appear in ``QUERIES`` without an oracle — the driver records a rows-only
check; their exactness is proven by the pytest oracle-equality suite.
"""

from __future__ import annotations

from collections.abc import Callable

import pandas as pd  # noqa: F401 — required for pandas-UDF type-hint resolution

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

BASE = "https://shop.example.test"

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLE: dict[str, str] = {}


def q(name: str, sql: str | None = None):
    def deco(fn):
        QUERIES[name] = fn
        if sql is not None:
            ORACLE[name] = sql
        return fn
    return deco


def _t(spark: SparkSession, sf_dir: str, table: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{table}.parquet")


# ===========================================================================
# Relational core (reference report stage analogs: A4/A7/O5, J*, windows)
# ===========================================================================

@q("q1_pricing_summary", """
SELECT l_returnflag, l_linestatus,
       round(sum(l_quantity), 2)                                   AS sum_qty,
       round(sum(l_extendedprice), 2)                              AS sum_base_price,
       round(sum(l_extendedprice * (1 - l_discount)), 2)           AS sum_disc_price,
       round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2) AS sum_charge,
       round(avg(l_quantity), 6)                                   AS avg_qty,
       round(avg(l_extendedprice), 6)                              AS avg_price,
       round(avg(l_discount), 6)                                   AS avg_disc,
       count(*)                                                    AS count_order
FROM lineitem WHERE l_shipdate <= DATE '1998-09-02'
GROUP BY l_returnflag, l_linestatus
""")
def q1_pricing_summary(spark, sf_dir):
    """TPC-H Q1 shape — the canonical agg-pushdown benchmark (A4/A8 analog:
    multi-metric aggregation over the big fact table)."""
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") <= "1998-09-02")
    return (li.groupBy("l_returnflag", "l_linestatus").agg(
        F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
        F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
        F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2)
        .alias("sum_disc_price"),
        F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))
                      * (1 + F.col("l_tax"))), 2).alias("sum_charge"),
        F.round(F.avg("l_quantity"), 6).alias("avg_qty"),
        F.round(F.avg("l_extendedprice"), 6).alias("avg_price"),
        F.round(F.avg("l_discount"), 6).alias("avg_disc"),
        F.count("*").alias("count_order")))


@q("q3_order_revenue_topk", """
SELECT o_orderkey, o_orderdate,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
FROM customer JOIN orders ON c_custkey = o_custkey
              JOIN lineitem ON l_orderkey = o_orderkey
WHERE c_mktsegment = 'BUILDING'
GROUP BY o_orderkey, o_orderdate
ORDER BY revenue DESC, o_orderkey LIMIT 10
""")
def q3_order_revenue_topk(spark, sf_dir):
    """Join pipeline (broadcast dims into the fact) + top-k."""
    cust = _t(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    orders = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    return (li.join(F.broadcast(orders), li.l_orderkey == orders.o_orderkey)
            .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
            .groupBy("o_orderkey", "o_orderdate")
            .agg(F.round(F.sum(F.col("l_extendedprice")
                               * (1 - F.col("l_discount"))), 2).alias("revenue"))
            .orderBy(F.desc("revenue"), "o_orderkey").limit(10))


@q("w_topk_per_group", """
SELECT * FROM (
  SELECT o_custkey, o_orderkey, o_totalprice,
         row_number() OVER (PARTITION BY o_custkey
                            ORDER BY o_totalprice DESC, o_orderkey) AS rk
  FROM orders) WHERE rk <= 3
""")
def w_topk_per_group(spark, sf_dir):
    """Top-k per group via window — the reference's nlargest per entity."""
    from pyspark.sql import Window
    w = Window.partitionBy("o_custkey").orderBy(
        F.desc("o_totalprice"), F.asc("o_orderkey"))
    return (_t(spark, sf_dir, "orders")
            .select("o_custkey", "o_orderkey", "o_totalprice",
                    F.row_number().over(w).alias("rk"))
            .filter(F.col("rk") <= 3))


@q("o5_topk_scores", """
SELECT o_orderkey, o_totalprice FROM orders
ORDER BY o_totalprice DESC, o_orderkey LIMIT 100
""")
def o5_topk_scores(spark, sf_dir):
    """O5: global top-k (TakeOrderedAndProject, excel_generator.py:589)."""
    return (_t(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
            .orderBy(F.desc("o_totalprice"), "o_orderkey").limit(100))


# ===========================================================================
# URL kernel operators (C1/C2, F1-F5, O1/O2, J1/J2) over a derived corpus
# ===========================================================================
# Raw/expected-canonical URL shapes per doc_id % 8 (see module docstring):
_URL_KINDS_SQL = f"""
  SELECT doc_id,
    CASE doc_id % 8
      WHEN 0 THEN '{BASE}/product/item-' || doc_id
      WHEN 1 THEN '{BASE}/page/info-' || doc_id || '/'
      WHEN 2 THEN '{BASE}/category/cat-' || doc_id || '?utm_source=mail&utm_medium=x'
      WHEN 3 THEN '{BASE}/blog/post-' || doc_id || '#section-2'
      WHEN 4 THEN '{BASE}//docs//guide-' || doc_id
      WHEN 5 THEN '{BASE}/page/info-' || doc_id || '?b=2&a=1'
      WHEN 6 THEN '{BASE}/assets/img-' || doc_id || '.png'
      ELSE        '{BASE}/checkout/cart/add/' || doc_id
    END AS raw_url,
    CASE doc_id % 8
      WHEN 0 THEN '{BASE}/product/item-' || doc_id
      WHEN 1 THEN '{BASE}/page/info-' || doc_id
      WHEN 2 THEN '{BASE}/category/cat-' || doc_id
      WHEN 3 THEN '{BASE}/blog/post-' || doc_id
      WHEN 4 THEN '{BASE}/docs/guide-' || doc_id
      WHEN 5 THEN '{BASE}/page/info-' || doc_id || '?a=1&b=2'
      WHEN 6 THEN '{BASE}/assets/img-' || doc_id || '.png'
      ELSE        '{BASE}/checkout/cart/add/' || doc_id
    END AS expected_canonical
  FROM documents
"""


def _raw_urls(spark, sf_dir) -> DataFrame:
    d = F.col("doc_id")
    k = d % 8
    raw = (
        F.when(k == 0, F.concat(F.lit(f"{BASE}/product/item-"), d))
        .when(k == 1, F.concat(F.lit(f"{BASE}/page/info-"), d, F.lit("/")))
        .when(k == 2, F.concat(F.lit(f"{BASE}/category/cat-"), d,
                               F.lit("?utm_source=mail&utm_medium=x")))
        .when(k == 3, F.concat(F.lit(f"{BASE}/blog/post-"), d,
                               F.lit("#section-2")))
        .when(k == 4, F.concat(F.lit(f"{BASE}//docs//guide-"), d))
        .when(k == 5, F.concat(F.lit(f"{BASE}/page/info-"), d, F.lit("?b=2&a=1")))
        .when(k == 6, F.concat(F.lit(f"{BASE}/assets/img-"), d, F.lit(".png")))
        .otherwise(F.concat(F.lit(f"{BASE}/checkout/cart/add/"), d)))
    from ..operators.partitioning import widen_small_input
    # the canonicalization pandas UDF downstream is the cost of every URL
    # query — widen the single-file scan so it runs at full parallelism
    return (widen_small_input(_t(spark, sf_dir, "documents"))
            .select("doc_id", raw.alias("raw_url")))


def _canonical_urls(spark, sf_dir) -> DataFrame:
    """raw corpus → the REAL canonicalization pandas UDF (C1)."""
    import pandas as pd
    from ..functions.urlnorm import canonicalize_series

    @F.pandas_udf("string")
    def canon(urls: pd.Series) -> pd.Series:
        return canonicalize_series(urls, None, "shop.example.test")

    # asNondeterministic: the optimizer pushes downstream filters (the
    # relevance predicate in o1/o2/j1/j2) BELOW the projection that
    # computes `url`, then re-evaluates the UDF above it — the plan grew
    # TWO ArrowEvalPython nodes and every URL query paid the canon pass
    # twice (guide §4.4; measured +0.9 s at sf1). The function is in
    # fact deterministic — the marker only forbids the duplicating
    # rewrite, so results are unchanged.
    canon = canon.asNondeterministic()

    return (_raw_urls(spark, sf_dir)
            .withColumn("url", canon(F.col("raw_url"))))


@q("c1_canonicalize", f"""
SELECT doc_id, raw_url, expected_canonical AS url
FROM ({_URL_KINDS_SQL})
""")
def c1_canonicalize(spark, sf_dir):
    """C1 differential: UDF output vs analytically constructed expectation."""
    return _canonical_urls(spark, sf_dir).select("doc_id", "raw_url", "url")


@q("c2_url_md5", f"""
SELECT doc_id, md5(expected_canonical) AS url_md5
FROM ({_URL_KINDS_SQL})
""")
def c2_url_md5(spark, sf_dir):
    """C2: reference-parity md5 dedup hash (url_manager.py:234)."""
    return (_canonical_urls(spark, sf_dir)
            .select("doc_id", F.md5(F.col("url")).alias("url_md5")))


@q("f3f5_relevance_filter", f"""
SELECT doc_id, url,
  CASE WHEN doc_id % 8 = 7 THEN 'ECOMMERCE_ENDPOINT'
       WHEN doc_id % 8 = 6 THEN 'FILE_EXTENSION'
       ELSE NULL END AS reason,
  (doc_id % 8 NOT IN (6, 7)) AS is_crawlable
FROM (SELECT doc_id, expected_canonical AS url FROM ({_URL_KINDS_SQL}))
""")
def f3f5_relevance_filter(spark, sf_dir):
    """F3-F5 blocklists as Catalyst expressions, with reason attribution
    (url_manager.py:139-198). The corpus plants ecommerce + extension hits
    (the extension check precedes the technical check, so `/assets/...png`
    attributes to FILE_EXTENSION)."""
    from ..functions.urlnorm import filter_reason_col
    return (_canonical_urls(spark, sf_dir)
            .select("doc_id", "url",
                    filter_reason_col(F.col("url")).alias("reason"))
            .withColumn("is_crawlable", F.col("reason").isNull()))


@q("o2_priority_classification", f"""
SELECT url, (doc_id % 8 IN (0, 2)) AS priority
FROM (SELECT doc_id, expected_canonical AS url FROM ({_URL_KINDS_SQL}))
WHERE doc_id % 8 NOT IN (6, 7)
""")
def o2_priority_classification(spark, sf_dir):
    """O2: priority patterns (crawler.py:275-278) — /product/ and /category/
    kinds are priority in this corpus."""
    from ..functions.urlnorm import filter_reason_col, is_priority_col
    return (_canonical_urls(spark, sf_dir)
            .filter(filter_reason_col(F.col("url")).isNull())
            .select("url", is_priority_col(F.col("url")).alias("priority")))


@q("o1_frontier_dequeue", f"""
SELECT url, priority, discovery_seq FROM (
  SELECT url, (doc_id % 8 IN (0, 2)) AS priority, doc_id AS discovery_seq
  FROM (SELECT doc_id, expected_canonical AS url FROM ({_URL_KINDS_SQL}))
  WHERE doc_id % 8 NOT IN (6, 7))
ORDER BY priority DESC, discovery_seq ASC LIMIT 50
""")
def o1_frontier_dequeue(spark, sf_dir):
    """O1/O3: the deterministic dequeue key — (priority DESC, discovery_seq
    ASC) LIMIT batch reproduces the reference's two-deque FIFO
    (url_manager.py:248-260, 386-404)."""
    from ..functions.urlnorm import filter_reason_col, is_priority_col
    frontier = (_canonical_urls(spark, sf_dir)
                .filter(filter_reason_col(F.col("url")).isNull())
                .select("url",
                        is_priority_col(F.col("url")).alias("priority"),
                        F.col("doc_id").alias("discovery_seq")))
    return frontier.orderBy(F.desc("priority"), F.asc("discovery_seq")).limit(50)


@q("j1_seen_anti_join", f"""
WITH cand AS (SELECT doc_id, expected_canonical AS url FROM ({_URL_KINDS_SQL})
              WHERE doc_id % 8 NOT IN (6, 7)),
seen AS (SELECT url FROM cand WHERE doc_id % 3 = 0)
SELECT url FROM cand WHERE url NOT IN (SELECT url FROM seen)
""")
def j1_seen_anti_join(spark, sf_dir):
    """J1: the exact seen-set anti-join (url_manager.py:222-238)."""
    from ..functions.urlnorm import filter_reason_col
    cand = (_canonical_urls(spark, sf_dir)
            .filter(filter_reason_col(F.col("url")).isNull())
            .select("doc_id", "url"))
    seen = cand.filter(F.col("doc_id") % 3 == 0).select("url")
    return cand.join(seen, "url", "left_anti").select("url")


@q("j1_bloom_pruned_anti_join", f"""
WITH cand AS (SELECT doc_id, expected_canonical AS url FROM ({_URL_KINDS_SQL})
              WHERE doc_id % 8 NOT IN (6, 7)),
seen AS (SELECT url FROM cand WHERE doc_id % 3 = 0)
SELECT url FROM cand WHERE url NOT IN (SELECT url FROM seen)
""")
def j1_bloom_pruned_anti_join(spark, sf_dir):
    """J1 with the sharded-Bloom prefilter in front: MUST produce exactly
    the plain anti-join's rows (bloom false positives only cost join probes,
    never rows) — same oracle as j1_seen_anti_join, different plan."""
    from ..functions.urlnorm import filter_reason_col
    from ..operators.bloom import ShardedBloom
    # pin the canonicalized candidate set: three consumers (filter build,
    # bloom probe side, exact anti-join seen side) would otherwise each
    # re-run the canonicalization UDF over the corpus (r6 measurement:
    # canon ≈ 0.9 s/pass at sf1, 3 passes ≈ half the query)
    cand = (_canonical_urls(spark, sf_dir)
            .filter(filter_reason_col(F.col("url")).isNull())
            .select("doc_id", "url")
            .localCheckpoint(eager=True))
    seen = cand.filter(F.col("doc_id") % 3 == 0).select("url")
    bloom = ShardedBloom(n_shards=8, bits_per_shard=1 << 17, num_hashes=5)
    bloom.add_urls(seen)
    return bloom.prune_new(cand, seen).select("url")


@q("j1_cuckoo_pruned_anti_join", f"""
WITH cand AS (SELECT doc_id, expected_canonical AS url FROM ({_URL_KINDS_SQL})
              WHERE doc_id % 8 NOT IN (6, 7)),
seen AS (SELECT url FROM cand WHERE doc_id % 3 = 0 AND doc_id % 5 <> 0)
SELECT url FROM cand WHERE url NOT IN (SELECT url FROM seen)
""")
def j1_cuckoo_pruned_anti_join(spark, sf_dir):
    """J1 with the DELETABLE cuckoo prefilter: insert the seen set, then
    DELETE the recrawl-invalidated subset (doc_id % 5 = 0) — the filter must
    re-admit exactly those urls, and the prune must still equal the plain
    anti-join against the post-invalidation seen table (false positives
    only cost probes; deletions restore admission; never a false negative).
    """
    from ..functions.urlnorm import filter_reason_col
    from ..operators.cuckoo import ShardedCuckoo
    # pinned for the same multi-consumer reason as j1_bloom (4 consumers)
    cand = (_canonical_urls(spark, sf_dir)
            .filter(filter_reason_col(F.col("url")).isNull())
            .select("doc_id", "url")
            .localCheckpoint(eager=True))
    inserted = cand.filter(F.col("doc_id") % 3 == 0)
    invalidated = inserted.filter(F.col("doc_id") % 5 == 0).select("url")
    seen = inserted.filter(F.col("doc_id") % 5 != 0).select("url")
    ck = ShardedCuckoo(n_shards=8, buckets_per_shard=1 << 12)
    ck.add_urls(inserted.select("url"))
    ck.delete_urls(invalidated)
    return ck.prune_new(cand, seen).select("url")


@q("j2_frontier_merge", f"""
WITH u AS (SELECT doc_id, expected_canonical AS url FROM ({_URL_KINDS_SQL})
           WHERE doc_id % 8 NOT IN (6, 7)),
existing AS (SELECT url, doc_id AS discovery_seq, 0 AS src
             FROM u WHERE doc_id % 2 = 0),
incoming AS (SELECT url, doc_id + 1000000 AS discovery_seq, 1 AS src
             FROM u WHERE doc_id % 3 = 0)
SELECT url, discovery_seq FROM (
  SELECT url, discovery_seq,
         row_number() OVER (PARTITION BY url ORDER BY src, discovery_seq) AS rn
  FROM (SELECT * FROM existing UNION ALL SELECT * FROM incoming))
WHERE rn = 1
""")
def j2_frontier_merge(spark, sf_dir):
    """J2: MERGE-INTO-when-not-matched semantics — existing frontier wins,
    new URLs append (url_manager.py:207-220) — exercised THROUGH the table
    provider (tables.SnapshotStore.merge_into): the existing frontier is
    written and committed as snapshot r0, the incoming rows are merged with
    WHEN NOT MATCHED THEN INSERT into snapshot r1, and the returned rows
    read back from the written files. Each side is first deduped to its
    minimum discovery_seq per url (the oracle's row_number pick)."""
    import tempfile

    from ..tables import SnapshotStore
    base = _canonical_urls(spark, sf_dir).select("doc_id", "url") \
        .filter(~(F.col("doc_id") % 8).isin(6, 7))
    existing = (base.filter(F.col("doc_id") % 2 == 0)
                .groupBy("url")
                .agg(F.min("doc_id").alias("discovery_seq")))
    incoming = (base.filter(F.col("doc_id") % 3 == 0)
                .groupBy("url")
                .agg((F.min("doc_id") + 1000000).alias("discovery_seq")))
    store = SnapshotStore(tempfile.mkdtemp(prefix="j2-merge-"))
    store.write("frontier", existing, 0)
    store.commit_round(0, {})
    return (store.merge_into(spark, "frontier", incoming, on="url",
                             round_id=1)
            .select("url", "discovery_seq"))


# ===========================================================================
# Order-dependent aggregations (A1/A2/A3/A7) over derived titles
# ===========================================================================
# Derived corpus: title repeats every 40 ids, description every 25; the
# "crawl order" is doc_id — giving first-seen-unflagged semantics to test.
_TITLES_SQL = """
  SELECT doc_id,
         'Página ' || (doc_id % 40) AS title,
         CASE WHEN doc_id % 10 = 9 THEN ''
              ELSE 'Desc ' || (doc_id % 25) END AS description
  FROM documents
"""


def _titles(spark, sf_dir):
    d = F.col("doc_id")
    return _t(spark, sf_dir, "documents").select(
        "doc_id",
        F.concat(F.lit("Página "), (d % 40)).alias("title"),
        F.when(d % 10 == 9, "").otherwise(
            F.concat(F.lit("Desc "), (d % 25))).alias("description"))


@q("a1_title_dup_window", f"""
SELECT doc_id, title,
  CASE WHEN title <> '' AND
            row_number() OVER (PARTITION BY title ORDER BY doc_id) > 1
       THEN 'SIM' ELSE 'NÃO' END AS title_duplicado
FROM ({_TITLES_SQL})
""")
def a1_title_dup_window(spark, sf_dir):
    """A1: the order-dependent duplicate flag — NOT a plain count>1; the
    first occurrence in crawl order stays unflagged
    (metatags_analyzer.py:196-211)."""
    from .enrich import duplicate_flag_col
    t = _titles(spark, sf_dir)
    return t.select(
        "doc_id", "title",
        F.when(duplicate_flag_col(F.col("title"), F.col("doc_id")), "SIM")
        .otherwise("NÃO").alias("title_duplicado"))


@q("a2_description_dup_window", f"""
SELECT doc_id, description,
  CASE WHEN description <> '' AND
            row_number() OVER (PARTITION BY description ORDER BY doc_id) > 1
       THEN 'SIM' ELSE 'NÃO' END AS description_duplicada
FROM ({_TITLES_SQL})
""")
def a2_description_dup_window(spark, sf_dir):
    """A2: same mechanics for descriptions; empties exempt
    (metatags_analyzer.py:213-228)."""
    from .enrich import duplicate_flag_col
    t = _titles(spark, sf_dir)
    return t.select(
        "doc_id", "description",
        F.when(duplicate_flag_col(F.col("description"), F.col("doc_id")),
               "SIM").otherwise("NÃO").alias("description_duplicada"))


@q("a3_duplicates_report", f"""
SELECT title, count(*) AS dup_count, min(doc_id) AS first_doc
FROM ({_TITLES_SQL}) WHERE title <> ''
GROUP BY title HAVING count(*) > 1
""")
def a3_duplicates_report(spark, sf_dir):
    """A3: duplicate groups (metatags_analyzer.py:387-404)."""
    return (_titles(spark, sf_dir).filter(F.col("title") != "")
            .groupBy("title")
            .agg(F.count("*").alias("dup_count"),
                 F.min("doc_id").alias("first_doc"))
            .filter(F.col("dup_count") > 1))


@q("a7_executive_summary", f"""
WITH t AS (SELECT doc_id, title, description,
            CASE WHEN title <> '' AND row_number()
                 OVER (PARTITION BY title ORDER BY doc_id) > 1
                 THEN 1 ELSE 0 END AS is_dup
           FROM ({_TITLES_SQL}))
SELECT count(*)                                       AS total_urls,
       sum(is_dup)::BIGINT                            AS titles_duplicados,
       sum(CASE WHEN description = '' THEN 1 ELSE 0 END)::BIGINT
                                                      AS descs_ausentes,
       sum(CASE WHEN doc_id % 29 = 11 THEN 1 ELSE 0 END)::BIGINT
                                                      AS erros_404
FROM t
""")
def a7_executive_summary(spark, sf_dir):
    """A7: one-pass conditional aggregation (excel_generator.py:611-672 does
    ten pandas passes; Catalyst fuses these into one scan)."""
    from .enrich import duplicate_flag_col
    t = _titles(spark, sf_dir).withColumn(
        "is_dup",
        F.when(duplicate_flag_col(F.col("title"), F.col("doc_id")), 1)
        .otherwise(0))
    return t.agg(
        F.count("*").alias("total_urls"),
        F.sum("is_dup").alias("titles_duplicados"),
        F.sum(F.when(F.col("description") == "", 1).otherwise(0))
        .alias("descs_ausentes"),
        F.sum(F.when(F.col("doc_id") % 29 == 11, 1).otherwise(0))
        .alias("erros_404"))


# ===========================================================================
# Analyzer column arithmetic (C5/C6, C15/C16, C19, C22)
# ===========================================================================

@q("c5_length_status", """
SELECT doc_id, title_length,
  CASE WHEN title_length = 0 THEN 'Ausente'
       WHEN title_length < 30 THEN 'Muito curto'
       WHEN title_length > 60 THEN 'Muito longo'
       ELSE 'OK' END AS title_status
FROM (SELECT doc_id, (doc_id * 7) % 80 AS title_length FROM documents)
""")
def c5_length_status(spark, sf_dir):
    """C5/C6: the 30/60 length buckets (metatags_analyzer.py:81-120)."""
    from .enrich import length_status_col
    d = _t(spark, sf_dir, "documents").select(
        "doc_id", ((F.col("doc_id") * 7) % 80).alias("title_length"))
    return d.withColumn(
        "title_status",
        length_status_col(F.col("title_length").cast("int"), 30, 60))


@q("c15_c16_score_arithmetic", """
WITH m AS (SELECT doc_id,
             doc_id % 2 = 0  AS h1_present,
             doc_id % 5 = 0  AS h1_multiple,
             doc_id % 3 <> 0 AS hier_ok,
             doc_id % 4      AS criticos,
             (doc_id % 4) + (doc_id % 3) AS problematicos,
             doc_id % 7 = 0  AS title_ok,
             doc_id % 7 = 1  AS title_dup,
             doc_id % 6 = 0  AS desc_ok,
             doc_id % 6 = 1  AS desc_dup,
             doc_id % 3 = 0  AS has_og,
             doc_id % 2 = 0  AS has_viewport,
             doc_id % 5 = 0  AS has_canonical
           FROM documents),
h AS (SELECT *, greatest(0, least(35,
        (CASE WHEN h1_present AND NOT h1_multiple THEN 20
              WHEN h1_present THEN 10 ELSE 0 END)
        + (CASE WHEN hier_ok THEN 15 ELSE 0 END)
        - criticos * 10 - (problematicos - criticos) * 3
        - (CASE WHEN NOT hier_ok THEN 15 ELSE 0 END))) AS headings_score
      FROM m)
SELECT doc_id, headings_score,
  least(100,
    (CASE WHEN title_ok AND NOT title_dup THEN 30
          WHEN title_dup THEN 20 ELSE 0 END)
    + (CASE WHEN desc_ok AND NOT desc_dup THEN 25
            WHEN desc_dup THEN 15 ELSE 0 END)
    + headings_score
    + (CASE WHEN has_og THEN 5 ELSE 0 END)
    + (CASE WHEN has_viewport THEN 3 ELSE 0 END)
    + (CASE WHEN has_canonical THEN 2 ELSE 0 END)) AS metatags_score
FROM h
""")
def c15_c16_score_arithmetic(spark, sf_dir):
    """C15+C16: the exact score formulas (headings_analyzer.py:341-367,
    metatags_analyzer.py:230-276) over a derived flag matrix."""
    d = F.col("doc_id")
    m = _t(spark, sf_dir, "documents").select(
        "doc_id",
        (d % 2 == 0).alias("h1_present"), (d % 5 == 0).alias("h1_multiple"),
        (d % 3 != 0).alias("hier_ok"), (d % 4).alias("criticos"),
        ((d % 4) + (d % 3)).alias("problematicos"),
        (d % 7 == 0).alias("title_ok"), (d % 7 == 1).alias("title_dup"),
        (d % 6 == 0).alias("desc_ok"), (d % 6 == 1).alias("desc_dup"),
        (d % 3 == 0).alias("has_og"), (d % 2 == 0).alias("has_viewport"),
        (d % 5 == 0).alias("has_canonical"))
    hs = F.greatest(F.lit(0), F.least(F.lit(35),
        F.when(F.col("h1_present") & ~F.col("h1_multiple"), 20)
         .when(F.col("h1_present"), 10).otherwise(0)
        + F.when(F.col("hier_ok"), 15).otherwise(0)
        - F.col("criticos") * 10
        - (F.col("problematicos") - F.col("criticos")) * 3
        - F.when(~F.col("hier_ok"), 15).otherwise(0)))
    m = m.withColumn("headings_score", hs)
    score = F.least(F.lit(100),
        F.when(F.col("title_ok") & ~F.col("title_dup"), 30)
         .when(F.col("title_dup"), 20).otherwise(0)
        + F.when(F.col("desc_ok") & ~F.col("desc_dup"), 25)
           .when(F.col("desc_dup"), 15).otherwise(0)
        + F.col("headings_score")
        + F.when(F.col("has_og"), 5).otherwise(0)
        + F.when(F.col("has_viewport"), 3).otherwise(0)
        + F.when(F.col("has_canonical"), 2).otherwise(0))
    return m.select("doc_id", "headings_score",
                    score.alias("metatags_score"))


@q("c19_status_warnings", f"""
WITH s AS (SELECT doc_id, expected_canonical AS url,
             CASE WHEN doc_id % 11 = 1 THEN 301
                  WHEN doc_id % 11 = 2 THEN 404
                  WHEN doc_id % 11 = 3 THEN 503
                  WHEN doc_id % 11 = 4 THEN 403
                  ELSE 200 END AS status_code
           FROM ({_URL_KINDS_SQL}))
SELECT doc_id, status_code,
  CASE WHEN status_code = 200 THEN ''
    ELSE 'Página retornou código de status ' || status_code ||
      CASE WHEN status_code IN (301,302,303,307,308)
             THEN ' | Redirect ' || status_code || ': ' || url || ' → ' || url
           WHEN status_code = 404 THEN ' | Página não encontrada (404)'
           WHEN status_code >= 500 THEN ' | Erro do servidor (' || status_code || ')'
           WHEN status_code = 403 THEN ' | Acesso negado (403)'
           ELSE '' END
  END AS warnings
FROM s
""")
def c19_status_warnings(spark, sf_dir):
    """C19: per-status warning strings (status_analyzer.py:84-97)."""
    from .enrich import status_warnings_col
    d = F.col("doc_id")
    status = (F.when(d % 11 == 1, 301).when(d % 11 == 2, 404)
              .when(d % 11 == 3, 503).when(d % 11 == 4, 403).otherwise(200))
    s = _canonical_urls(spark, sf_dir).select(
        "doc_id", "url", status.alias("status_code"))
    return s.select(
        "doc_id", "status_code",
        F.array_join(status_warnings_col(
            F.col("status_code"), F.col("url"), F.col("url")), " | ")
        .alias("warnings"))


@q("c22_risk_score", """
WITH m AS (SELECT doc_id, doc_id % 4 AS critical_mixed, doc_id % 3 AS passive_mixed,
                  doc_id % 6 AS missing_headers
           FROM documents)
SELECT doc_id,
  least((critical_mixed * 2 + passive_mixed + missing_headers * 3) * 10, 100)
    AS risk_score,
  CASE WHEN least((critical_mixed*2 + passive_mixed + missing_headers*3)*10, 100) >= 70
         THEN 'high'
       WHEN least((critical_mixed*2 + passive_mixed + missing_headers*3)*10, 100) >= 40
         THEN 'medium'
       ELSE 'low' END AS risk_level
FROM m
""")
def c22_risk_score(spark, sf_dir):
    """C22: the risk formula (status_analyzer.py:326-353)."""
    d = F.col("doc_id")
    m = _t(spark, sf_dir, "documents").select(
        "doc_id", (d % 4).alias("critical_mixed"),
        (d % 3).alias("passive_mixed"), (d % 6).alias("missing_headers"))
    score = F.least(
        (F.col("critical_mixed") * 2 + F.col("passive_mixed")
         + F.col("missing_headers") * 3) * 10, F.lit(100))
    return m.select(
        "doc_id", score.alias("risk_score"),
        F.when(score >= 70, "high").when(score >= 40, "medium")
        .otherwise("low").alias("risk_level"))


# ===========================================================================
# Text analysis (training-data ops; operators/text.py)
# ===========================================================================

@q("t_token_count", r"""
SELECT doc_id,
  CASE WHEN trim(text) = '' THEN 0
       ELSE len(string_split_regex(trim(text), '\s+')) END::BIGINT AS n_tokens,
  greatest(
    CASE WHEN trim(text) = '' THEN 0
         ELSE len(string_split_regex(trim(text), '\s+')) END,
    ceil(length(text) / 3.6))::BIGINT AS subword_tokens
FROM documents
""")
def t_token_count(spark, sf_dir):
    """Token counting: whitespace + BPE-ish subword estimate."""
    from ..operators.text import subword_estimate_col, token_count_col
    d = _t(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        token_count_col(F.col("text")).cast("long").alias("n_tokens"),
        subword_estimate_col(F.col("text")).cast("long")
        .alias("subword_tokens"))


@q("t_quality_ratios", r"""
SELECT doc_id,
  length(text)::BIGINT AS n_chars_m,
  round(length(regexp_replace(text, '[\p{L}\p{N}\s]', '', 'g'))
        / greatest(length(text), 1), 6) AS punct_ratio,
  round(length(regexp_replace(text, '[^0-9]', '', 'g'))
        / greatest(length(text), 1), 6) AS digit_ratio,
  round(length(regexp_replace(text, '[^A-Z]', '', 'g'))
        / greatest(length(text), 1), 6) AS upper_ratio
FROM documents
""")
def t_quality_ratios(spark, sf_dir):
    """Quality-signal ratios (JVM regex, codegen'd)."""
    from ..operators.text import quality_columns
    d = _t(spark, sf_dir, "documents")
    qc = quality_columns(F.col("text"))
    return d.select(
        "doc_id", qc["n_chars_m"].cast("long").alias("n_chars_m"),
        qc["punct_ratio"].alias("punct_ratio"),
        qc["digit_ratio"].alias("digit_ratio"),
        qc["upper_ratio"].alias("upper_ratio"))


def _marker_sql(lang_words: list[str]) -> str:
    padded = ("' ' || regexp_replace(lower(text), '[^\\p{L}\\p{N} ]', ' ', 'g')"
              " || ' '")
    terms = [
        f"((length({padded}) - length(replace({padded}, ' {w} ', '')))"
        f" // {len(w) + 2})"
        for w in lang_words
    ]
    return "(" + " + ".join(terms) + ")"


@q("t_language_id", f"""
WITH m AS (SELECT doc_id,
  {_marker_sql(['the', 'and', 'of', 'to', 'is', 'with', 'that'])} AS en,
  {_marker_sql(['de', 'que', 'não', 'uma', 'para', 'com', 'os'])} AS pt,
  {_marker_sql(['el', 'la', 'los', 'las', 'una', 'por', 'para'])} AS es
FROM documents)
SELECT doc_id,
  CASE WHEN en >= pt AND en >= es AND en > 0 THEN 'en'
       WHEN pt >= es AND pt > 0 THEN 'pt'
       WHEN es > 0 THEN 'es'
       ELSE 'und' END AS lang_id
FROM m
""")
def t_language_id(spark, sf_dir):
    """Language-ID heuristic via stopword hit counts."""
    from ..operators.text import language_id_col
    return _t(spark, sf_dir, "documents").select(
        "doc_id", language_id_col(F.col("text")).alias("lang_id"))


@q("t_fingerprint_exact_dedup", r"""
WITH fp AS (SELECT doc_id,
    md5(trim(regexp_replace(regexp_replace(lower(text), '[^\p{L}\p{N}]+', ' ', 'g'),
                            '\s+', ' ', 'g'))) AS fingerprint
  FROM (SELECT doc_id,
          CASE WHEN doc_id % 10 < 2
               THEN 'bloco duplicado para teste de dedup exato'
               ELSE text END AS text
        FROM documents))
SELECT fingerprint, count(*) AS dup_count, min(doc_id) AS keeper_id
FROM fp GROUP BY fingerprint HAVING count(*) > 1
""")
def t_fingerprint_exact_dedup(spark, sf_dir):
    """Exact dedup by content fingerprint (derived duplicates planted on
    doc_id % 10 < 2)."""
    from ..operators.dedup import exact_duplicates
    d = _t(spark, sf_dir, "documents").select(
        "doc_id",
        F.when(F.col("doc_id") % 10 < 2,
               "bloco duplicado para teste de dedup exato")
        .otherwise(F.col("text")).alias("text"))
    return (exact_duplicates(d).select("fp", "dup_count", "keeper_id")
            .withColumnRenamed("fp", "fingerprint"))


# ===========================================================================
# Dedup families (operators/dedup.py) — cross-engine md5-based hashing
# ===========================================================================

def _minhash_sql(k: int) -> str:
    from ..operators.dedup import MERSENNE31, minhash_params
    params = minhash_params(k)
    norm = (r"trim(regexp_replace(regexp_replace(lower(text), "
            r"'[^\p{L}\p{N}]+', ' ', 'g'), '\s+', ' ', 'g'))")
    cols = ", ".join(
        f"list_aggregate(list_transform(hh, h -> ({a} * h + {b}) % "
        f"{MERSENNE31}), 'min') AS mh{i}"
        for i, (a, b) in enumerate(params))
    return f"""
WITH norm AS (SELECT doc_id, {norm} AS t FROM documents WHERE doc_id < 100),
sh AS (SELECT doc_id,
        list_transform(range(1, greatest(length(t) - 4, 1) + 1),
                       i -> substr(t, i::INT, 5)) AS shingles
       FROM norm),
hs AS (SELECT doc_id,
        list_transform(shingles,
                       s -> ('0x' || substr(md5(s), 1, 8))::BIGINT
                            % {MERSENNE31}) AS hh
       FROM sh)
SELECT doc_id, {cols} FROM hs
"""


@q("d_minhash_signatures", _minhash_sql(4))
def d_minhash_signatures(spark, sf_dir):
    """MinHash signatures (k=4 exposed as columns for the value-hash
    compare; the engine uses k=32 arrays)."""
    from ..operators.dedup import minhash_signatures
    d = _t(spark, sf_dir, "documents").filter("doc_id < 100")
    sig = minhash_signatures(d, k=4)
    return sig.select(
        "doc_id",
        *[F.col("signature").getItem(i).alias(f"mh{i}") for i in range(4)])


@q("d_simhash", r"""
WITH norm AS (SELECT doc_id,
    trim(regexp_replace(regexp_replace(lower(text), '[^\p{L}\p{N}]+', ' ', 'g'),
                        '\s+', ' ', 'g')) AS t
  FROM documents WHERE doc_id < 100),
hs AS (SELECT doc_id,
        list_transform(list_filter(string_split(t, ' '), x -> x <> ''),
                       tk -> ('0x' || substr(md5(tk), 1, 8))::BIGINT) AS hh
       FROM norm)
SELECT doc_id,
  list_aggregate(list_transform(range(0, 32), b ->
    (CASE WHEN 2 * list_aggregate(
              list_transform(hh, h -> (floor(h / (2::BIGINT ^ b)))::BIGINT % 2),
              'sum') > len(hh)
          THEN 1::BIGINT ELSE 0::BIGINT END) * (1::BIGINT << (31 - b)::INT)),
    'sum')::BIGINT AS simhash
FROM hs
""")
def d_simhash(spark, sf_dir):
    """SimHash (32-bit) per document."""
    from ..operators.dedup import simhash64
    return (_t(spark, sf_dir, "documents").filter("doc_id < 100")
            .select("doc_id", simhash64(F.col("text")).alias("simhash")))


@q("d_ngram_jaccard_pairs", r"""
WITH base AS (SELECT a.doc_id,
    CASE WHEN a.doc_id % 2 = 1 THEN b.text ELSE a.text END AS text
  FROM documents a JOIN documents b
    ON b.doc_id = a.doc_id - (a.doc_id % 2)
  WHERE a.doc_id < 60),
norm AS (SELECT doc_id,
    trim(regexp_replace(regexp_replace(lower(text), '[^\p{L}\p{N}]+', ' ', 'g'),
                        '\s+', ' ', 'g')) AS t FROM base),
sh AS (SELECT doc_id, unnest(list_distinct(
        list_transform(range(1, greatest(length(t) - 4, 1) + 1),
                       i -> substr(t, i::INT, 5)))) AS s
       FROM norm),
sizes AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id),
inter AS (SELECT l.doc_id AS id_a, r.doc_id AS id_b, count(*) AS n_common
          FROM sh l JOIN sh r ON l.s = r.s AND l.doc_id < r.doc_id
          GROUP BY 1, 2)
SELECT id_a, id_b,
       round(n_common / (sa.n_sh + sb.n_sh - n_common), 6) AS jaccard
FROM inter JOIN sizes sa ON sa.doc_id = id_a
           JOIN sizes sb ON sb.doc_id = id_b
WHERE n_common / (sa.n_sh + sb.n_sh - n_common) >= 0.6
""")
def d_ngram_jaccard_pairs(spark, sf_dir):
    """Exact n-gram Jaccard pairs (odd docs take their even neighbor's text
    → planted near-identical pairs)."""
    from ..operators.dedup import ngram_jaccard_pairs
    a = _t(spark, sf_dir, "documents").alias("a").filter("doc_id < 60")
    b = _t(spark, sf_dir, "documents").alias("b")
    base = (a.join(b, F.col("b.doc_id")
                   == F.col("a.doc_id") - (F.col("a.doc_id") % 2))
            .select(F.col("a.doc_id").alias("doc_id"),
                    F.when(F.col("a.doc_id") % 2 == 1, F.col("b.text"))
                    .otherwise(F.col("a.text")).alias("text")))
    return ngram_jaccard_pairs(base, threshold=0.6)


def _capped_lsh_sql(k: int, bands: int, cap: int) -> str:
    """Banded-MinHash pairs WITH the hot-bucket star guard, in DuckDB —
    the oracle for ``lsh_candidate_pairs(max_bucket=cap)`` on a
    template-degenerate corpus (every even doc shares doc 0's text, so
    half the corpus collides on every band key). Buckets at or under the
    cap self-join all-pairs; hot buckets emit only (min-id, member) star
    pairs — the exact semantics of guarded_band_pairs."""
    from ..operators.dedup import MERSENNE31, minhash_params
    params = minhash_params(k)
    norm = (r"trim(regexp_replace(regexp_replace(lower(text), "
            r"'[^\p{L}\p{N}]+', ' ', 'g'), '\s+', ' ', 'g'))")
    mh_cols = ", ".join(
        f"list_aggregate(list_transform(hh, h -> ({a} * h + {b}) % "
        f"{MERSENNE31}), 'min') AS mh{i}"
        for i, (a, b) in enumerate(params))
    rpb = k // bands
    band_rows = "\n  UNION ALL ".join(
        f"SELECT doc_id, {b} AS band, "
        + " || ',' || ".join(f"mh{b * rpb + r}::VARCHAR" for r in range(rpb))
        + " AS key FROM sig"
        for b in range(bands))
    return f"""
WITH base AS (SELECT a.doc_id,
    CASE WHEN a.doc_id % 2 = 0 THEN z.text ELSE a.text END AS text
  FROM documents a CROSS JOIN (SELECT text FROM documents
                               WHERE doc_id = 0) z
  WHERE a.doc_id < 100),
norm AS (SELECT doc_id, {norm} AS t FROM base),
sh AS (SELECT doc_id,
        list_transform(range(1, greatest(length(t) - 4, 1) + 1),
                       i -> substr(t, i::INT, 5)) AS shingles
       FROM norm),
hs AS (SELECT doc_id,
        list_transform(shingles,
                       s -> ('0x' || substr(md5(s), 1, 8))::BIGINT
                            % {MERSENNE31}) AS hh
       FROM sh),
sig AS (SELECT doc_id, {mh_cols} FROM hs),
banded AS ({band_rows}),
counted AS (SELECT band, key, count(*) AS bn, min(doc_id) AS rep
            FROM banded GROUP BY band, key),
normal AS (
  SELECT l.doc_id AS id_a, r.doc_id AS id_b
  FROM banded l JOIN banded r
    ON l.band = r.band AND l.key = r.key AND l.doc_id < r.doc_id
  JOIN counted c ON c.band = l.band AND c.key = l.key
  WHERE c.bn <= {cap}),
star AS (
  SELECT c.rep AS id_a, b.doc_id AS id_b
  FROM banded b JOIN counted c ON c.band = b.band AND c.key = b.key
  WHERE c.bn > {cap} AND b.doc_id <> c.rep)
SELECT DISTINCT id_a, id_b FROM normal
UNION
SELECT DISTINCT id_a, id_b FROM star
"""


@q("d_lsh_capped_pairs", _capped_lsh_sql(8, 4, 20))
def d_lsh_capped_pairs(spark, sf_dir):
    """Hot-bucket-guarded LSH pairs (r5): a template-degenerate corpus —
    every even doc carries doc 0's text, a 50-doc clique colliding on
    every band key — goes through ``lsh_candidate_pairs`` with
    ``max_bucket=20``. The clique's buckets exceed the cap and take the
    linear star path ((0, member) pairs); odd docs keep exact all-pairs
    semantics. The oracle states the identical cap semantics in SQL."""
    from ..operators.dedup import lsh_candidate_pairs, minhash_signatures
    d = _t(spark, sf_dir, "documents")
    z = d.filter("doc_id = 0").select(F.col("text").alias("_z"))
    base = (d.filter("doc_id < 100").crossJoin(F.broadcast(z))
            .select("doc_id",
                    F.when(F.col("doc_id") % 2 == 0, F.col("_z"))
                    .otherwise(F.col("text")).alias("text")))
    sigs = minhash_signatures(base, k=8)
    return lsh_candidate_pairs(sigs, bands=4, max_bucket=20)


def _incremental_lsh_sql(k: int, bands: int) -> str:
    """Full-corpus banded-MinHash pair set in DuckDB — the oracle for the
    incremental two-batch ingest, whose pair union must equal it. Band keys
    join on the raw slice string (md5 equality ⟺ string equality)."""
    from ..operators.dedup import MERSENNE31, minhash_params
    params = minhash_params(k)
    norm = (r"trim(regexp_replace(regexp_replace(lower(text), "
            r"'[^\p{L}\p{N}]+', ' ', 'g'), '\s+', ' ', 'g'))")
    mh_cols = ", ".join(
        f"list_aggregate(list_transform(hh, h -> ({a} * h + {b}) % "
        f"{MERSENNE31}), 'min') AS mh{i}"
        for i, (a, b) in enumerate(params))
    rpb = k // bands
    band_rows = "\n  UNION ALL ".join(
        f"SELECT doc_id, {b} AS band, "
        + " || ',' || ".join(f"mh{b * rpb + r}::VARCHAR" for r in range(rpb))
        + " AS key FROM sig"
        for b in range(bands))
    return f"""
WITH base AS (SELECT a.doc_id,
    CASE WHEN a.doc_id % 2 = 1 THEN b.text ELSE a.text END AS text
  FROM documents a JOIN documents b
    ON b.doc_id = a.doc_id - (a.doc_id % 2)
  WHERE a.doc_id < 100),
norm AS (SELECT doc_id, {norm} AS t FROM base),
sh AS (SELECT doc_id,
        list_transform(range(1, greatest(length(t) - 4, 1) + 1),
                       i -> substr(t, i::INT, 5)) AS shingles
       FROM norm),
hs AS (SELECT doc_id,
        list_transform(shingles,
                       s -> ('0x' || substr(md5(s), 1, 8))::BIGINT
                            % {MERSENNE31}) AS hh
       FROM sh),
sig AS (SELECT doc_id, {mh_cols} FROM hs),
banded AS ({band_rows})
SELECT DISTINCT l.doc_id AS id_a, r.doc_id AS id_b
FROM banded l JOIN banded r
  ON l.band = r.band AND l.key = r.key AND l.doc_id < r.doc_id
"""


@q("d_incremental_lsh_pairs", _incremental_lsh_sql(8, 4))
def d_incremental_lsh_pairs(spark, sf_dir):
    """INCREMENTAL LSH dedup: two batches ingested against the persisted
    signature index (operators/incremental.py). Round 0 ingests docs
    0-49, round 1 ingests 50-99 computing ONLY their signatures and
    joining against the round-0 snapshot (Iceberg fast-append: round 1
    writes O(batch) files). The union of per-round pairs must equal the
    full-corpus recompute — exactly what the oracle states. Odd docs take
    their even neighbor's text, planting (2i, 2i+1) exact-dup pairs in
    both halves."""
    import tempfile

    from ..operators.incremental import SignatureIndex
    from ..tables import SnapshotStore
    a = _t(spark, sf_dir, "documents").alias("a").filter("doc_id < 100")
    b = _t(spark, sf_dir, "documents").alias("b")
    base = (a.join(b, F.col("b.doc_id")
                   == F.col("a.doc_id") - (F.col("a.doc_id") % 2))
            .select(F.col("a.doc_id").alias("doc_id"),
                    F.when(F.col("a.doc_id") % 2 == 1, F.col("b.text"))
                    .otherwise(F.col("a.text")).alias("text")))
    idx = SignatureIndex.oracle_parity(
        SnapshotStore(tempfile.mkdtemp(prefix="sigidx_dq_")), k=8, bands=4)
    p1 = idx.ingest(spark, base.filter("doc_id < 50"))
    p2 = idx.ingest(spark, base.filter("doc_id >= 50"))
    return p1.unionByName(p2)


def _emb_inc_sql(dim: int, n_planes: int, threshold: float) -> str:
    """Full-corpus hyperplane-bucket-blocked cosine pairs in DuckDB — the
    oracle for the incremental embedding ingest. The seeded plane matrix
    is embedded as literals (the same constants the broadcast UDF uses);
    bucket bit i = sign(v · plane_i), plane 0 the MSB."""
    from ..operators.similarity import hyperplanes
    planes = hyperplanes(dim, n_planes, 42)
    bucket = " + ".join(
        f"(CASE WHEN list_dot_product(ev, [{', '.join(repr(x) for x in p)}])"
        f" >= 0 THEN {1 << (n_planes - 1 - i)} ELSE 0 END)"
        for i, p in enumerate(planes))
    return f"""
WITH v AS (SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS ev
           FROM embeddings),
b AS (SELECT vec_id, ev, {bucket} AS bucket FROM v),
pairs AS (
  SELECT l.vec_id AS id_a, r.vec_id AS id_b,
         round(list_dot_product(l.ev, r.ev)
               / (sqrt(list_dot_product(l.ev, l.ev))
                  * sqrt(list_dot_product(r.ev, r.ev))), 6) AS cosine
  FROM b l JOIN b r ON l.bucket = r.bucket AND l.vec_id < r.vec_id)
SELECT id_a, id_b, cosine FROM pairs WHERE cosine >= {threshold}
"""


@q("d_incremental_embedding_pairs", _emb_inc_sql(64, 6, 0.2))
def d_incremental_embedding_pairs(spark, sf_dir):
    """INCREMENTAL embedding cosine near-dup (third dedup family): two
    batches ingested against the persisted (id, embedding, bucket) index
    — hyperplane buckets fixed at index construction, exact rounded
    cosine ≥ 0.2 inside buckets, union of per-round pairs == the
    full-corpus bucket-blocked recompute the oracle states."""
    import tempfile

    from ..operators.incremental import EmbeddingIndex
    from ..tables import SnapshotStore
    emb = _t(spark, sf_dir, "embeddings")
    idx = EmbeddingIndex(
        SnapshotStore(tempfile.mkdtemp(prefix="eidx_dq_")),
        dim=64, n_planes=6, threshold=0.2)
    p1 = idx.ingest(spark, emb.filter("vec_id < 250"))
    p2 = idx.ingest(spark, emb.filter("vec_id >= 250"))
    return p1.unionByName(p2)


@q("d_repeated_spans", r"""
WITH base AS (SELECT a.doc_id,
    CASE WHEN a.doc_id % 2 = 1 THEN b.text ELSE a.text END AS text
  FROM documents a JOIN documents b
    ON b.doc_id = a.doc_id - (a.doc_id % 2)
  WHERE a.doc_id < 100),
norm AS (SELECT doc_id,
    trim(regexp_replace(regexp_replace(lower(text), '[^\p{L}\p{N}]+', ' ', 'g'),
                        '\s+', ' ', 'g')) AS t
  FROM base),
occ AS (SELECT doc_id, p AS pos, md5(substr(t, p::INT, 40)) AS h
        FROM norm CROSS JOIN (SELECT unnest(range(1, 100000)) AS p) u
        WHERE length(t) > 0 AND p <= greatest(length(t) - 39, 1)),
cnt AS (SELECT h, count(*) AS n FROM occ GROUP BY h)
SELECT doc_id, count(*)::BIGINT AS n_spans,
       sum(CASE WHEN n > 1 THEN 1 ELSE 0 END)::BIGINT AS n_repeated,
       round(sum(CASE WHEN n > 1 THEN 1 ELSE 0 END)::DOUBLE / count(*), 6)
         AS repeat_ratio
FROM occ JOIN cnt USING (h) GROUP BY doc_id
""")
def d_repeated_spans(spark, sf_dir):
    """SUBSTRING-level repetition (finer than paragraphs), DENSE
    stride-1 windows — the exact mode: a 40-char window is repeated iff
    its hash occurs ≥2 times anywhere in the corpus, wherever it sits.
    Odd docs take their even neighbor's text, so their every window
    repeats (ratio 1.0); unrelated docs repeat only by chance."""
    from ..operators.paragraph import repeated_span_stats
    a = _t(spark, sf_dir, "documents").alias("a").filter("doc_id < 100")
    b = _t(spark, sf_dir, "documents").alias("b")
    base = (a.join(b, F.col("b.doc_id")
                   == F.col("a.doc_id") - (F.col("a.doc_id") % 2))
            .select(F.col("a.doc_id").alias("doc_id"),
                    F.when(F.col("a.doc_id") % 2 == 1, F.col("b.text"))
                    .otherwise(F.col("a.text")).alias("text")))
    return repeated_span_stats(base, width=40, stride=1)


@q("d_repeated_spans_sampled", r"""
WITH base AS (SELECT a.doc_id,
    CASE WHEN a.doc_id % 2 = 1 THEN b.text ELSE a.text END AS text
  FROM documents a JOIN documents b
    ON b.doc_id = a.doc_id - (a.doc_id % 2)
  WHERE a.doc_id < 100),
norm AS (SELECT doc_id,
    trim(regexp_replace(regexp_replace(lower(text), '[^\p{L}\p{N}]+', ' ', 'g'),
                        '\s+', ' ', 'g')) AS t
  FROM base),
occ AS (SELECT doc_id, p AS pos, md5(substr(t, p::INT, 40)) AS h
        FROM norm CROSS JOIN (SELECT unnest(range(1, 100000)) AS p) u
        WHERE length(t) > 0 AND p <= greatest(length(t) - 39, 1)
          AND ('0x' || substr(md5(substr(t, p::INT, 40)), 1, 8))::BIGINT
              % 8 = 0),
cnt AS (SELECT h, count(*) AS n FROM occ GROUP BY h)
SELECT doc_id, count(*)::BIGINT AS n_spans,
       sum(CASE WHEN n > 1 THEN 1 ELSE 0 END)::BIGINT AS n_repeated,
       round(sum(CASE WHEN n > 1 THEN 1 ELSE 0 END)::DOUBLE / count(*), 6)
         AS repeat_ratio
FROM occ JOIN cnt USING (h) GROUP BY doc_id
""")
def d_repeated_spans_sampled(spark, sf_dir):
    """Substring repetition at SCALE density: content-defined mod-hash
    sampling (keep windows whose 32-bit md5 prefix ≡ 0 mod 8 — expected
    1/8 of the dense rows, alignment-robust because selection depends on
    content alone). Stats over the SAMPLED occurrence set; the oracle
    applies the identical mod rule. Documents with no selected window
    produce no row on either engine."""
    from ..operators.paragraph import repeated_span_stats
    a = _t(spark, sf_dir, "documents").alias("a").filter("doc_id < 100")
    b = _t(spark, sf_dir, "documents").alias("b")
    base = (a.join(b, F.col("b.doc_id")
                   == F.col("a.doc_id") - (F.col("a.doc_id") % 2))
            .select(F.col("a.doc_id").alias("doc_id"),
                    F.when(F.col("a.doc_id") % 2 == 1, F.col("b.text"))
                    .otherwise(F.col("a.text")).alias("text")))
    return repeated_span_stats(base, width=40, stride=1, sample_mod=8)


@q("d_repeated_span_extents", r"""
WITH base AS (SELECT a.doc_id,
    CASE WHEN a.doc_id % 2 = 1 THEN b.text ELSE a.text END AS text
  FROM documents a JOIN documents b
    ON b.doc_id = a.doc_id - (a.doc_id % 2)
  WHERE a.doc_id < 100),
norm AS (SELECT doc_id,
    trim(regexp_replace(regexp_replace(lower(text), '[^\p{L}\p{N}]+', ' ', 'g'),
                        '\s+', ' ', 'g')) AS t
  FROM base),
occ AS (SELECT doc_id, p AS pos, md5(substr(t, p::INT, 40)) AS h
        FROM norm CROSS JOIN (SELECT unnest(range(1, 100000)) AS p) u
        WHERE length(t) > 0 AND p <= greatest(length(t) - 39, 1)),
cnt AS (SELECT h, count(*) AS n FROM occ GROUP BY h),
rep AS (SELECT doc_id, pos FROM occ JOIN cnt USING (h) WHERE n > 1),
flg AS (SELECT doc_id, pos,
    CASE WHEN max(pos + 39) OVER prior IS NULL
           OR pos > max(pos + 39) OVER prior + 1 THEN 1 ELSE 0 END AS nw
  FROM rep
  WINDOW prior AS (PARTITION BY doc_id ORDER BY pos
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)),
grp AS (SELECT doc_id, pos,
    sum(nw) OVER (PARTITION BY doc_id ORDER BY pos) AS isl
  FROM flg)
SELECT doc_id, min(pos)::INT AS start_pos, (max(pos) + 39)::INT AS end_pos,
       (max(pos) + 39 - min(pos) + 1)::INT AS span_len,
       count(*)::BIGINT AS n_windows
FROM grp GROUP BY doc_id, isl
""")
def d_repeated_span_extents(spark, sf_dir):
    """Maximal repeated character ranges (the exact-extent pass after
    span-repetition flagging): dense stride-1 windows, corpus-repeated
    windows become intervals, overlapping-or-touching intervals merge
    (gaps-and-islands) into (start, end, length, window-count) extents
    over the normalized text. Odd docs mirror their even neighbor, so
    both carry one full-text extent; unrelated docs only chance ones."""
    from ..operators.paragraph import repeated_span_extents
    a = _t(spark, sf_dir, "documents").alias("a").filter("doc_id < 100")
    b = _t(spark, sf_dir, "documents").alias("b")
    base = (a.join(b, F.col("b.doc_id")
                   == F.col("a.doc_id") - (F.col("a.doc_id") % 2))
            .select(F.col("a.doc_id").alias("doc_id"),
                    F.when(F.col("a.doc_id") % 2 == 1, F.col("b.text"))
                    .otherwise(F.col("a.text")).alias("text")))
    return repeated_span_extents(base, width=40)


@q("s_pq_encode", """
WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS ev FROM embeddings),
b AS (SELECT unnest(range(0, 8))::INT AS block),
cbase AS (SELECT vec_id AS code, embedding::DOUBLE[] AS cv
          FROM embeddings WHERE vec_id < 16),
vb AS (SELECT v.vec_id, b.block,
              list_slice(ev, b.block * 8 + 1, b.block * 8 + 8) AS sv
       FROM v CROSS JOIN b),
cb AS (SELECT c.code, b.block,
              list_slice(cv, b.block * 8 + 1, b.block * 8 + 8) AS cs
       FROM cbase c CROSS JOIN b),
scored AS (SELECT vb.vec_id, vb.block, cb.code,
    list_dot_product(sv, sv) + list_dot_product(cs, cs)
      - 2 * list_dot_product(sv, cs) AS d
  FROM vb JOIN cb USING (block))
SELECT vec_id, block, code::INT AS code FROM (
  SELECT vec_id, block, code,
         row_number() OVER (PARTITION BY vec_id, block
                            ORDER BY d ASC, code ASC) AS rn
  FROM scored) WHERE rn = 1
""")
def s_pq_encode(spark, sf_dir):
    """Product-quantization encoding with an EXPLICIT codebook (blocks
    of the first 16 vectors — the IVF-oracle convention) so DuckDB can
    reproduce every per-block L2 argmin independently: both engines use
    the expanded |x|²+|c|²−2x·c form in double, ties to the lowest
    code. Output exploded to (vec_id, block, code). Codebook TRAINING
    and ADC search stay pytest-proven (training is iterative; search
    recall <1 by design — same split as IVF/LSH)."""
    from ..operators.quantization import pq_encode_with, pq_seed_codebook
    emb = _t(spark, sf_dir, "embeddings")
    cb = pq_seed_codebook(emb, m=8, k=16)
    return (pq_encode_with(emb, cb)
            .select("vec_id", F.posexplode("codes")
                    .alias("block", "code")))


@q("t_gopher_repetition", r"""
WITH base AS (SELECT doc_id,
    CASE WHEN doc_id % 7 = 0
      THEN text || chr(10) || 'repeated filler line' || chr(10)
           || 'repeated filler line' || chr(10) || 'repeated filler line'
      ELSE text END AS text
  FROM documents),
norm AS (SELECT doc_id, text,
    trim(regexp_replace(regexp_replace(lower(text), '[^\p{L}\p{N}]+', ' ', 'g'),
                        '\s+', ' ', 'g')) AS nm
  FROM base),
ln AS (SELECT doc_id, trim(x) AS p
       FROM norm, unnest(string_split(text, chr(10))) AS u(x)
       WHERE trim(x) <> ''),
lg AS (SELECT doc_id, p, count(*) AS c FROM ln GROUP BY doc_id, p),
lstat AS (SELECT doc_id,
    round(sum(CASE WHEN c > 1 THEN c - 1 ELSE 0 END)::DOUBLE
          / sum(c), 6) AS dup_line_frac,
    CASE WHEN sum(c * length(p)) = 0 THEN 0.0
         ELSE round(sum(CASE WHEN c > 1 THEN (c - 1) * length(p)
                        ELSE 0 END)::DOUBLE / sum(c * length(p)), 6)
    END AS dup_line_char_frac
  FROM lg GROUP BY doc_id),
pr AS (SELECT doc_id, trim(x) AS p
       FROM norm, unnest(string_split(text, chr(10) || chr(10))) AS u(x)
       WHERE trim(x) <> ''),
pg AS (SELECT doc_id, p, count(*) AS c FROM pr GROUP BY doc_id, p),
pstat AS (SELECT doc_id,
    round(sum(CASE WHEN c > 1 THEN c - 1 ELSE 0 END)::DOUBLE
          / sum(c), 6) AS dup_para_frac,
    CASE WHEN sum(c * length(p)) = 0 THEN 0.0
         ELSE round(sum(CASE WHEN c > 1 THEN (c - 1) * length(p)
                        ELSE 0 END)::DOUBLE / sum(c * length(p)), 6)
    END AS dup_para_char_frac
  FROM pg GROUP BY doc_id),
tk AS (SELECT doc_id, string_split(nm, ' ') AS toks, length(nm) AS n_ch
       FROM norm WHERE length(nm) > 0),
g2 AS (SELECT doc_id, n_ch,
              array_to_string(list_slice(toks, i, i + 1), ' ') AS g
       FROM tk CROSS JOIN (SELECT unnest(range(1, 100000)) AS i) u
       WHERE i + 1 <= len(toks)),
g2c AS (SELECT doc_id, n_ch, g, count(*) AS c
        FROM g2 GROUP BY doc_id, n_ch, g),
t2 AS (SELECT doc_id, round(max(c * length(g))::DOUBLE / n_ch, 6)
         AS top2gram_char_frac
       FROM g2c GROUP BY doc_id, n_ch),
g5 AS (SELECT doc_id, n_ch,
              array_to_string(list_slice(toks, i, i + 4), ' ') AS g
       FROM tk CROSS JOIN (SELECT unnest(range(1, 100000)) AS i) u
       WHERE i + 4 <= len(toks)),
g5c AS (SELECT doc_id, n_ch, g, count(*) AS c
        FROM g5 GROUP BY doc_id, n_ch, g),
d5 AS (SELECT doc_id,
    round(sum(CASE WHEN c > 1 THEN c * length(g) ELSE 0 END)::DOUBLE
          / n_ch, 6) AS dup5gram_char_frac
       FROM g5c GROUP BY doc_id, n_ch)
SELECT b.doc_id,
       coalesce(l.dup_line_frac, 0.0) AS dup_line_frac,
       coalesce(l.dup_line_char_frac, 0.0) AS dup_line_char_frac,
       coalesce(ps.dup_para_frac, 0.0) AS dup_para_frac,
       coalesce(ps.dup_para_char_frac, 0.0) AS dup_para_char_frac,
       coalesce(t2.top2gram_char_frac, 0.0) AS top2gram_char_frac,
       coalesce(d5.dup5gram_char_frac, 0.0) AS dup5gram_char_frac,
       (coalesce(l.dup_line_frac, 0.0) <= 0.30
        AND coalesce(l.dup_line_char_frac, 0.0) <= 0.20
        AND coalesce(ps.dup_para_frac, 0.0) <= 0.30
        AND coalesce(ps.dup_para_char_frac, 0.0) <= 0.20
        AND coalesce(t2.top2gram_char_frac, 0.0) <= 0.20
        AND coalesce(d5.dup5gram_char_frac, 0.0) <= 0.15)
         AS keep_repetition
FROM base b
LEFT JOIN lstat l USING (doc_id) LEFT JOIN pstat ps USING (doc_id)
LEFT JOIN t2 USING (doc_id) LEFT JOIN d5 USING (doc_id)
""")
def t_gopher_repetition(spark, sf_dir):
    """Within-document repetition rules (Gopher second half): duplicate
    line/paragraph fractions (count- and char-weighted), top-2-gram
    char coverage, duplicated-5-gram char coverage, and the combined
    keep flag. Every seventh doc gets three injected duplicate lines."""
    from ..operators.text import gopher_repetition_flags
    d = _t(spark, sf_dir, "documents")
    base = d.select(
        "doc_id",
        F.when(F.col("doc_id") % 7 == 0,
               F.concat(F.col("text"),
                        F.lit("\nrepeated filler line\nrepeated filler "
                              "line\nrepeated filler line")))
        .otherwise(F.col("text")).alias("text"))
    return gopher_repetition_flags(base).select(
        "doc_id", "dup_line_frac", "dup_line_char_frac", "dup_para_frac",
        "dup_para_char_frac", "top2gram_char_frac", "dup5gram_char_frac",
        "keep_repetition")


@q("t_pii_scrub", r"""
WITH base AS (SELECT doc_id,
    text || CASE WHEN doc_id % 5 = 0
      THEN ' contact u' || doc_id::VARCHAR || '@ex.com or +1555'
           || lpad(doc_id::VARCHAR, 7, '0') || ' ip 10.0.'
           || (doc_id % 256)::VARCHAR || '.7'
      ELSE '' END AS text
  FROM documents),
s AS (SELECT doc_id,
    len(regexp_extract_all(text,
        '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}'))::INT
      AS n_email,
    len(regexp_extract_all(text,
        '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b'))::INT AS n_ipv4,
    len(regexp_extract_all(text, '\+\d[\d().-]{7,}\d'))::INT AS n_phone,
    regexp_replace(regexp_replace(regexp_replace(text,
        '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
        '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b', '<IP>', 'g'),
        '\+\d[\d().-]{7,}\d', '<PHONE>', 'g') AS text_scrubbed
  FROM base)
SELECT doc_id, text_scrubbed, n_email, n_ipv4, n_phone FROM s
""")
def t_pii_scrub(spark, sf_dir):
    """PII redaction (emails / IPv4 / international phones → tokens)
    with per-kind counts — every fifth doc carries synthesized PII, the
    rest only chance matches. Patterns are Java-regex/RE2 portable (no
    lookbehind/backrefs) so the DuckDB oracle reproduces the scrub
    byte-for-byte."""
    from ..operators.text import scrub_pii
    d = _t(spark, sf_dir, "documents")
    base = d.select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.when(F.col("doc_id") % 5 == 0,
                   F.concat(F.lit(" contact u"),
                            F.col("doc_id").cast("string"),
                            F.lit("@ex.com or +1555"),
                            F.lpad(F.col("doc_id").cast("string"), 7,
                                   "0"),
                            F.lit(" ip 10.0."),
                            (F.col("doc_id") % 256).cast("string"),
                            F.lit(".7")))
            .otherwise(F.lit(""))).alias("text"))
    return scrub_pii(base).select("doc_id", "text_scrubbed", "n_email",
                                  "n_ipv4", "n_phone")


@q("t_gopher_quality_flags", r"""
WITH base AS (SELECT doc_id, text FROM documents),
feat AS (SELECT doc_id,
    CASE WHEN trim(text) = '' THEN []::VARCHAR[]
         ELSE string_split_regex(trim(text), '\s+') END AS words,
    list_filter(list_transform(string_split(text, chr(10)),
                               x -> trim(x)), x -> x <> '') AS lines,
    (length(text) - length(replace(text, '#', '')))::INT AS n_hash,
    ((length(text) - length(replace(text, '...', ''))) / 3)::INT AS n_ell,
    ' ' || regexp_replace(lower(text), '[^\p{L}\p{N} ]', ' ', 'g') || ' '
      AS padded
  FROM base),
m AS (SELECT doc_id,
    len(words)::INT AS n_words,
    greatest(len(words), 1) AS nw1,
    coalesce(list_sum(list_transform(words, x -> length(x))), 0)
      AS word_chars,
    n_hash, n_ell, words, lines, padded,
    greatest(len(lines), 1) AS nl1
  FROM feat),
r AS (SELECT doc_id, n_words,
    round(word_chars / nw1, 6) AS mean_word_len,
    round((n_hash + n_ell) / nw1, 6) AS symbol_ratio,
    round(len(list_filter(lines, x -> starts_with(x, '-')
          OR starts_with(x, '*') OR starts_with(x, '•'))) / nl1, 6)
      AS bullet_frac,
    round(len(list_filter(lines, x -> ends_with(x, '...')
          OR ends_with(x, '…'))) / nl1, 6) AS ellipsis_frac,
    round(len(list_filter(words, x -> regexp_matches(x, '[\p{L}]')))
          / nw1, 6) AS alpha_frac,
    (CASE WHEN contains(padded, ' the ') THEN 1 ELSE 0 END
     + CASE WHEN contains(padded, ' be ') THEN 1 ELSE 0 END
     + CASE WHEN contains(padded, ' to ') THEN 1 ELSE 0 END
     + CASE WHEN contains(padded, ' of ') THEN 1 ELSE 0 END
     + CASE WHEN contains(padded, ' and ') THEN 1 ELSE 0 END
     + CASE WHEN contains(padded, ' that ') THEN 1 ELSE 0 END
     + CASE WHEN contains(padded, ' have ') THEN 1 ELSE 0 END
     + CASE WHEN contains(padded, ' with ') THEN 1 ELSE 0 END) AS kinds
  FROM m)
SELECT doc_id, n_words, mean_word_len,
       (n_words >= 50 AND n_words <= 100000) AS pass_word_count,
       (mean_word_len >= 3.0 AND mean_word_len <= 10.0)
         AS pass_mean_word_len,
       (symbol_ratio <= 0.1) AS pass_symbol_ratio,
       (bullet_frac <= 0.9) AS pass_bullet_lines,
       (ellipsis_frac <= 0.3) AS pass_ellipsis_lines,
       (alpha_frac >= 0.8) AS pass_alpha_words,
       (kinds >= 2) AS pass_stopwords,
       ((n_words >= 50 AND n_words <= 100000)
        AND (mean_word_len >= 3.0 AND mean_word_len <= 10.0)
        AND symbol_ratio <= 0.1 AND bullet_frac <= 0.9
        AND ellipsis_frac <= 0.3 AND alpha_frac >= 0.8
        AND kinds >= 2) AS keep
FROM r
""")
def t_gopher_quality_flags(spark, sf_dir):
    """Gopher-rule document gates (published Rae et al. 2021 table-A1
    thresholds): per-rule booleans + combined keep over the documents
    table — the reject-log form a cleaning pipeline reports."""
    from ..operators.text import gopher_quality_flags
    d = _t(spark, sf_dir, "documents")
    return gopher_quality_flags(d).select(
        "doc_id", "n_words", "mean_word_len", "pass_word_count",
        "pass_mean_word_len", "pass_symbol_ratio", "pass_bullet_lines",
        "pass_ellipsis_lines", "pass_alpha_words", "pass_stopwords",
        "keep")


@q("t_sample_training_mix", r"""
WITH base AS (SELECT doc_id, 's' || (doc_id % 3)::VARCHAR AS source
              FROM documents),
rates AS (SELECT * FROM (VALUES ('s0', 1000000), ('s1', 500000),
                                ('s2', 100000)) AS t(source, ppm))
SELECT b.doc_id, b.source
FROM base b JOIN rates r USING (source)
WHERE ('0x' || substr(md5(b.doc_id::VARCHAR || ':mix-v1'), 1, 8))::BIGINT
      % 1000000 < r.ppm
""")
def t_sample_training_mix(spark, sf_dir):
    """Deterministic training-mix sampling: strata s0/s1/s2 (doc_id mod
    3) kept at 100%/50%/10% by an (id, salt) hash decision — same docs
    selected on any engine/cluster, monotone in rate."""
    from ..operators.sampling import sample_corpus_mix
    d = _t(spark, sf_dir, "documents")
    corpus = d.select(
        "doc_id",
        F.concat(F.lit("s"), (F.col("doc_id") % 3).cast("string"))
        .alias("source"))
    weights = spark.createDataFrame(
        [("s0", 1.0), ("s1", 0.5), ("s2", 0.1)], "source string, rate double")
    return sample_corpus_mix(corpus, weights, group_col="source",
                             salt="mix-v1")


@q("d_scrub_repeated_spans", r"""
WITH base AS (SELECT doc_id,
    CASE WHEN doc_id < 30
         THEN repeat('common boilerplate header block ', 8) || text
         ELSE text END AS text
  FROM documents WHERE doc_id < 100),
occ AS (SELECT doc_id, p AS pos, md5(substr(text, p::INT, 40)) AS h
        FROM base CROSS JOIN (SELECT unnest(range(1, 100000)) AS p) u
        WHERE length(text) > 0 AND p <= greatest(length(text) - 39, 1)),
cnt AS (SELECT h FROM occ GROUP BY h HAVING count(*) > 1),
rep AS (SELECT doc_id, pos FROM occ JOIN cnt USING (h)),
flg AS (SELECT doc_id, pos,
    CASE WHEN max(pos + 39) OVER prior IS NULL
           OR pos > max(pos + 39) OVER prior + 1 THEN 1 ELSE 0 END AS nw
  FROM rep
  WINDOW prior AS (PARTITION BY doc_id ORDER BY pos
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)),
grp AS (SELECT doc_id, pos,
    sum(nw) OVER (PARTITION BY doc_id ORDER BY pos) AS isl FROM flg),
ext AS (SELECT doc_id, min(pos) AS s, max(pos) + 39 AS e
        FROM grp GROUP BY doc_id, isl),
gaps AS (SELECT doc_id,
    lag(e, 1, 0) OVER (PARTITION BY doc_id ORDER BY s) + 1 AS ks,
    s - 1 AS ke FROM ext),
tails AS (SELECT e.doc_id, max(e.e) + 1 AS ks, max(length(b.text)) AS ke
          FROM ext e JOIN base b USING (doc_id) GROUP BY e.doc_id),
segs AS (SELECT doc_id, ks, ke FROM gaps WHERE ke >= ks
         UNION ALL SELECT doc_id, ks, ke FROM tails WHERE ke >= ks),
cleaned AS (SELECT s.doc_id,
    string_agg(substr(b.text, s.ks::INT, (s.ke - s.ks + 1)::INT),
               '' ORDER BY s.ks) AS text
  FROM segs s JOIN base b USING (doc_id) GROUP BY s.doc_id)
SELECT b.doc_id,
       CASE WHEN b.doc_id IN (SELECT doc_id FROM ext)
            THEN coalesce(c.text, '') ELSE b.text END AS text
FROM base b LEFT JOIN cleaned c USING (doc_id)
""")
def d_scrub_repeated_spans(spark, sf_dir):
    """Repetition scrubbing (remove EVERY copy of corpus-repeated runs
    — boilerplate/license-block removal): docs 0-29 carry an injected
    common header block; the scrub excises it (and any natural repeats)
    from the RAW text by exact extent splicing (``normalize=False``).
    Fully-repeated documents come back empty, untouched documents
    byte-identical."""
    from ..operators.paragraph import drop_repeated_spans
    d = _t(spark, sf_dir, "documents").filter("doc_id < 100")
    base = d.select(
        "doc_id",
        F.when(F.col("doc_id") < 30,
               F.concat(F.expr(
                   "repeat('common boilerplate header block ', 8)"),
                   F.col("text")))
        .otherwise(F.col("text")).alias("text"))
    return drop_repeated_spans(base, width=40, selector="md5",
                               normalize=False)


@q("t_decontaminate_vs_benchmark", r"""
WITH eval_docs AS (SELECT doc_id, text FROM documents WHERE doc_id < 20),
corpus AS (SELECT a.doc_id,
    CASE WHEN a.doc_id < 40 THEN b.text ELSE a.text END AS text
  FROM documents a LEFT JOIN documents b
    ON b.doc_id = a.doc_id - 20 AND a.doc_id < 40
  WHERE a.doc_id >= 20 AND a.doc_id < 220),
normc AS (SELECT doc_id,
    trim(regexp_replace(regexp_replace(lower(text), '[^\p{L}\p{N}]+', ' ', 'g'),
                        '\s+', ' ', 'g')) AS t FROM corpus),
tokc AS (SELECT doc_id, string_split(t, ' ') AS tk
         FROM normc WHERE length(t) > 0),
gramc AS (SELECT DISTINCT doc_id,
    array_to_string(list_slice(tk, i, i + 7), ' ') AS g
  FROM tokc CROSS JOIN (SELECT unnest(range(1, 100000)) AS i) u
  WHERE i + 7 <= len(tk)),
norme AS (SELECT doc_id,
    trim(regexp_replace(regexp_replace(lower(text), '[^\p{L}\p{N}]+', ' ', 'g'),
                        '\s+', ' ', 'g')) AS t FROM eval_docs),
toke AS (SELECT doc_id, string_split(t, ' ') AS tk
         FROM norme WHERE length(t) > 0),
grame AS (SELECT DISTINCT
    array_to_string(list_slice(tk, i, i + 7), ' ') AS g
  FROM toke CROSS JOIN (SELECT unnest(range(1, 100000)) AS i) u
  WHERE i + 7 <= len(tk))
SELECT c.doc_id, count(*)::BIGINT AS n_ngrams,
       sum(CASE WHEN e.g IS NOT NULL THEN 1 ELSE 0 END)::BIGINT
         AS n_contaminated,
       round(sum(CASE WHEN e.g IS NOT NULL THEN 1 ELSE 0 END)::DOUBLE
             / count(*), 6) AS contamination_ratio
FROM gramc c LEFT JOIN grame e USING (g) GROUP BY c.doc_id
""")
def t_decontaminate_vs_benchmark(spark, sf_dir):
    """Test-set decontamination (GPT-3/Pile style): per-corpus-doc
    fraction of distinct word 8-grams that occur in a benchmark corpus
    (docs 0-19). Corpus docs 20-39 carry an eval doc's exact text
    (ratio 1.0); the rest overlap only by chance. ``key="text"`` joins
    on the n-gram string — cross-engine reproducible; production
    default probes xxhash64 keys against the broadcast set."""
    from ..operators.decontam import contamination_ratios
    d = _t(spark, sf_dir, "documents")
    eval_docs = d.filter("doc_id < 20")
    a = d.alias("a").filter("a.doc_id >= 20 and a.doc_id < 220")
    b = d.alias("b")
    corpus = (a.join(b, (F.col("b.doc_id") == F.col("a.doc_id") - 20)
                     & (F.col("a.doc_id") < 40), "left")
              .select(F.col("a.doc_id").alias("doc_id"),
                      F.when(F.col("a.doc_id") < 40, F.col("b.text"))
                      .otherwise(F.col("a.text")).alias("text")))
    return contamination_ratios(corpus, eval_docs, n=8, key="text")


@q("d_incremental_simhash_pairs", r"""
WITH base AS (SELECT a.doc_id,
    CASE WHEN a.doc_id % 2 = 1 THEN b.text ELSE a.text END AS text
  FROM documents a JOIN documents b
    ON b.doc_id = a.doc_id - (a.doc_id % 2)
  WHERE a.doc_id < 100),
norm AS (SELECT doc_id,
    trim(regexp_replace(regexp_replace(lower(text), '[^\p{L}\p{N}]+', ' ', 'g'),
                        '\s+', ' ', 'g')) AS t
  FROM base),
hs AS (SELECT doc_id,
        list_transform(list_filter(string_split(t, ' '), x -> x <> ''),
                       tk -> ('0x' || substr(md5(tk), 1, 8))::BIGINT) AS hh
       FROM norm),
sh AS (SELECT doc_id,
  list_aggregate(list_transform(range(0, 32), b ->
    (CASE WHEN 2 * list_aggregate(
              list_transform(hh, h -> (floor(h / (2::BIGINT ^ b)))::BIGINT % 2),
              'sum') > len(hh)
          THEN 1::BIGINT ELSE 0::BIGINT END) * (1::BIGINT << (31 - b)::INT)),
    'sum')::BIGINT AS sh
  FROM hs)
-- max_hamming=3 < n_bands=4 ⇒ pigeonhole makes the banded incremental
-- result equal the plain threshold join
SELECT l.doc_id AS id_a, r.doc_id AS id_b,
       bit_count(xor(l.sh, r.sh))::INT AS hamming
FROM sh l JOIN sh r ON l.doc_id < r.doc_id
WHERE bit_count(xor(l.sh, r.sh)) <= 3
""")
def d_incremental_simhash_pairs(spark, sf_dir):
    """INCREMENTAL SimHash dedup (the brief's second signature family):
    two batches ingested against the persisted (doc_id, simhash) index —
    round 1 computes only its own hashes, fast-append snapshot, banded
    Hamming join vs the round-0 snapshot. Union of per-round pairs ==
    the full-corpus threshold pair set (pigeonhole: every hamming≤3 pair
    shares one of the 4 bands), which the oracle states as a plain
    bit_count(xor) join."""
    import tempfile

    from ..operators.incremental import SimHashIndex
    from ..tables import SnapshotStore
    a = _t(spark, sf_dir, "documents").alias("a").filter("doc_id < 100")
    b = _t(spark, sf_dir, "documents").alias("b")
    base = (a.join(b, F.col("b.doc_id")
                   == F.col("a.doc_id") - (F.col("a.doc_id") % 2))
            .select(F.col("a.doc_id").alias("doc_id"),
                    F.when(F.col("a.doc_id") % 2 == 1, F.col("b.text"))
                    .otherwise(F.col("a.text")).alias("text")))
    idx = SimHashIndex(
        SnapshotStore(tempfile.mkdtemp(prefix="shidx_dq_")), max_hamming=3)
    p1 = idx.ingest(spark, base.filter("doc_id < 50"))
    p2 = idx.ingest(spark, base.filter("doc_id >= 50"))
    return p1.unionByName(p2)


# Paragraph-bearing corpus planted over the documents table (texts have no
# newlines): 3 paragraphs per doc — own 80-char prefix, the 4-doc group
# base's full text (shared across the group → cross-doc duplicates), own
# full text (== paragraph 2 for the base doc itself → within-doc
# duplicate). Both engines construct it identically.
_PARA_BASE_SQL = """
base AS (SELECT a.doc_id,
    substr(a.text, 1, 80) || chr(10) || chr(10) || b.text
      || chr(10) || chr(10) || a.text AS text
  FROM documents a JOIN documents b
    ON b.doc_id = a.doc_id - (a.doc_id % 4)
  WHERE a.doc_id < 120),
lists AS (SELECT doc_id, string_split(text, chr(10) || chr(10)) AS l
          FROM base),
occ AS (SELECT doc_id, r AS para_idx, trim(l[r + 1]) AS para
        FROM lists CROSS JOIN (SELECT unnest(range(3)) AS r) t
        WHERE r < len(l) AND length(trim(l[r + 1])) > 0),
marked AS (SELECT doc_id, para_idx, para,
           (row_number() OVER (PARTITION BY para
                               ORDER BY doc_id, para_idx) > 1) AS is_dup
           FROM occ)
"""


def _para_base(spark, sf_dir):
    a = _t(spark, sf_dir, "documents").alias("a").filter("doc_id < 120")
    b = _t(spark, sf_dir, "documents").alias("b")
    return (a.join(b, F.col("b.doc_id")
                   == F.col("a.doc_id") - (F.col("a.doc_id") % 4))
            .select(F.col("a.doc_id").alias("doc_id"),
                    F.concat_ws("\n\n",
                                F.substring(F.col("a.text"), 1, 80),
                                F.col("b.text"),
                                F.col("a.text")).alias("text")))


@q("d_paragraph_stats", f"""
WITH {_PARA_BASE_SQL}
SELECT doc_id, count(*)::BIGINT AS n_paras,
       sum(CASE WHEN is_dup THEN 1 ELSE 0 END)::BIGINT AS n_dup_paras,
       round(sum(CASE WHEN is_dup THEN 1 ELSE 0 END)::DOUBLE / count(*), 6)
         AS dup_ratio
FROM marked GROUP BY doc_id
""")
def d_paragraph_stats(spark, sf_dir):
    """Paragraph-level dedup, containment stats: per document, how many of
    its paragraphs are repeats of an earlier (doc_id, para_idx) occurrence
    anywhere in the corpus. First-occurrence selection is a hash groupBy
    with map-side combine — only (hash, doc, idx) tuples shuffle."""
    from ..operators.paragraph import paragraph_stats
    return paragraph_stats(_para_base(spark, sf_dir))


@q("d_incremental_paragraph_corpus", """
WITH base AS (SELECT a.doc_id,
    substr(a.text, 1, 80) || chr(10) || chr(10) || b.text
      || chr(10) || chr(10) || a.text AS text
  FROM documents a JOIN documents b
    ON b.doc_id = CASE WHEN a.doc_id >= 60 THEN a.doc_id - 60
                       ELSE a.doc_id - (a.doc_id % 4) END
  WHERE a.doc_id < 120),
lists AS (SELECT doc_id, string_split(text, chr(10) || chr(10)) AS l
          FROM base),
occ AS (SELECT doc_id, r AS para_idx, trim(l[r + 1]) AS para
        FROM lists CROSS JOIN (SELECT unnest(range(3)) AS r) t
        WHERE r < len(l) AND length(trim(l[r + 1])) > 0),
marked AS (SELECT doc_id, para_idx, para,
           (row_number() OVER (PARTITION BY para
                               ORDER BY doc_id, para_idx) > 1) AS is_dup
           FROM occ)
SELECT b.doc_id,
       coalesce(string_agg(m.para, chr(10) || chr(10)
                           ORDER BY m.para_idx), '') AS text
FROM base b LEFT JOIN (SELECT * FROM marked WHERE NOT is_dup) m
  USING (doc_id)
GROUP BY b.doc_id
""")
def d_incremental_paragraph_corpus(spark, sf_dir):
    """INCREMENTAL paragraph dedup: two batches (docs 0-59, 60-119)
    ingested against the persisted paragraph-hash index. Batch-2 docs
    take doc (id-60)'s full text as their middle paragraph — a guaranteed
    CROSS-batch repeat the index must catch; batch-1 keeps the 4-doc
    group construction. Batches arrive in doc_id order, so the per-batch
    corpus union equals the whole-corpus dedup — which the oracle states
    directly."""
    import tempfile

    from ..operators.incremental import ParagraphIndex
    from ..tables import SnapshotStore
    a = _t(spark, sf_dir, "documents").alias("a").filter("doc_id < 120")
    b = _t(spark, sf_dir, "documents").alias("b")
    base_key = F.when(F.col("a.doc_id") >= 60, F.col("a.doc_id") - 60) \
        .otherwise(F.col("a.doc_id") - (F.col("a.doc_id") % 4))
    base = (a.join(b, F.col("b.doc_id") == base_key)
            .select(F.col("a.doc_id").alias("doc_id"),
                    F.concat_ws("\n\n",
                                F.substring(F.col("a.text"), 1, 80),
                                F.col("b.text"),
                                F.col("a.text")).alias("text")))
    idx = ParagraphIndex(
        SnapshotStore(tempfile.mkdtemp(prefix="paraidx_dq_")))
    c1 = idx.ingest(spark, base.filter("doc_id < 60"))
    c2 = idx.ingest(spark, base.filter("doc_id >= 60"))
    return c1.unionByName(c2)


@q("d_paragraph_dedup_corpus", f"""
WITH {_PARA_BASE_SQL}
SELECT b.doc_id,
       coalesce(string_agg(m.para, chr(10) || chr(10)
                           ORDER BY m.para_idx), '') AS text
FROM base b LEFT JOIN (SELECT * FROM marked WHERE NOT is_dup) m
  USING (doc_id)
GROUP BY b.doc_id
""")
def d_paragraph_dedup_corpus(spark, sf_dir):
    """Paragraph-dedup'd corpus: every non-first paragraph occurrence
    removed, survivors rejoined in original order; documents fully
    deduplicated away keep an empty text (every input id present)."""
    from ..operators.paragraph import drop_duplicate_paragraphs
    return drop_duplicate_paragraphs(_para_base(spark, sf_dir))


# ===========================================================================
# Similarity search (operators/similarity.py)
# ===========================================================================

_COS_SQL = """
  list_aggregate(list_transform(range(1, len(q.embedding) + 1),
    i -> q.embedding[i]::DOUBLE * c.embedding[i]::DOUBLE), 'sum')
  / (sqrt(list_aggregate(list_transform(q.embedding,
      x -> x::DOUBLE * x::DOUBLE), 'sum'))
     * sqrt(list_aggregate(list_transform(c.embedding,
        x -> x::DOUBLE * x::DOUBLE), 'sum')))
"""


@q("s_ann_bruteforce_topk", f"""
WITH scored AS (
  SELECT q.vec_id AS query_id, c.vec_id AS vec_id, {_COS_SQL} AS cos_raw
  FROM embeddings q, embeddings c WHERE q.vec_id < 5)
SELECT query_id, vec_id, round(cos_raw, 4) AS cosine, rank FROM (
  SELECT query_id, vec_id, cos_raw,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY cos_raw DESC, vec_id) AS rank
  FROM scored) WHERE rank <= 3
""")
def s_ann_bruteforce_topk(spark, sf_dir):
    """Exact cosine top-k (queries broadcast; JVM array arithmetic)."""
    from ..operators.similarity import brute_force_topk
    emb = _t(spark, sf_dir, "embeddings")
    queries = emb.filter("vec_id < 5").select(
        F.col("vec_id").alias("query_id"), "embedding")
    out = brute_force_topk(emb, queries, k=3)
    return out.select("query_id", "vec_id",
                      F.round(F.col("cosine"), 4).alias("cosine"), "rank")


@q("s_embedding_block_pairs", f"""
WITH scored AS (
  SELECT q.vec_id AS id_a, c.vec_id AS id_b, q.label AS label, {_COS_SQL} AS cos_raw
  FROM embeddings q JOIN embeddings c
    ON q.label = c.label AND q.vec_id < c.vec_id
  WHERE q.vec_id < 200 AND c.vec_id < 200)
SELECT id_a, id_b, label, round(cos_raw, 4) AS cosine
FROM scored WHERE cos_raw >= 0.2
""")
def s_embedding_block_pairs(spark, sf_dir):
    """Blocked cosine near-dup pairs (label blocks restrict the self-join)."""
    emb = _t(spark, sf_dir, "embeddings").filter("vec_id < 200")
    from ..operators.similarity import cosine_col
    l, r = emb.alias("l"), emb.alias("r")
    dotn = (F.aggregate(
        F.zip_with(F.col("l.embedding"), F.col("r.embedding"),
                   lambda a, b: a.cast("double") * b.cast("double")),
        F.lit(0.0), lambda acc, x: acc + x))
    nrm = lambda side: F.sqrt(F.aggregate(
        F.col(f"{side}.embedding"), F.lit(0.0),
        lambda a, x: a + x.cast("double") * x.cast("double")))
    cos_raw = dotn / (nrm("l") * nrm("r"))
    return (l.join(r, (F.col("l.label") == F.col("r.label"))
                   & (F.col("l.vec_id") < F.col("r.vec_id")))
            .select(F.col("l.vec_id").alias("id_a"),
                    F.col("r.vec_id").alias("id_b"),
                    F.col("l.label").alias("label"),
                    cos_raw.alias("cos_raw"))
            .filter(F.col("cos_raw") >= 0.2)
            .select("id_a", "id_b", "label",
                    F.round(F.col("cos_raw"), 4).alias("cosine")))


# ===========================================================================
# Events: windowed aggregation, sessionization, JSON extraction
# ===========================================================================

@q("e_windowed_counts", """
SELECT (floor(epoch(ts) / 300) * 300)::BIGINT AS window_start_epoch,
       event_type, count(*) AS n, round(sum(value), 4) AS total_value
FROM events GROUP BY 1, 2
""")
def e_windowed_counts(spark, sf_dir):
    """5-minute tumbling windows (batch form of the streaming operator)."""
    from ..streaming.events import windowed_counts
    ev = _t(spark, sf_dir, "events").withColumn(
        "ts", F.col("ts").cast("timestamp"))
    out = windowed_counts(ev, window="5 minutes")
    return out.select(
        F.unix_timestamp("window_start").cast("long")
        .alias("window_start_epoch"),
        "event_type", "n",
        F.round(F.col("total_value"), 4).alias("total_value"))


@q("e_sessionize", """
WITH o AS (SELECT user_id, ts, value,
             CASE WHEN floor(epoch(ts))::BIGINT - lag(floor(epoch(ts))::BIGINT)
                    OVER (PARTITION BY user_id ORDER BY ts) > 1800
                  THEN 1 ELSE 0 END AS new_s
           FROM events),
s AS (SELECT user_id, ts, value,
        sum(new_s) OVER (PARTITION BY user_id ORDER BY ts
                         ROWS UNBOUNDED PRECEDING) AS session_no
      FROM o)
SELECT user_id, floor(epoch(min(ts)))::BIGINT AS session_start_epoch,
       count(*) AS n_events, round(sum(value), 4) AS session_value
FROM s GROUP BY user_id, session_no
""")
def e_sessionize(spark, sf_dir):
    """Gap-based sessionization (30-min gap)."""
    from ..streaming.events import sessionize_batch_window
    ev = _t(spark, sf_dir, "events").withColumn(
        "ts", F.col("ts").cast("timestamp"))
    out = sessionize_batch_window(ev, gap_minutes=30)
    return out.select(
        "user_id",
        F.unix_timestamp("session_start").cast("long")
        .alias("session_start_epoch"),
        "n_events",
        F.round(F.col("session_value"), 4).alias("session_value"))


@q("e_json_props", """
SELECT event_type,
       sum(json_extract_string(props, '$.k')::BIGINT)::BIGINT AS sum_k,
       count(*) AS n
FROM events GROUP BY event_type
""")
def e_json_props(spark, sf_dir):
    """Semi-structured extraction from the JSON props column."""
    return (_t(spark, sf_dir, "events")
            .groupBy("event_type")
            .agg(F.sum(F.get_json_object("props", "$.k").cast("long"))
                 .alias("sum_k"),
                 F.count("*").alias("n")))


# ===========================================================================
# Non-SQL-expressible operators: rows-only driver checks (pytest owns the
# exactness proofs — tests/test_engine_oracle.py, tests/test_images.py)
# ===========================================================================

def _bfs_oracle_sql(n_rounds=10, max_urls=80, batch=20, limit=150,
                   max_depth=10):
    url = ("CASE WHEN {i} = 0 THEN 'https://shop.example.test/' "
           "WHEN {i} % 10 IN (1,2) THEN 'https://shop.example.test/product/item-' || {i}::VARCHAR "
           "WHEN {i} % 10 = 3 THEN 'https://shop.example.test/category/cat-' || {i}::VARCHAR "
           "WHEN {i} % 10 = 4 THEN 'https://shop.example.test/service/svc-' || {i}::VARCHAR "
           "WHEN {i} % 10 IN (5,6) THEN 'https://shop.example.test/blog/post-' || {i}::VARCHAR "
           "ELSE 'https://shop.example.test/page/info-' || {i}::VARCHAR END")
    prio = "({i} % 10 IN (1,2,3,4) AND {i} <> 0)"
    status = ("CASE WHEN {i} % 29 = 11 THEN 404 "
              "WHEN {i} % 31 = 13 THEN 500 ELSE 200 END")
    parts = [f"WITH nn AS (SELECT LEAST({limit}, count(*))::BIGINT AS n FROM documents),"]
    parts.append("f0 AS (SELECT 0::BIGINT AS id, 0 AS depth, TRUE AS prio, 0::BIGINT AS dseq),")
    parts.append("reg0 AS (SELECT id, dseq FROM f0),")
    parts.append("tot0 AS (SELECT 0::BIGINT AS tot),")
    for k in range(n_rounds):
        parts.append(f"""c{k} AS MATERIALIZED (
  SELECT id, depth, prio, dseq,
         row_number() OVER (ORDER BY prio DESC, dseq ASC) - 1 AS rnk
  FROM f{k}, tot{k}
  QUALIFY rnk < LEAST({batch}, {max_urls} - tot)),""")
        parts.append(f"""adds{k} AS MATERIALIZED (
  SELECT child AS id, depth, cprio AS prio,
         (SELECT coalesce(max(dseq), 0) FROM reg{k}) + 
         row_number() OVER (ORDER BY rnk, pos) AS dseq
  FROM (
    SELECT e.child, e.pos, c.rnk, c.depth + 1 AS depth,
           {prio.format(i="e.child")} AS cprio,
           row_number() OVER (PARTITION BY e.child
                              ORDER BY c.rnk, e.pos) AS occ
    FROM c{k} c CROSS JOIN nn,
    LATERAL (
      SELECT pos, child FROM (VALUES
        (0, 2 * c.id + 1),
        (1, 2 * c.id + 2),
        (2, (37 * c.id + 11) % nn.n)) AS v(pos, child)
      WHERE child < nn.n) e
    WHERE ({status.format(i="c.id")}) = 200
      AND c.depth < {max_depth}
      AND e.child NOT IN (SELECT id FROM reg{k})
  ) QUALIFY occ = 1),""")
        parts.append(f"reg{k+1} AS MATERIALIZED (SELECT id, dseq FROM reg{k} UNION ALL SELECT id, dseq FROM adds{k}),")
        parts.append(f"""f{k+1} AS MATERIALIZED (
  SELECT id, depth, prio, dseq FROM f{k}
  WHERE id NOT IN (SELECT id FROM c{k})
  UNION ALL SELECT id, depth, prio, dseq FROM adds{k}),""")
        parts.append(f"tot{k+1} AS MATERIALIZED (SELECT tot + (SELECT count(*) FROM c{k}) AS tot FROM tot{k}),")
    crawled = "\nUNION ALL\n".join(
        f"SELECT (SELECT tot FROM tot{k}) + rnk AS crawl_seq, id, depth, prio, {k} AS round FROM c{k}"
        for k in range(n_rounds))
    parts.append(f"crawled AS (\n{crawled}\n)")
    sql = "\n".join(parts) + f"""
SELECT crawl_seq, {url.format(i="id")} AS url, depth::INT AS depth,
       prio AS priority, round::INT AS round
FROM crawled ORDER BY crawl_seq
"""
    return sql


@q("crawl_bfs_documents", _bfs_oracle_sql())
def crawl_bfs_documents(spark, sf_dir):
    """The full iterative BFS engine over a site derived from the documents
    table: crawl order with priority-first dequeue.

    FULL DuckDB ORACLE (r4 verdict #6): the bounded round loop is
    unrolled into chained MATERIALIZED CTEs — each round ranks the
    frontier by (priority DESC, discovery_seq ASC) (exactly the
    two-deque FIFO drain: priority entries in enqueue order, then
    normal), takes LEAST(batch, budget-left), expands the deterministic
    id-space link graph (binary-tree + modular edges; the utm/trailing
    href variants all canonicalize back to the page url, and decoys
    never pass the relevance filters, so id space is exact), dedups
    within the round by first (parent rank, link pos), anti-joins the
    registered set, and numbers discoveries globally. 10 unrolled rounds
    cover the 80-url budget (7 used; empty rounds self-eliminate).
    Exactness vs the pure-Python reference model is separately proven in
    tests/test_engine_oracle.py."""
    from ..config import CrawlConfig
    from ..engine import CrawlEngine
    from ..sources.from_documents import SEED_URL, pages_df_from_documents
    pages = pages_df_from_documents(spark, sf_dir, limit=150)
    cfg = CrawlConfig(seed_url=SEED_URL, max_urls=80, batch_size=20)
    state = CrawlEngine(spark, pages, cfg).run()
    return state.crawl_order


_PHASH_SQL = """
SELECT doc_id AS image_id,
       xor((xor(((base * 48271) % 65536), ((hi * 20011) % 65536))
            | (xor(((base * 69621) % 65536), ((hi * 30011) % 65536)) << 16))
           | ((xor(((base * 16807) % 65536), ((hi * 25013) % 65536)) << 32)
              | (xor(((base * 40503) % 32768), ((hi * 15013) % 32768)) << 48)),
           CASE doc_id % 4 WHEN 0 THEN 0 WHEN 1 THEN 1
                           WHEN 2 THEN 2 ELSE 1099511627776 END)::BIGINT
       AS phash
FROM (SELECT doc_id, (doc_id - doc_id % 4) AS base,
             ((doc_id - doc_id % 4) >> 16) AS hi
      FROM documents)
"""


@q("m_phash_near_dup", f"""
WITH img AS ({_PHASH_SQL}),
bands AS (
  SELECT image_id, phash, b.band,
         (phash >> (b.band * 16)) & 65535 AS band_key
  FROM img, (SELECT unnest(range(4)) AS band) b)
SELECT DISTINCT l.image_id AS id_a, r.image_id AS id_b,
       bit_count(xor(l.phash, r.phash))::INT AS hamming
FROM bands l JOIN bands r
  ON l.band = r.band AND l.band_key = r.band_key
 AND l.image_id < r.image_id
WHERE bit_count(xor(l.phash, r.phash)) <= 2
""")
def m_phash_near_dup(spark, sf_dir):
    """Image-level near-dup dedup over the 64-bit perceptual hash column of
    the image+caption table (input_hint shape): banded Hamming search with
    exact bit_count verify — the image-axis analog of MinHash-LSH. The
    phash column is derived arithmetically from ``doc_id`` (groups of 4
    share a base hash with ≤2 flipped bits ⇒ planted near-dup clusters)
    so DuckDB constructs the identical table independently."""
    from ..operators.dedup import hamming_near_dup_pairs
    return hamming_near_dup_pairs(_phash_table(spark, sf_dir),
                                  "image_id", "phash",
                                  bits=64, band_bits=16, max_hamming=2) \
        .withColumn("hamming", F.col("hamming").cast("int"))


@q("d_dedup_groups", """
SELECT doc_id AS member, (doc_id - doc_id % 4)::BIGINT AS group_id
FROM documents
-- singleton tail group (no pairs) never enters the component graph
WHERE doc_id - doc_id % 4 < (SELECT max(doc_id) FROM documents)
""")
def d_dedup_groups(spark, sf_dir):
    """Near-dup CLUSTERS: connected components (iterative min-label
    propagation) over the phash near-dup pairs. The planted pair structure
    makes the transitive closure analytically known — groups of 4
    consecutive ids labeled by their minimum — so the oracle states the
    EXPECTED components independently of the propagation algorithm."""
    from ..operators.dedup import dedup_groups, hamming_near_dup_pairs
    pairs = hamming_near_dup_pairs(_phash_table(spark, sf_dir),
                                   "image_id", "phash",
                                   bits=64, band_bits=16, max_hamming=2)
    return (dedup_groups(pairs, "id_a", "id_b")
            .select(F.col("member").cast("long").alias("member"),
                    F.col("group").cast("long").alias("group_id")))


def _phash_table(spark, sf_dir):
    """The derived image-table phash column (shared by m_phash_near_dup).

    Each 16-bit chunk mixes the group base's HIGH bits (``base >> 16``,
    odd multipliers, xor) into the low-16-bit residue: without the mix the
    chunks are periodic in base with period 65536, so two groups whose
    bases differ by 65536k would share all four band keys and hamming-0
    phashes — silently merging components once the documents table passes
    65536 rows. With the mix, bases differing in the high bits disagree in
    EVERY band (odd multiplier ⇒ invertible mod 2^16), and bases differing
    in the low bits already disagree in bands 0-2; the nearest cross-group
    pair (Δbase = 32768, band 3 shared) sits at hamming 3 > the
    max_hamming=2 cut. Collision-free for doc_id < 2^31."""
    base = F.col("doc_id") - F.col("doc_id") % 4
    hi = F.shiftright(base, 16)
    assembled = (
        ((base * 48271) % 65536).bitwiseXOR((hi * 20011) % 65536)
        .bitwiseOR(F.shiftleft(
            ((base * 69621) % 65536).bitwiseXOR((hi * 30011) % 65536), 16))
        .bitwiseOR(F.shiftleft(
            ((base * 16807) % 65536).bitwiseXOR((hi * 25013) % 65536), 32))
        .bitwiseOR(F.shiftleft(
            ((base * 40503) % 32768).bitwiseXOR((hi * 15013) % 32768), 48)))
    noise = (F.when(F.col("doc_id") % 4 == 0, 0)
             .when(F.col("doc_id") % 4 == 1, 1)
             .when(F.col("doc_id") % 4 == 2, 2)
             .otherwise(F.lit(1099511627776)))
    return _t(spark, sf_dir, "documents").select(
        F.col("doc_id").alias("image_id"),
        assembled.bitwiseXOR(noise).cast("long").alias("phash"))


@q("s_ivf_assign", """
WITH c AS (SELECT vec_id AS cid, embedding::DOUBLE[] AS cv
           FROM embeddings WHERE vec_id < 4),
v AS (SELECT vec_id, embedding::DOUBLE[] AS ev FROM embeddings),
scored AS (
  SELECT v.vec_id, c.cid,
         list_dot_product(ev, cv)
         / (greatest(sqrt(list_dot_product(ev, ev)), 1e-12)
            * sqrt(list_dot_product(cv, cv))) AS sim
  FROM v CROSS JOIN c)
SELECT vec_id, cid::INT AS ivf_list FROM (
  SELECT vec_id, cid,
         row_number() OVER (PARTITION BY vec_id
                            ORDER BY sim DESC, cid ASC) AS rn
  FROM scored) WHERE rn = 1
""")
def s_ivf_assign(spark, sf_dir):
    """IVF list assignment with EXPLICIT centroids (the first 4 vectors) so
    DuckDB can reproduce the argmax independently: dot/norm math runs in
    double on both engines, ties break to the first centroid index.
    Completes the IVF operator's oracle coverage (centroid SAMPLING stays
    pytest-proven — its hash order is engine-specific by design)."""
    from ..operators.similarity import ivf_assign_with
    emb = _t(spark, sf_dir, "embeddings")
    cents = [[float(x) for x in r[0]] for r in
             emb.filter("vec_id < 4").orderBy("vec_id")
             .select("embedding").collect()]
    return ivf_assign_with(emb, cents).select("vec_id", "ivf_list")


@q("s_ivf_kmeans", """
WITH c0 AS (SELECT vec_id AS cid, embedding::DOUBLE[] AS cv
            FROM embeddings WHERE vec_id < 4),
v AS (SELECT vec_id, embedding::DOUBLE[] AS ev FROM embeddings),
s0 AS (
  SELECT v.vec_id, c0.cid, v.ev,
         list_dot_product(ev, cv)
         / (greatest(sqrt(list_dot_product(ev, ev)), 1e-12)
            * sqrt(list_dot_product(cv, cv))) AS sim
  FROM v CROSS JOIN c0),
a0 AS (
  SELECT vec_id, cid, ev FROM (
    SELECT vec_id, cid, ev,
           row_number() OVER (PARTITION BY vec_id
                              ORDER BY sim DESC, cid ASC) AS rn
    FROM s0) WHERE rn = 1),
upd AS (
  SELECT cid, i, round(avg(ev[i + 1]), 6) AS m
  FROM a0 CROSS JOIN (SELECT unnest(range(64)) AS i) dims
  GROUP BY cid, i),
c1 AS (
  SELECT c0.cid, coalesce(u.cv1, c0.cv) AS cv
  FROM c0 LEFT JOIN (SELECT cid, list(m ORDER BY i) AS cv1
                     FROM upd GROUP BY cid) u USING (cid)),
s1 AS (
  SELECT v.vec_id, c1.cid,
         list_dot_product(ev, cv)
         / (greatest(sqrt(list_dot_product(ev, ev)), 1e-12)
            * sqrt(list_dot_product(cv, cv))) AS sim
  FROM v CROSS JOIN c1)
SELECT vec_id, cid::INT AS ivf_list FROM (
  SELECT vec_id, cid,
         row_number() OVER (PARTITION BY vec_id
                            ORDER BY sim DESC, cid ASC) AS rn
  FROM s1) WHERE rn = 1
""")
def s_ivf_kmeans(spark, sf_dir):
    """IVF k-means TRAINING (round-2 verdict item 4): one full Lloyd
    iteration from the s_ivf_assign centroids — assignment argmax,
    per-list per-dimension means, reassignment — reproduced end-to-end by
    DuckDB. Means are rounded to 6 decimals on both engines (float
    summation is not associative, so raw partial-aggregation order would
    differ); empty lists keep their previous centroid (COALESCE on both
    sides). The Spark side is the production ``kmeans_iterate`` operator:
    per-row JVM array math for assignment, one groupBy(ivf_list) shuffle
    of map-side partial means per iteration, <= n_lists rows collected."""
    from ..operators.similarity import ivf_assign_with, kmeans_iterate
    emb = _t(spark, sf_dir, "embeddings")
    cents = [[float(x) for x in r[0]] for r in
             emb.filter("vec_id < 4").orderBy("vec_id")
             .select("embedding").collect()]
    trained = kmeans_iterate(emb, cents, n_iters=1)
    return ivf_assign_with(emb, trained).select("vec_id", "ivf_list")


@q("s_ann_ivf_topk", """
WITH c AS (SELECT vec_id AS cid, embedding::DOUBLE[] AS cv
           FROM embeddings WHERE vec_id < 4),
qs AS (SELECT vec_id AS query_id, embedding FROM embeddings
       WHERE vec_id < 3),
-- probe-list selection: nprobe=2 nearest centroids per query (plain
-- cosine, unguarded norms — mirrors ivf_topk's F.transform sims)
qsim AS (
  SELECT q.query_id, c.cid,
         list_dot_product(list_transform(q.embedding, x -> x::DOUBLE), cv)
         / (sqrt(list_dot_product(list_transform(q.embedding,
                                                 x -> x::DOUBLE),
                 list_transform(q.embedding, x -> x::DOUBLE)))
            * sqrt(list_dot_product(cv, cv))) AS sim
  FROM qs q CROSS JOIN c),
probes AS (
  SELECT query_id, cid FROM (
    SELECT query_id, cid,
           row_number() OVER (PARTITION BY query_id
                              ORDER BY sim DESC, cid ASC) AS rn
    FROM qsim) WHERE rn <= 2),
-- corpus assignment: argmax with first-index tie-break and zero-vector
-- guard (identical to the s_ivf_assign oracle)
vsim AS (
  SELECT v.vec_id, c.cid,
         list_dot_product(v.ev, cv)
         / (greatest(sqrt(list_dot_product(v.ev, v.ev)), 1e-12)
            * sqrt(list_dot_product(cv, cv))) AS sim
  FROM (SELECT vec_id, embedding::DOUBLE[] AS ev FROM embeddings) v
  CROSS JOIN c),
assigned AS (
  SELECT vec_id, cid AS ivf_list FROM (
    SELECT vec_id, cid,
           row_number() OVER (PARTITION BY vec_id
                              ORDER BY sim DESC, cid ASC) AS rn
    FROM vsim) WHERE rn = 1),
-- score only the probed lists; rank on the 6-decimal-rounded cosine
-- (cosine_col rounds before ranking) with corpus-id tie-break
scored AS (
  SELECT p.query_id, a.vec_id,
         round({cos}, 6) AS cos6
  FROM probes p
  JOIN assigned a ON a.ivf_list = p.cid
  JOIN embeddings c ON c.vec_id = a.vec_id
  JOIN qs q ON q.query_id = p.query_id)
SELECT query_id, vec_id, round(cos6, 4) AS cosine, rank FROM (
  SELECT query_id, vec_id, cos6,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY cos6 DESC, vec_id ASC) AS rank
  FROM scored) WHERE rank <= 5
""".replace("{cos}", _COS_SQL))
def s_ann_ivf_topk(spark, sf_dir):
    """IVF SEARCH (the ANN scale path): route each query to its nprobe=2
    nearest inverted lists, score ONLY those lists' vectors, rank per
    query. Centroids are explicit (first 4 vectors — same convention as
    s_ivf_assign) so DuckDB reproduces routing, assignment, and ranking
    end-to-end. At 10^10 scale the assigned corpus is written bucketed by
    ivf_list, so a probe scans nprobe/n_lists of the data; here the
    list-routing join broadcasts the exploded (query, list) pairs."""
    from ..operators.similarity import ivf_assign_with, ivf_topk
    emb = _t(spark, sf_dir, "embeddings")
    cents = [[float(x) for x in r[0]] for r in
             emb.filter("vec_id < 4").orderBy("vec_id")
             .select("embedding").collect()]
    assigned = ivf_assign_with(emb, cents)
    queries = emb.filter("vec_id < 3").select(
        F.col("vec_id").alias("query_id"), "embedding")
    out = ivf_topk(assigned, cents, queries, k=5, nprobe=2)
    return out.select("query_id", "vec_id",
                      F.round(F.col("cosine"), 4).alias("cosine"), "rank")


@q("m_validate_images")
def m_validate_images(spark, sf_dir):
    """Image+caption payload validation (input_hint invariant): decode,
    PSNR≥40dB for lossy, caption + phash equality. Deterministic generated
    payloads (no image libs in the container ⇒ no SQL oracle)."""
    from ..operators.multimodal import validate_images
    from ..sources.images import generate_images
    rows = generate_images(60)
    df = spark.createDataFrame(
        rows, "image_id string, bytes binary, w int, h int, fmt string, "
              "caption string, phash long")
    return (validate_images(df)
            .groupBy("fmt")
            .agg(F.count("*").alias("n"),
                 F.sum(F.when(F.col("pixels_ok") & F.col("phash_ok")
                              & F.col("caption_ok"), 1).otherwise(0))
                 .alias("n_valid"),
                 F.round(F.min("psnr"), 3).alias("min_psnr")))


@q("m_image_metadata_invariants", """
WITH idx AS (SELECT unnest(range(120)) AS i),
v AS (SELECT
  ['aerial','amber','ancient','bright','coastal','crimson','dappled',
   'dusty','foggy','gilded','glassy','jagged','lunar','mossy','neon',
   'quiet','rustic','silver','sunlit','winding'] AS vocab,
  ['archway','bridge','canyon','harbor','lantern','market','meadow',
   'orchard','plaza','ridge','rooftop','shoreline','staircase','terrace',
   'valley','waterfall','window','workshop','garden','tower'] AS nouns,
  ['png','jpeg','webp'] AS fmts)
SELECT 'img-' || lpad(i::VARCHAR, 10, '0') AS image_id,
       fmts[(i % 3) + 1] AS fmt,
       vocab[(i % 20) + 1] || ' ' || nouns[((i // 20) % 20) + 1]
         || ' with ' || vocab[((i * 7 + 3) % 20) + 1]
         || ' light #' || i::VARCHAR AS caption
FROM idx, v
""")
def m_image_metadata_invariants(spark, sf_dir):
    """The METADATA axis of image validation, split out as a full SQL
    oracle (r4 verdict #8): image_id formatting, format assignment, and
    the seeded caption phrase are reconstructed independently in DuckDB
    and hash-compared against the generated table — only the pixel path
    (decode, PSNR, phash-of-pixels) remains rows-only in
    ``m_validate_images`` (no image decode in DuckDB)."""
    from ..sources.images import generate_images
    rows = generate_images(120)
    df = spark.createDataFrame(
        rows, "image_id string, bytes binary, w int, h int, fmt string, "
              "caption string, phash long")
    return df.select("image_id", "fmt", "caption")


@q("r_recrawl_detect_changes", r"""
WITH old_cache AS (
  SELECT 'https://shop.example.test/p/' || doc_id AS url,
         md5(text) AS content_md5, doc_id AS checked_seq
  FROM documents WHERE doc_id % 5 <> 4),
new_cache AS (
  SELECT 'https://shop.example.test/p/' || doc_id AS url,
         md5(CASE WHEN doc_id % 3 = 0 THEN text || ' changed' ELSE text END)
           AS content_md5,
         doc_id + 1000 AS checked_seq
  FROM documents WHERE doc_id % 7 <> 6)
SELECT url,
  CASE WHEN o.content_md5 IS NULL THEN 'NEW'
       WHEN n.content_md5 IS NULL THEN 'GONE'
       WHEN o.content_md5 <> n.content_md5 THEN 'CHANGED'
       ELSE 'UNCHANGED' END AS change_status
FROM (SELECT url, content_md5 FROM old_cache) o
FULL OUTER JOIN (SELECT url, content_md5 FROM new_cache) n USING (url)
""")
def r_recrawl_detect_changes(spark, sf_dir):
    """Recrawl change detection (reference cache/<domain>_cache.json
    semantics, SURVEY §1.4): two derived cache snapshots → NEW / CHANGED /
    UNCHANGED / GONE per URL."""
    from ..operators.recrawl import detect_changes
    d = _t(spark, sf_dir, "documents")
    url = F.concat(F.lit("https://shop.example.test/p/"), F.col("doc_id"))
    old = (d.filter(F.col("doc_id") % 5 != 4)
           .select(url.alias("url"), F.md5("text").alias("content_md5"),
                   F.col("doc_id").alias("checked_seq")))
    new = (d.filter(F.col("doc_id") % 7 != 6)
           .select(url.alias("url"),
                   F.md5(F.when(F.col("doc_id") % 3 == 0,
                                F.concat(F.col("text"), F.lit(" changed")))
                         .otherwise(F.col("text"))).alias("content_md5"),
                   (F.col("doc_id") + 1000).alias("checked_seq")))
    return detect_changes(old, new).select("url", "change_status")


def _pagerank_sql(iters: int = 3, d: float = 0.85) -> str:
    """Chained-CTE PageRank oracle (fixed iterations; same formula as
    operators/graph.pagerank; round(6) absorbs float summation order)."""
    base = """
WITH e AS (
  SELECT doc_id AS src, 2 * doc_id + 1 AS dst FROM documents
    WHERE 2 * doc_id + 1 < (SELECT count(*) FROM documents)
  UNION
  SELECT doc_id AS src, 2 * doc_id + 2 AS dst FROM documents
    WHERE 2 * doc_id + 2 < (SELECT count(*) FROM documents)
  UNION
  SELECT doc_id AS src, (doc_id * 37 + 11) % (SELECT count(*) FROM documents)
    AS dst FROM documents),
nodes AS (SELECT src AS node FROM e UNION SELECT dst FROM e),
nn AS (SELECT count(*)::DOUBLE AS n FROM nodes),
deg AS (SELECT src, count(*)::DOUBLE AS deg FROM e GROUP BY src),
r0 AS (SELECT node, 1.0 / (SELECT n FROM nn) AS rank FROM nodes)"""
    for i in range(iters):
        prev, cur = f"r{i}", f"r{i + 1}"
        base += f""",
dang{i} AS (SELECT coalesce(sum(rank), 0.0) AS m FROM {prev}
            WHERE node NOT IN (SELECT src FROM deg)),
c{i} AS (SELECT e.dst AS node, sum(p.rank / deg.deg) AS contrib
         FROM {prev} p JOIN deg ON p.node = deg.src
                       JOIN e ON e.src = p.node
         GROUP BY e.dst),
{cur} AS (SELECT nodes.node,
            (1 - {d}) / (SELECT n FROM nn)
            + {d} * (coalesce(c{i}.contrib, 0.0)
                     + (SELECT m FROM dang{i}) / (SELECT n FROM nn)) AS rank
          FROM nodes LEFT JOIN c{i} ON nodes.node = c{i}.node)"""
    base += f"""
SELECT node, floor(rank * 100000)::BIGINT AS rank_e5 FROM r{iters}"""
    return base


@q("g_pagerank", _pagerank_sql(3))
def g_pagerank(spark, sf_dir):
    """Iterative PageRank over the documents link graph (3 damped
    iterations; the engine's operators/graph.pagerank vs a chained-CTE
    DuckDB oracle)."""
    from ..operators.graph import pagerank
    d = _t(spark, sf_dir, "documents")
    n = d.count()
    e1 = d.select(F.col("doc_id").alias("src"),
                  (F.col("doc_id") * 2 + 1).alias("dst")) \
        .filter(F.col("dst") < n)
    e2 = d.select(F.col("doc_id").alias("src"),
                  (F.col("doc_id") * 2 + 2).alias("dst")) \
        .filter(F.col("dst") < n)
    e3 = d.select(F.col("doc_id").alias("src"),
                  ((F.col("doc_id") * 37 + 11) % n).alias("dst"))
    edges = e1.unionByName(e2).unionByName(e3)
    out = pagerank(edges, n_iters=3)
    # floor-quantized: the value classes sit ≥0.013 bucket-units from any
    # boundary while cross-engine float drift is ~1e-4 — exact-hash-safe
    # where decimal rounding hits half-boundaries (tree-symmetric ranks)
    return out.select(
        "node",
        F.floor(F.col("rank") * 100000).cast("long").alias("rank_e5"))

"""Similarity search over an embedding column (``array<float>``).

Two tiers, as a 100 TB pipeline needs:

* :func:`brute_force_topk` — exact cosine top-k: queries are broadcast
  (small side), scores are per-row JVM array expressions
  (``zip_with``/``aggregate`` — no Python), and the top-k per query is a
  window rank. The baseline every ANN variant is validated against.
* :func:`lsh_bucketed_topk` — random-hyperplane LSH: deterministic
  hyperplanes (seeded), per-row signature via dot-product signs, candidates
  restricted to probe buckets, exact rerank inside buckets. The scale
  path: the self-join touches only matching buckets instead of the full
  corpus.
* :func:`ivf_assign` / :func:`ivf_topk` — IVF: assign each vector to its
  nearest centroid (:func:`ivf_kmeans` Lloyd-trains them), search only the
  ``nprobe`` nearest lists per query.

Model parameters (centroids, hyperplanes) are shipped as ONE broadcast
numpy matrix consumed by Arrow-vectorized pandas UDFs — ``V @ C.T`` is a
single BLAS call per Arrow batch, and the Catalyst plan carries a constant
handful of nodes regardless of ``n_lists``/``n_planes``/``dim``. The
round-3 encoding inlined every component as an expression literal
(O(n_lists·dim) plan nodes): free at n_lists=16, a plan-size/codegen
blow-up at the 10^3–10^4 lists × dim 768 real ANN needs
(``tests/test_training_ops.py::test_ivf_plan_size_constant_in_n_lists``
pins the fix). Pairwise rerank cosines stay JVM-side (``cosine_col``):
they compare data rows, not model parameters, so literals never enter.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0), lambda acc, x: acc + x)


def _norm(v: Column) -> Column:
    return F.sqrt(F.aggregate(v, F.lit(0.0),
                              lambda a, x: a + x.cast("double") * x))


def cosine_col(a: Column, b: Column) -> Column:
    return F.round(_dot(a, b) / (_norm(a) * _norm(b)), 6)


def _stack(batch: pd.Series) -> np.ndarray:
    """Arrow list column -> (n, dim) float64 matrix (one copy, no loops)."""
    return np.array(batch.tolist(), dtype=np.float64)


def brute_force_topk(corpus: DataFrame, queries: DataFrame, k: int = 5,
                     vec_col: str = "embedding", id_col: str = "vec_id",
                     query_id_col: str = "query_id") -> DataFrame:
    """Exact top-k by cosine: broadcast the queries, score every corpus row,
    rank per query. Deterministic tie-break by corpus id."""
    from .partitioning import widen_small_input
    q = queries.select(F.col(query_id_col),
                       F.col(vec_col).alias("_qv"))
    scored = (widen_small_input(corpus)
              .select(F.col(id_col), F.col(vec_col).alias("_cv"))
              .crossJoin(F.broadcast(q))
              .select(query_id_col, id_col,
                      cosine_col(F.col("_cv"), F.col("_qv")).alias("cosine")))
    w = Window.partitionBy(query_id_col).orderBy(
        F.desc("cosine"), F.asc(id_col))
    return (scored.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k))


def hyperplanes(dim: int, n_planes: int, seed: int = 42) -> list[list[float]]:
    rng = np.random.default_rng(seed)
    return rng.standard_normal((n_planes, dim)).round(6).tolist()


def _bucket_udf(spark_context, planes: list[list[float]]):
    """Hyperplane-signature bucket UDF over a broadcast plane matrix.

    bit_i = sign(v · p_i); bucket = big-endian integer of the bits (plane 0
    is the MSB — same encoding the literal round-3 version produced with
    ``out*2 + bit``). One matmul per Arrow batch; the plan holds one UDF
    node however many planes there are.
    """
    bc = spark_context.broadcast(np.asarray(planes, dtype=np.float64))
    weights = 2 ** np.arange(len(planes) - 1, -1, -1, dtype=np.int64)

    @pandas_udf("long")
    def bucket(batch: pd.Series) -> pd.Series:
        if batch.empty:
            return pd.Series([], dtype="int64")
        bits = (_stack(batch) @ bc.value.T) >= 0.0
        return pd.Series(bits.astype(np.int64) @ weights)

    return bucket


def signature_col(vec: Column, planes: list[list[float]]) -> Column:
    """Random-hyperplane signature as an int bucket id.

    Convenience wrapper creating a fresh broadcast per call — inside an
    operator that signs several columns (e.g. :func:`lsh_bucketed_topk`),
    build :func:`_bucket_udf` once and reuse it so the planes broadcast
    ships once.
    """
    from pyspark.sql import SparkSession
    sc = SparkSession.getActiveSession().sparkContext
    return _bucket_udf(sc, planes)(vec)


def lsh_bucketed_topk(corpus: DataFrame, queries: DataFrame, k: int = 5,
                      n_planes: int = 6, dim: int | None = None,
                      vec_col: str = "embedding", id_col: str = "vec_id",
                      query_id_col: str = "query_id",
                      seed: int = 42) -> DataFrame:
    """ANN top-k: equi-join on the hyperplane bucket, exact rerank within.

    Recall < 1 by construction (report it against :func:`brute_force_topk`
    in tests); cost drops from |corpus|·|queries| to bucket-local work.
    """
    if dim is None:
        dim = len(corpus.select(vec_col).first()[0])
    from .partitioning import widen_small_input
    planes = hyperplanes(dim, n_planes, seed)
    bucket = _bucket_udf(corpus.sparkSession.sparkContext, planes)
    c = (widen_small_input(corpus)
         .select(F.col(id_col), F.col(vec_col).alias("_cv"),
                 bucket(F.col(vec_col)).alias("_bucket")))
    q = queries.select(F.col(query_id_col), F.col(vec_col).alias("_qv"),
                       bucket(F.col(vec_col)).alias("_bucket"))
    scored = (c.join(F.broadcast(q), "_bucket")
              .select(query_id_col, id_col,
                      cosine_col(F.col("_cv"), F.col("_qv")).alias("cosine")))
    w = Window.partitionBy(query_id_col).orderBy(
        F.desc("cosine"), F.asc(id_col))
    return (scored.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k))


def seed_centroids(corpus: DataFrame, n_lists: int = 16,
                   vec_col: str = "embedding", id_col: str = "vec_id",
                   seed: int = 42) -> list[list[float]]:
    """Deterministic hash-sampled centroid seeding, fully distributed:
    rank rows by a seeded ``xxhash64`` of the id (a deterministic uniform
    shuffle) and take the first ``n_lists`` — Spark plans
    ``orderBy(...).limit(n)`` as TakeOrderedAndProject (per-partition
    top-n, driver merges only n rows), so the ONLY driver materialization
    is the ≤``n_lists`` centroid rows. No full-corpus ``collect()`` /
    ``count()`` anywhere (the round-1 version collected every corpus id —
    a driver OOM at 10^10 rows)."""
    cents = [r[0] for r in
             corpus.select(F.col(vec_col),
                           F.xxhash64(F.col(id_col), F.lit(seed)).alias("_h"))
             .orderBy("_h", vec_col)
             .limit(n_lists)
             .select(vec_col).collect()]
    return [[float(x) for x in c] for c in cents]


def ivf_assign(corpus: DataFrame, n_lists: int = 16,
               vec_col: str = "embedding", id_col: str = "vec_id",
               seed: int = 42) -> tuple[DataFrame, list[list[float]]]:
    """IVF list assignment with hash-sampled centroids (untrained; see
    :func:`ivf_kmeans` for the Lloyd-trained variant). Returns
    (corpus + ``ivf_list``, centroids)."""
    cents = seed_centroids(corpus, n_lists, vec_col, id_col, seed)
    return ivf_assign_with(corpus, cents, vec_col), cents


def kmeans_iterate(corpus: DataFrame, centroids: list[list[float]],
                   n_iters: int = 1, vec_col: str = "embedding",
                   round_decimals: int = 6) -> list[list[float]]:
    """Lloyd iterations as DataFrame jobs over the GIVEN centroids.

    Each iteration: assignment via :func:`ivf_assign_with` (one broadcast
    matmul per Arrow batch, no shuffle), then centroid update =
    ``groupBy(ivf_list)`` with one ``avg`` per dimension — map-side partial
    aggregation, one shuffle of ≤ n_lists × dim partials; only the
    ≤ n_lists centroid rows ever reach the driver (they must: they are the
    next iteration's broadcast). Components are rounded to
    ``round_decimals`` so the result is reproducible across aggregation
    orders and engines (float summation order is not associative — the
    DuckDB oracle reproduces the same rounded update). Lists that receive
    no vectors keep their previous centroid."""
    dim = len(centroids[0])
    for _ in range(n_iters):
        assigned = ivf_assign_with(corpus, centroids, vec_col)
        aggs = [F.round(F.avg(F.col(vec_col).getItem(i)), round_decimals)
                .alias(f"c{i}") for i in range(dim)]
        rows = assigned.groupBy("ivf_list").agg(*aggs).collect()
        new_c = [list(c) for c in centroids]
        for r in rows:
            new_c[r["ivf_list"]] = [float(r[f"c{i}"]) for i in range(dim)]
        centroids = new_c
    return centroids


def ivf_kmeans(corpus: DataFrame, n_lists: int = 16, n_iters: int = 2,
               vec_col: str = "embedding", id_col: str = "vec_id",
               seed: int = 42) -> tuple[DataFrame, list[list[float]]]:
    """IVF with Lloyd-TRAINED centroids: hash-sampled seeding
    (:func:`seed_centroids`) refined by ``n_iters`` k-means iterations —
    closes the round-2 'centroids are hash-sampled, not trained' gap.
    Returns (corpus + ``ivf_list``, trained centroids)."""
    cents = seed_centroids(corpus, n_lists, vec_col, id_col, seed)
    cents = kmeans_iterate(corpus, cents, n_iters, vec_col)
    return ivf_assign_with(corpus, cents, vec_col), cents


def _centroid_broadcast(df: DataFrame, centroids: list[list[float]]):
    """Broadcast (C, ||C|| with zero-norm→1 guard) once per operator call."""
    C = np.asarray(centroids, dtype=np.float64)
    cnorm = np.sqrt((C * C).sum(axis=1))
    cnorm_safe = np.where(cnorm == 0.0, 1.0, cnorm)
    return df.sparkSession.sparkContext.broadcast((C, cnorm, cnorm_safe))


def ivf_assign_with(corpus: DataFrame, centroids: list[list[float]],
                    vec_col: str = "embedding") -> DataFrame:
    """Assign each vector to its nearest of the GIVEN centroids (cosine;
    first index wins ties, zero norms guarded — same semantics the DuckDB
    oracle states with ``greatest(sqrt(·),1e-12)`` and ``ORDER BY sim
    DESC, cid ASC``). Centroids travel as one broadcast matrix; the
    per-batch kernel is a single ``V @ C.T`` matmul + row argmax
    (``np.argmax`` returns the FIRST maximal index). Split out of
    :func:`ivf_assign` so callers with externally chosen centroids (tests,
    the SQL-oracle query, :func:`kmeans_iterate`) share the assignment
    plan."""
    from .partitioning import widen_small_input
    corpus = widen_small_input(corpus)
    bc = _centroid_broadcast(corpus, centroids)

    @pandas_udf("int")
    def assign(batch: pd.Series) -> pd.Series:
        if batch.empty:
            return pd.Series([], dtype="int32")
        C, _, cnorm_safe = bc.value
        V = _stack(batch)
        vnorm = np.maximum(np.sqrt((V * V).sum(axis=1)), 1e-12)
        sims = (V @ C.T) / (vnorm[:, None] * cnorm_safe[None, :])
        return pd.Series(np.argmax(sims, axis=1).astype(np.int32))

    return corpus.withColumn("ivf_list", assign(F.col(vec_col)))


def ivf_write_partitioned(assigned: DataFrame, path: str) -> None:
    """Persist an IVF-assigned corpus partitioned by ``ivf_list`` — the
    storage layout that makes probe-routed search scan ``nprobe/n_lists``
    of the data: a search filtered to its probe lists becomes a parquet
    PartitionFilter, so non-probed lists are never opened (dynamic
    partition pruning at the scan, pinned by
    ``test_ivf_partitioned_search_prunes``)."""
    assigned.write.mode("overwrite").partitionBy("ivf_list").parquet(path)


def ivf_topk_from_partitioned(spark, path: str,
                              centroids: list[list[float]],
                              queries: DataFrame, k: int = 5,
                              nprobe: int = 2, vec_col: str = "embedding",
                              id_col: str = "vec_id",
                              query_id_col: str = "query_id") -> DataFrame:
    """IVF search over a :func:`ivf_write_partitioned` corpus. Same
    semantics as :func:`ivf_topk`; the probed-lists join is pushed into
    the partitioned scan (the broadcast probe side drives dynamic
    partition pruning), so only ``nprobe``-worth of partitions is read."""
    assigned = spark.read.parquet(path)
    return ivf_topk(assigned, centroids, queries, k=k, nprobe=nprobe,
                    vec_col=vec_col, id_col=id_col,
                    query_id_col=query_id_col)


def ivf_topk(assigned: DataFrame, centroids: list[list[float]],
             queries: DataFrame, k: int = 5, nprobe: int = 2,
             vec_col: str = "embedding", id_col: str = "vec_id",
             query_id_col: str = "query_id") -> DataFrame:
    """Search only the ``nprobe`` nearest inverted lists per query.

    Probe routing is a broadcast-matrix matmul + stable argsort per Arrow
    batch (ties → lower list index, matching the oracle's ``ORDER BY sim
    DESC, cid ASC``; norms unguarded like the round-3 ``F.transform``
    sims). The exact rerank inside probed lists stays JVM-side
    (:func:`cosine_col`) — it compares data rows, no model literals."""
    bc = _centroid_broadcast(queries, centroids)
    nprobe = min(nprobe, len(centroids))

    @pandas_udf("array<int>")
    def probe_lists(batch: pd.Series) -> pd.Series:
        if batch.empty:
            return pd.Series([], dtype=object)
        C, cnorm, _ = bc.value
        Q = _stack(batch)
        qnorm = np.sqrt((Q * Q).sum(axis=1))
        sims = (Q @ C.T) / (qnorm[:, None] * cnorm[None, :])
        order = np.argsort(-sims, axis=1, kind="stable")[:, :nprobe]
        return pd.Series([row.astype(np.int32).tolist() for row in order])

    q = (queries
         .withColumn("_probes", probe_lists(F.col(vec_col)))
         .select(F.col(query_id_col), F.col(vec_col).alias("_qv"),
                 F.explode("_probes").alias("ivf_list")))
    scored = (assigned.join(F.broadcast(q), "ivf_list")
              .select(query_id_col, id_col,
                      cosine_col(F.col(vec_col), F.col("_qv")).alias("cosine")))
    w = Window.partitionBy(query_id_col).orderBy(
        F.desc("cosine"), F.asc(id_col))
    return (scored.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k))

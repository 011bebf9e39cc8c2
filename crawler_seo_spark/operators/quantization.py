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

from typing import Iterator

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
    from .partitioning import widen_small_input
    corpus = widen_small_input(corpus)
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
    # Only the RAW query matrix is broadcast (O(n_q·dim)); the per-query
    # lookup tables (O(n_q·m·k)) are derived executor-side, once per
    # task (iterator UDF form) — the driver never materializes them, so
    # the probe-set bound is the collect above (shared with
    # brute_force_topk), not an m·k-times-larger LUT allocation. Same
    # einsum ⇒ bit-identical scores.
    sc = codes_df.sparkSession.sparkContext
    b_q, b_cb = sc.broadcast(Q), sc.broadcast(cb)

    @F.pandas_udf("array<double>")
    def scores(batches: Iterator[pd.Series]) -> Iterator[pd.Series]:
        Qm, cbl = b_q.value, b_cb.value
        mm, _, dd = cbl.shape
        L = np.einsum("qbd,bkd->qbk", Qm.reshape(len(Qm), mm, dd), cbl)
        N2 = (cbl * cbl).sum(2)                    # (m, k)
        QN = np.sqrt((Qm * Qm).sum(1))
        for batch in batches:
            C = np.vstack([np.asarray(c, dtype=np.int64) for c in batch])
            ar = np.arange(C.shape[1])
            ip = L[:, ar, C].sum(axis=2)           # (Q, N)
            vn = np.sqrt(N2[ar, C].sum(axis=1))    # (N,)
            s = ip / np.maximum(QN[:, None] * vn[None, :], 1e-12)
            yield pd.Series(list(np.round(s.T, 6)))

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


# ---------------------------------------------------------------------------
# IVF-PQ (IVFADC): coarse routing + residual codes — the composition a
# billion-vector index actually ships (probe nprobe/n_lists of the data,
# score 8-byte codes, never touch a float vector)
# ---------------------------------------------------------------------------

def ivfpq_build(corpus: DataFrame, n_lists: int = 16, m: int = 8,
                k: int = 16, n_iters: int = 2, id_col: str = "vec_id",
                vec_col: str = "embedding"):
    """Build the IVF-PQ index: coarse k-means lists (reusing the IVF
    trainer), then a PQ codebook trained on RESIDUALS ``v − c(list)``
    (Jégou 2011's IVFADC — residuals are far more quantizable than raw
    vectors because the coarse step removed the between-cluster
    variance). Returns ``(codes_df, centroids, codebook)`` where
    ``codes_df`` is ``(id, ivf_list, codes)`` — 4+m bytes of index per
    vector. Residual subtraction is one broadcast-matrix pandas UDF;
    nothing here shuffles except the trainers' own aggregations."""
    from .similarity import ivf_kmeans

    assigned, centroids = ivf_kmeans(corpus, n_lists=n_lists,
                                     n_iters=n_iters, vec_col=vec_col)
    resid = _with_residual(assigned, centroids, vec_col)
    cb = pq_train(resid.select(id_col, "ivf_list",
                               F.col("_resid").alias(vec_col)),
                  m=m, k=k, n_iters=n_iters, id_col=id_col,
                  vec_col=vec_col)
    codes = pq_encode_with(resid, cb, id_col, "_resid") \
        .join(resid.select(id_col, "ivf_list"), id_col)
    return codes, centroids, cb


def _with_residual(assigned: DataFrame, centroids, vec_col: str):
    C = np.asarray(centroids, dtype=np.float64)
    sc = assigned.sparkSession.sparkContext
    b_c = sc.broadcast(C)

    @F.pandas_udf("array<double>")
    def resid(vecs: pd.Series, lists: pd.Series) -> pd.Series:
        Cl = b_c.value
        V = np.vstack([np.asarray(v, dtype=np.float64) for v in vecs])
        R = V - Cl[lists.to_numpy()]
        return pd.Series(list(R))

    return assigned.withColumn(
        "_resid", resid(F.col(vec_col), F.col("ivf_list")))


def ivfpq_search(codes_df: DataFrame, centroids, codebook,
                 queries: DataFrame, k: int = 5, nprobe: int = 4,
                 id_col: str = "vec_id",
                 query_id_col: str = "query_id",
                 vec_col: str = "embedding") -> DataFrame:
    """ADC top-k by cosine over the IVF-PQ index: route each query to
    its ``nprobe`` nearest lists, scan ONLY those lists' codes
    (``ivf_list IN probed-union`` — partition pruning when the codes are
    stored partitioned by list), and score reconstructions
    ``v̂ = c(list) + r̂(codes)`` entirely from precomputed tables:

        ip(q, v̂)  = QC[q, list]  + Σ_b QLUT[q, b, code]
        |v̂|²      = CN2[list] + 2·Σ_b CLUT[list, b, code]
                     + Σ_b N2[b, code]

    (blocks span disjoint coordinates, so the residual's norm is the
    plain per-block sum; the list↔block cross terms are the CLUT table).
    Every table is O(n_lists·m·k) numpy, derived once per task from the
    broadcast raw inputs — scoring never reconstructs a vector and the
    driver never holds a LUT. A (query, list) pair the query did NOT probe
    is masked out, so results match a per-query probed scan exactly.
    Ties break to the lower vec_id (brute_force_topk contract)."""
    from pyspark.sql import Window

    from .partitioning import widen_small_input
    codes_df = widen_small_input(codes_df)
    cb = _as_codebook(codebook)
    m, kk, dsub = cb.shape
    C = np.asarray(centroids, dtype=np.float64)
    n_lists = len(C)
    nprobe = min(nprobe, n_lists)
    q_rows = queries.select(query_id_col, vec_col).orderBy(
        query_id_col).collect()
    qids = [r[0] for r in q_rows]
    Q = np.vstack([np.asarray(r[1], dtype=np.float64) for r in q_rows])
    qnorm = np.maximum(np.sqrt((Q * Q).sum(1)), 1e-12)
    cnorm = np.maximum(np.sqrt((C * C).sum(1)), 1e-12)
    sims = (Q @ C.T) / (qnorm[:, None] * cnorm[None, :])
    probe = np.argsort(-sims, axis=1, kind="stable")[:, :nprobe]
    probed_union = sorted({int(x) for x in probe.ravel()})
    mask = np.zeros((len(Q), n_lists), dtype=bool)
    for qi in range(len(Q)):
        mask[qi, probe[qi]] = True

    # Broadcast only the raw inputs (queries O(n_q·dim), centroids,
    # codebook, probe mask); every lookup table — QC (n_q·n_lists), the
    # per-query QLUT (n_q·m·k), CLUT, CN2, N2 — is built executor-side
    # once per task. The r5 form collected the queries AND expanded the
    # tables on the driver; now the driver's footprint is the query
    # matrix + routing only, and broadcast bytes shrink by the m·k LUT
    # factor. Same numpy expressions ⇒ bit-identical scores.
    sc = codes_df.sparkSession.sparkContext
    b = sc.broadcast((Q, C, cb, qnorm, mask))

    @F.pandas_udf("array<double>")
    def scores(batches: Iterator[tuple[pd.Series, pd.Series]]) \
            -> Iterator[pd.Series]:
        Q_, C_, cb_, QN_, MASK_ = b.value
        nq, nl = len(Q_), len(C_)
        mm, _, dd = cb_.shape
        QC_ = Q_ @ C_.T                                 # (Q, n_lists)
        QLUT_ = np.einsum("qbd,bkd->qbk", Q_.reshape(nq, mm, dd), cb_)
        CLUT_ = np.einsum("lbd,bkd->lbk", C_.reshape(nl, mm, dd), cb_)
        CN2_ = (C_ * C_).sum(1)                         # (n_lists,)
        N2_ = (cb_ * cb_).sum(2)                        # (m, k)
        for codes, lists in batches:
            Cd = np.vstack([np.asarray(c, dtype=np.int64) for c in codes])
            ls = lists.to_numpy()
            ar = np.arange(Cd.shape[1])
            r_ip = QLUT_[:, ar, Cd].sum(axis=2)         # (Q, N)
            ip = QC_[:, ls] + r_ip
            v2 = (CN2_[ls]
                  + 2.0 * CLUT_[ls[:, None], ar[None, :], Cd].sum(axis=1)
                  + N2_[ar, Cd].sum(axis=1))            # (N,)
            s = ip / np.maximum(QN_[:, None]
                                * np.sqrt(np.maximum(v2, 0.0)), 1e-12)
            s = np.where(MASK_[:, ls], s, -np.inf)
            yield pd.Series(list(np.round(s.T, 6)))

    qmap = F.array(*[F.lit(q) for q in qids])
    scored = (codes_df.filter(F.col("ivf_list").isin(probed_union))
              .select(F.col(id_col),
                      scores(F.col("codes"), F.col("ivf_list"))
                      .alias("_s"))
              .select(id_col, F.posexplode("_s").alias("_qi", "score"))
              .filter(F.col("score") > float("-1e308"))
              .select(F.element_at(qmap, F.col("_qi") + 1)
                      .alias(query_id_col),
                      F.col(id_col), "score"))
    w = Window.partitionBy(query_id_col).orderBy(
        F.desc("score"), F.asc(id_col))
    return (scored.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k))

"""Product quantization: encode parity, training convergence, ADC recall."""

import numpy as np
import pytest
from pyspark.sql import functions as F  # noqa: F401


@pytest.fixture(scope="module")
def clustered(spark):
    rng = np.random.default_rng(7)
    centers = rng.standard_normal((10, 16)) * 3
    pts = np.vstack([c + 0.3 * rng.standard_normal((30, 16))
                     for c in centers])
    rows = [(i, [float(x) for x in v]) for i, v in enumerate(pts)]
    df = spark.createDataFrame(rows,
                               "vec_id long, embedding array<float>")
    return df, pts.astype(np.float64)


def _qerr(cb, V):
    m = cb.shape[0]
    Vb = V.reshape(len(V), m, -1)
    e = 0.0
    for b in range(m):
        x, c = Vb[:, b, :], cb[b]
        d = ((x * x).sum(1)[:, None] + (c * c).sum(1)[None, :]
             - 2 * (x @ c.T))
        e += d.min(1).sum()
    return e


def test_pq_encode_matches_numpy(clustered):
    from crawler_seo_spark.operators.quantization import (
        pq_encode_with, pq_seed_codebook)
    df, V = clustered
    cb = pq_seed_codebook(df, m=4, k=8)
    got = {r["vec_id"]: list(r["codes"])
           for r in pq_encode_with(df, cb).collect()}
    Vb = V.reshape(len(V), 4, 4)
    for b in range(4):
        x, c = Vb[:, b, :], cb[b]
        d = ((x * x).sum(1)[:, None] + (c * c).sum(1)[None, :]
             - 2 * (x @ c.T))
        ref = d.argmin(1)
        for i in range(len(V)):
            assert got[i][b] == ref[i], (i, b)


def test_pq_train_reduces_quantization_error(clustered):
    from crawler_seo_spark.operators.quantization import (
        pq_seed_codebook, pq_train)
    df, V = clustered
    seed = pq_seed_codebook(df, m=4, k=8)
    trained = pq_train(df, m=4, k=8, n_iters=2)
    assert _qerr(trained, V) < 0.5 * _qerr(seed, V)


def test_pq_search_recall_and_ranking(clustered):
    from crawler_seo_spark.operators.quantization import (
        pq_encode_with, pq_train, pq_search)
    from crawler_seo_spark.operators.similarity import brute_force_topk
    df, V = clustered
    cb = pq_train(df, m=4, k=8, n_iters=2)
    codes = pq_encode_with(df, cb)
    queries = df.filter("vec_id < 5").withColumnRenamed(
        "vec_id", "query_id")
    approx = pq_search(codes, cb, queries, k=10).collect()
    exact = brute_force_topk(df, queries, k=10).collect()
    by_q = {}
    for r in approx:
        by_q.setdefault(r["query_id"], []).append(r)
    recalls = []
    for q in range(5):
        got = {r["vec_id"] for r in by_q[q]}
        want = {r["vec_id"] for r in exact if r["query_id"] == q}
        recalls.append(len(got & want) / 10)
        # ranks are 1..10 dense, scores non-increasing
        rs = sorted(by_q[q], key=lambda r: r["rank"])
        assert [r["rank"] for r in rs] == list(range(1, 11))
        assert all(rs[i]["score"] >= rs[i + 1]["score"]
                   for i in range(9))
    assert np.mean(recalls) >= 0.5


def test_ivfpq_search_recall_and_pruning(clustered, spark):
    """IVF-PQ composition: residual codes + coarse routing. Recall@10
    holds against brute force, probing ALL lists matches the quality
    ceiling of the quantizer (routing loses nothing at full probe), and
    the scan is pruned to the probed-union lists."""
    from collections import defaultdict
    from crawler_seo_spark.operators.quantization import (
        ivfpq_build, ivfpq_search)
    from crawler_seo_spark.operators.similarity import brute_force_topk

    df, V = clustered
    codes, cents, cb = ivfpq_build(df, n_lists=8, m=4, k=16, n_iters=2)
    assert set(codes.columns) == {"vec_id", "codes", "ivf_list"}

    queries = df.filter("vec_id < 5").withColumnRenamed(
        "vec_id", "query_id")
    exact = brute_force_topk(df, queries, k=10).collect()
    ex = defaultdict(set)
    for r in exact:
        ex[r["query_id"]].add(r["vec_id"])

    def recall(nprobe):
        got = ivfpq_search(codes, cents, cb, queries, k=10,
                           nprobe=nprobe).collect()
        ap = defaultdict(set)
        for r in got:
            ap[r["query_id"]].add(r["vec_id"])
        return sum(len(ex[q] & ap[q]) / 10 for q in ex) / len(ex)

    r_small, r_full = recall(2), recall(8)
    assert r_small >= 0.5
    assert r_full >= r_small - 1e-9   # more probes never hurt

    # pruning: with nprobe=1 and a single query, only that query's top
    # list is scanned (mask + filter agree)
    one_q = df.filter("vec_id = 0").withColumnRenamed(
        "vec_id", "query_id")
    got = ivfpq_search(codes, cents, cb, one_q, k=5, nprobe=1).collect()
    lists_hit = {r["ivf_list"] for r in codes.join(
        spark.createDataFrame([(r["vec_id"],) for r in got],
                              "vec_id long"), "vec_id").collect()}
    assert len(lists_hit) == 1

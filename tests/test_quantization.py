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

"""Similarity-search correctness: Spark plans vs numpy ground truth."""

import numpy as np
import pytest


@pytest.fixture(scope="module")
def emb(spark):
    rng = np.random.RandomState(7)
    vecs = rng.randn(60, 16).astype(np.float32)
    vecs[7] = vecs[3] + rng.randn(16).astype(np.float32) * 0.01  # planted near-dup
    rows = [(int(i), [float(x) for x in vecs[i]]) for i in range(60)]
    df = spark.createDataFrame(rows, "vec_id bigint, embedding array<float>")
    return df, vecs.astype(np.float64)


def _numpy_topk(vecs, qids, k):
    nrm = vecs / np.linalg.norm(vecs, axis=1, keepdims=True)
    sims = nrm @ nrm.T
    out = {}
    for q in qids:
        order = [
            (round(-sims[q, j], 4), j) for j in range(len(vecs)) if j != q
        ]
        order.sort()
        out[q] = [j for _, j in order[:k]]
    return out


def test_cosine_topk_matches_numpy(spark, emb):
    from mindocr_spark.functions.similarity import cosine_topk

    df, vecs = emb
    got = cosine_topk(df, df.where("vec_id < 5"), k=3).collect()
    expect = _numpy_topk(vecs, range(5), 3)
    by_q = {}
    for r in sorted(got, key=lambda r: (r["query_id"], r["rank"])):
        by_q.setdefault(r["query_id"], []).append(r["neighbor_id"])
    assert by_q == {q: expect[q] for q in range(5)}


def test_lsh_topk_recall(spark, emb):
    from mindocr_spark.functions.similarity import cosine_topk, lsh_topk

    df, vecs = emb
    exact = {(r["query_id"], r["neighbor_id"]) for r in
             cosine_topk(df, df.where("vec_id < 10"), k=3).collect()}
    approx = {(r["query_id"], r["neighbor_id"]) for r in
              lsh_topk(df, df.where("vec_id < 10"), k=3, n_bits=6, dim=16).collect()}
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.5  # multi-probe single-table LSH on random gaussians


def test_embedding_neardup_finds_planted_pair(spark, emb):
    from mindocr_spark.functions.similarity import embedding_neardup_pairs

    df, _ = emb
    exact_pairs = {(r["id_a"], r["id_b"]) for r in
                   embedding_neardup_pairs(df, threshold=0.97, exact=True).collect()}
    assert (3, 7) in exact_pairs
    lsh_pairs = {(r["id_a"], r["id_b"]) for r in
                 embedding_neardup_pairs(
                     df, threshold=0.97, n_bits=6, dim=16).collect()}
    assert (3, 7) in lsh_pairs  # true near-dups collide in probe buckets


def test_ivf_topk_recall(spark, emb):
    from mindocr_spark.functions.similarity import cosine_topk, ivf_topk

    df, vecs = emb
    exact = {(r["query_id"], r["neighbor_id"]) for r in
             cosine_topk(df, df.where("vec_id < 10"), k=3).collect()}
    approx = {(r["query_id"], r["neighbor_id"]) for r in
              ivf_topk(df, df.where("vec_id < 10"), k=3,
                       centroid_stride=10, n_probe=3).collect()}
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.4  # 3 of 6 lists probed on random gaussians
    # the planted near-dup pair shares a list with overwhelming margin
    top7 = [r["neighbor_id"] for r in
            ivf_topk(df, df.where("vec_id = 7"), k=1,
                     centroid_stride=10, n_probe=3).collect()]
    assert top7 == [3]


def test_vector_expressions_deterministic_order(spark):
    """dot() folds left→right: association order is pinned (the engine's
    byte-determinism discipline extends to float accumulation)."""
    from pyspark.sql import functions as F
    from mindocr_spark.functions.similarity import dot, vec_double

    df = spark.createDataFrame(
        [([0.1, 0.2, 0.3], [1.0, 2.0, 3.0])], "a array<float>, b array<float>"
    )
    v = df.select(dot(vec_double("a"), vec_double("b")).alias("d")).collect()[0]["d"]
    a = [np.float64(np.float32(x)) for x in (0.1, 0.2, 0.3)]
    b = [np.float64(np.float32(x)) for x in (1.0, 2.0, 3.0)]
    expect = ((0.0 + a[0] * b[0]) + a[1] * b[1]) + a[2] * b[2]
    assert v == expect

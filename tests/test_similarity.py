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
              ivf_topk(df, df.where("vec_id < 10"), k=3, n_probe=3).collect()}
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.4  # n_probe of ~√n lists probed on random gaussians
    # the planted near-dup pair shares a list with overwhelming margin
    top7 = [r["neighbor_id"] for r in
            ivf_topk(df, df.where("vec_id = 7"), k=1, n_probe=3).collect()]
    assert top7 == [3]


def test_ivf_fast_assignment_matches_exact(spark, emb):
    """The numpy-matmul production assignment and the pinned-fold exact
    assignment agree wherever margins exceed float noise — on these
    vectors, everywhere."""
    from mindocr_spark.functions.similarity import ivf_topk

    df, _ = emb
    exact = {(r["query_id"], r["rank"]): r["neighbor_id"] for r in
             ivf_topk(df, df.where("vec_id < 10"), k=3).collect()}
    fast = {(r["query_id"], r["rank"]): r["neighbor_id"] for r in
            ivf_topk(df, df.where("vec_id < 10"), k=3,
                     assign_mode="fast").collect()}
    assert exact == fast


def test_ivf_centroid_count_bounded():
    """The centroid grid stays O(√n) and hard-capped as the corpus grows
    — the broadcast can never scale with corpus size (the fixed-stride
    formulation broadcast n/stride centroids, an OOM at 100 TB)."""
    import math
    from mindocr_spark.functions.similarity import ivf_centroid_plan

    for n in (100, 10_000, 1_000_000, 10**9, 10**12):
        k, stride = ivf_centroid_plan(n)
        assert k <= 65_536
        assert k <= math.isqrt(n) + 1
        # seed count over contiguous ids = ceil(n / stride) ≈ k, never
        # more than ~2k (stride = n // k rounds down)
        n_seeds = -(-n // stride)
        assert n_seeds <= 2 * k + 1


def test_neardup_bits_scale_with_corpus(spark, emb):
    """Adaptive n_bits keeps expected bucket occupancy ~constant as the
    corpus grows, and the planted pair is still found at the auto bits."""
    from mindocr_spark.functions.similarity import (
        embedding_neardup_pairs,
        neardup_bits_plan,
    )

    occ = [n / (1 << neardup_bits_plan(n)) for n in (10**4, 10**5, 10**6, 10**7)]
    assert max(occ) <= 1.0  # ~n/4n per bucket, not growing with n
    # beyond the recall clamp (24 bits) occupancy grows again — that is
    # the explicit recall/width tradeoff, raised via the hi parameter
    assert neardup_bits_plan(10**12) == 24
    df, _ = emb
    auto_pairs = {(r["id_a"], r["id_b"]) for r in
                  embedding_neardup_pairs(df, threshold=0.97, dim=16).collect()}
    assert (3, 7) in auto_pairs


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


def test_semdedup_flags_planted_neardup_min_id_survives(spark, emb):
    """The planted 3≈7 pair must land in one cluster and flag only the
    HIGHER id (min-id survivor rule); every input row is reported."""
    from mindocr_spark.functions.similarity import semdedup_flags

    df, _ = emb
    out = {r["vec_id"]: r for r in
           semdedup_flags(df, threshold=0.97).collect()}
    assert len(out) == 60  # flag-style: nothing vanishes
    assert out[3]["cid"] == out[7]["cid"]
    assert not out[3]["is_dup"] and out[7]["is_dup"]


def test_ivf_centroid_plan_target_cluster_linear_mode(spark):
    """target_cluster bounds cluster SIZE (k ≈ n/target) instead of
    cluster count — the linear-total-work plan for within-cluster
    quadratic consumers; still capped at the broadcastable 65k."""
    import pytest

    from mindocr_spark.functions.similarity import ivf_centroid_plan

    k, stride = ivf_centroid_plan(10_000, target_cluster=128)
    assert k == -(-10_000 // 128) and stride == 10_000 // k
    # size bound: n/k ≤ target (up to seed-grid rounding)
    assert 10_000 / k <= 128 + 1
    k_big, _ = ivf_centroid_plan(10**9, target_cluster=128)
    assert k_big == 65_536  # the broadcast cap still rules
    with pytest.raises(ValueError):
        ivf_centroid_plan(100, target_cluster=0)


def test_semdedup_target_cluster_still_flags_exact_dups(spark, emb):
    """The linear-k scale plan changes the clustering, never the
    contract: a planted near-identical pair sharing a cluster still
    flags the higher id, and every row is still reported."""
    from mindocr_spark.functions.similarity import semdedup_flags

    df, _ = emb
    out = {r["vec_id"]: r for r in
           semdedup_flags(df, threshold=0.97,
                          target_cluster=8).collect()}
    assert len(out) == 60  # flag-style: nothing vanishes
    if out[3]["cid"] == out[7]["cid"]:  # pair still co-clustered
        assert not out[3]["is_dup"] and out[7]["is_dup"]


def test_semdedup_never_compares_across_clusters(spark):
    """Two identical vectors forced into different clusters must NOT
    flag each other — in-cluster pairing is the SemDeDup contract
    (recall is the clustering's job, not the pair join's)."""
    import numpy as np
    from mindocr_spark.functions.similarity import (
        build_ivf_index, semdedup_flags,
    )

    rng = np.random.RandomState(3)
    # two tight orthogonal-ish blobs; ids interleaved so the id-grid
    # seeds hit both blobs
    a = rng.randn(16); a /= np.linalg.norm(a)
    b = np.roll(a, 8) * -1.0
    rows = []
    for i in range(40):
        base = a if i % 2 == 0 else b
        v = base + rng.randn(16) * 0.01
        rows.append((int(i), [float(x) for x in v]))
    df = spark.createDataFrame(rows, "vec_id bigint, embedding array<float>")
    _, cent, assign_fn = build_ivf_index(df)
    flags = semdedup_flags(df, threshold=0.999).collect()
    by_id = {r["vec_id"]: r for r in flags}
    # sanity: the blobs landed in >1 cluster
    assert len({r["cid"] for r in flags}) >= 2
    # identical-threshold pairs exist only within a blob; any flagged
    # vec must share a cluster with a smaller-id same-blob vec
    for r in flags:
        if r["is_dup"]:
            assert any(
                o["vec_id"] < r["vec_id"] and o["cid"] == r["cid"]
                for o in flags
            )


def test_semdedup_threshold_one_point_oh_flags_only_exact(spark):
    from mindocr_spark.functions.similarity import semdedup_flags

    rows = [
        (1, [1.0, 0.0, 0.0, 0.0]),
        (2, [1.0, 0.0, 0.0, 0.0]),   # exact copy of 1
        (3, [0.9, 0.1, 0.0, 0.0]),   # near but not exact
    ]
    df = spark.createDataFrame(rows, "vec_id bigint, embedding array<float>")
    out = {r["vec_id"]: r["is_dup"]
           for r in semdedup_flags(df, threshold=1.0).collect()}
    assert out == {1: False, 2: True, 3: False}


class TestBitextMine:
    def _emb(self, spark, rows):
        return spark.createDataFrame(
            [(i, [float(x) for x in v]) for i, v in rows],
            "vec_id bigint, embedding array<float>",
        )

    def test_mutual_and_margin_golden(self, spark):
        from mindocr_spark.functions.similarity import bitext_mine

        # src 1 aligns cleanly with tgt 10; src 2 is ambiguous
        # (two equidistant targets -> margin 0, dropped)
        src = self._emb(spark, [(1, [1, 0, 0]), (2, [0, 1, 1])])
        tgt = self._emb(spark, [
            (10, [0.9, 0.1, 0.0]),   # near src 1
            (11, [0.0, 1.0, 0.0]),   # equidistant to src 2...
            (12, [0.0, 0.0, 1.0]),   # ...as this one
        ])
        out = bitext_mine(src, tgt, min_margin=0.01).collect()
        pairs = {(r["src_id"], r["tgt_id"]) for r in out}
        assert pairs == {(1, 10)}
        r = out[0]
        assert r["margin"] > 0.5  # clean separation
        assert 0.9 < r["cos_fwd"] <= 1.0

    def test_mutuality_kills_hub_target(self, spark):
        from mindocr_spark.functions.similarity import bitext_mine

        # both sources' best target is the hub (20); only src 5 is the
        # hub's best source, so src 6's pair must be rejected
        src = self._emb(spark, [(5, [1, 0.0, 0]), (6, [0.9, 0.3, 0])])
        tgt = self._emb(spark, [(20, [1, 0.05, 0]), (21, [0, 0, 1])])
        out = bitext_mine(src, tgt, min_margin=0.0).collect()
        pairs = {(r["src_id"], r["tgt_id"]) for r in out}
        assert (5, 20) in pairs
        assert (6, 20) not in pairs

    def test_single_target_no_margin_evidence(self, spark):
        from mindocr_spark.functions.similarity import bitext_mine

        src = self._emb(spark, [(1, [1, 0])])
        tgt = self._emb(spark, [(10, [1, 0])])
        assert bitext_mine(src, tgt).count() == 0  # no runner-up

    def test_broadcast_query_side(self, spark):
        from mindocr_spark.functions.similarity import bitext_mine
        from pyspark.sql import functions as F

        emb = spark.read.parquet(
            "/root/testdata/sf0.001/embeddings.parquet"
        )
        plan = (
            bitext_mine(
                emb.where(F.col("vec_id") % 50 == 0),
                emb.where(F.col("vec_id") % 2 == 1),
            )._jdf.queryExecution().executedPlan().toString()
        )
        assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan
        assert "BatchEvalPython" not in plan


class TestClusterMix:
    def test_budget_conservation_and_boost_direction(self, spark):
        """Floored allocations never exceed the budget; a small
        cluster's boost > 1 > a big cluster's boost (α=0.5 up-weights
        tails); shares are complete (every cluster has one row)."""
        from mindocr_spark.functions.similarity import (
            cluster_mix_allocation,
        )

        emb = spark.read.parquet(
            "/root/testdata/sf0.001/embeddings.parquet"
        )
        rows = cluster_mix_allocation(emb, budget=10_000).collect()
        assert rows
        assert sum(r["alloc_docs"] for r in rows) <= 10_000
        assert sum(r["n_vecs"] for r in rows) == emb.count()
        big = max(rows, key=lambda r: r["n_vecs"])
        small = min(rows, key=lambda r: r["n_vecs"])
        if big["n_vecs"] > small["n_vecs"]:
            assert small["boost"] > big["boost"]
            assert small["boost"] > 1.0 > big["boost"]

    def test_uniform_clusters_allocate_evenly(self, spark):
        """Equal-size clusters get equal temperature shares."""
        from mindocr_spark.functions.similarity import (
            cluster_mix_allocation,
        )

        # 4 well-separated direction groups × 4 vectors, ids laid out
        # so the id-grid seeds (stride 4) pick one seed per group
        dirs = [[1.0, 0, 0, 0], [0, 1.0, 0, 0], [0, 0, 1.0, 0],
                [0, 0, 0, 1.0]]
        data = []
        for i in range(16):
            base = dirs[i // 4]
            v = [x * (1.0 + 0.01 * (i % 4)) for x in base]
            data.append((i, v))
        emb = spark.createDataFrame(
            data, "vec_id bigint, embedding array<double>"
        )
        rows = cluster_mix_allocation(emb, budget=8_000).collect()
        assert len(rows) == 4
        assert {r["n_vecs"] for r in rows} == {4}
        assert len({r["temp_share"] for r in rows}) == 1
        assert all(r["alloc_docs"] == 2_000 for r in rows)


class TestProductQuantization:
    def _corpus(self, spark, n=64, dim=8, spread=4):
        # four well-separated direction clusters in each subspace
        import math

        rows = []
        for i in range(n):
            base = [0.0] * dim
            g = i % spread
            for d in range(dim):
                base[d] = (
                    10.0 if d % spread == g else float((i * 7 + d) % 3)
                )
            rows.append((i, [float(x) for x in base]))
        return spark.createDataFrame(
            rows, "vec_id bigint, embedding array<float>"
        )

    def test_codebook_shape_and_determinism(self, spark):
        from mindocr_spark.functions.similarity import build_pq_codebook

        emb = self._corpus(spark)
        cb1 = build_pq_codebook(emb, dim=8, m=2, k_sub=4)
        cb2 = build_pq_codebook(emb, dim=8, m=2, k_sub=4)
        r1 = sorted(
            (r["sub"], r["code"], tuple(r["cent"])) for r in cb1.collect()
        )
        r2 = sorted(
            (r["sub"], r["code"], tuple(r["cent"])) for r in cb2.collect()
        )
        assert r1 == r2
        assert len(r1) <= 8 and len(r1) >= 2
        assert all(len(c) == 4 for (_, _, c) in r1)

    def test_identical_vectors_same_codes(self, spark):
        from mindocr_spark.functions.similarity import (
            build_pq_codebook, pq_codes,
        )

        emb = self._corpus(spark)
        v = [1.0, 2.0, 3.0, 4.0, 5.0, 6.0, 7.0, 8.0]
        two = spark.createDataFrame(
            [(900, v), (901, v)],
            "vec_id bigint, embedding array<float>",
        )
        cb = build_pq_codebook(emb, dim=8, m=2, k_sub=4)
        codes = {
            (r["neighbor_id"], r["sub"]): r["code"]
            for r in pq_codes(two, cb, dim=8, m=2).collect()
        }
        assert codes[(900, 0)] == codes[(901, 0)]
        assert codes[(900, 1)] == codes[(901, 1)]

    def test_adc_finds_cluster_mates(self, spark):
        from pyspark.sql import functions as F

        from mindocr_spark.functions.similarity import pq_adc_topk

        emb = self._corpus(spark, n=64)
        out = pq_adc_topk(
            emb, emb.where(F.col("vec_id") < 4), dim=8, m=2,
            k_sub=4, k=5,
        ).collect()
        by_q = {}
        for r in out:
            by_q.setdefault(r["query_id"], []).append(r["neighbor_id"])
        # the quantized scan must surface same-direction-cluster
        # vectors (i % 4 == q % 4) as top neighbours
        for q, neigh in by_q.items():
            assert len(neigh) == 5
            same = sum(1 for nb in neigh if nb % 4 == q % 4)
            assert same >= 4, (q, neigh)

    def test_adc_rank_deterministic_and_self_excluded(self, spark):
        from pyspark.sql import functions as F

        from mindocr_spark.functions.similarity import pq_adc_topk

        emb = self._corpus(spark)
        a = pq_adc_topk(
            emb, emb.where(F.col("vec_id") < 3), dim=8, m=2,
            k_sub=4, k=4,
        ).collect()
        b = pq_adc_topk(
            emb, emb.where(F.col("vec_id") < 3), dim=8, m=2,
            k_sub=4, k=4,
        ).collect()
        key = lambda r: (r["query_id"], r["rank"])
        assert sorted(map(tuple, a)) == sorted(map(tuple, b))
        assert all(r["neighbor_id"] != r["query_id"] for r in a)

    def test_guards(self, spark):
        import pytest as _pt

        from mindocr_spark.functions.similarity import build_pq_codebook

        emb = self._corpus(spark)
        with _pt.raises(ValueError):
            build_pq_codebook(emb, dim=8, m=3)
        with _pt.raises(ValueError):
            build_pq_codebook(emb, dim=8, m=2, k_sub=1)


class TestIvfPq:
    def test_finds_cluster_mates_and_deterministic(self, spark):
        from pyspark.sql import functions as F

        from mindocr_spark.functions.similarity import ivf_pq_topk

        emb = TestProductQuantization()._corpus(spark, n=64)
        run = lambda: ivf_pq_topk(
            emb, emb.where(F.col("vec_id") < 4), dim=8, m=2,
            k_sub=4, k=5, n_probe=8,
        ).collect()
        a, b = run(), run()
        assert sorted(map(tuple, a)) == sorted(map(tuple, b))
        by_q = {}
        for r in a:
            assert r["neighbor_id"] != r["query_id"]
            by_q.setdefault(r["query_id"], []).append(r["neighbor_id"])
        for q, neigh in by_q.items():
            same = sum(1 for nb in neigh if nb % 4 == q % 4)
            assert same >= 4, (q, neigh)

    def test_probe_gating_limits_candidates(self, spark):
        from pyspark.sql import functions as F

        from mindocr_spark.functions.similarity import ivf_pq_topk

        emb = TestProductQuantization()._corpus(spark, n=64)
        out = ivf_pq_topk(
            emb, emb.where(F.col("vec_id") < 2), dim=8, m=2,
            k_sub=4, k=64, n_probe=1,
        ).collect()
        # with a single probed cell, every neighbour carries that cell
        for q in (0, 1):
            cids = {r["cid"] for r in out if r["query_id"] == q}
            assert len(cids) == 1


class TestTripletMining:
    def _emb(self, spark, rows):
        import numpy as np

        def unit(v):
            a = np.array(v, dtype=float)
            return (a / np.linalg.norm(a)).tolist()

        return spark.createDataFrame(
            [(i, unit(v)) for i, v in enumerate(rows)],
            "vec_id bigint, embedding array<double>",
        )

    def test_positive_and_hardest_negative_selected(self, spark):
        from mindocr_spark.functions.similarity import triplet_mining

        rows = [
            [1.0, 0.0, 0.0],        # 0: anchor
            [0.999, 0.04, 0.0],     # 1: near-dup -> positive
            [0.8, 0.6, 0.0],        # 2: cos 0.8 -> hard negative
            [0.5, 0.86, 0.0],       # 3: cos 0.5 -> softer negative
            [0.0, 0.0, 1.0],        # 4: orthogonal
        ]
        emb = self._emb(spark, rows)
        out = triplet_mining(
            emb, emb.where("vec_id = 0"),
            pos_min=0.95, neg_max=0.9,
        ).collect()
        assert len(out) == 1
        t = out[0]
        assert (t["anchor_id"], t["pos_id"], t["neg_id"]) == (0, 1, 2)
        assert t["pos_sim"] >= 0.95
        # HARDEST negative: the highest-cosine candidate below the band
        assert t["neg_sim"] == pytest.approx(0.8, abs=1e-3)

    def test_band_gap_yields_no_triplet_without_positive(self, spark):
        from mindocr_spark.functions.similarity import triplet_mining

        rows = [
            [1.0, 0.0, 0.0],
            [0.8, 0.6, 0.0],    # below pos_min -> no positive
            [0.0, 1.0, 0.0],
        ]
        emb = self._emb(spark, rows)
        assert triplet_mining(
            emb, emb.where("vec_id = 0"),
            pos_min=0.95, neg_max=0.9,
        ).count() == 0

    def test_in_band_candidates_are_neither(self, spark):
        """cos in [neg_max, pos_min) is the no-sample band: a 0.92
        candidate must not become the negative even when it is the
        hardest available."""
        from mindocr_spark.functions.similarity import triplet_mining

        rows = [
            [1.0, 0.0, 0.0],
            [0.999, 0.04, 0.0],     # positive
            [0.92, 0.39, 0.0],      # in-band: excluded from both sides
            [0.6, 0.8, 0.0],        # the legitimate hard negative
        ]
        emb = self._emb(spark, rows)
        [t] = triplet_mining(
            emb, emb.where("vec_id = 0"),
            pos_min=0.95, neg_max=0.9,
        ).collect()
        assert t["neg_id"] == 3

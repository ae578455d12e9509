"""similarity — embedding similarity search over array<float> columns.

Two tiers, per the scale doctrine:

- :func:`cosine_topk` — brute-force exact top-k: broadcast the (small)
  query set against the full corpus; dot products via `zip_with` +
  `aggregate` higher-order functions — pure JVM expressions, no Python,
  no shuffle except the final per-query top-k.
- :func:`lsh_topk` — random-hyperplane LSH bucketing (pinned
  deterministic hyperplanes): each vector lands in one sign-bit bucket
  (plus its single-bit-flip neighbours for recall), candidates join on
  bucket, exact cosine re-rank within bucket. Cost scales with bucket
  occupancy, not corpus size — the 100 TB path.
- :func:`embedding_neardup_pairs` — all pairs with cosine ≥ τ via the
  same bucket join (dedup by embedding).

The reference's nearest analog is its char-dict broadcast lookup
(broadcast small state against a big stream, SURVEY §1.4) and the
IoU-based GT⋈pred matcher (per-key local matching after an equi-join,
reference: mindocr/metrics/det_metrics.py:28-76).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F

from mindocr_spark.cache import tracked_persist

# --------------------------------------------------------------------------
# Vector expressions (JVM higher-order functions — no UDF)
# --------------------------------------------------------------------------


def vec_double(c: Column | str) -> Column:
    """array<float> → array<double> (pin precision before any arithmetic
    so results are bit-identical to the float64 oracle)."""
    col = F.col(c) if isinstance(c, str) else c
    return F.transform(col, lambda x: x.cast("double"))


def dot(a: Column, b: Column) -> Column:
    """Sequential left-to-right fold — deterministic association order."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x * x))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


# --------------------------------------------------------------------------
# Brute-force exact top-k (baseline; also the in-bucket re-ranker)
# --------------------------------------------------------------------------


def cosine_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_to: int = 4,
) -> DataFrame:
    """Exact top-k neighbours of each query vector (excluding itself).

    Plan: broadcast-join queries × corpus (the query side is small by
    contract) → JVM-side cosine → per-query top-k via window rank.
    Ordering key is (rounded cosine desc, neighbour id asc): fully
    deterministic and engine-independent.
    Returns (query_id, neighbor_id, cos_sim, rank).
    """
    # norms are computed ONCE PER VECTOR and carried into the pair
    # (cosine() would re-fold two extra aggregates per PAIR — 2·|q|·|c|
    # redundant norm folds; the division consumes the exact same float
    # values, so results are bit-identical — the embedding_neardup
    # exact-path discipline)
    q = queries.select(
        F.col(id_col).alias("query_id"), vec_double(vec_col).alias("qv")
    ).withColumn("qn", norm(F.col("qv")))
    c = embeddings.select(
        F.col(id_col).alias("neighbor_id"), vec_double(vec_col).alias("cv")
    ).withColumn("cn", norm(F.col("cv")))
    sim = F.round(
        dot(F.col("qv"), F.col("cv")) / (F.col("qn") * F.col("cn")),
        round_to,
    )
    scored = (
        F.broadcast(q)
        .join(c, F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id", sim.alias("cos_sim"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
    )


# --------------------------------------------------------------------------
# Random-hyperplane LSH (deterministic planes) — the ANN scale path
# --------------------------------------------------------------------------


def _planes(dim: int, n_bits: int, table: int = 0) -> list[list[float]]:
    """Pinned pseudo-random hyperplanes: plane[i][j] derives from a fixed
    integer hash (no RNG state), identical across runs and engines.
    Each `table` index yields an independent plane set (multi-table LSH)."""
    import hashlib

    planes = []
    for i in range(n_bits):
        row = []
        for j in range(dim):
            h = int.from_bytes(
                hashlib.md5(f"plane:{table}:{i}:{j}".encode()).digest()[:8], "big"
            )
            row.append((h / float(1 << 63)) - 1.0)  # ∈ [-1, 1)
        planes.append(row)
    return planes


def lsh_bucket(vec: Column, planes: list[list[float]]) -> Column:
    """Sign-bit bucket id of a vector: bit i = [vec·plane_i ≥ 0]."""
    bucket = F.lit(0).cast("long")
    for i, p in enumerate(planes):
        plane = F.array(*[F.lit(v) for v in p])
        bit = (dot(vec, plane) >= 0).cast("long")
        bucket = bucket + F.shiftleft(bit, i)
    return bucket


def lsh_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_bits: int = 8,
    dim: int = 64,
    n_tables: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_to: int = 4,
) -> DataFrame:
    """Approximate top-k: multi-table sign-bit LSH. The corpus is bucketed
    once per table; each query probes its own bucket plus all
    single-bit-flip neighbours (multi-probe) in every table; candidates
    union across tables; exact cosine re-rank inside.

    Cost: n_tables × |corpus| bucket assignments (narrow, one pass) + a
    join whose width is bucket occupancy × (n_bits+1) × n_tables probes —
    independent of corpus size per query. Recall rises as
    1-(1-r₁)^n_tables. Returns (query_id, neighbor_id, cos_sim, rank).
    """
    c = embeddings.select(
        F.col(id_col).alias("neighbor_id"), vec_double(vec_col).alias("cv")
    )
    q = queries.select(
        F.col(id_col).alias("query_id"), vec_double(vec_col).alias("qv")
    )
    # one pass computes every table's bucket: (table, bucket) exploded
    c_buckets = c.select(
        "neighbor_id", "cv",
        F.explode(F.array(*[
            F.struct(
                F.lit(t).alias("tbl"),
                lsh_bucket(F.col("cv"), _planes(dim, n_bits, t)).alias("bucket"),
            )
            for t in range(n_tables)
        ])).alias("tb"),
    ).select("neighbor_id", "cv", "tb.tbl", "tb.bucket")
    probe_structs = []
    for t in range(n_tables):
        qb = lsh_bucket(F.col("qv"), _planes(dim, n_bits, t))
        probe_structs.append(F.struct(F.lit(t).alias("tbl"), qb.alias("bucket")))
        probe_structs += [
            F.struct(
                F.lit(t).alias("tbl"),
                qb.bitwiseXOR(F.lit(1 << i)).cast("long").alias("bucket"),
            )
            for i in range(n_bits)
        ]
    q_probed = q.select(
        "query_id", "qv", F.explode(F.array(*probe_structs)).alias("tb")
    ).select("query_id", "qv", "tb.tbl", "tb.bucket")
    sim = F.round(cosine(F.col("qv"), F.col("cv")), round_to)
    scored = (
        F.broadcast(q_probed)
        .join(c_buckets, on=["tbl", "bucket"])
        .where(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id", sim.alias("cos_sim"))
        .distinct()
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
    )


def ivf_centroid_plan(n: int, max_centroids: int = 65_536,
                      target_cluster: int | None = None
                      ) -> tuple[int, int]:
    """(k, stride) for the IVF seed grid from a corpus-count stats pass:
    k ≈ ceil(√n) CAPPED at `max_centroids` (broadcastable at any corpus
    size — 65k × 64-dim doubles ≈ 33 MB), stride = n // k. Exact integer
    arithmetic so the SQL oracle reproduces it (`ceil(sqrt(n))` there).

    `target_cluster` switches to the LINEAR-WORK plan: k ≈ ceil(n /
    target_cluster), i.e. cluster SIZE is bounded instead of cluster
    count. k = √n is the published SemDeDup recipe and the contract
    default, but it makes any within-cluster quadratic consumer cost
    n·√n total (measured super-linear at the sf10 rehearsal — the two
    hot-cluster stragglers); bounding the size keeps in-cluster pair
    work at n·target — linear — at the price of more centroids (the
    assignment pass is k·n either way, embarrassingly parallel)."""
    import math

    if target_cluster is not None:
        if target_cluster < 1:
            raise ValueError(f"need target_cluster >= 1, got {target_cluster}")
        k = -(-max(n, 1) // target_cluster)
    else:
        k = math.isqrt(max(n, 1))
        if k * k < n:
            k += 1
    k = min(max_centroids, max(1, k))
    return k, max(1, n // k)


def _ivf_assign(c: DataFrame, cent: DataFrame) -> DataFrame:
    """corpus × broadcast(centroids) → nearest-centroid assignment.
    Key rounded to 9 decimals + cid tie-break: fully deterministic AND
    engine-stable (raw float argmax would be sensitive to 1e-16
    association-order noise). max_by over a struct keeps map-side
    PARTIAL aggregation — a window here would shuffle the full
    corpus×centroids cross product."""
    akey = F.struct(
        F.round(cosine(F.col("cv"), F.col("cent")), 9).alias("cos"),
        (-F.col("cid")).alias("neg_cid"),
    )
    return (
        c.join(F.broadcast(cent))
        .groupBy("neighbor_id")
        .agg(
            F.max_by("cid", akey).alias("cid"),
            F.first("cv").alias("cv"),  # identical across the group
        )
    )


def _ivf_assign_fast(c: DataFrame, cent: DataFrame) -> DataFrame:
    """Vectorized nearest-centroid assignment: the centroid matrix is
    collected (bounded by ivf_centroid_plan — ≤65k rows) and each Arrow
    batch does ONE numpy matmul instead of per-pair fold expressions
    (~10× over the HOF-cosine path at 50k×224). BLAS reduction order is
    not pinned, so ties at 1e-16 could differ across builds — this is
    the production/scale path; the oracle-checked queries use the exact
    `_ivf_assign`."""
    import numpy as np
    import pandas as pd

    rows = sorted(cent.collect(), key=lambda r: r["cid"])
    # bounded: ≤ max_centroids rows (the plan cap); cid-sorted so
    # argmax's first-wins tie rule matches the exact path's smallest-cid
    cids = np.array([r["cid"] for r in rows], dtype=np.int64)
    m = np.array([r["cent"] for r in rows], dtype=np.float64)
    mn = m / np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-300)

    def fn(batches):
        for pdf in batches:
            v = np.array(list(pdf["cv"]), dtype=np.float64)
            vn = v / np.maximum(
                np.linalg.norm(v, axis=1, keepdims=True), 1e-300
            )
            best = np.argmax(np.round(vn @ mn.T, 9), axis=1)
            yield pd.DataFrame({
                "neighbor_id": pdf["neighbor_id"],
                "cid": cids[best],
                "cv": pdf["cv"],
            })

    return c.mapInPandas(
        fn, schema="neighbor_id bigint, cid bigint, cv array<double>"
    )


def _lloyd_step(assign: DataFrame) -> DataFrame:
    """One Lloyd refinement as a Spark job: new centroid = component-wise
    mean of its assigned vectors. Means go through exact DECIMAL sums,
    one IEEE division, round(·, 6) — bit-identical to the SQL oracle
    (the DECIMAL discipline of every aggregate in this engine). Empty
    clusters simply drop out."""
    comp = assign.select("cid", F.posexplode("cv").alias("pos", "comp"))
    means = comp.groupBy("cid", "pos").agg(
        F.round(
            F.sum(F.col("comp").cast("decimal(28,9)")).cast("double")
            / F.count("*").cast("double"),
            6,
        ).alias("mv")
    )
    return means.groupBy("cid").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("pos", "mv"))),
            lambda s: s.getField("mv"),
        ).alias("cent")
    )


def build_ivf_index(
    embeddings: DataFrame,
    n: int | None = None,
    max_centroids: int = 65_536,
    lloyd_iters: int = 1,
    assign_mode: str = "exact",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    target_cluster: int | None = None,
):
    """Shared IVF index build (behind :func:`ivf_topk` and
    :func:`semdedup_flags`): deterministic id-grid centroid seeds
    bounded by :func:`ivf_centroid_plan`, `lloyd_iters` refinement
    passes as Spark jobs, and the final ≤`max_centroids`-row centroid
    table pinned as a LOCAL relation (no persisted diamond — nothing
    to unpersist). Returns ``(c, cent, assign_fn)`` where `c` is the
    normalized (neighbor_id, cv) corpus projection, `cent` the local
    centroid relation, and `assign_fn` the chosen assignment kernel.
    The build is eager (one count unless `n` is passed, Lloyd passes,
    one bounded collect); plans composed on the RESULT stay lazy."""
    if n is None:
        n = embeddings.count()  # the tuning-pass action (stats, not data)
    _k, stride = ivf_centroid_plan(n, max_centroids, target_cluster)
    assign_fn = _ivf_assign if assign_mode == "exact" else _ivf_assign_fast
    c = embeddings.select(
        F.col(id_col).alias("neighbor_id"), vec_double(vec_col).alias("cv")
    )
    cent = embeddings.where(
        F.pmod(F.col(id_col), F.lit(stride)) == 0
    ).select(F.col(id_col).alias("cid"), vec_double(vec_col).alias("cent"))
    for _ in range(lloyd_iters):
        cent = _lloyd_step(assign_fn(c, cent))
    # pin the built index as a local relation: feeds corpus assign AND
    # query probe without a persisted diamond (nothing to unpersist)
    cent = embeddings.sparkSession.createDataFrame(
        cent.collect(), schema="cid bigint, cent array<double>"
    )
    return c, cent, assign_fn


def cluster_mix_allocation(
    embeddings: DataFrame,
    budget: int = 100_000,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    max_centroids: int = 65_536,
    lloyd_iters: int = 1,
    n: int | None = None,
) -> DataFrame:
    """Cluster-balanced mixture allocation — the topic-rebalancing
    step (D4 / cluster-then-balance curation, Tirumala et al. 2023):
    k-means-cluster the embedding corpus with the shared IVF build,
    then split a per-epoch sampling budget across CLUSTERS with the
    α = 0.5 temperature rule (``w_c ∝ √n_c``), so over-represented
    topics (boilerplate-heavy crawl neighborhoods) are down-sampled
    and tail topics up-sampled. The cluster twin of
    `text.temperature_mix` (same fixed α: ``sqrt`` is IEEE
    correctly-rounded, bit-identical cross-engine; general ``pow``
    is not).

    Returns one row per cluster: exact ``n_vecs``, ``raw_share``,
    ``temp_share``, ``boost`` (temp/raw), ``alloc_docs`` (floored
    slice of `budget`).

    Cross-engine exactness: counts are exact BIGINTs; weights are
    round(sqrt(n),6); normalizers are order-independent DECIMAL(38,6)
    sums via UNPARTITIONED windows (each chain referenced once — the
    hits plan-growth lesson); every share is one IEEE division,
    rounded at 6.

    100 TB shape: assignment is the IVF broadcast-centroid scan (no
    shuffle beyond the build); the per-cluster count is ONE map-side-
    combinable groupBy at cluster cardinality k ≈ √n; the normalizer
    windows run over that tiny table. Reference lineage: per-dataset
    sample_ratio mixing (reference: mindocr/data/builder.py:42-78),
    ratios derived from the corpus."""
    c, cent, assign_fn = build_ivf_index(
        embeddings, n=n, max_centroids=max_centroids,
        lloyd_iters=lloyd_iters, id_col=id_col, vec_col=vec_col,
    )
    from mindocr_spark.cache import tracked_persist

    assign = assign_fn(c, cent)
    wq = F.round(F.sqrt(F.col("n_vecs").cast("double")), 6)
    per = tracked_persist(
        assign.groupBy("cid").agg(F.count(F.lit(1)).alias("n_vecs"))
        .select("cid", "n_vecs", wq.alias("_wq"))
    )
    tot = per.agg(
        F.sum("n_vecs").alias("_tot"),
        F.sum(F.col("_wq").cast("decimal(38,6)")).cast("double")
        .alias("_s"),
    )
    per = per.crossJoin(F.broadcast(tot))
    raw = F.col("n_vecs").cast("double") / F.col("_tot").cast("double")
    temp = F.col("_wq") / F.col("_s")
    return per.select(
        "cid",
        "n_vecs",
        F.round(raw, 6).alias("raw_share"),
        F.round(temp, 6).alias("temp_share"),
        F.round(temp / raw, 6).alias("boost"),
        F.floor(F.lit(float(budget)) * temp).cast("bigint")
        .alias("alloc_docs"),
    )


def semdedup_flags(
    embeddings: DataFrame,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_to: int = 4,
    max_centroids: int = 65_536,
    lloyd_iters: int = 1,
    assign_mode: str = "exact",
    n: int | None = None,
    target_cluster: int | None = None,
) -> DataFrame:
    """SemDeDup (semantic dedup over embeddings): k-means-cluster the
    corpus with the shared IVF index, compare pairs ONLY within a
    cluster, and flag every vector that has a same-cluster neighbor
    with cosine ≥ `threshold` and a smaller id — the min-id survivor
    rule, which makes the kept set independent of batching/partition
    order (the `cross_corpus_flags` discipline). Returns
    (id, cid, is_dup) for EVERY input vector — flag-style, no row
    vanishes.

    100 TB shape: candidate generation is the cid equi-join — never
    all-pairs. The default k ≈ √n (the published SemDeDup recipe:
    cluster first, pay quadratic cost only inside clusters) makes the
    TOTAL in-cluster pair work n·√n — super-linear, and measurably so
    at the sf10 rehearsal (hot-cluster stragglers). At scale pass
    ``target_cluster`` (e.g. 128): cluster SIZE is bounded, in-cluster
    work becomes n·target — linear — and the assignment pass stays
    embarrassingly parallel. The cosine is the shared pinned-fold HOF;
    rounding to `round_to` before the threshold keeps the pair set
    engine-portable."""
    from mindocr_spark.cache import tracked_persist

    c, cent, assign_fn = build_ivf_index(
        embeddings, n=n, max_centroids=max_centroids,
        lloyd_iters=lloyd_iters, assign_mode=assign_mode,
        id_col=id_col, vec_col=vec_col, target_cluster=target_cluster,
    )
    # assign feeds lo, hi, AND the output left join — persist it
    # (tracked: an ambient persist_scope releases it) or the dominant
    # corpus×centroid scoring stage recomputes three times per action
    assign = tracked_persist(assign_fn(c, cent))
    lo = assign.select(
        F.col("cid"),
        F.col("neighbor_id").alias("id_a"),
        F.col("cv").alias("va"),
    )
    hi = assign.select(
        F.col("cid"),
        F.col("neighbor_id").alias("id_b"),
        F.col("cv").alias("vb"),
    )
    dup_ids = (
        lo.join(hi, "cid")
        .where(F.col("id_a") < F.col("id_b"))
        .where(
            F.round(cosine(F.col("va"), F.col("vb")), round_to)
            >= F.lit(threshold)
        )
        .select(F.col("id_b").alias("__dup_id"))
        .distinct()
    )
    return (
        assign.join(
            dup_ids, assign["neighbor_id"] == dup_ids["__dup_id"], "left"
        )
        .select(
            F.col("neighbor_id").alias(id_col),
            "cid",
            F.col("__dup_id").isNotNull().alias("is_dup"),
        )
    )


def ivf_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_probe: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_to: int = 4,
    max_centroids: int = 65_536,
    lloyd_iters: int = 1,
    assign_mode: str = "exact",
    n: int | None = None,
) -> DataFrame:
    """IVF ANN: the corpus is partitioned into inverted lists by nearest
    centroid; each query probes its `n_probe` closest lists and re-ranks
    exactly inside them.

    Centroid seeds are a deterministic id-grid subsample whose COUNT is
    bounded by :func:`ivf_centroid_plan` — k ≈ ceil(√n), capped at
    `max_centroids` so the broadcast stays ≤ tens of MB no matter how
    large the corpus grows (a fixed stride would grow the broadcast
    linearly with n and OOM long before 100 TB). `lloyd_iters` Lloyd
    refinement passes (assign → component-mean) run as ordinary Spark
    jobs, making this a real sampled k-means IVF rather than a raw
    subsample. Probe cost per query ≈ n_probe · n/k vectors.

    assign_mode: "exact" (pinned fold-order HOF cosines — bit-stable,
    the oracle path) or "fast" (one numpy matmul per Arrow batch against
    the collected centroid matrix — the production path at large n,
    ~10× cheaper, tie behavior identical but BLAS association order is
    not pinned). Returns (query_id, neighbor_id, cos_sim, rank).

    Execution shape: INDEX BUILD is eager (corpus count unless a
    precomputed `n` is passed, Lloyd passes as Spark jobs, then the
    final ≤`max_centroids`-row centroid table collected to a local
    relation — bounded by construction, and it removes both the
    cent diamond and any persist whose lifetime would outlive the
    call); the QUERY plan returned is fully lazy.
    """
    c, cent, assign_fn = build_ivf_index(
        embeddings, n=n, max_centroids=max_centroids,
        lloyd_iters=lloyd_iters, assign_mode=assign_mode,
        id_col=id_col, vec_col=vec_col,
    )
    assign = assign_fn(c, cent)
    q = queries.select(
        F.col(id_col).alias("query_id"), vec_double(vec_col).alias("qv")
    )
    qc = (
        q.join(F.broadcast(cent))
        .withColumn("ccos", F.round(cosine(F.col("qv"), F.col("cent")), 9))
        .withColumn(
            "crank",
            F.row_number().over(
                Window.partitionBy("query_id").orderBy(
                    F.col("ccos").desc(), F.col("cid").asc()
                )
            ),
        )
        .where(F.col("crank") <= n_probe)
        .select("query_id", "qv", "cid")
    )
    sim = F.round(cosine(F.col("qv"), F.col("cv")), round_to)
    scored = (
        F.broadcast(qc)
        .join(assign, on="cid")
        .where(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id", sim.alias("cos_sim"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
    )


def neardup_bits_plan(n: int, lo: int = 4, hi: int = 24) -> int:
    """LSH bit count from a corpus-count stats pass: n_bits ≈ log2(n)+2
    keeps expected bucket occupancy n/2^bits ≈ 1/4 — in-bucket join work
    stays ~linear in n instead of the n²/2^const blowup of a fixed bit
    count. Clamped to [lo, hi]."""
    import math

    return max(lo, min(hi, int(math.log2(max(n, 2))) + 2))


def embedding_neardup_pairs(
    embeddings: DataFrame,
    threshold: float = 0.95,
    n_bits: int | None = None,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_to: int = 4,
    exact: bool = False,
    n_tables: int = 2,
) -> DataFrame:
    """Pairs with cosine ≥ threshold. exact=True does the all-pairs join
    (oracle-checkable, small corpora); default is the LSH-bucketed plan
    (identical output whenever near-dups are truly near: cos ≥ 0.95
    pairs collide in ≥1 probe bucket with overwhelming probability).

    n_bits defaults to :func:`neardup_bits_plan` of the corpus count —
    bucket occupancy stays bounded as the corpus grows (a fixed 8 bits
    meant n/256 per bucket ⇒ quadratic in-bucket joins at scale). The
    recall lost to narrower buckets is recovered by `n_tables`
    independent plane sets (multi-table LSH, the lsh_topk pattern) plus
    single-bit-flip probing within each table.
    Returns (id_a, id_b, cos_sim)."""
    c = embeddings.select(
        F.col(id_col).alias("id"), vec_double(vec_col).alias("v")
    )
    sim = F.round(cosine(F.col("a.v"), F.col("b.v")), round_to)
    if exact:
        # The all-pairs verification baseline, made survivable at the
        # 10k-row rehearsal tier without changing a single output bit:
        # (1) norms are computed ONCE PER VECTOR and carried into the
        # pair (cosine() would re-fold 2 extra aggregates per PAIR —
        # n²/2 redundant norm folds; the division consumes the exact
        # same float values, so results are bit-identical), and
        # (2) the streamed side is repartitioned so the nested-loop
        # join (a.id < b.id is non-equi) fans across cores instead of
        # inheriting the scan's 1-2 file partitions.
        nc = c.withColumn("nv", norm(F.col("v")))
        pairs = (
            nc.repartition(64).alias("a")
            .join(F.broadcast(nc.alias("b")), F.col("a.id") < F.col("b.id"))
        )
        sim = F.round(
            dot(F.col("a.v"), F.col("b.v"))
            / (F.col("a.nv") * F.col("b.nv")),
            round_to,
        )
    else:
        if n_bits is None:
            n_bits = neardup_bits_plan(embeddings.count())
        # one pass computes every table's bucket; probes = own bucket +
        # all single-bit flips, per table
        b = c.select(
            "id", "v",
            F.explode(F.array(*[
                F.struct(
                    F.lit(t).alias("tbl"),
                    lsh_bucket(F.col("v"), _planes(dim, n_bits, t))
                    .alias("bucket"),
                )
                for t in range(n_tables)
            ])).alias("tb"),
        ).select("id", "v", "tb.tbl", "tb.bucket")
        b = tracked_persist(b)
        probes = F.array(
            F.col("bucket"),
            *[
                F.col("bucket").bitwiseXOR(F.lit(1 << i)).cast("long")
                for i in range(n_bits)
            ],
        )
        bp = b.select("id", "v", "tbl", F.explode(probes).alias("pbucket"))
        pairs = (
            bp.alias("a")
            .join(
                b.alias("b"),
                (F.col("a.tbl") == F.col("b.tbl"))
                & (F.col("a.pbucket") == F.col("b.bucket")),
            )
            .where(F.col("a.id") < F.col("b.id"))
        )
    return (
        pairs.select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            sim.alias("cos_sim"),
        )
        .where(F.col("cos_sim") >= threshold)
        .distinct()
    )


def bitext_mine(
    src: DataFrame,
    tgt: DataFrame,
    min_margin: float = 0.01,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_to: int = 4,
) -> DataFrame:
    """Margin-based bitext mining (the Artetxe–Schwenk / CCMatrix
    parallel-corpus step): align source-side embeddings to target-side
    embeddings by MUTUAL nearest neighbour with a margin criterion —
    the standard recipe for harvesting translation pairs from two
    monolingual crawls, and the same shape used to align any two
    embedded modalities (caption↔image, query↔doc).

    A pair (a, b) is emitted iff b is a's best target, a is b's best
    source (mutuality kills hub vectors that are "everyone's
    neighbour"), and ``cos1 − cos2 ≥ min_margin`` (the absolute-margin
    variant: a best match barely above the runner-up is ambiguity,
    not alignment; the difference of two already-rounded cosines is
    exact, unlike the ratio variant which degenerates when cos2 ≤ 0).
    Sources with fewer than 2 candidates are dropped (no runner-up →
    no margin evidence).

    Returns (src_id, tgt_id, cos_fwd, margin).

    100 TB shape: this exact form carries the :func:`cosine_topk`
    contract — the SOURCE side is broadcast-small (a query batch, a
    language shard slice); both direction windows then partition on
    uniform ids over the |src|×|tgt| scored relation. At corpus×corpus
    scale swap the scored relation for :func:`lsh_topk` candidates
    (bucketed, cost independent of corpus size) — the margin/mutual
    tail is unchanged.

    Reference lineage: the det→rec GT⋈pred mutual assignment —
    `metrics.det_metric`'s greedy one-to-one matching (reference:
    mindocr/metrics/det_metrics.py:61-93) — re-expressed as
    mutual-NN over embeddings."""
    a = src.select(
        F.col(id_col).alias("src_id"), vec_double(vec_col).alias("av")
    )
    b = tgt.select(
        F.col(id_col).alias("tgt_id"), vec_double(vec_col).alias("bv")
    )
    from mindocr_spark.cache import tracked_persist

    # + 0.0: signed-zero normalization (a near-zero negative cosine
    # rounds to -0.0 in DuckDB, +0.0 here — the verify-skill rule);
    # persisted because BOTH direction windows consume the scored
    # cross product under different exchanges (src_id vs tgt_id) —
    # without it the dominant cosine pass executes twice
    sim = F.round(cosine(F.col("av"), F.col("bv")), round_to) + F.lit(0.0)
    scored = tracked_persist(
        F.broadcast(a).join(b)
        .select("src_id", "tgt_id", sim.alias("cos_sim"))
    )
    wf = Window.partitionBy("src_id").orderBy(
        F.col("cos_sim").desc(), F.col("tgt_id").asc()
    )
    fwd = scored.withColumn("r", F.row_number().over(wf)).where(
        F.col("r") <= 2
    )
    fwd1 = fwd.where(F.col("r") == 1).select(
        "src_id", "tgt_id", F.col("cos_sim").alias("cos_fwd")
    )
    fwd2 = fwd.where(F.col("r") == 2).select(
        "src_id", F.col("cos_sim").alias("cos_2nd")
    )
    wb = Window.partitionBy("tgt_id").orderBy(
        F.col("cos_sim").desc(), F.col("src_id").asc()
    )
    bwd1 = (
        scored.withColumn("rb", F.row_number().over(wb))
        .where(F.col("rb") == 1)
        .select("tgt_id", F.col("src_id").alias("back_src"))
    )
    margin = F.col("cos_fwd") - F.col("cos_2nd")
    return (
        fwd1.join(fwd2, "src_id")
        .join(bwd1, "tgt_id")
        .where(F.col("back_src") == F.col("src_id"))
        .where(margin >= F.lit(min_margin))
        .select("src_id", "tgt_id", "cos_fwd", margin.alias("margin"))
    )


# --------------------------------------------------------------------------
# Product quantization (PQ) — compressed-domain ANN scan
# --------------------------------------------------------------------------


def _sub_split(vecs: DataFrame, id_name: str, dim: int, m: int) -> DataFrame:
    """(id, cv) → (id, sub, sv): row-local subspace slicing, one
    explode of an m-element struct array (no shuffle)."""
    dsub = dim // m
    arms = F.array(*[
        F.struct(
            F.lit(j).cast("bigint").alias("sub"),
            F.slice("cv", j * dsub + 1, dsub).alias("sv"),
        )
        for j in range(m)
    ])
    return vecs.select(id_name, F.explode(arms).alias("s")).select(
        id_name, "s.sub", "s.sv"
    )


def _l2_key(sv, cent) -> "Column":
    """Rounded squared-L2 assignment key, pinned association:
    dot(sv,sv) − 2·dot(sv,c) + dot(c,c) — the three dots are the
    shared sequential fold, so the expression is bit-identical to a
    DuckDB list_dot_product twin."""
    return F.round(
        dot(sv, sv) - F.lit(2.0) * dot(sv, cent) + dot(cent, cent), 9
    )


def build_pq_codebook(
    embeddings: DataFrame,
    dim: int,
    m: int = 4,
    k_sub: int = 16,
    lloyd_iters: int = 1,
    n: int | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Product-quantization codebook (Jégou 2011): split each vector
    into `m` subspaces of dim/m components and learn `k_sub`
    sub-centroids per subspace by deterministic seeded k-means —
    id-grid seeds (the IVF discipline: vec_id % stride == 0, first
    k_sub by id, code = seed rank) + `lloyd_iters` refinement passes
    as Spark jobs. Assignment minimizes squared L2 via the rounded
    pinned key of :func:`_l2_key` (code tie-break), Lloyd means are
    exact DECIMAL(28,9) sums / count, rounded at 6 — the whole build
    is a pure function of the corpus, so the SQL oracle reproduces
    it code-for-code.

    Returns the codebook pinned as a LOCAL relation
    (sub, code, cent) — m·k_sub rows, broadcastable at any corpus
    size (the PQ contract: the codebook is tiny; the corpus never
    re-materializes as floats once encoded)."""
    if dim % m != 0:
        raise ValueError(f"dim {dim} not divisible by m {m}")
    if k_sub < 2:
        raise ValueError("k_sub must be >= 2")
    if n is None:
        n = embeddings.count()
    stride = max(1, n // k_sub)
    c = embeddings.select(
        F.col(id_col).alias("neighbor_id"),
        vec_double(vec_col).alias("cv"),
    )
    subs = _sub_split(c, "neighbor_id", dim, m)
    grid = c.where(F.pmod(F.col("neighbor_id"), F.lit(stride)) == 0)
    # first k_sub seeds by id: sort+limit executes as a distributed
    # TakeOrdered (never an unpartitioned rank over the whole grid,
    # which is corpus-sized when ids cluster on the stride); the rank
    # window then runs over ≤ k_sub rows.
    capped = grid.orderBy("neighbor_id").limit(k_sub)
    seed_rank = F.row_number().over(
        Window.partitionBy().orderBy("neighbor_id")
    )
    seeds = capped.select("neighbor_id", "cv", seed_rank.alias("_rk"))
    cent = _sub_split(seeds, "_rk", dim, m).select(
        "sub", (F.col("_rk") - 1).cast("bigint").alias("code"),
        F.col("sv").alias("cent"),
    )
    for _ in range(lloyd_iters):
        akey = F.struct(
            (-_l2_key(F.col("sv"), F.col("cent"))).alias("negd"),
            (-F.col("code")).alias("negc"),
        )
        assign = (
            subs.join(F.broadcast(cent), "sub")
            .groupBy("neighbor_id", "sub")
            .agg(
                F.max_by("code", akey).alias("code"),
                F.first("sv").alias("sv"),
            )
        )
        comp = assign.select(
            "sub", "code", F.posexplode("sv").alias("pos", "comp")
        )
        means = comp.groupBy("sub", "code", "pos").agg(
            F.round(
                F.sum(F.col("comp").cast("decimal(28,9)"))
                .cast("double") / F.count("*").cast("double"),
                6,
            ).alias("mv")
        )
        cent = means.groupBy("sub", "code").agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "mv"))),
                lambda s: s.getField("mv"),
            ).alias("cent")
        )
    return embeddings.sparkSession.createDataFrame(
        cent.collect(), schema="sub bigint, code bigint, cent array<double>"
    )


def pq_codes(
    embeddings: DataFrame,
    codebook: DataFrame,
    dim: int,
    m: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Encode the corpus against a built codebook: (id, sub, code),
    m rows per vector — the 100 TB representation (a 64-dim float
    vector compresses to m single-byte codes). One broadcast join +
    one map-side-combinable groupBy on the uniform (id, sub) key;
    assignment is the same pinned rounded-L2 key as the build."""
    c = embeddings.select(
        F.col(id_col).alias("neighbor_id"),
        vec_double(vec_col).alias("cv"),
    )
    subs = _sub_split(c, "neighbor_id", dim, m)
    akey = F.struct(
        (-_l2_key(F.col("sv"), F.col("cent"))).alias("negd"),
        (-F.col("code")).alias("negc"),
    )
    return (
        subs.join(F.broadcast(codebook), "sub")
        .groupBy("neighbor_id", "sub")
        .agg(F.max_by("code", akey).alias("code"))
    )


def pq_adc_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    dim: int,
    m: int = 4,
    k_sub: int = 16,
    k: int = 5,
    lloyd_iters: int = 1,
    n: int | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """PQ asymmetric-distance top-k (the compressed-domain ANN scan):
    each query builds an m×k_sub lookup table of sub-centroid dot
    products, and a neighbor's score is the sum of m LUT entries
    selected by its codes — approximate inner product with NO float
    vector access at query time. Completes the ANN family
    (brute-force / LSH / IVF / PQ).

    Returns (query_id, neighbor_id, adc_score, rank), rank ≤ k,
    self-matches excluded, ordering (adc desc, neighbor_id) fully
    deterministic. Exactness: every LUT entry is the pinned
    sequential-fold dot rounded at 9, the per-neighbor sum is a
    DECIMAL(28,9) sum of those terms (order-free), the final rank
    compares exact decimals — bit-identical to the SQL oracle.

    100 TB shape: the codebook is m·k_sub rows (broadcast); codes
    are m small-int rows per corpus vector; the scan joins codes to
    the broadcast LUT on (sub, code) — O(n·m) row-local work per
    query batch, one map-side-combinable (query, neighbor) groupBy,
    one per-query top-k window. Compose behind an IVF probe to cut
    the scan to candidate lists when q is large."""
    codebook = build_pq_codebook(
        embeddings, dim=dim, m=m, k_sub=k_sub,
        lloyd_iters=lloyd_iters, n=n, id_col=id_col, vec_col=vec_col,
    )
    codes = pq_codes(
        embeddings, codebook, dim=dim, m=m,
        id_col=id_col, vec_col=vec_col,
    )
    q = queries.select(
        F.col(id_col).alias("query_id"), vec_double(vec_col).alias("cv")
    )
    qsubs = _sub_split(q, "query_id", dim, m)
    lut = qsubs.join(F.broadcast(codebook), "sub").select(
        "query_id", "sub", "code",
        F.round(dot(F.col("sv"), F.col("cent")), 9).alias("contrib"),
    )
    scored = (
        codes.join(F.broadcast(lut), ["sub", "code"])
        .where(F.col("query_id") != F.col("neighbor_id"))
        .groupBy("query_id", "neighbor_id")
        .agg(
            F.sum(F.col("contrib").cast("decimal(28,9)"))
            .cast("double").alias("adc_score")
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("adc_score").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(
            "query_id", "neighbor_id", "adc_score",
            F.col("rank").cast("bigint").alias("rank"),
        )
    )


def ivf_pq_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    dim: int,
    m: int = 4,
    k_sub: int = 16,
    k: int = 5,
    n_probe: int = 3,
    lloyd_iters: int = 1,
    pq_lloyd_iters: int = 1,
    max_centroids: int = 65_536,
    n: int | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    assign_mode: str = "exact",
) -> DataFrame:
    """IVF-PQ — the production large-scale ANN architecture (FAISS
    IVFPQ, Jégou 2011): the IVF coarse quantizer partitions the
    corpus into inverted lists, and a product quantizer encodes each
    vector's RESIDUAL (v − its centroid) as m codes; a query probes
    its `n_probe` nearest cells and scores candidates as
    dot(q, centroid) + Σ_j LUT[j, code_j] — approximate inner
    product with no float vector access inside the scan.

    Returns (query_id, neighbor_id, cid, adc_score, rank), rank ≤ k,
    self excluded, (score desc, neighbor_id) deterministic ordering.
    Exactness: coarse assignment/probing reuse the IVF pinned
    rounded-cosine keys; the residual codebook is the deterministic
    seeded build of :func:`build_pq_codebook` over the residual
    relation; the cell term is round9(dot(q, cent)); residual LUT
    entries are round9 sub-dots, DECIMAL-summed; the final score is
    ONE IEEE addition of those two exacts — the SQL oracle
    reproduces the whole composition code-for-code.

    100 TB shape: centroids ≤ max_centroids (bounded broadcast),
    codebook m·k_sub rows (broadcast), per-query scan limited to
    n_probe inverted lists of ≈ n/k_cells codes each; the corpus
    float vectors are read exactly twice (assignment + residual
    encode) and never again."""
    if n is None:
        n = embeddings.count()  # one stats pass shared by IVF and PQ
    c, cent, assign_fn = build_ivf_index(
        embeddings, n=n, max_centroids=max_centroids,
        lloyd_iters=lloyd_iters, id_col=id_col, vec_col=vec_col,
        assign_mode=assign_mode,
    )
    assign = assign_fn(c, cent)
    resid = tracked_persist(
        assign.join(F.broadcast(cent), "cid").select(
            "neighbor_id",
            "cid",
            F.zip_with("cv", "cent", lambda x, y: x - y).alias("cv"),
        )
    )
    codebook = build_pq_codebook(
        resid, dim=dim, m=m, k_sub=k_sub,
        lloyd_iters=pq_lloyd_iters, n=n,
        id_col="neighbor_id", vec_col="cv",
    )
    codes = pq_codes(
        resid, codebook, dim=dim, m=m,
        id_col="neighbor_id", vec_col="cv",
    )
    cellmap = resid.select("neighbor_id", "cid")
    q = queries.select(
        F.col(id_col).alias("query_id"), vec_double(vec_col).alias("qv")
    )
    probed = (
        q.join(F.broadcast(cent))
        .withColumn(
            "ccos", F.round(cosine(F.col("qv"), F.col("cent")), 9)
        )
        .withColumn(
            "crank",
            F.row_number().over(
                Window.partitionBy("query_id").orderBy(
                    F.col("ccos").desc(), F.col("cid").asc()
                )
            ),
        )
        .where(F.col("crank") <= n_probe)
        .select(
            "query_id", "qv", "cid",
            F.round(dot(F.col("qv"), F.col("cent")), 9)
            .alias("cent_dot"),
        )
    )
    qsubs = _sub_split(
        q.select("query_id", F.col("qv").alias("cv")),
        "query_id", dim, m,
    )
    lut = qsubs.join(F.broadcast(codebook), "sub").select(
        "query_id", "sub", "code",
        F.round(dot(F.col("sv"), F.col("cent")), 9).alias("contrib"),
    )
    cand = (
        codes.join(cellmap, "neighbor_id")
        .join(
            F.broadcast(probed.select("query_id", "cid", "cent_dot")),
            "cid",
        )
        .where(F.col("query_id") != F.col("neighbor_id"))
    )
    scored = (
        cand.join(F.broadcast(lut), ["query_id", "sub", "code"])
        .groupBy("query_id", "neighbor_id", "cid", "cent_dot")
        .agg(
            F.sum(F.col("contrib").cast("decimal(28,9)"))
            .cast("double").alias("resid_dot")
        )
        .select(
            "query_id", "neighbor_id", "cid",
            (F.col("cent_dot") + F.col("resid_dot"))
            .alias("adc_score"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("adc_score").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(
            "query_id", "neighbor_id", "cid", "adc_score",
            F.col("rank").cast("bigint").alias("rank"),
        )
    )


def triplet_mining(
    embeddings: DataFrame,
    anchors: DataFrame,
    pos_min: float = 0.95,
    neg_max: float = 0.9,
    n_cand: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_to: int = 4,
) -> DataFrame:
    """Contrastive (anchor, positive, hard-negative) mining — the
    training-data op behind every dense-retriever/embedder fine-tune
    (DPR/Sentence-BERT hard-negative recipe): from each anchor's
    top-`n_cand` cosine candidates take the best candidate at
    cos ≥ `pos_min` as the positive and the best candidate BELOW
    `neg_max` as the hard negative (the highest-scoring wrong answer —
    exactly what contrastive losses need; the (neg_max, pos_min) gap
    is the no-sample band that keeps label noise out of both sides).
    Anchors lacking either side yield no triplet. All selections
    ordered (cos DESC, id ASC) — fully deterministic.

    Plan: candidate generation is :func:`cosine_topk` (broadcast
    anchors — the contract bound; swap in :func:`lsh_topk` when the
    anchor side stops being small, same discipline as everywhere), two
    rank-1 windows, one join on the anchor key. Nothing quadratic
    beyond the candidate stage.

    Returns (anchor_id, pos_id, pos_sim, neg_id, neg_sim)."""
    # the candidate relation feeds BOTH rank-1 selections — persist it
    # (tracked: an ambient persist_scope releases it) or the whole
    # embed+score subtree executes once per selection branch
    top = tracked_persist(cosine_topk(
        embeddings, anchors, k=n_cand,
        id_col=id_col, vec_col=vec_col, round_to=round_to,
    ))
    w = Window.partitionBy("query_id").orderBy("rank")
    pos = (
        top.where(F.col("cos_sim") >= pos_min)
        .withColumn("__r", F.row_number().over(w))
        .where(F.col("__r") == 1)
        .select(
            F.col("query_id").alias("anchor_id"),
            F.col("neighbor_id").alias("pos_id"),
            F.col("cos_sim").alias("pos_sim"),
        )
    )
    neg = (
        top.where(F.col("cos_sim") < neg_max)
        .withColumn("__r", F.row_number().over(w))
        .where(F.col("__r") == 1)
        .select(
            F.col("query_id").alias("anchor_id"),
            F.col("neighbor_id").alias("neg_id"),
            F.col("cos_sim").alias("neg_sim"),
        )
    )
    return pos.join(neg, "anchor_id").select(
        "anchor_id", "pos_id", "pos_sim", "neg_id", "neg_sim")

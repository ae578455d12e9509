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
    q = queries.select(
        F.col(id_col).alias("query_id"), vec_double(vec_col).alias("qv")
    )
    c = embeddings.select(
        F.col(id_col).alias("neighbor_id"), vec_double(vec_col).alias("cv")
    )
    sim = F.round(cosine(F.col("qv"), F.col("cv")), round_to)
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


def ivf_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 5,
    centroid_stride: int = 25,
    n_probe: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_to: int = 4,
) -> DataFrame:
    """IVF-style ANN: the corpus is partitioned into inverted lists by
    nearest centroid; each query probes its `n_probe` closest lists and
    re-ranks exactly inside them.

    Centroids are a deterministic 1/`centroid_stride` subsample of the
    corpus (id % stride == 0) — the pinned stand-in for a k-means pass
    (which would just be a Spark job refining these seeds). Assignment
    is a broadcast pass: corpus × centroids → `max_by(cid, cos)` — one
    narrow stage + one partial-agg shuffle, never all-pairs. Probe cost
    per query: n_probe lists ≈ n_probe·stride vectors.
    Returns (query_id, neighbor_id, cos_sim, rank).
    """
    cent = embeddings.where(F.pmod(F.col(id_col), F.lit(centroid_stride)) == 0).select(
        F.col(id_col).alias("cid"), vec_double(vec_col).alias("cent")
    )
    c = embeddings.select(
        F.col(id_col).alias("neighbor_id"), vec_double(vec_col).alias("cv")
    )
    # assignment key rounded to 9 decimals + cid tie-break: fully
    # deterministic AND engine-stable (raw float argmax would be
    # sensitive to 1e-16 association-order noise). max_by over a struct
    # keeps map-side PARTIAL aggregation — a window here would shuffle
    # the full corpus×centroids cross product.
    akey = F.struct(
        F.round(cosine(F.col("cv"), F.col("cent")), 9).alias("cos"),
        (-F.col("cid")).alias("neg_cid"),
    )
    assign = (
        c.join(F.broadcast(cent))
        .groupBy("neighbor_id")
        .agg(
            F.max_by("cid", akey).alias("cid"),
            F.first("cv").alias("cv"),  # identical across the group
        )
    )
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


def embedding_neardup_pairs(
    embeddings: DataFrame,
    threshold: float = 0.95,
    n_bits: int = 8,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_to: int = 4,
    exact: bool = False,
) -> DataFrame:
    """Pairs with cosine ≥ threshold. exact=True does the all-pairs join
    (oracle-checkable, small corpora); default is the LSH-bucketed plan
    (identical output whenever near-dups are truly near: cos ≥ 0.95
    pairs collide in ≥1 probe bucket with overwhelming probability).
    Returns (id_a, id_b, cos_sim)."""
    c = embeddings.select(
        F.col(id_col).alias("id"), vec_double(vec_col).alias("v")
    )
    sim = F.round(cosine(F.col("a.v"), F.col("b.v")), round_to)
    if exact:
        pairs = c.alias("a").join(c.alias("b"), F.col("a.id") < F.col("b.id"))
    else:
        planes = _planes(dim, n_bits)
        b = c.withColumn("bucket", lsh_bucket(F.col("v"), planes))
        probes = F.array(
            F.col("bucket"),
            *[
                F.col("bucket").bitwiseXOR(F.lit(1 << i)).cast("long")
                for i in range(n_bits)
            ],
        )
        bp = b.select("id", "v", F.explode(probes).alias("pbucket"))
        pairs = (
            bp.alias("a")
            .join(b.alias("b"), F.col("a.pbucket") == F.col("b.bucket"))
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

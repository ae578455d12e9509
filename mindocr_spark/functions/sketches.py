"""Mergeable distinct-count sketches with exact cross-engine twins.

Spark ships HLL++ (`approx_count_distinct`), but its sketch VALUE is
engine-private — it can only ever be tolerance-checked. The KMV
(k-minimum-values) sketch here is the oracle-friendly counterpart:
built on a public hash (md5), its state (the k smallest distinct hash
values per group) and its estimate are pure functions of the input,
reproducible bit-for-bit by any engine. That also makes it the right
sketch to PERSIST: a KMV column written next to a corpus snapshot can
be re-verified and merged (union the hash sets, re-take the k
smallest) by readers that share nothing with Spark.

Reference analog: the reference's evaluation utilities compute corpus
cardinality/frequency statistics exactly per shard and merge them
(reference: mindocr/metrics/det_metrics.py aggregation discipline);
KMV is that merge made sublinear in distinct values.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

#: 2^32 — the hash domain size for the 8-hex-char (32-bit) prefix of
#: md5 used across the repo's cross-engine hash idioms.
HASH_DOMAIN = 4294967296


def kmv_distinct(
    df: DataFrame, group_col: str, value_col: str, k: int = 64
) -> DataFrame:
    """K-minimum-values distinct-count sketch (Bar-Yossef et al. 2002)
    per group: hash every value to 32 bits (md5 prefix — the repo's
    shared cross-engine idiom), keep the k smallest DISTINCT hashes,
    estimate D ≈ (k−1)·2³²/h_(k). When a group has fewer than k
    distinct hashes the sketch is the exact set, so the estimate is
    the exact count. Returns one row per group, every column a pure
    function of the input:
    (group, distinct_hashes, n_kept, kth_hash, kmv_estimate,
    abs_rel_err).

    `distinct_hashes` is the exact distinct-hash count carried
    alongside so the estimator's error is part of the checked surface
    (abs_rel_err = |est − exact|/exact, both operands exact → the
    division is bit-identical cross-engine).

    100 TB shape: the (group, hash) distinct collapse is map-side
    combinable and dominates the cost; it feeds BOTH the top-k window
    and the exact count (persisted once). The top-k window sorts only
    distinct hashes within each group. At true web scale you'd fold
    the per-partition k-min merge into an aggregator
    (applyInPandas at group grain) — the ESTIMATE is identical
    because KMV merge (union → k smallest) is exactly what the
    distinct+window computes; this formulation keeps every byte
    JVM-side.
    """
    if k < 2:
        raise ValueError(f"need k >= 2, got {k}")
    from mindocr_spark.cache import tracked_persist

    h = F.conv(
        F.substring(F.md5(F.col(value_col).cast("string")), 1, 8), 16, 10
    ).cast("bigint")
    dh = tracked_persist(
        df.where(F.col(value_col).isNotNull())
        .select(F.col(group_col).alias("g"), h.alias("h"))
        .distinct()
    )
    w = Window.partitionBy("g").orderBy(F.col("h").asc())
    sk = (
        dh.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= k)
        .groupBy("g")
        .agg(
            F.max("h").alias("kth_hash"),
            F.count(F.lit(1)).cast("bigint").alias("n_kept"),
        )
    )
    ex = dh.groupBy("g").agg(
        F.count(F.lit(1)).cast("bigint").alias("distinct_hashes")
    )
    est = F.when(
        F.col("n_kept") < k, F.col("distinct_hashes").cast("double")
    ).otherwise(
        F.lit(float((k - 1) * HASH_DOMAIN)) / F.col("kth_hash").cast("double")
    )
    out = sk.join(ex, "g").withColumn("kmv_estimate", est)
    return out.select(
        F.col("g").alias(group_col),
        "distinct_hashes",
        "n_kept",
        "kth_hash",
        "kmv_estimate",
        (
            F.abs(
                F.col("kmv_estimate") - F.col("distinct_hashes").cast("double")
            )
            / F.col("distinct_hashes").cast("double")
        ).alias("abs_rel_err"),
    )


def _cms_cell(r: int, col, width: int):
    """Row r's counter position for a value: first 8 hex chars of
    md5('r:' || value) mod width — engine-portable (md5/conv/pmod all
    have DuckDB twins) and public, so sketches are re-verifiable."""
    return F.pmod(
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit(f"{r}:"), col).cast("binary")),
                1,
                8,
            ),
            16,
            10,
        ).cast("bigint"),
        F.lit(width),
    )


def _cms_arms(col, depth: int, width: int):
    """The d-way (row, position) struct array for one value column."""
    return F.array(
        *[
            F.struct(
                F.lit(r).cast("int").alias("r"),
                _cms_cell(r, col, width).alias("pos"),
            )
            for r in range(depth)
        ]
    )


def cms_counters(
    df: DataFrame,
    value_col: str,
    depth: int = 4,
    width: int = 1024,
) -> DataFrame:
    """The raw CMS counter relation (r, pos, c) for a stream — the
    persistable/mergeable form: sketches of two streams merge by
    cell-wise addition (full-outer join on (r, pos), sum the counts),
    and sketch(A ∪ B) ≡ merge(sketch(A), sketch(B)) exactly. ONE
    map-side-combinable groupBy at (depth × width) cell cardinality."""
    vals = df.select(F.col(value_col).alias("v")).where(
        F.col(value_col).isNotNull()
    )
    return (
        vals.select(F.explode(_cms_arms(F.col("v"), depth, width))
                    .alias("s"))
        .select("s.r", "s.pos")
        .groupBy("r", "pos")
        .agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    )


def cms_counts(
    df: DataFrame,
    value_col: str,
    probes: tuple,
    depth: int = 4,
    width: int = 1024,
) -> DataFrame:
    """Count-min sketch (Cormode/Muthukrishnan 2005) — bounded-memory
    frequency counting, the counting sibling of :func:`kmv_distinct`:
    d×w integer counters replace an unbounded (value → count) map;
    a value's estimate is the MIN over its d cells, always ≥ the true
    count (one-sided error ≤ εN with ε = e/w at the chosen depth).
    Like KMV (and unlike HLL), the sketch here is built on public md5
    row-hashes, so counters, estimates, and the overestimate are pure
    functions of the input — persistable next to a corpus snapshot,
    mergeable by cell-wise addition, re-verifiable by any engine.

    Returns one row per probe value:
    (probe, exact_count, cms_estimate, overestimate) — the exact
    count rides along so the sketch's error is part of the checked
    surface; `overestimate ≥ 0` is the CMS invariant.

    100 TB shape: the build is ONE map-side-combinable groupBy at
    (depth × width) cell cardinality — the d-way explode is row-local
    and collapses immediately; probes are a broadcast-size relation;
    the exact side is a pre-filtered count on only the probed values.
    """
    if depth < 1 or width < 2:
        raise ValueError(
            f"need depth >= 1 and width >= 2, got {depth}, {width}"
        )
    if not probes:
        raise ValueError("no probe values")
    arms = _cms_arms(F.col("v"), depth, width)
    vals = df.select(F.col(value_col).alias("v")).where(
        F.col(value_col).isNotNull()
    )
    counters = cms_counters(df, value_col, depth=depth, width=width)
    probe_df = df.sparkSession.createDataFrame(
        [(p,) for p in probes], "v string"
    )
    ppos = probe_df.select(F.col("v"), F.explode(arms).alias("s")).select(
        "v", "s.r", "s.pos"
    )
    est = (
        ppos.join(counters, ["r", "pos"], "left")
        .groupBy("v")
        .agg(
            F.min(F.coalesce(F.col("c"), F.lit(0).cast("bigint")))
            .cast("bigint").alias("cms_estimate")
        )
    )
    exact = vals.where(F.col("v").isin(*probes)).groupBy("v").agg(
        F.count(F.lit(1)).cast("bigint").alias("exact_count")
    )
    return est.join(exact, "v", "left").select(
        F.col("v").alias("probe"),
        F.coalesce(F.col("exact_count"), F.lit(0).cast("bigint"))
        .alias("exact_count"),
        "cms_estimate",
        (
            F.col("cms_estimate")
            - F.coalesce(F.col("exact_count"), F.lit(0).cast("bigint"))
        ).alias("overestimate"),
    )


def dd_thresholds(
    max_value: int = 10**12, num: int = 9, den: int = 8
) -> list[int]:
    """DDSketch bucket boundaries as EXACT integers: t0 = 1,
    t_{k+1} = max(t_k + 1, t_k·num // den). The usual formulation
    (bucket = ceil(log_γ x)) puts libm inside the bucket boundary —
    the two engines' ``ln`` differ in the last ulp exactly at the
    values that land ON a boundary. Precomputing the boundaries with
    integer arithmetic makes bucket assignment a pure integer
    comparison, identical in any engine. ~235 thresholds cover 1..1e12
    at γ = 9/8 (≈6% relative accuracy) — small enough to inline as an
    array literal in the plan (no join, no broadcast)."""
    if num <= den:
        raise ValueError("need num/den > 1")
    ts = [1]
    while ts[-1] <= max_value:
        ts.append(max(ts[-1] + 1, ts[-1] * num // den))
    return ts


def ddsketch_quantiles(
    df: DataFrame,
    group_col: str,
    value_col: str,
    qs: tuple[tuple[int, int], ...] = ((1, 2), (9, 10), (99, 100)),
    num: int = 9,
    den: int = 8,
) -> DataFrame:
    """DDSketch (Masson et al., VLDB 2019) — the mergeable
    relative-error quantile sketch, exact-arithmetic edition: values
    map to γ-geometric buckets via the integer threshold ladder
    (`dd_thresholds`), the sketch IS the (group, bucket) count table
    (mergeable by summing counts — partial aggregation does the merge
    map-side), and quantile q is answered from the cumulative counts:
    the first bucket whose cumsum reaches rank ⌈q·n⌉ brackets the true
    order statistic in [t_{k-1}, t_k).

    Rank arithmetic is exact rational: q is carried as (q_num, q_den)
    and r = (q_num·n + q_den − 1) DIV q_den — never ⌈q·n⌉ in IEEE,
    where 0.9·500 = 450.0000…01 flips the ceiling.

    Output per (group, quantile): the bracketing bucket, its integer
    bounds [est_lo, est_hi], the EXACT order statistic (computed the
    expensive way — a per-group sort — as the verification column; a
    production run would omit it), and ``in_bounds`` — the DDSketch
    guarantee made checkable. The γ = num/den default (9/8) gives
    ≈5.9% worst-case relative error.

    100 TB shape: bucket assignment is a per-row array filter over
    ~235 inlined integer literals (no join); the sketch aggregation is
    ONE groupBy with map-side partials whose reduced size is
    groups × 235 regardless of row count; quantile selection runs on
    the reduced sketch. Only the verification column needs the full
    per-group sort — drop it and nothing touches a wide shuffle.

    Reference analog: per-batch max/mean reductions merged across
    shards (reference: mindocr/metrics/rec_metrics.py partial+final
    discipline) — here the merged state is the bucket histogram."""
    ts = dd_thresholds(num=num, den=den)
    arr = F.array(*[F.lit(t) for t in ts])
    v = F.col(value_col)
    bucket = F.size(F.filter(arr, lambda t: t <= v))
    sk = (
        df.select(F.col(group_col).alias("grp"), bucket.alias("bucket"))
        .groupBy("grp", "bucket")
        .agg(F.count("*").alias("cnt"))
    )
    wcum = Window.partitionBy("grp").orderBy("bucket")
    cum = sk.select(
        "grp", "bucket", "cnt",
        F.sum("cnt").over(wcum).alias("cum"),
        F.sum("cnt").over(Window.partitionBy("grp")).alias("n"),
    )
    spark = df.sparkSession
    qdf = spark.createDataFrame(
        list(qs), "q_num long, q_den long"
    )
    # exact integer rank: r = ceil(q·n) = (q_num·n + q_den − 1) div q_den
    r = F.expr("(q_num * n + q_den - 1) div q_den")
    ranked = (
        cum.crossJoin(F.broadcast(qdf))
        .withColumn("r", r)
        .where(F.col("cum") >= F.col("r"))
        .groupBy("grp", "q_num", "q_den")
        .agg(
            F.min("bucket").alias("bucket"),
            F.first("n").alias("n"),  # n is constant per grp
            F.first("r").alias("r"),  # r is constant per (grp, q)
        )
    )
    lo_arr = F.array(*[F.lit(t) for t in [0] + ts[:-1]])
    hi_arr = F.array(*[F.lit(t - 1) for t in ts])
    b = F.col("bucket")
    est = ranked.select(
        "grp", "q_num", "q_den", "bucket", "r",
        F.element_at(lo_arr, (b + 1).cast("int")).alias("est_lo"),
        F.element_at(hi_arr, (b + 1).cast("int")).alias("est_hi"),
    )
    # verification column: the exact rank-r order statistic per group
    wval = Window.partitionBy("ogrp").orderBy("val")
    ordered = df.select(
        F.col(group_col).alias("ogrp"),
        F.col(value_col).alias("val"),
    ).withColumn("rn", F.row_number().over(wval))
    out = est.join(
        ordered,
        (F.col("grp") == F.col("ogrp")) & (F.col("rn") == F.col("r")),
    )
    return out.select(
        F.col("grp").alias(group_col),
        (F.col("q_num").cast("double") / F.col("q_den")).alias("q"),
        F.col("bucket").cast("bigint").alias("bucket"),
        F.col("est_lo").cast("bigint").alias("est_lo"),
        F.col("est_hi").cast("bigint").alias("est_hi"),
        F.col("val").cast("bigint").alias("exact_val"),
        (
            (F.col("val") >= F.col("est_lo"))
            & (F.col("val") <= F.col("est_hi"))
        ).alias("in_bounds"),
    )


#: HLL geometry: m = 64 registers (b = 6 bucket bits), rank drawn from
#: the remaining 26 hash bits. α_64 computed once from the standard
#: formula and inlined as the same double literal in both engines.
HLL_M = 64
HLL_RANK_BITS = 26
HLL_ALPHA = 0.7213 / (1.0 + 1.079 / HLL_M)


def hll_distinct(
    df: DataFrame, group_col: str, value_col: str
) -> DataFrame:
    """HyperLogLog (Flajolet et al. 2007) built FROM SCRATCH on the
    repo's shared md5-prefix hash so the sketch STATE is a pure
    function of the input — unlike Spark's built-in
    `approx_count_distinct`, whose HLL++ registers are engine-private
    and can only ever be tolerance-checked (the `approx_distinct`
    lesson). Completes the sketch family: KMV (distinct), CMS
    (frequency), Bloom (membership), DDSketch (quantiles), HLL
    (distinct at O(m) space with registers any engine can reproduce).

    Per value: 32-bit hash → top 6 bits pick register j, the low 26
    bits w give rank = 26 − bitlen(w) + 1 (27 when w = 0, the
    all-zeros tail), register M_j = max rank. The harmonic mean is
    EXACT RATIONAL arithmetic: with R = max_j M_j,
    Σ_j 2^(−M_j) = S / 2^R where S = Σ_j 2^(R−M_j) is an exact BIGINT
    (empty registers contribute 2^R — i.e. M_j = 0) — so the estimate
    α·m²·2^R / S is ONE pinned IEEE division of exact operands, and
    the register table itself (S, R, V) is oracle-checkable
    bit-for-bit. Small-range linear counting is deliberately OMITTED
    (it needs ln; V rides along so a consumer can apply it) — at
    corpus cardinalities ≫ 2.5m the standard estimator is the active
    branch, and the CHECKED surface stays libm-free.

    Output per group: (group, n_exact, s_int, max_rank, v_empty,
    hll_estimate, abs_rel_err) — estimator error is part of the
    checked surface, the kmv_distinct discipline.

    100 TB shape: ONE map-side-combinable groupBy at (group, register)
    grain (≤ m rows per group survive the partial agg), then a
    m-bounded reduction per group; the exact count rides the same
    distinct relation KMV uses. The sketch merges by max(M_j) — the
    partial aggregation IS the merge."""
    from mindocr_spark.cache import tracked_persist

    h = F.conv(
        F.substring(F.md5(F.col(value_col).cast("string")), 1, 8), 16, 10
    ).cast("bigint")
    vals = tracked_persist(
        df.where(F.col(value_col).isNotNull())
        .select(F.col(group_col).alias("g"), h.alias("h"))
        .distinct()
    )
    j = F.shiftright("h", HLL_RANK_BITS)
    w = F.col("h").bitwiseAND(F.lit((1 << HLL_RANK_BITS) - 1))
    rank = F.when(
        w == 0, F.lit(HLL_RANK_BITS + 1)
    ).otherwise(F.lit(HLL_RANK_BITS) - F.length(F.bin(w)) + 1)
    regs = (
        vals.select("g", j.alias("j"), rank.alias("rank"))
        .groupBy("g", "j")
        .agg(F.max("rank").alias("m_j"))
    )
    per_g = regs.groupBy("g").agg(
        F.max("m_j").alias("max_rank"),
        F.count("*").alias("n_regs"),
    )
    # S = Σ_j 2^(R − M_j): occupied registers from the register table,
    # empty registers contribute 2^R each
    s_occ = (
        regs.join(per_g.select("g", "max_rank"), "g")
        .groupBy("g")
        .agg(
            F.sum(
                # shiftleft needs a literal bit count in the Python
                # API; the SQL form takes a column
                F.expr("shiftleft(CAST(1 AS BIGINT),"
                       " CAST(max_rank - m_j AS INT))")
            ).alias("s_occ")
        )
    )
    ex = vals.groupBy("g").agg(
        F.count("*").cast("bigint").alias("n_exact"))
    alpha_m2 = HLL_ALPHA * HLL_M * HLL_M
    out = (
        per_g.join(s_occ, "g").join(ex, "g")
        .select(
            "g", "n_exact",
            (F.col("s_occ")
             + (F.lit(HLL_M) - F.col("n_regs"))
             * F.expr("shiftleft(CAST(1 AS BIGINT),"
                      " CAST(max_rank AS INT))")).alias("s_int"),
            F.col("max_rank").cast("bigint").alias("max_rank"),
            (F.lit(HLL_M) - F.col("n_regs")).cast("bigint")
            .alias("v_empty"),
        )
    )
    est = (
        F.lit(alpha_m2)
        * F.pow(F.lit(2.0), F.col("max_rank").cast("double"))
        / F.col("s_int").cast("double")
    )
    return out.select(
        F.col("g").alias(group_col),
        "n_exact", "s_int", "max_rank", "v_empty",
        est.alias("hll_estimate"),
        (F.abs(est - F.col("n_exact").cast("double"))
         / F.col("n_exact").cast("double")).alias("abs_rel_err"),
    )


def sketch_ks_drift(
    df: DataFrame,
    group_col: str,
    value_col: str,
    split_col,
    num: int = 9,
    den: int = 8,
) -> DataFrame:
    """Kolmogorov-Smirnov drift measured ON DDSketch states — the
    scale-true form of distribution monitoring: at 10^12 rows you
    cannot KS the raw values (the exact `ks_drift` query sorts both
    samples), but the (group, bucket) count tables are mergeable
    sketches a snapshot already persists, and the KS statistic between
    two sketches is exact integer arithmetic over their cumulative
    counts. Resolution is the ladder's γ (=num/den): drift smaller
    than one bucket is invisible — the documented sketch tradeoff.

    ``split_col`` is a boolean Column partitioning rows into the two
    populations (A = false, B = true — e.g. doc_id parity, or
    old-vs-new snapshot). Per group: D = max_k |cfA(k) − cfB(k)| over
    the shared bucket spine, computed EXACTLY — cfA − cfB at bucket k
    equals (cumA·nB − cumB·nA)/(nA·nB) whose denominator is constant
    per group, so the argmax runs on the BIGINT |cumA·nB − cumB·nA|
    and only the final reported D is one pinned IEEE division. The
    drift verdict (D > 1/10) is likewise the exact integer test
    10·d_num > nA·nB — no float ever decides anything.

    Output: (group, n_a, n_b, d_num, ks_d, drifted).

    100 TB shape: identical to `ddsketch_quantiles`' build — one
    map-side-combinable groupBy at (group, split, bucket) grain, then
    all work at sketch cardinality (groups × ~235 buckets)."""
    ts = dd_thresholds(num=num, den=den)
    arr = F.array(*[F.lit(t) for t in ts])
    v = F.col(value_col)
    bucket = F.size(F.filter(arr, lambda t: t <= v))
    sk = (
        df.select(
            F.col(group_col).alias("grp"),
            split_col.cast("boolean").alias("half"),
            bucket.alias("bucket"),
        )
        .groupBy("grp", "half", "bucket")
        .agg(F.count("*").alias("cnt"))
        # the sketch is re-used three ways (spine + both halves);
        # checkpointing the sketch-sized relation truncates the
        # HOF-bearing lineage (Spark 4 mis-resolves the array-filter
        # lambda's capture through the self-join otherwise) and reads
        # the input once instead of three times
        .localCheckpoint()
    )
    spine = sk.select("grp", "bucket").distinct()
    a = sk.where(~F.col("half")).select(
        "grp", "bucket", F.col("cnt").alias("ca"))
    b = sk.where(F.col("half")).select(
        "grp", "bucket", F.col("cnt").alias("cb"))
    z = F.lit(0).cast("bigint")
    joined = (
        spine.join(a, ["grp", "bucket"], "left")
        .join(b, ["grp", "bucket"], "left")
        .select(
            "grp", "bucket",
            F.coalesce("ca", z).alias("ca"),
            F.coalesce("cb", z).alias("cb"),
        )
    )
    wc = (
        Window.partitionBy("grp").orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = joined.select(
        "grp", "bucket",
        F.sum("ca").over(wc).alias("cuma"),
        F.sum("cb").over(wc).alias("cumb"),
    )
    tot = joined.groupBy("grp").agg(
        F.sum("ca").alias("na"), F.sum("cb").alias("nb"))
    d = (
        cum.join(tot, "grp")
        .select(
            "grp", "na", "nb",
            F.abs(
                F.col("cuma") * F.col("nb")
                - F.col("cumb") * F.col("na")
            ).alias("gap"),
        )
        .groupBy("grp")
        .agg(
            F.first("na").alias("na"),
            F.first("nb").alias("nb"),
            F.max("gap").alias("d_num"),
        )
    )
    # one empty split half (na or nb = 0) means there is no second
    # distribution to compare — NULL, never an ANSI divide-by-zero
    # abort (same guard idiom as the NULL-share text metrics)
    both = (F.col("na") > 0) & (F.col("nb") > 0)
    return d.select(
        F.col("grp").alias(group_col),
        F.col("na").cast("bigint").alias("n_a"),
        F.col("nb").cast("bigint").alias("n_b"),
        F.col("d_num").cast("bigint").alias("d_num"),
        F.when(
            both,
            F.col("d_num").cast("double")
            / (F.col("na") * F.col("nb")).cast("double"),
        ).alias("ks_d"),
        F.when(
            both,
            F.lit(10) * F.col("d_num") > F.col("na") * F.col("nb"),
        ).alias("drifted"),
    )

"""tuning — statistics-driven partition/batch sizing.

The reference profiles dataset height/width statistics (mean ± 3σ or
max-min) to auto-pick its batching "gears"
(reference: deploy/models_utils/auto_scaling/src/auto_scaling.py:1-60,
configs/auto_scaling.yaml:1-20). The Spark analog: one aggregation pass
over the corpus picks partition counts, Arrow batch size, and salt
bucket counts so that partitions fit executor memory at any SF — the
knobs SURVEY §4 lists as the only "custom" optimizer pieces needed.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, functions as F


@dataclass(frozen=True)
class PartitionPlan:
    n_rows: int
    total_bytes: int
    p50_bytes: int
    p99_bytes: int
    max_bytes: int
    n_partitions: int          # for repartition() / table bucketing
    arrow_batch_rows: int      # spark.sql.execution.arrow.maxRecordsPerBatch
    salt_buckets: int          # url-hash salting width for skewed scans
    size_ordered: bool         # co-batch similar sizes (heavy tail present)


def suggest_partitioning(
    pages: DataFrame,
    payload_col: str = "html",
    target_partition_bytes: int = 128 << 20,
    target_batch_bytes: int = 32 << 20,
    min_parallelism: int | None = None,
) -> PartitionPlan:
    """One stats pass → sizing plan. Deterministic given the data.

    - partitions sized so each holds ≈ target_partition_bytes of payload
      (the spark.sql.files.maxPartitionBytes discipline applied to the
      *decompressed* payload, which is what the python workers hold);
    - Arrow batch rows sized by p99 payload (a batch of p99-sized docs
      stays under target_batch_bytes — the gear-snapping analog);
    - salting recommended when the tail is heavy (max ≫ p99).
    """
    stats = pages.select(F.length(payload_col).alias("b")).agg(
        F.count("*").alias("n"),
        F.sum("b").alias("total"),
        F.expr("percentile_approx(b, array(0.5, 0.99), 10000)").alias("pcts"),
        F.max("b").alias("mx"),
    ).collect()[0]
    n, total, mx = int(stats["n"]), int(stats["total"] or 0), int(stats["mx"] or 0)
    p50, p99 = (int(x) for x in stats["pcts"]) if stats["pcts"] else (0, 0)

    min_par = min_parallelism or pages.sparkSession.sparkContext.defaultParallelism
    n_partitions = max(min_par, -(-total // target_partition_bytes))
    batch_rows = max(16, min(4096, target_batch_bytes // max(p99, 1)))
    # heavy tail = one doc dwarfs the TYPICAL doc (p50); p99 is itself
    # inside the tail when the skew rate is ≥1%
    heavy_tail = p50 > 0 and mx > 8 * p50
    salt_buckets = max(min_par * 2, n_partitions) if heavy_tail else n_partitions
    return PartitionPlan(
        n_rows=n, total_bytes=total, p50_bytes=p50, p99_bytes=p99,
        max_bytes=mx, n_partitions=int(n_partitions),
        arrow_batch_rows=int(batch_rows), salt_buckets=int(salt_buckets),
        size_ordered=heavy_tail,
    )


# Rectangle probes for the layout-skipping audit, as integer PERCENT
# bounds of each column's [min, max] span — scale-free, so the same
# probe set is meaningful at every SF. (probe_id, alo, ahi, blo, bhi).
ZORDER_PROBES_PCT: tuple[tuple[int, int, int, int, int], ...] = (
    (1, 10, 15, 10, 15),    # small 2-D rectangle: z-order shines
    (2, 0, 3, 0, 100),      # prefix on a only: linear-a layout shines
    (3, 0, 100, 50, 55),    # slice on b only: only z-order can skip
    (4, 40, 60, 40, 60),    # broad 2-D rectangle
)


def zorder_interleave_sql(sa: str, sb: str, bits: int,
                          dialect: str = "spark") -> str:
    """Render the Morton bit-interleave of two pre-scaled non-negative
    ints (each < 2**bits) as a SQL expression — ONE definition serving
    both engines so they cannot drift. Spark spells shifts
    shiftleft/shiftright; DuckDB uses <</>>. Pure int64 ops, exact."""
    terms = []
    for i in range(bits):
        if dialect == "spark":
            terms.append(f"shiftleft(shiftright({sa}, {i}) & 1, {2 * i})")
            terms.append(
                f"shiftleft(shiftright({sb}, {i}) & 1, {2 * i + 1})")
        else:
            terms.append(f"((({sa} >> {i}) & 1) << {2 * i})")
            terms.append(f"((({sb} >> {i}) & 1) << {2 * i + 1})")
    return "(" + " | ".join(terms) + ")"


def zorder_scale_sql(col: str, cmin: str, cmax: str, bits: int,
                     dialect: str = "spark") -> str:
    """Render min-max scaling of an integer column onto the
    [0, 2**bits) grid using INTEGER division only (Spark ``div`` ≡
    DuckDB ``//`` on BIGINT — exact cross-engine, no IEEE floor)."""
    op = "div" if dialect == "spark" else "//"
    grid = (1 << bits) - 1
    return (f"((({col} - {cmin}) * {grid}) {op} "
            f"greatest(1, {cmax} - {cmin}))")


def layout_skipping_audit(
    df: DataFrame,
    col_a: str,
    col_b: str,
    ingest_col: str,
    probes_pct=ZORDER_PROBES_PCT,
    bits: int = 8,
    n_files: int = 64,
) -> DataFrame:
    """Data-layout optimizer audit: would re-clustering this table by
    a Morton (Z-order) curve over (col_a, col_b) let min/max file
    statistics skip more files than ingest order or a single-column
    sort? One row per (layout, probe): files_total, files_hit,
    rows_scanned, rows_match, skip_share, scan_amp — the evidence a
    ``OPTIMIZE ZORDER BY`` decision needs before rewriting 100 TB.

    100 TB shape: file ids come from VALUE-range bucketing of the
    scaled/interleaved key (fixed-width z ranges), NOT from a global
    sort rank — the assignment is embarrassingly parallel (zero
    shuffle), and the only shuffles are map-side-combinable groupBys
    at file cardinality (≤ 3·n_files rows) and probe cardinality.
    The 1-row min/max stats frame is broadcast, never a window.

    Reference analog: the auto-scaling profiler picks batching gears
    from data statistics before committing to a plan (reference:
    deploy/models_utils/auto_scaling/src/auto_scaling.py:1-60); this
    applies the same measure-first discipline to file clustering."""
    if not (1 <= bits <= 16) or n_files < 1 or n_files > (1 << bits):
        raise ValueError("need 1 <= bits <= 16, 1 <= n_files <= 2^bits")
    from pyspark.sql.functions import broadcast

    spark = df.sparkSession
    stats = df.agg(
        F.min(col_a).cast("bigint").alias("amin"),
        F.max(col_a).cast("bigint").alias("amax"),
        F.min(col_b).cast("bigint").alias("bmin"),
        F.max(col_b).cast("bigint").alias("bmax"),
        F.min(ingest_col).cast("bigint").alias("imin"),
        F.max(ingest_col).cast("bigint").alias("imax"),
    )
    base = df.select(
        F.col(col_a).cast("bigint").alias("a"),
        F.col(col_b).cast("bigint").alias("b"),
        F.col(ingest_col).cast("bigint").alias("ing"),
    ).crossJoin(broadcast(stats))
    scaled = base.select(
        "a", "b",
        F.expr(zorder_scale_sql("a", "amin", "amax", bits)).alias("sa"),
        F.expr(zorder_scale_sql("b", "bmin", "bmax", bits)).alias("sb"),
        F.expr(zorder_scale_sql("ing", "imin", "imax", bits)).alias("si"),
    ).select(
        "a", "b", "sa", "sb", "si",
        F.expr(zorder_interleave_sql("sa", "sb", bits)).alias("zv"),
    )
    span, zspan = 1 << bits, 1 << (2 * bits)
    assigned = scaled.select(
        "a", "b",
        F.explode(F.array(
            F.struct(F.lit("ingest").alias("layout"),
                     F.expr(f"(si * {n_files}) div {span}")
                     .alias("file_id")),
            F.struct(F.lit("linear_a").alias("layout"),
                     F.expr(f"(sa * {n_files}) div {span}")
                     .alias("file_id")),
            F.struct(F.lit("zorder").alias("layout"),
                     F.expr(f"(zv * {n_files}) div {zspan}")
                     .alias("file_id")),
        )).alias("lf"),
    ).select("a", "b", "lf.layout", "lf.file_id")
    file_stats = assigned.groupBy("layout", "file_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_rows"),
        F.min("a").alias("fa_min"), F.max("a").alias("fa_max"),
        F.min("b").alias("fb_min"), F.max("b").alias("fb_max"),
    )
    probes = spark.createDataFrame(
        list(probes_pct), "probe_id int, alo int, ahi int, blo int, bhi int"
    ).crossJoin(broadcast(stats)).select(
        "probe_id",
        F.expr("amin + ((amax - amin) * alo) div 100").alias("a_lo"),
        F.expr("amin + ((amax - amin) * ahi) div 100").alias("a_hi"),
        F.expr("bmin + ((bmax - bmin) * blo) div 100").alias("b_lo"),
        F.expr("bmin + ((bmax - bmin) * bhi) div 100").alias("b_hi"),
    )
    hit = (~((F.col("fa_max") < F.col("a_lo"))
             | (F.col("fa_min") > F.col("a_hi"))
             | (F.col("fb_max") < F.col("b_lo"))
             | (F.col("fb_min") > F.col("b_hi")))).cast("bigint")
    per_probe = file_stats.crossJoin(broadcast(probes)).select(
        "layout", "probe_id", "n_rows", hit.alias("hit"),
    ).groupBy("layout", "probe_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("files_total"),
        F.sum("hit").cast("bigint").alias("files_hit"),
        F.sum(F.col("hit") * F.col("n_rows")).cast("bigint")
        .alias("rows_scanned"),
    )
    matches = scaled.crossJoin(broadcast(probes)).where(
        F.col("a").between(F.col("a_lo"), F.col("a_hi"))
        & F.col("b").between(F.col("b_lo"), F.col("b_hi"))
    ).groupBy("probe_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("rows_match"))
    return per_probe.join(broadcast(matches), "probe_id", "left").select(
        "layout", "probe_id", "files_total", "files_hit", "rows_scanned",
        F.coalesce("rows_match", F.lit(0)).cast("bigint")
        .alias("rows_match"),
        F.round(F.lit(1.0) - F.col("files_hit").cast("double")
                / F.col("files_total").cast("double"), 6)
        .alias("skip_share"),
        F.round(F.col("rows_scanned").cast("double")
                / F.nullif(F.col("rows_match"), F.lit(0)).cast("double"),
                6).alias("scan_amp"),
    )


def key_skew_stats(
    df: DataFrame, key_col: str, relation: str,
    max_share=(1, 20),
) -> DataFrame:
    """ONE-row shuffle-key skew audit for a prospective groupBy/join
    key: (relation, key, n_rows, n_keys, max_share, gini,
    needs_salting) — the dataset-card diagnostic that decides whether
    a key needs the salted two-phase plan (domain_cap) or AQE skew
    handling BEFORE a 100 TB job discovers it the hard way. max_share
    is the heaviest key's row fraction; gini the usual inequality
    coefficient over per-key counts (0 = uniform, → 1 = one key owns
    everything); needs_salting is the INTEGER rule
    ``max_count·den > num·n_rows`` (default: one key holding > 5 % of
    rows overwhelms a single reducer at scale).

    100 TB shape: one map-side-combinable count groupBy on the audited
    key, then everything lives at KEY cardinality — the Gini's sorted
    prefix sum is a window over per-key counts, never rows. Gini uses
    the rank formula G = 2·Σ(i·cᵢ)/(n·Σc) − (n+1)/n over counts sorted
    (count, key): exact integer sums feeding a pinned-order IEEE
    formula, round 6. NULL keys are counted as a real key (NULL-key
    skew is the most common production skew of all).

    Reference analog: auto_scaling profiles the batch-dim distribution
    before picking gears (reference:
    deploy/models_utils/auto_scaling/src/auto_scaling.py); this is the
    same profile applied to shuffle keys."""
    num, den = max_share
    if num < 0 or den < 1:
        raise ValueError(f"max_share must be (num ≥ 0, den ≥ 1)")
    counts = df.groupBy(
        F.coalesce(F.col(key_col).cast("string"), F.lit("\x00NULL"))
        .alias("k")
    ).agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    # exact global rank over the (unbounded) key relation goes through
    # the distributed range-partitioned form, never an unpartitioned
    # window — 10^9 distinct keys must not funnel into one task
    from mindocr_spark.functions.ranking import ranked_global

    ranked = ranked_global(counts, ["c", "k"], rank_col="i").select(
        "c", "i")
    agg = ranked.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_keys"),
        F.sum("c").cast("bigint").alias("n_rows"),
        F.max("c").cast("bigint").alias("max_c"),
        F.sum(F.col("i") * F.col("c")).cast("bigint").alias("s1"),
    )
    nk = F.col("n_keys").cast("double")
    tot = F.col("n_rows").cast("double")
    gini = (
        F.lit(2.0) * F.col("s1").cast("double") / (nk * tot)
        - (nk + F.lit(1.0)) / nk
    )
    return agg.select(
        F.lit(relation).alias("relation"),
        F.lit(key_col).alias("key"),
        "n_rows",
        "n_keys",
        F.round(F.col("max_c").cast("double") / tot, 6).alias(
            "max_share"
        ),
        F.round(gini + F.lit(0.0), 6).alias("gini"),
        (
            F.col("max_c") * F.lit(den) > F.lit(num) * F.col("n_rows")
        ).alias("needs_salting"),
    )


#: metrics emitted per profiled column, by kind. Shared with the SQL
#: oracle renderer in __spark_entry__ so the two sides cannot drift.
PROFILE_STRING_METRICS = ("null_rate", "distinct_count", "avg_len")
PROFILE_NUMERIC_METRICS = (
    "null_rate", "distinct_count", "min", "max", "mean",
)


def column_profile(
    df: DataFrame,
    string_cols: tuple = (),
    numeric_cols: tuple = (),
) -> DataFrame:
    """Long-format column profile of one snapshot: per column,
    (column, metric, value) with value DOUBLE. String columns get
    null_rate / distinct_count / avg_len; integer-numeric columns add
    min / max / mean. Every value is exact: counts and length/value
    sums are BIGINT aggregates, each metric ONE IEEE division (or an
    exact cast) — bit-identical across engines and partitionings.
    Callers with DOUBLE measure columns should quantize to a DECIMAL
    grain first (the repo's cents rule) before treating mean as exact.

    100 TB shape: ONE aggregate pass over the table (the multi-
    count-distinct expands rows map-side but stays one shuffle);
    the unpivot to long format happens on the single result row."""
    cols = list(string_cols) + list(numeric_cols)
    if not cols:
        raise ValueError("no columns to profile")
    aggs = [F.count(F.lit(1)).cast("bigint").alias("__n")]
    for c in cols:
        aggs.append(
            F.sum(F.col(c).isNull().cast("bigint"))
            .cast("bigint").alias(f"__null_{c}")
        )
        aggs.append(F.countDistinct(c).cast("bigint").alias(f"__d_{c}"))
    for c in string_cols:
        aggs.append(
            F.sum(F.length(c).cast("bigint"))
            .cast("bigint").alias(f"__len_{c}")
        )
    for c in numeric_cols:
        aggs.append(F.min(c).cast("bigint").alias(f"__min_{c}"))
        aggs.append(F.max(c).cast("bigint").alias(f"__max_{c}"))
        aggs.append(
            F.sum(F.col(c).cast("bigint")).cast("bigint").alias(f"__sum_{c}")
        )
    one = df.agg(*aggs)
    n = F.col("__n").cast("double")

    def _arm(c, metric, expr):
        return F.struct(
            F.lit(c).alias("column"),
            F.lit(metric).alias("metric"),
            expr.cast("double").alias("value"),
        )

    arms = []
    for c in cols:
        arms.append(
            _arm(c, "null_rate", F.col(f"__null_{c}").cast("double") / n)
        )
        arms.append(_arm(c, "distinct_count", F.col(f"__d_{c}")))
    for c in string_cols:
        nn = (F.col("__n") - F.col(f"__null_{c}")).cast("double")
        arms.append(
            _arm(
                c, "avg_len",
                F.when(nn != 0.0, F.col(f"__len_{c}").cast("double") / nn),
            )
        )
    for c in numeric_cols:
        nn = (F.col("__n") - F.col(f"__null_{c}")).cast("double")
        arms.append(_arm(c, "min", F.col(f"__min_{c}")))
        arms.append(_arm(c, "max", F.col(f"__max_{c}")))
        arms.append(
            _arm(
                c, "mean",
                F.when(nn != 0.0, F.col(f"__sum_{c}").cast("double") / nn),
            )
        )
    return one.select(
        F.explode(F.array(*arms)).alias("s")
    ).select("s.column", "s.metric", "s.value")


def profile_drift(
    old: DataFrame,
    new: DataFrame,
    string_cols: tuple = (),
    numeric_cols: tuple = (),
    rel_threshold: float = 0.10,
) -> DataFrame:
    """Schema-drift / data-quality diff between two corpus snapshots —
    the pre-publish gate that catches 'the new crawl increment has 4×
    the NULL langs' or 'avg document length silently halved' BEFORE a
    bad batch is committed. Profiles both snapshots with
    :func:`column_profile` and joins at (column, metric) grain:
    (column, metric, old_value, new_value, abs_delta, drifted).
    drifted = relative change > rel_threshold (new≠old when old is 0
    or NULL-vs-value transitions). A metric NULL on both sides is not
    drift.

    Exactness: old/new values are bit-identical pure functions of
    their snapshots; abs_delta, the relative ratio, and the verdict
    are single IEEE ops on those — deterministic end to end.

    100 TB shape: two single-pass aggregates (one per snapshot) that
    never co-shuffle the big tables; the join runs on the metric-grain
    rows (≤ columns × metrics)."""
    po = column_profile(old, string_cols, numeric_cols).select(
        "column", "metric", F.col("value").alias("old_value")
    )
    pn = column_profile(new, string_cols, numeric_cols).select(
        "column", "metric", F.col("value").alias("new_value")
    )
    j = po.join(pn, ["column", "metric"], "full")
    delta = F.abs(F.col("new_value") - F.col("old_value"))
    drift = (
        F.when(
            F.col("old_value").isNull() | F.col("new_value").isNull(),
            F.col("old_value").isNotNull() | F.col("new_value").isNotNull(),
        )
        .when(F.col("old_value") == 0.0, F.col("new_value") != 0.0)
        .otherwise(
            delta / F.abs(F.col("old_value")) > F.lit(rel_threshold)
        )
    )
    return j.select(
        "column", "metric", "old_value", "new_value",
        delta.alias("abs_delta"), drift.alias("drifted"),
    )


def compaction_plan(
    files: DataFrame,
    target_bytes: int,
    partition_col: str = "partition",
    file_col: str = "file",
    bytes_col: str = "bytes",
) -> DataFrame:
    """Small-file compaction planner (the OPTIMIZE/binPack decision):
    within each partition, order files size-descending (next-fit-
    decreasing — big files first so they don't straddle late bins,
    file name as the total-order tie break) and assign each file to
    the bin its cumulative START offset falls in — the same
    cumulative-fill rule Spark's own coalesced-read planning and
    Iceberg's binPack use. Oversized files (> target) blow their bin
    (overflow = true) and the next file automatically starts a fresh
    bin; undersized TRAILING bins are the expected remainder, but a
    partition made of many low-fill bins is the small-file smell this
    audit exists to quantify.

    Returns one row per (partition, bin):
    (partition, bin, n_files, total_bytes, fill_ratio, overflow).

    Exactness: byte sums are exact BIGINTs; bin assignment is integer
    division of the exact running sum; fill_ratio is ONE IEEE
    division.

    100 TB shape: this runs at FILE-INVENTORY grain (metadata, not
    data — ~10^6 rows for a 100 TB table of 100 MB files): one
    Exchange on the partition key for the prefix-sum window, then a
    map-side-combinable groupBy at bin grain. The actual data rewrite
    consumes this plan; it never shuffles through it."""
    if target_bytes < 1:
        raise ValueError(f"need target_bytes >= 1, got {target_bytes}")
    from pyspark.sql import Window

    w = (
        Window.partitionBy(partition_col)
        .orderBy(F.col(bytes_col).desc(), F.col(file_col).asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    d = files.withColumn(
        "__cum", F.sum(F.col(bytes_col).cast("bigint")).over(w)
    ).withColumn(
        "bin",
        F.expr(f"(__cum - {bytes_col}) div {int(target_bytes)}")
        .cast("bigint"),
    )
    return (
        d.groupBy(partition_col, "bin")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_files"),
            F.sum(F.col(bytes_col).cast("bigint"))
            .cast("bigint").alias("total_bytes"),
        )
        .select(
            partition_col,
            "bin",
            "n_files",
            "total_bytes",
            (
                F.col("total_bytes").cast("double")
                / F.lit(float(target_bytes))
            ).alias("fill_ratio"),
            (F.col("total_bytes") > F.lit(int(target_bytes)))
            .alias("overflow"),
        )
    )


def mix_entropy(
    df: DataFrame, group_col: str, category_col: str
) -> DataFrame:
    """Shannon-entropy balance audit of a categorical mix per group —
    the training-mix diagnostic ('is my German slice 90% one domain?')
    that one number answers: entropy in nats over the category
    distribution plus Pielou evenness H/ln(k) (1 = perfectly balanced
    mix, → 0 = single-source monoculture; NULL when only one category
    exists — evenness of a point is undefined). NULL categories count
    as a real category (an unlabeled source is still a source).

    Returns one row per group:
    (group, n_rows, n_categories, entropy_nats, evenness).

    Exactness discipline: counts are exact BIGINTs; p = n_cat/n_total
    is one IEEE division of exact integers; each term p·ln(p) is
    9dp-quantized then DECIMAL(28,9)-summed (order-free — the repo's
    ln idiom, cross-engine at the quantized grain); evenness divides
    the quantized H by the quantized ln(k).

    100 TB shape: one map-side-combinable groupBy at (group,
    category) grain; the group total is a window over those rows
    (referenced once); the rollup runs at group grain."""
    c = df.groupBy(
        F.col(group_col).alias("g"), F.col(category_col).alias("cat")
    ).agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    from pyspark.sql import Window

    w = Window.partitionBy("g")
    p = F.col("n").cast("double") / F.sum("n").over(w).cast("double")
    terms = c.select(
        "g",
        "n",
        F.round(p * F.log(p), 9).cast("decimal(28,9)").alias("term"),
    )
    h = terms.groupBy("g").agg(
        F.sum("n").cast("bigint").alias("n_rows"),
        F.count(F.lit(1)).cast("bigint").alias("n_categories"),
        (-F.sum("term")).cast("double").alias("entropy_nats"),
    )
    return h.select(
        F.col("g").alias(group_col),
        "n_rows",
        "n_categories",
        "entropy_nats",
        F.when(
            F.col("n_categories") > 1,
            F.col("entropy_nats")
            / F.round(F.log(F.col("n_categories").cast("double")), 9),
        ).alias("evenness"),
    )

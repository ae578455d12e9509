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
    from pyspark.sql import Window

    num, den = max_share
    if num < 0 or den < 1:
        raise ValueError(f"max_share must be (num ≥ 0, den ≥ 1)")
    counts = df.groupBy(
        F.coalesce(F.col(key_col).cast("string"), F.lit("\x00NULL"))
        .alias("k")
    ).agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    w = Window.orderBy("c", "k")
    ranked = counts.select(
        "c", F.row_number().over(w).cast("bigint").alias("i")
    )
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

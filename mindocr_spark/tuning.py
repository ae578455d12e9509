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

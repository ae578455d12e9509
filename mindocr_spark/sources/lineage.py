"""lineage — per-partition lineage + resume-from-checkpoint.

North-rule requirement: "resumable from checkpoint with per-partition
lineage + metrics". The reference's analog is train-resume from a
committed checkpoint (reference: tools/train.py:111-122). Here the unit
of commit is a *partition key* (the warc_ts bucket the pages table is
partitioned by): after a successful write of a bucket's results, a
lineage row (run_id, partition_key, docs, ...) is appended; on restart
the pending work is the anti-join of source buckets against committed
lineage — exactly-once per bucket without any driver-side bookkeeping.

On a real cluster this is Iceberg write-audit-publish: stage results to a
branch, validate the metrics row, then fast-forward main; the lineage
table is then simply Iceberg's snapshot log plus this metrics table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

LINEAGE_SCHEMA = (
    "run_id string, partition_key bigint, docs bigint, bytes_in bigint, "
    "chars_out bigint, failures bigint, wall_ms bigint"
)


def committed_partition_keys(spark: SparkSession, lineage_path: str) -> DataFrame:
    """Distinct committed partition keys (empty DataFrame if no lineage yet).

    Existence is probed through the Hadoop FS API, not by attempting the
    read — a failed DataFrameReader.load logs a full Java stack trace
    (it polluted every fresh-lineage bench tail) and can mask real read
    errors behind the blanket except."""
    from mindocr_spark.operators.pipeline import _FS

    if not _FS(spark, lineage_path).exists(lineage_path):
        return spark.createDataFrame([], "partition_key bigint")
    lin = spark.read.schema(LINEAGE_SCHEMA).parquet(lineage_path)
    return lin.select("partition_key").distinct()


def resume_filter(
    pages: DataFrame, committed: DataFrame, key_col: str = "ts_bucket"
) -> DataFrame:
    """Drop pages whose partition key is already committed — a broadcast
    anti-join (the committed set is tiny: one row per bucket), so resume
    costs one map-side filter, not a shuffle."""
    return pages.join(
        F.broadcast(committed.withColumnRenamed("partition_key", key_col)),
        on=key_col,
        how="left_anti",
    )


def record_commit(
    spark: SparkSession,
    lineage_path: str,
    run_id: str,
    partition_key: int,
    docs: int,
    bytes_in: int,
    chars_out: int,
    failures: int,
    wall_ms: int,
) -> None:
    spark.createDataFrame(
        [(run_id, partition_key, docs, bytes_in, chars_out, failures, wall_ms)],
        LINEAGE_SCHEMA,
    ).write.mode("append").parquet(lineage_path)

"""resumable — bucket-wise extraction with per-partition lineage commit.

The production job shape for the 10^12-doc table: the pages table is
laid out in partition buckets (`ts_bucket`, from
:func:`mindocr_spark.sources.pages.write_pages_partitioned`); each
bucket is extracted and committed independently — results appended
under the bucket's own partition directory, then a lineage row recorded.
A crash between buckets loses nothing: restart anti-joins the pending
bucket list against committed lineage and continues (the reference's
train-resume-from-checkpoint contract, reference: tools/train.py:111-122,
re-expressed as data-parallel partition commits).

Commit ordering makes the job idempotent-at-least-once → effectively
exactly-once per bucket: results land in a per-bucket directory with
mode=overwrite BEFORE the lineage append, so a crash mid-bucket leaves
either (no lineage row → bucket re-runs, overwrite replaces any partial
output) or (lineage row → bucket complete). On Iceberg this is
write-audit-publish with the snapshot log as lineage.
"""

from __future__ import annotations

import time

from pyspark.sql import SparkSession, functions as F

from mindocr_spark import extract_core as core
from mindocr_spark.operators.stages import extract_stage
from mindocr_spark.sources.lineage import (
    committed_partition_keys,
    record_commit,
)


def pending_buckets(spark: SparkSession, pages_path: str,
                    lineage_path: str) -> list[int]:
    """Source buckets minus committed ones (partition pruning: reads the
    hive directory listing, not the data)."""
    buckets = (
        spark.read.parquet(pages_path)
        .select("ts_bucket").distinct()
    )
    committed = committed_partition_keys(spark, lineage_path)
    rows = buckets.join(
        F.broadcast(committed.withColumnRenamed("partition_key", "ts_bucket")),
        on="ts_bucket", how="left_anti",
    ).collect()
    return sorted(int(r["ts_bucket"]) for r in rows)


def run_resumable_extraction(
    spark: SparkSession,
    pages_path: str,
    out_path: str,
    lineage_path: str,
    run_id: str = "run-0",
    params: core.ExtractParams = core.DEFAULT_PARAMS,
    fail_after: int | None = None,
) -> list[int]:
    """Extract every pending bucket; returns the buckets committed in
    this invocation. `fail_after` injects a crash after N buckets
    (tests). Each bucket's scan is partition-pruned
    (`where ts_bucket = b` hits only that hive directory)."""
    done: list[int] = []
    for b in pending_buckets(spark, pages_path, lineage_path):
        if fail_after is not None and len(done) >= fail_after:
            raise RuntimeError(f"injected crash after {fail_after} buckets")
        t0 = time.perf_counter()
        pages = spark.read.parquet(pages_path).where(F.col("ts_bucket") == b)
        result = extract_stage(pages, params)
        # results first (overwrite → re-run safe) …
        result.write.mode("overwrite").parquet(f"{out_path}/ts_bucket={b}")
        # … then the commit record
        stats = spark.read.parquet(f"{out_path}/ts_bucket={b}").agg(
            F.count("*").alias("docs"),
            F.sum("total_bytes").alias("bytes_in"),
            F.sum(F.length("extracted_text")).alias("chars_out"),
            F.sum(F.col("failed").cast("long")).alias("failures"),
        ).collect()[0]
        record_commit(
            spark, lineage_path, run_id, b,
            docs=int(stats["docs"]), bytes_in=int(stats["bytes_in"] or 0),
            chars_out=int(stats["chars_out"] or 0),
            failures=int(stats["failures"] or 0),
            wall_ms=int((time.perf_counter() - t0) * 1000),
        )
        done.append(b)
    return done

"""End-to-end extraction jobs: plan → run → write, with skew handling,
metrics and resume.

The job shape (SURVEY §4): scan → fused narrow extraction → write.
Zero shuffles on the main path. Optional knobs for the 100 TB design
point:

- ``salt_partitions``: repartition by ``xxhash64(url)`` — breaks source
  skew (one giant warc bucket) before the CPU-heavy stage; on a real
  cluster the Iceberg table is already written bucketed by url-hash so
  this shuffle disappears (scan-time bucketing).
- ``size_ordered``: ``repartitionByRange(length(html))`` — co-batches
  similar-sized documents, the analog of the reference's gear batching
  (reference: deploy/py_infer/src/data_process/utils/gear_utils.py:11-35),
  so one multi-MB page doesn't stall an otherwise-tiny Arrow batch.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from mindocr_spark import extract_core as core
from mindocr_spark.operators.stages import extract_stage
from mindocr_spark.operators.registry import build_pipeline


def prepare_input(
    pages: DataFrame,
    salt_partitions: int | None = None,
    size_ordered: bool = False,
) -> DataFrame:
    if salt_partitions:
        pages = pages.repartition(salt_partitions, F.xxhash64("url"))
    if size_ordered:
        n = pages.sparkSession.sparkContext.defaultParallelism * 2
        pages = pages.repartitionByRange(n, F.length("html"))
    return pages


def run_extraction(
    pages: DataFrame,
    params: core.ExtractParams = core.DEFAULT_PARAMS,
    staged: bool = False,
    salt_partitions: int | None = None,
    size_ordered: bool = False,
) -> DataFrame:
    """The flagship query: extract main content for every page."""
    pages = prepare_input(pages, salt_partitions, size_ordered)
    if staged:
        return build_pipeline(params=params)(pages)
    return extract_stage(pages, params)


def extraction_metrics(result: DataFrame, run_id: str) -> DataFrame:
    """Per-partition metrics — the partial+final aggregation shape of the
    reference's DetMetric/AllReduce (reference:
    mindocr/metrics/det_metrics.py:79-156) and its per-module profiling
    (deploy/py_infer/src/parallel/parallel_pipeline.py:89-104).

    Declarative: one groupBy over spark_partition_id — Catalyst does the
    map-side partial agg; no accumulator plumbing needed.
    """
    return (
        result.withColumn("partition_id", F.spark_partition_id())
        .groupBy("partition_id")
        .agg(
            F.count("*").alias("docs"),
            F.sum("total_bytes").alias("bytes_in"),
            F.sum(F.length("extracted_text")).alias("chars_out"),
            F.avg("boilerplate_ratio").alias("boilerplate_ratio"),
            F.sum(F.col("failed").cast("long")).alias("failures"),
            F.sum("n_blocks").alias("blocks"),
        )
        .withColumn("run_id", F.lit(run_id))
    )


def write_results(
    result: DataFrame,
    path: str,
    metrics_path: str | None = None,
    run_id: str = "run-0",
    partition_by: tuple[str, ...] = (),
    metrics_granularity: str = "partition",
) -> None:
    """Sink. On a real cluster: Iceberg write-audit-publish (stage to a
    branch, validate metrics, then fast-forward) — here: parquet with an
    explicit metrics table alongside (same commit discipline, minus the
    catalog).

    metrics_granularity:
    - "partition": metrics re-aggregated from the WRITTEN data (one
      extra scan; per-partition rows — the audit that describes exactly
      what was committed);
    - "global": metrics harvested via ``DataFrame.observe`` DURING the
      write job itself — zero extra passes (the observed plan executes
      exactly once, so the counters are exact); one row with
      partition_id = -1. At 100 TB the free global row is the
      every-run default and the per-partition audit is the
      deep-inspection mode.
    """
    if metrics_granularity not in ("partition", "global"):
        raise ValueError(
            f"metrics_granularity must be 'partition' or 'global', "
            f"got {metrics_granularity!r}"
        )
    if metrics_path and metrics_granularity == "global":
        result, obs = _observe_metrics(result, run_id)
    w = result.write.mode("overwrite")
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.parquet(path)
    if not metrics_path:
        return
    spark = result.sparkSession
    if metrics_granularity == "global":
        _append_metrics_row(spark, _harvest(obs), run_id, metrics_path)
    else:
        # metrics computed on the *written* data so they describe the commit
        written = spark.read.parquet(path)
        extraction_metrics(written, run_id).write.mode("append").parquet(
            metrics_path
        )


def _observe_metrics(result: DataFrame, run_id: str):
    """Attach the extraction-metrics observation (the single source of
    the audited counter list — write_results global mode and the WAP
    sink share it so the two can never drift)."""
    from pyspark.sql import Observation

    obs = Observation(f"extract_metrics_{run_id}")
    return result.observe(
        obs,
        F.count(F.lit(1)).alias("docs"),
        F.sum("total_bytes").alias("bytes_in"),
        F.sum(F.length("extracted_text")).alias("chars_out"),
        F.avg("boilerplate_ratio").alias("boilerplate_ratio"),
        F.sum(F.col("failed").cast("long")).alias("failures"),
        F.sum("n_blocks").alias("blocks"),
    ), obs


def _harvest(obs) -> dict:
    return {k: (0 if v is None else v) for k, v in dict(obs.get).items()}


def _append_metrics_row(spark, g: dict, run_id: str,
                        metrics_path: str) -> None:
    spark.createDataFrame(
        [(
            -1, int(g["docs"]), int(g["bytes_in"]), int(g["chars_out"]),
            float(g["boilerplate_ratio"]), int(g["failures"]),
            int(g["blocks"]), run_id,
        )],
        "partition_id int, docs bigint, bytes_in bigint, chars_out bigint, "
        "boilerplate_ratio double, failures bigint, blocks bigint, "
        "run_id string",
    ).write.mode("append").parquet(metrics_path)


def write_results_wap(
    result: DataFrame,
    path: str,
    metrics_path: str,
    run_id: str = "run-0",
    audit=None,
) -> bool:
    """Write-audit-publish sink — the Iceberg WAP commit discipline
    (stage to a branch → validate → fast-forward main; SURVEY §1.4/§4)
    emulated on a LOCAL filesystem (object-store/HDFS paths are
    rejected: dir renames are not atomic there — that is exactly what
    an Iceberg catalog provides on a real cluster):

    1. WRITE the results to a run-scoped staging directory (observe()
       collects the audit counters in the same job — no extra scan);
    2. AUDIT: the `audit(metrics_dict) -> bool` hook inspects the
       counters (default: zero failed documents and ≥1 doc); a failed
       audit leaves the previous publication untouched and the staging
       dir behind for inspection;
    3. PUBLISH: swap-by-rename. The swap is two renames, so a crash in
       between can leave `path` absent with the old data parked at
       `{path}__replaced_{run_id}` — the next call SELF-HEALS by
       restoring the single parked directory before doing anything
       else, and stale staging/replaced leftovers from this run_id are
       cleared up front so retries are idempotent.

    Returns True iff published.
    """
    import glob
    import os
    import shutil

    if "://" in path:
        raise NotImplementedError(
            "write_results_wap emulates WAP with local directory renames; "
            "for object stores / HDFS use a real Iceberg catalog "
            "(write_results works on any Spark-supported URI)"
        )
    path = path.rstrip("/")  # a trailing slash would nest staging inside
    # self-heal: a crash between the publish renames leaves exactly one
    # parked __replaced_* dir and no published path — restore it
    parked = glob.glob(f"{path}__replaced_*")
    if not os.path.exists(path) and len(parked) == 1:
        os.rename(parked[0], path)
    # idempotent retry: clear this run's leftovers
    for leftover in (f"{path}__staging_{run_id}", f"{path}__replaced_{run_id}"):
        if os.path.exists(leftover):
            shutil.rmtree(leftover)

    audit = audit or (lambda m: m["failures"] == 0 and m["docs"] > 0)
    staging = f"{path}__staging_{run_id}"
    observed, obs = _observe_metrics(result, run_id)
    observed.write.mode("overwrite").parquet(staging)
    g = _harvest(obs)
    if not audit(g):
        return False  # staging left behind for inspection; old data intact
    if os.path.exists(path):
        old = f"{path}__replaced_{run_id}"
        os.rename(path, old)
        os.rename(staging, path)
        shutil.rmtree(old)
    else:
        os.rename(staging, path)
    _append_metrics_row(result.sparkSession, g, run_id, metrics_path)
    return True

"""incremental — exactly-once incremental extraction over a growing
pages directory.

``readStream`` over the parquet `pages` layout → the same fused
extraction stage the batch job uses → parquet sink with checkpointed
file-source progress. `trigger(availableNow=True)` gives the reference's
bounded-stream semantics (drain everything currently available, then
stop — the StopSign analog, reference:
deploy/py_infer/src/parallel/parallel_pipeline.py:35-36) while the
checkpoint dir carries resume state: re-running after new files land
processes ONLY the new files. This is the micro-batch flavour of the
north rule's "resumable from checkpoint"; the partition-lineage flavour
for batch jobs lives in :mod:`mindocr_spark.sources.lineage`.
"""

from __future__ import annotations

from pyspark.sql import SparkSession

from mindocr_spark.corpus import PAGES_SCHEMA_DDL
from mindocr_spark.operators.stages import extract_stage


def incremental_extract(
    spark: SparkSession,
    pages_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    max_files_per_trigger: int | None = None,
) -> None:
    """Drain all unprocessed page files into the results sink, then stop.

    Blocking; idempotent across restarts (file-source checkpoint tracks
    consumed files, parquet sink commits atomically per micro-batch).
    """
    reader = (
        spark.readStream.schema(PAGES_SCHEMA_DDL)
        .option("latestFirst", "false")
    )
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    _drain_to_parquet(extract_stage(reader.parquet(pages_dir)),
                      out_dir, checkpoint_dir)


def _drain_to_parquet(result, out_dir: str, checkpoint_dir: str) -> None:
    """Shared availableNow sink: drain everything unprocessed into the
    parquet sink with file-source checkpoint resume, then stop."""
    (
        result.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
        .awaitTermination()
    )


def incremental_extract_jsonl(
    spark: SparkSession,
    jsonl_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    max_files_per_trigger: int | None = None,
) -> None:
    """Streaming ingest of the JSON-lines crawl-dump format
    (:mod:`mindocr_spark.sources.jsonl`): JSON is a native Structured
    Streaming file source (binaryFile is not, which is why the WARC
    flavour uses the lineage anti-join instead), so newly-landed dump
    files flow straight through base64-decode → fused extraction →
    parquet sink with file-source checkpoint resume. availableNow
    drains everything currently unprocessed, then stops."""
    from mindocr_spark.sources.jsonl import JSONL_SCHEMA, decode_jsonl_pages

    reader = spark.readStream.schema(JSONL_SCHEMA)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    pages = decode_jsonl_pages(reader.json(jsonl_dir))
    _drain_to_parquet(extract_stage(pages), out_dir, checkpoint_dir)

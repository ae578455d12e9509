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


def incremental_curate_stream(
    spark: SparkSession,
    pages_dir: str,
    state_root: str,
    checkpoint_dir: str,
    cfg=None,
    threshold: float = 0.5,
    params=None,
    max_files_per_trigger: int | None = None,
    compact_every: int | None = None,
    compact_partitions: int | None = None,
) -> None:
    """Streaming ingestion with EXACTLY-ONCE cross-corpus dedup: each
    micro-batch of newly-landed page files runs the full curation
    funnel and is then deduplicated against the ALREADY-COMMITTED
    corpus before being appended to it — the r3 synthesis of the
    streaming ingest path and the dedup-state log.

    Exactly-once comes from composing two idempotence layers:

    - the file-source checkpoint guarantees each page file enters
      exactly one micro-batch (batch replayed after a crash ⇒ same
      batch_id, same files);
    - ``curate_increment`` commits under ``run_id = batch-<batch_id>``,
      and a committed run_id replays as a no-op — so a crash between
      the dedup commit and the checkpoint advance cannot double-commit
      the batch (the foreachBatch at-least-once window, closed by the
      log's idempotent manifest commit).

    run_id namespacing: batch ids restart at 0 whenever the checkpoint
    is reset (or a second stream points at the same state_root), so a
    bare ``batch-<id>`` run_id would collide with an already-committed
    one and the replayed-plus-NEW files of the fresh batch-0 would be
    silently swallowed by the idempotence no-op — permanent data loss.
    Each checkpoint therefore carries its own stream identity (a
    create-once ``_graft_stream_id`` file inside the checkpoint dir,
    same lifetime as the batch counter it qualifies) and commits under
    ``<stream_id>-batch-<id>``: a replay of the SAME checkpoint's batch
    reuses the same run_id (exactly-once preserved), while a reset
    checkpoint gets a fresh id — its re-delivered old files are dropped
    by the cross-corpus exact-fingerprint pass, and genuinely new files
    commit.

    compact_every: every micro-batch appends one increment directory,
    and every LATER batch's cross-corpus join union-scans all of them —
    unbounded, a long-running stream decays into a small-files scan.
    With ``compact_every=N``, whenever the live increment count reaches
    N the log is folded into one consolidated increment
    (``DedupLog.compact``, itself an atomic manifest swing, crash-safe
    under the same matrix as the commits) before the next batch, so the
    committed side of the candidate join stays O(1) directories. The
    run-id ledger is preserved — exactly-once replay is unaffected.

    availableNow semantics: drain everything unprocessed, then stop.
    Readers consume the corpus through ``DedupLog(...).read("corpus")``.
    """
    from mindocr_spark.dedup_state import (
        DedupLog, MinHashParams, curate_increment,
    )

    params = params or MinHashParams()
    log = DedupLog(spark, state_root)
    stream_id = _checkpoint_stream_id(spark, checkpoint_dir)

    def commit_batch(batch_df, batch_id: int) -> None:
        if compact_every and len(log.live_increments()) >= compact_every:
            log.compact(target_partitions=compact_partitions)
        curate_increment(
            batch_df, log, f"{stream_id}-batch-{batch_id}", cfg=cfg,
            params=params, threshold=threshold,
        )

    reader = (
        spark.readStream.schema(PAGES_SCHEMA_DDL)
        .option("latestFirst", "false")
    )
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    (
        reader.parquet(pages_dir)
        .writeStream.foreachBatch(commit_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
        .awaitTermination()
    )


def _checkpoint_stream_id(spark: SparkSession, checkpoint_dir: str) -> str:
    """Stable identity for one checkpoint lineage: read the create-once
    ``_graft_stream_id`` file inside the checkpoint dir, minting it on
    first start. It lives and dies WITH the batch counter — same
    checkpoint ⇒ same id across restarts; wiped/reset checkpoint ⇒
    fresh id, so restarted batch numbering never aliases a previous
    lineage's committed run_ids."""
    import uuid

    from mindocr_spark.operators.pipeline import _FS

    fs = _FS(spark, checkpoint_dir)
    marker = f"{checkpoint_dir.rstrip('/')}/_graft_stream_id"
    if fs.exists(marker):
        return fs.read_bytes(marker).decode("ascii").strip()
    sid = uuid.uuid4().hex[:12]
    fs.write_bytes(marker, sid.encode("ascii"))
    return sid


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

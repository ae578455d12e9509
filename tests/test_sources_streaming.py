"""Sources (golden TSV round-trip, lineage resume) + incremental
streaming extraction with checkpoint resume."""

import os

import pytest

from pyspark.sql import functions as F


@pytest.fixture()
def tmpdirs(tmp_path):
    return {k: str(tmp_path / k) for k in
            ("pages", "out", "ckpt", "tsv", "lineage")}


def _corpus(spark, n, start=0):
    from mindocr_spark.corpus import generate_batch, PAGES_SCHEMA_DDL

    return spark.createDataFrame(
        generate_batch(42, range(start, start + n)), PAGES_SCHEMA_DDL
    )


def test_golden_tsv_roundtrip(spark, tmpdirs):
    from mindocr_spark.operators.stages import extract_stage
    from mindocr_spark.sources.golden_tsv import read_golden_tsv, write_golden_tsv

    result = extract_stage(_corpus(spark, 24))
    write_golden_tsv(result, tmpdirs["tsv"])
    back = read_golden_tsv(spark, tmpdirs["tsv"])
    orig = {r["url"]: r for r in result.collect()}
    rt = {r["url"]: r for r in back.collect()}
    assert set(orig) == set(rt)
    for url in orig:
        assert rt[url]["extracted_text"] == orig[url]["extracted_text"]
        assert len(rt[url]["spans"] or []) == len(orig[url]["spans"])


def test_incremental_streaming_resume(spark, tmpdirs):
    """availableNow drains what exists; a second run after new files land
    processes ONLY the new files (file-source checkpoint) — the
    north-rule resume-from-checkpoint behavior, micro-batch flavour."""
    from mindocr_spark.streaming import incremental_extract

    _corpus(spark, 20).write.mode("append").parquet(tmpdirs["pages"])
    incremental_extract(spark, tmpdirs["pages"], tmpdirs["out"], tmpdirs["ckpt"])
    n1 = spark.read.parquet(tmpdirs["out"]).count()
    assert n1 == 20

    _corpus(spark, 15, start=1000).write.mode("append").parquet(tmpdirs["pages"])
    incremental_extract(spark, tmpdirs["pages"], tmpdirs["out"], tmpdirs["ckpt"])
    out = spark.read.parquet(tmpdirs["out"])
    assert out.count() == 35                      # 20 old + 15 new, no reprocess
    assert out.select("url").distinct().count() == 35


def test_lineage_resume_filter(spark, tmpdirs):
    from mindocr_spark.sources.lineage import (
        committed_partition_keys,
        record_commit,
        resume_filter,
    )

    pages = _corpus(spark, 30).withColumn(
        "ts_bucket", F.pmod(F.xxhash64("url"), F.lit(4))
    )
    # nothing committed yet → everything pending
    committed = committed_partition_keys(spark, tmpdirs["lineage"])
    assert resume_filter(pages, committed).count() == 30

    # commit bucket 1, resume skips exactly its rows
    n_b1 = pages.where("ts_bucket = 1").count()
    record_commit(spark, tmpdirs["lineage"], "run-1", 1,
                  docs=n_b1, bytes_in=0, chars_out=0, failures=0, wall_ms=5)
    committed = committed_partition_keys(spark, tmpdirs["lineage"])
    pending = resume_filter(pages, committed)
    assert pending.count() == 30 - n_b1
    assert pending.where("ts_bucket = 1").count() == 0


def test_write_pages_partitioned_layout(spark, tmp_path):
    from mindocr_spark.sources.pages import read_pages, write_pages_partitioned

    path = str(tmp_path / "pp")
    write_pages_partitioned(_corpus(spark, 40), path, ts_buckets=4)
    # hive-style bucket dirs exist and the scan sees every row
    buckets = [d for d in os.listdir(path) if d.startswith("ts_bucket=")]
    assert 1 <= len(buckets) <= 4
    assert read_pages(spark, path).count() == 40


def test_incremental_jsonl_stream_resumes(spark, tmp_path):
    """Streaming JSONL ingest: availableNow drains what's there; a new
    dump file later is processed exactly once via the checkpoint."""
    from pyspark.sql import functions as F
    from mindocr_spark.corpus import PAGES_SCHEMA_DDL, generate_batch
    from mindocr_spark.sources.jsonl import write_jsonl_pages
    from mindocr_spark.streaming.incremental import incremental_extract_jsonl

    src, out, ckpt = (str(tmp_path / d) for d in ("src", "out", "ckpt"))
    rows = generate_batch(5, range(12))
    pages = spark.createDataFrame(rows, PAGES_SCHEMA_DDL).select(
        "url", "warc_ts", "html", "lang"
    )
    write_jsonl_pages(pages.where(F.col("url").rlike("/[0-5]$")), src + "/b0")
    incremental_extract_jsonl(spark, src + "/*", out, ckpt)
    first = spark.read.parquet(out)
    n_first = first.count()
    assert 0 < n_first < 12
    assert first.where(F.col("failed")).count() == 0

    # second dump lands → only the new files are processed
    write_jsonl_pages(pages.where(~F.col("url").rlike("/[0-5]$")), src + "/b1")
    incremental_extract_jsonl(spark, src + "/*", out, ckpt)
    final = spark.read.parquet(out)
    assert final.count() == 12
    assert final.select("url").distinct().count() == 12   # exactly once
    # extracted text matches the batch path byte-for-byte
    from mindocr_spark.operators.pipeline import run_extraction
    batch = {r["url"]: r["extracted_text"]
             for r in run_extraction(pages).collect()}
    for r in final.collect():
        assert r["extracted_text"] == batch[r["url"]]


def test_incremental_curate_stream_exactly_once(spark, tmp_path):
    """Streaming ingest + cross-corpus dedup: each micro-batch is
    curated and committed against the already-committed corpus; planted
    cross-batch duplicates are dropped; replaying batches (fresh
    checkpoint ⇒ same files re-enter as batch-0) is a strict no-op
    because the dedup log's run_id commit is idempotent."""
    from mindocr_spark.curate import CurateConfig
    from mindocr_spark.dedup_state import DedupLog
    from mindocr_spark.streaming import incremental_curate_stream

    pages_dir = str(tmp_path / "pages")
    state = str(tmp_path / "state")
    ckpt = str(tmp_path / "ckpt")
    cfg = CurateConfig(min_chars=50, neardup_threshold=2.0)

    _corpus(spark, 20).write.mode("append").parquet(pages_dir)
    incremental_curate_stream(spark, pages_dir, state, ckpt, cfg=cfg,
                              threshold=0.35)
    log = DedupLog(spark, state)
    runs = log.committed_runs()
    assert len(runs) == 1 and runs[0].endswith("-batch-0")
    sid = runs[0].split("-batch-")[0]
    n1 = log.read("corpus").count()
    assert n1 > 0

    # second drop: 5 NEW pages + 5 exact copies of already-committed
    # pages under different urls — only the new ones may land
    from mindocr_spark.corpus import generate_batch, PAGES_SCHEMA_DDL

    dup_rows = [dict(r, url=r["url"] + "?mirror=1")
                for r in generate_batch(42, range(5))]
    new_rows = generate_batch(42, range(20, 25))
    spark.createDataFrame(new_rows + dup_rows, PAGES_SCHEMA_DDL).write.mode(
        "append"
    ).parquet(pages_dir)
    incremental_curate_stream(spark, pages_dir, state, ckpt, cfg=cfg,
                              threshold=0.35)
    # the SAME checkpoint keeps its stream id across restarts
    assert log.committed_runs() == [f"{sid}-batch-0", f"{sid}-batch-1"]
    n2 = log.read("corpus").count()
    assert n1 < n2 <= n1 + 5  # mirrors deduped cross-corpus
    texts = [r["text"] for r in log.read("corpus").collect()]
    assert len(texts) == len(set(texts))  # no duplicate content committed

    # replay window: a FRESH checkpoint re-delivers every file as
    # batch-0 under a FRESH stream id (never aliasing the committed
    # run_ids); the re-delivered docs are all cross-corpus duplicates,
    # so the corpus is byte-for-byte unchanged
    incremental_curate_stream(spark, pages_dir, state,
                              str(tmp_path / "ckpt2"), cfg=cfg,
                              threshold=0.35)
    runs = log.committed_runs()
    assert len(runs) == 3 and runs[2].endswith("-batch-0")
    assert runs[2].split("-batch-")[0] != sid
    assert log.read("corpus").count() == n2

    # checkpoint reset WITH genuinely new files: a bare batch-counter
    # run_id would collide with the committed batch-0 and silently
    # swallow the new pages forever; the stream-id namespace means they
    # commit, while the re-delivered old pages still dedup away
    spark.createDataFrame(
        generate_batch(42, range(30, 38)), PAGES_SCHEMA_DDL
    ).write.mode("append").parquet(pages_dir)
    incremental_curate_stream(spark, pages_dir, state,
                              str(tmp_path / "ckpt3"), cfg=cfg,
                              threshold=0.35)
    n3 = log.read("corpus").count()
    assert n3 > n2  # the new pages landed
    texts = [r["text"] for r in log.read("corpus").collect()]
    assert len(texts) == len(set(texts))  # and nothing committed twice


def test_incremental_curate_stream_compacts(spark, tmp_path):
    """compact_every bounds the live increment count of a long-running
    stream (the small-files decay of a per-micro-batch log) without
    changing the committed corpus or the exactly-once ledger."""
    from mindocr_spark.curate import CurateConfig
    from mindocr_spark.dedup_state import DedupLog
    from mindocr_spark.streaming import incremental_curate_stream

    pages_dir = str(tmp_path / "pages")
    state = str(tmp_path / "state")
    ckpt = str(tmp_path / "ckpt")
    cfg = CurateConfig(min_chars=50, neardup_threshold=2.0)

    def drain():
        incremental_curate_stream(spark, pages_dir, state, ckpt, cfg=cfg,
                                  threshold=0.35, compact_every=2)

    for start in (0, 100, 200, 300):
        _corpus(spark, 6, start=start).write.mode("append").parquet(pages_dir)
        drain()

    log = DedupLog(spark, state)
    # 4 batches committed, but folding kicked in whenever 2 increments
    # were live — the scan side never exceeds compact_every dirs
    assert len(log.live_increments()) <= 2
    batch_runs = [r for r in log.committed_runs() if "-batch-" in r]
    assert len(batch_runs) == 4  # the ledger keeps every batch
    texts = [r["text"] for r in log.read("corpus").collect()]
    assert len(texts) == len(set(texts))  # corpus is still dedup-clean
    n = len(texts)

    # replay window: fresh checkpoint re-delivers everything; the
    # compacted state still drops every re-delivered doc
    incremental_curate_stream(spark, pages_dir, state,
                              str(tmp_path / "ckpt2"), cfg=cfg,
                              threshold=0.35, compact_every=2)
    assert log.read("corpus").count() == n

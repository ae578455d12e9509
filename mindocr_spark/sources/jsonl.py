"""jsonl — external-format ingestion #2: JSON-lines crawl dumps.

Alongside the WARC reader (:mod:`mindocr_spark.sources.warc`), this
covers the other common crawl-dump shape: one JSON object per line with
(url, fetch time, base64 page bytes, language) — the converter family
the reference ships eight of (reference:
tools/dataset_converters/convert.py:32-54).

Everything is JVM-side (`to_json`/`from_json` schema read, `base64`/
`unbase64` for the binary payload, epoch-seconds for time): the whole
ingest stays inside codegen with zero Python, and the format
round-trips the pages contract exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

JSONL_SCHEMA = "url string, warc_sec bigint, html_b64 string, lang string"


def write_jsonl_pages(pages: DataFrame, out_dir: str,
                      n_files: int = 8) -> None:
    """pages(url, warc_ts, html, lang) → JSON-lines text files. The
    payload travels as base64 (JSON cannot carry raw bytes); the
    timestamp as epoch seconds (tz-proof, like the WARC writer)."""
    (
        pages.select(
            F.to_json(
                F.struct(
                    F.col("url"),
                    F.unix_timestamp("warc_ts").alias("warc_sec"),
                    F.base64("html").alias("html_b64"),
                    F.col("lang"),
                )
            ).alias("value")
        )
        .repartition(n_files)
        .write.mode("overwrite")
        .text(out_dir)
    )


def decode_jsonl_pages(raw: DataFrame) -> DataFrame:
    """JSONL columns → the pages contract (base64 → binary, epoch
    seconds → timestamp). THE single decode projection — shared by the
    batch reader and the streaming ingest so the round-trip invariant
    lives in one place."""
    return raw.select(
        "url",
        F.timestamp_seconds("warc_sec").alias("warc_ts"),
        F.unbase64("html_b64").alias("html"),
        "lang",
    )


def read_jsonl_pages(spark: SparkSession, path: str) -> DataFrame:
    """JSON-lines dump → pages(url, warc_ts, html, lang). Schema-first
    read (no inference pass over 100 TB); malformed lines surface as
    null url rows (PERMISSIVE mode) rather than killing the scan —
    filterable by the caller, the skip-flag discipline."""
    return decode_jsonl_pages(spark.read.schema(JSONL_SCHEMA).json(path))


def synth_jsonl_dir(spark: SparkSession, sf_dir: str,
                    n_files: int = 8) -> str:
    """Idempotent fixture-JSONL synthesis for a testdata sf dir,
    content-hash-keyed (see sources.content_keyed_fixture_dir)."""
    from mindocr_spark.sources import content_keyed_fixture_dir
    from mindocr_spark.sources import pages as pages_mod
    from mindocr_spark.sources.pages import pages_from_documents

    def build(out_dir: str) -> None:
        pages = pages_from_documents(spark, sf_dir).repartition(
            spark.sparkContext.defaultParallelism
        )
        write_jsonl_pages(pages, out_dir, n_files=n_files)

    return content_keyed_fixture_dir(
        "mindocr_jsonl", sf_dir, (__file__, pages_mod.__file__), build
    )

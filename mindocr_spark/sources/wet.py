"""wet — Common-Crawl-style WET (extracted-text) derived format.

A crawl pipeline's canonical text artifact: WET files are WARC/1.0
containers whose records are ``WARC-Type: conversion`` — the extracted
plain text of each response, no HTTP envelope. This module closes the
loop the north rule describes: pages → extraction → WET export, and
WET ingestion back into a (url, warc_ts, text) relation, both
distributed and byte-faithful.

Same architecture as sources/warc.py (the sibling response-record
module): the writer is a one-group-per-file applyInPandas sink (no
driver collect; record order pinned by url so files are
bit-reproducible); the reader is a binaryFile scan (files are the
parallelism unit — a real crawl segment is ~64k WET files) over the
SHARED hardened record walk (`warc.walk_warc_records` — negative /
absent Content-Length and non-advancing positions rejected).

Reference lineage: the reference persists recognition output as
text-per-image label files next to the raw payloads
(reference: tools/infer/text/predict_system.py:180-205,
mindocr/data/utils/crop.py); WET export is the web-corpus analog —
the extraction result serialized as a first-class derived artifact.
"""

from __future__ import annotations

import os
from typing import Iterator

from pyspark.sql import DataFrame, SparkSession, functions as F

from .warc import _CRLF, _iso, walk_warc_records

#: The ingest contract for WET-derived text relations.
WET_DOCS_SCHEMA = (
    "url string, warc_ts timestamp, text string, wet_file string"
)


def format_conversion_record(url: str, ts_sec: int, text: str) -> bytes:
    """One WARC/1.0 conversion record: extracted plain text, UTF-8."""
    import hashlib

    body = text.encode("utf-8")
    rec_id = hashlib.md5(f"{url}:{ts_sec}:conversion".encode()).hexdigest()
    head = (
        b"WARC/1.0\r\n"
        b"WARC-Type: conversion\r\n"
        + f"WARC-Target-URI: {url}\r\n".encode()
        + f"WARC-Date: {_iso(ts_sec)}\r\n".encode()
        + f"WARC-Record-ID: <urn:uuid:{rec_id}>\r\n".encode()
        + b"Content-Type: text/plain\r\n"
        + f"Content-Length: {len(body)}\r\n".encode()
        + _CRLF
    )
    return head + body + _CRLF + _CRLF


def _wetinfo(filename: str) -> bytes:
    body = (
        b"software: mindocr-spark-wet-writer/1.0\r\n"
        b"format: WARC File Format 1.0\r\n"
        b"conformsTo: conversion\r\n"
    )
    return (
        b"WARC/1.0\r\n"
        b"WARC-Type: warcinfo\r\n"
        + f"WARC-Filename: {filename}\r\n".encode()
        + f"WARC-Date: {_iso(0)}\r\n".encode()
        + b"Content-Type: application/warc-fields\r\n"
        + f"Content-Length: {len(body)}\r\n".encode()
        + _CRLF + body + _CRLF + _CRLF
    )


def write_wet_dir(docs: DataFrame, out_dir: str, n_files: int = 8) -> int:
    """docs(url, warc_ts, text) → `n_files` .warc.wet files under
    out_dir, written DISTRIBUTED (one group per file via applyInPandas
    — the converter-sink shape; no driver collect). Record order inside
    a file is pinned (sorted by url) so the files are bit-reproducible.
    Returns the number of records written."""
    import pandas as pd

    os.makedirs(out_dir, exist_ok=True)
    # epoch seconds JVM-side: tz-proof hand-off into the python writer
    src = docs.select(
        "url", F.unix_timestamp("warc_ts").alias("ts_sec"), "text",
        F.pmod(F.xxhash64("url"), F.lit(n_files)).alias("file_id"),
    )

    def write_group(key, pdf: "pd.DataFrame") -> "pd.DataFrame":
        fid = int(key[0])
        name = f"part-{fid:05d}.warc.wet"
        pdf = pdf.sort_values("url")
        buf = bytearray(_wetinfo(name))
        for r in pdf.itertuples():
            buf += format_conversion_record(r.url, int(r.ts_sec), r.text)
        tmp = os.path.join(out_dir, f".{name}.tmp{os.getpid()}")
        with open(tmp, "wb") as fh:
            fh.write(bytes(buf))
        os.replace(tmp, os.path.join(out_dir, name))
        return pd.DataFrame({"file_id": [fid], "n_records": [len(pdf)]})

    written = (
        src.groupBy("file_id")
        .applyInPandas(write_group, schema="file_id int, n_records bigint")
        .agg(F.sum("n_records").alias("n"))
        .collect()[0]["n"]
    )
    return int(written)


def parse_wet(payload: bytes) -> list[dict]:
    """Walk a WET file over the shared hardened record walk; conversion
    records yield {url, ts_sec, text}; other types (warcinfo) skip."""
    from .warc import _parse_iso

    out: list[dict] = []
    for headers, body in walk_warc_records(payload):
        if headers.get("warc-type") != "conversion":
            continue
        out.append(dict(
            url=headers["warc-target-uri"],
            ts_sec=_parse_iso(headers["warc-date"]),
            text=body.decode("utf-8"),
        ))
    return out


def read_wet(spark: SparkSession, path: str) -> DataFrame:
    """Ingest WET files into (url, warc_ts, text, wet_file): binaryFile
    scan (one row per file — files are the parallelism unit) →
    mapInPandas record parse. Parse failures surface as a single failed
    row per file (url = file path, text NULL) — the skip-flag
    discipline; no row loss, no job abort on one corrupt segment."""
    import pandas as pd

    files_df = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "*.warc.wet")
        .load(path)
    )

    def parse(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            rows = []
            for fpath, content in zip(pdf["path"], pdf["content"]):
                try:
                    for rec in parse_wet(bytes(content)):
                        rows.append(dict(
                            url=rec["url"],
                            warc_ts=pd.Timestamp(rec["ts_sec"], unit="s",
                                                 tz="UTC"),
                            text=rec["text"],
                            wet_file=fpath,
                        ))
                except Exception:
                    rows.append(dict(
                        url=fpath, warc_ts=pd.Timestamp(0, unit="s",
                                                        tz="UTC"),
                        text=None, wet_file=fpath,
                    ))
            yield pd.DataFrame(
                rows, columns=["url", "warc_ts", "text", "wet_file"]
            )

    return files_df.select("path", "content").mapInPandas(
        parse, schema=WET_DOCS_SCHEMA
    )


def synth_wet_dir(spark: SparkSession, sf_dir: str, n_files: int = 8) -> str:
    """Idempotent fixture-WET synthesis: run the REAL extraction
    pipeline over the documents→pages corpus and serialize its output
    as WET files under /tmp (content-hash-keyed)."""
    from mindocr_spark.operators import pipeline as pipeline_mod
    from mindocr_spark.operators.pipeline import run_extraction
    from mindocr_spark.sources import content_keyed_fixture_dir
    from mindocr_spark.sources import pages as pages_mod, warc as warc_mod

    def build(out_dir: str) -> None:
        from mindocr_spark.sources.pages import pages_from_documents

        pages = pages_from_documents(spark, sf_dir).repartition(
            spark.sparkContext.defaultParallelism
        )
        docs = run_extraction(pages).select(
            "url", "warc_ts", F.col("extracted_text").alias("text")
        )
        write_wet_dir(docs, out_dir, n_files=n_files)

    # the key must cover every module the built BYTES depend on:
    # extraction output (pipeline + its extract_core import chain is
    # versioned through pipeline's file), the WARC framing primitives,
    # and the page template
    return content_keyed_fixture_dir(
        "mindocr_wet", sf_dir,
        (__file__, pages_mod.__file__, warc_mod.__file__,
         pipeline_mod.__file__), build
    )

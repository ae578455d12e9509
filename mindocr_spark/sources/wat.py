"""wat — Common-Crawl-style WAT (metadata) derived format.

The third member of the crawl artifact triple (WARC = raw responses,
WET = extracted text, WAT = per-capture metadata): WARC/1.0 containers
whose records are ``WARC-Type: metadata`` carrying a JSON envelope —
title, content digest, payload length, outlink count — the compact
relation crawl analytics and frontier builders consume without ever
touching page bytes.

Architecture identical to sources/wet.py: metadata fields are computed
JVM-SIDE on the scan (md5/length/regex count — no page bytes enter
Python; the pandas writer only serializes the already-tiny envelope),
the writer is a one-group-per-file applyInPandas sink with url-sorted
bit-reproducible output, and the reader is a binaryFile scan over the
shared hardened record walk (`warc.walk_warc_records`).

Reference lineage: the reference persists per-image prediction
metadata (boxes, scores, shapes) as JSON label lines next to payloads
(reference: tools/infer/text/predict_system.py:180-205); WAT is the
crawl-scale analog — derived metadata as a first-class artifact.
"""

from __future__ import annotations

import os
from typing import Iterator

from pyspark.sql import DataFrame, SparkSession, functions as F

from .warc import _CRLF, _iso, walk_warc_records

WAT_META_SCHEMA = (
    "url string, warc_ts timestamp, title string, digest string, "
    "length bigint, n_anchors int, wat_file string"
)

#: <title> tap — (?s) so multi-line titles extract; non-greedy.
_TITLE_RE = r"(?s)<title>(.*?)</title>"


def format_metadata_record(url: str, ts_sec: int, body: bytes) -> bytes:
    """One WARC/1.0 metadata record carrying a JSON envelope."""
    import hashlib

    rec_id = hashlib.md5(f"{url}:{ts_sec}:metadata".encode()).hexdigest()
    head = (
        b"WARC/1.0\r\n"
        b"WARC-Type: metadata\r\n"
        + f"WARC-Target-URI: {url}\r\n".encode()
        + f"WARC-Date: {_iso(ts_sec)}\r\n".encode()
        + f"WARC-Record-ID: <urn:uuid:{rec_id}>\r\n".encode()
        + b"Content-Type: application/json\r\n"
        + f"Content-Length: {len(body)}\r\n".encode()
        + _CRLF
    )
    return head + body + _CRLF + _CRLF


def write_wat_dir(pages: DataFrame, out_dir: str, n_files: int = 8) -> int:
    """pages(url, warc_ts, html) → `n_files` .warc.wat files under
    out_dir, DISTRIBUTED. The metadata itself — title, md5 digest,
    payload length, anchor count — is computed by JVM expressions on
    the scan; page bytes never reach the Python writer (at 10^12 pages
    the Arrow hand-off carries ~100-byte envelopes, not payloads).
    Record order pinned by url (bit-reproducible files)."""
    import json as _json

    import pandas as pd

    from mindocr_spark.functions.links import HREF_RE

    os.makedirs(out_dir, exist_ok=True)
    html_s = F.col("html").cast("string")
    src = pages.select(
        "url",
        F.unix_timestamp("warc_ts").alias("ts_sec"),
        F.regexp_extract(html_s, _TITLE_RE, 1).alias("title"),
        F.md5("html").alias("digest"),
        F.length("html").cast("bigint").alias("length"),
        F.size(
            F.regexp_extract_all(html_s, F.lit(HREF_RE), F.lit(1))
        ).alias("n_anchors"),
        F.pmod(F.xxhash64("url"), F.lit(n_files)).alias("file_id"),
    )

    def write_group(key, pdf: "pd.DataFrame") -> "pd.DataFrame":
        fid = int(key[0])
        name = f"part-{fid:05d}.warc.wat"
        pdf = pdf.sort_values("url")
        buf = bytearray()
        for r in pdf.itertuples():
            body = _json.dumps(
                {"url": r.url, "title": r.title, "digest": r.digest,
                 "length": int(r.length), "n_anchors": int(r.n_anchors)},
                sort_keys=True,
            ).encode()
            buf += format_metadata_record(r.url, int(r.ts_sec), body)
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


def parse_wat(payload: bytes) -> list[dict]:
    """Walk a WAT file (shared hardened walk); metadata records yield
    their JSON envelope + WARC header timestamp."""
    import json as _json

    from .warc import _parse_iso

    out: list[dict] = []
    for headers, body in walk_warc_records(payload):
        if headers.get("warc-type") != "metadata":
            continue
        env = _json.loads(body.decode("utf-8"))
        env["ts_sec"] = _parse_iso(headers["warc-date"])
        out.append(env)
    return out


def read_wat(spark: SparkSession, path: str) -> DataFrame:
    """Ingest WAT files into the metadata relation: binaryFile scan →
    mapInPandas parse; corrupt segments yield one failure row
    (url = file path, NULL fields), never a job abort."""
    import pandas as pd

    files_df = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "*.warc.wat")
        .load(path)
    )

    def parse(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            rows = []
            for fpath, content in zip(pdf["path"], pdf["content"]):
                try:
                    for e in parse_wat(bytes(content)):
                        rows.append(dict(
                            url=e["url"],
                            warc_ts=pd.Timestamp(e["ts_sec"], unit="s",
                                                 tz="UTC"),
                            title=e["title"], digest=e["digest"],
                            length=e["length"], n_anchors=e["n_anchors"],
                            wat_file=fpath,
                        ))
                except Exception:
                    rows.append(dict(
                        url=fpath,
                        warc_ts=pd.Timestamp(0, unit="s", tz="UTC"),
                        title=None, digest=None, length=None,
                        n_anchors=None, wat_file=fpath,
                    ))
            yield pd.DataFrame(
                rows,
                columns=["url", "warc_ts", "title", "digest", "length",
                         "n_anchors", "wat_file"],
            )

    return files_df.select("path", "content").mapInPandas(
        parse, schema=WAT_META_SCHEMA
    )


def synth_wat_dir(spark: SparkSession, sf_dir: str, n_files: int = 8) -> str:
    """Idempotent fixture-WAT synthesis over the documents→pages corpus
    (content-hash-keyed; the key covers every module the bytes depend
    on: this file, the page template, and the WARC framing)."""
    from mindocr_spark.sources import content_keyed_fixture_dir
    from mindocr_spark.sources import pages as pages_mod, warc as warc_mod

    def build(out_dir: str) -> None:
        from mindocr_spark.sources.pages import pages_from_documents

        pages = pages_from_documents(spark, sf_dir).repartition(
            spark.sparkContext.defaultParallelism
        )
        write_wat_dir(pages, out_dir, n_files=n_files)

    return content_keyed_fixture_dir(
        "mindocr_wat", sf_dir,
        (__file__, pages_mod.__file__, warc_mod.__file__), build
    )

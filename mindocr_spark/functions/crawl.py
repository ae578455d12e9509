"""crawl — capture-index (CDX) generation and crawl-snapshot deltas.

The bookkeeping layer of a Common-Crawl-scale system: a sorted capture
index (the CDX file family — one row per fetched page with a SURT sort
key and a content digest) and the snapshot-to-snapshot delta that tells
a recrawl scheduler what appeared, vanished, or changed.

100 TB shape: both are pure JVM expression pipelines — the CDX build is
ZERO-shuffle (digest, length, and sort key are row-local; the global
sort is the writer's range partition), and the delta is ONE full-outer
equi-join on url with map-local digest comparison. No Python anywhere.

Reference lineage: the reference writes per-image prediction records
keyed by file name and re-aligns prediction vs ground truth by that
key (reference: tools/eval.py:33-57, mindocr/metrics/det_metrics.py:
121-139); the CDX key + the snapshot full-outer join are the crawl-
layer analog of that keyed record discipline.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from .urls import url_host


def surt_key(url_col) -> Column:
    """SURT (Sort-friendly URI Reordering Transform) key: reversed
    host labels joined by commas, ``)``, then the path — the canonical
    CDX sort key (``docs.example/a/b`` → ``example,docs)/a/b``).
    Shared-function discipline: Spark and DuckDB both reverse the
    label list and join — no engine-specific parsing."""
    url = F.col(url_col) if isinstance(url_col, str) else url_col
    host = url_host(url)
    path = F.regexp_extract(url, r"^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*(.*)$", 1)
    return F.concat(
        F.array_join(F.reverse(F.split(host, r"\.")), ","),
        F.lit(")"),
        path,
    )


def cdx_index(
    pages: DataFrame, url_col: str = "url", html_col: str = "html"
) -> DataFrame:
    """pages → capture index (urlkey, url, digest, length, mime):
    SURT sort key, md5 content digest, payload byte length, and the
    (here constant) media type. Row-local expressions only — on a
    cluster the subsequent ``sortWithinPartitions(urlkey)`` +
    range-partitioned write is what makes the index binary-searchable,
    and THAT sort is the only exchange in the job."""
    return pages.select(
        surt_key(url_col).alias("urlkey"),
        F.col(url_col).alias("url"),
        F.md5(F.col(html_col)).alias("digest"),
        F.length(F.col(html_col)).cast("bigint").alias("length"),
        F.lit("text/html").alias("mime"),
    )


def crawl_delta(
    old: DataFrame, new: DataFrame,
    url_col: str = "url", html_col: str = "html",
) -> DataFrame:
    """Snapshot delta: (url, status) with status ∈ added / removed /
    changed / same — the recrawl scheduler's input. ONE full-outer
    equi-join of the two snapshots' (url, digest) projections; digests
    are computed map-side so the join carries 32-byte digests, never
    page payloads (at 10^12 pages the payload never crosses the
    wire)."""
    o = old.select(
        F.col(url_col).alias("url"), F.md5(F.col(html_col)).alias("d_old")
    )
    n = new.select(
        F.col(url_col).alias("url"), F.md5(F.col(html_col)).alias("d_new")
    )
    j = o.join(n, "url", "full_outer")
    return j.select(
        "url",
        F.when(F.col("d_old").isNull(), F.lit("added"))
        .when(F.col("d_new").isNull(), F.lit("removed"))
        .when(F.col("d_old") == F.col("d_new"), F.lit("same"))
        .otherwise(F.lit("changed"))
        .alias("status"),
    )

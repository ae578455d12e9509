"""CDX capture index, SURT keys, and crawl-snapshot deltas — goldens
for the key transform and the four delta statuses."""

import pytest


def _pages(spark, rows):
    return spark.createDataFrame(
        [(u, bytearray(h.encode())) for u, h in rows],
        "url string, html binary",
    )


def test_surt_key_goldens(spark):
    from pyspark.sql import functions as F
    from mindocr_spark.functions.crawl import surt_key

    cases = [
        ("https://docs.example/a/b", "example,docs)/a/b"),
        ("https://news.bbc.co.uk/story/1?q=2", "uk,co,bbc,news)/story/1?q=2"),
        ("http://single/", "single)/"),
        ("https://example.com", "com,example)"),
    ]
    df = spark.createDataFrame([(u,) for u, _ in cases], "url string")
    got = [r["k"] for r in
           df.select(surt_key("url").alias("k")).collect()]
    assert got == [k for _, k in cases]


def test_cdx_digest_and_length(spark):
    import hashlib
    from mindocr_spark.functions.crawl import cdx_index

    html = "<html>héllo</html>"  # multibyte: length must be BYTES
    out = cdx_index(
        _pages(spark, [("https://a.example/x", html)])
    ).collect()[0]
    assert out["digest"] == hashlib.md5(html.encode()).hexdigest()
    assert out["length"] == len(html.encode())
    assert out["urlkey"] == "example,a)/x"
    assert out["mime"] == "text/html"


def test_crawl_delta_statuses(spark):
    from mindocr_spark.functions.crawl import crawl_delta

    old = _pages(spark, [
        ("u/same", "<p>1</p>"),
        ("u/changed", "<p>old</p>"),
        ("u/removed", "<p>2</p>"),
    ])
    new = _pages(spark, [
        ("u/same", "<p>1</p>"),
        ("u/changed", "<p>new</p>"),
        ("u/added", "<p>3</p>"),
    ])
    got = {r["url"]: r["status"]
           for r in crawl_delta(old, new).collect()}
    assert got == {
        "u/same": "same", "u/changed": "changed",
        "u/removed": "removed", "u/added": "added",
    }


def test_cdx_plan_is_scan_only(spark):
    """The CDX build must be shuffle-free: digest/length/key are
    row-local."""
    from mindocr_spark.functions.crawl import cdx_index
    from mindocr_spark.sources.pages import pages_from_documents

    df = cdx_index(pages_from_documents(spark, "/root/testdata/sf0.001"))
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan

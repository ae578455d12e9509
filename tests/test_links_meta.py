"""Anchor-text extraction, head metadata, and canonical-chain
resolution — edge-case goldens the sf-corpus oracles can't exercise:
markup-nested anchors, missing head fields, chain cycles, uncrawled
chain targets, and pointer-doubling hop accounting."""

import pytest


def _pages(spark, rows):
    return spark.createDataFrame(
        [(u, bytearray(h.encode())) for u, h in rows],
        "url string, html binary",
    )


# ----------------------------------------------------------------------
# extract_anchors
# ----------------------------------------------------------------------

def test_extract_anchors_shapes(spark):
    from mindocr_spark.functions.links import extract_anchors

    html = (
        '<a href="https://a.example/x">plain text</a>'
        '<a href="/rel">  spaced \t anchor  </a>'
        '<a href="mailto:x@y">mail</a>'          # non-web edge: dropped
        '<a href="/img"><img src="i.png"></a>'   # nested markup: not plain
        '<a href="/empty"></a>'                  # empty text: dropped
    )
    got = {
        (r["dst_url"], r["anchor"])
        for r in extract_anchors(
            _pages(spark, [("https://src.example/p", html)])
        ).collect()
    }
    assert got == {
        ("https://a.example/x", "plain text"),
        ("https://src.example/rel", "spaced anchor"),  # ws-normalized
    }


def test_anchor_profile_counts(spark):
    from mindocr_spark.functions.links import (
        anchor_text_profile,
        extract_anchors,
    )

    rows = [
        ("https://s1.example/a", '<a href="https://t.example/">docs</a>'),
        ("https://s1.example/b", '<a href="https://t.example/">docs</a>'),
        ("https://s2.example/c",
         '<a href="https://t.example/">docs</a>'
         '<a href="https://t.example/">docs</a>'),
    ]
    prof = {
        (r["dst_domain"], r["anchor"]): (r["n_links"], r["n_pages"])
        for r in anchor_text_profile(
            extract_anchors(_pages(spark, rows))
        ).collect()
    }
    # 4 links from 3 distinct source pages
    assert prof == {("t.example", "docs"): (4, 3)}


# ----------------------------------------------------------------------
# page_metadata
# ----------------------------------------------------------------------

def test_page_metadata_missing_fields(spark):
    from mindocr_spark.functions.links import page_metadata

    rows = [
        ("u1", "<html><head><title>T1</title>"
               '<meta name="description" content="D1">'
               '<link rel="canonical" href="https://c.example/x">'
               "</head><body></body></html>"),
        ("u2", "<html><head></head><body>no head fields</body></html>"),
    ]
    got = {r["url"]: r for r in page_metadata(_pages(spark, rows)).collect()}
    assert (got["u1"]["title"], got["u1"]["description"],
            got["u1"]["canonical_url"]) == (
        "T1", "D1", "https://c.example/x")
    # absent: empty strings for title/description, NULL for canonical
    assert (got["u2"]["title"], got["u2"]["description"],
            got["u2"]["canonical_url"]) == ("", "", None)


# ----------------------------------------------------------------------
# resolve_canonical_chains
# ----------------------------------------------------------------------

def _meta(spark, rows):
    return spark.createDataFrame(
        rows, "url string, canonical_url string"
    )


def test_chain_resolution_and_hops(spark):
    from mindocr_spark.functions.links import resolve_canonical_chains

    meta = _meta(spark, [
        ("a", "b"), ("b", "c"), ("c", "d"), ("d", None),  # 3-hop chain
        ("e", None),                                       # already final
    ])
    got = {r["url"]: (r["final_url"], r["n_hops"])
           for r in resolve_canonical_chains(meta, max_hops=8).collect()}
    assert got == {
        "a": ("d", 3), "b": ("d", 2), "c": ("d", 1),
        "d": ("d", 0), "e": ("e", 0),
    }


def test_chain_target_not_crawled(spark):
    from mindocr_spark.functions.links import resolve_canonical_chains

    meta = _meta(spark, [("a", "b"), ("b", "ghost")])
    got = {r["url"]: (r["final_url"], r["n_hops"])
           for r in resolve_canonical_chains(meta, max_hops=8).collect()}
    # the walk stops at the last CRAWLED resolution
    assert got["b"] == ("ghost", 1)
    assert got["a"] == ("ghost", 2)


def test_chain_cycle_terminates(spark):
    from mindocr_spark.functions.links import resolve_canonical_chains

    meta = _meta(spark, [("a", "b"), ("b", "a"), ("z", "a")])
    out = resolve_canonical_chains(meta, max_hops=8).collect()
    # no hang, every row reported once, hop counts bounded by budget
    assert sorted(r["url"] for r in out) == ["a", "b", "z"]
    assert all(r["n_hops"] <= 8 + 8 for r in out)


def test_long_chain_needs_log_rounds(spark):
    from mindocr_spark.functions.links import resolve_canonical_chains

    # chain of length 7: n0→n1→…→n7 (final). max_hops=8 → 3 rounds.
    meta = _meta(
        spark,
        [(f"n{i}", f"n{i+1}") for i in range(7)] + [("n7", None)],
    )
    got = {r["url"]: (r["final_url"], r["n_hops"])
           for r in resolve_canonical_chains(meta, max_hops=8).collect()}
    assert got["n0"] == ("n7", 7)
    assert got["n4"] == ("n7", 3)


class TestPublicationDate:
    def _run(self, spark, rows):
        from mindocr_spark.functions.links import publication_date_cols

        pages = spark.createDataFrame(rows, "url string, html string")
        return {
            r["url"]: (r["published_date"], r["date_source"])
            for r in publication_date_cols(pages).collect()
        }

    def test_trust_order_and_carriers(self, spark):
        got = self._run(spark, [
            # all three carriers present: time tag wins
            ("https://x.example/2022/01/05/a",
             '<time datetime="2023-03-09">t</time>'
             '<meta property="article:published_time" '
             'content="2024-06-01T00:00:00Z">'),
            # meta beats url path
            ("https://x.example/2022/01/05/b",
             '<meta property="article:published_time" '
             'content="2024-06-01T00:00:00Z">'),
            # url path alone
            ("https://x.example/2022/01/05/c", "<p>plain</p>"),
            # nothing
            ("https://x.example/d", "<p>plain</p>"),
        ])
        assert got["https://x.example/2022/01/05/a"] == (
            "2023-03-09", "time_tag")
        assert got["https://x.example/2022/01/05/b"] == (
            "2024-06-01", "meta_published")
        assert got["https://x.example/2022/01/05/c"] == (
            "2022-01-05", "url_path")
        assert got["https://x.example/d"] == (None, None)

    def test_malformed_dates_do_not_match(self, spark):
        got = self._run(spark, [
            ("u1", '<time datetime="last tuesday">t</time>'),
            ("https://x.example/2022/1/5/u2", "<p>short segs</p>"),
        ])
        assert got["u1"] == (None, None)
        assert got["https://x.example/2022/1/5/u2"] == (None, None)


# ----------------------------------------------------------------------
# meta_divergence
# ----------------------------------------------------------------------

def _cloak_pages(spark, rows):
    return spark.createDataFrame(
        [(d, bytearray(h.encode()), t) for d, h, t in rows],
        "doc_id long, html binary, text string",
    )


def test_meta_divergence_verdicts(spark):
    from mindocr_spark.functions.links import meta_divergence

    def page(desc):
        return ('<head><meta name="description" content="%s">'
                '</head>' % desc) if desc is not None else "<head></head>"

    rows = [
        (1, page("alpha beta"), "alpha beta gamma"),        # aligned
        (2, page("zzz yyy xxx www"), "alpha beta gamma"),   # divergent
        (3, page(None), "alpha beta"),                      # no tag
        (4, page("alpha zzz"), "alpha beta"),               # exactly half
    ]
    got = {r["doc_id"]: (r["n_desc"], r["n_overlap"], r["verdict"])
           for r in meta_divergence(_cloak_pages(spark, rows)).collect()}
    assert got[1] == (2, 2, "aligned")
    assert got[2] == (4, 0, "divergent")
    assert got[3] == (0, 0, "no_desc")
    # 2*1 < 2 is false: half-overlap counts as aligned (strict rule)
    assert got[4] == (2, 1, "aligned")


def test_meta_divergence_dedups_tokens(spark):
    from mindocr_spark.functions.links import meta_divergence

    rows = [(1,
             '<meta name="description" content="spam spam spam ham">',
             "ham words only here")]
    r = meta_divergence(_cloak_pages(spark, rows)).collect()[0]
    assert (r["n_desc"], r["n_overlap"], r["verdict"]) == (
        2, 1, "aligned")  # 2*1 < 2 false

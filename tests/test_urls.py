"""URL canonicalization / registered-domain / domain-stats goldens."""

import pytest


CASES = [
    # (url, host, registered_domain, canonical_url)
    ("https://WWW.Example.COM:443/a/b/?utm_source=x&b=2&a=1#frag",
     "example.com", "example.com", "example.com/a/b?a=1&b=2"),
    ("http://example.com/a/b?a=1&b=2",
     "example.com", "example.com", "example.com/a/b?a=1&b=2"),
    ("https://news.bbc.co.uk/story/1",
     "news.bbc.co.uk", "bbc.co.uk", "news.bbc.co.uk/story/1"),
    ("http://10.0.0.17:80/x",
     "10.0.0.17", "10.0.0.17", "10.0.0.17/x"),
    ("https://sub.deep.example.org/",
     "sub.deep.example.org", "example.org", "sub.deep.example.org"),
    ("https://single/", "single", "single", "single"),
    # non-absolute: no host, canonical = the raw string (NOT "")
    ("not-a-url", "", "", "not-a-url"),
    ("https://example.com/a/b?gclid=zzz&a=1&b=2",
     "example.com", "example.com", "example.com/a/b?a=1&b=2"),
    # all params tracking → no query part at all
    ("https://example.com/p?utm_source=a&utm_medium=b&fbclid=c",
     "example.com", "example.com", "example.com/p"),
]


@pytest.fixture(scope="module")
def url_df(spark):
    return spark.createDataFrame(
        [(i, u, "x" * (10 + i)) for i, (u, _, _, _) in enumerate(CASES)],
        "doc_id bigint, url string, text string",
    )


def test_url_cols_goldens(spark, url_df):
    from mindocr_spark.functions.urls import url_cols

    got = {r["doc_id"]: r for r in url_cols(url_df).collect()}
    for i, (u, host, dom, canon) in enumerate(CASES):
        assert got[i]["host"] == host, u
        assert got[i]["registered_domain"] == dom, u
        assert got[i]["canonical_url"] == canon, u


def test_url_dedup_flags(spark, url_df):
    from mindocr_spark.functions.urls import url_dedup_flags

    got = {r["url"]: r for r in url_dedup_flags(url_df).collect()}
    trio = [u for u, _, _, c in CASES if c == "example.com/a/b?a=1&b=2"]
    assert len(trio) == 3
    for u in trio:
        assert got[u]["url_cluster_size"] == 3
        assert got[u]["url_rep"] == min(trio)
    assert sum(got[u]["is_url_dup"] for u in trio) == 2
    assert got["not-a-url"]["url_cluster_size"] == 1  # no ""-cluster


def test_domain_stats(spark, url_df):
    from mindocr_spark.functions.urls import domain_stats

    got = {r["registered_domain"]: r
           for r in domain_stats(url_df).collect()}
    ex = got["example.com"]
    assert ex["n_pages"] == 4
    assert ex["n_canonical"] == 2       # the trio collapses to one key
    assert ex["total_chars"] == sum(
        10 + i for i, (_, _, d, _) in enumerate(CASES)
        if d == "example.com"
    )
    assert got["bbc.co.uk"]["n_pages"] == 1


def test_url_expressions_stay_codegen(spark, url_df):
    """The whole URL layer must be JVM expressions — no Python eval
    nodes of any kind in the plan."""
    from mindocr_spark.functions.urls import url_dedup_flags

    plan = spark._jvm.PythonSQLUtils.explainString(
        url_dedup_flags(url_df)._jdf.queryExecution(), "formatted"
    )
    assert "EvalPython" not in plan    # neither Batch- nor ArrowEval


def test_url_dedup_preserves_null_urls(spark):
    """A NULL url has a NULL canonical key — an inner join would drop
    the row silently. It must come back as its own singleton non-dup."""
    from mindocr_spark.functions.urls import url_dedup_flags

    df = spark.createDataFrame(
        [(1, "https://example.com/a", "t1"), (2, None, "t2"),
         (3, None, "t3")],
        "doc_id bigint, url string, text string",
    )
    out = {r["doc_id"]: r for r in url_dedup_flags(df).collect()}
    assert set(out) == {1, 2, 3}
    for i in (2, 3):
        assert out[i]["url_cluster_size"] == 1
        assert not out[i]["is_url_dup"]


class TestDomainCap:
    def test_keeps_min_urls_per_domain(self, spark):
        from mindocr_spark.functions.urls import domain_cap

        rows = [(i, f"https://farm.example.com/p/{i:04d}", "t")
                for i in range(30)]
        rows += [(100, "https://ok.example.org/a", "t"),
                 (101, "https://ok.example.org/b", "t")]
        df = spark.createDataFrame(
            rows, "doc_id bigint, url string, text string"
        )
        out = domain_cap(df, max_pages=5).collect()
        by_dom = {}
        for r in out:
            by_dom.setdefault(r["registered_domain"], []).append(r["url"])
        assert sorted(by_dom["example.com"]) == [
            f"https://farm.example.com/p/{i:04d}" for i in range(5)
        ]
        assert len(by_dom["example.org"]) == 2  # under the cap: all kept

    def test_salted_equals_single_window(self, spark):
        """The two-phase salted plan must select the exact same rows
        as the textbook single window — for every salt count."""
        from pyspark.sql import Window, functions as F
        from mindocr_spark.functions.urls import domain_cap, url_cols

        rows = [(i, f"https://d{i % 3}.example.com/x/{i * 37 % 100:02d}",
                 "t") for i in range(60)]
        df = spark.createDataFrame(
            rows, "doc_id bigint, url string, text string"
        )
        w = Window.partitionBy("registered_domain").orderBy("url")
        want = {
            (r["doc_id"], r["domain_rank"])
            for r in url_cols(df)
            .withColumn("domain_rank", F.row_number().over(w))
            .where(F.col("domain_rank") <= 4).collect()
        }
        for n_salts in (1, 2, 16):
            got = {
                (r["doc_id"], r["domain_rank"])
                for r in domain_cap(df, max_pages=4,
                                    n_salts=n_salts).collect()
            }
            assert got == want, n_salts


def test_curate_domain_cap_gate(spark):
    """max_pages_per_domain keeps only the N smallest urls of the
    shared synthetic domain while leaving smaller domains alone."""
    from mindocr_spark.corpus import generate_batch, PAGES_SCHEMA_DDL
    from mindocr_spark.curate import CurateConfig, curate

    rows = generate_batch(7, range(30))
    # plant a big shared domain: 8 distinct pages under spamfarm.example
    for i in range(8):
        rows[i] = dict(rows[i], url=f"https://spamfarm.example/p/{i}")
    pages = spark.createDataFrame(rows, PAGES_SCHEMA_DDL)
    base = dict(min_chars=50, neardup_threshold=2.0)

    uncapped = {r["url"] for r in curate(pages, CurateConfig(**base))[0]
                .collect()}
    capped = {r["url"] for r in
              curate(pages, CurateConfig(**base, max_pages_per_domain=5))[0]
              .collect()}
    assert capped <= uncapped
    doms = {}
    for u in capped:
        d = u.split("/")[2]
        doms[d] = doms.get(d, 0) + 1
    assert all(v <= 5 for v in doms.values())
    assert len(capped) < len(uncapped)  # the big synthetic domain was cut


def test_apply_blocklist_broadcast_anti_join(spark):
    """Blocklist matches at the registered domain (subdomains caught),
    and the plan broadcasts the list — no shuffle of the page side."""
    from mindocr_spark.functions.urls import apply_blocklist

    pages = spark.createDataFrame(
        [(1, "https://evil.example.net/a", "t"),
         (2, "https://www.sub.evil.example.net/b", "t"),
         (3, "https://fine.example.org/c", "t")],
        "doc_id bigint, url string, text string",
    )
    blocked = spark.createDataFrame(
        [("example.net",)], "registered_domain string"
    )
    out = apply_blocklist(pages, blocked)
    assert {r["doc_id"] for r in out.collect()} == {3}
    plan = spark._jvm.PythonSQLUtils.explainString(
        out._jdf.queryExecution(), "formatted"
    )
    assert "BroadcastHashJoin" in plan and "LeftAnti" in plan


def test_domain_cap_exempts_malformed_and_null_urls(spark):
    """Hostless and NULL urls cannot be attributed to a domain — they
    must pass through uncapped (NULL rank), never be silently dropped
    as one ''-pseudo-domain."""
    from mindocr_spark.functions.urls import domain_cap

    rows = [(i, f"relative/path/{i}", "t") for i in range(10)]
    rows += [(100 + i, None, "t") for i in range(5)]
    rows += [(200, "https://real.example.com/a", "t")]
    df = spark.createDataFrame(
        rows, "doc_id bigint, url string, text string"
    )
    out = {r["doc_id"]: r for r in domain_cap(df, max_pages=2).collect()}
    assert len(out) == 16                      # nothing vanished
    for i in list(range(10)) + [100, 101, 102, 103, 104]:
        assert out[i]["domain_rank"] is None   # exempt, not ranked
    assert out[200]["domain_rank"] == 1


def test_apply_blocklist_hostname_entry_blocks_host_not_domain(spark):
    """A hostname-level entry blocks that exact normalized host (and
    its www spelling), NOT the whole registrable domain; mixed-case
    entries are normalized rather than becoming silent no-ops."""
    from mindocr_spark.functions.urls import apply_blocklist

    pages = spark.createDataFrame(
        [(1, "https://evil.example.net/a", "t"),
         (2, "https://www.evil.example.net/b", "t"),
         (3, "https://fine.example.net/c", "t")],
        "doc_id bigint, url string, text string",
    )
    blocked = spark.createDataFrame(
        [("EVIL.example.net",)], "registered_domain string"
    )
    out = {r["doc_id"] for r in apply_blocklist(pages, blocked).collect()}
    assert out == {3}


def test_domain_cap_duplicate_urls_no_amplification(spark):
    """Rows sharing a url must never be cross-multiplied by the
    survivor join: output rows <= input rows, one rank per distinct
    url."""
    from mindocr_spark.functions.urls import domain_cap

    df = spark.createDataFrame(
        [(1, "https://a.example.com/x", "t1"),
         (2, "https://a.example.com/x", "t2"),   # duplicate url
         (3, "https://a.example.com/y", "t3")],
        "doc_id bigint, url string, text string",
    )
    out = domain_cap(df, max_pages=5).collect()
    assert len(out) == 3
    ranks = {r["url"]: r["domain_rank"] for r in out}
    assert ranks["https://a.example.com/x"] == 1
    assert ranks["https://a.example.com/y"] == 2


def test_apply_blocklist_ignores_blank_entries(spark):
    """A blank/whitespace blocklist line must not nuke every
    hostless/malformed-url page."""
    from mindocr_spark.functions.urls import apply_blocklist

    pages = spark.createDataFrame(
        [(1, "relative/path", "t"), (2, "https://ok.example.org/a", "t")],
        "doc_id bigint, url string, text string",
    )
    blocked = spark.createDataFrame(
        [("",), ("   ",)], "registered_domain string"
    )
    out = {r["doc_id"] for r in apply_blocklist(pages, blocked).collect()}
    assert out == {1, 2}


def test_url_template_stats_trap_collapse(spark):
    """A calendar trap's unbounded URL space collapses onto ONE
    template with n_urls tracking multiplicity and n_distinct_paths
    tracking the URL space; digitless paths are their own template."""
    from mindocr_spark.functions.urls import url_template_stats

    urls = [
        "https://t.example/cal/2024/1/5/event",
        "https://t.example/cal/2024/2/6/event",
        "https://t.example/cal/2023/12/31/event",
        "https://t.example/blog/7",
        "https://t.example/blog/7",          # revisit: same path twice
        "https://t.example/about/team",
    ]
    df = spark.createDataFrame([(u,) for u in urls], "url string")
    out = {r["path_template"]: r for r in url_template_stats(df).collect()}
    assert out["/cal/N/N/N/event"]["n_urls"] == 3
    assert out["/cal/N/N/N/event"]["n_distinct_paths"] == 3
    assert out["/blog/N"]["n_urls"] == 2
    assert out["/blog/N"]["n_distinct_paths"] == 1
    assert out["/about/team"]["n_urls"] == 1
    assert all(r["registered_domain"] == "t.example" for r in out.values())

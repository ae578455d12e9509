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


def test_robots_gate_semantics(spark):
    """Unit goldens for the robots.txt interpreter: longest-match with
    allow-wins ties, group attribution (foreign UA group ignored),
    empty robots = allow-all, comment/blank stripping, empty-Disallow
    idiom, crawl-delay surfacing, and no-robots-at-all = allowed."""
    from mindocr_spark.functions.crawl import robots_gate

    robots = spark.createDataFrame(
        [
            (
                "a.example",
                "# comment\n"
                "User-agent: specialbot\nDisallow: /\n"
                "\n"
                "User-agent: *\n"
                "Disallow: /private/\n"
                "Allow: /private/pub/\n"
                "Crawl-delay: 2\n",
            ),
            ("b.example", ""),  # empty body: allow everything
            ("c.example", "User-agent: *\nDisallow:\n"),  # empty value idiom
        ],
        "domain string, robots_txt string",
    )
    pages = spark.createDataFrame(
        [
            ("https://a.example/private/x.html",),
            ("https://a.example/private/pub/x.html",),
            ("https://a.example/docs/x.html",),
            ("https://b.example/anything",),
            ("https://c.example/anything",),
            ("https://norobots.example/x",),
        ],
        "url string",
    )
    got = {r["url"]: r for r in robots_gate(pages, robots).collect()}
    a_priv = got["https://a.example/private/x.html"]
    assert (a_priv["allowed"], a_priv["matched_prefix"]) == (False, "/private/")
    a_pub = got["https://a.example/private/pub/x.html"]
    assert (a_pub["allowed"], a_pub["rule_type"]) == (True, "allow")
    assert got["https://a.example/docs/x.html"]["allowed"] is True
    assert a_priv["crawl_delay"] == 2.0
    assert got["https://b.example/anything"]["allowed"] is True
    assert got["https://c.example/anything"]["allowed"] is True
    assert got["https://norobots.example/x"]["allowed"] is True
    assert got["https://norobots.example/x"]["crawl_delay"] is None


def test_robots_specific_ua_group_is_exclusive(spark):
    """RFC 9309 group selection: when a domain declares a group for
    the requesting UA, ONLY that group applies — the * group neither
    adds rules nor overrides them; domains without a specific group
    fall back to *; a declared-but-EMPTY specific group = allow-all."""
    from mindocr_spark.functions.crawl import robots_gate

    robots = spark.createDataFrame(
        [("a.example",
          "User-agent: mybot\nDisallow: /mine/\n\n"
          "User-agent: *\nDisallow: /all/\nAllow: /mine/deep/\n"),
         ("b.example", "User-agent: *\nDisallow: /all/\n"),
         ("c.example", "User-agent: mybot\n\nUser-agent: *\nDisallow: /\n")],
        "domain string, robots_txt string",
    )
    pages = spark.createDataFrame(
        [("https://a.example/mine/x",),
         ("https://a.example/mine/deep/x",),  # * Allow must NOT override
         ("https://a.example/all/x",),        # * rules don't apply to mybot
         ("https://b.example/all/x",),        # no mybot group → * applies
         ("https://c.example/anything",)],    # empty mybot group → allow-all
        "url string",
    )
    got = {r["url"]: r["allowed"]
           for r in robots_gate(pages, robots, ua="mybot").collect()}
    assert got == {
        "https://a.example/mine/x": False,
        "https://a.example/mine/deep/x": False,
        "https://a.example/all/x": True,
        "https://b.example/all/x": False,
        "https://c.example/anything": True,
    }


def test_robots_root_url_means_slash_path(spark):
    """An authority-only URL is the path '/' — a blanket Disallow: /
    must match the site root."""
    from mindocr_spark.functions.crawl import robots_gate

    robots = spark.createDataFrame(
        [("a.example", "User-agent: *\nDisallow: /\n")],
        "domain string, robots_txt string",
    )
    pages = spark.createDataFrame(
        [("https://a.example",), ("https://a.example/",)], "url string"
    )
    got = {r["url"]: (r["allowed"], r["path"])
           for r in robots_gate(pages, robots).collect()}
    assert got == {"https://a.example": (False, "/"),
                   "https://a.example/": (False, "/")}


def test_fetch_schedule_nonpositive_delay_clamps_to_default(spark):
    """'Crawl-delay: 0' in the wild must not produce Infinity capacity
    (ANSI cast abort / simultaneous fetches) — it clamps to the
    politeness default."""
    from mindocr_spark.functions.crawl import fetch_schedule

    frontier = spark.createDataFrame(
        [(f"h/u{i}", "h", 0.0) for i in range(5)],
        "url string, host string, crawl_delay double",
    )
    got = sorted(
        (r["seq"], r["fetch_at_s"], r["crawl_delay"])
        for r in fetch_schedule(frontier, round_seconds=3.0).collect()
    )
    assert got == [(1, 0.0, 1.0), (2, 1.0, 1.0), (3, 2.0, 1.0)]


def test_sitemap_parse_fields(spark):
    from mindocr_spark.functions.crawl import parse_sitemaps

    xml = (
        '<?xml version="1.0"?><urlset>'
        "<url><loc>https://a.example/p1</loc>"
        "<lastmod>2024-03-05</lastmod>"
        "<changefreq>daily</changefreq></url>"
        "<url><loc>https://a.example/p2</loc></url>"
        "</urlset>"
    )
    sm = spark.createDataFrame(
        [("a.example", xml)], "domain string, sitemap_xml string"
    )
    got = {r["loc"]: r for r in parse_sitemaps(sm).collect()}
    assert got["https://a.example/p1"]["lastmod"] == "2024-03-05"
    assert got["https://a.example/p1"]["changefreq"] == "daily"
    assert got["https://a.example/p2"]["lastmod"] is None  # optional
    assert got["https://a.example/p2"]["changefreq"] is None


def test_sitemap_coverage_statuses(spark):
    from mindocr_spark.functions.crawl import sitemap_coverage

    declared = spark.createDataFrame(
        [
            ("a.example", "u/fresh", "2024-01-01", None),
            ("a.example", "u/stale", "2024-01-09", None),
            ("a.example", "u/uncrawled", "2024-02-01", None),
        ],
        "domain string, loc string, lastmod string, changefreq string",
    )
    pages = spark.createDataFrame(
        [("u/fresh",), ("u/stale",), ("u/undeclared",)], "url string"
    )
    got = {r["url"]: r["status"]
           for r in sitemap_coverage(declared, pages,
                                     as_of="2024-01-01").collect()}
    assert got == {
        "u/fresh": "fresh", "u/stale": "stale",
        "u/uncrawled": "uncrawled", "u/undeclared": "undeclared",
    }


def test_fetch_schedule_slots_and_capacity(spark):
    """Capacity floor, slot arithmetic, and the delay default."""
    from mindocr_spark.functions.crawl import fetch_schedule

    frontier = spark.createDataFrame(
        [(f"h1/u{i}", "h1", 2.0) for i in range(5)]
        + [(f"h2/u{i}", "h2", None) for i in range(3)],
        "url string, host string, crawl_delay double",
    )
    got = fetch_schedule(frontier, round_seconds=6.0).collect()
    h1 = sorted((r["seq"], r["fetch_at_s"]) for r in got
                if r["host"] == "h1")
    assert h1 == [(1, 0.0), (2, 2.0), (3, 4.0)]  # cap = floor(6/2) = 3
    h2 = sorted((r["seq"], r["fetch_at_s"], r["crawl_delay"])
                for r in got if r["host"] == "h2")
    assert h2 == [(1, 0.0, 1.0), (2, 1.0, 1.0), (3, 2.0, 1.0)]


def test_fetch_schedule_two_phase_equals_single_window(spark):
    """The salted two-phase ranking must select exactly the
    single-window schedule, at any salt count."""
    from pyspark.sql import Window, functions as F
    from mindocr_spark.functions.crawl import fetch_schedule

    frontier = spark.createDataFrame(
        [(f"hot/u{i:03d}", "hot", 1.0) for i in range(100)]
        + [(f"cold/u{i:03d}", "cold", 5.0) for i in range(10)],
        "url string, host string, crawl_delay double",
    )
    w = Window.partitionBy("host").orderBy("url")
    ref = {
        (r["url"], r["seq"])
        for r in frontier.withColumn("seq", F.row_number().over(w))
        .where(
            F.col("seq")
            <= F.floor(60.0 / F.col("crawl_delay")).cast("int")
        )
        .collect()
    }
    for n_salts in (1, 4, 16):
        got = {
            (r["url"], r["seq"])
            for r in fetch_schedule(
                frontier, round_seconds=60.0, n_salts=n_salts
            ).collect()
        }
        assert got == ref, f"n_salts={n_salts}"


def test_revisit_policy_buckets(spark):
    """Bucket thresholds, both-snapshot-only rate basis, and the
    unknown arm (a section with no url surviving both snapshots)."""
    from pyspark.sql import functions as F
    from mindocr_spark.functions.crawl import revisit_policy

    deltas = spark.createDataFrame(
        [("hot/a", "changed"), ("hot/b", "changed"), ("hot/c", "same"),
         ("hot/d", "added"),   # discovery, not churn
         ("mid/a", "changed"), ("mid/b", "same"), ("mid/c", "same"),
         ("mid/d", "same"), ("mid/e", "same"),
         ("cold/a", "same"), ("cold/b", "same"), ("cold/c", "removed"),
         ("new/a", "added"), ("new/b", "removed")],
        "url string, status string",
    )
    key = F.split(F.col("url"), "/")[0]
    got = {r["section"]: r for r in revisit_policy(deltas, key).collect()}
    assert got["hot"]["revisit"] == "fast"
    assert got["hot"]["change_rate"] == 2 / 3
    assert got["hot"]["n_added"] == 1
    assert got["mid"]["revisit"] == "medium"
    assert got["cold"]["revisit"] == "slow"
    assert got["cold"]["change_rate"] == 0.0
    assert got["new"]["revisit"] == "unknown"
    assert got["new"]["change_rate"] is None


def test_parse_feeds_both_grammars(spark):
    from mindocr_spark.functions.crawl import parse_feeds

    rss = (
        '<?xml version="1.0"?><rss version="2.0"><channel>'
        "<item>\n  <title>Hello</title>\n"
        "  <link>https://a.example/p1.html</link>\n"
        "  <pubDate>Mon, 05 Mar 2024 06:00:00 GMT</pubDate>\n</item>"
        "<item><link>https://a.example/p2.html</link></item>"
        "</channel></rss>"
    )
    atom = (
        '<feed xmlns="http://www.w3.org/2005/Atom">'
        "<entry><title>World</title>"
        '<link href="https://b.example/q1.html"/>'
        "<updated>2024-12-31T23:59:59Z</updated></entry>"
        "</feed>"
    )
    feeds = spark.createDataFrame(
        [("a.example", rss), ("b.example", atom)],
        "domain string, feed_xml string",
    )
    rows = sorted(
        parse_feeds(feeds).collect(), key=lambda r: (r["domain"], r["link"])
    )
    # multi-line item body (the (?s) flag) parses fully
    assert rows[0]["kind"] == "rss" and rows[0]["title"] == "Hello"
    assert rows[0]["published_date"] == "2024-03-05"  # month-name map
    assert rows[0]["published"] == "Mon, 05 Mar 2024 06:00:00 GMT"
    # optional fields come back NULL, not ''
    assert rows[1]["title"] is None and rows[1]["published"] is None
    assert rows[1]["published_date"] is None
    assert rows[2]["kind"] == "atom" and rows[2]["title"] == "World"
    assert rows[2]["link"] == "https://b.example/q1.html"
    assert rows[2]["published_date"] == "2024-12-31"


def test_feed_discovery_excludes_crawled_and_broadcasts(spark):
    from mindocr_spark.functions.crawl import feed_discovery

    items = spark.createDataFrame(
        [("a.example", "rss", "t1", "https://a.example/new.html",
          "raw", "2024-01-02"),
         ("a.example", "rss", "t2", "https://a.example/old.html",
          "raw", "2024-01-03"),
         ("a.example", "rss", "t3", None, None, None)],
        "domain string, kind string, title string, link string, "
        "published string, published_date string",
    )
    pages = spark.createDataFrame(
        [("https://a.example/old.html",), ("https://a.example/other.html",)],
        "url string",
    )
    out = feed_discovery(items, pages)
    rows = out.collect()
    assert [r["link"] for r in rows] == ["https://a.example/new.html"]
    # the 10^12-page side must hit broadcast joins only
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert plan.count("BroadcastHashJoin") >= 2
    assert "SortMergeJoin" not in plan


def test_soft404_two_signal_heuristic(spark):
    from mindocr_spark.functions.crawl import soft404_flags

    long_body = "word " * 40
    df = spark.createDataFrame(
        [
            ("a", "404 Not Found", long_body),          # title alone flags
            ("b", "Fine title", "nothing here sorry"),  # thin error body
            ("c", "Fine title", "not found in archive. " + long_body),
            ("d", "Fine title", long_body),             # clean
            ("e", "Fine", long_body + " it was not found later"),
            ("f", None, None),                          # null-safe
        ],
        "url string, title string, text string",
    )
    got = {r["url"]: r for r in soft404_flags(df, min_tokens=10).collect()}
    assert got["a"]["is_soft404"] and got["a"]["title_404"]
    assert got["b"]["is_soft404"] and got["b"]["thin"]
    # long page that OPENS with error phrasing: body hit, not thin
    assert got["c"]["body_404"] and not got["c"]["is_soft404"]
    assert not got["d"]["is_soft404"]
    # phrasing beyond the first 200 chars is invisible to body_404
    assert not got["e"]["body_404"] and not got["e"]["is_soft404"]
    # all-null page: thin, but no error phrasing -> NOT a soft404
    assert got["f"]["thin"] and not got["f"]["is_soft404"]

    # scan-only plan
    plan = (
        soft404_flags(df)._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan and "BatchEvalPython" not in plan


def test_bloom_no_false_negatives_and_packing(spark):
    """Every committed url MUST test maybe_seen=true (structural — a
    Bloom has no false negatives); the packed relation never exceeds
    m_words rows and bits stay inside 32-bit words."""
    from mindocr_spark.functions.crawl import bloom_build, bloom_gate

    urls = spark.createDataFrame(
        [(f"https://s.example/{i}",) for i in range(200)] + [(None,)],
        "url string",
    )
    filt = bloom_build(urls, m_words=8).collect()
    assert len(filt) <= 8
    for r in filt:
        assert 0 <= r["word"] < 8
        assert 0 <= r["bits"] < (1 << 32)  # no sign-bit excursions
    bloom = bloom_build(urls, m_words=8)
    out = {r["url"]: r["maybe_seen"]
           for r in bloom_gate(urls.where("url is not null"),
                               bloom, m_words=8).collect()}
    assert len(out) == 200 and all(out.values())


def test_bloom_false_positives_are_possible_not_universal(spark):
    """At a sane load factor unseen keys mostly test false — but the
    filter is a Bloom, so a saturated filter says true for anything
    (the documented error direction)."""
    from mindocr_spark.functions.crawl import bloom_build, bloom_gate

    committed = spark.createDataFrame(
        [(f"https://s.example/{i}",) for i in range(50)], "url string",
    )
    fresh = spark.createDataFrame(
        [(f"https://other.example/{i}",) for i in range(50)], "url string",
    )
    # 64 words = 2048 bits, load ~0.1: fresh keys overwhelmingly miss
    roomy = bloom_build(committed, m_words=64)
    miss = bloom_gate(fresh, roomy, m_words=64)
    assert miss.where("maybe_seen").count() < 10
    # 1 word = 32 bits, 50 keys × 4 slices: saturated, everything hits
    tight = bloom_build(committed, m_words=1)
    assert bloom_gate(fresh, tight, m_words=1).where(
        "NOT maybe_seen").count() == 0


def test_bloom_gate_candidate_side_never_shuffles(spark):
    """The gate is k BROADCAST probes — the 10^12-candidate side must
    never hit a sort-merge join or an exchange of its own."""
    from mindocr_spark.functions.crawl import bloom_build, bloom_gate

    committed = spark.createDataFrame(
        [(f"https://s.example/{i}",) for i in range(100)], "url string",
    )
    out = bloom_gate(committed, bloom_build(committed))
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert plan.count("BroadcastHashJoin") == 4
    assert "SortMergeJoin" not in plan


def test_bloom_param_guards(spark):
    from mindocr_spark.functions.crawl import bloom_build

    urls = spark.createDataFrame([("u",)], "url string")
    with pytest.raises(ValueError):
        bloom_build(urls, k=5)  # md5 only has 4 independent slices
    with pytest.raises(ValueError):
        bloom_build(urls, k=0)
    with pytest.raises(ValueError):
        bloom_build(urls, m_words=0)


def test_robots_sitemaps_cross_group_and_case(spark):
    """Sitemap: is cross-group (RFC 9309 §2.3): declarations inside a
    foreign UA group still count, field name is case-insensitive,
    comments strip, duplicates (index + news) both survive — and the
    rule parser keeps IGNORING the lines."""
    from mindocr_spark.functions.crawl import parse_robots, robots_sitemaps

    robots = spark.createDataFrame(
        [("a.example",
          "Sitemap: https://a.example/s1.xml\n"
          "User-agent: otherbot\n"
          "Disallow: /\n"
          "SITEMAP: https://a.example/s2.xml  # trailing comment\n"
          "User-agent: *\n"
          "Allow: /\n"),
         ("b.example", "User-agent: *\nDisallow: /tmp/\n")],
        "domain string, robots_txt string",
    )
    got = sorted(
        (r["domain"], r["sitemap_url"])
        for r in robots_sitemaps(robots).collect()
    )
    assert got == [
        ("a.example", "https://a.example/s1.xml"),
        ("a.example", "https://a.example/s2.xml"),
    ]
    rules, _ = parse_robots(robots, ua="*")
    assert rules.where("path_prefix LIKE '%xml%'").count() == 0


class TestRobotsWildcards:
    """RFC 9309 §2.2.3 pattern edges the corpus family can't hold."""

    def _gate(self, spark, body, urls):
        from mindocr_spark.functions.crawl import robots_gate_wildcard

        pages = spark.createDataFrame([(u,) for u in urls], "url string")
        robots = spark.createDataFrame(
            [("w.example", body)], "domain string, robots_txt string"
        )
        out = robots_gate_wildcard(pages, robots, ua="*")
        return {r["url"]: r for r in out.collect()}

    def test_dollar_anchors_exact_end(self, spark):
        body = "User-agent: *\nDisallow: /p$\n"
        out = self._gate(
            spark, body,
            ["https://w.example/p", "https://w.example/pq"],
        )
        assert out["https://w.example/p"]["allowed"] is False
        assert out["https://w.example/pq"]["allowed"] is True

    def test_star_matches_empty_and_multiple(self, spark):
        body = "User-agent: *\nDisallow: /a*b*c\n"
        out = self._gate(
            spark, body,
            ["https://w.example/abc",           # both stars empty
             "https://w.example/aXXbYYc",       # both non-empty
             "https://w.example/acb"],          # order matters
        )
        assert out["https://w.example/abc"]["allowed"] is False
        assert out["https://w.example/aXXbYYc"]["allowed"] is False
        assert out["https://w.example/acb"]["allowed"] is True

    def test_metachars_in_pattern_are_literal(self, spark):
        # '.' and '+' in robots patterns are literal characters
        body = "User-agent: *\nDisallow: /a.b\nDisallow: /c+d\n"
        out = self._gate(
            spark, body,
            ["https://w.example/a.b", "https://w.example/axb",
             "https://w.example/c+d", "https://w.example/cccd"],
        )
        assert out["https://w.example/a.b"]["allowed"] is False
        assert out["https://w.example/axb"]["allowed"] is True
        assert out["https://w.example/c+d"]["allowed"] is False
        assert out["https://w.example/cccd"]["allowed"] is True

    def test_raw_length_specificity_and_tie(self, spark):
        # same raw length (6): Allow wins the tie
        body = "User-agent: *\nDisallow: /x/ab*\nAllow: /x/a*b\n"
        out = self._gate(spark, body, ["https://w.example/x/ab"])
        r = out["https://w.example/x/ab"]
        assert r["allowed"] is True
        assert r["matched_pattern"] == "/x/a*b"

    def test_no_rule_allows(self, spark):
        body = "User-agent: *\nDisallow: /zzz*\n"
        out = self._gate(spark, body, ["https://w.example/free"])
        r = out["https://w.example/free"]
        assert r["allowed"] is True and r["rule_type"] is None


class TestSitemapIndex:
    """Nesting-layer edges: missing children, empty index, dedup of
    repeated references."""

    def _run(self, spark, idx_rows, fetched_rows):
        from mindocr_spark.functions.crawl import resolve_sitemap_index

        idx = spark.createDataFrame(
            idx_rows, "domain string, sitemap_xml string")
        fetched = spark.createDataFrame(
            fetched_rows, "sitemap_url string, sitemap_xml string")
        return resolve_sitemap_index(idx, fetched).collect()

    def test_resolution_and_missing(self, spark):
        idx = [("d.example",
                "<sitemapindex>"
                "<sitemap><loc>https://d.example/a.xml</loc></sitemap>"
                "<sitemap><loc>https://d.example/b.xml</loc></sitemap>"
                "</sitemapindex>")]
        fetched = [("https://d.example/a.xml",
                    "<urlset><url><loc>https://d.example/1.html</loc>"
                    "<lastmod>2024-01-02</lastmod></url>"
                    "<url><loc>https://d.example/2.html</loc></url>"
                    "</urlset>")]
        rows = self._run(spark, idx, fetched)
        by_loc = {r["loc"]: r for r in rows}
        assert by_loc["https://d.example/1.html"]["lastmod"] == "2024-01-02"
        assert by_loc["https://d.example/2.html"]["lastmod"] is None
        missing = [r for r in rows if not r["fetched"]]
        assert len(missing) == 1
        assert missing[0]["sitemap_url"] == "https://d.example/b.xml"
        assert missing[0]["loc"] is None

    def test_empty_index_yields_nothing(self, spark):
        rows = self._run(
            spark,
            [("d.example", "<sitemapindex></sitemapindex>")],
            [("https://d.example/a.xml", "<urlset></urlset>")],
        )
        assert rows == []


class TestScd2History:
    def _run(self, spark, rows):
        import datetime as dt

        from mindocr_spark.functions.crawl import scd2_history

        base = dt.datetime(2024, 1, 1)
        data = [(u, base + dt.timedelta(days=d), dg) for (u, d, dg) in rows]
        df = spark.createDataFrame(
            data, "url string, ts timestamp_ntz, digest string"
        )
        return [r.asDict() for r in
                scd2_history(df).orderBy("url", "version_n").collect()]

    def test_noop_revisit_collapses(self, spark):
        out = self._run(spark, [("u", 0, "A"), ("u", 1, "A"),
                                ("u", 2, "B")])
        assert len(out) == 2
        v1, v2 = out
        assert (v1["digest"], v1["version_n"], v1["is_current"]) == (
            "A", 1, False)
        # v1 closes when the CONTENT changes (day 2), not at the no-op
        assert v2["valid_from_s"] - v1["valid_from_s"] == 2 * 86400
        assert v1["valid_to_s"] == v2["valid_from_s"]
        assert v2["is_current"] and v2["valid_to_s"] is None

    def test_recurring_digest_is_a_new_version(self, spark):
        out = self._run(spark, [("u", 0, "A"), ("u", 1, "B"),
                                ("u", 2, "A")])
        assert [r["digest"] for r in out] == ["A", "B", "A"]
        assert [r["version_n"] for r in out] == [1, 2, 3]
        assert [r["is_current"] for r in out] == [False, False, True]

    def test_single_capture_open_version(self, spark):
        out = self._run(spark, [("u", 0, "A")])
        assert len(out) == 1
        assert out[0]["is_current"] and out[0]["valid_to_s"] is None

    def test_same_second_ties_break_on_digest(self, spark):
        out = self._run(spark, [("u", 0, "B"), ("u", 0, "A")])
        # deterministic: A sorts first, B becomes version 2
        assert [r["digest"] for r in out] == ["A", "B"]


class TestWaterFillBudget:
    def _run(self, spark, rows, budget):
        from mindocr_spark.functions.crawl import water_fill_budget

        df = spark.createDataFrame(rows, "domain string, demand bigint")
        out = water_fill_budget(df, budget=budget).collect()
        return {r["domain"]: r for r in out}

    def test_hand_computed_water_level(self, spark):
        # demands 1,2,10,10 (total 23); budget = floor(23·1/2) = 11.
        # satisfy 1 and 2 (3 pages), split 8 across the two big ones:
        # θ = 4, remainder 0 → allocations 1,2,4,4
        rows = [("a", 1), ("b", 2), ("c", 10), ("d", 10)]
        out = self._run(spark, rows, (1, 2))
        assert out["a"]["allocation"] == 1 and out["a"]["fully_satisfied"]
        assert out["b"]["allocation"] == 2
        assert out["c"]["allocation"] == 4 and not out["c"]["fully_satisfied"]
        assert out["d"]["allocation"] == 4
        assert sum(r["allocation"] for r in out.values()) == 11

    def test_remainder_is_deterministic_and_budget_exact(self, spark):
        # demands 10,10,10; budget = floor(30·1/2) = 15 → θ = 5, rem 0?
        # use 2/3: budget 20 → θ = 6 rem 2: first two capped domains
        # (demand-then-domain order) get the extra page
        rows = [("x", 10), ("y", 10), ("z", 10)]
        out = self._run(spark, rows, (2, 3))
        assert [out[d]["allocation"] for d in ("x", "y", "z")] == [7, 7, 6]
        assert sum(r["allocation"] for r in out.values()) == 20

    def test_budget_covers_everything(self, spark):
        rows = [("a", 3), ("b", 4)]
        out = self._run(spark, rows, (1, 1))
        assert all(r["fully_satisfied"] for r in out.values())
        assert sum(r["allocation"] for r in out.values()) == 7

    def test_zero_budget(self, spark):
        rows = [("a", 3), ("b", 4)]
        out = self._run(spark, rows, (0, 1))
        assert sum(r["allocation"] for r in out.values()) == 0

    def test_guard(self, spark):
        from mindocr_spark.functions.crawl import water_fill_budget

        df = spark.createDataFrame([("a", 1)], "domain string, demand bigint")
        import pytest as _pytest
        with _pytest.raises(ValueError):
            water_fill_budget(df, budget=(1, 0))

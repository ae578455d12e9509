"""Link-graph extraction, domain stats, and PageRank — goldens + plan."""

import pytest

from pyspark.sql import functions as F


def _pages(spark, rows):
    df = spark.createDataFrame(rows, "url string, html string")
    return df.withColumn("html", F.col("html").cast("binary"))


def test_extract_links_resolution_forms(spark):
    from mindocr_spark.functions.links import extract_links

    pages = _pages(spark, [
        ("https://a.example/p/1",
         '<a href="/x">r</a><a href="https://b.example/y">a</a>'
         '<a href="rel">b</a>'),
    ])
    out = {r["href"]: r for r in extract_links(pages).collect()}
    assert out["/x"]["dst_url"] == "https://a.example/x"
    assert out["https://b.example/y"]["dst_url"] == "https://b.example/y"
    assert out["rel"]["dst_url"] == "https://a.example/rel"
    assert out["/x"]["src_domain"] == "a.example"
    assert out["https://b.example/y"]["dst_domain"] == "b.example"


def test_extract_links_no_anchor_page_contributes_nothing(spark):
    from mindocr_spark.functions.links import extract_links

    pages = _pages(spark, [("https://a.example/", "<p>no links</p>")])
    assert extract_links(pages).count() == 0


def test_domain_link_stats_golden(spark):
    from mindocr_spark.functions.links import (
        domain_link_stats, extract_links,
    )

    pages = _pages(spark, [
        ("https://a.example/1", '<a href="/s">s</a><a href="https://hub.example/z">h</a>'),
        ("https://b.example/1", '<a href="https://hub.example/z">h</a>'),
    ])
    stats = {r["dst_domain"]: r
             for r in domain_link_stats(extract_links(pages)).collect()}
    hub = stats["hub.example"]
    assert hub["n_inlinks"] == 2
    assert hub["n_src_domains"] == 2
    assert hub["n_self"] == 0 and hub["n_external"] == 2
    a = stats["a.example"]
    assert a["n_inlinks"] == 1 and a["n_self"] == 1


def test_pagerank_two_node_closed_form(spark):
    """A→B with a B self-loop: hand-derivable one-iteration ranks."""
    from mindocr_spark.functions.links import domain_pagerank

    edges = spark.createDataFrame(
        [("a.example", "b.example"), ("b.example", "b.example")],
        "src_domain string, dst_domain string",
    )
    ranks = {r["domain"]: r["rank"]
             for r in domain_pagerank(edges, iters=1, damping=0.85).collect()}
    n = 2
    base = (1.0 - 0.85) / n
    # A receives nothing; B receives all of A's mass and its own
    assert ranks["a.example"] == pytest.approx(base, rel=0)
    expected_b = base + 0.85 * ((0.5 * 1.0) + (0.5 * 1.0))
    assert ranks["b.example"] == pytest.approx(expected_b, rel=1e-15)


def test_pagerank_mass_conservation_without_dangling(spark):
    """With no dangling nodes, total rank mass stays 1 (up to fp)."""
    from mindocr_spark.functions.links import domain_pagerank

    edges = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("c", "a"), ("a", "c")],
        "src_domain string, dst_domain string",
    )
    ranks = domain_pagerank(edges, iters=3).collect()
    assert sum(r["rank"] for r in ranks) == pytest.approx(1.0, rel=1e-12)


def test_pagerank_weighted_edges_and_ordering(spark):
    """Heavier edges carry more mass: two links a→b vs one a→c."""
    from mindocr_spark.functions.links import domain_pagerank

    edges = spark.createDataFrame(
        [("a", "b"), ("a", "b"), ("a", "c"), ("b", "a"), ("c", "a")],
        "src_domain string, dst_domain string",
    )
    ranks = {r["domain"]: r["rank"]
             for r in domain_pagerank(edges, iters=2).collect()}
    assert ranks["b"] > ranks["c"]


def test_linked_corpus_family_href_inventory(spark, sf_dir):
    """Every page of the linked family carries exactly 11 anchors: 8
    chrome + mirror + archive + local ref; host ring spreads urls."""
    from mindocr_spark.functions.links import extract_links
    from mindocr_spark.sources.pages import pages_from_documents_linked

    pages = pages_from_documents_linked(spark, sf_dir).limit(50)
    per_page = (
        extract_links(pages).groupBy("src_url")
        .count().select("count").distinct().collect()
    )
    assert [r["count"] for r in per_page] == [11]


def test_extract_links_plan_stays_jvm_side(spark):
    from mindocr_spark.functions.links import extract_links

    plan = extract_links(
        _pages(spark, [("https://a.example/", '<a href="/x">x</a>')])
    )._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "PythonUDF" not in plan


def test_robots_flags_whole_token_semantics(spark):
    from mindocr_spark.functions.links import robots_flags

    pages = _pages(spark, [
        ("u1", '<head><meta name="robots" content="noindex,nofollow"></head>'),
        ("u2", '<head><meta name="robots" content="nofollow"></head>'),
        ("u3", '<head><meta name="robots" content="all"></head>'),
        ("u4", '<head><meta name="robots" content="noindexing"></head>'),
        ("u5", "<head></head>"),
        ("u6", '<head><meta name="robots" content="NOINDEX"></head>'),
        ("u7", '<head><meta name="robots" content="noodp, noindex"></head>'),
    ])
    out = {r["url"]: r for r in robots_flags(pages).collect()}
    assert out["u1"]["noindex"] and out["u1"]["nofollow"]
    assert not out["u2"]["noindex"] and out["u2"]["nofollow"]
    assert not out["u3"]["noindex"] and not out["u3"]["nofollow"]
    assert not out["u4"]["noindex"]  # whole-token: 'noindexing' ≠ 'noindex'
    assert out["u5"]["robots_content"] == "" and not out["u5"]["noindex"]
    assert out["u6"]["noindex"]      # case-insensitive
    assert out["u7"]["noindex"]      # spaced comma list
    assert len(out) == 7             # flag-style: nothing vanishes


def test_resolve_href_non_edge_and_scheme_relative_forms(spark):
    """Scheme-relative hrefs take the origin's scheme; mailto:/
    javascript:/fragment-only/query-only hrefs are NOT web edges and
    must produce no row (not a self-link to the page's own domain)."""
    from mindocr_spark.functions.links import extract_links

    pages = _pages(spark, [
        ("https://a.example/p",
         '<a href="//cdn.example/lib.js">c</a>'
         '<a href="mailto:x@y.example">m</a>'
         '<a href="javascript:void(0)">j</a>'
         '<a href="#section">f</a>'
         '<a href="?page=2">q</a>'
         '<a href="/ok">k</a>'),
    ])
    out = {r["href"]: r for r in extract_links(pages).collect()}
    # only the scheme-relative and root-relative anchors survive
    assert set(out) == {"//cdn.example/lib.js", "/ok"}
    cdn = out["//cdn.example/lib.js"]
    assert cdn["dst_url"] == "https://cdn.example/lib.js"
    assert cdn["dst_domain"] == "cdn.example"  # NOT a.example self-link


def test_link_density_golden(spark):
    from mindocr_spark.functions.links import link_density_cols

    html = ('<p>body text here</p><a href="/x">Go</a>'
            '<a href="/y">There</a>')
    df = spark.createDataFrame(
        [("u", bytearray(html.encode())), ("empty", bytearray(b""))],
        "url string, html binary",
    )
    got = {r["url"]: r for r in link_density_cols(df).collect()}
    r = got["u"]
    assert (r["n_anchors"], r["anchor_chars"]) == (2, 7)  # Go + There
    assert r["html_chars"] == len(html)
    assert r["link_char_ratio"] == 7 / len(html)
    e = got["empty"]
    assert (e["n_anchors"], e["anchor_chars"]) == (0, 0)
    assert e["link_char_ratio"] is None


def test_link_density_counts_characters_not_bytes(spark):
    """html_chars/anchor_chars are CODE-POINT counts: a multibyte page
    must not inflate them (pins the oracle's length(), not strlen())."""
    from mindocr_spark.functions.links import link_density_cols

    html = '<p>例文テキスト</p><a href="/x">行く</a>'   # 3-byte chars
    df = spark.createDataFrame(
        [("u", bytearray(html.encode("utf-8")))], "url string, html binary",
    )
    r = link_density_cols(df).collect()[0]
    assert r["html_chars"] == len(html)          # chars, ≠ byte length
    assert len(html.encode("utf-8")) > len(html)  # fixture really multibyte
    assert r["anchor_chars"] == 2                 # 行く
    assert r["link_char_ratio"] == 2 / len(html)


def test_link_density_plan_is_scan_only(spark):
    from mindocr_spark.functions.links import link_density_cols
    from mindocr_spark.sources.pages import pages_from_documents

    df = link_density_cols(
        pages_from_documents(spark, "/root/testdata/sf0.001")
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEval" not in plan


class TestDomainHits:
    def _edges(self, spark, rows):
        return spark.createDataFrame(
            rows, "src_domain string, dst_domain string"
        )

    def test_hub_and_authority_separate(self, spark):
        from mindocr_spark.functions.links import domain_hits

        # 'dir' links to both content sites (pure hub); 'a' and 'b'
        # are linked-to only (pure authorities); no reciprocal links
        edges = self._edges(spark, [
            ("dir.x", "a.x"), ("dir.x", "b.x"), ("dir.x", "a.x"),
        ])
        got = {r["domain"]: r for r in domain_hits(edges, iters=2).collect()}
        assert got["dir.x"]["hub"] == 1.0  # all hub mass
        assert got["dir.x"]["authority"] == 0.0
        assert got["a.x"]["hub"] == 0.0
        # a.x has edge weight 2 of 3 → higher authority than b.x
        assert got["a.x"]["authority"] > got["b.x"]["authority"] > 0

    def test_l1_normalized_each_side(self, spark):
        from mindocr_spark.functions.links import domain_hits

        edges = self._edges(spark, [
            ("a.x", "b.x"), ("b.x", "c.x"), ("c.x", "a.x"),
            ("a.x", "c.x"),
        ])
        rows = domain_hits(edges, iters=3).collect()
        assert abs(sum(r["hub"] for r in rows) - 1.0) < 1e-9
        assert abs(sum(r["authority"] for r in rows) - 1.0) < 1e-9

    def test_deterministic_across_partitionings(self, spark):
        from mindocr_spark.functions.links import domain_hits

        rows = [(f"s{i % 11}.x", f"d{i % 7}.x") for i in range(500)]
        e1 = self._edges(spark, rows).repartition(1)
        e32 = self._edges(spark, rows).repartition(32)
        r1 = sorted(map(tuple, domain_hits(e1, iters=3).collect()))
        r32 = sorted(map(tuple, domain_hits(e32, iters=3).collect()))
        assert r1 == r32  # bit-identical: DECIMAL sums, no fold order


def test_reciprocal_link_stats_ratio_and_self_exclusion(spark):
    """Reciprocity counts DISTINCT external pairs only: multiplicity
    never inflates it, self-edges never participate, and one-way
    links score 0."""
    from mindocr_spark.functions.links import reciprocal_link_stats

    edges = spark.createDataFrame(
        [
            # a <-> b reciprocated (b->a listed twice: multiplicity)
            ("a.com", "b.com"), ("b.com", "a.com"), ("b.com", "a.com"),
            # a -> c one-way
            ("a.com", "c.com"),
            # self edge ignored entirely
            ("c.com", "c.com"),
        ],
        "src_domain string, dst_domain string",
    )
    out = {r["domain"]: r for r in reciprocal_link_stats(edges).collect()}
    assert out["a.com"]["n_out_domains"] == 2
    assert out["a.com"]["n_reciprocal"] == 1
    assert out["a.com"]["reciprocity"] == 0.5
    assert out["b.com"]["n_out_domains"] == 1
    assert out["b.com"]["reciprocity"] == 1.0
    assert "c.com" not in out  # only a self-edge: no external out-links


def test_trustrank_seed_propagation_closed_form(spark):
    """seed→good, spam→spam self-farm: one iteration by hand. Trust
    reaches `good` only through the seed; the farm gets zero."""
    from mindocr_spark.functions.links import domain_trustrank

    edges = spark.createDataFrame(
        [("seed", "good"), ("spam1", "spam2"), ("spam2", "spam1")],
        "src_domain string, dst_domain string",
    )
    seeds = spark.createDataFrame([("seed",)], "domain string")
    t = {r["domain"]: r["trust"]
         for r in domain_trustrank(edges, seeds, iters=1).collect()}
    # t0 = 1 on seed; base = 0.15 on seed only
    assert t["seed"] == pytest.approx(0.15, rel=0)
    assert t["good"] == pytest.approx(0.85 * 1.0, rel=0)
    assert t["spam1"] == 0.0 and t["spam2"] == 0.0


def test_trustrank_unlinked_seed_keeps_teleport_mass(spark):
    """A whitelist entry absent from the crawl still holds its
    teleport share (nodes∪seeds union)."""
    from mindocr_spark.functions.links import domain_trustrank

    edges = spark.createDataFrame(
        [("a", "b")], "src_domain string, dst_domain string",
    )
    seeds = spark.createDataFrame(
        [("a",), ("offline",)], "domain string",
    )
    t = {r["domain"]: r["trust"]
         for r in domain_trustrank(edges, seeds, iters=2).collect()}
    assert t["offline"] == pytest.approx((1 - 0.85) * 0.5, rel=0)
    assert t["b"] > 0.0


def test_trustrank_empty_seeds_raise(spark):
    from mindocr_spark.functions.links import domain_trustrank

    edges = spark.createDataFrame(
        [("a", "b")], "src_domain string, dst_domain string",
    )
    seeds = spark.createDataFrame([], "domain string")
    with pytest.raises(ValueError):
        domain_trustrank(edges, seeds)


def test_spam_mass_separates_farm_from_endorsed(spark):
    """A seed-endorsed domain keeps low/negative mass; a link farm
    boosted only by its own ring shows mass near 1."""
    from mindocr_spark.functions.links import (
        domain_pagerank,
        domain_trustrank,
        spam_mass,
    )

    edges = spark.createDataFrame(
        [("seed", "good"), ("good", "seed")]
        + [(f"farm{i}", f"farm{(i + 1) % 4}") for i in range(4)]
        + [(f"farm{i}", "spamtarget") for i in range(4)],
        "src_domain string, dst_domain string",
    )
    seeds = spark.createDataFrame([("seed",)], "domain string")
    ranks = domain_pagerank(edges, iters=3)
    trust = domain_trustrank(edges, seeds, iters=3)
    m = {r["domain"]: r["spam_mass"]
         for r in spam_mass(ranks, trust).collect()}
    assert m["spamtarget"] == pytest.approx(1.0, abs=1e-9)
    assert all(m[f"farm{i}"] == pytest.approx(1.0, abs=1e-9)
               for i in range(4))
    assert m["good"] < 0.5  # endorsed: most of its rank is trusted


def test_kcore_peel_cascade(spark):
    """A triangle+tail graph at k=2: the tail node peels in round 1,
    which drops its triangle neighbor's degree — but the triangle
    itself survives (every member keeps degree 2). Peeled nodes stay
    present flag-style with NULL core_degree."""
    from mindocr_spark.functions.links import domain_kcore

    edges = spark.createDataFrame(
        # triangle a-b-c plus pendant chain c->d->e
        [("a", "b"), ("b", "c"), ("c", "a"), ("c", "d"), ("d", "e")],
        "src_domain string, dst_domain string",
    )
    out = {r["domain"]: r for r in domain_kcore(edges, k=2, rounds=3).collect()}
    assert set(out) == {"a", "b", "c", "d", "e"}  # no row vanishes
    assert all(out[n]["in_core"] for n in ("a", "b", "c"))
    assert not out["d"]["in_core"] and not out["e"]["in_core"]
    # e peels round 1 (deg 1); d's degree then drops to 1, peels round 2
    assert out["d"]["core_degree"] is None
    assert out["c"]["core_degree"] == 2  # d no longer counted


def test_kcore_multiplicity_and_direction_collapse(spark):
    """Degree is over DISTINCT undirected neighbors: a 10^6-edge farm
    between two domains is ONE pair; direction never matters."""
    from mindocr_spark.functions.links import domain_kcore

    edges = spark.createDataFrame(
        [("a", "b")] * 5 + [("b", "a")] * 5 + [("a", "a")],
        "src_domain string, dst_domain string",
    )
    out = {r["domain"]: r for r in domain_kcore(edges, k=1, rounds=2).collect()}
    assert out["a"]["core_degree"] == 1 and out["b"]["core_degree"] == 1


def test_kcore_rejects_bad_params(spark):
    from mindocr_spark.functions.links import domain_kcore

    edges = spark.createDataFrame(
        [("a", "b")], "src_domain string, dst_domain string",
    )
    with pytest.raises(ValueError):
        domain_kcore(edges, k=0)
    with pytest.raises(ValueError):
        domain_kcore(edges, k=2, rounds=0)


class TestSeedBfsDepth:
    """Crawl depth from seeds: exact levels, shortest-path rule,
    offline seeds, guards."""

    def _run(self, spark, edges, seeds, max_hops=3):
        from mindocr_spark.functions.links import seed_bfs_depth

        df = spark.createDataFrame(
            edges, "src_domain string, dst_domain string"
        )
        out = seed_bfs_depth(df, seeds, max_hops=max_hops)
        return {r["domain"]: (r["depth"], r["reachable"])
                for r in out.collect()}

    def test_chain_levels_and_horizon(self, spark):
        out = self._run(
            spark,
            [("a", "b"), ("b", "c"), ("c", "d"), ("d", "e")],
            ("a",), max_hops=3,
        )
        assert out["a"] == (0, True)
        assert out["b"] == (1, True)
        assert out["c"] == (2, True)
        assert out["d"] == (3, True)
        # beyond the hop horizon: present, NULL depth, unreachable
        assert out["e"] == (None, False)

    def test_shortest_path_wins(self, spark):
        # diamond: a->b->c and a->c; c must be depth 1, not 2
        out = self._run(
            spark, [("a", "b"), ("b", "c"), ("a", "c")], ("a",)
        )
        assert out["c"] == (1, True)

    def test_offline_seed_and_disconnected(self, spark):
        out = self._run(
            spark, [("a", "b"), ("x", "y")], ("a", "ghost.example")
        )
        assert out["ghost.example"] == (0, True)
        assert out["x"] == (None, False)
        assert out["y"] == (None, False)

    def test_self_loops_ignored_and_directedness(self, spark):
        out = self._run(
            spark, [("a", "a"), ("a", "b"), ("c", "a")], ("a",)
        )
        assert out["a"] == (0, True)
        assert out["b"] == (1, True)
        # edges are directed: c points AT the seed, is not reached
        assert out["c"] == (None, False)

    def test_guards(self, spark):
        import pytest as _pytest

        from mindocr_spark.functions.links import seed_bfs_depth

        df = spark.createDataFrame(
            [("a", "b")], "src_domain string, dst_domain string"
        )
        with _pytest.raises(ValueError):
            seed_bfs_depth(df, ())
        with _pytest.raises(ValueError):
            seed_bfs_depth(df, ("a",), max_hops=0)


class TestTriangleCounts:
    def _run(self, spark, pairs):
        from mindocr_spark.functions.links import triangle_counts

        df = spark.createDataFrame(
            pairs, "src_domain string, dst_domain string"
        )
        return {
            r["domain"]: (r["degree"], r["n_triangles"], r["clustering"])
            for r in triangle_counts(df).collect()
        }

    def test_triangle_plus_pendant(self, spark):
        out = self._run(
            spark, [("a", "b"), ("b", "c"), ("c", "a"), ("a", "d")]
        )
        assert out["a"] == (3, 1, round(2 / 6, 6))
        assert out["b"] == (2, 1, 1.0)
        assert out["c"] == (2, 1, 1.0)
        # degree-1 coefficient is undefined, not 0.0
        assert out["d"] == (1, 0, None)

    def test_multiplicity_direction_and_self_loops_collapse(self, spark):
        out = self._run(
            spark,
            [("a", "b"), ("a", "b"), ("b", "a"), ("b", "c"),
             ("c", "a"), ("a", "a")],
        )
        assert out["a"] == (2, 1, 1.0)
        assert out["b"] == (2, 1, 1.0)
        assert out["c"] == (2, 1, 1.0)

    def test_star_hub_has_zero_coefficient(self, spark):
        out = self._run(
            spark, [("hub", f"leaf{i}") for i in range(5)]
        )
        assert out["hub"] == (5, 0, 0.0)
        for i in range(5):
            assert out[f"leaf{i}"] == (1, 0, None)

    def test_k4_every_triangle_counted_exactly_once(self, spark):
        nodes = ["a", "b", "c", "d"]
        pairs = [(x, y) for x in nodes for y in nodes if x < y]
        out = self._run(spark, pairs)
        # K4 has 4 triangles; each node sits in C(3,2)=3 of them
        for n in nodes:
            assert out[n] == (3, 3, 1.0)


class TestDegreeAssortativity:
    def _run(self, spark, pairs):
        from mindocr_spark.functions.links import degree_assortativity

        df = spark.createDataFrame(
            pairs, "src_domain string, dst_domain string"
        )
        return degree_assortativity(df).collect()[0]

    def test_star_is_perfectly_disassortative(self, spark):
        r = self._run(spark, [("hub", f"leaf{i}") for i in range(3)])
        assert r["n_endpoints"] == 6  # 3 edges × both orientations
        assert r["r"] == -1.0

    def test_regular_graph_undefined(self, spark):
        # 4-cycle: every degree 2 → zero variance → NULL, not 0.0
        r = self._run(spark, [("a", "b"), ("b", "c"), ("c", "d"),
                              ("d", "a")])
        assert r["r"] is None

    def test_mixed_graph_matches_formula(self, spark):
        import math

        import pytest as _pytest

        # triangle a-b-c with pendant d on a
        pairs = [("a", "b"), ("b", "c"), ("c", "a"), ("a", "d")]
        deg = {"a": 3, "b": 2, "c": 2, "d": 1}
        xs, ys = [], []
        for u, v in pairs:
            xs += [deg[u], deg[v]]
            ys += [deg[v], deg[u]]
        n = len(xs)
        sx, sy = sum(xs), sum(ys)
        sxy = sum(x * y for x, y in zip(xs, ys))
        sxx, syy = sum(x * x for x in xs), sum(y * y for y in ys)
        exp = (n * sxy - sx * sy) / math.sqrt(
            (n * sxx - sx * sx) * (n * syy - sy * sy))
        r = self._run(spark, pairs)
        assert r["r"] == _pytest.approx(exp, abs=1e-6)

    def test_multiplicity_collapses_before_degrees(self, spark):
        r1 = self._run(spark, [("hub", "leaf0"), ("hub", "leaf0"),
                               ("leaf0", "hub"), ("hub", "leaf1"),
                               ("hub", "leaf2")])
        assert r1["n_endpoints"] == 6 and r1["r"] == -1.0


class TestLabelPropagation:
    def _run(self, spark, pairs, iters=3):
        from mindocr_spark.functions.links import label_propagation

        df = spark.createDataFrame(
            pairs, "src_domain string, dst_domain string"
        )
        rows = label_propagation(df, iters=iters).collect()
        return {r["domain"]: (r["label"], r["community_size"])
                for r in rows}

    def test_two_cliques_bridge_keeps_min_labels(self, spark):
        # two triangles joined by one bridge edge: after 3 rounds each
        # triangle converges to its own min label; the bridge endpoints
        # keep their side's label (min tie-break favors own cluster)
        pairs = [("a", "b"), ("b", "c"), ("c", "a"),
                 ("x", "y"), ("y", "z"), ("z", "x"), ("c", "x")]
        out = self._run(spark, pairs)
        assert out["a"][0] == "a" and out["b"][0] == "a"
        # every member of a community reports the same size
        from collections import Counter

        sizes = Counter(lbl for lbl, _ in out.values())
        for lbl, size in out.values():
            assert size == sizes[lbl]

    def test_star_converges_to_hub_min_label(self, spark):
        # star with hub name ordered after leaves: leaves vote for the
        # hub, the hub takes the MIN leaf label; round 2+ all agree
        out = self._run(spark, [("zhub", f"leaf{i}") for i in range(4)],
                        iters=2)
        # hub's neighbors all became leaf labels at r1 with hub's label;
        # determinism: rerun gives identical assignment
        again = self._run(spark,
                          [("zhub", f"leaf{i}") for i in range(4)],
                          iters=2)
        assert out == again

    def test_one_iteration_adopts_min_neighbor(self, spark):
        out = self._run(spark, [("b", "a"), ("b", "c")], iters=1)
        # a<->b<->c path: after 1 round b adopts min neighbor 'a',
        # a and c adopt their only neighbor 'b'
        assert out["b"][0] == "a"
        assert out["a"][0] == "b" and out["c"][0] == "b"

    def test_self_loops_and_duplicates_ignored(self, spark):
        out = self._run(
            spark,
            [("a", "a"), ("a", "b"), ("b", "a"), ("a", "b")],
            iters=2,
        )
        # collapses to single a-b edge; 2 rounds of mutual swap return
        # each vertex to its own label
        assert out["a"][0] == "a" and out["b"][0] == "b"

    def test_iters_validation(self, spark):
        import pytest as _pytest

        from mindocr_spark.functions.links import label_propagation

        df = spark.createDataFrame(
            [("a", "b")], "src_domain string, dst_domain string"
        )
        with _pytest.raises(ValueError):
            label_propagation(df, iters=0)


class TestStripHubs:
    def _edges(self, spark, pairs):
        return spark.createDataFrame(
            pairs, "src_domain string, dst_domain string"
        )

    def test_hub_and_its_edges_removed(self, spark):
        from mindocr_spark.functions.links import strip_hubs

        # hub of degree 4 glued to a triangle
        pairs = [("hub", f"n{i}") for i in range(4)] + [
            ("n0", "n1"), ("n1", "n2"), ("n2", "n0")]
        out = strip_hubs(self._edges(spark, pairs), max_degree=3)
        got = {(r["src_domain"], r["dst_domain"]) for r in out.collect()}
        assert got == {("n0", "n1"), ("n1", "n2"), ("n0", "n2")}

    def test_threshold_is_inclusive(self, spark):
        from mindocr_spark.functions.links import strip_hubs

        pairs = [("a", "b"), ("b", "c")]  # b has degree exactly 2
        out = strip_hubs(self._edges(spark, pairs), max_degree=2)
        assert out.count() == 2

    def test_guard(self, spark):
        import pytest as _pytest

        from mindocr_spark.functions.links import strip_hubs

        with _pytest.raises(ValueError):
            strip_hubs(self._edges(spark, [("a", "b")]), max_degree=0)


class TestCommunityModularity:
    def _run(self, spark, pairs, iters=3):
        from mindocr_spark.functions.links import community_modularity

        df = spark.createDataFrame(
            pairs, "src_domain string, dst_domain string"
        )
        return {r["label"]: r for r in
                community_modularity(df, iters=iters).collect()}

    def test_two_triangles_hand_computed(self, spark):
        # two disjoint triangles: LPA gives 2 communities of 3;
        # m=6, each L_c=3, D_c=6 → Q_c = 3/6 - (6/12)^2 = 0.25
        pairs = [("a", "b"), ("b", "c"), ("c", "a"),
                 ("x", "y"), ("y", "z"), ("z", "x")]
        out = self._run(spark, pairs)
        assert set(out) == {"a", "x"}
        for lbl in ("a", "x"):
            r = out[lbl]
            assert (r["size"], r["degree_sum"], r["intra_edges"]) == (3, 6, 3)
            assert r["q_contrib"] == 0.25

    def test_single_community_scores_zero(self, spark):
        # one triangle, one community: Q = 3/3 - 1^2 = 0
        out = self._run(spark, [("a", "b"), ("b", "c"), ("c", "a")])
        (r,) = out.values()
        assert r["q_contrib"] == 0.0 and r["intra_edges"] == 3

    def test_cross_edges_count_in_degree_not_intra(self, spark):
        # two triangles + 1 bridge: m=7; communities keep 3 intra each;
        # bridge endpoints gain degree but no intra edge
        pairs = [("a", "b"), ("b", "c"), ("c", "a"),
                 ("x", "y"), ("y", "z"), ("z", "x"), ("c", "x")]
        out = self._run(spark, pairs)
        assert sum(r["intra_edges"] for r in out.values()) == 6
        assert sum(r["degree_sum"] for r in out.values()) == 14


class TestCocitationCoupling:
    def _edges(self, spark, rows):
        return spark.createDataFrame(
            rows, "src_domain string, dst_domain string"
        )

    def test_cocitation_hand_computed(self, spark):
        # s1,s2 both cite a and b; s3 cites a only
        rows = [("s1", "a"), ("s1", "b"), ("s2", "a"), ("s2", "b"),
                ("s3", "a")]
        from mindocr_spark.functions.links import cocitation_pairs

        out = cocitation_pairs(
            self._edges(spark, rows), min_common=2
        ).collect()
        (r,) = out
        assert (r["a"], r["b"]) == ("a", "b")
        assert (r["n_common"], r["n_a"], r["n_b"]) == (2, 3, 2)
        assert r["jaccard"] == round(2 / 3, 6)

    def test_min_common_gate(self, spark):
        rows = [("s1", "a"), ("s1", "b")]
        from mindocr_spark.functions.links import cocitation_pairs

        assert cocitation_pairs(
            self._edges(spark, rows), min_common=2
        ).count() == 0
        assert cocitation_pairs(
            self._edges(spark, rows), min_common=1
        ).count() == 1

    def test_hub_source_excluded_everywhere(self, spark):
        # s_hub cites 5 domains (over cap 4): contributes no pairs
        # AND is excluded from the set sizes
        rows = [("hub", d) for d in "abcde"]
        rows += [("s1", "a"), ("s1", "b"), ("s2", "a"), ("s2", "b")]
        from mindocr_spark.functions.links import cocitation_pairs

        out = cocitation_pairs(
            self._edges(spark, rows), min_common=2, max_out_degree=4
        ).collect()
        (r,) = out
        assert (r["a"], r["b"], r["n_common"]) == ("a", "b", 2)
        assert (r["n_a"], r["n_b"]) == (2, 2)  # hub not counted
        assert r["jaccard"] == 1.0

    def test_multi_edges_collapse(self, spark):
        # duplicate (src, dst) edges count once
        rows = [("s1", "a")] * 3 + [("s1", "b"), ("s2", "a"),
                ("s2", "b")]
        from mindocr_spark.functions.links import cocitation_pairs

        (r,) = cocitation_pairs(
            self._edges(spark, rows), min_common=2
        ).collect()
        assert r["n_common"] == 2 and r["n_a"] == 2

    def test_coupling_is_the_dual(self, spark):
        rows = [("x", "d1"), ("x", "d2"), ("y", "d1"), ("y", "d2"),
                ("z", "d1")]
        from mindocr_spark.functions.links import coupling_pairs

        (r,) = coupling_pairs(
            self._edges(spark, rows), min_common=2
        ).collect()
        assert (r["a"], r["b"], r["n_common"]) == ("x", "y", 2)

    def test_guards(self, spark):
        import pytest as _pt

        from mindocr_spark.functions.links import cocitation_pairs

        df = self._edges(spark, [])
        with _pt.raises(ValueError):
            cocitation_pairs(df, min_common=0)
        with _pt.raises(ValueError):
            cocitation_pairs(df, max_out_degree=1)


def _edges(spark, pairs):
    return spark.createDataFrame(
        [(s, d) for s, d in pairs],
        "src_domain string, dst_domain string",
    )


def test_bowtie_classes_hand_graph(spark):
    """Hand-built Broder bow-tie: 2-node core cycle (with a chord pair
    to win the pivot rule), one IN, one OUT, a tendril off IN, a
    tendril feeding OUT, the IN→OUT tube, and a disconnected pair."""
    from mindocr_spark.functions.links import bowtie_classes

    pairs = [
        ("ca", "cb"), ("cb", "ca"),            # core 2-cycle
        ("ca", "cb"),                          # dup edge (collapses)
        ("in1", "ca"),                         # IN
        ("cb", "out1"),                        # OUT
        ("in1", "t1"),                         # tendril off IN
        ("u1", "out1"),                        # tendril feeding OUT
        ("in1", "tube1"), ("tube1", "out1"),   # the tube
        ("d1", "d2"), ("d2", "d1"),            # disconnected 2-cycle
    ]
    got = {r["domain"]: r["cls"]
           for r in bowtie_classes(_edges(spark, pairs)).collect()}
    assert got == {
        "ca": "core", "cb": "core",
        "in1": "in", "out1": "out",
        "t1": "tendril", "u1": "tendril", "tube1": "tube",
        "d1": "disconnected", "d2": "disconnected",
    }


def test_bowtie_classes_empty_and_selfloop(spark):
    from mindocr_spark.functions.links import bowtie_classes

    empty = _edges(spark, [])
    assert bowtie_classes(empty).count() == 0
    only_self = _edges(spark, [("a.example", "a.example")])
    assert bowtie_classes(only_self).count() == 0


def test_bowtie_pivot_rule_prefers_max_min_degree(spark):
    """The disconnected 2-cycle must NOT capture the pivot when a
    denser SCC exists: core nodes have min-degree 2, the stray cycle
    min-degree 1 — and on ties the lexicographically smallest name
    wins (deterministic across engines)."""
    from mindocr_spark.functions.links import bowtie_classes

    pairs = [
        # dense 3-cycle + reverse chords -> min degree 2
        ("ka", "kb"), ("kb", "kc"), ("kc", "ka"),
        ("kb", "ka"), ("kc", "kb"), ("ka", "kc"),
        # stray 2-cycle, lexicographically EARLIER names
        ("aa", "ab"), ("ab", "aa"),
    ]
    got = {r["domain"]: r["cls"]
           for r in bowtie_classes(_edges(spark, pairs)).collect()}
    assert got["ka"] == got["kb"] == got["kc"] == "core"
    assert got["aa"] == got["ab"] == "disconnected"

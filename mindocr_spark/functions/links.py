"""links — hyperlink-graph extraction and per-domain link analytics.

The web-graph side of a crawl pipeline: pull every ``<a href>`` out of
the raw HTML, resolve it against the page URL, and aggregate in-link
statistics per registered domain — the inputs to crawl frontier
prioritization and domain-authority ranking (the harmonic-centrality /
PageRank preprocessing step of a Common-Crawl-scale system).

100 TB shape: href extraction is ONE codegen ``regexp_extract_all``
over the scanned html bytes (no Python, no shuffle), the explode is
narrow, and the only shuffle is the per-domain aggregation — whose key
is heavy-tailed (popular domains receive most in-links), which is
exactly the map-side-combine case: every count here is a partial
aggregate, so a 10^9-in-link domain arrives at its reducer as one row
per upstream task, never as 10^9 rows. The distinct-source-domain
count rewrites to a two-level aggregate on (dst, src) first — same
property.

Reference lineage: the det stage extracts sub-regions from the raw
payload and hands them to downstream scoring
(reference: mindocr/postprocess/det_db_postprocess.py:43-73); href
extraction is the link-layer analog of region detection — find every
anchored sub-span, normalize its geometry (here: resolve the URL),
then aggregate.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F

from .urls import registered_domain, url_host

#: The anchor-tag pattern — double-quoted href attribute immediately
#: after ``<a``. Shared constant: Java regex and RE2 (DuckDB) read this
#: identical byte string, and the test corpus writes exactly this
#: shape. (A full attribute-order-insensitive parser lives in
#: extract_core; link *graph* extraction wants the cheap scan-side
#: form.)
HREF_RE = r'<a href="([^"]*)"'

#: Absolute hierarchical URL (any scheme followed by ://).
_ABS_RE = r"^[A-Za-z][A-Za-z0-9+.-]*://"
#: Any scheme-prefixed href (mailto:, javascript:, tel:, data:, …) —
#: non-hierarchical forms are NOT web edges.
_SCHEME_RE = r"^[A-Za-z][A-Za-z0-9+.-]*:"


def resolve_href(href: Column, origin: Column) -> Column:
    """RFC-3986-lite resolution against ``origin``
    (``scheme://host``): absolute hierarchical hrefs pass through,
    scheme-relative ``//host/…`` take the origin's scheme,
    root-relative ``/…`` and bare relative paths join the origin.
    NULL (→ no edge) for the forms that are not document-to-document
    web edges: other-scheme hrefs (mailto:/javascript:/tel:/data:),
    fragment-only ``#…``, and query-only ``?…`` — attributing those
    to the page's own domain would inflate self-link counts on real
    crawl HTML (this module's production shape)."""
    scheme = F.regexp_extract(origin, r"^([A-Za-z][A-Za-z0-9+.-]*:)", 1)
    return (
        F.when(href.rlike(_ABS_RE), href)
        .when(href.startswith("//"), F.concat(scheme, href))
        .when(
            href.rlike(_SCHEME_RE)
            | href.startswith("#")
            | href.startswith("?"),
            F.lit(None).cast("string"),
        )
        .when(href.startswith("/"), F.concat(origin, href))
        .otherwise(F.concat(origin, F.lit("/"), href))
    )


def extract_links(
    pages: DataFrame, url_col: str = "url", html_col: str = "html"
) -> DataFrame:
    """pages → edge relation (src_url, href, dst_url, src_domain,
    dst_domain). Pages with no anchors contribute no edges (explode,
    not explode_outer — an edge relation has no use for NULL rows);
    per-page counts belong to the page-side aggregation."""
    html_s = F.col(html_col).cast("string")
    origin = F.regexp_extract(
        F.col(url_col), r"^([A-Za-z][A-Za-z0-9+.-]*://[^/?#]*)", 1
    )
    e = pages.select(
        F.col(url_col).alias("src_url"),
        origin.alias("__origin"),
        F.explode(F.regexp_extract_all(html_s, F.lit(HREF_RE), F.lit(1)))
        .alias("href"),
    )
    dst = resolve_href(F.col("href"), F.col("__origin"))
    return e.select(
        "src_url",
        "href",
        dst.alias("dst_url"),
        registered_domain(url_host("src_url")).alias("src_domain"),
        registered_domain(url_host(dst)).alias("dst_domain"),
    ).where(F.col("dst_url").isNotNull())  # non-edge hrefs (mailto:, #…)


#: Simple-anchor pattern: href attribute plus the visible anchor text,
#: for anchors whose content is plain text (no nested markup). The
#: anchor-TEXT corpus (inbound link descriptions per target — the
#: classic web-search / web-corpus signal) only needs this shape; a
#: page's markup-nested anchors still contribute to the EDGE relation
#: via :func:`extract_links`, which matches the href alone.
ANCHOR_RE = r'<a href="([^"]*)">([^<]*)</a>'


def extract_anchors(
    pages: DataFrame, url_col: str = "url", html_col: str = "html"
) -> DataFrame:
    """pages → anchor relation (src_url, src_domain, dst_url,
    dst_domain, anchor): every plain-text ``<a href>…</a>`` with its
    visible text, href resolved against the page URL, non-web-edge
    hrefs (mailto:, #…) dropped — the raw material of an anchor-text
    corpus (inbound descriptions are a target page's strongest
    independent relevance signal).

    100 TB shape: identical to :func:`extract_links` — one codegen
    ``regexp_extract_all`` over the scanned html (group 0 keeps the
    full tag so href and text come out of ONE scan pass), a narrow
    explode, two per-row ``regexp_extract``s, zero shuffles. Anchor
    text is whitespace-normalized (the only transform a downstream
    aggregation key needs).

    Reference lineage: det→rec hand-off — detect the anchored region,
    then *recognize* its text payload
    (reference: tools/infer/text/predict_system.py:72-90); here both
    steps are one regex family over the same scan."""
    html_s = F.col(html_col).cast("string")
    origin = F.regexp_extract(
        F.col(url_col), r"^([A-Za-z][A-Za-z0-9+.-]*://[^/?#]*)", 1
    )
    e = pages.select(
        F.col(url_col).alias("src_url"),
        origin.alias("__origin"),
        F.explode(
            F.regexp_extract_all(html_s, F.lit(ANCHOR_RE), F.lit(0))
        ).alias("tag"),
    )
    href = F.regexp_extract(F.col("tag"), ANCHOR_RE, 1)
    text = F.regexp_extract(F.col("tag"), ANCHOR_RE, 2)
    dst = resolve_href(href, F.col("__origin"))
    return e.select(
        "src_url",
        registered_domain(url_host("src_url")).alias("src_domain"),
        dst.alias("dst_url"),
        registered_domain(url_host(dst)).alias("dst_domain"),
        F.trim(F.regexp_replace(text, r"\s+", " ")).alias("anchor"),
    ).where(F.col("dst_url").isNotNull() & (F.length("anchor") > 0))


def anchor_text_profile(anchors: DataFrame) -> DataFrame:
    """Per-(destination domain, anchor text) inbound profile:
    (dst_domain, anchor, n_links, n_pages) — the aggregation that
    turns the anchor relation into a target-side description corpus
    (what the web *calls* each domain).

    One shuffle on (dst_domain, anchor); both aggregates are map-side
    combinable (count_distinct(src_url) rewrites to a two-level
    partial over (dst, anchor, src)), so a viral anchor phrase
    pointing at a hot domain collapses to one row per upstream task
    before the exchange — the same heavy-tail discipline as
    :func:`domain_link_stats`."""
    return anchors.groupBy("dst_domain", "anchor").agg(
        F.count("*").alias("n_links"),
        F.count_distinct("src_url").alias("n_pages"),
    )


#: meta-robots extraction pattern (the corpus writes the canonical
#: double-quoted order; a production crawler also checks the
#: X-Robots-Tag HTTP header — that seam lives in sources/warc.py's
#: header parse).
ROBOTS_META_RE = r'<meta name="robots" content="([^"]*)"'

#: whole-token match inside a comma-separated directive list.
_DIRECTIVE_RE = r"(^|,)[ \t]*{tok}[ \t]*(,|$)"


def robots_flags(
    pages: DataFrame, url_col: str = "url", html_col: str = "html"
) -> DataFrame:
    """Politeness gate: extract the ``<meta name="robots">`` directive
    and flag noindex/nofollow pages — flag-style (a pipeline must be
    able to COUNT excluded pages for its metrics; dropping is the
    caller's one-line filter). Directives are matched as whole tokens
    in the comma-list, so ``content="all"`` or a hypothetical
    ``noindexing`` never trips the gate. One codegen regex pass, zero
    shuffles; pages without the meta report empty content and false
    flags."""
    html_s = F.col(html_col).cast("string")
    content = F.lower(
        F.regexp_extract(html_s, ROBOTS_META_RE, 1)
    )

    def has(tok: str):
        return content.rlike(_DIRECTIVE_RE.format(tok=tok))

    return pages.select(
        F.col(url_col).alias("url"),
        content.alias("robots_content"),
        has("noindex").alias("noindex"),
        has("nofollow").alias("nofollow"),
    )


#: head-metadata patterns (the corpus writes the canonical
#: double-quoted attribute order, like ROBOTS_META_RE).
TITLE_RE = r"<title>([^<]*)</title>"
DESC_META_RE = r'<meta name="description" content="([^"]*)"'
CANONICAL_RE = r'<link rel="canonical" href="([^"]*)"'


def page_metadata(
    pages: DataFrame, url_col: str = "url", html_col: str = "html"
) -> DataFrame:
    """Head-metadata extraction: (url, title, description,
    canonical_url) from raw HTML — the per-page record an index /
    dedup layer keys on (rel=canonical is the crawl-side duplicate
    signal; title/description feed snippet and quality features).
    Absent fields come back as empty string (title/description — a
    COUNTable miss) or NULL (canonical_url — "this page IS
    canonical", the join-friendly encoding). Three codegen regex
    passes over one scan, zero shuffles, no Python."""
    html_s = F.col(html_col).cast("string")
    canon = F.regexp_extract(html_s, CANONICAL_RE, 1)
    return pages.select(
        F.col(url_col).alias("url"),
        F.regexp_extract(html_s, TITLE_RE, 1).alias("title"),
        F.regexp_extract(html_s, DESC_META_RE, 1).alias("description"),
        F.when(canon != "", canon).alias("canonical_url"),
    )


def resolve_canonical_chains(
    meta: DataFrame, max_hops: int = 8
) -> DataFrame:
    """Resolve rel=canonical POINTER CHAINS to their final target:
    (url, final_url, n_hops). A page with no canonical link (or whose
    target was not crawled) is its own final target at 0 hops; a chain
    a→b→c ends at the first page that declares no canonical.

    100 TB shape: POINTER DOUBLING, not step-at-a-time chasing — each
    round joins the partial resolution onto itself, so chains up to
    2^k hops resolve in k self-joins (`max_hops=8` → 3 shuffle
    rounds), where the naive walk would pay one corpus-sized shuffle
    per hop. Cycles (a→b→a — real crawls have them) cannot loop: after
    k rounds a cycle member has walked 2^k hops and stops when the
    round budget ends, still-open rows are reported resolved-so-far
    with ``n_hops`` exposing the truncation.

    Reference lineage: iterative refinement with a fixed round budget —
    the PSE progressive-expansion discipline
    (reference: mindocr/postprocess/det_pse_postprocess.py:53-78)."""
    cur = meta.select(
        "url",
        F.coalesce("canonical_url", "url").alias("final_url"),
        F.when(F.col("canonical_url").isNull(), F.lit(0))
        .otherwise(F.lit(1))
        .cast("bigint")
        .alias("n_hops"),
        F.col("canonical_url").isNotNull().alias("open"),
    )
    rounds = max(1, (max_hops - 1).bit_length())
    for _ in range(rounds):
        nxt = cur.select(
            F.col("url").alias("t_url"),
            F.col("final_url").alias("t_final"),
            F.col("n_hops").alias("t_hops"),
            F.col("open").alias("t_open"),
        )
        j = cur.join(nxt, cur["final_url"] == nxt["t_url"], "left")
        hit = F.col("open") & F.col("t_url").isNotNull()
        cur = j.select(
            "url",
            F.when(hit, F.col("t_final"))
            .otherwise(F.col("final_url"))
            .alias("final_url"),
            F.when(hit, F.col("n_hops") + F.col("t_hops"))
            .otherwise(F.col("n_hops"))
            .alias("n_hops"),
            # a miss means the target was never crawled: the chain is
            # as resolved as it can get — close it
            F.when(hit, F.col("t_open")).otherwise(F.lit(False)).alias("open"),
        )
    return cur.drop("open")


def domain_pagerank(
    edges: DataFrame, iters: int = 3, damping: float = 0.85
) -> DataFrame:
    """Power-iteration PageRank over the DOMAIN graph (the
    Common-Crawl domain-ranking step): collapse page edges to weighted
    domain edges, then run `iters` fixed iterations of
    ``r' = (1−d)/N + d·Σ_in r·w/out``. Dangling domains (no outlinks)
    simply leak their mass — the standard "remove dangling" variant;
    fixed iteration count, no convergence test (deterministic plans
    beat adaptive stopping in a batch pipeline).

    100 TB shape: the page→domain collapse is the only corpus-sized
    shuffle; after it the graph is domain-cardinality (millions, not
    trillions). Each iteration is one equi-join + one groupBy on the
    domain key, both map-side combinable in the collapse.

    Determinism discipline: ranks stay DOUBLE, but every arithmetic
    step is a correctly-rounded IEEE op in PINNED association order,
    and the per-node incoming sum folds over the src-domain-sorted
    contribution list (F.aggregate is a left fold; the SQL oracle's
    list_reduce folds the same list in the same order) — so the two
    engines produce bit-identical ranks with no rounding anywhere."""
    from mindocr_spark.cache import tracked_persist

    # the page→domain collapse is the one corpus-sized subtree; every
    # iteration joins against it, so persist it once (tracked: an
    # ambient persist_scope releases it — the connected_components
    # discipline) instead of re-deriving the edge extraction per pass
    g = tracked_persist(
        edges.groupBy("src_domain", "dst_domain").agg(
            F.count("*").alias("w")
        )
    )
    nodes = tracked_persist(
        edges.select(F.col("src_domain").alias("domain"))
        .union(edges.select(F.col("dst_domain").alias("domain")))
        .distinct()
    )
    out_w = g.groupBy("src_domain").agg(F.sum("w").alias("out_w"))
    gw = g.join(out_w, "src_domain")
    # the tuning-pass action (domain count — bookkeeping-sized)
    n = nodes.count()
    if n == 0:
        raise ValueError(
            "domain_pagerank: empty edge relation (no domains to rank)"
        )
    r0 = 1.0 / n
    base = (1.0 - damping) / n
    ranks = nodes.withColumn("rank", F.lit(r0))
    for _ in range(iters):
        contrib = gw.join(
            ranks, gw["src_domain"] == ranks["domain"]
        ).select(
            "dst_domain",
            "src_domain",
            (
                F.col("rank")
                * (F.col("w").cast("double") / F.col("out_w").cast("double"))
            ).alias("c"),
        )
        sums = contrib.groupBy("dst_domain").agg(
            F.aggregate(
                F.array_sort(
                    F.collect_list(
                        F.struct(
                            F.col("src_domain").alias("s"),
                            F.col("c").alias("c"),
                        )
                    )
                ),
                F.lit(0.0),
                lambda acc, x: acc + x["c"],
            ).alias("s")
        )
        ranks = nodes.join(
            sums, nodes["domain"] == sums["dst_domain"], "left"
        ).select(
            "domain",
            (
                F.lit(base)
                + F.lit(damping) * F.coalesce(F.col("s"), F.lit(0.0))
            ).alias("rank"),
        )
    return ranks


def domain_trustrank(
    edges: DataFrame,
    seeds: DataFrame,
    iters: int = 3,
    damping: float = 0.85,
) -> DataFrame:
    """Seeded (personalized) PageRank over the domain graph — the
    TrustRank spam-mass signal (Gyöngyi et al., VLDB'04): teleport
    lands ONLY on a curated whitelist of seed domains, so trust flows
    outward along real links and link-farm neighborhoods that no seed
    endorses starve to zero. A corpus pipeline gates on low
    trust × high pagerank (the "spam mass" quotient); here we emit
    the raw per-domain trust.

    ``r0 = t``, ``r' = (1−d)·t + d·Σ_in r·w/out`` where the teleport
    vector ``t`` is 1/|seeds| on seed domains and 0 elsewhere.
    Dangling domains leak their mass, exactly like
    :func:`domain_pagerank`.

    `seeds` is a one-column (`domain`) relation; seed domains missing
    from the graph still receive teleport mass (they are real
    whitelist entries — their outlinks may appear in a later crawl),
    via the nodes∪seeds union below.

    100 TB shape: identical to PageRank — the page→domain collapse is
    the only corpus-sized shuffle; iterations run at domain
    cardinality; the seed relation is tiny (a human-curated list) and
    broadcast into the teleport join. Determinism: the same
    sorted-fold discipline as PageRank (F.aggregate left fold over the
    src-sorted contribution list ↔ the oracle's list_reduce), teleport
    terms are single exact divisions — bit-identical cross-engine.
    Reference lineage: broadcast dictionary keyed lookup
    (reference: mindocr/utils/dict_utils.py) + the PageRank iterate."""
    from mindocr_spark.cache import tracked_persist

    g = tracked_persist(
        edges.groupBy("src_domain", "dst_domain").agg(
            F.count("*").alias("w")
        )
    )
    nodes = tracked_persist(
        edges.select(F.col("src_domain").alias("domain"))
        .union(edges.select(F.col("dst_domain").alias("domain")))
        .union(seeds.select(F.col("domain")))
        .distinct()
    )
    out_w = g.groupBy("src_domain").agg(F.sum("w").alias("out_w"))
    gw = g.join(out_w, "src_domain")
    # bookkeeping-sized action (seed count — a curated whitelist)
    n_seed = seeds.select("domain").distinct().count()
    if n_seed == 0:
        raise ValueError("domain_trustrank: empty seed relation")
    t0 = 1.0 / n_seed
    base = (1.0 - damping) * t0
    seed_flag = F.broadcast(
        seeds.select("domain").distinct().withColumn("__seed", F.lit(True))
    )
    teleported = nodes.join(seed_flag, "domain", "left")
    ranks = teleported.select(
        "domain",
        F.when(F.col("__seed"), F.lit(t0)).otherwise(F.lit(0.0))
        .alias("rank"),
    )
    for _ in range(iters):
        contrib = gw.join(
            ranks, gw["src_domain"] == ranks["domain"]
        ).select(
            "dst_domain",
            "src_domain",
            (
                F.col("rank")
                * (F.col("w").cast("double") / F.col("out_w").cast("double"))
            ).alias("c"),
        )
        sums = contrib.groupBy("dst_domain").agg(
            F.aggregate(
                F.array_sort(
                    F.collect_list(
                        F.struct(
                            F.col("src_domain").alias("s"),
                            F.col("c").alias("c"),
                        )
                    )
                ),
                F.lit(0.0),
                lambda acc, x: acc + x["c"],
            ).alias("s")
        )
        ranks = teleported.join(
            sums, teleported["domain"] == sums["dst_domain"], "left"
        ).select(
            "domain",
            (
                F.when(F.col("__seed"), F.lit(base)).otherwise(F.lit(0.0))
                + F.lit(damping) * F.coalesce(F.col("s"), F.lit(0.0))
            ).alias("trust"),
        ).withColumnRenamed("trust", "rank")
    return ranks.select("domain", F.col("rank").alias("trust"))


def spam_mass(ranks: DataFrame, trust: DataFrame) -> DataFrame:
    """RELATIVE SPAM MASS (Gyöngyi et al.): the fraction of a domain's
    PageRank that arrives WITHOUT trusted endorsement —
    ``(p̂ − t̂) / p̂`` over the L1-normalized rank and trust vectors.
    High pagerank + low trust ⇒ mass → 1 (link-farm signature);
    seed-adjacent domains can go negative (more trust than raw rank).
    This is the gate a corpus pipeline thresholds to drop
    spam-boosted domains while keeping genuinely popular ones.

    Inner join on domain: both vectors come from the same extracted
    graph (trustrank's extra offline-seed rows carry no pagerank and
    are whitelist bookkeeping, not corpus domains).

    Determinism: each vector is already bit-exact cross-engine; the
    normalizers quantize at 9 dp and sum as DECIMAL(38,9) — exact and
    order-independent (the hits_scores discipline). Each quantized
    vector is tracked_persist-ed and its total is a broadcast one-row
    aggregate — the rank chain executes ONCE into the persisted
    domain-grain frame, and no unpartitioned window ever moves the
    domain relation to a single task. The final mass is round(·, 9)
    with signed zero normalized."""
    from mindocr_spark.cache import tracked_persist

    p9 = F.round(F.col("rank"), 9).cast("decimal(38,9)")
    t9 = F.round(F.col("trust"), 9).cast("decimal(38,9)")
    pq = tracked_persist(ranks.select("domain", p9.alias("p9")))
    tq = tracked_persist(trust.select("domain", t9.alias("t9")))
    p = pq.crossJoin(
        F.broadcast(pq.agg(F.sum("p9").alias("_tp")))
    ).select(
        "domain",
        (F.col("p9").cast("double") / F.col("_tp").cast("double"))
        .alias("p_hat"),
    )
    t = tq.crossJoin(
        F.broadcast(tq.agg(F.sum("t9").alias("_tt")))
    ).select(
        "domain",
        (F.col("t9").cast("double") / F.col("_tt").cast("double"))
        .alias("t_hat"),
    )
    return p.join(t, "domain").select(
        "domain",
        (
            F.when(
                F.col("p_hat") > 0,
                F.round(
                    (F.col("p_hat") - F.col("t_hat")) / F.col("p_hat"), 9
                ) + F.lit(0.0),
            )
        ).alias("spam_mass"),
    )


def _hits_half(
    g: DataFrame, nodes: DataFrame, ranks: DataFrame,
    group_key: str, rank_key: str,
) -> DataFrame:
    """One HITS half-step: fold the opposite side's scores through the
    weighted edges onto `group_key`, then normalize to MEAN 1. Each
    contribution is round(w·val, 9) summed as DECIMAL(38,9) — exact
    and order-independent (no sorted-fold needed, unlike PageRank's
    unquantized path) — and the normalizer is the exact DECIMAL total
    of those sums, so both the per-node and global reductions are
    independent of partitioning and evaluation order.

    Mean-1 (not L1) internal normalization is the SCALE-FREE choice:
    iterate values stay O(1) at ANY domain cardinality, so the 9-dp
    quantization always carries ~9 significant digits. L1-normalized
    internals average 1/N — at web-scale N the quantization truncates
    them, and pushing the scale up (15 dp was tried) exceeds double
    precision and breaks cross-engine rounding in the last ulp. The
    consumer divides by N once at output for the L1 contract.

    Plan discipline: the folded per-dom sums are localCheckpoint-ed
    each half-step — lineage truncates to a LogicalRDD, so (a) the
    normalizer can be a plain aggregate + broadcast cross join (the
    checkpointed frame is referenced twice at zero recompute), and
    (b) plan analysis stays CONSTANT per step instead of doubling
    (2^(2·iters) blowup, measured 33.9 s vs 2.6 s at sf0.1, when a
    second branch referenced the live plan; an unpartitioned window
    avoided that but moved the whole domain relation to ONE task per
    step — the single-partition scale-killer). Cost: the iteration is
    EAGER (one small job per half-step, the neardup_transitive
    precedent); total executed work is unchanged."""
    c = g.join(ranks, g[rank_key] == ranks["domain"]).select(
        F.col(group_key).alias("dom"),
        F.round(F.col("w").cast("double") * F.col("val"), 9)
        .cast("decimal(38,9)").alias("c"),
    )
    un = c.groupBy("dom").agg(F.sum("c").alias("u")).localCheckpoint()
    tot = un.agg(
        F.sum("u").alias("_s"),
    )
    n_row = nodes.agg(F.count(F.lit(1)).alias("_n"))
    return (
        nodes.join(un, nodes["domain"] == un["dom"], "left")
        .crossJoin(F.broadcast(tot))
        .crossJoin(F.broadcast(n_row))
        .select(
            "domain",
            (
                (
                    F.coalesce(F.col("u"), F.lit(0).cast("decimal(38,9)"))
                    .cast("double")
                    / F.col("_s").cast("double")
                )
                * F.col("_n").cast("double")
            ).alias("val"),
        )
    )


def domain_hits(edges: DataFrame, iters: int = 3) -> DataFrame:
    """HITS hubs-and-authorities over the DOMAIN graph (Kleinberg's
    complement to PageRank: an *authority* is linked by good hubs, a
    *hub* links to good authorities — the pair separates link-farm
    hubs from genuinely cited sources, which a single PageRank scalar
    conflates; corpus curation uses the authority side as a trust
    prior and the hub side as a directory/aggregator signal).

    `iters` fixed alternating half-steps (h ← A·a, then a ← Aᵀ·h),
    L1-normalized each half-step. L1 (not the textbook L2) keeps the
    fixed-point semantics while making every reduction an exact
    DECIMAL sum of 9-dp-quantized terms — order-independent, hence
    bit-identical across engines and partitionings with no sorted-fold
    machinery. Dangling sides score 0 (no outlinks → no hub mass).

    100 TB shape: identical to :func:`domain_pagerank` — the page→
    domain collapse is the only corpus-sized shuffle; each half-step
    is one equi-join + one map-side-combinable groupBy at domain
    cardinality, and the normalizer is a broadcast 1-row cross join
    (never a collect).

    Reference lineage: the det→rec mutual-refinement loop (detection
    quality gates recognition input and vice versa,
    reference: tools/infer/text/predict_system.py:49-74) — the same
    two-role alternating refinement, here over the link graph."""
    from mindocr_spark.cache import tracked_persist

    g = tracked_persist(
        edges.groupBy("src_domain", "dst_domain").agg(
            F.count("*").alias("w")
        )
    )
    nodes = tracked_persist(
        edges.select(F.col("src_domain").alias("domain"))
        .union(edges.select(F.col("dst_domain").alias("domain")))
        .distinct()
    )
    from pyspark.sql import Window

    auth = nodes.withColumn("val", F.lit(1.0))
    hub = nodes.withColumn("val", F.lit(1.0))
    for _ in range(iters):
        hub = _hits_half(g, nodes, auth, "src_domain", "dst_domain")
        auth = _hits_half(g, nodes, hub, "dst_domain", "src_domain")
    # internals iterate at mean 1 (scale-free — see _hits_half); one
    # division by N at output restores the L1 contract (sums to 1).
    # N is a broadcast one-row aggregate over the persisted node set —
    # never an unpartitioned window over the domain relation.
    n_row = nodes.agg(F.count(F.lit(1)).alias("_n"))
    return (
        hub.select(F.col("domain"), F.col("val").alias("hub"))
        .join(
            auth.select(F.col("domain"), F.col("val").alias("authority")),
            "domain",
        )
        .crossJoin(F.broadcast(n_row))
        .select(
            "domain",
            (F.col("hub") / F.col("_n").cast("double")).alias("hub"),
            (F.col("authority") / F.col("_n").cast("double"))
            .alias("authority"),
        )
    )


def domain_link_stats(edges: DataFrame) -> DataFrame:
    """Per-destination-domain in-link statistics:
    (dst_domain, n_inlinks, n_src_domains, n_self, n_external).

    One shuffle on the domain key; every aggregate is map-side
    combinable (count_distinct rewrites to a (dst, src) partial
    aggregate), so the hot-domain tail — docs.example at 10^12 pages —
    collapses before it ever crosses the wire."""
    self_edge = (F.col("src_domain") == F.col("dst_domain")).cast("bigint")
    return edges.groupBy("dst_domain").agg(
        F.count("*").alias("n_inlinks"),
        F.count_distinct("src_domain").alias("n_src_domains"),
        F.sum(self_edge).alias("n_self"),
        F.sum(F.lit(1) - self_edge).alias("n_external"),
    )


def reciprocal_link_stats(edges: DataFrame) -> DataFrame:
    """Per-source-domain link-exchange signal: of a domain's DISTINCT
    external out-neighbor domains, how many link back (reciprocated
    pairs — the nepotistic-linking signature naive PageRank rewards
    instead of flags; SEO link rings show reciprocity → 1, organic
    citation graphs sit near 0). Returns (domain, n_out_domains,
    n_reciprocal, reciprocity); self-edges never participate.

    100 TB plan: edges collapse to DISTINCT external domain PAIRS
    first (one map-side-combinable aggregate on the pair key — a
    10^9-edge spam ring collapses to its few pairs before anything
    else), the persisted pair relation joins its own reversal on both
    keys (uniform pair key), then one bounded per-domain count. Never
    touches edge multiplicity; no all-pairs anywhere."""
    from mindocr_spark.cache import tracked_persist

    pairs = tracked_persist(
        edges.where(F.col("src_domain") != F.col("dst_domain"))
        .select("src_domain", "dst_domain")
        .distinct()
    )
    rev = pairs.select(
        F.col("dst_domain").alias("src_domain"),
        F.col("src_domain").alias("dst_domain"),
        F.lit(1).alias("_r"),
    )
    j = pairs.join(rev, ["src_domain", "dst_domain"], "left")
    n_out = F.count(F.lit(1))
    n_rec = F.count("_r")
    return j.groupBy(F.col("src_domain").alias("domain")).agg(
        n_out.cast("bigint").alias("n_out_domains"),
        n_rec.cast("bigint").alias("n_reciprocal"),
        F.round(
            F.try_divide(n_rec.cast("double"), n_out.cast("double")), 6
        ).alias("reciprocity"),
    )


def domain_kcore(
    edges: DataFrame, k: int = 3, rounds: int = 4
) -> DataFrame:
    """Iterated k-peel over the UNDIRECTED simple domain graph — the
    k-core family signal (Kumar et al. dense-subgraph spam detection;
    link farms live in unusually deep cores, organic long-tail domains
    peel out immediately). Each round removes every domain whose
    degree over the SURVIVING graph is < `k`; peeling cascades
    (removing a hub drops its neighbors' degrees).

    `rounds` is FIXED, not run-to-fixpoint: a fixed unrolled pass
    count is the contract an exact cross-engine oracle can state (the
    dedup max_iter lesson), and after enough rounds the result IS the
    k-core — callers wanting the fixpoint raise `rounds` (peel depth
    is bounded by graph diameter in practice). Returns one row per
    graph node, flag-style (no row vanishes): (domain, in_core,
    core_degree) where core_degree is the degree over the final
    surviving node set (NULL for peeled domains — the failure-flow
    NULL discipline).

    100 TB shape: the edge multiset collapses ONCE to distinct
    undirected neighbor pairs (map-side combinable on the pair key —
    a 10^9-edge farm collapses to its few pairs first); each round is
    one alive-semijoin + one degree groupBy at domain cardinality;
    per-round lineage is truncated (localCheckpoint) so the plan stays
    constant-size — the connected_components discipline.

    Reference analog: iterative candidate pruning in PSE's progressive
    expansion (keep a region only while its support stays above the
    threshold, reference: mindocr/postprocess/det_pse_postprocess.py),
    lifted to graph degree."""
    from mindocr_spark.cache import (
        release_local_checkpoint,
        tracked_persist,
    )

    if k < 1 or rounds < 1:
        raise ValueError(f"need k ≥ 1 and rounds ≥ 1, got {k}/{rounds}")
    raw = edges.where(
        F.col("src_domain") != F.col("dst_domain")
    ).select("src_domain", "dst_domain")
    # bare localCheckpoint (NOT scope-tracked): sym is referenced by
    # the RETURNED lazy plan, and released checkpoint blocks cannot
    # recompute — lifetime is the ContextCleaner's (blocks are
    # domain-pair-cardinality, tiny next to the corpus)
    sym = (
        raw.select(F.col("src_domain").alias("a"),
                   F.col("dst_domain").alias("b"))
        .union(raw.select(F.col("dst_domain").alias("a"),
                          F.col("src_domain").alias("b")))
        .distinct()
        .localCheckpoint()
    )
    nodes = tracked_persist(sym.select(F.col("a").alias("domain")).distinct())
    alive = nodes
    for _ in range(rounds):
        deg = (
            sym.join(alive.select(F.col("domain").alias("a")), "a")
            .join(alive.select(F.col("domain").alias("b")), "b")
            .groupBy("a")
            .agg(F.count(F.lit(1)).alias("_deg"))
        )
        nxt = deg.where(F.col("_deg") >= k).select(
            F.col("a").alias("domain")
        ).localCheckpoint()
        if alive is not nodes:
            release_local_checkpoint(alive)
        alive = nxt
    core_deg = (
        sym.join(alive.select(F.col("domain").alias("a")), "a")
        .join(alive.select(F.col("domain").alias("b")), "b")
        .groupBy("a")
        .agg(F.count(F.lit(1)).cast("bigint").alias("core_degree"))
    )
    return (
        nodes.join(alive.select("domain", F.lit(True).alias("in_core")),
                   "domain", "left")
        .join(core_deg.select(F.col("a").alias("domain"), "core_degree"),
              "domain", "left")
        .select(
            "domain",
            F.coalesce("in_core", F.lit(False)).alias("in_core"),
            "core_degree",
        )
    )


def triangle_counts(edges: DataFrame) -> DataFrame:
    """Exact per-domain triangle counts + local clustering coefficient
    over the UNDIRECTED simple domain graph — the triad-density spam
    signal k-core's degree test can't see: a link farm whose members
    cross-link saturates in triangles (coefficient → 1) while an
    organic hub of the same degree shows almost none (its neighbors
    don't know each other). Returns one row per graph node:
    (domain, degree, n_triangles, clustering) where clustering =
    2T / (d·(d−1)), NULL for degree-<2 nodes (the failure-flow NULL
    discipline — an undefined coefficient is not 0.0).

    100 TB shape (degree orientation, Chiba–Nishizeki / Cohen's
    MapReduce form): the edge multiset collapses ONCE to distinct
    canonical pairs (map-side combinable), then every edge is oriented
    from its lower-(degree, name) endpoint to the higher — so a
    10^9-in-link hub (docs.example at corpus scale) has ZERO out-edges
    and the wedge self-join never fans out on a hub key; per-node
    out-degree is bounded by O(√m) on any graph (arboricity bound),
    which bounds wedge count at Σ outdeg² instead of Σ deg². Each
    triangle is generated exactly once (at its orientation-minimum
    vertex) and closed by one equi-join back to the oriented edge set.
    The pair relation is persisted — it feeds the degree count, both
    wedge sides, and the closing join.

    Reference analog: the box-adjacency triad test inside lanms-style
    polygon merge (reference: mindocr/postprocess/east_postprocess.py
    merges mutually-overlapping proposal pairs; the graph form lifts
    "mutual overlap" to "mutual linking")."""
    from mindocr_spark.cache import tracked_persist

    raw = edges.where(F.col("src_domain") != F.col("dst_domain"))
    pairs = tracked_persist(
        raw.select(
            F.least("src_domain", "dst_domain").alias("a"),
            F.greatest("src_domain", "dst_domain").alias("b"),
        ).distinct()
    )
    deg = tracked_persist(
        pairs.select(F.col("a").alias("domain"))
        .unionAll(pairs.select(F.col("b").alias("domain")))
        .groupBy("domain")
        .agg(F.count(F.lit(1)).cast("bigint").alias("degree"))
    )
    keyed = pairs.join(
        deg.select(F.col("domain").alias("a"), F.col("degree").alias("da")),
        "a",
    ).join(
        deg.select(F.col("domain").alias("b"), F.col("degree").alias("db")),
        "b",
    )
    # orient low-(degree, name) → high; ties impossible beyond the name
    # (names are distinct), so the order is total and each triangle has
    # exactly one minimum vertex
    a_first = F.struct(F.col("da"), F.col("a")) < F.struct(
        F.col("db"), F.col("b")
    )
    oriented = tracked_persist(
        keyed.select(
            F.when(a_first, F.col("a")).otherwise(F.col("b")).alias("u"),
            F.when(a_first, F.col("b")).otherwise(F.col("a")).alias("v"),
            F.when(a_first, F.col("db")).otherwise(F.col("da")).alias("dv"),
        )
    )
    w1 = oriented.select(
        "u", F.col("v").alias("x"), F.col("dv").alias("dx")
    )
    w2 = oriented.select(
        "u", F.col("v").alias("y"), F.col("dv").alias("dy")
    )
    wedges = w1.join(w2, "u").where(
        F.struct(F.col("dx"), F.col("x")) < F.struct(F.col("dy"), F.col("y"))
    )
    closing = oriented.select(
        F.col("u").alias("x"), F.col("v").alias("y")
    )
    tri = wedges.join(closing, ["x", "y"])
    per_node = (
        tri.select(F.explode(F.array("u", "x", "y")).alias("domain"))
        .groupBy("domain")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_triangles"))
    )
    nt = F.coalesce(F.col("n_triangles"), F.lit(0)).cast("bigint")
    d = F.col("degree").cast("double")
    return deg.join(per_node, "domain", "left").select(
        "domain",
        "degree",
        nt.alias("n_triangles"),
        F.when(
            F.col("degree") >= 2,
            F.round(
                F.lit(2.0) * nt.cast("double") / (d * (d - F.lit(1.0))), 6
            ),
        ).alias("clustering"),
    )


def link_density_cols(
    pages: DataFrame, url_col: str = "url", html_col: str = "html"
) -> DataFrame:
    """Page-level link-density features — the Boilerpipe-family spam /
    navigation-page signal at PAGE grain (the extraction core already
    scores link density per BLOCK; link farms and nav hubs are
    cheapest to drop before the parse): ``n_anchors``, ``anchor_chars``
    (visible anchor-text length), ``html_chars``, and
    ``link_char_ratio`` = anchor_chars / html_chars. Exact-int counts
    (one codegen ``regexp_extract_all`` + an aggregate fold) and one
    IEEE division — zero shuffles, zero Python, NULL ratio for empty
    payloads."""
    html_s = F.col(html_col).cast("string")
    texts = F.regexp_extract_all(html_s, F.lit(ANCHOR_RE), F.lit(2))
    anchor_chars = F.aggregate(
        texts, F.lit(0), lambda acc, t: acc + F.length(t)
    )
    n_html = F.length(html_s)
    return pages.select(
        F.col(url_col).alias("url"),
        F.size(texts).alias("n_anchors"),
        anchor_chars.alias("anchor_chars"),
        n_html.alias("html_chars"),
        F.try_divide(
            anchor_chars.cast("double"), n_html.cast("double")
        ).alias("link_char_ratio"),
    )


# ---------------------------------------------------------------------------
# Publication-date extraction (the trafilatura date heuristic)
# ---------------------------------------------------------------------------

#: The three date carriers, in trust order; shared with the SQL oracle.
TIME_TAG_RE = r'<time[^>]*\sdatetime="([0-9]{4}-[0-9]{2}-[0-9]{2})'
META_PUBLISHED_RE = (
    r'<meta property="article:published_time"'
    r' content="([0-9]{4}-[0-9]{2}-[0-9]{2})'
)
URL_DATE_RE = r"/([0-9]{4})/([0-9]{2})/([0-9]{2})/"


def publication_date_cols(
    pages: DataFrame, url_col: str = "url", html_col: str = "html"
) -> DataFrame:
    """Publication-date guess per page — the trafilatura/newspaper
    heuristic every freshness-aware corpus needs (recency mixing,
    dedup keep-newest, temporal splits): coalesce, in trust order,

    1. ``<time datetime="...">`` (the in-content marker),
    2. ``<meta property="article:published_time">`` (OpenGraph),
    3. a ``/yyyy/mm/dd/`` segment in the URL path (the blog convention),

    each as an ISO ``yyyy-mm-dd`` string (lexicographically ordered,
    tz-free — the sitemap-coverage discipline), plus ``date_source``
    naming which carrier won (NULL/NULL when none). Three codegen
    regex taps over one scan — zero shuffles, zero Python.
    """
    html_s = F.col(html_col).cast("string")
    t1 = F.nullif(F.regexp_extract(html_s, TIME_TAG_RE, 1), F.lit(""))
    t2 = F.nullif(
        F.regexp_extract(html_s, META_PUBLISHED_RE, 1), F.lit("")
    )
    u = F.col(url_col)
    t3 = F.when(
        u.rlike(URL_DATE_RE),
        F.concat_ws(
            "-",
            F.regexp_extract(u, URL_DATE_RE, 1),
            F.regexp_extract(u, URL_DATE_RE, 2),
            F.regexp_extract(u, URL_DATE_RE, 3),
        ),
    )
    return pages.select(
        F.col(url_col).alias("url"),
        F.coalesce(t1, t2, t3).alias("published_date"),
        F.when(t1.isNotNull(), F.lit("time_tag"))
        .when(t2.isNotNull(), F.lit("meta_published"))
        .when(t3.isNotNull(), F.lit("url_path"))
        .alias("date_source"),
    )


def seed_bfs_depth(
    edges: DataFrame,
    seeds: tuple[str, ...] | list[str],
    max_hops: int = 4,
) -> DataFrame:
    """Crawl depth from a seed whitelist: directed BFS over the simple
    domain graph — hop distance, the frontier-scheduling / crawl-
    budget signal (how many politeness rounds separate a domain from
    the seed list; FineWeb-style URL-depth gating lifted to the graph).
    Complements `domain_trustrank` (mass propagation): distance, not
    endorsement.

    `max_hops` is FIXED, not run-to-fixpoint (the `domain_kcore`
    contract — an exact cross-engine oracle states unrolled rounds).
    Returns one row per node of nodes ∪ seeds, flag-style: (domain,
    depth, reachable) with depth NULL beyond `max_hops` or for
    disconnected domains — the failure-flow NULL discipline. Offline
    seeds (absent from the graph) still report depth 0: the crawler
    fetches seeds unconditionally, mirroring trustrank's nodes∪seeds.

    100 TB shape: the edge multiset collapses ONCE to distinct
    directed pairs (map-side combinable); each hop is one
    frontier-semijoin on the uniform src key + one distinct + one
    anti-join against the assigned set, all at domain cardinality;
    every level is localCheckpoint-ed so the logical plan stays
    constant-size per hop (the connected_components plan-growth
    discipline) and the final plan is a flat union of bounded levels.

    Reference analog: staged det→rec fan-out where each stage's
    frontier is the previous stage's output
    (reference: deploy/py_infer/src/parallel/module/common/
    collect_node.py:72-99 — completeness bookkeeping over a staged
    walk), lifted to graph hops."""
    from functools import reduce

    from mindocr_spark.cache import tracked_persist

    seeds = tuple(dict.fromkeys(seeds))
    if not seeds:
        raise ValueError("empty seed list")
    if max_hops < 1:
        raise ValueError(f"need max_hops ≥ 1, got {max_hops}")
    spark = edges.sparkSession
    g = (
        edges.where(F.col("src_domain") != F.col("dst_domain"))
        .select("src_domain", "dst_domain")
        .distinct()
        .localCheckpoint()
    )
    seed_df = spark.createDataFrame([(s,) for s in seeds],
                                    "domain string")
    nodes = tracked_persist(
        g.select(F.col("src_domain").alias("domain"))
        .union(g.select(F.col("dst_domain").alias("domain")))
        .union(seed_df)
        .distinct()
    )
    levels = [
        seed_df.select("domain", F.lit(0).alias("depth"))
        .localCheckpoint()
    ]
    for h in range(1, max_hops + 1):
        seen = reduce(DataFrame.union,
                      [l.select("domain") for l in levels])
        frontier = levels[-1].select(
            F.col("domain").alias("src_domain")
        )
        nxt = (
            g.join(frontier, "src_domain")
            .select(F.col("dst_domain").alias("domain"))
            .distinct()
            .join(seen, "domain", "left_anti")
            .select("domain", F.lit(h).alias("depth"))
            .localCheckpoint()
        )
        levels.append(nxt)
    depths = reduce(DataFrame.union, levels)
    return nodes.join(depths, "domain", "left").select(
        "domain",
        F.col("depth").cast("bigint").alias("depth"),
        F.col("depth").isNotNull().alias("reachable"),
    )


def _reach_closure(
    g: DataFrame,
    seeds: DataFrame,
    src: str,
    dst: str,
    max_iters: int = 40,
) -> DataFrame:
    """Forward-reachable closure of ``seeds`` over the simple edge
    relation ``g`` (seeds included), run to fixpoint: each round is one
    frontier-semijoin on the src key + distinct + anti-join against the
    reached set, every level localCheckpoint-ed so the plan stays
    constant-size per round (the `seed_bfs_depth` discipline). The
    round count is bounded by the graph diameter — ~20 on the real web
    (Broder et al. 2000) — with `max_iters` as the runaway backstop."""
    reached = seeds.select("domain").distinct().localCheckpoint()
    frontier = reached
    for _ in range(max_iters):
        nxt = (
            g.join(frontier.select(F.col("domain").alias(src)), src)
            .select(F.col(dst).alias("domain"))
            .distinct()
            .join(reached, "domain", "left_anti")
            .localCheckpoint()
        )
        if nxt.isEmpty():
            break
        # nxt is anti-joined against reached and internally distinct —
        # plain union stays exact with O(frontier), not O(reached),
        # work per round (a .distinct() here would re-shuffle the whole
        # accumulated set every round for a no-op)
        reached = reached.union(nxt).localCheckpoint()
        frontier = nxt
    return reached


def bowtie_classes(edges: DataFrame, max_iters: int = 40) -> DataFrame:
    """Broder bow-tie decomposition of the directed domain graph — the
    canonical macro-structure analysis of a web crawl (Broder et al.,
    "Graph structure in the web", WWW 2000): every domain lands in one
    of six classes relative to the giant strongly-connected core:

    - ``core``  — the giant SCC;
    - ``in``    — reaches the core, unreachable from it;
    - ``out``   — reachable from the core, cannot return;
    - ``tube``  — on an IN→OUT path that bypasses the core;
    - ``tendril`` — hangs off IN or feeds OUT, touching neither core
      nor the other side;
    - ``disconnected`` — none of the above.

    The core is located by a deterministic pivot rule instead of
    Broder's random-sample pivots (which need many trials to be
    confident): the node maximizing min(in-degree, out-degree), ties
    broken by smallest name, is taken as the core representative — on
    web-shaped graphs the max-min-degree node is inside the giant SCC.
    Then SCC = forward(pivot) ∩ backward(pivot), IN = backward \\ SCC,
    OUT = forward \\ SCC, and the tendril/tube split comes from two
    more closures: reachable-from-IN and can-reach-OUT.

    100 TB shape: the page-level edge multiset collapses ONCE to
    distinct domain pairs (map-side combinable); degrees are two
    groupBys at domain cardinality; each of the four closures is a
    diameter-bounded loop of frontier-semijoins with constant-size
    checkpointed plans. The one driver-side datum is the single pivot
    row. At true web scale you would confirm the pivot with 2-3
    alternates (re-run forward/backward from the runner-up and check
    the SCC agrees) — the closure machinery is unchanged.

    Reference analog: staged fan-out where each stage's frontier is the
    previous stage's output (reference: deploy/py_infer/src/parallel/
    module/common/collect_node.py:72-99), lifted to graph closures."""
    from mindocr_spark.cache import tracked_persist

    g = (
        edges.where(F.col("src_domain") != F.col("dst_domain"))
        .select("src_domain", "dst_domain")
        .distinct()
        .localCheckpoint()
    )
    spark = edges.sparkSession
    nodes = tracked_persist(
        g.select(F.col("src_domain").alias("domain"))
        .union(g.select(F.col("dst_domain").alias("domain")))
        .distinct()
    )
    outd = g.groupBy(F.col("src_domain").alias("domain")).agg(
        F.count("*").alias("outd"))
    ind = g.groupBy(F.col("dst_domain").alias("domain")).agg(
        F.count("*").alias("ind"))
    deg = (
        nodes.join(outd, "domain", "left")
        .join(ind, "domain", "left")
        .select(
            "domain",
            F.least(
                F.coalesce("ind", F.lit(0)),
                F.coalesce("outd", F.lit(0)),
            ).alias("min_deg"),
        )
    )
    top = deg.orderBy(F.desc("min_deg"), F.asc("domain")).limit(1).collect()
    if not top:  # empty graph
        return spark.createDataFrame([], "domain string, cls string")
    pivot = spark.createDataFrame([(top[0]["domain"],)], "domain string")

    fwd = _reach_closure(g, pivot, "src_domain", "dst_domain", max_iters)
    bwd = _reach_closure(g, pivot, "dst_domain", "src_domain", max_iters)
    scc = fwd.join(bwd, "domain", "left_semi").localCheckpoint()
    inn = bwd.join(scc, "domain", "left_anti").localCheckpoint()
    outt = fwd.join(scc, "domain", "left_anti").localCheckpoint()
    rin = _reach_closure(g, inn, "src_domain", "dst_domain", max_iters)
    rout = _reach_closure(g, outt, "dst_domain", "src_domain", max_iters)

    def flag(df: DataFrame, name: str) -> DataFrame:
        return df.select("domain", F.lit(True).alias(name))

    res = (
        nodes.join(flag(scc, "f_core"), "domain", "left")
        .join(flag(inn, "f_in"), "domain", "left")
        .join(flag(outt, "f_out"), "domain", "left")
        .join(flag(rin, "f_rin"), "domain", "left")
        .join(flag(rout, "f_rout"), "domain", "left")
    )
    t = F.coalesce
    return res.select(
        "domain",
        F.when(t(F.col("f_core"), F.lit(False)), "core")
        .when(t(F.col("f_in"), F.lit(False)), "in")
        .when(t(F.col("f_out"), F.lit(False)), "out")
        .when(
            t(F.col("f_rin"), F.lit(False))
            & t(F.col("f_rout"), F.lit(False)),
            "tube",
        )
        .when(
            t(F.col("f_rin"), F.lit(False))
            | t(F.col("f_rout"), F.lit(False)),
            "tendril",
        )
        .otherwise("disconnected")
        .alias("cls"),
    )


#: hreflang alternate-link pattern (double-quoted canonical attribute
#: order, as the corpus writes it). Shared constant: the full tag is
#: extracted in ONE regexp_extract_all pass (group 0) and the two
#: attributes re-read per exploded row, the extract_anchors idiom.
HREFLANG_RE = (
    r'<link rel="alternate" hreflang="([^"]*)" href="([^"]*)">'
)


def hreflang_clusters(pages: DataFrame) -> DataFrame:
    """Language-edition clustering from ``rel=alternate hreflang``
    declarations — the signal that groups a page's translations into
    one edition set so a corpus keeps per-language representatives
    instead of N near-identical editions (a first-order dedup concern
    on multilingual web crawls).

    Per declaring page: extract its (hreflang, href) set; the page's
    cluster key is the MIN declared member id (every spec-conformant
    member declares the same full set, so all members agree on the
    key with no connected-components iteration). Per cluster:

    * ``n_members``  — distinct declared member pages (lang edges),
    * ``n_declaring`` — pages that actually published a block;
      ``< n_members`` ⇒ broken reciprocity (the declarations are
      one-sided, a spec violation search engines ignore),
    * ``n_langs`` — distinct hreflang values; ``< n_members`` ⇒ two
      editions claim the same language (conflicting hreflang),
    * ``default_url`` — the ``x-default`` target,
    * ``status`` — broken_reciprocity | lang_conflict | ok (broken
      wins when both hold).

    100 TB shape: one codegen regexp_extract_all + narrow explode;
    one window on src page id (same-key, partial-friendly) to derive
    the cluster key, then ONE shuffle on cluster key whose groups are
    bounded by edition-set size (≤ tens) — no skew, no iteration.

    Reference lineage: CollectNode groups per-region results back to
    their source image before assembly
    (reference: deploy/py_infer/src/parallel/module/common/collect_node.py:72-99);
    here the grouping key is the edition set's min member.
    """
    from pyspark.sql import Window

    html_s = F.col("html").cast("string")
    e = pages.select(
        F.col("doc_id").alias("src_doc"),
        F.explode(
            F.regexp_extract_all(html_s, F.lit(HREFLANG_RE), F.lit(0))
        ).alias("tag"),
    )
    edges = e.select(
        "src_doc",
        F.regexp_extract("tag", HREFLANG_RE, 1).alias("hreflang"),
        F.regexp_extract(
            F.regexp_extract("tag", HREFLANG_RE, 2), r"/d/([0-9]+)$", 1
        ).cast("bigint").alias("dst_doc"),
    )
    keyed = edges.withColumn(
        "cluster_id",
        F.min("dst_doc").over(Window.partitionBy("src_doc")),
    )
    is_lang = F.col("hreflang") != "x-default"
    agg = keyed.groupBy("cluster_id").agg(
        F.count_distinct("src_doc").cast("bigint").alias("n_declaring"),
        F.size(
            F.collect_set(F.when(is_lang, F.col("dst_doc")))
        ).cast("bigint").alias("n_members"),
        F.size(
            F.collect_set(F.when(is_lang, F.col("hreflang")))
        ).cast("bigint").alias("n_langs"),
        F.min(
            F.when(F.col("hreflang") == "x-default", F.col("dst_doc"))
        ).alias("xdef_doc"),
    )
    return agg.select(
        "cluster_id",
        "n_members",
        "n_declaring",
        "n_langs",
        F.concat(
            F.lit("https://docs.example/d/"),
            F.col("xdef_doc").cast("string"),
        ).alias("default_url"),
        F.when(
            F.col("n_declaring") < F.col("n_members"),
            F.lit("broken_reciprocity"),
        )
        .when(F.col("n_langs") < F.col("n_members"), F.lit("lang_conflict"))
        .otherwise(F.lit("ok"))
        .alias("status"),
    )


def meta_divergence(pages: DataFrame, text_col: str = "text") -> DataFrame:
    """Meta-description divergence — the cloaking / SEO-stuffing
    signal: a page whose declared description shares (almost) no
    vocabulary with its served body is describing content it does not
    carry, the classic bait pattern quality gates want flagged before
    the description is trusted as a summary field.

    Per page: ``n_desc`` = distinct description tokens, ``n_overlap``
    = distinct tokens shared with the body, ``verdict`` = 'divergent'
    when ``2·n_overlap < n_desc`` (overlap under half — all-integer,
    no float division), 'aligned' otherwise, 'no_desc' when the page
    declares no description (no evidence, not honesty; a 3-state
    string, not a nullable bool — NULL booleans round-trip
    differently through the two engines' pandas bridges).

    100 TB shape: one codegen regexp_extract + two tokenizations +
    array_intersect, all row-local on the scan — zero shuffles, zero
    Python.

    Reference lineage: eval compares the DECLARED label transcript
    against the recognized text per key before trusting either
    (reference: mindocr/metrics/rec_metrics.py:24-56); here the
    declared description is compared against the served body.
    """
    from .text import tokens_col

    html_s = F.col("html").cast("string")
    desc = F.regexp_extract(html_s, DESC_META_RE, 1)
    dtoks = F.array_distinct(tokens_col(desc))
    btoks = F.array_distinct(tokens_col(F.col(text_col)))
    n_desc = F.size(dtoks)
    n_overlap = F.size(F.array_intersect(dtoks, btoks))
    return pages.select(
        "doc_id",
        n_desc.cast("bigint").alias("n_desc"),
        n_overlap.cast("bigint").alias("n_overlap"),
        F.when(desc == "", F.lit("no_desc"))
        .when(F.lit(2) * n_overlap < n_desc, F.lit("divergent"))
        .otherwise(F.lit("aligned"))
        .alias("verdict"),
    )


def label_propagation(edges: DataFrame, iters: int = 3) -> DataFrame:
    """Synchronous label-propagation community detection (Raghavan et
    al. 2007, made deterministic) over the undirected simple domain
    graph: every vertex starts as its own label; each superstep it
    adopts the label most frequent among its neighbors, ties broken
    by MIN label; a FIXED superstep count (no convergence test) keeps
    the result a pure function of the graph — the cheap community
    sketch for mirror-farm / link-ring triage before anything as
    heavy as modularity optimization. Returns one row per vertex:
    (domain, label, community_size).

    100 TB shape: the symmetric pair relation is persisted ONCE and
    feeds every superstep; a superstep is one shuffle — the
    neighbor-label join on the uniform vertex key, then a map-side-
    combinable (vertex, label) count and a vertex-grain top-1 window.
    Each superstep references the previous labels exactly once, so
    the logical plan grows LINEARLY in iters (the kcore/hits
    discipline — no 2^steps Catalyst blowup).

    Reference analog: PSE post-processing grows regions by adopting
    the strongest adjacent kernel label progressively
    (reference: mindocr/postprocess/det_pse_postprocess.py); this is
    that expansion on the link graph."""
    sym, labels = _lpa_labels(edges, iters)
    ws = Window.partitionBy("lbl")
    return labels.select(
        F.col("v").alias("domain"),
        F.col("lbl").alias("label"),
        F.count(F.lit(1)).over(ws).cast("bigint").alias("community_size"),
    )


def _canonical_pairs(edges: DataFrame) -> DataFrame:
    """Edge multiset → canonical distinct undirected simple pairs
    (a < b, self-loops dropped). NOT persisted — callers decide."""
    raw = edges.where(F.col("src_domain") != F.col("dst_domain"))
    return raw.select(
        F.least("src_domain", "dst_domain").alias("a"),
        F.greatest("src_domain", "dst_domain").alias("b"),
    ).distinct()


def _lpa_labels(edges: DataFrame, iters: int):
    """Shared LPA superstep core: returns (persisted symmetric edge
    relation, final (v, lbl) label frame). Each superstep references
    the previous labels exactly once — linear plan growth."""
    if iters < 1:
        raise ValueError(f"need iters >= 1, got {iters}")
    from mindocr_spark.cache import tracked_persist

    pairs = _canonical_pairs(edges)
    sym = tracked_persist(
        pairs.unionAll(
            pairs.select(F.col("b").alias("a"), F.col("a").alias("b"))
        )
    )
    labels = sym.select("a").distinct().select(
        F.col("a").alias("v"), F.col("a").alias("lbl")
    )
    w = Window.partitionBy("a").orderBy(
        F.col("c").desc(), F.col("lbl").asc()
    )
    for _ in range(iters):
        votes = sym.join(
            labels.select(F.col("v").alias("b"), "lbl"), "b"
        ).groupBy("a", "lbl").agg(F.count(F.lit(1)).alias("c"))
        labels = (
            votes.withColumn("rn", F.row_number().over(w))
            .where(F.col("rn") == 1)
            .select(F.col("a").alias("v"), "lbl")
        )
    return sym, labels


def strip_hubs(edges: DataFrame, max_degree: int) -> DataFrame:
    """Drop super-hub vertices (degree > max_degree in the undirected
    simple graph) and every edge touching them — the standard
    pre-pass before community detection on web graphs, where global
    utility hosts (archives, mirrors, CDNs) glue otherwise-separate
    neighborhoods into one blob and make any label/community algorithm
    collapse. Returns the surviving edge set, canonicalized
    (src_domain < dst_domain, self-loops and duplicates gone).

    100 TB shape: one degree groupBy on the uniform vertex key, then
    two keep-set joins (AQE broadcasts the keep set when small; at
    web scale it stays a shuffle join on the same uniform key). Hub
    stripping is also the SKEW remover: the stripped keys are exactly
    the keys that made downstream neighbor joins skewed."""
    if max_degree < 1:
        raise ValueError(f"need max_degree >= 1, got {max_degree}")
    from mindocr_spark.cache import tracked_persist

    pairs = tracked_persist(_canonical_pairs(edges))
    deg = (
        pairs.select(F.col("a").alias("v"))
        .unionAll(pairs.select(F.col("b").alias("v")))
        .groupBy("v")
        .agg(F.count(F.lit(1)).alias("d"))
    )
    keep = deg.where(F.col("d") <= max_degree).select("v")
    return (
        pairs.join(keep.select(F.col("v").alias("a")), "a")
        .join(keep.select(F.col("v").alias("b")), "b")
        .select(
            F.col("a").alias("src_domain"), F.col("b").alias("dst_domain")
        )
    )


def community_modularity(edges: DataFrame, iters: int = 3) -> DataFrame:
    """Newman modularity audit of the LPA partition — the 'did the
    cheap community sketch find real structure?' number. Per community
    c: Q_c = L_c/m − (D_c/2m)², with L_c intra-community edges, D_c
    the community degree sum, m total edges; Σ Q_c is the partition's
    modularity (≈0 for random wiring, high for sealed link rings).
    Returns one row per community, ordered by label:
    (label, size, degree_sum, intra_edges, q_contrib).

    Exactness discipline: every aggregate is an exact BIGINT (edge
    counts, degree sums); q_contrib is ONE IEEE division of integer
    numerator (4·m·L_c − D_c²) by integer denominator (4·m²) — bit-
    identical across engines and partitionings, no rounding needed.

    100 TB shape: the symmetric relation is persisted once and feeds
    the supersteps AND the degree count; labels are persisted once and
    feed the community rollup AND both endpoint joins of the intra
    count (vertex-key shuffles, uniform); everything after that runs
    at COMMUNITY cardinality; m = |sym|/2 (≡ Σ degree_sum / 2, every
    symmetric edge row contributes one endpoint degree) comes from a
    broadcast one-row count of the PERSISTED edge relation — no
    second pass over the intra-join subtree and no unpartitioned
    window over the unbounded community relation. At
    10^12 edges lift the q_contrib integers to DECIMAL(38,0); the
    plan is unchanged.

    Reference analog: PSE post-processing validates grown regions by
    score thresholds over the assembled kernels
    (reference: mindocr/postprocess/det_pse_postprocess.py); this is
    that acceptance check on link-graph communities."""
    from mindocr_spark.cache import tracked_persist

    sym, raw_labels = _lpa_labels(edges, iters)
    labels = tracked_persist(raw_labels)
    deg = sym.groupBy(F.col("a").alias("v")).agg(
        F.count(F.lit(1)).cast("bigint").alias("d")
    )
    per_comm = deg.join(labels, "v").groupBy("lbl").agg(
        F.count(F.lit(1)).cast("bigint").alias("size"),
        F.sum("d").cast("bigint").alias("degree_sum"),
    )
    pairs = sym.where(F.col("a") < F.col("b"))
    intra = (
        pairs.join(
            labels.select(F.col("v").alias("a"), F.col("lbl").alias("la")),
            "a",
        )
        .join(
            labels.select(F.col("v").alias("b"), F.col("lbl").alias("lb")),
            "b",
        )
        .where(F.col("la") == F.col("lb"))
        .groupBy(F.col("la").alias("lbl"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("intra_edges"))
    )
    comm = (
        per_comm.join(intra, "lbl", "left")
        .select(
            "lbl",
            "size",
            "degree_sum",
            F.coalesce(F.col("intra_edges"), F.lit(0).cast("bigint"))
            .alias("intra_edges"),
        )
    )
    # m = Σ_v d(v) / 2 = |sym| / 2 EXACTLY (every symmetric edge row
    # contributes one endpoint degree) — so the global total reads the
    # PERSISTED edge relation directly: one tiny broadcast aggregate,
    # no second pass over the expensive intra-join subtree and no
    # single-task window over the unbounded community relation
    m_row = sym.agg(
        F.expr("count(1) div 2").cast("bigint").alias("m"))
    comm = comm.crossJoin(F.broadcast(m_row))
    num = (
        F.lit(4) * F.col("m") * F.col("intra_edges")
        - F.col("degree_sum") * F.col("degree_sum")
    )
    den = F.lit(4) * F.col("m") * F.col("m")
    return comm.select(
        F.col("lbl").alias("label"),
        "size",
        "degree_sum",
        "intra_edges",
        (num.cast("double") / den.cast("double")).alias("q_contrib"),
    )


def degree_assortativity(edges: DataFrame) -> DataFrame:
    """Degree-assortativity coefficient (Newman 2002) of the
    undirected simple domain graph — the one-number web-graph health
    signal: organic webs are DISassortative (hubs link leaves, r < 0);
    link farms wire similar-degree members together and push r
    positive. Pearson correlation of endpoint degrees over both
    orientations of every edge.

    Returns ONE row: (n_endpoints, r) with r = round 6, NULL when the
    variance is zero (regular graphs — undefined, not 0.0).

    100 TB shape: the edge multiset collapses once to canonical
    distinct pairs, degrees come from one map-side-combinable groupBy,
    and the coefficient is ONE aggregate over the degree-labeled
    symmetric edge list — five BIGINT sums (exact; at 10^12 edges lift
    to DECIMAL(38,0), same plan) feeding a pinned-order IEEE formula.
    No quadratic anything."""
    from mindocr_spark.cache import tracked_persist

    pairs = tracked_persist(_canonical_pairs(edges))
    deg = pairs.select(F.col("a").alias("domain")).unionAll(
        pairs.select(F.col("b").alias("domain"))
    ).groupBy("domain").agg(
        F.count(F.lit(1)).cast("bigint").alias("d")
    )
    sym = pairs.unionAll(
        pairs.select(F.col("b").alias("a"), F.col("a").alias("b"))
    )
    labeled = sym.join(
        deg.select(F.col("domain").alias("a"), F.col("d").alias("x")),
        "a",
    ).join(
        deg.select(F.col("domain").alias("b"), F.col("d").alias("y")),
        "b",
    )
    agg = labeled.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("x").cast("bigint").alias("sx"),
        F.sum("y").cast("bigint").alias("sy"),
        F.sum(F.col("x") * F.col("y")).cast("bigint").alias("sxy"),
        F.sum(F.col("x") * F.col("x")).cast("bigint").alias("sxx"),
        F.sum(F.col("y") * F.col("y")).cast("bigint").alias("syy"),
    )
    nd = F.col("n").cast("double")
    sx = F.col("sx").cast("double")
    sy = F.col("sy").cast("double")
    num = nd * F.col("sxy").cast("double") - sx * sy
    vx = nd * F.col("sxx").cast("double") - sx * sx
    vy = nd * F.col("syy").cast("double") - sy * sy
    return agg.select(
        F.col("n").alias("n_endpoints"),
        F.when(
            (vx > 0) & (vy > 0),
            F.round(num / F.sqrt(vx * vy), 6) + F.lit(0.0),
        ).alias("r"),
    )


def _shared_endorser_pairs(
    edges: DataFrame,
    key_col: str,
    val_col: str,
    min_common: int,
    max_key_degree: int,
) -> DataFrame:
    """Shared core of co-citation and bibliographic coupling: pairs
    of `val_col` entities sharing a `key_col` endorser. Distinct
    (key, val) edges; keys with degree > max_key_degree are DROPPED
    before the self-join (the hub guard: one 10^6-out-degree
    directory page would otherwise contribute 10^12 pairs — the same
    skew-key argument as :func:`strip_hubs`, and a hub's endorsement
    carries no similarity signal anyway); in-key pair work is then
    bounded at degree². Returns (a, b, n_common, n_a, n_b, jaccard)
    with a < b, n_common ≥ min_common; set sizes count only
    surviving (non-hub) endorsers so jaccard =
    |A∩B| / (|A|+|B|−|A∩B|) is consistent; one IEEE division,
    rounded half-away at 6 (the ngram_jaccard discipline)."""
    from mindocr_spark.cache import tracked_persist

    if min_common < 1 or max_key_degree < 2:
        raise ValueError("min_common >= 1, max_key_degree >= 2")
    e = edges.select(
        F.col(key_col).alias("k"), F.col(val_col).alias("v")
    ).where(
        F.col(key_col).isNotNull() & F.col(val_col).isNotNull()
    ).distinct()
    deg = e.groupBy("k").agg(
        F.count(F.lit(1)).cast("bigint").alias("kd")
    )
    kept = tracked_persist(
        e.join(deg.where(F.col("kd") <= max_key_degree), "k")
        .select("k", "v")
    )
    sizes = kept.groupBy("v").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_sets")
    )
    common = (
        kept.alias("x")
        .join(
            kept.alias("y"),
            (F.col("x.k") == F.col("y.k"))
            & (F.col("x.v") < F.col("y.v")),
        )
        .groupBy(
            F.col("x.v").alias("a"), F.col("y.v").alias("b")
        )
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_common"))
        .where(F.col("n_common") >= min_common)
    )
    sa = sizes.select(F.col("v").alias("a"), F.col("n_sets").alias("n_a"))
    sb = sizes.select(F.col("v").alias("b"), F.col("n_sets").alias("n_b"))
    jac = F.col("n_common").cast("double") / (
        F.col("n_a") + F.col("n_b") - F.col("n_common")
    ).cast("double")
    return (
        common.join(sa, "a").join(sb, "b")
        .select(
            "a", "b", "n_common", "n_a", "n_b",
            F.round(jac, 6).alias("jaccard"),
        )
    )


def cocitation_pairs(
    edges: DataFrame,
    min_common: int = 2,
    max_out_degree: int = 1000,
) -> DataFrame:
    """Co-citation similarity (Small 1973) over the domain graph:
    pairs of DESTINATION domains endorsed by the same source domains
    — 'related sites' by shared inbound endorsement, the link-era
    related-pages signal. Returns (a, b, n_common, n_a, n_b,
    jaccard) over in-link source sets, a < b. Sources with
    out-degree > max_out_degree are excluded (hub guard; their
    endorsement is indiscriminate). One distinct collapse, one
    key-bounded self-join, one map-side-combinable pair count."""
    return _shared_endorser_pairs(
        edges, "src_domain", "dst_domain", min_common, max_out_degree
    )


def coupling_pairs(
    edges: DataFrame,
    min_common: int = 2,
    max_in_degree: int = 1000,
) -> DataFrame:
    """Bibliographic coupling (Kessler 1963) over the domain graph:
    pairs of SOURCE domains that link to the same destinations —
    'same editorial orientation' by shared outbound references (the
    dual of :func:`cocitation_pairs`; coupling is known at publish
    time, co-citation accrues afterwards). Returns (a, b, n_common,
    n_a, n_b, jaccard) over out-link destination sets, a < b.
    Destinations with in-degree > max_in_degree are excluded (every
    site links to docs.example — sharing it says nothing)."""
    return _shared_endorser_pairs(
        edges, "dst_domain", "src_domain", min_common, max_in_degree
    )

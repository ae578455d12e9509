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

from pyspark.sql import Column, DataFrame, Window, functions as F

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


# ---------------------------------------------------------------------------
# Bloom seen-set — the frontier's constant-space membership gate
# ---------------------------------------------------------------------------

#: Default Bloom geometry for the oracle-checked query surface: 1024
#: 32-bit words = 32,768 bits. Deliberately small so the test tiers
#: exercise real load factors (sf0.01 ≈ 0.06 → zero false positives,
#: sf0.1 ≈ 0.55 → a deterministic handful); production sizes m_words
#: to the committed-set cardinality (~10 bits/key for 1% FP).
BLOOM_WORDS = 1024
BLOOM_K = 4


def _bloom_positions(url_col, m_words: int, k: int) -> list[Column]:
    """The k bit positions of one key: independent 32-bit slices of
    md5(url), each taken mod the filter width. md5 yields 32 hex chars
    = four 8-char slices, capping k at 4; the conv() hex-to-int is the
    weighted_sample idiom, bit-identical to DuckDB's
    ``('0x' || substr(md5(url), …))::BIGINT``."""
    if not 1 <= k <= 4:
        raise ValueError(f"bloom k must be 1..4 (md5 has 4 slices), got {k}")
    if m_words < 1:
        raise ValueError(f"bloom m_words must be >= 1, got {m_words}")
    u = F.col(url_col) if isinstance(url_col, str) else url_col
    h = F.md5(u.cast("binary"))
    m_bits = m_words * 32
    return [
        F.pmod(
            F.conv(F.substring(h, 1 + 8 * i, 8), 16, 10).cast("bigint"),
            F.lit(m_bits),
        )
        for i in range(k)
    ]


def bloom_build(
    committed: DataFrame,
    url_col: str = "url",
    m_words: int = BLOOM_WORDS,
    k: int = BLOOM_K,
) -> DataFrame:
    """Build a Bloom filter over the committed URL set as a relation of
    packed words: (word, bits) with ``word = position >> 5`` and bit
    ``position & 31`` set — at most `m_words` rows no matter how many
    keys went in. This is the crawl frontier's seen-set: membership in
    constant space, no false negatives, a bounded false-positive rate
    the caller prices in. Bits stay in 0..31 (32-bit words in a BIGINT)
    so no engine's shift can touch the sign bit.

    100 TB shape: the alternative — an exact anti-join of every
    frontier candidate against 10^12 committed urls — shuffles the
    committed corpus every crawl round. The Bloom build is ONE narrow
    explode (k positions per url, map-side) + ONE ``bit_or`` groupBy at
    filter-word cardinality (≤ m_words rows out, map-side combinable:
    a billion urls reach the reducer as one partial word-vector per
    task); the artifact is megabytes and broadcasts. NULL urls carry no
    positions and are dropped.

    Reference lineage: the reference's resume discipline skips
    already-processed inputs by consulting committed state
    (reference: tools/train.py:111-122); the Bloom is that membership
    test made constant-space for frontier scale.
    """
    pos = _bloom_positions(url_col, m_words, k)
    return (
        committed.where(F.col(url_col).isNotNull())
        .select(F.explode(F.array(*pos)).alias("p"))
        .groupBy(F.shiftright("p", 5).alias("word"))
        .agg(
            F.bit_or(
                F.expr("shiftleft(1L, cast(p & 31 as int))")
            ).alias("bits")
        )
    )


def bloom_gate(
    candidates: DataFrame,
    bloom: DataFrame,
    url_col: str = "url",
    m_words: int = BLOOM_WORDS,
    k: int = BLOOM_K,
) -> DataFrame:
    """Gate frontier candidates through a built Bloom filter:
    (url, maybe_seen) with ``maybe_seen`` true iff ALL k of the
    candidate's bits are set. No false negatives by construction —
    every committed url tests true; a false positive skips a fetch
    (re-discovered next round via links), which is the cheap error
    direction for a crawler.

    100 TB shape: the filter is ≤ m_words rows, so the gate is k
    BROADCAST left joins on the word key — the 10^12-candidate side is
    touched once, map-only, ZERO shuffles (vs the exact anti-join's
    full shuffle of both sides). The bit test is codegen arithmetic;
    the k probes fuse into one whole-stage span."""
    pos = _bloom_positions(url_col, m_words, k)
    out = candidates.select(
        F.col(url_col).alias("url"),
        *[F.shiftright(p, 5).alias(f"__w{i}") for i, p in enumerate(pos)],
        *[p.bitwiseAND(F.lit(31)).alias(f"__t{i}")
          for i, p in enumerate(pos)],
    )
    checks = []
    for i in range(k):
        side = bloom.select(
            F.col("word").alias(f"__w{i}"), F.col("bits").alias(f"__b{i}")
        )
        out = out.join(F.broadcast(side), f"__w{i}", "left")
        checks.append(
            F.coalesce(
                F.expr(
                    f"(shiftright(__b{i}, cast(__t{i} as int)) & 1) = 1"
                ),
                F.lit(False),
            )
        )
    seen = checks[0]
    for c in checks[1:]:
        seen = seen & c
    return out.select("url", seen.alias("maybe_seen"))


# ---------------------------------------------------------------------------
# robots.txt — fetch-side politeness (the crawl-layer gate, as opposed to
# the page-side <meta name="robots"> flags in functions/links.py)
# ---------------------------------------------------------------------------

def parse_robots(
    robots: DataFrame,
    ua: str = "*",
    domain_col: str = "domain",
    txt_col: str = "robots_txt",
) -> tuple[DataFrame, DataFrame]:
    """Parse a (domain, robots_txt) relation into the RULE relation the
    fetch gate joins against, for one requesting user-agent: rules =
    (domain, rule_type ∈ allow/disallow, path_prefix, prefix_len) and
    delays = (domain, crawl_delay).

    Group attribution follows RFC 9309's shape with one documented
    simplification: a rule belongs to the MOST RECENT ``User-agent``
    line above it (consecutive UA lines sharing one group-record is
    not modeled — the corpus families never emit them); group selection
    is EXCLUSIVE per RFC 9309 — the group matching `ua` exactly when
    the domain declares one, else the ``*`` group. Comments (``#``…)
    are stripped, blank lines skipped, field names case-insensitive,
    and an EMPTY Disallow value — the classic "allow everything"
    idiom — drops out of the rule set entirely.

    100 TB shape: per-domain robots bodies are tiny (the protocol
    caps at 500 KiB) and the whole parse is codegen regex + ONE
    window over (domain, line_no) — partition-local after a single
    shuffle on domain, which the downstream gate join needs anyway.
    No Python.

    Reference lineage: the reference's per-source config blocks select
    which transform pipeline applies to which dataset
    (reference: configs/rec/crnn/crnn_icdar15.yaml, tools/infer/text/
    config.py:23-60); UA-group selection is the crawl-layer analog of
    that per-source dispatch.
    """
    lines = robots.select(
        F.col(domain_col).alias("domain"),
        F.posexplode(F.split(F.col(txt_col), "\n")).alias("line_no", "raw"),
    )
    clean = F.trim(F.regexp_replace(F.col("raw"), "#.*", ""))
    parsed = lines.select(
        "domain",
        "line_no",
        F.lower(
            F.trim(F.regexp_extract(clean, r"(?i)^user-agent:\s*(\S+)", 1))
        ).alias("ua_decl"),
        F.lower(
            F.regexp_extract(clean, r"(?i)^(allow|disallow|crawl-delay):", 1)
        ).alias("kind"),
        F.trim(
            F.regexp_extract(
                clean, r"(?i)^(?:allow|disallow|crawl-delay):\s*(\S*)", 1
            )
        ).alias("value"),
    )
    w = (
        Window.partitionBy("domain")
        .orderBy("line_no")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    sect = parsed.withColumn(
        "cur_ua",
        F.last(
            F.when(F.col("ua_decl") != "", F.col("ua_decl")), ignorenulls=True
        ).over(w),
    )
    # RFC 9309 group selection is EXCLUSIVE: when a domain declares a
    # group for this UA, only that group applies — the '*' group is the
    # fallback for domains without one, never a merge partner (merging
    # would let a '*' Allow override the bot's own group's Disallow).
    # A declared-but-empty specific group therefore means allow-all.
    spec = (
        parsed.where(
            (F.col("ua_decl") == ua.lower()) & F.lit(ua != "*")
        )
        .select("domain")
        .distinct()
        .withColumn("__spec", F.lit(True))
    )
    sect = sect.join(spec, "domain", "left")
    mine = F.when(
        F.coalesce(F.col("__spec"), F.lit(False)),
        F.col("cur_ua") == ua.lower(),
    ).otherwise(F.col("cur_ua") == "*")
    rules = sect.where(
        F.col("kind").isin("allow", "disallow")
        & mine
        & (F.col("value") != "")
    ).select(
        "domain",
        F.col("kind").alias("rule_type"),
        F.col("value").alias("path_prefix"),
        F.length("value").alias("prefix_len"),
    )
    delays = (
        sect.where((F.col("kind") == "crawl-delay") & mine)
        .groupBy("domain")
        .agg(F.min(F.col("value").cast("double")).alias("crawl_delay"))
    )
    return rules, delays


def robots_sitemaps(
    robots: DataFrame,
    domain_col: str = "domain",
    txt_col: str = "robots_txt",
) -> DataFrame:
    """Extract ``Sitemap:`` declarations from robots.txt bodies:
    (domain, sitemap_url), one row per declaration. Per RFC 9309 §2.3
    the field is CROSS-GROUP — independent of any User-agent group, so
    this is a plain line tap, deliberately outside
    :func:`parse_robots`'s group-attribution machinery (which must
    keep ignoring these lines). Field name case-insensitive, comments
    stripped, duplicates preserved (a site may declare an index AND a
    news sitemap). This is the discovery hook that feeds
    :func:`parse_sitemaps`: robots.txt → sitemap urls → declared-URL
    inventory → coverage.

    100 TB shape: one narrow explode over protocol-capped bodies +
    codegen regex — no shuffle, no Python."""
    lines = robots.select(
        F.col(domain_col).alias("domain"),
        F.explode(F.split(F.col(txt_col), "\n")).alias("raw"),
    )
    clean = F.trim(F.regexp_replace(F.col("raw"), "#.*", ""))
    url = F.regexp_extract(clean, r"(?i)^sitemap:\s*(\S+)", 1)
    return lines.select(
        "domain", url.alias("sitemap_url")
    ).where(F.col("sitemap_url") != "")


def robots_gate(
    pages: DataFrame,
    robots: DataFrame,
    ua: str = "*",
    url_col: str = "url",
) -> DataFrame:
    """Evaluate robots.txt fetch permission per page: (url, host,
    path, allowed, rule_type, matched_prefix, crawl_delay). Standard
    longest-match semantics: among the requesting UA's rules whose
    path_prefix is a prefix of the page path, the LONGEST wins; on an
    exact length tie Allow wins; no matching rule (or no robots.txt
    at all) means allowed.

    100 TB shape: rules and delays join on host — the rules side is
    ~rules-per-domain × domains (bounded by the 500 KiB protocol cap,
    in practice a few rows per domain), so the join is a classic
    small-dim equi-join; the longest-match argmax is ONE map-side-
    combinable max(struct(prefix_len, allow_wins, …)) per url, so a
    hot domain's million pages never amplify — each carries only its
    own matched-rule row into the aggregate. No Python anywhere.
    """
    rules, delays = parse_robots(robots, ua=ua)
    raw_path = F.regexp_extract(
        F.col(url_col), r"^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*(/[^?#]*)?", 1
    )
    p = pages.select(
        F.col(url_col).alias("url"),
        url_host(url_col).alias("host"),
        # RFC 9309: an authority-only URL ('https://host') is the path
        # '/' — otherwise even a blanket 'Disallow: /' misses the root
        F.when(raw_path == "", F.lit("/")).otherwise(raw_path)
        .alias("path"),
    )
    best = (
        p.join(rules, p["host"] == rules["domain"])
        .where(F.col("path").startswith(F.col("path_prefix")))
        .groupBy("url")
        .agg(
            F.max(
                F.struct(
                    F.col("prefix_len").alias("l"),
                    (F.col("rule_type") == "allow").cast("int").alias("a"),
                    F.col("rule_type").alias("t"),
                    F.col("path_prefix").alias("p"),
                )
            ).alias("b")
        )
    )
    return (
        p.join(best, "url", "left")
        .join(delays, p["host"] == delays["domain"], "left")
        .select(
            "url",
            "host",
            "path",
            F.coalesce(F.col("b.a") == 1, F.lit(True)).alias("allowed"),
            F.col("b.t").alias("rule_type"),
            F.col("b.p").alias("matched_prefix"),
            "crawl_delay",
        )
    )


def robots_gate_wildcard(
    pages: DataFrame,
    robots: DataFrame,
    ua: str = "*",
    url_col: str = "url",
) -> DataFrame:
    """`robots_gate` with full RFC 9309 §2.2.3 pattern semantics:
    ``*`` matches any character run and a trailing ``$`` anchors the
    pattern at end-of-path. (url, host, path, allowed, rule_type,
    matched_pattern, crawl_delay). Most-specific = longest RAW pattern
    (octets, the Google/RFC rule — '$' and '*' count); Allow wins
    length ties; no matching rule ⇒ allowed.

    Pattern → regex happens IN-PLAN (codegen string ops, identical
    transformation in the SQL oracle): strip a trailing ``$`` (anchor
    flag), escape every regex metachar except ``*``, swap ``*`` for
    ``.*``, wrap in ``^…(…$)``. Matching is `regexp_like` with a
    per-row pattern — a real per-row regex compile, which is exactly
    the price wildcard robots rules cost anywhere; bounded because
    the candidate set is (page × its domain's rules) and real robots
    files hold a handful of rules (protocol cap 500 KiB). The
    longest-match argmax stays ONE map-side-combinable max(struct)
    per url — a hot domain's pages never amplify.

    Reference analog: regex-driven label filtering per sample
    (reference: mindocr/data/rec_lmdb_dataset.py:106-119), lifted to
    the fetch-permission protocol."""
    rules, delays = parse_robots(robots, ua=ua)
    anchored = F.col("path_prefix").endswith("$")
    core = F.when(
        anchored,
        F.substring(F.col("path_prefix"), 1,
                    F.length("path_prefix") - 1),
    ).otherwise(F.col("path_prefix"))
    esc = F.regexp_replace(
        core, r"([\\^$.|?+()\[\]{}])", r"\\$1"
    )
    rx = F.concat(
        F.lit("^"),
        F.regexp_replace(esc, r"\*", ".*"),
        F.when(anchored, F.lit("$")).otherwise(F.lit("")),
    )
    rules = rules.select(
        "domain", "rule_type", "path_prefix", "prefix_len",
        rx.alias("__rx"),
    )
    raw_path = F.regexp_extract(
        F.col(url_col), r"^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*(/[^?#]*)?", 1
    )
    p = pages.select(
        F.col(url_col).alias("url"),
        url_host(url_col).alias("host"),
        F.when(raw_path == "", F.lit("/")).otherwise(raw_path)
        .alias("path"),
    )
    best = (
        p.join(rules, p["host"] == rules["domain"])
        .where(F.regexp_like(F.col("path"), F.col("__rx")))
        .groupBy("url")
        .agg(
            F.max(
                F.struct(
                    F.col("prefix_len").alias("l"),
                    (F.col("rule_type") == "allow").cast("int").alias("a"),
                    F.col("rule_type").alias("t"),
                    F.col("path_prefix").alias("p"),
                )
            ).alias("b")
        )
    )
    return (
        p.join(best, "url", "left")
        .join(delays, p["host"] == delays["domain"], "left")
        .select(
            "url",
            "host",
            "path",
            F.coalesce(F.col("b.a") == 1, F.lit(True)).alias("allowed"),
            F.col("b.t").alias("rule_type"),
            F.col("b.p").alias("matched_pattern"),
            "crawl_delay",
        )
    )


# ---------------------------------------------------------------------------
# sitemap.xml — declared-URL inventory and crawl-coverage accounting
# ---------------------------------------------------------------------------

#: Sitemap-protocol entry / field patterns (sitemaps.org). Non-greedy
#: bodies; shared constants so the corpus writer and both engines pin
#: the same bytes.
SITEMAP_URL_RE = r"<url>(.*?)</url>"
_LOC_RE = r"<loc>(.*?)</loc>"
_LASTMOD_RE = r"<lastmod>(.*?)</lastmod>"
_CHANGEFREQ_RE = r"<changefreq>(.*?)</changefreq>"


def parse_sitemaps(
    sitemaps: DataFrame,
    domain_col: str = "domain",
    xml_col: str = "sitemap_xml",
) -> DataFrame:
    """Parse per-domain sitemap.xml bodies into the declared-URL
    relation (domain, loc, lastmod, changefreq) — the crawl frontier's
    site-declared side. Optional fields come back NULL, not ''.

    100 TB shape: one codegen ``regexp_extract_all`` per domain body
    (the protocol caps a sitemap file at 50k URLs / 50 MB) + a narrow
    explode + row-local field taps — no Python, no shuffle; the
    downstream coverage join picks its own key.
    """
    e = sitemaps.select(
        F.col(domain_col).alias("domain"),
        F.explode(
            F.regexp_extract_all(
                F.col(xml_col), F.lit(SITEMAP_URL_RE), F.lit(1)
            )
        ).alias("__e"),
    )
    b = F.col("__e")

    def field(pat: str):
        return F.nullif(F.regexp_extract(b, pat, 1), F.lit(""))

    return e.select(
        "domain",
        F.regexp_extract(b, _LOC_RE, 1).alias("loc"),
        field(_LASTMOD_RE).alias("lastmod"),
        field(_CHANGEFREQ_RE).alias("changefreq"),
    )


#: sitemapindex entry pattern (sitemaps.org index files) — the nesting
#: layer above urlset files. Non-greedy body, shared with the corpus
#: writer and the SQL oracle.
SITEMAP_INDEX_RE = r"<sitemap>(.*?)</sitemap>"


def resolve_sitemap_index(
    indexes: DataFrame,
    fetched: DataFrame,
    domain_col: str = "domain",
    xml_col: str = "sitemap_xml",
    url_col: str = "sitemap_url",
) -> DataFrame:
    """The sitemap-protocol NESTING layer: parse per-domain
    ``<sitemapindex>`` files into child-sitemap references, resolve
    each against the `fetched` body table (url → xml), and parse the
    fetched children into the declared-URL relation annotated with its
    source sitemap — (domain, sitemap_url, loc, lastmod, changefreq,
    fetched). Children declared by the index but ABSENT from `fetched`
    still appear (one row, NULL fields, fetched=false): a frontier
    must know what it has not yet pulled — the failure-flow
    no-row-vanishes discipline.

    100 TB shape: index parse is one codegen regexp per domain body
    (indexes cap at 50k child refs); resolution is ONE equi-join on
    the child-url key (uniform — each child url is unique); child
    parse is the `parse_sitemaps` explode, narrow. Large sites'
    50-file indexes fan out to rows, never to driver state.

    Reference analog: multi-directory dataset union where a manifest
    names per-shard annotation files (reference:
    mindocr/data/rec_lmdb_dataset.py:34-53 multi-LMDB-dir union),
    lifted to the crawl protocol."""
    kids = indexes.select(
        F.col(domain_col).alias("domain"),
        F.explode(
            F.regexp_extract_all(
                F.col(xml_col), F.lit(SITEMAP_INDEX_RE), F.lit(1)
            )
        ).alias("__e"),
    ).select(
        "domain",
        F.regexp_extract(F.col("__e"), _LOC_RE, 1).alias("sitemap_url"),
    )
    resolved = kids.join(
        fetched.select(
            F.col(url_col).alias("sitemap_url"),
            F.col(xml_col).alias("__xml"),
        ),
        "sitemap_url",
        "left",
    )
    have = resolved.where(F.col("__xml").isNotNull())
    entries = have.select(
        "domain",
        "sitemap_url",
        F.explode(
            F.regexp_extract_all(
                F.col("__xml"), F.lit(SITEMAP_URL_RE), F.lit(1)
            )
        ).alias("__u"),
    )
    b = F.col("__u")

    def field(pat: str):
        return F.nullif(F.regexp_extract(b, pat, 1), F.lit(""))

    parsed = entries.select(
        "domain",
        "sitemap_url",
        F.regexp_extract(b, _LOC_RE, 1).alias("loc"),
        field(_LASTMOD_RE).alias("lastmod"),
        field(_CHANGEFREQ_RE).alias("changefreq"),
        F.lit(True).alias("fetched"),
    )
    missing = resolved.where(F.col("__xml").isNull()).select(
        "domain",
        "sitemap_url",
        F.lit(None).cast("string").alias("loc"),
        F.lit(None).cast("string").alias("lastmod"),
        F.lit(None).cast("string").alias("changefreq"),
        F.lit(False).alias("fetched"),
    )
    return parsed.unionByName(missing)


def sitemap_coverage(
    declared: DataFrame,
    pages: DataFrame,
    as_of: str,
    url_col: str = "url",
) -> DataFrame:
    """Reconcile the site-DECLARED url inventory (`declared` =
    :func:`parse_sitemaps` output) against the CRAWLED inventory
    (`pages`): one row per url in either side with
    (url, in_sitemap, crawled, lastmod, status) where status is

    * ``uncrawled``  — declared but never fetched (frontier backlog),
    * ``undeclared`` — fetched but absent from the sitemap (discovered
      via links; also the spider-trap signal),
    * ``stale``      — fetched, and the sitemap's lastmod is after
      `as_of` (the crawl date) — refetch candidates,
    * ``fresh``      — fetched and up to date.

    `as_of` is an ISO ``yyyy-mm-dd`` string compared lexicographically
    (the ISO form orders correctly as bytes — no timestamp parsing, so
    the comparison is engine- and timezone-independent).

    100 TB shape: ONE full-outer equi-join on the uniform url key —
    both sides pre-collapse to url grain, so the join carries no
    payload columns and no skew (a url appears once per side).
    """
    s = declared.select(
        F.col("loc").alias("url"), "lastmod", F.lit(True).alias("__s")
    ).dropDuplicates(["url"])
    p = (
        pages.select(F.col(url_col).alias("url"))
        .dropDuplicates(["url"])
        .withColumn("__p", F.lit(True))
    )
    j = s.join(p, "url", "full_outer")
    in_sitemap = F.coalesce(F.col("__s"), F.lit(False))
    crawled = F.coalesce(F.col("__p"), F.lit(False))
    return j.select(
        "url",
        in_sitemap.alias("in_sitemap"),
        crawled.alias("crawled"),
        "lastmod",
        F.when(~crawled, F.lit("uncrawled"))
        .when(~in_sitemap, F.lit("undeclared"))
        .when(F.col("lastmod") > as_of, F.lit("stale"))
        .otherwise(F.lit("fresh"))
        .alias("status"),
    )


# ---------------------------------------------------------------------------
# fetch scheduling — politeness-aware per-host crawl rounds
# ---------------------------------------------------------------------------

def fetch_schedule(
    frontier: DataFrame,
    round_seconds: float = 3600.0,
    default_delay: float = 1.0,
    url_col: str = "url",
    host_col: str = "host",
    delay_col: str = "crawl_delay",
    n_salts: int = 16,
) -> DataFrame:
    """Turn a crawl frontier (url, host, crawl_delay) into one
    politeness round's fetch plan: per host, the first
    ``floor(round_seconds / delay)`` urls (lexicographic order —
    deterministic across runs/partitionings) get a slot, the i-th at
    ``fetch_at_s = (i−1)·delay`` from the host's round start. Returns
    (url, host, seq, crawl_delay, fetch_at_s); urls beyond the round's
    per-host capacity are NOT emitted — they are next round's frontier
    (``frontier − schedule``, an anti-join).

    Per-host ordering is a semantic requirement (politeness serializes
    fetches within a host), so a window over the host key is inherent —
    and hosts are heavy-tailed. Skew-safe two-phase ranking, the
    :func:`mindocr_spark.functions.urls.domain_cap` discipline:
    phase 1 ranks within (host, url-hash salt) and keeps each salt's
    local capacity — a 10^9-url host splits across `n_salts` tasks —
    then phase 2 ranks the ≤ n_salts·capacity bounded survivors.
    Capacity is bounded by the politeness budget itself
    (round_seconds / delay), so the phase-2 partitions stay small no
    matter how hot the host.
    """
    # hostile-input guard: 'Crawl-delay: 0' exists in the wild, and an
    # unguarded round/0.0 is Infinity — CAST(Inf AS INT) aborts the job
    # under ANSI mode and silently becomes Int.MaxValue otherwise. A
    # non-positive declared delay clamps to the default (politeness
    # floor), bounding capacity by the round budget.
    declared = F.col(delay_col)
    delay = F.when(
        declared.isNotNull() & (declared > 0), declared
    ).otherwise(F.lit(default_delay))
    cap = F.greatest(
        F.lit(1), F.floor(F.lit(round_seconds) / delay).cast("int")
    )
    narrow = frontier.select(
        F.col(url_col).alias("url"),
        F.col(host_col).alias("host"),
        delay.alias("crawl_delay"),
        cap.alias("__cap"),
        F.pmod(F.xxhash64(F.col(url_col)), F.lit(n_salts)).alias("__salt"),
    )
    w1 = Window.partitionBy("host", "__salt").orderBy("url")
    local = narrow.withColumn("__r1", F.row_number().over(w1)).where(
        F.col("__r1") <= F.col("__cap")
    )
    w2 = Window.partitionBy("host").orderBy("url")
    return (
        local.withColumn("seq", F.row_number().over(w2))
        .where(F.col("seq") <= F.col("__cap"))
        .select(
            "url",
            "host",
            "seq",
            "crawl_delay",
            ((F.col("seq") - 1) * F.col("crawl_delay")).alias("fetch_at_s"),
        )
    )


def revisit_policy(
    deltas: DataFrame,
    key,
    fast_rate: float = 0.5,
    slow_rate: float = 0.1,
) -> DataFrame:
    """Adaptive recrawl scheduling from snapshot deltas: aggregate
    :func:`crawl_delta` statuses per `key` (a grouping Column — site
    section, domain, …) into change statistics and a revisit bucket —
    the standard freshness-driven crawler policy (sections that churn
    get recrawled fast, static archives slow):

    * ``change_rate`` = changed / (changed + same) over urls present
      in BOTH snapshots (adds/removes are discovery/death events, not
      content churn),
    * ``revisit`` = fast (rate ≥ fast_rate) / medium (≥ slow_rate) /
      slow, or ``unknown`` when no url survived both snapshots.

    100 TB shape: one groupBy on the section key with every aggregate
    a conditional count — fully map-side combinable, so a billion-page
    section reaches its reducer as one partial row per upstream task.
    change_rate is exact integer counts + ONE correctly-rounded IEEE
    division (engine-identical, the quality_scores discipline).
    """
    k = F.col(key) if isinstance(key, str) else key

    def n(status: str):
        return F.sum(
            F.when(F.col("status") == status, 1).otherwise(0)
        ).alias(f"n_{status}")

    g = deltas.groupBy(k.alias("section")).agg(
        n("same"), n("changed"), n("added"), n("removed")
    )
    both = F.col("n_changed") + F.col("n_same")
    rate = F.when(
        both > 0,
        F.col("n_changed").cast("double") / both.cast("double"),
    )
    return g.select(
        "section",
        "n_same",
        "n_changed",
        "n_added",
        "n_removed",
        rate.alias("change_rate"),
        F.when(rate.isNull(), F.lit("unknown"))
        .when(rate >= fast_rate, F.lit("fast"))
        .when(rate >= slow_rate, F.lit("medium"))
        .otherwise(F.lit("slow"))
        .alias("revisit"),
    )


# ---------------------------------------------------------------------------
# RSS / Atom feed parsing — the third leg of the discovery triple
# (robots.txt politeness, sitemap inventory, feed freshness)
# ---------------------------------------------------------------------------

#: Shared Java-regex/RE2 patterns (rendered verbatim into the SQL
#: oracle). (?s) makes the record patterns span real-world multi-line
#: item bodies; both engines support the inline flag.
FEED_ITEM_RE = r"(?s)<item>(.*?)</item>"
FEED_ENTRY_RE = r"(?s)<entry>(.*?)</entry>"
FEED_TITLE_RE = r"<title>([^<]*)</title>"
FEED_LINK_RSS_RE = r"<link>([^<]*)</link>"
FEED_LINK_ATOM_RE = r'<link href="([^"]*)"'
FEED_PUBDATE_RE = r"<pubDate>([^<]*)</pubDate>"
FEED_UPDATED_RE = r"<updated>([^<]*)</updated>"
#: RFC-822 date core (`02 Jan 2024`) inside an RSS pubDate.
FEED_RFC822_RE = r"([0-9]{2}) ([A-Z][a-z]{2}) ([0-9]{4})"

_MONTHS = ("Jan", "Feb", "Mar", "Apr", "May", "Jun",
           "Jul", "Aug", "Sep", "Oct", "Nov", "Dec")


def parse_feeds(
    feeds: DataFrame,
    domain_col: str = "domain",
    xml_col: str = "feed_xml",
) -> DataFrame:
    """Parse RSS-2.0 / Atom feed bodies into the item relation
    (domain, kind, title, link, published, published_date) — the
    freshness-driven side of crawl discovery (feeds announce NEW urls
    between sitemap refreshes). Both wire formats normalize into one
    relation: ``kind`` records which grammar matched, ``published``
    keeps the raw timestamp string, and ``published_date`` is the
    ISO ``yyyy-mm-dd`` normal form (Atom dates are already ISO; RSS
    RFC-822 dates map month names through a pinned table) so the
    recrawl scheduler can order items lexicographically, the
    tz-independent sitemap-coverage discipline.

    100 TB shape: kind detection + record extraction are one codegen
    ``regexp_extract_all`` per feed body (feeds are capped small by
    convention, like sitemaps) + a narrow explode + row-local field
    taps — no Python, no shuffle. Reference lineage: the same
    grammar-dispatch shape as the label-format converters
    (reference: tools/dataset_converters/convert.py:21-57), which
    route each input family through its own parser into one canonical
    relation.
    """
    kind = F.when(
        F.col(xml_col).rlike(r"<rss[\s>]"), F.lit("rss")
    ).when(F.col(xml_col).rlike(r"<feed[\s>]"), F.lit("atom"))
    records = F.when(
        kind == "rss",
        F.regexp_extract_all(F.col(xml_col), F.lit(FEED_ITEM_RE), F.lit(1)),
    ).otherwise(
        F.regexp_extract_all(F.col(xml_col), F.lit(FEED_ENTRY_RE), F.lit(1))
    )
    e = feeds.select(
        F.col(domain_col).alias("domain"),
        kind.alias("kind"),
        F.explode(records).alias("rec"),
    )
    r = F.col("rec")
    is_rss = F.col("kind") == "rss"
    published = F.when(
        is_rss, F.regexp_extract(r, FEED_PUBDATE_RE, 1)
    ).otherwise(F.regexp_extract(r, FEED_UPDATED_RE, 1))
    published = F.nullif(published, F.lit(""))
    # RSS RFC-822 "02 Jan 2024" -> 2024-01-02; Atom is ISO already
    mon_name = F.regexp_extract(published, FEED_RFC822_RE, 2)
    mon_idx = F.array_position(
        F.array(*[F.lit(m) for m in _MONTHS]), mon_name
    )
    rss_date = F.when(
        mon_idx > 0,
        F.concat(
            F.regexp_extract(published, FEED_RFC822_RE, 3),
            F.lit("-"),
            F.lpad(mon_idx.cast("string"), 2, "0"),
            F.lit("-"),
            F.regexp_extract(published, FEED_RFC822_RE, 1),
        ),
    )
    iso_date = F.nullif(
        F.substring(published, 1, 10), F.lit("")
    )
    return e.select(
        "domain",
        "kind",
        F.nullif(F.regexp_extract(r, FEED_TITLE_RE, 1), F.lit(""))
        .alias("title"),
        F.nullif(
            F.when(is_rss, F.regexp_extract(r, FEED_LINK_RSS_RE, 1))
            .otherwise(F.regexp_extract(r, FEED_LINK_ATOM_RE, 1)),
            F.lit(""),
        ).alias("link"),
        published.alias("published"),
        F.when(is_rss, rss_date).otherwise(iso_date)
        .alias("published_date"),
    )


def feed_discovery(
    items: DataFrame, pages: DataFrame, url_col: str = "url"
) -> DataFrame:
    """Feed-driven frontier discovery: feed items whose link is NOT in
    the crawled inventory — the urls a freshness-driven crawler should
    fetch next, with their announced publish dates for ordering.

    100 TB shape: the feed side is tiny and the crawled side is the
    10^12-page corpus, so the plan must never shuffle the big side for
    an anti-join. Two steps: (1) semi-join the crawled inventory DOWN
    with the BROADCAST feed-link set (the corpus sheds every
    non-feed url map-side — same discipline as the BM25 vocabulary
    semi-join), then (2) anti-join the feed links against that
    bounded matched set. Both joins broadcast the small side; the big
    table is touched once, map-only.
    """
    links = items.where(F.col("link").isNotNull()).select(
        "domain", F.col("link").alias("url"), "published_date"
    ).dropDuplicates(["url"])
    crawled = pages.select(F.col(url_col).alias("url"))
    matched = crawled.join(
        F.broadcast(links.select("url")), "url", "left_semi"
    ).dropDuplicates(["url"])
    return links.join(F.broadcast(matched), "url", "left_anti").select(
        "domain", F.col("url").alias("link"), "published_date"
    )


# ---------------------------------------------------------------------------
# Soft-404 detection — crawl hygiene for pages that 200 but mean 404
# ---------------------------------------------------------------------------

#: Error-page phrasing, matched against lower() (the blockword
#: case-folding discipline — never (?i)); rendered verbatim into the
#: SQL oracle.
SOFT404_RE = (
    r"(404|not found|no longer (exists|available)"
    r"|page (does not|doesn't) exist|nothing here)"
)


def soft404_flags(
    df: DataFrame,
    title_col: str = "title",
    text_col: str = "text",
    id_col: str = "url",
    min_tokens: int = 30,
    head_chars: int = 200,
) -> DataFrame:
    """Soft-404 detection: pages served with HTTP 200 whose CONTENT is
    an error page — the crawl-corpus pollution the status gate
    (`http_gate`) cannot see. Standard two-signal heuristic:

    * ``title_404``  — error phrasing anywhere in the title,
    * ``body_404``   — error phrasing in the first `head_chars` chars
      of the extracted text (error pages lead with it),
    * ``thin``       — fewer than `min_tokens` tokens,
    * ``is_soft404`` — title says error, OR the body opens with error
      phrasing AND the page is thin (a long article that merely
      mentions "not found" is NOT an error page).

    Flag-style: no row vanishes; the curation funnel or the recrawl
    scheduler decides (soft-404s are also re-fetch candidates — the
    page may exist again later).

    100 TB shape: two codegen rlikes + the shared token count, fused
    into the scan — zero shuffles, zero Python.
    """
    from .text import tokens_col

    title_hit = F.coalesce(
        F.lower(F.col(title_col)).rlike(SOFT404_RE), F.lit(False)
    )
    body_head = F.lower(
        F.substring(F.coalesce(F.col(text_col), F.lit("")), 1, head_chars)
    )
    body_hit = body_head.rlike(SOFT404_RE)
    n_tokens = F.size(tokens_col(F.coalesce(F.col(text_col), F.lit(""))))
    thin = n_tokens < min_tokens
    return df.select(
        id_col,
        title_hit.alias("title_404"),
        body_hit.alias("body_404"),
        n_tokens.alias("n_tokens"),
        thin.alias("thin"),
        (title_hit | (body_hit & thin)).alias("is_soft404"),
    )


def soft404_body_predicate(
    text_col: str = "text",
    min_tokens: int = 30,
    head_chars: int = 200,
) -> Column:
    """Row-local soft-404 predicate over extracted TEXT alone (no
    title): error phrasing in the first `head_chars` chars AND thin
    content — the curation-funnel form of :func:`soft404_flags`
    (title-based gating belongs at the crawl layer, where the raw
    html is already on the scan; re-reading 10^12 payloads for a
    title tap would double the scan cost). Pure codegen, no join."""
    from .text import tokens_col

    body = F.coalesce(F.col(text_col), F.lit(""))
    body_hit = F.lower(F.substring(body, 1, head_chars)).rlike(SOFT404_RE)
    thin = F.size(tokens_col(body)) < min_tokens
    return body_hit & thin


def scd2_history(
    captures: DataFrame,
    key_col: str = "url",
    ts_col: str = "ts",
    digest_col: str = "digest",
) -> DataFrame:
    """Slowly-changing-dimension (type 2) compaction of a capture
    stream: per URL, collapse consecutive same-digest recrawls (a
    no-op revisit is not a new version) and emit one row per CONTENT
    version with its validity interval — the history table a recrawl
    scheduler, a diff service, and a point-in-time corpus snapshot all
    read. Returns (url, digest, valid_from_s, valid_to_s, version_n,
    is_current): epoch-second bounds (tz-proof — the epoch_sec
    discipline), valid_to_s NULL on the open current version.

    100 TB shape: everything rides ONE (url, time) sort — the
    change-detection lag, the validity lead, and the version
    row_number share the same window key, so Spark plans one Exchange;
    per-url state is the capture count, never the corpus. Same-second
    captures tie-break on digest (total order, both engines).

    Reference analog: checkpoint rotation keeps only
    checkpoints whose metric IMPROVED (reference: tools/train.py
    save-best logic) — the same collapse-no-op-transitions shape."""
    from mindocr_spark.functions.traffic import epoch_sec

    base = captures.select(
        F.col(key_col).alias("url"),
        F.col(digest_col).alias("digest"),
        epoch_sec(ts_col).cast("bigint").alias("cap_sec"),
    )
    marked = base.withColumn("prev_digest", F.lag("digest").over(
        Window.partitionBy("url").orderBy("cap_sec", "digest")
    ))
    changed = marked.where(
        F.col("prev_digest").isNull()
        | (F.col("digest") != F.col("prev_digest"))
    )
    w2 = Window.partitionBy("url").orderBy("cap_sec", "digest")
    return changed.select(
        "url",
        "digest",
        F.col("cap_sec").alias("valid_from_s"),
        F.lead("cap_sec").over(w2).alias("valid_to_s"),
        F.row_number().over(w2).cast("bigint").alias("version_n"),
        F.lead("cap_sec").over(w2).isNull().alias("is_current"),
    )


def water_fill_budget(
    demand: DataFrame, budget: tuple[int, int] = (2, 5)
) -> DataFrame:
    """Water-filling (max-min fair) crawl-budget allocation: given
    per-domain recrawl demand and a round budget = ⌊total·num/den⌋
    pages, fully satisfy every demand below the water level θ and cap
    everyone else at θ — the allocation that maximizes the minimum
    service, the standard fairness rule for shared crawl capacity
    (no domain can gain without a smaller domain losing). Integer
    remainder pages go to the capped domains first in (demand ASC,
    domain ASC) order — the same ranking the water level is computed
    over — so the budget is spent EXACTLY and deterministically.

    Returns (domain, demand, allocation, fully_satisfied) with
    Σ allocation = min(budget, Σ demand) — all-integer arithmetic,
    every boundary decided identically in both engines.

    100 TB shape: this operator runs at the ALLOCATION grain — the
    corpus-sized work (counting demand) happened upstream — but the
    rank + prefix sum go through `ranked_global` anyway (distributed
    range-partitioned sort, broadcast partition offsets), so the plan
    holds unchanged from 10^5 to 10^9 domains: no unpartitioned window
    over the domain relation anywhere; the water-level election is a
    broadcast one-row aggregate.

    Reference analog: gear batching divides a fixed device budget
    across variable-size inputs (reference: mindocr/data/layout_
    dataset.py bucketing); water-filling is that division made
    max-min fair."""
    num, den = budget
    if num < 0 or den < 1:
        raise ValueError(f"budget must be (num ≥ 0, den ≥ 1)")
    from mindocr_spark.functions.ranking import ranked_global

    t = ranked_global(
        demand.select(
            "domain", F.col("demand").cast("bigint").alias("demand")),
        ["demand", "domain"], rank_col="rn", sum_cols=("demand",),
        attach_totals=True, n_col="n", total_prefix="tot_",
    ).select(
        "domain", "demand", "rn",
        F.col("cum_demand").cast("bigint").alias("s"),
        "n",
        F.col("tot_demand").cast("bigint").alias("total"),
    )
    b = t.withColumn(
        "budget",
        F.expr(f"(total * {int(num)}) div {int(den)}").cast("bigint"),
    ).withColumn(
        "ok",
        F.col("demand") * (F.col("n") - F.col("rn") + 1)
        <= F.col("budget") - (F.col("s") - F.col("demand")),
    )
    star = b.agg(
        F.max(F.when(F.col("ok"), F.col("rn")).otherwise(0))
        .alias("kstar"),
        F.max(F.when(F.col("ok"), F.col("s")).otherwise(0))
        .alias("s_kstar"),
    )
    k = b.crossJoin(F.broadcast(star))
    n_capped = F.col("n") - F.col("kstar")
    # integer div (not floor-of-double): exact, and only evaluated on
    # capped rows where kstar < n (when-branch laziness guards ANSI)
    theta = F.expr("(budget - s_kstar) div (n - kstar)").cast("bigint")
    rem = F.col("budget") - F.col("s_kstar") - theta * n_capped
    alloc = F.when(F.col("rn") <= F.col("kstar"), F.col("demand")).otherwise(
        theta
        + ((F.col("rn") - F.col("kstar")) <= rem).cast("bigint")
    )
    return k.select(
        "domain",
        "demand",
        alloc.alias("allocation"),
        (alloc == F.col("demand")).alias("fully_satisfied"),
    )

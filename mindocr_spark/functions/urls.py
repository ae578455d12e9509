"""urls — URL canonicalization and domain analytics for web corpora.

The same document is crawled at many URL spellings: scheme variants
(http/https), case-folded hosts, ``www.`` prefixes, default ports,
tracking query parameters (``utm_*``, click ids) and fragments. A
web-scale pipeline dedups *by canonical URL* before it ever hashes
content (Common Crawl's own index is keyed this way), and reports
per-registered-domain statistics for curation decisions (domain
blocklists, per-domain caps à la C4's ``≤ N pages per domain``).

Everything here is whole-stage-codegen JVM expressions built from
regexes shared verbatim with the SQL oracle (the PII-redaction
discipline: one Python constant feeds both engines, so they cannot
drift). No UDFs, no shuffles except the domain aggregation's one
map-side-combinable groupBy.

Reference analog: `get_image_paths`' canonical path handling — one
normal form before any downstream keying (reference:
mindocr/data/utils.py and tools/infer/text/utils.py path
normalization).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F

#: Host part of an absolute URL: after ``scheme://``, up to the first
#: ``/``, ``?`` or ``#``. Plain classes/quantifiers only — identical
#: under Java regex and RE2.
URL_HOST_RE = r"^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)"
#: Path part: everything after the host up to ``?`` or ``#``.
URL_PATH_RE = r"^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)"
#: Query string (without the ``?``), up to ``#``.
URL_QUERY_RE = r"^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*[^?#]*\?([^#]*)"
#: Tracking parameters stripped during canonicalization: the
#: standard analytics/click-id families. Anchored at the parameter
#: name, matched against each ``k=v`` pair.
TRACKING_PARAM_RE = r"^(utm_[A-Za-z0-9_]*|gclid|fbclid|msclkid|ref|mc_cid|mc_eid)="
#: Registrable domain under a 2-letter ccTLD whose second-level label
#: acts as a public suffix (co.uk, com.au, ac.jp, ...). A deliberately
#: small, pinned subset of the Public Suffix List — deterministic and
#: documented, NOT a full PSL mirror.
REGDOM_CC_RE = r"([^.]+\.(co|com|net|org|ac|gov|edu)\.[A-Za-z][A-Za-z])$"
#: Fallback registrable domain: the last two host labels.
REGDOM_RE = r"([^.]+\.[^.]+)$"
#: Literal IPv4 hosts pass through registered_domain unchanged.
IPV4_HOST_RE = r"^[0-9]{1,3}(\.[0-9]{1,3}){3}$"


def normalize_host(h: Column) -> Column:
    """The ONE host normal form — lowercase, ``www.`` prefix and
    default ``:80``/``:443`` port stripped. Shared by page-side host
    extraction and blocklist-entry normalization so the two can never
    drift (an entry normalized differently from page hosts is a
    silent no-op)."""
    h = F.regexp_replace(F.lower(h), r"^www\.", "")
    return F.regexp_replace(h, r":(80|443)$", "")


def url_host(url: Column | str) -> Column:
    """Normalized host — empty string for non-absolute inputs."""
    return normalize_host(
        F.regexp_extract(F.col(url) if isinstance(url, str) else url,
                         URL_HOST_RE, 1)
    )


def registered_domain(host: Column) -> Column:
    """Registrable domain from a host: the last two labels, or the
    last THREE when a 2-letter ccTLD sits under a public second-level
    label (``news.bbc.co.uk`` → ``bbc.co.uk`` but ``a.b.example.com``
    → ``example.com``). IP hosts and single-label hosts pass through
    unchanged. Pure shared-regex extraction — the SQL oracle applies
    the same three constants, so the engines cannot drift."""
    cc = F.regexp_extract(host, REGDOM_CC_RE, 1)
    two = F.regexp_extract(host, REGDOM_RE, 1)
    return (
        F.when(host.rlike(IPV4_HOST_RE), host)
        .when(cc != "", cc)
        .when(two != "", two)
        .otherwise(host)
    )


def canonical_url(url: Column | str) -> Column:
    """Scheme-free canonical form: normalized host + path (trailing
    ``/`` stripped, bare ``/`` kept as empty) + ``?`` + the sorted,
    tracking-stripped query (omitted when nothing survives). Fragments
    never participate. Two spellings of the same page — http vs https,
    ``WWW.X.COM:443`` vs ``x.com``, reordered params, ``utm_*`` noise —
    map to one key, which is what URL-level dedup joins on."""
    c = F.col(url) if isinstance(url, str) else url
    host = url_host(c)
    path = F.regexp_replace(
        F.regexp_extract(c, URL_PATH_RE, 1), r"/$", ""
    )
    q = F.regexp_extract(c, URL_QUERY_RE, 1)
    kept = F.array_join(
        F.array_sort(
            F.filter(
                F.split(q, "&"),
                lambda p: (p != "") & ~p.rlike(TRACKING_PARAM_RE),
            )
        ),
        "&",
    )
    canon = F.concat(
        host, path,
        F.when(kept != "", F.concat(F.lit("?"), kept)).otherwise(F.lit("")),
    )
    # a non-absolute input has no host: it is its own canonical form
    # (every malformed string collapsing onto "" would falsely cluster
    # all of them as one duplicate group)
    return F.when(host == "", c).otherwise(canon)


def url_cols(df: DataFrame, url_col: str = "url") -> DataFrame:
    """Append ``host``, ``registered_domain`` and ``canonical_url`` —
    all fused into the scan's narrow stage."""
    c = F.col(url_col)
    host = url_host(c)
    return (
        df.withColumn("host", host)
        .withColumn("registered_domain", registered_domain(host))
        .withColumn("canonical_url", canonical_url(c))
    )


def url_dedup_flags(df: DataFrame, url_col: str = "url") -> DataFrame:
    """URL-level dedup: group by canonical form, keep the
    lexicographically smallest original spelling as the cluster
    representative. One map-side-combinable shuffle on the canonical
    key (uniform — it is effectively a hash of the page identity).
    Returns the input plus (canonical_url, url_cluster_size, url_rep,
    is_url_dup). Row-preserving: a NULL url has a NULL canonical key,
    which an inner join would silently drop — NULL-url rows come back
    as their own singleton non-dup instead of vanishing."""
    with_canon = url_cols(df, url_col)
    reps = with_canon.groupBy("canonical_url").agg(
        F.count(F.lit(1)).alias("url_cluster_size"),
        F.min(url_col).alias("url_rep"),
    )
    return (
        with_canon.join(reps, "canonical_url", "left")
        .withColumn(
            "url_cluster_size",
            F.coalesce(F.col("url_cluster_size"), F.lit(1)),
        )
        .withColumn("url_rep", F.coalesce("url_rep", url_col))
        .withColumn(
            "is_url_dup",
            F.coalesce(F.col(url_col) != F.col("url_rep"), F.lit(False)),
        )
    )


def domain_stats(df: DataFrame, url_col: str = "url",
                 text_col: str = "text") -> DataFrame:
    """Per-registered-domain corpus statistics: page count, distinct
    canonical URLs, total/mean text chars. The curation consumer is
    per-domain capping and blocklisting (C4 keeps ≤ N pages per
    domain; boilerplate farms show up as huge domains with tiny mean
    length). One groupBy on the domain key; the mean is ONE IEEE
    division of two exact integers (then round 6) so the oracle hash
    matches bit-for-bit."""
    parts = url_cols(df, url_col)
    return (
        parts.groupBy("registered_domain")
        .agg(
            F.count(F.lit(1)).alias("n_pages"),
            F.countDistinct("canonical_url").alias("n_canonical"),
            F.sum(F.length(text_col)).alias("total_chars"),
            F.round(
                F.sum(F.length(text_col)).cast("double")
                / F.count(F.lit(1)).cast("double"),
                6,
            ).alias("mean_chars"),
        )
    )


def domain_cap(df: DataFrame, max_pages: int, url_col: str = "url",
               n_salts: int = 16) -> DataFrame:
    """Keep at most `max_pages` DISTINCT page urls per registered
    domain — the C4-style anti-spam gate (a boilerplate farm
    contributes 10^9 URLs under one domain; uncapped, it dominates the
    corpus). Selection is deterministic: the `max_pages`
    lexicographically-smallest distinct urls per domain survive;
    ranking runs over the distinct url set, so rows sharing a url all
    carry the same rank and can never be cross-multiplied by the
    survivor join (output rows ≤ input rows always). The cap bounds
    PAGES, not fetch-rows: rows that repeat a surviving url all pass —
    run URL-level or exact dedup (curate does both downstream) to
    collapse re-fetches of the same page.

    Skew-safe two-phase top-N: a single window over the domain key
    funnels the spam farm's every page into ONE task (the classic
    hot-key straggler). Phase 1 ranks within (domain, url-hash salt) —
    the hot domain splits across `n_salts` tasks, each keeping its
    local top `max_pages`. Phase 2 re-ranks the ≤ n_salts·max_pages
    survivors per domain, a bounded relation no matter how large the
    domain. The ranking runs over a NARROW (url, domain) projection —
    full rows (document text) never pass through the window
    exchanges; survivors join back on the url key.

    Rows whose url is NULL or non-absolute (no host) are EXEMPT from
    the cap and pass through with NULL registered_domain/domain_rank:
    they cannot be attributed to any domain, and grouping them under
    one ''-pseudo-domain would silently drop all but `max_pages` of
    them (the false-cluster failure canonical_url guards against).
    Returns the capped rows plus (registered_domain, domain_rank)."""
    c = F.col(url_col)
    host = url_host(c)
    # df feeds eligible (twice: ranking scan + join-back) and exempt —
    # a caller with expensive upstream lineage should pass a PERSISTED
    # frame (curate persists pre_cap); persisting here would leak
    # cached storage for every call made outside a persist_scope
    # (the driver-contract/bench invocations).
    eligible = df.where(c.isNotNull() & (host != ""))
    exempt = (
        df.where(c.isNull() | (host == ""))
        .withColumn("registered_domain", F.lit(None).cast("string"))
        .withColumn("domain_rank", F.lit(None).cast("int"))
    )
    narrow = eligible.select(
        c.alias("__url"),
        registered_domain(url_host(c)).alias("registered_domain"),
    ).distinct()
    salted = narrow.withColumn(
        "__salt", F.pmod(F.xxhash64(F.col("__url")), F.lit(n_salts))
    )
    w1 = Window.partitionBy("registered_domain", "__salt").orderBy("__url")
    local = (
        salted.withColumn("__r1", F.row_number().over(w1))
        .where(F.col("__r1") <= max_pages)
    )
    w2 = Window.partitionBy("registered_domain").orderBy("__url")
    survivors = (
        local.withColumn("domain_rank", F.row_number().over(w2))
        .where(F.col("domain_rank") <= max_pages)
        .select("__url", "registered_domain", "domain_rank")
    )
    kept = eligible.join(
        survivors, eligible[url_col] == survivors["__url"]
    ).drop("__url")
    return kept.unionByName(exempt)


def apply_blocklist(df: DataFrame, blocked: DataFrame,
                    url_col: str = "url") -> DataFrame:
    """Drop every page matching a blocklist entry — the curation
    blocklist gate (adult/spam/malware domain lists). An entry matches
    at TWO granularities: exact normalized HOST (a hostname-level
    entry like ``evil.example.com`` blocks that host and its ``www.``
    spelling, not the whole registrable domain) and REGISTERED domain
    (a domain-level entry like ``example.net`` blocks every subdomain
    under it). Entries are normalized the same way page hosts are
    (lowercase, ``www.``/default-port strip), so mixed-case or
    www-prefixed list entries are never silent no-ops.

    Plan: two broadcast LEFT ANTI equi-joins — blocklists are small
    (10^5-10^6 rows, a few MB) against a 10^12-page scan, the textbook
    broadcast case; the big side never shuffles. (Arbitrary-depth
    wildcard entries — blocking every descendant of a SUBDOMAIN —
    would need a host-suffix explode; not implemented.)"""
    norm = normalize_host(F.trim(F.col("registered_domain")))
    b = F.broadcast(
        blocked.select(norm.alias("__blocked"))
        # a blank/whitespace line (routine in real blocklist files)
        # normalizes to '' — which would match every hostless/malformed
        # page's host='' and silently delete them all
        .where(F.col("__blocked").isNotNull() & (F.col("__blocked") != ""))
        .distinct()
    )
    parts = url_cols(df, url_col)
    by_host = parts.join(
        b, parts["host"] == b["__blocked"], "left_anti"
    )
    return (
        by_host.join(
            b, by_host["registered_domain"] == b["__blocked"], "left_anti"
        )
        .drop("host", "registered_domain", "canonical_url")
    )


def url_template_stats(df: DataFrame, url_col: str = "url") -> DataFrame:
    """URL path-TEMPLATE mining (the crawl-trap / infinite-space
    detector): every digit run in the path generalizes to ``N``, and
    URLs collapse onto (registered_domain, path_template) groups. A
    calendar trap (``/cal/2024/01/03/…``) that spawns unbounded
    distinct URLs collapses to ONE template row whose ``n_urls``
    explodes while its neighbors stay flat — the scheduler input for
    per-template crawl budgets, invisible at the per-URL or per-domain
    grain. Returns (registered_domain, path_template, n_urls,
    n_distinct_paths).

    100 TB shape: template derivation is pure codegen regex on the
    scan; the rollup is ONE groupBy on the (domain, template) key with
    map-side partials — a trap's 10^9 URLs collapse to partial counts
    before the exchange; distinct-path counting rewrites to the same
    partial-aggregate shape. No joins, no Python."""
    c = F.col(url_col)
    host = url_host(c)
    path = F.regexp_extract(c, URL_PATH_RE, 1)
    template = F.regexp_replace(path, r"[0-9]+", "N")
    return (
        df.select(
            registered_domain(host).alias("registered_domain"),
            template.alias("path_template"),
            path.alias("_p"),
        )
        .groupBy("registered_domain", "path_template")
        .agg(
            F.count(F.lit(1)).alias("n_urls"),
            F.count_distinct("_p").alias("n_distinct_paths"),
        )
    )

"""pages — build and persist the canonical `pages` input table.

Two provenances for the same `input_hint` schema
``(url string, warc_ts timestamp, html binary, text string, lang string)``:

- :func:`mindocr_spark.corpus.pages_dataframe` — the fully synthetic
  long-tailed corpus (skew tail, charsets, entities) used for golden
  fixtures and benchmarking.
- :func:`pages_from_documents` (here) — wraps the driver-provided
  ``documents`` parquet table into deterministic HTML pages **using only
  JVM-side SQL expressions** (``concat`` of literals — no Python in the
  loop), so the whole page synthesis stays inside whole-stage codegen and
  the correctness oracle can reproduce the expected extraction in ANSI
  SQL.

This mirrors the reference's dataset converters, which normalize eight
external formats into one canonical contract
(reference: tools/dataset_converters/convert.py:32-54).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

#: Fixed lead paragraph injected before the document body. Stopword-rich
#: and ≥200 chars so its node score saturates, giving the body node a
#: high-scoring neighbour under the score-smoothing pass (the FPN analog)
#: — this makes "extraction recovers anchor + body exactly" provable for
#: any body ≥150 chars, which is what the SQL oracle asserts.
PAGES_TEMPLATE_ANCHOR = (
    "This is the lead paragraph of the page and it is here so that the "
    "main content of the document has a stable neighbourhood for the "
    "score smoothing to work with and it will be part of the extracted "
    "text of every page in this corpus."
)

#: Unix seconds of 2024-01-01T00:00:00Z — warc_ts epoch for synthesized pages.
_TS_EPOCH = 1704067200


#: The documents→pages chrome, split at every variable insertion point.
#: Module-level constants (not inline literals) because TWO consumers
#: must agree on the exact bytes: the JVM concat below AND the CDX
#: oracle's SQL reconstruction (md5/length of the full page). None of
#: the pieces contains a single quote, so each embeds verbatim in a
#: SQL string literal.
CHROME_HEAD = '<!DOCTYPE html><html><head><meta charset="utf-8">'
CHROME_TITLE_OPEN = "<title>Doc "
CHROME_AFTER_TITLE = (
    "</title><style>.m{max-width:60em}</style>"
    "<script>var p=1;track();</script></head><body>"
    "<!-- synthesized page -->"
    '<header><a href="/">Home</a></header>'
    '<nav><ul><li><a href="/products">Products</a></li>'
    '<li><a href="/about">About</a></li>'
    '<li><a href="/contact">Contact</a></li></ul></nav>'
    "<main><article><p>"
)
CHROME_BODY_SEP = "</p><p>"
CHROME_BODY_CLOSE = "</p>"
CHROME_TAIL = (
    "</article></main>"
    '<aside><h3>Related</h3><ul><li><a href="/p/1">related reading one</a></li>'
    '<li><a href="/p/2">related reading two</a></li></ul></aside>'
    "<footer><p>&copy; 2024 Example Inc. "
    '<a href="/terms">Terms</a> <a href="/privacy">Privacy</a></p></footer>'
    "</body></html>"
)


def pages_html_sql_expr(extra_nodes_sql: str = "''") -> str:
    """The DuckDB SQL expression rebuilding the EXACT html string the
    plain documents→pages template synthesizes for a row of
    ``documents`` — the oracle device for whole-page digests (CDX,
    crawl deltas). `extra_nodes_sql` is a SQL expression for a variant
    family's extra content nodes (default: none)."""
    return (
        f"'{CHROME_HEAD}{CHROME_TITLE_OPEN}' || CAST(doc_id AS VARCHAR)"
        f" || '{CHROME_AFTER_TITLE}{PAGES_TEMPLATE_ANCHOR}"
        f"{CHROME_BODY_SEP}' || text || '{CHROME_BODY_CLOSE}'"
        f" || {extra_nodes_sql} || '{CHROME_TAIL}'"
    )


def _pages_from_documents_template(
    spark: SparkSession, sf_dir: str, extra_nodes: str = "",
    extra_nodes_col=None, head_extra_col=None,
) -> DataFrame:
    """Shared chrome builder for every documents→pages corpus family.
    The chrome bytes are pinned by the extraction oracles (ANCHOR_LEN /
    CHROME_CHARS invariants in __spark_entry__), so there must be
    exactly ONE copy of the template: a variant family contributes only
    `extra_nodes` (literal HTML) or `extra_nodes_col` (a per-row string
    Column — the linked family's deterministic outlink block), inserted
    after the body paragraph inside <article>, and/or `head_extra_col`
    (a per-row string Column inserted in <head> after the charset meta
    — the robots family's directive meta)."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    tail_nodes = (
        extra_nodes_col if extra_nodes_col is not None else F.lit(extra_nodes)
    )
    head_extra = head_extra_col if head_extra_col is not None else F.lit("")
    html_str = F.concat(
        F.lit('<!DOCTYPE html><html><head><meta charset="utf-8">'),
        head_extra,
        F.lit("<title>Doc "),
        F.col("doc_id").cast("string"),
        F.lit(
            "</title><style>.m{max-width:60em}</style>"
            "<script>var p=1;track();</script></head><body>"
            "<!-- synthesized page -->"
            '<header><a href="/">Home</a></header>'
            '<nav><ul><li><a href="/products">Products</a></li>'
            '<li><a href="/about">About</a></li>'
            '<li><a href="/contact">Contact</a></li></ul></nav>'
            "<main><article><p>"
        ),
        F.lit(PAGES_TEMPLATE_ANCHOR),
        F.lit("</p><p>"),
        F.col("text"),
        F.lit("</p>"),
        tail_nodes,
        F.lit(
            "</article></main>"
            '<aside><h3>Related</h3><ul><li><a href="/p/1">related reading one</a></li>'
            '<li><a href="/p/2">related reading two</a></li></ul></aside>'
            "<footer><p>&copy; 2024 Example Inc. "
            '<a href="/terms">Terms</a> <a href="/privacy">Privacy</a></p></footer>'
            "</body></html>"
        ),
    )
    return docs.select(
        F.concat(
            F.lit("https://docs.example/"),
            F.col("source"),
            F.lit("/"),
            F.col("doc_id").cast("string"),
        ).alias("url"),
        F.timestamp_seconds(F.lit(_TS_EPOCH) + F.col("doc_id")).alias("warc_ts"),
        html_str.cast("binary").alias("html"),
        F.col("text"),
        F.col("lang"),
        F.col("doc_id"),
    )


def pages_from_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents(doc_id, text, lang, ...) → pages(url, warc_ts, html, text, lang).

    The HTML template is pure chrome (header/nav/aside/footer — all
    link-dense or inside negative-ancestor tags, so every chrome node
    scores 0 under the extraction spec) around ``<p>ANCHOR</p><p>{text}</p>``.
    For bodies ≥150 normalized chars the spec provably extracts exactly
    ``ANCHOR + "\\n" + text`` (single block), giving a byte-identical SQL
    oracle on the untouched `documents` table.
    """
    return _pages_from_documents_template(spark, sf_dir)


#: The EAST-divergent template's extra content nodes (both pinned,
#: zero STOPWORDS, link-free). BUFFER (156 chars) scores raw ≈ 0.551 —
#: enough to fire (its smoothed mean stays ≥ binary_thresh even next to
#: a worst-case raw-0.2 body); TAIL (20 chars) scores raw ≈ 0.245 —
#: ABOVE raw_floor (0.12) but with smoothed ≈ (0.551+0.245+0)/3 ≈ 0.265
#: BELOW binary_thresh (0.30). The DB run detector therefore excludes
#: the tail while EAST's reach-1 proposal from the buffer claims it:
#: the two detectors provably diverge by exactly "\n" + TAIL per page.
PAGES_EAST_BUFFER = (
    "Colophon appendix errata addendum footnote marginalia glossary "
    "bibliography citation register catalogue lexicon corpus archive "
    "manuscript folio quire vellum"
)
PAGES_EAST_TAIL = "Errata slip appended"


def pages_from_documents_east(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The EAST-divergent corpus family: pages_from_documents plus two
    pinned trailing content nodes (``PAGES_EAST_BUFFER``,
    ``PAGES_EAST_TAIL``) engineered so proposal+merge detection (EAST)
    legitimately differs from threshold+run detection (DB) — EAST's
    regressed geometry claims the sub-binarization boundary node, DB
    never can. Gives `extract_east` an oracle that exercises its
    DIVERGENT behaviour instead of sharing DB's."""
    return _pages_from_documents_template(
        spark, sf_dir,
        extra_nodes=("<p>" + PAGES_EAST_BUFFER + "</p><p>"
                     + PAGES_EAST_TAIL + "</p>"),
    )


def pages_from_documents_linked(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The link-graph corpus family: every page carries a deterministic
    per-row outlink block (a mirror link on a 7-way host ring, an
    absolute archive link into the hot ``docs.example`` domain — the
    skew driver — and one extra relative link), and the page URL itself
    is spread over a 13-way host ring per source. All of it is pure
    doc_id/source arithmetic in JVM concat expressions, so the link
    graph the engine extracts from raw HTML is reproducible from the
    untouched documents table by the SQL oracle — without the oracle
    ever parsing HTML."""
    did = F.col("doc_id")
    refs = F.concat(
        F.lit('<p class="refs">See <a href="https://mirror'),
        F.pmod(did, F.lit(7)).cast("string"),
        F.lit(".example/p/"),
        F.floor(did / 2).cast("string"),
        F.lit('">mirror</a> and <a href="https://docs.example/'),
        F.col("source"),
        F.lit("/"),
        (did * 2).cast("string"),
        F.lit('">archive</a> and <a href="/p/'),
        F.pmod(did, F.lit(1000)).cast("string"),
        F.lit('">local</a>.</p>'),
    )
    pages = _pages_from_documents_template(
        spark, sf_dir, extra_nodes_col=refs
    )
    # the template's projection drops `source`; recover it from the
    # template URL (https://docs.example/{source}/{doc_id}) rather than
    # widening the shared projection every extraction oracle pins
    src = F.regexp_extract(
        F.col("url"), r"^https://docs\.example/([^/]+)/", 1
    )
    return pages.withColumn(
        "url",
        F.concat(
            F.lit("https://"),
            src,
            F.pmod(F.col("doc_id"), F.lit(13)).cast("string"),
            F.lit(".example/d/"),
            F.col("doc_id").cast("string"),
        ),
    )


def robots_wildcard_corpus(spark: SparkSession, sf_dir: str):
    """The RFC 9309 §2.2.3 wildcard-pattern corpus family:
    (pages, robots). Pages spread over 3 sites × 6 path sections
    (doc_id arithmetic); every site ships the same rule group::

        User-agent: *
        Allow: /docs/
        Disallow: /*.pdf$
        Disallow: /*notes*
        Disallow: /tmp/*/deep.html
        Disallow: /media/
        Allow: /media/*.png

    Section outcomes (closed form for the oracle): 0 /docs/…html →
    allowed (plain prefix); 1 /docs/…pdf → DISALLOWED (the anchored
    ``/*.pdf$`` at length 7 beats Allow /docs/ at 6); 2 /docs/…pdfx →
    allowed (the ``$`` anchor must NOT match); 3 /notes/… →
    disallowed (inner ``*notes*``); 4 /tmp/…/deep.html → disallowed
    (mid-pattern ``*``); 5 /media/…png → ALLOWED (the longer
    wildcard Allow beats Disallow /media/)."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    site = F.pmod(F.col("doc_id"), F.lit(3))
    n = F.col("doc_id").cast("string")
    sec = F.element_at(
        F.array(
            F.concat(F.lit("docs/page-"), n, F.lit(".html")),
            F.concat(F.lit("docs/page-"), n, F.lit(".pdf")),
            F.concat(F.lit("docs/page-"), n, F.lit(".pdfx")),
            F.concat(F.lit("notes/entry-"), n, F.lit(".html")),
            F.concat(F.lit("tmp/a-"), n, F.lit("/deep.html")),
            F.concat(F.lit("media/img-"), n, F.lit(".png")),
        ),
        (F.pmod(F.col("doc_id"), F.lit(6)) + 1).cast("int"),
    )
    pages = docs.select(
        "doc_id",
        F.concat(
            F.lit("https://wild"), site.cast("string"),
            F.lit(".example/"), sec,
        ).alias("url"),
    )
    robots = (
        spark.range(3)
        .select(
            F.concat(F.lit("wild"), F.col("id").cast("string"),
                     F.lit(".example")).alias("domain"),
            F.lit(
                "# wildcard rules\n"
                "User-agent: *\n"
                "Allow: /docs/\n"
                "Disallow: /*.pdf$\n"
                "Disallow: /*notes*\n"
                "Disallow: /tmp/*/deep.html\n"
                "Disallow: /media/\n"
                "Allow: /media/*.png\n"
            ).alias("robots_txt"),
        )
    )
    return pages, robots


def pages_from_documents_chain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The chained link-graph corpus family: each page lives on the
    13-way host ring ``{source}{doc_id%13}.example`` (the linked
    family's URL scheme) and links to the NEXT ring host
    ``{source}{(doc_id+1)%13}.example`` plus the 7-way mirror ring —
    a graph with real multi-hop structure (per-source directed
    13-cycles with mirror spokes), so BFS-depth operators have
    non-trivial levels. Pure doc_id/source arithmetic: the SQL oracle
    reproduces every edge from the untouched documents table without
    parsing HTML."""
    did = F.col("doc_id")
    refs = F.concat(
        F.lit('<p class="chain">Next <a href="https://'),
        F.col("source"),
        F.pmod(did + 1, F.lit(13)).cast("string"),
        F.lit(".example/d/"),
        did.cast("string"),
        F.lit('">next</a> via <a href="https://mirror'),
        F.pmod(did, F.lit(7)).cast("string"),
        F.lit(".example/p/"),
        F.floor(did / 2).cast("string"),
        F.lit('">mirror</a>.</p>'),
    )
    pages = _pages_from_documents_template(
        spark, sf_dir, extra_nodes_col=refs
    )
    src = F.regexp_extract(
        F.col("url"), r"^https://docs\.example/([^/]+)/", 1
    )
    return pages.withColumn(
        "url",
        F.concat(
            F.lit("https://"),
            src,
            F.pmod(F.col("doc_id"), F.lit(13)).cast("string"),
            F.lit(".example/d/"),
            F.col("doc_id").cast("string"),
        ),
    )


#: Bow-tie corpus family edge slots: doc_id % 23 picks one directed
#: edge per page (23 is coprime to the 20-way source ring, so every
#: source covers every slot once ≥23 docs exist). Labels starting with
#: ``c`` are the GLOBAL core (``core{k}.example`` — one giant SCC all
#: sources share, the Broder bow-tie shape of the real web); all other
#: labels are per-source periphery (``{source}-{label}.example``):
#: i* = IN (reach the core, unreachable from it), o* = OUT, t*/u* =
#: tendrils (hang off IN / feed OUT without touching the core),
#: b0 = the IN→OUT tube, d0/d1 = a disconnected 2-cycle.
BOWTIE_SLOTS = (
    ("c0", "c1"), ("c1", "c2"), ("c2", "c3"), ("c3", "c4"),
    ("c4", "c0"),
    ("c0", "c2"), ("c1", "c3"), ("c2", "c4"), ("c3", "c0"),
    ("c4", "c1"),
    ("i0", "c0"), ("i1", "c1"), ("i2", "i0"),
    ("c2", "o0"), ("c3", "o1"), ("o1", "o2"),
    ("i0", "t0"), ("i1", "b0"), ("b0", "o0"),
    ("u0", "o0"), ("d0", "d1"), ("d1", "d0"), ("t0", "t1"),
)


def _bowtie_domain(label: Column, source: Column) -> Column:
    """Slot label → domain: core labels are global, periphery labels
    are namespaced per source (the oracle mirrors this CASE)."""
    return F.when(
        label.startswith("c"),
        F.concat(F.lit("core"), F.substring(label, 2, 8),
                 F.lit(".example")),
    ).otherwise(
        F.concat(source, F.lit("-"), label, F.lit(".example"))
    )


def pages_from_documents_bowtie(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The bow-tie corpus family: each page contributes exactly one
    directed edge of the Broder web bow-tie — a shared 5-node core SCC
    (cycle + chords, so every core node has in- and out-degree ≥2 and
    the deterministic pivot rule lands inside the core) with per-source
    IN / OUT / tendril / tube / disconnected periphery, all drawn from
    ``BOWTIE_SLOTS[doc_id % 23]``. Pure doc_id/source arithmetic in
    JVM concat expressions, so the SQL oracle reproduces the full edge
    relation from the untouched documents table without parsing HTML."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    r = (F.pmod(F.col("doc_id"), F.lit(len(BOWTIE_SLOTS))) + 1).cast("int")
    src_l = F.element_at(
        F.array(*[F.lit(s) for s, _ in BOWTIE_SLOTS]), r)
    dst_l = F.element_at(
        F.array(*[F.lit(d) for _, d in BOWTIE_SLOTS]), r)
    src_dom = _bowtie_domain(src_l, F.col("source"))
    dst_dom = _bowtie_domain(dst_l, F.col("source"))
    did = F.col("doc_id").cast("string")
    return docs.select(
        "doc_id",
        F.concat(F.lit("https://"), src_dom, F.lit("/d/"), did)
        .alias("url"),
        F.concat(
            F.lit('<html><body><p>Edge <a href="https://'),
            dst_dom, F.lit("/d/"), did, F.lit('">ref</a>.</p></body></html>'),
        ).cast("binary").alias("html"),
    )


#: Figure-caption vocabulary: the word drawn by doc_id arithmetic into
#: alt text and captions so the SQL oracle reproduces every extracted
#: image-text pair without parsing HTML.
FIG_VOCAB = ("diagram", "chart", "photo", "map", "screenshot", "plot")


def pages_from_documents_figures(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """The figure/caption corpus family for image-text pair mining:
    every page interleaves two text halves with (1) a ``<figure>``
    block whose ``<img>`` carries a srcset (480w plus a variable
    ``240+(doc_id%5)·160``w variant — sometimes smaller, sometimes
    larger than 480, so largest-candidate selection is exercised both
    ways), an alt, and a whitespace-padded ``<figcaption>``; (2) an
    inline CDN ``<img>`` with alt only; (3) a decorative ``<img>``
    with EMPTY alt (must be dropped by the pair miner). All attribute
    values are doc_id/source arithmetic — the oracle rebuilds every
    expected pair from the untouched documents table."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    did = F.col("doc_id")
    ds = did.cast("string")
    host = F.concat(F.lit("site"), F.pmod(did, F.lit(7)).cast("string"),
                    F.lit(".example"))
    vocab = F.element_at(
        F.array(*[F.lit(v) for v in FIG_VOCAB]),
        (F.pmod(did, F.lit(6)) + 1).cast("int"))
    vocab2 = F.element_at(
        F.array(*[F.lit(v) for v in FIG_VOCAB]),
        (F.pmod(did + 1, F.lit(6)) + 1).cast("int"))
    w_var = (F.lit(240) + F.pmod(did, F.lit(5)) * 160).cast("string")
    n = F.length("text")
    q = F.floor(n / 2).cast("int")
    t1 = F.substring(F.col("text"), F.lit(1), q)
    t2 = F.substring(F.col("text"), q + 1, (n - q).cast("int"))
    figure = F.concat(
        F.lit('<figure><img src="/img/'), ds, F.lit('-full.jpg"'),
        F.lit(' srcset="/img/'), ds, F.lit('-480.jpg 480w, /img/'),
        ds, F.lit("-"), w_var, F.lit(".jpg "), w_var, F.lit('w"'),
        F.lit(' alt="'), vocab, F.lit('">'),
        F.lit("<figcaption>  Caption "), vocab, F.lit(" "), ds,
        F.lit("  </figcaption></figure>"),
    )
    inline = F.concat(
        F.lit('<img src="https://cdn'),
        F.pmod(did, F.lit(3)).cast("string"),
        F.lit(".example/t/"), ds, F.lit('.png" alt="'),
        vocab2, F.lit('">'),
    )
    decor = F.concat(
        F.lit('<img src="/decor/'), ds, F.lit('.gif" alt="">'))
    return docs.select(
        "doc_id",
        F.concat(F.lit("https://"), host, F.lit("/a/"), ds).alias("url"),
        F.concat(
            F.lit("<html><body><p>"), t1, F.lit("</p>"),
            figure,
            F.lit("<p>"), t2, F.lit("</p>"),
            inline, decor,
            F.lit("</body></html>"),
        ).cast("binary").alias("html"),
    )


#: Pinned anchor-text vocabulary for the anchored corpus family — the
#: word an inbound link *calls* its target, drawn by doc_id arithmetic
#: so the SQL oracle reproduces the full (domain, anchor) joint
#: distribution without parsing HTML.
ANCHOR_VOCAB = (
    "tutorial", "reference", "handbook", "primer",
    "manual", "roadmap", "compendium", "cookbook",
)


def pages_from_documents_anchored(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The anchor-text corpus family: every page cites two targets with
    deterministic visible anchor text — a mirror-ring link whose anchor
    is ``ANCHOR_VOCAB[doc_id % 8]`` and a hot-domain archive link whose
    anchor is ``'official ' + ANCHOR_VOCAB[(doc_id+3) % 8]`` — pure
    doc_id arithmetic in JVM concat expressions, so the inbound
    anchor-text profile the engine extracts from raw HTML is
    reproducible from the untouched documents table by the SQL
    oracle."""
    did = F.col("doc_id")
    vocab = F.array(*[F.lit(w) for w in ANCHOR_VOCAB])
    w1 = F.element_at(vocab, (F.pmod(did, F.lit(8)) + 1).cast("int"))
    w2 = F.element_at(vocab, (F.pmod(did + 3, F.lit(8)) + 1).cast("int"))
    refs = F.concat(
        F.lit('<p class="cite">Read the <a href="https://mirror'),
        F.pmod(did, F.lit(7)).cast("string"),
        F.lit(".example/p/"),
        F.floor(did / 2).cast("string"),
        F.lit('">'),
        w1,
        F.lit('</a> and the <a href="https://docs.example/'),
        F.col("source"),
        F.lit("/"),
        (did * 2).cast("string"),
        F.lit('">official '),
        w2,
        F.lit("</a>.</p>"),
    )
    return _pages_from_documents_template(
        spark, sf_dir, extra_nodes_col=refs
    )


def pages_from_documents_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The head-metadata corpus family: a deterministic quota of pages
    carries a ``<meta name="description">`` (all but doc_id ≡ 2 mod 5 —
    the miss path must be exercised) and a ``<link rel="canonical">``
    pointing ONE doc back (doc_id ≡ 1,2,3 mod 4 → doc_id−1; ≡ 0 mod 4 →
    none), so canonical chains of length 0–3 exist and the final target
    of doc d is provably ``d − d%4``. Page URLs are source-free
    (``docs.example/d/{doc_id}``) so the canonical href is row-local
    doc_id arithmetic — reproducible by the SQL oracle without HTML."""
    did = F.col("doc_id")
    desc = F.when(
        F.pmod(did, F.lit(5)) == 2, F.lit("")
    ).otherwise(
        F.concat(
            F.lit('<meta name="description" content="Document '),
            did.cast("string"),
            F.lit(" from "),
            F.col("source"),
            F.lit(" in "),
            F.col("lang"),
            F.lit('">'),
        )
    )
    canon = F.when(
        F.pmod(did, F.lit(4)) == 0, F.lit("")
    ).otherwise(
        F.concat(
            F.lit('<link rel="canonical" href="https://docs.example/d/'),
            (did - 1).cast("string"),
            F.lit('">'),
        )
    )
    pages = _pages_from_documents_template(
        spark, sf_dir, head_extra_col=F.concat(desc, canon)
    )
    return pages.withColumn(
        "url",
        F.concat(
            F.lit("https://docs.example/d/"), F.col("doc_id").cast("string")
        ),
    )


#: The snapshot family's changed-content marker node (pinned: the
#: crawl-delta oracle needs only its EXISTENCE — any byte difference
#: changes the digest).
SNAPSHOT_UPDATE_NODE = '<p class="upd">updated content</p>'


def pages_snapshots(spark: SparkSession, sf_dir: str):
    """Two crawl snapshots of the same site, derived deterministically
    from the documents table: snapshot A misses doc_id ≡ 0 (mod 11)
    (not yet discovered), snapshot B misses doc_id ≡ 0 (mod 7) (page
    gone) and carries an extra content node on doc_id ≡ 0 (mod 5)
    (page changed). Returns ``(old, new)``; the closed-form status per
    doc is: absent both ↔ 77 | 0, added ↔ 11 | 0, removed ↔ 7 | 0,
    changed ↔ 5 | 0, else same — pure arithmetic for the SQL oracle."""
    did = F.col("doc_id")
    old = _pages_from_documents_template(spark, sf_dir).where(
        F.pmod(did, F.lit(11)) != 0
    )
    upd = F.when(
        F.pmod(did, F.lit(5)) == 0, F.lit(SNAPSHOT_UPDATE_NODE)
    ).otherwise(F.lit(""))
    new = _pages_from_documents_template(
        spark, sf_dir, extra_nodes_col=upd
    ).where(F.pmod(did, F.lit(7)) != 0)
    return old, new


def pages_from_documents_robots(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The robots-directive corpus family: a deterministic quota of
    pages carries a ``<meta name="robots">`` directive — doc_id ≡ 0
    (mod 17) → ``noindex,nofollow``, ≡ 5 (mod 17) → ``nofollow``,
    ≡ 11 (mod 17) → ``all`` (an explicit opt-in that must NOT trip the
    gate) — pure doc_id arithmetic, so the SQL oracle reproduces the
    expected flags without parsing HTML."""
    m = F.pmod(F.col("doc_id"), F.lit(17))
    head = (
        F.when(m == 0, F.lit('<meta name="robots" content="noindex,nofollow">'))
        .when(m == 5, F.lit('<meta name="robots" content="nofollow">'))
        .when(m == 11, F.lit('<meta name="robots" content="all">'))
        .otherwise(F.lit(""))
    )
    return _pages_from_documents_template(spark, sf_dir, head_extra_col=head)


def read_pages(spark: SparkSession, path: str) -> DataFrame:
    """Scan the pages table. On a cluster this is
    ``spark.read.format("iceberg").load(tbl)`` with bucket(16, warc_ts) +
    bucket(64, xxhash64(url)) partition pruning; locally plain parquet —
    the plan downstream is identical (SURVEY §4)."""
    return spark.read.parquet(path)


def write_pages_partitioned(
    pages: DataFrame, path: str, ts_buckets: int = 16, url_buckets: int = 8
) -> None:
    """Persist pages with the scale-out layout from the north rule:
    partitioned by a warc_ts day bucket, salted within each partition by
    url-hash so one hot crawl-day cannot produce a straggler task.

    Iceberg's ``bucket(N, warc_ts)`` + ``bucket(M, url)`` transforms are
    emulated with explicit derived columns (parquet has no hidden
    partitioning); the physical layout — and the skew behavior — is the
    same.
    """
    (
        pages.withColumn(
            "ts_bucket", F.pmod(F.xxhash64(F.col("warc_ts")), F.lit(ts_buckets))
        )
        .repartition(ts_buckets * url_buckets,
                     F.col("ts_bucket"), F.pmod(F.xxhash64("url"), F.lit(url_buckets)))
        .write.mode("overwrite")
        .partitionBy("ts_bucket")
        .parquet(path)
    )


def robots_corpus(spark: SparkSession, sf_dir: str):
    """The robots.txt (fetch-politeness) corpus family: (pages, robots).

    Pages spread each document over 7 sites × 5 path sections by pure
    doc_id arithmetic — site = doc_id mod 7, section = element mod 5 of
    (docs, private, tmp, private/pub, media) — so the gate verdict has
    a closed form the SQL oracle reproduces without parsing anything:

    * every site's ``*`` group disallows ``/private/`` but allows the
      LONGER ``/private/pub/`` (the longest-match tiebreak is the
      load-bearing semantics being tested),
    * even sites additionally disallow ``/tmp/``,
    * sites 1 and 4 declare ``Crawl-delay: 2``,
    * site 3 carries a ``specialbot`` group disallowing everything —
      which a ``*`` evaluation must IGNORE (group attribution test),
    * site 5's robots.txt is EMPTY (no rules ⇒ everything allowed),
    * every body has a comment line and blank lines to strip.
    """
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    site = F.pmod(F.col("doc_id"), F.lit(7))
    sec = F.element_at(
        F.array(
            F.lit("docs"), F.lit("private"), F.lit("tmp"),
            F.lit("private/pub"), F.lit("media"),
        ),
        (F.pmod(F.col("doc_id"), F.lit(5)) + 1).cast("int"),
    )
    pages = docs.select(
        "doc_id",
        F.concat(
            F.lit("https://site"), site.cast("string"), F.lit(".example/"),
            sec, F.lit("/page-"), F.col("doc_id").cast("string"),
            F.lit(".html"),
        ).alias("url"),
    )
    s = F.col("site")
    robots = (
        spark.range(7)
        .select(F.col("id").alias("site"))
        .select(
            F.concat(
                F.lit("site"), s.cast("string"), F.lit(".example")
            ).alias("domain"),
            F.when(s == 5, F.lit("")).otherwise(
                F.concat(
                    F.lit("# robots for site "), s.cast("string"),
                    F.lit("\n"),
                    # Sitemap: is CROSS-GROUP (RFC 9309 §2.3) — planted
                    # BEFORE any User-agent line so group attribution
                    # must ignore it: sites ≡0 (mod 3) declare one,
                    # site 1 declares two (index + news)
                    F.when(
                        F.pmod(s, F.lit(3)) == 0,
                        F.concat(
                            F.lit("Sitemap: https://site"),
                            s.cast("string"),
                            F.lit(".example/sitemap.xml\n"),
                        ),
                    ).otherwise(F.lit("")),
                    F.when(
                        s == 1,
                        F.lit(
                            "Sitemap: https://site1.example/sitemap.xml\n"
                            "sitemap: https://site1.example/"
                            "sitemap-news.xml\n"
                        ),
                    ).otherwise(F.lit("")),
                    F.when(
                        s == 3,
                        F.lit("User-agent: specialbot\nDisallow: /\n\n"),
                    ).otherwise(F.lit("")),
                    F.lit(
                        "User-agent: *\n"
                        "Disallow: /private/\n"
                        "Allow: /private/pub/\n"
                    ),
                    F.when(
                        F.pmod(s, F.lit(2)) == 0, F.lit("Disallow: /tmp/\n")
                    ).otherwise(F.lit("")),
                    F.when(
                        (s == 1) | (s == 4), F.lit("Crawl-delay: 2\n")
                    ).otherwise(F.lit("")),
                )
            ).alias("robots_txt"),
        )
    )
    return pages, robots


def pages_from_documents_jsonld(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The structured-data corpus family: a deterministic quota of
    pages carries schema.org JSON-LD ``<script>`` blocks in <head>,
    all fields pure doc_id arithmetic so the SQL oracle states every
    extracted entity in closed form — doc_id mod 6 selects:

    * 1, 5 → one Article (headline "Doc {id}", author "Author
      {id mod 13}", datePublished 2024-01-{id mod 28 + 1}),
    * 2 → one Product (name "Product {id}", price {id mod 997}),
    * 4 → BOTH blocks, Article then Product (multi-block explode
      order is load-bearing),
    * 3 → a MALFORMED block (truncated JSON — must yield a NULL-field
      row, never an error),
    * 0 → none.

    The chrome's own ``<script>var p=1;…</script>`` sits on every page
    as a non-JSON-LD decoy the carrier regex must ignore.
    """
    did = F.col("doc_id")
    day = F.lpad((F.pmod(did, F.lit(28)) + 1).cast("string"), 2, "0")
    article = F.concat(
        F.lit('<script type="application/ld+json">'
              '{"@context":"https://schema.org","@type":"Article",'
              '"headline":"Doc '),
        did.cast("string"),
        F.lit('","author":"Author '),
        F.pmod(did, F.lit(13)).cast("string"),
        F.lit('","datePublished":"2024-01-'),
        day,
        F.lit('"}</script>'),
    )
    product = F.concat(
        F.lit('<script type="application/ld+json">'
              '{"@context":"https://schema.org","@type":"Product",'
              '"name":"Product '),
        did.cast("string"),
        F.lit('","price":'),
        F.pmod(did, F.lit(997)).cast("string"),
        F.lit("}</script>"),
    )
    malformed = F.lit(
        '<script type="application/ld+json">'
        '{"@type":"Article","headline":</script>'
    )
    m = F.pmod(did, F.lit(6))
    head = (
        F.when(m.isin(1, 5), article)
        .when(m == 2, product)
        .when(m == 3, malformed)
        .when(m == 4, F.concat(article, product))
        .otherwise(F.lit(""))
    )
    return _pages_from_documents_template(spark, sf_dir, head_extra_col=head)


def pages_from_documents_tables(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The HTML-table corpus family: a deterministic quota of pages
    carries ``<table>`` markup inside <article>, every cell pure doc_id
    arithmetic — doc_id mod 5 selects:

    * 1 → one 2-column table with a ``<th>`` header row plus two data
      rows (w{id}/{id mod 50}, x{id}/{id mod 31}),
    * 2 → TWO tables (a 1×1, then a 1-column table with a header) —
      table_idx order is load-bearing,
    * 3 → a RAGGED table (row 0 has two cells, row 1 has one — col_idx
      must not invent a phantom cell),
    * 0, 4 → none.

    The chrome's nav/aside/footer lists are the decoys the table regex
    must ignore.
    """
    did = F.col("doc_id")
    ds = did.cast("string")
    t1 = F.concat(
        F.lit("<table><tr><th>item</th><th>qty</th></tr><tr><td>w"),
        ds, F.lit("</td><td>"), F.pmod(did, F.lit(50)).cast("string"),
        F.lit("</td></tr><tr><td>x"),
        ds, F.lit("</td><td>"), F.pmod(did, F.lit(31)).cast("string"),
        F.lit("</td></tr></table>"),
    )
    t2 = F.concat(
        F.lit("<table><tr><td>solo "), ds,
        F.lit("</td></tr></table><table><tr><th>k</th></tr><tr><td>v"),
        ds, F.lit("</td></tr></table>"),
    )
    t3 = F.concat(
        F.lit("<table><tr><td>a"), ds, F.lit("</td><td>b"), ds,
        F.lit("</td></tr><tr><td>c"), ds, F.lit("</td></tr></table>"),
    )
    m = F.pmod(did, F.lit(5))
    nodes = (
        F.when(m == 1, t1)
        .when(m == 2, t2)
        .when(m == 3, t3)
        .otherwise(F.lit(""))
    )
    return _pages_from_documents_template(
        spark, sf_dir, extra_nodes_col=nodes
    )


def sitemap_corpus(spark: SparkSession, sf_dir: str):
    """The sitemap (crawl-coverage) corpus family: (pages, sitemaps).

    Pages spread over 7 sites by doc_id arithmetic (one crawled page
    per doc). Each site's sitemap.xml declares, in closed form:

    * every page whose doc_id ≢ 2 (mod 3) — so ≡ 2 pages are crawled
      but UNDECLARED — with ``lastmod`` 2024-01-{doc_id mod 28 + 1}
      (> 2024-01-01, i.e. STALE, unless doc_id ≡ 0 mod 28) and
      ``changefreq`` daily/weekly by doc_id parity,
    * a ``draft-{doc_id}.html`` entry for doc_id ≡ 7 (mod 10) that was
      never crawled (UNCRAWLED), lastmod 2024-02-01, monthly.

    The XML is assembled per site with one groupBy + sorted
    concat (corpus construction, not the operator under test); every
    field is doc_id arithmetic so the SQL oracle states the parsed
    relation and the coverage verdicts without touching XML.
    """
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    did = F.col("doc_id")
    site = F.pmod(did, F.lit(7))
    page_url = F.concat(
        F.lit("https://site"), site.cast("string"),
        F.lit(".example/page-"), did.cast("string"), F.lit(".html"),
    )
    pages = docs.select("doc_id", page_url.alias("url"))
    day = F.lpad((F.pmod(did, F.lit(28)) + 1).cast("string"), 2, "0")
    page_entry = F.when(
        F.pmod(did, F.lit(3)) != 2,
        F.concat(
            F.lit("<url><loc>"), page_url,
            F.lit("</loc><lastmod>2024-01-"), day,
            F.lit("</lastmod><changefreq>"),
            F.when(F.pmod(did, F.lit(2)) == 0, F.lit("daily"))
            .otherwise(F.lit("weekly")),
            F.lit("</changefreq></url>"),
        ),
    )
    draft_entry = F.when(
        F.pmod(did, F.lit(10)) == 7,
        F.concat(
            F.lit("<url><loc>https://site"), site.cast("string"),
            F.lit(".example/draft-"), did.cast("string"),
            F.lit(".html</loc><lastmod>2024-02-01</lastmod>"
                  "<changefreq>monthly</changefreq></url>"),
        ),
    )
    entries = docs.select(
        site.alias("site"),
        F.explode(
            F.filter(
                F.array(page_entry, draft_entry),
                lambda x: x.isNotNull(),
            )
        ).alias("entry"),
    )
    sitemaps = (
        entries.groupBy("site")
        .agg(
            F.concat(
                F.lit('<?xml version="1.0"?><urlset>'),
                F.concat_ws(
                    "", F.sort_array(F.collect_list("entry"))
                ),
                F.lit("</urlset>"),
            ).alias("sitemap_xml")
        )
        .select(
            F.concat(
                F.lit("site"), F.col("site").cast("string"),
                F.lit(".example"),
            ).alias("domain"),
            "sitemap_xml",
        )
    )
    return pages, sitemaps


def sitemap_index_corpus(spark: SparkSession, sf_dir: str):
    """The sitemapindex (nesting) corpus family: (indexes, fetched).

    5 sites (doc_id mod 5). Every site's index declares ``part-a.xml``
    and ``part-b.xml`` (both present in the fetched table); ODD sites
    also declare ``news.xml`` which was never fetched (the
    missing-child arm). Child urlset bodies split the site's docs by
    parity — part-a holds even doc_ids, part-b odd — one entry per
    doc: loc ``p-{doc_id}.html``, lastmod 2024-03-{doc_id%28+1},
    changefreq daily/weekly by doc_id mod 4 < 2. All doc_id
    arithmetic: the SQL oracle states the resolved relation without
    touching XML."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    did = F.col("doc_id")
    site = F.pmod(did, F.lit(5))
    part = F.when(F.pmod(did, F.lit(2)) == 0, F.lit("part-a.xml")) \
        .otherwise(F.lit("part-b.xml"))
    day = F.lpad((F.pmod(did, F.lit(28)) + 1).cast("string"), 2, "0")
    entry = F.concat(
        F.lit("<url><loc>https://smi"), site.cast("string"),
        F.lit(".example/p-"), did.cast("string"),
        F.lit(".html</loc><lastmod>2024-03-"), day,
        F.lit("</lastmod><changefreq>"),
        F.when(F.pmod(did, F.lit(4)) < 2, F.lit("daily"))
        .otherwise(F.lit("weekly")),
        F.lit("</changefreq></url>"),
    )
    child_url = F.concat(
        F.lit("https://smi"), site.cast("string"), F.lit(".example/"),
        part,
    )
    fetched = (
        docs.select(child_url.alias("sitemap_url"), entry.alias("entry"))
        .groupBy("sitemap_url")
        .agg(
            F.concat(
                F.lit('<?xml version="1.0"?><urlset>'),
                F.concat_ws("", F.sort_array(F.collect_list("entry"))),
                F.lit("</urlset>"),
            ).alias("sitemap_xml")
        )
    )
    s = F.col("id")
    indexes = (
        spark.range(5)
        .select(
            F.concat(F.lit("smi"), s.cast("string"), F.lit(".example"))
            .alias("domain"),
            F.concat(
                F.lit('<?xml version="1.0"?><sitemapindex>'
                      "<sitemap><loc>https://smi"),
                s.cast("string"),
                F.lit(".example/part-a.xml</loc></sitemap>"
                      "<sitemap><loc>https://smi"),
                s.cast("string"),
                F.lit(".example/part-b.xml</loc></sitemap>"),
                F.when(
                    F.pmod(s, F.lit(2)) == 1,
                    F.concat(
                        F.lit("<sitemap><loc>https://smi"),
                        s.cast("string"),
                        F.lit(".example/news.xml</loc></sitemap>"),
                    ),
                ).otherwise(F.lit("")),
                F.lit("</sitemapindex>"),
            ).alias("sitemap_xml"),
        )
    )
    return indexes, fetched


def feed_corpus(spark: SparkSession, sf_dir: str):
    """The RSS/Atom feed (discovery) corpus family: (pages, feeds).

    Pages spread over 6 blogs by doc_id arithmetic (one crawled page
    per doc: ``page-{doc_id}.html``). Each blog publishes a feed —
    EVEN sites RSS 2.0, ODD sites Atom — with one item per doc, in
    closed form:

    * link: ``page-{doc_id}.html`` for doc_id ≡ 0 (mod 4) (already
      crawled — feed_discovery must exclude it), else
      ``post-{doc_id}.html`` (new — a discovery candidate),
    * title ``Post {doc_id}``, OMITTED when doc_id ≡ 5 (mod 13)
      (optional-field → NULL arm),
    * date: day = doc_id mod 28 + 1, month = doc_id mod 12 (exercises
      the full RFC-822 month-name map) — RSS as
      ``Mon, dd Mon 2024 06:00:00 GMT``, Atom as ISO
      ``2024-mm-ddT06:00:00Z``; OMITTED when doc_id ≡ 3 (mod 17).

    Every field is doc_id arithmetic, so the SQL oracle states the
    parsed relation and the discovery set without touching XML.
    """
    # the parser's pinned month table — shared so corpus and parser
    # cannot drift
    from mindocr_spark.functions.crawl import _MONTHS as months

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    did = F.col("doc_id")
    site = F.pmod(did, F.lit(6))
    domain = F.concat(F.lit("blog"), site.cast("string"),
                      F.lit(".example"))
    base = F.concat(F.lit("https://"), domain, F.lit("/"))
    link = F.concat(
        base,
        F.when(did % 4 == 0, F.lit("page-")).otherwise(F.lit("post-")),
        did.cast("string"), F.lit(".html"),
    )
    pages = docs.select(
        "doc_id",
        F.concat(base, F.lit("page-"), did.cast("string"),
                 F.lit(".html")).alias("url"),
    )
    dd = F.lpad((F.pmod(did, F.lit(28)) + 1).cast("string"), 2, "0")
    mon_i = F.pmod(did, F.lit(12))
    mon_name = F.element_at(
        F.array(*[F.lit(m) for m in months]), (mon_i + 1).cast("int")
    )
    mm = F.lpad((mon_i + 1).cast("string"), 2, "0")
    has_title = ~(did % 13 == 5)
    has_date = ~(did % 17 == 3)
    title_rss = F.when(
        has_title,
        F.concat(F.lit("<title>Post "), did.cast("string"),
                 F.lit("</title>")),
    ).otherwise(F.lit(""))
    rss_entry = F.concat(
        F.lit("<item>"), title_rss,
        F.lit("<link>"), link, F.lit("</link>"),
        F.when(
            has_date,
            F.concat(F.lit("<pubDate>Mon, "), dd, F.lit(" "), mon_name,
                     F.lit(" 2024 06:00:00 GMT</pubDate>")),
        ).otherwise(F.lit("")),
        F.lit("</item>"),
    )
    atom_entry = F.concat(
        F.lit("<entry>"), title_rss,
        F.lit('<link href="'), link, F.lit('"/>'),
        F.when(
            has_date,
            F.concat(F.lit("<updated>2024-"), mm, F.lit("-"), dd,
                     F.lit("T06:00:00Z</updated>")),
        ).otherwise(F.lit("")),
        F.lit("</entry>"),
    )
    entries = docs.select(
        site.alias("site"),
        F.when(site % 2 == 0, rss_entry).otherwise(atom_entry)
        .alias("entry"),
    )
    feeds = (
        entries.groupBy("site")
        .agg(
            F.concat_ws(
                "", F.sort_array(F.collect_list("entry"))
            ).alias("body")
        )
        .select(
            F.concat(F.lit("blog"), F.col("site").cast("string"),
                     F.lit(".example")).alias("domain"),
            F.when(
                F.col("site") % 2 == 0,
                F.concat(
                    F.lit('<?xml version="1.0"?><rss version="2.0">'
                          "<channel>"),
                    F.col("body"), F.lit("</channel></rss>"),
                ),
            )
            .otherwise(
                F.concat(
                    F.lit('<feed xmlns="http://www.w3.org/2005/Atom">'),
                    F.col("body"), F.lit("</feed>"),
                )
            )
            .alias("feed_xml"),
        )
    )
    return pages, feeds


#: Structural variants for the template-cluster family — literal extra
#: nodes (no per-doc interpolation: the SIGNATURE must depend on
#: structure only). Shared constants: the Spark builder and the SQL
#: oracle must emit identical bytes. None contains a single quote.
TEMPLATE_VARIANTS = (
    "",
    "<div><p>promo offer</p></div>",
    "<table><tr><td>spec</td></tr></table>",
    "<ul><li>one</li><li>two</li></ul>",
)


def pages_from_documents_variants(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """The template-cluster corpus family: doc_id mod 4 selects one of
    four structural variants (plain chrome, a promo <div>, a spec
    <table>, a list <ul>) inserted after the body paragraph — four
    distinct page TEMPLATES over identical chrome, so the structural
    signature must recover exactly four clusters with closed-form
    sizes while the per-page text differs everywhere."""
    m = F.pmod(F.col("doc_id"), F.lit(4))
    extra = (
        F.when(m == 1, F.lit(TEMPLATE_VARIANTS[1]))
        .when(m == 2, F.lit(TEMPLATE_VARIANTS[2]))
        .when(m == 3, F.lit(TEMPLATE_VARIANTS[3]))
        .otherwise(F.lit(TEMPLATE_VARIANTS[0]))
    )
    return _pages_from_documents_template(spark, sf_dir, extra_nodes_col=extra)


def hreflang_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The hreflang (language-edition) corpus family: documents are
    grouped into editions of 3 consecutive doc_ids (grp = doc_id div 3;
    the final group may be ragged). Every DECLARING member (doc_id ≢ 0
    mod 7 — ≡ 0 pages omit their <link> block entirely, the classic
    broken-reciprocity error) emits in <head>, in member order, one
    ``<link rel="alternate" hreflang="{lang_m}" href=".../d/{m}">`` per
    group member m (self included — the spec's self-referencing link)
    plus one ``x-default`` link to the group head (min doc_id). Because
    documents.lang has few values, some groups repeat a lang across
    members — the real-world "conflicting hreflang" error the operator
    must surface. All planting is doc_id/lang arithmetic, so the SQL
    oracle restates the cluster verdicts from the documents table
    without parsing HTML.

    Corpus construction (not the operator under test) is one groupBy
    on grp + a sorted HOF fold; the join back to documents broadcasts
    nothing and shuffles once on grp.
    """
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    did = F.col("doc_id")
    grp = docs.select(
        "doc_id", "lang", "text", F.expr("doc_id div 3").alias("grp")
    )
    members = grp.groupBy("grp").agg(
        F.sort_array(
            F.collect_list(F.struct("doc_id", "lang"))
        ).alias("mem"),
        F.min("doc_id").alias("head_doc"),
    )
    link_block = F.concat(
        F.aggregate(
            F.col("mem"),
            F.lit(""),
            lambda acc, x: F.concat(
                acc,
                F.lit('<link rel="alternate" hreflang="'),
                x["lang"],
                F.lit('" href="https://docs.example/d/'),
                x["doc_id"].cast("string"),
                F.lit('">'),
            ),
        ),
        F.lit('<link rel="alternate" hreflang="x-default"'
              ' href="https://docs.example/d/'),
        F.col("head_doc").cast("string"),
        F.lit('">'),
    )
    joined = grp.join(
        members.select("grp", link_block.alias("links")), "grp"
    )
    head_links = F.when(
        F.pmod(did, F.lit(7)) == 0, F.lit("")
    ).otherwise(F.col("links"))
    html_str = F.concat(
        F.lit('<!DOCTYPE html><html><head><meta charset="utf-8">'),
        head_links,
        F.lit("<title>Doc "),
        did.cast("string"),
        F.lit("</title></head><body><p>"),
        F.col("text"),
        F.lit("</p></body></html>"),
    )
    return joined.select(
        F.concat(
            F.lit("https://docs.example/d/"), did.cast("string")
        ).alias("url"),
        html_str.cast("binary").alias("html"),
        "doc_id",
    )


#: The cloaking family's stuffed description (shared constant — the
#: oracle splits the identical bytes). All words outside the corpus
#: vocabulary so a cloaked page's overlap is genuinely zero.
CLOAK_SPAM_DESC = "casino pills crack keygen torrent warez"


def pages_from_documents_cloak(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The meta-divergence (cloaking / SEO-stuffing) corpus family:
    honest pages (the default) declare a ``<meta name="description">``
    equal to their body's first 5 normalized tokens; doc_id ≡ 4
    (mod 6) pages declare the stuffed CLOAK_SPAM_DESC instead (what
    they show crawlers ≠ what they serve); ≡ 5 (mod 6) pages declare
    no description at all (the no-evidence path). Pure row-local
    arithmetic over the row's own text — the SQL oracle replants it
    verbatim."""
    from mindocr_spark.functions.text import WS_CLASS

    did = F.col("doc_id")
    toks = F.split(
        F.trim(F.regexp_replace(F.col("text"), WS_CLASS, " ")), " "
    )
    honest = F.array_join(F.slice(toks, 1, 5), " ")
    desc = (
        F.when(F.pmod(did, F.lit(6)) == 4, F.lit(CLOAK_SPAM_DESC))
        .when(F.pmod(did, F.lit(6)) == 5, F.lit(None).cast("string"))
        .otherwise(honest)
    )
    head_extra = F.when(
        desc.isNull(), F.lit("")
    ).otherwise(
        F.concat(
            F.lit('<meta name="description" content="'),
            desc,
            F.lit('">'),
        )
    )
    return _pages_from_documents_template(
        spark, sf_dir, head_extra_col=head_extra
    )

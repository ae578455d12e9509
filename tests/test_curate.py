"""End-to-end curation pipeline: planted duplicates and junk removed."""

import pytest

from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def raw_pages(spark):
    from mindocr_spark.corpus import generate_batch, PAGES_SCHEMA_DDL

    rows = generate_batch(42, range(60))
    # plant an exact duplicate (same html, different url) and a near-dup
    dup = dict(rows[3], url="https://dup.example/exact")
    near = dict(rows[5], url="https://dup.example/near")
    near["html"] = rows[5]["html"].replace(b"the", b"thy", 1)
    junk = dict(rows[7], url="https://dup.example/junk",
                html=b"<html><body><nav><a href='/'>x</a></nav></body></html>",
                text="")
    return spark.createDataFrame(rows + [dup, near, junk], PAGES_SCHEMA_DDL)


def test_curate_funnel(spark, raw_pages):
    from mindocr_spark.curate import CurateConfig, curate

    curated, funnel = curate(raw_pages, CurateConfig(min_chars=50))
    stages = {r["stage"]: r["docs"] for r in funnel.collect()}
    assert stages["input"] == 63
    assert stages["extracted_ok"] < stages["input"]      # junk page dropped
    assert stages["exact_dedup"] < stages["lang_quality"]  # exact dup removed
    assert stages["near_dedup"] <= stages["exact_dedup"]

    urls = {r["url"] for r in curated.collect()}
    # of the exact pair, exactly one survives
    orig3 = [u for u in urls if u.endswith("/p/3")]
    assert (("https://dup.example/exact" in urls) + bool(orig3)) == 1
    assert "https://dup.example/junk" not in urls


def test_curate_near_dup_removed(spark, raw_pages):
    from mindocr_spark.curate import CurateConfig, curate

    curated, _ = curate(raw_pages, CurateConfig(min_chars=50,
                                                neardup_threshold=0.5))
    urls = {r["url"] for r in curated.collect()}
    orig5 = [u for u in urls if u.endswith("/p/5")]
    # near-dup pair collapsed to one survivor
    assert (("https://dup.example/near" in urls) + bool(orig5)) == 1


def test_curate_build_is_lazy(spark, raw_pages, monkeypatch):
    """Building the pipeline (including the funnel) must trigger ZERO
    Spark actions — counts/collects during plan construction were a 5×
    eager-job cost at build time."""
    from pyspark.sql import DataFrame
    from mindocr_spark.curate import CurateConfig, curate

    def boom(name):
        def _fail(self, *a, **kw):
            raise AssertionError(f"eager {name}() during curate build")
        return _fail

    for action in ("count", "collect", "toPandas", "toLocalIterator"):
        monkeypatch.setattr(DataFrame, action, boom(action))
    curated, funnel = curate(raw_pages, CurateConfig(min_chars=50))
    # both results are plain lazy DataFrames
    assert curated.columns == ["url", "text", "lang_pred", "n_chars"]
    assert funnel.columns == ["stage_idx", "stage", "docs"]


def test_curate_scoped_unpersists(spark, raw_pages):
    from mindocr_spark.curate import CurateConfig, curate, curate_scoped

    def n_cached():
        return len(spark.sparkContext._jsc.sc().getRDDStorageInfo())

    # a plan DISTINCT from every other test's (Spark's CacheManager is
    # keyed by logical plan — identical plans share cache entries, so an
    # unpersist here would otherwise release a neighbouring test's cache)
    pages = raw_pages.where("url NOT LIKE '%/junk'")
    before = n_cached()
    with curate_scoped(pages, CurateConfig(min_chars=50)) as (curated, funnel):
        stages = {r["stage"]: r["docs"] for r in funnel.collect()}
        assert stages["input"] == 62
        assert n_cached() > before          # intermediates were cached
    assert n_cached() == before             # ...and released on exit

    # the _track hook gives manual callers the same handle
    track = []
    pages2 = raw_pages.where("url NOT LIKE '%/near'")
    _c, funnel2 = curate(pages2, CurateConfig(min_chars=50), _track=track)
    funnel2.collect()
    assert track and all(df.is_cached for df in track)
    for df in track:
        df.unpersist()
    assert n_cached() == before


def test_curate_inside_ambient_persist_scope(spark, raw_pages):
    """curate() without _track must hand its nested persists to an
    ambient persist_scope, not swallow them into a throwaway list."""
    from mindocr_spark.cache import persist_scope
    from mindocr_spark.curate import CurateConfig, curate

    def n_cached():
        return len(spark.sparkContext._jsc.sc().getRDDStorageInfo())

    pages = raw_pages.where("url NOT LIKE '%/exact'")  # distinct plan
    before = n_cached()
    with persist_scope():
        _curated, funnel = curate(pages, CurateConfig(min_chars=50))
        funnel.collect()
        assert n_cached() > before
    assert n_cached() == before


def test_curate_lang_filter(spark, raw_pages):
    from mindocr_spark.curate import CurateConfig, curate

    curated, _ = curate(raw_pages, CurateConfig(min_chars=50, langs=("en",)))
    assert {r["lang_pred"] for r in curated.collect()} == {"en"}


def test_repetition_signal_functions(spark):
    """Unit semantics of the Gopher/C4 repetition signals on planted
    docs — exact expected values."""
    from mindocr_spark.functions.text import (
        repetition_line_cols,
        top_2gram_cols,
    )

    docs = spark.createDataFrame(
        [(1, "good unique line one\nanother fine line\nthird line"),
         (2, "same line\nsame line\nsame line\nsame line"),
         (3, "@ # @ @ # @ @ #"),
         (4, "spam spam spam spam spam spam spam spam"),
         (5, "ends with dots...\nplain line")],
        "doc_id bigint, text string")
    rep = {r["doc_id"]: r for r in repetition_line_cols(docs).collect()}
    assert rep[1]["dup_line_frac"] == 0.0
    assert rep[2]["dup_line_frac"] == 0.75          # 3 of 4 lines repeats
    assert rep[3]["symbol_word_ratio"] == 1.0       # 8 symbols / 8 tokens
    assert rep[5]["n_ellipsis_lines"] == 1
    top = {r["doc_id"]: r for r in top_2gram_cols(docs).collect()}
    assert top[4]["top_2gram"] == "spam spam"
    assert top[4]["top_2gram_freq"] == 7
    # 7 repeats × 9 chars over 39 normalized chars
    assert top[4]["top_2gram_share"] == round(7 * 9 / 39, 6)
    # < 2 tokens ⇒ sentinel values, not NULLs
    one = spark.createDataFrame([(9, "single")], "doc_id bigint, text string")
    t9 = top_2gram_cols(one).collect()[0]
    assert (t9["top_2gram"], t9["top_2gram_freq"], t9["top_2gram_share"]) \
        == ("", 0, 0.0)


def test_curate_repetition_gates(spark):
    """Planted repetitive pages are removed by the CurateConfig
    repetition gates and survive without them."""
    from mindocr_spark.corpus import generate_batch, PAGES_SCHEMA_DDL
    from mindocr_spark.curate import CurateConfig, curate

    rows = generate_batch(7, range(20))
    para = ("the quick brown fox jumps over the lazy dog near the "
            "river bend today")
    rep_html = ("<html><body><h1>Repetitive page title here</h1>"
                + f"<p>{para}</p>" * 8 + "</body></html>").encode()
    spam_html = ("<html><body><h1>Spam title words</h1><p>"
                 + "buy now " * 60 + "</p></body></html>").encode()
    planted = [
        dict(rows[0], url="https://bad.example/rep", html=rep_html, text=""),
        dict(rows[1], url="https://bad.example/spam", html=spam_html,
             text=""),
    ]
    pages = spark.createDataFrame(rows + planted, PAGES_SCHEMA_DDL)

    open_cfg = CurateConfig(min_chars=50, neardup_threshold=2.0)
    urls_open = {r["url"] for r in curate(pages, open_cfg)[0].collect()}
    assert {"https://bad.example/rep", "https://bad.example/spam"} <= urls_open

    gated = CurateConfig(
        min_chars=50, neardup_threshold=2.0,
        max_dup_line_frac=0.5, max_top2gram_share=0.3,
    )
    urls_gated = {r["url"] for r in curate(pages, gated)[0].collect()}
    assert "https://bad.example/rep" not in urls_gated     # dup-line gate
    assert "https://bad.example/spam" not in urls_gated    # top-2gram gate
    # every OTHER removed page must genuinely exceed a gate threshold
    # (organic word-soup pages can legitimately trip the 2-gram gate)
    removed = urls_open - urls_gated
    assert {"https://bad.example/rep", "https://bad.example/spam"} <= removed
    others = removed - {"https://bad.example/rep", "https://bad.example/spam"}
    if others:
        from mindocr_spark.functions.text import (
            repetition_line_cols,
            top_2gram_cols,
        )

        curated_open, _ = curate(pages, open_cfg)
        texts = curated_open.where(F.col("url").isin(*others)).select(
            "url", "text"
        )
        sig = {
            r["url"]: r
            for r in repetition_line_cols(texts, id_col="url")
            .join(top_2gram_cols(texts, id_col="url"), "url")
            .collect()
        }
        for u in others:
            assert (sig[u]["dup_line_frac"] > 0.5
                    or sig[u]["top_2gram_share"] > 0.3), (u, sig[u])


def test_curate_paragraph_dedup_gate(spark):
    """dedup_paragraphs strips a cross-page boilerplate paragraph
    everywhere but its first (url, position) occurrence, while each
    page's unique content survives."""
    from mindocr_spark.corpus import generate_batch, PAGES_SCHEMA_DDL
    from mindocr_spark.curate import CurateConfig, curate

    rows = generate_batch(11, range(20))
    boiler = ("subscribe to the village newsletter for weekly updates "
              "about ferret husbandry and competitive cheese rolling")
    uniq = {
        "a": ("completely unique first page content about medieval "
              "aqueduct engineering and its maintenance guilds"),
        "b": ("another entirely unique page describing antarctic "
              "lichen photography expeditions in great detail"),
    }

    def page(tag):
        html = (f"<html><body><article><p>{uniq[tag]}</p>"
                f"<p>{boiler}</p></article></body></html>").encode()
        return dict(rows[0], url=f"https://bp.example/{tag}", html=html,
                    text="")

    pages = spark.createDataFrame(
        rows + [page("a"), page("b")], PAGES_SCHEMA_DDL
    )
    base = dict(min_chars=50, neardup_threshold=2.0)

    texts = {r["url"]: r["text"] for r in
             curate(pages, CurateConfig(**base))[0].collect()}
    assert boiler in texts["https://bp.example/a"]
    assert boiler in texts["https://bp.example/b"]  # gate off: kept twice

    texts = {r["url"]: r["text"] for r in
             curate(pages, CurateConfig(**base, dedup_paragraphs=True))[0]
             .collect()}
    assert boiler in texts["https://bp.example/a"]      # first occurrence
    assert boiler not in texts["https://bp.example/b"]  # deduped away
    assert uniq["a"] in texts["https://bp.example/a"]
    assert uniq["b"] in texts["https://bp.example/b"]


def test_curate_neardup_transitive(spark, raw_pages):
    """neardup_transitive collapses each near-dup component to its min
    url: the planted near pair still yields exactly one survivor, and
    transitive survivors are a subset of the pairwise run's (component
    collapse can only drop more — a chain member that is only ever the
    smaller side of its pairs escapes the pairwise rule but not this
    one)."""
    from mindocr_spark.curate import CurateConfig, curate

    pw, _ = curate(raw_pages, CurateConfig(min_chars=50,
                                           neardup_threshold=0.5))
    tr, _ = curate(raw_pages, CurateConfig(min_chars=50,
                                           neardup_threshold=0.5,
                                           neardup_transitive=True))
    pw_urls = {r["url"] for r in pw.collect()}
    tr_urls = {r["url"] for r in tr.collect()}
    assert tr_urls <= pw_urls
    orig5 = [u for u in tr_urls if u.endswith("/p/5")]
    assert (("https://dup.example/near" in tr_urls) + bool(orig5)) == 1


def test_curate_nfc_normalize_collapses_encoding_twins(spark):
    """Two pages whose extracted text differs ONLY in composed vs
    decomposed encodings of the same glyphs are distinct byte strings
    to exact dedup — with nfc_normalize on, they canonicalize to the
    same bytes and collapse to one survivor."""
    from mindocr_spark.corpus import generate_batch, PAGES_SCHEMA_DDL
    from mindocr_spark.curate import CurateConfig, curate

    rows = generate_batch(13, range(20))
    body = ("the café on the corner serves excellent petit "
            "déjeuner to its loyal visitors every single morning")
    decomposed = body.replace("é", "é")

    def page(tag, text):
        html = (f"<html><body><article><p>{text}</p>"
                f"</article></body></html>").encode()
        return dict(rows[0], url=f"https://nfc.example/{tag}", html=html,
                    text="")

    pages = spark.createDataFrame(
        rows + [page("composed", body), page("decomposed", decomposed)],
        PAGES_SCHEMA_DDL,
    )
    base = dict(min_chars=50, neardup_threshold=2.0)

    off = {r["url"] for r in curate(pages, CurateConfig(**base))[0]
           .collect()}
    assert {"https://nfc.example/composed",
            "https://nfc.example/decomposed"} <= off  # distinct bytes

    on = {r["url"] for r in
          curate(pages, CurateConfig(**base, nfc_normalize=True))[0]
          .collect()}
    assert len(on & {"https://nfc.example/composed",
                     "https://nfc.example/decomposed"}) == 1


def test_curate_blockword_gate(spark):
    """A planted badword page drops when blockwords are configured and
    survives otherwise; whole-word semantics protect substrings."""
    from mindocr_spark.corpus import generate_batch, PAGES_SCHEMA_DDL
    from mindocr_spark.curate import CurateConfig, curate

    rows = generate_batch(11, range(15))
    filler = ("the quick brown fox jumps over the lazy dog and then "
              "walks along the river for a while before resting ")
    bad_html = ("<html><body><h1>Gambling page</h1><p>"
                + filler + "visit our casino for jackpot wins "
                + filler + "</p></body></html>").encode()
    sub_html = ("<html><body><h1>Linguistics page</h1><p>"
                + filler + "the word casinos is plural here "
                + filler + "</p></body></html>").encode()
    planted = [
        dict(rows[0], url="https://bad.example/gamble", html=bad_html,
             text=""),
        dict(rows[1], url="https://ok.example/plural", html=sub_html,
             text=""),
    ]
    pages = spark.createDataFrame(rows + planted, PAGES_SCHEMA_DDL)

    open_cfg = CurateConfig(min_chars=50, neardup_threshold=2.0)
    urls_open = {r["url"] for r in curate(pages, open_cfg)[0].collect()}
    assert "https://bad.example/gamble" in urls_open

    gated = CurateConfig(
        min_chars=50, neardup_threshold=2.0,
        blockwords=("casino", "jackpot"),
    )
    urls_gated = {r["url"] for r in curate(pages, gated)[0].collect()}
    assert "https://bad.example/gamble" not in urls_gated
    # whole-word: 'casinos' must NOT trip the 'casino' entry
    assert "https://ok.example/plural" in urls_gated
    # and nothing else is affected by the gate
    assert urls_open - urls_gated == {"https://bad.example/gamble"}


def test_curate_classifier_gate(spark):
    """An injected all-negative weight table drops everything; the
    stub table with a low threshold keeps the corpus — the model gate
    plumbing is real and the weights are the seam."""
    from mindocr_spark.corpus import generate_batch, PAGES_SCHEMA_DDL
    from mindocr_spark.curate import CurateConfig, curate
    from mindocr_spark.functions.classifier import N_BUCKETS

    pages = spark.createDataFrame(
        generate_batch(13, range(12)), PAGES_SCHEMA_DDL
    )
    open_cfg = CurateConfig(min_chars=50, neardup_threshold=2.0)
    n_open = curate(pages, open_cfg)[0].count()
    assert n_open > 0

    neg = tuple((format(i, "02x"), "-1.000") for i in range(N_BUCKETS))
    nuked = CurateConfig(
        min_chars=50, neardup_threshold=2.0,
        min_classifier_score=0.0, classifier_weights=neg,
    )
    assert curate(pages, nuked)[0].count() == 0

    lenient = CurateConfig(
        min_chars=50, neardup_threshold=2.0,
        min_classifier_score=-10.0,
    )
    assert curate(pages, lenient)[0].count() == n_open


def test_curate_lm_perplexity_gate(spark):
    """A word-soup page scores higher logppl against the batch's own
    English LM than organic pages and drops first as the bound
    tightens."""
    from pyspark.sql import functions as F
    from mindocr_spark.corpus import generate_batch, PAGES_SCHEMA_DDL
    from mindocr_spark.curate import CurateConfig, curate

    rows = generate_batch(17, range(15))
    soup = ("<html><body><h1>Gibberish page title</h1><p>"
            + " ".join(f"zqxj{i}w" for i in range(80))
            + "</p></body></html>").encode()
    planted = [dict(rows[0], url="https://bad.example/soup", html=soup,
                    text="")]
    pages = spark.createDataFrame(rows + planted, PAGES_SCHEMA_DDL)

    open_cfg = CurateConfig(min_chars=50, neardup_threshold=2.0)
    open_out, _ = curate(pages, open_cfg)
    assert open_out.where(
        F.col("url") == "https://bad.example/soup"
    ).count() == 1

    gated = CurateConfig(
        min_chars=50, neardup_threshold=2.0, max_lm_logppl=7.5,
    )
    kept, _ = curate(pages, gated)
    urls = {r["url"] for r in kept.collect()}
    assert "https://bad.example/soup" not in urls
    assert len(urls) > 0  # organic pages survive the bound


def test_curate_respects_robots_noindex(spark):
    from pyspark.sql import functions as F
    from mindocr_spark.corpus import generate_batch, PAGES_SCHEMA_DDL
    from mindocr_spark.curate import CurateConfig, curate

    rows = generate_batch(19, range(10))
    body = ("<p>" + "the quick brown fox jumps over the lazy dog and "
            "keeps going down the long road for quite a while now " * 3
            + "</p>")
    noidx = ("<html><head><meta name=\"robots\" content=\"noindex\">"
             "</head><body><h1>Hidden page</h1>" + body
             + "</body></html>").encode()
    allow = ("<html><head><meta name=\"robots\" content=\"all\">"
             "</head><body><h1>Open page</h1>" + body
             + "</body></html>").encode()
    planted = [
        dict(rows[0], url="https://x.example/hidden", html=noidx, text=""),
        dict(rows[1], url="https://x.example/open", html=allow, text=""),
    ]
    pages = spark.createDataFrame(rows + planted, PAGES_SCHEMA_DDL)

    open_cfg = CurateConfig(min_chars=50, neardup_threshold=2.0)
    urls_open = {r["url"] for r in curate(pages, open_cfg)[0].collect()}
    assert {"https://x.example/hidden", "https://x.example/open"} <= urls_open

    polite = CurateConfig(
        min_chars=50, neardup_threshold=2.0, respect_robots_noindex=True,
    )
    urls = {r["url"] for r in curate(pages, polite)[0].collect()}
    assert "https://x.example/hidden" not in urls
    assert "https://x.example/open" in urls   # content="all" passes
    assert urls_open - urls == {"https://x.example/hidden"}


def test_curate_fix_mojibake_collapses_encoding_twins(spark):
    """A page crawled clean and the same page crawled through a
    Latin-1 mis-decode are distinct byte strings to exact dedup — with
    fix_mojibake on, the broken copy repairs to the clean bytes and the
    pair collapses to one survivor."""
    from mindocr_spark.corpus import generate_batch, PAGES_SCHEMA_DDL
    from mindocr_spark.curate import CurateConfig, curate

    rows = generate_batch(17, range(20))
    body = ("the caf\u00e9 on the corner serves excellent petit "
            "d\u00e9jeuner to its loyal visitors every single morning")
    broken = body.encode("utf-8").decode("latin-1")

    def page(tag, text):
        html = (f"<html><body><article><p>{text}</p>"
                f"</article></body></html>").encode()
        return dict(rows[0], url=f"https://moji.example/{tag}", html=html,
                    text="")

    pages = spark.createDataFrame(
        rows + [page("clean", body), page("broken", broken)],
        PAGES_SCHEMA_DDL,
    )
    base = dict(min_chars=50, neardup_threshold=2.0)

    off = {r["url"] for r in curate(pages, CurateConfig(**base))[0]
           .collect()}
    assert {"https://moji.example/clean",
            "https://moji.example/broken"} <= off  # distinct bytes

    on = {r["url"] for r in
          curate(pages, CurateConfig(**base, fix_mojibake=True))[0]
          .collect()}
    assert len(on & {"https://moji.example/clean",
                     "https://moji.example/broken"}) == 1


def test_curate_code_entropy_soft404_gates(spark):
    """The three session-B gates: code/math routing, entropy floor,
    and body-grain soft-404 — each drops exactly its planted page and
    leaves the rest of the batch alone."""
    from mindocr_spark.corpus import generate_batch, PAGES_SCHEMA_DDL
    from mindocr_spark.curate import CurateConfig, curate

    rows = generate_batch(17, range(15))
    filler = ("the quick brown fox jumps over the lazy dog and then "
              "walks along the river for a while before resting ")

    def page(tag, body):
        html = (f"<html><body><h1>{tag}</h1><p>{body}</p>"
                "</body></html>").encode()
        return dict(rows[0], url=f"https://g.example/{tag}", html=html,
                    text="")

    code_body = filler + " ``` " + "    int v = 1; { y(); } " * 6 + " ``` "
    # near-degenerate distribution: entropy ≈ 0.16, far below any
    # real page (the batch's own minimum is ln 2 ≈ 0.693)
    stuffing = "buy " * 50 + "now once"
    # thin in TOKENS (< 30) but long enough in chars to clear the
    # baseline length/boilerplate gates
    soft404_body = ("sorry this page was not found here "
                    + "unavailability " * 18)
    planted = [
        page("code", code_body),
        page("stuffed", stuffing),
        page("gone", soft404_body),
    ]
    pages = spark.createDataFrame(rows + planted, PAGES_SCHEMA_DDL)
    base = dict(min_chars=30, neardup_threshold=2.0)

    open_urls = {r["url"] for r in
                 curate(pages, CurateConfig(**base))[0].collect()}
    for tag in ("code", "stuffed", "gone"):
        assert f"https://g.example/{tag}" in open_urls

    gated = CurateConfig(
        **base, skip_code_docs=True, min_token_entropy=0.5,
        drop_soft404=True,
    )
    gated_urls = {r["url"] for r in curate(pages, gated)[0].collect()}
    assert "https://g.example/code" not in gated_urls
    assert "https://g.example/stuffed" not in gated_urls
    assert "https://g.example/gone" not in gated_urls
    # the generated batch itself survives all three gates
    assert len(open_urls) - len(gated_urls) == 3


def test_curate_code_entropy_gates_are_join_free(spark):
    """The code-routing and entropy-floor gates are row predicates
    fused into the funnel — enabling them must add ZERO joins to the
    pre-dedup plan (they were once self-joins on url)."""
    from mindocr_spark.corpus import generate_batch, PAGES_SCHEMA_DDL
    from mindocr_spark.curate import CurateConfig, _curate_build

    pages = spark.createDataFrame(
        generate_batch(17, range(10)), PAGES_SCHEMA_DDL
    )

    from mindocr_spark.extract_core import ExtractParams

    def n_joins(cfg):
        curated, _ = _curate_build(pages, cfg, ExtractParams(), lambda df: df)
        plan = curated._jdf.queryExecution().optimizedPlan().toString()
        return plan.count("Join ")

    base = CurateConfig(min_chars=30, neardup_threshold=2.0)
    gated = CurateConfig(
        min_chars=30, neardup_threshold=2.0,
        skip_code_docs=True, min_token_entropy=0.5, drop_soft404=True,
    )
    assert n_joins(gated) == n_joins(base)


def test_curate_boilerplate_purge_and_hyphenation(spark):
    """purge_boilerplate_df removes a viral banner line from EVERY page
    (first occurrence included — the rule dedup_paragraphs can't
    express), and fix_hyphenation rejoins wrapped words before gates."""
    from mindocr_spark.corpus import generate_batch, PAGES_SCHEMA_DDL
    from mindocr_spark.curate import CurateConfig, curate

    rows = generate_batch(19, range(8))
    banner = ("accept all cookies to keep browsing our excellent "
              "website today thanks")
    bodies = [
        "the harbour opened before dawn and the boats went out in rows",
        "a long treatise about compilers explains parsing in great depth",
        "volunteers planted oak saplings along the northern ridge trail",
    ]

    def page(i, body):
        # the wrap crosses a BLOCK boundary (blocks join with \n in the
        # assembled text — the PDF/layout line-wrap shape; within-block
        # whitespace is normalized away by extraction)
        html = (f"<html><body><p>{body}</p><p>{banner}</p>"
                f"<p>page {i} shows an exam-</p>"
                f"<p>ple of hyphenation artifacts</p>"
                "</body></html>").encode()
        return dict(rows[0], url=f"https://bp.example/{i}", html=html,
                    text="")

    pages = spark.createDataFrame(
        rows + [page(i, b) for i, b in enumerate(bodies)],
        PAGES_SCHEMA_DDL,
    )
    cfg = CurateConfig(
        min_chars=30, neardup_threshold=2.0,
        purge_boilerplate_df=1, fix_hyphenation=True,
    )
    out, funnel = curate(pages, cfg)
    texts = {r["url"]: r["text"] for r in out.collect()}
    planted = {u: t for u, t in texts.items() if u.startswith("https://bp.")}
    # ≥2 planted pages survive the generic gates — enough that the
    # banner's doc frequency exceeds max_df=1 and the purge must fire
    assert len(planted) >= 2
    for t in planted.values():
        assert banner not in t                  # purged everywhere
        assert "example of hyphenation" in t    # wrap rejoined across blocks
        assert "exam-" not in t
    stages = {r["stage"]: r["docs"] for r in funnel.collect()}
    assert "boilerplate_purge" in stages
    # WITHOUT the purge the same banner survives in every planted page
    open_out, _ = curate(pages, CurateConfig(
        min_chars=30, neardup_threshold=2.0, fix_hyphenation=True,
    ))
    open_planted = [r["text"] for r in open_out.collect()
                    if r["url"].startswith("https://bp.")]
    assert open_planted and all(banner in t for t in open_planted)


def test_curate_purge_composes_with_paragraph_dedup(spark):
    """Purge (df rule) then paragraph dedup (first-occurrence rule) in
    one funnel: the viral banner vanishes entirely; a twice-used
    paragraph keeps exactly its first occurrence."""
    from mindocr_spark.corpus import generate_batch, PAGES_SCHEMA_DDL
    from mindocr_spark.curate import CurateConfig, curate

    rows = generate_batch(23, range(8))
    banner = ("subscribe to the newsletter for weekly updates and "
              "exclusive offers")
    twice = ("this paragraph is quoted by exactly one other page "
             "in the corpus")

    def page(i, extra):
        html = (f"<html><body><p>unique opener number {i} with plenty "
                f"of additional prose to pass the floor</p>"
                f"<p>{banner}</p>{extra}</body></html>").encode()
        return dict(rows[0], url=f"https://pq.example/{i}", html=html,
                    text="")

    pages = spark.createDataFrame(
        rows + [
            page(0, f"<p>{twice}</p>"),
            page(1, f"<p>{twice}</p>"),
            page(2, ""),
        ],
        PAGES_SCHEMA_DDL,
    )
    cfg = CurateConfig(
        min_chars=30, neardup_threshold=2.0,
        purge_boilerplate_df=2, dedup_paragraphs=True,
    )
    out, funnel = curate(pages, cfg)
    texts = {r["url"]: r["text"] for r in out.collect()
             if r["url"].startswith("https://pq.")}
    assert all(banner not in t for t in texts.values())
    keeps = [u for u, t in texts.items() if twice in t]
    assert keeps == ["https://pq.example/0"]    # first occurrence only
    stages = [r["stage"] for r in funnel.collect()]
    assert "boilerplate_purge" in stages and "paragraph_dedup" in stages


def test_gate_attribution_precedence_and_null_fail(spark):
    """first_failed_gate takes the FIRST failing gate in order;
    n_failed counts all failing gates (no short-circuit); a NULL
    predicate fails ('no evidence never passes'); an all-pass doc
    gets NULL attribution and passed=1."""
    from pyspark.sql import functions as F

    from mindocr_spark.curate import gate_attribution

    df = spark.createDataFrame(
        [
            (1, "en", 500, 0.1),    # passes everything
            (2, "zz", 500, 0.1),    # fails lang only
            (3, "zz", 10, None),    # fails lang + len + NULL ratio
            (4, "en", 10, 0.0),     # fails len + ratio
        ],
        "doc_id bigint, lang string, n int, ratio double",
    )
    gates = [
        ("lang", F.col("lang") == "en"),
        ("len", F.col("n") >= 100),
        ("ratio", F.col("ratio") > 0.05),
    ]
    out = {r["doc_id"]: r for r in gate_attribution(df, gates).collect()}
    assert out[1]["first_failed_gate"] is None and out[1]["passed"] == 1
    assert out[2]["first_failed_gate"] == "lang" and out[2]["n_failed"] == 1
    assert out[3]["first_failed_gate"] == "lang" and out[3]["n_failed"] == 3
    assert out[4]["first_failed_gate"] == "len" and out[4]["n_failed"] == 2
    assert out[4]["passed"] == 0


def test_gate_attribution_empty_gate_list_raises(spark):
    import pytest as _pytest

    from mindocr_spark.curate import gate_attribution

    df = spark.createDataFrame([(1,)], "doc_id bigint")
    with _pytest.raises(ValueError, match="empty gate list"):
        gate_attribution(df, [])


# ----------------------------------------------------------------------
# domain_prior_gate
# ----------------------------------------------------------------------

def _dpg_docs(spark, rows):
    return spark.createDataFrame(
        rows, "doc_id long, source string, text string")


def test_domain_prior_guilt_by_association(spark):
    from mindocr_spark.curate import domain_prior_gate

    clean = "plain words only"
    spam = "$$$$ buy now"
    rows = (
        # spamfarm: 2/4 spammy (>= 1/5) -> domain fails, ALL dropped
        [(1, "farm", spam), (2, "farm", spam),
         (3, "farm", clean), (4, "farm", clean)]
        # goodsite: 0 spammy -> identical clean text survives
        + [(5, "good", clean)]
    )
    got = {r["doc_id"]: (r["domain_pass"], r["keep"])
           for r in domain_prior_gate(_dpg_docs(spark, rows)).collect()}
    assert got[3] == (False, False)   # clean doc, spam domain: dropped
    assert got[5] == (True, True)     # same text, clean domain: kept
    assert got[1] == (False, False)


def test_domain_prior_boundary_is_strict(spark):
    from mindocr_spark.curate import domain_prior_gate

    clean = "plain words only"
    spam = "$$$$ buy now"
    # exactly 1/5 spammy: 5*1 < 1*5 is FALSE -> domain fails
    rows = [(i, "edge", clean) for i in range(4)] + [(9, "edge", spam)]
    got = domain_prior_gate(_dpg_docs(spark, rows)).collect()
    assert all(not r["domain_pass"] for r in got)


def test_domain_prior_junk_threshold(spark):
    from mindocr_spark.curate import domain_prior_gate

    rows = [(1, "s", "$$$ three only"), (2, "s", "$$$$ four here")]
    got = {r["doc_id"]: r["doc_spammy"]
           for r in domain_prior_gate(_dpg_docs(spark, rows)).collect()}
    assert got == {1: False, 2: True}  # >= 4 junk symbols flips it


def test_curate_semantic_dedup_stage(spark, raw_pages):
    """semdedup_threshold wires the IN-ENGINE embedder + SemDeDup into
    the composite: the planted near-dup pair (one word changed — its
    hashed-BOW cosine is ~1) collapses to ONE survivor even with the
    MinHash pass disabled, the funnel gains a semantic_dedup stage,
    and the min-id (min-xxhash64(url) by default) survivor rule is
    deterministic across runs."""
    from mindocr_spark.curate import CurateConfig, curate

    cfg = CurateConfig(min_chars=50, neardup_threshold=2.0,
                       semdedup_threshold=0.95)
    curated, funnel = curate(raw_pages, cfg)
    stages = {r["stage"]: r["docs"] for r in funnel.collect()}
    assert "semantic_dedup" in stages
    assert stages["semantic_dedup"] < stages["near_dedup"]

    urls = {r["url"] for r in curated.collect()}
    near_pair = {u for u in urls
                 if u == "https://dup.example/near" or u.endswith("/p/5")}
    assert len(near_pair) == 1  # semantic pass collapsed the pair
    # deterministic: the same build keeps the same survivor
    curated2, _ = curate(raw_pages, cfg)
    assert {r["url"] for r in curated2.collect()} == urls


def test_curate_semantic_custom_id(spark, raw_pages):
    """A caller-supplied numeric id drives seeding AND the survivor
    election (the oracle-checked contract path)."""
    from mindocr_spark.curate import CurateConfig, curate

    cfg = CurateConfig(min_chars=50, neardup_threshold=2.0,
                       semdedup_threshold=0.95)
    curated, _ = curate(
        raw_pages, cfg,
        semdedup_id=F.xxhash64(F.reverse(F.col("url"))),
    )
    assert curated.count() > 0
    assert set(curated.columns) == {"url", "text", "lang_pred", "n_chars"}


def test_curate_semantic_zero_norm_doc_survives_ansi(spark, monkeypatch):
    """A doc whose text is whitespace-only past the raw-char min_chars
    gate embeds to the ZERO vector; cosine against it is 0/0. Without
    the norm>0 guard the IVF assignment raises DIVIDE_BY_ZERO under
    ANSI and aborts the whole curation job. The guard keeps such docs
    as trivially non-duplicates (no direction => nothing to be a
    duplicate OF) and the job completes."""
    from mindocr_spark.curate import CurateConfig, curate

    texts = {
        "https://a.example/1": "the quick brown fox jumps over a lazy "
                               "dog and keeps on running far away",
        "https://a.example/2": "an entirely different document about "
                               "spark catalyst plans and shuffles",
        # 60 raw chars, all whitespace: passes min_chars=50, embeds to 0
        "https://a.example/blank": " " * 60,
    }
    rows = [(u, t, 0.1, False) for u, t in texts.items()]

    def fake_extraction(pages, params=None):
        return spark.createDataFrame(
            rows,
            "url string, extracted_text string, "
            "boilerplate_ratio double, failed boolean",
        )

    monkeypatch.setattr(
        "mindocr_spark.curate.run_extraction", fake_extraction)
    pages = spark.createDataFrame(
        [(u,) for u in texts], "url string")

    # conf.get(key) RESOLVES the conf's built-in default; get(key,
    # fallback) returns the fallback whenever the key was never
    # explicitly set — restoring from the latter silently flips a
    # default-true session to false for every later test
    prev = spark.conf.get("spark.sql.ansi.enabled")
    spark.conf.set("spark.sql.ansi.enabled", "true")
    try:
        cfg = CurateConfig(min_chars=50, neardup_threshold=2.0,
                           semdedup_threshold=0.95)
        curated, funnel = curate(pages, cfg)
        got = {r["url"] for r in curated.collect()}
        stages = {r["stage"] for r in funnel.collect()}
    finally:
        spark.conf.set("spark.sql.ansi.enabled", prev)
    assert "semantic_dedup" in stages
    assert got == set(texts)  # zero-norm doc kept, nothing aborted

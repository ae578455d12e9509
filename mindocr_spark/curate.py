"""curate — the end-to-end training-corpus curation pipeline.

The canonical composition this engine exists for: raw crawl pages →
clean deduplicated training text. One declarative chain:

    extract (det→rec→layout core)
    → language ID + quality gates          (cls stage + validity filters)
    → exact dedup (md5 clusters)           (content addressing)
    → near-dup removal (MinHash + LSH)     (scale-path candidate join)
    → curated corpus + per-stage funnel metrics

Plan shape: the extraction is one narrow stage; each dedup pass is one
key-partitioned shuffle; the funnel metrics are cheap count aggregates.
At 10^12 docs every stage is the same plan, just more partitions — no
driver-side loops anywhere.
"""

from __future__ import annotations

from contextlib import contextmanager
from dataclasses import dataclass

from pyspark.sql import DataFrame, functions as F

from mindocr_spark import extract_core as core
from mindocr_spark.functions.dedup import (
    connected_components,
    exact_dup_clusters,
    minhash_lsh_pairs,
    paragraph_dedup,
)
from mindocr_spark.functions.text import (
    lang_id_col,
    quality_cols,
    repetition_line_cols,
    top_2gram_cols,
)
from mindocr_spark.operators.pipeline import run_extraction


@dataclass(frozen=True)
class CurateConfig:
    min_chars: int = 100          # drop short extractions
    max_boilerplate: float = 0.95  # drop pages that are ~all chrome
    langs: tuple[str, ...] = ()    # keep-list; empty = all
    min_stop_ratio: float = 0.0    # prose-ness gate (0 disables)
    neardup_threshold: float = 0.6  # MinHash est-jaccard cutoff; >1 disables
    # Gopher/C4-style repetition gates. dup_line_frac is bounded in
    # [0,1] so ≥ 1.0 disables it; symbol_word_ratio and top2gram_share
    # both legitimately exceed 1 (symbol-soup docs; share =
    # freq·len(gram)/n_chars on heavily repetitive text), so their
    # disable sentinel is inf — any finite threshold, including ≥ 1.0,
    # is enforced. The two line/symbol gates are pure row expressions
    # (free on the scan); the top-2-gram gate adds one (doc, gram)
    # keyed shuffle.
    max_dup_line_frac: float = 1.0
    max_symbol_word_ratio: float = float("inf")
    max_top2gram_share: float = float("inf")
    # C4's badwords gate: drop any doc containing a whole-word match
    # from this list (empty = disabled). Compiles to one codegen regex
    # predicate on the scan — no join, no shuffle.
    blockwords: tuple[str, ...] = ()
    # CCNet/C4-style corpus-level paragraph dedup: rewrite every doc,
    # dropping each repeated paragraph everywhere but its first
    # (url, position) occurrence — the cross-doc boilerplate-line
    # remover. Costs one shuffle on the paragraph hash (min-aggregate,
    # skew-safe under viral boilerplate) + one rebuild groupBy. After
    # the rewrite the min_chars gate re-applies: a doc hollowed out to
    # below the floor drops.
    dedup_paragraphs: bool = False
    min_para_chars: int = 30
    # global line-frequency boilerplate PURGE: a line (≥ min_para_chars)
    # present in more than this many distinct docs is removed from
    # EVERY doc — first occurrence included, the rule dedup_paragraphs
    # cannot express (cookie banners, footers, subscription prompts).
    # 0 disables. One shuffle on the line hash (two-phase distinct
    # count) + one rebuild groupBy; min_chars re-applies after.
    purge_boilerplate_df: int = 0
    # join PDF/print line-wrap hyphenation before every gate and dedup
    # pass ("exam-\nple" otherwise shingles as two garbage tokens);
    # compound wraps keep their hyphen. Pure codegen regex rewrite on
    # the scan — no join, no shuffle.
    fix_hyphenation: bool = False
    # keep at most N pages per registered domain (C4's anti-spam gate;
    # 0 disables). Salted two-phase top-N — a spam farm's pages split
    # across salt tasks instead of funneling into one straggler.
    max_pages_per_domain: int = 0
    # scrub emails / IPv4 / +CC phones to sentinel tokens before any
    # dedup pass (so docs differing only in PII collapse as the
    # duplicates they are). Pure row expressions — free on the scan.
    redact_pii: bool = False
    # canonicalize text to Unicode NFC before every gate and dedup
    # pass (composed vs decomposed encodings of the same glyphs stop
    # defeating byte-level fingerprints). One Arrow-batched pandas UDF
    # in the narrow post-extraction stage — no shuffle.
    nfc_normalize: bool = False
    # repair mojibake (UTF-8 bytes decoded as Latin-1 upstream) before
    # every gate and dedup pass, and before NFC — broken and clean
    # encodings of the same page collapse as the duplicates they are.
    # Guarded codegen rewrite (applies only when provably safe);
    # pure row expressions, no shuffle.
    fix_mojibake: bool = False
    # transitive near-dup collapse: instead of dropping the larger url
    # of each candidate pair (which leaves a chain member alive when it
    # is only ever the SMALLER side of its pairs), run connected
    # components over the pair graph and keep exactly one doc — the
    # min url — per component. NOTE: this pass is EAGER (min-label
    # propagation is iterative; the driver loop runs one Spark job per
    # pass until the labels converge), so with it enabled curate() is
    # no longer a zero-action build.
    neardup_transitive: bool = False
    # model-based quality gate (FineWeb-Edu/DCLM shape): keep docs the
    # hashed-linear classifier scores ≥ this threshold (None disables).
    # Weights come from classifier_weights (None = the deterministic
    # stub table — swap in a real export, same relation shape); scoring
    # is one broadcast weight join + exact DECIMAL sums, and NULL-score
    # docs (zero tokens) drop — "no evidence" does not pass a
    # model gate.
    min_classifier_score: float | None = None
    classifier_weights: tuple | None = None
    # CCNet-style LM perplexity gate: keep docs with unigram
    # logppl ≤ this bound, scored against an LM trained on the
    # post-quality-gate slice whose lang_pred is in lm_ref_langs (the
    # in-corpus stand-in for CCNet's Wikipedia reference — training is
    # one groupBy, scoring one broadcast token join; deterministic
    # given the input batch). None disables; NULL-logppl (zero-token)
    # docs drop.
    max_lm_logppl: float | None = None
    lm_ref_langs: tuple[str, ...] = ("en",)
    # crawl politeness: drop pages whose <meta name="robots"> carries
    # a noindex directive BEFORE extraction — excluded pages never pay
    # the parse cost (one codegen regex predicate on the raw html,
    # whole-token match, zero shuffles).
    respect_robots_noindex: bool = False
    # content-type routing: drop docs detected as code or LaTeX math —
    # prose gates (stopwords, symbol ratios, repetition) misfire on
    # them, so a prose corpus routes them out rather than letting the
    # quality gates decide arbitrarily. Pure row expressions on the
    # gated frame — no join, no shuffle.
    skip_code_docs: bool = False
    # unigram-entropy floor (the keyword-stuffing / single-token-spam
    # shape that TTR misses; None disables). NULL entropy (zero-token
    # docs) drops — no evidence does not pass a distribution gate.
    min_token_entropy: float | None = None
    # drop soft-404s at the body grain: extracted text that OPENS with
    # error phrasing AND is thin (pages that 200 but mean 404 — what
    # the status gate upstream cannot see). Title-based soft-404
    # gating belongs at the crawl layer where the raw html is on the
    # scan. Pure row predicate, no join.
    drop_soft404: bool = False
    # SemDeDup semantic-dedup stage AFTER exact/near dedup (None
    # disables): embed every surviving doc IN-ENGINE
    # (functions.embed.text_embed_cols — hashed-BOW random projection,
    # no external vectors), k-means-cluster with the shared IVF build,
    # and drop every doc with a same-cluster neighbor at cosine ≥ this
    # threshold and a smaller id (min-id survivor). 0.95 is the
    # published SemDeDup operating point. Ids default to xxhash64(url)
    # (uniform — the id-grid seed rule and min-survivor work
    # unchanged); pass `semdedup_id=` to curate() for a caller-defined
    # numeric id (the oracle-checked contract parses its doc_id).
    # NOTE: like neardup_transitive, this pass is EAGER (the IVF build
    # counts and collects centroids). At 10^12 docs set
    # semdedup_target_cluster (e.g. 128) for the linear-work plan.
    semdedup_threshold: float | None = None
    semdedup_target_cluster: int | None = None


def curate(
    pages: DataFrame,
    cfg: CurateConfig = CurateConfig(),
    params: core.ExtractParams = core.DEFAULT_PARAMS,
    _track: list[DataFrame] | None = None,
    semdedup_id=None,
) -> tuple[DataFrame, DataFrame]:
    """pages → (curated, funnel) where curated has one row per kept doc
    (url, text, lang_pred, n_chars) and funnel records per-stage
    survivor counts (the metrics-table discipline of the north rule).

    FULLY LAZY: building the pipeline triggers ZERO Spark actions — the
    funnel is itself a lazy DataFrame (a union of count aggregates over
    the persisted stage frames) whose cost is paid only if the caller
    materializes it. Use :func:`curate_scoped` to get the persisted
    intermediates unpersisted on exit; `_track` collects them for
    callers managing cache lifetime themselves.
    """
    from mindocr_spark.cache import _collect_into, tracked_persist as _persist

    if _track is None:
        # no explicit tracker: leave the AMBIENT scope (if any) in place
        # so `with persist_scope(): curate(...)` still collects every
        # nested persist — overriding it here would route them into a
        # throwaway list and leak them
        return _curate_build(pages, cfg, params, _persist, semdedup_id)
    with _collect_into(_track):
        return _curate_build(pages, cfg, params, _persist, semdedup_id)


def _curate_build(pages, cfg, params, _persist, semdedup_id=None):
    if cfg.respect_robots_noindex:
        # politeness gate BEFORE extraction: excluded pages never pay
        # the parse cost; whole-token directive match, pure codegen
        from mindocr_spark.functions.links import (
            ROBOTS_META_RE, _DIRECTIVE_RE,
        )

        content = F.lower(
            F.regexp_extract(
                F.col("html").cast("string"), ROBOTS_META_RE, 1
            )
        )
        indexable = pages.where(
            ~content.rlike(_DIRECTIVE_RE.format(tok="noindex"))
        )
    else:
        indexable = pages
    extracted = _persist(run_extraction(indexable, params).select(
        "url", F.col("extracted_text").alias("text"),
        "boilerplate_ratio", "failed",
    ))

    # Encoding repair FIRST, canonicalization SECOND — both before the
    # length gate. Mojibake repair must precede NFC: the rewrite turns
    # broken byte sequences back into the real glyphs, and only THEN
    # does canonical-form normalization mean anything. Gating on
    # pre-repair bytes would admit or drop a page based on its crawl
    # encoding, the exact divergence these options neutralize. Every
    # downstream signal (min_chars, lang n-grams, quality ratios,
    # fingerprints, shingles) reads the repaired, canonical bytes.
    src = extracted
    if cfg.fix_mojibake:
        from mindocr_spark.functions.text import mojibake_cols

        src = mojibake_cols(src, text_col="text").drop(
            "moji_detected", "moji_fixed"
        )
    if cfg.nfc_normalize:
        from mindocr_spark.functions.text import unicode_normalize_cols

        src = unicode_normalize_cols(src, text_col="text").drop(
            "was_normalized"
        )
    if cfg.fix_hyphenation:
        from mindocr_spark.functions.text import dehyphenate_cols

        src = dehyphenate_cols(src, text_col="text").drop(
            "n_dehyphenated"
        )
    ok = src.where(
        (~F.col("failed"))
        & (F.length("text") >= cfg.min_chars)
        & (F.col("boilerplate_ratio") <= cfg.max_boilerplate)
    )
    tagged = ok.withColumn("lang_pred", lang_id_col(F.lower(F.col("text"))))
    if cfg.langs:
        tagged = tagged.where(F.col("lang_pred").isin(*cfg.langs))
    if cfg.min_stop_ratio > 0:
        q = quality_cols(tagged, text_col="text", id_col="url").select(
            "url", "stop_ratio"
        )
        tagged = (
            tagged.join(q, "url")
            .where(F.col("stop_ratio") >= cfg.min_stop_ratio)
            .drop("stop_ratio")
        )
    # repetition gates (Gopher/C4): the line/symbol signals are row
    # expressions fused into the same narrow stage; the top-2-gram
    # share costs one (doc, gram) shuffle and is joined back only when
    # its gate is enabled
    import math

    symbol_gate = math.isfinite(cfg.max_symbol_word_ratio)
    if cfg.max_dup_line_frac < 1.0 or symbol_gate:
        rep = repetition_line_cols(tagged, text_col="text", id_col="url")
        if cfg.max_dup_line_frac < 1.0:
            rep = rep.where(F.col("dup_line_frac") <= cfg.max_dup_line_frac)
        if symbol_gate:
            rep = rep.where(
                F.col("symbol_word_ratio") <= cfg.max_symbol_word_ratio
            )
        tagged = rep.drop(
            "n_lines", "dup_line_frac", "n_ellipsis_lines",
            "symbol_word_ratio",
        )
    if math.isfinite(cfg.max_top2gram_share):
        shares = top_2gram_cols(tagged, text_col="text", id_col="url").select(
            "url", "top_2gram_share"
        )
        tagged = (
            tagged.join(shares, "url")
            .where(F.col("top_2gram_share") <= cfg.max_top2gram_share)
            .drop("top_2gram_share")
        )
    # blockword gate (C4's badwords filter): one codegen whole-word
    # alternation applied directly as a row predicate — no join, fused
    # into the same narrow stage as the other row-expression gates
    if cfg.blockwords:
        from mindocr_spark.functions.text import blockword_pattern

        tagged = tagged.where(
            F.regexp_count(
                F.lower(F.col("text")),
                F.lit(blockword_pattern(cfg.blockwords)),
            )
            == 0
        )
    # content-type routing (code/LaTeX out of the prose corpus): pure
    # row predicate from the SAME signal expressions code_math_cols
    # verifies — fused into the narrow stage, no join
    if cfg.skip_code_docs:
        from mindocr_spark.functions.text import code_math_predicate

        tagged = tagged.where(~code_math_predicate("text"))
    # unigram-entropy floor (NULL entropy drops with the >= predicate).
    # The token array is BOUND in its own projection first — inlining
    # tokens_col into the entropy lambdas would re-evaluate the split
    # per element — then the helper columns drop; still join-free.
    if cfg.min_token_entropy is not None:
        from mindocr_spark.functions.text import entropy_expr, tokens_col

        tagged = (
            tagged.withColumn("_ent_toks", tokens_col("text"))
            .withColumn("_ent", entropy_expr(F.col("_ent_toks")))
            .where(F.col("_ent") >= cfg.min_token_entropy)
            .drop("_ent_toks", "_ent")
        )
    # soft-404 body gate: pure row predicate, fused into the stage
    if cfg.drop_soft404:
        from mindocr_spark.functions.crawl import soft404_body_predicate

        tagged = tagged.where(~soft404_body_predicate("text"))
    # model-based quality gate (classifier score ≥ threshold): one
    # broadcast weight join; joined back on url like the other
    # relation-producing gates
    if cfg.min_classifier_score is not None:
        from mindocr_spark.functions.classifier import (
            quality_classifier_score,
        )

        cls_scores = quality_classifier_score(
            tagged, weights=cfg.classifier_weights,
            threshold=cfg.min_classifier_score,
            text_col="text", id_col="url",
        ).select("url", "score")
        tagged = (
            tagged.join(cls_scores, "url")
            .where(F.col("score") >= cfg.min_classifier_score)
            .drop("score")
        )
    # LM perplexity gate (CCNet shape): train on the reference-lang
    # slice of the gated batch, score everything, keep the fluent head
    if cfg.max_lm_logppl is not None:
        from mindocr_spark.functions.lm import (
            unigram_counts, unigram_logppl,
        )

        # the LM trains on a slice of `tagged` and scores `tagged` —
        # a diamond over the (cheap-by-now) gated frame; persist so
        # the gate subtree evaluates once per consumer
        tagged = _persist(tagged)
        lm = unigram_counts(
            tagged.where(F.col("lang_pred").isin(*cfg.lm_ref_langs)),
            text_col="text",
        )
        ppl = unigram_logppl(
            tagged, lm, id_col="url", text_col="text"
        ).select("url", "logppl")
        tagged = (
            tagged.join(ppl, "url")
            .where(F.col("logppl") <= cfg.max_lm_logppl)
            .drop("logppl")
        )
    # per-domain cap BEFORE dedup: a spam farm's pages should never
    # reach the dedup passes (they'd bloat signature state), and the
    # cap's deterministic min-url selection keeps the oracle exact.
    # `pre_cap` snapshots the quality-gated frame so the funnel
    # attributes cap drops to this pass, not to the quality gates.
    pre_cap = tagged
    if cfg.max_pages_per_domain > 0:
        from mindocr_spark.functions.urls import domain_cap

        # consumed by the cap's ranking scan, the join-back, and the
        # funnel count
        pre_cap = _persist(pre_cap)
        tagged = domain_cap(
            pre_cap, cfg.max_pages_per_domain, url_col="url"
        ).drop("registered_domain", "domain_rank")
    # PII scrubbing BEFORE any dedup: two docs differing only in an
    # email address are the same training document
    if cfg.redact_pii:
        from mindocr_spark.functions.text import redact_pii_cols

        tagged = redact_pii_cols(tagged, text_col="text").drop(
            "n_emails", "n_ips", "n_phones"
        )
    # corpus-level line/paragraph rewrites BEFORE exact dedup: removing
    # shared boilerplate can make two docs byte-identical, and the
    # exact pass downstream then collapses them. `gated` snapshots the
    # post-gate (pre-rewrite) frame so the funnel attributes hollow-doc
    # drops to these passes, not to the lang/quality gates. Order:
    # frequency PURGE first (a >df line is boilerplate wherever it
    # sits), then first-occurrence paragraph dedup over what remains.
    gated = tagged
    post_purge = None
    if cfg.purge_boilerplate_df > 0:
        from mindocr_spark.functions.dedup import boilerplate_purge

        # consumed by the purge's scan, the join-back, and the funnel
        gated = _persist(gated)
        rebuilt = boilerplate_purge(
            gated.select("url", "text"), text_col="text", id_col="url",
            max_df=cfg.purge_boilerplate_df,
            min_line_chars=cfg.min_para_chars,
        ).withColumnRenamed("text", "__bp_text")
        tagged = (
            gated.drop("text")
            .join(rebuilt, "url")
            .withColumnRenamed("__bp_text", "text")
            .where(F.length("text") >= cfg.min_chars)
        )
    if cfg.dedup_paragraphs:
        # consumed by paragraph_dedup's scan, the join-back, and the
        # funnel count — persist, or the gate joins above re-run per
        # consumer
        src_pd = _persist(tagged)
        if cfg.purge_boilerplate_df > 0:
            post_purge = src_pd
        else:
            gated = src_pd
        rebuilt = paragraph_dedup(
            src_pd.select("url", "text"), text_col="text", id_col="url",
            min_para_chars=cfg.min_para_chars,
        ).withColumnRenamed("text", "__pd_text")
        tagged = (
            src_pd.drop("text")
            .join(rebuilt, "url")
            .withColumnRenamed("__pd_text", "text")
            .where(F.length("text") >= cfg.min_chars)
        )
    tagged = _persist(tagged)
    if cfg.purge_boilerplate_df > 0 and not cfg.dedup_paragraphs:
        post_purge = tagged
    if cfg.purge_boilerplate_df == 0 and not cfg.dedup_paragraphs:
        gated = tagged

    # exact dedup: keep each cluster's representative — the
    # lexicographically smallest url (engine-portable and deterministic;
    # a hash-based rep would not be reproducible in the SQL oracle)
    clusters = exact_dup_clusters(tagged, text_col="text", id_col="url")
    exact_kept = _persist(tagged.join(
        clusters.where(F.col("url") == F.col("cluster_rep")).select("url"),
        "url",
    ))

    # near-dup removal: LSH candidates ≥ threshold; by default drop the
    # higher url of each pair (deterministic victim choice). threshold
    # > 1 disables the pass entirely. With neardup_transitive, collapse
    # whole connected components of the pair graph to their min url
    # instead — the pairwise rule misses a chain member that is only
    # ever the smaller side of its pairs (see connected_components).
    if cfg.neardup_threshold <= 1.0:
        pairs = minhash_lsh_pairs(
            exact_kept, threshold=cfg.neardup_threshold,
            text_col="text", id_col="url",
        )
        if cfg.neardup_transitive:
            comp = connected_components(
                pairs, src_col="id_a", dst_col="id_b",
            )
            victims = comp.where(
                F.col("id") != F.col("component")
            ).select(F.col("id").alias("url"))
        else:
            victims = pairs.select(F.col("id_b").alias("url")).distinct()
        curated = exact_kept.join(victims, "url", "left_anti")
    else:
        curated = exact_kept

    # semantic dedup (SemDeDup): embed the survivors IN-ENGINE and drop
    # every doc with a same-cluster neighbor at cosine >= threshold and
    # a smaller id. Closes the extract->embed->dedup loop inside the
    # composite — no external embeddings table anywhere. EAGER (IVF
    # build); one cid equi-join, quadratic only inside clusters
    # (bounded by semdedup_target_cluster at scale).
    sem_kept = None
    if cfg.semdedup_threshold is not None:
        from mindocr_spark.functions.embed import (
            embed_norm, text_embed_cols)
        from mindocr_spark.functions.similarity import semdedup_flags

        id_expr = (semdedup_id if semdedup_id is not None
                   else F.xxhash64("url"))
        with_id = _persist(curated.withColumn("__sid", id_expr))
        emb = _persist(text_embed_cols(
            with_id, text_col="text", id_col="__sid",
            vec_col="embedding",
        ))
        # zero-norm guard (the dense_maxp_topk rule): a doc whose
        # normalized text is blank or whose votes fully cancel embeds
        # to the zero vector; cosine against it is 0/0 — an ANSI
        # DIVIDE_BY_ZERO inside the IVF assignment that would abort
        # the whole curation job. Such docs have no semantic direction
        # to be a duplicate OF, so they are trivially non-duplicates:
        # keep them, route only norm>0 vectors into SemDeDup.
        directed = emb.where(embed_norm("embedding") > 0)
        undirected = emb.where(
            ~(embed_norm("embedding") > 0)).select("__sid")
        flags = semdedup_flags(
            directed, threshold=cfg.semdedup_threshold, id_col="__sid",
            vec_col="embedding",
            target_cluster=cfg.semdedup_target_cluster,
        )
        keep = flags.where(~F.col("is_dup")).select(
            "__sid").unionByName(undirected)
        sem_kept = with_id.join(keep, "__sid").drop("__sid")
        pre_sem, curated = curated, sem_kept
    curated = curated.select(
        "url", "text", "lang_pred", F.length("text").alias("n_chars")
    )

    stages = [
        ("input", pages),
        ("extracted_ok", ok),
    ]
    if cfg.max_pages_per_domain > 0:
        # attribute cap drops to their own stage (gated is the
        # post-cap frame; PII redaction between them preserves rows)
        stages += [("lang_quality", pre_cap), ("domain_cap", gated)]
    else:
        stages.append(("lang_quality", gated))
    if cfg.purge_boilerplate_df > 0:
        stages.append(("boilerplate_purge", post_purge))
    if cfg.dedup_paragraphs:
        stages.append(("paragraph_dedup", tagged))
    stages += [
        ("exact_dedup", exact_kept),
        ("near_dedup", pre_sem if sem_kept is not None else curated),
    ]
    if sem_kept is not None:
        stages.append(("semantic_dedup", curated))
    funnel = _funnel(*stages)
    return curated, funnel


def gate_attribution(
    df: DataFrame,
    gates: list[tuple[str, "F.Column"]],
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-doc rejection attribution over an ORDERED gate list
    [(name, pass_predicate), ...] — the funnel's survivor counts say
    how many docs each stage dropped; this says WHY each individual
    doc dropped and what it would ALSO have failed:

    - ``first_failed_gate``: name of the first gate whose predicate is
      not TRUE (NULL predicates FAIL — the engine-wide "no evidence ≠
      pass" discipline), NULL when every gate passes;
    - ``n_failed``: how many of the gates fail (each doc is evaluated
      against ALL gates, not short-circuited — the signal a gate-
      tuning pass needs: a gate whose failures are all also caught
      later is removable);
    - ``passed``: 1/0 all-gates verdict.

    100 TB shape: the caller binds whatever signal columns the gates
    reference (joins priced there); attribution itself is pure row
    expressions — one codegen CASE chain, zero shuffles."""
    if not gates:
        raise ValueError("empty gate list")
    names = [n for n, _ in gates]
    passed = [F.coalesce(p, F.lit(False)) for _, p in gates]
    first = F.lit(None).cast("string")
    for name, p in reversed(list(zip(names, passed))):
        first = F.when(~p, F.lit(name)).otherwise(first)
    n_failed = None
    for p in passed:
        c = (~p).cast("int")
        n_failed = c if n_failed is None else n_failed + c
    return df.select(
        id_col,
        first.alias("first_failed_gate"),
        n_failed.cast("bigint").alias("n_failed"),
        (n_failed == 0).cast("bigint").alias("passed"),
    )


def _funnel(*stages: tuple[str, DataFrame]) -> DataFrame:
    """LAZY per-stage survivor counts: a union of single-row count
    aggregates, materialized in ONE job only when the caller collects
    it (the old formulation ran a driver-side .count() per stage at
    build time — 5 eager actions including a full extra pass over raw
    pages). The stage frames are persisted, so the funnel job reuses
    their caches instead of recomputing the pipeline."""
    out = None
    for i, (name, df) in enumerate(stages):
        part = df.agg(F.count(F.lit(1)).alias("docs")).select(
            F.lit(i).cast("int").alias("stage_idx"),
            F.lit(name).alias("stage"),
            F.col("docs"),
        )
        out = part if out is None else out.unionByName(part)
    return out


@contextmanager
def curate_scoped(
    pages: DataFrame,
    cfg: CurateConfig = CurateConfig(),
    params: core.ExtractParams = core.DEFAULT_PARAMS,
):
    """`with curate_scoped(pages) as (curated, funnel):` — unpersists
    every intermediate the pipeline cached when the block exits (the
    cache-lifetime discipline VERDICT flagged: persists without
    unpersist leak executor memory across pipelines)."""
    track: list[DataFrame] = []
    try:
        yield curate(pages, cfg, params, _track=track)
    finally:
        for df in track:
            df.unpersist()


#: Junk-symbol pattern for the domain-prior gate (shared constant —
#: the SQL oracle counts the identical class). Distinct from text.py's
#: _PUNCT_RE: these are the monetization/SEO symbols normal prose
#: doesn't carry.
DOMAIN_JUNK_RE = r"[$#]"


def domain_prior_gate(
    docs: DataFrame,
    domain_col: str = "source",
    doc_junk_min: int = 4,
    prior_num: int = 1,
    prior_den: int = 5,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Two-level (domain-prior) quality gating — the FineWeb-style
    filter a per-document gate can't express: aggregate a spam signal
    to the REGISTERED-DOMAIN grain, derive a domain verdict, and gate
    every document by its domain's verdict AND its own. A clean page
    on a spam farm is dropped by association; the identical page on a
    clean domain survives.

    Per doc: ``n_junk`` = junk-symbol count, ``doc_spammy`` =
    ``n_junk ≥ doc_junk_min``. Per domain: ``domain_pass`` ⟺
    ``prior_den·n_spammy < prior_num·n_docs`` (spammy-doc fraction
    strictly under ``prior_num/prior_den`` — all-integer, both
    engines decide boundaries identically). ``keep = domain_pass ∧
    ¬doc_spammy``.

    100 TB shape: the doc features are codegen on the scan; the
    domain aggregate is ONE map-side-combinable groupBy on the domain
    key (heavy-tailed, but partials collapse per task); the verdict
    joins back on the same key — at web scale the domain relation is
    ~10⁷ rows, so AQE picks broadcast vs shuffle; nothing iterates.

    Reference lineage: per-dataset eval summaries gate whole splits
    before per-sample metrics are trusted
    (reference: tools/eval.py:61-83) — aggregate first, then judge
    members by the aggregate.
    """
    n_junk = F.regexp_count(F.col(text_col), F.lit(DOMAIN_JUNK_RE))
    feat = docs.select(
        F.col(id_col),
        F.col(domain_col).alias("domain"),
        n_junk.cast("bigint").alias("n_junk"),
        (n_junk >= doc_junk_min).alias("doc_spammy"),
    )
    dom = feat.groupBy("domain").agg(
        F.count("*").cast("bigint").alias("dom_docs"),
        F.sum(F.col("doc_spammy").cast("int"))
        .cast("bigint")
        .alias("dom_spammy"),
    )
    dom = dom.withColumn(
        "domain_pass",
        F.lit(prior_den) * F.col("dom_spammy")
        < F.lit(prior_num) * F.col("dom_docs"),
    )
    return feat.join(dom, "domain").select(
        id_col,
        "domain",
        "n_junk",
        "doc_spammy",
        "dom_docs",
        "dom_spammy",
        "domain_pass",
        (F.col("domain_pass") & ~F.col("doc_spammy")).alias("keep"),
    )

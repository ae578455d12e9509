"""dedup — exact and near-duplicate detection at corpus scale.

Five detectors, ordered by cost, all shuffle-on-key relational plans
(the only Python is one Arrow-batched pandas UDF folding token hashes
into a simhash). Design point: 10^12 docs — every plan is
groupBy/join on a derived key (content hash, shingle, band bucket),
never an all-pairs comparison; the all-pairs work only happens *within*
a bucket, which is the LSH contract.

- :func:`exact_dup_clusters` — md5-groupBy (cost: one shuffle).
- :func:`ngram_jaccard_pairs` — exact word-shingle Jaccard via
  shingle-key equi-join (cost: shuffle on shingle; exact, for bounded
  shingle frequency).
- :func:`minhash_signatures` / :func:`minhash_lsh_pairs` — MinHash +
  banded LSH candidate generation (the scale path: cost independent of
  pair count).
- :func:`simhash_col` / :func:`simhash_pairs` — 64-bit simhash with
  banded hamming-distance candidate join.
- embedding near-dup lives in :mod:`mindocr_spark.functions.similarity`.

The reference's analog of "the same content appearing twice" is its
golden-eval key-set equality join (reference:
deploy/eval_utils/eval_pipeline.py:104-107); the hash-family trick
mirrors how it snaps variable shapes onto a small set of gears
(reference: deploy/py_infer/src/data_process/utils/gear_utils.py:11-35).
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame, Window, functions as F
from pyspark.sql.functions import pandas_udf

from mindocr_spark.cache import tracked_persist
from mindocr_spark.functions.text import fingerprint_md5, word_shingles

# --------------------------------------------------------------------------
# 1. Exact dedup
# --------------------------------------------------------------------------


def exact_dup_clusters(df: DataFrame, text_col: str = "text",
                       id_col: str = "doc_id") -> DataFrame:
    """(id, fingerprint, cluster_size, cluster_rep, is_dup) — one shuffle
    on the content hash; at 100 TB this is a straight hash-partitioned
    window, no skew (md5 keys are uniform by construction)."""
    fp = df.select(id_col, fingerprint_md5(text_col).alias("fingerprint"))
    w = Window.partitionBy("fingerprint")
    return fp.select(
        id_col,
        "fingerprint",
        F.count("*").over(w).alias("cluster_size"),
        F.min(id_col).over(w).alias("cluster_rep"),
        (F.count("*").over(w) > 1).alias("is_dup"),
    )


def forget_propagation(
    docs: DataFrame,
    requests: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Right-to-be-forgotten propagation through the exact-dup layer:
    a deletion request names document IDs, but the curated corpus
    serves one REPRESENTATIVE per content cluster — so deleting a doc
    must also answer "was it the serving copy, and who serves now?".
    One row per AFFECTED cluster: (fingerprint, n_before, n_deleted,
    n_after, rep_before, rep_after, action) with action ∈
    cluster_gone (content disappears from the corpus) / reelect (the
    representative was deleted, a surviving duplicate takes over —
    the curated output swaps a copy in rather than losing content) /
    rep_unchanged (only non-serving copies purged). Untouched
    clusters never appear; requests for unknown ids are no-ops.

    100 TB shape: requests are tiny vs the corpus → broadcast left
    join onto the fingerprint relation, then ONE map-side-combinable
    groupBy on the uniform md5 key. rep_after = conditional min in
    the same aggregate — no second pass, no window.

    Reference analog: the reference's collect node re-elects which
    shard finalizes a result when a member drops out
    (reference: deploy/py_infer/src/parallel/module/common/
    collect_node.py:72-99); this is that completeness bookkeeping
    applied to content governance."""
    fp = docs.select(
        F.col(id_col).alias("doc_id"),
        fingerprint_md5(text_col).alias("fingerprint"),
    )
    req = requests.select(
        F.col(requests.columns[0]).alias("doc_id"),
        F.lit(True).alias("del_req"),
    ).distinct()
    tagged = fp.join(F.broadcast(req), "doc_id", "left").select(
        "doc_id", "fingerprint",
        F.coalesce("del_req", F.lit(False)).alias("del_req"),
    )
    g = tagged.groupBy("fingerprint").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_before"),
        F.sum(F.when(F.col("del_req"), 1).otherwise(0)).cast("bigint")
        .alias("n_deleted"),
        # no cast: ids keep their natural type so string ids (urls,
        # content hashes) elect representatives instead of NULLing out
        F.min("doc_id").alias("rep_before"),
        F.min(F.when(~F.col("del_req"), F.col("doc_id")))
        .alias("rep_after"),
    )
    return g.where(F.col("n_deleted") > 0).select(
        "fingerprint", "n_before", "n_deleted",
        (F.col("n_before") - F.col("n_deleted")).alias("n_after"),
        "rep_before", "rep_after",
        F.when(F.col("n_before") == F.col("n_deleted"),
               F.lit("cluster_gone"))
        .when(F.col("rep_after") != F.col("rep_before"),
              F.lit("reelect"))
        .otherwise(F.lit("rep_unchanged")).alias("action"),
    )


def substring_dup_flags(
    docs: DataFrame,
    k: int = 40,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Exact-substring duplication flags (the suffix-array dedup family
    of "Deduplicating Training Data Makes Language Models Better",
    re-expressed for a shuffle engine): hash every character k-gram,
    keep a CONTENT-DEFINED 1/16 sample (md5 leading nibble = '0' — the
    :func:`rolling_fingerprints` discipline), and flag any doc that
    shares a sampled k-char run with an EARLIER doc (min-id survivor
    rule). Returns (id, n_grams, n_shared_grams, is_dup) for EVERY
    input doc.

    Content-defined selection is the load-bearing choice: whether a
    gram is kept depends only on its BYTES, so a substring shared by
    two docs is sampled in both or neither — no fixed-stride phase
    misalignment. A shared run of length L ≥ k contains L−k+1 grams
    and is missed only if none is selected: p_miss = (15/16)^(L−k+1)
    (≈2% at L=k+60, ≈10⁻⁵ at L=k+160). Caught pairs are exact
    byte-equal substrings.

    100 TB shape: the per-position md5 is map-side codegen CPU
    (embarrassingly parallel, no exchange); only the 1/16 sample —
    ~len/16 rows of 32-byte hashes per doc — ever shuffles. One
    groupBy(gram hash) computing (min_id, n_docs), both map-side
    combinable so a viral boilerplate gram collapses to one row per
    upstream task, then one equi-join back and one groupBy(id). Same
    two-shuffle discipline as :func:`paragraph_dedup`."""
    text = F.col(text_col)
    g = (
        docs.select(F.col(id_col), text.alias("_t"))
        # sequence(1, 0) is the DESCENDING [1, 0] — guard short texts
        .where(F.length("_t") >= k)
        .select(
            id_col,
            "_t",
            F.explode(
                F.sequence(F.lit(1), F.length("_t") - (k - 1))
            ).alias("i"),
        )
        .select(
            id_col,
            F.md5(F.substring("_t", F.col("i"), k).cast("binary")).alias("gh"),
        )
        .where(F.substring("gh", 1, 1) == "0")
    )
    doc_grams = g.distinct()
    stats = doc_grams.groupBy("gh").agg(
        F.min(id_col).alias("g_min_id"),
        F.count("*").alias("g_n_docs"),  # post-distinct: distinct docs
    )
    per_doc = (
        doc_grams.join(stats, "gh")
        .groupBy(id_col)
        .agg(
            F.count("*").alias("n_grams"),
            F.sum((F.col("g_n_docs") > 1).cast("bigint")).alias(
                "n_shared_grams"
            ),
            F.max(
                (F.col("g_n_docs") > 1) & (F.col("g_min_id") < F.col(id_col))
            ).alias("is_dup"),
        )
    )
    return (
        docs.select(id_col)
        .join(per_doc, id_col, "left")
        .select(
            id_col,
            F.coalesce("n_grams", F.lit(0)).alias("n_grams"),
            F.coalesce("n_shared_grams", F.lit(0)).alias("n_shared_grams"),
            F.coalesce("is_dup", F.lit(False)).alias("is_dup"),
        )
    )


def prefix_dup_survivors(
    docs: DataFrame,
    prefix_chars: int = 200,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Quality-aware survivor selection over prefix-fingerprint
    clusters: cluster on the md5 of the first `prefix_chars`
    characters (the cheap truncation-robust fingerprint — a page
    re-crawled with an appended footer or spam tail keeps its prefix),
    then keep the HIGHEST-QUALITY member per cluster (stop_ratio
    descending, doc id ascending on ties) instead of the blind min-id
    rule — the curation-grade survivor policy: when near-copies
    differ, keep the cleanest one.

    Returns (id, cluster_key, cluster_size, survivor_id, is_survivor)
    for every input doc. One shuffle: the per-cluster argmax is a
    struct-MIN aggregate ((−stop_ratio, id) — field-wise comparison in
    both engines), map-side combinable, so a viral prefix cluster
    collapses before the exchange; the flags come back via one
    equi-join on the cluster key."""
    from mindocr_spark.functions.text import quality_cols

    q = quality_cols(docs, text_col=text_col, id_col=id_col).select(
        id_col, F.coalesce("stop_ratio", F.lit(0.0)).alias("__sr")
    )
    keyed = (
        docs.select(
            id_col,
            F.md5(
                F.col(text_col).substr(1, prefix_chars).cast("binary")
            ).alias("cluster_key"),
        )
        .join(q, id_col)
    )
    best = keyed.groupBy("cluster_key").agg(
        F.count("*").alias("cluster_size"),
        # 1.0 − sr, not −sr: negation maps 0.0 to −0.0, whose total
        # ordering vs 0.0 is an engine-specific corner
        F.min(F.struct((F.lit(1.0) - F.col("__sr")).alias("nq"),
                       F.col(id_col).alias("i"))).alias("__best"),
    )
    return (
        keyed.join(best, "cluster_key")
        .select(
            id_col,
            "cluster_key",
            "cluster_size",
            F.col("__best.i").alias("survivor_id"),
            (F.col("__best.i") == F.col(id_col)).alias("is_survivor"),
        )
    )


def paragraph_dedup(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_para_chars: int = 30,
    sep: str = "\n",
) -> DataFrame:
    """CCNet/C4-style CORPUS-LEVEL exact paragraph dedup: split every
    doc on `sep`, drop each repeated paragraph everywhere except its
    first occurrence (ordered by (id, position) — deterministic and
    batching-independent), and rebuild the doc texts. Paragraphs
    shorter than `min_para_chars` (headings, separators) never
    participate — they are always kept in place. Returns
    (id_col, text_col) with the rebuilt text; a doc whose every
    paragraph was dropped comes back as the empty string, not a lost
    row. `id_col` may be any orderable type (int doc ids, string
    urls): the occurrence rank is a struct min, which both Spark and
    DuckDB order field-wise (exactly tuple order).

    100 TB plan: one shuffle on the paragraph hash with a MIN
    aggregate — map-side partial aggregation collapses a viral
    boilerplate paragraph's 10^9 occurrences before the exchange,
    where a window/row_number formulation would funnel every
    occurrence of the hot key into a single task — then an equi-join
    back on the hash and one groupBy(id) to reassemble. No all-pairs
    anywhere; skew-safe by construction.

    The reference's analog is crop-level dedup bookkeeping: CollectNode
    drops already-collected crops of a doc rather than re-emitting them
    (reference: deploy/py_infer/src/parallel/module/common/
    collect_node.py:72-99)."""
    keyed = _exploded_segments(docs, text_col, id_col, sep)
    firsts = (
        keyed.where(F.length("para") >= min_para_chars)
        .groupBy("ph")
        .agg(F.min("occ").alias("first_occ"))
    )
    kept = keyed.join(firsts, "ph", "left").where(
        (F.length("para") < min_para_chars)
        | (F.col("occ") == F.col("first_occ"))
    )
    return _rebuild_docs(kept, keyed, text_col, id_col, sep)


def within_doc_dedup(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_para_chars: int = 30,
    sep: str = "\n",
) -> DataFrame:
    """WITHIN-document repeated-line removal (the RefinedWeb/C4
    page-local complement of :func:`paragraph_dedup`): a line repeated
    inside the SAME doc keeps only its first occurrence; the same line
    in a different doc is untouched — navigation chrome duplicated
    down one page collapses while legitimately shared content (site
    boilerplate handled by the corpus-level rules) survives here.
    Lines shorter than `min_para_chars` never participate. Same
    return contract as paragraph_dedup: (id, rebuilt text), hollowed
    docs come back as '' not lost rows.

    100 TB plan: identical shape to paragraph_dedup but the aggregate
    key is (doc, line-hash) — the doc id in the key makes it uniform
    by construction (no viral hot key is even possible), so this is
    the cheapest dedup pass in the family: one skew-free shuffle +
    the rebuild groupBy. reference: collect_node.py:72-99 (per-doc
    bookkeeping dropping re-emitted crops of the SAME image)."""
    keyed = _exploded_segments(docs, text_col, id_col, sep)
    firsts = (
        keyed.where(F.length("para") >= min_para_chars)
        .groupBy(id_col, "ph")
        .agg(F.min("ord").alias("first_ord"))
    )
    kept = keyed.join(firsts, [id_col, "ph"], "left").where(
        (F.length("para") < min_para_chars)
        | (F.col("ord") == F.col("first_ord"))
    )
    return _rebuild_docs(kept, keyed, text_col, id_col, sep)


def _exploded_segments(docs: DataFrame, text_col: str, id_col: str,
                       sep: str) -> DataFrame:
    """Split each doc on the literal `sep` and explode to one row per
    segment: (id, ord, para, ph=md5(para), occ=(id, ord) struct).
    Persisted — the relation always feeds multiple consumers (the
    frequency/first-occurrence aggregate, the keep-join, AND the
    row-preservation anchor). Shared by :func:`paragraph_dedup` and
    :func:`boilerplate_purge`."""
    # F.split takes a Java REGEX; `sep` is a literal separator (and the
    # DuckDB oracle splits literally) — escape it so a metachar sep
    # ("." , "||") splits on the literal string, matching array_join.
    import re

    paras = docs.select(
        F.col(id_col),
        F.posexplode(
            F.split(F.col(text_col), re.escape(sep))
        ).alias("ord", "para"),
    )
    occ = F.struct(F.col(id_col).alias("i"), F.col("ord").alias("o"))
    return tracked_persist(
        paras.withColumn("ph", F.md5("para")).withColumn("occ", occ)
    )


def _rebuild_docs(kept: DataFrame, keyed: DataFrame, text_col: str,
                  id_col: str, sep: str) -> DataFrame:
    """Reassemble (id, text) from surviving segment rows, preserving
    original order. A doc whose EVERY segment was dropped has no group
    in the rebuild — re-anchor on the input ids so it comes back as the
    empty string instead of silently vanishing. Anchor off the persisted
    `keyed` (every doc has ≥1 segment row) rather than re-scanning the
    input lineage a third time."""
    rebuilt = kept.groupBy(id_col).agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("ord", "para"))),
                lambda x: x["para"],
            ),
            sep,
        ).alias(text_col)
    )
    anchor = keyed.select(id_col).distinct()
    return anchor.join(rebuilt, id_col, "left").select(
        id_col, F.coalesce(text_col, F.lit("")).alias(text_col)
    )


def boilerplate_purge(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_df: int = 2,
    min_line_chars: int = 30,
    sep: str = "\n",
) -> DataFrame:
    """Global line-frequency boilerplate removal (the Dolma/CCNet
    complement of :func:`paragraph_dedup`): a line occurring in MORE
    than `max_df` distinct documents is boilerplate (cookie banners,
    footers, subscription prompts) and is removed from EVERY document —
    including the first occurrence, which paragraph dedup would keep.
    Lines shorter than `min_line_chars` never participate (headings,
    list bullets, blank separators stay in place). Returns
    (id_col, text_col) rebuilt in original order; all-boilerplate docs
    come back as the empty string, not a lost row.

    100 TB plan: one shuffle on the line hash with a two-phase distinct
    count (partial (ph, id) dedup map-side collapses a viral banner's
    per-doc repeats before the exchange), an equi-join back on the
    hash, and one groupBy(id) reassembly — same skew-safe shape as
    paragraph dedup, no windows, no all-pairs. The hot set (df >
    max_df) is vanishingly small at any scale, so AQE broadcasts the
    keep-join's build side.

    Reference lineage: the chrome/boilerplate suppression the extraction
    core applies WITHIN a page via link-density scoring
    (reference: mindocr/postprocess/db_postprocess.py:13-150 analog,
    extract_core.score_nodes); this is the corpus-frequency twin that
    catches boilerplate invisible at single-page grain."""
    keyed = _exploded_segments(docs, text_col, id_col, sep)
    dfreq = (
        keyed.where(F.length("para") >= min_line_chars)
        .groupBy("ph")
        .agg(F.count_distinct(F.col(id_col)).alias("line_df"))
    )
    kept = keyed.join(dfreq, "ph", "left").where(
        (F.length("para") < min_line_chars)
        | (F.col("line_df") <= max_df)
    )
    return _rebuild_docs(kept, keyed, text_col, id_col, sep)


# --------------------------------------------------------------------------
# 2. Exact n-gram Jaccard (relational)
# --------------------------------------------------------------------------


def span_dedup(
    docs: DataFrame,
    n: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """C4's sentence-span dedup rule, single pass: any run of `n`
    consecutive sentences that occurs more than once in the corpus
    keeps only its FIRST occurrence (min (id, position) — the same
    deterministic rule every dedup pass in this engine uses); every
    sentence covered by a non-first duplicated span is removed, and
    each doc's text is rebuilt as the space-joined surviving
    sentences. Returns (id, text, n_sents, n_removed); a doc whose
    every sentence drops comes back as '' with its counts, never a
    lost row. Sentences are the :func:`~mindocr_spark.functions.text.
    sentence_split` grain; the span key joins them with U+001F
    (assumed absent from text — it is a C0 control).

    100 TB plan: sentence ranking and span formation are two windows
    on the SAME uniform doc key (one exchange, bounded per-doc rows);
    the span-hash aggregate is one shuffle with a MIN partial — a
    viral span's 10^9 occurrences collapse map-side, the same
    skew-safety argument as paragraph_dedup; the covered-sentence set
    is a distinct + anti-join on (doc, position). No all-pairs
    anywhere. reference: the C4 dataset card's "three-sentence span"
    discard rule, re-expressed as collect_node.py:72-99-style
    first-occurrence bookkeeping at corpus scale."""
    from mindocr_spark.functions.text import sentence_split

    sents = sentence_split(docs, text_col=text_col, id_col=id_col)
    w = Window.partitionBy(id_col).orderBy("sent_idx")
    ranked = tracked_persist(
        sents.select(
            id_col, F.row_number().over(w).alias("rn"), "sentence"
        )
    )
    wr = Window.partitionBy(id_col).orderBy("rn")
    leads = [F.col("sentence")] + [
        F.lead("sentence", i).over(wr) for i in range(1, n)
    ]
    spans = (
        ranked.select(
            id_col, "rn",
            F.md5(F.concat_ws("\x1f", *leads)).alias("sh"),
            leads[-1].isNotNull().alias("_full"),
        )
        .where("_full")
        .withColumn(
            "occ",
            F.struct(F.col(id_col).alias("i"), F.col("rn").alias("o")),
        )
    )
    firsts = spans.groupBy("sh").agg(F.min("occ").alias("first_occ"))
    dups = spans.join(firsts, "sh").where(F.col("occ") != F.col("first_occ"))
    covered = dups.select(
        id_col,
        F.explode(
            F.sequence(F.col("rn"), F.col("rn") + F.lit(n - 1))
        ).alias("rn"),
    ).distinct()
    kept = ranked.join(covered, [id_col, "rn"], "left_anti")
    rebuilt = kept.groupBy(id_col).agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("rn", "sentence"))),
                lambda x: x["sentence"],
            ),
            " ",
        ).alias(text_col),
        F.count(F.lit(1)).alias("_kept"),
    )
    totals = ranked.groupBy(id_col).agg(F.count(F.lit(1)).alias("_n"))
    out = (
        docs.select(id_col)
        .join(totals, id_col, "left")
        .join(rebuilt, id_col, "left")
    )
    n_sents = F.coalesce("_n", F.lit(0)).cast("bigint")
    return out.select(
        id_col,
        F.coalesce(text_col, F.lit("")).alias(text_col),
        n_sents.alias("n_sents"),
        (n_sents - F.coalesce("_kept", F.lit(0))).cast("bigint").alias(
            "n_removed"
        ),
    )


def ngram_jaccard_pairs(df: DataFrame, k: int = 3, threshold: float = 0.5,
                        text_col: str = "text", id_col: str = "doc_id",
                        max_shingle_freq: int = 10_000) -> DataFrame:
    """All pairs with word-k-shingle Jaccard ≥ threshold.

    Plan: distinct (doc, shingle) → self-equi-join on shingle → pair
    intersection counts → join per-doc shingle counts → Jaccard.
    Exact-but-bounded: cost is Σ_shingle freq², so it is the
    *verification* stage; candidate *generation* at scale is
    :func:`minhash_lsh_pairs`. Jaccard is one IEEE division of two exact
    ints, rounded — bit-identical to the SQL oracle.

    `max_shingle_freq` is the standard document-frequency cap: a shingle
    appearing in more than this many docs (a viral boilerplate phrase)
    is excluded from the self-join, bounding join width at freq² per
    shingle instead of corpus-quadratic. Capped shingles still count in
    the per-doc sizes, so surviving pairs' Jaccard is a (tight) lower
    bound; pairs similar ONLY through viral shingles are dropped — the
    same pairs LSH candidate generation would never surface. The default
    changes nothing below 10k-doc shingle frequency.
    """
    inter, sizes = _shingle_intersections(
        df, k=k, text_col=text_col, id_col=id_col,
        max_shingle_freq=max_shingle_freq,
    )
    sa = sizes.select(F.col(id_col).alias("id_a"), F.col("n_sh").alias("n_a"))
    sb = sizes.select(F.col(id_col).alias("id_b"), F.col("n_sh").alias("n_b"))
    jac = F.col("n_inter").cast("double") / (
        F.col("n_a") + F.col("n_b") - F.col("n_inter")
    ).cast("double")
    return (
        inter.join(sa, "id_a")
        .join(sb, "id_b")
        .select(
            "id_a", "id_b", "n_inter", "n_a", "n_b",
            F.round(jac, 6).alias("jaccard"),
        )
        .where(F.round(jac, 6) >= threshold)
    )


def ngram_novelty(df: DataFrame, k: int = 3, text_col: str = "text",
                  id_col: str = "doc_id") -> DataFrame:
    """Per-doc n-gram NOVELTY under crawl order (ascending id): the
    fraction of a doc's distinct word-k-shingles whose FIRST corpus
    occurrence is this doc. The memorization-risk / freshness signal —
    a doc that is 95% previously-seen shingles is template re-spin or
    near-copy even when no single pair crosses a dedup threshold, and
    epoch-level novelty decay is the standard corpus-growth health
    metric (the RefinedWeb/FineWeb "new content per crawl" curve).

    Returns (id, n_shingles, n_novel, novelty) for EVERY input doc —
    docs with fewer than k words report (0, 0, NULL): no evidence, not
    zero novelty. Novelty is one IEEE division of exact ints, rounded
    half-away at 6.

    100 TB shape: two shuffles, both on uniform-ish keys — a window
    min over the shingle key (no per-partition sort beyond the hash
    partitioning; viral shingles are one partition's worth of rows,
    not a join fanout — this is why it is a window and NOT a
    groupBy+join back on the shingle key), then the map-side-combinable
    re-aggregation on the doc key. No self-join anywhere: cost is
    linear in total shingle occurrences, so no df-cap is needed
    (contrast :func:`ngram_jaccard_pairs`).
    """
    sh = word_shingles(df, k=k, text_col=text_col, id_col=id_col)
    first = F.min(id_col).over(Window.partitionBy("shingle"))
    per = (
        sh.select(id_col, (F.col(id_col) == first).cast("bigint")
                  .alias("_novel"))
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_shingles"),
            F.sum("_novel").alias("n_novel"),
        )
    )
    anchored = df.select(id_col).join(per, id_col, "left")
    n_sh = F.coalesce("n_shingles", F.lit(0)).cast("bigint")
    n_nov = F.coalesce("n_novel", F.lit(0)).cast("bigint")
    return anchored.select(
        id_col,
        n_sh.alias("n_shingles"),
        n_nov.alias("n_novel"),
        F.round(
            F.try_divide(n_nov.cast("double"), n_sh.cast("double")), 6
        ).alias("novelty"),
    )


def _shingle_intersections(df: DataFrame, k: int, text_col: str,
                           id_col: str, max_shingle_freq: int):
    """The df-capped shingle-intersection core shared by
    :func:`ngram_jaccard_pairs` and :func:`containment_pairs` — ONE
    definition of the cap rule so the two dedup surfaces cannot drift.

    Returns ``(inter, sizes)``: ``inter`` = (id_a, id_b, n_inter) with
    id_a < id_b, ``sizes`` = (id_col, n_sh) per-doc distinct-shingle
    counts (UNcapped — capped shingles still count toward sizes, so
    downstream metrics are tight lower bounds)."""
    # The shingle relation feeds three consumers (sizes, both join sides);
    # persist so the parse+window subtree runs once, not 3× (at cluster
    # scale this is a staged intermediate table).
    sh = tracked_persist(word_shingles(df, k=k, text_col=text_col, id_col=id_col))
    sizes = sh.groupBy(id_col).agg(F.count("*").alias("n_sh"))
    # df-cap: one count window on the same shingle key the join shuffles
    # on (the exchange is reused), dropping hot posting lists before they
    # explode quadratically
    freq_w = Window.partitionBy("shingle")
    joinable = (
        sh.withColumn("_df", F.count("*").over(freq_w))
        .where(F.col("_df") <= max_shingle_freq)
        .drop("_df")
    )
    a = joinable.alias("a")
    b = joinable.alias("b")
    inter = (
        a.join(b, on="shingle")
        .where(F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
        .groupBy(F.col(f"a.{id_col}").alias("id_a"), F.col(f"b.{id_col}").alias("id_b"))
        .agg(F.count("*").alias("n_inter"))
    )
    return inter, sizes


def containment_pairs(df: DataFrame, k: int = 3, threshold: float = 0.8,
                      text_col: str = "text", id_col: str = "doc_id",
                      max_shingle_freq: int = 10_000) -> DataFrame:
    """Directional near-superset pairs: sub ⊂ sup with shingle
    containment |S(sub) ∩ S(sup)| / |S(sub)| ≥ threshold.

    Jaccard misses the doc-contains-doc case entirely — a quote page, a
    syndicated excerpt, or an aggregator embedding a full article inside
    a longer page has high *containment* but low Jaccard (the union is
    dominated by the superset). Containment is the standard complement
    (Broder's resemblance vs containment, the same shingle machinery),
    and at LLM-corpus scale it is how excerpt spam and wrapper pages are
    caught after Jaccard dedup has run.

    Plan: identical to :func:`ngram_jaccard_pairs` — distinct
    (doc, shingle) → df-capped self-equi-join on shingle → pair
    intersection counts — then each undirected pair fans out to its two
    directions and is filtered on n_inter / n_sub. The direction
    expansion is 2× the *verified pair* count (tiny), never the corpus.
    The df-cap bounds join width exactly as in the Jaccard plan; capped
    shingles still count in n_sub, so reported containment is a tight
    lower bound.

    Output: (sub_id, sup_id, n_inter, n_sub, n_sup, containment) — one
    row per direction passing the threshold (mutual near-dups emit both
    directions; that is the correct reading: each side is mostly inside
    the other).

    Reference lineage: the reference's crop-inside-region subsumption is
    `suppress_contained` over detected boxes (reference:
    mindocr/postprocess/det_east_postprocess.py lanms merge); this is
    the corpus-level twin over shingle sets.
    """
    inter, sizes = _shingle_intersections(
        df, k=k, text_col=text_col, id_col=id_col,
        max_shingle_freq=max_shingle_freq,
    )
    sa = sizes.select(F.col(id_col).alias("id_a"), F.col("n_sh").alias("n_a"))
    sb = sizes.select(F.col(id_col).alias("id_b"), F.col("n_sh").alias("n_b"))
    both = inter.join(sa, "id_a").join(sb, "id_b")
    # both directions from ONE pass over the verified pairs: a
    # two-element explode, not a self-union (a union's two branches
    # would re-execute the whole intersection subtree twice)
    directed = both.select(
        F.explode(F.array(
            F.struct(
                F.col("id_a").alias("sub_id"),
                F.col("id_b").alias("sup_id"),
                F.col("n_inter").alias("n_inter"),
                F.col("n_a").alias("n_sub"),
                F.col("n_b").alias("n_sup"),
            ),
            F.struct(
                F.col("id_b").alias("sub_id"),
                F.col("id_a").alias("sup_id"),
                F.col("n_inter").alias("n_inter"),
                F.col("n_b").alias("n_sub"),
                F.col("n_a").alias("n_sup"),
            ),
        )).alias("_d")
    ).select("_d.*")
    cont = F.round(
        F.col("n_inter").cast("double") / F.col("n_sub").cast("double"), 6
    )
    return directed.select(
        "sub_id", "sup_id", "n_inter", "n_sub", "n_sup",
        cont.alias("containment"),
    ).where(F.col("containment") >= threshold)


# --------------------------------------------------------------------------
# 3. MinHash + banded LSH (the scale path)
# --------------------------------------------------------------------------

#: Pinned universal-hash family over a Mersenne prime: h_i(x) =
#: (a_i·x + b_i) mod p. Parameters derive from i by fixed odd constants —
#: no RNG, so signatures are reproducible across runs/engines. p = 2^31-1
#: keeps a·x < 2^62 (no 64-bit overflow under ANSI arithmetic).
_MERSENNE_31 = (1 << 31) - 1


def _perm_consts(n_perm: int) -> list[tuple[int, int]]:
    """Pinned (a_i, b_i) universal-hash parameters, a ∈ [1, p-1],
    b ∈ [0, p-1], derived from md5 of the perm index — full-range
    multipliers (tiny sequential multipliers correlate the permutations
    and wreck the Jaccard estimate), engine-independent."""
    import hashlib

    def _c(tag: str, i: int, lo: int) -> int:
        h = int.from_bytes(
            hashlib.md5(f"minhash:{tag}:{i}".encode()).digest()[:8], "big"
        )
        return h % (_MERSENNE_31 - lo) + lo

    return [(_c("a", i, 1), _c("b", i, 0)) for i in range(n_perm)]


def minhash_signatures(df: DataFrame, n_perm: int = 64, k: int = 3,
                       text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """(id, perm, minh): MinHash signature as a tall relation.

    Plan: shingles → xxhash64 → ONE groupBy(doc) computing all n_perm
    permutation minima as separate aggregate expressions (min_0..min_63
    over the same row set) → stack() back to the tall shape. The naive
    formulation broadcast-joined an n_perm-row table BEFORE the agg,
    expanding every shingle row n_perm-fold ahead of the shuffle
    (~20M intermediate rows at sf0.1); here map-side partial aggregation
    sees only the shingle rows and the shuffle carries one wide row per
    doc. Identical values (min over the same set), everything JVM-side.
    """
    sh = word_shingles(df, k=k, text_col=text_col, id_col=id_col)
    hashed = sh.select(
        id_col, F.pmod(F.xxhash64("shingle"), F.lit(_MERSENNE_31)).alias("h")
    )
    mins = hashed.groupBy(id_col).agg(*[
        F.min(
            F.pmod(F.lit(a) * F.col("h") + F.lit(b), F.lit(_MERSENNE_31))
        ).alias(f"m{i}")
        for i, (a, b) in enumerate(_perm_consts(n_perm))
    ])
    return _stack_tall(mins, n_perm, id_col)


def _stack_tall(mins: DataFrame, n_perm: int, id_col: str) -> DataFrame:
    """(id, m0..m{n-1}) wide → (id, perm, minh) tall via stack()."""
    stack_args = ", ".join(f"{i}, m{i}" for i in range(n_perm))
    return mins.select(
        id_col,
        F.expr(f"stack({n_perm}, {stack_args}) as (perm, minh)"),
    ).select(id_col, F.col("perm").cast("int").alias("perm"), "minh")


def band_buckets(sig: DataFrame, n_perm: int, bands: int, bucket_agg,
                 id_col: str = "doc_id") -> DataFrame:
    """(id, band, bucket): LSH band buckets from a tall signature
    relation — one groupBy per doc×band; the bucket value is the
    order-insensitive fold of the band's (perm, minh) set."""
    rows_per_band = n_perm // bands
    return (
        sig.withColumn("band", (F.col("perm") / rows_per_band).cast("int"))
        .groupBy(id_col, "band")
        .agg(bucket_agg.alias("bucket"))
    )


def bucket_agg_xxhash64():
    """Band bucket for the xxhash64 family: XOR of per-row hashes —
    order-insensitive, constant memory per group (collect_list+sort
    would buffer whole bands), and the (perm, minh) set fully
    determines the 64-bit bucket."""
    return F.expr("bit_xor(xxhash64(concat_ws(':', perm, minh)))")


def bucket_agg_md5():
    """Band bucket for the engine-portable md5 family: md5 over the
    sorted minh list — bit-identical in any engine."""
    return F.md5(
        F.concat_ws(",", F.sort_array(F.collect_list("minh"))).cast("binary")
    )


def _lsh_pairs_from_signatures(sig: DataFrame, bucket_agg, n_perm: int,
                               bands: int, threshold: float,
                               id_col: str) -> DataFrame:
    """Shared LSH tail: signatures → band buckets → candidate self-join
    → signature-overlap estimate. Both minhash variants (xxhash64 scale
    path, md5 portable twin) differ ONLY in the signature hash and the
    bucket aggregate — keep the candidate/estimate plan in one place."""
    sig = tracked_persist(sig)  # feeds banding AND both sides of the estimate join
    banded = tracked_persist(
        band_buckets(sig, n_perm, bands, bucket_agg, id_col)
    )
    cand = (
        banded.alias("x")
        .join(banded.alias("y"), on=["band", "bucket"])
        .where(F.col(f"x.{id_col}") < F.col(f"y.{id_col}"))
        .select(
            F.col(f"x.{id_col}").alias("id_a"), F.col(f"y.{id_col}").alias("id_b")
        )
        .distinct()
    )
    sa = sig.select(F.col(id_col).alias("id_a"), "perm", F.col("minh").alias("mh_a"))
    sb = sig.select(F.col(id_col).alias("id_b"), "perm", F.col("minh").alias("mh_b"))
    est = (
        cand.join(sa, "id_a")
        .join(sb, ["id_b", "perm"])
        .groupBy("id_a", "id_b")
        .agg(F.sum((F.col("mh_a") == F.col("mh_b")).cast("int")).alias("n_match"))
        .withColumn(
            "est_jaccard",
            F.round(F.col("n_match").cast("double") / F.lit(float(n_perm)), 6),
        )
    )
    return est.where(F.col("est_jaccard") >= threshold)


def minhash_lsh_pairs(df: DataFrame, n_perm: int = 64, bands: int = 16,
                      k: int = 3, threshold: float = 0.5,
                      text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Candidate near-dup pairs via banded LSH + signature-overlap estimate.

    With n_perm=64, bands=16 (rows r=4) the collision threshold is
    (1/16)^(1/4) ≈ 0.5. Plan: signatures → band buckets → self-join on
    (band, bucket) → distinct pairs → join signatures twice →
    est_jaccard = matching perms / n_perm. No all-pairs stage; bucket
    joins are the only quadratic work (AQE skew-split handles a
    degenerate hot bucket).
    Returns (id_a, id_b, n_match, est_jaccard ≥ threshold).
    """
    sig = minhash_signatures(df, n_perm=n_perm, k=k,
                             text_col=text_col, id_col=id_col)
    return _lsh_pairs_from_signatures(
        sig, bucket_agg_xxhash64(), n_perm, bands, threshold, id_col
    )


def minhash_lsh_pairs_md5(
    df: DataFrame, n_perm: int = 32, bands: int = 8, k: int = 3,
    threshold: float = 0.35, text_col: str = "text", id_col: str = "doc_id",
) -> DataFrame:
    """Engine-portable MinHash+LSH: the permutation family is
    ``md5(shingle || ':' || perm)`` with the LEXICOGRAPHIC min as the
    signature element — md5 and string ordering are bit-identical across
    engines, so (unlike the xxhash64 scale path) this variant has an
    exact ANSI-SQL oracle. Same banding/candidate/estimate plan shape.
    Returns (id_a, id_b, n_match, est_jaccard ≥ threshold)."""
    sig = minhash_signatures_md5(df, n_perm=n_perm, k=k,
                                 text_col=text_col, id_col=id_col)
    return _lsh_pairs_from_signatures(
        sig, bucket_agg_md5(), n_perm, bands, threshold, id_col
    )


def minhash_signatures_md5(df: DataFrame, n_perm: int = 32, k: int = 3,
                           text_col: str = "text",
                           id_col: str = "doc_id") -> DataFrame:
    """(id, perm, minh): the engine-portable md5 signature family —
    minh = lexicographic min of md5(shingle || ':' || perm). Same
    one-groupBy/many-mins plan as minhash_signatures: no n_perm× row
    expansion before the shuffle."""
    sh = word_shingles(df, k=k, text_col=text_col, id_col=id_col)
    mins = sh.groupBy(id_col).agg(*[
        F.min(
            F.md5(F.concat_ws(":", F.col("shingle"), F.lit(str(i)))
                  .cast("binary"))
        ).alias(f"m{i}")
        for i in range(n_perm)
    ])
    return _stack_tall(mins, n_perm, id_col)


# --------------------------------------------------------------------------
# 4. SimHash
# --------------------------------------------------------------------------


def _simhash_fold_fn(hashes: pd.Series) -> pd.Series:
    """Fold an array<long> of token hashes into a 64-bit simhash.

    Arrow-batched; numpy bit-bank accumulation per doc (the per-batch
    loop shape of the reference's postprocess,
    reference: mindocr/postprocess/det_db_postprocess.py:77-85).
    Wrapped into a pandas_udf lazily (decorating at module scope would
    require an active SparkSession at import time).
    """
    import numpy as np

    out = []
    for arr in hashes:
        if arr is None or len(arr) == 0:
            out.append(0)
            continue
        h = np.asarray(arr, dtype=np.uint64)
        bits = ((h[:, None] >> np.arange(64, dtype=np.uint64)[None, :]) & 1).astype(
            np.int64
        )
        votes = (2 * bits - 1).sum(axis=0)
        sim = np.uint64(0)
        for j in np.nonzero(votes > 0)[0]:
            sim |= np.uint64(1) << np.uint64(j)
        out.append(int(sim.astype(np.int64)))
    return pd.Series(out, dtype="int64")


def simhash_col(df: DataFrame, text_col: str = "text",
                id_col: str = "doc_id") -> DataFrame:
    """(id, simhash): token hashes computed JVM-side (xxhash64 inside a
    higher-order transform), folded per doc by one Arrow-batched UDF.

    Measured choice, not a shortcut: a pure-JVM formulation (64
    `aggregate` bit-vote folds over the token array) was benchmarked at
    50k docs and lost 3-4× to this vectorized numpy bit-bank — the 64
    separate array traversals cost more in codegen than one Arrow
    transfer plus a single (tokens × 64) matrix reduction. Parity with
    the numpy reference is pinned by pytest either way."""
    from mindocr_spark.functions.text import tokens_col

    toks = df.select(
        id_col,
        F.transform(tokens_col(text_col), lambda w: F.xxhash64(w)).alias("th"),
    )
    fold = pandas_udf(_simhash_fold_fn, "long")
    return toks.select(id_col, fold("th").alias("simhash"))


def _simhash_md5_fold_fn(hex_hashes: pd.Series) -> pd.Series:
    """Fold arrays of md5-hex token hashes (first 16 hex chars = 64 bits)
    into a simhash, emitted as 16-char lowercase hex — string output
    sidesteps signed-64 overflow in SQL engines."""
    import numpy as np

    out = []
    for arr in hex_hashes:
        if arr is None or len(arr) == 0:
            out.append("0" * 16)
            continue
        h = np.array([int(x[:16], 16) for x in arr], dtype=np.uint64)
        bits = ((h[:, None] >> np.arange(64, dtype=np.uint64)[None, :]) & 1).astype(
            np.int64
        )
        votes = (2 * bits - 1).sum(axis=0)
        sim = 0
        for j in np.nonzero(votes > 0)[0]:
            sim |= 1 << int(j)
        out.append(format(sim, "016x"))
    return pd.Series(out, dtype="object")


def simhash_md5_col(df: DataFrame, text_col: str = "text",
                    id_col: str = "doc_id") -> DataFrame:
    """(id, simhash_hex): engine-portable simhash — token hashes are
    md5 (bit-identical everywhere), the bit-vote fold has an exact
    ANSI-SQL twin (bit extraction from hex digits). The xxhash64 variant
    (:func:`simhash_col`) remains the faster scale path."""
    from mindocr_spark.functions.text import tokens_col

    toks = df.select(
        id_col,
        F.transform(
            tokens_col(text_col), lambda w: F.md5(w.cast("binary"))
        ).alias("th"),
    )
    fold = pandas_udf(_simhash_md5_fold_fn, "string")
    return toks.select(id_col, fold("th").alias("simhash_hex"))


def _bucket_capped(chunks: DataFrame, max_bucket_size: int) -> DataFrame:
    """Hot-bucket guard shared by both simhash pair joins: drop
    (chunk, val) buckets larger than the cap before the self-join.
    Degenerate values (e.g. the all-zero simhash of empty/near-empty
    docs) otherwise form one giant bucket with quadratic in-bucket cost.
    Count window runs on the same key the join shuffles on (exchange
    reuse); recall for capped buckets falls back to the other chunks."""
    bw = Window.partitionBy("chunk", "val")
    return (
        chunks.withColumn("_bf", F.count("*").over(bw))
        .where(F.col("_bf") <= max_bucket_size)
        .drop("_bf")
    )


def simhash_pairs(df: DataFrame, max_hamming: int = 3, text_col: str = "text",
                  id_col: str = "doc_id",
                  max_bucket_size: int = 100_000) -> DataFrame:
    """Near-dup pairs with hamming(simhash) ≤ max_hamming.

    Banded candidate join with n_chunks = max_hamming + 1 chunks
    (pigeonhole: ≤ max_hamming differing bits over max_hamming+1 chunks
    ⇒ ≥1 chunk identical — recall is EXACT for the requested radius) →
    exact hamming via bit_count(xor). Scales like LSH: shuffle on chunk
    value, never all-pairs. Bigger radii mean narrower chunks and hotter
    buckets; the standard dedup radius is ≤3 (4×16-bit chunks).

    `max_bucket_size` bounds any one (chunk, value) bucket; a capped
    bucket weakens the exact-recall guarantee only for pairs whose ONLY
    clean chunk was the capped one. Default changes nothing below 100k
    docs per bucket.
    """
    # ≥2 chunks (a single 64-bit "chunk" would overflow the signed mask);
    # capped at 16 → the exact-recall guarantee holds for radii ≤ 15
    n_chunks = max(2, min(max_hamming + 1, 16))
    width = 64 // n_chunks
    # one Arrow-batched fold, then the chunk relation joins itself —
    # persist so the UDF stage runs once.
    sims = tracked_persist(simhash_col(df, text_col=text_col, id_col=id_col))
    chunk_structs = []
    for i in range(n_chunks):
        lo = i * width
        hi = 64 if i == n_chunks - 1 else lo + width
        mask = (1 << (hi - lo)) - 1
        chunk_structs.append(
            F.struct(
                F.lit(i).alias("chunk"),
                F.shiftrightunsigned("simhash", lo)
                .bitwiseAND(F.lit(mask)).alias("val"),
            )
        )
    chunks = tracked_persist(_bucket_capped(
        sims.select(
            id_col, "simhash", F.explode(F.array(*chunk_structs)).alias("c"),
        ).select(id_col, "simhash", "c.chunk", "c.val"),
        max_bucket_size,
    ))
    a = chunks.alias("a")
    b = chunks.alias("b")
    ham = F.bit_count(F.col("a.simhash").bitwiseXOR(F.col("b.simhash")))
    return (
        a.join(b, on=["chunk", "val"])
        .where(F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
            ham.alias("hamming"),
        )
        .where(F.col("hamming") <= max_hamming)
        .distinct()
    )


def _hex_spans(n_chunks: int) -> list[tuple[int, int]]:
    """Partition the 16 hex chars of a 64-bit simhash into n_chunks
    contiguous (start, length) spans, 1-based — the nibble-aligned
    analog of the bit chunks above."""
    base, extra = divmod(16, n_chunks)
    spans, pos = [], 1
    for i in range(n_chunks):
        length = base + (1 if i < extra else 0)
        spans.append((pos, length))
        pos += length
    return spans


def simhash_pairs_md5(df: DataFrame, max_hamming: int = 8,
                      text_col: str = "text", id_col: str = "doc_id",
                      max_bucket_size: int = 100_000) -> DataFrame:
    """Engine-portable twin of :func:`simhash_pairs`: the SAME banded
    candidate-join plan over the md5 simhash (:func:`simhash_md5_col`),
    with hex-substring spans as the chunks and the 64-bit value carried
    as two 32-bit halves (hi, lo via conv) to stay inside signed-64
    arithmetic. Pigeonhole over max_hamming+1 nibble-aligned spans keeps
    recall EXACT for the radius, so the pair set provably equals the
    all-pairs result — which is what the ANSI-SQL oracle computes.
    Returns (id_a, id_b, hamming ≤ max_hamming).
    """
    n_chunks = max(2, min(max_hamming + 1, 16))
    sims = (
        simhash_md5_col(df, text_col=text_col, id_col=id_col)
        .select(
            id_col, "simhash_hex",
            F.conv(F.substring("simhash_hex", 1, 8), 16, 10)
            .cast("long").alias("hi"),
            F.conv(F.substring("simhash_hex", 9, 8), 16, 10)
            .cast("long").alias("lo"),
        )
    )
    sims = tracked_persist(sims)
    chunk_structs = [
        F.struct(
            F.lit(i).alias("chunk"),
            F.substring("simhash_hex", start, length).alias("val"),
        )
        for i, (start, length) in enumerate(_hex_spans(n_chunks))
    ]
    chunks = tracked_persist(_bucket_capped(
        sims.select(
            id_col, "hi", "lo", F.explode(F.array(*chunk_structs)).alias("c"),
        ).select(id_col, "hi", "lo", "c.chunk", "c.val"),
        max_bucket_size,
    ))
    a = chunks.alias("a")
    b = chunks.alias("b")
    ham = (
        F.bit_count(F.col("a.hi").bitwiseXOR(F.col("b.hi")))
        + F.bit_count(F.col("a.lo").bitwiseXOR(F.col("b.lo")))
    )
    return (
        a.join(b, on=["chunk", "val"])
        .where(F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
            ham.alias("hamming"),
        )
        .where(F.col("hamming") <= max_hamming)
        .distinct()
    )


# --------------------------------------------------------------------------
# 6. Connected components (transitive duplicate clusters)
# --------------------------------------------------------------------------


def connected_components(
    edges: DataFrame,
    vertices: DataFrame | None = None,
    id_col: str = "doc_id",
    src_col: str = "id_a",
    dst_col: str = "id_b",
    max_iter: int = 50,
) -> DataFrame:
    """(id, component) labels for the undirected graph given by
    ``edges`` — ``component`` is the MINIMUM id reachable from each
    node, so two docs share a component iff they are connected through
    any chain of near-dup pairs. This is the transitive-closure step
    every production LLM dedup pipeline runs over its candidate pairs
    (RefinedWeb / SlimPajama style): a pairwise victim rule leaves
    chain members alive whenever a doc is only ever the *smaller* side
    of its pairs; component collapse keeps exactly one doc per cluster.

    Algorithm: iterative min-label propagation with POINTER DOUBLING.
    Each pass every node (a) takes the min of its own label and its
    neighbors' labels (hook), then (b) replaces its label with its
    label's label (compress — every label IS a node id, so the label
    table self-joins as a parent map). Hook alone needs diameter
    passes; hook+compress contracts a path of length d in O(log d)
    passes, the same doubling argument as Shiloach–Vishkin. The driver
    loop stops when a pass changes nothing. Deterministic — exact MIN
    over ids, no randomness, so it has an exact recursive-CTE SQL twin
    (the fixed point — min reachable id — is identical with or without
    the compress step; compress only accelerates convergence).

    100 TB plan: per pass, one equi-join of the (persisted, symmetric)
    edge list with the label table, one map-side-combinable MIN
    aggregate, and one self-join on the label key — all hash-
    partitioned on node id, no all-pairs stage. Pass count is
    O(log diameter); `max_iter` guards adversarial graphs. Each pass
    ends in `localCheckpoint`, truncating lineage so the logical plan
    stays CONSTANT-size per pass — without it the plan tree doubles
    per iteration and the driver OOMs in Catalyst analysis around
    30 passes (measured: a 1 GiB driver heap died generating the plan
    string at pass ~30 on a 96-image variant-chain graph). On a real
    cluster swap localCheckpoint for reliable `checkpoint` against the
    job's checkpoint dir so executor loss cannot lose label blocks.

    Reference analog: CollectNode folds per-crop results into one
    per-image group before emitting — the same gather-to-a-canonical-
    representative shape (reference: deploy/py_infer/src/parallel/
    module/common/collect_node.py:72-99)."""
    a, b = F.col(src_col), F.col(dst_col)
    # The raw edge projection feeds sym (both directions) AND the node
    # set — persist it so the (possibly expensive) pair-generation
    # subtree upstream evaluates exactly once.
    from mindocr_spark.cache import (
        release_local_checkpoint,
        tracked_local_checkpoint,
    )

    raw = tracked_persist(edges.select(a.alias("src"), b.alias("dst")))
    # localCheckpoint (not persist): sym is re-embedded in EVERY pass's
    # plan — truncating its lineage here keeps the per-pass plan free
    # of the (possibly huge) pair-generation subtree. Checkpoint blocks
    # live outside the CacheManager, so superseded per-pass tables are
    # released EXPLICITLY below and sym/intermediates register with the
    # ambient persist_scope; only the returned label table waits for
    # the ContextCleaner (it must outlive this function).
    sym = tracked_local_checkpoint(
        raw.where(F.col("src") != F.col("dst"))
        .union(
            raw.select(F.col("dst").alias("src"),
                       F.col("src").alias("dst"))
            .where(F.col("src") != F.col("dst"))
        )
        .distinct()
    )
    # Propagation runs over EDGE-ENDPOINT nodes only: a doc with no
    # near-dup pair can never change its label, so shuffling all 10^12
    # corpus labels per pass would be pure waste — the pair graph's
    # node set is a tiny fraction of the corpus. Isolated vertices are
    # anchored back in (component = self) after convergence, one
    # left-join outside the loop.
    nodes = (
        raw.select(F.col("src").alias("id"))
        .union(raw.select(F.col("dst").alias("id")))
        .distinct()
    )
    labels = (
        nodes.select("id", F.col("id").alias("component"))
        .localCheckpoint()
    )
    for _ in range(max_iter):
        # hook: min over own label and neighbors' labels
        neigh = sym.join(
            labels.select(F.col("id").alias("src"), "component"), "src"
        ).select(F.col("dst").alias("id"), "component")
        hooked = (
            labels.unionByName(neigh)
            .groupBy("id")
            .agg(F.min("component").alias("component"))
        )
        # compress (pointer doubling): component ← label[component].
        # Every component value is a node id with a label row, so the
        # inner self-join preserves all rows.
        parent = hooked.select(
            F.col("id").alias("component"),
            F.col("component").alias("_grandparent"),
        )
        new = (
            hooked.join(parent, "component")
            .select("id", F.col("_grandparent").alias("component"))
            .localCheckpoint()  # truncate lineage: constant plan/pass
        )
        changed = new.join(
            labels.select("id", F.col("component").alias("prev")), "id"
        ).where(F.col("component") != F.col("prev"))
        done = changed.isEmpty()
        release_local_checkpoint(labels)  # superseded; blocks freed now
        labels = new
        if done:
            break
    else:
        raise RuntimeError(
            f"connected_components did not converge in {max_iter} "
            f"passes (graph diameter exceeds max_iter; raise it or "
            f"use a star-contraction variant)"
        )
    release_local_checkpoint(sym)  # the loop was its only consumer
    if vertices is None:
        return labels
    verts = vertices.select(F.col(id_col).alias("id")).distinct()
    return verts.join(labels, "id", "left").select(
        "id", F.coalesce("component", F.col("id")).alias("component")
    )


# --------------------------------------------------------------------------
# 7. Benchmark decontamination (eval-set n-gram overlap)
# --------------------------------------------------------------------------


def decontaminate_flags(
    docs: DataFrame,
    benchmark: DataFrame,
    k: int = 13,
    min_hits: int = 1,
    text_col: str = "text",
    id_col: str = "doc_id",
    bench_text_col: str = "text",
) -> DataFrame:
    """Flag training documents that overlap an evaluation benchmark —
    the standard decontamination pass (GPT-3 used 13-gram collision,
    Llama-family pipelines the same family of checks): any doc sharing
    at least `min_hits` distinct word `k`-shingles with ANY benchmark
    item is contaminated and must not be trained on.

    Returns every input doc with (n_contaminated_shingles,
    is_contaminated) — flag-style (like :func:`exact_dup_clusters`) so
    the caller chooses drop vs audit, and no row ever vanishes.

    100 TB plan: benchmarks are SMALL (10^4-10^6 items, a few hundred
    MB of shingles) against a 10^12-doc corpus — so the benchmark
    shingle set is BROADCAST and the corpus side never shuffles for
    the probe; the only exchange is the per-doc hit-count groupBy on
    the uniform doc id. A shingle-key equi-join (shuffling the corpus
    shingles) would move ~10^14 rows to probe a relation that fits in
    memory. k=13 makes incidental collisions in natural text
    vanishingly rare, so `min_hits=1` is the standard setting.

    Reference analog: the golden-eval key-set equality join —
    membership of a sample in the held-out set decides its handling
    (reference: deploy/eval_utils/eval_pipeline.py:104-107)."""
    from mindocr_spark.functions.text import word_shingles

    doc_sh = word_shingles(docs, k=k, text_col=text_col, id_col=id_col)
    bench_sh = F.broadcast(
        word_shingles(
            benchmark.select(F.col(bench_text_col).alias("text")),
            k=k, text_col="text", id_col="text",
        ).select("shingle").distinct()
    )
    hits = (
        doc_sh.join(bench_sh, "shingle")
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).alias("n_contaminated_shingles"))
    )
    return (
        docs.select(id_col)
        .join(hits, id_col, "left")
        .select(
            id_col,
            F.coalesce(
                "n_contaminated_shingles", F.lit(0)
            ).alias("n_contaminated_shingles"),
            (
                F.coalesce("n_contaminated_shingles", F.lit(0))
                >= min_hits
            ).alias("is_contaminated"),
        )
    )


def shingle_hotlist(
    df: DataFrame,
    k: int = 3,
    top: int = 100,
    min_doc_freq: int = 1,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Corpus-wide heavy-hitter phrases: the `top` word k-shingles by
    DOCUMENT frequency (each doc counts a shingle once), ties broken
    lexicographically. This is the list the viral-boilerplate caps are
    derived FROM — a curation team inspects the hotlist, then feeds it
    into ``max_shingle_freq`` / blockword gates; it is also the C4
    "policy phrase" discovery step.

    100 TB shape: narrow shingle generation (the :func:`word_shingles`
    no-window explode), ONE groupBy on the shingle key with a
    map-side-combinable count, then a global top-k that Spark executes
    as TakeOrderedAndProject (per-partition heaps + a driver-side
    merge of `top` rows per partition — no full sort, no second
    shuffle). The heavy hitters are by definition the high-frequency
    keys, so the count itself is the skew absorber: a shingle in 10^9
    docs reaches its reducer as one partial row per upstream task.
    """
    from .text import word_shingles

    sh = word_shingles(df, k=k, text_col=text_col, id_col=id_col)
    counts = sh.groupBy("shingle").agg(
        F.count("*").cast("bigint").alias("doc_freq")
    )
    return (
        counts.where(F.col("doc_freq") >= min_doc_freq)
        .orderBy(F.desc("doc_freq"), "shingle")
        .limit(top)
    )


def editdist_verify(
    docs: DataFrame,
    prefix_chars: int = 64,
    max_block: int = 8,
    sim_num: int = 9,
    sim_den: int = 10,
) -> DataFrame:
    """Edit-distance VERIFICATION of blocked near-dup candidates — the
    exact stage a fuzzy-dedup pipeline runs after cheap candidate
    generation: block on a content prefix hash, pair within block,
    then accept only pairs whose normalized edit similarity
    ``1 − lev/max_len`` clears ``sim_num/sim_den`` (default 0.9).
    The threshold test is INTEGER arithmetic
    (``sim_den·(max_len − lev) ≥ sim_num·max_len``) so both engines
    decide ties identically — no float division anywhere.

    Returns (doc_a, doc_b, lev, max_len, is_dup) per surviving
    candidate pair.

    100 TB shape: the only pair-producing join is keyed by the
    prefix-hash block, and blocks above ``max_block`` members are
    dropped BEFORE pairing (the df-cap discipline of
    :func:`ngram_jaccard_pairs` — a boilerplate prefix shared by 10^6
    docs must not pair 10^12 times; callers route such blocks to the
    MinHash family instead). Within a block the Levenshtein DP is
    O(len²) per pair but block size is capped, so total work is
    Σ min(block, cap)² — linear in corpus size. One shuffle on the
    block key (md5 — uniform), one on the size gate.

    Reference lineage: the rec stage re-scores det-stage candidates
    with the expensive exact model only on cropped candidate regions
    (reference: tools/infer/text/predict_system.py:72-90); this is
    the same generate-cheap / verify-exact split for dedup.
    """
    key = F.md5(
        F.substring("text", 1, prefix_chars).cast("binary")
    ).alias("k")
    keyed = docs.select(F.col("doc_id"), F.col("text"), key)
    small = (
        keyed.groupBy("k")
        .agg(F.count("*").alias("n"))
        .where(F.col("n") <= max_block)
        .select("k")
    )
    keyed = keyed.join(small, "k")
    left = keyed.select(
        "k", F.col("doc_id").alias("doc_a"), F.col("text").alias("ta")
    )
    right = keyed.select(
        F.col("k").alias("k2"),
        F.col("doc_id").alias("doc_b"),
        F.col("text").alias("tb"),
    )
    pairs = left.join(
        right, (F.col("k") == F.col("k2")) & (F.col("doc_a") < F.col("doc_b"))
    )
    lev = F.levenshtein("ta", "tb")
    mx = F.greatest(F.length("ta"), F.length("tb"))
    return pairs.select(
        "doc_a",
        "doc_b",
        lev.cast("bigint").alias("lev"),
        mx.cast("bigint").alias("max_len"),
        (
            F.lit(sim_den) * (mx - lev) >= F.lit(sim_num) * mx
        ).alias("is_dup"),
    )


def dup_alignment(
    docs: DataFrame,
    pairs: DataFrame,
    k: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Explainable near-dup EVIDENCE for candidate pairs — what a
    reviewer (or an automated survivor policy) needs beyond a
    similarity score: how much is shared and WHERE. Per (doc_a,
    doc_b) pair: ``n_shared`` distinct common word-k-shingles,
    and the longest ALIGNED run — the maximal streak of consecutive
    shingle positions matching at one constant offset (``run_len``,
    ``align_offset`` = pa − pb, ``run_start_a``), i.e. the longest
    verbatim copied block measured in shingles. Ties break
    deterministically: longest run, then smallest offset, then
    smallest start. Pairs sharing no shingle produce no row.

    The run detection is the relational gaps-and-islands idiom:
    distinct (pair, offset, pa) → ``pa − row_number()`` groups each
    consecutive streak → one count per streak.

    100 TB shape: positional shingle generation is the same NARROW
    array-expression pattern as :func:`~mindocr_spark.functions.text.
    word_shingles` (no window); the shingle relation is SEMI-bounded
    by joining the (small) candidate-pair relation FIRST, so corpus-
    wide shingles never self-join — cost is Σ per-pair shingle
    counts, linear in the candidate set. Two windows ride the same
    (pair, offset) key.

    Reference lineage: eval doesn't just score a detection, it
    reports WHICH GT box matched which prediction via the IoU match
    matrix (reference: mindocr/metrics/det_metrics.py:31-77) — same
    match-evidence contract for dedup.
    """
    from mindocr_spark.functions.text import tokens_col

    with_toks = docs.select(id_col, tokens_col(text_col).alias("_toks"))
    toks = F.col("_toks")
    sh_arr = F.when(
        F.size(toks) >= k,
        F.transform(
            F.sequence(F.lit(1), F.size(toks) - (k - 1)),
            lambda i: F.struct(
                i.alias("pos"),
                F.array_join(F.slice(toks, i, k), " ").alias("sh"),
            ),
        ),
    ).otherwise(
        F.array().cast("array<struct<pos:int,sh:string>>")
    )
    shp = with_toks.select(
        id_col, F.explode(sh_arr).alias("s")
    ).select(
        F.col(id_col).alias("sdoc"),
        F.col("s.pos").alias("pos"),
        F.col("s.sh").alias("sh"),
    )
    a = pairs.join(
        shp.select(
            F.col("sdoc").alias("doc_a"),
            F.col("pos").alias("pa"),
            "sh",
        ),
        "doc_a",
    )
    m = a.join(
        shp.select(
            F.col("sdoc").alias("bdoc"),
            F.col("pos").alias("pb"),
            F.col("sh").alias("sh_b"),
        ),
        (F.col("doc_b") == F.col("bdoc")) & (F.col("sh") == F.col("sh_b")),
    ).select("doc_a", "doc_b", "sh", "pa", "pb")
    shared = m.groupBy("doc_a", "doc_b").agg(
        F.count_distinct("sh").cast("bigint").alias("n_shared")
    )
    offs = m.select(
        "doc_a", "doc_b", (F.col("pa") - F.col("pb")).alias("off"), "pa"
    ).distinct()
    w_rn = Window.partitionBy("doc_a", "doc_b", "off").orderBy("pa")
    runs = offs.withColumn(
        "grp", F.col("pa") - F.row_number().over(w_rn)
    ).groupBy("doc_a", "doc_b", "off", "grp").agg(
        F.count("*").cast("bigint").alias("run_len"),
        F.min("pa").cast("bigint").alias("run_start_a"),
    )
    w_best = Window.partitionBy("doc_a", "doc_b").orderBy(
        F.desc("run_len"), F.asc("off"), F.asc("run_start_a")
    )
    best = runs.withColumn(
        "rk", F.row_number().over(w_best)
    ).where(F.col("rk") == 1)
    return best.join(shared, ["doc_a", "doc_b"]).select(
        "doc_a",
        "doc_b",
        "n_shared",
        "run_len",
        F.col("off").cast("bigint").alias("align_offset"),
        "run_start_a",
    )


def mirror_stats(
    pairs: DataFrame,
    membership: DataFrame,
    min_share: tuple[int, int] = (1, 4),
) -> DataFrame:
    """Site-mirror detection: lift a doc-grain near-dup pair relation
    to the GROUP grain (group = source/domain) and flag group pairs
    whose duplication density says "same site served twice" — the
    host-level signal Common-Crawl-style pipelines use to drop whole
    mirrors instead of re-deciding per page.

    ``pairs``: (id_a, id_b) candidate near-dup doc pairs (any of the
    engine's pair families). ``membership``: (doc_id, group). Returns
    one row per unordered CROSS-group pair: (group_a, group_b,
    n_dup_pairs, n_a, n_b, pair_share, is_mirror) where pair_share =
    n_dup_pairs / min(n_a, n_b) (pairs grain — a doc with two partners
    counts twice; shares can exceed 1.0 on heavily-templated sites)
    and is_mirror is the INTEGER rule n_dup_pairs·den ≥ num·min(n_a,
    n_b) — both engines decide every boundary identically.

    100 TB shape: two uniform broadcast-able joins to label pair
    endpoints (membership is group-cardinality bookkeeping next to the
    corpus), one map-side-combinable groupBy on the unordered group
    pair, one group-size agg joined back at group-pair cardinality.
    The quadratic work happened upstream in the banded pair family —
    this stage is linear in the candidate set.

    Reference analog: CollectNode aggregates per-image results to the
    batch grain before deciding completeness (reference:
    deploy/py_infer/src/parallel/module/common/collect_node.py:72-99);
    this is the same lift-to-container-grain shape."""
    num, den = min_share
    if num < 0 or den < 1:
        raise ValueError(f"min_share must be (num ≥ 0, den ≥ 1)")

    sizes = tracked_persist(
        membership.groupBy("group").agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs")
        )
    )
    lab = (
        pairs.join(
            membership.select(
                F.col("doc_id").alias("id_a"), F.col("group").alias("ga")
            ),
            "id_a",
        )
        .join(
            membership.select(
                F.col("doc_id").alias("id_b"), F.col("group").alias("gb")
            ),
            "id_b",
        )
        .where(F.col("ga") != F.col("gb"))
        .groupBy(
            F.least("ga", "gb").alias("group_a"),
            F.greatest("ga", "gb").alias("group_b"),
        )
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_dup_pairs"))
    )
    mn = F.least("n_a", "n_b")
    return (
        lab.join(
            F.broadcast(
                sizes.select(
                    F.col("group").alias("group_a"),
                    F.col("n_docs").alias("n_a"),
                )
            ),
            "group_a",
        )
        .join(
            F.broadcast(
                sizes.select(
                    F.col("group").alias("group_b"),
                    F.col("n_docs").alias("n_b"),
                )
            ),
            "group_b",
        )
        .select(
            "group_a",
            "group_b",
            "n_dup_pairs",
            "n_a",
            "n_b",
            F.round(
                F.col("n_dup_pairs").cast("double")
                / mn.cast("double"),
                6,
            ).alias("pair_share"),
            (
                F.col("n_dup_pairs") * F.lit(den) >= F.lit(num) * mn
            ).alias("is_mirror"),
        )
    )


#: winnowing position packing: pack = hash·2^20 + (2^20−1 − pos), so
#: BIGINT min == lexicographic min by (hash ASC, pos DESC) — the
#: ROBUST winnowing tie rule (rightmost minimal gram). Bounds per-doc
#: gram positions at 2^20; raise the shift for longer documents.
_WINNOW_POS_BITS = 20
_WINNOW_POS_CAP = 1 << _WINNOW_POS_BITS


def winnow_fingerprints(
    df: DataFrame,
    k: int = 8,
    w: int = 16,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """TRUE winnowing fingerprints (Schleimer/Wilkerson/Aiken 2003,
    the MOSS algorithm) — the upgrade over 0-mod-p sampling
    (:func:`mindocr_spark.functions.text.rolling_fingerprints`) that
    adds the GUARANTEE: every window of w consecutive k-grams
    contributes at least one fingerprint, so any shared substring of
    length ≥ w+k−1 between two documents is provably detected. Mod-p
    sampling has no such bound (a long match can fall entirely
    between kept grams); winnowing is what plagiarism/clone detection
    actually ships.

    Per document: hash all k-char grams of the lowercased
    whitespace-normalized text with the ROLLING Horner polynomial
    (base 257 mod 2^31−1 — the `cdc_chunks` constants, identical
    int64 arithmetic in the DuckDB twin; this replaced a 32-bit
    md5-prefix per position at ~1/10th the per-byte cost), then for
    every window of w consecutive grams select its minimal gram by
    (hash ASC, position DESC) — the robust rightmost tie rule — and
    emit the distinct selections: (id, pos, gram_hash). Documents
    shorter than k+w−1 chars have no complete window and yield no
    rows (callers gate short docs elsewhere). The (hash, pos) pair is
    packed into ONE int64 so the argmin is a plain integer MIN
    (bit-identical everywhere); positions are capped at 2^20 per
    document.

    100 TB shape: the WHOLE op is one narrow Arrow-batched pass —
    vectorized Horner (k fused multiply-adds per doc), packed
    sliding-window min (numpy stride view), per-doc unique — ZERO
    shuffles (the previous plan exploded 1000× gram rows through a
    per-doc window Exchange + distinct; now only the ~2/(w+1)-density
    selections leave the stage). Expected density keeps the
    fingerprint index ~12% of gram volume at w=16.

    Reference analog: DBNet postprocessing selects one representative
    per local score window when assembling kernels
    (reference: mindocr/postprocess/det_db_postprocess.py); this is
    that local-extremum selection over text grams."""
    if k < 2 or w < 2:
        raise ValueError(f"need k >= 2 and w >= 2, got k={k}, w={w}")
    from mindocr_spark.functions.text import (
        CDC_BASE,
        CDC_MOD,
        normalize_col,
    )

    norm = F.lower(normalize_col(text_col))
    id_type = df.schema[id_col].dataType.simpleString()
    src = df.select(F.col(id_col).alias("__id"), norm.alias("_t")).where(
        F.length("_t") >= k + w - 1
    )

    def fn(batches):
        import numpy as np
        import pandas as pd

        from numpy.lib.stride_tricks import sliding_window_view

        cap = _WINNOW_POS_CAP
        for pdf in batches:
            ids, poss, hashes = [], [], []
            for _id, t in zip(pdf["__id"], pdf["_t"]):
                c = np.frombuffer(
                    t.encode("utf-32-le"), dtype=np.uint32
                ).astype(np.int64)
                m = c.size - k + 1
                h = np.zeros(m, dtype=np.int64)
                for j in range(k):
                    h = (h * CDC_BASE + c[j:j + m]) % CDC_MOD
                m2 = min(m, cap - 1)  # 1-based positions < cap
                i = np.arange(1, m2 + 1, dtype=np.int64)
                pack = h[:m2] * cap + (cap - 1 - i)
                if m2 < w:
                    continue
                mins = np.unique(
                    sliding_window_view(pack, w).min(axis=1))
                ids.append(np.full(mins.size, _id))
                poss.append(cap - 1 - (mins % cap))
                hashes.append(mins // cap)
            if ids:
                yield pd.DataFrame({
                    "__id": np.concatenate(ids),
                    "pos": np.concatenate(poss),
                    "gram_hash": np.concatenate(hashes),
                })

    out = src.mapInPandas(
        fn, schema=f"__id {id_type}, pos bigint, gram_hash bigint"
    )
    return out.select(
        F.col("__id").alias(id_col), "pos", "gram_hash")


def prefix_filter_pairs(
    df: DataFrame,
    k: int = 3,
    threshold: float = 0.5,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """All pairs with word-k-shingle Jaccard ≥ threshold — EXACT with
    NO document-frequency cap: PPJoin-style prefix filtering
    (Chaudhuri 2006 / Xiao 2008). Each doc joins on only its
    p = ⌊(1−τ)·|d|⌋ + 1 globally-RAREST shingles (ascending document
    frequency, shingle-lexicographic tie-break); the prefix theorem
    guarantees any pair with J ≥ τ shares at least one prefix
    shingle, so the candidate set is a provable superset and exact
    verification loses nothing. This is the principled exact
    complement to :func:`ngram_jaccard_pairs`'s df-cap: a viral
    boilerplate shingle shared by 10^9 docs never enters the join
    unless it is among a doc's rarest — join width is
    Σ_shingle prefix_freq², self-bounding because prefixes select
    rare keys by construction.

    Exactness discipline: τ is quantized DOWN to τ' = T/10⁶ with
    T = ⌊τ·10⁶⌋−1, so the prefix length p = n − ⌈T·n/10⁶⌉ + 1 and
    the length filter 10⁶·n_a ≥ T·n_b are pure BIGINT arithmetic
    (no IEEE boundary can drop a true pair; τ' < τ−5e-7 covers the
    6dp-rounded verification compare). Verification is the same
    exact intersection count + one IEEE division + round-6 compare
    as ngram_jaccard_pairs.

    Returns (id_a, id_b, n_inter, n_a, n_b, jaccard), id_a < id_b.

    100 TB shape: shingle relation persisted once and reused by the
    frequency count, the per-doc ranking (one Exchange on the doc
    key), the prefix self-join (shuffle on the rare-shingle key),
    and the verification join (doc-key equi-joins). Every shuffle is
    on a key whose heavy hitters are structurally excluded."""
    if not 0.0 < threshold < 1.0:
        raise ValueError("threshold must be in (0, 1)")
    if k < 1:
        raise ValueError("k must be >= 1")
    t_scaled = max(1, int(threshold * 1_000_000) - 1)
    sh = tracked_persist(
        word_shingles(df, k=k, text_col=text_col, id_col=id_col)
    )
    freq = sh.groupBy("shingle").agg(
        F.count(F.lit(1)).cast("bigint").alias("df_")
    )
    sized = sh.groupBy(id_col).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_sh")
    )
    ranked = sh.join(freq, "shingle").join(sized, id_col)
    rn = F.row_number().over(
        Window.partitionBy(id_col).orderBy("df_", "shingle")
    )
    # p = n − ⌈T·n/10⁶⌉ + 1, all-BIGINT (DIV floors; +999999 = ceil)
    p = (
        F.col("n_sh")
        - F.expr(f"({t_scaled} * n_sh + 999999) DIV 1000000")
        + F.lit(1)
    ).cast("bigint")
    prefix = tracked_persist(
        ranked.withColumn("rn", rn)
        .where(F.col("rn") <= p)
        .select(id_col, "shingle", "n_sh")
    )
    pa = prefix.select(
        F.col(id_col).alias("id_a"), "shingle",
        F.col("n_sh").alias("n_a"),
    )
    pb = prefix.select(
        F.col(id_col).alias("id_b"), "shingle",
        F.col("n_sh").alias("n_b"),
    )
    cand = (
        pa.join(pb, "shingle")
        .where(
            (F.col("id_a") < F.col("id_b"))
            & (F.col("n_a") * F.lit(1_000_000)
               >= F.col("n_b") * F.lit(t_scaled))
            & (F.col("n_b") * F.lit(1_000_000)
               >= F.col("n_a") * F.lit(t_scaled))
        )
        .select("id_a", "id_b", "n_a", "n_b")
        .distinct()
    )
    sha = sh.select(F.col(id_col).alias("id_a"), "shingle")
    shb = sh.select(F.col(id_col).alias("id_b"), "shingle")
    inter = (
        cand.join(sha, "id_a")
        .join(shb, ["id_b", "shingle"])
        .groupBy("id_a", "id_b", "n_a", "n_b")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_inter"))
    )
    jac = F.col("n_inter").cast("double") / (
        F.col("n_a") + F.col("n_b") - F.col("n_inter")
    ).cast("double")
    return inter.select(
        "id_a", "id_b", "n_inter", "n_a", "n_b",
        F.round(jac, 6).alias("jaccard"),
    ).where(F.round(jac, 6) >= threshold)

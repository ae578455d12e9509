"""search — inverted-index keyword retrieval (BM25) over the corpus.

Full-text retrieval is the query-side twin of the curation operators:
once a 10^12-doc corpus is extracted and deduped, "find the documents
about X" is an inverted-index problem, and BM25 is the standard
relevance score (the Lucene/Elasticsearch default). This module builds
the posting-list relation and scores a small set of keyword queries
against it, Spark-first:

- the corpus side is tokenized scan-side (whole-stage codegen split,
  no Python) and immediately SEMI-FILTERED against the broadcast query
  vocabulary, so the explode → match step never shuffles the 10^12-doc
  relation — only rows containing a query term survive to the first
  aggregation;
- term frequencies come from one map-side-combinable groupBy on
  (query_id, doc_id, term); document frequencies from one tiny per-term
  agg over the matched postings;
- corpus stats (N, avgdl) are a 1-row aggregate cross-joined back in
  (broadcast, keeps the whole plan lazy — no driver-side action);
- the final top-k is a per-query row_number over the df-bounded
  candidate set (queries are few; candidates per query are at most
  Σ df(term), never the corpus).

Cross-engine determinism: every floating-point step is either
correctly-rounded IEEE (+ - * /) written with identical association in
both engines, or a transcendental (ln) immediately quantized with
round(·, 9); per-term scores are quantized and summed as
DECIMAL(28,9), which is exact and order-independent — the same
discipline as the ANN-IVF centroid oracle.

Reference lineage: the reference's retrieval surface is the det→rec
crop ranking by drop_score (reference: tools/infer/text/predict_system.py
filters results by score); BM25 is the corpus-scale analog of "rank
matches by relevance, keep the top k".
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from .text import tokens_col

#: Lucene-default BM25 parameters, pinned as module constants so the
#: SQL oracle and the Spark plan compile the same literals.
BM25_K1 = 1.2
BM25_B = 0.75


def query_terms_df(spark, queries: dict[int, list[str]]) -> DataFrame:
    """(query_id, term) local relation from a {query_id: [terms]} dict.
    Duplicate terms within one query are collapsed (standard bag-of-
    words query semantics score each distinct term once)."""
    rows = sorted(
        {(int(qid), t) for qid, terms in queries.items() for t in terms}
    )
    return spark.createDataFrame(rows, schema="query_id int, term string")


def postings(docs: DataFrame, id_col: str = "doc_id",
             text_col: str = "text") -> DataFrame:
    """The inverted-index posting relation: (term, doc_id, tf, dl).

    One narrow explode + one map-side-combinable groupBy on
    (term, doc_id) — hash-partitioned on the term key, which is the
    layout a reusable on-disk index wants (bucket by term → a keyword
    lookup scans one bucket). dl (doc token length) rides along via
    max() since it is constant per doc."""
    toks = tokens_col(text_col)
    return (
        docs.select(
            F.col(id_col).alias("doc_id"),
            F.size(toks).alias("dl"),
            F.explode(toks).alias("term"),
        )
        .groupBy("term", "doc_id")
        .agg(F.count("*").alias("tf"), F.max("dl").alias("dl"))
    )


def _tfidf_contribs(docs: DataFrame, id_col: str,
                    text_col: str) -> DataFrame:
    """The shared tf·idf contribution relation: (term, doc_id, tf, df,
    contrib) with contrib = round(tf · round(ln(N/df), 9), 9). This is
    the ONE quantization-sensitive definition both retrieval surfaces
    (:func:`tfidf_topk_terms` keywords and :func:`vsm_topk` cosine)
    and their DuckDB oracles depend on — kept single-sourced so a
    rounding-grain change can never desynchronize the two arms."""
    p = postings(docs, id_col=id_col, text_col=text_col)
    dfq = p.groupBy("term").agg(F.count("*").alias("df"))
    nd = docs.select(F.count("*").alias("n_docs"))
    idf = F.round(
        F.log(F.col("n_docs").cast("double") / F.col("df").cast("double")),
        9,
    )
    return (
        p.join(dfq, "term")
        .join(F.broadcast(nd))
        .select(
            "term", "doc_id", "tf", "df",
            F.round(F.col("tf").cast("double") * idf, 9).alias("contrib"),
        )
    )


def tfidf_topk_terms(docs: DataFrame, k: int = 3, id_col: str = "doc_id",
                     text_col: str = "text") -> DataFrame:
    """Per-document keyword extraction: the top-`k` terms by tf·idf
    with idf = round(ln(N/df), 9) → (doc_id, term, tf, df, score,
    rank). Zero-token docs contribute no keywords (no postings — an
    empty doc has no top terms; row preservation is the caller's
    left-join if needed).

    100 TB shape: unlike :func:`bm25_topk` (broadcast query
    vocabulary), keyword tagging needs the FULL document-frequency
    relation — so this is two honest shuffles: postings groupBy on the
    uniform term key (map-side combinable; the df side collapses to
    vocabulary cardinality before the join back), then the per-doc
    top-k window on the uniform doc key. Both keys are uniform — no
    skew treatment needed."""
    scored = _tfidf_contribs(docs, id_col, text_col).select(
        "doc_id", "term", "tf", "df", F.col("contrib").alias("score")
    )
    w = Window.partitionBy("doc_id").orderBy(
        F.col("score").desc(), F.col("term").asc()
    )
    return (
        scored.withColumn(
            "rank", F.row_number().over(w).cast("bigint")
        )
        .where(F.col("rank") <= k)
        .select("doc_id", "term", "tf", "df", "score", "rank")
    )


def bm25_topk(docs: DataFrame, queries: dict[int, list[str]], k: int = 5,
              id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Score `queries` (query_id → list of terms) against `docs` with
    BM25 and return the top-`k` docs per query:
    (query_id, doc_id, n_terms_hit, score DECIMAL(38,9)).

    score(q, d) = Σ_t round( round(idf(t), 9) · round(tfn(t, d), 9), 9)
      idf(t)    = ln( (N − df + 0.5) / (df + 0.5) + 1 )      [Lucene]
      tfn(t, d) = tf·(k1+1) / (tf + k1·(1 − b + b·dl/avgdl))

    100 TB plan: tokenization and dl are scan-side codegen; the explode
    output is semi-joined against the BROADCAST query vocabulary before
    anything shuffles, so the corpus-side shuffle moves only rows that
    contain a query term. df/N/avgdl are tiny aggregates. Ties break on
    doc_id so the top-k is deterministic.
    """
    spark = docs.sparkSession
    qt = query_terms_df(spark, queries)

    toks = tokens_col(text_col)
    base = docs.select(
        F.col(id_col).alias("doc_id"),
        F.size(toks).alias("dl"),
        F.explode(toks).alias("term"),
    )
    # broadcast vocabulary filter BEFORE the tf groupBy: the 10^12-row
    # side sheds every non-matching token without shuffling
    vocab = qt.select("term").distinct()
    matched = base.join(F.broadcast(vocab), "term")

    tf = matched.groupBy("term", "doc_id").agg(
        F.count("*").alias("tf"), F.max("dl").alias("dl")
    )
    df_t = tf.groupBy("term").agg(
        F.count("*").alias("df")
    )
    stats = docs.select(
        F.count("*").alias("n_docs"),
        F.sum(F.size(tokens_col(text_col))).alias("sum_dl"),
    ).withColumn(
        "avgdl",
        F.round(
            F.col("sum_dl").cast("double") / F.col("n_docs").cast("double"),
            9,
        ),
    )

    nd = F.col("n_docs").cast("double")
    dfd = F.col("df").cast("double")
    idf = F.round(
        F.log((nd - dfd + F.lit(0.5)) / (dfd + F.lit(0.5)) + F.lit(1.0)), 9
    )
    tfd = F.col("tf").cast("double")
    dld = F.col("dl").cast("double")
    tfn = F.round(
        tfd * F.lit(BM25_K1 + 1.0)
        / (
            tfd
            + F.lit(BM25_K1)
            * (F.lit(1.0 - BM25_B) + F.lit(BM25_B) * (dld / F.col("avgdl")))
        ),
        9,
    )

    scored = (
        tf.join(F.broadcast(df_t), "term")
        .join(F.broadcast(stats))
        .join(F.broadcast(qt), "term")
        .select(
            "query_id",
            "doc_id",
            F.round(idf * tfn, 9).cast("decimal(28,9)").alias("tscore"),
        )
    )
    per_doc = scored.groupBy("query_id", "doc_id").agg(
        F.count("*").alias("n_terms_hit"),
        F.sum("tscore").alias("score"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("score").desc(), F.col("doc_id").asc()
    )
    return (
        per_doc.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "doc_id", "n_terms_hit", "score", "rank")
    )


def vsm_topk(docs: DataFrame, queries: dict[int, list[str]], k: int = 5,
             id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Vector-space-model retrieval (the classic second arm of a
    hybrid stack): cosine between the binary query vector and the
    tf·idf document vector, idf = round(ln(N/df), 9) — a genuinely
    different ranking function from BM25 (no saturation, no length
    prior beyond the norm), which is exactly what rank fusion wants.

    score(q, d) = Σ_{t∈q} c(t,d) / (‖d‖·‖q‖), c = round(tf·idf, 9),
    ‖d‖² = Σ_t round(c², 9) — every sum is a DECIMAL(28,9) sum of
    9dp-quantized terms (order-free, engine-exact), the final
    division/sqrt one pinned IEEE expression rounded at 9.

    100 TB shape: unlike bm25_topk, the document NORM needs the full
    document-frequency relation, so this pays the honest full-index
    cost (two map-side-combinable shuffles on uniform term/doc keys —
    the tfidf_topk_terms plan); the query-side dot still sheds
    non-matching postings against the broadcast vocabulary before
    grouping. Docs with a zero vector (every term at df = N) are
    excluded — cosine is undefined there."""
    spark = docs.sparkSession
    qt = query_terms_df(spark, queries)
    contrib = _tfidf_contribs(docs, id_col, text_col).select(
        "term", "doc_id",
        F.col("contrib").cast("decimal(28,9)").alias("c"),
    )
    from mindocr_spark.cache import tracked_persist

    contrib = tracked_persist(contrib)  # feeds norms AND dot
    norms = contrib.groupBy("doc_id").agg(
        F.sum(
            F.round(F.col("c").cast("double") * F.col("c").cast("double"), 9)
            .cast("decimal(28,9)")
        ).alias("n2")
    ).where(F.col("n2") > 0)
    dot = contrib.join(F.broadcast(qt), "term").groupBy(
        "query_id", "doc_id"
    ).agg(
        F.count("*").alias("n_terms_hit"),
        F.sum("c").alias("dot"),
    )
    nq = qt.groupBy("query_id").agg(F.count("*").alias("nq"))
    scored = dot.join(norms, "doc_id").join(F.broadcast(nq), "query_id")
    score = F.round(
        F.col("dot").cast("double")
        / (F.sqrt(F.col("n2").cast("double"))
           * F.sqrt(F.col("nq").cast("double"))),
        9,
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("score").desc(), F.col("doc_id").asc()
    )
    return (
        scored.select("query_id", "doc_id", "n_terms_hit",
                      score.alias("score"))
        .withColumn("rank", F.row_number().over(w).cast("bigint"))
        .where(F.col("rank") <= k)
        .select("query_id", "doc_id", "n_terms_hit", "score", "rank")
    )


def rrf_weights(c: int, k: int) -> list[tuple[int, str]]:
    """Reciprocal-rank-fusion weights 1/(c+rank) for rank = 1..k as
    EXACT 12-dp decimal strings (floor division over integers — no
    float, no engine rounding): one rendering feeds both engines."""
    if c < 0 or k < 1:
        raise ValueError(f"need c ≥ 0 and k ≥ 1, got {c}/{k}")
    out = []
    for r in range(1, k + 1):
        scaled = 10 ** 12 // (c + r)
        # split whole/fraction explicitly: c=0, r=1 gives scaled=10^12
        # (13 digits) and a naive "0.{:012d}" render would emit 0.1
        whole, frac = divmod(scaled, 10 ** 12)
        out.append((r, f"{whole}.{frac:012d}"))
    return out


def rrf_fuse(rankings: dict[str, DataFrame], c: int = 60,
             k: int = 10) -> DataFrame:
    """Reciprocal-rank fusion (Cormack et al. 2009) of named retriever
    rankings — the standard hybrid-search combiner (lexical + vector
    arms fused WITHOUT score calibration, since only ranks enter):
    rrf(q, d) = Σ_arms 1/(c + rank_arm(d)). Returns one row per fused
    candidate with per-arm ranks (NULL where an arm missed the doc),
    n_arms, rrf_score, and the fused rank.

    Each input needs (query_id, doc_id, rank); ranks beyond `k` are
    ignored. Weights join as a broadcast 12-dp DECIMAL literal table
    (exact integer rendering — no float summation order anywhere), so
    the fused scores are bit-identical across engines and partition
    counts. 100 TB shape: arms arrive already top-k (tiny relations);
    fusion is one union + one groupBy at candidate cardinality."""
    if not rankings:
        raise ValueError("need at least one ranking")
    from decimal import Decimal

    arms = None
    for name, df in sorted(rankings.items()):
        part = df.select(
            F.lit(name).alias("arm"),
            F.col("query_id"), F.col("doc_id"),
            F.col("rank").cast("int").alias("rank"),
        ).where(F.col("rank") <= k)
        arms = part if arms is None else arms.unionByName(part)
    spark = arms.sparkSession
    wdf = spark.createDataFrame(
        [(r, Decimal(s)) for r, s in rrf_weights(c, k)],
        "rank int, w decimal(20,12)",
    )
    rank_cols = [
        F.max(F.when(F.col("arm") == name, F.col("rank")))
        .cast("bigint").alias(f"{name}_rank")
        for name in sorted(rankings)
    ]
    fused = arms.join(F.broadcast(wdf), "rank").groupBy(
        "query_id", "doc_id"
    ).agg(
        F.count("*").cast("bigint").alias("n_arms"),
        F.sum("w").alias("rrf_score"),
        *rank_cols,
    )
    wf = Window.partitionBy("query_id").orderBy(
        F.col("rrf_score").desc(), F.col("doc_id").asc()
    )
    return fused.withColumn(
        "fused_rank", F.row_number().over(wf).cast("bigint")
    )


# --------------------------------------------------------------------------
# Positional postings + exact phrase search
# --------------------------------------------------------------------------


def phrase_query_df(spark, phrases: dict[int, list[str]]) -> DataFrame:
    """(query_id, slot, term, m) local relation from {query_id:
    [tokens]} — slots keep duplicate terms (a phrase is a SEQUENCE,
    not a bag; ["table", "table", "key"] needs both table slots)."""
    rows = []
    for qid, terms in sorted(phrases.items()):
        if not terms:
            raise ValueError(f"phrase {qid} is empty")
        for j, t in enumerate(terms):
            rows.append((int(qid), j, t, len(terms)))
    return spark.createDataFrame(
        rows, schema="query_id int, slot int, term string, m int"
    )


def positional_postings(docs: DataFrame, id_col: str = "doc_id",
                        text_col: str = "text",
                        vocab: DataFrame | None = None) -> DataFrame:
    """The POSITIONAL inverted-index relation: (term, doc_id,
    positions) with token offsets sorted ascending — what phrase and
    proximity queries consume (the Lucene positions-enabled field
    analog of :func:`postings`).

    One narrow posexplode + one groupBy on the COMPOSITE (term,
    doc_id) key: the doc id in the key splits a stopword-grade hot
    term across reducers — posting-list construction has no hot-key
    straggler — and each position list is bounded by its own doc's
    length.

    `vocab` (a 1-column `term` relation, broadcast) semi-filters the
    token stream BEFORE the groupBy — the BM25 discipline: when the
    consumer only needs a known term set (phrase queries), the
    10^12-row corpus side sheds every non-matching token scan-side and
    never shuffles it."""
    toks = tokens_col(text_col)
    t = docs.select(
        F.col(id_col).alias("doc_id"),
        F.posexplode(toks).alias("pos", "term"),
    )
    if vocab is not None:
        t = t.join(F.broadcast(vocab.select("term").distinct()),
                   "term", "left_semi")
    return (
        t.groupBy("term", "doc_id")
        .agg(F.sort_array(F.collect_list("pos")).alias("positions"))
    )


def phrase_search(docs: DataFrame, phrases: dict[int, list[str]],
                  id_col: str = "doc_id",
                  text_col: str = "text") -> DataFrame:
    """Exact phrase matching over positional postings: for each pinned
    phrase, every doc containing the token sequence CONSECUTIVELY,
    with its occurrence count — (query_id, doc_id, n_occurrences),
    matches only.

    The classic positional-intersection plan: slot j's positions shift
    by −j, and the phrase's start positions are the intersection of
    all shifted lists. Docs missing ANY slot term drop before the
    intersection (size(ps) = m guard).

    100 TB shape: the BM25 discipline — the corpus side is semi-joined
    against the BROADCAST phrase vocabulary right after the explode,
    so only rows whose term appears in some phrase reach the postings
    groupBy (and its key includes doc_id: no hot-term straggler). The
    per-(query, doc) intersection is JVM ``array_intersect`` over
    doc-length-bounded arrays — no Python anywhere."""
    occ = phrase_occurrences(
        docs, phrases, id_col=id_col, text_col=text_col
    )
    return (
        occ.select(
            "query_id", "doc_id", F.size("starts").alias("n_occurrences")
        )
        .where(F.col("n_occurrences") >= 1)
    )


def phrase_occurrences(docs: DataFrame, phrases: dict[int, list[str]],
                       id_col: str = "doc_id",
                       text_col: str = "text") -> DataFrame:
    """The shared positional-intersection core: (query_id, doc_id, m,
    starts) where `starts` is the sorted 0-based token offsets at
    which the phrase begins. :func:`phrase_search` counts the list;
    :func:`concordance` explodes it — one plan, two consumers, so the
    occurrence semantics can never drift between them."""
    q = phrase_query_df(docs.sparkSession, phrases)
    matched = positional_postings(
        docs, id_col=id_col, text_col=text_col, vocab=q
    ).join(F.broadcast(q), "term")
    g = matched.select(
        "query_id",
        "doc_id",
        "m",
        F.struct(
            F.col("slot"),
            F.transform(
                F.col("positions"), lambda p: p - F.col("slot")
            ).alias("shifted"),
        ).alias("sp"),
    ).groupBy("query_id", "doc_id", "m").agg(
        F.sort_array(F.collect_list("sp")).alias("ps")
    )
    occ = F.aggregate(
        F.slice(F.col("ps"), 2, F.size("ps") - 1),
        F.col("ps")[0]["shifted"],
        lambda acc, x: F.array_intersect(acc, x["shifted"]),
    )
    return (
        g.where(F.size("ps") == F.col("m"))
        .select(
            "query_id", "doc_id", "m",
            F.array_sort(occ).alias("starts"),
        )
    )


def concordance(docs: DataFrame, phrases: dict[int, list[str]],
                window: int = 3, id_col: str = "doc_id",
                text_col: str = "text") -> DataFrame:
    """KWIC concordance (keyword-in-context): every phrase occurrence
    with its ±`window` tokens of context — (query_id, doc_id, pos
    [1-based token offset], left_ctx, phrase, right_ctx). The corpus-
    inspection surface every curation decision review needs (what does
    "click here to subscribe" actually look like in situ?), and the
    provenance grain for phrase-level policy filters.

    Context slices clamp at document edges (empty string, not NULL —
    a margin-of-document hit has empty context, which IS the answer).

    100 TB shape: occurrence generation is :func:`phrase_occurrences`
    (broadcast-vocab semi-join before any shuffle — the corpus sheds
    every non-matching token scan-side); the context join re-reads
    ONLY matching docs' token arrays via one equi-join on the doc key
    (occurrence cardinality ≪ corpus), then slicing is row-local JVM
    array work.

    Reference lineage: `crop_text_region` — every detected region is
    cut out WITH its surrounding pixels for the downstream stage
    (reference: deploy/py_infer/src/data_process/utils/cv_utils.py) —
    the same hit-plus-context extraction at token grain."""
    occ = phrase_occurrences(
        docs, phrases, id_col=id_col, text_col=text_col
    )
    hits = occ.select(
        "query_id", "doc_id", "m", F.explode("starts").alias("p0")
    )
    toks_df = docs.select(
        F.col(id_col).alias("doc_id"), tokens_col(text_col).alias("_toks")
    )
    j = hits.join(toks_df, "doc_id")
    pos = F.col("p0") + 1  # 1-based (the sentence_split offset rule)
    m = F.col("m")
    n = F.size("_toks")
    start_l = F.greatest(F.lit(1), pos - window)
    len_l = pos - start_l
    len_r = F.least(F.lit(window), n - (pos + m - 1))
    empty = F.lit("")
    return j.select(
        "query_id",
        "doc_id",
        pos.cast("int").alias("pos"),
        F.when(
            len_l > 0, F.array_join(F.slice("_toks", start_l, len_l), " ")
        ).otherwise(empty).alias("left_ctx"),
        F.array_join(F.slice("_toks", pos, m), " ").alias("phrase"),
        F.when(
            len_r > 0,
            F.array_join(F.slice("_toks", pos + m, len_r), " "),
        ).otherwise(empty).alias("right_ctx"),
    )


def tfidf_cosine_topk(
    docs: DataFrame,
    k: int = 3,
    max_df: int | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Sparse tf·idf cosine similarity join: each document's top-`k`
    nearest neighbours in the weighted bag-of-words space —
    (doc_id, nbr, cosine, rank). The classic lexical near-duplicate /
    related-document signal complementing the hash families (minhash
    estimates SET overlap; this measures WEIGHTED term-distribution
    similarity, sensitive to tf and rarity).

    Weights w = round(tf · round(ln(N/df), 9), 9) (the
    `tfidf_topk_terms` score); norms and dot products are DECIMAL(28,9)
    sums of 9-dp-quantized products (order-independent, exact);
    cosine = round(dot / (√n2_a · √n2_b), 6) with every operand cast
    to DOUBLE before arithmetic — sqrt is correctly rounded in IEEE
    754, so the whole expression is engine-identical.

    100 TB shape: postings collapse map-side on the (term, doc) key;
    the pair join runs on the TERM key, so its cost is Σ_t df(t)² —
    `max_df` is the hot-term cap bounding that sum (the
    `ngram_jaccard_pairs` df-cap posture: ubiquitous terms carry
    ~zero idf weight anyway; when set, MIRROR it in any oracle). The
    weighted relation is persisted (feeds norms AND both join sides);
    pair fan-out to per-doc lists uses ONE exploded 2-struct array,
    not a self-union (the containment_pairs exchange lesson); top-k is
    a per-doc window on the uniform id key.

    Reference analog: candidate scoring + per-image top-k cap
    (`max_candidates`, reference:
    mindocr/postprocess/det_db_postprocess.py:73-127), lifted to
    corpus-wide weighted lexical similarity."""
    from mindocr_spark.cache import tracked_persist

    if k < 1:
        raise ValueError(f"need k ≥ 1, got {k}")
    p = postings(docs, id_col=id_col, text_col=text_col)
    dfq = p.groupBy("term").agg(F.count("*").alias("df"))
    if max_df is not None:
        dfq = dfq.where(F.col("df") <= max_df)
    nd = docs.select(F.count("*").alias("n_docs"))
    idf = F.round(
        F.log(F.col("n_docs").cast("double") / F.col("df").cast("double")),
        9,
    )
    wgt = tracked_persist(
        p.join(dfq, "term")
        .join(F.broadcast(nd))
        .select(
            "doc_id",
            "term",
            F.round(F.col("tf").cast("double") * idf, 9).alias("w"),
        )
    )
    nrm = wgt.groupBy("doc_id").agg(
        F.sum(
            F.round(F.col("w") * F.col("w"), 9).cast("decimal(28,9)")
        ).alias("n2")
    )
    a = wgt.select(
        F.col("term").alias("__t"),
        F.col("doc_id").alias("id_a"),
        F.col("w").alias("w_a"),
    )
    b = wgt.select(
        F.col("term").alias("__t"),
        F.col("doc_id").alias("id_b"),
        F.col("w").alias("w_b"),
    )
    dots = (
        a.join(b, "__t")
        .where(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(
            F.sum(
                F.round(F.col("w_a") * F.col("w_b"), 9)
                .cast("decimal(28,9)")
            ).alias("dot")
        )
    )
    cosp = (
        dots.join(nrm.select(F.col("doc_id").alias("id_a"),
                             F.col("n2").alias("n2_a")), "id_a")
        .join(nrm.select(F.col("doc_id").alias("id_b"),
                         F.col("n2").alias("n2_b")), "id_b")
        .select(
            "id_a", "id_b",
            F.round(
                F.col("dot").cast("double")
                / (F.sqrt(F.col("n2_a").cast("double"))
                   * F.sqrt(F.col("n2_b").cast("double"))),
                6,
            ).alias("cosine"),
        )
    )
    sym = cosp.select(
        F.explode(
            F.array(
                F.struct(F.col("id_a").alias("doc_id"),
                         F.col("id_b").alias("nbr"),
                         F.col("cosine")),
                F.struct(F.col("id_b").alias("doc_id"),
                         F.col("id_a").alias("nbr"),
                         F.col("cosine")),
            )
        ).alias("e")
    ).select("e.doc_id", "e.nbr", "e.cosine")
    w = Window.partitionBy("doc_id").orderBy(
        F.col("cosine").desc(), F.col("nbr").asc()
    )
    return (
        sym.withColumn("rank", F.row_number().over(w).cast("bigint"))
        .where(F.col("rank") <= k)
        .select("doc_id", "nbr", "cosine", "rank")
    )


# --------------------------------------------------------------------------
# Rank-biased overlap (Webber et al. 2010) — top-k rank stability
# --------------------------------------------------------------------------

def rbo_weights(k: int, p: float) -> list[tuple[int, float]]:
    """Truncated-RBO depth weights: w_d = (1−p)·p^(d−1) / (1−p^k),
    normalized to sum to 1 over d = 1..k. Computed ONCE in Python and
    embedded as literals in BOTH engines (the shared-constant
    discipline) — the doubles are identical by construction."""
    if k < 1 or not (0.0 < p < 1.0):
        raise ValueError(f"need k ≥ 1 and 0 < p < 1, got {k}/{p}")
    norm = 1.0 - p ** k
    return [(d, (1.0 - p) * p ** (d - 1) / norm) for d in range(1, k + 1)]


def rbo_rank_stability(
    docs: DataFrame,
    k: int = 10,
    p: float = 0.9,
    text_col: str = "text",
    lang_col: str = "lang",
) -> DataFrame:
    """Per-language rank-biased overlap of the top-k token rankings
    between the two doc_id-parity halves of the corpus — the
    RANK-grain corpus-stability metric complementing unigram_drift's
    distribution-grain KL: RBO weights agreement at the top (where
    retrieval and LM head effects live) and discounts the tail
    geometrically. 1.0 = identical top-k rankings, 0.0 = disjoint.

    Returns (lang, n_common_topk, rbo). Tie-break inside a ranking is
    (count DESC, token ASC) — total order, both engines agree.

    100 TB shape: one tokenize-explode, ONE map-side-combinable count
    groupBy at (lang, half, token) grain, one top-k window per (lang,
    half), then everything downstream lives at k·languages
    cardinality: the half-to-half join, the broadcast depth table, and
    the sorted-fold sum (the domain_pagerank list_reduce discipline —
    contribution order pinned by depth, so the IEEE sum is bit-exact
    cross-engine)."""
    from mindocr_spark.cache import tracked_persist

    weights = rbo_weights(k, p)
    toks = docs.select(
        F.coalesce(F.col(lang_col), F.lit("und")).alias("lang"),
        F.pmod("doc_id", F.lit(2)).alias("half"),
        F.explode(tokens_col(text_col)).alias("raw"),
    ).select("lang", "half", F.lower("raw").alias("tok"))
    # counts feeds the ranking AND the lang universe; pairs feeds the
    # fold AND the common count — persist both (multi-consumer rule)
    counts = tracked_persist(
        toks.groupBy("lang", "half", "tok").agg(
            F.count(F.lit(1)).alias("n")
        )
    )
    w_rank = Window.partitionBy("lang", "half").orderBy(
        F.desc("n"), F.asc("tok")
    )
    ranked = counts.withColumn(
        "rk", F.row_number().over(w_rank)
    ).where(F.col("rk") <= k)
    a = ranked.where(F.col("half") == 0).select(
        "lang", "tok", F.col("rk").alias("ra")
    )
    b = ranked.where(F.col("half") == 1).select(
        "lang", "tok", F.col("rk").alias("rb")
    )
    pairs = tracked_persist(a.join(b, ["lang", "tok"]))
    depths = F.broadcast(
        docs.sparkSession.createDataFrame(weights, "d int, w double")
    )
    contrib = (
        pairs.crossJoin(depths)
        .where(F.greatest("ra", "rb") <= F.col("d"))
        .groupBy("lang", "d", "w")
        .agg(F.count(F.lit(1)).alias("a_d"))
        .select(
            "lang",
            "d",
            (
                (F.col("a_d").cast("double") / F.col("d").cast("double"))
                * F.col("w")
            ).alias("c"),
        )
    )
    folded = contrib.groupBy("lang").agg(
        F.aggregate(
            F.array_sort(F.collect_list(F.struct("d", "c"))),
            F.lit(0.0),
            lambda acc, x: acc + x["c"],
        ).alias("rbo_raw")
    )
    common = pairs.groupBy("lang").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_common_topk")
    )
    langs = counts.select("lang").distinct()
    return (
        langs.join(common, "lang", "left")
        .join(folded, "lang", "left")
        .select(
            "lang",
            F.coalesce("n_common_topk", F.lit(0).cast("bigint")).alias(
                "n_common_topk"
            ),
            F.round(F.coalesce("rbo_raw", F.lit(0.0)), 6).alias("rbo"),
        )
    )


# --------------------------------------------------------------------------
# Retrieval evaluation (P@k / recall@k / MRR / nDCG@k)
# --------------------------------------------------------------------------

def ndcg_weights(k: int) -> tuple[list[tuple[int, float]], list[float]]:
    """((rank, 1/log2(rank+1)) …, cumulative-prefix list). Computed
    ONCE in Python and embedded as literals in BOTH engines, so DCG's
    per-rank weights and IDCG's prefix sums are identical doubles by
    construction (the rbo_weights discipline) — no in-engine
    transcendentals to reconcile."""
    import math

    if k < 1:
        raise ValueError(f"k must be ≥ 1, got {k}")
    w = [(i, 1.0 / math.log2(i + 1)) for i in range(1, k + 1)]
    cum, acc = [], 0.0
    for _, wi in w:
        acc = acc + wi
        cum.append(acc)
    return w, cum


def retrieval_eval(
    docs: DataFrame,
    queries: dict[int, list[str]],
    k: int = 5,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Offline IR evaluation of the BM25 stack against a DETERMINISTIC
    relevance label — a doc is relevant to a query iff it contains ALL
    the query's terms (conjunctive containment; no human judgments in
    a synthetic corpus, but the label is engine-independent and the
    harness is exactly the one you'd point at real qrels). Returns one
    row per query: (query_id, n_rel, hits_k, precision_k, recall_k,
    mrr, ndcg) — recall/ndcg are NULL when n_rel = 0 (undefined, not
    0.0; a zero-df query term makes conjunctive relevance empty).

    100 TB shape: ranks come from bm25_topk (its broadcast-vocabulary
    semi-join does the heavy lifting); the relevance side reuses the
    same broadcast filter, so the corpus-side cost is ONE extra
    distinct on matched (doc, term) rows; everything downstream lives
    at queries×k cardinality. DCG is a rank-ordered literal-weight
    fold; IDCG is a Python-prefix-summed literal indexed at
    min(n_rel, k) — both bit-exact cross-engine."""
    from mindocr_spark.cache import tracked_persist

    spark = docs.sparkSession
    w, cum = ndcg_weights(k)
    ranked = bm25_topk(docs, queries, k, id_col, text_col).select(
        "query_id", "doc_id", F.col("rank").cast("int").alias("rank")
    )
    qt = query_terms_df(spark, queries)
    nterms = qt.groupBy("query_id").agg(
        F.count_distinct("term").alias("nt")
    )
    vocab = qt.select("term").distinct()
    matched = (
        docs.select(
            F.col(id_col).alias("doc_id"),
            F.explode(tokens_col(text_col)).alias("term"),
        )
        .join(F.broadcast(vocab), "term")
        .distinct()
    )
    rel = tracked_persist(
        matched.join(qt, "term")
        .groupBy("query_id", "doc_id")
        .agg(F.count_distinct("term").alias("cnt"))
        .join(F.broadcast(nterms), "query_id")
        .where(F.col("cnt") == F.col("nt"))
        .select("query_id", "doc_id")
    )
    relq = rel.groupBy("query_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_rel")
    )
    depths = F.broadcast(
        spark.createDataFrame(w, "rank int, w double")
    )
    hq = (
        ranked.join(rel, ["query_id", "doc_id"])
        .join(depths, "rank")
        .groupBy("query_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("hits_k"),
            F.min("rank").cast("bigint").alias("first_rank"),
            F.aggregate(
                F.array_sort(F.collect_list(F.struct("rank", "w"))),
                F.lit(0.0),
                lambda acc, x: acc + x["w"],
            ).alias("dcg"),
        )
    )
    qids = qt.select("query_id").distinct()
    zero = F.lit(0).cast("bigint")
    n_rel = F.coalesce("n_rel", zero)
    hits = F.coalesce("hits_k", zero)
    idcg = F.element_at(
        F.array(*[F.lit(c) for c in cum]),
        F.least(F.col("n_rel"), F.lit(k)).cast("int"),
    )
    return (
        qids.join(relq, "query_id", "left")
        .join(hq, "query_id", "left")
        .select(
            "query_id",
            n_rel.alias("n_rel"),
            hits.alias("hits_k"),
            F.round(
                hits.cast("double") / F.lit(float(k)), 6
            ).alias("precision_k"),
            F.when(
                n_rel > 0,
                F.round(hits.cast("double") / n_rel.cast("double"), 6),
            ).alias("recall_k"),
            F.coalesce(
                F.round(
                    F.lit(1.0) / F.col("first_rank").cast("double"), 6
                ),
                F.lit(0.0),
            ).alias("mrr"),
            F.when(
                F.col("n_rel").isNotNull() & (F.col("n_rel") > 0),
                F.round(
                    F.coalesce("dcg", F.lit(0.0)) / idcg, 6
                ),
            ).alias("ndcg"),
        )
    )


def textrank_sentences(
    sents: DataFrame,
    id_col: str = "doc_id",
    idx_col: str = "sent_idx",
    sent_col: str = "sentence",
    damping: float = 0.85,
    iters: int = 3,
    top_k: int = 3,
    max_sentences: int = 128,
) -> DataFrame:
    """TextRank extractive summarization (Mihalcea 2004): rank a
    document's sentences by PageRank over the sentence-similarity
    graph w_ij = |tokens_i ∩ tokens_j| / (n_i + n_j) — the ln-free
    normalized-overlap variant: the classic ln n_i + ln n_j
    denominator would put engine libm (Java Math.log vs DuckDB's,
    1-ulp apart) inside the quantization boundary, while the integer
    denominator keeps every weight ONE IEEE division of exact
    BIGINTs. Returns each doc's `top_k` sentences. Input is a
    (id, sent_idx, sentence) relation — compose with
    :func:`mindocr_spark.functions.text.sentence_split`.

    Returns (id, sent_idx, sentence, score, rank), rank ≤ top_k,
    ordered (score desc, sent_idx asc). Exactness: overlaps and
    sentence sizes are exact BIGINTs; w, the out-weight-normalized
    w_norm and every per-step contribution are 9dp-quantized with
    DECIMAL(28,9) sums between; the damping update itself runs in
    EXACT DECIMAL (d·s + (1−d) has exactly 11 decimal places with d
    at 2dp — re-rounding it in doubles would sit ON the half
    boundary for ~5% of values, the one spot the engines'
    double-round algorithms disagree); isolated sentences (no
    qualifying edges) converge to the exact 1−d floor.

    100 TB shape: per-doc work is quadratic ONLY in that doc's
    sentence count, capped at `max_sentences` (first by sent_idx);
    the token self-join keys on (doc, token) — no cross-doc pairs
    ever form; the edge relation is persisted once and each
    iteration is ONE co-partitioned join + ONE map-side-combinable
    groupBy referencing the previous ranks once (linear plan
    growth, the power-iteration discipline)."""
    from mindocr_spark.cache import tracked_persist

    if not 0.0 < damping < 1.0:
        raise ValueError("damping must be in (0, 1)")
    if iters < 1 or top_k < 1 or max_sentences < 2:
        raise ValueError("iters/top_k >= 1, max_sentences >= 2")
    base = sents.select(
        F.col(id_col).alias("doc"),
        F.col(idx_col).cast("bigint").alias("sid"),
        F.col(sent_col).alias("sentence"),
    )
    w_cap = Window.partitionBy("doc").orderBy("sid")
    capped = base.withColumn(
        "_rn", F.row_number().over(w_cap)
    ).where(F.col("_rn") <= max_sentences).drop("_rn")
    toked = capped.select(
        "doc", "sid", "sentence",
        F.array_distinct(tokens_col("sentence")).alias("_toks"),
    ).where(F.size("_toks") >= 1)
    spine = tracked_persist(
        toked.select(
            "doc", "sid", "sentence",
            F.size("_toks").cast("bigint").alias("n_tok"),
        )
    )
    tok = toked.select(
        "doc", "sid", F.explode("_toks").alias("token")
    )
    ov = (
        tok.alias("a")
        .join(
            tok.alias("b"),
            (F.col("a.doc") == F.col("b.doc"))
            & (F.col("a.token") == F.col("b.token"))
            & (F.col("a.sid") != F.col("b.sid")),
        )
        .groupBy(
            F.col("a.doc").alias("doc"),
            F.col("b.sid").alias("src"),
            F.col("a.sid").alias("dst"),
        )
        .agg(F.count(F.lit(1)).cast("bigint").alias("ov"))
    )
    na = spine.select(
        "doc", F.col("sid").alias("src"),
        F.col("n_tok").alias("n_src"),
    )
    nb = spine.select(
        "doc", F.col("sid").alias("dst"),
        F.col("n_tok").alias("n_dst"),
    )
    # both weight divisions run in EXACT INTEGER nano-arithmetic:
    # round9(a/b) = (2a*10^9 + b) DIV (2b) — a double quotient of two
    # decimals lands ON an exact decimal tie whenever the reduced
    # denominator divides 10^10 (power-of-two sentence sums do), and
    # the engines' double-round algorithms then coin-flip. ov <= d/2
    # keeps w_int <= 5e8, so 2*w_int*10^9 stays inside int64.
    weighted = (
        ov.join(na, ["doc", "src"]).join(nb, ["doc", "dst"])
        .select(
            "doc", "src", "dst",
            F.expr(
                "CAST((2 * ov * 1000000000 + (n_src + n_dst))"
                " DIV (2 * (n_src + n_dst)) AS BIGINT)"
            ).alias("w_int"),
        )
    )
    w_out = Window.partitionBy("doc", "src")
    edges = tracked_persist(
        weighted.withColumn(
            "out_w", F.sum("w_int").over(w_out)
        ).select(
            "doc", "src", "dst",
            F.expr(
                "CAST((2 * w_int * 1000000000 + out_w)"
                " DIV (2 * out_w) AS DECIMAL(10,0))"
            ).alias("wn_nano"),
        )
    )
    # the damping update runs in EXACT DECIMAL: 0.85·(9dp) + 0.15 has
    # exactly 11 decimal places, and rounding that to 9dp in doubles
    # lands ON the half-boundary for ~5% of values — the one place
    # the engines' double-round algorithms (BigDecimal HALF_UP vs
    # multiply-round-divide) would coin-flip. Damping is quantized to
    # 2dp so the decimal arithmetic stays exact.
    from decimal import Decimal

    dd = Decimal(str(damping)).quantize(Decimal("0.01"))
    one_minus = Decimal(1) - dd
    ranks = spine.select(
        "doc", "sid", F.expr("CAST(1.0 AS DECIMAL(15,9))").alias("r")
    )
    for _ in range(iters):
        contrib = (
            edges.join(
                ranks.select(
                    "doc", F.col("sid").alias("src"), "r"
                ),
                ["doc", "src"],
            )
            .select(
                "doc", F.col("dst").alias("sid"),
                (F.col("wn_nano") * F.col("r")).alias("c"),
            )
            .groupBy("doc", "sid")
            .agg(F.sum("c").alias("s"))
        )
        ranks = spine.select("doc", "sid").join(
            contrib, ["doc", "sid"], "left"
        ).select(
            "doc", "sid",
            F.round(
                F.expr(f"CAST({one_minus} AS DECIMAL(28,20))")
                + F.expr(f"CAST({dd} AS DECIMAL(3,2))")
                * (
                    F.coalesce(
                        F.col("s").cast("decimal(21,9)"),
                        F.expr("CAST(0 AS DECIMAL(21,9))"),
                    )
                    * F.expr("CAST(0.000000001 AS DECIMAL(9,9))")
                ),
                9,
            ).cast("decimal(15,9)").alias("r"),
        )
    w_rank = Window.partitionBy("doc").orderBy(
        F.col("r").desc(), F.col("sid").asc()
    )
    return (
        spine.join(ranks, ["doc", "sid"])
        .withColumn("rank", F.row_number().over(w_rank))
        .where(F.col("rank") <= top_k)
        .select(
            F.col("doc").alias(id_col),
            F.col("sid").alias(idx_col),
            "sentence",
            F.col("r").cast("double").alias("score"),
            F.col("rank").cast("bigint").alias("rank"),
        )
    )


def bm25_prf_topk(
    docs: DataFrame,
    queries: dict[int, list[str]],
    k: int = 5,
    fb_docs: int = 5,
    fb_terms: int = 10,
    orig_weight: float = 0.6,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Two-pass pseudo-relevance-feedback retrieval (RM3-style,
    Lavrenko/Croft relevance models as deployed in Anserini/Indri):
    a first BM25 pass retrieves `fb_docs` per query, a relevance
    model is estimated from them — w(t) ∝ Σ_d score(d)·tf(t,d)/dl(d)
    — the top `fb_terms` expansion terms are interpolated with the
    uniform original-query distribution at `orig_weight` (λ), and a
    second weighted-BM25 pass ranks with the expanded query. The
    classic fix for vocabulary mismatch: a query's top documents
    vote terms the user didn't type.

    Returns (query_id, doc_id, n_terms_hit, score, rank), rank ≤ k,
    (score desc, doc_id) deterministic. Exactness: feedback
    contributions and the normalized model are 9dp-quantized with
    DECIMAL sums between; the λ-interpolation runs in EXACT DECIMAL
    (λ at 2dp × 9dp distributions is an 11dp decimal — the textrank
    half-boundary lesson); second-pass term scores reuse the exact
    BM25 idf/tfn quantization chain.

    100 TB shape: pass 1 is :func:`bm25_topk` (broadcast-vocabulary
    semi-join before any shuffle); the feedback model runs on the
    fb_docs×queries-bounded posting subset (broadcast doc-id join);
    pass 2 re-scans with the expanded vocabulary broadcast — the
    corpus still sheds every non-matching token scan-side."""
    from decimal import Decimal

    if fb_docs < 1 or fb_terms < 1 or k < 1:
        raise ValueError("k/fb_docs/fb_terms must be >= 1")
    lam = Decimal(str(orig_weight)).quantize(Decimal("0.01"))
    if not Decimal(0) <= lam <= Decimal(1):
        raise ValueError("orig_weight must be in [0, 1]")
    oml = Decimal(1) - lam
    spark = docs.sparkSession
    qt = query_terms_df(spark, queries)
    first = bm25_topk(
        docs, queries, k=fb_docs, id_col=id_col, text_col=text_col
    )
    toks = tokens_col(text_col)
    base = docs.select(
        F.col(id_col).alias("doc_id"),
        F.size(toks).alias("dl"),
        F.explode(toks).alias("term"),
    )
    fbd = first.select(
        "query_id", "doc_id", F.col("score").cast("double").alias("dscore")
    )
    fb_post = base.join(
        F.broadcast(fbd.select("doc_id").distinct()), "doc_id"
    ).groupBy("doc_id", "term").agg(
        F.count("*").alias("tf"), F.max("dl").alias("dl")
    )
    contrib = fb_post.join(F.broadcast(fbd), "doc_id").select(
        "query_id", "term",
        F.round(
            F.col("dscore")
            * (F.col("tf").cast("double") / F.col("dl").cast("double")),
            9,
        ).alias("c"),
    )
    wfb = contrib.groupBy("query_id", "term").agg(
        F.sum(F.col("c").cast("decimal(28,9)")).alias("w_fb_d")
    )
    w_rank = Window.partitionBy("query_id").orderBy(
        F.col("w_fb_d").desc(), F.col("term").asc()
    )
    exp = wfb.withColumn(
        "erank", F.row_number().over(w_rank)
    ).where(F.col("erank") <= fb_terms)
    w_q = Window.partitionBy("query_id")
    expn = exp.select(
        "query_id", "term",
        F.round(
            F.col("w_fb_d").cast("double")
            / F.sum("w_fb_d").over(w_q).cast("double"),
            9,
        ).cast("decimal(28,9)").alias("p_fb"),
    )
    nq = qt.groupBy("query_id").agg(F.count("*").alias("nq"))
    origp = qt.join(F.broadcast(nq), "query_id").select(
        "query_id", "term",
        F.round(F.lit(1.0) / F.col("nq").cast("double"), 9)
        .cast("decimal(28,9)").alias("p_orig"),
    )
    zero9 = F.expr("CAST(0 AS DECIMAL(28,9))")
    weight = (
        F.expr(f"CAST({lam} AS DECIMAL(3,2))")
        * F.coalesce("p_orig", zero9)
        + F.expr(f"CAST({oml} AS DECIMAL(3,2))")
        * F.coalesce("p_fb", zero9)
    ).cast("decimal(28,11)")
    wq_rel = origp.join(expn, ["query_id", "term"], "full").select(
        "query_id", "term", weight.alias("weight")
    )
    vocab2 = wq_rel.select("term").distinct()
    matched = base.join(F.broadcast(vocab2), "term")
    tf2 = matched.groupBy("term", "doc_id").agg(
        F.count("*").alias("tf"), F.max("dl").alias("dl")
    )
    df2 = tf2.groupBy("term").agg(F.count("*").alias("df"))
    stats = docs.select(
        F.count("*").alias("n_docs"),
        F.sum(F.size(tokens_col(text_col))).alias("sum_dl"),
    ).withColumn(
        "avgdl",
        F.round(
            F.col("sum_dl").cast("double") / F.col("n_docs").cast("double"),
            9,
        ),
    )
    nd = F.col("n_docs").cast("double")
    dfd = F.col("df").cast("double")
    idf = F.round(
        F.log((nd - dfd + F.lit(0.5)) / (dfd + F.lit(0.5)) + F.lit(1.0)), 9
    )
    tfd = F.col("tf").cast("double")
    dld = F.col("dl").cast("double")
    tfn = F.round(
        tfd * F.lit(BM25_K1 + 1.0)
        / (
            tfd
            + F.lit(BM25_K1)
            * (F.lit(1.0 - BM25_B) + F.lit(BM25_B) * (dld / F.col("avgdl")))
        ),
        9,
    )
    scored = (
        tf2.join(F.broadcast(df2), "term")
        .join(F.broadcast(stats))
        .join(F.broadcast(wq_rel), "term")
        .select(
            "query_id",
            "doc_id",
            F.round(
                F.col("weight").cast("double") * F.round(idf * tfn, 9),
                9,
            ).cast("decimal(28,9)").alias("ts"),
        )
    )
    per_doc = scored.groupBy("query_id", "doc_id").agg(
        F.count("*").alias("n_terms_hit"),
        F.sum("ts").alias("score"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("score").desc(), F.col("doc_id").asc()
    )
    return (
        per_doc.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "doc_id", "n_terms_hit", "score", "rank")
    )


def posting_gap_stats(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Inverted-index storage accounting: per-term posting lists
    delta-gap encoded with varint size arithmetic — the classic
    d-gap + VByte layout every production index (Lucene, Tantivy)
    ships, measured EXACTLY so a 100 TB index build can be sized
    before it runs.

    Encoding convention: a posting list stores its first entry as the
    1-based absolute doc id (doc_id + 1, so the value is always ≥ 1)
    and every later entry as the gap to its predecessor; each value
    costs ⌈bitlen/7⌉ VByte bytes, computed exactly as
    (length(bin(v)) + 6) div 7 — the length_histogram no-floating-log
    discipline. `bytes_fixed` is the uncompressed 8-byte-per-posting
    baseline; `compression_x` the exact-integer-derived ratio (one
    pinned IEEE division, rounded half-away at 6dp).

    100 TB shape: the posting relation arrives hash-partitioned on
    term (the `postings` layout); the d-gap lag is ONE window per term
    partition — the same per-term sort an index build pays anyway
    (posting lists ARE doc-ordered); stopword-grade hot terms make
    that window the skew site, which is exactly the term-partitioned
    segment split (doc-range sharded segments, each segment its own
    posting run) a real indexer uses — compose upstream with a
    doc_id-range repartition for segment-local lists.

    Reference analog: model-size/FLOPs accounting before a deploy
    (reference: tools/benchmarking/ modules) — measure the artifact's
    storage cost from exact statistics, not estimates."""
    p = postings(docs, id_col, text_col).select("term", "doc_id")
    w = Window.partitionBy("term").orderBy("doc_id")
    enc = F.coalesce(
        F.col("doc_id") - F.lag("doc_id").over(w),
        F.col("doc_id") + 1,
    )
    vb = p.select(
        "term",
        enc.alias("enc"),
    ).select(
        "term", "enc",
        F.expr("(length(bin(enc)) + 6) div 7").alias("vbytes"),
    )
    out = vb.groupBy("term").agg(
        F.count("*").alias("df"),
        F.sum("vbytes").alias("bytes_varint"),
        (F.count("*") * 8).alias("bytes_fixed"),
        F.max("enc").alias("max_entry"),
    )
    return out.select(
        "term",
        F.col("df").cast("bigint").alias("df"),
        F.col("bytes_varint").cast("bigint").alias("bytes_varint"),
        F.col("bytes_fixed").cast("bigint").alias("bytes_fixed"),
        F.col("max_entry").cast("bigint").alias("max_entry"),
        F.round(
            F.col("bytes_fixed").cast("double")
            / F.col("bytes_varint").cast("double"), 6
        ).alias("compression_x"),
    )


def proximity_topk(
    docs: DataFrame,
    queries: dict[int, list[str]],
    k: int = 5,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Minimal-window proximity ranking (Lucene SpanNear / sloppy
    phrase, exact edition): for each query, docs containing ALL query
    terms ranked by the SMALLEST token window that covers one
    occurrence of every term — the classic positional relevance signal
    between bag-of-words BM25 and exact `phrase_search`.

    The minimal cover is computed as the min over one-position-per-term
    combinations of greatest(p…) − least(p…) + 1 — an m-way position
    join per (query, doc) that both engines state identically. The
    join is combinatorial in per-doc term frequency (fine at query
    grain over bounded docs); a 100 TB deployment with stopword-grade
    query terms swaps this stage for the linear sorted-event sweep
    over the SAME positional postings — the relation feeding it (and
    the answer) is unchanged, which is what the oracle pins.

    100 TB shape: the corpus sheds every non-query token scan-side
    against the BROADCAST vocabulary (the BM25 discipline) before the
    postings groupBy; everything after runs at (query, matching-doc)
    grain. Ties rank deterministically (window asc, doc_id asc).

    Reference analog: det-box adjacency scoring before rec fusion
    (reference: tools/infer/text/predict_system.py:72-90) — geometric
    closeness as the relevance refinement."""
    if k < 1:
        raise ValueError(f"need k >= 1, got {k}")
    spark = docs.sparkSession
    vocab = spark.createDataFrame(
        [(t,) for ts in queries.values() for t in ts], "term string")
    pp = positional_postings(
        docs, id_col=id_col, text_col=text_col, vocab=vocab)
    pos = pp.select(
        "term", "doc_id", F.explode("positions").alias("pos"))
    from mindocr_spark.cache import tracked_persist

    pos = tracked_persist(pos)
    per_query = []
    for qid, terms in sorted(queries.items()):
        terms = list(dict.fromkeys(terms))  # a cover needs distinct terms
        if not terms:
            raise ValueError(f"query {qid} is empty")
        j = pos.where(F.col("term") == terms[0]).select(
            "doc_id", F.col("pos").alias("p0"))
        for i, t in enumerate(terms[1:], start=1):
            j = j.join(
                pos.where(F.col("term") == t).select(
                    "doc_id", F.col("pos").alias(f"p{i}")),
                "doc_id",
            )
        ps = [F.col(f"p{i}") for i in range(len(terms))]
        window = (F.greatest(*ps) - F.least(*ps) + 1) if len(ps) > 1 \
            else F.lit(1)
        per_query.append(
            j.select(
                F.lit(qid).alias("query_id"),
                "doc_id",
                window.alias("w"),
            )
            .groupBy("query_id", "doc_id")
            .agg(F.min("w").alias("min_window"))
        )
    from functools import reduce

    allq = reduce(DataFrame.unionByName, per_query)
    rw = Window.partitionBy("query_id").orderBy(
        F.asc("min_window"), F.asc("doc_id"))
    return (
        allq.withColumn("rank", F.row_number().over(rw))
        .where(F.col("rank") <= k)
        .select(
            "query_id", "doc_id",
            F.col("min_window").cast("bigint").alias("min_window"),
            F.col("rank").cast("bigint").alias("rank"),
        )
    )


def dense_maxp_topk(
    docs: DataFrame,
    queries: DataFrame,
    k: int = 5,
    dim: int = 64,
    cdc_k: int = 8,
    cdc_nibbles: int = 2,
    round_to: int = 4,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Dense MaxP retrieval (Dai & Callan 2019's passage-level max
    pooling, the standard long-document dense-retrieval shape): split
    every document into CONTENT-DEFINED passages (`cdc_chunks` — an
    edit early in a doc re-embeds one passage, not every downstream
    one), embed each passage AND each query with the in-engine
    deterministic featurizer (`text_embed_cols` — no external vectors),
    score a (query, doc) pair as the MAX passage cosine, and return the
    top-k docs per query (self-matches excluded). The whole retriever —
    chunker, embedder, scorer — is engine-native and exactly
    SQL-oracle-able.

    Plan: chunking + both embeddings are NARROW (one Arrow fold each);
    scoring is a broadcast of the small query side against the passage
    relation; the max-pool is one map-side-combinable groupBy on
    (query, doc) and the top-k one window. 100 TB shape: passage count
    ≈ corpus chars / 16^nibbles; nothing quadratic, no all-pairs — the
    broadcast bound is |queries|·dim, the shuffle carries (query, doc)
    cells only. Swap the broadcast join for `lsh_topk` bucketing when
    the query side stops being small (same discipline as cosine_topk
    vs lsh_topk).

    Ordering key is (max_sim DESC, doc ASC) — fully deterministic.
    Returns (query_id, doc_id, max_sim, rank).

    Reference lineage: det→rec fan-out scores per-region crops and
    CollectNode folds them back to one per-image result
    (reference: deploy/py_infer/src/framework/module_base.py,
    collect_node.py:72-99); MaxP is that fold with max-cosine as the
    collector."""
    from mindocr_spark.functions.embed import embed_norm, text_embed_cols
    from mindocr_spark.functions.similarity import cosine, vec_double
    from mindocr_spark.functions.text import cdc_chunks

    chunks = cdc_chunks(
        docs, k=cdc_k, nibbles=cdc_nibbles,
        text_col=text_col, id_col=id_col,
    ).join(docs.select(F.col(id_col), F.col(text_col)), id_col).select(
        F.col(id_col).alias("__doc"),
        F.col("chunk_idx").alias("__cidx"),
        F.substring(
            F.col(text_col), F.col("chunk_start"), F.col("chunk_len")
        ).alias("__ctext"),
    )
    # passage identity rides a STRUCT (doc, chunk) — never packed into
    # one integer, so full-range xxhash64 doc ids (negative, |id| up to
    # 2^63) and any chunk count are exact; no overflow, no double
    # rounding, no collision domain to document.
    c_emb = text_embed_cols(
        chunks.withColumn(
            "__pid",
            F.struct(F.col("__doc").alias("d"),
                     F.col("__cidx").alias("c"))),
        dim=dim, text_col="__ctext", id_col="__pid",
        vec_col="__cv",
    ).where(
        # a tiny passage whose bit votes fully cancel embeds to the
        # zero vector — no direction, no signal, and an ANSI
        # divide-by-zero in the cosine. Drop it (same NULL-evidence
        # rule as the quality gates).
        embed_norm("__cv") > 0
    ).select(F.col("__pid.d").alias("__doc"), "__cv")
    q_emb = text_embed_cols(
        queries, dim=dim, text_col=text_col, id_col=id_col,
        vec_col="__qv",
    ).where(embed_norm("__qv") > 0).select(
        F.col(id_col).alias("__q"), "__qv")
    sim = F.round(
        cosine(vec_double(F.col("__qv")), vec_double(F.col("__cv"))),
        round_to,
    )
    scored = (
        F.broadcast(q_emb)
        .join(c_emb, F.col("__q") != F.col("__doc"))
        .select("__q", "__doc", sim.alias("s"))
        .groupBy("__q", "__doc")
        .agg(F.max("s").alias("max_sim"))
    )
    w = Window.partitionBy("__q").orderBy(
        F.col("max_sim").desc(), F.col("__doc").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(
            F.col("__q").alias("query_id"),
            F.col("__doc").alias("doc_id"),
            "max_sim",
            F.col("rank").cast("bigint").alias("rank"),
        )
    )

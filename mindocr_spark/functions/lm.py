"""lm — n-gram language-model scoring (the CCNet perplexity filter).

CCNet's signature quality gate scores every crawled document against a
language model trained on a clean reference corpus (Wikipedia) and
keeps the low-perplexity head. This module is that gate, Spark-first
and exactly cross-engine checkable: a unigram LM with add-one (Laplace)
smoothing, trained with one map-side-combinable groupBy and applied
with one token-key join.

Model:  p(t) = (c(t) + 1) / (total + V)      V = |vocab| + 1 (unseen)
Score:  logppl(d) = −(Σ_{t∈d} ln p(t)) / |d|   (lower = more fluent)

100 TB shape: TRAINING is one groupBy on the token key over the
reference corpus (reference corpora are the small side — Wikipedia is
~10^10 tokens, and the count table collapses to the vocabulary, a few
million rows). SCORING joins the corpus' exploded tokens against that
vocabulary: BROADCAST when the vocab fits (the common case — a few
million rows is tens of MB), else a shuffle join on the uniform token
key (`broadcast_lm=False`); either way the 10^12-doc side shuffles at
most once and OOV tokens survive via the left join (they price at the
unseen-mass 1/(total+V), and are counted in `n_oov`).

Determinism discipline (the BM25/ANN-IVF pattern): every ln argument is
a correctly-rounded division of exact integers — identical doubles in
both engines — ln is quantized with round(·,9), per-doc sums run as
DECIMAL(28,9) (exact, order-independent), and the final mean is one
correctly-rounded double division, rounded for display.

Reference lineage: the drop_score gate (reference:
tools/infer/text/predict_system.py — filter results below a model
confidence) is the per-item analog; CCNet applies the same
keep-the-confident-head rule with an LM as the scorer.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from .text import tokens_col


def unigram_counts(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Train side: (token, cnt) over the reference corpus — one
    map-side-combinable groupBy on the token key (uniform; no skew
    treatment needed beyond what AQE provides)."""
    return (
        docs.select(F.explode(tokens_col(text_col)).alias("token"))
        .groupBy("token")
        .agg(F.count("*").alias("cnt"))
    )


def bigram_counts(docs: DataFrame, text_col: str = "text",
                  id_col: str = "doc_id") -> DataFrame:
    """Train side: (w1, w2, cnt) adjacent-pair counts over the
    reference corpus — posexplode + per-doc lag window + one groupBy.
    The window partitions on the caller's `id_col` (docs are bounded —
    no skew); the groupBy key is the uniform bigram. Requiring the
    real document id (instead of synthesizing one with
    monotonically_increasing_id) keeps the plan free of
    nondeterministic expressions, whose re-evaluation on stage retry
    could change ids mid-plan."""
    from pyspark.sql import Window

    toks = docs.select(
        F.col(id_col).alias("__doc"),
        F.posexplode(tokens_col(text_col)).alias("pos", "w2"),
    )
    w = Window.partitionBy("__doc").orderBy("pos")
    return (
        toks.withColumn("w1", F.lag("w2").over(w))
        .where(F.col("w1").isNotNull())
        .groupBy("w1", "w2")
        .agg(F.count("*").alias("cnt"))
    )


def bigram_logppl(
    docs: DataFrame,
    uni: DataFrame,
    bi: DataFrame,
    lam: float = 0.7,
    id_col: str = "doc_id",
    text_col: str = "text",
    broadcast_lm: bool = True,
) -> DataFrame:
    """Interpolated-bigram scoring (the CCNet-faithful upgrade of
    :func:`unigram_logppl`): per token,

        p = λ·p_bi(w|prev) + (1−λ)·p_uni(w)      [prev exists]
        p = p_uni(w)                              [first token]
        p_bi = c(prev,w)/c(prev)   (0 when prev is unseen)
        p_uni = (c(w)+1)/(total+V)

    (1−λ)·p_uni > 0 keeps every token finite — no extra smoothing
    needed on the bigram term. Returns (id, n_tokens,
    n_bigram_hits, neg_logprob_sum, logppl); NULL logppl for
    zero-token docs, rows preserved.

    Scale shape: three token-key joins (uni on w, uni on prev, bi on
    the pair) — BROADCAST when the reference vocabulary fits (the
    common case), shuffle joins on uniform keys otherwise. The
    per-doc lag window partitions on the doc id — bounded rows per
    partition, no skew. Determinism: same discipline as unigram
    (correctly-rounded divisions in pinned association, round(ln,9),
    DECIMAL sums, un-rounded final mean)."""
    from pyspark.sql import Window

    stats = uni.select(
        F.coalesce(F.sum("cnt"), F.lit(0)).alias("lm_total"),
        (F.count("*") + F.lit(1)).alias("lm_v"),
    )
    mb = F.broadcast if broadcast_lm else (lambda d: d)
    toks = docs.select(
        F.col(id_col).alias("__id"),
        F.posexplode(tokens_col(text_col)).alias("pos", "w2"),
    )
    w = Window.partitionBy("__id").orderBy("pos")
    seq = toks.withColumn("w1", F.lag("w2").over(w))
    uni_w = uni.select(F.col("token").alias("w2"), F.col("cnt").alias("cw"))
    uni_p = uni.select(F.col("token").alias("w1"), F.col("cnt").alias("cp"))
    bi_c = bi.select("w1", "w2", F.col("cnt").alias("cbi"))
    joined = (
        seq.join(mb(uni_w), "w2", "left")
        .join(mb(uni_p), "w1", "left")
        .join(mb(bi_c), ["w1", "w2"], "left")
        .join(F.broadcast(stats))
    )
    denom = (F.col("lm_total") + F.col("lm_v")).cast("double")
    puni = (
        (F.coalesce(F.col("cw"), F.lit(0)) + F.lit(1)).cast("double") / denom
    )
    pbi = F.when(
        F.col("cp").isNotNull() & (F.col("cp") > 0),
        F.coalesce(F.col("cbi"), F.lit(0)).cast("double")
        / F.col("cp").cast("double"),
    ).otherwise(F.lit(0.0))
    p = F.when(F.col("w1").isNull(), puni).otherwise(
        F.lit(lam) * pbi + F.lit(1.0 - lam) * puni
    )
    scored = joined.select(
        "__id",
        F.col("cbi").isNotNull().cast("int").alias("is_hit"),
        F.round(-F.log(p), 9).cast("decimal(28,9)").alias("nlp"),
    ).groupBy("__id").agg(
        F.sum("is_hit").alias("n_bigram_hits"),
        F.sum("nlp").alias("neg_logprob_sum"),
    )
    base = docs.select(
        F.col(id_col).alias("__id"),
        F.size(tokens_col(text_col)).alias("n_tokens"),
    )
    return base.join(scored, "__id", "left").select(
        F.col("__id").alias(id_col),
        "n_tokens",
        F.coalesce(F.col("n_bigram_hits"), F.lit(0)).cast("bigint")
        .alias("n_bigram_hits"),
        F.coalesce(
            F.col("neg_logprob_sum"), F.lit(0).cast("decimal(28,9)")
        ).cast("double").alias("neg_logprob_sum"),
        F.when(
            F.col("n_tokens") > 0,
            F.col("neg_logprob_sum").cast("double")
            / F.col("n_tokens").cast("double"),
        ).alias("logppl"),
    )


def trigram_counts(docs: DataFrame, text_col: str = "text",
                   id_col: str = "doc_id") -> DataFrame:
    """Train side: (w1, w2, w3, cnt) adjacent-triple counts — one
    posexplode, two per-doc lag windows sharing a single sort, one
    groupBy on the uniform trigram key."""
    from pyspark.sql import Window

    toks = docs.select(
        F.col(id_col).alias("__doc"),
        F.posexplode(tokens_col(text_col)).alias("pos", "w3"),
    )
    w = Window.partitionBy("__doc").orderBy("pos")
    return (
        toks.withColumn("w2", F.lag("w3", 1).over(w))
        .withColumn("w1", F.lag("w3", 2).over(w))
        .where(F.col("w1").isNotNull())
        .groupBy("w1", "w2", "w3")
        .agg(F.count("*").alias("cnt"))
    )


def stupid_backoff_logscore(
    docs: DataFrame,
    uni: DataFrame,
    bi: DataFrame,
    tri: DataFrame,
    alpha: float = 0.4,
    id_col: str = "doc_id",
    text_col: str = "text",
    broadcast_lm: bool = True,
) -> DataFrame:
    """Trigram STUPID BACKOFF scoring (Brants et al., EMNLP'07 — the
    web-scale LM recipe: no discounting, a fixed ``α`` penalty per
    backoff level, counts straight from the corpus):

        S(w3|w1,w2) = c123/c12            [trigram seen]
                    = α·S(w3|w2)          [backoff to bigram]
        S(w3|w2)    = c23/c(w2)           [bigram seen, context > 0]
                    = α·P_uni(w3)         [backoff to unigram]
        P_uni(w3)   = (c(w3)+1)/(total+V) [add-one, always finite]

    First token scores at the unigram level, second at the bigram
    level. Returns (id, n_tokens, n_trigram_hits, neg_logscore_sum,
    logscore = mean −ln S); S is a score, not a probability (stupid
    backoff doesn't normalize) — exactly why it composes into a CHEAP
    fluency gate next to the CCNet perplexity tier.

    Scale shape: the two lag windows share one per-doc sort (bounded
    partitions); then five reference-table joins — uni(w3), uni(w2),
    bi(w2,w3), bi-as-context(w1,w2), tri(w1,w2,w3) — all BROADCAST
    when the reference LM fits (the common case), shuffle joins on
    uniform token keys otherwise. Determinism: the bigram_logppl
    discipline — correctly-rounded IEEE divisions in pinned CASE
    association, round(−ln, 9), DECIMAL(28,9) sums, un-rounded final
    mean."""
    from pyspark.sql import Window

    stats = uni.select(
        F.coalesce(F.sum("cnt"), F.lit(0)).alias("lm_total"),
        (F.count("*") + F.lit(1)).alias("lm_v"),
    )
    mb = F.broadcast if broadcast_lm else (lambda d: d)
    toks = docs.select(
        F.col(id_col).alias("__id"),
        F.posexplode(tokens_col(text_col)).alias("pos", "w3"),
    )
    w = Window.partitionBy("__id").orderBy("pos")
    seq = (
        toks.withColumn("w2", F.lag("w3", 1).over(w))
        .withColumn("w1", F.lag("w3", 2).over(w))
    )
    uni_3 = uni.select(F.col("token").alias("w3"), F.col("cnt").alias("cw3"))
    uni_2 = uni.select(F.col("token").alias("w2"), F.col("cnt").alias("cw2"))
    bi_23 = bi.select(
        F.col("w1").alias("w2"), F.col("w2").alias("w3"),
        F.col("cnt").alias("c23"),
    )
    bi_12 = bi.select(
        F.col("w1"), F.col("w2"), F.col("cnt").alias("c12")
    )
    tri_c = tri.select("w1", "w2", "w3", F.col("cnt").alias("c123"))
    joined = (
        seq.join(mb(uni_3), "w3", "left")
        .join(mb(uni_2), "w2", "left")
        .join(mb(bi_23), ["w2", "w3"], "left")
        .join(mb(bi_12), ["w1", "w2"], "left")
        .join(mb(tri_c), ["w1", "w2", "w3"], "left")
        .join(F.broadcast(stats))
    )
    denom = (F.col("lm_total") + F.col("lm_v")).cast("double")
    p_uni = (
        (F.coalesce(F.col("cw3"), F.lit(0)) + F.lit(1)).cast("double")
        / denom
    )
    bi_level = F.when(
        F.col("c23").isNotNull() & (F.col("cw2") > 0),
        F.col("c23").cast("double") / F.col("cw2").cast("double"),
    ).otherwise(F.lit(alpha) * p_uni)
    tri_level = F.when(
        F.col("c123").isNotNull() & (F.col("c12") > 0),
        F.col("c123").cast("double") / F.col("c12").cast("double"),
    ).otherwise(F.lit(alpha) * bi_level)
    s = (
        F.when(F.col("w2").isNull(), p_uni)
        .when(F.col("w1").isNull(), bi_level)
        .otherwise(tri_level)
    )
    scored = joined.select(
        "__id",
        F.col("c123").isNotNull().cast("int").alias("is_tri"),
        F.round(-F.log(s), 9).cast("decimal(28,9)").alias("nls"),
    ).groupBy("__id").agg(
        F.sum("is_tri").alias("n_trigram_hits"),
        F.sum("nls").alias("neg_logscore_sum"),
    )
    base = docs.select(
        F.col(id_col).alias("__id"),
        F.size(tokens_col(text_col)).alias("n_tokens"),
    )
    return base.join(scored, "__id", "left").select(
        F.col("__id").alias(id_col),
        "n_tokens",
        F.coalesce(F.col("n_trigram_hits"), F.lit(0)).cast("bigint")
        .alias("n_trigram_hits"),
        F.coalesce(
            F.col("neg_logscore_sum"), F.lit(0).cast("decimal(28,9)")
        ).cast("double").alias("neg_logscore_sum"),
        F.when(
            F.col("n_tokens") > 0,
            F.col("neg_logscore_sum").cast("double")
            / F.col("n_tokens").cast("double"),
        ).alias("logscore"),
    )


def kn_bigram_logppl(
    docs: DataFrame,
    uni: DataFrame,
    bi: DataFrame,
    discount: float = 0.75,
    id_col: str = "doc_id",
    text_col: str = "text",
    broadcast_lm: bool = True,
) -> DataFrame:
    """Kneser-Ney bigram scoring — the KenLM-family estimator CCNet's
    production gate actually runs (absolute discounting + CONTINUATION
    probabilities, which ask "in how many contexts does w appear?"
    instead of "how often?" — the estimator that stops 'Francisco'
    from looking fluent everywhere just because 'San Francisco' is
    frequent). Per token:

        p(w|prev) = max(c(prev,w) − D, 0)/c(prev)
                    + (D·N1+(prev,·)/c(prev)) · pc(w)    [c(prev) > 0]
        p(w)      = pc(w)                                 [else / first]
        pc(w)     = (N1+(·,w) + 1) / (N_pairs + V)

    where N1+(·,w) = distinct left-contexts of w, N1+(prev,·) =
    distinct continuations of prev, c(prev) = Σ c(prev,·) over the
    bigram table, N_pairs = distinct bigram types, V = |vocab|+1. The
    +1/+V add-one on pc keeps every token finite (unseen words price
    at the unseen continuation mass) — deterministic, no tuning.
    Returns the same shape as :func:`bigram_logppl`.

    Scale shape: the bigram table feeds three derived aggregates
    (left-context types, right-context types + totals, the pair count)
    — it is PERSISTED here so the plan references the train-side
    subtree once; scoring is the same three broadcast-or-uniform-key
    joins as the interpolated scorer. Determinism: pinned association
    ((D·nr)/cp)·pc, exact-int divisions, round(ln,9), DECIMAL sums."""
    from mindocr_spark.cache import tracked_persist

    bi = tracked_persist(bi)
    left = bi.groupBy("w2").agg(F.count(F.lit(1)).alias("n_left"))
    right = bi.groupBy("w1").agg(
        F.count(F.lit(1)).alias("n_right"), F.sum("cnt").alias("cp")
    )
    stats = bi.agg(F.count(F.lit(1)).alias("n_pairs")).crossJoin(
        uni.agg((F.count(F.lit(1)) + F.lit(1)).alias("lm_v"))
    )
    mb = F.broadcast if broadcast_lm else (lambda d: d)
    toks = docs.select(
        F.col(id_col).alias("__id"),
        F.posexplode(tokens_col(text_col)).alias("pos", "w2"),
    )
    w = Window.partitionBy("__id").orderBy("pos")
    seq = toks.withColumn("w1", F.lag("w2").over(w))
    bi_c = bi.select("w1", "w2", F.col("cnt").alias("cbi"))
    joined = (
        seq.join(mb(left), "w2", "left")
        .join(mb(right), "w1", "left")
        .join(mb(bi_c), ["w1", "w2"], "left")
        .join(F.broadcast(stats))
    )
    pc = (F.coalesce(F.col("n_left"), F.lit(0)) + F.lit(1)).cast(
        "double"
    ) / (F.col("n_pairs") + F.col("lm_v")).cast("double")
    cp_d = F.col("cp").cast("double")
    cbi_d = F.coalesce(F.col("cbi"), F.lit(0)).cast("double")
    nr_d = F.col("n_right").cast("double")
    seen = (
        F.greatest(cbi_d - F.lit(discount), F.lit(0.0)) / cp_d
        + F.lit(discount) * nr_d / cp_d * pc
    )
    p = F.when(
        F.col("w1").isNotNull() & F.col("cp").isNotNull() & (F.col("cp") > 0),
        seen,
    ).otherwise(pc)
    scored = joined.select(
        "__id",
        F.col("cbi").isNotNull().cast("int").alias("is_hit"),
        F.round(-F.log(p), 9).cast("decimal(28,9)").alias("nlp"),
    ).groupBy("__id").agg(
        F.sum("is_hit").alias("n_bigram_hits"),
        F.sum("nlp").alias("neg_logprob_sum"),
    )
    base = docs.select(
        F.col(id_col).alias("__id"),
        F.size(tokens_col(text_col)).alias("n_tokens"),
    )
    return base.join(scored, "__id", "left").select(
        F.col("__id").alias(id_col),
        "n_tokens",
        F.coalesce(F.col("n_bigram_hits"), F.lit(0)).cast("bigint")
        .alias("n_bigram_hits"),
        F.coalesce(
            F.col("neg_logprob_sum"), F.lit(0).cast("decimal(28,9)")
        ).cast("double").alias("neg_logprob_sum"),
        F.when(
            F.col("n_tokens") > 0,
            F.col("neg_logprob_sum").cast("double")
            / F.col("n_tokens").cast("double"),
        ).alias("logppl"),
    )


def unigram_logppl(
    docs: DataFrame,
    lm: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    broadcast_lm: bool = True,
) -> DataFrame:
    """Score `docs` against a trained `lm` (token, cnt) relation:
    (id, n_tokens, n_oov, neg_logprob_sum, logppl).

    Zero-token docs report NULL logppl (0 tokens has no mean) but are
    never dropped — gates downstream must treat NULL as "no evidence",
    the skip-propagation discipline."""
    stats = lm.select(
        # empty LM: sum() is NULL → coalesce to 0 so scoring degrades
        # to the uniform unseen-mass model instead of NULLing out
        F.coalesce(F.sum("cnt"), F.lit(0)).alias("lm_total"),
        (F.count("*") + F.lit(1)).alias("lm_v"),
    )
    toks = docs.select(
        F.col(id_col).alias("__id"),
        F.explode(tokens_col(text_col)).alias("token"),
    )
    lm_side = F.broadcast(lm) if broadcast_lm else lm
    denom = (F.col("lm_total") + F.col("lm_v")).cast("double")
    p = (F.coalesce(F.col("cnt"), F.lit(0)) + F.lit(1)).cast("double") / denom
    scored = (
        toks.join(lm_side, "token", "left")
        .join(F.broadcast(stats))
        .select(
            "__id",
            F.col("cnt").isNull().cast("int").alias("is_oov"),
            F.round(-F.log(p), 9).cast("decimal(28,9)").alias("nlp"),
        )
        .groupBy("__id")
        .agg(
            F.sum("is_oov").alias("n_oov"),
            F.sum("nlp").alias("neg_logprob_sum"),
        )
    )
    base = docs.select(
        F.col(id_col).alias("__id"),
        F.size(tokens_col(text_col)).alias("n_tokens"),
    )
    return (
        base.join(scored, "__id", "left")
        .select(
            F.col("__id").alias(id_col),
            "n_tokens",
            F.coalesce(F.col("n_oov"), F.lit(0)).cast("bigint").alias("n_oov"),
            # exact decimal sum, then one correctly-rounded conversion
            # for the output surface (decimal→pandas dtypes differ
            # between engines; double is unambiguous)
            F.coalesce(
                F.col("neg_logprob_sum"), F.lit(0).cast("decimal(28,9)")
            ).cast("double").alias("neg_logprob_sum"),
            # no final round: both operands are bit-identical across
            # engines and IEEE division is correctly rounded, so the
            # quotient is already deterministic (a round(·,9) here
            # would re-introduce engine-specific tie behavior)
            F.when(
                F.col("n_tokens") > 0,
                F.col("neg_logprob_sum").cast("double")
                / F.col("n_tokens").cast("double"),
            ).alias("logppl"),
        )
    )


def ppl_buckets(
    scored: DataFrame,
    ppl_col: str = "logppl",
    part_col: str = "lang",
    id_col: str = "doc_id",
    cuts: tuple = (1.0 / 3.0, 2.0 / 3.0),
    mode: str = "rank",
    accuracy: int = 10000,
) -> DataFrame:
    """CCNet's corpus tiering: split each language's documents into
    head / middle / tail by LM perplexity rank (head = best-scoring
    third — the slice CCNet trains on first and the dedup reference
    slice). Adds (ppl_rank, ppl_bucket) to (id, part, ppl); NULL-ppl
    docs (zero tokens — no evidence) bucket 'unknown' with NULL rank
    and are never dropped.

    Two modes, one semantic:

    * ``mode="rank"`` — exact: percent_rank over one window per
      language ((rank−1)/(n−1), ties share a rank so equal ppl can
      never straddle a bucket). This is the oracle-checked path, and
      also CCNet's own definition. CAVEAT at 10^12 docs: a window
      partition is one task, so a dominant language funnels into a
      single sorted reducer — use it per corpus SNAPSHOT, not per
      increment.
    * ``mode="threshold"`` — the scale path: per-language cut ppls
      via approx_percentile (one tiny map-side-combinable aggregate),
      broadcast back, bucket by comparison — map-only over the corpus,
      no global sort anywhere. Rank is not materialized (NULL);
      bucket boundaries are the quantile VALUES, so ties at the cut
      fall into the lower bucket on both paths.
    """
    nn = scored.where(F.col(ppl_col).isNotNull())
    nulls = scored.where(F.col(ppl_col).isNull()).select(
        id_col, part_col, F.col(ppl_col).alias("ppl"),
        F.lit(None).cast("double").alias("ppl_rank"),
        F.lit("unknown").alias("ppl_bucket"),
    )
    if mode == "rank":
        w = Window.partitionBy(part_col).orderBy(ppl_col)
        pr = F.percent_rank().over(w)
        bucket = (
            F.when(pr < F.lit(cuts[0]), F.lit("head"))
            .when(pr < F.lit(cuts[1]), F.lit("middle"))
            .otherwise(F.lit("tail"))
        )
        out = nn.select(
            id_col, part_col, F.col(ppl_col).alias("ppl"),
            pr.alias("ppl_rank"), bucket.alias("ppl_bucket"),
        )
    elif mode == "threshold":
        th = nn.groupBy(part_col).agg(
            F.percentile_approx(
                ppl_col, F.array(*[F.lit(c) for c in cuts]), accuracy
            ).alias("__cuts")
        )
        j = nn.join(F.broadcast(th), part_col)
        p = F.col(ppl_col)
        bucket = (
            F.when(p <= F.col("__cuts")[0], F.lit("head"))
            .when(p <= F.col("__cuts")[1], F.lit("middle"))
            .otherwise(F.lit("tail"))
        )
        out = j.select(
            id_col, part_col, p.alias("ppl"),
            F.lit(None).cast("double").alias("ppl_rank"),
            bucket.alias("ppl_bucket"),
        )
    else:
        raise ValueError(f"unknown mode: {mode!r}")
    return out.unionByName(nulls)


def zipf_fit(
    docs: DataFrame,
    max_rank: int = 1000,
    text_col: str = "text",
) -> DataFrame:
    """Zipf's-law fit over the corpus vocabulary head: least-squares
    slope/intercept of ln(freq) against ln(rank) for the top
    `max_rank` types — the classic corpus-health scalar. Natural text
    sits near slope −1; template/spam-heavy corpora flatten the head
    (slope → 0 over the boilerplate vocabulary) and machine-generated
    noise steepens or breaks the line, so drift in this one number
    flags contamination that per-doc gates can't see.

    Determinism discipline: ranking ties break on the token (freq
    DESC, token ASC); x = round(ln rank, 9), y = round(ln freq, 9);
    Σx/Σy are exact DECIMAL(38,9) sums and Σxy/Σx² are DECIMAL(38,12)
    sums of 12-dp-quantized IEEE products (order-independent); the
    closed-form slope/intercept is pinned-association double
    arithmetic over those identical operands, rounded at 6 with the
    signed-zero normalization. One row out; NULL fit when fewer than
    2 types (no line through one point).

    100 TB shape: type counting is ONE map-side-combinable shuffle on
    the (uniform) token key; the head selection is
    TakeOrderedAndProject (distributed top-k, never a global sort);
    ranking and the moment sums then run over ≤ max_rank rows.

    Reference lineage: corpus-level character-frequency auditing
    behind dictionary construction (reference:
    mindocr/utils/dict/en_dict.txt generation discipline) — the same
    head-of-distribution profile, fit instead of listed."""
    from mindocr_spark.functions.text import tokens_col

    counts = (
        docs.select(F.explode(tokens_col(text_col)).alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("freq"))
    )
    top = counts.orderBy(
        F.col("freq").desc(), F.col("token").asc()
    ).limit(max_rank)
    w = Window.orderBy(F.col("freq").desc(), F.col("token").asc())
    ranked = top.select(
        F.row_number().over(w).alias("r"), "freq"
    )
    x = F.round(F.log(F.col("r").cast("double")), 9)
    y = F.round(F.log(F.col("freq").cast("double")), 9)
    xy = ranked.select(x.alias("x"), y.alias("y"))
    s = xy.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(F.col("x").cast("decimal(38,9)")).cast("double").alias("sx"),
        F.sum(F.col("y").cast("decimal(38,9)")).cast("double").alias("sy"),
        F.sum(
            F.round(F.col("x") * F.col("y"), 12).cast("decimal(38,12)")
        ).cast("double").alias("sxy"),
        F.sum(
            F.round(F.col("x") * F.col("x"), 12).cast("decimal(38,12)")
        ).cast("double").alias("sxx"),
    )
    nd = F.col("n").cast("double")
    denom = nd * F.col("sxx") - F.col("sx") * F.col("sx")
    slope = (nd * F.col("sxy") - F.col("sx") * F.col("sy")) / denom
    intercept = (F.col("sy") - slope * F.col("sx")) / nd
    ok = (F.col("n") >= 2) & (denom != 0.0)
    return s.select(
        F.col("n").alias("n_types_fit"),
        F.when(ok, F.round(slope, 6) + F.lit(0.0)).alias("zipf_slope"),
        F.when(ok, F.round(intercept, 6) + F.lit(0.0)).alias("intercept"),
    )


def heaps_fit(
    docs: DataFrame,
    n_checkpoints: int = 64,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Heaps'-law fit — the vocabulary-GROWTH complement of
    :func:`zipf_fit`: V(n) ≈ K·nᵝ, fit as ln V against ln n over
    cumulative (tokens-seen, types-seen) checkpoints in crawl order.
    Natural text grows at β ≈ 0.4-0.6; β → 0 flags a closed template
    vocabulary (spam farms), β → 1 flags machine noise (every doc
    novel tokens). Returns one row (n_points, heaps_beta, ln_k); NULL
    fit under 2 usable checkpoints.

    Scale shape — the naive "distinct count after every doc" is a
    quadratic non-starter; this is the linear restatement: a type
    contributes +1 exactly at its FIRST doc (one min-aggregate on the
    uniform token key — the ngram_novelty device), docs bucket into
    `n_checkpoints` id-range segments by pure arithmetic (one cheap
    max-id aggregate, no global rank), per-bucket token/new-type sums
    are map-side-combinable, and the cumulative walk + regression run
    over ≤ n_checkpoints rows (driver-trivial). Determinism: the
    zipf_fit discipline verbatim (round(ln,9) coords, DECIMAL moment
    sums, pinned-association closed form, round 6 + signed-zero
    normalization)."""
    from mindocr_spark.functions.text import tokens_col

    from mindocr_spark.cache import tracked_persist

    # bucket on (id − min_id) over the ACTUAL id range — a shard whose
    # ids start at 10^6 (offset ids are normal; make_sf_scale offsets
    # replicas) must still spread across all checkpoints
    mx = docs.agg(
        F.max(id_col).alias("_mx"), F.min(id_col).alias("_mn")
    )
    toks = tracked_persist(docs.join(F.broadcast(mx)).select(
        F.expr(
            f"(({id_col} - _mn) * {n_checkpoints}) div (_mx - _mn + 1)"
        ).alias("__ckpt_b"),
        F.col(id_col).alias("_id"),
        tokens_col(text_col).alias("_t"),
    ))
    per_doc = toks.select("__ckpt_b", F.explode("_t").alias("token"), "_id")
    # min_by: the checkpoint bucket of the token's FIRST doc. The
    # bucket is a pure function of _id, so ties on the minimal _id all
    # carry the same bucket — deterministic. Grouping on the plain
    # column (not a struct field) also keeps the bucket attribute
    # visible to the plan sweep's bounded-grain allowlist.
    firsts = per_doc.groupBy("token").agg(
        F.min_by("__ckpt_b", "_id").alias("__ckpt_b")
    )
    new_b = firsts.groupBy("__ckpt_b").agg(
        F.count(F.lit(1)).alias("new_types")
    )
    tok_b = toks.groupBy("__ckpt_b").agg(F.sum(F.size("_t")).alias("nt"))
    bk = tok_b.join(new_b, "__ckpt_b", "left").select(
        "__ckpt_b", "nt", F.coalesce("new_types", F.lit(0)).alias("nv")
    )
    w = Window.orderBy("__ckpt_b").rowsBetween(Window.unboundedPreceding, 0)
    cum = bk.select(
        F.sum("nt").over(w).alias("cn"), F.sum("nv").over(w).alias("cv")
    ).where((F.col("cn") > 0) & (F.col("cv") > 0))
    x = F.round(F.log(F.col("cn").cast("double")), 9)
    y = F.round(F.log(F.col("cv").cast("double")), 9)
    s = cum.select(x.alias("x"), y.alias("y")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(F.col("x").cast("decimal(38,9)")).cast("double").alias("sx"),
        F.sum(F.col("y").cast("decimal(38,9)")).cast("double").alias("sy"),
        F.sum(
            F.round(F.col("x") * F.col("y"), 12).cast("decimal(38,12)")
        ).cast("double").alias("sxy"),
        F.sum(
            F.round(F.col("x") * F.col("x"), 12).cast("decimal(38,12)")
        ).cast("double").alias("sxx"),
    )
    nd = F.col("n").cast("double")
    denom = nd * F.col("sxx") - F.col("sx") * F.col("sx")
    slope = (nd * F.col("sxy") - F.col("sx") * F.col("sy")) / denom
    intercept = (F.col("sy") - slope * F.col("sx")) / nd
    ok = (F.col("n") >= 2) & (denom != 0.0)
    return s.select(
        F.col("n").alias("n_points"),
        F.when(ok, F.round(slope, 6) + F.lit(0.0)).alias("heaps_beta"),
        F.when(ok, F.round(intercept, 6) + F.lit(0.0)).alias("ln_k"),
    )


def pmi_collocations(
    docs: DataFrame,
    top_k: int = 50,
    min_count: int = 5,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Top collocations by pointwise mutual information — the
    phrase-vocabulary / multi-word-expression discovery step
    (tokenizer phrase merges, stopword-phrase blocklists, and NER
    gazetteer seeding all start from this table):
    ``pmi(x,y) = ln( c_xy · N / (c_x · c_y) )`` over adjacent-token
    pairs, gated by `min_count` (PMI is noise for rare pairs — the
    classic Church–Hanks caveat), ranked (pmi DESC, w1, w2 ASC).

    Determinism: the PMI argument is ONE pinned IEEE expression over
    exact counts — (c_xy·N)/(c_x·c_y) with both products and the
    division in double — then round(ln, 9): engine-identical. Rank
    ties break on the pair strings (BMP-safe — the tfidf precedent).

    100 TB shape: unigram and bigram counting are map-side-combinable
    shuffles on uniform keys; the two count joins key on the token —
    vocabulary-sized relations, NOT broadcastable at web scale, so
    they are honest shuffle joins that AQE sizes (docstring contract:
    at small scale AQE broadcasts them automatically); the head is
    TakeOrderedAndProject. Nothing touches the raw corpus twice.

    Reference lineage: dictionary augmentation from corpus statistics
    (reference: mindocr/utils/dict/ construction) — phrase-level
    instead of character-level."""
    uni = unigram_counts(docs, text_col=text_col)
    bi = bigram_counts(docs, text_col=text_col, id_col=id_col)
    n_tot = uni.agg(F.sum("cnt").cast("bigint").alias("n_tokens"))
    c1 = uni.select(F.col("token").alias("w1"), F.col("cnt").alias("c1"))
    c2 = uni.select(F.col("token").alias("w2"), F.col("cnt").alias("c2"))
    scored = (
        bi.where(F.col("cnt") >= min_count)
        .join(c1, "w1")
        .join(c2, "w2")
        .crossJoin(F.broadcast(n_tot))
        .select(
            "w1", "w2",
            F.col("cnt").cast("bigint").alias("n_pair"),
            F.col("c1").cast("bigint").alias("n_w1"),
            F.col("c2").cast("bigint").alias("n_w2"),
            # + 0.0: signed-zero normalization for near-zero negative
            # PMI (the verify-skill round() divergence rule)
            (F.round(
                F.log(
                    (F.col("cnt").cast("double")
                     * F.col("n_tokens").cast("double"))
                    / (F.col("c1").cast("double")
                       * F.col("c2").cast("double"))
                ), 9
            ) + F.lit(0.0)).alias("pmi"),
        )
    )
    top = scored.orderBy(
        F.col("pmi").desc(), F.col("w1").asc(), F.col("w2").asc()
    ).limit(top_k)
    rw = Window.orderBy(
        F.col("pmi").desc(), F.col("w1").asc(), F.col("w2").asc()
    )
    return top.select(
        "w1", "w2", "n_pair", "n_w1", "n_w2", "pmi",
        F.row_number().over(rw).cast("int").alias("rank"),
    )


def vocab_richness(
    docs: DataFrame,
    text_col: str = "text",
    group_col: str = "lang",
) -> DataFrame:
    """Species-richness estimators over the corpus vocabulary, per
    group — the 'how much vocabulary have we NOT crawled yet' numbers
    that complement zipf_fit/heaps_fit: bias-corrected Chao1
    (Chao 1984/1987: V + f1(f1−1)/(2(f2+1)), a lower bound on the
    true type count from the hapax/dis-legomena ratio), the
    Good-Turing unseen-probability mass P₀ = f1/N (the chance the
    NEXT crawled token is a new type — when it stops falling, more
    crawl stops buying vocabulary), and the hapax ratio f1/V
    (template/spam corpora crater it; OCR noise inflates it).

    Returns one row per group:
    (group, n_tokens, vocab, f1, f2, chao1, unseen_mass, hapax_ratio).

    Exactness: V, N, f1, f2 are exact BIGINTs; each estimator is one
    IEEE division of integer-exact operands (plus one add for Chao1)
    — bit-identical cross-engine. The bias-corrected Chao1 form is
    total (defined at f2 = 0 where the classic f1²/2f2 blows up).

    100 TB shape: two shuffles, both map-side combinable — the
    (group, token) count collapse (the same relation zipf/heaps
    build) and the group-grain conditional rollup. Nothing after
    runs above group cardinality."""
    toks = docs.select(
        F.col(group_col).alias("g"),
        F.explode(tokens_col(text_col)).alias("token"),
    )
    c = toks.groupBy("g", "token").agg(
        F.count(F.lit(1)).cast("bigint").alias("cnt")
    )
    s = c.groupBy("g").agg(
        F.count(F.lit(1)).cast("bigint").alias("vocab"),
        F.sum("cnt").cast("bigint").alias("n_tokens"),
        F.sum((F.col("cnt") == 1).cast("bigint")).cast("bigint").alias("f1"),
        F.sum((F.col("cnt") == 2).cast("bigint")).cast("bigint").alias("f2"),
    )
    return s.select(
        F.col("g").alias(group_col),
        "n_tokens",
        "vocab",
        "f1",
        "f2",
        (
            F.col("vocab").cast("double")
            + (F.col("f1") * (F.col("f1") - F.lit(1))).cast("double")
            / (F.lit(2) * (F.col("f2") + F.lit(1))).cast("double")
        ).alias("chao1"),
        (F.col("f1").cast("double") / F.col("n_tokens").cast("double"))
        .alias("unseen_mass"),
        (F.col("f1").cast("double") / F.col("vocab").cast("double"))
        .alias("hapax_ratio"),
    )


def llr_keywords(
    df: DataFrame,
    group_col: str,
    text_col: str = "text",
    top_k: int = 10,
    min_count: int = 5,
) -> DataFrame:
    """Dunning log-likelihood (G², "Accurate Methods for the
    Statistics of Surprise and Coincidence", 1993) distinctive
    keywords per group — WHAT vocabulary characterizes this
    language/source/cluster against the rest of the corpus? The
    robust-at-low-counts complement of tf-idf and PMI (both already
    in this module's family): G² = 2·Σ_cells k·ln(k·N/(row·col))
    over the 2×2 (in-group vs rest) × (term vs other-terms) grid.

    Returns (group, term, k11, term_total, group_total, n_total,
    llr, rank) — each group's `top_k` OVER-represented terms
    (k11·N > group_total·term_total, an exact integer test), rank ≤
    top_k by (llr desc, term asc). Exactness: all four margins are
    exact BIGINTs; each cell term is k·(ln k + ln N − ln row −
    ln col) — the ln-chain form, so no k·N product can leave the
    exact-integer double range — 9dp-quantized; the four cell terms
    sum in exact DECIMAL and the final ×2 is exact. Zero cells
    contribute zero (the G² convention).

    100 TB shape: ONE map-side-combinable groupBy to (group, term)
    grain; margins are two windows at that grain plus one
    unpartitioned scalar (each referenced once); candidate filter
    (min_count + over-representation) cuts the relation BEFORE the
    per-group top-k window."""
    from .text import tokens_col

    if top_k < 1 or min_count < 1:
        raise ValueError("top_k/min_count must be >= 1")
    tok = df.select(
        F.col(group_col).alias("grp"),
        F.explode(tokens_col(text_col)).alias("term"),
    ).where(F.col("grp").isNotNull())
    from mindocr_spark.cache import tracked_persist

    cells = tracked_persist(
        tok.groupBy("grp", "term").agg(
            F.count(F.lit(1)).cast("bigint").alias("k11")
        )
    )
    w_term = Window.partitionBy("term")
    w_grp = Window.partitionBy("grp")
    # the grand total is a map-side-combinable aggregate + broadcast
    # cross join — NOT an unpartitioned window, which would funnel
    # the whole vocabulary-grain relation through one task
    n_tot = cells.groupBy().agg(
        F.sum("k11").cast("bigint").alias("n_total")
    )
    sized = cells.select(
        "grp",
        "term",
        "k11",
        F.sum("k11").over(w_term).cast("bigint").alias("term_total"),
        F.sum("k11").over(w_grp).cast("bigint").alias("group_total"),
    ).crossJoin(F.broadcast(n_tot))
    # over-representation compared in DECIMAL(15,0) products: BIGINT
    # k11·N overflows int64 once N reaches web-corpus token counts
    # (~2e13); DECIMAL(31,0) is exact to 10^15 tokens
    d15 = lambda c: F.col(c).cast("decimal(15,0)")
    cand = sized.where(
        (F.col("k11") >= min_count)
        & (d15("k11") * d15("n_total")
           > d15("group_total") * d15("term_total"))
    )

    def cell(k, row, col):
        kd = k.cast("double")
        term = kd * (
            F.log(kd)
            + F.log(F.col("n_total").cast("double"))
            - F.log(row.cast("double"))
            - F.log(col.cast("double"))
        )
        return F.when(k > 0, F.round(term, 9)).otherwise(F.lit(0.0))

    k11 = F.col("k11")
    tt = F.col("term_total")
    gt = F.col("group_total")
    n = F.col("n_total")
    k12 = tt - k11
    k21 = gt - k11
    k22 = n - tt - k21
    llr = (
        F.lit(2.0)
        * (
            cell(k11, gt, tt).cast("decimal(28,9)")
            + cell(k12, n - gt, tt).cast("decimal(28,9)")
            + cell(k21, gt, n - tt).cast("decimal(28,9)")
            + cell(k22, n - gt, n - tt).cast("decimal(28,9)")
        ).cast("double")
    )
    scored = cand.select(
        F.col("grp").alias("group"),
        "term",
        "k11",
        "term_total",
        "group_total",
        "n_total",
        llr.alias("llr"),
    )
    w_rank = Window.partitionBy("group").orderBy(
        F.col("llr").desc(), F.col("term").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w_rank))
        .where(F.col("rank") <= top_k)
        .select(
            "group", "term", "k11", "term_total", "group_total",
            "n_total", "llr",
            F.col("rank").cast("bigint").alias("rank"),
        )
    )

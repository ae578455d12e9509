"""classifier — hashed-linear quality-classifier scoring.

The model-based curation gate (FineWeb-Edu / DCLM style): a trained
text classifier scores every document and the pipeline keeps the
high-scoring head. The production shape is a hashed bag-of-words
linear model — fastText's architecture — because it is the one
classifier family that runs at 10^12-doc scale as pure relational
algebra: token → hash bucket → broadcast weight lookup → per-doc sum.

This module implements exactly that plumbing with a DETERMINISTIC
STUB weight table (a pinned integer formula over the bucket index —
no RNG, no training), making the whole path oracle-checkable. The
weight table is the injectable seam: swap :func:`hashed_weights` for
real exported classifier weights (same (bucket, weight) relation) and
nothing else changes — schema, joins, aggregation, and the score
contract are production-real.

100 TB shape: bucketing is one codegen md5-prefix per token; the
weight relation is tiny (2^b rows) and BROADCAST; the only shuffle is
the per-doc sum, map-side combinable on the uniform id key. Weights
are exact DECIMAL rationals so per-doc sums are exact and
order-independent; the final mean is one correctly-rounded double
division (no display rounding — the lm_logppl lesson).

Reference lineage: cls_mv3's score-and-route stage (reference:
mindocr/models/cls_mv3.py + postprocess/cls_postprocess.py:15-27) —
a small model's scalar output deciding a document's downstream
treatment.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from .text import tokens_col

#: Bucket count = one md5 hex pair (the sequence-pack precedent).
N_BUCKETS = 256

#: Denominator of the stub weight rationals.
_W_SCALE = 1000


def hashed_weights(n_buckets: int = N_BUCKETS) -> list[tuple[str, str]]:
    """The pinned stub weight table: bucket hex-prefix → weight as a
    DECIMAL STRING in [-1, 1] with denominator 1000. Knuth
    multiplicative hashing over the bucket index spreads signs/values;
    both engines receive these exact strings (Spark via a local
    relation, DuckDB via VALUES), so there is no float parsing drift."""
    out = []
    for i in range(n_buckets):
        v = (i * 2654435761 + 104729) % (2 * _W_SCALE + 1) - _W_SCALE
        out.append((format(i, "02x"), "%.3f" % (v / _W_SCALE)))
    return out


def quality_classifier_score(
    df: DataFrame,
    weights: list[tuple[str, str]] | None = None,
    threshold: float = 0.0,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Score every doc with the hashed linear model:
    (id, n_tokens, logit_sum, score, keep).

    score = (Σ_t w[md5(t)[:2]]) / n_tokens;  keep = score ≥ threshold.
    Zero-token docs score NULL and keep=false (no evidence ≠ keep —
    the curation gates downstream drop them on min_chars anyway)."""
    spark = df.sparkSession
    if weights is None:
        weights = hashed_weights()
    elif not weights:
        # an empty export is a caller bug — silently substituting the
        # stub table would score real corpora with fake weights
        raise ValueError("empty classifier weight table")
    w = spark.createDataFrame(
        list(weights),
        "bucket string, w_str string",
    ).select("bucket", F.col("w_str").cast("decimal(10,3)").alias("w"))
    toks = df.select(
        F.col(id_col).alias("__id"),
        F.explode(tokens_col(text_col)).alias("__tok"),
    ).select(
        "__id",
        F.substring(
            F.md5(F.col("__tok").cast("binary")), 1, 2
        ).alias("bucket"),
    )
    sums = (
        toks.join(F.broadcast(w), "bucket")
        .groupBy("__id")
        .agg(F.sum(F.col("w").cast("decimal(28,9)")).alias("logit"))
    )
    base = df.select(
        F.col(id_col).alias("__id"),
        F.size(tokens_col(text_col)).alias("n_tokens"),
    )
    score = F.col("logit").cast("double") / F.col("n_tokens").cast("double")
    return (
        base.join(sums, "__id", "left")
        .select(
            F.col("__id").alias(id_col),
            "n_tokens",
            F.coalesce(F.col("logit"), F.lit(0).cast("decimal(28,9)"))
            .cast("double").alias("logit_sum"),
            F.when(F.col("n_tokens") > 0, score).alias("score"),
            F.when(
                F.col("n_tokens") > 0, score >= F.lit(threshold)
            ).otherwise(F.lit(False)).alias("keep"),
        )
    )


def dsir_logweights(
    df: DataFrame,
    target,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """DSIR importance weighting (Data Selection via Importance
    Resampling, Xie et al. 2023): score every document by how much its
    hashed-bigram distribution looks like a TARGET slice of the corpus
    versus the RAW remainder, without training anything — the
    importance estimator is two smoothed count distributions.

    `target` is a boolean Column over `df`'s columns naming the target
    slice (e.g. ``F.col("lang") == "en"``). Features are adjacent
    word bigrams (every OCCURRENCE, not distinct — the estimator is a
    distribution, so multiplicity is signal), hashed to 256 buckets by
    md5 prefix (the `quality_classifier_score` bucket discipline).

    Per bucket b: ``λ(b) = round(ln p_t(b), 9) − round(ln p_r(b), 9)``
    with Laplace-smoothed ``p(b) = (c(b)+1)/(N+256)``. Per doc:
    ``logweight = Σ_grams λ(bucket(gram))`` summed as DECIMAL over the
    9-dp-quantized λ values — exact and order-independent — and
    ``avg_logweight`` is one IEEE division. Docs with no bigram (< 2
    tokens) report (0 grams, NULL weights): no evidence.

    100 TB shape: the bucket table is 256 rows built by ONE map-side-
    combinable groupBy over the gram stream and broadcast back; the
    only other shuffle is the per-doc sum on the uniform id key.
    Bigram generation is narrow (slice/transform — the word_shingles
    shape). Swap the derived λ table for one exported from a held-out
    target corpus and nothing else changes — the same injectable-seam
    contract as the classifier weights.

    Reference lineage: score-and-route on a lightweight model's scalar
    (reference: mindocr/postprocess/cls_postprocess.py:15-27); DSIR is
    that gate with the scorer derived from corpus statistics instead
    of trained weights.
    """
    n_buckets = N_BUCKETS
    with_toks = df.select(
        F.col(id_col).alias("__id"),
        # a NULL target verdict (e.g. F.col("lang") == "en" over a
        # NULL lang) must land in the RAW remainder, not silently
        # vanish from BOTH distributions — sum() skips NULLs, which
        # would shrink n_t/n_r and skew every bucket's λ
        F.coalesce(target.cast("boolean"), F.lit(False)).alias("__tgt"),
        tokens_col(text_col).alias("__toks"),
    )
    toks = F.col("__toks")
    grams_arr = F.when(
        F.size(toks) >= 2,
        F.transform(
            F.sequence(F.lit(1), F.size(toks) - 1),
            lambda i: F.array_join(F.slice(toks, i, 2), " "),
        ),
    ).otherwise(F.array().cast("array<string>"))
    from mindocr_spark.cache import tracked_persist

    # persisted: the gram stream feeds TWO different shuffles (bucket
    # counts and per-doc sums) — exchange reuse cannot apply, and
    # without the persist the corpus-sized tokenize+slice+md5 pass
    # runs twice (the _shingle_intersections precedent)
    grams = tracked_persist(
        with_toks.select(
            "__id", "__tgt", F.explode(grams_arr).alias("__g")
        ).select(
            "__id", "__tgt",
            F.substring(F.md5(F.col("__g").cast("binary")), 1, 2)
            .alias("bucket"),
        )
    )
    counts = grams.groupBy("bucket").agg(
        F.sum(F.col("__tgt").cast("bigint")).alias("c_t"),
        F.sum((~F.col("__tgt")).cast("bigint")).alias("c_r"),
    )
    totals = counts.agg(
        F.sum("c_t").cast("bigint").alias("n_t"),
        F.sum("c_r").cast("bigint").alias("n_r"),
    )
    lam = (
        counts.crossJoin(F.broadcast(totals))
        .select(
            "bucket",
            (
                F.round(
                    F.log(
                        (F.col("c_t") + 1).cast("double")
                        / (F.col("n_t") + n_buckets).cast("double")
                    ), 9
                )
                - F.round(
                    F.log(
                        (F.col("c_r") + 1).cast("double")
                        / (F.col("n_r") + n_buckets).cast("double")
                    ), 9
                )
            ).alias("lam"),
        )
    )
    sums = (
        grams.join(F.broadcast(lam), "bucket")
        .groupBy("__id")
        .agg(
            F.count(F.lit(1)).alias("n_grams"),
            F.sum(F.col("lam").cast("decimal(28,9)")).alias("lw"),
        )
    )
    avg = F.col("lw").cast("double") / F.col("n_grams").cast("double")
    return (
        with_toks.select("__id")
        .join(sums, "__id", "left")
        .select(
            F.col("__id").alias(id_col),
            F.coalesce("n_grams", F.lit(0)).cast("bigint")
            .alias("n_grams"),
            F.when(F.col("n_grams") > 0, F.col("lw").cast("double"))
            .alias("logweight"),
            # + 0.0 normalizes IEEE signed zero: a tiny negative mean
            # rounds to -0.0 in DuckDB but +0.0 in Spark's round();
            # adding +0.0 maps both to +0.0 and is exact for x ≠ 0
            F.when(F.col("n_grams") > 0, F.round(avg, 6) + F.lit(0.0))
            .alias("avg_logweight"),
        )
    )


def quantile_gate(
    scored: DataFrame,
    keep_frac: float = 0.6,
    score_col: str = "score",
    id_col: str = "doc_id",
) -> DataFrame:
    """Dynamic-threshold curation gate (the FineWeb-Edu "keep the top
    X% by classifier score" step): the cutoff is the corpus's own
    (1−keep_frac) quantile, not a hand-tuned constant — so the gate
    tracks score-distribution drift across crawls instead of silently
    keeping 90% of one snapshot and 10% of the next.

    Returns (id, score, threshold, keep) flag-style — no row vanishes;
    NULL scores (no evidence) report keep=false and ride along with
    the corpus-wide threshold. Keep is ``score ≥ threshold`` with the
    exact interpolated quantile (the `length_quantiles` cross-engine
    contract: Spark `percentile` ↔ DuckDB `quantile_cont` are
    bit-identical at (n−1)·p linear interpolation).

    The threshold is a broadcast ONE-ROW aggregate over the narrow
    (id, score) projection — `F.percentile` runs as a distributed
    partial+final aggregate (per-partition buffers, one merge), never
    as an unpartitioned window that would move every full-width row
    to a single task. The projection is tracked_persist-ed so the
    threshold branch and the output branch share one execution of the
    upstream classifier scoring (the persisted-diamond discipline).
    100 TB shape: the exact percentile still merges all score values
    once — at 10^12 rows swap `F.percentile` for
    `F.approx_percentile` (t-digest, map-side combinable) exactly as
    in `length_quantiles`; schema and consumers unchanged.

    Reference lineage: `drop_score` filtering of recognition results
    (reference: tools/infer/text/predict_system.py:103-118) — the
    same score gate with the constant replaced by a corpus quantile."""
    if not (0.0 < keep_frac <= 1.0):
        raise ValueError(f"keep_frac must be in (0, 1], got {keep_frac}")
    from mindocr_spark.cache import tracked_persist

    q = 1.0 - keep_frac
    base = tracked_persist(scored.select(id_col, score_col))
    thr_row = base.agg(
        F.percentile(score_col, F.lit(q)).alias("threshold"))
    return base.crossJoin(F.broadcast(thr_row)).select(
        id_col,
        score_col,
        "threshold",
        F.coalesce(
            F.col(score_col) >= F.col("threshold"), F.lit(False)
        ).alias("keep"),
    )


# --------------------------------------------------------------------------
# In-corpus trained Naive Bayes (the trainable-classifier path)
# --------------------------------------------------------------------------


def nb_train_score(
    df: DataFrame,
    label: Column,
    classes: tuple[str, ...] | list[str],
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Train a multinomial Naive Bayes text classifier ON the corpus's
    labeled slice and score EVERY document — the in-pipeline
    counterpart of `quality_classifier_score`'s injected-weights seam:
    here the weights are derived by Spark aggregations, so the whole
    train→score loop is one lazy plan (domain labeling, spam seeds,
    topic routing all take this shape when no external model exists).

    ``label`` is a Column evaluating to a member of ``classes`` for
    TRAINING rows and NULL for rows that only get scored. Model, all
    exactly reproducible cross-engine:

    - ``lp(t|c) = round(ln((cnt_tc + 1) / (tot_c + V)), 9)`` — Laplace
      over token OCCURRENCES, V = distinct training vocabulary;
    - OOV default per class: ``round(ln(1 / (tot_c + V)), 9)``;
    - smoothed prior: ``round(ln((nd_c + 1) / (nd + K)), 9)`` (add-one
      over docs, K = |classes| — no class can reach ln 0);
    - per-doc class score = prior + Σ occurrences, summed as
      DECIMAL(28,9) over the 9-dp-quantized terms (order-independent,
      exact); ``pred`` = first class in ``classes`` order among the
      score maxima (deterministic tie rule).

    100 TB shape: training counts are ONE map-side-combinable groupBy
    on the token key with K conditional sums (the dsir c_t/c_r
    device); totals/priors are a bounded relation broadcast back.
    Scoring joins the token stream against the vocabulary-keyed
    logprob table — an honest shuffle join at web scale (the
    `pmi_collocations` posture: a 10^8-row vocabulary is not
    broadcastable) — then one groupBy on the uniform doc key. Token
    streams feed two shuffles, so the exploded relation is persisted
    (the dsir precedent). Zero Python anywhere.

    Reference lineage: cls_mv3 score-and-route
    (reference: mindocr/models/cls_mv3.py,
    mindocr/postprocess/cls_postprocess.py:15-27) with the model
    parameters estimated by the pipeline itself instead of loaded.
    """
    classes = tuple(classes)
    if len(classes) < 2:
        raise ValueError("need at least 2 classes")
    if len(set(classes)) != len(classes):
        raise ValueError("duplicate class names")
    k = len(classes)

    from mindocr_spark.cache import tracked_persist

    with_toks = df.select(
        F.col(id_col).alias("__id"),
        label.cast("string").alias("__lbl"),
        tokens_col(text_col).alias("__toks"),
    )
    toks = tracked_persist(
        with_toks.select(
            "__id", "__lbl", F.explode("__toks").alias("__t")
        )
    )
    train = toks.where(F.col("__lbl").isin(*classes))

    counts = train.groupBy("__t").agg(
        *[
            F.sum((F.col("__lbl") == c).cast("bigint")).alias(f"cnt_{i}")
            for i, c in enumerate(classes)
        ]
    )
    docs_per_class = with_toks.where(F.col("__lbl").isin(*classes)).agg(
        *[
            F.sum((F.col("__lbl") == c).cast("bigint")).alias(f"nd_{i}")
            for i, c in enumerate(classes)
        ],
        F.count(F.lit(1)).alias("nd"),
    )
    totals = (
        counts.agg(
            F.count(F.lit(1)).alias("v"),
            *[
                F.sum(f"cnt_{i}").cast("bigint").alias(f"tot_{i}")
                for i in range(k)
            ],
        )
        .crossJoin(F.broadcast(docs_per_class))
    )

    def _lp(num: Column, den: Column) -> Column:
        return F.round(F.log(num.cast("double") / den.cast("double")), 9)

    # the vocab key is RENAMED (__vt): lp derives from toks, so joining
    # scoring stream to lp is a self-join — with the shared name Spark
    # resolves the equi-predicate as trivially true and repairs it
    # through the ambiguous-self-join path (measured: 1-ulp-of-1e-9
    # drift on a handful of rows); distinct names keep the join honest
    lp = counts.crossJoin(F.broadcast(totals)).select(
        F.col("__t").alias("__vt"),
        *[
            _lp(F.col(f"cnt_{i}") + 1, F.col(f"tot_{i}") + F.col("v"))
            .alias(f"lp_{i}")
            for i in range(k)
        ],
    )
    model = totals.select(
        "v",
        *[
            _lp(F.lit(1), F.col(f"tot_{i}") + F.col("v"))
            .alias(f"def_{i}")
            for i in range(k)
        ],
        *[
            _lp(F.col(f"nd_{i}") + 1, F.col("nd") + k)
            .alias(f"prior_{i}")
            for i in range(k)
        ],
    )
    scored = (
        toks.join(lp, F.col("__t") == F.col("__vt"), "left")
        .crossJoin(F.broadcast(model))
        .groupBy("__id")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            *[
                F.sum(
                    F.coalesce(F.col(f"lp_{i}"), F.col(f"def_{i}"))
                    .cast("decimal(28,9)")
                ).alias(f"s_{i}")
                for i in range(k)
            ],
        )
    )
    priors = model.select(
        *[F.col(f"prior_{i}").cast("decimal(28,9)").alias(f"prior_{i}")
          for i in range(k)]
    )
    out = (
        with_toks.select("__id", "__lbl")
        .join(scored, "__id", "left")
        .crossJoin(F.broadcast(priors))
    )
    # the SUM result is decimal(38,9); adding the prior directly would
    # overflow precision 38 and Spark resolves that by REDUCING SCALE
    # to 8 (silent half-up rounding of every score). Narrow the sum
    # back to (28,9) first — exact, per-doc scores are O(1e5) — so the
    # addition stays at scale 9 like the DuckDB twin.
    score_cols = [
        (F.col(f"prior_{i}")
         + F.coalesce(F.col(f"s_{i}"), F.lit(0).cast("decimal(28,9)"))
         .cast("decimal(28,9)"))
        .alias(f"__sc_{i}")
        for i in range(k)
    ]
    out = out.select("__id", "__lbl", "n_tokens", *score_cols)
    # argmax with the first-class-wins tie rule: class i wins iff its
    # score is >= every later class's and > none earlier beat it —
    # rendered as one CASE chain, identical in the SQL twin.
    pred: Column = F.lit(classes[-1])
    for i in range(k - 2, -1, -1):
        cond = None
        for j in range(i + 1, k):
            c = F.col(f"__sc_{i}") >= F.col(f"__sc_{j}")
            cond = c if cond is None else (cond & c)
        pred = F.when(cond, F.lit(classes[i])).otherwise(pred)
    return out.select(
        F.col("__id").alias(id_col),
        F.col("__lbl").alias("train_label"),
        F.coalesce("n_tokens", F.lit(0)).cast("bigint").alias("n_tokens"),
        *[
            F.col(f"__sc_{i}").cast("double").alias(f"score_{c}")
            for i, c in enumerate(classes)
        ],
        pred.alias("pred"),
    )


def gate_agreement(
    df: DataFrame,
    col_a: str,
    col_b: str,
    group_cols: tuple = ("lang",),
) -> DataFrame:
    """Cohen's kappa agreement audit between two boolean curation
    gates — the gate-redundancy question: does the expensive gate
    actually disagree with the cheap one, or are you paying twice for
    the same verdict? Kappa corrects raw agreement for chance
    (two gates that each keep 95% agree 90.5% by luck alone), so
    kappa ≈ 0 means the gates are independent and BOTH earn their
    place; kappa → 1 means one is redundant. Rows with a NULL verdict
    on either side are excluded (they were never comparable).

    Returns one row per group: (group..., n, both_keep, both_drop,
    only_a, only_b, p_o, p_e, kappa). Exactness: the five counts are
    exact BIGINTs; p_o = (both_keep+both_drop)/n and
    p_e = (keep_a·keep_b + drop_a·drop_b)/n² each divide exact
    integers (bit-identical); kappa = (p_o−p_e)/(1−p_e) operates on
    those two identical doubles — NULL when p_e = 1 (degenerate
    marginals: chance explains everything, kappa undefined).

    100 TB shape: ONE map-side-combinable groupBy at group
    cardinality; the gate columns were computed row-local upstream.
    Everything after the aggregate runs at group grain.

    Reference analog: the reference evaluates recognition variants by
    pairwise metric comparison across eval runs
    (reference: mindocr/metrics/rec_metrics.py); this is that
    comparison for curation gates."""
    a, b = F.col(col_a), F.col(col_b)
    g = (
        df.where(a.isNotNull() & b.isNotNull())
        .groupBy(*[F.col(c) for c in group_cols])
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.sum((a & b).cast("bigint")).cast("bigint").alias("both_keep"),
            F.sum((~a & ~b).cast("bigint")).cast("bigint").alias("both_drop"),
            F.sum((a & ~b).cast("bigint")).cast("bigint").alias("only_a"),
            F.sum((~a & b).cast("bigint")).cast("bigint").alias("only_b"),
        )
    )
    ka = F.col("both_keep") + F.col("only_a")
    kb = F.col("both_keep") + F.col("only_b")
    da = F.col("n") - ka
    db = F.col("n") - kb
    p_o = (F.col("both_keep") + F.col("both_drop")).cast("double") / F.col(
        "n"
    ).cast("double")
    p_e = (ka * kb + da * db).cast("double") / (
        F.col("n") * F.col("n")
    ).cast("double")
    out = g.withColumn("p_o", p_o).withColumn("p_e", p_e)
    kappa = F.when(
        F.col("p_e") != 1.0,
        (F.col("p_o") - F.col("p_e")) / (F.lit(1.0) - F.col("p_e")),
    )
    return out.withColumn("kappa", kappa)


def calibration_ece(
    df: DataFrame, prob_col: str, label_col: str, bins: int = 10
) -> DataFrame:
    """Reliability-diagram binning + expected calibration error (ECE,
    Naeini et al. 2015) of a probabilistic gate against ground truth —
    the audit that decides whether a classifier's scores can be used
    as THRESHOLDS (calibrated: predicted 0.8 ≈ observed 80% positive)
    or only as a RANKING. Rows with NULL prob or label are excluded.

    Returns one row per non-empty confidence bin, ordered by bin:
    (bin, n_bin, n_pos, mean_conf, accuracy, abs_gap, ece) — ece is
    the n-weighted Σ|accuracy − mean_conf| repeated on every row.

    Exactness discipline: bin = least(bins−1, floor(p·bins)) on the
    raw double; per-bin confidences are 9-dp-quantized then
    DECIMAL(28,9)-summed (order-free — partitioning cannot change the
    sum); accuracy divides exact integers; the cross-bin ECE sum is
    again a quantized DECIMAL sum, so every output bit is a pure
    function of the input.

    100 TB shape: ONE map-side-combinable groupBy at bin cardinality
    (≤ bins rows survive); the cross-bin ECE totals are a broadcast
    one-row aggregate over the tracked_persist-ed bin frame (never an
    unpartitioned window). The probability and label columns were
    computed row-local upstream."""
    if bins < 2:
        raise ValueError(f"need bins >= 2, got {bins}")
    from mindocr_spark.cache import tracked_persist

    p, y = F.col(prob_col), F.col(label_col)
    pl = df.where(p.isNotNull() & y.isNotNull())
    b = pl.groupBy(
        F.least(F.lit(bins - 1), F.floor(p * bins).cast("int")).alias("bin")
    ).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_bin"),
        F.sum(y.cast("bigint")).cast("bigint").alias("n_pos"),
        F.sum(F.round(p, 9).cast("decimal(28,9)")).alias("sum_p"),
    )
    m = b.select(
        "bin",
        "n_bin",
        "n_pos",
        (F.col("sum_p").cast("double") / F.col("n_bin").cast("double"))
        .alias("mean_conf"),
        (F.col("n_pos").cast("double") / F.col("n_bin").cast("double"))
        .alias("accuracy"),
    ).withColumn("abs_gap", F.abs(F.col("accuracy") - F.col("mean_conf")))
    m = tracked_persist(m)
    tot = m.agg(
        F.sum(
            F.round(F.col("abs_gap") * F.col("n_bin").cast("double"), 9)
            .cast("decimal(28,9)")
        ).alias("_gap_sum"),
        F.sum("n_bin").alias("_n_sum"),
    )
    return (
        m.crossJoin(F.broadcast(tot))
        .withColumn(
            "ece",
            F.col("_gap_sum").cast("double")
            / F.col("_n_sum").cast("double"))
        .drop("_gap_sum", "_n_sum")
    )

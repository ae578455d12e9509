"""stats — distribution-level hypothesis tests for corpus monitoring.

A continuously-refreshed training corpus needs distribution-grade
change detection, not just mean/median fences: a recrawl that shifts
the WHOLE document-length distribution (new boilerplate, new template,
new extraction bug) can leave the mean untouched while every quantile
moves. Three classical nonparametric tests, each expressed as exact
integer statistics feeding one pinned IEEE formula (the
``ab_test_proportions`` exactness discipline), plus a Benford
first-digit audit for fabricated-numbers forensics:

1. **Two-sample Kolmogorov–Smirnov** (:func:`ks_2sample`) — the
   largest ECDF gap between two samples. D's NUMERATOR is an exact
   BIGINT (``|i·m − j·n|`` over the merged value grid), divided once.
2. **Mann–Whitney rank-sum** (:func:`rank_sum_test`) — location-shift
   test robust to outliers. The doubled rank sum ``2·R`` is an exact
   BIGINT (average tie-ranks are dyadic halves), tie-corrected normal
   approximation for z.
3. **Mann–Kendall trend + Sen slope** (:func:`mann_kendall_trend`) —
   monotone-trend detection over a per-period series (S is an exact
   pair-sign sum; the Sen slope median is selected by explicit middle
   ranks, never an engine quantile function).
4. **Benford first-digit audit** (:func:`benford_first_digit`) —
   χ² of observed leading digits against Benford expectation, the
   standard fabricated-metrics screen.

Plus the rank-statistics family over the same collapsed-grid machinery:

5. **ROC-AUC** (:func:`roc_auc`) — threshold-free scorer evaluation
   via the exact Mann–Whitney identity (2·U an exact BIGINT).
6. **Kendall τ-b** (:func:`kendall_tau`) — gate-redundancy audit;
   concordant/discordant pair counts exact DECIMAL(38,0) sums over
   the (x, y) cell grid.
7. **Spearman ρ** (:func:`spearman_rho`) — monotone association from
   doubled average ranks; five exact decimal moment sums, one IEEE
   expression.
8. **χ² independence** (:func:`chi2_independence`) — categorical
   association over the full r×c contingency grid (observed-zero
   cells included); each (o−e)²/e term 9dp-quantized then
   DECIMAL-summed, Cramér's V as the effect size.
9. **PSI drift** (:func:`psi_drift`) — population stability index
   between two snapshots over a bucketed signal, Laplace-smoothed so
   one-sided buckets stay finite; each (pₐ−p_b)·ln(pₐ/p_b) term
   9dp-quantized then DECIMAL-summed.
10. **CUSUM changepoint** (:func:`cusum_changepoint`) — single
    mean-shift localization over a per-period series via the
    n-scaled cumulative sum ``S'_t = n·Σ_{i≤t}x − t·Σx`` (an exact
    BIGINT — no x̄ division until the final readout).

100 TB shape: every test collapses the corpus FIRST — one map-side-
combinable groupBy to (stratum, value) or (stratum, period) grain —
and all window/self-join work happens at that collapsed grain,
partitioned by stratum. Nothing here ever sorts or joins row-grain
data.

Reference lineage: the reference's eval loop reduces per-sample
scores to corpus-level metrics and compares runs by those scalars
(reference: mindocr/metrics/det_metrics.py:79-156, AllReduce
partial+final); these tests are the same reduce shape where the
compared object is the distribution itself.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, Window, functions as F


def ks_2sample(
    df: DataFrame,
    group_col: str,
    value_col: str,
    group_a: str,
    group_b: str,
    by: tuple = (),
    c_alpha: float = 1.358,
) -> DataFrame:
    """Two-sample Kolmogorov–Smirnov test per stratum: D = sup_x
    |ECDF_a(x) − ECDF_b(x)| between the `group_a` and `group_b`
    samples of `value_col`, with the large-sample rejection fence
    D > c(α)·√((n_a+n_b)/(n_a·n_b)) (c = 1.358 ↔ α = 0.05).

    Returns one row per stratum: (*by, n_a, n_b, d_num, d, d_crit,
    drifted). Exactness: at every merged grid value the ECDF gap is
    the INTEGER |i·n_b − j·n_a| (i, j = cumulative counts), so
    ``d_num`` is an exact BIGINT and ``d = d_num/(n_a·n_b)`` is one
    IEEE division; d_crit is one pinned sqrt of an integer ratio —
    bit-identical cross-engine. Either sample empty → d/d_crit NULL,
    drifted false.

    100 TB shape: one groupBy collapses both samples to
    (stratum, value) grain; the cumulative walk is a window
    PARTITIONED BY stratum over that collapsed grid (distinct values,
    not rows), then one max per stratum."""
    keys = list(by)
    tagged = df.where(
        F.col(group_col).isin(group_a, group_b)
        & F.col(value_col).isNotNull()
    ).select(
        *keys,
        F.col(value_col).alias("v"),
        (F.col(group_col) == group_a).alias("is_a"),
    )
    grid = tagged.groupBy(*keys, "v").agg(
        F.sum(F.col("is_a").cast("bigint")).cast("bigint").alias("ca"),
        F.sum((~F.col("is_a")).cast("bigint")).cast("bigint").alias("cb"),
    )
    w_cum = (
        Window.partitionBy(*keys)
        .orderBy("v")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_all = Window.partitionBy(*keys)
    walked = grid.select(
        *keys,
        F.sum("ca").over(w_cum).alias("i"),
        F.sum("cb").over(w_cum).alias("j"),
        F.sum("ca").over(w_all).alias("n_a"),
        F.sum("cb").over(w_all).alias("n_b"),
    )
    agg = walked.groupBy(*keys).agg(
        F.max(
            F.abs(F.col("i") * F.col("n_b") - F.col("j") * F.col("n_a"))
        ).cast("bigint").alias("d_num"),
        F.max("n_a").cast("bigint").alias("n_a"),
        F.max("n_b").cast("bigint").alias("n_b"),
    )
    ok = (F.col("n_a") > 0) & (F.col("n_b") > 0)
    nm = F.col("n_a").cast("double") * F.col("n_b").cast("double")
    d = F.when(ok, F.col("d_num").cast("double") / nm)
    d_crit = F.when(
        ok,
        F.lit(float(c_alpha))
        * F.sqrt(
            (F.col("n_a") + F.col("n_b")).cast("double") / nm
        ),
    )
    return agg.select(
        *keys,
        "n_a",
        "n_b",
        "d_num",
        d.alias("d"),
        d_crit.alias("d_crit"),
        F.coalesce(d > d_crit, F.lit(False)).alias("drifted"),
    )


def rank_sum_test(
    df: DataFrame,
    group_col: str,
    value_col: str,
    group_a: str,
    group_b: str,
    by: tuple = (),
    z_crit: float = 1.96,
) -> DataFrame:
    """Mann–Whitney U (Wilcoxon rank-sum) test per stratum: does the
    `group_b` sample of `value_col` sit systematically above/below
    `group_a`? Robust to outliers and arbitrary distributions — the
    standard 'did the refresh move the distribution's location?'
    readout where a t-test would chase heavy tails.

    Returns one row per stratum: (*by, n_a, n_b, u2, u, tie_term, z,
    significant). Exactness: with ties at average ranks, TWICE the
    rank sum of sample a is the exact BIGINT
    ``Σ_values t_a·(2p + t + 1)`` (p = items strictly below, t = tie
    block size), so ``u2 = 2·U_a = r2_a − n_a(n_a+1)`` is exact;
    z = (u2 − n_a·n_b) / (2·σ) with the tie-corrected
    σ² = (n_a·n_b/12)·((N+1) − Σ(t³−t)/(N(N−1))) — one pinned IEEE
    expression over exact integers. z is NULL (significant false)
    when either sample is empty or every value is tied (σ = 0).

    100 TB shape: identical to :func:`ks_2sample` — collapse to
    (stratum, value) grain, one stratum-partitioned window over the
    value grid, one final groupBy."""
    keys = list(by)
    tagged = df.where(
        F.col(group_col).isin(group_a, group_b)
        & F.col(value_col).isNotNull()
    ).select(
        *keys,
        F.col(value_col).alias("v"),
        (F.col(group_col) == group_a).alias("is_a"),
    )
    grid = tagged.groupBy(*keys, "v").agg(
        F.sum(F.col("is_a").cast("bigint")).cast("bigint").alias("ta"),
        F.sum((~F.col("is_a")).cast("bigint")).cast("bigint").alias("tb"),
    )
    w_cum = (
        Window.partitionBy(*keys)
        .orderBy("v")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    t = F.col("ta") + F.col("tb")
    walked = grid.select(
        *keys,
        "ta",
        "tb",
        t.alias("t"),
        (F.sum(t).over(w_cum) - t).alias("p"),
    )
    agg = walked.groupBy(*keys).agg(
        F.sum("ta").cast("bigint").alias("n_a"),
        F.sum("tb").cast("bigint").alias("n_b"),
        F.sum(
            F.col("ta") * (F.lit(2) * F.col("p") + F.col("t") + F.lit(1))
        ).cast("bigint").alias("r2_a"),
        F.sum(
            F.col("t") * F.col("t") * F.col("t") - F.col("t")
        ).cast("bigint").alias("tie_term"),
    )
    u2 = (
        F.col("r2_a") - F.col("n_a") * (F.col("n_a") + F.lit(1))
    ).cast("bigint")
    n = F.col("n_a") + F.col("n_b")
    nd = n.cast("double")
    var = (
        (F.col("n_a").cast("double") * F.col("n_b").cast("double"))
        / F.lit(12.0)
    ) * (
        (nd + F.lit(1.0))
        - F.col("tie_term").cast("double") / (nd * (nd - F.lit(1.0)))
    )
    # z exists iff both samples non-empty and not everything is one
    # tie block (integer predicate: tie_term < n^3 - n ⇔ σ² > 0)
    zok = (
        (F.col("n_a") > 0)
        & (F.col("n_b") > 0)
        & (F.col("tie_term") < n * n * n - n)
    )
    z = F.when(
        zok,
        (u2 - F.col("n_a") * F.col("n_b")).cast("double")
        / (F.lit(2.0) * F.sqrt(var)),
    )
    return agg.select(
        *keys,
        "n_a",
        "n_b",
        u2.alias("u2"),
        (u2.cast("double") / F.lit(2.0)).alias("u"),
        "tie_term",
        z.alias("z"),
        F.coalesce(F.abs(z) >= F.lit(float(z_crit)), F.lit(False))
        .alias("significant"),
    )


def mann_kendall_trend(
    series: DataFrame,
    period_col: str,
    x_col: str,
    by: tuple = (),
    z_crit: float = 1.96,
) -> DataFrame:
    """Mann–Kendall monotone-trend test + Sen's slope per stratum over
    a (period, value) series — 'is corpus quality / volume drifting
    up or down over crawl snapshots?' without assuming linearity or
    normality. `series` must already be at one-row-per-(stratum,
    period) grain (the caller's groupBy collapsed the corpus).

    Returns (*by, n_periods, s_stat, tie_term, var_s, z, trend,
    sen_slope): S = Σ_{i<j} sign(x_j − x_i) (exact BIGINT via the
    stratum-local pair join), Var(S) = (n(n−1)(2n+5) − Σt(t−1)(2t+5))
    /18 with the tie correction, z the standard ±1-continuity form,
    trend ∈ increasing/decreasing/none at `z_crit`. Sen's slope is
    the median pairwise slope (x_j − x_i)/(p_j − p_i), selected by
    EXPLICIT middle ranks (floor((m+1)/2), floor((m+2)/2)) and
    averaged — never an engine quantile function, so the value is two
    exact-integer IEEE divisions and one pinned mean, bit-identical
    cross-engine. n < 2 → NULL z/slope, trend none.

    100 TB shape: the pair join is stratum-partitioned at PERIOD grain
    (n_periods² pairs per stratum, thousands at most — snapshots, not
    rows); one shuffle on the stratum key carries join, windows and
    the final aggregate."""
    keys = list(by)
    s = series.select(
        *keys,
        F.col(period_col).cast("bigint").alias("p"),
        F.col(x_col).cast("double").alias("x"),
    ).where(F.col("p").isNotNull() & F.col("x").isNotNull())
    left = s.select(
        *keys, F.col("p").alias("pi"), F.col("x").alias("xi")
    )
    right = s.select(
        *keys, F.col("p").alias("pj"), F.col("x").alias("xj")
    )
    pairs = left.join(right, keys) if keys else left.crossJoin(right)
    pairs = pairs.where(F.col("pj") > F.col("pi"))
    sgn = F.when(F.col("xj") > F.col("xi"), 1).when(
        F.col("xj") < F.col("xi"), -1
    ).otherwise(0)
    slope = (F.col("xj") - F.col("xi")) / (
        F.col("pj") - F.col("pi")
    ).cast("double")
    w_rank = Window.partitionBy(*keys).orderBy("slope", "pi", "pj")
    w_all = Window.partitionBy(*keys)
    ranked = pairs.select(
        *keys,
        "pi",
        "pj",
        sgn.alias("sgn"),
        slope.alias("slope"),
    ).select(
        *keys,
        "sgn",
        "slope",
        F.row_number().over(w_rank).alias("rn"),
        F.count(F.lit(1)).over(w_all).alias("m"),
    )
    lo = (F.col("m") + 1).cast("bigint") / F.lit(2)
    hi = (F.col("m") + 2).cast("bigint") / F.lit(2)
    pair_agg = ranked.groupBy(*keys).agg(
        F.sum("sgn").cast("bigint").alias("s_stat"),
        F.max("m").cast("bigint").alias("m"),
        F.avg(
            F.when(
                (F.col("rn") == F.floor(lo))
                | (F.col("rn") == F.floor(hi)),
                F.col("slope"),
            )
        ).alias("sen_slope"),
    )
    ties = (
        s.groupBy(*keys, "x")
        .agg(F.count(F.lit(1)).cast("bigint").alias("t"))
        .groupBy(*keys)
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_vals"),
            F.sum("t").cast("bigint").alias("n_periods"),
            F.sum(
                F.col("t")
                * (F.col("t") - 1)
                * (F.lit(2) * F.col("t") + 5)
            ).cast("bigint").alias("tie_var_term"),
        )
    )
    # ties side drives: a single-period stratum has NO pairs (pair_agg
    # row absent) but must still appear with NULL z / slope
    j = (
        ties.join(pair_agg, keys, "left")
        if keys
        else ties.crossJoin(pair_agg)
    )
    n = F.col("n_periods")
    var_s = (
        (
            n * (n - 1) * (F.lit(2) * n + 5) - F.col("tie_var_term")
        ).cast("double")
        / F.lit(18.0)
    )
    zok = (n >= 2) & (var_s > F.lit(0.0))
    z = F.when(
        zok & (F.col("s_stat") > 0),
        (F.col("s_stat") - 1).cast("double") / F.sqrt(var_s),
    ).when(
        zok & (F.col("s_stat") < 0),
        (F.col("s_stat") + 1).cast("double") / F.sqrt(var_s),
    ).when(zok, F.lit(0.0))
    return j.select(
        *keys,
        "n_periods",
        "s_stat",
        F.col("tie_var_term").alias("tie_term"),
        F.when(n >= 2, var_s).alias("var_s"),
        z.alias("z"),
        F.when(z >= F.lit(float(z_crit)), F.lit("increasing"))
        .when(z <= F.lit(-float(z_crit)), F.lit("decreasing"))
        .otherwise(F.lit("none")).alias("trend"),
        F.when(n >= 2, F.col("sen_slope")).alias("sen_slope"),
    )


def roc_auc(
    df: DataFrame,
    label_col: str,
    score_col: str,
    by: tuple = (),
) -> DataFrame:
    """ROC-AUC of a score against a boolean label per stratum — the
    threshold-free readout for any quality/spam/bot scorer the curate
    funnel gates on. AUC here is the exact Mann–Whitney identity
    P(score⁺ > score⁻) + ½P(tie), not a trapezoid over sampled
    thresholds.

    Returns (*by, n_pos, n_neg, u2, auc, gini). Exactness: with ties
    at average ranks, ``u2 = 2·U⁺ = Σ t⁺·(2p + t + 1) − n⁺(n⁺+1)`` is
    an exact BIGINT (same grid walk as :func:`rank_sum_test`), so
    ``auc = u2 / (2·n⁺·n⁻)`` is one IEEE division (the 2·n⁺·n⁻
    denominator is formed in doubles — no BIGINT overflow at any n)
    and ``gini = 2·auc − 1`` one fused literal expression. Either
    class empty → auc/gini NULL.

    100 TB shape: one map-side-combinable groupBy collapses the corpus
    to (stratum, score) grain; one stratum-partitioned window walks
    the score grid; one final groupBy. Nothing row-grain shuffles."""
    keys = list(by)
    tagged = df.where(
        F.col(score_col).isNotNull() & F.col(label_col).isNotNull()
    ).select(
        *keys,
        F.col(score_col).alias("v"),
        F.col(label_col).cast("boolean").alias("is_pos"),
    )
    grid = tagged.groupBy(*keys, "v").agg(
        F.sum(F.col("is_pos").cast("bigint")).cast("bigint").alias("tp"),
        F.sum((~F.col("is_pos")).cast("bigint")).cast("bigint")
        .alias("tn"),
    )
    w_cum = (
        Window.partitionBy(*keys)
        .orderBy("v")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    t = F.col("tp") + F.col("tn")
    walked = grid.select(
        *keys,
        "tp",
        "tn",
        t.alias("t"),
        (F.sum(t).over(w_cum) - t).alias("p"),
    )
    agg = walked.groupBy(*keys).agg(
        F.sum("tp").cast("bigint").alias("n_pos"),
        F.sum("tn").cast("bigint").alias("n_neg"),
        F.sum(
            F.col("tp") * (F.lit(2) * F.col("p") + F.col("t") + F.lit(1))
        ).cast("bigint").alias("r2_pos"),
    )
    u2 = (
        F.col("r2_pos") - F.col("n_pos") * (F.col("n_pos") + F.lit(1))
    ).cast("bigint")
    ok = (F.col("n_pos") > 0) & (F.col("n_neg") > 0)
    auc = F.when(
        ok,
        u2.cast("double")
        / (
            F.lit(2.0)
            * F.col("n_pos").cast("double")
            * F.col("n_neg").cast("double")
        ),
    )
    return agg.select(
        *keys,
        "n_pos",
        "n_neg",
        u2.alias("u2"),
        auc.alias("auc"),
        (F.lit(2.0) * auc - F.lit(1.0)).alias("gini"),
    )


def kendall_tau(
    df: DataFrame,
    x_col: str,
    y_col: str,
    by: tuple = (),
) -> DataFrame:
    """Kendall τ-b rank correlation between two (bucketed) signals per
    stratum — 'do these two quality gates rank documents the same
    way?' The redundancy audit for a gate stack: τ near 1 means a gate
    adds nothing; near 0, independent evidence.

    Returns (*by, n, n_conc, n_disc, pairs2, tie2_x, tie2_y, tau).
    Exactness: the corpus is collapsed to (x, y) CELL grain with exact
    BIGINT counts; concordant/discordant pair counts are
    Σ c_i·c_j over strictly-ordered cell pairs, accumulated as
    DECIMAL(38,0) (overflow-safe at any corpus size) and exposed as
    BIGINT. With A = 2(n0−n1) = n(n−1) − Σt_x(t_x−1) and
    B = 2(n0−n2) both exact integers,
    ``tau = 2·(C − D) / sqrt(A·B)`` is one pinned IEEE expression.
    A·B = 0 (a constant column) → tau NULL.

    100 TB shape: REQUIRES bucketed/quantized inputs (deciles, integer
    scores) so the cell grid is small — the cell self-join is
    stratum-partitioned and quadratic only in DISTINCT CELLS, never in
    rows. Feed it raw floats and the grid degenerates to row grain;
    bucket first."""
    keys = list(by)
    cells = df.where(
        F.col(x_col).isNotNull() & F.col(y_col).isNotNull()
    ).groupBy(
        *keys,
        F.col(x_col).alias("x"),
        F.col(y_col).alias("y"),
    ).agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    a = cells.select(
        *keys,
        F.col("x").alias("xa"),
        F.col("y").alias("ya"),
        F.col("c").alias("ca"),
    )
    b = cells.select(
        *keys,
        F.col("x").alias("xb"),
        F.col("y").alias("yb"),
        F.col("c").alias("cb"),
    )
    pairs = (a.join(b, keys) if keys else a.crossJoin(b)).where(
        F.col("xb") > F.col("xa")
    )
    prod = (
        F.col("ca").cast("decimal(19,0)")
        * F.col("cb").cast("decimal(19,0)")
    )
    pair_agg = pairs.groupBy(*keys).agg(
        F.sum(F.when(F.col("yb") > F.col("ya"), prod)).alias("conc_d"),
        F.sum(F.when(F.col("yb") < F.col("ya"), prod)).alias("disc_d"),
    )
    tie = F.col("t").cast("decimal(19,0)")

    def margins(col):
        return (
            cells.groupBy(*keys, col)
            .agg(F.sum("c").cast("bigint").alias("t"))
            .groupBy(*keys)
            .agg(
                F.sum("t").cast("bigint").alias("n"),
                F.sum(tie * (tie - 1)).alias("tie2"),
            )
        )
    mx = margins("x").select(
        *keys, "n", F.col("tie2").alias("tie2_x")
    )
    my = margins("y").select(
        *keys, F.col("tie2").alias("tie2_y")
    )
    j = mx.join(my, keys) if keys else mx.crossJoin(my)
    j = (
        j.join(pair_agg, keys, "left")
        if keys
        else j.crossJoin(pair_agg)
    )
    nd = F.col("n").cast("decimal(19,0)")
    pairs2 = nd * (nd - 1)
    conc = F.coalesce(F.col("conc_d"), F.lit(0).cast("decimal(38,0)"))
    disc = F.coalesce(F.col("disc_d"), F.lit(0).cast("decimal(38,0)"))
    aa = (pairs2 - F.col("tie2_x")).cast("double")
    bb = (pairs2 - F.col("tie2_y")).cast("double")
    tau = F.when(
        (aa > F.lit(0.0)) & (bb > F.lit(0.0)),
        F.lit(2.0)
        * (conc - disc).cast("double")
        / F.sqrt(aa * bb),
    )
    return j.select(
        *keys,
        "n",
        conc.cast("bigint").alias("n_conc"),
        disc.cast("bigint").alias("n_disc"),
        pairs2.cast("bigint").alias("pairs2"),
        F.col("tie2_x").cast("bigint").alias("tie2_x"),
        F.col("tie2_y").cast("bigint").alias("tie2_y"),
        tau.alias("tau"),
    )


def spearman_rho(
    df: DataFrame,
    x_col: str,
    y_col: str,
    by: tuple = (),
) -> DataFrame:
    """Spearman ρ rank correlation per stratum — Pearson over average
    ranks, the monotone-association readout that tolerates ties and
    outliers. Complement to :func:`kendall_tau` (ρ weights by rank
    distance; τ counts inversions).

    Returns (*by, n, rho). Exactness: doubled average ranks
    ``2r = 2p + t + 1`` are exact integers from the marginal grid
    walks; the five moment sums (Σc·2rx, Σc·2ry, Σc·2rx·2ry,
    Σc·(2rx)², Σc·(2ry)²) accumulate as DECIMAL(38,0) — exact at any
    corpus size — and the textbook
    ``rho = (n·Sxy − Sx·Sy) / sqrt((n·Sxx − Sx²)·(n·Syy − Sy²))``
    is evaluated in doubles AFTER each exact decimal sum is cast once
    (both engines round the identical exact integer, then run the
    identical IEEE expression). Zero variance on either side → NULL.

    100 TB shape: same contract as :func:`kendall_tau` — bucket the
    inputs; everything runs at (stratum, cell) grain with two marginal
    window walks, one join-back, one final groupBy."""
    keys = list(by)
    cells = df.where(
        F.col(x_col).isNotNull() & F.col(y_col).isNotNull()
    ).groupBy(
        *keys,
        F.col(x_col).alias("x"),
        F.col(y_col).alias("y"),
    ).agg(F.count(F.lit(1)).cast("bigint").alias("c"))

    def _rank_grid(col, rank_name):
        g = cells.groupBy(*keys, col).agg(
            F.sum("c").cast("bigint").alias("t")
        )
        w = (
            Window.partitionBy(*keys)
            .orderBy(col)
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        return g.select(
            *keys,
            col,
            (
                F.lit(2) * (F.sum("t").over(w) - F.col("t"))
                + F.col("t")
                + F.lit(1)
            ).cast("bigint").alias(rank_name),
        )

    gx = _rank_grid("x", "rx2")
    gy = _rank_grid("y", "ry2")
    joined = cells.join(gx, [*keys, "x"]).join(gy, [*keys, "y"])

    def d19(c):
        return F.col(c).cast("decimal(19,0)")

    agg = joined.groupBy(*keys).agg(
        F.sum("c").cast("bigint").alias("n"),
        F.sum(d19("c") * d19("rx2")).alias("sx"),
        F.sum(d19("c") * d19("ry2")).alias("sy"),
        F.sum(
            (d19("c") * d19("rx2")).cast("decimal(38,0)")
            * d19("ry2")
        ).alias("sxy"),
        F.sum(
            (d19("c") * d19("rx2")).cast("decimal(38,0)")
            * d19("rx2")
        ).alias("sxx"),
        F.sum(
            (d19("c") * d19("ry2")).cast("decimal(38,0)")
            * d19("ry2")
        ).alias("syy"),
    )
    nd = F.col("n").cast("double")
    num = nd * F.col("sxy").cast("double") - F.col("sx").cast(
        "double"
    ) * F.col("sy").cast("double")
    denx = nd * F.col("sxx").cast("double") - F.col("sx").cast(
        "double"
    ) * F.col("sx").cast("double")
    deny = nd * F.col("syy").cast("double") - F.col("sy").cast(
        "double"
    ) * F.col("sy").cast("double")
    rho = F.when(
        (denx > F.lit(0.0)) & (deny > F.lit(0.0)),
        num / F.sqrt(denx * deny),
    )
    return agg.select(*keys, "n", rho.alias("rho"))


#: Benford expected first-digit shares log10(1 + 1/d), rendered ONCE
#: in Python (17 significant digits — shortest-roundtrip exact for
#: both engines' double parse) so neither engine's log10 is trusted.
BENFORD_P = {d: float(f"{math.log10(1 + 1 / d):.17g}")
             for d in range(1, 10)}

#: χ² 0.95 quantile at 8 degrees of freedom (9 digits − 1).
CHI2_CRIT_8DF = 15.50731305586545


def benford_first_digit(
    df: DataFrame,
    value_col: str,
    by: tuple = (),
    chi2_crit: float = CHI2_CRIT_8DF,
) -> DataFrame:
    """Benford first-significant-digit audit per stratum — the
    standard fabricated-numbers screen (engagement counts, traffic
    numbers, invoice-style metadata): observed leading-digit counts of
    positive integer `value_col` values vs Benford's log10(1+1/d),
    with Pearson's χ² and a χ² > crit verdict (df = 8).

    Returns NINE rows per stratum: (*by, digit, n_obs, n_total,
    share, p_benford, chi2_term, chi2, biased) — zero-count digits
    appear (their χ² term is N·p, not 0). Exactness: counts exact
    BIGINTs; the leading digit is string-derived (no float log);
    p_benford are shared 17-digit literals; each χ² term
    (o − N·p)²/(N·p) is 9dp-quantized then DECIMAL-summed. n_total=0
    → share/chi2 NULL, biased false.

    100 TB shape: one map-side-combinable groupBy to (stratum, digit)
    grain (≤ 9 live digits); the 1..9 spine join and χ² assembly run
    at that grain."""
    keys = list(by)
    vals = df.where(
        F.col(value_col).isNotNull() & (F.col(value_col) >= 1)
    ).select(
        *keys,
        F.substring(
            F.col(value_col).cast("bigint").cast("string"), 1, 1
        ).cast("int").alias("digit"),
    )
    obs = vals.groupBy(*keys, "digit").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_obs")
    )
    strata = (
        obs.groupBy(*keys).agg(
            F.sum("n_obs").cast("bigint").alias("n_total")
        )
        if keys
        else obs.agg(F.sum("n_obs").cast("bigint").alias("n_total"))
    )
    spine = strata.select(
        *keys,
        "n_total",
        F.explode(
            F.array(*[F.lit(d) for d in range(1, 10)])
        ).alias("digit"),
    )
    filled = spine.join(obs, [*keys, "digit"], "left").select(
        *keys,
        "digit",
        F.coalesce("n_obs", F.lit(0)).cast("bigint").alias("n_obs"),
        "n_total",
    )
    p_lit = F.element_at(
        F.array(*[F.lit(BENFORD_P[d]) for d in range(1, 10)]),
        F.col("digit"),
    )
    nt = F.col("n_total").cast("double")
    expected = nt * p_lit
    dev = F.col("n_obs").cast("double") - expected
    # dev*dev, not pow(dev, 2): pow is not guaranteed correctly
    # rounded and can differ between engines in the last ulp
    term = F.round(dev * dev / expected, 9)
    w_all = Window.partitionBy(*keys) if keys else Window.partitionBy()
    scored = filled.select(
        *keys,
        "digit",
        "n_obs",
        "n_total",
        F.when(
            F.col("n_total") > 0, F.col("n_obs").cast("double") / nt
        ).alias("share"),
        p_lit.alias("p_benford"),
        F.when(F.col("n_total") > 0, term).alias("chi2_term"),
    )
    chi2 = F.sum(
        F.col("chi2_term").cast("decimal(28,9)")
    ).over(w_all).cast("double")
    return scored.select(
        *keys,
        "digit",
        "n_obs",
        "n_total",
        "share",
        "p_benford",
        "chi2_term",
        chi2.alias("chi2"),
        F.coalesce(chi2 > F.lit(float(chi2_crit)), F.lit(False))
        .alias("biased"),
    )


def chi2_independence(
    df: DataFrame,
    x_col: str,
    y_col: str,
    by: tuple = (),
) -> DataFrame:
    """Pearson χ² test of independence between two categorical
    columns per stratum — 'is the quality-gate verdict independent of
    the source?' The association audit for any pair of low-cardinality
    labels (lang × source, gate × template, flag × status).

    Returns (*by, n, r_levels, c_levels, dof, chi2, cramers_v).
    Exactness: the corpus collapses to the (x, y) contingency grid
    with exact BIGINT counts; the FULL r×c grid is materialized
    (observed-zero cells contribute their expected count, as the
    statistic requires); each term (o − e)²/e with
    e = (row·col)/n — exact BIGINT margin product, one IEEE division —
    is 9dp-quantized then DECIMAL-summed, so the sum is
    order-independent across engines. Cramér's V =
    sqrt(χ² / (n·min(r−1, c−1))) is one IEEE chain on top; dof = 0
    (a single-level side) → chi2 0.0, cramers_v NULL.

    100 TB shape: one map-side-combinable groupBy to cell grain; the
    margin spine join is r×c-bounded. REQUIRES low-cardinality
    categoricals — bucket first if needed."""
    keys = list(by)
    cells = df.where(
        F.col(x_col).isNotNull() & F.col(y_col).isNotNull()
    ).groupBy(
        *keys,
        F.col(x_col).alias("x"),
        F.col(y_col).alias("y"),
    ).agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    rows = cells.groupBy(*keys, "x").agg(
        F.sum("c").cast("bigint").alias("row_t")
    )
    cols = cells.groupBy(*keys, "y").agg(
        F.sum("c").cast("bigint").alias("col_t")
    )
    spine = rows.join(cols, keys) if keys else rows.crossJoin(cols)
    filled = spine.join(cells, [*keys, "x", "y"], "left").select(
        *keys,
        "x",
        "y",
        "row_t",
        "col_t",
        F.coalesce("c", F.lit(0)).cast("bigint").alias("o"),
    )
    w_all = Window.partitionBy(*keys) if keys else Window.partitionBy()
    n = F.sum("o").over(w_all).cast("bigint")
    e = (
        F.col("row_t").cast("double")
        * F.col("col_t").cast("double")
        / n.cast("double")
    )
    dev = F.col("o").cast("double") - e
    # dev*dev, not pow: pow is not correctly-rounded cross-engine
    term = F.round(dev * dev / e, 9)
    scored = filled.select(
        *keys,
        n.alias("n"),
        F.size(F.collect_set("x").over(w_all)).cast("bigint")
        .alias("r_levels"),
        F.size(F.collect_set("y").over(w_all)).cast("bigint")
        .alias("c_levels"),
        term.alias("term"),
    )
    agg = scored.groupBy(*keys, "n", "r_levels", "c_levels").agg(
        F.sum(F.col("term").cast("decimal(28,9)"))
        .cast("double").alias("chi2"),
    )
    dof = (
        (F.col("r_levels") - 1) * (F.col("c_levels") - 1)
    ).cast("bigint")
    mindim = F.least(
        F.col("r_levels") - 1, F.col("c_levels") - 1
    ).cast("double")
    v = F.when(
        dof > 0,
        F.sqrt(
            F.col("chi2") / (F.col("n").cast("double") * mindim)
        ),
    )
    return agg.select(
        *keys,
        "n",
        "r_levels",
        "c_levels",
        dof.alias("dof"),
        "chi2",
        v.alias("cramers_v"),
    )


def psi_drift(
    df: DataFrame,
    group_col: str,
    bucket_col: str,
    a_label,
    b_label,
    by: tuple = (),
    psi_crit: float = 0.25,
) -> DataFrame:
    """Population Stability Index between two snapshots over a
    bucketed signal per stratum — the scorecard-monitoring drift
    readout (PSI < 0.1 stable, 0.1–0.25 minor, > 0.25 major shift).

    Returns (*by, n_a, n_b, n_buckets, psi, drifted). Exactness:
    bucket counts are exact BIGINTs over the union bucket spine (a
    bucket seen in either snapshot appears in both terms); shares are
    Laplace-smoothed — p = (c + 0.5) / (n + 0.5·k) with k the spine
    size — so one-sided buckets stay finite without an arbitrary
    epsilon; each (pₐ − p_b)·ln(pₐ/p_b) term (provably ≥ 0) is
    9dp-quantized then DECIMAL-summed. Either snapshot empty → psi
    NULL, drifted false.

    100 TB shape: one map-side-combinable groupBy to (stratum,
    bucket, snapshot) grain; everything after runs on the bucket
    spine. REQUIRES a bucketed signal (deciles, integer bins)."""
    keys = list(by)
    tagged = df.where(
        F.col(group_col).isin([a_label, b_label])
        & F.col(bucket_col).isNotNull()
    ).select(
        *keys,
        F.col(bucket_col).alias("b"),
        (F.col(group_col) == F.lit(a_label)).alias("is_a"),
    )
    grid = tagged.groupBy(*keys, "b").agg(
        F.sum(F.col("is_a").cast("bigint")).cast("bigint").alias("ca"),
        F.sum((~F.col("is_a")).cast("bigint")).cast("bigint")
        .alias("cb"),
    )
    w_all = Window.partitionBy(*keys) if keys else Window.partitionBy()
    n_a = F.sum("ca").over(w_all).cast("bigint")
    n_b = F.sum("cb").over(w_all).cast("bigint")
    k = F.count(F.lit(1)).over(w_all).cast("bigint")
    p_a = (F.col("ca").cast("double") + F.lit(0.5)) / (
        n_a.cast("double") + F.lit(0.5) * k.cast("double")
    )
    p_b = (F.col("cb").cast("double") + F.lit(0.5)) / (
        n_b.cast("double") + F.lit(0.5) * k.cast("double")
    )
    term = F.round((p_a - p_b) * F.log(p_a / p_b), 9)
    scored = grid.select(
        *keys,
        n_a.alias("n_a"),
        n_b.alias("n_b"),
        k.alias("n_buckets"),
        F.when((n_a > 0) & (n_b > 0), term).alias("term"),
    )
    agg = scored.groupBy(*keys, "n_a", "n_b", "n_buckets").agg(
        F.sum(F.col("term").cast("decimal(28,9)"))
        .cast("double").alias("psi_raw"),
    )
    psi = F.when(
        (F.col("n_a") > 0) & (F.col("n_b") > 0), F.col("psi_raw")
    )
    return agg.select(
        *keys,
        "n_a",
        "n_b",
        "n_buckets",
        psi.alias("psi"),
        F.coalesce(psi > F.lit(float(psi_crit)), F.lit(False))
        .alias("drifted"),
    )


def cusum_changepoint(
    df: DataFrame,
    period_col: str,
    value_col: str,
    by: tuple = (),
    min_abs_delta: float = 0.0,
) -> DataFrame:
    """Offline CUSUM single mean-shift localization over a per-period
    series per stratum — WHERE did the daily volume/quality series
    jump? (Mann-Kendall answers 'is there a monotone trend'; this
    answers 'at which period did the level shift'.) Input must
    already be at (stratum, period) grain, like
    :func:`mann_kendall_trend`. Values may be fractional (rates,
    scores): they are 6dp-quantized into exact DECIMAL, never
    silently truncated.

    Returns (*by, n_periods, total, cp_period, t_before, s_abs_max,
    cusum_stat, mean_before, mean_after, delta, shifted). The
    changepoint is argmax_t |S'_t| with S'_t = n·Σ_{i≤t}x − t·Σx
    (the n-scaled centered cumulative sum), earliest period on ties;
    the last period has S'_n = 0 so it never wins unless the series
    is constant. Exactness: x is round(·,6) → DECIMAL(18,6); the
    cumulative and total sums are exact DECIMAL window sums
    (order-free — no float window accumulation crosses the engine
    boundary), n/t enter as DECIMAL(12,0) so every n·cum − t·tot is
    exact DECIMAL(38,6); cp selection compares those exact decimals;
    total and s_abs_max are cast to double only at output;
    cusum_stat / means / delta are one IEEE division or subtraction
    each. Constant series (s_abs_max = 0) → cp and the means NULL,
    shifted false; empty stratum → no row (even ungrouped).

    100 TB shape: the caller pre-aggregates to period grain (one
    map-side-combinable groupBy); the scan is one stratum-partitioned
    window walk over periods, one groupBy to pick the argmax.
    Bounds: |x| < 10^12 and n_periods < 10^12 keep every product
    inside DECIMAL(38,6)."""
    keys = list(by)
    s = df.where(
        F.col(period_col).isNotNull() & F.col(value_col).isNotNull()
    ).select(
        *keys,
        F.col(period_col).alias("p"),
        F.round(F.col(value_col).cast("double"), 6)
        .cast("decimal(18,6)").alias("x"),
    )
    w_ord = (
        Window.partitionBy(*keys)
        .orderBy("p")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_seq = Window.partitionBy(*keys).orderBy("p")
    w_all = Window.partitionBy(*keys) if keys else Window.partitionBy()
    walked = s.select(
        *keys,
        "p",
        F.row_number().over(w_seq).cast("decimal(12,0)")
        .alias("t_idx"),
        F.sum("x").over(w_ord).cast("decimal(24,6)").alias("cum"),
        F.count(F.lit(1)).over(w_all).cast("decimal(12,0)").alias("n"),
        F.sum("x").over(w_all).cast("decimal(24,6)").alias("tot"),
    )
    s_scaled = (
        F.col("n") * F.col("cum") - F.col("t_idx") * F.col("tot")
    ).cast("decimal(38,6)")
    scored = walked.select(
        *keys,
        "p",
        "t_idx",
        "cum",
        "n",
        "tot",
        F.abs(s_scaled).alias("abs_s"),
    )
    max_abs = F.max("abs_s").over(w_all)
    cand = scored.select(
        *keys,
        "n",
        "tot",
        "abs_s",
        F.when(
            F.col("abs_s") == max_abs,
            F.struct("p", "t_idx", "cum"),
        ).alias("cp"),
    )
    agg = cand.groupBy(*keys).agg(
        F.max("n").alias("n_periods_d"),
        F.max("tot").alias("total_d"),
        F.max("abs_s").alias("s_abs_max_d"),
        F.min("cp").alias("cp"),
    ).where(F.col("n_periods_d").isNotNull())
    found = F.col("s_abs_max_d") > 0
    tb = F.col("cp.t_idx").cast("double")
    cum = F.col("cp.cum").cast("double")
    nd = F.col("n_periods_d").cast("double")
    totd = F.col("total_d").cast("double")
    mean_before = F.when(found, cum / tb)
    mean_after = F.when(
        found, (totd - cum) / (nd - tb)
    )
    delta = mean_after - mean_before
    return agg.select(
        *keys,
        F.col("n_periods_d").cast("bigint").alias("n_periods"),
        totd.alias("total"),
        F.when(found, F.col("cp.p")).alias("cp_period"),
        F.when(found, F.col("cp.t_idx").cast("bigint"))
        .alias("t_before"),
        F.col("s_abs_max_d").cast("double").alias("s_abs_max"),
        (F.col("s_abs_max_d").cast("double") / nd).alias("cusum_stat"),
        mean_before.alias("mean_before"),
        mean_after.alias("mean_after"),
        delta.alias("delta"),
        F.coalesce(
            F.abs(delta) > F.lit(float(min_abs_delta)), F.lit(False)
        ).alias("shifted"),
    )

"""traffic — request-log bot detection for crawl/serving hygiene.

A web-scale corpus pipeline sits downstream of request logs twice: its
OWN crawler must not be fooled by bot-generated engagement signals, and
click/view streams used for quality priors must be scrubbed of
automation first. The two cheapest high-precision signals, both pure
integer arithmetic over per-user inter-arrival times:

1. **Metronome cadence** — scripted clients fire on a timer; a user
   with ≥ N events and exactly ONE distinct inter-arrival gap is a
   machine (humans never tick).
2. **Burst rate** — more events inside one 60-second window than a
   human can produce.

100 TB shape: one shuffle on the user key carries everything — the two
lag/window passes and the final per-user aggregate all ride the SAME
(user, time) sort, so Spark plans ONE Exchange + ONE Sort; the burst
count is a RANGE frame (peers included by value, not row order — ties
are deterministic in both engines). Timestamps convert to epoch
seconds ONCE via the NTZ-anchored timestampdiff (the tz-proof
discipline every timestamp query in this repo uses) and every
downstream comparison is BIGINT.

Reference lineage: the reference's profiler aggregates per-step
latencies to flag outlier stages (reference:
deploy/py_infer/src/framework/module_base.py send/recv timing); this
is the same cadence-statistics shape applied to request streams.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def epoch_sec(ts_col: str = "ts"):
    """Seconds since epoch for a TIMESTAMP_NTZ column, independent of
    the session timezone: whole seconds since a zero-microsecond
    anchor, where elapsed-unit (Spark timestampdiff) and
    boundary-crossing (DuckDB date_diff) semantics coincide. Plain
    casts are tz-sensitive and NTZ→long is disallowed in Spark 4.
    The SINGLE source of truth for the idiom — the driver contract
    (__spark_entry__._epoch_sec) delegates here."""
    return F.expr(
        "timestampdiff(SECOND,"
        f" TIMESTAMP_NTZ'1970-01-01 00:00:00', {ts_col})"
    )


def bot_session_stats(
    events: DataFrame,
    min_metronome_events: int = 20,
    burst_events_60s: int = 30,
) -> DataFrame:
    """Per-user traffic-cadence statistics + bot verdicts.

    Returns (user_id, n_events, span_s, min_gap_s, max_gap_s,
    n_distinct_gaps, max_burst_60s, is_metronome, is_burst, is_bot).
    Gap columns are NULL for single-event users (undefined, not 0 —
    the failure-flow NULL discipline); verdicts are total booleans.
    Events are ordered by (ts, event_id) so identical timestamps break
    ties identically in both engines."""
    if min_metronome_events < 2 or burst_events_60s < 2:
        raise ValueError(
            "thresholds must be ≥ 2, got "
            f"{min_metronome_events}/{burst_events_60s}"
        )
    es = events.select(
        "user_id",
        "event_id",
        epoch_sec("ts").cast("bigint").alias("es"),
    )
    w_seq = Window.partitionBy("user_id").orderBy("es", "event_id")
    w_burst = (
        Window.partitionBy("user_id").orderBy("es").rangeBetween(-59, 0)
    )
    g = es.select(
        "user_id",
        "es",
        (F.col("es") - F.lag("es").over(w_seq)).alias("gap_s"),
        F.count(F.lit(1)).over(w_burst).alias("burst"),
    )
    agg = g.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_events"),
        (F.max("es") - F.min("es")).cast("bigint").alias("span_s"),
        F.min("gap_s").cast("bigint").alias("min_gap_s"),
        F.max("gap_s").cast("bigint").alias("max_gap_s"),
        F.count_distinct("gap_s").cast("bigint").alias("n_distinct_gaps"),
        F.max("burst").cast("bigint").alias("max_burst_60s"),
    )
    is_metro = (F.col("n_events") >= min_metronome_events) & (
        F.col("n_distinct_gaps") == 1
    )
    is_burst = F.col("max_burst_60s") >= burst_events_60s
    return agg.select(
        "user_id",
        "n_events",
        "span_s",
        "min_gap_s",
        "max_gap_s",
        "n_distinct_gaps",
        "max_burst_60s",
        is_metro.alias("is_metronome"),
        is_burst.alias("is_burst"),
        (is_metro | is_burst).alias("is_bot"),
    )


def mad_outlier_stats(
    events: DataFrame,
    k: int = 5,
    value_col: str = "value",
    group_col: str = "event_type",
) -> DataFrame:
    """Median/MAD robust outlier scrubbing per group — the
    contamination-resistant alternative to mean/stddev gating (a bot
    pumping 10^4× values MOVES a mean gate's own threshold; the median
    and MAD barely notice, which is exactly why robust statistics are
    the right fence for adversarial value streams).

    Returns (event_type, n_events, med_value, mad_value, n_outliers)
    where an outlier is |v − median| > k·MAD.

    Cross-engine exactness: values quantize to integer CENTS first
    (round half-away, identical both engines), so the median is
    .5-quantized, absolute deviations are .5-quantized doubles, and
    the MAD is .25-quantized — every number in the chain is a dyadic
    rational far inside 2^53, making the whole computation bit-exact
    in IEEE regardless of interpolation-formula ulp differences.

    100 TB shape: two shuffles on the group key (median, then MAD —
    irreducible for exact MAD), deviation relation persisted (it feeds
    the MAD aggregate AND the final flag pass). Exact `percentile`
    buffers each group on its reducer: at 10^12-row groups swap in
    `approx_percentile` (t-digest, map-side combinable) — one function
    name, same schema (the length_quantiles discipline)."""
    from mindocr_spark.cache import tracked_persist

    if k < 1:
        raise ValueError(f"k must be ≥ 1, got {k}")
    cents = F.round(F.col(value_col) * F.lit(100.0), 0).cast("bigint")
    # base feeds the median aggregate AND the deviation join
    base = tracked_persist(
        events.select(
            F.col(group_col).alias("grp"), cents.alias("c")
        ).where(F.col("c").isNotNull())
    )
    med = base.groupBy("grp").agg(
        F.percentile("c", F.lit(0.5)).alias("med_c")
    )
    dev = tracked_persist(
        base.join(med, "grp").select(
            "grp",
            "med_c",
            F.abs(F.col("c").cast("double") - F.col("med_c")).alias(
                "adev"
            ),
        )
    )
    mad = dev.groupBy("grp").agg(
        F.percentile("adev", F.lit(0.5)).alias("mad_c")
    )
    return (
        dev.join(mad, "grp")
        .groupBy("grp")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_events"),
            (F.min("med_c") / F.lit(100.0)).alias("med_value"),
            (F.min("mad_c") / F.lit(100.0)).alias("mad_value"),
            F.sum(
                (
                    F.col("adev")
                    > F.lit(float(k)) * F.col("mad_c")
                ).cast("bigint")
            ).cast("bigint").alias("n_outliers"),
        )
        .select(
            F.col("grp").alias(group_col),
            "n_events",
            "med_value",
            "mad_value",
            "n_outliers",
        )
    )


def event_transitions(events: DataFrame) -> DataFrame:
    """First-order Markov transition matrix of event types over
    per-user streams — the behavioral fingerprint recommendation and
    anomaly systems consume (bots have degenerate rows: one outgoing
    transition at p≈1.0; organic users spread mass). Returns
    (prev_type, event_type, n, p) where p is the row-normalized
    transition probability.

    100 TB shape: one shuffle on the user key for the (ts, event_id)
    lag, one map-side-combinable groupBy on the (prev, cur) pair key
    (event-type² cardinality), and the row normalizer is a window on
    the prev key at that same tiny grain — referenced once (the
    hits_scores plan-growth lesson). p = n/row_total is one IEEE
    division, round 6."""
    w = Window.partitionBy("user_id").orderBy("es", "event_id")
    seq = events.select(
        "user_id",
        "event_id",
        "event_type",
        epoch_sec("ts").cast("bigint").alias("es"),
    ).select(
        F.col("event_type"),
        F.lag("event_type").over(w).alias("prev_type"),
    )
    counts = (
        seq.where(F.col("prev_type").isNotNull())
        .groupBy("prev_type", "event_type")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    )
    w_row = Window.partitionBy("prev_type")
    return counts.select(
        "prev_type",
        "event_type",
        "n",
        F.round(
            F.col("n").cast("double")
            / F.sum("n").over(w_row).cast("double"),
            6,
        ).alias("p"),
    )


def retention_cohorts(events: DataFrame) -> DataFrame:
    """Classic cohort-retention matrix: users grouped by FIRST-seen
    day, each cohort's later activity expressed as a fraction of its
    size — the standard product/crawl-freshness table (for a crawler:
    how much of a discovery cohort is still being revisited N days
    on). Returns (cohort_day_n, day_offset, n_active, cohort_size,
    retention) with day numbers as integer days-since-epoch (tz-proof;
    no DATE objects cross the engine boundary).

    100 TB shape: distinct (user, day) first (one map-side-combinable
    collapse), the first-seen day is a min over the same user key
    (exchange reuse), offsets are row-local, and the matrix is ONE
    groupBy at cohort×offset cardinality; cohort_size rides a window
    on the cohort key at that same tiny grain."""
    day_n = F.datediff(F.to_date("ts"), F.lit("1970-01-01").cast("date"))
    ud = events.select(
        "user_id", day_n.cast("bigint").alias("day_n")
    ).distinct()
    w_first = Window.partitionBy("user_id")
    tagged = ud.select(
        "user_id",
        "day_n",
        F.min("day_n").over(w_first).alias("cohort_day_n"),
    )
    mat = tagged.groupBy(
        "cohort_day_n",
        (F.col("day_n") - F.col("cohort_day_n")).alias("day_offset"),
    ).agg(F.count_distinct("user_id").cast("bigint").alias("n_active"))
    w_cohort = Window.partitionBy("cohort_day_n")
    size = F.max(
        F.when(F.col("day_offset") == 0, F.col("n_active"))
    ).over(w_cohort)
    return mat.select(
        "cohort_day_n",
        "day_offset",
        "n_active",
        size.cast("bigint").alias("cohort_size"),
        F.round(
            F.col("n_active").cast("double") / size.cast("double"), 6
        ).alias("retention"),
    )


def _daily_count_spine(events: DataFrame) -> DataFrame:
    """Shared (event_type, day_n, n) day-grain relation with the
    ZERO-FILLED day spine: days with no events inside a type's
    observed [min, max] span appear as n=0 rows, so a total outage
    is a real row, not a structurally invisible gap (the invariant
    both anomaly fences depend on — keep it in ONE place). The
    counted relation is persisted (it feeds the spine bounds AND the
    fill join); the spine lives at types×days cardinality."""
    from mindocr_spark.cache import tracked_persist

    day_n = F.datediff(F.to_date("ts"), F.lit("1970-01-01").cast("date"))
    counted = tracked_persist(
        events.select(
            "event_type", day_n.cast("bigint").alias("day_n")
        )
        .groupBy("event_type", "day_n")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    )
    spine = counted.groupBy("event_type").agg(
        F.min("day_n").alias("d0"), F.max("day_n").alias("d1")
    ).select(
        "event_type",
        F.explode(F.sequence("d0", "d1")).alias("day_n"),
    )
    return spine.join(counted, ["event_type", "day_n"], "left").select(
        "event_type",
        "day_n",
        F.coalesce("n", F.lit(0)).cast("bigint").alias("n"),
    )


def daily_anomaly_stats(events: DataFrame, k: int = 6) -> DataFrame:
    """Robust day-grain traffic anomaly detection per event type:
    daily counts fenced by the median/MAD rule (|n − med| > k·MAD) —
    the flash-crowd / outage / bot-wave monitor whose thresholds the
    anomaly itself cannot drag (the mad_outlier_stats argument, at the
    time-series grain). Returns (event_type, day_n, n, med_n, mad_n,
    is_anomaly); med/MAD are exact interpolated percentiles over
    INTEGER daily counts (bit-identical cross-engine), .5/.25-quantized
    dyadics.

    Days with ZERO events inside a type's observed [min, max] day span
    are filled in as n=0 rows before the fence is computed — a total
    outage produces no groupBy row at all, and without the spine fill
    the one anomaly an outage monitor exists for would be structurally
    invisible. The spine lives at types×days cardinality (a per-type
    ``sequence`` explode), so the fill is free at any corpus size.

    100 TB shape: one (type, day) count groupBy collapses the stream;
    everything after lives at types×days cardinality."""
    from mindocr_spark.cache import tracked_persist

    if k < 1:
        raise ValueError(f"k must be ≥ 1, got {k}")
    daily = _daily_count_spine(events)
    med = daily.groupBy("event_type").agg(
        F.percentile("n", F.lit(0.5)).alias("med_n")
    )
    dev = tracked_persist(
        daily.join(med, "event_type").select(
            "event_type",
            "day_n",
            "n",
            "med_n",
            F.abs(F.col("n").cast("double") - F.col("med_n")).alias(
                "adev"
            ),
        )
    )
    mad = dev.groupBy("event_type").agg(
        F.percentile("adev", F.lit(0.5)).alias("mad_n")
    )
    return dev.join(mad, "event_type").select(
        "event_type",
        "day_n",
        "n",
        "med_n",
        "mad_n",
        (F.col("adev") > F.lit(float(k)) * F.col("mad_n")).alias(
            "is_anomaly"
        ),
    )


def k_anonymity_stats(
    df: DataFrame,
    qi_cols: tuple,
    sensitive_col: str,
    k: int = 5,
    l_div: int = 2,
) -> DataFrame:
    """K-anonymity + l-diversity release audit (Sweeney 2002 /
    Machanavajjhala 2007) — the pre-publication gate on any derived
    dataset: group rows into equivalence classes on the quasi-
    identifier columns (the attributes an attacker can link from
    outside) and measure (a) how many rows sit in classes smaller
    than k (re-identifiable by class size alone) and (b) how many
    classes carry fewer than l distinct sensitive values (identifiable
    BY the sensitive attribute even when the class is big — the
    homogeneity attack k-anonymity misses). NULL quasi-identifier
    values form real classes (NULL is linkable too).

    Returns ONE row:
    (n_rows, n_classes, min_class_size, rows_below_k, share_below_k,
    classes_below_l, share_classes_below_l, k, l).

    Exactness: every count is an exact BIGINT; the two shares are
    single IEEE divisions of exact integers.

    100 TB shape: one groupBy on the QI key (count + count distinct
    sensitive in the same aggregate — one shuffle, map-side
    combinable), then a global single-row rollup over class-grain
    rows. The QI bucketing (generalization) happens row-local
    upstream — coarser buckets are the REMEDY when this audit fails,
    and they only change the projection, not this plan."""
    if k < 2 or l_div < 1:
        raise ValueError(f"need k >= 2 and l >= 1, got k={k}, l={l_div}")
    classes = df.groupBy(*[F.col(c) for c in qi_cols]).agg(
        F.count(F.lit(1)).cast("bigint").alias("sz"),
        F.countDistinct(sensitive_col).cast("bigint").alias("sdiv"),
    )
    out = classes.agg(
        F.sum("sz").cast("bigint").alias("n_rows"),
        F.count(F.lit(1)).cast("bigint").alias("n_classes"),
        F.min("sz").cast("bigint").alias("min_class_size"),
        F.sum(F.when(F.col("sz") < k, F.col("sz")).otherwise(F.lit(0)))
        .cast("bigint").alias("rows_below_k"),
        F.sum((F.col("sdiv") < l_div).cast("bigint"))
        .cast("bigint").alias("classes_below_l"),
    )
    return out.select(
        "n_rows",
        "n_classes",
        "min_class_size",
        "rows_below_k",
        (F.col("rows_below_k").cast("double") / F.col("n_rows").cast("double"))
        .alias("share_below_k"),
        "classes_below_l",
        (
            F.col("classes_below_l").cast("double")
            / F.col("n_classes").cast("double")
        ).alias("share_classes_below_l"),
        F.lit(k).cast("bigint").alias("k"),
        F.lit(l_div).cast("bigint").alias("l"),
    )


def ab_test_proportions(
    units: DataFrame,
    conversions: DataFrame,
    unit_col: str = "unit",
    variant_col: str = "variant",
    metric_col: str = "metric",
    variant_a: str = "A",
    variant_b: str = "B",
    z_crit: float = 1.96,
) -> DataFrame:
    """Two-proportion A/B readout per metric: conversion counts and
    rates for control (``variant_a``) and treatment (``variant_b``),
    the absolute lift, the pooled two-proportion z-statistic, and a
    |z| ≥ z_crit significance verdict — the experiment-analysis
    primitive behind 'did the new extraction config change user-facing
    behavior?'. Units assigned to BOTH variants are excluded
    (contaminated assignment — the standard SRM hygiene rule);
    conversions deduplicate at (unit, metric) grain (a unit converts
    once). z is NULL (and significant false) when a variant is empty
    or the pooled rate is degenerate (0 or 1 — zero variance).

    Exactness discipline: all counts exact BIGINTs; every rate ONE
    IEEE division of exact integers; z's formula is pinned
    (rb−ra) / sqrt(pooled·(1−pooled)·(1/n_a + 1/n_b)) — sqrt is
    IEEE-exact (correctly rounded by definition), so z is
    bit-identical cross-engine with NO quantization; degeneracy is
    gated on integer predicates so no division can hit a zero under
    ANSI.

    100 TB shape: assignment hygiene is one groupBy on the unit key;
    conversions collapse map-side at (unit, metric) then join
    assignments on the same co-partitioned unit key; everything after
    runs at metric×variant grain (tiny). The totals row is a 1-row
    cross join (broadcast)."""
    if variant_a == variant_b:
        raise ValueError("variant_a and variant_b must differ")
    if z_crit <= 0:
        raise ValueError("z_crit must be positive")
    assign = (
        units.where(F.col(variant_col).isin(variant_a, variant_b))
        .where(F.col(unit_col).isNotNull())
        .select(
            F.col(unit_col).alias("unit"), F.col(variant_col).alias("v")
        )
        .distinct()
        .groupBy("unit")
        .agg(F.count(F.lit(1)).alias("_nv"), F.min("v").alias("v"))
        .where(F.col("_nv") == 1)
        .select("unit", "v")
    )
    totals = assign.agg(
        F.coalesce(
            F.sum(F.when(F.col("v") == variant_a, 1)), F.lit(0)
        ).cast("bigint").alias("n_a"),
        F.coalesce(
            F.sum(F.when(F.col("v") == variant_b, 1)), F.lit(0)
        ).cast("bigint").alias("n_b"),
    )
    conv = (
        conversions.where(
            F.col(unit_col).isNotNull() & F.col(metric_col).isNotNull()
        )
        .select(
            F.col(unit_col).alias("unit"),
            F.col(metric_col).alias("metric"),
        )
        .distinct()
        .join(assign, "unit")
        .groupBy("metric")
        .agg(
            F.sum(F.when(F.col("v") == variant_a, 1).otherwise(0))
            .cast("bigint")
            .alias("conv_a"),
            F.sum(F.when(F.col("v") == variant_b, 1).otherwise(0))
            .cast("bigint")
            .alias("conv_b"),
        )
    )
    s = conv.crossJoin(totals)
    na = F.col("n_a").cast("double")
    nb = F.col("n_b").cast("double")
    ra = F.when(
        F.col("n_a") > 0, F.col("conv_a").cast("double") / na
    )
    rb = F.when(
        F.col("n_b") > 0, F.col("conv_b").cast("double") / nb
    )
    c_sum = F.col("conv_a") + F.col("conv_b")
    n_sum = F.col("n_a") + F.col("n_b")
    # integer-predicate gate: z exists iff both arms non-empty and the
    # pooled rate is strictly inside (0, 1) — no division under a zero
    zok = (
        (F.col("n_a") > 0)
        & (F.col("n_b") > 0)
        & (c_sum > 0)
        & (c_sum < n_sum)
    )
    pooled = c_sum.cast("double") / n_sum.cast("double")
    z = F.when(
        zok,
        (rb - ra)
        / F.sqrt(
            pooled
            * (F.lit(1.0) - pooled)
            * (F.lit(1.0) / na + F.lit(1.0) / nb)
        ),
    )
    return s.select(
        "metric",
        "n_a",
        "n_b",
        "conv_a",
        "conv_b",
        ra.alias("rate_a"),
        rb.alias("rate_b"),
        (rb - ra).alias("lift"),
        z.alias("z"),
        F.coalesce(
            F.abs(z) >= F.lit(float(z_crit)), F.lit(False)
        ).alias("significant"),
    )


def funnel_conversion(
    events: DataFrame,
    steps: list,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    by: tuple = (),
    window_s: int | None = None,
) -> DataFrame:
    """Ordered-funnel conversion analysis per stratum: of the users
    who performed steps[0], how many went on to perform steps[1]
    AFTER it, then steps[2] after that, ... (the classic
    signup→view→click→purchase readout). Greedy-earliest matching:
    t_1 = the user's first steps[0] event, t_k = the first steps[k]
    event strictly after t_{k-1}; with `window_s`, every later step
    must also land within window_s seconds of t_1 (the conversion
    window). A user's funnel depth is a pure function of their
    (type, ts) multiset — no partitioning or order dependence.

    Returns (*by, step_idx, step, n_users, conv_from_first,
    conv_from_prev) — long format, one row per step per stratum
    (zero-user steps included). Exactness: timestamps compare at
    exact MICROSECOND epoch integers (the NTZ-anchored timestampdiff
    idiom — see :func:`epoch_sec` — at microsecond grain, so
    strictly-after means true event order, and the window bound is
    an exact BIGINT comparison); n_users are exact BIGINTs;
    each conversion rate is ONE IEEE division (NULL when the
    denominator step had no users).

    100 TB shape: ONE Exchange on the (stratum, user) key carries
    the whole match — the K step times are K chained whole-partition
    window minima over that one partitioning (no join per step, no
    re-shuffle; Spark plans Window nodes back-to-back), the user
    collapse groups on the SAME key (no new Exchange), and only the
    stratum rollup reshuffles (stratum cardinality). Hot users
    (bot streams) buffer one partition like every per-user window in
    this module — cap with an upstream per-user event limit if the
    log is unscrubbed."""
    if len(steps) < 2:
        raise ValueError("funnel needs >= 2 steps")
    if len(set(steps)) != len(steps):
        raise ValueError("funnel steps must be distinct")
    keys = list(by)
    anchor = "TIMESTAMP_NTZ'1970-01-01 00:00:00'"
    ev_us = F.expr(
        f"timestampdiff(MICROSECOND, {anchor}, {ts_col})"
    ).cast("bigint")
    base = events.where(
        F.col(type_col).isin(list(steps))
        & F.col(ts_col).isNotNull()
        & F.col(user_col).isNotNull()
    ).select(
        *keys,
        F.col(user_col).alias("u"),
        F.col(type_col).alias("et"),
        ev_us.alias("ev_us"),
    )
    w = Window.partitionBy(*keys, "u")
    cur = base.withColumn(
        "t_1",
        F.min(F.when(F.col("et") == steps[0], F.col("ev_us"))).over(w),
    )
    for k in range(2, len(steps) + 1):
        cond = (F.col("et") == steps[k - 1]) & (
            F.col("ev_us") > F.col(f"t_{k - 1}")
        )
        if window_s is not None:
            cond = cond & (
                F.col("ev_us") - F.col("t_1")
                <= F.lit(int(window_s) * 1_000_000)
            )
        cur = cur.withColumn(
            f"t_{k}", F.min(F.when(cond, F.col("ev_us"))).over(w)
        )
    t_cols = [f"t_{k}" for k in range(1, len(steps) + 1)]
    users = cur.groupBy(*keys, "u").agg(
        *[F.max(c).alias(c) for c in t_cols]
    )
    wide = users.groupBy(*keys).agg(
        *[
            F.sum(F.col(c).isNotNull().cast("bigint"))
            .cast("bigint").alias(f"n_{k + 1}")
            for k, c in enumerate(t_cols)
        ]
    )
    n1 = F.col("n_1").cast("double")
    rows = []
    for i, s in enumerate(steps):
        nk = F.col(f"n_{i + 1}")
        prev = F.col(f"n_{i}") if i > 0 else nk
        rows.append(
            F.struct(
                F.lit(i + 1).cast("bigint").alias("step_idx"),
                F.lit(s).alias("step"),
                nk.alias("n_users"),
                F.when(F.col("n_1") > 0, nk.cast("double") / n1)
                .alias("conv_from_first"),
                F.when(prev > 0, nk.cast("double") / prev.cast("double"))
                .alias("conv_from_prev"),
            )
        )
    return wide.select(
        *keys, F.explode(F.array(*rows)).alias("f")
    ).select(*keys, "f.*")


def km_survival(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    by: tuple = (),
    censor_gap_days: int = 7,
) -> DataFrame:
    """Kaplan-Meier retention/survival curve per stratum over user
    activity lifetimes — the right-censoring-correct answer to "how
    long do users stay active?" (naive retention curves understate
    the tail because still-active users haven't churned YET). A
    user's lifetime is last_day − first_day; users whose last
    activity lands within `censor_gap_days` of the stratum's
    observation end are right-CENSORED (they may still be active),
    everyone else churned at their lifetime. S(t) =
    Π_{s ≤ t, d_s > 0} (1 − d_s/n_s) with n_s the at-risk count
    (lifetime ≥ s, churned or censored — the standard convention
    that censoring at s happens after s's events).

    Returns (*by, t, n_at_risk, d_churned, n_censored, survival) —
    one row per distinct lifetime. Exactness: day numbers, lifetime
    grid, d/c/n_at_risk all exact BIGINTs (datediff + reverse
    cumulative sum); each ln(1 − d/n) factor is 9dp-quantized then
    DECIMAL-summed along the ordered walk (order-free across
    engines), survival = exp of that sum re-quantized at 9dp (the
    ln idiom's transcendental pair); a time where d = n drives
    survival to EXACT 0.0 from there on (no ln(0) enters the sum).

    100 TB shape: one map-side-combinable groupBy to (stratum,
    user) grain, then everything runs on the lifetime GRID (≤ span
    days per stratum) — two window walks and a groupBy at grid
    cardinality."""
    keys = list(by)
    day = F.datediff(
        F.to_date(ts_col), F.lit("1970-01-01").cast("date")
    ).cast("bigint")
    u = events.where(
        F.col(ts_col).isNotNull() & F.col(user_col).isNotNull()
    ).select(*keys, F.col(user_col).alias("u"), day.alias("d"))
    per = u.groupBy(*keys, "u").agg(
        F.min("d").alias("first_d"), F.max("d").alias("last_d")
    )
    w_all = Window.partitionBy(*keys) if keys else Window.partitionBy()
    end = F.max("last_d").over(w_all)
    lt = per.select(
        *keys,
        (F.col("last_d") - F.col("first_d")).cast("bigint").alias("t"),
        (F.col("last_d") > end - F.lit(int(censor_gap_days)))
        .alias("censored"),
    )
    grid = lt.groupBy(*keys, "t").agg(
        F.sum((~F.col("censored")).cast("bigint")).cast("bigint")
        .alias("d_churned"),
        F.sum(F.col("censored").cast("bigint")).cast("bigint")
        .alias("n_censored"),
    )
    w_desc = (
        Window.partitionBy(*keys)
        .orderBy(F.col("t").desc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    risked = grid.select(
        *keys,
        "t",
        "d_churned",
        "n_censored",
        F.sum(F.col("d_churned") + F.col("n_censored")).over(w_desc)
        .cast("bigint").alias("n_at_risk"),
    )
    nr = F.col("n_at_risk").cast("double")
    dd = F.col("d_churned").cast("double")
    term = F.when(
        (F.col("d_churned") > 0)
        & (F.col("d_churned") < F.col("n_at_risk")),
        F.round(F.log((nr - dd) / nr), 9),
    ).otherwise(F.lit(0.0))
    w_asc = (
        Window.partitionBy(*keys)
        .orderBy("t")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    walked = risked.select(
        *keys,
        "t",
        "n_at_risk",
        "d_churned",
        "n_censored",
        F.sum(term.cast("decimal(28,9)")).over(w_asc)
        .cast("double").alias("ln_s"),
        F.max(
            (F.col("d_churned") == F.col("n_at_risk")).cast("int")
        ).over(w_asc).alias("hit_zero"),
    )
    return walked.select(
        *keys,
        "t",
        "n_at_risk",
        "d_churned",
        "n_censored",
        F.when(F.col("hit_zero") == 1, F.lit(0.0))
        .otherwise(F.round(F.exp(F.col("ln_s")), 9))
        .alias("survival"),
    )


def seasonal_anomaly_stats(events: DataFrame, k: int = 6) -> DataFrame:
    """Day-of-week-aware traffic anomaly detection per event type:
    ROBUST multiplicative DOW decomposition (index_d = that
    weekday's MEDIAN daily count / the overall median — medians, so
    a spike cannot drag its own weekday's index and then hide inside
    it), then the median/MAD fence on the DESEASONALIZED series —
    flags a spike even when it lands on a naturally-busy weekday,
    and never flags an ordinary weekend dip (which
    :func:`daily_anomaly_stats`, season-blind, would).

    Returns (event_type, day_n, dow, n, dow_index, deseasonalized,
    med_ds, mad_ds, is_anomaly). dow = day_n % 7 anchored at the
    1970-01-01 epoch (0 = Thursday) — a pure integer, no locale.
    Exactness: daily counts and the zero-filled day spine are exact
    BIGINTs (outage days are real rows, the daily_anomaly_stats
    argument); ALL four medians (per-dow, overall, deseasonalized,
    MAD) are EXPLICIT-middle-rank selections — avg of the two middle
    values, day_n tie-break — so no engine percentile interpolation
    formula crosses the boundary; integer medians are exact dyadics,
    dow_index and deseasonalized one pinned IEEE division each.
    Degenerate guards: overall median 0 (mostly-outage stratum) or a
    dead weekday (index 0) fall back to the RAW count, never NaN.

    100 TB shape: one (type, day) count groupBy collapses the
    stream; spine fill, decomposition, rank walks and fences all
    live at types×days cardinality."""
    from mindocr_spark.cache import tracked_persist

    if k < 1:
        raise ValueError(f"k must be ≥ 1, got {k}")
    daily = _daily_count_spine(events).select(
        "event_type",
        "day_n",
        (F.col("day_n") % 7).cast("bigint").alias("dow"),
        "n",
    )

    def _median_over(df, val, part_cols, out_name):
        """Explicit-middle-rank median of `val` within `part_cols`,
        appended as a whole-partition column `out_name`."""
        w_p = Window.partitionBy(*part_cols)
        w_r = Window.partitionBy(*part_cols).orderBy(val, "day_n")
        mc, rc = f"_m_{out_name}", f"_rn_{out_name}"
        ranked = df.withColumn(
            mc, F.count(F.lit(1)).over(w_p)
        ).withColumn(rc, F.row_number().over(w_r))
        is_mid = (F.col(rc) == F.expr(f"({mc} + 1) DIV 2")) | (
            F.col(rc) == F.expr(f"({mc} + 2) DIV 2")
        )
        return ranked.withColumn(
            out_name,
            F.avg(F.when(is_mid, F.col(val))).over(w_p),
        ).drop(mc, rc)

    d1 = _median_over(daily, "n", ["event_type", "dow"], "med_dow")
    d2 = _median_over(d1, "n", ["event_type"], "med_all")
    idx = F.when(
        F.col("med_all") > 0.0, F.col("med_dow") / F.col("med_all")
    ).otherwise(F.lit(1.0))
    ds = tracked_persist(
        d2.select(
            "event_type",
            "day_n",
            "dow",
            "n",
            idx.alias("dow_index"),
            F.when(
                idx > 0.0, F.col("n").cast("double") / idx
            ).otherwise(F.col("n").cast("double")).alias("x"),
        )
    )
    m1 = _median_over(ds, "x", ["event_type"], "med_ds")
    dev = tracked_persist(
        m1.select(
            "*", F.abs(F.col("x") - F.col("med_ds")).alias("adev")
        )
    )
    out = _median_over(dev, "adev", ["event_type"], "mad_ds")
    return out.select(
        "event_type",
        "day_n",
        "dow",
        "n",
        "dow_index",
        F.col("x").alias("deseasonalized"),
        "med_ds",
        "mad_ds",
        (F.col("adev") > F.lit(float(k)) * F.col("mad_ds"))
        .alias("is_anomaly"),
    )


def session_paths(
    events: DataFrame,
    gap_s: int = 1800,
    max_len: int = 8,
    top_k: int = 20,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    id_col: str = "event_id",
) -> DataFrame:
    """Top navigation paths: sessionize each user's event stream by
    inactivity gap, read each session's first `max_len` event types
    in time order as its PATH, and rank paths by frequency — the
    'how do users actually move through the product' readout
    (:func:`event_transitions` gives the memoryless first-order
    view; this keeps whole trajectories).

    Returns (path, path_len, n_sessions, n_users, share, rank),
    rank ≤ top_k by (n_sessions desc, path asc). Exactness:
    timestamps compare at exact MICROSECOND epoch integers with
    `id_col` tie-break, so session boundaries, event order inside a
    session, and therefore every path string are pure functions of
    the input; counts exact BIGINTs; share one IEEE division
    rounded half-away at 6.

    100 TB shape: ONE Exchange on the user key carries the lag, the
    boundary cumulative sum, and the ordered per-session collect
    (bounded at max_len after the slice — a bot's 10^6-event session
    still truncates to max_len types); path-grain counts are
    map-side combinable; the total is an aggregate + broadcast cross
    join, never an unpartitioned window."""
    if gap_s < 1 or max_len < 1 or top_k < 1:
        raise ValueError("gap_s/max_len/top_k must be >= 1")
    anchor = "TIMESTAMP_NTZ'1970-01-01 00:00:00'"
    ev_us = F.expr(
        f"timestampdiff(MICROSECOND, {anchor}, {ts_col})"
    ).cast("bigint")
    ev = events.where(
        F.col(ts_col).isNotNull()
        & F.col(user_col).isNotNull()
        & F.col(type_col).isNotNull()
    ).select(
        F.col(user_col).alias("u"),
        F.col(id_col).alias("eid"),
        ev_us.alias("t"),
        F.col(type_col).alias("et"),
    )
    w_seq = Window.partitionBy("u").orderBy("t", "eid")
    flagged = ev.withColumn(
        "ns",
        F.when(
            F.lag("t").over(w_seq).isNull()
            | (F.col("t") - F.lag("t").over(w_seq)
               > F.lit(int(gap_s) * 1_000_000)),
            F.lit(1),
        ).otherwise(F.lit(0)),
    )
    w_cum = (
        Window.partitionBy("u")
        .orderBy("t", "eid")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    sess = flagged.withColumn(
        "sid", F.sum("ns").over(w_cum).cast("bigint")
    )
    paths = sess.groupBy("u", "sid").agg(
        F.array_join(
            F.slice(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct("t", "eid", "et"))
                    ),
                    lambda s: s.getField("et"),
                ),
                1,
                max_len,
            ),
            ">",
        ).alias("path")
    )
    from mindocr_spark.cache import tracked_persist

    counts = tracked_persist(paths.groupBy("path").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_sessions"),
        F.countDistinct("u").cast("bigint").alias("n_users"),
    ))
    tot = counts.groupBy().agg(
        F.sum("n_sessions").cast("bigint").alias("total_sessions")
    )
    # top_k first via sort+limit (distributed TakeOrdered over the
    # unbounded path relation), THEN the rank window over ≤ top_k
    # rows — never an unpartitioned rank at path grain. `tot` is
    # computed from `counts` BEFORE the cap, so shares are of the
    # whole stream. The two branches over `counts` are cheap
    # re-aggregations of the persisted session frame upstream.
    top = counts.orderBy(
        F.col("n_sessions").desc(), F.col("path").asc()
    ).limit(top_k)
    w_rank = Window.partitionBy().orderBy(
        F.col("n_sessions").desc(), F.col("path").asc()
    )
    return (
        top.crossJoin(F.broadcast(tot))
        .select(
            "path",
            (F.size(F.split("path", ">")))
            .cast("bigint").alias("path_len"),
            "n_sessions",
            "n_users",
            F.round(
                F.col("n_sessions").cast("double")
                / F.col("total_sessions").cast("double"),
                6,
            ).alias("share"),
        )
        .withColumn("rank", F.row_number().over(w_rank).cast("bigint"))
        .where(F.col("rank") <= top_k)
    )


def gsp_patterns(
    events: DataFrame, min_support: int = 2, prune_l3: bool = True
) -> DataFrame:
    """GSP-style frequent sequential patterns (Srikant & Agrawal,
    EDBT 1996) over per-user event streams: which ordered event-type
    subsequences (length 2 and 3, occurrences need not be contiguous)
    recur across at least ``min_support`` distinct users — the
    navigation-grammar complement of `session_paths` (which counts
    exact contiguous prefixes) and `event_transitions` (first-order
    only).

    Exact support semantics on the (ts, event_id) total order
    (ties in ts are broken by event_id, the `session_paths`
    discipline), via per-(user, type) rank envelopes:

    - a▸b supported ⟺ min_rank(a) < max_rank(b) — a witness pair
      exists iff the earliest a precedes the latest b;
    - a▸b▸c supported ⟺ some b-occurrence lands strictly between
      min_rank(a) and max_rank(c) — sound AND complete (any witness
      triple can be rebuilt from the envelope ends).

    Candidate pruning is the GSP antimonotone step: a length-3
    candidate is only scored if ALL THREE of its length-2
    subsequences (a▸b, b▸c, a▸c) are frequent.

    100 TB shape: ONE row_number window per user (the only wide
    operation over raw events), the envelope table collapses to
    users × |types| rows, length-2 scoring is an |types|²-bounded
    within-user join of that envelope, and length-3 scoring joins raw
    b-events against the BROADCAST candidate list + envelope — work
    is O(events × candidates-sharing-the-middle-type), never a
    per-user array that a 10⁶-event bot could blow up.

    Reference analog: staged det→rec candidate generation then
    verification (reference: tools/infer/text/predict_system.py:72-90)
    — generate cheap candidates, verify each against the evidence."""
    if min_support < 1:
        raise ValueError(f"need min_support ≥ 1, got {min_support}")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    ranked = events.select(
        "user_id", "event_type", F.row_number().over(w).alias("r")
    )
    env = (
        ranked.groupBy("user_id", "event_type")
        .agg(F.min("r").alias("min_r"), F.max("r").alias("max_r"))
    )
    from mindocr_spark.cache import tracked_persist

    env = tracked_persist(env)
    a = env.select(
        "user_id",
        F.col("event_type").alias("t1"),
        F.col("min_r").alias("min1"),
    )
    b = env.select(
        "user_id",
        F.col("event_type").alias("t2"),
        F.col("max_r").alias("max2"),
    )
    pair_sup = (
        a.join(b, "user_id")
        .where(F.col("min1") < F.col("max2"))
        .groupBy("t1", "t2")
        .agg(F.count_distinct("user_id").alias("support"))
        .where(F.col("support") >= min_support)
    )
    pairs = tracked_persist(pair_sup)
    # GSP candidate join: (a,b) ⋈ (b,c), prune on (a,c) frequent too
    p1 = pairs.select(F.col("t1").alias("ca"), F.col("t2").alias("cb"))
    p2 = pairs.select(F.col("t1").alias("cb"), F.col("t2").alias("cc"))
    cand3 = p1.join(p2, "cb").select("ca", "cb", "cc")
    if prune_l3:
        p3 = pairs.select(
            F.col("t1").alias("ca"), F.col("t2").alias("cc"))
        cand3 = cand3.join(p3, ["ca", "cc"], "left_semi")
    mids = ranked.select(
        "user_id", F.col("event_type").alias("cb"), "r")
    enva = env.select(
        "user_id", F.col("event_type").alias("ca"),
        F.col("min_r").alias("min_a"))
    envc = env.select(
        "user_id", F.col("event_type").alias("cc"),
        F.col("max_r").alias("max_c"))
    triple_sup = (
        mids.join(F.broadcast(cand3), "cb")
        .join(enva, ["user_id", "ca"])
        .join(envc, ["user_id", "cc"])
        .where((F.col("r") > F.col("min_a"))
               & (F.col("r") < F.col("max_c")))
        .select("user_id", "ca", "cb", "cc")
        .distinct()  # rows now unique per (pattern, user) …
        .groupBy("ca", "cb", "cc")
        .agg(F.count("*").alias("support"))  # … so count IS the support
        .where(F.col("support") >= min_support)
    )
    two = pairs.select(
        F.concat_ws(">", "t1", "t2").alias("pattern"),
        F.lit(2).cast("bigint").alias("k"),
        F.col("support").cast("bigint").alias("support"),
    )
    three = triple_sup.select(
        F.concat_ws(">", "ca", "cb", "cc").alias("pattern"),
        F.lit(3).cast("bigint").alias("k"),
        F.col("support").cast("bigint").alias("support"),
    )
    return two.unionByName(three)


def burst_windows(events: DataFrame, window_sec: int = 3600) -> DataFrame:
    """Peak SLIDING-window request rate per user: the maximum number of
    events inside any `window_sec` interval [t, t+window) anchored at
    an event — the flash-crowd / burst-bot metric the tumbling
    `windowed_counts` twin cannot see (a burst straddling a tumbling
    boundary halves; an anchored sliding count does not miss it).

    Exact: one RANGE window frame over integer epoch seconds
    (rangeBetween(0, window−1) ⇔ ts' ∈ [t, t+window) at second grain),
    then one groupBy with max + a deterministic argmax — the earliest
    window start achieving the peak, carried through an exact integer
    priority n·2³² + (2³² − epoch) so both engines pick the same
    anchor without a composite max_by.

    100 TB shape: ONE Exchange on the user key carries the range
    window; the groupBy reduces at user grain with map-side partials.
    Ties in ts are frame PEERS (range frame, not rows) — the count is
    order-independent, no tie-break needed where it cannot matter."""
    if window_sec < 1:
        raise ValueError(f"need window_sec >= 1, got {window_sec}")
    ep = epoch_sec("ts")
    w = (
        Window.partitionBy("user_id")
        .orderBy(ep)
        .rangeBetween(0, window_sec - 1)
    )
    n = F.count("*").over(w)
    pri = n * F.lit(4294967296) + (F.lit(4294967296) - ep)
    per_event = events.select(
        "user_id", "ts",
        n.alias("n_in_window"),
        pri.alias("pri"),
    )
    return per_event.groupBy("user_id").agg(
        F.max("n_in_window").cast("bigint").alias("peak"),
        F.max_by("ts", "pri").alias("peak_start"),
        F.count("*").cast("bigint").alias("n_events"),
    )


def rfm_scores(events: DataFrame, n_bins: int = 5) -> DataFrame:
    """RFM (recency / frequency / monetary) segmentation — the classic
    behavioral scoring grid: per user, days-grade recency against the
    stream's newest event, event count, and exact-DECIMAL value sum,
    each binned 1..n_bins with n_bins = best. Bins come from exact
    integer rank arithmetic — score = nb − ((rank−1)·nb div n) over a
    (metric, user_id)-tie-broken rank — NOT ntile (whose tie placement
    is engine-defined); every boundary decision is an integer
    comparison both engines state identically.

    Output: (user_id, recency_s, frequency, monetary, r_score,
    f_score, m_score, segment) with monetary lowered to DOUBLE once
    at the end (the stream_static_join decimal-sum discipline).

    100 TB shape: ONE groupBy to user grain (map-side combinable),
    the global anchor is a broadcast one-row aggregate, and the three
    exact ranks run through `ranked_global` — range-partitioned
    distributed sorts with broadcast partition offsets, NEVER an
    unpartitioned window over the user relation (which would move all
    10^9 users to one task). Three distributed sorts of the user
    relation; swap in approx percentile boundaries if even that is
    too hot (same schema, the length_quantiles discipline)."""
    if n_bins < 2:
        raise ValueError(f"need n_bins >= 2, got {n_bins}")
    ep = epoch_sec("ts")
    per_user = events.groupBy("user_id").agg(
        F.max(ep).alias("last_ep"),
        F.count("*").cast("bigint").alias("frequency"),
        F.sum(
            F.round(F.col("value"), 9).cast("decimal(28,9)")
        ).alias("mon_dec"),
    )
    anchor = per_user.agg(F.max("last_ep").alias("anchor_ep"))
    base = per_user.crossJoin(F.broadcast(anchor)).select(
        "user_id",
        (F.col("anchor_ep") - F.col("last_ep")).cast("bigint")
        .alias("recency_s"),
        "frequency", "mon_dec",
    )
    from mindocr_spark.functions.ranking import ranked_global

    ranked = ranked_global(
        ranked_global(
            ranked_global(
                base, [F.asc("recency_s"), F.asc("user_id")],
                rank_col="rr"),
            [F.desc("frequency"), F.asc("user_id")], rank_col="rf"),
        [F.desc("mon_dec"), F.asc("user_id")], rank_col="rm",
        attach_totals=True, n_col="nu")

    def _s(rank):
        return (F.lit(n_bins)
                - F.expr(f"(({rank} - 1) * {n_bins}) div nu")
                ).cast("bigint")

    return ranked.select(
        "user_id", "recency_s", "frequency",
        F.col("mon_dec").cast("double").alias("monetary"),
        _s("rr").alias("r_score"),
        _s("rf").alias("f_score"),
        _s("rm").alias("m_score"),
        F.concat_ws(
            "-", _s("rr"), _s("rf"), _s("rm")).alias("segment"),
    )

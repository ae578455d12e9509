"""Bot-cadence detection — planted metronome/burst goldens + guards."""

import datetime as dt

import pytest

from pyspark.sql import functions as F


def _events(spark, rows):
    """rows: (user_id, event_id, epoch_offset_s) anchored at 2024-01-01."""
    base = dt.datetime(2024, 1, 1)
    data = [
        (u, e, base + dt.timedelta(seconds=s)) for (u, e, s) in rows
    ]
    return spark.createDataFrame(
        data, "user_id bigint, event_id bigint, ts timestamp_ntz"
    )


def _run(spark, rows, **kw):
    from mindocr_spark.functions.traffic import bot_session_stats

    out = bot_session_stats(_events(spark, rows), **kw).collect()
    return {r["user_id"]: r for r in out}


class TestBotSessionStats:
    def test_metronome_fires(self, spark):
        rows = [(1, i, i * 7) for i in range(20)]
        r = _run(spark, rows)[1]
        assert (r["n_events"], r["span_s"]) == (20, 133)
        assert (r["min_gap_s"], r["max_gap_s"], r["n_distinct_gaps"]) == (
            7, 7, 1)
        assert r["is_metronome"] and not r["is_burst"] and r["is_bot"]

    def test_metronome_needs_event_floor(self, spark):
        # perfect cadence but only 5 events — not enough evidence
        rows = [(1, i, i * 7) for i in range(5)]
        r = _run(spark, rows)[1]
        assert r["n_distinct_gaps"] == 1 and not r["is_metronome"]

    def test_burst_fires(self, spark):
        # 30 events inside 10 seconds, then nothing
        rows = [(2, i, i // 3) for i in range(30)]
        r = _run(spark, rows, burst_events_60s=30)[2]
        assert r["max_burst_60s"] == 30
        assert r["is_burst"] and r["is_bot"]
        # gaps alternate 0/1 → two distinct values, no metronome
        assert r["n_distinct_gaps"] == 2 and not r["is_metronome"]

    def test_burst_window_is_sliding_not_fixed(self, spark):
        # two 20-event runs, each under the 30 floor alone; the sliding
        # [5..64] window catches the first run's tail (t=5..19, 15
        # events) plus the whole second run (t=45..64, 20) = 35
        rows = [(3, i, i) for i in range(20)] + [
            (3, 100 + i, 45 + i) for i in range(20)
        ]
        r = _run(spark, rows, burst_events_60s=30)[3]
        assert r["max_burst_60s"] == 35
        assert r["is_burst"]

    def test_human_and_single_event(self, spark):
        rows = [(4, 0, 0), (4, 1, 13), (4, 2, 1000), (5, 9, 42)]
        out = _run(spark, rows)
        h = out[4]
        assert h["n_distinct_gaps"] == 2 and not h["is_bot"]
        s = out[5]
        assert s["n_events"] == 1 and s["span_s"] == 0
        assert s["min_gap_s"] is None and s["max_gap_s"] is None
        assert s["n_distinct_gaps"] == 0 and not s["is_bot"]

    def test_guards(self, spark):
        from mindocr_spark.functions.traffic import bot_session_stats

        df = _events(spark, [(1, 0, 0)])
        with pytest.raises(ValueError):
            bot_session_stats(df, min_metronome_events=1)
        with pytest.raises(ValueError):
            bot_session_stats(df, burst_events_60s=0)


class TestMadOutliers:
    def _run(self, spark, rows, **kw):
        from mindocr_spark.functions.traffic import mad_outlier_stats

        df = spark.createDataFrame(rows, "event_type string, value double")
        out = mad_outlier_stats(df, **kw).collect()
        return {r["event_type"]: r for r in out}

    def test_hand_computed_golden(self, spark):
        # values 1..7 plus a 1000.0 contaminant: median 4.5 (8 values),
        # adevs {3.5,2.5,1.5,0.5,0.5,1.5,2.5,995.5} → MAD 2.0; fence
        # 5·2.0 = 10 → exactly the contaminant is out
        rows = [("a", float(v)) for v in range(1, 8)] + [("a", 1000.0)]
        r = self._run(spark, rows, k=5)["a"]
        assert r["n_events"] == 8
        assert r["med_value"] == 4.5
        assert r["mad_value"] == 2.0
        assert r["n_outliers"] == 1

    def test_median_resists_contamination(self, spark):
        # mean-based gate would move by ~125 here; the median moves by
        # half a step and the same single row is flagged
        rows = [("a", float(v)) for v in range(1, 8)] + [("a", 1e6)]
        r = self._run(spark, rows, k=5)["a"]
        assert r["med_value"] == 4.5 and r["n_outliers"] == 1

    def test_all_equal_values_zero_mad_no_outliers(self, spark):
        rows = [("b", 7.0)] * 5
        r = self._run(spark, rows)["b"]
        assert r["mad_value"] == 0.0 and r["n_outliers"] == 0

    def test_cents_quantization(self, spark):
        # 0.005 rounds half-away to 1 cent in both engines
        rows = [("c", 0.005), ("c", 0.01), ("c", 0.01)]
        r = self._run(spark, rows)["c"]
        assert r["med_value"] == 0.01

    def test_guard(self, spark):
        from mindocr_spark.functions.traffic import mad_outlier_stats

        df = spark.createDataFrame([("a", 1.0)],
                                   "event_type string, value double")
        with pytest.raises(ValueError):
            mad_outlier_stats(df, k=0)


class TestEventTransitions:
    def test_hand_computed_matrix(self, spark):
        import datetime as dt

        from mindocr_spark.functions.traffic import event_transitions

        base = dt.datetime(2024, 1, 1)
        rows = [
            # user 1: a → b → a → b ; user 2: a → a
            (1, 0, base, "a"), (1, 1, base + dt.timedelta(seconds=1), "b"),
            (1, 2, base + dt.timedelta(seconds=2), "a"),
            (1, 3, base + dt.timedelta(seconds=3), "b"),
            (2, 4, base, "a"), (2, 5, base + dt.timedelta(seconds=9), "a"),
        ]
        df = spark.createDataFrame(
            rows,
            "user_id bigint, event_id bigint, ts timestamp_ntz,"
            " event_type string",
        )
        out = {(r["prev_type"], r["event_type"]): (r["n"], r["p"])
               for r in event_transitions(df).collect()}
        # from 'a': a→b twice (user 1), a→a once (user 2)
        assert out[("a", "b")] == (2, round(2 / 3, 6))
        assert out[("a", "a")] == (1, round(1 / 3, 6))
        # from 'b': only b→a (user 1's middle hop)
        assert out[("b", "a")] == (1, 1.0)
        # streams never cross users: no ('b','a') inflation from user 2
        assert set(out) == {("a", "b"), ("a", "a"), ("b", "a")}

    def test_same_ts_ties_break_on_event_id(self, spark):
        import datetime as dt

        from mindocr_spark.functions.traffic import event_transitions

        t = dt.datetime(2024, 1, 1)
        df = spark.createDataFrame(
            [(1, 10, t, "x"), (1, 11, t, "y")],
            "user_id bigint, event_id bigint, ts timestamp_ntz,"
            " event_type string",
        )
        out = {(r["prev_type"], r["event_type"])
               for r in event_transitions(df).collect()}
        assert out == {("x", "y")}


class TestRetentionCohorts:
    def test_hand_computed_matrix(self, spark):
        import datetime as dt

        from mindocr_spark.functions.traffic import retention_cohorts

        d0 = dt.datetime(2024, 1, 1, 10)
        day = dt.timedelta(days=1)
        rows = [
            # cohort day 0: users 1,2; user 1 returns day 1 and 2,
            # user 2 returns day 2 only
            (1, d0), (2, d0), (1, d0 + day), (1, d0 + 2 * day),
            (2, d0 + 2 * day),
            # cohort day 1: user 3, never returns
            (3, d0 + day),
        ]
        df = spark.createDataFrame(
            rows, "user_id bigint, ts timestamp_ntz"
        )
        out = {(r["cohort_day_n"], r["day_offset"]): r
               for r in retention_cohorts(df).collect()}
        e0 = 19723  # 2024-01-01 in days since epoch
        assert out[(e0, 0)]["n_active"] == 2
        assert out[(e0, 0)]["retention"] == 1.0
        assert out[(e0, 1)]["n_active"] == 1
        assert out[(e0, 1)]["retention"] == 0.5
        assert out[(e0, 2)]["n_active"] == 2
        assert out[(e0 + 1, 0)]["cohort_size"] == 1
        assert (e0 + 1, 1) not in out

    def test_multiple_events_one_day_count_once(self, spark):
        import datetime as dt

        from mindocr_spark.functions.traffic import retention_cohorts

        d0 = dt.datetime(2024, 1, 1)
        df = spark.createDataFrame(
            [(1, d0), (1, d0 + dt.timedelta(hours=5))],
            "user_id bigint, ts timestamp_ntz",
        )
        out = retention_cohorts(df).collect()
        assert len(out) == 1 and out[0]["n_active"] == 1


class TestDailyAnomaly:
    def test_flash_crowd_fires_only_on_its_day(self, spark):
        import datetime as dt

        from mindocr_spark.functions.traffic import daily_anomaly_stats

        rows = []
        for d in range(11):
            # 10/11/12 cycling baseline: MAD = 1, a non-degenerate
            # fence (a constant baseline gives MAD 0 → fence '> 0'
            # flags every ordinary wiggle — robust stats need spread)
            for i in range(10 + (d % 3)):
                rows.append(
                    ("view", dt.datetime(2024, 1, 1 + d, 1, i))
                )
        for i in range(500):  # 2024-01-06 flash crowd
            rows.append(("view", dt.datetime(2024, 1, 6, 2, i % 60, i % 60)))
        df = spark.createDataFrame(
            rows, "event_type string, ts timestamp_ntz"
        )
        out = {r["day_n"]: r for r in
               daily_anomaly_stats(df, k=6).collect()}
        flagged = [d for d, r in out.items() if r["is_anomaly"]]
        assert flagged == [19728]  # 2024-01-06
        assert out[19728]["n"] == 512
        assert out[19728]["mad_n"] == 1.0

    def test_total_outage_day_is_flagged(self, spark):
        # a day with ZERO events produces no groupBy row; the day-spine
        # fill must surface it as n=0 and the fence must flag it —
        # the one anomaly an outage monitor exists for
        import datetime as dt

        from mindocr_spark.functions.traffic import daily_anomaly_stats

        rows = []
        for d in range(15):
            if d == 7:
                continue  # 2024-01-08: total silence
            for i in range(100 + (d % 3)):
                rows.append(
                    ("view", dt.datetime(2024, 1, 1 + d, 1,
                                         i % 60, i // 60))
                )
        df = spark.createDataFrame(
            rows, "event_type string, ts timestamp_ntz"
        )
        out = {r["day_n"]: r for r in
               daily_anomaly_stats(df, k=6).collect()}
        outage_day = 19730  # 2024-01-08
        assert out[outage_day]["n"] == 0
        assert out[outage_day]["is_anomaly"] is True
        assert len(out) == 15  # spine covers the gap day
        others = [d for d, r in out.items()
                  if r["is_anomaly"] and d != outage_day]
        assert others == []

    def test_guard(self, spark):
        from mindocr_spark.functions.traffic import daily_anomaly_stats

        df = spark.createDataFrame(
            [("a",)], "event_type string"
        ).withColumn("ts", F.lit(None).cast("timestamp_ntz"))
        with pytest.raises(ValueError):
            daily_anomaly_stats(df, k=0)


class TestKAnonymity:
    def _run(self, spark, rows, k=3, l_div=2):
        from mindocr_spark.functions.traffic import k_anonymity_stats

        df = spark.createDataFrame(rows, "qi string, s long")
        (r,) = k_anonymity_stats(
            df, qi_cols=("qi",), sensitive_col="s", k=k, l_div=l_div
        ).collect()
        return r

    def test_hand_computed(self, spark):
        # class A: 4 rows, 2 distinct s; class B: 2 rows, 1 distinct
        rows = [("A", 1), ("A", 1), ("A", 2), ("A", 2),
                ("B", 7), ("B", 7)]
        r = self._run(spark, rows)
        assert (r["n_rows"], r["n_classes"], r["min_class_size"]) == (6, 2, 2)
        assert r["rows_below_k"] == 2 and r["share_below_k"] == 2 / 6
        assert r["classes_below_l"] == 1
        assert r["share_classes_below_l"] == 0.5

    def test_fully_anonymous_release_clean(self, spark):
        rows = [("A", i) for i in range(5)] + [("B", i) for i in range(5)]
        r = self._run(spark, rows, k=3, l_div=2)
        assert r["rows_below_k"] == 0 and r["classes_below_l"] == 0

    def test_null_qi_is_a_real_class(self, spark):
        rows = [(None, 1), (None, 2), ("A", 3), ("A", 4), ("A", 5)]
        r = self._run(spark, rows, k=3)
        # NULL class has 2 rows < k → those rows are at risk
        assert r["n_classes"] == 2 and r["rows_below_k"] == 2

    def test_homogeneity_attack_detected(self, spark):
        # big class (size 5 ≥ k) but every row the same user: l fails
        rows = [("A", 9)] * 5
        r = self._run(spark, rows, k=3, l_div=2)
        assert r["rows_below_k"] == 0 and r["classes_below_l"] == 1

    def test_guards(self, spark):
        import pytest as _pytest

        from mindocr_spark.functions.traffic import k_anonymity_stats

        df = spark.createDataFrame([("A", 1)], "qi string, s long")
        with _pytest.raises(ValueError):
            k_anonymity_stats(df, ("qi",), "s", k=1)
        with _pytest.raises(ValueError):
            k_anonymity_stats(df, ("qi",), "s", k=5, l_div=0)


class TestAbTestProportions:
    def _run(self, spark, units, convs, **kw):
        from mindocr_spark.functions.traffic import ab_test_proportions

        u = spark.createDataFrame(units, "unit long, variant string")
        c = spark.createDataFrame(convs, "unit long, metric string")
        return {
            r["metric"]: r.asDict()
            for r in ab_test_proportions(u, c, **kw).collect()
        }

    def test_hand_computed_z(self, spark):
        import math

        units = [(i, "A" if i % 2 == 0 else "B") for i in range(200)]
        convs = [(i, "m") for i in range(0, 200, 2) if i % 10 == 0]
        convs += [(i, "m") for i in range(1, 200, 2) if i % 5 < 3]
        out = self._run(spark, units, convs)["m"]
        assert (out["n_a"], out["n_b"]) == (100, 100)
        assert (out["conv_a"], out["conv_b"]) == (20, 60)
        p = 80 / 200
        se = math.sqrt(p * (1 - p) * (1 / 100 + 1 / 100))
        assert abs(out["z"] - (0.6 - 0.2) / se) < 1e-12
        assert out["significant"] is True

    def test_contaminated_units_excluded(self, spark):
        units = [(1, "A"), (2, "B"), (1, "B"), (3, "A"), (4, "A")]
        out = self._run(spark, units, [(1, "m"), (2, "m")])["m"]
        # unit 1 is in both arms: dropped from totals AND conversions
        assert (out["n_a"], out["n_b"]) == (2, 1)
        assert (out["conv_a"], out["conv_b"]) == (0, 1)

    def test_conversion_dedup_per_unit_metric(self, spark):
        units = [(1, "A"), (2, "B")]
        convs = [(1, "m"), (1, "m"), (1, "m"), (2, "m")]
        out = self._run(spark, units, convs)["m"]
        assert (out["conv_a"], out["conv_b"]) == (1, 1)

    def test_degenerate_pooled_rate_null_z(self, spark):
        units = [(1, "A"), (2, "B")]
        # everyone converts -> pooled = 1 -> zero variance
        out = self._run(spark, units, [(1, "m"), (2, "m")])["m"]
        assert out["z"] is None
        assert out["significant"] is False

    def test_empty_arm_null_rates(self, spark):
        units = [(1, "A"), (2, "A")]
        out = self._run(spark, units, [(1, "m")])["m"]
        assert out["n_b"] == 0
        assert out["rate_b"] is None
        assert out["z"] is None
        assert out["significant"] is False

    def test_other_variant_values_ignored(self, spark):
        units = [(1, "A"), (2, "B"), (3, "C"), (4, None)]
        out = self._run(spark, units, [(3, "m"), (1, "m")])["m"]
        assert (out["n_a"], out["n_b"]) == (1, 1)
        assert (out["conv_a"], out["conv_b"]) == (1, 0)

    def test_param_guards(self, spark):
        import pytest as _pytest

        from mindocr_spark.functions.traffic import ab_test_proportions

        u = spark.createDataFrame([(1, "A")], "unit long, variant string")
        c = spark.createDataFrame([(1, "m")], "unit long, metric string")
        with _pytest.raises(ValueError):
            ab_test_proportions(u, c, variant_a="X", variant_b="X")
        with _pytest.raises(ValueError):
            ab_test_proportions(u, c, z_crit=0)


class TestFunnelConversion:
    def _run(self, spark, rows, steps=("a", "b", "c"), **kw):
        """rows: (user_id, event_type, epoch_offset_s)."""
        import datetime as dt

        base = dt.datetime(2024, 1, 1)
        data = [
            (u, t, base + dt.timedelta(seconds=s)) for (u, t, s) in rows
        ]
        from mindocr_spark.functions.traffic import funnel_conversion

        df = spark.createDataFrame(
            data, "user_id bigint, event_type string, ts timestamp_ntz"
        )
        out = funnel_conversion(df, list(steps), **kw).collect()
        return {r["step"]: r for r in out}

    def test_full_funnel_single_user(self, spark):
        out = self._run(spark, [(1, "a", 0), (1, "b", 5), (1, "c", 9)])
        assert [out[s]["n_users"] for s in "abc"] == [1, 1, 1]
        assert out["c"]["conv_from_first"] == 1.0
        assert out["a"]["conv_from_prev"] == 1.0

    def test_order_matters(self, spark):
        # c before b: user reaches b but never c-after-b
        out = self._run(spark, [(1, "a", 0), (1, "c", 3), (1, "b", 5)])
        assert [out[s]["n_users"] for s in "abc"] == [1, 1, 0]
        assert out["c"]["conv_from_prev"] == 0.0

    def test_greedy_anchors_on_first_step1(self, spark):
        # b sits between the two a's: greedy t1 = first a, so b counts
        out = self._run(spark, [(1, "a", 0), (1, "b", 2), (1, "a", 4)])
        assert out["b"]["n_users"] == 1

    def test_simultaneous_not_after(self, spark):
        # b at exactly t1 (same microsecond) is not strictly after
        out = self._run(spark, [(1, "a", 7), (1, "b", 7)])
        assert out["b"]["n_users"] == 0

    def test_conversion_window_bites(self, spark):
        rows = [(1, "a", 0), (1, "b", 5), (1, "c", 100),
                (2, "a", 0), (2, "b", 5), (2, "c", 20)]
        out = self._run(spark, rows, window_s=30)
        assert out["b"]["n_users"] == 2
        assert out["c"]["n_users"] == 1
        assert out["c"]["conv_from_first"] == 0.5
        assert out["c"]["conv_from_prev"] == 0.5

    def test_window_anchors_on_first_step_not_prev(self, spark):
        # b at 25, c at 45: within 30s of b but not of a -> dropped
        out = self._run(
            spark, [(1, "a", 0), (1, "b", 25), (1, "c", 45)],
            window_s=30,
        )
        assert out["b"]["n_users"] == 1
        assert out["c"]["n_users"] == 0

    def test_never_entered_stratum_all_zero(self, spark):
        # user only does b/c: no a anchor, nothing counts
        out = self._run(spark, [(1, "b", 0), (1, "c", 5)])
        assert [out[s]["n_users"] for s in "abc"] == [0, 0, 0]
        assert out["a"]["conv_from_first"] is None

    def test_stratified(self, spark):
        import datetime as dt

        from mindocr_spark.functions.traffic import funnel_conversion

        base = dt.datetime(2024, 1, 1)
        rows = [
            ("x", 1, "a", 0), ("x", 1, "b", 5),
            ("x", 2, "a", 0),
            ("y", 3, "a", 0), ("y", 3, "b", 2), ("y", 3, "c", 4),
        ]
        df = spark.createDataFrame(
            [
                (s, u, t, base + dt.timedelta(seconds=o))
                for (s, u, t, o) in rows
            ],
            "s string, user_id bigint, event_type string,"
            " ts timestamp_ntz",
        )
        out = {
            (r["s"], r["step"]): r
            for r in funnel_conversion(
                df, ["a", "b", "c"], by=("s",)
            ).collect()
        }
        assert out[("x", "a")]["n_users"] == 2
        assert out[("x", "b")]["n_users"] == 1
        assert out[("x", "b")]["conv_from_first"] == 0.5
        assert out[("x", "c")]["n_users"] == 0
        assert out[("y", "c")]["n_users"] == 1

    def test_guards(self, spark):
        import pytest

        from mindocr_spark.functions.traffic import funnel_conversion

        df = spark.createDataFrame(
            [], "user_id bigint, event_type string, ts timestamp_ntz"
        )
        with pytest.raises(ValueError):
            funnel_conversion(df, ["a"])
        with pytest.raises(ValueError):
            funnel_conversion(df, ["a", "a"])

    def test_plan_one_exchange_for_all_step_windows(self, spark):
        """The K chained step minima must share ONE Exchange+Sort on
        the (stratum, user) key; only the stratum rollup adds one."""
        import datetime as dt

        from mindocr_spark.functions.traffic import funnel_conversion

        base = dt.datetime(2024, 1, 1)
        df = spark.createDataFrame(
            [(1, "a", base), (1, "b", base)],
            "user_id bigint, event_type string, ts timestamp_ntz",
        )
        out = funnel_conversion(df, ["a", "b", "c", "d"], window_s=60)
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert plan.count("Exchange") == 2
        assert plan.count("Sort") == 1


class TestKMSurvival:
    def _run(self, spark, spans, **kw):
        """spans: (user_id, first_day, last_day) -> two events each."""
        import datetime as dt

        base = dt.datetime(2024, 1, 1)
        data = []
        for (u, f, l) in spans:
            data.append((u, base + dt.timedelta(days=f)))
            data.append((u, base + dt.timedelta(days=l)))
        from mindocr_spark.functions.traffic import km_survival

        df = spark.createDataFrame(
            data, "user_id bigint, ts timestamp_ntz"
        )
        out = km_survival(df, **kw).collect()
        return {r["t"]: r for r in out}

    def test_textbook_curve(self, spark):
        # A churn t=1, B churn t=2, C churn t=3, D censored t=10
        out = self._run(
            spark,
            [(1, 0, 1), (2, 0, 2), (3, 0, 3), (4, 0, 10)],
            censor_gap_days=3,
        )
        assert out[1]["n_at_risk"] == 4 and out[1]["d_churned"] == 1
        assert abs(out[1]["survival"] - 0.75) < 2e-9
        assert abs(out[2]["survival"] - 0.5) < 2e-9
        assert abs(out[3]["survival"] - 0.25) < 2e-9
        assert out[10]["n_censored"] == 1
        assert out[10]["d_churned"] == 0
        assert abs(out[10]["survival"] - 0.25) < 2e-9

    def test_last_churn_hits_exact_zero(self, spark):
        # both users churn; final time has d == n_at_risk -> S = 0.0
        out = self._run(
            spark, [(1, 0, 1), (2, 0, 2)], censor_gap_days=0
        )
        assert out[2]["survival"] == 0.0
        assert abs(out[1]["survival"] - 0.5) < 2e-9

    def test_all_censored_flat_one(self, spark):
        out = self._run(
            spark, [(1, 0, 9), (2, 0, 10)], censor_gap_days=5
        )
        assert all(r["survival"] == 1.0 for r in out.values())
        assert all(r["d_churned"] == 0 for r in out.values())

    def test_tied_lifetimes_single_grid_row(self, spark):
        out = self._run(
            spark,
            [(1, 0, 2), (2, 5, 7), (3, 0, 20)],
            censor_gap_days=2,
        )
        # users 1,2 share t=2 -> one row, d=2, n=3 -> S = 1/3
        assert out[2]["d_churned"] == 2 and out[2]["n_at_risk"] == 3
        assert abs(out[2]["survival"] - 1.0 / 3.0) < 2e-9

    def test_stratified_independent_ends(self, spark):
        import datetime as dt

        from mindocr_spark.functions.traffic import km_survival

        base = dt.datetime(2024, 1, 1)
        rows = []
        # stratum x ends day 10; stratum y ends day 30 — censoring
        # is judged against each stratum's own end
        for (s, u, f, l) in [
            ("x", 1, 0, 2), ("x", 2, 0, 10),
            ("y", 3, 0, 2), ("y", 4, 0, 30),
        ]:
            rows.append((s, u, base + dt.timedelta(days=f)))
            rows.append((s, u, base + dt.timedelta(days=l)))
        df = spark.createDataFrame(
            rows, "s string, user_id bigint, ts timestamp_ntz"
        )
        out = {
            (r["s"], r["t"]): r
            for r in km_survival(
                df, by=("s",), censor_gap_days=3
            ).collect()
        }
        assert out[("x", 2)]["d_churned"] == 1   # 2 <= 10-3
        assert out[("x", 10)]["n_censored"] == 1
        assert out[("y", 2)]["d_churned"] == 1   # 2 <= 30-3
        assert out[("y", 30)]["n_censored"] == 1


class TestSeasonalAnomaly:
    def _run(self, spark, day_counts, k=6):
        """day_counts: {day_offset: n_events} for one event type."""
        import datetime as dt

        base = dt.datetime(2024, 1, 1)
        rows = []
        for d, c in day_counts.items():
            for i in range(c):
                rows.append(
                    ("view", base + dt.timedelta(days=d, seconds=i))
                )
        from mindocr_spark.functions.traffic import (
            seasonal_anomaly_stats,
        )

        df = spark.createDataFrame(
            rows, "event_type string, ts timestamp_ntz"
        )
        out = seasonal_anomaly_stats(df, k=k).collect()
        base_day = (base.date() - dt.date(1970, 1, 1)).days
        return {r["day_n"] - base_day: r for r in out}

    def test_flat_series_quiet(self, spark):
        out = self._run(spark, {d: 10 for d in range(14)})
        assert all(r["dow_index"] == 1.0 for r in out.values())
        assert not any(r["is_anomaly"] for r in out.values())

    def test_clean_weekly_pattern_quiet(self, spark):
        # every 7th day doubled: a season-blind fence would flag it;
        # the DOW index absorbs it exactly (all deseasonalized equal)
        counts = {d: (20 if d % 7 == 3 else 10) for d in range(14)}
        out = self._run(spark, counts)
        assert out[3]["dow_index"] == 2.0
        assert out[0]["dow_index"] == 1.0
        assert not any(r["is_anomaly"] for r in out.values())
        vals = {round(r["deseasonalized"], 9) for r in out.values()}
        assert len(vals) == 1

    def test_weekday_spike_flagged_alone(self, spark):
        counts = {d: (20 if d % 7 == 3 else 10) for d in range(28)}
        counts[8] = 100  # spike on an ordinary weekday
        out = self._run(spark, counts)
        flagged = [d for d, r in out.items() if r["is_anomaly"]]
        assert flagged == [8]

    def test_outage_day_spine_filled_and_flagged(self, spark):
        counts = {d: 10 for d in range(21)}
        del counts[9]  # total outage: no rows at all that day
        out = self._run(spark, counts)
        assert out[9]["n"] == 0
        assert out[9]["is_anomaly"] is True
        assert [d for d, r in out.items() if r["is_anomaly"]] == [9]

    def test_guard(self, spark):
        import pytest as _pt

        from mindocr_spark.functions.traffic import (
            seasonal_anomaly_stats,
        )

        df = spark.createDataFrame(
            [], "event_type string, ts timestamp_ntz"
        )
        with _pt.raises(ValueError):
            seasonal_anomaly_stats(df, k=0)


class TestSessionPaths:
    def _run(self, spark, rows, **kw):
        """rows: (user, event_id, offset_s, event_type)."""
        import datetime as dt

        base = dt.datetime(2024, 1, 1)
        data = [
            (u, e, base + dt.timedelta(seconds=s), t)
            for (u, e, s, t) in rows
        ]
        from mindocr_spark.functions.traffic import session_paths

        df = spark.createDataFrame(
            data,
            "user_id bigint, event_id bigint, ts timestamp_ntz,"
            " event_type string",
        )
        return session_paths(df, **kw).collect()

    def test_gap_splits_sessions(self, spark):
        rows = [(1, 1, 0, "a"), (1, 2, 10, "b"),
                (1, 3, 5000, "a"), (1, 4, 5010, "b")]
        out = self._run(spark, rows, gap_s=1800)
        (r,) = out
        assert r["path"] == "a>b"
        assert r["n_sessions"] == 2 and r["n_users"] == 1
        assert r["share"] == 1.0 and r["path_len"] == 2

    def test_order_within_session_by_time(self, spark):
        rows = [(1, 1, 20, "c"), (1, 2, 0, "a"), (1, 3, 10, "b")]
        (r,) = self._run(spark, rows)
        assert r["path"] == "a>b>c"

    def test_tie_breaks_by_event_id(self, spark):
        rows = [(1, 2, 0, "y"), (1, 1, 0, "x")]
        (r,) = self._run(spark, rows)
        assert r["path"] == "x>y"

    def test_truncation_at_max_len(self, spark):
        rows = [(1, i, i, "e") for i in range(6)]
        (r,) = self._run(spark, rows, max_len=3)
        assert r["path"] == "e>e>e" and r["path_len"] == 3

    def test_topk_rank_order(self, spark):
        rows = [(u, u * 10, 0, "a") for u in range(3)]          # a ×3
        rows += [(u, u * 10 + 1, 9000, "b") for u in range(2)]  # b ×2
        out = self._run(spark, rows, top_k=1)
        (r,) = out
        assert r["path"] == "a" and r["rank"] == 1
        assert r["n_sessions"] == 3 and r["n_users"] == 3
        assert r["share"] == 0.6

    def test_guards(self, spark):
        import pytest as _pt

        from mindocr_spark.functions.traffic import session_paths

        df = spark.createDataFrame(
            [],
            "user_id bigint, event_id bigint, ts timestamp_ntz,"
            " event_type string",
        )
        with _pt.raises(ValueError):
            session_paths(df, gap_s=0)
        with _pt.raises(ValueError):
            session_paths(df, max_len=0)


class TestGSPPatterns:
    def _ev(self, spark, rows):
        """rows: (user_id, event_id, offset_s, event_type)."""
        base = dt.datetime(2024, 1, 1)
        data = [(u, e, base + dt.timedelta(seconds=s), t)
                for (u, e, s, t) in rows]
        return spark.createDataFrame(
            data,
            "user_id bigint, event_id bigint, ts timestamp_ntz,"
            " event_type string",
        )

    def _run(self, spark, rows, **kw):
        from mindocr_spark.functions.traffic import gsp_patterns

        out = gsp_patterns(self._ev(spark, rows), **kw).collect()
        return {r["pattern"]: r["support"] for r in out}

    def test_envelope_semantics_and_support_floor(self, spark):
        rows = [
            # u1: a b c  — supports a>b, b>c, a>c, a>b>c
            (1, 1, 0, "a"), (1, 2, 10, "b"), (1, 3, 20, "c"),
            # u2: c a b  — supports a>b, c>a, c>b, c>a>b; NOT a>b>c
            (2, 4, 0, "c"), (2, 5, 10, "a"), (2, 6, 20, "b"),
        ]
        got = self._run(spark, rows, min_support=2)
        assert got == {"a>b": 2}  # the only pattern both users share
        got1 = self._run(spark, rows, min_support=1)
        assert got1["a>b>c"] == 1 and got1["c>a>b"] == 1
        assert "b>a" not in got1

    def test_repeated_type_needs_two_occurrences(self, spark):
        rows = [
            (1, 1, 0, "a"), (1, 2, 5, "a"),   # a>a supported
            (2, 3, 0, "a"),                    # single a: no a>a
        ]
        got = self._run(spark, rows, min_support=1)
        assert got["a>a"] == 1
        # triple a>a>a needs three occurrences
        assert "a>a>a" not in got
        rows3 = rows + [(1, 4, 9, "a")]
        got3 = self._run(spark, rows3, min_support=1)
        assert got3["a>a>a"] == 1

    def test_ts_tie_broken_by_event_id(self, spark):
        # same timestamp: event_id orders a before b for u1, b before a
        # for u2 — supports differ accordingly (deterministic ordering)
        rows = [
            (1, 1, 0, "a"), (1, 2, 0, "b"),
            (2, 9, 0, "a"), (2, 3, 0, "b"),
        ]
        got = self._run(spark, rows, min_support=1)
        assert got == {"a>b": 1, "b>a": 1}

    def test_nonwitness_middle_not_counted(self, spark):
        # b exists but only BEFORE a and AFTER c's last: no a>b>c
        rows = [
            (1, 1, 0, "b"), (1, 2, 10, "a"),
            (1, 3, 20, "c"), (1, 4, 30, "b"),
        ]
        got = self._run(spark, rows, min_support=1)
        # a>b>c would need a b strictly inside (rank(a)=2, rank(c)=3)
        assert "a>b>c" not in got
        assert got["a>b"] == 1 and got["b>c"] == 1

    def test_guard(self, spark):
        from mindocr_spark.functions.traffic import gsp_patterns

        with pytest.raises(ValueError):
            gsp_patterns(self._ev(spark, []), min_support=0)


class TestBurstWindows:
    def _run(self, spark, rows, **kw):
        from mindocr_spark.functions.traffic import burst_windows

        base = dt.datetime(2024, 1, 1)
        data = [(u, e, base + dt.timedelta(seconds=s), "t", 1.0, "{}")
                for (u, e, s) in rows]
        df = spark.createDataFrame(
            data, "user_id bigint, event_id bigint, ts timestamp_ntz,"
                  " event_type string, value double, props string")
        return {r["user_id"]: r for r in burst_windows(df, **kw).collect()}

    def test_straddling_burst_not_halved(self, spark):
        # 4 events inside [3000, 3000+3600) straddle the [0,3600)/[3600,
        # 7200) tumbling boundary; the anchored window sees all 4
        rows = [(1, i, 3000 + i * 600) for i in range(4)]
        got = self._run(spark, rows)
        assert got[1]["peak"] == 4
        assert got[1]["peak_start"] == dt.datetime(2024, 1, 1, 0, 50)

    def test_window_is_half_open_and_anchor_earliest(self, spark):
        # events at 0, 3599 are inside [0, 3600); 3600 is NOT
        rows = [(1, 1, 0), (1, 2, 3599), (1, 3, 3600)]
        got = self._run(spark, rows)
        assert got[1]["peak"] == 2
        # windows [0,·) and [3599,·) both hold 2 -> earliest anchors
        assert got[1]["peak_start"] == dt.datetime(2024, 1, 1)

    def test_guard(self, spark):
        import pytest as _pytest

        with _pytest.raises(ValueError):
            self._run(spark, [(1, 1, 0)], window_sec=0)


class TestRFM:
    def _run(self, spark, rows, **kw):
        from mindocr_spark.functions.traffic import rfm_scores

        base = dt.datetime(2024, 1, 1)
        data = [(u, e, base + dt.timedelta(seconds=s), "t", float(v),
                 "{}") for (u, e, s, v) in rows]
        df = spark.createDataFrame(
            data, "user_id bigint, event_id bigint, ts timestamp_ntz,"
                  " event_type string, value double, props string")
        return {r["user_id"]: r for r in rfm_scores(df, **kw).collect()}

    def test_axes_and_binning(self, spark):
        # 5 users with strictly ordered recency/frequency/monetary
        rows = []
        for u in range(1, 6):
            for i in range(u):                 # frequency = u
                rows.append((u, u * 100 + i, u * 1000 + i, u * 10.0))
        got = self._run(spark, rows)
        # user 5: most events, newest last event, largest sum -> 5-5-5
        assert got[5]["segment"] == "5-5-5"
        assert got[1]["segment"] == "1-1-1"
        assert got[3]["frequency"] == 3
        assert got[5]["recency_s"] == 0
        assert got[1]["monetary"] == 10.0

    def test_ties_break_on_user_id(self, spark):
        # two identical users: deterministic rank -> different scores
        # when the bin boundary falls between them (n=2, nb=5)
        rows = [(1, 1, 0, 1.0), (2, 2, 0, 1.0)]
        got = self._run(spark, rows)
        assert got[1]["r_score"] == 5 and got[2]["r_score"] == 3
        # frequency identical too: same rule
        assert got[1]["f_score"] == 5 and got[2]["f_score"] == 3

    def test_guard(self, spark):
        import pytest as _pytest

        with _pytest.raises(ValueError):
            self._run(spark, [(1, 1, 0, 1.0)], n_bins=1)

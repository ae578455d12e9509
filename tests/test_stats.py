"""Hand-computed goldens for the nonparametric test family
(functions/stats.py): KS, Mann-Whitney, Mann-Kendall, Benford."""

import math

import pytest
from pyspark.sql import functions as F


class TestKS2Sample:
    def _run(self, spark, a_vals, b_vals, **kw):
        from mindocr_spark.functions.stats import ks_2sample

        rows = [("a", v) for v in a_vals] + [("b", v) for v in b_vals]
        df = spark.createDataFrame(rows, "g string, v bigint")
        return ks_2sample(df, "g", "v", "a", "b", **kw).collect()

    def test_hand_computed_partial_overlap(self, spark):
        # A=[1,2,3,4] B=[3,4,5,6]: sup gap at v=2..4 → d_num=8, d=0.5
        (r,) = self._run(spark, [1, 2, 3, 4], [3, 4, 5, 6])
        assert (r["n_a"], r["n_b"], r["d_num"]) == (4, 4, 8)
        assert r["d"] == 0.5
        assert abs(r["d_crit"] - 1.358 * math.sqrt(8 / 16)) < 1e-12
        assert r["drifted"] is False  # 0.5 < 0.96

    def test_disjoint_samples_drift(self, spark):
        (r,) = self._run(spark, [1, 1, 1, 1], [10, 10, 10, 10])
        assert r["d"] == 1.0
        assert r["drifted"] is True

    def test_identical_samples_zero(self, spark):
        (r,) = self._run(spark, [1, 2, 3], [1, 2, 3])
        assert r["d_num"] == 0 and r["d"] == 0.0
        assert r["drifted"] is False

    def test_empty_side_null_not_crash(self, spark):
        from mindocr_spark.functions.stats import ks_2sample

        df = spark.createDataFrame(
            [("a", 1), ("a", 2)], "g string, v bigint"
        )
        (r,) = ks_2sample(df, "g", "v", "a", "b").collect()
        assert r["n_b"] == 0 and r["d"] is None
        assert r["drifted"] is False

    def test_stratified(self, spark):
        from mindocr_spark.functions.stats import ks_2sample

        rows = (
            [("x", "a", v) for v in [1, 2, 3, 4]]
            + [("x", "b", v) for v in [30, 40, 50, 60]]  # drifts
            + [("y", "a", v) for v in [1, 2, 3, 4]]
            + [("y", "b", v) for v in [1, 2, 3, 4]]      # identical
        )
        df = spark.createDataFrame(rows, "s string, g string, v bigint")
        out = {r["s"]: r for r in
               ks_2sample(df, "g", "v", "a", "b", by=("s",)).collect()}
        assert out["x"]["drifted"] is True
        assert out["y"]["drifted"] is False


class TestRankSum:
    def _run(self, spark, a_vals, b_vals, **kw):
        from mindocr_spark.functions.stats import rank_sum_test

        rows = [("a", v) for v in a_vals] + [("b", v) for v in b_vals]
        df = spark.createDataFrame(rows, "g string, v bigint")
        return rank_sum_test(df, "g", "v", "a", "b", **kw).collect()

    def test_hand_computed_separated(self, spark):
        # A=[1,2,3] B=[4,5,6]: R_a=6 → U_a=0; var=5.25; z≈-1.9640
        (r,) = self._run(spark, [1, 2, 3], [4, 5, 6])
        assert (r["n_a"], r["n_b"], r["u2"]) == (3, 3, 0)
        assert r["u"] == 0.0
        assert r["tie_term"] == 0
        exp_z = (0 - 9) / (2 * math.sqrt(5.25))
        assert abs(r["z"] - exp_z) < 1e-12
        assert r["significant"] is True

    def test_tied_block_average_ranks(self, spark):
        # A=[1,2] B=[2,3]: ranks 1,(2.5,2.5),4 → R_a=3.5 → r2_a=7,
        # u2 = 7 - 2·3 = 1 → U=0.5; tie_term for block of 2 = 6
        (r,) = self._run(spark, [1, 2], [2, 3])
        assert r["u2"] == 1 and r["u"] == 0.5
        assert r["tie_term"] == 6

    def test_all_tied_null_z(self, spark):
        (r,) = self._run(spark, [7, 7], [7, 7])
        assert r["tie_term"] == 60  # 4^3-4
        assert r["z"] is None and r["significant"] is False

    def test_symmetric_samples_z_zero(self, spark):
        (r,) = self._run(spark, [1, 4], [2, 3])
        # U_a = 2 = n_a·n_b/2 exactly → z = 0
        assert r["u2"] == 4 and r["z"] == 0.0
        assert r["significant"] is False


class TestMannKendall:
    def _run(self, spark, xs, **kw):
        from mindocr_spark.functions.stats import mann_kendall_trend

        df = spark.createDataFrame(
            [(i + 1, float(x)) for i, x in enumerate(xs)],
            "p bigint, x double",
        )
        return mann_kendall_trend(df, "p", "x", **kw).collect()

    def test_strictly_increasing(self, spark):
        (r,) = self._run(spark, [1, 2, 3, 4, 5])
        assert r["s_stat"] == 10 and r["tie_term"] == 0
        assert abs(r["var_s"] - 300 / 18) < 1e-12
        assert abs(r["z"] - 9 / math.sqrt(300 / 18)) < 1e-12
        assert r["trend"] == "increasing"
        assert r["sen_slope"] == 1.0

    def test_strictly_decreasing(self, spark):
        (r,) = self._run(spark, [5, 4, 3, 2, 1])
        assert r["s_stat"] == -10
        assert r["trend"] == "decreasing"
        assert r["sen_slope"] == -1.0

    def test_constant_series_no_trend(self, spark):
        (r,) = self._run(spark, [2, 2, 2])
        assert r["s_stat"] == 0
        assert r["var_s"] == 0.0
        assert r["z"] is None and r["trend"] == "none"
        assert r["sen_slope"] == 0.0

    def test_sen_slope_even_pair_median(self, spark):
        # x=[0,1,3] over p=1,2,3: slopes 1, 1.5, 2 → median 1.5
        (r,) = self._run(spark, [0, 1, 3])
        assert r["sen_slope"] == 1.5
        assert r["s_stat"] == 3

    def test_single_period_nulls(self, spark):
        (r,) = self._run(spark, [42])
        assert r["n_periods"] == 1
        assert r["z"] is None and r["sen_slope"] is None
        assert r["trend"] == "none"


class TestBenford:
    def _run(self, spark, vals, **kw):
        from mindocr_spark.functions.stats import benford_first_digit

        df = spark.createDataFrame([(v,) for v in vals], "v bigint")
        return benford_first_digit(df, "v", **kw).collect()

    def test_uniform_digits_flagged(self, spark):
        # 100 of each leading digit: grossly non-Benford
        vals = [d * 100 + k for d in range(1, 10) for k in range(100)]
        rows = {r["digit"]: r for r in self._run(spark, vals)}
        assert len(rows) == 9
        assert all(r["n_obs"] == 100 for r in rows.values())
        assert rows[1]["chi2"] > 15.507
        assert rows[1]["biased"] is True

    def test_benford_conformant_passes(self, spark):
        # counts proportional to log10(1+1/d) (N=1000, rounded):
        # chi2 from rounding error only — far below the fence
        import math as m

        vals = []
        for d in range(1, 10):
            n_d = round(1000 * m.log10(1 + 1 / d))
            vals += [d] * n_d
        rows = self._run(spark, vals)
        assert rows[0]["chi2"] < 1.0
        assert rows[0]["biased"] is False

    def test_zero_count_digit_appears_with_term(self, spark):
        rows = {r["digit"]: r for r in self._run(spark, [1, 1, 1, 2])}
        assert len(rows) == 9
        assert rows[9]["n_obs"] == 0
        # (0 - N·p)²/(N·p) = N·p
        from mindocr_spark.functions.stats import BENFORD_P

        assert abs(rows[9]["chi2_term"] - 4 * BENFORD_P[9]) < 1e-9

    def test_multidigit_leading_digit(self, spark):
        rows = {r["digit"]: r for r in
                self._run(spark, [905, 87, 7, 12345])}
        assert rows[9]["n_obs"] == 1
        assert rows[8]["n_obs"] == 1
        assert rows[7]["n_obs"] == 1
        assert rows[1]["n_obs"] == 1

    def test_nonpositive_excluded(self, spark):
        rows = self._run(spark, [5, 0, -3])
        assert rows[0]["n_total"] == 1


class TestRocAuc:
    def _run(self, spark, pos, neg, **kw):
        from mindocr_spark.functions.stats import roc_auc

        rows = [(True, v) for v in pos] + [(False, v) for v in neg]
        df = spark.createDataFrame(rows, "y boolean, s bigint")
        return roc_auc(df, "y", "s", **kw).collect()

    def test_perfect_separation(self, spark):
        (r,) = self._run(spark, [3, 4], [1, 2])
        assert (r["n_pos"], r["n_neg"], r["u2"]) == (2, 2, 8)
        assert r["auc"] == 1.0 and r["gini"] == 1.0

    def test_symmetric_ties_half(self, spark):
        # pos=[1,2] neg=[1,2]: U+ = 2 ties·0.5 + 1 win = 2 → auc 0.5
        (r,) = self._run(spark, [1, 2], [1, 2])
        assert r["u2"] == 4
        assert r["auc"] == 0.5 and r["gini"] == 0.0

    def test_inverted_scorer_zero(self, spark):
        (r,) = self._run(spark, [1], [2])
        assert r["u2"] == 0
        assert r["auc"] == 0.0 and r["gini"] == -1.0

    def test_empty_class_null(self, spark):
        (r,) = self._run(spark, [1, 2], [])
        assert r["n_neg"] == 0
        assert r["auc"] is None and r["gini"] is None

    def test_hand_computed_overlap(self, spark):
        # pos=[2,3,5] neg=[1,2,4]: wins 2·3-(1+2+3 losses/ties)…
        # pairwise: (2>1)+(2=2:½)+(2<4:0)+(3>1,3>2)+(3<4:0)
        # +(5>1,5>2,5>4) = 6.5 → auc = 6.5/9
        (r,) = self._run(spark, [2, 3, 5], [1, 2, 4])
        assert r["u2"] == 13
        assert abs(r["auc"] - 6.5 / 9) < 1e-15

    def test_stratified(self, spark):
        from mindocr_spark.functions.stats import roc_auc

        rows = [("a", True, 3), ("a", False, 1),
                ("b", True, 1), ("b", False, 3)]
        df = spark.createDataFrame(rows, "g string, y boolean, s bigint")
        out = {r["g"]: r for r in
               roc_auc(df, "y", "s", by=("g",)).collect()}
        assert out["a"]["auc"] == 1.0
        assert out["b"]["auc"] == 0.0


class TestKendallTau:
    def _run(self, spark, xy, **kw):
        from mindocr_spark.functions.stats import kendall_tau

        df = spark.createDataFrame(
            [(int(x), int(y)) for x, y in xy], "x bigint, y bigint"
        )
        return kendall_tau(df, "x", "y", **kw).collect()

    def test_perfect_concordance(self, spark):
        (r,) = self._run(spark, [(1, 1), (2, 2), (3, 3)])
        assert (r["n"], r["n_conc"], r["n_disc"]) == (3, 3, 0)
        assert (r["pairs2"], r["tie2_x"], r["tie2_y"]) == (6, 0, 0)
        assert r["tau"] == 1.0

    def test_perfect_discordance(self, spark):
        (r,) = self._run(spark, [(1, 3), (2, 2), (3, 1)])
        assert r["n_disc"] == 3 and r["tau"] == -1.0

    def test_tied_grid_tau_zero(self, spark):
        # 2x2 balanced grid: C=1, D=1, Tx=Ty=4 → tau = 0 exactly
        (r,) = self._run(spark, [(1, 1), (1, 2), (2, 1), (2, 2)])
        assert (r["n_conc"], r["n_disc"]) == (1, 1)
        assert (r["tie2_x"], r["tie2_y"]) == (4, 4)
        assert r["tau"] == 0.0

    def test_constant_column_null(self, spark):
        (r,) = self._run(spark, [(1, 1), (1, 2), (1, 3)])
        assert r["n_conc"] == 0 and r["n_disc"] == 0
        assert r["tau"] is None

    def test_hand_computed_tau_b(self, spark):
        import math

        # x=[1,1,2,3] y=[1,2,2,3]: C: (1,1)-(2,2) (1,1)-(3,3)
        # (1,2)-(3,3) (2,2)-(3,3) = 4; D = 0; Tx = 2, Ty = 2;
        # tau = 2·4 / sqrt((12-2)(12-2)) = 8/10
        (r,) = self._run(spark, [(1, 1), (1, 2), (2, 2), (3, 3)])
        assert (r["n_conc"], r["n_disc"]) == (4, 0)
        exp = 2.0 * 4 / math.sqrt(10.0 * 10.0)
        assert abs(r["tau"] - exp) < 1e-15

    def test_weighted_cells_multiplicity(self, spark):
        # duplicates multiply: 2 copies of (1,1), 3 of (2,2) → C = 6
        (r,) = self._run(
            spark, [(1, 1)] * 2 + [(2, 2)] * 3
        )
        assert r["n_conc"] == 6 and r["n_disc"] == 0


class TestSpearmanRho:
    def _run(self, spark, xy, **kw):
        from mindocr_spark.functions.stats import spearman_rho

        df = spark.createDataFrame(
            [(int(x), int(y)) for x, y in xy], "x bigint, y bigint"
        )
        return spearman_rho(df, "x", "y", **kw).collect()

    def test_perfect_monotone(self, spark):
        (r,) = self._run(spark, [(1, 10), (2, 20), (3, 35)])
        assert r["n"] == 3 and r["rho"] == 1.0

    def test_perfect_inverse(self, spark):
        (r,) = self._run(spark, [(1, 3), (2, 2), (3, 1)])
        assert r["rho"] == -1.0

    def test_tied_ranks_hand_computed(self, spark):
        import math

        # x=[1,1,2] avg ranks (1.5,1.5,3); y=[1,2,3] ranks (1,2,3)
        # Pearson over ranks = sqrt(3)/2
        (r,) = self._run(spark, [(1, 1), (1, 2), (2, 3)])
        assert abs(r["rho"] - math.sqrt(3) / 2) < 1e-12

    def test_constant_side_null(self, spark):
        (r,) = self._run(spark, [(1, 5), (2, 5), (3, 5)])
        assert r["rho"] is None

    def test_independent_zero(self, spark):
        # balanced 2x2 grid: rank covariance exactly 0
        (r,) = self._run(spark, [(1, 1), (1, 2), (2, 1), (2, 2)])
        assert r["rho"] == 0.0


class TestChi2Independence:
    def _run(self, spark, cells, **kw):
        from mindocr_spark.functions.stats import chi2_independence

        rows = []
        for x, y, c in cells:
            rows += [(x, y)] * c
        df = spark.createDataFrame(rows, "x string, y string")
        return chi2_independence(df, "x", "y", **kw).collect()

    def test_independent_grid_zero(self, spark):
        (r,) = self._run(
            spark,
            [("a", "p", 10), ("a", "q", 10),
             ("b", "p", 10), ("b", "q", 10)],
        )
        assert (r["n"], r["r_levels"], r["c_levels"]) == (40, 2, 2)
        assert r["dof"] == 1
        assert r["chi2"] == 0.0
        assert r["cramers_v"] == 0.0

    def test_perfect_association(self, spark):
        # diagonal 2x2: every e=5, every term (|o-e|=5) -> 4*5 = 20
        (r,) = self._run(
            spark, [("a", "p", 10), ("b", "q", 10)]
        )
        assert r["chi2"] == 20.0
        assert r["cramers_v"] == 1.0

    def test_observed_zero_cell_counted(self, spark):
        # (b,q) never observed: its expected 4*4/12 still contributes
        # terms: 1/3 + 2/3 + 2/3 + 4/3 = 3 (each 9dp-quantized)
        (r,) = self._run(
            spark, [("a", "p", 4), ("a", "q", 4), ("b", "p", 4)]
        )
        assert r["n"] == 12
        assert abs(r["chi2"] - 3.0) < 2e-9
        assert r["dof"] == 1

    def test_single_level_side_dof_zero(self, spark):
        (r,) = self._run(spark, [("a", "p", 5), ("a", "q", 7)])
        assert r["dof"] == 0
        assert r["chi2"] == 0.0
        assert r["cramers_v"] is None

    def test_stratified(self, spark):
        from mindocr_spark.functions.stats import chi2_independence

        rows = (
            [("s1", "a", "p")] * 10 + [("s1", "b", "q")] * 10
            + [("s2", "a", "p")] * 5 + [("s2", "a", "q")] * 5
            + [("s2", "b", "p")] * 5 + [("s2", "b", "q")] * 5
        )
        df = spark.createDataFrame(rows, "s string, x string, y string")
        out = {
            r["s"]: r
            for r in chi2_independence(
                df, "x", "y", by=("s",)
            ).collect()
        }
        assert out["s1"]["cramers_v"] == 1.0
        assert out["s2"]["chi2"] == 0.0


class TestPsiDrift:
    def _run(self, spark, a_buckets, b_buckets, **kw):
        from mindocr_spark.functions.stats import psi_drift

        rows = [("a", b) for b in a_buckets] + [
            ("b", b) for b in b_buckets
        ]
        df = spark.createDataFrame(rows, "g string, b bigint")
        return psi_drift(df, "g", "b", "a", "b", **kw).collect()

    def test_identical_distributions_zero(self, spark):
        (r,) = self._run(
            spark, [1] * 8 + [2] * 2, [1] * 8 + [2] * 2
        )
        assert (r["n_a"], r["n_b"], r["n_buckets"]) == (10, 10, 2)
        assert r["psi"] == 0.0
        assert r["drifted"] is False

    def test_hand_computed_swap(self, spark):
        import math

        # a: 8/2, b: 2/8 over two buckets; Laplace 0.5 smoothing,
        # k=2: p=(c+0.5)/11 -> both terms (6/11)*ln(8.5/2.5)
        (r,) = self._run(
            spark, [1] * 8 + [2] * 2, [1] * 2 + [2] * 8
        )
        term = round((6.0 / 11.0) * math.log(8.5 / 2.5), 9)
        assert abs(r["psi"] - 2 * term) < 1e-12
        assert r["drifted"] is True

    def test_one_sided_bucket_finite(self, spark):
        (r,) = self._run(spark, [1] * 5 + [3] * 5, [1] * 10)
        assert r["n_buckets"] == 2
        assert r["psi"] is not None and math_isfinite(r["psi"])

    def test_empty_side_null(self, spark):
        from mindocr_spark.functions.stats import psi_drift

        df = spark.createDataFrame(
            [("a", 1), ("a", 2)], "g string, b bigint"
        )
        (r,) = psi_drift(df, "g", "b", "a", "b").collect()
        assert r["psi"] is None
        assert r["drifted"] is False

    def test_stratified_planted(self, spark):
        from mindocr_spark.functions.stats import psi_drift

        rows = (
            [("x", "a", 1)] * 9 + [("x", "a", 2)] * 1
            + [("x", "b", 1)] * 1 + [("x", "b", 2)] * 9
            + [("y", "a", 1)] * 5 + [("y", "a", 2)] * 5
            + [("y", "b", 1)] * 5 + [("y", "b", 2)] * 5
        )
        df = spark.createDataFrame(
            rows, "s string, g string, b bigint"
        )
        out = {
            r["s"]: r
            for r in psi_drift(
                df, "g", "b", "a", "b", by=("s",)
            ).collect()
        }
        assert out["x"]["drifted"] is True
        assert out["y"]["drifted"] is False


def math_isfinite(v):
    import math

    return math.isfinite(v)


class TestCusumChangepoint:
    def _run(self, spark, xs, **kw):
        from mindocr_spark.functions.stats import cusum_changepoint

        rows = [(i + 1, int(x)) for i, x in enumerate(xs)]
        df = spark.createDataFrame(rows, "p bigint, x bigint")
        return cusum_changepoint(df, "p", "x", **kw).collect()

    def test_hand_computed_step(self, spark):
        # [0,0,0,10,10,10]: S'_t = 6*cum - 30t peaks |.|=90 at t=3
        (r,) = self._run(spark, [0, 0, 0, 10, 10, 10])
        assert (r["n_periods"], r["total"]) == (6, 30)
        assert r["cp_period"] == 3 and r["t_before"] == 3
        assert r["s_abs_max"] == 90
        assert r["cusum_stat"] == 15.0
        assert r["mean_before"] == 0.0
        assert r["mean_after"] == 10.0
        assert r["delta"] == 10.0
        assert r["shifted"] is True

    def test_constant_series_no_shift(self, spark):
        (r,) = self._run(spark, [7, 7, 7, 7])
        assert r["s_abs_max"] == 0
        assert r["cp_period"] is None
        assert r["mean_before"] is None
        assert r["shifted"] is False

    def test_tie_earliest_period(self, spark):
        # [0,5,10]: |S'| = 15 at t=1 AND t=2; earliest wins
        (r,) = self._run(spark, [0, 5, 10])
        assert r["cp_period"] == 1
        assert r["mean_before"] == 0.0
        assert r["mean_after"] == 7.5

    def test_min_abs_delta_gate(self, spark):
        (r,) = self._run(spark, [0, 0, 1, 1], min_abs_delta=5.0)
        assert r["cp_period"] == 2
        assert r["delta"] == 1.0
        assert r["shifted"] is False

    def test_last_period_never_wins(self, spark):
        # rising last value alone: S'_n is identically 0
        (r,) = self._run(spark, [5, 5, 5, 20])
        assert r["t_before"] == 3

    def test_stratified(self, spark):
        from mindocr_spark.functions.stats import cusum_changepoint

        rows = [("u", i + 1, v) for i, v in enumerate([1, 1, 9, 9])]
        rows += [("v", i + 1, 4) for i in range(4)]
        df = spark.createDataFrame(
            rows, "s string, p bigint, x bigint"
        )
        out = {
            r["s"]: r
            for r in cusum_changepoint(
                df, "p", "x", by=("s",), min_abs_delta=2.0
            ).collect()
        }
        assert out["u"]["cp_period"] == 2 and out["u"]["shifted"]
        assert out["v"]["shifted"] is False

    def test_fractional_series_not_truncated(self, spark):
        # a 0.1 -> 0.9 quality-rate shift must be found, not silently
        # truncated to zeros (values are 6dp-quantized DECIMAL)
        from mindocr_spark.functions.stats import cusum_changepoint

        rows = [(i + 1, v) for i, v in
                enumerate([0.1, 0.1, 0.1, 0.9, 0.9, 0.9])]
        df = spark.createDataFrame(rows, "p bigint, x double")
        (r,) = cusum_changepoint(
            df, "p", "x", min_abs_delta=0.5
        ).collect()
        assert r["cp_period"] == 3
        assert abs(r["mean_before"] - 0.1) < 1e-9
        assert abs(r["mean_after"] - 0.9) < 1e-9
        assert r["shifted"] is True

    def test_empty_input_no_phantom_row(self, spark):
        from mindocr_spark.functions.stats import cusum_changepoint

        df = spark.createDataFrame([], "p bigint, x bigint")
        assert cusum_changepoint(df, "p", "x").count() == 0

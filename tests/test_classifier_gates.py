"""Blockword gate + hashed-linear quality classifier goldens."""

import hashlib

import pytest


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id bigint, text string")


class TestBlockwords:
    def test_whole_word_matching_and_counts(self, spark):
        from mindocr_spark.functions.text import blockword_flags

        rows = [
            (1, "the casino is open"),        # hit
            (2, "casinos are plural"),        # no hit: \b(casino)\b
            (3, "CASINO in caps and casino"),  # two hits via lower()
            (4, "clean text here"),
        ]
        out = {r["doc_id"]: r for r in blockword_flags(
            _docs(spark, rows), ("casino", "jackpot")
        ).collect()}
        assert len(out) == 4  # flag-style: nothing vanishes
        assert out[1]["n_blockword_hits"] == 1 and out[1]["has_blockword"]
        assert out[2]["n_blockword_hits"] == 0
        assert out[3]["n_blockword_hits"] == 2
        assert not out[4]["has_blockword"]

    def test_longer_word_wins_over_prefix(self, spark):
        from mindocr_spark.functions.text import blockword_flags

        # 'spam' is a prefix of 'spammer': alternation is length-sorted
        # so 'spammer' matches as ONE hit, not as 'spam' + tail
        out = blockword_flags(
            _docs(spark, [(1, "a spammer spams spam")]),
            ("spam", "spammer"),
        ).collect()[0]
        assert out["n_blockword_hits"] == 2  # 'spammer' + bare 'spam'

    def test_regex_metachars_escaped(self, spark):
        from mindocr_spark.functions.text import blockword_flags

        out = blockword_flags(
            _docs(spark, [(1, "price is $9.99 today"), (2, "price is 9X99")]),
            ("9.99",),
        ).collect()
        got = {r["doc_id"]: r["n_blockword_hits"] for r in out}
        # the dot must be literal: 9X99 may not match
        assert got[1] == 1 and got[2] == 0

    def test_empty_list_rejected(self, spark):
        from mindocr_spark.functions.text import blockword_pattern

        with pytest.raises(ValueError):
            blockword_pattern(())


class TestQualityClassifier:
    def test_score_matches_straight_line_reference(self, spark):
        from mindocr_spark.functions.classifier import (
            hashed_weights, quality_classifier_score,
        )

        w = {b: float(wt) for b, wt in hashed_weights()}
        rows = [(1, "alpha beta gamma"), (2, "delta"), (3, "alpha alpha")]
        out = {r["doc_id"]: r for r in quality_classifier_score(
            _docs(spark, rows)
        ).collect()}
        for doc_id, text in rows:
            toks = text.split()
            expect = sum(
                w[hashlib.md5(t.encode()).hexdigest()[:2]] for t in toks
            )
            r = out[doc_id]
            assert r["n_tokens"] == len(toks)
            assert float(r["logit_sum"]) == pytest.approx(expect, abs=1e-9)
            assert float(r["score"]) == pytest.approx(
                expect / len(toks), rel=1e-12
            )
            assert r["keep"] == (float(r["score"]) >= 0.0)

    def test_zero_token_doc_scores_null_keep_false(self, spark):
        from mindocr_spark.functions.classifier import (
            quality_classifier_score,
        )

        out = {r["doc_id"]: r for r in quality_classifier_score(
            _docs(spark, [(1, "ok text"), (2, "   ")])
        ).collect()}
        assert len(out) == 2
        assert out[2]["score"] is None and out[2]["keep"] is False
        assert float(out[2]["logit_sum"]) == 0.0

    def test_injected_weights_override_stub(self, spark):
        """The weight table is the model seam: injecting all-positive
        weights must flip every doc to keep."""
        from mindocr_spark.functions.classifier import (
            N_BUCKETS, quality_classifier_score,
        )

        weights = [(format(i, "02x"), "1.000") for i in range(N_BUCKETS)]
        rows = quality_classifier_score(
            _docs(spark, [(1, "x y z"), (2, "q")]), weights=weights
        ).collect()
        assert all(r["keep"] for r in rows)
        assert all(float(r["score"]) == 1.0 for r in rows)

    def test_plan_broadcasts_weights_no_python(self, spark):
        from mindocr_spark.functions.classifier import (
            quality_classifier_score,
        )

        plan = quality_classifier_score(
            _docs(spark, [(1, "a b")])
        )._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastHashJoin" in plan
        assert "BatchEvalPython" not in plan and "PythonUDF" not in plan


def test_blockword_punctuation_edged_entries_still_match(spark):
    """Entries starting/ending in non-word chars must not get a dead
    \\b anchor: 'a$$' has no word boundary before a space."""
    from mindocr_spark.functions.text import blockword_flags

    rows = [(1, "win big a$$ here"), (2, "class beginning"), (3, "$$$ cash")]
    out = {r["doc_id"]: r["n_blockword_hits"] for r in blockword_flags(
        _docs(spark, rows), ("a$$", "$$$")
    ).collect()}
    assert out[1] == 1      # punctuation-tailed entry fires
    assert out[2] == 0      # 'a$$' must not match inside 'class' (\b holds)
    assert out[3] == 1      # all-punctuation entry fires


def test_classifier_rejects_empty_weight_table(spark):
    from mindocr_spark.functions.classifier import quality_classifier_score

    with pytest.raises(ValueError):
        quality_classifier_score(_docs(spark, [(1, "x")]), weights=[])


class TestDsirWeights:
    def test_target_docs_score_higher(self, spark):
        from pyspark.sql import functions as F
        from mindocr_spark.functions.classifier import dsir_logweights

        # target slice shares vocabulary; raw slice is disjoint — every
        # target-vocab bigram must carry positive lambda and vice versa
        rows = [
            (1, "en", "the quick brown fox jumps over it"),
            (2, "en", "the quick brown dog runs over it"),
            (3, "de", "der schnelle braune fuchs springt darüber hin"),
            (4, "de", "der schnelle braune hund läuft darüber hin"),
            (5, "en", "the quick brown fox jumps over it"),
        ]
        df = spark.createDataFrame(
            rows, "doc_id bigint, lang string, text string"
        )
        out = {r["doc_id"]: r for r in dsir_logweights(
            df, target=F.col("lang") == "en"
        ).collect()}
        assert out[1]["avg_logweight"] > 0 > out[3]["avg_logweight"]
        # identical text → identical weight (pure function of content)
        assert out[1]["logweight"] == out[5]["logweight"]

    def test_short_docs_null_not_dropped(self, spark):
        from pyspark.sql import functions as F
        from mindocr_spark.functions.classifier import dsir_logweights

        df = spark.createDataFrame(
            [(1, "en", "one"), (2, "en", ""), (3, "de", "a b")],
            "doc_id bigint, lang string, text string",
        )
        out = {r["doc_id"]: r for r in dsir_logweights(
            df, target=F.col("lang") == "en"
        ).collect()}
        assert set(out) == {1, 2, 3}
        assert out[1]["n_grams"] == 0 and out[1]["logweight"] is None
        assert out[2]["n_grams"] == 0
        assert out[3]["n_grams"] == 1

    def test_lambda_table_is_broadcast(self, spark):
        from pyspark.sql import functions as F
        from mindocr_spark.functions.classifier import dsir_logweights

        df = spark.read.parquet(
            "/root/testdata/sf0.001/documents.parquet"
        ).select("doc_id", "lang", "text")
        plan = (
            dsir_logweights(df, target=F.col("lang") == "en")
            ._jdf.queryExecution().executedPlan().toString()
        )
        assert "BroadcastHashJoin" in plan
        assert "BatchEvalPython" not in plan


class TestDsirNullTarget:
    def test_null_verdict_lands_in_raw_remainder(self, spark):
        from pyspark.sql import functions as F
        from mindocr_spark.functions.classifier import dsir_logweights

        # NULL lang → NULL target verdict; those grams must count in
        # the raw distribution (coalesce False), not vanish from both
        df = spark.createDataFrame(
            [(1, "en", "good clean text here"),
             (2, None, "noisy spam junk words"),
             (3, "de", "noisy spam junk words")],
            "doc_id bigint, lang string, text string",
        )
        out_null = {r["doc_id"]: r for r in dsir_logweights(
            df, target=F.col("lang") == "en").collect()}
        # doc 2 (NULL lang) must score identically to doc 3 (raw):
        # same text, same side of the distribution
        assert out_null[2]["logweight"] == out_null[3]["logweight"]
        assert out_null[2]["n_grams"] == 3


class TestQuantileGate:
    def test_keeps_exact_top_fraction(self, spark):
        from mindocr_spark.functions.classifier import quantile_gate

        df = spark.createDataFrame(
            [(i, float(i)) for i in range(1, 11)],
            "doc_id bigint, score double",
        )
        out = quantile_gate(df, keep_frac=0.6).collect()
        kept = {r["doc_id"] for r in out if r["keep"]}
        # threshold = quantile 0.4 of 1..10 = 1 + 9*0.4 = 4.6 → keep 5..10
        assert kept == {5, 6, 7, 8, 9, 10}
        assert out[0]["threshold"] == 4.6

    def test_null_scores_ride_along_not_kept(self, spark):
        from mindocr_spark.functions.classifier import quantile_gate

        df = spark.createDataFrame(
            [(1, 1.0), (2, None), (3, 3.0)],
            "doc_id bigint, score double",
        )
        got = {r["doc_id"]: r for r in
               quantile_gate(df, keep_frac=0.5).collect()}
        assert set(got) == {1, 2, 3}  # flag-style: no row vanishes
        assert got[2]["keep"] is False
        # threshold from non-NULL scores only: quantile 0.5 of [1,3]=2
        assert got[2]["threshold"] == 2.0

    def test_bad_fraction_raises(self, spark):
        import pytest as _pytest
        from mindocr_spark.functions.classifier import quantile_gate

        df = spark.createDataFrame([(1, 1.0)], "doc_id bigint, score double")
        with _pytest.raises(ValueError):
            quantile_gate(df, keep_frac=0.0)
        with _pytest.raises(ValueError):
            quantile_gate(df, keep_frac=1.5)


class TestNaiveBayes:
    """In-corpus trained NB: hand-computed model recovery, OOV
    defaults, tie rule, guards."""

    def _score(self, spark, rows, classes=("a", "b")):
        from pyspark.sql import functions as F

        from mindocr_spark.functions.classifier import nb_train_score

        df = spark.createDataFrame(
            rows, "doc_id bigint, text string, lbl string"
        )
        out = nb_train_score(df, F.col("lbl"), classes)
        return {r["doc_id"]: r for r in out.collect()}

    def test_hand_computed_model(self, spark):
        import math

        out = self._score(
            spark,
            [(1, "x x y", "a"), (2, "y z", "b"), (3, "x y", None)],
        )
        # V=3, tot_a=3, tot_b=2, priors ln((1+1)/(2+2)) both.
        q = lambda v: round(v, 9)
        prior = q(math.log(2 / 4))
        sa = prior + q(math.log(3 / 6)) + q(math.log(2 / 6))
        sb = prior + q(math.log(1 / 5)) + q(math.log(2 / 5))
        r = out[3]
        assert r["train_label"] is None
        assert abs(r["score_a"] - sa) < 1e-12
        assert abs(r["score_b"] - sb) < 1e-12
        assert r["pred"] == ("a" if sa >= sb else "b")

    def test_planted_class_recovery(self, spark):
        rows = []
        for i in range(40):
            marker = "spam spam offer" if i % 2 == 0 else "study cite data"
            lbl = ("a" if i % 2 == 0 else "b") if i < 20 else None
            rows.append((i, f"common words here {marker}", lbl))
        out = self._score(spark, rows)
        for i in range(20, 40):
            assert out[i]["pred"] == ("a" if i % 2 == 0 else "b"), i

    def test_oov_uses_default_not_null(self, spark):
        import math

        out = self._score(
            spark,
            [(1, "x", "a"), (2, "y", "b"), (3, "zz", None)],
        )
        # zz unseen: score = prior + ln(1/(tot_c + V)); V=2, tots 1,1.
        q = lambda v: round(v, 9)
        want = q(math.log(2 / 4)) + q(math.log(1 / 3))
        assert abs(out[3]["score_a"] - want) < 1e-12
        assert abs(out[3]["score_b"] - want) < 1e-12
        assert out[3]["pred"] == "a"  # tie -> first class wins

    def test_empty_doc_scores_priors(self, spark):
        out = self._score(
            spark,
            [(1, "x", "a"), (2, "y", "b"), (3, "y", "b"), (4, "", None)],
        )
        r = out[4]
        assert r["n_tokens"] == 0
        # priors: a=(1+1)/(3+2), b=(2+1)/(3+2) -> b more probable
        assert r["pred"] == "b"
        assert r["score_b"] > r["score_a"]

    def test_guards(self, spark):
        import pytest as _pytest

        from pyspark.sql import functions as F

        from mindocr_spark.functions.classifier import nb_train_score

        df = spark.createDataFrame([(1, "x", "a")],
                                   "doc_id bigint, text string, lbl string")
        with _pytest.raises(ValueError):
            nb_train_score(df, F.col("lbl"), ("only",))
        with _pytest.raises(ValueError):
            nb_train_score(df, F.col("lbl"), ("a", "a"))

    def test_no_python_udfs(self, spark):
        from pyspark.sql import functions as F

        from mindocr_spark.functions.classifier import nb_train_score

        df = spark.createDataFrame([(1, "x", "a"), (2, "y", "b")],
                                   "doc_id bigint, text string, lbl string")
        plan = nb_train_score(df, F.col("lbl"), ("a", "b")) \
            ._jdf.queryExecution().executedPlan().toString()
        assert "BatchEvalPython" not in plan


class TestGateAgreement:
    def _run(self, spark, rows):
        from mindocr_spark.functions.classifier import gate_agreement

        df = spark.createDataFrame(
            rows, "lang string, a boolean, b boolean"
        )
        return {r["lang"]: r for r in
                gate_agreement(df, "a", "b").collect()}

    def test_hand_computed_kappa(self, spark):
        # confusion: bk=4 bd=3 oa=2 ob=1, n=10
        rows = ([("en", True, True)] * 4 + [("en", False, False)] * 3
                + [("en", True, False)] * 2 + [("en", False, True)])
        r = self._run(spark, rows)["en"]
        assert (r["both_keep"], r["both_drop"], r["only_a"], r["only_b"]) \
            == (4, 3, 2, 1)
        p_o = 7 / 10
        p_e = (6 * 5 + 4 * 5) / 100
        assert r["p_o"] == p_o and r["p_e"] == p_e
        assert r["kappa"] == (p_o - p_e) / (1 - p_e)

    def test_perfect_agreement_is_one(self, spark):
        rows = [("en", True, True)] * 3 + [("en", False, False)] * 2
        assert self._run(spark, rows)["en"]["kappa"] == 1.0

    def test_degenerate_marginals_null(self, spark):
        # both gates constant-keep: p_e = 1, kappa undefined
        r = self._run(spark, [("en", True, True)] * 5)["en"]
        assert r["p_e"] == 1.0 and r["kappa"] is None

    def test_null_verdicts_excluded(self, spark):
        rows = [("en", True, True), ("en", None, True),
                ("en", True, None), ("en", False, False)]
        r = self._run(spark, rows)["en"]
        assert r["n"] == 2 and r["kappa"] == 1.0

    def test_independent_gates_near_zero(self, spark):
        # a and b statistically independent by construction:
        # every (a,b) cell equally filled → kappa exactly 0
        rows = [("en", x, y) for x in (True, False)
                for y in (True, False) for _ in range(5)]
        assert self._run(spark, rows)["en"]["kappa"] == 0.0


class TestCalibrationEce:
    def _run(self, spark, rows, bins=10):
        from mindocr_spark.functions.classifier import calibration_ece

        df = spark.createDataFrame(rows, "p double, y boolean")
        out = calibration_ece(df, "p", "y", bins=bins).collect()
        return {r["bin"]: r for r in out}

    def test_perfectly_calibrated_bin(self, spark):
        # bin 7: 4 preds at 0.75, 3 positive → conf 0.75, acc 0.75
        rows = [(0.75, True)] * 3 + [(0.75, False)]
        out = self._run(spark, rows)
        r = out[7]
        assert r["n_bin"] == 4 and r["n_pos"] == 3
        assert r["mean_conf"] == 0.75 and r["accuracy"] == 0.75
        assert r["abs_gap"] == 0.0 and r["ece"] == 0.0

    def test_ece_weighted_by_bin_size(self, spark):
        # bin 0: 1 pred at 0.0 actually positive (gap 1.0)
        # bin 9: 3 preds at 1.0 all positive (gap 0.0)
        rows = [(0.0, True)] + [(1.0, True)] * 3
        out = self._run(spark, rows)
        assert out[0]["abs_gap"] == 1.0
        assert out[9]["abs_gap"] == 0.0
        assert out[0]["ece"] == 0.25  # 1*1.0/4

    def test_prob_one_lands_in_last_bin(self, spark):
        out = self._run(spark, [(1.0, True)])
        assert list(out) == [9]

    def test_nulls_excluded(self, spark):
        rows = [(0.5, True), (None, True), (0.5, None)]
        out = self._run(spark, rows)
        assert out[5]["n_bin"] == 1

    def test_bins_guard(self, spark):
        import pytest as _pytest

        from mindocr_spark.functions.classifier import calibration_ece

        df = spark.createDataFrame([(0.5, True)], "p double, y boolean")
        with _pytest.raises(ValueError):
            calibration_ece(df, "p", "y", bins=1)

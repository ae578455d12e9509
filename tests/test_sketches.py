"""Sketch aggregations: HLL++ approximate distinct accuracy.

The driver-facing query surface (q_approx_distinct) now exposes only
engine-portable columns (exact counts + the within_tol accuracy
verdict); the raw sketch value and its error envelope are asserted
here against a direct approx_count_distinct aggregation.
"""


def test_approx_distinct_within_error(spark, sf_dir):
    import __spark_entry__ as E
    from pyspark.sql import functions as F

    events = spark.read.parquet(f"{sf_dir}/events.parquet")
    approx = {
        r["event_type"]: r["approx_users"]
        for r in events.groupBy("event_type")
        .agg(F.approx_count_distinct("user_id", rsd=0.02).alias("approx_users"))
        .collect()
    }
    exact = {
        r["event_type"]: r["n"]
        for r in events.groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    assert set(approx) == set(exact)
    for et, n in exact.items():
        assert abs(approx[et] - n) <= max(2, 0.1 * n), (et, approx[et], n)

    # and the oracle-checked surface must agree with the exact counts
    # and report the sketch inside its tolerance
    rows = E.q_approx_distinct(spark, sf_dir).collect()
    assert {r["event_type"]: r["exact_users"] for r in rows} == exact
    assert all(r["within_tol"] for r in rows)


class TestKmvDistinct:
    def _df(self, spark, vals):
        return spark.createDataFrame(
            [("g", v) for v in vals], "grp string, v long"
        )

    def test_saturated_group_is_exact(self, spark):
        from mindocr_spark.functions.sketches import kmv_distinct

        out = kmv_distinct(
            self._df(spark, list(range(10)) * 3), "grp", "v", k=64
        ).collect()
        (r,) = out
        assert r["distinct_hashes"] == 10 and r["n_kept"] == 10
        assert r["kmv_estimate"] == 10.0 and r["abs_rel_err"] == 0.0

    def test_estimator_within_five_rsd(self, spark):
        from mindocr_spark.functions.sketches import kmv_distinct

        n, k = 5000, 64
        (r,) = kmv_distinct(
            self._df(spark, range(n)), "grp", "v", k=k
        ).collect()
        assert r["n_kept"] == k
        rsd = 1.0 / (k - 2) ** 0.5
        assert abs(r["kmv_estimate"] - n) <= 5 * rsd * n

    def test_split_union_merge_identical(self, spark):
        # KMV is mergeable: sketching the union of two halves must be
        # bit-identical to sketching the whole (determinism + the
        # union→k-smallest merge rule)
        from mindocr_spark.functions.sketches import kmv_distinct

        whole = self._df(spark, range(1000))
        halves = self._df(spark, range(500)).unionAll(
            self._df(spark, range(500, 1000))
        )
        a = kmv_distinct(whole, "grp", "v", k=16).collect()
        b = kmv_distinct(halves, "grp", "v", k=16).collect()
        assert a == b

    def test_nulls_ignored(self, spark):
        from mindocr_spark.functions.sketches import kmv_distinct

        df = spark.createDataFrame(
            [("g", 1), ("g", None), ("g", 2)], "grp string, v long"
        )
        (r,) = kmv_distinct(df, "grp", "v", k=8).collect()
        assert r["distinct_hashes"] == 2

    def test_k_guard(self, spark):
        import pytest as _pytest

        from mindocr_spark.functions.sketches import kmv_distinct

        with _pytest.raises(ValueError):
            kmv_distinct(self._df(spark, [1]), "grp", "v", k=1)


class TestCmsCounts:
    def _run(self, spark, vals, probes, depth=4, width=1024):
        from mindocr_spark.functions.sketches import cms_counts

        df = spark.createDataFrame([(v,) for v in vals], "tok string")
        out = cms_counts(df, "tok", probes, depth=depth, width=width)
        return {r["probe"]: r for r in out.collect()}

    def test_wide_sketch_is_exact(self, spark):
        vals = ["a"] * 5 + ["b"] * 3 + ["c"]
        out = self._run(spark, vals, ("a", "b", "c", "absent"))
        assert out["a"]["cms_estimate"] == 5
        assert out["b"]["cms_estimate"] == 3
        assert out["absent"]["exact_count"] == 0
        for r in out.values():
            assert r["overestimate"] == 0

    def test_one_sided_error_invariant(self, spark):
        # width 2: heavy collisions — estimate must NEVER undercount
        vals = [f"v{i}" for i in range(40)] * 2 + ["hot"] * 10
        out = self._run(spark, vals, ("hot", "v0", "nope"),
                        depth=2, width=2)
        for r in out.values():
            assert r["cms_estimate"] >= r["exact_count"]
        assert out["hot"]["exact_count"] == 10

    def test_merge_by_cellwise_addition(self, spark):
        # TRUE mergeability: counters(A ∪ B) == cell-wise sum of
        # counters(A) + counters(B), for two genuinely different
        # streams (a union-of-the-same-list comparison can never fail)
        from pyspark.sql import functions as F

        from mindocr_spark.functions.sketches import cms_counters

        stream_a = [f"w{i % 7}" for i in range(60)]
        stream_b = [f"x{i % 5}" for i in range(40)] + ["w0"] * 3

        def mk(vals):
            return spark.createDataFrame([(v,) for v in vals],
                                         "tok string")

        whole = cms_counters(mk(stream_a + stream_b), "tok", width=8)
        ca = cms_counters(mk(stream_a), "tok", width=8)
        cb = cms_counters(mk(stream_b), "tok", width=8)
        merged = (
            ca.withColumnRenamed("c", "ca")
            .join(cb.withColumnRenamed("c", "cb"), ["r", "pos"],
                  "full_outer")
            .select(
                "r", "pos",
                (F.coalesce("ca", F.lit(0)) + F.coalesce("cb", F.lit(0)))
                .cast("bigint").alias("c"),
            )
        )
        as_map = lambda df: {  # noqa: E731
            (r["r"], r["pos"]): r["c"] for r in df.collect()
        }
        w, m = as_map(whole), as_map(merged)
        assert w == m
        assert len(w) > 1
        # and the streams really differ: A-only cells exist in ca
        assert as_map(ca) != as_map(cb)

    def test_guards(self, spark):
        import pytest as _pytest

        from mindocr_spark.functions.sketches import cms_counts

        df = spark.createDataFrame([("x",)], "tok string")
        with _pytest.raises(ValueError):
            cms_counts(df, "tok", ("x",), depth=0)
        with _pytest.raises(ValueError):
            cms_counts(df, "tok", ())


class TestDDSketch:
    def test_thresholds_exact_geometric_floor(self):
        from mindocr_spark.functions.sketches import dd_thresholds

        ts = dd_thresholds(max_value=1000)
        assert ts[0] == 1
        # strictly increasing, each step is max(+1, ·9//8)
        for a, b in zip(ts, ts[1:]):
            assert b == max(a + 1, a * 9 // 8)
        assert ts[-1] > 1000

    def test_known_quantiles_bracketed(self, spark):
        from mindocr_spark.functions.sketches import ddsketch_quantiles

        rows = [("g", v) for v in range(1, 101)]  # 1..100
        df = spark.createDataFrame(rows, "grp string, v long")
        got = {r["q"]: r for r in
               ddsketch_quantiles(df, "grp", "v").collect()}
        assert set(got) == {0.5, 0.9, 0.99}
        assert got[0.5]["exact_val"] == 50   # ceil(0.5*100) = rank 50
        assert got[0.9]["exact_val"] == 90
        assert got[0.99]["exact_val"] == 99
        for r in got.values():
            assert r["in_bounds"]
            assert r["est_lo"] <= r["exact_val"] <= r["est_hi"]
            # relative-error guarantee: hi/lo ≤ γ = 9/8 (integer floor)
            assert r["est_hi"] + 1 <= max(r["est_lo"] + 1,
                                          r["est_lo"] * 9 // 8)

    def test_sketch_is_mergeable(self, spark):
        """The (grp, bucket) count table IS the sketch: building it on
        two disjoint shards and summing counts equals building it on
        the union — partial aggregation performs the merge."""
        from pyspark.sql import functions as F

        from mindocr_spark.functions.sketches import dd_thresholds

        ts = dd_thresholds()
        arr = F.array(*[F.lit(t) for t in ts])
        bucket = F.size(F.filter(arr, lambda t: t <= F.col("v")))

        def sketch(df):
            return {
                (r["grp"], r["b"]): r["c"]
                for r in df.select("grp", bucket.alias("b"))
                .groupBy("grp", "b").agg(F.count("*").alias("c"))
                .collect()
            }

        rows = [("g", 7 * i % 997 + 1) for i in range(400)]
        df = spark.createDataFrame(rows, "grp string, v long")
        a, b2 = df.where(F.col("v") % 2 == 0), df.where(F.col("v") % 2 == 1)
        sa, sb, whole = sketch(a), sketch(b2), sketch(df)
        merged = dict(sa)
        for k, v in sb.items():
            merged[k] = merged.get(k, 0) + v
        assert merged == whole

    def test_exact_rational_rank_at_ieee_boundary(self, spark):
        """n = 500, q = 9/10: IEEE 0.9*500 = 450.0000…01 would ceil to
        451; the rational rank must be exactly 450."""
        from mindocr_spark.functions.sketches import ddsketch_quantiles

        rows = [("g", v) for v in range(1, 501)]
        df = spark.createDataFrame(rows, "grp string, v long")
        got = {r["q"]: r["exact_val"]
               for r in ddsketch_quantiles(df, "grp", "v").collect()}
        assert got[0.9] == 450


class TestHLL:
    def _run(self, spark, rows):
        from mindocr_spark.functions.sketches import hll_distinct

        df = spark.createDataFrame(rows, "g string, v bigint")
        return {r["g"]: r for r in hll_distinct(df, "g", "v").collect()}

    def test_accuracy_within_sigma_band(self, spark):
        # n = 5000 distinct >> 2.5m: the standard estimator branch;
        # σ = 1.04/√64 ≈ 13% — assert a generous 3σ band
        rows = [("g", v) for v in range(5000)]
        got = self._run(spark, rows)["g"]
        assert got["n_exact"] == 5000
        assert got["abs_rel_err"] < 0.39
        assert got["v_empty"] == 0

    def test_duplicates_do_not_move_registers(self, spark):
        a = self._run(spark, [("g", v) for v in range(300)])["g"]
        b = self._run(spark, [("g", v % 300) for v in range(3000)])["g"]
        assert (a["s_int"], a["max_rank"], a["hll_estimate"]) == \
            (b["s_int"], b["max_rank"], b["hll_estimate"])

    def test_merge_is_register_max(self, spark):
        """Sketch state of A ∪ B equals register-wise max of the two
        sketches — the partial-agg-is-the-merge property, checked via
        the reduced (s_int, max_rank) state."""
        from mindocr_spark.functions.sketches import hll_distinct

        rows_a = [("g", v) for v in range(0, 400)]
        rows_b = [("g", v) for v in range(200, 600)]
        u = self._run(spark, rows_a + rows_b)["g"]
        direct = self._run(
            spark, list(dict.fromkeys(rows_a + rows_b)))["g"]
        assert (u["s_int"], u["max_rank"]) == \
            (direct["s_int"], direct["max_rank"])


class TestSketchKSDrift:
    def _run(self, spark, rows):
        from pyspark.sql import functions as F

        from mindocr_spark.functions.sketches import sketch_ks_drift

        df = spark.createDataFrame(rows, "g string, v bigint, h int")
        return {r["g"]: r for r in sketch_ks_drift(
            df, "g", "v", F.col("h") == 1).collect()}

    def test_identical_halves_zero_drift(self, spark):
        rows = [("g", v, h) for v in (10, 50, 200, 900) for h in (0, 1)]
        got = self._run(spark, rows)["g"]
        assert got["d_num"] == 0 and got["ks_d"] == 0.0
        assert not got["drifted"]

    def test_disjoint_ranges_full_drift(self, spark):
        # half A all tiny, half B all huge: D = 1 exactly
        rows = ([("g", 2, 0)] * 5) + ([("g", 10_000, 1)] * 7)
        got = self._run(spark, rows)["g"]
        assert got["ks_d"] == 1.0 and got["drifted"]
        assert got["d_num"] == got["n_a"] * got["n_b"]

    def test_empty_half_yields_null_not_abort(self, spark):
        """A group whose rows all land in ONE split half has no second
        distribution to compare: ks_d/drifted are NULL — never an ANSI
        divide-by-zero abort (the repo-wide guard idiom)."""
        rows = [("g", v, 0) for v in (10, 50, 200)]
        got = self._run(spark, rows)["g"]
        assert (got["n_a"], got["n_b"]) == (3, 0)
        assert got["ks_d"] is None and got["drifted"] is None

    def test_sub_bucket_shift_invisible(self, spark):
        """The documented resolution tradeoff: values moving WITHIN a
        γ-bucket cannot register as drift."""
        from mindocr_spark.functions.sketches import dd_thresholds

        ts = dd_thresholds()
        lo = ts[20]          # bucket [ts[20], ts[21]-1]
        hi = ts[21] - 1
        assert hi > lo
        rows = ([("g", lo, 0)] * 4) + ([("g", hi, 1)] * 4)
        got = self._run(spark, rows)["g"]
        assert got["d_num"] == 0 and not got["drifted"]

"""Stats-driven partition sizing (auto-scaling gear profile analog)."""


def test_suggest_partitioning_basics(spark):
    from mindocr_spark.corpus import pages_dataframe
    from mindocr_spark.tuning import suggest_partitioning

    plan = suggest_partitioning(pages_dataframe(spark, 400))
    assert plan.n_rows == 400
    assert plan.total_bytes > 0
    assert plan.p50_bytes <= plan.p99_bytes <= plan.max_bytes
    assert plan.n_partitions >= 1
    assert 16 <= plan.arrow_batch_rows <= 4096
    # the synthetic corpus plants a 40x long tail → skew handling on
    assert plan.size_ordered
    assert plan.salt_buckets >= plan.n_partitions


def test_partition_plan_scales_with_target(spark):
    from mindocr_spark.corpus import pages_dataframe
    from mindocr_spark.tuning import suggest_partitioning

    pages = pages_dataframe(spark, 400)
    small = suggest_partitioning(pages, target_partition_bytes=64 << 10,
                                 min_parallelism=1)
    big = suggest_partitioning(pages, target_partition_bytes=1 << 30,
                               min_parallelism=1)
    assert small.n_partitions > big.n_partitions


def test_zorder_interleave_renderers_agree():
    """The one shared Morton definition must compute the true
    interleave in BOTH dialects (DuckDB evaluated for real; the Spark
    spelling checked structurally against the same bit set)."""
    import duckdb

    from mindocr_spark.tuning import zorder_interleave_sql

    def morton(a, b, bits):
        z = 0
        for i in range(bits):
            z |= ((a >> i) & 1) << (2 * i)
            z |= ((b >> i) & 1) << (2 * i + 1)
        return z

    con = duckdb.connect()
    for a, b in [(0, 0), (5, 3), (255, 0), (0, 255), (170, 85)]:
        got = con.execute(
            f"SELECT {zorder_interleave_sql(str(a), str(b), 8, 'duckdb')}"
        ).fetchone()[0]
        assert got == morton(a, b, 8), (a, b)
    # spark dialect renders the same bit positions
    s = zorder_interleave_sql("sa", "sb", 8, "spark")
    assert s.count("shiftleft") == 16 and "shiftright(sa, 7)" in s


def test_layout_skipping_audit_semantics(spark):
    """Planted 2-D grid: z-order must (a) beat ingest order on every
    2-D probe, (b) skip files on the b-only slice where a linear-a
    sort cannot skip anything, and (c) never miss a matching row
    (rows_scanned >= rows_match always — min/max pruning is sound)."""
    from pyspark.sql import functions as F

    from mindocr_spark.tuning import layout_skipping_audit

    df = spark.range(4096).select(
        F.col("id").alias("ing"),
        ((F.col("id") * 37) % 4096).alias("a"),
        ((F.col("id") * 101) % 4096).alias("b"),
    )
    rows = {(r["layout"], r["probe_id"]): r
            for r in layout_skipping_audit(
                df, "a", "b", "ing", bits=8, n_files=64).collect()}
    for p in (1, 4):
        assert (rows[("zorder", p)]["files_hit"]
                < rows[("ingest", p)]["files_hit"])
    assert rows[("linear_a", 3)]["files_hit"] == \
        rows[("linear_a", 3)]["files_total"]
    assert (rows[("zorder", 3)]["files_hit"]
            < rows[("linear_a", 3)]["files_hit"])
    for r in rows.values():
        assert r["rows_scanned"] >= r["rows_match"]
        assert 0 <= r["files_hit"] <= r["files_total"]


def test_layout_skipping_audit_validates_params(spark):
    import pytest

    from mindocr_spark.tuning import layout_skipping_audit

    df = spark.range(10).selectExpr("id a", "id b", "id ing")
    with pytest.raises(ValueError):
        layout_skipping_audit(df, "a", "b", "ing", bits=0)
    with pytest.raises(ValueError):
        layout_skipping_audit(df, "a", "b", "ing", bits=4, n_files=100)


class TestColumnProfile:
    def test_metrics_exact(self, spark):
        from mindocr_spark.tuning import column_profile

        df = spark.createDataFrame(
            [("ab", 10), ("abcd", 20), (None, None), ("ab", 30)],
            "s string, v long",
        )
        out = {(r["column"], r["metric"]): r["value"]
               for r in column_profile(
                   df, string_cols=("s",), numeric_cols=("v",)).collect()}
        assert out[("s", "null_rate")] == 0.25
        assert out[("s", "distinct_count")] == 2.0
        assert out[("s", "avg_len")] == (2 + 4 + 2) / 3
        assert out[("v", "min")] == 10.0 and out[("v", "max")] == 30.0
        assert out[("v", "mean")] == 20.0

    def test_all_null_column_has_null_avg(self, spark):
        from mindocr_spark.tuning import column_profile

        df = spark.createDataFrame([(None,), (None,)], "s string")
        out = {r["metric"]: r["value"]
               for r in column_profile(df, string_cols=("s",)).collect()}
        assert out["null_rate"] == 1.0 and out["avg_len"] is None

    def test_no_columns_guard(self, spark):
        import pytest as _pytest

        from mindocr_spark.tuning import column_profile

        with _pytest.raises(ValueError):
            column_profile(spark.range(1))


class TestProfileDrift:
    def _drift(self, spark, old_rows, new_rows):
        from mindocr_spark.tuning import profile_drift

        old = spark.createDataFrame(old_rows, "s string")
        new = spark.createDataFrame(new_rows, "s string")
        return {(r["column"], r["metric"]): r
                for r in profile_drift(
                    old, new, string_cols=("s",)).collect()}

    def test_relative_fence_fires_and_stays_quiet(self, spark):
        out = self._drift(
            spark,
            [("aaaa",), ("bbbb",)],           # avg_len 4
            [("aaaa",), ("bbbbbbbb",)],       # avg_len 6: +50%
        )
        assert out[("s", "avg_len")]["drifted"] is True
        assert out[("s", "null_rate")]["drifted"] is False  # 0 → 0

    def test_zero_to_nonzero_fires(self, spark):
        out = self._drift(spark, [("a",), ("b",)], [("a",), (None,)])
        r = out[("s", "null_rate")]
        assert r["old_value"] == 0.0 and r["drifted"] is True

    def test_under_threshold_quiet(self, spark):
        # avg_len 100 -> 105: 5% < 10% fence
        out = self._drift(spark, [("a" * 100,)], [("a" * 105,)])
        assert out[("s", "avg_len")]["drifted"] is False

    def test_null_vs_value_is_drift(self, spark):
        # old all-NULL → avg_len NULL; new has a value → drift
        out = self._drift(spark, [(None,)], [("abc",)])
        r = out[("s", "avg_len")]
        assert r["old_value"] is None and r["drifted"] is True


class TestCompactionPlan:
    def _run(self, spark, rows, target):
        from mindocr_spark.tuning import compaction_plan

        df = spark.createDataFrame(
            rows, "partition string, file string, bytes long"
        )
        out = compaction_plan(df, target_bytes=target).collect()
        return {(r["partition"], r["bin"]): r for r in out}

    def test_cumulative_fill_hand_computed(self, spark):
        # desc order: 600,500,300,200 target 1000
        # starts: 0,600,1100,1400 → bins 0,0,1,1
        rows = [("p", "a", 600), ("p", "b", 500),
                ("p", "c", 300), ("p", "d", 200)]
        out = self._run(spark, rows, 1000)
        assert out[("p", 0)]["n_files"] == 2
        assert out[("p", 0)]["total_bytes"] == 1100
        assert out[("p", 0)]["overflow"] is True
        assert out[("p", 1)]["total_bytes"] == 500
        assert out[("p", 1)]["fill_ratio"] == 0.5

    def test_oversized_file_blows_its_bin_alone(self, spark):
        # 2500-byte file starts bin 0; next file starts at 2500 → bin 2
        rows = [("p", "big", 2500), ("p", "small", 100)]
        out = self._run(spark, rows, 1000)
        assert out[("p", 0)]["n_files"] == 1
        assert out[("p", 0)]["overflow"] is True
        assert out[("p", 2)]["n_files"] == 1

    def test_partitions_pack_independently(self, spark):
        rows = [("p1", "a", 700), ("p2", "b", 700)]
        out = self._run(spark, rows, 1000)
        assert out[("p1", 0)]["n_files"] == 1
        assert out[("p2", 0)]["n_files"] == 1

    def test_size_tie_breaks_on_file_name(self, spark):
        # equal sizes: deterministic name order → same plan every run
        rows = [("p", f"f{i}", 400) for i in range(5)]
        a = self._run(spark, rows, 1000)
        b = self._run(spark, list(reversed(rows)), 1000)
        assert a == b

    def test_target_guard(self, spark):
        import pytest as _pytest

        from mindocr_spark.tuning import compaction_plan

        df = spark.createDataFrame(
            [("p", "a", 1)], "partition string, file string, bytes long"
        )
        with _pytest.raises(ValueError):
            compaction_plan(df, target_bytes=0)


class TestMixEntropy:
    def _run(self, spark, rows):
        from mindocr_spark.tuning import mix_entropy

        df = spark.createDataFrame(rows, "g string, cat string")
        return {
            r["g"]: r.asDict()
            for r in mix_entropy(df, "g", "cat").collect()
        }

    def test_hand_computed_entropy(self, spark):
        import math

        # group A: 3×x, 1×y → H = -(0.75 ln 0.75 + 0.25 ln 0.25)
        rows = [("A", "x")] * 3 + [("A", "y")]
        out = self._run(spark, rows)["A"]
        p = [0.75, 0.25]
        h = -sum(round(q * math.log(q), 9) for q in p)
        assert out["n_rows"] == 4
        assert out["n_categories"] == 2
        assert abs(out["entropy_nats"] - h) < 1e-9
        assert abs(out["evenness"] - h / round(math.log(2), 9)) < 1e-9

    def test_balanced_mix_evenness_one(self, spark):
        rows = [("A", c) for c in "wxyz" for _ in range(5)]
        out = self._run(spark, rows)["A"]
        assert abs(out["evenness"] - 1.0) < 1e-8

    def test_single_category_zero_entropy_null_evenness(self, spark):
        out = self._run(spark, [("A", "only")] * 7)["A"]
        assert out["entropy_nats"] == 0.0
        assert out["n_categories"] == 1
        assert out["evenness"] is None

    def test_null_category_is_a_real_source(self, spark):
        # an unlabeled source still counts toward the mix
        out = self._run(spark, [("A", "x"), ("A", None)])["A"]
        assert out["n_categories"] == 2
        assert abs(out["evenness"] - 1.0) < 1e-8

    def test_groups_independent(self, spark):
        rows = [("A", "x"), ("A", "y"), ("B", "x")]
        out = self._run(spark, rows)
        assert out["A"]["n_categories"] == 2
        assert out["B"]["n_categories"] == 1
        assert out["B"]["evenness"] is None

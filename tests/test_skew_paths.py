"""Skew-handling paths produce byte-identical results to the plain path
(salting/size-ordering are layout decisions, never semantic ones)."""


def _collect(df):
    return {
        r["url"]: (r["extracted_text"], tuple(map(tuple, r["spans"])))
        for r in df.collect()
    }


def test_salted_and_size_ordered_identical(spark):
    from mindocr_spark.corpus import pages_dataframe
    from mindocr_spark.operators.pipeline import run_extraction

    pages = pages_dataframe(spark, 120, seed=42)
    plain = _collect(run_extraction(pages))
    salted = _collect(run_extraction(pages, salt_partitions=16))
    sized = _collect(run_extraction(pages, size_ordered=True))
    assert plain == salted == sized
    assert len(plain) == 120


def test_salting_redistributes_partitions(spark):
    from pyspark.sql import functions as F
    from mindocr_spark.corpus import pages_dataframe
    from mindocr_spark.operators.pipeline import prepare_input

    # all rows forced into one input partition; salting spreads them
    pages = pages_dataframe(spark, 200, seed=42).coalesce(1)
    spread = prepare_input(pages, salt_partitions=8)
    counts = (
        spread.withColumn("p", F.spark_partition_id())
        .groupBy("p").count().collect()
    )
    assert len(counts) >= 6            # occupied most of the 8 buckets
    assert max(c["count"] for c in counts) < 200  # no single straggler


class TestKeySkewStats:
    def _run(self, spark, rows, **kw):
        from mindocr_spark.tuning import key_skew_stats

        df = spark.createDataFrame(rows, "k string, v bigint")
        return key_skew_stats(df, "k", "t", **kw).collect()[0]

    def test_uniform_keys_gini_zero(self, spark):
        r = self._run(spark, [(f"k{i}", 0) for i in range(40)])
        assert (r["n_rows"], r["n_keys"]) == (40, 40)
        assert r["gini"] == 0.0 and r["max_share"] == 0.025
        assert not r["needs_salting"]

    def test_hot_key_fires_salting_verdict(self, spark):
        rows = [("hot", 0)] * 9 + [("a", 0)]
        r = self._run(spark, rows)
        assert r["max_share"] == 0.9
        assert r["needs_salting"]
        # hand Gini: counts sorted [1, 9] → 2·(1·1+2·9)/(2·10) − 3/2
        assert r["gini"] == round(2 * 19 / 20 - 1.5, 6)

    def test_null_is_a_real_key(self, spark):
        rows = [("a", 0), (None, 0), (None, 0)]
        r = self._run(spark, rows)
        assert r["n_keys"] == 2 and r["n_rows"] == 3

    def test_boundary_is_strict(self, spark):
        # exactly 1/20 of rows must NOT fire (strict >)
        rows = [("hot", 0)] + [(f"k{i}", 0) for i in range(19)]
        r = self._run(spark, rows, max_share=(1, 20))
        assert not r["needs_salting"]

    def test_guard(self, spark):
        import pytest as _pytest

        from mindocr_spark.tuning import key_skew_stats

        df = spark.createDataFrame([("a", 0)], "k string, v bigint")
        with _pytest.raises(ValueError):
            key_skew_stats(df, "k", "t", max_share=(1, 0))

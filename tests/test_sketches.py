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

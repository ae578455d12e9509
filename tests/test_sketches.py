"""Sketch aggregations: HLL++ approximate distinct accuracy."""


def test_approx_distinct_within_error(spark, sf_dir):
    import __spark_entry__ as E
    from pyspark.sql import functions as F

    approx = {
        r["event_type"]: r["approx_users"]
        for r in E.q_approx_distinct(spark, sf_dir).collect()
    }
    exact = {
        r["event_type"]: r["n"]
        for r in spark.read.parquet(f"{sf_dir}/events.parquet")
        .groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    assert set(approx) == set(exact)
    for et, n in exact.items():
        assert abs(approx[et] - n) <= max(2, 0.1 * n), (et, approx[et], n)

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

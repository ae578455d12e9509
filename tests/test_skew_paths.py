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

"""Crash-resume semantics of the bucket-wise extraction job."""

import pytest


def test_resume_after_crash_no_duplicates(spark, tmp_path):
    from mindocr_spark.corpus import generate_batch, PAGES_SCHEMA_DDL
    from mindocr_spark.operators.resumable import (
        pending_buckets,
        run_resumable_extraction,
    )
    from mindocr_spark.sources.pages import write_pages_partitioned

    pages_path = str(tmp_path / "pages")
    out = str(tmp_path / "out")
    lineage = str(tmp_path / "lineage")

    corpus = spark.createDataFrame(generate_batch(42, range(80)), PAGES_SCHEMA_DDL)
    write_pages_partitioned(corpus, pages_path, ts_buckets=4)
    all_buckets = pending_buckets(spark, pages_path, lineage)
    assert len(all_buckets) >= 3

    # crash after 2 buckets
    with pytest.raises(RuntimeError, match="injected crash"):
        run_resumable_extraction(
            spark, pages_path, out, lineage, run_id="r1", fail_after=2
        )
    assert len(pending_buckets(spark, pages_path, lineage)) == len(all_buckets) - 2

    # resume: completes ONLY the remaining buckets
    done2 = run_resumable_extraction(
        spark, pages_path, out, lineage, run_id="r2"
    )
    assert len(done2) == len(all_buckets) - 2
    assert pending_buckets(spark, pages_path, lineage) == []

    # exactly-once: every page extracted exactly once, none lost
    res = spark.read.parquet(out)
    assert res.count() == 80
    assert res.select("url").distinct().count() == 80

    # third run is a no-op
    assert run_resumable_extraction(spark, pages_path, out, lineage) == []


def test_rerun_of_uncommitted_bucket_overwrites(spark, tmp_path):
    """A crash AFTER writing results but BEFORE the lineage commit must
    re-run the bucket and overwrite — no duplicate rows."""
    from pyspark.sql import functions as F
    from mindocr_spark.corpus import generate_batch, PAGES_SCHEMA_DDL
    from mindocr_spark.operators.resumable import run_resumable_extraction
    from mindocr_spark.operators.stages import extract_stage
    from mindocr_spark.sources.pages import write_pages_partitioned

    pages_path = str(tmp_path / "pages")
    out = str(tmp_path / "out")
    lineage = str(tmp_path / "lineage")
    corpus = spark.createDataFrame(generate_batch(42, range(40)), PAGES_SCHEMA_DDL)
    write_pages_partitioned(corpus, pages_path, ts_buckets=2)

    # simulate the partial state: bucket results written, lineage absent
    some_bucket = (
        spark.read.parquet(pages_path).select("ts_bucket").distinct().collect()
    )[0]["ts_bucket"]
    partial = spark.read.parquet(pages_path).where(F.col("ts_bucket") == some_bucket)
    extract_stage(partial).write.mode("overwrite").parquet(
        f"{out}/ts_bucket={some_bucket}"
    )

    run_resumable_extraction(spark, pages_path, out, lineage)
    res = spark.read.parquet(out)
    assert res.count() == 40
    assert res.select("url").distinct().count() == 40

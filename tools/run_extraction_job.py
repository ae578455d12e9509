"""run_extraction_job — the spark-submit deployment entrypoint.

The north-rule deployment shape::

    zip -r mindocr_spark.zip mindocr_spark
    spark-submit --py-files mindocr_spark.zip \\
        tools/run_extraction_job.py \\
        --pages  s3://bucket/pages        (here: a parquet dir) \\
        --out    s3://bucket/results \\
        --lineage s3://bucket/lineage \\
        [--resumable] [--auto-tune] [--run-id r1]

On a cluster the master/executors come from spark-submit; this script
only builds the session from the inherited conf, sizes the job from a
stats pass (``--auto-tune``), and runs either the one-shot extraction
or the bucket-wise resumable job. Exercised end-to-end by
tests/test_spark_submit.py via a real spark-submit subprocess.
"""

from __future__ import annotations

import argparse
import sys


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--pages", required=True)
    p.add_argument("--input-format", choices=("parquet", "warc"),
                   default="parquet",
                   help="parquet pages dir (default) or a dir of .warc "
                        "files ingested through sources.warc.read_warc")
    p.add_argument("--out", required=True)
    p.add_argument("--lineage", default=None)
    p.add_argument("--metrics", default=None)
    p.add_argument("--run-id", default="run-0")
    p.add_argument("--resumable", action="store_true")
    p.add_argument("--wap", action="store_true",
                   help="write-audit-publish commit: stage, validate the "
                        "observed metrics, then atomically publish "
                        "(requires --metrics)")
    p.add_argument("--auto-tune", action="store_true")
    p.add_argument("--salt-partitions", type=int, default=None)
    p.add_argument("--partition-by", default=None,
                   help="comma-separated partition spec for the committed "
                        "layout; transform specs supported (hidden "
                        "partitioning) — e.g. the north-rule layout "
                        "'days(warc_ts),bucket(16, url)'. WAP records the "
                        "spec in the manifest; readers prune via "
                        "read_published_pruned without knowing the layout")
    args = p.parse_args(argv)

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.appName("mindocr_spark_extract")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .getOrCreate()
    )

    if args.resumable:
        if not args.lineage:
            print("--resumable requires --lineage", file=sys.stderr)
            return 2
        from mindocr_spark.operators.resumable import run_resumable_extraction

        done = run_resumable_extraction(
            spark, args.pages, args.out, args.lineage, run_id=args.run_id
        )
        print(f"committed buckets: {done}")
        return 0

    from mindocr_spark.operators.pipeline import run_extraction, write_results

    if args.input_format == "warc":
        from mindocr_spark.sources.warc import read_warc

        pages = read_warc(spark, args.pages)
    else:
        from mindocr_spark.sources.pages import read_pages

        pages = read_pages(spark, args.pages)
    salt = args.salt_partitions
    size_ordered = False
    if args.auto_tune:
        from mindocr_spark.tuning import suggest_partitioning

        plan = suggest_partitioning(pages)
        salt = salt or plan.salt_buckets
        size_ordered = plan.size_ordered
        print(f"auto-tune: {plan}")
    result = run_extraction(
        pages, salt_partitions=salt, size_ordered=size_ordered
    )
    if args.wap:
        if not args.metrics:
            print("--wap requires --metrics", file=sys.stderr)
            return 2
        from mindocr_spark.operators.pipeline import (
            read_published,
            write_results_wap,
        )

        import re

        # split on commas OUTSIDE parens: "days(warc_ts),bucket(16, url)"
        # is two specs, the comma inside bucket() is an argument
        partition_by = tuple(
            s.strip()
            for s in re.split(r",(?![^(]*\))", args.partition_by)
        ) if args.partition_by else ()
        if not write_results_wap(result, args.out, args.metrics,
                                 run_id=args.run_id,
                                 partition_by=partition_by):
            print("audit REJECTED the staged write; previous publication "
                  "left intact", file=sys.stderr)
            return 3
        n = read_published(spark, args.out).count()
    else:
        if args.partition_by:
            print("--partition-by requires --wap (the manifest records "
                  "the spec)", file=sys.stderr)
            return 2
        write_results(result, args.out, metrics_path=args.metrics,
                      run_id=args.run_id)
        n = spark.read.parquet(args.out).count()
    print(f"extracted {n} documents -> {args.out}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

"""ingest_warc — spark-submit entrypoint for the WARC→pages converter.

The dataset-converter deployment shape (reference:
tools/dataset_converters/convert.py:32-54, as a resumable Spark job)::

    spark-submit --py-files mindocr_spark.zip tools/ingest_warc.py \\
        --warc-dir s3://crawl/segments --pages-out s3://bucket/pages \\
        --lineage s3://bucket/warc_lineage [--run-id r1]

Exactly-once per WARC file (lineage anti-join + dynamic partition
overwrite — see mindocr_spark.sources.warc.ingest_warc_incremental);
safe to re-run on a schedule as new crawl files land.
"""

from __future__ import annotations

import argparse


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--warc-dir", required=True)
    p.add_argument("--pages-out", required=True)
    p.add_argument("--lineage", required=True)
    p.add_argument("--run-id", default="run-0")
    args = p.parse_args(argv)

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.appName("mindocr_spark_ingest_warc")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .getOrCreate()
    )
    from mindocr_spark.sources.warc import ingest_warc_incremental

    done = ingest_warc_incremental(
        spark, args.warc_dir, args.pages_out, args.lineage,
        run_id=args.run_id,
    )
    print(f"ingested {len(done)} new WARC files: {done}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

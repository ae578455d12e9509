"""Deployment-shape smoke: the real spark-submit --py-files flow."""

import os
import subprocess
import sys
import zipfile

import pytest

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.slow
def test_spark_submit_pyfiles_end_to_end(spark, tmp_path):
    from mindocr_spark.corpus import generate_batch, PAGES_SCHEMA_DDL

    pages_path = str(tmp_path / "pages")
    out = str(tmp_path / "out")
    metrics = str(tmp_path / "metrics")
    spark.createDataFrame(
        generate_batch(42, range(40)), PAGES_SCHEMA_DDL
    ).write.parquet(pages_path)

    # package the library exactly as a cluster deploy would
    zip_path = str(tmp_path / "mindocr_spark.zip")
    with zipfile.ZipFile(zip_path, "w") as z:
        for dirpath, _dirs, files in os.walk(os.path.join(ROOT, "mindocr_spark")):
            for f in files:
                if f.endswith(".py"):
                    full = os.path.join(dirpath, f)
                    z.write(full, os.path.relpath(full, ROOT))

    env = dict(os.environ, PYSPARK_PYTHON=sys.executable)
    proc = subprocess.run(
        [
            "spark-submit", "--master", "local[4]",
            "--conf", "spark.ui.enabled=false",
            "--py-files", zip_path,
            os.path.join(ROOT, "tools", "run_extraction_job.py"),
            "--pages", pages_path, "--out", out, "--metrics", metrics,
            "--auto-tune",
        ],
        capture_output=True, text=True, timeout=420, env=env,
        cwd=str(tmp_path),  # NOT the repo root: forces import via the zip
    )
    assert proc.returncode == 0, proc.stderr[-3000:]
    assert "extracted 40 documents" in proc.stdout
    res = spark.read.parquet(out)
    assert res.count() == 40
    assert spark.read.parquet(metrics).agg({"docs": "sum"}).collect()[0][0] == 40

    # second submit: the north-rule committed layout — WAP with HIDDEN
    # partitioning "days(warc_ts),bucket(16, url)" (the BASELINE
    # partitioning-by-warc_ts-bucket + url-hash spec) through the same
    # zip deploy; readers resolve through the manifest and the derived
    # columns stay hidden
    out2, metrics2 = str(tmp_path / "out2"), str(tmp_path / "m2")
    proc2 = subprocess.run(
        [
            "spark-submit", "--master", "local[4]",
            "--conf", "spark.ui.enabled=false",
            "--py-files", zip_path,
            os.path.join(ROOT, "tools", "run_extraction_job.py"),
            "--pages", pages_path, "--out", out2, "--metrics", metrics2,
            "--wap", "--run-id", "w1",
            "--partition-by", "days(warc_ts),bucket(16, url)",
        ],
        capture_output=True, text=True, timeout=420, env=env,
        cwd=str(tmp_path),
    )
    assert proc2.returncode == 0, proc2.stderr[-3000:]
    from mindocr_spark.operators.pipeline import (
        list_snapshots,
        read_published,
    )

    snap = list_snapshots(spark, out2)[-1]
    assert snap["partition_by"] == ["days(warc_ts)", "bucket(16, url)"]
    pub = read_published(spark, out2)
    assert pub.count() == 40
    assert "url_bucket" not in pub.columns
    assert "warc_ts_day" not in pub.columns
    data = os.path.join(out2, "_data", "w1")
    assert any(d.startswith("warc_ts_day=") for d in os.listdir(data))

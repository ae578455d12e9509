"""multi_corpus_eval — evaluate extraction across every corpus dir.

The reference's multi-dataset benchmark harness evaluates every dataset
under a folder and reports per-dataset metrics plus the average
(reference: tools/benchmarking/multi_dataset_eval.py; golden eval join
deploy/eval_utils/eval_pipeline.py:34-107). The graft equivalent: for
each sf dir, run the full extraction over the synthesized pages, join
predictions to ground truth by url (full outer — the key-set equality
check of eval_pipeline.py:104-107 becomes missing-count columns), and
aggregate exact-match rate + normalized edit distance with the
DECIMAL-exact discipline.

Usage:
    python tools/multi_corpus_eval.py [sf_dir ...]   # default: all three
"""

from __future__ import annotations

import json
import os
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

DEFAULT_DIRS = [
    f"/root/testdata/sf{s}" for s in ("0.001", "0.01", "0.1")
]


def eval_corpus(spark, sf_dir: str) -> dict:
    from pyspark.sql import functions as F

    from mindocr_spark.functions.text import rec_metrics
    from mindocr_spark.operators.pipeline import run_extraction
    from mindocr_spark.sources.pages import (
        PAGES_TEMPLATE_ANCHOR,
        pages_from_documents,
    )

    pages = pages_from_documents(spark, sf_dir).repartition(
        spark.sparkContext.defaultParallelism
    )
    pred = run_extraction(pages.drop("doc_id")).select(
        "url", F.col("extracted_text").alias("pred"), "failed"
    )
    gt = pages.select(
        "url",
        F.concat(F.lit(PAGES_TEMPLATE_ANCHOR + "\n"), F.col("text"))
        .alias("label"),
    )
    joined = pred.join(gt, "url", "full_outer")
    # ONE job for everything (re-running the extraction lineage per
    # aggregate is the diamond-recomputation trap): the missing-key
    # count (key-set equality check) folds into the same aggregation
    # as the metrics, guarded so null-side rows contribute nothing.
    both = F.col("pred").isNotNull() & F.col("label").isNotNull()
    agg = rec_metrics(joined).agg(
        F.sum(both.cast("long")).alias("n"),
        F.sum((~both).cast("long")).alias("n_missing"),
        F.sum(F.when(both, F.col("exact")).otherwise(0)).alias("n_exact"),
        F.sum(F.when(both, F.col("norm_ed")).otherwise(0.0)
              .cast("decimal(18,6)")).cast("double").alias("sum_ned"),
        F.sum(F.coalesce(F.col("failed").cast("long"), F.lit(0)))
        .alias("n_failed"),
    ).collect()[0]
    n = int(agg["n"])
    return dict(
        corpus=os.path.basename(sf_dir.rstrip("/")),
        n_docs=n,
        n_missing=int(agg["n_missing"]),
        n_failed=int(agg["n_failed"]),
        exact_rate=round(int(agg["n_exact"]) / max(n, 1), 6),
        avg_norm_ed=round(float(agg["sum_ned"] or 0.0) / max(n, 1), 6),
    )


def main() -> int:
    dirs = sys.argv[1:] or DEFAULT_DIRS
    from mindocr_spark.session import get_spark

    spark = get_spark(app="multi_corpus_eval")
    rows = [eval_corpus(spark, d) for d in dirs]
    avg = dict(
        corpus="AVERAGE",
        n_docs=sum(r["n_docs"] for r in rows),
        n_missing=sum(r["n_missing"] for r in rows),
        n_failed=sum(r["n_failed"] for r in rows),
        exact_rate=round(
            sum(r["exact_rate"] for r in rows) / max(len(rows), 1), 6
        ),
        avg_norm_ed=round(
            sum(r["avg_norm_ed"] for r in rows) / max(len(rows), 1), 6
        ),
    )
    for r in rows + [avg]:
        print(json.dumps(r))
    spark.stop()
    # the acceptance gate: byte-identical extraction everywhere
    return 0 if all(
        r["exact_rate"] == 1.0 and r["n_missing"] == 0 for r in rows
    ) else 1


if __name__ == "__main__":
    raise SystemExit(main())

"""DetMetric golden — the reference's exact-0.5 pattern
(reference: tests/ut/test_metrics.py:31-66: hand-built regions with known
IoU outcomes asserting recall == precision == fscore == 0.5)."""

import pytest


def _spans(spark, rows):
    return spark.createDataFrame(
        rows, "url string, spans array<struct<start:int,end:int>>"
    )


def test_det_metric_half(spark):
    """2 preds, 2 gts per the reference golden: one matches (IoU=1),
    one misses → P = R = F = 0.5 exactly."""
    from mindocr_spark.metrics import det_metric

    pred = _spans(spark, [("u1", [(0, 100), (500, 600)])])
    gt = _spans(spark, [("u1", [(0, 100), (900, 1000)])])
    r = det_metric(pred, gt).collect()[0]
    assert (r["tp"], r["fp"], r["fn"]) == (1, 1, 1)
    assert r["precision"] == 0.5 and r["recall"] == 0.5 and r["fscore"] == 0.5


def test_det_metric_iou_threshold(spark):
    from mindocr_spark.metrics import det_metric

    # overlap 50/150 = IoU 1/3 < 0.5 → no match; at 0.3 → match
    pred = _spans(spark, [("u1", [(0, 100)])])
    gt = _spans(spark, [("u1", [(50, 150)])])
    r5 = det_metric(pred, gt, iou_thresh=0.5).collect()[0]
    assert r5["tp"] == 0 and r5["fp"] == 1 and r5["fn"] == 1
    r3 = det_metric(pred, gt, iou_thresh=0.3).collect()[0]
    assert r3["tp"] == 1 and r3["fp"] == 0 and r3["fn"] == 0


def test_det_metric_outer_join_semantics(spark):
    """Docs missing on one side count fully against the other — the
    key-set equality assertion of the reference's eval
    (eval_pipeline.py:104-107) subsumed by the full-outer join."""
    from mindocr_spark.metrics import det_metric

    pred = _spans(spark, [("u1", [(0, 10)]), ("only_pred", [(0, 10)])])
    gt = _spans(spark, [("u1", [(0, 10)]), ("only_gt", [(5, 15)])])
    r = det_metric(pred, gt).collect()[0]
    assert (r["tp"], r["fp"], r["fn"]) == (1, 1, 1)


def test_det_metric_greedy_first_match(spark):
    """One gt cannot consume two preds; greedy first-match order is
    deterministic (reference loop det_metrics.py:48-66)."""
    from mindocr_spark.metrics import det_metric

    pred = _spans(spark, [("u1", [(0, 100), (0, 100)])])  # duplicate pred
    gt = _spans(spark, [("u1", [(0, 100)])])
    r = det_metric(pred, gt).collect()[0]
    assert (r["tp"], r["fp"], r["fn"]) == (1, 1, 0)


def test_end_to_end_extraction_eval(spark, sf_dir):
    """Extraction output vs its own golden spans → perfect score: the
    engine's self-consistency eval harness (SURVEY §3.3 shape)."""
    from mindocr_spark.metrics import det_metric
    from mindocr_spark.operators.stages import extract_stage
    from mindocr_spark.corpus import generate_batch, PAGES_SCHEMA_DDL
    from pyspark.sql import functions as F

    pages = spark.createDataFrame(generate_batch(42, range(30)), PAGES_SCHEMA_DDL)
    res = extract_stage(pages).select(
        "url",
        F.expr(
            "transform(spans, s -> struct(cast(s.char_start as int) as start,"
            " cast(s.char_end as int) as end))"
        ).alias("spans"),
    )
    r = det_metric(res, res).collect()[0]
    assert r["fp"] == 0 and r["fn"] == 0 and r["fscore"] == 1.0


def test_multi_corpus_eval_harness(spark, sf_dir):
    """The multi-dataset eval capability (reference:
    tools/benchmarking/multi_dataset_eval.py): per-corpus golden eval —
    byte-identical extraction must score exact_rate 1.0 with no missing
    keys on the synthesized corpus."""
    import sys, os
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
    from multi_corpus_eval import eval_corpus

    r = eval_corpus(spark, sf_dir)
    assert r["n_missing"] == 0 and r["n_failed"] == 0
    assert r["exact_rate"] == 1.0
    assert r["n_docs"] > 0

"""metrics — evaluation aggregations (DetMetric / RecMetric analogs).

- :func:`det_metric` — the reference's detection metric: per-document
  greedy IoU bipartite matching of predicted vs ground-truth regions
  (reference: mindocr/metrics/det_metrics.py:28-76, iou_thresh=0.5
  first-match), then a global partial+final aggregation of TP/FP/FN and
  precision/recall/F-score (the `update`/`eval` + AllReduce shape,
  det_metrics.py:79-156). Regions here are 1-D char spans — the web-text
  geometry — but the matcher is the same bipartite-greedy contract.
- Recognition metrics (exact match + normalized Levenshtein) live in
  :func:`mindocr_spark.functions.text.rec_metrics` (built-in
  `levenshtein`, reference: mindocr/metrics/rec_metrics.py:11-152).

Dataflow: pred ⋈ gt on url (equi-join, never cross-doc) → one
Arrow-batched matcher per doc → exact-int global sums. Perfectly
partitionable; the final agg is a single-row reduce.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, functions as F

_MATCH_SCHEMA = "url string, tp int, fp int, fn int"


def _iou_1d(a: tuple[int, int], b: tuple[int, int]) -> float:
    inter = min(a[1], b[1]) - max(a[0], b[0])
    if inter <= 0:
        return 0.0
    union = (a[1] - a[0]) + (b[1] - b[0]) - inter
    return inter / union if union > 0 else 0.0


def _bounds(s) -> tuple[int, int]:
    """Accept either (start, end) or the extraction schema's
    (char_start, char_end) span structs — the engine's own outputs
    compose into its own eval without an adapter."""
    try:
        return s["start"], s["end"]
    except (KeyError, IndexError):
        return s["char_start"], s["char_end"]


def _greedy_match(pred, gt, iou_thresh: float) -> tuple[int, int, int]:
    """First-match greedy bipartite matching (the reference's loop,
    det_metrics.py:48-66): each gt claims the first unmatched pred with
    IoU ≥ thresh, in input order — deterministic."""
    matched_pred: set[int] = set()
    tp = 0
    for g in gt:
        gb = _bounds(g)
        for i, p in enumerate(pred):
            if i in matched_pred:
                continue
            if _iou_1d(_bounds(p), gb) >= iou_thresh:
                matched_pred.add(i)
                tp += 1
                break
    return tp, len(pred) - tp, len(gt) - tp


def det_metric(
    pred: DataFrame,
    gt: DataFrame,
    iou_thresh: float = 0.5,
    key: str = "url",
    spans_col: str = "spans",
) -> DataFrame:
    """pred(key, spans), gt(key, spans) with spans array<struct<start,
    end>> → one row: (tp, fp, fn, precision, recall, fscore).

    Full-outer join keeps unmatched docs on either side (missing preds
    are all-FN, spurious docs all-FP) — the reference asserts key-set
    equality instead (eval_pipeline.py:104-107); the outer join subsumes
    that check.
    """
    joined = (
        pred.select(F.col(key).alias("url"), F.col(spans_col).alias("p"))
        .join(
            gt.select(F.col(key).alias("url"), F.col(spans_col).alias("g")),
            on="url",
            how="full_outer",
        )
    )

    def match(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for url, p, g in zip(pdf["url"], pdf["p"], pdf["g"]):
                p = list(p) if p is not None else []
                g = list(g) if g is not None else []
                tp, fp, fn = _greedy_match(p, g, iou_thresh)
                out.append(dict(url=url, tp=tp, fp=fp, fn=fn))
            if out:
                yield pd.DataFrame(out)

    per_doc = joined.mapInPandas(match, schema=_MATCH_SCHEMA)
    agg = per_doc.agg(
        F.sum("tp").alias("tp"), F.sum("fp").alias("fp"), F.sum("fn").alias("fn")
    )
    prec = F.col("tp") / F.greatest(F.col("tp") + F.col("fp"), F.lit(1))
    rec = F.col("tp") / F.greatest(F.col("tp") + F.col("fn"), F.lit(1))
    return agg.select(
        "tp", "fp", "fn",
        F.round(prec, 6).alias("precision"),
        F.round(rec, 6).alias("recall"),
        F.round(
            F.when(prec + rec > 0, 2 * prec * rec / (prec + rec)).otherwise(0.0), 6
        ).alias("fscore"),
    )

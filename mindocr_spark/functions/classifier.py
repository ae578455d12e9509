"""classifier — hashed-linear quality-classifier scoring.

The model-based curation gate (FineWeb-Edu / DCLM style): a trained
text classifier scores every document and the pipeline keeps the
high-scoring head. The production shape is a hashed bag-of-words
linear model — fastText's architecture — because it is the one
classifier family that runs at 10^12-doc scale as pure relational
algebra: token → hash bucket → broadcast weight lookup → per-doc sum.

This module implements exactly that plumbing with a DETERMINISTIC
STUB weight table (a pinned integer formula over the bucket index —
no RNG, no training), making the whole path oracle-checkable. The
weight table is the injectable seam: swap :func:`hashed_weights` for
real exported classifier weights (same (bucket, weight) relation) and
nothing else changes — schema, joins, aggregation, and the score
contract are production-real.

100 TB shape: bucketing is one codegen md5-prefix per token; the
weight relation is tiny (2^b rows) and BROADCAST; the only shuffle is
the per-doc sum, map-side combinable on the uniform id key. Weights
are exact DECIMAL rationals so per-doc sums are exact and
order-independent; the final mean is one correctly-rounded double
division (no display rounding — the lm_logppl lesson).

Reference lineage: cls_mv3's score-and-route stage (reference:
mindocr/models/cls_mv3.py + postprocess/cls_postprocess.py:15-27) —
a small model's scalar output deciding a document's downstream
treatment.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from .text import tokens_col

#: Bucket count = one md5 hex pair (the sequence-pack precedent).
N_BUCKETS = 256

#: Denominator of the stub weight rationals.
_W_SCALE = 1000


def hashed_weights(n_buckets: int = N_BUCKETS) -> list[tuple[str, str]]:
    """The pinned stub weight table: bucket hex-prefix → weight as a
    DECIMAL STRING in [-1, 1] with denominator 1000. Knuth
    multiplicative hashing over the bucket index spreads signs/values;
    both engines receive these exact strings (Spark via a local
    relation, DuckDB via VALUES), so there is no float parsing drift."""
    out = []
    for i in range(n_buckets):
        v = (i * 2654435761 + 104729) % (2 * _W_SCALE + 1) - _W_SCALE
        out.append((format(i, "02x"), "%.3f" % (v / _W_SCALE)))
    return out


def quality_classifier_score(
    df: DataFrame,
    weights: list[tuple[str, str]] | None = None,
    threshold: float = 0.0,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Score every doc with the hashed linear model:
    (id, n_tokens, logit_sum, score, keep).

    score = (Σ_t w[md5(t)[:2]]) / n_tokens;  keep = score ≥ threshold.
    Zero-token docs score NULL and keep=false (no evidence ≠ keep —
    the curation gates downstream drop them on min_chars anyway)."""
    spark = df.sparkSession
    if weights is None:
        weights = hashed_weights()
    elif not weights:
        # an empty export is a caller bug — silently substituting the
        # stub table would score real corpora with fake weights
        raise ValueError("empty classifier weight table")
    w = spark.createDataFrame(
        list(weights),
        "bucket string, w_str string",
    ).select("bucket", F.col("w_str").cast("decimal(10,3)").alias("w"))
    toks = df.select(
        F.col(id_col).alias("__id"),
        F.explode(tokens_col(text_col)).alias("__tok"),
    ).select(
        "__id",
        F.substring(
            F.md5(F.col("__tok").cast("binary")), 1, 2
        ).alias("bucket"),
    )
    sums = (
        toks.join(F.broadcast(w), "bucket")
        .groupBy("__id")
        .agg(F.sum(F.col("w").cast("decimal(28,9)")).alias("logit"))
    )
    base = df.select(
        F.col(id_col).alias("__id"),
        F.size(tokens_col(text_col)).alias("n_tokens"),
    )
    score = F.col("logit").cast("double") / F.col("n_tokens").cast("double")
    return (
        base.join(sums, "__id", "left")
        .select(
            F.col("__id").alias(id_col),
            "n_tokens",
            F.coalesce(F.col("logit"), F.lit(0).cast("decimal(28,9)"))
            .cast("double").alias("logit_sum"),
            F.when(F.col("n_tokens") > 0, score).alias("score"),
            F.when(
                F.col("n_tokens") > 0, score >= F.lit(threshold)
            ).otherwise(F.lit(False)).alias("keep"),
        )
    )

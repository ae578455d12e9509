"""curate — the end-to-end training-corpus curation pipeline.

The canonical composition this engine exists for: raw crawl pages →
clean deduplicated training text. One declarative chain:

    extract (det→rec→layout core)
    → language ID + quality gates          (cls stage + validity filters)
    → exact dedup (md5 clusters)           (content addressing)
    → near-dup removal (MinHash + LSH)     (scale-path candidate join)
    → curated corpus + per-stage funnel metrics

Plan shape: the extraction is one narrow stage; each dedup pass is one
key-partitioned shuffle; the funnel metrics are cheap count aggregates.
At 10^12 docs every stage is the same plan, just more partitions — no
driver-side loops anywhere.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, functions as F

from mindocr_spark import extract_core as core
from mindocr_spark.functions.dedup import exact_dup_clusters, minhash_lsh_pairs
from mindocr_spark.functions.text import lang_id_col, quality_cols
from mindocr_spark.operators.pipeline import run_extraction


@dataclass(frozen=True)
class CurateConfig:
    min_chars: int = 100          # drop short extractions
    max_boilerplate: float = 0.95  # drop pages that are ~all chrome
    langs: tuple[str, ...] = ()    # keep-list; empty = all
    min_stop_ratio: float = 0.0    # prose-ness gate (0 disables)
    neardup_threshold: float = 0.6  # MinHash est-jaccard cutoff; >1 disables


def curate(
    pages: DataFrame,
    cfg: CurateConfig = CurateConfig(),
    params: core.ExtractParams = core.DEFAULT_PARAMS,
) -> tuple[DataFrame, DataFrame]:
    """pages → (curated, funnel) where curated has one row per kept doc
    (url, text, lang_pred, n_chars) and funnel records per-stage
    survivor counts (the metrics-table discipline of the north rule).
    """
    extracted = run_extraction(pages, params).select(
        "url", F.col("extracted_text").alias("text"),
        "boilerplate_ratio", "failed",
    ).persist()

    ok = extracted.where(
        (~F.col("failed"))
        & (F.length("text") >= cfg.min_chars)
        & (F.col("boilerplate_ratio") <= cfg.max_boilerplate)
    )
    tagged = ok.withColumn("lang_pred", lang_id_col(F.lower(F.col("text"))))
    if cfg.langs:
        tagged = tagged.where(F.col("lang_pred").isin(*cfg.langs))
    if cfg.min_stop_ratio > 0:
        q = quality_cols(tagged, text_col="text", id_col="url").select(
            "url", "stop_ratio"
        )
        tagged = (
            tagged.join(q, "url")
            .where(F.col("stop_ratio") >= cfg.min_stop_ratio)
            .drop("stop_ratio")
        )
    tagged = tagged.persist()

    # exact dedup: keep each cluster's representative — the
    # lexicographically smallest url (engine-portable and deterministic;
    # a hash-based rep would not be reproducible in the SQL oracle)
    clusters = exact_dup_clusters(tagged, text_col="text", id_col="url")
    exact_kept = tagged.join(
        clusters.where(F.col("url") == F.col("cluster_rep")).select("url"),
        "url",
    ).persist()

    # near-dup removal: LSH candidates ≥ threshold; drop the higher url of
    # each pair (deterministic victim choice; transitive chains collapse
    # toward the minimum). threshold > 1 disables the pass entirely.
    if cfg.neardup_threshold <= 1.0:
        victims = (
            minhash_lsh_pairs(
                exact_kept, threshold=cfg.neardup_threshold,
                text_col="text", id_col="url",
            )
            .select(F.col("id_b").alias("url"))
            .distinct()
        )
        curated = exact_kept.join(victims, "url", "left_anti")
    else:
        curated = exact_kept
    curated = curated.select(
        "url", "text", "lang_pred", F.length("text").alias("n_chars")
    )

    funnel = _funnel(
        ("input", pages),
        ("extracted_ok", ok),
        ("lang_quality", tagged),
        ("exact_dedup", exact_kept),
        ("near_dedup", curated),
    )
    return curated, funnel


def _funnel(*stages: tuple[str, DataFrame]) -> DataFrame:
    spark = stages[0][1].sparkSession
    rows = [(i, name, df.count()) for i, (name, df) in enumerate(stages)]
    return spark.createDataFrame(rows, "stage_idx int, stage string, docs bigint")

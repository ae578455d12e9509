"""sf10_rehearsal — engine-side scale rehearsal of the pair-producing
dedup/ANN families at 100× the driver's largest tier.

Why: correctness is oracle-gated at sf0.01 and rehearsed at sf1
(BENCH.md); the remaining scale question is whether any PAIR-PRODUCING
plan (candidate joins, bucketed self-joins, iterative components)
hides super-linear growth that only shows past sf1. This tool derives
/tmp/sf10 with `make_sf_scale.py` (100×: vocabulary-bijection document
replicas, rotated embedding replicas — intra-replica pair structure
exactly preserved, cross-replica pairs exactly zero, so every
operator's OUTPUT grows exactly linearly and any super-linear WALL
growth is plan cost, not data pathology), times each query at sf1 and
sf10 on the same session, and records per-query ratios to
``SCALING_SF10.json`` (bench.py attaches it to the driver artifact).

Sub-linear gate: wall(sf10)/wall(sf1) ≤ 10 on 10× rows (ratio > 10
means the plan grew faster than its input).

Usage: python tools/sf10_rehearsal.py [--queries q1,q2,...]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)
sys.path.insert(0, REPO)

#: The pair-producing dedup/ANN contract queries (VERDICT r03 #8).
QUERIES = [
    "exact_dedup",
    "minhash_lsh",
    "simhash_neardup",
    "ngram_jaccard",
    "paragraph_dedup",
    "dup_components",
    "decontaminate",
    "semdedup",
    "embedding_neardup",
    "ann_cosine_topk",
    "ann_lsh_topk",
    "ann_ivf_pq_topk",
]


def _ensure_tier(src: str, dst: str, factor: int) -> None:
    if os.path.exists(f"{dst}/documents.parquet"):
        return
    subprocess.run(
        [sys.executable, os.path.join(HERE, "make_sf_scale.py"),
         src, dst, str(factor)],
        check=True,
    )


def main() -> int:
    names = QUERIES
    for a in sys.argv[1:]:
        if a.startswith("--queries="):
            names = a.split("=", 1)[1].split(",")

    src = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf1, sf10 = "/tmp/sf1", "/tmp/sf10"
    _ensure_tier(src, sf1, 10)
    _ensure_tier(src, sf10, 100)

    from mindocr_spark.session import get_spark

    import __spark_entry__ as E

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark(app="sf10_rehearsal", cores=cpus,
                      shuffle_partitions=cpus)
    qs = E.queries()

    def _embedding_neardup_production(spark_, sf_dir_):
        # the CONTRACT query pins n_bits=8 for its static-plane oracle
        # (valid at contract tiers ≤ sf1); at sf10's 200k vectors a
        # fixed 8 bits means ~1.5k vectors/bucket × 18 probes — the
        # exact fixed-bits blowup neardup_bits_plan exists to prevent.
        # The rehearsal therefore measures the PRODUCTION adaptive
        # plan, which is what would ship at this scale.
        from mindocr_spark.functions.similarity import (
            embedding_neardup_pairs,
        )

        emb = spark_.read.parquet(f"{sf_dir_}/embeddings.parquet")
        return embedding_neardup_pairs(emb, threshold=0.4)

    def _semdedup_production(spark_, sf_dir_):
        # the CONTRACT query uses the published k≈√n recipe with the
        # pinned-tie exact HOF assignment kernel (right for the oracle
        # tiers; both measured super-linear at sf10 — n·√n pair work
        # and 312M interpreted HOF cosine folds in the assignment).
        # The rehearsal measures the LINEAR scale plan: cluster SIZE
        # bounded via target_cluster (in-cluster pair work = n·128)
        # and the vectorized numpy assignment kernel (one matmul per
        # Arrow batch — the documented production/scale path).
        from mindocr_spark.functions.similarity import semdedup_flags

        emb = spark_.read.parquet(f"{sf_dir_}/embeddings.parquet")
        return semdedup_flags(emb, threshold=0.4, target_cluster=128,
                              assign_mode="fast")

    def _ivf_pq_production(spark_, sf_dir_):
        # same exact-vs-fast assignment-kernel story as semdedup: the
        # contract pins the HOF kernel for the oracle; at 200k vectors
        # the n×√n interpreted cosine folds are the straggler. The
        # rehearsal measures the vectorized production kernel.
        from pyspark.sql import functions as F_

        from mindocr_spark.functions.similarity import ivf_pq_topk

        # the sf10 parquet splits into ~13 input partitions — fewer
        # than cores; the CPU-heavy encode stages need the same
        # repartition-to-parallelism discipline as run_extraction
        emb = spark_.read.parquet(
            f"{sf_dir_}/embeddings.parquet"
        ).repartition(spark_.sparkContext.defaultParallelism)
        return ivf_pq_topk(
            emb, emb.where(F_.col("vec_id") < 10), dim=64, m=4,
            assign_mode="fast",
        )

    def _triplet_production(spark_, sf_dir_):
        # same repartition-to-parallelism story as IVF-PQ: the sf10
        # parquet's ~13 splits strand cores under the broadcast
        # candidate stage (100M HOF dot folds on 15 tasks). The exact
        # candidate stage is LINEAR in the corpus; the rehearsal just
        # needs it spread across the machine.
        from pyspark.sql import functions as F_

        from mindocr_spark.functions.embed import text_embed_cols
        from mindocr_spark.functions.similarity import triplet_mining

        docs = spark_.read.parquet(
            f"{sf_dir_}/documents.parquet"
        ).repartition(spark_.sparkContext.defaultParallelism)
        emb = text_embed_cols(docs).withColumnRenamed(
            "doc_id", "vec_id")
        return triplet_mining(emb, emb.where(F_.col("vec_id") < 200))

    overrides = {"embedding_neardup": _embedding_neardup_production,
                 "semdedup": _semdedup_production,
                 "ann_ivf_pq_topk": _ivf_pq_production,
                 "triplet_mining": _triplet_production}

    def run(name: str, sf_dir: str) -> tuple[float, int]:
        spark.catalog.clearCache()
        fn = overrides.get(name, qs[name])
        t0 = time.perf_counter()
        n = fn(spark, sf_dir).count()
        return time.perf_counter() - t0, n

    path = os.path.join(REPO, "SCALING_SF10.json")
    out: dict = {"factor": 10, "tiers": {"base": sf1, "x10": sf10},
                 "queries": {}, "gate": "PASS"}
    if os.path.exists(path):  # merge batches into one artifact
        with open(path) as fh:
            prev = json.load(fh)
        out["queries"].update(prev.get("queries", {}))
    for name in names:
        t1, n1 = run(name, sf1)
        t10, n10 = run(name, sf10)
        ratio = round(t10 / t1, 2) if t1 > 0 else float("inf")
        row_ratio = round(n10 / n1, 2) if n1 else None
        rec = {"sf1_sec": round(t1, 2), "sf10_sec": round(t10, 2),
               "wall_ratio": ratio, "sf1_rows": n1, "sf10_rows": n10,
               "out_row_ratio": row_ratio,
               "sublinear": ratio <= 10.0}
        out["queries"][name] = rec
        print(json.dumps({name: rec}))
    if any(not r["sublinear"] for r in out["queries"].values()):
        out["gate"] = "FAIL"
    with open(path, "w") as fh:
        json.dump(out, fh, indent=1)
    print(f"wrote {path}: gate={out['gate']}")
    spark.stop()
    return 0 if out["gate"] == "PASS" else 1


if __name__ == "__main__":
    raise SystemExit(main())

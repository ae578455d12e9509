"""pressure_bench — 10× pressure test of the dedup/ANN scale fixes.

Synthesizes a corpus ~10× sf0.1 (default 50k docs / 50k 64-dim vectors,
pure JVM expressions — no testdata dependency) with a VIRAL boilerplate
prefix on every document (the adversarial pattern the round-2 fixes
target), then times the scale-sensitive operators:

- ngram_jaccard_pairs: the df-cap keeps the shingle self-join bounded
  even though 5 shingles occur in ALL docs (uncapped, those alone are
  ~n²/2 · 5 join rows — the uncapped/capped ratio is measured at a
  smaller n where uncapped is still runnable);
- minhash_lsh_pairs / simhash_pairs_md5: signature + banded-join cost;
- ivf_topk: centroid count must stay ~√n (bounded broadcast);
- embedding_neardup_pairs: auto n_bits keeps bucket occupancy flat.

Prints one JSON line; appends a summary block to BENCH.md.
"""

from __future__ import annotations

import json
import os
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

N_DOCS = int(os.environ.get("SPARK_GRAFT_PRESSURE_DOCS", "50000"))
N_VECS = int(os.environ.get("SPARK_GRAFT_PRESSURE_VECS", "50000"))
SMALL = int(os.environ.get("SPARK_GRAFT_PRESSURE_SMALL", "4000"))

VIRAL = "subscribe to our newsletter today please"
VOCAB = [f"w{i:03d}" for i in range(500)]


def synth_docs(spark, n, dup_every: int = 100):
    """Deterministic viral-prefix corpus; every `dup_every`-th id PAIR
    (ids k, k+1 for k ≡ 0 mod dup_every) shares its text — planted
    duplicates so dedup outputs are non-empty and digests meaningful."""
    from pyspark.sql import functions as F

    vocab = F.array(*[F.lit(w) for w in VOCAB])
    eff_id = F.when(
        F.pmod(F.col("id"), F.lit(dup_every)) < 2,
        F.col("id") - F.pmod(F.col("id"), F.lit(dup_every)),
    ).otherwise(F.col("id"))
    words = F.transform(
        F.sequence(F.lit(0), F.lit(79)),
        lambda j: F.element_at(
            vocab,
            (F.pmod(F.xxhash64(F.concat(eff_id.cast("string"),
                                        F.lit(":"), j.cast("string"))),
                    F.lit(500)) + 1).cast("int"),
        ),
    )
    return spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit(VIRAL + " "), F.concat_ws(" ", words)).alias("text"),
    )


def synth_vecs(spark, n, dim=64, dup_every: int = 100):
    """Random-ish vectors; ids k, k+1 (k ≡ 0 mod dup_every) are
    identical — planted cos=1.0 near-dups for the recall cross-check."""
    from pyspark.sql import functions as F

    eff_id = F.when(
        F.pmod(F.col("id"), F.lit(dup_every)) < 2,
        F.col("id") - F.pmod(F.col("id"), F.lit(dup_every)),
    ).otherwise(F.col("id"))
    vec = F.transform(
        F.sequence(F.lit(0), F.lit(dim - 1)),
        lambda j: (
            F.pmod(F.xxhash64(F.concat(eff_id.cast("string"),
                                       F.lit("|"), j.cast("string"))),
                   F.lit(2_000_001)).cast("double") / F.lit(1_000_000.5)
            - F.lit(1.0)
        ).cast("float"),
    )
    return spark.range(n).select(
        F.col("id").alias("vec_id"), vec.alias("embedding")
    )


def timed(fn):
    t0 = time.perf_counter()
    n = fn()
    return round(time.perf_counter() - t0, 2), n


def main():
    from mindocr_spark.session import get_spark
    from mindocr_spark.cache import persist_scope
    from mindocr_spark.functions.dedup import (
        exact_dup_clusters,
        minhash_lsh_pairs,
        ngram_jaccard_pairs,
        simhash_pairs_md5,
    )
    from mindocr_spark.functions.similarity import (
        embedding_neardup_pairs,
        ivf_centroid_plan,
        ivf_topk,
        neardup_bits_plan,
    )

    # default 16: the host's memory subsystem saturates above ~16 vCPUs
    # for these workloads (BENCH.md pure-python control) — local[32]
    # would thrash past the wall and distort the measured ratios
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "16"))
    spark = get_spark(app="pressure_bench", cores=cpus,
                      shuffle_partitions=cpus)
    out: dict = {"n_docs": N_DOCS, "n_vecs": N_VECS, "cpus": cpus}

    docs = synth_docs(spark, N_DOCS).persist()
    docs.count()
    vecs = synth_vecs(spark, N_VECS).persist()
    vecs.count()

    with persist_scope():
        out["exact_dedup_s"], _ = timed(lambda: exact_dup_clusters(docs).count())
    with persist_scope():
        out["ngram_capped_s"], out["ngram_capped_pairs"] = timed(
            lambda: ngram_jaccard_pairs(docs, threshold=0.2).count()
        )
    # capped-vs-uncapped blowup, at a size where uncapped still finishes
    small = synth_docs(spark, SMALL).persist()
    small.count()
    # cap must sit BELOW the small corpus size or the viral shingles
    # (freq = SMALL) pass it and the comparison is a no-op
    with persist_scope():
        t_cap, _ = timed(
            lambda: ngram_jaccard_pairs(
                small, threshold=0.2, max_shingle_freq=SMALL // 4
            ).count()
        )
    with persist_scope():
        t_uncap, _ = timed(
            lambda: ngram_jaccard_pairs(
                small, threshold=0.2, max_shingle_freq=10**9
            ).count()
        )
    out["ngram_small_capped_s"] = t_cap
    out["ngram_small_uncapped_s"] = t_uncap
    out["ngram_cap_speedup"] = round(t_uncap / max(t_cap, 1e-9), 1)
    small.unpersist()

    with persist_scope():
        out["minhash_lsh_s"], out["minhash_pairs"] = timed(
            lambda: minhash_lsh_pairs(docs, threshold=0.5).count()
        )
    with persist_scope():
        out["simhash_md5_s"], out["simhash_pairs"] = timed(
            lambda: simhash_pairs_md5(docs, max_hamming=3).count()
        )

    k, stride = ivf_centroid_plan(N_VECS)
    out["ivf_centroids"] = k
    with persist_scope():
        out["ivf_topk_fast_s"], _ = timed(
            lambda: ivf_topk(
                vecs, vecs.where("vec_id < 20"), k=5, assign_mode="fast"
            ).count()
        )
    with persist_scope():
        out["ivf_topk_exact_s"], _ = timed(
            lambda: ivf_topk(
                vecs, vecs.where("vec_id < 20"), k=5
            ).count()
        )
    out["neardup_bits"] = neardup_bits_plan(N_VECS)
    out["neardup_bucket_occupancy"] = round(
        N_VECS / (1 << out["neardup_bits"]), 3
    )
    with persist_scope():
        out["embedding_neardup_s"], out["embedding_neardup_pairs"] = timed(
            lambda: embedding_neardup_pairs(vecs, threshold=0.95).count()
        )

    print(json.dumps(out))
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from scaling_bench import upsert_bench_section

    upsert_bench_section(
        "Pressure bench (10× sf0.1 synthetic, viral-prefix corpus)",
        "```json\n" + json.dumps(out, indent=2) + "\n```",
    )
    spark.stop()


if __name__ == "__main__":
    main()

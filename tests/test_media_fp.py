"""Perceptual-hash image near-dup: signature exactness, banding
recall guarantee, failure flow, plan shape."""
import numpy as np
import pytest
from pyspark.sql import functions as F

from mindocr_spark.functions.media_fp import (
    _ahash_bands,
    ahash_signatures,
    phash_near_dup_pairs,
    synth_phash_corpus,
)
from mindocr_spark.multimodal import encode_bmp


def _ref_sig(b: int, t: int) -> list[int]:
    """Independent twin of the corpus formula + aHash (numpy only)."""
    y, x = np.meshgrid(np.arange(8), np.arange(8), indexing="ij")
    g = (b * 97 + x * (13 + b % 11) + y * (31 + b % 7)
         + x * y * (3 + b % 5)) % 256
    g = g.astype(np.int64)
    if t == 1:
        g[0, 0] = (g[0, 0] + 128) % 256
    elif t == 2:
        for d in range(3):
            g[d, d] = (g[d, d] + 128) % 256
    return _ahash_bands(g.astype(np.float64))


def test_signatures_match_reference_formula(spark):
    sigs = ahash_signatures(synth_phash_corpus(spark, 24)).orderBy("id")
    for r in sigs.collect():
        assert not r.failed
        assert [r.h0, r.h1, r.h2, r.h3] == _ref_sig(r.id // 3, r.id % 3)


def test_upsampled_images_pool_to_same_signature(spark):
    """Odd bases render at 16×16 (2×2 constant blocks) — the mean-pool
    must land on the identical 8×8 grid, so triples (3b, 3b+1, 3b+2)
    at 16×16 hash exactly like their 8×8 twins would."""
    sigs = {
        r.id: (r.h0, r.h1, r.h2, r.h3)
        for r in ahash_signatures(synth_phash_corpus(spark, 12)).collect()
    }
    for iid, got in sigs.items():
        assert list(got) == _ref_sig(iid // 3, iid % 3)


def test_banding_finds_every_small_hamming_pair(spark):
    """Pigeonhole recall: the banded join's pair set equals the exact
    all-pairs Hamming ≤ 3 set computed driver-side."""
    sigs = ahash_signatures(synth_phash_corpus(spark, 48))
    got = {
        (r.id_a, r.id_b, r.hamming)
        for r in phash_near_dup_pairs(sigs, max_hamming=3).collect()
    }
    rows = sigs.collect()
    want = set()
    for i, a in enumerate(rows):
        for b in rows[i + 1:]:
            ham = sum(
                bin(x ^ y).count("1")
                for x, y in zip(
                    (a.h0, a.h1, a.h2, a.h3), (b.h0, b.h1, b.h2, b.h3)
                )
            )
            if ham <= 3:
                lo, hi = sorted((a.id, b.id))
                want.add((lo, hi, ham))
    assert got == want and len(want) > 0


def test_planted_variants_are_found(spark):
    """Every (3b, 3b+1) flip-one-cell pair must surface (a one-cell
    +128 flip moves at most a couple of threshold bits)."""
    pairs = {
        (r.id_a, r.id_b)
        for r in phash_near_dup_pairs(
            ahash_signatures(synth_phash_corpus(spark, 96))
        ).collect()
    }
    for b in range(0, 96 // 3):
        assert (3 * b, 3 * b + 1) in pairs


def test_max_hamming_guardrail():
    with pytest.raises(ValueError):
        phash_near_dup_pairs(None, max_hamming=4)


def test_non_poolable_and_non_image_flag_failed(spark):
    import pandas as pd

    pix = np.zeros((6, 6, 3), dtype=np.uint8)  # 6 not divisible by 8
    pdf = pd.DataFrame([
        dict(id=0, payload=encode_bmp(pix),
             media_meta=dict(kind="image", width=6, height=6, n_frames=1,
                             sample_rate=0, codec="bmp")),
        dict(id=1, payload=b"not a bmp",
             media_meta=dict(kind="audio", width=0, height=0, n_frames=8,
                             sample_rate=16000, codec="pcm16")),
    ])
    from mindocr_spark.multimodal import MEDIA_META_DDL
    df = spark.createDataFrame(
        pdf, schema=f"id bigint, payload binary, {MEDIA_META_DDL}"
    )
    out = {r.id: r.failed for r in ahash_signatures(df).collect()}
    assert out == {0: True, 1: True}


def test_pair_plan_is_band_join_not_cartesian(spark):
    plan = phash_near_dup_pairs(
        ahash_signatures(synth_phash_corpus(spark, 24))
    )._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "SortMergeJoin" in plan or "BroadcastHashJoin" in plan


# -- audio fingerprint ------------------------------------------------------


def _audio_bits(b: int, t: int) -> int:
    h = (b * 48271 + 11) % 65536
    h |= 1
    h &= ~(1 << 15)
    if t == 1:
        h ^= 1 << (b % 14 + 1)
    elif t == 2:
        h ^= (1 << (b % 7 + 1)) | (1 << (b % 5 + 8))
    return h


def test_audio_fp_signature_matches_envelope_pattern(spark):
    """Decoded real-WAV fingerprints must equal the generator's bit
    field: a frame plays loud (1000) exactly when its pattern bit is
    set, and loud > clip mean > quiet always holds for mixed
    patterns."""
    from mindocr_spark.functions.media_fp import (
        audio_fp_signatures,
        synth_audio_fp_corpus,
    )

    sigs = audio_fp_signatures(synth_audio_fp_corpus(spark, 24))
    for r in sigs.collect():
        assert not r.failed
        want = _audio_bits(r.id // 3, r.id % 3)
        assert r.f0 | (r.f1 << 8) == want


def test_audio_fp_planted_one_frame_variants_found(spark):
    """(3b, 3b+1) differs by one toggled frame — Hamming 1, always
    recalled; (3b, 3b+2) differs by two — excluded at threshold 1."""
    from mindocr_spark.functions.media_fp import (
        audio_fp_near_dup_pairs,
        audio_fp_signatures,
        synth_audio_fp_corpus,
    )

    pairs = {
        (r.id_a, r.id_b): r.hamming
        for r in audio_fp_near_dup_pairs(
            audio_fp_signatures(synth_audio_fp_corpus(spark, 96))
        ).collect()
    }
    for b in range(32):
        assert pairs[(3 * b, 3 * b + 1)] == 1
        assert (3 * b, 3 * b + 2) not in pairs


def test_audio_fp_guardrails(spark):
    import pandas as pd

    from mindocr_spark.functions.media_fp import (
        audio_fp_near_dup_pairs,
        audio_fp_signatures,
    )
    from mindocr_spark.multimodal import MEDIA_META_DDL, encode_wav

    with pytest.raises(ValueError):
        audio_fp_near_dup_pairs(None, max_hamming=2)
    # 20 samples: not divisible by 16 frames → failed
    s = np.arange(20, dtype=np.int16)
    pdf = pd.DataFrame([
        dict(id=0, payload=encode_wav(s),
             media_meta=dict(kind="audio", width=0, height=0, n_frames=20,
                             sample_rate=16000, codec="pcm16")),
    ])
    df = spark.createDataFrame(
        pdf, schema=f"id bigint, payload binary, {MEDIA_META_DDL}"
    )
    assert audio_fp_signatures(df).collect()[0].failed


def test_hot_bucket_cap_drops_degenerate_buckets_only(spark):
    """With a cap, a planted pile of identical (degenerate) images
    stops pairing, while distinct near-dup pairs still surface through
    their un-hot bands."""
    from mindocr_spark.functions.media_fp import (
        ahash_signatures,
        phash_near_dup_pairs,
        synth_phash_corpus,
    )

    sigs = ahash_signatures(synth_phash_corpus(spark, 48))
    uncapped = {
        (r.id_a, r.id_b)
        for r in phash_near_dup_pairs(sigs).collect()
    }
    capped = {
        (r.id_a, r.id_b)
        for r in phash_near_dup_pairs(sigs, max_bucket_size=2).collect()
    }
    assert capped <= uncapped
    # triples collide 3-wide in shared bands: cap=2 must shrink the set
    assert len(capped) < len(uncapped)
    with pytest.raises(ValueError):
        phash_near_dup_pairs(sigs, max_bucket_size=1)

"""Perceptual media fingerprinting — near-duplicate IMAGE detection
over real codec bytes.

The text side of the engine has a full near-dup family (minhash,
simhash, shingle-Jaccard, embeddings); a multimodal training-data
pipeline needs the same capability for its image payloads: crawls are
full of re-hosted thumbnails, recompressed logos and watermarked
copies that byte-level exact dedup (`exact_dedup` on md5) can never
collapse. The standard cheap signal is the perceptual AVERAGE HASH
(aHash): grayscale → fixed 8×8 mean-pool → one bit per cell
(above/below the image's own mean) → 64-bit signature; visually
near-identical images differ in a few bits, so near-dup pairs are
exactly the small-Hamming-distance pairs.

Cross-engine determinism: every step is integer/IEEE-exact — channel
mean of uint8 is an exact double, the 8×8 block pool averages 2^k·2^k
integers (exact in IEEE), the global mean divides a ≤16320 integer sum
by 64 (exact), and the bit is a strict `>` compare — so a SQL oracle
that rebuilds the pixel formula of the synthetic corpus reproduces the
signature bit-for-bit while the Spark side decodes REAL BMP bytes
(the DecodeImage contract,
reference: mindocr/data/transforms/general_transforms.py:25-64).

Signature layout: four 16-bit bands (h0..h3) instead of one 64-bit
word — the banding IS the scale path (pigeonhole: Hamming ≤ 3 over 64
bits guarantees at least one of the 4 bands matches exactly, the same
guarantee simhash_near_dup_pairs uses), and it sidesteps DuckDB's
checked `<<` which refuses bit 63.

100 TB shape: signatures are one narrow mapInPandas over the payload
scan (no shuffle); candidate generation is a band-key equi-join —
bucket-bounded, never all-pairs; the exact Hamming verify runs only on
candidates. reference lineage for the fan-out/verify split:
deploy/py_infer/src/parallel/module/detection (propose) vs
recognition (verify) stages.
"""
from __future__ import annotations

from typing import Callable, Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from mindocr_spark.multimodal import (
    MEDIA_META_DDL,
    encode_bmp,
    encode_wav,
    real_decode,
)

AHASH_SCHEMA = "id bigint, h0 int, h1 int, h2 int, h3 int, failed boolean"

#: mean-pool grid — 8×8 = 64 bits = 4 bands × 16 bits
_GRID = 8


def _ahash_bands(gray: np.ndarray) -> list[int]:
    """8×8 float grid → four 16-bit band ints. Bit i (= y·8+x, row
    major) is set when the cell is STRICTLY above the grid mean; bit i
    lands in band i//16 at position i%16. Exactly the layout the SQL
    oracle states."""
    mean = float(gray.sum()) / float(gray.size)
    bits = (gray > mean).astype(np.int64).ravel()
    bands = [0, 0, 0, 0]
    for i, b in enumerate(bits):
        if b:
            bands[i // 16] |= 1 << (i % 16)
    return bands


def ahash_signatures(
    media: DataFrame,
    decode: Callable[[bytes, str], np.ndarray] = real_decode,
) -> DataFrame:
    """(id, payload, media_meta) → perceptual-hash signature per image.

    One narrow ``mapInPandas`` (Arrow batches, no per-row Python UDF):
    decode the real payload bytes → grayscale by exact channel mean →
    mean-pool to the 8×8 grid (requires side to be a multiple of 8;
    anything else flags ``failed`` — a production resampler would
    interpolate, which has no exact cross-engine twin) → threshold on
    the grid's own mean → four 16-bit bands. Non-image payloads and
    decode failures flag ``failed=true`` and flow through (the
    reference's skip=True contract,
    reference: deploy/py_infer/src/parallel/datatype/process_data.py:7-26).
    """

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for rid, payload, meta in zip(
                pdf["id"], pdf["payload"], pdf["media_meta"]
            ):
                kind = (meta or {}).get("kind", "unknown")
                row = dict(id=rid, h0=0, h1=0, h2=0, h3=0, failed=True)
                try:
                    if kind != "image":
                        raise ValueError("not an image payload")
                    pix = decode(bytes(payload or b""), kind)
                    h, w = pix.shape[0], pix.shape[1]
                    if h != w or h % _GRID:
                        raise ValueError(f"side {h}x{w} not poolable")
                    gray = pix.astype(np.float64).mean(axis=2)
                    f = h // _GRID
                    pooled = gray.reshape(_GRID, f, _GRID, f).mean(
                        axis=(1, 3)
                    )
                    bands = _ahash_bands(pooled)
                    row.update(
                        h0=bands[0], h1=bands[1], h2=bands[2],
                        h3=bands[3], failed=False,
                    )
                except Exception:
                    pass
                out.append(row)
            if out:
                yield pd.DataFrame(out)

    return media.select("id", "payload", "media_meta").mapInPandas(
        fn, schema=AHASH_SCHEMA
    )


def phash_near_dup_pairs(
    sigs: DataFrame,
    max_hamming: int = 3,
    max_bucket_size: int | None = None,
) -> DataFrame:
    """Signatures → near-dup image pairs (id_a < id_b, hamming ≤
    `max_hamming`).

    Candidate generation is the simhash banding discipline
    (functions/dedup.py simhash_near_dup_pairs): explode each
    signature into its four (band_idx, band_val) keys, equi-join on
    the key — pigeonhole guarantees every pair within Hamming
    ``4·ceil((max_hamming+1)/4) - 1 ≥ 3`` of each other collides in at
    least one band, so for the default 3 the candidate set provably
    contains every true pair. The exact Hamming verify
    (``bit_count(xor)`` per band, summed — whole-stage codegen) then
    drops false candidates. Join cost is Σ bucket², bounded by band
    cardinality (2^16 per band) — never all-pairs.

    `max_bucket_size` is the hot-bucket cap for web-scale corpora
    (the simhash_near_dup_pairs discipline): solid fills, blank scans
    and letterboxed thumbnails all hash to a handful of degenerate
    signatures whose buckets grow with corpus size, turning Σ bucket²
    quadratic. Capping drops those buckets whole — an explicit recall
    trade documented to the caller, OFF by default so the
    oracle-verified configuration is the production default (the
    ngram df-cap lesson)."""
    if not 0 <= max_hamming <= 3:
        raise ValueError(
            "banding over 4 bands guarantees recall only for "
            f"max_hamming ≤ 3, got {max_hamming}"
        )
    return _banded_hamming_pairs(
        sigs, ["h0", "h1", "h2", "h3"], max_hamming, max_bucket_size
    )


def _banded_hamming_pairs(
    sigs: DataFrame,
    band_cols: list[str],
    max_hamming: int,
    max_bucket_size: int | None,
) -> DataFrame:
    """Shared banded-Hamming join behind both media pair families
    (image 4×16-bit, audio 2×8-bit): explode signatures into
    (band_idx, band_val) keys, cap hot buckets with a count window ON
    THE JOIN KEY (exchange reuse — the `dedup._bucket_capped`
    discipline; a dropped bucket loses only the recall that band
    contributed), self-join on the key, exact `bit_count(xor)` verify.

    The keyed relation is PERSISTED: it feeds both join sides, so an
    unpersisted plan would re-run the upstream codec-decode
    mapInPandas — the dominant cost — once per side (the
    simhash/minhash persist discipline, dedup.py)."""
    from mindocr_spark.cache import tracked_persist

    if max_bucket_size is not None and max_bucket_size < 2:
        raise ValueError(
            f"max_bucket_size must allow pairs (≥ 2), got {max_bucket_size}"
        )
    ok = sigs.where(~F.col("failed"))
    keyed = ok.select(
        "id", *band_cols,
        F.posexplode(F.array(*band_cols)).alias("band_idx", "band_val"),
    )
    if max_bucket_size is not None:
        bw = Window.partitionBy("band_idx", "band_val")
        keyed = (
            keyed.withColumn("_bn", F.count(F.lit(1)).over(bw))
            .where(F.col("_bn") <= max_bucket_size)
            .drop("_bn")
        )
    keyed = tracked_persist(keyed)
    a = keyed.select(
        F.col("id").alias("id_a"),
        *[F.col(c).alias(f"a{i}") for i, c in enumerate(band_cols)],
        "band_idx", "band_val",
    )
    b = keyed.select(
        F.col("id").alias("id_b"),
        *[F.col(c).alias(f"b{i}") for i, c in enumerate(band_cols)],
        "band_idx", "band_val",
    )
    ham = F.lit(0)
    for i in range(len(band_cols)):
        ham = ham + F.bit_count(
            F.col(f"a{i}").bitwiseXOR(F.col(f"b{i}"))
        )
    return (
        a.join(b, ["band_idx", "band_val"])
        .where(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", ham.alias("hamming"))
        .where(F.col("hamming") <= max_hamming)
        .distinct()
    )


AUDIO_FP_SCHEMA = "id bigint, f0 int, f1 int, failed boolean"

#: audio fingerprint frame count — 16 bits = 2 bands × 8 bits
_FRAMES = 16


def audio_fp_signatures(
    media: DataFrame,
    decode: Callable[[bytes, str], np.ndarray] = real_decode,
) -> DataFrame:
    """(id, payload, media_meta) → 16-bit loudness-profile fingerprint
    per audio clip, as two 8-bit bands (f0, f1).

    The audio twin of :func:`ahash_signatures` — the standard cheap
    acoustic signature (Haitsma–Kalker family, reduced to the
    energy-envelope bit): split the clip into 16 equal frames, one bit
    per frame — is its mean |amplitude| STRICTLY above the clip's
    global mean |amplitude|? Re-encoded, resampled-by-integer or
    re-hosted copies keep the envelope, so near-dups differ in ≤ 1
    bit. Every step is exact cross-engine: |int16| sums are exact
    integers and each mean is ONE correctly-rounded IEEE division.

    Clips whose sample count isn't divisible by 16, non-audio payloads
    and decode failures flag ``failed=true`` and flow through."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for rid, payload, meta in zip(
                pdf["id"], pdf["payload"], pdf["media_meta"]
            ):
                kind = (meta or {}).get("kind", "unknown")
                row = dict(id=rid, f0=0, f1=0, failed=True)
                try:
                    if kind != "audio":
                        raise ValueError("not an audio payload")
                    s = decode(bytes(payload or b""), kind)
                    s = np.asarray(s, dtype=np.int64).ravel()
                    if s.size == 0 or s.size % _FRAMES:
                        raise ValueError(f"{s.size} samples not framable")
                    a = np.abs(s)
                    fl = s.size // _FRAMES
                    gm = float(a.sum()) / float(s.size)
                    bits = 0
                    for f in range(_FRAMES):
                        fm = float(a[f * fl:(f + 1) * fl].sum()) / float(fl)
                        if fm > gm:
                            bits |= 1 << f
                    row.update(
                        f0=bits & 0xFF, f1=(bits >> 8) & 0xFF,
                        failed=False,
                    )
                except Exception:
                    pass
                out.append(row)
            if out:
                yield pd.DataFrame(out)

    return media.select("id", "payload", "media_meta").mapInPandas(
        fn, schema=AUDIO_FP_SCHEMA
    )


def audio_fp_near_dup_pairs(
    sigs: DataFrame,
    max_hamming: int = 1,
    max_bucket_size: int | None = None,
) -> DataFrame:
    """Fingerprints → near-dup clip pairs (id_a < id_b, hamming ≤
    `max_hamming`). Two 8-bit bands: pigeonhole guarantees full recall
    for Hamming ≤ 1; the band equi-join is bucket-bounded (≤ 2^8 keys
    per band), the exact bit_count(xor) verify drops false candidates.
    `max_bucket_size` drops degenerate hot buckets (silence hashes to
    0 everywhere) — see :func:`phash_near_dup_pairs`; OFF by default
    so the verified configuration is the production default."""
    if not 0 <= max_hamming <= 1:
        raise ValueError(
            "banding over 2 bands guarantees recall only for "
            f"max_hamming ≤ 1, got {max_hamming}"
        )
    return _banded_hamming_pairs(
        sigs, ["f0", "f1"], max_hamming, max_bucket_size
    )


def synth_audio_fp_corpus(spark, n: int = 96) -> DataFrame:
    """Deterministic near-dup-planted REAL-WAV corpus for the audio
    fingerprint family. Ids come in triples sharing a base ``b =
    id//3``: the 16-frame loudness pattern is the bit field ``h =
    ((b·48271 + 11) mod 65536) | 1, bit 15 cleared`` (an LCG step —
    patterns are near-uniform over the 15-bit space, so 32 bases
    don't alias); frame f plays at amplitude 1000 when bit f is set,
    else 10, as an alternating ±amplitude square wave of 8 samples
    (so |amplitude| is exactly the level). Variant 1 toggles ONE frame
    (Hamming 1 from base — always recalled at the default threshold);
    variant 2 toggles two frames (Hamming 2 — stays out, the negative
    control). Payloads are REAL 16-bit PCM WAV bytes (encode_wav →
    the stdlib wave decoder)."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for i in pdf["id"]:
                i = int(i)
                b, t = i // 3, i % 3
                h = (b * 48271 + 11) % 65536
                h |= 1
                h &= ~(1 << 15)
                if t == 1:
                    h ^= 1 << (b % 14 + 1)
                elif t == 2:
                    h ^= (1 << (b % 7 + 1)) | (1 << (b % 5 + 8))
                s = np.zeros(_FRAMES * 8, dtype=np.int16)
                for f in range(_FRAMES):
                    lvl = 1000 if (h >> f) & 1 else 10
                    for j in range(8):
                        s[f * 8 + j] = lvl if j % 2 == 0 else -lvl
                rows.append(dict(
                    id=i, payload=encode_wav(s),
                    media_meta=dict(kind="audio", width=0, height=0,
                                    n_frames=int(s.size),
                                    sample_rate=16000, codec="pcm16"),
                ))
            if rows:
                yield pd.DataFrame(rows)

    return spark.range(n).mapInPandas(
        gen, schema=f"id bigint, payload binary, {MEDIA_META_DDL}"
    )


def synth_phash_corpus(spark, n: int = 96) -> DataFrame:
    """Deterministic near-dup-planted REAL-BMP corpus for the
    perceptual-hash family. Ids come in triples sharing a base
    ``b = id//3``: variant ``t = id%3`` 0 is the base image, 1 flips
    one grid cell by +128 (Hamming ~1 from the base), 2 flips three
    diagonal cells (Hamming ~3) — so the planted near-dup structure is
    a pure function of id that a SQL oracle restates. The 8×8 grid
    value is ``(b·97 + x·(13+b%11) + y·(31+b%7) + x·y·(3+b%5)) mod
    256`` (per-base-varying slopes — a constant-offset gradient would
    alias across bases since aHash is invariant to global shifts);
    even bases render at 8×8, odd bases at 16×16 with each 2×2 block
    constant (so the engine's mean-pool is exercised and stays
    integer-exact). All three channels carry the grid value, making
    channel-mean grayscale exact. Payloads are REAL 24-bit BMP bytes
    (encode_bmp → the stdlib struct decoder)."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for i in pdf["id"]:
                i = int(i)
                b, t = i // 3, i % 3
                y, x = np.meshgrid(
                    np.arange(_GRID), np.arange(_GRID), indexing="ij"
                )
                g = (
                    b * 97 + x * (13 + b % 11) + y * (31 + b % 7)
                    + x * y * (3 + b % 5)
                ) % 256
                if t == 1:
                    g[0, 0] = (g[0, 0] + 128) % 256
                elif t == 2:
                    for d in range(3):
                        g[d, d] = (g[d, d] + 128) % 256
                if b % 2 == 1:  # upsample 2×: constant 2×2 blocks
                    g = np.repeat(np.repeat(g, 2, axis=0), 2, axis=1)
                pix = np.repeat(
                    g.astype(np.uint8)[:, :, None], 3, axis=2
                )
                side = pix.shape[0]
                rows.append(dict(
                    id=i, payload=encode_bmp(pix),
                    media_meta=dict(kind="image", width=side, height=side,
                                    n_frames=1, sample_rate=0, codec="bmp"),
                ))
            if rows:
                yield pd.DataFrame(rows)

    return spark.range(n).mapInPandas(
        gen, schema=f"id bigint, payload binary, {MEDIA_META_DDL}"
    )

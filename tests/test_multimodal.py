"""Multimodal plumbing: Spark-side contract is real, codec is stubbed."""

import hashlib

import pytest


def test_real_decode_is_stubbed():
    from mindocr_spark.multimodal import real_decode

    with pytest.raises(NotImplementedError):
        real_decode(b"xx", "image")


def test_media_features_with_fake_codec(spark):
    from mindocr_spark.multimodal import (
        extract_media_features,
        fake_decode,
        synth_media_table,
    )

    media = synth_media_table(spark, n=12, seed=7)
    out = {r["id"]: r for r in
           extract_media_features(media, decode=fake_decode).collect()}
    assert len(out) == 12
    assert out[0]["kind"] == "image" and out[1]["kind"] == "audio"
    assert not any(r["failed"] for r in out.values())
    # checksum matches an independent recomputation of the payload spec
    n = (0 * 37 + 7) % 29 + 2
    payload = (hashlib.md5(b"7:0").hexdigest() + "|") * n
    assert out[0]["checksum"] == hashlib.md5(payload.encode()).hexdigest()
    assert out[0]["n_bytes"] == 33 * n
    assert len(out[0]["feature"]) == 8


def test_media_failure_flows_through(spark):
    """A failing codec marks failed=true instead of killing the job —
    the reference's skip=True contract."""
    from mindocr_spark.multimodal import extract_media_features, synth_media_table

    def bad_decode(payload, kind):
        raise ValueError("corrupt")

    media = synth_media_table(spark, n=5, seed=7)
    rows = extract_media_features(media, decode=bad_decode).collect()
    assert len(rows) == 5
    assert all(r["failed"] for r in rows)
    assert all(r["n_bytes"] > 0 for r in rows)  # metadata still populated


def test_size_bucketing_partitions(spark):
    from mindocr_spark.multimodal import size_bucketed, synth_media_table

    media = synth_media_table(spark, n=32, seed=7)
    assert size_bucketed(media, 4).rdd.getNumPartitions() == 4

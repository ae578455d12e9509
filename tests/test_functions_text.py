"""Unit goldens for functions.text — exact expected values, the pattern
of the reference's metric goldens (tests/ut/test_metrics.py:31-80)."""

import pytest
from pyspark.sql import functions as F


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id bigint, text string")


def test_token_stats_exact(spark):
    from mindocr_spark.functions.text import token_stats

    df = _docs(spark, [(1, "a b  c a"), (2, "   x   "), (3, "one")])
    out = {r["doc_id"]: r for r in token_stats(df).collect()}
    assert out[1]["n_tokens"] == 4
    assert out[1]["n_distinct_tokens"] == 3
    assert out[1]["n_chars_norm"] == 7  # "a b c a"
    assert out[2]["n_tokens"] == 1 and out[2]["n_chars_norm"] == 1
    assert out[3]["n_tokens"] == 1


def test_quality_exact_ratios(spark):
    from mindocr_spark.functions.text import quality_cols

    # 4 tokens, 2 stop hits ("the", "of"), ratio = 0.5 exactly
    df = _docs(spark, [(1, "the cat of doom.")])
    r = quality_cols(df).collect()[0]
    assert r["n_tokens"] == 4
    assert r["stop_hits"] == 2
    assert r["n_punct"] == 1
    assert r["stop_ratio"] == 0.5
    # avg_token_len: chars 13 ("thecatofdoom."), /4 = 3.25 exactly
    assert r["avg_token_len"] == 3.25


def test_lang_id_heuristic(spark):
    from mindocr_spark.functions.text import lang_id_col

    df = _docs(spark, [
        (1, "the cat is on the mat and it is warm"),
        (2, "der hund ist nicht mit der katze"),
        (3, "el perro es de la casa y es grande"),
        (4, "山水风月 天地人间"),
        (5, "zzz qqq www"),
    ])
    out = {r["doc_id"]: r["pred"] for r in df.select(
        "doc_id", lang_id_col("text").alias("pred")).collect()}
    assert out == {1: "en", 2: "de", 3: "es", 4: "zh", 5: "unknown"}


def test_rec_metrics_reference_golden(spark):
    """The reference's RecMetric golden: acc 0.5, norm edit distance
    ≈ 0.92857 (reference: tests/ut/test_metrics.py:69-80 — preds
    ['ab','cd','ede'] vs labels ['ab','cf','ede'] in spirit)."""
    from mindocr_spark.functions.text import rec_metrics

    pairs = spark.createDataFrame(
        [("hello", "hello"), ("worla", "world")], "pred string, label string"
    )
    rows = rec_metrics(pairs).collect()
    acc = sum(r["exact"] for r in rows) / len(rows)
    assert acc == 0.5
    by_pred = {r["pred"]: r for r in rows}
    assert by_pred["hello"]["lev"] == 0 and by_pred["hello"]["norm_ed"] == 1.0
    assert by_pred["worla"]["lev"] == 1
    assert by_pred["worla"]["norm_ed"] == pytest.approx(1 - 1 / 5, abs=1e-9)


def test_fingerprint_md5_normalization_invariance(spark):
    from mindocr_spark.functions.text import fingerprint_md5

    df = spark.createDataFrame(
        [(1, "Hello  World"), (2, " hello world "), (3, "different")],
        "doc_id bigint, text string",
    )
    rows = df.select("doc_id", fingerprint_md5("text").alias("fp")).collect()
    fp = {r["doc_id"]: r["fp"] for r in rows}
    assert fp[1] == fp[2]          # case+whitespace-insensitive identity
    assert fp[1] != fp[3]


def test_word_shingles_and_rolling_fp(spark):
    from mindocr_spark.functions.text import rolling_fingerprints, word_shingles

    df = _docs(spark, [(1, "a b c d")])
    sh = sorted(r["shingle"] for r in word_shingles(df, k=3).collect())
    assert sh == ["a b c", "b c d"]
    # rolling fingerprints: deterministic 1/16 sample of distinct grams —
    # needs high-entropy text (a periodic string has ~10 distinct grams)
    import hashlib

    long_text = "".join(
        hashlib.md5(str(i).encode()).hexdigest() for i in range(16)
    )  # 512 chars, ~505 distinct 8-grams
    fps = rolling_fingerprints(_docs(spark, [(1, long_text)]), k=8)
    n = fps.count()
    assert 1 <= n < 505  # nonempty but a strict sample

"""Exact-substring dup flags (content-defined gram sample) and
quality-aware prefix-cluster survivor selection."""

import pytest


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id bigint, text string")


def test_substring_flags_catch_long_shared_run(spark):
    from mindocr_spark.functions.dedup import substring_dup_flags

    shared = "x" * 0  # build a long distinctive run
    run = ("the quick brown fox jumps over the lazy dog while carrying "
           "a basket of fresh bread to the market square at dawn")
    docs = _docs(spark, [
        (1, "intro paragraph alpha. " + run + " outro one."),
        (2, "totally different beginning here. " + run + " and more."),
        (3, "no overlap with anything else in this tiny corpus at all "
            "just unique words strung together forever and ever amen"),
        (4, "short"),  # below k: zero grams, never a dup
    ])
    got = {r["doc_id"]: r for r in
           substring_dup_flags(docs, k=40).orderBy("doc_id").collect()}
    # min-id survivor rule: doc 1 keeps, doc 2 flags
    assert got[1]["is_dup"] is False
    assert got[2]["is_dup"] is True
    assert got[2]["n_shared_grams"] >= 1
    assert got[3]["is_dup"] is False
    assert (got[4]["n_grams"], got[4]["is_dup"]) == (0, False)


def test_substring_sample_is_content_defined(spark):
    """The same run must select the same grams regardless of its
    position in the doc (the fixed-stride phase bug this design
    avoids)."""
    from mindocr_spark.functions.dedup import substring_dup_flags

    run = ("winnowing style selection picks grams by their bytes not "
           "their offsets so shifted copies still collide exactly")
    docs = _docs(spark, [
        (10, run),
        (11, "z" * 7 + run),       # shifted by a prime offset
        (12, "q" * 13 + run + "!"),
    ])
    got = {r["doc_id"]: r["is_dup"] for r in
           substring_dup_flags(docs, k=40).collect()}
    assert got == {10: False, 11: True, 12: True}


def test_prefix_survivor_prefers_quality(spark):
    from mindocr_spark.functions.dedup import prefix_dup_survivors

    base = ("the cat sat on the mat and it was a fine day for all of "
            "the animals in the garden to rest in the sun by the wall "
            "of the old house where the wind is soft and the grass is "
            "green and it is quiet for hours on end every day")
    assert len(base) >= 200
    docs = _docs(spark, [
        (5, base + " $$$ buy now $$$"),   # degraded copy, LOWER id
        (9, base),                         # clean copy, higher id
        (7, "an unrelated doc that is long enough to stand alone in "
            "its own cluster with plenty of words of the usual kind "
            "to make it over the two hundred character threshold for "
            "the prefix fingerprint to be a true prefix of the text"),
    ])
    got = {r["doc_id"]: r for r in
           prefix_dup_survivors(docs, prefix_chars=200).collect()}
    # quality beats id order: the clean higher-id copy survives
    assert got[9]["is_survivor"] is True
    assert got[5]["is_survivor"] is False
    assert got[5]["survivor_id"] == 9 and got[5]["cluster_size"] == 2
    assert got[7]["is_survivor"] is True and got[7]["cluster_size"] == 1


def test_prefix_survivor_tie_breaks_min_id(spark):
    from mindocr_spark.functions.dedup import prefix_dup_survivors

    t = "z " * 150  # zero stopwords → stop_ratio ties at 0.0
    docs = _docs(spark, [(21, t), (20, t), (22, t)])
    got = {r["doc_id"]: r["survivor_id"] for r in
           prefix_dup_survivors(docs, prefix_chars=200).collect()}
    assert got == {20: 20, 21: 20, 22: 20}

"""Unigram LM perplexity gate — exact-math goldens and edge rows."""

import math

import pytest


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id bigint, text string")


def _expected_logppl(lm_corpus, doc, quant=9):
    """Straight-line reference with the engine's quantization: Laplace
    p=(c+1)/(total+V), nlp=round(-ln p, 9), mean = exact-sum / n."""
    counts = {}
    for t in lm_corpus.split():
        counts[t] = counts.get(t, 0) + 1
    total = sum(counts.values())
    v = len(counts) + 1
    toks = doc.split()
    s = 0.0
    oov = 0
    for t in toks:
        c = counts.get(t, 0)
        if c == 0:
            oov += 1
        s += round(-math.log((c + 1) / (total + v)), quant)
    return len(toks), oov, s, (s / len(toks) if toks else None)


def test_logppl_matches_straight_line_reference(spark):
    from mindocr_spark.functions.lm import unigram_counts, unigram_logppl

    lm_text = "the cat sat on the mat the cat"
    lm = unigram_counts(_docs(spark, [(100, lm_text)]))
    docs = _docs(spark, [
        (1, "the cat"),          # fully in-vocab
        (2, "the zebra"),        # one OOV
        (3, "zebra quagga okapi"),  # all OOV
    ])
    got = {r["doc_id"]: r for r in unigram_logppl(docs, lm).collect()}
    for doc_id, text in [(1, "the cat"), (2, "the zebra"),
                         (3, "zebra quagga okapi")]:
        n, oov, s, mean = _expected_logppl(lm_text, text)
        r = got[doc_id]
        assert r["n_tokens"] == n
        assert r["n_oov"] == oov
        assert float(r["neg_logprob_sum"]) == pytest.approx(s, abs=1e-9)
        assert float(r["logppl"]) == pytest.approx(mean, rel=1e-12)
    # fluent text scores strictly lower than OOV-only text
    assert got[1]["logppl"] < got[3]["logppl"]


def test_zero_token_doc_reported_with_null_logppl(spark):
    from mindocr_spark.functions.lm import unigram_counts, unigram_logppl

    lm = unigram_counts(_docs(spark, [(9, "a b")]))
    out = {r["doc_id"]: r for r in unigram_logppl(
        _docs(spark, [(1, "a"), (2, "   "), (3, "")]), lm
    ).collect()}
    assert set(out) == {1, 2, 3}  # nothing vanishes
    assert out[1]["logppl"] is not None
    for d in (2, 3):
        assert out[d]["n_tokens"] == 0
        assert out[d]["logppl"] is None
        assert float(out[d]["neg_logprob_sum"]) == 0.0


def test_empty_lm_degrades_to_uniform_unseen_mass(spark):
    from mindocr_spark.functions.lm import unigram_counts, unigram_logppl

    lm = unigram_counts(_docs(spark, []))
    rows = unigram_logppl(_docs(spark, [(1, "x y")]), lm).collect()
    # total=0, V=1 → every token prices at ln(1/1)=0
    assert rows[0]["n_oov"] == 2
    assert float(rows[0]["logppl"]) == 0.0


def test_shuffle_join_path_matches_broadcast_path(spark):
    from mindocr_spark.functions.lm import unigram_counts, unigram_logppl

    lm = unigram_counts(_docs(spark, [(9, "p q r p q p")]))
    docs = _docs(spark, [(i, "p q zzz") for i in range(20)])
    b = sorted((r["doc_id"], float(r["logppl"]))
               for r in unigram_logppl(docs, lm, broadcast_lm=True).collect())
    s = sorted((r["doc_id"], float(r["logppl"]))
               for r in unigram_logppl(docs, lm, broadcast_lm=False).collect())
    assert b == s


def test_plan_broadcasts_lm_no_python(spark):
    from mindocr_spark.functions.lm import unigram_counts, unigram_logppl

    lm = unigram_counts(_docs(spark, [(9, "a b")]))
    plan = unigram_logppl(
        _docs(spark, [(1, "a")]), lm
    )._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "BatchEvalPython" not in plan and "PythonUDF" not in plan

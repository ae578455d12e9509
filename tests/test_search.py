"""BM25 inverted-index retrieval — exact-math goldens + plan shape."""

import math

import pytest

from pyspark.sql import functions as F


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id bigint, text string")


def _bm25_expected(corpus, query_terms, k1=1.2, b=0.75):
    """Straight-line reference: same quantization discipline as the
    engine (round idf and tfn to 9, round product to 9, exact sum)."""
    toks = {d: t.split() for d, t in corpus}
    n = len(corpus)
    avgdl = round(sum(len(v) for v in toks.values()) / n, 9)
    df = {}
    for t in set(query_terms):
        df[t] = sum(1 for v in toks.values() if t in v)
    out = {}
    for d, v in toks.items():
        s = 0.0
        hits = 0
        for t in set(query_terms):
            tf = v.count(t)
            if tf == 0 or df[t] == 0:
                continue
            idf = round(math.log((n - df[t] + 0.5) / (df[t] + 0.5) + 1.0), 9)
            tfn = round(
                tf * (k1 + 1.0)
                / (tf + k1 * ((1.0 - b) + b * (len(v) / avgdl))),
                9,
            )
            s += round(idf * tfn, 9)
            hits += 1
        if hits:
            out[d] = (hits, round(s, 9))
    return out


def test_bm25_scores_match_straight_line_reference(spark):
    from mindocr_spark.functions.search import bm25_topk

    corpus = [
        (1, "hash join hash probe build"),
        (2, "sort merge join spill"),
        (3, "table scan filter project"),
        (4, "hash agg hash hash"),
    ]
    got = {
        r["doc_id"]: (r["n_terms_hit"], float(r["score"]))
        for r in bm25_topk(
            _docs(spark, corpus), {7: ["hash", "join"]}, k=10
        ).collect()
    }
    exp = _bm25_expected(corpus, ["hash", "join"])
    assert set(got) == set(exp)
    for d in exp:
        assert got[d][0] == exp[d][0]
        assert got[d][1] == pytest.approx(exp[d][1], abs=1e-9)


def test_bm25_rank_order_and_ties(spark):
    from mindocr_spark.functions.search import bm25_topk

    # docs 2 and 3 are identical → identical scores → doc_id tiebreak
    corpus = [(1, "x x x y"), (2, "x y z"), (3, "x y z"), (4, "a b c")]
    rows = bm25_topk(_docs(spark, corpus), {0: ["x"]}, k=2).collect()
    ranked = sorted((r["rank"], r["doc_id"]) for r in rows)
    assert len(rows) == 2
    # doc 1 has the highest tf; between the tied 2/3, doc 2 wins
    assert ranked[0][1] == 1 and ranked[1][1] == 2


def test_bm25_zero_df_term_contributes_nothing(spark):
    from mindocr_spark.functions.search import bm25_topk

    corpus = [(1, "alpha beta"), (2, "beta gamma")]
    with_ghost = bm25_topk(
        _docs(spark, corpus), {0: ["beta", "zzz_absent"]}, k=5
    ).collect()
    without = bm25_topk(_docs(spark, corpus), {0: ["beta"]}, k=5).collect()
    assert sorted((r["doc_id"], float(r["score"])) for r in with_ghost) == \
        sorted((r["doc_id"], float(r["score"])) for r in without)


def test_bm25_duplicate_query_terms_collapse(spark):
    from mindocr_spark.functions.search import bm25_topk

    corpus = [(1, "q q r"), (2, "r s")]
    dup = bm25_topk(_docs(spark, corpus), {0: ["q", "q"]}, k=5).collect()
    single = bm25_topk(_docs(spark, corpus), {0: ["q"]}, k=5).collect()
    assert [(r["doc_id"], float(r["score"])) for r in dup] == \
        [(r["doc_id"], float(r["score"])) for r in single]


def test_bm25_blank_docs_do_not_poison_avgdl(spark):
    from mindocr_spark.functions.search import bm25_topk

    # blank text must count as dl=0 (not 1) in avgdl, like tokens_col
    corpus = [(1, "k k"), (2, "   "), (3, "")]
    rows = bm25_topk(_docs(spark, corpus), {0: ["k"]}, k=5).collect()
    assert [r["doc_id"] for r in rows] == [1]
    # n=3, df=1, avgdl = 2/3 rounded
    avgdl = round(2 / 3, 9)
    idf = round(math.log((3 - 1 + 0.5) / (1 + 0.5) + 1.0), 9)
    tfn = round(2 * 2.2 / (2 + 1.2 * (0.25 + 0.75 * (2 / avgdl))), 9)
    assert float(rows[0]["score"]) == pytest.approx(
        round(idf * tfn, 9), abs=1e-9
    )


def test_bm25_plan_broadcasts_vocab_no_python(spark):
    from mindocr_spark.functions.search import bm25_topk

    plan = bm25_topk(
        _docs(spark, [(1, "a b"), (2, "b c")]), {0: ["b"]}, k=3
    )._jdf.queryExecution().executedPlan().toString()
    # the corpus-side vocabulary filter must be a broadcast join, and
    # nothing in the plan may drop to per-row Python
    assert "BroadcastHashJoin" in plan
    assert "BatchEvalPython" not in plan and "PythonUDF" not in plan


def test_postings_relation_shape(spark):
    from mindocr_spark.functions.search import postings

    rows = postings(_docs(spark, [(1, "a b a"), (2, "b")])).collect()
    idx = {(r["term"], r["doc_id"]): (r["tf"], r["dl"]) for r in rows}
    assert idx == {("a", 1): (2, 3), ("b", 1): (1, 3), ("b", 2): (1, 1)}


def test_tfidf_keywords_golden(spark):
    """Hand-computed tf·idf top-k: rarer terms outrank common ones."""
    import math
    from mindocr_spark.functions.search import tfidf_topk_terms

    corpus = [
        (1, "common rare common common unique"),
        (2, "common other other"),
        (3, "common filler words"),
    ]
    out = [(r["doc_id"], r["rank"], r["term"], float(r["score"]))
           for r in tfidf_topk_terms(_docs(spark, corpus), k=2).collect()]
    by_doc = {}
    for d, rk, t, s in out:
        by_doc.setdefault(d, []).append((rk, t, s))
    # doc 1: 'common' tf=3 but idf=ln(3/3)=0 → score 0; rare/unique
    # (tf=1, idf=ln 3) outrank it; tie broken by term asc
    d1 = sorted(by_doc[1])
    assert [t for _, t, _ in d1] == ["rare", "unique"]
    assert d1[0][2] == pytest.approx(round(math.log(3), 9), abs=1e-9)
    # doc 2: 'other' tf=2 · ln(3/1) beats 'common' tf=1 · 0
    assert sorted(by_doc[2])[0][1] == "other"


def test_tfidf_empty_doc_contributes_no_keywords(spark):
    from mindocr_spark.functions.search import tfidf_topk_terms

    out = tfidf_topk_terms(
        _docs(spark, [(1, "a b"), (2, "   ")]), k=5
    ).collect()
    assert {r["doc_id"] for r in out} == {1}


def test_bpe_token_pricing(spark):
    from mindocr_spark.functions.text import bpe_token_cols

    rows = [
        (1, "hello world"),        # 5/4→2 + 5/4→2 = 4
        (2, "a"),                  # 1/4→1
        (3, "abcdefgh"),           # 8/4→2
        (4, "x 1234 !"),           # 1 + 4 digits + 1 punct = 6
        (5, ""),                   # nothing
        (6, "price:$9.99"),        # price(2) + :$. (3) + 9(1) + 99(2) = 8
    ]
    out = {r["doc_id"]: r for r in bpe_token_cols(
        spark.createDataFrame(rows, "doc_id bigint, text string")
    ).collect()}
    assert out[1]["n_bpe_tokens"] == 4 and out[1]["n_words"] == 2
    assert out[2]["n_bpe_tokens"] == 1
    assert out[3]["n_bpe_tokens"] == 2
    assert out[4]["n_bpe_tokens"] == 6 and out[4]["n_digit_runs"] == 1
    assert out[5]["n_bpe_tokens"] == 0 and out[5]["n_punct"] == 0
    assert out[6]["n_bpe_tokens"] == 8 and out[6]["n_punct"] == 3


class TestPhraseSearch:
    def _run(self, spark, texts, phrases):
        from mindocr_spark.functions.search import phrase_search

        df = spark.createDataFrame(
            [(i, t) for i, t in enumerate(texts)],
            "doc_id bigint, text string",
        )
        return {
            (r["query_id"], r["doc_id"]): r["n_occurrences"]
            for r in phrase_search(df, phrases).collect()
        }

    def test_counts_and_misses(self, spark):
        got = self._run(
            spark,
            ["the cat sat on the cat mat", "cat the dog", "no match here"],
            {0: ["the", "cat"], 1: ["cat", "mat"], 2: ["dog", "cat"]},
        )
        assert got == {(0, 0): 2, (1, 0): 1}

    def test_overlapping_runs_and_duplicate_slots(self, spark):
        got = self._run(
            spark, ["a a a a b"], {0: ["a", "a"], 1: ["a", "a", "b"]}
        )
        assert got == {(0, 0): 3, (1, 0): 1}  # overlaps count

    def test_absent_term_yields_no_rows_not_error(self, spark):
        assert self._run(spark, ["x y z"], {0: ["x", "zz"]}) == {}

    def test_vocabulary_join_is_broadcast(self, spark):
        from mindocr_spark.functions.search import phrase_search

        df = spark.range(5).selectExpr(
            "id AS doc_id", "'alpha beta gamma' AS text"
        )
        plan = phrase_search(df, {0: ["alpha", "beta"]}) \
            ._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastHashJoin" in plan
        assert "BatchEvalPython" not in plan and "ArrowEval" not in plan


def test_phrase_vocab_semifilter_precedes_postings_groupby(spark):
    """The broadcast vocabulary semi-join must run BEFORE the postings
    aggregation — the corpus token stream sheds non-phrase terms
    scan-side instead of shuffling the full vocabulary into position
    lists. In the executed plan the LeftSemi join therefore sits BELOW
    (deeper than) the first partial aggregate."""
    from mindocr_spark.functions.search import phrase_search

    df = spark.range(5).selectExpr(
        "id AS doc_id", "'alpha beta gamma delta' AS text"
    )
    plan = phrase_search(df, {0: ["alpha", "beta"]}) \
        ._jdf.queryExecution().executedPlan().toString()
    assert "LeftSemi" in plan
    first_agg = plan.index("HashAggregate")
    semi = plan.index("LeftSemi")
    assert semi > first_agg, "semi-join must be below the aggregate"


class TestConcordance:
    def test_contexts_and_edge_clamping(self, spark):
        from mindocr_spark.functions.search import concordance

        df = spark.createDataFrame(
            [(1, "alpha beta target phrase gamma delta"),
             (2, "target phrase tail"),
             (3, "head words then target phrase")],
            "doc_id bigint, text string",
        )
        out = concordance(df, {0: ["target", "phrase"]}, window=2)
        got = {r["doc_id"]: r for r in out.collect()}
        assert got[1]["pos"] == 3
        assert got[1]["left_ctx"] == "alpha beta"
        assert got[1]["phrase"] == "target phrase"
        assert got[1]["right_ctx"] == "gamma delta"
        # doc starts with the phrase: empty left context, not NULL
        assert got[2]["left_ctx"] == ""
        assert got[2]["right_ctx"] == "tail"
        # doc ends with the phrase: empty right context
        assert got[3]["right_ctx"] == ""
        assert got[3]["left_ctx"] == "words then"

    def test_multiple_occurrences_all_emitted(self, spark):
        from mindocr_spark.functions.search import concordance

        df = spark.createDataFrame(
            [(1, "x a b y a b z")], "doc_id bigint, text string"
        )
        out = concordance(df, {0: ["a", "b"]}, window=1).collect()
        assert sorted(r["pos"] for r in out) == [2, 5]
        by_pos = {r["pos"]: r for r in out}
        assert by_pos[2]["left_ctx"] == "x"
        assert by_pos[2]["right_ctx"] == "y"
        assert by_pos[5]["right_ctx"] == "z"

    def test_search_and_concordance_agree(self, spark):
        from mindocr_spark.functions.search import (
            concordance, phrase_search,
        )

        df = spark.read.parquet(
            "/root/testdata/sf0.001/documents.parquet"
        ).select("doc_id", "text")
        phrases = {0: ["table", "hash"], 1: ["slow", "query"]}
        counts = {
            (r["query_id"], r["doc_id"]): r["n_occurrences"]
            for r in phrase_search(df, phrases).collect()
        }
        kwic = concordance(df, phrases, window=3).collect()
        from collections import Counter
        kc = Counter((r["query_id"], r["doc_id"]) for r in kwic)
        assert dict(kc) == counts  # one KWIC row per counted occurrence


class TestTfidfCosine:
    """Sparse tf-idf cosine top-k: hand-computed values, identity,
    disjoint vocab, df-cap, guard."""

    def _run(self, spark, rows, **kw):
        from mindocr_spark.functions.search import tfidf_cosine_topk

        df = spark.createDataFrame(rows, "doc_id bigint, text string")
        return tfidf_cosine_topk(df, **kw).collect()

    @staticmethod
    def _ref_cosine(d1, d2, corpus):
        import math
        from collections import Counter

        n = len(corpus)
        dfs = Counter(t for d in corpus for t in set(d.split()))
        q = lambda v: round(v, 9)

        def vec(d):
            tf = Counter(d.split())
            return {t: q(c * q(math.log(n / dfs[t]))) for t, c in tf.items()}

        v1, v2 = vec(d1), vec(d2)
        dot = sum(q(v1[t] * v2[t]) for t in v1 if t in v2)
        n1 = math.sqrt(sum(q(w * w) for w in v1.values()))
        n2 = math.sqrt(sum(q(w * w) for w in v2.values()))
        return round(dot / (n1 * n2), 6)

    def test_hand_computed(self, spark):
        corpus = ["x x y", "x y z", "z w"]
        out = self._run(
            spark, list(enumerate(corpus)), k=2
        )
        got = {(r["doc_id"], r["nbr"]): r["cosine"] for r in out}
        assert got[(0, 1)] == self._ref_cosine(corpus[0], corpus[1], corpus)
        assert got[(1, 2)] == self._ref_cosine(corpus[1], corpus[2], corpus)
        # x appears in docs 0,1 only; w only in 2: no (0,2) pair? They
        # share no term -> no candidate row at all
        assert (0, 2) not in got and (2, 0) not in got

    def test_identical_docs_cosine_one(self, spark):
        out = self._run(
            spark, [(1, "a b c"), (2, "a b c"), (3, "q r")], k=1
        )
        got = {(r["doc_id"], r["nbr"]): r["cosine"] for r in out}
        assert got[(1, 2)] == 1.0 and got[(2, 1)] == 1.0

    def test_max_df_cap_drops_hot_term(self, spark):
        # 'hot' is in every doc; with max_df=2 only 'rare' pairs remain
        rows = [(1, "hot rare"), (2, "hot rare"), (3, "hot")]
        capped = self._run(spark, rows, k=2, max_df=2)
        pairs = {(r["doc_id"], r["nbr"]) for r in capped}
        assert (1, 2) in pairs and (1, 3) not in pairs

    def test_guard(self, spark):
        import pytest as _pytest

        from mindocr_spark.functions.search import tfidf_cosine_topk

        df = spark.createDataFrame([(1, "x")], "doc_id bigint, text string")
        with _pytest.raises(ValueError):
            tfidf_cosine_topk(df, k=0)


class TestRboRankStability:
    def _docs(self, spark, half0, half1, lang="en"):
        """half0/half1: token lists; doc_ids 0 (even) and 1 (odd)."""
        return spark.createDataFrame(
            [(0, " ".join(half0), lang), (1, " ".join(half1), lang)],
            "doc_id bigint, text string, lang string",
        )

    def test_identical_rankings_score_one(self, spark):
        from mindocr_spark.functions.search import rbo_rank_stability

        toks = [w * (5 - i) for i, w in enumerate("abcd") for _ in
                range(5 - i)]
        # same multiset in both halves → identical rankings
        df = self._docs(spark, toks, toks)
        r = rbo_rank_stability(df, k=4, p=0.9).collect()[0]
        assert r["n_common_topk"] == 4
        assert r["rbo"] == 1.0

    def test_disjoint_rankings_score_zero(self, spark):
        from mindocr_spark.functions.search import rbo_rank_stability

        df = self._docs(spark, ["aa", "bb"], ["cc", "dd"])
        r = rbo_rank_stability(df, k=4, p=0.9).collect()[0]
        assert r["n_common_topk"] == 0
        assert r["rbo"] == 0.0

    def test_hand_computed_partial_overlap(self, spark):
        from mindocr_spark.functions.search import (
            rbo_rank_stability, rbo_weights,
        )

        # half0 ranking: a(3) b(2); half1 ranking: b(3) a(2)
        df = self._docs(spark, ["a"] * 3 + ["b"] * 2,
                        ["b"] * 3 + ["a"] * 2)
        r = rbo_rank_stability(df, k=2, p=0.9).collect()[0]
        # A_1 = 0 (tops differ), A_2 = 2 → rbo = (2/2)·w_2
        w = dict(rbo_weights(2, 0.9))
        assert r["n_common_topk"] == 2
        assert r["rbo"] == round(w[2], 6)

    def test_tie_break_is_token_asc(self, spark):
        from mindocr_spark.functions.search import rbo_rank_stability

        # equal counts everywhere: ranking = alphabetical in BOTH
        # halves → rbo 1.0 despite no frequency signal
        df = self._docs(spark, ["x", "y", "z"], ["z", "y", "x"])
        r = rbo_rank_stability(df, k=3, p=0.9).collect()[0]
        assert r["rbo"] == 1.0

    def test_weight_guards(self):
        from mindocr_spark.functions.search import rbo_weights

        with pytest.raises(ValueError):
            rbo_weights(0, 0.9)
        with pytest.raises(ValueError):
            rbo_weights(5, 1.0)
        ws = rbo_weights(10, 0.9)
        assert abs(sum(w for _, w in ws) - 1.0) < 1e-12


class TestRetrievalEval:
    def _run(self, spark, docs, queries, k):
        from mindocr_spark.functions.search import retrieval_eval

        df = spark.createDataFrame(docs, "doc_id bigint, text string")
        out = retrieval_eval(df, queries, k=k).collect()
        return {r["query_id"]: r for r in out}

    def test_full_recall_perfect_ndcg(self, spark):
        docs = [(1, "cat dog x"), (2, "cat cat dog"), (3, "cat only"),
                (4, "nothing here")]
        r = self._run(spark, docs, {0: ["cat", "dog"]}, k=3)[0]
        # both conjunctive-relevant docs exist and outrank the
        # single-term doc; hits fill ranks 1-2
        assert (r["n_rel"], r["hits_k"]) == (2, 2)
        assert r["precision_k"] == round(2 / 3, 6)
        assert r["recall_k"] == 1.0
        assert r["mrr"] == 1.0
        assert r["ndcg"] == 1.0

    def test_zero_relevance_null_discipline(self, spark):
        docs = [(1, "cat dog"), (2, "cat")]
        r = self._run(spark, docs, {0: ["cat", "unicorn"]}, k=3)[0]
        assert (r["n_rel"], r["hits_k"]) == (0, 0)
        assert r["precision_k"] == 0.0
        assert r["recall_k"] is None and r["ndcg"] is None
        assert r["mrr"] == 0.0

    def test_k_truncation_uses_least_in_idcg(self, spark):
        from mindocr_spark.functions.search import ndcg_weights

        docs = [(1, "cat dog"), (2, "dog cat extra")]
        r = self._run(spark, docs, {0: ["cat", "dog"]}, k=1)[0]
        # 2 relevant, only 1 slot: recall 0.5 but nDCG@1 is perfect
        # because IDCG truncates at min(n_rel, k) = 1
        assert (r["n_rel"], r["hits_k"]) == (2, 1)
        assert r["recall_k"] == 0.5
        assert r["precision_k"] == 1.0 and r["ndcg"] == 1.0
        _, cum = ndcg_weights(1)
        assert cum == [1.0]

    def test_weight_guard(self):
        from mindocr_spark.functions.search import ndcg_weights

        with pytest.raises(ValueError):
            ndcg_weights(0)


class TestVSMAndRRF:
    def test_vsm_topk_hand_computed(self, spark):
        import math

        from mindocr_spark.functions.search import vsm_topk

        docs = spark.createDataFrame(
            [(1, "a b"), (2, "a a b"), (3, "c")],
            "doc_id bigint, text string",
        )
        rows = vsm_topk(docs, {0: ["a"]}, k=3).orderBy("rank").collect()

        def contrib(tf, df, n=3):
            return round(tf * round(math.log(n / df), 9), 9)

        def score(tfs_q, tfs_all, dfs_all):
            dot = sum(contrib(tf, df) for tf, df in tfs_q)
            n2 = sum(round(contrib(tf, df) ** 2, 9)
                     for tf, df in tfs_all)
            return round(dot / (math.sqrt(n2) * math.sqrt(1)), 9)

        # d2 has tf(a)=2 → higher dot but longer vector; hand-verify
        exp1 = score([(1, 2)], [(1, 2), (1, 2)], None)   # d1: a,b
        exp2 = score([(2, 2)], [(2, 2), (1, 2)], None)   # d2: 2a,b
        got = {r["doc_id"]: r["score"] for r in rows}
        assert abs(got[1] - exp1) < 1e-9
        assert abs(got[2] - exp2) < 1e-9
        assert 3 not in got  # no query term → no dot row

    def test_rrf_weights_exact_floor_rendering(self):
        from mindocr_spark.functions.search import rrf_weights

        w = dict(rrf_weights(60, 3))
        assert w[1] == "0.016393442622"   # 10^12 // 61
        assert w[2] == "0.016129032258"
        # c=0: rank 1 weighs exactly 1.0 (13-digit scaled value must
        # split into whole.fraction, not collapse to 0.1)
        w0 = dict(rrf_weights(0, 2))
        assert w0[1] == "1.000000000000"
        assert w0[2] == "0.500000000000"
        import pytest

        with pytest.raises(ValueError):
            rrf_weights(-1, 3)
        with pytest.raises(ValueError):
            rrf_weights(60, 0)

    def test_rrf_fuse_hand_computed(self, spark):
        from decimal import Decimal

        from mindocr_spark.functions.search import rrf_fuse, rrf_weights

        a = spark.createDataFrame(
            [(0, 10, 1), (0, 11, 2), (0, 12, 3)],
            "query_id int, doc_id bigint, rank int")
        b = spark.createDataFrame(
            [(0, 11, 1), (0, 10, 2), (0, 99, 7)],
            "query_id int, doc_id bigint, rank int")
        rows = {r["doc_id"]: r for r in rrf_fuse(
            {"lex": a, "vec": b}, c=60, k=5).collect()}
        w = {r: Decimal(s) for r, s in rrf_weights(60, 5)}
        # docs in both arms beat the single-arm doc; rank 7 > k dropped
        assert rows[10]["rrf_score"] == w[1] + w[2]
        assert rows[11]["rrf_score"] == w[1] + w[2]
        assert rows[12]["rrf_score"] == w[3]
        assert 99 not in rows
        assert rows[10]["n_arms"] == 2 and rows[12]["n_arms"] == 1
        assert rows[12]["lex_rank"] == 3 and rows[12]["vec_rank"] is None
        # tie between 10 and 11 breaks on doc_id
        assert rows[10]["fused_rank"] == 1 and rows[11]["fused_rank"] == 2

    def test_rrf_fuse_validates(self, spark):
        import pytest

        from mindocr_spark.functions.search import rrf_fuse

        with pytest.raises(ValueError):
            rrf_fuse({})


class TestTextrank:
    def _run(self, spark, sents, **kw):
        from mindocr_spark.functions.search import textrank_sentences

        df = spark.createDataFrame(
            sents, "doc_id bigint, sent_idx bigint, sentence string"
        )
        return textrank_sentences(df, **kw).collect()

    def test_hub_sentence_wins(self, spark):
        # s0 overlaps both others; s1/s2 share nothing with each other
        rows = [
            (1, 0, "spark engine shuffles data across the cluster"),
            (1, 1, "the spark engine compiles plans"),
            (1, 2, "shuffles move data between cluster nodes"),
        ]
        out = self._run(spark, rows, top_k=3)
        assert out and out[0]["sent_idx"] == 0 and out[0]["rank"] == 1
        assert len(out) == 3

    def test_isolated_sentence_floor(self, spark):
        rows = [
            (1, 0, "alpha beta gamma"),
            (1, 1, "delta epsilon zeta"),
        ]
        out = self._run(spark, rows, top_k=2)
        for r in out:
            assert abs(r["score"] - 0.15) < 1e-8

    def test_symmetric_tie_breaks_by_index(self, spark):
        rows = [
            (1, 0, "same words here"),
            (1, 1, "same words here"),
        ]
        out = self._run(spark, rows, top_k=2)
        assert [r["sent_idx"] for r in out] == [0, 1]
        assert out[0]["score"] == out[1]["score"]

    def test_single_token_pair_connected(self, spark):
        # two identical one-token sentences: w = 1/2 each way, both
        # converge identically above the floor
        rows = [(1, 0, "word"), (1, 1, "word")]
        out = self._run(spark, rows, top_k=2)
        assert out[0]["score"] == out[1]["score"]
        assert out[0]["score"] > 0.16

    def test_docs_independent_and_cap(self, spark):
        rows = [(1, i, f"tok{i} shared common words") for i in range(6)]
        rows += [(2, 0, "zzz yyy xxx")]
        out = self._run(spark, rows, top_k=10, max_sentences=4)
        by_doc = {}
        for r in out:
            by_doc.setdefault(r["doc_id"], []).append(r["sent_idx"])
        assert sorted(by_doc[1]) == [0, 1, 2, 3]  # capped at 4
        assert by_doc[2] == [0]

    def test_guards(self, spark):
        import pytest as _pt

        from mindocr_spark.functions.search import textrank_sentences

        df = spark.createDataFrame(
            [], "doc_id bigint, sent_idx bigint, sentence string"
        )
        with _pt.raises(ValueError):
            textrank_sentences(df, damping=1.0)
        with _pt.raises(ValueError):
            textrank_sentences(df, iters=0)
        with _pt.raises(ValueError):
            textrank_sentences(df, max_sentences=1)


class TestBm25Prf:
    def _docs(self, spark):
        rows = [
            (1, "bridge river crossing project"),
            (2, "bridge river steel span"),
            (3, "river bank water flow"),
            (4, "unrelated totally different topic entirely"),
        ]
        return spark.createDataFrame(rows, "doc_id bigint, text string")

    def test_expansion_reaches_vocabulary_mismatch_doc(self, spark):
        from mindocr_spark.functions.search import bm25_prf_topk, bm25_topk

        docs = self._docs(spark)
        q = {1: ["bridge"]}
        plain = {r["doc_id"] for r in bm25_topk(docs, q, k=4).collect()}
        assert 3 not in plain  # no 'bridge' in doc 3
        prf = {
            r["doc_id"]: r
            for r in bm25_prf_topk(
                docs, q, k=4, fb_docs=2, fb_terms=5
            ).collect()
        }
        assert 3 in prf  # 'river' voted in by the feedback docs
        assert float(prf[3]["score"]) > 0
        assert 4 not in prf or float(prf[4]["score"]) == 0.0

    def test_lambda_one_preserves_first_pass_winner(self, spark):
        from mindocr_spark.functions.search import bm25_prf_topk, bm25_topk

        docs = self._docs(spark)
        q = {1: ["bridge", "crossing"]}
        top_plain = bm25_topk(docs, q, k=1).collect()[0]["doc_id"]
        top_prf = [
            r for r in bm25_prf_topk(
                docs, q, k=4, fb_docs=2, fb_terms=3, orig_weight=1.0
            ).collect() if r["rank"] == 1
        ][0]["doc_id"]
        assert top_prf == top_plain

    def test_deterministic(self, spark):
        from mindocr_spark.functions.search import bm25_prf_topk

        docs = self._docs(spark)
        q = {1: ["bridge"], 2: ["water"]}
        a = bm25_prf_topk(docs, q, k=3, fb_docs=2, fb_terms=4).collect()
        b = bm25_prf_topk(docs, q, k=3, fb_docs=2, fb_terms=4).collect()
        assert sorted(map(tuple, a)) == sorted(map(tuple, b))

    def test_no_hit_query_degrades_gracefully(self, spark):
        from mindocr_spark.functions.search import bm25_prf_topk

        docs = self._docs(spark)
        out = bm25_prf_topk(
            docs, {9: ["zzzmissing"]}, k=3, fb_docs=2, fb_terms=4
        ).collect()
        assert out == []

    def test_guards(self, spark):
        import pytest as _pt

        from mindocr_spark.functions.search import bm25_prf_topk

        docs = self._docs(spark)
        with _pt.raises(ValueError):
            bm25_prf_topk(docs, {1: ["a"]}, fb_docs=0)
        with _pt.raises(ValueError):
            bm25_prf_topk(docs, {1: ["a"]}, orig_weight=1.5)


class TestPostingGapStats:
    def _run(self, spark, rows):
        from mindocr_spark.functions.search import posting_gap_stats

        df = spark.createDataFrame(rows, "doc_id bigint, text string")
        return {r["term"]: r for r in posting_gap_stats(df).collect()}

    def test_dgap_encoding_golden(self, spark):
        # "w" appears in docs 0, 2, 3 -> encoded [1, 2, 1]; all 1-byte
        got = self._run(spark, [
            (0, "w"), (1, "x"), (2, "w"), (3, "w x"),
        ])
        w = got["w"]
        assert w["df"] == 3
        assert w["bytes_varint"] == 3
        assert w["bytes_fixed"] == 24
        assert w["max_entry"] == 2
        assert w["compression_x"] == 8.0
        # "x" in docs 1, 3 -> encoded [2, 2]
        assert got["x"]["bytes_varint"] == 2 and got["x"]["df"] == 2

    def test_varint_boundary_at_128(self, spark):
        # single-posting lists: enc = doc_id + 1; 127 fits 7 bits
        # (1 byte), 128 needs 8 bits (2 bytes)
        got = self._run(spark, [(126, "a"), (127, "b"), (16382, "c"),
                                (16383, "d")])
        assert got["a"]["bytes_varint"] == 1   # enc 127 = 2^7 - 1
        assert got["b"]["bytes_varint"] == 2   # enc 128 = 2^7
        assert got["c"]["bytes_varint"] == 2   # enc 16383 = 2^14 - 1
        assert got["d"]["bytes_varint"] == 3   # enc 16384 = 2^14

    def test_duplicate_tokens_one_posting(self, spark):
        got = self._run(spark, [(0, "t t t")])
        assert got["t"]["df"] == 1 and got["t"]["bytes_varint"] == 1


class TestProximityTopk:
    def _run(self, spark, rows, queries, k=5):
        from mindocr_spark.functions.search import proximity_topk

        df = spark.createDataFrame(rows, "doc_id bigint, text string")
        return {(r["query_id"], r["doc_id"]): (r["min_window"], r["rank"])
                for r in proximity_topk(df, queries, k=k).collect()}

    def test_minimal_cover_and_ranking(self, spark):
        rows = [
            (1, "a x x x b"),        # window 5
            (2, "x a b x"),          # window 2
            (3, "b x a"),            # order-free: window 3
            (4, "a only here"),      # missing b -> excluded
            (5, "a x b x x a"),      # best cover uses the SECOND a? a..b=3, b..a2? b at 2,a at 5 ->  window 4; min 3
        ]
        got = self._run(spark, rows, {0: ["a", "b"]})
        assert got[(0, 2)][0] == 2 and got[(0, 2)][1] == 1
        assert got[(0, 3)][0] == 3
        assert got[(0, 5)][0] == 3
        assert got[(0, 1)][0] == 5
        assert (0, 4) not in got
        # rank ties break on doc_id: docs 3 and 5 share window 3
        assert got[(0, 3)][1] == 2 and got[(0, 5)][1] == 3

    def test_three_term_cover(self, spark):
        rows = [(1, "c x a x b"), (2, "a b c"), (3, "a b x")]
        got = self._run(spark, rows, {7: ["a", "b", "c"]})
        assert got[(7, 2)] == (3, 1)
        assert got[(7, 1)] == (5, 2)
        assert (7, 3) not in got

    def test_duplicate_query_terms_collapse(self, spark):
        rows = [(1, "a x b")]
        got = self._run(spark, rows, {0: ["a", "a", "b"]})
        assert got[(0, 1)][0] == 3

    def test_guards(self, spark):
        import pytest as _pytest

        from mindocr_spark.functions.search import proximity_topk

        df = spark.createDataFrame([(1, "a")], "doc_id bigint, text string")
        with _pytest.raises(ValueError):
            proximity_topk(df, {0: ["a"]}, k=0)
        with _pytest.raises(ValueError):
            proximity_topk(df, {0: []})


class TestDenseMaxP:
    def _docs(self, spark, rows):
        return spark.createDataFrame(rows, "doc_id bigint, text string")

    def test_twin_doc_is_rank_one(self, spark):
        from mindocr_spark.functions.search import dense_maxp_topk

        body = ("content defined passages make long document retrieval "
                "stable under edits because a change re-embeds one "
                "passage only " * 4)
        docs = self._docs(spark, [
            (0, body),
            (1, body),                       # exact twin of the query
            (2, "utterly unrelated short note about pottery glazes"),
        ])
        out = {(r["query_id"], r["rank"]): r
               for r in dense_maxp_topk(
                   docs, docs.where("doc_id = 0"), k=2,
                   cdc_nibbles=1).collect()}
        top = out[(0, 1)]
        assert top["doc_id"] == 1
        assert top["max_sim"] > out[(0, 2)]["max_sim"]
        # self-match excluded everywhere
        assert all(r["doc_id"] != q for (q, _), r in out.items())

    def test_single_chunk_twin_scores_exactly_one(self, spark):
        """A query short enough to be ONE passage (< k+1 chars spawns
        no boundary) against its exact duplicate: the passage IS the
        whole text on both sides, so max_sim is exactly 1.0."""
        from mindocr_spark.functions.search import dense_maxp_topk

        docs = self._docs(spark, [
            (0, "tiny shared"),
            (1, "tiny shared"),
            (2, "different words"),
        ])
        out = {r["rank"]: r for r in dense_maxp_topk(
            docs, docs.where("doc_id = 0"), k=2,
            cdc_nibbles=1).collect()}
        assert out[1]["doc_id"] == 1 and out[1]["max_sim"] == 1.0

    def test_full_range_int64_doc_ids_exact(self, spark):
        """Passage identity rides a (doc, chunk) STRUCT — never a
        packed doc*1e6+idx integer. Negative and near-2^63 xxhash64
        ids must round-trip EXACTLY (the packed form overflowed under
        ANSI for |id| > ~9.2e12 and lost precision above ~9e9)."""
        from mindocr_spark.functions.search import dense_maxp_topk

        big = 9_007_199_254_740_993          # 2^53 + 1: breaks doubles
        neg = -9_223_372_036_854_775_000     # near int64 min
        body = ("content defined passages make long document retrieval "
                "stable under edits " * 4)
        docs = self._docs(spark, [
            (big, body),
            (neg, body),
            (7, "utterly unrelated short note about pottery glazes"),
        ])
        out = dense_maxp_topk(
            docs, docs.where(f"doc_id = {big}"), k=2,
            cdc_nibbles=1).collect()
        ids = {r["doc_id"] for r in out}
        assert neg in ids            # exact, not rounded/overflowed
        assert big not in ids        # self-match excluded
        assert all(isinstance(r["doc_id"], int) for r in out)
        top = {r["rank"]: r for r in out}
        assert top[1]["doc_id"] == neg

    def test_max_pool_is_passage_grain(self, spark):
        """A doc sharing ONE passage with the query outranks a doc
        that is uniformly mildly similar — the MaxP property."""
        from mindocr_spark.functions.search import dense_maxp_topk

        shared = ("a very distinctive shared passage about winnowing "
                  "fingerprints and rolling polynomial hashes " * 3)
        filler = ("completely different filler text with other words "
                  "entirely " * 3)
        docs = self._docs(spark, [
            (0, shared),
            (1, filler + shared + filler),   # shares one passage
            (2, "generic words that overlap slightly with anything"),
        ])
        out = {r["rank"]: r for r in dense_maxp_topk(
            docs, docs.where("doc_id = 0"), k=2,
            cdc_nibbles=1).collect()}
        assert out[1]["doc_id"] == 1
        assert out[1]["max_sim"] > out[2]["max_sim"]

    def test_plan_broadcast_and_bounded_shuffles(self, spark):
        from mindocr_spark.functions.search import dense_maxp_topk

        docs = self._docs(spark, [
            (i, f"document body number {i} with some words") for i in
            range(8)
        ])
        plan = dense_maxp_topk(
            docs, docs.where("doc_id < 2"), k=3
        )._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastHashJoin" in plan or \
            "BroadcastNestedLoopJoin" in plan


class TestMaxPQuality:
    """Retrieval-quality floor for the in-engine embedder: on the
    planted graded-prefix fixture, a query's three prefix variants
    must crowd the top-5 for BOTH the passage-max and whole-doc
    arms. Bit-exactness is the oracle's job; this guards RANKING
    quality (a broken embedder could stay bit-exact while scoring
    noise)."""

    def test_recall_floor(self, spark):
        import sys

        sys.path.insert(0, "/root/repo")
        import __spark_entry__ as E

        rows = E.queries()["maxp_quality"](
            spark, "/root/testdata/sf0.001").collect()
        by_method: dict = {}
        for r in rows:
            by_method.setdefault(r["method"], []).append(r["recall"])
        assert set(by_method) == {"maxp", "whole_doc"}
        for method, floor in (("maxp", 0.8), ("whole_doc", 0.9)):
            vals = by_method[method]
            mean = sum(vals) / len(vals)
            assert mean >= floor, (method, mean)

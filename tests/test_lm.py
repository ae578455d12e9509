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


def _expected_bigram_logppl(lm_corpus_docs, doc, lam=0.7, quant=9):
    """Straight-line interpolated-bigram reference with the engine's
    quantization discipline."""
    uni, bi = {}, {}
    for d in lm_corpus_docs:
        toks = d.split()
        for t in toks:
            uni[t] = uni.get(t, 0) + 1
        for a, b in zip(toks, toks[1:]):
            bi[(a, b)] = bi.get((a, b), 0) + 1
    total = sum(uni.values())
    v = len(uni) + 1
    toks = doc.split()
    s, hits = 0.0, 0
    for i, t in enumerate(toks):
        puni = (uni.get(t, 0) + 1) / (total + v)
        if i == 0:
            p = puni
        else:
            prev = toks[i - 1]
            cp = uni.get(prev, 0)
            pbi = (bi.get((prev, t), 0) / cp) if cp > 0 else 0.0
            if (prev, t) in bi:
                hits += 1
            p = lam * pbi + (1.0 - lam) * puni
        s += round(-math.log(p), quant)
    return len(toks), hits, s, (s / len(toks) if toks else None)


def test_bigram_logppl_matches_straight_line_reference(spark):
    from mindocr_spark.functions.lm import (
        bigram_counts, bigram_logppl, unigram_counts,
    )

    lm_docs = ["the cat sat on the mat", "the cat ran home"]
    ref = _docs(spark, list(enumerate(lm_docs)))
    uni, bi = unigram_counts(ref), bigram_counts(ref)
    probe = [
        (1, "the cat sat"),      # all bigrams seen
        (2, "the zebra sat"),    # unseen prev→w transitions
        (3, "mat the cat"),      # 'mat the' unseen, 'the cat' seen
    ]
    got = {r["doc_id"]: r for r in bigram_logppl(
        _docs(spark, probe), uni, bi
    ).collect()}
    for doc_id, text in probe:
        n, hits, s, mean = _expected_bigram_logppl(lm_docs, text)
        r = got[doc_id]
        assert r["n_tokens"] == n
        assert r["n_bigram_hits"] == hits, text
        assert float(r["neg_logprob_sum"]) == pytest.approx(s, abs=1e-9)
        assert float(r["logppl"]) == pytest.approx(mean, rel=1e-12)
    # fluent per-corpus text scores lower than the OOV-transition one
    assert got[1]["logppl"] < got[2]["logppl"]


def test_bigram_logppl_first_token_is_unigram_only(spark):
    """A single-token doc must score exactly its unigram nlp."""
    from mindocr_spark.functions.lm import (
        bigram_counts, bigram_logppl, unigram_counts, unigram_logppl,
    )

    ref = _docs(spark, [(9, "a b a c")])
    uni, bi = unigram_counts(ref), bigram_counts(ref)
    one = _docs(spark, [(1, "a")])
    big = bigram_logppl(one, uni, bi).collect()[0]
    unis = unigram_logppl(one, uni).collect()[0]
    assert float(big["logppl"]) == float(unis["logppl"])
    assert big["n_bigram_hits"] == 0


def test_bigram_counts_exact(spark):
    from mindocr_spark.functions.lm import bigram_counts

    out = {(r["w1"], r["w2"]): r["cnt"] for r in bigram_counts(
        _docs(spark, [(1, "a b a b"), (2, "b a")])
    ).collect()}
    # doc boundaries must NOT form bigrams: no ('b','b') from doc1→doc2
    assert out == {("a", "b"): 2, ("b", "a"): 2}


class TestPplBuckets:
    def _scored(self, spark):
        rows = [
            # lang a: 7 docs, distinct ppls 1..7 -> pr = k/6
            *[(i, "a", float(i)) for i in range(1, 8)],
            # lang b: ties at the low end share a rank (both head)
            (10, "b", 1.0), (11, "b", 1.0), (12, "b", 5.0), (13, "b", 9.0),
            # zero-token doc: NULL ppl
            (20, "a", None),
        ]
        return spark.createDataFrame(
            rows, "doc_id bigint, lang string, logppl double"
        )

    def test_rank_mode_buckets(self, spark):
        from mindocr_spark.functions.lm import ppl_buckets

        got = {
            r["doc_id"]: r
            for r in ppl_buckets(self._scored(spark)).collect()
        }
        # lang a: pr = (rank-1)/6; pr exactly AT a cut (2/6, 4/6) is
        # NOT < the cut -> next bucket
        assert [got[i]["ppl_bucket"] for i in range(1, 8)] == [
            "head", "head", "middle", "middle", "tail", "tail", "tail",
        ]
        assert got[1]["ppl_rank"] == 0.0 and got[7]["ppl_rank"] == 1.0
        # ties: equal ppl never straddles a bucket
        assert got[10]["ppl_bucket"] == got[11]["ppl_bucket"] == "head"
        assert got[10]["ppl_rank"] == got[11]["ppl_rank"] == 0.0
        # NULL ppl -> unknown, never dropped
        assert got[20]["ppl_bucket"] == "unknown"
        assert got[20]["ppl_rank"] is None

    def test_threshold_mode_agrees_off_boundary(self, spark):
        from mindocr_spark.functions.lm import ppl_buckets

        scored = self._scored(spark).where(
            "logppl is not null and lang = 'a'"
        )
        rank = {
            r["doc_id"]: r["ppl_bucket"]
            for r in ppl_buckets(scored, mode="rank").collect()
        }
        thr = {
            r["doc_id"]: r["ppl_bucket"]
            for r in ppl_buckets(scored, mode="threshold").collect()
        }
        # boundary docs (3: pr==cut; 5: at the 2/3 quantile value) may
        # differ by definition; interior must agree
        for d in (1, 2, 4, 6, 7):
            assert rank[d] == thr[d], d

    def test_threshold_mode_is_map_only_over_corpus(self, spark):
        from mindocr_spark.functions.lm import ppl_buckets

        plan = (
            ppl_buckets(self._scored(spark), mode="threshold")
            ._jdf.queryExecution().executedPlan().toString()
        )
        # the corpus side joins the broadcast thresholds; no window sort
        assert "BroadcastHashJoin" in plan
        assert "Window" not in plan


class TestPmiCollocations:
    def test_collocation_beats_frequent_pair(self, spark):
        import math
        from mindocr_spark.functions.lm import pmi_collocations

        # "san francisco" always co-occurs (perfect collocation);
        # "the cat" pairs are diluted by many other "the X" pairs
        text = ("san francisco " * 6) + ("the cat " * 6) + ("the dog " * 6)
        df = spark.createDataFrame(
            [(1, text)], "doc_id bigint, text string"
        )
        rows = pmi_collocations(df, top_k=10, min_count=5).collect()
        by_pair = {(r["w1"], r["w2"]): r for r in rows}
        sf = by_pair[("san", "francisco")]
        assert sf["rank"] == 1
        # exact: c_xy=6, c_x=6, c_y=6, N=36 → pmi = ln(36·6/36)=ln 6
        assert sf["pmi"] == round(math.log(6 * 36 / 36.0), 9)
        assert sf["pmi"] > by_pair[("the", "cat")]["pmi"]

    def test_min_count_gates_rare_pairs(self, spark):
        from mindocr_spark.functions.lm import pmi_collocations

        df = spark.createDataFrame(
            [(1, "rare pair " + "common word " * 20)],
            "doc_id bigint, text string",
        )
        rows = pmi_collocations(df, top_k=10, min_count=5).collect()
        pairs = {(r["w1"], r["w2"]) for r in rows}
        assert ("rare", "pair") not in pairs  # count 1 < 5
        assert ("common", "word") in pairs

    def test_head_is_topk_no_python(self, spark):
        from mindocr_spark.functions.lm import pmi_collocations

        df = spark.read.parquet(
            "/root/testdata/sf0.001/documents.parquet"
        ).select("doc_id", "text")
        plan = (
            pmi_collocations(df, top_k=10)._jdf.queryExecution()
            .executedPlan().toString()
        )
        assert "TakeOrderedAndProject" in plan
        assert "BatchEvalPython" not in plan


def _expected_kn_logppl(lm_docs, text, D=0.75):
    """Independent pure-python Kneser-Ney reference (same quantization
    discipline: round(ln,9), decimal sum, final IEEE mean)."""
    from collections import Counter
    from decimal import Decimal

    import math

    uni = Counter(w for d in lm_docs for w in d.split())
    bi = Counter()
    for d in lm_docs:
        ws = d.split()
        for a, b in zip(ws, ws[1:]):
            bi[(a, b)] += 1
    n_pairs = len(bi)
    v = len(uni) + 1
    n_left = Counter(b for _, b in bi)
    n_right = Counter(a for a, _ in bi)
    cp = Counter()
    for (a, _), c in bi.items():
        cp[a] += c

    def pc(w):
        return (n_left.get(w, 0) + 1) / (n_pairs + v)

    toks = text.split()
    s = Decimal(0)
    hits = 0
    for i, w in enumerate(toks):
        prev = toks[i - 1] if i > 0 else None
        if prev is not None and cp.get(prev, 0) > 0:
            c = bi.get((prev, w), 0)
            if c:
                hits += 1
            p = max(c - D, 0.0) / cp[prev] + D * n_right[prev] / cp[prev] * pc(w)
        else:
            p = pc(w)
        s += Decimal(str(round(-math.log(p), 9)))
    mean = float(s) / len(toks) if toks else None
    return len(toks), hits, float(s), mean


def test_kn_bigram_logppl_matches_reference(spark):
    from mindocr_spark.functions.lm import (
        bigram_counts, kn_bigram_logppl, unigram_counts,
    )

    lm_docs = ["the cat sat on the mat", "the cat ran home", "a cat sat"]
    ref = _docs(spark, list(enumerate(lm_docs)))
    uni, bi = unigram_counts(ref), bigram_counts(ref)
    probe = [
        (1, "the cat sat"),     # seen bigrams, discounted mass
        (2, "the zebra sat"),   # unseen continuation under seen prev
        (3, "zzz qqq"),         # fully OOV -> continuation floor
        (4, "cat"),             # first token = continuation prob
    ]
    got = {r["doc_id"]: r for r in kn_bigram_logppl(
        _docs(spark, probe), uni, bi
    ).collect()}
    for doc_id, text in probe:
        n, hits, s, mean = _expected_kn_logppl(lm_docs, text)
        r = got[doc_id]
        assert r["n_tokens"] == n, text
        assert r["n_bigram_hits"] == hits, text
        assert float(r["neg_logprob_sum"]) == pytest.approx(s, abs=1e-9)
        assert float(r["logppl"]) == pytest.approx(mean, rel=1e-12)
    # KN ranks the in-corpus phrase as most fluent
    assert got[1]["logppl"] < got[2]["logppl"] < got[3]["logppl"]


def test_kn_continuation_beats_raw_frequency(spark):
    """The KN signature: a word frequent in ONE context only ('mat'
    after 'the the the...' boosts raw unigram) prices LOWER than a
    word seen after many distinct contexts."""
    from mindocr_spark.functions.lm import (
        bigram_counts, kn_bigram_logppl, unigram_counts,
    )

    # 'uno' appears 4x but only ever after 'say'; 'duo' appears 3x
    # after 3 DIFFERENT words -> higher continuation probability
    lm_docs = ["say uno say uno say uno say uno",
               "alpha duo beta duo gamma duo"]
    ref = _docs(spark, list(enumerate(lm_docs)))
    uni, bi = unigram_counts(ref), bigram_counts(ref)
    probe = [(1, "uno"), (2, "duo")]  # single tokens: pure pc(w)
    got = {r["doc_id"]: float(r["logppl"]) for r in kn_bigram_logppl(
        _docs(spark, probe), uni, bi
    ).collect()}
    assert got[2] < got[1]


def test_heaps_fit_recovers_planted_exponent(spark):
    """heaps_fit must reproduce the hand-computed least-squares fit
    over the cumulative (tokens, types) checkpoints exactly (same
    quantization discipline), with a sub-linear exponent."""
    import math
    from decimal import Decimal

    from mindocr_spark.functions.lm import heaps_fit

    rows = [
        (0, "a b c d"),          # 4 tokens, 4 new types
        (1, "a b e"),            # 3 tokens, 1 new type
        (2, "a f g"),            # 3 tokens, 2 new types
        (3, "a b c"),            # 3 tokens, 0 new types
    ]
    docs = spark.createDataFrame(rows, "doc_id bigint, text string")
    r = heaps_fit(docs, n_checkpoints=4).collect()[0]
    # checkpoints: one per doc (ids 0..3, buckets (id*4)//4 = id)
    pts = [(4, 4), (7, 5), (10, 7), (13, 7)]
    xs = [round(math.log(cn), 9) for cn, _ in pts]
    ys = [round(math.log(cv), 9) for _, cv in pts]
    n = len(pts)
    sx, sy = float(sum(Decimal(str(v)) for v in xs)), float(
        sum(Decimal(str(v)) for v in ys))
    sxy = float(sum(Decimal(str(round(a * b, 12))) for a, b in zip(xs, ys)))
    sxx = float(sum(Decimal(str(round(a * a, 12))) for a in xs))
    slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    intercept = (sy - slope * sx) / n
    assert r["n_points"] == 4
    assert float(r["heaps_beta"]) == round(slope, 6) + 0.0
    assert float(r["ln_k"]) == round(intercept, 6) + 0.0
    assert 0.0 < r["heaps_beta"] < 1.0


def test_heaps_fit_degenerate_single_point_null(spark):
    from mindocr_spark.functions.lm import heaps_fit

    docs = spark.createDataFrame(
        [(0, "a b"), (1, "a")], "doc_id bigint, text string"
    )
    # one checkpoint only -> no line
    r = heaps_fit(docs, n_checkpoints=1).collect()[0]
    assert r["n_points"] == 1
    assert r["heaps_beta"] is None and r["ln_k"] is None


def test_heaps_fit_invariant_under_id_offset(spark):
    """Bucketing is (id - min_id)-relative: a shard whose ids start at
    10^6 must produce the identical fit, not one collapsed checkpoint."""
    from mindocr_spark.functions.lm import heaps_fit

    rows = [(i, f"a b uniq{i}") for i in range(40)]
    base = spark.createDataFrame(rows, "doc_id bigint, text string")
    shifted = spark.createDataFrame(
        [(i + 1_000_000, t) for i, t in rows], "doc_id bigint, text string"
    )
    rb = heaps_fit(base, n_checkpoints=8).collect()[0]
    rs = heaps_fit(shifted, n_checkpoints=8).collect()[0]
    assert rb["n_points"] == rs["n_points"] == 8
    assert rb["heaps_beta"] == rs["heaps_beta"]
    assert rb["ln_k"] == rs["ln_k"]


def test_stupid_backoff_levels_hand_computed(spark):
    """One reference doc 'a b c a b d'; score 'a b c' token-by-token:
    pos0 unigram, pos1 bigram level, pos2 trigram hit — each level
    hand-derivable."""
    import math

    from mindocr_spark.functions.lm import (
        bigram_counts,
        stupid_backoff_logscore,
        trigram_counts,
        unigram_counts,
    )

    ref = spark.createDataFrame(
        [(1, "a b c a b d")], "doc_id bigint, text string"
    )
    target = spark.createDataFrame(
        [(10, "a b c"), (11, "z z z"), (12, "")],
        "doc_id bigint, text string",
    )
    out = {r.doc_id: r for r in stupid_backoff_logscore(
        target, unigram_counts(ref), bigram_counts(ref),
        trigram_counts(ref), alpha=0.4,
    ).collect()}
    # counts: uni a=2 b=2 c=1 d=1 (total 6, V=4+1=5)
    # 'a': p_uni = (2+1)/11
    # 'b'|a: c(ab)=2, c(a)=2 → 1.0
    # 'c'|ab: c(abc)=1, c(ab)=2 → 0.5
    want = (round(-math.log(3 / 11), 9)
            + round(-math.log(1.0), 9)
            + round(-math.log(0.5), 9))
    r = out[10]
    assert r.n_trigram_hits == 1
    assert r.neg_logscore_sum == pytest.approx(want, abs=1e-9)
    # unseen everywhere: pos2 backs off twice → α²·p_uni
    z = out[11]
    p_zuni = 1 / 11
    want_z = (round(-math.log(p_zuni), 9)
              + round(-math.log(0.4 * p_zuni), 9)
              + round(-math.log(0.4 * (0.4 * p_zuni)), 9))
    assert z.n_trigram_hits == 0
    assert z.neg_logscore_sum == pytest.approx(want_z, abs=1e-9)
    # empty doc: rows preserved, NULL score
    assert out[12].n_tokens == 0 and out[12].logscore is None


class TestVocabRichness:
    def _run(self, spark, texts):
        from mindocr_spark.functions.lm import vocab_richness

        df = spark.createDataFrame(
            [("en", t) for t in texts], "lang string, text string"
        )
        (r,) = vocab_richness(df).collect()
        return r

    def test_hand_computed(self, spark):
        # tokens: a a a b b c d → V=4, N=7, f1=2 (c,d), f2=1 (b)
        r = self._run(spark, ["a a a b", "b c d"])
        assert (r["vocab"], r["n_tokens"], r["f1"], r["f2"]) == (4, 7, 2, 1)
        assert r["chao1"] == 4.0 + (2 * 1) / (2 * 2)
        assert r["unseen_mass"] == 2 / 7
        assert r["hapax_ratio"] == 2 / 4

    def test_no_dis_legomena_still_defined(self, spark):
        # all hapaxes: f2=0 — bias-corrected form stays finite
        r = self._run(spark, ["a b c"])
        assert r["f2"] == 0
        assert r["chao1"] == 3.0 + (3 * 2) / 2

    def test_saturated_vocab_no_unseen(self, spark):
        # every type seen 3×: f1=0 → chao1=V, unseen_mass=0
        r = self._run(spark, ["a b a b a b"])
        assert r["f1"] == 0 and r["chao1"] == 2.0
        assert r["unseen_mass"] == 0.0 and r["hapax_ratio"] == 0.0

    def test_groups_independent(self, spark):
        from mindocr_spark.functions.lm import vocab_richness

        df = spark.createDataFrame(
            [("en", "a a b"), ("de", "x")], "lang string, text string"
        )
        out = {r["lang"]: r for r in vocab_richness(df).collect()}
        assert out["en"]["vocab"] == 2 and out["de"]["vocab"] == 1
        assert out["de"]["unseen_mass"] == 1.0


class TestLlrKeywords:
    def _run(self, spark, rows, **kw):
        from mindocr_spark.functions.lm import llr_keywords

        df = spark.createDataFrame(rows, "grp string, text string")
        return llr_keywords(df, "grp", **kw).collect()

    @staticmethod
    def _llr(cells):
        """cells: [(k, row, col)]; N inferred from the full grid."""
        import math

        n = sum(k for k, _, _ in cells)
        s = 0.0
        for k, row, col in cells:
            if k > 0:
                s += round(
                    k * (math.log(k) + math.log(n)
                         - math.log(row) - math.log(col)), 9)
        return 2.0 * s

    def test_hand_computed(self, spark):
        rows = [("A", "apple apple banana"),
                ("B", "banana banana cherry banana")]
        out = {(r["group"], r["term"]): r
               for r in self._run(spark, rows, min_count=1, top_k=5)}
        r = out[("A", "apple")]
        assert (r["k11"], r["term_total"], r["group_total"],
                r["n_total"]) == (2, 2, 3, 7)
        want = self._llr([(2, 3, 2), (0, 4, 2), (1, 3, 5), (4, 4, 5)])
        assert abs(r["llr"] - want) < 1e-8

    def test_exclusive_term_zero_cell(self, spark):
        # cherry appears only in B: k12 = 0 contributes nothing
        rows = [("A", "apple apple banana"),
                ("B", "banana banana cherry banana")]
        out = {(r["group"], r["term"])
               for r in self._run(spark, rows, min_count=1)}
        assert ("B", "cherry") in out
        assert ("A", "cherry") not in out

    def test_uniform_term_not_distinctive(self, spark):
        # 'x' has identical share in both groups -> not over-repr
        rows = [("A", "x x y"), ("B", "x x z")]
        out = {(r["group"], r["term"])
               for r in self._run(spark, rows, min_count=1)}
        assert ("A", "x") not in out and ("B", "x") not in out
        assert ("A", "y") in out and ("B", "z") in out

    def test_top_k_and_rank_order(self, spark):
        rows = [("A", "a a a a b b c " + "filler " * 5),
                ("B", "filler " * 20)]
        out = [r for r in self._run(spark, rows, min_count=1, top_k=2)
               if r["group"] == "A"]
        assert [r["rank"] for r in out] == [1, 2]
        assert out[0]["term"] == "a"
        assert out[0]["llr"] > out[1]["llr"]

    def test_min_count_floor(self, spark):
        rows = [("A", "rare common common"), ("B", "common common")]
        out = {r["term"] for r in self._run(spark, rows, min_count=2)}
        assert "rare" not in out

    def test_guards(self, spark):
        import pytest as _pt

        from mindocr_spark.functions.lm import llr_keywords

        df = spark.createDataFrame([], "grp string, text string")
        with _pt.raises(ValueError):
            llr_keywords(df, "grp", top_k=0)
        with _pt.raises(ValueError):
            llr_keywords(df, "grp", min_count=0)

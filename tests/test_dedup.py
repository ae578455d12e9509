"""Dedup operator goldens: planted duplicates with known relationships."""

import pytest


BASE = (
    "the quick brown fox jumps over the lazy dog and runs to the river "
    "where it finds an old boat left by travelers on their way home"
)
NEAR = BASE.replace("old boat", "new boat")   # 1-word edit → high jaccard
OTHER = "completely different content about spark catalyst optimizer plans"


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(
        [(1, BASE), (2, BASE), (3, NEAR), (4, OTHER)],
        "doc_id bigint, text string",
    )


def test_exact_dup_clusters(spark, docs):
    from mindocr_spark.functions.dedup import exact_dup_clusters

    out = {r["doc_id"]: r for r in exact_dup_clusters(docs).collect()}
    assert out[1]["cluster_size"] == 2 and out[1]["is_dup"]
    assert out[2]["cluster_rep"] == 1
    assert not out[3]["is_dup"] and not out[4]["is_dup"]


def test_ngram_jaccard_planted_pair(spark, docs):
    from mindocr_spark.functions.dedup import ngram_jaccard_pairs

    pairs = {(r["id_a"], r["id_b"]): r for r in
             ngram_jaccard_pairs(docs, threshold=0.5).collect()}
    assert pairs[(1, 2)]["jaccard"] == 1.0          # exact dup
    assert 0.5 <= pairs[(1, 3)]["jaccard"] < 1.0    # near dup
    assert (1, 4) not in pairs and (2, 4) not in pairs


def test_containment_catches_excerpt_jaccard_misses(spark, docs):
    """An excerpt (prefix) of a long doc has containment 1.0 inside its
    parent but low Jaccard — the doc-contains-doc case ngram_jaccard_pairs
    is blind to at high thresholds."""
    from mindocr_spark.functions.dedup import (
        containment_pairs,
        ngram_jaccard_pairs,
    )

    excerpt = " ".join(BASE.split()[:13])   # first 13 of 27 words
    corpus = docs.union(
        spark.createDataFrame([(5, excerpt)], "doc_id bigint, text string")
    )
    cont = {(r["sub_id"], r["sup_id"]): r for r in
            containment_pairs(corpus, threshold=0.8).collect()}
    # excerpt fully inside parent (both copies), exactly 1.0
    assert cont[(5, 1)]["containment"] == 1.0
    assert cont[(5, 2)]["containment"] == 1.0
    # the superset direction does NOT pass: parent is not inside excerpt
    assert (1, 5) not in cont
    # unrelated doc never pairs
    assert all(4 not in pair for pair in cont)
    # and Jaccard at the same threshold misses the excerpt entirely
    jac = {(r["id_a"], r["id_b"]) for r in
           ngram_jaccard_pairs(corpus, threshold=0.8).collect()}
    assert (1, 5) not in jac and (5, 1) not in jac


def test_containment_sizes_are_exact_shingle_counts(spark, docs):
    from mindocr_spark.functions.dedup import containment_pairs
    from mindocr_spark.functions.text import word_shingles

    excerpt = " ".join(BASE.split()[:13])
    corpus = docs.union(
        spark.createDataFrame([(5, excerpt)], "doc_id bigint, text string")
    )
    n_by_doc = {r["doc_id"]: r["n"] for r in
                word_shingles(corpus).groupBy("doc_id").count()
                .withColumnRenamed("count", "n").collect()}
    row = {(r["sub_id"], r["sup_id"]): r for r in
           containment_pairs(corpus, threshold=0.8).collect()}[(5, 1)]
    assert row["n_sub"] == n_by_doc[5]
    assert row["n_sup"] == n_by_doc[1]
    assert row["n_inter"] == n_by_doc[5]   # prefix ⊂ parent exactly


def test_minhash_estimates_track_exact_jaccard(spark, docs):
    from mindocr_spark.functions.dedup import minhash_lsh_pairs

    est = {(r["id_a"], r["id_b"]): r["est_jaccard"] for r in
           minhash_lsh_pairs(docs, threshold=0.3).collect()}
    assert est[(1, 2)] == 1.0                        # identical signatures
    assert (1, 3) in est and est[(1, 3)] >= 0.5      # near dup caught by LSH
    assert (1, 4) not in est


def test_minhash_signature_shape(spark, docs):
    from mindocr_spark.functions.dedup import minhash_signatures

    sig = minhash_signatures(docs, n_perm=16)
    assert sig.count() == 4 * 16
    # signature of identical docs identical
    rows = sig.where("doc_id in (1,2)").collect()
    by = {}
    for r in rows:
        by.setdefault(r["perm"], set()).add(r["minh"])
    assert all(len(v) == 1 for v in by.values())


def test_simhash_identical_and_near(spark, docs):
    from mindocr_spark.functions.dedup import simhash_col, simhash_pairs

    sims = {r["doc_id"]: r["simhash"] for r in simhash_col(docs).collect()}
    assert sims[1] == sims[2]
    pairs = {(r["id_a"], r["id_b"]): r["hamming"] for r in
             simhash_pairs(docs, max_hamming=16).collect()}
    assert pairs[(1, 2)] == 0
    assert pairs.get((1, 3), 99) <= 16               # near dup within radius
    assert (1, 4) not in pairs or pairs[(1, 4)] > 16


def test_simhash_radius_recall_guarantee(spark):
    """Pigeonhole banding must hold for the REQUESTED radius: a pair
    differing in >3 bits spread across the old fixed 4 chunks was
    silently dropped before the chunk count became max_hamming+1."""
    from pyspark.sql import functions as F
    from mindocr_spark.functions.dedup import simhash_pairs

    base = "alpha beta gamma delta epsilon zeta eta theta " * 4
    # flip words scattered through the doc → bits differ across chunks
    variant = base.replace("beta", "betX").replace("zeta", "zetX")
    docs = spark.createDataFrame(
        [(1, base), (2, variant)], "doc_id bigint, text string"
    )
    found = {(r["id_a"], r["id_b"]): r["hamming"]
             for r in simhash_pairs(docs, max_hamming=12).collect()}
    assert (1, 2) in found          # radius-12 request honours radius-12 pairs
    assert found[(1, 2)] <= 12


def test_simhash_fold_matches_independent_reference(spark):
    """The production numpy fold must be value-identical to an
    INDEPENDENT pure-python bit-vote fold (no numpy, no shared code)
    over adversarial token sets — ties, empty docs, and sign-bit
    (bit 63) votes. Catches fold bugs a self-comparison cannot."""
    from pyspark.sql import functions as F
    from mindocr_spark.functions.dedup import simhash_col
    from mindocr_spark.functions.text import tokens_col

    def reference_fold(hashes):
        if not hashes:
            return 0
        unsigned = [h % (1 << 64) for h in hashes]  # two's-complement view
        sim = 0
        for j in range(64):
            votes = sum(1 if (u >> j) & 1 else -1 for u in unsigned)
            if votes > 0:
                sim |= 1 << j
        return sim - (1 << 64) if sim >= (1 << 63) else sim  # back to i64

    rows = [(1, BASE), (2, NEAR), (3, OTHER), (4, ""), (5, "   "),
            (6, "one"), (7, "a b a b"), (8, "中文 内容 混排 test")]
    docs = spark.createDataFrame(rows, "doc_id bigint, text string")
    got = {r["doc_id"]: r["simhash"] for r in simhash_col(docs).collect()}
    hashes = docs.select(
        "doc_id",
        F.transform(tokens_col("text"), lambda w: F.xxhash64(w)).alias("th"),
    ).collect()
    for r in hashes:
        assert got[r["doc_id"]] == reference_fold(list(r["th"] or [])), \
            r["doc_id"]


def test_ngram_viral_shingle_cap_bounds_join(spark):
    """A boilerplate phrase shared by every doc must not explode the
    shingle self-join: with the df-cap, pairs similar ONLY through the
    viral shingle disappear while genuinely-similar pairs survive."""
    from mindocr_spark.functions.dedup import ngram_jaccard_pairs

    viral = "subscribe to our newsletter today"
    rows = [(i, f"{viral} unique words number {i} here") for i in range(20)]
    rows += [(100, f"{viral} shared tail of twin docs"),
             (101, f"{viral} shared tail of twin docs")]
    docs = spark.createDataFrame(rows, "doc_id bigint, text string")
    # cap of 3 excludes every shingle of the viral prefix (freq ≥ 20)
    capped = {(r["id_a"], r["id_b"]) for r in
              ngram_jaccard_pairs(docs, threshold=0.1,
                                  max_shingle_freq=3).collect()}
    assert (100, 101) in capped             # twins share sub-cap shingles
    assert not any(a < 100 and b < 100 for a, b in capped
                   if (a, b) != (100, 101))  # viral-only pairs dropped
    # uncapped: every doc pairs with every other through the viral prefix
    uncapped = ngram_jaccard_pairs(docs, threshold=0.1).count()
    assert uncapped > len(capped)


def test_simhash_hot_bucket_cap(spark):
    """Degenerate chunk values (empty docs → simhash 0) form one giant
    bucket; the cap drops that bucket's join while normal pairs keep
    their exact-recall guarantee through uncapped chunks."""
    from mindocr_spark.functions.dedup import simhash_pairs

    rows = [(i, "   ") for i in range(30)]            # all-zero simhash
    rows += [(100, BASE), (101, BASE)]
    docs = spark.createDataFrame(rows, "doc_id bigint, text string")
    pairs = {(r["id_a"], r["id_b"]) for r in
             simhash_pairs(docs, max_hamming=3, max_bucket_size=10).collect()}
    assert (100, 101) in pairs              # real pair unaffected by cap
    assert not any(a < 100 for a, _b in pairs)  # degenerate bucket capped


def test_simhash_md5_banded_equals_all_pairs(spark, docs):
    """The hex-span banded join has EXACT recall ≤ radius (pigeonhole
    over max_hamming+1 nibble-aligned spans): the pair set must equal
    the brute-force all-pairs hamming computation."""
    from mindocr_spark.functions.dedup import simhash_md5_col, simhash_pairs_md5

    r = 8
    sims = {row["doc_id"]: int(row["simhash_hex"], 16)
            for row in simhash_md5_col(docs).collect()}
    brute = {
        (a, b, bin(sims[a] ^ sims[b]).count("1"))
        for a in sims for b in sims
        if a < b and bin(sims[a] ^ sims[b]).count("1") <= r
    }
    banded = {(row["id_a"], row["id_b"], row["hamming"])
              for row in simhash_pairs_md5(docs, max_hamming=r).collect()}
    assert banded == brute


def test_simhash_md5_portable_twin(spark, docs):
    from mindocr_spark.functions.dedup import simhash_md5_col

    sims = {r["doc_id"]: r["simhash_hex"] for r in simhash_md5_col(docs).collect()}
    assert sims[1] == sims[2]                       # identical docs
    assert len(sims[1]) == 16 and sims[1] != sims[4]
    # hamming distance of the near pair is small relative to the far pair
    def ham(a, b):
        return bin(int(a, 16) ^ int(b, 16)).count("1")
    assert ham(sims[1], sims[3]) < ham(sims[1], sims[4])


LONG_A = ("alpha paragraph with enough characters to participate in the "
          "corpus level dedup pass")
LONG_B = ("beta paragraph that is also comfortably beyond the minimum "
          "participation length")
LONG_C = ("gamma paragraph bringing genuinely new content to the later "
          "documents of the corpus")
HDR = "## header"  # < 30 chars → never participates


def test_paragraph_dedup_first_occurrence(spark):
    """Corpus-level paragraph dedup: a repeated paragraph survives only
    at its smallest (id, ord) occurrence — across docs AND within one
    doc; short paragraphs always stay in place; a doc whose every
    paragraph drops comes back as an empty row, not a lost row."""
    from mindocr_spark.functions.dedup import paragraph_dedup

    docs = spark.createDataFrame(
        [
            (1, "\n".join([LONG_A, HDR, LONG_B, LONG_A])),  # self-repeat
            (2, "\n".join([LONG_B, LONG_C])),               # B seen in 1
            (3, LONG_A),                                    # fully dropped
        ],
        "doc_id bigint, text string",
    )
    out = {r["doc_id"]: r["text"] for r in paragraph_dedup(docs).collect()}
    assert out[1] == "\n".join([LONG_A, HDR, LONG_B])
    assert out[2] == LONG_C
    assert out[3] == ""
    assert set(out) == {1, 2, 3}  # row preserved even when hollowed out


def test_within_doc_dedup_page_local_rule(spark):
    """Within-doc line dedup: the SECOND in-doc copy of a line drops,
    the same line in a DIFFERENT doc is untouched (the page-local
    rule), short lines are exempt, and a doc of only repeats hollows
    to '' without losing its row."""
    from mindocr_spark.functions.dedup import within_doc_dedup

    docs = spark.createDataFrame(
        [
            (1, "\n".join([LONG_A, HDR, LONG_A, LONG_B])),  # in-doc repeat
            (2, "\n".join([LONG_A, LONG_A])),  # cross-doc copy kept once
            (3, "\n".join([HDR, HDR])),        # short lines always kept
        ],
        "doc_id bigint, text string",
    )
    out = {r["doc_id"]: r["text"] for r in within_doc_dedup(docs).collect()}
    assert out[1] == "\n".join([LONG_A, HDR, LONG_B])
    assert out[2] == LONG_A          # doc 2 keeps its own first copy
    assert out[3] == "\n".join([HDR, HDR])
    assert set(out) == {1, 2, 3}


def test_span_dedup_c4_rule(spark):
    """C4 three-sentence-span rule: the quoting doc loses the repeated
    span's sentences, the quoted doc keeps them; sentences outside any
    duplicated span survive; counts are exact."""
    from mindocr_spark.functions.dedup import span_dedup

    docs = spark.createDataFrame(
        [
            (1, "One ring. Two towers! Three kings? Four winds."),
            # doc 2 quotes doc 1's first three sentences, then its own
            (2, "One ring. Two towers! Three kings? Own tail here."),
            (3, "Totally unrelated. Fresh content! New stuff? Done."),
        ],
        "doc_id bigint, text string",
    )
    out = {r["doc_id"]: r for r in span_dedup(docs, n=3).collect()}
    assert out[1]["text"] == (
        "One ring. Two towers! Three kings? Four winds."
    )
    assert out[1]["n_removed"] == 0
    assert out[2]["text"] == "Own tail here."
    assert out[2]["n_sents"] == 4 and out[2]["n_removed"] == 3
    assert out[3]["n_removed"] == 0


def test_span_dedup_overlapping_spans_and_hollow_doc(spark):
    """A doc that IS a duplicated span hollows to '' but keeps its
    row; overlapping duplicated spans remove the union of covered
    sentences, not double-count."""
    from mindocr_spark.functions.dedup import span_dedup

    docs = spark.createDataFrame(
        [
            (1, "Aa bb. Cc dd! Ee ff? Gg hh."),
            (2, "Aa bb. Cc dd! Ee ff? Gg hh."),  # full dup: 2 spans
        ],
        "doc_id bigint, text string",
    )
    out = {r["doc_id"]: r for r in span_dedup(docs, n=3).collect()}
    assert out[1]["n_removed"] == 0
    assert out[2]["text"] == "" and out[2]["n_removed"] == 4


def test_paragraph_dedup_string_ids_tuple_order(spark):
    """String ids must order as TUPLES (struct-min): url 'a' < 'a/b',
    so 'a' keeps the shared paragraph. A padded-string-concat occurrence
    key would invert this ('/' sorts before ':') and hand the paragraph
    to the wrong survivor."""
    from mindocr_spark.functions.dedup import paragraph_dedup

    docs = spark.createDataFrame(
        [("a", LONG_A), ("a/b", LONG_A)], "url string, text string"
    )
    out = {r["url"]: r["text"]
           for r in paragraph_dedup(docs, id_col="url").collect()}
    assert out["a"] == LONG_A
    assert out["a/b"] == ""


def test_paragraph_dedup_plan_is_aggregate_not_window(spark):
    """The first-occurrence rule must compile to a partial-aggregate
    min on the paragraph hash, NOT a window/row_number — a window
    funnels every occurrence of a viral boilerplate paragraph into one
    task (the hot-key straggler at web scale)."""
    from mindocr_spark.functions.dedup import paragraph_dedup

    docs = spark.createDataFrame(
        [(1, LONG_A), (2, LONG_A)], "doc_id bigint, text string"
    )
    plan = spark._jvm.PythonSQLUtils.explainString(
        paragraph_dedup(docs)._jdf.queryExecution(), "formatted"
    )
    assert "Window" not in plan
    # specifically the first-occurrence MIN on the paragraph hash must
    # be a combinable partial aggregate — the rebuild stage's
    # partial_collect_list alone must NOT satisfy this test
    assert "partial_min" in plan


class TestConnectedComponents:
    def test_chain_transitive_vs_pairwise(self, spark):
        """Edges (1,3),(2,3): the pairwise drop-id_b rule keeps {1,2}
        (3 is the only id_b), but 1-3-2 is one component — transitive
        collapse keeps only the min, 1."""
        from mindocr_spark.functions.dedup import connected_components

        edges = spark.createDataFrame(
            [(1, 3), (2, 3)], "id_a bigint, id_b bigint"
        )
        out = {
            r["id"]: r["component"]
            for r in connected_components(edges).collect()
        }
        assert out == {1: 1, 2: 1, 3: 1}
        survivors = {i for i, c in out.items() if i == c}
        pairwise_survivors = {1, 2}  # what drop-every-id_b leaves alive
        assert survivors == {1} != pairwise_survivors

    def test_string_ids_isolated_and_self_loops(self, spark):
        from mindocr_spark.functions.dedup import connected_components

        edges = spark.createDataFrame(
            [("b", "a"), ("c", "b"), ("e", "e")], "id_a string, id_b string"
        )
        verts = spark.createDataFrame(
            [("a",), ("b",), ("c",), ("e",), ("z",)], "doc_id string"
        )
        out = {
            r["id"]: r["component"]
            for r in connected_components(edges, vertices=verts).collect()
        }
        # chain collapses to lexicographic min; self-loop and isolated
        # vertices label themselves
        assert out == {"a": "a", "b": "a", "c": "a", "e": "e", "z": "z"}

    def test_max_iter_guard_raises(self, spark):
        """A path graph of diameter 4 cannot converge in one pass —
        partial labels must raise, never be returned silently."""
        from mindocr_spark.functions.dedup import connected_components

        edges = spark.createDataFrame(
            [(1, 2), (2, 3), (3, 4), (4, 5)], "id_a bigint, id_b bigint"
        )
        with pytest.raises(RuntimeError, match="converge"):
            connected_components(edges, max_iter=1)

    def test_pointer_doubling_log_passes(self, spark):
        """A path graph of diameter 40 converges in O(log d) passes
        (pointer doubling), not 40 — max_iter=8 suffices where plain
        min-propagation needs the full diameter. Also pins that long
        chains collapse to the global min, the case where pairwise
        rules fail worst."""
        from mindocr_spark.functions.dedup import connected_components

        edges = spark.createDataFrame(
            [(i, i + 1) for i in range(40)], "id_a bigint, id_b bigint"
        )
        out = {
            r["id"]: r["component"]
            for r in connected_components(edges, max_iter=8).collect()
        }
        assert out == {i: 0 for i in range(41)}

    def test_empty_edges(self, spark):
        from mindocr_spark.functions.dedup import connected_components

        edges = spark.createDataFrame([], "id_a bigint, id_b bigint")
        verts = spark.createDataFrame([(7,), (9,)], "doc_id bigint")
        out = {
            r["id"]: r["component"]
            for r in connected_components(edges, vertices=verts).collect()
        }
        assert out == {7: 7, 9: 9}


class TestDecontaminate:
    def test_planted_contamination(self, spark):
        """A training doc containing a benchmark passage verbatim is
        flagged; unrelated docs are not; rows are preserved."""
        from mindocr_spark.functions.dedup import decontaminate_flags

        bench_passage = ("which river is longest in the western basin "
                         "region according to the survey of nineteen "
                         "eighty four exactly")
        docs = spark.createDataFrame(
            [(1, f"intro text {bench_passage} outro text"),
             (2, "completely unrelated content about catalyst plans "
                 "and shuffle partitions in distributed query engines "
                 "running on large clusters"),
             (3, "short")],
            "doc_id bigint, text string",
        )
        benchmark = spark.createDataFrame(
            [(f"question: {bench_passage}?",)], "text string"
        )
        out = {r["doc_id"]: r for r in
               decontaminate_flags(docs, benchmark, k=13).collect()}
        assert set(out) == {1, 2, 3}
        assert out[1]["is_contaminated"]
        assert out[1]["n_contaminated_shingles"] >= 1
        assert not out[2]["is_contaminated"]
        assert not out[3]["is_contaminated"]      # < k tokens: no shingles

    def test_benchmark_side_is_broadcast(self, spark):
        """The probe must broadcast the benchmark shingles — the
        corpus side never shuffles for the membership check."""
        from mindocr_spark.functions.dedup import decontaminate_flags

        docs = spark.createDataFrame(
            [(1, "a " * 20)], "doc_id bigint, text string"
        )
        bench = spark.createDataFrame([("b " * 20,)], "text string")
        plan = spark._jvm.PythonSQLUtils.explainString(
            decontaminate_flags(docs, bench)._jdf.queryExecution(),
            "formatted",
        )
        assert "BroadcastHashJoin" in plan


class TestShingleHotlist:
    def test_counts_and_tiebreak(self, spark):
        from mindocr_spark.functions.dedup import shingle_hotlist

        df = spark.createDataFrame(
            [
                (1, "x y z tail one"),
                (2, "x y z tail two"),
                (3, "x y z x y z"),   # repeats count ONCE per doc
                (4, "a b c d"),
            ],
            "doc_id bigint, text string",
        )
        rows = shingle_hotlist(df, k=3, top=3).collect()
        assert (rows[0]["shingle"], rows[0]["doc_freq"]) == ("x y z", 3)
        assert rows[0]["doc_freq"] == 3  # doc 3's repeat not double-counted
        # doc_freq-2 shingles ("y z tail") before the freq-1 tie block,
        # which is lexicographic
        assert rows[1] and rows[1]["shingle"] == "y z tail"
        assert rows[2]["doc_freq"] == 1
        all_f1 = [
            r["shingle"]
            for r in shingle_hotlist(df, k=3, top=100).collect()
            if r["doc_freq"] == 1
        ]
        assert all_f1 == sorted(all_f1)

    def test_min_doc_freq_floor(self, spark):
        from mindocr_spark.functions.dedup import shingle_hotlist

        df = spark.createDataFrame(
            [(1, "p q r s"), (2, "p q r t")],
            "doc_id bigint, text string",
        )
        rows = shingle_hotlist(df, k=3, top=10, min_doc_freq=2).collect()
        assert [(r["shingle"], r["doc_freq"]) for r in rows] == [("p q r", 2)]

    def test_topk_plan_has_no_global_sort_exchange(self, spark):
        from mindocr_spark.functions.dedup import shingle_hotlist

        df = spark.createDataFrame(
            [(1, "a b c d")], "doc_id bigint, text string"
        )
        plan = (
            shingle_hotlist(df)._jdf.queryExecution().executedPlan().toString()
        )
        assert "TakeOrderedAndProject" in plan
        assert "rangepartitioning" not in plan.lower()


class TestBoilerplatePurge:
    BANNER = "accept our cookies to continue browsing this site today"

    def _docs(self, spark):
        unique = [
            "the mountain trail winds upward through quiet pine forest",
            "a river bends around the old stone bridge at dawn light",
            "markets reopened quietly after the long holiday weekend here",
        ]
        rows = [
            (i + 1, f"{u}\n{self.BANNER}\nok") for i, u in enumerate(unique)
        ] + [(4, self.BANNER)]   # all-boilerplate doc
        return spark.createDataFrame(rows, "doc_id bigint, text string")

    def test_viral_line_removed_everywhere(self, spark):
        from mindocr_spark.functions.dedup import boilerplate_purge

        out = {r["doc_id"]: r["text"] for r in
               boilerplate_purge(self._docs(spark), max_df=2).collect()}
        # banner df=4 > 2 → gone from EVERY doc, first occurrence included
        for i in (1, 2, 3):
            assert self.BANNER not in out[i]
            assert out[i].endswith("\nok")       # short line kept in place
            assert out[i].count("\n") == 1       # unique line + ok
        # all-boilerplate doc comes back empty, not lost
        assert out[4] == ""
        assert set(out) == {1, 2, 3, 4}

    def test_df_at_threshold_survives(self, spark):
        from mindocr_spark.functions.dedup import boilerplate_purge

        shared = "this exact long sentence appears in just two documents"
        df = spark.createDataFrame(
            [(1, shared + "\nalpha"), (2, shared + "\nbeta"),
             (3, "an unrelated third document with its own long text")],
            "doc_id bigint, text string",
        )
        out = {r["doc_id"]: r["text"] for r in
               boilerplate_purge(df, max_df=2).collect()}
        # df == max_df is NOT boilerplate — both copies survive
        assert out[1].startswith(shared) and out[2].startswith(shared)
        assert out[3] == "an unrelated third document with its own long text"

    def test_contrast_with_paragraph_dedup(self, spark):
        """Same input, opposite rules: paragraph dedup keeps the first
        banner occurrence; the purge keeps none."""
        from mindocr_spark.functions.dedup import (
            boilerplate_purge,
            paragraph_dedup,
        )

        docs = self._docs(spark)
        kept_first = {r["doc_id"]: r["text"] for r in
                      paragraph_dedup(docs, min_para_chars=30).collect()}
        purged = {r["doc_id"]: r["text"] for r in
                  boilerplate_purge(docs, max_df=2).collect()}
        assert self.BANNER in kept_first[1]          # first occurrence kept
        assert self.BANNER not in kept_first[2]
        assert all(self.BANNER not in t for t in purged.values())


class TestNgramNovelty:
    def test_first_occurrence_golden(self, spark):
        from mindocr_spark.functions.dedup import ngram_novelty

        # doc 1 introduces "a b c d" (shingles: "a b c", "b c d");
        # doc 2 repeats "a b c" and adds "c x y" tail: shingles
        # "a b c"(seen), "b c x"(new), "c x y"(new) → 2/3 novel;
        # doc 3 is a verbatim copy of doc 1 → 0 novel; doc 4 too short.
        df = spark.createDataFrame(
            [(1, "a b c d"), (2, "a b c x y"), (3, "a b c d"),
             (4, "a b")],
            "doc_id bigint, text string",
        )
        got = {r["doc_id"]: r for r in ngram_novelty(df, k=3).collect()}
        assert (got[1]["n_shingles"], got[1]["n_novel"]) == (2, 2)
        assert got[1]["novelty"] == 1.0
        assert (got[2]["n_shingles"], got[2]["n_novel"]) == (3, 2)
        assert got[2]["novelty"] == round(2 / 3, 6)
        assert (got[3]["n_shingles"], got[3]["n_novel"]) == (2, 0)
        assert got[3]["novelty"] == 0.0
        # short doc: evidence-free NULL, never dropped
        assert (got[4]["n_shingles"], got[4]["novelty"]) == (0, None)

    def test_no_self_join_plan(self, spark):
        from mindocr_spark.functions.dedup import ngram_novelty

        df = spark.read.parquet(
            "/root/testdata/sf0.001/documents.parquet"
        ).select("doc_id", "text")
        plan = (
            ngram_novelty(df)._jdf.queryExecution()
            .executedPlan().toString()
        )
        # window-min + re-agg + anchor join; the only joins allowed
        # are the left anchor join — never a shingle self-join
        assert "BatchEvalPython" not in plan
        assert plan.count("SortMergeJoin") + plan.count(
            "BroadcastHashJoin") <= 1


# ----------------------------------------------------------------------
# dup_alignment (explainable near-dup evidence)
# ----------------------------------------------------------------------

def test_dup_alignment_finds_copied_block(spark):
    from mindocr_spark.functions.dedup import dup_alignment

    # b copies a's tokens 3..7 (w3..w7) at its positions 1..5
    docs = spark.createDataFrame(
        [(1, "w1 w2 w3 w4 w5 w6 w7 w8"),
         (2, "w3 w4 w5 w6 w7 zz yy")],
        "doc_id long, text string",
    )
    pairs = spark.createDataFrame([(1, 2)], "doc_a long, doc_b long")
    r = dup_alignment(docs, pairs, k=3).collect()[0]
    # shared 3-shingles: 'w3 w4 w5','w4 w5 w6','w5 w6 w7' at offsets
    # pa-pb = 3-1 = 2 throughout -> one run of 3
    assert (r["n_shared"], r["run_len"], r["align_offset"],
            r["run_start_a"]) == (3, 3, 2, 3)


def test_dup_alignment_tie_and_no_overlap(spark):
    from mindocr_spark.functions.dedup import dup_alignment

    docs = spark.createDataFrame(
        [(1, "a b c x y z a b c"),
         (2, "a b c q q q"),          # matches twice at two offsets
         (3, "totally different words")],
        "doc_id long, text string",
    )
    pairs = spark.createDataFrame(
        [(1, 2), (1, 3)], "doc_a long, doc_b long")
    rows = dup_alignment(docs, pairs, k=3).collect()
    assert len(rows) == 1              # pair (1,3): no shared shingle
    r = rows[0]
    # 'a b c' matches at pa=1 (off 0) and pa=7 (off 6): equal run_len 1,
    # tie breaks to the SMALLER offset
    assert (r["doc_b"], r["run_len"], r["align_offset"]) == (2, 1, 0)


class TestMirrorStats:
    def _run(self, spark, pairs, member, **kw):
        from mindocr_spark.functions.dedup import mirror_stats

        p = spark.createDataFrame(pairs, "id_a bigint, id_b bigint")
        m = spark.createDataFrame(member, "doc_id bigint, group string")
        out = mirror_stats(p, m, **kw).collect()
        return {(r["group_a"], r["group_b"]): r for r in out}

    def test_planted_mirror_fires_and_organic_does_not(self, spark):
        # site A: docs 0-3, its mirror M: docs 10-13 (all 4 duplicated);
        # site B: docs 20-23 with ONE stray dup into A
        member = (
            [(i, "a") for i in range(4)]
            + [(10 + i, "m") for i in range(4)]
            + [(20 + i, "b") for i in range(4)]
        )
        pairs = [(i, 10 + i) for i in range(4)] + [(0, 20)]
        out = self._run(spark, pairs, member, min_share=(1, 2))
        am = out[("a", "m")]
        assert (am["n_dup_pairs"], am["n_a"], am["n_b"]) == (4, 4, 4)
        assert am["pair_share"] == 1.0 and am["is_mirror"]
        ab = out[("a", "b")]
        assert ab["n_dup_pairs"] == 1 and not ab["is_mirror"]
        assert ab["pair_share"] == 0.25

    def test_within_group_pairs_excluded(self, spark):
        member = [(0, "a"), (1, "a"), (2, "b")]
        out = self._run(spark, [(0, 1)], member)
        assert out == {}

    def test_integer_boundary_exact(self, spark):
        # min side 4 docs, rule 1/4: exactly 1 pair sits ON the boundary
        member = [(i, "a") for i in range(4)] + [(10, "m"), (11, "m"),
                                                 (12, "m"), (13, "m")]
        out = self._run(spark, [(0, 10)], member, min_share=(1, 4))
        assert out[("a", "m")]["is_mirror"] is True

    def test_guard(self, spark):
        import pytest as _pytest

        from mindocr_spark.functions.dedup import mirror_stats

        p = spark.createDataFrame([(0, 1)], "id_a bigint, id_b bigint")
        m = spark.createDataFrame([(0, "a")], "doc_id bigint, group string")
        with _pytest.raises(ValueError):
            mirror_stats(p, m, min_share=(1, 0))


class TestForgetPropagation:
    def _docs(self, spark):
        rows = [
            (1, "shared alpha"), (2, "shared alpha"), (3, "shared alpha"),
            (4, "solo beta"),
            (5, "pair gamma"), (6, "pair gamma"),
            (7, "untouched delta"),
        ]
        return spark.createDataFrame(rows, "doc_id bigint, text string")

    def test_all_three_actions(self, spark):
        from mindocr_spark.functions.dedup import forget_propagation

        reqs = spark.createDataFrame(
            [(1,), (4,), (6,), (999,), (1,)], "doc_id bigint")
        out = {r["action"]: r for r in forget_propagation(
            self._docs(spark), reqs).collect()}
        assert set(out) == {"cluster_gone", "reelect", "rep_unchanged"}
        re_ = out["reelect"]   # cluster {1,2,3}: rep 1 deleted → 2
        assert (re_["rep_before"], re_["rep_after"]) == (1, 2)
        assert (re_["n_before"], re_["n_deleted"], re_["n_after"]) == (3, 1, 2)
        gone = out["cluster_gone"]  # singleton 4
        assert gone["rep_after"] is None and gone["n_after"] == 0
        ru = out["rep_unchanged"]   # cluster {5,6}: non-rep 6 deleted
        assert ru["rep_before"] == ru["rep_after"] == 5

    def test_untouched_clusters_absent_and_unknown_ids_noop(self, spark):
        from mindocr_spark.functions.dedup import forget_propagation

        reqs = spark.createDataFrame([(999,)], "doc_id bigint")
        assert forget_propagation(self._docs(spark), reqs).count() == 0

    def test_string_ids_elect_representatives(self, spark):
        # ids keep their natural type: url/content-hash ids must elect
        # reps instead of NULLing out through a bigint cast
        from mindocr_spark.functions.dedup import forget_propagation

        docs = spark.createDataFrame(
            [("url-a", "same text"), ("url-b", "same text"),
             ("url-c", "same text")],
            "doc_id string, text string")
        reqs = spark.createDataFrame([("url-a",)], "doc_id string")
        r = forget_propagation(docs, reqs).collect()[0]
        assert r["rep_before"] == "url-a"
        assert r["rep_after"] == "url-b"
        assert r["action"] == "reelect"


class TestWinnowFingerprints:
    def _run(self, spark, texts, k=4, w=4):
        from mindocr_spark.functions.dedup import winnow_fingerprints

        df = spark.createDataFrame(
            [(i, t) for i, t in enumerate(texts)],
            "doc_id long, text string",
        )
        out = winnow_fingerprints(df, k=k, w=w).collect()
        byid = {}
        for r in out:
            byid.setdefault(r["doc_id"], set()).add(
                (r["pos"], r["gram_hash"])
            )
        return byid

    def test_guarantee_shared_run_always_detected(self, spark):
        # the MOSS guarantee: docs sharing a substring of length
        # >= w+k-1 share at least one (hash) fingerprint, wherever
        # the run sits inside otherwise-different documents
        shared = "zqxjkwvfyp"  # k=4, w=4 → guarantee at len >= 7
        a = "aaaaaaaaaa" + shared + "bbbbbbbbbb"
        b = "cccc" + shared + "dddddddddddddddd"
        out = self._run(spark, [a, b])
        ha = {h for _, h in out[0]}
        hb = {h for _, h in out[1]}
        assert ha & hb, "shared run missed — guarantee violated"

    def test_every_window_covered(self, spark):
        # positions selected must leave no gap of w or more grams
        text = "the quick brown fox jumps over the lazy dog again"
        out = self._run(spark, [text], k=4, w=5)
        pos = sorted(p for p, _ in out[0])
        assert pos, "no fingerprints"
        gaps = [b - a for a, b in zip(pos, pos[1:])]
        assert all(g <= 5 for g in gaps), gaps

    def test_short_doc_yields_nothing(self, spark):
        # len < k+w-1: no complete window
        out = self._run(spark, ["abcdef"], k=4, w=4)
        assert out == {}

    def test_identical_docs_identical_fingerprints(self, spark):
        t = "some reasonably long text for fingerprint determinism"
        out = self._run(spark, [t, t])
        assert out[0] == out[1]

    def test_normalization_collapses_whitespace(self, spark):
        a = "hello   world\t\tfingerprint test case here"
        b = "hello world fingerprint test case here"
        out = self._run(spark, [a, b])
        assert out[0] == out[1]

    def test_guards(self, spark):
        import pytest as _pytest

        from mindocr_spark.functions.dedup import winnow_fingerprints

        df = spark.createDataFrame([(1, "x")], "doc_id long, text string")
        with _pytest.raises(ValueError):
            winnow_fingerprints(df, k=1)
        with _pytest.raises(ValueError):
            winnow_fingerprints(df, w=1)


class TestPrefixFilterPairs:
    def _corpus(self, spark):
        # varied doc lengths, one viral closing sentence on most docs,
        # several planted near-dup families at different similarities
        viral = " all rights reserved contact us for more information"
        rows = []
        words = ("alpha beta gamma delta epsilon zeta eta theta iota "
                 "kappa lam mu nu xi omicron pi rho sigma tau "
                 "upsilon phi chi psi omega").split()
        for i in range(12):
            body = " ".join(
                words[(i + j) % len(words)] for j in range(10 + i)
            )
            rows.append((i, body + viral))
        # exact near-dup pair: one-word edit
        rows.append((100, " ".join(words[:15]) + viral))
        rows.append((101, " ".join(words[:14] + ["EDITED"]) + viral))
        # identical pair
        rows.append((200, "unique sentence about catalyst " + viral))
        rows.append((201, "unique sentence about catalyst " + viral))
        return spark.createDataFrame(rows, "doc_id bigint, text string")

    @pytest.mark.parametrize("tau", [0.3, 0.5, 0.7])
    def test_equals_uncapped_bruteforce(self, spark, tau):
        from mindocr_spark.functions.dedup import (
            ngram_jaccard_pairs, prefix_filter_pairs,
        )

        docs = self._corpus(spark)
        got = {
            (r["id_a"], r["id_b"]): r["jaccard"]
            for r in prefix_filter_pairs(
                docs, k=3, threshold=tau
            ).collect()
        }
        want = {
            (r["id_a"], r["id_b"]): r["jaccard"]
            for r in ngram_jaccard_pairs(
                docs, k=3, threshold=tau,
                max_shingle_freq=10**9,
            ).collect()
        }
        assert got == want and len(want) > 0

    def test_finds_pair_the_df_cap_drops(self, spark):
        from mindocr_spark.functions.dedup import (
            ngram_jaccard_pairs, prefix_filter_pairs,
        )

        # two docs similar ONLY through a phrase every doc shares:
        # a df-cap of 2 excises it; prefix filtering needs no cap
        shared = "one two three four five six seven eight"
        rows = [(i, f"filler{i} pad{i} junk{i} " + shared)
                for i in range(10)]
        docs = spark.createDataFrame(rows, "doc_id bigint, text string")
        pf = prefix_filter_pairs(docs, k=3, threshold=0.5).collect()
        assert len(pf) == len(rows) * (len(rows) - 1) // 2
        capped = ngram_jaccard_pairs(
            docs, k=3, threshold=0.5, max_shingle_freq=2
        ).collect()
        assert len(capped) == 0

    def test_exact_threshold_boundary_kept(self, spark):
        from mindocr_spark.functions.dedup import prefix_filter_pairs

        # doc a: shingles of 9 words (7); doc b: a's first 8 words +
        # 6 new → intersection 6 of sizes 7/12... build J = 0.5
        # directly: a has 6 shingles, b has 6, sharing 4 → J = 4/8
        a = "w1 w2 w3 w4 w5 w6 w7 w8"          # 6 shingles
        b = "w3 w4 w5 w6 w7 w8 x1 x2"          # shares w3w4w5..w6w7w8
        docs = spark.createDataFrame(
            [(1, a), (2, b)], "doc_id bigint, text string"
        )
        out = prefix_filter_pairs(docs, k=3, threshold=0.5).collect()
        (r,) = out
        assert (r["n_a"], r["n_b"], r["n_inter"]) == (6, 6, 4)
        assert r["jaccard"] == 0.5

    def test_identical_docs(self, spark):
        from mindocr_spark.functions.dedup import prefix_filter_pairs

        docs = spark.createDataFrame(
            [(1, "a b c d e"), (2, "a b c d e")],
            "doc_id bigint, text string",
        )
        (r,) = prefix_filter_pairs(docs, threshold=0.9).collect()
        assert r["jaccard"] == 1.0

    def test_guards(self, spark):
        from mindocr_spark.functions.dedup import prefix_filter_pairs

        docs = spark.createDataFrame(
            [(1, "a b c")], "doc_id bigint, text string"
        )
        with pytest.raises(ValueError):
            prefix_filter_pairs(docs, threshold=0.0)
        with pytest.raises(ValueError):
            prefix_filter_pairs(docs, threshold=1.0)
        with pytest.raises(ValueError):
            prefix_filter_pairs(docs, k=0)

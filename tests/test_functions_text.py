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


def test_redact_pii_cols(spark):
    from mindocr_spark.functions.text import redact_pii_cols

    rows = [
        (1, "reach me at jane.doe+spam@sub.example.co.uk or not at all"),
        (2, "servers 10.0.3.17 and 192.168.001.2 answered"),
        (3, "call +44 20 7946 0958 or +1 555 0100 now"),
        (4, "no pii here just words and the number 12345"),
        (5, "combo a@b.io at 8.8.8.8 via +33 1 42 68 53 00"),
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    out = {r["doc_id"]: r for r in redact_pii_cols(df).collect()}

    assert out[1]["text"] == "reach me at <EMAIL> or not at all"
    assert out[1]["n_emails"] == 1 and out[1]["n_ips"] == 0

    assert out[2]["text"] == "servers <IP> and <IP> answered"
    assert out[2]["n_ips"] == 2

    assert out[3]["text"] == "call <PHONE> or <PHONE> now"
    assert out[3]["n_phones"] == 2

    assert out[4]["text"] == rows[3][1]  # untouched
    assert (out[4]["n_emails"], out[4]["n_ips"], out[4]["n_phones"]) \
        == (0, 0, 0)

    assert out[5]["text"] == "combo <EMAIL> at <IP> via <PHONE>"
    assert (out[5]["n_emails"], out[5]["n_ips"], out[5]["n_phones"]) \
        == (1, 1, 1)


def test_curate_redact_pii_collapses_pii_only_variants(spark):
    """Two pages identical except for their contact email must collapse
    to one doc when redact_pii is on (scrub-then-dedup ordering)."""
    from mindocr_spark.corpus import generate_batch, PAGES_SCHEMA_DDL
    from mindocr_spark.curate import CurateConfig, curate

    rows = generate_batch(13, range(10))
    body = ("a long enough prose paragraph about the annual migration "
            "of garden snails across the village green in autumn")

    def page(tag, email):
        html = (f"<html><body><article><p>{body} write to "
                f"{email}</p></article></body></html>").encode()
        return dict(rows[0], url=f"https://pii.example/{tag}",
                    html=html, text="")

    pages = spark.createDataFrame(
        rows + [page("a", "ann@example.com"), page("b", "bob@example.org")],
        PAGES_SCHEMA_DDL,
    )
    base = dict(min_chars=50, neardup_threshold=2.0)

    urls = {r["url"] for r in curate(pages, CurateConfig(**base))[0].collect()}
    assert {"https://pii.example/a", "https://pii.example/b"} <= urls

    out = {r["url"]: r["text"] for r in
           curate(pages, CurateConfig(**base, redact_pii=True))[0].collect()}
    assert "https://pii.example/a" in out          # smallest url survives
    assert "https://pii.example/b" not in out      # PII-only variant gone
    assert "<EMAIL>" in out["https://pii.example/a"]
    assert "ann@example.com" not in out["https://pii.example/a"]


class TestUnicodeNormalize:
    def test_known_pairs_and_flags(self, spark):
        from mindocr_spark.functions.text import unicode_normalize_cols

        rows = [
            (1, "café"),          # decomposed → composed
            (2, "café"),           # already composed → unchanged
            (3, "Ångström"),
            (4, None),                  # null passthrough
            (5, "plain ascii"),
        ]
        df = spark.createDataFrame(rows, "doc_id bigint, text string")
        out = {r["doc_id"]: r for r in
               unicode_normalize_cols(df).collect()}
        assert out[1]["text"] == "café" and out[1]["was_normalized"]
        assert out[2]["text"] == "café" and not out[2]["was_normalized"]
        assert out[3]["text"] == "Ångström"
        assert out[3]["was_normalized"]
        assert out[4]["text"] is None and not out[4]["was_normalized"]
        assert out[5]["text"] == "plain ascii"
        assert not out[5]["was_normalized"]

    def test_invalid_form_raises(self, spark):
        from mindocr_spark.functions.text import unicode_normalize_cols

        df = spark.createDataFrame([(1, "x")], "doc_id bigint, text string")
        with pytest.raises(ValueError, match="normalization form"):
            unicode_normalize_cols(df, form="NFX")

    def test_engine_parity_with_duckdb(self, spark):
        """The oracle's exactness claim: Python unicodedata (the Spark
        path) and DuckDB's utf8proc produce identical NFC output on
        adversarial sequences — multiple combining marks, Hangul jamo,
        compatibility chars NFC must NOT touch, and singletons."""
        import duckdb

        cases = [
            "é̂",            # two combining marks
            "ẛ̣",             # long s with dot above + dot below
            "각",       # Hangul jamo → precomposed syllable
            "ﬁne",                 # ligature fi: NFC keeps it
            "Å",                   # ANGSTROM SIGN → Å (singleton)
            "q̣̇",            # reorderable combining marks
            "",
        ]
        from mindocr_spark.functions.text import unicode_normalize_cols

        df = spark.createDataFrame(
            [(i, c) for i, c in enumerate(cases)],
            "doc_id bigint, text string",
        )
        got = {r["doc_id"]: r["text"]
               for r in unicode_normalize_cols(df).collect()}
        for i, c in enumerate(cases):
            want = duckdb.execute(
                "select nfc_normalize(?)", [c]
            ).fetchone()[0]
            assert got[i] == want, (i, c)


class TestStratifiedSample:
    def test_fractions_and_determinism(self, spark):
        from mindocr_spark.functions.text import stratified_sample

        rows = [(i, "en" if i % 2 == 0 else "de") for i in range(2000)]
        df = spark.createDataFrame(rows, "doc_id bigint, lang string")
        out = stratified_sample(
            df, {"en": 0.25}, default_fraction=0.75
        )
        kept = [(r["doc_id"], r["lang"]) for r in out.collect()]
        # deterministic: identical kept set on re-run
        again = [(r["doc_id"], r["lang"]) for r in stratified_sample(
            df, {"en": 0.25}, default_fraction=0.75).collect()]
        assert sorted(kept) == sorted(again)
        n_en = sum(1 for _, l in kept if l == "en")
        n_de = sum(1 for _, l in kept if l == "de")
        # 1000 docs per stratum: rates land near the targets
        assert 0.18 <= n_en / 1000 <= 0.32
        assert 0.68 <= n_de / 1000 <= 0.82

    def test_edge_fractions(self, spark):
        from mindocr_spark.functions.text import stratified_sample

        df = spark.createDataFrame(
            [(i, "en") for i in range(100)], "doc_id bigint, lang string"
        )
        assert stratified_sample(df, {"en": 1.0}).count() == 100
        assert stratified_sample(df, {"en": 0.0}).count() == 0
        # unlisted stratum → default
        assert stratified_sample(df, {"zz": 0.0}).count() == 100

    def test_no_shuffle_no_python(self, spark):
        from mindocr_spark.functions.text import stratified_sample

        df = spark.createDataFrame(
            [(1, "en")], "doc_id bigint, lang string"
        )
        plan = spark._jvm.PythonSQLUtils.explainString(
            stratified_sample(df, {"en": 0.5})._jdf.queryExecution(),
            "formatted",
        )
        assert "Exchange" not in plan and "EvalPython" not in plan

    def test_null_id_rows_exempt(self, spark):
        from mindocr_spark.functions.text import stratified_sample

        df = spark.createDataFrame(
            [(None, "en"), (1, "en")], "doc_id bigint, lang string"
        )
        out = stratified_sample(df, {"en": 0.0}).collect()
        # fraction-0 drops hashable rows; the NULL id is exempt
        assert [r["doc_id"] for r in out] == [None]


class TestTokenBudgetSample:
    def test_matches_single_window_reference(self, spark):
        """The distributed prefix-sum must land on the exact values of
        the textbook one-window cumsum, and every stratum's kept token
        total must respect its budget."""
        from pyspark.sql import Window, functions as F
        from mindocr_spark.functions.text import (
            token_budget_sample, tokens_col,
        )

        rows = [(i, "en" if i % 2 == 0 else "de",
                 "word " * (5 + i % 17)) for i in range(400)]
        df = spark.createDataFrame(
            rows, "doc_id bigint, lang string, text string"
        )
        out = token_budget_sample(df, {"en": 300},
                                  default_budget=500).collect()
        h = F.md5(F.col("doc_id").cast("string").cast("binary"))
        w = Window.partitionBy("lang").orderBy(h, "doc_id")
        ref = (
            df.withColumn("n_tokens", F.size(tokens_col("text")))
            .withColumn("cum", F.sum("n_tokens").over(w))
            .where(
                ((F.col("lang") == "en") & (F.col("cum") <= 300))
                | ((F.col("lang") != "en") & (F.col("cum") <= 500))
            )
            .collect()
        )
        assert sorted((r["doc_id"], r["cum_tokens"]) for r in out) == \
            sorted((r["doc_id"], r["cum"]) for r in ref)
        assert sum(r["n_tokens"] for r in out if r["lang"] == "en") <= 300
        assert sum(r["n_tokens"] for r in out if r["lang"] == "de") <= 500

    def test_none_budget_keeps_all(self, spark):
        from mindocr_spark.functions.text import token_budget_sample

        df = spark.createDataFrame(
            [(i, "en", "a b c") for i in range(50)],
            "doc_id bigint, lang string, text string",
        )
        assert token_budget_sample(df, {"en": None}).count() == 50
        assert token_budget_sample(df, {}, default_budget=None).count() == 50

    def test_local_window_is_salted(self, spark):
        """The per-row cumsum window must partition on (stratum,
        bucket), never on the stratum alone — the skew guarantee."""
        from mindocr_spark.functions.text import token_budget_sample

        df = spark.createDataFrame(
            [(1, "en", "a b")], "doc_id bigint, lang string, text string"
        )
        plan = spark._jvm.PythonSQLUtils.explainString(
            token_budget_sample(df, {"en": 10})._jdf.queryExecution(),
            "formatted",
        )
        import re
        # the n_tokens cumsum's windowspecdefinition must partition on
        # (stratum, __b) — a bare-stratum spec is the hot-key straggler
        assert re.search(
            r"sum\(n_tokens#\d+\) windowspecdefinition\("
            r"lang#\d+, __b#\d+,", plan
        ), "big-side cumsum window lost its __b salt"

    def test_null_id_or_stratum_rows_exempt(self, spark):
        from mindocr_spark.functions.text import token_budget_sample

        df = spark.createDataFrame(
            [(None, "en", "a b c"), (1, None, "a b"), (2, "en", "x y z")],
            "doc_id bigint, lang string, text string",
        )
        out = {(r["doc_id"], r["lang"]): r for r in
               token_budget_sample(df, {"en": 1}).collect()}
        # budget of 1 token drops the only hashable en doc (3 tokens
        # > 1); the NULL-keyed rows pass through with NULL cum
        assert set(out) == {(None, "en"), (1, None)}
        assert all(r["cum_tokens"] is None for r in out.values())


class TestSequencePack:
    def test_matches_single_window_reference(self, spark):
        """Packing spans must equal the textbook formulation: one
        window cumsum per stratum, then integer chunk math."""
        from pyspark.sql import Window, functions as F
        from mindocr_spark.functions.text import sequence_pack, tokens_col

        rows = [(i, "en" if i % 3 else "de",
                 "tok " * (3 + i % 11)) for i in range(200)]
        df = spark.createDataFrame(
            rows, "doc_id bigint, lang string, text string"
        )
        L = 32
        out = {r["doc_id"]: r for r in sequence_pack(df, L).collect()}
        h = F.md5(F.col("doc_id").cast("string").cast("binary"))
        w = Window.partitionBy("lang").orderBy(h, "doc_id")
        ref = (
            df.withColumn("n", F.size(tokens_col("text")))
            .withColumn("cum", F.sum("n").over(w))
            .collect()
        )
        assert len(out) == len(ref)
        for r in ref:
            got = out[r["doc_id"]]
            start = r["cum"] - r["n"]
            assert got["cum_tokens"] == r["cum"]
            assert got["seq_first"] == start // L
            assert got["seq_last"] == (r["cum"] - 1) // L
            assert got["seq_offset"] == start % L
            assert got["n_seqs"] == (r["cum"] - 1) // L - start // L + 1

    def test_spans_tile_the_stream_exactly(self, spark):
        """Adjacent docs' spans must abut: doc k+1 starts where doc k
        ended, and a doc crossing a boundary reports n_seqs > 1."""
        from mindocr_spark.functions.text import sequence_pack

        df = spark.createDataFrame(
            [(i, "en", "w " * 10) for i in range(40)],
            "doc_id bigint, lang string, text string",
        )
        rows = sorted(
            sequence_pack(df, 16).collect(), key=lambda r: r["cum_tokens"]
        )
        prev_end = 0
        crossers = 0
        for r in rows:
            assert r["cum_tokens"] - r["n_tokens"] == prev_end
            prev_end = r["cum_tokens"]
            if r["n_seqs"] > 1:
                crossers += 1
        # 10-token docs into 16-token sequences: crossers must exist
        assert crossers > 0

    def test_zero_token_and_null_rows_get_null_spans(self, spark):
        from mindocr_spark.functions.text import sequence_pack

        df = spark.createDataFrame(
            [(1, "en", "a b"), (2, "en", "   "), (None, "en", "x"),
             (3, None, "y")],
            "doc_id bigint, lang string, text string",
        )
        out = {(r["doc_id"], r["lang"]): r
               for r in sequence_pack(df, 8).collect()}
        assert len(out) == 4  # nothing vanishes
        assert out[(1, "en")]["n_seqs"] == 1
        for key in [(2, "en"), (None, "en"), (3, None)]:
            assert out[key]["seq_first"] is None
            assert out[key]["n_seqs"] is None
        # the zero-token doc still has a cum position; NULL-keyed don't
        assert out[(2, "en")]["cum_tokens"] is not None
        assert out[(None, "en")]["cum_tokens"] is None

    def test_rejects_nonpositive_seq_len(self, spark):
        import pytest
        from mindocr_spark.functions.text import sequence_pack

        df = spark.createDataFrame(
            [(1, "en", "a")], "doc_id bigint, lang string, text string"
        )
        with pytest.raises(ValueError):
            sequence_pack(df, 0)

    def test_cumsum_window_is_salted(self, spark):
        """sequence_pack inherits the distributed prefix-sum: the
        big-side window must partition on (stratum, __b)."""
        import re
        from mindocr_spark.functions.text import sequence_pack

        df = spark.createDataFrame(
            [(1, "en", "a b")], "doc_id bigint, lang string, text string"
        )
        plan = spark._jvm.PythonSQLUtils.explainString(
            sequence_pack(df, 8)._jdf.queryExecution(), "formatted"
        )
        assert re.search(
            r"sum\(n_tokens#\d+\) windowspecdefinition\("
            r"lang#\d+, __b#\d+,", plan
        ), "big-side cumsum window lost its __b salt"


class TestMojibake:
    """Guarded mojibake detect/repair: rewrite only when provably safe."""

    def _run(self, spark, texts):
        from mindocr_spark.functions.text import mojibake_cols

        df = spark.createDataFrame([(t,) for t in texts], "text string")
        return mojibake_cols(df).collect()

    def test_repairs_double_encoded_text(self, spark):
        orig = "café résumé naïve señor straße"
        broken = orig.encode("utf-8").decode("latin-1")
        [r] = self._run(spark, ["body " + broken])
        assert (r["moji_detected"], r["moji_fixed"]) == (True, True)
        assert r["text"] == "body " + orig

    def test_unrepairable_keeps_bytes(self, spark):
        """Signature present but a CJK char blocks the Latin-1
        reinterpretation: detected, NOT fixed, bytes untouched."""
        broken = "é".encode("utf-8").decode("latin-1")
        t = f"body {broken} 汉"
        [r] = self._run(spark, [t])
        assert (r["moji_detected"], r["moji_fixed"]) == (True, False)
        assert r["text"] == t

    def test_invalid_utf8_reinterpretation_refused(self, spark):
        """A lead-byte char followed by a NON-continuation char after a
        genuine signature elsewhere: the whole-string decode would
        throw, so the guard must refuse (is_valid_utf8 arm)."""
        broken = "é".encode("utf-8").decode("latin-1")
        t = f"{broken} then lone Ã dangling"
        [r] = self._run(spark, [t])
        assert (r["moji_detected"], r["moji_fixed"]) == (True, False)
        assert r["text"] == t

    def test_native_accents_pass_through(self, spark):
        for t in ["native é accents à la carte", "straße naïve señor",
                  "plain ascii", ""]:
            [r] = self._run(spark, [t])
            assert (r["moji_detected"], r["moji_fixed"]) == (False, False)
            assert r["text"] == t

    def test_null_text_survives(self, spark):
        [r] = self._run(spark, [None])
        assert r["text"] is None
        assert not r["moji_detected"]

    def test_one_pass_per_run(self, spark):
        """Doubly-double-encoded text repairs exactly one layer."""
        orig = "café"
        once = orig.encode("utf-8").decode("latin-1")
        twice = once.encode("utf-8").decode("latin-1")
        [r] = self._run(spark, [twice])
        assert r["moji_fixed"]
        assert r["text"] == once


class TestCdcChunks:
    def _run(self, spark, texts, **kw):
        df = spark.createDataFrame(
            [(i, t) for i, t in enumerate(texts)],
            "doc_id bigint, text string",
        )
        from mindocr_spark.functions.text import cdc_chunks

        return cdc_chunks(df, **kw).collect()

    def test_chunks_tile_the_document_exactly(self, spark):
        text = "the quick brown fox jumps over the lazy dog " * 8
        rows = sorted(self._run(spark, [text], nibbles=1),
                      key=lambda r: r["chunk_idx"])
        assert rows[0]["chunk_start"] == 1
        for a, b in zip(rows, rows[1:]):
            assert b["chunk_start"] == a["chunk_start"] + a["chunk_len"]
        assert sum(r["chunk_len"] for r in rows) == len(text)
        assert len(rows) > 1  # the rule actually fired

    def test_chunk_digests_match_python(self, spark):
        import hashlib

        text = "content defined chunking stays stable under edits " * 5
        for r in self._run(spark, [text], nibbles=1):
            seg = text[r["chunk_start"] - 1:
                       r["chunk_start"] - 1 + r["chunk_len"]]
            assert r["chunk_md5"] == hashlib.md5(seg.encode()).hexdigest()

    def test_edit_shifts_one_chunk_not_all(self, spark):
        """The content-defined property: inserting bytes early changes
        the edited chunk's identity but every LATER chunk's digest
        survives (positions shift, identities do not)."""
        base = "alpha beta gamma delta epsilon zeta eta theta iota " * 6
        edited = base[:3] + "XYZ" + base[3:]
        got = self._run(spark, [base, edited], nibbles=1)
        d0 = [r["chunk_md5"] for r in sorted(
            (r for r in got if r["doc_id"] == 0),
            key=lambda r: r["chunk_idx"])]
        d1 = [r["chunk_md5"] for r in sorted(
            (r for r in got if r["doc_id"] == 1),
            key=lambda r: r["chunk_idx"])]
        assert len(d0) > 4
        assert d0[0] != d1[0]  # the edited region re-identifies
        # every chunk past the edit's neighborhood survives: the digest
        # lists share a common suffix covering all but the first ≤3
        # chunks of either doc (the edit may create/destroy ONE
        # boundary near it, merging or splitting a local chunk)
        common = 0
        while (common < min(len(d0), len(d1))
               and d0[-1 - common] == d1[-1 - common]):
            common += 1
        assert common >= len(d0) - 3 and common >= len(d1) - 3

    def test_short_and_null_docs(self, spark):
        rows = self._run(spark, ["tiny", None], nibbles=1)
        assert [(r["doc_id"], r["chunk_idx"], r["chunk_start"],
                 r["chunk_len"]) for r in rows] == [(0, 0, 1, 4)]

    def test_rejects_bad_params(self, spark):
        import pytest

        with pytest.raises(ValueError):
            self._run(spark, ["x"], k=0)
        with pytest.raises(ValueError):
            self._run(spark, ["x"], nibbles=0)

    def test_plan_is_narrow_one_arrow_fold(self, spark):
        """Zero shuffles; boundary detection is exactly ONE
        Arrow-batched stage (the vectorized rolling hash), never a
        per-row Python eval."""
        from mindocr_spark.functions.text import cdc_chunks

        df = spark.range(3).selectExpr(
            "id AS doc_id", "repeat('word soup ', 40) AS text"
        )
        plan = cdc_chunks(df)._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan
        assert "BatchEvalPython" not in plan
        assert plan.count("ArrowEvalPython") == 1

    def test_boundary_rule_matches_scalar_horner(self, spark):
        """The engine's vectorized fold equals a scalar Horner
        reimplementation (the same arithmetic the DuckDB oracle runs),
        including on non-ASCII codepoints."""
        from mindocr_spark.functions.text import CDC_BASE, CDC_MOD

        text = "héllo wörld γράμμα content defined chunking " * 4
        k, mod = 8, 16

        def horner(i):  # 1-based gram start
            h = 0
            for j in range(k):
                h = (h * CDC_BASE + ord(text[i - 1 + j])) % CDC_MOD
            return h

        want = [i for i in range(2, len(text) - k + 2)
                if horner(i) % mod == 0]
        rows = sorted(self._run(spark, [text], nibbles=1),
                      key=lambda r: r["chunk_idx"])
        got = [r["chunk_start"] for r in rows[1:]]  # drop the 1-start
        assert got == want and len(want) > 0


def test_lexical_diversity_golden(spark):
    from mindocr_spark.functions.text import lexical_diversity_cols

    df = spark.createDataFrame(
        [(0, "buy buy buy now buy buy"), (1, "all words here differ"),
         (2, ""), (3, None)],
        "doc_id bigint, text string",
    )
    got = {r["doc_id"]: r for r in lexical_diversity_cols(df).collect()}
    assert (got[0]["n_tokens"], got[0]["n_types"]) == (6, 2)
    assert got[0]["ttr"] == 2 / 6
    assert got[1]["ttr"] == 1.0
    assert got[2]["n_tokens"] == 0 and got[2]["ttr"] is None
    assert got[3]["ttr"] is None


class TestCodeMath:
    def _run(self, spark, rows):
        from mindocr_spark.functions.text import code_math_cols

        df = spark.createDataFrame(rows, "doc_id bigint, text string")
        return {r["doc_id"]: r for r in code_math_cols(df).collect()}

    def test_fenced_block_golden(self, spark):
        got = self._run(spark, [
            (1, "intro\n```\n    x = 1;\n    y = {2};\n```\nend"),
        ])[1]
        assert got["n_code_fences"] == 2
        assert got["n_lines"] == 6
        assert got["n_indented_lines"] == 2
        assert got["indent_frac"] == round(2 / 6, 6)
        assert got["n_code_symbols"] == 4  # ; ; { }
        assert got["is_code"] is True and got["is_math"] is False

    def test_indent_only_and_symbol_density(self, spark):
        got = self._run(spark, [
            (1, "a\n    b\n\tc\n    d"),          # 3/4 indented
            (2, "if (x) { y(); } done;"),           # 4 symbols < 10
            (3, "m { n }; o { p }; q { r }; s {}"),  # 8 braces + 3 semis
        ])
        assert got[1]["indent_frac"] == 0.75 and got[1]["is_code"] is True
        assert got[1]["n_code_fences"] == 0
        assert got[2]["n_code_symbols"] == 4 and got[2]["is_code"] is False
        assert got[3]["n_code_symbols"] == 11 and got[3]["is_code"] is True

    def test_latex_thresholds(self, spark):
        got = self._run(spark, [
            (1, r"x \frac{a}{b} and \sum y"),   # 2 markers -> math
            (2, "price $$ alone"),               # 1 marker  -> not math
            (3, r"\sqrt of $$ x $$"),            # 1 + 2 -> math
            (4, "plain prose only"),
        ])
        assert got[1]["n_latex"] == 2 and got[1]["is_math"] is True
        assert got[2]["n_latex"] == 1 and got[2]["is_math"] is False
        assert got[3]["n_latex"] == 3 and got[3]["is_math"] is True
        assert got[4]["is_math"] is False and got[4]["is_code"] is False

    def test_null_and_empty_text_get_verdicts(self, spark):
        got = self._run(spark, [(1, None), (2, "")])
        for d in (1, 2):
            assert got[d]["is_code"] is False and got[d]["is_math"] is False
            assert got[d]["indent_frac"] == 0.0

    def test_scan_only_plan(self, spark):
        from mindocr_spark.functions.text import code_math_cols

        df = spark.createDataFrame(
            [(1, "a\n    b")], "doc_id bigint, text string"
        )
        plan = (
            code_math_cols(df)._jdf.queryExecution().executedPlan().toString()
        )
        assert "Exchange" not in plan
        assert "BatchEvalPython" not in plan and "ArrowEval" not in plan


class TestTokenEntropy:
    def _run(self, spark, rows):
        from mindocr_spark.functions.text import entropy_cols

        df = spark.createDataFrame(rows, "doc_id bigint, text string")
        return {r["doc_id"]: r for r in entropy_cols(df).collect()}

    def test_goldens(self, spark):
        got = self._run(spark, [
            (1, "a a b b"),       # uniform over 2 types -> ln 2
            (2, "x x x x"),       # single type -> 0
            (3, "a a a b"),       # skewed 3:1
            (4, ""),              # no evidence -> NULL
            (5, None),
        ])
        # expected values follow the exact quantization pipeline:
        # p*round(ln p, 9) rounded at 12, summed exactly
        assert got[1]["token_entropy"] == pytest.approx(0.693147181, abs=1e-12)
        assert got[2]["token_entropy"] == 0.0
        assert got[3]["token_entropy"] == pytest.approx(
            0.215761554 + 0.34657359025, abs=1e-12
        )
        assert got[4]["token_entropy"] is None
        assert got[5]["token_entropy"] is None
        assert got[1]["n_types"] == 2 and got[1]["n_tokens"] == 4

    def test_shape_beats_ttr(self, spark):
        # equal TTR (2 types / 5 tokens) but different distribution
        # shape: 4:1 is more ordered than 3:2 — entropy must order them
        got = self._run(spark, [(1, "a a a a b"), (2, "a a a b b")])
        assert got[1]["n_types"] == got[2]["n_types"]
        assert got[1]["token_entropy"] < got[2]["token_entropy"]

    def test_scan_only_plan(self, spark):
        from mindocr_spark.functions.text import entropy_cols

        df = spark.createDataFrame([(1, "a b")], "doc_id bigint, text string")
        plan = (
            entropy_cols(df)._jdf.queryExecution().executedPlan().toString()
        )
        assert "Exchange" not in plan
        assert "BatchEvalPython" not in plan and "ArrowEval" not in plan


class TestSentenceSplit:
    def _run(self, spark, text):
        from mindocr_spark.functions.text import sentence_split

        df = spark.createDataFrame([(1, text)], "doc_id bigint, text string")
        return [
            (r["sent_idx"], r["sentence"], r["char_start"], r["char_end"])
            for r in sentence_split(df).orderBy("sent_idx").collect()
        ]

    def test_offsets_are_exact_source_spans(self, spark):
        text = "Hi there. Second one!  Third?? tail bit"
        got = self._run(spark, text)
        assert got == [
            (0, "Hi there.", 1, 9),
            (1, "Second one!", 11, 21),
            (2, "Third??", 24, 30),     # terminator run attached
            (3, "tail bit", 32, 39),    # unterminated tail fragment
        ]
        # offsets really index the source
        for _, sent, a, b in got:
            assert text[a - 1:b] == sent

    def test_trailing_newline_and_ellipsis(self, spark):
        # \z (not $) keeps the final-newline fragment out of limbo:
        # the tail "\n" trims to '' and is dropped, not mis-spanned
        assert self._run(spark, "One. Two...\n") == [
            (0, "One.", 1, 4),
            (1, "Two...", 6, 11),
        ]

    def test_empty_and_null(self, spark):
        from mindocr_spark.functions.text import sentence_split

        df = spark.createDataFrame(
            [(1, ""), (2, None), (3, "   ")], "doc_id bigint, text string"
        )
        assert sentence_split(df).count() == 0

    def test_single_shuffle_plan(self, spark):
        from mindocr_spark.functions.text import sentence_split

        df = spark.createDataFrame([(1, "a. b.")], "doc_id bigint, text string")
        plan = (
            sentence_split(df)._jdf.queryExecution().executedPlan().toString()
        )
        assert plan.count("Exchange") == 1
        assert "BatchEvalPython" not in plan and "ArrowEval" not in plan


class TestLengthHistogram:
    def test_power_of_two_boundaries_exact(self, spark):
        from mindocr_spark.functions.text import length_histogram

        # 1, 2 (=2^1), 3, 4 (=2^2), 7, 8 (=2^3) tokens, plus empty —
        # exact bucketing AT powers of two is the trap double log2 fails
        rows = [
            (1, "a"), (2, "a b"), (3, "a b c"), (4, "a b c d"),
            (7, " ".join("x" * 1 for _ in range(7))),
            (8, " ".join("y" for _ in range(8))),
            (9, ""),
        ]
        df = spark.createDataFrame(rows, "doc_id bigint, text string")
        got = {
            r["bucket"]: r for r in length_histogram(df).collect()
        }
        assert got[0]["n_docs"] == 1 and got[0]["lo_tokens"] == 1
        assert got[0]["hi_tokens"] == 1
        assert got[1]["n_docs"] == 2   # 2 and 3 tokens
        assert (got[1]["lo_tokens"], got[1]["hi_tokens"]) == (2, 3)
        assert got[2]["n_docs"] == 2   # 4 and 7
        assert (got[2]["lo_tokens"], got[2]["hi_tokens"]) == (4, 7)
        assert got[3]["n_docs"] == 1 and got[3]["lo_tokens"] == 8
        assert got[-1]["n_docs"] == 1 and got[-1]["sum_tokens"] == 0
        assert sum(r["n_docs"] for r in got.values()) == 7


class TestContextWindows:
    def test_window_arithmetic_golden(self, spark):
        from mindocr_spark.functions.text import context_windows

        toks170 = " ".join(f"t{i}" for i in range(170))
        df = spark.createDataFrame(
            [(1, "short doc here"), (2, toks170), (3, "")],
            "doc_id bigint, text string",
        )
        out = context_windows(df, window=64, stride=48).collect()
        by = {}
        for r in out:
            by.setdefault(r["doc_id"], []).append(r)
        # n <= window: exactly one full-coverage window
        assert len(by[1]) == 1
        w = by[1][0]
        assert (w["tok_start"], w["tok_end"], w["n_win_tokens"]) == (0, 3, 3)
        assert w["window_text"] == "short doc here"
        # n=170: ceil((170-64)/48)=3 extra → starts 0,48,96,144
        wins = sorted(by[2], key=lambda r: r["win_idx"])
        assert [w["tok_start"] for w in wins] == [0, 48, 96, 144]
        assert [w["tok_end"] for w in wins] == [64, 112, 160, 170]
        assert wins[0]["window_text"].split()[0] == "t0"
        assert wins[1]["window_text"].split()[0] == "t48"
        assert wins[-1]["n_win_tokens"] == 26   # short tail, never empty
        # zero-token doc emits no windows
        assert 3 not in by

    def test_full_coverage_and_overlap(self, spark):
        from mindocr_spark.functions.text import context_windows

        n = 200
        df = spark.createDataFrame(
            [(1, " ".join(str(i) for i in range(n)))],
            "doc_id bigint, text string",
        )
        wins = context_windows(df, window=64, stride=48).collect()
        covered = set()
        for w in wins:
            covered |= set(range(w["tok_start"], w["tok_end"]))
        assert covered == set(range(n))   # no token ever dropped

    def test_plan_is_narrow(self, spark):
        from mindocr_spark.functions.text import context_windows

        df = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        plan = (
            context_windows(df.select("doc_id", "text"))
            ._jdf.queryExecution().executedPlan().toString()
        )
        assert "Exchange" not in plan
        assert "BatchEvalPython" not in plan and "ArrowEval" not in plan


class TestScriptMix:
    def test_counts_and_dominance(self, spark):
        from mindocr_spark.functions.text import script_mix_cols

        rows = [
            (1, "hello world"),                     # latin only
            (2, "привет мир hello"),                # cyrillic dominant
            (3, "中文网页数据集 hi"),                  # cjk dominant
            (4, "12345 !!!"),                       # no scripted chars
            (5, "αβ ab"),                           # exact tie → latin first
        ]
        df = spark.createDataFrame(rows, "doc_id bigint, text string")
        got = {r["doc_id"]: r for r in script_mix_cols(df).collect()}
        assert got[1]["main_script"] == "latin" and got[1]["main_share"] == 1.0
        assert got[2]["main_script"] == "cyrillic"
        assert got[2]["n_cyrillic"] == 9 and got[2]["n_latin"] == 5
        assert got[3]["main_script"] == "cjk" and got[3]["n_cjk"] == 7
        assert got[4]["main_script"] == "none"
        assert got[4]["n_scripted"] == 0 and got[4]["main_share"] is None
        # tie: 2 greek vs 2 latin → SCRIPT_CLASSES order wins (latin)
        assert got[5]["main_script"] == "latin" and got[5]["main_share"] == 0.5


class TestDehyphenate:
    def test_join_keep_and_count(self, spark):
        from mindocr_spark.functions.text import dehyphenate_cols

        rows = [
            (1, "an exam-\nple of hyphena-\ntion"),
            (2, "the Well-\nKnown ISO-\n9001 standard"),
            (3, "spaced wrap- \n here"),
            (4, "no artifacts at all"),
            (5, "a real mid-sentence hyphen-word stays"),
        ]
        df = spark.createDataFrame(rows, "doc_id bigint, text string")
        got = {r["doc_id"]: r for r in dehyphenate_cols(df).collect()}
        assert got[1]["text"] == "an example of hyphenation"
        assert got[1]["n_dehyphenated"] == 2
        # compound/acronym wraps KEEP the hyphen, newline collapsed
        assert got[2]["text"] == "the Well-Known ISO-9001 standard"
        assert got[2]["n_dehyphenated"] == 0
        assert got[3]["text"] == "spaced wraphere"
        assert got[3]["n_dehyphenated"] == 1
        assert got[4]["text"] == rows[3][1] and got[4]["n_dehyphenated"] == 0
        # in-line hyphens (no newline) are never touched
        assert got[5]["text"] == rows[4][1]


class TestGroupedSplit:
    def test_leakage_safety_one_group_one_split(self, spark):
        from mindocr_spark.functions.text import grouped_split

        rows = [(i, f"dom{i % 17}.example") for i in range(200)]
        df = spark.createDataFrame(rows, "doc_id bigint, dom string")
        out = grouped_split(df, "dom").collect()
        by_dom = {}
        for r in out:
            by_dom.setdefault(r["dom"], set()).add(r["split"])
        # EVERY domain lands in exactly one split — the leakage property
        assert all(len(s) == 1 for s in by_dom.values())
        assert set().union(*by_dom.values()) <= {"train", "val", "test"}

    def test_deterministic_and_null_to_last(self, spark):
        from mindocr_spark.functions.text import grouped_split

        df = spark.createDataFrame(
            [(1, "a.example"), (2, None)], "doc_id bigint, dom string"
        )
        a = {r["doc_id"]: r["split"] for r in grouped_split(df, "dom").collect()}
        b = {r["doc_id"]: r["split"] for r in grouped_split(df, "dom").collect()}
        assert a == b                      # RNG-free, rerun-identical
        assert a[2] == "test"              # NULL group → last split, never eval leakage into train

    def test_fractions_roughly_honored(self, spark):
        from mindocr_spark.functions.text import grouped_split

        df = spark.createDataFrame(
            [(i, f"d{i}.example") for i in range(2000)],
            "doc_id bigint, dom string",
        )
        counts = {r["split"]: r["count"] for r in
                  grouped_split(df, "dom").groupBy("split").count().collect()}
        assert counts["train"] > 1800      # ≈ 0.98 of 2000
        assert 0 < counts.get("val", 0) < 100
        assert 0 < counts.get("test", 0) < 100


class TestOovCols:
    def test_golden_counts(self, spark):
        from mindocr_spark.functions.text import oov_cols

        rows = [
            (1, "aa aa aa bb"),      # aa×3 bb×1
            (2, "aa bb cc"),         # cc is rare
            (3, "cc dd"),            # dd rarest
            (4, ""),                 # zero tokens, must not vanish
        ]
        df = spark.createDataFrame(rows, "doc_id bigint, text string")
        # vocab_size=2 → vocab = {aa(4), bb(2)}; cc(2) ties bb but
        # 'bb' < 'cc' wins the ascending tie-break
        got = {r["doc_id"]: r for r in oov_cols(df, vocab_size=2).collect()}
        assert (got[1]["n_tokens"], got[1]["n_oov"]) == (4, 0)
        assert (got[2]["n_tokens"], got[2]["n_oov"]) == (3, 1)
        assert (got[3]["n_tokens"], got[3]["n_oov"]) == (2, 2)
        assert got[3]["oov_rate"] == 1.0
        assert (got[4]["n_tokens"], got[4]["n_oov"]) == (0, 0)
        assert got[4]["oov_rate"] is None
        assert set(got) == {1, 2, 3, 4}

    def test_vocab_join_is_broadcast(self, spark):
        from mindocr_spark.functions.text import oov_cols

        df = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        plan = (
            oov_cols(df.select("doc_id", "text"), vocab_size=50)
            ._jdf.queryExecution().executedPlan().toString()
        )
        assert "BroadcastHashJoin" in plan


class TestReadability:
    def test_flesch_golden(self, spark):
        from mindocr_spark.functions.text import readability_cols

        # "The cat sat." — 3 words, 1 sentence, 3 syllable runs
        # (e, a, a): wps=3, spw=1 → flesch = 206.835-1.015*3-84.6*1
        df = _docs(spark, [(1, "The cat sat."),
                           (2, "no terminator here"),
                           (3, ""),
                           (4, None)])
        got = {r["doc_id"]: r for r in readability_cols(df).collect()}
        r1 = got[1]
        assert (r1["n_tokens"], r1["n_sentences"], r1["n_syllables"]) \
            == (3, 1, 3)
        assert r1["flesch"] == round(206.835 - 1.015 * 3.0 - 84.6 * 1.0, 6)
        assert r1["fk_grade"] == round(0.39 * 3.0 + 11.8 * 1.0 - 15.59, 6)
        # unterminated fragment counts as ONE sentence
        assert got[2]["n_sentences"] == 1
        # zero-token docs: zero counts, NULL scores (no evidence)
        for k in (3, 4):
            assert got[k]["n_tokens"] == 0
            assert got[k]["n_sentences"] == 0
            assert got[k]["flesch"] is None
            assert got[k]["fk_grade"] is None

    def test_terminator_runs_count_once(self, spark):
        from mindocr_spark.functions.text import readability_cols

        # "Wow!! Really...": runs "!!" and "..." → 2 sentences
        df = _docs(spark, [(1, "Wow!! Really...")])
        r = readability_cols(df).collect()[0]
        assert r["n_sentences"] == 2
        # syllable runs: o, ea, y → 3
        assert r["n_syllables"] == 3

    def test_scan_only_plan(self, spark):
        from mindocr_spark.functions.text import readability_cols

        df = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        plan = (
            readability_cols(df.select("doc_id", "text"))
            ._jdf.queryExecution().executedPlan().toString()
        )
        assert "Exchange" not in plan
        assert "BatchEvalPython" not in plan


class TestTemperatureMix:
    def test_alpha_half_allocation_golden(self, spark):
        from mindocr_spark.functions.text import temperature_mix

        # en: 16 tokens, fr: 4, de: 1 → sqrt weights 4, 2, 1 (S=7)
        rows = [(1, "en", "w " * 16), (2, "fr", "w " * 4), (3, "de", "w")]
        df = spark.createDataFrame(
            rows, "doc_id bigint, lang string, text string"
        ).select("lang", "text")
        got = {r["lang"]: r for r in
               temperature_mix(df, budget_tokens=7000).collect()}
        assert got["en"]["n_tokens"] == 16
        assert got["en"]["temp_share"] == round(4.0 / 7.0, 6)
        assert got["de"]["temp_share"] == round(1.0 / 7.0, 6)
        # tail language is boosted, head language damped
        assert got["de"]["boost"] > 1.0 > got["en"]["boost"]
        assert got["en"]["alloc_tokens"] == 4000
        assert got["fr"]["alloc_tokens"] == 2000
        assert got["de"]["alloc_tokens"] == 1000

    def test_null_stratum_bucketed_as_und(self, spark):
        from mindocr_spark.functions.text import temperature_mix

        df = spark.createDataFrame(
            [(1, None, "a b"), (2, "en", "a")],
            "doc_id bigint, lang string, text string",
        ).select("lang", "text")
        langs = {r["lang"] for r in temperature_mix(df).collect()}
        assert langs == {"und", "en"}

    def test_shares_sum_to_one(self, spark):
        from mindocr_spark.functions.text import temperature_mix

        df = spark.read.parquet(
            "/root/testdata/sf0.001/documents.parquet"
        ).select("lang", "text")
        rows = temperature_mix(df).collect()
        assert abs(sum(r["temp_share"] for r in rows) - 1.0) < 1e-5
        assert abs(sum(r["raw_share"] for r in rows) - 1.0) < 1e-5
        # total allocation never exceeds the budget (floors round down)
        assert sum(r["alloc_tokens"] for r in rows) <= 100_000


class TestLengthQuantiles:
    def test_interpolation_golden(self, spark):
        from mindocr_spark.functions.text import length_quantiles

        # 5 values per lang: p50 = middle, p90 = (n-1)*0.9 = 3.6 →
        # v[3] + 0.6*(v[4]-v[3])
        rows = [(i, "en", v) for i, v in enumerate([10, 20, 30, 40, 50])]
        df = spark.createDataFrame(
            rows, "doc_id bigint, lang string, n_chars bigint"
        )
        r = length_quantiles(df).collect()[0]
        assert (r["min_len"], r["max_len"], r["n_docs"]) == (10, 50, 5)
        assert r["p50"] == 30.0
        assert r["p90"] == 40 + 0.6 * 10
        assert r["p99"] == 40 + 0.96 * 10

    def test_null_stratum_and_single_row_group(self, spark):
        from mindocr_spark.functions.text import length_quantiles

        df = spark.createDataFrame(
            [(1, None, 7), (2, "en", 3)],
            "doc_id bigint, lang string, n_chars bigint",
        )
        got = {r["lang"]: r for r in length_quantiles(df).collect()}
        assert got["und"]["p50"] == 7.0  # singleton: every quantile = v
        assert got["und"]["p99"] == 7.0
        assert set(got) == {"und", "en"}


class TestZipfFit:
    def test_perfect_zipf_recovers_slope(self, spark):
        from mindocr_spark.functions.lm import zipf_fit

        # construct freq(r) = 2^(10-r) over 8 types → ln f = ln(2^10)
        # − r·ln2; x = ln r is NOT linear in r, so use freq = C/r
        # exactly: freq(r) = 840/r for r in 1..8 gives integer freqs
        words = []
        for r, f in enumerate([840, 420, 280, 210, 168, 140, 120, 105], 1):
            words += [f"w{r:02d}"] * f
        df = spark.createDataFrame(
            [(1, " ".join(words))], "doc_id bigint, text string"
        )
        row = zipf_fit(df, max_rank=100).collect()[0]
        assert row["n_types_fit"] == 8
        # exact power law slope −1: fit recovers it to rounding
        assert abs(row["zipf_slope"] + 1.0) < 1e-4
        # intercept ≈ ln 840
        import math
        assert abs(row["intercept"] - math.log(840)) < 1e-3

    def test_degenerate_corpus_null_fit(self, spark):
        from mindocr_spark.functions.lm import zipf_fit

        df = spark.createDataFrame(
            [(1, "same same same")], "doc_id bigint, text string"
        )
        row = zipf_fit(df).collect()[0]
        assert row["n_types_fit"] == 1
        assert row["zipf_slope"] is None and row["intercept"] is None

    def test_head_selection_is_topk_not_global_sort(self, spark):
        from mindocr_spark.functions.lm import zipf_fit

        df = spark.read.parquet(
            "/root/testdata/sf0.001/documents.parquet"
        ).select("text")
        plan = (
            zipf_fit(df, max_rank=50)._jdf.queryExecution()
            .executedPlan().toString()
        )
        assert "TakeOrderedAndProject" in plan
        assert "BatchEvalPython" not in plan


class TestBpeMergePairs:
    def test_weighted_multiplicity_golden(self, spark):
        from mindocr_spark.functions.text import bpe_merge_pairs

        # "aaa" twice + "ab" once: pairs aa×2 per word occurrence ×2
        # words = 4, ab = 1
        df = spark.createDataFrame(
            [(1, "aaa aaa ab")], "doc_id bigint, text string"
        )
        got = {r["pair"]: r for r in
               bpe_merge_pairs(df, top_k=10).collect()}
        assert got["aa"]["n"] == 4  # multiplicity within word counts
        assert got["ab"]["n"] == 1
        assert got["aa"]["rank"] == 1

    def test_vocab_collapse_before_pairs(self, spark):
        from mindocr_spark.functions.text import bpe_merge_pairs

        # same word repeated 1000× must count via freq weighting, and
        # the head must be TakeOrderedAndProject (no global sort)
        df = spark.createDataFrame(
            [(1, "zq " * 1000)], "doc_id bigint, text string"
        )
        out = bpe_merge_pairs(df, top_k=5)
        r = out.collect()[0]
        assert (r["pair"], r["n"]) == ("zq", 1000)
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "TakeOrderedAndProject" in plan
        assert "BatchEvalPython" not in plan

    def test_single_char_words_contribute_nothing(self, spark):
        from mindocr_spark.functions.text import bpe_merge_pairs

        df = spark.createDataFrame(
            [(1, "a b c d e")], "doc_id bigint, text string"
        )
        assert bpe_merge_pairs(df).count() == 0


class TestTemperatureMixEdges:
    def test_zero_token_stratum_null_boost_no_abort(self, spark):
        from mindocr_spark.functions.text import temperature_mix

        # a language whose docs are all empty/NULL text must report
        # exact zero counts and NULL boost — never a divide-by-zero
        df = spark.createDataFrame(
            [(1, "xx", ""), (2, "xx", None), (3, "en", "a b c")],
            "doc_id bigint, lang string, text string",
        ).select("lang", "text")
        got = {r["lang"]: r for r in temperature_mix(df).collect()}
        assert got["xx"]["n_tokens"] == 0
        assert got["xx"]["boost"] is None
        assert got["xx"]["raw_share"] == 0.0
        assert got["xx"]["temp_share"] == 0.0
        assert got["xx"]["alloc_tokens"] == 0
        assert got["en"]["boost"] is not None


class TestLangVerify:
    """Stopword-profile declared-language audit (lang_verify_cols)."""

    def _run(self, spark, rows):
        from mindocr_spark.functions.text import lang_verify_cols

        df = spark.createDataFrame(
            rows, "doc_id bigint, text string, lang string"
        )
        return {r["doc_id"]: r for r in lang_verify_cols(df).collect()}

    def test_match_mismatch_and_no_evidence(self, spark):
        out = self._run(spark, [
            # genuine en: profile argmax = declared tag
            (1, "this is and of to is was for sure", "en"),
            # declared en but German function words dominate
            (2, "der die und nicht das ist wirklich", "en"),
            # no profile word at all -> NULL verdict, never a guess
            (3, "quark blorp zzz", "fr"),
        ])
        assert out[1]["profile_lang"] == "en" and out[1]["lang_match"] is True
        assert out[2]["profile_lang"] == "de" and out[2]["lang_match"] is False
        assert out[3]["profile_lang"] is None
        assert out[3]["profile_hits"] == 0
        assert out[3]["lang_match"] is None

    def test_shared_stopword_credits_both_but_argmax_wins(self, spark):
        # 'de' is in BOTH es and fr profiles; the fr-only words decide
        out = self._run(spark, [(1, "de le et les dans", "fr")])
        assert out[1]["profile_lang"] == "fr"
        assert out[1]["profile_hits"] == 5  # de+le+et+les+dans
        assert out[1]["lang_match"] is True

    def test_tie_breaks_language_ascending(self, spark):
        # one es hit ('el') vs one fr hit ('le'): tie -> 'es' (asc)
        out = self._run(spark, [(1, "el le", "fr")])
        assert out[1]["profile_lang"] == "es"
        assert out[1]["lang_match"] is False

    def test_case_folding_and_counts(self, spark):
        out = self._run(spark, [(1, "AND and Of OF foo", "en")])
        assert out[1]["profile_hits"] == 4


class TestUnigramDrift:
    """KL(new||old) drift between snapshots (unigram_drift)."""

    def _mk(self, spark, rows):
        return spark.createDataFrame(
            rows, "doc_id bigint, text string, lang string"
        )

    def test_identical_snapshots_zero_drift(self, spark):
        from mindocr_spark.functions.text import unigram_drift

        d = self._mk(spark, [(1, "a b c a", "en"), (2, "x y", "de")])
        out = {r["grp"]: r for r in
               unigram_drift(d, d, group_col="lang").collect()}
        assert out["en"]["kl_drift"] == 0.0
        assert out["de"]["kl_drift"] == 0.0
        assert out["en"]["n_tokens_old"] == out["en"]["n_tokens_new"] == 4
        assert out["en"]["vocab_size"] == 3

    def test_novel_vocabulary_positive_drift(self, spark):
        from mindocr_spark.functions.text import unigram_drift

        old = self._mk(spark, [(1, "a a a b", "en")])
        new = self._mk(spark, [(1, "a a a b zzz zzz", "en")])
        r = unigram_drift(old, new, group_col="lang").collect()[0]
        # union vocab includes zzz; old has 0 of them (smoothed)
        assert r["vocab_size"] == 3
        assert r["kl_drift"] > 0.0

    def test_ungrouped_single_row(self, spark):
        from mindocr_spark.functions.text import unigram_drift

        old = self._mk(spark, [(1, "a b", "en"), (2, "c", "de")])
        new = self._mk(spark, [(1, "a b c d", "fr")])
        rows = unigram_drift(old, new).collect()
        assert len(rows) == 1 and rows[0]["grp"] == "all"


def test_unigram_drift_null_stratum_monitored_as_und(spark):
    """Docs with a NULL group tag form their own 'und' stratum — the
    missing-metadata flood is exactly what the monitor must see."""
    from mindocr_spark.functions.text import unigram_drift

    old = spark.createDataFrame(
        [(1, "a b", None), (2, "x", "en")],
        "doc_id bigint, text string, lang string",
    )
    new = spark.createDataFrame(
        [(1, "a b spamword spamword", None), (2, "x", "en")],
        "doc_id bigint, text string, lang string",
    )
    out = {r["grp"]: r for r in
           unigram_drift(old, new, group_col="lang").collect()}
    assert "und" in out
    assert out["und"]["kl_drift"] > 0.0
    assert out["en"]["kl_drift"] == 0.0


def test_token_fertility_exact_ratios_and_und_bucket(spark):
    from mindocr_spark.functions.text import token_fertility

    df = spark.createDataFrame(
        [
            # en: words "abcd"(1 tok) + "abcdefgh"(2 toks) = 2 words,
            # 3 bpe tokens; chars norm = 13
            (1, "abcd abcdefgh", "en"),
            # NULL lang -> 'und'; digits price per char: 3 tokens
            (2, "abc 123", None),
        ],
        "doc_id bigint, text string, lang string",
    )
    out = {r["lang"]: r for r in token_fertility(df).collect()}
    en = out["en"]
    assert en["n_words"] == 2 and en["n_bpe_tokens"] == 3
    assert en["n_chars"] == 13
    assert en["fertility"] == 1.5
    und = out["und"]
    assert und["n_words"] == 1
    assert und["n_bpe_tokens"] == 1 + 3  # ceil(3/4)=1 word tok + 3 digits
    assert und["fertility"] == 4.0


def test_weighted_sample_deterministic_and_weight_biased(spark):
    """Same (seed, ids) → identical draw; across many seeds, a row
    with 9× the weight is drawn ~proportionally more often."""
    from mindocr_spark.functions.text import weighted_sample

    rows = [(i, 900 if i < 10 else 100) for i in range(100)]
    df = spark.createDataFrame(rows, "doc_id bigint, n_chars bigint")
    a = [r.doc_id for r in weighted_sample(df, k=20, seed=3).collect()]
    b = [r.doc_id for r in weighted_sample(df, k=20, seed=3).collect()]
    assert sorted(a) == sorted(b)
    heavy_hits = 0
    for seed in range(12):
        got = {r.doc_id
               for r in weighted_sample(df, k=20, seed=seed).collect()}
        heavy_hits += sum(1 for d in got if d < 10)
    # heavy rows are 10% of the corpus but 50% of the total weight;
    # with k=20 of 100 they saturate toward ~always-in
    assert heavy_hits / (12 * 10) > 0.5


def test_weighted_sample_drops_weightless_rows(spark):
    from mindocr_spark.functions.text import weighted_sample

    df = spark.createDataFrame(
        [(1, 10), (2, 0), (3, -5), (4, None), (None, 10)],
        "doc_id bigint, n_chars bigint",
    )
    got = {r.doc_id for r in weighted_sample(df, k=10).collect()}
    assert got == {1}


def test_weighted_sample_k_guardrail_and_topk_plan(spark):
    import pytest as _pytest

    from mindocr_spark.functions.text import weighted_sample

    df = spark.createDataFrame([(1, 10)], "doc_id bigint, n_chars bigint")
    with _pytest.raises(ValueError):
        weighted_sample(df, k=0)
    plan = (weighted_sample(df, k=5)
            ._jdf.queryExecution().executedPlan().toString())
    assert "TakeOrderedAndProject" in plan


class TestLicenseFlags:
    def test_priority_most_specific_wins(self, spark):
        """A CC BY-SA footer literally contains 'cc by' — the priority
        chain must resolve the SPECIFIC class, and each family maps to
        its slot."""
        from mindocr_spark.functions.text import license_flags

        rows = [
            (0, "x Creative Commons Attribution 4.0"),
            (1, "x released into the public domain"),
            (2, "x CC BY-SA 4.0"),
            (3, "x CC BY-NC"),
            (4, "x under the MIT License"),
            (5, "x Apache License 2.0"),
            (6, "x GNU General Public License"),
            (7, "x All Rights Reserved"),
            (8, "x no markers here"),
        ]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        out = {r["doc_id"]: r for r in license_flags(df).collect()}
        want = ["cc_by", "cc0", "cc_by_sa", "cc_by_nc", "mit",
                "apache", "gpl", "arr", "none"]
        assert [out[i]["license"] for i in range(9)] == want
        assert [out[i]["permissive"] for i in range(9)] == [
            True, True, True, False, True, True, False, False, False]

    def test_case_insensitive_and_flag_style(self, spark):
        """Detection folds case via lower(); rows without markers stay
        (flag-style, no row vanishes)."""
        from mindocr_spark.functions.text import license_flags

        df = spark.createDataFrame(
            [(1, "PUBLIC DOMAIN text"), (2, None)],
            "doc_id long, text string",
        )
        out = {r["doc_id"]: r for r in license_flags(df).collect()}
        assert out[1]["license"] == "cc0"
        assert out[2]["license"] == "none" and not out[2]["permissive"]

    def test_plan_is_scan_only(self, spark):
        from mindocr_spark.functions.text import license_flags

        df = spark.createDataFrame([(1, "t")], "doc_id long, text string")
        plan = license_flags(df)._jdf.queryExecution() \
            .executedPlan().toString()
        assert "Exchange" not in plan and "BatchEvalPython" not in plan


class TestGopherRules:
    """The full Gopher rule filter (Rae et al. 2021, A1.1): one planted
    violation per rule, boundary checks, NULL discipline, and the
    scan-only plan guarantee."""

    def _run(self, spark, rows, **kw):
        from mindocr_spark.functions.text import gopher_rules_cols

        df = spark.createDataFrame(rows, "doc_id bigint, text string")
        return {r["doc_id"]: r for r in gopher_rules_cols(df, **kw).collect()}

    def test_clean_doc_keeps(self, spark):
        # 60 words, mean len 16/5=3.2, 2 required words, all alphabetic.
        text = ("the cat sat with dog " * 12).strip()
        r = self._run(spark, [(1, text)])[1]
        assert r["n_words"] == 60
        assert r["mean_word_len"] == 3.2
        assert r["required_hits"] == 2
        for c in ("pass_word_count", "pass_mean_word_len",
                  "pass_symbol_ratio", "pass_bullet", "pass_ellipsis",
                  "pass_alpha", "pass_required", "keep"):
            assert r[c] is True, c

    def test_each_rule_fails_in_isolation(self, spark):
        base = ("the cat sat with dog " * 12).strip()
        rows = [
            (1, "too short"),                              # word floor
            (2, base + " " + "#" * 1),                     # 1/61 ok
            (3, base + (" #" * 7)),                        # 7/67 > 0.1
            (4, base + "\n• one\n• two\n• three\n• four\n• five\n• six"
                + "\n• seven\n• eight\n• nine\n• ten"),    # 10/11 bullets
            (5, base + "\nfading line..."),                # 1/2 ellipsis
            (6, base + " " + "42 " * 20),                  # alpha 60/80
            (7, ("cat sat dog fox hen " * 12).strip()),    # 0 required
        ]
        out = self._run(spark, rows)
        assert out[1]["pass_word_count"] is False
        assert out[2]["pass_symbol_ratio"] is True
        assert out[3]["pass_symbol_ratio"] is False
        assert out[3]["pass_word_count"] is True
        assert out[4]["pass_bullet"] is False
        assert out[4]["pass_ellipsis"] is True
        assert out[5]["pass_ellipsis"] is False
        assert out[5]["pass_bullet"] is True
        assert out[6]["pass_alpha"] is False
        assert out[6]["alpha_frac"] == 0.75
        assert out[7]["pass_required"] is False
        assert out[7]["pass_alpha"] is True
        for i in (1, 3, 4, 5, 6, 7):
            assert out[i]["keep"] is False, i

    def test_word_count_boundaries(self, spark):
        out = self._run(
            spark,
            [(1, ("the of cat " * 17).strip()),   # 51 words > floor
             (2, ("the of cat " * 16).strip())],  # 48 words < floor
            min_words=50,
        )
        assert out[1]["pass_word_count"] is True
        assert out[2]["pass_word_count"] is False

    def test_required_words_case_folded_and_distinct(self, spark):
        text = ("cat sat dog fox hen " * 12).strip()
        out = self._run(
            spark,
            [(1, text + " The THE the"),      # one DISTINCT required word
             (2, text + " The WITH")])        # two
        assert out[1]["required_hits"] == 1
        assert out[1]["pass_required"] is False
        assert out[2]["required_hits"] == 2
        assert out[2]["pass_required"] is True

    def test_empty_doc_null_discipline(self, spark):
        r = self._run(spark, [(1, "")])[1]
        assert r["n_words"] == 0
        assert r["mean_word_len"] is None
        # token rules fail (no evidence never passes) ...
        assert r["pass_mean_word_len"] is False
        assert r["pass_alpha"] is False
        # ... line rules vacuously pass (they detect badness).
        assert r["pass_bullet"] is True
        assert r["pass_ellipsis"] is True
        assert r["keep"] is False

    def test_scan_only_plan(self, spark):
        from mindocr_spark.functions.text import gopher_rules_cols

        df = spark.createDataFrame([(1, "t")], "doc_id long, text string")
        plan = gopher_rules_cols(df)._jdf.queryExecution() \
            .executedPlan().toString()
        assert "Exchange" not in plan and "BatchEvalPython" not in plan


class TestBpeLearnMerges:
    """Iterative BPE induction vs an independent pure-python Sennrich
    reference, plus the consecutive-run and tie rules."""

    @staticmethod
    def _reference(words: dict[str, int], n_merges: int):
        """Sennrich get_stats/merge loop, list-of-symbols form."""
        vocab = {tuple(w): f for w, f in words.items()}
        out = []
        for step in range(1, n_merges + 1):
            stats: dict[tuple[str, str], int] = {}
            for syms, f in vocab.items():
                for i in range(len(syms) - 1):
                    p = (syms[i], syms[i + 1])
                    stats[p] = stats.get(p, 0) + f
            if not stats:
                break
            best = min(stats.items(), key=lambda kv: (-kv[1], kv[0]))
            (a, b), n = best
            out.append((step, a, b, a + b, n))
            new_vocab = {}
            for syms, f in vocab.items():
                merged, i = [], 0
                while i < len(syms):
                    if (i + 1 < len(syms) and syms[i] == a
                            and syms[i + 1] == b):
                        merged.append(a + b)
                        i += 2
                    else:
                        merged.append(syms[i])
                        i += 1
                new_vocab[tuple(merged)] = f
            vocab = new_vocab
        return out

    def _run(self, spark, text, n_merges):
        from mindocr_spark.functions.text import bpe_learn_merges

        df = spark.createDataFrame([(1, text)],
                                   "doc_id bigint, text string")
        out = bpe_learn_merges(df, n_merges=n_merges)
        return [(r["step"], r["a"], r["b"], r["merged"], r["n"])
                for r in out.orderBy("step").collect()]

    def test_matches_sennrich_reference(self, spark):
        words = {"low": 5, "lower": 2, "newest": 6, "widest": 3}
        text = " ".join(w for w, f in words.items() for _ in range(f))
        got = self._run(spark, text, 6)
        assert got == self._reference(words, 6)

    def test_consecutive_runs_merge_pairwise(self, spark):
        got = self._run(spark, "aaaa", 2)
        # step 1: (a,a) counted at all 3 positions, 'aaaa' -> aa|aa
        assert got[0] == (1, "a", "a", "aa", 3)
        assert got[1] == (2, "aa", "aa", "aaaa", 1)

    def test_tie_breaks_lexicographically(self, spark):
        # 'ba' and 'ab' pairs both appear once; (a,b) sorts first
        got = self._run(spark, "ba ab", 1)
        assert got[0][1:3] == ("a", "b")

    def test_guard(self, spark):
        import pytest as _pytest

        from mindocr_spark.functions.text import bpe_learn_merges

        df = spark.createDataFrame([(1, "x")],
                                   "doc_id bigint, text string")
        with _pytest.raises(ValueError):
            bpe_learn_merges(df, n_merges=0)


class TestBpeSegmentCounts:
    """Replaying a merge table as a tokenizer: exact segmentation
    counts, replay≡learn equivalence, empty-doc rows, guards."""

    def test_exact_counts(self, spark):
        from mindocr_spark.functions.text import bpe_segment_counts

        df = spark.createDataFrame(
            [(1, "low lower ab"), (2, ""), (3, "xyz")],
            "doc_id bigint, text string",
        )
        out = {r["doc_id"]: r for r in
               bpe_segment_counts(df, [("l", "o"), ("lo", "w")]).collect()}
        # low -> 'low' (1), lower -> low,e,r (3), ab -> a,b (2)
        assert out[1]["n_words"] == 3
        assert out[1]["n_bpe_tokens"] == 6
        assert out[1]["bpe_per_word"] == 2.0
        assert out[2]["n_words"] == 0 and out[2]["bpe_per_word"] is None
        assert out[3]["n_bpe_tokens"] == 3  # no merge applies

    def test_replay_equals_learn_state(self, spark):
        from mindocr_spark.functions.text import (
            bpe_learn_merges,
            bpe_segment_counts,
        )

        df = spark.createDataFrame(
            [(1, "low low low lower lowest newest newest widest")],
            "doc_id bigint, text string",
        )
        merges = [(r["a"], r["b"]) for r in
                  bpe_learn_merges(df, n_merges=5).orderBy("step").collect()]
        got = bpe_segment_counts(df, merges).collect()[0]
        # independent replay in python over the final state
        vocab = {"low": 3, "lower": 1, "lowest": 1, "newest": 2,
                 "widest": 1}
        def apply(word):
            syms = list(word)
            for a, b in merges:
                out, i = [], 0
                while i < len(syms):
                    if i + 1 < len(syms) and syms[i] == a and syms[i+1] == b:
                        out.append(a + b); i += 2
                    else:
                        out.append(syms[i]); i += 1
                syms = out
            return len(syms)
        want = sum(apply(w) * f for w, f in vocab.items())
        assert got["n_bpe_tokens"] == want

    def test_guards(self, spark):
        import pytest as _pytest

        from mindocr_spark.functions.text import bpe_segment_counts

        df = spark.createDataFrame([(1, "x")], "doc_id bigint, text string")
        with _pytest.raises(ValueError):
            bpe_segment_counts(df, [])
        with _pytest.raises(ValueError):
            bpe_segment_counts(df, [("a", "")])


# ----------------------------------------------------------------------
# para_lang_segments
# ----------------------------------------------------------------------

def test_para_segments_grain_and_scripts(spark):
    from mindocr_spark.functions.text import para_lang_segments

    docs = spark.createDataFrame(
        [(1, "latin words here\n\nпривет мир\n\n12345 !!!")],
        "doc_id long, text string",
    )
    got = [(r["para_idx"], r["n_chars"], r["main_script"])
           for r in para_lang_segments(docs)
           .orderBy("para_idx").collect()]
    assert got == [
        (0, 16, "latin"),
        (1, 10, "cyrillic"),
        (2, 9, "none"),      # digits/punct: unscripted
    ]


def test_para_segments_tie_breaks_by_class_order(spark):
    from mindocr_spark.functions.text import para_lang_segments

    # 2 latin chars vs 2 cyrillic chars: latin wins (class order)
    docs = spark.createDataFrame(
        [(1, "abпр")], "doc_id long, text string")
    assert para_lang_segments(docs).collect()[0]["main_script"] == "latin"


def test_para_segments_single_and_null(spark):
    from mindocr_spark.functions.text import para_lang_segments

    docs = spark.createDataFrame(
        [(1, "just one paragraph"), (2, None)],
        "doc_id long, text string",
    )
    got = {(r["doc_id"], r["para_idx"]): r["main_script"]
           for r in para_lang_segments(docs).collect()}
    assert got[(1, 0)] == "latin"
    assert got[(2, 0)] == "none"   # NULL text → one empty paragraph


# ----------------------------------------------------------------------
# luhn_cc_cols
# ----------------------------------------------------------------------

def test_luhn_validation_cuts_lookalikes(spark):
    from mindocr_spark.functions.text import luhn_cc_cols

    docs = spark.createDataFrame(
        [(1, "pay 4111-1111-1111-1111 now"),       # classic valid visa
         (2, "order 4111 1111 1111 1112 ref"),     # off-by-one: invalid
         (3, "no digits at all"),
         (4, "two: 4111111111111111 and 1234 5678 9012 3452")],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: (r["n_candidates"], r["n_valid"], r["has_cc_pii"])
           for r in luhn_cc_cols(docs).collect()}
    assert got[1] == (1, 1, True)
    assert got[2] == (1, 0, False)   # regex hit, Luhn cut it
    assert got[3] == (0, 0, False)
    assert got[4] == (2, 2, True)    # 1234...3452 is Luhn-valid too


def test_luhn_null_text(spark):
    from mindocr_spark.functions.text import luhn_cc_cols

    docs = spark.createDataFrame([(1, None)], "doc_id long, text string")
    r = luhn_cc_cols(docs).collect()[0]
    assert (r["n_candidates"], r["has_cc_pii"]) == (0, False)


# ----------------------------------------------------------------------
# homoglyph_cols
# ----------------------------------------------------------------------

def test_homoglyph_flags_mixed_not_foreign(spark):
    from mindocr_spark.functions.text import homoglyph_cols

    docs = spark.createDataFrame(
        [(1, "login to pаypal now"),   # latin+cyrillic а: spoof
         (2, "привет мир plain words"),     # pure foreign tokens: clean
         (3, "all latin words here"),
         (4, "greek αlpha mix"),       # latin l-p-h-a + greek α
         ],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: (r["n_mixed"], r["spoof"])
           for r in homoglyph_cols(docs).collect()}
    assert got[1] == (1, True)
    assert got[2] == (0, False)
    assert got[3] == (0, False)
    assert got[4] == (1, True)


class TestSStemmer:
    def test_rule_goldens(self, spark):
        from mindocr_spark.functions.text import s_stem_col

        words = ["ponies", "cities", "wishes", "goes", "bus", "class",
                 "cats", "tree", "eies", "aies"]
        df = spark.createDataFrame([(w,) for w in words], "w string")
        out = {r["w"]: r["s"]
               for r in df.select("w", s_stem_col("w").alias("s")).collect()}
        assert out["ponies"] == "pony"
        assert out["cities"] == "city"
        # rule 2 drops only the s (Harman keeps the e)
        assert out["wishes"] == "wishe"
        # 'oes' blocks rule 2; the literal else-if chain falls through
        # to rule 3 (documented behavior, identical in the SQL twin)
        assert out["goes"] == "goe"
        assert out["bus"] == "bus" and out["class"] == "class"
        assert out["cats"] == "cat"
        assert out["tree"] == "tree"
        # rule-1 exceptions fall through to rule 2 (ends 'es', no
        # exception matches) — they are shielded from ies→y only
        assert out["eies"] == "eie" and out["aies"] == "aie"

    def test_sql_twin_renders_from_same_rules(self):
        import duckdb

        from mindocr_spark.functions.text import s_stem_sql

        rows = duckdb.sql(
            "SELECT w, " + s_stem_sql("w") + " AS s FROM (VALUES "
            "('ponies'), ('wishes'), ('goes'), ('bus'), ('cats')) t(w)"
        ).fetchall()
        assert dict(rows) == {"ponies": "pony", "wishes": "wishe",
                              "goes": "goe", "bus": "bus", "cats": "cat"}

    def test_stem_stats_golden_and_und_bucket(self, spark):
        from mindocr_spark.functions.text import stem_stats

        df = spark.createDataFrame(
            [("cats cat Cats", "en"), ("ponies pony", "en"),
             ("xyz", None)],
            "text string, lang string",
        )
        out = {r["lang"]: r for r in stem_stats(df).collect()}
        en = out["en"]
        # tokens: cats cat cats ponies pony (lowered); types {cats,
        # cat, ponies, pony}; stems {cat, pony}
        assert (en["n_tokens"], en["n_types"], en["n_stems"]) == (5, 4, 2)
        assert en["reduction"] == 0.5
        assert out["und"]["n_tokens"] == 1

    def test_bare_suffix_tokens_never_stem_to_empty(self, spark):
        import duckdb

        from mindocr_spark.functions.text import s_stem_col, s_stem_sql

        words = ["s", "es", "ies", "as"]
        df = spark.createDataFrame([(w,) for w in words], "w string")
        out = {r["w"]: r["s"]
               for r in df.select("w", s_stem_col("w").alias("s")).collect()}
        # a rule requires the word to be LONGER than its suffix, so a
        # shorter rule may still fire on the fall-through — but NO
        # token can ever stem to the empty string
        assert out["s"] == "s"          # no rule fires
        assert out["es"] == "e"         # rule 2 blocked, rule 3 fires
        assert out["ies"] == "ie"       # rule 1 blocked, rule 2 fires
        assert out["as"] == "a"
        assert all(v != "" for v in out.values())
        rows = duckdb.sql(
            "SELECT w, " + s_stem_sql("w") + " AS s FROM (VALUES "
            "('s'), ('es'), ('ies'), ('as')) t(w)").fetchall()
        assert dict(rows) == out


class TestSymspellCorrections:
    def _run(self, spark, toks, **kw):
        from mindocr_spark.functions.text import symspell_corrections

        df = spark.createDataFrame([(t,) for t in toks], "token string")
        return {
            r["token"]: (r["correction"], r["correction_cnt"])
            for r in symspell_corrections(df, **kw).collect()
        }

    def test_all_three_edit_kinds_correct(self, spark):
        toks = ["hello"] * 50 + ["helo"] * 2       # deletion
        toks += ["world"] * 30 + ["worlds"] * 1    # insertion
        toks += ["crawl"] * 40 + ["crawk"] * 3     # substitution
        out = self._run(spark, toks)
        assert out == {
            "helo": ("hello", 50),
            "worlds": ("world", 30),
            "crawk": ("crawl", 40),
        }

    def test_dominance_ratio_gates(self, spark):
        # 9x is not 10x: no correction
        out = self._run(spark, ["hello"] * 18 + ["helo"] * 2)
        assert out == {}
        out = self._run(spark, ["hello"] * 20 + ["helo"] * 2)
        assert out == {"helo": ("hello", 20)}

    def test_distance_two_neighbors_share_key_but_rejected(self, spark):
        # abcd/acbd share deletion key 'abd' yet levenshtein == 2
        out = self._run(spark, ["abcd"] * 50 + ["acbd"] * 1)
        assert out == {}

    def test_best_candidate_by_count_then_name(self, spark):
        toks = ["tost"] * 1 + ["test"] * 40 + ["toast"] * 40
        out = self._run(spark, toks)
        # tie on count -> lexicographically smaller candidate wins
        assert out["tost"] == ("test", 40)

    def test_hot_bucket_cap_drops_neighborhood(self, spark):
        # key 'hello' is shared by 3 tokens (identity + 2 deletions)
        toks = ["hello"] * 50 + ["hellos"] * 1 + ["xhello"] * 1
        assert self._run(spark, toks) == {
            "hellos": ("hello", 50),
            "xhello": ("hello", 50),
        }
        assert self._run(spark, toks, max_bucket=2) == {}

    def test_length_window_excludes_tokens(self, spark):
        # 'cat'/'cot' are below min_len=4: never considered
        out = self._run(spark, ["cat"] * 50 + ["cot"] * 1)
        assert out == {}

    def test_param_guards(self, spark):
        import pytest as _pytest

        from mindocr_spark.functions.text import symspell_corrections

        df = spark.createDataFrame([("abcd",)], "token string")
        for kw in (
            {"min_len": 1},
            {"min_len": 9, "max_len": 4},
            {"freq_ratio": 0},
            {"max_bucket": 1},
        ):
            with _pytest.raises(ValueError):
                symspell_corrections(df, **kw)


class TestBleuCorpus:
    def _run(self, spark, rows, **kw):
        from mindocr_spark.functions.text import bleu_corpus

        df = spark.createDataFrame(
            rows, "doc_id long, ref string, hyp string"
        )
        return bleu_corpus(df, "ref", "hyp", **kw).collect()[0].asDict()

    def test_identical_corpus_scores_one(self, spark):
        out = self._run(spark, [(1, "a b c d e", "a b c d e")])
        assert out["bleu"] == 1.0
        assert out["brevity_penalty"] == 1.0
        for n in range(1, 5):
            assert out[f"p{n}"] == 1.0

    def test_hand_computed_clipping_and_bp(self, spark):
        import math

        # ref 6 toks, hyp drops one 'the' -> hyp_len 5 < ref_len 6
        out = self._run(
            spark, [(1, "the cat sat on the mat", "the cat sat on mat")]
        )
        assert (out["m1"], out["t1"]) == (5, 5)
        assert (out["m2"], out["t2"]) == (3, 4)  # 'on mat' not in ref
        assert (out["m3"], out["t3"]) == (2, 3)
        assert (out["m4"], out["t4"]) == (1, 2)
        bp = round(math.exp(1 - 6 / 5), 9)
        assert out["brevity_penalty"] == bp
        logs = sum(
            round(math.log(m / t), 9)
            for m, t in [(5, 5), (3, 4), (2, 3), (1, 2)]
        )
        assert abs(out["bleu"] - bp * round(math.exp(logs / 4), 9)) < 1e-12

    def test_clipping_caps_repeated_hyp_tokens(self, spark):
        # hyp repeats 'the' 4x but ref has it twice -> clipped to 2
        out = self._run(
            spark, [(1, "the cat the mat", "the the the the")]
        )
        assert (out["m1"], out["t1"]) == (2, 4)

    def test_zero_match_order_zeroes_bleu(self, spark):
        out = self._run(spark, [(1, "a b", "a c")])  # no 2-gram match
        assert out["bleu"] == 0.0
        assert out["m2"] == 0

    def test_empty_hypothesis(self, spark):
        out = self._run(spark, [(1, "a b c", "")])
        assert out["hyp_len"] == 0
        assert out["bleu"] == 0.0
        assert out["brevity_penalty"] is None

    def test_corpus_level_not_average_of_docs(self, spark):
        # matches/totals pool across docs before dividing
        rows = [(1, "a b c d", "a b c d"), (2, "e f g h", "x y z w")]
        out = self._run(spark, rows)
        assert (out["m1"], out["t1"]) == (4, 8)
        assert out["p1"] == 0.5

    def test_max_n_guard(self, spark):
        import pytest as _pytest

        from mindocr_spark.functions.text import bleu_corpus

        df = spark.createDataFrame([(1, "a", "a")], "doc_id long, ref string, hyp string")
        with _pytest.raises(ValueError):
            bleu_corpus(df, "ref", "hyp", max_n=0)
        with _pytest.raises(ValueError):
            bleu_corpus(df, "ref", "hyp", max_n=9)


class TestTextTile:
    def _run(self, spark, texts, **kw):
        from mindocr_spark.functions.text import texttile_boundaries

        df = spark.createDataFrame(
            [(i, t) for i, t in enumerate(texts)],
            "doc_id bigint, text string",
        )
        return texttile_boundaries(df, **kw).collect()

    def test_planted_topic_shift_is_the_valley(self, spark):
        # 8 tiles of 8 chars: tiles 0..3 repeat "aa " vocab, tiles 4..7
        # repeat "zz " — the only lexical valley is gap 4 (A-block
        # {2,3} vs B-block {4,5} share NOTHING)
        text = "aa aa a " * 4 + "zz zz z " * 4
        rows = {r["gap"]: r for r in self._run(spark, [text])}
        assert set(rows) == {2, 3, 4, 5, 6}
        assert rows[4]["dot"] == 0 and rows[4]["is_boundary"]
        for g in (2, 3, 5, 6):
            assert not rows[g]["is_boundary"]
        # evidence columns are exact: blocks of two "aa aa a " tiles
        # have tf(aa)=4, tf(a)=2 -> na = 16 + 4 = 20
        assert rows[2]["na"] == 20 and rows[2]["nb"] == 20
        assert rows[2]["dot"] == 20

    def test_uniform_doc_has_no_boundary(self, spark):
        rows = self._run(spark, ["tok tok t " * 8])
        assert not any(r["is_boundary"] for r in rows)

    def test_empty_and_tiny_docs_dont_crash(self, spark):
        rows = self._run(spark, ["", "ab", "one two three"])
        # every doc still emits its 5 gap rows, all non-boundary
        assert len(rows) == 15
        assert not any(r["is_boundary"] for r in rows)

    def test_guard(self, spark):
        import pytest as _pytest

        with _pytest.raises(ValueError):
            self._run(spark, ["x"], k_tiles=4, w=2)


class TestWordPiece:
    def _run(self, spark, texts, **kw):
        from mindocr_spark.functions.text import wordpiece_apply

        df = spark.createDataFrame(
            [(i, t) for i, t in enumerate(texts)],
            "doc_id bigint, text string",
        )
        return {r["word"]: (r["n_pieces"], r["pieces"])
                for r in wordpiece_apply(df, **kw).collect()}

    def test_greedy_longest_match(self, spark):
        got = self._run(
            spark, ["window table hash"],
            initial=("w", "wi", "wind", "t", "ta", "h", "ha", "a",
                     "b", "l", "e", "n", "d", "o", "s"),
            cont=("a", "b", "l", "e", "n", "d", "o", "w", "s", "h",
                  "ow", "ble", "sh"),
        )
        assert got["window"] == (2, "wind ##ow")      # wind > wi > w
        assert got["table"] == (2, "ta ##ble")
        assert got["hash"] == (2, "ha ##sh")

    def test_single_char_fallback_and_word_grain(self, spark):
        got = self._run(spark, ["zq zq zq"],
                        initial=("z", "q"), cont=("q",))
        # distinct-word grain: one row despite three occurrences
        assert got == {"zq": (2, "z ##q")}

    def test_stranded_cursor_raises(self, spark):
        import pytest as _pytest

        with _pytest.raises(ValueError):
            self._run(spark, ["abc"], initial=("a",), cont=("b",))


class TestWordPieceBound:
    def test_word_of_exactly_max_iters_pieces_is_collected(self, spark):
        """Review regression: a word consuming its final piece in round
        max_iters must be collected, not rejected."""
        from mindocr_spark.functions.text import wordpiece_apply

        df = spark.createDataFrame([(1, "abcd")],
                                   "doc_id bigint, text string")
        got = {r["word"]: r["n_pieces"] for r in wordpiece_apply(
            df, initial=("a", "b", "c", "d"),
            cont=("a", "b", "c", "d"), max_iters=4).collect()}
        assert got == {"abcd": 4}
        import pytest as _pytest

        with _pytest.raises(ValueError):
            wordpiece_apply(df, initial=("a", "b", "c", "d"),
                            cont=("a", "b", "c", "d"),
                            max_iters=3).collect()

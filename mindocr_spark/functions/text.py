"""text — language-ID, quality scoring, token stats, fingerprinting.

The training-data-pipeline operators a 100 TB corpus needs around the
extraction core. All expressions are JVM-side built-ins so they run
inside whole-stage codegen on the scan (no Python, no shuffle); each has
an exact ANSI-SQL equivalent used by the DuckDB correctness oracle.

Reference lineage: the cls stage (language/orientation tagging,
reference: mindocr/postprocess/cls_postprocess.py:15-27) → :func:`lang_id_col`;
the rec metrics (exact-match + normalized Levenshtein, reference:
mindocr/metrics/rec_metrics.py:11-152) → :func:`rec_metrics`;
the per-doc validity filters (reference: mindocr/data/det_dataset.py:137-138,
rec_lmdb_dataset.py:106-119) → :func:`quality_cols` + downstream filter.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import Column, DataFrame, Window, functions as F

from mindocr_spark.cache import tracked_persist

# --------------------------------------------------------------------------
# Normalization (the SQL twin of extract_core.normalize_ws for ASCII text)
# --------------------------------------------------------------------------


#: Explicit ASCII whitespace class — Java's \s includes \x0B but RE2's
#: (DuckDB's) does not; spelling the class out keeps every
#: normalize-derived oracle engine-identical.
WS_CLASS = r"[ \t\n\r\f\x0B]+"


def normalize_col(c: Column | str) -> Column:
    """Whitespace-collapse + trim — `extract_core.normalize_ws` for
    SQL-reachable columns (explicit char class; engine-identical)."""
    return F.trim(
        F.regexp_replace(F.col(c) if isinstance(c, str) else c, WS_CLASS, " ")
    )


# --------------------------------------------------------------------------
# Token stats
# --------------------------------------------------------------------------


def tokens_col(c: Column | str) -> Column:
    """Whitespace tokenization → array<string> (empty array for blank text)."""
    norm = normalize_col(c)
    return F.when(norm == "", F.array().cast("array<string>")).otherwise(
        F.split(norm, " ")
    )


def token_stats(df: DataFrame, text_col: str = "text",
                id_col: str = "doc_id") -> DataFrame:
    """Per-doc token counts: n_tokens, n_distinct_tokens, n_chars_norm."""
    toks = tokens_col(text_col)
    return df.select(
        id_col,
        F.size(toks).alias("n_tokens"),
        F.size(F.array_distinct(toks)).alias("n_distinct_tokens"),
        F.length(normalize_col(text_col)).alias("n_chars_norm"),
    )


# --------------------------------------------------------------------------
# Quality scoring (length / punctuation / stopword / case ratios)
# --------------------------------------------------------------------------

#: Tiny pinned English stopword marker set for the quality ratio — chosen
#: so the same regex runs identically under Java regex and RE2 (DuckDB).
_STOP_RE = r"\b(the|a|an|and|of|to|in|is|it|for|on|with)\b"
_PUNCT_RE = r"[.,;:!?]"
_UPPER_RE = r"[A-Z]"


def quality_cols(df: DataFrame, text_col: str = "text",
                 id_col: str = "doc_id") -> DataFrame:
    """Per-doc quality features. Counts are exact ints; the two ratios are
    single IEEE divisions of those ints (bit-identical across engines)."""
    toks = tokens_col(text_col)
    n_tokens = F.size(toks)
    stop_hits = F.regexp_count(F.col(text_col), F.lit(_STOP_RE))
    punct = F.regexp_count(F.col(text_col), F.lit(_PUNCT_RE))
    upper = F.regexp_count(F.col(text_col), F.lit(_UPPER_RE))
    avg_tok = F.try_divide(
        F.length(F.array_join(toks, "")).cast("double"), n_tokens.cast("double")
    )
    return df.select(
        id_col,
        n_tokens.alias("n_tokens"),
        stop_hits.alias("stop_hits"),
        punct.alias("n_punct"),
        upper.alias("n_upper"),
        F.round(avg_tok, 6).alias("avg_token_len"),
        F.round(
            F.try_divide(stop_hits.cast("double"), n_tokens.cast("double")), 6
        ).alias("stop_ratio"),
    )


def lexical_diversity_cols(df: DataFrame, text_col: str = "text",
                           id_col: str = "doc_id") -> DataFrame:
    """Lexical-diversity features (the Gopher "fraction of unique
    words" gate family): n_tokens, n_types (distinct tokens), and
    type-token ratio — low TTR is the keyword-stuffing / template-spam
    signature that length and stopword gates miss. Counts are exact
    ints; the ratio is one IEEE division; NULL for zero-token docs (no
    evidence, not 0 diversity). Pure codegen on the scan. The counts
    are :func:`token_stats`'s own columns (one tokenization definition
    in this module), re-aliased to the gate's vocabulary."""
    s = token_stats(df, text_col=text_col, id_col=id_col)
    return s.select(
        id_col,
        "n_tokens",
        F.col("n_distinct_tokens").alias("n_types"),
        F.try_divide(
            F.col("n_distinct_tokens").cast("double"),
            F.col("n_tokens").cast("double"),
        ).alias("ttr"),
    )


def entropy_cols(df: DataFrame, text_col: str = "text",
                 id_col: str = "doc_id") -> DataFrame:
    """Unigram token entropy (the Gopher-family symbol-distribution
    gate): Shannon entropy −Σ p·ln p over the doc's token frequency
    distribution. Near-zero entropy is the keyword-stuffing /
    single-token-spam signature; abnormally high entropy at short
    length flags random-string noise. TTR (``lexical_diversity_cols``)
    only sees SUPPORT (how many types); entropy sees the SHAPE of the
    distribution — "a a a a b" and "a a b b a" have equal TTR but
    different entropy.

    Cross-engine exactness discipline: p = c/n is one IEEE division
    (identical in both engines), each term is p·round(ln p, 9)
    quantized at 12 and summed as DECIMAL (exact, order-independent),
    and only the final value is cast back to double — the
    BM25/PageRank ln-quantization rule. NULL entropy for zero-token
    docs (no evidence, not 0 disorder).

    100 TB shape: row-local higher-order functions over the token
    array — zero shuffles, zero Python, O(types·tokens) per row (docs
    are curation-gate sized; for book-length outliers the explode +
    groupBy(doc, token) shape is the fallback, at the price of a
    shuffle on the doc key).
    """
    with_toks = df.select(id_col, tokens_col(text_col).alias("_toks"))
    toks = F.col("_toks")
    return with_toks.select(
        id_col,
        F.size(toks).alias("n_tokens"),
        F.size(F.array_distinct(toks)).alias("n_types"),
        entropy_expr(toks).alias("token_entropy"),
    )


def entropy_expr(toks: Column) -> Column:
    """The unigram-entropy expression over a PRE-BOUND token-array
    column (NULL for zero-token docs). Callers MUST bind the token
    array with a select/withColumn first — passing ``tokens_col(...)``
    directly would re-evaluate the split per lambda element. Shared by
    :func:`entropy_cols` and the curate entropy-floor gate so the
    verified and production expressions are the same."""
    n = F.size(toks)

    def term(c):
        p = c.cast("double") / n.cast("double")
        return (
            F.round(p * F.round(F.log(p), 9), 12).cast("decimal(28,12)")
        )

    terms = F.transform(
        F.array_distinct(toks),
        lambda t: term(F.size(F.filter(toks, lambda x: x == t))),
    )
    ent = F.aggregate(
        terms,
        F.lit(0).cast("decimal(28,12)"),
        lambda a, x: (a + x).cast("decimal(28,12)"),
    )
    return F.when(n > 0, (-ent).cast("double"))


#: Sentence-terminator runs ("!!", "...") count as ONE boundary; the
#: class is spelled explicitly so Java regex and RE2 (DuckDB) agree.
SENT_TERM_RE = r"[.!?]+"

#: Deterministic syllable heuristic: one syllable per vowel-group run
#: (y counts as a vowel). The classic dictionary-free approximation —
#: exact for the Flesch formula's purpose (a monotone complexity
#: signal), and bit-reproducible across engines, unlike NLP syllabifiers.
SYLLABLE_RE = r"[aeiouy]+"


def readability_cols(df: DataFrame, text_col: str = "text",
                     id_col: str = "doc_id") -> DataFrame:
    """Readability scoring (the pedagogy-tier curation gate: textbook /
    Phi-style pipelines up-weight mid-readability prose and drop both
    keyboard-mash and legalese tails): Flesch reading ease and
    Flesch-Kincaid grade level from exact integer counts —

    - ``n_tokens``     — words (the house whitespace tokenization);
    - ``n_sentences``  — terminator-run count, clamped to ≥1 for any
      non-empty doc (an unterminated fragment is one sentence);
    - ``n_syllables``  — vowel-group runs in the lower-cased text (the
      deterministic dictionary-free heuristic);
    - ``flesch``  = 206.835 − 1.015·(words/sentence) − 84.6·(syllables/word)
    - ``fk_grade`` = 0.39·(words/sentence) + 11.8·(syllables/word) − 15.59

    Both scores are computed in a PINNED association order (left to
    right as written) from two IEEE divisions of exact ints, then
    rounded half-away at 6 — bit-identical across engines (the
    quality_cols discipline). NULL scores for zero-token docs (no
    evidence). NULL text is treated as empty (a gate must emit a
    verdict row).

    100 TB shape: two codegen regexp counts + the token split per row —
    zero shuffles, zero Python, fused into the scan.

    Reference lineage: score-then-threshold filtering of candidate
    regions (reference: mindocr/postprocess/det_db_postprocess.py:93-121,
    `box_thresh` scoring) — this is the corpus-curation analog at doc
    grain.
    """
    txt = F.coalesce(F.col(text_col), F.lit(""))
    norm = normalize_col(txt)
    toks = tokens_col(txt)
    w = F.size(toks)
    term_runs = F.regexp_count(norm, F.lit(SENT_TERM_RE))
    sents = F.when(w > 0, F.greatest(F.lit(1), term_runs)).otherwise(term_runs)
    syl = F.regexp_count(F.lower(norm), F.lit(SYLLABLE_RE))
    wps = F.try_divide(w.cast("double"), sents.cast("double"))
    spw = F.try_divide(syl.cast("double"), w.cast("double"))
    return df.select(
        id_col,
        w.alias("n_tokens"),
        sents.alias("n_sentences"),
        syl.alias("n_syllables"),
        # + 0.0 normalizes IEEE signed zero (both scores cross zero on
        # real corpora; the verify-skill round() divergence rule)
        (F.round(
            F.lit(206.835) - F.lit(1.015) * wps - F.lit(84.6) * spw, 6
        ) + F.lit(0.0)).alias("flesch"),
        (F.round(
            F.lit(0.39) * wps + F.lit(11.8) * spw - F.lit(15.59), 6
        ) + F.lit(0.0)).alias("fk_grade"),
    )


# --------------------------------------------------------------------------
# Code / math content detection (content-type routing signals)
# --------------------------------------------------------------------------

#: Shared Java-regex/RE2 patterns for the code/math signals — every one
#: is rendered verbatim into the SQL oracle, so the dialect agreement is
#: part of what the oracle checks (the blockword/PII discipline).
CODE_FENCE_RE = r"```"
INDENT_LINE_RE = r"^(    |\t)"
CODE_SYMBOL_RE = r"[{};]"
LATEX_RE = r"\\(frac|sum|int|sqrt|begin|end|alpha|cdot)|\$\$"


def code_math_cols(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_fences: int = 2,
    min_indent_frac: float = 0.3,
    min_code_symbols: int = 10,
    min_latex: int = 2,
) -> DataFrame:
    """Code / math content-type signals (the StarCoder/RedPajama-family
    routing gate: prose curation thresholds misfire on code and LaTeX,
    so pipelines detect and route these docs before quality gating):

    - ``n_code_fences``    — markdown fence markers (the explicit signal);
    - ``n_indented_lines`` / ``n_lines`` / ``indent_frac`` — the
      indentation-block signature of pasted code;
    - ``n_code_symbols``   — ``{ } ;`` occurrences (C-family density);
    - ``n_latex``          — LaTeX command / display-math markers;
    - ``is_code`` / ``is_math`` — threshold verdicts (flag-style: no row
      vanishes; the curation funnel decides the routing).

    100 TB shape: pure codegen regex counts + one line-array filter per
    row — zero shuffles, zero Python, fused into the scan. Counts are
    exact ints; ``indent_frac`` is one IEEE division rounded half-away
    at 6 (engine-identical). NULL text is treated as empty (a routing
    gate must emit a verdict for every row — and Spark's ``size(NULL)``
    is -1 outside ANSI mode, which would poison the fraction).
    Reference lineage: the cls stage routes payload variants to
    different downstream handling
    (reference: mindocr/postprocess/cls_postprocess.py:8-32); this is
    the corpus-curation analog of that detect-then-route stage.
    """
    s = _code_math_signals(text_col, min_fences, min_indent_frac,
                           min_code_symbols, min_latex)
    return df.select(
        id_col,
        s["n_code_fences"].alias("n_code_fences"),
        s["n_indented_lines"].alias("n_indented_lines"),
        s["n_lines"].alias("n_lines"),
        s["indent_frac"].alias("indent_frac"),
        s["n_code_symbols"].alias("n_code_symbols"),
        s["n_latex"].alias("n_latex"),
        s["is_code"].alias("is_code"),
        s["is_math"].alias("is_math"),
    )


def _code_math_signals(text_col: str, min_fences: int,
                       min_indent_frac: float, min_code_symbols: int,
                       min_latex: int) -> dict[str, Column]:
    """The code/math signal expressions, shared by
    :func:`code_math_cols` (the oracle-checked surface) and
    :func:`code_math_predicate` (the fused curate gate) — one
    definition, two consumers."""
    t = F.coalesce(F.col(text_col), F.lit(""))
    lines = F.split(t, "\n")
    n_lines = F.size(lines)
    n_indented = F.size(
        F.filter(lines, lambda l: l.rlike(INDENT_LINE_RE))
    )
    indent_frac = F.coalesce(
        F.round(
            F.try_divide(
                n_indented.cast("double"), n_lines.cast("double")
            ),
            6,
        ),
        F.lit(0.0),
    )
    n_fences = F.regexp_count(t, F.lit(CODE_FENCE_RE))
    n_syms = F.regexp_count(t, F.lit(CODE_SYMBOL_RE))
    n_latex = F.regexp_count(t, F.lit(LATEX_RE))
    return {
        "n_code_fences": n_fences,
        "n_indented_lines": n_indented,
        "n_lines": n_lines,
        "indent_frac": indent_frac,
        "n_code_symbols": n_syms,
        "n_latex": n_latex,
        "is_code": (
            (n_fences >= F.lit(min_fences))
            | (indent_frac >= F.lit(min_indent_frac))
            | (n_syms >= F.lit(min_code_symbols))
        ),
        "is_math": n_latex >= F.lit(min_latex),
    }


def code_math_predicate(
    text_col: str = "text",
    min_fences: int = 2,
    min_indent_frac: float = 0.3,
    min_code_symbols: int = 10,
    min_latex: int = 2,
) -> Column:
    """``is_code OR is_math`` as ONE row-local boolean Column, for
    fusing the content-type routing gate directly into a ``where()``
    (no join, no shuffle) — same signals and defaults as
    :func:`code_math_cols`."""
    s = _code_math_signals(text_col, min_fences, min_indent_frac,
                           min_code_symbols, min_latex)
    return s["is_code"] | s["is_math"]


# --------------------------------------------------------------------------
# Repetition quality (Gopher/C4-style curation gates)
# --------------------------------------------------------------------------

#: Symbol class for the symbol-to-word ratio — literal inside a class in
#: both Java regex and RE2 (^ not first, no escapes needed).
_SYMBOL_RE = r"[#$%&*+<=>@^_|~]"


def repetition_line_cols(df: DataFrame, text_col: str = "text",
                         id_col: str = "doc_id") -> DataFrame:
    """Row-local repetition features (NO shuffle — pure codegen
    expressions over the line/token arrays), the Gopher repetition
    signals and C4 line heuristics:

    - ``dup_line_frac``     — fraction of non-empty trimmed lines that
      are repeats of another line in the same doc;
    - ``n_ellipsis_lines``  — lines ending in "..." (the C4 gate);
    - ``symbol_word_ratio`` — symbol chars per whitespace token.

    Exact-int counts + one IEEE division each, round 6 — bit-identical
    to the SQL oracle."""
    lines = F.filter(
        F.transform(F.split(F.col(text_col), "\n"), lambda l: F.trim(l)),
        lambda l: l != "",
    )
    n_lines = F.size(lines)
    n_distinct = F.size(F.array_distinct(lines))
    dup_frac = F.coalesce(
        F.round(
            F.try_divide(
                (n_lines - n_distinct).cast("double"), n_lines.cast("double")
            ),
            6,
        ),
        F.lit(0.0),
    )
    n_tokens = F.size(tokens_col(text_col))
    symbols = F.regexp_count(F.col(text_col), F.lit(_SYMBOL_RE))
    sym_ratio = F.coalesce(
        F.round(
            F.try_divide(symbols.cast("double"), n_tokens.cast("double")), 6
        ),
        F.lit(0.0),
    )
    return df.select(
        *df.columns,
        n_lines.alias("n_lines"),
        dup_frac.alias("dup_line_frac"),
        F.size(F.filter(lines, lambda l: l.endswith("...")))
        .alias("n_ellipsis_lines"),
        sym_ratio.alias("symbol_word_ratio"),
    )


def top_2gram_cols(df: DataFrame, text_col: str = "text",
                   id_col: str = "doc_id") -> DataFrame:
    """The Gopher top-n-gram character-share signal for n=2: the most
    frequent word 2-gram per doc (ties broken lexicographically) and
    the fraction of normalized characters its repeats account for.

    Plan: narrow gram explode → one groupBy on (doc, gram) → per-doc
    top-1 window → broadcast-size join back. The only shuffle is the
    (doc, gram) agg — the same key-partitioned shape as shingle
    generation, linear in corpus size at any scale. Docs with < 2
    tokens get ('', 0, 0.0)."""
    with_toks = df.select(id_col, tokens_col(text_col).alias("_toks"),
                          F.length(normalize_col(text_col)).alias("_nc"))
    toks = F.col("_toks")
    grams_arr = F.when(
        F.size(toks) >= 2,
        F.transform(
            F.sequence(F.lit(1), F.size(toks) - 1),
            lambda i: F.array_join(F.slice(toks, i, 2), " "),
        ),
    ).otherwise(F.array().cast("array<string>"))
    freq = (
        with_toks.select(id_col, F.explode(grams_arr).alias("gram"))
        .groupBy(id_col, "gram")
        .agg(F.count("*").alias("freq"))
    )
    w = Window.partitionBy(id_col).orderBy(
        F.col("freq").desc(), F.col("gram").asc()
    )
    top = (
        freq.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .select(id_col, "gram", "freq")
    )
    share = F.round(
        F.try_divide(
            (F.col("freq") * F.length("gram")).cast("double"),
            F.col("_nc").cast("double"),
        ),
        6,
    )
    return (
        with_toks.select(id_col, "_nc")
        .join(top, id_col, "left")
        .select(
            id_col,
            F.coalesce(F.col("gram"), F.lit("")).alias("top_2gram"),
            F.coalesce(F.col("freq"), F.lit(0)).cast("bigint")
            .alias("top_2gram_freq"),
            F.coalesce(share, F.lit(0.0)).alias("top_2gram_share"),
        )
    )


# --------------------------------------------------------------------------
# Gopher rule filter (Rae et al. 2021, Appendix A1.1 — the full set)
# --------------------------------------------------------------------------

#: Gopher's "required words" — a document must contain at least
#: ``min_required_hits`` DISTINCT members (case-folded) to pass the
#: stop-word rule. The published list, verbatim.
GOPHER_REQUIRED_WORDS: tuple[str, ...] = (
    "the", "be", "to", "of", "and", "that", "have", "with")

#: Gopher's symbol rule counts hash marks and the one-char ellipsis
#: (U+2026). Literal class — Java regex and RE2 agree.
GOPHER_SYMBOL_RE = r"[#…]"


def gopher_rules_cols(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    *,
    min_words: int = 50,
    max_words: int = 100_000,
    min_mean_word_len: float = 3.0,
    max_mean_word_len: float = 10.0,
    max_symbol_ratio: float = 0.1,
    max_bullet_frac: float = 0.9,
    max_ellipsis_frac: float = 0.3,
    min_alpha_frac: float = 0.8,
    min_required_hits: int = 2,
) -> DataFrame:
    """The complete Gopher rule filter (Rae et al. 2021, A1.1), flag
    style: every measure, one boolean per rule, and the composite
    ``keep`` — no row vanishes (dropping is the funnel's policy call,
    the `blockword_flags` contract).

    Rules (published defaults):

    - word count in [50, 100 000];
    - mean word length in [3, 10] chars;
    - symbol-to-word ratio (``#``/``…``) ≤ 0.1;
    - bullet-started line fraction ≤ 0.9;
    - "..."-ended line fraction ≤ 0.3;
    - ≥ 80 % of words contain an alphabetic char;
    - ≥ 2 distinct :data:`GOPHER_REQUIRED_WORDS` present.

    NULL discipline: token-denominated ratios are NULL on empty docs
    and their rules FAIL (no evidence never passes — the
    `gate_attribution` rule); the two line rules vacuously PASS on
    zero lines (they detect badness; an empty doc already fails the
    word-count rule, so ``keep`` cannot leak).

    100 TB shape: pure row-local expressions fused into the scan —
    the line/token arrays never leave the row, zero joins, zero
    shuffles, no Python. The repetition half of Gopher's filter
    (dup-line / top-n-gram share) lives in `repetition_line_cols` /
    `top_2gram_cols`, whose per-doc shuffles this gate deliberately
    avoids.

    Reference analog: the per-sample validity gates that drop
    unusable records before the pipeline proper (reference:
    mindocr/data/det_dataset.py:137-138,
    mindocr/data/rec_lmdb_dataset.py:106-119), lifted to the
    published corpus-quality rule set."""
    toks = tokens_col(text_col)
    n_words = F.size(toks)
    mean_len = F.round(
        F.try_divide(
            F.length(F.array_join(toks, "")).cast("double"),
            n_words.cast("double"),
        ),
        6,
    )
    sym_ratio = F.round(
        F.try_divide(
            F.regexp_count(F.col(text_col), F.lit(GOPHER_SYMBOL_RE))
            .cast("double"),
            n_words.cast("double"),
        ),
        6,
    )
    lines = F.filter(
        F.transform(F.split(F.col(text_col), "\n"), lambda l: F.trim(l)),
        lambda l: l != "",
    )
    n_lines = F.size(lines)
    bullet_frac = F.round(
        F.try_divide(
            F.size(
                F.filter(
                    lines,
                    lambda l: l.startswith("•") | l.startswith("- "),
                )
            ).cast("double"),
            n_lines.cast("double"),
        ),
        6,
    )
    ellipsis_frac = F.round(
        F.try_divide(
            F.size(
                F.filter(
                    lines, lambda l: l.endswith("...") | l.endswith("…")
                )
            ).cast("double"),
            n_lines.cast("double"),
        ),
        6,
    )
    alpha_frac = F.round(
        F.try_divide(
            F.size(F.filter(toks, lambda t: t.rlike("[A-Za-z]")))
            .cast("double"),
            n_words.cast("double"),
        ),
        6,
    )
    low_toks = F.transform(toks, lambda t: F.lower(t))
    required_hits: Column = F.lit(0)
    for w in GOPHER_REQUIRED_WORDS:
        required_hits = required_hits + F.array_contains(
            low_toks, F.lit(w)
        ).cast("int")

    def _fail_null(cond: Column) -> Column:
        return F.coalesce(cond, F.lit(False))

    def _pass_null(cond: Column) -> Column:
        return F.coalesce(cond, F.lit(True))

    out = df.select(
        id_col,
        n_words.cast("bigint").alias("n_words"),
        mean_len.alias("mean_word_len"),
        sym_ratio.alias("symbol_ratio"),
        bullet_frac.alias("bullet_frac"),
        ellipsis_frac.alias("ellipsis_frac"),
        alpha_frac.alias("alpha_frac"),
        required_hits.cast("bigint").alias("required_hits"),
    )
    flags = out.select(
        *out.columns,
        ((F.col("n_words") >= min_words) & (F.col("n_words") <= max_words))
        .alias("pass_word_count"),
        _fail_null(
            (F.col("mean_word_len") >= min_mean_word_len)
            & (F.col("mean_word_len") <= max_mean_word_len)
        ).alias("pass_mean_word_len"),
        _fail_null(F.col("symbol_ratio") <= max_symbol_ratio)
        .alias("pass_symbol_ratio"),
        _pass_null(F.col("bullet_frac") <= max_bullet_frac)
        .alias("pass_bullet"),
        _pass_null(F.col("ellipsis_frac") <= max_ellipsis_frac)
        .alias("pass_ellipsis"),
        _fail_null(F.col("alpha_frac") >= min_alpha_frac)
        .alias("pass_alpha"),
        (F.col("required_hits") >= min_required_hits)
        .alias("pass_required"),
    )
    keep = (
        F.col("pass_word_count")
        & F.col("pass_mean_word_len")
        & F.col("pass_symbol_ratio")
        & F.col("pass_bullet")
        & F.col("pass_ellipsis")
        & F.col("pass_alpha")
        & F.col("pass_required")
    )
    return flags.select(*flags.columns, keep.alias("keep"))


# --------------------------------------------------------------------------
# BPE-ish token estimation (training-budget accounting)
# --------------------------------------------------------------------------

#: Disjoint pretokenizer classes (GPT-2-style, simplified): alpha runs,
#: digit runs, single non-alnum marks. Classes are DISJOINT so
#: alternation order cannot differ between Java regex and RE2 — the
#: engine-parity discipline for shared patterns.
BPE_PRETOKEN_RE = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9 \t\n\r\f\x0B]"

#: Average BPE-vocab token length for alpha runs (GPT-2's empirical
#: ~4 chars/token) — the "BPE-ish" estimate divisor.
BPE_CHARS_PER_TOKEN = 4


def bpe_token_cols(df: DataFrame, text_col: str = "text",
                   id_col: str = "doc_id",
                   keep: tuple[str, ...] = ()) -> DataFrame:
    """Tokenizer-free training-token estimate: pretokenize with the
    disjoint-class regex, then price each unit the way a BPE vocab
    does — alpha runs at ceil(len/4) subtokens, digit runs per char
    (digits rarely merge), punctuation at 1. Exact integer math over
    one codegen `regexp_extract_all` (no shuffle), so the estimate is
    engine-identical — unlike a real tokenizer, which would be a
    Python UDF in the hot path. Returns
    (id, n_words, n_digit_runs, n_punct, n_bpe_tokens).

    This is the token accounting a mixing/budget step wants when the
    final tokenizer is not yet fixed; `token_budget_sample` accepts
    whichever count the caller puts in its text column's stead."""
    units = F.regexp_extract_all(
        F.col(text_col), F.lit(BPE_PRETOKEN_RE), F.lit(0)
    )
    is_alpha = lambda u: u.rlike("^[A-Za-z]")          # noqa: E731
    is_digit = lambda u: u.rlike("^[0-9]")             # noqa: E731
    price = lambda u: (                                 # noqa: E731
        F.when(
            is_alpha(u),
            F.ceil(F.length(u) / F.lit(BPE_CHARS_PER_TOKEN)),
        )
        .when(is_digit(u), F.length(u))
        .otherwise(F.lit(1))
        .cast("bigint")
    )
    return df.select(
        id_col,
        *keep,
        F.size(F.filter(units, is_alpha)).cast("bigint").alias("n_words"),
        F.size(F.filter(units, is_digit)).cast("bigint")
        .alias("n_digit_runs"),
        F.size(
            F.filter(units, lambda u: ~is_alpha(u) & ~is_digit(u))
        ).cast("bigint").alias("n_punct"),
        F.aggregate(
            units, F.lit(0).cast("bigint"), lambda acc, u: acc + price(u)
        ).alias("n_bpe_tokens"),
    )


def token_fertility(
    df: DataFrame,
    text_col: str = "text",
    lang_col: str = "lang",
) -> DataFrame:
    """Tokenizer-fertility audit per language stratum (the standard
    dataset-card table): fertility = estimated BPE tokens per word,
    compression = normalized chars per BPE token. Latin-alphabet
    languages sit near fertility ≈ 1.3; a stratum whose fertility
    spikes is one the tokenizer will shred into bytes (wrong script,
    mojibake, non-language junk) and whose token BUDGET is silently
    mis-priced by word-count accounting. NULL langs bucket as 'und'
    (the engine convention). Returns (lang, n_docs, n_words,
    n_bpe_tokens, n_chars, fertility, chars_per_token).

    100 TB shape: the per-doc estimator is the shared
    :func:`bpe_token_cols` codegen fold (no Python, no shuffle); the
    rollup is ONE groupBy on the bounded language key with map-side
    partial sums. Ratios are single IEEE divisions of exact integer
    sums, rounded at 6."""
    d = df.select(
        F.coalesce(F.col(lang_col), F.lit("und")).alias("_lang"),
        F.length(normalize_col(text_col)).cast("bigint").alias("_nc"),
        F.col(text_col),
    )
    per = bpe_token_cols(d, text_col=text_col, id_col="_lang",
                         keep=("_nc",))
    agg = per.groupBy("_lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_words").alias("n_words"),
        F.sum("n_bpe_tokens").alias("n_bpe_tokens"),
        F.sum("_nc").alias("n_chars"),
    )
    return agg.select(
        F.col("_lang").alias("lang"),
        "n_docs", "n_words", "n_bpe_tokens", "n_chars",
        F.round(
            F.try_divide(
                F.col("n_bpe_tokens").cast("double"),
                F.col("n_words").cast("double"),
            ), 6
        ).alias("fertility"),
        F.round(
            F.try_divide(
                F.col("n_chars").cast("double"),
                F.col("n_bpe_tokens").cast("double"),
            ), 6
        ).alias("chars_per_token"),
    )


# --------------------------------------------------------------------------
# Blockword gate (C4's badwords filter)
# --------------------------------------------------------------------------


def blockword_pattern(words: tuple[str, ...] | list[str]) -> str:
    """Compile a blockword list to the ONE whole-word alternation both
    engines run (Java regex and RE2 agree on ``\\b`` and plain
    alternations; matching on lower(text) instead of ``(?i)`` keeps
    case folding engine-identical). Words are regex-escaped and
    length-sorted so a longer word wins over its own prefix.

    ``\\b`` anchors are attached PER ALTERNATIVE and only at edges
    that are word characters: a ``\\b`` next to a non-word edge (real
    badword lists contain punctuation-edged entries) can never match
    — anchoring it there would make the entry a silent no-op."""
    import re as _re

    toks = sorted({w.lower() for w in words if w}, key=lambda w: (-len(w), w))
    if not toks:
        raise ValueError("empty blockword list")

    def arm(w: str) -> str:
        pre = r"\b" if _re.match(r"\w", w[0]) else ""
        suf = r"\b" if _re.match(r"\w", w[-1]) else ""
        return pre + _re.escape(w) + suf

    return "(" + "|".join(arm(w) for w in toks) + ")"


def blockword_flags(df: DataFrame, words: tuple[str, ...] | list[str],
                    text_col: str = "text",
                    id_col: str = "doc_id") -> DataFrame:
    """C4-style badwords gate, flag-style: (id, n_blockword_hits,
    has_blockword). The list compiles to one whole-stage-codegen regex
    count on the scan — zero joins, zero shuffles, no row vanishes
    (dropping is the caller's policy decision).

    100 TB note: a regex alternation is the right shape up to a few
    thousand words (C4's list is ~450); for vocabulary-scale lists
    switch to the broadcast token semi-join (`lm.unigram_logppl`'s
    join shape) — the gate's OUTPUT contract stays identical.

    Reference analog: the label charset filter that drops samples
    containing out-of-dictionary characters (reference:
    mindocr/data/rec_lmdb_dataset.py:106-119) — a membership test
    against a pinned list deciding keep/drop."""
    pat = blockword_pattern(words)
    hits = F.regexp_count(F.lower(F.col(text_col)), F.lit(pat))
    return df.select(
        id_col,
        hits.cast("bigint").alias("n_blockword_hits"),
        (hits > 0).alias("has_blockword"),
    )


# --------------------------------------------------------------------------
# License detection (rights-aware curation gate)
# --------------------------------------------------------------------------

#: License-marker patterns matched against lower(text), priority order:
#: most-specific first, so a CC BY-SA footer (which literally contains
#: "cc by") resolves to cc_by_sa, not cc_by. Plain alternations + \b
#: only — Java regex (Spark codegen) and RE2 (DuckDB) agree; rendered
#: verbatim into the SQL oracle (the blockword dialect discipline).
LICENSE_CLASSES: tuple[tuple[str, str], ...] = (
    ("cc0", r"(creative commons zero|\bcc0\b|public domain)"),
    ("cc_by_sa", r"(\bcc[ -]by[ -]sa\b|attribution[- ]sharealike)"),
    ("cc_by_nc", r"(\bcc[ -]by[ -]nc\b|attribution[- ]noncommercial)"),
    ("cc_by", r"(\bcc[ -]by\b|creative commons attribution)"),
    ("mit", r"\bmit license\b"),
    ("apache", r"apache license"),
    ("gpl", r"(gnu general public license|\bgplv?[23]?\b)"),
    ("arr", r"all rights reserved"),
)

#: Classes a rights-clean training corpus may keep (The Stack's
#: permissive-license gate, FineWeb's terms-of-use posture): public
#: domain and attribution-style grants. NC (no commercial use) and
#: all-rights-reserved are out; GPL is out under the conservative
#: reading that model weights cannot honor share-alike.
PERMISSIVE_LICENSES = frozenset({"cc0", "cc_by", "cc_by_sa", "mit",
                                 "apache"})


def license_flags(df: DataFrame, text_col: str = "text",
                  id_col: str = "doc_id") -> DataFrame:
    """Rights-aware curation gate: (id, license, permissive) where
    ``license`` is the FIRST :data:`LICENSE_CLASSES` marker present in
    lower(text) (priority = specificity, ``none`` when no marker) and
    ``permissive`` applies :data:`PERMISSIVE_LICENSES`. Flag-style —
    no row vanishes; dropping is the funnel's policy decision.

    100 TB shape: one whole-stage-codegen CASE chain of rlikes fused
    into the scan — zero joins, zero shuffles, no Python. Detection is
    textual (footers/boilerplate), the standard crawl-side signal when
    no structured rights metadata survives extraction; pages carrying
    rel="license" markup should prefer the structured tap
    (`links.page_metadata`'s discipline) and fall back here.

    Reference analog: the charset membership filter deciding keep/drop
    per sample (reference: mindocr/data/rec_lmdb_dataset.py:106-119),
    lifted to rights class."""
    low = F.lower(F.col(text_col))
    cls: Column = F.lit("none")
    for name, pat in reversed(LICENSE_CLASSES):
        cls = F.when(low.rlike(pat), F.lit(name)).otherwise(cls)
    return df.select(
        id_col,
        cls.alias("license"),
        cls.isin(*sorted(PERMISSIVE_LICENSES)).alias("permissive"),
    )


# --------------------------------------------------------------------------
# PII redaction (curation-stage scrubbing)
# --------------------------------------------------------------------------

#: Portable patterns — plain classes/quantifiers only, no lookaround or
#: backrefs, so Java regex (Spark, whole-stage codegen) and RE2 (DuckDB
#: oracle) match identically. Conservative by design: the phone pattern
#: requires an international +CC prefix so running digit strings in
#: ordinary prose are never mangled.
_EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
_IPV4_RE = r"\b[0-9]{1,3}(\.[0-9]{1,3}){3}\b"
_PHONE_RE = r"\+[0-9]{1,3}( [0-9]{1,4}){2,6}"


def redact_pii_cols(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Scrub emails / IPv4 addresses / international phone numbers to
    sentinel tokens (``<EMAIL>``, ``<IP>``, ``<PHONE>``) — the standard
    pre-release curation stage of an LLM training corpus. Rewrites
    `text_col` in place and appends exact pre-redaction counts
    (n_emails, n_ips, n_phones) so downstream gates can drop
    PII-saturated docs instead of shipping them scrubbed.

    Entirely JVM-side regexp expressions fused into the scan's narrow
    stage — zero shuffles, zero Python. Redaction order is email → IP →
    phone; counts are taken on the ORIGINAL text."""
    t = F.col(text_col)
    red = F.regexp_replace(t, _EMAIL_RE, "<EMAIL>")
    red = F.regexp_replace(red, _IPV4_RE, "<IP>")
    red = F.regexp_replace(red, _PHONE_RE, "<PHONE>")
    return (
        df.withColumn("n_emails", F.regexp_count(t, F.lit(_EMAIL_RE)))
        .withColumn("n_ips", F.regexp_count(t, F.lit(_IPV4_RE)))
        .withColumn("n_phones", F.regexp_count(t, F.lit(_PHONE_RE)))
        .withColumn(text_col, red)
    )


# --------------------------------------------------------------------------
# Unicode normalization (curation-stage text fixing)
# --------------------------------------------------------------------------


def unicode_normalize_cols(df: DataFrame, text_col: str = "text",
                           form: str = "NFC") -> DataFrame:
    """Normalize `text_col` to a canonical Unicode form (default NFC) —
    the standard C4/CCNet text-fixing stage. Crawled pages mix
    composed and decomposed encodings of the same glyph ("é" as U+00E9
    vs "e"+U+0301); without canonicalization, byte-level fingerprints
    treat them as different documents and exact dedup silently
    under-collapses. Rewrites `text_col` in place and appends a
    `was_normalized` flag (the doc's bytes changed).

    Spark has no built-in Unicode-normalize expression, so this is the
    one sanctioned Python path: an Arrow-batched pandas UDF
    (``Series.str.normalize`` — vectorized unicodedata over each Arrow
    batch, never per-row Python). It stays inside the scan's narrow
    stage: zero shuffles. The cross-engine oracle is exact because
    Python's unicodedata and DuckDB's utf8proc implement the same
    Unicode normalization spec.

    Reference analog: NormalizeImage's canonical-value rewrite before
    any downstream op consumes the payload (reference:
    mindocr/data/transforms/general_transforms.py:82-118)."""
    if form not in ("NFC", "NFD", "NFKC", "NFKD"):
        raise ValueError(f"unknown normalization form {form!r}")
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("string")
    def _norm(s: pd.Series) -> pd.Series:
        return s.str.normalize(form)

    t = F.col(text_col)
    normed = F.when(t.isNull(), t).otherwise(_norm(t))
    return (
        df.withColumn("__norm_text", normed)
        .withColumn(
            "was_normalized",
            F.coalesce(F.col("__norm_text") != t, F.lit(False)),
        )
        .withColumn(text_col, F.col("__norm_text"))
        .drop("__norm_text")
    )


# --------------------------------------------------------------------------
# Mojibake detection + repair (curation-stage encoding fixing)
# --------------------------------------------------------------------------

#: Classic UTF-8-read-as-Latin-1 signature: a character whose code
#: point equals a UTF-8 LEAD byte (C2–F4) immediately followed by one
#: whose code point is a CONTINUATION byte (80–BF). Genuine Latin text
#: essentially never puts a C1-control/NBSP-range char right after
#: Ã/Â/â-class letters, so this is the standard high-precision trigger
#: (the ftfy heuristic family). \uXXXX escapes parse identically in
#: Java regex and RE2.
MOJIBAKE_SIG_RE = "[\\u00c2-\\u00f4][\\u0080-\\u00bf]"
#: Every char representable in ISO-8859-1 — the precondition for
#: reinterpreting the string's code points as bytes at all.
_LATIN1_RE = "^[\\x00-\\u00ff]*$"


def mojibake_cols(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Detect and repair mojibake — UTF-8 page bytes that were decoded
    as Latin-1 somewhere upstream ("café" crawled as "cafÃ©"), the
    classic encoding fault of a web corpus. Rewrites `text_col` in
    place and appends ``moji_detected`` (signature present) and
    ``moji_fixed`` (rewrite applied).

    A doc is repaired only when the fix is PROVABLY safe: (1) the
    mojibake signature fires, (2) every char is Latin-1-representable
    (otherwise the reinterpretation doesn't exist — Spark's ``encode``
    raises on unmappable chars, so the encode is gated behind this
    check), and (3) the resulting byte string is valid UTF-8
    (``is_valid_utf8`` — otherwise ``decode`` would raise). Repair =
    ``decode(encode(text, ISO-8859-1), UTF-8)``, one pass (the standard
    fix; doubly-double-encoded text repairs one layer per run).
    Detected-but-unsafe docs keep their bytes and surface
    ``moji_detected`` for a quarantine gate.

    Entirely JVM-side codegen expressions on the scan — zero shuffles,
    zero Python. Reference analog: DecodeImage's charset-sniff +
    canonical re-decode before any downstream op reads the payload
    (reference: mindocr/data/transforms/general_transforms.py:25-64).
    """
    t = F.col(text_col)
    detected = t.rlike(MOJIBAKE_SIG_RE)
    enc = F.when(t.rlike(_LATIN1_RE), F.encode(t, "ISO-8859-1"))
    fixable = detected & F.coalesce(F.is_valid_utf8(enc), F.lit(False))
    return (
        df.withColumn("moji_detected", detected)
        .withColumn("moji_fixed", fixable)
        .withColumn(
            text_col,
            F.when(fixable, F.decode(enc, "UTF-8")).otherwise(t),
        )
    )


# --------------------------------------------------------------------------
# De-hyphenation (PDF/print line-wrap repair)
# --------------------------------------------------------------------------

#: A lowercase letter, a hyphen, a line break (optional surrounding
#: spaces — PDF extractors emit both "exam-\nple" and "exam- \nple"),
#: then a lowercase letter: the print-era line-wrap artifact. Uppercase
#: or digit continuations are NOT joined (Well-\nKnown, ISO-\n9001 are
#: real hyphenated compounds split across lines, where deleting the
#: hyphen corrupts). Shared verbatim with the SQL oracle.
DEHYPHEN_RE = r"([a-z])- ?\n ?([a-z])"


def dehyphenate_cols(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Repair line-wrap hyphenation in extracted PDF/print text
    ("exam-\\nple" → "example") — the canonical PDF-extraction artifact
    that breaks tokenization, dedup shingles, and quality scoring if
    left in (every affected word becomes two garbage tokens). Rewrites
    `text_col` in place and appends ``n_dehyphenated`` (exact repair
    count). Conservative by construction: only a lowercase-to-lowercase
    join across a line break is repaired; hyphenated compounds that
    happen to wrap keep their hyphen (the newline is collapsed so the
    compound reunites: "Well-\\nKnown" → "Well-Known").

    One codegen ``regexp_count`` + two ``regexp_replace`` on the scan —
    zero shuffles, zero Python. Reference analog: crop_text_region's
    within-line reassembly before recognition
    (reference: mindocr/data/transforms/det_transforms.py crop +
    assemble stage)."""
    t = F.coalesce(F.col(text_col), F.lit(""))
    n = F.regexp_count(t, F.lit(DEHYPHEN_RE))
    joined = F.regexp_replace(t, DEHYPHEN_RE, r"$1$2")
    compounds = F.regexp_replace(
        joined, r"([A-Za-z0-9])- ?\n ?([A-Za-z0-9])", r"$1-$2"
    )
    return df.withColumn("n_dehyphenated", n).withColumn(
        text_col, compounds
    )


# --------------------------------------------------------------------------
# Language ID (n-gram / marker-word heuristic)
# --------------------------------------------------------------------------

#: Marker regexes per language. CJK presence dominates; else the richer
#: marker count wins (ties broken by the fixed en > de > es order).
_CJK_ID_RE = r"[一-鿿]"
_DE_RE = r"\b(der|die|das|und|ist|nicht|ein|mit|von|zu)\b"
_ES_RE = r"\b(el|la|los|las|es|y|de|que|en|un|una|por)\b"
_EN_RE = r"\b(the|and|is|of|to|in|that|it|for|was)\b"


def lang_id_col(c: Column | str) -> Column:
    """Deterministic heuristic language tag: zh / de / es / en / unknown."""
    col = F.col(c) if isinstance(c, str) else c
    cjk = F.regexp_count(col, F.lit(_CJK_ID_RE))
    en = F.regexp_count(col, F.lit(_EN_RE))
    de = F.regexp_count(col, F.lit(_DE_RE))
    es = F.regexp_count(col, F.lit(_ES_RE))
    best = F.greatest(en, de, es)
    return (
        F.when(cjk > 0, F.lit("zh"))
        .when(best == 0, F.lit("unknown"))
        .when(en == best, F.lit("en"))
        .when(de == best, F.lit("de"))
        .otherwise(F.lit("es"))
    )


# --------------------------------------------------------------------------
# Script-mix histogram (the CCNet script-composition signal)
# --------------------------------------------------------------------------

#: Script classes as LITERAL character ranges (not \p{Script=...},
#: whose name syntax differs between Java regex and RE2; literal
#: codepoints in a class parse identically in both). Rendered verbatim
#: into the SQL oracle — dialect agreement is part of the check.
SCRIPT_CLASSES: tuple[tuple[str, str], ...] = (
    ("latin", "[A-Za-zÀ-ɏ]"),
    ("cyrillic", "[Ѐ-ӿ]"),
    ("greek", "[Ͱ-Ͽ]"),
    ("arabic", "[؀-ۿ]"),
    ("cjk", "[一-鿿぀-ヿ가-힯]"),
)


def script_mix_cols(df: DataFrame, text_col: str = "text",
                    id_col: str = "doc_id") -> DataFrame:
    """Per-document Unicode SCRIPT composition (the CCNet-family
    multilingual curation signal `lang_id_col` cannot give: lang-id
    names one language, script mix detects MIXED-script spam, wrong-
    script injection, and transliteration noise): per-script character
    counts, the dominant script's share of scripted characters, and a
    `main_script` label (ties broken by the fixed SCRIPT_CLASSES
    order; 'none' when no scripted characters at all).

    100 TB shape: one codegen `regexp_count` per script class — pure
    row expressions, zero shuffles, zero Python. Counts are exact
    ints; the share is one IEEE division rounded at 6.
    """
    t = F.coalesce(F.col(text_col), F.lit(""))
    counts = {name: F.regexp_count(t, F.lit(cls))
              for name, cls in SCRIPT_CLASSES}
    total = None
    for c in counts.values():
        total = c if total is None else total + c
    best = F.greatest(*counts.values())
    label = F.when(total == 0, F.lit("none"))
    for name, _ in SCRIPT_CLASSES:
        label = label.when(counts[name] == best, F.lit(name))
    share = F.round(
        F.try_divide(best.cast("double"), total.cast("double")), 6
    )
    return df.select(
        id_col,
        *[counts[name].alias(f"n_{name}") for name, _ in SCRIPT_CLASSES],
        total.alias("n_scripted"),
        label.alias("main_script"),
        share.alias("main_share"),
    )


# --------------------------------------------------------------------------
# Direction normalization (conditional payload rewrite)
# --------------------------------------------------------------------------

#: Hebrew + Arabic blocks as LITERAL characters (U+0590–U+05FF,
#: U+0600–U+06FF) — literal chars in a class parse identically in Java
#: regex and RE2, unlike \uXXXX escapes.
_RTL_CLASS = "[֐-׿؀-ۿ]"


def direction_norm_cols(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Conditional direction normalization — the Rotate90IfVertical
    analog (reference: mindocr/data/transforms/rec_transforms.py:446-468,
    which DETECTS a property of the payload, then conditionally REWRITES
    it; SURVEY §2.8 maps it to a conditional scalar transform):

    - DETECT: a doc is RTL-dominant when it has more RTL-script chars
      (Hebrew/Arabic blocks) than ASCII letters;
    - REWRITE: RTL-dominant text gets its token order reversed
      (visual → logical order normalization); LTR text passes through
      byte-identical.

    Adds ``is_rtl`` and ``text_dir``. Pure codegen expressions with an
    exact SQL twin."""
    col = F.col(text_col)
    rtl = F.regexp_count(col, F.lit(_RTL_CLASS))
    ltr = F.regexp_count(col, F.lit("[A-Za-z]"))
    is_rtl = rtl > ltr
    flipped = F.concat_ws(" ", F.reverse(tokens_col(text_col)))
    return df.select(
        *df.columns,
        is_rtl.alias("is_rtl"),
        F.when(is_rtl, flipped).otherwise(col).alias("text_dir"),
    )


def unigram_drift(
    old: DataFrame,
    new: DataFrame,
    text_col: str = "text",
    group_col: str | None = None,
) -> DataFrame:
    """Distribution drift between two corpus snapshots: KL(new‖old)
    over add-one-smoothed unigram distributions on the UNION
    vocabulary, per `group_col` stratum (or one 'all' row). The
    training-data monitoring gate: a crawl increment whose token
    distribution diverges from the committed corpus (spam floods,
    template changes, language shifts) flags BEFORE it trains.
    Returns (grp, n_tokens_old, n_tokens_new, vocab_size, kl_drift).

    Exactness discipline: p = (c+1)/(n+V) is one IEEE division per
    side, each term is p_new·round(ln(p_new/p_old), 9) quantized at 12
    and summed as DECIMAL (order-independent), final cast to double —
    the engine-wide ln-quantization rule.

    100 TB shape: both sides explode to (grp, token, side) and meet in
    ONE count aggregate with map-side partials (a viral token
    collapses before the exchange); group totals are a second tiny
    aggregate joined back (groups are few — broadcast); one final
    DECIMAL sum per group. The per-(grp, token) relation is persisted
    — it feeds both the totals and the terms."""
    def side(df: DataFrame, tag: int) -> DataFrame:
        # NULL strata bucket as 'und' (the temperature_mix convention):
        # a spam flood arriving with MISSING lang tags is exactly the
        # drift this monitor exists for — an equi-join on a NULL key
        # would silently drop the whole stratum
        g = (
            F.coalesce(F.col(group_col), F.lit("und"))
            if group_col else F.lit("all")
        ).alias("grp")
        return df.select(g, tokens_col(text_col).alias("_t")).select(
            "grp", F.explode("_t").alias("token"), F.lit(tag).alias("side")
        )

    counts = tracked_persist(
        side(old, 0).unionAll(side(new, 1))
        .groupBy("grp", "token")
        .agg(
            F.count(F.when(F.col("side") == 0, 1)).alias("c_old"),
            F.count(F.when(F.col("side") == 1, 1)).alias("c_new"),
        )
    )
    totals = counts.groupBy("grp").agg(
        F.sum("c_old").alias("n_old"),
        F.sum("c_new").alias("n_new"),
        F.count(F.lit(1)).alias("v"),
    )
    j = counts.join(F.broadcast(totals), "grp")
    p_old = (F.col("c_old") + 1).cast("double") / (
        F.col("n_old") + F.col("v")
    ).cast("double")
    p_new = (F.col("c_new") + 1).cast("double") / (
        F.col("n_new") + F.col("v")
    ).cast("double")
    term = F.round(
        p_new * F.round(F.log(p_new / p_old), 9), 12
    ).cast("decimal(28,12)")
    return (
        j.select("grp", "n_old", "n_new", "v", term.alias("_term"))
        .groupBy("grp")
        .agg(
            F.first("n_old").alias("n_tokens_old"),
            F.first("n_new").alias("n_tokens_new"),
            F.first("v").cast("bigint").alias("vocab_size"),
            F.sum("_term").cast("double").alias("kl_drift"),
        )
    )


# --------------------------------------------------------------------------
# Stopword-profile language verification (the declared-lang audit)
# --------------------------------------------------------------------------

#: Per-language stopword profiles for declared-language verification.
#: Deliberately small (the audit needs FUNCTION words, not vocabulary
#: coverage) and deliberately overlapping: "de" is a genuine stopword
#: of BOTH Spanish and French, so a token may credit several profiles —
#: the join fan-out is bounded by the profile count, never the corpus.
STOPWORD_PROFILES: tuple[tuple[str, tuple[str, ...]], ...] = (
    ("de", ("der", "die", "und", "nicht", "das", "ist")),
    ("en", ("and", "of", "to", "is", "was", "for")),
    ("es", ("el", "los", "que", "una", "con", "para", "de")),
    ("fr", ("le", "et", "les", "des", "dans", "pour", "de")),
    ("zh", ("的", "了", "是", "我", "不", "在")),
)


def lang_verify_cols(
    df: DataFrame,
    profiles: tuple[tuple[str, tuple[str, ...]], ...] = STOPWORD_PROFILES,
    text_col: str = "text",
    lang_col: str = "lang",
    id_col: str = "doc_id",
) -> DataFrame:
    """Verify each document's DECLARED language against its stopword
    profile (the CCNet/crawler-metadata audit: upstream `lang` tags
    come from HTTP headers and <html lang> attributes, which lie).
    Each language's function-word hit count is tallied; the profile
    argmax (ties broken language-ascending — a struct MIN both engines
    order field-wise) becomes ``profile_lang``, and ``lang_match``
    compares it to the declared tag. A doc with ZERO profile hits has
    no evidence: NULL ``profile_lang`` and NULL ``lang_match`` (the
    engine-wide "no evidence ≠ pass" discipline), never a guess.

    100 TB shape: exploded tokens semi-joined against the BROADCAST
    profile relation (tens of rows) BEFORE any aggregate — the groupBy
    runs at matched-token cardinality, not corpus-token cardinality —
    then one bounded per-doc argmax. Zero Python, two shuffles (hit
    count + anchor join), no skew (the doc key is uniform)."""
    rows = [(lang, w) for lang, ws in profiles for w in ws]
    prof = df.sparkSession.createDataFrame(
        rows, "profile_lang string, word string"
    )
    base = tracked_persist(
        df.select(
            id_col, lang_col, tokens_col(F.lower(F.col(text_col))).alias("_toks")
        )
    )
    tok = base.select(id_col, F.explode("_toks").alias("word"))
    hits = (
        tok.join(F.broadcast(prof), "word")
        .groupBy(id_col, "profile_lang")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    best = hits.groupBy(id_col).agg(
        F.min(
            F.struct(
                (-F.col("cnt")).alias("nc"),
                F.col("profile_lang").alias("pl"),
            )
        ).alias("_b")
    )
    anchored = base.select(id_col, lang_col).join(best, id_col, "left")
    pred = F.col("_b.pl")
    return anchored.select(
        id_col,
        F.col(lang_col).alias("lang"),
        pred.alias("profile_lang"),
        F.coalesce((-F.col("_b.nc")).cast("bigint"), F.lit(0)).alias(
            "profile_hits"
        ),
        F.when(pred.isNotNull(), pred == F.col(lang_col)).alias(
            "lang_match"
        ),
    )


# --------------------------------------------------------------------------
# Fingerprinting
# --------------------------------------------------------------------------


def fingerprint_md5(c: Column | str) -> Column:
    """Canonical content fingerprint: md5 of the lower-cased normalized
    text — the exact-dedup key. md5 is bit-identical everywhere."""
    return F.md5(F.lower(normalize_col(c)).cast("binary"))


def word_shingles(df: DataFrame, k: int = 3, text_col: str = "text",
                  id_col: str = "doc_id") -> DataFrame:
    """Distinct word k-shingles per doc — fully NARROW generation:
    tokens → slice/transform array expressions → explode. No window, no
    shuffle until the consumer groups on the shingle key (at 100 TB the
    old window-lead formulation would shuffle+sort every token by doc).

    Returns (id_col, shingle).
    """
    # bind tokens to a column FIRST: referencing the split expression
    # inside the transform lambda would re-evaluate it per element
    # (quadratic per doc)
    with_toks = df.select(id_col, tokens_col(text_col).alias("_toks"))
    toks = F.col("_toks")
    shingles = F.when(
        F.size(toks) >= k,
        F.transform(
            F.sequence(F.lit(1), F.size(toks) - (k - 1)),
            lambda i: F.array_join(F.slice(toks, i, k), " "),
        ),
    ).otherwise(F.array().cast("array<string>"))
    # array_distinct makes (doc, shingle) unique per row — no shuffle-
    # backed DataFrame distinct needed
    return with_toks.select(
        id_col, F.explode(F.array_distinct(shingles)).alias("shingle")
    )


def rolling_fingerprints(df: DataFrame, k: int = 8, text_col: str = "text",
                         id_col: str = "doc_id", keep_every: int = 16) -> DataFrame:
    """Rolling-hash document fingerprints (winnowing-style sample): hash
    every k-char gram of the normalized text, keep grams whose hash ≡ 0
    (mod keep_every) — a content-defined sample robust to edits.
    Pure built-ins: sequence → explode → substring → xxhash64.
    """
    norm = F.lower(normalize_col(text_col))
    grams = (
        df.select(id_col, norm.alias("_t"))
        # guard short texts: Spark's sequence(1, 0) is the DESCENDING
        # [1, 0], which would emit phantom grams
        .where(F.length("_t") >= k)
        .select(
            id_col, "_t",
            F.explode(F.sequence(F.lit(1), F.length("_t") - (k - 1))).alias("i"),
        )
        .select(id_col, F.xxhash64(F.substring("_t", F.col("i"), k)).alias("h"))
    )
    return grams.where(F.pmod("h", F.lit(keep_every)) == 0).distinct()


#: Rolling-hash constants shared with the DuckDB oracle twin: Horner
#: base and Mersenne modulus. All intermediates fit int64
#: (M * B + max_codepoint < 2^63), so both engines compute the exact
#: same integers.
CDC_BASE = 257
CDC_MOD = (1 << 31) - 1


def _cdc_boundaries_fn(k: int, mod: int):
    """Arrow fold: text → 1-based boundary positions where the k-char
    gram's rolling polynomial hash ≡ 0 (mod `mod`). Vectorized Horner:
    k fused multiply-add passes over the codepoint array — O(k·n) C
    ops per doc, no per-position digest (the md5-per-position version
    this replaced was ~100× more work per byte; see BENCH.md)."""

    def fn(texts: pd.Series) -> pd.Series:
        import numpy as np

        out = []
        for t in texts:
            if t is None or len(t) < k + 1:
                out.append([])
                continue
            c = np.frombuffer(
                t.encode("utf-32-le"), dtype=np.uint32
            ).astype(np.int64)
            m = c.size - k + 1  # grams start at 0-based 0..n-k
            h = np.zeros(m, dtype=np.int64)
            for j in range(k):
                h = (h * CDC_BASE + c[j:j + m]) % CDC_MOD
            # candidates are 1-based starts 2..n-k+1 (a boundary at 1
            # would open an empty zeroth chunk) = H indices 1..m-1
            hits = np.nonzero((h[1:] % mod) == 0)[0] + 2
            out.append(hits.astype(np.int32).tolist())
        return pd.Series(out, dtype="object")

    return fn


def cdc_chunks(df: DataFrame, k: int = 8, nibbles: int = 2,
               text_col: str = "text",
               id_col: str = "doc_id") -> DataFrame:
    """Content-defined chunking (the FastCDC/rsync family, re-expressed
    for a shuffle engine): split each document at positions whose
    k-char gram's ROLLING polynomial hash (Horner base 257 mod 2^31-1,
    the Rabin–Karp family) is ≡ 0 mod 16^`nibbles` — an expected chunk
    length of 16^nibbles chars (~256 at the default), the same rate as
    the md5-zero-prefix rule this replaced at ~1/100th the per-byte
    cost (no digest per position; see BENCH.md). Returns one row per
    chunk: (id, chunk_idx, chunk_start, chunk_len, chunk_md5), tiling
    the document exactly.

    Content-defined is the load-bearing property: a boundary depends
    only on the local bytes, so an insertion early in a document shifts
    ONE chunk's identity instead of re-cutting every downstream chunk —
    which is what makes chunk-grain dedup/retrieval stable under edits
    (the :func:`rolling_fingerprints` discipline, promoted from
    sampled grams to a full tiling). The standard training-prep /
    retrieval-chunking step for long documents.

    100 TB shape: boundary detection is ONE Arrow-batched numpy fold
    (k vectorized multiply-adds per doc — linear, no per-position
    Python and no per-position digest); the tiling is JVM arrays_zip +
    posexplode and the per-chunk md5 is codegen. Zero shuffles, no
    groupBy anywhere. Docs with NULL text contribute no rows (a chunk
    relation has no use for NULL rows). Exact SQL twin via DuckDB list
    comprehension over the same Horner arithmetic — identical int64
    values in both engines.

    Reference lineage: crop_text_region slices the payload into
    per-region sub-images keyed (image, region idx) for downstream
    stages (reference: mindocr/data/utils/crop.py, tools/infer/text/
    predict_system.py:104-131); CDC chunking is the text analog with
    content-defined instead of detector-defined boundaries.
    """
    if k <= 0 or nibbles <= 0:
        raise ValueError(f"k and nibbles must be positive, got {k}, {nibbles}")
    t = F.col(text_col)
    n = F.length(t)
    from pyspark.sql.functions import pandas_udf

    bounds = pandas_udf(
        _cdc_boundaries_fn(k, 16 ** nibbles), "array<int>")
    base = df.where(t.isNotNull()).select(
        id_col, t.alias("__t"), bounds(t).alias("__bs"))
    n = F.length("__t")
    bs = F.col("__bs")
    spans = F.arrays_zip(
        F.concat(F.array(F.lit(1)), bs).alias("s"),
        F.concat(bs, F.array((n + 1).cast("int"))).alias("e"),
    )
    c = base.select(
        id_col,
        "__t",
        F.posexplode(spans).alias("chunk_idx", "__span"),
    )
    start = F.col("__span.s")
    length = F.col("__span.e") - start
    return c.select(
        id_col,
        "chunk_idx",
        start.alias("chunk_start"),
        length.alias("chunk_len"),
        F.md5(
            F.substr(F.col("__t"), start, length).cast("binary")
        ).alias("chunk_md5"),
    )


# --------------------------------------------------------------------------
# Evaluation metrics (RecMetric analog)
# --------------------------------------------------------------------------


def rec_metrics(pairs: DataFrame, pred_col: str = "pred",
                label_col: str = "label") -> DataFrame:
    """Per-pair exact match + normalized edit distance, with built-in
    `levenshtein` (the reference computes this via rapidfuzz,
    reference: mindocr/metrics/rec_metrics.py:122). Per-row doubles only —
    aggregate with exact int sums downstream."""
    lev = F.levenshtein(F.col(pred_col), F.col(label_col))
    denom = F.greatest(F.length(pred_col), F.length(label_col), F.lit(1))
    return pairs.withColumn("lev", lev).withColumn(
        "exact", (F.col(pred_col) == F.col(label_col)).cast("int")
    ).withColumn(
        "norm_ed", F.round(F.lit(1.0) - lev.cast("double") / denom.cast("double"), 6)
    )


# --------------------------------------------------------------------------
# Deterministic stratified sampling (corpus rebalancing)
# --------------------------------------------------------------------------


def hash_sample_threshold(fraction: float) -> str | None:
    """8-hex-digit threshold for md5-prefix sampling: a row whose
    ``md5(id)[:8] < threshold`` is kept, which selects `fraction` of a
    uniform hash space. Returns None for fraction ≥ 1 (keep all);
    fractions ≤ 0 map to the impossible threshold ``"00000000"``
    (drop all). The SQL oracle calls this same function, so the two
    engines compare against byte-identical constants."""
    if fraction >= 1.0:
        return None
    if fraction <= 0.0:
        return "00000000"
    return format(int(fraction * 16 ** 8), "08x")


def grouped_split(
    df: DataFrame,
    group_col: str,
    splits: tuple[tuple[str, float], ...] = (
        ("train", 0.98), ("val", 0.01), ("test", 0.01),
    ),
    split_col: str = "split",
) -> DataFrame:
    """Leakage-safe train/val/test assignment at GROUP grain: every row
    whose `group_col` hashes into the same bucket lands in the same
    split. Splitting at page grain leaks — near-duplicate pages of one
    site straddle train and test, and the eval set is contaminated by
    construction; splitting on the registered domain (the standard
    grouping) keeps all of a site's correlated content on one side.

    Membership is md5(group)-prefix thresholding against CUMULATIVE
    fraction cutoffs (the :func:`hash_sample_threshold` discipline):
    deterministic, RNG-free, identical on every engine and re-run.
    The last split absorbs the remainder, so weights need not sum to
    exactly 1. NULL groups fall to the last split (no hash evidence —
    never into eval). One codegen CASE on the scan: no join, no
    shuffle.
    """
    h = F.substring(F.md5(F.col(group_col).cast("string")), 1, 8)
    col = None
    cum = 0.0
    for name, w in splits[:-1]:
        cum += w
        t = hash_sample_threshold(cum)
        cond = h < F.lit(t if t is not None else "ffffffff~")
        col = F.when(cond, name) if col is None else col.when(cond, name)
    fallback = F.lit(splits[-1][0])
    col = fallback if col is None else col.otherwise(fallback)
    return df.withColumn(split_col, col)


def oov_cols(
    df: DataFrame,
    vocab_size: int = 1000,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Tokenizer-coverage analysis: the corpus's top-`vocab_size`
    tokens by frequency (ties broken token-ascending — deterministic
    on every engine) play the vocabulary; each document reports its
    token count, OUT-OF-VOCABULARY token count, and OOV rate. High OOV
    flags non-language junk, wrong-script content, and corpora a fixed
    tokenizer will shred into bytes — the standard pre-tokenizer audit.

    100 TB shape: vocabulary = one explode + one groupBy(token) with
    map-side partials + TopK (TakeOrderedAndProject — never a global
    sort); the per-doc pass joins exploded tokens against the
    BROADCAST vocabulary (vocab_size rows) and re-aggregates on the
    doc key. Zero-token docs report (0, 0, NULL rate) — never vanish.
    """
    with_toks = tracked_persist(
        df.select(id_col, tokens_col(text_col).alias("_toks"))
    )
    tok = with_toks.select(id_col, F.explode("_toks").alias("token"))
    vocab = (
        tok.groupBy("token").agg(F.count("*").alias("cnt"))
        .orderBy(F.col("cnt").desc(), F.col("token").asc())
        .limit(vocab_size)
        .select("token", F.lit(1).alias("_inv"))
    )
    per_doc = (
        tok.join(F.broadcast(vocab), "token", "left")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.count(F.when(F.col("_inv").isNull(), 1)).alias("n_oov"),
        )
    )
    anchored = with_toks.select(id_col).join(per_doc, id_col, "left")
    n_tok = F.coalesce("n_tokens", F.lit(0)).cast("bigint")
    n_oov = F.coalesce("n_oov", F.lit(0)).cast("bigint")
    return anchored.select(
        id_col,
        n_tok.alias("n_tokens"),
        n_oov.alias("n_oov"),
        F.round(
            F.try_divide(n_oov.cast("double"), n_tok.cast("double")), 6
        ).alias("oov_rate"),
    )


def stratified_sample(
    df: DataFrame,
    fractions: dict[str, float],
    stratum_col: str = "lang",
    id_col: str = "doc_id",
    default_fraction: float = 1.0,
) -> DataFrame:
    """Deterministic per-stratum down-sampling — the corpus REBALANCING
    step (down-weight the dominant language / source à la DCLM and
    FineWeb mixing) made reproducible: membership depends only on
    md5(id), never on an RNG, so the same row is kept on every run, on
    every engine, under any partitioning — and a re-run after a crash
    selects the identical subset (the property the resume discipline
    needs).

    `fractions` maps stratum value → keep fraction; unlisted strata
    use `default_fraction`. The per-stratum thresholds compile to one
    whole-stage-codegen CASE over the hash prefix — no join, no
    shuffle, no RNG. Fractions are quantized to 1/16^8 (≈ 6e-10).
    Rows with a NULL id are EXEMPT (always kept): their membership is
    undefined, and a NULL hash comparison would silently drop them —
    the same exemption discipline as `urls.domain_cap`.

    Reference analog: the sample_ratio scan option
    (reference: mindocr/data/det_dataset.py:112-158), which slices a
    deterministic prefix of the shuffled file list."""
    h = F.substring(
        F.md5(F.col(id_col).cast("string").cast("binary")), 1, 8
    )

    def keep(fr: float):
        t = hash_sample_threshold(fr)
        return F.lit(True) if t is None else (h < F.lit(t))

    expr = None
    for value, fr in fractions.items():
        cond = F.col(stratum_col) == value
        expr = (F.when(cond, keep(fr)) if expr is None
                else expr.when(cond, keep(fr)))
    sampled = (keep(default_fraction) if expr is None
               else expr.otherwise(keep(default_fraction)))
    return df.where(F.col(id_col).isNull() | sampled)


def weighted_sample(
    df: DataFrame,
    k: int,
    weight_col: str = "n_chars",
    id_col: str = "doc_id",
    seed: int = 0,
) -> DataFrame:
    """Deterministic WEIGHTED sampling without replacement — the
    Efraimidis–Spirakis A-ES scheme made RNG-free: each row draws a
    content-addressed uniform ``u = (hexint(md5(seed ':' id)[:13]) +
    1) / 2^52 ∈ (0, 1]`` and a key ``ln(u) / w``; the global top-`k`
    by key are exactly a weight-proportional sample without
    replacement (Efraimidis & Spirakis 2006 — ranking by ``u^(1/w)``
    equals ranking by ``ln(u)/w``). "Sample 500 docs proportional to
    token count" is the quality-inspection / eval-slice draw a
    curation pipeline runs constantly; hashing (seed, id) instead of
    an RNG keeps the drawn set identical across runs, engines and
    partitionings — the resume property every sampler here shares
    (`stratified_sample`, `epoch_shuffle`).

    Rows with NULL id, NULL weight, or weight ≤ 0 are dropped — a
    weightless row has no defined inclusion probability (unlike the
    keep-all gates, a SAMPLE has no safe "exempt" semantics: exempt
    rows would exceed k).

    Keys are quantized ``round(·, 9)`` so both engines rank identical
    values (the pmi_collocations ln-parity discipline), with the id as
    the total tie-break; ``+ 0.0`` normalizes the signed zero a tiny
    negative key rounds to. The 13-hex-digit prefix is 52 bits — the
    widest that stays exact in a double.

    100 TB plan: one scan computes the key in whole-stage codegen; the
    global top-k is TakeOrderedAndProject (per-partition heaps + one
    k-row driver merge) — no global sort, no shuffle of the corpus.
    Reference analog: the weighted per-dataset sample_ratio mix
    (reference: mindocr/data/builder.py:42-78)."""
    if k <= 0:
        raise ValueError(f"weighted_sample needs k > 0, got {k}")
    cid = F.col(id_col)
    w = F.col(weight_col).cast("double")
    h = F.conv(
        F.substring(
            F.md5(
                F.concat(F.lit(f"{int(seed)}:"), cid.cast("string"))
                .cast("binary")
            ),
            1, 13,
        ),
        16, 10,
    ).cast("bigint")
    u = (h + F.lit(1)).cast("double") / F.lit(float(1 << 52))
    key = F.round(F.log(u) / w, 9) + F.lit(0.0)
    return (
        df.where(cid.isNotNull() & w.isNotNull() & (w > 0))
        .withColumn("sample_key", key)
        .orderBy(F.col("sample_key").desc(), cid.asc())
        .limit(int(k))
    )


def token_budget_sample(
    df: DataFrame,
    budgets: dict[str, int],
    stratum_col: str = "lang",
    id_col: str = "doc_id",
    text_col: str = "text",
    default_budget: int | None = None,
) -> DataFrame:
    """Greedy token-budget mixing: walk each stratum's docs in
    deterministic md5(id) order and keep them until the stratum's
    token budget is exhausted (a doc that would cross the line is
    dropped). This is the "take N billion tokens per language/source"
    step of assembling a training mix, reproducible because the walk
    order is a pure function of the ids. Unlisted strata use
    `default_budget` (None = unlimited). Returns the kept rows plus
    (n_tokens, cum_tokens). Rows with a NULL id or NULL stratum are
    EXEMPT (always kept, cum_tokens NULL): their walk position /
    stratum is undefined, and the offset equi-join would otherwise
    silently drop them — the same exemption discipline as
    :func:`stratified_sample` and `urls.domain_cap`.

    100 TB plan: a cumulative sum per stratum is inherently
    sequential, and ``Window.partitionBy(stratum)`` would funnel the
    dominant language's 10^12 rows into ONE sorted task. This runs the
    classic DISTRIBUTED PREFIX-SUM instead: docs hash into
    sub-buckets per stratum BY MD5 PREFIX (so buckets are contiguous
    hash ranges and the bucket-then-hash walk IS global md5 order),
    each bucket computes its local ordered cumsum in parallel, bucket
    totals (a strata×256 relation — tiny) get their own prefix-sum,
    and the broadcast bucket offsets turn local cumsums into global
    ones. The final values are identical to the one-window
    formulation, which is exactly what the SQL oracle computes.
    (the bucket count is pinned at 256 = one md5 hex-pair.)"""
    cum, exempt = _stratified_token_cumsum(df, stratum_col, id_col, text_col)
    expr = None
    for value, budget in budgets.items():
        cond = F.col(stratum_col) == value
        keep = (F.lit(True) if budget is None
                else F.col("cum_tokens") <= F.lit(int(budget)))
        expr = (F.when(cond, keep) if expr is None
                else expr.when(cond, keep))
    default_keep = (F.lit(True) if default_budget is None
                    else F.col("cum_tokens") <= F.lit(int(default_budget)))
    cond_all = default_keep if expr is None else expr.otherwise(default_keep)
    kept = cum.where(cond_all).drop("__h", "__b", "__local_cum", "__offset")
    return kept.unionByName(exempt)


def temperature_mix(
    df: DataFrame,
    budget_tokens: int = 100_000,
    stratum_col: str = "lang",
    text_col: str = "text",
) -> DataFrame:
    """Temperature-scaled mixture allocation (the XLM-R / mT5
    multilingual rebalancing step): per-stratum sampling weights
    ``w_s ∝ n_tokens_s^α`` with α = 0.5, which up-weights tail
    languages relative to their raw token share without letting any
    head language dominate an epoch. α is FIXED at 0.5 because
    ``sqrt`` is an IEEE-754 correctly-rounded operation — bit-identical
    across engines — where a general ``pow``/``exp(α·ln)`` is only
    faithfully rounded and may differ in the last ulp per libm.

    Returns one row per stratum: exact ``n_docs`` / ``n_tokens``
    counts, ``raw_share`` (proportional), ``temp_share`` (the α = 0.5
    allocation), ``boost`` (temp/raw — >1 means the stratum is
    up-sampled), and ``alloc_tokens`` (the stratum's slice of
    `budget_tokens` per epoch, floored).

    Cross-engine exactness: token counts are exact BIGINTs; each
    weight is round(sqrt(n),6) and the normalizer is their
    order-independent DECIMAL sum; every share is one IEEE division of
    those identical values, rounded half-away at 6.

    100 TB shape: ONE corpus-sized shuffle (the map-side-combinable
    groupBy on the stratum key, stratum cardinality ~languages); the
    normalizer is an agg over that tiny table broadcast-crossed back.
    Reference lineage: per-dataset sample_ratio mixing in multi-source
    loading (reference: mindocr/data/builder.py:42-78) — here the
    ratios are DERIVED from the corpus instead of configured.
    """
    strat = F.coalesce(F.col(stratum_col), F.lit("und"))
    per = (
        df.select(
            strat.alias("stratum"),
            # coalesce NULL text: an all-NULL stratum must report
            # exact 0 tokens (sum over all-NULL is NULL), not vanish
            # from the shares — the readability "verdict row" rule
            F.size(tokens_col(F.coalesce(F.col(text_col), F.lit(""))))
            .alias("_nt"),
        )
        .groupBy("stratum")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.coalesce(F.sum("_nt"), F.lit(0)).cast("bigint")
            .alias("n_tokens"),
        )
    )
    wq = F.round(F.sqrt(F.col("n_tokens").cast("double")), 6)
    weighted = per.select("stratum", "n_docs", "n_tokens", wq.alias("_wq"))
    totals = weighted.agg(
        F.sum("n_tokens").cast("bigint").alias("_tot_tokens"),
        F.sum(F.col("_wq").cast("decimal(38,6)"))
        .cast("double").alias("_s"),
    )
    # try_divide: a zero-token stratum (or an empty corpus) must yield
    # NULL shares, never an ANSI divide-by-zero abort or a NaN that
    # diverges from the oracle's CASE guards
    raw_share = F.try_divide(
        F.col("n_tokens").cast("double"),
        F.col("_tot_tokens").cast("double"),
    )
    temp_share = F.try_divide(F.col("_wq"), F.col("_s"))
    has_mass = F.col("n_tokens") > 0
    return (
        weighted.crossJoin(F.broadcast(totals))
        .select(
            F.col("stratum").alias(stratum_col),
            "n_docs",
            "n_tokens",
            F.round(raw_share, 6).alias("raw_share"),
            F.round(temp_share, 6).alias("temp_share"),
            F.when(
                has_mass, F.round(F.try_divide(temp_share, raw_share), 6)
            ).alias("boost"),
            F.floor(F.lit(float(budget_tokens)) * temp_share)
            .cast("bigint").alias("alloc_tokens"),
        )
    )


def _stratified_token_cumsum(
    df: DataFrame, stratum_col: str, id_col: str, text_col: str
) -> tuple[DataFrame, DataFrame]:
    """Shared distributed prefix-sum over the deterministic md5(id)
    walk (the machinery behind :func:`token_budget_sample` and
    :func:`sequence_pack`): returns ``(cum, exempt)`` where `cum`
    carries (n_tokens, cum_tokens) for every row with a non-NULL
    (id, stratum) — in global (md5-bucket, md5, id) walk order, values
    identical to the one-window formulation — plus the internal
    ``__h/__b/__local_cum/__offset`` columns the caller must drop, and
    `exempt` holds the NULL-id/NULL-stratum rows with cum_tokens NULL.

    See token_budget_sample's docstring for the 100 TB rationale: a
    plain Window.partitionBy(stratum) funnels the dominant stratum
    into ONE sorted task; md5-prefix sub-buckets (pinned at 256 = one
    hex pair) cumsum in parallel and a tiny bucket-offset window +
    broadcast join globalize the sums."""
    h = F.md5(F.col(id_col).cast("string").cast("binary"))
    # this frame feeds the local-cumsum window AND the bucket-totals
    # agg — a caller with expensive upstream lineage should pass a
    # PERSISTED frame; persisting here would leak cached storage for
    # calls made outside a persist_scope (the domain_cap precedent)
    withtok = df.select(
        "*",
        F.size(tokens_col(text_col)).alias("n_tokens"),
        h.alias("__h"),
        F.substring(h, 1, 2).alias("__b"),
    )
    base = withtok.where(
        F.col(id_col).isNotNull() & F.col(stratum_col).isNotNull()
    )
    exempt = (
        withtok.where(
            F.col(id_col).isNull() | F.col(stratum_col).isNull()
        )
        .withColumn("cum_tokens", F.lit(None).cast("bigint"))
        .drop("__h", "__b")
    )
    w_local = Window.partitionBy(stratum_col, "__b").orderBy("__h", id_col)
    local = base.withColumn(
        "__local_cum", F.sum("n_tokens").over(w_local)
    )
    totals = base.groupBy(stratum_col, "__b").agg(
        F.sum("n_tokens").alias("__bucket_total")
    )
    w_buckets = (
        Window.partitionBy(stratum_col).orderBy("__b")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = totals.withColumn(
        "__offset",
        F.coalesce(F.sum("__bucket_total").over(w_buckets), F.lit(0)),
    ).select(stratum_col, "__b", "__offset")
    # global walk order = (__b, __h, id): bucket 0's docs in md5
    # order, then bucket 1's, ... — the SQL oracle's one-window cumsum
    # orders by the same triple and lands on identical values
    cum = (
        local.join(F.broadcast(offsets), [stratum_col, "__b"])
        .withColumn(
            "cum_tokens",
            (F.col("__offset") + F.col("__local_cum")).cast("bigint"),
        )
    )
    return cum, exempt


def sequence_pack(
    df: DataFrame,
    seq_len: int,
    stratum_col: str = "lang",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Concat-and-chunk sequence packing bookkeeping (the GPT-style
    training-prep step): conceptually, each stratum's documents are
    concatenated in deterministic md5(id) order into one token stream
    that is then chopped into fixed `seq_len` windows; this computes,
    per document, exactly which training sequence(s) its tokens land
    in — without materializing the stream:

    - ``seq_first`` / ``seq_last``: 0-based indices of the first/last
      sequence the doc's token span [cum−n, cum) touches,
    - ``seq_offset``: the doc's start position inside seq_first,
    - ``n_seqs``: how many sequences the doc spans (>1 = the doc is
      split across a sequence boundary).

    Zero-token docs occupy no span: their packing columns are NULL
    (they are reported, never silently dropped). NULL-id/NULL-stratum
    rows are EXEMPT with NULL packing columns — the
    :func:`token_budget_sample` discipline.

    Everything after the shared distributed prefix-sum
    (:func:`_stratified_token_cumsum` — parallel per-md5-bucket
    cumsums, never one global sorted task) is exact integer
    arithmetic, so the SQL oracle's one-window formulation lands on
    identical values. At 10^12 docs this is one shuffle for the
    bucket cumsum plus a broadcast — the packing math itself is
    scan-local codegen."""
    if seq_len <= 0:
        raise ValueError(f"seq_len must be positive, got {seq_len}")
    cum, exempt = _stratified_token_cumsum(df, stratum_col, id_col, text_col)
    start = F.col("cum_tokens") - F.col("n_tokens")
    has_span = F.col("n_tokens") > 0
    L = F.lit(int(seq_len))
    packed = (
        cum.withColumn(
            "seq_first",
            F.when(has_span, F.floor(start / L)).cast("bigint"),
        )
        .withColumn(
            "seq_last",
            F.when(
                has_span, F.floor((F.col("cum_tokens") - 1) / L)
            ).cast("bigint"),
        )
        .withColumn(
            "seq_offset",
            F.when(has_span, start - F.col("seq_first") * L).cast("bigint"),
        )
        .withColumn(
            "n_seqs",
            F.when(
                has_span, F.col("seq_last") - F.col("seq_first") + 1
            ).cast("bigint"),
        )
        .drop("__h", "__b", "__local_cum", "__offset")
    )
    null_pack = exempt
    for c in ("seq_first", "seq_last", "seq_offset", "n_seqs"):
        null_pack = null_pack.withColumn(c, F.lit(None).cast("bigint"))
    return packed.unionByName(null_pack)


def context_windows(df: DataFrame, window: int = 64, stride: int = 48,
                    text_col: str = "text",
                    id_col: str = "doc_id") -> DataFrame:
    """Fixed-length training CONTEXT WINDOWS with overlap — the long-
    document complement of :func:`sequence_pack` (pack concatenates
    short docs into sequences; this splits long docs into overlapping
    windows so no span is ever cut off from its left context, the
    standard GPT-style stride chunking). Window i covers tokens
    [i·stride, min(i·stride + window, n)): full coverage, overlap
    `window − stride`, the last window short but never empty, exactly
    one window for docs with n ≤ window tokens. Zero-token docs emit
    no windows (nothing to train on).

    Output: (id_col, win_idx, tok_start, tok_end, n_win_tokens,
    window_text). All integer arithmetic — both engines agree bit-wise.

    100 TB shape: token bind → one row-local transform over a window-
    index sequence → explode. Fully narrow (no shuffle, no Python);
    output size is input·(1/stride) rows — pipelined straight into the
    shard writer.
    """
    with_toks = df.select(id_col, tokens_col(text_col).alias("_toks"))
    toks = F.col("_toks")
    n = F.size(toks)
    # extra windows past the first: ceil((n - window)/stride) via exact
    # double division of small ints (floor of an exact-k quotient is k)
    n_extra = F.when(
        n > window,
        F.floor(
            (n - window + (stride - 1)).cast("double") / F.lit(float(stride))
        ).cast("int"),
    ).otherwise(F.lit(0))
    wins = F.when(
        n > 0,
        F.transform(
            F.sequence(F.lit(0), n_extra),
            lambda i: F.struct(
                i.alias("win_idx"),
                (i * stride).alias("tok_start"),
                F.least(i * stride + window, n).alias("tok_end"),
                F.array_join(
                    F.slice(toks, i * stride + 1, window), " "
                ).alias("window_text"),
            ),
        ),
    )
    return with_toks.select(
        id_col, F.explode(wins).alias("_w")
    ).select(
        id_col,
        F.col("_w.win_idx").alias("win_idx"),
        F.col("_w.tok_start").alias("tok_start"),
        F.col("_w.tok_end").alias("tok_end"),
        (F.col("_w.tok_end") - F.col("_w.tok_start")).alias("n_win_tokens"),
        F.col("_w.window_text").alias("window_text"),
    )


# --------------------------------------------------------------------------
# Sentence segmentation (the C4 sentence-level grain)
# --------------------------------------------------------------------------

#: Sentence tiling without lookbehind (RE2 has none): a sentence is a
#: run of non-terminators followed by one-or-more terminators, or the
#: unterminated tail (\z — end of TEXT in both engines; $ would float
#: before a final newline under Java). The alternation tiles the string
#: completely, so raw-segment lengths give exact char offsets.
SENTENCE_RE = r"([^.!?]*[.!?]+|[^.!?]+\z)"


def sentence_split(df: DataFrame, text_col: str = "text",
                   id_col: str = "doc_id") -> DataFrame:
    """Sentence segmentation with exact source offsets: (id, sent_idx,
    sentence, char_start, char_end) — the grain C4's sentence-level
    dedup and policy filters operate at, with 1-based offsets into the
    ORIGINAL text (the `extract_spans` provenance discipline, so a
    downstream redaction can splice the source).

    Terminator runs (``!!``, ``...``) stay attached to their sentence;
    the unterminated tail is its own fragment; whitespace-only
    fragments are dropped (their sent_idx is consumed — indices number
    RAW segments, documented). Offsets come from one per-doc window
    sum over raw-segment lengths; the sentence itself is the trimmed
    segment with offsets advanced past leading whitespace — all exact
    integer arithmetic.

    100 TB shape: one codegen regexp_extract_all + narrow posexplode,
    then ONE window on the uniform doc key (bounded per-doc rows) —
    single shuffle, zero Python.
    """
    raw_arr = F.regexp_extract_all(
        F.coalesce(F.col(text_col), F.lit("")),
        F.lit(SENTENCE_RE), F.lit(1),
    )
    e = df.select(
        id_col, F.posexplode(raw_arr).alias("sent_idx", "_raw")
    )
    w = (
        Window.partitionBy(id_col)
        .orderBy("sent_idx")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    prev_len = F.coalesce(F.sum(F.length("_raw")).over(w), F.lit(0))
    # trim by the explicit whitespace CLASS (WS_CLASS), not trim():
    # trim strips only spaces, and a tail "\n" fragment must drop
    lead_ws = F.length(
        F.regexp_extract(F.col("_raw"), "^" + WS_CLASS, 0)
    )
    sent = F.regexp_replace(
        F.col("_raw"), f"^{WS_CLASS}|{WS_CLASS}$", ""
    )
    start = (prev_len + 1 + lead_ws).cast("int")
    out = e.select(
        id_col,
        F.col("sent_idx"),
        sent.alias("sentence"),
        start.alias("char_start"),
        (start + F.length(sent) - 1).cast("int").alias("char_end"),
    )
    return out.where(F.col("sentence") != "")


def length_histogram(df: DataFrame, text_col: str = "text",
                     id_col: str = "doc_id") -> DataFrame:
    """Corpus token-length distribution in power-of-two buckets — the
    statistic that picks training seq_len and the packing strategy
    (what fraction of docs fit one sequence, what long tail needs
    chunking). bucket = floor(log2(n_tokens)) computed EXACTLY as
    length(bin(n)) − 1 (no floating log — floor(log2) via doubles is
    off-by-one at powers of two in either engine); [lo, hi] bounds are
    exact integer shifts. Zero-token docs land in bucket −1 with
    [0, 0].

    100 TB shape: row-local bucket expression + ONE map-side-combinable
    groupBy on a ~60-value key — no skew possible (the key domain is
    log-bounded), one shuffle of ~60 rows per upstream task.
    """
    nt = F.size(tokens_col(text_col))
    bucket = F.when(nt > 0, F.length(F.bin(nt)) - 1).otherwise(
        F.lit(-1)
    ).cast("int")
    g = (
        df.select(nt.alias("__nt"), bucket.alias("bucket"))
        .groupBy("bucket")
        .agg(
            F.count("*").cast("bigint").alias("n_docs"),
            F.sum("__nt").cast("bigint").alias("sum_tokens"),
        )
    )
    lo = F.when(
        F.col("bucket") >= 0,
        F.expr("shiftleft(CAST(1 AS BIGINT), bucket)"),
    ).otherwise(F.lit(0)).cast("bigint")
    hi = F.when(
        F.col("bucket") >= 0,
        F.expr("shiftleft(CAST(1 AS BIGINT), bucket + 1)") - 1,
    ).otherwise(F.lit(0)).cast("bigint")
    return g.select(
        "bucket", lo.alias("lo_tokens"), hi.alias("hi_tokens"),
        "n_docs", "sum_tokens",
    ).orderBy("bucket")


def length_quantiles(
    df: DataFrame,
    stratum_col: str = "lang",
    value_col: str = "n_chars",
) -> DataFrame:
    """Exact per-stratum length-distribution report (the dataset-card
    table: how long are documents, per language): n_docs, min, exact
    interpolated p50/p90/p99, max. Length outliers drive truncation
    and packing policy, and the p99 tail is where books/dumps hide in
    a web crawl.

    Cross-engine exactness: Spark's `percentile` and DuckDB's
    `quantile_cont` both linearly interpolate at (n−1)·p over the
    sorted values — probed bit-identical on this host including float
    tails — and min/max/count are exact.

    100 TB shape: this is the REPORT-grain op (stratum cardinality ≈
    languages): one shuffle, but the exact percentile buffers each
    group's values on its reducer — at 10^12 rows per language swap
    `F.percentile` for `F.approx_percentile` (t-digest sketch,
    map-side combinable, bounded memory) and keep this exact form as
    the small-slice audit. The switch is one function name; schema
    and consumers are unchanged.

    Reference lineage: per-dataset shape statistics drive the gear/
    bucketing decisions (reference: mindocr/data/det_dataset.py
    column-shape accounting); this is that profile at corpus grain."""
    strat = F.coalesce(F.col(stratum_col), F.lit("und"))
    v = F.col(value_col)
    g = df.select(strat.alias("stratum"), v.alias("_v")).groupBy(
        "stratum"
    ).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.min("_v").cast("bigint").alias("min_len"),
        F.percentile(
            "_v", F.array(F.lit(0.5), F.lit(0.9), F.lit(0.99))
        ).alias("_q"),
        F.max("_v").cast("bigint").alias("max_len"),
    )
    return g.select(
        F.col("stratum").alias(stratum_col),
        "n_docs",
        "min_len",
        F.col("_q")[0].alias("p50"),
        F.col("_q")[1].alias("p90"),
        F.col("_q")[2].alias("p99"),
        "max_len",
    )


def bpe_merge_pairs(
    df: DataFrame,
    top_k: int = 50,
    text_col: str = "text",
) -> DataFrame:
    """One distributed BPE vocabulary-induction step (the Sennrich
    merge-learning inner loop at corpus scale): count every adjacent
    character pair, weighted by word frequency, and rank the top
    merge candidates — (pair, n, rank). Tokenizer training over a
    100 TB corpus starts exactly here; subsequent merge rounds re-run
    the same plan over the re-segmented symbol stream.

    Occurrences keep multiplicity within a word ("aaa" counts "aa"
    twice — BPE counts positions, not types).

    100 TB shape: the CORPUS collapses to the VOCABULARY first (one
    map-side-combinable groupBy on the word key) — pair generation
    then runs over vocab-cardinality rows × word length, orders of
    magnitude below the token stream; pair counting is a second
    map-side-combinable groupBy on the (dense, bounded — alphabet²)
    pair key, and the head is TakeOrderedAndProject, never a global
    sort. Ties rank by pair string ascending (deterministic; BMP
    strings order identically in UTF-8 bytes and UTF-16 code units —
    the tfidf tie-break precedent).

    Reference lineage: character-dictionary construction for the
    recognition head (reference: mindocr/utils/dict/ +
    rec_transforms.py:222-246 str2idx) — the learned-merge
    generalization of that fixed char vocabulary."""
    words = (
        df.select(F.explode(tokens_col(text_col)).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("freq"))
    )
    w = F.col("word")
    pairs_arr = F.when(
        F.length(w) >= 2,
        F.transform(
            F.sequence(F.lit(1), F.length(w) - 1),
            lambda i: F.substring(w, i, 2),
        ),
    ).otherwise(F.array().cast("array<string>"))
    pairs = words.select(
        F.explode(pairs_arr).alias("pair"), "freq"
    )
    counts = pairs.groupBy("pair").agg(
        F.sum("freq").cast("bigint").alias("n")
    )
    top = counts.orderBy(F.col("n").desc(), F.col("pair").asc()).limit(
        top_k
    )
    rw = Window.orderBy(F.col("n").desc(), F.col("pair").asc())
    return top.select(
        "pair", "n", F.row_number().over(rw).cast("int").alias("rank")
    )


#: Symbol-wrapping sentinels for iterative BPE: every symbol is stored
#: as  \x01 sym \x02  inside the word's segmentation string, so ONE
#: plain-string replace() of '\x01a\x02\x01b\x02' → '\x01ab\x02' IS the
#: exact BPE merge rule — left-to-right, non-overlapping, consecutive
#: runs merged pairwise ('aaaa' → 'aa','aa') — identically in Spark and
#: DuckDB (both replace left-to-right). Control chars cannot occur in
#: whitespace-tokenized words.
BPE_S = "\x01"
BPE_E = "\x02"


def bpe_learn_merges(
    df: DataFrame,
    n_merges: int = 6,
    text_col: str = "text",
) -> DataFrame:
    """Iterative BPE vocabulary induction (Sennrich et al. 2016): run
    `n_merges` full merge-learning rounds over the corpus and return
    the learned merge table — (step, a, b, merged, n), the artifact a
    tokenizer trainer ships. Extends `bpe_merge_pairs` (ONE candidate
    ranking) to the real training loop: each round counts adjacent
    SYMBOL pairs (freq-weighted, position multiplicity), picks the
    winner (max n, tie (a, b) ascending), and re-segments every word
    by merging the winner's non-overlapping occurrences left-to-right.

    100 TB shape: the corpus collapses to the VOCABULARY once (one
    map-side-combinable groupBy on the word key) — every subsequent
    round runs at vocab × word-length cardinality, orders of magnitude
    below the token stream (the `bpe_merge_pairs` discipline). Per
    round: one narrow pair-explode + one groupBy on the bounded
    symbol-pair key + a 1-row TakeOrderedAndProject winner; the
    re-segmentation is one broadcast crossJoin + replace() (narrow).
    Both the winner and the re-segmented vocabulary are
    localCheckpoint-ed, so plan growth per round is constant (the
    connected_components discipline) and the output is a flat union
    of n_merges 1-row frames.

    Reference lineage: character-dictionary construction for the
    recognition head (reference: mindocr/utils/dict/ +
    mindocr/data/transforms/rec_transforms.py:222-246 str2idx),
    generalized to the learned-merge loop."""
    if n_merges < 1:
        raise ValueError(f"need n_merges ≥ 1, got {n_merges}")
    vocab = (
        df.select(F.explode(tokens_col(text_col)).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("freq"))
        .select(
            F.regexp_replace(
                F.col("word"), "(.)", BPE_S + "$1" + BPE_E
            ).alias("w"),
            "freq",
        )
        .localCheckpoint()
    )
    steps = []
    for step in range(1, n_merges + 1):
        syms = F.split(
            F.substring(F.col("w"), 2, F.length("w") - 2),
            BPE_E + BPE_S,
        )
        pairs_arr = F.when(
            F.size(syms) >= 2,
            F.transform(
                F.sequence(F.lit(1), F.size(syms) - 1),
                lambda i: F.struct(
                    F.element_at(syms, i).alias("a"),
                    F.element_at(syms, i + 1).alias("b"),
                ),
            ),
        ).otherwise(
            F.array().cast("array<struct<a:string,b:string>>")
        )
        winner = (
            vocab.select(F.explode(pairs_arr).alias("p"), "freq")
            .groupBy(F.col("p.a").alias("a"), F.col("p.b").alias("b"))
            .agg(F.sum("freq").cast("bigint").alias("n"))
            .orderBy(F.col("n").desc(), F.col("a").asc(),
                     F.col("b").asc())
            .limit(1)
            .localCheckpoint()
        )
        steps.append(
            winner.select(
                F.lit(step).cast("int").alias("step"),
                "a", "b",
                F.concat("a", "b").alias("merged"),
                "n",
            )
        )
        if step < n_merges:
            vocab = (
                vocab.crossJoin(F.broadcast(winner))
                .select(
                    F.replace(
                        F.col("w"),
                        F.concat(F.lit(BPE_S), F.col("a"), F.lit(BPE_E),
                                 F.lit(BPE_S), F.col("b"), F.lit(BPE_E)),
                        F.concat(F.lit(BPE_S), F.col("a"), F.col("b"),
                                 F.lit(BPE_E)),
                    ).alias("w"),
                    "freq",
                )
                .localCheckpoint()
            )
    from functools import reduce

    return reduce(DataFrame.union, steps)


def bpe_segment_counts(
    df: DataFrame,
    merges: list[tuple[str, str]],
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """APPLY a learned BPE merge table (ordered, as produced by
    `bpe_learn_merges` or exported from any tokenizer trainer): segment
    every word by replaying the merges in order and report per-doc
    tokenizer pricing — (id, n_words, n_bpe_tokens, bpe_per_word).
    The learned-vocabulary counterpart of `bpe_token_cols`' fixed
    estimator: this is the number a trained tokenizer actually charges.

    Merge replay uses the `bpe_learn_merges` sentinel representation:
    each merge is ONE plain-string replace() on the wrapped
    segmentation — exact left-to-right non-overlapping application,
    chained in merge order inside a single narrow projection.

    100 TB shape: the corpus collapses to the VOCABULARY once (one
    map-side-combinable groupBy), the merge chain runs at vocab
    cardinality (len(merges) chained replaces, all codegen), and the
    per-doc counts come from ONE token-keyed join + one doc-key
    groupBy — the corpus-sized work is exactly one explode and two
    uniform-key shuffles regardless of merge-table size.

    Reference analog: str2idx applying the FIXED character dictionary
    per sample (reference:
    mindocr/data/transforms/rec_transforms.py:222-246), with the
    dictionary replaced by a learned merge list."""
    if not merges:
        raise ValueError("empty merge table")
    for a, b in merges:
        if not a or not b:
            raise ValueError(f"empty merge side in {(a, b)!r}")
    toks = (
        df.select(F.col(id_col).alias("__id"),
                  F.explode(tokens_col(text_col)).alias("word"))
    )
    vocab = toks.groupBy("word").agg(F.count(F.lit(1)).alias("__n"))
    seg: Column = F.regexp_replace(
        F.col("word"), "(.)", BPE_S + "$1" + BPE_E
    )
    for a, b in merges:
        seg = F.replace(
            seg,
            F.lit(BPE_S + a + BPE_E + BPE_S + b + BPE_E),
            F.lit(BPE_S + a + b + BPE_E),
        )
    segmented = vocab.select(
        "word",
        F.size(
            F.split(F.substring(seg, 2, F.length(seg) - 2),
                    BPE_E + BPE_S)
        ).alias("n_sym"),
    )
    per_doc = (
        toks.join(segmented, "word")
        .groupBy("__id")
        .agg(
            F.count(F.lit(1)).alias("n_words"),
            F.sum("n_sym").alias("n_bpe"),
        )
    )
    return (
        df.select(F.col(id_col).alias("__id"))
        .join(per_doc, "__id", "left")
        .select(
            F.col("__id").alias(id_col),
            F.coalesce("n_words", F.lit(0)).cast("bigint")
            .alias("n_words"),
            F.coalesce("n_bpe", F.lit(0)).cast("bigint")
            .alias("n_bpe_tokens"),
            F.when(
                F.col("n_words") > 0,
                F.round(
                    F.col("n_bpe").cast("double")
                    / F.col("n_words").cast("double"),
                    6,
                ),
            ).alias("bpe_per_word"),
        )
    )


def para_lang_segments(df: DataFrame, text_col: str = "text",
                       id_col: str = "doc_id") -> DataFrame:
    """Paragraph-grain language/script segmentation — the CCNet grain:
    language ID over a whole mixed-language page mislabels every
    minority-language paragraph, so curation segments on blank lines
    FIRST and classifies each paragraph independently (CCNet runs its
    LM gate per paragraph for exactly this reason). Returns one row
    per paragraph: (doc_id, para_idx 0-based, n_chars, main_script),
    where main_script is the argmax of the SCRIPT_CLASSES character
    counts (ties broken by class order; 'none' when unscripted) —
    the per-paragraph analog of :func:`script_mix_cols`.

    100 TB shape: one split + narrow posexplode + one regexp_count
    per script class, all codegen on the scan — zero shuffles, zero
    Python; downstream doc-grain re-aggregation is the caller's one
    groupBy on the doc key.

    Reference lineage: det splits the page into regions FIRST and rec
    classifies each region independently
    (reference: tools/infer/text/predict_system.py:72-90) — same
    segment-then-classify split at the text layer.
    """
    paras = df.select(
        id_col,
        F.posexplode(F.split(F.coalesce(F.col(text_col), F.lit("")),
                             r"\n\n")).alias("para_idx", "para"),
    )
    counts = [(name, F.regexp_count(F.col("para"), F.lit(cls)))
              for name, cls in SCRIPT_CLASSES]
    best = F.greatest(*[c for _, c in counts])
    main = F.when(best == 0, F.lit("none"))
    for name, c in counts:
        main = main.when(c == best, F.lit(name))
    return paras.select(
        id_col,
        F.col("para_idx").cast("bigint").alias("para_idx"),
        F.length("para").cast("bigint").alias("n_chars"),
        main.alias("main_script"),
    )


#: Credit-card candidate pattern — four 4-digit groups with optional
#: single '-'/' ' separators. Shared constant: Java regex and RE2 read
#: \b and the class identically; the oracle extracts with the same
#: bytes and validates with its own hand-rolled Luhn.
CC_CAND_RE = r"\b[0-9]{4}[- ]?[0-9]{4}[- ]?[0-9]{4}[- ]?[0-9]{4}\b"


def luhn_cc_cols(df: DataFrame, text_col: str = "text",
                 id_col: str = "doc_id") -> DataFrame:
    """Luhn-validated credit-card detection — the validation step a
    real PII pipeline runs after the cheap regex: 16-digit lookalikes
    (order numbers, timestamps, phone pairs) are ~90% of regex hits,
    and the mod-10 check cuts them before a document is flagged or
    redacted. Per doc: ``n_candidates`` (regex hits), ``n_valid``
    (hits whose digit string passes Luhn), ``has_cc_pii`` =
    ``n_valid > 0``.

    100 TB shape: one codegen ``regexp_extract_all`` + row-local
    higher-order filter calling the JVM ``luhn_check`` builtin — zero
    shuffles, zero Python; the oracle reimplements Luhn as list
    arithmetic, so the check itself is cross-verified, not assumed.

    Reference lineage: validate_det_res discards candidate regions
    that fail geometric sanity checks before downstream stages trust
    them (reference: mindocr/postprocess/det_base_postprocess.py) —
    same detect-then-validate split for PII candidates.
    """
    cands = F.regexp_extract_all(
        F.coalesce(F.col(text_col), F.lit("")), F.lit(CC_CAND_RE), F.lit(0)
    )
    digits = F.transform(
        cands, lambda c: F.regexp_replace(c, "[^0-9]", "")
    )
    valid = F.filter(
        digits, lambda d: F.call_function("luhn_check", d)
    )
    n_cand = F.size(cands)
    n_valid = F.size(valid)
    return df.select(
        id_col,
        n_cand.cast("bigint").alias("n_candidates"),
        n_valid.cast("bigint").alias("n_valid"),
        (n_valid > 0).alias("has_cc_pii"),
    )


#: The confusable trio — scripts whose glyphs render near-identically
#: in most fonts (latin/cyrillic/greek), so a single token mixing them
#: is the homoglyph-spoofing signature. CJK/arabic mixing with latin is
#: NORMAL text (loanwords, units) and must not flag.
CONFUSABLE_CLASSES: tuple[str, ...] = (
    SCRIPT_CLASSES[0][1],   # latin
    SCRIPT_CLASSES[1][1],   # cyrillic
    SCRIPT_CLASSES[2][1],   # greek
)


def homoglyph_cols(df: DataFrame, text_col: str = "text",
                   id_col: str = "doc_id") -> DataFrame:
    """Token-grain homoglyph (mixed-confusable-script) detection — the
    phishing/SEO-spoof signal doc-grain script composition can't see:
    a page that is 99% latin with one 'pаypal' (cyrillic а) token has
    an innocent doc-level histogram, but that single mixed token is
    the attack. A token counts as mixed when it contains characters
    from ≥ 2 of the confusable trio (latin/cyrillic/greek); PURE
    foreign tokens are normal multilingual text and do not flag.

    Per doc: n_tokens, n_mixed, spoof = n_mixed > 0.

    100 TB shape: one tokenization + a row-local higher-order filter
    of three `rlike` probes per token — zero shuffles, zero Python,
    no explode (the token array never leaves the row).
    """
    toks = tokens_col(text_col)
    def _mixed(t):
        hits = sum(
            t.rlike(cls).cast("int") for cls in CONFUSABLE_CLASSES
        )
        return hits >= 2
    n_mixed = F.size(F.filter(toks, _mixed))
    return df.select(
        id_col,
        F.size(toks).cast("bigint").alias("n_tokens"),
        n_mixed.cast("bigint").alias("n_mixed"),
        (n_mixed > 0).alias("spoof"),
    )


# --------------------------------------------------------------------------
# S-stemmer (Harman 1991) — suffix-rule vocabulary collapse
# --------------------------------------------------------------------------

#: Harman's S-stemmer: three ordered suffix rules, FIRST match wins,
#: at most one rule fires per word. (suffix, exception-suffixes,
#: replacement). The classic low-risk IR stemmer — unlike Porter it
#: never touches derivational morphology, so it is safely expressible
#: as a pure CASE chain shared verbatim by both engines (the SQL twin
#: is RENDERED from this constant — zero drift possible).
S_STEM_RULES = (
    ("ies", ("eies", "aies"), "y"),
    ("es", ("aes", "ees", "oes"), "e"),
    ("s", ("us", "ss"), ""),
)


def s_stem_col(c: Column | str) -> Column:
    """Apply the S-stemmer to one (already lower-cased) token column.
    Row-local CASE chain — whole-stage codegen, zero shuffles."""
    w = F.col(c) if isinstance(c, str) else c
    result = None
    for suf, exceptions, rep in S_STEM_RULES:
        # a rule only fires on words LONGER than its suffix — a bare
        # 's'/'es'/'ies' token must never stem to the empty string
        cond = w.endswith(suf) & (F.length(w) > len(suf))
        for exc in exceptions:
            cond = cond & ~w.endswith(exc)
        stemmed = F.concat(
            w.substr(F.lit(1), F.length(w) - F.lit(len(suf))),
            F.lit(rep),
        )
        result = (
            result.when(cond, stemmed)
            if result is not None
            else F.when(cond, stemmed)
        )
    return result.otherwise(w)


def s_stem_sql(expr: str) -> str:
    """DuckDB CASE-chain twin of `s_stem_col`, rendered from the SAME
    `S_STEM_RULES` constant."""
    parts = ["CASE"]
    for suf, exceptions, rep in S_STEM_RULES:
        conds = [
            f"ends_with({expr}, '{suf}')",
            f"length({expr}) > {len(suf)}",
        ] + [
            f"NOT ends_with({expr}, '{exc}')" for exc in exceptions
        ]
        parts.append(
            " WHEN " + " AND ".join(conds)
            + f" THEN substr({expr}, 1, length({expr}) - {len(suf)})"
            + f" || '{rep}'"
        )
    parts.append(f" ELSE {expr} END")
    return "".join(parts)


def stem_stats(
    df: DataFrame, text_col: str = "text", lang_col: str = "lang"
) -> DataFrame:
    """Per-language vocabulary-collapse audit for the S-stemmer:
    (lang, n_tokens, n_types, n_stems, reduction) where reduction =
    (n_types − n_stems) / n_types — how much of the surface vocabulary
    the three suffix rules fold together. The dataset-card number that
    says whether stemming is worth a pipeline stage for a language
    (English collapses hard; isolating languages barely move).

    100 TB shape: one narrow tokenize-explode (no window, no Python),
    stemming is a row-local codegen CASE, then ONE groupBy at language
    cardinality — Spark rewrites the two DISTINCT aggregates into
    expand + two-phase partial aggregation, so the (lang, token) grain
    collapses map-side before the wire. NULL langs bucket 'und' (the
    token_fertility discipline)."""
    toks = df.select(
        F.coalesce(F.col(lang_col), F.lit("und")).alias("lang"),
        F.explode(tokens_col(text_col)).alias("raw"),
    ).select("lang", F.lower("raw").alias("tok"))
    t = toks.select("lang", "tok", s_stem_col("tok").alias("stem"))
    n_types = F.count_distinct("tok")
    n_stems = F.count_distinct("stem")
    return t.groupBy("lang").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_tokens"),
        n_types.cast("bigint").alias("n_types"),
        n_stems.cast("bigint").alias("n_stems"),
        F.round(
            (n_types - n_stems).cast("double") / n_types.cast("double"),
            6,
        ).alias("reduction"),
    )


def symspell_corrections(
    df: DataFrame,
    token_col: str = "token",
    min_len: int = 4,
    max_len: int = 24,
    freq_ratio: int = 10,
    max_bucket: int = 1_000,
) -> DataFrame:
    """SymSpell-style vocabulary correction (Garbe's deletion-
    neighborhood blocking): map each rare token to the dominant
    vocabulary token within Levenshtein distance 1 — the classic OCR /
    crawl-noise post-correction pass (the distributed analog of the
    reference's dictionary-constrained decode,
    reference: mindocr/postprocess/rec_postprocess.py:13-27, which
    snaps recognized sequences onto a character dictionary; here the
    dictionary is the corpus's own frequency mass).

    Candidate generation is the SymSpell identity: two tokens are
    within edit distance 1 only if they share a member of
    {token} ∪ deletions1(token), so the all-pairs comparison collapses
    to a self-join on deletion keys. Correction rule: candidate count
    must dominate by ``freq_ratio``× (a typo is RARE next to its
    source), verified by exact ``levenshtein() <= 1``; best candidate
    per token by (count desc, token asc) — deterministic.

    Returns (token, cnt, correction, correction_cnt), one row per
    corrected token.

    100 TB shape: everything after the first count groupBy runs at
    VOCABULARY grain (≪ corpus; Heaps' law caps V at tens of millions
    for 10^12 docs). The deletion explode is row-local and bounded by
    ``max_len+1`` keys/token; the self-join shuffles on the deletion
    key whose hot buckets (short tokens' shared neighborhoods) are
    dropped by the mirrored ``max_bucket`` cap; the length window
    [min_len, max_len] bounds both the explode factor and the
    neighborhood density. No Python anywhere."""
    if not 2 <= min_len <= max_len:
        raise ValueError("need 2 <= min_len <= max_len")
    if freq_ratio < 1:
        raise ValueError("freq_ratio must be >= 1")
    if max_bucket < 2:
        raise ValueError("max_bucket must be >= 2 (a pair needs room)")
    vocab = (
        df.where(F.col(token_col).isNotNull())
        .where(F.length(token_col).between(min_len, max_len))
        .groupBy(F.col(token_col).alias("tok"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
    )
    keys = vocab.select(
        "tok",
        "cnt",
        F.explode(
            F.array_distinct(
                F.concat(
                    F.array(F.col("tok")),
                    F.expr(
                        "transform(sequence(1, length(tok)), i -> "
                        "concat(substr(tok, 1, i - 1), "
                        "substr(tok, i + 1, length(tok))))"
                    ),
                )
            )
        ).alias("key"),
    )
    kb = (
        keys.withColumn(
            "_b", F.count(F.lit(1)).over(Window.partitionBy("key"))
        )
        .where(F.col("_b") <= max_bucket)
        .drop("_b")
    )
    cand = kb.select(
        F.col("tok").alias("cand"),
        F.col("cnt").alias("cand_cnt"),
        "key",
    )
    pairs = (
        kb.join(cand, "key")
        .where(
            (F.col("cand") != F.col("tok"))
            & (F.col("cand_cnt") >= F.lit(freq_ratio) * F.col("cnt"))
        )
        .select(
            F.col("tok").alias("token"),
            "cnt",
            "cand",
            "cand_cnt",
        )
        .distinct()
        .where(F.levenshtein("token", "cand") <= 1)
    )
    best = Window.partitionBy("token").orderBy(
        F.col("cand_cnt").desc(), F.col("cand").asc()
    )
    return (
        pairs.withColumn("_rn", F.row_number().over(best))
        .where(F.col("_rn") == 1)
        .select(
            "token",
            "cnt",
            F.col("cand").alias("correction"),
            F.col("cand_cnt").alias("correction_cnt"),
        )
    )


def bleu_corpus(
    df: DataFrame,
    ref_col: str = "ref",
    hyp_col: str = "hyp",
    id_col: str = "doc_id",
    max_n: int = 4,
) -> DataFrame:
    """Corpus-level BLEU (Papineni 2002) between a reference and a
    hypothesis text column — the standard extraction-quality /
    translation-quality score (the corpus-grain sibling of the
    reference's per-sample rec metrics,
    reference: mindocr/metrics/rec_metrics.py:11-152): clipped n-gram
    precision p_n for n = 1..max_n, brevity penalty, and the geometric
    mean. Returns ONE row: (ref_len, hyp_len, m{n}, t{n}, p{n} per n,
    brevity_penalty, bleu). bleu is 0.0 when any order has zero
    matches (the standard convention) or the hypothesis is empty; p_n
    is NULL where that order has no hypothesis n-grams.

    Exactness discipline: clipped matches and totals are exact BIGINTs
    (per-doc min(count_hyp, count_ref) summed); each p_n is one IEEE
    division; each ln(p_n) is 9dp-quantized → DECIMAL-summed
    (order-free ln idiom) → /max_n; exp and the brevity exponent are
    9dp-quantized so the final product multiplies two cross-engine-
    identical doubles.

    100 TB shape: n-gram generation is ONE row-local expression
    (array-of-struct flatten, no join, no Python); hyp and ref counts
    are two map-side-combinable groupBys at (doc, n, gram) grain
    joined on their own co-partitioned key; everything after is at
    n-grain (≤ max_n rows)."""
    if not 1 <= max_n <= 8:
        raise ValueError("max_n must be in [1, 8]")
    t = df.select(
        F.col(id_col).alias("doc"),
        tokens_col(ref_col).alias("r"),
        tokens_col(hyp_col).alias("h"),
    )

    def grams(col: str) -> Column:
        empty = "CAST(array() AS ARRAY<STRUCT<n: INT, gram: STRING>>)"
        return F.expr(
            f"flatten(transform(sequence(1, {max_n}), n -> "
            f"CASE WHEN size({col}) >= n THEN "
            f"transform(sequence(1, size({col}) - n + 1), i -> "
            f"named_struct('n', n, 'gram', "
            f"concat_ws(' ', slice({col}, i, n)))) "
            f"ELSE {empty} END))"
        )

    def counts(col: str, out: str) -> DataFrame:
        return (
            t.select("doc", F.explode(grams(col)).alias("g"))
            .select("doc", "g.n", "g.gram")
            .groupBy("doc", "n", "gram")
            .agg(F.count(F.lit(1)).cast("bigint").alias(out))
        )

    j = counts("h", "ch").join(
        counts("r", "cr"), ["doc", "n", "gram"], "left"
    )
    per_n = (
        j.select(
            "n",
            "ch",
            F.least("ch", F.coalesce("cr", F.lit(0))).alias("m"),
        )
        .groupBy("n")
        .agg(
            F.sum("m").cast("bigint").alias("matches"),
            F.sum("ch").cast("bigint").alias("total"),
        )
    )
    wide = per_n.agg(
        *[
            c
            for n in range(1, max_n + 1)
            for c in (
                F.coalesce(
                    F.sum(F.when(F.col("n") == n, F.col("matches"))),
                    F.lit(0),
                )
                .cast("bigint")
                .alias(f"m{n}"),
                F.coalesce(
                    F.sum(F.when(F.col("n") == n, F.col("total"))),
                    F.lit(0),
                )
                .cast("bigint")
                .alias(f"t{n}"),
            )
        ]
    )
    lens = t.agg(
        F.coalesce(F.sum(F.size("r")), F.lit(0))
        .cast("bigint")
        .alias("ref_len"),
        F.coalesce(F.sum(F.size("h")), F.lit(0))
        .cast("bigint")
        .alias("hyp_len"),
    )
    base = lens.crossJoin(wide)

    def p(n: int) -> Column:
        return F.when(
            F.col(f"t{n}") > 0,
            F.col(f"m{n}").cast("double") / F.col(f"t{n}").cast("double"),
        )

    valid = F.col("hyp_len") > 0
    for n in range(1, max_n + 1):
        valid = valid & (F.col(f"m{n}") > 0)
    log_terms = [
        F.round(F.log(p(n)), 9).cast("decimal(28,9)")
        for n in range(1, max_n + 1)
    ]
    log_sum = log_terms[0]
    for term in log_terms[1:]:
        log_sum = log_sum + term
    gm = F.round(
        F.exp(log_sum.cast("double") / F.lit(float(max_n))), 9
    )
    bp = (
        F.when(F.col("hyp_len") == 0, F.lit(None).cast("double"))
        .when(F.col("hyp_len") >= F.col("ref_len"), F.lit(1.0))
        .otherwise(
            F.round(
                F.exp(
                    F.lit(1.0)
                    - F.col("ref_len").cast("double")
                    / F.col("hyp_len").cast("double")
                ),
                9,
            )
        )
    )
    return base.select(
        "ref_len",
        "hyp_len",
        *[
            c
            for n in range(1, max_n + 1)
            for c in (
                F.col(f"m{n}"),
                F.col(f"t{n}"),
                p(n).alias(f"p{n}"),
            )
        ],
        bp.alias("brevity_penalty"),
        F.when(valid, bp * gm).otherwise(F.lit(0.0)).alias("bleu"),
    )


def texttile_boundaries(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k_tiles: int = 8,
    w: int = 2,
) -> DataFrame:
    """TextTiling topic segmentation (Hearst, CL 1997), the
    deterministic valley-detection variant: tile the document into
    ``k_tiles`` equal character tiles (the textrank_summary oracle
    discipline — fixed substr tiling keeps the cross-engine twin
    tractable), build block term-frequency vectors of ``w`` tiles on
    each side of every gap, and mark a gap as a topic BOUNDARY when
    its block cosine similarity is a STRICT LOCAL MINIMUM — the core
    of Hearst's depth-score rule without the corpus-level
    mean−σ threshold (which would put engine stddev IEEE folds inside
    a decision). The segmentation grain feeds RAG-style chunking:
    split long pages at topic valleys instead of mid-argument.

    Exactness: similarity NEVER materializes as a float. Each gap
    carries exact BIGINT (dot, na, nb) — block dot product and
    squared norms — and valley tests compare
    dot_i²·na_j·nb_j vs dot_j²·na_i·nb_i. The products ride
    pinned-association DOUBLE multiplies ((d·d)·na)·nb — IEEE
    multiplication is correctly rounded, so both engines compute
    bit-identical values even past 2^53 (document-scale blocks), and
    the BIGINT evidence columns stay exact in the output.

    100 TB shape: tiling + tokenization are row-local codegen; tf is
    one groupBy at (doc, tile, token) grain; each token row fans out
    to ≤ 2w gap-side pairs (a narrow explode, no window); dot/norms
    are one aggregation at (doc, gap) grain; the valley test is ONE
    lag/lead window per doc over ≤ k_tiles rows. No step's width
    depends on document count — only on k_tiles.

    Reference analog: region proposal → boundary refinement
    (reference: mindocr/postprocess/det_db_postprocess.py — threshold
    map valleys separate text regions); here the valley is lexical."""
    if k_tiles < 2 * w + 1:
        raise ValueError(f"need k_tiles ≥ {2 * w + 1}, got {k_tiles}")
    n = F.length(text_col)
    q = F.floor(n / k_tiles).cast("int")
    tiles = df.select(
        F.col(id_col).alias("doc"),
        F.posexplode(
            F.array(*[
                F.when(
                    F.lit(i) < k_tiles - 1,
                    F.substring(F.col(text_col), F.lit(1) + F.lit(i) * q,
                                q),
                ).otherwise(
                    F.substring(F.col(text_col),
                                F.lit(1) + F.lit(k_tiles - 1) * q,
                                (n - (k_tiles - 1) * q).cast("int"))
                )
                for i in range(k_tiles)
            ])
        ).alias("tid", "tile"),
    )
    norm = F.trim(
        F.regexp_replace("tile", r"[ \t\n\r\f\x0B]+", " "))
    toks = tiles.select(
        "doc", "tid",
        F.explode(
            F.when(norm == "", F.array().cast("array<string>"))
            .otherwise(F.split(norm, " "))
        ).alias("token"),
    )
    tf = toks.groupBy("doc", "tid", "token").agg(
        F.count("*").alias("tf"))
    # token at tile t feeds the A-block of gaps {t+1..t+w} and the
    # B-block of gaps {t-w+1..t}, clipped to full-window gaps [w, k-w]
    lo, hi = w, k_tiles - w
    ga = tf.select(
        "doc", "token", "tf",
        F.explode(F.array(*[F.col("tid") + i
                            for i in range(1, w + 1)])).alias("g"),
    ).where((F.col("g") >= lo) & (F.col("g") <= hi))
    gb = tf.select(
        "doc", "token", "tf",
        F.explode(F.array(*[F.col("tid") - i
                            for i in range(0, w)])).alias("g"),
    ).where((F.col("g") >= lo) & (F.col("g") <= hi))
    tfa = ga.groupBy("doc", "g", "token").agg(F.sum("tf").alias("tfa"))
    tfb = gb.groupBy("doc", "g", "token").agg(F.sum("tf").alias("tfb"))
    dots = (
        tfa.join(tfb, ["doc", "g", "token"])
        .groupBy("doc", "g")
        .agg(F.sum(F.col("tfa") * F.col("tfb")).alias("dot"))
    )
    na = tfa.groupBy("doc", "g").agg(
        F.sum(F.col("tfa") * F.col("tfa")).alias("na"))
    nb = tfb.groupBy("doc", "g").agg(
        F.sum(F.col("tfb") * F.col("tfb")).alias("nb"))
    spine = df.select(F.col(id_col).alias("doc")).distinct().crossJoin(
        df.sparkSession.range(lo, hi + 1).select(
            F.col("id").cast("int").alias("g"))
    )
    z = F.lit(0).cast("bigint")
    gaps = (
        spine.join(dots, ["doc", "g"], "left")
        .join(na, ["doc", "g"], "left")
        .join(nb, ["doc", "g"], "left")
        .select(
            "doc", "g",
            F.coalesce("dot", z).alias("dot"),
            F.coalesce("na", z).alias("na"),
            F.coalesce("nb", z).alias("nb"),
        )
    )
    wd = Window.partitionBy("doc").orderBy("g")

    def dbl(c):
        return F.col(c).cast("double")

    def sim_lt(d1, a1, b1, d2, a2, b2):
        """sim1 < sim2 via cross-multiplication, pinned association."""
        return ((dbl(d1) * dbl(d1)) * dbl(a2)) * dbl(b2) < (
            (dbl(d2) * dbl(d2)) * dbl(a1)) * dbl(b1)

    out = (
        gaps.withColumn("pd", F.lag("dot").over(wd))
        .withColumn("pa", F.lag("na").over(wd))
        .withColumn("pb", F.lag("nb").over(wd))
        .withColumn("nd", F.lead("dot").over(wd))
        .withColumn("xa", F.lead("na").over(wd))
        .withColumn("xb", F.lead("nb").over(wd))
    )
    is_b = (
        F.col("pd").isNotNull() & F.col("nd").isNotNull()
        & sim_lt("dot", "na", "nb", "pd", "pa", "pb")
        & sim_lt("dot", "na", "nb", "nd", "xa", "xb")
    )
    return out.select(
        F.col("doc").alias(id_col),
        F.col("g").cast("bigint").alias("gap"),
        "dot", "na", "nb",
        is_b.alias("is_boundary"),
    )


#: Pinned WordPiece vocabulary (initial pieces / ##continuations).
#: Single letters appear in BOTH forms so every lowercase word is
#: coverable (no [UNK] dead ends); the multi-character pieces make
#: greedy longest-match non-trivial on the corpus vocabulary.
WORDPIECE_INITIAL = tuple(
    [chr(c) for c in range(ord("a"), ord("z") + 1)]
    + [str(d) for d in range(10)] + ["~"]
    + ["ha", "me", "ta", "sc", "wi", "so", "cu", "st", "va", "ve",
       "gr", "qu", "fi", "jo", "or", "ba", "sm", "sl", "fa", "bi",
       "ke", "li", "ro", "co", "da", "du", "ag", "pa", "sp"]
)
WORDPIECE_CONT = tuple(
    [chr(c) for c in range(ord("a"), ord("z") + 1)]
    + [str(d) for d in range(10)] + ["~"]
    + ["sh", "rge", "ble", "an", "ndow", "rt", "ream", "lue", "ctor",
       "oup", "ery", "lter", "in", "der", "tch", "all", "ow", "ta",
       "lumn", "mer", "rk", "ue"]
)


def wordpiece_apply(
    df: DataFrame,
    text_col: str = "text",
    initial: tuple[str, ...] = WORDPIECE_INITIAL,
    cont: tuple[str, ...] = WORDPIECE_CONT,
    max_iters: int = 64,
) -> DataFrame:
    """WordPiece greedy longest-match tokenization (the BERT-family
    tokenizer, complementing the Sennrich BPE stack): each distinct
    corpus word is segmented left-to-right, always taking the LONGEST
    vocabulary piece at the cursor — initial pieces at position 1,
    ``##``-continuation pieces after. Returns one row per distinct
    word: (word, n_pieces, pieces) — the vocabulary-pricing relation
    (how many subwords the tokenizer charges for each surface form).

    Greedy selection is set-based, not per-row Python: one iteration
    per consumed piece, each a BROADCAST substring-match join of the
    active cursor states against the vocabulary + a max_by(piece,
    length) pick (two pieces of equal length matching the same cursor
    are the same string, so the pick is deterministic); states
    localCheckpoint per round so the plan stays constant-size. A word
    whose cursor strands (no piece matches) raises — with single
    characters in both vocab halves that is unreachable, and the
    guard keeps a vocabulary edit from silently dropping words.

    100 TB shape: segmentation runs at DISTINCT-WORD grain (Heaps-law
    sublinear in corpus size, the `bpe_vocab` discipline) — the
    corpus-wide explode collapses to the word dictionary first;
    iterations are bounded by the longest word, not by corpus size."""
    spark = df.sparkSession
    toks = tokens_col(text_col)
    words = df.select(F.explode(toks).alias("word")).where(
        F.col("word") != "").distinct().localCheckpoint()
    n_words = words.count()
    voc = spark.createDataFrame(
        [(p, False) for p in dict.fromkeys(initial)]
        + [(p, True) for p in dict.fromkeys(cont)],
        "piece string, pcont boolean",
    )
    state = words.select(
        "word",
        F.lit(1).alias("pos"),
        F.lit("").alias("pieces"),
        F.lit(0).alias("n"),
    )
    finished = []
    rounds = 0
    while True:
        done = state.where(F.col("pos") > F.length("word"))
        if not done.isEmpty():
            finished.append(done.localCheckpoint())
        active = state.where(
            F.col("pos") <= F.length("word")).localCheckpoint()
        if active.isEmpty():
            break
        # bound check AFTER the done-collection: a word consuming its
        # final piece in round max_iters must still be collected
        if rounds >= max_iters:
            raise ValueError(f"word longer than {max_iters} pieces")
        rounds += 1
        cands = active.join(
            F.broadcast(voc),
            (F.col("pcont") == (F.col("pos") > 1))
            & (F.expr("substring(word, pos, length(piece))")
               == F.col("piece")),
        )
        state = (
            cands.groupBy("word", "pos", "pieces", "n")
            .agg(F.max_by("piece", F.length("piece")).alias("m"))
            .select(
                "word",
                (F.col("pos") + F.length("m")).alias("pos"),
                F.concat(
                    "pieces",
                    F.when(F.col("pos") == 1, F.col("m"))
                    .otherwise(F.concat(F.lit("##"), F.col("m"))),
                    F.lit(" "),
                ).alias("pieces"),
                (F.col("n") + 1).alias("n"),
            )
            .localCheckpoint()
        )
    from functools import reduce

    out = reduce(DataFrame.union, finished) if finished else state.limit(0)
    out = out.select(
        "word",
        F.col("n").cast("bigint").alias("n_pieces"),
        F.rtrim(F.col("pieces")).alias("pieces"),
    )
    if out.count() != n_words:
        raise ValueError(
            "vocabulary cannot cover every word (stranded cursor)")
    return out

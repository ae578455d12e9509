"""embed — in-engine deterministic text→vector featurizer.

Closes the extract→embed→dedup loop: every similarity-family operator
(semdedup, ANN top-k, embedding near-dup, cluster mixing) previously
consumed a pre-made ``embeddings`` table; this module PRODUCES a vector
from the engine's own extracted text, so a curation pipeline can run
end-to-end inside the engine.

The featurizer is a hashed bag-of-words random projection — the
SimHash vote vector left UN-thresholded, then L2-normalized:

1. whitespace tokens of the normalized text (the repo-wide
   ``tokens_col`` discipline — one shared tokenizer, one DuckDB twin);
2. each token hashed ONCE with md5 (bit-identical in every engine —
   the ``simhash_md5`` family's portability rule); bit j of the digest
   is the token's pinned ±1 projection coefficient for output
   dimension j (a deterministic random-projection row, the same
   "pinned planes, no RNG state" discipline as
   ``similarity._planes``);
3. e_j = Σ_tokens (2·bit_j − 1) — integer votes, EXACT (term
   frequency weighting: each occurrence votes);
4. L2-normalize: e_j / sqrt(Σ e²). The sum of squares is computed in
   int64 (exact); sqrt and the division are single correctly-rounded
   IEEE ops — so the output doubles are BIT-IDENTICAL across engines,
   no DECIMAL quantization needed. All-zero votes (blank doc, or full
   cancellation) → the zero vector, never a divide-by-zero.

Johnson–Lindenstrauss gives the usual guarantee: cosine between these
vectors estimates the cosine between the (2^64-dim) hashed-BOW vectors
with error O(1/√dim). dim ≤ 128 rides one md5 per token.

100 TB shape: the whole featurizer is NARROW — one codegen md5 per
token (JVM-side, inside the transform HOF) and one Arrow-batched
numpy fold per row; zero shuffles, zero driver-side state, no
vocabulary to broadcast or learn. It composes with any downstream
similarity operator unchanged (they consume (id, array) relations).

Reference analog: the broadcast char-dict encode that turns text into
fixed-width integer features (reference:
mindocr/data/transforms/rec_transforms.py:222-246) — here the "dict"
is a pinned hash, so there is nothing to ship to executors.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, DataFrame, functions as F
from pyspark.sql.functions import pandas_udf

from mindocr_spark.functions.text import tokens_col

#: Supported output widths: all bits ride ONE md5 per token.
_MAX_DIM = 128


def _embed_fold_fn(dim: int):
    """Arrow fold: array<md5-hex> per row → L2-normalized vote vector.

    Votes are int64-exact (|votes_j| ≤ n_tokens; Σ votes² ≤
    n_tokens²·dim ≪ 2^53 for any real document), so the normalized
    components are one exact-int division by one correctly-rounded
    sqrt — bit-stable across engines and runs."""

    def fold(hex_hashes: pd.Series) -> pd.Series:
        import numpy as np

        zero = [0.0] * dim
        out = []
        for arr in hex_hashes:
            if arr is None or len(arr) == 0:
                out.append(zero)
                continue
            # md5 hex → two uint64 halves; bit j of the digest, LSB-first
            # within each half (the simhash_md5 bit-numbering)
            h_lo = np.array([int(x[:16], 16) for x in arr],
                            dtype=np.uint64)
            shifts = np.arange(min(dim, 64), dtype=np.uint64)
            bits = ((h_lo[:, None] >> shifts[None, :]) & 1).astype(
                np.int64)
            if dim > 64:
                h_hi = np.array([int(x[16:32], 16) for x in arr],
                                dtype=np.uint64)
                hi_shifts = np.arange(dim - 64, dtype=np.uint64)
                hi_bits = ((h_hi[:, None] >> hi_shifts[None, :]) & 1
                           ).astype(np.int64)
                bits = np.concatenate([bits, hi_bits], axis=1)
            votes = (2 * bits - 1).sum(axis=0)
            s = int(np.dot(votes, votes))
            if s == 0:
                out.append(zero)
            else:
                out.append((votes / np.sqrt(float(s))).tolist())
        return pd.Series(out, dtype="object")

    return fold


def text_embed_cols(
    df: DataFrame,
    dim: int = 64,
    text_col: str = "text",
    id_col: str = "doc_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(id, vec_col: array<double>): deterministic hashed-BOW random
    projection of the text, L2-normalized (see module docstring).

    The md5 per token runs JVM-side inside a transform HOF (codegen
    expression, computed once per token); only the vote fold crosses
    to Python, Arrow-batched. Accepts any relation with an id and a
    text column — extracted pages, raw documents, stream batches."""
    if not 1 <= dim <= _MAX_DIM:
        raise ValueError(f"need 1 <= dim <= {_MAX_DIM}, got {dim}")
    toks = df.select(
        id_col,
        F.transform(
            tokens_col(text_col), lambda w: F.md5(w.cast("binary"))
        ).alias("__th"),
    )
    fold = pandas_udf(_embed_fold_fn(dim), "array<double>")
    return toks.select(id_col, fold("__th").alias(vec_col))


def embed_norm(vec: Column | str) -> Column:
    """L2 norm of an embedding column — 1.0 for every non-blank doc,
    0.0 for the zero vector (the audit invariant)."""
    c = F.col(vec) if isinstance(vec, str) else vec
    return F.sqrt(F.aggregate(
        c, F.lit(0.0), lambda acc, x: acc + x * x))

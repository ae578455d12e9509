"""In-engine deterministic text embedder (functions/embed.py)."""

import hashlib
import math

import pytest
from pyspark.sql import functions as F


def _rows(spark, rows):
    return spark.createDataFrame(rows, "doc_id bigint, text string")


def _embed(spark, rows, **kw):
    from mindocr_spark.functions.embed import text_embed_cols

    return {
        r["doc_id"]: list(r["embedding"])
        for r in text_embed_cols(_rows(spark, rows), **kw).collect()
    }


def _reference_embed(text, dim=64):
    """Independent scalar reimplementation: md5 bit votes, exact-int
    sum of squares, one sqrt+division per component."""
    toks = " ".join(text.split()).split(" ") if text and text.split() else []
    votes = [0] * dim
    for w in toks:
        h = int(hashlib.md5(w.encode()).hexdigest()[:32], 16)
        # first 16 hex chars = high 64 bits of this int; match the
        # engine's int(x[:16], 16) slicing
        lo = int(hashlib.md5(w.encode()).hexdigest()[:16], 16)
        hi = int(hashlib.md5(w.encode()).hexdigest()[16:32], 16)
        for j in range(dim):
            bit = ((lo if j < 64 else hi) >> (j % 64)) & 1
            votes[j] += 1 if bit else -1
    s = sum(v * v for v in votes)
    if s == 0:
        return [0.0] * dim
    rt = math.sqrt(float(s))
    return [v / rt for v in votes]


class TestTextEmbed:
    def test_matches_scalar_reference(self, spark):
        rows = [
            (1, "hello world hello"),
            (2, "the quick brown fox jumps over the lazy dog"),
            (3, "répétition répétition ünïcode"),
        ]
        got = _embed(spark, rows)
        for doc_id, text in rows:
            assert got[doc_id] == _reference_embed(text), doc_id

    def test_unit_norm_and_zero_vector(self, spark):
        got = _embed(spark, [(1, "some real text"), (2, ""), (3, None),
                             (4, "   \t\n  ")])
        assert abs(sum(x * x for x in got[1]) - 1.0) < 1e-12
        for blank in (2, 3, 4):
            assert got[blank] == [0.0] * 64

    def test_tf_weighting_changes_direction(self, spark):
        # repeating a token shifts the vector toward that token's signs
        got = _embed(spark, [(1, "alpha beta"), (2, "alpha alpha beta")])
        assert got[1] != got[2]
        # but a pure repetition of the WHOLE doc is direction-invariant
        got2 = _embed(spark, [(1, "alpha beta"), (2, "alpha beta " * 3)])
        assert all(abs(a - b) < 1e-12 for a, b in zip(got2[1], got2[2]))

    def test_dim_variants_and_bounds(self, spark):
        from mindocr_spark.functions.embed import text_embed_cols

        got32 = _embed(spark, [(1, "a b c")], dim=32)
        got128 = _embed(spark, [(1, "a b c")], dim=128)
        assert len(got32[1]) == 32 and len(got128[1]) == 128
        assert got128[1] == _reference_embed("a b c", dim=128)
        with pytest.raises(ValueError):
            text_embed_cols(_rows(spark, [(1, "x")]), dim=0)
        with pytest.raises(ValueError):
            text_embed_cols(_rows(spark, [(1, "x")]), dim=129)

    def test_embed_norm_audit(self, spark):
        from mindocr_spark.functions.embed import (
            embed_norm,
            text_embed_cols,
        )

        emb = text_embed_cols(_rows(spark, [(1, "a b c"), (2, "")]))
        norms = {r["doc_id"]: r["n"] for r in emb.select(
            "doc_id", embed_norm("embedding").alias("n")).collect()}
        assert abs(norms[1] - 1.0) < 1e-12 and norms[2] == 0.0

    def test_composes_with_ann_topk(self, spark):
        """The closed loop: embed text in-engine, feed the vectors to
        an existing similarity operator unchanged; an exact duplicate
        text is its twin's nearest neighbor at cosine 1.0."""
        from mindocr_spark.functions.embed import text_embed_cols
        from mindocr_spark.functions.similarity import cosine_topk

        rows = [
            (1, "identical twin document body"),
            (2, "identical twin document body"),
            (3, "something altogether different here"),
        ]
        emb = text_embed_cols(_rows(spark, rows)).withColumnRenamed(
            "doc_id", "vec_id")
        top1 = cosine_topk(emb, emb, k=1)
        got = {r["query_id"]: (r["neighbor_id"], r["cos_sim"])
               for r in top1.collect()}
        assert got[1] == (2, 1.0) and got[2] == (1, 1.0)
        assert got[3][1] < 1.0

    def test_plan_is_narrow(self, spark):
        """Featurization must add ZERO exchanges — one md5-bearing
        projection plus one Arrow fold, no shuffle anywhere."""
        from mindocr_spark.functions.embed import text_embed_cols

        emb = text_embed_cols(_rows(spark, [(1, "x y z")]))
        plan = emb._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan
        assert "ArrowEvalPython" in plan or "BatchEvalPython" not in plan

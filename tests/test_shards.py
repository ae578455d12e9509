"""JSONL training-shard export/ingest — round-trip, reproducibility,
and corruption discipline (the WET/WARC sink test pattern)."""

import os

import pytest


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id bigint, text string, lang string")


ROWS = [
    (1, "plain ascii body", "en"),
    (2, "unicode: café 山水 — dash", "zh"),
    (3, 'quotes " and \\ backslash and\nnewline', "en"),
    (4, None, "de"),
    (5, "", "es"),
]


def test_round_trip_identity(spark, tmp_path):
    from mindocr_spark.sources.shards import (
        read_jsonl_shards, write_jsonl_shards,
    )

    out = str(tmp_path / "shards")
    n = write_jsonl_shards(_docs(spark, ROWS), out)
    assert n == 5
    back = {
        r["doc_id"]: r for r in read_jsonl_shards(spark, out).collect()
    }
    assert len(back) == 5
    for doc_id, text, lang in ROWS:
        assert back[doc_id]["text"] == text       # JSON fidelity, incl \n
        assert back[doc_id]["lang"] == lang
    # seq is dense 0..k-1 within each shard
    by_shard = {}
    for r in back.values():
        by_shard.setdefault(r["shard"], []).append(r["seq"])
    for seqs in by_shard.values():
        assert sorted(seqs) == list(range(len(seqs)))


def test_files_are_bit_reproducible(spark, tmp_path):
    from mindocr_spark.sources.shards import write_jsonl_shards

    a, b = str(tmp_path / "a"), str(tmp_path / "b")
    # different partitioning must not change a single byte
    write_jsonl_shards(_docs(spark, ROWS).repartition(7), a)
    write_jsonl_shards(_docs(spark, ROWS).coalesce(1), b)
    fa = sorted(os.listdir(a))
    assert fa == sorted(os.listdir(b)) and fa
    for name in fa:
        assert (
            open(os.path.join(a, name), "rb").read()
            == open(os.path.join(b, name), "rb").read()
        )


def test_corrupt_shard_yields_failure_row_not_abort(spark, tmp_path):
    from mindocr_spark.sources.shards import (
        read_jsonl_shards, write_jsonl_shards,
    )

    out = str(tmp_path / "shards")
    write_jsonl_shards(_docs(spark, ROWS), out)
    bad = os.path.join(out, "shard-zz.jsonl")
    with open(bad, "wb") as fh:
        fh.write(b'{"id": 9, "text": "trunca')
    rows = read_jsonl_shards(spark, out).collect()
    failed = [r for r in rows if r["doc_id"] is None]
    assert len(failed) == 1 and failed[0]["shard_file"].endswith("shard-zz.jsonl")
    assert len([r for r in rows if r["doc_id"] is not None]) == 5


def test_shard_assignment_is_pure_function_of_id(spark, tmp_path):
    from mindocr_spark.sources.shards import shard_key
    import hashlib

    df = _docs(spark, ROWS).select(
        "doc_id", shard_key("doc_id", 2).alias("s")
    )
    for r in df.collect():
        assert r["s"] == hashlib.md5(str(r["doc_id"]).encode()).hexdigest()[:2]


class TestEpochShuffle:
    def test_epochs_permute_differently_but_reproducibly(self, spark):
        from mindocr_spark.sources.shards import epoch_shuffle

        docs = spark.range(200).withColumnRenamed("id", "doc_id")
        e1 = epoch_shuffle(docs, epoch=1, n_shards=4)
        e1_again = epoch_shuffle(docs, epoch=1, n_shards=4)
        e2 = epoch_shuffle(docs, epoch=2, n_shards=4)
        k1 = [(r["doc_id"], r["shard"], r["pos"]) for r in
              e1.orderBy("doc_id").collect()]
        assert k1 == [(r["doc_id"], r["shard"], r["pos"]) for r in
                      e1_again.orderBy("doc_id").collect()]
        k2 = [(r["doc_id"], r["shard"], r["pos"]) for r in
              e2.orderBy("doc_id").collect()]
        assert k1 != k2  # a new epoch is a new permutation

    def test_positions_are_dense_per_shard(self, spark):
        from mindocr_spark.sources.shards import epoch_shuffle

        docs = spark.range(100).withColumnRenamed("id", "doc_id")
        out = epoch_shuffle(docs, epoch=3, n_shards=4).collect()
        by_shard = {}
        for r in out:
            by_shard.setdefault(r["shard"], []).append(r["pos"])
        assert sum(len(v) for v in by_shard.values()) == 100
        for shard, poss in by_shard.items():
            assert sorted(poss) == list(range(1, len(poss) + 1))
        # uniform hash: every shard is populated at this size
        assert set(by_shard) == {0, 1, 2, 3}

    def test_null_ids_dropped_and_single_shuffle(self, spark):
        from mindocr_spark.sources.shards import epoch_shuffle
        from pyspark.sql import functions as F

        docs = spark.createDataFrame(
            [(1,), (None,), (2,)], "doc_id bigint"
        )
        out = epoch_shuffle(docs, epoch=1, n_shards=2)
        assert out.count() == 2
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert plan.count("Exchange") == 1  # one shuffle on the shard key
        assert "BatchEvalPython" not in plan


class TestHRWSharding:
    def test_resize_moves_only_to_new_shards(self, spark):
        from mindocr_spark.sources.shards import hrw_resize_audit

        rows = hrw_resize_audit(
            spark.range(4000), "id",
            [f"s{i}" for i in range(8)], ["s8", "s9"],
        ).collect()
        by = {r["shard"]: r for r in rows}
        assert len(by) == 10
        for i in range(8):
            r = by[f"s{i}"]
            assert r["gained"] == 0 and not r["is_new"]
            assert r["n_after"] == r["n_before"] - r["lost"]
        for s in ("s8", "s9"):
            r = by[s]
            assert r["n_before"] == 0 and r["is_new"]
            assert r["gained"] == r["n_after"] > 0
        moved = sum(r["gained"] for r in rows)
        # expectation: 2/10 of keys move; allow wide slack
        assert 0.1 * 4000 < moved < 0.3 * 4000

    def test_balance(self, spark):
        from mindocr_spark.sources.shards import hrw_resize_audit

        rows = hrw_resize_audit(
            spark.range(4000), "id",
            [f"s{i}" for i in range(8)], [],
        ).collect()
        counts = [r["n_after"] for r in rows]
        assert sum(counts) == 4000
        assert max(counts) < 2 * min(counts)

    def test_removal_only_moves_victims(self, spark):
        """Dual of the grow case: shrinking the shard set relocates
        ONLY the removed shard's keys (everyone else's winner among
        the survivors is unchanged)."""
        from pyspark.sql import functions as F

        from mindocr_spark.sources.shards import hrw_choice_sql

        full = [f"s{i}" for i in range(6)]
        kept = full[:-1]
        both = spark.range(2000).select(
            F.expr(hrw_choice_sql("CAST(id AS STRING)", full)).alias("a"),
            F.expr(hrw_choice_sql("CAST(id AS STRING)", kept)).alias("b"),
        )
        assert both.where((F.col("a") != "s5")
                          & (F.col("a") != F.col("b"))).count() == 0
        assert both.where(F.col("a") == "s5").count() > 0

    def test_choice_sql_validates(self):
        import pytest

        from mindocr_spark.sources.shards import hrw_choice_sql

        with pytest.raises(ValueError):
            hrw_choice_sql("k", ["a|b"])
        with pytest.raises(ValueError):
            hrw_choice_sql("k", ["a", "a"])
        with pytest.raises(ValueError):
            hrw_choice_sql("k", [])  # not silent malformed SQL
        assert "greatest" not in hrw_choice_sql("k", ["only"])

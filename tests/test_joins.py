"""asof_join_backward — goldens, semantics edges, plan shape, and a
pandas.merge_asof cross-check (a third independent implementation)."""

import datetime as dt

import pytest


def _t(s):
    return dt.datetime(2024, 1, 1, 0, 0, s)


def _frames(spark):
    left = spark.createDataFrame(
        [(1, 1, _t(10)), (2, 1, _t(3)), (3, 2, _t(7)), (4, 3, _t(5))],
        "event_id bigint, user_id bigint, ts timestamp_ntz",
    )
    right = spark.createDataFrame(
        [(100, 1, _t(5)), (200, 1, _t(10)), (300, 2, _t(9))],
        "view_id bigint, user_id bigint, ts timestamp_ntz",
    )
    return left, right


def test_backward_semantics_and_inclusive_tie(spark):
    from mindocr_spark.operators.joins import asof_join_backward

    left, right = _frames(spark)
    got = {
        r["event_id"]: r["view_id_matched"]
        for r in asof_join_backward(left, right, key="user_id").collect()
    }
    assert got[1] == 200      # tie at t10 matches (inclusive)
    assert got[2] is None     # nothing at-or-before t3
    assert got[3] is None     # user 2's only view is LATER
    assert got[4] is None     # key with no right rows at all
    assert len(got) == 4      # no left row dropped


def test_tolerance_window(spark):
    from mindocr_spark.operators.joins import asof_join_backward

    left, right = _frames(spark)
    # user1 t10 matches view at t10 (lag 0) even at tolerance 0;
    # a match older than the window NULLs out
    l2 = spark.createDataFrame(
        [(9, 1, _t(9))], "event_id bigint, user_id bigint, ts timestamp_ntz"
    )
    got = {
        r["event_id"]: r["view_id_matched"]
        for r in asof_join_backward(
            left.unionByName(l2), right, key="user_id", tolerance_sec=2
        ).collect()
    }
    assert got[1] == 200
    assert got[9] is None     # nearest view t5 is 4s back > 2s window


def test_matches_pandas_merge_asof(spark):
    import numpy as np
    import pandas as pd

    from mindocr_spark.operators.joins import asof_join_backward

    rng = np.random.RandomState(7)
    lp = pd.DataFrame({
        "event_id": np.arange(200),
        "user_id": rng.randint(0, 5, 200),
        "sec": rng.randint(0, 500, 200),
    })
    rp = pd.DataFrame({
        "view_id": np.arange(1000, 1120),
        "user_id": rng.randint(0, 5, 120),
        "sec": rng.randint(0, 500, 120),
    }).drop_duplicates(["user_id", "sec"])
    base = dt.datetime(2024, 1, 1)
    for df in (lp, rp):
        df["ts"] = df["sec"].map(lambda s: base + dt.timedelta(seconds=int(s)))
    left = spark.createDataFrame(
        lp[["event_id", "user_id", "ts"]],
        "event_id bigint, user_id bigint, ts timestamp_ntz",
    )
    right = spark.createDataFrame(
        rp[["view_id", "user_id", "ts"]],
        "view_id bigint, user_id bigint, ts timestamp_ntz",
    )
    got = {
        r["event_id"]: r["view_id_matched"]
        for r in asof_join_backward(left, right, key="user_id").collect()
    }
    ref = pd.merge_asof(
        lp.sort_values("ts"),
        rp.sort_values("ts")[["view_id", "user_id", "ts"]],
        on="ts", by="user_id", direction="backward",
    )
    for _, row in ref.iterrows():
        expect = None if pd.isna(row["view_id"]) else int(row["view_id"])
        assert got[int(row["event_id"])] == expect


def test_single_shuffle_no_python(spark):
    from mindocr_spark.operators.joins import asof_join_backward

    left, right = _frames(spark)
    plan = (
        asof_join_backward(left, right, key="user_id")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert plan.count("Exchange") == 1
    assert "Join" not in plan            # the carry replaces any join
    assert "BatchEvalPython" not in plan and "ArrowEval" not in plan


class TestUpsertLatest:
    def _frames(self, spark):
        target = spark.createDataFrame(
            [("a", "old-a"), ("b", "old-b"), ("c", "old-c")],
            "url string, body string",
        )
        updates = spark.createDataFrame(
            [("b", "new-b", 1), ("d", "new-d", 2)],
            "url string, body string, extra int",
        )
        return target, updates

    def test_merge_semantics(self, spark):
        from mindocr_spark.operators.joins import upsert_latest

        target, updates = self._frames(spark)
        got = {
            r["url"]: r["body"]
            for r in upsert_latest(target, updates, key="url").collect()
        }
        # update wins, unmatched target survives, new keys insert,
        # extra update-side columns are dropped
        assert got == {"a": "old-a", "b": "new-b", "c": "old-c",
                       "d": "new-d"}

    def test_corpus_side_is_map_only(self, spark):
        from mindocr_spark.operators.joins import upsert_latest

        target, updates = self._frames(spark)
        plan = (
            upsert_latest(target, updates, key="url")
            ._jdf.queryExecution().executedPlan().toString()
        )
        assert "BroadcastHashJoin" in plan and "LeftAnti" in plan
        assert "SortMergeJoin" not in plan

    def test_shuffled_fallback(self, spark):
        from mindocr_spark.operators.joins import upsert_latest

        target, updates = self._frames(spark)
        got = upsert_latest(
            target, updates, key="url", broadcast_keys=False
        )
        assert got.count() == 4


class TestFkIntegrity:
    def _run(self, spark, child, parent):
        from mindocr_spark.operators.joins import fk_integrity_stats

        c = spark.createDataFrame(child, "fk_val bigint")
        p = spark.createDataFrame(parent, "pk_val bigint")
        return fk_integrity_stats(
            c, "fk_val", p, "pk_val", "c", "p"
        ).collect()[0]

    def test_orphans_nulls_and_dups_counted(self, spark):
        child = [(1,), (1,), (2,), (99,), (None,)]
        parent = [(1,), (2,), (2,), (3,)]
        r = self._run(spark, child, parent)
        assert r["n_child_rows"] == 5
        assert r["n_null_fk"] == 1
        # NULL fk is not an orphan; 99 is
        assert r["n_orphan_rows"] == 1
        assert r["orphan_share"] == 0.2
        assert r["n_parent_rows"] == 4
        assert r["n_parent_dup_keys"] == 1

    def test_clean_relationship_all_zero(self, spark):
        r = self._run(spark, [(1,), (2,)], [(1,), (2,), (3,)])
        assert (r["n_null_fk"], r["n_orphan_rows"],
                r["n_parent_dup_keys"]) == (0, 0, 0)
        assert r["orphan_share"] == 0.0

    def test_dup_keys_counts_keys_not_excess_rows_and_skips_nulls(
            self, spark):
        # pk [1,1,1,NULL,NULL]: exactly ONE duplicated key; NULL pk
        # rows never multiply a join so they are not "duplicates"
        r = self._run(spark, [(1,)], [(1,), (1,), (1,), (None,), (None,)])
        assert r["n_parent_rows"] == 5
        assert r["n_parent_dup_keys"] == 1


class TestBucketedJoin:
    def test_cobucketed_join_has_zero_exchanges(self, spark, tmp_path):
        from mindocr_spark.operators.joins import (
            bucketed_join,
            write_bucketed,
        )

        a = spark.range(200).selectExpr("id AS k", "id * 2 AS va")
        b = spark.range(200).selectExpr("id AS k2", "id * 3 AS vb")
        write_bucketed(a, "tb_a", "k", 4, path=str(tmp_path / "a"))
        write_bucketed(b, "tb_b", "k2", 4, path=str(tmp_path / "b"))
        j = bucketed_join(spark, "tb_a", "tb_b", "k", "k2")
        plan = j._jdf.queryExecution().executedPlan().toString()
        # co-located: NO shuffle on either side; bucket-sorted: the
        # merge join needs no extra sort of the scan order
        assert "Exchange" not in plan
        assert j.count() == 200
        # the same join over the plain (unbucketed) relations shuffles
        # BOTH sides — the cost bucketing pre-pays
        plain = a.hint("merge").join(b, a["k"] == b["k2"])
        pplan = plain._jdf.queryExecution().executedPlan().toString()
        assert pplan.count("Exchange") >= 2

    def test_values_identical_to_plain_join(self, spark, tmp_path):
        from mindocr_spark.operators.joins import (
            bucketed_join,
            write_bucketed,
        )

        a = spark.range(50).selectExpr("id AS k", "id % 7 AS g")
        b = spark.range(0, 100, 2).selectExpr("id AS k2", "id % 5 AS h")
        write_bucketed(a, "tb_c", "k", 4, path=str(tmp_path / "c"))
        write_bucketed(b, "tb_d", "k2", 4, path=str(tmp_path / "d"))
        got = sorted(
            tuple(r) for r in bucketed_join(
                spark, "tb_c", "tb_d", "k", "k2").collect()
        )
        want = sorted(
            tuple(r) for r in a.join(b, a["k"] == b["k2"]).collect()
        )
        assert got == want

    def test_write_bucketed_validates(self, spark, tmp_path):
        import pytest as _pytest

        from mindocr_spark.operators.joins import write_bucketed

        with _pytest.raises(ValueError):
            write_bucketed(spark.range(3), "tb_x", "id", 0,
                           path=str(tmp_path / "x"))

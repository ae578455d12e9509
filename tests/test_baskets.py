"""A-priori frequent-pair mining — planted-basket goldens + guards."""

import datetime as dt

import pytest


def _events(spark, rows):
    """rows: (user_id, day_offset, k) → events-shaped frame."""
    data = [
        (u, dt.datetime(2024, 1, 1 + d, 12, 0, 0), f'{{"k": {k}}}')
        for (u, d, k) in rows
    ]
    return spark.createDataFrame(
        data, "user_id bigint, ts timestamp_ntz, props string"
    )


def _run(spark, rows, **kw):
    from mindocr_spark.functions.baskets import frequent_pairs

    out = frequent_pairs(_events(spark, rows), **kw).collect()
    return {(r["item_a"], r["item_b"]): r for r in out}


class TestFrequentPairs:
    def test_hand_computed_golden(self, spark):
        rows = (
            [(1, 0, 1), (1, 0, 2), (1, 0, 3)]   # basket {1,2,3}
            + [(2, 0, 1), (2, 0, 2)]            # basket {1,2}
            + [(3, 0, 1), (3, 0, 4)]            # basket {1,4}
        )
        out = _run(spark, rows, min_item=(0, 1), min_pair=(0, 1))
        r = out[(1, 2)]
        assert (r["n_pair"], r["n_a"], r["n_b"], r["n_baskets"]) == (
            2, 3, 2, 3)
        # lift = 2·3 / (3·2) = 1.0
        assert r["lift"] == 1.0
        assert out[(2, 3)]["n_pair"] == 1
        assert out[(2, 3)]["lift"] == round(1 * 3 / (2 * 1), 6)
        assert set(out) == {(1, 2), (1, 3), (2, 3), (1, 4)}

    def test_apriori_item_floor_prunes_before_pairing(self, spark):
        # item 9 appears in 1 of 4 baskets (25%) — below a 50% floor —
        # so the (1, 9) pair never forms even though it would clear the
        # pair floor of 0
        rows = [(u, 0, 1) for u in range(4)] + [(0, 0, 9)]
        out = _run(spark, rows, min_item=(1, 2), min_pair=(0, 1))
        assert out == {}

    def test_basket_cap_removes_whole_basket(self, spark):
        # user 0's 3-item basket is over the cap of 2: it contributes
        # neither pairs NOR item support; the population shrinks to the
        # two clean baskets
        rows = (
            [(0, 0, 1), (0, 0, 2), (0, 0, 3)]
            + [(1, 0, 1), (1, 0, 2)]
            + [(2, 0, 1), (2, 0, 2)]
        )
        out = _run(spark, rows, min_item=(0, 1), min_pair=(0, 1),
                   max_basket_items=2)
        r = out[(1, 2)]
        assert (r["n_pair"], r["n_a"], r["n_b"], r["n_baskets"]) == (
            2, 2, 2, 2)
        assert set(out) == {(1, 2)}

    def test_day_grain_and_within_day_dedup(self, spark):
        # same user: day 0 twice with duplicate k=1 events (one basket,
        # deduped), day 1 separately — (1,2) co-occurs only on day 0
        rows = [(5, 0, 1), (5, 0, 1), (5, 0, 2), (5, 1, 1), (5, 1, 3)]
        out = _run(spark, rows, min_item=(0, 1), min_pair=(0, 1))
        assert out[(1, 2)]["n_pair"] == 1
        assert out[(1, 2)]["n_a"] == 2  # item 1 in both day-baskets
        assert out[(1, 2)]["n_baskets"] == 2
        assert (1, 3) in out and (2, 3) not in out

    def test_guards(self, spark):
        from mindocr_spark.functions.baskets import frequent_pairs

        df = _events(spark, [(1, 0, 1)])
        with pytest.raises(ValueError):
            frequent_pairs(df, max_basket_items=1)
        with pytest.raises(ValueError):
            frequent_pairs(df, min_item=(1, 0))
        with pytest.raises(ValueError):
            frequent_pairs(df, min_pair=(-1, 10))

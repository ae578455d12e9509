"""ranked_global — distributed exact rank/prefix sums vs the
single-partition window ground truth."""

import random

import pytest
from pyspark.sql import Window, functions as F

from mindocr_spark.functions.ranking import ranked_global


@pytest.fixture(scope="module")
def spark():
    from mindocr_spark.session import get_spark

    return get_spark()


def _rows(n=3000, lo=-50, hi=50):
    rng = random.Random(11)
    return [(i, rng.randint(lo, hi), f"u{i:05d}") for i in range(n)]


def test_matches_unpartitioned_window_exactly(spark):
    df = spark.createDataFrame(_rows(), "id bigint, v bigint, name string")
    order = [F.desc("v"), F.asc("name")]
    got = {r["id"]: (r["rk"], r["cum_v"])
           for r in ranked_global(df, order, rank_col="rk",
                                  sum_cols=("v",)).collect()}
    w = Window.orderBy(*order)
    exp = {r["id"]: (r["rk"], r["cum_v"]) for r in df.select(
        "id", F.row_number().over(w).alias("rk"),
        F.sum("v").over(
            w.rowsBetween(Window.unboundedPreceding, 0)).alias("cum_v"),
    ).collect()}
    assert got == exp  # exact, including NEGATIVE running sums


def test_totals_from_offsets_aggregate(spark):
    rows = _rows(500)
    df = spark.createDataFrame(rows, "id bigint, v bigint, name string")
    out = ranked_global(df, ["v", "name"], sum_cols=("v",),
                        attach_totals=True).collect()
    tot = sum(v for _, v, _ in rows)
    assert all(r["n_total"] == 500 and r["tot_v"] == tot for r in out)
    assert {r["rank"] for r in out} == set(range(1, 501))


def test_no_single_partition_window_over_input(spark):
    """The ONLY unpartitioned window in the plan is over the
    partition-count bookkeeping frame (grouped on __rg_pid); the
    input-sized relation is never moved to one task."""
    import re

    df = spark.range(1000).select(
        F.col("id"), (F.col("id") % 7).alias("v"))
    plan = ranked_global(df, ["v", "id"])._jdf.queryExecution(
    ).optimizedPlan()

    def walk(node):
        yield node
        ch = node.children()
        for i in range(ch.size()):
            yield from walk(ch.apply(i))

    for node in walk(plan):
        if node.getClass().getSimpleName() != "Window":
            continue
        if node.partitionSpec().size() > 0:
            continue
        aggs = [sub for sub in walk(node)
                if sub.getClass().getSimpleName() == "Aggregate"]
        names = set()
        for a in aggs:
            ge = a.groupingExpressions()
            for j in range(ge.size()):
                m = re.match(r"^'?(\w+)#\d+", ge.apply(j).toString())
                if m:
                    names.add(m.group(1))
        assert "__rg_pid" in names


def test_validates_empty_order(spark):
    with pytest.raises(ValueError):
        ranked_global(spark.range(3), [])

"""ranking — distributed EXACT global rank / prefix sums.

The one operation Spark's Window API makes dangerously easy to get
wrong at scale: ``Window.orderBy(...)`` with no ``partitionBy`` moves
EVERY row to ONE task (`WindowExec: No Partition Defined`) — a
single-threaded sort of the whole relation disguised as a declarative
plan. Fine for a 20-row bookkeeping frame; a scale-killer at user or
key grain.

:func:`ranked_global` is the distributed restatement, exact to the
row:

1. ``repartitionByRange(order_by)`` — the distributed sort machinery
   Spark already has (sampled boundaries, one wide exchange), so
   partition *i* holds a contiguous slice of the global order;
2. per-partition ``row_number`` / running sums, partitioned by
   ``spark_partition_id()`` — parallel across the range partitions;
3. per-partition (count, sum) totals — a tiny relation, at most
   ``spark.sql.shuffle.partitions`` rows — turned into EXCLUSIVE
   cumulative offsets and broadcast back;
4. global rank = partition offset + local rank (same for sums).

Same integer-exact results as the unpartitioned window (given a TOTAL
order — callers must include a unique tiebreaker in ``order_by``, the
repo-wide determinism rule), but the corpus-sized work runs on all
executors and the only single-partition window left is over the
partition-count bookkeeping frame.

The pid-stamped locally-ranked frame is ``tracked_persist``-ed: the
offsets branch and the output branch both consume it, and re-executing
a range exchange under a re-sampled partitioner between the two
branches would silently mis-assign offsets. One persisted diamond —
the LSH-signature discipline.

Reference analog: distributed metric AllReduce — every device ranks
its shard, one tiny all-gather of shard sizes turns local indices into
global ones (reference: mindocr/metrics/det_metrics.py:31-53's
all_reduce of per-device counts).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F

from mindocr_spark.cache import tracked_persist

#: Column name for the range-partition id. Grouping on this column is
#: bounded by spark.sql.shuffle.partitions — the plan-sweep test
#: (tests/test_plans.py) recognizes it as a bounded-grain key for the
#: offsets window.
_PID = "__rg_pid"


def ranked_global(
    df: DataFrame,
    order_by: list[Column | str],
    rank_col: str = "rank",
    sum_cols: tuple[str, ...] = (),
    sum_prefix: str = "cum_",
    attach_totals: bool = False,
    total_prefix: str = "tot_",
    n_col: str = "n_total",
) -> DataFrame:
    """`df` + exact 1-based global rank under `order_by`, computed
    distributed (see module docstring).

    - ``sum_cols``: also attach INCLUSIVE prefix sums over the same
      order as ``{sum_prefix}{col}`` (native sum type — cast upstream
      for DECIMAL exactness, the stream_static_join discipline);
    - ``attach_totals``: additionally attach the global row count as
      ``n_col`` and, per sum col, the global sum as
      ``{total_prefix}{col}`` — from the SAME tiny offsets aggregate,
      so callers avoid a second unpartitioned total window.

    ``order_by`` must be a total order (include a unique tiebreaker)
    or ranks within ties are partition-placement-dependent.
    """
    if not order_by:
        raise ValueError("order_by must name at least one column")
    order_exprs = [F.col(c) if isinstance(c, str) else c
                   for c in order_by]
    ranged = df.repartitionByRange(*order_exprs).withColumn(
        _PID, F.spark_partition_id())
    w_loc = Window.partitionBy(_PID).orderBy(*order_exprs)
    w_run = w_loc.rowsBetween(Window.unboundedPreceding, 0)
    loc_cols = [F.row_number().over(w_loc).alias("__rg_rn")]
    for c in sum_cols:
        loc_cols.append(F.sum(c).over(w_run).alias(f"__rg_s_{c}"))
    loc = tracked_persist(ranged.select("*", *loc_cols))

    # per-partition totals: ≤ spark.sql.shuffle.partitions rows. The
    # exclusive-cumsum window below is the ONE legitimate
    # unpartitioned window in this operator — bounded bookkeeping.
    aggs = [F.count(F.lit(1)).alias("__rg_n")]
    for c in sum_cols:
        # per-partition total = sum of the RAW column (NOT max of the
        # running sum, which is only its total for non-negative values)
        aggs.append(F.sum(c).alias(f"__rg_t_{c}"))
    parts = loc.groupBy(_PID).agg(*aggs)
    w_off = Window.orderBy(_PID).rowsBetween(
        Window.unboundedPreceding, -1)
    off_cols = [
        F.col(_PID),
        F.coalesce(F.sum("__rg_n").over(w_off), F.lit(0))
        .cast("bigint").alias("__rg_off"),
    ]
    for c in sum_cols:
        zero = F.lit(0).cast(loc.schema[f"__rg_s_{c}"].dataType)
        off_cols.append(F.coalesce(
            F.sum(f"__rg_t_{c}").over(w_off), zero
        ).alias(f"__rg_soff_{c}"))
    if attach_totals:
        w_all = Window.partitionBy()
        off_cols.append(
            F.sum("__rg_n").over(w_all).cast("bigint").alias(n_col))
        for c in sum_cols:
            off_cols.append(F.sum(f"__rg_t_{c}").over(w_all)
                            .alias(f"{total_prefix}{c}"))
    offsets = parts.select(*off_cols)

    out = loc.join(F.broadcast(offsets), _PID)
    proj = [F.col(c) for c in df.columns]
    proj.append((F.col("__rg_off") + F.col("__rg_rn"))
                .cast("bigint").alias(rank_col))
    for c in sum_cols:
        proj.append((F.col(f"__rg_soff_{c}") + F.col(f"__rg_s_{c}"))
                    .alias(f"{sum_prefix}{c}"))
    if attach_totals:
        proj.append(F.col(n_col))
        for c in sum_cols:
            proj.append(F.col(f"{total_prefix}{c}"))
    return out.select(*proj)
